"""JsonPath-subset parser + appliers (reference F8/P3 parity, now with the
quoted-field segments round 2 left uncovered).

Grammar is EXACTLY the reference's JsonPathParser.java:17-28 — one regex with
three alternatives, scanned left to right:

    "([^"]*)"   quoted field name (may contain '.', '[', spaces — the
                reference's spec test parses ``f1.f2[0]."f3.x".f4[1][2]``,
                jsonpath/JsonPathTest.java:23)
    \\[(\\d+)\\]    list index
    ([^.\\[]+)   bare field name (anything up to the next '.' or '[')

Two appliers, matching the reference's two evaluation sites:
- :func:`json_path_col` walks NATIVE complex columns (struct/map/array) —
  the ObjectInspector tree walk at HdfsSerDeImportService.java:205-313;
  out-of-range list indices yield NULL (HdfsSerDeImportServiceTest.java:
  114-127 expects null, so ``F.get``, not ANSI-throwing getItem).
- :func:`json_path_str` compiles the path to a ``get_json_object``
  expression over JSON-string columns (the reference's serialized-complex
  degrade path).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN = re.compile(r'"([^"]*)"|\[(\d+)\]|([^.\[]+)')

_BARE = re.compile(r"[A-Za-z0-9_]+")


def parse_json_path(spec: str) -> list[str | int]:
    """Path spec -> list of field names (str) and list indices (int)."""
    out: list[str | int] = []
    for m in _TOKEN.finditer(spec):
        if m.group(1) is not None:
            out.append(m.group(1))
        elif m.group(2) is not None:
            out.append(int(m.group(2)))
        else:
            out.append(m.group(3))
    return out


def json_path_col(col: Column, spec: str) -> Column:
    """Walk a native complex column along ``spec``.

    Field segments use getItem (works on structs AND maps; missing map keys
    yield NULL); index segments use ``F.get`` so out-of-range indices yield
    NULL instead of throwing under ANSI mode — the reference's
    missing-path -> null semantics."""
    cur = col
    for el in parse_json_path(spec):
        cur = F.get(cur, el) if isinstance(el, int) else cur.getItem(el)
    return cur


def json_path_str_expr(spec: str) -> str:
    """Compile a path spec to Spark's get_json_object path syntax.

    Bare identifiers render as ``.name``; anything else (quoted segments
    carrying dots/spaces) renders bracket-quoted ``['name']``, which Spark's
    JSON path parser accepts for arbitrary key text."""
    parts = ["$"]
    for el in parse_json_path(spec):
        if isinstance(el, int):
            parts.append(f"[{el}]")
        elif _BARE.fullmatch(el):
            parts.append(f".{el}")
        else:
            if "'" in el:
                raise ValueError(
                    f"JSON-string paths cannot address keys containing a "
                    f"single quote: {el!r} (use the native-column walk)"
                )
            parts.append(f"['{el}']")
    return "".join(parts)


def json_path_str(col: Column, spec: str) -> Column:
    """Extract from a JSON-string column along ``spec`` (missing -> NULL)."""
    return F.get_json_object(col, json_path_str_expr(spec))
