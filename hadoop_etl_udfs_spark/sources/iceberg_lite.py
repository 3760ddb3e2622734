"""Minimal pure-Python Apache Iceberg v1 table format: read AND write.

The north star names the engine's input "an Iceberg table of
Common-Crawl-style web pages"; this sandbox has no Iceberg runtime jar, so —
exactly like ``avro_lite`` for the Avro SerDe branch — the table format is
implemented from the PUBLIC Apache Iceberg Table Spec
(https://iceberg.apache.org/spec/, format version 1): a table directory with

    metadata/v<N>.metadata.json     table metadata + snapshot log
    metadata/version-hint.text      latest committed version number
    metadata/manifest-*.avro        manifest files (one entry per data file)
    metadata/snap-*.avro            manifest lists (one entry per manifest)
    data/snap-<id>/part-*.parquet   the data files themselves

The Avro container files use this repo's own spec-pure ``avro_lite`` codec
(nested records + arrays). What this buys at scale, same as real Iceberg:

- **Snapshot isolation / time travel**: every commit writes a NEW metadata
  version pointing at an immutable snapshot; readers resolve one version
  atomically and never see a half-committed table. ``snapshot_id=`` reads
  any historical snapshot, including ones replaced by an overwrite.
- **Manifest-level scan planning**: the file list comes from manifests, not
  directory listing — O(manifests) planning instead of O(files) object-store
  LIST calls, and per-file column bounds stored in the manifest prune data
  files BEFORE the Spark scan ever opens a footer (``where=``).
- **Append without rewrite**: an append commit reuses the previous
  snapshot's manifests in its new manifest list and adds one manifest for
  the new files.

Scope (documented subset, NOT a full Iceberg stack): format-version 1,
unpartitioned or IDENTITY-partitioned specs (partition values recorded per
file in manifests, plan-time partition pruning — the reference's Hive-style
partition pruning, HdfsService.java:92-110, as a manifest walk), flat
primitive schemas (the pages/documents shapes),
parquet data files, optional per-file bounds on ONE stats column
(long/timestamp), ADDITIVE schema evolution (appends may add columns —
fresh field ids, pre-evolution files read NULL; drops and type changes
fail loud). Planning is driver-side over manifest files — the same
division of labor as Iceberg's own client planner; the data path stays
fully distributed. Commits assume a single writer (version-hint is
last-writer-wins here; real Iceberg arbitrates concurrent commits through
an atomic catalog swap, which a local filesystem cannot express). Reference parity: the reference's table abstraction is an HCat/
metastore table of files (HCatTableMetadata.java:11-31, file enumeration
HdfsService.java:24-57); here the manifest list replaces the directory walk
and adds commit atomicity the reference never had.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re
import struct
import time

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .avro_lite import read_avro, write_avro

FORMAT_VERSION = 1

_SPARK_TO_ICEBERG = {
    "string": "string",
    "long": "long",
    "integer": "int",
    "double": "double",
    "float": "float",
    "binary": "binary",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
}
_ICEBERG_TO_DDL = {
    "string": "string",
    "long": "bigint",
    "int": "int",
    "double": "double",
    "float": "float",
    "binary": "binary",
    "boolean": "boolean",
    "date": "date",
    "timestamptz": "timestamp",
    "timestamp": "timestamp_ntz",
}


# ------------------------------------------------------------------- schema

def iceberg_schema_for(df_schema) -> dict:
    """Spark StructType -> Iceberg schema JSON (spec §Schemas; sequential
    field ids starting at 1, all fields optional — matching Spark's
    nullable-by-default semantics). Arrays of primitives map to the spec's
    list type (element-ids allocated after all field ids, spec-unique)."""
    fields = []
    next_el = len(df_schema.fields) + 1
    for i, f in enumerate(df_schema.fields, start=1):
        t = f.dataType.typeName()
        if t == "array":
            et = f.dataType.elementType.typeName()
            if et not in _SPARK_TO_ICEBERG:
                raise ValueError(
                    f"iceberg_lite cannot map array element type {et!r} "
                    f"(field {f.name!r}) — supported elements: "
                    f"{sorted(_SPARK_TO_ICEBERG)}"
                )
            typ: dict | str = {
                "type": "list", "element-id": next_el,
                "element": _SPARK_TO_ICEBERG[et],
                "element-required": not f.dataType.containsNull,
            }
            next_el += 1
        elif t not in _SPARK_TO_ICEBERG:
            raise ValueError(
                f"iceberg_lite cannot map Spark type {t!r} (field "
                f"{f.name!r}) — supported: {sorted(_SPARK_TO_ICEBERG)}"
            )
        else:
            typ = _SPARK_TO_ICEBERG[t]
        fields.append(
            {"id": i, "name": f.name, "required": False, "type": typ}
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _type_key(t) -> tuple:
    """Type identity for drift checks: element-ids are ALLOCATION artifacts
    (they depend on schema position), so two list types are the same type
    iff element type + requiredness match."""
    if isinstance(t, dict) and t.get("type") == "list":
        return ("list", t["element"], t.get("element-required", False))
    return ("prim", t)


def ddl_for_iceberg_schema(schema: dict, columns: list[str] | None = None) -> str:
    """Iceberg schema JSON -> Spark DDL string (optionally a column subset)."""
    parts = []
    for f in schema["fields"]:
        if columns is not None and f["name"] not in columns:
            continue
        t = f["type"]
        if isinstance(t, dict) and t.get("type") == "list" \
                and t.get("element") in _ICEBERG_TO_DDL:
            parts.append(
                f"{f['name']} array<{_ICEBERG_TO_DDL[t['element']]}>"
            )
            continue
        if not isinstance(t, str) or t not in _ICEBERG_TO_DDL:
            raise ValueError(
                f"iceberg_lite cannot read Iceberg type {t!r} "
                f"(field {f['name']!r})"
            )
        parts.append(f"{f['name']} {_ICEBERG_TO_DDL[t]}")
    return ", ".join(parts)


def _field_id(schema: dict, name: str) -> int:
    for f in schema["fields"]:
        if f["name"] == name:
            return f["id"]
    raise KeyError(f"column {name!r} not in Iceberg schema")


def _bound_bytes(v: int) -> bytes:
    """Iceberg single-value serialization for long/timestamp: 8-byte
    little-endian (spec Appendix D)."""
    return struct.pack("<q", int(v))


def _bound_value(b: bytes) -> int:
    return struct.unpack("<q", b)[0]


def _parse_partition_values(
    local_path: str, part_types: dict[str, str]
) -> dict:
    """Partition values of a data file, from the ``_p_<name>=v`` path
    segments Spark's partitionBy wrote (values URL-escaped by Spark;
    ``__HIVE_DEFAULT_PARTITION__`` = NULL), typed per ``part_types``
    (partition FIELD name -> the field's Iceberg result type — the source
    column type for identity, int/date ordinals for day/month)."""
    from urllib.parse import unquote

    vals: dict = {}
    for seg in local_path.split(os.sep):
        k, eq, v = seg.partition("=")
        if eq and k.startswith("_p_") and k[3:] in part_types:
            c = k[3:]
            v = unquote(v)
            if v == "__HIVE_DEFAULT_PARTITION__":
                vals[c] = None
            elif part_types[c] in ("long", "int", "date"):
                vals[c] = int(v)
            else:
                vals[c] = v
    return vals


# partition transforms (Iceberg spec §Partition Transforms, v1 subset):
# identity; the two time transforms natural for crawl data laid out by
# capture time — day (days from 1970-01-01, result type date) and month
# (months from 1970-01, result type int); bucket[N] (spec murmur3_x86_32
# seed-0 hash mod N — the layout for point-lookup pruning on a high-
# cardinality key like host); and truncate[W] (prefix/floor binning).
# The reference parses typed partition values out of Hive paths the same
# way (HdfsSerDeImportService.java:519-566); here the transform is
# declared in the table spec and evaluated once at write time.
_TIME_TRANSFORMS = ("day", "month")
_TRANSFORM_RESULT_TYPE = {"day": "date", "month": "int"}
_TRANSFORM_SOURCE_TYPES = {"timestamp", "timestamptz", "date"}
# bucket hashes the value's spec byte form (long ordinals little-endian,
# strings UTF-8); truncate bins longs by floor(v/W)*W and strings by
# W-char prefix
_BUCKET_SOURCE_TYPES = {"long", "int", "string", "date",
                        "timestamp", "timestamptz"}
_TRUNCATE_SOURCE_TYPES = {"long", "int", "string"}


def _parse_partition_by(partition_by) -> list[dict]:
    """``partition_by`` entries -> partition field descriptors.

    A plain column name declares an identity transform; ``day(col)`` /
    ``month(col)`` the time transforms; ``bucket(N, col)`` /
    ``truncate(W, col)`` the parameterized transforms (Iceberg SQL
    argument order). Each descriptor carries the partition FIELD name
    (Iceberg convention: ``<col>_day``, ``<col>_bucket``, ``<col>_trunc``),
    the transform's spec serialization (``bucket[N]``), its param, and the
    source column."""
    cols = (
        [partition_by] if isinstance(partition_by, str)
        else list(partition_by or [])
    )
    out = []
    for c in cols:
        m = re.fullmatch(r"(\w+)\s*\(\s*(?:(\d+)\s*,\s*)?(\w+)\s*\)", c.strip())
        if m:
            tr, param, src = m.group(1).lower(), m.group(2), m.group(3)
            if tr in _TIME_TRANSFORMS:
                if param is not None:
                    raise ValueError(f"{tr}() takes no parameter: {c!r}")
                out.append({"name": f"{src}_{tr}", "transform": tr,
                            "param": None, "src": src})
            elif tr in ("bucket", "truncate"):
                if param is None or int(param) <= 0:
                    raise ValueError(
                        f"{tr}() needs a positive parameter, e.g. "
                        f"'{tr}(16, {src})': {c!r}"
                    )
                suffix = "bucket" if tr == "bucket" else "trunc"
                out.append({
                    "name": f"{src}_{suffix}",
                    "transform": f"{tr}[{int(param)}]",
                    "param": int(param), "src": src,
                })
            else:
                raise ValueError(
                    f"unsupported partition transform {tr!r} in {c!r}; "
                    f"supported: identity (bare column), {_TIME_TRANSFORMS}, "
                    "bucket(N, col), truncate(W, col)"
                )
        else:
            out.append({"name": c.strip(), "transform": "identity",
                        "param": None, "src": c.strip()})
    return out


# --- spec bucket hash: murmur3_x86_32, seed 0 (Iceberg spec Appendix B).
# Vectorized numpy kernels — longs as two uint32 blocks of the 8-byte
# little-endian form; strings as UTF-8 bytes with masked per-block rounds
# (a chunk-level loop over the batch's max block count, never per row).
_MM_C1 = np.uint32(0xCC9E2D51)
_MM_C2 = np.uint32(0x1B873593)


def _mm_rotl(x, r: int):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _mm_mix(h, k):
    k = k * _MM_C1
    k = _mm_rotl(k, 15)
    k = k * _MM_C2
    h = h ^ k
    h = _mm_rotl(h, 13)
    return h * np.uint32(5) + np.uint32(0xE6546B64)


def _mm_fmix(h):
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> np.uint32(16))
    return h


def _murmur3_long(v: "np.ndarray") -> "np.ndarray":
    """murmur3_x86_32(little_endian_8bytes(v), seed=0) -> int32 array.
    Spec vectors: 34 -> 2017239379, 17486 (date) -> -653330422,
    1510871468000000 (ts µs) -> -2047944441."""
    u = np.ascontiguousarray(v, dtype=np.int64).view(np.uint64)
    h = np.zeros(u.shape, dtype=np.uint32)
    h = _mm_mix(h, (u & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    h = _mm_mix(h, (u >> np.uint64(32)).astype(np.uint32))
    h = h ^ np.uint32(8)
    return _mm_fmix(h).view(np.int32)


def _murmur3_bytes(vals: list) -> "np.ndarray":
    """murmur3_x86_32(bytes, seed=0) -> int32 array, batch-vectorized.
    Spec vector: b'iceberg' -> 1210000089.

    Round 7 (r6 advice): works over ONE flat concatenated buffer with
    per-row offsets instead of a dense (n_rows × max_len) matrix — one
    outlier-length string no longer inflates the batch to n·max_len bytes,
    and the per-row Python fill loop is gone (b''.join is C-level). Block
    j of row i is gathered as 4 little-endian byte loads at offset[i]+4j;
    the tail block masks off bytes past the row's end (which in the flat
    layout belong to the NEXT row), matching the zero-padding of the spec.
    The block loop still runs max(len)//4 times, but each pass touches
    only rows long enough to have that block."""
    n = len(vals)
    lens = np.fromiter((len(v) for v in vals), dtype=np.int64, count=n)
    h = np.zeros(n, dtype=np.uint32)
    if n and int(lens.max()) > 0:
        # 3 pad bytes so a tail gather never reads past the buffer end
        flat = np.frombuffer(b"".join(vals) + b"\x00\x00\x00", dtype=np.uint8)
        off = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=off[1:])

        def _gather_le32(pos: "np.ndarray") -> "np.ndarray":
            return (
                flat[pos].astype(np.uint32)
                | (flat[pos + 1].astype(np.uint32) << np.uint32(8))
                | (flat[pos + 2].astype(np.uint32) << np.uint32(16))
                | (flat[pos + 3].astype(np.uint32) << np.uint32(24))
            )

        full = lens // 4
        for j in range(int(full.max())):
            m = full > j
            k = _gather_le32(off[m] + 4 * j)
            h[m] = _mm_mix(h[m], k)
        tail = lens % 4
        tm = tail > 0
        if tm.any():
            tmask = np.array([0, 0xFF, 0xFFFF, 0xFFFFFF], dtype=np.uint32)
            tk = _gather_le32(off[tm] + 4 * full[tm]) & tmask[tail[tm]]
            tk = tk * _MM_C1
            tk = _mm_rotl(tk, 15)
            tk = tk * _MM_C2
            h[tm] = h[tm] ^ tk
    h = h ^ lens.astype(np.uint32)
    return _mm_fmix(h).view(np.int32)


def bucket_value(v, n: int) -> int:
    """The ``bucket[n]`` transform of a single value — for building
    ``partition_filter`` values against bucket-partitioned tables. ``v``
    is an int (long/date-ordinal/timestamp-µs source) or str (UTF-8)."""
    if isinstance(v, str):
        hv = int(_murmur3_bytes([v.encode("utf-8")])[0])
    else:
        hv = int(_murmur3_long(np.array([int(v)]))[0])
    return (hv & 0x7FFFFFFF) % n


def _bucket_udf(n: int, is_string: bool):
    """Arrow-batched pandas UDF computing the spec bucket transform at
    write time. NULL handling lives in the CALLER's when/coalesce wrapper
    (_transform_expr): a long column containing any NULL arrives in pandas
    as lossy float64 (values above 2^53 round before hashing — wrong
    buckets recorded in the manifest, silently pruned reads later), so the
    UDF only ever sees a coalesced null-free input and may assume exact
    int64/str values."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _b(s: pd.Series) -> pd.Series:
        if is_string:
            hv = _murmur3_bytes([x.encode("utf-8") for x in s])
        else:
            hv = _murmur3_long(s.to_numpy(dtype=np.int64))
        out = (hv.astype(np.int64) & 0x7FFFFFFF) % n
        return pd.Series(out, index=s.index, dtype="int32")

    return _b


def _transform_expr(tr: str, src: str, param: int | None = None,
                    src_type: str | None = None):
    """Spark expression computing a partition transform of ``src``.

    Day/month ordinals follow the spec (days since 1970-01-01 / months
    since 1970-01); timestamps are interpreted in the session timezone
    (UTC in every session this repo builds — session.py pins it).
    bucket[N] hashes the spec byte form via the vectorized murmur3 kernel
    (long ordinals for int/long/date/timestamp sources, UTF-8 for
    strings); truncate[W] is pure JVM (`v - pmod(v, W)` floors negatives
    per spec; W-char prefix for strings)."""
    if tr == "identity":
        return F.col(src)
    if tr == "day":
        return F.datediff(F.col(src).cast("date"), F.lit("1970-01-01"))
    if tr == "month":
        return (F.year(src) - F.lit(1970)) * F.lit(12) + F.month(src) - F.lit(1)
    if tr.startswith("bucket["):
        # the when/coalesce wrapper keeps NULLs out of the UDF batch: a
        # nullable long column would otherwise reach pandas as float64 and
        # round values above 2^53 before hashing (wrong manifest buckets,
        # silently pruned reads)
        if src_type == "string":
            b = _bucket_udf(param, True)(F.coalesce(F.col(src), F.lit("")))
            return F.when(F.col(src).isNull(), F.lit(None)).otherwise(b)
        if src_type in ("timestamp", "timestamptz"):
            ord_col = F.unix_micros(F.col(src))
        elif src_type == "date":
            ord_col = F.datediff(F.col(src), F.lit("1970-01-01")).cast("long")
        else:
            ord_col = F.col(src).cast("long")
        b = _bucket_udf(param, False)(F.coalesce(ord_col, F.lit(0)))
        return F.when(F.col(src).isNull(), F.lit(None)).otherwise(b)
    if tr.startswith("truncate["):
        if src_type == "string":
            return F.substring(F.col(src), 1, param)
        return F.col(src) - F.pmod(F.col(src), F.lit(param))
    raise ValueError(f"unknown transform {tr!r}")


def day_ordinal(d: str) -> int:
    """'YYYY-MM-DD' -> the day transform's stored value (days from epoch) —
    for building ``partition_filter`` values against day-partitioned
    tables."""
    import datetime as _dt

    return (_dt.date.fromisoformat(d) - _dt.date(1970, 1, 1)).days


def month_ordinal(m: str) -> int:
    """'YYYY-MM' -> the month transform's stored value (months from
    1970-01)."""
    y, mo = m.split("-")
    return (int(y) - 1970) * 12 + int(mo) - 1


# ------------------------------------------------------------ avro schemas

def _kv_array(name: str, fid: int) -> dict:
    # Iceberg stores map<int, binary> bounds as an array of k/v records
    # (Avro map keys must be strings); field ids per spec Appendix C
    return {
        "name": name,
        "field-id": fid,
        "type": ["null", {
            "type": "array",
            "items": {
                "type": "record",
                "name": f"k{fid}_v",
                "fields": [
                    {"name": "key", "type": "int", "field-id": fid * 100 + 1},
                    {"name": "value", "type": "bytes",
                     "field-id": fid * 100 + 2},
                ],
            },
        }],
    }


# partition-value storage types in the manifest's r102 record; the day
# transform's result type is date, stored as its int ordinal (Avro's
# logical date representation)
_ICEBERG_TO_AVRO = {"string": "string", "long": "long", "int": "int",
                    "date": "int"}
# IDENTITY transforms support a narrower set than the manifest can store:
# a date source would Hive-serialize as 'YYYY-MM-DD' in the path but the
# manifest stores date partition values as int ordinals — parse would
# crash AFTER the data write. Date layouts belong to day()/month().
_IDENTITY_SOURCE_TYPES = {"string", "long", "int"}


def manifest_entry_schema(spec_fields: list[dict] | None = None) -> dict:
    """Avro schema of one manifest entry (spec §Manifests, v1 subset:
    required core fields + optional column bounds). The partition record
    r102 is empty for the unpartitioned spec; with an identity partition
    spec it carries one optional field per partition column (the partition
    VALUES live in the manifest, which is what makes partition pruning a
    plan-time manifest walk — the reference's PartitionPathFilter.java:33-82
    pruned Hive directory paths the same way, one directory level per
    partition column)."""
    part_fields = [
        {"name": f["name"],
         "type": ["null", _ICEBERG_TO_AVRO[f["iceberg_type"]]],
         "field-id": f["field-id"]}
        for f in (spec_fields or [])
    ]
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "field-id": 102,
             "type": {"type": "record", "name": "r102",
                      "fields": part_fields}},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            _kv_array("lower_bounds", 125),
            _kv_array("upper_bounds", 128),
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


def manifest_file_schema() -> dict:
    """Avro schema of one manifest-list entry (spec §Manifest Lists, v1
    subset)."""
    return {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "added_snapshot_id", "type": ["null", "long"],
             "field-id": 503},
        ],
    }


# ----------------------------------------------------------------- metadata

def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _atomic_write(dest: str, content: str) -> None:
    """Temp-file + ``os.replace`` (atomic on POSIX): a crash mid-write can
    never leave a torn/empty metadata file or version hint — readers see
    the old committed state or the new one, nothing in between. The parent
    directory is fsynced after the replace so the RENAME itself is durable
    across power loss, not just process kills (ADVICE r5)."""
    tmp = f"{dest}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(content)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, dest)
    dfd = os.open(os.path.dirname(dest) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def current_version(path: str) -> int:
    """Committed metadata version from version-hint.text, falling back to
    the highest v<N>.metadata.json present (the spec's recovery path) —
    also when the hint exists but is empty/corrupt (a torn write from a
    pre-atomic-commit version of this module, or external damage)."""
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            txt = f.read().strip()
        try:
            return int(txt)
        except ValueError:
            pass  # corrupt hint -> glob recovery below
    versions = [
        int(os.path.basename(p)[1:].split(".")[0])
        for p in glob.glob(os.path.join(_meta_dir(path), "v*.metadata.json"))
    ]
    if not versions:
        raise FileNotFoundError(f"no Iceberg metadata under {path!r}")
    return max(versions)


def read_table_meta(path: str, version: int | None = None) -> dict:
    v = version if version is not None else current_version(path)
    with open(os.path.join(_meta_dir(path), f"v{v}.metadata.json")) as f:
        return json.load(f)


def iceberg_snapshots(path: str) -> list[dict]:
    """Snapshot log (id, timestamp-ms, operation) — the time-travel index."""
    meta = read_table_meta(path)
    return [
        {
            "snapshot_id": s["snapshot-id"],
            "timestamp_ms": s["timestamp-ms"],
            "operation": s.get("summary", {}).get("operation"),
            "is_current": s["snapshot-id"] == meta.get("current-snapshot-id"),
        }
        for s in meta.get("snapshots", [])
    ]


class SnapshotNotFoundError(ValueError):
    """A requested snapshot id is absent from the table metadata — e.g.
    expired by ``expire_snapshots``. A dedicated type (ADVICE r5) so the
    ingest tick's expiry-recovery path catches exactly this condition,
    not any ValueError whose message happens to contain 'not found'."""


def _resolve_snapshot(meta: dict, snapshot_id: int | None) -> dict:
    snaps = meta.get("snapshots", [])
    if not snaps:
        raise ValueError("Iceberg table has no snapshots")
    if snapshot_id is None:
        cur = meta["current-snapshot-id"]
        snapshot_id = cur
    for s in snaps:
        if s["snapshot-id"] == snapshot_id:
            return s
    raise SnapshotNotFoundError(
        f"snapshot {snapshot_id} not found; have "
        f"{[s['snapshot-id'] for s in snaps]}"
    )


def _schema_for_snapshot(meta: dict, snap: dict) -> dict:
    """The schema a snapshot was committed UNDER (Iceberg's snapshot-schema
    semantics): time-traveling to a pre-evolution snapshot must return the
    pre-evolution shape, not the current schema with phantom NULL columns.
    Snapshots carry ``schema-id`` into the ``schemas`` list; snapshots from
    before this field existed fall back to the current schema (documented
    current-schema projection for legacy tables)."""
    sid = snap.get("schema-id")
    if sid is not None:
        for s in meta.get("schemas", []):
            if s.get("schema-id") == sid:
                return s
    return meta["schema"]


# ------------------------------------------------------------------- write

def write_iceberg_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    stats_col: str | list[str] | None = None,
    partition_by: str | list[str] | None = None,
) -> int:
    """Commit ``df`` to the Iceberg table at ``path``; returns the new
    snapshot id.

    ``mode="append"`` adds a snapshot whose manifest list carries forward
    every previous manifest plus one new manifest for the new files;
    ``mode="overwrite"`` adds a snapshot whose manifest list holds ONLY the
    new manifest (prior snapshots stay readable via ``snapshot_id=`` — an
    overwrite never deletes history, exactly like Iceberg).

    ``stats_col`` (long/timestamp column) stores per-file [min, max] bounds
    in the manifest — computed DISTRIBUTEDLY (one groupBy-input_file_name
    aggregate over the freshly written files, not a driver loop over
    footers); readers prune files against them before any scan.

    ``partition_by`` declares the partition spec: a bare column name
    (string/long/int) is an IDENTITY transform; ``"day(col)"`` /
    ``"month(col)"`` (timestamp/date source) are the spec's time
    transforms — the idiomatic Iceberg layout for crawl data keyed by
    capture time, stored as day/month ordinals (spec §Partition
    Transforms). Data files land under one directory per partition value,
    the values are recorded per file in the manifest entries (spec
    §Manifests r102), and readers prune files against them at plan time
    (``iceberg_data_files(partition_filter=...)`` — ``day_ordinal`` /
    ``month_ordinal`` build filter values for transformed fields) — the
    reference's core read trick (Hive-style partition pruning,
    HdfsService.java:92-110 + PartitionPathFilter.java:33-82, typed
    partition-value parse HdfsSerDeImportService.java:519-566) expressed
    as a manifest walk. The partition SOURCE columns are KEPT in the data
    files, so the read path is unchanged; the directory layout uses a
    ``_p_<name>=`` alias to keep them there. Appends must use the table's
    current spec (names AND transforms); an overwrite may change it (a new
    spec-id becomes the default, as in Iceberg spec evolution). Identity
    string partition values must not be '' — Spark's Hive layout conflates
    '' with NULL, so the write raises before committing (ADVICE r5).

    The metadata version and version-hint commit via temp-file +
    ``os.replace`` — a crash mid-commit can never brick reads with a torn
    hint (the spec's 'readers never see a half-committed table' claim made
    true under kill -9).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    spark = df.sparkSession
    schema_json = iceberg_schema_for(df.schema)
    part_fields = _parse_partition_by(partition_by)
    for pf_ in part_fields:
        if pf_["src"] not in df.columns:
            raise ValueError(
                f"partition_by column {pf_['src']!r} not in DataFrame "
                f"columns {df.columns}"
            )
    try:
        prev_meta = read_table_meta(path)
        version = current_version(path)
        snapshot_id = max(
            s["snapshot-id"] for s in prev_meta.get("snapshots", [])
        ) + 1
        prev_fields = {f["name"]: f for f in prev_meta["schema"]["fields"]}
        df_names = [f["name"] for f in schema_json["fields"]]
        missing = [n for n in prev_fields if n not in df_names]
        if missing:
            raise ValueError(
                "iceberg_lite supports ADDITIVE schema evolution only: the "
                f"commit is missing existing table columns {missing} "
                f"(table {sorted(prev_fields)}, df {df_names})"
            )
        # keep existing field ids; new columns get fresh sequential ids —
        # Iceberg's additive evolution. Pre-evolution data files read the
        # new columns as NULL (explicit-schema parquet read fills by name).
        next_id = prev_meta["last-column-id"] + 1
        evolved = list(prev_meta["schema"]["fields"])
        for f in schema_json["fields"]:
            if f["name"] not in prev_fields:
                nf = {**f, "id": next_id}
                next_id += 1
                if isinstance(nf["type"], dict):
                    # list element-ids must stay table-unique: re-allocate
                    # from the table's id pool, not the new df's positions
                    nf["type"] = {**nf["type"], "element-id": next_id}
                    next_id += 1
                evolved.append(nf)
            elif _type_key(prev_fields[f["name"]]["type"]) != _type_key(f["type"]):
                # type changes (incl. timestamp tz flavor — a tz change
                # silently shifts values) must fail loud
                raise ValueError(
                    f"column {f['name']!r} changed type "
                    f"{prev_fields[f['name']]['type']!r} -> {f['type']!r}; "
                    "iceberg_lite does not rewrite column types"
                )
        # snapshot-schema tracking (Iceberg's schemas list): an unevolved
        # commit reuses the current schema + id; an evolved one appends a
        # NEW schema with the next schema-id — snapshots record which one
        # they were committed under, and time-travel reads resolve THAT
        # schema (_schema_for_snapshot), not the current projection
        prev_schemas = prev_meta.get("schemas") or [prev_meta["schema"]]
        if evolved == prev_meta["schema"]["fields"]:
            schema_json = prev_meta["schema"]
            schemas = prev_schemas
        else:
            sid = max(s.get("schema-id", 0) for s in prev_schemas) + 1
            schema_json = {"type": "struct", "schema-id": sid,
                           "fields": evolved}
            schemas = prev_schemas + [schema_json]
    except FileNotFoundError:
        prev_meta, version, snapshot_id = None, 0, 1
        schemas = [schema_json]

    # partition spec: identity + day/month transforms over schema field
    # ids. Appends must match the table's current default spec (a silent
    # mismatch would split the table across layouts); overwrite may
    # introduce a new spec (fresh spec-id, like Iceberg partition-spec
    # evolution).
    spec_fields = [
        {"name": pf_["name"], "transform": pf_["transform"],
         "source-id": _field_id(schema_json, pf_["src"]),
         "field-id": 1000 + i}
        for i, pf_ in enumerate(part_fields)
    ]
    col_types = {f["name"]: f["type"] for f in schema_json["fields"]}
    for pf_ in part_fields:
        src_t = col_types[pf_["src"]]
        tr = pf_["transform"]
        if not isinstance(src_t, str):
            raise TypeError(
                f"partition_by column {pf_['src']!r} has a nested type "
                f"{src_t!r}; partition transforms need primitive sources"
            )
        if tr == "identity":
            if src_t not in _IDENTITY_SOURCE_TYPES:
                raise TypeError(
                    f"partition_by column {pf_['src']!r} has type "
                    f"{src_t!r}; identity specs support "
                    f"{sorted(_IDENTITY_SOURCE_TYPES)} (use day()/month() "
                    "for date/timestamp layouts)"
                )
        elif tr in _TIME_TRANSFORMS:
            if src_t not in _TRANSFORM_SOURCE_TYPES:
                raise TypeError(
                    f"{tr}() partition transform needs a "
                    f"timestamp/date source column; {pf_['src']!r} is {src_t!r}"
                )
        elif tr.startswith("bucket["):
            if src_t not in _BUCKET_SOURCE_TYPES:
                raise TypeError(
                    f"bucket() partition transform supports "
                    f"{sorted(_BUCKET_SOURCE_TYPES)} sources; "
                    f"{pf_['src']!r} is {src_t!r}"
                )
        elif tr.startswith("truncate["):
            if src_t not in _TRUNCATE_SOURCE_TYPES:
                raise TypeError(
                    f"truncate() partition transform supports "
                    f"{sorted(_TRUNCATE_SOURCE_TYPES)} sources; "
                    f"{pf_['src']!r} is {src_t!r}"
                )

    def _result_type(pf_: dict) -> str:
        tr = pf_["transform"]
        if tr == "identity" or tr.startswith("truncate["):
            return col_types[pf_["src"]]
        if tr.startswith("bucket["):
            return "int"
        return _TRANSFORM_RESULT_TYPE[tr]

    # partition FIELD name -> stored value type (source type for identity
    # and truncate, int for bucket, the transform's result type for
    # day/month)
    part_types = {pf_["name"]: _result_type(pf_) for pf_ in part_fields}
    spec_key = [(pf_["name"], pf_["transform"]) for pf_ in part_fields]

    def _sp_key(sp: dict) -> list[tuple[str, str]]:
        return [(f["name"], f.get("transform", "identity"))
                for f in sp["fields"]]

    prev_specs = (prev_meta or {}).get("partition-specs") or [
        {"spec-id": 0, "fields": []}
    ]
    if prev_meta is not None and mode == "append":
        # appends must use the CURRENT default spec — matching any
        # historical spec (e.g. the pre-re-spec one) would silently split
        # the table's layout
        cur_spec = next(
            sp for sp in prev_specs
            if sp["spec-id"] == prev_meta.get("default-spec-id", 0)
        )
        if _sp_key(cur_spec) != spec_key:
            raise ValueError(
                f"append partition_by={spec_key} does not match the "
                f"table's spec {_sp_key(cur_spec)}; "
                "appends must use the current spec (overwrite may re-spec)"
            )
        this_spec, specs = cur_spec, prev_specs
    else:
        this_spec = None
        for sp in prev_specs:
            if _sp_key(sp) == spec_key:
                this_spec = sp
                break
        if this_spec is None:
            this_spec = {
                "spec-id": max(sp["spec-id"] for sp in prev_specs) + 1
                if prev_meta is not None else 0,
                "fields": spec_fields,
            }
            specs = prev_specs + [this_spec] \
                if prev_meta is not None else [this_spec]
        else:
            specs = prev_specs

    # 1) data files (distributed parquet write, one subdir per snapshot).
    # A commit that crashed between the data write and the metadata commit
    # leaves an orphaned snap-<id> dir; the retry must not collide with it
    # (orphans are reclaimed separately by remove_orphan_files, like
    # Iceberg's own remove_orphan_files action)
    data_dir = os.path.join(path, "data", f"snap-{snapshot_id}")
    attempt = 0
    while os.path.exists(data_dir):
        attempt += 1
        data_dir = os.path.join(path, "data", f"snap-{snapshot_id}-r{attempt}")
    # time-transform timezone guard (r6 advice): day()/month() over a
    # TIMESTAMP source evaluate through session-timezone-dependent
    # expressions (cast('date'), F.year/F.month); a non-UTC session would
    # write ordinals that disagree with day_ordinal()/month_ordinal()
    # filters and the spec's UTC ordinals — silent wrong pruning on later
    # reads. Fail loud at write instead. DATE sources are tz-independent
    # (a date has no zone), and bucket(timestamp) hashes unix_micros,
    # which is tz-independent too — neither needs the guard.
    tz_parts = [
        pf_["name"] for pf_ in part_fields
        if pf_["transform"] in ("day", "month")
        and col_types[pf_["src"]] in ("timestamp", "timestamptz")
    ]
    if tz_parts:
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
            raise ValueError(
                f"partition fields {tz_parts} use day()/month() over a "
                f"timestamp source, but spark.sql.session.timeZone is "
                f"{tz!r} — the written ordinals would disagree with the "
                "spec's UTC ordinals and with day_ordinal()/"
                "month_ordinal() filters. Set the session timezone to "
                "UTC (session.get_spark/get_job_spark pin it)."
            )
    if part_fields:
        # directory layout on a _p_<name> ALIAS: partitionBy strips its
        # columns from the data files, but partition SOURCE columns may
        # stay in the files per spec — keeping them means the read path
        # (explicit-schema read of file lists) needs no manifest-constant
        # fill-in. Transformed fields are computed here, once, at write.
        w = df
        for pf_ in part_fields:
            w = w.withColumn(
                f"_p_{pf_['name']}",
                _transform_expr(pf_["transform"], pf_["src"],
                                pf_["param"], col_types[pf_["src"]]),
            )
        w.write.mode("errorifexists").partitionBy(
            *[f"_p_{pf_['name']}" for pf_ in part_fields]
        ).parquet(data_dir)
    else:
        df.write.mode("errorifexists").parquet(data_dir)

    # 2) per-file stats: one distributed aggregate over the new files.
    # stats_col accepts a single column or a list — every stats column gets
    # [min, max] bounds in the manifest and becomes a pruning predicate.
    scan = spark.read.parquet(data_dir)
    stats_cols = (
        [stats_col] if isinstance(stats_col, str)
        else list(stats_col or [])
    )
    aggs = [F.count("*").alias("n")]
    t = dict((f.name, f.dataType.typeName()) for f in df.schema.fields)
    for sc in stats_cols:
        if t.get(sc) in ("timestamp", "timestamp_ntz"):
            c = F.unix_micros(F.col(sc))
        elif t.get(sc) in ("long", "integer", "date"):
            c = F.col(sc).cast("long")
        else:
            raise ValueError(
                f"stats column {sc!r} must be long/int/timestamp/date, "
                f"got {t.get(sc)!r}"
            )
        aggs += [F.min(c).alias(f"lo_{sc}"), F.max(c).alias(f"hi_{sc}")]
    # empty-string guard (ADVICE r5): Spark's partitionBy writes
    # __HIVE_DEFAULT_PARTITION__ for BOTH null and '' values, so an
    # empty-string identity partition value would be recorded as NULL in
    # the manifest and partition_filter={'col': ''} would silently prune
    # files that contain it. The source columns are kept in the data
    # files, so the check piggybacks on the stats aggregate (no extra
    # job) and the raise lands BEFORE the metadata commit — the orphaned
    # snap dir is reclaimed by remove_orphan_files, the standard
    # crashed-commit path.
    # identity AND truncate of a string both emit '' exactly when the
    # source is '' (a W-char prefix of a non-empty string is non-empty),
    # so the same source-column check covers both
    id_str_parts = [
        pf_["src"] for pf_ in part_fields
        if (pf_["transform"] == "identity"
            or pf_["transform"].startswith("truncate["))
        and col_types[pf_["src"]] == "string"
    ]
    for c in id_str_parts:
        aggs.append(F.max(F.col(c) == F.lit("")).alias(f"emptyp_{c}"))
    stats = {
        r["f"]: r
        for r in scan.groupBy(F.input_file_name().alias("f")).agg(*aggs).collect()
    }
    empty_cols = sorted({
        c for c in id_str_parts
        for r in stats.values() if r[f"emptyp_{c}"]
    })
    if empty_cols:
        raise ValueError(
            f"partition_by column(s) {empty_cols} contain empty-string "
            "values: Spark's Hive directory layout conflates '' with NULL "
            "(__HIVE_DEFAULT_PARTITION__), so the manifest would record "
            "them as NULL and pruned reads would silently drop their rows "
            "— filter or recode '' before writing (no snapshot was "
            "committed)"
        )

    # 3) manifest file (one entry per data file, status=1 ADDED; partition
    # values parsed from the _p_<name>= path segments Spark wrote)
    fids = {sc: _field_id(schema_json, sc) for sc in stats_cols}
    entries = []
    for uri, r in sorted(stats.items()):
        # input_file_name() yields PERCENT-ENCODED file:///... URIs —
        # normalize to a plain absolute path (abspath collapses the
        # scheme's slashes) and unquote ONCE so manifest paths compare
        # equal to on-disk os.path/glob paths everywhere downstream.
        # The single unquote matters with partition_by: a value like
        # 'a b' or 'x=y' puts Hive-escaped bytes in the dir name, which
        # the URI encodes a second time ('%' -> '%25'); one decode
        # recovers exactly the on-disk name, and _parse_partition_values'
        # own unquote then recovers the logical value.
        from urllib.parse import unquote as _unquote

        local = os.path.abspath(
            _unquote(uri[len("file:"):] if uri.startswith("file:") else uri)
        )
        lower = [
            {"key": fids[sc], "value": _bound_bytes(r[f"lo_{sc}"])}
            for sc in stats_cols if r[f"lo_{sc}"] is not None
        ] or None
        upper = [
            {"key": fids[sc], "value": _bound_bytes(r[f"hi_{sc}"])}
            for sc in stats_cols if r[f"hi_{sc}"] is not None
        ] or None
        entries.append({
            "status": 1,
            "snapshot_id": snapshot_id,
            "data_file": {
                "file_path": local,
                "file_format": "PARQUET",
                "partition": _parse_partition_values(local, part_types),
                "record_count": r["n"],
                "file_size_in_bytes": os.path.getsize(local),
                "lower_bounds": lower,
                "upper_bounds": upper,
            },
        })
    os.makedirs(_meta_dir(path), exist_ok=True)
    manifest_path = os.path.join(
        _meta_dir(path), f"manifest-{snapshot_id}.avro"
    )
    mf_spec_fields = [
        {"name": f["name"], "field-id": f["field-id"],
         "iceberg_type": part_types[f["name"]]}
        for f in this_spec["fields"]
    ]
    write_avro(manifest_path, manifest_entry_schema(mf_spec_fields), entries)

    # 4) manifest list: previous manifests carried forward on append
    manifests = []
    if mode == "append" and prev_meta is not None:
        prev_snap = _resolve_snapshot(prev_meta, None)
        _, prev_list = read_avro(prev_snap["manifest-list"])
        manifests += prev_list
    manifests.append({
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": this_spec["spec-id"],
        "added_snapshot_id": snapshot_id,
    })
    list_path = os.path.join(_meta_dir(path), f"snap-{snapshot_id}.avro")
    write_avro(list_path, manifest_file_schema(), manifests)

    # 5) new metadata version + commit via version-hint
    now_ms = int(time.time() * 1000)
    snapshot = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": now_ms,
        "summary": {"operation": mode},
        "manifest-list": list_path,
        "schema-id": schema_json.get("schema-id", 0),
    }
    meta = {
        "format-version": FORMAT_VERSION,
        "table-uuid": hashlib.md5(
            os.path.abspath(path).encode()
        ).hexdigest(),
        "location": os.path.abspath(path),
        "last-updated-ms": now_ms,
        # spec: highest ASSIGNED column id, including nested list
        # element-ids — evolution allocates fresh ids above this, so an
        # element-id left out would collide with the next added column
        "last-column-id": max(
            max(f["id"], f["type"].get("element-id", 0))
            if isinstance(f["type"], dict) else f["id"]
            for f in schema_json["fields"]
        ),
        "schema": schema_json,
        "schemas": schemas,
        "current-schema-id": schema_json.get("schema-id", 0),
        "partition-spec": this_spec["fields"],
        "partition-specs": specs,
        "default-spec-id": this_spec["spec-id"],
        "properties": {},
        "current-snapshot-id": snapshot_id,
        "snapshots": (prev_meta.get("snapshots", []) if prev_meta else [])
        + [snapshot],
        "snapshot-log": (prev_meta.get("snapshot-log", []) if prev_meta else [])
        + [{"snapshot-id": snapshot_id, "timestamp-ms": now_ms}],
    }
    new_version = version + 1
    # commit order: metadata file first, hint last, both atomic — a crash
    # anywhere leaves either the old committed version fully readable or
    # the new one (never a torn hint / half metadata; ADVICE r4)
    _atomic_write(
        os.path.join(_meta_dir(path), f"v{new_version}.metadata.json"),
        json.dumps(meta, indent=1),
    )
    _atomic_write(
        os.path.join(_meta_dir(path), "version-hint.text"), str(new_version)
    )
    return snapshot_id


# -------------------------------------------------------------------- read

def iceberg_data_files(
    path: str,
    snapshot_id: int | None = None,
    where: tuple[str, int, int] | None = None,
    partition_filter: dict | None = None,
) -> tuple[list[str], dict]:
    """Plan a scan: resolve the snapshot, walk its manifest list, return
    live data-file paths (+ planning stats). ``where=(col, lo, hi)`` keeps
    only files whose stored [lower, upper] bounds overlap [lo, hi]; files
    without bounds are conservatively kept. ``partition_filter`` maps
    identity-partition columns to an allowed value (or list of values):
    OR within a column, AND across columns — the reference's OR-of-AND
    partition predicate shape (PartitionPathFilter.java:33-82) evaluated
    against the partition values stored in manifest entries; files from an
    unpartitioned spec (no stored value) are conservatively kept.
    Driver-side over manifest files only — the same planner/data split as
    real Iceberg clients."""
    meta = read_table_meta(path)
    snap = _resolve_snapshot(meta, snapshot_id)
    _, manifests = read_avro(snap["manifest-list"])
    fid = _field_id(meta["schema"], where[0]) if where else None
    pf = {
        c: (set(v) if isinstance(v, (list, tuple, set)) else {v})
        for c, v in (partition_filter or {}).items()
    }
    files: list[str] = []
    total = kept = 0
    for m in manifests:
        _, entries = read_avro(m["manifest_path"])
        for e in entries:
            if e["status"] == 2:  # DELETED
                continue
            total += 1
            d = e["data_file"]
            part = d.get("partition") or {}
            if pf and any(
                c in part and part[c] not in allowed
                for c, allowed in pf.items()
            ):
                continue
            if fid is not None:
                lo = next(
                    (kv["value"] for kv in (d["lower_bounds"] or [])
                     if kv["key"] == fid), None,
                )
                hi = next(
                    (kv["value"] for kv in (d["upper_bounds"] or [])
                     if kv["key"] == fid), None,
                )
                if lo is not None and hi is not None and (
                    _bound_value(hi) < where[1] or _bound_value(lo) > where[2]
                ):
                    continue
            kept += 1
            files.append(d["file_path"])
    return files, {
        "snapshot_id": snap["snapshot-id"],
        "n_manifests": len(manifests),
        "files_total": total,
        "files_kept": kept,
    }


def read_iceberg(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    columns: list[str] | None = None,
    where: tuple[str, int, int] | None = None,
    partition_filter: dict | None = None,
) -> DataFrame:
    """Iceberg table -> DataFrame. Schema comes from the table metadata
    (never inferred — SURVEY.md §1.4) and, when ``snapshot_id``
    time-travels, from THAT snapshot's schema (``schemas`` +
    per-snapshot schema-id): a pre-evolution read returns the
    pre-evolution shape, matching Iceberg's snapshot-schema semantics
    (ADVICE r4). ``where=(col, lo, hi)`` prunes data files at PLAN time
    via manifest bounds (epoch-µs for timestamp columns);
    ``partition_filter={col: value-or-list}`` prunes via the identity
    partition values in the manifests — the residual row filter is the
    caller's, exactly like Iceberg + Spark divide the work."""
    meta = read_table_meta(path)
    snap = _resolve_snapshot(meta, snapshot_id)
    files, _ = iceberg_data_files(path, snapshot_id, where, partition_filter)
    ddl = ddl_for_iceberg_schema(_schema_for_snapshot(meta, snap))
    if not files:
        df = spark.createDataFrame([], ddl)
    else:
        df = spark.read.schema(ddl).parquet(*files)
    return df.select(*columns) if columns else df


def expire_snapshots(path: str, keep_last: int = 1) -> dict:
    """Iceberg's VACUUM / expire_snapshots: drop all but the most recent
    ``keep_last`` snapshots from the table metadata and DELETE every data
    file and manifest no retained snapshot references. Time travel to an
    expired snapshot then fails (by design — that's what expiry means);
    the current snapshot is always retained. Returns deletion counts.

    Storage-reclaim semantics match Iceberg: an overwrite never frees bytes
    until its predecessors expire. Like the writer, assumes a single
    maintainer (no concurrent-commit arbitration on a local filesystem)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the current snapshot)")
    meta = read_table_meta(path)
    version = current_version(path)
    snaps = meta.get("snapshots", [])
    retained = snaps[-keep_last:]
    expired = snaps[:-keep_last]
    if not expired:
        return {"expired_snapshots": 0, "deleted_files": 0,
                "deleted_manifests": 0}

    def _live(snapshot_list):
        files, manifests = set(), set()
        for s in snapshot_list:
            _, mlist = read_avro(s["manifest-list"])
            for m in mlist:
                manifests.add(m["manifest_path"])
                _, entries = read_avro(m["manifest_path"])
                for e in entries:
                    if e["status"] != 2:
                        files.add(e["data_file"]["file_path"])
        return files, manifests

    keep_files, keep_manifests = _live(retained)
    drop_files, drop_manifests = _live(expired)
    dead_files = drop_files - keep_files
    dead_manifests = drop_manifests - keep_manifests
    for f in dead_files:
        if os.path.exists(f):
            os.remove(f)
    for m in dead_manifests:
        if os.path.exists(m):
            os.remove(m)
    for s in expired:
        if s["manifest-list"] not in {r["manifest-list"] for r in retained}:
            if os.path.exists(s["manifest-list"]):
                os.remove(s["manifest-list"])
    retained_ids = {s["snapshot-id"] for s in retained}
    new_meta = {
        **meta,
        "snapshots": retained,
        "snapshot-log": [
            e for e in meta.get("snapshot-log", [])
            if e["snapshot-id"] in retained_ids
        ],
    }
    new_version = version + 1
    _atomic_write(
        os.path.join(_meta_dir(path), f"v{new_version}.metadata.json"),
        json.dumps(new_meta, indent=1),
    )
    _atomic_write(
        os.path.join(_meta_dir(path), "version-hint.text"), str(new_version)
    )
    return {
        "expired_snapshots": len(expired),
        "deleted_files": len(dead_files),
        "deleted_manifests": len(dead_manifests),
    }


def remove_orphan_files(path: str) -> dict:
    """Iceberg's remove_orphan_files: delete data files under ``data/``
    that NO snapshot references — the leftovers of commits that crashed
    between the data write and the metadata commit. Never touches
    referenced files or metadata; safe to run any time (single-maintainer
    assumption, as everywhere in this module)."""
    meta = read_table_meta(path)
    live: set[str] = set()
    for s in meta.get("snapshots", []):
        _, mlist = read_avro(s["manifest-list"])
        for m in mlist:
            _, entries = read_avro(m["manifest_path"])
            for e in entries:
                live.add(os.path.abspath(e["data_file"]["file_path"]))
    removed = 0
    for f in glob.glob(os.path.join(path, "data", "**"), recursive=True):
        base = os.path.basename(f)
        if base.startswith(("_", ".")):  # markers/CRCs, not data
            continue
        if os.path.isfile(f) and os.path.abspath(f) not in live:
            os.remove(f)
            removed += 1
    return {"deleted_files": removed, "live_files": len(live)}


def iceberg_added_files(
    path: str, from_snapshot_id: int, to_snapshot_id: int | None = None
) -> list[str]:
    """Data files live in ``to`` (default: current) but not in ``from`` —
    the incremental-consumption primitive: a periodic encode job processes
    only the files new commits added, never rescanning the table. Computed
    as a set difference of the two snapshots' live file lists, which is
    correct for appends AND overwrites (an overwrite's files are all
    "added")."""
    old, _ = iceberg_data_files(path, from_snapshot_id)
    new, _ = iceberg_data_files(path, to_snapshot_id)
    old_set = set(old)
    return [f for f in new if f not in old_set]


def read_iceberg_incremental(
    spark: SparkSession,
    path: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """DataFrame over ONLY the rows added after ``from_snapshot_id`` — what
    the encode pipeline consumes per ingestion cycle. Composes with the
    content-addressed resume contract: even a re-run over an already-seen
    diff skips every chunk."""
    meta = read_table_meta(path)
    files = iceberg_added_files(path, from_snapshot_id, to_snapshot_id)
    # schema of the TO side (the snapshot whose rows are being consumed)
    to_snap = _resolve_snapshot(meta, to_snapshot_id)
    ddl = ddl_for_iceberg_schema(_schema_for_snapshot(meta, to_snap))
    if not files:
        return spark.createDataFrame([], ddl)
    return spark.read.schema(ddl).parquet(*files)


def read_iceberg_file_diff(
    spark: SparkSession,
    path: str,
    seen_files,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """DataFrame over the live data files NOT in ``seen_files`` — the
    watermark-EXPIRY recovery path of the ingestion loop (ADVICE r4): when
    the from-snapshot has been expired by expire_snapshots,
    ``read_iceberg_incremental`` can no longer resolve it, but a recorded
    ingested-file set still identifies exactly the new rows, because
    Iceberg data files are immutable and their paths are stable
    identities. Reading the same file set an incremental read would have
    selected also reproduces the same chunking, keeping the sink
    exactly-once (a FULL-table re-read would re-shuffle old+new rows into
    different chunks and duplicate rows, defeating the skip set)."""
    meta = read_table_meta(path)
    snap = _resolve_snapshot(meta, to_snapshot_id)
    files, _ = iceberg_data_files(path, to_snapshot_id)
    seen = set(seen_files)
    new = [f for f in files if f not in seen]
    ddl = ddl_for_iceberg_schema(_schema_for_snapshot(meta, snap))
    if not new:
        return spark.createDataFrame([], ddl)
    return spark.read.schema(ddl).parquet(*new)


# -------------------------------------------------------- driver contract

def iceberg_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-CHECKED Iceberg roundtrip: commit the documents table to a
    fresh Iceberg table (spec layout, manifest stats on doc_id), then read
    it back through the metadata/manifest planner. Values must match the
    source rows exactly — the oracle reads the original parquet directly."""
    import shutil
    import tempfile

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "lang", "text"
    )
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    # pid-scoped path: the returned DataFrame reads the table LAZILY, so it
    # cannot be deleted here — a shared fixed path would let a concurrent
    # gate run rmtree it mid-read. One small tmpfs table per process leaks
    # until that process's next call (which reclaims it below).
    tbl = os.path.join(base, f"iceberg_rt_docs_{os.getpid()}")
    shutil.rmtree(tbl, ignore_errors=True)
    write_iceberg_table(docs, tbl, mode="overwrite", stats_col="doc_id")
    return read_iceberg(spark, tbl).orderBy("doc_id")


def iceberg_partitioned_read_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-CHECKED identity-partition pruned read (r4 verdict item 5):
    commit documents partitioned by lang, read back ONLY two languages via
    the manifest partition values (plan-time pruning — the reference's
    partition-path filter, PartitionPathFilter.java:33-82, as a manifest
    walk). The oracle runs the equivalent row filter on the raw table, so
    equality proves the pruned plan loses/adds nothing. Planning stats are
    asserted in tests/test_iceberg.py (files_kept < files_total)."""
    import shutil
    import tempfile

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "lang", "text"
    )
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    tbl = os.path.join(base, f"iceberg_part_docs_{os.getpid()}")
    shutil.rmtree(tbl, ignore_errors=True)
    write_iceberg_table(docs, tbl, mode="overwrite", partition_by="lang")
    return read_iceberg(
        spark, tbl, partition_filter={"lang": ["en", "de"]}
    ).orderBy("doc_id")
