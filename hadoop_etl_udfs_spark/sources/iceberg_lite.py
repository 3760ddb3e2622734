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
unpartitioned spec, flat primitive schemas (the pages/documents shapes),
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
import struct
import time

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
    nullable-by-default semantics)."""
    fields = []
    for i, f in enumerate(df_schema.fields, start=1):
        t = f.dataType.typeName()
        if t not in _SPARK_TO_ICEBERG:
            raise ValueError(
                f"iceberg_lite cannot map Spark type {t!r} (field "
                f"{f.name!r}) — supported: {sorted(_SPARK_TO_ICEBERG)}"
            )
        fields.append(
            {"id": i, "name": f.name, "required": False,
             "type": _SPARK_TO_ICEBERG[t]}
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


def ddl_for_iceberg_schema(schema: dict, columns: list[str] | None = None) -> str:
    """Iceberg schema JSON -> Spark DDL string (optionally a column subset)."""
    parts = []
    for f in schema["fields"]:
        if columns is not None and f["name"] not in columns:
            continue
        t = f["type"]
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


def manifest_entry_schema() -> dict:
    """Avro schema of one manifest entry (spec §Manifests, v1 subset:
    required core fields + optional column bounds; unpartitioned spec =
    empty partition record r102)."""
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "field-id": 102,
             "type": {"type": "record", "name": "r102", "fields": []}},
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


def current_version(path: str) -> int:
    """Committed metadata version from version-hint.text, falling back to
    the highest v<N>.metadata.json present (the spec's recovery path)."""
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            return int(f.read().strip())
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
    raise ValueError(
        f"snapshot {snapshot_id} not found; have "
        f"{[s['snapshot-id'] for s in snaps]}"
    )


# ------------------------------------------------------------------- write

def write_iceberg_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    stats_col: str | list[str] | None = None,
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
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    spark = df.sparkSession
    schema_json = iceberg_schema_for(df.schema)
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
                evolved.append({**f, "id": next_id})
                next_id += 1
            elif prev_fields[f["name"]]["type"] != f["type"]:
                # type changes (incl. timestamp tz flavor — a tz change
                # silently shifts values) must fail loud
                raise ValueError(
                    f"column {f['name']!r} changed type "
                    f"{prev_fields[f['name']]['type']!r} -> {f['type']!r}; "
                    "iceberg_lite does not rewrite column types"
                )
        schema_json = {"type": "struct", "schema-id": 0, "fields": evolved}
    except FileNotFoundError:
        prev_meta, version, snapshot_id = None, 0, 1

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
    stats = {
        r["f"]: r
        for r in scan.groupBy(F.input_file_name().alias("f")).agg(*aggs).collect()
    }

    # 3) manifest file (one entry per data file, status=1 ADDED)
    fids = {sc: _field_id(schema_json, sc) for sc in stats_cols}
    entries = []
    for uri, r in sorted(stats.items()):
        # input_file_name() yields file:///... URIs — normalize to a plain
        # absolute path (abspath collapses the scheme's slashes) so manifest
        # paths compare equal to os.path/glob paths everywhere downstream
        local = os.path.abspath(
            uri[len("file:"):] if uri.startswith("file:") else uri
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
                "partition": {},
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
    write_avro(manifest_path, manifest_entry_schema(), entries)

    # 4) manifest list: previous manifests carried forward on append
    manifests = []
    if mode == "append" and prev_meta is not None:
        prev_snap = _resolve_snapshot(prev_meta, None)
        _, prev_list = read_avro(prev_snap["manifest-list"])
        manifests += prev_list
    manifests.append({
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": 0,
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
    }
    meta = {
        "format-version": FORMAT_VERSION,
        "table-uuid": hashlib.md5(
            os.path.abspath(path).encode()
        ).hexdigest(),
        "location": os.path.abspath(path),
        "last-updated-ms": now_ms,
        "last-column-id": max(f["id"] for f in schema_json["fields"]),
        "schema": schema_json,
        "schemas": [schema_json],
        "current-schema-id": 0,
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "properties": {},
        "current-snapshot-id": snapshot_id,
        "snapshots": (prev_meta.get("snapshots", []) if prev_meta else [])
        + [snapshot],
        "snapshot-log": (prev_meta.get("snapshot-log", []) if prev_meta else [])
        + [{"snapshot-id": snapshot_id, "timestamp-ms": now_ms}],
    }
    new_version = version + 1
    with open(
        os.path.join(_meta_dir(path), f"v{new_version}.metadata.json"), "w"
    ) as f:
        json.dump(meta, f, indent=1)
    with open(os.path.join(_meta_dir(path), "version-hint.text"), "w") as f:
        f.write(str(new_version))
    return snapshot_id


# -------------------------------------------------------------------- read

def iceberg_data_files(
    path: str,
    snapshot_id: int | None = None,
    where: tuple[str, int, int] | None = None,
) -> tuple[list[str], dict]:
    """Plan a scan: resolve the snapshot, walk its manifest list, return
    live data-file paths (+ planning stats). ``where=(col, lo, hi)`` keeps
    only files whose stored [lower, upper] bounds overlap [lo, hi]; files
    without bounds are conservatively kept. Driver-side over manifest files
    only — the same planner/data split as real Iceberg clients."""
    meta = read_table_meta(path)
    snap = _resolve_snapshot(meta, snapshot_id)
    _, manifests = read_avro(snap["manifest-list"])
    fid = _field_id(meta["schema"], where[0]) if where else None
    files: list[str] = []
    total = kept = 0
    for m in manifests:
        _, entries = read_avro(m["manifest_path"])
        for e in entries:
            if e["status"] == 2:  # DELETED
                continue
            total += 1
            d = e["data_file"]
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
) -> DataFrame:
    """Iceberg table -> DataFrame. Schema comes from the table metadata
    (never inferred — SURVEY.md §1.4); ``snapshot_id`` time-travels;
    ``where=(col, lo, hi)`` prunes data files at PLAN time via manifest
    bounds (epoch-µs for timestamp columns) — the residual row filter is
    the caller's, exactly like Iceberg + Spark divide the work."""
    meta = read_table_meta(path)
    files, _ = iceberg_data_files(path, snapshot_id, where)
    ddl = ddl_for_iceberg_schema(meta["schema"], columns=None)
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
    with open(
        os.path.join(_meta_dir(path), f"v{new_version}.metadata.json"), "w"
    ) as f:
        json.dump(new_meta, f, indent=1)
    with open(os.path.join(_meta_dir(path), "version-hint.text"), "w") as f:
        f.write(str(new_version))
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
    ddl = ddl_for_iceberg_schema(meta["schema"])
    if not files:
        return spark.createDataFrame([], ddl)
    return spark.read.schema(ddl).parquet(*files)


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
