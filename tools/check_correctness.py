"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare row
count, column names, and an order-insensitive value multiset.

Usage: PYTHONPATH=. python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


# Canonical type lattice for the oracle/engine TYPE contract (round 6).
# Spark dtype strings (df.dtypes) and DuckDB type strings (rel.types) both
# map into one family; families must match per column or the query FAILS.
# HUGEINT/UHUGEINT/DECIMAL(38,0) map to a dedicated "hugeint" family that
# matches nothing on the Spark side — DuckDB's pandas conversion renders
# them float64 against Spark's int64, the exact hash-only driver mismatch
# that stayed hidden for two rounds behind normalize()'s int/float
# string-collapse (judge diagnosis, round 5).
_INT_TYPES = {"tinyint", "smallint", "int", "integer", "bigint",
              "byte", "short", "long",
              "utinyint", "usmallint", "uinteger", "ubigint"}
_FLOAT_TYPES = {"float", "real", "double"}
_STRING_TYPES = {"string", "varchar", "text", "char"}
_BINARY_TYPES = {"binary", "blob", "varbinary", "bytea"}


def type_family(type_str: str, side: str = "duck") -> str:
    t = str(type_str).strip().lower()
    # hugeint is a DUCKDB-side hazard class (pandas renders it float64);
    # a SPARK decimal(38,0) is just a decimal — mapping it to "hugeint"
    # too would let a Spark decimal(38,0) "match" a DuckDB HUGEINT and
    # reintroduce the exact blind spot this gate exists to close
    if side == "duck" and (
        t in ("hugeint", "uhugeint") or t.replace(" ", "") == "decimal(38,0)"
    ):
        return "hugeint"
    base = t.split("(")[0].split("<")[0].strip()
    if base in _INT_TYPES:
        return "int"
    if base in _FLOAT_TYPES:
        return "float"
    if base == "decimal" or base == "numeric":
        return "decimal"
    if base in _STRING_TYPES:
        return "string"
    if base in _BINARY_TYPES:
        return "binary"
    if base in ("boolean", "bool"):
        return "bool"
    if base == "date":
        return "date"
    if base.startswith("timestamp"):
        return "timestamp"
    if base in ("array", "list") or t.endswith("[]"):
        return "array"
    if base == "map":
        return "map"
    if base in ("struct", "row"):
        return "struct"
    return base


def type_families(cols: list[str], types: list, side: str = "duck") -> dict[str, str]:
    return {c: type_family(t, side) for c, t in zip(cols, types)}


def normalize(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    return str(v)


def row_multiset(cols: list[str], rows: list[tuple]) -> dict:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    ms: dict[tuple, int] = {}
    for r in rows:
        key = tuple(normalize(r[i]) for i in order)
        ms[key] = ms.get(key, 0) + 1
    return ms


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from hadoop_etl_udfs_spark.session import get_spark

    spark = get_spark(app_name="check_correctness", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sfam = type_families(scols, [t for _, t in sdf.dtypes], side="spark")
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows, cols={scols} "
                  f"({time.time()-t0:.1f}s) [rows-only]")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [d[0] for d in rel.description]
            ofam = type_families(ocols, rel.types)
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failures += 1
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        type_diffs = {
            c: (sfam.get(c), ofam.get(c))
            for c in scols
            if c in ofam and sfam.get(c) != ofam.get(c)
        } if ok_cols else {}
        ok_types = ok_cols and not type_diffs
        ok_count = len(srows) == len(orows)
        ms_s = row_multiset(scols, srows)
        ms_o = row_multiset(ocols, orows)
        ok_vals = ms_s == ms_o
        status = ("OK  " if (ok_cols and ok_types and ok_count and ok_vals)
                  else "FAIL")
        if status == "FAIL":
            failures += 1
        print(f"{status}  {name}: rows {len(srows)}/{len(orows)} "
              f"cols={'OK' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'} "
              f"types={'OK' if ok_types else type_diffs} "
              f"vals={'OK' if ok_vals else 'MISMATCH'} ({time.time()-t0:.1f}s)")
        if not ok_vals and ok_cols:
            diff_s = {k: v for k, v in ms_s.items() if ms_o.get(k) != v}
            diff_o = {k: v for k, v in ms_o.items() if ms_s.get(k) != v}
            for k in list(diff_s)[:3]:
                print(f"        spark-only: {k}")
            for k in list(diff_o)[:3]:
                print(f"        duck-only:  {k}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
