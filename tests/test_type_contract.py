"""Oracle/engine TYPE contract (round-6 verdict items 2 and 6).

The driver canonicalizes both result sets through pandas/Arrow dtypes, so a
column whose VALUES match but whose TYPE FAMILY drifts (Spark int64 vs a
DuckDB HUGEINT that pandas renders float64) hash-mismatches with rows and
schema still matching — the exact failure mode that kept
``encode_documents_lineage_checked`` driver-red for two rounds while the
``str(v)``-normalizing replica stayed green.

Two guards, both schema-level (neither side executes the query, so this
runs in seconds at sf0.001):

1. No oracle result column may type as HUGEINT/UHUGEINT/DECIMAL(38,0) —
   DuckDB's pandas conversion renders those float64 against Spark's int64.
2. For every oracle-backed ``queries()`` entry, the canonical type family
   per column (int / float / decimal / string / bool / date / timestamp /
   binary / array / ...) must MATCH between the Spark DataFrame schema and
   the DuckDB relation types, using the same lattice the replica gate
   enforces (``tools.check_correctness.type_family``).
"""

from __future__ import annotations

import importlib
import os

import duckdb
import pytest

from tools.check_correctness import TABLES, type_families


@pytest.fixture(scope="module")
def contract(spark, sf_dir):
    entrymod = importlib.import_module("__spark_entry__")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    rows = []
    for name, fn in qs.items():
        if name not in oracles:
            continue
        sdf = fn(spark, sf_dir)
        sfam = type_families(sdf.columns, [t for _, t in sdf.dtypes], side="spark")
        rel = con.sql(oracles[name])
        ocols = [d[0] for d in rel.description]
        ofam = type_families(ocols, rel.types)
        rows.append((name, sdf.columns, sfam, ocols, ofam))
    con.close()
    return rows


def test_no_oracle_column_is_hugeint(contract):
    bad = [
        (name, col)
        for name, _, _, _, ofam in contract
        for col, fam in ofam.items()
        if fam == "hugeint"
    ]
    assert not bad, (
        "oracle columns typed HUGEINT/UHUGEINT/DECIMAL(38,0) — pandas "
        f"renders these float64 vs Spark int64: {bad}"
    )


def test_spark_and_oracle_type_families_match(contract):
    mismatches = []
    for name, scols, sfam, ocols, ofam in contract:
        if sorted(scols) != sorted(ocols):
            mismatches.append((name, "COLUMNS", sorted(scols), sorted(ocols)))
            continue
        for c in scols:
            if sfam[c] != ofam[c]:
                mismatches.append((name, c, sfam[c], ofam[c]))
    assert not mismatches, f"type-family drift: {mismatches}"


def test_type_family_lattice():
    from tools.check_correctness import type_family

    # the HUGEINT family matches nothing Spark can produce
    assert type_family("HUGEINT") == "hugeint"
    assert type_family("UHUGEINT") == "hugeint"
    assert type_family("DECIMAL(38,0)") == "hugeint"
    # int family spans both engines' spellings
    assert type_family("bigint") == type_family("BIGINT") == "int"
    assert type_family("int") == type_family("INTEGER") == "int"
    # float / decimal / string / temporal / nested
    assert type_family("double") == type_family("DOUBLE") == "float"
    assert type_family("float") == type_family("REAL") == "float"
    assert type_family("decimal(12,2)") == type_family("DECIMAL(12,2)") == "decimal"
    assert type_family("string") == type_family("VARCHAR") == "string"
    assert type_family("binary") == type_family("BLOB") == "binary"
    assert type_family("date") == type_family("DATE") == "date"
    assert type_family("timestamp") == "timestamp"
    assert type_family("TIMESTAMP WITH TIME ZONE") == "timestamp"
    assert type_family("array<double>") == type_family("DOUBLE[]") == "array"
    # drifts the driver would hash-fail on
    assert type_family("bigint") != type_family("HUGEINT")
    # side-sensitivity: a SPARK decimal(38,0) is a decimal, never hugeint —
    # otherwise it would "match" a DuckDB HUGEINT and reopen the blind spot
    assert type_family("decimal(38,0)", side="spark") == "decimal"
    assert type_family("decimal(38,0)", side="spark") != type_family("HUGEINT")
    assert type_family("string") != type_family("JSON")
    assert type_family("double") != type_family("DECIMAL(12,2)")
