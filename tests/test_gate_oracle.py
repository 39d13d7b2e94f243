"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()``
twin on DuckDB over the same parquet tables, compare row count + sorted
row values exactly (the driver's order-insensitive value-hash)."""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # collapse -0.0 and fix float repr
        return round(v + 0.0, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _rows_sorted(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.fixture(scope="module")
def gate(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return spark, qs, oracles


ORACLE_NAMES = sorted(entrymod.oracle_sql())
ALL_NAMES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(gate, name):
    spark, qs, oracles = gate
    sdf = qs[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(SF_DIR)
    rel = con.sql(oracles[name])
    duck_cols = rel.columns
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    a = _rows_sorted(spark_cols, spark_rows)
    b = _rows_sorted(duck_cols, duck_rows)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert not mism, (
        f"{name}: first mismatches at {mism}: "
        + "; ".join(f"spark={a[i]} duck={b[i]}" for i in mism)
    )


@pytest.mark.parametrize("name", [n for n in ALL_NAMES if n not in ORACLE_NAMES])
def test_rows_only(gate, name):
    """Entries without a SQL oracle still must run and return a stable
    schema (the driver's weaker rows-only check)."""
    spark, qs, _ = gate
    sdf = qs[name](spark, SF_DIR)
    rows = sdf.collect()
    assert rows is not None
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["query_id", "rank", "doc_id", "score"]
