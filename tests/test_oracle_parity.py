"""Differential tests: every oracle-paired query in the registry runs
on Spark AND DuckDB at sf0.001 and must match exactly (row count,
column names, values) — a local replica of the driver's t2 gate, so
parity breaks surface here first.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from etl_geonet_quakes_spark.io import TABLES
from etl_geonet_quakes_spark.queries import SPECS

ORACLED = sorted(name for name, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(name for name, s in SPECS.items() if not s.oracle)


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    try:  # numpy scalars → python
        return v.item()
    except AttributeError:
        return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    named = [cols[i] for i in order]
    data = sorted((tuple(_canon(r[i]) for i in order) for r in rows), key=repr)
    return named, data


#: Raw oracle results observed by this process, keyed by
#: (sf_dir, query name) → (columns, rows). The full-suite run used to
#: execute every DuckDB oracle TWICE — once here, once in
#: test_registry_guard's fingerprint-collision sweep (~2 min of pure
#: DuckDB re-execution). The sweep now reuses these results when the
#: parity run already produced them for the same sf_dir, and computes
#: afresh otherwise (so running either file alone is unchanged).
ORACLE_RESULT_CACHE: dict = {}


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, spark, sf_dir, ddb):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.sql(spec.oracle)
    d_cols = list(res.columns)
    d_rows = res.fetchall()
    ORACLE_RESULT_CACHE[(sf_dir, name)] = (d_cols, d_rows)

    s_named, s_data = _normalize(s_cols, s_rows)
    d_named, d_data = _normalize(d_cols, d_rows)

    assert s_named == d_named, f"{name}: column names differ: {s_named} vs {d_named}"
    assert len(s_data) == len(d_data), (
        f"{name}: row counts differ: spark={len(s_data)} duckdb={len(d_data)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_data, d_data)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark, sf_dir):
    df = SPECS[name].fn(spark, sf_dir)
    assert df.count() >= 0  # runs, stable schema
    assert df.columns
