"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary aggregation at
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full operator
registry from ``etl_geonet_quakes_spark.queries`` (one entry per
implemented SURVEY.md §2 row; see that module for the determinism
policy that makes the DuckDB value-hash comparison exact).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_geonet_quakes_spark import queries as _registry  # noqa: E402
from etl_geonet_quakes_spark.operators.relational import pricing_summary  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.ts is parquet timestamp[ns]; see etl_geonet_quakes_spark.io
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def with_conf(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return fn(spark, sf_dir)

        return run

    return {name: with_conf(fn) for name, fn in _registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each hash-checked query."""
    return _registry.oracle_sql()
