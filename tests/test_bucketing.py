"""Bucketed-table joins (SURVEY §2.3 100 TB posture): pre-bucketing
both sides of a recurring join key removes the per-query shuffle —
the plan must show a SortMergeJoin with NO Exchange above either
bucketed scan."""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

from etl_geonet_quakes_spark.io import load_table


@pytest.fixture()
def warehouse(spark, tmp_path):
    # saveAsTable writes to the session warehouse; isolate per-test
    # tables by unique names instead of moving the warehouse.
    yield


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # the in-memory catalog forgets tables between sessions but their
    # warehouse directories survive — clear them or saveAsTable
    # refuses with LOCATION_ALREADY_EXISTS
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the join to be a real two-sided join — at test scale
        # Spark would otherwise broadcast and hide the bucketing
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        # co-located bucketed join: no shuffle exchange feeding the join
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan

        # and it still computes the right thing
        expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
