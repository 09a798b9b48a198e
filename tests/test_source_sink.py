"""Tests for the GeoNet Python Data Source (O2/O9) and the
upsert/expiry sink contract (O26)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_geonet_quakes_spark.quakes import source as geonet_source
from etl_geonet_quakes_spark.quakes.schema import GEONET_FEATURE_SCHEMA
from etl_geonet_quakes_spark.quakes.sink import SnapshotDiffSink, to_feature_collection

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "geonet_quakes.json")


@pytest.fixture(scope="module")
def geonet(spark):
    geonet_source.register(spark)
    return spark


def test_fixture_read_schema_and_rows(geonet):
    df = geonet.read.format("geonet").option("path", FIXTURE).load()
    assert df.schema.simpleString() == GEONET_FEATURE_SCHEMA.simpleString()
    assert df.count() == 9


def test_mmi_filter_pushdown_rows_identical(geonet):
    df = geonet.read.format("geonet").option("path", FIXTURE).load()
    pushed = df.filter(F.col("properties.mmi") >= 5)
    ids = sorted(r["properties"]["publicID"] for r in pushed.collect())
    # mmi >= 5 rows in the fixture: 5, 12, 6, 7, 8 → five features
    assert ids == [
        "2025p000006",
        "2026p000001",
        "2026p000004",
        "2026p000007",
        "2026p000009",
    ]


def test_reader_folds_bound_into_url():
    # unit-level: the pushdown handshake (O9) folds a supported bound
    # and re-yields every filter for Spark's defensive re-check
    from pyspark.sql.datasource import GreaterThanOrEqual

    r = geonet_source.GeoNetReader({})
    back = list(r.pushFilters([GreaterThanOrEqual(("properties", "mmi"), 5)]))
    assert r.min_mmi == 5
    assert len(back) == 1


def test_out_of_range_bound_not_pushed():
    from pyspark.sql.datasource import GreaterThanOrEqual

    r = geonet_source.GeoNetReader({})
    list(r.pushFilters([GreaterThanOrEqual(("properties", "mmi"), 11)]))
    assert r.min_mmi is None  # API accepts −1..8 only (task.ts:165)


def test_snapshot_diff_sink(spark, tmp_path):
    sink = SnapshotDiffSink(str(tmp_path / "state"))
    snap1 = spark.createDataFrame(
        [("earthquake-a",), ("earthquake-b",), ("earthquake-c",)], "id string"
    )
    n, expired = sink.publish(snap1)
    assert n == 3 and expired.count() == 0

    # second run: 'b' omitted → expired; 'd' new → upserted
    snap2 = spark.createDataFrame([("earthquake-a",), ("earthquake-d",)], "id string")
    n, expired = sink.publish(snap2)
    assert n == 2
    assert sorted(r["id"] for r in expired.collect()) == [
        "earthquake-b",
        "earthquake-c",
    ]


def test_feature_collection_envelope_sorted(spark):
    df = spark.createDataFrame([("b", 2), ("a", 1)], "id string, v int")
    fc = to_feature_collection(df)
    assert fc["type"] == "FeatureCollection"
    assert [f["id"] for f in fc["features"]] == ["a", "b"]
