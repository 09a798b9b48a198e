"""End-to-end streaming upsert/expiry (O26+O28): a file stream of
GeoNet snapshots driven through foreachBatch + SnapshotDiffSink —
the reference's scheduled Lambda rerun expressed as a real stream."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import Observation
from pyspark.sql import functions as F

from etl_geonet_quakes_spark.io import read_geojson
from etl_geonet_quakes_spark.quakes import GEONET_RESPONSE_SCHEMA, QuakeJobConfig
from etl_geonet_quakes_spark.quakes.sink import SnapshotDiffSink
from etl_geonet_quakes_spark.quakes.transform import run_pipeline

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "geonet_quakes.json")
NOW_MS = 1768478400000


def test_observe_metric_single_pass(spark):
    obs = Observation("quakes")
    resp = read_geojson(spark, FIXTURE, GEONET_RESPONSE_SCHEMA)
    out = run_pipeline(
        resp, QuakeJobConfig(min_mmi=-1, max_age_minutes=1e12, now_utc_ms=NOW_MS), obs
    )
    n = out.count()
    # O24: the metric rides the same job — no second scan
    assert obs.get["n_features"] == n == 8


def test_foreachbatch_snapshot_upsert_and_expiry(spark, tmp_path):
    """Two scheduled 'runs' as two micro-batches: run 2 drops one
    quake from the feed → the sink must report it expired (the
    omission contract, task.ts:195-203)."""
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    cfg = QuakeJobConfig(min_mmi=-1, max_age_minutes=1e12, now_utc_ms=NOW_MS)

    def snapshot_ids(path: str) -> list[str]:
        resp = read_geojson(spark, path, GEONET_RESPONSE_SCHEMA)
        return [r["id"] for r in run_pipeline(resp, cfg).select("id").collect()]

    published: list[tuple[list[str], list[str]]] = []
    sink = SnapshotDiffSink(str(tmp_path / "state"))
    handler = sink.foreach_batch(
        lambda fc, expired, epoch: published.append(
            (sorted(f["id"] for f in fc["features"]), sorted(expired))
        )
    )

    # run 1: full fixture
    full = read_geojson(spark, FIXTURE, GEONET_RESPONSE_SCHEMA)
    handler(run_pipeline(full, cfg), 0)
    ids_run1, expired_run1 = published[-1]
    assert len(ids_run1) == 8 and expired_run1 == []

    # run 2: same feed minus one quake (simulating GeoNet dropping it)
    body = json.load(open(FIXTURE))
    removed = "earthquake-" + body["features"][0]["properties"]["publicID"]
    body["features"] = body["features"][1:]
    p2 = str(feed_dir / "run2.json")
    json.dump(body, open(p2, "w"))
    handler(run_pipeline(read_geojson(spark, p2, GEONET_RESPONSE_SCHEMA), cfg), 1)
    ids_run2, expired_run2 = published[-1]
    assert removed not in ids_run2
    assert expired_run2 == [removed]


def test_transform_with_state_matches_batch(spark, sf_dir):
    """transformWithStateInPandas (Spark 4.x arbitrary state): final
    per-user state after an availableNow run equals the batch
    aggregate. Skipped where google.protobuf is unavailable — Spark's
    TWS driver worker imports it internally."""
    pytest.importorskip("google.protobuf")
    from pyspark.sql import functions as F

    from etl_geonet_quakes_spark.io import load_table
    from etl_geonet_quakes_spark.streaming.windows import stream_transform_with_state

    got = stream_transform_with_state(spark, sf_dir).collect()
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .orderBy("user_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
