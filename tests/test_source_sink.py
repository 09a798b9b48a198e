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


def test_stream_reader_polls_snapshots_in_order(geonet, tmp_path):
    """The streaming side of the source (O28 schedule-tick): each
    micro-batch consumes the next snapshot file; the union of batch
    outputs equals the union of batch-mode reads of the same files;
    the offset stops advancing when snapshots are drained."""
    import json

    with open(FIXTURE, "r", encoding="utf-8") as fh:
        full = json.load(fh)
    snapdir = tmp_path / "snaps"
    snapdir.mkdir()
    snaps = [full["features"][:3], full["features"][3:6], full["features"][6:]]
    for i, feats in enumerate(snaps):
        (snapdir / f"t{i:02d}.json").write_text(
            json.dumps({"type": full.get("type"), "features": feats})
        )
    stream = (
        geonet.readStream.format("geonet").option("path", str(snapdir)).load()
    )
    batches: dict[int, list] = {}

    def sink(df, epoch_id):
        rows = df.select("properties.publicID").collect()
        if rows:
            batches[epoch_id] = sorted(r["publicID"] for r in rows)

    # a Simple stream reader yields ONE poll per micro-batch, so
    # availableNow would stop after the first tick — run on a fast
    # processing-time trigger and stop once the offsets drain
    import time

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline and len(batches) < 3:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    # every snapshot arrived as its own micro-batch, in order
    got_ids = [ids for _, ids in sorted(batches.items())]
    expect_ids = [
        sorted(f["properties"]["publicID"] for f in feats) for feats in snaps
    ]
    assert got_ids == expect_ids
    # and the streamed rows equal batch-mode reads of the same files
    total_stream = sorted(i for ids in got_ids for i in ids)
    total_batch = []
    for i in range(3):
        df = geonet.read.format("geonet").option(
            "path", str(snapdir / f"t{i:02d}.json")
        ).load()
        total_batch += [r["publicID"] for r in df.select("properties.publicID").collect()]
    assert total_stream == sorted(total_batch)


def test_stream_reader_replay_between_offsets(geonet, tmp_path):
    """Checkpoint-recovery determinism: readBetweenOffsets re-reads
    exactly the ticks in [start, end) from the snapshot files."""
    import json

    from etl_geonet_quakes_spark.quakes.source import GeoNetStreamReader

    with open(FIXTURE, "r", encoding="utf-8") as fh:
        full = json.load(fh)
    snapdir = tmp_path / "snaps2"
    snapdir.mkdir()
    for i, feats in enumerate(
        [full["features"][:2], full["features"][2:5], full["features"][5:]]
    ):
        (snapdir / f"s{i}.json").write_text(
            json.dumps({"type": "FeatureCollection", "features": feats})
        )
    r = GeoNetStreamReader({"path": str(snapdir)})
    assert r.initialOffset() == {"tick": 0}
    rows0, off1 = r.read({"tick": 0})
    rows0 = list(rows0)
    assert off1 == {"tick": 1} and len(rows0) == 2
    replay = list(r.readBetweenOffsets({"tick": 0}, {"tick": 2}))
    rows1, off2 = r.read(off1)
    assert off2 == {"tick": 2}
    assert replay == rows0 + list(rows1)
    # drained: offset freezes, read returns nothing
    _, off3 = r.read({"tick": 3})
    assert off3 == {"tick": 3}
    assert list(r.read({"tick": 3})[0]) == []
