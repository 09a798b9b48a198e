"""The quake pipeline as a Structured Streaming job (E1 re-expressed).

The reference is a scheduled Lambda: every tick, fetch a full
snapshot, transform, submit, let the platform expire omitted ids
(task.ts:142-143,195-203). Here the same contract runs as ONE
continuous Spark job: a file stream of FeatureCollection snapshots
(one JSON file per poll), ``maxFilesPerTrigger=1`` so each snapshot
is its own micro-batch (in arrival order), the batch transform
re-used verbatim inside ``foreachBatch``, and SnapshotDiffSink
computing upserts + expiry-by-omission per batch.

At production scale the file stream swaps for Kafka/Kinesis without
touching the transform or sink: foreachBatch isolates the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_geonet_quakes_spark.quakes.schema import GEONET_RESPONSE_SCHEMA
from etl_geonet_quakes_spark.quakes.sink import SnapshotDiffSink
from etl_geonet_quakes_spark.quakes.transform import QuakeJobConfig, transform_quakes


def run_quake_stream(
    spark: SparkSession,
    snapshot_dir: str,
    state_dir: str,
    config: QuakeJobConfig,
    publish_handler=None,
) -> list[int]:
    """Process every snapshot file in ``snapshot_dir`` as its own
    micro-batch; returns the list of processed epoch ids.

    ``publish_handler(fc_dict, expired_ids, epoch)`` receives each
    publish — the REST POST adapter in production, a recorder in
    tests.
    """
    stream = (
        spark.readStream.schema(GEONET_RESPONSE_SCHEMA)
        .option("multiLine", "true")
        .option("maxFilesPerTrigger", 1)
        .json(snapshot_dir)
    )
    features = stream.select(F.explode("features").alias("feature")).select("feature.*")

    sink = SnapshotDiffSink(state_dir)
    inner = sink.foreach_batch(publish_handler)
    epochs: list[int] = []

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        out = transform_quakes(batch_df, config)
        inner(out, epoch_id)
        epochs.append(epoch_id)

    from etl_geonet_quakes_spark.streaming.feed import replay_partitions

    with replay_partitions(spark):
        q = (
            features.writeStream.foreachBatch(per_batch)
            .option("checkpointLocation", f"{state_dir}/_checkpoint")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return epochs


def stream_quakes_via_source(
    spark: SparkSession,
    config: QuakeJobConfig,
    n_snapshots: int = 3,
    timeout_s: float = 120.0,
) -> DataFrame:
    """The reference's whole production loop as ONE Spark streaming
    topology: the GeoNet STREAMING data source (schedule-tick polls,
    quakes/source.py::GeoNetStreamReader) feeds micro-batches into
    the O4–O23 transform, each batch's features land durably, and
    the union of batch outputs is returned.

    For the registry the fixture splits into ``n_snapshots`` DISJOINT
    snapshot files (one poll each); the transform is stateless
    row-wise, so union-over-batches ≡ one-shot batch transform and
    the query carries q02's EXACT cross-engine oracle — the streaming
    source + transform path is value-hash-certified end to end.

    A Simple stream reader yields one poll per micro-batch, so this
    drives a fast processing-time trigger and stops once every
    snapshot tick has been consumed (the availableNow trigger would
    stop after the first poll)."""
    import json
    import os
    import tempfile
    import time

    from etl_geonet_quakes_spark.quakes import source as geonet_source
    from etl_geonet_quakes_spark.quakes.transform import validate_features

    geonet_source.register(spark)
    fixture = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        os.pardir,
        "tests",
        "fixtures",
        "geonet_quakes.json",
    )
    with open(fixture, "r", encoding="utf-8") as fh:
        full = json.load(fh)
    base = tempfile.mkdtemp(prefix="quake_stream_src_")
    snapdir = os.path.join(base, "snaps")
    out_dir = os.path.join(base, "out")
    os.makedirs(snapdir)
    feats = full["features"]
    for i in range(n_snapshots):  # disjoint round-robin split
        snap = {"type": full.get("type"), "features": feats[i::n_snapshots]}
        with open(os.path.join(snapdir, f"t{i:02d}.json"), "w") as fh:
            json.dump(snap, fh)

    done_epochs: list[int] = []

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        out = transform_quakes(validate_features(batch_df), config)
        out.write.mode("append").parquet(out_dir)
        if batch_df.take(1):
            done_epochs.append(epoch_id)

    from etl_geonet_quakes_spark.streaming.feed import replay_partitions

    stream = spark.readStream.format("geonet").option("path", snapdir).load()
    with replay_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(per_batch)
            .option("checkpointLocation", os.path.join(base, "_ckpt"))
            .trigger(processingTime="50 milliseconds")
            .start()
        )
        deadline = time.time() + timeout_s
        while time.time() < deadline and len(done_epochs) < n_snapshots:
            time.sleep(0.2)
        q.stop()
        q.awaitTermination()
    assert len(done_epochs) >= n_snapshots, done_epochs
    return spark.read.parquet(out_dir)
