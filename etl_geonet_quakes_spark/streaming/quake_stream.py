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

    q = (
        features.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", f"{state_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return epochs
