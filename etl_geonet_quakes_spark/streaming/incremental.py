"""Streaming incremental aggregate maintenance.

The reference's whole execution model is "recompute the world every
schedule tick" (task.ts:142-143 — re-fetch, re-transform, re-submit).
q158 already shows the BATCH form of doing better (merge a delta into
a persisted aggregate); this module is the STREAMING form: documents
arrive in micro-batches and a persisted token-count aggregate is
maintained by merging each batch's partial counts — the vocabulary
statistics a corpus pipeline keeps warm while ingesting.

Exactness contract (the q151 discipline): counts are associative, so
the final merged state provably equals the one-shot batch aggregation
— which is exactly what the registered query's SQL oracle computes.
The cross-engine hash gate therefore certifies the INCREMENTAL path
end to end, not a weaker rows-only check.

State discipline mirrors ``SnapshotDiffSink``/``StreamingMinHashIndex``:
each batch writes a NEW state version (durable parquet) before the
pointer advances — lineage is broken at every merge, the read side
never references a path being overwritten, and recovery resumes from
the last complete version. Per-batch work is one partial+final hash
agg over the batch plus a merge join keyed by token — the shuffle
carries the vocabulary, never the token stream; at cluster scale the
state table would be bucketed by token so the merge is co-located.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_geonet_quakes_spark.io import load_table
from etl_geonet_quakes_spark.llm.text import tokens
from etl_geonet_quakes_spark.streaming.feed import write_micro_batch_feed

_STATE_SCHEMA = "tok string, n long"


def stream_incremental_token_counts(
    spark: SparkSession, sf_dir: str, top_k: int = 50
) -> DataFrame:
    """Registry adapter: replay ``documents`` as a 3-file micro-batch
    stream, maintain the merged token-count state per batch, and
    return the final state's top-``top_k`` tokens (count desc, token
    asc — deterministic). Oracle = the plain batch word count: equal
    BY THEOREM (count merge is associative), so the hash gate checks
    the incremental machinery, not luck."""
    base = tempfile.mkdtemp(prefix="stream_inc_counts_")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    feed = write_micro_batch_feed(docs, base, 3, "doc_id")
    state_dir = os.path.join(base, "state")
    versions: list[str] = []

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        sp = batch_df.sparkSession
        counts = (
            batch_df.select(F.explode(tokens(F.col("text"))).alias("tok"))
            .groupBy("tok")
            .agg(F.count("*").alias("n"))
        )
        if versions:
            prev = sp.read.schema(_STATE_SCHEMA).parquet(versions[-1])
            counts = (
                prev.unionByName(counts)
                .groupBy("tok")
                .agg(F.sum("n").alias("n"))
            )
        path = os.path.join(state_dir, f"v{len(versions) + 1:04d}")
        counts.write.parquet(path)  # durable BEFORE the pointer moves
        versions.append(path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", os.path.join(base, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert versions, "stream processed no batches"
    final = spark.read.schema(_STATE_SCHEMA).parquet(versions[-1])
    return final.orderBy(F.desc("n"), "tok").limit(top_k)


def stream_incremental_exact_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming incremental EXACT dedup: documents arrive in
    micro-batches and each batch is deduplicated against everything
    already seen via a durable digest index (md5 → keeper doc_id) —
    the streaming form of q41, completing the pair with q151's
    incremental NEAR-dup. A batch's keeper for a digest is its min
    doc_id; the index keeps the global min per digest, so the final
    state provably equals the one-shot batch group-by (min is
    associative) — q41's exact oracle applies.

    Per-batch work: one digest hash agg over the batch + a merge agg
    against the touched digests; versioned durable state (write
    before the pointer moves), same discipline as
    stream_incremental_token_counts."""
    base = tempfile.mkdtemp(prefix="stream_inc_dedup_")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    feed = write_micro_batch_feed(docs, base, 3, "doc_id")
    state_dir = os.path.join(base, "state")
    versions: list[str] = []
    schema = "fp string, kept_doc long, n_dups long"

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        sp = batch_df.sparkSession
        cur = (
            batch_df.select(F.md5("text").alias("fp"), "doc_id")
            .groupBy("fp")
            .agg(
                F.min("doc_id").alias("kept_doc"),
                F.count("*").alias("n_dups"),
            )
        )
        if versions:
            prev = sp.read.schema(schema).parquet(versions[-1])
            cur = (
                prev.unionByName(cur)
                .groupBy("fp")
                .agg(
                    F.min("kept_doc").alias("kept_doc"),
                    F.sum("n_dups").alias("n_dups"),
                )
            )
        path = os.path.join(state_dir, f"v{len(versions) + 1:04d}")
        cur.write.parquet(path)
        versions.append(path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", os.path.join(base, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert versions, "stream processed no batches"
    final = spark.read.schema(schema).parquet(versions[-1])
    return final.orderBy("kept_doc")
