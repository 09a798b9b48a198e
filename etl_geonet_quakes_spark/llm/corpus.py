"""Corpus-preparation operators: the end-to-end shapes a training-data
pipeline runs over raw documents — deterministic sampling and the
dedup→quality-filter→composition pipeline — as single declarative
Spark plans.

Scale posture: both operators are one hash-shuffle each (the exact-dup
window / the per-stratum nothing-at-all), no self-joins, no driver
round-trips; at 100 TB they are scan-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_geonet_quakes_spark.io import load_table
from etl_geonet_quakes_spark.llm.text import tokens


def _hash60(col) -> F.Column:
    """Deterministic uniform 60-bit hash of a string column — md5-based
    so any engine reproduces it bit-for-bit (see dedup.md5_feature_hash)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language sampling rates
    applied by thresholding a uniform content-independent hash of the
    key — NOT ``df.sample`` (seed-dependent, partitioning-dependent,
    and not reproducible across engines or reruns).

    ``hash60(doc_id) < rate * 2^60`` keeps each doc independently with
    probability ``rate``, the same docs every run on every engine —
    the property a training-data pipeline needs for resumable /
    auditable subsampling. Stratification is just a per-stratum rate
    expression; no shuffle at all (pure filter, pushed to the scan)."""
    d = load_table(spark, sf_dir, "documents")
    h = _hash60(F.col("doc_id").cast("string"))
    rate = (
        F.when(F.col("lang") == "en", F.lit(0.1))
        .when(F.col("lang") == "de", F.lit(0.3))
        .otherwise(F.lit(0.5))
    )
    thresh = (rate * F.lit(float(1 << 60))).cast("long")
    return (
        d.filter(h < thresh)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


def corpus_dedup_pipeline(
    spark: SparkSession,
    sf_dir: str,
    min_tokens: int = 5,
    min_uniqueness: float = 0.2,
) -> DataFrame:
    """End-to-end corpus preparation accounting, one plan:

    1. exact dedup: keep the min doc_id per md5(text) fingerprint;
    2. quality gate on survivors: ≥ ``min_tokens`` tokens and
       distinct-token ratio ≥ ``min_uniqueness``;
    3. per-language composition report: how many documents each stage
       removed and how many tokens survive.

    The per-stage attribution (removed-as-duplicate vs
    removed-as-low-quality vs kept) is what an ablation needs to audit
    a data recipe. Single window over the fingerprint (one shuffle) +
    one final aggregation; thresholds use exact int/int division so
    the gate boundary is engine-independent."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    staged = d.select(
        "doc_id",
        "lang",
        F.md5("text").alias("fp"),
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("uniq"),
    ).withColumn(
        "keeper", F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("fp"))
    )
    q_ok = (F.col("n_tokens") >= min_tokens) & (F.col("uniq") >= min_uniqueness)
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return (
        staged.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            one_if(~F.col("keeper")).alias("n_exact_removed"),
            one_if(F.col("keeper") & ~q_ok).alias("n_lowq_removed"),
            one_if(F.col("keeper") & q_ok).alias("n_kept"),
            F.sum(F.when(F.col("keeper") & q_ok, F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("tokens_kept"),
        )
        .orderBy("lang")
    )


def decontamination_scan(
    spark: SparkSession,
    sf_dir: str,
    n_eval_docs: int = 20,
    min_shared: int = 3,
) -> DataFrame:
    """Benchmark decontamination: find training documents that share
    ≥ ``min_shared`` distinct 3-word shingles with any document of a
    held-out eval set (here: the first ``n_eval_docs`` doc_ids play
    the eval split; everything else is the train split). This is the
    cross-DATASET overlap scan every training corpus needs before use —
    related to near-dup detection but asymmetric: the eval side is
    tiny and fixed, the train side is the 100 TB corpus.

    Shape at scale: explode both sides to (shingle, doc) rows,
    broadcast the eval side (eval benchmarks are small by
    construction), equi-join on the shingle, then one partial+final
    count agg per (train, eval) pair — the train corpus streams once,
    nothing large shuffles."""
    from etl_geonet_quakes_spark.llm.dedup import shingles_str

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(shingles_str(F.col("text"))).alias("s")
    )
    eval_side = d.filter(F.col("doc_id") < n_eval_docs).select(
        F.col("doc_id").alias("eval_doc"), "s"
    )
    train_side = d.filter(F.col("doc_id") >= n_eval_docs).select(
        F.col("doc_id").alias("train_doc"), "s"
    )
    return (
        train_side.join(F.broadcast(eval_side), "s")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count("*").alias("n_shared_shingles"))
        .filter(F.col("n_shared_shingles") >= min_shared)
        .orderBy("train_doc", "eval_doc")
    )
