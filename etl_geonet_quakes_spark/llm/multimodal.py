"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern (SURVEY.md §2.3): media travels as a ``binary`` column
next to a typed metadata struct (the same nested-struct shape the
reference uses for feature metadata, task.ts:222-232). Everything
Spark-side — schema, partitioning, Arrow batch shape through
mapInPandas — is real and tested; the actual codec work (image
decode, audio resample, frame sampling) is stubbed because the
decode libraries aren't in this container. Each stub either raises
``NotImplementedError`` or applies a clearly-marked deterministic
fake, so the pipeline shape can be exercised end-to-end today and
the codec dropped in later without touching the plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_geonet_quakes_spark.io import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("sha", T.StringType()),
                ]
            ),
        ),
    ]
)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a multimodal table from the documents fixture: the UTF-8
    text bytes stand in for an opaque media payload; metadata struct
    carries kind/size/content-hash. Pure column expressions."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("kind"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha"),
        ).alias("media_meta"),
    )


def media_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-comparable projection over the binary column: sizes and
    content hashes (proves binary columns round-trip correctly)."""
    m = documents_as_media(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.sha").alias("sha"),
    ).orderBy("doc_id")


_FEATURE_SCHEMA = "doc_id long, n_bytes long, feat_mean double, feat_dim int"


def extract_features(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """Feature-extraction over binary payloads via mapInPandas —
    Arrow-batched, partition-parallel, the real 100 TB shape for
    media work (decode happens next to the data, never on the
    driver).

    ``fake=True`` applies the deterministic stand-in (mean byte value
    as a 1-dim "feature"); ``fake=False`` raises NotImplementedError
    where a real decoder (PIL/torchaudio/ffmpeg) would run.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires codec libraries not present "
                    "in this environment; wire PIL/ffmpeg here"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    # deterministic fake: mean byte value
                    "feat_mean": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "feat_dim": 1,
                }
            )

    return df.mapInPandas(run, schema=_FEATURE_SCHEMA)


def media_frame_sample(
    spark: SparkSession, sf_dir: str, frame_bytes: int = 32, stride: int = 4
) -> DataFrame:
    """Frame sampling over an opaque binary payload: treat the blob as
    fixed-size frames, keep every ``stride``-th frame, emit its bytes'
    checksum — the video-keyframe-sampling shape with a deterministic
    byte-slicing stand-in for a real demuxer. Pure column algebra
    (sequence → filter → explode → substring on binary), so the
    1→N fan-out stays inside codegen and shuffles nothing; a real
    ffmpeg demux would swap into a mapInPandas stage (see
    extract_features) with this exact output schema."""
    m = documents_as_media(spark, sf_dir)
    # explicit floor: double→int CAST truncates in Spark but ROUNDS in
    # DuckDB — floor() agrees everywhere
    n_frames = F.floor(F.col("media_meta.n_bytes") / frame_bytes)
    sampled = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)).cast("int")),
        lambda i: i % stride == 0,
    )
    frame = F.substring(F.col("payload"), F.col("i") * frame_bytes + 1, frame_bytes)
    return (
        m.filter(F.col("media_meta.n_bytes") >= frame_bytes)
        .select("doc_id", "payload", F.explode(sampled).alias("i"))
        .select(
            "doc_id",
            F.col("i").cast("long").alias("frame_idx"),
            F.md5(frame).alias("frame_md5"),
        )
        .orderBy("doc_id", "frame_idx")
    )


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal path: build media table → mapInPandas
    feature extraction → stable ordering. (No SQL oracle — the
    mapInPandas stage is outside DuckDB's vocabulary; driver records
    rows-only. The byte-stats query above carries the hash-level
    check for the binary plumbing.)"""
    return extract_features(documents_as_media(spark, sf_dir)).orderBy("doc_id")


def media_resize(spark: SparkSession, sf_dir: str, out_len: int = 16) -> DataFrame:
    """Resize plumbing for opaque media: nearest-neighbor resample of
    the payload to a fixed ``out_len`` bytes — the 1-D stand-in for
    image thumbnailing, as pure column algebra (sequence → transform →
    substring → join) so it never leaves codegen. A real pixel-space
    resize swaps into the mapInPandas stage (see extract_features)
    with this same fixed-size output contract; fixed-size outputs are
    what keep downstream batch shapes uniform at 100 TB. ASCII fixture
    ⇒ char ops ≡ byte ops on both engines (DuckDB md5 is VARCHAR-only,
    reference: task.ts has no media path at all — SURVEY §2.3)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= out_len
    )
    resized = F.expr(
        f"array_join(transform(sequence(0, {out_len - 1}), "
        f"i -> substring(text, CAST(floor(i * length(text) / {out_len}) AS INT) + 1, 1)"
        f"), '')"
    )
    return d.select(
        "doc_id",
        resized.alias("resized"),
        F.md5(resized.cast("binary")).alias("resized_md5"),
    ).orderBy("doc_id")
