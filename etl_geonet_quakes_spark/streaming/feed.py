"""Distributed micro-batch feed writer for file-stream replays.

Several registry queries certify a STREAMING operator against an exact
batch oracle by replaying a fixture table as an arrival-ordered file
stream (``maxFilesPerTrigger=1`` + ``availableNow``) and proving the
union of per-batch outputs equals the one-shot batch result (q151
incremental MinHash, q181 incremental counts). This module owns the
feed synthesis so every such query shares the no-driver-materialization
path: rows are hash-assigned to a batch id and written by ONE
distributed Spark job (``repartition(n, b)`` puts each batch in exactly
one task, so each ``b=i`` partition directory holds exactly one file),
then flattened into the feed directory with metadata-only renames —
no ``collect()``, no driver buffering, any corpus size.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_micro_batch_feed(
    df: DataFrame, base: str, n_batches: int = 3, key: str = "doc_id"
) -> str:
    """Write ``df`` as ``n_batches`` parquet files (one per ``key %
    n_batches`` bucket) under ``base/feed`` and return that path.
    Unordered-set result semantics downstream make arrival order
    irrelevant; the partition column is dropped from the files (it is
    a directory key), so the feed schema equals ``df``'s. A residue
    class with no rows (sparse/skewed keys) still gets a batch file —
    an empty parquet with ``df``'s schema — so the replay sees the
    same number of micro-batches regardless of key distribution."""
    feed = os.path.join(base, "feed")
    staging = os.path.join(base, "staging")
    os.makedirs(feed)
    (
        df.withColumn("b", F.col(key) % F.lit(n_batches))
        .repartition(n_batches, "b")
        .write.partitionBy("b")
        .parquet(staging)
    )
    missing = []
    for i in range(n_batches):
        part = glob.glob(os.path.join(staging, f"b={i}", "part-*.parquet"))
        assert len(part) <= 1, part
        if part:
            os.rename(part[0], os.path.join(feed, f"b{i}.parquet"))
        else:
            missing.append(i)
    if missing:
        empty_dir = os.path.join(base, "empty")
        df.limit(0).coalesce(1).write.parquet(empty_dir)
        src = glob.glob(os.path.join(empty_dir, "part-*.parquet"))[0]
        for i in missing:
            with open(src, "rb") as fh:
                data = fh.read()
            with open(os.path.join(feed, f"b{i}.parquet"), "wb") as fh:
                fh.write(data)
    return feed

def write_time_ordered_feed(
    df: DataFrame,
    base: str,
    n_batches: int,
    ts_col: str,
    trailing: tuple[DataFrame, ...] = (),
) -> str:
    """Write ``df`` as ``n_batches`` parquet files whose ARRIVAL ORDER
    IS EVENT-TIME ORDER, followed by the ``trailing`` single-purpose
    batches (e.g. watermark-flush sentinels) — the feed shape the
    watermark-sensitive replays need (q197 eviction contract, q214
    outer-join null emission), where :func:`write_micro_batch_feed`'s
    hash-keyed unordered batches would be wrong.

    Two hard-won invariants are encoded here rather than left to the
    callers:

    * rows are RANGE-assigned to batches on ``ts_col`` (equal-width
      time slices between the observed min/max), so batch *i* never
      contains events newer than batch *i+1* and nothing is dropped as
      late on input when the watermark advances between batches;
    * every batch file gets a strictly increasing mtime.
      FileStreamSource orders files by MODIFICATION TIME, not path:
      files renamed out of one staging write share an mtime, the
      replay order is then effectively random, a late-range batch can
      run first, and the watermark silently drops whole earlier
      batches as late (measured: 120/192 matches survived on the
      q214 probe before stamping; 192/192 after).

    The min/max probe is a single two-value aggregate (bounded driver
    state). Like the hash feed, all row data moves in distributed
    Spark jobs; the driver only renames and stamps file metadata.
    """
    import time

    feed = os.path.join(base, "feed")
    staging = os.path.join(base, "staging")
    os.makedirs(feed)
    lo, hi = df.agg(F.min(ts_col), F.max(ts_col)).first()
    span_us = max((hi - lo).total_seconds() * 1_000_000, 1.0)
    frac = (F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lit(lo))) / F.lit(span_us)
    b = F.least(F.floor(frac * n_batches), F.lit(n_batches - 1)).cast("int")
    (
        df.withColumn("b", b)
        .repartition(n_batches, "b")
        .write.partitionBy("b")
        .parquet(staging)
    )
    for i in range(n_batches):
        part = glob.glob(os.path.join(staging, f"b={i}", "part-*.parquet"))
        assert len(part) <= 1, part
        if part:
            os.rename(part[0], os.path.join(feed, f"b{i:03d}.parquet"))
        else:
            _write_empty_batch(df, base, feed, i)
    for j, extra in enumerate(trailing):
        d = os.path.join(base, f"trailing{j}")
        extra.coalesce(1).write.parquet(d)
        os.rename(
            glob.glob(os.path.join(d, "part-*.parquet"))[0],
            os.path.join(feed, f"b{n_batches + j:03d}.parquet"),
        )
    t0 = time.time() - 3600
    for k, fn in enumerate(sorted(os.listdir(feed))):
        os.utime(os.path.join(feed, fn), (t0 + 10 * k, t0 + 10 * k))
    return feed


def _write_empty_batch(df: DataFrame, base: str, feed: str, i: int) -> None:
    empty_dir = os.path.join(base, f"empty{i}")
    df.limit(0).coalesce(1).write.parquet(empty_dir)
    src = glob.glob(os.path.join(empty_dir, "part-*.parquet"))[0]
    with open(src, "rb") as fh:
        data = fh.read()
    with open(os.path.join(feed, f"b{i:03d}.parquet"), "wb") as fh:
        fh.write(data)
