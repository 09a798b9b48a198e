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
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# State partition count for fixture replays. A stateful streaming
# query fixes its state-store partition count to
# spark.sql.shuffle.partitions AT QUERY START, and every micro-batch
# then pays a per-partition-per-store commit (a stream-stream join
# carries FOUR stores per partition: left/right x keyToNumValues/
# keyWithIndexToValue). Measured on q273 at sf0.1 (round-10 audit,
# SCALE.md): 32 partitions -> 6 batches x 128 store commits = 424 s
# of summed commit time, 31.2 s wall; 8 partitions -> 8.0 s wall
# (3.9x) with identical results. RocksDB was ~20% WORSE than the
# HDFS provider at this state size (per-batch version uploads
# dominate). At 100 TB the same sizing rule applies in reverse:
# partitions ∝ state volume — the constant here is the fixture-scale
# instance of that rule, not a magic number.
REPLAY_SHUFFLE_PARTITIONS = 8


@contextmanager
def replay_partitions(spark, n: int = REPLAY_SHUFFLE_PARTITIONS):
    """Temporarily size spark.sql.shuffle.partitions for a replay
    stream start; always restores the session value. Result-identical
    by construction: hash partitioning and watermark advancement are
    partition-count-independent, only the state-store commit fan-out
    changes (verified: q04-q09, q10/q75, q151, q187, q197, q214,
    q273 oracle hashes unchanged at 8 vs 32)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


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
    # zero-padding width derived from the total file count, so feeds
    # beyond 1000 batches still sort (and therefore replay) in order
    width = max(3, len(str(max(n_batches + len(trailing) - 1, 0))))
    lo, hi = df.agg(F.min(ts_col), F.max(ts_col)).first()
    if lo is None:
        raise ValueError(
            "write_time_ordered_feed: df has no rows (or ts_col is "
            f"all-null) — cannot range-assign batches on {ts_col!r}; "
            "an empty feed would make every downstream replay "
            "vacuously pass, so this is an error, not 0 batches"
        )
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
            os.rename(part[0], os.path.join(feed, f"b{i:0{width}d}.parquet"))
        else:
            _write_empty_batch(df, base, feed, i, width)
    for j, extra in enumerate(trailing):
        d = os.path.join(base, f"trailing{j}")
        extra.coalesce(1).write.parquet(d)
        os.rename(
            glob.glob(os.path.join(d, "part-*.parquet"))[0],
            os.path.join(feed, f"b{n_batches + j:0{width}d}.parquet"),
        )
    t0 = time.time() - 3600
    for k, fn in enumerate(sorted(os.listdir(feed))):
        os.utime(os.path.join(feed, fn), (t0 + 10 * k, t0 + 10 * k))
    return feed


def _write_empty_batch(
    df: DataFrame, base: str, feed: str, i: int, width: int = 3
) -> None:
    empty_dir = os.path.join(base, f"empty{i}")
    df.limit(0).coalesce(1).write.parquet(empty_dir)
    src = glob.glob(os.path.join(empty_dir, "part-*.parquet"))[0]
    with open(src, "rb") as fh:
        data = fh.read()
    with open(os.path.join(feed, f"b{i:0{width}d}.parquet"), "wb") as fh:
        fh.write(data)


def far_future_sentinel_batches(
    df: DataFrame,
    ts_col: str,
    row: dict | None = None,
    id_col: str | None = None,
    n_sentinels: int = 2,
    horizon: str = "INTERVAL 30 DAYS",
) -> tuple:
    """Build the trailing watermark-flush sentinel batches a
    watermark-sensitive replay needs (hoisted from the q214 outer-join
    recipe so every caller inherits the measured invariants instead of
    re-deriving them):

    * **TWO batches by default, not one**: results for state closed by
      the watermark of batch *N* are emitted while processing batch
      *N+1* — the first sentinel advances the watermark past every
      real row's join/window bound, the second gives Spark a batch in
      which to emit (measured on the q214 probe: one sentinel leaves
      the final eviction wave unemitted);
    * the sentinel timestamp is ``max(ts_col) + horizon`` — beyond any
      real event-time bound the query derives, so the watermark clears
      ALL state;
    * callers joining two streams must route the sentinels to BOTH
      sides (the default ``min`` multiple-watermark policy holds the
      join watermark at the laggard side — measured: single-side
      sentinels left the last 48 h of q214 state unevicted). The
      sentinel rows themselves carry ``id_col`` = −1−j so downstream
      can filter them out (q214 keeps ``click_id >= 0``).

    ``row`` maps column name → literal Column override (e.g. the
    ``event_type`` tag streams filter on); ``id_col`` gets −1−j per
    sentinel *j*; every other column is a typed NULL; ``ts_col`` gets
    the far-future stamp. Returns a tuple sized for
    ``write_time_ordered_feed(trailing=...)``. The max-ts probe is one
    scalar aggregate (bounded driver state)."""
    hi = df.agg(F.max(ts_col)).first()[0]
    if hi is None:
        raise ValueError(
            "far_future_sentinel_batches: df has no rows (or "
            f"{ts_col!r} is all-null) — no watermark to flush"
        )
    dtypes = dict(df.dtypes)
    out = []
    for j in range(n_sentinels):
        sel = []
        for c in df.columns:
            if c == ts_col:
                sel.append((F.lit(hi) + F.expr(horizon)).alias(c))
            elif row is not None and c in row:
                sel.append(row[c].alias(c))
            elif c == id_col:
                sel.append(F.lit(-1 - j).cast(dtypes[c]).alias(c))
            else:
                sel.append(F.lit(None).cast(dtypes[c]).alias(c))
        out.append(df.limit(1).select(*sel))
    return tuple(out)
