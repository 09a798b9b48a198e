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
