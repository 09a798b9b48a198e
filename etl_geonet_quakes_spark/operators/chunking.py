"""Auto-selection of fragment-replicate chunk counts for hot buckets.

Non-equi joins that block into buckets (time buckets in the interval
join q170, grid cells in the spatial join q142) have per-bucket
candidate work that is a PRODUCT of bucket occupancies — a hot bucket
is quadratic by the question's nature, and AQE's skew split cannot
break it up on a self-join (the reused exchange is not split —
measured, SCALE.md round 6). ``hot_chunks=C`` fragment-replicate
chunking parallelizes the hot bucket at the price of ×C shuffle
volume; SCALE.md's conclusion is that C is insurance to buy ONLY when
bucket statistics say the premium pays.

This module is that purchase decision: a cheap pre-flight aggregation
(the q136 skew-audit shape — per-bucket counts, then one max) measures
the worst bucket's pair work and picks the smallest C whose per-task
work after chunking fits under ``target_pairs`` — C = 1 (plain plan,
no replication) whenever the data is not actually hot. The collect is
ONE scalar — bounded driver state, the same discipline as the k-means
centroid pulls.

At 100 TB the same pre-flight runs as one extra pass over the blocked
keys (cheap next to the join itself); a production deployment would
read the statistic from table stats / a previous run instead of
recomputing per query.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# per-task candidate-pair budget after chunking: (n_max/C)^2 (self) or
# n_a*n_b/C^2 (bipartite) must fit under this. ~2000^2: a single task
# evaluating 4M cheap predicates finishes in well under a second.
DEFAULT_TARGET_PAIRS = 4_000_000
MAX_CHUNKS = 16


def chunks_for_pair_work(max_pair_work: int | None,
                         target_pairs: int = DEFAULT_TARGET_PAIRS,
                         max_chunks: int = MAX_CHUNKS) -> int:
    """Smallest C with max_pair_work / C² ≤ target_pairs, clamped to
    [1, max_chunks]."""
    if not max_pair_work or max_pair_work <= target_pairs:
        return 1
    return max(1, min(max_chunks,
                      math.ceil(math.sqrt(max_pair_work / target_pairs))))


def auto_chunks_self(keyed: DataFrame, key_cols: list[str],
                     target_pairs: int = DEFAULT_TARGET_PAIRS,
                     max_chunks: int = MAX_CHUNKS) -> int:
    """Pick C for a SELF-join blocked on ``key_cols``: worst bucket
    pair work is max(n)² over bucket occupancies."""
    row = (
        keyed.groupBy(*key_cols)
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("n_max"))
        .collect()[0]
    )  # one scalar: bounded driver state
    n_max = row["n_max"] or 0
    return chunks_for_pair_work(n_max * n_max, target_pairs, max_chunks)


def auto_chunks_bipartite(a: DataFrame, b: DataFrame,
                          key_cols: list[str],
                          target_pairs: int = DEFAULT_TARGET_PAIRS,
                          max_chunks: int = MAX_CHUNKS) -> int:
    """Pick C for a BIPARTITE join blocked on ``key_cols``: worst
    bucket pair work is max over shared buckets of n_a·n_b."""
    ca = a.groupBy(*key_cols).agg(F.count("*").alias("n_a"))
    cb = b.groupBy(*key_cols).agg(F.count("*").alias("n_b"))
    row = (
        ca.join(cb, key_cols)
        .agg(F.max(F.col("n_a") * F.col("n_b")).alias("p_max"))
        .collect()[0]
    )  # one scalar: bounded driver state
    return chunks_for_pair_work(row["p_max"] or 0, target_pairs, max_chunks)
