"""Shared two-phase distributed prefix primitives.

A global ordered window (``Window.orderBy(...)`` with no partition)
executes in ONE task — the textbook non-scalable cumsum/rank plan.
Every global-order statistic in this engine instead runs the same
two-phase shape, factored here so no future call site silently
regresses to the single-task window:

1. rows carry a caller-chosen range bucket that is ORDER-ALIGNED with
   the sort key (bucket boundaries respect the global order, e.g.
   ``key DIV width``);
2. the prefix statistic is computed locally within each bucket
   (``partitionBy(bucket)`` — fully parallel);
3. only the per-bucket totals (tiny: n_rows / bucket_width rows) take
   the one ordered window, an exclusive prefix over a
   broadcast-sized input;
4. the bucket offsets broadcast-join back and combine with the local
   value into the exact global statistic.

Callers: q94 pack_sequences (token offsets), q135 equi-depth
histogram (value ranks), q139 gaps-and-islands (key ranks), q155
quantile normalization (global rank table), q166 peak concurrency
(time-ordered delta cumsum), q156 skyline (strict prefix max).
No reference analog (the reference's only ordering is a driver-side
sort of ≤100 features, task.ts:205-210); this is 100 TB posture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Totals column name exposed to callers that reuse the tiny per-bucket
# frame (e.g. q135 derives n_total from it instead of rescanning).
BUCKET_TOTAL = "bkt_total"


def _offsets(totals: DataFrame, bucket_col: str, agg: str) -> DataFrame:
    wo = Window.orderBy(bucket_col).rowsBetween(Window.unboundedPreceding, -1)
    stat = F.sum(BUCKET_TOTAL) if agg == "sum" else F.max(BUCKET_TOTAL)
    zero = F.lit(0) if agg == "sum" else F.lit(None)
    return totals.withColumn(
        "_bkt_off", F.coalesce(stat.over(wo), zero)
    ).select(bucket_col, "_bkt_off")


def two_phase_rank(
    df: DataFrame,
    bucket_col: str,
    order_cols: list,
    out_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Exact global ``row_number()`` over (bucket, *order_cols) order
    without a global window. ``bucket_col`` must be order-aligned
    with ``order_cols`` (all rows of bucket b sort before all rows of
    bucket b+1). Ties must be broken by ``order_cols`` (include a
    unique key). Returns ``(df + out_col, per-bucket totals)`` — the
    totals frame (columns: bucket_col, BUCKET_TOTAL) is tiny and lets
    callers derive e.g. the grand total without rescanning."""
    wl = Window.partitionBy(bucket_col).orderBy(*order_cols)
    d = df.withColumn("_local", F.row_number().over(wl))
    totals = d.groupBy(bucket_col).agg(F.count("*").alias(BUCKET_TOTAL))
    d = d.join(F.broadcast(_offsets(totals, bucket_col, "sum")), bucket_col)
    d = d.withColumn(out_col, F.col("_bkt_off") + F.col("_local"))
    return d.drop("_local", "_bkt_off"), totals


def two_phase_cumsum(
    df: DataFrame,
    bucket_col: str,
    order_cols: list,
    value_col: str,
    out_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Exact global inclusive running sum of ``value_col`` over
    (bucket, *order_cols) order — same contract/shape as
    ``two_phase_rank`` with SUM as the statistic."""
    wl = (
        Window.partitionBy(bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = df.withColumn("_local", F.sum(value_col).over(wl))
    totals = d.groupBy(bucket_col).agg(F.sum(value_col).alias(BUCKET_TOTAL))
    d = d.join(F.broadcast(_offsets(totals, bucket_col, "sum")), bucket_col)
    d = d.withColumn(out_col, F.col("_bkt_off") + F.col("_local"))
    return d.drop("_local", "_bkt_off"), totals


def two_phase_strict_prefix_max(
    df: DataFrame,
    bucket_col: str,
    key_col: str,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Exact global max of ``value_col`` over rows with STRICTLY
    smaller ``key_col`` (a running max with a value-RANGE exclusive
    frame) — NULL when no strictly-smaller row exists. ``bucket_col``
    must be order-aligned with ``key_col``. The strict frame is the
    skyline/dominance primitive (q156): within-bucket strict range
    max runs parallel, and the cross-bucket part is an exclusive
    prefix max over the tiny bucket maxima."""
    wl = (
        Window.partitionBy(bucket_col)
        .orderBy(key_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    d = df.withColumn("_local_mx", F.max(value_col).over(wl))
    totals = d.groupBy(bucket_col).agg(F.max(value_col).alias(BUCKET_TOTAL))
    d = d.join(F.broadcast(_offsets(totals, bucket_col, "max")), bucket_col)
    d = d.withColumn(out_col, F.greatest("_local_mx", "_bkt_off"))
    return d.drop("_local_mx", "_bkt_off")


def two_phase_rank_and_cumsum(
    df: DataFrame,
    bucket_col: str,
    order_cols: list,
    value_col: str,
    rank_col: str,
    cum_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Exact global row_number AND inclusive running sum of
    ``value_col`` in ONE two-phase pass: one local window produces
    both statistics, one tiny totals frame carries (count, sum) per
    bucket, one offsets window computes both exclusive prefixes, one
    broadcast join attaches them — half the machinery of calling
    ``two_phase_rank`` + ``two_phase_cumsum`` separately (the q192
    plan-noise fix). Totals frame columns: bucket_col, BUCKET_TOTAL
    (count), ``bkt_sum`` (value sum)."""
    wl = Window.partitionBy(bucket_col).orderBy(*order_cols)
    wlr = wl.rowsBetween(Window.unboundedPreceding, 0)
    d = df.withColumn("_local_rn", F.row_number().over(wl)).withColumn(
        "_local_cs", F.sum(value_col).over(wlr)
    )
    totals = d.groupBy(bucket_col).agg(
        F.count("*").alias(BUCKET_TOTAL),
        F.sum(value_col).alias("bkt_sum"),
    )
    wo = Window.orderBy(bucket_col).rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        bucket_col,
        F.coalesce(F.sum(BUCKET_TOTAL).over(wo), F.lit(0)).alias("_off_n"),
        F.coalesce(F.sum("bkt_sum").over(wo), F.lit(0)).alias("_off_s"),
    )
    d = d.join(F.broadcast(offs), bucket_col)
    d = d.withColumn(rank_col, F.col("_off_n") + F.col("_local_rn"))
    d = d.withColumn(cum_col, F.col("_off_s") + F.col("_local_cs"))
    return d.drop("_local_rn", "_local_cs", "_off_n", "_off_s"), totals


def two_phase_cumsum_grouped(
    df: DataFrame,
    group_cols: list,
    bucket_col: str,
    order_cols: list,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Per-GROUP exact inclusive running sum of ``value_col`` over
    (bucket, *order_cols) order WITHIN each ``group_cols`` partition —
    the grouped variant of :func:`two_phase_cumsum` (q232 Gini's
    per-segment rank·value sums). Same discipline: the local window
    partitions by (group, bucket) and runs fully parallel; the one
    ordered window runs per group over the tiny per-(group, bucket)
    totals frame (``partitionBy(group).orderBy(bucket)`` — an
    exclusive prefix over broadcast-scale input, never a global
    single-task sort). ``bucket_col`` must be order-aligned with
    ``order_cols`` within every group."""
    wl = (
        Window.partitionBy(*group_cols, bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = df.withColumn("_local", F.sum(value_col).over(wl))
    totals = d.groupBy(*group_cols, bucket_col).agg(
        F.sum(value_col).alias(BUCKET_TOTAL)
    )
    wo = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        *group_cols,
        bucket_col,
        F.coalesce(F.sum(BUCKET_TOTAL).over(wo), F.lit(0)).alias("_bkt_off"),
    )
    d = d.join(F.broadcast(offs), [*group_cols, bucket_col])
    d = d.withColumn(out_col, F.col("_bkt_off") + F.col("_local"))
    return d.drop("_local", "_bkt_off")
