"""Unit tests for the shared two-phase prefix primitives
(operators/prefix.py) — checked directly against the naive global
window they exist to replace, on adversarial shapes: duplicate keys,
negative values, empty/singleton/degenerate-single buckets, and
bucket boundaries that split ties (rank) or runs (cumsum).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_geonet_quakes_spark.operators.prefix import (
    two_phase_cumsum,
    two_phase_rank,
    two_phase_strict_prefix_max,
)

ROWS = [
    # (id, key, val) — keys with duplicates, negatives, gaps
    (1, -7, 5), (2, -7, -3), (3, 0, 2), (4, 0, 2), (5, 1, 10),
    (6, 9, -1), (7, 9, 0), (8, 10, 4), (9, 33, 7), (10, 34, 7),
    (11, 34, -2), (12, 100, 1),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "id long, key long, val long")


def test_two_phase_rank_equals_global(spark):
    for width in (1, 4, 10, 1000):  # 1000 = degenerate single bucket
        d = _df(spark).withColumn(
            "bkt", F.floor(F.col("key") / width).cast("long")
        )
        got, totals = two_phase_rank(d, "bkt", ["key", "id"], "r")
        naive = _df(spark).withColumn(
            "r", F.row_number().over(Window.orderBy("key", "id"))
        )
        g = {r["id"]: r["r"] for r in got.collect()}
        n = {r["id"]: r["r"] for r in naive.collect()}
        assert g == n, (width, g, n)
        assert sum(r["bkt_total"] for r in totals.collect()) == len(ROWS)


def test_two_phase_cumsum_equals_global(spark):
    for width in (1, 4, 1000):
        d = _df(spark).withColumn(
            "bkt", F.floor(F.col("key") / width).cast("long")
        )
        got, _ = two_phase_cumsum(d, "bkt", ["key", "id"], "val", "c")
        naive = _df(spark).withColumn(
            "c",
            F.sum("val").over(
                Window.orderBy("key", "id").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
        g = {r["id"]: r["c"] for r in got.collect()}
        n = {r["id"]: r["c"] for r in naive.collect()}
        assert g == n, (width, g, n)


def test_two_phase_strict_prefix_max_equals_global(spark):
    for width in (1, 4, 1000):
        d = _df(spark).withColumn(
            "bkt", F.floor(F.col("key") / width).cast("long")
        )
        got = two_phase_strict_prefix_max(d, "bkt", "key", "val", "m")
        naive = _df(spark).withColumn(
            "m",
            F.max("val").over(
                Window.orderBy("key").rangeBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        g = {r["id"]: r["m"] for r in got.collect()}
        n = {r["id"]: r["m"] for r in naive.collect()}
        assert g == n, (width, g, n)
    # strictness: equal keys must NOT see each other — ids 3 and 4
    # (key 0) both see only the key<0 max (5), never each other's 2
    assert g[3] == 5 and g[4] == 5
    # and the global minimum key has no strictly-smaller row: NULL
    assert g[1] is None and g[2] is None


def test_global_sort_write_without_single_task(spark, tmp_path):
    """Write-side 100 TB posture: a globally sorted output must come
    from repartitionByRange + sortWithinPartitions (parallel range
    sort, the terasort pattern), never a single-task global sort.
    Every output file is internally sorted AND file ranges are
    disjoint and ordered, so the concatenation is globally sorted."""
    import glob

    from etl_geonet_quakes_spark.io import load_table

    out = str(tmp_path / "sorted")
    df = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_totalprice"
    )
    (
        df.repartitionByRange(8, "o_totalprice", "o_orderkey")
        .sortWithinPartitions("o_totalprice", "o_orderkey")
        .write.parquet(out)
    )
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) > 1  # genuinely parallel
    ranges = []
    total = 0
    for f in files:
        rows = [
            (r["o_totalprice"], r["o_orderkey"])
            for r in spark.read.parquet(f).collect()
        ]
        if not rows:
            continue
        assert rows == sorted(rows), f  # sorted within the file
        ranges.append((rows[0], rows[-1]))
        total += len(rows)
    assert total == df.count()
    # file ranges are disjoint and ascending -> concatenation sorted
    flat = [b for r in ranges for b in r]
    assert flat == sorted(flat)
