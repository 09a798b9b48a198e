"""Round-8 operator semantics tests (beyond the DuckDB parity gate):
k-core convergence, duplicate-ngram-rate bounds, TPC-H shape
invariants, statistics sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_geonet_quakes_spark.llm import dedup, text
from etl_geonet_quakes_spark.operators import relational as rel

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_kcore_converges_within_rounds(spark):
    """The fixed 4-round peel equals the 6-round peel on the fixture
    — the graph converges early, so the output IS the exact 2-core
    (and the oracle-equality argument is independent of this)."""
    a = dedup.kcore_decomposition(spark, SF01, rounds=4)
    b = dedup.kcore_decomposition(spark, SF01, rounds=6)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # peeling actually removed something AND something survived
    rounds = {r["removed_round"] for r in a.select("removed_round").distinct().collect()}
    assert 0 in rounds and len(rounds) > 1


def test_kcore_survivors_have_core_degree_at_least_k(spark):
    out = dedup.kcore_decomposition(spark, SF01, k=2, rounds=4).collect()
    for r in out:
        if r["removed_round"] == 0:
            assert r["core_deg"] >= 2, r
        else:
            assert r["core_deg"] == 0, r


def test_duplicate_ngram_rate_bounds_and_known_dup(spark):
    out = text.duplicate_ngram_rate(spark, SF).collect()
    assert out, "empty result"
    for r in out:
        assert 0 <= r["n_dup"] <= r["n_shingles"]
    # the fixture contains mutated copies: some doc must share 8-grams
    assert any(r["n_dup"] > 0 for r in out)
    # and fully unique docs exist too (rate 0)
    assert any(r["n_dup"] == 0 for r in out)


def test_gini_bounds_and_degenerate_equal_distribution(spark, tmp_path):
    out = rel.gini_concentration(spark, SF).collect()
    for r in out:
        assert 0.0 <= r["gini"] < 1.0
    # perfectly equal distribution => gini exactly 0 (the identity's
    # boundary case, exercised on a synthetic two-table dir)
    import os
    base = str(tmp_path / "eq")
    os.makedirs(base)
    spark.createDataFrame(
        [(i, "SEG") for i in range(1, 9)], "c_custkey: long, c_mktsegment: string"
    ).write.parquet(f"{base}/customer.parquet")
    spark.createDataFrame(
        [(i, i, 10.0) for i in range(1, 9)],
        "o_orderkey: long, o_custkey: long, o_totalprice: double",
    ).write.parquet(f"{base}/orders.parquet")
    eq = rel.gini_concentration(spark, base).collect()
    assert len(eq) == 1 and eq[0]["gini"] == 0.0


def test_top_supplier_is_argmax_of_revenue(spark):
    out = rel.top_supplier(spark, SF01).collect()
    assert len(out) >= 1
    mx = out[0]["total_revenue_cc"]
    assert all(r["total_revenue_cc"] == mx for r in out)


def test_customer_order_distribution_includes_zero_bucket(spark, tmp_path):
    """Every customer is counted exactly once (partition property),
    and a customer with no qualifying orders lands in the ZERO bucket
    — the row inner joins silently drop. The fixture gives every
    customer orders, so the zero bucket is exercised on a synthetic
    dir with one orphan customer."""
    rows = {r["c_count"]: r["custdist"] for r in
            rel.customer_order_distribution(spark, SF).collect()}
    total = sum(rows.values())
    from etl_geonet_quakes_spark.io import load_table
    assert total == load_table(spark, SF, "customer").count()

    import os
    base = str(tmp_path / "dist")
    os.makedirs(base)
    spark.createDataFrame(
        [(1,), (2,), (3,)], "c_custkey: long"
    ).write.parquet(f"{base}/customer.parquet")
    spark.createDataFrame(
        [(10, 1, "5-LOW"), (11, 1, "5-LOW"), (12, 2, "1-URGENT")],
        "o_orderkey: long, o_custkey: long, o_orderpriority: string",
    ).write.parquet(f"{base}/orders.parquet")
    got = {r["c_count"]: r["custdist"] for r in
           rel.customer_order_distribution(spark, base).collect()}
    # cust 1: two non-urgent; cust 2: only an URGENT order -> 0;
    # cust 3: no orders -> 0
    assert got == {2: 1, 0: 2}


def test_mann_kendall_detects_monotonic_trend(spark, tmp_path):
    """Synthetic strictly-increasing daily series => S = n(n-1)/2,
    z > 0 — the statistic's sign convention pinned."""
    import datetime
    import os
    base = str(tmp_path / "mk")
    os.makedirs(base)
    days = [datetime.date(2024, 1, 1) + datetime.timedelta(days=i)
            for i in range(10)]
    orders = []
    oid = 0
    for i, d in enumerate(days):
        for _ in range(i + 1):  # strictly increasing daily count
            oid += 1
            orders.append((oid, 1, str(d)))
    spark.createDataFrame(
        orders, "o_orderkey: long, o_custkey: long, o_orderdate: string"
    ).write.parquet(f"{base}/orders.parquet")
    spark.createDataFrame(
        [(1, 1)], "c_custkey: long, c_nationkey: long"
    ).write.parquet(f"{base}/customer.parquet")
    spark.createDataFrame(
        [(1, 1)], "n_nationkey: long, n_regionkey: long"
    ).write.parquet(f"{base}/nation.parquet")
    spark.createDataFrame(
        [(1, "R1")], "r_regionkey: long, r_name: string"
    ).write.parquet(f"{base}/region.parquet")
    out = rel.mann_kendall_trend(spark, base).collect()
    assert len(out) == 1
    r = out[0]
    assert r["s_stat"] == 45  # 10*9/2, all pairs increasing
    assert r["tie_term"] == 0 and r["z_value"] > 0
