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


def test_shipping_priority_topn_is_global_argmax(spark):
    """The LIMIT-10 result equals the head of the UNLIMITED ranking —
    TakeOrderedAndProject must not drop a higher-revenue order that
    lands in another partition."""
    top = rel.shipping_priority(spark, SF, topn=10).collect()
    # "unlimited" = a bound safely above the fixture's row count;
    # a huge literal (10**9) makes TakeOrderedAndProject allocate
    # the full top-k buffer per partition and OOMs the executor
    full = rel.shipping_priority(spark, SF, topn=100_000).collect()
    assert [r["l_orderkey"] for r in top] == [
        r["l_orderkey"] for r in full[:10]
    ]
    revs = [r["revenue"] for r in top]
    assert revs == sorted(revs, reverse=True)


def test_disjunctive_revenue_equals_branch_sum(spark):
    """The three OR branches are brand-disjoint, so total revenue
    must equal the sum of three single-branch runs — the disjunction
    neither double-counts nor drops rows."""
    from etl_geonet_quakes_spark.io import load_table
    total = rel.disjunctive_discount_revenue(spark, SF).collect()[0]
    li = load_table(spark, SF, "lineitem")
    p = load_table(spark, SF, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    branches = [
        ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11)),
        ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(1, 10)
         & F.col("l_quantity").between(10, 20)),
        ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(20, 30)),
    ]
    n = sum(j.filter(b).count() for b in branches)
    assert n == total["n_lines"]


def test_dominant_supplier_unique_per_part(spark):
    """Strict majority ⇒ at most ONE dominant supplier per part; and
    every reported supplier must genuinely exceed half of some
    part's total shipped quantity (recomputed independently)."""
    from etl_geonet_quakes_spark.io import load_table
    li = load_table(spark, SF, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, SF, "part").filter(
        F.col("p_name").contains("widget")
    ).select("p_partkey")
    ps = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    )
    tot = ps.groupBy("l_partkey").agg(F.sum("q").alias("t"))
    dom = ps.join(tot, "l_partkey").filter(F.col("q") * 2 > F.col("t"))
    per_part = dom.groupBy("l_partkey").count().agg(F.max("count")).collect()
    assert per_part[0][0] == 1
    reported = {
        r["s_suppkey"]
        for r in rel.dominant_suppliers(spark, SF).collect()
    }
    independent = {r["l_suppkey"] for r in dom.collect()}
    assert reported == independent


def test_autocorrelation_bounds_and_pair_counts(spark):
    out = rel.daily_autocorrelation(spark, SF).collect()
    assert len(out) == 7
    for r in out:
        assert r["n_pairs"] == r["n_days"] - r["lag"]
        assert -1.000001 <= r["acf"] <= 1.000001


def test_kruskal_wallis_invariants(spark):
    r = rel.kruskal_wallis(spark, SF).collect()[0]
    n_groups = sum(
        r[f"n_{s}"]
        for s in ["automobile", "building", "furniture", "household",
                  "machinery"]
    )
    assert n_groups == r["n_total"]
    # sum of all rank sums = N(N+1)/2 exactly (doubled: N(N+1))
    two_r_total = sum(
        r[f"two_rsum_{s}"]
        for s in ["automobile", "building", "furniture", "household",
                  "machinery"]
    )
    assert two_r_total == r["n_total"] * (r["n_total"] + 1)
    assert r["h_stat"] >= 0
    assert 0 < r["tie_correction"] <= 1
    assert r["df"] == 4


def test_kaplan_meier_hand_computed(spark, tmp_path):
    """Four hand-traced subjects: events at t=2 (×2) and t=4 (×1),
    one censoring at t=4. S(2) = 1−2/4 = 0.5; at t=4 the at-risk set
    is {B(event), C(censored)} ⇒ S(4) = 0.5·(1−1/2) = 0.25."""
    import datetime as dt
    import os
    base = str(tmp_path / "km")
    os.makedirs(base)
    d = dt.datetime(2020, 1, 1)

    def day(i):
        return d + dt.timedelta(days=i)

    rows = [
        (1, day(0)), (1, day(2)),        # A: event dur 2
        (2, day(0)), (2, day(4)),        # B: event dur 4
        (3, day(0)),                     # C: censored at corpus end (4)
        (4, day(1)), (4, day(3)),        # D: event dur 2
    ]
    spark.createDataFrame(
        rows, "o_custkey: long, o_orderdate: timestamp"
    ).write.parquet(f"{base}/orders.parquet")
    out = {r["t_days"]: r for r in rel.kaplan_meier(spark, base).collect()}
    assert set(out) == {2, 4}
    assert out[2]["n_risk"] == 4 and out[2]["d_events"] == 2
    assert out[2]["survival"] == 0.5
    assert out[4]["n_risk"] == 2 and out[4]["d_events"] == 1
    assert out[4]["survival"] == 0.25


def test_kaplan_meier_survival_monotone(spark):
    out = rel.kaplan_meier(spark, SF).orderBy("t_days").collect()
    surv = [r["survival"] for r in out]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert all(0 <= s <= 1 for s in surv)
    risks = [r["n_risk"] for r in out]
    assert all(a >= b for a, b in zip(risks, risks[1:]))


def test_assortativity_path_graph_is_minus_one(spark, tmp_path):
    """P3 path (A−B−C, no A−C edge): degree pairs across directed
    edges are (1,2),(2,1),(2,1),(1,2) ⇒ Newman r = −1 exactly. The
    token sets are built so Jaccard(A,B)=Jaccard(B,C)=9/11 ≥ 0.8 but
    Jaccard(A,C)=8/12 < 0.8."""
    import os
    base = str(tmp_path / "p3")
    os.makedirs(base)
    t = [f"t{i}" for i in range(1, 11)]
    texts = {
        1: " ".join(["a1"] + t[1:]),   # A: a1 t2..t10
        2: " ".join(t),                # B: t1..t10
        3: " ".join(t[:9] + ["c1"]),   # C: t1..t9 c1
    }
    spark.createDataFrame(
        [(i, s, "en", "src", len(s)) for i, s in texts.items()],
        "doc_id: long, text: string, lang: string, source: string, "
        "n_chars: long",
    ).write.parquet(f"{base}/documents.parquet")
    from etl_geonet_quakes_spark.llm import dedup as dd
    r = dd.degree_assortativity(spark, base).collect()[0]
    assert r["n_vertices"] == 3 and r["n_edges"] == 2
    assert r["assortativity"] == -1.0


def test_countmin_estimate_dominates_exact(spark):
    out = text.countmin_sketch_audit(spark, SF).collect()
    assert len(out) == 20
    for r in out:
        assert r["estimate"] >= r["exact"], r
        assert r["overestimate"] == r["estimate"] - r["exact"]


def test_countmin_width_one_collapses_to_total(spark):
    """With w=1 every token hashes to the single bucket, so the
    estimate for EVERY token is the total token count — the
    degenerate bound that pins the bucket-sum plumbing."""
    from etl_geonet_quakes_spark.io import load_table
    total = (
        load_table(spark, SF, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("t"))
        .count()
    )
    out = text.countmin_sketch_audit(spark, SF, width=1, topn=5).collect()
    for r in out:
        assert r["estimate"] == total


def test_zipf_slope_flags_closed_vocabulary(spark):
    """The synthetic fixture has a small CLOSED vocabulary — exactly
    the corpus pathology the Zipf fit exists to flag: slope is
    shallow (≫ the −1 of natural text) with low explanatory power.
    The test pins the detector's verdict, not natural-language
    behavior the fixture doesn't have."""
    r = text.zipf_slope(spark, SF).collect()[0]
    assert r["slope"] < 0, "frequencies are still rank-ordered"
    assert r["slope"] > -0.5, "closed vocab => far shallower than -1"
    assert 0 <= r["r_squared"] <= 1
    assert r["n_points"] >= 10


_SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def test_levene_zero_on_identical_groups(spark, tmp_path):
    """Five segments with IDENTICAL value multisets ⇒ every group
    deviation profile equals the pooled one ⇒ W is exactly 0 — the
    numerator's fixed-order fold must cancel to 0.0, not 1e-17."""
    import os
    base = str(tmp_path / "lv")
    os.makedirs(base)
    custs = [(i * 10 + j, seg) for i, seg in enumerate(_SEGS)
             for j in range(3)]
    spark.createDataFrame(
        custs, "c_custkey: long, c_mktsegment: string"
    ).write.parquet(f"{base}/customer.parquet")
    vals = [100.0, 200.0, 700.0]
    orders = [
        (i * 100 + k, c, vals[k])
        for i, (c, _) in enumerate(custs)
        for k in range(3)
    ]
    spark.createDataFrame(
        [(o, c, v) for o, c, v in orders],
        "o_orderkey: long, o_custkey: long, o_totalprice: double",
    ).write.parquet(f"{base}/orders.parquet")
    r = rel.levene_test(spark, base).collect()[0]
    assert r["w_stat"] == 0.0
    assert r["n_total"] == 45 and r["df2"] == 40
    for s in _SEGS:
        assert r[f"med_{s.lower()}"] == 20000.0  # 200.00 in cents


def test_levene_fixture_invariants(spark):
    r = rel.levene_test(spark, SF).collect()[0]
    assert sum(r[f"n_{s.lower()}"] for s in _SEGS) == r["n_total"]
    assert r["w_stat"] >= 0
    assert r["df1"] == 4 and r["df2"] == r["n_total"] - 5


def test_fd_discovery_keys_hold(spark):
    out = {r["fd"]: r for r in rel.fd_discovery(spark, SF).collect()}
    assert out["part: p_partkey -> p_brand"]["holds"] == 1
    assert out["documents: doc_id -> lang"]["holds"] == 1
    # the audit catches that the synthetic generator does NOT
    # enforce TPC-H's composite (l_orderkey, l_linenumber) PK —
    # the schema-assumption bug this operator exists to expose
    assert out[
        "lineitem: (l_orderkey, l_linenumber) -> l_partkey"
    ]["holds"] == 0
    # behavioral candidates genuinely vary on the fixture
    assert out["lineitem: l_orderkey -> l_suppkey"]["holds"] == 0
    assert out["customer: c_nationkey -> c_mktsegment"]["holds"] == 0
    for r in out.values():
        assert 0 <= r["n_violating"] <= r["n_groups"]


def test_holt_constant_series_is_flat(spark, tmp_path):
    """A constant series is a fixed point of the Holt recursion:
    level ≡ x, trend ≡ 0, forecast ≡ x — pins both the fold
    initialization and the update algebra."""
    import datetime as dt
    import os
    base = str(tmp_path / "holt")
    os.makedirs(base)
    d0 = dt.datetime(2021, 1, 1)
    rows = [(i, d0 + dt.timedelta(days=i)) for i in range(20)]
    spark.createDataFrame(
        rows, "o_orderkey: long, o_orderdate: timestamp"
    ).write.parquet(f"{base}/orders.parquet")
    out = rel.holt_smoothing(spark, base).collect()
    assert len(out) == 14
    for r in out:
        assert r["actual"] == 1
        assert r["level"] == 1.0
        assert r["trend"] == 0.0
        assert r["forecast_next"] == 1.0


def test_bpe_merge_hand_traced(spark, tmp_path):
    """Hand-traced 3-round merge on a 2-doc corpus, including the
    tie-break (count DESC, token ASC) at rounds 2 and 3."""
    import os
    base = str(tmp_path / "bpe")
    os.makedirs(base)
    docs = [(1, "a b a b c"), (2, "a b x")]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id: long, text: string, lang: string, source: string, "
        "n_chars: long",
    ).write.parquet(f"{base}/documents.parquet")
    out = text.bpe_merge_rounds(spark, base).collect()
    assert [(r["round"], r["tok_a"], r["tok_b"], r["pair_count"],
             r["n_tokens_after"]) for r in out] == [
        (1, "a", "b", 3, 5),        # -> "a_b a_b c" / "a_b x"
        (2, "a_b", "a_b", 1, 4),    # -> "a_b_a_b c" / "a_b x"
        (3, "a_b", "x", 1, 3),      # -> "a_b_a_b c" / "a_b_x"
    ]


def test_bpe_merge_overlap_is_greedy_nonoverlapping(spark, tmp_path):
    """'a a a' + merge(a,a) must become 'a_a a' (2 tokens), not
    'a_a_a' — the doubled-separator regexp equals the greedy
    left-to-right fold."""
    import os
    base = str(tmp_path / "bpeov")
    os.makedirs(base)
    spark.createDataFrame(
        [(1, "a a a", "en", "s", 5)],
        "doc_id: long, text: string, lang: string, source: string, "
        "n_chars: long",
    ).write.parquet(f"{base}/documents.parquet")
    out = text.bpe_merge_rounds(spark, base, rounds=1).collect()
    assert [(r["tok_a"], r["tok_b"], r["pair_count"],
             r["n_tokens_after"]) for r in out] == [("a", "a", 2, 2)]


def test_chunk_dedup_rebuild_drops_repeated_chunk(spark, tmp_path):
    """Doc 2 repeats doc 1's first 8-token chunk: the copy must
    vanish from doc 2 (first occurrence wins), unique chunks stay,
    and a doc that is ENTIRELY a duplicate rebuilds to ''."""
    import os
    from etl_geonet_quakes_spark.llm import corpus
    base = str(tmp_path / "cdr")
    os.makedirs(base)
    boiler = "c1 c2 c3 c4 c5 c6 c7 c8"
    docs = [
        (1, boiler + " u1 u2"),
        (2, boiler + " v1 v2 v3 v4 v5 v6 v7 v8"),
        (3, boiler),
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id: long, text: string, lang: string, source: string, "
        "n_chars: long",
    ).write.parquet(f"{base}/documents.parquet")
    out = {r["doc_id"]: r for r in
           corpus.chunk_dedup_rebuild(spark, base).collect()}
    assert out[1]["text_dedup"] == boiler + " u1 u2"
    assert out[1]["n_kept"] == 2 and out[1]["n_tokens_kept"] == 10
    assert out[2]["text_dedup"] == "v1 v2 v3 v4 v5 v6 v7 v8"
    assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 1
    assert out[3]["text_dedup"] == "" and out[3]["n_kept"] == 0
    assert out[3]["n_tokens"] == 8 and out[3]["n_tokens_kept"] == 0


def test_cross_correlation_detects_planted_lag(spark, tmp_path):
    """y is exactly x shifted 2 days: r_x_leads_y at lag 2 must be
    1.0 and the reverse direction must stay below it."""
    import datetime as dt
    import os
    base = str(tmp_path / "xcorr")
    os.makedirs(base)
    d0 = dt.datetime(2024, 3, 1)
    x = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7]
    rows = []
    eid = 0
    for i, c in enumerate(x):
        for _ in range(c):
            eid += 1
            rows.append((eid, d0 + dt.timedelta(days=i, hours=1),
                         eid, "click", 1.0, "{}"))
    for i, c in enumerate(x):
        for _ in range(c):
            eid += 1
            rows.append((eid, d0 + dt.timedelta(days=i + 2, hours=2),
                         eid, "purchase", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double, props: string",
    ).write.parquet(f"{base}/events.parquet")
    out = {r["lag"]: r for r in
           rel.cross_correlation(spark, base).collect()}
    assert out[2]["r_x_leads_y"] == 1.0
    assert out[2]["r_y_leads_x"] < 1.0
    assert all(out[l]["r_x_leads_y"] < 1.0 for l in out if l != 2)


def test_seasonal_anomaly_flags_only_planted_spike(spark, tmp_path):
    """Perfect weekly pattern for 8 weeks + one spiked day: the
    seasonal filter must flag exactly the spike (a raw z-score
    would also flag every weekend)."""
    import datetime as dt
    import os
    base = str(tmp_path / "seas")
    os.makedirs(base)
    d0 = dt.datetime(2022, 5, 2)
    pattern = [10, 12, 11, 13, 9, 30, 28]  # weekday/weekend profile
    rows = []
    oid = 0
    for w in range(8):
        for j, c in enumerate(pattern):
            n = c + (25 if (w == 4 and j == 2) else 0)  # spike day 30
            for _ in range(n):
                oid += 1
                rows.append((oid, d0 + dt.timedelta(days=w * 7 + j)))
    spark.createDataFrame(
        rows, "o_orderkey: long, o_orderdate: timestamp"
    ).write.parquet(f"{base}/orders.parquet")
    out = rel.seasonal_anomaly(spark, base).collect()
    assert [r["idx"] for r in out] == [30]
    assert out[0]["dow"] == 2
    assert out[0]["x"] == 36
    assert out[0]["z_score"] > 2.5


def test_kneser_ney_hand_traced(spark, tmp_path):
    """One-doc corpus 'a b a b': P(b|a)=0.8125, P(a|b)=0.625 by
    hand (D=0.75); avg_nll matches to 6dp. Also pins that the KN
    distribution per head sums to 1 over the type table."""
    import math
    import os
    base = str(tmp_path / "kn")
    os.makedirs(base)
    spark.createDataFrame(
        [(1, "a b a b", "en", "s", 7)],
        "doc_id: long, text: string, lang: string, source: string, "
        "n_chars: long",
    ).write.parquet(f"{base}/documents.parquet")
    out = text.kneser_ney_score(spark, base).collect()
    assert len(out) == 1
    expected = -(math.log(0.8125) + math.log(0.625)
                 + math.log(0.8125)) / 3
    assert out[0]["n_bigrams"] == 3
    assert out[0]["avg_nll"] == round(expected, 6)
    assert out[0]["ppl"] == round(math.exp(round(expected, 6)), 6)


def test_phrase_search_adjacency_and_zero_match(spark, tmp_path):
    """'beta gamma' is adjacent in doc 1 only; 'gamma beta' never
    occurs (order matters); a phrase absent entirely still gets a
    zero row."""
    import os
    base = str(tmp_path / "ph")
    os.makedirs(base)
    docs = [(1, "alpha beta gamma beta"), (2, "beta alpha gamma")]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id: long, text: string, lang: string, source: string, "
        "n_chars: long",
    ).write.parquet(f"{base}/documents.parquet")
    out = {r["phrase"]: r for r in text.phrase_search(
        spark, base,
        phrases=["beta gamma", "gamma beta", "alpha beta gamma", "zz qq"],
    ).collect()}
    assert out["beta gamma"]["n_docs"] == 1
    assert out["beta gamma"]["n_occurrences"] == 1
    assert out["gamma beta"]["n_occurrences"] == 1  # doc1 pos 3-4
    assert out["alpha beta gamma"]["n_docs"] == 1
    assert out["alpha beta gamma"]["phrase_len"] == 3
    assert out["zz qq"]["n_docs"] == 0 and out["zz qq"]["n_occurrences"] == 0


def test_holt_winters_pure_weekly_pattern_is_fixpoint(spark, tmp_path):
    """A perfectly repeating weekly pattern with no trend is a fixed
    point: level = weekly mean, trend = 0, seasonal = x_j − mean,
    and the one-step forecast is EXACTLY next day's value."""
    import datetime as dt
    import os
    base = str(tmp_path / "hw")
    os.makedirs(base)
    d0 = dt.datetime(2023, 1, 2)
    pattern = [7, 14, 21, 14, 7, 28, 14]  # mean = 15
    rows = []
    oid = 0
    for w in range(5):
        for j, c in enumerate(pattern):
            for _ in range(c):
                oid += 1
                rows.append((oid, d0 + dt.timedelta(days=w * 7 + j)))
    spark.createDataFrame(
        rows, "o_orderkey: long, o_orderdate: timestamp"
    ).write.parquet(f"{base}/orders.parquet")
    out = rel.holt_winters(spark, base).collect()
    assert len(out) == 14
    for r in out:
        assert r["level"] == 15.0
        assert r["trend"] == 0.0
        assert r["seasonal"] == r["actual"] - 15.0
        nxt = pattern[(r["idx"] + 1) % 7]
        assert r["forecast_next"] == float(nxt)


def test_pettitt_finds_planted_step(spark, tmp_path):
    """10 low days then 10 high days: K = 10·10 pairs all positive,
    changepoint at the last low day, direction +1."""
    import datetime as dt
    import os
    base = str(tmp_path / "pt")
    os.makedirs(base)
    d0 = dt.datetime(2024, 6, 1)
    rows = []
    oid = 0
    for i in range(20):
        for _ in range(1 if i < 10 else 5):
            oid += 1
            rows.append((oid, d0 + dt.timedelta(days=i)))
    spark.createDataFrame(
        rows, "o_orderkey: long, o_orderdate: timestamp"
    ).write.parquet(f"{base}/orders.parquet")
    r = rel.pettitt_test(spark, base).collect()[0]
    assert r["n_days"] == 20
    assert r["k_stat"] == 100
    assert r["tau_idx"] == 9
    assert r["direction"] == 1
    assert 0 < r["p_approx"] < 0.05


def test_bipartite_hits_hand_traced(spark, tmp_path):
    """Two customers, two parts, three edges — a2 hand-traced:
    p10 = 8, p11 = 5 (unnormalized (AᵀA)² on the ones vector)."""
    import os
    base = str(tmp_path / "hits")
    os.makedirs(base)
    spark.createDataFrame(
        [(100, 1), (101, 1), (102, 2)],
        "o_orderkey: long, o_custkey: long",
    ).write.parquet(f"{base}/orders.parquet")
    spark.createDataFrame(
        [(100, 10), (101, 11), (102, 10), (102, 10)],
        "l_orderkey: long, l_partkey: long",
    ).write.parquet(f"{base}/lineitem.parquet")
    out = {int(r["part"]): r for r in
           rel.bipartite_hits(spark, base).collect()}
    assert int(out[10]["authority"]) == 8
    assert int(out[11]["authority"]) == 5
    assert out[10]["authority_norm"] == 1.0
    assert out[11]["authority_norm"] == 0.625


def test_stream_full_outer_emits_both_null_families(spark):
    """Full-outer stream join must contain matched rows, unmatched
    clicks (null purchase), AND unmatched purchases (null click) —
    and equal the batch full join computed in Spark."""
    from etl_geonet_quakes_spark.io import load_table
    from etl_geonet_quakes_spark.streaming.windows import (
        stream_full_outer_join,
    )
    got = stream_full_outer_join(spark, SF).collect()
    n_click_only = sum(1 for r in got if r["purchase_id"] is None)
    n_purch_only = sum(1 for r in got if r["click_id"] is None)
    n_matched = sum(
        1 for r in got
        if r["click_id"] is not None and r["purchase_id"] is not None
    )
    assert n_click_only > 0 and n_purch_only > 0 and n_matched > 0
    ev = load_table(spark, SF, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts")
           <= F.col("click_ts") + F.expr("INTERVAL 48 HOURS")),
        "fullOuter",
    )
    assert len(got) == batch.count()


def test_feature_hashing_conservation_and_purity(spark):
    from etl_geonet_quakes_spark.llm.dedup import feature_hashing_audit
    from etl_geonet_quakes_spark.io import load_table
    out = feature_hashing_audit(spark, SF).collect()
    total = load_table(spark, SF, "documents").select(
        F.explode(F.split("text", " ")).alias("t")
    ).count()
    assert sum(r["n_tokens"] for r in out) == total
    for r in out:
        assert 0 <= r["bucket"] < 64
        assert 0 < r["top_share"] <= 1.0
        assert r["n_distinct"] <= r["n_tokens"]


def test_bootstrap_ci_brackets_point_mean(spark):
    r = rel.bootstrap_ci(spark, SF).collect()[0]
    assert r["n_replicates"] == 64
    assert r["ci_lo"] <= r["point_mean"] <= r["ci_hi"]
    assert r["se_boot"] > 0
    # half-sampling: CI must be reasonably tight around the mean
    assert (r["ci_hi"] - r["ci_lo"]) < r["point_mean"]


def test_naive_bayes_confusion_partitions_corpus(spark):
    from etl_geonet_quakes_spark.io import load_table
    out = text.naive_bayes_confusion(spark, SF).collect()
    per_true = {}
    for r in out:
        per_true[r["true_source"]] = (
            per_true.get(r["true_source"], 0) + r["n_docs"]
        )
    truth = {
        r["source"]: r["n"]
        for r in load_table(spark, SF, "documents")
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per_true == truth


def test_join_cardinality_actual_matches_real_join(spark):
    from etl_geonet_quakes_spark.io import load_table
    out = {r["join_name"]: r for r in
           rel.join_cardinality_audit(spark, SF).collect()}
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    real = c.join(o, c.c_custkey == o.o_custkey).count()
    assert int(out["customer-orders"]["actual_rows"]) == real
    # PK-FK join: estimate should be close (misestimate ~1)
    assert 0.5 < out["customer-orders"]["misestimate"] < 2.0
    # self-join on a skewed FK: actual must exceed the independence
    # estimate unless the key is uniform; either way internally exact
    oo = out["orders-selfjoin-custkey"]
    real_self = o.select("o_custkey").join(
        o.select(F.col("o_custkey").alias("k2")),
        F.col("o_custkey") == F.col("k2"),
    ).count()
    assert int(oo["actual_rows"]) == real_self


def test_apriori_triples_respect_monotonicity(spark):
    """Support of every reported triple cannot exceed the support of
    any of its pairs (apriori property), and all supports clear the
    1% relative threshold."""
    from etl_geonet_quakes_spark.io import load_table
    out = rel.apriori_triples(spark, SF).collect()
    assert out, "fixture should yield at least one frequent triple"
    li = load_table(spark, SF, "lineitem")
    p = load_table(spark, SF, "part")
    baskets = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("oid"),
                F.col("p_brand").alias("item"))
        .distinct()
    )
    n_baskets = baskets.select("oid").distinct().count()
    thresh = -(-1 * n_baskets // 100)  # ceil(0.01 n)
    sets = {}
    for row in baskets.collect():
        sets.setdefault(row["oid"], set()).add(row["item"])
    for r in out:
        t = {r["item1"], r["item2"], r["item3"]}
        true_sup = sum(1 for s in sets.values() if t <= s)
        assert r["support"] == true_sup
        assert r["support"] >= thresh


def test_rrf_fusion_rewards_dual_presence(spark):
    """A doc ranked in BOTH lists must outscore a doc holding the
    same single-list rank but absent from the other list; scores
    are bounded by 2/(60+1)."""
    from etl_geonet_quakes_spark.llm.similarity import rrf_hybrid_fusion
    out = rrf_fusion_rows = rrf_hybrid_fusion(spark, SF).collect()
    assert len(out) == 15
    assert [r["rnk"] for r in out] == list(range(1, 16))
    for r in out:
        assert r["rrf_score"] <= round(2 / 61, 6) + 1e-9
        lex = 1 / (60 + r["rank_lex"]) if r["rank_lex"] else 0.0
        sem = 1 / (60 + r["rank_sem"]) if r["rank_sem"] else 0.0
        assert r["rrf_score"] == round(lex + sem, 6)
    scores = [r["rrf_score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_zonemap_date_clustering_prunes(spark):
    """Sorted-by-date zones must make date predicates highly
    skippable while the uncorrelated value predicate skips ~nothing
    — the Z-ORDER motivation, quantified."""
    out = {r["predicate"]: r for r in
           rel.zonemap_skip_audit(spark, SF).collect()}
    assert out["date_1998plus"]["n_skippable"] > 0
    assert out["value_top"]["n_skippable"] == 0
    for r in out.values():
        assert r["n_skippable"] + r["n_full_match"] <= r["n_zones"]


def test_auc_matches_pair_counting(spark):
    """AUC from the rank identity equals brute-force pair counting
    P(s+ > s-) + 0.5 P(tie) on the fixture."""
    from etl_geonet_quakes_spark.io import load_table
    r = rel.auc_score(spark, SF).collect()[0]
    rows = load_table(spark, SF, "documents").select(
        (F.col("lang") == "en").cast("int").alias("y"), "n_chars"
    ).collect()
    pos = [x["n_chars"] for x in rows if x["y"] == 1]
    neg = [x["n_chars"] for x in rows if x["y"] == 0]
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    brute = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert r["auc"] == round(brute, 6)


def test_did_cells_are_exact(spark):
    """DiD must equal the hand-recomputed four-cell means, and the
    panel zero-fill must count every user in every period."""
    from etl_geonet_quakes_spark.io import load_table
    r = rel.diff_in_differences(spark, SF).collect()[0]
    ev = load_table(spark, SF, "events").select(
        "user_id", "event_type", F.to_date("ts").alias("d")
    ).collect()
    users = {e["user_id"] for e in ev}
    su = {}
    for e in ev:
        if e["event_type"] == "signup":
            su[e["user_id"]] = su.get(e["user_id"], 0) + 1
    total, nsu = sum(su.values()), len(su)
    treated = {u for u in users if su.get(u, 0) * nsu > total}
    import datetime as dt
    pivot = dt.date(2024, 1, 15)
    cells = {(g, p): 0 for g in (0, 1) for p in (0, 1)}
    for e in ev:
        if e["event_type"] != "click":
            continue
        g = 1 if e["user_id"] in treated else 0
        p = 1 if e["d"] >= pivot else 0
        cells[(g, p)] += 1
    n_t, n_c = len(treated), len(users) - len(treated)
    assert r["n_treated"] == n_t and r["n_control"] == n_c
    did = (cells[(1, 1)] / n_t - cells[(1, 0)] / n_t) - (
        cells[(0, 1)] / n_c - cells[(0, 0)] / n_c
    )
    assert r["did"] == round(did, 6)


def test_price_volume_mix_residual_is_zero(spark):
    """The decomposition is an algebraic identity: residual must
    round to 0 for every brand, and the effects must sum to the
    actual revenue delta."""
    out = rel.price_volume_mix(spark, SF).collect()
    assert out, "both years present in fixture"
    for r in out:
        assert r["residual"] == 0.0
        delta = (r["r_b"] - r["r_a"]) / 100.0
        assert abs(r["volume_effect"] + r["price_effect"] - delta) < 5e-6


def test_sprt_decision_consistent_with_trajectory(spark):
    """The decision row's LLR must lie on/beyond the boundary it
    names, and n_at_decision is within the event count."""
    r = rel.sprt_test(spark, SF).collect()[0]
    if r["decision"] == "accept_h1":
        assert r["llr"] >= r["upper_bound"] - 1e-9
    elif r["decision"] == "accept_h0":
        assert r["llr"] <= r["lower_bound"] + 1e-9
    else:
        assert r["lower_bound"] < r["llr"] < r["upper_bound"]
    assert 1 <= r["n_at_decision"] <= 398 * 10  # any sf
    assert 0 <= r["k_clicks"] <= r["n_at_decision"]


def test_sprt_planted_stream_decides_h0(spark, tmp_path):
    """A stream of almost-all views must cross the LOWER boundary:
    hand-plantable because LLR is linear in (n, k)."""
    import datetime as dt
    import os
    base = str(tmp_path / "sprt")
    os.makedirs(base)
    d0 = dt.datetime(2024, 2, 1)
    rows = []
    for i in range(60):
        et = "click" if i % 10 == 0 else "view"
        rows.append((i, d0 + dt.timedelta(minutes=i), i, et, 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double, props: string",
    ).write.parquet(f"{base}/events.parquet")
    r = rel.sprt_test(spark, base).collect()[0]
    assert r["decision"] == "accept_h0"
    # crossing requires llr <= ln(0.05/0.95): with l=ln(11/9),
    # llr = l*(2k-n); first cross at the earliest n with
    # (2k-n) <= -14.66 -> n=17, k=2 gives 2k-n = -13; n=18,k=2: -14;
    # n=19,k=2: -15 -> crossing at n=19
    assert r["n_at_decision"] == 19


def test_link_prediction_auc_beats_chance(spark):
    """Common-neighbor scores on real edges must beat the sampled
    non-edges well above chance on the co-purchase graph."""
    r = rel.link_prediction_auc(spark, SF).collect()[0]
    assert r["n_pos"] > 0 and r["n_neg"] > 0
    assert 0.0 <= r["auc"] <= 1.0
    assert r["auc"] > 0.5


def test_effect_sizes_bounds_and_consistency(spark):
    r = rel.effect_sizes(spark, SF).collect()[0]
    assert r["chi2"] >= 0
    assert 0 <= r["cramers_v"] <= 1
    assert 0 <= r["contingency_c"] < 1
    # V = w / sqrt(min(r-1,c-1)): here min side is langs (5) -> 2.0
    import math as m
    assert abs(r["cramers_v"] - r["cohens_w"] / m.sqrt(4)) < 1e-6


def test_correlation_matrix_self_consistency(spark, tmp_path):
    """All 6 upper-triangle pairs present with r in [-1, 1] on the
    fixture (whose columns are drawn independently — near-zero r is
    the correct answer there); a planted perfectly-linear pair on a
    synthetic dir must give exactly r = 1.0."""
    out = rel.correlation_matrix(spark, SF).collect()
    assert len(out) == 6
    d = {(r["var_a"], r["var_b"]): r["r"] for r in out}
    assert all(-1.0 <= v <= 1.0 for v in d.values())
    import os
    base = str(tmp_path / "cm")
    os.makedirs(base)
    rows = [(float(q), float(q) * 7.0, 0.01 * (q % 5), 0.02)
            for q in range(1, 40)]
    spark.createDataFrame(
        rows, "l_quantity: double, l_extendedprice: double, "
              "l_discount: double, l_tax: double"
    ).write.parquet(f"{base}/lineitem.parquet")
    planted = {(r["var_a"], r["var_b"]): r["r"] for r in
               rel.correlation_matrix(spark, base).collect()}
    assert planted[("quantity", "extendedprice")] == 1.0


def test_pca_2d_eigen_identities(spark):
    """Trace and determinant identities: l1 + l2 = var_x + var_y,
    l1*l2 = var_x*var_y - cov^2 (to rounding); l1 >= l2."""
    r = rel.pca_2d_exact(spark, SF).collect()[0]
    assert r["lambda1"] >= r["lambda2"]
    tr = r["var_x"] + r["var_y"]
    assert abs((r["lambda1"] + r["lambda2"]) - tr) / abs(tr) < 1e-9
    det = r["var_x"] * r["var_y"] - r["cov_xy"] * r["cov_xy"]
    assert abs(r["lambda1"] * r["lambda2"] - det) / max(abs(det), 1) < 1e-3
    assert 0.5 <= r["explained_ratio"] <= 1.0


def test_theil_sen_robust_to_planted_outlier(spark, tmp_path):
    """A clean linear series (slope 2/day) with ONE wild outlier
    day: Theil-Sen must stay at ~2, OLS must be dragged away —
    the operator's reason to exist, demonstrated."""
    import datetime as dt
    import os
    base = str(tmp_path / "ts")
    os.makedirs(base)
    d0 = dt.datetime(2024, 1, 1)
    rows = []
    oid = 0
    for i in range(15):
        # outlier near the end: center outliers have zero OLS
        # leverage and would leave the slope untouched
        n = 5 + 2 * i if i != 13 else 500
        for _ in range(n):
            oid += 1
            rows.append((oid, d0 + dt.timedelta(days=i)))
    spark.createDataFrame(
        rows, "o_orderkey: long, o_orderdate: timestamp"
    ).write.parquet(f"{base}/orders.parquet")
    r = rel.theil_sen_slope(spark, base).collect()[0]
    assert r["n_days"] == 15
    assert abs(r["ts_slope"] - 2.0) < 0.5
    assert abs(r["ols_slope"] - 2.0) > 2.0  # OLS dragged by outlier


def test_brand_modularity_bounds(spark):
    r = rel.brand_modularity(spark, SF).collect()[0]
    assert r["m_edges"] > 0
    assert -1.0 <= r["modularity_q"] <= 1.0
    assert -1.0 <= r["assortativity_norm"] <= 1.0


def test_surrogate_keys_stable_and_gapless(spark):
    out = rel.surrogate_keys(spark, SF).collect()
    sks = [r["sk"] for r in out]
    assert sks == list(range(1, len(out) + 1))
    # existing members occupy the low keys, new members the high
    n_old = sum(1 for r in out if r["is_new"] == 0)
    assert all(r["sk"] <= n_old for r in out if r["is_new"] == 0)
    assert all(r["sk"] > n_old for r in out if r["is_new"] == 1)
    # idempotence: seeding with the FULL corpus yields no new rows
    full = rel.surrogate_keys(spark, SF, seed_below=10**9).collect()
    assert all(r["is_new"] == 0 for r in full)


def test_woe_iv_shares_balance(spark):
    out = rel.woe_iv(spark, SF).collect()
    assert len(out) == 10
    # bins partition the orders; bin edges are monotone
    for a, b in zip(out, out[1:]):
        assert a["max_cents"] <= b["min_cents"]
    # every iv_term is non-negative (share gap and WOE share sign)
    for r in out:
        assert r["iv_term"] >= 0


def test_conformal_coverage_meets_guarantee(spark):
    r = rel.conformal_interval(spark, SF).collect()[0]
    assert r["q_hat"] >= 0
    assert r["n_cal"] > 0 and r["n_test"] > 0
    # split-conformal guarantee: coverage >= 1 - alpha on
    # exchangeable data; allow small slack for the fixture's size
    assert r["coverage"] >= r["target_coverage"] - 0.05


def test_rolling_correlation_window_exactness(spark):
    """Spot-check one window against a brute-force recompute."""
    from etl_geonet_quakes_spark.io import load_table
    out = rel.rolling_correlation(spark, SF).collect()
    assert out, "fixture spans > 28 days"
    for r in out:
        if r["r_rolling"] is not None:
            assert -1.0 <= r["r_rolling"] <= 1.0
    sp = rel._event_daily_pair(spark, SF, "click", "purchase").collect()
    series = {r["idx"]: (r["x"], r["y"]) for r in sp}
    probe = out[len(out) // 2]
    xs = [series[i][0] for i in range(probe["idx"] - 27, probe["idx"] + 1)]
    ys = [series[i][1] for i in range(probe["idx"] - 27, probe["idx"] + 1)]
    n = 28.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    import math as m
    expect = (n * sxy - sx * sy) / (
        m.sqrt(n * sxx - sx * sx) * m.sqrt(n * syy - sy * sy)
    )
    assert probe["r_rolling"] == round(expect, 6)


def test_cohen_kappa_bounds_and_cells(spark):
    r = rel.cohen_kappa(spark, SF).collect()[0]
    assert r["n"] == r["n11"] + r["n10"] + r["n01"] + r["n00"]
    assert -1.0 <= r["kappa"] <= 1.0
    assert 0.0 <= r["p_observed"] <= 1.0
    assert 0.0 <= r["p_expected"] <= 1.0


def test_mcnemar_cells_consistent(spark):
    r = rel.mcnemar_test(spark, SF).collect()[0]
    assert 0 <= r["b_disc"] + r["c_disc"] <= r["n"]
    if r["mcnemar_chi2"] is not None:
        assert r["mcnemar_chi2"] >= 0
    # accuracy difference must come entirely from discordant pairs
    assert round(r["acc_a"] - r["acc_b"], 6) == round(
        (r["b_disc"] - r["c_disc"]) / r["n"], 6
    )


def test_lift_gains_monotone_capture(spark):
    out = rel.lift_gains(spark, SF).collect()
    assert [r["decile"] for r in out] == list(range(1, 11))
    caps = [r["cum_capture"] for r in out]
    assert all(a <= b for a, b in zip(caps, caps[1:]))
    assert caps[-1] == 1.0
    # final cumulative lift over the whole population is exactly 1
    assert out[-1]["cum_lift"] == 1.0


def test_k_anonymity_accounting(spark):
    r = rel.k_anonymity(spark, SF).collect()[0]
    assert r["rows_at_risk"] <= r["n_rows"]
    assert r["groups_below_k"] <= r["n_groups"]
    assert 1 <= r["min_l_diversity"] <= 2
    assert r["min_group_size"] >= 1


def test_nelson_aalen_vs_km_relationship(spark):
    """H(t) is nondecreasing and exp(-H) upper-bounds the KM
    product-limit survival at every event time (1-x <= exp(-x))."""
    na = {r["t_days"]: r for r in rel.nelson_aalen(spark, SF).collect()}
    km = {r["t_days"]: r for r in rel.kaplan_meier(spark, SF).collect()}
    assert set(na) == set(km)
    hs = [na[t]["cum_hazard"] for t in sorted(na)]
    assert all(a <= b for a, b in zip(hs, hs[1:]))
    for t in na:
        assert na[t]["s_breslow"] >= km[t]["survival"] - 1e-6


def test_ngram_diversity_ordering(spark):
    out = text.ngram_diversity(spark, SF).collect()
    assert len(out) >= 2
    for r in out:
        # longer n-grams are strictly more diverse on word-soup text
        assert 0 < r["distinct_1"] <= r["distinct_2"] <= r["distinct_3"] <= 1.0


def test_calibration_audit_bounds(spark):
    r = rel.calibration_audit(spark, SF).collect()[0]
    assert r["n_test"] > 0
    assert 1 <= r["bins_used"] <= 10
    assert 0.0 <= r["ece"] <= r["mce"] <= 1.0
    assert 0.0 <= r["brier"] <= 0.25 + 1e-6  # worst case p=0.5 everywhere


def test_page_hinkley_invariants(spark):
    out = rel.page_hinkley(spark, SF).collect()
    assert out[0]["u_stat"] == 0.0  # first deviation is x - x = 0
    for r in out:
        assert r["excursion"] >= 0.0
        assert r["alarm"] in (0, 1)
        assert r["alarm"] == (1 if r["excursion"] > 25.0 else 0)


def test_burrows_delta_symmetric_bounds(spark):
    out = text.burrows_delta(spark, SF).collect()
    assert out, "at least one source pair"
    srcs = {r["src_a"] for r in out} | {r["src_b"] for r in out}
    n = len(srcs)
    assert len(out) == n * (n - 1) // 2  # complete pair set
    for r in out:
        assert r["delta"] >= 0.0
        assert r["n_words"] >= 1


def test_logistic_irls_converged_and_sane(spark):
    """3 vs 4 Newton steps agree to 6dp on the fixture (converged),
    and the intercept matches the base rate: p(URGENT) ~ sigmoid(b0)
    at x=0 within the fit's tolerance."""
    import math as m
    r3 = rel.logistic_irls(spark, SF, iters=3).collect()[0]
    r4 = rel.logistic_irls(spark, SF, iters=4).collect()[0]
    assert abs(r3["b0"] - r4["b0"]) < 1e-4
    assert abs(r3["b1"] - r4["b1"]) < 1e-4
    assert r3["avg_log_likelihood"] < 0
    base = 1.0 / (1.0 + m.exp(-r3["b0"]))
    assert 0.05 < base < 0.5  # URGENT is one of five priorities


def test_cox_ph_converged_and_consistent(spark):
    """3 vs 5 Newton steps agree to 6dp (converged); the fitted
    hazard ratio is positive and finite, and se shrinks with more
    events (sanity against the sf0.01 fixture)."""
    r3 = rel.cox_ph(spark, SF, iters=3).collect()[0]
    r5 = rel.cox_ph(spark, SF, iters=5).collect()[0]
    assert abs(r3["beta"] - r5["beta"]) < 1e-4
    assert r3["hazard_ratio"] > 0
    assert r3["se_beta"] > 0
    assert r3["n_events"] > 0 and r3["n_times"] > 0
    big = rel.cox_ph(spark, SF01, iters=3).collect()[0]
    assert big["se_beta"] < r3["se_beta"]


def test_ipf_raking_hits_margins(spark):
    """After 3 rounds the column (segment) margins are exact by
    construction; the row (nation) margins are within 1% relative —
    IPF's geometric convergence on a well-connected table."""
    from etl_geonet_quakes_spark.io import load_table
    out = rel.ipf_raking(spark, SF).collect()
    c = load_table(spark, SF, "customer")
    seg_t = {
        r["seg"]: r["t"]
        for r in c.groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count("*").alias("t"))
        .collect()
    }
    nat_t = {
        r["nat"]: r["t"]
        for r in c.groupBy(F.col("c_nationkey").alias("nat"))
        .agg(F.count("*").alias("t"))
        .collect()
    }
    seg_sum, nat_sum = {}, {}
    for r in out:
        seg_sum[r["seg"]] = seg_sum.get(r["seg"], 0.0) + r["w_raked"]
        nat_sum[r["nat"]] = nat_sum.get(r["nat"], 0.0) + r["w_raked"]
    for s, t in seg_t.items():
        assert abs(seg_sum[s] - t) < 1e-3 * t
    for n, t in nat_t.items():
        if n in nat_sum:
            assert abs(nat_sum[n] - t) < 0.01 * t + 1.0


def test_propensity_ate_reduces_to_naive_without_confounding(spark):
    """With a single segment stratum the IPW estimate equals the
    naive difference; across strata it stays within the naive ±
    the maximum stratum spread (bounded reweighting sanity)."""
    r = rel.propensity_ate(spark, SF).collect()[0]
    assert 0.0 < r["p_treated"] < 1.0
    assert abs(r["ate_ipw"] - r["naive_diff"]) < 0.2
    assert -1.0 <= r["ate_ipw"] <= 1.0


def test_seasonal_decompose_identity(spark):
    """x == trend + seasonal + residual by construction (6dp), and
    the seasonal component is a pure dow function."""
    out = rel.seasonal_decompose(spark, SF).collect()
    assert out, "complete 7-day windows exist"
    by_dow = {}
    for r in out:
        assert abs(r["x"] - (r["trend"] + r["seasonal"] + r["residual"])) < 5e-6
        by_dow.setdefault(r["dow"], set()).add(r["seasonal"])
    for vals in by_dow.values():
        assert len(vals) == 1


def test_pacf_lag1_equals_acf_lag1(spark):
    r = rel.pacf_yw(spark, SF).collect()[0]
    assert r["pacf_1"] == r["acf_1"]
    for k in (1, 2, 3):
        assert -1.0 <= r[f"acf_{k}"] <= 1.0
        assert -1.0 <= r[f"pacf_{k}"] <= 1.0


def test_granger_directions_and_rss_ordering(spark):
    out = rel.granger_causality(spark, SF).collect()
    assert [r["direction"] for r in out] == [
        "click->purchase", "purchase->click"
    ]
    for r in out:
        # adding a regressor can only reduce RSS
        assert r["rss_unrestricted"] <= r["rss_restricted"] + 1e-6
        assert r["f_stat"] >= -1e-9
        assert r["m"] > 10


def test_ndcg_bounds_and_population(spark):
    r = rel.ndcg_at_k(spark, SF).collect()[0]
    assert r["n_customers"] > 0
    assert 0.0 <= r["mean_ndcg"] <= 1.0


def test_chao1_dominates_observed_vocab(spark):
    out = text.chao1_richness(spark, SF).collect()
    assert len(out) >= 2
    for r in out:
        assert r["chao1"] >= r["v_obs"]
        assert 0.0 <= r["unseen_mass"] <= 1.0
        assert r["n1"] + 2 * r["n2"] <= r["n_tokens"]


def test_heaps_beta_near_zero_on_closed_vocabulary(spark):
    """The fixture's template vocabulary saturates almost instantly,
    so the Heaps exponent must be far below natural-text 0.4-0.6 —
    the flat case this diagnostic exists to flag."""
    r = text.heaps_law(spark, SF).collect()[0]
    assert r["n_checkpoints"] == 20
    assert r["beta"] < 0.2
    assert r["k_coef"] > 0


def test_mahalanobis_buckets_partition(spark):
    out = rel.mahalanobis_outliers(spark, SF).collect()
    assert out[0]["bucket"] >= 0
    # outliers only live in buckets >= 9 (9.21 threshold)
    for r in out:
        if r["bucket"] < 9:
            assert r["n_outliers"] == 0
    # chi2(2): ~1% beyond 9.21 under normality; allow wide fixture slack
    tot = sum(r["n"] for r in out)
    outl = sum(r["n_outliers"] for r in out)
    assert 0 <= outl < 0.1 * tot


def test_kendall_tau_bounds_and_sign_vs_spearman(spark):
    r = rel.kendall_tau_b(spark, SF).collect()[0]
    assert -1.0 <= r["tau_b"] <= 1.0
    assert r["concordant"] >= 0 and r["discordant"] >= 0
    # value decile and item count are essentially independent in the
    # fixture: |tau| should be small
    assert abs(r["tau_b"]) < 0.2


def test_cuped_preserves_expectation_reduces_variance(spark):
    r = rel.cuped_adjustment(spark, SF).collect()[0]
    assert 0.0 <= r["variance_reduction"] <= 1.0
    assert 0 < r["n_treated"] < r["n"]
    # the adjustment shifts the diff by theta*(x1-x0): bounded sanity
    assert abs(r["cuped_diff"] - r["naive_diff"]) < 1.0


def test_isotonic_fit_properties(spark):
    """Monotone nondecreasing, mass-preserving (weighted mean of fit
    equals global rate), and a brute-force PAVA cross-check."""
    out = rel.isotonic_regression(spark, SF).collect()
    rates = [r["iso_rate"] for r in out]
    assert all(a <= b + 1e-9 for a, b in zip(rates, rates[1:]))
    tot_n = sum(r["n"] for r in out)
    tot_pos = sum(r["n_pos"] for r in out)
    fit_mass = sum(r["iso_rate"] * r["n"] for r in out)
    assert abs(fit_mass - tot_pos) < 1e-2 * tot_n
    # brute-force PAVA on the same cells (pos, n, bin-count)
    blocks = [[r["n_pos"], r["n"], 1] for r in out]
    merged = []
    for b in blocks:
        merged.append(list(b))
        while len(merged) > 1 and (
            merged[-2][0] * merged[-1][1] >= merged[-1][0] * merged[-2][1]
        ):
            p, n, c = merged.pop()
            merged[-1][0] += p
            merged[-1][1] += n
            merged[-1][2] += c
    expect = []
    for p, n, c in merged:
        expect.extend([p / n] * c)
    for got, exp in zip(rates, expect):
        assert abs(got - exp) < 1e-6


def test_rbo_bounds_and_self_similarity(spark):
    r = rel.rank_biased_overlap(spark, SF).collect()[0]
    assert 0.0 <= r["rbo"] <= 1.0
    assert 0 <= r["overlap_k"] <= 10
    # RBO is truncated: even identical rankings stay below 1 at k=10
    max_rbo = 0.1 * sum(rel._RBO_W[d - 1] for d in range(1, 11))
    assert r["rbo"] <= max_rbo + 1e-9


def test_srm_passes_on_md5_coin(spark):
    r = rel.srm_check(spark, SF01).collect()[0]
    assert r["n"] == r["n_treated"] + r["n_control"]
    # the md5 coin is unbiased: no mismatch at sf0.01
    assert r["srm_flag"] == 0


def test_safety_stock_nonnegative_and_rop_identity(spark):
    out = rel.safety_stock(spark, SF).collect()
    assert len(out) == 25  # TPC-H brands
    for r in out:
        assert r["sigma_daily"] >= 0
        assert r["safety_stock"] >= 0
        assert abs(
            r["reorder_point"] - (r["mu_daily"] * 7 + r["safety_stock"])
        ) < 1e-5  # three 6dp-rounded columns compound
        assert r["active_days"] <= r["n_days"]


def test_ltv_curve_monotone_within_cohort(spark):
    out = rel.ltv_curve(spark, SF).collect()
    by_cohort = {}
    for r in out:
        by_cohort.setdefault(r["cohort"], []).append(r)
    assert len(by_cohort) > 5
    for rows in by_cohort.values():
        ages = [r["age"] for r in rows]
        assert ages == sorted(ages)
        ltvs = [r["cum_ltv_per_head"] for r in rows]
        assert all(a <= b + 1e-9 for a, b in zip(ltvs, ltvs[1:]))


def test_jensen_shannon_bounds_and_symmetric_frame(spark):
    import math as m
    out = text.jensen_shannon_matrix(spark, SF).collect()
    srcs = {r["src_a"] for r in out} | {r["src_b"] for r in out}
    n = len(srcs)
    assert len(out) == n * (n - 1) // 2
    for r in out:
        assert 0.0 <= r["js_divergence"] <= m.log(2) + 1e-9
        # compare squared: sqrt amplifies the 6dp rounding near 0
        assert abs(r["js_distance"] ** 2 - r["js_divergence"]) < 1e-5


def test_wasserstein_brute_force_crosscheck(spark):
    """W1 equals the brute-force |F_a - F_b| integral on the fixture."""
    from etl_geonet_quakes_spark.io import load_table
    r = rel.wasserstein_1d(spark, SF).collect()[0]
    o = load_table(spark, SF, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, SF, "customer")
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
            (F.col("c_mktsegment") == "BUILDING").cast("long").alias("g"),
        )
        .collect()
    )
    a = sorted(x["v"] for x in rows if x["g"] == 1)
    b = sorted(x["v"] for x in rows if x["g"] == 0)
    vals = sorted(set(a) | set(b))
    import bisect
    integral = 0.0
    for lo, hi in zip(vals, vals[1:]):
        fa = bisect.bisect_right(a, lo) / len(a)
        fb = bisect.bisect_right(b, lo) / len(b)
        integral += abs(fa - fb) * (hi - lo)
    assert abs(r["w1_dollars"] - integral / 100.0) < 1e-4
    assert r["n_building"] == len(a) and r["n_rest"] == len(b)


def test_fdr_bh_structure(spark):
    import math as m
    out = rel.fdr_bh(spark, SF01).collect()
    assert len(out) == 25
    ps = [r["p_value"] for r in out]
    assert ps == sorted(ps)  # ordered by rank
    for r in out:
        assert 0.0 <= r["p_value"] <= 1.0
        # A-S approximation sanity at a known point: p(z=0) = 1
        if abs(r["z_stat"]) < 1e-9:
            assert abs(r["p_value"] - 1.0) < 1e-5
    # discoveries form a prefix of the rank order (step-up property)
    flags = [r["discovery"] for r in out]
    assert flags == sorted(flags, reverse=True)


def test_normal_p_approximation_accuracy(spark):
    """The shared-literal A-S p-values match scipy-free exact values
    (via math.erfc) within the documented 1.5e-7 erf error."""
    import math as m
    df = spark.range(1).select(
        *[
            rel._normal_two_sided_p(F.lit(z)).alias(f"p{i}")
            for i, z in enumerate([0.0, 0.5, 1.0, 1.959964, 3.0])
        ]
    )
    row = df.collect()[0]
    for i, z in enumerate([0.0, 0.5, 1.0, 1.959964, 3.0]):
        exact = m.erfc(z / m.sqrt(2))
        assert abs(row[f"p{i}"] - exact) < 3e-7, (z, row[f"p{i}"], exact)


def test_power_mde_scales_with_n(spark):
    small = rel.power_mde(spark, SF).collect()[0]
    big = rel.power_mde(spark, SF01).collect()[0]
    assert big["n"] > small["n"]
    assert big["mde_abs"] < small["mde_abs"]  # more users, smaller MDE
    assert small["mde_abs"] > 0


def test_partial_correlation_attenuates_raw(spark):
    r = rel.partial_correlation(spark, SF).collect()[0]
    for c in ("r_xy", "r_xz", "r_yz", "r_xy_given_z"):
        assert -1.0 <= r[c] <= 1.0
    # the controlled correlation must differ from the raw one when
    # both series load on traffic (non-trivial control)
    assert r["r_xz"] != 0 and r["r_yz"] != 0


def test_negative_binomial_identities(spark):
    out = rel.negative_binomial_fit(spark, SF).collect()
    assert len(out) == 25
    for r in out:
        assert r["dispersion"] > 0
        if r["nb_r"] is not None:
            # MoM identities: mean = r(1-p)/p within rounding
            assert r["nb_p"] is not None and 0 < r["nb_p"] < 1
            implied = r["nb_r"] * (1 - r["nb_p"]) / r["nb_p"]
            assert abs(implied - r["mean_daily"]) < 1e-3
        else:
            assert r["dispersion"] <= 1.0 + 1e-9


def test_cochran_armitage_null_on_uniform_priorities(spark):
    """TPC-H priorities are value-independent: the trend must be
    statistically unremarkable (|z| modest, p not tiny)."""
    r = rel.cochran_armitage(spark, SF01).collect()[0]
    assert 0.0 <= r["p_value"] <= 1.0
    assert abs(r["z_trend"]) < 4.0
    assert r["n_urgent"] < r["n"]


def test_hurst_in_range(spark):
    r = rel.hurst_exponent(spark, SF).collect()[0]
    assert r["n_block_sizes"] == 5
    # iid-ish counts: H near 0.5; allow the fixture wide latitude
    assert 0.0 < r["hurst_h"] < 1.2


def test_weekly_spectrum_share_bounds(spark):
    r = rel.weekly_spectrum(spark, SF).collect()[0]
    assert 0.0 <= r["weekly_variance_share"] <= 1.0 + 1e-9
    assert r["weekly_amplitude"] >= 0


def test_runs_test_counts_consistent(spark):
    r = rel.runs_test(spark, SF).collect()[0]
    assert 1 <= r["n_runs"] <= r["n"]
    assert 0 < r["n_above"] < r["n"]
    assert 0.0 <= r["p_value"] <= 1.0


def test_wilcoxon_no_shift_on_uniform_orders(spark):
    """TPC-H orders are date-uniform: the H1/H2 paired shift must be
    unremarkable (p not tiny), and W+ must sit within its support."""
    r = rel.wilcoxon_signed_rank(spark, SF01).collect()[0]
    n = r["n_pairs"]
    assert 0 <= r["w_plus"] <= n * (n + 1) / 2
    assert r["p_value"] > 1e-4


def test_ljung_box_matches_acf_lags(spark):
    """Q recomputed from q309's exact ACF values matches q_stat."""
    r = rel.ljung_box(spark, SF).collect()[0]
    assert r["q_stat"] >= 0
    assert r["reject_whiteness"] in (0, 1)
    assert r["reject_whiteness"] == (1 if r["q_stat"] > 14.06714 else 0)


def test_friedman_bounds(spark):
    r = rel.friedman_test(spark, SF01).collect()[0]
    assert r["n_blocks"] == 7
    assert r["chi2_f"] >= 0
    # max possible chi2_F for k=5 is n*k... sanity upper bound
    assert r["chi2_f"] <= 12.0 / (7 * 5 * 6) * 7 * 7 * 125 + 1


def test_median_polish_residual_medians_near_zero(spark):
    """After two full sweeps, every row and column residual median
    is (near) zero — the polish fixed point on the fixture."""
    out = rel.median_polish(spark, SF01).collect()
    assert len(out) == 84
    import statistics as st
    rows, cols = {}, {}
    for r in out:
        rows.setdefault(r["dow"], []).append(r["residual"])
        cols.setdefault(r["month"], []).append(r["residual"])
    for vals in cols.values():  # column sweep ran last: exact zeros
        assert abs(st.median(vals)) < 1e-6
    for vals in rows.values():  # rows re-perturbed by the col sweep
        assert abs(st.median(vals)) < 50


def test_anova_decomposition_identity(spark):
    r = rel.anova_oneway(spark, SF01).collect()[0]
    assert r["k"] == 5
    assert r["ssb_dollars2"] >= 0 and r["ssw_dollars2"] > 0
    assert r["f_stat"] >= 0
    # TPC-H segments are value-homogeneous: F should be unremarkable
    assert r["f_stat"] < 10


def test_tukey_consistent_with_anova(spark):
    pairs = rel.tukey_hsd(spark, SF01).collect()
    assert len(pairs) == 10
    anova = rel.anova_oneway(spark, SF01).collect()[0]
    if anova["reject_equal_means"] == 0:
        # no omnibus effect => no (or at most spurious-boundary)
        # pairwise discoveries at the matched level
        assert sum(p["significant"] for p in pairs) <= 1
    for p in pairs:
        assert p["t_like_stat"] >= 0


def test_bartlett_agrees_with_brown_forsythe_direction(spark):
    """Both variance tests run on near-identical group spreads: the
    parametric and robust verdicts should not be wildly apart."""
    b = rel.bartlett_test(spark, SF01).collect()[0]
    assert b["bartlett_t"] >= 0
    assert b["reject_equal_variance"] in (0, 1)


def test_cvm_brute_force_crosscheck(spark):
    """T matches the direct EDF-integral computation on the fixture."""
    from etl_geonet_quakes_spark.io import load_table
    r = rel.cramer_von_mises(spark, SF).collect()[0]
    o = load_table(spark, SF, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, SF, "customer")
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
            (F.col("c_mktsegment") == "BUILDING").cast("long").alias("g"),
        )
        .collect()
    )
    a = sorted(x["v"] for x in rows if x["g"] == 1)
    b = sorted(x["v"] for x in rows if x["g"] == 0)
    n, m = len(a), len(b)
    # rank-form brute force (midranks in the pooled sample)
    pooled = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    from collections import defaultdict
    first = {}
    cnt = defaultdict(int)
    for i, (v, _) in enumerate(pooled, 1):
        cnt[v] += 1
        first.setdefault(v, i)
    mid = {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}
    ra = [mid[v] for v in a]
    rb = [mid[v] for v in b]
    u = n * sum((r - (i + 1)) ** 2 for i, r in enumerate(ra)) + m * sum(
        (r - (i + 1)) ** 2 for i, r in enumerate(rb)
    )
    expect = u / (n * m * (n + m)) - (4 * n * m - 1) / (6.0 * (n + m))
    assert abs(r["cvm_t"] - expect) < 1e-5
    assert r["n_building"] == n and r["n_rest"] == m


def test_mood_median_cells_balance(spark):
    r = rel.mood_median_test(spark, SF01).collect()[0]
    assert r["k"] == 5
    # above-median count is just under half (ties go below)
    assert 0.4 * r["n"] < r["above"] <= 0.5 * r["n"] + 1
    assert r["chi2_stat"] >= 0


def test_ks_uniform_dates_bounds(spark):
    r = rel.ks_uniform_dates(spark, SF01).collect()[0]
    assert 0.0 <= r["d_stat"] <= 1.0
    # TPC-H dates are uniform by construction: no rejection expected
    assert r["reject_uniform"] == 0


def test_jarque_bera_fires_on_tpch_values(spark):
    """Order values are a sum-of-uniforms-ish but visibly non-normal
    (bounded support, right skew) at fixture n — JB should reject
    while |skew| stays modest."""
    r = rel.jarque_bera(spark, SF01).collect()[0]
    assert r["jb_stat"] >= 0
    assert abs(r["skewness"]) < 2
    assert -3 <= r["excess_kurtosis"] < 10
