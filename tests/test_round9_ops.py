"""Round-9 operator tests beyond oracle parity: completeness proofs
for the two new blocked joins (brute-force comparison at sf0.001),
and structural invariants for the new statistics/graph/ML operators —
the properties that must hold regardless of fixture values, so a
fixture regeneration can't silently green a broken implementation.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_geonet_quakes_spark.io import load_table
from etl_geonet_quakes_spark.llm import dedup, similarity, text
from etl_geonet_quakes_spark.operators import relational as rel

SF = "/root/testdata/sf0.001"


def _lev1(a: str, b: str) -> bool:
    """Reference lev<=1 check (O(n) band), independent of both engines."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:  # exactly one substitution allowed
        return sum(1 for x, y in zip(a, b) if x != y) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # one insertion: a must equal b with one char dropped
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def test_fastss_fuzzy_join_is_complete_and_sound(spark):
    """The deletion-neighborhood join must find EXACTLY the lev<=1
    pairs — compared against an independent brute-force O(n^2) sweep
    in plain Python (150 names at sf0.001)."""
    names = {
        r["c_custkey"]: r["c_name"]
        for r in load_table(spark, SF, "customer")
        .select("c_custkey", "c_name")
        .collect()
    }
    ids = sorted(names)
    expected = {
        (i, j)
        for k, i in enumerate(ids)
        for j in ids[k + 1:]
        if _lev1(names[i], names[j])
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.fuzzy_join_deletion(spark, SF).collect()
    }
    assert got == expected
    assert len(got) > 0  # fixture sanity: consecutive ids differ by 1 digit


def test_band_join_is_complete_and_sound(spark):
    """Grid blocking (same + adjacent bucket) must find EXACTLY the
    |gap| <= delta pairs — brute force over supplier balances."""
    bals = {
        r["s_suppkey"]: int(round(r["s_acctbal"] * 100))
        for r in load_table(spark, SF, "supplier").collect()
    }
    ids = sorted(bals)
    expected = {
        (i, j)
        for k, i in enumerate(ids)
        for j in ids[k + 1:]
        if abs(bals[i] - bals[j]) <= 5000
    }
    got = {
        (r["id_lo"], r["id_hi"])
        for r in rel.band_join_balances(spark, SF).collect()
    }
    assert got == expected


def test_logrank_internal_consistency(spark):
    r = rel.logrank_test(spark, SF).collect()[0]
    assert r["logrank_chi2"] >= 0
    assert 0 < r["expected_g1"]
    assert r["observed_g1"] >= 0
    assert r["reject_equal_survival"] in (0, 1)
    assert r["reject_equal_survival"] == int(
        r["logrank_chi2"] > r["chi2_crit_95"]
    )


def test_markov_power_conserves_mass(spark):
    """The substochastic completion carries absorbing mass unchanged,
    so the state vector must stay a probability distribution (up to
    the documented 6dp per-edge rounding, bounded by #edges*5e-7)."""
    rows = rel.markov_chain_power(spark, SF).collect()
    total = sum(r["prob"] for r in rows)
    assert abs(total - 1.0) < 1e-3
    assert all(r["prob"] >= 0 for r in rows)


def test_silhouette_and_dunn_bounds(spark):
    sil = similarity.silhouette_simplified(spark, SF).collect()
    assert all(-1.0 <= r["mean_silhouette"] <= 1.0 for r in sil)
    assert all(0 <= r["n_negative"] <= r["n_vectors"] for r in sil)
    d = similarity.dunn_index(spark, SF).collect()[0]
    assert d["min_inter_centroid"] > 0
    assert d["max_mean_intra"] > 0
    assert d["dunn_index"] == pytest.approx(
        round(d["min_inter_centroid"] / (2 * d["max_mean_intra"]), 6),
        abs=2e-6,
    )


def test_fleiss_kappa_bounds(spark):
    r = rel.fleiss_kappa(spark, SF).collect()[0]
    assert 0.0 <= r["p_bar"] <= 1.0
    assert 0.0 <= r["p_expected"] <= 1.0
    assert -1.0 <= r["fleiss_kappa"] <= 1.0


def test_tokenizer_fertility_at_least_one(spark):
    """Every word of length >= 1 yields >= 1 capped piece, and words
    longer than the cap yield > 1 — fertility >= 1 structurally."""
    rows = text.tokenizer_fertility(spark, SF).collect()
    assert rows, "lang groups expected"
    for r in rows:
        assert r["fertility"] >= 1.0
        assert 1.0 <= r["chars_per_piece"] <= 4.0
        assert 0.0 <= r["single_char_share"] <= 1.0


def test_harmonic_closeness_bounds(spark):
    rows = dedup.harmonic_closeness(spark, SF).collect()
    assert rows
    for r in rows:
        # each reached pivot contributes at most 1/1
        assert 0 < r["harmonic_closeness"] <= r["n_pivots_reached"]


def test_shapley_attribution_conserves_revenue(spark):
    """Shapley shares across channels must sum to the touched
    purchases' revenue minus only the integer-division remainders
    (< n_channels millicents per purchase)."""
    rows = rel.shapley_attribution(spark, SF).collect()
    attributed = sum(r["shapley_millicents"] for r in rows)
    con = duckdb.connect()
    total_mc, n_p = con.sql(
        f"""
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
                          event_id,
                          CAST(ROUND(value * 100) AS BIGINT) AS cents
                   FROM read_parquet('{SF}/events.parquet')),
             p AS (SELECT user_id AS uid, us, event_id AS eid, cents
                   FROM e WHERE event_type = 'purchase'),
             touched AS (SELECT DISTINCT eid, p.cents
                         FROM p JOIN e
                           ON p.uid = e.user_id
                          AND e.event_type <> 'purchase'
                          AND e.us < p.us
                          AND e.us >= p.us
                              - CAST(7 AS BIGINT) * 86400 * 1000000)
        SELECT CAST(SUM(cents) AS BIGINT) * 1000, COUNT(*) FROM touched
        """
    ).fetchone()
    n_channels = len(rows)
    assert attributed <= total_mc
    # remainder < n_channels millicents per touched purchase
    assert total_mc - attributed < n_p * n_channels


def test_sax_symbols_structure(spark):
    rows = rel.sax_symbolize(spark, SF).collect()
    assert rows
    assert [r["seg_id"] for r in rows] == list(range(len(rows)))
    for r in rows:
        assert r["symbol"] in ("a", "b", "c", "d")
        assert 1 <= r["n_days"] <= 7
        # symbol must agree with the reported PAA z-value
        z = r["paa_z"]
        expect = "a" if z < -0.6745 else "b" if z < 0 else (
            "c" if z < 0.6745 else "d"
        )
        assert r["symbol"] == expect


def test_stump_boosting_gains_positive_and_bounded(spark):
    r = rel.stump_boosting(spark, SF).collect()[0]
    assert r["gain1"] >= 0 and r["gain2"] >= 0
    assert 0.0 <= r["var_explained"] <= 1.0
    # round 2 can never beat round 1 on squared loss with the same
    # split family (round 1 already took the best single split)
    assert r["gain2"] <= r["gain1"] + 1e-6


def test_mase_backtest_consistency(spark):
    r = rel.mase_backtest(spark, SF).collect()[0]
    assert r["n_test"] > 0 and r["n_train"] > 0
    assert r["train_mae"] > 0 and r["test_mae"] > 0
    assert r["mase"] == pytest.approx(
        round(r["test_mae"] / r["train_mae"], 6), abs=2e-6
    )
    assert 0.0 <= r["smape"] <= 2.0
    assert r["beats_naive"] == int(r["mase"] < 1.0)


def test_haar_energy_structure(spark):
    rows = rel.haar_wavelet_energy(spark, SF).collect()
    assert [r["level"] for r in rows] == list(range(1, 9))
    # dyadic halving: level k has 256 / 2^k detail coefficients
    assert all(r["n_coeffs"] == 256 >> r["level"] for r in rows)
    assert all(r["energy_mdollars2"] >= 0 for r in rows)
    assert sum(r["energy_share"] for r in rows) == pytest.approx(1.0, abs=1e-4)


def test_gumbel_fit_orderings(spark):
    r = rel.gumbel_block_maxima(spark, SF).collect()[0]
    assert r["gumbel_beta_dollars"] > 0
    # mode mu sits below the mean (Gumbel mean = mu + gamma*beta)
    assert r["gumbel_mu_dollars"] < r["mean_weekly_max_dollars"]
    # a 52-week return level is far in the right tail
    assert r["return_level_52w_dollars"] > r["mean_weekly_max_dollars"]


def test_ridge_path_shrinks_monotonically(spark):
    rows = rel.ridge_regression_path(spark, SF).collect()
    slopes = [r["slope_cents_per_item"] for r in rows]  # lam ascending
    assert abs(slopes[0]) >= abs(slopes[1]) >= abs(slopes[2])
    assert abs(slopes[2]) < abs(slopes[0])  # 1e5 actually shrinks
