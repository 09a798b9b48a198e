"""Pin the dedup ladder's candidate counts at the two cheap fixture
scales (SCALE.md round-7/8 curves): a silent regression in the LSH
banding, the containment prefix/positional filter, or the k-prefix
match-count filter — or a fixture regeneration that changes the
density story the curves document — fails here before any driver
run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_geonet_quakes_spark.io import load_table
from etl_geonet_quakes_spark.llm import dedup

# (sf_dir, expected minhash band-bucket pairs, expected containment
# candidates at the default k=3 prefix) — measured by
# tools/scale_curve.py; sf0.001 and sf0.01 carry the same 500-doc
# corpus but different generator seeds.
EXPECT = [
    ("/root/testdata/sf0.001", 43, 55),
    ("/root/testdata/sf0.01", 37, 50),
]


@pytest.mark.parametrize("sf_dir,n_minhash,n_containment", EXPECT)
def test_candidate_counts_pinned(spark, sf_dir, n_minhash, n_containment):
    b = dedup.band_buckets(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    a, bb = b.alias("a"), b.alias("b")
    got_mh = (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert got_mh == n_minhash
    got_ct = dedup.containment_candidates(spark, sf_dir).count()
    assert got_ct == n_containment


def test_candidates_dominate_true_pairs_not_corpus(spark):
    """The filters must stay far from the verify-everything plan on
    the corpus they were measured on: candidates ≪ all pairs."""
    sf = "/root/testdata/sf0.01"
    n_docs = load_table(spark, sf, "documents").count()
    all_pairs = n_docs * (n_docs - 1) // 2
    assert dedup.containment_candidates(spark, sf).count() < all_pairs / 100


def test_kprefix_filter_kills_quadratic_candidates_sf01(spark):
    """The round-8 fix for the round-7 measured scale-killer
    (SCALE.md: ×1,425 containment-candidate growth on ×10 docs):
    at sf0.1 the k=3 extended-prefix match-count filter collapses
    candidates 72,662 → 511, within 1.2% of the 505 true pairs —
    candidate growth now tracks true-pair structure (×10.2 on ×10
    docs), not corpus². Both counts pinned so neither the filter nor
    the fixture density can silently drift."""
    sf = "/root/testdata/sf0.1"
    assert dedup.containment_candidates(spark, sf, min_matches=1).count() == 72662
    assert dedup.containment_candidates(spark, sf, min_matches=3).count() == 511
    assert dedup.prefix_filter_candidates(spark, sf, min_matches=3).count() == 288


def test_kprefix_filter_is_exact_complete(spark):
    """k-prefix extension is a candidate-tier optimization only:
    final results of all three prefix-family operators are
    bit-identical at k=1 (theorem-minimal prefix) and the default
    k=3 — the Wang et al. completeness argument, pinned."""
    sf = "/root/testdata/sf0.01"
    for fn in (
        dedup.dedup_containment,
        dedup.dedup_prefix_filter,
        dedup.cross_corpus_contamination,
    ):
        base = fn(spark, sf, min_matches=1)
        capped = fn(spark, sf, min_matches=dedup.PREFIX_MIN_MATCHES)
        assert base.exceptAll(capped).count() == 0
        assert capped.exceptAll(base).count() == 0


# (sf_dir, expected graph_volume_metrics) — measured 2026-08-15 via
# tools/scale_curve.py; pins the graph suite's join/shuffle volumes
# (q115 oriented wedges, q122 per-round contribution rows, q222
# frontier growth, q244 peel histogram, q285/q201 un-oriented wedge
# volume) so a silent regression in pair generation, orientation, or
# any loop body fails here before a driver run. Within-clique pair
# growth sf0.01→sf0.1 is quadratic BY DATA (bigger boilerplate
# cliques), so the guard for q115 is the Chiba–Nishizeki E^1.5
# orientation bound, not linearity.
GRAPH_EXPECT = [
    (
        "/root/testdata/sf0.01",
        {
            "n_pairs": 1506,
            "n_vertices": 307,
            "pagerank_round_rows": 3012,
            "tri_wedge_rows": 4502,
            "linkpred_wedge_rows": 16462,
            "labelprop_labeled_r1": 212,
            "labelprop_labeled_r2": 40,
            "kcore_removed_r1": 11,
            "kcore_removed_r2": 0,
            "kcore_removed_r3": 0,
            "kcore_removed_r4": 0,
        },
    ),
    (
        "/root/testdata/sf0.1",
        {
            "n_pairs": 147839,
            "n_vertices": 3324,
            "pagerank_round_rows": 295678,
            "tri_wedge_rows": 4644318,
            "linkpred_wedge_rows": 16739111,
            "labelprop_labeled_r1": 2604,
            "labelprop_labeled_r2": 228,
            "kcore_removed_r1": 163,
            "kcore_removed_r2": 5,
            "kcore_removed_r3": 0,
            "kcore_removed_r4": 0,
        },
    ),
]


# (sf_dir, expected string_distance_volume_metrics) — measured
# 2026-08-15 at the round-10 rewrite of q88 (the round-9 `weak`:
# brand-only blocking made candidates (n/25)², quadratic by data).
# The pins certify the new shape: the levenshtein kernel runs on
# DISTINCT-name pairs only (flat 2,008 evals at BOTH SFs — |D| = 64
# is corpus-size-independent here), the broadcast table is 552
# ordered qualifying pairs, and the only growing quantity is
# output_pairs — the Θ(output) floor no correct algorithm can beat.
STRDIST_EXPECT = [
    (
        "/root/testdata/sf0.01",
        {
            "n_rows": 2000,
            "n_distinct": 64,
            "distinct_lev_pairs": 2008,
            "qualifying_ordered_pairs": 552,
            "output_pairs": 10696,
        },
    ),
    (
        "/root/testdata/sf0.1",
        {
            "n_rows": 20000,
            "n_distinct": 64,
            "distinct_lev_pairs": 2008,
            "qualifying_ordered_pairs": 552,
            "output_pairs": 1080567,
        },
    ),
]


@pytest.mark.parametrize("sf_dir,expect", STRDIST_EXPECT)
def test_string_distance_volumes_pinned(spark, sf_dir, expect):
    from etl_geonet_quakes_spark.operators import relational as rel

    got = rel.string_distance_volume_metrics(spark, sf_dir)
    assert got == expect
    # growth certificates: the DP-kernel tier depends on |D|, never on
    # corpus rows (the old plan's candidates were (n_rows/25)² ≈ 8.0M
    # at sf0.1; the new plan pays |D|(|D|-1)/2 gated evals)
    assert got["distinct_lev_pairs"] <= (
        got["n_distinct"] * (got["n_distinct"] - 1) // 2
    )
    assert got["distinct_lev_pairs"] < got["n_rows"] ** 2 / 1000
    # broadcast table stays tiny: ordered qualifying pairs ≤ D²
    assert got["qualifying_ordered_pairs"] <= got["n_distinct"] ** 2


# Round-10 verdict item 6: candidate volumes for the remaining heavy
# candidate generators, measured 2026-08-15, pinned with a growth
# certificate each — the q180/q88 lesson made regression-proof.
#
# q278 apriori: pair_rows grows LINEARLY with baskets (≈ 6.6 pairs/
# basket at both SFs — basket width is order width, capped by TPC-H
# at 7 lineitems), and the candidate-triple tier SATURATES at the
# brand-domain bound C(25,3) = 2300, corpus-independent: the
# counting scan verifies a broadcast constant no matter the corpus.
# q285: negative candidates are Σ_b C(|bucket|,2) ≈ n²/(2·64) with
# md5-balanced buckets (ratio ≈ 1.0 pinned) — n² by CONSTRUCTION
# (the negative sample), tamed by B ∝ n at scale; the pin keeps the
# balance honest so no hot bucket re-introduces a quadratic.
# q38/q39: banded/pigeonhole candidates at sf0.1 (sf0.001/0.01
# already pinned above for q38) — candidates track near-dup clique
# structure (~1.8-2.0k) against 12.5M all-pairs.
VOLUME_EXPECT = [
    (
        "/root/testdata/sf0.01",
        {"n_baskets": 14743, "pair_rows": 97604, "l2_size": 300,
         "l2_items": 25, "cand_triples": 2300},
        {"n_nodes": 1880, "n_edges": 3445, "neg_candidate_pairs": 27332,
         "n_negs": 27286, "balance_ratio": 0.99},
        {"minhash_candidates": 37, "simhash_candidates": 38},
    ),
    (
        "/root/testdata/sf0.1",
        {"n_baskets": 147236, "pair_rows": 984487, "l2_size": 300,
         "l2_items": 25, "cand_triples": 2300},
        {"n_nodes": 5922, "n_edges": 3573, "neg_candidate_pairs": 274125,
         "n_negs": 274067, "balance_ratio": 1.001},
        {"minhash_candidates": 1806, "simhash_candidates": 1950},
    ),
]


@pytest.mark.parametrize("sf_dir,apriori,linkpred,lsh", VOLUME_EXPECT)
def test_candidate_generator_volumes_pinned(spark, sf_dir, apriori,
                                            linkpred, lsh):
    from etl_geonet_quakes_spark.operators import relational as rel

    got_a = rel.apriori_volume_metrics(spark, sf_dir)
    assert got_a == apriori
    # growth certificates: candidate triples bounded by the item
    # domain (C(l2_items, 3)), never by the corpus; pair explosion is
    # linear in baskets (bounded basket width)
    li = got_a["l2_items"]
    assert got_a["cand_triples"] <= li * (li - 1) * (li - 2) // 6
    assert got_a["pair_rows"] < 8 * got_a["n_baskets"]

    got_l = rel.linkpred_volume_metrics(spark, sf_dir)
    assert got_l == linkpred
    # md5 balance certificate: within 5% of the perfect n²/(2B) line
    assert 0.95 <= got_l["balance_ratio"] <= 1.05

    got_h = dedup.lsh_volume_metrics(spark, sf_dir)
    assert got_h == lsh
    # blocked candidates stay orders of magnitude under all-pairs
    from etl_geonet_quakes_spark.io import load_table as _lt

    n_docs = _lt(spark, sf_dir, "documents").count()
    all_pairs = n_docs * (n_docs - 1) // 2
    assert got_h["minhash_candidates"] < all_pairs / 100
    assert got_h["simhash_candidates"] < all_pairs / 100


@pytest.mark.parametrize("sf_dir,expect", GRAPH_EXPECT)
def test_graph_volume_metrics_pinned(spark, sf_dir, expect):
    got = dedup.graph_volume_metrics(spark, sf_dir)
    assert got == expect
    # orientation safety certificate: oriented wedge rows ≤ E^1.5
    assert got["tri_wedge_rows"] <= (2 * got["n_pairs"]) ** 1.5
    # fixtures converge by round 3 ⇒ the fixed 4th peel is a no-op,
    # which is what makes q244's fixed-round contract equal the
    # exact k-core on these corpora
    assert got["kcore_removed_r4"] == 0
