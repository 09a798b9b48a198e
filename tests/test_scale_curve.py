"""Pin the dedup ladder's candidate counts at the two cheap fixture
scales (SCALE.md round-7/8 curves): a silent regression in the LSH
banding, the containment prefix/positional filter, or the k-prefix
match-count filter — or a fixture regeneration that changes the
density story the curves document — fails here before any driver
run.

Round 11 adds a THIRD scale point: the deterministic sf0.3 tiling of
sf0.1 (tools/make_scale_fixture.py — regenerate with
``python tools/make_scale_fixture.py`` if testdata_local/ is absent;
the sf0.3 tests skip, loudly, when it is). Two points cannot
distinguish n·log n from n^1.3; the tiled point holds the data
DISTRIBUTION fixed while tripling volume, so every within-tile
structural metric must land at exactly ~3x its sf0.1 value and every
saturation constant must stay FLAT — pinned in SF03_* below."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

from etl_geonet_quakes_spark.io import load_table
from etl_geonet_quakes_spark.llm import dedup

SF03 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "testdata_local",
    "sf0.3",
)
needs_sf03 = pytest.mark.skipif(
    not os.path.isdir(SF03),
    reason="sf0.3 tiling absent — python tools/make_scale_fixture.py",
)

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


# ---- round-11: third scale point (sf0.3 = deterministic 3x tiling
# of sf0.1; measured 2026-08-15 after the word-identity-mapping fix —
# the first positional perturbation damped near-dup structure and the
# graph came out FLAT, which is exactly the failure mode a third point
# exists to catch). Within-tile structure replicates exactly, so:
#   graph pairs   147,839 -> 443,762   (3.0017x; +245 cross-tile rows)
#   apriori pairs 984,487 -> 2,953,461 (3.0001x; triples SATURATED at
#                                       C(25,3)=2300 at a third SF)
#   linkpred edges 3,573 -> 10,719     (3.0x; negatives 9.0x = n²/2B
#                                       BY CONSTRUCTION, balance 1.0)
#   strdist kernel tier FLAT (|D|=64, 2,008 gated DP evals, 552
#                             broadcast pairs) while output grows 9.05x
#                             — the Θ(output) floor, now at three SFs
#   minhash/simhash candidates 14,157/15,958 — 7.8x/8.2x (cross-tile
#     band collisions on the tiny shared vocabulary are real
#     candidates, honestly counted) yet still < all-pairs/1000: the
#     verify tier, not the candidate tier, is what grows superlinearly
#     on this corpus, and it grows with TRUE pairs (the graph's 3.0x).
SF03_GRAPH = {
    "n_pairs": 443762,
    "n_vertices": 10433,
    "pagerank_round_rows": 887524,
    "tri_wedge_rows": 13933192,
    "linkpred_wedge_rows": 50217882,
    "labelprop_labeled_r1": 7852,
    "labelprop_labeled_r2": 694,
    "kcore_removed_r1": 935,
    "kcore_removed_r2": 16,
    "kcore_removed_r3": 0,
    "kcore_removed_r4": 0,
}
SF03_STRDIST = {
    "n_rows": 60000,
    "n_distinct": 64,
    "distinct_lev_pairs": 2008,
    "qualifying_ordered_pairs": 552,
    "output_pairs": 9785103,
}
SF03_APRIORI = {"n_baskets": 441708, "pair_rows": 2953461, "l2_size": 300,
                "l2_items": 25, "cand_triples": 2300}
SF03_LINKPRED = {"n_nodes": 17766, "n_edges": 10719,
                 "neg_candidate_pairs": 2465705, "n_negs": 2465530,
                 "balance_ratio": 1.0}
SF03_LSH = {"minhash_candidates": 14157, "simhash_candidates": 15958}


@needs_sf03
def test_third_scale_point_growth_certificates(spark):
    """The three-point certificates: exact pins at the tiled sf0.3
    plus the growth-law assertions a 2-point curve could not make."""
    from etl_geonet_quakes_spark.operators import relational as rel

    got_g = dedup.graph_volume_metrics(spark, SF03)
    assert got_g == SF03_GRAPH
    # LINEAR in tiles: within 0.5% of 3x the pinned sf0.1 value
    assert abs(got_g["n_pairs"] / (3 * 147839) - 1) < 0.005
    assert got_g["tri_wedge_rows"] <= (2 * got_g["n_pairs"]) ** 1.5
    assert got_g["kcore_removed_r4"] == 0

    got_s = rel.string_distance_volume_metrics(spark, SF03)
    assert got_s == SF03_STRDIST
    # the kernel tier is corpus-size-INDEPENDENT at a third point:
    # same 64 names, same 2,008 gated DP evals, same 552-pair
    # broadcast across 20k -> 60k rows; only output grows (9.05x —
    # cross-tile same-name pairs are true output, the Θ(output) floor)
    assert (got_s["n_distinct"], got_s["distinct_lev_pairs"],
            got_s["qualifying_ordered_pairs"]) == (64, 2008, 552)

    got_a = rel.apriori_volume_metrics(spark, SF03)
    assert got_a == SF03_APRIORI
    # pair explosion stays LINEAR in baskets (ratio pinned ~6.7/basket
    # at sf0.01, sf0.1 AND sf0.3); candidate triples saturated at the
    # brand-domain bound for the third consecutive SF
    assert got_a["pair_rows"] < 8 * got_a["n_baskets"]
    assert got_a["cand_triples"] == 2300

    got_l = rel.linkpred_volume_metrics(spark, SF03)
    assert got_l == SF03_LINKPRED
    assert 0.95 <= got_l["balance_ratio"] <= 1.05

    got_h = dedup.lsh_volume_metrics(spark, SF03)
    assert got_h == SF03_LSH
    n_docs = load_table(spark, SF03, "documents").count()
    all_pairs = n_docs * (n_docs - 1) // 2
    assert got_h["minhash_candidates"] < all_pairs / 1000
    assert got_h["simhash_candidates"] < all_pairs / 1000


@needs_sf03
def test_third_scale_point_containment_candidates(spark):
    """k-prefix containment candidates at sf0.3: the min_matches=3
    filter keeps candidates within ~4x of the sf0.1 count on 3x docs
    (cross-tile containment residue), vs 273k for the theorem-minimal
    k=1 prefix — the filter's value compounds with scale."""
    assert dedup.containment_candidates(spark, SF03, min_matches=1).count() == 273147
    assert dedup.containment_candidates(spark, SF03, min_matches=3).count() == 1965
    assert dedup.prefix_filter_candidates(spark, SF03, min_matches=3).count() == 2164


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


# ---- round-11b: FOURTH scale point (sf1.0 = deterministic 10x tiling
# of sf0.1; regenerate with
# ``python tools/make_scale_fixture.py testdata_local/sf1.0 10``).
# Measured 2026-08-16. Three points pin the curve's SHAPE; the fourth
# point is the extrapolation check — every linear metric must land at
# 10x sf0.1, every by-construction quadratic at ~100x, and every
# saturation constant FLAT for the fourth time:
#   graph pairs    147,839 -> 1,480,393  (10.013x; +2,003 cross-tile)
#   apriori pairs  984,487 -> 9,844,870  (10.0001x; triples SATURATED
#                                         at C(25,3)=2300, 4th SF)
#   linkpred edges 3,573 -> 35,730       (10.0x; negatives 99.97x =
#                                         n^2/2B by construction)
#   strdist kernel FLAT (|D|=64, 2,008 DP evals) on 10x rows while
#     output grows 100.8x — the Θ(output) floor at a fourth SF
#   minhash/simhash candidates 106,191/169,393 — SUPERLINEAR (58.8x/
#     86.9x) and honestly so: with 10 tiles the crc32 mod-4 renaming
#     classes repeat (tiles {1,5,9},{2,6},{3,7},{4,8} share a class),
#     so same-class tile pairs sit at shingle-Jaccard ~0.27 — far
#     below the 0.7 dedup threshold (they are TRUE negatives and the
#     pair graph stays linear) but close enough to collide in single
#     bands. Still minhash < all-pairs/10,000 and simhash ~1/7,400 of
#     all-pairs: the candidate tier absorbs a
#     10x corpus with banding-collision growth, the verify tier stays
#     bounded by true structure. This is the fixture artifact the
#     MANIFEST documents, not engine behavior.
SF10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "testdata_local",
    "sf1.0",
)
# ~12 min of volume counting at 6M lineitem / 50k docs: opt-in (the
# artifact of record is the pinned values below + PARITY_sf1.0_*.json;
# re-verify with SPARK_GRAFT_SF10_CERTS=1), never a silent cost in
# the default suite run. Round-12: the env var alone now suffices —
# an absent fixture is REGENERATED (deterministic, ~30 s) instead of
# silently skipping; the default suite additionally pins the
# cross-point growth LAWS fixture-free (test_scale_pin_growth_laws).
needs_sf10 = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SF10_CERTS"),
    reason="sf1.0 certificates are opt-in: SPARK_GRAFT_SF10_CERTS=1 "
    "(the fixture regenerates automatically if absent)",
)


@pytest.fixture(scope="session")
def sf10_dir() -> str:
    """testdata_local/sf1.0, regenerated deterministically if absent
    (round-12: the opt-in no longer silently skips on a fresh clone)."""
    if not os.path.isdir(SF10):
        import subprocess

        subprocess.run(
            [
                sys.executable,
                os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools",
                    "make_scale_fixture.py",
                ),
                SF10,
                "10",
            ],
            check=True,
        )
    return SF10

SF10_GRAPH = {
    "n_pairs": 1480393,
    "n_vertices": 34673,
    "pagerank_round_rows": 2960786,
    "tri_wedge_rows": 46445779,
    "linkpred_wedge_rows": 167398115,
    "labelprop_labeled_r1": 26498,
    "labelprop_labeled_r2": 2354,
    "kcore_removed_r1": 1590,
    "kcore_removed_r2": 50,
    "kcore_removed_r3": 0,
    "kcore_removed_r4": 0,
}
SF10_STRDIST = {
    "n_rows": 200000,
    "n_distinct": 64,
    "distinct_lev_pairs": 2008,
    "qualifying_ordered_pairs": 552,
    "output_pairs": 108956700,
}
SF10_APRIORI = {"n_baskets": 1472360, "pair_rows": 9844870, "l2_size": 300,
                "l2_items": 25, "cand_triples": 2300}
SF10_LINKPRED = {"n_nodes": 59220, "n_edges": 35730,
                 "neg_candidate_pairs": 27400932, "n_negs": 27400393,
                 "balance_ratio": 1.0}
SF10_LSH = {"minhash_candidates": 106191, "simhash_candidates": 169393}


@needs_sf10
def test_fourth_scale_point_growth_certificates(spark, sf10_dir):
    """The four-point certificates: exact pins at the 10x tiling.
    Linear metrics at 10x, by-construction quadratics at ~100x,
    saturation constants FLAT — extrapolation, not interpolation."""
    from etl_geonet_quakes_spark.operators import relational as rel

    got_g = dedup.graph_volume_metrics(spark, SF10)
    assert got_g == SF10_GRAPH
    assert got_g["tri_wedge_rows"] <= (2 * got_g["n_pairs"]) ** 1.5
    assert got_g["kcore_removed_r4"] == 0

    got_s = rel.string_distance_volume_metrics(spark, SF10)
    assert got_s == SF10_STRDIST

    got_a = rel.apriori_volume_metrics(spark, SF10)
    assert got_a == SF10_APRIORI

    got_l = rel.linkpred_volume_metrics(spark, SF10)
    assert got_l == SF10_LINKPRED

    got_h = dedup.lsh_volume_metrics(spark, SF10)
    assert got_h == SF10_LSH
    n_docs = load_table(spark, SF10, "documents").count()
    all_pairs = n_docs * (n_docs - 1) // 2
    # same bound family as the third point: minhash lands below
    # all-pairs/10,000; simhash's wider banding sits at ~1/7,400
    assert got_h["minhash_candidates"] < all_pairs / 10000
    assert got_h["simhash_candidates"] < all_pairs / 1000


@needs_sf10
def test_fourth_scale_point_containment_candidates(spark, sf10_dir):
    assert dedup.containment_candidates(spark, SF10, min_matches=1).count() == 918985
    assert dedup.containment_candidates(spark, SF10, min_matches=3).count() == 6635
    assert dedup.prefix_filter_candidates(spark, SF10, min_matches=3).count() == 4379


@needs_sf03
def test_bm25_identical_profiles_bit_identical_sf03(spark):
    """Round-11 sf1.0 regression (q101): tiled copies of a document
    whose query terms survive the per-tile renaming have IDENTICAL
    (tf, dl) profiles, so their BM25 scores must be exactly equal —
    the original SUM-over-term-rows scoring let hash-agg combine
    order split identical profiles by one ulp and flip the unrounded
    top-k fence (DuckDB's parallel agg even varied run to run). The
    fixed-order pivot scoring makes profile groups byte-identical;
    selection is on the rounded score with doc_id tiebreak.

    Round-12 fix (ADVICE): grouping by doc_id % tile-stride asserted
    "same base doc ⇒ same score", but the per-tile crc32 renaming can
    drop a query term in some tiles, so tiled copies of one base doc
    can carry legitimately DIFFERENT (tf, dl) profiles. The invariant
    the fix actually guarantees is "identical (tf, dl) profile ⇒
    identical score" — so recompute each top-30 doc's profile from
    its text (same tokenizer) and group by THAT."""
    from etl_geonet_quakes_spark.llm import text as t

    query_terms = "spark hash join window".split()
    top = t.bm25_topk(spark, SF03, k=240).collect()
    ids = [r["doc_id"] for r in top]
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF03, "documents")
        .filter(F.col("doc_id").isin(ids))
        .select("doc_id", "text")
        .collect()
    }
    by_profile: dict = {}
    members: dict = {}
    for r in top:
        toks = texts[r["doc_id"]].split(t.TOKEN_SEP)
        profile = (len(toks),) + tuple(toks.count(q) for q in query_terms)
        by_profile.setdefault(profile, set()).add(r["score"])
        members[profile] = members.get(profile, 0) + 1
    multi = {k: v for k, v in by_profile.items() if len(v) > 1}
    assert multi == {}, multi
    # the check must be non-vacuous: k=240 was probed to contain 4
    # duplicate-profile classes at this fixture (k=30 had none)
    assert max(members.values()) > 1


def test_scale_pin_growth_laws_fixture_free():
    """Round-12 (verdict item 6): the sf1.0 volume certificates are
    opt-in (12 min), but the growth LAWS they certify are pure
    arithmetic over the pinned constants — so pin the laws in the
    default suite, fixture-free. An edit to any SF*_ pin that breaks
    a law (or a re-measure that lands off-law, meaning the tiling or
    an operator changed shape) fails here on every run.

    Laws, from the tiling construction (tools/make_scale_fixture.py):
    - within-tile structure is copied verbatim, so tile-linear
      metrics land within 0.5% of tiles × the sf0.1 value;
    - the q88 kernel tier (distinct names / DP evals / qualifying
      pairs) is corpus-size-INDEPENDENT: identical at sf0.01, sf0.1,
      sf0.3, sf1.0;
    - apriori L2 saturates at the brand-domain bound (C(25,2)=300
      pairs, 25 items, C(25,3)·... = 2300 candidate triples) from
      sf0.01 up — FLAT at every point;
    - pagerank round rows = 2 × undirected pair count, exactly, at
      every scale point (each pair contributes both directions)."""
    sf01_graph = dict(GRAPH_EXPECT[1][1])
    sf01_strdist = dict(STRDIST_EXPECT[1][1])

    # tile-linear: n_pairs within 0.5% of tiles × sf0.1
    assert abs(SF03_GRAPH["n_pairs"] / (3 * sf01_graph["n_pairs"]) - 1) < 0.005
    assert abs(SF10_GRAPH["n_pairs"] / (10 * sf01_graph["n_pairs"]) - 1) < 0.005
    assert SF03_STRDIST["n_rows"] == 3 * sf01_strdist["n_rows"]
    assert SF10_STRDIST["n_rows"] == 10 * sf01_strdist["n_rows"]

    # exact structural identity: pagerank rows = 2 × pairs everywhere
    for g in (sf01_graph, SF03_GRAPH, SF10_GRAPH):
        assert g["pagerank_round_rows"] == 2 * g["n_pairs"]
        # Chiba–Nishizeki orientation bound holds at every point
        assert g["tri_wedge_rows"] <= (2 * g["n_pairs"]) ** 1.5
        # the peel converges by round 4 at every point
        assert g["kcore_removed_r4"] == 0

    # kernel tier corpus-size-independent across ALL four points
    kernel = ("n_distinct", "distinct_lev_pairs", "qualifying_ordered_pairs")
    for s in (sf01_strdist, SF03_STRDIST, SF10_STRDIST):
        assert tuple(s[k] for k in kernel) == (64, 2008, 552)

    # apriori saturation FLAT at sf0.3 and sf1.0
    for a in (SF03_APRIORI, SF10_APRIORI):
        assert (a["l2_size"], a["l2_items"], a["cand_triples"]) == (300, 25, 2300)
    # basket-linear pair rows: < 8 pairs/basket at both points
    assert SF03_APRIORI["pair_rows"] < 8 * SF03_APRIORI["n_baskets"]
    assert SF10_APRIORI["pair_rows"] < 8 * SF10_APRIORI["n_baskets"]
    assert abs(SF10_APRIORI["n_baskets"] / (10 / 3 * SF03_APRIORI["n_baskets"]) - 1) < 0.005

    # link-pred negatives stay 1:1 balanced at both points
    assert SF03_LINKPRED["balance_ratio"] == 1.0
    assert SF10_LINKPRED["balance_ratio"] == 1.0
    # negative-candidate pool is ~n²/2 per construction batch; the
    # selected negatives stay within the pool
    assert SF10_LINKPRED["n_negs"] <= SF10_LINKPRED["neg_candidate_pairs"]

    # LSH candidate tier stays bounded: < all-pairs/10,000 at sf1.0
    # (50k docs) and < all-pairs/1,000 at sf0.3 (15k docs)
    assert SF10_LSH["minhash_candidates"] < (50000 * 49999 // 2) / 10000
    assert SF03_LSH["minhash_candidates"] < (15000 * 14999 // 2) / 1000
