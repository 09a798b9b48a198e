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
