"""Pin the dedup ladder's candidate counts at the two cheap fixture
scales (SCALE.md round-7 curve): a silent regression in the LSH
banding or the containment prefix/positional filter — or a fixture
regeneration that changes the density story the curve documents —
fails here before any driver run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_geonet_quakes_spark.io import load_table
from etl_geonet_quakes_spark.llm import dedup

# (sf_dir, expected minhash band-bucket pairs, expected containment
# candidates) — measured by tools/scale_curve.py; sf0.001 and sf0.01
# carry the same 500-doc corpus but different generator seeds.
EXPECT = [
    ("/root/testdata/sf0.001", 43, 56),
    ("/root/testdata/sf0.01", 37, 51),
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
