"""Round-12 regression tests for the advisor findings:

1. bm25_topk / rrf_hybrid_fusion pivoted the query terms to columns
   (the round-11 fixed-order-scoring fix) but took the term list from
   query.split() verbatim — a REPEATED query term produced duplicate
   pivot columns, so F.col(term) either raised an ambiguous-column
   AnalysisException or double-counted the term. Both now dedup the
   term list order-preservingly; BM25 scores a term SET (tf already
   counts within-document repetitions), so a duplicated query must
   score identically to the deduped one.

2. The fence-class audit (unrounded order-dependent float rank key
   under LIMIT — the q101/q279 sf1.0 bug class) was a manual one-off
   in round 11; tests/test_registry_guard.py now carries the standing
   static check. Its discriminating power is mutation-tested there.
"""

from __future__ import annotations

from etl_geonet_quakes_spark.llm import similarity, text


def test_bm25_duplicate_query_terms_match_deduped(spark, sf_dir):
    dup = text.bm25_topk(spark, sf_dir, query="spark hash join window spark hash", k=10)
    ded = text.bm25_topk(spark, sf_dir, query="spark hash join window", k=10)
    assert [tuple(r) for r in dup.collect()] == [tuple(r) for r in ded.collect()]


def test_rrf_duplicate_query_terms_match_deduped(spark, sf_dir):
    dup = similarity.rrf_hybrid_fusion(
        spark, sf_dir, query_terms=("spark", "hash", "join", "window", "spark")
    )
    ded = similarity.rrf_hybrid_fusion(
        spark, sf_dir, query_terms=("spark", "hash", "join", "window")
    )
    assert [tuple(r) for r in dup.collect()] == [tuple(r) for r in ded.collect()]
