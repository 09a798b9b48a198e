"""Round-10 regression tests for the advisor findings:

1. q358 stump_boosting summed squared cents as BIGINT; at sf0.1 the
   true sum (~2.22e19) exceeds int64 max (9.22e18) and silently wraps
   with ANSI off, poisoning sse_tot/var_explained. The fix casts to
   decimal(38,0) (mirroring the oracle). The test here runs AT sf0.1 —
   first proving the fixture really is in the overflow regime, then
   bounding var_explained — so a revert to the long sum fails loudly.

2. q349 tokenizer_fertility divided pieces/words with no zero guard; a
   lang group with no [a-z0-9] tokens yielded NaN / div-by-zero. The
   fix excludes words == 0 groups on both engines.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from etl_geonet_quakes_spark.io import load_table
from etl_geonet_quakes_spark.llm import text
from etl_geonet_quakes_spark.operators import relational as rel

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.1"
INT64_MAX = (1 << 63) - 1


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein, independent of both engines."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def test_passjoin_is_complete_and_sound(spark):
    """The pigeonhole-segment join must find EXACTLY the unordered
    distinct-name pairs with lev ≤ 2 — completeness is the PassJoin
    theorem (k edits touch ≤ k of the k+1 segments), soundness is the
    verify filter. Brute-forced against a pure-Python kernel so a
    blocking bug can't hide behind an engine agreeing with itself."""
    names = [
        r["p_name"]
        for r in load_table(spark, SF, "part").select("p_name").distinct().collect()
    ]
    expected = sorted(
        (a, b, _lev(a, b))
        for ia, a in enumerate(names)
        for b in names[ia + 1:]
        if _lev(a, b) <= 2
    )
    expected = [(min(a, b), max(a, b), d) for a, b, d in expected]
    expected.sort()
    got = sorted(
        (r["name_a"], r["name_b"], r["edit_dist"])
        for r in rel.passjoin_edit_pairs(spark, SF, max_dist=2).collect()
    )
    assert got == expected
    assert len(got) > 0, "fixture produced no lev<=2 pairs; test is vacuous"


def test_passjoin_candidates_below_all_pairs(spark):
    """The segment equi-join must generate strictly fewer CANDIDATE
    pairs (pre-verify) than the D(D−1)/2 all-pairs plan it replaces —
    the whole point of the signature. Measured on the candidate tier
    itself (rel._passjoin_candidates), not the verified result."""
    from pyspark.sql import functions as F

    d = (
        load_table(spark, SF, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
        .count()
    )
    n_cand = rel._passjoin_candidates(spark, SF, max_dist=2).count()
    n_result = rel.passjoin_edit_pairs(spark, SF, max_dist=2).count()
    assert n_result <= n_cand < d * (d - 1) // 2


@pytest.mark.skipif(not os.path.isdir(SF01), reason="sf0.1 fixture absent")
def test_stump_boosting_sum_of_squares_is_overflow_safe(spark):
    """At sf0.1 Σ cents² > int64 max: the decimal(38,0) accumulator is
    load-bearing, not belt-and-braces. A long accumulator wraps to a
    (possibly negative) garbage total and var_explained goes wrong at
    exactly the committed bench scale while sf0.001/sf0.01 parity
    stays green — which is how it escaped until round 10."""
    li = load_table(spark, SF01, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    ss = li.agg(
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("ss")
    ).first()["ss"]
    assert int(ss) > INT64_MAX, (
        "fixture no longer exercises the int64-overflow regime; "
        "move this test to a larger SF"
    )

    row = rel.stump_boosting(spark, SF01).first()
    # gains are SSE reductions: strictly positive for any non-constant
    # target; var_explained = (gain1+gain2)/SSE_tot must land in (0, 1]
    assert row["gain1"] > 0 and row["gain2"] > 0
    assert 0.0 < row["var_explained"] <= 1.0
    for v in (row["gain1"], row["gain2"], row["var_explained"]):
        assert math.isfinite(v)


def test_curriculum_schedule_conserves_and_grows(spark):
    from etl_geonet_quakes_spark.llm import corpus

    rows = corpus.curriculum_schedule(spark, SF).collect()
    n_docs_total = load_table(spark, SF, "documents").count()
    by_epoch: dict[int, set[int]] = {}
    docs_by_epoch: dict[int, int] = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], set()).add(r["decile"])
        docs_by_epoch[r["epoch"]] = docs_by_epoch.get(r["epoch"], 0) + r["n_docs"]
    # progressive coverage: ceil(e*10/3) = 4, 7, 10 deciles
    assert {e: len(b) for e, b in by_epoch.items()} == {1: 4, 2: 7, 3: 10}
    assert by_epoch[1] < by_epoch[2] < by_epoch[3]
    # final epoch sees the whole corpus exactly once
    assert docs_by_epoch[3] == n_docs_total
    # deciles are the easiest-first prefix
    assert by_epoch[3] == set(range(10))
    assert by_epoch[1] == set(range(4))


def test_interval_union_bounds(spark):
    """Union length is sandwiched: every island spans at least one
    window (30 min) and the union can never exceed the naive
    double-counting sum n_events x window."""
    w_us = 30 * 60 * 1_000_000
    rows = rel.interval_union_length(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_islands"] <= r["n_events"]
        assert r["longest_island_us"] >= w_us
        assert r["union_us"] >= r["longest_island_us"]
        assert r["union_us"] <= r["n_events"] * w_us
        # islands are maximal: union >= n_islands * window
        assert r["union_us"] >= r["n_islands"] * w_us


def test_mutual_information_is_nonnegative_and_consistent(spark):
    rows = rel.mutual_information(spark, SF).collect()
    assert rows
    mi = sum(r["mi_contribution"] for r in rows)
    assert mi >= -1e-9, "MI of a full contingency table is nonnegative"
    n = sum(r["n_xy"] for r in rows)
    # marginals emitted per cell reconcile with the cell counts
    for lang in {r["lang"] for r in rows}:
        cells = [r for r in rows if r["lang"] == lang]
        assert all(c["n_x"] == sum(x["n_xy"] for x in cells) for c in cells)
    assert n == load_table(spark, SF, "documents").count()


def test_frequent_subsequences_apriori_monotone(spark):
    """Support is anti-monotone under subsequence extension: every
    frequent length-3 pattern's length-2 prefix AND suffix must be at
    least as frequent — the property PrefixSpan prunes on. Also: gap
    semantics means contiguous q128 paths are a subset source, and a
    user counts once per pattern (set semantics)."""
    rows = rel.frequent_subsequences(spark, SF, min_users=1).collect()
    sup = {(r["length"], r["pattern"]): r["n_users"] for r in rows}
    n_users_total = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    for (ln, pat), n in sup.items():
        assert 1 <= n <= n_users_total
        if ln == 3:
            a, b, c = pat.split(">")
            assert sup[(2, f"{a}>{b}")] >= n
            assert sup[(2, f"{b}>{c}")] >= n


def test_tokenizer_fertility_excludes_zero_word_groups(spark, tmp_path):
    """A language whose documents contain no [a-z0-9] tokens has
    words == 0; its fertility is undefined and the group must be
    EXCLUDED (matching the oracle's WHERE words > 0), not emitted as
    NaN / null / div-by-zero."""
    docs = spark.createDataFrame(
        [
            (1, "web", "zz", "hello world one two", 0.5),
            (2, "web", "zz", "four score and seven", 0.5),
            # '!!!' and '???' contain no [a-z0-9]: words == 0 for lang qq
            (3, "web", "qq", "!!! ??? --- ...", 0.5),
        ],
        "doc_id long, source string, lang string, text string, quality double",
    )
    sf_dir = str(tmp_path)
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    rows = {r["lang"]: r for r in text.tokenizer_fertility(spark, sf_dir).collect()}
    assert "qq" not in rows, "zero-word group must be excluded, not NaN"
    assert "zz" in rows
    z = rows["zz"]
    assert z["words"] == 8 and z["fertility"] >= 1.0
    assert all(
        math.isfinite(z[c])
        for c in ("fertility", "chars_per_piece", "single_char_share")
    )
