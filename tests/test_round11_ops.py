"""Round-11 regression tests for the advisor findings:

1. q179 decayed_average's weighted sum wsum = Σ 4^(j-2)·3^(n-j)·cents
   exceeds 2^63 for customers near the last_k=20 cap with large order
   totals, and DuckDB's DIRECT hugeint→double cast double-rounds above
   2^63 (two-halves conversion; Spark's BigDecimal.doubleValue() is
   correctly rounded on this value, verified 2026-08-15) — exactly
   the divergence the q288/q01 VARCHAR bridge exists for. The fix
   routes wsum through
   decimal→string→double on BOTH engines. The fixture here is a
   SEARCHED adversarial case (seed-7 scan over 20-order cent vectors,
   2026-08-15): its exact wsum = 707497246750530010738 (70 bits) is
   one of the values where DuckDB's direct cast provably differs from
   the correctly-rounded string path, so a revert of either side's
   bridge fails loudly, not probabilistically.

2. q379 mutual_information formed n·n_xy and n_x·n_y as int64
   products before casting to double; past ~3e9 documents n·n_xy
   overflows 2^63 on both engines (DuckDB raises, Spark wraps with
   ANSI off). The fix casts each factor to double BEFORE multiplying
   (correctly-rounded double ops keep the fixed-shape expression
   engine-identical). Proven here at the exact overflow boundary with
   a synthetic contingency table, plus a parity re-check on the real
   fixture.
"""

from __future__ import annotations

import datetime

import duckdb

from etl_geonet_quakes_spark.operators import relational as rel
from etl_geonet_quakes_spark.queries import SPECS

INT64_MAX = (1 << 63) - 1

# j = 1 is the OLDEST kept order (the query's weight index): w_1 =
# 3^(n-1), w_j = 4^(j-2)·3^(n-j). The searched cent vector is listed
# oldest-first; Σ w_j·c_j = 707497246750530010738 > 2^63.
_W20 = [3**19] + [4 ** (j - 2) * 3 ** (20 - j) for j in range(2, 21)]
_CENTS_OLDEST_FIRST = [
    2682962416, 2621000046, 2608828923, 2581054364, 2695201639,
    2537770806, 2611717788, 2592331098, 2600960225, 2584846554,
    2532456356, 2588939206, 2500467448, 2587120078, 2590804367,
    2606906986, 2532223353, 2552543860, 2691400806, 2503146496,
]
_WSUM = sum(w * c for w, c in zip(_W20, _CENTS_OLDEST_FIRST))


def _write_orders_fixture(spark, d: str) -> None:
    """One customer, 20 orders, distinct ascending dates so order j
    (1-based, oldest) carries _CENTS_OLDEST_FIRST[j-1]."""
    rows = []
    base = datetime.datetime(1995, 1, 1)
    for j, cents in enumerate(_CENTS_OLDEST_FIRST, start=1):
        rows.append(
            (
                j,  # o_orderkey
                7,  # o_custkey
                "O",
                cents / 100.0,  # o_totalprice; round(x*100) == cents
                base + datetime.timedelta(days=j),
                "1-URGENT",
            )
        )
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")


def test_decayed_average_wsum_past_int64_is_engine_identical(spark, tmp_path):
    assert _WSUM > INT64_MAX  # the fixture really is in the regime
    d = str(tmp_path)
    _write_orders_fixture(spark, d)

    # the adversarial property that makes this pin discriminating:
    # DuckDB's direct hugeint→double cast differs from the correctly
    # rounded string path on this exact wsum
    con = duckdb.connect()
    direct, bridged = con.sql(
        f"SELECT CAST(CAST('{_WSUM}' AS DECIMAL(38,0)) AS DOUBLE),"
        f" CAST(CAST(CAST('{_WSUM}' AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)"
    ).fetchone()
    assert bridged == float(_WSUM)  # string path is correctly rounded
    assert direct != bridged  # direct path double-rounds here

    # round(x*100) must recover the cents exactly from the stored
    # double totalprice, or the fixture isn't testing what it claims
    for c in _CENTS_OLDEST_FIRST:
        assert round((c / 100.0) * 100) == c

    got = rel.decayed_average(spark, d).collect()
    assert len(got) == 1 and got[0]["n_orders_used"] == 20

    con.sql(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{d}/orders.parquet/*.parquet')"
    )
    oracle = con.sql(SPECS["q179_decayed_average"].oracle).fetchall()
    assert len(oracle) == 1
    expected = float(_WSUM) / float(100 * (1 << 38))
    assert got[0]["decayed_avg"] == oracle[0][2] == expected


def test_mutual_information_factors_survive_int64_overflow(spark, tmp_path):
    """Contingency table with n·n_xy > 2^63: 2 cells of 2^31 docs
    each would need petabytes materialized, so the check runs the
    ARITHMETIC TAIL of both engines on pre-aggregated cell counts —
    the same fixed-shape expression the query and oracle share."""
    import math

    n_xy = 1 << 31
    n = 2 * n_xy  # one lang, two sources
    n_x, n_y = n, n_xy
    assert n * n_xy > INT64_MAX  # the factor-product really overflows

    # Spark tail: the exact expression mutual_information builds
    from pyspark.sql import functions as F

    row = spark.createDataFrame(
        [(n_xy, n_x, n_y, n)], "n_xy long, n_x long, n_y long, n long"
    )
    n_d = F.col("n").cast("double")
    ratio = (n_d * F.col("n_xy").cast("double")) / (
        F.col("n_x").cast("double") * F.col("n_y").cast("double")
    )
    got = row.select(
        F.round(F.log2(ratio), 6).alias("pmi_bits")
    ).collect()[0]["pmi_bits"]

    # DuckDB tail: the oracle's expression verbatim
    con = duckdb.connect()
    want = con.sql(
        f"SELECT ROUND(log2((CAST({n} AS DOUBLE) * CAST({n_xy} AS DOUBLE))"
        f" / (CAST({n_x} AS DOUBLE) * CAST({n_y} AS DOUBLE))), 6)"
    ).fetchone()[0]

    assert got == want == round(math.log2((n * n_xy) / (n_x * n_y)), 6) == 0.0

    # and the int64 product really was the bug: the pre-fix shape
    # raises in DuckDB rather than silently agreeing
    try:
        con.sql(f"SELECT CAST({n} AS BIGINT) * CAST({n_xy} AS BIGINT)").fetchone()
        raised = False
    except Exception:
        raised = True
    assert raised


def _shapley_conservation(spark, sf_dir: str) -> None:
    """Zero-sum pin (round-11 advisor item): the emitted
    shapley_millicents + remainder_mc columns must sum EXACTLY to
    the attributed revenue — p_cents·1000 over purchases with ≥ 1
    distinct non-purchase channel in the preceding 7 days — computed
    here independently of the attribution query's split logic."""
    from pyspark.sql import functions as F

    from etl_geonet_quakes_spark.io import load_table

    out = rel.shapley_attribution(spark, sf_dir)
    tot = out.agg(
        F.sum(F.col("shapley_millicents") + F.col("remainder_mc")).alias("t")
    ).collect()[0]["t"]

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    win_us = 7 * 86400 * 1_000_000
    p = e.filter(F.col("event_type") == "purchase")
    t = e.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_uid"),
        F.col("us").alias("t_us"),
    )
    attributed = (
        p.join(
            t,
            (F.col("user_id") == F.col("t_uid"))
            & (F.col("t_us") < F.col("us"))
            & (F.col("t_us") >= F.col("us") - F.lit(win_us)),
            "leftsemi",
        )
        .agg(F.sum(F.col("cents") * 1000).alias("rev_mc"))
        .collect()[0]["rev_mc"]
    )
    assert tot == attributed, (tot, attributed)


def test_shapley_remainder_conserves_revenue_sf0001(spark):
    _shapley_conservation(spark, "/root/testdata/sf0.001")


def test_shapley_remainder_conserves_revenue_sf001(spark):
    _shapley_conservation(spark, "/root/testdata/sf0.01")


def test_knuth_mod32_matches_int64_path_and_survives_big_keys(spark):
    """Round-11 sf1.0 regression: (key * 2654435761) in plain int64
    overflows (ANSI ARITHMETIC_OVERFLOW) once keys pass ~3.5e9 — the
    10x tiling puts tile-9 keys at ~9e9 and five registry queries
    errored. knuth_mod32 runs the multiply in DECIMAL(38,0) and must
    (a) be bit-identical to the old int64 path on every key below the
    overflow line and (b) return the exact mathematical value above
    it (pins cross-checked against Python big-int arithmetic)."""
    from pyspark.sql import functions as F

    from etl_geonet_quakes_spark.functions import knuth_mod32

    small = spark.range(1, 5000, 37).select(
        F.col("id").alias("k"),
        knuth_mod32(F.col("id"), 2654435761).alias("new"),
        ((F.col("id") * F.lit(2654435761)) % F.lit(4294967296)).alias("old"),
    )
    assert small.filter(F.col("new") != F.col("old")).count() == 0

    big = [9_000_000_005, 9_000_000_005_000, 3_500_000_000]
    got = {
        r["k"]: r["h"]
        for r in spark.createDataFrame([(k,) for k in big], "k long")
        .select("k", knuth_mod32(F.col("k"), 2654435761).alias("h"))
        .collect()
    }
    assert got == {k: (k * 2654435761) % 2**32 for k in big}
