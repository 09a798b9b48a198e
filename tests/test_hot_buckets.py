"""Hot-bucket stress for the two blocked non-equi joins (round-6
verdict item 3): an everyone-online-at-once events corpus for the
interval-overlap join (q170) and a single-grid-cell geography for the
spatial radius join (q142).

Both joins block into buckets/cells precisely so no cross join ever
exists — but a bucket where EVERYONE coincides makes within-bucket
pair work quadratic by the question's nature (every pair genuinely
overlaps). AQE's skew split cannot parallelize it: a self-join reuses
one exchange, and OptimizeSkewedJoin does not split reused stages
(measured — forcing SMJ with 1KB skew thresholds on the hot corpus
yields zero AQEShuffleRead skew splits). The operators therefore ship
deterministic fragment-replicate chunking (``hot_chunks=C``): every
row hashes to a chunk, each side replicates over the other side's C
chunk ids, the join key widens to (bucket, chunk_a, chunk_b), every
pair meets exactly once, and the largest task's candidate work drops
from n² to ~(n/C)² at the cost of a ×C shuffle. These tests pin
(a) result equivalence chunked-vs-plain, (b) the cross-engine oracle
ON the hot shape, and (c) the max-task-width reduction.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_geonet_quakes_spark.queries import SPECS

HOT_USERS = 120
BASE_US = 1_700_000_000_000_000  # µs epoch, all sessions share the hour


@pytest.fixture(scope="module")
def hot_events_dir(spark, tmp_path_factory) -> str:
    """120 users, 4 events each 20 min apart in the SAME wall-clock
    hour: one time bucket holds every session, and all C(120,2)
    pairs truly overlap for exactly 3600 s."""
    rows = [
        (u, u * 10 + k, "click", BASE_US + k * 1200 * 1_000_000)
        for u in range(HOT_USERS)
        for k in range(4)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, us long"
    ).select(
        "user_id", "event_id", "event_type",
        F.timestamp_micros(F.col("us")).alias("ts"),
    )
    path = str(tmp_path_factory.mktemp("hot_events"))
    df.repartition(4).write.parquet(f"{path}/events.parquet")
    return path


def test_hot_bucket_chunking_equivalence(spark, hot_events_dir):
    """Chunked and plain plans agree bit-for-bit on the hot corpus,
    and the answer is the closed form: C(120,2) pairs, 3600 s each."""
    from etl_geonet_quakes_spark.operators.relational import session_copresence

    plain = sorted(
        map(tuple, session_copresence(spark, hot_events_dir, top_n=None).collect())
    )
    chunked = sorted(
        map(
            tuple,
            session_copresence(
                spark, hot_events_dir, top_n=None, hot_chunks=3
            ).collect(),
        )
    )
    assert plain == chunked
    assert len(plain) == HOT_USERS * (HOT_USERS - 1) // 2
    assert all(r[2] == 1 and r[3] == 3600 for r in plain)  # n_overlaps, overlap_s


def test_hot_bucket_chunking_bounds_task_width(spark, hot_events_dir):
    """THE invariant chunking buys: the hot bucket's join fans out
    over C² (chunk_a, chunk_b) keys, so the widest single task does
    ~max_chunk² candidate work instead of n². Replays the operator's
    own chunk assignment (hash(user_id, s_us) mod C) and pins the
    bound."""
    C = 3
    sizes = (
        spark.createDataFrame([(u,) for u in range(HOT_USERS)], "user_id long")
        .select(
            F.pmod(
                F.hash("user_id", F.lit(BASE_US)), F.lit(C)
            ).alias("c")
        )
        .groupBy("c")
        .count()
        .collect()
    )
    counts = {r["c"]: r["count"] for r in sizes}
    assert sum(counts.values()) == HOT_USERS
    assert len(counts) == C  # every chunk populated
    max_chunk = max(counts.values())
    # widest chunked task ≤ max_chunk² candidates — at least 4× below
    # the plain single-task n² (deterministic: same hash every run)
    assert max_chunk * max_chunk * 4 <= HOT_USERS * HOT_USERS


# 37 keys whose pseudo-coordinates (the q142 hash) land in ONE
# 0.5-degree grid cell (cy=108, cx=697) — precomputed with the same
# multiplicative hash the operator and oracle share.
CELL_KEYS = [
    291, 1134, 1977, 2820, 3231, 3252, 3663, 4074, 4095, 4506, 4917,
    4938, 5349, 5760, 5781, 6192, 6603, 6624, 7035, 7056, 7446, 7467,
    7878, 7899, 8289, 8310, 8721, 8742, 9153, 9564, 9585, 9996,
    10407, 10839, 11250, 11682, 12525,
]


@pytest.fixture(scope="module")
def hot_cell_dir(spark, tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("hot_cell"))
    spark.createDataFrame(
        [(k,) for k in CELL_KEYS[:25]], "c_custkey long"
    ).coalesce(1).write.parquet(f"{path}/customer.parquet")
    spark.createDataFrame(
        [(k,) for k in CELL_KEYS[25:]], "s_suppkey long"
    ).coalesce(1).write.parquet(f"{path}/supplier.parquet")
    return path


def test_hot_cell_chunking_equivalence_and_oracle(spark, hot_cell_dir):
    """Single-cell geography: every supplier probe hits the one hot
    cell. Chunked plan ≡ plain plan ≡ DuckDB's unblocked brute force
    (the cross-engine check ON the adversarial shape)."""
    from etl_geonet_quakes_spark.operators.geo import spatial_join

    plain = sorted(map(tuple, spatial_join(spark, hot_cell_dir).collect()))
    chunked = sorted(
        map(tuple, spatial_join(spark, hot_cell_dir, hot_chunks=3).collect())
    )
    assert plain == chunked
    assert len(plain) > 0  # the cell genuinely co-locates pairs
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{hot_cell_dir}/customer.parquet/*.parquet')"
    )
    con.execute(
        "CREATE VIEW supplier AS SELECT * FROM "
        f"read_parquet('{hot_cell_dir}/supplier.parquet/*.parquet')"
    )
    oracle = sorted(
        map(tuple, con.execute(SPECS["q142_spatial_join"].oracle).fetchall())
    )
    assert plain == oracle


def test_hot_cell_chunking_covers_every_chunk_pair(spark, hot_cell_dir):
    """The fragment-replicate join key space must cover all C×C chunk
    pairs exactly once per (supp, cust) pair — no duplicates (the
    equivalence test would catch loss; this pins no-double-count even
    when both sides replicate)."""
    from etl_geonet_quakes_spark.operators.geo import spatial_join

    chunked = spatial_join(spark, hot_cell_dir, hot_chunks=4)
    pairs = [(r["suppkey"], r["custkey"]) for r in chunked.collect()]
    assert len(pairs) == len(set(pairs))

def test_auto_chunk_selection_from_bucket_stats(spark):
    """hot_chunks=None resolves from measured bucket statistics: the
    plain plan (C=1) on uniform occupancy, C = ceil(n_max/√target) on
    a hot bucket, clamped to MAX_CHUNKS on a pathological one."""
    from etl_geonet_quakes_spark.operators import chunking as ck

    # pure arithmetic tier
    assert ck.chunks_for_pair_work(None) == 1
    assert ck.chunks_for_pair_work(ck.DEFAULT_TARGET_PAIRS) == 1
    assert ck.chunks_for_pair_work(25_000_000) == 3  # ceil(sqrt(6.25))
    assert ck.chunks_for_pair_work(10**18) == ck.MAX_CHUNKS

    # self-join tier: one 5000-row hot bucket vs uniform 100s
    hot = spark.range(5000).select(F.lit(0).alias("bkt")).unionAll(
        spark.range(10).select(F.lit(1).alias("bkt"))
    )
    assert ck.auto_chunks_self(hot, ["bkt"]) == 3
    uniform = spark.range(1000).select((F.col("id") % 10).alias("bkt"))
    assert ck.auto_chunks_self(uniform, ["bkt"]) == 1

    # bipartite tier: 3000×3000 in one shared cell → 9M pairs → C=2
    a = spark.range(3000).select(F.lit(0).alias("cell"))
    b = spark.range(3000).select(F.lit(0).alias("cell"))
    assert ck.auto_chunks_bipartite(a, b, ["cell"]) == 2
    assert ck.auto_chunks_bipartite(
        a.limit(10), b.limit(10), ["cell"]
    ) == 1


def test_auto_chunks_operator_path_unchanged(spark, hot_events_dir):
    """The registered default (hot_chunks=None → auto) returns the
    same rows as the forced plain plan on the hot fixture — the
    pre-flight is result-invariant by construction, and on this
    120-session bucket (14 400 pair work < budget) it picks C=1."""
    from etl_geonet_quakes_spark.operators import chunking as ck
    from etl_geonet_quakes_spark.operators.relational import (
        session_copresence,
    )

    auto = sorted(map(tuple, session_copresence(
        spark, hot_events_dir, top_n=None, hot_chunks=None
    ).collect()))
    forced = sorted(map(tuple, session_copresence(
        spark, hot_events_dir, top_n=None, hot_chunks=1
    ).collect()))
    assert auto == forced
    # and with a tiny budget the selector WOULD buy chunks here
    spans = spark.createDataFrame(
        [(0,)] * 120, "bkt long"
    )
    assert ck.auto_chunks_self(spans, ["bkt"], target_pairs=100) > 1
