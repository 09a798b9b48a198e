"""Boundary-event parity: the fixture event stream is dense and
well-behaved, so the analytics operators' edge branches — simultaneous
events (tiebreak), strictly-after funnel semantics, repeated values
(SCD2 suppression), exact window boundaries, single-event users —
never fire in the standard parity run. This suite builds a tiny
synthetic events table full of exactly those boundaries and re-runs
the SAME registry oracles against it.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest

from etl_geonet_quakes_spark.queries import SPECS

T0 = datetime(2024, 3, 3, 12, 0, 0)  # a Sunday — week boundary nearby

EDGE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    # user 1: single event — funnel head only, one SCD2 current row,
    # zero transitions
    (1, T0, 1, "view", 1.0, "{}"),
    # user 2: two events with IDENTICAL ts — (ts, event_id) tiebreak
    # decides the successor and the SCD2 version order
    (10, T0, 2, "view", 1.0, "{}"),
    (11, T0, 2, "click", 2.0, "{}"),
    # user 3: click at EXACTLY the view ts — strictly-after semantics
    # must NOT convert; a later click does
    (20, T0, 3, "view", 1.0, "{}"),
    (21, T0, 3, "click", 1.0, "{}"),
    (22, T0 + timedelta(hours=1), 3, "click", 1.0, "{}"),
    # user 4: purchase BEFORE any view — must not convert past stage 1
    (30, T0, 4, "purchase", 9.0, "{}"),
    (31, T0 + timedelta(hours=1), 4, "view", 1.0, "{}"),
    # user 5: events exactly 7 days apart — trailing-window boundary
    # is [t-7d, t] INCLUSIVE, so the first event is still in frame
    (40, T0, 5, "view", 1.0, "{}"),
    (41, T0 + timedelta(days=7), 5, "view", 2.0, "{}"),
    (42, T0 + timedelta(days=7, seconds=1), 5, "view", 4.0, "{}"),
    # user 6: same type repeated — SCD2 must emit ONE version,
    # transitions a self-loop
    (50, T0, 6, "error", 1.0, "{}"),
    (51, T0 + timedelta(minutes=1), 6, "error", 1.0, "{}"),
    (52, T0 + timedelta(minutes=2), 6, "error", 1.0, "{}"),
    # user 7: activity on both sides of a Monday week boundary —
    # retention offset 0 vs 1 (2024-03-03 is a Sunday,
    # 2024-03-04 a Monday)
    (60, T0, 7, "signup", 1.0, "{}"),
    (61, T0 + timedelta(days=1), 7, "view", 1.0, "{}"),
]

EDGE_EVENT_QUERIES = [
    "q103_funnel_conversion",
    "q104_retention_cohorts",
    "q105_rolling_time_window",
    "q106_event_transitions",
    "q108_resample_gapfill",
    "q112_scd2_intervals",
    "q50_sessionization",
    "q81_time_window_tumbling",
]


@pytest.fixture(scope="module")
def edge_events_dir(spark, tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("edge_events"))
    spark.createDataFrame(
        EDGE_EVENTS,
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double, props: string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")
    return path


@pytest.fixture(scope="module")
def edge_events_ddb(edge_events_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{edge_events_dir}/events.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", EDGE_EVENT_QUERIES)
def test_edge_events_match_oracle(name, spark, edge_events_dir, edge_events_ddb):
    spec = SPECS[name]
    sdf = spec.fn(spark, edge_events_dir)
    cols = sorted(sdf.columns)
    key = lambda row: tuple((v is None, repr(v)) for v in row)  # noqa: E731
    s = sorted((tuple(r[c] for c in cols) for r in sdf.collect()), key=key)
    res = edge_events_ddb.sql(spec.oracle)
    idx = {c: i for i, c in enumerate(res.columns)}
    d = sorted((tuple(r[idx[c]] for c in cols) for r in res.fetchall()), key=key)
    assert cols == sorted(res.columns), f"{name}: column mismatch"
    assert s == d, f"{name}: edge-events divergence; first spark rows {s[:3]}"


def test_edge_semantics_pinned(spark, edge_events_dir):
    """Direct semantic pins independent of the oracle: user 3's
    same-ts click must not convert (strictly-after), user 6 collapses
    to one SCD2 version, user 5's 7-day boundary is inclusive."""
    from etl_geonet_quakes_spark.operators import relational as rel

    funnel = {r["stage"]: r["n_users"] for r in rel.funnel_conversion(spark, edge_events_dir).collect()}
    # users with a view: 1,2,3,4,5,7 -> 6; clicks strictly after a
    # view: user 3 (the later click) only — user 2's click shares the
    # view's ts and must NOT count
    assert funnel["view"] == 6
    assert funnel["click_after_view"] == 1

    scd = [r for r in rel.scd2_intervals(spark, edge_events_dir).collect() if r["user_id"] == 6]
    assert len(scd) == 1 and scd[0]["is_current"]

    roll = {
        r["event_id"]: r["n_trailing"]
        for r in rel.rolling_time_window(spark, edge_events_dir).collect()
    }
    assert roll[41] == 2  # exactly-7-days-ago event is IN the frame
    assert roll[42] == 2  # 7d+1s drops the first event
