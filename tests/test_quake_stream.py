"""End-to-end streaming quake pipeline: two snapshot files → two
micro-batches → upsert + expiry-by-omission across batches."""

from __future__ import annotations

import json
import os

from etl_geonet_quakes_spark.quakes.transform import QuakeJobConfig
from etl_geonet_quakes_spark.streaming.quake_stream import run_quake_stream

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "geonet_quakes.json")
NOW_MS = 1768478400000


def test_two_snapshot_stream_with_expiry(spark, tmp_path):
    snaps = tmp_path / "snaps"
    snaps.mkdir()
    body = json.load(open(FIXTURE))
    # snapshot 1: full feed
    json.dump(body, open(snaps / "t0.json", "w"))
    # snapshot 2: first quake gone from the feed
    dropped = "earthquake-" + body["features"][0]["properties"]["publicID"]
    body2 = {"features": body["features"][1:]}
    json.dump(body2, open(snaps / "t1.json", "w"))

    published = []
    cfg = QuakeJobConfig(min_mmi=-1, max_age_minutes=1e12, now_utc_ms=NOW_MS)
    epochs = run_quake_stream(
        spark,
        str(snaps),
        str(tmp_path / "state"),
        cfg,
        publish_handler=lambda fc, expired, epoch: published.append(
            (epoch, sorted(f["id"] for f in fc["features"]), sorted(expired))
        ),
    )
    assert len(epochs) == 2
    published.sort()
    (e0, ids0, exp0), (e1, ids1, exp1) = published
    assert len(ids0) == 8 and exp0 == []
    assert dropped not in ids1 and len(ids1) == 7
    assert exp1 == [dropped]
    # every published feature keeps the CoT shape
    # (spot-check one field through the envelope)
    assert all(i.startswith("earthquake-") for i in ids0)
