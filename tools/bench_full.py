"""Full-registry wall-time snapshot: time EVERY registry query once
at $SPARK_GRAFT_SF_DIR (default sf0.1) and write one JSON artifact.

Round-8 verdict item 3: 241 of 342 queries had no committed timing, so
a 10× regression outside the HEADLINE set was invisible until it hit
the driver. This gives every query a committed wall-time each round.
Single run per query by design (HEADLINE keeps bench.py's 3-run median
discipline); the artifact's shape matches bench.py's, so
tools/bench_compare.py diffs two snapshots directly:

    python tools/bench_full.py                  # writes BENCH_full.json
    python tools/bench_full.py OUT.json         # custom output path
    python tools/bench_compare.py OLD.json NEW.json 2.0

Per-query failures are recorded under "errors" instead of aborting the
sweep — a broken query should show up as a loud artifact entry, not as
a missing file.

Round-11 verdict item 7: after the single-run pass, the 20 slowest
queries get a SECOND run and report min-of-2 — the ±1 s single-run
wobbles on the expensive tail (the q330-class) stopped needing manual
adjudication every round. "rerun_top20" in the artifact records both
runs per re-measured query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _env_stamp, _warm, parse_sf  # noqa: E402
from etl_geonet_quakes_spark.queries import SPECS  # noqa: E402
from etl_geonet_quakes_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_full.json"
    spark = get_spark("bench-full")
    spark.sparkContext.setLogLevel("ERROR")
    _warm(spark, SF_DIR)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    t_sweep = time.perf_counter()
    for name, spec in SPECS.items():
        t0 = time.perf_counter()
        try:
            spec.fn(spark, SF_DIR).count()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # record loudly, keep sweeping
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        print(
            f"# {name}: {timings.get(name, 'ERR')}s "
            f"({len(timings) + len(errors)}/{len(SPECS)})",
            file=sys.stderr,
        )
    # min-of-2 for the slow tail: re-run the 20 slowest once more and
    # keep the min — single-run noise there is drift, not plan change
    rerun: dict[str, list[float]] = {}
    top20 = sorted(timings, key=lambda k: timings[k], reverse=True)[:20]
    for name in top20:
        t0 = time.perf_counter()
        try:
            SPECS[name].fn(spark, SF_DIR).count()
            second = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            errors[name] = f"rerun: {type(exc).__name__}: {exc}"[:300]
            continue
        rerun[name] = [timings[name], second]
        timings[name] = min(timings[name], second)
        print(f"# rerun {name}: {rerun[name]} -> {timings[name]}s",
              file=sys.stderr)
    artifact = {
        "metric": "full_registry_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "rerun_top20": rerun,
        "errors": errors,
        "n_queries": len(SPECS),
        "sweep_sec": round(time.perf_counter() - t_sweep, 3),
        # guarded parse (shared with bench.py): an SF_DIR without a
        # parseable 'sf' suffix must not throw away the completed sweep
        "sf": parse_sf(SF_DIR),
        "env": _env_stamp(spark),
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(artifact) + "\n")
    print(json.dumps({k: artifact[k] for k in
                      ("metric", "value", "unit", "n_queries", "sweep_sec")}))
    if errors:
        print(f"ERRORS: {json.dumps(errors)}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
