"""Paired A/B cross-round bench — the drift-immune protocol the
round-10/11 verdicts adjudicated from, now a standing tool (round-12
verdict item 4) instead of an in-session one-off, and now INCLUDING
the heavy streaming replays (q273/q214/q187/q151/q10) that were
absent from the 110-query headline set — their sweep-single wobbles
(r11: q273 7.9→11.0 s under loadavg 3.02) kept needing drift
inference.

Protocol (SCALE.md round-9/10/11): alternating A,B,A,B on the same
machine in the same session; A = the current working tree, B = a
FREEZE git worktree of the given ref; each pass is a fresh process +
SparkSession running every query once after the shared bench.py
warm-up; the per-query statistic is the MIN of the two same-code
passes (min-of-2 discards one-off GC/compilation outliers, and with
alternation any machine drift hits both sides equally in
expectation). Overlap ratio = sum(A_min) / sum(B_min).

    python tools/bench_ab.py <B_ref> BENCH_ab_r12_vs_r11.json
    SPARK_GRAFT_SF_DIR=... python tools/bench_ab.py <B_ref> OUT.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Heavy streaming replays: state-store-commit-bound, so they measure
# the streaming runtime's fixed costs, not scan/shuffle throughput.
STREAMING_HEAVY = [
    "q10_stream_stream_join",
    "q151_stream_dedup_minhash",
    "q187_quake_stream_source",
    "q214_stream_outer_join",
    "q273_stream_full_outer_join",
]

# Queries whose BENCH_r12 run triplets spread >2x (flagged
# high_variance by bench.py): min-of-2 settles them only on a quiet
# machine — the r12 verdict needed a re-run to adjudicate 1.05 vs
# 0.95. They get a THIRD alternating pass pair (min-of-3), so one A/B
# invocation is decisive under ordinary background load.
HIGH_VARIANCE = [
    "q01_pricing_summary",
    "q59_join_dim_chain",
    "q41_dedup_exact",
    "q40_dedup_ngram_jaccard",
    "q257_kaplan_meier",
    "q381_media_jpeg_decode",
]

_RUNNER = r"""
import json, os, sys, time
side = sys.argv[1]
names = json.loads(sys.argv[2])
sf_dir = sys.argv[3]
out_path = sys.argv[4]
sys.path.insert(0, side)
os.chdir(side)
import bench  # the side's own bench.py: same warm-up, same session config
from etl_geonet_quakes_spark.queries import SPECS
spark = bench.get_spark("bench-ab")
spark.sparkContext.setLogLevel("ERROR")
bench._warm(spark, sf_dir)
t = {}
for n in names:
    if n not in SPECS:
        continue  # B side may predate a query
    t0 = time.perf_counter()
    SPECS[n].fn(spark, sf_dir).count()
    t[n] = round(time.perf_counter() - t0, 3)
with open(out_path, "w") as f:
    json.dump(t, f)
spark.stop()
"""


def _headline(side: str) -> list[str]:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "side_bench", os.path.join(side, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return list(mod.HEADLINE)


def _run_pass(side: str, names: list[str], label: str) -> dict[str, float]:
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        out_path = f.name
    with tempfile.NamedTemporaryFile(
        "w", suffix=".py", delete=False
    ) as f:
        f.write(_RUNNER)
        runner = f.name
    t0 = time.perf_counter()
    try:
        subprocess.run(
            [sys.executable, runner, side, json.dumps(names), SF_DIR, out_path],
            check=True,
            # Prepend (don't clobber): environments that reach pyspark
            # or deps via a pre-existing PYTHONPATH keep working.
            env={
                **os.environ,
                "PYTHONPATH": side + os.pathsep + os.environ.get("PYTHONPATH", ""),
            },
        )
        wall = time.perf_counter() - t0
        with open(out_path) as f:
            res = json.load(f)
    finally:
        for p in (out_path, runner):
            try:
                os.unlink(p)
            except OSError:
                pass
    print(f"# pass {label}: {len(res)} queries, {wall:.1f} s", file=sys.stderr)
    return res


def main() -> None:
    b_ref = sys.argv[1]
    out = sys.argv[2]
    b_sha = subprocess.run(
        ["git", "rev-parse", "--short", b_ref], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    a_sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    freeze = os.path.join(REPO, ".worktrees", f"freeze_{b_sha}")
    if not os.path.isdir(freeze):
        subprocess.run(
            ["git", "worktree", "add", "--detach", freeze, b_sha],
            cwd=REPO, check=True,
        )

    names = _headline(REPO)
    names += [q for q in STREAMING_HEAVY if q not in names]

    load0 = os.getloadavg()
    loads = {}

    def timed_pass(side, qnames, label):
        loads[label] = [round(x, 2) for x in os.getloadavg()]
        return _run_pass(side, qnames, label)

    # alternating A,B,A,B — two same-code passes per side — plus a
    # third pass pair restricted to the HIGH_VARIANCE set (min-of-3).
    # The freeze worktree is removed in the finally (round-14 verdict
    # item 5): a detached checkout of a committed SHA holds nothing
    # unique, and leaving it inflates the repo's LoC diagnostic.
    try:
        a1 = timed_pass(REPO, names, "A1")
        b1 = timed_pass(freeze, names, "B1")
        a2 = timed_pass(REPO, names, "A2")
        b2 = timed_pass(freeze, names, "B2")
        hv = [q for q in HIGH_VARIANCE if q in names]
        a3 = timed_pass(REPO, hv, "A3hv") if hv else {}
        b3 = timed_pass(freeze, hv, "B3hv") if hv else {}
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", freeze],
            cwd=REPO, check=False,
        )
    load1 = os.getloadavg()

    overlap = sorted(set(a1) & set(a2) & set(b1) & set(b2))
    a_min = {
        q: min([a1[q], a2[q]] + ([a3[q]] if q in a3 else []))
        for q in overlap
    }
    b_min = {
        q: min([b1[q], b2[q]] + ([b3[q]] if q in b3 else []))
        for q in overlap
    }
    ratio = round(sum(a_min.values()) / sum(b_min.values()), 3)
    per_q = {
        q: {
            "a_min": a_min[q],
            "b_min": b_min[q],
            "ratio": round(a_min[q] / b_min[q], 3) if b_min[q] else None,
            "a_runs": [a1[q], a2[q]] + ([a3[q]] if q in a3 else []),
            "b_runs": [b1[q], b2[q]] + ([b3[q]] if q in b3 else []),
        }
        for q in overlap
    }
    artifact = {
        "metric": f"paired_ab_overlap_ratio_{a_sha}_vs_{b_sha}",
        "protocol": (
            "alternating A,B,A,B same machine same session; "
            f"A=working tree ({a_sha}), B=freeze worktree ({b_sha}); "
            "per-query min of the two same-code passes; includes the "
            "heavy streaming replays (round-12 verdict item 4); "
            "HIGH_VARIANCE set gets a third pass pair (min-of-3, "
            "round-13 verdict item 5)"
        ),
        "high_variance_set": hv,
        "loadavg_per_pass": loads,
        "value": ratio,
        "unit": "ratio",
        "sf_dir": SF_DIR,
        "n_overlap": len(overlap),
        "totals": {
            "a_min_sum_sec": round(sum(a_min.values()), 3),
            "b_min_sum_sec": round(sum(b_min.values()), 3),
        },
        "loadavg_start": load0,
        "loadavg_end": load1,
        "streaming_heavy": {
            q: per_q[q] for q in STREAMING_HEAVY if q in per_q
        },
        "queries": per_q,
    }
    with open(os.path.join(REPO, out), "w") as f:
        f.write(json.dumps(artifact) + "\n")
    worst = sorted(
        overlap, key=lambda q: per_q[q]["ratio"] or 0, reverse=True
    )[:10]
    print(json.dumps({
        "metric": artifact["metric"], "value": ratio,
        "n_overlap": len(overlap),
        "totals": artifact["totals"],
        "worst": {q: per_q[q]["ratio"] for q in worst},
    }))


if __name__ == "__main__":
    main()
