"""Per-query optimization harness for the r14 round: capture
``explain("formatted")`` to plans/r14/<name>_<tag>.txt and time N runs
of the same ``.count()`` action bench.py uses (plus an optional noop-
sink run to separate compute from the count short-circuit).

    python tools/profile_query.py q275_bootstrap_ci [more...] \
        [--tag before] [--runs 3] [--noop] [--no-plan]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import contextlib
import io
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _warm  # noqa: E402
from etl_geonet_quakes_spark.queries import SPECS  # noqa: E402
from etl_geonet_quakes_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r15"),
)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    tag = "before"
    runs_n = 3
    noop = False
    do_plan = True
    extra_conf: dict[str, str] = {}
    names: list[str] = []
    it = iter(range(len(args)))
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--tag":
            tag = args[i + 1]
            i += 2
        elif a == "--runs":
            runs_n = int(args[i + 1])
            i += 2
        elif a == "--noop":
            noop = True
            i += 1
        elif a == "--no-plan":
            do_plan = False
            i += 1
        elif a == "--conf":
            k, v = args[i + 1].split("=", 1)
            extra_conf[k] = v
            i += 2
        else:
            names.append(a)
            i += 1

    spark = get_spark("profile-query", extra_conf=extra_conf or None)
    spark.sparkContext.setLogLevel("ERROR")
    _warm(spark, SF_DIR)
    os.makedirs(PLAN_DIR, exist_ok=True)

    for name in names:
        fn = SPECS[name].fn
        if do_plan:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(PLAN_DIR, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"# plan -> {path}")
        runs = []
        for _ in range(runs_n):
            spark.sparkContext.setJobDescription(f"{name} [{tag}]")
            t0 = time.perf_counter()
            n = fn(spark, SF_DIR).count()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{name} [{tag}]: median {statistics.median(runs):.3f}s of {runs} ({n} rows)")
        if noop:
            nruns = []
            for _ in range(runs_n):
                spark.sparkContext.setJobDescription(f"{name} [{tag} noop]")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                nruns.append(round(time.perf_counter() - t0, 3))
            print(f"{name} [{tag} noop]: median {statistics.median(nruns):.3f}s of {nruns}")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
