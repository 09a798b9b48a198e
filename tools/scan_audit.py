"""r14 duplicated-subtree audit: for every registry query, build the
DataFrame at $SPARK_GRAFT_SF_DIR (default sf0.001 — plans, not
timings), capture ``explain("formatted")`` and count parquet scans
PER TABLE. A table appearing >=2 times in one plan marks a candidate
duplicated corpus subtree (guide §7.2) — the probe behind this
round's materialization batch (OPTIMIZATION_r14.md checklist).

    python tools/scan_audit.py          # prints one DUP line per hit
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_geonet_quakes_spark.queries import SPECS  # noqa: E402
from etl_geonet_quakes_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("scan-audit")
    for name, spec in SPECS.items():
        try:
            df = spec.fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            tables = re.findall(r"Location:.*?/(\w+)\.parquet", buf.getvalue())
            dups = {t: n for t, n in Counter(tables).items() if n >= 2}
            if dups:
                print("DUP", name, dups)
        except Exception as ex:  # keep auditing past one bad query
            print("ERR", name, f"{type(ex).__name__}: {str(ex)[:80]}")
    spark.stop()


if __name__ == "__main__":
    main()
