"""Reproducible selection of the SCALE-SENSITIVE query class for the
third-scale-point parity sweep (round-11 verdict item 1b).

Scale-dependent parity breaks found so far were all NUMERIC-REGIME
changes: q358 int64 wrap (sums of squared cents), q35 sketch-regime
exit (approx percentile accuracy vs group size), q179 decimal-tie /
hugeint→double double-rounding, q288 double-rounding past 2^63, the
round-9 Haar ulp issue. This selects every oracled query whose SQL
exhibits one of those regime markers, plus the named alumni, so the
sweep at the tiled sf0.3 fixture exercises exactly the class that can
break between sf0.1 and larger corpora:

- VARCHAR bridge (exact decimal → string → double): any sum already
  known to leave the int64/exact-double range;
- DECIMAL(38,...) accumulation: exact wide arithmetic whose final
  cast is the regime boundary;
- approx_* / reservoir / accuracy: sketches whose exact-vs-estimate
  regime depends on group cardinality;
- POWER(): weight ladders that grow exponentially with group size;
- log/log2/ln: products-of-counts shapes (the q379 overflow class).

    python tools/scale_sensitive.py            # prints names, one per line
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_geonet_quakes_spark.queries import SPECS  # noqa: E402

MARKERS = {
    "varchar_bridge": r"AS VARCHAR\) AS DOUBLE",
    "decimal38": r"DECIMAL\(38",
    "approx_sketch": r"approx_|reservoir|accuracy",
    "pow_weights": r"POWER\(",
    "log_products": r"log2\(|\bln\(|\bLOG\b",
}

# alumni / known regime switches whose oracle text lacks the markers
MANUAL = [
    "q35_percentile_approx",   # sketch accuracy pinned to the exact regime
    "q221_ks_test",            # max-gap statistic over full ECDFs
    "q233_benford_digit_test",
    # the tied-fence interpolation class (round-11 sf0.3 find on
    # q141: quantile_cont wobbles one ulp on tied fence values and
    # flips the count; all four now use _exact_quantile_sql oracles
    # and must stay in every third-point sweep)
    "q141_winsorize",
    "q168_trimmed_mean",
    "q113_robust_outliers",
    "q213_rfm_segmentation",
]


def select() -> list[str]:
    names = []
    for name, spec in SPECS.items():
        if not spec.oracle:
            continue
        if any(re.search(p, spec.oracle, re.I) for p in MARKERS.values()):
            names.append(name)
    for m in MANUAL:
        assert m in SPECS, m
        if m not in names:
            names.append(m)
    return names


if __name__ == "__main__":
    print("\n".join(select()))
