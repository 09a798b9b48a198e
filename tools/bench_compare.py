"""Compare two bench.py JSON artifacts query-by-query.

Usage: python tools/bench_compare.py OLD.json NEW.json [ratio_flag]

Prints per-query old/new medians and the ratio for the overlapping
set, sorted worst-first, plus totals over the overlap; flags ratios
above the threshold (default 1.3). Per-run arrays (when present) are
shown for flagged rows so noise is distinguishable from regression.
"""

from __future__ import annotations

import json
import re
import statistics
import sys


def _from_truncated_tail(p, tail):
    """Recover per-query data from a driver tail that keeps only the
    last N chars of bench output (so the leading ``{"metric"`` is gone
    and the text is not parseable JSON).  The per-query run arrays
    (``"q38_minhash": [1.1, 1.0, 0.9]``) survive truncation for every
    query after the cut point; medians are recomputed from them."""
    runs = {}
    for m in re.finditer(r'"(q\w+)":\s*\[([0-9.eE+\-,\s]+)\]', tail):
        try:
            vals = [float(x) for x in m.group(2).split(",")]
        except ValueError:
            continue  # array truncated mid-number at the cut point
        runs[m.group(1)] = vals
    if not runs:
        raise ValueError(f"{p}: no per-query run arrays in truncated tail")
    env = None
    em = re.search(r'"env":\s*(\{[^{}]*\})', tail)
    if em:
        try:
            env = json.loads(em.group(1))
        except ValueError:
            pass
    return {
        "queries": {q: statistics.median(v) for q, v in runs.items()},
        "runs": runs,
        "env": env,
        "truncated": True,
    }


def main() -> None:
    old_p, new_p = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    def load(p):
        d = json.load(open(p))
        # driver BENCH_r{N}.json wraps the bench line under "parsed"
        # (or, if unparsed, as the raw "tail" text)
        if "queries" in d:
            return d
        if d.get("parsed"):
            return d["parsed"]
        tail = d["tail"]
        if '{"metric"' in tail:
            return json.loads(tail[tail.index('{"metric"'):])
        return _from_truncated_tail(p, tail)

    old = load(old_p)
    new = load(new_p)
    # environment stamps (present from round 6 on): print both so
    # uniform drift is attributable — differing loadavg / page cache
    # between rounds explains a uniform ratio; identical stamps with
    # a localized ratio point at the code
    for label, d in (("old", old), ("new", new)):
        env = d.get("env")
        if env:
            print(
                f"env[{label}]: java={env.get('java_version')} "
                f"python={env.get('python')} cpus={env.get('cpu_count')} "
                f"load={env.get('loadavg_1_5_15')} "
                f"mem_avail_kb={env.get('mem_available_kb')} "
                f"page_cache_kb={env.get('page_cache_kb')}"
            )
    common = sorted(set(old["queries"]) & set(new["queries"]))
    if not common:
        print("overlap: 0 queries — nothing to compare "
              "(disjoint HEADLINE sets between these artifacts)")
        return
    rows = []
    for q in common:
        o, n = old["queries"][q], new["queries"][q]
        rows.append((n / max(o, 1e-9), o, n, q))
    rows.sort(reverse=True)
    o_tot = sum(r[1] for r in rows)
    n_tot = sum(r[2] for r in rows)
    print(f"overlap: {len(common)} queries  old={o_tot:.2f}s  "
          f"new={n_tot:.2f}s  ratio={n_tot / o_tot:.2f}x")
    for ratio, o, n, q in rows:
        flag = "  <-- REGRESSION" if ratio > thresh else ""
        line = f"{ratio:5.2f}x  {o:7.3f} -> {n:7.3f}  {q}{flag}"
        if flag and "runs" in new and q in new["runs"]:
            line += f"  runs={new['runs'][q]}"
        print(line)


if __name__ == "__main__":
    main()
