"""Checksum (collect-free) Spark-vs-DuckDB parity for huge-output
queries — the 100 TB-shaped parity contract (round 12).

The row-level sweep (tools/parity_sweep.py) collects both result sets
to the driver and compares sorted rows; that is the right evidence at
fixture scale but inherently does not scale — q88's Θ(output) fuzzy
join emits 108,956,700 rows at the sf1.0 tiling, and collecting it
OOMed an 8 GiB driver heap (the honest failure is recorded in
PARITY_sf1.0_mid.json). This tool proves VALUE-level equality without
materializing a single row on the driver: both engines compute, over
the full result set,

    n_rows   = COUNT(*)
    checksum = SUM(md5_60bit(concat_ws('|', every column)))
               accumulated in DECIMAL(38,0)

using the registry's established md5-60-bit shared-literal family
(identical hex → identical integer on both engines). The sum is
order-independent, so no sort is needed anywhere; Spark reduces it as
one distributed aggregate (this is exactly what a 1000-executor
parity check against a reference system would run), DuckDB evaluates
the same expression over the oracle subquery in-engine.

Scope guard: columns must be integer/string/boolean/date typed — a
raw DOUBLE would compare float FORMATTING, not values, so the tool
refuses it (round such columns to fixed decimals in the query first,
which the registry's determinism rules already require for rank
keys). Row encoding (round-14): each column hashes as
length-prefixed bytes — NULL -> chr(0), value v ->
octet_length(v) || chr(31) || v — joined with chr(30). concat_ws
alone skips nulls identically on both sides (('a',NULL,'b') ≡
('a','b',NULL)), and round-13's '<NULL>' literal sentinel could not
distinguish a real NULL from the six-character string '<NULL>'; the
length prefix makes the encoding injective for ANY value content,
including values containing the separator characters themselves.

    SPARK_GRAFT_SF_DIR=... python tools/parity_checksum.py OUT.json q88_string_distance [more...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_geonet_quakes_spark.io import TABLES  # noqa: E402
from etl_geonet_quakes_spark.queries import SPECS  # noqa: E402
from etl_geonet_quakes_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_OK_SPARK_TYPES = (
    "bigint", "long", "int", "smallint", "short", "tinyint", "byte",
    "string", "boolean", "date",
)


class ChecksumTypeError(TypeError):
    """Raised when a result schema has float-typed columns the
    checksum protocol cannot compare exactly."""


def checksum_compare(sdf, con, oracle_sql: str) -> dict:
    """Collect-free value parity: COUNT(*) + order-independent SUM of
    md5-60bit row hashes in DECIMAL(38,0), computed fully inside each
    engine. Shared by the standalone CLI below and the row-sweep's
    oversized-result fallback (tools/parity_sweep.py, round 13)."""
    bad_types = [
        (c, t) for c, t in sdf.dtypes if t not in _OK_SPARK_TYPES
    ]
    if bad_types:
        raise ChecksumTypeError(
            f"checksum parity requires exact-formatting column types, "
            f"got {bad_types} — round/cast in the query"
        )
    cols = sdf.columns  # same order both sides: the SELECT order
    # Injective row encoding (round-14, ADVICE): each column becomes
    #   NULL            -> "\x00"
    #   value v         -> octet_length(v) + "\x1f" + v
    # joined with "\x1e". The byte-length prefix delimits every value
    # exactly, so a value CONTAINING the separator/sentinel cannot
    # alias across column boundaries, and a literal "<NULL>" string
    # can no longer hash like a real NULL (the old sentinel's blind
    # spot): a non-null encoding always starts with a decimal digit,
    # "\x00" never does. octet_length/strlen count UTF-8 bytes on
    # both engines, and both md5() the UTF-8 bytes of the string, so
    # the hex digests agree for any unicode content.
    def _enc(c):
        s = F.col(c).cast("string")
        return F.coalesce(
            F.concat(F.octet_length(s).cast("string"), F.lit("\x1f"), s),
            F.lit("\x00"),
        )

    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("\x1e", *[_enc(c) for c in cols])),
            1, 15,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    srow = sdf.agg(
        F.count(F.lit(1)).alias("n"), F.sum(h).alias("cs")
    ).collect()[0]
    s_n, s_cs = srow["n"], srow["cs"]

    d_expr = ", ".join(
        f"coalesce(CAST(strlen(CAST(\"{c}\" AS VARCHAR)) AS VARCHAR) "
        f"|| chr(31) || CAST(\"{c}\" AS VARCHAR), chr(0))"
        for c in cols
    )
    drow = con.sql(
        f"SELECT COUNT(*) AS n, "
        f"SUM(CAST(CAST(concat('0x', substring(md5(concat_ws(chr(30), {d_expr})), 1, 15)) "
        f"AS BIGINT) AS DECIMAL(38,0))) AS cs "
        f"FROM ({oracle_sql}) _q"
    ).fetchone()
    d_n, d_cs = drow
    ok = (s_n == d_n) and (str(s_cs) == str(d_cs))
    return {
        "status": "checksum_match" if ok else "checksum_mismatch",
        "spark_rows": s_n,
        "oracle_rows": d_n,
        "spark_checksum": str(s_cs),
        "oracle_checksum": str(d_cs),
        "columns": cols,
    }


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    unknown = [n for n in names if n not in SPECS]
    if unknown:
        raise SystemExit(f"unknown query names: {unknown}")
    spark = get_spark("parity-checksum")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    n_bad = 0
    for name in names:
        spec = SPECS[name]
        if not spec.oracle:
            raise SystemExit(f"{name} has no oracle")
        t0 = time.perf_counter()
        sdf = spec.fn(spark, SF_DIR)
        try:
            entry = checksum_compare(sdf, con, spec.oracle)
        except ChecksumTypeError as exc:
            raise SystemExit(f"{name}: {exc}")
        entry["sec"] = round(time.perf_counter() - t0, 3)
        results[name] = entry
        if entry["status"] != "checksum_match":
            n_bad += 1
        print(f"# {name}: {entry['status']} "
              f"({entry['spark_rows']} rows, {entry['sec']} s)", file=sys.stderr)

    artifact = {
        "metric": "oracle_parity_checksum",
        "sf_dir": SF_DIR,
        "n_match": len(names) - n_bad,
        "n_mismatch": n_bad,
        "n_total": len(names),
        "protocol": (
            "order-independent SUM of md5-60bit row hashes in "
            "DECIMAL(38,0) + COUNT(*), computed fully inside each "
            "engine (no driver collect) — the scalable parity mode "
            "for Θ(output) queries whose result sets exceed driver "
            "memory"
        ),
        "queries": results,
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(artifact) + "\n")
    print(json.dumps({k: artifact[k] for k in ("metric", "sf_dir", "n_match", "n_mismatch", "n_total")}))
    if n_bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
