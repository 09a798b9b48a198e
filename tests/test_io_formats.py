"""File-format scans (SURVEY §2.2 'Scans: file formats' row): the
engine reads Parquet natively and must round-trip CSV/JSON with
DECLARED schemas (inference is banned by the data-model policy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_geonet_quakes_spark.io import load_table


def _sorted_rows(df):
    return sorted([tuple(r) for r in df.collect()])


def test_csv_roundtrip_declared_schema(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_csv")
    src.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .option("header", True)
        .csv(out)
    )
    assert _sorted_rows(back) == _sorted_rows(src)


def test_json_roundtrip_declared_schema(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    out = str(tmp_path / "region_json")
    src.write.mode("overwrite").json(out)
    back = spark.read.schema("r_regionkey int, r_name string").json(out)
    assert _sorted_rows(back) == _sorted_rows(src)


def test_partitioned_parquet_write_prunes(spark, sf_dir, tmp_path):
    """Partitioned writes + partition pruning — the at-rest layout that
    matters at 100 TB. The filtered read must only touch one
    partition directory (PartitionFilters in the scan)."""
    src = load_table(spark, sf_dir, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    out = str(tmp_path / "orders_part")
    src.write.mode("overwrite").partitionBy("status").parquet(out)
    back = spark.read.parquet(out).filter(F.col("status") == "F")

    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "status" in plan
    assert back.count() == src.filter(F.col("o_orderstatus") == "F").count()


def test_corrupt_json_quarantined_not_trusted(spark, tmp_path):
    """The reference blind-casts its JSON (task.ts:183). The engine's
    policy: corrupt records land in a quarantine column instead of
    poisoning the pipeline."""
    p = tmp_path / "mixed.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": "NOT_AN_INT", "b": "y"}\n')
    df = spark.read.schema("a int, b string, _corrupt_record string").json(str(p))
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 1 and good[0]["a"] == 1
    assert len(bad) == 1 and bad[0]["a"] is None


def test_orc_roundtrip_declared_schema(spark, sf_dir, tmp_path):
    """ORC scan/write parity with parquet: declared schema, no
    inference, values identical after a round-trip."""
    src = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_orc")
    src.write.mode("overwrite").orc(out)
    back = spark.read.schema(src.schema).orc(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
