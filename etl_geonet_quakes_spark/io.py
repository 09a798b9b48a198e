"""Declared-schema scans over the driver fixture tables.

The reference reads exactly one source — a REST GeoJSON endpoint with
a blind ``res.json() as {...}`` cast (/root/reference/task.ts:183).
The engine replaces that with explicit, validated scans: Parquet for
the star-schema fixtures (column-pruned + predicate-pushdown for
free), JSON-with-declared-schema for GeoJSON fixtures (never
inferred), and a corrupt-record column instead of blind trust.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor —
# region/nation are fixed-cardinality (5 / 25 rows) in TPC-H-like
# schemas regardless of SF, supplier/part/customer grow but stay tiny
# relative to the fact tables.
BROADCAST_SAFE = ("region", "nation")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scans get column pruning and
    predicate pushdown from Catalyst automatically."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts has shipped as parquet timestamp[ns] (arrives as a
        # long under spark.sql.legacy.parquet.nanosAsLong) and as
        # timestamp[us] (arrives as TIMESTAMP_NTZ) across fixture
        # generations. Normalize both to a session-UTC TIMESTAMP with
        # µs precision — exactly what DuckDB's scan yields — so oracle
        # comparisons line up regardless of the on-disk representation.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # integer division — float division would lose precision
            # on ~1.7e18 nanosecond values (> 2^53)
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        else:
            # TIMESTAMP_NTZ wall-clock == UTC instant for this fixture;
            # cast under the session's UTC zone is value-preserving
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register the fixture tables as temp views for the SQL API."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_geojson(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read a GeoJSON-shaped JSON file with an explicit schema.

    ``multiLine=True`` because a FeatureCollection is one document,
    and a corrupt-record column instead of the reference's unchecked
    cast (/root/reference/task.ts:183).
    """
    return (
        spark.read.schema(schema)
        .option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .json(path)
    )
