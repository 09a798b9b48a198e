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


def events_raw_ts_type(spark: SparkSession, sf_dir: str):
    """Physical type of events.ts straight from the parquet footer:
    LongType under nanosAsLong for timestamp[ns] fixture generations,
    TIMESTAMP_NTZ for timestamp[us] ones. Shared by the batch scan and
    the streaming source (which must DECLARE the on-disk schema)."""
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType


def normalize_events_ts(ts_type):
    """Column expression normalizing events.ts of physical ``ts_type``
    to a session-UTC TIMESTAMP with µs precision — exactly what
    DuckDB's scan yields, so oracle comparisons line up regardless of
    the on-disk representation. Raises on any OTHER physical type
    (e.g. a future fixture shipping ts as double epoch-seconds or
    string): a blind cast('timestamp') would silently shift values or
    null them, surfacing only as a confusing oracle diff."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    if isinstance(ts_type, LongType):
        # integer division — float division would lose precision
        # on ~1.7e18 nanosecond values (> 2^53)
        return F.expr("timestamp_micros(ts div 1000)")
    if isinstance(ts_type, (TimestampType, TimestampNTZType)):
        # TIMESTAMP_NTZ wall-clock == UTC instant for this fixture;
        # cast under the session's UTC zone is value-preserving
        return F.col("ts").cast("timestamp")
    raise TypeError(
        f"events.ts has unsupported physical type {ts_type}; expected "
        "int64 nanos (nanosAsLong) or timestamp — refusing to guess a "
        "conversion"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scans get column pruning and
    predicate pushdown from Catalyst automatically."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # see normalize_events_ts: ns-vs-µs fixture generations
        df = df.withColumn("ts", normalize_events_ts(df.schema["ts"].dataType))
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
