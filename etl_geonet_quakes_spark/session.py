"""SparkSession factory.

Single place where execution-relevant config lives so tests, the
driver entrypoint and ``bench.py`` all run the same engine posture:

- AQE on (runtime coalescing, skew-join splitting) — at 100 TB the
  static plan is always wrong somewhere; AQE re-plans per stage.
- ``spark.sql.shuffle.partitions`` sized for the local harness; on a
  real cluster this is overridden (or left to AQE's coalescing with a
  high initial value).
- Session timezone pinned to UTC: parquet fixture timestamps are
  naive, the DuckDB oracle reads them naive, and the reference wire
  format is ISO-8601 UTC strings (/root/reference/task.ts:68,219-221),
  so UTC end-to-end removes a whole class of tz drift.
- Arrow enabled for the Pandas-UDF slow path (LLM ops, multimodal).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    cloudpickle serializes classes/functions defined in an importable
    module BY REFERENCE, so custom data sources and any UDF that
    touches module globals need the package on the workers' path —
    true on a real cluster exactly as in local mode. Shipping a zip
    via addPyFile is the standard mechanism and costs one file-copy
    per session.
    """
    if getattr(spark, "_egqs_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # Content-addressed name + atomic publish (round-12 fix): a fixed
    # /tmp path made CONCURRENT sessions on one machine race — one
    # process rewrote the zip while another's executors fetched it,
    # failing with "exists and does not match contents" (caught by six
    # parallel parity sweeps + an A/B freeze worktree, whose package
    # genuinely differs). Identical content hashes to the same name
    # (Spark's per-name fetch cache stays consistent); different
    # content gets a different name (no collision); os.replace makes
    # the publish atomic so a half-written zip is never visible.
    import hashlib
    import io

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for root, _dirs, files in sorted(os.walk(pkg_dir)):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    # Fixed timestamp so the digest depends only on
                    # file BYTES: zipfile otherwise stores each
                    # member's mtime, making byte-identical checkouts
                    # (e.g. a fresh A/B freeze worktree) hash to
                    # different names and accumulate stale zips.
                    info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
                    with open(full, "rb") as src:
                        zf.writestr(info, src.read())
    data = buf.getvalue()
    digest = hashlib.md5(data).hexdigest()[:12]
    zpath = os.path.join(
        tempfile.gettempdir(), f"etl_geonet_quakes_spark_{digest}.zip"
    )
    if not os.path.exists(zpath):
        tmp = f"{zpath}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, zpath)
    spark.sparkContext.addPyFile(zpath)
    spark._egqs_shipped = True


def get_spark(
    app_name: str = "etl_geonet_quakes_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session with the engine's standard config."""
    # Export the package's parent onto PYTHONPATH BEFORE the JVM
    # launches: addPyFile covers executor task workers, but the
    # driver-side Python workers that PLAN Python data sources /
    # analyze UDTFs are spawned by the JVM with the JVM's inherited
    # environment — from a foreign cwd they otherwise fail to
    # unpickle-by-reference with ModuleNotFoundError (caught by the
    # round-9 foreign-cwd smoke on the q187 streaming source; a
    # pytest run from /root/repo masks it because cwd is importable).
    # No-op when the JVM already exists — then cwd/addPyFile were
    # already sufficient for that session's lifetime.
    parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cur = os.environ.get("PYTHONPATH", "")
    if parent not in cur.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            parent + (os.pathsep + cur if cur else "")
        )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # fixture events.parquet stores timestamp[ns], which Spark's
        # parquet reader rejects; read as long and convert in io.py
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Python Data Source filter pushdown (quakes.source)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # keep managed tables (bucketing tests/demos) out of the repo
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "egqs-spark-warehouse"),
        )
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark
