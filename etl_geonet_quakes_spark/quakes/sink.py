"""Sink adapters: FeatureCollection envelope + upsert/expiry contract.

The reference POSTs one FeatureCollection per run and relies on
**upsert-by-id with expiry-by-omission** (task.ts:195-203,251-256):
re-sending an id updates the feature, omitting a previously-sent id
expires it. Two adapters re-express that:

- ``to_feature_collection`` — the thin driver-side envelope for the
  REST handoff. The ONLY place in the engine that collects; it sorts
  by id so the envelope is byte-stable (distributed row order is not,
  SURVEY §7.4). Payloads here are O(100) rows by contract.
- ``SnapshotDiffSink`` — the scale path: each trigger/batch publishes
  a full snapshot keyed by id and diffs against the previous
  snapshot's id set to emit explicit ``expired`` ids. This turns the
  reference's implicit platform-side state into engine-visible state
  that works under ``foreachBatch`` in streaming or per-run in batch.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_feature_collection(df: DataFrame) -> dict:
    """Envelope rows as {'type': 'FeatureCollection', 'features': [...]}
    (task.ts:251-254). Driver-side by design — REST handoff only."""
    rows = df.orderBy("id").toJSON().collect()
    return {"type": "FeatureCollection", "features": [json.loads(r) for r in rows]}


class SnapshotDiffSink:
    """Upsert-by-id + expiry-by-omission over snapshot publishes.

    State is a parquet directory of the previously-published ids —
    durable, partition-parallel, and tiny relative to the data (ids
    only). ``publish`` returns (upserted_count, expired_ids_df).
    """

    def __init__(self, state_dir: str) -> None:
        self.state_dir = state_dir
        self._ids_path = os.path.join(state_dir, "published_ids")
        # resume the sequence across restarts so a rerun never reuses a
        # scratch dir an earlier return value may still reference
        existing = sorted(glob.glob(os.path.join(state_dir, "_expired_scratch_*")))
        self._publish_seq = (
            int(existing[-1].rsplit("_", 1)[-1]) if existing else 0
        )

    def _prune_scratch(self, keep_last: int) -> None:
        dirs = sorted(glob.glob(os.path.join(self.state_dir, "_expired_scratch_*")))
        for d in dirs[:-keep_last]:
            shutil.rmtree(d, ignore_errors=True)

    def _previous_ids(self, spark) -> DataFrame | None:
        try:
            return spark.read.parquet(self._ids_path)
        except Exception:
            return None  # first publish

    def publish(self, snapshot: DataFrame) -> tuple[int, DataFrame]:
        """Publish a full snapshot (must carry an ``id`` column).

        Returns the number of upserted features and a DataFrame of ids
        expired by omission (present previously, absent now).

        .. warning:: **The returned ``expired`` DataFrame is valid for
           ONE further ``publish()`` cycle only.** It lazily reads a
           per-publish scratch parquet; scratch dirs older than the
           last ``keep_last`` (2) publishes are pruned, so consuming
           the return after two more ``publish()`` calls raises
           FileNotFound at action time. Materialize it (``.collect()``,
           write, or ``.localCheckpoint()``) before publishing again if
           it must outlive the next cycle.
        """
        spark = snapshot.sparkSession
        # r14 (guide §2.4/§5): materialize the id set ONCE. Three
        # consumers follow (the expiry anti-join, the upsert count,
        # the state overwrite), and each action on a lazy `ids` would
        # re-execute the ENTIRE snapshot plan — for a WARC/codec
        # pipeline (q392) that meant three full mapInPandas
        # encode+decode passes per publish. The id set is tiny by
        # construction (ids only), so the checkpoint is cheap at any
        # scale; results are identical, only execution count changes.
        ids = snapshot.select("id").dropDuplicates(["id"]).localCheckpoint()
        prev = self._previous_ids(spark)
        if prev is not None:
            expired = prev.join(ids, "id", "left_anti")
        else:
            expired = ids.limit(0)
        # Materialize expiry BEFORE overwriting state — but WITHOUT a
        # driver collect (a large shrinking snapshot would otherwise
        # buffer every expired id in driver memory). A scratch parquet
        # write breaks the lineage durably; the re-read below no longer
        # references published_ids, so the overwrite is safe. The
        # scratch path is UNIQUE per publish — a shared path would
        # silently repoint the previously returned (lazy) expired
        # DataFrame at the next publish's data. Scratch dirs are tiny
        # (ids only); stale ones are pruned on the next publish, which
        # keeps the previous return valid for one full cycle.
        self._publish_seq += 1
        scratch = os.path.join(
            self.state_dir, f"_expired_scratch_{self._publish_seq:06d}"
        )
        expired.write.mode("overwrite").parquet(scratch)
        expired = spark.read.parquet(scratch)
        self._prune_scratch(keep_last=2)
        n = ids.count()
        ids.write.mode("overwrite").parquet(self._ids_path)
        return n, expired

    def foreach_batch(self, handler=None):
        """Adapter for streaming: ``writeStream.foreachBatch(sink.foreach_batch(fn))``
        where ``fn(feature_collection_dict, expired_ids_list, epoch)``
        performs the actual REST POST (or logging in tests)."""

        def run(batch_df: DataFrame, epoch_id: int) -> None:
            n, expired = self.publish(batch_df)
            if handler is not None:
                fc = to_feature_collection(batch_df)
                handler(fc, [r["id"] for r in expired.collect()], epoch_id)

        return run
