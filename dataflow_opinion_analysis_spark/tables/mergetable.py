"""MergeTable — an Iceberg-style parquet table with atomic snapshot commits
and an idempotent MERGE (insert-if-absent-by-key) operation.

No Iceberg/Delta jars exist in this image (SURVEY.md §7), so the table
format is implemented directly: a data directory of immutable parquet
files plus a chain of JSON snapshot manifests committed by atomic
``os.rename``. The pipeline code is identical to what it would be over a
real Iceberg catalog — ``merge(batch, batch_id)`` has the semantics of

    MERGE INTO t USING s ON t.<keys> = s.<keys>
    WHEN NOT MATCHED THEN INSERT *

and is the exactly-once sink used from ``foreachBatch``
(the reference's append-only BigQuery writes + URL-cache anti-join,
IndexerPipeline.java:622-676 + :400-416, replaced by a genuinely
idempotent keyed sink per the north rule).

Exactly-once under micro-batch replay is guaranteed twice over:
1. committed ``batch_id``s are recorded in the manifest — a replayed
   batch id is a no-op before any data is read;
2. the MERGE itself anti-joins on the key columns, so even a *partially*
   committed retry inserts no duplicate keys.

Scale design: the manifest records per-file min/max of the partition
column (default ``PublicationDateId``-style date ids), and ``merge``
prunes the anti-join build side to files overlapping the incoming
batch's range — the same file-skipping a real Iceberg MERGE does. State
growth is bounded by partition pruning, not table size.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class MergeTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        schema: T.StructType | None = None,
        partition_col: str | None = None,
    ):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.schema = schema
        self.partition_col = partition_col
        self.data_dir = os.path.join(path, "data")
        self.manifest_dir = os.path.join(path, "manifest")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- manifest chain ----------------------------------------------------
    def _latest_path(self) -> str:
        return os.path.join(self.manifest_dir, "LATEST")

    def current_snapshot(self) -> dict:
        p = self._latest_path()
        if not os.path.exists(p):
            return {"version": 0, "files": [], "batch_ids": [], "lineage": []}
        with open(p) as f:
            name = f.read().strip()
        with open(os.path.join(self.manifest_dir, name)) as f:
            return json.load(f)

    def _commit(self, snap: dict) -> None:
        """Atomic commit: write manifest, then rename a pointer file over
        LATEST. rename() is atomic on POSIX, so readers see either the old
        or the new snapshot, never a torn state."""
        name = f"v{snap['version']:010d}.json"
        mpath = os.path.join(self.manifest_dir, name)
        tmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(snap, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, mpath)
        ptr_tmp = self._latest_path() + f".tmp-{uuid.uuid4().hex}"
        with open(ptr_tmp, "w") as f:
            f.write(name)
            f.flush()
            os.fsync(f.fileno())
        os.rename(ptr_tmp, self._latest_path())

    # -- reads ---------------------------------------------------------------
    def files(self, min_part: int | None = None, max_part: int | None = None) -> list[str]:
        snap = self.current_snapshot()
        out = []
        for fe in snap["files"]:
            if (
                min_part is not None
                and max_part is not None
                and fe.get("min_part") is not None
                and fe.get("max_part") is not None
                and (fe["max_part"] < min_part or fe["min_part"] > max_part)
            ):
                continue  # file skipped by partition stats
            out.append(fe["path"])
        return out

    def read(self, min_part: int | None = None, max_part: int | None = None) -> DataFrame:
        fs = self.files(min_part, max_part)
        if not fs:
            if self.schema is not None:
                return self.spark.createDataFrame([], self.schema)
            raise ValueError(f"empty table {self.path} and no schema given")
        return self.spark.read.parquet(*fs)

    def committed_batch_ids(self) -> set[int]:
        return set(self.current_snapshot()["batch_ids"])

    # -- MERGE ----------------------------------------------------------------
    def merge(self, batch: DataFrame, batch_id: int) -> int:
        """Insert rows of `batch` whose key is absent. Returns rows written.
        Idempotent: replaying a committed batch_id is a no-op."""
        snap = self.current_snapshot()
        if batch_id in snap["batch_ids"]:
            return 0

        # in-batch key dedupe (deterministic smallest-first keeps goldens
        # stable). Persisted: the incoming frame is typically a lazy Arrow
        # fan-out chain, and without the persist both the bounds agg below
        # and the anti-join+write would re-run that whole chain.
        deduped = batch.dropDuplicates(self.key_cols).persist()
        try:
            # partition-stat bounds of the incoming batch (for file pruning);
            # pointless when the table has no files yet
            min_part = max_part = None
            if self.partition_col is not None and snap["files"]:
                b = deduped.agg(
                    F.min(self.partition_col).alias("lo"),
                    F.max(self.partition_col).alias("hi"),
                ).collect()[0]
                min_part, max_part = b["lo"], b["hi"]

            w = deduped
            existing_files = self.files(min_part, max_part)
            if existing_files:
                existing_keys = self.spark.read.parquet(*existing_files).select(
                    self.key_cols
                )
                w = w.join(existing_keys, self.key_cols, "left_anti")

            # row count + partition stats of what actually lands are
            # observed DURING the write job (pyspark Observation) — no
            # read-the-file-back verification pass, which matters when
            # merge() runs once per sink per micro-batch
            obs_aggs = [F.count(F.lit(1)).alias("n")]
            if self.partition_col is not None:
                obs_aggs += [
                    F.min(self.partition_col).alias("lo"),
                    F.max(self.partition_col).alias("hi"),
                ]
            obs = Observation()
            w = w.observe(obs, *obs_aggs)

            out_file = os.path.join(
                self.data_dir, f"batch-{batch_id:08d}-{uuid.uuid4().hex}"
            )
            w.write.mode("overwrite").parquet(out_file)
            wrow = obs.get
        finally:
            deduped.unpersist()

        n = wrow["n"]
        if n == 0:
            # nothing new — still record the batch id so replays skip work
            new_snap = {
                "version": snap["version"] + 1,
                "files": snap["files"],
                "batch_ids": snap["batch_ids"] + [batch_id],
                "lineage": snap["lineage"]
                + [{"batch_id": batch_id, "files": [], "rows": 0, "ts": time.time()}],
            }
            self._commit(new_snap)
            return 0

        stats = {}
        if self.partition_col is not None:
            stats = {"min_part": wrow["lo"], "max_part": wrow["hi"]}

        fe = {"path": out_file, "rows": n, **stats}
        new_snap = {
            "version": snap["version"] + 1,
            "files": snap["files"] + [fe],
            "batch_ids": snap["batch_ids"] + [batch_id],
            # per-batch lineage: which files each micro-batch produced
            "lineage": snap["lineage"]
            + [{"batch_id": batch_id, "files": [out_file], "rows": n, "ts": time.time()}],
        }
        self._commit(new_snap)
        return n

    # -- REPLACE (compaction) --------------------------------------------------
    def replace(self, df: DataFrame, note: str = "compaction") -> int:
        """Atomically replace the table's contents with `df` (the rewrite
        primitive behind maintenance jobs like fingerprint-store
        compaction — Iceberg's rewrite_data_files). Committed batch_ids
        are PRESERVED, so exactly-once replay semantics survive the
        rewrite; old data files are left on disk for time-travel until
        externally vacuumed (the snapshot no longer references them).
        Returns rows written."""
        snap = self.current_snapshot()
        out_file = os.path.join(self.data_dir, f"rewrite-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(out_file)
        written = self.spark.read.parquet(out_file)
        n = written.count()
        stats = {}
        if self.partition_col is not None and n:
            r = written.agg(
                F.min(self.partition_col).alias("lo"), F.max(self.partition_col).alias("hi")
            ).collect()[0]
            stats = {"min_part": r["lo"], "max_part": r["hi"]}
        new_snap = {
            "version": snap["version"] + 1,
            "files": [{"path": out_file, "rows": n, **stats}] if n else [],
            "batch_ids": snap["batch_ids"],
            "lineage": snap["lineage"]
            + [{"batch_id": None, "note": note, "files": [out_file], "rows": n,
                "ts": time.time()}],
        }
        self._commit(new_snap)
        return n
