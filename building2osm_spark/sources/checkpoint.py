"""Snapshot checkpoint store: Iceberg-style manifests over Parquet dirs.

The reference's resumability contract (README.md:85, building_merge.py:
659-674): re-running merge only adds buildings whose ref:bygningsnr is not
already committed. Generalized here as SURVEY.md §2.10: every stage writes
a snapshot = Parquet data + JSON manifest carrying stage name, params
hash, input-snapshot lineage, and per-partition row counts; a restarted
run anti-joins the committed key set. The layout is Iceberg-shaped
(snapshot log + manifests) so a real Iceberg catalog can replace the
backend without touching callers (the runtime jar is absent offline —
SURVEY.md §7.3).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _params_hash(params: dict) -> str:
    return hashlib.sha256(
        json.dumps(params, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


class SnapshotStore:
    """Append-only snapshot store rooted at a directory.

    Layout:
      root/<stage>/<snapshot_id>/data/*.parquet
      root/<stage>/<snapshot_id>/manifest.json
      root/<stage>/log.json              (snapshot id log, newest last)
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- write --------------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        stage: str,
        *,
        key_col: str | None = None,
        params: dict | None = None,
        inputs: list[str] | None = None,
    ) -> str:
        """Write df as a new snapshot of `stage`; returns the snapshot id.
        The manifest records per-partition row counts (skew evidence), the
        params hash (a changed config invalidates resume), and lineage."""
        snapshot_id = f"{int(time.time())}-{uuid.uuid4().hex[:8]}"
        base = os.path.join(self.root, stage, snapshot_id)
        data_dir = os.path.join(base, "data")

        part_counts = [
            (int(r["partition_id"]), int(r["n_rows"]))
            for r in (
                df.withColumn("__pid", F.spark_partition_id())
                .groupBy("__pid")
                .agg(F.count("*").alias("n_rows"))
                .select(F.col("__pid").alias("partition_id"), "n_rows")
                .collect()
            )
        ]
        df.write.mode("errorifexists").parquet(data_dir)

        manifest = {
            "snapshot_id": snapshot_id,
            "stage": stage,
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "params_hash": _params_hash(params or {}),
            "params": params or {},
            "inputs": inputs or [],
            "key_col": key_col,
            "row_count": sum(n for _, n in part_counts),
            "partitions": [
                {"partition_id": pid, "rows": n} for pid, n in sorted(part_counts)
            ],
            "schema": df.schema.jsonValue(),
        }
        with open(os.path.join(base, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)

        log_path = os.path.join(self.root, stage, "log.json")
        log = []
        if os.path.exists(log_path):
            with open(log_path) as f:
                log = json.load(f)
        log.append(snapshot_id)
        with open(log_path, "w") as f:
            json.dump(log, f)
        return snapshot_id

    # -- read ---------------------------------------------------------------

    def latest(self, stage: str) -> str | None:
        log_path = os.path.join(self.root, stage, "log.json")
        if not os.path.exists(log_path):
            return None
        with open(log_path) as f:
            log = json.load(f)
        return log[-1] if log else None

    def manifest(self, stage: str, snapshot_id: str | None = None) -> dict | None:
        snapshot_id = snapshot_id or self.latest(stage)
        if snapshot_id is None:
            return None
        path = os.path.join(self.root, stage, snapshot_id, "manifest.json")
        with open(path) as f:
            return json.load(f)

    def read(self, spark: SparkSession, stage: str, snapshot_id: str | None = None) -> DataFrame | None:
        snapshot_id = snapshot_id or self.latest(stage)
        if snapshot_id is None:
            return None
        return spark.read.parquet(os.path.join(self.root, stage, snapshot_id, "data"))

    # -- resume -------------------------------------------------------------

    def _resume(
        self, spark: SparkSession, df: DataFrame, stage: str, key_col: str,
        params: dict | None = None,
    ) -> tuple[DataFrame, bool]:
        """(filtered_df, resumed). resumed=False means the previous
        snapshot is NOT a prefix of this computation (absent, different
        key_col, or different params) — the caller must treat df as a
        complete fresh result, not an increment."""
        m = self.manifest(stage)
        if m is None or m.get("key_col") != key_col:
            return df, False
        if params is not None and m["params_hash"] != _params_hash(params):
            return df, False
        committed = self.read(spark, stage).select(key_col).distinct()
        return df.join(committed, key_col, "left_anti"), True

    def resume_filter(
        self, spark: SparkSession, df: DataFrame, stage: str, key_col: str,
        params: dict | None = None,
    ) -> DataFrame:
        """Drop rows whose key is already committed in the latest snapshot
        of `stage` — the ref:bygningsnr idempotence semantics. When the
        stage has no snapshot, or was committed with DIFFERENT params, the
        full df passes (changed params = a different computation)."""
        out, _ = self._resume(spark, df, stage, key_col, params=params)
        return out

    def incremental_commit(
        self,
        df: DataFrame,
        stage: str,
        key_col: str,
        *,
        params: dict | None = None,
    ) -> tuple[str, int]:
        """resume_filter + commit of only the new keys, unioned with the
        previous snapshot → the new snapshot is complete AND the increment
        was computed only for new rows. Returns (snapshot_id, n_new).

        When params/key_col changed (resumed=False), the previous snapshot
        is a DIFFERENT computation: the new snapshot is df alone — unioning
        would duplicate every previously committed key (old-params row +
        recomputed row) and double-count downstream."""
        spark = df.sparkSession
        new_rows, resumed = self._resume(spark, df, stage, key_col, params=params)
        n_new = new_rows.count()
        prev = self.read(spark, stage) if resumed else None
        merged = new_rows if prev is None else prev.unionByName(new_rows)
        prev_id = self.latest(stage)
        sid = self.commit(
            merged,
            stage,
            key_col=key_col,
            params=params,
            inputs=[prev_id] if prev_id and resumed else [],
        )
        return sid, n_new
