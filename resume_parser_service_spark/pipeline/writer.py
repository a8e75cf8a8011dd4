"""Snapshot-committed parquet table (Iceberg-semantics fallback).

The sandbox has no Iceberg runtime jar, so table semantics are provided
by a minimal snapshot log: each commit writes parquet under
``data/snap-<id>/`` (write-then-manifest, atomic via ``os.replace``),
and a JSON manifest chain gives snapshot isolation, time travel
(SURVEY.md B12) and the idempotent resume anti-join (north rule).
On a real cluster this class is swapped for
``df.writeTo(tbl)`` / ``MERGE INTO`` on Iceberg — call sites only use
``commit`` / ``read`` / ``committed_keys``.

Mirrored semantics: one row per key with last-write-wins replace
(/root/reference/app/services/resume_service.py:106-182), versioned
reads (/root/reference/app/repositories/resume_repository.py:32-70).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["SnapshotTable"]


class SnapshotTable:
    def __init__(self, root: str, key_col: str = "url"):
        self.root = root
        self.key_col = key_col
        self.snap_dir = os.path.join(root, "_snapshots")
        os.makedirs(self.snap_dir, exist_ok=True)

    # ------------------------------------------------------------ state --
    def snapshots(self) -> list[dict]:
        snaps = []
        for f in os.listdir(self.snap_dir):
            if f.endswith(".json"):
                with open(os.path.join(self.snap_dir, f)) as fh:
                    snaps.append(json.load(fh))
        return sorted(snaps, key=lambda s: s["id"])

    def last_snapshot(self) -> dict | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    # ----------------------------------------------------------- commit --
    def commit(self, df: DataFrame, partitions: int | None = None) -> int:
        """Append ``df`` as a new snapshot. Data lands fully before the
        manifest appears (os.replace is atomic), so readers never see a
        partial commit and a crashed run leaves no visible snapshot."""
        last = self.last_snapshot()
        snap_id = (last["id"] + 1) if last else 1
        rel = f"data/snap-{snap_id:06d}-{uuid.uuid4().hex[:8]}"
        path = os.path.join(self.root, rel)
        out = df.repartition(partitions) if partitions else df
        out.write.mode("overwrite").parquet(path)
        manifest = {"id": snap_id, "parent": last["id"] if last else None,
                    "path": rel, "committed_at": time.time()}
        tmp = os.path.join(self.snap_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.snap_dir, f"{snap_id:06d}.json"))
        return snap_id

    # ------------------------------------------------------------- read --
    def read(self, spark: SparkSession, version: int | None = None
             ) -> DataFrame | None:
        """Union of snapshots up to ``version`` (time travel)."""
        paths = [os.path.join(self.root, s["path"]) for s in self.snapshots()
                 if version is None or s["id"] <= version]
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def committed_keys(self, spark: SparkSession) -> DataFrame | None:
        df = self.read(spark)
        return df.select(self.key_col).distinct() if df is not None else None

    def resume_filter(self, spark: SparkSession, incoming: DataFrame
                      ) -> DataFrame:
        """Idempotent resume: drop rows whose key is already committed
        (left-anti join on the committed key set — SURVEY.md §4.4)."""
        keys = self.committed_keys(spark)
        if keys is None:
            return incoming
        return incoming.join(keys, on=self.key_col, how="left_anti")
