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


def _hash60_py(s: str) -> int:
    """Python twin of functions.hash60 (first 15 hex digits of md5) —
    lets the driver compute a row's bucket without a Spark job."""
    import hashlib
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


class SnapshotTable:
    def __init__(self, root: str, key_col: str = "url",
                 buckets: int | None = None):
        """``buckets``: hash-bucket the data files by key (B11 index
        layout) — point lookups then read 1/buckets of the files."""
        self.root = root
        self.key_col = key_col
        self.buckets = buckets
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
        partial commit and a crashed run leaves no visible snapshot.
        A ``_snapshot_id`` column is stamped so ``read_current`` can
        resolve replace-on-key precedence across snapshots."""
        from pyspark.sql import functions as F
        last = self.last_snapshot()
        snap_id = (last["id"] + 1) if last else 1
        rel = f"data/snap-{snap_id:06d}-{uuid.uuid4().hex[:8]}"
        path = os.path.join(self.root, rel)
        out = df.repartition(partitions) if partitions else df
        if "_snapshot_id" in out.columns:
            out = out.drop("_snapshot_id")
        out = out.withColumn("_snapshot_id", F.lit(snap_id).cast("long"))
        if "_deleted" not in out.columns:
            out = out.withColumn("_deleted", F.lit(False))
        if self.buckets:
            bucket = F.pmod(
                F.conv(F.substring(F.md5(F.col(self.key_col)), 1, 15),
                       16, 10).cast("bigint"),
                F.lit(self.buckets))
            out = out.withColumn("_bucket", bucket)
            out.write.mode("overwrite").partitionBy("_bucket").parquet(path)
        else:
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
        if not self.buckets:
            # mergeSchema: snapshots written before a column was added
            # (schema evolution) still union cleanly — missing columns
            # read as NULL, matching Iceberg's evolution semantics
            return spark.read.option("mergeSchema", "true").parquet(*paths)
        # bucketed layout: each snapshot dir is its own partitioned base
        df = None
        for p in paths:
            part = spark.read.option("basePath", p).parquet(p)
            df = part if df is None else df.unionByName(
                part, allowMissingColumns=True)
        return df

    def point_lookup(self, spark: SparkSession, key: str) -> DataFrame:
        """B1 point lookup. With a bucketed layout only the key's bucket
        directory of each snapshot is scanned (1/buckets of the files);
        unbucketed tables fall back to a filtered full read."""
        from pyspark.sql import functions as F
        if self.buckets:
            b = _hash60_py(key) % self.buckets
            paths = [os.path.join(self.root, s["path"], f"_bucket={b}")
                     for s in self.snapshots()]
            paths = [p for p in paths if os.path.exists(p)]
            if not paths:
                return spark.createDataFrame([], "url string")
            df = spark.read.parquet(*paths)
        else:
            df = self.read(spark)
        rest = [c for c in df.columns if c != self.key_col]
        cur = (df.filter(F.col(self.key_col) == key)
               .groupBy(self.key_col)
               .agg(F.max_by(F.struct(*rest), F.col("_snapshot_id"))
                    .alias("_row"))
               .select(self.key_col, "_row.*"))
        return cur.filter(~F.col("_deleted")).drop("_deleted")

    def read_current(self, spark: SparkSession,
                     version: int | None = None) -> DataFrame | None:
        """Current table state: one row per key (highest snapshot wins
        — replace-on-key semantics of
        /root/reference/app/services/resume_service.py:106-182), delete
        tombstones filtered out."""
        from pyspark.sql import functions as F
        df = self.read(spark, version)
        if df is None:
            return None
        rest = [c for c in df.columns if c != self.key_col]
        cur = (df.groupBy(self.key_col)
               .agg(F.max_by(F.struct(*rest), F.col("_snapshot_id"))
                    .alias("_row"))
               .select(self.key_col, "_row.*"))
        return cur.filter(~F.col("_deleted")).drop("_deleted")

    def merge_upsert(self, spark: SparkSession, new_df: DataFrame,
                     compare_exclude: tuple = ("vector", "_snapshot_id",
                                               "_deleted", "extract_ms")
                     ) -> dict:
        """Diff-update MERGE (SURVEY.md B5/B6): insert new keys, rewrite
        keys whose compared fields changed, and elide no-op updates —
        the field-diff semantics of
        /root/reference/app/services/resume_service.py:184-261, which
        also excludes ``vector`` from the comparison (:220-223)."""
        from pyspark.sql import functions as F
        cur = self.read_current(spark)
        if cur is None:
            snap = self.commit(new_df)
            n = new_df.count()
            return {"inserted": n, "updated": 0, "unchanged": 0,
                    "snapshot_id": snap}
        cmp_cols = [c for c in new_df.columns
                    if c not in compare_exclude and c != self.key_col]
        old = cur.select(
            self.key_col,
            F.struct(*cmp_cols).alias("_old_cmp"))
        joined = new_df.alias("n").join(old, on=self.key_col, how="left")
        new_cmp = F.struct(*[F.col(f"n.{c}") for c in cmp_cols])
        is_new = F.col("_old_cmp").isNull()
        is_changed = ~is_new & ~new_cmp.eqNullSafe(F.col("_old_cmp"))
        # persist: the join feeds both the stats aggregate and the
        # commit write — without it the full shuffle-join of the new
        # batch runs twice at scale
        joined = joined.persist()
        try:
            changed = joined.filter(is_new | is_changed)
            to_write = changed.select(
                [F.col(f"n.{c}") for c in new_df.columns])
            stats_row = joined.select(
                F.sum(is_new.cast("int")).alias("ins"),
                F.sum(is_changed.cast("int")).alias("upd"),
                F.count("*").alias("total")).collect()[0]
            inserted = int(stats_row["ins"] or 0)
            updated = int(stats_row["upd"] or 0)
            snap = None
            if inserted + updated > 0:
                snap = self.commit(to_write)
        finally:
            joined.unpersist()
        return {"inserted": inserted, "updated": updated,
                "unchanged": int(stats_row["total"]) - inserted - updated,
                "snapshot_id": snap}

    def delete_keys(self, spark: SparkSession, keys: list) -> int | None:
        """Delete by key via tombstone rows (SURVEY.md B7)."""
        from pyspark.sql import functions as F
        cur = self.read_current(spark)
        if cur is None:
            return None
        victims = cur.filter(F.col(self.key_col).isin(keys)) \
            .withColumn("_deleted", F.lit(True))
        if victims.isEmpty():
            return None
        return self.commit(victims)

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
