"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[N]``; the same configs apply unchanged on a
multi-executor cluster via ``spark-submit --py-files`` (north rule).
AQE handles runtime re-planning and skew joins; Arrow batches are kept
small because ``html`` rows can be up to 10 MB (SURVEY.md §7 risk 3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def get_spark(app_name: str = "resume-parser-service-spark",
              cores: int | str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(8, int(str(cores)) * 2)
        except ValueError:
            shuffle_partitions = 64
    builder = (
        SparkSession.builder.master(master).appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let the planner pick shuffled-hash over sort-merge when its
        # size conditions hold (guide §3.1/§9) — skips the per-side
        # sorts (measured: join_revenue_by_nation SortMergeJoin ->
        # ShuffledHashJoin, ~15% faster at sf1.0; raising the
        # broadcast threshold instead was tried and REGRESSED 3x —
        # collecting a 1.5M-row orders side costs more than its
        # shuffle, so autoBroadcastJoinThreshold stays at the default)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # html rows are up to 10 MB; keep Arrow batches small (spill risk)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # scan splits scale with cores (3 waves) so one straggler task
        # cannot idle the rest of the executor at any parallelism level
        .config("spark.sql.files.minPartitionNum",
                str(max(24, shuffle_partitions * 3 // 2)))
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        # reliable-checkpoint files (dedup_clusters lineage truncation)
        # are GC'd with their frames instead of accumulating in /tmp
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
