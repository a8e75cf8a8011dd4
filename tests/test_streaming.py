"""Structured Streaming ingestion: micro-batch drain of a file source
through the same extraction dataflow, exactly-once across restarts."""

from pyspark.sql import functions as F

from resume_parser_service_spark.pipeline.writer import SnapshotTable
from resume_parser_service_spark.sources.pages import build_pages_df
from resume_parser_service_spark.streaming import stream_extraction


def test_stream_ingestion_drains_and_is_idempotent(spark, tmp_path):
    in_dir = str(tmp_path / "incoming")
    out_root = str(tmp_path / "out")

    build_pages_df(spark, 30, with_fixtures=False) \
        .write.mode("overwrite").parquet(in_dir)

    q = stream_extraction(spark, in_dir, out_root, available_now=True)
    q.awaitTermination(300)
    ext = SnapshotTable(out_root + "/resumes_extracted").read(spark)
    n1 = ext.count()
    assert n1 >= 30
    assert ext.groupBy("url").count().filter(F.col("count") > 1).count() == 0

    # restart over the same input: source offsets + audit anti-join
    # -> nothing new lands
    q2 = stream_extraction(spark, in_dir, out_root, available_now=True)
    q2.awaitTermination(300)
    ext2 = SnapshotTable(out_root + "/resumes_extracted").read(spark)
    assert ext2.count() == n1

    # new files arriving -> only the delta is processed
    build_pages_df(spark, 40, with_fixtures=False) \
        .write.mode("append").parquet(in_dir)
    q3 = stream_extraction(spark, in_dir, out_root, available_now=True)
    q3.awaitTermination(300)
    ext3 = SnapshotTable(out_root + "/resumes_extracted").read(spark)
    # 40-doc corpus overlaps the first 30 urls; only ~10 new urls commit
    assert ext3.count() == ext3.select("url").distinct().count()
    assert ext3.count() >= n1 + 10
