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


def test_stream_windowed_metrics_watermark_late_data(spark, tmp_path):
    """Append-mode windowed aggregation: a window is emitted exactly
    once when the watermark passes its end, and a row later than the
    watermark (arriving after a restart) is dropped — never recounted,
    never double-emitted. The watermark survives the restart via the
    checkpoint."""
    import datetime as dt

    from resume_parser_service_spark.streaming import stream_windowed_metrics

    in_dir = str(tmp_path / "wm_in")
    out_dir = str(tmp_path / "wm_out")

    def page(url, ts, lang="en"):
        return (url, dt.datetime(2024, 3, 1, *ts), b"<html>x</html>",
                None, lang)

    from resume_parser_service_spark.schema import PAGES_SCHEMA

    # batch 1: two docs inside 10:00-11:00, one at 11:20 that pushes the
    # watermark to 11:10 > 11:00 -> the 10:00 window finalizes
    spark.createDataFrame(
        [page("u1", (10, 5)), page("u2", (10, 20)), page("u3", (11, 20))],
        PAGES_SCHEMA).write.mode("append").parquet(in_dir)
    q = stream_windowed_metrics(spark, in_dir, out_dir)
    q.awaitTermination(300)

    # batch 2 after restart: u4 is LATE (10:30 < watermark 11:10) and
    # must be dropped; u5 at 12:30 pushes the watermark past 12:00 so
    # the 11:00 window finalizes with exactly one doc (u3)
    spark.createDataFrame(
        [page("u4", (10, 30)), page("u5", (12, 30))],
        PAGES_SCHEMA).write.mode("append").parquet(in_dir)
    q2 = stream_windowed_metrics(spark, in_dir, out_dir)
    q2.awaitTermination(300)

    rows = {r.window_start.hour: r.n_docs
            for r in spark.read.parquet(out_dir).collect()}
    assert rows[10] == 2          # u1, u2 — late u4 NOT recounted
    assert rows[11] == 1          # u3 alone
    assert 12 not in rows         # still open (watermark <= 13:00)
