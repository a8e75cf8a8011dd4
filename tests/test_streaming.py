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


def test_stream_sessionize_stateful_gap_and_timeout(spark, tmp_path):
    """applyInPandasWithState sessionization: sessions split on the
    inactivity gap (state carried ACROSS micro-batch restarts), and an
    idle user's open session drains via EventTimeTimeout when the
    watermark passes last_event + gap."""
    import datetime as dt

    from resume_parser_service_spark.streaming import stream_sessionize

    in_dir = str(tmp_path / "ev_in")
    out_dir = str(tmp_path / "ev_out")

    def ev(eid, uid, h, m, value=1.0):
        return (eid, dt.datetime(2024, 1, 1, h, m), uid, "click",
                value, "{}")

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")

    # batch 1: user 1 has two events 10:00/10:10 (one session);
    # user 2 has one event 10:05
    spark.createDataFrame(
        [ev(0, 1, 10, 0), ev(1, 1, 10, 10), ev(2, 2, 10, 5)],
        schema).write.mode("append").parquet(in_dir)
    q = stream_sessionize(spark, in_dir, out_dir, gap_minutes=30)
    q.awaitTermination(300)

    # batch 2 (restart, same checkpoint): user 1 returns at 12:00 —
    # past the gap, so the 10:00-10:10 session closes; the watermark
    # advances to 11:50, past user 2's 10:05+30min timeout, so user 2's
    # session drains with no new event for that user
    spark.createDataFrame([ev(3, 1, 12, 0)], schema) \
        .write.mode("append").parquet(in_dir)
    q2 = stream_sessionize(spark, in_dir, out_dir, gap_minutes=30)
    q2.awaitTermination(300)

    rows = {(r.user_id, r.session_start.minute, r.n_events)
            for r in spark.read.parquet(out_dir).collect()}
    assert (1, 0, 2) in rows     # user 1: 10:00-10:10, two events
    assert (2, 5, 1) in rows     # user 2: drained by timeout
    # user 1's 12:00 session is still open — not emitted
    assert not any(u == 1 and m == 0 and n == 1 for u, m, n in rows
                   if (u, m, n) != (1, 0, 2))
    assert len(rows) == 2


def test_stream_ingestion_with_neardup_index(spark, tmp_path):
    """Streaming + incremental dedup compose: each micro-batch matches
    against the append-only band index, so a near-dup re-crawled under
    a new url in a LATER streamed file is tagged with the url it
    duplicates, and the index grows across micro-batches."""
    in_dir = str(tmp_path / "incoming")
    out_root = str(tmp_path / "out")

    pages = build_pages_df(spark, 30, with_fixtures=False)
    pages.filter("url LIKE '%/doc/1%'") \
        .write.mode("overwrite").parquet(in_dir)
    q = stream_extraction(spark, in_dir, out_root, available_now=True,
                          neardup_index=True)
    q.awaitTermination(300)
    idx1 = SnapshotTable(out_root + "/neardup_bands").read(spark).count()
    assert idx1 > 0

    src_url = pages.filter("url LIKE '%/doc/10'").collect()[0].url
    redup = (pages.filter("url LIKE '%/doc/10'")
             .withColumn("url", F.lit("https://mirror.example/copy/10")))
    pages.filter("url LIKE '%/doc/2%'").unionByName(redup) \
        .write.mode("append").parquet(in_dir)
    q2 = stream_extraction(spark, in_dir, out_root, available_now=True,
                           neardup_index=True)
    q2.awaitTermination(300)

    ext = SnapshotTable(out_root + "/resumes_extracted").read(spark)
    tagged = {r.url: r.neardup_of for r in
              ext.filter(F.col("neardup_of").isNotNull()).collect()}
    assert tagged == {"https://mirror.example/copy/10": src_url}
    assert SnapshotTable(out_root + "/neardup_bands").read(spark) \
        .count() > idx1
