"""Incremental band-index dedup: planted near-dups of indexed docs are
caught with the right dup_of, novel docs pass, the index grows
append-only, and the signature SQL is engine-portable."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from resume_parser_service_spark.operators import incremental  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.exists(SF_DIR),
                                reason="driver testdata not present")


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    indexed = docs.filter("doc_id % 3 != 0")
    fresh = docs.filter("doc_id % 3 = 0 AND doc_id < 30")
    # planted near-dups: indexed texts with ONE token swapped, new ids
    dups = spark.sql("""
        SELECT doc_id + 100000 AS doc_id,
               concat('zqx ', substring(text, instr(text, ' ') + 1)) AS text
        FROM {d} WHERE doc_id IN (1, 2, 4)
    """, d=indexed)
    batch = fresh.unionByName(dups)
    return indexed, fresh, dups, batch


def test_split_batch_classification(spark, corpus):
    indexed, fresh, dups, batch = corpus
    idx_bands = incremental.band_signatures(spark, indexed)
    new_bands = incremental.band_signatures(spark, batch)
    novel, pairs, updated = incremental.split_batch(
        batch, new_bands, idx_bands)

    got_pairs = {(r.doc_id, r.dup_of) for r in pairs.collect()}
    # every planted dup is caught pointing at its source doc
    assert {(100001, 1), (100002, 2), (100004, 4)} <= got_pairs
    flagged = {d for d, _ in got_pairs}
    novel_ids = {r.doc_id for r in novel.collect()}
    # flagged and novel partition the batch
    batch_ids = {r.doc_id for r in batch.collect()}
    assert flagged | novel_ids == batch_ids
    assert not flagged & novel_ids
    # the synthetic fresh docs are pairwise-distinct texts — none should
    # collide with the index in ALL the planted cases' absence; allow
    # incidental LSH collisions only among non-planted ids
    assert {100001, 100002, 100004} <= flagged

    # index grows append-only by exactly the novel docs' bands
    n_idx = idx_bands.count()
    n_novel_bands = 4 * len(novel_ids)
    assert updated.count() == n_idx + n_novel_bands


def test_index_join_broadcasts_batch(spark, corpus):
    indexed, _, _, batch = corpus
    idx_bands = incremental.band_signatures(spark, indexed)
    new_bands = incremental.band_signatures(spark, batch)
    plan = (incremental.match_against_index(new_bands, idx_bands)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan  # index side streams, no shuffle


def test_signature_sql_engine_parity(spark, corpus):
    indexed, _, _, _ = corpus
    indexed.createOrReplaceTempView("_par_docs")
    sdf = spark.sql(incremental.band_signatures_sql(
        "spark", table="_par_docs")).toPandas()
    con = duckdb.connect()
    con.register("_par_docs", indexed.toPandas())
    odf = con.execute(incremental.band_signatures_sql(
        "duck", table="_par_docs")).df()
    for df in (sdf, odf):
        for c in df.columns:
            if pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("int64")
    sdf = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    odf = odf.sort_values(list(odf.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(sdf, odf, check_dtype=False)


def test_reingest_is_noop(spark, corpus):
    """Re-presenting already-indexed docs (a replayed batch): none are
    novel, none are flagged as near-dups of THEMSELVES, and the index
    does not grow — the idempotency an incremental pipeline leans on."""
    indexed, _, _, _ = corpus
    idx_bands = incremental.band_signatures(spark, indexed)
    n_idx = idx_bands.count()
    reingest = indexed.limit(20)
    re_bands = incremental.band_signatures(spark, reingest)
    novel, pairs, updated = incremental.split_batch(
        reingest, re_bands, idx_bands)
    assert novel.count() == 0
    assert pairs.filter("doc_id = dup_of").count() == 0
    assert updated.count() == n_idx  # replay appends nothing


def test_ingest_job_neardup_index(spark, tmp_path):
    """Product surface: two ingest runs with neardup_index=True — the
    second batch's re-crawled near-dup page is tagged with the url it
    duplicates from batch 1, novel pages are untagged, and the band
    index grows append-only across runs."""
    from pyspark.sql import functions as F

    from resume_parser_service_spark.pipeline.run import run_extraction_job
    from resume_parser_service_spark.pipeline.writer import SnapshotTable
    from resume_parser_service_spark.sources.pages import build_pages_df

    out = str(tmp_path / "out")
    pages = build_pages_df(spark, 30, with_fixtures=False)
    r1 = run_extraction_job(spark, pages.filter("url LIKE '%/doc/1%'"),
                            out, neardup_index=True)
    assert r1["extracted"] > 0
    idx1 = SnapshotTable(out + "/neardup_bands").read(spark).count()
    assert idx1 > 0

    # batch 2: novel docs (doc/2x) plus a re-crawl of doc/10's content
    # under a NEW url (near-dup of an indexed page, different key so the
    # url-resume filter does not skip it)
    src_url = pages.filter("url LIKE '%/doc/10'").collect()[0].url
    redup = (pages.filter("url LIKE '%/doc/10'")
             .withColumn("url", F.lit("https://mirror.example/copy/10")))
    batch2 = pages.filter("url LIKE '%/doc/2%'").unionByName(redup)
    r2 = run_extraction_job(spark, batch2, out, neardup_index=True)
    assert r2["extracted"] > 0

    ext = SnapshotTable(out + "/resumes_extracted").read(spark)
    tagged = {r.url: r.neardup_of for r in
              ext.filter(F.col("neardup_of").isNotNull()).collect()}
    assert tagged == {"https://mirror.example/copy/10": src_url}
    idx2 = SnapshotTable(out + "/neardup_bands").read(spark).count()
    assert idx2 > idx1  # append-only growth

    # idempotent resume leaves the index untouched
    r3 = run_extraction_job(spark, batch2, out, neardup_index=True)
    assert r3["resumed_noop"]
    assert SnapshotTable(out + "/neardup_bands").read(spark).count() == idx2
