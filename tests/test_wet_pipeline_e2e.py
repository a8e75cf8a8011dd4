"""Capstone: the WET -> training-corpus path a Common Crawl user runs.

read_wet -> enrich annotations -> content-dedup + quality + repetition
gates -> PII scrub -> deterministic split export. Every stage is a
session feature; this asserts they COMPOSE."""

import datetime as dt
import glob
import gzip
import json
import os

import pytest

from pyspark.sql import functions as F

from resume_parser_service_spark.pipeline.export import (
    export_training_corpus)
from resume_parser_service_spark.pipeline.extract import enrich_extracted
from resume_parser_service_spark.sources.warc import make_wet, read_wet

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.001"),
    reason="driver testdata not present")


def test_wet_to_training_corpus(spark, tmp_path):
    ts = dt.datetime(2024, 6, 1)
    good = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet forest towards the river")
    recs = [{"url": f"https://site.example/page/{i}", "warc_ts": ts,
             "text": f"{good} variant {i}"} for i in range(8)]
    # content duplicate under a different url
    recs.append({"url": "https://mirror.example/copy", "warc_ts": ts,
                 "text": f"{good} variant 3"})
    # spam: one line repeated 4x of 5 lines (dup_line_fraction = 0.6)
    recs.append({"url": "https://spam.example/buy", "warc_ts": ts,
                 "text": "buy now today\nbuy now today\nbuy now today\n"
                         "buy now today\nthe only unique line here"})
    # PII page
    recs.append({"url": "https://pii.example/contact", "warc_ts": ts,
                 "text": f"{good} contact reach me at boss@corp.example "
                         "or +44 20 7946 0958"})
    wet_dir = str(tmp_path / "wet")
    os.makedirs(wet_dir)
    with open(os.path.join(wet_dir, "crawl-0.wet.gz"), "wb") as fh:
        fh.write(make_wet(recs, compress=True))

    pages = read_wet(spark, wet_dir) \
        .withColumn("status", F.lit("ok")) \
        .withColumn("n_chars", F.length("text").cast("long"))
    enriched = enrich_extracted(pages)
    out = str(tmp_path / "corpus")
    stats = export_training_corpus(
        enriched, out, min_tokens=5, max_dup_line_fraction=0.5,
        scrub_pii=True, split_weights={"train": 0.8, "val": 0.2})

    lines = []
    for d in glob.glob(out + "/split=*"):
        for f in glob.glob(d + "/*.txt.gz"):
            lines += gzip.open(f, "rt").read().splitlines()
    rows = [json.loads(line) for line in lines]
    urls = {r["url"] for r in rows}

    # 9 kept: 7 unique originals + ONE of the content-dup pair
    # (canonical = min url, which is the mirror) + the pii page;
    # dropped: the dup pair's non-canonical member and the spam doc
    assert len(rows) == 9
    assert stats == {"kept": 9, "dropped": 2,
                     "splits": stats["splits"]}
    dup_pair = {"https://mirror.example/copy",
                "https://site.example/page/3"}
    assert len(urls & dup_pair) == 1
    assert "https://spam.example/buy" not in urls
    # PII scrubbed in the exported text
    pii_row = next(r for r in rows
                   if r["url"] == "https://pii.example/contact")
    assert "<EMAIL>" in pii_row["text"]
    assert "boss@corp.example" not in pii_row["text"]
    assert "<PHONE>" in pii_row["text"]
    # split tags present and consistent with stats
    assert sum(stats["splits"].values()) == 9
    assert all(r["split"] in ("train", "val") for r in rows)
