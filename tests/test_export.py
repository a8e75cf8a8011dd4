"""Export sinks: gzip JSONL with canonical resume envelope."""

import glob
import gzip
import json

from resume_parser_service_spark.pipeline.export import (export_resume_jsonl,
                                                         export_text_corpus)
from resume_parser_service_spark.pipeline.extract import extract_pages
from resume_parser_service_spark.sources.pages import build_pages_df


def test_export_jsonl_roundtrip(spark, tmp_path):
    pages = build_pages_df(spark, 30, with_fixtures=False)
    extracted, _ = extract_pages(pages)
    out = str(tmp_path / "resumes_jsonl")
    export_resume_jsonl(extracted, out, partitions=2)

    lines = []
    for f in glob.glob(out + "/*.txt.gz"):
        with gzip.open(f, "rt") as fh:
            lines.extend(fh)
    objs = [json.loads(l) for l in lines]
    assert len(objs) >= 30
    pdf_rows = [o for o in objs
                if o.get("resume", {}).get("personal_information")]
    assert pdf_rows, "resume structs present for PDF docs"
    one = pdf_rows[0]
    assert one["url"].startswith("https://")
    assert len(one["vector"]) == 64
    assert one["resume"]["personal_information"]["email"]

    out2 = str(tmp_path / "corpus")
    export_text_corpus(extracted, out2, min_chars=10)
    lines2 = []
    for f in glob.glob(out2 + "/*.txt.gz"):
        with gzip.open(f, "rt") as fh:
            lines2.extend(fh)
    doc = json.loads(lines2[0])
    assert set(doc) == {"url", "text", "lang", "n_chars"}
    assert doc["n_chars"] >= 10


def test_export_training_corpus(spark, tmp_path):
    """Quality filter + content-dedup + annotation passthrough."""
    import glob
    import gzip
    import json

    from resume_parser_service_spark.pipeline.export import (
        export_training_corpus)
    from resume_parser_service_spark.pipeline.extract import (
        enrich_extracted, extract_pages)
    from resume_parser_service_spark.sources.pages import build_pages_df

    pages = build_pages_df(spark, 40, with_fixtures=False)
    extracted, _ = extract_pages(pages)
    enriched = enrich_extracted(extracted)
    out = str(tmp_path / "corpus")
    stats = export_training_corpus(enriched, out, min_tokens=5)
    assert stats["kept"] > 0
    lines = []
    for f in glob.glob(out + "/*.txt.gz"):
        lines += gzip.open(f, "rt").read().splitlines()
    assert len(lines) == stats["kept"]
    rec = json.loads(lines[0])
    for k in ["url", "text", "lang_guess", "ws_tokens", "fingerprint"]:
        assert k in rec, k
    # content duplicates excluded: fingerprints unique
    fps = [json.loads(l)["fingerprint"] for l in lines]
    assert len(fps) == len(set(fps))


def test_export_training_corpus_splits(spark, tmp_path):
    """Deterministic train/val/test split export: one directory per
    split, rows tagged consistently, per-split counts returned."""
    import glob
    import gzip
    import json

    from resume_parser_service_spark.pipeline.export import (
        export_training_corpus)
    from resume_parser_service_spark.pipeline.extract import (
        enrich_extracted, extract_pages)
    from resume_parser_service_spark.sources.pages import build_pages_df

    pages = build_pages_df(spark, 60, with_fixtures=False)
    extracted, _ = extract_pages(pages)
    enriched = enrich_extracted(extracted)
    out = str(tmp_path / "corpus")
    stats = export_training_corpus(
        enriched, out, min_tokens=5,
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1})
    assert sum(stats["splits"].values()) == stats["kept"]
    assert stats["splits"].get("train", 0) > 0
    seen = 0
    for d in glob.glob(out + "/split=*"):
        split = d.rsplit("=", 1)[1]
        for f in glob.glob(d + "/*.txt.gz"):
            for line in gzip.open(f, "rt").read().splitlines():
                assert json.loads(line)["split"] == split
                seen += 1
    assert seen == stats["kept"]

    # stability: exporting the same frame again lands every url in the
    # same split (pure function of url hash)
    stats2 = export_training_corpus(
        enriched, str(tmp_path / "corpus2"), min_tokens=5,
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1})
    assert stats2["splits"] == stats["splits"]


def test_export_training_corpus_pii_scrub(spark, tmp_path):
    """scrub_pii=True: exported text carries placeholders, committed
    rows keep original bytes."""
    import glob
    import gzip
    import json

    from resume_parser_service_spark.pipeline.export import (
        export_training_corpus)
    from resume_parser_service_spark.pipeline.extract import (
        enrich_extracted, extract_pages)
    from resume_parser_service_spark.sources.pages import build_pages_df
    from pyspark.sql import functions as F

    pages = build_pages_df(spark, 20, with_fixtures=False)
    # plant an email into one page's html body text
    pages = pages.withColumn(
        "html",
        F.when(F.col("url").endswith("/doc/3"),
               F.to_binary(F.concat(
                   F.regexp_replace(F.col("html").cast("string"),
                                    "</body>",
                                    "<p>contact me: jane@example.com "
                                    "or +353 87 123 4567</p></body>")),
                   F.lit("utf-8")))
        .otherwise(F.col("html")))
    extracted, _ = extract_pages(pages)
    enriched = enrich_extracted(extracted)
    out = str(tmp_path / "scrubbed")
    export_training_corpus(enriched, out, min_tokens=5, scrub_pii=True)
    lines = []
    for f in glob.glob(out + "/*.txt.gz"):
        lines += gzip.open(f, "rt").read().splitlines()
    blob = "\n".join(lines)
    assert "<EMAIL>" in blob and "jane@example.com" not in blob
    assert "<PHONE>" in blob
    # committed (pre-export) rows keep the original bytes
    assert enriched.filter(
        F.col("text").contains("jane@example.com")).count() == 1


def test_enrich_repetition_matches_quality_module(spark):
    """The per-row dup_line/dup_bigram expressions in enrich_extracted
    compute the same values as operators.quality's grouped SQL."""
    from pyspark.sql import functions as F

    from resume_parser_service_spark.operators import quality
    from resume_parser_service_spark.pipeline.extract import (
        enrich_extracted)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # masquerade documents as extracted rows (enrich only needs url+text)
    fake = docs.select(F.concat(F.lit("u://"), F.col("doc_id")).alias("url"),
                       "text")
    enr = enrich_extracted(fake).select(
        F.expr("cast(substring(url, 5) as long)").alias("doc_id"),
        "dup_line_fraction", "dup_bigram_fraction")
    docs.createOrReplaceTempView("_rep_docs")
    ref = spark.sql(quality.repetition_signals_sql(
        "spark", table="_rep_docs")).select(
        "doc_id", "dup_line_fraction", "dup_bigram_fraction")
    diff = enr.join(ref, "doc_id") \
        .filter((enr.dup_line_fraction != ref.dup_line_fraction) |
                (enr.dup_bigram_fraction != ref.dup_bigram_fraction))
    assert diff.count() == 0


def test_export_training_corpus_span_scrub(spark, tmp_path):
    """scrub_repeated_spans=True: cross-document boilerplate spans are
    removed from the exported text (committed bytes untouched), with
    the dropped-token count carried in the JSONL."""
    import gzip
    import glob
    import json

    from pyspark.sql import functions as F

    from resume_parser_service_spark.pipeline.extract import (
        enrich_extracted)

    boiler = ("all rights reserved this page is copyright of the example "
              "corporation and may not be reproduced without permission")
    docs = spark.createDataFrame(
        [(f"https://e.x/{i}",
          f"unique document number {i} body text here " * 3 + boiler)
         for i in range(4)] +
        [("https://e.x/solo", "completely unshared content " * 10),
         ("https://e.x/allboiler", boiler)],
        "url string, text string") \
        .withColumn("status", F.lit("ok")) \
        .withColumn("lang", F.lit("en")) \
        .withColumn("n_chars", F.length("text").cast("long"))
    enriched = enrich_extracted(docs)
    out = str(tmp_path / "corpus")
    from resume_parser_service_spark.pipeline.export import (
        export_training_corpus)
    stats = export_training_corpus(enriched, out, min_tokens=5,
                                   drop_content_dups=False,
                                   scrub_repeated_spans=True)
    # the boiler-only page shrinks below the floor and LEAVES the
    # corpus (no empty-text JSONL rows)
    assert stats["kept"] == 5
    rows = []
    for f in glob.glob(out + "/*.txt.gz") + glob.glob(out + "/*.gz"):
        with gzip.open(f, "rt") as fh:
            rows += [json.loads(line) for line in fh]
    by_url = {r["url"]: r for r in rows}
    for i in range(4):
        r = by_url[f"https://e.x/{i}"]
        assert "all rights reserved" not in r["text"]
        assert f"unique document number {i}" in r["text"]
        assert r["n_dropped_tokens"] >= 16
    assert by_url["https://e.x/solo"]["n_dropped_tokens"] == 0
    assert "unshared" in by_url["https://e.x/solo"]["text"]
    assert "https://e.x/allboiler" not in by_url
    assert all(r["text"].strip() for r in rows)
