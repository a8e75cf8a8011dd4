"""The extraction dataflow: pages -> (extracted, audit).

Plan shape (SURVEY.md §3.1 rebuild):

    scan(pages)
      -> latest-wins dedup per url           (window row_number, B5 semantics)
      -> cheap validation predicates         (BEFORE the opaque Python stage —
                                              Catalyst cannot push filters
                                              through mapInPandas)
      -> salted repartition by xxhash64(url) (north rule skew defense)
      -> mapInPandas(extraction kernel)      (one Arrow crossing per batch)
      -> extracted rows; audit rows split off

Validation mirrors the reference's upload gate: 10 MB cap and magic-byte
sniff (/root/reference/app/routers/resume_ingestor_router.py:26-28,
102-110); rejects become audit rows with an error taxonomy mirroring
/root/reference/app/core/exceptions.py class names instead of HTTP 400s.
"""

from __future__ import annotations

import time
from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..kernels import embed, html_text, pdf_text, resume_map
from ..schema import EXTRACT_SCHEMA, MAX_FILE_SIZE, canonical_resume_json

__all__ = ["dedup_latest", "validate_pages", "extract_pages",
           "PIPELINE_KERNEL_VERSION"]

PIPELINE_KERNEL_VERSION = "+".join([pdf_text.KERNEL_VERSION,
                                    html_text.KERNEL_VERSION,
                                    resume_map.KERNEL_VERSION,
                                    embed.KERNEL_VERSION])

_SALT = 0x5EED


def dedup_latest(pages: DataFrame) -> DataFrame:
    """One row per url, latest ``warc_ts`` wins — the replace-on-key
    upsert semantics of /root/reference/app/services/resume_service.py:
    106-182 expressed as a window dedup (SURVEY.md B5)."""
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc())
    return (pages.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def validate_pages(pages: DataFrame) -> DataFrame:
    """Attach ``doc_type`` / pre-kernel rejection columns. Pure JVM-side
    expressions (whole-stage codegen); no Python involved."""
    magic4 = F.expr("substring(html, 1, 4)")
    head64 = F.lower(F.expr("cast(substring(html, 1, 64) as string)"))
    is_pdf = magic4 == F.lit(b"%PDF")
    is_html = (F.expr("substring(html, 1, 1)") == F.lit(b"<")) | \
        head64.contains("<html") | head64.contains("<!doctype")
    doc_type = (F.when(is_pdf, F.lit("pdf"))
                 .when(is_html, F.lit("html"))
                 .otherwise(F.lit("invalid")))
    oversize = F.length(F.col("html")) > MAX_FILE_SIZE
    reject = (F.when(oversize, F.lit("FileSizeLimitExceededError"))
               .when(doc_type == "invalid", F.lit("InvalidFileTypeError")))
    return pages.withColumn("doc_type", doc_type) \
                .withColumn("reject_class", reject)


def _kernel(batches: Iterator) -> Iterator:
    """Arrow-batched extraction kernel. Row errors become status='error'
    rows (taxonomy per /root/reference/app/core/exceptions.py), never
    task failures — Spark task retry handles infra faults (A12)."""
    import pandas as pd

    for pdf in batches:
        rows = []
        for url, warc_ts, html, lang, doc_type in zip(
                pdf["url"], pdf["warc_ts"], pdf["html"], pdf["lang"],
                pdf["doc_type"]):
            t0 = time.perf_counter()
            status, err, text, links, n_pages = "ok", None, "", [], 0
            resume_json, flat_text, vector = None, None, None
            try:
                data = bytes(html)
                if doc_type == "pdf":
                    res = pdf_text.extract_pdf(data)
                else:
                    res = html_text.extract_html(data)
                text, links, n_pages = res["text"], res["links"], res["n_pages"]
                resume = resume_map.map_resume(text, links)
                resume_json = canonical_resume_json(resume)
                flat_text = resume_map.resume_to_text(resume)
                vector = embed.embed_text(flat_text)
            except pdf_text.PdfError:
                status, err = "error", "FileProcessingError"
            except Exception:
                status, err = "error", "ResumeParsingError"
            rows.append({
                "url": url, "warc_ts": warc_ts, "lang": lang,
                "doc_type": doc_type, "status": status, "error_class": err,
                "text": text, "links": links, "resume_json": resume_json,
                "flat_text": flat_text, "vector": vector,
                "n_pages": int(n_pages), "n_chars": len(text),
                "n_links": len(links),
                "extract_ms": (time.perf_counter() - t0) * 1000.0,
                "kernel_version": PIPELINE_KERNEL_VERSION,
            })
        yield pd.DataFrame(rows, columns=[f.name for f in EXTRACT_SCHEMA])


def extract_pages(pages: DataFrame, salt_partitions: int | None = None,
                  dedup: bool = True) -> tuple[DataFrame, DataFrame]:
    """Run the extraction pipeline. Returns ``(extracted, rejected)`` —
    ``extracted`` in EXTRACT_SCHEMA (incl. per-row kernel errors),
    ``rejected`` holds pre-kernel validation rejects."""
    v = validate_pages(dedup_latest(pages) if dedup else pages)
    ok = v.filter(F.col("reject_class").isNull())
    rejected = (v.filter(F.col("reject_class").isNotNull())
                .select("url", "warc_ts", "lang", "doc_type",
                        F.lit("rejected").alias("status"),
                        F.col("reject_class").alias("error_class"),
                        F.length("html").alias("n_bytes")))
    if salt_partitions:
        # salted repartition: spreads url-hash uniformly so one hot
        # domain / size-skewed partition cannot straggle (north rule)
        ok = ok.repartition(salt_partitions,
                            F.xxhash64(F.col("url"), F.lit(_SALT)))
    extracted = ok.select("url", "warc_ts", "html", "lang", "doc_type") \
                  .mapInPandas(_kernel, schema=EXTRACT_SCHEMA)
    return extracted, rejected
