"""Export sinks for the extracted table.

``export_resume_jsonl`` writes the canonical single-line resume JSON
per url — the batch equivalent of the reference's API response body
(/root/reference/app/routers/resume_ingestor_router.py:283-330 returns
the validated resume JSON). Envelope fields mirror the service's GET
shape: url key + resume + vector. Output is gzip-compressed text,
one JSON object per line (the interchange format downstream training
pipelines consume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["export_resume_jsonl", "export_text_corpus",
           "export_training_corpus"]


def export_resume_jsonl(extracted: DataFrame, path: str,
                        partitions: int | None = None) -> None:
    """One gzip JSONL line per ok row:
    ``{"url": ..., "resume": {...}, "vector": [...]}`` — built with
    to_json/struct (JVM-side), no Python in the plan."""
    from ..schema import RESUME_SCHEMA
    rows = (extracted.filter(F.col("status") == "ok")
            .select(F.to_json(F.struct(
                F.col("url"),
                F.from_json("resume_json", RESUME_SCHEMA).alias("resume"),
                F.col("vector"))).alias("value")))
    if partitions:
        rows = rows.repartition(partitions)
    rows.write.mode("overwrite").option("compression", "gzip").text(path)


def export_training_corpus(enriched: DataFrame, path: str,
                           min_tokens: int = 10,
                           max_punct_ratio: float = 0.3,
                           min_stopword_ratio: float = 0.0,
                           max_dup_line_fraction: float = 1.0,
                           drop_content_dups: bool = True,
                           partitions: int | None = None,
                           split_weights: dict[str, float] | None = None,
                           scrub_pii: bool = False,
                           scrub_repeated_spans: bool = False,
                           span_min_df: int = 2) -> dict:
    """Quality-filtered, content-deduplicated training corpus export
    over an ``enrich_extracted`` frame — the standard LLM-data shape:
    drop non-canonical content duplicates, too-short docs, and
    punctuation-noise pages; keep the annotations in the JSONL so
    downstream mixers can re-threshold without re-extraction. Returns
    {"kept", "dropped"} counts (both counts and the writer read the
    persisted frames — the enrich lineage executes once).

    ``split_weights`` (e.g. ``{"train": .9, "val": .05, "test": .05}``)
    additionally tags each row with a deterministic url-hash split
    (operators.sampling semantics: disjoint, exhaustive, stable under
    corpus growth) and writes one directory per split
    (``split=train/``...); per-split counts are added to the stats.
    ``scrub_pii=True`` replaces emails/phones/IPv4 in the exported text
    with placeholder tokens (the committed table keeps original bytes).
    ``scrub_repeated_spans=True`` removes cross-document repeated spans
    (operators.spans exact-substring dedup; ``span_min_df`` documents
    must share a 16-gram) from the exported text, adding a
    ``n_dropped_tokens`` column to the JSONL."""
    base = enriched.filter(F.col("status") == "ok")
    keep = base.filter(
        (F.col("ws_tokens") >= min_tokens) &
        (F.coalesce(F.col("punct_ratio"), F.lit(0.0)) <= max_punct_ratio) &
        (F.coalesce(F.col("stopword_ratio"), F.lit(1.0))
         >= min_stopword_ratio))
    if max_dup_line_fraction < 1.0:
        if "dup_line_fraction" not in keep.columns:
            # refuse to silently skip a gate the caller asked for
            raise ValueError(
                "max_dup_line_fraction requires the dup_line_fraction "
                "column (run the frame through enrich_extracted, or "
                "re-ingest pre-enrich rows with enrich=True)")
        # Gopher-style repetition gate (enrich_extracted annotation)
        keep = keep.filter(F.coalesce(F.col("dup_line_fraction"),
                                      F.lit(0.0)) <= max_dup_line_fraction)
    if drop_content_dups:
        keep = keep.filter(F.col("content_dup_of").isNull())
    if split_weights:
        from ..operators.sampling import split_case_expr
        keep = keep.withColumn(
            "split", F.expr(split_case_expr("spark", "url", split_weights)))
    # persist BOTH frames BEFORE the scrubs: n_total on an unpersisted
    # `base` would re-execute the entire enrich lineage (window shuffle
    # included) a second time, and the span scrub's detection SQL
    # traverses its input three times (pos_sh twice + the outer join
    # side) — all of it must hit this cache
    base = base.persist()
    keep = keep.persist()
    handles = [base, keep]
    if scrub_repeated_spans:
        # cross-document repeated spans (operators.spans, the
        # exact-substring dedup family) removed from the exported text
        # only — the committed table keeps original bytes. Runs BEFORE
        # the PII scrub so span hashes see the original tokens. The
        # kept annotations (ws_tokens etc.) describe the pre-removal
        # text; the token floor is re-applied to the REBUILT text so a
        # document that was mostly boilerplate leaves the corpus
        # instead of exporting as a near-empty row (Lee et al. drop
        # shrunken docs).
        from ..operators.spans import drop_repeated_spans
        keep = (drop_repeated_spans(keep, min_df=span_min_df,
                                    id_col="url")
                .withColumn("text", F.col("clean_text"))
                .drop("clean_text")
                .filter(F.size(F.split("text", " ")) >= min_tokens)
                .persist())
        handles.append(keep)
    if scrub_pii:
        # emails/phones/IPv4 -> placeholders (operators.pii), applied to
        # the exported text only — the committed table keeps the
        # original bytes (byte-identity contract)
        from ..operators.pii import scrub_pii_col
        keep = keep.withColumn("text", scrub_pii_col("text"))
    try:
        n_keep = keep.count()
        n_total = base.count()
        cols = ["url", "text", "lang", "lang_guess", "n_chars", "ws_tokens",
                "bpe_est_tokens", "stopword_ratio", "punct_ratio",
                "fingerprint"] \
            + (["n_dropped_tokens"] if scrub_repeated_spans else []) \
            + (["split"] if split_weights else [])
        rows = keep.select(
            F.to_json(F.struct(*cols)).alias("value"),
            *(["split"] if split_weights else []))
        if partitions:
            rows = rows.repartition(partitions)
        writer = rows.write.mode("overwrite").option("compression", "gzip")
        stats = {"kept": n_keep, "dropped": n_total - n_keep}
        if split_weights:
            writer.partitionBy("split").text(path)
            stats["splits"] = {r["split"]: r["count"] for r in
                               keep.groupBy("split").count().collect()}
        else:
            writer.text(path)
    finally:
        for h in handles:
            h.unpersist()
    return stats


def export_text_corpus(extracted: DataFrame, path: str,
                       min_chars: int = 1,
                       partitions: int | None = None) -> None:
    """Plain extracted-text corpus (training-data shape): one JSON line
    per document with url, text, lang, n_chars."""
    rows = (extracted.filter((F.col("status") == "ok") &
                             (F.col("n_chars") >= min_chars))
            .select(F.to_json(F.struct("url", "text", "lang", "n_chars"))
                    .alias("value")))
    if partitions:
        rows = rows.repartition(partitions)
    rows.write.mode("overwrite").option("compression", "gzip").text(path)
