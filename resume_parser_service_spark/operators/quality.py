"""Repetition-based quality signals (Gopher / RefinedWeb-style rules).

The catalog's ``quality_score`` covers ratio heuristics (length, punct,
stopwords). The published web-corpus filters add REPETITION signals —
boilerplate and spam pages repeat themselves:

- ``dup_line_fraction``: fraction of lines that are duplicates of an
  earlier line (Gopher drops docs > 0.30),
- ``top_bigram_fraction``: share of tokens covered by the single most
  frequent bigram (Gopher drops docs > 0.18),
- ``dup_bigram_fraction``: fraction of bigram occurrences that are
  repeats.

All three are per-document aggregations over exploded lines/bigrams —
partial-aggregated map-side, shuffled only on doc_id, oracle-checkable
in DuckDB from the same builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import _tokens, register_views

__all__ = ["repetition_signals_sql", "repetition_signals"]


def repetition_signals_sql(dialect: str, table: str = "documents") -> str:
    toks = _tokens("text", dialect)
    if dialect == "spark":
        lines = "explode(split(text, '\\n'))"
        bigrams = ("explode(CASE WHEN size(toks) >= 2 THEN "
                   "transform(sequence(0, size(toks) - 2), "
                   "i -> concat_ws(' ', slice(toks, i + 1, 2))) "
                   "ELSE array() END)")
    else:
        lines = "unnest(string_split(text, chr(10)))"
        bigrams = ("unnest(list_transform("
                   "generate_series(1, greatest(len(toks) - 1, 0)), "
                   "i -> array_to_string(toks[i:i+1], ' ')))")
    return f"""
WITH lines AS (
  SELECT doc_id, {lines} AS line FROM {table}
),
line_stats AS (
  SELECT doc_id,
         count(*) AS n_lines,
         count(DISTINCT line) AS n_uniq_lines
  FROM lines GROUP BY doc_id
),
bg AS (
  SELECT doc_id, {bigrams} AS bigram
  FROM (SELECT doc_id, {toks} AS toks FROM {table})
),
bg_counts AS (
  SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
),
bg_stats AS (
  SELECT doc_id,
         sum(c) AS n_bigrams,
         max(c) AS top_bigram_c,
         sum(c) - count(*) AS dup_bigrams
  FROM bg_counts GROUP BY doc_id
)
SELECT l.doc_id,
       round(cast(l.n_lines - l.n_uniq_lines as double)
             / l.n_lines, 6) AS dup_line_fraction,
       round(cast(coalesce(b.top_bigram_c, 0) as double)
             / greatest(coalesce(b.n_bigrams, 0), 1), 6)
         AS top_bigram_fraction,
       round(cast(coalesce(b.dup_bigrams, 0) as double)
             / greatest(coalesce(b.n_bigrams, 0), 1), 6)
         AS dup_bigram_fraction
FROM line_stats l LEFT JOIN bg_stats b ON l.doc_id = b.doc_id
ORDER BY l.doc_id
"""


def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(repetition_signals_sql("spark"))
