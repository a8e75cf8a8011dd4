"""Corpus-unigram language-model scoring (CCNet-style quality signal).

The published web-corpus pipelines (CCNet, RefinedWeb) score documents
with a language model and drop the high-perplexity tail. Without model
libs the deterministic equivalent is the corpus's OWN unigram MLE:
``mean_token_logprob = avg over tokens of ln(count(tok)/N)``. Spam and
boilerplate sit at the extremes — gibberish scores very low (rare
tokens), keyword-stuffed pages suspiciously high (all head tokens).

Scale shape (the 100 TB question): the frequency table is VOCAB-sized,
not corpus-sized — Zipf means a web-scale corpus still has a
broadcastable head vocabulary. The DataFrame builder broadcasts it, so
the per-token join is map-side and the only full shuffle is the vocab
aggregation itself (map-side partial over Zipf-skewed keys — tiny
combiner output). At true web scale, cap the table to the top-K vocab
and give out-of-vocabulary tokens a floor probability; the testdata
vocabulary is small enough to keep exact MLE here.

Cross-engine parity: the SQL pair is emitted from one builder, checked
Spark == DuckDB in tests/test_lm_quantize.py. avg(ln(...)) is summed
in engine-dependent order, so results are rounded to 6 decimals (the
accumulated double error is ~1e-13, far below the rounding quantum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import _tokens, register_views

__all__ = ["unigram_logprob_sql", "unigram_logprob"]


def unigram_logprob_sql(dialect: str, table: str = "documents") -> str:
    toks = _tokens("text", dialect)
    unnest = "explode" if dialect == "spark" else "unnest"
    return f"""
WITH toks AS (
  SELECT doc_id, {unnest}({toks}) AS tok FROM {table}
),
freq AS (
  SELECT tok, cast(count(*) as bigint) AS c FROM toks GROUP BY tok
),
tot AS (SELECT cast(sum(c) as bigint) AS n FROM freq)
SELECT t.doc_id,
       cast(count(*) as bigint) AS n_tokens,
       round(avg(ln(cast(f.c as double) / tot.n)), 6)
         AS mean_token_logprob
FROM toks t JOIN freq f ON t.tok = f.tok CROSS JOIN tot
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame twin of the SQL with the scale intent explicit: the
    vocab table and the 1-row total are broadcast, so the corpus-side
    token stream never shuffles for the join."""
    register_views(spark, sf_dir)
    # tokenizer expression shared with the SQL builder via _tokens, so
    # a tokenizer change can never diverge the twins silently
    toks = spark.table("documents").select(
        "doc_id", F.explode(F.expr(_tokens("text", "spark"))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.agg(F.sum("c").alias("n"))
    return (toks.join(F.broadcast(freq), "tok")
            .crossJoin(F.broadcast(tot))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
                 F.round(F.avg(F.log(F.col("c").cast("double") /
                                     F.col("n"))), 6)
                 .alias("mean_token_logprob"))
            .orderBy("doc_id"))
