"""Benchmark decontamination: flag corpus documents that share an
n-gram with an evaluation set.

The standard LLM-training hygiene step (n-gram collision
decontamination, as published for GPT-3/PaLM-class training runs):
before training, any document containing a long-enough n-gram from a
held-out benchmark is flagged (and usually dropped) so eval numbers
stay meaningful.

Scale shape: the EVAL side is tiny (thousands of documents) next to the
100 TB corpus — its distinct shingle set is broadcast, the corpus side
streams through a map-side hash join, and NO corpus shuffle happens
before the distinct-doc aggregation of the (rare) collisions. The
corpus shingles come from the same zero-shuffle array-slicing builder
as the dedup operators (``catalog._shingle_rel``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import _shingle_rel

__all__ = ["contaminated_docs_sql", "contaminated_docs"]


def contaminated_docs_sql(dialect: str, n: int = 8,
                          table: str = "documents",
                          eval_table: str = "eval_docs") -> str:
    """doc_ids of ``table`` rows sharing any ``n``-gram with
    ``eval_table`` (both need doc_id + text), with the collision count
    as evidence. Emitted for Spark and DuckDB from one builder."""
    return f"""
WITH corpus_sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM ({_shingle_rel(dialect, n=n, table=table)})
),
eval_sh AS (
  SELECT DISTINCT shingle
  FROM ({_shingle_rel(dialect, n=n, table=eval_table)})
)
SELECT c.doc_id,
       cast(count(*) as bigint) AS n_hits
FROM corpus_sh c JOIN eval_sh e ON c.shingle = e.shingle
GROUP BY c.doc_id
ORDER BY c.doc_id
"""


def contaminated_docs(spark: SparkSession, corpus: DataFrame,
                      eval_docs: DataFrame, n: int = 8) -> DataFrame:
    """(doc_id, n_hits) for corpus docs colliding with the eval set.
    The eval shingle set is explicitly broadcast — the corpus never
    shuffles."""
    import uuid

    # unique per call — a reused view name would silently rebind any
    # still-pending returned plan to different data
    c_view = f"_decon_corpus_{uuid.uuid4().hex[:12]}"
    e_view = f"_decon_eval_{uuid.uuid4().hex[:12]}"
    corpus.createOrReplaceTempView(c_view)
    eval_docs.createOrReplaceTempView(e_view)
    corpus_sh = spark.sql(
        f"SELECT DISTINCT doc_id, shingle FROM "
        f"({_shingle_rel('spark', n=n, table=c_view)})")
    eval_sh = spark.sql(
        f"SELECT DISTINCT shingle FROM "
        f"({_shingle_rel('spark', n=n, table=e_view)})")
    return (corpus_sh.join(F.broadcast(eval_sh), "shingle")
            .groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_hits"))
            .orderBy("doc_id"))
