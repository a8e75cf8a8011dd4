"""Vectorized-UDF-surface operators with SQL oracles.

Demonstrates every Python execution surface the engine uses (scalar
Arrow ``pandas_udf``, grouped-map ``applyInPandas``; ``mapInPandas`` is
covered by extract_queries) with semantics a DuckDB oracle can verify —
so the driver checks not just the answer but that the Arrow plumbing
computes exactly what the SQL says.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .catalog import register_views

__all__ = ["udf_queries", "udf_oracles"]


def _ws_token_count_udf():
    """Scalar Arrow UDF: whitespace token count (series -> series).
    Built lazily — pandas_udf return-type parsing needs a live session."""
    @pandas_udf("int")
    def ws_token_count(texts: pd.Series) -> pd.Series:
        return texts.str.split(" ").str.len().astype("int32")
    return ws_token_count


def _q_pandas_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    udf = _ws_token_count_udf()
    return (spark.table("documents")
            .select("doc_id", udf("text").alias("n_tokens"))
            .orderBy("doc_id"))


_PANDAS_TOKENS_ORACLE = ("SELECT doc_id, len(string_split(text, ' ')) "
                         "AS n_tokens FROM documents ORDER BY doc_id")


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: per-source z-score of n_chars (ddof=1,
    matching SQL stddev_samp — including NULL for singleton groups,
    where stddev_samp is NULL, and NULL for zero-variance groups,
    where the division is NULL in SQL)."""
    mu = pdf["n_chars"].mean()
    sd = pdf["n_chars"].std(ddof=1)
    out = pdf[["doc_id", "source"]].copy()
    if pd.isna(sd) or sd == 0:
        # singleton group: stddev_samp is NULL; zero-variance group:
        # 0/0 division is NULL in both Spark (non-ANSI) and DuckDB
        out["zscore"] = None
    else:
        out["zscore"] = ((pdf["n_chars"] - mu) / sd).round(6)
    return out


def _q_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return (spark.table("documents")
            .groupBy("source")
            .applyInPandas(_zscore_group,
                           schema="doc_id long, source string, zscore double")
            .orderBy("doc_id"))


_ZSCORE_ORACLE = """
SELECT doc_id, source,
       round((n_chars - avg(n_chars) OVER (PARTITION BY source)) /
             stddev_samp(n_chars) OVER (PARTITION BY source), 6) AS zscore
FROM documents ORDER BY doc_id"""


def udf_queries() -> dict:
    return {
        "pandas_udf_token_count": _q_pandas_udf_tokens,
        "grouped_zscore_applyinpandas": _q_grouped_zscore,
    }


def udf_oracles() -> dict:
    return {
        "pandas_udf_token_count": _PANDAS_TOKENS_ORACLE,
        "grouped_zscore_applyinpandas": _ZSCORE_ORACLE,
    }
