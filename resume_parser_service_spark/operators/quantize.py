"""Int8 embedding quantization — the memory side of ANN at scale.

At 10^9+ vectors the ANN working set is memory-bound: float32 x 64
dims = 256 B/vector, int8 = 64 B (+4 B scale). Symmetric per-vector
quantization (q = round(x / scale), scale = max|x| / 127) keeps cosine
ranking nearly intact: dot(a, b) ~= scale_a * scale_b * dot(qa, qb),
and the int dot runs on a quarter of the bytes. This is the standard
faiss/SQ8 recipe expressed as pure JVM array expressions — a per-row
map, zero shuffle, no UDF.

Cross-engine parity: the SQL pair comes from one builder (Spark
``transform``/``array_max`` == DuckDB ``list_transform``/``list_max``),
checked in tests/test_lm_quantize.py, which also pins the recall
contract: int8-scored brute-force top-k recovers >= 0.9 of the exact
top-k on the driver testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register_views

__all__ = ["quantize_sql", "quantize_embeddings", "ann_topk_int8"]


def quantize_sql(dialect: str, table: str = "embeddings",
                 as_csv: bool = False) -> str:
    """``as_csv=True`` projects the int8 vector as a comma-joined
    string instead of an array — the driver's value-hash compares
    scalarized columns, same convention as collect_sources_per_lang."""
    # zero-scale guard: an all-zero embedding (padding / failed encode)
    # must quantize to all zeros, not divide to NULLs
    if dialect == "spark":
        scale = ("array_max(transform(embedding, "
                 "x -> abs(cast(x as double)))) / 127")
        q = ("CASE WHEN scale = 0 THEN transform(embedding, x -> 0) "
             "ELSE transform(embedding, "
             "x -> cast(round(cast(x as double) / scale) as int)) END")
    else:
        scale = ("list_max(list_transform(embedding, "
                 "x -> abs(cast(x as double)))) / 127")
        q = ("CASE WHEN scale = 0 THEN "
             "list_transform(embedding, x -> 0) "
             "ELSE list_transform(embedding, "
             "x -> cast(round(cast(x as double) / scale) as int)) END")
    agg = ("aggregate(q, cast(0 as bigint), (acc, v) -> acc + abs(v))"
           if dialect == "spark" else
           "list_sum(list_transform(q, v -> cast(abs(v) as bigint)))")
    if as_csv:
        q_out = ("concat_ws(',', transform(q, x -> cast(x as string)))"
                 if dialect == "spark" else
                 "array_to_string(q, ',')") + " AS q_csv"
    else:
        q_out = "q"
    return f"""
WITH scaled AS (
  SELECT vec_id, {scale} AS scale, embedding FROM {table}
),
quant AS (
  SELECT vec_id, round(scale, 9) AS scale, {q} AS q FROM scaled
)
SELECT vec_id, scale, {q_out},
       cast({agg} as bigint) AS l1_int
FROM quant ORDER BY vec_id
"""


def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(quantize_sql("spark"))


def ann_topk_int8(spark: SparkSession, sf_dir: str, n_queries: int = 3,
                  k: int = 5) -> DataFrame:
    """Brute-force cosine top-k over the QUANTIZED vectors: integer
    dot x scale_a x scale_b, norms from the dequantized arrays. Same
    shape as ann_topk_bruteforce, a quarter of the scan bytes."""
    register_views(spark, sf_dir)
    quant = spark.sql(quantize_sql("spark")).select("vec_id", "scale", "q")
    queries = (quant.filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("scale").alias("qscale"),
                       F.col("q").alias("qq")))
    from .ivf import _norm
    idot = F.aggregate(
        F.zip_with("qq", "q", lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    scored = (quant.crossJoin(F.broadcast(queries))
              .filter(F.col("vec_id") != F.col("query_id"))
              .withColumn("cos_sim", F.round(
                  idot.cast("double") / (_norm("qq") * _norm("q")), 4)))
    from pyspark.sql.window import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                               F.asc("vec_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    "cos_sim", "rk")
            .orderBy("query_id", "rk"))
