"""10x growth-curve probe for the heavy pairwise/iterative queries.

The 100 TB arguments for `dedup_clusters`, `embedding_neardup_pairs`,
`ngram_jaccard_pairs`, `repeated_spans`, and `ivf_topk_indexed` were
plan-shape arguments at sf0.1 (r4 verdict item 2). This tool measures
the actual growth: each query runs INTERLEAVED at sf0.1 (5k docs / 2k
vectors) and at a synthetic 10x corpus (50k docs / 20k vectors), and
the report shows wall ratio vs the 10x data ratio, plus
rounds-to-converge for the connected-components fixpoint.

The 10x corpus is sf0.1 tiled 10 times by ISOMORPHIC RELABELING — a
construction that scales the workload without distorting it:

- documents: copy k>0 suffixes every token with "_k". A suffix map is
  a bijection into a DISJOINT per-copy vocabulary, so every
  within-copy similarity (shingle Jaccard, MinHash bands, shingle
  document frequencies vs the df cap) is EXACTLY sf0.1's, and
  cross-copy shingle overlap is ZERO — candidate pairs grow exactly
  linearly. (A first attempt rotated tokens within the SHARED 31-token
  vocab; with 50-token docs over 31 shared tokens, cross-copy n-gram
  collisions made pairs grow ~7x above linear and walls tracked the
  pair blowup — that measured the data construction, not the plan.)
- embeddings: copy k multiplies dim i by a hash-derived +-1 sign
  (copy 0 untouched). A diagonal +-1 matrix is orthogonal, so
  within-copy cosines are exactly preserved; the featurizer vectors
  are all-positive (count-like, pairwise-cosine-biased-high), and
  random half-negation kills cross-copy cosines to ~0 — unlike a
  cyclic shift, which left shifted count vectors correlated and made
  pairs grow ~11x above linear.

Usage: python tools/sf_scale_probe.py [reps=3]
Writes BENCH/sf_scale_probe.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF01 = "/root/testdata/sf0.1"
COPIES = 10


def build_sfx10(spark, cache_root: str, n_copies: int = COPIES,
                name: str = "sfx10") -> str:
    from pyspark.sql import functions as F
    root = os.path.join(cache_root, name)
    docs_path = os.path.join(root, "documents.parquet")
    emb_path = os.path.join(root, "embeddings.parquet")
    if not os.path.exists(os.path.join(emb_path, "_SUCCESS")):
        docs = spark.read.parquet(f"{SF01}/documents.parquet")
        n_docs = docs.count()
        copies = spark.range(n_copies).select(F.col("id").alias("k"))
        big = (docs.crossJoin(copies)
               .select(
                   (F.col("doc_id") + F.col("k") * n_docs)
                   .alias("doc_id"),
                   F.expr(
                       "CASE WHEN k = 0 THEN text ELSE "
                       "array_join(transform(split(text, ' '), t -> "
                       "concat(t, '_', cast(k as string))), ' ') "
                       "END").alias("text"),
                   "lang",
                   F.concat(F.col("source"), F.lit("_c"),
                            F.col("k")).alias("source"))
               .withColumn("n_chars", F.length("text")))
        big.repartition(32).write.mode("overwrite").parquet(docs_path)
        emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
        n_vecs = emb.count()
        bige = (emb.crossJoin(copies)
                .select(
                    (F.col("vec_id") + F.col("k") * n_vecs)
                    .alias("vec_id"),
                    F.expr(
                        "CASE WHEN k = 0 THEN embedding ELSE "
                        "zip_with(embedding, sequence(0, 63), (x, i) -> "
                        "CASE WHEN cast(conv(substring(md5(concat("
                        "cast(k as string), '#', cast(i as string))), "
                        "1, 15), 16, 10) as bigint) % 2 = 0 "
                        "THEN x ELSE -x END) END").alias("embedding"),
                    "label"))
        bige.repartition(8).write.mode("overwrite").parquet(emb_path)
    return root


def build_planted(spark, cache_root: str, src: str, name: str,
                  every: int = 20) -> str:
    """Embeddings corpus WITH true near-dup structure: every
    ``every``-th vector gets a planted partner (multiplicative 10%
    hash-sign jitter -> cosine ~0.995). The base tables have NO pairs
    above 0.7 at any scale (measured), so the high-threshold scale
    regime needs planted positives to have anything to find."""
    from pyspark.sql import functions as F
    root = os.path.join(cache_root, name)
    path = os.path.join(root, "embeddings.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        emb = spark.read.parquet(f"{src}/embeddings.parquet")
        partners = (emb.filter(F.col("vec_id") % every == 0)
                    .select(
                        (F.col("vec_id") + 10_000_000).alias("vec_id"),
                        F.expr(
                            "zip_with(embedding, sequence(0, 63), "
                            "(x, i) -> x * (1.0 + 0.1 * (CASE WHEN "
                            "cast(conv(substring(md5(concat('j#', "
                            "cast(vec_id as string), '#', "
                            "cast(i as string))), 1, 15), 16, 10) "
                            "as bigint) % 2 = 0 THEN 1 ELSE -1 END)))"
                        ).alias("embedding"),
                        "label"))
        emb.unionByName(partners).repartition(8) \
            .write.mode("overwrite").parquet(path)
    return root


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from resume_parser_service_spark.operators import cluster, ivf, spans
    from resume_parser_service_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="rps-scale-probe", cores=32,
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.abspath(__file__))
    cache_root = os.path.join(here, "..", ".bench_cache")
    big = build_sfx10(spark, cache_root)

    qs = entrymod.queries()
    # (name, callable) — callable(sf_dir) -> DataFrame; ivf uses the
    # prebuilt per-dir index (built untimed, like bench.py)
    idxs = {}
    for sf in (SF01, big):
        d = os.path.join(cache_root, "scale_ivf",
                         os.path.basename(sf.rstrip("/")))
        if not os.path.exists(os.path.join(d, "centroids")):
            ivf.build_ivf_index(spark, sf, d, n_cells=16)
        q = (spark.read.parquet(f"{sf}/embeddings.parquet")
             .filter("vec_id < 3")
             .selectExpr("vec_id AS query_id",
                         "cast(embedding AS array<double>) AS qvec")
             .collect())
        idxs[sf] = (d, spark.createDataFrame(
            [(r.query_id, list(r.qvec)) for r in q],
            "query_id bigint, qvec array<double>"))

    probes = {
        "dedup_clusters": lambda sf: qs["dedup_clusters"](spark, sf),
        "embedding_neardup_pairs":
            lambda sf: qs["embedding_neardup_pairs"](spark, sf),
        "ngram_jaccard_pairs":
            lambda sf: qs["ngram_jaccard_pairs"](spark, sf),
        "repeated_spans": lambda sf: spans.repeated_spans(spark, sf),
        "ivf_topk_indexed":
            lambda sf: ivf.ivf_topk_indexed(spark, idxs[sf][0],
                                            idxs[sf][1], k=5, nprobe=4),
    }

    # scale-regime embedding near-dup: 4 x 16-bit bands (65,536
    # buckets/band — occupancy stays O(1) into the millions of
    # vectors, so candidates grow ~linearly) at a true near-dup
    # threshold (0.8), over corpora with planted positives. The
    # driver-contract query above keeps its small-sf harness
    # parameters (4 x 4-bit bands, threshold 0.45) — at fixed 64-cell
    # bucket space its candidate set grows O(N^2), which is exactly
    # what its growth row measures (see BENCH/BASELINE.md r5).
    import re as _re

    from resume_parser_service_spark.operators.catalog import (
        _cosine_pairs_sql)
    planted = {
        SF01: build_planted(spark, cache_root, SF01, "scale_emb_small"),
        big: build_planted(spark, cache_root, big, "scale_emb_big"),
    }
    scale_sql = _cosine_pairs_sql("spark", threshold=0.8, n_planes=64,
                                  band_size=16)

    def neardup_scale(sf):
        spark.read.parquet(f"{planted[sf]}/embeddings.parquet") \
            .createOrReplaceTempView("scale_emb_probe")
        return spark.sql(_re.sub(r"\bembeddings\b", "scale_emb_probe",
                                 scale_sql))

    probes["embedding_neardup_scale"] = neardup_scale

    out: dict = {"copies": COPIES, "reps": reps,
                 "load_avg_start": round(os.getloadavg()[0], 2),
                 "queries": {}}
    for name, fn in probes.items():
        walls = {SF01: [], big: []}
        extra = {SF01: {}, big: {}}
        # one untimed warm-up pair, then interleaved timed pairs
        for rep in range(reps + 1):
            for sf in (SF01, big):
                t0 = time.perf_counter()
                n = fn(sf).count()
                w = time.perf_counter() - t0
                if rep:
                    walls[sf].append(w)
                extra[sf]["rows"] = n
                if name == "dedup_clusters":
                    extra[sf].setdefault("rounds", []).append(
                        cluster.LAST_ROUNDS)
        med = {sf: round(sorted(w)[len(w) // 2], 3)
               for sf, w in walls.items()}
        rec = {"sf01_sec": med[SF01], "x10_sec": med[big],
               "growth": (round(med[big] / med[SF01], 2)
                          if med[SF01] else None),
               "sf01_rows": extra[SF01]["rows"],
               "x10_rows": extra[big]["rows"]}
        if name == "dedup_clusters":
            rec["sf01_rounds"] = extra[SF01]["rounds"][-1]
            rec["x10_rounds"] = extra[big]["rounds"][-1]
        out["queries"][name] = rec
        print(f"{name}: {rec}", flush=True)

    dest = os.path.join(here, "..", "BENCH", "sf_scale_probe.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\nwrote {dest}")
    print("| query | sf0.1 s | 10x s | wall growth | rows sf0.1 | "
          "rows 10x |")
    print("|---|---|---|---|---|---|")
    for name, r in out["queries"].items():
        print(f"| {name} | {r['sf01_sec']} | {r['x10_sec']} | "
              f"{r['growth']}x | {r['sf01_rows']} | {r['x10_rows']} |")
    spark.stop()


if __name__ == "__main__":
    main()
