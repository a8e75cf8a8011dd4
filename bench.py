"""Benchmark: headline extraction throughput + query timings.

Runs the flagship extraction pipeline over a deterministic synthetic
``pages`` corpus (materialized once to parquet, FIXTURES.md §1 bench
scale) and times headline catalog queries at $SPARK_GRAFT_SF_DIR.
Prints ONE JSON line:
  {"metric": ..., "value": <extraction wall sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "docs_per_sec": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_N_DOCS (default 20000),
     BENCH_RUNS (default 3), BENCH_QUERY_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE_QUERIES = [
    "pricing_summary", "join_revenue_by_nation", "semi_join_exists",
    "window_rank_per_source", "sessionize_events", "rollup_metrics",
    "explode_top_tokens", "json_extract_props",
    "dedup_exact", "minhash_signatures", "simhash",
    "ngram_jaccard_pairs", "embedding_neardup_pairs", "dedup_clusters",
    "ann_topk_bruteforce", "ann_lsh_buckets", "ivf_topk",
    "band_signatures",
    "token_count", "quality_score", "lang_id_heuristic",
    "extract_html_identity", "extract_pdf_identity",
    "rasterize_pages",  # r4 addition (A3) — see BENCH/BASELINE.md note
]


def ensure_corpus(spark, n_docs: int, cache_root: str) -> str:
    from resume_parser_service_spark.sources.pages import build_pages_df
    path = os.path.join(cache_root, f"pages_n{n_docs}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        # ~500 docs per file: enough files for 3 waves on 32 cores
        # without tiny-file overhead at small corpus sizes
        n_files = max(48, min(512, n_docs // 500))
        build_pages_df(spark, n_docs, partitions=n_files).write \
            .mode("overwrite").parquet(path)
    return path


def ensure_vectors(spark, n_vecs: int, cache_root: str) -> str:
    """Deterministic ``n_vecs`` x 64-dim float vectors (hash-derived,
    seed-free), laid out as an sf-style dir (``embeddings.parquet``) so
    the IVF builder and the catalog SQL run on it unchanged. The ANN
    speedup row needs a corpus big enough that the scale path's scan
    reduction beats stage-scheduling noise — sf0.1's 2k vectors are
    sub-second on both paths (r4 verdict)."""
    from pyspark.sql import functions as F
    root = os.path.join(cache_root, f"ann_n{n_vecs}")
    path = os.path.join(root, "embeddings.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (spark.range(n_vecs).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(0, 63), i -> cast("
                "cast(conv(substring(md5(concat(cast(id as string), '#', "
                "cast(i as string))), 1, 15), 16, 10) as bigint) "
                "% 1001 - 500 as float))").alias("embedding"))
         .repartition(16)
         .write.mode("overwrite").parquet(path))
    return root


def bench_extraction(spark, pages_path: str, partitions: int) -> dict:
    """Time the full kernel dataflow (dedup -> validate -> salted
    repartition -> mapInPandas -> count). Count forces materialization
    without write-side noise."""
    from pyspark.sql import functions as F

    from resume_parser_service_spark.pipeline.extract import extract_pages

    pages = spark.read.parquet(pages_path)
    t0 = time.perf_counter()
    extracted, rejected = extract_pages(pages, salt_partitions=partitions)
    agg = extracted.select(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok"),
        F.sum("n_chars").alias("chars")).collect()[0]
    wall = time.perf_counter() - t0
    return {"n_docs": int(agg["n"]), "n_ok": int(agg["ok"] or 0),
            "n_chars": int(agg["chars"] or 0), "wall_sec": wall,
            "docs_per_sec": round(agg["n"] / wall, 1)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("BENCH_N_DOCS", "20000"))
    n_runs = int(os.environ.get("BENCH_RUNS", "3"))

    from resume_parser_service_spark.session import get_spark
    import __spark_entry__ as entrymod

    _load0 = os.getloadavg()[0]  # host-noise canary for adjudication
    spark = get_spark(app_name="rps-bench", cores=cpus,
                      shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")

    cache_root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_cache")
    pages_path = ensure_corpus(spark, n_docs, cache_root)

    # warm-up (JIT, Arrow, python worker pool), then timed runs
    ext_stats = bench_extraction(spark, pages_path, partitions=cpus * 2)
    runs = [bench_extraction(spark, pages_path, partitions=cpus * 2)
            for _ in range(n_runs)]
    best = sorted(runs, key=lambda r: r["wall_sec"])[len(runs) // 2]

    qs = entrymod.queries()
    q_runs = int(os.environ.get("BENCH_QUERY_RUNS", "3"))
    qtimes: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        fn = qs.get(name)
        if fn is None:
            continue
        walls = []
        for _ in range(q_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            walls.append(time.perf_counter() - t0)
        qtimes[name] = round(sorted(walls)[len(walls) // 2], 3)

    # training-pipeline operators outside the 50-query driver catalog
    # (sampling / split / decontamination) — timed the same way
    from resume_parser_service_spark.operators import (decontaminate,
                                                       sampling)

    def _extra(name, thunk):
        walls = []
        for _ in range(q_runs):
            t0 = time.perf_counter()
            thunk().count()
            walls.append(time.perf_counter() - t0)
        qtimes[name] = round(sorted(walls)[len(walls) // 2], 3)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    eval_docs = docs.filter("doc_id % 97 = 0")
    _extra("sample_fraction",
           lambda: sampling.sample_fraction(spark, sf_dir, 0.05))
    _extra("hash_split", lambda: sampling.hash_split(spark, sf_dir))
    _extra("decontaminate",
           lambda: decontaminate.contaminated_docs(spark, docs, eval_docs))

    from resume_parser_service_spark.operators import (lm_score, quantize,
                                                       spans)
    _extra("unigram_logprob",
           lambda: lm_score.unigram_logprob(spark, sf_dir))
    _extra("quantize_int8",
           lambda: quantize.quantize_embeddings(spark, sf_dir))
    _extra("repeated_spans",
           lambda: spans.repeated_spans(spark, sf_dir))

    # materialized IVF index: build ONCE (untimed, like the corpus
    # materialization above), then time probe-only queries — the
    # production shape; `ivf_topk` above keeps the per-call-training
    # path for cross-round comparability (see BENCH/BASELINE.md note)
    from resume_parser_service_spark.operators import ivf as _ivf
    idx_dir = os.path.join(cache_root, "ivf_index")
    _ivf.build_ivf_index(spark, sf_dir, idx_dir, n_cells=16)
    # query vectors as a LOCAL relation: the probe contract is "index
    # + query vectors in hand", so the per-call parquet fetch of 3
    # rows would be pure bench overhead
    _qrows = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
              .filter("vec_id < 3")
              .selectExpr("vec_id AS query_id", "embedding AS qvec")
              .collect())
    _qdf = spark.createDataFrame(
        [(r.query_id, list(map(float, r.qvec))) for r in _qrows],
        "query_id bigint, qvec array<double>")
    _extra("ivf_topk_indexed",
           lambda: _ivf.ivf_topk_indexed(spark, idx_dir, _qdf, k=5,
                                         nprobe=16))
    _extra("ivf_probe4_indexed",
           lambda: _ivf.ivf_topk_indexed(spark, idx_dir, _qdf, k=5,
                                         nprobe=4))

    # --- ANN scale A/B (r4 verdict item 7): the speedup row is derived
    # from a BENCH_ANN_N-vector datapoint, interleaved brute/probe/
    # buckets per round so a host-load drift hits all three paths
    # alike. Default 400k: the measured crossover scale — at 20k-100k
    # vectors BOTH paths are stage-overhead-bound (~0.4-1.6 s) and
    # brute even "wins"; at 400k brute pays ~9.4 s for the full
    # N x q dot + rank while the cell-pruned probe stays ~1.7 s
    # (speedup 5.6x, measured 2026-08-18). Vector gen and index build
    # are cached in .bench_cache across runs. The sf0.1 rows above
    # stay for cross-round per-query comparability. ---
    import re as _re

    from resume_parser_service_spark.operators.catalog import (
        _ann_topk_sql, _lsh_bucket_sql)
    ann_n = int(os.environ.get("BENCH_ANN_N", "400000"))
    ann_root = ensure_vectors(spark, ann_n, cache_root)
    spark.read.parquet(os.path.join(ann_root, "embeddings.parquet")) \
        .createOrReplaceTempView("bench_ann_vectors")
    brute_sql = _re.sub(r"\bembeddings\b", "bench_ann_vectors",
                        _ann_topk_sql("spark"))
    buckets_sql = _re.sub(r"\bembeddings\b", "bench_ann_vectors",
                          _lsh_bucket_sql("spark"))
    ann_idx = os.path.join(ann_root, "ivf_index")
    # 64 cells at 400k: nprobe=4 scans 1/16 of the corpus (cell-dir
    # partition pruning), ~6k candidate vectors per query
    if not os.path.exists(os.path.join(ann_idx, "centroids")):
        _ivf.build_ivf_index(spark, ann_root, ann_idx, n_cells=64)
    aq = (spark.table("bench_ann_vectors").filter("vec_id < 3")
          .selectExpr("vec_id AS query_id",
                      "cast(embedding AS array<double>) AS qvec")
          .collect())
    aqdf = spark.createDataFrame(
        [(r.query_id, list(r.qvec)) for r in aq],
        "query_id bigint, qvec array<double>")
    ann_walls: dict[str, list[float]] = {"brute": [], "probe": [],
                                         "buckets": []}
    thunks = [("brute", lambda: spark.sql(brute_sql)),
              ("probe", lambda: _ivf.ivf_topk_indexed(
                  spark, ann_idx, aqdf, k=5, nprobe=4)),
              ("buckets", lambda: spark.sql(buckets_sql))]
    for _ in range(q_runs + 1):  # first interleaved round = warm-up
        for key, thunk in thunks:
            t0 = time.perf_counter()
            thunk().count()
            ann_walls[key].append(time.perf_counter() - t0)
    ann = {k: round(sorted(w[1:])[len(w[1:]) // 2], 3)
           for k, w in ann_walls.items()}

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "extraction_pipeline_wall_sec",
        "value": round(best["wall_sec"], 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "docs_per_sec": best["docs_per_sec"],
        "n_docs": best["n_docs"],
        "n_ok": best["n_ok"],
        "cpus": cpus,
        "warmup_docs_per_sec": ext_stats["docs_per_sec"],
        "runs": n_runs,
        "query_runs": q_runs,
        "load_avg_start": round(_load0, 2),
        # ANN scale path vs brute force, measured where the scale path
        # must win: the interleaved BENCH_ANN_N-vector A/B (the sf0.1
        # rows in "queries" are sub-second and noise-dominated —
        # BENCH/BASELINE.md r5 note)
        "ann_scale": {"n_vectors": ann_n, "brute_sec": ann["brute"],
                      "ivf_probe4_sec": ann["probe"],
                      "lsh_buckets_sec": ann["buckets"]},
        # same-task ratio: brute top-k vs IVF probe-4 top-k at ann_n
        # vectors (lsh_buckets_sec is the bucket-ASSIGNMENT step, a
        # different task — its wall is in ann_scale for completeness).
        # The key keeps its historical name for cross-round trending;
        # the basis field makes the changed derivation explicit.
        "ann_lsh_speedup": (round(ann["brute"] / ann["probe"], 2)
                            if ann["probe"] > 0 else None),
        "ann_speedup_basis": (
            f"brute_topk / ivf_probe4_topk at {ann_n} vectors "
            "(same-task; r1-r3 derived this key from the sf0.1 "
            "noise floor — see BENCH/BASELINE.md r5 note)"),
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
