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
        # ANN scale path vs labeled brute-force baseline (same sf)
        "ann_lsh_speedup": (
            round(qtimes["ann_topk_bruteforce"] / qtimes["ann_lsh_buckets"], 2)
            if qtimes.get("ann_lsh_buckets") is not None
            and qtimes.get("ann_topk_bruteforce") is not None
            and qtimes["ann_lsh_buckets"] > 0 else None),
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
