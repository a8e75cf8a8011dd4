"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N).

Runs the identical extraction job on the identical materialized corpus
at two parallelism levels — local[8] and local[32] — in separate JVMs
(fresh process per level so executor-thread count is honest), plus a
skew probe (hot-domain corpus with and without input salting).
Writes results into BENCH/scaling_bench.md and prints a JSON summary.

Usage: python tools/scaling_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from resume_parser_service_spark.session import get_spark
from resume_parser_service_spark.pipeline.extract import extract_pages
from pyspark.sql import functions as F

cores = int(sys.argv[1])
pages_path = sys.argv[2]
runs = int(sys.argv[3])
salt_input = sys.argv[4] == "salt"

spark = get_spark(app_name=f"scale-{{cores}}", cores=cores,
                  shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(pages_path)

walls = []
for i in range(runs + 1):  # first run = warm-up, discarded
    t0 = time.perf_counter()
    extracted, _ = extract_pages(pages, salt_partitions=cores * 2,
                                 salt_input=salt_input)
    n = extracted.count()
    walls.append(time.perf_counter() - t0)
walls = walls[1:]
print(json.dumps({{"cores": cores, "n_docs": n, "walls": walls}}))
spark.stop()
"""


def run_level(cores: int, pages_path: str, runs: int = 3,
              salt: bool = False) -> dict:
    script = _WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), pages_path, str(runs),
         "salt" if salt else "nosalt"],
        capture_output=True, text=True, cwd=REPO, timeout=1800)
    json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not json_lines:
        # surface the worker's actual failure instead of a bare
        # IndexError that throws away a multi-hour run's diagnostics
        raise RuntimeError(
            f"scaling worker failed (rc={out.returncode}):\n"
            f"{out.stderr[-4000:]}")
    line = json_lines[-1]
    res = json.loads(line)
    res["median_wall"] = statistics.median(res["walls"])
    res["docs_per_sec"] = round(res["n_docs"] / res["median_wall"], 1)
    return res


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000

    # materialize corpora once (uniform + hot-domain-skewed)
    sys.path.insert(0, REPO)
    from resume_parser_service_spark.session import get_spark
    from resume_parser_service_spark.sources.pages import build_pages_df

    cache = os.path.join(REPO, ".bench_cache")
    uniform = os.path.join(cache, f"pages_n{n_docs}")
    spark = get_spark(app_name="scale-gen", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(uniform, "_SUCCESS")):
        build_pages_df(spark, n_docs, partitions=256) \
            .write.mode("overwrite").parquet(uniform)
    # skewed file layout: single output file (everything in one scan split
    # unless maxPartitionBytes splits it) — the case salting defends.
    # Smaller corpus: the unsalted variant is deliberately slow.
    n_skew = min(n_docs, 20000)
    skewed = os.path.join(cache, f"pages_skewfile_n{n_skew}")
    if not os.path.exists(os.path.join(skewed, "_SUCCESS")):
        build_pages_df(spark, n_skew).coalesce(1) \
            .write.mode("overwrite").parquet(skewed)
    spark.stop()

    print("== scaling: local[8] vs local[32], same corpus ==", flush=True)
    r8 = run_level(8, uniform)
    print("local[8]:", r8, flush=True)
    r32 = run_level(32, uniform)
    print("local[32]:", r32, flush=True)
    eff = r32["docs_per_sec"] / (4 * r8["docs_per_sec"])

    print("== skew probe: single-file corpus, salt off/on ==", flush=True)
    sk_no = run_level(32, skewed, runs=2, salt=False)
    print("skewed nosalt:", sk_no, flush=True)
    sk_yes = run_level(32, skewed, runs=2, salt=True)
    print("skewed salted:", sk_yes, flush=True)

    summary = {
        "n_docs": n_docs,
        "local8_docs_per_sec": r8["docs_per_sec"],
        "local32_docs_per_sec": r32["docs_per_sec"],
        "scaling_efficiency_8_to_32": round(eff, 3),
        "skewed_file_nosalt_docs_per_sec": sk_no["docs_per_sec"],
        "skewed_file_salted_docs_per_sec": sk_yes["docs_per_sec"],
        "generated_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(summary))

    md = f"""# BENCH/BASELINE — scaling & skew evidence

North rule criterion: throughput scaling efficiency >=0.8 from N to 4N
executors. Evidenced in-sandbox (no real cluster) by running the SAME
extraction job on the SAME materialized corpus at two parallelism
levels in fresh JVMs; efficiency = thr(4N) / (4 * thr(N)).

Job: scan(parquet pages, {n_docs} docs) -> validate -> mapInPandas
extraction kernel (PDF/HTML -> text+links+resume+vector) -> latest-wins
url dedup -> count. Warm-up run discarded, median of 3 timed runs.

| level | median wall (s) | docs/sec |
|---|---|---|
| local[8]  (N)  | {r8['median_wall']:.2f} | {r8['docs_per_sec']} |
| local[32] (4N) | {r32['median_wall']:.2f} | {r32['docs_per_sec']} |

**Scaling efficiency (8 -> 32 cores): {eff:.3f}**

## Skew defense (salted repartition by xxhash64(url))

Corpus written as a single parquet file (degenerate file layout — the
case where scan splits alone can leave stragglers), local[32]:

| variant | median wall (s) | docs/sec |
|---|---|---|
| no salting        | {sk_no['median_wall']:.2f} | {sk_no['docs_per_sec']} |
| salted repartition | {sk_yes['median_wall']:.2f} | {sk_yes['docs_per_sec']} |

Raw walls: local8={r8['walls']}, local32={r32['walls']},
skew_nosalt={sk_no['walls']}, skew_salt={sk_yes['walls']}

Generated {summary['generated_at']} by tools/scaling_bench.py.
"""
    # own file — BENCH/BASELINE.md is curated by hand and must
    # never be clobbered by a tool rerun
    with open(os.path.join(REPO, "BENCH", "scaling_bench.md"), "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
