"""Final interleaved scaling measurement: alternating fresh-JVM runs at
N and 4N cores cancel slow host-load drift; median over all samples.
Writes BENCH/final_scaling.json (BASELINE.md is curated by hand from
it — this tool does NOT edit markdown).

Usage: python tools/final_scaling.py [n_docs] [lo] [hi] [reps]
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
import json, sys, time
sys.path.insert(0, {repo!r})
from resume_parser_service_spark.session import get_spark
from resume_parser_service_spark.pipeline.extract import extract_pages
cores = int(sys.argv[1])
spark = get_spark(cores=cores, shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(sys.argv[2])
walls = []
for i in range(3):  # warm-up + 2 timed
    t0 = time.perf_counter()
    ext, _ = extract_pages(pages)
    n = ext.count()
    walls.append(time.perf_counter() - t0)
print(json.dumps({{"n": n, "walls": walls[1:]}}))
spark.stop()
"""


def sample(cores: int, pages_path: str) -> tuple[int, list[float]]:
    out = subprocess.run(
        [sys.executable, "-c", _WORKER.format(repo=REPO), str(cores),
         pages_path],
        capture_output=True, text=True, cwd=REPO, timeout=900)
    json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not json_lines:
        # surface the worker's actual failure instead of a bare
        # IndexError that throws away a multi-hour run's diagnostics
        raise RuntimeError(
            f"scaling worker failed (rc={out.returncode}):\n"
            f"{out.stderr[-4000:]}")
    line = json_lines[-1]
    d = json.loads(line)
    return d["n"], d["walls"]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    pages_path = os.path.join(REPO, ".bench_cache", f"pages_n{n_docs}")
    assert os.path.exists(pages_path), f"generate {pages_path} first"

    walls: dict[int, list[float]] = {lo: [], hi: []}
    n_rows = 0
    for rep in range(reps):
        for cores in (lo, hi):
            n_rows, ws = sample(cores, pages_path)
            walls[cores].extend(ws)
            print(f"rep{rep} local[{cores}]: {[round(w, 2) for w in ws]}",
                  flush=True)

    med = {c: statistics.median(w) for c, w in walls.items()}
    dps = {c: round(n_rows / med[c], 1) for c in med}
    eff = round(dps[hi] / (4 * dps[lo]), 3)
    # min-wall estimator: the least-interference sample per level.
    # The host's noisy neighbor hits wide jobs disproportionately
    # (stealing k cores costs a 4N-core job k/4N, an N-core job less
    # when the scheduler places it away), so medians under-estimate
    # true scaling; the fastest wall per level is the cleanest look.
    best = {c: min(w) for c, w in walls.items()}
    eff_min = round((n_rows / best[hi]) / (4 * (n_rows / best[lo])), 3)
    summary = {"n_docs": n_docs, "lo": lo, "hi": hi,
               f"local{lo}_docs_per_sec": dps[lo],
               f"local{hi}_docs_per_sec": dps[hi],
               "scaling_efficiency": eff,
               "scaling_efficiency_minwall": eff_min,
               "raw_walls": {str(c): [round(w, 2) for w in walls[c]]
                             for c in walls},
               "generated_at": time.strftime("%Y-%m-%d %H:%M:%S")}
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH", "final_scaling.json"), "w") as fh:
        json.dump(summary, fh, indent=1)


if __name__ == "__main__":
    main()
