"""Second growth decade (r5 verdict item 7): the riskiest operators at
100x sf0.1 (500k docs / 200k vectors, same isomorphic-relabeling
construction as the 10x probe — disjoint per-copy vocabularies /
orthogonal sign flips, so workload per copy is exactly sf0.1's and
cross-copy candidates are ~zero).

Runs dedup_clusters, embedding_neardup_pairs (driver-contract
parameters), ngram_jaccard_pairs and repeated_spans interleaved at 10x
and 100x; reports wall growth for the 10x data step plus
rounds-to-converge for the connected-components fixpoint. Writes
BENCH/sf_scale_probe_100x.json.

Usage: python tools/sf_scale_probe_100x.py [reps=2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sf_scale_probe import build_sfx10  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from resume_parser_service_spark.operators import cluster, spans
    from resume_parser_service_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="rps-scale-probe-100x", cores=32,
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.abspath(__file__))
    cache_root = os.path.join(here, "..", ".bench_cache")
    x10 = build_sfx10(spark, cache_root)
    x100 = build_sfx10(spark, cache_root, n_copies=100, name="sfx100")

    qs = entrymod.queries()
    probes = {
        "dedup_clusters": lambda sf: qs["dedup_clusters"](spark, sf),
        "embedding_neardup_pairs":
            lambda sf: qs["embedding_neardup_pairs"](spark, sf),
        "ngram_jaccard_pairs":
            lambda sf: qs["ngram_jaccard_pairs"](spark, sf),
        "repeated_spans": lambda sf: spans.repeated_spans(spark, sf),
    }

    out: dict = {"step": "10x -> 100x of sf0.1", "reps": reps,
                 "load_avg_start": round(os.getloadavg()[0], 2),
                 "queries": {}}
    for name, fn in probes.items():
        walls = {x10: [], x100: []}
        rows = {}
        rounds = {}
        for rep in range(reps + 1):  # first pair = warm-up
            for sf in (x10, x100):
                t0 = time.perf_counter()
                n = fn(sf).count()
                w = time.perf_counter() - t0
                if rep:
                    walls[sf].append(round(w, 3))
                rows[sf] = n
                if name == "dedup_clusters":
                    rounds[sf] = cluster.LAST_ROUNDS
        med = {sf: sorted(ws)[len(ws) // 2] for sf, ws in walls.items()}
        rec = {"x10_sec": med[x10], "x100_sec": med[x100],
               "wall_growth": round(med[x100] / med[x10], 2),
               "rows_x10": rows[x10], "rows_x100": rows[x100],
               "walls": {"x10": walls[x10], "x100": walls[x100]}}
        if rounds:
            rec["cc_rounds"] = {"x10": rounds[x10], "x100": rounds[x100]}
        out["queries"][name] = rec
        print(name, rec["x10_sec"], "->", rec["x100_sec"],
              f"({rec['wall_growth']}x)", flush=True)

    path = os.path.join(here, "..", "BENCH", "sf_scale_probe_100x.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
