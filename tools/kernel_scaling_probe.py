"""No-Spark scaling probe: run the extraction kernel on N worker
processes over identical work and report docs/sec per level. Separates
hardware/memory-bandwidth limits from Spark overhead when diagnosing
scaling efficiency.

Usage: python tools/kernel_scaling_probe.py [docs_per_worker] [levels...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _work(args):
    start, count = args
    from resume_parser_service_spark.kernels.embed import embed_text
    from resume_parser_service_spark.kernels.html_text import extract_html
    from resume_parser_service_spark.kernels.pdf_text import extract_pdf
    from resume_parser_service_spark.kernels.resume_map import (map_resume,
                                                                resume_to_text)
    from resume_parser_service_spark.schema import canonical_resume_json
    from resume_parser_service_spark.sources.pages import synth_doc

    n = 0
    for i in range(start, start + count):
        d = synth_doc(i)
        if d["html"][:4] == b"%PDF":
            r = extract_pdf(d["html"])
        else:
            r = extract_html(d["html"])
        m = map_resume(r["text"], r["links"])
        canonical_resume_json(m)
        embed_text(resume_to_text(m))
        n += 1
    return n


def main() -> None:
    per_worker = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    levels = [int(x) for x in sys.argv[2:]] or [1, 8, 16, 32]
    results = {}
    for n_proc in levels:
        jobs = [(w * 1_000_000, per_worker) for w in range(n_proc)]
        with mp.Pool(n_proc) as pool:
            pool.map(_work, [(0, 10)] * n_proc)  # warm imports
            t0 = time.perf_counter()
            done = sum(pool.map(_work, jobs))
            wall = time.perf_counter() - t0
        results[n_proc] = {"docs": done, "wall": round(wall, 2),
                           "docs_per_sec": round(done / wall, 1),
                           "per_core": round(done / wall / n_proc, 1)}
        print(n_proc, results[n_proc], flush=True)
    if 8 in results and 32 in results:
        print("eff 8->32:", round(results[32]["docs_per_sec"] /
                                  (4 * results[8]["docs_per_sec"]), 3))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
