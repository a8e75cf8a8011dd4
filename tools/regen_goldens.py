"""Deliberate golden regeneration (never run implicitly — see
tests/test_pdf_kernel.py). Regenerates the frozen fixtures under
tests/golden/ from the current kernels:

    python tools/regen_goldens.py text    # <pdf>.json (extract_pdf output)
    python tools/regen_goldens.py resume  # <pdf>.resume.json (mapper output)

Run ONLY after an intentional KERNEL_VERSION bump, and review the diff.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

from resume_parser_service_spark.kernels.pdf_text import extract_pdf
from resume_parser_service_spark.kernels.resume_map import map_resume
from resume_parser_service_spark.schema import canonical_resume_json

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
FIXTURES = ["resume1.pdf", "resume2.pdf", "resume3.pdf",
            "FedericoElia.pdf", "CVENG.pdf"]


def main() -> int:
    what = sys.argv[1] if len(sys.argv) > 1 else ""
    if what not in ("text", "resume"):
        print(__doc__)
        return 2
    for f in FIXTURES:
        src = f"/root/reference/{f}"
        if not os.path.exists(src):
            print(f"skip {f}: reference fixture missing")
            continue
        r = extract_pdf(open(src, "rb").read())
        if what == "text":
            out = os.path.join(GOLDEN_DIR, f + ".json")
            with open(out, "w") as fh:
                json.dump({"text": r["text"], "links": r["links"],
                           "n_pages": r["n_pages"]}, fh, indent=1)
        else:
            m = map_resume(r["text"], r["links"])
            out = os.path.join(GOLDEN_DIR, f + ".resume.json")
            with open(out, "w") as fh:
                fh.write(canonical_resume_json(m))
        print("wrote", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
