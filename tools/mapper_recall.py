"""Per-field mapper recall vs the reference's own golden outputs.

Prints the markdown table published in COVERAGE.md §"Mapper fidelity".
The metric: for every golden entry (produced by the reference's GPT-4o
pipeline, /root/reference/cv_output/*.json), the best-matching mapped
entry's count of exactly-equal scalar fields (case-insensitive), over
the golden's non-null scalar fields. Lists (key_responsibilities,
skills_acquired) and the golden's LLM-INFERRED fields (e.g. `industry`
— "Software Development"/"Healthcare" appear nowhere in the PDF text)
are excluded: a deterministic extractor can only be graded on what the
document states.

Usage: python tools/mapper_recall.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from resume_parser_service_spark.kernels.pdf_text import extract_pdf  # noqa: E402
from resume_parser_service_spark.kernels.resume_map import map_resume  # noqa: E402

REF = "/root/reference"
CASES = {  # pdf fixture -> reference golden with matching casing
    "CVENG.pdf": "worse.json",
    "FedericoElia.pdf": "resume.json",
    "resume2.pdf": "both_resume2.json",
}
# golden fields the reference's LLM inferred rather than extracted
INFERRED = {"industry"}


def section_recall(ours: list | None, ref: list | None,
                   include_inferred: bool = False) -> tuple[int, int]:
    """(matched, total) scalar golden fields, best-entry alignment."""
    o, g = ours or [], ref or []
    matched = total = 0
    for ge in g:
        fields = {k: v for k, v in ge.items()
                  if v and not isinstance(v, (dict, list))
                  and (include_inferred or k not in INFERRED)}
        best = max((sum(1 for k, v in fields.items()
                        if str(oe.get(k) or "").strip().lower()
                        == str(v).strip().lower())
                    for oe in o), default=0)
        matched += best
        total += len(fields)
    return matched, total


def main() -> None:
    rows = []
    for pdf, golden in CASES.items():
        r = extract_pdf(open(f"{REF}/{pdf}", "rb").read())
        ours = map_resume(r["text"], r["links"])
        ref = json.load(open(f"{REF}/cv_output/{golden}"))
        row = {"pdf": pdf, "golden": golden}
        for sec in ("education_details", "experience_details"):
            m, t = section_recall(ours.get(sec), ref.get(sec))
            row[sec] = f"{m}/{t}" + (f" ({m / t:.2f})" if t else "")
        pi_m, pi_t = section_recall([ours["personal_information"] or {}],
                                    [ref["personal_information"] or {}])
        row["personal"] = f"{pi_m}/{pi_t}" + (f" ({pi_m / pi_t:.2f})"
                                              if pi_t else "")
        row["languages"] = ("exact" if ours.get("languages")
                            == ref.get("languages") else "DIFF")
        rows.append(row)
    print("| PDF | golden | personal | education | experience |"
          " languages |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['pdf']} | {r['golden']} | {r['personal']} "
              f"| {r['education_details']} | {r['experience_details']} "
              f"| {r['languages']} |")


if __name__ == "__main__":
    main()
