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

All 16 reference goldens are covered (r4 verdict item 6), mapped to
their source PDF by contact identity (name+email in the extracted
text): 10 are CVENG.pdf variants (Lorenzo Foschi), 4 FedericoElia.pdf
(Federico Elia), 2 resume2.pdf (Christoper Robinson). NO golden maps
to resume1.pdf or resume3.pdf — those two fixtures keep their frozen
self-goldens in tests/golden/. The per-PDF CANONICAL golden (the
ratcheted floor in tests/test_resume_map.py) is the variant with the
most complete agreement with the PDF bytes; the other variants are
alt-pipeline runs (different models/OCR: *_4o, *_mini, easyocr,
azure) whose rows adjudicate how much of any miss is golden noise vs
mapper gap.

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
# pdf fixture -> ALL reference goldens produced from it (identity-
# matched; '*' marks the canonical golden used for the ratcheted
# pytest floors)
CASES = {
    "CVENG.pdf": ["worse.json*", "better.json", "both.json", "fico.json",
                  "non_fico.json", "no_intermediary_ai_4o.json",
                  "no_intermediary_ai_mini.json", "resume_4o.json",
                  "resume_azure_4o.json", "resume_easyocr.json"],
    "FedericoElia.pdf": ["resume.json*", "fede-resume.json",
                         "resume_quasi_perfetto.json",
                         "resume_wLinks.json"],
    "resume2.pdf": ["both_resume2.json*",
                    "no_intermediary_ai_mini_resume2.json"],
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


def recall_rows() -> list[dict]:
    rows = []
    for pdf, goldens in CASES.items():
        r = extract_pdf(open(f"{REF}/{pdf}", "rb").read())
        ours = map_resume(r["text"], r["links"])
        for golden in goldens:
            canonical = golden.endswith("*")
            golden = golden.rstrip("*")
            ref = json.load(open(f"{REF}/cv_output/{golden}"))
            row = {"pdf": pdf, "golden": golden, "canonical": canonical}
            for sec in ("education_details", "experience_details"):
                m, t = section_recall(ours.get(sec), ref.get(sec))
                row[sec] = (m, t)
            pi = section_recall([ours["personal_information"] or {}],
                                [ref["personal_information"] or {}])
            row["personal"] = pi
            row["languages"] = (ours.get("languages")
                                == ref.get("languages"))
            rows.append(row)
    return rows


def main() -> None:
    def fmt(mt):
        m, t = mt
        return f"{m}/{t}" + (f" ({m / t:.2f})" if t else "")

    print("| PDF | golden | personal | education | experience |"
          " languages |")
    print("|---|---|---|---|---|---|")
    for r in recall_rows():
        star = " *" if r["canonical"] else ""
        print(f"| {r['pdf']} | {r['golden']}{star} | {fmt(r['personal'])} "
              f"| {fmt(r['education_details'])} "
              f"| {fmt(r['experience_details'])} "
              f"| {'exact' if r['languages'] else 'DIFF'} |")


if __name__ == "__main__":
    main()
