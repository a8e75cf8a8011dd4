"""Mutation fuzzing of the PDF kernel over the 5 reference PDFs
(VERDICT r2 item 8): single-bit flips, truncation at every structural
token boundary, and tail/xref corruption. Contract: ``extract_pdf``
returns text or raises a kernel-scoped error (PdfError or a contained
builtin) — never a hang, segfault-style crash, or foreign exception.

Deterministic (seeded RNG): a failing mutant reproduces from the seed.
~300 mutants per PDF, ~1500 total, dominated by fail-fast parses.
"""

import os
import random
import re
import time
import zlib

import pytest

from resume_parser_service_spark.kernels.pdf_text import PdfError, extract_pdf

REF = "/root/reference"
PDFS = ["CVENG.pdf", "FedericoElia.pdf", "resume1.pdf", "resume2.pdf",
        "resume3.pdf"]
# the same contained-failure set the garbage/truncation property tests
# accept — anything else (AttributeError, TypeError, RecursionError,
# MemoryError...) is a kernel bug the fuzzer must surface
ALLOWED = (PdfError, ValueError, KeyError, IndexError, zlib.error)
_STRUCT = [b"obj", b"endobj", b"stream", b"endstream", b"xref",
           b"trailer", b"startxref", b"%%EOF", b"/Root", b"/Pages"]

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "CVENG.pdf")),
    reason="reference fixtures not present")


def _mutants(data: bytes, seed: int):
    rng = random.Random(seed)
    # truncation at (and just past) every structural token boundary
    positions = []
    for tok in _STRUCT:
        positions += [m.start() for m in re.finditer(re.escape(tok), data)]
    rng.shuffle(positions)
    for p in positions[:100]:
        yield data[:p]
        yield data[:p + 1]
    # single-bit flips at random offsets (body + tables alike)
    for _ in range(80):
        i = rng.randrange(len(data))
        b = bytearray(data)
        b[i] ^= 1 << rng.randrange(8)
        yield bytes(b)
    # heavier corruption of the xref/trailer tail — the structured part
    # whose offsets the parser trusts most
    x = data.rfind(b"xref")
    if x >= 0:
        for _ in range(20):
            i = rng.randrange(x, len(data))
            b = bytearray(data)
            b[i] = rng.randrange(256)
            yield bytes(b)


@pytest.mark.parametrize("pdf", PDFS)
def test_pdf_mutation_fuzz(pdf):
    data = open(os.path.join(REF, pdf), "rb").read()
    n_pos = sum(len(re.findall(re.escape(tok), data)) for tok in _STRUCT)
    expected = 2 * min(n_pos, 100) + 80 + (20 if b"xref" in data else 0)
    n = 0
    for mut in _mutants(data, seed=0xC0FFEE):
        t0 = time.perf_counter()
        try:
            r = extract_pdf(mut)
            assert isinstance(r["text"], str)
        except ALLOWED:
            pass
        elapsed = time.perf_counter() - t0
        # hang guard only — generous bound so host-load spikes (the
        # repo's documented noisy neighbor) can't flake the suite
        assert elapsed < 60.0, f"mutant #{n} of {pdf} took {elapsed:.1f}s"
        n += 1
    assert n == expected   # generator ran to completion
    assert n >= 200        # independent coverage floor (~300/pdf ->
    #                        >=1k mutants across the suite); a PDF with
    #                        few structural tokens must FAIL, not
    #                        silently shrink the corpus
