"""Property-based kernel tests (hypothesis): the byte-identity
round-trip must hold for ARBITRARY corpus-legal inputs, not just the
generator's vocabulary; malformed inputs must fail closed (PdfError),
never hang or corrupt."""

import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from resume_parser_service_spark.kernels.html_text import extract_html
from resume_parser_service_spark.kernels.pdf_gen import make_pdf
from resume_parser_service_spark.kernels.pdf_text import PdfError, extract_pdf

# corpus-legal line: printable latin-1, no leading/trailing space, non-empty
_line = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=255,
                           exclude_characters="\x7f\xa0\xad"),
    min_size=1, max_size=60,
).map(lambda s: s.strip()).filter(lambda s: s)

_page = st.lists(_line, min_size=1, max_size=12).map("\n".join)


@settings(max_examples=60, deadline=None)
@given(pages=st.lists(_page, min_size=1, max_size=3),
       modern=st.booleans(), packed=st.booleans())
def test_pdf_roundtrip_property(pages, modern, packed):
    pdf = make_pdf(pages, xref_stream=modern, objstm=modern and packed)
    res = extract_pdf(pdf)
    assert res["text"] == "\n\n".join(pages)
    assert res["n_pages"] == len(pages)


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_pdf_garbage_fails_closed(data):
    """Arbitrary bytes: either a structured PdfError or (if it happens
    to parse) a plain result — never a hang or unexpected exception."""
    try:
        res = extract_pdf(b"%PDF-1.4\n" + data)
        assert isinstance(res["text"], str)
    except (PdfError, ValueError, KeyError, IndexError, zlib.error):
        pass


@settings(max_examples=40, deadline=None)
@given(truncate_at=st.integers(min_value=9, max_value=400))
def test_pdf_truncation_fails_closed(truncate_at):
    pdf = make_pdf(["some text that will be cut", "second page"])
    data = pdf[:truncate_at]
    try:
        res = extract_pdf(data)
        assert isinstance(res["text"], str)
    except (PdfError, ValueError, KeyError, IndexError, zlib.error):
        pass


@settings(max_examples=80, deadline=None)
@given(blob=st.binary(min_size=0, max_size=3000),
       early=st.integers(min_value=0, max_value=1))
def test_stream_codecs_roundtrip_property(blob, early):
    """encoder(decoder) identity for every non-Flate stream codec the
    kernel supports, on arbitrary bytes (spec 7.4)."""
    from resume_parser_service_spark.kernels.pdf_gen import (
        _ascii85_encode, _lzw_encode, _runlength_encode)
    from resume_parser_service_spark.kernels.pdf_text import (
        _ascii85_decode, _lzw_decode, _runlength_decode)
    assert _ascii85_decode(_ascii85_encode(blob)) == blob
    assert _runlength_decode(_runlength_encode(blob)) == blob
    assert _lzw_decode(_lzw_encode(blob, early), early) == blob


_word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
                min_size=1, max_size=12)
_paragraph = st.lists(_word, min_size=3, max_size=30).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(paragraphs=st.lists(_paragraph, min_size=1, max_size=5))
def test_html_roundtrip_property(paragraphs):
    body = "".join(f"<p>{p}</p>" for p in paragraphs)
    html = (f"<html><head><style>p{{x}}</style></head><body>"
            f"<nav><a href='/a'>aa</a><a href='/b'>bb</a></nav>"
            f"<article>{body}</article>"
            f"<footer><a href='/t'>tos</a> fine print</footer>"
            f"</body></html>").encode()
    kept = [p for p in paragraphs if len(p) >= 8]
    assert extract_html(html)["text"] == "\n".join(kept)


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_html_never_raises(data):
    res = extract_html(b"<html><body>" + data + b"</body></html>")
    assert isinstance(res["text"], str)
    assert isinstance(res["links"], list)


@given(text=st.text(alphabet=st.characters(min_codepoint=9,
                                           max_codepoint=0x2022),
                    max_size=1500),
       links=st.lists(st.text(max_size=40), max_size=4))
@settings(max_examples=150, deadline=None)
def test_map_resume_total_function(text, links):
    """The mapper is a TOTAL function of (text, links): never raises,
    deterministic, always canonical-schema serializable, and its
    to_text flattening never raises either — the guarantee the
    mapInPandas kernel stage leans on (a single poisoned document must
    not kill a 100 TB job)."""
    import json

    from resume_parser_service_spark.kernels.resume_map import (
        map_resume, resume_to_text)
    from resume_parser_service_spark.schema import canonical_resume_json

    m = map_resume(text, links)
    assert map_resume(text, links) == m
    json.dumps(canonical_resume_json(m))
    resume_to_text(m)


@settings(max_examples=40, deadline=None)
@given(w=st.integers(1, 24), h=st.integers(1, 24), seed=st.integers(0, 2**31))
def test_jpeg_roundtrip_property(w, h, seed):
    """Flat-quant baseline JPEG round-trips ARBITRARY small images to
    within the DCT integer-rounding bound (|err| <= 1 per pixel)."""
    import random

    from resume_parser_service_spark.kernels.jpeg import (QUANT_FLAT,
                                                          decode_jpeg,
                                                          make_jpeg)
    rng = random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(w * h))
    d = decode_jpeg(make_jpeg(w, h, px, quant=QUANT_FLAT))
    assert (d["width"], d["height"]) == (w, h)
    assert len(d["pixels"]) == w * h
    assert max(abs(a - b) for a, b in zip(px, d["pixels"])) <= 1


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_jpeg_garbage_fails_closed(data):
    """Arbitrary bytes into decode_jpeg: ValueError or a decode,
    never IndexError/struct.error/hang."""
    from resume_parser_service_spark.kernels.jpeg import decode_jpeg
    try:
        decode_jpeg(b"\xFF\xD8" + data)
    except ValueError:
        pass
