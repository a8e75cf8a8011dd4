"""PDF kernel unit tests (no Spark) — byte-identity round-trips, golden
regression on the reference fixtures, link semantics, error taxonomy.
Mirrors the assertions of /root/reference/app/tests/test_resume_parser.py
(link extraction :94-135, parse happy/error paths :207-314)."""

import json
import os

import pytest

from resume_parser_service_spark.kernels.pdf_gen import make_pdf
from resume_parser_service_spark.kernels.pdf_text import PdfError, extract_pdf

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REFERENCE_PDFS = ["resume1.pdf", "resume2.pdf", "resume3.pdf",
                  "FedericoElia.pdf", "CVENG.pdf"]


def test_roundtrip_single_page():
    pages = ["Hello World\nSecond line\nThird line"]
    assert extract_pdf(make_pdf(pages))["text"] == pages[0]


def test_roundtrip_multi_page():
    pages = [f"Page {i} content\nline two of page {i}" for i in range(1, 4)]
    res = extract_pdf(make_pdf(pages))
    assert res["text"] == "\n\n".join(pages)
    assert res["n_pages"] == 3


def test_roundtrip_escapes_and_latin1():
    pages = ["Parens (nested (deep)) and \\ backslash",
             "Résumé of José — wait, emdash is not latin1".replace("—", "-")]
    assert extract_pdf(make_pdf(pages))["text"] == "\n\n".join(pages)


def test_blank_line_space_encoding():
    # a single-space line round-trips to an empty line (corpus generator
    # contract, sources/pages.py)
    pages = ["above\n \nbelow"]
    assert extract_pdf(make_pdf(pages))["text"] == "above\n\nbelow"


def test_links_order_preserved():
    links = ["https://github.com/a", "https://linkedin.com/in/b",
             "https://example.com/c"]
    res = extract_pdf(make_pdf(["has links"], links))
    assert res["links"] == links


def test_uncompressed_stream():
    pages = ["no flate here"]
    assert extract_pdf(make_pdf(pages, compress=False))["text"] == pages[0]


def test_empty_page_pdf():
    # minimal valid PDF with no text ops (spirit of the reference's
    # inline fixture, /root/reference/app/tests/conftest.py:169-192)
    res = extract_pdf(make_pdf([""]))
    assert res["text"] == ""
    assert res["n_pages"] == 1


def test_bad_magic_raises():
    with pytest.raises(PdfError):
        extract_pdf(b"\x89PNG\r\n\x1a\n not a pdf")


def test_truncated_raises():
    with pytest.raises(PdfError):
        extract_pdf(make_pdf(["truncate me"])[:100])


@pytest.mark.parametrize("name", REFERENCE_PDFS)
def test_reference_pdf_golden(name):
    """Frozen goldens: never regenerate implicitly (SURVEY.md §7 risk 1).
    A diff here means the kernel changed behavior — bump KERNEL_VERSION
    and regenerate goldens deliberately."""
    path = f"/root/reference/{name}"
    if not os.path.exists(path):
        pytest.skip("reference fixtures not present")
    with open(os.path.join(GOLDEN_DIR, f"{name}.json")) as fh:
        golden = json.load(fh)
    res = extract_pdf(open(path, "rb").read())
    assert res["text"] == golden["text"]
    assert res["links"] == golden["links"]
    assert res["n_pages"] == golden["n_pages"]


def test_determinism():
    data = make_pdf(["deterministic?\nyes"], ["https://x.example"])
    assert extract_pdf(data) == extract_pdf(data)
    assert make_pdf(["deterministic?\nyes"], ["https://x.example"]) == data


def test_roundtrip_xref_stream():
    pages = ["XRef stream layout\nline two", "second page"]
    res = extract_pdf(make_pdf(pages, xref_stream=True))
    assert res["text"] == "\n\n".join(pages)


def test_roundtrip_object_stream():
    pages = ["ObjStm layout\nline two"]
    links = ["https://github.com/modern"]
    res = extract_pdf(make_pdf(pages, links, xref_stream=True, objstm=True))
    assert res["text"] == pages[0]
    assert res["links"] == links


def test_no_tounicode_winansi_font():
    """Fonts WITHOUT ToUnicode decode via /Encoding (WinAnsiEncoding
    base table) — the PDF-breadth path for Common-Crawl corpora."""
    text = "café résumé über"
    res = extract_pdf(make_pdf([text], tounicode=False))
    assert res["text"] == text


def test_differences_array_decoding():
    """/Encoding dict with /Differences glyph names overrides the base
    encoding (spec 9.6.6 precedence)."""
    # WinAnsi 200='E-grave', 201='E-acute'; the Differences array
    # remaps 201 to /bullet, proving it wins over the base table
    text = "x" + chr(200) + chr(201) + "y"
    pdf = make_pdf([text], tounicode=False,
                   differences={200: "Egrave", 201: "bullet"})
    res = extract_pdf(pdf)
    assert res["text"] == "xÈ•y"


def test_uniXXXX_glyph_names():
    pdf = make_pdf(["a" + chr(128) + "b"], tounicode=False,
                   differences={128: "uni20AC"})
    assert extract_pdf(pdf)["text"] == "a€b"


@pytest.mark.parametrize("flt", ["ASCIIHexDecode", "ASCII85Decode",
                                 "RunLengthDecode", "LZWDecode"])
def test_roundtrip_content_filters(flt):
    """Non-Flate content-stream filters (spec 7.4) round-trip — the
    PDF-breadth path for Common-Crawl corpora where older tooling emits
    LZW/ASCII85/RunLength streams."""
    # enough repeated-but-varied text to push LZW past the 9->10 bit
    # code-width boundary (needs >253 appended table entries)
    pages = ["line %d: the quick brown fox jumps over the lazy dog %d"
             % (i, i * 7) for i in range(40)]
    text = "\n".join(pages)
    res = extract_pdf(make_pdf([text], content_filter=flt))
    assert res["text"] == text


def test_roundtrip_filter_chain():
    """/Filter arrays apply in decode order (spec 7.3.8.2)."""
    text = "chained filters\nascii85 over flate"
    pdf = make_pdf([text], content_filter=["ASCII85Decode", "FlateDecode"])
    assert b"/Filter [/ASCII85Decode /FlateDecode]" in pdf
    assert extract_pdf(pdf)["text"] == text


def test_lzw_decoder_width_boundaries():
    """LZW round-trip across the 10->11 bit boundary (>765 entries) and
    EarlyChange=0 variant, plus z-shorthand + whitespace in ASCII85."""
    from resume_parser_service_spark.kernels.pdf_gen import (_ascii85_encode,
                                                             _lzw_encode)
    from resume_parser_service_spark.kernels.pdf_text import (_ascii85_decode,
                                                              _lzw_decode)
    import random
    rng = random.Random(7)
    blob = bytes(rng.randrange(0, 8) for _ in range(6000))
    assert _lzw_decode(_lzw_encode(blob, 1), 1) == blob
    assert _lzw_decode(_lzw_encode(blob, 0), 0) == blob
    assert _ascii85_decode(b"z \n z~>") == b"\x00" * 8
    assert _ascii85_decode(_ascii85_encode(blob)) == blob


def test_runlength_decoder_spec_cases():
    from resume_parser_service_spark.kernels.pdf_gen import _runlength_encode
    from resume_parser_service_spark.kernels.pdf_text import _runlength_decode
    # literal run, repeat run, EOD mid-stream
    assert _runlength_decode(b"\x02abc\xfeX\x80IGNORED") == b"abcXXX"
    blob = b"aaaaabcdefffffffg" * 11 + b"\x00" * 200
    assert _runlength_decode(_runlength_encode(blob)) == blob


def test_inline_image_skipped():
    """BI/ID/EI inline-image binary (spec 8.9.7) must be skipped, not
    tokenized — the payload here contains "(", "Tj" and "ET" bytes that
    would corrupt the operand stack if read as tokens."""
    import zlib as _z
    pdf = bytearray(make_pdf(["before image", "x"], compress=False))
    # splice an inline image between the two text ops of page 1
    marker = b"(before image) Tj"
    hostile = b"\x28\x54\x6a \x45\x54\x00\xff\xfe(ET Tj q Q"
    inline = (b"\nBI /W 4 /H 2 /CS /G /BPC 8 ID " + hostile +
              b" EI\nBT /F1 11 Tf 72 700 Td (after image) Tj ET")
    idx = bytes(pdf).find(marker)
    assert idx > 0
    data = bytes(pdf)
    # fix the /Length of the stream that holds the marker (the header
    # match closest before the marker)
    sm = [m for m in re.finditer(rb"<< /Length (\d+) >>\nstream\n", data)
          if m.start() < idx][-1]
    old_hdr = sm.group(0)
    new_hdr = (b"<< /Length %d >>\nstream\n"
               % (int(sm.group(1)) + len(inline)))
    patched = (data[:sm.start()] + new_hdr +
               data[sm.end():]).replace(marker, marker + inline, 1)
    res = extract_pdf(patched)
    assert "before image" in res["text"]
    assert "after image" in res["text"]
    assert "\xff" not in res["text"]


import re  # noqa: E402  (used by the inline-image splice test)


def test_corrupt_xref_offsets_recovered_by_object_scan():
    """Crawled PDFs frequently carry stale xref offsets (bytes were
    inserted/removed by rewriting proxies). The parser rebuilds the
    offset map by scanning for 'N G obj' markers (spec annex C.2
    tolerance) and still round-trips byte-identically."""
    pages = ["recovered text\nsecond line", "page two"]
    pdf = bytearray(make_pdf(pages))
    # shift every xref offset by +3 by injecting bytes after the header
    # WITHOUT regenerating the xref table
    hdr_end = pdf.index(b"\n", pdf.index(b"\n") + 1) + 1
    broken = bytes(pdf[:hdr_end]) + b"%x\n" + bytes(pdf[hdr_end:])
    res = extract_pdf(broken)
    assert res["text"] == "\n\n".join(pages)
    assert res["n_pages"] == 2


def test_encrypted_pdf_raises_pdferror():
    """UNOPENABLE encryption fails loudly into the FileProcessingError
    audit path instead of emitting mojibake (VERDICT.md r1 item 5).
    Since r4 the standard handler with an empty/known password IS
    opened (tests/test_pdf_crypt.py) — this covers the still-failing
    classes: a dangling /Encrypt ref and a real user password."""
    import pytest
    pdf = make_pdf(["secret"])
    enc = pdf.replace(b"trailer\n<< ", b"trailer\n<< /Encrypt 99 0 R ")
    assert enc != pdf
    with pytest.raises(PdfError, match="Encrypt"):
        extract_pdf(enc)
    from resume_parser_service_spark.kernels.pdf_crypt import encrypt_pdf
    locked = encrypt_pdf(pdf, "rc4-128", user_pw=b"real-password")
    with pytest.raises(PdfError, match="encrypted"):
        extract_pdf(locked)


def _mini_pdf(objects: dict[int, bytes]) -> bytes:
    """Hand-rolled classic-xref PDF from {obj_num: body} (adversarial
    fixtures the generator would never emit)."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    maxn = max(objects) + 1
    out += b"xref\n0 %d\n" % maxn
    out += b"0000000000 65535 f \n"
    for num in range(1, maxn):
        out += (b"%010d 00000 n \n" % offsets[num]
                if num in objects else b"0000000000 65535 f \n")
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
            % (maxn, xref_at))
    return bytes(out)


def test_cyclic_page_tree_terminates():
    """A /Pages node whose Kids point back at an ancestor must not hang
    or loop — the seen-set cuts the cycle."""
    pdf = _mini_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 2 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>",
    })
    r = extract_pdf(pdf)
    assert r["n_pages"] == 1


def test_self_referential_object_terminates():
    """An indirect-reference loop (A -> B -> A) resolves to a bounded
    fixpoint instead of spinning."""
    pdf = _mini_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
           b"/MediaBox [0 0 612 792] >>",
        4: b"5 0 R",
        5: b"4 0 R",
    })
    r = extract_pdf(pdf)  # no text, but no hang and no crash
    assert r["n_pages"] == 1 and r["text"] == ""


def test_self_invoking_xobject_bounded():
    """A Form XObject whose content invokes itself recurses at most to
    the depth cap, then stops."""
    pdf = _mini_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
           b"/Resources << /XObject << /F1 5 0 R >> >> "
           b"/MediaBox [0 0 612 792] >>",
        4: b"<< /Length 9 >>\nstream\n/F1 Do \nendstream",
        5: b"<< /Type /XObject /Subtype /Form /Length 9 "
           b"/Resources << /XObject << /F1 5 0 R >> >> >>\n"
           b"stream\n/F1 Do \nendstream",
    })
    r = extract_pdf(pdf)
    assert r["n_pages"] == 1  # terminates; nothing to extract


# ------------------------------------------------- image XObjects


def test_pdf_image_metadata_jpeg_and_gray():
    """Embedded DCTDecode JPEG and FlateDecode gray XObjects surface
    declared + decoded metadata; text extraction is byte-unchanged by
    the added images."""
    from resume_parser_service_spark.kernels import jpeg
    from resume_parser_service_spark.kernels.pdf_text import \
        pdf_image_metadata

    pages = ["alpha\nbeta", "gamma"]
    jp = jpeg.make_jpeg(12, 9, bytes([77]) * 108, quant=jpeg.QUANT_FLAT)
    imgs = [[{"kind": "jpeg", "data": jp, "width": 12, "height": 9}],
            [{"kind": "gray", "width": 5, "height": 4,
              "pixels": bytes(range(20))}]]
    pdf = make_pdf(pages, images=imgs)
    assert extract_pdf(pdf)["text"] == "\n\n".join(pages)
    rows = pdf_image_metadata(pdf)
    assert [(r["page"], r["filter"]) for r in rows] == \
        [(0, "DCTDecode"), (1, "FlateDecode")]
    assert rows[0]["decoded_width"] == 12 and rows[0]["mean_value"] == 77.0
    assert rows[0]["n_components"] == 1
    assert rows[1]["mean_value"] == 9.5
    assert pdf_image_metadata(make_pdf(["no images"])) == []


def test_pdf_image_metadata_modern_layout_and_two_per_page():
    """XRef-stream + ObjStm serialization resolves image XObjects too;
    two images on one page come back in /Im name order."""
    from resume_parser_service_spark.kernels.pdf_text import \
        pdf_image_metadata

    imgs = [[{"kind": "gray", "width": 3, "height": 3,
              "pixels": bytes([10] * 9)},
             {"kind": "gray", "width": 2, "height": 2,
              "pixels": bytes([200] * 4)}]]
    classic = pdf_image_metadata(make_pdf(["t"], images=imgs))
    modern = pdf_image_metadata(
        make_pdf(["t"], images=imgs, xref_stream=True, objstm=True))
    assert classic == modern
    assert [r["name"] for r in classic] == ["Im0", "Im1"]
    assert [r["mean_value"] for r in classic] == [10.0, 200.0]


def test_pdf_image_metadata_natural_slot_order_past_ten():
    """11 images on one page come back Im0..Im10 in numeric order, not
    lexicographic (Im0, Im1, Im10, Im2, ...)."""
    from resume_parser_service_spark.kernels.pdf_text import \
        pdf_image_metadata

    imgs = [[{"kind": "gray", "width": 2, "height": 2,
              "pixels": bytes([k * 20] * 4)} for k in range(11)]]
    rows = pdf_image_metadata(make_pdf(["t"], images=imgs))
    assert [r["name"] for r in rows] == ["Im%d" % k for k in range(11)]
    assert [r["mean_value"] for r in rows] == [k * 20.0 for k in range(11)]


def test_make_pdf_rejects_malformed_image_specs():
    """Silent drops and bare KeyErrors are validation errors instead
    (review findings): extra per-page spec lists, unknown kinds, and
    missing required keys all raise up front."""
    gray = {"kind": "gray", "width": 2, "height": 2, "pixels": bytes(4)}
    with pytest.raises(ValueError, match="more image-spec lists"):
        make_pdf(["one page"], images=[[], [gray]])
    with pytest.raises(ValueError, match="unknown image kind"):
        make_pdf(["t"], images=[[{"kind": "webp"}]])
    with pytest.raises(ValueError, match="missing"):
        make_pdf(["t"], images=[[{"kind": "jpeg", "data": b"x"}]])
    with pytest.raises(ValueError, match="missing"):
        make_pdf(["t"], images=[[{"kind": "gray", "width": 2,
                                  "height": 2}]])


def test_pdf_image_metadata_fails_open_on_bad_payload():
    """A corrupt DCTDecode payload keeps the declared dict metadata
    with null decode fields instead of sinking the scan."""
    from resume_parser_service_spark.kernels.pdf_text import \
        pdf_image_metadata

    imgs = [[{"kind": "jpeg", "data": b"\xff\xd8garbage", "width": 7,
              "height": 5}]]
    rows = pdf_image_metadata(make_pdf(["t"], images=imgs))
    assert len(rows) == 1
    assert rows[0]["width"] == 7 and rows[0]["filter"] == "DCTDecode"
    assert rows[0]["decoded_width"] is None
    assert rows[0]["mean_value"] is None
