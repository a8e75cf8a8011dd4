"""Rasterizer kernel (SURVEY.md §2 A3 — reference feeds pdf2image
page bitmaps to its vision model, resume_parser.py:82-114; this rebuild
renders the parsed text runs with a built-in 5x7 font)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from resume_parser_service_spark.kernels.media import decode_png
from resume_parser_service_spark.kernels.pdf_gen import make_pdf
from resume_parser_service_spark.kernels.raster import (ADV, FONT, GLYPH_H,
                                                        GLYPH_W, glyph_ink,
                                                        glyph_rows,
                                                        render_runs,
                                                        rasterize_pdf)


def test_font_table_well_formed():
    """Every printable-ASCII glyph is 7 rows x 5 cols with >=1 ink,
    and the table covers exactly codes 33..126."""
    assert sorted(map(ord, FONT)) == list(range(33, 127))
    for ch, rows in FONT.items():
        assert len(rows) == GLYPH_H, ch
        assert all(len(r) == GLYPH_W and set(r) <= {".", "#"}
                   for r in rows), ch
        assert glyph_ink(ch) > 0, ch


def test_roundtrip_stats_and_real_png():
    text = "Hello, World 42!\nsecond line here"
    (page,) = rasterize_pdf(make_pdf([text]))
    img = decode_png(page["png"])
    assert (img["width"], img["height"]) == (page["width"], page["height"])
    # ink is counted from the bitmap; the PNG round-trip must agree
    assert img["pixels"].count(0) == page["ink_pixels"]
    lines = text.split("\n")
    assert page["width"] == 4 + ADV * max(len(ln) for ln in lines)
    assert page["height"] == 4 + GLYPH_H + 14 * (len(lines) - 1)
    assert page["n_glyphs"] == sum(1 for c in text if c not in " \n")
    assert page["ink_pixels"] == sum(glyph_ink(c) for c in text
                                     if c != "\n")


def test_glyph_stamped_pixel_exact():
    """A lone 'A' renders the FONT['A'] bitmap at (pad, pad)."""
    r = render_runs([(72.0, 700.0, 11.0, "A", 6.0)], pad=2)
    for dy, bits in enumerate(FONT["A"]):
        for dx in range(GLYPH_W):
            px = r["pixels"][(2 + dy) * r["width"] + 2 + dx]
            assert px == (0 if bits[dx] == "#" else 255)


def test_overlapping_runs_or_ink():
    """Two stamps on the same cell leave one glyph's worth of ink:
    ink comes from the bitmap, not per-glyph sums."""
    runs = [(72.0, 700.0, 11.0, "g", 6.0), (72.0, 700.0, 11.0, "g", 6.0)]
    r = render_runs(runs)
    assert r["n_glyphs"] == 2
    assert r["ink_pixels"] == glyph_ink("g")


def test_fallback_box_and_blank_codepoints():
    assert glyph_rows("é") is not None  # Latin-1 accent -> box
    assert glyph_ink("é") == 20
    for ch in (" ", "\t", "\x7f", "\xa0"):
        assert glyph_rows(ch) is None
        assert glyph_ink(ch) == 0
    r = render_runs([(72.0, 700.0, 11.0, "a\xa0b", 6.0)])
    assert r["n_glyphs"] == 2
    assert r["ink_pixels"] == glyph_ink("a") + glyph_ink("b")
    # the NBSP still advanced: 3 cells wide
    assert r["width"] == 4 + 3 * ADV


def test_multi_page_independent_bounds():
    pages = rasterize_pdf(make_pdf(["short", "a much longer single line"]))
    assert [p["page"] for p in pages] == [0, 1]
    assert pages[0]["width"] == 4 + ADV * len("short")
    assert pages[1]["width"] == 4 + ADV * len("a much longer single line")
    assert all(p["height"] == 4 + GLYPH_H for p in pages)


def test_empty_page_minimal_blank_canvas():
    (page,) = rasterize_pdf(make_pdf([""]))
    assert page["n_glyphs"] == 0 and page["ink_pixels"] == 0
    img = decode_png(page["png"])
    assert set(img["pixels"]) == {255}


def test_hostile_ctm_canvas_cap():
    """A translate-by-1e6 image placement would crop-bound a
    gigabyte canvas; the 64M-pixel cap fails closed instead."""
    from resume_parser_service_spark.kernels.raster import render_runs
    img = {"width": 1, "height": 1, "n_components": 1, "pixels": b"\x00"}
    with pytest.raises(ValueError, match="64M-pixel"):
        render_runs([(72.0, 700.0, 11.0, "x", 6.0)],
                    images=[((1.0, 0.0, 0.0, 1.0, 1e6, -1e6), img)])


def test_rasterize_to_base64_reference_api_shape():
    """One base64-PNG string per page (reference
    _process_file_to_images_base64 contract)."""
    import base64

    from resume_parser_service_spark.kernels.raster import \
        rasterize_to_base64
    out = rasterize_to_base64(make_pdf(["page one", "page two"]))
    assert len(out) == 2
    for s in out:
        png = base64.b64decode(s)
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        decode_png(png)  # must be a valid, decodable PNG


def test_garbage_raises():
    from resume_parser_service_spark.kernels.pdf_text import PdfError
    with pytest.raises(PdfError):
        rasterize_pdf(b"%PDF-1.4 not really a pdf")


def test_image_xobjects_composited_pixel_exact():
    """Embedded gray-Flate and JPEG image XObjects paint their device
    rects (cm scale 2x -> nearest-neighbor upsample) with the decoded
    values; text ink survives on top (darkest-wins compositing)."""
    from resume_parser_service_spark.kernels import jpeg

    gray = {"kind": "gray", "width": 4, "height": 3,
            "pixels": bytes([100]) * 12}
    jp = {"kind": "jpeg", "width": 8, "height": 8,
          "data": jpeg.make_jpeg(8, 8, bytes([50]) * 64,
                                 quant=jpeg.QUANT_FLAT)}
    (page,) = rasterize_pdf(make_pdf(["hello world"], images=[[gray, jp]]))
    assert page["n_images"] == 2
    img = decode_png(page["png"])
    # make_pdf places /Im0 with `8 0 0 6 72 360 cm` and /Im1 with
    # `16 0 0 16 72 320 cm`: solid 8x6 and 16x16 device rects
    assert img["pixels"].count(100) == 8 * 6
    assert img["pixels"].count(50) == 16 * 16
    # text-only stats are untouched by the image arm
    assert page["n_glyphs"] == len("helloworld")
    assert page["ink_pixels"] == sum(glyph_ink(c) for c in "hello world")


def test_image_gradient_orientation_and_flip():
    """A top-dark vertical gradient keeps its orientation through the
    unit-square mapping (PDF v axis is up, image rows top-down), and a
    negative-d cm flips it."""
    from resume_parser_service_spark.kernels.pdf_text import (
        _Document, decode_image_xobject)
    from resume_parser_service_spark.kernels.raster import render_runs

    # 1x4 column: 10 (top row) .. 40 (bottom row)
    img = {"width": 1, "height": 4, "n_components": 1,
           "pixels": bytes([10, 20, 30, 40])}
    r = render_runs([], images=[((1.0, 0.0, 0.0, 4.0, 0.0, 0.0), img)],
                    pad=0)
    col = [r["pixels"][row * r["width"]] for row in range(4)]
    assert col == [10, 20, 30, 40]
    flipped = render_runs([], images=[((1.0, 0.0, 0.0, -4.0, 0.0, 4.0),
                                       img)], pad=0)
    col = [flipped["pixels"][row * flipped["width"]] for row in range(4)]
    assert col == [40, 30, 20, 10]


def test_corrupt_image_skipped_fail_open():
    """A corrupt DCTDecode payload is skipped (n_images excludes it);
    the text still renders — mirror of pdf_image_metadata fail-open."""
    bad = {"kind": "jpeg", "width": 4, "height": 4, "data": b"\xff\xd8junk"}
    (page,) = rasterize_pdf(make_pdf(["still here"], images=[[bad]]))
    assert page["n_images"] == 0
    assert page["n_glyphs"] == len("stillhere")
    assert page["ink_pixels"] == sum(glyph_ink(c) for c in "still here")


@settings(max_examples=25, deadline=None)
@given(st.text(st.characters(min_codepoint=32, max_codepoint=126),
               min_size=1, max_size=200))
def test_property_stats_match_per_char_arithmetic(text):
    """For any printable-ASCII text wrapped at 64 chars/line (the
    rasterize_pages query layout), the rendered stats equal the
    oracle's per-char arithmetic."""
    wrapped = "\n".join(text[i:i + 64] for i in range(0, len(text), 64))
    (page,) = rasterize_pdf(make_pdf([wrapped]))
    n_lines = (len(text) + 63) // 64
    assert page["width"] == 4 + ADV * min(64, len(text))
    assert page["height"] == 4 + GLYPH_H + 14 * (n_lines - 1)
    assert page["n_glyphs"] == sum(1 for c in text if c != " ")
    assert page["ink_pixels"] == sum(glyph_ink(c) for c in text)


def test_rasterize_pages_oracle_parity_on_hostile_corpus(spark, tmp_path):
    """Kernel and oracle agree OUTSIDE the polite-corpus domain: empty
    text, tabs, embedded newlines, non-ASCII, and all-control docs.
    Both sides project text onto printable ASCII and drop
    empty-after-projection docs — a corpus-generator change must not
    silently split them (found by review: the oracle's length()
    formulas used raw text while the PDF round-trip drops controls)."""
    import duckdb
    import pandas as pd

    from resume_parser_service_spark.operators.extract_queries import (
        _q_rasterize_pages, _raster_oracle)

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": ["",                          # empty -> dropped
                 "tab\there",                 # control char stripped
                 "line one\nline two",        # newline stripped
                 "café ümläut",  # non-ASCII stripped
                 "\t\n\x07",                  # all-control -> dropped
                 "x" * 150],                  # wraps to 3 lines
    })
    sf_dir = str(tmp_path)
    docs.to_parquet(f"{sf_dir}/documents.parquet")

    sdf = _q_rasterize_pages(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    odf = con.execute(_raster_oracle()).df()

    assert sorted(sdf["doc_id"]) == [1, 2, 3, 5]  # 0 and 4 dropped
    sdf = sdf.sort_values("doc_id").reset_index(drop=True)
    odf = odf.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        sdf[sorted(sdf.columns)].astype("int64"),
        odf[sorted(odf.columns)].astype("int64"))
