"""Deterministic PDF page rasterizer (SURVEY.md §2 A3).

The reference rasterizes PDF pages to images to feed its vision model
(`/root/reference/app/services/resume_parser.py:82-114` —
``_process_file_to_images_base64``, pdf2image + base64). This rebuild
keeps the operator but makes it deterministic and library-free: the
page's positioned text runs (the same device-space runs the extraction
kernel parses, ``kernels/pdf_text._page_runs``) are stamped onto a
grayscale canvas with a built-in 5x7 dot-matrix font, painted image
XObjects are decoded (JPEG / gray-Flate, ``decode_image_xobject``) and
composited into their ``cm`` device rects, and the canvas is emitted
as a real PNG (``kernels/media.make_png``).

Rendering model (the rasterizer's own text-grid metric, documented so
the DuckDB oracle can state every output):

- device scale is 1 px per PDF point; the canvas is cropped to the ink
  bounding box of the runs plus a ``pad``-px margin on each side;
- every glyph occupies a 5x7 cell and advances exactly ``ADV`` = 6 px,
  regardless of the PDF font's metrics (like early terminal renderers);
- ink is black-on-white (0 on 255); overlapping glyphs OR their ink
  (a pixel painted twice is still one ink pixel);
- codepoints 33..126 use the built-in font; <33, 127 (DEL) and 160
  (NBSP) are ink-less advances; everything else (Latin-1 accents and
  beyond) stamps the 5x7 fallback box (20 ink pixels).

Per page the rasterizer reports the canvas dims, the stamped-glyph
count, the ink-pixel count *measured from the final bitmap* (so a
stamping/clipping bug cannot be masked by per-char arithmetic), and the
PNG bytes.
"""

from __future__ import annotations

from .media import make_png
from .pdf_text import _Document, _page_runs, decode_image_xobject

__all__ = ["rasterize_pdf", "rasterize_to_base64", "render_runs",
           "glyph_ink", "glyph_rows", "GLYPH_W", "GLYPH_H", "ADV", "FONT"]

GLYPH_W = 5
GLYPH_H = 7
ADV = 6  # fixed per-char advance in px

# Classic 5x7 dot-matrix font, ASCII 33..126. Rows top-to-bottom,
# '#' = ink. Original rendition of the public-domain LED-display style.
FONT: dict[str, tuple[str, ...]] = {
    "!": ("..#..", "..#..", "..#..", "..#..", "..#..", ".....", "..#.."),
    '"': (".#.#.", ".#.#.", ".#.#.", ".....", ".....", ".....", "....."),
    "#": (".#.#.", ".#.#.", "#####", ".#.#.", "#####", ".#.#.", ".#.#."),
    "$": ("..#..", ".####", "#.#..", ".###.", "..#.#", "####.", "..#.."),
    "%": ("##..#", "##..#", "...#.", "..#..", ".#...", "#..##", "#..##"),
    "&": (".##..", "#..#.", "#.#..", ".#...", "#.#.#", "#..#.", ".##.#"),
    "'": ("..#..", "..#..", "..#..", ".....", ".....", ".....", "....."),
    "(": ("...#.", "..#..", ".#...", ".#...", ".#...", "..#..", "...#."),
    ")": (".#...", "..#..", "...#.", "...#.", "...#.", "..#..", ".#..."),
    "*": (".....", "..#..", "#.#.#", ".###.", "#.#.#", "..#..", "....."),
    "+": (".....", "..#..", "..#..", "#####", "..#..", "..#..", "....."),
    ",": (".....", ".....", ".....", ".....", ".##..", "..#..", ".#..."),
    "-": (".....", ".....", ".....", "#####", ".....", ".....", "....."),
    ".": (".....", ".....", ".....", ".....", ".....", ".##..", ".##.."),
    "/": (".....", "....#", "...#.", "..#..", ".#...", "#....", "....."),
    "0": (".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."),
    "1": ("..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "2": (".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"),
    "3": (".###.", "#...#", "....#", "..##.", "....#", "#...#", ".###."),
    "4": ("...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."),
    "5": ("#####", "#....", "####.", "....#", "....#", "#...#", ".###."),
    "6": ("..##.", ".#...", "#....", "####.", "#...#", "#...#", ".###."),
    "7": ("#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."),
    "8": (".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."),
    "9": (".###.", "#...#", "#...#", ".####", "....#", "...#.", ".##.."),
    ":": (".....", ".##..", ".##..", ".....", ".##..", ".##..", "....."),
    ";": (".....", ".##..", ".##..", ".....", ".##..", "..#..", ".#..."),
    "<": ("...#.", "..#..", ".#...", "#....", ".#...", "..#..", "...#."),
    "=": (".....", ".....", "#####", ".....", "#####", ".....", "....."),
    ">": (".#...", "..#..", "...#.", "....#", "...#.", "..#..", ".#..."),
    "?": (".###.", "#...#", "....#", "...#.", "..#..", ".....", "..#.."),
    "@": (".###.", "#...#", "....#", ".##.#", "#.#.#", "#.#.#", ".###."),
    "A": (".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "B": ("####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."),
    "C": (".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."),
    "D": ("###..", "#..#.", "#...#", "#...#", "#...#", "#..#.", "###.."),
    "E": ("#####", "#....", "#....", "####.", "#....", "#....", "#####"),
    "F": ("#####", "#....", "#....", "####.", "#....", "#....", "#...."),
    "G": (".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".####"),
    "H": ("#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "I": (".###.", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "J": ("..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."),
    "K": ("#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"),
    "L": ("#....", "#....", "#....", "#....", "#....", "#....", "#####"),
    "M": ("#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"),
    "N": ("#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"),
    "O": (".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "P": ("####.", "#...#", "#...#", "####.", "#....", "#....", "#...."),
    "Q": (".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"),
    "R": ("####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"),
    "S": (".####", "#....", "#....", ".###.", "....#", "....#", "####."),
    "T": ("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."),
    "U": ("#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "V": ("#...#", "#...#", "#...#", "#...#", "#...#", ".#.#.", "..#.."),
    "W": ("#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"),
    "X": ("#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"),
    "Y": ("#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."),
    "Z": ("#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"),
    "[": (".###.", ".#...", ".#...", ".#...", ".#...", ".#...", ".###."),
    "\\": (".....", "#....", ".#...", "..#..", "...#.", "....#", "....."),
    "]": (".###.", "...#.", "...#.", "...#.", "...#.", "...#.", ".###."),
    "^": ("..#..", ".#.#.", "#...#", ".....", ".....", ".....", "....."),
    "_": (".....", ".....", ".....", ".....", ".....", ".....", "#####"),
    "`": (".#...", "..#..", "...#.", ".....", ".....", ".....", "....."),
    "a": (".....", ".....", ".###.", "....#", ".####", "#...#", ".####"),
    "b": ("#....", "#....", "#.##.", "##..#", "#...#", "#...#", "####."),
    "c": (".....", ".....", ".###.", "#....", "#....", "#...#", ".###."),
    "d": ("....#", "....#", ".##.#", "#..##", "#...#", "#...#", ".####"),
    "e": (".....", ".....", ".###.", "#...#", "#####", "#....", ".###."),
    "f": ("..##.", ".#..#", ".#...", "###..", ".#...", ".#...", ".#..."),
    "g": (".....", ".....", ".####", "#...#", ".####", "....#", ".###."),
    "h": ("#....", "#....", "#.##.", "##..#", "#...#", "#...#", "#...#"),
    "i": ("..#..", ".....", ".##..", "..#..", "..#..", "..#..", ".###."),
    "j": ("...#.", ".....", "..##.", "...#.", "...#.", "#..#.", ".##.."),
    "k": ("#....", "#....", "#..#.", "#.#..", "##...", "#.#..", "#..#."),
    "l": (".##..", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "m": (".....", ".....", "##.#.", "#.#.#", "#.#.#", "#.#.#", "#.#.#"),
    "n": (".....", ".....", "#.##.", "##..#", "#...#", "#...#", "#...#"),
    "o": (".....", ".....", ".###.", "#...#", "#...#", "#...#", ".###."),
    "p": (".....", ".....", "####.", "#...#", "####.", "#....", "#...."),
    "q": (".....", ".....", ".####", "#...#", ".####", "....#", "....#"),
    "r": (".....", ".....", "#.##.", "##..#", "#....", "#....", "#...."),
    "s": (".....", ".....", ".####", "#....", ".###.", "....#", "####."),
    "t": (".#...", ".#...", "###..", ".#...", ".#...", ".#..#", "..##."),
    "u": (".....", ".....", "#...#", "#...#", "#...#", "#..##", ".##.#"),
    "v": (".....", ".....", "#...#", "#...#", "#...#", ".#.#.", "..#.."),
    "w": (".....", ".....", "#...#", "#...#", "#.#.#", "#.#.#", ".#.#."),
    "x": (".....", ".....", "#...#", ".#.#.", "..#..", ".#.#.", "#...#"),
    "y": (".....", ".....", "#...#", "#...#", ".####", "....#", ".###."),
    "z": (".....", ".....", "#####", "...#.", "..#..", ".#...", "#####"),
    "{": ("...#.", "..#..", "..#..", ".#...", "..#..", "..#..", "...#."),
    "|": ("..#..", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."),
    "}": (".#...", "..#..", "..#..", "...#.", "..#..", "..#..", ".#..."),
    "~": (".....", ".....", ".#..#", "#.#.#", "#..#.", ".....", "....."),
}

# Fallback for renderable codepoints without a glyph (Latin-1 accents
# etc.): a 5x7 border box — 20 ink pixels.
_BOX: tuple[str, ...] = ("#####", "#...#", "#...#", "#...#", "#...#",
                         "#...#", "#####")


def _is_blank(code: int) -> bool:
    """Ink-less advance: controls + space (<33), DEL, NBSP."""
    return code < 33 or code == 127 or code == 160


_ATLAS = None   # (257, GLYPH_H, ADV) bool; index 256 = fallback box
_BLANK_LUT = None  # (257,) bool


def _atlas():
    """Lazy numpy glyph atlas: one boolean (7, 6) cell per Latin-1
    code (glyph left-aligned, 1-px gap column), slot 256 = the
    fallback box every codepoint >255 clips to. Lets a whole run
    stamp as one gather + reshape instead of per-pixel Python."""
    global _ATLAS, _BLANK_LUT
    if _ATLAS is None:
        import numpy as np
        atlas = np.zeros((257, GLYPH_H, ADV), dtype=bool)
        blank = np.zeros(257, dtype=bool)
        box = np.array([[c == "#" for c in row] for row in _BOX])
        for code in range(257):
            if code <= 255 and _is_blank(code):
                blank[code] = True
                continue
            rows = FONT.get(chr(code)) if code <= 255 else None
            cell = (np.array([[c == "#" for c in r] for r in rows])
                    if rows is not None else box)
            atlas[code, :, :GLYPH_W] = cell
        _ATLAS = atlas
        _BLANK_LUT = blank
    return _ATLAS, _BLANK_LUT


def glyph_rows(ch: str) -> tuple[str, ...] | None:
    """The 5x7 rows a char stamps, or None for an ink-less advance."""
    if _is_blank(ord(ch)):
        return None
    return FONT.get(ch, _BOX)


def glyph_ink(ch: str) -> int:
    """Ink pixels a lone stamp of ``ch`` contributes (0 for blanks)."""
    rows = glyph_rows(ch)
    return sum(r.count("#") for r in rows) if rows else 0


def _image_bbox(ctm: tuple) -> tuple[float, float, float, float]:
    """Device-space bbox (x0, x1, y_bot, y_top) of the unit square an
    image XObject paints under ``cm`` matrix (a, b, c, d, e, f)."""
    a, b, c, d, e, f = ctm
    xs = (e, a + e, c + e, a + c + e)
    ys = (f, b + f, d + f, b + d + f)
    return min(xs), max(xs), min(ys), max(ys)


def render_runs(runs: list[tuple], pad: int = 2,
                images: list[tuple] | None = None) -> dict:
    """Render positioned text runs (the ``pdf_text._page_runs`` tuple
    shape — x, y, size, text[, advance]) onto a cropped grayscale
    canvas. ``images`` is an optional list of ``(ctm, img)`` pairs
    (img = ``{"width", "height", "pixels"}`` gray plane, the
    ``decode_image_xobject`` shape); each is inverse-CTM
    nearest-neighbor sampled into its device rect. Compositing is
    darkest-wins (min), so text stays legible over images regardless of
    paint order. Returns width/height/pixels/n_glyphs/n_images/
    ink_pixels; ink is counted from the bitmap (pure-black pixels), not
    summed per glyph, so overlaps collapse and image grays don't count.
    """
    runs = [r for r in runs if r[3]]
    images = images or []
    if not runs and not images:
        side = max(2 * pad, 1)
        return {"width": side, "height": side,
                "pixels": bytes([255]) * (side * side),
                "n_glyphs": 0, "n_images": 0, "ink_pixels": 0}
    # unified device bbox: each glyph box spans [y - GLYPH_H, y]
    xs0 = [r[0] for r in runs]
    xs1 = [r[0] + ADV * len(r[3]) for r in runs]
    ytops = [r[1] for r in runs]
    ybots = [r[1] - GLYPH_H for r in runs]
    for ctm, _img in images:
        x0, x1, y0, y1 = _image_bbox(ctm)
        xs0.append(x0)
        xs1.append(x1)
        ybots.append(y0)
        ytops.append(y1)
    min_x, max_x = min(xs0), max(xs1)
    top_y, bot_y = max(ytops), min(ybots)
    width = max(1, 2 * pad + round(max_x - min_x))
    height = max(1, 2 * pad + round(top_y - bot_y))
    # fail-closed allocation cap: a hostile CTM (translate-by-1e9) or
    # absurd run coordinates would otherwise size the canvas in GBs
    if width * height > (1 << 26):  # 64M px ≈ 26k x 26k pt page
        raise ValueError("page raster exceeds the 64M-pixel cap")
    import numpy as np
    canvas = np.full((height, width), 255, dtype=np.uint8)

    for ctm, img in images:
        a, b, c, d, e, f = ctm
        det = a * d - b * c
        if abs(det) < 1e-9 or not img["pixels"]:
            continue
        iw, ih = img["width"], img["height"]
        x0, x1, y0, y1 = _image_bbox(ctm)
        col0 = max(0, pad + round(x0 - min_x))
        col1 = min(width - 1, pad + round(x1 - min_x))
        row0 = max(0, pad + round(top_y - y1))
        row1 = min(height - 1, pad + round(top_y - y0))
        if col1 < col0 or row1 < row0:
            continue
        # sample at pixel CENTERS so the rect edges don't fall on the
        # u/v = 0/1 boundary (top row of an image at the canvas edge
        # would otherwise miss at exactly v = 1.0)
        dx = min_x + (np.arange(col0, col1 + 1) - pad) + 0.5
        dy = top_y - (np.arange(row0, row1 + 1) - pad) - 0.5
        gx, gy = np.meshgrid(dx, dy)
        # inverse CTM: device point -> image unit square (u, v)
        u = (d * (gx - e) - c * (gy - f)) / det
        v = (-b * (gx - e) + a * (gy - f)) / det
        inside = (u >= 0.0) & (u < 1.0) & (v >= 0.0) & (v < 1.0)
        sx = np.clip((u * iw).astype(np.int64), 0, iw - 1)
        sy = np.clip(((1.0 - v) * ih).astype(np.int64), 0, ih - 1)
        plane = np.frombuffer(img["pixels"], dtype=np.uint8,
                              count=iw * ih).reshape(ih, iw)
        vals = np.where(inside, plane[sy, sx], 255).astype(np.uint8)
        region = canvas[row0:row1 + 1, col0:col1 + 1]
        np.minimum(region, vals, out=region)

    atlas, blank = _atlas()
    n_glyphs = 0
    for r in runs:
        x0 = pad + round(r[0] - min_x)
        row0 = pad + round(top_y - r[1])
        codes = np.fromiter((min(ord(ch), 256) for ch in r[3]),
                            dtype=np.int32, count=len(r[3]))
        n_glyphs += int((~blank[codes]).sum())
        # one gather: (L, 7, 6) cells -> a (7, 6L) ink strip
        strip = atlas[codes].transpose(1, 0, 2).reshape(
            GLYPH_H, len(codes) * ADV)
        canvas[row0:row0 + GLYPH_H, x0:x0 + len(codes) * ADV][strip] = 0
    return {"width": width, "height": height,
            "pixels": canvas.tobytes(),
            "n_glyphs": n_glyphs, "n_images": len(images),
            "ink_pixels": int((canvas == 0).sum())}


def rasterize_to_base64(data: bytes, pad: int = 2) -> list[str]:
    """API-surface twin of the reference's
    ``_process_file_to_images_base64(path, fmt) -> List[str]``
    (/root/reference/app/services/resume_parser.py:82-114): one base64
    string per page, here always PNG (the reference's default fmt)."""
    import base64
    return [base64.b64encode(p["png"]).decode("ascii")
            for p in rasterize_pdf(data, pad=pad)]


def rasterize_pdf(data: bytes, pad: int = 2, png: bool = True) -> list[dict]:
    """Rasterize every page of a PDF to a grayscale PNG + ink stats.

    Text runs are stamped with the 5x7 font; painted image XObjects
    (collected in paint order with their ``cm`` placement by the
    content interpreter) are decoded via ``decode_image_xobject`` and
    composited into their device rects — undecodable or unsupported
    images are skipped fail-open, like ``pdf_image_metadata``. Returns
    one dict per page: ``{"page", "width", "height", "n_glyphs",
    "n_images", "ink_pixels", "png"}`` (png = real PNG bytes of the
    rendered canvas, or None with ``png=False`` — stats-only callers
    like the rasterize_pages kernel skip the zlib encode entirely).
    Raises ``PdfError`` on structural failure and ``ValueError`` past
    the 64M-pixel canvas cap — the caller decides fail-open vs
    fail-closed, like ``extract_pdf``.
    """
    doc = _Document(data)
    out = []
    for pno, page in enumerate(doc.pages()):
        sink: list = []
        runs = _page_runs(doc, page, image_sink=sink)
        images = []
        for _name, ctm, xo in sink:
            try:
                img = decode_image_xobject(doc, xo)
            except ValueError:
                img = None  # fail-open: skip the bad image
            if img is not None:
                images.append((ctm, img))
        r = render_runs(runs, pad=pad, images=images)
        out.append({"page": pno, "width": r["width"],
                    "height": r["height"], "n_glyphs": r["n_glyphs"],
                    "n_images": r["n_images"],
                    "ink_pixels": r["ink_pixels"],
                    "png": (make_png(r["width"], r["height"], r["pixels"])
                            if png else None)})
    return out
