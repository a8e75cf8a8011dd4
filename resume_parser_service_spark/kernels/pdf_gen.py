"""Deterministic minimal-PDF generator.

Produces classic-xref PDF 1.4 files with FlateDecode content streams,
a simple Latin-1 font carrying an identity ToUnicode CMap, Tj text
operators, and optional ``/Annots -> /A -> /URI`` link annotations.

Used to synthesize the ``pages`` corpus (BASELINE.json input_hint) and
kernel round-trip tests: ``extract(make_pdf(pages)) == "\\n\\n".join(pages)``.

The file layout mirrors what the reference validates on upload — the
``%PDF`` magic and a parseable structure with >=1 page
(/root/reference/app/routers/resume_ingestor_router.py:26-28,102-141) —
but the writer itself is original, built from the public PDF 1.7 spec
(ISO 32000-1): header, indirect objects, classic xref table, trailer.

Generation constraints (documented, enforced by the corpus generator):
page texts are Latin-1, use single ``\\n`` between non-empty lines, and
contain no empty lines (an empty line has no text run, so it cannot
round-trip through a layout parser byte-identically).
"""

from __future__ import annotations

import zlib

__all__ = ["make_pdf"]

# Page geometry: US Letter, 1in left margin, start at y=760, 14pt leading.
_X0 = 72
_Y0 = 760.0
_LEADING = 14.0
_FONT_SIZE = 11


def _esc_pdf_string(s: str) -> bytes:
    """Encode text as a Latin-1 PDF literal string with escapes."""
    out = bytearray()
    for ch in s:
        b = ord(ch)
        if b > 255:
            raise ValueError(f"non-Latin-1 char {ch!r} not supported by generator")
        if ch in "()\\":
            out += b"\\" + ch.encode("latin-1")
        elif 32 <= b <= 126:
            out.append(b)
        else:
            out += ("\\%03o" % b).encode("ascii")
    return bytes(out)


def _tounicode_cmap() -> bytes:
    """Identity ToUnicode CMap for 1-byte Latin-1 codes 0x20..0xFF."""
    lines = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CMapName /Adobe-Identity-UCS def",
        b"/CMapType 2 def",
        b"1 begincodespacerange",
        b"<20> <ff>",
        b"endcodespacerange",
        b"1 beginbfrange",
        b"<20> <ff> <0020>",
        b"endbfrange",
        b"endcmap",
        b"CMapName currentdict /CMap defineresource pop",
        b"end",
        b"end",
    ]
    return b"\n".join(lines)


def _content_stream(page_text: str) -> bytes:
    """Build the uncompressed content stream for one page of text."""
    ops = [b"BT", b"/F1 %d Tf" % _FONT_SIZE, b"%.1f TL" % _LEADING,
           b"%d %.1f Td" % (_X0, _Y0)]
    for i, line in enumerate(page_text.split("\n")):
        if i > 0:
            ops.append(b"T*")
        if line:
            ops.append(b"(" + _esc_pdf_string(line) + b") Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


def _ascii85_encode(data: bytes) -> bytes:
    """ASCII85 per spec 7.4.3 (with '~>' terminator, no 'z' shorthand)."""
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i:i + 4]
        n = len(chunk)
        acc = int.from_bytes(chunk + b"\x00" * (4 - n), "big")
        digits = []
        for _ in range(5):
            digits.append(acc % 85)
            acc //= 85
        out += bytes(33 + d for d in reversed(digits))[: n + 1]
    return bytes(out) + b"~>"


def _runlength_encode(data: bytes) -> bytes:
    """RunLengthDecode-compatible encoder (spec 7.4.5) + EOD byte."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while (j < n and j - i < 128 and
                   not (j + 2 < n and data[j] == data[j + 1] == data[j + 2])):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out) + b"\x80"


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """LZWDecode-compatible encoder (spec 7.4.4, MSB-first 9->12 bit
    codes, EarlyChange honored by tracking the DECODER's table length
    so width switches line up exactly)."""
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    dec_len = 258  # decoder-side table length (lags encoder by one)
    bits: list[tuple[int, int]] = [(256, width)]
    first = True

    def bump_after_emit():
        nonlocal dec_len, width, first
        if first:  # decoder appends nothing on the first code
            first = False
        else:
            dec_len += 1
        if dec_len + early_change >= (1 << width) and width < 12:
            width += 1

    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        bits.append((table[cur], width))
        bump_after_emit()
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
        cur = bytes([b])
    if cur:
        bits.append((table[cur], width))
        bump_after_emit()
    bits.append((257, width))

    out = bytearray()
    acc = 0
    nbits = 0
    for code, w in bits:
        acc = (acc << w) | code
        nbits += w
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# content-stream filter name -> (encoder, needs /DecodeParms)
_FILTERS = {
    "FlateDecode": lambda d: zlib.compress(d, 9),
    "ASCIIHexDecode": lambda d: d.hex().encode("ascii") + b">",
    "ASCII85Decode": _ascii85_encode,
    "RunLengthDecode": _runlength_encode,
    "LZWDecode": _lzw_encode,
}


def make_pdf(pages: list[str], links: list[str] | None = None,
             compress: bool = True, xref_stream: bool = False,
             objstm: bool = False, tounicode: bool = True,
             differences: dict[int, str] | None = None,
             content_filter: str | list[str] | None = None,
             images: list[list[dict]] | None = None) -> bytes:
    """Build a deterministic multi-page PDF carrying ``pages`` texts.

    ``links`` become ``/URI`` link annotations on page 1 (order kept),
    mirroring the link semantics the reference extracts
    (/root/reference/app/services/resume_parser.py:198-222).

    ``xref_stream=True`` emits a PDF 1.5 cross-reference STREAM instead
    of a classic table; ``objstm=True`` additionally packs all
    non-stream objects into a compressed object stream — the layout of
    modern tooling output, exercising the parser's 7.5.7/7.5.8 paths.

    ``tounicode=False`` omits the ToUnicode CMap so decoding must go
    through the /Encoding tables (the no-ToUnicode breadth path);
    ``differences`` writes an /Encoding dict with a /Differences array
    mapping byte codes to glyph NAMES (e.g. {233: "eacute"}).

    ``content_filter`` overrides ``compress`` with an explicit content
    stream filter name or chain in decode order (e.g. "LZWDecode" or
    ["ASCII85Decode", "FlateDecode"]) — exercises the kernel's
    non-Flate filter paths (spec 7.4).

    ``images`` embeds image XObjects: one list of specs per page, each
    ``{"kind": "jpeg", "data": jpeg_bytes, "width": w, "height": h}``
    (stored verbatim under /Filter /DCTDecode — spec 7.4.8) or
    ``{"kind": "gray", "width": w, "height": h, "pixels": bytes}``
    (8-bit /DeviceGray, FlateDecode). Each image is named /Im{k} in the
    page's /XObject resources and placed with a ``cm``+``Do`` pair
    after the text block, so extracted TEXT is byte-unchanged.
    """
    if not pages:
        raise ValueError("need at least one page")
    links = links or []
    images = images or []
    if len(images) > len(pages):
        raise ValueError("more image-spec lists than pages")
    for specs in images:
        for spec in specs:
            if spec.get("kind") not in ("jpeg", "gray"):
                raise ValueError(f"unknown image kind {spec.get('kind')!r}")
            needed = ("data", "width", "height") if spec["kind"] == "jpeg" \
                else ("pixels", "width", "height")
            missing = [k for k in needed if k not in spec]
            if missing:
                raise ValueError(
                    f"{spec['kind']} image spec missing {missing}")
    objs: dict[int, bytes] = {}  # obj number -> body (without "N 0 obj"/"endobj")

    n_pages = len(pages)
    # Object numbering: 1=Catalog, 2=Pages, 3=Font, 4=ToUnicode stream,
    # then per page i: (5+2i)=Page, (6+2i)=Content; links appended
    # after, then image XObjects in (page, slot) order.
    page_obj = [5 + 2 * i for i in range(n_pages)]
    content_obj = [6 + 2 * i for i in range(n_pages)]
    next_obj = 5 + 2 * n_pages
    annot_objs = list(range(next_obj, next_obj + len(links)))
    img_objs: list[list[int]] = []
    cursor = next_obj + len(links)
    for i in range(n_pages):
        specs = images[i] if i < len(images) else []
        img_objs.append(list(range(cursor, cursor + len(specs))))
        cursor += len(specs)

    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = b" ".join(b"%d 0 R" % p for p in page_obj)
    objs[2] = b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    if differences:
        diff_items = b" ".join(
            b"%d /%s" % (code, name.encode("ascii"))
            for code, name in sorted(differences.items()))
        enc = (b" /Encoding << /Type /Encoding"
               b" /BaseEncoding /WinAnsiEncoding"
               b" /Differences [" + diff_items + b"] >>")
    else:
        enc = b" /Encoding /WinAnsiEncoding"
    tu = b" /ToUnicode 4 0 R" if tounicode else b""
    objs[3] = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
               enc + tu + b" >>")
    if tounicode:
        cmap = _tounicode_cmap()
        objs[4] = ((b"<< /Length %d >>\nstream\n" % len(cmap)) + cmap +
                   b"\nendstream")
    else:
        objs[4] = b"<< >>"  # placeholder keeps object numbering stable

    for i in range(n_pages):
        annots = b""
        if i == 0 and annot_objs:
            annots = (b" /Annots [" +
                      b" ".join(b"%d 0 R" % a for a in annot_objs) + b"]")
        xobj_res = b""
        if img_objs[i]:
            xobj_res = (b" /XObject << " +
                        b" ".join(b"/Im%d %d 0 R" % (k, num)
                                  for k, num in enumerate(img_objs[i])) +
                        b" >>")
        objs[page_obj[i]] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 3 0 R >>" + xobj_res + b" >>"
            b" /Contents %d 0 R" % content_obj[i] + annots + b" >>")
        raw = _content_stream(pages[i])
        for k, spec in enumerate(images[i] if i < len(images) else []):
            raw += (b"\nq %d 0 0 %d 72 %d cm /Im%d Do Q"
                    % (2 * spec["width"], 2 * spec["height"],
                       360 - 40 * k, k))
        if content_filter is not None:
            # /Filter lists names in DECODE order (spec 7.3.8.2), so the
            # encoders run in reverse.
            names = ([content_filter] if isinstance(content_filter, str)
                     else list(content_filter))
            data = raw
            for nm in reversed(names):
                data = _FILTERS[nm](data)
            if len(names) == 1:
                fspec = b"/Filter /" + names[0].encode("ascii")
            else:
                fspec = (b"/Filter [" +
                         b" ".join(b"/" + nm.encode("ascii") for nm in names)
                         + b"]")
            head = b"<< /Length %d %s >>" % (len(data), fspec)
        elif compress:
            data = zlib.compress(raw, 9)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            data = raw
            head = b"<< /Length %d >>" % len(data)
        objs[content_obj[i]] = head + b"\nstream\n" + data + b"\nendstream"

    for j, (aobj, uri) in enumerate(zip(annot_objs, links)):
        y1 = 700 - 20 * j
        objs[aobj] = (
            b"<< /Type /Annot /Subtype /Link /Rect [72 %d 300 %d]"
            b" /Border [0 0 0]"
            b" /A << /Type /Action /S /URI /URI (" % (y1, y1 + 14) +
            _esc_pdf_string(uri) + b") >> >>")

    for i in range(n_pages):
        for num, spec in zip(img_objs[i], images[i] if i < len(images)
                             else []):
            if spec["kind"] == "jpeg":
                payload, filt = spec["data"], b"/DCTDecode"
            else:  # "gray" — every other kind was rejected upfront
                if len(spec["pixels"]) != spec["width"] * spec["height"]:
                    raise ValueError("gray image pixel buffer mismatch")
                payload, filt = zlib.compress(spec["pixels"], 9), \
                    b"/FlateDecode"
            objs[num] = (
                b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
                b" /ColorSpace /DeviceGray /BitsPerComponent 8"
                b" /Filter %s /Length %d >>\nstream\n"
                % (spec["width"], spec["height"], filt, len(payload))
                + payload + b"\nendstream")

    if xref_stream:
        return _serialize_modern(objs, objstm)
    # Serialize with a classic xref table.
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    max_obj = max(objs)
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (max_obj + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, max_obj + 1):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (max_obj + 1, xref_pos))
    return bytes(out)


def _serialize_modern(objs: dict[int, bytes], objstm: bool) -> bytes:
    """Serialize with a PDF 1.5 XRef stream; optionally pack non-stream
    objects into a compressed /ObjStm."""
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    max_obj = max(objs)
    entries: dict[int, tuple] = {}  # num -> ("off", o) | ("stm", s, i)

    packed: list[int] = []
    if objstm:  # stream objects may not live in an ObjStm (spec 7.5.7)
        packed = [n for n in sorted(objs) if b"\nstream\n" not in objs[n]]
    loose = [n for n in sorted(objs) if n not in packed]

    stm_num = max_obj + 1 if packed else None
    if packed:
        header = bytearray()
        bodies = bytearray()
        for i, n in enumerate(packed):
            header += b"%d %d " % (n, len(bodies))
            bodies += objs[n] + b"\n"
            entries[n] = ("stm", stm_num, i)
        payload = bytes(header) + bytes(bodies)
        comp = zlib.compress(payload, 9)
        stm_body = (b"<< /Type /ObjStm /N %d /First %d /Length %d"
                    b" /Filter /FlateDecode >>\nstream\n"
                    % (len(packed), len(header), len(comp))) + comp + \
            b"\nendstream"
        objs = dict(objs)
        objs[stm_num] = stm_body
        loose = loose + [stm_num]

    for n in loose:
        entries[n] = ("off", len(out))
        out += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"

    xref_num = (stm_num or max_obj) + 1
    xref_pos = len(out)
    size = xref_num + 1
    rows = bytearray()
    rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
    for n in range(1, size):
        if n == xref_num:
            rows += bytes([1]) + xref_pos.to_bytes(4, "big") + b"\x00\x00"
        elif n in entries:
            kind = entries[n]
            if kind[0] == "off":
                rows += bytes([1]) + int(kind[1]).to_bytes(4, "big") + b"\x00\x00"
            else:
                rows += (bytes([2]) + int(kind[1]).to_bytes(4, "big") +
                         int(kind[2]).to_bytes(2, "big"))
        else:
            rows += bytes([0]) + (0).to_bytes(4, "big") + b"\xff\xff"
    comp_rows = zlib.compress(bytes(rows), 9)
    out += (b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R"
            b" /Filter /FlateDecode /Length %d >>\nstream\n"
            % (xref_num, size, len(comp_rows)))
    out += comp_rows + b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)
