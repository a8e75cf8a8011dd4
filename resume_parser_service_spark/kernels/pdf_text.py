"""Deterministic PDF text + hyperlink extraction (pure Python, no deps).

Replaces the reference's remote OCR pipeline (Azure ``prebuilt-read`` at
/root/reference/app/services/read_azure.py:12-42 and GPT-4o vision OCR at
/root/reference/app/services/resume_parser.py:170-196) with a local
byte-stream layout parser, per BASELINE.json ``north_star``. Hyperlink
extraction mirrors /root/reference/app/services/resume_parser.py:198-222
(per page ``/Annots`` -> ``/A`` -> ``/URI``, order kept, uri-less
annotations dropped).

Built from the public PDF 1.7 spec (ISO 32000-1). Scope (matches every
reference fixture, probed — see FIXTURES.md §5): classic xref tables
(incl. /Prev chains) AND PDF 1.5+ xref/object streams, stream filters
FlateDecode (with PNG predictors) / LZWDecode / ASCIIHexDecode /
ASCII85Decode / RunLengthDecode, simple + Type0 + Type3 fonts with
ToUnicode CMaps or /Encoding tables (WinAnsi/MacRoman/Standard +
/Differences; Type3 widths normalized through /FontMatrix),
BT/ET text blocks with Tf/Td/TD/Tm/T*/TL/Tj/TJ/'/" operators, q/Q/cm
graphics state. Unsupported filters (DCTDecode images etc.) are
skipped — they carry no text; encrypted files raise PdfError.

Output contract (total, version-frozen; bump KERNEL_VERSION on change):
text runs are grouped into lines by device-space baseline (banded at
40% of the median font size), lines sorted top-to-bottom then
left-to-right; run advances come from parsed glyph widths (/Widths,
CIDFont /W) and runs within a line are joined with a space iff the
residual x-gap exceeds 0.20 * font size; two-column pages (detected by
an uncovered >=18pt vertical gutter with >=15% of runs on each side)
are emitted left column then right column, except that a line
containing a gutter-crossing run (a full-width header) is kept whole;
lines joined with "\n", pages joined with "\n\n".
"""

from __future__ import annotations

import re
import zlib

__all__ = ["extract_pdf", "PdfError", "KERNEL_VERSION"]

KERNEL_VERSION = "pdf-1.6.1"

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class PdfError(ValueError):
    """Structurally invalid PDF (mirrors the reference's PdfStreamError
    handling at /root/reference/app/routers/resume_ingestor_router.py:129-141)."""


class _Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num, self.gen = num, gen

    def __repr__(self):
        return f"_Ref({self.num},{self.gen})"


class _Name(str):
    """PDF name object (distinct from strings)."""


class _Stream:
    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.dict, self.raw = d, raw


# ---------------------------------------------------------------- lexer ---

def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:  # '%' comment
            while pos < n and data[pos] not in b"\r\n":
                pos += 1
        else:
            break
    return pos


def _parse_name(data: bytes, pos: int) -> tuple[_Name, int]:
    pos += 1  # '/'
    out = bytearray()
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS or c in _DELIM:
            break
        if c == 0x23 and pos + 2 < n:  # '#xx' hex escape
            try:
                out.append(int(data[pos + 1:pos + 3], 16))
                pos += 3
                continue
            except ValueError:
                pass
        out.append(c)
        pos += 1
    return _Name(out.decode("latin-1")), pos


def _parse_literal_string(data: bytes, pos: int) -> tuple[bytes, int]:
    pos += 1  # '('
    out = bytearray()
    depth = 1
    n = len(data)
    while pos < n:
        c = data[pos]
        if c == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = data[pos]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                pos += 1
            elif e in b"()\\":
                out.append(e)
                pos += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray()
                while pos < n and len(oct_digits) < 3 and 0x30 <= data[pos] <= 0x37:
                    oct_digits.append(data[pos])
                    pos += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                pos += 1
                if e == 0x0D and pos < n and data[pos] == 0x0A:
                    pos += 1
            else:
                out.append(e)
                pos += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                pos += 1
                break
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    return bytes(out), pos


def _parse_hex_string(data: bytes, pos: int) -> tuple[bytes, int]:
    pos += 1  # '<'
    end = data.find(b">", pos)
    if end < 0:  # unterminated hex string: structural, not a ValueError
        raise PdfError("unterminated hex string")
    hexs = re.sub(rb"[^0-9A-Fa-f]", b"", data[pos:end])
    if len(hexs) % 2:
        hexs += b"0"
    return bytes.fromhex(hexs.decode("ascii")), end + 1


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


def _parse_object(data: bytes, pos: int):
    """Parse one PDF object at pos. Returns (obj, new_pos)."""
    pos = _skip_ws(data, pos)
    if pos >= len(data):
        raise PdfError("unexpected EOF")
    c = data[pos]
    if c == 0x2F:  # /name
        return _parse_name(data, pos)
    if c == 0x28:  # (string)
        return _parse_literal_string(data, pos)
    if c == 0x3C:  # << dict >> or <hex>
        if data[pos:pos + 2] == b"<<":
            return _parse_dict(data, pos)
        return _parse_hex_string(data, pos)
    if c == 0x5B:  # [ array ]
        pos += 1
        arr = []
        while True:
            pos = _skip_ws(data, pos)
            if pos < len(data) and data[pos] == 0x5D:
                return arr, pos + 1
            obj, pos = _parse_object(data, pos)
            arr.append(obj)
    if data.startswith(b"true", pos):
        return True, pos + 4
    if data.startswith(b"false", pos):
        return False, pos + 5
    if data.startswith(b"null", pos):
        return None, pos + 4
    m = _NUM_RE.match(data, pos)
    if m:
        tok = m.group(0)
        end = m.end()
        # Could be "N G R" indirect reference.
        if b"." not in tok and not tok.startswith(b"-"):
            look = _skip_ws(data, end)
            m2 = _NUM_RE.match(data, look)
            if m2 and b"." not in m2.group(0):
                look2 = _skip_ws(data, m2.end())
                if data.startswith(b"R", look2) and (
                        look2 + 1 >= len(data)
                        or data[look2 + 1] in _WS or data[look2 + 1] in _DELIM):
                    return _Ref(int(tok), int(m2.group(0))), look2 + 1
        return (float(tok) if b"." in tok else int(tok)), end
    raise PdfError(f"cannot parse object at byte {pos}")


def _parse_dict(data: bytes, pos: int):
    pos += 2  # '<<'
    d: dict = {}
    n = len(data)
    while True:
        pos = _skip_ws(data, pos)
        if pos >= n:
            raise PdfError("unterminated dict")
        if data.startswith(b">>", pos):
            pos += 2
            break
        key, pos = _parse_name(data, pos)
        val, pos = _parse_object(data, pos)
        d[key] = val
    # stream?
    look = _skip_ws(data, pos)
    if data.startswith(b"stream", look):
        look += 6
        if data.startswith(b"\r\n", look):
            look += 2
        elif look < n and data[look] in b"\r\n":
            look += 1
        return _Stream(d, data[look:]), look  # raw sliced lazily by /Length
    return d, pos


# ------------------------------------------------------------- document ---

class _Document:
    def __init__(self, data: bytes, password: bytes = b""):
        self._password = password
        if not data.startswith(b"%PDF"):
            raise PdfError("missing %PDF header")
        self.data = data
        self._cache: dict[int, object] = {}
        self._font_cache: dict = {}  # doc-level: fonts shared across pages
        self._rescanned = False
        self._crypt = None
        self._crypt_skip: int | None = None
        self.offsets: dict[int, int] = {}
        self.trailer: dict = {}
        try:
            self._load_xref()
        except Exception:
            self.offsets = {}
        if not self.offsets or "Root" not in self.trailer:
            self._scan_objects()
        if self.trailer.get("Encrypt") is not None:
            self._init_crypt()
        if "Root" not in self.trailer:
            raise PdfError("no /Root in trailer")

    def _init_crypt(self):
        """Standard security handler (ISO 32000 §7.6): attempt the empty
        user password — the common "encrypted but openable" crawl case.
        A real password or a non-standard handler fails loudly into the
        FileProcessingError audit path rather than emit mojibake.
        (The reference fails ALL encrypted uploads: pdf2image raises and
        app/services/resume_parser.py:60-78 maps it to
        FileProcessingError — here only truly locked files fail.)"""
        from . import pdf_crypt
        ref = self.trailer["Encrypt"]
        if isinstance(ref, _Ref):
            self._crypt_skip = ref.num
        enc = self.resolve(ref)
        if not isinstance(enc, dict):
            raise PdfError("malformed /Encrypt")
        filt = self.resolve(enc.get("Filter"))
        if filt != "Standard":
            raise PdfError(f"unsupported security handler {filt!r}")
        plain = {str(k): self.resolve(v) for k, v in enc.items()}
        cf = plain.get("CF")
        if isinstance(cf, dict):
            plain["CF"] = {
                str(k): {str(k2): self.resolve(v2)
                         for k2, v2 in self.resolve(v).items()}
                for k, v in cf.items()
                if isinstance(self.resolve(v), dict)}
        ids = self.resolve(self.trailer.get("ID"))
        id0 = b""
        if isinstance(ids, list) and ids and isinstance(ids[0], bytes):
            id0 = ids[0]
        try:
            self._crypt = pdf_crypt.StandardSecurityHandler(
                plain, id0, password=self._password)
        except pdf_crypt.CryptError as e:
            raise PdfError(f"encrypted PDF: {e}")
        # objects cached while resolving /Encrypt were parsed without
        # decryption — drop them so every re-read decrypts
        self._cache.clear()

    def _decrypt_obj(self, obj, num: int, gen: int):
        """Recursively decrypt strings (and a stream body) of a freshly
        parsed TOP-LEVEL object (spec 7.6.2: strings/streams in object
        streams or xref streams are never individually encrypted — both
        of those bypass this path)."""
        if isinstance(obj, bytes):
            return self._crypt.decrypt_string(obj, num, gen)
        if isinstance(obj, list):
            return [self._decrypt_obj(o, num, gen) for o in obj]
        if isinstance(obj, dict):
            return {k: self._decrypt_obj(v, num, gen)
                    for k, v in obj.items()}
        if isinstance(obj, _Stream):
            d = {k: self._decrypt_obj(v, num, gen)
                 for k, v in obj.dict.items()}
            raw = obj.raw
            if self._stream_crypt_name(obj) != "Identity":
                raw = self._crypt.decrypt_stream(raw, num, gen)
            return _Stream(d, raw)
        return obj

    @staticmethod
    def _stream_crypt_name(stream: _Stream) -> str | None:
        """Name of the stream's /Crypt filter (spec 7.4.10), or None
        when the default /StmF applies. /Identity exempts the stream
        from decryption; a NAMED crypt filter falls back to the
        default method (single-filter documents in practice)."""
        filters = stream.dict.get("Filter")
        if isinstance(filters, _Name):
            filters = [filters]
        if not isinstance(filters, list) or "Crypt" not in filters:
            return None
        idx = filters.index("Crypt")
        parms = stream.dict.get("DecodeParms")
        if isinstance(parms, list):
            parms = parms[idx] if idx < len(parms) else None
        if isinstance(parms, dict):
            return str(parms.get("Name", "Identity"))
        return "Identity"

    # -- xref chain (classic tables and PDF 1.5+ xref streams)
    def _load_xref(self):
        data = self.data
        tail = data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise PdfError("no startxref")
        pos = int(m.group(1))
        seen = set()
        while pos and pos not in seen:
            seen.add(pos)
            pos = _skip_ws(data, pos)
            if not data.startswith(b"xref", pos):
                pos = self._load_xref_stream(pos)
                continue
            p = pos + 4
            while True:
                p = _skip_ws(data, p)
                if data.startswith(b"trailer", p):
                    p += 7
                    tr, p = _parse_object(data, p)
                    for k, v in tr.items():
                        self.trailer.setdefault(k, v)
                    pos = tr.get("Prev", 0)
                    break
                m2 = re.match(rb"(\d+)\s+(\d+)", data[p:p + 40])
                if not m2:
                    raise PdfError("bad xref subsection")
                start, count = int(m2.group(1)), int(m2.group(2))
                p = p + m2.end()
                entry_re = re.compile(rb"\s*(\d{10})\s+(\d{5})\s*([nf])")
                for i in range(count):
                    m3 = entry_re.match(data, p)
                    if not m3:
                        raise PdfError("truncated xref entry")
                    num = start + i
                    if m3.group(3) == b"n" and num not in self.offsets:
                        self.offsets[num] = int(m3.group(1))
                    p = m3.end()

    def _load_xref_stream(self, pos: int) -> int:
        """PDF 1.5+ cross-reference stream (spec 7.5.8). Entries are
        fixed-width binary rows [type, field2, field3] with widths /W;
        type 1 = direct offset, type 2 = (object stream, index).
        Returns the /Prev offset (0 ends the chain)."""
        data = self.data
        m = re.match(rb"\s*(\d+)\s+(\d+)\s+obj", data[pos:pos + 64])
        if not m:
            raise PdfError("bad xref stream offset")
        obj, _ = _parse_object(data, pos + m.end())
        if not isinstance(obj, _Stream) or obj.dict.get("Type") != "XRef":
            raise PdfError("not an XRef stream")
        length = obj.dict.get("Length")
        if isinstance(length, int) and 0 <= length <= len(obj.raw):
            obj = _Stream(obj.dict, obj.raw[:length])
        body = self.stream_data(obj)
        if body is None:
            raise PdfError("undecodable XRef stream")
        w = obj.dict.get("W")
        size = obj.dict.get("Size", 0)
        if not (isinstance(w, list) and len(w) >= 3):
            raise PdfError("bad /W")
        w = [int(x) for x in w[:3]]
        index = obj.dict.get("Index") or [0, size]
        rowlen = sum(w)

        def field(row: bytes, start: int, width: int, default: int) -> int:
            if width == 0:
                return default
            return int.from_bytes(row[start:start + width], "big")

        ri = 0
        for k in range(0, len(index) - 1, 2):
            first, count = int(index[k]), int(index[k + 1])
            for i in range(count):
                row = body[ri * rowlen:(ri + 1) * rowlen]
                ri += 1
                if len(row) < rowlen:
                    break
                typ = field(row, 0, w[0], 1)
                f2 = field(row, w[0], w[1], 0)
                f3 = field(row, w[0] + w[1], w[2], 0)
                num = first + i
                if num in self.offsets:
                    continue
                if typ == 1:
                    self.offsets[num] = f2
                elif typ == 2:
                    self.offsets[num] = ("objstm", f2, f3)
        for k, v in obj.dict.items():
            if k not in ("Type", "W", "Index", "Length", "Filter",
                         "DecodeParms"):
                self.trailer.setdefault(k, v)
        return obj.dict.get("Prev", 0)

    def _objstm_get(self, stm_num: int, idx: int):
        """Fetch object ``idx`` from object stream ``stm_num``
        (spec 7.5.7: header of N (objnum, offset) pairs, then bodies
        starting at /First)."""
        stm = self.get(stm_num)
        if not isinstance(stm, _Stream):
            return None
        body = self.stream_data(stm)
        if body is None:
            return None
        n = self.resolve(stm.dict.get("N")) or 0
        first = self.resolve(stm.dict.get("First")) or 0
        pairs = []
        p = 0
        for _ in range(int(n)):
            m1 = _NUM_RE.match(body, _skip_ws(body, p))
            if not m1:
                break
            m2 = _NUM_RE.match(body, _skip_ws(body, m1.end()))
            if not m2:
                break
            pairs.append((int(m1.group(0)), int(m2.group(0))))
            p = m2.end()
        if idx >= len(pairs):
            return None
        obj, _ = _parse_object(body, int(first) + pairs[idx][1])
        return obj

    # -- fallback: brute scan of "N G obj"
    def _scan_objects(self):
        for m in re.finditer(rb"(?m)^[^\S\n]*(\d+)\s+(\d+)\s+obj\b", self.data):
            self.offsets[int(m.group(1))] = m.start(1)
        if "Root" not in self.trailer:
            for m in re.finditer(rb"trailer", self.data):
                try:
                    tr, _ = _parse_object(self.data, m.end())
                    if isinstance(tr, dict):
                        for k, v in tr.items():
                            self.trailer.setdefault(k, v)
                except Exception:
                    continue
            if "Root" not in self.trailer:
                # last resort: find the Catalog object directly
                for num in self.offsets:
                    try:
                        obj = self.get(num)
                    except Exception:
                        continue
                    if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                        self.trailer["Root"] = _Ref(num, 0)
                        break

    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        off = self.offsets.get(num)
        if off is None:
            return None
        if isinstance(off, tuple):  # ("objstm", stream_obj_num, index)
            obj = self._objstm_get(off[1], off[2])
            self._cache[num] = obj
            return obj
        data = self.data
        m = re.match(rb"\s*(\d+)\s+(\d+)\s+obj", data[off:off + 64])
        if not m or int(m.group(1)) != num:
            # corrupt-but-parseable xref (offsets point at the wrong
            # bytes — common in crawled/rewritten PDFs): rebuild the
            # offset map once by scanning for "N G obj" markers, the
            # standard recovery path (spec annex C.2 tolerance)
            m = None
            if not self._rescanned:
                self._rescanned = True
                self._cache.clear()
                self._scan_objects()
                off = self.offsets.get(num)
                if off is not None and not isinstance(off, tuple):
                    m = re.match(rb"\s*(\d+)\s+(\d+)\s+obj",
                                 data[off:off + 64])
            if not m or int(m.group(1)) != num:
                raise PdfError(f"object {num} not at recorded offset")
        obj, _ = _parse_object(data, off + m.end())
        if isinstance(obj, _Stream):
            length = self.resolve(obj.dict.get("Length"))
            if isinstance(length, int) and 0 <= length <= len(obj.raw):
                raw = obj.raw[:length]
            else:
                end = obj.raw.find(b"endstream")
                raw = obj.raw[:end if end >= 0 else len(obj.raw)]
            obj = _Stream(obj.dict, raw)
        if self._crypt is not None and num != self._crypt_skip:
            obj = self._decrypt_obj(obj, num, int(m.group(2)))
        self._cache[num] = obj
        return obj

    def resolve(self, obj):
        seen = 0
        while isinstance(obj, _Ref) and seen < 32:
            obj = self.get(obj.num)
            seen += 1
        return obj

    def filter_list(self, stream: _Stream) -> list:
        """/Filter normalized to a resolved list (single name, array,
        or absent — spec 7.3.8.2). Shared by stream_data and
        pdf_image_metadata so name handling cannot drift."""
        filters = self.resolve(stream.dict.get("Filter"))
        if filters is None:
            return []
        if isinstance(filters, list):
            return [self.resolve(f) for f in filters]
        return [filters]

    def stream_data(self, stream: _Stream) -> bytes | None:
        """Decode a stream; returns None if an unsupported filter is hit."""
        flist = self.filter_list(stream)
        data = stream.raw

        def parms_for(i: int) -> dict:
            """/DecodeParms may be a single dict or an array parallel to
            the /Filter array (spec 7.3.8.2) — both are spec-legal and
            writers emit both; ignoring the array form silently skips
            PNG-predictor reversal (garbage xref offsets / garbled
            text)."""
            parms = self.resolve(stream.dict.get("DecodeParms"))
            if isinstance(parms, list):
                parms = self.resolve(parms[i]) if i < len(parms) else None
            return parms if isinstance(parms, dict) else {}

        for i, f in enumerate(flist):
            if f in ("FlateDecode", "Fl"):
                try:
                    data = zlib.decompress(data)
                except zlib.error:
                    try:  # tolerate trailing garbage
                        data = zlib.decompressobj().decompress(data)
                    except zlib.error:
                        return None
                parms = parms_for(i)
                if self.resolve(parms.get("Predictor")) not in (None, 1):
                    data = _undo_png_predictor(
                        data,
                        int(self.resolve(parms.get("Columns")) or 1),
                        int(self.resolve(parms.get("Colors")) or 1),
                        int(self.resolve(parms.get("BitsPerComponent")) or 8))
            elif f in ("ASCIIHexDecode", "AHx"):
                hexs = re.sub(rb"[^0-9A-Fa-f]", b"", data.split(b">")[0])
                if len(hexs) % 2:
                    hexs += b"0"
                data = bytes.fromhex(hexs.decode("ascii"))
            elif f in ("ASCII85Decode", "A85"):
                try:
                    data = _ascii85_decode(data)
                except ValueError:
                    return None
            elif f in ("RunLengthDecode", "RL"):
                data = _runlength_decode(data)
            elif f in ("LZWDecode", "LZW"):
                parms = parms_for(i)
                early = int(self.resolve(parms.get("EarlyChange")) or 1)
                try:
                    data = _lzw_decode(data, early)
                except ValueError:
                    return None
                if self.resolve(
                        parms.get("Predictor")) not in (None, 1):
                    data = _undo_png_predictor(
                        data,
                        int(self.resolve(parms.get("Columns")) or 1),
                        int(self.resolve(parms.get("Colors")) or 1),
                        int(self.resolve(parms.get("BitsPerComponent")) or 8))
            elif f == "Crypt":
                # spec 7.4.10: the Crypt filter names which crypt
                # filter (often /Identity = none) applied to this
                # stream — decryption/exemption is resolved at the
                # object layer (_decrypt_obj); here it is a no-op
                continue
            else:
                return None  # DCTDecode etc. — no text content
        return data

    def pages(self) -> list[dict]:
        """Walk the page tree in order, materializing inherited attrs."""
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PdfError("bad /Root")
        pages_ref = root.get("Pages")
        out: list[dict] = []
        seen: set[int] = set()

        def walk(node_ref, inherited):
            if isinstance(node_ref, _Ref):
                if node_ref.num in seen:
                    return
                seen.add(node_ref.num)
            node = self.resolve(node_ref)
            if not isinstance(node, dict):
                return
            inh = dict(inherited)
            for k in ("Resources", "MediaBox", "Rotate"):
                if k in node:
                    inh[k] = node[k]
            if node.get("Type") == "Page" or ("Kids" not in node and "Contents" in node):
                page = dict(inh)
                page.update(node)
                out.append(page)
            else:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, inh)

        walk(pages_ref, {})
        if not out:
            raise PdfError("no pages")
        return out


def _ascii85_decode(data: bytes) -> bytes:
    """ASCII85Decode (spec 7.4.3): 5 chars '!'..'u' -> 4 bytes base-85,
    'z' is a zero-group shorthand, '~>' terminates, whitespace ignored.
    A trailing partial group of n chars yields n-1 bytes."""
    if data.startswith(b"<~"):
        data = data[2:]
    end = data.find(b"~>")
    if end >= 0:
        data = data[:end]
    out = bytearray()
    group: list[int] = []
    for b in data:
        if b in _WS:
            continue
        if b == 0x7A:  # 'z'
            if group:
                raise ValueError("z inside ascii85 group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= b <= 0x75:
            raise ValueError("bad ascii85 byte")
        group.append(b - 0x21)
        if len(group) == 5:
            acc = 0
            for d in group:
                acc = acc * 85 + d
            if acc > 0xFFFFFFFF:
                raise ValueError("ascii85 group overflow")
            out += acc.to_bytes(4, "big")
            group = []
    if group:
        if len(group) == 1:
            raise ValueError("ascii85 dangling single char")
        n = len(group)
        acc = 0
        for d in group + [84] * (5 - n):
            acc = acc * 85 + d
        out += acc.to_bytes(4, "big")[: n - 1]
    return bytes(out)


def _runlength_decode(data: bytes) -> bytes:
    """RunLengthDecode (spec 7.4.5): length byte L<=127 copies the next
    L+1 bytes; L>=129 repeats the next byte 257-L times; 128 is EOD."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        ln = data[i]
        i += 1
        if ln == 128:
            break
        if ln < 128:
            out += data[i:i + ln + 1]
            i += ln + 1
        else:
            if i < n:
                out += bytes([data[i]]) * (257 - ln)
                i += 1
    return bytes(out)


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """LZWDecode (spec 7.4.4): MSB-first variable-width codes 9->12
    bits, clear=256, EOD=257. ``early_change=1`` (default) widens the
    code one entry before the table fills, per TIFF/PDF convention."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW code out of range")
            out += entry
            prev = entry
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _undo_png_predictor(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    bpp = max(1, (colors * bpc) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    while i + 1 + rowlen <= len(data) + rowlen:
        if i >= len(data):
            break
        ft = data[i]
        row = bytearray(data[i + 1:i + 1 + rowlen])
        i += 1 + rowlen
        if ft == 1:
            for j in range(bpp, len(row)):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:
            for j in range(len(row)):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:
            for j in range(len(row)):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + (left + prev[j]) // 2) & 0xFF
        elif ft == 4:
            for j in range(len(row)):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


# ---------------------------------------------------------------- fonts ---

_DEFAULT_WIDTH = 500.0  # glyph-space units (em/1000) when unknown


def _build_glyph_names() -> dict[str, str]:
    """Adobe-Glyph-List subset: glyph name -> unicode. Covers ASCII
    names, digits, punctuation, Latin-1 accents (built via
    unicodedata so the table is generated, not transcribed), and the
    typographic set PDFs commonly reference in /Differences arrays."""
    import unicodedata
    g: dict[str, str] = {}
    for c in "abcdefghijklmnopqrstuvwxyz":
        g[c] = c
        g[c.upper()] = c.upper()
    for i, name in enumerate(["zero", "one", "two", "three", "four", "five",
                              "six", "seven", "eight", "nine"]):
        g[name] = str(i)
    g.update({
        "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
        "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
        "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
        "comma": ",", "hyphen": "-", "minus": "−", "period": ".",
        "slash": "/", "colon": ":", "semicolon": ";", "less": "<",
        "equal": "=", "greater": ">", "question": "?", "at": "@",
        "bracketleft": "[", "backslash": "\\", "bracketright": "]",
        "asciicircum": "^", "underscore": "_", "grave": "`",
        "braceleft": "{", "bar": "|", "braceright": "}", "asciitilde": "~",
        "quoteleft": "‘", "quoteright": "’",
        "quotedblleft": "“", "quotedblright": "”",
        "quotesinglbase": "‚", "quotedblbase": "„",
        "endash": "–", "emdash": "—", "bullet": "•",
        "ellipsis": "…", "dagger": "†", "daggerdbl": "‡",
        "periodcentered": "·", "perthousand": "‰",
        "guillemotleft": "«", "guillemotright": "»",
        "guilsinglleft": "‹", "guilsinglright": "›",
        "florin": "ƒ", "fraction": "⁄", "fi": "ﬁ",
        "fl": "ﬂ", "germandbls": "ß", "dotlessi": "ı",
        "exclamdown": "¡", "questiondown": "¿", "cent": "¢",
        "sterling": "£", "yen": "¥", "section": "§",
        "currency": "¤", "copyright": "©",
        "registered": "®", "trademark": "™", "degree": "°",
        "plusminus": "±", "mu": "µ", "paragraph": "¶",
        "middot": "·", "Euro": "€", "ae": "æ",
        "AE": "Æ", "oe": "œ", "OE": "Œ", "oslash": "ø",
        "Oslash": "Ø", "aring": "å", "Aring": "Å",
        "eth": "ð", "Eth": "Ð", "thorn": "þ",
        "Thorn": "Þ", "lslash": "ł", "Lslash": "Ł",
        "ordfeminine": "ª", "ordmasculine": "º",
        "brokenbar": "¦", "logicalnot": "¬",
        "onequarter": "¼", "onehalf": "½",
        "threequarters": "¾", "multiply": "×",
        "divide": "÷",
    })
    accents = {"acute": "ACUTE", "grave": "GRAVE",
               "circumflex": "CIRCUMFLEX", "dieresis": "DIAERESIS",
               "tilde": "TILDE", "ring": "RING ABOVE", "caron": "CARON",
               "cedilla": "CEDILLA", "macron": "MACRON", "breve": "BREVE"}
    for base in "aeiouyncszgr":
        for suffix, uni in accents.items():
            for case, word in ((base, "SMALL"), (base.upper(), "CAPITAL")):
                try:
                    ch = unicodedata.lookup(
                        f"LATIN {word} LETTER {base.upper()} WITH {uni}")
                except KeyError:
                    continue
                g.setdefault(case + suffix, ch)
    return g


_GLYPH_NAMES = _build_glyph_names()


def _glyph_to_unicode(name: str) -> str:
    """AGL name resolution incl. the algorithmic uniXXXX / uXXXX forms."""
    got = _GLYPH_NAMES.get(name)
    if got is not None:
        return got
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            return ""
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return ""
    return ""


# Adobe StandardEncoding deviations from ASCII/Latin-1 (spec annex D.2)
_STANDARD_HIGH = {
    0x27: "’", 0x60: "‘", 0xa1: "¡", 0xa2: "¢",
    0xa3: "£", 0xa4: "⁄", 0xa5: "¥", 0xa6: "ƒ",
    0xa7: "§", 0xa8: "¤", 0xa9: "'", 0xaa: "“",
    0xab: "«", 0xac: "‹", 0xad: "›", 0xae: "ﬁ",
    0xaf: "ﬂ", 0xb1: "–", 0xb2: "†", 0xb3: "‡",
    0xb4: "·", 0xb6: "¶", 0xb7: "•", 0xb8: "‚",
    0xb9: "„", 0xba: "”", 0xbb: "»", 0xbc: "…",
    0xbd: "‰", 0xbf: "¿", 0xc1: "`", 0xc2: "´",
    0xc3: "ˆ", 0xc4: "˜", 0xc5: "¯", 0xc6: "˘",
    0xc7: "˙", 0xc8: "¨", 0xca: "˚", 0xcb: "¸",
    0xcd: "˝", 0xce: "˛", 0xcf: "ˇ", 0xd0: "—",
    0xe1: "Æ", 0xe3: "ª", 0xe8: "Ł", 0xe9: "Ø",
    0xea: "Œ", 0xeb: "º", 0xf1: "æ", 0xf5: "ı",
    0xf8: "ł", 0xf9: "ø", 0xfa: "œ", 0xfb: "ß",
}


def _base_encoding_char(enc_name: str | None, b: int) -> str | None:
    """Byte -> unicode under a named simple-font base encoding; None
    when the encoding leaves the byte to the caller's default."""
    if enc_name == "WinAnsiEncoding":
        ch = bytes([b]).decode("cp1252", "ignore")
        return ch if ch and ord(ch) >= 32 else ""
    if enc_name == "MacRomanEncoding":
        ch = bytes([b]).decode("mac_roman", "ignore")
        return ch if ch and ord(ch) >= 32 else ""
    if enc_name == "StandardEncoding":
        got = _STANDARD_HIGH.get(b)
        if got is not None:
            return got
        return chr(b) if 32 <= b < 127 else ""
    return None


class _Font:
    """Decoder for one font resource: code bytes -> unicode text, plus
    glyph advance widths (for inter-run spacing decisions)."""

    def __init__(self, doc: _Document, font_dict: dict):
        self.two_byte = False
        self.cmap: dict[int, str] = {}
        self.widths: dict[int, float] = {}
        self.default_width = _DEFAULT_WIDTH
        self.base_enc: str | None = None
        self.diff_map: dict[int, str] = {}
        subtype = doc.resolve(font_dict.get("Subtype"))
        if subtype == "Type0":
            self.two_byte = True
            enc = doc.resolve(font_dict.get("Encoding"))
            if enc in ("Identity-H", "Identity-V"):
                self.two_byte = True
        else:
            # simple-font /Encoding: a base-encoding name or a dict with
            # /BaseEncoding + /Differences — the decode path for fonts
            # WITHOUT ToUnicode (spec 9.6.6, annex D)
            enc = doc.resolve(font_dict.get("Encoding"))
            if isinstance(enc, str):
                self.base_enc = enc
            elif isinstance(enc, dict):
                be = doc.resolve(enc.get("BaseEncoding"))
                if isinstance(be, str):
                    self.base_enc = be
                diffs = doc.resolve(enc.get("Differences"))
                if isinstance(diffs, list):
                    code = 0
                    for item in diffs:
                        item = doc.resolve(item)
                        if isinstance(item, (int, float)):
                            code = int(item)
                        elif isinstance(item, _Name):
                            self.diff_map[code] = _glyph_to_unicode(item)
                            code += 1
        tu = doc.resolve(font_dict.get("ToUnicode"))
        if isinstance(tu, _Stream):
            data = doc.stream_data(tu)
            if data:
                self._parse_tounicode(data)
        self._parse_widths(doc, font_dict, subtype)

    def _parse_widths(self, doc: _Document, fd: dict, subtype):
        if subtype == "Type0":
            desc = doc.resolve(fd.get("DescendantFonts"))
            if isinstance(desc, list) and desc:
                dfont = doc.resolve(desc[0])
                if isinstance(dfont, dict):
                    dw = doc.resolve(dfont.get("DW"))
                    if isinstance(dw, (int, float)):
                        self.default_width = float(dw)
                    else:
                        self.default_width = 1000.0
                    self._parse_cid_w(doc, doc.resolve(dfont.get("W")))
            return
        # Type3 widths are in the font's own glyph space, defined by
        # /FontMatrix (spec 9.6.5) — NOT the em/1000 space of Type1/
        # TrueType. Normalize to em/1000 units here so every caller's
        # ``width / 1000 * fsize`` stays correct. (An Arial Black Type3
        # subset with FontMatrix 1/2048 otherwise overestimates every
        # advance 2.05x and swallows real inter-word gaps.)
        wscale = 1.0
        if subtype == "Type3":
            fm = doc.resolve(fd.get("FontMatrix"))
            if isinstance(fm, list) and fm and \
                    isinstance(doc.resolve(fm[0]), (int, float)):
                fm0 = float(doc.resolve(fm[0]))
                if fm0 != 0.0:
                    wscale = fm0 * 1000.0
        first = doc.resolve(fd.get("FirstChar"))
        warr = doc.resolve(fd.get("Widths"))
        if isinstance(first, int) and isinstance(warr, list):
            for i, w in enumerate(warr):
                w = doc.resolve(w)
                if isinstance(w, (int, float)):
                    self.widths[first + i] = float(w) * wscale

    def _parse_cid_w(self, doc: _Document, w):
        """CIDFont /W array: ``c [w1 w2 ...]`` or ``c1 c2 w`` items."""
        if not isinstance(w, list):
            return
        i = 0
        n = len(w)
        while i < n:
            a = doc.resolve(w[i])
            if i + 1 >= n or not isinstance(a, (int, float)):
                break
            b = doc.resolve(w[i + 1])
            if isinstance(b, list):
                for j, ww in enumerate(b):
                    ww = doc.resolve(ww)
                    if isinstance(ww, (int, float)):
                        self.widths[int(a) + j] = float(ww)
                i += 2
            elif i + 2 < n:
                c = doc.resolve(w[i + 2])
                if isinstance(b, (int, float)) and isinstance(c, (int, float)):
                    for cid in range(int(a), min(int(b), int(a) + 65536) + 1):
                        self.widths[cid] = float(c)
                i += 3
            else:
                break

    def codes(self, raw: bytes) -> list[int]:
        if self.two_byte:
            return [(raw[i] << 8) | raw[i + 1]
                    for i in range(0, len(raw) - 1, 2)]
        return list(raw)

    def _tables(self):
        """Lazy per-font lookup tables for the 1-byte fast path.
        Precedence: ToUnicode > /Differences > base encoding > the
        frozen Latin-1-ish default (kept for fixture stability)."""
        trans = {}
        wtab = []
        for b in range(256):
            ch = self.cmap.get(b)
            if ch is None:
                ch = self.diff_map.get(b)
            if ch is None:
                ch = _base_encoding_char(self.base_enc, b)
            if ch is None:
                ch = chr(b) if 32 <= b < 127 or b >= 160 else ""
            trans[b] = ch
            wtab.append(self.widths.get(b, self.default_width))
        self._trans = trans
        self._wtab = wtab
        return trans, wtab

    def text_width(self, raw: bytes) -> float:
        """Total advance in glyph-space units (em/1000)."""
        if not self.two_byte:
            wtab = getattr(self, "_wtab", None) or self._tables()[1]
            return sum(map(wtab.__getitem__, raw))
        return sum(self.widths.get(c, self.default_width)
                   for c in self.codes(raw))

    def _parse_tounicode(self, data: bytes):
        # codespacerange determines code width
        for m in re.finditer(rb"begincodespacerange(.*?)endcodespacerange",
                             data, re.S):
            for h in re.finditer(rb"<([0-9A-Fa-f]+)>", m.group(1)):
                if len(h.group(1)) > 2:
                    self.two_byte = True
        for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
            for e in re.finditer(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]*)>",
                                 m.group(1)):
                src = int(e.group(1), 16)
                self.cmap[src] = _utf16_hex(e.group(2))
        for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
            body = m.group(1)
            pos = 0
            rng = re.compile(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(<([0-9A-Fa-f]*)>|\[)")
            while True:
                e = rng.search(body, pos)
                if not e:
                    break
                lo, hi = int(e.group(1), 16), int(e.group(2), 16)
                if e.group(3) == b"[":
                    # array form: [<d1> <d2> ...]
                    end = body.index(b"]", e.end())
                    dsts = re.findall(rb"<([0-9A-Fa-f]*)>", body[e.end():end])
                    for i, d in enumerate(dsts):
                        if lo + i <= hi:
                            self.cmap[lo + i] = _utf16_hex(d)
                    pos = end + 1
                else:
                    base = int(e.group(4), 16) if e.group(4) else 0
                    # only the final code unit increments (spec 9.10.3)
                    prefix = e.group(4)[:-4] if len(e.group(4)) > 4 else b""
                    base_unit = int(e.group(4)[-4:], 16) if len(e.group(4)) >= 4 else base
                    for c in range(lo, hi + 1):
                        if len(e.group(4)) <= 4:
                            self.cmap[c] = chr(base + (c - lo))
                        else:
                            self.cmap[c] = (_utf16_hex(prefix) +
                                            chr(base_unit + (c - lo)))
                    pos = e.end(4)

    def decode(self, raw: bytes) -> str:
        if not self.two_byte:
            trans = getattr(self, "_trans", None) or self._tables()[0]
            return raw.decode("latin-1").translate(trans)
        return "".join(self.cmap.get(code, "") for code in self.codes(raw))


def _utf16_hex(h: bytes) -> str:
    if not h:
        return ""
    if len(h) % 4:
        h = h.rjust((len(h) + 3) // 4 * 4, b"0")
    try:
        return bytes.fromhex(h.decode("ascii")).decode("utf-16-be", "ignore")
    except ValueError:
        return ""


# -------------------------------------------------------- content stream ---

_CS_TOKEN = re.compile(rb"""
    (?P<str>\() | (?P<hex><(?!<)) | (?P<arr>\[|\]) | (?P<dict><<|>>)
  | (?P<name>/[^\s()<>\[\]{}/%]*)
  | (?P<num>[+-]?(?:\d+\.?\d*|\.\d+))
  | (?P<op>[A-Za-z'"][A-Za-z0-9*'"]*)
  | (?P<cmt>%[^\r\n]*)
""", re.X)


def _mat_mul(a, b):
    """3x3 affine (a,b,c,d,e,f) multiply: result = a · b."""
    a0, a1, a2, a3, a4, a5 = a
    b0, b1, b2, b3, b4, b5 = b
    return (a0 * b0 + a1 * b2, a0 * b1 + a1 * b3,
            a2 * b0 + a3 * b2, a2 * b1 + a3 * b3,
            a4 * b0 + a5 * b2 + b4, a4 * b1 + a5 * b3 + b5)


_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


class _Bracket:
    """Array-delimiter sentinel for the content-stream operand stack
    (distinct from show-string bytes)."""
    __slots__ = ("ch",)

    def __init__(self, ch: str):
        self.ch = ch


_LBRACK = _Bracket("[")
_RBRACK = _Bracket("]")


def _page_runs(doc: _Document, page: dict,
               image_sink: list | None = None
               ) -> list[tuple[float, float, float, str]]:
    """Extract positioned text runs (x, y, font_size, text) from one
    page. When ``image_sink`` is a list, every painted image XObject is
    appended to it as ``(name, ctm_at_Do, stream)`` in paint order —
    the placement record the rasterizer composites from."""
    contents = doc.resolve(page.get("Contents"))
    chunks: list[bytes] = []
    if isinstance(contents, list):
        for c in contents:
            s = doc.resolve(c)
            if isinstance(s, _Stream):
                d = doc.stream_data(s)
                if d:
                    chunks.append(d)
    elif isinstance(contents, _Stream):
        d = doc.stream_data(contents)
        if d:
            chunks.append(d)
    content = b"\n".join(chunks)
    if not content:
        return []
    res = doc.resolve(page.get("Resources")) or {}
    return _run_content(doc, content, res, _ID, 0, image_sink=image_sink)


def _run_content(doc: _Document, content: bytes, res: dict,
                 base_ctm: tuple, depth: int,
                 image_sink: list | None = None
                 ) -> list[tuple[float, float, float, str]]:
    font_res = doc.resolve(res.get("Font")) or {}
    xobj_res = doc.resolve(res.get("XObject")) or {}
    fonts: dict[str, _Font] = {}

    def get_font(name: str) -> _Font | None:
        if name not in fonts:
            raw = font_res.get(name) if isinstance(font_res, dict) else None
            key = raw.num if isinstance(raw, _Ref) else id(raw)
            cached = doc._font_cache.get(key)
            if cached is None:
                fd = doc.resolve(raw)
                cached = _Font(doc, fd if isinstance(fd, dict) else {})
                doc._font_cache[key] = cached
            fonts[name] = cached
        return fonts[name]

    runs: list[tuple[float, float, float, str]] = []
    ctm = base_ctm
    gs_stack: list[tuple] = []
    tm = lm = _ID
    tl = 0.0
    tc = tw = 0.0
    th = 1.0
    font: _Font | None = None
    fsize = 0.0
    stack: list = []
    in_text = False

    def show(raw: bytes):
        nonlocal tm
        if not isinstance(raw, bytes) or font is None:
            return
        txt = font.decode(raw)
        m = _mat_mul(tm, ctm)
        x, y = m[4], m[5]
        scale = abs(m[0]) or 1.0
        # advance from parsed glyph widths (em/1000) + char/word spacing
        n_codes = len(font.codes(raw))
        adv = (font.text_width(raw) / 1000.0 * fsize + n_codes * tc +
               (raw.count(b" ") if not font.two_byte else txt.count(" ")) * tw
               ) * th
        if txt:
            runs.append((x, y, fsize * scale, txt, adv * scale))
        tm = _mat_mul((1, 0, 0, 1, adv, 0), tm)

    def next_line(ty=None):
        nonlocal tm, lm
        t = -tl if ty is None else ty
        lm = _mat_mul((1, 0, 0, 1, 0, t), lm)
        tm = lm

    pos = 0
    n = len(content)
    while pos < n:
        m = _CS_TOKEN.search(content, pos)
        if not m:
            break
        pos = m.end()
        if m.group("cmt"):
            continue
        if m.group("str"):
            s, pos = _parse_literal_string(content, m.start())
            stack.append(s)
            continue
        if m.group("hex"):
            s, pos = _parse_hex_string(content, m.start())
            stack.append(s)
            continue
        if m.group("dict"):
            if m.group("dict") == b"<<":
                d, pos = _parse_dict(content, m.start())
                stack.append(d)
            continue
        if m.group("arr"):
            stack.append(_LBRACK if m.group("arr") == b"[" else _RBRACK)
            continue
        if m.group("name"):
            stack.append(_Name(m.group("name")[1:].decode("latin-1")))
            continue
        if m.group("num"):
            t = m.group("num")
            stack.append(float(t) if b"." in t else int(t))
            continue
        op = m.group("op")
        try:
            if op == b"BT":
                in_text = True
                tm = lm = _ID
            elif op == b"ET":
                in_text = False
            elif op == b"Tf" and len(stack) >= 2:
                fsize = float(stack[-1])
                font = get_font(str(stack[-2]))
            elif op == b"TL" and stack:
                tl = float(stack[-1])
            elif op == b"Tc" and stack:
                tc = float(stack[-1])
            elif op == b"Tw" and stack:
                tw = float(stack[-1])
            elif op == b"Tz" and stack:
                th = float(stack[-1]) / 100.0
            elif op == b"Td" and len(stack) >= 2:
                lm = _mat_mul((1, 0, 0, 1, float(stack[-2]), float(stack[-1])), lm)
                tm = lm
            elif op == b"TD" and len(stack) >= 2:
                tl = -float(stack[-1])
                lm = _mat_mul((1, 0, 0, 1, float(stack[-2]), float(stack[-1])), lm)
                tm = lm
            elif op == b"Tm" and len(stack) >= 6:
                tm = lm = tuple(float(v) for v in stack[-6:])
            elif op == b"T*":
                next_line()
            elif op == b"Tj" and stack:
                show(stack[-1])
            elif op == b"'" and stack:
                next_line()
                show(stack[-1])
            elif op == b'"' and len(stack) >= 3:
                tw, tc = float(stack[-3]), float(stack[-2])
                next_line()
                show(stack[-1])
            elif op == b"TJ":
                # pop back to matching "["
                items = []
                while stack:
                    v = stack.pop()
                    if v is _LBRACK:
                        break
                    if v is _RBRACK:
                        continue
                    items.append(v)
                items.reverse()
                for it in items:
                    if isinstance(it, bytes):
                        show(it)
                    elif isinstance(it, (int, float)) and in_text:
                        gap = -float(it) / 1000.0 * fsize * th
                        tm = _mat_mul((1, 0, 0, 1, gap, 0), tm)
                        # big negative displacement == inter-word space
                        if gap > 0.30 * fsize and runs \
                                and not runs[-1][3].endswith(" "):
                            x, y, fs, t, w = runs[-1]
                            runs[-1] = (x, y, fs, t + " ", w + gap)
                stack.clear()
                continue
            elif op == b"BI":
                # inline image (spec 8.9.7): raw binary follows ID until
                # a whitespace-delimited EI — skip it wholesale, or the
                # tokenizer would misread image bytes as tokens ("(",
                # "Tj", ...) and corrupt the operand stack
                idp = content.find(b"ID", pos)
                if idp < 0:
                    break
                dstart = idp + 2
                if dstart < n and content[dstart:dstart + 1] in \
                        (b" ", b"\r", b"\n", b"\t"):
                    dstart += 1
                ei = re.search(
                    rb"[\0\t\n\f\r ]EI(?=[\0\t\n\f\r /\[\]<>(%]|$)",
                    content[dstart:])
                pos = n if ei is None else dstart + ei.end()
            elif op == b"q":
                gs_stack.append(ctm)
            elif op == b"Q":
                if gs_stack:
                    ctm = gs_stack.pop()
            elif op == b"cm" and len(stack) >= 6:
                ctm = _mat_mul(tuple(float(v) for v in stack[-6:]), ctm)
            elif op == b"Do" and stack and depth < 8:
                xo = doc.resolve(xobj_res.get(str(stack[-1]))) \
                    if isinstance(xobj_res, dict) else None
                subtype = doc.resolve(xo.dict.get("Subtype")) \
                    if isinstance(xo, _Stream) else None
                if subtype == "Form":
                    inner = doc.stream_data(xo)
                    if inner:
                        ires = doc.resolve(xo.dict.get("Resources")) or res
                        ictm = ctm
                        mtx = doc.resolve(xo.dict.get("Matrix"))
                        if isinstance(mtx, list) and len(mtx) == 6:
                            ictm = _mat_mul(tuple(float(v) for v in mtx), ctm)
                        runs.extend(_run_content(doc, inner, ires, ictm,
                                                 depth + 1,
                                                 image_sink=image_sink))
                elif subtype == "Image" and image_sink is not None:
                    image_sink.append((str(stack[-1]), ctm, xo))
        except (TypeError, ValueError, IndexError):
            pass
        if op not in (b"TJ",):
            stack.clear()
    return runs


def _find_gutter(runs: list[tuple]) -> float | None:
    """Detect a two-column layout: a vertical band >=18pt wide inside
    the text area that no run crosses, with substantial text on both
    sides. Returns the gutter center x, or None (single column)."""
    if len(runs) < 8:
        return None
    spans = [(r[0], r[0] + max(r[4], 1.0)) for r in runs]
    lo = min(s[0] for s in spans)
    hi = max(s[1] for s in spans)
    if hi - lo < 120:
        return None
    # coverage histogram (2pt bins); a few spanning runs (titles,
    # rules) are tolerated inside the gutter
    nbins = int((hi - lo) / 2.0) + 1
    cov = [0] * nbins
    for s, e in spans:
        b0 = max(0, int((s - lo) / 2.0))
        b1 = min(nbins - 1, int((e - lo) / 2.0))
        for b in range(b0, b1 + 1):
            cov[b] += 1
    # a gutter may still be crossed by a couple of spanning runs
    # (centered title, horizontal rule) — tolerate an absolute few
    tol = 2
    best = None
    b = 0
    while b < nbins:
        if cov[b] <= tol:
            b1 = b
            while b1 + 1 < nbins and cov[b1 + 1] <= tol:
                b1 += 1
            g0, g1 = lo + b * 2.0, lo + (b1 + 1) * 2.0
            # interior band, wide enough, text mass on both sides
            if (g1 - g0 >= 18.0 and g0 > lo + 30 and g1 < hi - 30):
                n_left = sum(1 for s, e in spans if e <= g0 + 2)
                n_right = sum(1 for s, e in spans if s >= g1 - 2)
                side_min = max(10.0, 0.15 * len(spans))
                if n_left >= side_min and n_right >= side_min:
                    width = g1 - g0
                    if best is None or width > best[0]:
                        best = (width, (g0 + g1) / 2.0)
            b = b1 + 1
        else:
            b += 1
    return best[1] if best else None


def _assemble_text(runs: list[tuple]) -> str:
    """Order runs into lines: y bands top-to-bottom, x left-to-right.
    Runs are (x, y, font_size, text, width_pts). Two-column pages are
    split at the detected gutter and read column-by-column (the order a
    human — and the reference's OCR — reads them)."""
    if not runs:
        return ""
    gutter = _find_gutter(runs)
    if gutter is not None:
        # full-width lines (a name header spanning both columns — the
        # crossing runs _find_gutter tolerates) must not be cut at the
        # gutter: every y-band containing a gutter-crossing run is kept
        # whole on the left side so the line reassembles intact
        sizes = sorted(r[2] for r in runs if r[2] > 0) or [10.0]
        tol = max(1.0, 0.4 * sizes[len(sizes) // 2])
        cross_ys = [r[1] for r in runs if r[0] < gutter < r[0] + r[4]]

        def spans_full(y: float) -> bool:
            return any(abs(y - cy) <= tol for cy in cross_ys)

        left = [r for r in runs if r[0] < gutter or spans_full(r[1])]
        right = [r for r in runs if r[0] >= gutter and not spans_full(r[1])]
        if left and right:
            return (_assemble_column(left) + "\n" +
                    _assemble_column(right))
    return _assemble_column(runs)


def _assemble_column(runs: list[tuple]) -> str:
    # group into baseline bands (tolerance: 40% of median font size)
    sizes = sorted(r[2] for r in runs if r[2] > 0) or [10.0]
    tol = max(1.0, 0.4 * sizes[len(sizes) // 2])
    by_y = sorted(runs, key=lambda r: (-r[1], r[0]))
    lines: list[list[tuple]] = []
    cur_y = None
    for r in by_y:
        if cur_y is None or abs(r[1] - cur_y) > tol:
            lines.append([r])
            cur_y = r[1]
        else:
            lines[-1].append(r)
    out_lines = []
    for line in lines:
        line.sort(key=lambda r: r[0])
        parts = [line[0][3]]
        for prev, cur in zip(line, line[1:]):
            gap = cur[0] - (prev[0] + prev[4])
            sep = " " if gap > 0.20 * (cur[2] or 10.0) else ""
            if parts[-1].endswith(" ") or cur[3].startswith(" "):
                sep = ""
            parts.append(sep + cur[3])
        text = "".join(parts).rstrip()
        out_lines.append(text)
    return "\n".join(out_lines)


def _page_links(doc: _Document, page: dict) -> list[str]:
    """/Annots -> /A -> /URI, annot order kept, uri-less dropped
    (semantics of /root/reference/app/services/resume_parser.py:198-222)."""
    links: list[str] = []
    annots = doc.resolve(page.get("Annots"))
    if not isinstance(annots, list):
        return links
    for a in annots:
        ad = doc.resolve(a)
        if not isinstance(ad, dict):
            continue
        action = doc.resolve(ad.get("A"))
        if isinstance(action, dict):
            uri = doc.resolve(action.get("URI"))
            if isinstance(uri, bytes):
                uri = uri.decode("utf-8", "replace")
            if isinstance(uri, str) and uri:
                links.append(uri)
    return links


def extract_pdf(data: bytes, password: bytes = b"") -> dict:
    """Extract text + links from PDF bytes.

    Returns ``{"text": str, "links": list[str], "n_pages": int}``.
    Pages joined with "\\n\\n". Raises PdfError on structural failure
    (including standard-handler encryption the ``password`` cannot
    open — the empty default covers the common owner-locked case).
    """
    doc = _Document(data, password=password)
    pages = doc.pages()
    page_texts = []
    links: list[str] = []
    for page in pages:
        try:
            page_texts.append(_assemble_text(_page_runs(doc, page)))
        except PdfError:
            page_texts.append("")
        links.extend(_page_links(doc, page))
    return {"text": "\n\n".join(page_texts), "links": links,
            "n_pages": len(pages)}


def decode_image_xobject(doc: _Document, xo: _Stream) -> dict | None:
    """Decode an image XObject to a grayscale plane: /DCTDecode through
    ``kernels/jpeg.decode_jpeg`` (Y plane), 8-bit /DeviceGray through
    the normal stream filters. Returns ``{"width", "height",
    "n_components", "pixels"}`` (pixels row-major gray) or None for
    unsupported encodings. Raises ValueError on corrupt payloads — the
    callers decide fail-open vs fail-closed."""
    d = xo.dict
    flist = [str(f) for f in doc.filter_list(xo)]
    if flist == ["DCTDecode"]:
        from .jpeg import decode_jpeg
        img = decode_jpeg(xo.raw)
        if img["pixels"]:
            return {"width": img["width"], "height": img["height"],
                    "n_components": img["n_components"],
                    "pixels": img["pixels"]}
        return None
    try:
        width = int(doc.resolve(d.get("Width")) or 0)
        height = int(doc.resolve(d.get("Height")) or 0)
        bits = int(doc.resolve(d.get("BitsPerComponent")) or 0)
    except (TypeError, ValueError):
        return None
    cs = doc.resolve(d.get("ColorSpace"))
    if bits == 8 and cs == "DeviceGray":
        px = doc.stream_data(xo)
        if px is not None and len(px) >= width * height > 0:
            return {"width": width, "height": height, "n_components": 1,
                    "pixels": px[:width * height]}
    return None


def pdf_image_metadata(data: bytes) -> list[dict]:
    """Enumerate image XObjects (spec 8.9.5) page by page: declared
    dict metadata (width/height/bits/colorspace/last filter) plus a
    REAL decode cross-check — /DCTDecode payloads go through
    ``kernels/jpeg.decode_jpeg`` (embedded JPEGs are stored verbatim,
    spec 7.4.8), 8-bit /DeviceGray Flate/LZW/RL images through the
    normal stream filters — yielding decoded dims, component count and
    mean pixel value. Undecodable payloads keep the declared metadata
    with null decode fields (the multimodal fail-open contract: one bad
    image must not sink the page scan). Rows are ordered (page, name).

    The reference feeds whole PDF pages to GPT-4o vision and never
    inspects embedded images
    (/root/reference/app/services/resume_parser.py:102-141); a
    training-data pipeline needs the per-image metadata surface, so
    this is a deliberate extension in the reference's schema spirit.
    """
    doc = _Document(data)
    out: list[dict] = []
    for pno, page in enumerate(doc.pages()):
        res = doc.resolve(page.get("Resources")) or {}
        xobjs = doc.resolve(res.get("XObject")) or {}
        if not isinstance(xobjs, dict):
            continue
        def slot_key(n):
            # natural order: /Im2 before /Im10 (plain sort breaks at
            # 10+ images per page)
            m = re.match(r"^(.*?)(\d+)$", str(n))
            return (m.group(1), int(m.group(2))) if m else (str(n), -1)

        for name in sorted(xobjs, key=slot_key):
            xo = doc.resolve(xobjs[name])
            if not isinstance(xo, _Stream) or \
                    doc.resolve(xo.dict.get("Subtype")) != "Image":
                continue
            d = xo.dict
            try:
                width = int(doc.resolve(d.get("Width")) or 0)
                height = int(doc.resolve(d.get("Height")) or 0)
                bits = int(doc.resolve(d.get("BitsPerComponent")) or 0)
            except (TypeError, ValueError):
                width = height = bits = 0
            cs = doc.resolve(d.get("ColorSpace"))
            flist = [str(f) for f in doc.filter_list(xo)]
            row = {"page": pno, "name": str(name), "width": width,
                   "height": height, "bits": bits,
                   "color_space": str(cs) if cs is not None else None,
                   "filter": flist[-1] if flist else "Raw",
                   "decoded_width": None, "decoded_height": None,
                   "n_components": None, "mean_value": None}
            try:
                img = decode_image_xobject(doc, xo)
                if img is not None:
                    px = img["pixels"]
                    row.update(
                        decoded_width=img["width"],
                        decoded_height=img["height"],
                        n_components=img["n_components"],
                        mean_value=round(sum(px) / len(px), 4))
            except ValueError:  # incl. PdfError (its subclass)
                pass  # fail-open: declared metadata survives
            out.append(row)
    return out
