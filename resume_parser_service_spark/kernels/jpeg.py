"""Pure-Python baseline sequential JPEG (ITU-T T.81) — the compressed
image codec the r3 verdict left open: baseline JPEG is by far the most
common crawl image format, and its decode needs no libraries, only the
public spec. Completes the multimodal column family next to
``media.py``'s PNG/WAV/Y4M (same contract: opaque ``binary`` in, typed
metadata out; the Spark-side plumbing is the ``mapInPandas`` batch in
``operators/extract_queries.py``).

Scope (honest, spec-cited):

- **Decoder**: baseline DCT, Huffman, interleaved scans, 1 or 3
  components, sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0),
  restart intervals, 0xFF00 byte unstuffing. **Progressive (SOF2)**
  per T.81 Annex G: spectral selection + successive approximation,
  DC/AC first and refinement scans, EOB runs, non-interleaved AC
  scans over per-component block grids. Arithmetic coding and
  lossless/hierarchical frames raise ``ValueError``.
- **Encoder** (fixture generator + sink symmetry): grayscale or 4:4:4
  color, Annex K.3 Huffman tables, caller-supplied quant table;
  ``make_progressive_jpeg`` emits spectral-selection-only or full
  successive-approximation scan scripts (custom uniform-8 AC table so
  EOBn symbols exist — K.3's baseline tables define none).

The DCT pair runs on numpy (separable orthonormal basis matrix — the
whole IDCT is two 8x8 matmuls per block), which the container ships;
everything else is stdlib. Feature surface mirrors ``decode_png``:
width / height / n_components / pixels (Y plane) for mean-luma.
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = ["make_jpeg", "make_progressive_jpeg", "decode_jpeg",
           "QUANT_FLAT", "QUANT_K1"]

# zigzag index order (T.81 Figure 5)
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

# Annex K.1 luminance quantization table (spec example)
QUANT_K1 = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99]
#: near-lossless table for roundtrip fixtures
QUANT_FLAT = [1] * 64

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


# Progressive AC table: the K.3 baseline tables define no EOBn symbols
# (r<<4 with 1<=r<=14 — band-end runs, T.81 G.1.2.2), so progressive
# scans use this uniform-length-8 table instead: all 160 (run,size<=10)
# symbols + EOB0..EOB14 + ZRL = 176 codes, Kraft sum 176/256 < 1, so
# the canonical assignment is valid and never reaches an all-ones code.
_AC_PROG = ([0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
            [(r << 4) | s for r in range(16) for s in range(1, 11)]
            + [r << 4 for r in range(15)] + [0xF0])


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: forward X = C @ x @ C.T,
    inverse x = C.T @ X @ C."""
    c = np.zeros((8, 8))
    for u in range(8):
        a = math.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            c[u, x] = a * math.cos((2 * x + 1) * u * math.pi / 16)
    return c


_C = _dct_basis()


# --------------------------------------------------------------------------
# Huffman coding
# --------------------------------------------------------------------------

def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple]:
    """value -> (code, length), canonical T.81 code assignment."""
    out, code, k = {}, 0, 0
    if len(bits) < 16 or sum(bits) > len(vals):
        raise ValueError("truncated Huffman table")
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple, int]:
    """(length, code) -> value, for MSB-first sequential decode."""
    return {(ln, code): v
            for v, (code, ln) in _huff_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (B.1.1.5)
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.exhausted = False  # ran past the end (truncated stream)

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            # truncated entropy data: drain with zero bits (media.py
            # truncation-tolerance convention) instead of IndexError
            self.exhausted = True
            self.acc <<= 8
            self.n += 8
            return
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | b
                self.n += 8
                return
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # unstuff
            elif 0xD0 <= nxt <= 0xD7:
                self.pos += 1  # consume the marker low byte
                raise _RestartMarker(nxt)
            else:
                # a real marker (EOI / next segment): the entropy
                # segment is over — pad and flag so the MCU loop stops
                b = 0
                self.pos -= 1
                self.exhausted = True
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Consume padding up to and including a restart marker; a
        stream with no remaining marker flags exhaustion instead of
        scanning past the end."""
        self.acc, self.n = 0, 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and \
                    0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        self.exhausted = True


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """EXTEND (F.2.2.1): map t received bits to the signed amplitude."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _decode_huff(r: _BitReader, table: dict[tuple, int]) -> int:
    code, ln = 0, 0
    while True:
        code = (code << 1) | r.bit()
        ln += 1
        if (ln, code) in table:
            return table[(ln, code)]
        if ln > 16:
            raise ValueError("invalid Huffman stream")


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------

def _mag_cat(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _encode_block(w: _BitWriter, coefs: list[int], pred: int,
                  dc: dict, ac: dict) -> int:
    diff = coefs[0] - pred
    t = _mag_cat(diff)
    code, ln = dc[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max((i for i in range(1, 64) if coefs[i]), default=0)
    for i in range(1, last_nz + 1):
        v = coefs[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        t = _mag_cat(v)
        code, ln = ac[(run << 4) | t]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if last_nz < 63:
        code, ln = ac[0x00]  # EOB
        w.write(code, ln)
    return coefs[0]


def _fdct_quant(plane: np.ndarray, bx: int, by: int,
                quant: np.ndarray) -> list[int]:
    blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(
        np.float64) - 128.0
    coefs = _C @ blk @ _C.T
    q = np.round(coefs / quant).astype(np.int64)
    return [int(q.flat[z]) for z in _ZIGZAG]


def _pad_plane(buf: bytes, width: int, height: int) -> np.ndarray:
    a = np.frombuffer(buf, dtype=np.uint8).reshape(height, width)
    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    out = np.empty((ph, pw), dtype=np.uint8)
    out[:height, :width] = a
    out[height:, :width] = a[-1:, :]       # edge-replicate pad
    out[:, width:] = out[:, width - 1:width]
    return out


def _quant_matrix(qtab: list[int]) -> np.ndarray:
    qmat = np.empty(64)
    for i, z in enumerate(_ZIGZAG):
        qmat.flat[z] = qtab[i]
    return qmat.reshape(8, 8)


def _emit_frame_headers(out: bytearray, sof_marker: bytes,
                        qtab: list[int], width: int, height: int,
                        ncomp: int, tables: list[tuple]) -> None:
    """DQT + SOF + DHT segment framing shared by both encoders
    (1x1 sampling, single 8-bit quant table id 0)."""
    out += b"\xFF\xDB" + struct.pack(">HB", 67, 0) + bytes(qtab)
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci in range(ncomp):
        sof += struct.pack(">BBB", ci + 1, 0x11, 0)
    out += sof_marker + struct.pack(">H", len(sof) + 2) + sof
    for tc, (bits, vals) in tables:
        body = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", len(body) + 2) + body


def make_jpeg(width: int, height: int, pixels: bytes,
              quant: list[int] | None = None,
              chroma: tuple[bytes, bytes] | None = None) -> bytes:
    """Baseline JPEG. ``pixels`` = Y plane (row-major, 8-bit);
    ``chroma=(cb, cr)`` full-resolution planes adds 4:4:4 color."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer size mismatch")
    qtab = list(quant or QUANT_K1)
    qmat = _quant_matrix(qtab)
    ncomp = 3 if chroma else 1

    planes = [_pad_plane(pixels, width, height)] + (
        [_pad_plane(chroma[0], width, height),
         _pad_plane(chroma[1], width, height)] if chroma else [])
    out = bytearray(b"\xFF\xD8")  # SOI
    # DC/AC x lum/chr tables; chroma tables only when used
    tables = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if chroma:
        tables += [(0x01, _DC_CHR), (0x11, _AC_CHR)]
    _emit_frame_headers(out, b"\xFF\xC0", qtab, width, height, ncomp,
                        tables)
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos
    # entropy-coded interleaved MCUs (all 1x1 sampling -> one block
    # per component per MCU)
    w = _BitWriter()
    dc_tabs = [_huff_codes(*_DC_LUM)] + [_huff_codes(*_DC_CHR)] * 2
    ac_tabs = [_huff_codes(*_AC_LUM)] + [_huff_codes(*_AC_CHR)] * 2
    preds = [0] * ncomp
    mcus_x, mcus_y = -(-width // 8), -(-height // 8)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                coefs = _fdct_quant(planes[ci], mx, my, qmat)
                _encode_block(w, coefs, preds[ci],
                              dc_tabs[ci], ac_tabs[ci])
                preds[ci] = coefs[0]
    out += w.flush()
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def _enc_dc_first(w: _BitWriter, blocks: list, ncomp: int,
                  dc_tabs: list[dict], al: int) -> None:
    """Interleaved DC scan (all 1x1 sampling -> one block/comp per MCU);
    the coded value is the point-transformed DC (T.81 G.1.2.1)."""
    preds = [0] * ncomp
    by_n = len(blocks[0])
    bx_n = len(blocks[0][0])
    for by in range(by_n):
        for bx in range(bx_n):
            for ci in range(ncomp):
                v = blocks[ci][by][bx][0] >> al
                diff = v - preds[ci]
                preds[ci] = v
                t = _mag_cat(diff)
                code, ln = dc_tabs[ci][t]
                w.write(code, ln)
                if t:
                    w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _enc_dc_refine(w: _BitWriter, blocks: list, ncomp: int,
                   al: int) -> None:
    for by in range(len(blocks[0])):
        for bx in range(len(blocks[0][0])):
            for ci in range(ncomp):
                w.write((blocks[ci][by][bx][0] >> al) & 1, 1)


def _write_eobn(w: _BitWriter, ac: dict, eobrun: int) -> None:
    """Emit the EOBn symbol + extension bits for a pending end-of-band
    run (T.81 G.1.2.2: n = floor(log2(run)), run - 2^n in n bits)."""
    n = eobrun.bit_length() - 1
    code, ln = ac[n << 4]
    w.write(code, ln)
    if n:
        w.write(eobrun - (1 << n), n)


def _enc_ac_first(w: _BitWriter, blocks_flat: list, ac: dict,
                  al: int, ss: int = 1, se: int = 63) -> None:
    """Non-interleaved AC first scan with cross-block EOB runs
    (T.81 G.1.2.2); AC point transform truncates toward zero."""
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            _write_eobn(w, ac, eobrun)
            eobrun = 0

    for coefs in blocks_flat:
        band = []
        for k in range(ss, se + 1):
            v = coefs[k]
            t = (abs(v) >> al)
            band.append(t if v >= 0 else -t)
        last_nz = max((i for i, v in enumerate(band) if v), default=-1)
        if last_nz < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        run = 0
        for v in band[:last_nz + 1]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac[0xF0]
                w.write(code, ln)
                run -= 16
            t = _mag_cat(v)
            code, ln = ac[(run << 4) | t]
            w.write(code, ln)
            w.write(v if v >= 0 else v + (1 << t) - 1, t)
            run = 0
        if last_nz < len(band) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _enc_ac_refine(w: _BitWriter, blocks_flat: list, ac: dict,
                   al: int, ss: int = 1, se: int = 63) -> None:
    """AC successive-approximation refinement scan (T.81 G.1.2.3):
    newly-nonzero coefficients are coded as (run, size=1)+sign;
    already-nonzero ones contribute one buffered correction bit,
    flushed after the next code (the decoder reads them while
    advancing over the run)."""
    eobrun = 0
    pending: list[int] = []  # correction bits awaiting the next flush

    def flush_eob() -> None:
        nonlocal eobrun, pending
        if eobrun:
            _write_eobn(w, ac, eobrun)
            eobrun = 0
        for b in pending:
            w.write(b, 1)
        pending = []

    for coefs in blocks_flat:
        absv = [abs(coefs[k]) >> al for k in range(ss, se + 1)]
        signs = [coefs[k] >= 0 for k in range(ss, se + 1)]
        eob = -1
        for i, t in enumerate(absv):
            if t == 1:
                eob = i  # last newly-nonzero position
        run = 0
        block_bits: list[int] = []
        for i, t in enumerate(absv):
            if t == 0:
                run += 1
                continue
            while run > 15 and i <= eob:
                flush_eob()
                code, ln = ac[0xF0]
                w.write(code, ln)
                run -= 16
                for b in block_bits:
                    w.write(b, 1)
                block_bits = []
            if t > 1:
                block_bits.append(t & 1)
                continue
            flush_eob()
            code, ln = ac[(run << 4) | 1]
            w.write(code, ln)
            w.write(1 if signs[i] else 0, 1)
            run = 0
            for b in block_bits:
                w.write(b, 1)
            block_bits = []
        if run > 0 or block_bits:
            eobrun += 1
            pending.extend(block_bits)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def make_progressive_jpeg(width: int, height: int, pixels: bytes,
                          quant: list[int] | None = None,
                          chroma: tuple[bytes, bytes] | None = None,
                          successive: bool = False) -> bytes:
    """Progressive JPEG (SOF2) fixture encoder, 1x1 sampling.

    ``successive=False``: spectral selection only — one interleaved DC
    scan then one full-band AC scan per component. ``successive=True``
    adds successive approximation: DC at Al=1 + DC refinement, AC at
    Al=1 + AC refinement (exercises every Annex-G decode path incl.
    EOB runs and correction bits)."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer size mismatch")
    qtab = list(quant or QUANT_K1)
    qmat = _quant_matrix(qtab)
    ncomp = 3 if chroma else 1
    planes = [_pad_plane(pixels, width, height)] + (
        [_pad_plane(chroma[0], width, height),
         _pad_plane(chroma[1], width, height)] if chroma else [])
    by_n, bx_n = -(-height // 8), -(-width // 8)
    blocks = [[[_fdct_quant(planes[ci], bx, by, qmat)
                for bx in range(bx_n)] for by in range(by_n)]
              for ci in range(ncomp)]

    out = bytearray(b"\xFF\xD8")
    tables = [(0x00, _DC_LUM), (0x10, _AC_PROG)]
    if chroma:
        tables.append((0x01, _DC_CHR))
    _emit_frame_headers(out, b"\xFF\xC2", qtab, width, height, ncomp,
                        tables)

    dc_tabs = [_huff_codes(*_DC_LUM)] + [_huff_codes(*_DC_CHR)] * 2
    ac_tab = _huff_codes(*_AC_PROG)

    def emit_scan(comp_ids: list[int], ss: int, se: int, ah: int,
                  al: int, body: bytes) -> None:
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            td = 0 if cid == 1 else 1
            sos += bytes([cid, (td << 4) | 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos)
        out.extend(body)

    all_ids = list(range(1, ncomp + 1))
    flat = [[blk for row in blocks[ci] for blk in row]
            for ci in range(ncomp)]
    if not successive:
        w = _BitWriter()
        _enc_dc_first(w, blocks, ncomp, dc_tabs, 0)
        emit_scan(all_ids, 0, 0, 0, 0, w.flush())
        for ci in range(ncomp):
            w = _BitWriter()
            _enc_ac_first(w, flat[ci], ac_tab, 0)
            emit_scan([ci + 1], 1, 63, 0, 0, w.flush())
    else:
        w = _BitWriter()
        _enc_dc_first(w, blocks, ncomp, dc_tabs, 1)
        emit_scan(all_ids, 0, 0, 0, 1, w.flush())
        for ci in range(ncomp):
            w = _BitWriter()
            _enc_ac_first(w, flat[ci], ac_tab, 1)
            emit_scan([ci + 1], 1, 63, 0, 1, w.flush())
        w = _BitWriter()
        _enc_dc_refine(w, blocks, ncomp, 0)
        emit_scan(all_ids, 0, 0, 1, 0, w.flush())
        for ci in range(ncomp):
            w = _BitWriter()
            _enc_ac_refine(w, flat[ci], ac_tab, 0)
            emit_scan([ci + 1], 1, 63, 1, 0, w.flush())
    out += b"\xFF\xD9"
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> dict:
    """Decode baseline or progressive JPEG -> {"width", "height",
    "n_components", "pixels": bytes (Y plane, row-major)}. Raises
    ValueError on arithmetic-coded / lossless / hierarchical frames."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[int, dict] = {}
    comps: list[dict] = []
    width = height = None
    restart_interval = 0
    scan_pos = None
    scan_comps: list[dict] = []
    progressive = False
    prog: dict | None = None  # allocated at first progressive SOS
    nscans = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 2 + 2:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                n = 64 * (2 if pq else 1)
                raw = body[b + 1:b + 1 + n]
                if len(raw) < n:
                    raise ValueError("truncated DQT")
                vals = (struct.unpack(f">{64}H", raw) if pq
                        else list(raw))
                q = np.empty(64)
                for i, z in enumerate(_ZIGZAG):
                    q.flat[z] = vals[i]
                qtabs[tq] = q.reshape(8, 8)
                b += 1 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 + progressive SOF2
            if comps:
                # one frame per image (T.81 B.2.1); a second SOF after
                # _prog_alloc would desync the coefficient store
                raise ValueError("multiple SOF segments")
            if len(body) < 6:
                raise ValueError("truncated SOF")
            _, height, width, nc = struct.unpack(">BHHB", body[:6])
            if len(body) < 6 + nc * 3:
                raise ValueError("truncated SOF")
            if width == 0 or height == 0:
                # T.81 allows Y=0 only when a DNL marker later supplies
                # the height (B.2.2) — unsupported here; X=0 is illegal.
                # Without this, a zero-pixel frame "decodes" and every
                # mean-luma consumer divides by zero.
                raise ValueError("zero-dimension SOF frame")
            progressive = marker == 0xC2
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3:9 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline/progressive Huffman JPEG supported")
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc_th = body[b]
                bits = list(body[b + 1:b + 17])
                n = sum(bits)
                vals = list(body[b + 17:b + 17 + n])
                htabs[tc_th] = _huff_decode_map(bits, vals)
                b += 17 + n
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if not body:
                raise ValueError("truncated SOS")
            ns = body[0]
            if not 1 <= ns <= 4:  # B.2.3: 1 <= Ns <= 4
                raise ValueError("invalid SOS component count")
            if len(body) < 1 + ns * 2:
                raise ValueError("truncated SOS")
            if progressive and prog is None:
                # before scan_comps copies comps: adds bw/bh grids
                prog = _prog_alloc(width, height, comps)
            scan_comps = []
            for ci in range(ns):
                cs, tt = body[1 + ci * 2], body[2 + ci * 2]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    raise ValueError("SOS references unknown component")
                scan_comps.append({**comp, "td": tt >> 4, "ta": tt & 0x0F,
                                   "ci": comps.index(comp)})
            if not progressive:
                scan_pos = pos + 2 + seglen
                break
            if len(body) < 1 + ns * 2 + 3:
                raise ValueError("truncated SOS")
            ss, se, ahl = body[1 + ns * 2:4 + ns * 2]
            ah, al = ahl >> 4, ahl & 0x0F
            pos = _decode_prog_scan(
                data, pos + 2 + seglen, scan_comps, prog, ss, se, ah,
                al, htabs, restart_interval)
            nscans += 1
            continue
        pos += 2 + seglen
    if progressive:
        if prog is None or not nscans:
            raise ValueError("missing SOF/SOS")
        return _prog_reconstruct(width, height, comps, qtabs, prog)
    if width is None or scan_pos is None:
        raise ValueError("missing SOF/SOS")

    if width * height > 100_000_000:
        raise ValueError("image too large for pure-Python decode")
    for c in scan_comps:
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
            raise ValueError("invalid sampling factors")
        if c["td"] not in htabs or (0x10 | c["ta"]) not in htabs \
                or c["tq"] not in qtabs:
            raise ValueError("scan references a missing table")
    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = []
    for c in scan_comps:
        planes.append(np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8),
                               dtype=np.float64))
    r = _BitReader(data, scan_pos)
    preds = [0] * len(scan_comps)
    mcu_count = 0
    for my in range(mcus_y):
        if r.exhausted:
            break  # truncated stream: remaining MCUs stay zero
        for mx in range(mcus_x):
            if r.exhausted:
                break
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                r.align_restart()
                preds = [0] * len(scan_comps)
            try:
                for ci, c in enumerate(scan_comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk, preds[ci] = _decode_block(
                                r, htabs[c["td"]],
                                htabs[0x10 | c["ta"]],
                                qtabs[c["tq"]], preds[ci])
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
            except _RestartMarker:
                # unexpected mid-MCU restart (corrupt stream): resync
                # at the marker, reset predictors, keep going
                r.acc, r.n = 0, 0
                preds = [0] * len(scan_comps)
            mcu_count += 1
    y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    # crop the luma plane (its own sampling-scaled size)
    c0 = scan_comps[0]
    yw = -(-width * c0["h"] // hmax)
    yh = -(-height * c0["v"] // vmax)
    y = y[:yh, :yw]
    return {"width": width, "height": height,
            "n_components": len(scan_comps),
            "pixels": y.tobytes()}


def _decode_block(r: _BitReader, dc: dict, ac: dict,
                  quant: np.ndarray, pred: int) -> tuple[np.ndarray, int]:
    t = _decode_huff(r, dc)
    diff = _extend(r.bits(t), t) if t else 0
    dcval = pred + diff
    coefs = np.zeros(64)
    coefs[0] = dcval
    k = 1
    while k < 64:
        rs = _decode_huff(r, ac)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC index overflow")
        coefs[_ZIGZAG[k]] = _extend(r.bits(size), size)
        k += 1
    blk = coefs.reshape(8, 8) * quant
    return _C.T @ blk @ _C + 128.0, dcval


# --------------------------------------------------------------------------
# Progressive decoding (T.81 Annex G)
# --------------------------------------------------------------------------

def _next_marker(data: bytes, p: int) -> int:
    """Position of the next real marker (skips stuffed 0xFF00, fill
    0xFFFF runs, and restart markers) — where the header walk resumes
    after a progressive entropy segment."""
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00, 0xFF) \
                and not (0xD0 <= data[p + 1] <= 0xD7):
            return p
        p += 1
    return len(data)


def _prog_alloc(width: int, height: int, comps: list[dict]) -> dict:
    """Frame-lifetime coefficient store: per component, an int32
    (blocks_y, blocks_x, 64) array in natural (row-major) coefficient
    order, padded to the interleaved MCU grid; scans accumulate into
    it and the IDCT runs once at EOI."""
    if not comps:
        raise ValueError("SOS before SOF")
    if width * height > 100_000_000:
        raise ValueError("image too large for pure-Python decode")
    for c in comps:
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
            raise ValueError("invalid sampling factors")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    store = []
    for c in comps:
        cw = -(-width * c["h"] // hmax)
        ch = -(-height * c["v"] // vmax)
        c["bw"], c["bh"] = -(-cw // 8), -(-ch // 8)  # non-interleaved grid
        store.append(np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64),
                              dtype=np.int32))
    return {"store": store, "mcus_x": mcus_x, "mcus_y": mcus_y,
            "hmax": hmax, "vmax": vmax}


def _decode_prog_scan(data: bytes, start: int, scan_comps: list[dict],
                      prog: dict, ss: int, se: int, ah: int, al: int,
                      htabs: dict, restart_interval: int) -> int:
    """Decode one progressive scan into the coefficient store; returns
    the stream position of the next marker. Truncated entropy data
    leaves the remaining blocks at their prior value (media.py
    truncation-tolerance convention)."""
    if al > 13 or ah > 13:
        raise ValueError("invalid successive approximation")
    store = prog["store"]
    r = _BitReader(data, start)
    eobrun = 0
    preds = [0] * len(scan_comps)

    def dc_block(arr: np.ndarray, by: int, bx: int, si: int) -> None:
        if ah == 0:
            t = _decode_huff(r, htabs[scan_comps[si]["td"]])
            if t > 11:  # Table F.1: DC categories 0-11 for 8-bit
                raise ValueError("invalid DC category")
            diff = _extend(r.bits(t), t) if t else 0
            # corrupt streams can walk the predictor arbitrarily far
            # (valid 8-bit DC never exceeds ~2^10); clamp so the int32
            # store assignment below never overflows (2^17 << 13 = 2^30)
            preds[si] = max(-(1 << 17), min((1 << 17) - 1,
                                            preds[si] + diff))
            arr[by, bx, 0] = preds[si] << al
        elif r.bit():
            arr[by, bx, 0] = int(arr[by, bx, 0]) | (1 << al)

    def ac_first_block(arr: np.ndarray, by: int, bx: int,
                       actab: dict) -> None:
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _decode_huff(r, actab)
            run, s = rs >> 4, rs & 0x0F
            if s == 0:
                if run == 15:
                    k += 16  # ZRL
                    continue
                eobrun = (1 << run) - 1
                if run:
                    eobrun += r.bits(run)
                break
            k += run
            if k > se:
                raise ValueError("AC index overflow")
            arr[by, bx, _ZIGZAG[k]] = _extend(r.bits(s), s) << al
            k += 1

    def ac_refine_block(arr: np.ndarray, by: int, bx: int,
                        actab: dict) -> None:
        # G.2 / classic IJG control flow: correction bits for
        # already-nonzero coefficients are read while advancing over a
        # run; EOB runs refine the rest of the band.
        nonlocal eobrun
        p1, m1 = 1 << al, -(1 << al)
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _decode_huff(r, actab)
                run, s = rs >> 4, rs & 0x0F
                newval = 0
                if s == 0:
                    if run != 15:
                        eobrun = 1 << run
                        if run:
                            eobrun += r.bits(run)
                        break
                    # ZRL: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("invalid refinement size")
                    newval = p1 if r.bit() else m1
                while k <= se:
                    z = _ZIGZAG[k]
                    v = int(arr[by, bx, z])
                    if v != 0:
                        if r.bit() and (v & p1) == 0:
                            arr[by, bx, z] = v + (p1 if v > 0 else m1)
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if newval and k <= se:
                    arr[by, bx, _ZIGZAG[k]] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                z = _ZIGZAG[k]
                v = int(arr[by, bx, z])
                if v != 0 and r.bit() and (v & p1) == 0:
                    arr[by, bx, z] = v + (p1 if v > 0 else m1)
                k += 1
            eobrun -= 1

    # ---- validate band + tables for this scan ----
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ah == 0:
            for c in scan_comps:
                if c["td"] not in htabs:
                    raise ValueError("scan references a missing table")
    else:
        if not (ss <= se <= 63) or len(scan_comps) != 1:
            raise ValueError("invalid progressive AC scan")
        if (0x10 | scan_comps[0]["ta"]) not in htabs:
            raise ValueError("scan references a missing table")

    def resync() -> None:
        nonlocal eobrun, preds
        r.acc, r.n = 0, 0
        eobrun = 0
        preds = [0] * len(scan_comps)

    unit = 0  # restart-interval counter (MCUs, or blocks when ns==1)

    def at_boundary() -> None:
        if restart_interval and unit and unit % restart_interval == 0:
            r.align_restart()
            resync()

    if ss == 0 and len(scan_comps) > 1:  # interleaved DC scan
        for my in range(prog["mcus_y"]):
            if r.exhausted:
                break
            for mx in range(prog["mcus_x"]):
                if r.exhausted:
                    break
                at_boundary()
                try:
                    for si, c in enumerate(scan_comps):
                        arr = store[c["ci"]]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_block(arr, my * c["v"] + by,
                                         mx * c["h"] + bx, si)
                except _RestartMarker:
                    resync()
                unit += 1
    else:  # non-interleaved: one component, its own block grid
        c = scan_comps[0]
        arr = store[c["ci"]]
        actab = htabs.get(0x10 | c["ta"])
        done = False
        for by in range(c["bh"]):
            if done:
                break
            for bx in range(c["bw"]):
                if r.exhausted:
                    done = True
                    break
                at_boundary()
                try:
                    if ss == 0:
                        dc_block(arr, by, bx, 0)
                    elif ah == 0:
                        ac_first_block(arr, by, bx, actab)
                    else:
                        ac_refine_block(arr, by, bx, actab)
                except _RestartMarker:
                    resync()
                unit += 1
    return _next_marker(data, r.pos)


def _prog_reconstruct(width: int, height: int, comps: list[dict],
                      qtabs: dict, prog: dict) -> dict:
    """Dequantize + IDCT the luma component's accumulated coefficients
    (chroma coefficients are decoded to keep the streams aligned but
    only the Y plane is surfaced, matching the baseline contract)."""
    c0 = comps[0]
    if c0["tq"] not in qtabs:
        raise ValueError("scan references a missing table")
    q = qtabs[c0["tq"]]
    bh, bw = c0["bh"], c0["bw"]
    coefs = prog["store"][0][:bh, :bw].astype(np.float64)
    blk = coefs.reshape(bh, bw, 8, 8) * q
    out = _C.T @ blk @ _C + 128.0
    plane = out.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    yw = -(-width * c0["h"] // prog["hmax"])
    yh = -(-height * c0["v"] // prog["vmax"])
    y = np.clip(np.round(plane), 0, 255).astype(np.uint8)[:yh, :yw]
    return {"width": width, "height": height,
            "n_components": len(comps), "pixels": y.tobytes()}
