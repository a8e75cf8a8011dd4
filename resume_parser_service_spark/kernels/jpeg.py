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
  restart intervals, 0xFF00 byte unstuffing. Progressive/arithmetic
  raise ``ValueError``.
- **Encoder** (fixture generator + sink symmetry): grayscale or 4:4:4
  color, Annex K.3 Huffman tables, caller-supplied quant table.

The DCT pair runs on numpy (separable orthonormal basis matrix — the
whole IDCT is two 8x8 matmuls per block), which the container ships;
everything else is stdlib. Feature surface mirrors ``decode_png``:
width / height / n_components / pixels (Y plane) for mean-luma.
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = ["make_jpeg", "decode_jpeg", "QUANT_FLAT", "QUANT_K1"]

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


def make_jpeg(width: int, height: int, pixels: bytes,
              quant: list[int] | None = None,
              chroma: tuple[bytes, bytes] | None = None) -> bytes:
    """Baseline JPEG. ``pixels`` = Y plane (row-major, 8-bit);
    ``chroma=(cb, cr)`` full-resolution planes adds 4:4:4 color."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer size mismatch")
    qtab = list(quant or QUANT_K1)
    qmat = np.empty(64)
    for i, z in enumerate(_ZIGZAG):
        qmat.flat[z] = qtab[i]
    qmat = qmat.reshape(8, 8)
    ncomp = 3 if chroma else 1

    def _pad(buf: bytes) -> np.ndarray:
        a = np.frombuffer(buf, dtype=np.uint8).reshape(height, width)
        ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
        out = np.empty((ph, pw), dtype=np.uint8)
        out[:height, :width] = a
        out[height:, :width] = a[-1:, :]       # edge-replicate pad
        out[:, width:] = out[:, width - 1:width]
        return out

    planes = [_pad(pixels)] + ([_pad(chroma[0]), _pad(chroma[1])]
                               if chroma else [])
    out = bytearray(b"\xFF\xD8")  # SOI
    # DQT (one table, id 0, 8-bit)
    out += b"\xFF\xDB" + struct.pack(">HB", 67, 0) + bytes(qtab)
    # SOF0
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci in range(ncomp):
        sof += struct.pack(">BBB", ci + 1, 0x11, 0)  # 1x1 sampling, qtab 0
    out += b"\xFF\xC0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT: 4 tables (DC/AC x lum/chr); chroma tables only when used
    tables = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if chroma:
        tables += [(0x01, _DC_CHR), (0x11, _AC_CHR)]
    for tc, (bits, vals) in tables:
        body = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", len(body) + 2) + body
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


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> dict:
    """Decode baseline JPEG -> {"width", "height", "n_components",
    "pixels": bytes (Y plane, row-major)}. Raises ValueError on
    progressive (SOF2) / arithmetic / lossless frames."""
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
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline(+ext sequential)
            if len(body) < 6:
                raise ValueError("truncated SOF")
            _, height, width, nc = struct.unpack(">BHHB", body[:6])
            if len(body) < 6 + nc * 3:
                raise ValueError("truncated SOF")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3:9 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
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
            if len(body) < 1 + ns * 2:
                raise ValueError("truncated SOS")
            scan_comps = []
            for ci in range(ns):
                cs, tt = body[1 + ci * 2], body[2 + ci * 2]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    raise ValueError("SOS references unknown component")
                scan_comps.append({**comp, "td": tt >> 4, "ta": tt & 0x0F})
            scan_pos = pos + 2 + seglen
            break
        pos += 2 + seglen
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
