"""Pure-Python multimodal codecs: PNG (image), WAV (audio), Y4M (video).

Replaces the r01 ``_decode_stub``: these are REAL container formats
written and parsed byte-for-byte from their public specs (PNG: RFC
2083; WAV: RIFF/WAVE; Y4M: YUV4MPEG2 as used by mjpegtools/ffmpeg) —
no media libraries needed. Formats that require compressed-codec
libraries (JPEG/MP3/H.264) stay out of scope in this container; their
Spark-side plumbing is identical (opaque ``binary`` column + typed
metadata out).

Decoders do full real work: PNG defilters every scanline (all 5 filter
types) after zlib-inflating IDAT; WAV walks RIFF chunks; Y4M parses the
plain-text stream header and strides over FRAME payloads. Feature
extraction (mean pixel / mean sample / mean sampled-frame luma),
nearest-neighbor resize, and every-k-th frame sampling are the
operations a training-data pipeline runs over such columns.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["make_png", "decode_png", "make_wav", "decode_wav",
           "make_y4m", "decode_y4m", "resize_nearest"]

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data +
            struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def make_png(width: int, height: int, pixels: bytes) -> bytes:
    """8-bit grayscale PNG (color type 0, filter 0 per row)."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer size mismatch")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[r * width:(r + 1) * width]
                   for r in range(height))
    return (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr) +
            _png_chunk(b"IDAT", zlib.compress(raw, 9)) +
            _png_chunk(b"IEND", b""))


def decode_png(data: bytes) -> dict:
    """Parse IHDR, inflate IDAT, defilter scanlines (spec filters 0-4).
    Returns {"width", "height", "bit_depth", "pixels": bytes}."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = bit_depth = color_type = None
    idat = b""
    while pos + 8 <= len(data):
        (ln,), typ = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", body[:10])
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR")
    if bit_depth != 8 or color_type != 0:
        raise ValueError("only 8-bit grayscale supported")
    raw = zlib.decompress(idat)
    # defilter: EXACTLY the PDF PNG-predictor math with colors=1, bpc=8
    # (rowlen = width, bpp = 1) — one shared implementation, one place
    # to fix (the previous copy duplicated all five filters inline)
    from .pdf_text import _undo_png_predictor
    out = _undo_png_predictor(raw, width, 1, 8)
    return {"width": width, "height": height, "bit_depth": bit_depth,
            "pixels": bytes(out)}


def resize_nearest(pixels: bytes, w: int, h: int,
                   out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample of an 8-bit grayscale buffer."""
    out = bytearray(out_w * out_h)
    for y in range(out_h):
        sy = y * h // out_h
        base = sy * w
        for x in range(out_w):
            out[y * out_w + x] = pixels[base + x * w // out_w]
    return bytes(out)


def make_wav(samples: bytes, rate: int = 8000) -> bytes:
    """8-bit unsigned mono PCM WAV."""
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
    body = (b"WAVE" +
            b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"data" + struct.pack("<I", len(samples)) + samples)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> dict:
    """Walk RIFF chunks; returns rate, n_samples, duration_ms, samples."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate = None
    samples = b""
    while pos + 8 <= len(data):
        typ = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if typ == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if audio_fmt != 1 or channels != 1 or bits != 8:
                raise ValueError("only 8-bit mono PCM supported")
        elif typ == b"data":
            samples = body
    if rate is None:
        raise ValueError("no fmt chunk")
    return {"rate": rate, "n_samples": len(samples),
            "duration_ms": round(1000 * len(samples) / rate),
            "samples": samples}


def make_y4m(width: int, height: int, lumas: list[int]) -> bytes:
    """YUV4MPEG2 stream, C420, one constant-luma frame per entry."""
    hdr = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n".encode()
    uv = bytes([128]) * (width * height // 4)
    frames = b"".join(
        b"FRAME\n" + bytes([l]) * (width * height) + uv + uv
        for l in lumas)
    return hdr + frames


def decode_y4m(data: bytes, sample_every: int = 2) -> dict:
    """Parse the stream header; stride FRAME payloads, decoding every
    ``sample_every``-th frame's luma plane (frame sampling)."""
    eol = data.find(b"\n")
    hdr = data[:eol].decode("ascii", "replace")
    if not hdr.startswith("YUV4MPEG2"):
        raise ValueError("not a Y4M stream")
    params = dict((tok[0], tok[1:]) for tok in hdr.split()[1:])
    w, h = int(params["W"]), int(params["H"])
    frame_bytes = w * h * 3 // 2
    pos = eol + 1
    n_frames = 0
    sampled_lumas: list[float] = []
    while pos < len(data) and data[pos:pos + 5] == b"FRAME":
        pos = data.find(b"\n", pos) + 1
        if n_frames % sample_every == 0:
            y_plane = data[pos:pos + w * h]
            if not y_plane:  # stream truncated right after FRAME header
                break
            sampled_lumas.append(sum(y_plane) / len(y_plane))
        pos += frame_bytes
        n_frames += 1
    return {"width": w, "height": h, "n_frames": n_frames,
            "frames_sampled": len(sampled_lumas),
            "mean_sampled_luma": (sum(sampled_lumas) / len(sampled_lumas)
                                  if sampled_lumas else None)}
