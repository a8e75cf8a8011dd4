"""Pure-Python multimodal codecs (kernels/media.py): byte-level format
conformance + decode round-trips for PNG (RFC 2083), WAV (RIFF), and
Y4M (YUV4MPEG2) — the real replacement for the r01 decode stub."""

import struct
import zlib

import pytest

from resume_parser_service_spark.kernels.media import (decode_png,
                                                       decode_wav,
                                                       decode_y4m, make_png,
                                                       make_wav, make_y4m,
                                                       resize_nearest)


def test_png_roundtrip_gradient():
    w, h = 16, 9
    pixels = bytes((x * 17 + y * 3) % 256 for y in range(h)
                   for x in range(w))
    data = make_png(w, h, pixels)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    img = decode_png(data)
    assert (img["width"], img["height"]) == (w, h)
    assert img["pixels"] == pixels


def test_png_defilters_all_filter_types():
    """A spec-conformant decoder must handle Sub/Up/Average/Paeth rows,
    not just filter 0 — hand-build one IDAT with each."""
    w = 4
    rows = [
        (0, bytes([10, 20, 30, 40])),          # None
        (1, bytes([5, 5, 5, 5])),              # Sub: 5,10,15,20
        (2, bytes([1, 1, 1, 1])),              # Up: 6,11,16,21
        (3, bytes([0, 0, 0, 0])),              # Average
        (4, bytes([0, 0, 0, 0])),              # Paeth
    ]
    raw = b"".join(bytes([f]) + r for f, r in rows)
    ihdr = struct.pack(">IIBBBBB", w, len(rows), 8, 0, 0, 0, 0)

    def chunk(typ, body):
        return (struct.pack(">I", len(body)) + typ + body +
                struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    img = decode_png(data)
    px = img["pixels"]
    assert px[0:4] == bytes([10, 20, 30, 40])
    assert px[4:8] == bytes([5, 10, 15, 20])
    assert px[8:12] == bytes([6, 11, 16, 21])
    # Average row: left/2 + up/2 arithmetic
    assert px[12] == 6 // 2 and px[13] == (px[12] + 11) // 2
    # Paeth row over the Average row: predictor picks nearest of a/b/c
    assert len(px) == 20


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png")


def test_resize_nearest():
    pixels = bytes([0, 255, 128, 64])  # 2x2
    out = resize_nearest(pixels, 2, 2, 4, 4)
    assert len(out) == 16
    assert out[0] == 0 and out[3] == 255 and out[15] == 64


def test_wav_roundtrip():
    samples = bytes(range(200)) * 5
    data = make_wav(samples, rate=8000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    wav = decode_wav(data)
    assert wav["rate"] == 8000
    assert wav["n_samples"] == 1000
    assert wav["duration_ms"] == 125
    assert wav["samples"] == samples


def test_y4m_frame_sampling():
    data = make_y4m(16, 8, [100, 150, 200, 250, 50])
    assert data.startswith(b"YUV4MPEG2 W16 H8 ")
    vid = decode_y4m(data, sample_every=2)
    assert (vid["width"], vid["height"]) == (16, 8)
    assert vid["n_frames"] == 5
    assert vid["frames_sampled"] == 3          # frames 0, 2, 4
    assert vid["mean_sampled_luma"] == (100 + 200 + 50) / 3


def test_multimodal_query_oracle_parity(spark):
    """Driver-style check of the full encode->decode query vs its
    arithmetic oracle at sf0.001."""
    import duckdb

    from resume_parser_service_spark.operators.extract_queries import (
        _MULTIMODAL_ORACLE, _q_multimodal_metadata)

    sdf = _q_multimodal_metadata(
        spark, "/root/testdata/sf0.001").toPandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    odf = con.execute(_MULTIMODAL_ORACLE).df()
    assert len(sdf) == len(odf)
    for col in ["media_type", "dim1", "dim2", "frames_sampled", "feature"]:
        assert list(sdf[col]) == pytest.approx(list(odf[col])) \
            if col == "feature" else list(sdf[col]) == list(odf[col]), col


def test_y4m_truncated_after_frame_header():
    """A stream cut right after 'FRAME\\n' reports the frames actually
    decoded instead of dividing by zero."""
    from resume_parser_service_spark.kernels.media import (decode_y4m,
                                                           make_y4m)

    data = make_y4m(4, 4, [10, 20])
    cut = data.rfind(b"FRAME\n") + len(b"FRAME\n")
    r = decode_y4m(data[:cut], sample_every=1)
    assert r["frames_sampled"] == 1
    assert r["mean_sampled_luma"] == 10.0


# ---------------------------------------------------------------------
# baseline JPEG (kernels/jpeg.py)
# ---------------------------------------------------------------------

def test_jpeg_solid_roundtrip_exact():
    """DC-only solid block with the flat quant table reconstructs the
    exact gray value — the invariant the multimodal oracle states."""
    from resume_parser_service_spark.kernels.jpeg import (QUANT_FLAT,
                                                          decode_jpeg,
                                                          make_jpeg)
    for val in (0, 1, 127, 128, 200, 255):
        w, h = 13, 9  # non-multiple-of-8 -> edge padding path
        d = decode_jpeg(make_jpeg(w, h, bytes([val]) * (w * h),
                                  quant=QUANT_FLAT))
        assert (d["width"], d["height"], d["n_components"]) == (w, h, 1)
        assert set(d["pixels"]) == {val}


def test_jpeg_gradient_near_lossless_with_flat_quant():
    from resume_parser_service_spark.kernels.jpeg import (QUANT_FLAT,
                                                          decode_jpeg,
                                                          make_jpeg)
    w, h = 17, 24
    src = bytes([(x * 13 + y * 7) % 256 for y in range(h)
                 for x in range(w)])
    out = decode_jpeg(make_jpeg(w, h, src, quant=QUANT_FLAT))["pixels"]
    assert max(abs(a - b) for a, b in zip(src, out)) <= 1


def test_jpeg_k1_quant_lossy_but_structured():
    """The Annex K.1 table is lossy; the mean must still track and the
    stream must parse (DQT/SOF0/DHT/SOS walk + Huffman decode)."""
    from resume_parser_service_spark.kernels.jpeg import (QUANT_K1,
                                                          decode_jpeg,
                                                          make_jpeg)
    w = h = 32
    src = bytes([(x * x + 3 * y * y) % 256 for y in range(h)
                 for x in range(w)])
    d = decode_jpeg(make_jpeg(w, h, src, quant=QUANT_K1))
    m_in = sum(src) / len(src)
    m_out = sum(d["pixels"]) / len(d["pixels"])
    assert abs(m_in - m_out) < 2.0


def test_jpeg_color_444_components():
    from resume_parser_service_spark.kernels.jpeg import (QUANT_FLAT,
                                                          decode_jpeg,
                                                          make_jpeg)
    w = h = 16
    y = bytes([90]) * (w * h)
    d = decode_jpeg(make_jpeg(w, h, y, quant=QUANT_FLAT,
                              chroma=(bytes([100]) * (w * h),
                                      bytes([200]) * (w * h))))
    assert d["n_components"] == 3
    assert set(d["pixels"]) == {90}  # luma plane untouched by chroma


def test_jpeg_rejects_non_baseline():
    import pytest

    from resume_parser_service_spark.kernels.jpeg import (decode_jpeg,
                                                          make_jpeg)
    j = bytearray(make_jpeg(8, 8, bytes(64)))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    sof = bytes(j).find(b"\xFF\xC0")
    j[sof + 1] = 0xC9  # claim arithmetic-coded (SOF9) — unsupported
    with pytest.raises(ValueError):
        decode_jpeg(bytes(j))


def test_jpeg_truncated_entropy_decodes_partially():
    """r4 review: a stream cut mid-entropy-data drains with zero bits
    (media.py truncation convention) instead of IndexError."""
    from resume_parser_service_spark.kernels.jpeg import (QUANT_FLAT,
                                                          decode_jpeg,
                                                          make_jpeg)
    j = make_jpeg(32, 32, bytes([200]) * 1024, quant=QUANT_FLAT)
    sos_end = j.find(b"\xFF\xDA") + 14  # past the SOS header
    cut = sos_end + (len(j) - sos_end) // 2  # mid-entropy-data
    d = decode_jpeg(j[:cut])
    assert (d["width"], d["height"]) == (32, 32)
    assert len(d["pixels"]) == 1024
    # a cut inside a HEADER segment raises ValueError, never IndexError
    import pytest
    with pytest.raises(ValueError):
        decode_jpeg(j[:j.find(b"\xFF\xC4") + 10])


def test_jpeg_fill_bytes_before_marker():
    """Spec-legal 0xFF fill bytes before a marker (B.1.1.2) must not
    derail the header walk."""
    from resume_parser_service_spark.kernels.jpeg import (QUANT_FLAT,
                                                          decode_jpeg,
                                                          make_jpeg)
    j = make_jpeg(8, 8, bytes([77]) * 64, quant=QUANT_FLAT)
    sof = j.find(b"\xFF\xC0")
    padded = j[:sof] + b"\xFF\xFF\xFF" + j[sof:]
    d = decode_jpeg(padded)
    assert set(d["pixels"]) == {77}


def test_jpeg_mutation_fuzz_fails_closed_fast():
    """Seeded byte-mutation fuzz (the pdf_fuzz recipe): every mutant
    either decodes or raises ValueError — no IndexError, no
    struct.error, and no pathological slow path (the corrupted-SOF
    giant-image case short-circuits via the exhausted bitreader). The
    no-hang property is guarded by SIGALRM, not a wall-clock
    assertion — single timings are host-noise-dependent (r4 review)."""
    import random
    import signal

    from resume_parser_service_spark.kernels.jpeg import (QUANT_FLAT,
                                                          decode_jpeg,
                                                          make_jpeg)
    rng = random.Random(7)
    base = make_jpeg(16, 12, bytes(rng.randrange(256) for _ in range(192)),
                     quant=QUANT_FLAT)

    def _alarm(sig, frm):
        raise AssertionError("decode_jpeg mutant hang")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(300)
    try:
        for _ in range(800):
            b = bytearray(base)
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                decode_jpeg(bytes(b))
            except ValueError:
                pass
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


# ---------------------------------------------------------------------
# Progressive JPEG (SOF2, T.81 Annex G)
# ---------------------------------------------------------------------

def test_progressive_matches_baseline_byte_exactly():
    """Both encoders quantize identical blocks, and the progressive
    reconstruction runs the same dequant+IDCT — so spectral-selection
    AND successive-approximation scripts must decode byte-identically
    to the baseline stream of the same source, for both quant tables
    and non-multiple-of-8 sizes."""
    import numpy as np

    from resume_parser_service_spark.kernels.jpeg import (
        QUANT_FLAT, QUANT_K1, decode_jpeg, make_jpeg,
        make_progressive_jpeg)
    rng = np.random.RandomState(11)
    for w, h, q in ((8, 8, QUANT_FLAT), (33, 17, QUANT_K1),
                    (24, 40, QUANT_FLAT)):
        src = rng.randint(0, 256, size=w * h).astype(np.uint8).tobytes()
        ref = decode_jpeg(make_jpeg(w, h, src, quant=q))
        for succ in (False, True):
            d = decode_jpeg(make_progressive_jpeg(w, h, src, quant=q,
                                                  successive=succ))
            assert (d["width"], d["height"], d["n_components"]) == (w, h, 1)
            assert d["pixels"] == ref["pixels"]


def test_progressive_color_matches_baseline():
    """3-component progressive: interleaved DC scan + per-component AC
    scans; only the Y plane is surfaced (baseline contract)."""
    import numpy as np

    from resume_parser_service_spark.kernels.jpeg import (
        QUANT_FLAT, decode_jpeg, make_jpeg, make_progressive_jpeg)
    rng = np.random.RandomState(3)
    w, h = 19, 14
    y = rng.randint(0, 256, size=w * h).astype(np.uint8).tobytes()
    cb, cr = bytes([100]) * (w * h), bytes([200]) * (w * h)
    ref = decode_jpeg(make_jpeg(w, h, y, quant=QUANT_FLAT, chroma=(cb, cr)))
    for succ in (False, True):
        d = decode_jpeg(make_progressive_jpeg(w, h, y, quant=QUANT_FLAT,
                                              chroma=(cb, cr),
                                              successive=succ))
        assert d["n_components"] == 3
        assert d["pixels"] == ref["pixels"]


def test_progressive_solid_exact():
    """The multimodal-oracle invariant extends to progressive streams:
    a solid gray with the flat quant table reconstructs the exact value
    (DC-only; the Al=1 + refinement script restores every DC bit)."""
    from resume_parser_service_spark.kernels.jpeg import (
        QUANT_FLAT, decode_jpeg, make_progressive_jpeg)
    for val in (0, 37, 128, 255):
        for succ in (False, True):
            d = decode_jpeg(make_progressive_jpeg(
                13, 9, bytes([val]) * 117, quant=QUANT_FLAT,
                successive=succ))
            assert set(d["pixels"]) == {val}


def test_progressive_truncated_entropy_decodes_partially():
    """A progressive stream cut mid-scan drains with zero bits (the
    media.py truncation convention): already-decoded scans keep their
    coefficients, remaining blocks stay at the prior approximation."""
    from resume_parser_service_spark.kernels.jpeg import (
        QUANT_FLAT, decode_jpeg, make_progressive_jpeg)
    j = make_progressive_jpeg(32, 32, bytes([200]) * 1024,
                              quant=QUANT_FLAT, successive=True)
    # cut inside the LAST scan's entropy data (keep all scan headers
    # before it intact)
    last_sos = j.rfind(b"\xFF\xDA")
    cut = last_sos + 7 + (len(j) - last_sos) // 2
    d = decode_jpeg(j[:cut])
    assert (d["width"], d["height"]) == (32, 32)
    assert len(d["pixels"]) == 1024


def test_progressive_rejects_malformed_scan_scripts():
    """Scan-script validation per G.1: DC scan with Se!=0, AC scan
    over multiple components, and Ss>Se all fail closed."""
    import pytest

    from resume_parser_service_spark.kernels.jpeg import (
        QUANT_FLAT, decode_jpeg, make_jpeg)
    # flipping a baseline SOF0 to SOF2 makes its interleaved
    # Ss=0/Se=63 scan an invalid progressive script
    j = bytearray(make_jpeg(8, 8, bytes(64), quant=QUANT_FLAT))
    j[j.find(b"\xFF\xC0") + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(j))


def test_progressive_rejects_second_sof_and_empty_sos():
    """r4 review: a duplicate SOF between scans (the coefficient store
    is allocated once) and an Ns=0 SOS both fail closed with
    ValueError, not KeyError/IndexError."""
    import pytest

    from resume_parser_service_spark.kernels.jpeg import (
        QUANT_FLAT, decode_jpeg, make_progressive_jpeg)
    base = make_progressive_jpeg(16, 16, bytes([77]) * 256,
                                 quant=QUANT_FLAT, successive=True)
    sof_at = base.find(b"\xFF\xC2")
    (sof_len,) = struct.unpack(">H", base[sof_at + 2:sof_at + 4])
    sof_seg = base[sof_at:sof_at + 2 + sof_len]
    second_sos = base.find(b"\xFF\xDA", base.find(b"\xFF\xDA") + 2)
    with pytest.raises(ValueError, match="multiple SOF"):
        decode_jpeg(base[:second_sos] + sof_seg + base[second_sos:])

    j = bytearray(base)
    first_sos = j.index(b"\xFF\xDA")
    j[first_sos + 4] = 0  # Ns = 0; next byte (old comp id) becomes Ss=...
    j[first_sos + 5] = 0  # ...0, so the DC-branch guard must catch it
    with pytest.raises(ValueError, match="SOS component count"):
        decode_jpeg(bytes(j))


def test_progressive_dc_predictor_walk_stays_bounded():
    """r4 review: a corrupt DC scan at Al=13 feeding max-category
    diffs every block walks the predictor far past any valid DC; the
    clamp keeps the int32 store from overflowing and the stream from
    crashing. Categories above 11 (invalid for 8-bit precision) fail
    closed."""
    import pytest

    from resume_parser_service_spark.kernels.jpeg import (
        _DC_LUM, _BitWriter, _huff_codes, _mag_cat, decode_jpeg)

    def dc_only_stream(px_w: int, px_h: int, diffs: list[int],
                       al: int) -> bytes:
        out = bytearray(b"\xFF\xD8")
        out += b"\xFF\xDB" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
        sof = struct.pack(">BHHB", 8, px_h, px_w, 1) + bytes([1, 0x11, 0])
        out += b"\xFF\xC2" + struct.pack(">H", len(sof) + 2) + sof
        body = bytes([0]) + bytes(_DC_LUM[0]) + bytes(_DC_LUM[1])
        out += b"\xFF\xC4" + struct.pack(">H", len(body) + 2) + body
        sos = bytes([1, 1, 0x00, 0, 0, al])
        out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos
        w = _BitWriter()
        tab = _huff_codes(*_DC_LUM)
        for d in diffs:
            t = _mag_cat(d)
            code, ln = tab[t]
            w.write(code, ln)
            if t:
                w.write(d if d >= 0 else d + (1 << t) - 1, t)
        return bytes(out) + w.flush() + b"\xFF\xD9"

    # 128x128 -> 256 blocks of +2047 = cumulative 524k; << 13 would
    # pass 2^31 without the clamp
    d = decode_jpeg(dc_only_stream(128, 128, [2047] * 256, al=13))
    assert len(d["pixels"]) == 128 * 128
    assert d["pixels"][-1] == 255  # huge positive DC clips white

    # DC category 12 is invalid for 8-bit precision (Table F.1): a
    # stream whose DHT defines symbol 12 must be rejected at decode
    bits16 = [0] * 16
    bits16[4] = 13  # 13 codes of length 5: symbols 0..12
    tab13 = (bits16, list(range(13)))
    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xDB" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xFF\xC2" + struct.pack(">H", len(sof) + 2) + sof
    body = bytes([0]) + bytes(tab13[0]) + bytes(tab13[1])
    out += b"\xFF\xC4" + struct.pack(">H", len(body) + 2) + body
    out += b"\xFF\xDA" + struct.pack(">H", 8) + bytes([1, 1, 0, 0, 0, 0])
    from resume_parser_service_spark.kernels.jpeg import _BitWriter as BW
    w = BW()
    code, ln = _huff_codes(*tab13)[12]
    w.write(code, ln)
    w.write((1 << 12) - 1, 12)
    with pytest.raises(ValueError, match="DC category"):
        decode_jpeg(bytes(out) + w.flush() + b"\xFF\xD9")


def test_progressive_mutation_fuzz_fails_closed_fast():
    """The baseline fuzz recipe over a successive-approximation
    progressive base: every mutant decodes or raises ValueError."""
    import random
    import signal

    from resume_parser_service_spark.kernels.jpeg import (
        QUANT_FLAT, decode_jpeg, make_progressive_jpeg)
    rng = random.Random(13)
    base = make_progressive_jpeg(
        16, 12, bytes(rng.randrange(256) for _ in range(192)),
        quant=QUANT_FLAT, successive=True)

    def _alarm(sig, frm):
        raise AssertionError("progressive decode_jpeg mutant hang")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(300)
    try:
        for _ in range(800):
            b = bytearray(base)
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                decode_jpeg(bytes(b))
            except ValueError:
                pass
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


# ---------------------------------------------------------------------
# IMA ADPCM (compressed audio, WAV tag 0x11)
# ---------------------------------------------------------------------

def test_adpcm_constant_signal_roundtrips_exactly():
    """Zero-diff nibbles at step index 0 keep the predictor constant —
    the invariant the multimodal oracle states."""
    from resume_parser_service_spark.kernels.media import (
        decode_adpcm_wav, make_adpcm_wav)
    for val in (-1000, -1, 0, 7, 12345):
        d = decode_adpcm_wav(make_adpcm_wav([val] * 777, rate=8000))
        assert d["n_samples"] == 777
        assert set(d["samples"]) == {val}


def test_adpcm_sine_tracks_within_codec_noise():
    import math
    import statistics

    from resume_parser_service_spark.kernels.media import (
        decode_adpcm_wav, make_adpcm_wav)
    src = [int(8000 * math.sin(i / 20)) for i in range(2000)]
    d = decode_adpcm_wav(make_adpcm_wav(src))
    errs = [abs(a - b) for a, b in zip(src, d["samples"])]
    sig = statistics.mean(abs(s) for s in src)
    assert d["n_samples"] == len(src)
    assert statistics.mean(errs) < sig / 50  # > ~34 dB on a smooth tone


def test_adpcm_multi_block_and_compression_ratio():
    from resume_parser_service_spark.kernels.media import (
        decode_adpcm_wav, make_adpcm_wav)
    src = [(i * 37) % 2000 - 1000 for i in range(1600)]
    data = make_adpcm_wav(src, block_samples=505)
    assert len(data) < 2 * len(src)  # ~4:1 vs 16-bit PCM
    d = decode_adpcm_wav(data)
    assert d["n_samples"] == 1600
    # block boundaries re-anchor the predictor verbatim
    assert d["samples"][0] == src[0]
    assert d["samples"][505] == src[505]
    assert d["samples"][1010] == src[1010]


def test_adpcm_rejects_pcm_and_garbage():
    from resume_parser_service_spark.kernels.media import (
        decode_adpcm_wav, make_wav)
    with pytest.raises(ValueError):
        decode_adpcm_wav(make_wav(bytes(100)))
    with pytest.raises(ValueError):
        decode_adpcm_wav(b"RIFFxxxxWAVEjunk")


# ---------------------------------------------------------------------
# MJPEG-in-AVI (compressed video: RIFF/AVI container + per-frame JPEG)
# ---------------------------------------------------------------------

def test_mjpeg_avi_roundtrip_matches_y4m_sampling_contract():
    """Constant flat-quant frames decode exactly; n_frames /
    frames_sampled / mean_sampled_luma agree with decode_y4m on the
    same luma sequence (the multimodal-oracle invariant)."""
    from resume_parser_service_spark.kernels.media import (
        decode_mjpeg_avi, decode_y4m, make_mjpeg_avi, make_y4m)
    lumas = [10, 20, 30, 40, 50]
    d = decode_mjpeg_avi(make_mjpeg_avi(16, 8, lumas))
    y = decode_y4m(make_y4m(16, 8, lumas))
    assert (d["width"], d["height"], d["n_frames"]) == (16, 8, 5)
    for k in ("n_frames", "frames_sampled", "mean_sampled_luma"):
        assert d[k] == y[k]
    assert d["mean_sampled_luma"] == 30.0  # frames 0, 2, 4 exactly


def test_mjpeg_avi_gradient_frames_and_container_fields():
    """Full luma-plane frames go through the real JPEG encode/decode;
    the avih header carries the true geometry."""
    from resume_parser_service_spark.kernels.media import (
        decode_mjpeg_avi, make_mjpeg_avi)
    w, h = 24, 16
    plane = bytes([(x * 13 + y * 7) % 256 for y in range(h)
                   for x in range(w)])
    d = decode_mjpeg_avi(make_mjpeg_avi(w, h, [plane, 0, plane]))
    assert (d["width"], d["height"]) == (w, h)
    assert d["frames_sampled"] == 2  # frames 0 and 2: both gradients
    exp = sum(plane) / len(plane)
    assert abs(d["mean_sampled_luma"] - exp) <= 1.0


def test_mjpeg_avi_truncated_mid_frame_keeps_decoded_frames():
    """A stream cut inside a sampled frame's entropy data still
    returns (decode_jpeg drains truncated scans); a cut inside the
    movi chunk header stops the walk cleanly."""
    from resume_parser_service_spark.kernels.media import (
        decode_mjpeg_avi, make_mjpeg_avi)
    avi = make_mjpeg_avi(16, 8, [60, 70, 80, 90, 95])
    # cut inside the LAST (sampled, index 4) frame's JPEG payload:
    # decode_jpeg drains the truncated scan, so it still counts
    # last movi frame chunk (idx1 entries also carry the '00dc' ckid)
    last = avi.rfind(b"00dc", 0, avi.rfind(b"idx1"))
    (fsize,) = struct.unpack("<I", avi[last + 4:last + 8])
    # a cut in the frame's entropy data drains; a cut in its JPEG
    # HEADER segments is indistinguishable from garbage and raises
    d = decode_mjpeg_avi(avi[:last + 8 + fsize - 4])
    assert d["n_frames"] == 5
    assert d["frames_sampled"] == 3
    # cut right after that chunk's fourcc+size (no payload at all):
    # the sampled-frame walk stops before counting it
    d2 = decode_mjpeg_avi(avi[:last + 8])
    assert d2["n_frames"] == 4
    assert d2["frames_sampled"] == 2
    assert d2["width"] == 16


def test_mjpeg_avi_rejects_garbage_and_foreign_codecs():
    import pytest

    from resume_parser_service_spark.kernels.media import (
        decode_mjpeg_avi, make_mjpeg_avi, make_wav)
    with pytest.raises(ValueError):
        decode_mjpeg_avi(b"not an avi at all")
    with pytest.raises(ValueError):  # a RIFF, but a WAV
        decode_mjpeg_avi(make_wav(bytes(100)))
    b = bytearray(make_mjpeg_avi(16, 8, [5]))
    i = b.index(b"vidsMJPG")
    b[i + 4:i + 8] = b"H264"
    with pytest.raises(ValueError, match="unsupported video codec"):
        decode_mjpeg_avi(bytes(b))


# ---------------------------------------------------------------- GIF


def test_gif_roundtrip_gradient_all_variants():
    """Exact round trip through real LZW for every palette placement ×
    interlace combination, over pixels covering all 256 byte values."""
    from resume_parser_service_spark.kernels.media import (decode_gif,
                                                           make_gif)

    w, h = 32, 16
    pixels = bytes((x * 29 + y * 7) % 256 for y in range(h)
                   for x in range(w))
    for interlace in (False, True):
        for local_table in (False, True):
            data = make_gif(w, h, pixels, interlace=interlace,
                            local_table=local_table)
            assert data[:6] == b"GIF89a"
            img = decode_gif(data)
            assert (img["width"], img["height"]) == (w, h)
            assert img["n_frames"] == 1
            assert img["pixels"] == pixels, (interlace, local_table)


def test_gif_lzw_actually_compresses_and_resets_dictionary():
    from resume_parser_service_spark.kernels.media import (decode_gif,
                                                           make_gif)

    solid = bytes([7]) * (64 * 64)
    data = make_gif(64, 64, solid)
    assert len(data) < len(solid) // 3  # real compression, not literals
    assert decode_gif(data)["pixels"] == solid
    # >4096 distinct phrases forces a mid-stream clear-code reset
    import random
    rnd = random.Random(1234)
    noisy = bytes(rnd.randrange(256) for _ in range(120 * 120))
    assert decode_gif(make_gif(120, 120, noisy))["pixels"] == noisy


def test_gif_interlace_reorders_rows_on_the_wire():
    """The interlaced stream must differ from the sequential one (rows
    really are written in 8/8/4/2 pass order) while decoding equal."""
    from resume_parser_service_spark.kernels.media import (decode_gif,
                                                           make_gif)

    w, h = 8, 8
    pixels = bytes(range(w * h))
    plain = make_gif(w, h, pixels)
    inter = make_gif(w, h, pixels, interlace=True)
    assert plain != inter
    assert decode_gif(plain)["pixels"] == decode_gif(inter)["pixels"]


def test_gif_multi_frame_counts_and_decodes_first():
    """An animated GIF (second image block appended before the trailer,
    plus a graphic-control extension) decodes frame 1 and reports
    n_frames=2; GIF87a headers are accepted too."""
    from resume_parser_service_spark.kernels.media import (decode_gif,
                                                           make_gif)

    w, h = 6, 4
    f1 = bytes([50]) * (w * h)
    f2 = bytes([200]) * (w * h)
    a = make_gif(w, h, f1)
    b = make_gif(w, h, f2, local_table=True)
    # splice: a minus trailer + GCE + b's image block (from 0x2C) + trailer
    gce = b"\x21\xF9\x04\x00\x0A\x00\x00\x00"
    data = a[:-1] + gce + b[b.index(b"\x2C", 13):]
    img = decode_gif(data)
    assert img["n_frames"] == 2
    assert img["pixels"] == f1
    img87 = decode_gif(b"GIF87a" + a[6:])
    assert img87["pixels"] == f1


def test_gif_fails_closed_on_truncation_and_garbage():
    from resume_parser_service_spark.kernels.media import (decode_gif,
                                                           make_gif)

    data = make_gif(16, 16, bytes(range(256)))
    # len-1 loses only the 0x3B trailer — still a truncation, still
    # fail-closed (review finding)
    for cut in (3, 10, 12, len(data) // 2, len(data) - 2, len(data) - 1):
        with pytest.raises(ValueError):
            decode_gif(data[:cut])
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + bytes(30))
    # out-of-range palette index: 2-entry local table but 8-bit indices
    small_pal = bytearray(make_gif(4, 4, bytes([3]) * 16, local_table=True))
    i = small_pal.index(b"\x2C", 13)
    small_pal[i + 9] = 0x80  # local table flag, size 0 -> 2 entries
    del small_pal[i + 10 + 6:i + 10 + 768]  # shrink palette to 2 entries
    with pytest.raises(ValueError, match="palette"):
        decode_gif(bytes(small_pal))


def test_media_decoders_mutation_fuzz_fail_closed():
    """The JPEG fuzz recipe over EVERY media decoder: seeded byte
    mutants either decode or raise ValueError — no zlib.error leaking
    from PNG IDAT, no KeyError from a mangled Y4M header, no negative
    frame stride walking the Y4M cursor backwards (all three found by
    this fuzzer), and no hang (SIGALRM guard, not wall-clock)."""
    import random
    import signal

    from resume_parser_service_spark.kernels import media

    rng = random.Random(1)
    px = bytes(rng.randrange(256) for _ in range(16 * 12))
    targets = [
        ("png", media.make_png(16, 12, px), media.decode_png),
        ("gif", media.make_gif(16, 12, px), media.decode_gif),
        ("gif_interlace",
         media.make_gif(16, 12, px, interlace=True, local_table=True),
         media.decode_gif),
        ("wav", media.make_wav(bytes(rng.randrange(256)
                                     for _ in range(800))),
         media.decode_wav),
        ("adpcm", media.make_adpcm_wav(
            [rng.randrange(-2000, 2000) for _ in range(600)]),
         media.decode_adpcm_wav),
        ("y4m", media.make_y4m(16, 8, [10, 20, 30, 40, 50]),
         media.decode_y4m),
        ("avi", media.make_mjpeg_avi(16, 8, [10, 20, 30, 40, 50]),
         media.decode_mjpeg_avi),
        ("mp3", media.make_mp3([128, 192] * 5, rate=44100, pad_every=3,
                               id3v2=b"t" * 12, id3v1=True),
         media.decode_mp3_metadata),
        ("h264", media.make_h264(62, 34, 4, profile_idc=100, aud=True),
         media.decode_h264_metadata),
    ]

    def _alarm(sig, frm):
        raise AssertionError("media decoder mutant hang")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(300)
    try:
        for name, base, decode in targets:
            # zlib.crc32, not hash(): the builtin is salted per process,
            # which made the mutant set non-reproducible across runs
            mrng = random.Random(zlib.crc32(name.encode()) & 0xFFFF)
            for _ in range(400):
                b = bytearray(base)
                for _ in range(mrng.randrange(1, 6)):
                    b[mrng.randrange(len(b))] = mrng.randrange(256)
                try:
                    decode(bytes(b))
                except ValueError:
                    pass
                except Exception as e:  # pragma: no cover
                    raise AssertionError(
                        f"{name} mutant leaked {type(e).__name__}: {e}")
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def test_mp3_cbr_metadata_exact():
    from resume_parser_service_spark.kernels.media import (
        decode_mp3_metadata, make_mp3)
    meta = decode_mp3_metadata(make_mp3([128] * 10, rate=44100,
                                        pad_every=3))
    assert meta == {"n_frames": 10, "sample_rate": 44100,
                    "duration_ms": 10 * 1152 * 1000 // 44100,
                    "mean_bitrate_kbps": 128.0, "vbr": False}


def test_mp3_vbr_mean_and_flag():
    from resume_parser_service_spark.kernels.media import (
        decode_mp3_metadata, make_mp3)
    meta = decode_mp3_metadata(make_mp3([160, 192, 160, 192, 160],
                                        rate=32000))
    assert meta["vbr"] is True
    assert meta["n_frames"] == 5
    assert meta["mean_bitrate_kbps"] == round((3 * 160 + 2 * 192) / 5, 4)
    assert meta["duration_ms"] == 5 * 1152 * 1000 // 32000


def test_mp3_id3_tags_skipped():
    from resume_parser_service_spark.kernels.media import (
        decode_mp3_metadata, make_mp3)
    plain = decode_mp3_metadata(make_mp3([64] * 4, rate=48000))
    tagged = decode_mp3_metadata(make_mp3(
        [64] * 4, rate=48000, id3v2=b"TIT2-some-title" * 20, id3v1=True))
    assert tagged == plain


def test_mp3_truncation_drops_final_partial_frame():
    from resume_parser_service_spark.kernels.media import (
        decode_mp3_metadata, make_mp3)
    full = make_mp3([96] * 6, rate=44100)
    cut = decode_mp3_metadata(full[:len(full) - 10])
    assert cut["n_frames"] == 5
    assert cut["duration_ms"] == 5 * 1152 * 1000 // 44100


def test_mp3_fails_closed():
    from resume_parser_service_spark.kernels.media import (
        decode_mp3_metadata, make_mp3)
    good = make_mp3([128] * 3)
    with pytest.raises(ValueError, match="sync"):
        decode_mp3_metadata(b"\x00" + good)
    with pytest.raises(ValueError, match="no complete"):
        decode_mp3_metadata(good[:3])
    mpeg2 = bytearray(good)
    mpeg2[1] = 0xF3  # version bits 10 = MPEG-2
    with pytest.raises(ValueError, match="MPEG-1"):
        decode_mp3_metadata(bytes(mpeg2))
    free = bytearray(good)
    free[2] &= 0x0F  # bitrate index 0 = "free"
    with pytest.raises(ValueError, match="bitrate"):
        decode_mp3_metadata(bytes(free))
    resv = bytearray(good)
    resv[2] |= 0x0C  # sample-rate index 3 = reserved
    with pytest.raises(ValueError, match="sample-rate"):
        decode_mp3_metadata(bytes(resv))
    flen = 144 * 128000 // 44100
    shifted = good[:flen] + make_mp3([128] * 2, rate=32000)
    with pytest.raises(ValueError, match="changes mid-stream"):
        decode_mp3_metadata(shifted)
    with pytest.raises(ValueError, match="ID3v2"):
        decode_mp3_metadata(b"ID3\x03\x00\x00\xff\xff\xff\xff" + good)


# -------------------------------------------------------------- H.264

def test_h264_roundtrip_dims_profiles_and_counts():
    from resume_parser_service_spark.kernels import media
    cases = [
        (64, 48, 3, 66, False),    # mb-aligned, Baseline
        (62, 34, 5, 100, False),   # cropped both axes, High profile
        (16, 16, 1, 66, True),     # minimal + AUD per frame
        (1278, 718, 2, 100, True),  # 720p-ish crop
    ]
    for w, h, n, profile, aud in cases:
        meta = media.decode_h264_metadata(media.make_h264(
            w, h, n, profile_idc=profile, level_idc=40, aud=aud))
        assert meta == {"width": w, "height": h, "profile": profile,
                        "level": 40, "n_frames": n, "n_idr": 1,
                        "n_nals": 2 + n * (2 if aud else 1)}


def test_h264_emulation_prevention_roundtrip():
    """An RBSP whose raw bytes contain start-code-like runs must be
    escaped by the writer and transparently unescaped by the reader."""
    from resume_parser_service_spark.kernels import media
    w = media._BitWriter()
    for b in (0x00, 0x00, 0x01, 0x00, 0x00, 0x02, 0x00, 0x00, 0x03,
              0x00, 0x00, 0x00, 0x7F):
        w.u(b, 8)
    escaped = w.rbsp()
    assert b"\x00\x00\x01" not in escaped
    assert b"\x00\x00\x00" not in escaped
    plain = media._h264_unescape(escaped)
    assert plain.startswith(bytes((0, 0, 1, 0, 0, 2, 0, 0, 3,
                                   0, 0, 0, 0x7F)))
    # and a full-stream check: large mb counts put zero runs in the SPS
    meta = media.decode_h264_metadata(media.make_h264(2048, 1024, 2))
    assert (meta["width"], meta["height"]) == (2048, 1024)


def test_h264_fails_closed():
    import pytest

    from resume_parser_service_spark.kernels import media
    good = media.make_h264(64, 48, 2)
    with pytest.raises(ValueError):
        media.decode_h264_metadata(b"")
    with pytest.raises(ValueError):
        media.decode_h264_metadata(b"\xff" + good)  # junk before start
    with pytest.raises(ValueError):  # forbidden_zero_bit
        idx = good.index(b"\x00\x00\x00\x01") + 4
        media.decode_h264_metadata(
            good[:idx] + bytes([good[idx] | 0x80]) + good[idx + 1:])
    with pytest.raises(ValueError):  # slice before SPS
        sps_end = good.index(b"\x00\x00\x01", 4)
        media.decode_h264_metadata(good[:4] + good[sps_end:])
    with pytest.raises(ValueError):  # truncated SPS
        media.decode_h264_metadata(good[:9])
    with pytest.raises(ValueError):  # SPS+PPS but no coded picture
        slice_at = good.index(b"\x00\x00\x01\x65")
        media.decode_h264_metadata(good[:slice_at])
    with pytest.raises(ValueError):  # odd dims unrepresentable in 4:2:0
        media.make_h264(63, 48, 1)
    with pytest.raises(ValueError):
        media.make_h264(64, 48, 0)
