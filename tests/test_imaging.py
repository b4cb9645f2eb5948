"""Pure-Python PNG/BMP codec (operators/imaging.py) and the real-decode
multimodal paths: roundtrips, every PNG scanline filter, quarantine of
undecodable payloads."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from cdc_pipeline_spark.operators.imaging import (
    decode_bmp,
    decode_image,
    decode_png,
    encode_png,
    image_feature,
    resize_nearest,
)


def _rng_image(h, w, c, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8) if c > 1 else rng.integers(
        0, 256, size=(h, w), dtype=np.uint8
    )


@pytest.mark.parametrize("shape", [(5, 7, 3), (4, 4, 4), (6, 3, 1)])
def test_png_roundtrip(shape):
    h, w, c = shape
    img = _rng_image(h, w, c)
    decoded = decode_png(encode_png(img))
    assert decoded.shape == (h, w, c)
    expected = img[:, :, None] if img.ndim == 2 else img
    assert np.array_equal(decoded, expected)


def _png_with_filter(img: np.ndarray, filter_type: int) -> bytes:
    """Build a PNG whose every scanline uses the given filter — applying
    the spec's forward transform so decode must invert it."""
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(c, dtype=np.int64), cur[:-c]]) if stride > c else np.zeros(stride, dtype=np.int64)
        ul = np.concatenate([np.zeros(c, dtype=np.int64), prev[:-c]]) if stride > c else np.zeros(stride, dtype=np.int64)
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = (cur - left) % 256
        elif filter_type == 2:
            filt = (cur - prev) % 256
        elif filter_type == 3:
            filt = (cur - (left + prev) // 2) % 256
        else:  # Paeth
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            filt = (cur - pred) % 256
        raw.append(filter_type)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, payload):
        return struct.pack(">I", len(payload)) + tag + payload + struct.pack(
            ">I", zlib.crc32(tag + payload) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_all_scanline_filters(filter_type):
    img = _rng_image(6, 5, 3, seed=filter_type)
    decoded = decode_png(_png_with_filter(img, filter_type))
    assert np.array_equal(decoded, img), f"filter {filter_type} unfilters wrong"


def test_bmp_decode_with_row_padding():
    # 3x2 24-bit BMP: width 3 → 9 bytes/row padded to 12
    pixels = np.arange(18, dtype=np.uint8).reshape(2, 3, 3)  # RGB rows
    row_size = 12
    data = bytearray()
    for y in range(1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(3):
            r, g, b = pixels[y, x]
            row += bytes([b, g, r])  # BGR on disk
        row += b"\x00" * (row_size - len(row))
        data += row
    header = bytearray(b"BM")
    header += struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    header += struct.pack("<Iii", 40, 3, 2)
    header += struct.pack("<HH", 1, 24)
    header += struct.pack("<IIiiII", 0, len(data), 2835, 2835, 0, 0)
    decoded = decode_bmp(bytes(header) + bytes(data))
    assert np.array_equal(decoded, pixels)


def test_decode_image_sniffs_and_rejects():
    img = _rng_image(3, 3, 3)
    assert np.array_equal(decode_image(encode_png(img)), img)
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image(b"not an image at all")
    with pytest.raises(ValueError, match="bit depth|color type|interlaced|unsupported", ):
        # 16-bit depth header
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
        chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
            ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
        )
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


def test_resize_nearest_downsamples_expected_pixels():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    small = resize_nearest(img, 2, 2)
    assert small[:, :, 0].tolist() == [[0, 2], [8, 10]]
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 1) and up[0, 0, 0] == 0 and up[7, 7, 0] == 15


def test_extract_features_image_decoder_quarantines(spark):
    from cdc_pipeline_spark.operators.multimodal import FEATURE_DIM, extract_features

    good1 = encode_png(_rng_image(8, 6, 3, seed=1))
    good2 = encode_png(_rng_image(4, 4, 1, seed=2))
    rows = [(1, bytearray(good1)), (2, bytearray(good2)), (3, bytearray(b"junk-bytes"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in extract_features(df, decoder="image").collect()}
    assert set(out) == {1, 2}, "undecodable payload must be quarantined, not crash"
    expected = image_feature(decode_image(good1), dim=FEATURE_DIM)
    assert list(out[1].feature) == pytest.approx(expected)
    assert out[1].n_bytes == len(good1)
    with pytest.raises(ValueError, match="unknown decoder"):
        extract_features(df, decoder="bogus")


def test_extract_features_keep_quarantined_audit_column(spark):
    """keep_quarantined=True (VERDICT r10 #5): quarantined rows survive
    with feature=null and decoded=false, so the drop rate is one
    aggregate away; the default drop path is unchanged."""
    from cdc_pipeline_spark.operators.multimodal import extract_features

    good = encode_png(_rng_image(8, 6, 3, seed=1))
    rows = [(1, bytearray(good)), (2, bytearray(b"junk-bytes"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r.doc_id: r
        for r in extract_features(df, decoder="image", keep_quarantined=True).collect()
    }
    assert set(out) == {1, 2}
    assert out[1].decoded is True and out[1].feature is not None
    assert out[2].decoded is False and out[2].feature is None
    assert out[2].n_bytes == len(b"junk-bytes")  # metadata still audits
    # default path: same decode, quarantined rows dropped, no column
    dropped = extract_features(df, decoder="image").collect()
    assert [r.doc_id for r in dropped] == [1]
    assert "decoded" not in dropped[0].asDict()


def test_resize_images_real_matches_local_resize(spark):
    import hashlib

    from cdc_pipeline_spark.operators.multimodal import resize_images

    img = _rng_image(9, 7, 3, seed=9)
    rows = [(1, bytearray(encode_png(img))), (2, bytearray(b"nope"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r.resized for r in resize_images(df, width=4, height=4, real=True).collect()}
    assert set(out) == {1}
    local = hashlib.sha256(resize_nearest(img, 4, 4).tobytes()).hexdigest()
    assert out[1] == local


def test_corrupt_payloads_raise_valueerror_not_struct_zlib_errors():
    """Truncated/corrupt blobs must surface as ValueError — struct.error
    and zlib.error do NOT subclass it, and the multimodal quarantine
    catches only ValueError; anything else kills the Spark worker."""
    img = encode_png(_rng_image(4, 4, 3))
    corrupt_idat = img[:40] + bytes([img[40] ^ 0xFF]) + img[41:]
    for payload in [b"BM", b"BM" + b"\x00" * 10, img[:20], corrupt_idat]:
        with pytest.raises(ValueError):
            decode_image(payload)


def test_extract_features_survives_truncated_image_payloads(spark):
    from cdc_pipeline_spark.operators.multimodal import extract_features

    good = encode_png(_rng_image(4, 4, 3))
    rows = [(1, bytearray(good)), (2, bytearray(b"BM")), (3, bytearray(good[:20]))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = extract_features(df, decoder="image").collect()
    assert [r.doc_id for r in out] == [1], "truncated blobs must be quarantined"


# ---------------------------------------------------------------------------
# Audio (RIFF/WAVE) codec — operators/audio.py
# ---------------------------------------------------------------------------


def test_wav_roundtrip_pcm16():
    from cdc_pipeline_spark.operators.audio import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    samples = rng.integers(-32768, 32767, size=(480, 2), dtype=np.int16)
    decoded, rate = decode_wav(encode_wav(samples, sample_rate=16000))
    assert rate == 16000 and decoded.shape == (480, 2)
    assert np.allclose(decoded * 32768.0, samples.astype(np.float64))


def test_wav_float32_and_odd_chunk_padding():
    import struct as _struct

    from cdc_pipeline_spark.operators.audio import decode_wav

    vals = np.array([0.5, -0.25, 0.125], dtype="<f4")
    fmt = _struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    # an odd-sized junk chunk before fmt exercises even-offset padding
    junk = b"JUNK" + _struct.pack("<I", 3) + b"abc" + b"\x00"
    body = b"WAVE" + junk + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    body += b"data" + _struct.pack("<I", len(vals.tobytes())) + vals.tobytes()
    payload = b"RIFF" + _struct.pack("<I", len(body)) + body
    decoded, rate = decode_wav(payload)
    assert rate == 8000
    assert np.allclose(decoded[:, 0], vals.astype(np.float64))


def test_wav_corrupt_payloads_raise_valueerror():
    from cdc_pipeline_spark.operators.audio import decode_wav, encode_wav

    good = encode_wav(np.zeros(100, dtype=np.int16))
    for payload in [b"RIFF", b"RIFFxxxxWAVE", good[:30], b"ID3\x03mp3-junk" * 4]:
        with pytest.raises(ValueError):
            decode_wav(payload)


def test_extract_features_audio_decoder(spark):
    from cdc_pipeline_spark.operators.audio import audio_feature, decode_wav, encode_wav
    from cdc_pipeline_spark.operators.multimodal import FEATURE_DIM, extract_features

    t = np.arange(1600)
    tone = (np.sin(2 * np.pi * 440 * t / 16000) * 20000).astype(np.int16)
    wav = encode_wav(tone, sample_rate=16000)
    rows = [(1, bytearray(wav)), (2, bytearray(b"not audio"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in extract_features(df, decoder="audio").collect()}
    assert set(out) == {1}
    expected = audio_feature(*decode_wav(wav), dim=FEATURE_DIM)
    assert list(out[1].feature) == pytest.approx(expected)
    # 440 Hz tone: zcr ≈ 2 * 440 / 16000
    assert out[1].feature[2] == pytest.approx(0.055, abs=0.005)


def test_bmp_hostile_header_rejected_before_allocation():
    import struct as _struct

    header = bytearray(b"BM")
    header += _struct.pack("<IHHI", 60, 0, 0, 54)
    header += _struct.pack("<Iii", 40, 1 << 20, 1 << 28)  # absurd dims
    header += _struct.pack("<HH", 1, 24)
    header += _struct.pack("<IIiiII", 0, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="truncated BMP"):
        decode_bmp(bytes(header) + b"\x00" * 6)


def test_zero_dimension_png_rejected():
    with pytest.raises(ValueError, match="zero-dimension"):
        decode_png(encode_png(np.zeros((0, 5, 3), dtype=np.uint8)))
    with pytest.raises(ValueError, match="zero-dimension"):
        decode_png(encode_png(np.zeros((5, 0, 3), dtype=np.uint8)))


def test_wav_truncated_data_chunk_rejected():
    from cdc_pipeline_spark.operators.audio import decode_wav, encode_wav

    good = encode_wav(np.ones(400, dtype=np.int16))
    cut = good[: len(good) - 100]  # mid-data truncation
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(cut)


def test_audio_feature_accepts_mono_1d():
    from cdc_pipeline_spark.operators.audio import audio_feature

    f1 = audio_feature(np.ones(100) * 0.5, 16000)
    f2 = audio_feature(np.ones((100, 1)) * 0.5, 16000)
    assert f1 == f2


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def test_png_hostile_dims_rejected_before_decompression():
    # A tiny payload declaring 2^16 × 2^16 RGBA (16 GiB decoded) must be
    # rejected by the pre-decompression size bound, not by a MemoryError
    # deep inside zlib — otherwise one hostile blob kills the Arrow
    # worker instead of quarantining.
    ihdr = struct.pack(">IIBBBBB", 1 << 16, 1 << 16, 8, 6, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="exceeds cap"):
        decode_png(payload)
    with pytest.raises(ValueError):
        decode_image(payload)


def test_png_zlib_bomb_decompression_is_bounded():
    # Valid small dims but an IDAT stream that inflates to far more than
    # height*(stride+1): the bounded decompressobj must stop at
    # expected+1 bytes and raise the length-mismatch ValueError rather
    # than materializing the whole bomb.
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)  # expects 4*(4+1)=20 bytes
    bomb = zlib.compress(b"\x00" * (64 * 1024 * 1024), 9)  # 64 MiB of zeros, ~64 KiB wire
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", bomb)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(payload)


def test_decode_image_any_without_pillow_matches_decode_image():
    # this container has no Pillow: the fallback must degrade to exactly
    # the stdlib decoder — same pixels for PNG/BMP, same ValueError for
    # compressed payloads (quarantine path)
    img = _rng_image(5, 4, 3)
    from cdc_pipeline_spark.operators.imaging import decode_image_any

    np.testing.assert_array_equal(
        decode_image_any(encode_png(img)), decode_image(encode_png(img))
    )
    with pytest.raises(ValueError):
        decode_image_any(b"\xff\xd8\xff\xe0 not a real jpeg")


def test_decode_image_any_uses_pillow_when_available():
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from cdc_pipeline_spark.operators import imaging

    imaging._PIL_PROBE = None  # re-probe in case an earlier test cached absence
    arr = _rng_image(6, 5, 3)
    buf = io.BytesIO()
    PIL_Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    decoded = imaging.decode_image_any(buf.getvalue())
    assert decoded.shape == (6, 5, 3)
    assert decoded.dtype == np.uint8
    # JPEG is lossy: assert proximity, not equality
    assert float(np.abs(decoded.astype(int) - arr.astype(int)).mean()) < 16.0


# ---------------------------------------------------------------------------
# Baseline JPEG (operators/jpeg.py) — the pure-stdlib codec that closes
# the last in-container compressed-media stub.
# ---------------------------------------------------------------------------


def _gradient(h: int, w: int, c: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 255 / max(h - 1, 1))[:, :, None] * np.linspace(0.3, 1.0, c)
    base = base + (xx * 60 / max(w - 1, 1))[:, :, None]
    arr = np.clip(base, 0, 255).astype(np.uint8)
    return arr[:, :, 0] if c == 1 else arr


@pytest.mark.parametrize(
    "h,w,c,sub,rst",
    [
        (8, 8, 1, "444", 0),      # single block grayscale
        (16, 24, 3, "444", 0),    # exact MCU grid RGB
        (17, 23, 3, "444", 0),    # ragged edges (replicated padding)
        (24, 16, 3, "444", 2),    # restart markers + DC predictor reset
        (1, 1, 1, "444", 0),      # degenerate 1x1
    ],
)
def test_jpeg_444_roundtrip_within_dct_rounding(h, w, c, sub, rst):
    """Flat q=1 quantization leaves DCT→int rounding as the ONLY loss,
    so encode→decode must reproduce every sample within ±2."""
    from cdc_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg_baseline

    px = _gradient(h, w, c)
    dec = decode_jpeg(encode_jpeg_baseline(px, subsample=sub, restart_interval=rst))
    ref = px[:, :, None] if px.ndim == 2 else px
    assert dec.shape == (h, w, 1 if c == 1 else 3)
    assert int(np.abs(dec.astype(int) - ref.astype(int)).max()) <= 2


def test_jpeg_noise_roundtrip_444():
    """Worst case for DCT energy spread: uniform noise still roundtrips
    within ±2 at flat q=1 (every coefficient is kept exactly)."""
    from cdc_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg_baseline

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg_baseline(px, subsample="444"))
    assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 2


@pytest.mark.parametrize("h,w,rst", [(32, 32, 0), (19, 21, 0), (40, 40, 3)])
def test_jpeg_420_chroma_subsampling(h, w, rst):
    """4:2:0 exercises the generic MCU sampling-factor layout and chroma
    upsampling: chroma is lossy by design, but the luma channel (which
    is never subsampled) must survive within DCT rounding + YCbCr
    conversion error."""
    from cdc_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg_baseline

    px = _gradient(h, w, 3)
    dec = decode_jpeg(encode_jpeg_baseline(px, subsample="420", restart_interval=rst))
    assert dec.shape == (h, w, 3)
    luma = lambda a: 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]  # noqa: E731
    assert float(np.abs(luma(dec.astype(float)) - luma(px.astype(float))).max()) <= 2.5
    # chroma loss is bounded too (smooth gradient: replication error small)
    assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 8


def test_jpeg_rejects_progressive_and_hostile():
    from cdc_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg_baseline

    good = encode_jpeg_baseline(_gradient(8, 8, 1))
    # flip SOF0 (FFC0) to SOF2 (FFC2): progressive must raise cleanly
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(prog)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")
    # hostile dims: patch SOF height/width to 60000x60000 (> byte cap)
    i = good.index(b"\xff\xc0")
    hostile = bytearray(good)
    struct.pack_into(">HH", hostile, i + 5, 60000, 60000)
    with pytest.raises(ValueError, match="exceeds cap"):
        decode_jpeg(bytes(hostile))
    # truncation anywhere in the marker stream must be ValueError
    with pytest.raises(ValueError):
        decode_jpeg(good[: i + 4])
    # zero sampling factor: hv byte 0x00 would reach the MCU divisions
    # as ZeroDivisionError — outside decode_image's quarantine set, so
    # it must be refused at SOF parse as ValueError instead
    zerosamp = bytearray(good)
    zerosamp[i + 11] = 0x00  # first component's h/v nibbles
    with pytest.raises(ValueError, match="sampling factor"):
        decode_jpeg(bytes(zerosamp))


def test_jpeg_truncated_entropy_data_does_not_crash():
    """A payload cut mid-scan decodes what it can (the bit reader pads
    with 1-bits per T.81 F.2.2.5) or raises ValueError — it must never
    raise a non-ValueError out of decode_image's normalization set."""
    from cdc_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg_baseline

    good = encode_jpeg_baseline(_gradient(16, 16, 3))
    for cut in (len(good) - 8, len(good) * 3 // 4):
        try:
            out = decode_jpeg(good[:cut])
            assert out.shape == (16, 16, 3)
        except ValueError:
            pass


def test_decode_image_dispatches_jpeg():
    """decode_image (the quarantine-normalized entry the multimodal
    operators call) must now accept JPEG alongside PNG/BMP — closing
    the round-5 verdict's remaining in-container multimodal gap."""
    from cdc_pipeline_spark.operators.jpeg import encode_jpeg_baseline

    px = _gradient(12, 10, 3)
    dec = decode_image(encode_jpeg_baseline(px))
    assert dec.shape == (12, 10, 3)
    assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 2
    # corrupt JPEG bodies flow into the same ValueError contract
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xdb\x00\x04\x00garbage")


def test_extract_features_image_decoder_handles_jpeg(spark):
    """End-to-end: JPEG payloads through the Arrow mapInPandas image
    feature stage — decoded rows survive, corrupt rows quarantine."""
    from cdc_pipeline_spark.operators.jpeg import encode_jpeg_baseline
    from cdc_pipeline_spark.operators.multimodal import extract_features

    good = encode_jpeg_baseline(_gradient(16, 16, 3))
    rows = [(1, bytearray(good)), (2, bytearray(b"\xff\xd8truncated"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = extract_features(df, decoder="image").collect()
    assert [r.doc_id for r in out] == [1]
    assert len(out[0].feature) == 8
    expected = image_feature(decode_image(good), dim=8)
    assert out[0].feature == expected


def test_jpeg_hostile_huffman_size_category_is_valueerror():
    """A corrupted DHT symbol (DC size category > 11 / AC > 10) must
    raise ValueError, not OverflowError — OverflowError would escape
    the quarantine and kill the whole Arrow stage."""
    from cdc_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg_baseline

    good = encode_jpeg_baseline(_gradient(8, 8, 1))
    # DC DHT: FF C4, len, class/id byte 0x00, 16 BITS, then 12 HUFFVALs
    # 0..11 — patch every HUFFVAL to 200 so whichever symbol the first
    # block decodes is an out-of-range size category
    i = good.index(b"\xff\xc4")
    bad = bytearray(good)
    for j in range(12):
        bad[i + 5 + 16 + j] = 200
    with pytest.raises(ValueError, match="size category|Huffman"):
        decode_jpeg(bytes(bad))
    # and the normalized entry point keeps the quarantine contract
    with pytest.raises(ValueError):
        decode_image(bytes(bad))


def test_jpeg_fill_bytes_between_markers_decode():
    """Repeated 0xFF fill bytes between marker segments are legal
    (T.81 B.1.1.2) and must not be parsed as a marker + length."""
    from cdc_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg_baseline

    px = _gradient(8, 8, 1)
    good = encode_jpeg_baseline(px)
    i = good.index(b"\xff\xdb")  # pad before DQT
    padded = good[:i] + b"\xff\xff\xff" + good[i:]
    dec = decode_jpeg(padded)
    assert int(np.abs(dec[:, :, 0].astype(int) - px.astype(int)).max()) <= 2


def test_jpeg_multi_scan_rejected():
    """A second SOS (per-component sequential scans) must raise — its
    MCU layout follows the non-interleaved rule this decoder does not
    implement; silently returning the last scan's plane would feed
    wrong pixels into dedup."""
    from cdc_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg_baseline

    good = encode_jpeg_baseline(_gradient(8, 8, 1))
    i = good.index(b"\xff\xda")
    multi = good[:-2] + good[i:]  # SOI ... SOS1 ECS1 SOS2 ECS2 EOI
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg(multi)


def test_jpeg_peak_memory_cap_counts_float_planes():
    """A 9500x8500x3 frame fits the uint8-output cap (~242 MB) but its
    float32 decode planes + conversion temporaries would OOM the
    worker; the SOF gate budgets 16 bytes/sample and must reject it."""
    from cdc_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg_baseline

    good = encode_jpeg_baseline(_gradient(8, 8, 3))
    i = good.index(b"\xff\xc0")
    hostile = bytearray(good)
    struct.pack_into(">HH", hostile, i + 5, 9500, 8500)
    with pytest.raises(ValueError, match="exceeds cap"):
        decode_jpeg(bytes(hostile))


# ---------------------------------------------------------------------------
# GIF decoder (round 8): LZW, palettes, interlace, frames, quarantine.
# Fixtures come from operators/gif.py::encode_gif (clear-per-symbol LZW),
# so the encoder exercises the decoder's repeated-clear path on every
# pixel — byte fixtures stay reproducible from code, like encode_png.
# ---------------------------------------------------------------------------


def _checker(h, w, a=(255, 0, 0), b=(0, 0, 255)):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[(np.add.outer(np.arange(h), np.arange(w)) % 2) == 0] = a
    img[(np.add.outer(np.arange(h), np.arange(w)) % 2) == 1] = b
    return img


def test_gif_roundtrip_plain_and_interlaced():
    from cdc_pipeline_spark.operators.gif import decode_gif, encode_gif

    img = _checker(9, 7)
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    # interlaced rows land back where they belong (all four passes: 9
    # rows -> passes hit rows 0,8 / 4 / 2,6 / 1,3,5,7)
    assert np.array_equal(decode_gif(encode_gif(img, interlace=True)), img)


def test_gif_multiframe_composition_and_delays():
    from cdc_pipeline_spark.operators.gif import decode_gif_frames, encode_gif

    f1 = np.full((4, 5, 3), (10, 20, 30), dtype=np.uint8)
    f2 = np.full((4, 5, 3), (200, 100, 0), dtype=np.uint8)
    payload = encode_gif([f1, f2], delays_cs=[12, 34])
    frames = decode_gif_frames(payload)
    assert len(frames) == 2
    assert np.array_equal(frames[0][0], f1) and frames[0][1] == 12
    assert np.array_equal(frames[1][0], f2) and frames[1][1] == 34


def test_gif_transparency_leaves_canvas():
    """A transparent index must leave the already-composited canvas
    pixel visible (GIF89a graphic-control transparency)."""
    from cdc_pipeline_spark.operators.gif import decode_gif_frames, encode_gif

    base = np.full((2, 2, 3), (1, 2, 3), dtype=np.uint8)
    overlay = base.copy()
    overlay[0, 0] = (9, 9, 9)  # palette will be {(1,2,3): idx, (9,9,9): idx}
    # make (1,2,3) the transparent index in frame 2: its pixels keep the
    # frame-1 canvas (same color here, so assert via the changed pixel)
    payload = encode_gif([base, overlay], transparent_index=0, disposal=1)
    frames = decode_gif_frames(payload)
    assert np.array_equal(frames[1][0][0, 0], np.array([9, 9, 9], dtype=np.uint8))
    assert np.array_equal(frames[1][0][1, 1], np.array([1, 2, 3], dtype=np.uint8))


def test_gif_sniffed_by_decode_image_and_feature_path(spark):
    """decode_image routes GIF by signature; the multimodal feature
    extraction decodes real GIF payloads on the Arrow path alongside
    PNG/BMP, and quarantines corrupt ones instead of failing the stage."""
    from cdc_pipeline_spark.operators.gif import encode_gif
    from cdc_pipeline_spark.operators.imaging import decode_image
    from cdc_pipeline_spark.operators.multimodal import extract_features

    img = _checker(6, 6)
    payload = encode_gif(img)
    assert np.array_equal(decode_image(payload), img)

    rows = [
        (1, bytearray(payload)),
        (2, bytearray(encode_png(img))),
        (3, bytearray(payload[:20])),  # truncated -> quarantined
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id for r in extract_features(df, fake_decode=False, decoder="image").collect()}
    assert out == {1, 2}


def test_gif_quarantine_contract():
    """Malformed payloads and the unsupported restore-previous disposal
    raise ValueError (never struct.error/IndexError/MemoryError)."""
    import pytest as _pytest

    from cdc_pipeline_spark.operators.gif import decode_gif, encode_gif

    img = _checker(3, 3)
    good = encode_gif(img)
    for bad in (
        b"GIF89a",                      # truncated header
        good[:25],                      # truncated mid-stream
        good[:6] + b"\x00" * 7,         # zero logical screen
        b"NOTGIF" + good[6:],           # bad signature
        good[:-2] + b"\xff\x3b",        # junk block type
    ):
        with _pytest.raises(ValueError):
            decode_gif(bad)
    with _pytest.raises(ValueError, match="restore previous"):
        decode_gif(encode_gif([img, img], disposal=3)[:])
    # hostile logical screen: header claims a huge canvas
    import struct as _struct

    huge = bytearray(good)
    huge[6:10] = _struct.pack("<HH", 60000, 60000)
    with _pytest.raises(ValueError, match="budget|rectangle"):
        decode_gif(bytes(huge))


def _hostile_many_frame_gif(n_frames, w=2000, h=2000):
    """Tiny payload declaring ``n_frames`` 1x1 frames on a w x h logical
    screen — each composed frame costs w*h*3 bytes, so total composed
    memory is frames x canvas while the payload stays a few hundred
    bytes (the ADVICE r8 memory-amplification shape)."""
    import struct as _struct

    out = bytearray(b"GIF89a")
    out += _struct.pack("<HH", w, h)
    out.append(0x91)  # GCT present, 4 entries
    out += b"\x00\x00"
    out += bytes(12)  # 4-entry color table, all black
    # 1x1 frame: LZW(mcs=2) = CLEAR(4), root(0), END(5) packed LSB-first
    frame = b"\x2c" + _struct.pack("<HHHH", 0, 0, 1, 1) + b"\x00\x02\x02\x44\x01\x00"
    out += frame * n_frames
    out.append(0x3B)
    return bytes(out)


def test_gif_cumulative_frame_budget():
    """Total composed-frame bytes are budget-bounded (cumulative, not
    per-frame): a ~1 KB payload with many 1x1 frames on a 2000x2000
    canvas raises ValueError instead of allocating frames x 12 MB."""
    import pytest as _pytest

    from cdc_pipeline_spark.operators.gif import decode_gif, decode_gif_frames

    hostile = _hostile_many_frame_gif(25)
    with _pytest.raises(ValueError, match="decode budget"):
        decode_gif_frames(hostile)
    # the still-image path stops after frame 1 — same payload decodes
    img = decode_gif(hostile)
    assert img.shape == (2000, 2000, 3)


def test_gif_still_path_quarantines_malformed_tails():
    """decode_gif (max_frames=1) must give the SAME quarantine verdict
    as the full decode on payloads whose malformation lies AFTER the
    first frame: disposal-3 second frame, junk block, truncation
    (review r9 finding — the still path skips pixel data but keeps
    validating container structure)."""
    import pytest as _pytest

    from cdc_pipeline_spark.operators.gif import decode_gif, decode_gif_frames, encode_gif

    f1, f2 = _checker(3, 3), _checker(3, 3, a=(0, 255, 0), b=(9, 9, 9))
    good = encode_gif([f1, f2])
    # disposal 3 on BOTH frames; make frame 1's control block disposal-1
    # so only the tail is malformed
    d3 = bytearray(encode_gif([f1, f2], disposal=3))
    first_gce = d3.find(b"\x21\xf9")
    d3[first_gce + 3] = (d3[first_gce + 3] & ~0x1C) | (1 << 2)  # frame-1 disposal=1
    for bad in (
        bytes(d3),                      # disposal-3 tail
        good[:-2] + b"\xee\x3b",        # junk block type after frame 2's data
        good[: len(good) - 8],          # truncated tail
    ):
        with _pytest.raises(ValueError):
            decode_gif_frames(bad)
        with _pytest.raises(ValueError):
            decode_gif(bad)  # same verdict on the still path
    # and an intact multi-frame payload still decodes on both paths
    assert decode_gif(good).shape == (3, 3, 3)


def _two_frame_gif(frame2_stream, w2=1, h2=1, gct_bits=0):
    """Hand-rolled 2-frame GIF on a 2x1 logical screen: frame 1 is a
    valid 1x1 (index 0); frame 2's LZW stream is the caller's raw
    bytes, so tests can plant pixel-level malformations past frame 1.
    ``gct_bits=0`` => 2-entry global color table."""
    import struct as _struct

    import numpy as _np

    from cdc_pipeline_spark.operators.gif import _lzw_encode_trivial, _sub_blocks

    out = bytearray(b"GIF89a")
    out += _struct.pack("<HH", 2, 1)
    out.append(0x80 | gct_bits)
    out += b"\x00\x00"
    out += bytes(3 * (2 << gct_bits))
    out += b"\x2c" + _struct.pack("<HHHH", 0, 0, 1, 1) + b"\x00\x02"
    out += _sub_blocks(_lzw_encode_trivial(_np.array([0]), 2))
    out += b"\x2c" + _struct.pack("<HHHH", 0, 0, w2, h2) + b"\x00\x02"
    out += _sub_blocks(frame2_stream)
    out.append(0x3B)
    return bytes(out)


def test_gif_still_path_quarantines_pixel_level_tails():
    """ADVICE r9: frames past max_frames are LZW-decoded and validated
    (not just container-walked), so short streams, invalid LZW codes,
    palette overruns, and _MAX_FRAMES overruns in SKIPPED frames raise
    on the still path exactly as on the full decode."""
    import numpy as _np
    import pytest as _pytest

    from cdc_pipeline_spark.operators.gif import (
        _lzw_encode_trivial,
        decode_gif,
        decode_gif_frames,
    )

    cases = [
        # frame 2 declares 2x1 but encodes one pixel -> short stream
        ("LZW stream short", _two_frame_gif(_lzw_encode_trivial(_np.array([0]), 2), w2=2)),
        # index 3 with a 2-entry table -> palette overrun
        ("palette index out of range", _two_frame_gif(_lzw_encode_trivial(_np.array([3]), 2))),
        # CLEAR(4) then code 7 (undefined) packed LSB-first = 0x3C
        ("first LZW code not a root", _two_frame_gif(b"\x3c")),
    ]
    for msg, bad in cases:
        with _pytest.raises(ValueError, match=msg):
            decode_gif_frames(bad)
        with _pytest.raises(ValueError, match=msg):
            decode_gif(bad)  # same verdict with frame 2 skipped
    # frame-count cap applies to walked (not composed) frames too
    over = _hostile_many_frame_gif(4097, w=1, h=1)
    with _pytest.raises(ValueError, match="too many frames"):
        decode_gif_frames(over)
    with _pytest.raises(ValueError, match="too many frames"):
        decode_gif(over)
    # an intact payload still decodes on both paths
    good = _two_frame_gif(_lzw_encode_trivial(_np.array([1]), 2))
    assert decode_gif(good).shape == (1, 2, 3)
    assert len(decode_gif_frames(good)) == 2


def test_gif_max_frames_matches_full_decode_prefix():
    from cdc_pipeline_spark.operators.gif import decode_gif_frames, encode_gif

    f1 = _checker(4, 5)
    f2 = _checker(4, 5, a=(0, 255, 0), b=(255, 255, 0))
    payload = encode_gif([f1, f2], delays_cs=[7, 9])
    full = decode_gif_frames(payload)
    first = decode_gif_frames(payload, max_frames=1)
    assert len(first) == 1
    assert np.array_equal(first[0][0], full[0][0]) and first[0][1] == full[0][1]


def _planted_8x8(light_positions):
    """8x8 RGB image: 255 at the given row-major positions, 0 elsewhere."""
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    for i in light_positions:
        img[i // 8, i % 8] = 255
    return img


def test_ahash64_bits_are_light_positions():
    """For a 0/255 image with 1..63 light cells the exact-integer
    threshold (64*cell > sum) makes aHash bits == light positions —
    including bit 63 via the two's-complement offset."""
    from cdc_pipeline_spark.operators.imaging import ahash64

    light = {0, 9, 18, 27, 63}
    h = ahash64(_planted_8x8(light))
    got = {i for i in range(64) if (h >> i) & 1}
    assert got == light
    assert h < 0  # bit 63 set -> negative long
    # scale invariance: 16x16 block-upscale resolves to the same hash
    img16 = np.kron(_planted_8x8(light), np.ones((2, 2, 1), dtype=np.uint8)).astype(np.uint8)
    # np.kron on the channel axis needs care: rebuild explicitly
    img16 = _planted_8x8(light).repeat(2, axis=0).repeat(2, axis=1)
    assert ahash64(img16) == h


def test_dhash64_gradient_bits_and_brightness_invariance():
    from cdc_pipeline_spark.operators.imaging import ahash64, dhash64

    light = {1, 2, 10, 63}
    img = _planted_8x8(light)
    h = dhash64(img)
    got = {i for i in range(64) if ((h >> i) & 1) if i != 63} | ({63} if h < 0 else set())
    # dHash bit (y,x) with nearest 8->9 upscale: x=0 never set; else
    # set iff cell(y,x) light and cell(y,x-1) dark
    want = {
        y * 8 + x
        for y in range(8)
        for x in range(1, 8)
        if (y * 8 + x in light) and (y * 8 + x - 1 not in light)
    }
    assert got == want
    # uniform brightness shift preserves both hashes (gradients and
    # the mean shift together)
    brighter = np.clip(img.astype(np.int32) + 20, 0, 255).astype(np.uint8)
    assert dhash64(brighter) == h
    assert ahash64(brighter) == ahash64(img)


def test_image_phash_quarantine_and_banded_neardup(spark):
    """image_phash decodes real payloads (PNG here), quarantines the
    corrupt one IN-BAND (decoded=false row with null hashes — VERDICT
    r10 #5: the drop rate must be auditable), and hamming_banded_pairs
    on the decoded ahash column finds exactly the planted pair."""
    from cdc_pipeline_spark.operators.dedup import hamming_banded_pairs
    from cdc_pipeline_spark.operators.imaging import encode_png
    from cdc_pipeline_spark.operators.multimodal import image_phash

    base = {5, 12, 23, 34, 45, 56, 60, 61}
    near = base ^ {12, 13}  # hamming 2 from base
    far = {i for i in range(64) if i % 3 == 0}
    rows = [
        (1, bytearray(encode_png(_planted_8x8(base)))),
        (2, bytearray(encode_png(_planted_8x8(near)))),
        (3, bytearray(encode_png(_planted_8x8(far)))),
        (4, bytearray(b"not an image at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashed = image_phash(df)
    rows_out = {r.doc_id: r for r in hashed.collect()}
    # ALL four rows survive; the corrupt one carries the audit flag
    assert set(rows_out) == {1, 2, 3, 4}
    assert rows_out[4].decoded is False
    assert rows_out[4].ahash is None and rows_out[4].dhash is None
    assert all(rows_out[i].decoded for i in (1, 2, 3))
    got = {i: (rows_out[i].ahash, rows_out[i].dhash) for i in (1, 2, 3)}
    assert bin(got[1][0] ^ got[2][0]).count("1") == 2
    pairs = hamming_banded_pairs(
        hashed.filter("decoded"),
        sig_col="ahash", bits=64, bands=4, max_hamming=3, max_bucket=None,
    ).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(1, 2, 2)]


def test_phash_grey_alpha_payload_does_not_kill_worker(spark):
    """Review r10: PNG color type 4 (grey+alpha) decodes to (h, w, 2);
    gray_u8 must take the grey channel instead of indexing a missing
    channel 2 (IndexError escaped the ValueError-only quarantine)."""
    from cdc_pipeline_spark.operators.imaging import ahash64, dhash64, gray_u8
    from cdc_pipeline_spark.operators.multimodal import image_phash

    grey = _rng_image(8, 8, 1, seed=11).reshape(8, 8)
    la = np.dstack([grey, np.full((8, 8), 255, dtype=np.uint8)])
    assert np.array_equal(gray_u8(la), grey)
    assert ahash64(la) == ahash64(grey.reshape(8, 8, 1))
    assert dhash64(la) == dhash64(grey.reshape(8, 8, 1))
    payload = encode_png(la)  # color type 4 round-trip
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    out = image_phash(df).collect()
    assert len(out) == 1 and out[0].ahash == ahash64(la)
