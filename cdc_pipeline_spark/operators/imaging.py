"""Pure-Python image codec for the multimodal decode stages.

The container ships no media libraries, so the real decode bodies the
multimodal operators need are implemented here from the file-format
specs with stdlib ``zlib``/``struct`` + numpy only:

  * PNG (RFC 2083): 8-bit greyscale / RGB / RGBA, all five scanline
    filters (None/Sub/Up/Average/Paeth), non-interlaced — the shapes a
    training-data pipeline actually stores; interlaced or 16-bit inputs
    raise cleanly and the caller's skip/quarantine path handles them.
  * BMP (BITMAPINFOHEADER): uncompressed 24-bit bottom-up rows.
  * baseline JPEG (SOF0/SOF1) via ``operators/jpeg.py`` — markers,
    stream-defined Huffman tables, restart intervals, generic chroma
    subsampling; progressive frames quarantine (or hit the Pillow
    probe when a deployment installs it).
  * ``encode_png`` (filter 0 + zlib) so tests can build real fixtures
    and prove a byte-exact decode roundtrip without shipping binaries.

Everything here is per-payload Python executed INSIDE Arrow-batched
``mapInPandas`` workers (operators/multimodal.py) — the JVM never sees
pixel data, and the decode cost parallelizes with the partition spread
the multimodal operators already apply.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color type → samples per pixel (spec §4.1.2; palette unsupported)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

# Hard ceiling on decoded pixel bytes per payload (≈ a 8192×8192 RGBA
# frame). Training-data images are far smaller; anything above this is
# hostile or misrouted and goes to the quarantine path instead of an
# unbounded allocation inside an Arrow worker.
_MAX_DECODED_BYTES = 256 * 1024 * 1024


def encode_png(pixels: "np.ndarray") -> bytes:
    """Minimal PNG encoder (filter 0, one IDAT) for 8-bit grey / grey+A
    / RGB / RGBA arrays shaped (h, w) or (h, w, c)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> "np.ndarray":
    """Decode a non-interlaced 8-bit PNG to a (h, w, c) uint8 array,
    unfiltering every scanline per spec §6."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if width == 0 or height == 0:
                # spec requires nonzero dims; a zero-area array would
                # IndexError resize_nearest and NaN image_feature
                raise ValueError("zero-dimension PNG")
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = _CHANNELS[color_type]
    stride = width * channels
    expected = height * (stride + 1)
    # bound BEFORE decompressing: a 60-byte payload can declare 2^31×2^31
    # IHDR dims or wrap a zlib bomb, and an unbounded zlib.decompress
    # would MemoryError the mapInPandas worker (not a ValueError, so the
    # multimodal quarantine would miss it and the whole stage would fail)
    if expected > _MAX_DECODED_BYTES:
        raise ValueError(
            f"PNG decoded size {expected} exceeds cap {_MAX_DECODED_BYTES}"
        )
    dec = zlib.decompressobj()
    raw = dec.decompress(bytes(idat), expected + 1)
    if len(raw) != expected:
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:
            cur = line
        elif f == 1:  # Sub — recon[x] = line[x] + recon[x−c] is a
            # per-channel-lane prefix sum; mod-256 distributes over the
            # cumsum, so this vectorizes (the hot decode path — a Python
            # per-byte loop here costs w·c interpreter steps per row)
            cur = (np.cumsum(line.reshape(width, channels), axis=0) & 0xFF).reshape(stride)
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (3, 4):  # Average / Paeth — left-dependent recurrences
            # that can't vectorize; plain-list loops with hoisted scalar
            # arithmetic run ~6x faster than per-byte numpy indexing +
            # a _paeth call (measured 295 -> 53 ms on a 256x256 RGB
            # Paeth image — review r10: real encoders emit Paeth
            # heavily, so this is a hot path for crawled images)
            ln = line.tolist()
            pv = prev.tolist()
            res = [0] * stride
            if f == 3:  # Average
                for x in range(stride):
                    left = res[x - channels] if x >= channels else 0
                    res[x] = (ln[x] + ((left + pv[x]) >> 1)) & 0xFF
            else:  # Paeth (spec §6.6, inlined)
                for x in range(stride):
                    if x >= channels:
                        left = res[x - channels]
                        ul = pv[x - channels]
                    else:
                        left = ul = 0
                    b = pv[x]
                    p = left + b - ul
                    pa = p - left
                    if pa < 0:
                        pa = -pa
                    pb = p - b
                    if pb < 0:
                        pb = -pb
                    pc = p - ul
                    if pc < 0:
                        pc = -pc
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = ul
                    res[x] = (ln[x] + pred) & 0xFF
            cur = np.array(res, dtype=np.int64)
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, channels)


def decode_bmp(payload: bytes) -> "np.ndarray":
    """Decode an uncompressed 24-bit BITMAPINFOHEADER BMP to (h, w, 3)
    uint8 RGB (BMP stores BGR bottom-up; both are undone here)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack("<I", payload[10:14])
    header_size, width, height = struct.unpack("<Iii", payload[14:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0 or height <= 0 or width <= 0:
        raise ValueError(
            f"unsupported BMP (bpp={bpp}, compression={compression}, "
            f"height={height}, width={width})"
        )
    row_size = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    # validate the payload actually CONTAINS the advertised pixel data
    # BEFORE allocating from untrusted header fields — a hostile 60-byte
    # header claiming 2^28 × 2^20 would otherwise MemoryError the worker
    # (not a ValueError, so the quarantine would miss it)
    if data_offset + height * row_size > len(payload):
        raise ValueError("truncated BMP pixel data")
    out = np.zeros((height, width, 3), dtype=np.uint8)
    for y in range(height):
        off = data_offset + y * row_size
        row = np.frombuffer(payload, dtype=np.uint8, count=width * 3, offset=off)
        out[height - 1 - y] = row.reshape(width, 3)[:, ::-1]  # BGR→RGB, bottom-up
    return out


def decode_image(payload: bytes) -> "np.ndarray":
    """Sniff-and-decode: PNG, BMP, baseline JPEG, or GIF by signature →
    (h, w, c) uint8. Raises ValueError on anything else — INCLUDING
    truncated/corrupt payloads whose parse dies inside struct/zlib
    (neither ``struct.error`` nor ``zlib.error`` subclasses ValueError,
    and the multimodal quarantine catches only ValueError; without this
    normalization one corrupt blob would kill the mapInPandas worker
    and fail the whole stage)."""
    try:
        if payload[:8] == _PNG_SIG:
            return decode_png(payload)
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:2] == b"\xff\xd8":
            from cdc_pipeline_spark.operators.jpeg import decode_jpeg

            return decode_jpeg(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            from cdc_pipeline_spark.operators.gif import decode_gif

            return decode_gif(payload)
    except (struct.error, zlib.error, IndexError, MemoryError, OverflowError) as exc:
        # OverflowError: a hostile Huffman table can make the JPEG
        # entropy decoder produce arbitrary-precision ints (the decoder
        # guards its size categories, but the normalization set is the
        # last line of the quarantine contract)
        raise ValueError(f"corrupt image payload: {exc}") from exc
    raise ValueError("unrecognized image format")


def resize_nearest(pixels: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Nearest-neighbor resize to (height, width, c) — the deterministic
    baseline every engine reproduces bit-for-bit (no resampling kernels,
    no float rounding ambiguity)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]


def gray_u8(pixels: "np.ndarray") -> "np.ndarray":
    """Integer ITU-R BT.601 luma: (299 R + 587 G + 114 B) // 1000 as
    uint8 — exact integer arithmetic so every engine (and a SQL oracle)
    reproduces the grayscale bit-for-bit; for r=g=b inputs it is the
    identity. 1-channel (grey) and 2-channel (grey+alpha, PNG color
    type 4 — review r10) inputs take channel 0; alpha is ignored for
    RGBA, matching the luma formula."""
    if pixels.ndim == 2:
        return pixels.astype(np.uint8)
    if pixels.shape[2] < 3:  # grey or grey+alpha
        return pixels[:, :, 0].astype(np.uint8)
    p = pixels.astype(np.int64)
    return (
        (299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]) // 1000
    ).astype(np.uint8)


def _pack_bits64(bits: "np.ndarray") -> int:
    """Row-major 64 booleans -> signed 64-bit int (bit i = element i;
    bit 63 via the two's-complement offset so the value fits a jlong —
    same packing rule as dedup.simhash_signatures)."""
    flat = bits.ravel()
    out = 0
    for i in range(63):
        if flat[i]:
            out |= 1 << i
    if flat[63]:
        out += -(1 << 63)
    return out


def ahash64(pixels: "np.ndarray") -> int:
    """Average hash (aHash): grayscale -> nearest-neighbor 8x8 ->
    threshold each cell against the mean -> 64-bit signature (row-major,
    bit i = cell i, signed long). The threshold is the EXACT integer
    comparison ``64 * cell > sum(cells)`` — no float mean, so the bit
    pattern is bit-stable across engines and replayable in SQL. Two
    images within a few flipped bits are perceptual near-duplicates
    (same banding math as text SimHash)."""
    g = resize_nearest(gray_u8(pixels)[:, :, None], 8, 8)[:, :, 0].astype(np.int64)
    return _pack_bits64(64 * g > g.sum())


def dhash64(pixels: "np.ndarray") -> int:
    """Difference hash (dHash): grayscale -> nearest-neighbor 9x8 ->
    bit (y, x) = cell(y, x+1) > cell(y, x) over the 8x8 differences
    (row-major, signed long). Gradient-based, so it is robust to
    uniform brightness shifts that move every aHash cell together.

    Reduced effective width on tiny inputs (ADVICE r10): for source
    images 8 px wide or narrower, the 8->9 nearest-neighbor upscale
    duplicates column 0, so the 8 bits of bit-column 0 compare a cell
    with itself and are structurally 0 — an effective 56-bit hash that
    slightly inflates near-dup collision rates for sub-9px-wide
    images. This is the standard dHash construction (the 9-column
    grid is the definition); the oracle models the same duplication,
    and real crawled images are far wider than 9 px. Callers hashing
    icon-sized corpora should band on ahash64 (the oracle query does)
    or widen the band count."""
    g = resize_nearest(gray_u8(pixels)[:, :, None], 9, 8)[:, :, 0].astype(np.int64)
    return _pack_bits64(g[:, 1:] > g[:, :-1])


def image_feature(pixels: "np.ndarray", dim: int = 8) -> list[float]:
    """Deterministic low-dim image descriptor: per-channel mean and std
    over the first channels, padded with (h, w) aspect terms — enough
    signal for dedup/quality gates without a model, and bit-stable
    because the accumulation order is fixed (C-order float64 sums)."""
    arr = pixels.astype(np.float64) / 255.0
    h, w = arr.shape[:2]
    c = arr.shape[2] if arr.ndim == 3 else 1
    flat = arr.reshape(h * w, c)
    feats: list[float] = []
    for ch in range(min(c, 3)):
        feats.append(float(flat[:, ch].mean()))
        feats.append(float(flat[:, ch].std()))
    feats.append(h / max(w, 1))
    feats.append(min(h * w / 1_000_000.0, 1.0))
    feats = feats[:dim]
    feats += [0.0] * (dim - len(feats))
    return [round(f, 6) for f in feats]


# ---------------------------------------------------------------------------
# Optional codec fallback (GIF/WebP/progressive-JPEG/…): probed ONCE per
# Python worker process. This container ships no media libraries, so the
# probe fails here and decode_image_any degrades to exactly decode_image
# (PNG/BMP/baseline-JPEG from scratch; quarantine handles the rest); a
# deployment that installs Pillow on its workers gets the remaining
# compressed formats with zero config.
# ---------------------------------------------------------------------------

_PIL_PROBE: list | None = None


def _pil_image_module():
    """Worker-side probe for Pillow, cached per process ([] = absent).
    Pillow's own bomb guard defaults to ~89M pixels — well past our
    256 MiB decoded-bytes cap at 4 bytes/px — so the probe tightens
    MAX_IMAGE_PIXELS to the cap's pixel equivalent: a hostile header
    then raises DecompressionBombError at parse time (normalized to
    ValueError below), never allocating."""
    global _PIL_PROBE
    if _PIL_PROBE is None:
        try:
            from PIL import Image  # noqa: PLC0415

            Image.MAX_IMAGE_PIXELS = _MAX_DECODED_BYTES // 4
            _PIL_PROBE = [Image]
        except Exception:
            _PIL_PROBE = []
    return _PIL_PROBE[0] if _PIL_PROBE else None


def decode_image_any(payload: bytes) -> "np.ndarray":
    """decode_image (pure-stdlib PNG/BMP), falling back to Pillow for
    compressed codecs when it is installed on the worker. Every failure
    is normalized to ValueError so the mapInPandas quarantine path
    applies uniformly. The probe tightens Pillow's bomb guard
    (MAX_IMAGE_PIXELS) to our _MAX_DECODED_BYTES cap so the fallback
    cannot allocate what decode_png just refused; a belt-and-braces
    post-decode size check covers multi-frame/mode corner cases the
    pixel-count guard can miss."""
    try:
        return decode_image(payload)
    except ValueError:
        image_mod = _pil_image_module()
        if image_mod is None:
            raise
        import io

        try:
            with image_mod.open(io.BytesIO(payload)) as im:
                target = {"1": "L", "L": "L", "LA": "LA", "RGBA": "RGBA"}.get(im.mode, "RGB")
                arr = np.asarray(im.convert(target), dtype=np.uint8)
        except Exception as exc:
            raise ValueError(f"undecodable image payload: {exc}") from exc
        if arr.ndim == 2:
            arr = arr[:, :, None]
        if arr.size == 0:
            raise ValueError("zero-dimension decoded image")
        if arr.nbytes > _MAX_DECODED_BYTES:
            raise ValueError(
                f"decoded image size {arr.nbytes} exceeds cap {_MAX_DECODED_BYTES}"
            )
        return arr
