"""Pure-stdlib GIF decoder (GIF87a / GIF89a) + a fixture encoder.

Part of the multimodal mandate (same charter as ``operators/imaging.py``
— the reference engine has no media surface): web crawls carry GIFs in
volume, and the container ships no media libraries, so the decoder is
built from the public GIF89a specification with zlib-free LZW — usable
inside Arrow workers with zero dependencies beyond numpy.

Scope (documented, not silent):
  * full variable-width LZW (clear / end codes, 12-bit cap with
    deferred-clear handling), global and local color tables, interlaced
    images (all four passes), GIF89a graphic-control extensions
    (per-frame delay + transparency index);
  * multi-frame composition with disposal methods 0 (unspecified),
    1 (leave in place) and 2 (restore to background); method 3
    (restore previous) needs a frame-history stack and raises
    ``ValueError`` — the quarantine path in ``multimodal`` drops such
    payloads instead of crashing the stage;
  * every malformed-payload failure is raised as ``ValueError`` (the
    multimodal quarantine contract — see ``imaging.decode_image``).

Decoded canvases are bounded by ``imaging._MAX_DECODED_BYTES`` exactly
like PNG/BMP/JPEG — and the bound is *cumulative over composed frames*
(frames held x canvas bytes), so neither a hostile header nor a tiny
many-frame animation can allocate its way past the worker's memory
budget. LZW decodes into a preallocated 1-byte-per-pixel buffer.

``encode_gif`` is the deterministic fixture helper (mirrors
``imaging.encode_png``): clear-per-symbol LZW (the dictionary never
grows, so the code width is constant — inefficient but spec-valid),
optional interlace, multi-frame with per-frame delays. Tests decode
what it emits and assert pixel equality; the committed byte fixtures
stay reproducible from code.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_FRAMES = 4096


def _err(msg: str) -> ValueError:
    return ValueError(f"corrupt gif payload: {msg}")


class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise _err("truncated")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.take(2))[0]

    def sub_blocks(self) -> bytes:
        """Concatenate data sub-blocks up to the 0x00 terminator."""
        chunks = []
        while True:
            n = self.u8()
            if n == 0:
                return b"".join(chunks)
            chunks.append(self.take(n))

    def skip_sub_blocks(self) -> None:
        while True:
            n = self.u8()
            if n == 0:
                return
            self.pos += n
            if self.pos > len(self.data):
                raise _err("truncated sub-block")


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """GIF-variant LZW: variable code width from ``min_code_size + 1``
    to 12 bits, LSB-first bit packing, CLEAR resets the table, the
    table freezes at 4096 entries until the next CLEAR (deferred
    clear). Output longer than ``max_pixels`` raises — a hostile
    stream must not out-allocate the declared image size. The output
    buffer is a single preallocated ``bytearray(max_pixels)`` (palette
    indices are <= 255 since ``min_code_size`` <= 8), so interpreter
    memory stays at 1 byte/pixel instead of a list[int]'s ~8x."""
    if not 2 <= min_code_size <= 8:
        raise _err(f"LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    # table as (prefix_code, suffix_byte) pairs; roots decode to themselves
    prefix = [0] * 4096
    suffix = [0] * 4096
    size0 = end + 1

    def reset() -> tuple[int, int]:
        return size0, min_code_size + 1

    next_code, width = reset()
    out = bytearray(max_pixels)
    out_len = 0
    prev = -1
    acc = 0
    acc_bits = 0
    pos = 0
    n = len(data)

    def expand(code: int) -> bytearray:
        chain = bytearray()
        c = code
        while c >= clear:  # walk prefixes; roots are < clear
            chain.append(suffix[c])
            c = prefix[c]
        chain.append(c)
        chain.reverse()
        return chain

    while True:
        while acc_bits < width:
            if pos >= n:
                # data exhausted without END — tolerated by real decoders
                del out[out_len:]
                return out
            acc |= data[pos] << acc_bits
            acc_bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        acc_bits -= width
        if code == clear:
            next_code, width = reset()
            prev = -1
            continue
        if code == end:
            del out[out_len:]
            return out
        if prev < 0:
            if code >= clear:
                raise _err("first LZW code not a root")
            if out_len >= max_pixels:
                raise _err("LZW output exceeds declared pixel count")
            out[out_len] = code
            out_len += 1
            prev = code
        else:
            if code < next_code:
                entry = expand(code)
            elif code == next_code:
                entry = expand(prev)
                entry.append(entry[0])
            else:
                raise _err("LZW code out of range")
            if out_len + len(entry) > max_pixels:
                raise _err("LZW output exceeds declared pixel count")
            out[out_len : out_len + len(entry)] = entry
            out_len += len(entry)
            if next_code < 4096:
                prefix[next_code] = prev
                suffix[next_code] = entry[0]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = code


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: "np.ndarray") -> "np.ndarray":
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif_frames(
    payload: bytes, max_frames: int | None = None
) -> list[tuple["np.ndarray", int]]:
    """Decode every frame of a GIF, composited onto the logical screen:
    returns ``[(canvas_rgb_uint8, delay_centiseconds), ...]``. Raises
    ``ValueError`` on malformed input or the unsupported
    restore-previous disposal (quarantine contract).

    Memory guarantee: *total* composed-frame bytes (every returned
    canvas plus the working canvas) are bounded by
    ``imaging._MAX_DECODED_BYTES`` — the budget is cumulative across
    frames, not per-frame, so a tiny payload declaring many frames on a
    large logical screen raises instead of allocating frames x canvas.

    ``max_frames`` stops COMPOSING after that many frames — later
    frames are still fully VALIDATED (container structure, color-table
    presence, the unsupported restore-previous disposal, LZW decode
    with the short-stream check, palette-index range, the
    ``_MAX_FRAMES`` cap) but never composited onto the canvas and never
    copied, so the quarantine verdict on a malformed payload is
    identical whichever consumer touches it — pixel-level
    malformations in frames past the cap raise exactly as they do on
    the full decode (ADVICE r9). Still-image consumers pass 1 and skip
    the composition/copy cost. The ONE documented carve-out: the
    cumulative-budget guard only counts COMPOSED frames, so a
    many-frame animation that the full decode rejects on budget can
    still serve its first frame (a resource bound, not a malformation
    verdict)."""
    from cdc_pipeline_spark.operators.imaging import _MAX_DECODED_BYTES

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise _err("bad signature")
    r = _Reader(payload)
    r.take(6)
    width, height = r.u16(), r.u16()
    if width == 0 or height == 0:
        raise _err("zero logical screen")
    if width * height * 3 > _MAX_DECODED_BYTES:
        raise _err(f"logical screen {width}x{height} exceeds decode budget")
    packed = r.u8()
    bg_index = r.u8()
    r.u8()  # aspect
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        raw = r.take(3 * n)
        gct = np.frombuffer(raw, dtype=np.uint8).reshape(n, 3)

    if gct is not None and bg_index < len(gct):
        bg_rgb = gct[bg_index]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (height, width, 3)).copy()

    frames: list[tuple[np.ndarray, int]] = []
    delay = 0
    transparent = -1
    disposal = 0
    walked = 0  # frames seen (composed + validated-only) for _MAX_FRAMES
    composing = True  # False once max_frames reached: validate, don't compose
    while True:
        block = r.u8()
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = r.u8()
            if label == 0xF9:  # graphic control
                body = r.sub_blocks()
                if len(body) < 4:
                    raise _err("short graphic control block")
                flags = body[0]
                disposal = (flags >> 2) & 0x07
                delay = struct.unpack("<H", body[1:3])[0]
                transparent = body[3] if flags & 0x01 else -1
            else:  # comment / app / plain text — skip
                r.skip_sub_blocks()
            continue
        if block != 0x2C:
            raise _err(f"unknown block 0x{block:02x}")
        # image descriptor
        left, top, w, h = r.u16(), r.u16(), r.u16(), r.u16()
        if left + w > width or top + h > height or w == 0 or h == 0:
            raise _err("frame rectangle outside logical screen")
        ipacked = r.u8()
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(r.take(3 * n), dtype=np.uint8).reshape(n, 3)
        else:
            table = gct
        if table is None:
            raise _err("no color table for frame")
        if disposal == 3:
            raise ValueError(
                "gif disposal method 3 (restore previous) is not supported "
                "— payload quarantined"
            )
        mcs = r.u8()
        if not 2 <= mcs <= 8:
            raise _err(f"LZW min code size {mcs}")
        if not composing:
            # past max_frames: decode + validate the pixel data (short
            # LZW stream, palette range, frame cap) without composing,
            # so malformed tails quarantine identically to the full
            # decode — no canvas copy, no numpy composition
            skipped = _lzw_decode(r.sub_blocks(), mcs, w * h)
            if len(skipped) < w * h:
                raise _err(f"LZW stream short: {len(skipped)} of {w * h} pixels")
            if max(skipped) >= len(table):
                raise _err("palette index out of range")
            walked += 1
            if walked > _MAX_FRAMES:
                raise _err("too many frames")
            delay, transparent, disposal = 0, -1, 0
            continue
        indices = _lzw_decode(r.sub_blocks(), mcs, w * h)
        if len(indices) < w * h:
            raise _err(f"LZW stream short: {len(indices)} of {w * h} pixels")
        idx = np.frombuffer(bytes(indices), dtype=np.uint8).astype(np.int32).reshape(h, w)
        if int(idx.max(initial=0)) >= len(table):
            raise _err("palette index out of range")
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        rgb = table[idx]  # (h, w, 3)
        region = canvas[top : top + h, left : left + w]
        if transparent >= 0:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        # cumulative budget: frames already held + the copy about to be
        # taken + the live working canvas, each width*height*3 bytes,
        # must fit the decode budget (the documented peak, not one
        # canvas short of it)
        if (len(frames) + 2) * width * height * 3 > _MAX_DECODED_BYTES:
            raise _err("composed animation frames exceed decode budget")
        frames.append((canvas.copy(), delay))
        walked += 1
        if walked > _MAX_FRAMES:
            raise _err("too many frames")
        if max_frames is not None and len(frames) >= max_frames:
            composing = False
        if disposal == 2:  # restore rect to background
            canvas[top : top + h, left : left + w] = bg_rgb
        delay, transparent, disposal = 0, -1, 0
    if not frames:
        raise _err("no image data")
    return frames


def decode_gif(payload: bytes) -> "np.ndarray":
    """First composed frame as (h, w, 3) uint8 — the ``decode_image``
    contract shape. Only the first frame is composed; later frames are
    LZW-decoded and validated but never composited or copied, so
    still-image consumers don't pay composition cost yet malformed
    payloads quarantine identically to :func:`decode_gif_frames`
    (budget carve-out aside — see there)."""
    return decode_gif_frames(payload, max_frames=1)[0][0]


# ---------------------------------------------------------------------------
# Fixture encoder — mirrors imaging.encode_png's role in tests.
# ---------------------------------------------------------------------------


def _lzw_encode_trivial(indices: "np.ndarray", min_code_size: int) -> bytes:
    """Spec-valid LZW with a CLEAR before every symbol: the dictionary
    never grows, so the code width stays ``min_code_size + 1``
    throughout. ~2x the bytes of real LZW — fine for fixtures, and it
    exercises the decoder's repeated-clear path on every pixel."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    acc = 0
    acc_bits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += width
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    for v in indices.ravel():
        emit(clear)
        emit(int(v))
    emit(end)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: "list[np.ndarray] | np.ndarray",
    delays_cs: list[int] | None = None,
    interlace: bool = False,
    transparent_index: int | None = None,
    disposal: int = 1,
) -> bytes:
    """Encode (h, w, 3) uint8 frame(s) into a GIF89a byte string. All
    frames share one global palette built from their distinct colors
    (≤ 256 or ValueError — fixtures pick small palettes on purpose)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("encode_gif: no frames")
    h, w = frames[0].shape[:2]
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"encode_gif: {len(palette)} distinct colors > 256")
    bits = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    table_n = 1 << bits
    table = np.zeros((table_n, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    mcs = bits

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((bits - 1) << 4) | (bits - 1))  # GCT + resolution
    out += b"\x00\x00"  # bg index 0, aspect
    out += table.tobytes()

    per_frame = len(frames[0].reshape(-1, 3))
    for fi, frame in enumerate(frames):
        if frame.shape[:2] != (h, w):
            raise ValueError("encode_gif: frames must share one size")
        delay = (delays_cs or [0] * len(frames))[fi]
        flags = (disposal & 0x07) << 2
        tidx = 0
        if transparent_index is not None:
            flags |= 0x01
            tidx = transparent_index
        out += b"\x21\xf9"
        out += _sub_blocks(struct.pack("<BHB", flags, delay, tidx))
        idx = inverse[fi * per_frame : (fi + 1) * per_frame].astype(np.int32).reshape(h, w)
        if interlace:
            order = []
            for start, step in _INTERLACE_PASSES:
                order.extend(range(start, h, step))
            idx = idx[order]
        out.append(0x2C)
        out += struct.pack("<HHHH", 0, 0, w, h)
        out.append(0x40 if interlace else 0x00)
        out.append(mcs)
        out += _sub_blocks(_lzw_encode_trivial(idx, mcs))
    out.append(0x3B)
    return bytes(out)
