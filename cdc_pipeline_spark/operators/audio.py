"""Pure-Python audio codec for the multimodal decode stages.

Companion to ``operators.imaging``: the container ships no audio
libraries, so the real decode body is implemented from the RIFF/WAVE
spec with stdlib ``struct`` + numpy — PCM 16-bit (format 1) and IEEE
float32 (format 3), mono or multi-channel. Compressed codecs (MP3,
AAC, …) genuinely need external libraries and still raise cleanly; the
multimodal quarantine path handles them.

Feature extraction mirrors ``imaging.image_feature``: a deterministic
low-dimensional descriptor (duration, RMS, zero-crossing rate, peak,
band energies) computed with fixed accumulation order — enough signal
for corpus-level dedup/quality gates without a model, bit-stable across
partitionings.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: "np.ndarray", sample_rate: int = 16000) -> bytes:
    """Minimal RIFF/WAVE PCM-16 encoder for (n,) or (n, channels) int16
    arrays — lets tests build real fixtures without shipping binaries."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    data = arr.astype("<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    payload = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    payload += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def decode_wav(payload: bytes) -> tuple["np.ndarray", int]:
    """Decode RIFF/WAVE (PCM-16 or float32) to ``((n, channels) float64
    in [-1, 1], sample_rate)``. Raises ValueError on anything else —
    struct errors are normalized so the multimodal quarantine (which
    catches only ValueError) handles truncated blobs."""
    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE payload")
        pos = 12
        fmt_code = channels = sample_rate = bits = None
        data = None
        while pos + 8 <= len(payload):
            tag = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + size]
            if tag in (b"fmt ", b"data") and len(body) < size:
                # a blob cut off mid-chunk must hit the quarantine, not
                # silently decode the surviving prefix as a shorter
                # (wrong) recording
                raise ValueError(f"truncated {tag!r} chunk")
            if tag == b"fmt ":
                if len(body) < 16:
                    raise ValueError("truncated fmt chunk")
                fmt_code, channels, sample_rate, _br, _ba, bits = struct.unpack(
                    "<HHIIHH", body[:16]
                )
            elif tag == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks pad to even offsets
        if fmt_code is None or data is None:
            raise ValueError("WAVE missing fmt/data chunk")
        if fmt_code == 1 and bits == 16:
            arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif fmt_code == 3 and bits == 32:
            arr = np.frombuffer(data, dtype="<f4").astype(np.float64)
        else:
            raise ValueError(f"unsupported WAVE format (code={fmt_code}, bits={bits})")
        if channels < 1:
            raise ValueError("invalid channel count")
        n = len(arr) // channels
        return arr[: n * channels].reshape(n, channels), int(sample_rate)
    except struct.error as exc:
        raise ValueError(f"corrupt WAVE payload: {exc}") from exc


def audio_feature(samples: "np.ndarray", sample_rate: int, dim: int = 8) -> list[float]:
    """Deterministic audio descriptor over the first channel:
    [duration_s (capped 1e4), rms, zero-crossing rate, peak, mean |x|,
    low/high half-band energy split (first differences as a crude
    high-pass), channels/8] — fixed C-order float64 accumulation, so
    replays are bit-stable at any partitioning."""
    samples = np.asarray(samples)
    if samples.ndim == 1:  # accept the same mono convention encode_wav does
        samples = samples[:, None]
    if samples.size == 0:
        return [0.0] * dim
    mono = samples[:, 0].astype(np.float64)
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono * mono)))
    zcr = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) / max(n - 1, 1)
    diff = np.diff(mono)
    total_e = float(np.sum(mono * mono))
    high_e = float(np.sum(diff * diff))
    feats = [
        min(n / max(sample_rate, 1), 1e4),
        rms,
        zcr,
        float(np.max(np.abs(mono))),
        float(np.mean(np.abs(mono))),
        high_e / total_e if total_e > 0 else 0.0,
        min(sample_rate / 48000.0, 4.0),
        samples.shape[1] / 8.0,
    ]
    feats = feats[:dim] + [0.0] * max(0, dim - len(feats))
    return [round(f, 6) for f in feats]
