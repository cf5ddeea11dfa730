"""Pure-Python WAV (RIFF/PCM) codec — the audio leg of the multimodal
binary-column family. Like jpegcodec.py this is a REAL container format:
output plays in any audio tool, and the decoder parses the chunk layout
from the file rather than assuming it.

Supported: PCM 16-bit, mono or stereo, any sample rate. Honest seams:
compressed formats (non-PCM audioFormat tags — mp3/aac/ulaw) raise
NotImplementedError; a production cluster plugs ffmpeg in behind the same
encode/decode signatures and the Spark-side plumbing (binary column,
Arrow batches, vectorized numpy feature kernels) is unchanged.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 samples — shape (n,) mono or (n, 2) stereo — as WAV."""
    assert samples.dtype == np.int16
    n_channels = 1 if samples.ndim == 1 else samples.shape[1]
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a WAV file to (int16 samples [(n,) or (n, 2)], sample_rate).
    Walks the chunk chain (extra chunks like LIST/INFO are skipped)."""
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE", "not a RIFF/WAVE file"
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif tag == b"data":
            raw = payload
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    assert fmt is not None and raw is not None, "missing fmt/data chunk"
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(
            f"audioFormat {audio_format}: only PCM is decoded here — "
            "compressed audio needs a real decoder (ffmpeg)"
        )
    if bits != 16:
        raise NotImplementedError("only 16-bit PCM")
    samples = np.frombuffer(raw, dtype="<i2")
    if n_channels == 2:
        samples = samples.reshape(-1, 2)
    elif n_channels != 1:
        raise NotImplementedError("only mono/stereo")
    return samples.copy(), sample_rate


def synth_clip(i: int, sr: int = 16000, seconds: float = 0.25) -> np.ndarray:
    """Deterministic synthetic clip: seeded sine mix + noise; every 7th
    clip has a silent tail and every 11th clips (saturates) — planted
    structure for the stats/feature kernels."""
    rng = np.random.default_rng(987654321 + i)
    n = int(sr * seconds)
    t = np.arange(n) / sr
    f1, f2 = float(rng.integers(100, 2000)), float(rng.integers(2000, 7000))
    x = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.2 * np.sin(2 * np.pi * f2 * t)
    x += rng.normal(0, 0.03, n)
    if i % 7 == 0:
        x[2 * n // 3 :] = 0.0  # silence tail
    gain = 3.0 if i % 11 == 0 else 0.8  # clipping cluster
    return np.clip(x * gain * 32767, -32768, 32767).astype(np.int16)
