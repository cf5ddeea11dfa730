"""Deterministic image codecs, all pure Python (no PIL/libjpeg needed).

- PNG: encode here is the byte-stable fast path (8-bit RGB, filter 0,
  zlib IDAT — opens in any viewer; the synth corpus and every bench
  cache are keyed on its exact bytes). Decode delegates to the full
  spec-profile codec (``pngcodec.py``): all five filters, color types
  0/2/3/4/6, bit depths 1-16, Adam7, tRNS, CRC validation — i.e. real
  crawl PNGs, not just our own output. ``pngcodec.encode_png`` exposes
  the flexible encoder (palette/16-bit/interlace/adaptive filters) for
  fabricating those layouts in tests.
- JPEG: a real JFIF encoder/decoder (``jpegcodec.py``): DCT, Annex-K
  quantization/Huffman tables, baseline AND progressive frames, 4:4:4
  through 4:2:0 sampling, byte stuffing. The synthetic pipeline encodes
  baseline 4:4:4 at quality 98 so the noise-heavy synth images hold the
  40 dB PSNR invariant from BASELINE.json input_hint (worst measured
  43.4 dB; natural images clear 40 dB at far lower quality).
- FJPG: the legacy deterministic lossy stand-in (step-2 quantization +
  zlib) kept for decode back-compat with data written by earlier rounds;
  ``decode`` dispatches jpeg-format bytes by magic (0xFFD8 vs b"FJPG").

All functions take/return ``numpy uint8 arrays of shape (h, w, 3)``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_FJPG_MAGIC = b"FJPG"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    # filter byte 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Full spec-profile PNG decode (``pngcodec.py``): all five row
    filters, color types 0/2/3/4/6, bit depths 1-16, Adam7, tRNS, CRC
    validation — a real crawl's PNGs, not just this module's own filter-0
    RGB output. Returns uint8 (h,w[,2|3|4])."""
    from . import pngcodec

    return pngcodec.decode_png(data)


def encode_jpeg_like(pixels: np.ndarray) -> bytes:
    """Deterministic lossy stand-in (see module docstring). NOT real JPEG."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    q = (pixels >> 1).astype(np.uint8)  # step-2 quantization
    return (
        _FJPG_MAGIC
        + struct.pack(">II", w, h)
        + zlib.compress(q.tobytes(), 6)
    )


def decode_jpeg_like(data: bytes) -> np.ndarray:
    assert data[:4] == _FJPG_MAGIC, "not an FJPG payload"
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), np.uint8).reshape(h, w, 3)
    return (q.astype(np.uint16) * 2 + 1).clip(0, 255).astype(np.uint8)


def encode_jpeg(
    pixels: np.ndarray, quality: int = 98, subsampling: tuple[int, int] = (1, 1)
) -> bytes:
    """Real baseline JFIF encode (see jpegcodec.py). Default quality 98 /
    4:4:4 keeps noise-heavy synthetic content above the 40 dB PSNR
    invariant; pass subsampling=(2, 2) for real-world-shaped 4:2:0 output
    (the decoder reads sampling factors per file either way)."""
    from . import jpegcodec

    return jpegcodec.encode_baseline_jpeg(
        pixels, quality=quality, subsampling=subsampling
    )


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        if data[:2] == b"\xff\xd8":
            from . import jpegcodec

            return jpegcodec.decode_baseline_jpeg(data)
        if data[:4] == _FJPG_MAGIC:  # legacy stand-in payloads
            return decode_jpeg_like(data)
        raise ValueError("jpeg-format bytes with neither SOI nor FJPG magic")
    if fmt == "gif":
        from . import gifcodec

        # static view: first composited frame (animated GIFs go through
        # multimodal.sample_frames for the full frame sequence)
        return gifcodec.decode_gif(data)
    if fmt == "bmp":
        from . import bmpcodec

        return bmpcodec.decode_bmp(data)
    if fmt == "webp":
        from . import webpcodec

        # full lossless (VP8L) profile; lossy VP8 raises an honest seam
        return webpcodec.decode_webp(data)
    raise NotImplementedError(
        f"format {fmt!r}: real decoders (libwebp/ffmpeg) are not available "
        "in this container; plug one in here"
    )


def to_rgb(px: np.ndarray) -> np.ndarray:
    """Channel-normalize decoded pixels to (h, w, 3) so downstream
    feature/resize plumbing is shape-stable across 1/2/3/4-component
    sources: grayscale broadcasts, alpha channels are dropped (the
    standard ingest normalization before any vision model — compositing
    would need a background choice the pipeline doesn't make)."""
    if px.ndim == 2:
        return np.repeat(px[..., None], 3, axis=-1)
    if px.shape[-1] == 2:  # gray + alpha
        return np.repeat(px[..., :1], 3, axis=-1)
    if px.shape[-1] == 4:  # RGBA
        return np.ascontiguousarray(px[..., :3])
    return px


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def average_hash(pixels: np.ndarray, grid: int = 8) -> int:
    """Deterministic 64-bit perceptual-style hash: grid-mean luma vs global
    mean. Drives phash-bucket partitioning; int64 (signed) for Spark."""
    lum = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = lum.shape
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    cells = np.empty((grid, grid))
    for i in range(grid):
        for j in range(grid):
            cells[i, j] = lum[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (cells > cells.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # two's-complement into signed int64
    return v - (1 << 64) if v >= (1 << 63) else v
