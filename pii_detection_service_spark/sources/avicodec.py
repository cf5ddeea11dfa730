"""Pure-Python AVI/MJPEG video container codec — the video leg of the
multimodal binary-column family, completing the real-codec trio
(PNG/JPEG images → jpegcodec, WAV audio → wavcodec, AVI video here).

MJPEG-in-AVI is a REAL, playable format: each frame is a baseline JFIF
JPEG (encoded by jpegcodec) stored as a '00dc' chunk inside the RIFF
'movi' list, with a standard 'hdrl' (avih + strh/strf) header block and
an 'idx1' keyframe index. Any mainstream player opens the output.

Decoder walks the RIFF chunk tree (never assumes fixed offsets), collects
'00dc'/'00db' frame chunks, and hands the JPEG payloads to
jpegcodec.decode_baseline_jpeg. Honest seams: non-MJPG video streams
(biCompression other than 'MJPG') raise NotImplementedError — plugging in
ffmpeg behind the same two functions is the production path.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""  # RIFF chunks are word-aligned
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(tag: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", tag + payload)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 92
) -> bytes:
    """Encode (h, w, 3) uint8 RGB frames as an MJPEG AVI."""
    from . import jpegcodec

    assert frames, "need at least one frame"
    h, w, _ = frames[0].shape
    jpegs = [jpegcodec.encode_baseline_jpeg(f, quality=quality) for f in frames]
    max_bytes = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,        # dwMicroSecPerFrame
        max_bytes * fps,         # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        len(jpegs),              # dwTotalFrames
        0, 1,                    # dwInitialFrames, dwStreams
        max_bytes,               # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,        # dwWidth, dwHeight, reserved×4
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(jpegs), max_bytes, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b""
    index = b""
    for j in jpegs:
        offset = 4 + len(movi_payload)  # from start of 'movi' list data
        movi_payload += _chunk(b"00dc", j)
        index += b"00dc" + struct.pack("<III", 0x10, offset, len(j))
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(b"idx1", index)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes) -> tuple[list[np.ndarray], int]:
    """Decode an MJPEG AVI to ([frames], fps). Walks the chunk tree."""
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI ", "not a RIFF/AVI file"
    fps = 0
    compression = None
    frames_raw: list[bytes] = []

    def walk(buf: bytes):
        nonlocal fps, compression
        pos = 0
        while pos + 8 <= len(buf):
            tag = buf[pos : pos + 4]
            (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            payload = buf[pos + 8 : pos + 8 + ln]
            if tag == b"LIST":
                walk(payload[4:])  # skip list type fourcc, recurse
            elif tag == b"avih":
                # dwMicroSecPerFrame == 0 in a foreign/corrupt AVI must not
                # ZeroDivisionError past the codec's honest-seam contract
                uspf = struct.unpack("<I", payload[:4])[0]
                fps = 1_000_000 // uspf if uspf else 0
            elif tag == b"strf" and len(payload) >= 20:
                compression = payload[16:20]
            elif tag in (b"00dc", b"00db"):
                frames_raw.append(payload)
            pos += 8 + ln + (ln & 1)

    walk(data[12:])
    if compression is not None and compression not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"video compression {compression!r}: only MJPEG is decoded here — "
            "other codecs need a real decoder (ffmpeg)"
        )
    from . import jpegcodec

    return [jpegcodec.decode_baseline_jpeg(f) for f in frames_raw], fps


def synth_video(i: int, n_frames: int = 6, size: int = 24) -> list[np.ndarray]:
    """Deterministic frame sequence: the seeded base image of clip ``i``
    translated one pixel per frame (real motion for frame-diff kernels)."""
    from . import synth

    base = synth.pixels_for(i, size)
    return [np.roll(base, shift=f, axis=1) for f in range(n_frames)]
