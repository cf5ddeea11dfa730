"""Real MJPEG-AVI video container: round-trip, structure, honest seams,
and the Spark frame-sampling operator over real AVI bytes."""

import struct

import numpy as np
import pytest

from pii_detection_service_spark.sources import avicodec, imagecodec, jpegcodec


def test_avi_roundtrip_frames_and_fps():
    frames = avicodec.synth_video(5)
    avi = avicodec.encode_avi_mjpeg(frames, fps=10, quality=98)
    dec, fps = avicodec.decode_avi_mjpeg(avi)
    assert fps == 10 and len(dec) == len(frames)
    for a, b in zip(frames, dec):
        assert a.shape == b.shape
        assert imagecodec.psnr(a, b) >= 40.0  # per-frame PSNR invariant


def test_avi_container_structure():
    avi = avicodec.encode_avi_mjpeg(avicodec.synth_video(1, n_frames=3))
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    (riff_len,) = struct.unpack("<I", avi[4:8])
    assert riff_len == len(avi) - 8
    # standard blocks all present, frame chunks carry real JPEG payloads
    for marker in (b"hdrl", b"avih", b"strh", b"strf", b"movi", b"idx1", b"MJPG"):
        assert marker in avi
    i = avi.index(b"00dc")
    (ln,) = struct.unpack("<I", avi[i + 4 : i + 8])
    jpeg = avi[i + 8 : i + 8 + ln]
    assert jpeg[:2] == b"\xff\xd8"
    assert jpegcodec.decode_baseline_jpeg(jpeg).shape == (24, 24, 3)


def test_non_mjpeg_compression_raises():
    avi = bytearray(avicodec.encode_avi_mjpeg(avicodec.synth_video(2, n_frames=2)))
    i = bytes(avi).index(b"strf")
    # biCompression sits 16 bytes into the strf payload (after 8-byte header)
    avi[i + 8 + 16 : i + 8 + 20] = b"H264"
    with pytest.raises(NotImplementedError, match="MJPEG"):
        avicodec.decode_avi_mjpeg(bytes(avi))


def test_spark_sample_frames_over_real_avi(spark):
    from pii_detection_service_spark.operators import multimodal

    rows = [
        (
            f"vid_{i}",
            avicodec.encode_avi_mjpeg(avicodec.synth_video(i, n_frames=6), quality=98),
        )
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = multimodal.sample_frames(df, every=2).collect()
    # 6 frames, every 2nd → indices 0, 2, 4 per video
    assert len(got) == 4 * 3
    assert {r["frame_idx"] for r in got} == {0, 2, 4}
    # sampled payloads are the true per-frame JPEGs: decode one and compare
    r0 = next(r for r in got if r["image_id"] == "vid_1" and r["frame_idx"] == 2)
    px = jpegcodec.decode_baseline_jpeg(bytes(r0["frame_bytes"]))
    truth = avicodec.synth_video(1, n_frames=6)[2]
    assert imagecodec.psnr(truth, px) >= 40.0
