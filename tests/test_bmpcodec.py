"""BMP codec: round-trips through our writers, hand-built vectors for the
layouts the writer can't produce (1/4-bit, 16-bit bitfields, 32-bit,
top-down, RLE), and torn-file contracts."""

import struct

import numpy as np
import pytest

from pii_detection_service_spark.sources import bmpcodec, imagecodec


def _px(h=7, w=5, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _dib(w, h, bpp, comp, body_len, n_colors=0):
    return struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, comp, body_len, 2835, 2835,
        n_colors, 0,
    )


def _file(dib, extra, body):
    offset = 14 + len(dib) + len(extra)
    return (
        struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
        + dib
        + extra
        + body
    )


def test_roundtrip_24bit():
    px = _px()
    assert np.array_equal(bmpcodec.decode_bmp(bmpcodec.encode_bmp(px)), px)


def test_roundtrip_24bit_odd_width_padding():
    for w in (1, 2, 3, 5):  # strides 4, 8, 12, 16 — padding 1..3 bytes
        px = _px(w=w)
        got = bmpcodec.decode_bmp(bmpcodec.encode_bmp(px))
        assert np.array_equal(got, px), w


def test_roundtrip_8bit_palette():
    px = (_px() >> 6) << 6  # ≤ 64 distinct colors
    got = bmpcodec.decode_bmp(bmpcodec.encode_bmp(px, palette=True))
    assert np.array_equal(got, px)


def test_palette_overflow_raises():
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="distinct colors"):
        bmpcodec.encode_bmp(px, palette=True)


def test_1bit_handbuilt():
    # 2 rows × 10 px, bottom-up: row bits packed MSB-first into 4-byte rows
    pal = bytes([0, 0, 0, 0, 255, 255, 255, 0])  # black, white (BGRA)
    top = "1010101010"
    bot = "0101010101"
    def rowbytes(bits):
        b = int(bits.ljust(32, "0"), 2).to_bytes(4, "big")
        return b
    body = rowbytes(bot) + rowbytes(top)  # bottom-up storage
    data = _file(_dib(10, 2, 1, 0, len(body), 2), pal, body)
    got = bmpcodec.decode_bmp(data)
    assert got.shape == (2, 10, 3)
    assert [int(v) for v in got[0, :, 0]] == [255, 0] * 5
    assert [int(v) for v in got[1, :, 0]] == [0, 255] * 5


def test_4bit_handbuilt():
    # 1 row × 3 px, indices 1,2,3 → nibbles 0x12, 0x30, padded to 4 bytes
    pal = bytes(
        [0, 0, 0, 0, 10, 11, 12, 0, 20, 21, 22, 0, 30, 31, 32, 0]
    )  # BGRA entries
    body = bytes([0x12, 0x30, 0, 0])
    data = _file(_dib(3, 1, 4, 0, len(body), 4), pal, body)
    got = bmpcodec.decode_bmp(data)
    # palette entry k is (B,G,R) = (10k, 10k+1, 10k+2) → RGB reversed
    assert got.tolist() == [[[12, 11, 10], [22, 21, 20], [32, 31, 30]]]


def test_16bit_565_bitfields():
    # one pixel, pure green in 565: mask 0x07E0, value 0x07E0 → G=255
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    body = struct.pack("<HH", 0x07E0, 0)  # padded to 4 bytes
    data = _file(_dib(1, 1, 16, 3, len(body)), masks, body)
    got = bmpcodec.decode_bmp(data)
    assert got.tolist() == [[[0, 255, 0]]]


def test_32bit_bgra_bitfields_keeps_alpha():
    masks = struct.pack("<IIII", 0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000)
    dib = struct.pack(
        "<IiiHHIIiiII", 108, 1, 1, 1, 32, 3, 4, 2835, 2835, 0, 0
    ) + masks + bytes(108 - 40 - 16)
    body = bytes([10, 20, 30, 200])  # B=10 G=20 R=30 A=200
    data = _file(dib, b"", body)
    got = bmpcodec.decode_bmp(data)
    assert got.shape == (1, 1, 4)
    assert got.tolist() == [[[30, 20, 10, 200]]]


def test_32bit_bi_rgb_drops_reserved_byte():
    body = bytes([10, 20, 30, 99])
    data = _file(_dib(1, 1, 32, 0, 4), b"", body)
    assert bmpcodec.decode_bmp(data).tolist() == [[[30, 20, 10]]]


def test_top_down_height_negative():
    px = _px(h=3, w=2)
    # rebuild the encoder's output as top-down: negate height, un-flip rows
    enc = bmpcodec.encode_bmp(px)
    stride = (2 * 3 + 3) & ~3
    body = enc[54:]
    rows = np.frombuffer(body, np.uint8).reshape(3, stride)[::-1].tobytes()
    data = _file(_dib(2, -3, 24, 0, len(rows)), b"", rows)
    assert np.array_equal(bmpcodec.decode_bmp(data), px)


def test_rle8_runs_delta_eol_eob():
    """4×3: encoded runs, a delta jump, EOL markers, EOB. Stored rows
    (bottom-up): row0 = [1,1,1,2], row1 = [3,3,0,0], row2 = [3,0,0,0]."""
    pal = b"".join(bytes([k, k, k, 0]) for k in range(4))
    rle = bytes(
        [
            3, 1, 1, 2, 0, 0,      # run 3×1, run 1×2, EOL
            2, 3, 0, 2, 2, 0, 0, 0,  # run 2×3, delta (+2,+0), EOL
            1, 3, 0, 1,            # run 1×3, EOB
        ]
    )
    data = _file(_dib(4, 3, 8, bmpcodec.BI_RLE8, len(rle), 4), pal, rle)
    got = bmpcodec.decode_bmp(data)
    assert got.shape == (3, 4, 3)
    assert got[2, :, 0].tolist() == [1, 1, 1, 2]
    assert got[1, :, 0].tolist() == [3, 3, 0, 0]
    assert got[0, :, 0].tolist() == [3, 0, 0, 0]


def test_rle8_absolute_mode_word_aligned():
    """Absolute run of 3 literal indices is padded to a 2-byte boundary."""
    pal = b"".join(bytes([k, k, k, 0]) for k in range(8))
    rle = bytes(
        [
            0, 3, 5, 6, 7, 0,  # absolute [5,6,7] + 1 pad byte
            1, 4,              # run 1×4
            0, 1,              # EOB
        ]
    )
    data = _file(_dib(4, 1, 8, bmpcodec.BI_RLE8, len(rle), 8), pal, rle)
    got = bmpcodec.decode_bmp(data)
    assert got[0, :, 0].tolist() == [5, 6, 7, 4]


def test_rle4_run_nibble_alternation():
    pal = b"".join(bytes([k, k, k, 0]) for k in range(16))
    rle = bytes([5, 0x12, 0, 0, 0, 1])  # run of 5 alternating 1,2 → 1 2 1 2 1
    data = _file(_dib(5, 1, 4, bmpcodec.BI_RLE4, len(rle), 16), pal, rle)
    got = bmpcodec.decode_bmp(data)
    assert got[0, :, 0].tolist() == [1, 2, 1, 2, 1]


def test_truncated_body_raises():
    enc = bmpcodec.encode_bmp(_px())
    with pytest.raises(ValueError, match="truncated"):
        bmpcodec.decode_bmp(enc[:-5])


def test_not_bmp_raises():
    with pytest.raises(ValueError, match="not a BMP"):
        bmpcodec.decode_bmp(b"PK\x03\x04" + bytes(60))


def test_imagecodec_dispatch():
    px = _px()
    assert np.array_equal(
        imagecodec.decode(bmpcodec.encode_bmp(px), "bmp"), px
    )
