"""Pure-Python BMP (Windows bitmap) codec — the legacy-crawl container.

Old web corpora carry a long tail of BMPs (scanner output, 90s-era sites,
Windows screenshots). The format is simple enough to support COMPLETELY
for the static-image profile a crawl contains:

decode: BITMAPINFOHEADER / V4 / V5 headers; 1/4/8-bit palette, 16-bit
(555/565 via BI_BITFIELDS), 24-bit BGR and 32-bit BGRX/BGRA; BI_RGB,
BI_BITFIELDS, and RLE8/RLE4 compression; bottom-up and top-down rows;
4-byte row padding. Truncated or inconsistent files raise ValueError —
never silently-wrong pixels (the same contract as the other codecs).

encode: 24-bit BI_RGB (the universal writer) plus 8-bit palette, for
fabricating test vectors of the layouts the decoder must read.

Reference parity note: the reference service (lendl-uy/pii-detection-service)
has no image pipeline at all; this codec exists for the north rule's
decoded-pixel invariant over crawl-shaped inputs.
"""

from __future__ import annotations

import struct

import numpy as np

BI_RGB, BI_RLE8, BI_RLE4, BI_BITFIELDS = 0, 1, 2, 3


def encode_bmp(pixels: np.ndarray, palette: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → BMP bytes. Default 24-bit BI_RGB bottom-up;
    ``palette=True`` writes 8-bit indexed (requires ≤ 256 distinct
    colors — raises otherwise, it is a test-vector fabricator not a
    quantizer)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    if palette:
        flat = pixels.reshape(-1, 3)
        colors, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError(f"{len(colors)} distinct colors > 256")
        pal = np.zeros((256, 4), np.uint8)
        pal[: len(colors), 0] = colors[:, 2]  # BGRA order, A unused
        pal[: len(colors), 1] = colors[:, 1]
        pal[: len(colors), 2] = colors[:, 0]
        idx = inv.reshape(h, w).astype(np.uint8)
        stride = (w + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w] = idx
        body = rows[::-1].tobytes()  # bottom-up
        bpp, pal_bytes, n_colors = 8, pal.tobytes(), 256
    else:
        bgr = pixels[:, :, ::-1]
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        body = rows[::-1].tobytes()
        bpp, pal_bytes, n_colors = 24, b"", 0
    offset = 14 + 40 + len(pal_bytes)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, BI_RGB, len(body), 2835, 2835,
        n_colors, 0,
    )
    head = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    return head + info + pal_bytes + body


def _bitfields(mask: int) -> tuple[int, int]:
    """(shift, max_value) for one channel mask; 0-mask → (0, 0)."""
    if mask == 0:
        return 0, 0
    shift = (mask & -mask).bit_length() - 1
    return shift, mask >> shift


def _apply_mask(vals: np.ndarray, mask: int) -> np.ndarray:
    shift, mx = _bitfields(mask)
    if mx == 0:
        return np.zeros(vals.shape, np.uint8)
    ch = (vals >> shift) & mx
    # scale to 0..255 (round-half-up integer scaling)
    return ((ch.astype(np.uint32) * 255 + mx // 2) // mx).astype(np.uint8)


def _decode_rle(data: bytes, w: int, h: int, four_bit: bool) -> np.ndarray:
    """RLE8/RLE4 → (h, w) index array (top-down already applied)."""
    out = np.zeros((h, w), np.uint8)
    x, y, i = 0, 0, 0
    while i + 2 <= len(data) and y < h:
        n, v = data[i], data[i + 1]
        i += 2
        if n > 0:  # encoded run
            if four_bit:
                pair = [(v >> 4) & 0xF, v & 0xF]
                for k in range(n):
                    if x < w:
                        out[y, x] = pair[k & 1]
                        x += 1
            else:
                end = min(x + n, w)
                out[y, x:end] = v
                x = min(x + n, w)
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            return out[::-1]
        elif v == 2:  # delta
            if i + 2 > len(data):
                raise ValueError("truncated RLE delta")
            x += data[i]
            y += data[i + 1]
            i += 2
        else:  # absolute mode: v literal indices, word-aligned
            if four_bit:
                nbytes = (v + 1) // 2
                chunk = data[i : i + nbytes]
                if len(chunk) < nbytes:
                    raise ValueError("truncated RLE absolute run")
                for k in range(v):
                    b = chunk[k // 2]
                    if x < w:
                        out[y, x] = (b >> 4) & 0xF if k % 2 == 0 else b & 0xF
                        x += 1
                i += nbytes + (nbytes & 1)
            else:
                chunk = data[i : i + v]
                if len(chunk) < v:
                    raise ValueError("truncated RLE absolute run")
                end = min(x + v, w)
                out[y, x:end] = np.frombuffer(chunk[: end - x], np.uint8)
                x = min(x + v, w)
                i += v + (v & 1)
    return out[::-1]  # stored bottom-up


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → uint8 (h, w, 3) RGB, or (h, w, 4) RGBA when a
    BI_BITFIELDS alpha mask is present. Raises ValueError on anything
    malformed or truncated."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP file")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size} (OS/2?)")
    w, h_raw, planes, bpp, comp, _sz = struct.unpack_from(
        "<iiHHII", data, 18
    )
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0 or planes != 1:
        raise ValueError("bad BMP dimensions")
    n_colors = struct.unpack_from("<I", data, 46)[0]
    masks = (0, 0, 0, 0)
    if comp == BI_BITFIELDS:
        if hdr_size >= 56:  # V4/V5 carry masks inside the header
            masks = struct.unpack_from("<IIII", data, 54)
        else:  # BITMAPINFOHEADER: 3 masks follow the header
            masks = struct.unpack_from("<III", data, 14 + hdr_size) + (0,)
    pal = None
    if bpp <= 8:
        n = n_colors or (1 << bpp)
        pal_off = 14 + hdr_size + (
            12 if comp == BI_BITFIELDS and hdr_size == 40 else 0
        )
        raw = data[pal_off : pal_off + 4 * n]
        if len(raw) < 4 * n:
            raise ValueError("truncated palette")
        pal = np.frombuffer(raw, np.uint8).reshape(n, 4)[:, [2, 1, 0]]

    body = data[offset:]
    if comp in (BI_RLE8, BI_RLE4):
        if (comp == BI_RLE8 and bpp != 8) or (comp == BI_RLE4 and bpp != 4):
            raise ValueError("RLE compression / bpp mismatch")
        if top_down:
            raise ValueError("RLE BMPs cannot be top-down")
        idx = _decode_rle(body, w, h, comp == BI_RLE4)
        return pal[idx]
    if comp not in (BI_RGB, BI_BITFIELDS):
        raise ValueError(f"unsupported BMP compression {comp}")

    stride = ((w * bpp + 31) // 32) * 4
    need = stride * h
    if len(body) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(body[:need], np.uint8).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]

    if bpp in (1, 4, 8):
        if bpp == 8:
            idx = rows[:, :w]
        elif bpp == 4:
            nib = np.repeat(rows, 2, axis=1)
            nib[:, 0::2] >>= 4
            nib[:, 1::2] &= 0xF
            idx = nib[:, :w]
        else:
            bits = np.unpackbits(rows, axis=1)
            idx = bits[:, :w]
        if pal is None or idx.max() >= len(pal):
            raise ValueError("palette index out of range")
        return pal[idx]
    if bpp == 16:
        vals = rows[:, : w * 2].copy().view("<u2").reshape(h, w).astype(np.uint32)
        rm, gm, bm, am = masks if comp == BI_BITFIELDS else (0x7C00, 0x3E0, 0x1F, 0)
        chans = [_apply_mask(vals, m) for m in (rm, gm, bm)]
        if am:
            chans.append(_apply_mask(vals, am))
        return np.stack(chans, axis=-1)
    if bpp == 24:
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        return np.ascontiguousarray(bgr[:, :, ::-1])
    if bpp == 32:
        px = rows[:, : w * 4].reshape(h, w, 4).astype(np.uint32)
        if comp == BI_BITFIELDS:
            vals = (
                px[..., 0]
                | (px[..., 1] << 8)
                | (px[..., 2] << 16)
                | (px[..., 3] << 24)
            )
            rm, gm, bm, am = masks
            chans = [_apply_mask(vals, m) for m in (rm, gm, bm)]
            if am:
                chans.append(_apply_mask(vals, am))
            return np.stack(chans, axis=-1)
        # BI_RGB: BGRX — the 4th byte is reserved padding, opaque image
        bgr = px[..., :3].astype(np.uint8)
        return np.ascontiguousarray(bgr[:, :, ::-1])
    raise ValueError(f"unsupported BMP bit depth {bpp}")
