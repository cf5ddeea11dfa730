"""Pure-Python GIF87a/GIF89a codec (CompuServe spec / W3C GIF89a).

Why: after JPEG (baseline+progressive+subsampling+grayscale) and full-
profile PNG, GIF is the remaining top-3 web image container a 100 TB
crawl actually contains. This decodes the complete static + animated
profile:

- LZW decompression with variable code width (3..12 bits, LSB-first),
  CLEAR/END codes, deferred-clear streams, the next_code==code case
- global and local color tables, any depth 1..8
- GIF interlace (the 4-pass row shuffle — distinct from PNG's Adam7)
- GIF89a extensions: graphic control (transparency index, disposal
  methods 0/1/2/3), application/comment/plain-text blocks skipped
- multi-frame animations composited to full-canvas RGB frames (the shape
  the frame-sampling operator feeds downstream, mirroring the MJPEG-AVI
  path in ``avicodec.py``)

And encodes it (for fabricating test vectors without PIL): LZW with
table-full CLEAR emission, optional interlace, per-frame local palettes,
transparency and delays.

Decoded frames are uint8 (h, w, 3) RGB over the logical screen. A
transparent pixel with nothing beneath it shows the background color
(the global-palette background index, or black without a global table) —
deterministic, and what most renderers do.

Torn-file contract: truncated streams, bad LZW codes, and out-of-range
palette indices raise ValueError rather than yielding wrong pixels (same
contract as jpegcodec/pngcodec).

Runs only inside Arrow-batched ``mapInPandas`` tasks
(``operators/multimodal.py``); nothing here touches the driver.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """Decode a GIF LZW stream (already de-sub-blocked) to ``expected``
    palette indices."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"GIF: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(expected, np.uint8)
    n_out = 0
    # bit reader state (LSB-first)
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream truncated (no END code)")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"GIF: invalid LZW code {code}")
        if n_out + len(entry) > expected:
            raise ValueError("GIF: LZW output exceeds image size")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, np.uint8)
        n_out += len(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out != expected:
        raise ValueError(f"GIF: LZW decoded {n_out} pixels, expected {expected}")
    return out


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Encode palette indices as a GIF LZW stream (not yet sub-blocked)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, width)
    w = b""
    codes_since_clear = 0
    for k in indices.tobytes():
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        codes_since_clear += 1
        if next_code < 4096:
            table[wk] = next_code
            # decoder grows width when its table length reaches 1<<width;
            # its table length == next_code here, so mirror exactly
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
            codes_since_clear = 0
        w = bytes([k])
    if w:
        emit(table[w], width)
        # the decoder adds one more table entry while processing this final
        # code (its adds lag the encoder's by one code); if that entry lands
        # on 1<<width the decoder reads END one bit wider — mirror the bump
        if (
            codes_since_clear > 0
            and next_code <= 4096
            and next_code == (1 << width)
            and width < 12
        ):
            width += 1
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container decode
# ---------------------------------------------------------------------------


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(data):
            raise ValueError("GIF: sub-blocks truncated")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        if pos + n > len(data):
            raise ValueError("GIF: sub-block truncated")
        parts.append(data[pos : pos + n])
        pos += n


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace: rows stored pass-by-pass (0::8, 4::8, 2::4,
    1::2) -> natural order."""
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        n = len(range(start, h, step))
        out[start::step] = rows[src : src + n]
        src += n
    return out


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """Decode all frames, composited to full-canvas (h, w, 3) RGB uint8
    arrays (disposal methods 0/1 keep, 2 restore-background, 3 restore-
    previous; transparency composites over the prior canvas)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("GIF: header truncated")
    w, h, packed, bg_idx, _aspect = struct.unpack("<HHBBB", data[6:13])
    if w == 0 or h == 0:
        raise ValueError("GIF: zero dimension")
    pos = 13
    gct: np.ndarray | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        if len(gct) != n:
            raise ValueError("GIF: global color table truncated")
        pos += 3 * n

    if gct is not None and bg_idx < len(gct):
        bg = gct[bg_idx]
    else:
        bg = np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg, (h, w, 3)).astype(np.uint8).copy()

    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    saw_trailer = False
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            saw_trailer = True
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("GIF: extension truncated")
            label = data[pos]
            pos += 1
            payload, pos = _read_subblocks(data, pos)
            if label == 0xF9:  # graphic control
                if len(payload) < 4:
                    raise ValueError("GIF: bad graphic control block")
                flags = payload[0]
                disposal = (flags >> 2) & 0x07
                transparent = payload[3] if flags & 0x01 else None
            # 0xFF application (NETSCAPE loop), 0xFE comment, 0x01 plain
            # text: skipped — they carry no pixels
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(data):
            raise ValueError("GIF: image descriptor truncated")
        il, it, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if iw == 0 or ih == 0 or il + iw > w or it + ih > h:
            raise ValueError("GIF: frame rectangle outside logical screen")
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                raise ValueError("GIF: local color table truncated")
            lct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
            pal = lct
        elif gct is not None:
            pal = gct
        else:
            raise ValueError("GIF: frame with no color table")
        if pos >= len(data):
            raise ValueError("GIF: image data truncated")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = lzw_decode(lzw, mcs, iw * ih).reshape(ih, iw)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF: palette index out of range")

        saved = canvas.copy() if disposal == 3 else None
        region = canvas[it : it + ih, il : il + iw]
        rgb = pal[idx]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background
            canvas[it : it + ih, il : il + iw] = bg
        elif disposal == 3 and saved is not None:  # restore to previous
            canvas = saved
        disposal = 0
        transparent = None
    if not saw_trailer:
        raise ValueError("GIF: missing trailer (torn file?)")
    if not frames:
        raise ValueError("GIF: no image data")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) RGB — the static-image view."""
    return decode_gif_frames(data)[0]


# ---------------------------------------------------------------------------
# container encode (test-vector fabrication; also a real writer)
# ---------------------------------------------------------------------------


def _palette_for(frames_rgb: list[np.ndarray]) -> tuple[np.ndarray, list[np.ndarray]]:
    """Exact global palette over all frames (raises above 256 colors —
    this writer fabricates vectors, it does not quantize)."""
    flat = np.concatenate([f.reshape(-1, 3) for f in frames_rgb])
    pal, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"GIF encode: {len(pal)} colors > 256 (quantize first)")
    idx_frames = []
    off = 0
    for f in frames_rgb:
        n = f.shape[0] * f.shape[1]
        idx_frames.append(
            inverse[off : off + n].astype(np.uint8).reshape(f.shape[:2])
        )
        off += n
    return pal.astype(np.uint8), idx_frames


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _interlace_rows(idx: np.ndarray) -> np.ndarray:
    return np.concatenate([idx[start::step] for start, step in _INTERLACE_PASSES])


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    *,
    interlace: bool = False,
    transparent_index: int | None = None,
    disposal: int = 0,
    delay_cs: int = 4,
    indexed_palette: np.ndarray | None = None,
) -> bytes:
    """Encode RGB frame(s) (each (h,w,3) uint8, same shape) — or, when
    ``indexed_palette`` is given, (h,w) index frames — as GIF89a with a
    global color table."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if indexed_palette is not None:
        pal = np.asarray(indexed_palette, np.uint8)
        idx_frames = [np.asarray(f, np.uint8) for f in frames]
    else:
        pal, idx_frames = _palette_for([np.asarray(f, np.uint8) for f in frames])
    h, w = idx_frames[0].shape
    depth = max(1, int(len(pal) - 1).bit_length())
    table_n = 1 << depth
    full_pal = np.zeros((table_n, 3), np.uint8)
    full_pal[: len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += full_pal.tobytes()
    animated = len(idx_frames) > 1
    for idx in idx_frames:
        if animated or transparent_index is not None:
            flags = (disposal & 0x07) << 2
            tidx = 0
            if transparent_index is not None:
                flags |= 0x01
                tidx = transparent_index
            out += b"\x21\xf9" + _sub_blocks(
                struct.pack("<BHB", flags, delay_cs, tidx)
            )
        out += struct.pack(
            "<BHHHHB", 0x2C, 0, 0, idx.shape[1], idx.shape[0],
            0x40 if interlace else 0,
        )
        mcs = max(2, depth)
        rows = _interlace_rows(idx) if interlace else idx
        out.append(mcs)
        out += _sub_blocks(lzw_encode(rows.reshape(-1), mcs))
    out.append(0x3B)
    return bytes(out)
