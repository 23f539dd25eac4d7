"""Pure-numpy PNG codec + box rasterizer (kernels for P12/K7 and S10).

No PIL in this container, and none needed: PNG is zlib (stdlib) around
filtered scanlines. ``encode``/``decode`` implement the spec subset the
pipeline produces and consumes — 8-bit greyscale / RGB / RGBA, non-interlaced,
all five scanline filters on decode, filter-0 on encode. ``draw_boxes``
reproduces the reference's annotation semantics (processing.py:366-384:
relative box × image dims, closed 2-px green outline per instance) directly
on the pixel array.

These run executor-side inside Arrow batches (operators/annotate.py,
sources/rosbag_format.py) — the per-image work is numpy, never per-pixel
Python on the hot path (the sequential Sub/Average/Paeth defilters only touch
rows whose encoder chose those filters; our own encoder's output defilters
fully vectorized).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """uint8 array (h,w) | (h,w,1|2|3|4) → PNG bytes (filter 0, one IDAT)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, ch = arr.shape
    # prepend the per-scanline filter byte (0 = None) via a padded copy
    lines = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    lines[:, 1:] = arr.reshape(h, w * ch)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(lines.tobytes(), compress_level))
        + _chunk(b"IEND", b"")
    )


def _defilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering (spec filters 0-4) → (h, stride) bytes."""
    lines = raw.reshape(h, 1 + stride)
    filters = lines[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.intp)
    for y in range(h):
        f = filters[y]
        cur = lines[y, 1:].astype(np.intp)
        if f == 0:  # None
            rec = cur
        elif f == 1:  # Sub: sequential in x with stride bpp → cumsum per lane
            lanes = cur.reshape(-1, bpp)
            rec = np.cumsum(lanes, axis=0).reshape(stride)
        elif f == 2:  # Up
            rec = cur + prior
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.intp)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (cur[x] + ((a + prior[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.intp)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        rec &= 0xFF
        out[y] = rec
        prior = rec
    return out


def decode(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h,w) for greyscale, (h,w,ch) otherwise.

    Supports 8-bit depth, color types 0/2/4/6, non-interlaced (what this
    pipeline and the reference's image_saver PNGs use); palette/16-bit raise.
    """
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, [], None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={ctype}, interlace={interlace})"
        )
    ch = _CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * ch
    if raw.size != h * (1 + stride):
        raise ValueError("PNG scanline size mismatch")
    out = _defilter(raw, h, stride, ch)
    arr = out.reshape(h, w, ch)
    return arr[:, :, 0] if ch == 1 else arr


GREEN = (0, 212, 0)  # '#00d400' (processing.py:384)


def draw_boxes(
    arr: np.ndarray,
    boxes: list[tuple[float, float, float, float]],
    color: tuple[int, int, int] = GREEN,
) -> np.ndarray:
    """Draw closed 2-px box outlines on an (h,w,3+) uint8 image.

    ``boxes`` are *relative* (Left, Top, Width, Height) fractions à la
    Rekognition; scaling by the image dims happens here, matching
    processing.py:370-375. Rasterization reproduces PIL
    ``draw.line(points, width=2)`` on an axis-aligned closed outline
    pixel-exactly (verified against the reference's
    ``outputs/left0193_labeled.png``): each edge spans
    ``[int(lo), int(hi)]`` along its length, and its 2-px thickness falls
    on the side determined by the draw direction of the closed path
    (L,T)→(R,T)→(R,B)→(L,B)→(L,T) — rightward → rows ``int(y)..int(y)+1``,
    downward → cols ``int(x)..int(x)+1``, leftward → rows
    ``int(y)-1..int(y)``, upward → cols ``int(x)-1..int(x)``.
    Returns a mutated copy.
    """
    img = arr.copy()
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=2)
    h, w = img.shape[:2]
    ch = img.shape[2]
    if ch >= 3:
        # pad with opaque alpha for RGBA — a 3-vector assigned into an
        # (…,4) image is a numpy broadcast error, and the codec itself
        # decodes color type 6 to 4 channels
        col = np.array(
            (list(color) + [255] * (ch - 3))[:ch], dtype=np.uint8
        )
    else:
        # grey(+alpha): draw the color's luma so the box is visible
        luma = int(0.299 * color[0] + 0.587 * color[1] + 0.114 * color[2])
        col = np.array(([luma] + [255])[:ch], dtype=np.uint8)

    def span(lo: int, hi: int, limit: int) -> slice:  # inclusive, clipped
        return slice(max(0, lo), min(limit, hi + 1))

    for left, top, bw, bh in boxes:
        x0, y0 = int(left * w), int(top * h)
        x1, y1 = int((left + bw) * w), int((top + bh) * h)
        xs, ys = span(x0, x1, w), span(y0, y1, h)
        img[span(y0, y0 + 1, h), xs] = col  # top, drawn rightward
        img[ys, span(x1, x1 + 1, w)] = col  # right, drawn downward
        img[span(y1 - 1, y1, h), xs] = col  # bottom, drawn leftward
        img[ys, span(x0 - 1, x0, w)] = col  # left, drawn upward
    return img
