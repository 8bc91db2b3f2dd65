"""Pure-stdlib PNG decoder (public spec: RFC 2083 / W3C PNG), so the
reference's real raster fixtures (land_shallow_topo_2048.png + .wld,
used by reference tests/test_image_warp.py and the README warp
doctests) run end-to-end without PIL.

Scope: 8-bit samples, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced.  That covers every PNG the
reference repo ships; anything else raises with a clear message.

Decode path: chunk walk -> concatenated-IDAT zlib inflate -> per-
scanline unfilter (the five spec filters).  Filters 0/1/2 are fully
vectorized (filter 1 as a per-channel uint8 cumulative sum); filters
3/4 (Average/Paeth) need the left neighbor sequentially and fall back
to a per-byte loop for those rows only.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _SIGNATURE


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters in place; returns (h, stride)
    uint8 of reconstructed bytes."""
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for r in range(height):
        ftype = int(raw[pos])
        line = raw[pos + 1: pos + 1 + stride].copy()
        pos += 1 + stride
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub: per-channel cumulative sum mod 256
            cur = line
            for off in range(bpp):
                cur[off::bpp] = np.cumsum(
                    cur[off::bpp], dtype=np.uint64
                ).astype(np.uint8)
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype == 3:  # Average (left-sequential)
            cur = line
            p = prev.astype(np.int32)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + ((left + int(p[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth (left-sequential)
            cur = line
            p = prev.astype(np.int32)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(p[i])
                c = int(p[i - bpp]) if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[r] = cur
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """-> uint8 array (h, w) for gray, (h, w, 3) RGB, (h, w, 4) RGBA
    (gray+alpha expands to RGBA like PIL's convert)."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    palette = None
    idat = []
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos: pos + 8])
        body = data[pos + 8: pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = _CHANNELS[color_type]
    stride = width * channels
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != height * (stride + 1):
        raise ValueError(
            f"PNG data size {raw.size} != expected {height * (stride + 1)}"
        )
    px = _unfilter(raw, height, stride, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        return palette[px.reshape(height, width)]
    if color_type == 0:
        return px.reshape(height, width).copy()
    if color_type == 4:  # gray+alpha -> RGBA
        ga = px.reshape(height, width, 2)
        g, a = ga[..., 0], ga[..., 1]
        return np.stack([g, g, g, a], axis=-1)
    return px.reshape(height, width, channels).copy()
