"""Minimal pure-stdlib baseline-TIFF decoder (public spec: TIFF 6.0),
covering the reference's shipped fixtures (land_shallow_topo_2048.tif:
big-endian, strip-based, LZW + horizontal-differencing predictor).

Scope: 8-bit samples, chunky planar config, strip-based storage,
compression 1 (none) or 5 (TIFF-LZW with early code-size change),
predictor 1 (none) or 2 (horizontal differencing).  Anything else
raises with a clear message.

Decoding the same image from .tif (LZW) and .png (DEFLATE+filters)
and getting byte-equal pixels is the cross-codec correctness check in
tests/test_warp.py — two independent compression schemes cannot agree
by accident.
"""

from __future__ import annotations

import struct

import numpy as np


def is_tiff(data: bytes) -> bool:
    return data[:4] in (b"II*\x00", b"MM\x00*")


def _lzw_decode(data: bytes, expected: int) -> bytearray:
    """TIFF-variant LZW: MSB-first bit packing, 9->12 bit codes,
    Clear=256, EOI=257, EARLY code-size change (TIFF 6.0 §13)."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return out
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 256:  # Clear
            reset()
            prev = None
            continue
        if code == 257:  # EndOfInformation
            return out
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        # early change: bump width one code BEFORE the table fills
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            return out


def decode_tiff(data: bytes) -> np.ndarray:
    if not is_tiff(data):
        raise ValueError("not a TIFF (bad magic)")
    bo = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    (n_entries,) = struct.unpack(bo + "H", data[ifd_off: ifd_off + 2])
    tags: dict[int, list[int]] = {}
    _SZ = {1: 1, 3: 2, 4: 4}
    _FMT = {1: "B", 3: "H", 4: "I"}
    for i in range(n_entries):
        e = data[ifd_off + 2 + i * 12: ifd_off + 14 + i * 12]
        tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
        if typ not in _SZ:
            continue
        total = _SZ[typ] * cnt
        raw = e[8: 8 + total] if total <= 4 else None
        if raw is None:
            (voff,) = struct.unpack(bo + "I", e[8:12])
            raw = data[voff: voff + total]
        tags[tag] = list(struct.unpack(bo + _FMT[typ] * cnt, raw))

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    width, height = one(256), one(257)
    compression = one(259, 1)
    spp = one(277, 1)
    predictor = one(317, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bit depths {bits}")
    if compression not in (1, 5):
        raise ValueError(f"unsupported TIFF compression {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if one(284, 1) != 1:
        raise ValueError("planar TIFF unsupported")
    rows_per_strip = one(278, height)
    offsets = tags[273]
    counts = tags[279]

    stride = width * spp
    out = np.empty((height, stride), dtype=np.uint8)
    row = 0
    for off, cnt in zip(offsets, counts):
        nrows = min(rows_per_strip, height - row)
        chunk = data[off: off + cnt]
        if compression == 5:
            raw = bytes(_lzw_decode(chunk, nrows * stride))
        else:
            raw = chunk
        arr = np.frombuffer(raw[: nrows * stride], dtype=np.uint8).reshape(
            nrows, stride
        )
        out[row: row + nrows] = arr
        row += nrows
    if predictor == 2:  # horizontal differencing: per-channel row cumsum
        px = out.reshape(height, width, spp)
        px = np.cumsum(px, axis=1, dtype=np.uint64).astype(np.uint8)
        out = px.reshape(height, stride)
    if spp == 1:
        return out.reshape(height, width).copy()
    return out.reshape(height, width, spp).copy()
