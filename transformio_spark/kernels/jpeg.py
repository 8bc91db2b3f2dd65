"""Pure-stdlib baseline JPEG decoder (ITU-T T.81 / ISO 10918-1).

The reference loads its raster fixtures via PIL (reference
imwarp.py:92-96); every one of its scanned-map fixtures
(china_pol96.jpg, argentina_pol96.jpg, burkina_pol96.jpg,
satim-volcano.jpg, cloud_combined_2048.jpg) is a BASELINE sequential
JPEG (SOF0, 3-component YCbCr, 4:2:0 or 4:4:4, restart intervals).
PIL is unavailable in this sandbox, so this module implements exactly
that profile from the public spec:

- marker parse: DQT (8/16-bit), DHT, SOF0, DRI, SOS
- entropy decode: canonical Huffman via a 16-bit lookup table,
  byte-unstuffing, restart-marker segmentation with DC-predictor reset
- block reconstruct: dezigzag + dequantize (vectorized), orthonormal
  8x8 IDCT as two matrix multiplies over all blocks at once
- chroma upsample by pixel replication (DOCUMENTED DEVIATION:
  libjpeg's default "fancy" upsampling interpolates; replication can
  differ by a few levels along chroma edges), JFIF YCbCr -> RGB

Progressive (SOF2), arithmetic coding, and 12-bit precision are out
of profile and raise ValueError.

Decoding is Python-loop per Huffman symbol (inherently sequential)
with all per-pixel math vectorized — a 2k x 2k fixture decodes in
seconds, test/driver-side only; the distributed raster path works on
decoded arrays/tiles (operators/raster.py).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["is_jpeg", "decode_jpeg"]

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# orthonormal 8x8 DCT-II basis; spatial = C.T @ coeffs @ C
_K = np.arange(8, dtype=np.float64)
_DCT_C = np.cos((2.0 * _K[None, :] + 1.0) * _K[:, None] * np.pi / 16.0) * np.where(
    _K[:, None] == 0, np.sqrt(1.0 / 8.0), np.sqrt(2.0 / 8.0)
)


def is_jpeg(data: bytes) -> bool:
    return data[:2] == b"\xff\xd8"


def build_huffman_lut(bits, huffval):
    """Canonical Huffman (T.81 Annex C) -> 16-bit prefix LUT:
    lut_sym[peek16] = symbol, lut_len[peek16] = code length."""
    lut_sym = np.zeros(1 << 16, dtype=np.int16)
    lut_len = np.zeros(1 << 16, dtype=np.int8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = huffval[k]
            k += 1
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            lut_sym[lo:hi] = sym
            lut_len[lo:hi] = length
            code += 1
        code <<= 1
    return lut_sym, lut_len


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "coefs", "bw", "bh")


def _parse_segments(data: bytes):
    """Yield (marker, payload) up to SOS; return (segments, sos_offset)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (no SOI)")
    segs = []
    i = 2
    while i < len(data) - 1:
        if data[i] != 0xFF:
            raise ValueError(f"marker expected at {i}")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip them (advisor fix)
        while i + 1 < len(data) and data[i + 1] == 0xFF:
            i += 1
        m = data[i + 1]
        if m == 0x01 or 0xD0 <= m <= 0xD9:
            i += 2
            continue
        ln = struct.unpack(">H", data[i + 2 : i + 4])[0]
        segs.append((m, data[i + 4 : i + 2 + ln]))
        i += 2 + ln
        if m == 0xDA:
            return segs, i
    raise ValueError("no SOS marker")


def _entropy_segments(data: bytes, start: int):
    """Split entropy-coded data at restart markers; unstuff FF00."""
    segs = []
    seg_start = start
    i = start
    n = len(data)
    while True:
        j = data.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            segs.append(data[seg_start:n])
            break
        m = data[j + 1]
        if m == 0x00:
            i = j + 2
            continue
        if 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(data[seg_start:j])
            seg_start = j + 2
            i = j + 2
            continue
        segs.append(data[seg_start:j])  # EOI or next marker
        break
    return [s.replace(b"\xff\x00", b"\xff") for s in segs]


def _decode_blocks_segment(seg, mcu_ids, comps, scan_tables, out):
    """Decode one restart segment's MCUs.  ``out[ci]`` is a flat list
    (bh*bw entries) receiving 64-int zigzag coefficient lists.
    Pure-Python bit loop, LUT Huffman; all per-pixel math happens
    vectorized afterwards."""
    buf = 0
    nbits = 0
    pos = 0
    nseg = len(seg)
    preds = [0] * len(comps)

    for my, mx in mcu_ids:
        for ci, (comp, (dc_sym, dc_len, ac_sym, ac_len)) in enumerate(
            zip(comps, scan_tables)
        ):
            for by in range(comp.v):
                for bx in range(comp.h):
                    block = [0] * 64
                    out[ci][(my * comp.v + by) * comp.bw + mx * comp.h + bx] = block
                    # --- DC ---
                    while nbits < 16:
                        buf = (buf << 8) | (seg[pos] if pos < nseg else 0)
                        pos += 1
                        nbits += 8
                    peek = (buf >> (nbits - 16)) & 0xFFFF
                    s = dc_sym[peek]
                    nbits -= dc_len[peek]
                    if s:
                        while nbits < s:
                            buf = (buf << 8) | (seg[pos] if pos < nseg else 0)
                            pos += 1
                            nbits += 8
                        v = (buf >> (nbits - s)) & ((1 << s) - 1)
                        nbits -= s
                        if v < (1 << (s - 1)):
                            v -= (1 << s) - 1
                    else:
                        v = 0
                    preds[ci] += v
                    block[0] = preds[ci]
                    # --- AC ---
                    k = 1
                    while k < 64:
                        while nbits < 16:
                            buf = (buf << 8) | (seg[pos] if pos < nseg else 0)
                            pos += 1
                            nbits += 8
                        peek = (buf >> (nbits - 16)) & 0xFFFF
                        rs = ac_sym[peek]
                        nbits -= ac_len[peek]
                        r = rs >> 4
                        s = rs & 15
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        while nbits < s:
                            buf = (buf << 8) | (seg[pos] if pos < nseg else 0)
                            pos += 1
                            nbits += 8
                        v = (buf >> (nbits - s)) & ((1 << s) - 1)
                        nbits -= s
                        if v < (1 << (s - 1)):
                            v -= (1 << s) - 1
                        if k < 64:
                            block[k] = v
                        k += 1
                    buf &= (1 << nbits) - 1  # keep the int buffer small


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8 (h, w, 3) RGB, or (h, w) for
    single-component (grayscale) streams."""
    segs, sos_end = _parse_segments(bytes(data))

    qt = {}
    dc_luts = {}
    ac_luts = {}
    restart_interval = 0
    sof = None
    sos = None

    for m, payload in segs:
        if m == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 15
                p += 1
                if pq:
                    tbl = np.frombuffer(payload, dtype=">u2", count=64, offset=p)
                    p += 128
                else:
                    tbl = np.frombuffer(payload, dtype=np.uint8, count=64, offset=p)
                    p += 64
                qt[tq] = tbl.astype(np.int32)
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 15
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                huffval = list(payload[p + 17 : p + 17 + nv])
                lut = build_huffman_lut(bits, huffval)
                (dc_luts if tc == 0 else ac_luts)[th] = lut
                p += 17 + nv
        elif m == 0xC0:  # SOF0 baseline
            sof = payload
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process SOF{m - 0xC0} (baseline SOF0 only)"
            )
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif m == 0xDA:  # SOS
            sos = payload

    if sof is None:
        raise ValueError("no SOF0 frame header")
    if sof[0] != 8:
        raise ValueError("only 8-bit precision supported")
    h, w = struct.unpack(">HH", sof[1:5])
    nc = sof[5]
    comps = []
    for c in range(nc):
        comp = _Component()
        comp.cid = sof[6 + c * 3]
        comp.h = sof[7 + c * 3] >> 4
        comp.v = sof[7 + c * 3] & 15
        comp.tq = sof[8 + c * 3]
        comps.append(comp)
    if nc == 1:
        # T.81 A.2.2: a single-component scan is non-interleaved —
        # one 8x8 block per MCU regardless of declared sampling
        comps[0].h = comps[0].v = 1
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)

    ns = sos[0]
    if ns != nc:
        raise ValueError("multi-scan (non-interleaved) streams unsupported")
    by_id = {c.cid: c for c in comps}
    for s in range(ns):
        comp = by_id[sos[1 + s * 2]]
        comp.td = sos[2 + s * 2] >> 4
        comp.ta = sos[2 + s * 2] & 15

    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    out = []
    for comp in comps:
        comp.bw = mcus_x * comp.h
        comp.bh = mcus_y * comp.v
        out.append([None] * (comp.bh * comp.bw))
    # plain-list LUTs: Python-int indexing in the hot loop (numpy
    # scalar arithmetic is ~10x slower per op)
    scan_tables = [
        (
            dc_luts[c.td][0].tolist(), dc_luts[c.td][1].tolist(),
            ac_luts[c.ta][0].tolist(), ac_luts[c.ta][1].tolist(),
        )
        for c in comps
    ]

    esegs = _entropy_segments(data, sos_end)
    all_mcus = [(my, mx) for my in range(mcus_y) for mx in range(mcus_x)]
    step = restart_interval if restart_interval else len(all_mcus)
    chunks = [all_mcus[i : i + step] for i in range(0, len(all_mcus), step)]
    if len(esegs) < len(chunks):
        raise ValueError(
            f"truncated stream: {len(esegs)} restart segments for "
            f"{len(chunks)} MCU chunks"
        )
    for seg, chunk in zip(esegs, chunks):
        _decode_blocks_segment(seg, chunk, comps, scan_tables, out)

    # vectorized reconstruction per component
    planes = []
    for comp, blocks in zip(comps, out):
        zz = np.array(blocks, dtype=np.float64)  # (n, 64) zigzag
        deq = zz * qt[comp.tq][None, :].astype(np.float64)
        f = np.zeros_like(deq)
        f[:, ZIGZAG] = deq
        f = f.reshape(-1, 8, 8)
        spatial = np.einsum("ki,nkl,lj->nij", _DCT_C, f, _DCT_C, optimize=True)
        px = np.rint(spatial + 128.0).clip(0, 255)
        plane = (
            px.reshape(comp.bh, comp.bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(comp.bh * 8, comp.bw * 8)
        )
        # upsample to full-res grid by replication, crop to (h, w)
        plane = plane.repeat(vmax // comp.v, axis=0).repeat(hmax // comp.h, axis=1)
        planes.append(plane[:h, :w])

    if nc == 1:
        return planes[0].astype(np.uint8)
    if nc != 3:
        raise ValueError(f"{nc}-component JPEG unsupported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return (
        np.stack([r, g, b], axis=-1).round().clip(0, 255).astype(np.uint8)
    )
