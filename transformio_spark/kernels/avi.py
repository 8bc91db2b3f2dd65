"""Minimal pure-stdlib RIFF/AVI video decoder.

Covers the two classic AVI video stream encodings (public spec:
Microsoft AVI RIFF / Video-for-Windows documentation):

* **uncompressed DIB** (``biCompression = 0`` / BI_RGB, 24-bit):
  ``00db`` chunks carry bottom-up BGR rows, each row padded to a
  4-byte boundary — decoded here with plain byte arithmetic;
* **MJPEG** (``biCompression = 'MJPG'`` or JFIF-magic ``00dc``
  chunks): each chunk is a standalone baseline JPEG, decoded through
  this package's own pure-stdlib baseline decoder
  (``kernels/jpeg.py``, round 3).

The chunk walk mirrors ``kernels/wav.py`` (same RIFF rules: fourcc +
LE-uint32 size, word alignment); LIST containers (``hdrl``/``movi``)
nest.  The reference has no video path — this exists so the engine's
multimodal ``video`` kind (operators/multimodal.py) decodes REAL
containers instead of the round-3/4 fabricated stub.  Frames return
as a top-down RGB ``uint8`` array of shape ``(n_frames, h, w, 3)``,
so the decode is bit-deterministic and the DuckDB oracle can
recompute every byte arithmetically from the synth formulas.
"""

from __future__ import annotations

import struct

import numpy as np


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size, list_type) for each chunk
    in [pos, end); list_type is the LIST's type fourcc (else None)."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (sz,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + sz > end:
            sz = max(0, end - body)  # tolerate a truncated final chunk
        if cid == b"LIST" and sz >= 4:
            yield data[body : body + 4], body + 4, sz - 4, True
        else:
            yield cid, body, sz, False
        pos = body + sz + (sz & 1)  # chunks are word-aligned


def _parse_strf(body: bytes) -> tuple[int, int, int, bytes]:
    """BITMAPINFOHEADER → (width, height, bit_count, compression)."""
    if len(body) < 40:
        raise ValueError("AVI strf (BITMAPINFOHEADER) too short")
    (_bisize, w, h, _planes, bits) = struct.unpack("<IiiHH", body[:16])
    comp = body[16:20]
    return w, h, bits, comp


def _decode_dib_frame(chunk: bytes, w: int, h: int) -> np.ndarray:
    """Bottom-up 24-bit BGR DIB rows (4-byte-aligned) → top-down RGB."""
    stride = (w * 3 + 3) & ~3
    if len(chunk) < stride * abs(h):
        raise ValueError(
            f"AVI DIB frame short: {len(chunk)} bytes for {w}x{h} (stride {stride})"
        )
    rows = np.frombuffer(chunk[: stride * abs(h)], dtype=np.uint8)
    rows = rows.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # positive biHeight = bottom-up storage
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def decode_avi(data: bytes) -> np.ndarray:
    """Decode an AVI into ``(n_frames, h, w, 3)`` uint8 RGB."""
    if not is_avi(data):
        raise ValueError("not an AVI (bad RIFF/AVI magic)")
    w = h = bits = None
    comp = b"\x00\x00\x00\x00"
    is_vids = False
    frames: list[np.ndarray] = []

    def handle(cid, start, size, is_list):
        nonlocal w, h, bits, comp, is_vids
        if is_list:
            for sub in _walk(data, start, start + size):
                handle(*sub)
            return
        if cid == b"strh" and size >= 8:
            is_vids = data[start : start + 4] == b"vids" or is_vids
        elif cid == b"strf" and is_vids and w is None:
            w, h, bits, comp = _parse_strf(data[start : start + size])
        elif len(cid) == 4 and cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
            frames.append(_decode_stream_chunk(data[start : start + size]))

    def _decode_stream_chunk(chunk: bytes) -> np.ndarray:
        from . import jpeg

        if comp in (b"MJPG", b"mjpg") or jpeg.is_jpeg(chunk):
            return jpeg.decode_jpeg(chunk)
        if comp == b"\x00\x00\x00\x00":  # BI_RGB
            if bits != 24:
                raise ValueError(f"unsupported DIB bit depth {bits} (24 only)")
            return _decode_dib_frame(chunk, w, h)
        raise ValueError(f"unsupported AVI video codec {comp!r}")

    for c in _walk(data, 12, len(data)):
        handle(*c)
    if w is None:
        raise ValueError("AVI missing video strf header")
    if not frames:
        raise ValueError("AVI contains no video frames")
    shapes = {f.shape for f in frames}
    if len(shapes) != 1:
        raise ValueError(f"AVI frames disagree on shape: {sorted(shapes)}")
    return np.stack(frames)
