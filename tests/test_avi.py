"""kernels/avi.py: pure-stdlib RIFF/AVI decode.

The writer here is test-side and independent of the decoder (struct
packs straight from the public AVI RIFF layout), so agreement proves
the chunk walk, DIB de-interleave (bottom-up BGR -> top-down RGB,
4-byte row alignment) and the MJPEG frame path (each '00dc' chunk a
standalone baseline JPEG through kernels/jpeg.py).
"""
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")

from transformio_spark.kernels import avi, jpeg


def write_avi(frames_chunks: list[bytes], w: int, h: int,
              compression: bytes, bit_count: int = 24,
              chunk_id: bytes = b"00db") -> bytes:
    """Minimal independent AVI writer (public RIFF AVI spec)."""
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<14I", 100000, 0, 0, 0, len(frames_chunks), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    comp_dw = struct.unpack("<I", compression)[0]
    strf_body = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bit_count, comp_dw,
        len(frames_chunks[0]) if frames_chunks else 0, 0, 0, 0, 0,
    )
    strh = b"strh" + struct.pack("<I", 56) + (
        b"vids" + compression + struct.pack("<IIIIII", 0, 0, 0, 1, 10, 0)
        + struct.pack("<I", len(frames_chunks))
        + struct.pack("<III", 0, 0, 0) + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = b"strf" + struct.pack("<I", len(strf_body)) + strf_body
    strl_body = b"strl" + strh + strf
    strl = b"LIST" + struct.pack("<I", len(strl_body)) + strl_body
    hdrl_body = b"hdrl" + avih + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi"
    for fr in frames_chunks:
        movi_body += chunk_id + struct.pack("<I", len(fr)) + fr
        if len(fr) & 1:
            movi_body += b"\x00"
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def dib_chunk(frame_rgb: np.ndarray) -> bytes:
    """Top-down RGB frame -> bottom-up BGR DIB rows, 4-byte aligned."""
    h, w, _ = frame_rgb.shape
    stride = (w * 3 + 3) & ~3
    bgr = frame_rgb[::-1, :, ::-1]
    out = np.zeros((h, stride), dtype=np.uint8)
    out[:, : w * 3] = bgr.reshape(h, w * 3)
    return out.tobytes()


def test_dib_avi_roundtrip_aligned():
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (3, 6, 8, 3), dtype=np.uint8)
    data = write_avi([dib_chunk(f) for f in frames], 8, 6,
                     b"\x00\x00\x00\x00")
    assert avi.is_avi(data)
    out = avi.decode_avi(data)
    np.testing.assert_array_equal(out, frames)


def test_dib_avi_roundtrip_padded_rows():
    """w=5 -> 15-byte rows pad to 16: alignment must be stripped."""
    rng = np.random.default_rng(8)
    frames = rng.integers(0, 256, (2, 4, 5, 3), dtype=np.uint8)
    data = write_avi([dib_chunk(f) for f in frames], 5, 4,
                     b"\x00\x00\x00\x00")
    out = avi.decode_avi(data)
    np.testing.assert_array_equal(out, frames)


def test_mjpeg_avi_decodes_via_jpeg_kernel():
    from test_jpeg import _smooth, encode_jpeg

    frames = []
    for seed in (3, 4):
        im = np.rint(_smooth(16, 24, seed=seed)).astype(np.uint8)
        frames.append(np.stack([im, im, im], axis=-1))
    chunks = [encode_jpeg(f) for f in frames]
    data = write_avi(chunks, 24, 16, b"MJPG", chunk_id=b"00dc")
    out = avi.decode_avi(data)
    assert out.shape == (2, 16, 24, 3)
    for i, ch in enumerate(chunks):
        np.testing.assert_array_equal(out[i], jpeg.decode_jpeg(ch))


def test_mjpeg_detected_by_frame_magic_without_fourcc():
    """BI_RGB fourcc but JPEG bytes in the chunk: per-chunk magic wins
    (real-world MJPEG AVIs are inconsistent about strf compression)."""
    from test_jpeg import _smooth, encode_jpeg

    im = np.rint(_smooth(8, 8, seed=5)).astype(np.uint8)
    ch = encode_jpeg(np.stack([im, im, im], axis=-1))
    data = write_avi([ch], 8, 8, b"\x00\x00\x00\x00", chunk_id=b"00dc")
    out = avi.decode_avi(data)
    assert out.shape == (1, 8, 8, 3)


def test_avi_error_paths():
    with pytest.raises(ValueError, match="magic"):
        avi.decode_avi(b"RIFF\x00\x00\x00\x00WAVE")
    # no frames
    data = write_avi([], 8, 6, b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="no video frames"):
        avi.decode_avi(data)
    # unsupported codec fourcc with non-JPEG bytes
    data = write_avi([b"\x01" * 32], 8, 6, b"XVID", chunk_id=b"00dc")
    with pytest.raises(ValueError, match="codec"):
        avi.decode_avi(data)
    # short DIB frame
    data = write_avi([b"\x01" * 10], 8, 6, b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="short"):
        avi.decode_avi(data)


def test_synth_formula_frames_through_independent_writer():
    """The synth pixel formula, packed through THIS writer (not the
    Column-side build), decodes to the documented bottom-up-BGR ->
    top-down-RGB mapping.  Byte-level agreement of the Column-side
    container itself is covered by
    test_dedup_similarity.test_synth_media_builds_real_containers."""
    from transformio_spark.operators.multimodal import (
        MEDIA_VID_FRAME_BYTES, MEDIA_VID_H, MEDIA_VID_W,
        VID_FSTEP, VID_MULT, VID_STEP,
    )

    doc_num = 17  # 17 % 3 == 2 -> video; n_frames = 17 % 6 + 2 = 7
    n_frames = doc_num % 6 + 2
    chunks = []
    for f in range(n_frames):
        m = np.arange(MEDIA_VID_FRAME_BYTES)
        chunks.append(
            ((doc_num * VID_MULT + f * VID_FSTEP + m * VID_STEP) % 256)
            .astype(np.uint8).tobytes()
        )
    data = write_avi(chunks, MEDIA_VID_W, MEDIA_VID_H, b"\x00\x00\x00\x00")
    out = avi.decode_avi(data)
    assert out.shape == (n_frames, MEDIA_VID_H, MEDIA_VID_W, 3)
    for f in range(n_frames):
        dib = np.frombuffer(chunks[f], dtype=np.uint8).reshape(
            MEDIA_VID_H, MEDIA_VID_W, 3
        )
        np.testing.assert_array_equal(out[f], dib[::-1, :, ::-1])
