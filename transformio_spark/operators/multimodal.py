"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` kernels.  The actual codec step is
STUBBED in this environment (no PIL/av libs — clearly marked below);
everything Spark-side is real and tested: schemas, batch iteration,
partition-size control, and the deterministic fake featureizer that
stands in for a decoder so downstream plumbing (dedup on features,
ANN on media embeddings) can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)

FEATURE_SCHEMA = (
    "media_id string, kind string, ok boolean, err string, "
    "feature array<float>, decoded_shape array<int>"
)


# Deterministic media-container geometry (shared with the DuckDB
# oracle, plans/oracles.media_features): image = 8x8 RGB uncompressed
# little-endian TIFF, audio = 64-sample 16-bit mono PCM WAV, video =
# uncompressed 24-bit DIB AVI (round 5: 8x6 RGB, 2..7 frames).  Pixel /
# sample values are integer arithmetic on doc_num, so an oracle can
# recompute the decoded values without parsing bytes while Spark runs
# the true container-decode path (kernels/{tiff,wav,avi}.py).
MEDIA_IMG_W = 8
MEDIA_IMG_H = 8
MEDIA_IMG_BYTES = MEDIA_IMG_W * MEDIA_IMG_H * 3
MEDIA_AUDIO_N = 64
# pixel m (0..191):  (doc_num*31 + 7*m)  % 256
# sample m (0..63): u=(doc_num*13 + 97*m) % 65536; int16 reinterpret
IMG_PX_MULT, IMG_PX_STEP = 31, 7
AUD_MULT, AUD_STEP = 13, 97
# video frame f (0..n_frames-1), DIB byte m (0..143, bottom-up BGR):
#   (doc_num*29 + f*53 + m*11) % 256;  n_frames = doc_num % 6 + 2
MEDIA_VID_W = 8
MEDIA_VID_H = 6
MEDIA_VID_FRAME_BYTES = MEDIA_VID_W * MEDIA_VID_H * 3  # stride 24, 4-aligned
VID_MULT, VID_FSTEP, VID_STEP = 29, 53, 11


def _tiff_wrapper_hex() -> tuple[str, str]:
    """(header_hex, ifd_hex) for a minimal uncompressed 8x8 RGB TIFF:
    8-byte header, pixel strip at offset 8, IFD after the strip."""
    import struct

    ifd_off = 8 + MEDIA_IMG_BYTES
    pre = b"II*\x00" + struct.pack("<I", ifd_off)
    entries = [  # (tag, type, count, value) — SHORT(3) packs in 2 bytes
        (256, 3, 1, MEDIA_IMG_W),       # ImageWidth
        (257, 3, 1, MEDIA_IMG_H),       # ImageLength
        (259, 3, 1, 1),                 # Compression: none
        (273, 4, 1, 8),                 # StripOffsets
        (277, 3, 1, 3),                 # SamplesPerPixel (RGB)
        (279, 4, 1, MEDIA_IMG_BYTES),   # StripByteCounts
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3:
            ifd += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    return pre.hex(), ifd.hex()


def _wav_header_hex() -> str:
    """Canonical 44-byte PCM WAV header (16-bit mono, 16 kHz)."""
    import struct

    data_sz = MEDIA_AUDIO_N * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + data_sz) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
    hdr += b"data" + struct.pack("<I", data_sz)
    return hdr.hex()


def _avi_wrapper_hex() -> dict[str, str]:
    """Static hex fragments of a minimal uncompressed-DIB AVI (8x6
    RGB24, 10 fps, one 'vids' stream, public AVI RIFF layout:
    hdrl(avih + strl(strh + strf)) then movi with '00db' DIB chunks).
    The n_frames-dependent fields (RIFF size, avih dwTotalFrames,
    strh dwLength, movi LIST size) are spliced in Column-side by
    synth_media between these fragments."""
    import struct

    w, h = MEDIA_VID_W, MEDIA_VID_H
    fb = MEDIA_VID_FRAME_BYTES
    chunk = fb + 8  # '00db' + LE size + payload
    a = (  # after the dynamic RIFF size, up to avih dwTotalFrames
        b"AVI "
        + b"LIST" + struct.pack("<I", 192) + b"hdrl"
        + b"avih" + struct.pack("<I", 56)
        + struct.pack("<IIII", 100000, 0, 0, 0)  # usec/frame, maxbps, pad, flags
    )
    b_ = (  # between avih dwTotalFrames and strh dwLength
        struct.pack("<IIIII", 0, 1, chunk, w, h)  # init, streams, sugbuf, w, h
        + struct.pack("<IIII", 0, 0, 0, 0)        # dwReserved[4]
        + b"LIST" + struct.pack("<I", 116) + b"strl"
        + b"strh" + struct.pack("<I", 56)
        + b"vids" + b"DIB "
        + struct.pack("<IIIIII", 0, 0, 0, 1, 10, 0)  # flags, prio|lang, init, scale, rate, start
    )
    c = (  # between strh dwLength and the movi LIST size
        struct.pack("<III", chunk, 0, 0)   # sugbuf, quality, samplesize
        + struct.pack("<hhhh", 0, 0, w, h)  # rcFrame
        + b"strf" + struct.pack("<I", 40)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, fb, 0, 0, 0, 0)
        + b"LIST"
    )
    return {
        "pre": b"RIFF".hex(),
        "a": a.hex(),
        "b": b_.hex(),
        "c": c.hex(),
        "movi": b"movi".hex(),
        "frame_hdr": (b"00db" + struct.pack("<I", fb)).hex(),
    }


def _hex_byte(v):
    return F.lpad(F.hex(v), 2, "0")


def _le32_hex(v):
    """Hex of a little-endian uint32 built from a numeric Column."""
    v = v.cast("long")
    return F.concat(
        _hex_byte(F.pmod(v, F.lit(256))),
        _hex_byte(F.pmod(F.floor(v / 256).cast("long"), F.lit(256))),
        _hex_byte(F.pmod(F.floor(v / 65536).cast("long"), F.lit(256))),
        _hex_byte(F.pmod(F.floor(v / 16777216).cast("long"), F.lit(256))),
    )


def synth_media(spark: SparkSession, docs: DataFrame, payload_bytes: int = 256) -> DataFrame:
    """Deterministic media table derived from doc ids — stands in for
    real blob-storage resolution of span media_refs.  Image and audio
    payloads are REAL containers (uncompressed TIFF / PCM WAV) built
    Column-side as hex-string concat + unhex, with pixel/sample values
    from integer arithmetic on doc_num — so the true codec path runs
    on every row and a SQL oracle can recompute the decoded values.
    Video payloads are REAL AVI containers too (round 5): 8x6 RGB24
    uncompressed-DIB frames, 2..7 per doc, decoded by the true RIFF
    walker (kernels/avi.py; MJPEG streams use kernels/jpeg.py)."""
    px_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(MEDIA_IMG_BYTES - 1)),
            lambda m: _hex_byte(
                F.pmod(F.col("doc_num") * IMG_PX_MULT + m * IMG_PX_STEP, F.lit(256))
            ),
        ),
        "",
    )
    tiff_pre, tiff_ifd = _tiff_wrapper_hex()
    img_payload = F.unhex(F.concat(F.lit(tiff_pre), px_hex, F.lit(tiff_ifd)))

    def sample_hex(m):
        u = F.pmod(F.col("doc_num") * AUD_MULT + m * AUD_STEP, F.lit(65536))
        lo = F.pmod(u, F.lit(256))
        hi = F.floor(u / F.lit(256)).cast("long")
        return F.concat(_hex_byte(lo), _hex_byte(hi))  # little-endian int16

    wav_hex = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(MEDIA_AUDIO_N - 1)), sample_hex), ""
    )
    wav_payload = F.unhex(F.concat(F.lit(_wav_header_hex()), wav_hex))

    avi = _avi_wrapper_hex()
    nf = (F.col("doc_num") % 6 + 2).cast("long")
    chunk = MEDIA_VID_FRAME_BYTES + 8
    frame_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0).cast("long"), nf - 1),
            lambda f: F.concat(
                F.lit(avi["frame_hdr"]),
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(MEDIA_VID_FRAME_BYTES - 1)),
                        lambda m: _hex_byte(
                            F.pmod(
                                F.col("doc_num") * VID_MULT
                                + f * VID_FSTEP
                                + m * VID_STEP,
                                F.lit(256),
                            )
                        ),
                    ),
                    "",
                ),
            ),
        ),
        "",
    )
    avi_payload = F.unhex(
        F.concat(
            F.lit(avi["pre"]), _le32_hex(nf * chunk + 216),
            F.lit(avi["a"]), _le32_hex(nf),
            F.lit(avi["b"]), _le32_hex(nf),
            F.lit(avi["c"]), _le32_hex(nf * chunk + 4),
            F.lit(avi["movi"]), frame_hex,
        )
    )

    is_video = F.col("doc_num") % 3 == 2

    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_num") % 3 == 0, "image")
        .when(F.col("doc_num") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.when(F.col("doc_num") % 3 == 0, img_payload)
        .when(F.col("doc_num") % 3 == 1, wav_payload)
        .otherwise(avi_payload)
        .alias("payload"),
        F.struct(
            F.when(is_video, F.lit(MEDIA_VID_W))
            .otherwise(F.col("doc_num") % 640 + 64)
            .cast("int")
            .alias("width"),
            F.when(is_video, F.lit(MEDIA_VID_H))
            .otherwise(F.col("doc_num") % 480 + 48)
            .cast("int")
            .alias("height"),
            F.when(is_video, nf)
            .otherwise(F.col("doc_num") % 30 + 1)
            .cast("int")
            .alias("n_frames"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _decode_stub(kind: str, payload: bytes, meta) -> np.ndarray:
    """Decode a media payload.  IMAGE payloads with a real container
    magic decode through this package's pure-stdlib codecs
    (kernels/{png,jpeg,tiff}.py — round 3; the reference decodes via
    PIL, imwarp.py:92-96); AUDIO payloads with a RIFF/WAVE magic
    decode through kernels/wav.py (round 4); VIDEO payloads with a
    RIFF/AVI magic decode through kernels/avi.py (round 5:
    uncompressed-DIB and MJPEG streams, the latter via the baseline
    JPEG decoder).  Unknown bytes of a known kind fall back to a
    DETERMINISTIC fake decode (seeded by payload digest) of the
    meta-declared logical shape — the garbage-bytes channel, pinned
    by tests.  Raises for unknown kinds exactly like a codec would."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media kind {kind!r}")
    if kind == "image":
        from ..kernels import jpeg, png, tiff

        if png.is_png(payload):
            return png.decode_png(payload)
        if jpeg.is_jpeg(payload):
            return jpeg.decode_jpeg(payload)
        if tiff.is_tiff(payload):
            return tiff.decode_tiff(payload)
    if kind == "audio":
        from ..kernels import wav

        if wav.is_wav(payload):
            return wav.decode_wav(payload)
    if kind == "video":
        from ..kernels import avi

        if avi.is_avi(payload):
            return avi.decode_avi(payload)
    digest = hashlib.md5(payload).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    if kind == "image":
        return rng.integers(0, 256, (meta["height"], meta["width"], 3), dtype=np.uint8)
    if kind == "audio":
        return (rng.standard_normal(meta["sample_rate"]) * 0.1).astype(np.float32)
    return rng.integers(
        0, 256, (min(meta["n_frames"], 4), 32, 32, 3), dtype=np.uint8
    )


def extract_features(media: DataFrame, feature_dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: decode (stubbed) → pooled
    feature vector.  Batch shape, error channeling (per-row ok/err
    instead of task failure) and schema are the real engine design."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "ok": [], "err": [],
                "feature": [], "decoded_shape": [],
            }
            # decode is inherently per-blob, but iterate raw column
            # arrays — pdf.iterrows() builds a pandas Series per row
            # (~100x slower batch overhead once a real decoder lands)
            cols = (
                pdf["media_id"].to_numpy(), pdf["kind"].to_numpy(),
                pdf["payload"].to_numpy(), pdf["meta"].to_numpy(),
            )
            for media_id, kind, payload, meta in zip(*cols):
                out["media_id"].append(media_id)
                out["kind"].append(kind)
                try:
                    arr = _decode_stub(kind, bytes(payload), meta)
                    flat = arr.astype(np.float64).ravel()
                    pooled = np.resize(flat, (feature_dim, max(flat.size // feature_dim, 1))).mean(axis=1)
                    out["ok"].append(True)
                    out["err"].append("")
                    out["feature"].append(pooled.astype(np.float32).tolist())
                    out["decoded_shape"].append(list(arr.shape))
                except NotImplementedError as e:
                    out["ok"].append(False)
                    out["err"].append(str(e))
                    out["feature"].append(None)
                    out["decoded_shape"].append(None)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id string, kind string, ok boolean, err string, "
    "out_w int, out_h int, px_md5 string"
)

FRAMES_SCHEMA = (
    "media_id string, frame_idx int, frame_md5 string, "
    "px_sum long, pos_dot long"
)


def resize_media(media: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Decode (stub) → area-average resize (kernels.warp.area_resize,
    the same resampler the raster path uses) → md5 of the resized
    pixels.  Audio is rejected per-row (ok=false), like a real
    pipeline where resize applies to visual media only."""
    from ..kernels.warp import area_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in
                   ("media_id", "kind", "ok", "err", "out_w", "out_h", "px_md5")}
            cols = (pdf["media_id"].to_numpy(), pdf["kind"].to_numpy(),
                    pdf["payload"].to_numpy(), pdf["meta"].to_numpy())
            for media_id, kind, payload, meta in zip(*cols):
                out["media_id"].append(media_id)
                out["kind"].append(kind)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                try:
                    if kind == "audio":
                        raise NotImplementedError("resize undefined for audio")
                    arr = _decode_stub(kind, bytes(payload), meta)
                    frame = arr if kind == "image" else arr[0]
                    small = area_resize(frame, out_w, out_h)
                    out["ok"].append(True)
                    out["err"].append("")
                    out["px_md5"].append(hashlib.md5(small.tobytes()).hexdigest())
                except NotImplementedError as e:
                    out["ok"].append(False)
                    out["err"].append(str(e))
                    out["px_md5"].append(None)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_k: int = 4) -> DataFrame:
    """Frame sampling for video media: true AVI decode (kernels/avi.py;
    garbage bytes fall to the deterministic fake like the other kinds)
    → every k-th frame emitted as one row with its md5 plus two
    arithmetic fingerprints of the decoded top-down RGB bytes —
    ``px_sum`` (Σ byte) and ``pos_dot`` (Σ position·byte, which pins
    the de-interleave: any row-flip or channel-swap error changes it)
    — so a SQL oracle can verify the decode without a blob hash.
    Non-video rows produce no output rows (filter semantics)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_md5": [],
                   "px_sum": [], "pos_dot": []}
            cols = (pdf["media_id"].to_numpy(), pdf["kind"].to_numpy(),
                    pdf["payload"].to_numpy(), pdf["meta"].to_numpy())
            for media_id, kind, payload, meta in zip(*cols):
                if kind != "video":
                    continue
                arr = _decode_stub(kind, bytes(payload), meta)
                for idx in range(0, arr.shape[0], every_k):
                    flat = arr[idx].ravel().astype(np.int64)
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(idx)
                    out["frame_md5"].append(
                        hashlib.md5(arr[idx].tobytes()).hexdigest()
                    )
                    out["px_sum"].append(int(flat.sum()))
                    out["pos_dot"].append(
                        int((np.arange(flat.size, dtype=np.int64) * flat).sum())
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FRAMES_SCHEMA)
