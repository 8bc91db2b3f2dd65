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


def synth_media(spark: SparkSession, docs: DataFrame, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table derived from doc ids: payload =
    repeated md5 bytes, metadata from arithmetic.  Stands in for real
    blob storage resolution of span media_refs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_num") % 3 == 0, "image")
        .when(F.col("doc_num") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.repeat(F.unhex(F.md5(F.col("doc_id"))), payload_bytes // 16)
        .cast("binary")
        .alias("payload"),
        F.struct(
            (F.col("doc_num") % 640 + 64).cast("int").alias("width"),
            (F.col("doc_num") % 480 + 48).cast("int").alias("height"),
            (F.col("doc_num") % 30 + 1).cast("int").alias("n_frames"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _decode_stub(kind: str, payload: bytes, meta) -> np.ndarray:
    """Decode a media payload.  IMAGE payloads with a real container
    magic decode through this package's pure-stdlib codecs
    (kernels/{png,jpeg,tiff}.py — round 3; the reference decodes via
    PIL, imwarp.py:92-96).  Audio/video codecs (and unknown image
    bytes) remain STUBBED — no torchaudio/av in this container — with
    a DETERMINISTIC fake decode (seeded by payload digest) of the
    right logical shape so downstream operators see realistic data.
    Raises for unknown kinds exactly like a codec would."""
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
    "media_id string, frame_idx int, frame_md5 string"
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
    """Frame sampling for video media: decode (stub) → every k-th
    frame emitted as one row (media_id, frame_idx, frame_md5).
    Non-video rows produce no output rows (filter semantics)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_md5": []}
            cols = (pdf["media_id"].to_numpy(), pdf["kind"].to_numpy(),
                    pdf["payload"].to_numpy(), pdf["meta"].to_numpy())
            for media_id, kind, payload, meta in zip(*cols):
                if kind != "video":
                    continue
                arr = _decode_stub(kind, bytes(payload), meta)
                for idx in range(0, arr.shape[0], every_k):
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(idx)
                    out["frame_md5"].append(
                        hashlib.md5(arr[idx].tobytes()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FRAMES_SCHEMA)
