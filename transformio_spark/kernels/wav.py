"""Minimal pure-stdlib RIFF/WAVE (PCM) decoder.

Covers canonical-form PCM WAV: "RIFF"+size+"WAVE", a "fmt " chunk
with audio_format=1 (integer PCM, 8 or 16 bit), and a "data" chunk;
other chunks (LIST, fact, ...) are skipped per the RIFF chunk walk.
Anything else raises with a clear message.  The reference has no
audio path — this exists so the engine's multimodal audio kind
(operators/multimodal.py) decodes REAL containers instead of a
fabricated stub; public spec: Microsoft/IBM WAVE (RIFF) format.

Samples return as float32 in [-1, 1): int16/32768 or (uint8-128)/128
— both exactly representable in float32, so the decode is bit-
deterministic and the DuckDB oracle can recompute it arithmetically.
Multi-channel data returns shape (n_frames, n_channels); mono returns
a flat (n_frames,) array.
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> np.ndarray:
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE magic)")
    pos = 12
    fmt = None
    pcm = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (sz,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            if sz < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, _rate, _byte_rate, _block, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV audio format {audio_format} (PCM only)")
    if bits == 16:
        samples = np.frombuffer(pcm[: len(pcm) // 2 * 2], dtype="<i2")
        out = samples.astype(np.float32) / np.float32(32768.0)
    elif bits == 8:
        samples = np.frombuffer(pcm, dtype=np.uint8)
        out = (samples.astype(np.float32) - np.float32(128.0)) / np.float32(128.0)
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if channels > 1:
        out = out[: len(out) // channels * channels].reshape(-1, channels)
    return out
