"""Minimal pure-python WAV (RIFF/PCM) codec.

The audio leg of the multimodal surface: unlike jpeg (lossy, own DCT
codec) and webp (env-gated), PCM WAV is a trivial lossless container, so
the decode step is REAL with no external library — parse the RIFF header,
locate the fmt/data chunks, and view the payload as int16 samples.

Scope: PCM (format 1) 16-bit, mono or interleaved multi-channel.
Compressed formats (ADPCM, float, mp3-in-wav) raise NotImplementedError.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, ch) int16 -> RIFF/PCM bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    payload = s.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/PCM bytes -> ((n, ch) int16 samples, sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = None
    ch = None
    bits = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_fmt != 1:
                raise NotImplementedError(f"non-PCM wav format {audio_fmt}")
            if bits != 16:
                raise NotImplementedError(f"{bits}-bit PCM unsupported")
        elif cid == b"data":
            if ch is None:
                raise ValueError("data chunk before fmt")
            arr = np.frombuffer(body[: (len(body) // (2 * ch)) * 2 * ch],
                                dtype="<i2")
            samples = arr.reshape(-1, ch)
    if samples is None or rate is None:
        raise ValueError("truncated wav (missing fmt/data)")
    return samples, int(rate)
