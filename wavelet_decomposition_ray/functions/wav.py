"""Minimal RIFF/PCM WAV codec on numpy — the real audio-decode path for the
multimodal stages (VERDICT r4 #3: audio was an honest NotImplementedError;
this closes it the same way ``png.py`` closed images).

Public-knowledge implementation of the WAVE container (the RIFF chunk
grammar + the canonical PCM ``fmt `` layout, per the original Microsoft/IBM
"Multimedia Programming Interface and Data Specifications 1.0"): PCM
(format tag 1) at 8-bit unsigned or 16-bit signed little-endian, any
channel count, chunks padded to even offsets. ``decode_wav`` returns the
interleaved sample stream; out-of-contract payloads (non-PCM, other bit
depths, truncated or corrupt chunks) raise the documented
ValueError/NotImplementedError. The encoder exists to build deterministic
test/fixture audio. No compressed codecs — swap in soundfile/pyav on a
cluster that has them; the Ray-side plumbing is identical either way.
"""

from __future__ import annotations

import struct

import numpy as np

WAVE_FORMAT_PCM = 1


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Samples -> WAV bytes. ``samples`` is int16 (16-bit signed PCM) or
    uint8 (8-bit unsigned PCM); shape (n,) mono or (n, channels) — frames
    are interleaved exactly as the spec lays them out."""
    a = np.asarray(samples)
    if a.dtype not in (np.dtype(np.int16), np.dtype(np.uint8)):
        raise ValueError(f"samples must be int16 or uint8, got {a.dtype}")
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got shape {a.shape}")
    n_frames, channels = a.shape
    bits = 8 * a.dtype.itemsize
    block_align = channels * a.dtype.itemsize
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", WAVE_FORMAT_PCM, channels, sample_rate, byte_rate,
        block_align, bits,
    )
    data = np.ascontiguousarray(a).astype(a.dtype.newbyteorder("<")).tobytes()
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")  # chunks pad to even
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples, sample_rate). Mono returns shape (n,);
    multi-channel returns (n_frames, channels), frames de-interleaved.
    16-bit PCM decodes to int16, 8-bit to uint8 (the spec's unsigned
    convention). Raises ValueError on a corrupt container and
    NotImplementedError outside the PCM-8/16 contract."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if length < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
            break  # data is the last chunk we need
        pos += 8 + length + (length % 2)  # chunks pad to even
    if fmt is None:
        raise ValueError("no fmt chunk")
    if raw is None:
        raise ValueError("no data chunk")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format != WAVE_FORMAT_PCM or bits not in (8, 16):
        raise NotImplementedError(
            f"only PCM 8/16-bit supported (format={audio_format} bits={bits})"
        )
    if channels < 1 or block_align != channels * (bits // 8):
        raise ValueError(f"bad fmt: channels={channels} block_align={block_align}")
    if len(raw) % block_align:
        raise ValueError("data size is not a whole number of frames")
    dtype = np.dtype("<i2") if bits == 16 else np.dtype(np.uint8)
    flat = np.frombuffer(raw, dtype=dtype)
    if bits == 16:
        flat = flat.astype(np.int16)  # native byte order for downstream
    if channels == 1:
        return flat, sample_rate
    return flat.reshape(-1, channels), sample_rate
