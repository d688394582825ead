"""WAV (RIFF PCM) codec — pure struct/numpy, no audio libraries.

Uncompressed PCM WAV needs no codec library, so the audio modality's decode
seam is REAL for fmt="wav": 8/16-bit PCM, mono or interleaved multichannel,
standard RIFF chunk walk (unknown chunks skipped). Compressed formats
(mp3/aac/...) still raise at the documented seam in stages/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav"]


def encode_wav(pcm: np.ndarray, sr: int) -> bytes:
    """int16 array (n,) or (n, ch) -> RIFF/WAVE PCM bytes."""
    pcm = np.asarray(pcm, dtype="<i2")
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    data = pcm.tobytes()
    byte_rate = sr * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sr, byte_rate, ch * 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def decode_wav(buf: bytes):
    """RIFF/WAVE PCM bytes -> (int16 samples (n, ch), sample_rate)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off = 12
    sr = ch = bits = None
    data = None
    while off + 8 <= len(buf):
        tag = buf[off : off + 4]
        (length,) = struct.unpack_from("<I", buf, off + 4)
        body = buf[off + 8 : off + 8 + length]
        if tag == b"fmt ":
            audio_fmt, ch, sr, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1:
                raise ValueError(f"compressed WAV (fmt {audio_fmt}) needs a codec library")
        elif tag == b"data":
            data = body
        off += 8 + length + (length & 1)  # chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits == 16:
        pcm = np.frombuffer(data, dtype="<i2")
    elif bits == 8:
        pcm = (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) << 8
    else:
        raise ValueError(f"{bits}-bit PCM unsupported")
    return pcm.reshape(-1, ch), int(sr)
