"""Multimodal payload stages: audio / video as opaque binary + typed metadata.

Audio: fmt="wav" payloads decode FOR REAL (RIFF PCM codec, io/audio.py —
needs no library) and the feature DSP (band energies / RMS / zero-crossing
rate / spectral centroid) runs on actual samples. Compressed audio and all
video decode remain stubbed per the build contract:
- ``strict=True``: raises NotImplementedError naming the seam where a real
  decoder (libsndfile / pyav) plugs in;
- default: a deterministic fake decoder (seeded from the payload hash) so
  the Ray-side plumbing — schema, batch sizing for wide rows, actor-pool
  signature, output layout — runs end-to-end and is testable today.

Schema contract (mirrors the image input_hint shape):
  audio: (clip_id: string, bytes: binary, sr: int32, n_samples: int64,
          fmt: string, caption: string)
  video: (video_id: string, bytes: binary, w: int32, h: int32,
          n_frames: int32, fps: float64, fmt: string, caption: string)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = [
    "AudioFeatures",
    "VideoFrameSampler",
    "make_wav_audio_table",
    "make_fake_audio_table",
    "make_fake_video_table",
]


def _seed_from(blob: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(blob, digest_size=8).digest(), "little")


class AudioFeatures:
    """Actor-pool stage: audio bytes -> fixed-size feature vector.

    fmt="wav" payloads decode for real (RIFF PCM); other formats use the
    deterministic stub (or raise with strict=True). Features are real DSP
    either way: N_BANDS log band energies + RMS + zero-crossing rate +
    spectral centroid (Hz, normalized by Nyquist).
    """

    N_BANDS = 16

    def __init__(self, strict: bool = False):
        self.strict = strict

    def _decode(self, blob: bytes, sr: int, n: int, fmt: str = "pcm-stub") -> np.ndarray:
        if fmt == "wav":
            from gdal_ray.io.audio import decode_wav

            pcm, _ = decode_wav(blob)
            return pcm[:n, 0].astype(np.float64) / 32768.0
        if self.strict:
            raise NotImplementedError(
                f"audio decode for fmt={fmt!r} needs an audio library "
                "(libsndfile/ffmpeg) not present in this environment; plug it "
                "into AudioFeatures._decode"
            )
        rng = np.random.Generator(np.random.Philox(key=np.array([_seed_from(blob) & ((1 << 64) - 1), 0], dtype=np.uint64)))
        t = np.arange(n) / max(sr, 1)
        f = rng.uniform(50, 2000)
        return np.sin(2 * np.pi * f * t) + 0.1 * rng.normal(0, 1, n)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr"].to_pylist()
        ns = batch["n_samples"].to_pylist()
        fmts = (
            batch["fmt"].to_pylist()
            if "fmt" in batch.column_names
            else ["pcm-stub"] * len(blobs)
        )
        feats = []
        rms_out = np.empty(len(blobs))
        zcr_out = np.empty(len(blobs))
        cent_out = np.empty(len(blobs))
        for i in range(len(blobs)):
            pcm = self._decode(blobs[i], srs[i], min(int(ns[i]), 65536), fmts[i])
            spec = np.abs(np.fft.rfft(pcm))
            bands = np.array_split(spec, self.N_BANDS)
            feats.append([float(np.log1p(b.mean())) for b in bands])
            rms_out[i] = float(np.sqrt(np.mean(pcm * pcm)))
            zcr_out[i] = float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
            power = spec * spec
            tot = power.sum()
            freqs = np.linspace(0.0, 1.0, len(spec))  # fraction of Nyquist
            cent_out[i] = float((freqs * power).sum() / tot) if tot > 0 else 0.0
        return (
            batch.drop_columns(["bytes"])
            .append_column("features", pa.array(feats, pa.list_(pa.float64(), self.N_BANDS)))
            .append_column("rms", pa.array(rms_out))
            .append_column("zcr", pa.array(zcr_out))
            .append_column("spectral_centroid", pa.array(cent_out))
        )


class VideoFrameSampler:
    """Actor-pool stage: video bytes -> K sampled frames' thumbnail hashes.

    Real pipeline: demux -> decode every (n_frames/K)-th frame -> resize ->
    pHash per frame (shot-level near-dup keys). Stub synthesizes frames
    deterministically; the output layout (one row per sampled frame) and the
    wide-row batch sizing are the real thing.
    """

    def __init__(self, k_frames: int = 4, strict: bool = False):
        self.k = k_frames
        self.strict = strict

    def _frame(self, blob: bytes, idx: int, w: int, h: int) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "video decode needs pyav/ffmpeg, absent here; plug into "
                "VideoFrameSampler._frame"
            )
        seed = (_seed_from(blob) ^ idx) & ((1 << 64) - 1)
        rng = np.random.Generator(np.random.Philox(key=np.array([seed, 0], dtype=np.uint64)))
        yy, xx = np.mgrid[0:h, 0:w]
        ph = rng.uniform(0, 2 * np.pi)
        return np.clip(127 + 120 * np.sin(xx / w * 6 + ph + idx / 3), 0, 255).astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from gdal_ray.io.phash import phash64

        out = {"video_id": [], "frame_idx": [], "frame_phash": []}
        blobs = batch["bytes"].to_pylist()
        ids = batch["video_id"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        nf = batch["n_frames"].to_pylist()
        for i in range(len(ids)):
            step = max(1, int(nf[i]) // self.k)
            for j, fidx in enumerate(range(0, int(nf[i]), step)):
                if j >= self.k:
                    break
                frame = self._frame(blobs[i], fidx, min(ws[i], 128), min(hs[i], 128))
                out["video_id"].append(ids[i])
                out["frame_idx"].append(fidx)
                out["frame_phash"].append(int(phash64(frame)))
        return pa.table(
            {
                "video_id": pa.array(out["video_id"], pa.string()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "frame_phash": pa.array(out["frame_phash"], pa.int64()),
            }
        )


def make_wav_audio_table(n: int, seed: int = 42, sr: int = 16000) -> pa.Table:
    """REAL RIFF-PCM payloads: per clip a pure tone (known frequency) plus
    mild noise, 16-bit mono — exercises the genuine wav decode path."""
    from gdal_ray.io.audio import encode_wav

    rng = np.random.default_rng(seed)
    blobs, n_samples, tones = [], [], []
    for i in range(n):
        ns = int(rng.integers(8000, 32000))
        f = float(rng.uniform(100, 4000))
        t = np.arange(ns) / sr
        pcm = (
            0.5 * np.sin(2 * np.pi * f * t) + 0.01 * rng.normal(0, 1, ns)
        )
        blobs.append(encode_wav((np.clip(pcm, -1, 1) * 32767).astype(np.int16), sr))
        n_samples.append(ns)
        tones.append(f)
    return pa.table(
        {
            "clip_id": pa.array([f"clip{i:06d}" for i in range(n)]),
            "bytes": pa.array(blobs, pa.binary()),
            "sr": pa.array([sr] * n, pa.int32()),
            "n_samples": pa.array(n_samples, pa.int64()),
            "fmt": pa.array(["wav"] * n),
            "caption": pa.array([f"tone {tones[i]:.0f} Hz" for i in range(n)]),
            "tone_hz": pa.array(tones, pa.float64()),
        }
    )


def make_fake_audio_table(n: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "clip_id": pa.array([f"clip{i:06d}" for i in range(n)]),
            "bytes": pa.array([rng.bytes(64) for _ in range(n)], pa.binary()),
            "sr": pa.array([16000] * n, pa.int32()),
            "n_samples": pa.array(rng.integers(8000, 64000, n), pa.int64()),
            "fmt": pa.array(["pcm-stub"] * n),
            "caption": pa.array([f"clip {i}" for i in range(n)]),
        }
    )


def make_fake_video_table(n: int, seed: int = 43) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "video_id": pa.array([f"vid{i:06d}" for i in range(n)]),
            "bytes": pa.array([rng.bytes(128) for _ in range(n)], pa.binary()),
            "w": pa.array(rng.choice([320, 640], n).astype(np.int32), pa.int32()),
            "h": pa.array(rng.choice([240, 480], n).astype(np.int32), pa.int32()),
            "n_frames": pa.array(rng.integers(24, 240, n).astype(np.int32), pa.int32()),
            "fps": pa.array([24.0] * n),
            "fmt": pa.array(["h264-stub"] * n),
            "caption": pa.array([f"video {i}" for i in range(n)]),
        }
    )
