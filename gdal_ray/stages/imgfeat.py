"""Image feature-extraction stage: decode -> compact embedding vector.

The multimodal bridge between the raster side and the similarity-search
operators: each image decodes ONCE (inside the fused read task — the
payload never enters the object store) and emits a deterministic
49-dimensional feature embedding:

- 3x3 spatial grid of per-cell RGB means (27 dims, resolution-invariant
  via box averaging);
- 16-bin grayscale histogram (L1-normalized, 16 dims);
- 6 global moments (per-channel mean + std, scaled to [0, 1]).

L2-normalized, so cosine similarity degrades to a dot product and the
vectors feed ``stages/simsearch`` (brute-force / IVF top-k) and
``embedding_near_dup_lsh`` unchanged. Deterministic — no model weights,
no randomness — hence exactly reproducible across runs/workers (the same
property every other engine fingerprint relies on).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["image_features", "image_embedding_kernel", "image_embeddings"]

_DIM = 49


def image_features(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (49,) float64 L2-normalized feature vector."""
    f = img[:, :, :3].astype(np.float64)
    h, w = f.shape[:2]
    # 3x3 grid means via integral-free block slicing (uneven edges included)
    ys = np.linspace(0, h, 4).astype(np.int64)
    xs = np.linspace(0, w, 4).astype(np.int64)
    grid = np.empty((3, 3, 3), dtype=np.float64)
    for i in range(3):
        for j in range(3):
            cell = f[ys[i]: max(ys[i + 1], ys[i] + 1), xs[j]: max(xs[j + 1], xs[j] + 1)]
            grid[i, j] = cell.mean(axis=(0, 1))
    gray = f.mean(axis=2)
    hist = np.bincount(
        np.clip((gray.ravel() / 16.0).astype(np.int64), 0, 15), minlength=16
    ).astype(np.float64)
    hist /= max(1.0, hist.sum())
    mom = np.concatenate([f.mean(axis=(0, 1)) / 255.0, f.std(axis=(0, 1)) / 128.0])
    v = np.concatenate([grid.ravel() / 255.0, hist, mom])
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def image_embedding_kernel(batch: pa.Table) -> pa.Table:
    """Fused-source kernel: images batch -> (image_id, embedding) rows."""
    from gdal_ray.io import codec as C

    ids = batch["image_id"].to_pylist()
    blobs = batch["bytes"].to_pylist()
    fmts = batch["fmt"].to_pylist()
    out = np.empty((len(ids), _DIM), dtype=np.float64)
    for i in range(len(ids)):
        out[i] = image_features(C.decode_image(blobs[i], fmts[i]))
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "embedding": pa.array(list(out), pa.list_(pa.float64(), _DIM)),
        }
    )


def image_embeddings(corpus_dir: str):
    """Corpus -> (image_id, embedding) Dataset through the fused source."""
    from gdal_ray.pipelines.flagship import fused_image_apply

    return fused_image_apply(
        corpus_dir,
        image_embedding_kernel,
        columns=["image_id", "bytes", "fmt"],
        with_placements=False,
    )
