"""64-bit perceptual hash (DCT pHash) + hamming distance, pure numpy.

Standard public pHash recipe: grayscale -> area-resize to 32x32 -> 2-D
DCT-II -> keep the top-left 8x8 low-frequency block (skipping the DC term in
the median) -> bit i set iff coefficient > median. Used for exact/near-dup
keys (the engine addition on top of GDAL's capabilities; GDAL has no
near-dedup — SURVEY.md section 2.7).
"""

from __future__ import annotations

import numpy as np

__all__ = ["phash64", "hamming64"]

_N = 32


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos((2 * i + 1) * k * np.pi / (2 * n))
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


_DCT = _dct_matrix(_N)


def _area_resize(gray: np.ndarray, n: int) -> np.ndarray:
    """Box-average resize to (n, n) via prefix sums (any input size)."""
    h, w = gray.shape
    # same accumulation order as the reference two-pass cumsum (results are
    # bit-identical to stored phashes), but without the zeros-init of the
    # full padded array or intermediate copies
    ps = np.empty((h + 1, w + 1), dtype=np.float64)
    ps[0, :] = 0.0
    ps[1:, 0] = 0.0
    np.cumsum(gray.astype(np.float64), axis=0, out=ps[1:, 1:])
    np.cumsum(ps[1:, 1:], axis=1, out=ps[1:, 1:])
    ye = np.round(np.linspace(0, h, n + 1)).astype(np.int64)
    xe = np.round(np.linspace(0, w, n + 1)).astype(np.int64)
    # guard degenerate bins on tiny inputs
    ye = np.maximum.accumulate(np.maximum(ye, np.arange(n + 1) * (h >= n)))
    out = (
        ps[np.ix_(ye[1:], xe[1:])]
        - ps[np.ix_(ye[:-1], xe[1:])]
        - ps[np.ix_(ye[1:], xe[:-1])]
        + ps[np.ix_(ye[:-1], xe[:-1])]
    )
    area = (ye[1:] - ye[:-1])[:, None] * (xe[1:] - xe[:-1])[None, :]
    area = np.maximum(area, 1)
    return out / area


def phash64(img: np.ndarray) -> np.int64:
    """uint8 (H,W) or (H,W,C) image -> signed int64 perceptual hash."""
    if img.ndim == 3:
        # sequential channel accumulation: 5x faster than .mean(axis=2) and
        # bit-identical (channel values are exact small ints in float64, so
        # the sum is exact under any association before the /c division)
        gray = img[:, :, 0].astype(np.float64)
        for k in range(1, img.shape[2]):
            gray += img[:, :, k]
        gray /= img.shape[2]
    else:
        gray = img.astype(np.float64)
    small = _area_resize(gray, _N)
    coef = _DCT @ small @ _DCT.T
    low = coef[:8, :8].ravel()
    med = np.median(low[1:])  # skip DC
    bits = (low > med).astype(np.uint64)
    h = np.uint64(0)
    for b in bits:
        h = (h << np.uint64(1)) | b
    return np.int64(h.astype(np.int64))


def hamming64(a, b):
    """Vectorized hamming distance between int64 hash arrays (SWAR popcount)."""
    x = (np.atleast_1d(np.asarray(a, dtype=np.int64)) ^ np.atleast_1d(np.asarray(b, dtype=np.int64))).view(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    cnt = (x * np.uint64(0x0101010101010101)) >> np.uint64(56)
    cnt = cnt.astype(np.int64)
    return cnt if cnt.shape != (1,) or np.ndim(a) else cnt[0]
