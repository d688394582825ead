"""GDAL-compatible image checksum.

Reimplements ``GDALChecksumImage`` (reference ``alg/gdalchecksum.cpp:48-232``):
row-major over the window, each value contributes ``value % prime[i mod 11]``
with primes ``7,11,13,17,19,23,29,31,37,41,43``; running sum is masked with
``& 0xffff`` after every step. Because ``x & 0xffff`` on a two's-complement
int equals ``x mod 65536``, the result equals the plain sum of C-truncated
modulos reduced mod 65536 — which lets us vectorize.

Float inputs go through GDALCopyWords-style conversion: ``v += 0.5`` then
clamp to [-2147483647, 2147483647] and ``floor`` (non-finite -> INT_MIN).
GDAL's autotests use this as their golden-value oracle
(e.g. ``autotest/alg/rasterize.py:71-75``) and so do ours.
"""

from __future__ import annotations

import numpy as np

__all__ = ["checksum_image"]

_PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def _int_from_double(vals: np.ndarray) -> np.ndarray:
    out = np.full(vals.shape, np.iinfo(np.int32).min, dtype=np.int64)
    finite = np.isfinite(vals)
    v = vals[finite] + 0.5
    r = np.floor(v)
    r = np.clip(r, -2147483647.0, 2147483647.0)
    out[finite] = r.astype(np.int64)
    return out


def checksum_image(arr: np.ndarray) -> int:
    """Checksum of a 2-D band array (any integer or float dtype)."""
    arr = np.asarray(arr)
    if np.issubdtype(arr.dtype, np.floating):
        vals = _int_from_double(arr.astype(np.float64).ravel())
    else:
        vals = arr.astype(np.int64).ravel()
    n = vals.size
    primes = np.tile(_PRIMES, n // 11 + 1)[:n]
    mods = np.fmod(vals, primes)  # C truncated modulo (sign of dividend)
    return int(np.sum(mods) % 65536)
