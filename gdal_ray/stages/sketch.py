"""Distributed sketches: HyperLogLog (Flajolet et al. 2007) cardinality,
Bloom membership (with Kirsch-Mitzenmacher double hashing), and CountMin
frequency (Cormode & Muthukrishnan 2005) — all built as vectorized
map_batches partials + an associative driver-side fold, never a shuffle.

Engine addition beyond GDAL (SURVEY §2.7 family — "a novel sketch" for
training-data pipelines): COUNT(DISTINCT) over 10^12 keys without a
shuffle. Each block maps to a 2^p-register partial (vectorized numpy:
splitmix64 hash, bucket = top p bits, rho = leading-zero rank of the
suffix), partials combine by elementwise max — associative and tiny
(4 KB at p=12), so the reduce is a driver-side fold over block partials
(the same small-result consumption the histogram pipelines use). The
register TABLE is integer-exact and SQL-twinnable (bit_length via
frexp == DuckDB length(bin(x))); the estimate applies the standard
bias-corrected formula with linear-counting small-range correction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["hll_partial", "hll_registers", "hll_estimate",
           "bloom_partial", "bloom_probe", "bloom_fold",
           "cms_partial", "cms_registers", "cms_query"]

_P = 12  # 4096 registers
_M = 1 << _P


def _splitmix64(h: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))


def hll_partial(values: np.ndarray, p: int = _P) -> np.ndarray:
    """int64/uint64 key array -> uint8 register partial of size 2^p."""
    h = _splitmix64(np.asarray(values).astype(np.uint64))
    m = 1 << p
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    suffix = h & np.uint64((1 << (64 - p)) - 1)
    # rho = (64-p) - bit_length(suffix) + 1; bit_length via frexp exponent
    # (exact for suffix < 2^53; suffixes are < 2^52 after the shift below)
    # Keep 52 bits so the float64 conversion in frexp stays exact.
    suffix = suffix >> np.uint64(64 - p - 52)
    _, exp = np.frexp(suffix.astype(np.float64))
    rho = np.where(suffix == 0, 53, 52 - exp + 1).astype(np.int64)
    reg = np.zeros(m, dtype=np.uint8)
    np.maximum.at(reg, bucket, rho.astype(np.uint8))
    return reg


def hll_registers(ds, column: str, p: int = _P):
    """Dataset + integer column -> final (bucket, register) arrow table
    with register > 0 rows only (integer-exact, oracle-checkable)."""

    def part(batch: pa.Table) -> pa.Table:
        reg = hll_partial(np.asarray(batch[column], dtype=np.int64), p)
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    acc = np.zeros(1 << p, dtype=np.uint8)
    for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for blob in b["reg"].to_pylist():
            acc = np.maximum(acc, np.frombuffer(blob, dtype=np.uint8))
    nz = np.flatnonzero(acc)
    return pa.table(
        {
            "bucket": pa.array(nz.astype(np.int64)),
            "register": pa.array(acc[nz].astype(np.int64)),
        }
    ), acc


_BLOOM_SALT = np.uint64(0xA24BAED4963EE407)


def _bloom_indices(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit indices via double hashing (Kirsch & Mitzenmacher 2006):
    idx_i = (h1 + i*h2) mod m, h2 forced odd so the stride cycles."""
    u = np.asarray(keys).astype(np.uint64)
    h1 = _splitmix64(u)
    h2 = _splitmix64(u ^ _BLOOM_SALT) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i[None, :] * h2[:, None])
                % np.uint64(m_bits)).astype(np.int64)


def bloom_partial(keys: np.ndarray, m_bits: int = 1 << 20,
                  k: int = 7) -> np.ndarray:
    """uint64/int64 key array -> packed uint8 Bloom bitmap (m_bits/8 bytes).

    Partials combine by elementwise OR — associative, so distributed build
    is a map_batches partial + a driver-side fold (the HLL shape). At
    m_bits = 2^20 / k = 7 the filter holds ~10^5 keys at ~1% FPR; size
    m_bits ~ 14 * n_keys (power of two) for that rate at other scales.
    """
    idx = _bloom_indices(keys, m_bits, k).ravel()
    bits = np.zeros(m_bits, dtype=np.uint8)
    bits[idx] = 1
    return np.packbits(bits)


def bloom_fold(partials) -> np.ndarray:
    """OR-combine an iterable of packed bitmaps (bytes or uint8 arrays)."""
    acc: np.ndarray | None = None
    for p in partials:
        a = np.frombuffer(p, dtype=np.uint8) if isinstance(p, (bytes, bytearray)) else p
        acc = a.copy() if acc is None else np.bitwise_or(acc, a)
    if acc is None:
        raise ValueError("no partials to fold")
    return acc


def bloom_probe(keys: np.ndarray, packed: np.ndarray, k: int = 7) -> np.ndarray:
    """Vectorized membership test -> bool array (no false negatives)."""
    m_bits = len(packed) * 8
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    idx = _bloom_indices(keys, m_bits, k)
    bits = (packed[idx >> 3] >> (np.uint8(7) - (idx & 7).astype(np.uint8))) & 1
    return bits.all(axis=1)


def cms_partial(keys: np.ndarray, w_bits: int = 10,
                d: int = 4) -> np.ndarray:
    """int64/uint64 key array -> (d, 2^w_bits) int64 CountMin partial
    (Cormode & Muthukrishnan 2005). The d row hashes are bit-slices of ONE
    splitmix64 value — slot_j = (h >> (w_bits*j)) & (w-1) — the
    Kirsch-Mitzenmacher less-hashing construction, which keeps the twin a
    single reusable SQL hash expression. Partials combine by elementwise
    SUM (associative), so the distributed build is the HLL shape: one
    vectorized map_batches pass + a driver-side fold of (d*w)-cell arrays
    (32 KB at the defaults — never a shuffle)."""
    if w_bits * d > 64:
        raise ValueError("w_bits * d must fit in the 64-bit hash")
    h = _splitmix64(np.asarray(keys).astype(np.uint64))
    w = 1 << w_bits
    reg = np.zeros((d, w), dtype=np.int64)
    for j in range(d):
        slot = ((h >> np.uint64(w_bits * j)) & np.uint64(w - 1)).astype(np.int64)
        np.add.at(reg[j], slot, 1)
    return reg


def cms_registers(ds, column: str, w_bits: int = 10, d: int = 4):
    """Dataset + integer column -> ((depth, slot, count) arrow table with
    count > 0 rows only — integer-exact, oracle-checkable — plus the dense
    (d, w) array for ``cms_query``)."""

    def part(batch: pa.Table) -> pa.Table:
        reg = cms_partial(np.asarray(batch[column], dtype=np.int64),
                          w_bits, d)
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    acc = np.zeros((d, 1 << w_bits), dtype=np.int64)
    for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for blob in b["reg"].to_pylist():
            acc += np.frombuffer(blob, dtype=np.int64).reshape(acc.shape)
    dep, slot = np.nonzero(acc)
    return pa.table(
        {
            "depth": pa.array(dep.astype(np.int64)),
            "slot": pa.array(slot.astype(np.int64)),
            "count": pa.array(acc[dep, slot]),
        }
    ), acc


def cms_query(acc: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized point query: upward-biased frequency estimate =
    min over depths of the key's register (never under the true count)."""
    d, w = acc.shape
    w_bits = int(w).bit_length() - 1
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64)
    h = _splitmix64(np.asarray(keys).astype(np.uint64))
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(d):
        slot = ((h >> np.uint64(w_bits * j)) & np.uint64(w - 1)).astype(np.int64)
        est = np.minimum(est, acc[j, slot])
    return est


def hll_estimate(registers: np.ndarray) -> float:
    """Bias-corrected HLL estimate with the linear-counting small-range
    correction (the canonical formula; registers uint8 of size m)."""
    m = len(registers)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = np.sum(np.exp2(-registers.astype(np.float64)))
    e = alpha * m * m / s
    zeros = int((registers == 0).sum())
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    return float(e)
