"""Geospatial queries over points DERIVED from the testdata tables.

The driver's DuckDB correctness gate can only see the registered TPC-H-ish
views, so these pipelines derive deterministic point geometry from integer
keys (a Knuth multiplicative hash onto a 2^32 lattice) and run it through
the REAL engine kernels (WebMercator tile math, cell ids). Every float
expression is written with the exact same operation order as its SQL oracle,
so floor/ceil results are bit-identical (verified: numpy pi == DuckDB pi()).

Lattice mapping (same in SQL):
    ix = (key * 2654435761) % 2^32          iy = (key * 2246822519) % 2^32
    mx = ix * (2*pi*R/2^32) - pi*R          my = iy * (2*pi*R/2^32) - pi*R
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd  # noqa: F401
from gdal_ray.sources.corpus import read_parquet_tight as _rpt
from ray.data.aggregate import Count, Sum

from gdal_ray.config import CELL_LEVEL
from gdal_ray.geo import cells as CL
from gdal_ray.geo import mercator as M

__all__ = ["q_tile_assign", "q_cell_hist", "q_bbox_join", "LATTICE_A", "LATTICE_B"]

LATTICE_A = 2654435761
LATTICE_B = 2246822519
_TWO32 = 4294967296


def _lattice(keys: np.ndarray):
    # uint64 arithmetic: the product wraps mod 2^64 (a multiple of 2^32),
    # so the % 2^32 residue is EXACT for any nonnegative int64 key. The
    # DuckDB twins compute `key * A % 2^32` in BIGINT, which instead ERRORS
    # past key ~3.47e9 (2^63/A) — oracle-checked lattices therefore require
    # keys below that bound (TPC-H keys stay < 2^31 at any tested SF).
    k = np.asarray(keys).astype(np.uint64)
    ix = ((k * np.uint64(LATTICE_A)) % np.uint64(_TWO32)).astype(np.int64)
    iy = ((k * np.uint64(LATTICE_B)) % np.uint64(_TWO32)).astype(np.int64)
    return ix, iy


def _lattice_meters(keys: np.ndarray):
    ix, iy = _lattice(keys)
    scale = 2 * np.pi * M.EARTH_RADIUS / _TWO32
    mx = ix * scale - M.ORIGIN_SHIFT
    my = iy * scale - M.ORIGIN_SHIFT
    return mx, my


def q_tile_assign(sf_dir: str, zooms=(4, 8)):
    """Per-customer XYZ tile assignment at two zooms via the engine's
    mercator kernels (gdal2tiles.py:452-464 rules: ceil/256-1 + y flip)."""
    ds = _rpt(os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"])

    def assign(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch["c_custkey"], dtype=np.int64)
        mx, my = _lattice_meters(keys)
        out = {"c_custkey": [], "z": [], "x": [], "y": []}
        parts = []
        for z in zooms:
            n = np.int64(1) << np.int64(z)
            tx, ty = M.meters_to_tile(mx, my, z)
            tx = np.clip(tx, 0, n - 1)
            ty = np.clip(ty, 0, n - 1)
            parts.append(
                pa.table(
                    {
                        "c_custkey": batch["c_custkey"],
                        "z": pa.array(np.full(len(keys), z, dtype=np.int32)),
                        "x": pa.array(tx),
                        "y": pa.array(M.tms_to_xyz(ty, z)),
                    }
                )
            )
        return pa.concat_tables(parts)

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=65536)


def q_mvt_tiles(sf_dir: str, z: int = 4):
    """Full-circle MVT check, SQL-twinnable: lattice customer points ->
    the distributed vector-tile pipeline (envelope binning, clip,
    quantize, per-tile protobuf encode) -> decode every tile back
    (io/mvt.py decode_mvt) -> per-tile feature count + id sum. The twin
    recomputes the floor-rule tile assignment (pipelines/vectortiles.py
    _tile_range, identical float op order) and aggregates customer keys
    directly — so a hash match proves the envelope binning AND that
    encode/decode round-trips every feature id through the wire format."""
    import struct

    import pandas as pd

    from gdal_ray.pipelines.vectortiles import vector_tiles

    ds = _rpt(os.path.join(sf_dir, "customer.parquet"),
              columns=["c_custkey"])

    def to_points(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch["c_custkey"], dtype=np.int64)
        mx, my = _lattice_meters(keys)
        n = len(keys)
        buf = np.empty((n, 21), dtype=np.uint8)
        buf[:, 0] = 1
        buf[:, 1:5] = np.frombuffer(struct.pack("<I", 1), dtype=np.uint8)
        buf[:, 5:13] = mx.astype("<f8").view(np.uint8).reshape(n, 8)
        buf[:, 13:21] = my.astype("<f8").view(np.uint8).reshape(n, 8)
        return pa.table({
            "c_custkey": pa.array(keys),
            "geometry": pa.array([r.tobytes() for r in buf], pa.binary()),
        })

    tiles = vector_tiles(ds.map_batches(to_points, batch_format="pyarrow"),
                         [z], id_col="c_custkey", num_buckets=16)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        from gdal_ray.io.mvt import decode_mvt

        ns, sums = [], []
        for b in df["pbf"]:
            feats = decode_mvt(bytes(b))["layer"]["features"]
            ns.append(len(feats))
            sums.append(sum(f["id"] for f in feats))
        return pd.DataFrame({
            "z": df["z"].astype(np.int64), "x": df["x"].astype(np.int64),
            "y": df["y"].astype(np.int64),
            "n": pd.Series(ns, dtype=np.int64),
            "sum_fid": pd.Series(sums, dtype=np.int64),
        })

    return tiles.map_batches(finish, batch_format="pandas").sort(["x", "y"])


def q_cell_hist(sf_dir: str, level: int = CELL_LEVEL):
    """Cell-id histogram of derived customer points (the per-partition
    metric the checkpoint manifest records)."""
    ds = _rpt(os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"])

    def assign(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch["c_custkey"], dtype=np.int64)
        mx, my = _lattice_meters(keys)
        cell = CL.cell_of_meters(mx, my, level)
        return pa.table({"cell": pa.array(cell)})

    return (
        ds.map_batches(assign, batch_format="pyarrow", batch_size=65536)
        .groupby("cell")
        .aggregate(Count(alias_name="n_points"))
    )


def q_bbox_join(sf_dir: str):
    """Broadcast bbox join: derived supplier boxes (small side, `ray.put`
    once) x derived customer points; strict-inside integer compare; partial
    per-batch counts -> tiny groupby sum. The envelope-prefilter half of the
    GDAL spatial filter (ogrlayer.cpp:2253 FilterGeometry) as a join."""
    import pyarrow.parquet as pq

    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey"])
    skeys = np.asarray(sup["s_suppkey"], dtype=np.int64)
    sx, sy = _lattice(skeys)
    hw = 134217728 + (skeys % 5) * 33554432  # 2^27 .. 2^27+4*2^25
    boxes_ref = ray.put({"s_suppkey": skeys, "sx": sx, "sy": sy, "hw": hw})

    ds = _rpt(os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"])

    def partial(batch: pa.Table) -> pa.Table:
        boxes = ray.get(boxes_ref)
        keys = np.asarray(batch["c_custkey"], dtype=np.int64)
        px, py = _lattice(keys)
        out_s, out_n = [], []
        for j in range(len(boxes["s_suppkey"])):
            m = (np.abs(px - boxes["sx"][j]) < boxes["hw"][j]) & (
                np.abs(py - boxes["sy"][j]) < boxes["hw"][j]
            )
            c = int(m.sum())
            if c:
                out_s.append(int(boxes["s_suppkey"][j]))
                out_n.append(c)
        return pa.table(
            {"s_suppkey": pa.array(out_s, pa.int64()), "partial_n": pa.array(out_n, pa.int64())}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("s_suppkey")
        .aggregate(Sum("partial_n", alias_name="n_points"))
    )
