"""Vectorized geospatial batch transforms (stateless `map_batches` stages).

Each function is Arrow-in / Arrow-out over zero-copy batches; no Python
per-row loops in hot paths. These replace GDAL's per-handle transform
methods with columnar math (SURVEY.md section 1.1 mapping).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray.geo import cells as CL
from gdal_ray.geo import mercator as M
from gdal_ray.config import CELL_LEVEL, TILE_ZOOMS

__all__ = ["add_centroid_meters", "add_cell", "explode_tiles", "add_bbox_meters"]


def _gt_matrix(batch: pa.Table) -> np.ndarray:
    if "gt0" in batch.column_names:
        return np.stack([np.asarray(batch[f"gt{i}"], dtype=np.float64) for i in range(6)], axis=1)
    col = batch["gt"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # fixed_size_list<double,6> -> (N, 6) zero-copy
    return np.asarray(col.flatten(), dtype=np.float64).reshape(-1, 6)


def _to_meters_if_4326(batch, gx, gy):
    srs = np.asarray(batch["srs"].to_numpy(zero_copy_only=False))
    is_deg = srs == "EPSG:4326"
    if is_deg.any():
        mx, my = M.latlon_to_meters(gy[is_deg], gx[is_deg])
        gx = gx.copy()
        gy = gy.copy()
        gx[is_deg] = mx
        gy[is_deg] = my
    return gx, gy


def add_centroid_meters(batch: pa.Table) -> pa.Table:
    """images⋈placements batch -> + (cx, cy) image-centroid EPSG:3857 meters.

    Centroid = geotransform applied at the pixel center (w/2, h/2)
    (GDALApplyGeoTransform semantics, alg/gdaltransformer.cpp:4491);
    EPSG:4326 placements are reprojected with the spherical-mercator
    forward formula (gdal2tiles.py:422-430) — no PROJ needed for this SRS
    pair.
    """
    gt = _gt_matrix(batch)
    w = np.asarray(batch["w"], dtype=np.float64)
    h = np.asarray(batch["h"], dtype=np.float64)
    gx = gt[:, 0] + (w / 2.0) * gt[:, 1] + (h / 2.0) * gt[:, 2]
    gy = gt[:, 3] + (w / 2.0) * gt[:, 4] + (h / 2.0) * gt[:, 5]
    gx, gy = _to_meters_if_4326(batch, gx, gy)
    return batch.append_column("cx", pa.array(gx)).append_column("cy", pa.array(gy))


def add_bbox_meters(batch: pa.Table) -> pa.Table:
    """+ (minx, miny, maxx, maxy) of each image footprint in meters.

    All four corners are transformed so rotated geotransforms are exact.
    """
    gt = _gt_matrix(batch)
    w = np.asarray(batch["w"], dtype=np.float64)
    h = np.asarray(batch["h"], dtype=np.float64)
    zeros = np.zeros_like(w)
    xs, ys = [], []
    for px, ln in ((zeros, zeros), (w, zeros), (zeros, h), (w, h)):
        gx = gt[:, 0] + px * gt[:, 1] + ln * gt[:, 2]
        gy = gt[:, 3] + px * gt[:, 4] + ln * gt[:, 5]
        gx, gy = _to_meters_if_4326(batch, gx, gy)
        xs.append(gx)
        ys.append(gy)
    xs = np.stack(xs)
    ys = np.stack(ys)
    for name, arr in (
        ("minx", xs.min(0)),
        ("miny", ys.min(0)),
        ("maxx", xs.max(0)),
        ("maxy", ys.max(0)),
    ):
        batch = batch.append_column(name, pa.array(arr))
    return batch


def add_cell(batch: pa.Table, level: int = CELL_LEVEL, x_col="cx", y_col="cy") -> pa.Table:
    """+ int64 ``cell`` partition key from meter coordinates."""
    cell = CL.cell_of_meters(np.asarray(batch[x_col]), np.asarray(batch[y_col]), level)
    return batch.append_column("cell", pa.array(cell))


def explode_tiles(batch: pa.Table, zooms=TILE_ZOOMS) -> pa.Table:
    """Explode each image footprint to its (z, x, y) XYZ tile cover.

    Requires bbox columns (add_bbox_meters). Pure arithmetic flat-map —
    the distributed replacement for gdal2tiles' driver-side double loop
    (gdal2tiles.py:2795 generate_base_tiles); the ceil(px/256)-1 seam rule
    and the XYZ y-flip match the reference bit-for-bit.
    """
    minx = np.asarray(batch["minx"])
    miny = np.asarray(batch["miny"])
    maxx = np.asarray(batch["maxx"])
    maxy = np.asarray(batch["maxy"])
    ids = batch["image_id"]
    out_idx, out_z, out_x, out_y = [], [], [], []
    for z in zooms:
        n = np.int64(1) << np.int64(z)
        tx0, ty0 = M.meters_to_tile(minx, miny, z)
        tx1, ty1 = M.meters_to_tile(maxx, maxy, z)
        tx0 = np.clip(tx0, 0, n - 1)
        tx1 = np.clip(tx1, 0, n - 1)
        ty0 = np.clip(ty0, 0, n - 1)
        ty1 = np.clip(ty1, 0, n - 1)
        nx = (tx1 - tx0 + 1).astype(np.int64)
        ny = (ty1 - ty0 + 1).astype(np.int64)
        counts = nx * ny
        total = int(counts.sum())
        if total == 0:
            continue
        row = np.repeat(np.arange(len(counts)), counts)
        # within-row local index -> (dx, dy) in row-major (x-major) order
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        local = np.arange(total) - np.repeat(starts, counts)
        rep_ny = np.repeat(ny, counts)
        dx = local // rep_ny
        dy = local % rep_ny
        txs = np.repeat(tx0, counts) + dx
        tys = np.repeat(ty0, counts) + dy
        out_idx.append(row)
        out_z.append(np.full(total, z, dtype=np.int32))
        out_x.append(txs)
        out_y.append(M.tms_to_xyz(tys, z))
    if not out_idx:
        return pa.table(
            {
                "image_id": pa.array([], pa.string()),
                "z": pa.array([], pa.int32()),
                "x": pa.array([], pa.int64()),
                "y": pa.array([], pa.int64()),
            }
        )
    row = np.concatenate(out_idx)
    return pa.table(
        {
            "image_id": ids.take(pa.array(row)),
            "z": pa.array(np.concatenate(out_z)),
            "x": pa.array(np.concatenate(out_x)),
            "y": pa.array(np.concatenate(out_y)),
        }
    )
