"""Point-in-polygon spatial join.

Replaces GDAL's spatial-filter scan (``ogrlayer.cpp:2136-2300``: envelope
reject -> prepared Intersects per feature) with the distributed shape from
SURVEY.md section 2.4:

- polygons are exploded to their cell covers at CELL_LEVEL and packed into a
  ``cell -> [candidate polygons]`` index;
- when the polygon side is small (the common case: polygon count ~ 1% of
  image count) the index is **broadcast** (`ray.put` once, fetched once per
  actor) and the join is a stateless-looking actor-pool `map_batches` over
  the point side — NO shuffle at all;
- the exact test is the vectorized ray-cast kernel with GDAL's strict
  crossing rules (``ogr/ogrlinearring.cpp:462-531``), preceded by the same
  envelope prefilter GDAL applies.

For a polygon side too large to broadcast, use ``pip_join_shuffle`` —
both sides keyed by cell, hot cells salted (round-2 path; the broadcast
path is the 100 TB design for dimension-sized polygon layers).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from gdal_ray.config import CELL_LEVEL
from gdal_ray.geo import cells as CL
from gdal_ray.geo import pip as P
from gdal_ray.geo import wkb as W

__all__ = ["build_polygon_cell_index", "PipJoinStage", "pip_join_batch"]


def build_polygon_cell_index(polygons_table: pa.Table, level: int = CELL_LEVEL):
    """Arrow polygons table (poly_id, wkb[, ...]) -> dict for broadcast.

    Returns {"cells": {cell: np.array(poly_idx)}, "polys": [decoded rings],
    "env": (N,4) envelopes, "ids": poly_id list}.
    """
    ids = polygons_table["poly_id"].to_pylist()
    blobs = polygons_table["wkb"].to_pylist()
    polys = []
    envs = np.empty((len(ids), 4), dtype=np.float64)
    for i, blob in enumerate(blobs):
        decoded = W.decode_polygons(blob)
        polys.append(decoded)
        envs[i] = W.wkb_envelope(blob)
    row, cell = CL.bbox_cover(envs[:, 0], envs[:, 1], envs[:, 2], envs[:, 3], level)
    index: dict[int, np.ndarray] = {}
    order = np.argsort(cell, kind="stable")
    cell = cell[order]
    row = row[order]
    bounds = np.flatnonzero(np.diff(cell)) + 1
    for c, idxs in zip(cell[np.concatenate([[0], bounds])], np.split(row, bounds)):
        index[int(c)] = idxs
    return {"cells": index, "polys": polys, "env": envs, "ids": np.asarray(ids)}


class PipJoinStage:
    """Actor-pool `map_batches` stage: point batches -> (src_id, poly_id) rows.

    ``index_ref`` is a `ray.put` handle to a broadcast polygon cell index —
    fetched ONCE per actor in ``__init__`` (never per batch).
    Input batches need columns (id_col, cx, cy, cell).
    """

    def __init__(self, index_ref, id_col: str = "src_id"):
        self.index = ray.get(index_ref) if not isinstance(index_ref, dict) else index_ref
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = np.asarray(batch["cx"], dtype=np.float64)
        py = np.asarray(batch["cy"], dtype=np.float64)
        cell = np.asarray(batch["cell"], dtype=np.int64)
        ids = batch[self.id_col]
        cells = self.index["cells"]
        polys = self.index["polys"]
        env = self.index["env"]
        pids = self.index["ids"]

        out_src: list[np.ndarray] = []
        out_poly: list[str] = []
        # group points of the batch by cell, then test each candidate polygon
        # against the whole point group at once (vectorized over points)
        order = np.argsort(cell, kind="stable")
        sorted_cells = cell[order]
        bounds = np.flatnonzero(np.diff(sorted_cells)) + 1
        groups = np.split(order, bounds)
        for grp in groups:
            c = int(cell[grp[0]])
            cand = cells.get(c)
            if cand is None:
                continue
            gx = px[grp]
            gy = py[grp]
            for poly_idx in cand:
                e = env[poly_idx]
                msk = (gx >= e[0]) & (gx <= e[2]) & (gy >= e[1]) & (gy <= e[3])
                if not msk.any():
                    continue
                sub = grp[msk]
                hit = np.zeros(sub.shape[0], dtype=bool)
                sx = px[sub]
                sy = py[sub]
                for rings in polys[poly_idx]:
                    inside = P.points_in_ring(sx, sy, rings[0])
                    for hole in rings[1:]:
                        if inside.any():
                            inside &= ~P.points_in_ring(sx, sy, hole)
                    hit |= inside
                if hit.any():
                    out_src.append(sub[hit])
                    out_poly.extend([pids[poly_idx]] * int(hit.sum()))
        if not out_src:
            return pa.table(
                {"src_id": pa.array([], pa.string()), "poly_id": pa.array([], pa.string())}
            )
        src_idx = np.concatenate(out_src)
        return pa.table(
            {
                "src_id": ids.take(pa.array(src_idx)),
                "poly_id": pa.array(out_poly, pa.string()),
            }
        )


# per-worker-process cache: the broadcast index is fetched/deserialized once
# per worker even under a stateless TASK pool (no actor spin-up latency);
# keyed by object ref so a new index invalidates naturally
_STAGE_CACHE: dict = {}


def pip_join_batch(batch: pa.Table, index_ref, id_col: str = "src_id") -> pa.Table:
    key = index_ref.hex() if hasattr(index_ref, "hex") else id(index_ref)
    stage = _STAGE_CACHE.get(key)
    if stage is None:
        _STAGE_CACHE.clear()
        stage = PipJoinStage(index_ref, id_col)
        _STAGE_CACHE[key] = stage
    return stage(batch)
