"""kNN lookup of query points against image centroids.

Mirrors GDAL's gridding nearest-neighbor search (quadtree + expanding
radius, ``alg/gdalgrid.cpp:896-923``) as a Ray actor-pool stage:

- reference points (image centroids) are bucketed by cell at CELL_LEVEL
  into a dict index, broadcast once via `ray.put`, fetched per actor in
  ``__init__`` (never per batch);
- per query, candidates come from an expanding Chebyshev k-ring of cells;
  results are EXACT: points outside ring r are at Euclidean distance
  >= r * cell_edge from anywhere in the query's cell, so once the k-th
  candidate distance is <= that bound the search stops (otherwise the ring
  jumps straight to ceil(kth/cell_edge));
- distances are Euclidean in EPSG:3857 meters; ties broken by image_id
  (lexsort), matching the fixture oracle.

At 10^12-image scale the broadcast index is replaced by co-partitioning
both sides on cell (groupby + map_groups with per-cell state and k-ring
replication of queries) — same kernel, different data movement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from gdal_ray.config import CELL_LEVEL
from gdal_ray.geo import cells as CL
from gdal_ray.geo import mercator as M

__all__ = ["build_centroid_cell_index", "KnnStage", "knn_batch"]


def build_centroid_cell_index(ids, cx, cy, level: int = CELL_LEVEL):
    """(ids, cx, cy) arrays -> broadcastable {cell: (ids, ranks, xy)} index.

    ``ranks`` is the global lexicographic rank of each id — integer
    tie-breaking in the query loop (string lexsort per query is the
    dominant cost in dense cells otherwise).
    """
    ids = np.asarray(ids)
    cx = np.asarray(cx, dtype=np.float64)
    cy = np.asarray(cy, dtype=np.float64)
    rank = np.empty(len(ids), dtype=np.int64)
    rank[np.argsort(ids, kind="stable")] = np.arange(len(ids))
    cell = CL.cell_of_meters(cx, cy, level)
    order = np.argsort(cell, kind="stable")
    cell_s = cell[order]
    bounds = np.flatnonzero(np.diff(cell_s)) + 1
    starts = np.concatenate([[0], bounds])
    index = {}
    for s, grp in zip(starts, np.split(order, bounds)):
        index[int(cell_s[s])] = (ids[grp], rank[grp], np.stack([cx[grp], cy[grp]], axis=1))
    return {"cells": index, "level": level}


class KnnStage:
    """Query-point batches -> (query_id, rank, image_id, dist) rows.

    Input batch columns: (query_id, cx, cy, k).
    """

    def __init__(self, index_ref):
        self.index = ray.get(index_ref) if not isinstance(index_ref, dict) else index_ref
        self.level = self.index["level"]
        self.cell_edge = M.INITIAL_RESOLUTION / (2**self.level) * M.TILE_SIZE
        # (cell, ring) -> candidate arrays; hotspot cells host many queries,
        # so the expensive ring-gather amortizes across a batch
        self._gather_cache: dict = {}

    def _gather(self, cell: int, ring: int):
        key = (cell, ring)
        hit = self._gather_cache.get(key)
        if hit is not None:
            return hit
        ids_list, rank_list, xy_list = [], [], []
        for c in CL.k_ring(cell, ring):
            ent = self.index["cells"].get(int(c))
            if ent is not None:
                ids_list.append(ent[0])
                rank_list.append(ent[1])
                xy_list.append(ent[2])
        if not ids_list:
            out = (np.empty(0, dtype="U16"), np.empty(0, dtype=np.int64), np.empty((0, 2)))
        else:
            out = (np.concatenate(ids_list), np.concatenate(rank_list), np.concatenate(xy_list))
        if len(self._gather_cache) > 4096:
            self._gather_cache.clear()
        self._gather_cache[key] = out
        return out

    def _query_one(self, cell: int, qx: float, qy: float, k: int):
        ring = 1
        world = 1 << self.level
        while True:
            cand_ids, cand_rank, cand_xy = self._gather(cell, ring)
            exhausted = ring >= world
            if len(cand_ids) < k and not exhausted:
                ring *= 2
                continue
            d2 = (cand_xy[:, 0] - qx) ** 2 + (cand_xy[:, 1] - qy) ** 2
            sel = np.lexsort((cand_rank, d2))[:k]
            if exhausted or len(sel) == 0:
                return cand_ids[sel], np.sqrt(d2[sel])
            kth = float(np.sqrt(d2[sel[-1]]))
            if kth <= ring * self.cell_edge:
                return cand_ids[sel], np.sqrt(d2[sel])
            ring = max(ring + 1, int(np.ceil(kth / self.cell_edge)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = np.asarray(batch["cx"], dtype=np.float64)
        qy = np.asarray(batch["cy"], dtype=np.float64)
        ks = np.asarray(batch["k"], dtype=np.int64)
        qids = batch["query_id"].to_pylist()
        qcell = CL.cell_of_meters(qx, qy, self.level)

        out_q, out_rank, out_id, out_d = [], [], [], []
        for i in range(len(qids)):
            ids, dists = self._query_one(int(qcell[i]), float(qx[i]), float(qy[i]), int(ks[i]))
            for rank in range(len(ids)):
                out_q.append(qids[i])
                out_rank.append(rank)
                out_id.append(str(ids[rank]))
                out_d.append(float(dists[rank]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.string()),
                "rank": pa.array(out_rank, pa.int32()),
                "image_id": pa.array(out_id, pa.string()),
                "dist": pa.array(out_d, pa.float64()),
            }
        )


_STAGE_CACHE: dict = {}


def knn_batch(batch: pa.Table, index_ref) -> pa.Table:
    """Task-pool form of KnnStage with a per-worker-process index cache."""
    key = index_ref.hex() if hasattr(index_ref, "hex") else id(index_ref)
    stage = _STAGE_CACHE.get(key)
    if stage is None:
        _STAGE_CACHE.clear()
        stage = KnnStage(index_ref)
        _STAGE_CACHE[key] = stage
    return stage(batch)
