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

__all__ = ["build_centroid_cell_index", "KnnStage", "knn_batch", "knn_shuffle"]


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


def knn_shuffle(points_ds, queries_ds, k: int, level: int = CELL_LEVEL, num_buckets: int = 64):
    """Co-partitioned exact kNN — the 10^12-scale path (no broadcast of the
    point side, no driver-built index). Mirrors ``pip_join_shuffle``'s plan;
    reference semantics ``alg/gdalgrid.cpp:896-923`` (expanding-radius
    nearest search) expressed as shuffle stages:

    1. per-cell point counts: a small ``groupby(cell).count()`` (bounded by
       4^level entries, NOT by point count) broadcast via ``ray.put``;
    2. each query picks ring ``r`` = smallest Chebyshev radius whose k-ring
       holds >= k points, then is REPLICATED to every cell within the
       guarantee radius ``R = ceil((r+1)*sqrt(2)) + 1``: any k points within
       ring r sit at Euclidean distance <= (r+1)*sqrt(2)*cell_edge of the
       query, and a ring-R' cell is at least (R'-1)*cell_edge away, so the
       true k nearest all lie inside ring R;
    3. points and replicated queries co-shuffle on cell (bucketed) and each
       partition emits per-cell partial top-k under the total order
       (d2, point_id);
    4. a tiny ``groupby(query_id)`` merge yields the exact global top-k.

    points_ds columns: (image_id, cx, cy); queries_ds: (query_id, cx, cy)
    plus an optional per-row ``k`` column (values must be <= the stage-level
    ``k``, which is the replication/partial-top-k cap).
    Output: (query_id, rank, image_id, dist) — identical to ``KnnStage``.
    """
    import pandas as pd

    from gdal_ray.ops.shuffle import bucketed_group_apply

    def add_cell(batch: pa.Table, xcol="cx", ycol="cy") -> pa.Table:
        cell = CL.cell_of_meters(
            np.asarray(batch[xcol], dtype=np.float64),
            np.asarray(batch[ycol], dtype=np.float64),
            level,
        )
        if "cell" in batch.column_names:
            batch = batch.drop_columns(["cell"])
        return batch.append_column("cell", pa.array(cell))

    # The keyed point table is NOT materialized: only the per-cell
    # histogram (<= 4^level rows, tiny) persists, and the point stream
    # re-executes for the candidate shuffle. At 10^12 rows a materialize
    # here would pin ~30 TB of metadata in the object store just to save
    # one column-pruned re-scan of the source — re-streaming is the
    # scale-correct trade (callers with an expensive upstream can
    # .materialize() their input themselves before passing it in).
    pts = points_ds.map_batches(add_cell, batch_format="pyarrow")
    # phase 1: per-cell histogram (small: <= 4^level rows)
    cnt = pts.groupby("cell").count().to_pandas()
    counts = dict(zip(cnt["cell"].astype(np.int64), cnt["count()"].astype(np.int64)))
    total = int(sum(counts.values()))
    counts_ref = ray.put(counts)
    world = 1 << level

    def replicate(batch: pa.Table) -> pa.Table:
        cmap = ray.get(counts_ref)
        qx = np.asarray(batch["cx"], dtype=np.float64)
        qy = np.asarray(batch["cy"], dtype=np.float64)
        qid = batch["query_id"].to_pylist()
        qk = (
            np.asarray(batch["k"], dtype=np.int64)
            if "k" in batch.column_names
            else np.full(len(qid), k, dtype=np.int64)
        )
        qcell = CL.cell_of_meters(qx, qy, level)
        out = {"query_id": [], "cx": [], "cy": [], "cell": [], "kq": []}
        for i in range(len(qid)):
            kk = min(int(qk[i]), total)
            r = 1
            while r < world:
                ring = CL.k_ring(int(qcell[i]), r)
                if sum(cmap.get(int(c), 0) for c in ring) >= kk:
                    break
                r *= 2
            R = min(world, int(np.ceil((r + 1) * np.sqrt(2.0))) + 1)
            for c in CL.k_ring(int(qcell[i]), R):
                out["query_id"].append(qid[i])
                out["cx"].append(qx[i])
                out["cy"].append(qy[i])
                out["cell"].append(int(c))
                out["kq"].append(int(qk[i]))
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.string()),
                "cx": pa.array(out["cx"], pa.float64()),
                "cy": pa.array(out["cy"], pa.float64()),
                "cell": pa.array(out["cell"], pa.int64()),
                "kq": pa.array(out["kq"], pa.int64()),
            }
        )

    reps = queries_ds.map_batches(replicate, batch_format="pyarrow")

    side_p = pts.map_batches(
        lambda b: b.append_column("side", pa.array(["p"] * len(b), pa.string())),
        batch_format="pyarrow",
    )
    side_q = reps.map_batches(
        lambda b: b.append_column("side", pa.array(["q"] * len(b), pa.string())),
        batch_format="pyarrow",
    )
    both = side_p.union(side_q)

    def partial_topk(part: pd.DataFrame) -> pd.DataFrame:
        rows = {"query_id": [], "image_id": [], "d2": [], "kq": []}
        for _, g in part.groupby("cell", sort=False):
            p = g[g["side"] == "p"]
            q = g[g["side"] == "q"]
            if len(p) == 0 or len(q) == 0:
                continue
            px = p["cx"].to_numpy(dtype=np.float64)
            py = p["cy"].to_numpy(dtype=np.float64)
            pid = p["image_id"].to_numpy().astype("U")  # lexsort needs non-object dtype
            qx = q["cx"].to_numpy(dtype=np.float64)
            qy = q["cy"].to_numpy(dtype=np.float64)
            qids = q["query_id"].to_numpy()
            qks = q["kq"].to_numpy(dtype=np.int64)
            d2 = (qx[:, None] - px[None, :]) ** 2 + (qy[:, None] - py[None, :]) ** 2
            for j in range(len(qids)):
                # per-cell partial top-k under the TOTAL order (d2, image_id):
                # a per-cell head under the same total order as the final
                # merge is sufficient for global exactness
                order = np.lexsort((pid, d2[j]))[: min(int(qks[j]), len(px))]
                rows["query_id"].extend([qids[j]] * len(order))
                rows["image_id"].extend(pid[order])
                rows["d2"].extend(d2[j][order])
                rows["kq"].extend([int(qks[j])] * len(order))
        return pd.DataFrame(
            {
                "query_id": pd.Series(rows["query_id"], dtype=str),
                "image_id": pd.Series(rows["image_id"], dtype=str),
                "d2": pd.Series(rows["d2"], dtype=np.float64),
                "kq": pd.Series(rows["kq"], dtype=np.int64),
            }
        )

    partials = bucketed_group_apply(
        both, ["cell"], partial_topk, num_buckets,
        schema=pa.schema(
            [("query_id", pa.string()), ("image_id", pa.string()),
             ("d2", pa.float64()), ("kq", pa.int64())]
        ),
    )

    def merge(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["d2", "image_id"], kind="mergesort").head(int(g["kq"].iloc[0]))
        return pa.table(
            {
                "query_id": pa.array(g["query_id"].to_numpy(), pa.string()),
                "rank": pa.array(np.arange(len(g), dtype=np.int32)),
                "image_id": pa.array(g["image_id"].to_numpy(), pa.string()),
                "dist": pa.array(np.sqrt(g["d2"].to_numpy()), pa.float64()),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


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
