"""Flagship end-to-end pipeline: decode + cell encode + PIP join + tile assign.

This is the BASELINE.json headline metric pipeline (images/sec end-to-end)
re-expressed Ray-Data-first:

    read images ──▶ DecodeStats actor pool (drops bytes)──┐
    read placements ──────────────────────────────────────┤ hash join on image_id
                                                          ▼
                                 add_centroid_meters + add_bbox + add_cell
                                   │                          │
                 PipJoinStage (broadcast polygon cell index)  explode_tiles
                                   │                          │
                           (src_id, poly_id) rows      (image_id, z, x, y) rows

No full materialization: every edge is a streaming Dataset; the only
collected objects are the broadcast polygon index (small side) and final
result samples/counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from gdal_ray.config import CELL_LEVEL, IMAGE_BATCH, META_BATCH, TILE_ZOOMS
from gdal_ray.sources import corpus as SRC
from gdal_ray.stages import geo as G
from gdal_ray.stages.pipjoin import PipJoinStage, build_polygon_cell_index
from gdal_ray.stages.knn import KnnStage, build_centroid_cell_index

__all__ = [
    "decoded_meta",
    "placed_images",
    "tile_assignments",
    "pip_join_images",
    "knn_images",
    "flagship",
]


def _default_partitions() -> int:
    import ray as _r

    try:
        return max(2, min(32, int(_r.cluster_resources().get("CPU", 8))))
    except Exception:
        return 8


def decoded_meta(corpus_dir: str, keep_pixels=False) -> rd.Dataset:
    """images -> decoded per-image metrics (bytes dropped).

    Decode is stateless -> plain task pool (elastic, no actor reservation
    that could starve the join's shuffle aggregators on small clusters)."""
    from gdal_ray.stages.decode import decode_stats

    images = SRC.read_images(corpus_dir)
    return images.map_batches(
        decode_stats,
        fn_kwargs={"keep_pixels": keep_pixels},
        batch_format="pyarrow",
        batch_size=IMAGE_BATCH,
    )


def placed_images(corpus_dir: str, decode: bool = True, num_partitions: int | None = None) -> rd.Dataset:
    """(decoded) images ⋈ placements with centroid/bbox/cell columns added."""
    if decode:
        left = decoded_meta(corpus_dir)
    else:
        left = SRC.read_images(corpus_dir, columns=["image_id", "w", "h"])
    placements = SRC.read_placements(corpus_dir)
    joined = left.join(
        placements,
        join_type="inner",
        num_partitions=num_partitions or _default_partitions(),
        on=("image_id",),
    )
    return (
        joined.map_batches(G.add_centroid_meters, batch_format="pyarrow", batch_size=META_BATCH)
        .map_batches(G.add_bbox_meters, batch_format="pyarrow", batch_size=META_BATCH)
        .map_batches(G.add_cell, batch_format="pyarrow", batch_size=META_BATCH)
    )


def tile_assignments(placed: rd.Dataset, zooms=TILE_ZOOMS) -> rd.Dataset:
    return placed.map_batches(
        lambda b: G.explode_tiles(b, zooms), batch_format="pyarrow", batch_size=META_BATCH
    )


def _polygon_index_ref(corpus_dir: str):
    # small side: collect once on the driver, broadcast via ray.put
    polys = SRC.read_polygons(corpus_dir, columns=["poly_id", "wkb"])
    table = pa.concat_tables(ray.get(polys.to_arrow_refs()), promote_options="default")
    return ray.put(build_polygon_cell_index(table, CELL_LEVEL))


def pip_join_images(placed: rd.Dataset, corpus_dir: str, concurrency=(1, 4)) -> rd.Dataset:
    """Image centroids vs polygon layer -> (src_id, poly_id) rows."""
    index_ref = _polygon_index_ref(corpus_dir)
    pts = placed.select_columns(["image_id", "cx", "cy", "cell"]).rename_columns(
        {"image_id": "src_id"}
    )
    return pts.map_batches(
        PipJoinStage,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=META_BATCH,
        concurrency=concurrency,
        num_cpus=1,
    )


def pip_join_query_points(corpus_dir: str, concurrency=(1, 4)) -> rd.Dataset:
    """query_points vs polygon layer (same broadcast join, no decode)."""
    index_ref = _polygon_index_ref(corpus_dir)

    def prep(batch: pa.Table) -> pa.Table:
        from gdal_ray.geo import mercator as M
        from gdal_ray.geo import cells as CL

        mx, my = M.latlon_to_meters(np.asarray(batch["lat"]), np.asarray(batch["lon"]))
        cell = CL.cell_of_meters(mx, my, CELL_LEVEL)
        return pa.table(
            {
                "src_id": batch["query_id"],
                "cx": pa.array(mx),
                "cy": pa.array(my),
                "cell": pa.array(cell),
            }
        )

    pts = SRC.read_query_points(corpus_dir, columns=["query_id", "lon", "lat"]).map_batches(
        prep, batch_format="pyarrow", batch_size=META_BATCH
    )
    return pts.map_batches(
        PipJoinStage,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=META_BATCH,
        concurrency=concurrency,
        num_cpus=1,
    )


def knn_images(corpus_dir: str, concurrency=(1, 4)) -> rd.Dataset:
    """query_points kNN against image centroids -> (query_id, rank, image_id, dist)."""
    placed = placed_images(corpus_dir, decode=False)
    meta = pa.concat_tables(
        ray.get(placed.select_columns(["image_id", "cx", "cy"]).to_arrow_refs()),
        promote_options="default",
    )
    index_ref = ray.put(
        build_centroid_cell_index(
            np.asarray(meta["image_id"]), np.asarray(meta["cx"]), np.asarray(meta["cy"])
        )
    )

    def prep(batch: pa.Table) -> pa.Table:
        from gdal_ray.geo import mercator as M

        mx, my = M.latlon_to_meters(np.asarray(batch["lat"]), np.asarray(batch["lon"]))
        return pa.table(
            {
                "query_id": batch["query_id"],
                "cx": pa.array(mx),
                "cy": pa.array(my),
                "k": batch["k"],
            }
        )

    queries = SRC.read_query_points(corpus_dir).map_batches(
        prep, batch_format="pyarrow", batch_size=META_BATCH
    )
    return queries.map_batches(
        KnnStage,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
        num_cpus=1,
    )


def flagship(corpus_dir: str, zooms=TILE_ZOOMS):
    """Full headline pipeline; returns dict of result Datasets (lazy)."""
    placed = placed_images(corpus_dir, decode=True)
    tiles = tile_assignments(placed, zooms)
    pip = pip_join_images(placed, corpus_dir)
    return {"placed": placed, "tiles": tiles, "pip": pip}
