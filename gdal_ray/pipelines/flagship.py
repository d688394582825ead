"""Flagship end-to-end pipeline: decode + cell encode + PIP join + tile assign.

This is the BASELINE.json headline metric pipeline (images/sec end-to-end)
re-expressed Ray-Data-first. Headline path (flagship_single_pass) has NO
shuffle and no mid-pipeline materialization:

    read images shards (parallel, include_paths)
      ─▶ co-partitioned placements merge (worker-cached shard lookup)
      ─▶ decode_stats (stateless task pool; drops bytes)
      ─▶ add_centroid/add_bbox/add_cell (fused vectorized stages)
      ─▶ per-batch: explode_tiles  +  pip_join_batch(broadcast polygon index)
      ─▶ tagged (tile | pip) rows, streamed to the consumer

The general hash-shuffle join path remains for non-co-sharded tables
(join_strategy="hash"); the shuffle PIP variant with hot-cell salting
lives in stages/pipjoin.pip_join_shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from gdal_ray.config import CELL_LEVEL, IMAGE_BATCH, META_BATCH, TILE_ZOOMS
from gdal_ray.sources import corpus as SRC
from gdal_ray.stages import geo as G
from gdal_ray.stages.pipjoin import build_polygon_cell_index, pip_join_batch
from gdal_ray.stages.knn import build_centroid_cell_index, knn_batch

__all__ = [
    "decoded_meta",
    "placed_images",
    "tile_assignments",
    "pip_join_images",
    "knn_images",
    "flagship",
]


def _default_partitions() -> int:
    """Hash-join partition count.

    The join's shuffle aggregators are ACTORS holding a CPU each: sizing
    them at ~cpus/4 leaves the upstream decode/read task pools enough
    slots to stream (measured on 20k images @32 CPUs: 8 partitions -> 22 s,
    32 partitions -> 163 s from aggregator starvation). On a multi-node
    cluster scale this with aggregate cores, not per-node cores.
    """
    import ray as _r

    try:
        cpus = int(_r.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(4, min(16, cpus // 4))


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


def _copart_shards(corpus_dir: str):
    """Aligned (images, placements) shard pairs, or None if not co-sharded."""
    import os

    ip = os.path.join(corpus_dir, "images.parquet")
    pp = os.path.join(corpus_dir, "placements.parquet")
    if not (os.path.isdir(ip) and os.path.isdir(pp)):
        return None
    a = sorted(os.listdir(ip))
    b = sorted(os.listdir(pp))
    if a != b:
        return None
    return [(os.path.join(ip, f), os.path.join(pp, f)) for f in a]


# per-worker cache of placements shards (path -> {image_id: row_idx} + table)
_PLC_CACHE: dict = {}


def _plc_shard(path: str):
    ent = _PLC_CACHE.get(path)
    if ent is None:
        import pyarrow.parquet as pq

        from gdal_ray.sources.corpus import _split_gt

        t = _split_gt(pq.read_table(path))
        idx = {v: i for i, v in enumerate(t["image_id"].to_pylist())}
        if len(_PLC_CACHE) > 64:
            _PLC_CACHE.clear()
        ent = (t, idx)
        _PLC_CACHE[path] = ent
    return ent


def _merge_placements(batch: pa.Table, plc_dir: str) -> pa.Table:
    """Co-partitioned merge: each image row pulls its placement row from the
    like-named placements shard (worker-cached). No shuffle; batches may
    span shard boundaries."""
    import os

    paths = batch["path"].to_pylist()
    batch = batch.drop_columns(["path"])
    out_parts = []
    pos = 0
    n = len(paths)
    while pos < n:
        end = pos
        p = paths[pos]
        while end < n and paths[end] == p:
            end += 1
        sub = batch.slice(pos, end - pos)
        t, idx = _plc_shard(os.path.join(plc_dir, os.path.basename(p)))
        take = pa.array([idx[v] for v in sub["image_id"].to_pylist()], pa.int64())
        merged = sub
        for name in t.column_names:
            if name != "image_id":
                merged = merged.append_column(name, t[name].take(take))
        out_parts.append(merged)
        pos = end
    return pa.concat_tables(out_parts, promote_options="default")


def _shard_units(corpus_dir: str):
    """(img shard, plc shard, row_group) work units from the co-sharded
    layout — one unit per row group so task granularity is a multiple of
    core count. Driver cost is a metadata scan of the SHARD LIST (bounded
    by shard count, not row count — at 100 TB this comes from the table
    manifest the same way)."""
    pairs = _copart_shards(corpus_dir)
    if pairs is None:
        return None
    import pyarrow.parquet as pq

    units = []
    for imgp, plcp in pairs:
        nrg = pq.ParquetFile(imgp).metadata.num_row_groups
        for rg in range(nrg):
            units.append({"img_path": imgp, "plc_path": plcp, "rg": rg})
    return units


# lazy-plan cache: the fused source's driver-side setup (shard metadata scan
# + 1-row-per-unit block creation) is identical across executions of the same
# corpus; a Dataset is a reusable lazy plan, so build it once per process.
# Keys include the Ray session (job id) — a ray.shutdown()/init() cycle in
# the same process must NOT resurrect refs owned by the dead session.
_FUSED_CACHE: dict = {}


def _session_key() -> str:
    try:
        return ray.get_runtime_context().get_job_id()
    except Exception:
        return "nosession"


def placed_images_fused(corpus_dir: str, keep_pixels: bool = False) -> rd.Dataset:
    """Fused read+merge+decode+geo source: each task reads ONE row group of
    its images shard directly from storage, merges the like-named
    placements shard (worker-cached), decodes, and emits metadata rows.

    The raw image payload NEVER enters the object store — on a single box
    that removes the shared plasma put/get of the full corpus (the
    non-scaling residual in the 8->32 CPU proxy); on a real cluster it is
    exactly the "decode at the source, ship only metadata" layout a 100 TB
    run needs (each node reads its own shards from storage).
    """
    from gdal_ray.stages.decode import decode_stats

    sess = _session_key()
    cached = _FUSED_CACHE.get((sess, corpus_dir, keep_pixels))
    if cached is not None:
        return cached

    units = _shard_units(corpus_dir)
    if units is None:
        raise ValueError(
            f"placed_images_fused requires the co-sharded images/placements "
            f"layout (like-named part files) under {corpus_dir!r}; use "
            f"placed_images(..., join_strategy='hash') for non-co-sharded tables"
        )
    ds = rd.from_items(units, override_num_blocks=len(units))

    def load(batch: pa.Table) -> pa.Table:
        import os

        import pyarrow.parquet as pq

        outs = []
        for img_path, plc_path, rg in zip(
            batch["img_path"].to_pylist(),
            batch["plc_path"].to_pylist(),
            batch["rg"].to_pylist(),
        ):
            # use_threads=False: each task owns ONE CPU slot; pyarrow's
            # internal thread pool would oversubscribe against the 31 other
            # concurrent tasks on the box
            t = pq.ParquetFile(img_path).read_row_group(rg, use_threads=False)
            plc_t, idx = _plc_shard(plc_path)
            take = pa.array([idx[v] for v in t["image_id"].to_pylist()], pa.int64())
            for name in plc_t.column_names:
                if name != "image_id":
                    t = t.append_column(name, plc_t[name].take(take))
            t = decode_stats(t, keep_pixels=keep_pixels)
            t = G.add_cell(G.add_bbox_meters(G.add_centroid_meters(t)))
            outs.append(t)
        return pa.concat_tables(outs, promote_options="default")

    out = ds.map_batches(load, batch_format="pyarrow", batch_size=None)
    if len(_FUSED_CACHE) > 8:
        _FUSED_CACHE.clear()
    _FUSED_CACHE[(sess, corpus_dir, keep_pixels)] = out
    return out


def fused_image_apply(
    corpus_dir: str,
    kernel,
    *,
    columns: list | None = None,
    with_placements: bool = True,
) -> rd.Dataset:
    """Run ``kernel(table) -> table`` INSIDE each read task over one images
    row group (merged with its like-named placements shard when
    ``with_placements``). The raw image payload never enters the object
    store — only the kernel's (small) output rows do. This is the general
    form of the flagship's fused source for per-image raster queries
    (warp, global stats, histogram, …).

    ``kernel`` must return a correctly-TYPED table for empty input (it is
    called even when a filter inside leaves zero rows, so every block
    carries the output schema). Falls back to the unfused
    read→merge→kernel plan when the corpus is not co-sharded.
    """
    import os

    units = _shard_units(corpus_dir)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    if units is not None and len(units) < cpus:
        # too few row groups to keep the box busy at one-task-per-row-group
        # granularity (tiny corpus): the unfused read parallelizes across
        # batches instead. At scale the row-group count dwarfs the core
        # count and the fused path always wins.
        units = None
    if units is None:
        # non-co-sharded corpus: the general (unfused) plan
        src = rd.read_parquet(
            os.path.join(corpus_dir, "images.parquet"),
            columns=columns,
            include_paths=with_placements,
        )
        if with_placements:
            src = src.map_batches(
                _merge_placements,
                fn_kwargs={"plc_dir": os.path.join(corpus_dir, "placements.parquet")},
                batch_format="pyarrow",
                batch_size=IMAGE_BATCH,
            )
        return src.map_batches(kernel, batch_format="pyarrow", batch_size=None)

    ds = rd.from_items(units, override_num_blocks=len(units))
    cols = columns
    if with_placements and cols is not None and "image_id" not in cols:
        cols = ["image_id"] + list(cols)

    def load(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for img_path, plc_path, rg in zip(
            batch["img_path"].to_pylist(),
            batch["plc_path"].to_pylist(),
            batch["rg"].to_pylist(),
        ):
            t = pq.ParquetFile(img_path).read_row_group(
                rg, columns=cols, use_threads=False
            )
            if with_placements:
                plc_t, idx = _plc_shard(plc_path)
                take = pa.array(
                    [idx[v] for v in t["image_id"].to_pylist()], pa.int64()
                )
                for name in plc_t.column_names:
                    if name != "image_id":
                        t = t.append_column(name, plc_t[name].take(take))
            outs.append(kernel(t))
        return pa.concat_tables(outs, promote_options="default")

    return ds.map_batches(load, batch_format="pyarrow", batch_size=None)


def placed_images(
    corpus_dir: str,
    decode: bool = True,
    num_partitions: int | None = None,
    join_strategy: str = "auto",
) -> rd.Dataset:
    """(decoded) images ⋈ placements with centroid/bbox/cell columns added.

    join_strategy:
      - "copartition" (default when shard layouts align): storage-level
        merge, one task per shard pair, NO shuffle — the Lance-style
        "placement columns live with the payload" layout;
      - "hash": Ray's hash-shuffle join (the general path when the two
        tables are not co-sharded).
    """
    import os

    pairs = _copart_shards(corpus_dir) if join_strategy in ("auto", "copartition") else None
    if pairs and decode:
        # fully-fused source: payload never enters the object store
        return placed_images_fused(corpus_dir)
    if pairs:
        cols = None if decode else ["image_id", "w", "h"]
        src = rd.read_parquet(
            os.path.join(corpus_dir, "images.parquet"), columns=cols, include_paths=True
        )
        joined = src.map_batches(
            _merge_placements,
            fn_kwargs={"plc_dir": os.path.join(corpus_dir, "placements.parquet")},
            batch_format="pyarrow",
            batch_size=IMAGE_BATCH,
        )
        if decode:
            from gdal_ray.stages.decode import decode_stats

            joined = joined.map_batches(
                decode_stats, batch_format="pyarrow", batch_size=IMAGE_BATCH
            )
    else:
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
    # batch_size=None: operate on whole incoming blocks. These cheap
    # vectorized stages FUSE with the upstream decode chain; a large
    # explicit batch_size would make the fused task bundler wait for that
    # many rows and collapse the whole pipeline into one task.
    return (
        joined.map_batches(G.add_centroid_meters, batch_format="pyarrow", batch_size=None)
        .map_batches(G.add_bbox_meters, batch_format="pyarrow", batch_size=None)
        .map_batches(G.add_cell, batch_format="pyarrow", batch_size=None)
    )


def tile_assignments(placed: rd.Dataset, zooms=TILE_ZOOMS) -> rd.Dataset:
    return placed.map_batches(
        lambda b: G.explode_tiles(b, zooms), batch_format="pyarrow", batch_size=None
    )


_POLY_INDEX_CACHE: dict = {}


def _polygon_index_ref(corpus_dir: str):
    # small side: read + index on the driver (plain pyarrow, no Ray job),
    # broadcast ONCE per process via ray.put (a long-lived service holds the
    # broadcast handle; rebuilding per query call would re-ship it)
    import pyarrow.parquet as pq

    key = (_session_key(), corpus_dir)
    ref = _POLY_INDEX_CACHE.get(key)
    if ref is None:
        table = pq.read_table(f"{corpus_dir}/polygons.parquet", columns=["poly_id", "wkb"])
        ref = ray.put(build_polygon_cell_index(table, CELL_LEVEL))
        if len(_POLY_INDEX_CACHE) > 8:
            _POLY_INDEX_CACHE.clear()
        _POLY_INDEX_CACHE[key] = ref
    return ref


def pip_join_images(placed: rd.Dataset, corpus_dir: str, concurrency=(1, 4)) -> rd.Dataset:
    """Image centroids vs polygon layer -> (src_id, poly_id) rows."""
    index_ref = _polygon_index_ref(corpus_dir)
    pts = placed.select_columns(["image_id", "cx", "cy", "cell"]).rename_columns(
        {"image_id": "src_id"}
    )
    return pts.map_batches(
        pip_join_batch,
        fn_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=None,
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
        pip_join_batch,
        fn_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=None,
    )


def _image_centroids(corpus_dir: str):
    """(image_id array, cx, cy) image centroids in EPSG:3857 meters —
    metadata-only (ids + geotransforms), built from the two parquet files
    with the same centroid kernel used everywhere else."""
    import pyarrow.parquet as pq

    imgs = pq.read_table(
        f"{corpus_dir}/images.parquet", columns=["image_id", "w", "h"]
    ).to_pandas()
    plc = pq.read_table(f"{corpus_dir}/placements.parquet").to_pandas()
    meta_df = imgs.merge(plc, on="image_id")
    gt = np.stack(meta_df["gt"].to_numpy())
    w = meta_df["w"].to_numpy(dtype=np.float64)
    h = meta_df["h"].to_numpy(dtype=np.float64)
    cx = gt[:, 0] + (w / 2) * gt[:, 1] + (h / 2) * gt[:, 2]
    cy = gt[:, 3] + (w / 2) * gt[:, 4] + (h / 2) * gt[:, 5]
    from gdal_ray.geo import mercator as M

    deg = (meta_df["srs"] == "EPSG:4326").to_numpy()
    if deg.any():
        mx, my = M.latlon_to_meters(cy[deg], cx[deg])
        cx[deg] = mx
        cy[deg] = my
    return meta_df["image_id"].to_numpy(), cx, cy


def _corpus_num_images(corpus_dir: str) -> int:
    """Image row count from parquet footer metadata only (no data read)."""
    import os

    import pyarrow.parquet as pq

    p = os.path.join(corpus_dir, "images.parquet")
    if os.path.isdir(p):
        return sum(pq.ParquetFile(os.path.join(p, f)).metadata.num_rows
                   for f in os.listdir(p))
    return pq.ParquetFile(p).metadata.num_rows


def knn_images(corpus_dir: str, concurrency=(1, 4)) -> rd.Dataset:
    """query_points kNN against image centroids -> (query_id, rank, image_id, dist).

    Broadcast fast path for reference sides up to KNN_BROADCAST_MAX rows:
    the index is metadata-only (id + centroid), built on the driver and
    broadcast once. Above the cap this routes to ``knn_images_shuffle``
    automatically (same output through the co-partitioned plan) — the
    driver-side `_image_centroids` materialization is a deliberate
    small-side-only step, never applied to a corpus-scale table."""
    from gdal_ray.config import KNN_BROADCAST_MAX

    if _corpus_num_images(corpus_dir) > KNN_BROADCAST_MAX:
        return knn_images_shuffle(corpus_dir)
    ids, cx, cy = _image_centroids(corpus_dir)
    index_ref = ray.put(build_centroid_cell_index(ids, cx, cy))

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
        knn_batch,
        fn_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=1024,
    )


def knn_images_shuffle(corpus_dir: str) -> rd.Dataset:
    """kNN through the co-partitioned shuffle path (``knn_shuffle``): no
    driver-built index, no broadcast of the point side — the 10^12-image
    plan. Output identical to ``knn_images``."""
    import pyarrow.parquet as pq

    from gdal_ray.stages.knn import knn_shuffle

    points = placed_images(corpus_dir, decode=False).map_batches(
        lambda b: b.select(["image_id", "cx", "cy"]), batch_format="pyarrow"
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
    kmax = int(
        pq.read_table(f"{corpus_dir}/query_points.parquet", columns=["k"])["k"]
        .to_pandas()
        .max()
    )
    return knn_shuffle(points, queries, k=kmax)


def flagship(corpus_dir: str, zooms=TILE_ZOOMS):
    """Full headline pipeline; returns dict of result Datasets (lazy)."""
    placed = placed_images(corpus_dir, decode=True)
    tiles = tile_assignments(placed, zooms)
    pip = pip_join_images(placed, corpus_dir)
    return {"placed": placed, "tiles": tiles, "pip": pip}


def flagship_single_pass(corpus_dir: str, zooms=TILE_ZOOMS) -> rd.Dataset:
    """The headline pipeline as ONE streaming Dataset (no mid-pipeline
    materialization, one execution): every placed+decoded batch emits its
    tile-assignment rows AND its PIP join rows, tagged by ``kind``.

    Output schema: (kind: 'tile'|'pip', src_id, z, x, y, poly_id) with
    nulls in the columns the row kind doesn't use.
    """
    index_ref = _polygon_index_ref(corpus_dir)
    placed = placed_images(corpus_dir, decode=True)

    def both(batch: pa.Table) -> pa.Table:
        tiles = G.explode_tiles(batch, zooms)
        pts = pa.table(
            {
                "src_id": batch["image_id"],
                "cx": batch["cx"],
                "cy": batch["cy"],
                "cell": batch["cell"],
            }
        )
        pip = pip_join_batch(pts, index_ref)
        n_t = tiles.num_rows
        n_p = pip.num_rows
        return pa.table(
            {
                "kind": pa.array(["tile"] * n_t + ["pip"] * n_p, pa.string()),
                "src_id": pa.concat_arrays(
                    [tiles["image_id"].combine_chunks(), pip["src_id"].combine_chunks()]
                ),
                "z": pa.concat_arrays(
                    [tiles["z"].combine_chunks(), pa.nulls(n_p, pa.int32())]
                ),
                "x": pa.concat_arrays(
                    [tiles["x"].combine_chunks(), pa.nulls(n_p, pa.int64())]
                ),
                "y": pa.concat_arrays(
                    [tiles["y"].combine_chunks(), pa.nulls(n_p, pa.int64())]
                ),
                "poly_id": pa.concat_arrays(
                    [pa.nulls(n_t, pa.string()), pip["poly_id"].combine_chunks()]
                ),
            }
        )

    return placed.map_batches(both, batch_format="pyarrow", batch_size=None)
