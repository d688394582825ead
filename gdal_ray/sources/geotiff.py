"""GeoTIFF Dataset source/sink (reference GTiff driver,
``frmts/gtiff/geotiff.cpp``) over the pure-Python codec in
``gdal_ray/io/tiff.py``.

``read_geotiff_tiles`` emits the engine's standard raster-row schema —
(raster_id, pixels, w, h, gt) — ONE ROW PER TIFF TILE/STRIP with the
tile's own geotransform, so every existing raster stage (DEM kernels,
stats, warp, contour, ...) consumes GeoTIFF input unchanged. Sharding:
headers parse on the driver (a few KB per file); tile-index ranges
become Ray read tasks that fetch only their tiles' byte ranges.

``write_geotiff_dataset`` writes one .tif per raster row inside
``map_batches`` — a fully distributed sink (each file is independent),
atomic via rename, resumable by name."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from gdal_ray.io.tiff import read_tiff_header, read_tile, write_geotiff

__all__ = ["read_geotiff_tiles", "write_geotiff_dataset"]


def _tile_gt(gt, x0: int, y0: int):
    return [
        gt[0] + x0 * gt[1] + y0 * gt[2], gt[1], gt[2],
        gt[3] + x0 * gt[4] + y0 * gt[5], gt[4], gt[5],
    ]


def read_geotiff_tiles(paths: str | list[str], columns=None,
                       tiles_per_shard: int = 256):
    """GeoTIFF file(s) -> Dataset (raster_id, pixels: list<int|float>,
    w, h, gt), one row per tile/strip, edge tiles cropped. raster_id =
    "<stem>#<ty>_<tx>"."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = (
            sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.lower().endswith((".tif", ".tiff"))
            )
            if os.path.isdir(paths) else [paths]
        )
    shards = []
    for p in paths:
        hdr = read_tiff_header(p)
        n = len(hdr["offsets"])
        for s in range(0, n, tiles_per_shard):
            shards.append({"path": p, "lo": s, "hi": min(s + tiles_per_shard, n)})
    if not shards:
        raise ValueError("no GeoTIFF files found")

    def read_shard(batch: pd.DataFrame) -> pa.Table:
        rows = {"raster_id": [], "pixels": [], "w": [], "h": [], "gt": []}
        for path, lo, hi in zip(batch["path"], batch["lo"], batch["hi"]):
            hdr = read_tiff_header(path)
            stem = os.path.splitext(os.path.basename(path))[0]
            gt = hdr["gt"] or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]
            ntx = hdr["n_tiles_x"]
            for i in range(int(lo), int(hi)):
                ty, tx = divmod(i, ntx)
                arr = read_tile(path, hdr, i)
                # crop the format's edge padding to the image extent
                x0, y0 = tx * hdr["tile_w"], ty * hdr["tile_h"]
                arr = arr[: hdr["h"] - y0, : hdr["w"] - x0]
                # multi-band (chunky) files fan out to one standard
                # single-band row per band — the raster-row schema stays
                # fixed, band index lives in the id suffix
                per_band = (
                    [(f"{stem}#{ty}_{tx}", arr)] if arr.ndim == 2
                    else [(f"{stem}#{ty}_{tx}_b{k}", arr[:, :, k])
                          for k in range(arr.shape[2])]
                )
                for rid, band in per_band:
                    rows["raster_id"].append(rid)
                    rows["pixels"].append(
                        band.astype(np.float64 if band.dtype.kind == "f"
                                    else np.int64).ravel()
                    )
                    rows["w"].append(band.shape[1])
                    rows["h"].append(band.shape[0])
                    rows["gt"].append(_tile_gt(gt, x0, y0))
        return pa.table({
            "raster_id": pa.array(rows["raster_id"], pa.string()),
            "pixels": pa.array([r.tolist() for r in rows["pixels"]]),
            "w": pa.array(rows["w"], pa.int32()),
            "h": pa.array(rows["h"], pa.int32()),
            "gt": pa.array(rows["gt"], pa.list_(pa.float64(), 6)),
        })

    out = rd.from_pandas(pd.DataFrame(shards)).repartition(
        len(shards)
    ).map_batches(read_shard, batch_format="pandas", batch_size=None)
    return out.select_columns(columns) if columns else out


def write_geotiff_dataset(ds, out_dir: str, epsg: int | None = None,
                          dtype=np.int32, tile: int = 256,
                          compress: str = "deflate"):
    """Dataset (raster_id, pixels, w, h, gt) -> one .tif per row under
    ``out_dir`` (distributed sink: each file writes inside its task,
    atomic rename, skip-if-present for resume). Returns the per-file
    summary Dataset — consume it to drive the write."""
    os.makedirs(out_dir, exist_ok=True)

    def write_row(batch: pd.DataFrame) -> pd.DataFrame:
        names = []
        for _, r in batch.iterrows():
            arr = np.asarray(r["pixels"], dtype=dtype).reshape(
                int(r["h"]), int(r["w"])
            )
            name = f"{r['raster_id']}.tif"
            final = os.path.join(out_dir, name)
            if not os.path.exists(final):
                tmp = final + ".tmp"
                write_geotiff(tmp, arr, list(r["gt"]), epsg=epsg,
                              tile=tile, compress=compress)
                os.replace(tmp, final)
            names.append(name)
        return pd.DataFrame({"file": names,
                             "n_px": batch["w"].to_numpy(dtype=np.int64)
                             * batch["h"].to_numpy(dtype=np.int64)})

    return ds.map_batches(write_row, batch_format="pandas")
