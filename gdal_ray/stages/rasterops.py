"""Raster-processing stages over the rasters/images tables (stateless
`map_batches` wrappers around gdal_ray.raster.kernels)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray.raster import kernels as K
from gdal_ray.raster.checksum import checksum_image

__all__ = ["dem_metrics_batch", "resample_roundtrip_batch", "global_stats_partials", "histogram_partials"]


def _grids(batch: pa.Table):
    pix = batch["pixels"].to_pylist()
    ws = batch["w"].to_pylist()
    hs = batch["h"].to_pylist()
    for i in range(len(pix)):
        yield batch["raster_id"][i].as_py(), np.asarray(pix[i], dtype=np.float64).reshape(
            hs[i], ws[i]
        )


def dem_metrics_batch(batch: pa.Table) -> pa.Table:
    """rasters -> hillshade/slope/TRI/TPI/roughness/color-relief
    checksums + means.

    The per-image embarrassingly-parallel form of gdaldem
    (apps/gdaldem_lib.cpp:3530); checksums give a compact exactness probe
    (autotest golden-value style)."""
    rows = {
        "raster_id": [],
        "hillshade_cksum": [],
        "slope_mean": [],
        "aspect_mean": [],
        "tri_mean": [],
        "tpi_mean": [],
        "roughness_max": [],
        "color_relief_cksum": [],
    }
    from gdal_ray.raster.color import color_relief, parse_color_ramp

    for rid, dem in _grids(batch):
        hs = K.hillshade(dem, ewres=1.0, nsres=-1.0)
        rows["raster_id"].append(rid)
        rows["hillshade_cksum"].append(checksum_image(hs))
        rows["slope_mean"].append(float(K.slope_horn(dem).mean()))
        a = K.aspect(dem)
        rows["aspect_mean"].append(float(a[a != -9999.0].mean()) if (a != -9999.0).any() else 0.0)
        rows["tri_mean"].append(float(K.tri(dem).mean()))
        rows["tpi_mean"].append(float(K.tpi(dem).mean()))
        rows["roughness_max"].append(float(K.roughness(dem).max()))
        lo, hi = float(dem.min()), float(dem.max())
        ramp = parse_color_ramp(
            "0% 0 50 0\n50% 120 200 80\n100% 255 255 255",
            src_min=lo, src_max=hi if hi > lo else lo + 1.0,
        )
        rgba = color_relief(dem, ramp)
        rows["color_relief_cksum"].append(
            checksum_image(rgba[..., 0]) ^ checksum_image(rgba[..., 1])
            ^ checksum_image(rgba[..., 2])
        )
    return pa.table(
        {
            "raster_id": pa.array(rows["raster_id"], pa.string()),
            "hillshade_cksum": pa.array(rows["hillshade_cksum"], pa.int32()),
            "slope_mean": pa.array(rows["slope_mean"]),
            "aspect_mean": pa.array(rows["aspect_mean"]),
            "tri_mean": pa.array(rows["tri_mean"]),
            "tpi_mean": pa.array(rows["tpi_mean"]),
            "roughness_max": pa.array(rows["roughness_max"]),
            "color_relief_cksum": pa.array(rows["color_relief_cksum"], pa.int32()),
        }
    )


def resample_roundtrip_batch(batch: pa.Table) -> pa.Table:
    """rasters -> 2x bilinear upsample -> 2x box downsample -> checksums
    (warp/overview kernel probe; gdalwarp -r bilinear + AVERAGE overview)."""
    rows = {"raster_id": [], "orig_cksum": [], "up_cksum": [], "down_cksum": []}
    for rid, dem in _grids(batch):
        up = K.resample_bilinear(dem, dem.shape[0] * 2, dem.shape[1] * 2)
        down = K.resample_average(up, 2)
        rows["raster_id"].append(rid)
        rows["orig_cksum"].append(checksum_image(dem))
        rows["up_cksum"].append(checksum_image(up))
        rows["down_cksum"].append(checksum_image(down))
    return pa.table(
        {
            "raster_id": pa.array(rows["raster_id"], pa.string()),
            "orig_cksum": pa.array(rows["orig_cksum"], pa.int32()),
            "up_cksum": pa.array(rows["up_cksum"], pa.int32()),
            "down_cksum": pa.array(rows["down_cksum"], pa.int32()),
        }
    )


def global_stats_partials(batch: pa.Table) -> pa.Table:
    """Decoded images -> per-batch partial (n, sum, sumsq, min, max) over
    pixel values; a tiny final aggregate yields exact GLOBAL band stats
    (two-phase form of gcore/gdalrasterband.cpp:5157 ComputeStatistics).

    Partials are INTEGER (uint8 pixels -> int64 sums are exact), so the
    distributed tree reduction is order-independent — the mean/std a
    consumer derives from them is bit-stable across runs. int64 holds
    sumsq for ~1.4e14 pixels per final aggregate; beyond that, shard the
    aggregate per partition key."""
    from gdal_ray.io import codec as C

    blobs = batch["bytes"].to_pylist()
    fmts = batch["fmt"].to_pylist()
    n = 0
    s = 0
    ss = 0
    mn = 1 << 30
    mx = -(1 << 30)
    for i in range(len(blobs)):
        img = C.decode_image(blobs[i], fmts[i]).astype(np.int64)
        n += img.size
        s += int(img.sum())
        ss += int((img * img).sum())
        mn = min(mn, int(img.min()))
        mx = max(mx, int(img.max()))
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "sum": pa.array([s], pa.int64()),
            "sumsq": pa.array([ss], pa.int64()),
            "min": pa.array([mn], pa.int64()),
            "max": pa.array([mx], pa.int64()),
        }
    )


def histogram_partials(batch: pa.Table, bins=256) -> pa.Table:
    """Decoded images -> one histogram-partial row per batch (vector sum
    downstream = exact global histogram, gdalrasterband.cpp:4176)."""
    from gdal_ray.io import codec as C

    blobs = batch["bytes"].to_pylist()
    fmts = batch["fmt"].to_pylist()
    acc = np.zeros(bins, dtype=np.int64)
    for i in range(len(blobs)):
        img = C.decode_image(blobs[i], fmts[i])
        acc += K.histogram(img, bins=bins)
    return pa.table({"hist": pa.array([acc.tolist()], pa.list_(pa.int64()))})
