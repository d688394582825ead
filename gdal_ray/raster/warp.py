"""Per-image warp/reproject (dst-driven resampling).

The Ray-Data form of gdalwarp (``apps/gdalwarp_lib.cpp:1414`` +
``alg/gdalwarpoperation.cpp``): GDAL splits the DESTINATION into chunks and
pulls each chunk's source window through a transformer chain
(dst pixel -> dst SRS -> src SRS -> src pixel). Here every image row IS a
destination chunk: the output grid is computed from the source footprint
(GDALWarpCreateOutput's suggested-extent step), and each dst pixel center
maps back through the inverse chain to sample the source (nearest or
bilinear kernels — GRIORA_NearestNeighbour/Bilinear).

Supported SRS: EPSG:4326 <-> EPSG:3857 (spherical formulas,
gdal2tiles.py:422-443), EPSG:326xx/327xx UTM zones (ellipsoidal Karney
series, geo/tmerc.py — the gdalwarp benchmark pair 32631->4326,
autotest/benchmark/test_gdalwarp.py:29), LCC/Albers conics (geo/conic.py),
polar + oblique stereographic and Hotine oblique mercator (geo/stereo.py:
UPS 5041/5042, sea-ice 3413/3976, Antarctic 3031, Amersfoort 28992,
RSO Borneo 29873, and parameterized PSTA/PSTB/OSTE/HOMB strings). The
transformer seam is a single function; any pair composes through 4326 as
the pivot, exactly GDAL's transformer-chain shape (ogr/ogrct.cpp:665);
anything else delegates to pyproj when installed (import-gated).
"""

from __future__ import annotations

import numpy as np

from gdal_ray.geo import affine as A
from gdal_ray.geo import conic as CN
from gdal_ray.geo import mercator as M
from gdal_ray.geo import stereo as SO
from gdal_ray.geo import tmerc as TM

__all__ = ["suggest_output_grid", "warp_image", "warp_image_transform"]


def _pyproj_to_4326(gx, gy, srs):
    """Last-resort seam: delegate an unknown SRS to pyproj when installed
    (not shipped in this container — the import gate keeps the engine
    dependency-free; any CRS PROJ knows works transparently when it is)."""
    try:
        from pyproj import Transformer
    except ImportError:
        return None
    tr = Transformer.from_crs(srs, "EPSG:4326", always_xy=True)
    return tr.transform(gx, gy)


def _pyproj_from_4326(lon, lat, srs):
    try:
        from pyproj import Transformer
    except ImportError:
        return None
    tr = Transformer.from_crs("EPSG:4326", srs, always_xy=True)
    return tr.transform(lon, lat)


def _to_4326(gx, gy, srs):
    """any supported srs -> (lon, lat)."""
    if srs == "EPSG:4326":
        return gx, gy
    if srs == "EPSG:3857":
        lat, lon = M.meters_to_latlon(gx, gy)
        return lon, lat
    utm = TM.parse_utm_epsg(srs)
    if utm is not None:
        lat, lon = TM.utm_to_latlon(gx, gy, utm[0], utm[1])
        return lon, lat
    conic = CN.parse_conic_srs(srs)
    if conic is not None:
        inv = CN.lcc_inverse if conic[0] == "LCC" else CN.albers_inverse
        lat, lon = inv(gx, gy, *conic[1])
        return lon, lat
    stereo = SO.parse_stereo_srs(srs)
    if stereo is not None:
        lat, lon = SO.stereo_to_latlon(gx, gy, *stereo)
        return lon, lat
    ext = _pyproj_to_4326(gx, gy, srs)
    if ext is not None:
        return ext
    raise NotImplementedError(
        f"SRS {srs} is outside the built-in projection set (4326/3857, UTM, "
        f"LCC/Albers, polar/oblique stereographic, Hotine oblique mercator) "
        f"and pyproj is not installed"
    )


def _from_4326(lon, lat, srs):
    if srs == "EPSG:4326":
        return lon, lat
    if srs == "EPSG:3857":
        return M.latlon_to_meters(lat, lon)
    utm = TM.parse_utm_epsg(srs)
    if utm is not None:
        return TM.latlon_to_utm(lat, lon, utm[0], utm[1])
    conic = CN.parse_conic_srs(srs)
    if conic is not None:
        fwd = CN.lcc_forward if conic[0] == "LCC" else CN.albers_forward
        return fwd(lat, lon, *conic[1])
    stereo = SO.parse_stereo_srs(srs)
    if stereo is not None:
        return SO.latlon_to_stereo(lat, lon, *stereo)
    ext = _pyproj_from_4326(lon, lat, srs)
    if ext is not None:
        return ext
    raise NotImplementedError(
        f"SRS {srs} is outside the built-in projection set (4326/3857, UTM, "
        f"LCC/Albers, polar/oblique stereographic, Hotine oblique mercator) "
        f"and pyproj is not installed"
    )


def _fwd(gx, gy, src_srs, dst_srs):
    if src_srs == dst_srs:
        return gx, gy
    lon, lat = _to_4326(gx, gy, src_srs)
    return _from_4326(lon, lat, dst_srs)


def suggest_output_grid(src_gt, w, h, src_srs, dst_srs, dst_size=None):
    """Axis-aligned dst grid covering the warped source footprint.

    Mirrors GDALWarpCreateOutput (apps/gdalwarp_lib.cpp:254): sample the
    forward transform along the source edges, take the bbox, preserve the
    pixel count unless dst_size is given.
    """
    edge = np.concatenate(
        [
            np.stack([np.linspace(0, w, 21), np.zeros(21)], axis=1),
            np.stack([np.linspace(0, w, 21), np.full(21, h)], axis=1),
            np.stack([np.zeros(21), np.linspace(0, h, 21)], axis=1),
            np.stack([np.full(21, w), np.linspace(0, h, 21)], axis=1),
        ]
    )
    gx, gy = A.apply_geotransform(src_gt, edge[:, 0], edge[:, 1])
    dx, dy = _fwd(gx, gy, src_srs, dst_srs)
    minx, maxx = float(dx.min()), float(dx.max())
    miny, maxy = float(dy.min()), float(dy.max())
    if dst_size is None:
        dst_w, dst_h = w, h
    else:
        dst_w, dst_h = dst_size
    res_x = (maxx - minx) / dst_w
    res_y = (maxy - miny) / dst_h
    return (minx, res_x, 0.0, maxy, 0.0, -res_y), dst_w, dst_h


def warp_image_transform(img, transform, dst_gt=None, dst_w=None, dst_h=None,
                         resampling="nearest", fill=0):
    """Warp one image georeferenced by a GCP/TPS/RPC ``transform`` (an
    object with ``forward(px, py) -> (gx, gy)`` and ``inverse(gx, gy) ->
    (px, py)``, see ``geo/gcp.py``) onto an axis-aligned grid in the
    transform's geo space. The reference shape: gdalwarp with -gcp/-tps/
    -rpc sources goes through GDALCreateGenImgProjTransformer's GCP arm
    instead of the SRS chain; SRS changes compose by wrapping ``transform``
    with the ``_fwd`` seam externally. Returns (dst_img, dst_gt)."""
    h, w = img.shape[:2]
    if dst_gt is None:
        edge = np.concatenate(
            [
                np.stack([np.linspace(0, w, 21), np.zeros(21)], axis=1),
                np.stack([np.linspace(0, w, 21), np.full(21, h)], axis=1),
                np.stack([np.zeros(21), np.linspace(0, h, 21)], axis=1),
                np.stack([np.full(21, w), np.linspace(0, h, 21)], axis=1),
            ]
        )
        gx, gy = transform.forward(edge[:, 0], edge[:, 1])
        minx, maxx = float(np.min(gx)), float(np.max(gx))
        miny, maxy = float(np.min(gy)), float(np.max(gy))
        dst_w, dst_h = (dst_w or w), (dst_h or h)
        dst_gt = (minx, (maxx - minx) / dst_w, 0.0, maxy, 0.0, -(maxy - miny) / dst_h)
    cols, rows = np.meshgrid(np.arange(dst_w) + 0.5, np.arange(dst_h) + 0.5)
    dx, dy = A.apply_geotransform(dst_gt, cols, rows)
    px, py = transform.inverse(dx, dy)
    shape = (dst_h, dst_w) + img.shape[2:]
    out = np.full(shape, fill, dtype=img.dtype)
    if resampling == "nearest":
        ix = np.floor(px).astype(np.int64)
        iy = np.floor(py).astype(np.int64)
        ok = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        out[ok] = img[iy[ok], ix[ok]]
    elif resampling == "bilinear":
        from gdal_ray.raster.kernels import interpolate_at_point_bilinear

        inside = (px >= 0) & (px < w) & (py >= 0) & (py < h)
        if img.ndim == 3:
            for b in range(img.shape[2]):
                vals = interpolate_at_point_bilinear(img[:, :, b], px[inside], py[inside])
                if np.issubdtype(img.dtype, np.integer):
                    vals = np.clip(np.floor(vals + 0.5), np.iinfo(img.dtype).min,
                                   np.iinfo(img.dtype).max)
                out[..., b][inside] = vals.astype(img.dtype)
        else:
            vals = interpolate_at_point_bilinear(img, px[inside], py[inside])
            if np.issubdtype(img.dtype, np.integer):
                vals = np.clip(np.floor(vals + 0.5), np.iinfo(img.dtype).min,
                               np.iinfo(img.dtype).max)
            out[inside] = vals.astype(img.dtype)
    else:
        raise ValueError(resampling)
    return out, dst_gt


def warp_image(img, src_gt, src_srs, dst_srs, dst_gt=None, dst_w=None, dst_h=None,
               resampling="nearest", fill=0, src_nodata=None, cutline_wkb=None):
    """Warp one image to dst_srs. Returns (dst_img, dst_gt).

    Masking (the gdalwarp masking paths, ``alg/gdalwarpkernel.cpp``):
    - ``src_nodata``: source pixels equal to it never contribute — nearest
      propagates the fill, bilinear/cubic/lanczos drop the invalid window
      samples and renormalize the remaining weights (all-invalid -> fill);
      for multi-band images a pixel is invalid when EVERY band equals the
      nodata value (UNIFIED_SRC_NODATA semantics);
    - ``cutline_wkb``: WKB (Multi)Polygon in DST coordinates; dst pixels
      whose centers fall outside are set to ``fill`` (the cutline mask is
      rasterized with the engine's own scanline burner).
    """
    h, w = img.shape[:2]
    if dst_gt is None:
        dst_gt, dst_w, dst_h = suggest_output_grid(src_gt, w, h, src_srs, dst_srs)
    inv = A.invert_geotransform(src_gt)
    if inv is None:
        raise ValueError("singular source geotransform")
    cols, rows = np.meshgrid(np.arange(dst_w) + 0.5, np.arange(dst_h) + 0.5)
    dx, dy = A.apply_geotransform(dst_gt, cols, rows)
    sx, sy = _fwd(dx, dy, dst_srs, src_srs)
    px, py = A.apply_geotransform(inv, sx, sy)
    shape = (dst_h, dst_w) + img.shape[2:]
    out = np.full(shape, fill, dtype=img.dtype)
    if src_nodata is None:
        valid = None
    elif img.ndim == 3:
        valid = ~(img == src_nodata).all(axis=2)
    else:
        valid = img != src_nodata
    if resampling == "nearest":
        ix = np.floor(px).astype(np.int64)
        iy = np.floor(py).astype(np.int64)
        ok = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        if valid is not None:
            ok[ok] &= valid[iy[ok], ix[ok]]
        out[ok] = img[iy[ok], ix[ok]]
    elif resampling == "bilinear":
        fx = px - 0.5
        fy = py - 0.5
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        ok = (x0 >= 0) & (x0 < w - 1) & (y0 >= 0) & (y0 < h - 1)
        wx = (fx - x0)[ok]
        wy = (fy - y0)[ok]
        f = img.astype(np.float64)
        x0o = x0[ok]
        y0o = y0[ok]
        w00 = (1 - wx) * (1 - wy)
        w10 = wx * (1 - wy)
        w01 = (1 - wx) * wy
        w11 = wx * wy
        if valid is not None:
            # zero the weights of nodata corners, renormalize survivors
            w00 = w00 * valid[y0o, x0o]
            w10 = w10 * valid[y0o, x0o + 1]
            w01 = w01 * valid[y0o + 1, x0o]
            w11 = w11 * valid[y0o + 1, x0o + 1]
            tot = w00 + w10 + w01 + w11
            dead = tot == 0
            tot[dead] = 1.0
            w00, w10, w01, w11 = w00 / tot, w10 / tot, w01 / tot, w11 / tot
        if img.ndim == 3:
            w00, w10, w01, w11 = (a[:, None] for a in (w00, w10, w01, w11))
        val = (
            f[y0o, x0o] * w00
            + f[y0o, x0o + 1] * w10
            + f[y0o + 1, x0o] * w01
            + f[y0o + 1, x0o + 1] * w11
        )
        if np.issubdtype(img.dtype, np.integer):
            val = np.clip(np.floor(val + 0.5), np.iinfo(img.dtype).min, np.iinfo(img.dtype).max)
        val = val.astype(img.dtype)
        if valid is not None:
            val[dead] = fill
        out[ok] = val
        # fall back to nearest at the right/bottom edge rows GDAL handles
        # with clamped windows
        edge = (~ok) & (px >= 0) & (px < w) & (py >= 0) & (py < h)
        ixe = np.floor(px[edge]).astype(np.int64)
        iye = np.floor(py[edge]).astype(np.int64)
        if valid is not None:
            edge[edge] &= valid[iye, ixe]
            ixe = np.floor(px[edge]).astype(np.int64)
            iye = np.floor(py[edge]).astype(np.int64)
        out[edge] = img[iye, ixe]
    elif resampling in ("cubic", "lanczos"):
        from gdal_ray.raster.kernels import _cubic_weight, _lanczos_weight

        wfn, support = (
            (_cubic_weight, 2) if resampling == "cubic" else (_lanczos_weight, 3)
        )
        fx = px - 0.5
        fy = py - 0.5
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        inside = (px >= 0) & (px < w) & (py >= 0) & (py < h)
        f = img.astype(np.float64)
        acc = np.zeros(shape, dtype=np.float64)
        wsum = np.zeros((dst_h, dst_w), dtype=np.float64)
        for dy in range(-support + 1, support + 1):
            wy = wfn(fy - (y0 + dy))
            iy = np.clip(y0 + dy, 0, h - 1)
            for dx_ in range(-support + 1, support + 1):
                wx = wfn(fx - (x0 + dx_))
                ix = np.clip(x0 + dx_, 0, w - 1)
                w2 = wy * wx
                if valid is not None:
                    w2 = w2 * valid[iy, ix]
                vals = f[iy, ix]
                acc += vals * (w2[..., None] if img.ndim == 3 else w2)
                wsum += w2
        dead = wsum == 0
        wsum = np.where(dead, 1.0, wsum)
        vals = acc / (wsum[..., None] if img.ndim == 3 else wsum)
        if np.issubdtype(img.dtype, np.integer):
            info = np.iinfo(img.dtype)
            vals = np.clip(np.floor(vals + 0.5), info.min, info.max)
        vals = vals.astype(img.dtype)
        if valid is not None:
            vals[dead] = fill
        out[inside] = vals[inside]
    else:
        raise ValueError(resampling)
    if cutline_wkb is not None:
        from gdal_ray.raster.rasterize import rasterize_wkb

        mask = np.zeros((dst_h, dst_w), dtype=np.int32)
        rasterize_wkb(mask, cutline_wkb, dst_gt, 1)
        out[mask == 0] = fill
    return out, dst_gt
