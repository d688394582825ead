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

__all__ = ["suggest_output_grid", "warp_image", "warp_image_transform",
           "warp_image_area"]


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
    if resampling in _AREA_OPS:
        out, dst_gt = warp_image_area(
            img, src_gt, src_srs, dst_srs, dst_gt=dst_gt, dst_w=dst_w,
            dst_h=dst_h, op=resampling, fill=fill, src_nodata=src_nodata)
        if cutline_wkb is not None:
            from gdal_ray.raster.rasterize import rasterize_wkb

            mask = np.zeros(out.shape[:2], dtype=np.int32)
            rasterize_wkb(mask, cutline_wkb, dst_gt, 1)
            out[mask == 0] = fill
        return out, dst_gt
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


_AREA_OPS = ("average", "rms", "sum", "min", "max", "med", "q1", "q3", "mode")


def _area_window_bounds(src_gt, w, h, src_srs, dst_srs, dst_gt, dst_w, dst_h):
    """Per-dst-pixel integer source windows from the transformed pixel
    CORNERS (GWKAverageOrModeThread, alg/gdalwarpkernel.cpp:6763-6840:
    TL corner (iDstX, iDstY) and BR corner (iDstX+1, iDstY+1) through the
    inverse chain, EPS-snapped floor/ceil, empty windows bumped by one)."""
    inv = A.invert_geotransform(src_gt)
    cols, rows = np.meshgrid(np.arange(dst_w + 1, dtype=np.float64),
                             np.arange(dst_h + 1, dtype=np.float64))
    dx, dy = A.apply_geotransform(dst_gt, cols, rows)
    sx, sy = _fwd(dx, dy, dst_srs, src_srs)
    px, py = A.apply_geotransform(inv, sx, sy)
    x_tl, x_br = px[:-1, :-1], px[1:, 1:]
    y_tl, y_br = py[:-1, :-1], py[1:, 1:]
    xmin = np.minimum(x_tl, x_br)
    xmax = np.maximum(x_tl, x_br)
    ymin = np.minimum(y_tl, y_br)
    ymax = np.maximum(y_tl, y_br)
    EPS = 1e-10
    ok = (np.isfinite(xmin) & np.isfinite(xmax)
          & np.isfinite(ymin) & np.isfinite(ymax)
          & (xmax > -EPS) & (xmin < w + EPS)
          & (ymax > -EPS) & (ymin < h + EPS))
    sxmin = np.maximum(np.floor(np.where(ok, xmin, 0.0) + EPS), 0.0).astype(np.int64)
    sxmax = np.minimum(np.ceil(np.where(ok, xmax, 0.0) - EPS), float(w)).astype(np.int64)
    bump = (sxmin == sxmax) & (sxmax < w)
    sxmax = sxmax + bump
    symin = np.maximum(np.floor(np.where(ok, ymin, 0.0) + EPS), 0.0).astype(np.int64)
    symax = np.minimum(np.ceil(np.where(ok, ymax, 0.0) - EPS), float(h)).astype(np.int64)
    bump = (symin == symax) & (symax < h)
    symax = symax + bump
    ok &= (sxmin < sxmax) & (symin < symax)
    return ok, sxmin, sxmax, symin, symax, xmin, xmax, ymin, ymax


def warp_image_area(img, src_gt, src_srs, dst_srs, dst_gt=None, dst_w=None,
                    dst_h=None, op="average", fill=0, src_nodata=None,
                    mode_ties="min"):
    """Area-statistics warp (gdalwarp -r average/rms/sum/min/max/med/q1/q3/
    mode; GWKAverageOrModeThread, alg/gdalwarpkernel.cpp:6508): each dst
    pixel reduces the source pixels under its footprint.

    Parity notes (matching the reference):
    - average / rms / sum weight border source pixels by their covered
      fraction (COMPUTE_WEIGHT / COMPUTE_WEIGHT_Y macros);
    - min / max / med / q1 / q3 / mode take every window pixel unweighted;
    - quantiles pick sorted[ceil(q*n - 1)] (:7604-7607);
    - ``sum`` returns float64 (mass-preserving weighted sum can exceed
      the input dtype range); everything else keeps the input dtype;
    - ``src_nodata`` pixels never contribute (all-band match for 3-D input,
      UNIFIED_SRC_NODATA semantics); an all-invalid window emits ``fill``;
    - ``mode_ties``: the reference's MODE_TIES warp option — "min"/"max"
      pick the smallest/largest tied value (GWKTS_Min/Max); its scan-order
      FIRST default is approximated by "min" here (deterministic under
      any traversal), which differs only when two values tie exactly.
    """
    if op not in _AREA_OPS:
        raise ValueError(f"unknown area op {op!r}")
    h, w = img.shape[:2]
    if dst_gt is None:
        dst_gt, dst_w, dst_h = suggest_output_grid(src_gt, w, h, src_srs, dst_srs)
    ok, sxmin, sxmax, symin, symax, xmin, xmax, ymin, ymax = \
        _area_window_bounds(src_gt, w, h, src_srs, dst_srs, dst_gt, dst_w, dst_h)
    if src_nodata is None:
        valid = np.ones((h, w), dtype=bool)
    elif img.ndim == 3:
        valid = ~(img == src_nodata).all(axis=2)
    else:
        valid = img != src_nodata
    nb = img.shape[2] if img.ndim == 3 else 1
    f = img.reshape(h, w, nb).astype(np.float64)
    kx = np.where(ok, sxmax - sxmin, 0)
    ky = np.where(ok, symax - symin, 0)
    kx_max, ky_max = int(kx.max(initial=0)), int(ky.max(initial=0))
    weighted = op in ("average", "rms", "sum")
    collect = op in ("med", "q1", "q3", "mode")
    shape2 = (dst_h, dst_w)
    num = np.zeros(shape2 + (nb,))
    den = np.zeros(shape2)
    mn = np.full(shape2 + (nb,), np.inf)
    mx = np.full(shape2 + (nb,), -np.inf)
    any_valid = np.zeros(shape2, dtype=bool)
    gathered = (np.full(shape2 + (ky_max * kx_max, nb), np.nan)
                if collect else None)
    for dy in range(ky_max):
        in_y = ok & (dy < ky)
        iy = np.clip(symin + dy, 0, h - 1)
        # COMPUTE_WEIGHT_Y: border rows weight by their covered fraction
        wy = np.where(
            dy == 0,
            np.where(ky == 1, 1.0, 1.0 - (ymin - symin)),
            np.where(symin + dy + 1 == symax, 1.0 - (symax - ymax), 1.0),
        )
        for dx in range(kx_max):
            m = in_y & (dx < kx)
            if not m.any():
                continue
            ix = np.clip(sxmin + dx, 0, w - 1)
            m = m & valid[iy, ix]
            if not m.any():
                continue
            vals = f[iy, ix]  # (dst_h, dst_w, nb)
            if weighted:
                wx = np.where(
                    dx == 0,
                    np.where(kx == 1, 1.0, 1.0 - (xmin - sxmin)),
                    np.where(sxmin + dx + 1 == sxmax, 1.0 - (sxmax - xmax), 1.0),
                )
                wgt = np.where(m, wx * wy, 0.0)
                wgt = np.maximum(wgt, 0.0)
                v = vals**2 if op == "rms" else vals
                num += wgt[..., None] * np.where(m[..., None], v, 0.0)
                den += wgt
            else:
                any_valid |= m
                if op in ("min", "max"):
                    sel = np.where(m[..., None], vals, np.nan)
                    mn = np.fmin(mn, sel)
                    mx = np.fmax(mx, sel)
                else:
                    gathered[..., dy * kx_max + dx, :] = np.where(
                        m[..., None], vals, np.nan
                    )
    out = np.full(shape2 + (nb,), float(fill))
    if op in ("average", "rms", "sum"):
        got = den > 0
        if op == "sum":
            out[got] = num[got]
        else:
            r = num[got] / den[got][:, None]
            out[got] = np.sqrt(r) if op == "rms" else r
    elif op in ("min", "max"):
        src = mn if op == "min" else mx
        out[any_valid] = src[any_valid]
    elif op in ("med", "q1", "q3"):
        q = {"med": 0.5, "q1": 0.25, "q3": 0.75}[op]
        srt = np.sort(gathered, axis=2)  # NaNs sort to the end
        n = np.isfinite(gathered).sum(axis=2)  # (dst_h, dst_w, nb)
        idx = np.maximum(np.ceil(q * n - 1), 0).astype(np.int64)
        pick = np.take_along_axis(srt, idx[..., None, :], axis=2)[..., 0, :]
        has = (n > 0).all(axis=-1)
        out[has] = pick[has]
    else:  # mode
        srt = np.sort(gathered, axis=2)
        n_val = np.isfinite(srt).sum(axis=2)
        K = srt.shape[2]
        best_val = srt[:, :, 0, :].copy()
        best_cnt = np.where(np.isfinite(best_val), 1, 0)
        run_val = best_val.copy()
        run_cnt = best_cnt.copy()
        for k in range(1, K):
            cur = srt[:, :, k, :]
            same = cur == run_val
            run_cnt = np.where(same, run_cnt + 1, np.where(np.isfinite(cur), 1, 0))
            run_val = np.where(same, run_val, cur)
            better = (run_cnt > best_cnt) if mode_ties != "max" else (
                (run_cnt > best_cnt)
                | ((run_cnt == best_cnt) & np.isfinite(run_val)))
            best_cnt = np.where(better, run_cnt, best_cnt)
            best_val = np.where(better, run_val, best_val)
        has = n_val > 0
        out[has] = best_val[has]
    if np.issubdtype(img.dtype, np.integer) and op != "sum":
        info = np.iinfo(img.dtype)
        out = np.clip(np.floor(out + 0.5), info.min, info.max)
    out = out.astype(img.dtype if op != "sum" else np.float64)
    if img.ndim == 2:
        out = out[:, :, 0]
    return out, dst_gt
