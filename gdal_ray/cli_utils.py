"""The gdal-utils script suite over the engine's own drivers — the
reference ships these as standalone tools (``apps/gdaladdo.cpp``,
``apps/nearblack_*.cpp``, ``swig/python/gdal-utils/osgeo_utils/
{gdal_calc,gdal_merge,gdal_polygonize,gdal_pansharpen,rgb2pct,pct2rgb,
gdal2xyz,gdal2tiles,gdal_retile,ogrmerge,gdalcompare,gdal_edit}.py``,
``apps/gdal_create.cpp``, ``apps/gdalmanage.cpp``,
``apps/gdaltransform.cpp``, ``apps/gdal_footprint_lib.cpp``,
``apps/dumpoverviews.cpp``).

Each command re-expresses the tool over this engine's kernels: the
raster I/O is the pure-python GeoTIFF/PNG codecs, vector output goes
through whichever driver the extension selects, and anything that maps
onto an existing distributed pipeline (gdal2tiles over a corpus) calls
that pipeline rather than a scalar loop.

CLI-scale commands (single rasters) read the full image in the driver
process — the distributed forms of the same kernels live in
``pipelines/`` and are what the registry queries run.
"""

from __future__ import annotations

import ast
import json
import os
import shutil

import numpy as np
import pandas as pd

from gdal_ray.cli import (_ensure_ray, _read_full_tiff, _read_raster_any,
                          _vector_read, _vector_write, _write_raster_any)

__all__ = [
    "cmd_addo", "cmd_nearblack", "cmd_pansharpen", "cmd_polygonize",
    "cmd_footprint", "cmd_merge", "cmd_calc", "cmd_rgb2pct", "cmd_pct2rgb",
    "cmd_gdal2xyz", "cmd_transform", "cmd_compare", "cmd_gdal2tiles",
    "cmd_retile", "cmd_ogrmerge", "cmd_create", "cmd_manage", "cmd_edit",
    "cmd_dumpoverviews", "cmd_layer_algebra", "cmd_srsinfo",
    "cmd_enhance", "cmd_reclass", "cmd_ogrtindex", "cmd_lineref",
    "cmd_mdiminfo", "cmd_mdim", "cmd_overview_delete",
    "cmd_overview_refresh", "cmd_nodata_to_alpha", "cmd_color_merge",
    "cmd_update", "cmd_mbtiles",
]


# --------------------------------------------------------------------------
# gdaladdo — external .ovr overviews (multi-IFD TIFF)
# --------------------------------------------------------------------------

def _overview_level(arr: np.ndarray, factor: int, resample: str) -> np.ndarray:
    from gdal_ray.raster import kernels as K

    if resample in ("average", "avg"):
        return K.resample_average(arr, factor)
    if resample in ("nearest", "near"):
        return K.resample_nearest_factor(arr, factor)
    if resample == "rms":
        return K.resample_rms(arr, factor)
    if resample == "mode":
        return K.resample_mode(arr, factor)
    if resample == "gauss":
        return K.resample_gauss(arr, factor)
    if resample == "cubic":
        h, w = arr.shape[:2]
        out = K.resample_cubic(arr.astype(np.float64), h // factor, w // factor)
        return (K.cast_clip(out, arr.dtype)
                if np.issubdtype(arr.dtype, np.integer) else out)
    raise SystemExit(f"unsupported overview resampling {resample!r}")


def cmd_addo(src: str, factors, resample: str = "average") -> dict:
    """gdaladdo -ro: build external overviews ``<src>.ovr`` — a TIFF whose
    IFD k holds the level-k reduced image (the reference's external
    overview layout, gcore/gdaldefaultoverviews.cpp)."""
    from gdal_ray.io.tiff import write_geotiff_multi

    arr, hdr = _read_full_tiff(src)
    gt = list(hdr["gt"] or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0])
    images = []
    for f in factors:
        f = int(f)
        if f < 2:
            raise SystemExit("overview factors must be >= 2")
        lvl = _overview_level(arr, f, resample)
        lgt = [gt[0], gt[1] * f, gt[2] * f, gt[3], gt[4] * f, gt[5] * f]
        images.append((lvl, lgt))
    out = src + ".ovr"
    write_geotiff_multi(out, images, epsg=hdr["epsg"])
    return {"dst": out, "levels": [list(i[0].shape[:2]) for i in images],
            "resample": resample}


def cmd_dumpoverviews(src: str, out_prefix: str | None = None) -> dict:
    """apps/dumpoverviews.cpp: list (and optionally extract) every image
    in a multi-IFD TIFF / .ovr file."""
    from gdal_ray.io.tiff import read_tiff_ifds, write_geotiff

    ovr = src if src.endswith(".ovr") or not os.path.exists(src + ".ovr") \
        else src + ".ovr"
    hdrs = read_tiff_ifds(ovr)
    levels = []
    for k, h in enumerate(hdrs):
        levels.append({"level": k, "w": h["w"], "h": h["h"],
                       "dtype": str(h["dtype"]),
                       "compression": h["compression"]})
        if out_prefix is not None:
            arr = _read_full_ifd(ovr, h)
            write_geotiff(f"{out_prefix}_{k}.tif", arr,
                          h["gt"] or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
                          epsg=h["epsg"])
    return {"src": ovr, "levels": levels}


def _read_full_ifd(path: str, h: dict) -> np.ndarray:
    from gdal_ray.io.tiff import read_tile

    buf = open(path, "rb").read()
    full = np.zeros((h["n_tiles_y"] * h["tile_h"],
                     h["n_tiles_x"] * h["tile_w"], h["spp"]), dtype=h["dtype"])
    for i in range(len(h["offsets"])):
        ty, tx = divmod(i, h["n_tiles_x"])
        t = read_tile(buf, h, i)
        full[ty * h["tile_h"]:(ty + 1) * h["tile_h"],
             tx * h["tile_w"]:(tx + 1) * h["tile_w"]] = (
            t if t.ndim == 3 else t[:, :, None])
    arr = full[: h["h"], : h["w"]]
    return arr[:, :, 0] if h["spp"] == 1 else arr


# --------------------------------------------------------------------------
# nearblack / pansharpen
# --------------------------------------------------------------------------

def cmd_nearblack(src: str, dst: str, near: int = 15, white: bool = False,
                  floodfill: bool = False, set_value: int | None = None,
                  compress: str = "deflate") -> dict:
    """nearblack (apps/nearblack_lib.cpp): scrub the near-black (or
    near-white) collar; --floodfill uses the connected-region variant."""
    from gdal_ray.raster import kernels as K

    arr, gt, epsg = _read_raster_any(src)
    squeeze = arr.ndim == 2
    img = arr[:, :, None] if squeeze else arr
    sv = set_value if set_value is not None else (255 if white else 0)
    fn = K.nearblack_floodfill if floodfill else K.nearblack
    out, changed = fn(img, threshold=near, set_value=sv, white=white)
    if squeeze:
        out = out[:, :, 0]
    _write_raster_any(dst, out, gt, epsg=epsg, compress=compress)
    return {"dst": dst, "changed": changed,
            "white": white, "floodfill": floodfill}


def cmd_pansharpen(pan_path: str, ms_path: str, dst: str, weights=None,
                   bit_depth: int = 8, compress: str = "deflate") -> dict:
    """gdal_pansharpen.py / alg/gdalpansharpen.cpp: weighted-Brovey
    pansharpening of a chunky multispectral image with a panchromatic
    band."""
    from gdal_ray.raster.kernels import pansharpen_brovey

    pan, pan_hdr = _read_full_tiff(pan_path)
    ms, _ = _read_full_tiff(ms_path)
    if ms.ndim == 2:
        ms = ms[:, :, None]
    out = pansharpen_brovey(ms, pan, weights=weights, bit_depth=bit_depth)
    gt = list(pan_hdr["gt"] or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0])
    _write_raster_any(dst, out, gt, epsg=pan_hdr["epsg"], compress=compress)
    return {"dst": dst, "shape": list(out.shape)}


# --------------------------------------------------------------------------
# polygonize / footprint
# --------------------------------------------------------------------------

def cmd_polygonize(src: str, dst: str, nodata: float | None = None,
                   connect8: bool = False) -> dict:
    """gdal_polygonize.py (alg/polygonize.cpp): region-trace the raster
    into value polygons, written through a vector driver with DN + area
    attributes."""
    import pandas as pd

    from gdal_ray.geo import geomops as GO
    from gdal_ray.geo.wkb import encode_polygon
    from gdal_ray.raster.polygonize import polygonize_array

    arr, gt, _ = _read_raster_any(src)
    if arr.ndim == 3:
        arr = arr[:, :, 0]
    if nodata is None:
        from gdal_ray.io.tiff import read_tiff_header

        try:
            nodata = read_tiff_header(src)["nodata"]
        except (ValueError, OSError):
            nodata = None
    polys = polygonize_array(arr, gt=tuple(gt), nodata=nodata,
                             connect8=connect8)
    rows = []
    for i, p in enumerate(polys):
        rows.append({
            "fid": i,
            "DN": float(p["value"]),
            "pixel_count": int(p["pixel_count"]),
            "area": float(GO.polygon_area(p["rings"])),
            "geometry": encode_polygon(p["rings"]),
        })
    _ensure_ray()
    import ray.data as rd

    n = len(rows)
    if n:
        _vector_write(rd.from_pandas(pd.DataFrame(rows)), dst)
    return {"dst": dst, "polygons": n}


def cmd_footprint(src: str, dst: str, nodata: float | None = None) -> dict:
    """gdal_footprint (apps/gdal_footprint_lib.cpp:1268): ONE multipolygon
    of the valid-data footprint (validity = not-nodata when the file or
    flag defines nodata, else non-zero)."""
    import pandas as pd

    from gdal_ray.geo import geomops as GO
    from gdal_ray.geo.wkb import encode_multipolygon
    from gdal_ray.raster.polygonize import polygonize_array

    arr, gt, _ = _read_raster_any(src)
    if arr.ndim == 3:
        arr = arr[:, :, 0]
    if nodata is None:
        from gdal_ray.io.tiff import read_tiff_header

        try:
            nodata = read_tiff_header(src)["nodata"]
        except (ValueError, OSError):
            nodata = None
    valid = (arr != nodata) if nodata is not None else (arr != 0)
    polys = polygonize_array(valid.astype(np.int32), gt=tuple(gt), nodata=0)
    parts = [p["rings"] for p in polys]
    area = float(sum(GO.polygon_area(r) for r in parts))
    _ensure_ray()
    import ray.data as rd

    if parts:
        row = {"fid": 0, "area": area, "n_parts": len(parts),
               "location": os.path.abspath(src),
               "geometry": encode_multipolygon(parts)}
        _vector_write(rd.from_pandas(pd.DataFrame([row])), dst)
    return {"dst": dst, "parts": len(parts), "area": area}


# --------------------------------------------------------------------------
# gdal_merge — mosaic into one raster (later-wins, like the reference)
# --------------------------------------------------------------------------

def cmd_merge(dst: str, srcs: list, nodata: float | None = None,
              compress: str = "deflate") -> dict:
    """gdal_merge.py: paint the inputs into their union grid in argument
    order (later files overwrite) — the same later-wins rule as the VRT
    mosaic, which this reuses."""
    import tempfile

    from gdal_ray.sources.vrt import build_vrt, read_vrt, vrt_mosaic

    tmp = tempfile.mktemp(suffix=".vrt")
    try:
        build_vrt(srcs, tmp, nodata=nodata)
        arr, gt = vrt_mosaic(tmp)
        epsg = read_vrt(tmp)["epsg"]
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    _write_raster_any(dst, arr, gt, epsg=epsg, compress=compress)
    return {"dst": dst, "size": [int(arr.shape[1]), int(arr.shape[0])],
            "inputs": len(srcs)}


# --------------------------------------------------------------------------
# gdal_calc — whitelisted numpy expression over lettered inputs
# --------------------------------------------------------------------------

_CALC_FUNCS = {
    "sqrt": np.sqrt, "abs": np.abs, "absolute": np.abs, "exp": np.exp,
    "log": np.log, "log10": np.log10, "sin": np.sin, "cos": np.cos,
    "tan": np.tan, "arctan": np.arctan, "arctan2": np.arctan2,
    "minimum": np.minimum, "maximum": np.maximum, "where": np.where,
    "logical_and": np.logical_and, "logical_or": np.logical_or,
    "logical_not": np.logical_not, "logical_xor": np.logical_xor,
    "floor": np.floor, "ceil": np.ceil, "power": np.power,
    "clip": np.clip, "round": np.round, "sum": np.sum, "mean": np.mean,
    "fmod": np.fmod, "hypot": np.hypot, "sign": np.sign,
    "isnan": np.isnan, "nan_to_num": np.nan_to_num,
}

_CALC_NODES = (
    ast.Expression, ast.BinOp, ast.UnaryOp, ast.Compare, ast.BoolOp,
    ast.Call, ast.Name, ast.Constant, ast.Load,
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod, ast.Pow,
    ast.USub, ast.UAdd, ast.Invert, ast.Not,
    ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE,
    ast.BitAnd, ast.BitOr, ast.BitXor, ast.And, ast.Or,
    ast.Tuple, ast.keyword,
)


def calc_eval(expr: str, bands: dict) -> np.ndarray:
    """gdal_calc.py's numpy-expression semantics, compiled through an
    ast whitelist instead of eval: names are the lettered inputs (A..Z)
    plus the whitelisted numpy functions — nothing else parses."""
    tree = ast.parse(expr, mode="eval")
    for node in ast.walk(tree):
        if not isinstance(node, _CALC_NODES):
            raise SystemExit(
                f"calc: disallowed syntax {type(node).__name__!r} in {expr!r}")
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or \
                    node.func.id not in _CALC_FUNCS:
                raise SystemExit("calc: only whitelisted numpy functions "
                                 f"are callable ({sorted(_CALC_FUNCS)})")
        if isinstance(node, ast.Name) and node.id not in _CALC_FUNCS \
                and node.id not in bands:
            raise SystemExit(f"calc: unknown input {node.id!r}")
    env = dict(_CALC_FUNCS)
    env.update(bands)
    code = compile(tree, "<calc>", "eval")
    return np.asarray(eval(code, {"__builtins__": {}}, env))  # noqa: S307


def cmd_calc(expr: str, inputs: dict, dst: str, out_dtype: str | None = None,
             nodata: float | None = None, compress: str = "deflate") -> dict:
    """gdal_calc.py: raster algebra over lettered inputs. All inputs must
    share a grid (the reference requires matching dimensions too)."""
    from gdal_ray.io.tiff import write_geotiff

    bands = {}
    gt, epsg = None, None
    shape = None
    for name, path in inputs.items():
        arr, g, e = _read_raster_any(path)
        if arr.ndim == 3:
            arr = arr[:, :, 0]
        if shape is None:
            shape, gt, epsg = arr.shape, g, e
        elif arr.shape != shape:
            raise SystemExit(
                f"calc: input {name} shape {arr.shape} != {shape}")
        bands[name] = arr
    out = calc_eval(expr, bands)
    if out.shape != shape:
        raise SystemExit(f"calc: expression result shape {out.shape} "
                         f"!= input shape {shape}")
    if out_dtype:
        out = out.astype(np.dtype(out_dtype))
    elif out.dtype == np.bool_:
        out = out.astype(np.uint8)
    write_geotiff(dst, out, gt, epsg=epsg, compress=compress, nodata=nodata)
    return {"dst": dst, "dtype": str(out.dtype),
            "min": float(np.nanmin(out)), "max": float(np.nanmax(out))}


# --------------------------------------------------------------------------
# rgb2pct / pct2rgb
# --------------------------------------------------------------------------

def _read_image_any(path: str):
    """RGB(A) image + (gt, epsg) from .tif/.png."""
    if path.lower().endswith(".png"):
        from gdal_ray.io.codec import decode_png

        return decode_png(open(path, "rb").read()), None, None
    arr, hdr = _read_full_tiff(path)
    return arr, list(hdr["gt"] or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]), \
        hdr["epsg"]


def cmd_rgb2pct(src: str, dst: str, n_colors: int = 256,
                method: str = "fs") -> dict:
    """rgb2pct.py: median-cut quantization to <=256 colors; .png output is
    a real color-type-3 palette PNG, .tif output a palette (photometric 3
    + ColorMap) GeoTIFF."""
    from gdal_ray.raster.color import quantize_image

    img, gt, epsg = _read_image_any(src)
    if img.ndim != 3 or img.shape[2] < 3:
        raise SystemExit("rgb2pct needs an RGB input")
    pal, idx = quantize_image(img[:, :, :3], n_colors=n_colors, method=method)
    if dst.lower().endswith(".png"):
        from gdal_ray.io.codec import encode_png_palette

        open(dst, "wb").write(encode_png_palette(idx.astype(np.uint8), pal))
    else:
        from gdal_ray.io.tiff import write_geotiff

        write_geotiff(dst, idx.astype(np.uint8),
                      gt or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
                      epsg=epsg, colormap=pal)
    return {"dst": dst, "colors": int(pal.shape[0]), "method": method}


def cmd_pct2rgb(src: str, dst: str, compress: str = "deflate") -> dict:
    """pct2rgb.py: expand a palette image back to RGB. Palette PNGs expand
    in the decoder; palette GeoTIFFs expand through the ColorMap tag."""
    if src.lower().endswith(".png"):
        from gdal_ray.io.codec import decode_png

        rgb = decode_png(open(src, "rb").read())
        gt, epsg = [0.0, 1.0, 0.0, 0.0, 0.0, -1.0], None
    else:
        from gdal_ray.io.tiff import read_tiff_header

        hdr = read_tiff_header(src)
        if hdr["colormap"] is None:
            raise SystemExit("pct2rgb: input has no palette")
        idx, _ = _read_full_tiff(src)
        rgb = hdr["colormap"][idx]
        gt, epsg = list(hdr["gt"] or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]), \
            hdr["epsg"]
    if dst.lower().endswith(".png"):
        from gdal_ray.io.codec import encode_png

        open(dst, "wb").write(encode_png(rgb))
    else:
        _write_raster_any(dst, rgb, gt, epsg=epsg, compress=compress)
    return {"dst": dst, "shape": list(rgb.shape)}


# --------------------------------------------------------------------------
# gdal2xyz / gdaltransform / gdalcompare
# --------------------------------------------------------------------------

def cmd_gdal2xyz(src: str, dst: str, skip_nodata: bool = False) -> dict:
    """gdal2xyz.py: one ``x y z`` row per pixel (centers), to .xyz/.csv
    text or .parquet."""
    arr, gt, _ = _read_raster_any(src)
    if arr.ndim == 3:
        arr = arr[:, :, 0]
    h, w = arr.shape
    cols, rows_ = np.meshgrid(np.arange(w), np.arange(h))
    xs = gt[0] + (cols + 0.5) * gt[1] + (rows_ + 0.5) * gt[2]
    ys = gt[3] + (cols + 0.5) * gt[4] + (rows_ + 0.5) * gt[5]
    x, y, z = xs.ravel(), ys.ravel(), arr.ravel()
    if skip_nodata:
        from gdal_ray.io.tiff import read_tiff_header

        try:
            nd = read_tiff_header(src)["nodata"]
        except (ValueError, OSError):
            nd = None
        if nd is not None:
            keep = z != nd
            x, y, z = x[keep], y[keep], z[keep]
    if dst.endswith(".parquet"):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.table({"x": x, "y": y, "z": z}), dst)
    else:
        sep = "," if dst.endswith(".csv") else " "
        with open(dst, "w") as fh:
            if dst.endswith(".csv"):
                fh.write("x,y,z\n")
            for xi, yi, zi in zip(x, y, z):
                fh.write(f"{xi:.10g}{sep}{yi:.10g}{sep}{zi:.10g}\n")
    return {"dst": dst, "rows": int(z.size)}


def cmd_transform(s_srs: str, t_srs: str, coords: list) -> list:
    """gdaltransform: reproject coordinate pairs (built-in projection set
    + the pyproj seam, same resolution order as warp)."""
    from gdal_ray.raster.warp import _fwd

    pts = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    ox, oy = _fwd(pts[:, 0], pts[:, 1], s_srs, t_srs)
    return [[float(a), float(b)] for a, b in zip(np.atleast_1d(ox),
                                                 np.atleast_1d(oy))]


def cmd_compare(a_path: str, b_path: str) -> dict:
    """gdalcompare.py: structural + pixel comparison of two rasters.
    ``same`` mirrors the reference's zero-differences exit condition."""
    from gdal_ray.raster.checksum import checksum_image

    a, gta, ea = _read_raster_any(a_path)
    b, gtb, eb = _read_raster_any(b_path)
    rep = {
        "same_size": list(a.shape) == list(b.shape),
        "same_gt": np.allclose(gta, gtb),
        "same_epsg": ea == eb,
        "checksum_a": int(checksum_image(a if a.ndim == 2 else a[:, :, 0])),
        "checksum_b": int(checksum_image(b if b.ndim == 2 else b[:, :, 0])),
    }
    if rep["same_size"]:
        diff = a.astype(np.float64) - b.astype(np.float64)
        rep["pixels_differing"] = int((diff != 0).sum())
        rep["max_abs_diff"] = float(np.abs(diff).max()) if diff.size else 0.0
    rep["same"] = bool(rep["same_size"] and rep["same_gt"]
                       and rep["same_epsg"]
                       and rep.get("pixels_differing", 1) == 0)
    return rep


# --------------------------------------------------------------------------
# gdal2tiles — z/x/y.png tree for one raster
# --------------------------------------------------------------------------

def cmd_gdal2tiles(src: str, out_dir: str, z_min: int, z_max: int,
                   xyz: bool = True) -> dict:
    """gdal2tiles.py for a single georeferenced raster: nearest-neighbor
    base tiles from the source grid at every requested zoom (the
    reference samples the source per tile the same way), written as a
    z/x/y.png tree + a TMS-style metadata file.

    The corpus-scale distributed form of this is
    ``pipelines/tiling.tile_pyramid`` + ``export_tile_tree``; this
    command covers the single-file tool shape. An ``out_dir`` ending in
    ``.mbtiles`` writes one MBTiles file instead of a tree (the
    reference's gdal_translate -of MBTILES + gdaladdo path)."""
    from gdal_ray.geo import mercator as M
    from gdal_ray.io.codec import encode_png
    from gdal_ray.io.tiff import read_tiff_header
    from gdal_ray.pipelines.tiling import _render_one

    hdr = read_tiff_header(src)
    gt = hdr["gt"] or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]
    srs = f"EPSG:{hdr['epsg']}" if hdr["epsg"] else "EPSG:3857"
    if srs not in ("EPSG:4326", "EPSG:3857"):
        raise SystemExit("gdal2tiles takes EPSG:4326/3857 input — "
                         "warp first (the reference warps internally)")
    arr = _read_full_ifd(src, hdr)
    if arr.ndim == 2:  # grayscale -> RGB for the tile tree
        g8 = arr.astype(np.float64)
        rng = g8.max() - g8.min()
        g8 = ((g8 - g8.min()) / (rng if rng else 1.0) * 255.0).astype(np.uint8)
        arr = np.dstack([g8, g8, g8])
    # source corners in mercator meters
    xs = [gt[0], gt[0] + hdr["w"] * gt[1]]
    ys = [gt[3] + hdr["h"] * gt[5], gt[3]]
    if srs == "EPSG:4326":
        mx, my = M.latlon_to_meters(np.array([ys[0], ys[1]]),
                                    np.array([xs[0], xs[1]]))
        xs, ys = sorted(mx.tolist()), sorted(my.tolist())
    to_mbtiles = out_dir.endswith(".mbtiles")
    rows = []
    n_tiles = 0
    for z in range(z_min, z_max + 1):
        tx0, ty0 = M.meters_to_tile(xs[0] + 1e-9, ys[0] + 1e-9, z)
        tx1, ty1 = M.meters_to_tile(xs[1] - 1e-9, ys[1] - 1e-9, z)
        for tx in range(int(tx0), int(tx1) + 1):
            for ty_tms in range(int(ty0), int(ty1) + 1):
                res = _render_one(arr, gt, srs, z, tx, ty_tms)
                if res is None:
                    continue
                tile, _mask = res
                if to_mbtiles:
                    rows.append((z, tx, M.tms_to_xyz(ty_tms, z),
                                 encode_png(tile)))
                    n_tiles += 1
                    continue
                ty_out = M.tms_to_xyz(ty_tms, z) if xyz else ty_tms
                d = os.path.join(out_dir, str(z), str(tx))
                os.makedirs(d, exist_ok=True)
                with open(os.path.join(d, f"{ty_out}.png"), "wb") as fh:
                    fh.write(encode_png(tile))
                n_tiles += 1
    if to_mbtiles:
        from gdal_ray.sources.mbtiles import write_mbtiles

        df = pd.DataFrame(rows, columns=["z", "x", "y", "png"])
        s = write_mbtiles(df, out_dir,
                          name=os.path.splitext(os.path.basename(src))[0])
        return {"dst": out_dir, "tiles": n_tiles, "profile": "mercator",
                "minzoom": s["minzoom"], "maxzoom": s["maxzoom"],
                "format": "png"}
    meta = {"profile": "mercator", "scheme": "xyz" if xyz else "tms",
            "minzoom": z_min, "maxzoom": z_max, "format": "png"}
    with open(os.path.join(out_dir, "metadata.json"), "w") as fh:
        json.dump(meta, fh)
    return {"dst": out_dir, "tiles": n_tiles, **meta}


def cmd_mbtiles(action: str, *args) -> dict:
    """MBTiles tileset tool over ``sources/mbtiles.py`` (the reference's
    MBTiles driver surface: gdalinfo metadata, CreateCopy write, tile
    read):

    - ``write <pyramid_dir> <out.mbtiles> [name]`` — one file from a
      parquet tile pyramid (distributed read, driver-side sink);
    - ``info <path>`` — metadata table + per-zoom tile counts;
    - ``extract <path> <out_dir>`` — back to a z/x/y.png XYZ tree.
    """
    from gdal_ray.sources.mbtiles import (export_mbtiles, mbtiles_metadata,
                                          read_mbtiles)

    if action == "write":
        _ensure_ray()
        return export_mbtiles(args[0], args[1],
                              **({"name": args[2]} if len(args) > 2 else {}))
    if action == "info":
        import sqlite3

        meta = mbtiles_metadata(args[0])
        con = sqlite3.connect(f"file:{args[0]}?mode=ro", uri=True)
        try:
            per_zoom = dict(con.execute(
                "SELECT zoom_level, COUNT(*) FROM tiles GROUP BY 1"))
        finally:
            con.close()
        return {"metadata": meta,
                "tiles_per_zoom": {int(k): int(v)
                                   for k, v in per_zoom.items()}}
    if action == "extract":
        _ensure_ray()
        path, out_dir = args[0], args[1]
        n = 0
        for b in read_mbtiles(path).iter_batches(batch_format="pandas"):
            for _, r in b.iterrows():
                d = os.path.join(out_dir, str(int(r["z"])), str(int(r["x"])))
                os.makedirs(d, exist_ok=True)
                with open(os.path.join(d, f"{int(r['y'])}.png"), "wb") as fh:
                    fh.write(bytes(r["png"]))
                n += 1
        return {"dst": out_dir, "tiles": n}
    raise SystemExit("mbtiles action must be write|info|extract")


# --------------------------------------------------------------------------
# gdal_retile / ogrmerge / gdal_create / gdalmanage / gdal_edit
# --------------------------------------------------------------------------

def cmd_retile(src: str, out_dir: str, ps_w: int, ps_h: int,
               compress: str = "deflate") -> dict:
    """gdal_retile.py: cut the raster into ps_w x ps_h tiles named
    <base>_<row>_<col>.tif plus a CSV tile index (the reference writes an
    OGR index layer; the CSV goes through the CSV layer driver's
    schema: location + WKT footprint)."""
    from gdal_ray.io.tiff import write_geotiff

    arr, gt, epsg = _read_raster_any(src)
    base = os.path.splitext(os.path.basename(src))[0]
    os.makedirs(out_dir, exist_ok=True)
    h, w = arr.shape[:2]
    rows = []
    for r, y0 in enumerate(range(0, h, ps_h)):
        for c, x0 in enumerate(range(0, w, ps_w)):
            sub = arr[y0:y0 + ps_h, x0:x0 + ps_w]
            sgt = [gt[0] + x0 * gt[1] + y0 * gt[2], gt[1], gt[2],
                   gt[3] + x0 * gt[4] + y0 * gt[5], gt[4], gt[5]]
            name = f"{base}_{r + 1}_{c + 1}.tif"
            write_geotiff(os.path.join(out_dir, name), sub, sgt, epsg=epsg,
                          compress=compress)
            xs = [sgt[0], sgt[0] + sub.shape[1] * sgt[1]]
            ys = [sgt[3] + sub.shape[0] * sgt[5], sgt[3]]
            wkt = (f"POLYGON (({xs[0]} {ys[1]}, {xs[1]} {ys[1]}, "
                   f"{xs[1]} {ys[0]}, {xs[0]} {ys[0]}, {xs[0]} {ys[1]}))")
            rows.append(f'"{name}","{wkt}"')
    with open(os.path.join(out_dir, base + "_index.csv"), "w") as fh:
        fh.write("location,wkt\n")
        fh.write("\n".join(rows) + "\n")
    return {"dst": out_dir, "tiles": len(rows),
            "index": base + "_index.csv"}


def cmd_ogrmerge(dst: str, srcs: list) -> dict:
    """ogrmerge.py -single: append every input layer into one output
    layer, aligning schemas (missing fields -> NULL) and tagging each
    row's source."""
    import pandas as pd

    _ensure_ray()
    frames = []
    for p in srcs:
        df = _vector_read(p).to_pandas()
        df["source"] = os.path.basename(p)
        frames.append(df)
    merged = pd.concat(frames, ignore_index=True, sort=False)
    import ray.data as rd

    _vector_write(rd.from_pandas(merged), dst)
    return {"dst": dst, "rows": int(len(merged)), "inputs": len(srcs)}


def cmd_create(dst: str, w: int, h: int, burn: float = 0.0, gt=None,
               epsg: int | None = None, dtype: str = "float32",
               nodata: float | None = None,
               compress: str = "deflate") -> dict:
    """gdal_create (apps/gdal_create.cpp): a new raster of constant
    value."""
    from gdal_ray.io.tiff import write_geotiff

    arr = np.full((int(h), int(w)), burn, dtype=np.dtype(dtype))
    gt = list(gt) if gt else [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]
    write_geotiff(dst, arr, gt, epsg=epsg, compress=compress, nodata=nodata)
    return {"dst": dst, "size": [int(w), int(h)], "burn": burn}


_SIDECARS = [".ovr", ".tfw", ".wld", ".aux.xml"]
_SHP_PARTS = [".shp", ".shx", ".dbf", ".prj"]


def _dataset_files(path: str) -> list:
    base, ext = os.path.splitext(path)
    files = [path] if os.path.exists(path) else []
    if ext.lower() == ".shp":
        files = [base + e for e in _SHP_PARTS if os.path.exists(base + e)]
    for sc in _SIDECARS:
        if os.path.exists(path + sc):
            files.append(path + sc)
        if os.path.exists(base + sc):
            files.append(base + sc)
    return sorted(set(files))


def cmd_manage(op: str, path: str, dst: str | None = None) -> dict:
    """gdalmanage / gdal dataset identify|copy|rename|delete
    (apps/gdalalg_dataset_*.cpp): operate on a dataset AND its sidecar
    files as one unit."""
    if op == "identify":
        ext = os.path.splitext(path)[1].lower()
        fmt = {".tif": "GTiff", ".tiff": "GTiff", ".asc": "AAIGrid",
               ".xyz": "XYZ", ".vrt": "VRT", ".png": "PNG",
               ".shp": "ESRI Shapefile", ".gpkg": "GPKG",
               ".geojson": "GeoJSON", ".geojsonl": "GeoJSONSeq",
               ".csv": "CSV", ".parquet": "Parquet"}.get(ext, "unknown")
        if fmt == "GTiff" and os.path.exists(path):
            magic = open(path, "rb").read(4)
            if magic[:2] not in (b"II", b"MM"):
                fmt = "unknown"
        return {"path": path, "driver": fmt,
                "files": _dataset_files(path)}
    files = _dataset_files(path)
    if not files:
        raise SystemExit(f"manage: no dataset at {path}")
    if op == "delete":
        for f in files:
            os.remove(f)
        return {"deleted": files}
    if op in ("copy", "rename"):
        if dst is None:
            raise SystemExit(f"manage {op} needs a destination")
        sbase = os.path.splitext(path)[0]
        dbase = os.path.splitext(dst)[0]
        moved = []
        for f in files:
            target = dbase + f[len(sbase):] if f.startswith(sbase) else dst
            if op == "copy":
                shutil.copyfile(f, target)
            else:
                os.replace(f, target)
            moved.append(target)
        return {op: moved}
    raise SystemExit(f"manage: unknown op {op!r}")


def cmd_edit(path: str, gt=None, epsg: int | None = None,
             nodata: float | None = None) -> dict:
    """gdal_edit.py: change a GeoTIFF's georeferencing / nodata in place
    (the file is rewritten through the codec with the same pixels —
    documented deviation from the reference's tag patch; byte layout may
    differ, pixels and tags read back identically)."""
    from gdal_ray.io.tiff import read_tiff_header, write_geotiff

    hdr = read_tiff_header(path)
    arr, _ = _read_full_tiff(path)
    new_gt = list(gt) if gt else list(hdr["gt"] or
                                      [0.0, 1.0, 0.0, 0.0, 0.0, -1.0])
    new_epsg = epsg if epsg is not None else hdr["epsg"]
    new_nodata = nodata if nodata is not None else hdr["nodata"]
    compress = {8: "deflate", 5: "lzw", 32773: "packbits",
                1: "none"}.get(hdr["compression"], "deflate")
    write_geotiff(path, arr, new_gt, epsg=new_epsg, compress=compress,
                  nodata=new_nodata, colormap=hdr["colormap"])
    return {"dst": path, "gt": new_gt, "epsg": new_epsg,
            "nodata": new_nodata}


# --------------------------------------------------------------------------
# ogr_layer_algebra / gdalsrsinfo
# --------------------------------------------------------------------------

def cmd_layer_algebra(op: str, input_path: str, method_path: str,
                      dst: str) -> dict:
    """ogr_layer_algebra.py over the distributed layer kernels
    (geo/layerops.py, geo/booleanops.py).

    ``intersection``/``clip`` emit real geometries (one (Multi)Polygon per
    intersecting pair, like the reference's Intersection); the reduction
    ops (union / symdifference / identity / erase / update) emit the
    engine's distributed area table (fid, src in {A,B,AB}, area) — the
    same rows the q_union/q_symdiff gate twins check — to a tabular
    output (.parquet/.csv)."""
    from gdal_ray.cli import _ensure_ray, _vector_read, _vector_write

    _ensure_ray()

    def as_layer(path):
        import pandas as pd

        df = _vector_read(path).to_pandas()
        fid = (df["fid"].astype(str) if "fid" in df.columns
               else pd.Series(np.arange(len(df)).astype(str)))
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(
            {"fid": fid, "wkb": df["geometry"]}))

    la, lb = as_layer(input_path), as_layer(method_path)
    op = op.lower()
    if op in ("intersection", "clip"):
        import pandas as pd

        from gdal_ray.geo import geomops as GO
        from gdal_ray.geo.booleanops import polygon_intersection
        from gdal_ray.geo.layerops import cross_side_candidates
        from gdal_ray.geo.wkb import (decode_polygons, encode_multipolygon,
                                      encode_polygon)

        def inter(batch: pd.DataFrame) -> pd.DataFrame:
            rows = {"fid_a": [], "fid_b": [], "area": [], "geometry": []}
            for _, r in batch.iterrows():
                pieces = []
                for ra in decode_polygons(bytes(r["wkb_a"])):
                    for rb in decode_polygons(bytes(r["wkb_b"])):
                        pieces.extend(polygon_intersection(ra[0], rb[0]))
                pieces = [p for p in pieces if abs(GO.ring_area(p)) > 1e-12]
                if not pieces:
                    continue
                rows["fid_a"].append(r["fid_a"])
                rows["fid_b"].append(r["fid_b"])
                rows["area"].append(
                    float(sum(abs(GO.ring_area(p)) for p in pieces)))
                rows["geometry"].append(
                    encode_polygon([pieces[0]]) if len(pieces) == 1
                    else encode_multipolygon([[p] for p in pieces]))
            return pd.DataFrame(
                {k: pd.Series(v, dtype=object) for k, v in rows.items()})

        pairs = cross_side_candidates(la, lb).map_batches(
            inter, batch_format="pandas")
        # candidates spanning multiple cells emit once per cell; dedup
        df = pairs.to_pandas().drop_duplicates(["fid_a", "fid_b"])
        df = df.sort_values(["fid_a", "fid_b"]).reset_index(drop=True)
        # "pair", not "fid": the vector drivers' fid column is int64
        df.insert(0, "pair", df["fid_a"] + "|" + df["fid_b"])
        import ray.data as rd

        n = len(df)
        if n:
            _vector_write(rd.from_pandas(df), dst)
        return {"dst": dst, "op": op, "pairs": n}

    from gdal_ray.geo.layerops import layer_boolean_areas

    rows = layer_boolean_areas(la, lb, op)
    df = rows.to_pandas().sort_values(["src", "fid"]).reset_index(drop=True)
    if dst.endswith(".parquet"):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), dst)
    elif dst.endswith(".csv"):
        df.to_csv(dst, index=False)
    else:
        raise SystemExit("layer-algebra reduction ops write the area "
                         "table: use a .parquet or .csv destination")
    return {"dst": dst, "op": op, "rows": int(len(df))}


def cmd_srsinfo(srs: str) -> dict:
    """gdalsrsinfo: report what the engine knows about an SRS string —
    family, parameters, a PROJ-style string for the closed-form set, and
    whether transforms resolve (built-ins, then the pyproj seam)."""
    from gdal_ray.geo import conic as CN
    from gdal_ray.geo import stereo as SO
    from gdal_ray.geo import tmerc as TM

    rep: dict = {"input": srs}
    if srs == "EPSG:4326":
        rep.update(family="geographic", name="WGS 84",
                   proj4="+proj=longlat +datum=WGS84 +no_defs")
    elif srs == "EPSG:3857":
        rep.update(family="projected", name="WGS 84 / Pseudo-Mercator",
                   proj4="+proj=merc +a=6378137 +b=6378137 +lat_ts=0 "
                         "+lon_0=0 +x_0=0 +y_0=0 +k=1 +units=m "
                         "+nadgrids=@null +no_defs")
    elif (utm := TM.parse_utm_epsg(srs)) is not None:
        zone, south = utm
        rep.update(family="projected",
                   name=f"WGS 84 / UTM zone {zone}{'S' if south else 'N'}",
                   parameters={"zone": zone, "south": south},
                   proj4=f"+proj=utm +zone={zone}"
                         f"{' +south' if south else ''} +datum=WGS84 "
                         "+units=m +no_defs")
    elif (conic := CN.parse_conic_srs(srs)) is not None:
        kind, (sp1, sp2, lat0, lon0, fe, fn) = conic
        proj = "lcc" if kind == "LCC" else "aea"
        rep.update(family="projected",
                   name=("Lambert Conformal Conic 2SP" if kind == "LCC"
                         else "Albers Equal Area"),
                   parameters={"sp1": sp1, "sp2": sp2, "lat0": lat0,
                               "lon0": lon0, "fe": fe, "fn": fn},
                   proj4=f"+proj={proj} +lat_1={sp1} +lat_2={sp2} "
                         f"+lat_0={lat0} +lon_0={lon0} +x_0={fe} "
                         f"+y_0={fn} +datum=WGS84 +units=m +no_defs")
    elif (st := SO.parse_stereo_srs(srs)) is not None:
        kind, params = st
        rep.update(family="projected",
                   name={"PSTA": "Polar Stereographic (variant A)",
                         "PSTB": "Polar Stereographic (variant B)",
                         "OSTE": "Oblique Stereographic",
                         "HOMB": "Hotine Oblique Mercator (variant B)"
                         }[kind],
                   parameters={"kind": kind,
                               "values": [float(v) for v in params]})
    else:
        rep.update(family="unknown")
    # does the transform seam resolve it (built-ins, then pyproj)?
    try:
        from gdal_ray.raster.warp import _to_4326

        _to_4326(np.array([0.0]), np.array([0.0]), srs)
        rep["transform_resolves"] = True
    except NotImplementedError:
        rep["transform_resolves"] = False
    except Exception:  # domain error at the probe point, but the SRS parses
        rep["transform_resolves"] = True
    return rep


# --------------------------------------------------------------------------
# gdalenhance / reclassify / ogrtindex
# --------------------------------------------------------------------------

def cmd_enhance(src: str, dst: str, mode: str = "equalize",
                lo_pct: float = 2.0, hi_pct: float = 98.0,
                compress: str = "deflate") -> dict:
    """gdalenhance (apps/gdalenhance.cpp): histogram equalization or a
    percent-clip linear stretch to uint8."""
    from gdal_ray.raster.kernels import equalize_histogram, stretch_minmax

    arr, gt, epsg = _read_raster_any(src)
    if arr.ndim == 3:
        out = np.dstack([
            (equalize_histogram(arr[:, :, b]) if mode == "equalize"
             else stretch_minmax(arr[:, :, b], lo_pct, hi_pct))
            for b in range(arr.shape[2])
        ])
    else:
        out = (equalize_histogram(arr) if mode == "equalize"
               else stretch_minmax(arr, lo_pct, hi_pct))
    _write_raster_any(dst, out, gt, epsg=epsg, compress=compress)
    return {"dst": dst, "mode": mode, "dtype": "uint8"}


def cmd_reclass(src: str, dst: str, mapping_spec: str,
                compress: str = "deflate") -> dict:
    """gdal raster reclassify (apps/gdalalg_raster_reclassify.cpp):
    ``old=new,old=new[,default=V]`` value remap; unmapped values pass
    through unless a default is given."""
    from gdal_ray.raster.kernels import reclassify

    mapping, default = {}, None
    for part in mapping_spec.split(","):
        k, _, v = part.partition("=")
        if not v:
            raise SystemExit("reclass mapping is old=new[,old=new,...]"
                             "[,default=V]")
        if k.strip().lower() == "default":
            default = float(v)
        else:
            mapping[float(k)] = float(v)
    arr, gt, epsg = _read_raster_any(src)
    out = reclassify(arr.astype(np.float64), mapping, default=default)
    _write_raster_any(dst, out, gt, epsg=epsg, compress=compress)
    n_hit = int(np.isin(arr.astype(np.float64), list(mapping)).sum())
    return {"dst": dst, "remapped": n_hit, "rules": len(mapping),
            "default": default}


def cmd_ogrtindex(out_path: str, vector_paths: list) -> int:
    """ogrtindex (apps/ogrtindex.cpp): one envelope polygon per vector
    layer with a ``location`` attribute — the vector twin of the raster
    ``tindex`` command."""
    import pandas as pd

    from gdal_ray.geo.wkb import wkb_envelope

    _ensure_ray()
    rows = []
    for p in vector_paths:
        df = _vector_read(p).to_pandas()
        envs = np.asarray([wkb_envelope(bytes(g)) for g in df["geometry"]
                           if g is not None])
        if not len(envs):
            continue
        minx, miny = envs[:, 0].min(), envs[:, 1].min()
        maxx, maxy = envs[:, 2].max(), envs[:, 3].max()
        ring = [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy),
                (minx, miny)]
        import struct as _struct

        wkb = _struct.pack("<BII", 1, 3, 1) + _struct.pack("<I", len(ring))
        for px, py in ring:
            wkb += _struct.pack("<dd", px, py)
        rows.append({"geometry": wkb, "location": os.path.abspath(p),
                     "n_features": int(len(df))})
    import ray.data as rd

    if rows:
        _vector_write(rd.from_pandas(pd.DataFrame(rows)), out_path)
    return len(rows)


def cmd_lineref(mode: str, line_path: str, *args_rest, step: float = 1.0,
                mb: float = 0.0, me: float = 0.0) -> dict:
    """ogrlineref (apps/ogrlineref.cpp): linear referencing along the
    first LineString of the input layer — ``create`` builds the regular
    milepost table, ``get_pos`` returns the measure of a point,
    ``get_subline`` extracts the part between two measures."""
    import pandas as pd

    from gdal_ray.geo.lineops import (line_locate, line_milepoints,
                                      line_substring)
    from gdal_ray.geo.wkb import decode_lines, encode_linestring, encode_point

    _ensure_ray()
    df = _vector_read(line_path).to_pandas()
    geoms = [g for g in df["geometry"] if g is not None]
    if not geoms:
        raise SystemExit("lineref: input has no geometry")
    pts = decode_lines(bytes(geoms[0]))[0]
    if mode == "create":
        dst = args_rest[0]
        mp = line_milepoints(pts, step)
        out = pd.DataFrame({
            "measure": mp[:, 0],
            "geometry": [encode_point(x, y) for _, x, y in mp],
        })
        import ray.data as rd

        _vector_write(rd.from_pandas(out), dst)
        return {"dst": dst, "mileposts": int(len(mp)), "step": step}
    if mode == "get_pos":
        px, py = float(args_rest[0]), float(args_rest[1])
        return {"measure": line_locate(pts, px, py)}
    if mode == "get_subline":
        dst = args_rest[0]
        sub = line_substring(pts, mb, me)
        import ray.data as rd

        _vector_write(rd.from_pandas(pd.DataFrame({
            "mb": [mb], "me": [me],
            "geometry": [encode_linestring(sub)],
        })), dst)
        return {"dst": dst, "vertices": int(len(sub))}
    raise SystemExit(f"lineref: unknown mode {mode!r}")


# --------------------------------------------------------------------------
# gdalmdiminfo / gdalmdimtranslate over the (band, y, x) cube view
# --------------------------------------------------------------------------

def _parse_view_spec(spec: str):
    """"0, 10:50, ::2" -> slices/ints in MDArray.view's grammar."""
    out = []
    for part in spec.split(","):
        part = part.strip()
        if ":" in part:
            bits = [int(v) if v else None for v in part.split(":")]
            while len(bits) < 3:
                bits.append(None)
            out.append(slice(bits[0], bits[1], bits[2]))
        else:
            out.append(int(part))
    return out


def cmd_mdiminfo(src: str) -> dict:
    """gdalmdiminfo (apps/gdalmdiminfo_*.cpp): dimensions / dtype of the
    raster viewed as a (band, y, x) MDArray cube."""
    from gdal_ray.io.tiff import read_tiff_header

    hdr = read_tiff_header(src)
    return {
        "driver": "GeoTIFF as MDArray",
        "arrays": [{
            "name": os.path.splitext(os.path.basename(src))[0],
            "datatype": str(np.dtype(hdr["dtype"]).name),
            "dimensions": [
                {"name": "band", "size": hdr["spp"]},
                {"name": "y", "size": hdr["h"]},
                {"name": "x", "size": hdr["w"]},
            ],
            "nodata": hdr["nodata"],
        }],
    }


def cmd_mdim(src: str, dst: str, view: str | None = None,
             transpose: str | None = None, reduce_spec: str | None = None,
             resample: str | None = None,
             compress: str = "deflate") -> dict:
    """gdalmdimtranslate subset (apps/gdalalg_mdim_convert.cpp /
    gcore/gdalmultidim.cpp GetView/Transpose/GetResampled): compose lazy
    view ops on the (band, y, x) cube and write the materialized result.
    ``--view "0, 10:50, ::2"`` (int squeezes), ``--transpose "0,2,1"``,
    ``--reduce mean:0``, ``--resample H,W[,bilinear]``."""
    from gdal_ray.raster.mdim import MDArray

    arr, hdr = _read_full_tiff(src)
    cube = (arr[None, :, :] if arr.ndim == 2
            else np.ascontiguousarray(np.moveaxis(arr, 2, 0)))
    md = MDArray(cube)
    if view:
        md = md.view(*_parse_view_spec(view))
    if transpose:
        md = md.transpose(tuple(int(v) for v in transpose.split(",")))
    if resample:
        bits = resample.split(",")
        md = md.resampled(int(bits[0]), int(bits[1]),
                          bits[2] if len(bits) > 2 else "nearest")
    if reduce_spec:
        op, _, ax = reduce_spec.partition(":")
        out = md.reduce(op, int(ax or 0))
    else:
        out = md.read()
    if out.ndim == 3:  # (band, y, x) -> chunky for the writer
        out = np.moveaxis(out, 0, 2)
    elif out.ndim not in (2, 3):
        raise SystemExit(f"mdim result has {out.ndim} dims; reduce or "
                         "squeeze to 2-3 before writing")
    gt = list(hdr["gt"] or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0])
    _write_raster_any(dst, np.ascontiguousarray(out), gt,
                      epsg=hdr["epsg"], compress=compress)
    return {"dst": dst, "shape": list(out.shape), "dtype": str(out.dtype)}


# --------------------------------------------------------------------------
# gdal raster overview delete|refresh / nodata-to-alpha / color-merge /
# update
# --------------------------------------------------------------------------

def cmd_overview_delete(src: str) -> dict:
    """gdal raster overview delete (apps/gdalalg_raster_overview_delete
    .cpp): drop the external overview file."""
    ovr = src + ".ovr"
    if os.path.exists(ovr):
        os.remove(ovr)
        return {"deleted": ovr}
    return {"deleted": None}


def cmd_overview_refresh(src: str, resample: str = "average") -> dict:
    """gdal raster overview refresh: rebuild the existing .ovr levels
    from the (possibly updated) base pixels, keeping the level factors."""
    from gdal_ray.io.tiff import read_tiff_header, read_tiff_ifds

    ovr = src + ".ovr"
    if not os.path.exists(ovr):
        raise SystemExit(f"no external overviews at {ovr} (run addo first)")
    base_w = read_tiff_header(src)["w"]
    factors = [max(1, round(base_w / h["w"])) for h in read_tiff_ifds(ovr)]
    return cmd_addo(src, factors, resample=resample)


def cmd_nodata_to_alpha(src: str, dst: str,
                        nodata: float | None = None,
                        compress: str = "deflate") -> dict:
    """gdal raster nodata-to-alpha (apps/gdalalg_raster_nodata_to_alpha
    .cpp): append an alpha band that is 0 on nodata pixels, 255
    elsewhere."""
    from gdal_ray.io.tiff import read_tiff_header

    arr, gt, epsg = _read_raster_any(src)
    if nodata is None:
        try:
            nodata = read_tiff_header(src)["nodata"]
        except (ValueError, OSError):
            nodata = None
    if nodata is None:
        raise SystemExit("nodata-to-alpha needs --nodata or a GDAL_NODATA "
                         "tag on the input")
    band0 = arr if arr.ndim == 2 else arr[:, :, 0]
    alpha = np.where(band0 == nodata, 0, 255).astype(arr.dtype)
    img = arr[:, :, None] if arr.ndim == 2 else arr
    out = np.dstack([img, alpha])
    _write_raster_any(dst, out, gt, epsg=epsg, compress=compress)
    return {"dst": dst, "bands": int(out.shape[2]),
            "transparent": int((alpha == 0).sum())}


def cmd_color_merge(grayscale: str, color: str, dst: str,
                    compress: str = "deflate") -> dict:
    """gdal raster color-merge (apps/gdalalg_raster_color_merge.cpp):
    replace the VALUE channel of the color image's HSV decomposition
    with the grayscale band — the classic pan-fusion alternative to
    Brovey pansharpening."""
    gray, g_hdr = _read_full_tiff(grayscale)
    rgb, _ = _read_full_tiff(color)
    if rgb.ndim != 3 or rgb.shape[2] < 3:
        raise SystemExit("color-merge needs an RGB color input")
    if gray.ndim == 3:
        gray = gray[:, :, 0]
    if gray.shape != rgb.shape[:2]:
        raise SystemExit(f"size mismatch: gray {gray.shape} vs "
                         f"color {rgb.shape[:2]}")
    r, g, b = (rgb[:, :, i].astype(np.float64) / 255.0 for i in range(3))
    mx = np.maximum(np.maximum(r, g), b)
    mn = np.minimum(np.minimum(r, g), b)
    c = mx - mn
    # hue sector selection, vectorized (standard RGB->HSV)
    h = np.zeros_like(mx)
    nz = c > 0
    rmax = nz & (mx == r)
    gmax = nz & (mx == g) & ~rmax
    bmax = nz & ~rmax & ~gmax
    h[rmax] = ((g - b)[rmax] / c[rmax]) % 6.0
    h[gmax] = (b - r)[gmax] / c[gmax] + 2.0
    h[bmax] = (r - g)[bmax] / c[bmax] + 4.0
    s = np.where(mx > 0, c / np.where(mx > 0, mx, 1.0), 0.0)
    v = np.clip(gray.astype(np.float64) / 255.0, 0.0, 1.0)  # merged value
    # HSV -> RGB
    c2 = v * s
    x = c2 * (1.0 - np.abs(h % 2.0 - 1.0))
    m = v - c2
    sector = np.floor(h).astype(np.int64) % 6
    r2 = np.choose(sector, [c2, x, 0 * x, 0 * x, x, c2])
    g2 = np.choose(sector, [x, c2, c2, x, 0 * x, 0 * x])
    b2 = np.choose(sector, [0 * x, 0 * x, x, c2, c2, x])
    out = np.dstack([r2 + m, g2 + m, b2 + m])
    out = np.clip(np.round(out * 255.0), 0, 255).astype(np.uint8)
    gt = list(g_hdr["gt"] or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0])
    _write_raster_any(dst, out, gt, epsg=g_hdr["epsg"], compress=compress)
    return {"dst": dst, "shape": list(out.shape)}


def cmd_update(src: str, dst: str, compress: str = "deflate") -> dict:
    """gdal raster update (apps/gdalalg_raster_update.cpp): paint the
    source into the EXISTING destination raster by georeference (the
    destination's grid and extent win; source pixels landing outside are
    dropped)."""
    s_arr, s_gt, _ = _read_raster_any(src)
    d_arr, d_gt, d_epsg = _read_raster_any(dst)
    if s_arr.ndim == 3:
        s_arr = s_arr[:, :, 0]
    if d_arr.ndim == 3:
        d_arr = d_arr[:, :, 0]
    # integer pixel offset of the source origin in the destination grid
    # (same resolution assumed, like the reference's fast path)
    col0 = round((s_gt[0] - d_gt[0]) / d_gt[1])
    row0 = round((s_gt[3] - d_gt[3]) / d_gt[5])
    h, w = d_arr.shape
    sh, sw = s_arr.shape
    y0, x0 = max(0, row0), max(0, col0)
    y1, x1 = min(h, row0 + sh), min(w, col0 + sw)
    n = 0
    if y1 > y0 and x1 > x0:
        sub = s_arr[y0 - row0:y1 - row0, x0 - col0:x1 - col0]
        d_arr[y0:y1, x0:x1] = sub.astype(d_arr.dtype)
        n = int(sub.size)
    _write_raster_any(dst, d_arr, d_gt, epsg=d_epsg, compress=compress)
    return {"dst": dst, "updated_pixels": n,
            "window": [int(x0), int(y0), int(x1 - x0), int(y1 - y0)]}


def cmd_vsi(sub: str, args: list) -> dict | list:
    """The ``gdal vsi`` command family (apps/gdalalg_vsi_*.cpp): local
    filesystem copy/move/delete/list/sync plus the SOZip utility
    (apps/gdalalg_vsi_sozip.cpp; io/sozip.py implements the format)."""
    import os
    import shutil

    if sub == "copy":
        src, dst = args[0], args[1]
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy2(src, dst)
        return {"copied": src, "to": dst}
    if sub == "move":
        shutil.move(args[0], args[1])
        return {"moved": args[0], "to": args[1]}
    if sub == "delete":
        p = args[0]
        if os.path.isdir(p):
            shutil.rmtree(p)
        else:
            os.remove(p)
        return {"deleted": p}
    if sub == "list":
        p = args[0]
        recursive = "-r" in args
        if os.path.isfile(p) and p.endswith(".zip"):
            from gdal_ray.io.sozip import sozip_list

            return [{k: e[k] for k in ("name", "size", "csize", "sozip")}
                    for e in sozip_list(p)]
        out = []
        if recursive:
            for root, _, names in os.walk(p):
                for n in sorted(names):
                    fp = os.path.join(root, n)
                    out.append({"name": os.path.relpath(fp, p),
                                "size": os.path.getsize(fp)})
        else:
            for n in sorted(os.listdir(p)):
                fp = os.path.join(p, n)
                out.append({"name": n,
                            "size": os.path.getsize(fp)
                            if os.path.isfile(fp) else None,
                            "dir": os.path.isdir(fp)})
        return out
    if sub == "sync":
        src, dst = args[0].rstrip("/"), args[1].rstrip("/")
        copied = 0
        for root, _, names in os.walk(src):
            rel = os.path.relpath(root, src)
            troot = os.path.join(dst, rel) if rel != "." else dst
            os.makedirs(troot, exist_ok=True)
            for n in names:
                s, t = os.path.join(root, n), os.path.join(troot, n)
                if (not os.path.exists(t)
                        or os.path.getmtime(s) > os.path.getmtime(t)
                        or os.path.getsize(s) != os.path.getsize(t)):
                    shutil.copy2(s, t)
                    copied += 1
        return {"synced": src, "to": dst, "copied": copied}
    if sub == "sozip":
        from gdal_ray.io.sozip import (DEFAULT_CHUNK, sozip_create,
                                       sozip_list, sozip_validate)

        op = args[0]
        if op == "create":
            chunk = DEFAULT_CHUNK
            enable = None
            rest = []
            i = 1
            while i < len(args):
                if args[i] == "--chunk":
                    chunk = int(args[i + 1]); i += 2
                elif args[i] == "--enable":
                    v = args[i + 1].lower()
                    enable = None if v == "auto" else (v == "yes"); i += 2
                else:
                    rest.append(args[i]); i += 1
            zip_path, files = rest[0], rest[1:]
            return sozip_create(
                zip_path, [(os.path.basename(f), f) for f in files],
                chunk_size=chunk, force_sozip=enable)
        if op == "list":
            return sozip_list(args[1])
        if op == "validate":
            zp = args[1]
            names = ([args[2]] if len(args) > 2 else
                     [e["name"] for e in sozip_list(zp) if e["sozip"]])
            return [sozip_validate(zp, n) for n in names]
        raise SystemExit(f"vsi sozip: unknown op {op!r}")
    raise SystemExit(f"vsi: unknown subcommand {sub!r} "
                     "(copy|move|delete|list|sync|sozip)")
