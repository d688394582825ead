"""Command-line surface mirroring the reference's most-used tools over
the engine's own drivers (``apps/gdalinfo_bin.cpp``, ``apps/ogrinfo*``,
``apps/ogr2ogr*``, ``apps/gdal_translate*``):

    python -m gdal_ray info <file>                  # gdalinfo / ogrinfo
    python -m gdal_ray ogr2ogr <src> <dst>          # vector convert
    python -m gdal_ray ogr2ogr <src> <dst.mbtiles> [--zoom zmin zmax]
                                                    # MVT vector tiles
    python -m gdal_ray translate <src.tif> <dst.tif>
        [--srcwin x y w h] [--scale a b] [--compress deflate|lzw|...]
    python -m gdal_ray dem <mode> <src.tif> <dst.tif>  # gdaldem
        mode: hillshade|slope|aspect|tri|tpi|roughness|color-relief
        [--color-file ramp.txt] [--z FACTOR] [--compress ...]
        [--multidirectional|--combined|--igor] [--alg horn|zt]  # hillshade
    python -m gdal_ray locationinfo <src.tif> <x> <y>  # gdallocationinfo
        [--pixel] [-r near|bilinear|cubic|cubicspline]
    python -m gdal_ray contour <src.tif> <dst-vector> -i INTERVAL [--base B]
    python -m gdal_ray warp <src> <dst> -t_srs EPSG:3857 [-s_srs ...]
        [-r near|bilinear|cubic|lanczos|average|rms|sum|min|max|med|q1|q3|mode]
    python -m gdal_ray sieve|fillnodata|proximity|viewshed <src> <dst> [--opts]
    python -m gdal_ray grid <src-points> <dst.tif> --size W H [-a invdist|...]
    python -m gdal_ray sql "SELECT ..." <table-dir> [--out f.parquet] [--limit N]
    python -m gdal_ray pipeline read <src> ! <step> [k=v ...] ! ... ! write <dst>
        steps: filter/derive/select/rename/sort/limit/sample/distinct/
        sql/concat/quantiles/heavy-hitters/stratified-sample/
        pii-redact/c4-filter/dsir-select/bpe-encode/mix-select plus
        geometry swap-xy/segmentize/simplify/
        simplify-coverage/buffer/reproject/centroid/make-valid/
        explode-collections/set-geom-type/clip (quote ! in most shells)
    python -m gdal_ray buildvrt <dst.vrt> <a.tif> [b.tif ...]  # gdalbuildvrt
    python -m gdal_ray tindex <dst.(gpkg|shp|geojsonl|...)> <a.tif> [b.tif ...]
    python -m gdal_ray rasterize <src-vector> <dst.tif> --size W H
        [--burn V] [--extent minx miny maxx maxy] [--compress ...]

The gdal-utils script suite (cli_utils.py):

    python -m gdal_ray addo <src.tif> 2 4 8 [-r average|nearest|mode|rms|
        gauss|cubic]                       # gdaladdo -> external .ovr
    python -m gdal_ray dumpoverviews <src[.ovr]> [--out prefix]
    python -m gdal_ray nearblack <src> <dst> [--near N] [--white]
        [--floodfill] [--set-value V]
    python -m gdal_ray pansharpen <pan.tif> <ms.tif> <dst.tif>
        [--weights a,b,c] [--bit-depth N]
    python -m gdal_ray polygonize <src.tif> <dst-vector> [--nodata V]
        [--connect8]
    python -m gdal_ray footprint <src.tif> <dst-vector> [--nodata V]
    python -m gdal_ray merge <dst.tif> <a.tif> [b.tif ...] [--nodata V]
    python -m gdal_ray calc --calc "A*2 + sqrt(B)" -A a.tif [-B b.tif ...]
        <dst.tif> [--type float32] [--nodata V]
    python -m gdal_ray rgb2pct <src> <dst.(png|tif)> [--colors N]
        [--method fs|ordered|nearest]
    python -m gdal_ray pct2rgb <src.(png|tif)> <dst>
    python -m gdal_ray gdal2xyz <src.tif> <dst.(xyz|csv|parquet)>
    python -m gdal_ray transform -s_srs EPSG:4326 -t_srs EPSG:3857 x y [x y ..]
    python -m gdal_ray compare <a.tif> <b.tif>           # gdalcompare
    python -m gdal_ray gdal2tiles <src.tif> <out_dir|out.mbtiles>
        --zoom zmin zmax [--tms]
    python -m gdal_ray mbtiles write <pyramid_dir> <out.mbtiles> [name]
    python -m gdal_ray mbtiles info <file.mbtiles>
    python -m gdal_ray mbtiles extract <file.mbtiles> <out_dir>
    python -m gdal_ray retile <src.tif> <out_dir> --ps W H
    python -m gdal_ray zoomify <src.tif> <out_dir>  # Zoomify TileGroup tree
    python -m gdal_ray ogrmerge <dst> <src1> [src2 ...]
    python -m gdal_ray create <dst.tif> --size W H [--burn V] [--gt 6 vals]
        [--epsg N] [--type float32] [--nodata V]
    python -m gdal_ray manage identify|copy|rename|delete <path> [dst]
    python -m gdal_ray edit <file.tif> [--gt 6 vals] [--epsg N] [--nodata V]
    python -m gdal_ray layeralg intersection|union|symdifference|identity|
        erase|update <input-vector> <method-vector> <dst>
    python -m gdal_ray srsinfo <srs>    # EPSG:xxxx | LCC:... | PSTA:... etc
    python -m gdal_ray enhance <src> <dst> [--mode equalize|minmax]
        [--lo PCT] [--hi PCT]            # gdalenhance -> uint8
    python -m gdal_ray reclass <src> <dst> --map "1=10,2=20[,default=0]"
    python -m gdal_ray ogrtindex <dst> <a.geojson> [b.shp ...]
    python -m gdal_ray lineref create <line-vec> <dst> --step S |
        get_pos <line-vec> x y | get_subline <line-vec> <dst> --mb A --me B
    python -m gdal_ray overview-delete <src.tif> | overview-refresh
        <src.tif> [-r kernel]            # gdal raster overview ...
    python -m gdal_ray nodata-to-alpha <src> <dst> [--nodata V]
    python -m gdal_ray color-merge <gray.tif> <rgb.tif> <dst.tif>  # HSV V-merge
    python -m gdal_ray update <src.tif> <existing-dst.tif>  # paint by georef
    python -m gdal_ray vsi copy|move|delete|list|sync <args...>  # gdal vsi
    python -m gdal_ray vsi sozip create [--chunk N] [--enable auto|yes|no]
        <dst.zip> <file...> | list <z.zip> | validate <z.zip> [entry]
    python -m gdal_ray mdiminfo <src.tif>   # gdalmdiminfo (band,y,x cube)
    python -m gdal_ray mdim <src.tif> <dst.tif> [--view "0, 10:50, ::2"]
        [--transpose "0,2,1"] [--reduce mean:0] [--resample H,W[,bilinear]]

Formats are sniffed from the extension: .tif/.tiff (GeoTIFF), .gpkg
(GeoPackage), .shp (Shapefile), .geojson (FeatureCollection), .geojsonl/
.geojsons (GeoJSONSeq directory or file), .gpx (GPX waypoints — point
layers only, like the reference's wpt layer), .kml (KML Placemarks),
.arrow (Arrow IPC shard directory), .gml (WFS FeatureCollection),
.csv (CSV layer), .parquet.
Geometry stays the engine's canonical WKB end-to-end, so vector
conversions are byte-exact where the formats allow.

The CLI owns its Ray session (guarded init — the driver contract in
__ray_entry__ must never init)."""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _vector_read(path: str):
    ext = os.path.splitext(path)[1].lower()
    if ext == ".gpkg":
        from gdal_ray.sources.gpkg import read_gpkg

        return read_gpkg(path)
    if ext == ".shp":
        from gdal_ray.sources.shapefile import read_shapefile

        return read_shapefile(path)
    if ext == ".geojson":
        from gdal_ray.sources.geojson import read_geojson

        return read_geojson(path)
    if ext in (".geojsonl", ".geojsons") or os.path.isdir(path):
        from gdal_ray.sources.geojson import read_geojsonseq

        return read_geojsonseq(path)
    if ext == ".gpx":
        from gdal_ray.sources.gpx import read_gpx

        return read_gpx(path, "waypoints")
    if ext == ".kml":
        from gdal_ray.sources.kml import read_kml

        return read_kml(path)
    if ext == ".arrow":
        from gdal_ray.sources.arrowipc import read_arrow_ipc

        return read_arrow_ipc(path)
    if ext == ".gml":
        from gdal_ray.sources.gml import read_gml

        return read_gml(path)
    if ext == ".csv":
        from gdal_ray.sources.csvlayer import read_csv_layer

        return read_csv_layer(path, wkt_col="wkt")
    if ext == ".parquet":
        from gdal_ray.sources.corpus import read_parquet_tight

        return read_parquet_tight(path)
    raise SystemExit(f"unsupported vector format: {path}")


def _vector_write(ds, path: str):
    ext = os.path.splitext(path)[1].lower()
    if ext == ".gpkg":
        from gdal_ray.sources.gpkg import write_gpkg

        layer = os.path.splitext(os.path.basename(path))[0]
        return write_gpkg(ds, path, layer)
    if ext == ".shp":
        from gdal_ray.sources.shapefile import write_shapefile

        return write_shapefile(ds, path[:-4])
    if ext == ".geojson":
        from gdal_ray.sources.geojson import write_geojson

        return write_geojson(ds, path)
    if ext in (".geojsonl", ".geojsons"):
        from gdal_ray.sources.geojson import write_geojsonseq

        out = path + ".d" if not os.path.isdir(path) else path
        return int(write_geojsonseq(ds, out).to_pandas()["n"].sum())
    if ext == ".gpx":
        from gdal_ray.sources.gpx import write_gpx

        return write_gpx(ds, path, "waypoints")
    if ext == ".kml":
        from gdal_ray.sources.kml import write_kml

        return write_kml(ds, path)
    if ext == ".arrow":
        from gdal_ray.sources.arrowipc import write_arrow_ipc

        out = path + ".d" if not os.path.isdir(path) else path
        return int(write_arrow_ipc(ds, out).to_pandas()["n"].sum())
    if ext == ".gml":
        from gdal_ray.sources.gml import write_gml

        return write_gml(ds, path)
    if ext == ".csv":
        from gdal_ray.sources.csvlayer import write_csv_layer

        d = os.path.dirname(path) or "."
        return int(write_csv_layer(ds, d).to_pandas()["n"].sum())
    if ext == ".parquet":
        ds.write_parquet(path)
        return ds.count()
    raise SystemExit(f"unsupported output format: {path}")


def _read_raster_any(path: str):
    """(array, gt, epsg) for any supported raster extension."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".asc":
        from gdal_ray.io.aaigrid import read_aaigrid

        arr, gt, _ = read_aaigrid(path)
        return arr, gt, None
    if ext == ".xyz":
        from gdal_ray.io.xyz import read_xyz

        arr, gt = read_xyz(path)
        return arr, gt, None
    if ext == ".vrt":
        from gdal_ray.sources.vrt import read_vrt, vrt_mosaic

        arr, gt = vrt_mosaic(path)
        return arr, gt, read_vrt(path)["epsg"]
    arr, h = _read_full_tiff(path)
    return arr, list(h["gt"] or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]), h["epsg"]


def _write_raster_any(path: str, arr, gt, epsg=None, compress="deflate"):
    ext = os.path.splitext(path)[1].lower()
    if ext == ".asc":
        from gdal_ray.io.aaigrid import write_aaigrid

        if arr.ndim == 3:
            arr = arr[:, :, 0]
        return write_aaigrid(path, arr, gt)
    if ext == ".xyz":
        from gdal_ray.io.xyz import write_xyz

        if arr.ndim == 3:
            arr = arr[:, :, 0]
        return write_xyz(path, arr, gt)
    from gdal_ray.io.tiff import write_geotiff

    return write_geotiff(path, np.ascontiguousarray(arr), gt, epsg=epsg,
                         compress=compress)


def cmd_info(path: str) -> dict:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".asc":
        from gdal_ray.io.aaigrid import read_aaigrid

        arr, gt, nodata = read_aaigrid(path)
        return {
            "driver": "AAIGrid",
            "size": [arr.shape[1], arr.shape[0]],
            "bands": 1,
            "nodata": nodata,
            "geotransform": gt,
            "origin": [gt[0], gt[3]],
            "pixel_size": [gt[1], gt[5]],
            "extent": [gt[0], gt[3] + arr.shape[0] * gt[5],
                       gt[0] + arr.shape[1] * gt[1], gt[3]],
        }
    if ext == ".vrt":
        from gdal_ray.sources.vrt import read_vrt

        m = read_vrt(path)
        gt = m["gt"]
        return {
            "driver": "VRT",
            "size": [m["w"], m["h"]],
            "bands": len(m["bands"]),
            "dtype": str(m["dtype"].name),
            "epsg": m["epsg"],
            "nodata": m["nodata"],
            "sources": [e["path"] for e in m["bands"][0]],
            "geotransform": gt,
            "origin": [gt[0], gt[3]],
            "pixel_size": [gt[1], gt[5]],
            "extent": [gt[0], gt[3] + m["h"] * gt[5],
                       gt[0] + m["w"] * gt[1], gt[3]],
        }
    if ext in (".tif", ".tiff"):
        from gdal_ray.io.tiff import read_tiff_header

        h = read_tiff_header(path)
        comp = {1: "NONE", 5: "LZW", 8: "DEFLATE", 32946: "DEFLATE",
                32773: "PACKBITS"}.get(h["compression"], str(h["compression"]))
        gt = h["gt"]
        info = {
            "driver": "GeoTIFF",
            "size": [h["w"], h["h"]],
            "bands": h["spp"],
            "dtype": str(np.dtype(h["dtype"]).name),
            "blocks": ([h["tile_w"], h["tile_h"]]
                       if h["tiled"] else [h["tile_w"], h["tile_h"]]),
            "tiled": h["tiled"],
            "compression": comp,
            "geotransform": gt,
            "epsg": h["epsg"],
        }
        if gt:
            info["origin"] = [gt[0], gt[3]]
            info["pixel_size"] = [gt[1], gt[5]]
            info["extent"] = [gt[0], gt[3] + h["h"] * gt[5],
                              gt[0] + h["w"] * gt[1], gt[3]]
        if h["nodata"] is not None:
            info["nodata"] = h["nodata"]
        if h["colormap"] is not None:
            info["palette_colors"] = int(h["colormap"].shape[0])
        if os.path.exists(path + ".ovr"):
            # gdalinfo lists external overview levels the same way
            from gdal_ray.io.tiff import read_tiff_ifds

            info["overviews"] = [[o["w"], o["h"]]
                                 for o in read_tiff_ifds(path + ".ovr")]
        return info
    if ext == ".gpkg":
        from gdal_ray.sources.gpkg import gpkg_layers

        _ensure_ray()
        layers = {}
        for layer in gpkg_layers(path):
            from gdal_ray.sources.gpkg import read_gpkg

            ds = read_gpkg(path, layer=layer)
            layers[layer] = {
                "features": ds.count(),
                "fields": ds.schema().names,
            }
        return {"driver": "GPKG", "layers": layers}
    # generic vector info
    _ensure_ray()
    ds = _vector_read(path)
    info = {
        "driver": ext.lstrip("."),
        "features": ds.count(),
        "fields": ds.schema().names,
    }
    if "geometry" in info["fields"]:
        from gdal_ray.geo.wkb import wkb_envelope

        def env(b):
            import pandas as pd

            es = [wkb_envelope(bytes(g)) for g in b["geometry"]
                  if g is not None]
            if not es:
                return pd.DataFrame({"minx": [], "miny": [],
                                     "maxx": [], "maxy": []})
            a = np.asarray(es)
            return pd.DataFrame({
                "minx": [a[:, 0].min()], "miny": [a[:, 1].min()],
                "maxx": [a[:, 2].max()], "maxy": [a[:, 3].max()],
            })

        e = ds.map_batches(env, batch_format="pandas").to_pandas()
        if len(e):
            info["extent"] = [float(e["minx"].min()), float(e["miny"].min()),
                              float(e["maxx"].max()), float(e["maxy"].max())]
    return info


def cmd_ogr2ogr(src: str, dst: str, zooms=None) -> int:
    _ensure_ray()
    ds = _vector_read(src)
    if dst.endswith(".mbtiles"):
        # vector tiles: the reference's ogr2ogr -f MBTILES / -f MVT path
        # (geometry must already be EPSG:3857; warp with `transform` first)
        from gdal_ray.pipelines.vectortiles import vector_tiles_to_mbtiles

        zs = [int(z) for z in (zooms or [0, 1, 2, 3])]
        return int(vector_tiles_to_mbtiles(ds, dst, zs)["n_tiles"])
    return int(_vector_write(ds, dst) or 0)


def cmd_translate(src: str, dst: str, srcwin=None, scale=None,
                  compress: str = "deflate", outsize=None,
                  resample: str = "nearest", ot: str | None = None,
                  bands: list | None = None) -> dict:
    """gdal_translate core: window subset, -b band selection/reorder,
    linear rescale, -outsize resize (nearest/bilinear/cubic/lanczos),
    and -ot output-type cast, between any supported raster formats
    (GeoTIFF, VRT, AAIGrid), through the real kernels
    (raster/kernels.py)."""
    from gdal_ray.raster import kernels as K

    arr, gt, epsg = _read_raster_any(src)
    if bands:
        img = arr[:, :, None] if arr.ndim == 2 else arr
        for b in bands:
            if not 1 <= int(b) <= img.shape[2]:
                raise SystemExit(f"translate -b {b}: input has "
                                 f"{img.shape[2]} band(s)")
        sel = img[:, :, [int(b) - 1 for b in bands]]
        arr = sel[:, :, 0] if sel.shape[2] == 1 else sel
    if srcwin:
        x, y, w, ww = srcwin
        arr = K.translate_window(arr, x, y, w, ww)
        gt = [gt[0] + x * gt[1], gt[1], gt[2],
              gt[3] + y * gt[5], gt[4], gt[5]]
    if scale:
        arr = K.rescale_linear(arr.astype(np.float64), scale[0], scale[1])
    if outsize:
        h0, w0 = arr.shape[:2]
        w1, h1 = int(outsize[0]), int(outsize[1])
        # gdal_translate -outsize: 0 keeps the aspect ratio from the
        # other dimension (apps/gdal_translate_lib.cpp)
        if w1 == 0 and h1 == 0:
            raise SystemExit("translate --outsize needs at least one "
                             "non-zero dimension")
        if w1 == 0:
            w1 = max(1, round(w0 * h1 / h0))
        if h1 == 0:
            h1 = max(1, round(h0 * w1 / w0))
        fn = {"nearest": K.resample_nearest, "near": K.resample_nearest,
              "bilinear": K.resample_bilinear, "cubic": K.resample_cubic,
              "lanczos": K.resample_lanczos}.get(resample)
        if fn is None:
            raise SystemExit(f"unsupported -r {resample!r} for outsize")
        dt = arr.dtype
        out = fn(arr if fn is K.resample_nearest else
                 arr.astype(np.float64), h1, w1)
        arr = (K.cast_clip(out, dt)
               if fn is not K.resample_nearest
               and np.issubdtype(dt, np.integer) else out)
        gt = [gt[0], gt[1] * w0 / w1, gt[2] * h0 / h1,
              gt[3], gt[4] * w0 / w1, gt[5] * h0 / h1]
    if ot:
        arr = K.cast_clip(arr, np.dtype(ot))
    _write_raster_any(dst, arr, gt, epsg=epsg, compress=compress)
    return {"size": [arr.shape[1], arr.shape[0]], "dtype": str(arr.dtype)}


def _read_full_tiff(src: str):
    from gdal_ray.io.tiff import read_tiff_header, read_tile

    h = read_tiff_header(src)
    full = np.zeros((h["n_tiles_y"] * h["tile_h"],
                     h["n_tiles_x"] * h["tile_w"], h["spp"]), dtype=h["dtype"])
    for i in range(len(h["offsets"])):
        ty, tx = divmod(i, h["n_tiles_x"])
        t = read_tile(src, h, i)
        full[ty * h["tile_h"]:(ty + 1) * h["tile_h"],
             tx * h["tile_w"]:(tx + 1) * h["tile_w"]] = (
            t if t.ndim == 3 else t[:, :, None])
    arr = full[: h["h"], : h["w"]]
    return (arr[:, :, 0] if h["spp"] == 1 else arr), h


def cmd_dem(mode: str, src: str, dst: str, color_file: str | None = None,
            z: float = 1.0, compress: str = "deflate",
            shading: str = "classic", alg: str = "horn") -> dict:
    """gdaldem over GeoTIFF (apps/gdaldem_lib.cpp modes): hillshade
    (classic plus -multidirectional / -combined / -igor shading and the
    -alg ZevenbergenThorne gradient), slope, aspect, TRI, TPI, roughness
    emit single-band rasters; color-relief reads a ramp file (percent
    entries resolved against the band range) and emits a 4-band RGBA
    GeoTIFF."""
    from gdal_ray.io.tiff import write_geotiff
    from gdal_ray.raster import kernels as K

    dem, h = _read_full_tiff(src)
    if dem.ndim == 3:
        dem = dem[:, :, 0]
    dem = dem.astype(np.float64)
    gt = h["gt"] or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]
    ew, ns = gt[1], gt[5]
    if mode == "hillshade":
        if shading == "multidirectional":
            out = K.hillshade_multidirectional(dem, ewres=ew, nsres=ns, z=z,
                                               alg=alg)
        elif shading == "combined":
            out = K.hillshade_combined(dem, ewres=ew, nsres=ns, z=z, alg=alg)
        elif shading == "igor":
            out = K.hillshade_igor(dem, ewres=ew, nsres=ns, z=z, alg=alg)
        else:
            out = K.hillshade(dem, ewres=ew, nsres=ns, z=z)
    elif mode == "slope":
        out = K.slope_horn(dem, ewres=ew, nsres=ns).astype(np.float32)
    elif mode == "aspect":
        out = K.aspect(dem).astype(np.float32)
    elif mode == "tri":
        out = K.tri(dem).astype(np.float32)
    elif mode == "tpi":
        out = K.tpi(dem).astype(np.float32)
    elif mode == "roughness":
        out = K.roughness(dem).astype(np.float32)
    elif mode == "color-relief":
        from gdal_ray.raster.color import color_relief, parse_color_ramp

        if color_file is None:
            raise SystemExit("color-relief needs a color file argument")
        with open(color_file) as fh:
            ramp = parse_color_ramp(fh.read(), src_min=float(dem.min()),
                                    src_max=float(dem.max()))
        out = color_relief(dem, ramp)
    else:
        raise SystemExit(f"unknown dem mode {mode!r}")
    write_geotiff(dst, np.ascontiguousarray(out), gt, epsg=h["epsg"],
                  compress=compress)
    return {"mode": mode, "size": [out.shape[1], out.shape[0]],
            "bands": 1 if out.ndim == 2 else out.shape[2],
            "dtype": str(out.dtype)}


def cmd_locationinfo(src: str, x: float, y: float, geoloc: bool = True,
                     resample: str = "near") -> dict:
    """gdallocationinfo (apps/gdallocationinfo.cpp:373): map a
    georeferenced (or pixel/line with ``geoloc=False``) coordinate
    through the inverse geotransform and read the band value with the
    selected GRIORA kernel (near/bilinear/cubic/cubicspline)."""
    from gdal_ray.geo.affine import apply_geotransform, invert_geotransform
    from gdal_ray.raster import kernels as K

    arr, h = _read_full_tiff(src)
    if arr.ndim == 3:
        arr = arr[:, :, 0]
    gt = h["gt"] or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]
    if geoloc:
        inv = invert_geotransform(gt)
        px, py = apply_geotransform(inv, np.array([x]), np.array([y]))
    else:
        px, py = np.array([float(x)]), np.array([float(y)])
    col, row = int(np.floor(px[0])), int(np.floor(py[0]))
    if not (0 <= col < h["w"] and 0 <= row < h["h"]):
        return {"pixel": [col, row], "inside": False}
    if resample in ("near", "nearest"):
        val = float(arr[row, col])
    elif resample == "bilinear":
        val = float(K.interpolate_at_point_bilinear(arr, px, py)[0])
    elif resample == "cubic":
        val = float(K.interpolate_at_point_cubic(arr, px, py)[0])
    elif resample == "cubicspline":
        val = float(K.interpolate_at_point_cubicspline(arr, px, py)[0])
    else:
        raise SystemExit(f"unknown resample {resample!r}")
    return {"pixel": [col, row], "inside": True, "value": val}


def cmd_tindex(out_path: str, tif_paths: list) -> int:
    """gdaltindex (apps/gdaltindex_lib.cpp:448): one footprint polygon
    per raster with a ``location`` attribute, written through whichever
    vector driver the output extension selects."""
    import struct

    import pandas as pd

    rows = []
    for p in tif_paths:
        from gdal_ray.io.tiff import read_tiff_header

        h = read_tiff_header(p)
        gt = h["gt"] or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]
        xs = [gt[0], gt[0] + h["w"] * gt[1]]
        ys = [gt[3] + h["h"] * gt[5], gt[3]]
        ring = [(xs[0], ys[1]), (xs[1], ys[1]), (xs[1], ys[0]),
                (xs[0], ys[0]), (xs[0], ys[1])]
        wkb = struct.pack("<BII", 1, 3, 1) + struct.pack("<I", len(ring))
        for px, py in ring:
            wkb += struct.pack("<dd", px, py)
        rows.append({"geometry": wkb, "location": os.path.abspath(p),
                     "epsg": h["epsg"] or 0})
    _ensure_ray()
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame(rows))
    _vector_write(ds, out_path)
    return len(rows)


def cmd_rasterize(src: str, dst: str, size, burn: float = 1.0,
                  extent=None, compress: str = "deflate") -> dict:
    """gdal_rasterize core (apps/gdal_rasterize_lib.cpp:959): burn every
    vector geometry into a new GeoTIFF of ``size`` pixels over ``extent``
    (defaults to the layer envelope), center-containment scanline rule."""
    from gdal_ray.geo.wkb import wkb_envelope
    from gdal_ray.io.tiff import write_geotiff
    from gdal_ray.raster.rasterize import rasterize_wkb

    _ensure_ray()
    geoms = [bytes(b) for b in
             _vector_read(src).to_pandas()["geometry"] if b is not None]
    if extent is None:
        envs = np.array([wkb_envelope(g) for g in geoms])
        extent = [envs[:, 0].min(), envs[:, 1].min(),
                  envs[:, 2].max(), envs[:, 3].max()]
    w_px, h_px = int(size[0]), int(size[1])
    gt = [extent[0], (extent[2] - extent[0]) / w_px, 0.0,
          extent[3], 0.0, -(extent[3] - extent[1]) / h_px]
    out = np.zeros((h_px, w_px), dtype=np.float64)
    for g in geoms:
        rasterize_wkb(out, g, gt, burn)
    write_geotiff(dst, out.astype(np.float32), gt, compress=compress)
    return {"size": [w_px, h_px], "burned": len(geoms),
            "nonzero": int((out != 0).sum())}


def cmd_contour(src: str, dst: str, interval: float, base: float = 0.0) -> int:
    """gdal_contour (apps/gdal_contour.cpp / alg/contour.cpp): iso-lines
    at base + k*interval across the band range, written as WKB
    LineStrings with an ELEV attribute through the vector driver the
    output extension selects."""
    import struct

    import pandas as pd

    from gdal_ray.raster.contour import contour_lines

    dem, h = _read_full_tiff(src)
    if dem.ndim == 3:
        dem = dem[:, :, 0]
    dem = dem.astype(np.float64)
    gt = h["gt"] or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]
    lo, hi = float(dem.min()), float(dem.max())
    k0 = int(np.ceil((lo - base) / interval))
    k1 = int(np.floor((hi - base) / interval))
    levels = [base + k * interval for k in range(k0, k1 + 1)
              if lo < base + k * interval < hi]
    rows = []
    for line in contour_lines(dem, levels, gt=tuple(gt)):
        pts = line["coords"]
        wkb = struct.pack("<BII", 1, 2, len(pts))
        wkb += np.ascontiguousarray(pts, dtype="<f8").tobytes()
        rows.append({"geometry": wkb, "ELEV": line["level"]})
    _ensure_ray()
    import ray.data as rd

    if not rows:
        return 0
    _vector_write(rd.from_pandas(pd.DataFrame(rows)), dst)
    return len(rows)


def _parse_param(v: str):
    if "," in v:
        return [_parse_param(p) for p in v.split(",")]
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    return v


def cmd_pipeline(tokens: list) -> dict:
    """The reference's new step-pipeline CLI
    (``gdal pipeline read src ! step k=v ! ... ! write dst``,
    apps/gdalalg_abstract_pipeline.h:392-410) over the engine's
    registered step set (pipelines/registry.py): read/write bracket a
    lazy chain of Dataset transforms; any driver extension works on
    either end."""
    from gdal_ray.pipelines.registry import Pipeline, list_steps

    groups, cur = [], []
    for t in tokens:
        if t == "!":
            groups.append(cur)
            cur = []
        else:
            cur.append(t)
    groups.append(cur)
    if (len(groups) < 2 or not groups[0] or not groups[-1]
            or groups[0][0] != "read" or groups[-1][0] != "write"
            or len(groups[0]) < 2 or len(groups[-1]) < 2):
        raise SystemExit(
            "pipeline must be: read <src> ! [step k=v ...]* ! write <dst>\n"
            f"known steps: {', '.join(list_steps())}")
    src, dst = groups[0][1], groups[-1][1]
    steps = []
    for g in groups[1:-1]:
        params = {}
        for kv in g[1:]:
            k, _, v = kv.partition("=")
            params[k.replace("-", "_")] = _parse_param(v)
        steps.append((g[0], params))
    _ensure_ray()
    pipe = Pipeline(steps)
    ds = pipe.run(_vector_read(src))
    n = _vector_write(ds, dst)
    return {"rows": int(n or 0), "dst": dst, "chain": pipe.describe()}


def cmd_sql(sql: str, data_dir: str, out: str | None = None,
            limit: int = 20) -> dict:
    """ogrinfo -sql / ExecuteSQL: run the parsed OGR SQL engine
    (gdal_ray/sql.py) against the parquet tables under ``data_dir`` — or
    against ONE vector FILE of any supported extension (.gpkg/.shp/
    .geojson/.gpx/.kml/.arrow/...), bound under both its basename and
    ``input``, matching ExecuteSQL-on-a-datasource. Prints up to
    ``limit`` rows as JSON records, or writes the full result to ``out``
    (.parquet / any vector extension)."""
    from gdal_ray.sql import execute_sql

    _ensure_ray()
    if os.path.isfile(data_dir) and not data_dir.endswith(".parquet"):
        layer = _vector_read(data_dir)
        name = os.path.splitext(os.path.basename(data_dir))[0]
        tables = {name: layer, "input": layer}
        ds = execute_sql(sql, tables)
    else:
        ds = execute_sql(sql, data_dir)
    if out:
        if out.endswith(".parquet"):
            ds.write_parquet(out)
            n = ds.count()
        else:
            n = int(_vector_write(ds, out) or 0)
        return {"rows": n, "dst": out}
    df = ds.limit(int(limit)).to_pandas()
    return {"columns": list(df.columns),
            "rows": json.loads(df.to_json(orient="records"))}


def cmd_raster_util(util: str, src: str, dst: str, **kw) -> dict:
    """The gdal_* single-raster utilities (gdal_sieve.py,
    gdal_fillnodata.py, gdal_proximity.py, gdal_viewshed) over the
    engine's kernels; reads/writes any supported raster extension."""
    from gdal_ray.raster import kernels as K

    arr, gt, epsg = _read_raster_any(src)
    if arr.ndim == 3:
        arr = arr[:, :, 0]
    if util == "sieve":
        out = K.sieve(arr, int(kw.get("threshold", 2)),
                      connect8=bool(kw.get("connect8", False)))
    elif util == "fillnodata":
        out = K.fillnodata(arr.astype(np.float64),
                           float(kw.get("nodata", 0.0)),
                           max_iter=int(kw.get("max_iter", 100)))
        out = out.astype(arr.dtype) if not np.issubdtype(
            arr.dtype, np.floating) else out
    elif util == "proximity":
        target = float(kw.get("target", 0.0))
        md = kw.get("max_dist")
        out = K.proximity(arr == target,
                          max_dist=float(md) if md is not None else None)
        out = out.astype(np.float32)
    elif util == "viewshed":
        from gdal_ray.raster.viewshed import viewshed

        out = viewshed(
            arr.astype(np.float64), int(kw["oy"]), int(kw["ox"]),
            observer_height=float(kw.get("observer_height", 2.0)),
        ).astype(np.uint8) * 255
    else:
        raise SystemExit(f"unknown raster utility {util!r}")
    _write_raster_any(dst, np.ascontiguousarray(out), gt, epsg=epsg,
                      compress=kw.get("compress", "deflate"))
    return {"util": util, "size": [out.shape[1], out.shape[0]],
            "dtype": str(out.dtype)}


def cmd_warp(src: str, dst: str, s_srs: str | None, t_srs: str,
             resample: str = "nearest", src_nodata=None,
             compress: str = "deflate") -> dict:
    """gdalwarp (apps/gdalwarp_lib.cpp): reproject between any supported
    SRS pair with the full resampling set — point kernels
    (near/bilinear/cubic/lanczos) and area statistics
    (average/rms/sum/min/max/med/q1/q3/mode); output grid from the
    suggested extent."""
    from gdal_ray.raster.warp import warp_image

    arr, gt, epsg = _read_raster_any(src)
    if s_srs is None:
        if not epsg:
            raise SystemExit("source has no SRS; pass --s_srs")
        s_srs = f"EPSG:{epsg}"
    out, ogt = warp_image(
        arr, tuple(gt), s_srs, t_srs, resampling=resample,
        src_nodata=float(src_nodata) if src_nodata is not None else None)
    t_epsg = (int(t_srs.split(":")[1])
              if t_srs.upper().startswith("EPSG:") else None)
    _write_raster_any(dst, np.ascontiguousarray(out), list(ogt),
                      epsg=t_epsg, compress=compress)
    return {"size": [out.shape[1], out.shape[0]], "dtype": str(out.dtype),
            "dst_srs": t_srs, "geotransform": list(ogt)}


def cmd_grid(src: str, dst: str, size, algorithm: str = "invdist",
             zfield: str = "z", radius=None, extent=None,
             compress: str = "deflate") -> dict:
    """gdal_grid (apps/gdal_grid_lib.cpp): scattered vector points (WKB
    Points + a z attribute) -> raster via raster/grid.py's algorithm set
    (invdist/invdistnn/nearest/average/min/max/range/count/
    average_distance/average_distance_pts/linear)."""
    from gdal_ray.geo.wkb import decode_points
    from gdal_ray.raster.grid import grid_linear, grid_points

    _ensure_ray()
    df = _vector_read(src).to_pandas()
    px, py = decode_points([bytes(b) for b in df["geometry"]])
    pv = df[zfield].to_numpy(dtype=np.float64)
    if extent is None:
        extent = [px.min(), py.min(), px.max(), py.max()]
    w_px, h_px = int(size[0]), int(size[1])
    gt = (extent[0], (extent[2] - extent[0]) / w_px, 0.0,
          extent[3], 0.0, -(extent[3] - extent[1]) / h_px)
    if algorithm == "linear":
        out = grid_linear(px, py, pv, w_px, h_px, gt)
    else:
        out = grid_points(px, py, pv, w_px, h_px, gt, algorithm=algorithm,
                          radius=float(radius) if radius else np.inf)
    _write_raster_any(dst, out.astype(np.float32), list(gt),
                      compress=compress)
    return {"size": [w_px, h_px], "n_points": len(px),
            "algorithm": algorithm}


def main(argv=None):
    args = list(sys.argv[1:] if argv is None else argv)
    if not args:
        raise SystemExit(__doc__)
    cmd, args = args[0], args[1:]
    if cmd == "info":
        print(json.dumps(cmd_info(args[0]), indent=2, default=str))
    elif cmd == "ogr2ogr":
        zooms = None
        if "--zoom" in args:
            zi = args.index("--zoom")
            zooms = range(int(args[zi + 1]), int(args[zi + 2]) + 1)
            args = args[:zi] + args[zi + 3:]
        n = cmd_ogr2ogr(args[0], args[1], zooms=zooms)
        print(json.dumps({"written": n, "dst": args[1]}))
    elif cmd == "translate":
        srcwin = scale = outsize = ot = None
        bands = []
        compress, resample = "deflate", "nearest"
        pos = []
        i = 0
        while i < len(args):
            if args[i] == "--srcwin":
                srcwin = [int(v) for v in args[i + 1:i + 5]]
                i += 5
            elif args[i] == "--scale":
                scale = [float(args[i + 1]), float(args[i + 2])]
                i += 3
            elif args[i] == "--outsize":
                outsize = [int(args[i + 1]), int(args[i + 2])]
                i += 3
            elif args[i] == "-r":
                resample = args[i + 1]
                i += 2
            elif args[i] == "-ot":
                ot = args[i + 1]
                i += 2
            elif args[i] == "-b":
                bands.append(int(args[i + 1]))
                i += 2
            elif args[i] == "--compress":
                compress = args[i + 1]
                i += 2
            else:
                pos.append(args[i])
                i += 1
        print(json.dumps(cmd_translate(pos[0], pos[1], srcwin, scale,
                                       compress, outsize=outsize,
                                       resample=resample, ot=ot,
                                       bands=bands or None)))
    elif cmd == "dem":
        color_file, zf, compress = None, 1.0, "deflate"
        shading, dalg = "classic", "horn"
        pos = []
        i = 0
        while i < len(args):
            if args[i] == "--color-file":
                color_file = args[i + 1]
                i += 2
            elif args[i] == "--z":
                zf = float(args[i + 1])
                i += 2
            elif args[i] == "--compress":
                compress = args[i + 1]
                i += 2
            elif args[i] in ("--multidirectional", "--combined", "--igor"):
                shading = args[i][2:]
                i += 1
            elif args[i] == "--alg":
                dalg = ("zt" if args[i + 1].lower()
                        in ("zt", "zevenbergenthorne") else "horn")
                i += 2
            else:
                pos.append(args[i])
                i += 1
        print(json.dumps(cmd_dem(pos[0], pos[1], pos[2],
                                 color_file=color_file, z=zf,
                                 compress=compress, shading=shading,
                                 alg=dalg)))
    elif cmd == "locationinfo":
        resample, geoloc = "near", True
        pos = []
        i = 0
        while i < len(args):
            if args[i] == "-r":
                resample = args[i + 1]
                i += 2
            elif args[i] == "--pixel":
                geoloc = False
                i += 1
            else:
                pos.append(args[i])
                i += 1
        print(json.dumps(cmd_locationinfo(pos[0], float(pos[1]),
                                          float(pos[2]), geoloc=geoloc,
                                          resample=resample)))
    elif cmd == "pipeline":
        print(json.dumps(cmd_pipeline(args)))
    elif cmd == "warp":
        s_srs = t_srs = None
        resample, nodata, compress = "nearest", None, "deflate"
        pos = []
        i = 0
        while i < len(args):
            if args[i] in ("-s_srs", "--s_srs"):
                s_srs = args[i + 1]
                i += 2
            elif args[i] in ("-t_srs", "--t_srs"):
                t_srs = args[i + 1]
                i += 2
            elif args[i] == "-r":
                resample = args[i + 1]
                i += 2
            elif args[i] == "--src-nodata":
                nodata = args[i + 1]
                i += 2
            elif args[i] == "--compress":
                compress = args[i + 1]
                i += 2
            else:
                pos.append(args[i])
                i += 1
        if t_srs is None:
            raise SystemExit("warp needs -t_srs")
        print(json.dumps(cmd_warp(pos[0], pos[1], s_srs, t_srs, resample,
                                  nodata, compress)))
    elif cmd in ("sieve", "fillnodata", "proximity", "viewshed"):
        kw = {}
        pos = []
        i = 0
        while i < len(args):
            if args[i].startswith("--"):
                key = args[i][2:].replace("-", "_")
                if key == "connect8":
                    kw[key] = True
                    i += 1
                else:
                    kw[key] = args[i + 1]
                    i += 2
            else:
                pos.append(args[i])
                i += 1
        print(json.dumps(cmd_raster_util(cmd, pos[0], pos[1], **kw)))
    elif cmd == "grid":
        size, alg, zf, radius, extent, compress = None, "invdist", "z", None, None, "deflate"
        pos = []
        i = 0
        while i < len(args):
            if args[i] == "--size":
                size = [int(args[i + 1]), int(args[i + 2])]
                i += 3
            elif args[i] in ("-a", "--algorithm"):
                alg = args[i + 1]
                i += 2
            elif args[i] == "--zfield":
                zf = args[i + 1]
                i += 2
            elif args[i] == "--radius":
                radius = float(args[i + 1])
                i += 2
            elif args[i] == "--extent":
                extent = [float(v) for v in args[i + 1:i + 5]]
                i += 5
            elif args[i] == "--compress":
                compress = args[i + 1]
                i += 2
            else:
                pos.append(args[i])
                i += 1
        if size is None:
            raise SystemExit("grid needs --size W H")
        print(json.dumps(cmd_grid(pos[0], pos[1], size, alg, zf, radius,
                                  extent, compress)))
    elif cmd == "sql":
        out_p, limit = None, 20
        pos = []
        i = 0
        while i < len(args):
            if args[i] == "--out":
                out_p = args[i + 1]
                i += 2
            elif args[i] == "--limit":
                limit = int(args[i + 1])
                i += 2
            else:
                pos.append(args[i])
                i += 1
        print(json.dumps(cmd_sql(pos[0], pos[1], out_p, limit), default=str))
    elif cmd == "contour":
        interval, base = 10.0, 0.0
        pos = []
        i = 0
        while i < len(args):
            if args[i] in ("-i", "--interval"):
                interval = float(args[i + 1])
                i += 2
            elif args[i] == "--base":
                base = float(args[i + 1])
                i += 2
            else:
                pos.append(args[i])
                i += 1
        n = cmd_contour(pos[0], pos[1], interval, base)
        print(json.dumps({"contours": n, "dst": pos[1]}))
    elif cmd == "buildvrt":
        from gdal_ray.sources.vrt import build_vrt

        res = build_vrt(args[1:], args[0])
        print(json.dumps({"dst": args[0], **res}))
    elif cmd == "tindex":
        n = cmd_tindex(args[0], args[1:])
        print(json.dumps({"tiles": n, "dst": args[0]}))
    elif cmd == "rasterize":
        size, burn, extent, compress = None, 1.0, None, "deflate"
        pos = []
        i = 0
        while i < len(args):
            if args[i] == "--size":
                size = [int(args[i + 1]), int(args[i + 2])]
                i += 3
            elif args[i] == "--burn":
                burn = float(args[i + 1])
                i += 2
            elif args[i] == "--extent":
                extent = [float(v) for v in args[i + 1:i + 5]]
                i += 5
            elif args[i] == "--compress":
                compress = args[i + 1]
                i += 2
            else:
                pos.append(args[i])
                i += 1
        if size is None:
            raise SystemExit("rasterize needs --size W H")
        print(json.dumps(cmd_rasterize(pos[0], pos[1], size, burn,
                                       extent, compress)))
    elif cmd in _UTIL_COMMANDS:
        print(json.dumps(_dispatch_util(cmd, args), default=str))
    else:
        raise SystemExit(f"unknown command {cmd!r}\n{__doc__}")


_UTIL_COMMANDS = {
    "addo", "dumpoverviews", "nearblack", "pansharpen", "polygonize",
    "footprint", "merge", "calc", "rgb2pct", "pct2rgb", "gdal2xyz",
    "transform", "compare", "gdal2tiles", "retile", "ogrmerge", "create",
    "manage", "edit", "layeralg", "srsinfo", "enhance", "reclass",
    "ogrtindex", "lineref", "mdiminfo", "mdim", "overview-delete",
    "overview-refresh", "nodata-to-alpha", "color-merge", "update", "vsi",
    "mbtiles", "zoomify",
}


def _split_flags(args, flag_spec):
    """(positional, flags) for {--flag: n_values} specs; n=0 -> boolean."""
    pos, flags = [], {}
    i = 0
    while i < len(args):
        a = args[i]
        if a in flag_spec:
            n = flag_spec[a]
            key = a.lstrip("-").replace("-", "_")
            if n == 0:
                flags[key] = True
                i += 1
            elif n == 1:
                flags[key] = args[i + 1]
                i += 2
            else:
                flags[key] = args[i + 1:i + 1 + n]
                i += 1 + n
        else:
            pos.append(a)
            i += 1
    return pos, flags


def _dispatch_util(cmd: str, args: list):
    from gdal_ray import cli_utils as U

    if cmd == "vsi":
        return U.cmd_vsi(args[0], args[1:])
    if cmd == "addo":
        pos, fl = _split_flags(args, {"-r": 1})
        return U.cmd_addo(pos[0], pos[1:] or [2, 4, 8],
                          resample=fl.get("r", "average"))
    if cmd == "dumpoverviews":
        pos, fl = _split_flags(args, {"--out": 1})
        return U.cmd_dumpoverviews(pos[0], fl.get("out"))
    if cmd == "nearblack":
        pos, fl = _split_flags(args, {"--near": 1, "--white": 0,
                                      "--floodfill": 0, "--set-value": 1})
        return U.cmd_nearblack(
            pos[0], pos[1], near=int(fl.get("near", 15)),
            white=bool(fl.get("white")), floodfill=bool(fl.get("floodfill")),
            set_value=int(fl["set_value"]) if "set_value" in fl else None)
    if cmd == "pansharpen":
        pos, fl = _split_flags(args, {"--weights": 1, "--bit-depth": 1})
        weights = ([float(v) for v in fl["weights"].split(",")]
                   if "weights" in fl else None)
        return U.cmd_pansharpen(pos[0], pos[1], pos[2], weights=weights,
                                bit_depth=int(fl.get("bit_depth", 8)))
    if cmd == "polygonize":
        pos, fl = _split_flags(args, {"--nodata": 1, "--connect8": 0})
        return U.cmd_polygonize(
            pos[0], pos[1],
            nodata=float(fl["nodata"]) if "nodata" in fl else None,
            connect8=bool(fl.get("connect8")))
    if cmd == "footprint":
        pos, fl = _split_flags(args, {"--nodata": 1})
        return U.cmd_footprint(
            pos[0], pos[1],
            nodata=float(fl["nodata"]) if "nodata" in fl else None)
    if cmd == "merge":
        pos, fl = _split_flags(args, {"--nodata": 1, "--compress": 1})
        return U.cmd_merge(
            pos[0], pos[1:],
            nodata=float(fl["nodata"]) if "nodata" in fl else None,
            compress=fl.get("compress", "deflate"))
    if cmd == "calc":
        spec = {"--calc": 1, "--type": 1, "--nodata": 1, "--compress": 1}
        spec.update({f"-{c}": 1 for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"})
        pos, fl = _split_flags(args, spec)
        inputs = {k: v for k, v in fl.items() if len(k) == 1}
        if "calc" not in fl or not inputs or len(pos) != 1:
            raise SystemExit('calc needs --calc "expr", -A file.tif, '
                             "and one output path")
        return U.cmd_calc(fl["calc"], inputs, pos[0],
                          out_dtype=fl.get("type"),
                          nodata=float(fl["nodata"]) if "nodata" in fl
                          else None,
                          compress=fl.get("compress", "deflate"))
    if cmd == "rgb2pct":
        pos, fl = _split_flags(args, {"--colors": 1, "--method": 1})
        return U.cmd_rgb2pct(pos[0], pos[1],
                             n_colors=int(fl.get("colors", 256)),
                             method=fl.get("method", "fs"))
    if cmd == "pct2rgb":
        pos, _ = _split_flags(args, {})
        return U.cmd_pct2rgb(pos[0], pos[1])
    if cmd == "gdal2xyz":
        pos, fl = _split_flags(args, {"--skip-nodata": 0})
        return U.cmd_gdal2xyz(pos[0], pos[1],
                              skip_nodata=bool(fl.get("skip_nodata")))
    if cmd == "transform":
        pos, fl = _split_flags(args, {"-s_srs": 1, "-t_srs": 1})
        coords = [float(v) for v in pos]
        return U.cmd_transform(fl.get("s_srs", "EPSG:4326"),
                               fl.get("t_srs", "EPSG:4326"), coords)
    if cmd == "compare":
        pos, _ = _split_flags(args, {})
        return U.cmd_compare(pos[0], pos[1])
    if cmd == "gdal2tiles":
        pos, fl = _split_flags(args, {"--zoom": 2, "--tms": 0})
        zmin, zmax = ([int(v) for v in fl["zoom"]] if "zoom" in fl
                      else [0, 3])
        return U.cmd_gdal2tiles(pos[0], pos[1], zmin, zmax,
                                xyz=not fl.get("tms"))
    if cmd == "mbtiles":
        pos, _ = _split_flags(args, {})
        return U.cmd_mbtiles(*pos)
    if cmd == "zoomify":
        pos, _ = _split_flags(args, {})
        from gdal_ray.io.zoomify import write_zoomify

        arr, _gt, _epsg = _read_raster_any(pos[0])
        return write_zoomify(np.asarray(arr), pos[1])
    if cmd == "retile":
        pos, fl = _split_flags(args, {"--ps": 2})
        if "ps" not in fl:
            raise SystemExit("retile needs --ps W H")
        return U.cmd_retile(pos[0], pos[1], int(fl["ps"][0]),
                            int(fl["ps"][1]))
    if cmd == "ogrmerge":
        pos, _ = _split_flags(args, {})
        return U.cmd_ogrmerge(pos[0], pos[1:])
    if cmd == "create":
        pos, fl = _split_flags(args, {"--size": 2, "--burn": 1, "--gt": 6,
                                      "--epsg": 1, "--type": 1,
                                      "--nodata": 1})
        if "size" not in fl:
            raise SystemExit("create needs --size W H")
        return U.cmd_create(
            pos[0], int(fl["size"][0]), int(fl["size"][1]),
            burn=float(fl.get("burn", 0.0)),
            gt=[float(v) for v in fl["gt"]] if "gt" in fl else None,
            epsg=int(fl["epsg"]) if "epsg" in fl else None,
            dtype=fl.get("type", "float32"),
            nodata=float(fl["nodata"]) if "nodata" in fl else None)
    if cmd == "manage":
        pos, _ = _split_flags(args, {})
        return U.cmd_manage(pos[0], pos[1],
                            pos[2] if len(pos) > 2 else None)
    if cmd == "edit":
        pos, fl = _split_flags(args, {"--gt": 6, "--epsg": 1, "--nodata": 1})
        return U.cmd_edit(
            pos[0],
            gt=[float(v) for v in fl["gt"]] if "gt" in fl else None,
            epsg=int(fl["epsg"]) if "epsg" in fl else None,
            nodata=float(fl["nodata"]) if "nodata" in fl else None)
    if cmd == "layeralg":
        pos, _ = _split_flags(args, {})
        return U.cmd_layer_algebra(pos[0], pos[1], pos[2], pos[3])
    if cmd == "srsinfo":
        pos, _ = _split_flags(args, {})
        return U.cmd_srsinfo(pos[0])
    if cmd == "enhance":
        pos, fl = _split_flags(args, {"--mode": 1, "--lo": 1, "--hi": 1})
        return U.cmd_enhance(pos[0], pos[1],
                             mode=fl.get("mode", "equalize"),
                             lo_pct=float(fl.get("lo", 2.0)),
                             hi_pct=float(fl.get("hi", 98.0)))
    if cmd == "reclass":
        pos, fl = _split_flags(args, {"--map": 1})
        if "map" not in fl:
            raise SystemExit('reclass needs --map "old=new,...[,default=V]"')
        return U.cmd_reclass(pos[0], pos[1], fl["map"])
    if cmd == "ogrtindex":
        pos, _ = _split_flags(args, {})
        return {"tiles": U.cmd_ogrtindex(pos[0], pos[1:]), "dst": pos[0]}
    if cmd == "lineref":
        pos, fl = _split_flags(args, {"--step": 1, "--mb": 1, "--me": 1})
        return U.cmd_lineref(pos[0], pos[1], *pos[2:],
                             step=float(fl.get("step", 1.0)),
                             mb=float(fl.get("mb", 0.0)),
                             me=float(fl.get("me", 0.0)))
    if cmd == "mdiminfo":
        pos, _ = _split_flags(args, {})
        return U.cmd_mdiminfo(pos[0])
    if cmd == "overview-delete":
        pos, _ = _split_flags(args, {})
        return U.cmd_overview_delete(pos[0])
    if cmd == "overview-refresh":
        pos, fl = _split_flags(args, {"-r": 1})
        return U.cmd_overview_refresh(pos[0], resample=fl.get("r", "average"))
    if cmd == "nodata-to-alpha":
        pos, fl = _split_flags(args, {"--nodata": 1})
        return U.cmd_nodata_to_alpha(
            pos[0], pos[1],
            nodata=float(fl["nodata"]) if "nodata" in fl else None)
    if cmd == "color-merge":
        pos, _ = _split_flags(args, {})
        return U.cmd_color_merge(pos[0], pos[1], pos[2])
    if cmd == "update":
        pos, _ = _split_flags(args, {})
        return U.cmd_update(pos[0], pos[1])
    if cmd == "mdim":
        pos, fl = _split_flags(args, {"--view": 1, "--transpose": 1,
                                      "--reduce": 1, "--resample": 1})
        return U.cmd_mdim(pos[0], pos[1], view=fl.get("view"),
                          transpose=fl.get("transpose"),
                          reduce_spec=fl.get("reduce"),
                          resample=fl.get("resample"))
    raise SystemExit(f"unknown util {cmd!r}")


if __name__ == "__main__":
    main()
