"""VRT (virtual raster) driver — the gdalbuildvrt mosaic artifact.

Reference parity targets: ``frmts/vrt/vrtdataset.cpp`` (XML model:
VRTDataset rasterXSize/YSize + GeoTransform + VRTRasterBand/SimpleSource
with SrcRect/DstRect placement — the exact shape of
``autotest/gcore/data/byte.vrt``) and ``apps/gdalbuildvrt_lib.cpp:1946``
(union extent at a common resolution, one SimpleSource per input, later
sources painting over earlier ones).

Engine shape: ``build_vrt`` writes the XML from GeoTIFF headers alone (no
pixel reads); ``read_vrt`` parses it back; ``read_vrt_tiles`` is the
DISTRIBUTED read — every SimpleSource becomes one Ray task that reads its
source windows through the engine's own GeoTIFF codec and emits the
standard single-band raster-row schema with the DstRect-placed
geotransform, so a VRT feeds every raster stage unchanged;
``vrt_mosaic`` assembles the full canvas (bounded driver-side helper for
tests/small mosaics — the scale path is the tile shuffle in
``pipelines/raster [q_mosaic]``).

Supported subset: SimpleSource over GeoTIFF files, identity-scale
SrcRect->DstRect (no implicit resampling), single-band sources via
SourceBand, uniform dtype. ComplexSource scale/offset and per-source
resampling raise with a clear message.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["build_vrt", "read_vrt", "read_vrt_tiles", "vrt_mosaic"]

_DTYPES = {
    "Byte": np.uint8, "UInt16": np.uint16, "Int16": np.int16,
    "UInt32": np.uint32, "Int32": np.int32,
    "Float32": np.float32, "Float64": np.float64,
}
_DTYPE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}


def build_vrt(tif_paths, out_path: str, nodata=None) -> dict:
    """gdalbuildvrt: union extent of the inputs at the FIRST file's
    resolution (all inputs must share it — gdalbuildvrt's default
    -resolution highest/lowest variants are not needed for uniform
    corpora), one SimpleSource per input placed by its geotransform.
    Returns {w, h, gt, n_sources}."""
    from gdal_ray.io.tiff import read_tiff_header

    hdrs = [read_tiff_header(p) for p in tif_paths]
    if not hdrs:
        raise ValueError("no inputs")
    gts = [h["gt"] or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0] for h in hdrs]
    rx, ry = gts[0][1], gts[0][5]
    for gt in gts:
        if gt[1] != rx or gt[5] != ry or gt[2] or gt[4]:
            raise ValueError("build_vrt needs axis-aligned uniform resolution")
    dt = np.dtype(hdrs[0]["dtype"]).newbyteorder("=")
    for h in hdrs:
        if np.dtype(h["dtype"]).newbyteorder("=") != dt:
            raise ValueError("build_vrt needs a uniform dtype")
    minx = min(gt[0] for gt in gts)
    maxy = max(gt[3] for gt in gts)
    maxx = max(gt[0] + h["w"] * gt[1] for gt, h in zip(gts, hdrs))
    miny = min(gt[3] + h["h"] * gt[5] for gt, h in zip(gts, hdrs))
    w = int(round((maxx - minx) / rx))
    h_px = int(round((miny - maxy) / ry))
    vgt = [minx, rx, 0.0, maxy, 0.0, ry]

    root = ET.Element("VRTDataset", rasterXSize=str(w), rasterYSize=str(h_px))
    if hdrs[0]["epsg"]:
        ET.SubElement(root, "SRS").text = f"EPSG:{hdrs[0]['epsg']}"
    ET.SubElement(root, "GeoTransform").text = ", ".join(
        repr(float(v)) for v in vgt
    )
    spp = max(h.get("spp", 1) for h in hdrs)
    for b in range(spp):
        band = ET.SubElement(root, "VRTRasterBand",
                             dataType=_DTYPE_NAMES[dt], band=str(b + 1))
        if nodata is not None:
            ET.SubElement(band, "NodataValue").text = repr(float(nodata))
        for p, hd, gt in zip(tif_paths, hdrs, gts):
            src = ET.SubElement(band, "SimpleSource")
            rel = os.path.dirname(os.path.abspath(out_path))
            fn = ET.SubElement(src, "SourceFilename")
            try:
                fn.text = os.path.relpath(os.path.abspath(p), rel)
                fn.set("relativeToVRT", "1")
            except ValueError:
                fn.text = os.path.abspath(p)
                fn.set("relativeToVRT", "0")
            ET.SubElement(src, "SourceBand").text = str(b + 1)
            ET.SubElement(src, "SrcRect", xOff="0", yOff="0",
                          xSize=str(hd["w"]), ySize=str(hd["h"]))
            xo = int(round((gt[0] - minx) / rx))
            yo = int(round((gt[3] - maxy) / ry))
            ET.SubElement(src, "DstRect", xOff=str(xo), yOff=str(yo),
                          xSize=str(hd["w"]), ySize=str(hd["h"]))
    ET.indent(root)
    with open(out_path, "wb") as fh:
        fh.write(ET.tostring(root))
    return {"w": w, "h": h_px, "gt": vgt, "n_sources": len(tif_paths)}


def read_vrt(path: str) -> dict:
    """Parse a VRTDataset XML -> {w, h, gt, epsg, dtype, nodata, bands:
    [[{path, src_band, src_rect, dst_rect}, ...] per band]}."""
    root = ET.parse(path).getroot()
    if root.tag != "VRTDataset":
        raise ValueError("not a VRTDataset")
    w = int(root.get("rasterXSize"))
    h = int(root.get("rasterYSize"))
    gt_node = root.find("GeoTransform")
    gt = ([float(v) for v in gt_node.text.split(",")]
          if gt_node is not None else [0.0, 1.0, 0.0, 0.0, 0.0, -1.0])
    srs = root.findtext("SRS") or ""
    epsg = int(srs.split(":")[1]) if srs.upper().startswith("EPSG:") else None
    base = os.path.dirname(os.path.abspath(path))
    bands = []
    dtype = None
    nodata = None
    for band in root.findall("VRTRasterBand"):
        dtype = _DTYPES[band.get("dataType", "Byte")]
        nd = band.findtext("NodataValue")
        nodata = float(nd) if nd is not None else nodata
        sources = []
        for src in band:
            if src.tag == "ComplexSource":
                raise ValueError("ComplexSource scale/offset not supported")
            if src.tag != "SimpleSource":
                continue
            fn = src.find("SourceFilename")
            p = fn.text.strip()
            if fn.get("relativeToVRT") == "1":
                p = os.path.join(base, p)

            def rect(tag):
                r = src.find(tag)
                return tuple(int(float(r.get(k)))
                             for k in ("xOff", "yOff", "xSize", "ySize"))

            sr, dr = rect("SrcRect"), rect("DstRect")
            if (sr[2], sr[3]) != (dr[2], dr[3]):
                raise ValueError("scaled SimpleSource not supported")
            sources.append({
                "path": p,
                "src_band": int(src.findtext("SourceBand", "1")),
                "src_rect": sr,
                "dst_rect": dr,
            })
        bands.append(sources)
    return {"w": w, "h": h, "gt": gt, "epsg": epsg,
            "dtype": np.dtype(dtype) if dtype else np.dtype(np.uint8),
            "nodata": nodata, "bands": bands}


def _read_source_window(entry, vgt):
    """One SimpleSource -> (array, tile_gt) in the VRT grid."""
    from gdal_ray.io.tiff import read_tiff_header, read_tile

    hd = read_tiff_header(entry["path"])
    sx, sy, sw, sh = entry["src_rect"]
    full = np.zeros((hd["n_tiles_y"] * hd["tile_h"],
                     hd["n_tiles_x"] * hd["tile_w"], hd.get("spp", 1)),
                    dtype=hd["dtype"])
    for i in range(len(hd["offsets"])):
        ty, tx = divmod(i, hd["n_tiles_x"])
        t = read_tile(entry["path"], hd, i)
        full[ty * hd["tile_h"]:(ty + 1) * hd["tile_h"],
             tx * hd["tile_w"]:(tx + 1) * hd["tile_w"]] = (
            t if t.ndim == 3 else t[:, :, None])
    arr = full[sy:sy + sh, sx:sx + sw, entry["src_band"] - 1]
    dx, dy = entry["dst_rect"][0], entry["dst_rect"][1]
    tile_gt = [vgt[0] + dx * vgt[1], vgt[1], vgt[2],
               vgt[3] + dy * vgt[5], vgt[4], vgt[5]]
    return arr, tile_gt


def read_vrt_tiles(path: str, band: int = 1, columns=None):
    """VRT -> Dataset in the standard raster-row schema, one row per
    SimpleSource (id ``<stem>#s<k>``), each read inside its own Ray task
    through the GeoTIFF codec — a VRT mosaic feeds the raster stages
    without materializing the canvas."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    meta = read_vrt(path)
    vgt = meta["gt"]
    stem = os.path.splitext(os.path.basename(path))[0]
    entries = meta["bands"][band - 1]
    shards = pd.DataFrame({"k": list(range(len(entries)))})
    if shards.empty:
        raise ValueError("VRT has no sources")

    def read_shard(batch: pd.DataFrame) -> pa.Table:
        m = read_vrt(path)
        es = m["bands"][band - 1]
        rows = {"raster_id": [], "pixels": [], "w": [], "h": [], "gt": []}
        for k in batch["k"]:
            e = es[int(k)]
            arr, tgt = _read_source_window(e, m["gt"])
            rows["raster_id"].append(f"{stem}#s{int(k)}")
            rows["pixels"].append(
                arr.astype(np.float64 if arr.dtype.kind == "f"
                           else np.int64).ravel().tolist()
            )
            rows["w"].append(arr.shape[1])
            rows["h"].append(arr.shape[0])
            rows["gt"].append([float(v) for v in tgt])
        return pa.table({
            "raster_id": pa.array(rows["raster_id"], pa.string()),
            "pixels": pa.array(rows["pixels"]),
            "w": pa.array(rows["w"], pa.int32()),
            "h": pa.array(rows["h"], pa.int32()),
            "gt": pa.array(rows["gt"], pa.list_(pa.float64(), 6)),
        })

    out = rd.from_pandas(shards).repartition(len(entries)).map_batches(
        read_shard, batch_format="pandas", batch_size=None
    )
    return out.select_columns(columns) if columns else out


def vrt_mosaic(path: str, band: int = 1) -> tuple:
    """Assemble the full VRT canvas (sources paint in order, later over
    earlier — gdalbuildvrt semantics). Driver-side helper for tests and
    small mosaics; returns (array, gt)."""
    meta = read_vrt(path)
    fill = meta["nodata"] if meta["nodata"] is not None else 0
    out = np.full((meta["h"], meta["w"]), fill, dtype=meta["dtype"])
    for e in meta["bands"][band - 1]:
        arr, _ = _read_source_window(e, meta["gt"])
        dx, dy, dw, dh = e["dst_rect"]
        out[dy:dy + dh, dx:dx + dw] = arr
    return out, meta["gt"]
