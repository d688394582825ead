"""ArcInfo ASCII Grid (.asc) codec.

Reference parity target: ``frmts/aaigrid/aaigriddataset.cpp`` — header
tokens ncols/nrows/{xllcorner|xllcenter}/{yllcorner|yllcenter}/cellsize
(or dx/dy for non-square pixels) + optional NODATA_value, then row-major
values from the TOP row down; the ll* origin refers to the LOWER-left
corner (or cell center for the *center variants), so
gt = [xll, cs, 0, yll + nrows*cs, 0, -cs].

Engine shape: a whole-file codec (ASCII grids are not range-splittable
without a line index); integer-valued grids round-trip exactly, floats
print shortest-round-trip.
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_aaigrid", "write_aaigrid"]


def read_aaigrid(path: str):
    """.asc -> (array (nrows, ncols) float64, gt, nodata|None)."""
    with open(path) as fh:
        text = fh.read()
    tokens = text.split()
    hdr = {}
    i = 0
    while i + 1 < len(tokens):
        key = tokens[i].lower()
        if key in ("ncols", "nrows", "xllcorner", "yllcorner", "xllcenter",
                   "yllcenter", "cellsize", "dx", "dy", "nodata_value"):
            hdr[key] = float(tokens[i + 1])
            i += 2
        else:
            break
    w, h = int(hdr["ncols"]), int(hdr["nrows"])
    dx = hdr.get("cellsize", hdr.get("dx", 1.0))
    dy = hdr.get("cellsize", hdr.get("dy", dx))
    if "xllcorner" in hdr:
        x0 = hdr["xllcorner"]
    elif "xllcenter" in hdr:
        x0 = hdr["xllcenter"] - dx / 2.0
    else:
        x0 = 0.0
    if "yllcorner" in hdr:
        yll = hdr["yllcorner"]
    elif "yllcenter" in hdr:
        yll = hdr["yllcenter"] - dy / 2.0
    else:
        yll = 0.0
    gt = [x0, dx, 0.0, yll + h * dy, 0.0, -dy]
    vals = np.array(tokens[i:i + w * h], dtype=np.float64)
    if vals.size != w * h:
        raise ValueError(f"expected {w * h} values, got {vals.size}")
    return vals.reshape(h, w), gt, hdr.get("nodata_value")


def write_aaigrid(path: str, arr: np.ndarray, gt, nodata=None) -> None:
    """(nrows, ncols) array + geotransform -> .asc (xllcorner layout;
    requires square axis-aligned pixels like the reference's CELLSIZE
    branch; integer-valued arrays print as integers)."""
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError("write_aaigrid takes a single-band (H, W) array")
    h, w = arr.shape
    if gt[2] or gt[4] or abs(abs(gt[1]) - abs(gt[5])) > 1e-7 * abs(gt[1]):
        raise ValueError("AAIGrid needs square axis-aligned pixels")
    yll = gt[3] + h * gt[5] if gt[5] < 0 else gt[3]
    lines = [
        f"ncols        {w}",
        f"nrows        {h}",
        f"xllcorner    {gt[0]!r}",
        f"yllcorner    {yll!r}",
        f"cellsize     {gt[1]!r}",
    ]
    if nodata is not None:
        lines.append(f"NODATA_value {nodata!r}")
    is_int = (np.issubdtype(arr.dtype, np.integer)
              or (np.isfinite(arr).all() and (arr == np.floor(arr)).all()))
    body = arr.astype(np.int64) if is_int else arr.astype(np.float64)
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
        for row in body:
            fh.write(" ".join(str(v) for v in row) + "\n")
