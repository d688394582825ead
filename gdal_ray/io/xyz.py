"""XYZ gridded-text codec (.xyz): one ``x y z`` line per pixel.

Reference parity target: ``frmts/xyz/xyzdataset.cpp`` — evenly-spaced
x/y samples (a raster in disguise), optional header line, comma or
whitespace separators, either pixel-center convention; GDAL infers the
grid from the distinct sorted x and y values and requires them evenly
spaced. Lines may arrive in any row order (y ascending OR descending).

Engine shape: whole-file codec over numpy loadtxt-style parsing;
``read_xyz`` rebuilds the (h, w) grid + geotransform (north-up, y
descending rows like every other raster here), ``write_xyz`` emits
rows top-down with x fastest, the reference's write layout.
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_xyz", "write_xyz"]


def read_xyz(path: str):
    """.xyz -> (array (h, w) float64, gt). Grid spacing is inferred from
    the distinct coordinate values (must be evenly spaced, the
    reference's check); missing cells raise."""
    rows = []
    with open(path) as fh:
        for line in fh:
            line = line.strip().replace(",", " ").replace(";", " ")
            if not line:
                continue
            parts = line.split()
            try:
                rows.append([float(p) for p in parts[:3]])
            except ValueError:
                if rows:
                    raise
                continue  # header line
    data = np.array(rows, dtype=np.float64)
    if data.ndim != 2 or data.shape[1] < 3:
        raise ValueError("XYZ file needs x y z columns")
    xs = np.unique(data[:, 0])
    ys = np.unique(data[:, 1])
    for vals, name in ((xs, "x"), (ys, "y")):
        if len(vals) > 1:
            steps = np.diff(vals)
            if not np.allclose(steps, steps[0], rtol=1e-8):
                raise ValueError(f"unevenly spaced {name} values")
    dx = float(xs[1] - xs[0]) if len(xs) > 1 else 1.0
    dy = float(ys[1] - ys[0]) if len(ys) > 1 else 1.0
    w, h = len(xs), len(ys)
    if len(data) != w * h:
        raise ValueError(f"expected {w * h} samples, got {len(data)}")
    ci = np.searchsorted(xs, data[:, 0])
    ri = (h - 1) - np.searchsorted(ys, data[:, 1])  # row 0 = max y
    grid = np.full((h, w), np.nan)
    grid[ri, ci] = data[:, 2]
    if np.isnan(grid).any():
        raise ValueError("duplicate or missing grid cells")
    # coordinates are CELL CENTERS (the reference's half-cell offset)
    gt = [float(xs[0]) - dx / 2.0, dx, 0.0,
          float(ys[-1]) + dy / 2.0, 0.0, -dy]
    return grid, gt


def write_xyz(path: str, arr: np.ndarray, gt, fmt: str = "%s") -> None:
    """(h, w) array + north-up geotransform -> .xyz rows (top-down, x
    fastest, center coordinates)."""
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError("write_xyz takes a single-band (H, W) array")
    if gt[2] or gt[4] or gt[5] >= 0:
        raise ValueError("write_xyz needs an axis-aligned north-up grid")
    h, w = arr.shape
    xs = gt[0] + (np.arange(w) + 0.5) * gt[1]
    with open(path, "w") as fh:
        for r in range(h):
            y = gt[3] + (r + 0.5) * gt[5]
            for c in range(w):
                fh.write(f"{xs[c]!r} {y!r} {arr[r, c]}\n")
