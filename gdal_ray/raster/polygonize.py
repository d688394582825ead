"""Raster -> vector polygonize: rings of constant-value connected regions.

Semantics follow ``GDALPolygonize`` (reference ``alg/polygonize.cpp:73-488``
and the two-arm tracer ``alg/polygonize_polygonizer.cpp``):

- pixels with equal values form regions under 4- or 8-connectedness
  (``polygonize.cpp:487-488``);
- nodata pixels are masked out (no polygon);
- each region yields one polygon whose rings run along pixel edges; holes
  are interior rings;
- ring coordinates are emitted in georeferenced space via the raster's
  geotransform, exactly like GDAL (pixel corner (px, ln) -> geo via gt).

Implementation is a boundary-edge tracer: every region pixel side that
borders a different region (or the raster edge / nodata) contributes a
directed unit edge with the region interior on its left; chaining the edges
yields closed rings. At pinch vertices (diagonal self-touch under
4-connectedness) the tracer takes the rightmost turn, producing simple
rings — the same topology GDAL's two-arm polygonizer emits for those cases.
"""

from __future__ import annotations

import numpy as np

from gdal_ray.geo import affine as _affine
from gdal_ray.geo import pip as _pip

__all__ = ["label_regions", "polygonize_array"]

# directed edge id: (x, y, dir); dirs: 0=+x, 1=+y, 2=-x, 3=-y (y down)
_DX = (1, 0, -1, 0)
_DY = (0, 1, 0, -1)


def label_regions(arr: np.ndarray, nodata=None, connect8: bool = False) -> np.ndarray:
    """Connected-component labels (int32, -1 = nodata) of equal-valued pixels."""
    h, w = arr.shape
    labels = np.full((h, w), -1, dtype=np.int32)
    valid = np.ones((h, w), dtype=bool) if nodata is None else arr != nodata
    next_label = 0
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connect8:
        offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    for sy in range(h):
        for sx in range(w):
            if not valid[sy, sx] or labels[sy, sx] != -1:
                continue
            val = arr[sy, sx]
            stack = [(sy, sx)]
            labels[sy, sx] = next_label
            while stack:
                y, x = stack.pop()
                for dy, dx in offs:
                    ny, nx = y + dy, x + dx
                    if 0 <= ny < h and 0 <= nx < w and valid[ny, nx] and labels[ny, nx] == -1 and arr[ny, nx] == val:
                        labels[ny, nx] = next_label
                        stack.append((ny, nx))
            next_label += 1
    return labels


def _trace_rings(mask: np.ndarray):
    """Rings (list of (M,2) pixel-corner arrays) of a boolean region mask."""
    h, w = mask.shape
    # collect directed boundary edges, interior on the left (y down):
    # top side -> +x, right side -> +y, bottom side -> -x, left side -> -y
    pad = np.zeros((h + 2, w + 2), dtype=bool)
    pad[1:-1, 1:-1] = mask
    ys, xs = np.nonzero(mask)
    edges = {}  # (vx, vy) -> list of dir
    top = mask & ~pad[:-2, 1:-1]
    right = mask & ~pad[1:-1, 2:]
    bottom = mask & ~pad[2:, 1:-1]
    left = mask & ~pad[1:-1, :-2]

    def add(vx, vy, d):
        edges.setdefault((vx, vy), []).append(d)

    ys, xs = np.nonzero(top)
    for y, x in zip(ys, xs):
        add(x, y, 0)
    ys, xs = np.nonzero(right)
    for y, x in zip(ys, xs):
        add(x + 1, y, 1)
    ys, xs = np.nonzero(bottom)
    for y, x in zip(ys, xs):
        add(x + 1, y + 1, 2)
    ys, xs = np.nonzero(left)
    for y, x in zip(ys, xs):
        add(x, y + 1, 3)

    rings = []
    while edges:
        (sx, sy), dirs = next(iter(edges.items()))
        d = dirs.pop()
        if not dirs:
            del edges[(sx, sy)]
        ring = [(sx, sy)]
        cx, cy = sx + _DX[d], sy + _DY[d]
        prev_d = d
        while (cx, cy) != (sx, sy):
            ring.append((cx, cy))
            cand = edges.get((cx, cy))
            if not cand:
                raise RuntimeError("open boundary chain (bug)")
            if len(cand) == 1:
                d = cand.pop()
            else:
                # pinch vertex: rightmost turn relative to incoming direction
                # (turn priority: right, straight, left, back)
                for turn in (1, 0, 3, 2):
                    d2 = (prev_d + turn) % 4
                    if d2 in cand:
                        d = d2
                        cand.remove(d2)
                        break
            if not cand:
                edges.pop((cx, cy), None)
            cx, cy = cx + _DX[d], cy + _DY[d]
            prev_d = d
        ring.append((sx, sy))
        arr = np.asarray(ring, dtype=np.float64)
        # drop collinear midpoints
        keep = np.ones(arr.shape[0], dtype=bool)
        d1 = np.diff(arr[:-1], axis=0, prepend=arr[-2:-1] - arr[:1] + arr[:1])
        for i in range(1, arr.shape[0] - 1):
            if (arr[i] - arr[i - 1])[0] * (arr[i + 1] - arr[i])[1] == (arr[i] - arr[i - 1])[1] * (
                arr[i + 1] - arr[i]
            )[0]:
                keep[i] = False
        arr = arr[keep]
        if (arr[0] != arr[-1]).any():
            arr = np.vstack([arr, arr[:1]])
        rings.append(arr)
    return rings


def _signed_area(ring: np.ndarray) -> float:
    x = ring[:, 0]
    y = ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def polygonize_array(arr: np.ndarray, gt=(0.0, 1.0, 0.0, 0.0, 0.0, 1.0), nodata=None, connect8=False):
    """Polygonize a 2-D array.

    Returns a list of dicts: {value, rings (geo coords, outer first),
    pixel_count}. Deterministic region order (first-pixel scan order), same
    as GDAL emits features in scan order.
    """
    arr = np.asarray(arr)
    labels = label_regions(arr, nodata=nodata, connect8=connect8)
    out = []
    nlab = labels.max() + 1 if labels.size else 0
    for lab in range(nlab):
        mask = labels == lab
        ys, xs = np.nonzero(mask)
        value = arr[ys[0], xs[0]]
        rings_px = _trace_rings(mask)
        # classify: with interior-on-left and y-down, outer rings have
        # positive shoelace area in (x, y-down) coords, holes negative
        outers = [r for r in rings_px if _signed_area(r) > 0]
        holes = [r for r in rings_px if _signed_area(r) <= 0]
        # assign holes to the outer ring containing them
        grouped = []
        for o in outers:
            grouped.append([o])
        for hring in holes:
            cx, cy = hring[0, 0] + 0.25, hring[0, 1] + 0.25
            placed = False
            for g in grouped:
                if _pip.points_in_ring(np.array([cx]), np.array([cy]), g[0])[0]:
                    g.append(hring)
                    placed = True
                    break
            if not placed and grouped:
                grouped[0].append(hring)
        for rings in grouped:
            geo_rings = []
            for r in rings:
                gx, gy = _affine.apply_geotransform(gt, r[:, 0], r[:, 1])
                geo_rings.append(np.stack([gx, gy], axis=1))
            out.append(
                {
                    "value": value,
                    "rings": geo_rings,
                    "pixel_count": int(mask.sum()),
                }
            )
    return out
