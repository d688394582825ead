"""Contour (iso-line) generation via marching squares.

Mirrors ``alg/contour.cpp:568`` + ``alg/marching_squares/*.h``: for each
contour level, each 2x2 pixel-center cell contributes 0-2 segments whose
endpoints are linearly interpolated on the cell edges; segments are stitched
into polylines. Grid registration: value at pixel (i, j) sits at pixel
center (j + 0.5, i + 0.5), same as GDAL's pixel-is-area model.
"""

from __future__ import annotations

import numpy as np

__all__ = ["contour_segments", "stitch_polylines", "contour_lines"]


def contour_segments(arr: np.ndarray, level: float):
    """All marching-squares segments of one level, vectorized over cells.

    Returns (N, 4) array of (x0, y0, x1, y1) in pixel-center coordinates.
    """
    a = arr.astype(np.float64)
    tl = a[:-1, :-1]
    tr = a[:-1, 1:]
    bl = a[1:, :-1]
    br = a[1:, 1:]
    # case index: bit set when corner >= level (GDAL's >= convention)
    idx = (
        (tl >= level).astype(np.int8)
        | ((tr >= level).astype(np.int8) << 1)
        | ((br >= level).astype(np.int8) << 2)
        | ((bl >= level).astype(np.int8) << 3)
    )
    ys, xs = np.nonzero((idx > 0) & (idx < 15))
    if ys.size == 0:
        return np.empty((0, 4))
    segs = []

    def interp(v0, v1):
        d = v1 - v0
        t = np.where(d != 0, (level - v0) / np.where(d == 0, 1, d), 0.5)
        return np.clip(t, 0.0, 1.0)

    ctl = tl[ys, xs]
    ctr = tr[ys, xs]
    cbl = bl[ys, xs]
    cbr = br[ys, xs]
    cx = xs + 0.5
    cy = ys + 0.5
    # edge crossing points (pixel-center space)
    top = np.stack([cx + interp(ctl, ctr), cy + 0 * cx], axis=1)
    bottom = np.stack([cx + interp(cbl, cbr), cy + 1 + 0 * cx], axis=1)
    left = np.stack([cx + 0 * cx, cy + interp(ctl, cbl)], axis=1)
    right = np.stack([cx + 1 + 0 * cx, cy + interp(ctr, cbr)], axis=1)
    ci = idx[ys, xs]
    # lookup: per case, list of (edgeA, edgeB) pairs; edges: 0=top 1=right
    # 2=bottom 3=left; ambiguous saddles (5, 10) resolved by center mean
    edges = {0: top, 1: right, 2: bottom, 3: left}
    TABLE = {
        1: [(3, 0)],
        2: [(0, 1)],
        3: [(3, 1)],
        4: [(1, 2)],
        6: [(0, 2)],
        7: [(3, 2)],
        8: [(2, 3)],
        9: [(2, 0)],
        11: [(2, 1)],
        12: [(1, 3)],
        13: [(1, 0)],
        14: [(0, 3)],
    }
    center = (ctl + ctr + cbl + cbr) / 4.0
    for case in np.unique(ci):
        sel = ci == case
        if case in (5, 10):
            hi = center[sel] >= level
            pairs_hi = [(3, 0), (1, 2)] if case == 5 else [(0, 1), (2, 3)]
            pairs_lo = [(3, 2), (1, 0)] if case == 5 else [(0, 3), (2, 1)]
            for flag, pairs in ((hi, pairs_hi), (~hi, pairs_lo)):
                ss = np.flatnonzero(sel)[flag]
                for ea, eb in pairs:
                    segs.append(
                        np.concatenate([edges[ea][ss], edges[eb][ss]], axis=1)
                    )
        else:
            ss = np.flatnonzero(sel)
            for ea, eb in TABLE[int(case)]:
                segs.append(np.concatenate([edges[ea][ss], edges[eb][ss]], axis=1))
    return np.concatenate(segs, axis=0) if segs else np.empty((0, 4))


def stitch_polylines(segs: np.ndarray, tol: float = 1e-9):
    """Greedy endpoint-matching of segments into polylines."""
    if len(segs) == 0:
        return []
    key = lambda p: (round(p[0] / tol) if tol else p[0], round(p[1] / tol))
    from collections import defaultdict

    adj = defaultdict(list)
    for i, s in enumerate(segs):
        adj[key(s[:2])].append((i, 0))
        adj[key(s[2:])].append((i, 1))
    used = np.zeros(len(segs), dtype=bool)
    lines = []
    for start in range(len(segs)):
        if used[start]:
            continue
        used[start] = True
        line = [segs[start][:2].tolist(), segs[start][2:].tolist()]
        # extend forward then backward
        for endsel in (1, 0):
            while True:
                p = line[-1] if endsel == 1 else line[0]
                nxt = None
                for j, side in adj[key(np.asarray(p))]:
                    if not used[j]:
                        nxt = (j, side)
                        break
                if nxt is None:
                    break
                j, side = nxt
                used[j] = True
                other = segs[j][2:] if side == 0 else segs[j][:2]
                if endsel == 1:
                    line.append(other.tolist())
                else:
                    line.insert(0, other.tolist())
        lines.append(np.asarray(line))
    return lines


def contour_lines(arr: np.ndarray, levels, gt=(0.0, 1.0, 0.0, 0.0, 0.0, 1.0)):
    """Per-level polylines in geo coordinates."""
    from gdal_ray.geo.affine import apply_geotransform

    out = []
    for level in levels:
        segs = contour_segments(arr, level)
        for line in stitch_polylines(segs):
            gx, gy = apply_geotransform(gt, line[:, 0], line[:, 1])
            out.append({"level": float(level), "coords": np.stack([gx, gy], axis=1)})
    return out
