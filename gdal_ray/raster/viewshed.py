"""Viewshed (observer line-of-sight visibility mask).

The reference computes viewsheds with Wang et al.'s plane-sweep
(``alg/viewshed/viewshed.cpp:373``). This kernel keeps the defining
semantics — a cell is visible iff the vertical angle from the observer to
the cell's TOP (elevation + target height) is not below the maximum
terrain angle of the cells along the line of sight — with a per-cell
Bresenham ray walk (O(n) per cell, exact; the reference's sweep is the
O(1)-amortized form of the same test).
"""

from __future__ import annotations

import numpy as np

__all__ = ["viewshed"]


def viewshed(dem: np.ndarray, oy: int, ox: int, observer_height: float = 2.0,
             target_height: float = 0.0, max_dist: float | None = None) -> np.ndarray:
    """Boolean visibility mask from observer cell (oy, ox).

    Angles use cell-center distances in pixel units; the observer cell is
    always visible. ``max_dist`` limits the radius (pixels).
    """
    dem = np.asarray(dem, dtype=np.float64)
    h, w = dem.shape
    oz = dem[oy, ox] + observer_height
    out = np.zeros((h, w), dtype=bool)
    out[oy, ox] = True
    md2 = None if max_dist is None else float(max_dist) ** 2
    for ty in range(h):
        for tx in range(w):
            if (ty, tx) == (oy, ox):
                continue
            dy = ty - oy
            dx = tx - ox
            d2 = dx * dx + dy * dy
            if md2 is not None and d2 > md2:
                continue
            dist = np.sqrt(d2)
            tangle = (dem[ty, tx] + target_height - oz) / dist
            # walk the ray strictly between observer and target
            n = int(max(abs(dx), abs(dy)))
            blocked = False
            for k in range(1, n):
                t = k / n
                iy = oy + dy * t
                ix = ox + dx * t
                ry = int(round(iy))
                rx = int(round(ix))
                if (ry, rx) == (ty, tx) or (ry, rx) == (oy, ox):
                    continue
                dd = np.hypot(rx - ox, ry - oy)
                if dd == 0:
                    continue
                if (dem[ry, rx] - oz) / dd > tangle + 1e-12:
                    blocked = True
                    break
            out[ty, tx] = not blocked
    return out
