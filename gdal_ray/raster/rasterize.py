"""Polygon rasterization (vector -> raster burn).

Scanline fill reimplements ``GDALdllImageFilledPolygon``
(reference ``alg/llrasterize.cpp:58-225``) semantics:

- scanline sample point is the pixel center ``dy = y + 0.5``;
- y bounds: ``int(dminy)`` .. ``int(dmaxy)`` clamped to the raster;
- a segment contributes iff ``dy1 <= dy < dy2`` (after orienting dy1<dy2);
  intersection x is ``(dy-dy1)*(dx2-dx1)/(dy2-dy1)+dx1`` snapped with
  ``floor(x+0.5)``;
- sorted intersections are filled in even-odd pairs ``[x_i, x_{i+1}-1]`` —
  holes come free from the even-odd rule when hole rings are passed as
  additional parts;
- bottom horizontal segments (where x[ind1] > x[ind2]) are filled
  separately; top horizontal segments are skipped.

Merge semantics mirror ``MERGE_ALG=REPLACE|ADD``
(reference ``alg/gdalrasterize.cpp:781-817``).
"""

from __future__ import annotations

import numpy as np

from gdal_ray.geo import affine as _affine
from gdal_ray.geo import wkb as _wkb

__all__ = ["rasterize_polygon_px", "rasterize_wkb"]


def _fill_scanlines(out, parts, burn_value, merge_add, touched):
    h, w = out.shape
    all_y = np.concatenate([p[:, 1] for p in parts])
    miny = int(all_y.min())
    maxy = int(all_y.max())
    miny = max(miny, 0)
    maxy = min(maxy, h - 1)
    maxx = w - 1

    # build the segment list once: (y1, y2, x1, x2) oriented y1<y2, plus
    # horizontal bottom segments kept separately
    seg_y1, seg_y2, seg_x1, seg_x2 = [], [], [], []
    horiz = []  # (y_exact, xlo_px, xhi_px) pixel-snapped
    for ring in parts:
        n = ring.shape[0]
        for i in range(n):
            ind1 = i - 1 if i > 0 else n - 1
            x_a, y_a = ring[ind1]
            x_b, y_b = ring[i]
            if y_a == y_b:
                # GDAL fills bottom horizontal segments (x[ind1] > x[ind2])
                # only on the scanline whose center equals the segment's y
                # exactly (llrasterize.cpp:141-180 — the non-horizontal
                # branch `continue`s whenever both endpoints are strictly
                # above or below dy, so dy must equal y_a). Top horizontals
                # are always skipped.
                if x_a > x_b:
                    h1 = int(np.floor(x_b + 0.5))
                    h2 = int(np.floor(x_a + 0.5))
                    horiz.append((y_a, h1, h2))
                continue
            if y_a < y_b:
                seg_y1.append(y_a); seg_y2.append(y_b); seg_x1.append(x_a); seg_x2.append(x_b)
            else:
                seg_y1.append(y_b); seg_y2.append(y_a); seg_x1.append(x_b); seg_x2.append(x_a)
    if seg_y1:
        sy1 = np.asarray(seg_y1); sy2 = np.asarray(seg_y2)
        sx1 = np.asarray(seg_x1); sx2 = np.asarray(seg_x2)
    else:
        sy1 = sy2 = sx1 = sx2 = np.empty(0)

    for y in range(miny, maxy + 1):
        dy = y + 0.5
        mask = (dy >= sy1) & (dy < sy2)
        if mask.any():
            inter = (dy - sy1[mask]) * (sx2[mask] - sx1[mask]) / (sy2[mask] - sy1[mask]) + sx1[mask]
            xs = np.sort(np.floor(inter + 0.5).astype(np.int64))
            for i in range(0, len(xs) - 1, 2):
                lo, hi = xs[i], xs[i + 1] - 1
                if lo <= maxx and hi >= 0:
                    lo = max(lo, 0)
                    hi = min(hi, maxx)
                    if hi >= lo:
                        if merge_add:
                            sel = slice(lo, hi + 1)
                            if touched is not None:
                                fresh = ~touched[y, sel]
                                out[y, sel][fresh] += burn_value if np.isscalar(burn_value) else burn_value
                                touched[y, sel] |= True
                            else:
                                out[y, sel] += burn_value
                        else:
                            out[y, lo : hi + 1] = burn_value
        # bottom horizontal segments whose y coincides with this scanline center
        for hy, h1, h2 in horiz:
            if hy != dy:
                continue
            lo, hi = h1, h2 - 1
            if lo <= maxx and hi >= 0:
                lo = max(lo, 0)
                hi = min(hi, maxx)
                if hi >= lo:
                    if merge_add:
                        out[y, lo : hi + 1] += burn_value
                    else:
                        out[y, lo : hi + 1] = burn_value


def rasterize_polygon_px(out, rings_px, burn_value, merge_alg="replace"):
    """Burn one polygon (rings in pixel coords, outer first) into ``out``.

    ``out`` is modified in place. rings_px: list of (M,2) arrays of
    (x, y) pixel coordinates (closed or open — the segment loop closes).
    """
    parts = []
    for r in rings_px:
        r = np.asarray(r, dtype=np.float64)
        if r.shape[0] >= 2 and (r[0] == r[-1]).all():
            r = r[:-1]  # segment loop already closes ring
        parts.append(r)
    _fill_scanlines(out, parts, burn_value, merge_alg == "add", None)
    return out


def rasterize_wkb(out, wkb_blob, gt, burn_value, merge_alg="replace"):
    """Burn a WKB (Multi)Polygon given the raster's geotransform ``gt``.

    Geo coords are mapped to pixel space with the inverse geotransform
    (``GDALInvGeoTransform`` path), matching gdal_rasterize's
    geometry-to-pixel setup (``alg/gdalrasterize.cpp:861+``).
    """
    inv = _affine.invert_geotransform(gt)
    if inv is None:
        raise ValueError("singular geotransform")
    for rings in _wkb.decode_polygons(wkb_blob):
        px_rings = []
        for ring in rings:
            px, py = _affine.apply_geotransform(inv, ring[:, 0], ring[:, 1])
            px_rings.append(np.stack([px, py], axis=1))
        rasterize_polygon_px(out, px_rings, burn_value, merge_alg)
    return out
