"""Color-table operations: median-cut palette + dithering.

Reference parity targets: ``alg/gdalmediancut.cpp`` (GDALComputeMedianCutPCT
— Heckbert median-cut over a 5-bit-per-channel RGB histogram) and
``alg/gdaldither.cpp`` (GDALDitherRGB2PCT — Floyd-Steinberg error diffusion
onto the palette, with a cached nearest-color cube).

Engine shape: both are per-image kernels for an actor-pool ``map_batches``
stage (palette fit + dither per image, or a corpus-level palette fitted on
a sample then broadcast). The nearest-color cube (5 bits/channel, 32^3
entries — the same resolution the reference uses) makes Floyd-Steinberg's
inherently sequential inner loop O(1) per pixel; the ordered (Bayer 8x8)
variant is fully vectorized for throughput-bound paths.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "median_cut_palette",
    "nearest_color_cube",
    "dither_ordered",
    "dither_floyd_steinberg",
    "quantize_image",
    "color_relief",
    "parse_color_ramp",
]


def median_cut_palette(img: np.ndarray, n_colors: int = 256) -> np.ndarray:
    """Heckbert median cut over the 5-bit RGB histogram
    (GDALComputeMedianCutPCT, alg/gdalmediancut.cpp): boxes split at the
    median of their longest (histogram-weighted) axis until ``n_colors``
    boxes exist; palette entry = the box's weighted mean color.

    ``img``: (h, w, 3) uint8. Returns (n, 3) uint8 palette, n <= n_colors.
    """
    px = img.reshape(-1, 3).astype(np.int64)
    # 5-bit histogram cube, exactly the reference's quantization
    q = px >> 3
    key = (q[:, 0] << 10) | (q[:, 1] << 5) | q[:, 2]
    uniq, counts = np.unique(key, return_counts=True)
    cols = np.stack([(uniq >> 10) & 31, (uniq >> 5) & 31, uniq & 31], axis=1)
    boxes = [(cols, counts)]
    while len(boxes) < n_colors:
        # split the box with the largest weighted extent along its longest axis
        best, best_span, best_axis = -1, -1, 0
        for i, (c, w) in enumerate(boxes):
            if len(c) < 2:
                continue
            spans = c.max(axis=0) - c.min(axis=0)
            ax = int(np.argmax(spans))
            if int(spans[ax]) > best_span:
                best, best_span, best_axis = i, int(spans[ax]), ax
        if best < 0 or best_span == 0:
            break
        c, w = boxes.pop(best)
        order = np.argsort(c[:, best_axis], kind="stable")
        c, w = c[order], w[order]
        half = w.sum() / 2.0
        cut = int(np.searchsorted(np.cumsum(w), half)) + 1
        cut = min(max(cut, 1), len(c) - 1)
        boxes.append((c[:cut], w[:cut]))
        boxes.append((c[cut:], w[cut:]))
    pal = np.empty((len(boxes), 3), dtype=np.uint8)
    for i, (c, w) in enumerate(boxes):
        mean5 = (c * w[:, None]).sum(axis=0) / w.sum()
        # back to 8-bit at the histogram cell center (<<3 | 4), like the
        # reference's bin-center reconstruction
        pal[i] = np.clip(np.round(mean5 * 8.0 + 4.0), 0, 255).astype(np.uint8)
    return pal


def nearest_color_cube(palette: np.ndarray) -> np.ndarray:
    """(32, 32, 32) int32 cube mapping 5-bit RGB to the nearest palette
    index (the cache GDALDitherRGB2PCT builds incrementally)."""
    g = (np.arange(32) << 3) + 4
    rr, gg, bb = np.meshgrid(g, g, g, indexing="ij")
    pts = np.stack([rr, gg, bb], axis=-1).reshape(-1, 3).astype(np.int64)
    pal = palette.astype(np.int64)
    d2 = ((pts[:, None, :] - pal[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1).astype(np.int32).reshape(32, 32, 32)


def dither_ordered(img: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Ordered (Bayer 8x8) dithering — fully vectorized alternative to
    error diffusion for throughput-bound stages. Returns (h, w) indexes."""
    bayer = np.array(
        [
            [0, 32, 8, 40, 2, 34, 10, 42],
            [48, 16, 56, 24, 50, 18, 58, 26],
            [12, 44, 4, 36, 14, 46, 6, 38],
            [60, 28, 52, 20, 62, 30, 54, 22],
            [3, 35, 11, 43, 1, 33, 9, 41],
            [51, 19, 59, 27, 49, 17, 57, 25],
            [15, 47, 7, 39, 13, 45, 5, 37],
            [63, 31, 55, 23, 61, 29, 53, 21],
        ],
        dtype=np.float64,
    )
    h, w = img.shape[:2]
    t = (bayer[np.arange(h)[:, None] % 8, np.arange(w)[None, :] % 8] / 64.0 - 0.5) * 16.0
    adj = np.clip(img.astype(np.float64) + t[..., None], 0, 255)
    cube = nearest_color_cube(palette)
    q = (adj.astype(np.int64) >> 3)
    return cube[q[..., 0], q[..., 1], q[..., 2]]


def dither_floyd_steinberg(img: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Floyd-Steinberg error diffusion (GDALDitherRGB2PCT,
    alg/gdaldither.cpp): errors propagate 7/16 right, 3/16 down-left,
    5/16 down, 1/16 down-right; nearest color via the 5-bit cube.
    Returns (h, w) int32 palette indexes."""
    h, w = img.shape[:2]
    cube = nearest_color_cube(palette)
    pal = palette.astype(np.float64)
    cur = img[0].astype(np.float64).copy()
    nxt = np.zeros((w, 3), dtype=np.float64)
    out = np.empty((h, w), dtype=np.int32)
    for y in range(h):
        err_right = np.zeros(3)
        row_out = out[y]
        for x in range(w):
            v = np.clip(cur[x] + err_right, 0.0, 255.0)
            q = (v.astype(np.int64) >> 3)
            idx = int(cube[q[0], q[1], q[2]])
            row_out[x] = idx
            err = v - pal[idx]
            err_right = err * (7.0 / 16.0)
            if x > 0:
                nxt[x - 1] += err * (3.0 / 16.0)
            nxt[x] += err * (5.0 / 16.0)
            if x + 1 < w:
                nxt[x + 1] += err * (1.0 / 16.0)
        if y + 1 < h:
            cur = img[y + 1].astype(np.float64) + nxt
            nxt = np.zeros((w, 3), dtype=np.float64)
    return out


def quantize_image(img: np.ndarray, n_colors: int = 256, method: str = "fs"):
    """Palette + indexed image in one call (gdal_translate -of ... -co
    PALETTE shape). Returns (palette (n,3) uint8, indexes (h,w) int32)."""
    pal = median_cut_palette(img, n_colors)
    if method == "fs":
        return pal, dither_floyd_steinberg(img, pal)
    if method == "ordered":
        return pal, dither_ordered(img, pal)
    if method == "nearest":
        cube = nearest_color_cube(pal)
        q = img.astype(np.int64) >> 3
        return pal, cube[q[..., 0], q[..., 1], q[..., 2]]
    raise ValueError(f"unknown dither method {method!r}")


def parse_color_ramp(text: str, src_min: float | None = None,
                     src_max: float | None = None,
                     nodata: float | None = None) -> list:
    """gdaldem color-relief color-file parser
    (``apps/gdaldem_lib.cpp`` GDALColorReliefParseColorFile): one entry
    per line, ``<elev> <r> <g> <b> [a]``; elevation may be a ``N%``
    percentage of the band range (needs ``src_min``/``src_max``) and the
    keyword ``nv`` maps to the band's nodata value (entry dropped when no
    nodata is given). Returns [(value, r, g, b, a), ...] sorted by value."""
    ramp = []
    for line in text.splitlines():
        line = line.split("#")[0].strip().replace(",", " ")
        if not line:
            continue
        parts = line.split()
        key = parts[0].lower()
        if key == "nv":
            if nodata is None:
                continue
            val = float(nodata)
        elif key.endswith("%"):
            if src_min is None or src_max is None:
                raise ValueError("percentage ramp entry needs src_min/src_max")
            val = src_min + float(key[:-1]) / 100.0 * (src_max - src_min)
        else:
            val = float(key)
        rgba = [int(p) for p in parts[1:5]]
        while len(rgba) < 4:
            rgba.append(255)
        ramp.append((val, *rgba))
    ramp.sort(key=lambda e: e[0])
    return ramp


def color_relief(arr: np.ndarray, ramp, mode: str = "interpolate"):
    """gdaldem color-relief (``apps/gdaldem_lib.cpp``
    GDALColorReliefGetRGBA): map each pixel through a sorted
    value->RGBA ramp. Returns (h, w, 4) uint8.

    ``mode``: ``interpolate`` (default; linear blend between the two
    bracketing entries, channel = clamp(trunc(0.5 + lo + ratio*(hi-lo)))
    exactly like the reference's LinearInterpolation), ``exact`` (only
    pixels equal to a ramp value get its color, everything else
    transparent black — COLOR_SELECTION_EXACT_ENTRY), ``nearest``
    (closer bracketing entry wins, ties to the upper —
    COLOR_SELECTION_NEAREST_ENTRY). Values outside the ramp clamp to the
    end colors. A leading NaN ramp entry colors NaN pixels (the
    reference's nv-from-nodata path for float rasters); with no NaN
    entry, NaN pixels take the last entry (searchsorted sends NaN past
    the end, matching the reference's unchecked binary search)."""
    ramp = [tuple(e) if len(e) == 5 else (*e, 255) for e in ramp]
    nan_color = None
    if ramp and np.isnan(ramp[0][0]):
        nan_color = np.array(ramp[0][1:], dtype=np.uint8)
        ramp = ramp[1:]
    if not ramp:
        raise ValueError("empty color ramp")
    vals = np.array([e[0] for e in ramp], dtype=np.float64)
    if not np.all(np.diff(vals) > 0):
        raise ValueError("ramp values must be strictly increasing")
    colors = np.array([e[1:] for e in ramp], dtype=np.float64)  # (n, 4)
    n = len(vals)

    v = arr.astype(np.float64).ravel()
    nan_mask = np.isnan(v)
    i = np.searchsorted(vals, v, side="left")  # first vals[i] >= v
    lo = np.clip(i - 1, 0, n - 1)
    hi = np.clip(i, 0, n - 1)
    exact = (i < n) & (vals[hi] == v)
    below = i == 0
    above = i == n

    out = np.empty((v.size, 4), dtype=np.float64)
    if mode == "exact":
        out[:] = 0.0
        out[exact] = colors[hi[exact]]
    elif mode == "nearest":
        d_lo = v - vals[lo]
        d_hi = vals[hi] - v
        pick_hi = above | exact | (~below & (d_hi <= d_lo))
        idx = np.where(pick_hi, hi, lo)
        idx[below] = 0
        out[:] = colors[idx]
    elif mode == "interpolate":
        out[:] = colors[np.where(above, n - 1, hi)]
        mid = ~(below | above | exact | nan_mask)
        if mid.any():
            ratio = (v[mid] - vals[lo[mid]]) / (vals[hi[mid]] - vals[lo[mid]])
            c0 = colors[lo[mid]]
            c1 = colors[hi[mid]]
            # trunc(0.5 + x) then clamp — the reference's static_cast<int>
            out[mid] = np.clip(np.trunc(0.5 + c0 + ratio[:, None] * (c1 - c0)),
                               0.0, 255.0)
    else:
        raise ValueError(f"unknown color-relief mode {mode!r}")
    if nan_color is not None:
        out[nan_mask] = nan_color
    elif mode == "exact":
        out[nan_mask] = 0.0
    else:
        out[nan_mask] = colors[n - 1]
    return out.reshape(*arr.shape, 4).astype(np.uint8)
