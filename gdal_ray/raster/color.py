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
