"""Per-image raster kernels (vectorized numpy), GDAL-faithful semantics.

Each function operates on one 2-D (or 3-D HWC) array; pipelines apply them
inside `map_batches` over image rows — the distributed form of GDAL's
per-band algorithms. Citations per function.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "translate_window",
    "rescale_linear",
    "cast_clip",
    "resample_nearest",
    "resample_bilinear",
    "resample_average",
    "resample_nearest_factor",
    "resample_rms",
    "resample_gauss",
    "reclassify",
    "hillshade",
    "hillshade_multidirectional",
    "hillshade_combined",
    "hillshade_igor",
    "slope_horn",
    "aspect",
    "tri",
    "tpi",
    "roughness",
    "proximity",
    "sieve",
    "fillnodata",
    "histogram",
    "mosaic_arrays",
    "PIXEL_FUNCTIONS",
]

_RAD2DEG = 180.0 / np.pi


def translate_window(img, x0, y0, w, h):
    """Window subset (gdal_translate -srcwin, apps/gdal_translate_lib.cpp:591)."""
    return img[y0 : y0 + h, x0 : x0 + w]


def rescale_linear(img, scale, offset, out_dtype=np.uint8):
    """a*x+b rescale with clamp to the output dtype range
    (gdal_translate -scale / -a_scale -a_offset semantics)."""
    out = img.astype(np.float64) * scale + offset
    info = np.iinfo(out_dtype) if np.issubdtype(out_dtype, np.integer) else None
    if info is not None:
        out = np.clip(np.floor(out + 0.5), info.min, info.max)
    return out.astype(out_dtype)


def cast_clip(img, out_dtype):
    """Type conversion with GDALCopyWords clamping (+0.5 floor for int)."""
    if np.issubdtype(out_dtype, np.integer):
        info = np.iinfo(out_dtype)
        return np.clip(np.floor(img.astype(np.float64) + 0.5), info.min, info.max).astype(out_dtype)
    return img.astype(out_dtype)


def _sample_grid(h_out, w_out, h_in, w_in):
    ys = (np.arange(h_out) + 0.5) * (h_in / h_out)
    xs = (np.arange(w_out) + 0.5) * (w_in / w_out)
    return ys, xs


def resample_nearest(img, h_out, w_out):
    """GRIORA_NearestNeighbour decimation/zoom (pixel-center rule)."""
    h_in, w_in = img.shape[:2]
    ys, xs = _sample_grid(h_out, w_out, h_in, w_in)
    iy = np.minimum(ys.astype(np.int64), h_in - 1)
    ix = np.minimum(xs.astype(np.int64), w_in - 1)
    return img[np.ix_(iy, ix)]


def resample_bilinear(img, h_out, w_out, compute_dtype=np.float64):
    """GRIORA_Bilinear.

    ``compute_dtype=np.float32`` halves the intermediate memory traffic;
    it is BIT-IDENTICAL to the float64 path whenever the scale factors are
    exact powers of two and the input is an integer type of <= 16 bits:
    the fractional weights are then dyadic (exactly representable) and
    every product/sum stays within float32's 24-bit mantissa. Callers
    (pansharpen) gate the fast path on exactly that condition."""
    h_in, w_in = img.shape[:2]
    ys, xs = _sample_grid(h_out, w_out, h_in, w_in)
    fy = np.clip(ys - 0.5, 0, h_in - 1)
    fx = np.clip(xs - 0.5, 0, w_in - 1)
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    y1 = np.minimum(y0 + 1, h_in - 1)
    x1 = np.minimum(x0 + 1, w_in - 1)
    wy = (fy - y0)[:, None].astype(compute_dtype)
    wx = (fx - x0)[None, :].astype(compute_dtype)
    if img.ndim == 3:
        wy = wy[..., None]
        wx = wx[..., None]
    f = img.astype(compute_dtype)
    top = f[np.ix_(y0, x0)] * (1 - wx) + f[np.ix_(y0, x1)] * wx
    bot = f[np.ix_(y1, x0)] * (1 - wx) + f[np.ix_(y1, x1)] * wx
    out = top * (1 - wy) + bot * wy
    return cast_clip(out, img.dtype) if np.issubdtype(img.dtype, np.integer) else out


def interpolate_at_point_bilinear(band: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Bilinear read at fractional pixel coordinates (gdallocationinfo -r
    bilinear; reference ``alg/gdal_interpolateatpoint.h:37`` /
    ``gdal_interpolateatpoint.cpp`` GDALInterpolateAtPoint): values sit at
    pixel CENTERS, coordinates are clamped to the valid center range at the
    edges (degrading to the edge value), weights are the fractional offsets
    — the same convention ``resample_bilinear`` uses on whole grids."""
    h, w = band.shape[:2]
    fx = np.clip(px - 0.5, 0, w - 1)
    fy = np.clip(py - 0.5, 0, h - 1)
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = fx - x0
    wy = fy - y0
    f = band.astype(np.float64)
    top = f[y0, x0] * (1 - wx) + f[y0, x1] * wx
    bot = f[y1, x0] * (1 - wx) + f[y1, x1] * wx
    return top * (1 - wy) + bot * wy


def interpolate_at_point_cubic(band: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Cubic-convolution read at fractional pixel coordinates
    (gdallocationinfo -r cubic; reference ``alg/gdal_interpolateatpoint.h:37``
    lists near/bilinear/cubic): Keys a=-0.5 kernel (``_cubic_weight``) on a
    4x4 tap window, pixel-center convention with the same edge clamping as
    the bilinear arm (coordinates clipped to the center range, tap indices
    clipped to the band). The kernel weights sum to exactly 1 at any
    fractional offset, so no normalization is needed."""
    h, w = band.shape[:2]
    fx = np.clip(px - 0.5, 0, w - 1)
    fy = np.clip(py - 0.5, 0, h - 1)
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    wx = fx - x0
    wy = fy - y0
    f = band.astype(np.float64)
    acc = np.zeros_like(fx, dtype=np.float64)
    for dy in range(-1, 3):
        wyv = _cubic_weight(wy - dy)
        iy = np.clip(y0 + dy, 0, h - 1)
        row = np.zeros_like(fx, dtype=np.float64)
        for dx in range(-1, 3):
            wxv = _cubic_weight(wx - dx)
            ix = np.clip(x0 + dx, 0, w - 1)
            row = row + wxv * f[iy, ix]
        acc = acc + wyv * row
    return acc


def _bspline_weight(t):
    """Cubic B-spline kernel (alg/gdalresamplingkernels.h:45
    CubicSplineKernel): (1/6)[(t+2)^3_+ - 4(t+1)^3_+ + 6 t^3_+ - 4(t-1)^3_+],
    the one-sided-cube form; symmetric, support |t| < 2, partition of unity."""
    a = np.where(t + 2.0 > 0.0, (t + 2.0) ** 3, 0.0)
    b = np.where(t + 1.0 > 0.0, (t + 1.0) ** 3, 0.0)
    c = np.where(t > 0.0, t**3, 0.0)
    d = np.where(t - 1.0 > 0.0, (t - 1.0) ** 3, 0.0)
    return np.where(t > 2.0, 0.0, (a - 4.0 * b + 6.0 * c - 4.0 * d) / 6.0)


def interpolate_at_point_cubicspline(band: np.ndarray, px: np.ndarray,
                                     py: np.ndarray) -> np.ndarray:
    """Cubic B-spline read at fractional pixel coordinates
    (gdallocationinfo -r cubicspline; GRIORA_CubicSpline in
    ``alg/gdal_interpolateatpoint.cpp:315-321`` — same 4x4 tap loop as the
    cubic arm but with CubicSplineKernel weights, normalized by the weight
    sum exactly as the reference's dfSumH/dfSumWeight). A smoothing
    (approximating, not interpolating) spline: it does NOT reproduce the
    sample values at integer offsets."""
    h, w = band.shape[:2]
    fx = np.clip(px - 0.5, 0, w - 1)
    fy = np.clip(py - 0.5, 0, h - 1)
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    wx = fx - x0
    wy = fy - y0
    f = band.astype(np.float64)
    acc = np.zeros_like(fx, dtype=np.float64)
    wsum = np.zeros_like(fx, dtype=np.float64)
    for dy in range(-1, 3):
        wyv = _bspline_weight(wy - dy)
        iy = np.clip(y0 + dy, 0, h - 1)
        for dx in range(-1, 3):
            wv = wyv * _bspline_weight(wx - dx)
            ix = np.clip(x0 + dx, 0, w - 1)
            acc = acc + wv * f[iy, ix]
            wsum = wsum + wv
    return acc / wsum


def resample_average(img, factor):
    """Integer-factor box average (overview AVERAGE kernel,
    gcore/overview.cpp:1144 on exact-factor grids)."""
    h, w = img.shape[:2]
    h2, w2 = h // factor, w // factor
    img = img[: h2 * factor, : w2 * factor]
    if img.ndim == 3:
        c = img.shape[2]
        s = img.reshape(h2, factor, w2, factor, c).astype(np.float64).mean(axis=(1, 3))
    else:
        s = img.reshape(h2, factor, w2, factor).astype(np.float64).mean(axis=(1, 3))
    return cast_clip(s, img.dtype) if np.issubdtype(img.dtype, np.integer) else s


def resample_nearest_factor(img, factor):
    """Integer-factor NEAREST decimation (overview NEAREST kernel:
    src offset trunc(0.5 + i*factor) = the block's top-left sample)."""
    h, w = img.shape[:2]
    h2, w2 = h // factor, w // factor
    return img[: h2 * factor : factor, : w2 * factor : factor].copy()


def resample_rms(img, factor):
    """Integer-factor RMS (quadratic mean) decimation
    (gcore/overview.cpp GDALResampleChunk_ConvolutionT RMS /
    ComputeIntegerRMS at :289): float data takes sqrt(mean(v^2));
    integer data returns the integer r minimizing |r^2 - mean(v^2)|
    (r+1 wins when 2r(r+1)+1 < 2*mean)."""
    h, w = img.shape[:2]
    h2, w2 = h // factor, w // factor
    img2 = img[: h2 * factor, : w2 * factor]
    if img.ndim == 3:
        out = np.empty((h2, w2, img.shape[2]), dtype=img.dtype)
        for c in range(img.shape[2]):
            out[:, :, c] = resample_rms(img2[:, :, c], factor)
        return out
    sq = img2.astype(np.float64) ** 2
    mean_sq = sq.reshape(h2, factor, w2, factor).mean(axis=(1, 3))
    if np.issubdtype(img.dtype, np.floating):
        return np.sqrt(mean_sq).astype(img.dtype)
    r = np.floor(np.sqrt(mean_sq))
    r = np.where(2.0 * r * (r + 1.0) + 1.0 < 2.0 * mean_sq, r + 1.0, r)
    return r.astype(img.dtype)


_GAUSS_KERNELS = {
    3: np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype=np.float64),
    5: np.array([[1, 4, 6, 4, 1], [4, 16, 24, 16, 4], [6, 24, 36, 24, 6],
                 [4, 16, 24, 16, 4], [1, 4, 6, 4, 1]], dtype=np.float64),
    7: np.array([[1, 6, 15, 20, 15, 6, 1]], dtype=np.float64).T
       @ np.array([[1, 6, 15, 20, 15, 6, 1]], dtype=np.float64) / 1.0,
}


def resample_gauss(img, factor=2):
    """Integer-factor GAUSS decimation (gcore/overview.cpp
    GDALResampleChunk_Gauss:1824): binomial matrix 3x3 for factor<=2,
    5x5 for <=4, 7x7 beyond; window starts at
    factor*i + (factor+1)//2 - dim//2, truncated at the image edges with
    the weight sum renormalized over the surviving taps."""
    h, w = img.shape[:2]
    if img.ndim == 3:
        h2, w2 = h // factor, w // factor
        out = np.empty((h2, w2, img.shape[2]), dtype=img.dtype)
        for c in range(img.shape[2]):
            out[:, :, c] = resample_gauss(img[:, :, c], factor)
        return out
    dim = 3 if factor <= 2 else (5 if factor <= 4 else 7)
    ker = _GAUSS_KERNELS[dim]
    h2, w2 = h // factor, w // factor
    base = (factor + 1) // 2 - dim // 2
    ys0 = factor * np.arange(h2) + base
    xs0 = factor * np.arange(w2) + base
    num = np.zeros((h2, w2), dtype=np.float64)
    den = np.zeros((h2, w2), dtype=np.float64)
    f = img.astype(np.float64)
    for dy in range(dim):
        ys = ys0 + dy
        my = (ys >= 0) & (ys < h)
        if not my.any():
            continue
        for dx in range(dim):
            xs = xs0 + dx
            mx = (xs >= 0) & (xs < w)
            if not mx.any():
                continue
            sel = np.ix_(ys[my], xs[mx])
            idx = np.ix_(np.nonzero(my)[0], np.nonzero(mx)[0])
            num[idx] += ker[dy, dx] * f[sel]
            den[idx] += ker[dy, dx]
    out = num / den
    return cast_clip(out, img.dtype) if np.issubdtype(img.dtype, np.integer) else out.astype(img.dtype)


def reclassify(img, mapping: dict, default=None):
    """Value LUT remap (gdalalg_raster_reclassify semantics: unmapped values
    pass through unless a default is given)."""
    out = img.copy() if default is None else np.full_like(img, default)
    for src, dst in mapping.items():
        out[img == src] = dst
    return out


def _windows(dem):
    """Edge-clamped 3x3 shifted views w0..w8; row 0 = north (index [0,:])."""
    p = np.pad(dem.astype(np.float64), 1, mode="edge")
    return [p[y : y + dem.shape[0], x : x + dem.shape[1]] for y in (0, 1, 2) for x in (0, 1, 2)]


def _horn_xy(w, ewres, nsres, z=1.0, scale=1.0):
    x = z * ((w[0] + w[3] + w[3] + w[6]) - (w[2] + w[5] + w[5] + w[8])) / (8.0 * ewres * scale)
    y = z * ((w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])) / (8.0 * nsres * scale)
    return x, y


def hillshade(dem, ewres=1.0, nsres=-1.0, z=1.0, scale=1.0, az=315.0, alt=45.0):
    """Classic Horn hillshade (apps/gdaldem_lib.cpp:847-866 unoptimized
    formulas): cang = sin(alt)cos(slope)+cos(alt)sin(slope)cos(az-90°-aspect);
    output byte 1..255 (<=0 -> 1)."""
    w = _windows(dem)
    x, y = _horn_xy(w, ewres, nsres, z, scale)
    slope = np.arctan(np.sqrt(x * x + y * y))
    aspect_ = np.arctan2(y, x)
    azr = az * np.pi / 180.0
    altr = alt * np.pi / 180.0
    cang = np.sin(altr) * np.cos(slope) + np.cos(altr) * np.sin(slope) * np.cos(
        azr - np.pi / 2 - aspect_
    )
    out = np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang)
    return out.astype(np.uint8)


def _zt_xy(w, ewres, nsres, z=1.0, scale=1.0):
    """Zevenbergen-Thorne gradient (gdaldem_lib.cpp Gradient<ZT>::calc with
    z_factor = z/2): central differences over the 4-neighborhood."""
    x = z * (w[3] - w[5]) / (2.0 * ewres * scale)
    y = z * (w[7] - w[1]) / (2.0 * nsres * scale)
    return x, y


def hillshade_multidirectional(dem, ewres=1.0, nsres=-1.0, z=1.0, scale=1.0,
                               alt=45.0, alg="horn"):
    """Multidirectional hillshade (gdaldem -multidirectional;
    GDALHillshadeMultiDirectionalAlg, apps/gdaldem_lib.cpp:1238; USGS
    OF 92-422): sin^2-weighted blend of the 225/270/315/360-degree
    azimuth shades, each clamped at 0 before weighting; flat cells
    return the classic 1 + 254*sin(alt). Exact math (the reference's
    rsqrt is an SSE approximation of the same 1/sqrt(1+s))."""
    w = _windows(dem)
    grad = _horn_xy if alg == "horn" else _zt_xy
    x, y = grad(w, ewres, nsres, z, scale)
    altr = alt * np.pi / 180.0
    sin_alt = np.sin(altr)
    cos_alt = np.cos(altr)
    xx = x * x
    yy = y * y
    s = xx + yy
    c225 = np.cos(225.0 * np.pi / 180.0) * cos_alt
    val225 = np.maximum(0.0, sin_alt + (x - y) * c225) * 127.0
    val270 = np.maximum(0.0, sin_alt - x * cos_alt) * 127.0
    val315 = np.maximum(0.0, sin_alt + (x + y) * c225) * 127.0
    val360 = np.maximum(0.0, sin_alt - y * cos_alt) * 127.0
    w225 = 0.5 * s - x * y
    w315 = s - w225
    with np.errstate(invalid="ignore", divide="ignore"):
        cang127 = ((w225 * val225 + xx * val270 + w315 * val315
                    + yy * val360) / s) / np.sqrt(1.0 + s)
    out = np.where(s == 0.0, 1.0 + 254.0 * sin_alt, 1.0 + cang127)
    return out.astype(np.uint8)


def hillshade_combined(dem, ewres=1.0, nsres=-1.0, z=1.0, scale=1.0,
                       az=315.0, alt=45.0, alg="horn"):
    """Combined shading (gdaldem -combined; GDALHillshadeCombinedAlg,
    apps/gdaldem_lib.cpp:1139): cang = 1 - acos(classic_cang) *
    atan(sqrt(slope)) / (pi/2)^2, then the usual 1..255 byte ramp."""
    w = _windows(dem)
    grad = _horn_xy if alg == "horn" else _zt_xy
    x, y = grad(w, ewres, nsres, z, scale)
    altr = alt * np.pi / 180.0
    azr = az * np.pi / 180.0
    s = x * x + y * y
    num = (np.sin(altr)
           + (x * np.sin(azr) - y * np.cos(azr)) * np.cos(altr))
    cang = np.arccos(np.clip(num / np.sqrt(1.0 + s), -1.0, 1.0))
    cang = 1.0 - cang * np.arctan(np.sqrt(s)) / ((np.pi * np.pi) / 4.0)
    out = np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang)
    return out.astype(np.uint8)


def hillshade_igor(dem, ewres=1.0, nsres=-1.0, z=1.0, scale=1.0, az=315.0,
                   alg="horn"):
    """Igor shading (gdaldem -igor; GDALHillshadeIgorAlg,
    apps/gdaldem_lib.cpp:943): shadowness = 1 - (slope_deg/90) *
    aspectStrength, aspectStrength = 1 - |aspect - (3pi/2 - az)|/pi
    (angle difference normalized mod 2pi); output 255 * shadowness as
    float32 (no 1..255 ramp — the reference alg returns the raw float)."""
    w = _windows(dem)
    grad = _horn_xy if alg == "horn" else _zt_xy
    x, y = grad(w, ewres, nsres, z, scale)
    slope_deg = np.arctan(np.sqrt(x * x + y * y)) * _RAD2DEG
    if alg == "horn":
        dxa = (w[2] + w[5] + w[5] + w[8]) - (w[0] + w[3] + w[3] + w[6])
        dya = (w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])
    else:
        dxa = w[5] - w[3]
        dya = w[7] - w[1]
    aspect_ = np.arctan2(dya, -dxa)
    azr = az * np.pi / 180.0
    two_pi = 2.0 * np.pi
    a1 = np.mod(aspect_, two_pi)
    a2 = np.mod(np.pi * 1.5 - azr, two_pi)
    diff = np.abs(a1 - a2)
    diff = np.where(diff > np.pi, two_pi - diff, diff)
    aspect_strength = 1.0 - diff / np.pi
    shadowness = 1.0 - (slope_deg / 90.0) * aspect_strength
    return (255.0 * shadowness).astype(np.float32)


def slope_horn(dem, ewres=1.0, nsres=1.0, scale=1.0, percent=False):
    """Horn slope (apps/gdaldem_lib.cpp GDALSlopeHornAlg:1345)."""
    w = _windows(dem)
    dx = ((w[0] + w[3] + w[3] + w[6]) - (w[2] + w[5] + w[5] + w[8])) / (ewres * scale)
    dy = ((w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])) / (nsres * scale)
    key = dx * dx + dy * dy
    if percent:
        return (100.0 * np.sqrt(key) / 8.0).astype(np.float32)
    return (np.arctan(np.sqrt(key) / 8.0) * _RAD2DEG).astype(np.float32)


def aspect(dem, azimuth=True, nodata=-9999.0):
    """Aspect (apps/gdaldem_lib.cpp GDALAspectAlg:1415): flat -> nodata;
    azimuth convention 0..360 clockwise from north."""
    w = _windows(dem)
    dx = (w[2] + w[5] + w[5] + w[8]) - (w[0] + w[3] + w[3] + w[6])
    dy = (w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])
    a = (np.arctan2(dy, -dx) * _RAD2DEG).astype(np.float32)
    if azimuth:
        a = np.where(a > 90.0, 450.0 - a, 90.0 - a)
    else:
        a = np.where(a < 0, a + 360.0, a)
    a = np.where(a == 360.0, 0.0, a)
    return np.where((dx == 0) & (dy == 0), np.float32(nodata), a).astype(np.float32)


def tri(dem, variant="riley"):
    """Terrain Ruggedness Index (gdaldem_lib.cpp:2351-2378):
    riley = sqrt(sum (w_k - center)^2); wilson = mean |w_k - center|."""
    w = _windows(dem)
    c = w[4]
    diffs = [w[k] - c for k in (0, 1, 2, 3, 5, 6, 7, 8)]
    if variant == "wilson":
        return (sum(np.abs(d) for d in diffs) * 0.125).astype(np.float32)
    return np.sqrt(sum(d * d for d in diffs)).astype(np.float32)


def tpi(dem):
    """Topographic Position Index (gdaldem_lib.cpp GDALTPIAlg): center minus
    neighborhood mean."""
    w = _windows(dem)
    return (w[4] - (w[0] + w[1] + w[2] + w[3] + w[5] + w[6] + w[7] + w[8]) * 0.125).astype(
        np.float32
    )


def roughness(dem):
    """Max minus min of the 3x3 window (gdaldem_lib.cpp GDALRoughnessAlg)."""
    w = _windows(dem)
    stack = np.stack(w)
    return (stack.max(axis=0) - stack.min(axis=0)).astype(np.float32)


def proximity(target_mask, max_dist=None):
    """Chamfer-style two-pass distance to the nearest target pixel
    (alg/gdalproximity.cpp:94 two-sweep structure; this implementation
    computes exact euclidean distance via per-row propagation of the
    nearest-target coordinates, adequate for per-image grids)."""
    h, w = target_mask.shape
    INF = 1 << 30
    # squared distance transform (Felzenszwalb-style two 1-D passes)
    d = np.where(target_mask, 0, INF).astype(np.int64)
    # columns pass
    for y in range(1, h):
        d[y] = np.minimum(d[y], d[y - 1] + 1)
    for y in range(h - 2, -1, -1):
        d[y] = np.minimum(d[y], d[y + 1] + 1)
    # d now = vertical distance in rows; exact 2-D euclidean via per-row scan
    out = np.empty((h, w), dtype=np.float64)
    xs = np.arange(w)
    for y in range(h):
        row = d[y]
        best = np.full(w, np.inf)
        cand = np.flatnonzero(row < INF)
        if cand.size:
            dy = row[cand].astype(np.float64)
            # lower envelope over candidates (O(w * ncand) worst, fine <=128)
            for i, cx in enumerate(cand):
                dist = np.sqrt((xs - cx) ** 2 + dy[i] ** 2)
                np.minimum(best, dist, out=best)
        out[y] = best
    if max_dist is not None:
        out = np.minimum(out, max_dist)
    return out


def sieve(arr, threshold, nodata=None, connect8=False):
    """Remove connected regions smaller than threshold by merging them into
    their largest neighbor (alg/gdalsievefilter.cpp:178 semantics)."""
    from gdal_ray.raster.polygonize import label_regions

    out = arr.copy()
    for _ in range(arr.size):  # iterate until stable (small grids)
        labels = label_regions(out, nodata=nodata, connect8=connect8)
        nlab = labels.max() + 1
        if nlab <= 0:
            return out
        sizes = np.bincount(labels[labels >= 0].ravel(), minlength=nlab)
        small = np.flatnonzero(sizes < threshold)
        if small.size == 0:
            return out
        changed = False
        for lab in small:
            mask = labels == lab
            # neighbor values along the region boundary
            p = np.pad(mask, 1)
            nb = (
                np.roll(p, 1, 0) | np.roll(p, -1, 0) | np.roll(p, 1, 1) | np.roll(p, -1, 1)
            )[1:-1, 1:-1] & ~mask
            vals, counts = np.unique(out[nb], return_counts=True)
            keep = [(v, c) for v, c in zip(vals, counts) if nodata is None or v != nodata]
            if not keep:
                continue
            vbest = max(keep, key=lambda t: t[1])[0]
            out[mask] = vbest
            changed = True
        if not changed:
            return out
    return out


def fillnodata(arr, nodata, max_iter=100):
    """Fill nodata by iterative 4-neighbor averaging from valid edges
    (alg/rasterfill.cpp IDW-from-edges, simplified ring fill)."""
    out = arr.astype(np.float64)
    hole = arr == nodata
    while hole.any() and max_iter > 0:
        max_iter -= 1
        p = np.pad(out, 1, mode="edge")
        ph = np.pad(hole, 1, mode="edge")
        acc = np.zeros_like(out)
        cnt = np.zeros_like(out)
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            v = p[1 + dy : 1 + dy + out.shape[0], 1 + dx : 1 + dx + out.shape[1]]
            m = ~ph[1 + dy : 1 + dy + out.shape[0], 1 + dx : 1 + dx + out.shape[1]]
            acc += np.where(m, v, 0)
            cnt += m
        fill = hole & (cnt > 0)
        out[fill] = acc[fill] / cnt[fill]
        hole = hole & ~fill
    return out


def histogram(img, bins=256, vmin=0, vmax=256):
    """Per-image histogram partial (gcore/gdalrasterband.cpp:4176
    GetHistogram); partials vector-sum into the global histogram."""
    return np.bincount(
        np.clip(((img.ravel() - vmin) * bins / (vmax - vmin)).astype(np.int64), 0, bins - 1),
        minlength=bins,
    )


def equalize_histogram(img, bins=1024, out_max=255):
    """Histogram equalization (gdalenhance -equalize,
    apps/gdalenhance.cpp): CDF over a ``bins``-bucket histogram of the
    band range, mapped to 0..out_max as a LUT. Returns uint8."""
    flat = img.astype(np.float64).ravel()
    lo, hi = float(flat.min()), float(flat.max())
    if hi <= lo:
        return np.zeros(img.shape, dtype=np.uint8)
    hist = np.bincount(
        np.clip(((flat - lo) * bins / (hi - lo)).astype(np.int64),
                0, bins - 1),
        minlength=bins,
    )
    cdf = np.cumsum(hist).astype(np.float64)
    cdf /= cdf[-1]
    idx = np.clip(((img.astype(np.float64) - lo) * bins
                   / (hi - lo)).astype(np.int64), 0, bins - 1)
    return np.round(cdf[idx] * out_max).astype(np.uint8)


def stretch_minmax(img, lo_pct=2.0, hi_pct=98.0, out_max=255):
    """Percent-clip linear stretch (gdalenhance linear mode): values at
    or below the lo percentile -> 0, at or above the hi percentile ->
    out_max. Returns uint8."""
    flat = img.astype(np.float64).ravel()
    lo = float(np.percentile(flat, lo_pct))
    hi = float(np.percentile(flat, hi_pct))
    if hi <= lo:
        return np.zeros(img.shape, dtype=np.uint8)
    out = (img.astype(np.float64) - lo) / (hi - lo) * out_max
    return np.clip(np.round(out), 0, out_max).astype(np.uint8)


# VRT pixel functions (frmts/vrt/pixelfunctions.cpp:4006) — the commonly
# used subset, each over a list of band arrays:
PIXEL_FUNCTIONS = {
    "sum": lambda bands: np.sum(bands, axis=0),
    "diff": lambda bands: bands[0].astype(np.float64) - bands[1],
    "mul": lambda bands: np.prod(np.asarray(bands, dtype=np.float64), axis=0),
    "div": lambda bands: np.divide(
        bands[0], bands[1], out=np.zeros_like(bands[0], dtype=np.float64), where=bands[1] != 0
    ),
    "min": lambda bands: np.min(bands, axis=0),
    "max": lambda bands: np.max(bands, axis=0),
    "mean": lambda bands: np.mean(np.asarray(bands, dtype=np.float64), axis=0),
    "geometric_mean": lambda bands: np.prod(np.asarray(bands, dtype=np.float64), axis=0)
    ** (1.0 / len(bands)),
    "sqrt": lambda bands: np.sqrt(bands[0].astype(np.float64)),
    "log10": lambda bands: np.log10(np.maximum(bands[0].astype(np.float64), 1e-300)),
    "exp": lambda bands: np.exp(bands[0].astype(np.float64)),
    "pow": lambda bands, power=2.0: bands[0].astype(np.float64) ** power,
    "scale": lambda bands, scale=1.0, offset=0.0: bands[0].astype(np.float64) * scale + offset,
    "norm_diff": lambda bands: np.divide(
        bands[0].astype(np.float64) - bands[1],
        bands[0].astype(np.float64) + bands[1],
        out=np.zeros_like(bands[0], dtype=np.float64),
        where=(bands[0].astype(np.float64) + bands[1]) != 0,
    ),
    "replace_nodata": lambda bands, nodata=0, to=0: np.where(bands[0] == nodata, to, bands[0]),
    "interpolate_linear": lambda bands, t=0.5: bands[0].astype(np.float64) * (1 - t)
    + bands[1].astype(np.float64) * t,
}


def mosaic_arrays(canvas_shape, sources, offsets, nodata=0, dtype=np.int64):
    """VRT-mosaic painting (gdalbuildvrt / frmts/vrt/vrtsources.cpp order
    semantics): sources paint the canvas IN LIST ORDER; a later source
    overwrites wherever its pixel differs from ``nodata`` (the simple-source
    nodata mask), so overlaps resolve last-wins-on-valid. Sources may hang
    off the canvas edge — the out-of-canvas part is clipped."""
    out = np.full(canvas_shape, nodata, dtype=dtype)
    H, W = canvas_shape[:2]
    for src, (oy, ox) in zip(sources, offsets):
        h, w = src.shape[:2]
        y0, x0 = max(0, oy), max(0, ox)
        y1, x1 = min(H, oy + h), min(W, ox + w)
        if y0 >= y1 or x0 >= x1:
            continue
        win = src[y0 - oy : y1 - oy, x0 - ox : x1 - ox]
        m = win != nodata
        out[y0:y1, x0:x1][m] = win[m]
    return out


def nearblack(img, threshold=15, set_value=0, white=False):
    """Collar removal (apps/nearblack_lib.cpp:76 semantics): per row, scan
    from the LEFT and RIGHT edges inward while every band stays within
    ``threshold`` of black (or white with ``white=True``); those collar
    pixels are set to ``set_value``. Interior near-black pixels are NOT
    touched (the scan stops at the first non-near pixel).
    Returns (out_img, n_changed)."""
    import numpy as np

    out = img.copy()
    ref = 255 if white else 0
    near = (np.abs(img.astype(np.int32) - ref) <= threshold).all(axis=2)
    h, w = near.shape
    # vectorized collar runs (no per-row Python scan): left run = index of
    # the first non-near pixel (w if the whole row is near); right run
    # likewise on the mirrored row, clamped so the two runs never overlap
    not_near = ~near
    any_not = not_near.any(axis=1)
    left = np.where(any_not, np.argmax(not_near, axis=1), w)
    right = np.where(any_not, np.argmax(not_near[:, ::-1], axis=1), 0)
    right = np.minimum(right, w - left)
    cols = np.arange(w)
    mask = (cols[None, :] < left[:, None]) | (cols[None, :] >= (w - right)[:, None])
    changed = int(mask.sum())
    if changed:
        out[mask] = set_value
    return out, changed


def nearblack_floodfill(img, threshold=15, set_value=0, white=False):
    """Flood-fill collar removal (the reference's -alg floodfill path,
    apps/nearblack_lib_floodfill.cpp): 4-connected fill of near-black
    pixels REACHABLE from the image border, so collars that wrap around
    corners or run along the top/bottom edges are caught where the
    per-row scan of :func:`nearblack` stops at the first interior pixel.
    Interior near-black islands (not border-connected) stay untouched.
    Returns (out_img, n_changed)."""
    out = img.copy()
    ref = 255 if white else 0
    near = (np.abs(img.astype(np.int32) - ref) <= threshold).all(axis=2)
    collar = np.zeros_like(near)
    collar[0, :] = near[0, :]
    collar[-1, :] = near[-1, :]
    collar[:, 0] = near[:, 0]
    collar[:, -1] = near[:, -1]
    # iterative 4-neighbor propagation to a fixed point (passes bounded
    # by the longest collar path; each pass is fully vectorized)
    while True:
        grow = collar.copy()
        grow[1:, :] |= collar[:-1, :]
        grow[:-1, :] |= collar[1:, :]
        grow[:, 1:] |= collar[:, :-1]
        grow[:, :-1] |= collar[:, 1:]
        grow &= near
        if (grow == collar).all():
            break
        collar = grow
    changed = int(collar.sum())
    if changed:
        out[collar] = set_value
    return out, changed


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def pansharpen_brovey(ms, pan, weights=None, bit_depth=8):
    """Weighted-Brovey pansharpening (alg/gdalpansharpen.cpp:1166 weighted
    algorithm): pseudo-pan = sum(w_i * ms_i) on the upsampled multispectral
    bands; each output band = ms_i * (pan / pseudo_pan), clipped to the
    bit depth. ``ms`` is (h, w, b) at lower resolution, ``pan`` (H, W).

    Memory-lean mixed precision (bit-identical to the all-float64 form,
    pinned by tests/test_raster_kernels.py across 100 seeded images): the
    upsample runs in float32 when the scale factors are exact powers of
    two on a <=16-bit integer input (dyadic weights -> float32 is exact,
    and the result is rounded back to the input dtype either way); the
    division stays float64; and the final band multiplies run one band at
    a time, so no H x W x b float64 temporary is ever materialized —
    under 32-way memory-bandwidth contention this is the dominant cost."""
    import numpy as np

    H, W = pan.shape[:2]
    h, w, b = ms.shape
    if weights is None:
        weights = np.full(b, 1.0 / b)
    weights = np.asarray(weights, dtype=np.float64)
    exact_f32 = (
        np.issubdtype(ms.dtype, np.integer)
        and np.iinfo(ms.dtype).bits <= 16
        and H % h == 0 and W % w == 0
        and _is_pow2(H // h) and _is_pow2(W // w)
    )
    up = resample_bilinear(
        ms, H, W, compute_dtype=np.float32 if exact_f32 else np.float64
    )
    # pseudo-pan and the ratio in float64 (a single rounded division each;
    # `up` is already rounded back to the ms dtype, so the fast path feeds
    # identical values here)
    pseudo = np.zeros((H, W), dtype=np.float64)
    for i in range(b):
        pseudo += up[:, :, i].astype(np.float64) * weights[i]
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(pseudo > 0, pan.astype(np.float64) / pseudo, 0.0)
    out = np.empty((H, W, b), dtype=ms.dtype)
    lim = (1 << bit_depth) - 1
    for i in range(b):
        band = up[:, :, i].astype(np.float64) * ratio
        out[:, :, i] = np.clip(band + 0.5, 0, lim).astype(ms.dtype)
    return out


def _cubic_weight(t, a=-0.5):
    """Keys cubic-convolution kernel (GDAL GRIORA_Cubic, a = -0.5;
    alg/gdalwarpkernel.cpp CubicKernel)."""
    t = np.abs(t)
    w = np.where(
        t <= 1.0,
        (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
        np.where(t < 2.0, a * (t**3 - 5.0 * t**2 + 8.0 * t - 4.0), 0.0),
    )
    return w


def _lanczos_weight(t, a=3):
    """Lanczos windowed sinc (GRIORA_Lanczos, a = 3)."""
    t = np.asarray(t, dtype=np.float64)
    out = np.zeros_like(t)
    nz = (np.abs(t) < a) & (t != 0)
    x = np.pi * t[nz]
    out[nz] = a * np.sin(x) * np.sin(x / a) / (x * x)
    out[t == 0] = 1.0
    return out


def _separable_resample(img, h_out, w_out, weight_fn, support):
    """Separable kernel resample on pixel centers with edge clamping and
    per-pixel weight normalization (the clamped-window treatment GDAL uses
    at raster edges)."""
    h_in, w_in = img.shape[:2]
    ys, xs = _sample_grid(h_out, w_out, h_in, w_in)
    fy = ys - 0.5
    fx = xs - 0.5
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    f = img.astype(np.float64)
    acc = np.zeros((h_out, w_out) + img.shape[2:], dtype=np.float64)
    wsum = np.zeros((h_out, w_out), dtype=np.float64)
    for dy in range(-support + 1, support + 1):
        wy = weight_fn(fy - (y0 + dy))  # (h_out,)
        iy = np.clip(y0 + dy, 0, h_in - 1)
        for dx in range(-support + 1, support + 1):
            wx = weight_fn(fx - (x0 + dx))
            ix = np.clip(x0 + dx, 0, w_in - 1)
            w2 = wy[:, None] * wx[None, :]
            vals = f[np.ix_(iy, ix)]
            if img.ndim == 3:
                acc += vals * w2[..., None]
            else:
                acc += vals * w2
            wsum += w2
    wsum = np.where(wsum == 0, 1.0, wsum)
    out = acc / (wsum[..., None] if img.ndim == 3 else wsum)
    return cast_clip(out, img.dtype) if np.issubdtype(img.dtype, np.integer) else out


def resample_cubic(img, h_out, w_out):
    """GRIORA_Cubic (Keys a=-0.5, 4x4 support)."""
    return _separable_resample(img, h_out, w_out, _cubic_weight, 2)


def resample_lanczos(img, h_out, w_out):
    """GRIORA_Lanczos (a=3, 6x6 support)."""
    return _separable_resample(img, h_out, w_out, _lanczos_weight, 3)


def resample_mode(img, factor):
    """Integer-factor MODE decimation (overview MODE kernel,
    gcore/overview.cpp GDALResampleChunk_Mode): most frequent value per
    factor x factor block; ties resolve to the SMALLEST value
    (deterministic under any traversal order)."""
    h, w = img.shape[:2]
    h2, w2 = h // factor, w // factor
    img2 = img[: h2 * factor, : w2 * factor]
    if img.ndim == 3:
        out = np.empty((h2, w2, img.shape[2]), dtype=img.dtype)
        for c in range(img.shape[2]):
            out[:, :, c] = resample_mode(img2[:, :, c], factor)
        return out
    blocks = img2.reshape(h2, factor, w2, factor).transpose(0, 2, 1, 3).reshape(h2, w2, -1)
    blocks = np.sort(blocks, axis=2)  # sorted -> first argmax of counts = smallest mode
    n = blocks.shape[2]
    best_val = blocks[:, :, 0].copy()
    best_cnt = np.ones((h2, w2), dtype=np.int64)
    run_val = blocks[:, :, 0].copy()
    run_cnt = np.ones((h2, w2), dtype=np.int64)
    for k in range(1, n):
        same = blocks[:, :, k] == run_val
        run_cnt = np.where(same, run_cnt + 1, 1)
        run_val = blocks[:, :, k]
        better = run_cnt > best_cnt
        best_cnt = np.where(better, run_cnt, best_cnt)
        best_val = np.where(better, run_val, best_val)
    return best_val
