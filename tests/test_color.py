"""Median-cut palette + dithering (raster/color.py)."""

import numpy as np
import pytest

from gdal_ray.raster.color import (
    dither_floyd_steinberg,
    dither_ordered,
    median_cut_palette,
    nearest_color_cube,
    quantize_image,
)


def test_palette_of_few_colors_recovers_bin_centers():
    # 4 colors, each aligned to a 5-bit bin center: median cut must isolate
    # each into its own box and reproduce the exact center
    colors = np.array([[4, 4, 4], [100, 4, 4], [4, 196, 4], [252, 252, 252]], np.uint8)
    img = colors[np.random.default_rng(0).integers(0, 4, (32, 32))]
    pal = median_cut_palette(img, 4)
    assert len(pal) == 4
    assert set(map(tuple, pal)) == set(map(tuple, colors))


def test_nearest_cube_maps_palette_members_to_themselves():
    pal = np.array([[4, 4, 4], [100, 4, 4], [4, 196, 4], [252, 252, 252]], np.uint8)
    cube = nearest_color_cube(pal)
    for i, c in enumerate(pal.astype(np.int64)):
        assert cube[c[0] >> 3, c[1] >> 3, c[2] >> 3] == i


def test_dither_flat_image_is_constant_index():
    pal = np.array([[4, 4, 4], [100, 4, 4], [4, 196, 4]], np.uint8)
    img = np.full((16, 20, 3), pal[1], dtype=np.uint8)
    assert (dither_floyd_steinberg(img, pal) == 1).all()
    assert (dither_ordered(img, pal) == 1).all()


def test_floyd_steinberg_preserves_mean():
    """Error diffusion keeps the local mean: a 50% gray dithered onto a
    black/white palette must come out ~half white."""
    pal = np.array([[4, 4, 4], [252, 252, 252]], np.uint8)
    img = np.full((64, 64, 3), 128, dtype=np.uint8)
    idx = dither_floyd_steinberg(img, pal)
    share_white = idx.mean()
    assert 0.4 < share_white < 0.6
    # ordered dither also lands near half
    share_ordered = dither_ordered(img, pal).mean()
    assert 0.3 < share_ordered < 0.7


def test_quantize_image_roundtrip_error_bounded():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    pal, idx = quantize_image(img, 64, method="fs")
    assert pal.shape[1] == 3 and idx.shape == (40, 40)
    recon = pal[idx].astype(np.float64)
    rmse = np.sqrt(np.mean((recon - img.astype(np.float64)) ** 2))
    assert rmse < 40.0  # 64 colors on uniform noise
    with pytest.raises(ValueError, match="unknown dither"):
        quantize_image(img, 8, method="wat")


# ---------------- color-relief (gdaldem color-relief) ----------------

def _relief_oracle(v, ramp, mode):
    """Per-pixel scalar replica of GDALColorReliefGetRGBA
    (apps/gdaldem_lib.cpp:1611): lower_bound search, end clamping, exact
    hits, nearest ties to the upper entry, interpolation via
    clamp(trunc(0.5 + lo + ratio*(hi-lo)))."""
    import math

    vals = [e[0] for e in ramp]
    cols = [e[1:] for e in ramp]
    n = len(vals)
    if math.isnan(v):
        return cols[-1] if mode != "exact" else (0, 0, 0, 0)
    i = 0
    while i < n and vals[i] < v:
        i += 1
    if i == 0:
        if mode == "exact" and vals[0] != v:
            return (0, 0, 0, 0)
        return cols[0]
    if i == n:
        if mode == "exact" and vals[-1] != v:
            return (0, 0, 0, 0)
        return cols[-1]
    if vals[i] == v:
        return cols[i]
    if mode == "exact":
        return (0, 0, 0, 0)
    if mode == "nearest":
        return cols[i - 1] if v - vals[i - 1] < vals[i] - v else cols[i]
    ratio = (v - vals[i - 1]) / (vals[i] - vals[i - 1])
    return tuple(
        int(min(max(math.trunc(0.5 + a + ratio * (b - a)), 0), 255))
        for a, b in zip(cols[i - 1], cols[i])
    )


@pytest.mark.parametrize("mode", ["interpolate", "exact", "nearest"])
def test_color_relief_matches_scalar_oracle(mode):
    from gdal_ray.raster.color import color_relief

    rng = np.random.default_rng(7)
    ramp = [(-10.0, 0, 0, 80, 255), (0.0, 10, 200, 30, 255),
            (12.5, 120, 120, 0, 128), (100.0, 255, 255, 255, 255)]
    # cover: outside both ends, exact breakpoint hits, interior randoms,
    # midpoints (nearest-tie goes to the UPPER entry), fractional values
    v = np.concatenate([
        np.array([-50.0, -10.0, -5.0, 0.0, 6.25, 12.5, 56.25, 100.0, 250.0]),
        rng.uniform(-20, 120, 200),
        np.array([(-10.0 + 0.0) / 2, (0.0 + 12.5) / 2, (12.5 + 100.0) / 2]),
    ])
    got = color_relief(v.reshape(4, -1), ramp, mode)
    want = np.array([_relief_oracle(x, ramp, mode) for x in v],
                    dtype=np.uint8).reshape(4, -1, 4)
    assert np.array_equal(got, want)


def test_color_relief_nan_and_nv_entry():
    from gdal_ray.raster.color import color_relief

    # leading NaN entry colors NaN pixels (the reference's nv row)
    ramp = [(float("nan"), 9, 9, 9, 9), (0.0, 0, 0, 0, 255),
            (10.0, 255, 0, 0, 255)]
    a = np.array([[float("nan"), 0.0, 5.0]])
    out = color_relief(a, ramp)
    assert tuple(out[0, 0]) == (9, 9, 9, 9)
    assert tuple(out[0, 1]) == (0, 0, 0, 255)
    assert tuple(out[0, 2]) == (128, 0, 0, 255)
    # without an nv row NaN clamps to the last entry (unchecked search)
    out2 = color_relief(a, ramp[1:])
    assert tuple(out2[0, 0]) == (255, 0, 0, 255)


def test_parse_color_ramp():
    from gdal_ray.raster.color import parse_color_ramp

    txt = """# elevation ramp
nv 1 2 3
0 0 97 71
50% 16,122,47
100% 255 255 255 128
"""
    ramp = parse_color_ramp(txt, src_min=100.0, src_max=300.0, nodata=-1.0)
    assert ramp == [(-1.0, 1, 2, 3, 255), (0.0, 0, 97, 71, 255),
                    (200.0, 16, 122, 47, 255), (300.0, 255, 255, 255, 128)]
    # nv dropped without a nodata value; percent requires the range
    assert parse_color_ramp("nv 1 2 3\n5 1 2 3")[0][0] == 5.0
    with pytest.raises(ValueError, match="percentage"):
        parse_color_ramp("50% 1 2 3")


def test_color_relief_rejects_bad_ramps():
    from gdal_ray.raster.color import color_relief

    a = np.zeros((2, 2))
    with pytest.raises(ValueError, match="strictly increasing"):
        color_relief(a, [(0.0, 0, 0, 0), (0.0, 1, 1, 1)])
    with pytest.raises(ValueError, match="unknown color-relief"):
        color_relief(a, [(0.0, 0, 0, 0)], mode="wat")
