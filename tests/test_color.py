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
