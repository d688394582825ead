"""Geolocation-array transformer (geo/geoloc.py)."""

import numpy as np
import pytest

from gdal_ray.geo.geoloc import GeolocTransform


def _affine_geoloc(h=40, w=50):
    rr, cc = np.mgrid[0:h, 0:w].astype(np.float64)
    gx = 1000.0 + 3.0 * cc - 0.5 * rr
    gy = 2000.0 - 2.0 * rr + 0.25 * cc
    return gx, gy


def test_affine_geoloc_forward_and_inverse_exact():
    gx, gy = _affine_geoloc()
    t = GeolocTransform(gx, gy)
    px = np.array([0.0, 10.5, 49.0, 23.25])
    py = np.array([0.0, 7.25, 39.0, 18.5])
    fx, fy = t.forward(px, py)
    assert np.allclose(fx, 1000 + 3 * px - 0.5 * py, atol=1e-9)
    assert np.allclose(fy, 2000 - 2 * py + 0.25 * px, atol=1e-9)
    bx, by = t.inverse(fx, fy)
    assert np.allclose(bx, px, atol=1e-6)
    assert np.allclose(by, py, atol=1e-6)


def test_subsampled_geoloc_offsets_and_steps():
    # geoloc grid every 4 pixels / 2 lines, offset (1.5, 0.5) — the
    # PIXEL_STEP/LINE_STEP/PIXEL_OFFSET/LINE_OFFSET knobs
    gx, gy = _affine_geoloc(20, 25)
    gx2 = 10.0 + 2.0 * (1.5 + 4.0 * np.arange(25))[None, :] + 0.0 * np.arange(20)[:, None]
    gy2 = 5.0 - 3.0 * (0.5 + 2.0 * np.arange(20))[:, None] + 0.0 * np.arange(25)[None, :]
    t = GeolocTransform(gx2, gy2, pixel_offset=1.5, line_offset=0.5,
                        pixel_step=4.0, line_step=2.0)
    px = np.array([1.5, 9.5, 41.5])
    py = np.array([0.5, 10.5, 30.5])
    fx, fy = t.forward(px, py)
    assert np.allclose(fx, 10 + 2 * px, atol=1e-9)
    assert np.allclose(fy, 5 - 3 * py, atol=1e-9)
    bx, by = t.inverse(fx, fy)
    assert np.allclose(bx, px, atol=1e-6) and np.allclose(by, py, atol=1e-6)


def test_curved_swath_roundtrip():
    # gently curved swath (sinusoidal cross-track distortion)
    h, w = 60, 80
    rr, cc = np.mgrid[0:h, 0:w].astype(np.float64)
    gx = 100.0 + 1.5 * cc + 4.0 * np.sin(rr / 11.0)
    gy = -50.0 - 1.2 * rr + 3.0 * np.cos(cc / 13.0)
    t = GeolocTransform(gx, gy)
    rng = np.random.default_rng(2)
    px = rng.uniform(0, w - 1, 300)
    py = rng.uniform(0, h - 1, 300)
    fx, fy = t.forward(px, py)
    bx, by = t.inverse(fx, fy)
    assert np.allclose(bx, px, atol=1e-5)
    assert np.allclose(by, py, atol=1e-5)


def test_warp_image_through_geoloc():
    """warp_image_transform accepts a geoloc transform directly."""
    from gdal_ray.raster.warp import warp_image_transform

    gx, gy = _affine_geoloc(30, 40)
    t = GeolocTransform(gx, gy)
    img = (np.arange(30 * 40, dtype=np.int64) % 251).reshape(30, 40)
    out, dst_gt = warp_image_transform(img, t, resampling="nearest")
    assert out.shape == (30, 40)
    assert (out > 0).any()
