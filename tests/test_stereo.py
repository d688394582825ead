"""Stereographic + Hotine oblique mercator (geo/stereo.py): EPSG Guidance
Note 7-2 worked examples + round-trip properties + the warp seam."""

import numpy as np
import pytest

from gdal_ray.geo import stereo as ST

dms = lambda d, m, s: d + m / 60 + s / 3600  # noqa: E731


def test_polar_stereo_variant_a_ups_north_example():
    # EPSG GN7-2 example (UPS North, WGS84, k0=0.994, FE=FN=2000000)
    x, y = ST.polar_stereo_forward(73.0, 44.0, 90.0, 0.0, 0.994, 2000000, 2000000)
    assert float(x) == pytest.approx(3320416.75, abs=0.01)
    assert float(y) == pytest.approx(632668.43, abs=0.01)
    lat, lon = ST.polar_stereo_inverse(x, y, 90.0, 0.0, 0.994, 2000000, 2000000)
    assert float(lat) == pytest.approx(73.0, abs=1e-9)
    assert float(lon) == pytest.approx(44.0, abs=1e-9)


def test_polar_stereo_variant_b_antarctic_example():
    # EPSG GN7-2 example (Australian Antarctic, lat_ts=-71, lon0=70)
    k0 = ST.polar_stereo_k0_from_lat_ts(-71.0)
    x, y = ST.polar_stereo_forward(-75.0, 120.0, -90.0, 70.0, k0, 6000000, 6000000)
    assert float(x) == pytest.approx(7255380.79, abs=0.01)
    assert float(y) == pytest.approx(7053389.56, abs=0.01)


def test_oblique_stereo_amersfoort_example():
    # EPSG GN7-2 example (Amersfoort / RD New on Bessel 1841)
    p = (dms(52, 9, 22.178), dms(5, 23, 15.5), 0.9999079, 155000.0, 463000.0,
         6377397.155, 299.1528128)
    x, y = ST.oblique_stereo_forward(53.0, 6.0, *p)
    assert float(x) == pytest.approx(196105.283, abs=0.002)
    assert float(y) == pytest.approx(557057.739, abs=0.002)
    lat, lon = ST.oblique_stereo_inverse(x, y, *p)
    assert float(lat) == pytest.approx(53.0, abs=1e-9)
    assert float(lon) == pytest.approx(6.0, abs=1e-9)


def test_homerc_timbalai_example():
    # EPSG GN7-2 example (Timbalai 1948 / RSO Borneo on Everest)
    p = (4.0, 115.0, dms(53, 18, 56.9537), dms(53, 7, 48.3685), 0.99984,
         590476.87, 442857.65, 6377298.556, 300.8017)
    x, y = ST.homerc_forward(dms(5, 23, 14.1129), dms(115, 48, 19.8196), *p)
    assert float(x) == pytest.approx(679245.73, abs=0.01)
    assert float(y) == pytest.approx(596562.78, abs=0.01)
    lat, lon = ST.homerc_inverse(x, y, *p)
    assert float(lat) == pytest.approx(dms(5, 23, 14.1129), abs=1e-9)
    assert float(lon) == pytest.approx(dms(115, 48, 19.8196), abs=1e-9)


def test_round_trips_random():
    rng = np.random.default_rng(7)
    # polar north (EPSG:3413 params), vectorized
    lat = rng.uniform(60, 89, 200)
    lon = rng.uniform(-180, 180, 200)
    k0 = ST.polar_stereo_k0_from_lat_ts(70.0)
    x, y = ST.polar_stereo_forward(lat, lon, 90.0, -45.0, k0)
    la, lo = ST.polar_stereo_inverse(x, y, 90.0, -45.0, k0)
    assert np.allclose(la, lat, atol=1e-9)
    assert np.allclose(((lo - lon + 180) % 360) - 180, 0, atol=1e-9)
    # oblique stereographic around Amersfoort
    p = (dms(52, 9, 22.178), dms(5, 23, 15.5), 0.9999079, 155000.0, 463000.0,
         6377397.155, 299.1528128)
    lat = rng.uniform(50, 54, 200)
    lon = rng.uniform(3, 8, 200)
    la, lo = ST.oblique_stereo_inverse(*ST.oblique_stereo_forward(lat, lon, *p), *p)
    assert np.allclose(la, lat, atol=1e-9) and np.allclose(lo, lon, atol=1e-9)
    # HOM around Borneo
    p = (4.0, 115.0, dms(53, 18, 56.9537), dms(53, 7, 48.3685), 0.99984,
         590476.87, 442857.65, 6377298.556, 300.8017)
    lat = rng.uniform(1, 7, 200)
    lon = rng.uniform(110, 119, 200)
    la, lo = ST.homerc_inverse(*ST.homerc_forward(lat, lon, *p), *p)
    assert np.allclose(la, lat, atol=1e-9) and np.allclose(lo, lon, atol=1e-9)


def test_warp_seam_epsg_codes():
    """The warp transformer chain composes stereo CRS through 4326."""
    from gdal_ray.raster.warp import _fwd, _to_4326

    # 3413 (sea-ice north) -> 3857 and back through the seam
    x, y = _fwd(np.array([-45.0]), np.array([75.0]), "EPSG:4326", "EPSG:3413")
    lon, lat = _to_4326(x, y, "EPSG:3413")
    assert float(lat) == pytest.approx(75.0, abs=1e-9)
    assert float(lon) == pytest.approx(-45.0, abs=1e-9)
    mx, my = _fwd(x, y, "EPSG:3413", "EPSG:3857")
    lon2, lat2 = _to_4326(mx, my, "EPSG:3857")
    assert float(lat2) == pytest.approx(75.0, abs=1e-9)
    # Amersfoort EPSG code registered
    x, y = _fwd(np.array([5.5]), np.array([52.3]), "EPSG:4326", "EPSG:28992")
    lon, lat = _to_4326(x, y, "EPSG:28992")
    assert float(lat) == pytest.approx(52.3, abs=1e-9)
    # unknown SRS raises the documented seam error (pyproj absent here)
    with pytest.raises(NotImplementedError, match="pyproj"):
        _to_4326(np.array([0.0]), np.array([0.0]), "EPSG:27700")


def test_warp_image_through_polar_stereo():
    """End-to-end warp_image via EPSG:3413 (same kernel as the UTM path)."""
    from gdal_ray.raster.warp import warp_image

    img = (np.arange(40 * 40, dtype=np.int64) % 251).reshape(40, 40)
    # a 40x40 source in 3413 meters near the pole
    gt = (-200000.0, 10000.0, 0.0, 200000.0, 0.0, -10000.0)
    out, dst_gt = warp_image(img, gt, "EPSG:3413", "EPSG:4326")
    assert out.shape == (40, 40)
    assert (out > 0).any()
    # round-trip: warp back and compare coverage
    back, _ = warp_image(out, dst_gt, "EPSG:4326", "EPSG:3413")
    assert (back > 0).any()
