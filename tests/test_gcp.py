"""GCP polynomial / TPS / RPC transforms (geo/gcp.py) + the GCP warp path."""

import numpy as np
import pytest

from gdal_ray.geo.gcp import GCPPolynomial, RPCTransform, ThinPlateSpline


def _affine_gcps(n=12, seed=3):
    rng = np.random.default_rng(seed)
    px = rng.uniform(0, 100, n)
    py = rng.uniform(0, 80, n)
    gx = 500.0 + 2.0 * px - 0.5 * py
    gy = 900.0 + 0.25 * px - 3.0 * py
    return np.stack([px, py, gx, gy], axis=1)


def test_gcp_polynomial_order1_recovers_affine():
    g = _affine_gcps()
    t = GCPPolynomial(g, order=1)
    assert t.rms < 1e-9
    px = np.array([10.0, 50.0, 99.0])
    py = np.array([5.0, 40.0, 79.0])
    gx, gy = t.forward(px, py)
    assert np.allclose(gx, 500 + 2 * px - 0.5 * py, atol=1e-9)
    assert np.allclose(gy, 900 + 0.25 * px - 3 * py, atol=1e-9)
    bx, by = t.inverse(gx, gy)
    assert np.allclose(bx, px, atol=1e-9) and np.allclose(by, py, atol=1e-9)


def test_gcp_polynomial_order2_recovers_quadratic():
    rng = np.random.default_rng(4)
    px = rng.uniform(0, 10, 20)
    py = rng.uniform(0, 10, 20)
    gx = 1.0 + px + 0.1 * px * py + 0.05 * py * py
    gy = 2.0 - py + 0.2 * px * px
    t = GCPPolynomial(np.stack([px, py, gx, gy], axis=1), order=2)
    assert t.rms < 1e-9
    fx, fy = t.forward(np.array([3.0]), np.array([7.0]))
    assert float(fx) == pytest.approx(1 + 3 + 0.1 * 21 + 0.05 * 49, abs=1e-9)
    assert float(fy) == pytest.approx(2 - 7 + 0.2 * 9, abs=1e-9)


def test_gcp_polynomial_min_points_enforced():
    g = _affine_gcps(n=5)
    with pytest.raises(ValueError, match="needs >="):
        GCPPolynomial(g, order=2)


def test_tps_interpolates_gcps_exactly_and_affine_between():
    g = _affine_gcps(n=16, seed=9)
    t = ThinPlateSpline(g)
    fx, fy = t.forward(g[:, 0], g[:, 1])
    assert np.allclose(fx, g[:, 2], atol=1e-7)
    assert np.allclose(fy, g[:, 3], atol=1e-7)
    # affine data -> TPS degenerates to the affine part (weights ~ 0)
    px, py = np.array([33.0]), np.array([21.0])
    gx, gy = t.forward(px, py)
    assert float(gx) == pytest.approx(500 + 2 * 33 - 0.5 * 21, abs=1e-6)
    assert float(gy) == pytest.approx(900 + 0.25 * 33 - 3 * 21, abs=1e-6)
    bx, by = t.inverse(gx, gy)
    assert float(bx) == pytest.approx(33.0, abs=1e-6)
    assert float(by) == pytest.approx(21.0, abs=1e-6)


def _linear_rpc():
    """RPC whose numerators are linear in (L, P) and denominators 1:
    samp = 10 + 100 L - 5 P ; line = 20 - 80 P + 3 L (normalized units)."""
    z = np.zeros(20)
    sn = z.copy(); sn[0], sn[1], sn[2] = 10.0, 100.0, -5.0
    ln = z.copy(); ln[0], ln[2], ln[1] = 20.0, -80.0, 3.0
    den = z.copy(); den[0] = 1.0
    return {
        "SAMP_NUM_COEFF": sn, "SAMP_DEN_COEFF": den,
        "LINE_NUM_COEFF": ln, "LINE_DEN_COEFF": den,
        "LONG_OFF": 115.0, "LONG_SCALE": 0.5,
        "LAT_OFF": 4.0, "LAT_SCALE": 0.4,
        "HEIGHT_OFF": 0.0, "HEIGHT_SCALE": 500.0,
        "SAMP_OFF": 5000.0, "SAMP_SCALE": 5000.0,
        "LINE_OFF": 4000.0, "LINE_SCALE": 4000.0,
    }


def test_rpc_forward_matches_closed_form_and_inverse_roundtrips():
    t = RPCTransform(_linear_rpc())
    lon = np.array([115.1, 114.9, 115.3])
    lat = np.array([4.05, 3.9, 4.2])
    sx, sy = t.forward(lon, lat)
    L = (lon - 115.0) / 0.5
    P = (lat - 4.0) / 0.4
    assert np.allclose(sx, (10 + 100 * L - 5 * P) * 5000 + 5000, atol=1e-6)
    assert np.allclose(sy, (20 - 80 * P + 3 * L) * 4000 + 4000, atol=1e-6)
    blon, blat = t.inverse(sx, sy)
    assert np.allclose(blon, lon, atol=1e-9)
    assert np.allclose(blat, lat, atol=1e-9)


def test_rpc_rejects_malformed_metadata():
    rpc = _linear_rpc(); rpc.pop("LAT_OFF")
    with pytest.raises(ValueError, match="missing"):
        RPCTransform(rpc)


def test_warp_image_transform_matches_geotransform_warp():
    """Order-1 GCPs sampled from a pure-scaling geotransform: the GCP warp
    and the geotransform warp produce the same nearest-neighbor output."""
    from gdal_ray.geo import affine as A
    from gdal_ray.raster.warp import warp_image_transform

    img = (np.arange(30 * 40, dtype=np.int64) % 251).reshape(30, 40)
    gt = (1000.0, 2.0, 0.0, 2000.0, 0.0, -2.0)
    rng = np.random.default_rng(11)
    px = rng.uniform(0, 40, 10)
    py = rng.uniform(0, 30, 10)
    gx, gy = A.apply_geotransform(gt, px, py)
    t = GCPPolynomial(np.stack([px, py, gx, gy], axis=1), order=1)
    out, dst_gt = warp_image_transform(img, t, resampling="nearest")
    # identical grid as the source footprint -> identity resample
    assert out.shape == img.shape
    assert (out == img).all()
    # bilinear path also runs and stays in range
    ob, _ = warp_image_transform(img, t, resampling="bilinear")
    assert ob.shape == img.shape and (ob >= 0).all() and (ob <= 250).all()
