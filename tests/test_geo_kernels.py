"""Vectorized geo kernels vs independent scalar oracle implementations."""

import numpy as np
import pytest

from gdal_ray.fixtures import oracle as O
from gdal_ray.geo import affine as A
from gdal_ray.geo import cells as CL
from gdal_ray.geo import mercator as M
from gdal_ray.geo import pip as P
from gdal_ray.geo import wkb as W


def test_mercator_constants():
    assert M.ORIGIN_SHIFT == pytest.approx(20037508.342789244, abs=1e-6)
    assert M.INITIAL_RESOLUTION == pytest.approx(156543.03392804062, abs=1e-8)


def test_latlon_to_meters_matches_scalar():
    rng = np.random.default_rng(1)
    lat = rng.uniform(-85, 85, 500)
    lon = rng.uniform(-180, 180, 500)
    mx, my = M.latlon_to_meters(lat, lon)
    for i in range(0, 500, 17):
        sx, sy = O.merc_latlon_to_meters(lat[i], lon[i])
        # numpy's log/tan may differ from libm's in the final ulp
        assert mx[i] == pytest.approx(sx, rel=1e-14)
        assert my[i] == pytest.approx(sy, rel=1e-14)


def test_meters_to_tile_matches_scalar_including_seams():
    rng = np.random.default_rng(2)
    mx = rng.uniform(-M.ORIGIN_SHIFT, M.ORIGIN_SHIFT, 300)
    my = rng.uniform(-M.ORIGIN_SHIFT, M.ORIGIN_SHIFT, 300)
    # exact-seam cases: coordinates landing exactly on tile boundaries
    seam = np.array([0.0, M.ORIGIN_SHIFT / 2, -M.ORIGIN_SHIFT / 2])
    mx = np.concatenate([mx, seam])
    my = np.concatenate([my, seam])
    for z in (0, 3, 8, 12):
        tx, ty = M.meters_to_tile(mx, my, z)
        for i in range(len(mx)):
            sx, sy = O.merc_meters_to_tile_tms(float(mx[i]), float(my[i]), z)
            assert (tx[i], ty[i]) == (sx, sy)


def test_pixels_to_tile_seam_rule():
    # ceil(px/256)-1: exact multiples belong to the lower tile
    tx, _ = M.pixels_to_tile(np.array([0.0, 255.9999, 256.0, 256.0001, 512.0]), np.zeros(5))
    assert tx.tolist() == [-1, 0, 0, 1, 1]


def test_xyz_flip_involution():
    z = 7
    ty = np.arange(2**z)
    assert (M.tms_to_xyz(M.tms_to_xyz(ty, z), z) == ty).all()


def test_affine_invert_axis_aligned_and_rotated():
    for gt in [(10.0, 2.5, 0.0, 50.0, 0.0, -2.5), (10.0, 2.0, 0.7, 50.0, 0.3, -2.0)]:
        inv = A.invert_geotransform(gt)
        px = np.array([0.0, 3.5, 100.25])
        ln = np.array([0.0, -7.5, 42.0])
        gx, gy = A.apply_geotransform(gt, px, ln)
        rx, ry = A.apply_geotransform(inv, gx, gy)
        np.testing.assert_allclose(rx, px, atol=1e-9)
        np.testing.assert_allclose(ry, ln, atol=1e-9)


def test_affine_singular_returns_none():
    assert A.invert_geotransform((0, 0, 0, 0, 0, 0)) is None


def test_pip_vectorized_matches_scalar_random():
    rng = np.random.default_rng(3)
    for trial in range(20):
        npt = int(rng.integers(4, 12))
        ang = np.sort(rng.uniform(0, 2 * np.pi, npt))
        rad = rng.uniform(0.5, 2.0, npt)
        ring = np.stack([np.cos(ang) * rad, np.sin(ang) * rad], axis=1)
        ring = np.vstack([ring, ring[:1]])
        px = rng.uniform(-2.5, 2.5, 200)
        py = rng.uniform(-2.5, 2.5, 200)
        vec = P.points_in_ring(px, py, ring)
        ring_l = ring.tolist()
        for i in range(200):
            assert vec[i] == O.point_in_ring_scalar(px[i], py[i], ring_l), (trial, i)


def test_pip_boundary_edge_cases():
    # unit square: GDAL's strict >0 crossing rule
    ring = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)
    cases = [
        ((0.5, 0.5), True),  # interior
        ((0.0, 0.5), True),  # on left edge: ray crosses right edge once
        ((1.0, 0.5), False),  # on right edge: intersection at 0 not counted
        ((0.5, 0.0), True),  # on bottom edge (vertex rule)
        ((0.5, 1.0), False),  # on top edge
        ((-0.1, 0.5), False),
    ]
    for (x, y), want in cases:
        got = bool(P.points_in_ring(np.array([x]), np.array([y]), ring)[0])
        scal = O.point_in_ring_scalar(x, y, ring.tolist())
        assert got == scal == want, (x, y, got, scal, want)


def test_polygon_with_hole():
    outer = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    hole = np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], float)
    px = np.array([0.5, 2.0, 3.5])
    py = np.array([0.5, 2.0, 3.5])
    res = P.points_in_polygon_rings(px, py, [outer, hole])
    assert res.tolist() == [True, False, True]


def test_wkb_roundtrip_and_envelope():
    ring = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    blob = W.encode_polygon([ring])
    polys = W.decode_polygons(blob)
    assert len(polys) == 1 and polys[0][0].shape == (5, 2)
    assert W.wkb_envelope(blob) == (0.0, 0.0, 2.0, 2.0)
    # big-endian read
    import struct

    be = struct.pack(">BI", 0, 1) + struct.pack(">dd", 1.5, -2.5)
    xs, ys = W.decode_points([be])
    assert xs[0] == 1.5 and ys[0] == -2.5


def test_cells_pack_unpack_and_kring():
    c = CL.cell_id(7, 100, 63)
    z, x, y = CL.cell_to_xyz(c)
    assert (int(z), int(x), int(y)) == (7, 100, 63)
    ring = CL.k_ring(int(np.asarray(c)), 1)
    assert len(ring) == 9
    # pole clamp: y=0 row has only 6 neighbors
    ring = CL.k_ring(int(np.asarray(CL.cell_id(7, 5, 0))), 1)
    assert len(ring) == 6
    # antimeridian x wrap
    ring = CL.k_ring(int(np.asarray(CL.cell_id(3, 0, 4))), 1)
    xs = sorted(int(v) for v in CL.cell_to_xyz(ring)[1])
    assert 7 in xs  # wrapped


def test_utm_roundtrip_and_meridian_arc():
    """Karney-series UTM: round-trip closure at machine precision; on the
    central meridian E = 500000 exactly and N = k0 * meridian arc length
    (independent numerical integration of the meridian curvature radius)."""
    from gdal_ray.geo import tmerc as T

    rng = np.random.default_rng(11)
    lat = rng.uniform(-80, 80, 500)
    lon0 = T.utm_zone_lon0(31)
    lon = lon0 + rng.uniform(-3, 3, 500)
    E, N = T.latlon_to_utm(lat, lon, 31)
    lat2, lon2 = T.utm_to_latlon(E, N, 31)
    np.testing.assert_allclose(lat2, lat, atol=1e-11)
    np.testing.assert_allclose(lon2, lon, atol=1e-11)

    lats = np.array([10.0, 40.0, 60.0])
    E, N = T.latlon_to_utm(lats, np.full(3, lon0), 31)
    np.testing.assert_allclose(E, 500000.0, atol=1e-7)
    a, e2 = 6378137.0, 0.00669437999014132
    for latv, n in zip(lats, N):
        phi = np.linspace(0, np.deg2rad(latv), 100001)
        M_ = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
        arc = np.trapz(M_, phi)
        assert abs(n - 0.9996 * arc) < 1e-3

    # southern-hemisphere false northing + published example (CN Tower,
    # zone 17: 630084 E, 4833439 N to the meter)
    E, N = T.latlon_to_utm(np.array([43.642567]), np.array([-79.387139]), 17)
    assert abs(E[0] - 630084) < 30 and abs(N[0] - 4833439) < 30
    Es, Ns = T.latlon_to_utm(np.array([-33.9]), np.array([18.4]), 34, south=True)
    assert 0 < Ns[0] < 10000000


def test_warp_utm_to_4326_roundtrip():
    """The gdalwarp bench pair (32631 -> 4326): warping a constant-value
    image preserves values; warping forth and back preserves the gradient
    image within nearest-neighbour tolerance."""
    from gdal_ray.raster.warp import warp_image

    img = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64, 1) % 251
    gt = (500000.0 - 320, 10.0, 0.0, 4427757.0 + 320, 0.0, -10.0)
    out, ogt = warp_image(img, gt, "EPSG:32631", "EPSG:4326")
    assert out.shape[0] == 64 and out.shape[1] == 64
    # round-trip back to UTM on the same grid
    back, _ = warp_image(out, ogt, "EPSG:4326", "EPSG:32631",
                         dst_gt=gt, dst_w=64, dst_h=64)
    inner = slice(2, -2)
    diff = back[inner, inner, 0].astype(int) - img[inner, inner, 0].astype(int)
    # nearest-neighbour round trip: almost all pixels identical, none far off
    assert (diff == 0).mean() > 0.6
    assert np.abs(diff).max() <= 5


def test_warp_cubic_lanczos_constant_invariance():
    from gdal_ray.raster.warp import warp_image

    img = np.full((40, 40, 3), 123, dtype=np.uint8)
    gt = (500000.0 - 200, 10.0, 0.0, 4427757.0 + 200, 0.0, -10.0)
    for rs in ("cubic", "lanczos"):
        out, _ = warp_image(img, gt, "EPSG:32631", "EPSG:4326", resampling=rs)
        core = out[out[:, :, 0] > 0]
        assert core.size and (core == 123).all(), rs
