"""LCC / Albers conic projection properties (geo/conic.py)."""

import numpy as np

from gdal_ray.geo import conic as CN

_LCC = (33.0, 45.0, 23.0, -96.0)
_AEA = (29.5, 45.5, 23.0, -96.0)

_A = 6378137.0
_E2 = (1.0 / 298.257223563) * (2.0 - 1.0 / 298.257223563)


def _grid():
    lat, lon = np.meshgrid(np.linspace(-70, 75, 12), np.linspace(-170, 170, 15))
    return lat.ravel(), lon.ravel()


def test_lcc_roundtrip_identity():
    lat, lon = _grid()
    x, y = CN.lcc_forward(lat, lon, *_LCC)
    lat2, lon2 = CN.lcc_inverse(x, y, *_LCC)
    assert np.abs(lat2 - lat).max() < 1e-9
    assert np.abs(lon2 - lon).max() < 1e-9


def test_albers_roundtrip_identity():
    lat, lon = _grid()
    x, y = CN.albers_forward(lat, lon, *_AEA)
    lat2, lon2 = CN.albers_inverse(x, y, *_AEA)
    assert np.abs(lat2 - lat).max() < 1e-8
    assert np.abs(lon2 - lon).max() < 1e-8


def _parallel_radius(lat_deg):
    """Ellipsoidal radius of the circle of latitude: N(phi) cos(phi)."""
    phi = np.deg2rad(lat_deg)
    n = _A / np.sqrt(1.0 - _E2 * np.sin(phi) ** 2)
    return n * np.cos(phi)


def test_lcc_scale_true_on_standard_parallels():
    """Conformal conic: scale factor along each standard parallel is 1;
    between them < 1; outside > 1 (Snyder's defining property)."""
    for sp, expect in ((33.0, 1.0), (45.0, 1.0)):
        d_lambda = 0.01
        x0, y0 = CN.lcc_forward(sp, -96.0, *_LCC)
        x1, y1 = CN.lcc_forward(sp, -96.0 + d_lambda, *_LCC)
        proj_len = float(np.hypot(x1 - x0, y1 - y0))
        true_len = _parallel_radius(sp) * np.deg2rad(d_lambda)
        assert abs(proj_len / true_len - expect) < 1e-6
    # between the parallels the cone cuts below the surface: k < 1
    x0, y0 = CN.lcc_forward(39.0, -96.0, *_LCC)
    x1, y1 = CN.lcc_forward(39.0, -95.99, *_LCC)
    k_mid = float(np.hypot(x1 - x0, y1 - y0)) / (_parallel_radius(39.0) * np.deg2rad(0.01))
    assert k_mid < 1.0
    x0, y0 = CN.lcc_forward(60.0, -96.0, *_LCC)
    x1, y1 = CN.lcc_forward(60.0, -95.99, *_LCC)
    k_out = float(np.hypot(x1 - x0, y1 - y0)) / (_parallel_radius(60.0) * np.deg2rad(0.01))
    assert k_out > 1.0


def test_albers_preserves_area():
    """Equal-area conic: projected quad area == ellipsoidal area element
    M(phi) N(phi) cos(phi) dphi dlambda, at any latitude."""
    for lat in (-40.0, 0.0, 23.0, 37.5, 60.0):
        d = 0.01
        corners_lat = np.array([lat, lat, lat + d, lat + d])
        corners_lon = np.array([-96.0, -96.0 + d, -96.0 + d, -96.0])
        x, y = CN.albers_forward(corners_lat, corners_lon, *_AEA)
        proj_area = 0.5 * abs(
            np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))
        )
        phi = np.deg2rad(lat + d / 2)
        sin2 = np.sin(phi) ** 2
        m_rad = _A * (1 - _E2) / (1 - _E2 * sin2) ** 1.5
        n_rad = _A / np.sqrt(1 - _E2 * sin2)
        true_area = m_rad * n_rad * np.cos(phi) * np.deg2rad(d) ** 2
        assert abs(proj_area / true_area - 1.0) < 1e-5


def test_warp_through_lcc_roundtrip():
    """warp_image composes LCC through the 4326 pivot: a 3857 image warped
    to LCC and back lands on (almost) the original grid."""
    from gdal_ray.raster.warp import warp_image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (40, 40, 1), dtype=np.uint8)
    gt = (-10_000_000.0, 120.0, 0.0, 4_800_000.0, 0.0, -120.0)
    mid, mgt = warp_image(img, gt, "EPSG:3857", "LCC:33,45,23,-96")
    assert mid.shape[2] == 1 and mid.size > 0
    back, bgt = warp_image(
        mid, mgt, "LCC:33,45,23,-96", "EPSG:3857",
        dst_gt=gt, dst_w=40, dst_h=40,
    )
    # nearest-neighbour double warp: interior agrees on most pixels
    inner = (slice(4, -4), slice(4, -4), 0)
    match = (back[inner] == img[inner]).mean()
    assert match > 0.85
