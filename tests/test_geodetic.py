"""GlobalGeodetic profile (geo/geodetic.py): reference-formula replicas
(gdal2tiles.py:534) plus pinned corner/seam cases."""

import math

import numpy as np

from gdal_ray.geo.geodetic import (lonlat_to_pixels_geodetic,
                                   lonlat_to_tile_geodetic,
                                   resolution_geodetic,
                                   tile_bounds_geodetic,
                                   zoom_for_pixel_size_geodetic)


def _ref_tile(lon, lat, zoom, tms):
    res = (180.0 if tms else 360.0) / 256 / 2**zoom
    px = (180 + lon) / res
    py = (90 + lat) / res
    return (int(math.ceil(px / 256.0) - 1), int(math.ceil(py / 256.0) - 1))


def test_matches_reference_formula_random():
    rng = np.random.default_rng(9)
    lon = rng.uniform(-179.999, 179.999, 500)
    lat = rng.uniform(-89.999, 89.999, 500)
    for tms in (True, False):
        for z in (0, 3, 7):
            tx, ty = lonlat_to_tile_geodetic(lon, lat, z, tms)
            want = [_ref_tile(a, b, z, tms) for a, b in zip(lon, lat)]
            assert tx.tolist() == [w[0] for w in want]
            assert ty.tolist() == [w[1] for w in want]


def test_level0_pyramid_shape():
    # tmscompatible: 2x1 tiles at z0; WMTS variant: 1x1
    tx, ty = lonlat_to_tile_geodetic([-90.0, 90.0], [0.0, 0.0], 0, True)
    assert tx.tolist() == [0, 1] and ty.tolist() == [0, 0]
    tx2, _ = lonlat_to_tile_geodetic([-90.0, 90.0], [0.0, 0.0], 0, False)
    assert tx2.tolist() == [0, 0]


def test_seam_rule_and_bounds():
    # a point exactly on a tile boundary belongs to the LOWER tile
    # (ceil(px/256)-1 with px=256 -> tile 0)
    res0 = resolution_geodetic(0, True)
    lon_seam = -180.0 + 256 * res0  # px exactly 256
    tx, _ = lonlat_to_tile_geodetic([lon_seam], [0.0], 0, True)
    assert tx[0] == 0
    b = tile_bounds_geodetic(1, 0, 0, True)
    assert (b[0], b[1], b[2], b[3]) == (0.0, -90.0, 180.0, 90.0)


def test_zoom_for_pixel_size():
    assert zoom_for_pixel_size_geodetic(1.0) == 0
    z = zoom_for_pixel_size_geodetic(resolution_geodetic(5) * 1.01)
    assert z == 4  # "we don't want to scale up"
