"""GlobalGeodetic tile profile (gdal2tiles -p geodetic;
``osgeo_utils/gdal2tiles.py:534`` GlobalGeodetic).

Plate-Carree EPSG:4326 tiling: lon/lat are used directly as planar XY,
[-180,-90,180,90] scales to a 512x256 (tmscompatible, 2 tiles at level
0 — the OSGeo TMS spec) or 256x256 (OpenLayers/WMTS, 1 tile) level-0
pyramid. Tile ownership uses the same ``ceil(px/tile) - 1`` seam rule as
the mercator profile; ty is TMS (origin bottom-left), XYZ flips with
``2**zoom - 1 - ty`` (tmscompatible).

All functions are vectorized over numpy arrays and mirror the reference
operation-for-operation so tile ids are bit-exact.
"""

from __future__ import annotations

import numpy as np

__all__ = ["resolution_geodetic", "lonlat_to_pixels_geodetic",
           "pixels_to_tile", "lonlat_to_tile_geodetic",
           "tile_bounds_geodetic", "zoom_for_pixel_size_geodetic"]

MAXZOOMLEVEL = 32


def _res_fact(tms_compatible: bool, tile_size: int) -> float:
    return (180.0 if tms_compatible else 360.0) / tile_size


def resolution_geodetic(zoom: int, tms_compatible: bool = True,
                        tile_size: int = 256) -> float:
    """Degrees per pixel at ``zoom`` (gdal2tiles Resolution)."""
    return _res_fact(tms_compatible, tile_size) / 2**zoom


def lonlat_to_pixels_geodetic(lon, lat, zoom: int,
                              tms_compatible: bool = True,
                              tile_size: int = 256):
    """lon/lat -> pyramid pixel coordinates (LonLatToPixels)."""
    res = _res_fact(tms_compatible, tile_size) / 2**zoom
    return (180.0 + np.asarray(lon, np.float64)) / res, \
           (90.0 + np.asarray(lat, np.float64)) / res


def pixels_to_tile(px, py, tile_size: int = 256):
    """ceil(px/tile) - 1 seam rule (PixelsToTile, shared with mercator)."""
    tx = np.ceil(np.asarray(px, np.float64) / float(tile_size)).astype(
        np.int64) - 1
    ty = np.ceil(np.asarray(py, np.float64) / float(tile_size)).astype(
        np.int64) - 1
    return tx, ty


def lonlat_to_tile_geodetic(lon, lat, zoom: int,
                            tms_compatible: bool = True,
                            tile_size: int = 256):
    """lon/lat -> (tx, ty_tms) tile ids (LonLatToTile)."""
    px, py = lonlat_to_pixels_geodetic(lon, lat, zoom, tms_compatible,
                                       tile_size)
    return pixels_to_tile(px, py, tile_size)


def tile_bounds_geodetic(tx, ty, zoom: int, tms_compatible: bool = True,
                         tile_size: int = 256):
    """(minlon, minlat, maxlon, maxlat) of a TMS tile (TileBounds)."""
    res = _res_fact(tms_compatible, tile_size) / 2**zoom
    tx = np.asarray(tx, np.float64)
    ty = np.asarray(ty, np.float64)
    return (tx * tile_size * res - 180.0, ty * tile_size * res - 90.0,
            (tx + 1) * tile_size * res - 180.0,
            (ty + 1) * tile_size * res - 90.0)


def zoom_for_pixel_size_geodetic(pixel_size: float,
                                 tms_compatible: bool = True,
                                 tile_size: int = 256) -> int:
    """Maximal scaledown zoom closest to pixel_size (ZoomForPixelSize)."""
    for i in range(MAXZOOMLEVEL):
        if pixel_size > resolution_geodetic(i, tms_compatible, tile_size):
            return max(0, i - 1)
    return MAXZOOMLEVEL - 1
