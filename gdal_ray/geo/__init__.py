"""Pure-NumPy geospatial kernels (no Ray dependency).

Everything here is vectorized over numpy arrays; semantics mirror the GDAL
reference formulas cited in each module so pipeline outputs can be compared
bit-for-bit against GDAL-derived oracles.
"""

from gdal_ray.geo.affine import apply_geotransform, invert_geotransform, pixel_to_geo_bbox
from gdal_ray.geo.mercator import (
    EARTH_RADIUS,
    ORIGIN_SHIFT,
    TILE_SIZE,
    latlon_to_meters,
    meters_to_latlon,
    meters_to_pixels,
    meters_to_tile,
    pixels_to_meters,
    pixels_to_tile,
    resolution,
    tile_bounds,
    tms_to_xyz,
)
from gdal_ray.geo.cells import cell_id, cell_to_xyz, k_ring, bbox_cover
from gdal_ray.geo.pip import points_in_ring, points_in_polygon_wkb

__all__ = [
    "apply_geotransform",
    "invert_geotransform",
    "pixel_to_geo_bbox",
    "EARTH_RADIUS",
    "ORIGIN_SHIFT",
    "TILE_SIZE",
    "latlon_to_meters",
    "meters_to_latlon",
    "meters_to_pixels",
    "meters_to_tile",
    "pixels_to_meters",
    "pixels_to_tile",
    "resolution",
    "tile_bounds",
    "tms_to_xyz",
    "cell_id",
    "cell_to_xyz",
    "k_ring",
    "bbox_cover",
    "points_in_ring",
    "points_in_polygon_wkb",
]
