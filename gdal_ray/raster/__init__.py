from gdal_ray.raster.checksum import checksum_image
from gdal_ray.raster.rasterize import rasterize_polygon_px, rasterize_wkb
from gdal_ray.raster.polygonize import polygonize_array

__all__ = ["checksum_image", "rasterize_polygon_px", "rasterize_wkb", "polygonize_array"]
