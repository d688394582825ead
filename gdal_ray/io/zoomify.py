"""Zoomify tile-tree sink (gdal2tiles Zoomify class analogue,
``osgeo_utils/gdal2tiles.py:633``).

Layout contract (mirrored exactly): tier sizes come from repeatedly
halving the image (``floor(size/2)``) until it fits one tile, tiers
ordered smallest-first; a tile's global index is
``x + y * tierWidth[z] + tileCountUpToTier[z]`` and 256 consecutive
indices share a ``TileGroup{n}`` directory; filenames are
``{z}-{x}-{y}.{ext}`` plus an ``ImageProperties.xml`` manifest.

NB: the reference's constructor has a latent bug —
``self.tileCountUpToTier = []`` followed by
``self.tileCountUpToTier[0] = 0`` raises IndexError — so this module
implements the documented INTENDED cumulative-count semantics (start at
0, add each tier's tile count).

Tier images downsample with nearest-neighbour (deterministic,
dtype-preserving); the tree for one raster is bounded, so the writer is
a driver-side sink like the engine's other single-document writers.
"""

from __future__ import annotations

import math
import os

import numpy as np

__all__ = ["ZoomifyLayout", "write_zoomify"]


class ZoomifyLayout:
    def __init__(self, width: int, height: int, tile_size: int = 256):
        self.tile_size = tile_size
        imagesize = (width, height)
        tiles = (math.ceil(width / tile_size), math.ceil(height / tile_size))
        self.tierSizeInTiles = [tiles]
        self.tierImageSize = [imagesize]
        while imagesize[0] > tile_size or imagesize[1] > tile_size:
            imagesize = (math.floor(imagesize[0] / 2),
                         math.floor(imagesize[1] / 2))
            tiles = (math.ceil(imagesize[0] / tile_size),
                     math.ceil(imagesize[1] / tile_size))
            self.tierSizeInTiles.append(tiles)
            self.tierImageSize.append(imagesize)
        self.tierSizeInTiles.reverse()
        self.tierImageSize.reverse()
        self.numberOfTiers = len(self.tierSizeInTiles)
        self.tileCountUpToTier = [0]
        for i in range(1, self.numberOfTiers + 1):
            self.tileCountUpToTier.append(
                self.tierSizeInTiles[i - 1][0] * self.tierSizeInTiles[i - 1][1]
                + self.tileCountUpToTier[i - 1])

    @property
    def num_tiles(self) -> int:
        return self.tileCountUpToTier[self.numberOfTiers]

    def tile_filename(self, x: int, y: int, z: int,
                      fmt: str = "png") -> str:
        idx = (x + y * self.tierSizeInTiles[z][0]
               + self.tileCountUpToTier[z])
        return os.path.join("TileGroup%.0f" % math.floor(idx / 256),
                            f"{z}-{x}-{y}.{fmt}")


def write_zoomify(img: np.ndarray, out_dir: str,
                  tile_size: int = 256) -> dict:
    """(H, W[, bands]) array -> Zoomify tree under ``out_dir``. Returns
    {"tiers": n, "tiles": total}."""
    from gdal_ray.io.codec import encode_png
    from gdal_ray.raster.kernels import resample_nearest

    h, w = img.shape[:2]
    layout = ZoomifyLayout(w, h, tile_size)
    os.makedirs(out_dir, exist_ok=True)
    for z in range(layout.numberOfTiers):
        tw, th = layout.tierImageSize[z]
        tier = (img if (tw, th) == (w, h)
                else resample_nearest(img, th, tw))
        nx, ny = layout.tierSizeInTiles[z]
        for y in range(ny):
            for x in range(nx):
                tile = tier[y * tile_size:(y + 1) * tile_size,
                            x * tile_size:(x + 1) * tile_size]
                rel = layout.tile_filename(x, y, z)
                final = os.path.join(out_dir, rel)
                os.makedirs(os.path.dirname(final), exist_ok=True)
                tmp = final + ".tmp"
                with open(tmp, "wb") as fh:
                    fh.write(encode_png(np.ascontiguousarray(tile)))
                os.replace(tmp, final)
    xml = (f'<IMAGE_PROPERTIES WIDTH="{w}" HEIGHT="{h}" '
           f'NUMTILES="{layout.num_tiles}" NUMIMAGES="1" VERSION="1.8" '
           f'TILESIZE="{tile_size}"/>')
    with open(os.path.join(out_dir, "ImageProperties.xml"), "w") as fh:
        fh.write(xml)
    return {"tiers": layout.numberOfTiers, "tiles": layout.num_tiles}
