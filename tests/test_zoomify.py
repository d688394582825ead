"""Zoomify sink (io/zoomify.py): layout math replica + tree checks."""

import math
import os

import numpy as np

from gdal_ray.io.codec import decode_png
from gdal_ray.io.zoomify import ZoomifyLayout, write_zoomify


def _ref_tiers(w, h, ts=256):
    """Straight transliteration of gdal2tiles.py:640-664 (with the
    intended cumulative-count fix)."""
    sizes = [(w, h)]
    tiles = [(math.ceil(w / ts), math.ceil(h / ts))]
    while sizes[-1][0] > ts or sizes[-1][1] > ts:
        sizes.append((math.floor(sizes[-1][0] / 2),
                      math.floor(sizes[-1][1] / 2)))
        tiles.append((math.ceil(sizes[-1][0] / ts),
                      math.ceil(sizes[-1][1] / ts)))
    return list(reversed(sizes)), list(reversed(tiles))


def test_layout_matches_reference_math():
    for w, h in ((1000, 700), (256, 256), (257, 256), (3000, 123)):
        lay = ZoomifyLayout(w, h)
        sizes, tiles = _ref_tiers(w, h)
        assert lay.tierImageSize == sizes
        assert lay.tierSizeInTiles == tiles
        cum = [0]
        for tx, ty in tiles:
            cum.append(cum[-1] + tx * ty)
        assert lay.tileCountUpToTier == cum


def test_tile_filename_groups():
    lay = ZoomifyLayout(9000, 9000)  # enough tiles to roll TileGroup1
    assert lay.tile_filename(0, 0, 0) == os.path.join("TileGroup0",
                                                      "0-0-0.png")
    names = [lay.tile_filename(x, y, lay.numberOfTiers - 1)
             for y in range(20) for x in range(20)]
    assert any("TileGroup1" in n for n in names)


def test_write_tree_and_top_tier_pixels(tmp_path):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (300, 520, 3), dtype=np.uint8)
    out = str(tmp_path / "zoom")
    info = write_zoomify(img, out)
    lay = ZoomifyLayout(520, 300)
    assert info == {"tiers": lay.numberOfTiers, "tiles": lay.num_tiles}
    assert os.path.exists(os.path.join(out, "ImageProperties.xml"))
    xml = open(os.path.join(out, "ImageProperties.xml")).read()
    assert 'WIDTH="520"' in xml and f'NUMTILES="{lay.num_tiles}"' in xml
    # top tier tile (0,0) reproduces the source crop exactly
    z = lay.numberOfTiers - 1
    tile = decode_png(open(os.path.join(
        out, lay.tile_filename(0, 0, z)), "rb").read())
    assert (np.asarray(tile)[:256, :256] == img[:256, :256]).all()
    # every expected tile file exists
    n_files = sum(len(fs) for _, _, fs in os.walk(out)) - 1  # minus xml
    assert n_files == lay.num_tiles
