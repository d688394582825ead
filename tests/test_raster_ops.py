"""Rasterize / polygonize kernels + Ray round-trip stage vs fixture oracle."""

import numpy as np
import pyarrow.parquet as pq

from gdal_ray.raster.polygonize import polygonize_array
from gdal_ray.raster.rasterize import rasterize_polygon_px, rasterize_wkb
from gdal_ray.geo import wkb as W


def test_rasterize_center_rule_square():
    out = np.zeros((10, 10), np.int32)
    rasterize_polygon_px(out, [np.array([[2, 2], [8, 2], [8, 8], [2, 8]], float)], 5)
    want = np.zeros((10, 10), np.int32)
    want[2:8, 2:8] = 5
    assert (out == want).all()


def test_rasterize_merge_add():
    out = np.zeros((6, 6), np.int32)
    sq = [np.array([[1, 1], [5, 1], [5, 5], [1, 5]], float)]
    rasterize_polygon_px(out, sq, 2, merge_alg="add")
    rasterize_polygon_px(out, sq, 3, merge_alg="add")
    assert (out[1:5, 1:5] == 5).all() and out[0].sum() == 0


def test_rasterize_wkb_with_geotransform():
    gt = (100.0, 10.0, 0.0, 200.0, 0.0, -10.0)
    ring = np.array([[120, 180], [160, 180], [160, 140], [120, 140]], float)
    out = np.zeros((10, 10), np.int32)
    rasterize_wkb(out, W.encode_polygon([ring]), gt, 1)
    assert out.sum() == 16  # 4x4 pixel block


def test_polygonize_rasterize_random_roundtrips():
    rng = np.random.default_rng(11)
    for _ in range(25):
        a = rng.integers(0, 4, (int(rng.integers(8, 48)), int(rng.integers(8, 48)))).astype(
            np.int32
        )
        polys = polygonize_array(a, nodata=0)
        back = np.zeros_like(a)
        for p in polys:
            rasterize_polygon_px(back, p["rings"], int(p["value"]))
        assert (back == a).all()


def test_polygonize_applies_geotransform():
    a = np.zeros((4, 4), np.int32)
    a[1:3, 1:3] = 9
    gt = (1000.0, 5.0, 0.0, 2000.0, 0.0, -5.0)
    polys = polygonize_array(a, gt=gt, nodata=0)
    assert len(polys) == 1
    ring = polys[0]["rings"][0]
    assert ring[:, 0].min() == 1000.0 + 5.0 and ring[:, 1].max() == 2000.0 - 5.0


def test_roundtrip_stage_matches_oracle(corpus, ray_session):
    from gdal_ray.sources import corpus as SRC
    from gdal_ray.stages.raster import roundtrip_batch

    got = (
        SRC.read_rasters(corpus)
        .map_batches(roundtrip_batch, batch_format="pyarrow")
        .to_pandas()
        .set_index("raster_id")
        .sort_index()
    )
    want = (
        pq.read_table(f"{corpus}/oracle_raster_roundtrip.parquet")
        .to_pandas()
        .set_index("raster_id")
        .sort_index()
    )
    assert got["roundtrip_exact"].all()
    assert (got["n_regions"] == want["n_regions"]).all()
    assert (got["checksum"] == want["checksum"]).all()
    for rid in want.index:
        assert list(got.loc[rid, "pixel_counts"]) == list(want.loc[rid, "pixel_counts"])


def test_warp_area_query_matches_direct(ray_session):
    """q_warp_area pipeline rows == single-process recompute (decode +
    warp_image_area average/med per image) for the sf0.001 corpus."""
    from gdal_ray.io import codec as C
    from gdal_ray.pipelines.corpus_queries import corpus_for_sf
    from gdal_ray.pipelines.rasterq import q_warp_area
    from gdal_ray.raster.checksum import checksum_image
    from gdal_ray.raster.warp import suggest_output_grid, warp_image_area

    got = q_warp_area("/root/testdata/sf0.001").to_pandas() \
        .set_index("image_id").sort_index()
    assert len(got) > 0

    d = corpus_for_sf("/root/testdata/sf0.001")
    imgs = pq.read_table(f"{d}/images.parquet").to_pandas()
    pls = pq.read_table(f"{d}/placements.parquet").to_pandas() \
        .set_index("image_id")
    checked = 0
    for _, r in imgs.iterrows():
        if checked >= 5 or r["image_id"] not in got.index:
            continue
        pl = pls.loc[r["image_id"]]
        if pl["srs"] != "EPSG:4326":
            continue
        img = C.decode_image(r["bytes"], r["fmt"])
        gt = tuple(float(v) for v in pl["gt"])
        h, w = img.shape[:2]
        ogt, dw, dh = suggest_output_grid(gt, w, h, "EPSG:4326", "EPSG:3857")
        gt2 = (ogt[0], ogt[1] * 2, ogt[2], ogt[3], ogt[4], ogt[5] * 2)
        dw2, dh2 = max(1, dw // 2), max(1, dh // 2)
        avg, _ = warp_image_area(img[:, :, 0], gt, "EPSG:4326", "EPSG:3857",
                                 dst_gt=gt2, dst_w=dw2, dst_h=dh2,
                                 op="average")
        med, _ = warp_image_area(img[:, :, 0], gt, "EPSG:4326", "EPSG:3857",
                                 dst_gt=gt2, dst_w=dw2, dst_h=dh2, op="med")
        row = got.loc[r["image_id"]]
        assert (row["dst_w"], row["dst_h"]) == (dw2, dh2)
        assert row["avg_cksum"] == checksum_image(avg)
        assert row["med_cksum"] == checksum_image(med)
        checked += 1
    assert checked >= 3
