"""Unit oracles for the multidim view module and the VRT-mosaic kernel."""

import numpy as np
import pytest

from gdal_ray.raster.kernels import mosaic_arrays
from gdal_ray.raster.mdim import MDArray


def test_mdim_view_matches_numpy_fuzz():
    rng = np.random.default_rng(7)
    checked = 0
    for _ in range(200):
        shape = tuple(int(x) for x in rng.integers(2, 9, size=int(rng.integers(2, 5))))
        a = rng.integers(0, 100, size=shape)
        m, ref = MDArray(a), a
        for _step in range(int(rng.integers(1, 4))):
            nd = ref.ndim
            if nd <= 1:
                break
            if rng.random() < 0.4:
                axes = tuple(int(x) for x in rng.permutation(nd))
                m, ref = m.transpose(axes), np.transpose(ref, axes)
            else:
                sl = []
                for d in range(nd):
                    n = ref.shape[d]
                    if n == 0:
                        sl.append(slice(0, 0))
                    elif nd - sum(isinstance(s, int) for s in sl) > 1 and rng.random() < 0.15:
                        sl.append(int(rng.integers(0, n)))
                    else:
                        st = int(rng.integers(0, n))
                        sp = int(rng.integers(st, n + 1))
                        sl.append(slice(st, sp, int(rng.integers(1, 4))))
                m, ref = m.view(*sl), ref[tuple(sl)]
        if ref.ndim == 0:
            continue
        got = m.read()
        assert got.shape == ref.shape
        assert np.array_equal(got, ref)
        checked += 1
    assert checked > 100


def test_mdim_view_is_lazy():
    a = np.arange(2 * 3 * 4).reshape(2, 3, 4)
    v = MDArray(a).view(slice(0, 2), slice(1, 3)).transpose((2, 0, 1))
    assert v.base is a  # no copy until read()
    assert v.shape == (4, 2, 2)


def test_mdim_reduce():
    a = np.arange(24).reshape(2, 3, 4)
    v = MDArray(a).transpose((1, 2, 0))
    assert np.array_equal(v.reduce("max", axis=2), a.max(axis=0))
    assert np.array_equal(v.reduce("sum", axis=2), a.sum(axis=0))


def test_mdim_bad_args():
    a = np.zeros((2, 3))
    with pytest.raises(ValueError):
        MDArray(a).transpose((0, 0))
    with pytest.raises(ValueError):
        MDArray(a).view(slice(None, None, -1))
    with pytest.raises(IndexError):
        MDArray(a).view(5)


def test_mosaic_last_wins_on_valid():
    s0 = np.full((2, 2), 9)
    s1 = np.array([[0, 4], [4, 0]])  # zeros are nodata -> do not overwrite
    out = mosaic_arrays((3, 3), [s0, s1], [(0, 0), (0, 0)], nodata=0)
    assert np.array_equal(out, np.array([[9, 4, 0], [4, 9, 0], [0, 0, 0]]))


def test_mosaic_clips_sources_off_canvas():
    src = np.arange(1, 7).reshape(2, 3)
    out = mosaic_arrays((3, 3), [src], [(2, -1)], nodata=0)
    # only the first source row's columns 1..2 land on canvas row 2
    assert np.array_equal(out[2], np.array([2, 3, 0]))
    assert out[:2].sum() == 0


def test_mosaic_paint_order():
    a = np.full((1, 1), 5)
    b = np.full((1, 1), 7)
    assert mosaic_arrays((1, 1), [a, b], [(0, 0), (0, 0)])[0, 0] == 7
    assert mosaic_arrays((1, 1), [b, a], [(0, 0), (0, 0)])[0, 0] == 5


def test_mdim_resampled_matches_kernels():
    """GetResampled analogue: last-2-dim resample per leading slice, equal
    to the shared raster kernels; composes with transpose/view lazily."""
    import numpy as np

    from gdal_ray.raster.kernels import resample_bilinear, resample_nearest
    from gdal_ray.raster.mdim import MDArray

    rng = np.random.default_rng(5)
    base = rng.integers(0, 251, (3, 12, 16)).astype(np.int64)
    md = MDArray(base)
    rs = md.resampled(6, 8, "nearest")
    assert rs.shape == (3, 6, 8)
    for t in range(3):
        assert (rs.read()[t] == resample_nearest(base[t], 6, 8)).all()
    rb = md.resampled(24, 32, "bilinear")
    assert rb.shape == (3, 24, 32)
    assert (rb.read()[1] == resample_bilinear(base[1], 24, 32)).all()
    # composes: slice a view first, resample the window, transpose after
    win = md.view(slice(1, 3), slice(2, 10), slice(4, 12)).resampled(4, 4)
    assert win.shape == (2, 4, 4)
    assert (win.transpose((1, 0, 2)).read() ==
            np.transpose(win.read(), (1, 0, 2))).all()
    import pytest

    with pytest.raises(ValueError, match="unsupported"):
        md.resampled(4, 4, "sinc")


def test_q_mosaic_matches_single_process_oracle(ray_session):
    """The fused+shuffled corpus mosaic (rasterq.q_mosaic) must equal a
    single-process replay: same tile partition, same image_id paint order,
    same last-wins-on-valid semantics (frmts/vrt/vrtsources.cpp)."""
    import pyarrow.parquet as pq

    from gdal_ray.geo import mercator as M
    from gdal_ray.io import codec as C
    from gdal_ray.pipelines.corpus_queries import corpus_for_sf
    from gdal_ray.pipelines.rasterq import q_mosaic
    from gdal_ray.raster.checksum import checksum_image

    sf = "/root/testdata/sf0.001"
    level, canvas = 8, 64
    got = q_mosaic(sf, level=level, canvas=canvas).to_pandas()
    got = got.sort_values(["x", "y"]).reset_index(drop=True)

    d = corpus_for_sf(sf)
    imgs = pq.read_table(f"{d}/images.parquet",
                         columns=["image_id", "bytes", "fmt"]).to_pydict()
    plc = pq.read_table(f"{d}/placements.parquet").to_pydict()
    gt_by_id = {i: g for i, g, s in zip(plc["image_id"], plc["gt"], plc["srs"])
                if s == "EPSG:3857"}
    n = 1 << level
    span = 2 * M.ORIGIN_SHIFT / n
    res = span / canvas
    tiles = {}
    order = sorted(range(len(imgs["image_id"])),
                   key=lambda i: imgs["image_id"][i])
    for i in order:
        iid = imgs["image_id"][i]
        if iid not in gt_by_id:
            continue
        x0, px, _, y0, _, npy = gt_by_id[iid]
        py = -npy
        band = C.decode_image(imgs["bytes"][i], imgs["fmt"][i])
        band = band[:, :, 0] if band.ndim == 3 else band
        h, w = band.shape
        tx0 = int(np.floor((x0 + M.ORIGIN_SHIFT) / span))
        tx1 = int(np.floor((x0 + px * w + M.ORIGIN_SHIFT) / span))
        ty0 = int(np.floor((y0 - py * h + M.ORIGIN_SHIFT) / span))
        ty1 = int(np.floor((y0 + M.ORIGIN_SHIFT) / span))
        for ty in range(max(ty0, 0), min(ty1, n - 1) + 1):
            for tx in range(max(tx0, 0), min(tx1, n - 1) + 1):
                gx = tx * span - M.ORIGIN_SHIFT + (np.arange(canvas) + 0.5) * res
                gy = ty * span - M.ORIGIN_SHIFT + (np.arange(canvas) + 0.5) * res
                sx = np.floor((gx - x0) / px).astype(np.int64)
                sy = np.floor((y0 - gy) / py).astype(np.int64)
                iy = np.flatnonzero((sy >= 0) & (sy < h))
                ix = np.flatnonzero((sx >= 0) & (sx < w))
                if not (len(iy) and len(ix)):
                    continue
                part = np.zeros((canvas, canvas), dtype=np.int32)
                part[np.ix_(iy, ix)] = band[np.ix_(sy[iy], sx[ix])].astype(np.int32)
                if not part.any():
                    continue
                key = (tx, ty)
                cv, srcs = tiles.get(key, (np.zeros((canvas, canvas), np.int32), 0))
                m = part != 0
                cv[m] = part[m]
                tiles[key] = (cv, srcs + 1)
    assert len(got) == len(tiles)
    for _, row in got.iterrows():
        cv, srcs = tiles[(row["x"], row["y"])]
        assert row["n_sources"] == srcs
        assert row["filled_px"] == int((cv != 0).sum())
        assert row["cksum"] == checksum_image(cv)
