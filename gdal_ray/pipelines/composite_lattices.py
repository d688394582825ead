"""DuckDB-checkable oracles for the COMPOSITE raster pipelines.

Fourth wave of the lattice-oracle pattern (see ``raster_lattices.py``):
derived closed-form grids routed through the REAL kernels for the operator
families that previously had no SQL-checked driver query —

- warp/reproject (``raster/warp.warp_image`` nearest, 4326 -> 3857): the
  SQL twin replays suggest_output_grid (corner bbox — the edge samples'
  min/max equal the corner transforms exactly because the spherical
  mercator is monotone per axis and float monotone under nonneg adds) and
  the per-dst-pixel inverse chain. Audited: over 1000 keys every source
  pixel coordinate lands >= 0.48 from a floor boundary (the dst grid is
  the warped src grid, so pixels map back near half-integers), so a 1-ulp
  libm difference between numpy and DuckDB cannot flip any result.
- overview resample (``resample_average`` / ``resample_mode``, factor 2,
  gcore/overview.cpp AVERAGE + MODE): block sums are exact ints; the
  average's ``floor(s/4 + 0.5)`` is dyadic-exact on both sides; MODE ties
  resolve to the smallest value in both.
- mosaic (``mosaic_arrays``, gdalbuildvrt last-wins-on-valid painting).
- pansharpen (``pansharpen_brovey`` weighted Brovey with DYADIC weights
  0.25/0.25/0.5 and a 2x bilinear ms upsample whose weights are exact
  quarters — every float op is mirrored in order, so results are
  bit-identical without any transcendental involved).
- RAT (per-value attribute table, gcore/gdal_rat.cpp) with ``share`` as
  the raw c/n double (one correctly-rounded division on both sides).
- stack median (the multidim temporal composite; DuckDB ``median``
  interpolates even counts exactly like ``np.median``).
- multidim views (``raster/mdim.MDArray`` GetView slice + transpose +
  axis reduce; the twin replays the index arithmetic in SQL).

SCALE NOTE: the per-key Python loops here are GATE forms — they exist to
drive the kernels over ~100-row closed-form lattices the DuckDB twin can
replay. They are NOT the production path: corpus-scale warp / stats /
pansharpen / overview run through ``fused_image_apply``
(``pipelines/flagship.py``) inside the row-group read task (see
``pipelines/rasterq.py`` q_warp_*, q_resample_roundtrip, q_pansharpen),
where the payload never enters the object store and the batch loop is
one vectorized kernel call per image.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from gdal_ray.pipelines.raster_lattices import grid_dims, grid_for_key
from gdal_ray.sources.corpus import read_parquet_tight as _rpt

__all__ = [
    "q_warp_merc_lattice",
    "q_overview_lattice",
    "q_mosaic_lattice",
    "q_pansharpen_lattice",
    "q_rat_lattice",
    "q_stack_lattice",
    "q_mdim_lattice",
    "q_phash_lattice",
    "q_viewshed_lattice",
]


def _suppliers(sf_dir: str):
    return _rpt(os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey"])


# --------------------------------------------------------------------------
# Warp (nearest, EPSG:4326 -> EPSG:3857)
# --------------------------------------------------------------------------

def warp_params(k: int):
    """Per-key source placement: lon/lat origin + degree resolution."""
    lon0 = -150.0 + (k * 37 % 300)
    lat0 = 55.0 - (k * 17 % 110)
    res = 0.01 + (k % 4) * 0.005
    return lon0, lat0, res


def q_warp_merc_lattice(sf_dir: str):
    """gdalwarp -t_srs EPSG:3857 -r near of every derived 4326 grid through
    the real dst-driven warp kernel (apps/gdalwarp_lib.cpp:1414 plan);
    emits exact-integer dst stats + GDALChecksumImage."""
    from gdal_ray.raster.checksum import checksum_image
    from gdal_ray.raster.warp import warp_image

    def per_key(batch: pa.Table) -> pa.Table:
        out = {"img_id": [], "dst_w": [], "dst_h": [], "n_nonzero": [],
               "sum_val": [], "cksum": []}
        for k in batch["s_suppkey"].to_pylist():
            k = int(k)
            g = grid_for_key(k).astype(np.int32)
            lon0, lat0, res = warp_params(k)
            gt = (lon0, res, 0.0, lat0, 0.0, -res)
            dst, _ = warp_image(g, gt, "EPSG:4326", "EPSG:3857",
                                resampling="nearest", fill=0)
            out["img_id"].append(f"g{k:06d}")
            out["dst_w"].append(dst.shape[1])
            out["dst_h"].append(dst.shape[0])
            out["n_nonzero"].append(int((dst > 0).sum()))
            out["sum_val"].append(int(dst.sum()))
            out["cksum"].append(checksum_image(dst))
        return pa.table(
            {
                "img_id": pa.array(out["img_id"], pa.string()),
                "dst_w": pa.array(out["dst_w"], pa.int64()),
                "dst_h": pa.array(out["dst_h"], pa.int64()),
                "n_nonzero": pa.array(out["n_nonzero"], pa.int64()),
                "sum_val": pa.array(out["sum_val"], pa.int64()),
                "cksum": pa.array(out["cksum"], pa.int32()),
            }
        )

    return _suppliers(sf_dir).map_batches(per_key, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Overview resample (AVERAGE + MODE, factor 2)
# --------------------------------------------------------------------------

def q_overview_lattice(sf_dir: str):
    """Overview kernels (gcore/overview.cpp AVERAGE + MODE) at factor 2 on
    every derived grid; exact-integer sums + checksums of both pyramids."""
    from gdal_ray.raster.checksum import checksum_image
    from gdal_ray.raster.kernels import resample_average, resample_mode

    def per_key(batch: pa.Table) -> pa.Table:
        out = {"img_id": [], "ov_w": [], "ov_h": [], "sum_avg": [],
               "cksum_avg": [], "sum_mode": [], "cksum_mode": []}
        for k in batch["s_suppkey"].to_pylist():
            k = int(k)
            g = grid_for_key(k).astype(np.int64)
            avg = resample_average(g, 2)
            mode = resample_mode(g, 2)
            out["img_id"].append(f"g{k:06d}")
            out["ov_w"].append(avg.shape[1])
            out["ov_h"].append(avg.shape[0])
            out["sum_avg"].append(int(avg.sum()))
            out["cksum_avg"].append(checksum_image(avg))
            out["sum_mode"].append(int(mode.sum()))
            out["cksum_mode"].append(checksum_image(mode))
        return pa.table(
            {
                "img_id": pa.array(out["img_id"], pa.string()),
                "ov_w": pa.array(out["ov_w"], pa.int64()),
                "ov_h": pa.array(out["ov_h"], pa.int64()),
                "sum_avg": pa.array(out["sum_avg"], pa.int64()),
                "cksum_avg": pa.array(out["cksum_avg"], pa.int32()),
                "sum_mode": pa.array(out["sum_mode"], pa.int64()),
                "cksum_mode": pa.array(out["cksum_mode"], pa.int32()),
            }
        )

    return _suppliers(sf_dir).map_batches(per_key, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Mosaic (gdalbuildvrt painting)
# --------------------------------------------------------------------------

MOSAIC_CANVAS = (20, 20)
MOSAIC_SRC = (8, 10)  # (h, w)


def mosaic_source(k: int, s: int) -> np.ndarray:
    rr, cc = np.mgrid[0 : MOSAIC_SRC[0], 0 : MOSAIC_SRC[1]]
    return (k * 7 + s * 29 + rr * 13 + cc * 5) % 251


def mosaic_offset(k: int, s: int):
    return (k * 3 + s * 5) % 12, (k * 7 + s * 11) % 10  # (oy, ox)


def q_mosaic_lattice(sf_dir: str):
    """gdalbuildvrt mosaic: 2 + k%3 overlapping sources per key painted
    last-wins-on-valid (nodata 0) through the real ``mosaic_arrays``
    kernel; exact-integer canvas stats + checksum."""
    from gdal_ray.raster.checksum import checksum_image
    from gdal_ray.raster.kernels import mosaic_arrays

    def per_key(batch: pa.Table) -> pa.Table:
        out = {"img_id": [], "n_sources": [], "n_painted": [], "sum_val": [],
               "cksum": []}
        for k in batch["s_suppkey"].to_pylist():
            k = int(k)
            m = 2 + k % 3
            srcs = [mosaic_source(k, s) for s in range(m)]
            offs = [mosaic_offset(k, s) for s in range(m)]
            canvas = mosaic_arrays(MOSAIC_CANVAS, srcs, offs, nodata=0)
            out["img_id"].append(f"g{k:06d}")
            out["n_sources"].append(m)
            out["n_painted"].append(int((canvas != 0).sum()))
            out["sum_val"].append(int(canvas.sum()))
            out["cksum"].append(checksum_image(canvas))
        return pa.table(
            {
                "img_id": pa.array(out["img_id"], pa.string()),
                "n_sources": pa.array(out["n_sources"], pa.int64()),
                "n_painted": pa.array(out["n_painted"], pa.int64()),
                "sum_val": pa.array(out["sum_val"], pa.int64()),
                "cksum": pa.array(out["cksum"], pa.int32()),
            }
        )

    return _suppliers(sf_dir).map_batches(per_key, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Pansharpen (weighted Brovey, dyadic weights)
# --------------------------------------------------------------------------

PAN_WEIGHTS = (0.25, 0.25, 0.5)


def pan_band(k: int, b: int, h: int, w: int) -> np.ndarray:
    rr, cc = np.mgrid[0:h, 0:w]
    mods = (251, 239, 241)
    muls = (7, 11, 3)
    return (k * muls[b] + rr * 13 + cc * 5) % mods[b]


def pan_hires(k: int, h: int, w: int) -> np.ndarray:
    rr, cc = np.mgrid[0:h, 0:w]
    return (k * 5 + rr * 11 + cc * 3) % 249


def q_pansharpen_lattice(sf_dir: str):
    """Weighted-Brovey pansharpen (alg/gdalpansharpen.cpp:1166) of a 3-band
    derived ms stack against a 2x pan band, through the real kernel (which
    includes the bilinear ms upsample); per-band exact sums + checksum."""
    from gdal_ray.raster.checksum import checksum_image
    from gdal_ray.raster.kernels import pansharpen_brovey

    def per_key(batch: pa.Table) -> pa.Table:
        out = {"img_id": [], "sum_b0": [], "sum_b1": [], "sum_b2": [],
               "cksum_b0": []}
        for k in batch["s_suppkey"].to_pylist():
            k = int(k)
            w, h = grid_dims(k)
            ms = np.stack([pan_band(k, b, h, w) for b in range(3)], axis=2)
            pan = pan_hires(k, 2 * h, 2 * w)
            sharp = pansharpen_brovey(ms.astype(np.int64), pan,
                                      weights=PAN_WEIGHTS, bit_depth=8)
            out["img_id"].append(f"g{k:06d}")
            out["sum_b0"].append(int(sharp[:, :, 0].sum()))
            out["sum_b1"].append(int(sharp[:, :, 1].sum()))
            out["sum_b2"].append(int(sharp[:, :, 2].sum()))
            out["cksum_b0"].append(checksum_image(sharp[:, :, 0]))
        return pa.table(
            {
                "img_id": pa.array(out["img_id"], pa.string()),
                "sum_b0": pa.array(out["sum_b0"], pa.int64()),
                "sum_b1": pa.array(out["sum_b1"], pa.int64()),
                "sum_b2": pa.array(out["sum_b2"], pa.int64()),
                "cksum_b0": pa.array(out["cksum_b0"], pa.int32()),
            }
        )

    return _suppliers(sf_dir).map_batches(per_key, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Raster attribute table (per-value stats)
# --------------------------------------------------------------------------

def q_rat_lattice(sf_dir: str):
    """Raster attribute table (gcore/gdal_rat.cpp): one row per (raster,
    pixel value) of the categorized grid V % 11, with count and the raw
    c/n share (a single correctly-rounded double division both sides)."""

    def per_key(batch: pa.Table) -> pa.Table:
        out = {"img_id": [], "value": [], "n_pixels": [], "share": []}
        for k in batch["s_suppkey"].to_pylist():
            k = int(k)
            cat = grid_for_key(k) % 11
            vals, counts = np.unique(cat, return_counts=True)
            n = cat.size
            for v, c in zip(vals, counts):
                out["img_id"].append(f"g{k:06d}")
                out["value"].append(int(v))
                out["n_pixels"].append(int(c))
                out["share"].append(float(c) / n)
        return pa.table(
            {
                "img_id": pa.array(out["img_id"], pa.string()),
                "value": pa.array(out["value"], pa.int64()),
                "n_pixels": pa.array(out["n_pixels"], pa.int64()),
                "share": pa.array(out["share"], pa.float64()),
            }
        )

    return _suppliers(sf_dir).map_batches(per_key, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Stack median (temporal composite over fixed-dim layers)
# --------------------------------------------------------------------------

STACK_W, STACK_H = 16, 12


def stack_layer(k: int) -> np.ndarray:
    rr, cc = np.mgrid[0:STACK_H, 0:STACK_W]
    return (k * 7 + rr * 13 + cc * 5) % 251


def q_stack_lattice(sf_dir: str):
    """Per-pixel MEDIAN across stacks of (up to) 4 consecutive layers —
    the datacube temporal-composite reduce, shuffled on stack_id through
    the bucketed group apply (the same plan q_stack_median runs on the
    image corpus); 2x the median sum is an exact integer on both sides."""
    from gdal_ray.ops.shuffle import bucketed_group_apply

    def prep(batch: pa.Table) -> pa.Table:
        ks = [int(k) for k in batch["s_suppkey"].to_pylist()]
        return pa.table(
            {
                "stack_id": pa.array([k // 4 for k in ks], pa.int64()),
                "layer_key": pa.array(ks, pa.int64()),
            }
        )

    prepped = _suppliers(sf_dir).map_batches(prep, batch_format="pyarrow")

    def reduce_stack(part: pd.DataFrame) -> pd.DataFrame:
        rows = {"stack_id": [], "n_layers": [], "sum_med2": []}
        for sid, g in part.groupby("stack_id", sort=False):
            layers = np.stack(
                [stack_layer(int(k)) for k in np.sort(g["layer_key"].to_numpy())]
            )
            med = np.median(layers, axis=0)
            rows["stack_id"].append(int(sid))
            rows["n_layers"].append(len(g))
            rows["sum_med2"].append(int((med * 2).sum()))
        return pd.DataFrame(rows)

    return bucketed_group_apply(
        prepped, ["stack_id"], reduce_stack, 8,
        schema=pa.schema(
            [("stack_id", pa.int64()), ("n_layers", pa.int64()),
             ("sum_med2", pa.int64())]
        ),
    )


# --------------------------------------------------------------------------
# Multidim GetView (slice + transpose + reduce)
# --------------------------------------------------------------------------

MDIM_SHAPE = (6, 12, 16)  # (t, y, x)


def mdim_cube(k: int) -> np.ndarray:
    t, y, x = np.mgrid[0 : MDIM_SHAPE[0], 0 : MDIM_SHAPE[1], 0 : MDIM_SHAPE[2]]
    return (k * 7 + t * 19 + y * 13 + x * 5) % 251


def q_mdim_lattice(sf_dir: str):
    """GDALMDArray GetView chain (gcore/gdalmultidim.cpp GetView/Transpose):
    cube[t=1::2, y=::3, x=2:14] -> transpose (y, x, t) -> MAX over t, via
    the lazy MDArray view composition; emits the reduced plane's exact
    sum + checksum per key."""
    from gdal_ray.raster.checksum import checksum_image
    from gdal_ray.raster.mdim import MDArray

    def per_key(batch: pa.Table) -> pa.Table:
        out = {"img_id": [], "red_h": [], "red_w": [], "sum_val": [], "cksum": []}
        for k in batch["s_suppkey"].to_pylist():
            k = int(k)
            view = (
                MDArray(mdim_cube(k))
                .view(slice(1, None, 2), slice(None, None, 3), slice(2, 14))
                .transpose((1, 2, 0))
            )
            red = view.reduce("max", axis=2)  # (y', x') plane
            out["img_id"].append(f"g{k:06d}")
            out["red_h"].append(red.shape[0])
            out["red_w"].append(red.shape[1])
            out["sum_val"].append(int(red.sum()))
            out["cksum"].append(checksum_image(red.astype(np.int64)))
        return pa.table(
            {
                "img_id": pa.array(out["img_id"], pa.string()),
                "red_h": pa.array(out["red_h"], pa.int64()),
                "red_w": pa.array(out["red_w"], pa.int64()),
                "sum_val": pa.array(out["sum_val"], pa.int64()),
                "cksum": pa.array(out["cksum"], pa.int32()),
            }
        )

    return _suppliers(sf_dir).map_batches(per_key, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Viewshed (alg/viewshed/viewshed.cpp line-of-sight) on derived DEMs
# --------------------------------------------------------------------------

def q_viewshed_lattice(sf_dir: str):
    """Observer line-of-sight visibility (raster/viewshed.py Bresenham ray
    walk, the per-cell form of the reference plane-sweep) from the center
    of every derived DEM. The SQL twin replays the exact float chain —
    integer squared distances (exact), correctly-rounded sqrt/div on both
    sides, and Python's banker's rounding of ray samples spelled out as a
    half-even CASE — verified bit-exact at sf 0.001/0.01/0.1."""
    from gdal_ray.raster.viewshed import viewshed

    def per_key(batch: pa.Table) -> pa.Table:
        out = {"k": [], "n_visible": [], "vis_sum": []}
        for k in batch["s_suppkey"].to_pylist():
            k = int(k)
            w, h = grid_dims(k)
            dem = grid_for_key(k).astype(np.float64)
            vis = viewshed(dem, h // 2, w // 2, observer_height=2.0)
            rr, cc = np.mgrid[0:h, 0:w]
            out["k"].append(k)
            out["n_visible"].append(int(vis.sum()))
            out["vis_sum"].append(int((rr[vis] * w + cc[vis]).sum()))
        return pa.table(
            {
                "k": pa.array(out["k"], pa.int64()),
                "n_visible": pa.array(out["n_visible"], pa.int64()),
                "vis_sum": pa.array(out["vis_sum"], pa.int64()),
            }
        )

    return _suppliers(sf_dir).map_batches(per_key, batch_format="pyarrow")


# --------------------------------------------------------------------------
# pHash banded-LSH near-dup (lattice twin of q_near_dup_images)
# --------------------------------------------------------------------------

# planted bit-flip masks per group member m = k % 4: hamming-to-base
# 0 / 1 / 2 / 3, so within each 4-key group exactly (m0,m1) and (m0,m2)
# qualify at max_hamming=2 (cross-group collisions are ~2^-52 improbable)
_PHASH_MASKS = (0, 1 << 7, (1 << 11) | (1 << 45), (1 << 3) | (1 << 19) | (1 << 59))


def q_phash_lattice(sf_dir: str):
    """pHash banded-LSH near-duplicate pairs (stages/dedup.py:52 — the
    engine path of q_near_dup_images) over a DERIVED phash lattice:
    phash(k) = splitmix64(k // 4) ^ planted-flip-mask(k % 4), so the
    complete hamming<=2 pair set has a closed-form SQL twin
    (bit_count(xor(a, b)) <= 2 — completeness of the 4x16-bit banding is
    the pigeonhole argument in the module docstring)."""
    from gdal_ray.stages.dedup import MinHasher, near_dup_image_pairs

    masks = np.array(_PHASH_MASKS, dtype=np.uint64)

    def mk(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["p_partkey"], dtype=np.int64)
        base = MinHasher._mix64((k // 4).astype(np.uint64))
        ph = (base ^ masks[k % 4]).view(np.int64)
        ids = [f"I{int(v):08d}" for v in k]
        return pa.table({"image_id": pa.array(ids, pa.string()), "phash": pa.array(ph)})

    ds = _rpt(os.path.join(sf_dir, "part.parquet"), columns=["p_partkey"])
    return near_dup_image_pairs(ds.map_batches(mk, batch_format="pyarrow"))


# --------------------------------------------------------------------------
# DuckDB twins
# --------------------------------------------------------------------------

_IMG = "'g' || lpad(CAST(k AS VARCHAR), 6, '0')"
_PRIMES_SQL = "[7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]"


def _cksum(v: str, i: str) -> str:
    return (
        f"CAST(SUM(({v}) % list_extract({_PRIMES_SQL}, "
        f"(({i}) % 11) + 1)) % 65536 AS INTEGER)"
    )


def oracles() -> dict[str, str]:
    """ANSI-SQL (DuckDB) twins of every query in this module, mirroring the
    numpy float-operation order exactly (see module docstring)."""
    os_ = "(2*pi()*6378137/2.0)"

    warp_sql = f"""
        WITH p AS (
          SELECT s_suppkey AS k,
                 16 + s_suppkey % 7 AS w, 12 + s_suppkey % 5 AS h,
                 -150.0 + (s_suppkey*37 % 300) AS lon0,
                 55.0 - (s_suppkey*17 % 110) AS lat0,
                 0.01 + (s_suppkey % 4)*0.005 AS res
          FROM supplier),
        b AS (
          SELECT *,
                 lon0*{os_}/180.0 AS minx,
                 (lon0 + w*res)*{os_}/180.0 AS maxx,
                 (ln(tan((90.0 + (lat0 - h*res))*pi()/360.0))/(pi()/180.0))*{os_}/180.0 AS miny,
                 (ln(tan((90.0 + lat0)*pi()/360.0))/(pi()/180.0))*{os_}/180.0 AS maxy
          FROM p),
        gdef AS (SELECT *, (maxx - minx)/w AS resx, (maxy - miny)/h AS resy FROM b),
        pix AS (
          SELECT k, w, h, lon0, lat0, res, r, c,
                 minx + (c + 0.5)*resx AS dx,
                 maxy - ((r + 0.5)*resy) AS dy
          FROM gdef, generate_series(0, 16) t1(r), generate_series(0, 22) t2(c)
          WHERE r < h AND c < w),
        ll AS (
          SELECT *, (dx/{os_})*180.0 AS lon,
                 180.0/pi()*(2.0*atan(exp(((dy/{os_})*180.0)*pi()/180.0)) - pi()/2.0) AS lat
          FROM pix),
        sp AS (
          SELECT *, floor((-lon0/res) + lon*(1.0/res)) AS ix,
                 floor((-lat0/(-res)) + lat*(1.0/(-res))) AS iy
          FROM ll),
        v AS (
          SELECT k, w, h, r, c,
                 CASE WHEN ix >= 0 AND ix < w AND iy >= 0 AND iy < h
                      THEN (k*7 + CAST(iy AS BIGINT)*13 + CAST(ix AS BIGINT)*5) % 251
                      ELSE 0 END AS val
          FROM sp)
        SELECT {_IMG} AS img_id, CAST(w AS BIGINT) AS dst_w, CAST(h AS BIGINT) AS dst_h,
               CAST(SUM(CASE WHEN val > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero,
               CAST(SUM(val) AS BIGINT) AS sum_val,
               {_cksum('val', 'r*w + c')} AS cksum
        FROM v GROUP BY k, w, h
    """

    overview_sql = f"""
        WITH px AS (
          SELECT s_suppkey AS k, 16 + s_suppkey % 7 AS w, 12 + s_suppkey % 5 AS h,
                 r, c, (s_suppkey*7 + r*13 + c*5) % 251 AS v
          FROM supplier,
               generate_series(0, 16) t1(r), generate_series(0, 22) t2(c)
          WHERE r < 12 + s_suppkey % 5 AND c < 16 + s_suppkey % 7),
        blk AS (
          SELECT k, w//2 AS ow, h//2 AS oh, r//2 AS br, c//2 AS bc, v
          FROM px WHERE r < 2*(h//2) AND c < 2*(w//2)),
        avgb AS (
          SELECT k, ow, oh, br, bc,
                 CAST(FLOOR(CAST(SUM(v) AS DOUBLE)/4.0 + 0.5) AS BIGINT) AS av
          FROM blk GROUP BY k, ow, oh, br, bc),
        modecnt AS (
          SELECT k, ow, oh, br, bc, v, COUNT(*) AS cnt
          FROM blk GROUP BY k, ow, oh, br, bc, v),
        modeb AS (
          SELECT k, ow, oh, br, bc, v AS mv
          FROM modecnt
          QUALIFY row_number() OVER (PARTITION BY k, br, bc
                                     ORDER BY cnt DESC, v ASC) = 1),
        aagg AS (
          SELECT k, ow, oh, CAST(SUM(av) AS BIGINT) AS sum_avg,
                 {_cksum('av', 'br*ow + bc')} AS cksum_avg
          FROM avgb GROUP BY k, ow, oh),
        magg AS (
          SELECT k, CAST(SUM(mv) AS BIGINT) AS sum_mode,
                 {_cksum('mv', 'br*ow + bc')} AS cksum_mode
          FROM modeb GROUP BY k)
        SELECT {_IMG} AS img_id, CAST(ow AS BIGINT) AS ov_w, CAST(oh AS BIGINT) AS ov_h,
               sum_avg, cksum_avg, sum_mode, cksum_mode
        FROM aagg JOIN magg USING (k)
    """

    mosaic_sql = f"""
        WITH p AS (SELECT s_suppkey AS k, 2 + s_suppkey % 3 AS m FROM supplier),
        cells AS (
          SELECT k, m, r, c
          FROM p, generate_series(0, 19) t1(r), generate_series(0, 19) t2(c)),
        cover AS (
          SELECT k, m, r, c, s,
                 (k*3 + s*5) % 12 AS oy, (k*7 + s*11) % 10 AS ox
          FROM cells, generate_series(0, 4) t3(s) WHERE s < m),
        sval AS (
          SELECT k, r, c, s,
                 (k*7 + s*29 + (r - oy)*13 + (c - ox)*5) % 251 AS sv
          FROM cover
          WHERE r >= oy AND r < oy + 8 AND c >= ox AND c < ox + 10),
        painted AS (
          SELECT k, r, c, sv FROM sval WHERE sv != 0
          QUALIFY row_number() OVER (PARTITION BY k, r, c ORDER BY s DESC) = 1),
        canvas AS (
          SELECT cl.k, cl.m, cl.r, cl.c, COALESCE(p2.sv, 0) AS v
          FROM cells cl LEFT JOIN painted p2
            ON cl.k = p2.k AND cl.r = p2.r AND cl.c = p2.c)
        SELECT {_IMG} AS img_id, CAST(m AS BIGINT) AS n_sources,
               CAST(SUM(CASE WHEN v != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_painted,
               CAST(SUM(v) AS BIGINT) AS sum_val,
               {_cksum('v', 'r*20 + c')} AS cksum
        FROM canvas GROUP BY k, m
    """

    # 2x bilinear upsample index/weight CASE arms (see _sample_grid: the
    # weights are exactly 0 / 0.25 / 0.75 for a 2x upscale)
    def up_idx(R: str, n: str) -> tuple[str, str, str]:
        y0 = (f"CASE WHEN {R} = 0 THEN 0 WHEN {R} = 2*{n} - 1 THEN {n} - 1 "
              f"WHEN {R} % 2 = 0 THEN {R}//2 - 1 ELSE ({R} - 1)//2 END")
        wy = (f"CASE WHEN {R} = 0 OR {R} = 2*{n} - 1 THEN 0.0 "
              f"WHEN {R} % 2 = 0 THEN 0.75 ELSE 0.25 END")
        y1 = f"LEAST(({y0}) + 1, {n} - 1)"
        return y0, y1, wy

    y0e, y1e, wye = up_idx("R", "h")
    x0e, x1e, wxe = up_idx("C", "w")
    band_mods = {0: (7, 251), 1: (11, 239), 2: (3, 241)}

    def band_v(b: int, y: str, x: str) -> str:
        mul, mod = band_mods[b]
        return f"CAST((k*{mul} + ({y})*13 + ({x})*5) % {mod} AS DOUBLE)"

    def up_band(b: int) -> str:
        top = f"({band_v(b, 'y0', 'x0')}*(1.0 - wx) + {band_v(b, 'y0', 'x1')}*wx)"
        bot = f"({band_v(b, 'y1', 'x0')}*(1.0 - wx) + {band_v(b, 'y1', 'x1')}*wx)"
        return f"FLOOR(({top}*(1.0 - wy) + {bot}*wy) + 0.5)"

    pans_sql = f"""
        WITH p AS (SELECT s_suppkey AS k, 16 + s_suppkey % 7 AS w,
                          12 + s_suppkey % 5 AS h FROM supplier),
        pix AS (
          SELECT k, w, h, R, C,
                 {y0e} AS y0, {x0e} AS x0, {wye} AS wy, {wxe} AS wx
          FROM p, generate_series(0, 31) t1(R), generate_series(0, 44) t2(C)
          WHERE R < 2*h AND C < 2*w),
        pix2 AS (SELECT *, {y1e} AS y1, {x1e} AS x1 FROM pix),
        up AS (
          SELECT k, w, h, R, C,
                 {up_band(0)} AS u0, {up_band(1)} AS u1, {up_band(2)} AS u2,
                 CAST((k*5 + R*11 + C*3) % 249 AS DOUBLE) AS pan
          FROM pix2),
        ratio AS (
          SELECT *, ((u0*0.25 + u1*0.25) + u2*0.5) AS pseudo FROM up),
        sharp AS (
          SELECT k, w, h, R, C,
                 CAST(FLOOR(LEAST(GREATEST(u0*(CASE WHEN pseudo > 0 THEN pan/pseudo ELSE 0.0 END) + 0.5, 0.0), 255.0)) AS BIGINT) AS b0,
                 CAST(FLOOR(LEAST(GREATEST(u1*(CASE WHEN pseudo > 0 THEN pan/pseudo ELSE 0.0 END) + 0.5, 0.0), 255.0)) AS BIGINT) AS b1,
                 CAST(FLOOR(LEAST(GREATEST(u2*(CASE WHEN pseudo > 0 THEN pan/pseudo ELSE 0.0 END) + 0.5, 0.0), 255.0)) AS BIGINT) AS b2
          FROM ratio)
        SELECT {_IMG} AS img_id, CAST(SUM(b0) AS BIGINT) AS sum_b0,
               CAST(SUM(b1) AS BIGINT) AS sum_b1,
               CAST(SUM(b2) AS BIGINT) AS sum_b2,
               {_cksum('b0', 'R*(2*w) + C')} AS cksum_b0
        FROM sharp GROUP BY k
    """

    rat_sql = f"""
        WITH px AS (
          SELECT s_suppkey AS k, 16 + s_suppkey % 7 AS w, 12 + s_suppkey % 5 AS h,
                 ((s_suppkey*7 + r*13 + c*5) % 251) % 11 AS value
          FROM supplier,
               generate_series(0, 16) t1(r), generate_series(0, 22) t2(c)
          WHERE r < 12 + s_suppkey % 5 AND c < 16 + s_suppkey % 7)
        SELECT {_IMG} AS img_id, CAST(value AS BIGINT) AS value,
               COUNT(*) AS n_pixels,
               CAST(COUNT(*) AS DOUBLE)/(w*h) AS share
        FROM px GROUP BY k, w, h, value
    """

    stack_sql = """
        WITH px AS (
          SELECT s_suppkey // 4 AS sid, s_suppkey AS k, r, c,
                 (s_suppkey*7 + r*13 + c*5) % 251 AS v
          FROM supplier,
               generate_series(0, 11) t1(r), generate_series(0, 15) t2(c)),
        med AS (
          SELECT sid, r, c, median(v) AS m, COUNT(*) AS nl
          FROM px GROUP BY sid, r, c)
        SELECT sid AS stack_id, CAST(MAX(nl) AS BIGINT) AS n_layers,
               CAST(SUM(m*2) AS BIGINT) AS sum_med2
        FROM med GROUP BY sid
    """

    mdim_sql = f"""
        WITH cells AS (
          SELECT s_suppkey AS k, yi, xi, t,
                 (s_suppkey*7 + (1 + 2*t)*19 + (3*yi)*13 + (2 + xi)*5) % 251 AS v
          FROM supplier,
               generate_series(0, 3) a(yi), generate_series(0, 11) b(xi),
               generate_series(0, 2) c(t)),
        red AS (SELECT k, yi, xi, MAX(v) AS v FROM cells GROUP BY k, yi, xi)
        SELECT {_IMG} AS img_id, CAST(4 AS BIGINT) AS red_h,
               CAST(12 AS BIGINT) AS red_w, CAST(SUM(v) AS BIGINT) AS sum_val,
               {_cksum('v', 'yi*12 + xi')} AS cksum
        FROM red GROUP BY k
    """

    from gdal_ray.stages.dedup import splitmix64_sql

    mask_case = " ".join(
        f"WHEN {m} THEN {v}::UBIGINT" for m, v in enumerate(_PHASH_MASKS)
    )
    phash_sql = f"""
        WITH ph AS (
          SELECT 'I' || lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS id,
                 xor({splitmix64_sql('CAST(p_partkey // 4 AS UBIGINT)')},
                     CASE p_partkey % 4 {mask_case} END) AS h
          FROM part)
        SELECT a.id AS id_a, b.id AS id_b
        FROM ph a JOIN ph b
          ON a.id < b.id AND bit_count(xor(a.h, b.h)) <= 2
    """

    viewshed_sql = """
        WITH g AS (
          SELECT s_suppkey AS k, 16 + s_suppkey % 7 AS w, 12 + s_suppkey % 5 AS h
          FROM supplier),
        cells AS (
          SELECT k, w, h, r, c, CAST((k*7 + r*13 + c*5) % 251 AS DOUBLE) AS v
          FROM g, generate_series(0, 15) t1(r), generate_series(0, 21) t2(c)
          WHERE r < h AND c < w),
        obs AS (SELECT k, w, h, h // 2 AS oy, w // 2 AS ox FROM g),
        oz AS (
          SELECT o.k, o.w, o.h, o.oy, o.ox, cells.v + 2.0 AS oz
          FROM obs o JOIN cells ON cells.k = o.k AND cells.r = o.oy AND cells.c = o.ox),
        targets AS (
          SELECT z.k, z.w, z.h, z.oy, z.ox, z.oz, cells.r AS ty, cells.c AS tx,
                 cells.v AS tv, cells.r - z.oy AS dy, cells.c - z.ox AS dx,
                 GREATEST(abs(cells.r - z.oy), abs(cells.c - z.ox)) AS n,
                 sqrt(CAST((cells.c - z.ox)*(cells.c - z.ox)
                         + (cells.r - z.oy)*(cells.r - z.oy) AS DOUBLE)) AS dist
          FROM oz z JOIN cells ON cells.k = z.k
          WHERE NOT (cells.r = z.oy AND cells.c = z.ox)),
        tang AS (SELECT *, (tv - oz) / dist AS tangle FROM targets),
        samples AS (
          SELECT t.*,
                 t.oy + t.dy * (CAST(s.i AS DOUBLE) / t.n) AS iy,
                 t.ox + t.dx * (CAST(s.i AS DOUBLE) / t.n) AS ix
          FROM tang t, generate_series(1, 21) s(i) WHERE s.i < t.n),
        rnd AS (
          SELECT *,
            CASE WHEN iy - floor(iy) = 0.5
                 THEN CASE WHEN CAST(floor(iy) AS BIGINT) % 2 = 0
                           THEN CAST(floor(iy) AS BIGINT)
                           ELSE CAST(floor(iy) AS BIGINT) + 1 END
                 ELSE CAST(floor(iy + 0.5) AS BIGINT) END AS ry,
            CASE WHEN ix - floor(ix) = 0.5
                 THEN CASE WHEN CAST(floor(ix) AS BIGINT) % 2 = 0
                           THEN CAST(floor(ix) AS BIGINT)
                           ELSE CAST(floor(ix) AS BIGINT) + 1 END
                 ELSE CAST(floor(ix + 0.5) AS BIGINT) END AS rx
          FROM samples),
        blockers AS (
          SELECT r.k, r.ty, r.tx, MAX(
                   CASE WHEN (c2.v - r.oz) /
                             sqrt(CAST((r.rx - r.ox)*(r.rx - r.ox)
                                     + (r.ry - r.oy)*(r.ry - r.oy) AS DOUBLE))
                             > r.tangle + 1e-12
                        THEN 1 ELSE 0 END) AS blocked
          FROM rnd r JOIN cells c2 ON c2.k = r.k AND c2.r = r.ry AND c2.c = r.rx
          WHERE NOT (r.ry = r.ty AND r.rx = r.tx)
            AND NOT (r.ry = r.oy AND r.rx = r.ox)
          GROUP BY r.k, r.ty, r.tx),
        vis AS (
          SELECT t.k, t.w, t.ty, t.tx,
                 CASE WHEN COALESCE(b.blocked, 0) = 0 THEN 1 ELSE 0 END AS visible
          FROM tang t LEFT JOIN blockers b
            ON b.k = t.k AND b.ty = t.ty AND b.tx = t.tx)
        SELECT k, CAST(1 + SUM(visible) AS BIGINT) AS n_visible,
               CAST((SELECT oy*w + ox FROM obs o WHERE o.k = vis.k LIMIT 1)
                 + SUM(CASE WHEN visible = 1 THEN ty*w + tx ELSE 0 END) AS BIGINT)
                 AS vis_sum
        FROM vis GROUP BY k, w
    """

    return {
        "q_phash_lattice": phash_sql,
        "q_viewshed_lattice": viewshed_sql,
        "q_warp_merc_lattice": warp_sql,
        "q_overview_lattice": overview_sql,
        "q_mosaic_lattice": mosaic_sql,
        "q_pansharpen_lattice": pans_sql,
        "q_rat_lattice": rat_sql,
        "q_stack_lattice": stack_sql,
        "q_mdim_lattice": mdim_sql,
    }
