"""NTv2 grid-shift tests: .gsb round-trip, bilinear exactness, subgrid
priority, inverse convergence, and the broadcast Ray stage."""

import numpy as np
import pytest

from gdal_ray.geo.ntv2 import Ntv2Grid, SubGrid, ntv2_shift_batch, read_gsb, write_gsb


def _analytic(lat_sec, lon_w_sec):
    """Bilinear-in-(lat,lon) shift surfaces: bilinear interpolation of a
    bilinear function is exact, so node AND interior checks are exact up
    to float32 storage."""
    a = 1.25 + 2e-4 * (lat_sec - 180000.0) + 1e-4 * (lon_w_sec - 270000.0)
    b = -0.75 + 1e-4 * (lat_sec - 180000.0) - 2e-4 * (lon_w_sec - 270000.0)
    return a, b


def _parent_grid():
    # 50..52N, 74..76W (positive-west 266400..273600 sec), 0.1 deg steps
    s_lat, n_lat = 50 * 3600.0, 52 * 3600.0
    e_long, w_long = 74 * 3600.0, 76 * 3600.0
    inc = 360.0
    lats = np.arange(s_lat, n_lat + 1, inc)
    lons = np.arange(e_long, w_long + 1, inc)
    lo, la = np.meshgrid(lons, lats)
    sl, so = _analytic(la, lo)
    return dict(name="PARENT", parent="NONE", s_lat=s_lat, n_lat=n_lat,
                e_long=e_long, w_long=w_long, lat_inc=inc, long_inc=inc,
                shift_lat=sl, shift_lon=so)


def _child_grid():
    # refinement over 50.5..51N, 74.5..75W at 0.025 deg with DIFFERENT
    # (constant) shifts so the winner is observable
    s_lat, n_lat = 50.5 * 3600.0, 51 * 3600.0
    e_long, w_long = 74.5 * 3600.0, 75 * 3600.0
    inc = 90.0
    nr = int(round((n_lat - s_lat) / inc)) + 1
    nc = int(round((w_long - e_long) / inc)) + 1
    return dict(name="CHILD", parent="PARENT", s_lat=s_lat, n_lat=n_lat,
                e_long=e_long, w_long=w_long, lat_inc=inc, long_inc=inc,
                shift_lat=np.full((nr, nc), 3.0),
                shift_lon=np.full((nr, nc), -1.5))


@pytest.fixture(scope="module")
def gsb(tmp_path_factory):
    p = tmp_path_factory.mktemp("ntv2") / "shift.gsb"
    write_gsb(p, [_parent_grid(), _child_grid()])
    return p


def test_read_round_trip(gsb):
    g = read_gsb(gsb)
    assert [sg.name for sg in g.subgrids] == ["PARENT", "CHILD"]
    pg = g.subgrids[0]
    assert (pg.nrows, pg.ncols) == (21, 21)
    # node values survive the float32 file round-trip
    want_sl, want_so = _analytic(pg.s_lat, pg.e_long)
    assert abs(pg.shift_lat[0, 0] - want_sl) < 1e-5
    assert abs(pg.shift_lon[0, 0] - want_so) < 1e-5


def test_big_endian_round_trip(tmp_path):
    p = tmp_path / "be.gsb"
    write_gsb(p, [_parent_grid()], big_endian=True)
    g = read_gsb(p)
    pg = g.subgrids[0]
    want_sl, _ = _analytic(pg.n_lat, pg.w_long)
    assert abs(pg.shift_lat[-1, -1] - want_sl) < 1e-5


def test_bilinear_matches_analytic_interior(gsb):
    g = Ntv2Grid(read_gsb(gsb).subgrids[:1])  # parent only
    rng = np.random.default_rng(7)
    lat = 50.05 + rng.random(200) * 1.9       # degrees N
    lon = -(74.05 + rng.random(200) * 1.9)    # degrees E (west -> negative)
    dlon, dlat, cov = g.shift(lon, lat)
    assert cov.all()
    want_sl, want_so = _analytic(lat * 3600.0, -lon * 3600.0)
    # file stores float32: agreement to ~1e-5 arcsec
    assert np.max(np.abs(dlat * 3600.0 - want_sl)) < 2e-5
    assert np.max(np.abs(-dlon * 3600.0 - want_so)) < 2e-5


def test_forward_signs(gsb):
    """Positive lat shift moves north; positive (west) lon shift moves
    the positive-east longitude WEST (more negative)."""
    g = Ntv2Grid(read_gsb(gsb).subgrids[1:])  # child only: +3.0 / -1.5 sec
    lon, lat, cov = g.forward(np.array([-74.7]), np.array([50.7]))
    assert cov.all()
    assert lat[0] > 50.7                       # +3 sec north
    assert lon[0] > -74.7                      # -1.5 sec west == east move


def test_subgrid_priority(gsb):
    g = read_gsb(gsb)
    # inside the child window the constant child shift wins
    dlon, dlat, cov = g.shift(np.array([-74.7]), np.array([50.7]))
    assert cov.all()
    assert abs(dlat[0] * 3600.0 - 3.0) < 1e-9
    assert abs(dlon[0] * 3600.0 - 1.5) < 1e-9  # -(-1.5)/3600 deg
    # outside the child (still in parent) the analytic surface wins
    dlon2, dlat2, cov2 = g.shift(np.array([-75.5]), np.array([51.5]))
    want_sl, _ = _analytic(51.5 * 3600.0, 75.5 * 3600.0)
    assert cov2.all() and abs(dlat2[0] * 3600.0 - want_sl) < 2e-5


def test_outside_passthrough(gsb):
    g = read_gsb(gsb)
    lon, lat, cov = g.forward(np.array([0.0]), np.array([0.0]))
    assert not cov.any()
    assert lon[0] == 0.0 and lat[0] == 0.0


def test_inverse_round_trip(gsb):
    g = read_gsb(gsb)
    rng = np.random.default_rng(11)
    lat = 50.1 + rng.random(500) * 1.8
    lon = -(74.1 + rng.random(500) * 1.8)
    flon, flat, cov = g.forward(lon, lat)
    assert cov.all()
    blon, blat, _ = g.inverse(flon, flat)
    assert np.max(np.abs(blon - lon)) < 1e-10
    assert np.max(np.abs(blat - lat)) < 1e-10


def test_reject_non_gsb(tmp_path):
    p = tmp_path / "bad.gsb"
    p.write_bytes(b"NOT A GRID FILE" * 20)
    with pytest.raises(ValueError, match="NUM_OREC"):
        read_gsb(p)


def test_corpus_datum_shift_query(ray_session):
    """q_datum_shift vs a single-process recompute over the same corpus:
    identical bands, counts and quantized shift sums."""
    import pyarrow.parquet as pq

    from gdal_ray.geo.mercator import meters_to_latlon
    from gdal_ray.geo.ntv2 import read_gsb
    from gdal_ray.pipelines.corpus_queries import (
        _datum_grid_path, corpus_for_sf, q_datum_shift)

    sf = "/root/testdata/sf0.001"
    got = q_datum_shift(sf).to_pandas()

    d = corpus_for_sf(sf)
    import glob
    import pandas as pd
    pl = pd.concat([
        pq.read_table(p).to_pandas()
        for p in sorted(glob.glob(f"{d}/placements.parquet/*.parquet"))
    ])
    wh = pd.concat([
        pq.read_table(p, columns=["image_id", "w", "h"]).to_pandas()
        for p in sorted(glob.glob(f"{d}/images.parquet/*.parquet"))
    ])
    pl = pl.merge(wh, on="image_id", how="inner")
    # recompute centroids with the SAME stage the query path uses
    import pyarrow as pa

    from gdal_ray.stages.geo import add_centroid_meters
    merged = add_centroid_meters(pa.Table.from_pandas(pl, preserve_index=False))
    cx = np.asarray(merged["cx"], dtype=np.float64)
    cy = np.asarray(merged["cy"], dtype=np.float64)
    lat, lon = meters_to_latlon(cx, cy)
    grid = read_gsb(_datum_grid_path())
    dlon, dlat, cov = grid.shift(lon, lat)
    df = pd.DataFrame({
        "band": np.floor(lat).astype(np.int64),
        "n": 1,
        "n_cov": cov.astype(np.int64),
        "dlat_q": np.round(dlat * 3600.0 * 1e6).astype(np.int64),
        "dlon_q": np.round(dlon * 3600.0 * 1e6).astype(np.int64),
    })
    want = (
        df.groupby("band", as_index=False)
        .sum()
        .rename(columns={"dlat_q": "sum_dlat_q", "dlon_q": "sum_dlon_q"})
        .sort_values("band")
        .reset_index(drop=True)
    )
    got = got.sort_values("band").reset_index(drop=True)[want.columns]
    assert got.equals(want)
    # the corpus reaches |lat| ~60: some points must be uncovered
    assert (want["n_cov"] < want["n"]).any()


def test_ray_stage_broadcast(gsb, ray_session):
    import pandas as pd
    import ray
    import ray.data as rd

    grid_ref = ray.put(read_gsb(gsb))
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "lon": -(74.1 + rng.random(1000) * 1.8),
        "lat": 50.1 + rng.random(1000) * 1.8,
    })
    out = (
        rd.from_pandas(df)
        .map_batches(
            ntv2_shift_batch,
            batch_format="pandas",
            fn_kwargs=dict(grid_ref=grid_ref),
        )
        .to_pandas()
    )
    assert out["ntv2_covered"].all()
    g = read_gsb(gsb)
    wlon, wlat, _ = g.forward(df["lon"].to_numpy(), df["lat"].to_numpy())
    assert np.allclose(out["lon_shifted"].to_numpy(), wlon, atol=1e-12)
    assert np.allclose(out["lat_shifted"].to_numpy(), wlat, atol=1e-12)
