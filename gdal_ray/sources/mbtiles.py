"""MBTiles raster tileset driver (GDAL MBTiles driver analogue,
``frmts/mbtiles/mbtilesdataset.cpp``) over the stdlib ``sqlite3``.

An MBTiles file (spec 1.3) is a SQLite database with a ``metadata``
key/value table and a ``tiles(zoom_level, tile_column, tile_row,
tile_data)`` table whose ``tile_row`` uses the TMS convention (y grows
north) — the engine's tile tables key XYZ (y grows south, the gdal2tiles
--xyz / slippy-map convention), so both directions flip
``y_tms = 2^z - 1 - y_xyz`` exactly like the reference driver does
(mbtilesdataset.cpp ``nTMSRow = (1 << nZoom) - 1 - row``).

Scale design (mirrors the GeoPackage driver, ``sources/gpkg.py``):

- ``read_mbtiles`` shards the tiles table by ROWID ranges: each Ray read
  task opens the file read-only (``mode=ro`` URI; SQLite allows unlimited
  concurrent readers) and scans one range — a splittable, streaming
  distributed read of a single-file tileset.
- ``write_mbtiles`` is a DRIVER-SIDE bounded sink (SQLite is
  single-writer): tile batches stream through ``iter_batches`` into one
  transaction per batch; only z/x/y ints and the already-encoded PNG
  blobs flow, never decoded pixels. The required ``metadata`` rows
  (name/format/bounds/minzoom/maxzoom, spec §"Content") are computed
  from streamed per-batch extent partials, so the output opens in the
  reference, QGIS, or any slippy-map server.
"""

from __future__ import annotations

import os
import pathlib
import sqlite3

import numpy as np
import pandas as pd

from gdal_ray.geo.mercator import meters_to_latlon, tile_bounds

__all__ = ["write_mbtiles", "read_mbtiles", "export_mbtiles",
           "mbtiles_metadata"]


def _tile_extent_latlon(z: int, xmin: int, xmax: int, ymin: int, ymax: int):
    """WGS84 (left, bottom, right, top) of an XYZ tile range at zoom z."""
    # tile_bounds takes TMS y; convert the XYZ range endpoints
    mleft, mbot, _, _ = tile_bounds(xmin, (1 << z) - 1 - ymax, z)
    _, _, mright, mtop = tile_bounds(xmax, (1 << z) - 1 - ymin, z)
    bot_lat, left_lon = meters_to_latlon(mleft, mbot)
    top_lat, right_lon = meters_to_latlon(mright, mtop)
    return left_lon, bot_lat, right_lon, top_lat


def write_mbtiles(tiles_ds, path: str, name: str = "gdal_ray",
                  fmt: str = "png", description: str = "",
                  batch_rows: int = 512) -> dict:
    """Dataset (z, x, y [XYZ], png: binary) -> an MBTiles 1.3 file.

    Existing files are replaced. Also accepts a plain pandas DataFrame
    (the single-raster CLI shape). Returns {n_tiles, minzoom, maxzoom,
    bounds} (the metadata the sink wrote)."""
    if isinstance(tiles_ds, pd.DataFrame):
        batches = (tiles_ds.iloc[i:i + batch_rows]
                   for i in range(0, len(tiles_ds), batch_rows))
    else:
        batches = tiles_ds.iter_batches(batch_size=batch_rows,
                                        batch_format="pandas")
    p = pathlib.Path(path)
    if p.exists():
        p.unlink()
    p.parent.mkdir(parents=True, exist_ok=True)
    con = sqlite3.connect(path)
    try:
        con.executescript(
            "CREATE TABLE metadata (name TEXT, value TEXT);"
            "CREATE TABLE tiles (zoom_level INTEGER, tile_column INTEGER,"
            " tile_row INTEGER, tile_data BLOB);"
            "CREATE UNIQUE INDEX tile_index ON tiles"
            " (zoom_level, tile_column, tile_row);"
        )
        n_tiles = 0
        # per-zoom XYZ extent partials -> bounds/min/maxzoom metadata
        ext: dict[int, list[int]] = {}
        for b in batches:
            if not len(b):
                continue
            zs = b["z"].to_numpy(np.int64)
            xs = b["x"].to_numpy(np.int64)
            ys = b["y"].to_numpy(np.int64)
            tms = (np.int64(1) << zs) - 1 - ys
            con.executemany(
                "INSERT INTO tiles VALUES (?, ?, ?, ?)",
                [(int(z), int(x), int(t), memoryview(blob))
                 for z, x, t, blob in zip(zs, xs, tms, b["png"])],
            )
            con.commit()
            n_tiles += len(b)
            for z in np.unique(zs):
                m = zs == z
                e = ext.setdefault(int(z), [1 << 62, -1, 1 << 62, -1])
                e[0] = min(e[0], int(xs[m].min()))
                e[1] = max(e[1], int(xs[m].max()))
                e[2] = min(e[2], int(ys[m].min()))
                e[3] = max(e[3], int(ys[m].max()))
        if not ext:
            raise ValueError("no tiles to write")
        minz, maxz = min(ext), max(ext)
        bounds = _tile_extent_latlon(maxz, *ext[maxz])
        meta = {
            "name": name,
            "format": fmt,
            "type": "overlay",
            "version": "1.3",
            "description": description or name,
            "minzoom": str(minz),
            "maxzoom": str(maxz),
            "bounds": ",".join(f"{v:.8f}" for v in bounds),
            "center": (f"{(bounds[0] + bounds[2]) / 2:.8f},"
                       f"{(bounds[1] + bounds[3]) / 2:.8f},{maxz}"),
        }
        con.executemany("INSERT INTO metadata VALUES (?, ?)",
                        sorted(meta.items()))
        con.commit()
    finally:
        con.close()
    return {"n_tiles": n_tiles, "minzoom": minz, "maxzoom": maxz,
            "bounds": bounds}


def mbtiles_metadata(path: str) -> dict:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        return dict(con.execute("SELECT name, value FROM metadata"))
    finally:
        con.close()


def read_mbtiles(path: str, zoom: int | None = None,
                 shard_rows: int = 65536):
    """MBTiles file -> Dataset (z, x, y [XYZ], png: binary).

    ROWID ranges of ``shard_rows`` tiles become independent read tasks
    (the reference driver reads per-block SELECTs; here one task owns a
    contiguous range). ``zoom=`` filters inside each task's SELECT."""
    import pyarrow as pa
    import ray.data as rd

    if not os.path.exists(path):
        raise FileNotFoundError(path)
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        lo, hi = con.execute("SELECT MIN(ROWID), MAX(ROWID) FROM tiles").fetchone()
    finally:
        con.close()
    if lo is None:
        raise ValueError(f"{path!r} has no tiles")
    shards = [{"lo": s, "hi": min(s + shard_rows - 1, hi)}
              for s in range(lo, hi + 1, shard_rows)]
    zfilter = "" if zoom is None else f" AND zoom_level = {int(zoom)}"

    def read_shard(batch: pd.DataFrame) -> pa.Table:
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            zs, xs, ys, blobs = [], [], [], []
            for lo_, hi_ in zip(batch["lo"], batch["hi"]):
                for z, x, t, blob in con.execute(
                    "SELECT zoom_level, tile_column, tile_row, tile_data"
                    f" FROM tiles WHERE ROWID BETWEEN ? AND ?{zfilter}",
                    (int(lo_), int(hi_)),
                ):
                    zs.append(z)
                    xs.append(x)
                    ys.append((1 << z) - 1 - t)
                    blobs.append(blob)
        finally:
            con.close()
        return pa.table({
            "z": pa.array(zs, pa.int64()),
            "x": pa.array(xs, pa.int64()),
            "y": pa.array(ys, pa.int64()),
            "png": pa.array(blobs, pa.binary()),
        })

    return rd.from_pandas(pd.DataFrame(shards)).repartition(
        len(shards)
    ).map_batches(read_shard, batch_format="pandas", batch_size=None)


def export_mbtiles(pyramid_dir: str, path: str, **kw) -> dict:
    """Materialize a parquet tile pyramid (``pipelines/tiling.py``) as one
    MBTiles file — the gdal2tiles-to-MBTiles path the reference covers
    with gdal_translate -of MBTILES + gdaladdo."""
    import ray.data as rd

    src = sorted(str(q) for q in
                 pathlib.Path(pyramid_dir).glob("z*/tiles.parquet"))
    if not src:
        raise ValueError(f"no tile groups under {pyramid_dir!r}")
    ds = rd.read_parquet(src, columns=["z", "x", "y", "png"])
    return write_mbtiles(ds, path, **kw)
