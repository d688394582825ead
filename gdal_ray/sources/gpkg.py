"""GeoPackage vector driver (OGR GPKG driver analogue,
``ogr/ogrsf_frmts/gpkg/``) over the stdlib ``sqlite3`` — no native GDAL.

A GeoPackage is a SQLite database with spec tables (``gpkg_contents``,
``gpkg_geometry_columns``, ``gpkg_spatial_ref_sys``) and per-feature
geometry BLOBs = an 8-byte-plus "GP" header (magic, version, flags,
srs_id, optional envelope) followed by standard WKB — i.e. the engine's
native geometry format behind a small header
(``ogr/ogrsf_frmts/gpkg/ogrgeopackageutility.cpp`` GPkgHeader).

Scale design:

- ``read_gpkg`` shards the table by ROWID ranges: each Ray read task
  opens the file read-only (``mode=ro`` URI; SQLite allows unlimited
  concurrent readers) and scans one range — a splittable, streaming
  distributed read of a single-file database.
- ``write_gpkg`` is a DRIVER-SIDE bounded sink (SQLite is single-writer)
  streaming ``iter_batches`` into one transaction per batch; it writes
  the spec tables, so the output opens in GDAL/QGIS.
"""

from __future__ import annotations

import os
import sqlite3
import struct

import pandas as pd

__all__ = ["gpkg_layers", "read_gpkg", "write_gpkg",
           "gp_wrap", "gp_unwrap"]


def gp_unwrap(blob: bytes | None) -> bytes | None:
    """GeoPackage geometry BLOB -> plain WKB (header + envelope skipped;
    the empty-geometry flag maps to None)."""
    if blob is None:
        return None
    b = bytes(blob)
    if len(b) < 8 or b[0] != 0x47 or b[1] != 0x50:
        raise ValueError("not a GeoPackage geometry blob (no GP magic)")
    flags = b[3]
    if flags & 0x20:  # empty-geometry flag
        return None
    env = (flags >> 1) & 0x07
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(env)
    if env_len is None:
        raise ValueError(f"invalid GPKG envelope indicator {env}")
    return b[8 + env_len:]


def gp_wrap(wkb: bytes | None, srs_id: int = 0) -> bytes | None:
    """Plain WKB -> GeoPackage geometry BLOB (version 0, little-endian
    header, no envelope)."""
    if wkb is None:
        return None
    return b"GP" + bytes([0, 0x01]) + struct.pack("<i", srs_id) + bytes(wkb)


def gpkg_layers(path: str) -> list[str]:
    """Feature-table names from gpkg_contents (data_type='features')."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type='features' "
            "ORDER BY table_name"
        ).fetchall()
    finally:
        con.close()
    return [r[0] for r in rows]


def read_gpkg(path: str, layer: str | None = None,
              columns: list[str] | None = None, shard_rows: int = 65536):
    """GeoPackage layer -> Dataset (fid, geometry: WKB, attributes).

    ROWID ranges of ``shard_rows`` rows become independent read tasks;
    the geometry column (from gpkg_geometry_columns) unwraps to plain
    WKB named ``geometry``."""
    import ray.data as rd

    if layer is None:
        layers = gpkg_layers(path)
        if len(layers) != 1:
            raise ValueError(f"specify layer= (found {layers})")
        layer = layers[0]
    if not layer.replace("_", "").isalnum():
        raise ValueError(f"bad layer name {layer!r}")
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        g = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns "
            "WHERE table_name = ?", (layer,),
        ).fetchone()
        geom_col = g[0] if g else None
        lo, hi = con.execute(
            f'SELECT MIN(ROWID), MAX(ROWID) FROM "{layer}"'
        ).fetchone()
    finally:
        con.close()
    if lo is None:
        raise ValueError(f"layer {layer!r} is empty")
    shards = [
        {"lo": s, "hi": min(s + shard_rows - 1, hi)}
        for s in range(lo, hi + 1, shard_rows)
    ]

    def read_shard(batch: pd.DataFrame) -> pd.DataFrame:
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            outs = []
            for lo_, hi_ in zip(batch["lo"], batch["hi"]):
                df = pd.read_sql_query(
                    f'SELECT ROWID AS __rowid, * FROM "{layer}" '
                    f"WHERE ROWID BETWEEN ? AND ?",
                    con, params=(int(lo_), int(hi_)),
                )
                if "fid" in df.columns:
                    df = df.drop(columns=["__rowid"])
                else:
                    df = df.rename(columns={"__rowid": "fid"})
                if geom_col is not None and geom_col in df.columns:
                    df["geometry"] = [gp_unwrap(b) for b in df[geom_col]]
                    if geom_col != "geometry":
                        df = df.drop(columns=[geom_col])
                outs.append(df)
        finally:
            con.close()
        out = pd.concat(outs, ignore_index=True)
        return out[columns] if columns else out

    return rd.from_pandas(pd.DataFrame(shards)).repartition(
        len(shards)
    ).map_batches(read_shard, batch_format="pandas", batch_size=None)


_SPEC = """
CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
  srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
  organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
  definition TEXT NOT NULL, description TEXT);
CREATE TABLE IF NOT EXISTS gpkg_contents (
  table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
  identifier TEXT UNIQUE, description TEXT DEFAULT '',
  last_change DATETIME DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
  min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
  srs_id INTEGER);
CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
  table_name TEXT NOT NULL, column_name TEXT NOT NULL,
  geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
  z TINYINT NOT NULL, m TINYINT NOT NULL,
  CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name));
"""


def write_gpkg(ds, path: str, layer: str, srs_id: int = 3857,
               geometry_type: str = "GEOMETRY"):
    """Dataset (geometry: WKB + attributes) -> a GeoPackage file the
    reference (and QGIS) can open. Driver-side bounded sink: SQLite is
    single-writer, so batches stream through ``iter_batches`` into one
    transaction each — nothing else materializes. Returns row count."""
    if not layer.replace("_", "").isalnum():
        raise ValueError(f"bad layer name {layer!r}")
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 0x47504B47")  # 'GPKG'
        con.execute("PRAGMA user_version = 10200")
        con.executescript(_SPEC)
        con.execute(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES "
            "('undefined', -1, 'NONE', -1, 'undefined', NULL), "
            "('undefined geographic', 0, 'NONE', 0, 'undefined', NULL), "
            "(?, ?, 'EPSG', ?, 'undefined', NULL)",
            (f"EPSG:{srs_id}", srs_id, srs_id),
        )
        n_total, made = 0, False
        for batch in ds.iter_batches(batch_format="pandas"):
            if not made:
                attrs = [c for c in batch.columns
                         if c not in ("geometry", "fid")]
                cols_sql = ", ".join(
                    f'"{c}" {_sqlite_type(batch[c])}' for c in attrs
                )
                con.execute(
                    f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY, '
                    f"geometry BLOB{', ' + cols_sql if cols_sql else ''})"
                )
                con.execute(
                    "INSERT INTO gpkg_contents (table_name, data_type, "
                    "identifier, srs_id) VALUES (?, 'features', ?, ?)",
                    (layer, layer, srs_id),
                )
                con.execute(
                    "INSERT INTO gpkg_geometry_columns VALUES "
                    "(?, 'geometry', ?, ?, 0, 0)",
                    (layer, geometry_type, srs_id),
                )
                made = True
            def _py(v):
                if v is None or (not isinstance(v, bytes) and pd.isna(v)):
                    return None
                return v.item() if hasattr(v, "item") else v

            rows = [
                tuple(
                    [_py(r.get("fid", None)),
                     gp_wrap(_py(r["geometry"]), srs_id)]
                    + [_py(r[c]) for c in attrs]
                )
                for _, r in batch.iterrows()
            ]
            ph = ", ".join("?" * (2 + len(attrs)))
            con.executemany(
                f'INSERT INTO "{layer}" VALUES ({ph})', rows
            )
            con.commit()
            n_total += len(rows)
        if not made:
            raise ValueError("empty dataset")
    finally:
        con.close()
    return n_total


def _sqlite_type(s: pd.Series) -> str:
    import numpy as np

    if np.issubdtype(s.dtype, np.integer):
        return "INTEGER"
    if np.issubdtype(s.dtype, np.floating):
        return "REAL"
    return "TEXT"
