"""CSV vector layer driver (OGR CSV driver analogue,
``ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp``). A CSV file is an attribute
table; geometry arrives either as a WKT column (the driver's
``GEOM_POSSIBLE_NAMES``/WKT mode) or as numeric X/Y columns (its
``X_POSSIBLE_NAMES``/``Y_POSSIBLE_NAMES`` point mode). Both convert to
the engine's standard layer schema: ``geometry`` as canonical WKB binary
+ remaining attribute columns.

Scale: ``ray.data.read_csv`` shards by file and byte range, so the parse
and the WKT->WKB conversion run distributed; the writer emits one atomic
``.csv`` shard per block (partitioned, resumable — same contract as
``write_geojsonseq``)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["read_csv_layer", "write_csv_layer"]


def read_csv_layer(path: str, wkt_col: str | None = None,
                   xy_cols: tuple[str, str] | None = None,
                   columns: list[str] | None = None):
    """CSV file(s)/dir -> Dataset (geometry: WKB + attributes).

    ``wkt_col``: a column of WKT text (consumed, replaced by
    ``geometry``); ``xy_cols``: two numeric columns building Point
    geometries (kept as attributes, like the reference's
    KEEP_GEOM_COLUMNS default). With neither, a plain attribute table."""
    import ray.data as rd

    ds = rd.read_csv(path)
    if wkt_col is None and xy_cols is None:
        return ds.select_columns(columns) if columns else ds

    def add_geom(df: pd.DataFrame) -> pd.DataFrame:
        if wkt_col is not None:
            from gdal_ray.geo.wkt import wkt_to_wkb

            geom = [wkt_to_wkb(v) for v in df[wkt_col]]
            df = df.drop(columns=[wkt_col])
        else:
            xc, yc = xy_cols
            x = np.asarray(df[xc], dtype=np.float64)
            y = np.asarray(df[yc], dtype=np.float64)
            import struct

            n = len(df)
            buf = np.empty((n, 21), dtype=np.uint8)
            buf[:, 0] = 1
            buf[:, 1:5] = np.frombuffer(struct.pack("<I", 1), dtype=np.uint8)
            buf[:, 5:13] = x.astype("<f8").view(np.uint8).reshape(n, 8)
            buf[:, 13:21] = y.astype("<f8").view(np.uint8).reshape(n, 8)
            geom = [r.tobytes() for r in buf]
        out = df.copy()
        out.insert(0, "geometry", pd.Series(geom, index=df.index,
                                            dtype=object))
        return out

    out = ds.map_batches(add_geom, batch_format="pandas")
    return out.select_columns(columns) if columns else out


def write_csv_layer(ds, out_dir: str, wkt_col: str = "wkt"):
    """Dataset (geometry: WKB + attributes) -> one atomic ``.csv`` shard
    per block under ``out_dir``; geometry exports as a WKT column (the
    reference's CREATE_CSVT/GEOMETRY=AS_WKT mode). Returns the shard
    summary Dataset (consume it to drive the write)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        from gdal_ray.geo.wkt import wkb_to_wkt

        out = df.copy()
        if "geometry" in out.columns:
            out[wkt_col] = [wkb_to_wkt(b) for b in out["geometry"]]
            out = out.drop(columns=["geometry"])
        body = out.to_csv(index=False).encode()
        import zlib

        shard = f"part-{zlib.crc32(body):08x}-{len(out)}.csv"
        final = os.path.join(out_dir, shard)
        if not os.path.exists(final):
            tmp = final + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(body)
            os.replace(tmp, final)
        return pd.DataFrame({"shard": [shard], "n": [len(out)]})

    return ds.map_batches(write_shard, batch_format="pandas", batch_size=None)
