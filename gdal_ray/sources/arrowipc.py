"""Arrow IPC (Feather V2) vector driver (OGR Arrow driver analogue,
``ogr/ogrsf_frmts/arrow/``).

The reference reads/writes the Arrow IPC file format as a first-class
vector format (geometry = WKB binary column, the same encoding this
engine uses everywhere — SURVEY.md §1.2 notes GDAL itself defines the
columnar layer form this way). Here the driver is nearly free: blocks
ARE Arrow record batches.

- ``read_arrow_ipc`` — file or directory of ``.arrow`` shards; each file
  is self-describing and parses inside its own read task (record-batch
  granularity within a file comes from the IPC framing itself).
- ``write_arrow_ipc`` — one ``.arrow`` shard per block (atomic rename,
  resumable partitioned output), zero-copy from the pyarrow batch.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

__all__ = ["read_arrow_ipc", "write_arrow_ipc"]


def read_arrow_ipc(path: str, columns: list[str] | None = None):
    """``.arrow`` IPC file(s) -> Dataset (zero-copy column pruning)."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for raw in batch["bytes"].to_pylist():
            t = pa.ipc.open_file(pa.BufferReader(raw)).read_all()
            tables.append(t.select(columns) if columns else t)
        return pa.concat_tables(tables, promote_options="default")

    return rd.read_binary_files(path, file_extensions=["arrow"]).map_batches(
        parse, batch_format="pyarrow", batch_size=None)


def write_arrow_ipc(ds, out_dir: str):
    """Dataset -> one ``.arrow`` IPC shard per block. Returns the shard
    table (shard, n)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(t: pa.Table) -> pd.DataFrame:
        import zlib

        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, t.schema) as w:
            w.write_table(t)
        body = sink.getvalue().to_pybytes()
        shard = f"part-{zlib.crc32(body):08x}-{t.num_rows}.arrow"
        final = os.path.join(out_dir, shard)
        if not os.path.exists(final):
            tmp = final + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(body)
            os.replace(tmp, final)
        return pd.DataFrame({"shard": [shard], "n": [t.num_rows]})

    return ds.map_batches(write_shard, batch_format="pyarrow",
                          batch_size=None)
