"""Per-partition checkpoint manifest: lineage + row counts + cell histogram.

Formalizes gdal2tiles' filesystem-as-checkpoint (`--resume` probes
``isfile()`` per tile, gdal2tiles.py:1497-1499, 2846-2848) into an explicit
manifest so a killed run resumes without recomputing completed partitions:

- one JSON record per completed partition, keyed by partition id;
- ``lineage``: hash of the INPUT fragments (paths + sizes + mtimes) the
  partition was computed from — a changed input invalidates the record,
  wall-clock never does;
- metrics (row count + cell histogram) double as the skew telemetry that
  drives hot-cell salting on the next run;
- writes are atomic (temp file + rename) and idempotent: re-completing a
  partition overwrites the same record file.

The output layout contract is one directory per partition
(``<out>/part=<pid>/``), written via temp-dir + rename by the caller.
"""

from __future__ import annotations

import hashlib
import json
import os
import pathlib

__all__ = ["Manifest", "fragment_lineage"]


def fragment_lineage(paths) -> str:
    """Stable hash of input files (path, size, mtime_ns); directories are
    expanded to their files."""
    h = hashlib.sha256()
    expanded = []
    for p in paths:
        p = str(p)
        if os.path.isdir(p):
            expanded.extend(os.path.join(p, f) for f in os.listdir(p))
        else:
            expanded.append(p)
    for p in sorted(expanded):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


class Manifest:
    def __init__(self, root: str):
        self.root = pathlib.Path(root)
        self.dir = self.root / "_manifest"
        self.dir.mkdir(parents=True, exist_ok=True)

    def _rec_path(self, partition_id) -> pathlib.Path:
        return self.dir / f"{partition_id}.json"

    def completed(self, partition_id, lineage: str) -> bool:
        """True iff the partition finished under the SAME input lineage."""
        p = self._rec_path(partition_id)
        if not p.exists():
            return False
        try:
            rec = json.loads(p.read_text())
        except (json.JSONDecodeError, OSError):
            return False
        return rec.get("lineage") == lineage

    def mark(self, partition_id, lineage: str, n_rows: int, cell_hist: dict | None = None, extra: dict | None = None):
        rec = {
            "partition_id": str(partition_id),
            "lineage": lineage,
            "n_rows": int(n_rows),
            "cell_hist": {str(k): int(v) for k, v in (cell_hist or {}).items()},
        }
        if extra:
            rec.update(extra)
        tmp = self._rec_path(partition_id).with_suffix(".tmp")
        tmp.write_text(json.dumps(rec))
        tmp.rename(self._rec_path(partition_id))

    def pending(self, partition_ids, lineage: str):
        """Anti-join: partitions still to compute under this lineage."""
        return [p for p in partition_ids if not self.completed(p, lineage)]

    def records(self) -> list[dict]:
        out = []
        for f in sorted(self.dir.glob("*.json")):
            try:
                out.append(json.loads(f.read_text()))
            except (json.JSONDecodeError, OSError):
                continue
        return out

    def hot_cells(self, cap: int) -> set:
        """Cells whose accumulated row count exceeds cap (salting input)."""
        agg: dict[str, int] = {}
        for rec in self.records():
            for c, n in rec.get("cell_hist", {}).items():
                agg[c] = agg.get(c, 0) + n
        return {int(c) for c, n in agg.items() if n > cap}
