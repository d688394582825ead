"""OGR layer algebra over two polygon layers, cell-partitioned.

Lifts the pairwise boolean kernels (``geo/booleanops.py``) to LAYER
operations with the reference's method semantics (reference
``ogr/ogrsf_frmts/generic/ogrlayer.cpp``: Union :3763, SymDifference :4300,
Identity :4743, Intersection :3345):

- every A feature is reduced by ALL intersecting B features (and vice
  versa for Union/SymDifference's B side);
- Union/Identity additionally emit one feature per intersecting (a, b) pair;
- features that intersect nothing pass through with their full geometry.

The Ray plan is the scale-correct one the PIP join and point query already
use, in exactly TWO keyed shuffles:

  1. both layers explode to quadkey-cell covers of their envelopes; one
     bucketed cell shuffle emits cross-side envelope-overlapping candidate
     pairs;
  2. each pair re-keys by its OWNING feature (once per side that reduces),
     unions with the bare features of both layers, and one bucketed fid
     shuffle runs the per-feature reduction — duplicates from multi-cell
     pairs are deduped inside the owning group (no separate dedup pass).

No driver-side loops, no O(|A| x |B|) scan; compute scales with candidate
pairs. Output is the per-feature AREA table (fid, src, area): geometry
pieces are interior-disjoint convex rings whose decomposition is
kernel-specific, so the stable, oracle-checkable surface is the measure.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from gdal_ray.config import CELL_LEVEL
from gdal_ray.geo import wkb as W
from gdal_ray.geo.booleanops import (
    pieces_area,
    polygon_difference,
    polygon_intersection,
    triangulate_ring,
)
from gdal_ray.geo.geomops import ring_area
from gdal_ray.ops.shuffle import bucketed_group_apply
from gdal_ray.stages.pipjoin import explode_polygon_covers

__all__ = ["layer_boolean_areas", "cross_side_candidates", "CAND_PAIR_SCHEMA"]

CAND_PAIR_SCHEMA = pa.schema(
    [
        ("fid_a", pa.string()),
        ("fid_b", pa.string()),
        ("wkb_a", pa.binary()),
        ("wkb_b", pa.binary()),
    ]
)

_ROW_SCHEMA = pa.schema(
    [
        ("side", pa.string()),
        ("fid", pa.string()),
        ("pfid", pa.string()),
        ("wkb", pa.binary()),
        ("pwkb", pa.binary()),
    ]
)

_OUT_SCHEMA = pa.schema(
    [("fid", pa.string()), ("src", pa.string()), ("area", pa.float64())]
)


def _covers(layer, side: str, level: int):
    def prep(batch: pa.Table, s=side) -> pa.Table:
        t = explode_polygon_covers(
            pa.table({"poly_id": batch["fid"], "wkb": batch["wkb"]}), level=level
        )
        return t.append_column("side", pa.array([s] * len(t), pa.string()))

    return layer.map_batches(prep, batch_format="pyarrow")


def cross_side_candidates(layer_a, layer_b, level: int = CELL_LEVEL, num_buckets: int = 32):
    """Cross-side envelope-overlapping (a, b) pairs (shuffle 1 of 2).

    Layers are datasets with (fid: string, wkb: binary) polygon features.
    A pair whose bbox intersection spans multiple cells is emitted from
    each — consumers dedup per owning group (cheaper than a dedicated
    keyed dedup pass at lattice/gate scale, identical result).
    """
    both = _covers(layer_a, "a", level).union(_covers(layer_b, "b", level))

    def pairs(part: pd.DataFrame) -> pd.DataFrame:
        rows = {"fid_a": [], "fid_b": [], "wkb_a": [], "wkb_b": []}
        for _, g in part.groupby("cell", sort=False):
            ga = g[g["side"] == "a"]
            gb = g[g["side"] == "b"]
            if len(ga) == 0 or len(gb) == 0:
                continue
            ea = ga[["minx", "miny", "maxx", "maxy"]].to_numpy()
            eb = gb[["minx", "miny", "maxx", "maxy"]].to_numpy()
            ids_a = ga["poly_id"].to_numpy()
            ids_b = gb["poly_id"].to_numpy()
            wk_a = ga["wkb"].to_numpy()
            wk_b = gb["wkb"].to_numpy()
            for i in range(len(ids_a)):
                m = (
                    (ea[i, 0] <= eb[:, 2]) & (eb[:, 0] <= ea[i, 2])
                    & (ea[i, 1] <= eb[:, 3]) & (eb[:, 1] <= ea[i, 3])
                )
                if not m.any():
                    continue
                idx = np.flatnonzero(m)
                rows["fid_a"].extend([ids_a[i]] * len(idx))
                rows["fid_b"].extend(ids_b[idx])
                rows["wkb_a"].extend([wk_a[i]] * len(idx))
                rows["wkb_b"].extend(wk_b[idx])
        return pd.DataFrame(
            {k: pd.Series(v, dtype=object) for k, v in rows.items()}
        )

    return bucketed_group_apply(both, ["cell"], pairs, num_buckets, schema=CAND_PAIR_SCHEMA)


def layer_boolean_areas(layer_a, layer_b, op: str, level: int = CELL_LEVEL, num_buckets: int = 32):
    """Layer Union / SymDifference / Identity area table (shuffle 2 of 2).

    ``op``:
      - ``"symdifference"`` (ogrlayer.cpp:4300): every A feature minus all
        intersecting B features + every B feature minus all intersecting A;
      - ``"union"`` (ogrlayer.cpp:3763): SymDifference rows PLUS one A∩B
        feature per intersecting pair (src='AB', fid='fid_a|fid_b');
      - ``"identity"`` (ogrlayer.cpp:4743): A∩B pairs + reduced A features
        (B side not emitted);
      - ``"erase"`` (ogrlayer.cpp:5806): reduced A features only (A \\ B);
      - ``"update"`` (ogrlayer.cpp:5148): reduced A features + every B
        feature UNREDUCED (method features replace overlapped input area).

    Returns (fid, src in {'A','B','AB'}, area) rows; fully-consumed
    features emit area 0.0 (callers filter per OGR's skip-empty rule when
    materializing geometries).
    """
    if op not in ("union", "symdifference", "identity", "erase", "update"):
        raise ValueError(f"unsupported layer op: {op!r}")
    emit_inter = op in ("union", "identity")
    reduce_b = op in ("union", "symdifference")
    cand = cross_side_candidates(layer_a, layer_b, level, num_buckets)

    def expand(batch: pa.Table) -> pa.Table:
        # one reduction row per (owning side, pair)
        parts = [
            pa.table(
                {
                    "side": pa.array(["a"] * len(batch), pa.string()),
                    "fid": batch["fid_a"],
                    "pfid": batch["fid_b"],
                    "wkb": batch["wkb_a"],
                    "pwkb": batch["wkb_b"],
                }
            )
        ]
        if reduce_b:
            parts.append(
                pa.table(
                    {
                        "side": pa.array(["b"] * len(batch), pa.string()),
                        "fid": batch["fid_b"],
                        "pfid": batch["fid_a"],
                        "wkb": batch["wkb_b"],
                        "pwkb": batch["wkb_a"],
                    }
                )
            )
        return pa.concat_tables(parts)

    def feats(side: str):
        def prep(batch: pa.Table, s=side) -> pa.Table:
            n = len(batch)
            return pa.table(
                {
                    "side": pa.array([s] * n, pa.string()),
                    "fid": batch["fid"],
                    "pfid": pa.array([None] * n, pa.string()),
                    "wkb": batch["wkb"],
                    "pwkb": pa.array([None] * n, pa.binary()),
                }
            )

        return prep

    rows_ds = cand.map_batches(expand, batch_format="pyarrow").union(
        layer_a.map_batches(feats("a"), batch_format="pyarrow")
    )
    if reduce_b or op == "update":
        # update: B features ride through with NO candidate partners, so
        # the reduce emits them at full area (method features replace the
        # overlapped input area — ogrlayer.cpp:5148)
        rows_ds = rows_ds.union(layer_b.map_batches(feats("b"), batch_format="pyarrow"))

    def reduce_group(part: pd.DataFrame) -> pd.DataFrame:
        out = {"fid": [], "src": [], "area": []}
        for (side, fid), g in part.groupby(["side", "fid"], sort=False):
            wkb_own = next((w for w in g["wkb"] if w is not None), None)
            if wkb_own is None:
                continue
            ring = W.decode_polygons(wkb_own)[0][0]
            partners = (
                g[g["pfid"].notna()].drop_duplicates("pfid").sort_values("pfid")
            )
            pieces = list(triangulate_ring(ring))
            for pwkb, pfid in zip(partners["pwkb"], partners["pfid"]):
                pring = W.decode_polygons(pwkb)[0][0]
                if emit_inter and side == "a":
                    inter = pieces_area(polygon_intersection(ring, pring))
                    # emit the A∩B pair feature only when the geometries
                    # actually intersect (reference ogrlayer.cpp Union/
                    # Identity skip non-intersecting candidates); envelope
                    # overlap alone does not imply a real intersection
                    if inter > 1e-12:
                        out["fid"].append(f"{fid}|{pfid}")
                        out["src"].append("AB")
                        out["area"].append(round(inter, 6))
                nxt = []
                for p in pieces:
                    nxt.extend(polygon_difference(np.asarray(p), pring))
                pieces = [p for p in nxt if abs(ring_area(np.asarray(p))) > 1e-12]
                if not pieces and not (emit_inter and side == "a"):
                    break
            # close every piece before measuring (triangulate_ring emits
            # OPEN triangles; a duplicated closing vertex adds zero area)
            closed = [np.vstack([np.asarray(p), np.asarray(p)[:1]]) for p in pieces]
            out["fid"].append(str(fid))
            out["src"].append(side.upper())
            out["area"].append(round(pieces_area(closed), 6))
        return pd.DataFrame(
            {
                "fid": pd.Series(out["fid"], dtype=object),
                "src": pd.Series(out["src"], dtype=object),
                "area": pd.Series(out["area"], dtype=np.float64),
            }
        )

    return bucketed_group_apply(
        rows_ds, ["side", "fid"], reduce_group, num_buckets, schema=_OUT_SCHEMA
    )
