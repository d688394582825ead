"""Distributed connected components — near-dup pairs -> dedup clusters.

The missing last stage of the dedup family: pHash/MinHash/SimHash emit
verified PAIRS, but curation needs CLUSTERS (keep one canonical doc per
component). ``connected_components`` uses the filtering scheme of
Kiveris et al. ("Connected components in MapReduce and beyond", 2014,
simplified): every block runs a LOCAL min-root union-find over its
edges and emits only its spanning forest as (node, root) rows — at most
one row per distinct node in the block. Blocks then merge 8-into-1
(``repartition`` without shuffle — a cheap block concatenation, no
sort) and the contraction repeats. Each round shrinks both the edge
volume (forest <= nodes, while input edges can be much denser) and the
block count, so O(log_8 blocks) rounds reach a single block whose
union-find over the accumulated forests is connectivity-equivalent to
the whole graph — the result is EXACT, determinism comes from the
min-root rule.

The final round runs in one Ray task over the concatenated forests;
its size is bounded by the DISTINCT NODES in the pair set (the docs
that have at least one near-dup partner), not the corpus.

``dup_clusters`` composes it: pairs -> components -> per-component
canonical keeper (min id) + size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["connected_components", "dup_clusters"]

_EDGE_SCHEMA = pa.schema(
    [pa.field("node", pa.int64()), pa.field("root", pa.int64())]
)


def _local_forest(batch: pa.Table) -> pa.Table:
    """Min-root union-find over one block's edges -> spanning rows
    (node, root), one per distinct node (roots map to themselves)."""
    a = np.asarray(batch[0], dtype=np.int64)
    b = np.asarray(batch[1], dtype=np.int64)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in zip(a.tolist(), b.tolist()):
        ru, rv = find(u), find(v)
        if ru != rv:
            # min-root rule keeps the labelling deterministic
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    nodes = np.fromiter(parent.keys(), dtype=np.int64, count=len(parent))
    roots = np.fromiter((find(int(n)) for n in nodes), dtype=np.int64,
                        count=len(nodes))
    return pa.table({"node": pa.array(nodes), "root": pa.array(roots)})


def connected_components(pairs_ds, a_col: str = "a", b_col: str = "b",
                         fan_in: int = 8):
    """(a, b) int64 pair Dataset -> (node, comp) Dataset with comp = the
    component's smallest node id. Exact and deterministic."""

    def to_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch[a_col].cast(pa.int64()),
             "root": batch[b_col].cast(pa.int64())}
        )

    eds = pairs_ds.map_batches(
        to_edges, batch_format="pyarrow"
    ).map_batches(
        _local_forest, batch_format="pyarrow", batch_size=None
    ).materialize()

    while eds.num_blocks() > 1:
        target = max(1, eds.num_blocks() // int(fan_in))
        eds = eds.repartition(target).map_batches(
            _local_forest, batch_format="pyarrow", batch_size=None
        ).materialize()

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["node", "comp"])

    return eds.map_batches(rename, batch_format="pyarrow")


def dup_clusters(pairs_ds, a_col: str = "a", b_col: str = "b",
                 num_buckets: int = 16):
    """pairs -> (comp, size, keeper): one row per duplicate cluster with
    its canonical keeper (smallest id) — what a curation pipeline joins
    back to drop the other members."""
    from gdal_ray.ops.shuffle import bucketed_group_apply

    comp = connected_components(pairs_ds, a_col, b_col)

    def per_comp(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("comp")["node"]
        return pd.DataFrame(
            {"comp": g.min().index.to_numpy(dtype=np.int64),
             "size": g.size().to_numpy(dtype=np.int64),
             "keeper": g.min().to_numpy(dtype=np.int64)}
        )

    return bucketed_group_apply(
        comp, ["comp"], per_comp, num_buckets,
        schema=pa.schema([pa.field("comp", pa.int64()),
                          pa.field("size", pa.int64()),
                          pa.field("keeper", pa.int64())]),
    )
