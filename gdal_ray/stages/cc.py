"""Distributed connected components — near-dup pairs -> dedup clusters.

The missing last stage of the dedup family: pHash/MinHash/SimHash emit
verified PAIRS, but curation needs CLUSTERS (keep one canonical doc per
component). ``connected_components`` combines the two classic
label-propagation moves, each expressed as bucketed co-shuffles:

- **neighbour propagation**: every node offers its current label to its
  edge peers (edges + labels co-shuffle on the node id);
- **pointer jumping**: every node also asks its current label-parent
  for THAT node's label (label[n] <- label[label[n]]), which collapses
  chains exponentially — total rounds are O(log n) instead of
  O(diameter), the Shiloach-Vishkin shortcut.

Rounds repeat until no label changes. Each round materializes the
(node, label) table — the iterative-algorithm checkpoint shape, bounded
by the DISTINCT NODES in the pair set (not the corpus).

``dup_clusters`` composes it: pairs -> components -> per-component
canonical keeper (min id) + size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["connected_components", "dup_clusters"]

_NODE_SCHEMA = pa.schema(
    [pa.field("node", pa.int64()), pa.field("label", pa.int64())]
)
# internal mixed-row schema: kind 0 = label row (key = node it labels),
# kind 1 = offer/request row (key = lookup node, target = recipient)
_MIX_SCHEMA = pa.schema(
    [pa.field("key", pa.int64()), pa.field("target", pa.int64()),
     pa.field("label", pa.int64()), pa.field("kind", pa.int8())]
)


def _resolve(labels_mixed_ds, num_buckets):
    """Co-shuffle label rows + request rows on ``key``; every request
    (key=L, target=n) yields an offer (node=n, label=label[L])."""
    from gdal_ray.ops.shuffle import bucketed_group_apply

    def fulfil(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["kind"] == 0]
        req = df[df["kind"] == 1]
        m = dict(zip(lab["key"], lab["label"]))
        return pd.DataFrame(
            {"node": req["target"].to_numpy(dtype=np.int64),
             "label": req["key"].map(m).to_numpy(dtype=np.int64)}
        )

    return bucketed_group_apply(
        labels_mixed_ds, ["key"], fulfil, num_buckets, schema=_NODE_SCHEMA
    )


def connected_components(pairs_ds, a_col: str = "a", b_col: str = "b",
                         max_iters: int = 40, num_buckets: int = 16):
    """(a, b) int64 pair Dataset -> (node, comp) with comp = the
    component's smallest node id. Deterministic."""
    from gdal_ray.ops.shuffle import bucketed_group_apply

    def to_edges(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch[a_col], dtype=np.int64)
        b = np.asarray(batch[b_col], dtype=np.int64)
        # both directions so each endpoint sees the edge in its group
        return pa.table(
            {"node": pa.array(np.concatenate([a, b])),
             "peer": pa.array(np.concatenate([b, a]))}
        )

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pd.DataFrame:
        n = np.unique(np.asarray(batch["node"], dtype=np.int64))
        return pd.DataFrame({"node": n, "label": n})

    def dedup_nodes(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["label"].min()

    labels = bucketed_group_apply(
        edges.map_batches(init_labels, batch_format="pyarrow"),
        ["node"], dedup_nodes, num_buckets, schema=_NODE_SCHEMA,
    ).materialize()

    def label_mix(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["node"], dtype=np.int64)
        lb = np.asarray(batch["label"], dtype=np.int64)
        return pa.table(
            {"key": pa.array(n), "target": pa.array(n),
             "label": pa.array(lb),
             "kind": pa.array(np.zeros(len(n), np.int8))}
        )

    def edge_req(batch: pa.Table) -> pa.Table:
        # neighbour propagation: ask peer's label, deliver to me — and
        # symmetric rows exist because edges carry both directions
        n = np.asarray(batch["node"], dtype=np.int64)
        p = np.asarray(batch["peer"], dtype=np.int64)
        return pa.table(
            {"key": pa.array(n), "target": pa.array(p),
             "label": pa.array(np.full(len(n), -1, np.int64)),
             "kind": pa.array(np.ones(len(n), np.int8))}
        )

    def jump_req(batch: pa.Table) -> pa.Table:
        # pointer jumping: label[n] <- label[label[n]]
        n = np.asarray(batch["node"], dtype=np.int64)
        lb = np.asarray(batch["label"], dtype=np.int64)
        return pa.table(
            {"key": pa.array(lb), "target": pa.array(n),
             "label": pa.array(np.full(len(n), -1, np.int64)),
             "kind": pa.array(np.ones(len(n), np.int8))}
        )

    for _ in range(max_iters):
        mixed = (
            labels.map_batches(label_mix, batch_format="pyarrow")
            .union(edges.map_batches(edge_req, batch_format="pyarrow"))
            .union(labels.map_batches(jump_req, batch_format="pyarrow"))
        )
        offers = _resolve(mixed, num_buckets)
        new_labels = bucketed_group_apply(
            offers.union(labels), ["node"], dedup_nodes, num_buckets,
            schema=_NODE_SCHEMA,
        ).materialize()

        def diff_count(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("node")["label"]
            return pd.DataFrame({"changed": [int((g.nunique() > 1).sum())]})

        changed = bucketed_group_apply(
            labels.union(new_labels), ["node"], diff_count, num_buckets,
            schema=pa.schema([pa.field("changed", pa.int64())]),
        ).to_pandas()["changed"].sum()
        labels = new_labels
        if int(changed) == 0:
            break

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["node", "comp"])

    return labels.map_batches(finish, batch_format="pyarrow")


def dup_clusters(pairs_ds, a_col: str = "a", b_col: str = "b",
                 num_buckets: int = 16):
    """pairs -> (comp, size, keeper): one row per duplicate cluster with
    its canonical keeper (smallest id) — what a curation pipeline joins
    back to drop the other members."""
    from gdal_ray.ops.shuffle import bucketed_group_apply

    comp = connected_components(pairs_ds, a_col, b_col,
                                num_buckets=num_buckets)

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
