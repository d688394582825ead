"""SemDeDup (gdal_ray/stages/simsearch.semdedup) vs an exact
single-process replica; planted-duplicate semantics; chunked component
builder equivalence."""

import numpy as np
import pandas as pd
import pytest


def _unit(m):
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def _replica(ids, vecs, centroids, threshold):
    """Single-process replica of the full semdedup algorithm."""
    out = {}
    cent = np.asarray(centroids, dtype=np.float32)
    d = ((vecs.astype(np.float32)[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    assign = d.argmin(1)
    cu = _unit(cent.astype(np.float64))
    for cid in np.unique(assign):
        m = assign == cid
        cids = ids[m]
        order = np.argsort(cids, kind="stable")
        cids = cids[order]
        u = _unit(vecs[m][order].astype(np.float64))
        n = len(cids)
        # brute-force union-find
        parent = list(range(n))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        s = u @ u.T
        for a in range(n):
            for b in range(a + 1, n):
                if s[a, b] > threshold:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        root = np.array([find(i) for i in range(n)])
        csim = u @ cu[int(cid)]
        for r in np.unique(root):
            comp = np.nonzero(root == r)[0]
            kidx = comp[np.lexsort((cids[comp], csim[comp]))[0]]
            for i in comp:
                out[int(cids[i])] = (
                    int(cid), bool(i == kidx), int(len(comp)))
    return out


def test_semdedup_matches_replica(ray_session):
    import ray.data as rd

    from gdal_ray.stages.simsearch import kmeans_fit, semdedup

    rng = np.random.default_rng(5)
    n, dim = 300, 16
    base = rng.normal(size=(n, dim))
    # plant duplicate pairs/triples: near-copies of existing rows
    base[50] = base[10] + 1e-3
    base[51] = base[10] - 1e-3
    base[200] = base[199] * 1.5  # scaled copy: cosine 1
    ids = np.arange(1000, 1000 + n)
    df = pd.DataFrame(
        {"vec_id": ids,
         "embedding": [v.tolist() for v in base.astype(np.float32)]})

    cent = kmeans_fit(base[:128].astype(np.float32), 8, seed=42)
    got = (
        semdedup(rd.from_pandas(df).repartition(4), threshold=0.9,
                 centroids=cent)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    exp = _replica(ids, base.astype(np.float32), cent, 0.9)
    assert len(got) == n
    for _, r in got.iterrows():
        e = exp[int(r["vec_id"])]
        assert (int(r["cluster"]), bool(r["keep"]), int(r["n_dup"])) == e, r
    # the planted groups actually deduplicated
    g = got.set_index("vec_id")
    assert g.loc[1200, "n_dup"] == 2 and g.loc[1199, "n_dup"] == 2
    assert int(g.loc[[1199, 1200], "keep"].sum()) == 1
    assert g.loc[1010, "n_dup"] >= 2
    # exactly one keeper per duplicate component overall
    dropped = int((~got["keep"]).sum())
    assert dropped >= 3  # 1050,1051 vs 1010; one of 1199/1200


def test_dup_components_chunk_invariance():
    from gdal_ray.stages.simsearch import _dup_components

    rng = np.random.default_rng(9)
    m = rng.normal(size=(57, 8))
    m[30] = m[2] + 1e-4
    m[31] = m[30] + 1e-4
    u = _unit(m)
    ids = np.arange(57)
    a = _dup_components(u, ids, 0.8, chunk=3)
    b = _dup_components(u, ids, 0.8, chunk=4096)
    assert np.array_equal(a, b)
    # 2,30,31 share one component
    assert a[2] == a[30] == a[31]


def test_semdedup_keeper_rule(ray_session):
    """Keeper = LOWEST cosine to centroid within a component (tie: lower
    id): construct one cluster where the duplicate pair's far-from-centroid
    member must win."""
    import ray.data as rd

    from gdal_ray.stages.simsearch import semdedup

    cent = np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    v = np.array([
        [1.0, 0.05],   # id 1: dup pair member, close to centroid 0
        [1.0, 0.30],   # id 2: dup pair member, farther from centroid 0
        [0.1, 1.0],    # id 3: alone in cluster 1
    ], dtype=np.float32)
    df = pd.DataFrame({"vec_id": [1, 2, 3],
                       "embedding": [r.tolist() for r in v]})
    got = (
        semdedup(rd.from_pandas(df), threshold=0.9, centroids=cent)
        .to_pandas().set_index("vec_id")
    )
    assert bool(got.loc[2, "keep"]) and not bool(got.loc[1, "keep"])
    assert bool(got.loc[3, "keep"]) and got.loc[3, "n_dup"] == 1


def test_q_semdedup_registered(ray_session):
    import __ray_entry__ as E

    r = E.queries()["q_semdedup"]("/root/testdata/sf0.001").to_pandas()
    assert list(r.columns) == ["vec_id", "cluster", "keep", "n_dup"]
    assert len(r) == 500 and r["keep"].sum() < 500
    assert (r.loc[~r["keep"], "n_dup"] >= 2).all()
