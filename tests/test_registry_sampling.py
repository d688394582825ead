"""Pipeline-step registry, sampling operators, Lance seam."""

import numpy as np
import pyarrow as pa
import pytest


def test_registry_chain_and_errors(ray_session):
    import ray.data as rd

    from gdal_ray.pipelines.registry import Pipeline, list_steps, register_step

    assert {"filter", "derive", "select", "rename", "sort", "limit",
            "sample", "distinct"} <= set(list_steps())
    with pytest.raises(KeyError):
        Pipeline([("nope", {})])

    ds = rd.from_items([{"a": i, "b": i % 3} for i in range(100)])
    pipe = Pipeline(
        [
            ("filter", {"expr": "a >= 10"}),
            ("derive", {"col": "c", "expr": "a * 2 + b"}),
            ("rename", {"mapping": {"b": "grp"}}),
            ("sort", {"keys": ["c", "a"], "descending": [True, True]}),
            ("limit", {"n": 5}),
        ]
    )
    assert "filter" in pipe.describe() and "limit" in pipe.describe()
    df = pipe.run(ds).to_pandas()
    assert list(df["a"]) == [99, 98, 97, 96, 95]
    assert (df["c"] == df["a"] * 2 + df["grp"]).all()

    # user extension: register a custom step and use it
    @register_step("double_col")
    def _double(ds2, col):
        import pandas as pd

        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b[col] = b[col] * 2
            return b

        return ds2.map_batches(fn, batch_format="pandas")

    out = Pipeline([("double_col", {"col": "a"})]).run(ds).to_pandas()
    assert sorted(out["a"])[:3] == [0, 2, 4]


def test_deterministic_sample_matches_formula(ray_session):
    import ray.data as rd

    from gdal_ray.stages.sampling import KNUTH, deterministic_sample, random_sample

    ds = rd.from_items([{"k": i} for i in range(1, 2001)])
    got = sorted(deterministic_sample(ds, "k", 10).to_pandas()["k"])
    want = sorted(k for k in range(1, 2001) if (k * KNUTH) % 100 < 10)
    assert got == want
    assert 150 < len(got) < 250  # ~10%

    frac = random_sample(ds, 0.25, seed=7).count() / 2000
    assert 0.15 < frac < 0.35


def test_lance_seam_missing_package(tmp_path):
    """A .lance dataset with no lance package raises at the documented seam
    (parquet fallback otherwise untouched)."""
    import os

    from gdal_ray.sources.corpus import read_table

    try:
        import lance  # noqa: F401

        pytest.skip("lance installed; seam exercises the real reader")
    except ImportError:
        pass
    os.makedirs(tmp_path / "images.lance")
    with pytest.raises(RuntimeError, match="lance package is unavailable"):
        read_table(str(tmp_path), "images")


def test_verified_text_near_dups_copartitioned(ray_session):
    """The co-partitioned text near-dup verify finds planted duplicates and
    emits no false positives — and completes in a small-CPU session
    (adaptive join partitions; a fixed 16-aggregator join would deadlock)."""
    import ray.data as rd

    from gdal_ray.stages.dedup import ngram_jaccard, verified_text_near_dups

    rng = np.random.default_rng(13)
    words = ["kappa", "tau", "sigma", "omega", "iota", "chi", "psi", "mu"]
    docs = []
    for i in range(60):
        docs.append(" ".join(rng.choice(words, size=60)))
    # plant 6 near-duplicates of the first 6 docs (tiny suffix change)
    planted = []
    for i in range(6):
        docs.append(docs[i] + " tail")
        planted.append((i, 60 + i))
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(docs)])
    got = verified_text_near_dups(ds, jaccard_threshold=0.8).to_pandas()
    pairs = set(map(tuple, got[["id_a", "id_b"]].itertuples(index=False)))
    for a, b in planted:
        assert ngram_jaccard(docs[a].lower(), docs[b].lower()) >= 0.8
        assert (a, b) in pairs, (a, b)
    # precision: every emitted pair is exactly above threshold
    for a, b in pairs:
        assert ngram_jaccard(docs[a].lower(), docs[b].lower()) >= 0.8


def test_lance_seam_and_parquet_fallback(tmp_path, ray_session):
    """sources/corpus.read_table prefers <name>.lance when present: with
    the lance package absent from this container it must raise the
    documented seam error; without the .lance directory it must fall back
    to the parquet layout and return identical rows."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from gdal_ray.sources.corpus import read_table

    t = pa.table({"image_id": ["a", "b"], "v": [1, 2]})
    pq.write_table(t, str(tmp_path / "things.parquet"))
    got = read_table(str(tmp_path), "things").to_pandas()
    assert got["image_id"].tolist() == ["a", "b"]

    (tmp_path / "things.lance").mkdir()
    try:
        import lance  # noqa: F401

        has_lance = True
    except ImportError:
        has_lance = False
    if not has_lance:
        with pytest.raises(RuntimeError, match="lance package is unavailable"):
            read_table(str(tmp_path), "things")


def test_geometry_pipeline_steps(ray_session):
    """The gdalalg_vector step family over WKB: swap-xy/segmentize/
    simplify/centroid/explode against scalar expectations."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gdal_ray.geo import wkb as W
    from gdal_ray.pipelines.registry import Pipeline

    square = W.encode_polygon(
        [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])])
    mline = W.encode_multilinestring(
        [np.array([[0.0, 0.0], [10.0, 0.0]]),
         np.array([[0.0, 5.0], [0.0, 9.0]])])
    ds = rd.from_pandas(pd.DataFrame({
        "fid": [1, 2], "geometry": [square, mline]}))

    # swap-xy is an involution
    out = Pipeline([("swap-xy", {}), ("swap-xy", {})]).run(ds).to_pandas()
    assert bytes(out["geometry"][0]) == square

    # segmentize: the 10-unit line at max 2.5 gains interior vertices
    seg = Pipeline([("segmentize", {"max_length": 2.5})]).run(ds).to_pandas()
    segline = W.decode_lines(bytes(seg["geometry"][1]))[0]
    assert len(segline) == 5 and segline[1][0] == 2.5

    # centroid of the square (polygon row only)
    cen = Pipeline([("centroid", {})]).run(
        ds.filter(lambda r: r["fid"] == 1)).to_pandas()
    x, y = W.decode_points([bytes(cen["geometry"][0])])
    assert (x[0], y[0]) == (2.0, 2.0)

    # explode-collections doubles the multi-line row
    ex = Pipeline([("explode-collections", {})]).run(ds).to_pandas()
    assert len(ex) == 3 and list(ex["fid"]) == [1, 2, 2]

    # reproject 4326 -> 3857 and back is identity within float tolerance
    ll = W.encode_point(12.0, 55.0)
    ds2 = rd.from_pandas(pd.DataFrame({"geometry": [ll]}))
    rt = Pipeline([
        ("reproject", {"src_srs": "EPSG:4326", "dst_srs": "EPSG:3857"}),
        ("reproject", {"src_srs": "EPSG:3857", "dst_srs": "EPSG:4326"}),
    ]).run(ds2).to_pandas()
    x2, y2 = W.decode_points([bytes(rt["geometry"][0])])
    assert abs(x2[0] - 12.0) < 1e-9 and abs(y2[0] - 55.0) < 1e-9


def test_clip_pipeline_step(ray_session):
    """clip step: unit squares against a bbox — surviving area and
    dropped rows match the closed form."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gdal_ray.geo import geomops as GO
    from gdal_ray.geo import wkb as W
    from gdal_ray.pipelines.registry import Pipeline

    squares = [W.encode_polygon(
        [np.array([[float(x), 0.0], [x + 1.0, 0.0],
                   [x + 1.0, 1.0], [float(x), 1.0]])]) for x in range(6)]
    ds = rd.from_pandas(pd.DataFrame({"fid": list(range(6)),
                                      "geometry": squares}))
    out = Pipeline([("clip", {"bbox": [1.5, 0.25, 3.5, 0.75]})]) \
        .run(ds).to_pandas().sort_values("fid")
    # squares 1, 2, 3 intersect; 0, 4, 5 drop
    assert list(out["fid"]) == [1, 2, 3]
    areas = []
    for b in out["geometry"]:
        rings = W.decode_polygons(bytes(b))
        areas.append(sum(abs(GO.ring_area(r[0])) for r in rings))
    assert areas == pytest.approx([0.25, 0.5, 0.25])


def test_sql_pipeline_step(ray_session):
    """sql step (gdalalg_vector_sql): the piped layer binds as table
    ``input``; full OGR SQL surface applies."""
    import pandas as pd
    import ray.data as rd

    from gdal_ray.pipelines.registry import Pipeline

    ds = rd.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3, 4], "g": ["a", "b", "a", "b"], "v": [10, 20, 30, 40]}))
    out = Pipeline([
        ("sql", {"statement":
                 "SELECT g, SUM(v) AS total FROM input "
                 "WHERE k > 1 GROUP BY g ORDER BY g"}),
    ]).run(ds).to_pandas()
    assert list(out["g"]) == ["a", "b"]
    assert list(out["total"]) == [30, 60]


def test_concat_pipeline_step(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    from gdal_ray.pipelines.registry import Pipeline

    other = tmp_path / "other.parquet"
    pd.DataFrame({"fid": [10, 11], "v": [7, 8]}).to_parquet(other)
    ds = rd.from_pandas(pd.DataFrame({"fid": [1, 2], "v": [5, 6]}))
    out = Pipeline([("concat", {"src": str(other)})]).run(ds).to_pandas()
    assert sorted(out["fid"].tolist()) == [1, 2, 10, 11]
    assert out["v"].sum() == 26


def test_buffer_pipeline_step(ray_session):
    """buffer step: point -> disc area converges to pi*r^2; polygon ->
    convex buffer area = A + P*r + pi*r^2 (Minkowski, up to arc
    discretization)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gdal_ray.geo import geomops as GO
    from gdal_ray.geo import wkb as W
    from gdal_ray.pipelines.registry import Pipeline

    sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    ds = rd.from_pandas(pd.DataFrame({
        "fid": [0, 1],
        "geometry": [W.encode_point(1.0, 2.0), W.encode_polygon([sq])],
    }))
    out = Pipeline([("buffer", {"distance": 2.0, "quadsegs": 32})]) \
        .run(ds).to_pandas().sort_values("fid")
    areas = [abs(GO.ring_area(W.decode_polygons(bytes(b))[0][0]))
             for b in out["geometry"]]
    assert areas[0] == pytest.approx(np.pi * 4.0, rel=2e-3)
    assert areas[1] == pytest.approx(16.0 + 16.0 * 2.0 + np.pi * 4.0, rel=2e-3)


def test_quantiles_and_heavy_hitters_steps(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gdal_ray.pipelines.registry import Pipeline

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], 4000),
        "v": rng.integers(0, 50, 4000),
        "id": np.arange(4000, dtype=np.int64),
    })
    ds = rd.from_pandas(df).repartition(4)
    out = Pipeline([("quantiles", {"col": "v", "q": "50,90"})]).run(ds).to_pandas()
    assert set(out["q_pct"]) == {50, 90}
    grp = Pipeline([("quantiles", {"col": "v", "q": "50", "key": "g"})]) \
        .run(ds).to_pandas()
    assert len(grp) == 2
    hh = Pipeline([("heavy-hitters", {"col": "v", "denom": 60})]).run(ds) \
        .to_pandas()
    thresh = -(-4000 // 60)
    uniq, cnt = np.unique(df["v"], return_counts=True)
    assert set(hh["value"]) == {int(v) for v, c in zip(uniq, cnt) if c >= thresh}
    ss = Pipeline([("stratified-sample", {"key": "g", "id_col": "id", "n": 7})]) \
        .run(ds).to_pandas()
    assert (ss.groupby("g").size() == 7).all()
