"""End-to-end flagship pipeline vs precomputed scalar oracles (FIXTURES.md
invariants 1-2): exact tile assignment, exact PIP join rows, exact kNN,
decode invariants (PSNR/allclose + caption byte-equality + phash check)."""

import numpy as np
import pyarrow.parquet as pq
import pytest


def _setof(df, cols):
    return set(map(tuple, df[cols].itertuples(index=False)))


@pytest.fixture(scope="module")
def placed(ray_session, corpus):
    from gdal_ray.pipelines import flagship as F

    return F.placed_images(corpus, decode=True).materialize()


def test_tile_assignments_exact(ray_session, corpus, placed):
    from gdal_ray.pipelines import flagship as F

    tiles = F.tile_assignments(placed).to_pandas()
    want = pq.read_table(f"{corpus}/oracle_tiles.parquet").to_pandas()
    assert _setof(tiles, ["image_id", "z", "x", "y"]) == _setof(want, ["image_id", "z", "x", "y"])
    assert len(tiles) == len(want)  # no duplicate rows either


def test_pip_join_exact(ray_session, corpus, placed):
    from gdal_ray.pipelines import flagship as F

    got = F.pip_join_images(placed, corpus).to_pandas()
    qgot = F.pip_join_query_points(corpus).to_pandas()
    want = pq.read_table(f"{corpus}/oracle_pip.parquet").to_pandas()
    all_got = _setof(got, ["src_id", "poly_id"]) | _setof(qgot, ["src_id", "poly_id"])
    assert all_got == _setof(want, ["src_id", "poly_id"])


def test_knn_exact(ray_session, corpus):
    from gdal_ray.pipelines import flagship as F

    got = F.knn_images(corpus).to_pandas()
    want = pq.read_table(f"{corpus}/oracle_knn.parquet").to_pandas()
    assert _setof(got, ["query_id", "rank", "image_id"]) == _setof(
        want, ["query_id", "rank", "image_id"]
    )
    # distances agree
    g = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    w = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    np.testing.assert_allclose(g["dist"], w["dist"], rtol=1e-9)


def test_knn_exact_shuffle_path(ray_session, corpus):
    """The co-partitioned shuffle kNN (no broadcast index) matches the same
    precomputed oracle as the broadcast path."""
    from gdal_ray.pipelines import flagship as F

    got = F.knn_images_shuffle(corpus).to_pandas()
    want = pq.read_table(f"{corpus}/oracle_knn.parquet").to_pandas()
    assert _setof(got, ["query_id", "rank", "image_id"]) == _setof(
        want, ["query_id", "rank", "image_id"]
    )
    g = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    w = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    np.testing.assert_allclose(g["dist"], w["dist"], rtol=1e-9)


def test_decode_invariants(ray_session, corpus, placed):
    df = placed.to_pandas()
    # phash recomputed from decoded pixels equals the stored column
    assert (df["phash_check"] == df["phash"]).all()
    # captions intact and keyed by image_id
    assert df.apply(lambda r: r["image_id"] in r["caption"], axis=1).all()


def test_decode_pixels_match_reference(ray_session, corpus):
    """allclose (png) / PSNR>=40dB (lossy) against stored reference pixels."""
    import pandas as pd

    from gdal_ray.io import codec as C
    from gdal_ray.sources import corpus as SRC

    sample = SRC.read_images(corpus).limit(64).to_pandas()
    for _, row in sample.iterrows():
        ref = np.load(f"{corpus}/pixels_ref/{row['image_id']}.npy")
        dec = C.decode_image(row["bytes"], row["fmt"])
        if row["fmt"] == "png":
            assert (dec == ref).all(), row["image_id"]
        else:
            assert C.psnr(ref, dec) >= 40.0, row["image_id"]


def test_cell_histogram_matches_oracle(ray_session, corpus, placed):
    from ray.data.aggregate import Count

    hist = (
        placed.groupby("cell")
        .aggregate(Count(alias_name="n_images"))
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    want = (
        pq.read_table(f"{corpus}/oracle_cell_hist.parquet")
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    assert (hist["cell"].to_numpy() == want["cell"].to_numpy()).all()
    assert (hist["n_images"].to_numpy() == want["n_images"].to_numpy()).all()


def test_near_dup_contains_planted_duplicates(ray_session, corpus):
    """FIXTURES invariant 3: every planted near-duplicate (img i-1, i for
    i % 100 == 99) is found by the banded-LSH + hamming<=2 pipeline."""
    from gdal_ray.sources import corpus as SRC
    from gdal_ray.stages.dedup import near_dup_image_pairs

    imgs = SRC.read_images(corpus, columns=["image_id", "phash"])
    pairs = near_dup_image_pairs(imgs).to_pandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].itertuples(index=False)))
    n = SRC.read_images(corpus, columns=["image_id"]).count()
    planted = {(f"img{i-1:08d}", f"img{i:08d}") for i in range(99, n, 100)}
    assert planted <= found, f"missing {sorted(planted - found)[:5]}"


def test_degenerate_band_group_bounded_memory(ray_session):
    """10k identical phashes (one shared band key — the pathological corpus
    of constant-color thumbnails): pair expansion must complete in bounded
    tiles (no O(n^2) single allocation) and still emit EXACTLY the full
    n*(n-1)/2 pair set, each pair once (first-matching-band rule)."""
    import ray.data as rd

    from gdal_ray.stages.dedup import _GROUP_CAP, _pair_tiles, near_dup_image_pairs

    n = 3_000  # > _GROUP_CAP so the tiled path runs; 4.5M pairs keeps the
    # 4-CPU test session fast (10k was verified once: 50M pairs, ~6 min)
    assert n > _GROUP_CAP  # the test must actually exercise the tiled path
    ds = rd.from_items(
        [{"image_id": f"dup{i:05d}", "phash": 0x1234_5678_9ABC_DEF0} for i in range(n)]
    )
    pairs = near_dup_image_pairs(ds)
    assert pairs.count() == n * (n - 1) // 2

    # tile generator covers the strict upper triangle exactly once
    m = 2 * _GROUP_CAP + 17
    got = np.zeros((m, m), dtype=np.int32)
    for ia, ib in _pair_tiles(m):
        assert len(ia) <= _GROUP_CAP * _GROUP_CAP
        assert (ia < ib).all()
        got[ia, ib] += 1
    assert (got == np.triu(np.ones((m, m), dtype=np.int32), k=1)).all()
