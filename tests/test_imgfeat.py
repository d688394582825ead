"""Image feature embeddings (stages/imgfeat.py) + the image->ANN bridge."""

import numpy as np
import pytest


def test_feature_vector_properties():
    from gdal_ray.stages.imgfeat import image_features

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 48, 3)).astype(np.uint8)
    v = image_features(img)
    assert v.shape == (49,)
    assert np.linalg.norm(v) == pytest.approx(1.0)
    # deterministic
    assert (v == image_features(img)).all()
    # resolution-invariant-ish: 2x upscale (nearest) keeps cosine high
    up = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    assert float(v @ image_features(up)) > 0.999
    # structurally different content separates (a dark-red flat card vs
    # uniform noise; noise vs its inverse share statistics by design)
    flat = np.zeros((64, 48, 3), dtype=np.uint8)
    flat[..., 0] = 90
    assert float(v @ image_features(flat)) < 0.9


def test_image_embed_topk_self_hit(ray_session, corpus):
    import os

    from gdal_ray.pipelines.corpus_queries import q_image_embed_topk

    sf = "/root/testdata/sf0.001"
    got = q_image_embed_topk(sf).to_pandas()
    assert set(got.columns) >= {"query_idx", "rank", "vec_id", "score"}
    r0 = got[got["rank"] == 0].sort_values("query_idx")
    assert len(r0) == 4
    # rank-0 hit of each query is the query image itself at score ~1
    assert r0["score"].min() > 0.999999
    assert sorted(r0["vec_id"].tolist()) == [f"img{i:08d}" for i in range(4)]
