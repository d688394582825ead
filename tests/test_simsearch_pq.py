"""Product-quantization ANN oracles (stages/simsearch PQ path)."""

import numpy as np
import pandas as pd
import pytest

from gdal_ray.stages.simsearch import pq_encode, pq_train


def make_vectors(n=3000, d=32, seed=17):
    rng = np.random.default_rng(seed)
    # clustered data so PQ has structure to exploit
    centers = rng.normal(0, 1, (12, d))
    assign = rng.integers(0, 12, n)
    return centers[assign] + rng.normal(0, 0.3, (n, d))


class TestPQ:
    def test_codebooks_shapes_and_determinism(self):
        x = make_vectors(500)
        b1 = pq_train(x, m_sub=8, n_codes=16)
        b2 = pq_train(x, m_sub=8, n_codes=16)
        assert b1.shape == (8, 16, 4)
        np.testing.assert_array_equal(b1, b2)

    def test_indivisible_dim_raises(self):
        with pytest.raises(ValueError, match="divisible"):
            pq_train(make_vectors(100, d=30), m_sub=8)

    def test_encode_reconstruction_beats_random(self):
        x = make_vectors(1000)
        books = pq_train(x, m_sub=8, n_codes=64)
        codes = pq_encode(x, books)
        assert codes.dtype == np.uint8 and codes.shape == (1000, 8)
        # reconstruction error far below unit-vector scale
        from gdal_ray.stages.simsearch import _unit

        xn = _unit(x)
        recon = np.concatenate(
            [books[j][codes[:, j]] for j in range(8)], axis=1
        )
        err = np.linalg.norm(xn - recon, axis=1).mean()
        assert err < 0.5  # vs ~sqrt(2) for random codes

    def test_recall_vs_exact(self, ray_session):
        import ray.data as rd

        from gdal_ray.stages.simsearch import topk_cosine, topk_cosine_pq

        x = make_vectors(4000)
        queries = make_vectors(8, seed=99)
        df = pd.DataFrame(
            {"vec_id": np.arange(4000, dtype=np.int64),
             "embedding": [v.tolist() for v in x]}
        )
        ds = rd.from_pandas(df).repartition(4)
        exact = (
            topk_cosine(ds, queries, k=10)
            .to_pandas()
            .groupby("query_idx")["vec_id"]
            .apply(set)
        )
        approx = (
            topk_cosine_pq(ds, queries, k=10, shortlist=8)
            .to_pandas()
            .groupby("query_idx")["vec_id"]
            .apply(set)
        )
        recalls = [
            len(exact[qi] & approx[qi]) / 10 for qi in exact.index
        ]
        assert np.mean(recalls) >= 0.85, recalls
        # scores on returned rows are EXACT cosine (refine step)
        pq_df = topk_cosine_pq(ds, queries, k=10, shortlist=8).to_pandas()
        from gdal_ray.stages.simsearch import _unit

        xn = _unit(x)
        qn = _unit(queries)
        for _, r in pq_df.head(20).iterrows():
            want = float(xn[int(r["vec_id"])] @ qn[int(r["query_idx"])])
            assert r["score"] == pytest.approx(want, abs=1e-12)
