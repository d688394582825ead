"""Rows-only queries over the synthetic image corpus, sized by sf_dir.

The DuckDB gate can't see the image corpus (it registers only the TPC-H-ish
views), so these entries get the driver's weaker rows-only check; their
EXACT correctness is enforced by the pytest oracles
(tests/test_flagship.py, tests/test_raster_ops.py) against the independent
scalar-formula tables.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from gdal_ray.fixtures.generate import generate_corpus
from gdal_ray.sources.corpus import read_parquet_tight as _rpt

__all__ = [
    "corpus_for_sf",
    "q_flagship_tiles",
    "q_pip_join",
    "q_knn",
    "q_raster_roundtrip",
    "q_near_dup_images",
    "q_decode_stats",
    "q_text_analysis",
    "q_minhash_pairs",
    "q_curation_pipeline",
    "q_image_embed_topk",
]

_SF_IMAGES = {"sf0.001": 500, "sf0.01": 3000, "sf0.1": 50000}


def corpus_for_sf(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    n = _SF_IMAGES.get(name, 1000)
    return generate_corpus(n)


def q_flagship_tiles(sf_dir: str):
    from gdal_ray.pipelines import flagship as F

    d = corpus_for_sf(sf_dir)
    return F.tile_assignments(F.placed_images(d, decode=False))


def q_pip_join(sf_dir: str):
    from gdal_ray.pipelines import flagship as F

    d = corpus_for_sf(sf_dir)
    return F.pip_join_images(F.placed_images(d, decode=False), d)


def q_knn(sf_dir: str):
    from gdal_ray.pipelines import flagship as F

    return F.knn_images(corpus_for_sf(sf_dir))


def q_raster_roundtrip(sf_dir: str):
    from gdal_ray.sources import corpus as SRC
    from gdal_ray.stages.raster import roundtrip_batch

    d = corpus_for_sf(sf_dir)
    return SRC.read_rasters(d).map_batches(roundtrip_batch, batch_format="pyarrow").drop_columns(
        ["pixel_counts"]
    )


def q_near_dup_images(sf_dir: str):
    from gdal_ray.sources import corpus as SRC
    from gdal_ray.stages.dedup import near_dup_image_pairs

    d = corpus_for_sf(sf_dir)
    imgs = SRC.read_images(d, columns=["image_id", "phash"])
    return near_dup_image_pairs(imgs, max_hamming=2)


def q_decode_stats(sf_dir: str):
    from gdal_ray.pipelines.flagship import decoded_meta

    d = corpus_for_sf(sf_dir)
    ds = decoded_meta(d)

    def check(batch: pd.DataFrame) -> pd.DataFrame:
        batch["phash_ok"] = batch["phash_check"] == batch["phash"]
        return batch[["image_id", "mean", "std", "minv", "maxv", "checksum", "phash_ok"]]

    return ds.map_batches(check, batch_format="pandas")


def q_text_analysis(sf_dir: str):
    """Language-ID + quality scoring over the documents table (heuristics,
    not SQL-expressible -> rows-only)."""
    import ray.data as rd  # noqa: F401

    from gdal_ray.stages.text import LangId, TextStats

    ds = _rpt(os.path.join(sf_dir, "documents.parquet"))
    return (
        ds.map_batches(TextStats, batch_format="pandas", batch_size=4096, concurrency=(1, 4))
        .map_batches(LangId, batch_format="pandas", batch_size=4096, concurrency=(1, 4))
        .select_columns(["doc_id", "lang", "lang_pred", "n_tokens", "quality", "stopword_ratio"])
    )


def q_minhash_pairs(sf_dir: str):
    """MinHash-LSH near-dup candidate buckets over documents (rows-only)."""
    import ray.data as rd

    from gdal_ray.stages.dedup import minhash_bands

    from gdal_ray.ops.shuffle import bucketed_group_apply

    ds = _rpt(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    bands = minhash_bands(ds)

    def pairs(part: pd.DataFrame) -> pd.DataFrame:
        part = part[part.duplicated(["band_id", "band_key"], keep=False)]
        out_a, out_b = [], []
        for _, g in part.groupby(["band_id", "band_key"], sort=False):
            ids = np.unique(g["doc_id"].to_numpy())
            if len(ids) < 2:
                continue
            # tiled expansion bounds degenerate buckets (see dedup._pair_tiles)
            from gdal_ray.stages.dedup import _pair_tiles

            for ia, ib in _pair_tiles(len(ids)):
                out_a.append(ids[ia])
                out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        ).drop_duplicates()

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    cand = bucketed_group_apply(
        bands, ["band_id", "band_key"], pairs, 32, schema=pair_schema
    )
    return bucketed_group_apply(
        cand, ["id_a", "id_b"], lambda p: p.drop_duplicates(["id_a", "id_b"]), 8,
        schema=pair_schema,
    )


def q_curation_pipeline(sf_dir: str):
    """END-TO-END training-data curation composition (the 100-TB shape):
    exact dedup (md5 -> min doc_id) -> language-ID + quality scoring
    (actor-pool stages) -> quality gate (on the QUANTIZED int, so the SQL
    twin has no float-boundary fragility) -> per-language survivor stats.
    Every stage is the same kernel its standalone query uses, so the twin
    composes the proven q_dedup_docs + q_text_analysis SQL bodies."""
    from gdal_ray.stages.dedup import add_md5, exact_dedup
    from gdal_ray.stages.text import LangId, TextStats

    ds = _rpt(os.path.join(sf_dir, "documents.parquet"))
    ds = ds.map_batches(add_md5, batch_format="pyarrow")
    ds = exact_dedup(ds, "md5", "doc_id")
    ds = ds.map_batches(TextStats, batch_format="pandas", batch_size=4096,
                        concurrency=(1, 4))
    ds = ds.map_batches(LangId, batch_format="pandas", batch_size=4096,
                        concurrency=(1, 4))

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["q4"] = np.floor(df["quality"].to_numpy() * 10000.0 + 0.5).astype(np.int64)
        df = df[df["q4"] >= 5000]
        return df[["doc_id", "lang_pred", "n_tokens", "q4"]]

    from ray.data.aggregate import Count, Sum

    return (
        ds.map_batches(gate, batch_format="pandas")
        .groupby("lang_pred")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tokens", alias_name="sum_tokens"),
            Sum("q4", alias_name="sum_q4"),
        )
    )


def q_image_embed_topk(sf_dir: str):
    """Image -> deterministic feature embedding -> exact cosine top-k
    (the multimodal-to-ANN bridge: decode fused into the read, embeddings
    feed the same simsearch operators the embeddings table uses). Query
    vectors are the embeddings of the first 4 images, so each query's
    rank-0 hit is itself with score 1 (pinned in pytest)."""
    import numpy as np
    import pyarrow.dataset as pads

    from gdal_ray.io import codec as C
    from gdal_ray.stages.imgfeat import image_embeddings, image_features
    from gdal_ray.stages.simsearch import topk_cosine

    d = corpus_for_sf(sf_dir)
    qids = [f"img{i:08d}" for i in range(4)]
    # query vectors: 4 images read via a parquet row filter and embedded
    # driver-side (the broadcast-query-matrix pattern of topk_cosine)
    tbl = pads.dataset(os.path.join(d, "images.parquet")).to_table(
        columns=["image_id", "bytes", "fmt"],
        filter=pads.field("image_id").isin(qids),
    )
    order = np.argsort(np.asarray(tbl["image_id"]))
    queries = np.stack(
        [
            image_features(C.decode_image(tbl["bytes"][int(i)].as_py(), tbl["fmt"][int(i)].as_py()))
            for i in order
        ]
    )
    return topk_cosine(image_embeddings(d), queries, k=5, id_col="image_id")
