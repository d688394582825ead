"""Benchmark decontamination: flag corpus documents that share a verbatim
token n-gram with a benchmark/eval set.

The operation every serious LLM data pipeline runs before training (the
"contamination" n-gram overlap checks published with GPT-3 appendix C and
PaLM: any training document sharing an n-gram with an eval document is
flagged/dropped). Two arms, both Ray-Data-first:

- ``contaminated_docs`` (EXACT, SQL-twinnable): both sides emit one
  ``(whash, doc_id, pos, bench)`` row per token window at EVERY position
  (20 bytes a window — no text enters the first shuffle, the
  stages/substrdup.py discipline). ONE bucketed shuffle on ``whash`` keeps
  only groups touching both sides; a ``doc_id`` co-shuffle fetches the
  window text back (hash collisions die here — the final compare is on
  the EXACT string); one last shuffle on the surviving window text counts,
  per corpus document, the DISTINCT benchmark-shared windows. Output
  ``(doc_id, n_contam)`` for flagged docs only — integer-exact, so the
  registry twin recomputes it verbatim in DuckDB.

- ``contaminated_docs_bloom`` (SCALE PATH): the benchmark side folds into
  a Bloom filter (stages/sketch.py — per-block OR-able partials, driver
  fold, ~2 bytes/key at 1% FPR), broadcast once via ``ray.put``; the
  corpus probes it vectorized inside ``map_batches`` and only FLAGGED
  window rows enter the single doc_id shuffle. No benchmark shuffle at
  all — the right shape when the corpus is 10^12 docs and the benchmark
  side is 10^6 n-grams. Guarantee: no false negatives (every exactly
  contaminated doc is flagged); false positives are bounded by the
  filter's FPR and carry hash-distinct window counts.

Tokenization is ``text.split(' ')``, byte-identical to DuckDB's
``string_split(text, ' ')`` so the gate twin recomputes the same windows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from gdal_ray.ops.shuffle import bucketed_group_apply
from gdal_ray.stages.sketch import bloom_fold, bloom_partial, bloom_probe
from gdal_ray.stages.substrdup import window_hashes

__all__ = ["contaminated_docs", "contaminated_docs_bloom", "tag_windows"]


def tag_windows(ds, span: int, bench: bool,
                id_col: str = "doc_id", text_col: str = "text"):
    """Documents -> (whash, doc_id, pos, bench) rows, EVERY window position
    (decontamination must not miss an alignment, so no stride/winnowing)."""
    flag = bench

    def emit(batch: pa.Table) -> pa.Table:
        ids, hs, ps = [], [], []
        for did, tx in zip(batch[id_col].to_pylist(),
                           batch[text_col].to_pylist()):
            h = window_hashes((tx or "").split(" "), span)
            if not len(h):
                continue
            hs.append(h)
            ps.append(np.arange(len(h), dtype=np.int32))
            ids.append(np.full(len(h), did, dtype=np.int64))
        n = sum(len(x) for x in hs)
        return pa.table({
            "whash": pa.array(
                np.concatenate(hs).view(np.int64) if n else
                np.empty(0, dtype=np.int64)),
            "doc_id": pa.array(
                np.concatenate(ids) if n else np.empty(0, dtype=np.int64)),
            "pos": pa.array(
                np.concatenate(ps) if n else np.empty(0, dtype=np.int32)),
            "bench": pa.array(np.full(n, flag, dtype=bool)),
        })

    return ds.map_batches(emit, batch_format="pyarrow")


_CAND_SCHEMA = pa.schema([
    ("whash", pa.int64()), ("doc_id", pa.int64()), ("pos", pa.int32()),
    ("bench", pa.bool_()),
])
_WIN_SCHEMA = pa.schema([
    ("win", pa.string()), ("doc_id", pa.int64()), ("bench", pa.bool_()),
])
_PAIR_SCHEMA = pa.schema([("doc_id", pa.int64()), ("win", pa.string())])
_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("n_contam", pa.int64())])


def contaminated_docs(corpus_ds, bench_ds, span: int = 8,
                      num_buckets: int = 64, id_col: str = "doc_id",
                      text_col: str = "text"):
    """Exact n-gram-overlap decontamination -> (doc_id, n_contam) for every
    corpus document sharing >=1 verbatim ``span``-token window with any
    benchmark document (n_contam = DISTINCT shared window texts)."""
    wins = tag_windows(corpus_ds, span, False, id_col, text_col).union(
        tag_windows(bench_ds, span, True, id_col, text_col))

    def both_sides(part: pd.DataFrame) -> pd.DataFrame:
        # keep whole whash-groups that touch the benchmark AND the corpus
        g = part.groupby("whash", sort=False)["bench"]
        keep = g.transform("any") & (~part["bench"]).groupby(
            part["whash"], sort=False).transform("any")
        return part[keep]

    cand = bucketed_group_apply(wins, ["whash"], both_sides, num_buckets,
                                schema=_CAND_SCHEMA)

    # text fetch-back: candidates ∪ both document sides on ONE doc_id
    # co-shuffle (document rows carry pos = -1 and the text)
    def tag_cand(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"], "pos": b["pos"], "bench": b["bench"],
            "_text": pa.nulls(len(b), pa.string()),
        })

    def doc_rows(flag):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": b[id_col],
                "pos": pa.array(np.full(len(b), -1, dtype=np.int32)),
                "bench": pa.array(np.full(len(b), flag, dtype=bool)),
                "_text": b[text_col],
            })
        return f

    tagged = cand.map_batches(tag_cand, batch_format="pyarrow").union(
        corpus_ds.map_batches(doc_rows(False), batch_format="pyarrow"),
        bench_ds.map_batches(doc_rows(True), batch_format="pyarrow"),
    )

    def extract(part: pd.DataFrame) -> pd.DataFrame:
        texts = {
            int(d): (t or "").split(" ")
            for d, t in zip(part.loc[part["pos"] < 0, "doc_id"],
                            part.loc[part["pos"] < 0, "_text"])
        }
        c = part[part["pos"] >= 0]
        return pd.DataFrame({
            "win": pd.Series(
                [" ".join(texts[int(d)][int(p):int(p) + span])
                 for d, p in zip(c["doc_id"], c["pos"])], dtype="object"),
            "doc_id": c["doc_id"].to_numpy(),
            "bench": c["bench"].to_numpy(),
        })

    wtexts = bucketed_group_apply(tagged, ["doc_id"], extract, num_buckets,
                                  schema=_WIN_SCHEMA)

    def verify(part: pd.DataFrame) -> pd.DataFrame:
        # exact-text survivors: window text present on the benchmark side;
        # emit each (corpus doc, win) once
        hit = part.groupby("win", sort=False)["bench"].transform("any")
        c = part[hit & ~part["bench"]]
        return c[["doc_id", "win"]].drop_duplicates()

    pairs = bucketed_group_apply(wtexts, ["win"], verify,
                                 max(8, num_buckets // 4),
                                 schema=_PAIR_SCHEMA)

    def count(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("doc_id", sort=False)["win"].nunique().reset_index()
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "n_contam": g["win"].astype("int64"),
        })

    return bucketed_group_apply(pairs, ["doc_id"], count,
                                max(8, num_buckets // 4), schema=_OUT_SCHEMA)


def contaminated_docs_bloom(corpus_ds, bench_ds, span: int = 8,
                            m_bits: int = 1 << 20, k: int = 7,
                            num_buckets: int = 32,
                            id_col: str = "doc_id", text_col: str = "text"):
    """Bloom-filter decontamination -> (doc_id, n_flagged): per corpus doc,
    DISTINCT window hashes hitting the benchmark filter. Superset of the
    exact arm's doc set (no false negatives); see module docstring."""
    import ray

    bwins = tag_windows(bench_ds, span, True, id_col, text_col)

    def part_filter(batch: pa.Table) -> pa.Table:
        packed = bloom_partial(
            np.asarray(batch["whash"], dtype=np.int64), m_bits, k)
        return pa.table({"bf": pa.array([packed.tobytes()], pa.binary())})

    partials = (
        blob
        for b in bwins.map_batches(part_filter, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        for blob in b["bf"].to_pylist()
    )
    filt_ref = ray.put(bloom_fold(partials))

    def probe(batch: pa.Table) -> pa.Table:
        packed = ray.get(filt_ref)
        wh = np.asarray(batch["whash"], dtype=np.int64)
        hit = bloom_probe(wh.view(np.uint64), packed, k)
        return pa.table({
            "doc_id": pa.array(np.asarray(batch["doc_id"],
                                          dtype=np.int64)[hit]),
            "whash": pa.array(wh[hit]),
        })

    flagged = tag_windows(corpus_ds, span, False, id_col, text_col
                          ).map_batches(probe, batch_format="pyarrow")

    def count(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("doc_id", sort=False)["whash"].nunique().reset_index()
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "n_flagged": g["whash"].astype("int64"),
        })

    return bucketed_group_apply(
        flagged, ["doc_id"], count, num_buckets,
        schema=pa.schema([("doc_id", pa.int64()), ("n_flagged", pa.int64())]))
