"""Text-analysis stages for the documents table (engine additions for
large-scale training-data pipelines; no GDAL counterpart).

All stages are callable classes (actor pools): regexes/tables compiled once
per actor, batches processed vectorized with pandas string kernels.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

__all__ = ["TextStats", "LangId", "Fingerprint", "token_count_sql_parity"]

_STOPWORDS = {
    "the", "and", "of", "a", "to", "in", "is", "it", "that", "for", "on", "as",
    "with", "was", "at", "by", "an", "be", "this", "are", "or", "from",
}

# tiny per-language character/word profiles for the n-gram heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "ing", "ion", "is", "of"},
    "de": {"der", "und", "sch", "ein", "ich", "die"},
    "fr": {"les", "des", "ent", "que", "une", "est"},
    "es": {"los", "las", "que", "ión", "una", "del"},
}


class TextStats:
    """text -> n_tokens, n_chars_check, punct_ratio, stopword_ratio, quality.

    ``n_tokens`` counts maximal runs of non-space characters — expressible
    in ANSI SQL (length-based), so this column is oracle-checkable.
    """

    def __init__(self):
        self.word = re.compile(r"[^\s]+")
        self.punct = re.compile(r"[^\w\s]")
        self.token = re.compile(r"\w+", re.UNICODE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        batch["n_tokens"] = text.str.count(self.word.pattern).astype("int64")
        batch["n_chars_check"] = text.str.len().astype("int64")
        batch["n_punct"] = text.str.count(self.punct.pattern).astype("int64")
        toks = text.str.lower().str.findall(self.token)
        batch["stopword_ratio"] = toks.map(
            lambda ws: sum(w in _STOPWORDS for w in ws) / max(1, len(ws))
        )
        # simple composite quality score in [0, 1]
        length_score = np.clip(batch["n_chars_check"] / 500.0, 0, 1)
        punct_score = 1.0 - np.clip(
            batch["n_punct"] / batch["n_chars_check"].clip(lower=1) / 0.3, 0, 1
        )
        batch["quality"] = (length_score + punct_score + batch["stopword_ratio"].clip(0, 1)) / 3.0
        return batch


class LangId:
    """Character-trigram language-ID heuristic -> lang_pred column."""

    def __init__(self):
        self.token = re.compile(r"[a-zäöüéèêáíóúñç]{2,}", re.IGNORECASE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def score(text: str) -> str:
            t = (text or "").lower()
            grams = {t[i : i + 3] for i in range(len(t) - 2)}
            words = set(self.token.findall(t))
            best, best_s = "unk", 0
            for lang, prof in _LANG_PROFILES.items():
                s = len(grams & prof) + 2 * len(words & prof)
                if s > best_s:
                    best, best_s = lang, s
            return best

        batch["lang_pred"] = batch["text"].map(score)
        return batch


class Fingerprint:
    """Rolling-hash document fingerprint (64-bit polynomial over bytes)."""

    BASE = np.uint64(1099511628211)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def fp(text: str) -> int:
            h = np.uint64(14695981039346656037)
            with np.errstate(over="ignore"):
                for b in (text or "").encode("utf-8"):
                    h = (h ^ np.uint64(b)) * self.BASE
            return int(h.astype(np.int64))

        batch["fingerprint"] = batch["text"].map(fp).astype("int64")
        return batch


def token_count_sql_parity(text_col):
    """The SQL-parity token count used in oracle_sql: number of maximal
    non-space runs. DuckDB equivalent:
      length(regexp_replace(trim(text), '\\S+', 'x', 'g')) applied carefully —
    we instead use regexp_split and count non-empty pieces on both sides."""
    raise NotImplementedError("documentation helper only")
