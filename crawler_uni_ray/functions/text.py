"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.  All stages are vectorized
``map_batches`` kernels over the ``documents`` table; regexes compile once
at module import (i.e. once per worker process).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from ray.data import Dataset

TOKEN_RE = re.compile(r"\S+")
# a BPE-ish word/punct splitter: words, numbers, or single non-space symbols
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
PUNCT_RE = re.compile(r"[^\w\s]")

# tiny per-language stopword profiles (n-gram/stopword heuristic)
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "pour"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "un", "una", "por"],
    "it": ["il", "la", "di", "che", "e", "un", "per", "non", "con", "del"],
}
_LANG_RES = {
    lang: re.compile(r"\b(?:" + "|".join(words) + r")\b", re.IGNORECASE)
    for lang, words in _LANG_STOPWORDS.items()
}


def token_count_batch(texts: pd.Series) -> np.ndarray:
    """Whitespace token count, fully vectorized (pandas str.count)."""
    return texts.str.count(TOKEN_RE).fillna(0).to_numpy(dtype=np.int64)


def bpe_token_count_batch(texts: pd.Series) -> np.ndarray:
    """BPE-ish token count (words / numbers / symbols)."""
    return texts.str.count(BPE_RE).fillna(0).to_numpy(dtype=np.int64)


def add_token_counts(ds: Dataset, text_col: str = "text") -> Dataset:
    def _f(df: pd.DataFrame) -> pd.DataFrame:
        df["n_tokens"] = token_count_batch(df[text_col])
        df["n_bpe_tokens"] = bpe_token_count_batch(df[text_col])
        return df

    return ds.map_batches(_f, batch_format="pandas")


def lang_scores_batch(texts: pd.Series) -> pd.DataFrame:
    """Per-language stopword-hit counts, vectorized: one str.count per
    language profile (not a Python loop over tokens)."""
    return pd.DataFrame(
        {lang: texts.str.count(rex).fillna(0) for lang, rex in _LANG_RES.items()}
    )


def add_lang_id(ds: Dataset, text_col: str = "text", min_hits: int = 1) -> Dataset:
    """Deterministic heuristic language ID → ``lang_pred`` column
    (ties broken by language-code order; below min_hits → 'und')."""

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        scores = lang_scores_batch(df[text_col])
        ntok = np.maximum(token_count_batch(df[text_col]), 1)
        best = scores.idxmax(axis=1)  # ties → first column (fixed dict order)
        hits = scores.max(axis=1)
        df["lang_pred"] = np.where(hits.to_numpy() >= min_hits, best, "und")
        df["lang_score"] = (hits.to_numpy() / ntok).round(6)
        return df

    return ds.map_batches(_f, batch_format="pandas")


def add_quality_score(ds: Dataset, text_col: str = "text") -> Dataset:
    """Quality heuristics: length, punctuation ratio, stopword ratio, mean
    word length → a [0,1] composite.  All vectorized."""

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col].fillna("")
        n_chars = t.str.len().to_numpy(dtype=np.float64)
        n_tokens = np.maximum(token_count_batch(t), 1).astype(np.float64)
        n_punct = t.str.count(PUNCT_RE).to_numpy(dtype=np.float64)
        n_stop = lang_scores_batch(t).sum(axis=1).to_numpy(dtype=np.float64)
        mean_word_len = n_chars / n_tokens
        punct_ratio = n_punct / np.maximum(n_chars, 1)
        stop_ratio = n_stop / n_tokens
        # plausible-document score: enough length, sane word length,
        # some stopwords, not punctuation soup
        score = (
            np.clip(n_chars / 500.0, 0, 1) * 0.3
            + np.clip(1.0 - np.abs(mean_word_len - 5.0) / 5.0, 0, 1) * 0.3
            + np.clip(stop_ratio * 5.0, 0, 1) * 0.2
            + np.clip(1.0 - punct_ratio * 5.0, 0, 1) * 0.2
        )
        df["punct_ratio"] = punct_ratio.round(6)
        df["stop_ratio"] = stop_ratio.round(6)
        df["quality"] = score.round(6)
        return df

    return ds.map_batches(_f, batch_format="pandas")


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """Deterministic per-token 64-bit FNV-1a hashes."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, tok in enumerate(tokens):
        h = _FNV_OFFSET
        for b in tok.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * int(_FNV_PRIME) & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def fingerprint_text(text: str, window: int = 4) -> int:
    """Winnowing-style rolling-hash fingerprint: combine token hashes over
    sliding windows, return the minimum window hash (documents sharing
    phrasing collide).  Deterministic, order-sensitive."""
    toks = TOKEN_RE.findall(text or "")
    if not toks:
        return 0
    h = _token_hashes(toks)
    if len(h) < window:
        acc = np.uint64(0)
        for v in h:
            acc = np.uint64((int(acc) * 31 + int(v)) & 0xFFFFFFFFFFFFFFFF)
        return int(acc)
    # rolling combine: windowed polynomial hash via cumulative trick
    mat = np.lib.stride_tricks.sliding_window_view(h, window)
    weights = np.uint64(31) ** np.arange(window, dtype=np.uint64)
    win = (mat * weights).sum(axis=1, dtype=np.uint64)
    return int(win.min())


def add_fingerprint(ds: Dataset, text_col: str = "text", window: int = 4) -> Dataset:
    def _f(df: pd.DataFrame) -> pd.DataFrame:
        df["fingerprint"] = [
            np.int64(fingerprint_text(t, window) & 0x7FFFFFFFFFFFFFFF)
            for t in df[text_col]
        ]
        return df

    return ds.map_batches(_f, batch_format="pandas")


def text_stats(ds: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """SQL-checkable stats: char count + whitespace token count."""

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame()
        out[id_col] = df[id_col]
        out["n_chars_calc"] = df[text_col].str.len().astype("int64")
        out["n_tokens"] = token_count_batch(df[text_col])
        return out

    return ds.map_batches(_f, batch_format="pandas")
