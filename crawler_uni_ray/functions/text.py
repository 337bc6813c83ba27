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

from ..urlnorm import url_hash_batch

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


def round6(x):
    """Half-up rounding to 6 decimals via scaled floor — bit-identical
    between numpy and the DuckDB oracle (`FLOOR(x*1e6 + 0.5)/1e6`),
    unlike np.round (binary half-even) vs SQL ROUND (decimal half-away),
    which disagree by 1 ulp on boundary values."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


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
        df["lang_score"] = round6(hits.to_numpy() / ntok)
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
        df["punct_ratio"] = round6(punct_ratio)
        df["stop_ratio"] = round6(stop_ratio)
        df["quality"] = round6(score)
        return df

    return ds.map_batches(_f, batch_format="pandas")


def fingerprint_batch(texts, window: int = 4) -> np.ndarray:
    """Winnowing-style rolling-hash fingerprint per text: min over sliding
    windows of a polynomial combine of token hashes (documents sharing
    phrasing collide).  Token hashing is ONE vectorized siphash call over
    the whole batch's token stream (urlnorm.url_hash_batch) — not a
    per-token per-byte Python loop.  Deterministic, order-sensitive."""
    tok_lists = [TOKEN_RE.findall(t or "") for t in texts]
    out = np.zeros(len(tok_lists), dtype=np.uint64)
    all_toks = [tok for toks in tok_lists for tok in toks]
    if not all_toks:
        return out
    hashes = url_hash_batch(all_toks)
    lens = np.fromiter((len(tk) for tk in tok_lists), np.int64, count=len(tok_lists))
    offs = np.concatenate(([0], np.cumsum(lens)))
    weights = np.uint64(31) ** np.arange(window, dtype=np.uint64)
    for i in range(len(tok_lists)):
        h = hashes[offs[i] : offs[i + 1]]
        if len(h) == 0:
            continue
        if len(h) < window:
            acc = 0
            for v in h:
                acc = (acc * 31 + int(v)) & 0xFFFFFFFFFFFFFFFF
            out[i] = acc
        else:
            mat = np.lib.stride_tricks.sliding_window_view(h, window)
            win = (mat * weights).sum(axis=1, dtype=np.uint64)  # wraps mod 2^64
            out[i] = win.min()
    return out


def fingerprint_text(text: str, window: int = 4) -> int:
    """Scalar form of :func:`fingerprint_batch` (tests / oracle use)."""
    return int(fingerprint_batch([text], window)[0])


def add_fingerprint(ds: Dataset, text_col: str = "text", window: int = 4) -> Dataset:
    def _f(df: pd.DataFrame) -> pd.DataFrame:
        fp = fingerprint_batch(df[text_col].tolist(), window)
        df["fingerprint"] = (fp & np.uint64(0x7FFFFFFFFFFFFFFF)).astype("int64")
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
