"""Mergeable sketches for approximate aggregates at 100-TB scale.

HyperLogLog distinct-count: each batch emits ONE fixed-size register row
(2^p bytes) — the classic combiner shape: the driver (or a tree reduce)
merges by element-wise max, so the shuffle/collect volume is
``n_blocks × 2^p bytes`` regardless of input size.  Estimator is the
standard bias-corrected HLL (Flajolet et al. 2007) with the small-range
linear-counting correction.  No SQL oracle (approximate by construction);
tests bound the relative error against the exact distinct count and pin
determinism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from ..urlnorm import url_hash_batch


def _hash_values(col) -> np.ndarray:
    """uint64 hashes for an arbitrary column (ints take a Fibonacci mix —
    no string round-trip; everything else goes through the siphash)."""
    arr = np.asarray(col)
    if arr.dtype.kind in "iu":
        k = arr.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        # xorshift so low bits also mix (register index uses the top bits,
        # rho the rest — both need diffusion)
        k ^= k >> np.uint64(29)
        k *= np.uint64(0xBF58476D1CE4E5B9)
        k ^= k >> np.uint64(32)
        return k
    return url_hash_batch([str(v) for v in col])


def hll_register_batch(col, p: int = 12) -> np.ndarray:
    """One HLL register array (uint8, length 2^p) for a batch of values."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    h = _hash_values(col)
    if len(h) == 0:
        return regs
    j = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad so rho ≤ 64-p+1
    # rho = leading zeros of `rest` + 1, vectorized via float64 exponent
    # trick is lossy; use bit-length instead: 64 - floor(log2(rest)) works
    # exactly with uint64→object? No — use np.left-shift scan: count via
    # bit_length on the high 32/low 32 halves.
    hi = (rest >> np.uint64(32)).astype(np.uint32)
    lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    # bit_length of a uint32 via float32-safe log2 on uint64 is exact for
    # values < 2^53 — uint32 qualifies
    bl_hi = np.zeros(len(rest), dtype=np.int64)
    nz = hi != 0
    bl_hi[nz] = np.floor(np.log2(hi[nz].astype(np.float64))).astype(np.int64) + 1
    bl_lo = np.zeros(len(rest), dtype=np.int64)
    nzl = lo != 0
    bl_lo[nzl] = np.floor(np.log2(lo[nzl].astype(np.float64))).astype(np.int64) + 1
    bitlen = np.where(nz, bl_hi + 32, bl_lo)
    rho = (64 - bitlen + 1).astype(np.uint8)
    np.maximum.at(regs, j, rho)
    return regs


def hll_merge(rows: list[np.ndarray]) -> np.ndarray:
    out = rows[0].copy()
    for r in rows[1:]:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)  # linear counting, small range
    return float(est)


def approx_distinct(ds: Dataset, col: str, p: int = 12) -> float:
    """Distributed approximate COUNT(DISTINCT col).  One register row per
    block leaves the workers; driver merge is n_blocks × 2^p bytes."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        regs = hll_register_batch(df[col].to_numpy(), p)
        return pd.DataFrame({"regs": [regs]})

    rows = ds.map_batches(
        _partial, batch_format="pandas", batch_size=None
    ).take_all()  # n_blocks rows of 2^p bytes — metadata-sized by design
    if not rows:
        return 0.0
    merged = hll_merge([np.asarray(r["regs"], dtype=np.uint8) for r in rows])
    return hll_estimate(merged)


def approx_distinct_by(ds: Dataset, key_col: str, col: str, p: int = 12) -> pd.DataFrame:
    """Grouped approximate distinct: per-batch per-key register partials →
    ONE groupby merge (registers travel as fixed-size list columns)."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for k, sub in df.groupby(key_col, sort=False):
            out.append({key_col: k, "regs": hll_register_batch(sub[col].to_numpy(), p)})
        return pd.DataFrame(out)

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = hll_merge([np.asarray(r, dtype=np.uint8) for r in g["regs"]])
        return pd.DataFrame(
            {key_col: [g[key_col].iloc[0]], "n_approx": [hll_estimate(regs)]}
        )

    out = (
        ds.map_batches(_partial, batch_format="pandas")
        .groupby(key_col)
        .map_groups(_merge, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(key_col).reset_index(drop=True)


# --------------------------------------------------------------- quantiles
#
# Mergeable approximate-quantile summary (the "weighted sorted subsample"
# form of mergeable summaries, Agarwal et al., PODS'12): each block sorts
# its values and keeps every ⌈ε·n_block⌉-th one with the gap as its weight,
# so a sample's cumulative weight equals its TRUE rank within the block.
# Summaries concatenate (driver or tree reduce) and answer any quantile
# with total rank error ≤ Σ per-block errors ≤ ε·n — deterministic, no
# randomness, bounded at n_blocks × (1/ε + 1) rows on the wire.  This
# complements ops.grouped_quantiles_disc, whose exact histogram plan needs
# a BOUNDED value domain; the sketch handles continuous columns.


def quantile_summary_batch(col, eps: float = 0.01) -> tuple[np.ndarray, np.ndarray]:
    """(values, weights) summary of one batch: sorted ε-spaced subsample;
    weight_j = #raw elements represented by sample j (its in-block rank
    minus the previous sample's)."""
    v = np.sort(np.asarray(col, dtype=np.float64))
    n = len(v)
    if n == 0:
        return np.empty(0, dtype=np.float64), np.empty(0, dtype=np.int64)
    s = max(1, int(np.floor(eps * n)))
    idx = np.arange(s - 1, n, s, dtype=np.int64)
    if idx[-1] != n - 1:
        idx = np.append(idx, n - 1)  # the max is always kept
    w = np.diff(np.concatenate(([np.int64(-1)], idx)))
    return v[idx], w.astype(np.int64)


def quantile_summary_merge(
    parts: list[tuple[np.ndarray, np.ndarray]],
) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate + re-sort partial summaries (weights ride along): the
    merged summary's error is the SUM of the parts' absolute rank errors,
    i.e. still ≤ ε·n_total when every part used the same ε."""
    vals = np.concatenate([p[0] for p in parts]) if parts else np.empty(0)
    wts = (
        np.concatenate([p[1] for p in parts])
        if parts
        else np.empty(0, dtype=np.int64)
    )
    order = np.argsort(vals, kind="stable")
    return vals[order], wts[order]


def quantile_query(
    vals: np.ndarray, wts: np.ndarray, qs: list[float]
) -> list[float]:
    """Answer quantiles from a merged summary: the first sample whose
    cumulative weight reaches ⌈q·n⌉ (rank semantics of QUANTILE_DISC)."""
    if len(vals) == 0:
        return [float("nan")] * len(qs)
    cum = np.cumsum(wts)
    n = int(cum[-1])
    out = []
    for q in qs:
        r = max(1, int(np.ceil(q * n)))
        out.append(float(vals[np.searchsorted(cum, r)]))
    return out


def approx_quantiles(
    ds: Dataset, col: str, qs: list[float], eps: float = 0.01
) -> list[float]:
    """Distributed approximate quantiles of a continuous column: one
    bounded summary row per block leaves the workers (n_blocks × (1/ε+1)
    samples total), merged + queried on the driver.  Guarantee: each
    answer's true rank is within ε·n of ⌈q·n⌉."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        v, w = quantile_summary_batch(df[col].to_numpy(), eps)
        return pd.DataFrame({"vals": [v], "wts": [w]})

    rows = ds.map_batches(
        _partial, batch_format="pandas", batch_size=None
    ).take_all()  # bounded by construction — the combiner contract
    merged = quantile_summary_merge(
        [
            (np.asarray(r["vals"], dtype=np.float64), np.asarray(r["wts"], dtype=np.int64))
        for r in rows
        ]
    )
    return quantile_query(merged[0], merged[1], qs)


def approx_quantiles_by(
    ds: Dataset, key_col: str, col: str, qs: list[float], eps: float = 0.01
) -> pd.DataFrame:
    """Grouped approximate quantiles: per-batch per-key summaries → ONE
    groupby merge (summaries travel as variable-length list columns whose
    size is ε-bounded, never data-sized).  Output: one row per key with a
    ``q{...}`` column per requested quantile."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for k, sub in df.groupby(key_col, sort=False):
            v, w = quantile_summary_batch(sub[col].to_numpy(), eps)
            out.append({key_col: k, "vals": v, "wts": w})
        return pd.DataFrame(out)

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        merged = quantile_summary_merge(
            [
                (
                    np.asarray(v, dtype=np.float64),
                    np.asarray(w, dtype=np.int64),
                )
                for v, w in zip(g["vals"], g["wts"])
            ]
        )
        ans = quantile_query(merged[0], merged[1], qs)
        row = {key_col: g[key_col].iloc[0]}
        for q, a in zip(qs, ans):
            row[f"q{str(q).replace('.', '_')}"] = a
        return pd.DataFrame([row])

    out = (
        ds.map_batches(_partial, batch_format="pandas")
        .groupby(key_col)
        .map_groups(_merge, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(key_col).reset_index(drop=True)


# ----------------------------------------------------------- heavy hitters
#
# Misra-Gries mergeable heavy-hitter summary (Misra & Gries '82; the
# merge rule and its summed-error proof are Agarwal et al., PODS'12):
# a size-k counter table whose every estimate undercounts its item's true
# frequency by at most err = n/(k+1) summed over all compressions, and
# which is GUARANTEED to contain every item with true count > err.
# Partials are per-batch exact counts compressed to k entries (subtract
# the (k+1)-th largest count, drop non-positives); merging = summing two
# tables then compressing again, with errors adding — so the distributed
# plan is the standard combiner shape: n_blocks × k (term, count) rows to
# the driver, never the vocabulary.


def mg_compress(counts: dict, k: int) -> tuple[dict, int]:
    """Compress a counter table to ≤ k entries: subtract the (k+1)-th
    largest count from everything, drop non-positives.  Returns (table,
    subtracted) — ``subtracted`` adds to the summary's undercount bound."""
    if len(counts) <= k:
        return counts, 0
    vals = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    thr = int(np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1])
    out = {t: c - thr for t, c in counts.items() if c > thr}
    return out, thr


def mg_merge(parts: list[tuple[dict, int]], k: int) -> tuple[dict, int]:
    """Merge MG summaries: sum tables, sum error bounds, re-compress once.
    The merged summary's undercount is ≤ Σ part errors + the one new
    compression's subtraction (Agarwal et al.'s mergeability result)."""
    total: dict = {}
    err = 0
    for tbl, e in parts:
        err += e
        for t, c in tbl.items():
            total[t] = total.get(t, 0) + c
    total, thr = mg_compress(total, k)
    return total, err + thr


def heavy_hitters_approx(
    ds: Dataset, text_col: str = "text", k: int = 64, top: int = 25
) -> pd.DataFrame:
    """Approximate corpus-wide heavy-hitter terms WITHOUT the vocabulary
    groupby that ``text.top_terms`` pays: each batch tokenizes, counts
    exactly (batch-bounded), MG-compresses to k entries and emits ONE
    summary row; the driver merges ``n_blocks × k`` rows.  Output: the
    ``top`` entries by estimated count with the global error bound
    attached (true count ∈ [n_est, n_est + err_bound] for listed terms;
    any term with true count > err_bound is guaranteed listed).  The
    exact plan shuffles the whole vocabulary once; this plan moves
    O(blocks × k) rows total — the scale trade when only the head of the
    distribution matters."""
    from .text import TOKEN_RE

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = (
            df[text_col]
            .fillna("")
            .str.lower()
            .str.findall(TOKEN_RE)
            .explode()
            .dropna()
            .value_counts()  # exact per-batch counts, pandas C path
        )
        n = int(vc.sum())
        tbl, thr = mg_compress(vc.to_dict(), k)
        terms = list(tbl.keys())
        return pd.DataFrame(
            {
                "terms": [terms],
                "counts": [np.fromiter((tbl[t] for t in terms), dtype=np.int64)],
                "err": np.int64(thr),
                "n_tokens": np.int64(n),
            }
        )

    rows = ds.map_batches(
        _partial, batch_format="pandas", batch_size=None
    ).take_all()  # bounded: n_blocks × k entries by construction
    merged, err = mg_merge(
        [
            ({t: int(c) for t, c in zip(r["terms"], r["counts"])}, int(r["err"]))
            for r in rows
        ],
        k,
    )
    n_total = int(sum(int(r["n_tokens"]) for r in rows))
    out = pd.DataFrame(
        {"term": list(merged.keys()), "n_est": list(merged.values())}
    ).astype({"n_est": "int64"})
    out = (
        out.sort_values(["n_est", "term"], ascending=[False, True], kind="mergesort")
        .head(top)
        .reset_index(drop=True)
    )
    out["err_bound"] = np.int64(err)
    out["n_tokens_total"] = np.int64(n_total)
    return out


# ---------------------------------------------------------- Count-Min sketch

# Row-hash seeds for the d independent CMS rows: the value hash mixes with
# a distinct odd constant per row (Dietzfelbinger multiplicative family —
# public construction, Cormode & Muthukrishnan 2005 for the sketch itself).
_CMS_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
     0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD,
     0xC4CEB9FE1A85EC53, 0x2545F4914F6CDD1D],
    dtype=np.uint64,
)


def cms_batch(col, width: int = 2048, depth: int = 4) -> np.ndarray:
    """One Count-Min partial for a batch: a ``(depth, width)`` int64 count
    matrix, built with ``depth`` vectorized bincounts over the batch's
    value hashes — the mergeable-combiner shape again: every block emits a
    FIXED-SIZE matrix, merge is element-wise sum, so the collect volume is
    ``n_blocks × depth × width × 8 bytes`` no matter the input size."""
    if depth > len(_CMS_SEEDS):
        raise ValueError(f"depth must be <= {len(_CMS_SEEDS)}")
    h = _hash_values(col)
    sk = np.zeros((depth, width), np.int64)
    for d in range(depth):
        hd = h * _CMS_SEEDS[d]
        hd ^= hd >> np.uint64(33)
        idx = (hd % np.uint64(width)).astype(np.int64)
        sk[d] += np.bincount(idx, minlength=width).astype(np.int64)
    return sk


def cms_merge(parts: list[np.ndarray]) -> np.ndarray:
    """Element-wise sum — order-free, so any tree/driver merge is exact."""
    out = parts[0].copy()
    for p in parts[1:]:
        out += p
    return out


def cms_query(sk: np.ndarray, col) -> np.ndarray:
    """Point-estimate counts for the values in ``col``: min over the depth
    rows.  Guarantee (Cormode & Muthukrishnan): ``est >= true`` always,
    and ``est <= true + e/width * n`` with probability ``1 - e^-depth``
    per query, where n is the total inserted count."""
    h = _hash_values(col)
    depth, width = sk.shape
    est = np.full(len(h), np.iinfo(np.int64).max, np.int64)
    for d in range(depth):
        hd = h * _CMS_SEEDS[d]
        hd ^= hd >> np.uint64(33)
        idx = (hd % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, sk[d][idx])
    return est


def term_counts_cms(
    ds: Dataset,
    terms: list[str],
    text_col: str = "text",
    width: int = 2048,
    depth: int = 4,
) -> pd.DataFrame:
    """Approximate corpus-wide term counts for a fixed query-term list via
    a distributed Count-Min sketch: each block's TOKEN STREAM folds into
    one fixed-size matrix map-side (no vocabulary ever shuffles — vs
    ``text.top_terms``' exact vocab groupby), the driver merges
    ``n_blocks`` matrices, then answers the point queries locally.
    Returns ``(term, n_est)`` — always >= the true count."""
    import re as _re

    word_re = _re.compile(r"[A-Za-z]+")

    def _partial(df: pd.DataFrame):
        toks = (
            df[text_col].fillna("").str.findall(word_re).explode().dropna().str.lower()
        )
        sk = cms_batch(toks.to_numpy(dtype=object), width, depth)
        return pd.DataFrame({"sk": [sk.tobytes()]})

    parts = ds.map_batches(_partial, batch_format="pandas").to_pandas()
    mats = [
        np.frombuffer(b, dtype=np.int64).reshape(depth, width) for b in parts["sk"]
    ]
    sk = cms_merge(mats) if mats else np.zeros((depth, width), np.int64)
    est = cms_query(sk, np.asarray(terms, dtype=object))
    return pd.DataFrame({"term": list(terms), "n_est": est.astype(np.int64)})
