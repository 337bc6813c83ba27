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
