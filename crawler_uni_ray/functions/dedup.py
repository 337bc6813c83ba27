"""Deduplication suite for training-data pipelines (task brief):

* exact       — content-hash partition + first-per-group
* MinHash+LSH — shingle → minhash sig → band → bucket groupby → verify
* SimHash     — 64-bit fingerprint, hamming-ball blocking via 4 bands
* n-gram Jaccard — shared-shingle blocking + exact verify
* embedding cosine — random-hyperplane LSH buckets + within-bucket verify

Physical shape shared by all near-dup variants: a vectorized per-batch
signature stage (map_batches) → EXPLODE to (bucket_key, doc_id) rows →
``groupby(bucket)`` (the one shuffle) → per-bucket candidate pairs →
verify.  Candidate pairs are tiny relative to the corpus (that is the
point of LSH), so pair verification broadcasts the needed doc payloads or
re-reads them per bucket; the final connected-components/dedup-keep step
runs on the (small) pair set.  At 100 TB the only all-to-all is the bucket
groupby, whose keys are short hashes — never full documents.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..ops import dedup_exact_first
from ..urlnorm import url_hash_batch

# ------------------------------------------------------------------ exact


def content_hash_batch(texts) -> np.ndarray:
    """Deterministic 64-bit content hash (md5-derived) per text."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        d = hashlib.md5((t or "").encode("utf-8")).digest()
        out[i] = int.from_bytes(d[:8], "little")
    return out


def exact_dedup(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id", n_buckets: int = 64
) -> Dataset:
    """Keep the min-id row per distinct text.  Hash first so the shuffle
    key is 8 bytes, not the document."""

    def _hash(df: pd.DataFrame) -> pd.DataFrame:
        df["__h"] = content_hash_batch(df[text_col]).astype("uint64").astype("int64")
        return df

    hashed = ds.map_batches(_hash, batch_format="pandas")
    out = dedup_exact_first(hashed, "__h", id_col, n_buckets=n_buckets)
    return out.drop_columns(["__h"])


# ------------------------------------------------------------------ shingles / minhash

# Mersenne-31 keeps a*x+b inside uint64 → the signature stays a pure
# vectorized numpy computation (no object-int fallback)
_MERSENNE = (1 << 31) - 1


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingle hashes (uint64) for one document."""
    toks = (text or "").split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.zeros(0, dtype=np.uint64)
    return url_hash_batch(shingles)  # deterministic vectorized siphash


def _minhash_params(n_hashes: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """min over shingles of (a*x + b) mod p — one value per hash fn,
    vectorized (a, x < 2^31 → products fit uint64)."""
    if len(shingles) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    x = (shingles % np.uint64(_MERSENNE))[None, :]
    vals = (a[:, None] * x + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa = set(_shingle_hashes(text_a, k).tolist())
    sb = set(_shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def _pairs_from_groups(df: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """All within-bucket candidate id pairs (a < b)."""
    ids = sorted(set(df[id_col].tolist()))
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    return pd.DataFrame(pairs, columns=["id_a", "id_b"])


def minhash_lsh_candidates(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
) -> Dataset:
    """Candidate near-dup pairs via MinHash banding: sig → (band, band
    hash) rows → bucket groupby → within-bucket pairs, deduped."""
    assert n_hashes % bands == 0
    rows_per_band = n_hashes // bands
    a, b = _minhash_params(n_hashes)

    def _sig(df: pd.DataFrame) -> pd.DataFrame:
        out_id, out_band, out_bh = [], [], []
        for doc_id, text in zip(df[id_col], df[text_col]):
            sig = minhash_signature(_shingle_hashes(text, k), a, b)
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                bh = hashlib.md5(chunk.tobytes() + bytes([band])).digest()
                out_id.append(doc_id)
                out_band.append(band)
                out_bh.append(int.from_bytes(bh[:8], "little") >> 1)
        return pd.DataFrame({id_col: out_id, "band": out_band, "bucket": out_bh})

    exploded = ds.map_batches(_sig, batch_format="pandas")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        return _pairs_from_groups(g, id_col)

    pairs = exploded.groupby("bucket").map_groups(_pairs, batch_format="pandas")

    def _cast(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["id_a"].cast(pa.int64()), t["id_b"].cast(pa.int64())],
            names=["id_a", "id_b"],
        )

    casted = pairs.map_batches(_cast, batch_format="pyarrow")

    # dedup identical pairs surfaced by multiple bands
    def _key(t: pa.Table) -> pa.Table:
        key = [f"{x}:{y}" for x, y in zip(t["id_a"].to_pylist(), t["id_b"].to_pylist())]
        return t.append_column("__k", pa.array(key, pa.string()))

    keyed = casted.map_batches(_key, batch_format="pyarrow")
    from ..ops import dedup_exact

    return dedup_exact(keyed, "__k", n_buckets=16).drop_columns(["__k"])


def verify_pairs_jaccard(
    pairs: Dataset, texts_ref, threshold: float, id_col: str = "doc_id", k: int = 3
) -> Dataset:
    """Exact-Jaccard verification of candidate pairs against a broadcast
    id → text dict (pairs ≪ corpus; the dict is the small side)."""
    from ..util import cached_get

    def _verify(df: pd.DataFrame) -> pd.DataFrame:
        texts = cached_get(texts_ref)
        if len(df) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        sims = [
            round(jaccard(texts.get(a, ""), texts.get(b, ""), k), 6)
            for a, b in zip(df["id_a"], df["id_b"])
        ]
        df = df.copy()
        df["jaccard"] = sims
        return df[df["jaccard"] >= threshold]

    return pairs.map_batches(_verify, batch_format="pandas")


def connected_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find over the (small) verified-duplicate pair set → node →
    min-id cluster representative.  Driver-side by design: the pair set
    after LSH+verify is orders of magnitude smaller than the corpus."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in parent}


# ------------------------------------------------------------------ simhash


def simhash_batch(texts, n_bits: int = 64) -> np.ndarray:
    """64-bit SimHash per text from token siphashes (vectorized bit
    tally per doc)."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if not toks:
            out[i] = 0
            continue
        h = url_hash_batch(toks)
        bits = ((h[:, None] >> np.arange(n_bits, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        tally = bits.sum(axis=0) * 2 - len(toks)
        out[i] = np.uint64(
            int("".join("1" if v > 0 else "0" for v in tally[::-1]), 2)
        )
    return out


def add_simhash(ds: Dataset, text_col: str = "text") -> Dataset:
    def _f(df: pd.DataFrame) -> pd.DataFrame:
        df["simhash"] = simhash_batch(df[text_col]).astype("uint64").astype("int64")
        return df

    return ds.map_batches(_f, batch_format="pandas")


def simhash_dup_pairs(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> Dataset:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.  Blocking: split
    the 64-bit hash into max_hamming+1 bands — any pair within distance d
    shares ≥1 exact band (pigeonhole) → bucket groupby + verify."""
    n_bands = max_hamming + 1
    width = 64 // n_bands

    def _explode(df: pd.DataFrame) -> pd.DataFrame:
        sh = simhash_batch(df[text_col])
        rows = {id_col: [], "simhash": [], "bucket": []}
        for doc_id, h in zip(df[id_col], sh):
            for band in range(n_bands):
                chunk = (int(h) >> (band * width)) & ((1 << width) - 1)
                rows[id_col].append(doc_id)
                rows["simhash"].append(np.int64(np.uint64(h).astype(np.int64)))
                rows["bucket"].append((band << 60) | chunk)
        return pd.DataFrame(rows)

    exploded = ds.map_batches(_explode, batch_format="pandas")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        recs = sorted(set(zip(g[id_col], g["simhash"])))
        out = {"id_a": [], "id_b": [], "hamming": []}
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                (ia, ha), (ib, hb) = recs[i], recs[j]
                d = bin(int(np.uint64(ha)) ^ int(np.uint64(hb))).count("1")
                if d <= max_hamming:
                    out["id_a"].append(ia)
                    out["id_b"].append(ib)
                    out["hamming"].append(d)
        return pd.DataFrame(out)

    pairs = exploded.groupby("bucket").map_groups(_pairs, batch_format="pandas")

    def _key(t: pa.Table) -> pa.Table:
        key = [f"{x}:{y}" for x, y in zip(t["id_a"].to_pylist(), t["id_b"].to_pylist())]
        return t.append_column("__k", pa.array(key, pa.string()))

    from ..ops import dedup_exact

    keyed = pairs.map_batches(_key, batch_format="pyarrow")
    return dedup_exact(keyed, "__k", n_buckets=16).drop_columns(["__k"])


# ------------------------------------------------------------------ embedding cosine near-dup


def embedding_dup_pairs(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
    dim: int = 64,
) -> Dataset:
    """Cosine near-dup via random-hyperplane LSH: bucket = sign-bit code of
    ``n_planes`` projections; verify exact cosine within buckets.  Two
    vectors at cosine ≥ t collide with prob (1 - acos(t)/π)^n_planes per
    code; for recall, also emit codes with each single bit flipped
    (multi-probe)."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, n_planes))

    def _explode(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df[vec_col].to_numpy())
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.maximum(norms, 1e-12)
        proj = unit @ planes
        codes = (proj > 0).astype(np.int64) @ (1 << np.arange(n_planes, dtype=np.int64))
        rows = {id_col: [], "bucket": [], "__vec": []}
        for i, (doc_id, code) in enumerate(zip(df[id_col], codes)):
            probes = [int(code)] + [int(code) ^ (1 << b) for b in range(n_planes)]
            for p in probes:
                rows[id_col].append(doc_id)
                rows["bucket"].append(p)
                rows["__vec"].append(unit[i].astype(np.float32))
        return pd.DataFrame(rows)

    exploded = ds.map_batches(_explode, batch_format="pandas")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        uniq = g.drop_duplicates(subset=[id_col])
        if len(uniq) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        ids = uniq[id_col].to_numpy()
        mat = np.stack(uniq["__vec"].to_numpy())
        sims = mat @ mat.T
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        out = pd.DataFrame(
            {
                "id_a": np.minimum(ids[ia], ids[ib]),
                "id_b": np.maximum(ids[ia], ids[ib]),
                "cosine": sims[ia, ib].round(6),
            }
        )
        return out

    pairs = exploded.groupby("bucket").map_groups(_pairs, batch_format="pandas")

    def _key(t: pa.Table) -> pa.Table:
        key = [f"{x}:{y}" for x, y in zip(t["id_a"].to_pylist(), t["id_b"].to_pylist())]
        return t.append_column("__k", pa.array(key, pa.string()))

    from ..ops import dedup_exact

    keyed = pairs.map_batches(_key, batch_format="pyarrow")
    return dedup_exact(keyed, "__k", n_buckets=16).drop_columns(["__k"])
