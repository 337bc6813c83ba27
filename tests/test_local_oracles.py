"""Hard local oracles for the driver's rows-only queries (VERDICT r1 #10):
every `queries()` entry with no SQL oracle is pinned here against a
driver-side vendored recomputation at sf0.001 — plain Python/pandas loops
(no Ray plumbing), exact frame equality.  A Ray-side regression (wrong
shuffle, dropped rows, schema drift) fails these even though the driver
records only row counts for these queries."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from crawler_uni_ray.functions import dedup as fdedup
from crawler_uni_ray.functions import multimodal as fmedia
from crawler_uni_ray.functions import text as ftext
from crawler_uni_ray.pipelines import queries as Q

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def _eq(got: pd.DataFrame, want: pd.DataFrame):
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_pin_docs_token_counts(ray_session, docs):
    got = Q.docs_token_counts(SF)
    want = pd.DataFrame(
        {
            "doc_id": docs["doc_id"],
            "n_tokens": [len(ftext.TOKEN_RE.findall(t or "")) for t in docs["text"]],
            "n_bpe_tokens": [len(ftext.BPE_RE.findall(t or "")) for t in docs["text"]],
        }
    ).sort_values("doc_id")
    _eq(got, want)


def test_pin_docs_langid(ray_session, docs):
    got = Q.docs_langid(SF)
    rows = []
    for d, t in zip(docs["doc_id"], docs["text"]):
        hits = {lang: len(rex.findall(t or "")) for lang, rex in ftext._LANG_RES.items()}
        best = max(hits, key=lambda l: hits[l])  # first max in dict order
        ntok = max(len(ftext.TOKEN_RE.findall(t or "")), 1)
        rows.append(
            (
                d,
                best if hits[best] >= 1 else "und",
                float(ftext.round6(np.float64(hits[best]) / ntok)),
            )
        )
    want = pd.DataFrame(rows, columns=["doc_id", "lang_pred", "lang_score"]).sort_values(
        "doc_id"
    )
    _eq(got, want)


def test_pin_docs_quality(ray_session, docs):
    got = Q.docs_quality(SF)
    rows = []
    for d, t in zip(docs["doc_id"], docs["text"]):
        t = t or ""
        n_chars = np.float64(len(t))
        n_tokens = np.float64(max(len(ftext.TOKEN_RE.findall(t)), 1))
        n_punct = np.float64(len(ftext.PUNCT_RE.findall(t)))
        n_stop = np.float64(
            sum(len(rex.findall(t)) for rex in ftext._LANG_RES.values())
        )
        mwl = n_chars / n_tokens
        pr = n_punct / max(n_chars, 1)
        sr = n_stop / n_tokens
        score = (
            np.clip(n_chars / 500.0, 0, 1) * 0.3
            + np.clip(1.0 - np.abs(mwl - 5.0) / 5.0, 0, 1) * 0.3
            + np.clip(sr * 5.0, 0, 1) * 0.2
            + np.clip(1.0 - pr * 5.0, 0, 1) * 0.2
        )
        rows.append(
            (d, ftext.round6(pr).item(), ftext.round6(sr).item(), ftext.round6(score).item())
        )
    want = pd.DataFrame(
        rows, columns=["doc_id", "punct_ratio", "stop_ratio", "quality"]
    ).sort_values("doc_id")
    _eq(got, want)


def test_pin_docs_fingerprint(ray_session, docs):
    got = Q.docs_fingerprint(SF)
    want = pd.DataFrame(
        {
            "doc_id": docs["doc_id"],
            "fingerprint": [
                ftext.fingerprint_text(t) & 0x7FFFFFFFFFFFFFFF for t in docs["text"]
            ],
        }
    ).sort_values("doc_id")
    _eq(got, want)


def test_pin_docs_simhash(ray_session, docs):
    got = Q.docs_simhash(SF)
    want = pd.DataFrame(
        {
            "doc_id": docs["doc_id"],
            "simhash": [
                int(fdedup.simhash_batch([t])[0].astype(np.int64)) for t in docs["text"]
            ],
        }
    ).sort_values("doc_id")
    _eq(got, want)


def test_pin_docs_simhash_pairs(ray_session, docs):
    """Brute-force all-pairs oracle: 4-band pigeonhole blocking is EXACT
    for hamming ≤ 3, so the LSH pipeline must equal the O(n²) scan."""
    got = Q.docs_simhash_pairs(SF)
    sh = {d: int(fdedup.simhash_batch([t])[0]) for d, t in zip(docs["doc_id"], docs["text"])}
    ids = sorted(sh)
    rows = [
        (a, b, bin(sh[a] ^ sh[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sh[a] ^ sh[b]).count("1") <= 3
    ]
    want = pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"]).sort_values(
        ["id_a", "id_b"]
    )
    _eq(got, want)


def _shingle_sets(docs):
    return {
        d: set(fdedup._shingle_hashes(t).tolist())
        for d, t in zip(docs["doc_id"], docs["text"])
    }


def test_pin_docs_ngram_jaccard_pairs(ray_session, docs):
    """Brute-force exact-Jaccard oracle: at threshold 0.8 with 32 2-row
    bands the LSH miss probability is ~(1-0.64)^32 ≈ 3e-15 — on this
    fixed dataset the pipeline must equal the O(n²) scan."""
    got = Q.docs_ngram_jaccard_pairs(SF)
    ss = _shingle_sets(docs)
    ids = sorted(ss)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = ss[a], ss[b]
            j = 1.0 if not sa and not sb else len(sa & sb) / max(1, len(sa | sb))
            j = round(j, 6)
            if j >= 0.8:
                rows.append((a, b, j))
    want = pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"]).sort_values(
        ["id_a", "id_b"]
    )
    _eq(got, want)


def test_pin_docs_minhash_clusters(ray_session, docs):
    """Vendored driver recomputation of the SAME banding algorithm
    (shared pure kernels, plain dict loop — no Ray)."""
    got = Q.docs_minhash_clusters(SF)
    a, b = fdedup._minhash_params(64)
    buckets: dict = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        # per-doc signature path (cross-checks the engine's batched
        # minhash_signatures_batch) + the shared band-hash kernel
        sig = fdedup.minhash_signature(fdedup._shingle_hashes(t), a, b)
        codes = fdedup.band_bucket_hashes(sig[None, :], 16)[0]
        for band in range(16):
            buckets.setdefault(int(codes[band]), set()).add(int(d))
    pairs = set()
    for members in buckets.values():
        ms = sorted(members)
        if len(ms) > fdedup.MAX_BUCKET_MEMBERS:
            pairs.update((ms[0], m) for m in ms[1:])
        else:
            pairs.update((x, y) for i, x in enumerate(ms) for y in ms[i + 1 :])
    ss = _shingle_sets(docs)
    verified = [
        (x, y)
        for x, y in pairs
        if round(
            1.0
            if not ss[x] and not ss[y]
            else len(ss[x] & ss[y]) / max(1, len(ss[x] | ss[y])),
            6,
        )
        >= 0.5
    ]
    comp = fdedup.connected_components(verified)
    want = pd.DataFrame(
        {
            "doc_id": sorted(docs["doc_id"]),
            "cluster_id": [comp.get(int(d), int(d)) for d in sorted(docs["doc_id"])],
        }
    )
    _eq(got, want)


def test_pin_embeddings_dup_pairs(ray_session):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = Q.embeddings_dup_pairs(SF)
    vecs = np.stack(emb["embedding"].to_numpy())
    unit64 = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    planes = np.random.RandomState(11).normal(size=(64, 12))
    codes = (unit64 @ planes > 0).astype(np.int64) @ (1 << np.arange(12, dtype=np.int64))
    ids = emb["vec_id"].to_numpy()
    unit32 = {int(i): unit64[k].astype(np.float32) for k, i in enumerate(ids)}
    buckets: dict = {}
    for k, (i, c) in enumerate(zip(ids, codes)):
        for p in [int(c)] + [int(c) ^ (1 << bit) for bit in range(12)]:
            buckets.setdefault(p, set()).add(int(i))
    rows = {}
    for members in buckets.values():
        ms = sorted(members)
        for i, x in enumerate(ms):
            for y in ms[i + 1 :]:
                cos = float(unit32[x] @ unit32[y])
                if cos >= 0.9:
                    rows[(x, y)] = round(cos, 6)
    want = pd.DataFrame(
        [(x, y, c) for (x, y), c in sorted(rows.items())],
        columns=["id_a", "id_b", "cosine"],
    )
    if len(got) == 0 and len(want) == 0:
        return
    _eq(got, want)


def test_pin_embeddings_ann_lsh(ray_session):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = Q.embeddings_ann_lsh(SF)
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float32)
    unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    ids = emb["vec_id"].to_numpy()
    q = emb[emb["vec_id"] < 8].sort_values("vec_id")
    qmat = np.stack(q["embedding"].to_numpy()).astype(np.float64).astype(np.float32)
    qunit = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    planes = np.random.RandomState(23).normal(size=(64, 10)).astype(np.float32)
    codes = (unit @ planes > 0).astype(np.int64) @ (1 << np.arange(10, dtype=np.int64))
    qcodes = (qunit @ planes > 0).astype(np.int64) @ (1 << np.arange(10, dtype=np.int64))
    rows = []
    for qi, qid in enumerate(q["vec_id"].tolist()):
        probes = {int(qcodes[qi])}
        probes |= {int(qcodes[qi]) ^ (1 << b) for b in range(10)}
        probes |= {
            int(qcodes[qi]) ^ (1 << b1) ^ (1 << b2)
            for b1 in range(10)
            for b2 in range(b1 + 1, 10)
        }
        m = np.isin(codes, list(probes))
        sims = unit[m] @ qunit[qi]
        order = sorted(zip(sims.tolist(), ids[m].tolist()), key=lambda t: (-t[0], t[1]))[
            :10
        ]
        rows.extend(
            (int(qid), int(nid), round(float(s), 6), rank + 1)
            for rank, (s, nid) in enumerate(order)
        )
    want = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine", "rnk"])
    _eq(got, want)


def test_pin_url_canonicalize(ray_session):
    from crawler_uni_ray.urlnorm import clean_url, host_of, is_in_scope

    got = Q.url_canonicalize(SF)
    for _, r in got.iterrows():
        c = clean_url(r["href"], r["base"]) or ""
        assert r["cleaned"] == c
        assert r["host"] == host_of(c)
        assert bool(r["in_scope"]) == is_in_scope(c, "ex.com")
    assert len(got) == 512


def test_pin_crawl_bfs_visited(ray_session):
    from crawler_uni_ray.corpus import TINY, build_pages_table
    from crawler_uni_ray.oracle import crawl_oracle

    got = Q.crawl_bfs_visited(SF)
    tbl = build_pages_table(TINY)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    oracle = crawl_oracle(corpus, "example.com")
    want = pd.DataFrame(
        sorted(oracle.visited_depth.items()), columns=["url", "depth"]
    )
    _eq(got, want)


def test_pin_media_frame_samples(ray_session):
    got = Q.media_frame_samples(SF)
    tbl = fmedia.synthetic_media_table(96)
    rows = []
    for mid, kind, payload in zip(
        tbl["media_id"].to_pylist(), tbl["kind"].to_pylist(), tbl["payload"].to_pylist()
    ):
        if kind == "image":
            continue
        for fi in range(4):
            f = fmedia._digest_floats(payload or b"", 16, b"frm%d" % fi)
            rows.append((mid, fi, round(float(np.mean(np.asarray(f.tolist(), np.float32))), 6)))
    want = pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_mean"]).sort_values(
        ["media_id", "frame_idx"]
    )
    _eq(got, want)


def test_pin_media_image_features(ray_session):
    got = Q.media_image_features(SF)
    tbl = fmedia.synthetic_media_table(96)
    rows = []
    for mid, kind, payload in zip(
        tbl["media_id"].to_pylist(), tbl["kind"].to_pylist(), tbl["payload"].to_pylist()
    ):
        if kind != "image":
            continue
        f = fmedia._digest_floats(payload or b"", 32, b"img")
        rows.append((mid, round(float(np.round(f.mean(), 6)), 6)))
    want = pd.DataFrame(rows, columns=["media_id", "feat_mean"]).sort_values("media_id")
    _eq(got, want)


def test_pin_embeddings_ann_ivf_persisted(ray_session):
    """The persisted-index path must return exactly the in-memory IVF
    rows (same centroids/nprobe; shared search kernel) — so the pinned
    ``embeddings_ann_ivf`` oracle transitively covers it too."""
    a = Q.embeddings_ann_ivf_persisted(SF).reset_index(drop=True)
    b = Q.embeddings_ann_ivf(SF).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def _fuzzy_survivor_ids(docs: pd.DataFrame, ids: set[int], threshold: float = 0.5):
    """Vendored driver recompute of the near-dedup keep-first over a doc-id
    subset (same banding/verify kernels as test_pin_docs_minhash_clusters)."""
    sub = docs[docs["doc_id"].isin(ids)]
    a, b = fdedup._minhash_params(64)
    buckets: dict = {}
    for d, t in zip(sub["doc_id"], sub["text"]):
        sig = fdedup.minhash_signature(fdedup._shingle_hashes(t), a, b)
        codes = fdedup.band_bucket_hashes(sig[None, :], 16)[0]
        for band in range(16):
            buckets.setdefault(int(codes[band]), set()).add(int(d))
    pairs = set()
    for members in buckets.values():
        ms = sorted(members)
        if len(ms) > fdedup.MAX_BUCKET_MEMBERS:
            pairs.update((ms[0], m) for m in ms[1:])
            pairs.update(zip(ms[1:-1], ms[2:]))
        else:
            pairs.update((x, y) for i, x in enumerate(ms) for y in ms[i + 1 :])
    ss = _shingle_sets(sub)
    verified = [
        (x, y)
        for x, y in pairs
        if round(
            1.0
            if not ss[x] and not ss[y]
            else len(ss[x] & ss[y]) / max(1, len(ss[x] | ss[y])),
            6,
        )
        >= threshold
    ]
    comp = fdedup.connected_components(verified)
    return {i for i in ids if comp.get(i, i) == i}


def test_pin_docs_training_pipeline(ray_session, docs):
    """The flagship composition recomposed driver-side from the
    independently-pinned/SQL-green component queries: quality gate →
    exact dedup on text_norm (min id per distinct value) → vendored
    near-dedup keep-first → join lang/quality/token metadata."""
    got = Q.docs_training_pipeline(SF)
    quality = Q.docs_quality(SF).set_index("doc_id")["quality"]
    norm = Q.docs_normalize(SF).set_index("doc_id")["text_norm"]
    gated = set(quality[quality >= 0.6].index)
    nsub = norm[norm.index.isin(gated)].reset_index()
    exact_keep = set(nsub.groupby("text_norm")["doc_id"].min())
    survivors = _fuzzy_survivor_ids(docs, exact_keep)
    lang = Q.docs_langid(SF).set_index("doc_id")["lang_pred"]
    toks = Q.docs_token_counts(SF).set_index("doc_id")["n_tokens"]
    want = pd.DataFrame(
        {
            "doc_id": sorted(survivors),
        }
    )
    want["lang_pred"] = want["doc_id"].map(lang)
    want["quality"] = want["doc_id"].map(quality)
    want["n_tokens"] = want["doc_id"].map(toks)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
    assert 0 < len(got) < len(docs)  # the gate and both dedups actually bit


def test_pin_docs_dedup_fuzzy(ray_session):
    """Fuzzy-dedup survivors ≡ the minhash clustering's own
    representatives (cluster_id == doc_id), computed with identical
    LSH params — and strictly fewer rows than the corpus (the sf0.001
    generator plants near-dup groups)."""
    clusters = Q.docs_minhash_clusters(SF)
    want = (
        clusters.loc[clusters["cluster_id"] == clusters["doc_id"], ["doc_id"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = Q.docs_dedup_fuzzy(SF).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) < len(clusters)


def test_pin_embeddings_ann_lsh_persisted(ray_session):
    """The persisted-index LSH path must return exactly the in-memory
    ann_lsh rows (same planes/multiprobe; shared probe + merge kernels) —
    so the pinned ``embeddings_ann_lsh`` oracle transitively covers it."""
    a = Q.embeddings_ann_lsh_persisted(SF).reset_index(drop=True)
    b = Q.embeddings_ann_lsh(SF).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_pin_embeddings_ann_ivf(ray_session):
    """Vendored driver-side IVF recomputation (same seeded k-means, same
    probe order, exact cosine over the probed lists) ≡ the Ray pipeline."""
    got = Q.embeddings_ann_ivf(SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    emb = emb.sort_values("vec_id")
    ids = emb["vec_id"].to_numpy()

    def unit(m):
        return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)

    mat = unit(np.stack(emb["embedding"].to_numpy()).astype(np.float32))
    rng = np.random.RandomState(7)
    cent = mat[rng.choice(len(mat), size=16, replace=False)]
    for _ in range(10):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = unit(cent)
    lists = np.argmax(mat @ cent.T, axis=1)
    q = emb[emb["vec_id"] < 8]
    qunit = unit(np.stack(q["embedding"].to_numpy()).astype(np.float64).astype(np.float32))
    order = np.argsort(-(qunit @ cent.T), axis=1, kind="stable")[:, :8]
    rows = []
    for qi, qid in enumerate(q["vec_id"].tolist()):
        m = np.isin(lists, order[qi])
        sims = mat[m] @ qunit[qi]
        best = sorted(zip(sims.tolist(), ids[m].tolist()), key=lambda t: (-t[0], t[1]))[:10]
        rows.extend(
            (int(qid), int(nid), round(float(s), 6), rank + 1)
            for rank, (s, nid) in enumerate(best)
        )
    want = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine", "rnk"])
    _eq(got, want)


def test_pin_docs_top_terms_approx(ray_session, docs):
    """At sf0.001 the synthetic vocabulary (~31 terms) is far below the
    MG summary size k=128, so NO compression ever fires: err_bound must
    be exactly 0 and the 'approximate' counts must equal the exact
    token counts — a hard pin.  (The error machinery itself is bounded
    on a 400-term zipf corpus in test_functions.py.)"""
    got = Q.docs_top_terms_approx(SF)
    from collections import Counter

    c = Counter()
    for t in docs["text"]:
        c.update(w.lower() for w in ftext.TOKEN_RE.findall(t or ""))
    want = (
        pd.DataFrame({"term": list(c.keys()), "n_est": list(c.values())})
        .sort_values(["n_est", "term"], ascending=[False, True], kind="mergesort")
        .head(25)
        .reset_index(drop=True)
    )
    assert (got["err_bound"] == 0).all()
    assert int(got["n_tokens_total"].iloc[0]) == sum(c.values())
    _eq(got[["term", "n_est"]], want)


def test_pin_events_value_quantiles_approx(ray_session):
    """Per-type approximate quantiles of events.value pinned to the
    summary's rank guarantee against the EXACT sorted column: each
    reported value's true within-type rank is within eps*n of ceil(q*n)
    (eps=0.005 as the query sets)."""
    got = Q.events_value_quantiles_approx(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    for _, row in got.iterrows():
        sub = np.sort(ev.loc[ev["event_type"] == row["event_type"], "value"].to_numpy())
        n = len(sub)
        for q, cname in ((0.5, "q0_5"), (0.9, "q0_9"), (0.99, "q0_99")):
            rank = np.searchsorted(sub, row[cname], side="right")
            assert abs(rank - np.ceil(q * n)) <= 0.005 * n + 1, (
                row["event_type"], q, row[cname], rank, n,
            )


def test_pin_embeddings_semdedup(ray_session):
    """SemDeDup pinned to a driver-side recomputation: centroids from the
    same seeded bounded-sample k-means, then plain-numpy nearest-centroid
    assignment + id-ordered greedy cosine prune — checks the distributed
    assignment broadcast, the cluster shuffle, and the per-cluster prune."""
    from crawler_uni_ray.functions import similarity as fsim

    got = Q.embeddings_semdedup(SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float32)
    unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    ds = Q._read(SF, "embeddings", columns=["vec_id", "embedding"])
    cent = fsim.kmeans_centroids(ds, n_centroids=8, seed=7)
    assign = np.argmax(unit @ cent.T, axis=1)
    ids = emb["vec_id"].to_numpy()
    rows = []
    for c in range(len(cent)):
        members = np.where(assign == c)[0]  # emb is vec_id-sorted already
        keep: list[int] = []
        for i in members:
            if keep and (unit[keep] @ unit[i] > 0.35).any():
                continue
            keep.append(int(i))
        rows.extend((int(ids[i]), c) for i in keep)
    want = pd.DataFrame(sorted(rows), columns=["vec_id", "cluster"])
    assert len(got) < len(emb)  # tau=0.35 really prunes on this corpus
    _eq(got, want)


def test_pin_docs_dedup_keep_best(ray_session):
    """Quality-aware fuzzy-dedup survivors ≡ cluster winners recomputed
    driver-side from docs_minhash_clusters × docs_quality (max quality,
    tie → min doc_id) — and at least one cluster's winner differs from
    keep-first's min-id choice (the sf0.001 near-dup groups have
    non-uniform quality), so the policy actually bites."""
    got = Q.docs_dedup_keep_best(SF)
    clusters = Q.docs_minhash_clusters(SF)
    quality = Q.docs_quality(SF).set_index("doc_id")["quality"]
    c = clusters.copy()
    c["q"] = c["doc_id"].map(quality)
    c = c.sort_values(
        ["cluster_id", "q", "doc_id"], ascending=[True, False, True], kind="mergesort"
    )
    winners = sorted(c.groupby("cluster_id", sort=False).head(1)["doc_id"])
    want = pd.DataFrame({"doc_id": winners})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want, check_dtype=False)
    keep_first = set(Q.docs_dedup_fuzzy(SF)["doc_id"])
    assert set(got["doc_id"]) != keep_first


def _ref_cdc(texts, mask_bits=4, min_size=64, max_size=256):
    """Independent per-byte reference for Gear CDC: rolling
    h = (h<<1) + GEAR[b] mod 2^64 from each DOC start (the engine hashes
    the batch concatenation, exact because boundaries at in-doc offsets
    < 63 are unreachable under min_size >= 64), linear greedy scan."""
    import hashlib

    from crawler_uni_ray.functions.dedup import GEAR

    mask = (1 << mask_bits) - 1
    per_doc = {}
    for did, t in texts.items():
        data = t.encode("utf-8")
        n = len(data)
        h, cands = 0, []
        for i, b in enumerate(data):
            h = ((h << 1) + int(GEAR[b])) & 0xFFFFFFFFFFFFFFFF
            if (h & mask) == 0:
                cands.append(i)
        cuts, cur = [], 0
        while cur < n:
            pick = None
            for c in cands:
                if cur + min_size - 1 <= c <= cur + max_size - 1:
                    pick = c
                    break
            if pick is not None and pick + 1 < n:
                cur = pick + 1
            elif n - cur > max_size:
                cur = cur + max_size
            else:
                break
            cuts.append(cur)
        edges = [0] + cuts + [n]
        hashes = []
        for a, b in zip(edges[:-1], edges[1:]):
            d = hashlib.blake2b(data[a:b], digest_size=8).digest()
            hashes.append(int.from_bytes(d, "big") >> 1)
        per_doc[did] = hashes
    return per_doc


def test_pin_docs_cdc_chunks(ray_session):
    """CDC chunk stats ≡ the per-byte rolling-hash reference above: same
    chunk counts per doc and same cross-doc duplicate-chunk counts — and
    the duplicate stat actually bites on the sf0.001 near-dup groups."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    per_doc = _ref_cdc(texts)
    from collections import Counter

    df_counts = Counter()
    for did, hashes in per_doc.items():
        for hsh in set(hashes):
            df_counts[hsh] += 1
    want = pd.DataFrame(
        {
            "doc_id": sorted(per_doc),
            "n_chunks": [len(per_doc[d]) for d in sorted(per_doc)],
            "n_dup_chunks": [
                sum(1 for hsh in set(per_doc[d]) if df_counts[hsh] >= 2)
                for d in sorted(per_doc)
            ],
        }
    )
    got = Q.docs_cdc_chunks(SF).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_dup_chunks"] > 0).sum() > 10


def test_pin_docs_lm_nll(ray_session):
    """Bigram-LM NLL scores ≡ a pure-Python Counter recompute of the same
    add-one model (train split doc_id % 7 == 0), atol 1e-9 — and the
    scores spread (the filter has signal to gate on)."""
    import pyarrow.parquet as pq

    got = Q.docs_lm_nll(SF)
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    from collections import Counter

    uni, big = Counter(), Counter()
    for t in tbl[tbl.doc_id % 7 == 0].text:
        toks = t.split(" ")
        uni.update(toks)
        big.update(zip(toks[:-1], toks[1:]))
    v = float(len(uni))
    rows = []
    for did, t in zip(tbl.doc_id, tbl.text):
        toks = t.split(" ")
        bgs = list(zip(toks[:-1], toks[1:]))
        if not bgs:
            rows.append((did, 0, 0.0))
            continue
        ll = sum(np.log(big[b] + 1.0) - np.log(uni[b[0]] + v) for b in bgs)
        rows.append((did, len(bgs), round(-ll / len(bgs), 6)))
    want = (
        pd.DataFrame(rows, columns=["doc_id", "n_bigrams", "nll"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)
    assert got["nll"].nunique() > 100


def test_pin_docs_term_counts_cms(ray_session):
    """Count-Min estimates obey the sketch guarantee against exact counts:
    est >= true always, and est <= true + ceil(e/width · n_tokens)
    (deterministic for fixed data + seeds, so this pins the output), and
    the absent term ('zebra') stays within the same slack of zero."""
    import math
    import re

    import pyarrow.parquet as pq

    got = Q.docs_term_counts_cms(SF).set_index("term")["n_est"]
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    word_re = re.compile(r"[A-Za-z]+")
    from collections import Counter

    exact = Counter()
    for t in texts:
        exact.update(w.lower() for w in word_re.findall(t))
    n_total = sum(exact.values())
    slack = math.ceil(math.e / 2048 * n_total)
    for term in Q.CMS_QUERY_TERMS:
        assert got[term] >= exact[term], term
        assert got[term] <= exact[term] + slack, (term, got[term], exact[term], slack)
    assert exact["zebra"] == 0


def test_pin_docs_cosine_pairs(ray_session):
    """All-pairs tf·idf cosine join ≡ a dense numpy recompute (same
    linear idf, same L2 normalization), atol 1e-6 after round-6 — and
    the threshold keeps a non-trivial, non-exhaustive pair set."""
    import re

    import pyarrow.parquet as pq
    from collections import Counter

    got = Q.docs_cosine_pairs(SF)
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    word_re = re.compile(r"[A-Za-z]+")
    docs = {
        r.doc_id: Counter(w.lower() for w in word_re.findall(r.text))
        for r in tbl.itertuples()
    }
    vocab = sorted({t for c in docs.values() for t in c})
    dfc = Counter()
    for c in docs.values():
        dfc.update(set(c))
    n = float(len(docs))
    ids = sorted(docs)
    vix = {t: i for i, t in enumerate(vocab)}
    m = np.zeros((len(ids), len(vocab)))
    for r, did in enumerate(ids):
        for t, tf in docs[did].items():
            m[r, vix[t]] = tf * (n / dfc[t])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    s = m @ m.T
    rows = [
        (ids[i], ids[j], round(s[i, j], 6))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if s[i, j] >= 0.9
    ]
    want = (
        pd.DataFrame(rows, columns=["id_a", "id_b", "cos"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-6)
    assert 0 < len(got) < len(ids) * (len(ids) - 1) // 2


def test_pin_docs_weighted_sample(ray_session):
    """A-ES weighted sample ≡ a driver recompute of the same keys
    (u from the id scramble, key = u^(1/quality), top-50 by key desc /
    id asc) — exact id-set equality — and the sample is quality-biased:
    its mean quality exceeds the corpus mean."""
    got = Q.docs_weighted_sample(SF)
    quality = Q.docs_quality(SF).set_index("doc_id")["quality"]
    ids = quality.index.to_numpy()
    u = (((ids * 2654435761) % 4294967296) + 1.0) / 4294967297.0
    key = u ** (1.0 / np.maximum(quality.to_numpy(np.float64), 1e-12))
    order = np.lexsort((ids, -key))
    want_ids = sorted(ids[order[:50]])
    assert list(got["doc_id"]) == want_ids
    assert got["quality"].mean() > quality.mean()
