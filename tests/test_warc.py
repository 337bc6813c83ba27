"""WARC source/sink (sources/warc.py): byte-exact roundtrip (plain and
per-record-gzip), idempotent batch-file writes, and a full crawl
conformance run over a corpus INGESTED FROM WARC (archive → partitioned
parquet → partitioned-fetch BFS ≡ oracle)."""

import glob
import os

import pyarrow as pa
import pytest
import ray

from crawler_uni_ray.oracle import crawl_oracle
from crawler_uni_ray.pipelines.crawl import CrawlConfig, CrawlEngine
from crawler_uni_ray.sources.warc import (
    parse_warc_bytes,
    read_warc,
    warc_bytes_from_batch,
    warc_to_corpus_parquet,
    write_warc,
)

URLS = ["https://a.wt.test/x.html", "https://b.wt.test/y?q=1&r=%20"]
TSS = ["2026-01-01T00:00:00Z", "2026-01-02T03:04:05Z"]
# adversarial payloads: record/header markers, CRLFs, NULs, empty body
HTMLS = [b"<html>\r\n\r\nWARC/1.0\r\nContent-Length: 7\x00</html>", b""]


@pytest.mark.parametrize("compress", [False, True])
def test_pure_roundtrip_adversarial_payloads(compress):
    data = warc_bytes_from_batch(URLS, TSS, HTMLS, compress=compress)
    assert parse_warc_bytes(data) == list(zip(URLS, TSS, HTMLS))
    # deterministic bytes (the idempotent-writer property)
    assert data == warc_bytes_from_batch(URLS, TSS, HTMLS, compress=compress)


def test_parse_skips_non_response_records():
    rec = warc_bytes_from_batch(URLS[:1], TSS[:1], HTMLS[:1])
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    assert parse_warc_bytes(info + rec) == [(URLS[0], TSS[0], HTMLS[0])]


@pytest.mark.parametrize("compress", [False, True])
def test_ray_roundtrip_and_idempotent_names(ray_session, tmp_path, compress):
    n = 10
    urls = [f"https://h{i % 3}.wt.test/p{i}.html" for i in range(n)]
    tss = ["2026-01-01T00:00:00Z"] * n
    htmls = [f"<html><p>page {i} \x00\r\n</p></html>".encode() for i in range(n)]
    t = pa.table({"url": urls, "warc_ts": tss, "html": pa.array(htmls, pa.binary())})
    out = str(tmp_path / "archives")

    write_warc(ray.data.from_arrow(t), out, compress=compress, batch_size=4).count()
    ext = "*.warc.gz" if compress else "*.warc"
    files = sorted(glob.glob(os.path.join(out, ext)))
    assert files, "no archives written"

    # rewrite (simulated task retry): same content-derived names, same bytes
    before = {f: open(f, "rb").read() for f in files}
    write_warc(ray.data.from_arrow(t), out, compress=compress, batch_size=4).count()
    assert sorted(glob.glob(os.path.join(out, ext))) == files
    assert {f: open(f, "rb").read() for f in files} == before

    got = {
        r["url"]: (r["warc_ts"], r["html"])
        for r in read_warc(files).take_all()
    }
    assert got == {u: (ts, h) for u, ts, h in zip(urls, tss, htmls)}


def test_crawl_from_warc_ingested_corpus(ray_session, tmp_path):
    from test_random_graphs import DOMAIN, random_corpus

    corpus = random_corpus(seed=5, n_urls=40)
    urls = sorted(corpus)
    t = pa.table(
        {
            "url": urls,
            "warc_ts": ["2026-01-01T00:00:00Z"] * len(urls),
            "html": pa.array([corpus[u] for u in urls], pa.binary()),
        }
    )
    warc_dir = str(tmp_path / "warc")
    write_warc(ray.data.from_arrow(t), warc_dir, compress=True, batch_size=8).count()

    corpus_dir = warc_to_corpus_parquet(
        sorted(glob.glob(os.path.join(warc_dir, "*.warc.gz"))),
        str(tmp_path / "corpus"),
        num_shards=4,
    )

    oracle = crawl_oracle(corpus, DOMAIN)
    eng = CrawlEngine(
        CrawlConfig(
            domain=DOMAIN,
            ckpt_dir=str(tmp_path / "ckpt"),
            corpus_path=corpus_dir,
            fetch_mode="partitioned",
            num_corpus_shards=4,
            fetch_align_threshold=0,
            small_level_rows=0,
        )
    )
    eng.run()
    assert eng.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in eng.all_links_sorted().take_all()]
    assert links == oracle.sorted_links


def test_engine_export_warc(ray_session, tmp_path):
    """Crawl → export_warc → read_warc: archives hold exactly the fetched
    pages with byte-identical text payloads (M5 identity through WARC)."""
    from test_random_graphs import DOMAIN, random_corpus

    corpus = random_corpus(seed=13, n_urls=30)
    oracle = crawl_oracle(corpus, DOMAIN)
    assert len(oracle.text) > 0  # seed chosen so pages actually fetch
    eng = CrawlEngine(
        CrawlConfig(
            domain=DOMAIN, ckpt_dir=str(tmp_path / "ckpt"), corpus_dict=corpus
        )
    )
    eng.run()
    out = str(tmp_path / "archives")
    n = eng.export_warc(out)
    assert n == len(oracle.text)  # fetched pages only, misses skipped
    files = sorted(glob.glob(os.path.join(out, "*.warc.gz")))
    back = {
        r["url"]: r["html"].decode("utf-8") for r in read_warc(files).take_all()
    }
    assert back == oracle.text


def test_warc_ingest_write_groups_decoupled_from_layout(ray_session, tmp_path):
    """Memory-bounded ingest: with a small target_group_bytes the write
    modulus exceeds num_shards (k ≥ 2) — each shard dir holds several
    url-sorted files, rewrites are idempotent, and the crawl over the
    multi-file layout still matches the oracle."""
    from test_random_graphs import DOMAIN, random_corpus

    corpus = random_corpus(seed=5, n_urls=40)
    urls = sorted(corpus)
    t = pa.table(
        {
            "url": urls,
            "warc_ts": ["2026-01-01T00:00:00Z"] * len(urls),
            "html": pa.array([corpus[u] for u in urls], pa.binary()),
        }
    )
    warc_dir = str(tmp_path / "warc")
    write_warc(ray.data.from_arrow(t), warc_dir, compress=False, batch_size=8).count()
    paths = sorted(glob.glob(os.path.join(warc_dir, "*.warc")))
    total = sum(os.path.getsize(p) for p in paths)

    out = str(tmp_path / "corpus")
    # force k >= 3 write groups per shard
    warc_to_corpus_parquet(
        paths, out, num_shards=4, target_group_bytes=max(1, total // 12)
    )
    files = sorted(glob.glob(os.path.join(out, "part_hash=*", "*.parquet")))
    assert len(files) > 4, "write-group modulus did not exceed the layout"
    # every file's group id lands in its own shard dir
    for f in files:
        grp = int(os.path.basename(f).split("-")[1].split(".")[0])
        shard = int(os.path.dirname(f).split("=")[1])
        assert grp % 4 == shard

    # rewrite (simulated retry): identical names + bytes
    before = {f: open(f, "rb").read() for f in files}
    warc_to_corpus_parquet(
        paths, out, num_shards=4, target_group_bytes=max(1, total // 12)
    )
    assert {f: open(f, "rb").read() for f in files} == before
    assert sorted(glob.glob(os.path.join(out, "part_hash=*", "*.parquet"))) == files

    oracle = crawl_oracle(corpus, DOMAIN)
    eng = CrawlEngine(
        CrawlConfig(
            domain=DOMAIN,
            ckpt_dir=str(tmp_path / "ckpt"),
            corpus_path=out,
            fetch_mode="partitioned",
            num_corpus_shards=4,
            fetch_align_threshold=0,
            small_level_rows=0,
        )
    )
    eng.run()
    assert eng.visited_depth() == oracle.visited_depth
