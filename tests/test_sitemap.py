"""Sitemap seed source (sources/sitemap.py): protocol parse (urlset /
sitemapindex / malformed), driver index walk (depth cap, dedup, misses),
distributed leaf parse, and a crawl seeded FROM a sitemap ≡ oracle run
with the same seed list."""

import pyarrow as pa
import pytest
import ray

from crawler_uni_ray.oracle import crawl_oracle
from crawler_uni_ray.pipelines.crawl import CrawlConfig, CrawlEngine
from crawler_uni_ray.sources.sitemap import (
    expand_sitemaps,
    leaf_seeds_dataset,
    parse_sitemap,
    sitemaps_from_robots,
)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _urlset(urls) -> bytes:
    body = "".join(f"<url><loc>{u}</loc><lastmod>2026-01-01</lastmod></url>" for u in urls)
    return f'<?xml version="1.0"?><urlset {NS}>{body}</urlset>'.encode()


def _index(sitemaps) -> bytes:
    body = "".join(f"<sitemap><loc> {s} </loc></sitemap>" for s in sitemaps)
    return f'<?xml version="1.0"?><sitemapindex {NS}>{body}</sitemapindex>'.encode()


def test_parse_kinds_and_malformed():
    assert parse_sitemap(_urlset(["https://x.test/a"])) == (
        "urlset",
        ["https://x.test/a"],
    )
    kind, locs = parse_sitemap(_index(["https://x.test/sm1.xml"]))
    assert kind == "sitemapindex" and locs == ["https://x.test/sm1.xml"]
    assert parse_sitemap(b"<not-xml") == ("invalid", [])
    assert parse_sitemap(b"<html></html>") == ("invalid", [])
    # namespace-free documents also parse (local-name matching)
    assert parse_sitemap(b"<urlset><url><loc>u1</loc></url></urlset>") == (
        "urlset",
        ["u1"],
    )


def test_expand_walks_index_with_misses_and_depth_cap():
    docs = {
        "https://x.test/sitemap.xml": _index(
            ["https://x.test/sm1.xml", "https://x.test/deep0.xml", "https://x.test/missing.xml"]
        ),
        "https://x.test/sm1.xml": _urlset(["https://x.test/a", "https://x.test/b"]),
        # a chain deeper than max_depth: deep0 -> deep1 -> urlset
        "https://x.test/deep0.xml": _index(["https://x.test/deep1.xml"]),
        "https://x.test/deep1.xml": _urlset(["https://x.test/c"]),
    }
    fetch = docs.get
    assert expand_sitemaps(fetch, ["https://x.test/sitemap.xml"]) == [
        "https://x.test/a",
        "https://x.test/b",
        "https://x.test/c",
    ]
    # depth 1 = root index + its direct children only
    assert expand_sitemaps(fetch, ["https://x.test/sitemap.xml"], max_depth=1) == [
        "https://x.test/a",
        "https://x.test/b",
    ]
    assert expand_sitemaps(fetch, ["https://x.test/sitemap.xml"], max_urls=2) == [
        "https://x.test/a",
        "https://x.test/b",
    ]


def test_sitemaps_from_robots_directives():
    rules = {
        "a.test": (
            "User-agent: *\nDisallow: /private\n"
            "Sitemap: https://a.test/sitemap.xml\n"
            "SITEMAP:   https://a.test/sm2.xml  \n"
        ),
        "b.test": "User-agent: *\nAllow: /\n",  # no directive
        "c.test": "sitemap: https://a.test/sitemap.xml\nSitemap:\n",  # dup + empty
    }
    assert sitemaps_from_robots(rules) == [
        "https://a.test/sitemap.xml",
        "https://a.test/sm2.xml",
    ]
    assert sitemaps_from_robots({}) == []


def test_discovery_chain_robots_to_seeds():
    """robots.txt → Sitemap: directive → index walk → seeds (the standard
    discovery chain end-to-end, no Ray needed)."""
    docs = {
        "https://x.test/sm.xml": _urlset(["https://x.test/a", "https://x.test/b"]),
    }
    rules = {"x.test": "User-agent: *\nSitemap: https://x.test/sm.xml\n"}
    roots = sitemaps_from_robots(rules)
    assert expand_sitemaps(docs.get, roots) == [
        "https://x.test/a",
        "https://x.test/b",
    ]


def test_leaf_seeds_dataset(ray_session):
    docs = {
        f"https://x.test/sm{i}.xml": _urlset(
            [f"https://x.test/p{i}-{j}" for j in range(3)]
        )
        for i in range(4)
    }
    docs["https://x.test/broken.xml"] = b"<oops"
    leafs = ray.data.from_arrow(
        pa.table({"url": sorted(docs)})
    )
    rows = leaf_seeds_dataset(leafs, docs.get).take_all()
    got = sorted(r["url"] for r in rows)
    assert got == sorted(
        f"https://x.test/p{i}-{j}" for i in range(4) for j in range(3)
    )
    assert all(r["sitemap_url"] in docs for r in rows)


def test_crawl_seeded_from_sitemap(ray_session, tmp_path):
    from test_random_graphs import DOMAIN, random_corpus

    corpus = random_corpus(seed=9, n_urls=40)
    present = sorted(corpus)[:6]
    sm = {
        f"https://{DOMAIN}/sitemap.xml": _index([f"https://{DOMAIN}/sm1.xml"]),
        f"https://{DOMAIN}/sm1.xml": _urlset(present),
    }
    seeds = expand_sitemaps(sm.get, [f"https://{DOMAIN}/sitemap.xml"])
    assert seeds == sorted(present)

    oracle = crawl_oracle(corpus, DOMAIN, seeds=seeds)
    eng = CrawlEngine(
        CrawlConfig(
            domain=DOMAIN,
            ckpt_dir=str(tmp_path / "ckpt"),
            corpus_dict=corpus,
            seeds=seeds,
        )
    )
    eng.run()
    assert eng.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in eng.all_links_sorted().take_all()]
    assert links == oracle.sorted_links


def test_corpus_fetch_fn_point_lookup(ray_session, tmp_path):
    """Driver-side pruned lookup over the partitioned corpus (the CLI's
    sitemap transport): present url → exact bytes, absent → None."""
    from crawler_uni_ray.corpus import TINY, build_pages_table, write_corpus_parquet
    from crawler_uni_ray.sources.pages import corpus_fetch_fn

    cdir = str(tmp_path / "corpus")
    write_corpus_parquet(TINY, cdir, num_shards=4)
    tbl = build_pages_table(TINY)
    urls = tbl["url"].to_pylist()
    htmls = tbl["html"].to_pylist()
    fetch = corpus_fetch_fn(cdir, num_shards=4)
    for u, h in list(zip(urls, htmls))[:5]:
        assert fetch(u) == h
    assert fetch("https://example.com/definitely-absent") is None
