"""Corpus determinism + byte-identity, and oracle behavior checks
(FIXTURES.md §1/§4; reference semantics from /root/reference/crawler.py)."""

from crawler_uni_ray.corpus import TINY, build_pages_table, build_robots_table, host_name
from crawler_uni_ray.extract import extract_text
from crawler_uni_ray.oracle import crawl_oracle
from crawler_uni_ray.stages.robots import robots_table_to_dict


DIS_HOST = host_name(TINY, 2)


def _corpus():
    tbl = build_pages_table(TINY)
    return tbl, dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))


def test_corpus_deterministic_and_text_identical():
    t1, t2 = build_pages_table(TINY), build_pages_table(TINY)
    assert t1.equals(t2)
    for html, text in zip(t1["html"].to_pylist(), t1["text"].to_pylist()):
        assert extract_text(html) == text  # byte-identity by construction


def test_oracle_reference_semantics():
    tbl, corpus = _corpus()
    res = crawl_oracle(corpus, "example.com")
    # seed visited at depth 0 as the RAW string (crawler.py:76)
    assert res.visited_depth["https://example.com"] == 0
    # port-bearing same-domain links saved but never crawled (crawler.py:26)
    port_links = [u for u in res.all_links if ":8080" in u]
    assert port_links and all(u not in res.visited_depth for u in port_links)
    # off-domain links saved but never crawled
    off = [u for u in res.all_links if "offsite.example.org" in u]
    assert off and all(u not in res.visited_depth for u in off)
    # suffix over-match host IS crawled (bug kept)
    assert any("evil-example.com" in u for u in res.visited_depth)
    # userinfo urls crawled, fetch-miss → no text
    ui = [u for u in res.visited_depth if "user:pw@" in u]
    assert ui and all(u not in res.text for u in ui)
    # determinism
    res2 = crawl_oracle(corpus, "example.com")
    assert res.visited_depth == res2.visited_depth
    assert res.sorted_links == res2.sorted_links


def test_oracle_politeness_defers_never_drops():
    _, corpus = _corpus()
    free = crawl_oracle(corpus, "example.com")
    tight = crawl_oracle(corpus, "example.com", max_per_host_per_level=2)
    assert set(tight.visited_depth) == set(free.visited_depth)
    assert len(tight.level_metrics) > len(free.level_metrics)
    # per-level per-host scheduled ≤ budget
    for m in tight.level_metrics:
        assert m["n_scheduled"] <= 2 * len({u.split("/")[2] for u in tight.visited_depth})


def test_oracle_robots_gate():
    tbl, corpus = _corpus()
    robots = robots_table_to_dict(build_robots_table(TINY))
    res = crawl_oracle(corpus, "example.com", robots=robots)
    assert not [u for u in res.visited_depth if f"{DIS_HOST}/p1" in u]
    # disallowed URLs still appear in all_links (discovered, not fetched)
    assert [u for u in res.all_links if f"{DIS_HOST}/p1" in u]


def test_robots_from_pages_rows():
    import pyarrow as pa

    from crawler_uni_ray.stages.robots import robots_from_pages

    tbl = pa.table(
        {
            "url": [
                "https://a.com/robots.txt",
                "https://a.com/page.html",
                "https://b.com/robots.txt",
            ],
            "html": [
                b"User-agent: *\nDisallow: /private\n",
                b"<html></html>",
                b"User-agent: *\nAllow: /\n",
            ],
        }
    )
    rules = robots_from_pages(tbl)
    assert set(rules) == {"a.com", "b.com"}
    assert "Disallow: /private" in rules["a.com"]
