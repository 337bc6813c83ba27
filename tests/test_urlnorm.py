"""Golden-case tests for the canonicalizer / scope predicate — semantics
verified against /root/reference/crawler.py:24-46 (SURVEY.md §2.2)."""

from crawler_uni_ray.urlnorm import (
    canonical_extended,
    clean_url,
    host_of,
    in_scope_batch,
    is_in_scope,
    url_hash_batch,
)


def test_clean_url_reference_semantics():
    base = "https://ex.com/dir/page.html"
    # relative / root-relative / protocol-relative resolution (urljoin)
    assert clean_url("p2.html", base) == "https://ex.com/dir/p2.html"
    assert clean_url("/a/b", base) == "https://ex.com/a/b"
    assert clean_url("//cdn.ex.com/x", base) == "https://cdn.ex.com/x"
    # fragment dropped; query kept verbatim (order, encoding)
    assert clean_url("/a?x=1&y=2#frag", base) == "https://ex.com/a?x=1&y=2"
    assert clean_url("/a?b=2&a=1", base) == "https://ex.com/a?b=2&a=1"
    # ;params segment dropped (urlparse splits it from the last segment)
    assert clean_url("p2.html;sid=9", base) == "https://ex.com/dir/p2.html"
    # fragment-only → self-link
    assert clean_url("#sec", base) == base
    # valueless href treated as "" → self-link (bs4 semantics)
    assert clean_url("", base) == base
    # scheme gate: only http/https survive (crawler.py:38)
    assert clean_url("mailto:x@y.com", base) is None
    assert clean_url("javascript:void(0)", base) is None
    assert clean_url("ftp://ex.com/f", base) is None
    # case / port / userinfo preserved (NO extended normalization)
    assert clean_url("https://EX.com:8080/P", None) == "https://EX.com:8080/P"
    assert clean_url("https://u:p@ex.com/x", None) == "https://u:p@ex.com/x"


def test_scope_predicate_quirks():
    # plain match
    assert is_in_scope("https://example.com/x", "example.com")
    assert is_in_scope("https://sub.example.com/x", "example.com")
    # suffix over-match (bug kept: crawler.py:26)
    assert is_in_scope("https://evil-example.com/x", "example.com")
    # explicit port → netloc is host:port → NO match
    assert not is_in_scope("https://example.com:8080/x", "example.com")
    # userinfo → netloc ends with domain → match
    assert is_in_scope("https://user:pw@example.com/x", "example.com")
    assert not is_in_scope("https://other.org/x", "example.com")


def test_batch_kernels_match_scalar():
    urls = [
        "https://example.com/a",
        "https://evil-example.com/b",
        "https://example.com:8080/c",
        "https://other.org/d",
    ]
    mask = in_scope_batch(urls, "example.com")
    assert list(mask) == [is_in_scope(u, "example.com") for u in urls]
    assert host_of("https://u:p@ex.com:81/x") == "u:p@ex.com:81"
    # deterministic hashing across calls
    h1, h2 = url_hash_batch(urls), url_hash_batch(urls)
    assert (h1 == h2).all()
    assert len(set(h1.tolist())) == len(urls)


def test_canonical_extended():
    assert (
        canonical_extended("HTTPS://ExAmPle.COM:443/p?b=2&a=1#f")
        == "https://example.com/p?a=1&b=2"
    )
    assert canonical_extended("http://Ex.com:80") == "http://ex.com/"
    assert canonical_extended("mailto:x@y") is None
