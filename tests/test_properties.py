"""Hypothesis property tests for the pure URL kernels (no Ray)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_uni_ray.urlnorm import clean_url, host_of, is_in_scope

_url_chars = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="-._~/?=&%:@"
    ),
    max_size=40,
)
_http_urls = st.builds(
    lambda host, path, q: f"https://{host}/{path}" + (f"?{q}" if q else ""),
    st.from_regex(r"[a-z][a-z0-9\-]{0,20}(\.[a-z]{2,5}){1,2}", fullmatch=True),
    _url_chars,
    _url_chars,
)


@settings(deadline=None, max_examples=200)
@given(_http_urls)
def test_clean_url_idempotent(url):
    once = clean_url(url)
    if once is not None:
        assert clean_url(once) == once  # cleaning is idempotent


@settings(deadline=None, max_examples=200)
@given(_http_urls)
def test_clean_url_no_fragments_and_scheme(url):
    out = clean_url(url + "#frag")
    if out is not None:
        assert "#" not in out
        assert out.startswith("http")


@settings(deadline=None, max_examples=200)
@given(_http_urls, st.from_regex(r"[a-z]{2,8}\.[a-z]{2,4}", fullmatch=True))
def test_scope_matches_suffix_definition(url, domain):
    # the predicate must equal the literal reference definition
    assert is_in_scope(url, domain) == host_of(url).endswith(domain)


@settings(deadline=None, max_examples=100)
@given(st.text(max_size=60))
def test_kernels_never_raise_on_garbage(s):
    clean_url(s, "https://base.example/x")
    host_of(s)
    is_in_scope(s, "example.com")
