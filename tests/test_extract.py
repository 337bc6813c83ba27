"""Extractor contract tests (SURVEY.md §2.3): stdlib-HTMLParser semantics
equivalent to the reference's BeautifulSoup(html, 'html.parser') usage
(/root/reference/crawler.py:32-44)."""

from crawler_uni_ray.extract import decode_html, extract_links, extract_text

BASE = "https://ex.com/base.html"


def test_entity_decoding_in_href():
    html = b'<a href="/a?x=1&amp;y=2">x</a>'
    assert extract_links(html, BASE) == {"https://ex.com/a?x=1&y=2"}


def test_case_insensitive_tags():
    html = b'<A HREF="/up.html">U</A>'
    assert extract_links(html, BASE) == {"https://ex.com/up.html"}


def test_valueless_href_is_self_link():
    assert extract_links(b"<a href>self</a>", BASE) == {BASE}


def test_comment_links_ignored():
    assert extract_links(b'<!-- <a href="/c.html">h</a> -->', BASE) == set()


def test_script_style_links_are_text_not_anchors():
    html = b'<script>var a="<a href=/no.html>x</a>";</script><style>a{}</style>'
    assert extract_links(html, BASE) == set()
    assert extract_text(html) == ""  # script/style content excluded from text


def test_scheme_filter_and_intra_page_dedup():
    html = b'<a href="mailto:x@y">m</a><a href="/p">1</a><a href="/p">2</a>'
    assert extract_links(html, BASE) == {"https://ex.com/p"}


def test_text_verbatim_no_whitespace_normalization():
    html = b"<p>Hello  world</p>\n<p>bye</p>"
    assert extract_text(html) == "Hello  world\nbye"


def test_charset_sniffing():
    html = '<meta charset="latin-1"><p>caf\xe9</p>'.encode("latin-1")
    assert "café" in extract_text(html)
    assert decode_html(b"<p>plain</p>") == "<p>plain</p>"
    # unknown charset falls back to utf-8
    assert extract_text(b'<meta charset="bogus123"><p>ok</p>') == "ok"


def test_malformed_html_never_raises():
    assert isinstance(extract_text(b"\xff\xfe<a href='/x"), str)
    extract_links(b"<<<>>><a href=", BASE)
