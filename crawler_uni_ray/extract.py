"""HTML link + text extraction — pure kernels (stdlib HTMLParser).

The reference (/root/reference/crawler.py:32-44) parses with
``BeautifulSoup(content, 'html.parser')`` and collects ``href`` of every
``<a>`` tag that has the attribute (``find_all('a', href=True)``).  bs4's
``'html.parser'`` backend is itself built on stdlib
``html.parser.HTMLParser`` with ``convert_charrefs=True``; this module
re-specifies that contract directly against the stdlib (bs4 is not available
in this environment), with the verified equivalences from SURVEY.md §2.3:

* attribute values are entity-decoded (``&amp;`` → ``&``);
* tag/attribute names are case-insensitive (``<A HREF=…>`` matches);
* a valueless ``href`` is treated as ``""`` (bs4 behavior) →
  ``urljoin(base, "") == base`` → self-link;
* links inside HTML comments are ignored;
* text excludes ``<script>``/``<style>`` content and comments.

``extract_text`` is the byte-identity contract (BASELINE.json input_hint):
decode ``html`` bytes as the charset named by the first ``<meta charset=…>``
(else UTF-8, ``errors="replace"``), feed to ``HTMLParser``, concatenate all
``handle_data`` payloads outside script/style depth, verbatim — no
whitespace normalization.  It is imported by the corpus generator, the
vendored oracle (oracle.py) and the Ray extract stage, so the invariant
holds by construction and is asserted in tests.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from .urlnorm import clean_url

_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)

_SKIP_TEXT_TAGS = frozenset({"script", "style"})


class _LinkTextParser(HTMLParser):
    """Collects <a href> values and visible text in one pass."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []
        self.text_parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TEXT_TAGS:
            self._skip_depth += 1
        if tag == "a":
            for name, value in attrs:
                if name == "href":
                    # valueless href parses as None; bs4 yields "" (self-link)
                    self.hrefs.append(value if value is not None else "")
                    break

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <a href=... /> — self-closing; still a link, never opens skip depth
        if tag == "a":
            for name, value in attrs:
                if name == "href":
                    self.hrefs.append(value if value is not None else "")
                    break

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TEXT_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self.text_parts.append(data)


def decode_html(html: bytes) -> str:
    """Decode page bytes: first ``<meta charset=…>`` wins, else UTF-8;
    undecodable bytes are replaced (the crawl must never fail on data)."""
    charset = "utf-8"
    m = _CHARSET_RE.search(html[:4096])
    if m:
        charset = m.group(1).decode("ascii", "replace")
    try:
        return html.decode(charset, errors="replace")
    except LookupError:
        return html.decode("utf-8", errors="replace")


def parse_html(html: bytes) -> tuple[list[str], str]:
    """One-pass parse → (raw hrefs in document order, extracted text)."""
    parser = _LinkTextParser()
    try:
        parser.feed(decode_html(html))
        parser.close()
    except Exception:
        # malformed input contributes what was parsed so far, never an error
        pass
    return parser.hrefs, "".join(parser.text_parts)


def extract_text(html: bytes) -> str:
    """The byte-identical text contract (SURVEY.md §2.3)."""
    return parse_html(html)[1]


def extract_links(html: bytes, base_url: str) -> set[str]:
    """Reference link extraction (crawler.py:34-44): resolve each href
    against the *requested* URL, clean, scheme-filter, dedup into a set."""
    hrefs, _ = parse_html(html)
    links: set[str] = set()
    for href in hrefs:
        cleaned = clean_url(href, base_url)
        if cleaned is not None:
            links.add(cleaned)
    return links


def extract_links_and_text(html: bytes, base_url: str) -> tuple[set[str], str]:
    """Single-pass combined extraction for the Ray extract stage."""
    hrefs, text = parse_html(html)
    links: set[str] = set()
    for href in hrefs:
        cleaned = clean_url(href, base_url)
        if cleaned is not None:
            links.add(cleaned)
    return links, text
