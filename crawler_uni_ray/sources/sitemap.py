"""Sitemap seed source (sitemaps.org XML protocol, public spec).

Real crawls seed from ``sitemap.xml`` rather than a single root URL.  The
reference has no sitemap support (its only seed is ``https://{domain}``,
/root/reference/crawler.py:76); this adds the standard protocol — both
document kinds (``<urlset>`` leaf files and ``<sitemapindex>`` trees) —
feeding ``CrawlConfig.seeds``.

Scale shape: index files are metadata-sized (the spec caps a sitemap at
50k entries, so even a maximal tree is one index layer of ≤50k leaf
references) — the INDEX walk runs on the driver, level-wise, while the
LEAF urlset fetch+parse fans out as one ``map_batches`` stage over a
Dataset of leaf urls (``leaf_seeds_dataset``).  Parsing is stdlib
``xml.etree`` with namespace-agnostic local-name matching.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Callable

import pyarrow as pa
from ray.data import Dataset


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(xml_bytes: bytes) -> tuple[str, list[str]]:
    """One sitemap document → ``(kind, locs)``; ``kind`` is ``"urlset"``
    (locs are page URLs) or ``"sitemapindex"`` (locs are nested sitemap
    URLs).  Malformed XML → ``("invalid", [])`` — seed ingestion never
    fails the pipeline (the M6 error-normalizer contract)."""
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError:
        return ("invalid", [])
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        return ("invalid", [])
    locs = [
        el.text.strip()
        for entry in root
        if _local(entry.tag) in ("url", "sitemap")
        for el in entry
        if _local(el.tag) == "loc" and el.text and el.text.strip()
    ]
    return (kind, locs)


def sitemaps_from_robots(rules: dict[str, str]) -> list[str]:
    """Sitemap DISCOVERY via robots.txt ``Sitemap:`` directives (the
    standard discovery channel — robotstxt.org / sitemaps.org).  The
    directive is case-insensitive, may repeat, and lives outside any
    ``User-agent`` group, so a plain line scan is the whole parse.
    ``rules`` is the engine's broadcast robots table (host → body,
    stages/robots.py); output is sorted unique absolute sitemap URLs,
    ready for ``expand_sitemaps``."""
    found: set[str] = set()
    for body in rules.values():
        for line in body.splitlines():
            key, sep, val = line.partition(":")
            if sep and key.strip().lower() == "sitemap":
                val = val.strip()
                if val:
                    found.add(val)
    return sorted(found)


def expand_sitemaps(
    fetch: Callable[[str], bytes | None],
    roots: list[str],
    max_depth: int = 4,
    max_urls: int = 1_000_000,
) -> list[str]:
    """Driver-side walk of the sitemap tree: BFS over ``sitemapindex``
    layers (metadata-sized by spec), collecting every ``urlset`` entry.
    ``fetch(url) -> bytes | None`` abstracts the transport (corpus dict,
    partitioned corpus, live HTTP); a miss or invalid document contributes
    nothing.  Deterministic: output is sorted unique, capped at
    ``max_urls`` (cap applied AFTER sorting, so it is reproducible)."""
    seeds: set[str] = set()
    seen: set[str] = set()
    frontier = list(dict.fromkeys(roots))
    for _ in range(max_depth + 1):
        if not frontier:
            break
        nxt: list[str] = []
        for sm_url in frontier:
            if sm_url in seen:
                continue
            seen.add(sm_url)
            data = fetch(sm_url)
            if data is None:
                continue
            kind, locs = parse_sitemap(data)
            if kind == "urlset":
                seeds.update(locs)
            elif kind == "sitemapindex":
                nxt.extend(locs)
        frontier = nxt
    return sorted(seeds)[:max_urls]


def leaf_seeds_dataset(
    leaf_urls: Dataset, fetch: Callable[[str], bytes | None]
) -> Dataset:
    """Distributed leaf parse: a Dataset of ``urlset`` file urls →
    ``(seed_url, sitemap_url)`` rows via one ``map_batches`` fan-out (use
    when the index layer references more leaf files than the driver
    should fetch serially).  ``fetch`` must be serializable (e.g. a
    closure over a corpus path or a broadcast dict ref)."""

    def _parse(t: pa.Table) -> pa.Table:
        seeds: list[str] = []
        srcs: list[str] = []
        for sm_url in t["url"].to_pylist():
            data = fetch(sm_url)
            if data is None:
                continue
            kind, locs = parse_sitemap(data)
            if kind == "urlset":
                seeds.extend(locs)
                srcs.extend([sm_url] * len(locs))
        return pa.table(
            {
                "url": pa.array(seeds, pa.string()),
                "sitemap_url": pa.array(srcs, pa.string()),
            }
        )

    return leaf_urls.map_batches(_parse, batch_format="pyarrow")
