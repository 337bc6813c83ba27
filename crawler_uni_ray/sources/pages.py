"""Canonical readers for the Common-Crawl-style pages corpus
(SURVEY.md §2.1 S5; schema fixed by BASELINE.json input_hint).

The corpus layout is ``part_hash=NN/*.parquet`` hash-partitioned by url
(corpus.write_corpus_parquet / bench.ensure_corpus).  Always read with
``columns=`` pruning — a crawl stage that needs urls must never drag the
html payload off storage.
"""

from __future__ import annotations

import os

import ray.data
from ray.data import Dataset

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages_partition_files(corpus_path: str) -> list[str]:
    """Explicit per-partition file list (sorted) — passing files instead of
    the directory avoids hive-partition column injection and keeps block
    order partition-aligned."""
    return [
        os.path.join(corpus_path, d, f)
        for d in sorted(os.listdir(corpus_path))
        if d.startswith("part_hash")
        for f in sorted(os.listdir(os.path.join(corpus_path, d)))
        if f.endswith(".parquet")
    ]


def read_pages(
    corpus_path: str,
    columns: list[str] | None = None,
    num_blocks: int | None = None,
) -> Dataset:
    """Column-pruned, partition-aligned read of the pages corpus."""
    files = read_pages_partition_files(corpus_path)
    kwargs = {}
    if columns:
        kwargs["columns"] = columns
    if num_blocks:
        kwargs["override_num_blocks"] = num_blocks
    return ray.data.read_parquet(files, **kwargs)


def corpus_fetch_fn(corpus_path: str, num_shards: int = 8):
    """Driver-side point lookup ``url -> html bytes | None`` over the
    hash-partitioned corpus — for METADATA-SIZED reads only (sitemap
    trees, robots bodies), never the crawl hot path (that's the
    partitioned fetch stage).  Prunes to the url's shard directory and
    pushes a url equality filter into the parquet scan, so each lookup
    reads one shard's matching row groups, not the corpus."""
    import pyarrow.dataset as pads

    from ..urlnorm import url_hash_batch

    def fetch(url: str) -> bytes | None:
        # int() BEFORE the modulo: a scalar np.uint64 % int promotes to
        # float64 (precision loss on 64-bit hashes) — the array form the
        # corpus writer uses does not, so the shards would disagree
        shard = int(url_hash_batch([url])[0]) % num_shards
        d = os.path.join(corpus_path, f"part_hash={shard:02d}")
        if not os.path.isdir(d):
            return None
        files = [
            os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
        ]
        if not files:
            return None
        t = pads.dataset(files).to_table(
            columns=["html"], filter=pads.field("url") == url
        )
        return t["html"][0].as_py() if t.num_rows else None

    return fetch
