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
