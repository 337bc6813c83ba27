"""Fetch = corpus replay: look the scheduled frontier up in the pages
table (SURVEY.md §2.1 S2).  A join-miss is a fetch failure — the URL stays
visited with zero outlinks, matching the reference's silent
exception-swallow (/root/reference/crawler.py:45-46).  Three physical modes:

* ``broadcast`` — the whole corpus dict shipped once via ``ray.put``,
  looked up per batch.  Tests / small corpora only (≪ worker heap).
* ``join`` — ``Dataset.join`` (hash-partitioned shuffle join, ray 2.49) of
  frontier × pages, left-outer.  Correct at any scale but re-streams the
  FULL pages table every level — use when a level touches a large fraction
  of the corpus.
* ``partitioned`` — the scale default.  The corpus lives as
  ``part_hash=NN/`` parquet dirs hash-partitioned by url
  (corpus.write_corpus_parquet); the frontier is bucketed by the SAME hash
  and each bucket reads only its partition's files with an
  ``url ∈ scheduled`` pyarrow filter (row-group pruning).  Per-level I/O is
  proportional to the touched partitions, not the corpus — the analog of an
  indexed KV fetch at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
from ray.data import Dataset

from ..urlnorm import url_hash_batch
from ..util import cached_get

_FETCH_COLS = ["html", "warc_ts"]


def fetch_broadcast(ds: Dataset, corpus_ref) -> Dataset:
    """Corpus dict shipped once via ray.put, deserialized once per worker
    process (util.cached_get), looked up per batch."""

    def _fetch(t: pa.Table) -> pa.Table:
        corpus = cached_get(corpus_ref)
        urls = t["url"].to_pylist()
        htmls = [corpus.get(u) for u in urls]
        fetched = np.fromiter((h is not None for h in htmls), bool, count=len(htmls))
        return t.append_column("html", pa.array(htmls, pa.binary())).append_column(
            "fetched", pa.array(fetched)
        )

    return ds.map_batches(_fetch, batch_format="pyarrow")


def fetch_join(ds: Dataset, pages: Dataset, num_partitions: int = 32) -> Dataset:
    """Left-outer hash join against the pages Dataset (misses kept)."""
    pages2 = pages.select_columns(["url", "html"])
    joined = ds.join(
        pages2,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("url",),
    )

    def _flag(t: pa.Table) -> pa.Table:
        fetched = pa.compute.is_valid(t["html"])
        return t.append_column("fetched", fetched)

    return joined.map_batches(_flag, batch_format="pyarrow")


def fetch_partitioned(
    ds: Dataset, corpus_path: str, num_shards: int, n_buckets: int | None = None
) -> Dataset:
    """Bucket the frontier by the corpus's url-hash partitioning and read
    only matching partition files, filtered to the scheduled URL set."""
    n_buckets = n_buckets or num_shards

    def _bucket(t: pa.Table) -> pa.Table:
        b = (url_hash_batch(t["url"].to_pylist()) % num_shards).astype(np.int64)
        return t.append_column("__part", pa.array(b))

    def _fetch_part(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["__part"].iloc[0])
        urls = g["url"].tolist()
        dset = pads.dataset(f"{corpus_path}/part_hash={part:02d}")
        hit = dset.to_table(
            columns=["url", "html"], filter=pads.field("url").isin(urls)
        ).to_pandas()
        out = g.drop(columns=["__part"]).merge(hit, on="url", how="left")
        out["fetched"] = out["html"].notna()
        return out

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_fetch_part, batch_format="pandas")
    )
