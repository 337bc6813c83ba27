"""Seen-filter stages: stateless map_batches kernels that talk to the
ShardedSeen actor fleet (state/seen.py) with ONE batched RPC per shard per
batch — the distributed form of the reference's lock-guarded check-and-add
(/root/reference/crawler.py:55-59).  The ShardedSeen client (a list of
actor handles) rides in the task closure; the actors themselves persist
for the whole crawl, so no per-level pool churn.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..state.seen import ShardedSeen


def seen_filter(ds: Dataset, seen: ShardedSeen) -> Dataset:
    """Keep rows whose url is NOT seen (read-only probe — marking happens
    later, on the *scheduled* subset only, so deferred URLs stay eligible
    next level)."""

    def _filter(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        mask = ~seen.contains(t["url"].to_pylist())
        return t.filter(pa.array(np.asarray(mask, dtype=bool)))

    return ds.map_batches(_filter, batch_format="pyarrow")


def seen_add(ds: Dataset, seen: ShardedSeen) -> Dataset:
    """Pass-through stage that marks every url seen (idempotent — safe
    under Ray task retries)."""

    def _add(t: pa.Table) -> pa.Table:
        if len(t):
            seen.add(t["url"].to_pylist())
        return t

    return ds.map_batches(_add, batch_format="pyarrow")
