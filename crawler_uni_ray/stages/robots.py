"""Robots gating — [NR] stage (the reference never reads robots.txt;
BASELINE.json north_rule mandates it).

The robots table (host → robots.txt body) is tiny relative to the frontier
(one row per host), so it is BROADCAST — ``ray.put`` once on the driver,
parsed once per worker process via the cached_get build hook — never
shuffled and never re-shipped per batch (SURVEY.md §2.5 J3).  Hosts absent
from the table are allow-all.  Disallowed candidates are dropped before
scheduling (the spec choice; oracle.py mirrors it).
"""

from __future__ import annotations

from urllib import robotparser

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..urlnorm import hosts_batch
from ..util import cached_get


def robots_table_to_dict(tbl: pa.Table) -> dict[str, str]:
    return dict(zip(tbl["host"].to_pylist(), tbl["rules"].to_pylist()))


def _build_parsers(rules: dict[str, str]) -> dict[str, robotparser.RobotFileParser]:
    parsers = {}
    for host, body in rules.items():
        rp = robotparser.RobotFileParser()
        rp.parse(body.splitlines())
        parsers[host] = rp
    return parsers


def robots_mask(urls, hosts, parsers, agent: str = "*") -> np.ndarray:
    """Pure allow-mask kernel (shared by the distributed stage and the
    crawl loop's small-level driver path)."""
    return np.fromiter(
        (
            parsers[h].can_fetch(agent, u) if h in parsers else True
            for u, h in zip(urls, hosts)
        ),
        dtype=bool,
        count=len(urls),
    )


def robots_filter(ds: Dataset, robots_ref, agent: str = "*") -> Dataset:
    """Vectorized filter: parse rules once per worker, mask per batch."""

    def _gate(t: pa.Table) -> pa.Table:
        parsers = cached_get(robots_ref, build=_build_parsers)
        urls = t["url"].to_pylist()
        hosts = (
            t["host"].to_pylist() if "host" in t.column_names else list(hosts_batch(urls))
        )
        return t.filter(pa.array(robots_mask(urls, hosts, parsers, agent)))

    return ds.map_batches(_gate, batch_format="pyarrow")
