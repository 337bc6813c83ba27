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


def robots_from_pages(pages) -> dict[str, str]:
    """Derive the robots table from corpus rows whose path is
    ``/robots.txt`` (SURVEY.md §1.2) — a column-pruned filter pass over
    the pages Dataset; the result is host → body, small enough to
    broadcast.  Accepts a Dataset or a pyarrow Table."""
    import numpy as np

    from ..urlnorm import hosts_batch

    def _pick(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        mask = np.fromiter(
            (u.endswith("/robots.txt") for u in urls), bool, count=len(urls)
        )
        t = t.filter(pa.array(mask))
        hosts = list(hosts_batch(t["url"].to_pylist()))
        bodies = [
            (h or b"").decode("utf-8", "replace") for h in t["html"].to_pylist()
        ]
        return pa.Table.from_arrays(
            [pa.array(hosts, pa.string()), pa.array(bodies, pa.string())],
            names=["host", "rules"],
        )

    if isinstance(pages, pa.Table):
        return robots_table_to_dict(_pick(pages.select(["url", "html"])))
    rows = pages.select_columns(["url", "html"]).map_batches(
        _pick, batch_format="pyarrow"
    )
    out: dict[str, str] = {}
    for b in rows.iter_batches(batch_format="pyarrow"):
        out.update(zip(b["host"].to_pylist(), b["rules"].to_pylist()))
    return out


def crawl_delays(rules: dict[str, str], agent: str = "*") -> dict[str, float]:
    """Per-host ``Crawl-delay:`` directives (seconds) from the robots
    bodies — only hosts that declare one appear.  Feeds the live-HTTP
    politeness bucket as a per-host RATE override (1/delay req/s):
    the wall-clock complement to the deterministic per-level budget."""
    out: dict[str, float] = {}
    for host, body in rules.items():
        # manual group-aware scan: stdlib robotparser drops fractional
        # delays ("Crawl-delay: 0.5" — its parser requires isdigit())
        cur_agents: list[str] = []
        in_group = False
        delay: float | None = None
        for raw in body.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key, val = key.strip().lower(), val.strip()
            if key == "user-agent":
                if in_group:  # a new agent line after rules starts a new group
                    cur_agents, in_group = [], False
                cur_agents.append(val.lower())
            else:
                in_group = True
                if key == "crawl-delay" and (
                    agent.lower() in cur_agents or "*" in cur_agents
                ):
                    try:
                        d = float(val)
                    except ValueError:
                        continue
                    if d > 0:
                        delay = d
        if delay is not None:
            out[host] = delay
    return out


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
