"""The synchronous-BFS crawl driver loop (SURVEY.md §3.2) — the Ray-Data
re-expression of the reference's thread/queue worker loop
(/root/reference/crawler.py:48-91).

Each BFS level runs:

    frontier_k → seen-filter (ShardedSeen actors) → robots gate [NR]
              → per-host politeness schedule with skew salting [NR]
              → mark-seen → fetch (corpus replay) → extract
              → checkpoint level artifacts

The level barrier (checkpoint write + re-read) is what makes BFS ordering
and resume EXACT: a level is a pure function of (frontier_k, seen_{k-1},
corpus), committed atomically by writing ``manifest.json`` last after the
level artifacts are published.  ALL durability primitives go through the
storage seam (state/storage.py): ``storage="posix"`` commits by renaming
a staged dir (single node / NFS-like shared FS), ``storage="manifest"``
commits by atomically publishing a per-artifact manifest (the
object-store protocol — no directory rename anywhere on the path).  Resume finds the max committed level, replays the
``results`` url columns into fresh seen shards, and restarts from the
stored ``frontier_next``.  The reference's broken SIGINT partial save
(crawler.py:104-109 calls an undefined ``stop()``) is subsumed: every
completed level is durable.

Two physical paths per level, SAME semantics (shared pure kernels:
schedule_flags_pandas, robots_mask, the seen RPC interface):

* **distributed** (``n_frontier > small_level_rows``): the control-plane
  stages (seen filter, robots, bucketed scheduling, frontier dedup) run as
  Dataset shuffles/map_batches — the 100 TB shape.
* **small-level fast path**: a BFS frontier level that fits comfortably on
  the driver (default ≤ 50k rows — seeds, crawl tails, test corpora) runs
  its control plane as vectorized driver-side Arrow/pandas + batched actor
  RPCs, avoiding several fixed-cost Ray executions per level.  Fetch +
  extract — the payload-heavy data plane — stays a distributed Dataset
  pipeline in BOTH paths (html never transits the driver).

Checkpoint layout::

    ckpt/level_K/results/part-*.parquet        url,host,depth,fetch_status,n_outlinks,text,outlinks
    ckpt/level_K/frontier_next/part-*.parquet  url,host,depth,priority
    ckpt/level_K/manifest.json                 written LAST = commit record

(outlinks are stored inside results as a list<string> column and exploded
on demand by ``outlinks_dataset`` — one write per level, not two.)
"""

from __future__ import annotations

import json
import os
from contextlib import contextmanager
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data import Dataset

from ..ops import add_hash_bucket, dedup_exact
from ..stages.extract_stage import extract_stage, flatten_outlinks
from ..stages.fetch import fetch_broadcast, fetch_http, fetch_join, fetch_partitioned
from ..stages.frontier import FRONTIER_SCHEMA, frontier_table
from ..stages.priority import (
    combine_frontier_pandas,
    deferred_partials_pandas,
    new_partials_pandas,
)
from ..stages.robots import _build_parsers, robots_filter, robots_mask
from ..stages.schedule import (
    _rank_within,
    host_counts,
    schedule_flags_pandas,
    schedule_level_fused,
    schedule_level_fused_salted,
    schedule_level_fused_salted_stage1,
)
from ..stages.seen_stage import seen_add, seen_filter
from ..state.seen import ShardedSeen
from ..state.storage import make_storage
from ..urlnorm import hosts_batch_cleaned


@dataclass
class CrawlConfig:
    domain: str
    ckpt_dir: str
    corpus_path: str | None = None  # hash-partitioned parquet dir (scale path)
    corpus_dict: dict[str, bytes] | None = None  # in-memory corpus (tests)
    seeds: list[str] | None = None  # default: [f"https://{domain}"] (crawler.py:76)
    budget: int | None = None  # [NR] per-host fetches per level; None = unlimited
    priority_policy: str = "none"  # [NR] "none" | "indegree" (stages/priority.py)
    robots: dict[str, str] | None = None  # [NR] host → robots.txt body
    seen_backend: str = "exact"  # "exact" | "bloom"
    num_seen_shards: int = 4
    bloom_bits: int = 1 << 24
    fetch_mode: str = "auto"  # auto | broadcast | join | partitioned | http
    http_timeout: float = 10.0  # http mode: per-request timeout (crawler.py:30)
    http_concurrency: int | tuple = (1, 4)  # http mode: fetch actor pool size
    http_rate_per_host: float | None = None  # http mode: wall-clock req/s per host
    http_obey_crawl_delay: bool = True  # http mode: robots.txt Crawl-delay
    # directives (cfg.robots) become per-host rate overrides (1/delay
    # req/s) on the fetcher's token bucket, aggregate across the pool
    # partitioned fetch: levels above this re-bucket the frontier by the
    # corpus url-hash (ONE pruned read per partition — the scale plan);
    # smaller levels skip that all-to-all and look up per batch (a few
    # extra pruned reads beat a shuffle's fixed cost)
    # align (re-bucket by the corpus url-hash before fetching) for all but
    # tiny levels: the unaligned path batches 8192 urls per task, so a
    # 10-50k-row level ran fetch+extract as ~5 fat fused tasks — 5-way
    # parallelism on a 32-CPU box (measured 13.3 s vs 8.6 s aligned on a
    # 43k-row level).  The aligned plan reads each corpus partition exactly
    # once AND gets one task per partition.
    fetch_align_threshold: int = 1_000
    num_corpus_shards: int = 8  # partitioning of corpus_path
    n_buckets: int = 32  # scheduling/dedup hash buckets
    n_salts: int = 8
    skew_threshold: int | None = None
    max_levels: int = 1000
    max_pages: int | None = None  # [NR] stop once ≥ this many URLs scheduled
    # (level-granular: the running level completes; every level stays durable)
    extract_batch_size: int | None = None  # None = batch-per-block (see
    # stages/extract_stage.py — block size is already 32 MB-bounded)
    small_level_rows: int = 50_000  # driver fast-path threshold (0 = always distributed)
    driver_fetch_rows: int = 2000  # broadcast-mode only: fetch+extract tiny
    # levels on the driver (same pure kernels; 0 = never)
    level_read_blocks: int = 64  # max frontier read-back blocks; the actual
    # target is adaptive — ~level_rows_per_block rows per block, clamped to
    # [1, level_read_blocks].  Tail levels (hundreds of rows) otherwise run
    # every map wave as ~90 three-row tasks and every sort with ~90
    # partitions: pure barrier latency, no parallelism gain (the data-plane
    # compute at that size is milliseconds)
    level_rows_per_block: int = 1000
    # dynamic-block-split target: extract is the dominant compute and the
    # fetch groups emit one ~128 MB html block per corpus partition → one
    # 60+ s extract task each (straggler-bound at high CPU counts); 32 MB
    # splits each into ~4 tasks (A/B: ~25% faster level at 32 CPUs,
    # neutral at 8)
    target_block_size_mb: int = 32
    storage: str = "posix"  # durability backend (state/storage.py):
    # "posix" = rename commits on one shared filesystem; "manifest" =
    # write-then-manifest, the object-store protocol (no dir renames);
    # "fakeobj" = audited PUT/LIST/DELETE-only emulator (protocol proof)
    fold_retrim: bool = True  # salted levels on the aligned partitioned
    # fetch path: fold the exact per-host re-trim + seen-marking into the
    # fetch-align groupby (one fewer all-to-all barrier per salted level;
    # semantics ≡ the two-stage plan — test_fold_retrim_conformance).
    # False keeps the two-stage schedule_level_fused_salted plan everywhere
    frontier_partials: bool = False  # budgeted big levels END at the
    # next-frontier PARTIALS (side-written combine-input rows, one part per
    # extract task + one per deferred source) instead of running the
    # frontier-combine all-to-all + frontier write; the NEXT level's
    # schedule groups combine per url before ranking (a url determines its
    # host, so a host-keyed group holds every partial of its urls — the
    # merge is complete there; stages/schedule.py _combine_partials_group).
    # One fewer all-to-all AND one fewer write-materialize per level; the
    # level hand-off becomes MapReduce-style durable partial files (the
    # deferred dir is read alongside as next-level input).  The manifest
    # records the format per level, so mixed checkpoints (small-path
    # levels still write combined frontiers) and resumes work
    fused_levels: int = 1  # >1 = "level pipelining": fuse up to this many
    # consecutive distributed levels into ONE streaming execution.  Level
    # k+1's schedule shuffle overlaps level k's extract, and the per-level
    # execution fixed cost (the headline floor) is paid once per WINDOW.
    # Exactness is preserved by the all-to-all barrier chain: level k+1's
    # schedule groupby cannot start until every level-k task — including
    # all seen-marking and every deferred side-write — has completed, so
    # the seen check MOVES INTO the schedule groups (in-window levels
    # only) and stays exact.  Every level still side-writes its durable
    # artifacts (results, deferred, frontier partials, host counts) with
    # idempotent names; manifests commit when the window completes, so
    # RESUME granularity becomes the window.  Requires frontier_partials +
    # a budget + partitioned fetch; hot-host sets are window-static (stale
    # by ≤ fused_levels-1 levels — salting is perf-only, semantics are
    # unchanged).  max_pages is checked between windows.  Known latency
    # cost: in-window levels always run the fully-distributed aligned plan
    # — a frontier that collapses mid-window below small_level_rows /
    # fetch_align_threshold cannot drop to the driver fast path or the
    # unaligned fetch until the next window boundary (the window is ONE
    # lazy execution; per-level sizes are unknowable inside it).  Window
    # ENTRY is still size-aware (fused_window_rows), and the measured
    # whole-crawl A/B (W=3 vs per-level, tails included) favors fusing.
    fused_window_rows: int | None = None  # adaptive window sizing: when
    # set, each window's width is chosen at entry so the ESTIMATED total
    # frontier rows executing in one window stay under this target —
    # ``fused_levels`` becomes the CAP, not the fixed width.  Level sizes
    # inside a lazy window are unknowable up front, so the estimate
    # extrapolates from the entry count with the growth ratio observed on
    # the last completed level (clamped ×/÷8).  Rationale (r4 A/B): one
    # execution stacking consecutive 50-70k-row levels' working sets
    # regressed ~20% (W=4 vs W=3), while tiny tail/head levels tolerate —
    # and want — much wider windows (the ~0.8 s/level fixed cost is the
    # whole cost there).  None = static ``fused_levels`` windows.  Any
    # width is semantically exact (same barrier-chain argument), so this
    # knob is perf-only
    verbose: bool = False  # print one progress line as each level commits


@dataclass
class LevelMetrics:
    level: int
    n_frontier: int
    n_candidates: int
    n_scheduled: int
    n_deferred: int
    n_fetched: int
    n_fetch_miss: int
    n_outlinks: int
    n_frontier_next: int
    path: str = "distributed"
    extra: dict = field(default_factory=dict)


def _write_atomic(store, ds: Dataset, final_dir: str) -> int:
    """write_parquet into a staged area, commit through the storage seam
    (a crashed write leaves only invisible staging litter, never a
    half-committed artifact)."""
    staged = store.begin_dir(final_dir)
    # zstd: ~2-3× smaller than snappy on html/text columns — checkpoint
    # phases are I/O-bound, so the ratio win beats the cpu cost at scale
    ds.write_parquet(staged, arrow_parquet_args_fn=lambda: {"compression": "zstd"})
    store.commit_dir(final_dir, staged)
    return store.count_rows(final_dir)


def _write_atomic_table(store, tbl: pa.Table, final_dir: str) -> int:
    """Driver-side single-file variant for small artifacts.  The part goes
    through ``store.write_part`` (single-object PUT) so the whole staged
    commit stays on the seam's primitives."""
    staged = store.begin_dir(final_dir)
    store.write_part(staged, "part-0.parquet", tbl)
    store.commit_dir(final_dir, staged)
    return tbl.num_rows


# combine-input rows for the frontier merge (stages/priority.py):
# frontier columns + partial indegree count (deferred rows carry -1)
_COMBINE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.float64()),
        ("discovered_from", pa.string()),
        ("__cnt", pa.int64()),
    ]
)

_SEED_CNT = -2  # __cnt marker for combine-group seed rows (dropped in combine)


def _bucket_seed_table(n_buckets: int) -> pa.Table:
    """One marker row per frontier-dedup bucket (combine-input schema +
    ``__bucket``) so every combine group fires even when a bucket's only
    real input is on-disk deferred partials."""
    n = n_buckets
    return pa.table(
        {
            "url": pa.array([""] * n, pa.string()),
            "host": pa.array([""] * n, pa.string()),
            "depth": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
            "priority": pa.array(np.zeros(n), pa.float64()),
            "discovered_from": pa.array([""] * n, pa.string()),
            "__cnt": pa.array(np.full(n, _SEED_CNT, dtype=np.int64), pa.int64()),
            "__bucket": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        }
    )


def _deferred_partials_writer(deferred_dir: str, dedup_buckets: int, store, hc_dir=None):
    """Writer handed to the fused scheduler: converts a deferred-rows table
    to combine-input partials, partitions them by the frontier-dedup
    bucket, and publishes one part per (dedup bucket, schedule bucket) —
    deterministic names through ``store.write_part`` ⇒ idempotent under
    task retries.  The frontier combine reads them back per bucket; that
    read is safe because the combine sits behind a later all-to-all in the
    same execution (every schedule task, hence every side-write, completes
    before any combine group runs).

    ``hc_dir`` (frontier_partials mode only): there is no end-of-level
    combine to count next-frontier hosts, and deferred rows ARE next-level
    frontier input — side-write their per-host counts too (one part per
    schedule bucket; a host hoarding deferred mass must still trip the
    next level's hot detection)."""

    def write(deferred: pa.Table, sched_bucket: int) -> None:
        from ..urlnorm import url_hash_batch

        part = deferred_partials_pandas(deferred.to_pandas())
        db = (
            url_hash_batch(part["url"].to_numpy(dtype=object)) % dedup_buckets
        ).astype(np.int64)
        for d in np.unique(db):
            sub = part[db == d]
            t = pa.Table.from_pandas(
                sub, schema=_COMBINE_SCHEMA, preserve_index=False
            ).replace_schema_metadata(None)
            store.write_part(
                deferred_dir, f"d{int(d):05d}-s{sched_bucket:05d}.parquet", t
            )
        if hc_dir is not None and len(part):
            vc = part["host"].value_counts()
            store.write_part(
                hc_dir,
                f"def-s{sched_bucket:05d}.parquet",
                pa.table(
                    {
                        "host": pa.array(vc.index.astype(str)),
                        "n": pa.array(vc.to_numpy(dtype=np.int64)),
                    }
                ),
            )

    return write


def _host_counts_table(hosts: pd.Series) -> pa.Table:
    vc = hosts.value_counts()
    return pa.table(
        {
            "host": pa.array(vc.index.astype(str)),
            "n": pa.array(vc.to_numpy(dtype=np.int64)),
        }
    )


def _make_next_partials(store, hc_dir: str | None = None, side_dir: str | None = None):
    """Combiner over exploded in-scope outlinks → combine-input partial
    rows (one row per distinct url per batch with its partial referrer
    count — hub-heavy outlink batches collapse before any shuffle moves
    rows).  Side effects, both under content-derived names (urls ∪
    referrers uniquely identify a batch: src urls are unique per level and
    partition the outlink rows, so two distinct batches can never produce
    identical row sets) ⇒ idempotent under task retries:

    * ``hc_dir`` — per-batch host counts (next level's hot detection in
      partials mode; pre-combine upper bounds — only ever salt MORE hosts).
    * ``side_dir`` (fused-window in-window levels) — ALSO durably publish
      the partial rows themselves: they ARE the level's ``frontier_next``
      artifact (what a resume reads), while the same rows continue
      IN-STREAM into the next level's schedule shuffle."""

    def _next_partials(t: pa.Table) -> pa.Table:
        m = np.asarray(t["in_scope"].to_pylist(), dtype=bool)
        t = t.filter(pa.array(m))
        g = new_partials_pandas(
            t["url"].to_pylist(),
            t["host"].to_pylist(),
            t["depth"].to_pylist(),
            t["src_url"].to_pylist(),
        )
        out = pa.Table.from_pandas(
            g, schema=_COMBINE_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)
        if len(g) and (hc_dir is not None or side_dir is not None):
            import hashlib

            ident = "\x00".join(g["url"].tolist() + g["discovered_from"].tolist())
            h = hashlib.sha1(ident.encode()).hexdigest()[:20]
            if hc_dir is not None:
                store.write_part(hc_dir, f"p-{h}.parquet", _host_counts_table(g["host"]))
            if side_dir is not None:
                store.write_part(side_dir, f"f-{h}.parquet", out)
        return out

    return _next_partials


def _window_deferred_writer(
    deferred_dir: str, hot_ref: set, n_salts: int, n_buckets: int, store, hc_dir=None
):
    """Deferred writer for NON-terminal fused-window levels: parts are
    named by the NEXT level's schedule bucket (schedule.py
    ``window_schedule_buckets`` — the same derivation that level's
    map-side bucketing uses) so each of its schedule groups reads exactly
    its own files.  ``sched_bucket`` only namespaces the file name for
    idempotency (the fold_retrim path writes under ``n_buckets + part``).
    Host counts side-written too (deferred rows are next-frontier mass —
    a host hoarding deferrals must still trip hot detection on resume)."""
    from ..stages.schedule import window_schedule_buckets

    def write(deferred: pa.Table, sched_bucket: int) -> None:
        part = deferred_partials_pandas(deferred.to_pandas())
        nb = window_schedule_buckets(
            part["url"].to_numpy(dtype=object),
            part["host"].to_numpy(dtype=object),
            hot_ref,
            n_salts,
            n_buckets,
        )
        for b in np.unique(nb):
            sub = part[nb == b]
            t = pa.Table.from_pandas(
                sub, schema=_COMBINE_SCHEMA, preserve_index=False
            ).replace_schema_metadata(None)
            store.write_part(
                deferred_dir, f"nb{int(b):05d}-s{sched_bucket:05d}.parquet", t
            )
        if hc_dir is not None and len(part):
            store.write_part(
                hc_dir,
                f"def-s{sched_bucket:05d}.parquet",
                _host_counts_table(part["host"]),
            )

    return write


def _window_combine_hook(
    store, prev_deferred_dir: str, policy: str, hot_ref: set | None, n_salts: int, seen
):
    """In-group input assembly for an IN-WINDOW level (``fused_levels`` >
    1): drop the per-bucket seed markers → inject the previous level's
    deferred partials for this bucket (they merge per url with
    rediscoveries, exactly like the file-fed path) → per-url combine
    (salt/hot re-derived when salted) → drop seen urls.  Both reads are
    exact because the schedule groupby is an all-to-all BEHIND every
    level-k side-write and every level-k seen-mark (the deferred-partials
    invariant); urls are bucket-disjoint, so concurrent marking by THIS
    level's own downstream stages can never affect another group's
    verdict.  ``hot_ref`` must be None for the unsalted kernel (no
    __salt/__hot columns) and the window's hot set for the salted ones."""
    from ..stages.schedule import _combine_partials_group

    def hook(g: pd.DataFrame) -> pd.DataFrame:
        bid = int(g["__bucket"].iloc[0])
        g = g[g["__cnt"] != _SEED_CNT]
        files = store.list_files(prev_deferred_dir, f"nb{bid:05d}-*.parquet")
        if files:
            extra = pd.concat(
                [pq.read_table(f).to_pandas() for f in files], ignore_index=True
            )
            extra["__bucket"] = bid
            g = pd.concat([g, extra], ignore_index=True)
        if len(g) == 0:
            return g
        g = _combine_partials_group(g, policy, hot_ref, n_salts)
        if len(g):
            mask = ~seen.contains(g["url"].tolist())
            g = g.loc[np.asarray(mask, dtype=bool)]
        return g

    return hook


def _hotkeys_writer(hotkeys_dir: str, store):
    """Writer handed to the stage-1 salted scheduler (fold_retrim path):
    publishes each schedule group's hot-host survivor SORT KEYS as one
    part per schedule bucket — deterministic names through
    ``store.write_part`` ⇒ idempotent under task retries.  The fetch-align
    groups read the whole dir back (it is tiny: ≤ n_salts×budget key rows
    per hot host) to reconstruct each hot host's global top-budget set;
    that read is safe because the fetch-align groupby is a later
    all-to-all in the same execution (the deferred-partials invariant)."""

    def write(keys: pa.Table, sched_bucket: int) -> None:
        store.write_part(hotkeys_dir, f"b{sched_bucket:05d}.parquet", keys)

    return write


def _hot_keep_sets(files: list[str], budget: int) -> dict[str, frozenset]:
    """host → the urls in that host's GLOBAL top-``budget`` (ordered by
    (-priority, url[, seq]) — the exact ranking the two-stage re-trim
    applies), computed from the stage-1 survivor key files.  Built once
    per worker process via util.cached_get."""
    if not files:
        return {}
    df = pa.concat_tables(pq.read_table(f) for f in files).to_pandas()
    kept = df.loc[_rank_within(df, ["host"]) < budget]
    return {h: frozenset(sub["url"]) for h, sub in kept.groupby("host", sort=False)}


def _pre_fetch_trim(
    store, hotkeys_dir: str, deferred_writer, seen, hot_hosts, budget, n_buckets
):
    """fold_retrim: the exact per-host re-trim + seen-marking, run inside
    each fetch-align group (fetch.py ``pre_group`` hook).  A hot row
    survives iff its url is in the host's global top-``budget`` set; rows
    trimmed here are deferred — side-written under the disjoint
    ``n_buckets + part`` namespace so retries stay idempotent and stage-1
    files are never clobbered.  Seen-marking runs AFTER the trim so
    deferred urls stay eligible next level (exactly the two-stage plan's
    order)."""
    from ..util import cached_get

    def pre(t: pa.Table, part: int) -> pa.Table:
        if t.num_rows == 0:
            return t
        hosts = np.asarray(t["host"].to_pylist(), dtype=object)
        hot_m = np.fromiter((h in hot_hosts for h in hosts), bool, count=len(hosts))
        if hot_m.any():
            keep_sets = cached_get(
                hotkeys_dir,
                build=lambda d: _hot_keep_sets(store.list_files(d), budget),
                key=hotkeys_dir,
            )
            urls = np.asarray(t["url"].to_pylist(), dtype=object)
            keep = np.ones(len(t), dtype=bool)
            for h in set(hosts[hot_m]):
                idx = np.flatnonzero(hot_m & (hosts == h))
                s = keep_sets.get(h, frozenset())
                keep[idx] = [u in s for u in urls[idx]]
            if not keep.all():
                deferred_writer(t.filter(pa.array(~keep)), n_buckets + part)
                t = t.filter(pa.array(keep))
        if t.num_rows:
            seen.add(t["url"].to_pylist())
        return t

    return pre


def _side_write_results(results: Dataset, staged_dir: str, store) -> Dataset:
    """Durably write each results block (content-derived names through
    ``store.write_part`` ⇒ idempotent under retries; urls are unique per
    level so distinct blocks never collide) and stream on only
    url/depth/outlinks — the html/text payload never transits the frontier
    phase, and the level needs no results read-back execution."""

    def _w(t: pa.Table) -> pa.Table:
        if t.num_rows:
            import hashlib

            urls = t["url"].to_pylist()
            h = hashlib.sha1("\x00".join(urls).encode()).hexdigest()[:20]
            store.write_part(staged_dir, f"block-{h}.parquet", t)
        return t.select(["url", "depth", "outlinks"])

    return results.map_batches(_w, batch_format="pyarrow", batch_size=None)


class CrawlEngine:
    RESULTS_SCHEMA = pa.schema(
        [
            ("url", pa.string()),
            ("host", pa.string()),
            ("depth", pa.int32()),
            ("fetch_status", pa.int32()),
            ("n_outlinks", pa.int32()),
            ("text", pa.string()),
            ("outlinks", pa.list_(pa.string())),
        ]
    )
    OUTLINKS_SCHEMA = pa.schema(
        [
            ("src_url", pa.string()),
            ("url", pa.string()),
            ("host", pa.string()),
            ("in_scope", pa.bool_()),
            ("depth", pa.int32()),
        ]
    )

    def __init__(self, config: CrawlConfig):
        self.cfg = config
        self.store = make_storage(config.storage)
        # per-engine-run tag, embedded in the hotkeys side-dir name: the
        # fetch groups worker-cache the keep sets keyed by dir path, so the
        # path must be unique per run (a rerun over the same ckpt_dir in
        # the same Ray session must never hit a stale worker cache)
        import uuid as _uuid

        self._run_tag = _uuid.uuid4().hex[:8]
        self.metrics: list[LevelMetrics] = []
        self.seen = ShardedSeen(
            num_shards=config.num_seen_shards,
            backend=config.seen_backend,
            n_bits=config.bloom_bits,
        )
        self._corpus_ref = None
        mode = config.fetch_mode
        if mode == "auto":
            mode = "broadcast" if config.corpus_dict is not None else "partitioned"
        self._fetch_mode = mode
        if mode == "broadcast":
            corpus = config.corpus_dict
            if corpus is None:
                corpus = self._load_corpus_dict(config.corpus_path)
            self._corpus_ref = ray.put(corpus)
        self._robots_ref = ray.put(config.robots) if config.robots else None
        self._robots_parsers = _build_parsers(config.robots) if config.robots else None
        self._pages_ds = None

    @staticmethod
    def _load_corpus_dict(path: str) -> dict[str, bytes]:
        import pyarrow.dataset as pads

        tbl = pads.dataset(path).to_table(columns=["url", "html"])
        return dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))

    # ----------------------------------------------------------- ckpt paths
    def _lvl(self, k: int, name: str = "") -> str:
        p = os.path.join(self.cfg.ckpt_dir, f"level_{k:04d}")
        return os.path.join(p, name) if name else p

    def committed_levels(self) -> list[int]:
        out = []
        if os.path.isdir(self.cfg.ckpt_dir):
            for d in sorted(os.listdir(self.cfg.ckpt_dir)):
                if d.startswith("level_") and os.path.exists(
                    os.path.join(self.cfg.ckpt_dir, d, "manifest.json")
                ):
                    out.append(int(d.split("_")[1]))
        return out

    # ----------------------------------------------------------- fetch dispatch
    def _fetch(self, scheduled: Dataset, n_rows: int = -1) -> Dataset:
        if self._fetch_mode == "broadcast":
            return fetch_broadcast(scheduled, self._corpus_ref)
        if self._fetch_mode == "http":
            host_rates = None
            if self.cfg.http_obey_crawl_delay and self.cfg.robots:
                from ..stages.robots import crawl_delays

                host_rates = {
                    h: 1.0 / d for h, d in crawl_delays(self.cfg.robots).items()
                } or None
            return fetch_http(
                scheduled,
                timeout=self.cfg.http_timeout,
                concurrency=self.cfg.http_concurrency,
                rate_per_host=self.cfg.http_rate_per_host,
                host_rates=host_rates,
            )
        if self._fetch_mode == "join":
            if self._pages_ds is None:
                self._pages_ds = ray.data.read_parquet(
                    self.cfg.corpus_path, columns=["url", "html"]
                )
            return fetch_join(scheduled, self._pages_ds, num_partitions=self.cfg.n_buckets)
        align = n_rows < 0 or n_rows > self.cfg.fetch_align_threshold
        return fetch_partitioned(
            scheduled, self.cfg.corpus_path, self.cfg.num_corpus_shards, align=align
        )

    def _fetch_extract_write(self, scheduled: Dataset, k: int, n_rows: int = -1) -> int:
        """The data plane: fetch + extract + results write — always a
        distributed Dataset pipeline (html payloads never hit the driver)."""
        marked = seen_add(scheduled, self.seen)
        fetched = self._fetch(marked, n_rows)
        results = extract_stage(fetched, depth=k, batch_size=self.cfg.extract_batch_size)
        return _write_atomic(self.store, results, self._lvl(k, "results"))

    def _results_miss_count(self, k: int) -> int:
        n_miss = 0
        for f in self.store.list_parts(self._lvl(k, "results")):
            t = pq.read_table(f, columns=["fetch_status"])
            n_miss += t.num_rows - int(pa.compute.sum(t["fetch_status"]).as_py() or 0)
        return n_miss

    # ----------------------------------------------------------- level step
    def _run_level_small(self, k: int, frontier_tbl: pa.Table) -> int:
        """Driver fast path: control plane as vectorized Arrow/pandas +
        batched seen-actor RPCs; data plane distributed (see module doc)."""
        cfg = self.cfg
        n_frontier = frontier_tbl.num_rows
        urls = frontier_tbl["url"].to_pylist()
        mask = ~self.seen.contains(urls)
        if self._robots_parsers is not None:
            mask &= robots_mask(
                urls, frontier_tbl["host"].to_pylist(), self._robots_parsers
            )
        cand = frontier_tbl.filter(pa.array(mask))
        df = cand.select(["url", "host", "priority", "seq"]).to_pandas()
        flags = schedule_flags_pandas(df, cfg.budget)
        scheduled_tbl = cand.filter(pa.array(flags))
        deferred_tbl = cand.filter(pa.array(~flags))

        if scheduled_tbl.num_rows == 0:
            n_results = _write_atomic_table(
                self.store, self.RESULTS_SCHEMA.empty_table(), self._lvl(k, "results")
            )
        elif (
            self._fetch_mode == "broadcast"
            and self.cfg.corpus_dict is not None
            and scheduled_tbl.num_rows <= self.cfg.driver_fetch_rows
        ):
            # tiny level + in-memory corpus: run the identical pure kernels
            # (extract_batch) driver-side — no Ray execution round-trip
            from ..stages.extract_stage import extract_batch

            self.seen.add(scheduled_tbl["url"].to_pylist())
            corpus = self.cfg.corpus_dict
            htmls = [corpus.get(u) for u in scheduled_tbl["url"].to_pylist()]
            fetched = pa.array([h is not None for h in htmls])
            inp = scheduled_tbl.append_column(
                "html", pa.array(htmls, pa.binary())
            ).append_column("fetched", fetched)
            n_results = _write_atomic_table(
                self.store, extract_batch(inp, depth=k), self._lvl(k, "results")
            )
        else:
            n_results = self._fetch_extract_write(
                ray.data.from_arrow(scheduled_tbl), k, scheduled_tbl.num_rows
            )

        # next frontier = in-scope outlinks ∪ deferred, combined per url by
        # the priority policy (stages/priority.py — deterministic merge)
        res = self.store.read_table(
            self._lvl(k, "results"), self.RESULTS_SCHEMA, columns=["url", "outlinks"]
        )
        col = res["outlinks"].combine_chunks()
        flat = pa.compute.list_flatten(col)
        srcs = pa.compute.take(
            res["url"].combine_chunks(), pa.compute.list_parent_indices(col)
        )
        out_urls = flat.to_pylist()
        n_outlinks = len(out_urls)
        out_hosts = hosts_batch_cleaned(out_urls)  # outlinks are cleaned urls
        out_scope = out_hosts.str.endswith(cfg.domain).fillna(False).to_numpy(dtype=bool)
        parts = [
            new_partials_pandas(
                np.asarray(out_urls, dtype=object)[out_scope],
                out_hosts.to_numpy(dtype=object)[out_scope],
                np.full(int(out_scope.sum()), k + 1, dtype=np.int32),
                np.asarray(srcs.to_pylist(), dtype=object)[out_scope],
            )
        ]
        if deferred_tbl.num_rows:
            parts.append(deferred_partials_pandas(deferred_tbl.to_pandas()))
        next_df = combine_frontier_pandas(
            pd.concat(parts, ignore_index=True), cfg.priority_policy
        )
        next_tbl = pa.Table.from_pandas(
            next_df, schema=FRONTIER_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)
        n_next = _write_atomic_table(self.store, next_tbl, self._lvl(k, "frontier_next"))

        self._finish_level(
            k,
            LevelMetrics(
                level=k,
                n_frontier=n_frontier,
                n_candidates=cand.num_rows,
                n_scheduled=n_results,
                n_deferred=deferred_tbl.num_rows,
                n_fetched=n_results - self._results_miss_count(k),
                n_fetch_miss=self._results_miss_count(k),
                n_outlinks=n_outlinks,
                n_frontier_next=n_next,
                path="small",
            ),
        )
        return n_next

    def _load_hot_hosts(self, k: int) -> set[str] | None:
        """Hot hosts for level ``k`` from the PREVIOUS level's side-written
        frontier host counts (a tiny driver-side read — one row per
        (host, bucket)).  None → the caller runs its own count pass over
        the frontier when it is big enough to matter (level 0, small-path
        predecessor, resume without the artifact)."""
        if self.cfg.skew_threshold is None or k == 0:
            return None
        files = self.store.list_files(self._lvl(k - 1, "host_counts"))
        if not files:
            return None
        t = pa.concat_tables(pq.read_table(f) for f in files)
        df = t.to_pandas().groupby("host", as_index=False)["n"].sum()
        return set(df.loc[df["n"] > self.cfg.skew_threshold, "host"])

    def _run_level_big(
        self, k: int, frontier: Dataset, n_frontier: int, in_fmt: str = "combined"
    ) -> int:
        """Distributed path: every control-plane stage is a Dataset op,
        FUSED into one streaming execution per level: the schedule shuffle
        streams into seen-add → fetch → extract, results are side-written
        per block (idempotent names), and the projected outlinks continue
        in the SAME execution through the frontier-combine shuffle — no
        results read-back and no per-phase execution barrier.  Deferred
        rows are side-written as combine-input partials partitioned by the
        frontier-dedup bucket and read back inside the combine groups
        (safe: the combine sits behind a later all-to-all, so every
        schedule-side write is durable first)."""
        import time as _time

        _t0 = _time.time()
        cfg = self.cfg
        # datasets SNAPSHOT the DataContext at creation — a frontier built
        # before this engine (bench/driver code) carries the defaults, so
        # override on the instance (derived datasets inherit it)
        frontier.context.op_resource_reservation_enabled = False
        frontier.context.target_max_block_size = cfg.target_block_size_mb * 1024 * 1024
        candidates = seen_filter(frontier, self.seen)
        if self._robots_ref is not None:
            candidates = robots_filter(candidates, self._robots_ref)

        # ONE partitioning key reused across the level: the frontier-dedup
        # modulus matches the corpus's url-hash partitioning so
        # frontier_next files come out partition-aligned and the next
        # level's fetch touches ~1 corpus partition per batch
        dedup_buckets = (
            cfg.num_corpus_shards if self._fetch_mode == "partitioned" else cfg.n_buckets
        )

        # frontier_partials: the level ENDS at durable next-frontier
        # PARTIALS (MapReduce-style hand-off) instead of running the
        # frontier-combine all-to-all + combined write; the next level's
        # schedule groups do the per-url merge (schedule.py
        # _combine_partials_group).  Requires a budget: the schedule
        # groupby IS where partials of one url meet (a url determines its
        # host, hence its schedule group)
        use_partials = cfg.frontier_partials and cfg.budget is not None
        hc_dir = None
        if cfg.skew_threshold is not None:
            # side-product: per-host counts of the NEXT frontier, so the
            # next level's hot-host detection needs no count execution
            hc_dir = self._lvl(k, "host_counts")
            self.store.prepare_side_dir(hc_dir)

        deferred_dir = None  # on-disk deferred partials (fused budget paths)
        pre_group = None  # fold_retrim hook (set on the salted aligned path)
        hot = self._load_hot_hosts(k)
        if cfg.budget is None:
            scheduled = candidates
        else:
            if (
                hot is None
                and cfg.skew_threshold is not None
                and (n_frontier < 0 or n_frontier > cfg.skew_threshold)
            ):
                # no side-written counts (level 0 / resume / small-path
                # predecessor): one count pass over the frontier urls — a
                # pre-seen-filter upper bound, which only ever salts MORE
                # hosts; skipped when the whole frontier is below the
                # threshold (no host can be hot).  Unknown size
                # (n_frontier < 0, e.g. process_frontier without a count)
                # is treated as LARGE — silently skipping the count would
                # disable salting exactly when it matters (ADVICE r3)
                hc = host_counts(frontier)
                hot = set(hc.loc[hc["n"] > cfg.skew_threshold, "host"])
            deferred_dir = self._lvl(k, "deferred")
            self.store.prepare_side_dir(deferred_dir)
            writer = _deferred_partials_writer(
                deferred_dir,
                dedup_buckets,
                self.store,
                hc_dir=hc_dir if use_partials else None,
            )
            if not hot:
                # skew handling off, or counts prove no host is hot: the
                # unsalted single-execution scheduler (exact semantics,
                # one groupby shuffle)
                scheduled = schedule_level_fused(
                    candidates,
                    cfg.budget,
                    writer,
                    n_buckets=cfg.n_buckets,
                    policy=cfg.priority_policy,
                )
            elif (
                cfg.fold_retrim
                and self._fetch_mode == "partitioned"
                and (n_frontier < 0 or n_frontier > cfg.fetch_align_threshold)
            ):
                # hot hosts + the aligned partitioned fetch: stage-1 salted
                # scheduling only, with the exact per-host re-trim (and the
                # seen-marking) FOLDED into the fetch-align groupby below —
                # one fewer all-to-all barrier per salted level.  The
                # align predicate mirrors _fetch's align choice exactly:
                # pre_group needs the groupby barrier for its key reads
                hotkeys_dir = self._lvl(k, f"hotkeys-{self._run_tag}")
                self.store.prepare_side_dir(hotkeys_dir)
                scheduled = schedule_level_fused_salted_stage1(
                    candidates,
                    cfg.budget,
                    writer,
                    n_buckets=cfg.n_buckets,
                    n_salts=cfg.n_salts,
                    hot_hosts=hot,
                    hotkeys_writer=_hotkeys_writer(hotkeys_dir, self.store),
                    policy=cfg.priority_policy,
                )
                pre_group = _pre_fetch_trim(
                    self.store,
                    hotkeys_dir,
                    writer,
                    self.seen,
                    hot,
                    cfg.budget,
                    cfg.n_buckets,
                )
            else:
                # hot hosts present: the salted scheduler — still ONE
                # streaming execution (two chained in-stream groupbys,
                # no materialize barrier; see schedule.py)
                scheduled = schedule_level_fused_salted(
                    candidates,
                    cfg.budget,
                    writer,
                    n_buckets=cfg.n_buckets,
                    n_salts=cfg.n_salts,
                    hot_hosts=hot,
                    policy=cfg.priority_policy,
                )

        results_final = self._lvl(k, "results")
        results_staged = self.store.begin_dir(results_final)

        empty_results = False
        if self._fetch_mode == "join":
            # ray 2.49 Dataset.join raises on a fully-empty left side; the
            # materialize is also a barrier that makes the fused path's
            # deferred side-writes durable before the combine below
            scheduled = scheduled.materialize()
            empty_results = scheduled.count() == 0

        if empty_results:
            slim = ray.data.from_arrow(
                self.RESULTS_SCHEMA.empty_table().select(["url", "depth", "outlinks"])
            )
        elif pre_group is not None:
            # fold_retrim: re-trim + seen-marking run INSIDE the aligned
            # fetch groups (pre_group), so no separate seen_add stage
            fetched = fetch_partitioned(
                scheduled,
                cfg.corpus_path,
                cfg.num_corpus_shards,
                align=True,
                pre_group=pre_group,
            )
            results = extract_stage(
                fetched, depth=k, batch_size=cfg.extract_batch_size
            )
            slim = _side_write_results(results, results_staged, self.store)
        else:
            marked = seen_add(scheduled, self.seen)
            # n_frontier is an upper bound on the scheduled rows — the
            # right scale signal for the align-vs-per-batch fetch choice
            fetched = self._fetch(marked, n_frontier)
            results = extract_stage(
                fetched, depth=k, batch_size=cfg.extract_batch_size
            )
            slim = _side_write_results(results, results_staged, self.store)

        outlinks = flatten_outlinks(slim, cfg.domain)
        store = self.store  # closure capture: the seam object, not self

        # local pre-aggregation (combiner): one row per distinct url per
        # batch with its partial referrer count; in partials mode (no
        # end-of-level combine to count next-frontier hosts) it also
        # side-writes per-batch host counts — pre-combine upper bounds,
        # which only ever salt MORE hosts
        next_candidates = outlinks.map_batches(
            _make_next_partials(store, hc_dir=hc_dir if use_partials else None),
            batch_format="pyarrow",
        )
        if use_partials:
            # MapReduce-style durable hand-off: publish the combine-input
            # partials AS the next frontier (deferred partials stay in
            # their own committed side-dir and are read alongside by the
            # next level — see _frontier_input).  No combine all-to-all,
            # no bucket seeding, no combined-frontier write.
            n_next = _write_atomic(
                self.store, next_candidates, self._lvl(k, "frontier_next")
            )
            frontier_next = next_candidates  # stats surface below
        else:
            n_next = None
            bucketed = add_hash_bucket(next_candidates, "url", dedup_buckets)
            if deferred_dir is not None:
                # seed one marker row per bucket so every combine group
                # fires even when its only real input is on-disk deferred
                # partials
                bucketed = bucketed.union(
                    ray.data.from_arrow(_bucket_seed_table(dedup_buckets))
                )
        policy = cfg.priority_policy
        deferred_read_dir = deferred_dir

        def _combine(g: pd.DataFrame) -> pa.Table:
            b = int(g["__bucket"].iloc[0])
            g = g[g["__cnt"] != _SEED_CNT].drop(columns=["__bucket"])
            if deferred_read_dir is not None:
                files = store.list_files(deferred_read_dir, f"d{b:05d}-*.parquet")
                if files:
                    g = pd.concat(
                        [g] + [pq.read_table(f).to_pandas() for f in files],
                        ignore_index=True,
                    )
            out = combine_frontier_pandas(g, policy)
            if hc_dir is not None and len(out):
                vc = out["host"].value_counts()
                t = pa.table(
                    {
                        "host": pa.array(vc.index.astype(str)),
                        "n": pa.array(vc.to_numpy(dtype=np.int64)),
                    }
                )
                store.write_part(hc_dir, f"b{b:05d}.parquet", t)
            return pa.Table.from_pandas(
                out, schema=FRONTIER_SCHEMA, preserve_index=False
            ).replace_schema_metadata(None)

        if not use_partials:
            frontier_next = bucketed.groupby("__bucket").map_groups(
                _combine, batch_format="pandas"
            )
            n_next = _write_atomic(
                self.store, frontier_next, self._lvl(k, "frontier_next")
            )
        if os.environ.get("GRAFT_LEVEL_STATS"):
            print(f"===== level {k} stats =====\n{frontier_next.stats()}", flush=True)
        _t_main = _time.time() - _t0

        # the big execution is done: commit the side-written results dir
        self.store.commit_dir(results_final, results_staged)
        n_results = self.store.count_rows(results_final)

        n_deferred_rows = (
            self.store.count_rows(deferred_dir) if deferred_dir is not None else 0
        )
        n_cand = n_results + n_deferred_rows
        if use_partials:
            # deferred partials ARE next-level frontier input in this mode
            # (they were never merged into a combined frontier_next)
            n_next += n_deferred_rows
        n_miss = self._results_miss_count(k)
        _t_next = _time.time() - _t0 - _t_main
        self._finish_level(
            k,
            LevelMetrics(
                level=k,
                n_frontier=n_frontier,
                n_candidates=n_cand,
                n_scheduled=n_results,
                n_deferred=n_deferred_rows,
                n_fetched=n_results - n_miss,
                n_fetch_miss=n_miss,
                n_outlinks=-1,  # not separately counted on this path
                n_frontier_next=n_next,
                path="distributed",
                extra={
                    "t_main": round(_t_main, 2),
                    "t_next": round(_t_next, 2),
                    "frontier_format": "partials" if use_partials else "combined",
                    # count units (ADVICE r4): in partials mode the frontier
                    # counts are combine-input PARTIAL ROWS (pre-merge, may
                    # exceed unique urls), not urls — downstream tooling
                    # must not compare across formats under one name
                    "n_frontier_unit": (
                        "partial_rows" if in_fmt == "partials" else "urls"
                    ),
                    "n_frontier_next_unit": (
                        "partial_rows" if use_partials else "urls"
                    ),
                },
            ),
        )
        return n_next

    def _window_size(self, k0: int, n_frontier: int) -> int:
        """Width of the fused window starting at level ``k0`` (see
        ``CrawlConfig.fused_window_rows``).  Static ``fused_levels`` when
        the adaptive target is unset; otherwise the largest W ≤
        ``fused_levels`` whose estimated cumulative frontier rows fit the
        target (always ≥ 1 — a single over-target level still runs)."""
        cfg = self.cfg
        w_max = min(cfg.fused_levels, cfg.max_levels - k0)
        target = cfg.fused_window_rows
        if not target or w_max <= 1:
            return w_max
        # growth prior: with no completed-level history (cold start) assume
        # the clamp MAX, not 1.0 — a BFS frontier grows geometrically from
        # the seed, and extrapolating flat once fused levels 0-7 of the
        # bench corpus into one execution on an estimate of 8 rows (real:
        # 66.7k).  A too-high prior only narrows the first window, which a
        # tiny head level can afford; history overrides it immediately.
        ratio = 8.0
        for m in reversed(self.metrics):
            if m.n_frontier > 0 and m.n_frontier_next > 0:
                ratio = min(8.0, max(0.125, m.n_frontier_next / m.n_frontier))
                break
        est = float(max(n_frontier, 1))
        total, w = est, 1
        while w < w_max:
            est *= ratio
            if total + est > target:
                break
            total += est
            w += 1
        return w

    def _run_level_window(
        self,
        k0: int,
        frontier: Dataset,
        n_frontier: int,
        in_fmt: str = "combined",
        W: int | None = None,
    ) -> list[int]:
        """Fused level window ("level pipelining"): up to ``fused_levels``
        consecutive distributed levels built as ONE streaming execution —
        level k+1's schedule shuffle overlaps level k's extract, and the
        per-level execution fixed cost is paid once per window.

        Exactness rests on the all-to-all barrier chain: level k+1's
        schedule groupby consumes the full output of level k's extract,
        which transitively requires EVERY level-k task — all seen-marking
        (``seen_add`` map tasks, or ``_pre_fetch_trim`` inside the
        fetch-align groups) and every deferred/hotkeys side-write — to
        have completed first.  So for in-window levels the seen check
        moves INTO the schedule groups (``_window_combine_hook``), the
        previous level's deferred partials are read there (parts named by
        THIS level's bucket), and per-bucket seed markers guarantee every
        group fires even when its only input is on-disk.

        Durability is unchanged: every level still side-writes results
        blocks, deferred partials, frontier partials and host counts under
        idempotent names; manifests commit in level order once the window
        completes (a crash reruns the whole window — resume granularity is
        the window).  Hot-host sets are window-static (stale by ≤ W-1
        levels; salting is perf-only, semantics ≡ unsalted)."""
        import time as _time

        _t0 = _time.time()
        cfg = self.cfg
        frontier.context.op_resource_reservation_enabled = False
        frontier.context.target_max_block_size = cfg.target_block_size_mb * 1024 * 1024
        if W is None:
            W = min(cfg.fused_levels, cfg.max_levels - k0)
        dedup_buckets = (
            cfg.num_corpus_shards if self._fetch_mode == "partitioned" else cfg.n_buckets
        )

        hot = self._load_hot_hosts(k0)
        if hot is None and cfg.skew_threshold is not None and (
            n_frontier < 0 or n_frontier > cfg.skew_threshold
        ):
            hc = host_counts(frontier)
            hot = set(hc.loc[hc["n"] > cfg.skew_threshold, "host"])
        hot = hot or set()

        cur = seen_filter(frontier, self.seen)
        if self._robots_ref is not None:
            cur = robots_filter(cur, self._robots_ref)

        from ..stages.schedule import window_bucket_fn

        staged_results: list[tuple[str, str]] = []
        next_candidates = None
        for j in range(W):
            k = k0 + j
            terminal = j == W - 1
            deferred_dir = self._lvl(k, "deferred")
            self.store.prepare_side_dir(deferred_dir)
            hc_dir = None
            if cfg.skew_threshold is not None:
                hc_dir = self._lvl(k, "host_counts")
                self.store.prepare_side_dir(hc_dir)
            if terminal:
                # the next level starts a NEW window: deferred consumed as
                # plain input files (any partitioning), d-keyed as today
                writer = _deferred_partials_writer(
                    deferred_dir, dedup_buckets, self.store, hc_dir=hc_dir
                )
            else:
                # consumed IN-GROUP by level k+1: parts named by its bucket
                writer = _window_deferred_writer(
                    deferred_dir, hot, cfg.n_salts, cfg.n_buckets, self.store, hc_dir
                )

            combine_hook = None
            bucket_fn = None
            if j > 0:
                combine_hook = _window_combine_hook(
                    self.store,
                    self._lvl(k - 1, "deferred"),
                    cfg.priority_policy,
                    hot if hot else None,
                    cfg.n_salts,
                    self.seen,
                )
                bucket_fn = window_bucket_fn(hot, cfg.n_salts, cfg.n_buckets)
                # seed one marker row per bucket so every schedule group
                # fires even when its only real input is on-disk deferred
                cur = cur.union(ray.data.from_arrow(_bucket_seed_table(cfg.n_buckets)))

            pre_group = None
            if not hot:
                scheduled = schedule_level_fused(
                    cur,
                    cfg.budget,
                    writer,
                    n_buckets=cfg.n_buckets,
                    policy=cfg.priority_policy,
                    bucket_fn=bucket_fn,
                    combine=combine_hook,
                )
            elif cfg.fold_retrim:
                hotkeys_dir = self._lvl(k, f"hotkeys-{self._run_tag}")
                self.store.prepare_side_dir(hotkeys_dir)
                scheduled = schedule_level_fused_salted_stage1(
                    cur,
                    cfg.budget,
                    writer,
                    n_buckets=cfg.n_buckets,
                    n_salts=cfg.n_salts,
                    hot_hosts=hot,
                    hotkeys_writer=_hotkeys_writer(hotkeys_dir, self.store),
                    policy=cfg.priority_policy,
                    bucket_fn=bucket_fn,
                    combine=combine_hook,
                )
                pre_group = _pre_fetch_trim(
                    self.store,
                    hotkeys_dir,
                    writer,
                    self.seen,
                    hot,
                    cfg.budget,
                    cfg.n_buckets,
                )
            else:
                scheduled = schedule_level_fused_salted(
                    cur,
                    cfg.budget,
                    writer,
                    n_buckets=cfg.n_buckets,
                    n_salts=cfg.n_salts,
                    hot_hosts=hot,
                    policy=cfg.priority_policy,
                    bucket_fn=bucket_fn,
                    combine=combine_hook,
                )

            results_final = self._lvl(k, "results")
            results_staged = self.store.begin_dir(results_final)
            staged_results.append((results_final, results_staged))
            if pre_group is not None:
                fetched = fetch_partitioned(
                    scheduled,
                    cfg.corpus_path,
                    cfg.num_corpus_shards,
                    align=True,
                    pre_group=pre_group,
                )
            else:
                marked = seen_add(scheduled, self.seen)
                fetched = fetch_partitioned(
                    marked, cfg.corpus_path, cfg.num_corpus_shards, align=True
                )
            results = extract_stage(fetched, depth=k, batch_size=cfg.extract_batch_size)
            slim = _side_write_results(results, results_staged, self.store)
            outlinks = flatten_outlinks(slim, cfg.domain)

            if terminal:
                next_candidates = outlinks.map_batches(
                    _make_next_partials(self.store, hc_dir=hc_dir),
                    batch_format="pyarrow",
                )
            else:
                fn_dir = self._lvl(k, "frontier_next")
                self.store.prepare_side_dir(fn_dir)
                cur = outlinks.map_batches(
                    _make_next_partials(self.store, hc_dir=hc_dir, side_dir=fn_dir),
                    batch_format="pyarrow",
                )
                if self._robots_ref is not None:
                    # same placement as a level start: the durable copy
                    # stays pre-robots (what a resume reads + refilters)
                    cur = robots_filter(cur, self._robots_ref)

        # ONE execution materializes the whole window
        _write_atomic(
            self.store, next_candidates, self._lvl(k0 + W - 1, "frontier_next")
        )
        if os.environ.get("GRAFT_LEVEL_STATS"):
            print(
                f"===== window {k0}..{k0 + W - 1} stats =====\n"
                f"{next_candidates.stats()}",
                flush=True,
            )
        t_window = round(_time.time() - _t0, 2)

        # commit manifests in level order; trailing never-ran levels elided
        nexts: list[int] = []
        nf = n_frontier
        for j in range(W):
            k = k0 + j
            if nf == 0:
                for jj in range(j, W):
                    self.store.remove_dir(self._lvl(k0 + jj))
                break
            final, staged = staged_results[j]
            self.store.commit_dir(final, staged)
            n_results = self.store.count_rows(final)
            n_def = self.store.count_rows(self._lvl(k, "deferred"))
            n_next = self.store.count_rows(self._lvl(k, "frontier_next")) + n_def
            n_miss = self._results_miss_count(k)
            self._finish_level(
                k,
                LevelMetrics(
                    level=k,
                    n_frontier=nf,
                    n_candidates=n_results + n_def,
                    n_scheduled=n_results,
                    n_deferred=n_def,
                    n_fetched=n_results - n_miss,
                    n_fetch_miss=n_miss,
                    n_outlinks=-1,
                    n_frontier_next=n_next,
                    path="distributed",
                    extra={
                        "frontier_format": "partials",
                        "fused_window": [k0, k0 + W - 1],
                        "t_window": t_window,
                        # count units (ADVICE r4): in-window levels are fed
                        # partial rows; only the window head may see urls
                        "n_frontier_unit": (
                            "partial_rows"
                            if (j > 0 or in_fmt == "partials")
                            else "urls"
                        ),
                        "n_frontier_next_unit": "partial_rows",
                    },
                ),
            )
            nexts.append(n_next)
            nf = n_next
        return nexts

    def _finish_level(self, k: int, m: LevelMetrics) -> None:
        self.metrics.append(m)
        self._commit_manifest(k, m)
        if self.cfg.verbose:  # streaming progress surface (per-level)
            print(
                f"level {k}: frontier={m.n_frontier} scheduled={m.n_scheduled} "
                f"fetched={m.n_fetched} miss={m.n_fetch_miss} "
                f"deferred={m.n_deferred} next={m.n_frontier_next} [{m.path}]",
                flush=True,
            )

    def _commit_manifest(self, k: int, m: LevelMetrics) -> None:
        """The commit record — written last.  Per-partition lineage: every
        artifact file with its row count (north_rule: per-partition
        lineage + metrics)."""
        lineage = {}
        for art in ("results", "frontier_next", "deferred"):
            d = self._lvl(k, art)
            lineage[art] = [
                {"file": os.path.basename(f), "rows": pq.ParquetFile(f).metadata.num_rows}
                for f in self.store.list_parts(d)
            ]
        manifest = {
            "level": k,
            "metrics": m.__dict__,
            "partitions": lineage,
            # how frontier_next is encoded: "combined" = one frontier row
            # per url (FRONTIER_SCHEMA); "partials" = combine-input rows
            # (__cnt column) whose per-url merge happens in the NEXT
            # level's schedule groups, with the deferred dir read alongside
            "frontier_format": m.extra.get("frontier_format", "combined"),
            # units of the frontier counts above (ADVICE r4): partial-row
            # counts overcount unique urls, so consumers must not compare
            # levels across formats under one field name
            "n_frontier_unit": m.extra.get("n_frontier_unit", "urls"),
            "n_frontier_next_unit": m.extra.get("n_frontier_next_unit", "urls"),
        }
        self.store.write_json(self._lvl(k, "manifest.json"), manifest)

    # ----------------------------------------------------------- entry points
    @contextmanager
    def _ctx_overrides(self):
        """Scope the engine's DataContext tuning to its own executions.

        The fused level is one long operator DAG (~10 operators); Ray
        Data's default per-operator resource reservation splits the
        cluster budget across ALL of them and starves the heavyweight
        extract operator on small clusters (measured: a 100k-URL level at
        8 CPUs ran 250 s reserved vs 89 s unreserved — extract got ~2
        concurrent tasks out of 8).  The level's per-operator outputs are
        bounded (combiner partials, projected slim rows), so
        reservation-free scheduling cannot livelock here.  Datasets
        SNAPSHOT the context at creation, so the overrides apply while
        the engine builds/executes its levels and are RESTORED on exit —
        unrelated pipelines later in the process keep Ray's defaults."""
        ctx = ray.data.DataContext.get_current()
        saved = (ctx.op_resource_reservation_enabled, ctx.target_max_block_size)
        ctx.op_resource_reservation_enabled = False
        ctx.target_max_block_size = self.cfg.target_block_size_mb * 1024 * 1024
        try:
            yield
        finally:
            ctx.op_resource_reservation_enabled, ctx.target_max_block_size = saved

    def run(self) -> list[LevelMetrics]:
        """Fresh crawl from the seed list."""
        self.store.remove_dir(self.cfg.ckpt_dir)  # prefix DELETE on the seam
        os.makedirs(self.cfg.ckpt_dir, exist_ok=True)
        seeds = self.cfg.seeds or [f"https://{self.cfg.domain}"]
        with self._ctx_overrides():
            return self._loop(0, seed_tbl=frontier_table(seeds))

    def resume(self) -> list[LevelMetrics]:
        """Restart after the last committed level: replay seen deltas from
        durable results, reload the stored next frontier."""
        done = self.committed_levels()
        if not done:
            return self.run()
        last = max(done)
        # drop any uncommitted partial level directories
        for d in list(os.listdir(self.cfg.ckpt_dir)):
            if d.startswith("level_") and int(d.split("_")[1]) > last:
                self.store.remove_dir(os.path.join(self.cfg.ckpt_dir, d))
        with self._ctx_overrides():
            self._replay_seen(done)
            return self._loop(last + 1)

    def _replay_seen(self, levels: list[int]) -> None:
        """Rebuild the seen-set from committed ``results`` urls.  The total
        row count comes from the manifests' per-partition lineage (no
        parquet touch).  Small resumes replay driver-side; past
        ``small_level_rows`` the replay is a distributed ``map_batches``
        over the results url column — every task routes its batch straight
        to the seen shards, so rebuild cost scales with the cluster instead
        of one driver process iterating 10^10 rows (the adds are idempotent
        and commutative, so block order is free).  Records the path taken
        in ``self.seen_replay_path`` for tests/metrics."""
        files, total = [], 0
        for k in levels:
            files.extend(self.store.list_parts(self._lvl(k, "results")))
            try:
                with open(self._lvl(k, "manifest.json")) as f:
                    man = json.load(f)
                total += sum(p["rows"] for p in man["partitions"]["results"])
            except (OSError, KeyError, json.JSONDecodeError):
                total += self.store.count_rows(self._lvl(k, "results"))
        if not files:
            self.seen_replay_path = "empty"
            return
        if total <= self.cfg.small_level_rows:
            self.seen_replay_path = "driver"
            for f in files:
                self.seen.add(pq.read_table(f, columns=["url"])["url"].to_pylist())
            return
        self.seen_replay_path = "distributed"
        seen = self.seen

        def _add(t: pa.Table) -> pa.Table:
            seen.add(t["url"].to_pylist())
            return pa.table({"n": pa.array([t.num_rows], pa.int64())})

        replayed = (
            ray.data.read_parquet(files, columns=["url"])
            .map_batches(_add, batch_format="pyarrow", batch_size=8192)
            .sum("n")
        )
        if (replayed or 0) != total:
            raise RuntimeError(
                f"seen replay incomplete: {replayed} of {total} result urls"
            )

    def _frontier_input(self, k_prev: int) -> tuple[list[str], int, str]:
        """(files, total rows, format) of level ``k_prev``'s committed
        next-frontier.  ``format="partials"`` (frontier_partials mode)
        means the files are combine-input rows — frontier_next parts PLUS
        the level's deferred partials (never merged into a combined
        frontier) — and the reader must run the per-url combine (schedule
        groups distributed, combine_frontier_pandas on the driver path)."""
        fmt = "combined"
        try:
            with open(self._lvl(k_prev, "manifest.json")) as f:
                fmt = json.load(f).get("frontier_format", "combined")
        except (OSError, json.JSONDecodeError):
            pass
        dirs = [self._lvl(k_prev, "frontier_next")]
        if fmt == "partials":
            dirs.append(self._lvl(k_prev, "deferred"))
        files = [f for d in dirs for f in self.store.list_parts(d)]
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        return files, rows, fmt

    def _loop(self, start: int, seed_tbl: pa.Table | None = None) -> list[LevelMetrics]:
        cfg = self.cfg
        k = start
        while k < cfg.max_levels:
            if seed_tbl is not None and k == start:
                n_frontier, files, fmt = seed_tbl.num_rows, None, "combined"
            else:
                files, n_frontier, fmt = self._frontier_input(k - 1)
            if n_frontier == 0:
                break
            if fmt == "partials" and cfg.budget is None and (
                n_frontier > cfg.small_level_rows
            ):
                # the distributed per-url merge of partial rows happens in
                # the schedule groupby, which only exists under a budget —
                # fetching un-combined duplicate rows would be wrong.  A
                # SMALL partials level needs no budget: the driver path
                # below merges whole-frame via combine_frontier_pandas
                raise ValueError(
                    f"level {k - 1} committed frontier PARTIALS "
                    f"({n_frontier} rows > small_level_rows="
                    f"{cfg.small_level_rows}) but the config has no "
                    "per-host budget — the schedule groupby is where "
                    "partials combine; resume with the budgeted config "
                    "that wrote this checkpoint"
                )
            if n_frontier <= cfg.small_level_rows:
                if files is None:
                    tbl = seed_tbl
                else:
                    tbl = (
                        pa.concat_tables(pq.read_table(f) for f in files)
                        if files
                        else FRONTIER_SCHEMA.empty_table()
                    )
                    if fmt == "partials":
                        # driver fast path: the per-url merge the schedule
                        # groups would do, whole-frame (same kernel)
                        tbl = pa.Table.from_pandas(
                            combine_frontier_pandas(
                                tbl.to_pandas(), cfg.priority_policy
                            ),
                            schema=FRONTIER_SCHEMA,
                            preserve_index=False,
                        ).replace_schema_metadata(None)
                n_next = self._run_level_small(k, tbl)
            else:
                # two regimes (A/B-measured): tiny levels are pure wave
                # latency — one block ends the 90-tiny-task waves; real
                # levels floor at 32 blocks so the sort-partition count
                # (which tracks input blocks) keeps fetch/extract parallel
                rpb = max(1, cfg.level_rows_per_block)
                if n_frontier < 2 * rpb:
                    nb = max(1, -(-n_frontier // rpb))
                else:
                    nb = min(
                        cfg.level_read_blocks, max(32, n_frontier // rpb)
                    )
                ds = (
                    ray.data.from_arrow(seed_tbl)
                    if files is None
                    else ray.data.read_parquet(files, override_num_blocks=nb)
                )
                if (
                    cfg.fused_levels > 1
                    and cfg.frontier_partials
                    and cfg.budget is not None
                    and self._fetch_mode == "partitioned"
                    and k + 1 < cfg.max_levels
                ):
                    nexts = self._run_level_window(
                        k, ds, n_frontier, in_fmt=fmt, W=self._window_size(k, n_frontier)
                    )
                    n_next = nexts[-1]
                    k += len(nexts) - 1  # the window ran len(nexts) levels
                else:
                    n_next = self._run_level_big(k, ds, n_frontier, in_fmt=fmt)
            if n_next == 0:
                break
            if (
                cfg.max_pages is not None
                and sum(m.n_scheduled for m in self.metrics) >= cfg.max_pages
            ):
                break  # [NR] page-budget guard (level-granular)
            k += 1
        return self.metrics

    def process_frontier(
        self, frontier: Dataset, k: int = 0, n_frontier: int = -1
    ) -> LevelMetrics:
        """Run ONE fully-distributed BFS level over an arbitrary frontier —
        the steady-state unit of a web-scale crawl (at 10^10 URLs every
        level is huge and this is where all the time goes).  Used by the
        bench scaling harness; semantics identical to the loop's levels.
        Pass ``n_frontier`` if known (from source metadata) to avoid a
        counting execution."""
        os.makedirs(self.cfg.ckpt_dir, exist_ok=True)
        with self._ctx_overrides():
            self._run_level_big(k, frontier, n_frontier)
        return self.metrics[-1]

    # ----------------------------------------------------------- artifacts
    def results_dataset(self) -> Dataset:
        files = []
        for k in self.committed_levels():
            files.extend(self.store.list_parts(self._lvl(k, "results")))
        if not files:
            return ray.data.from_arrow(self.RESULTS_SCHEMA.empty_table())
        return ray.data.read_parquet(files)

    def outlinks_dataset(self) -> Dataset:
        """(src_url, url, host, in_scope, depth) — exploded on demand from
        the per-level results' outlinks list column (column-pruned read)."""
        files = []
        for k in self.committed_levels():
            files.extend(self.store.list_parts(self._lvl(k, "results")))
        if not files:
            return ray.data.from_arrow(self.OUTLINKS_SCHEMA.empty_table())
        ds = ray.data.read_parquet(files, columns=["url", "depth", "outlinks"])
        return flatten_outlinks(ds, self.cfg.domain)

    def all_links_sorted(self) -> Dataset:
        """The reference's links.txt artifact (crawler.py:93-97): every
        extracted link (in-scope or not), exact-deduped, globally sorted
        (range-partitioned shuffle)."""
        links = self.outlinks_dataset().select_columns(["url"])
        return dedup_exact(links, "url", n_buckets=self.cfg.n_buckets).sort("url")

    def visited_depth(self) -> dict[str, int]:
        """url → level fetched (for conformance tests; small corpora)."""
        out: dict[str, int] = {}
        for k in self.committed_levels():
            for f in self.store.list_parts(self._lvl(k, "results")):
                t = pq.read_table(f, columns=["url", "depth"])
                for u, d in zip(t["url"].to_pylist(), t["depth"].to_pylist()):
                    out[u] = d
        return out

    def export_warc(self, out_dir: str, compress: bool = True) -> int:
        """Export every successfully fetched page as WARC archives
        (sources/warc.py) — the standard interchange for crawl output.
        The payload is the byte-identical extracted text (M5: text ≡ the
        page bytes decoded); misses (fetch_status false) are skipped.
        One streaming map_batches chain: results parquet → project →
        idempotent content-named archive files.  Returns pages written."""
        from ..sources.warc import write_warc

        def _to_pages(t: pa.Table) -> pa.Table:
            # fetch_status is stored as int (0/1); misses carry null text
            t = t.filter(pc.cast(t["fetch_status"], pa.bool_()))
            return pa.table(
                {
                    "url": t["url"],
                    "html": pa.array(
                        [(s or "").encode("utf-8") for s in t["text"].to_pylist()],
                        pa.binary(),
                    ),
                }
            )

        pages = (
            self.results_dataset()
            .select_columns(["url", "text", "fetch_status"])
            .map_batches(_to_pages, batch_format="pyarrow")
        )
        return write_warc(pages, out_dir, compress=compress).count()

    def save_links_txt(self, filename: str) -> int:
        """Conformance artifact: one sorted unique link per line, UTF-8 —
        byte-equal to the reference's links.txt (crawler.py:93-97)."""
        n = 0
        with open(filename, "w", encoding="utf-8") as f:
            for b in self.all_links_sorted().iter_batches(
                batch_size=65536, batch_format="pyarrow"
            ):
                for u in b["url"].to_pylist():
                    f.write(f"{u}\n")
                    n += 1
        return n
