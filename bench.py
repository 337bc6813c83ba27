#!/usr/bin/env python
"""Benchmark runner (driver contract: prints ONE JSON line).

Headline: the BFS crawl engine over a deterministic synthetic page corpus
(hash-partitioned parquet, politeness budget + skew salting active, fully
distributed control plane) — metric = wall seconds, plus URLs/sec.
Secondary: representative training-data queries at $GRAFT_SF_DIR.

``--scaling``: runs the bench twice in fresh processes at num_cpus=8 and
num_cpus=32 on the SAME pre-generated input and reports both throughputs
plus efficiency = (t8/t32)/4 — the sandbox evidence for the north_rule's
N→4N criterion (SURVEY.md §4.6).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_HOSTS = int(os.environ.get("GRAFT_BENCH_HOSTS", "50"))
BENCH_PAGES = int(os.environ.get("GRAFT_BENCH_PAGES", "1000"))  # per host
CORPUS_SHARDS = 32
CORPUS_DIR = f"/tmp/graft_bench_corpus_h{BENCH_HOSTS}_p{BENCH_PAGES}"


def ensure_corpus() -> str:
    """Generate the bench corpus ONCE (distributed, deterministic) into a
    hash(url)-partitioned parquet layout; reused across runs/levels."""
    marker = os.path.join(CORPUS_DIR, "_SUCCESS")
    if os.path.exists(marker):
        return CORPUS_DIR
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from crawler_uni_ray.corpus import CorpusSpec, gen_rows
    from crawler_uni_ray.urlnorm import url_hash_batch

    spec = CorpusSpec(n_hosts=BENCH_HOSTS, pages_per_host=BENCH_PAGES, hub_weight=0.5)
    shutil.rmtree(CORPUS_DIR, ignore_errors=True)
    for s in range(CORPUS_SHARDS):
        os.makedirs(os.path.join(CORPUS_DIR, f"part_hash={s:02d}"), exist_ok=True)

    def _gen(batch):
        ids = batch["id"]
        tbl = gen_rows(spec, ids.tolist())
        shard = (url_hash_batch(tbl["url"].to_pylist()) % CORPUS_SHARDS).astype(np.int64)
        first = int(ids[0])
        for s in set(shard.tolist()):
            sub = tbl.filter(__import__("pyarrow").array(shard == s))
            pq.write_table(
                sub,
                os.path.join(CORPUS_DIR, f"part_hash={s:02d}", f"rows-{first:09d}.parquet"),
            )
        return {"n": np.array([tbl.num_rows])}

    n = ray.data.range(spec.n_rows, override_num_blocks=max(NUM_CPUS * 2, 16)).map_batches(
        _gen, batch_size=2048
    ).sum("n")
    with open(marker, "w") as f:
        f.write(str(n))
    return CORPUS_DIR


def bench_crawl() -> dict:
    from crawler_uni_ray.pipelines.crawl import CrawlConfig, CrawlEngine

    corpus = ensure_corpus()
    ckpt = f"/tmp/graft_bench_ckpt_{NUM_CPUS}"
    cfg = CrawlConfig(
        domain="example.com",
        ckpt_dir=ckpt,
        corpus_path=corpus,
        fetch_mode="partitioned",
        num_corpus_shards=CORPUS_SHARDS,
        budget=max(100, BENCH_PAGES // 4),
        skew_threshold=max(200, (BENCH_HOSTS * BENCH_PAGES) // (BENCH_HOSTS * 2)),
        n_salts=8,
        n_buckets=max(32, NUM_CPUS),
        small_level_rows=0,  # benchmark the fully-distributed control plane
        seen_backend="exact",
        num_seen_shards=8,
    )
    t0 = time.time()
    eng = CrawlEngine(cfg)
    eng.run()
    dt = time.time() - t0
    n_visited = sum(m.n_scheduled for m in eng.metrics)
    n_fetched = sum(m.n_fetched for m in eng.metrics)
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "crawl_sec": round(dt, 3),
        "crawl_levels": len(eng.metrics),
        "crawl_urls": n_visited,
        "crawl_urls_per_sec": round(n_visited / dt, 1),
        "crawl_pages_fetched_per_sec": round(n_fetched / dt, 1),
    }


def bench_queries() -> dict:
    from crawler_uni_ray.pipelines import queries as q

    out = {}
    for name, fn in [
        ("lineitem_agg", q.lineitem_agg),
        ("events_windowed", q.events_windowed),
        ("docs_dedup_exact", q.docs_dedup_exact),
        ("docs_minhash_clusters", q.docs_minhash_clusters),
        ("docs_quality", q.docs_quality),
        ("embeddings_ann", q.embeddings_ann),
    ]:
        t0 = time.time()
        fn(SF_DIR)
        out[name] = round(time.time() - t0, 3)
    return out


def run_once() -> dict:
    import logging
    import warnings

    warnings.filterwarnings("ignore")
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    ensure_corpus()  # untimed: warm page cache + one-time generation
    crawl = bench_crawl()
    queries = bench_queries()
    ray.shutdown()
    return {
        "metric": "crawl_wall_sec",
        "value": crawl["crawl_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        **crawl,
    }


def run_scaling() -> dict:
    def sub(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    ensure_warm = sub(8)  # first run also generates/warms the corpus
    r8 = ensure_warm
    r32 = sub(32)
    rate8 = r8["crawl_urls_per_sec"]
    rate32 = r32["crawl_urls_per_sec"]
    eff = (rate32 / rate8) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": r8["value"],
        "sec_32": r32["value"],
        "urls_per_sec_8": rate8,
        "urls_per_sec_32": rate32,
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once()))
