"""fold_retrim (VERDICT r3 #8): salted levels on the aligned partitioned
fetch path fold the exact per-host re-trim + seen-marking into the
fetch-align groupby — one fewer all-to-all barrier per salted level.
Semantics must be EXACTLY the two-stage salted plan's: engine ≡ oracle,
and fold ≡ no-fold run for run, for visited sets, links, and the
deferred/scheduled accounting."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_uni_ray.oracle import crawl_oracle
from crawler_uni_ray.pipelines.crawl import CrawlConfig, CrawlEngine
from crawler_uni_ray.urlnorm import url_hash_batch

from test_random_graphs import DOMAIN, random_corpus


def write_dict_corpus(corpus: dict, out_dir: str, num_shards: int = 4) -> str:
    """dict → the hash(url)-partitioned parquet layout fetch_partitioned
    reads (part_hash=NN/ dirs, url-sorted for row-group pruning)."""
    urls = sorted(corpus)
    tbl = pa.table(
        {"url": pa.array(urls), "html": pa.array([corpus[u] for u in urls], pa.binary())}
    )
    shard = url_hash_batch(urls) % num_shards
    for s in range(num_shards):
        d = os.path.join(out_dir, f"part_hash={s:02d}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            tbl.filter(pa.array(shard == s)), os.path.join(d, "part-0.parquet")
        )
    return out_dir


def _run(corpus_dir, ckpt, fold: bool, **kw):
    eng = CrawlEngine(
        CrawlConfig(
            domain=DOMAIN,
            ckpt_dir=ckpt,
            corpus_path=corpus_dir,
            fetch_mode="partitioned",
            num_corpus_shards=4,
            budget=2,
            skew_threshold=1,  # every multi-candidate host goes hot
            n_salts=4,
            fetch_align_threshold=0,  # force the aligned fetch on every level
            small_level_rows=0,  # distributed path only
            priority_policy="indegree",
            fold_retrim=fold,
            **kw,
        )
    )
    eng.run()
    return eng


@pytest.mark.parametrize("seed", [24, 48])
def test_fold_retrim_conformance(ray_session, tmp_path, seed):
    corpus = random_corpus(seed, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )

    eng = _run(corpus_dir, str(tmp_path / "fold"), fold=True)
    assert eng.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in eng.all_links_sorted().take_all()]
    assert links == oracle.sorted_links
    # the fold actually engaged: stage-1 survivor-key side-writes exist
    assert glob.glob(os.path.join(eng.cfg.ckpt_dir, "level_*", "hotkeys-*")), (
        "fold_retrim path never ran — test setup no longer triggers it"
    )

    # fold ≡ no-fold, level by level (scheduled/deferred accounting too)
    ref = _run(corpus_dir, str(tmp_path / "nofold"), fold=False)
    assert ref.visited_depth() == oracle.visited_depth
    assert [
        (m.level, m.n_scheduled, m.n_deferred, m.n_frontier_next) for m in eng.metrics
    ] == [
        (m.level, m.n_scheduled, m.n_deferred, m.n_frontier_next) for m in ref.metrics
    ]


def test_fold_retrim_on_manifest_backend(ray_session, tmp_path):
    """The fold's side-writes (hotkeys + trimmed-deferred) must hold on the
    object-store manifest backend too."""
    corpus = random_corpus(27, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )
    eng = _run(corpus_dir, str(tmp_path / "fold"), fold=True, storage="manifest")
    assert eng.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in eng.all_links_sorted().take_all()]
    assert links == oracle.sorted_links


def test_fold_retrim_resume(ray_session, tmp_path):
    """Kill after two levels mid-crawl, resume with a FRESH engine (new run
    tag): the folded levels' commit records gate exactly as before, and the
    resumed run's trim reads ITS OWN hotkeys dirs, never the dead run's."""
    corpus = random_corpus(56, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )
    ckpt = str(tmp_path / "ckpt")
    partial = _run(corpus_dir, ckpt, fold=True, max_levels=2)
    assert partial.committed_levels() == [0, 1]

    resumed = CrawlEngine(
        CrawlConfig(
            domain=DOMAIN,
            ckpt_dir=ckpt,
            corpus_path=corpus_dir,
            fetch_mode="partitioned",
            num_corpus_shards=4,
            budget=2,
            skew_threshold=1,
            n_salts=4,
            fetch_align_threshold=0,
            small_level_rows=0,
            priority_policy="indegree",
            fold_retrim=True,
        )
    )
    resumed.resume()
    assert resumed.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in resumed.all_links_sorted().take_all()]
    assert links == oracle.sorted_links
