"""frontier_partials (round-4 headline lever): budgeted big levels END at
durable next-frontier PARTIALS — the combine-input rows — instead of
running the frontier-combine all-to-all + combined write; the NEXT level's
schedule groups do the per-url merge (schedule.py _combine_partials_group)
and the deferred dir is read alongside as frontier input.  Semantics must
be EXACTLY the combined plan's: engine ≡ oracle, and partials ≡ combined
run for run for visited sets, links, and scheduled/deferred accounting."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from crawler_uni_ray.oracle import crawl_oracle
from crawler_uni_ray.pipelines.crawl import CrawlConfig, CrawlEngine

from test_fold_retrim import write_dict_corpus
from test_random_graphs import DOMAIN, random_corpus


def _cfg(corpus_dir, ckpt, partials: bool, **kw):
    base = dict(
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
        frontier_partials=partials,
    )
    base.update(kw)
    return CrawlConfig(**base)


def _run(corpus_dir, ckpt, partials: bool, **kw):
    eng = CrawlEngine(_cfg(corpus_dir, ckpt, partials, **kw))
    eng.run()
    return eng


def _partials_engaged(ckpt: str) -> bool:
    """At least one committed level published a partials-format frontier."""
    for mf in glob.glob(os.path.join(ckpt, "level_*", "manifest.json")):
        with open(mf) as f:
            if json.load(f).get("frontier_format") == "partials":
                return True
    return False


@pytest.mark.parametrize("seed", [24, 48])
def test_frontier_partials_conformance(ray_session, tmp_path, seed):
    corpus = random_corpus(seed, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )

    eng = _run(corpus_dir, str(tmp_path / "partials"), partials=True)
    assert eng.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in eng.all_links_sorted().take_all()]
    assert links == oracle.sorted_links
    assert _partials_engaged(eng.cfg.ckpt_dir), (
        "frontier_partials path never ran — test setup no longer triggers it"
    )
    # the published frontier really is partial rows (combine-input schema)
    pf = glob.glob(
        os.path.join(eng.cfg.ckpt_dir, "level_0000", "frontier_next", "*.parquet")
    )
    assert pf and "__cnt" in pq.ParquetFile(pf[0]).schema_arrow.names

    # partials ≡ combined, level by level (scheduled/deferred accounting;
    # n_frontier_next intentionally differs — partial rows vs unique urls)
    ref = _run(corpus_dir, str(tmp_path / "combined"), partials=False)
    assert ref.visited_depth() == oracle.visited_depth
    assert [
        (m.level, m.n_scheduled, m.n_deferred) for m in eng.metrics
    ] == [(m.level, m.n_scheduled, m.n_deferred) for m in ref.metrics]


def test_frontier_partials_unsalted_and_unfolded(ray_session, tmp_path):
    """The partials combine must hold in EVERY schedule variant: no hot
    hosts (schedule_level_fused) and the two-stage salted plan
    (fold_retrim=False → schedule_level_fused_salted)."""
    corpus = random_corpus(31, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )
    cold = _run(
        corpus_dir, str(tmp_path / "cold"), partials=True, skew_threshold=None
    )
    assert cold.visited_depth() == oracle.visited_depth
    assert _partials_engaged(cold.cfg.ckpt_dir)

    twostage = _run(
        corpus_dir, str(tmp_path / "twostage"), partials=True, fold_retrim=False
    )
    assert twostage.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in twostage.all_links_sorted().take_all()]
    assert links == oracle.sorted_links


def test_frontier_partials_mixed_small_levels(ray_session, tmp_path):
    """Mixed checkpoints: big levels publish partials, small levels combine
    driver-side and publish combined frontiers — formats interleave within
    one crawl and every reader resolves through the manifest record."""
    corpus = random_corpus(42, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )
    eng = _run(corpus_dir, str(tmp_path / "mixed"), partials=True, small_level_rows=6)
    assert eng.visited_depth() == oracle.visited_depth
    fmts = set()
    for mf in glob.glob(os.path.join(eng.cfg.ckpt_dir, "level_*", "manifest.json")):
        with open(mf) as f:
            fmts.add(json.load(f).get("frontier_format", "combined"))
    assert fmts == {"partials", "combined"}, (
        f"expected BOTH formats in one crawl, saw {fmts}"
    )


def test_frontier_partials_on_manifest_backend(ray_session, tmp_path):
    """The partials hand-off (frontier parts + deferred side-dir + format
    record) must hold on the object-store manifest backend too."""
    corpus = random_corpus(27, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )
    eng = _run(corpus_dir, str(tmp_path / "m"), partials=True, storage="manifest")
    assert eng.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in eng.all_links_sorted().take_all()]
    assert links == oracle.sorted_links
    assert _partials_engaged(eng.cfg.ckpt_dir)


def test_frontier_partials_resume(ray_session, tmp_path):
    """Kill after two levels, resume with a FRESH engine: the resumed run
    reads the last committed level's partials + deferred dir through the
    manifest format record and finishes ≡ oracle."""
    corpus = random_corpus(56, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )
    ckpt = str(tmp_path / "ckpt")
    partial = _run(corpus_dir, ckpt, partials=True, max_levels=2)
    assert partial.committed_levels() == [0, 1]
    assert _partials_engaged(ckpt)

    resumed = CrawlEngine(_cfg(corpus_dir, ckpt, partials=True))
    resumed.resume()
    assert resumed.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in resumed.all_links_sorted().take_all()]
    assert links == oracle.sorted_links


def test_frontier_partials_resume_requires_budget(ray_session, tmp_path):
    """A partials checkpoint resumed without a budget must fail loudly ON
    THE DISTRIBUTED PATH — silently fetching un-combined duplicate rows
    would be wrong (small_level_rows=0 here forces that path)."""
    corpus = random_corpus(56, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    ckpt = str(tmp_path / "ckpt")
    _run(corpus_dir, ckpt, partials=True, max_levels=2)
    bad = CrawlEngine(_cfg(corpus_dir, ckpt, partials=True, budget=None))
    with pytest.raises(ValueError, match="frontier PARTIALS"):
        bad.resume()


def test_frontier_partials_small_resume_budget_free(ray_session, tmp_path):
    """ADVICE r4: a partials checkpoint whose next level fits the DRIVER
    fast path resumes budget-free — the whole-frame combine_frontier_pandas
    needs no schedule groupby.  Equivalence witness: the same budget-free
    resume from an identical-prefix COMBINED-format checkpoint visits the
    exact same urls at the same depths."""
    corpus = random_corpus(56, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    resumed = {}
    for fmt, partials in (("partials", True), ("combined", False)):
        ckpt = str(tmp_path / f"ckpt_{fmt}")
        _run(corpus_dir, ckpt, partials=partials, max_levels=2)
        eng = CrawlEngine(
            _cfg(
                corpus_dir,
                ckpt,
                partials=partials,
                budget=None,
                small_level_rows=100_000,  # every level takes the driver path
            )
        )
        eng.resume()  # must NOT raise for either format
        resumed[fmt] = eng
    assert resumed["partials"].visited_depth() == resumed["combined"].visited_depth()
    a = [r["url"] for r in resumed["partials"].all_links_sorted().take_all()]
    b = [r["url"] for r in resumed["combined"].all_links_sorted().take_all()]
    assert a == b
