"""Fused level windows ("level pipelining", CrawlConfig.fused_levels > 1):
up to W consecutive distributed levels run as ONE streaming execution —
level k+1's schedule shuffle overlaps level k's extract and the per-level
execution fixed cost is paid once per window.  The seen check moves INTO
the in-window schedule groups (exact by the all-to-all barrier chain) and
the previous level's deferred partials are read there.  Semantics must be
EXACTLY the per-level plan's: engine ≡ oracle, and fused ≡ unfused run for
run for visited sets, links, and scheduled/deferred accounting."""

import glob
import json
import os

import pytest

from crawler_uni_ray.oracle import crawl_oracle
from crawler_uni_ray.pipelines.crawl import CrawlConfig, CrawlEngine

from test_fold_retrim import write_dict_corpus
from test_random_graphs import DOMAIN, random_corpus


def _cfg(corpus_dir, ckpt, fused: int, **kw):
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
        frontier_partials=True,
        fused_levels=fused,
    )
    base.update(kw)
    return CrawlConfig(**base)


def _run(corpus_dir, ckpt, fused: int, **kw):
    eng = CrawlEngine(_cfg(corpus_dir, ckpt, fused, **kw))
    eng.run()
    return eng


def _windows_engaged(ckpt: str) -> bool:
    """At least one committed level ran inside a multi-level window."""
    for mf in glob.glob(os.path.join(ckpt, "level_*", "manifest.json")):
        with open(mf) as f:
            w = json.load(f)["metrics"].get("extra", {}).get("fused_window")
        if w and w[1] > w[0]:
            return True
    return False


def _accounting(eng):
    return [(m.level, m.n_scheduled, m.n_deferred) for m in eng.metrics]


@pytest.mark.parametrize("seed", [24, 48])
def test_fused_window_conformance(ray_session, tmp_path, seed):
    corpus = random_corpus(seed, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )

    eng = _run(corpus_dir, str(tmp_path / "fused"), fused=3)
    assert eng.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in eng.all_links_sorted().take_all()]
    assert links == oracle.sorted_links
    assert _windows_engaged(eng.cfg.ckpt_dir), (
        "no multi-level window ran — test setup no longer triggers fusing"
    )

    # fused ≡ per-level, level by level (committed level set included:
    # trailing never-ran window levels must be elided, not committed)
    ref = _run(corpus_dir, str(tmp_path / "perlevel"), fused=1)
    assert ref.visited_depth() == oracle.visited_depth
    assert _accounting(eng) == _accounting(ref)
    assert eng.committed_levels() == ref.committed_levels()


def test_fused_window_unsalted_and_unfolded(ray_session, tmp_path):
    """The window must hold in EVERY schedule variant: no hot hosts
    (schedule_level_fused) and the two-stage salted plan
    (fold_retrim=False → schedule_level_fused_salted)."""
    corpus = random_corpus(31, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )
    cold = _run(corpus_dir, str(tmp_path / "cold"), fused=3, skew_threshold=None)
    assert cold.visited_depth() == oracle.visited_depth
    assert _windows_engaged(cold.cfg.ckpt_dir)

    twostage = _run(corpus_dir, str(tmp_path / "twostage"), fused=3, fold_retrim=False)
    assert twostage.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in twostage.all_links_sorted().take_all()]
    assert links == oracle.sorted_links


def test_fused_window_manifest_backend(ray_session, tmp_path):
    """Window side-writes (per-level results staging, deferred nb-parts,
    frontier partials, host counts) must hold on the object-store manifest
    backend too."""
    corpus = random_corpus(27, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )
    eng = _run(corpus_dir, str(tmp_path / "m"), fused=3, storage="manifest")
    assert eng.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in eng.all_links_sorted().take_all()]
    assert links == oracle.sorted_links
    assert _windows_engaged(eng.cfg.ckpt_dir)


def test_fused_window_resume_at_window_boundary(ray_session, tmp_path):
    """Stop after one full window, resume with a FRESH engine still in
    window mode: the resumed run reads the boundary level's partials +
    deferred dir and finishes ≡ oracle."""
    corpus = random_corpus(56, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )
    ckpt = str(tmp_path / "ckpt")
    partial = _run(corpus_dir, ckpt, fused=2, max_levels=2)
    assert partial.committed_levels() == [0, 1]
    assert _windows_engaged(ckpt)

    resumed = CrawlEngine(_cfg(corpus_dir, ckpt, fused=2))
    resumed.resume()
    assert resumed.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in resumed.all_links_sorted().take_all()]
    assert links == oracle.sorted_links


def test_fused_window_robots_and_none_policy(ray_session, tmp_path):
    """Robots gating must stay exact inside a window: in-window levels
    robots-filter the streaming outlink partials, while the previous
    level's deferred partials are read back UN-refiltered — correct
    because deferred rows passed the robots gate before they were ever
    scheduled (robots are static per run).  Also exercises the
    ``priority_policy="none"`` combine kernel in the window hook."""
    corpus = random_corpus(39, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    robots = {
        "a.rnd.test": "User-agent: *\nDisallow: /p1",
        "b.rnd.test": "User-agent: *\nDisallow: /",
    }
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, robots=robots,
        priority_policy="none",
    )
    eng = _run(
        corpus_dir, str(tmp_path / "r"), fused=3,
        robots=robots, priority_policy="none",
    )
    assert eng.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in eng.all_links_sorted().take_all()]
    assert links == oracle.sorted_links
    assert _windows_engaged(eng.cfg.ckpt_dir)


def test_fused_window_max_pages_window_granular(ray_session, tmp_path):
    """``max_pages`` is checked between windows (documented): the run
    stops early, every committed level is still exactly the oracle's
    BFS level, and the scheduled total reached the cap."""
    corpus = random_corpus(44, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )
    full_depths = set(oracle.visited_depth.values())
    eng = _run(corpus_dir, str(tmp_path / "mp"), fused=2, max_pages=5)
    committed = eng.committed_levels()
    assert len(committed) < len(full_depths), "cap did not stop the crawl"
    assert sum(m.n_scheduled for m in eng.metrics) >= 5
    want = {
        u: d for u, d in oracle.visited_depth.items() if d in set(committed)
    }
    assert eng.visited_depth() == want


def _window_extents(ckpt: str) -> set[tuple[int, int]]:
    out = set()
    for mf in glob.glob(os.path.join(ckpt, "level_*", "manifest.json")):
        with open(mf) as f:
            w = json.load(f)["metrics"].get("extra", {}).get("fused_window")
        if w:
            out.add(tuple(w))
    return out


def test_adaptive_window_size_policy(ray_session, tmp_path):
    """_window_size: static width when the row target is unset; under a
    target, width shrinks as the entry count (extrapolated by the last
    observed growth ratio) fills the budget — never below 1, never above
    the fused_levels cap, never past max_levels."""
    from crawler_uni_ray.pipelines.crawl import LevelMetrics

    eng = CrawlEngine(
        _cfg(str(tmp_path / "c"), str(tmp_path / "k"), fused=4, max_levels=100)
    )
    assert eng._window_size(0, 10) == 4  # fused_window_rows unset → static

    eng.cfg.fused_window_rows = 1000
    # no history → cold-start prior assumes the clamp MAX growth (×8): a
    # BFS frontier grows geometrically, so the first window stays narrow
    # (300 + est 2400 busts 1000 → W=1)
    assert eng._window_size(0, 300) == 1
    assert eng._window_size(0, 5) == 3  # 5+40+320 fits; +2560 busts
    assert eng._window_size(0, 2000) == 1  # one over-target level still runs
    eng.cfg.max_levels = 2
    assert eng._window_size(1, 5) == 1  # never past max_levels
    eng.cfg.max_levels = 100

    # growth history: last level tripled → 300, est 900 already busts 1000
    eng.metrics.append(
        LevelMetrics(
            level=0, n_frontier=100, n_candidates=0, n_scheduled=0,
            n_deferred=0, n_fetched=0, n_fetch_miss=0, n_outlinks=0,
            n_frontier_next=300,
        )
    )
    assert eng._window_size(1, 300) == 1
    # shrinking frontier (ratio 1/3, clamped ≥ 0.125) → windows widen
    eng.metrics[-1] = LevelMetrics(
        level=0, n_frontier=300, n_candidates=0, n_scheduled=0,
        n_deferred=0, n_fetched=0, n_fetch_miss=0, n_outlinks=0,
        n_frontier_next=100,
    )
    assert eng._window_size(1, 600) == 4  # 600+200+67+22 = 889 ≤ 1000 → full cap
    del eng  # seen actors GC with the session


def test_adaptive_window_conformance(ray_session, tmp_path):
    """Adaptive widths must not change semantics: a tiny row target
    (every window degenerates toward W=1) and a huge one (full fused cap)
    both ≡ oracle, and the committed window extents actually differ."""
    corpus = random_corpus(24, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )
    narrow = _run(
        corpus_dir, str(tmp_path / "narrow"), fused=4, fused_window_rows=1
    )
    wide = _run(
        corpus_dir, str(tmp_path / "wide"), fused=4, fused_window_rows=10_000_000
    )
    for eng in (narrow, wide):
        assert eng.visited_depth() == oracle.visited_depth
        links = [r["url"] for r in eng.all_links_sorted().take_all()]
        assert links == oracle.sorted_links
    ext_n = _window_extents(narrow.cfg.ckpt_dir)
    ext_w = _window_extents(wide.cfg.ckpt_dir)
    assert all(b - a == 0 for a, b in ext_n), f"narrow target fused: {ext_n}"
    assert any(b - a == 3 for a, b in ext_w), f"wide target never hit cap: {ext_w}"
    assert _accounting(narrow) == _accounting(wide)


def test_fused_window_resume_from_interrupted_window(ray_session, tmp_path):
    """A crash mid-window leaves the later levels uncommitted (staged
    results, side parts, no manifests).  Resume must drop the orphans and
    re-run from the last committed level — simulated by deleting the
    manifests of a finished run's tail levels."""
    corpus = random_corpus(48, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )
    ckpt = str(tmp_path / "ckpt")
    full = _run(corpus_dir, ckpt, fused=3)
    levels = full.committed_levels()
    assert len(levels) >= 3
    for k in levels[2:]:  # "crash" after the first two committed levels
        os.remove(os.path.join(ckpt, f"level_{k:04d}", "manifest.json"))

    resumed = CrawlEngine(_cfg(corpus_dir, ckpt, fused=3))
    resumed.resume()
    assert resumed.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in resumed.all_links_sorted().take_all()]
    assert links == oracle.sorted_links
