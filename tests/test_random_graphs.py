"""Property-style conformance (SURVEY.md §5.3): seeded random link graphs
→ engine seen-set ≡ oracle seen-set, per-depth set equality, identical
sorted all_links.  Graphs are adversarial in shape (dangling links,
off-scope edges, cycles, self-links, duplicate hrefs) but deterministic
per seed."""

import random

import pytest

from crawler_uni_ray.oracle import crawl_oracle
from crawler_uni_ray.pipelines.crawl import CrawlConfig, CrawlEngine

DOMAIN = "rnd.test"


def random_corpus(seed: int, n_urls: int = 40) -> dict[str, bytes]:
    rng = random.Random(seed)
    hosts = [DOMAIN, f"a.{DOMAIN}", f"b.{DOMAIN}", "elsewhere.org"]
    urls = [f"https://{DOMAIN}"]  # the raw seed must exist sometimes
    for i in range(n_urls):
        host = rng.choice(hosts)
        urls.append(f"https://{host}/p{i}.html")
    corpus: dict[str, bytes] = {}
    for u in urls:
        if rng.random() < 0.15:
            continue  # dangling: linked but absent → fetch-miss
        n_links = rng.randrange(0, 6)
        anchors = []
        for _ in range(n_links):
            target = rng.choice(urls + [f"https://{DOMAIN}/missing{rng.randrange(99)}"])
            anchors.append(f'<a href="{target}">x</a>')
        if rng.random() < 0.3:
            anchors.append('<a href="#self">s</a>')
        if rng.random() < 0.3 and anchors:
            anchors.append(anchors[0])  # duplicate href
        html = "<html><body>" + "".join(anchors) + f"<p>page {u}</p></body></html>"
        corpus[u] = html.encode()
    return corpus


@pytest.mark.parametrize("seed", [1, 2, 3, 7])
def test_random_graph_conformance(ray_session, tmp_path, seed):
    corpus = random_corpus(seed)
    oracle = crawl_oracle(corpus, DOMAIN)
    eng = CrawlEngine(
        CrawlConfig(
            domain=DOMAIN, ckpt_dir=str(tmp_path / f"c{seed}"), corpus_dict=corpus
        )
    )
    eng.run()
    assert eng.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in eng.all_links_sorted().take_all()]
    assert links == oracle.sorted_links


@pytest.mark.parametrize("seed", [11, 13])
def test_random_graph_with_budget(ray_session, tmp_path, seed):
    corpus = random_corpus(seed, n_urls=60)
    oracle = crawl_oracle(corpus, DOMAIN, max_per_host_per_level=3)
    eng = CrawlEngine(
        CrawlConfig(
            domain=DOMAIN,
            ckpt_dir=str(tmp_path / f"c{seed}"),
            corpus_dict=corpus,
            budget=3,
        )
    )
    eng.run()
    assert eng.visited_depth() == oracle.visited_depth


@pytest.mark.parametrize("seed", [17, 23])
def test_random_graph_budget_salted_indegree(ray_session, tmp_path, seed):
    """The full [NR] scheduling stack on adversarial graphs: politeness
    budget + hot-host salting (skew_threshold=1 forces EVERY host through
    the fused salted scheduler's two-stage in-stream plan) + indegree
    priorities — distributed path only.  Engine ≡ oracle per-depth sets is
    the strongest semantic check the salted re-trim must pass."""
    corpus = random_corpus(seed, n_urls=60)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )
    eng = CrawlEngine(
        CrawlConfig(
            domain=DOMAIN,
            ckpt_dir=str(tmp_path / f"c{seed}"),
            corpus_dict=corpus,
            budget=2,
            skew_threshold=1,
            n_salts=4,
            priority_policy="indegree",
            small_level_rows=0,
        )
    )
    eng.run()
    assert eng.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in eng.all_links_sorted().take_all()]
    assert links == oracle.sorted_links


@pytest.mark.parametrize("seed", [19, 29, 37])
def test_random_graph_full_r4_stack(ray_session, tmp_path, seed):
    """The complete round-4 configuration on adversarial graphs: budget +
    forced salting + indegree priorities + frontier PARTIALS hand-off +
    fused level windows + the object-store manifest storage backend, over
    the hash-partitioned corpus with the aligned fetch — the exact
    headline-bench control plane.  Engine ≡ oracle per-depth sets and
    byte-equal sorted links."""
    from test_fold_retrim import write_dict_corpus

    corpus = random_corpus(seed, n_urls=60)
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree"
    )
    eng = CrawlEngine(
        CrawlConfig(
            domain=DOMAIN,
            ckpt_dir=str(tmp_path / f"c{seed}"),
            corpus_path=corpus_dir,
            fetch_mode="partitioned",
            num_corpus_shards=4,
            fetch_align_threshold=0,
            budget=2,
            skew_threshold=1,
            n_salts=4,
            priority_policy="indegree",
            small_level_rows=0,
            frontier_partials=True,
            fused_levels=3,
            storage="manifest",
        )
    )
    eng.run()
    assert eng.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in eng.all_links_sorted().take_all()]
    assert links == oracle.sorted_links


@pytest.mark.parametrize("seed", [29, 31])
def test_random_graph_multi_seed_full_stack(ray_session, tmp_path, seed):
    """Multi-seed crawl (sitemap-style seed lists) under the full headline
    control plane — budget + salting + indegree + frontier partials +
    fused windows + manifest storage + partitioned/aligned fetch.  Seeds
    mix hosts and include one dangling url (seed fetch-miss → silent
    empty, the M6 contract).  Engine ≡ oracle for the same seed list."""
    from test_fold_retrim import write_dict_corpus

    from crawler_uni_ray.urlnorm import is_in_scope

    corpus = random_corpus(seed, n_urls=60)
    present = [u for u in sorted(corpus) if is_in_scope(u, DOMAIN)]
    seeds = [present[0], present[len(present) // 2], present[-1],
             f"https://{DOMAIN}/dangling-seed.html"]
    corpus_dir = str(tmp_path / "corpus")
    write_dict_corpus(corpus, corpus_dir, num_shards=4)
    oracle = crawl_oracle(
        corpus, DOMAIN, max_per_host_per_level=2, priority_policy="indegree",
        seeds=seeds,
    )
    eng = CrawlEngine(
        CrawlConfig(
            domain=DOMAIN,
            ckpt_dir=str(tmp_path / f"c{seed}"),
            corpus_path=corpus_dir,
            fetch_mode="partitioned",
            num_corpus_shards=4,
            fetch_align_threshold=0,
            budget=2,
            skew_threshold=1,
            n_salts=4,
            priority_policy="indegree",
            small_level_rows=0,
            frontier_partials=True,
            fused_levels=3,
            storage="manifest",
            seeds=seeds,
        )
    )
    eng.run()
    assert eng.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in eng.all_links_sorted().take_all()]
    assert links == oracle.sorted_links
