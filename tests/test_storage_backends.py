"""Storage seam (state/storage.py): the crawl engine's durability protocol
must hold on BOTH backends — POSIX (rename commits) and the object-store
manifest protocol (write-then-manifest, no directory rename) — with
identical conformance, resume, and side-write-idempotency behavior.
VERDICT r3 next-round #4."""

import json
import os

import pyarrow as pa
import pytest

from crawler_uni_ray.oracle import crawl_oracle
from crawler_uni_ray.pipelines.crawl import CrawlConfig, CrawlEngine
from crawler_uni_ray.state.storage import ManifestStorage, PosixStorage, make_storage

DOMAIN = "example.com"


# ----------------------------------------------------------- unit: protocol
@pytest.mark.parametrize("kind", ["posix", "manifest"])
def test_staged_commit_is_atomic_and_exclusive(tmp_path, kind):
    """An uncommitted staged artifact is invisible; after commit, exactly
    the committed attempt's parts are visible."""
    st = make_storage(kind)
    final = str(tmp_path / "artifact")
    t = pa.table({"a": [1, 2, 3]})

    staged = st.begin_dir(final)
    import pyarrow.parquet as pq

    pq.write_table(t, os.path.join(staged, "part-0.parquet"))
    assert st.list_parts(final) == []  # not yet committed
    assert st.count_rows(final) == 0

    st.commit_dir(final, staged)
    assert len(st.list_parts(final)) == 1
    assert st.count_rows(final) == 3
    got = st.read_table(final, t.schema)
    assert got.equals(t)


def test_manifest_commit_hides_orphan_attempts(tmp_path):
    """The object-store failure mode: a crashed earlier attempt leaves
    parts behind.  Readers resolve through the manifest, so the orphans
    are unreachable — never duplicated into a read."""
    st = ManifestStorage()
    final = str(tmp_path / "artifact")
    t = pa.table({"a": [1, 2, 3]})
    import pyarrow.parquet as pq

    dead = st.begin_dir(final)  # attempt 1 "crashes" after writing
    pq.write_table(t, os.path.join(dead, "part-0.parquet"))

    staged = st.begin_dir(final)  # attempt 2 wins
    pq.write_table(t, os.path.join(staged, "part-0.parquet"))
    st.commit_dir(final, staged)

    assert st.count_rows(final) == 3  # not 6: the orphan is invisible
    assert os.path.basename(os.path.dirname(st.list_parts(final)[0])) == (
        os.path.basename(staged)
    )
    # the commit record itself is inspectable
    m = json.load(open(os.path.join(final, ManifestStorage.MANIFEST)))
    assert m["files"] == ["part-0.parquet"]


@pytest.mark.parametrize("kind", ["posix", "manifest"])
def test_write_part_idempotent_replay(tmp_path, kind):
    """A retried side-write task republished under the same deterministic
    name is a no-op — bit-identical dir, no tmp litter."""
    st = make_storage(kind)
    d = str(tmp_path / "side")
    st.prepare_side_dir(d)
    t = pa.table({"a": [1, 2]})
    st.write_part(d, "block-abc.parquet", t)
    before = {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}
    st.write_part(d, "block-abc.parquet", t)  # the replay
    after = {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}
    assert before == after
    assert [os.path.basename(f) for f in st.list_files(d)] == ["block-abc.parquet"]
    assert not any(f.endswith(".tmp") for f in os.listdir(d))


def test_manifest_storage_never_renames_directories(tmp_path, monkeypatch):
    """The seam's whole point: the manifest backend must stay correct on a
    store with no atomic directory rename.  Forbid dir-renames outright
    and run a staged commit."""
    st = ManifestStorage()
    real_rename = os.rename

    def guard(src, dst):
        assert not os.path.isdir(src), f"directory rename attempted: {src}"
        real_rename(src, dst)  # single-file publish emulates object PUT

    monkeypatch.setattr(os, "rename", guard)
    final = str(tmp_path / "artifact")
    staged = st.begin_dir(final)
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"a": [1]}), os.path.join(staged, "p.parquet"))
    st.commit_dir(final, staged)
    st.write_part(final, "side.parquet", pa.table({"a": [2]}))
    assert st.count_rows(final) == 1


# ------------------------------------------- integration: crawl conformance
def _run(corpus, ckpt, **kw):
    eng = CrawlEngine(
        CrawlConfig(domain=DOMAIN, ckpt_dir=ckpt, corpus_dict=corpus, **kw)
    )
    eng.run()
    return eng


@pytest.mark.parametrize("kind", ["posix", "manifest"])
def test_crawl_conformance_on_both_backends(ray_session, tiny_corpus, tmp_path, kind):
    """Full distributed crawl (budget → fused scheduler side-writes, results
    side-writes, frontier commits) through each backend ≡ oracle."""
    oracle = crawl_oracle(tiny_corpus, DOMAIN, max_per_host_per_level=2)
    eng = _run(
        tiny_corpus,
        str(tmp_path / f"ckpt_{kind}"),
        budget=2,
        small_level_rows=0,
        storage=kind,
    )
    assert eng.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in eng.all_links_sorted().take_all()]
    assert links == oracle.sorted_links


def test_resume_on_manifest_backend(ray_session, tiny_corpus, tmp_path):
    """Kill after level 1, resume with a FRESH engine on the manifest
    backend: the commit records gate exactly as on POSIX."""
    oracle = crawl_oracle(tiny_corpus, DOMAIN, max_per_host_per_level=2)
    ckpt = str(tmp_path / "ckpt")
    kw = dict(budget=2, small_level_rows=0, storage="manifest")
    partial = _run(tiny_corpus, ckpt, max_levels=2, **kw)
    assert partial.committed_levels() == [0, 1]

    resumed = CrawlEngine(
        CrawlConfig(domain=DOMAIN, ckpt_dir=ckpt, corpus_dict=tiny_corpus, **kw)
    )
    resumed.resume()
    assert resumed.visited_depth() == oracle.visited_depth
    links = [r["url"] for r in resumed.all_links_sorted().take_all()]
    assert links == oracle.sorted_links


def test_manifest_backend_results_have_manifest(ray_session, tiny_corpus, tmp_path):
    """Committed level artifacts on the manifest backend carry the commit
    record and resolve through it."""
    eng = _run(
        tiny_corpus,
        str(tmp_path / "ckpt"),
        max_levels=1,
        small_level_rows=0,
        storage="manifest",
    )
    res = os.path.join(eng.cfg.ckpt_dir, "level_0000", "results")
    assert os.path.isfile(os.path.join(res, ManifestStorage.MANIFEST))
    assert eng.store.count_rows(res) > 0


def test_default_backend_is_posix():
    cfg = CrawlConfig(domain=DOMAIN, ckpt_dir="/tmp/x")
    assert cfg.storage == "posix"
    assert type(make_storage(cfg.storage)) is PosixStorage
