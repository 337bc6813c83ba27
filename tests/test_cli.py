"""End-to-end CLI test: ``python -m crawler_uni_ray`` mirrors the
reference's main() (crawler.py:111-135) — crawl a corpus, write a sorted
unique links.txt byte-identical to the oracle's artifact."""

import os
import subprocess
import sys

from crawler_uni_ray.corpus import TINY, build_pages_table, write_corpus_parquet
from crawler_uni_ray.oracle import crawl_oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_end_to_end(tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    write_corpus_parquet(TINY, corpus_dir, num_shards=4)
    out = str(tmp_path / "links.txt")
    ckpt = str(tmp_path / "ckpt")
    # own Ray session in a subprocess — the pytest session fixture keeps its
    # own; CLI must not disturb it (and proves the module runs standalone)
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "crawler_uni_ray",
            "--domain",
            "https://example.com",  # scheme stripped like crawler.py:121-122
            "--corpus",
            corpus_dir,
            "--ckpt",
            ckpt,
            "--out",
            out,
            "--fetch-mode",
            "partitioned",
            "--num-corpus-shards",
            "4",
            # 4+: the partitioned-fetch group stage reserves 2 CPUs per
            # task — a 2-CPU cluster starves the rest of the pipeline
            "--num-cpus",
            "4",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "RAY_DEDUP_LOGS": "0"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Crawling completed" in proc.stdout
    assert "level 0:" in proc.stdout  # per-level progress surface

    tbl = build_pages_table(TINY)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    oracle = crawl_oracle(corpus, "example.com")
    want = "".join(f"{u}\n" for u in oracle.sorted_links)
    with open(out, encoding="utf-8") as f:
        assert f.read() == want  # byte-identical links.txt


def test_cli_requires_corpus(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-m", "crawler_uni_ray", "--domain", "x.com", "--ckpt", str(tmp_path)],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 2 and "--corpus is required" in proc.stderr
