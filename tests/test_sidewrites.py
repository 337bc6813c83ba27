"""Idempotency of the fused level's side-writes.

The single-execution level design (pipelines/crawl.py) relies on every
mid-stream side-write being safe under Ray task retries: a retried task
re-runs the SAME deterministic input group, so deterministic file names +
tmp→rename must yield exactly one copy of each artifact, bit-identical.
These tests exercise that invariant directly (a retry is just the writer
called twice with the same input).
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from crawler_uni_ray.pipelines.crawl import (
    _deferred_partials_writer,
    _side_write_results,
)
from crawler_uni_ray.stages.frontier import frontier_table
from crawler_uni_ray.state.storage import PosixStorage


def _results_table() -> pa.Table:
    return pa.table(
        {
            "url": ["https://a.example.com/x", "https://b.example.com/y"],
            "host": ["a.example.com", "b.example.com"],
            "depth": pa.array([1, 1], pa.int32()),
            "fetch_status": pa.array([1, 0], pa.int32()),
            "n_outlinks": pa.array([1, 0], pa.int32()),
            "text": ["hello", ""],
            "outlinks": pa.array(
                [["https://a.example.com/z"], []], pa.list_(pa.string())
            ),
        }
    )


def test_results_side_write_idempotent(ray_session, tmp_path):
    d = str(tmp_path / "results")
    os.makedirs(d)
    t = _results_table()
    # grab the inner writer without running a Ray pipeline: map over the
    # same block twice, as a retried task would
    import ray.data

    ds = ray.data.from_arrow(t)
    slim = _side_write_results(ds, d, PosixStorage())
    out1 = slim.to_pandas()
    files1 = sorted(os.listdir(d))
    contents1 = {f: pq.read_table(os.path.join(d, f)) for f in files1}
    # second pass over the identical input = the retry
    slim2 = _side_write_results(ray.data.from_arrow(t), d, PosixStorage())
    out2 = slim2.to_pandas()
    files2 = sorted(os.listdir(d))
    assert files1 == files2  # no duplicate blocks under retry
    for f in files2:
        assert pq.read_table(os.path.join(d, f)).equals(contents1[f])
    pd.testing.assert_frame_equal(out1, out2)
    assert not [f for f in files2 if f.endswith(".tmp")]  # no tmp litter


def test_deferred_partials_writer_idempotent(ray_session, tmp_path):
    d = str(tmp_path / "deferred")
    os.makedirs(d)
    w = _deferred_partials_writer(d, dedup_buckets=4, store=PosixStorage())
    urls = [f"https://h{i % 3}.example.com/p{i}" for i in range(20)]
    t = frontier_table(urls)
    w(t, 7)
    files1 = sorted(os.listdir(d))
    contents1 = {f: pq.read_table(os.path.join(d, f)) for f in files1}
    w(t, 7)  # the retry: same group content, same schedule bucket
    files2 = sorted(os.listdir(d))
    assert files1 == files2
    for f in files2:
        assert pq.read_table(os.path.join(d, f)).equals(contents1[f])
    # every row landed in its url-hash dedup bucket exactly once
    total = sum(c.num_rows for c in contents1.values())
    assert total == len(urls)
    assert not [f for f in files2 if f.endswith(".tmp")]
    # the salted re-trim namespace (sched_bucket >= n_buckets) must not
    # collide with stage-1 files for the same dedup bucket
    w(t.slice(0, 5), 4 + 7)
    files3 = sorted(os.listdir(d))
    assert set(files1) < set(files3)
    assert all("-s00011" in f for f in sorted(set(files3) - set(files1)))
