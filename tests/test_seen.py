"""Seen-filter backends: bloom math + sharded actor fleet."""

import numpy as np

from crawler_uni_ray.state.seen import BloomFilter, ExactSet


def test_exact_set():
    s = ExactSet()
    assert list(s.contains(["a", "b"])) == [False, False]
    s.add(["a"])
    assert list(s.contains(["a", "b"])) == [True, False]


def test_bloom_no_false_negatives_and_low_fp():
    bf = BloomFilter(n_bits=1 << 20, k=7)
    urls = [f"https://h{i % 50}.com/p{i}" for i in range(20_000)]
    bf.add(urls)
    assert bf.contains(urls).all()  # no false negatives, ever
    probe = [f"https://other{i}.org/x{i}" for i in range(20_000)]
    fp = bf.contains(probe).mean()
    assert fp < 0.01, fp  # 1M bits / 20k keys @ k=7 → ~1e-4 expected


def test_sharded_seen_actors(ray_session):
    from crawler_uni_ray.state.seen import ShardedSeen

    seen = ShardedSeen(num_shards=3, backend="exact")
    urls = [f"https://x.com/p{i}" for i in range(100)]
    assert not seen.contains(urls).any()
    seen.add(urls[:50])
    mask = seen.contains(urls)
    assert mask[:50].all() and not mask[50:].any()
    # check_and_add is an atomic per-shard test-and-set
    fresh = seen.check_and_add(urls)
    assert (~fresh[:50]).all() and fresh[50:].all()
    assert seen.total_size() == 100
