"""crawler_uni_ray — a Ray-Data-native URL-frontier + fetch-scheduler engine.

Built from scratch on ray.data (Dataset / map_batches over zero-copy Arrow
batches, actor pools for stateful stages).  Reproduces the crawl semantics of
the reference crawler (/root/reference/crawler.py) — URL canonicalization,
scope predicate, link extraction, dedup-at-dequeue, BFS-level ordering,
sorted link output — while adding the scale machinery the reference lacks:
sharded bloom/exact URL-seen filters, per-host politeness budgets, robots
gating, skew-salted scheduling, per-level checkpoint/lineage and resume.

Nothing in this package calls ``ray.init()``; callers own the Ray session.
"""

__version__ = "0.1.0"
