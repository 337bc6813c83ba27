"""User-extension surface (SURVEY.md §2.9): the reference is a closed
class (/root/reference/crawler.py:10-100, no hooks); here every pipeline
stage is a named, independently-testable, replaceable ``Step``.

A ``Step`` is anything with ``apply(ds: Dataset) -> Dataset``; UDF hooks
are plain ``map_batches`` callables wrapped by :class:`BatchStep`.
``Pipeline`` composes steps left-to-right and is itself a Step.  The crawl
loop's canonical per-level chain is exposed by :func:`crawl_level_steps`
so users can insert/replace stages (e.g. a custom quality filter between
robots gating and scheduling).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Protocol, runtime_checkable

from ray.data import Dataset


@runtime_checkable
class Step(Protocol):
    name: str

    def apply(self, ds: Dataset) -> Dataset: ...


@dataclass
class FnStep:
    """Step from a Dataset → Dataset function."""

    name: str
    fn: Callable[[Dataset], Dataset]

    def apply(self, ds: Dataset) -> Dataset:
        return self.fn(ds)


@dataclass
class BatchStep:
    """Step from a per-batch UDF (the map_batches hook point)."""

    name: str
    fn: Callable
    batch_format: str = "pyarrow"
    batch_size: int | None = None

    def apply(self, ds: Dataset) -> Dataset:
        kwargs = {"batch_format": self.batch_format}
        if self.batch_size is not None:
            kwargs["batch_size"] = self.batch_size
        return ds.map_batches(self.fn, **kwargs)


@dataclass
class Pipeline:
    name: str
    steps: list = field(default_factory=list)

    def apply(self, ds: Dataset) -> Dataset:
        for step in self.steps:
            ds = step.apply(ds)
        return ds

    def replaced(self, name: str, step) -> "Pipeline":
        """A copy with the named step swapped out."""
        return Pipeline(
            self.name,
            [step if s.name == name else s for s in self.steps],
        )

    def inserted_after(self, name: str, step) -> "Pipeline":
        out = []
        for s in self.steps:
            out.append(s)
            if s.name == name:
                out.append(step)
        return Pipeline(self.name, out)


def crawl_level_steps(engine, budget=None) -> Pipeline:
    """The canonical per-level chain as named steps (mirrors
    CrawlEngine._run_level_big): canonicalize/scope live inside extract
    (outlinks are cleaned at emission); seen/robots/schedule here."""
    from ..stages.robots import robots_filter
    from ..stages.schedule import schedule_level
    from ..stages.seen_stage import seen_filter

    steps = [FnStep("seen-filter", lambda ds: seen_filter(ds, engine.seen))]
    if engine._robots_ref is not None:
        steps.append(
            FnStep("robots-gate", lambda ds: robots_filter(ds, engine._robots_ref))
        )
    steps.append(
        FnStep(
            "schedule",
            lambda ds: schedule_level(
                ds,
                budget if budget is not None else engine.cfg.budget,
                n_buckets=engine.cfg.n_buckets,
                n_salts=engine.cfg.n_salts,
                skew_threshold=engine.cfg.skew_threshold,
            ),
        )
    )
    return Pipeline("crawl-level", steps)
