"""Step-protocol composition (SURVEY.md §2.9) — pure structural tests."""

from dataclasses import dataclass

from crawler_uni_ray.pipelines.steps import FnStep, Pipeline


@dataclass
class _FakeDs:
    trace: tuple = ()


def _step(name):
    return FnStep(name, lambda ds, n=name: _FakeDs(ds.trace + (n,)))


def test_pipeline_applies_in_order():
    p = Pipeline("p", [_step("a"), _step("b"), _step("c")])
    assert p.apply(_FakeDs()).trace == ("a", "b", "c")


def test_replaced_and_inserted():
    p = Pipeline("p", [_step("a"), _step("b")])
    p2 = p.replaced("b", _step("B"))
    assert p2.apply(_FakeDs()).trace == ("a", "B")
    p3 = p.inserted_after("a", _step("x"))
    assert p3.apply(_FakeDs()).trace == ("a", "x", "b")
    # original untouched
    assert p.apply(_FakeDs()).trace == ("a", "b")
