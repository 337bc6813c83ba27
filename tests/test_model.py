"""Actor-pool linear inference stage (functions/model.py)."""

import numpy as np
import pytest
import ray
import ray.data

from crawler_uni_ray.functions.model import LinearScorer, score_linear


def test_score_linear_matches_numpy(ray_session):
    rng = np.random.default_rng(7)
    x = rng.integers(0, 100, size=(1000, 3))
    ds = ray.data.from_items(
        [{"id": i, "a": int(r[0]), "b": int(r[1]), "c": int(r[2])} for i, r in enumerate(x)]
    )
    w, b = [0.5, -1.25, 2.0], 3.5
    out = (
        score_linear(ds, w, b, ["a", "b", "c"], concurrency=(1, 2), batch_size=128)
        .to_pandas()
        .sort_values("id")
    )
    want = x @ np.array(w) + b
    np.testing.assert_allclose(out["score"].to_numpy(), want, rtol=0, atol=0)


def test_linear_scorer_rejects_shape_mismatch(ray_session):
    ref = ray.put((np.array([1.0, 2.0]), 0.0))
    with pytest.raises(ValueError):
        LinearScorer(ref, ["a", "b", "c"])
