"""Distributed logistic regression == sequential reference, exactly.

The trainer's claim (functions/logreg.py) is bit-identical weights under
any blocking because the only cross-block reduction is an integer sum of
per-ROW quantized gradients. Verified here at two different block sizes
against the sequential numpy twin.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from the_yelp_collaborative_knowledge_graph_ray.functions.logreg import (
    logreg_train,
    logreg_train_local,
)


def _toy(n=200, d=8, seed=7):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    w_true = rng.normal(size=d)
    y = (x @ w_true + 0.1 * rng.normal(size=n) > 0).astype(np.int64)
    return x, y


def _dataset(x, y, blocks):
    tables = []
    for part in np.array_split(np.arange(len(y)), blocks):
        tables.append(pa.table({
            "embedding": pa.array([x[i].tolist() for i in part],
                                  pa.list_(pa.float32())),
            "label": pa.array(y[part], pa.int32())}))
    return ray.data.from_arrow(tables)


@pytest.mark.parametrize("blocks", [1, 7])
def test_matches_sequential_any_blocking(ray_session, blocks):
    x, y = _toy()
    ds = _dataset(x, y, blocks)
    table, stats = logreg_train(ds, iters=5)
    got = table["weight_fp"].to_numpy()
    want = logreg_train_local(x.astype(np.float64), (y % 2).astype(float),
                              iters=5)
    assert (got == want).all()
    assert stats["n"] == len(y)


def test_learns_separable(ray_session):
    x, y = _toy()
    ds = _dataset(x, y, 3)
    _, stats = logreg_train(ds, iters=10)
    # final-iteration training accuracy on a near-separable toy problem
    assert stats["n_correct"] / stats["n"] > 0.8
