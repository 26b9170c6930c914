"""Distributed logistic-regression training — full-batch gradient descent
that is BIT-IDENTICAL to a sequential run under any blocking or shuffle.

The scale problem this solves: a 100-TB feature table cannot sit on one
node, and naive data-parallel GD is nondeterministic because float
gradient sums depend on block boundaries and reduce order, so two runs
(or a retried task) produce different models. The engine's standard fix
applies (functions/kmeans, functions/pagerank): make the only
cross-block reduction an INTEGER sum.

Per iteration:
* current weights ``w`` (float64, d+1 with bias) broadcast via
  ``ray.put``;
* each block computes per-row scores with a per-row reduction
  (``np.add.reduce(X·w, axis=1)`` — each row's sum touches only that
  row's d+1 terms, so the value is independent of how rows are blocked),
  sigmoid, and the per-ROW gradient contribution quantized to 2^20
  fixed point — quantizing per row (not per block) is what makes the
  partial sums blocking-invariant;
* blocks emit (dim, grad_fp_sum, n, n_correct) partials — d+3 ints per
  block, the only thing that crosses the wire;
* ONE tiny sort-aggregate reduces them; the driver dequantizes the mean
  gradient and steps ``w ← w − lr·ḡ``.

The corpus is scanned once per iteration and never shuffled. Exactness
is verified by ``tests/test_logreg.py``: the distributed trainer equals
a sequential numpy reference weight-for-weight (int fixed point) at any
block size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .grouped import sorted_aggregate

GRAD_SCALE = 1 << 20
W_SCALE = 1 << 20


def _xy(b: pa.Table, vec_col: str, label_col: str
        ) -> tuple[np.ndarray, np.ndarray]:
    vec = b[vec_col]
    if isinstance(vec, pa.ChunkedArray):
        vec = vec.combine_chunks()
    d = len(vec[0])
    x = vec.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.float64).reshape(-1, d)
    xb = np.concatenate([x, np.ones((len(x), 1))], axis=1)
    y = (pc.cast(b[label_col], pa.int64()).to_numpy(zero_copy_only=False)
         % 2).astype(np.float64)
    return xb, y


def logreg_train(emb: ray.data.Dataset, vec_col: str = "embedding",
                 label_col: str = "label", iters: int = 10,
                 lr: float = 1.0) -> tuple[pa.Table, dict]:
    """Train P(label odd | embedding). Returns (weights table, stats):
    weights as (dim, weight_fp) with dim = d for the bias, weight_fp =
    round(w·2^20); stats = {"n": rows, "n_correct": final-iteration
    correct count at threshold 0.5}."""
    w = None
    stats = {"n": 0, "n_correct": 0}

    for _ in range(iters):
        w_ref = ray.put(w)

        def grads(b: pa.Table) -> pa.Table:
            xb, y = _xy(b, vec_col, label_col)
            ww = ray.get(w_ref)
            if ww is None:
                ww = np.zeros(xb.shape[1])
            s = np.add.reduce(xb * ww, axis=1)
            p = 1.0 / (1.0 + np.exp(-s))
            gq = np.round((p - y)[:, None] * xb * GRAD_SCALE) \
                .astype(np.int64)
            correct = int(((p >= 0.5) == (y == 1.0)).sum())
            d1 = xb.shape[1]
            return pa.table({
                "dim": pa.array(np.arange(d1, dtype=np.int64)),
                "g_fp": pa.array(gq.sum(axis=0)),
                "n": pa.array(np.r_[np.int64(len(y)),
                                    np.zeros(d1 - 1, np.int64)]),
                "n_correct": pa.array(np.r_[np.int64(correct),
                                            np.zeros(d1 - 1,
                                                     np.int64)])})

        agg = sorted_aggregate(
            emb.map_batches(grads, batch_format="pyarrow"),
            ["dim"], [("g_fp", "sum"), ("n", "sum"),
                      ("n_correct", "sum")],
            ["dim", "g_fp", "n", "n_correct"], 1).to_pandas()
        agg = agg.sort_values("dim")
        n = int(agg["n"].sum())
        stats = {"n": n, "n_correct": int(agg["n_correct"].sum())}
        g = agg["g_fp"].to_numpy().astype(np.float64) / GRAD_SCALE / n
        if w is None:
            w = np.zeros(len(g))
        w = w - lr * g

    wq = np.round(w * W_SCALE).astype(np.int64)
    table = pa.table({"dim": pa.array(np.arange(len(wq),
                                                dtype=np.int64)),
                      "weight_fp": pa.array(wq)})
    return table, stats


def logreg_train_local(x: np.ndarray, y: np.ndarray, iters: int = 10,
                       lr: float = 1.0) -> np.ndarray:
    """Sequential reference with IDENTICAL quantization — the pytest
    twin of :func:`logreg_train`."""
    xb = np.concatenate([x.astype(np.float64),
                         np.ones((len(x), 1))], axis=1)
    w = np.zeros(xb.shape[1])
    for _ in range(iters):
        s = np.add.reduce(xb * w, axis=1)
        p = 1.0 / (1.0 + np.exp(-s))
        gq = np.round((p - y)[:, None] * xb * GRAD_SCALE) \
            .astype(np.int64)
        g = gq.sum(axis=0).astype(np.float64) / GRAD_SCALE / len(y)
        w = w - lr * g
    return np.round(w * W_SCALE).astype(np.int64)
