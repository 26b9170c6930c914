"""Covariance accumulation is blocking-invariant; power iteration finds
the numpy eigh top component."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from the_yelp_collaborative_knowledge_graph_ray.functions.pca import (
    FP,
    covariance_long,
    pca_top_component,
)


def _emb_ds(x, blocks):
    tables = []
    for part in np.array_split(np.arange(len(x)), blocks):
        tables.append(pa.table({
            "embedding": pa.array([x[i].tolist() for i in part],
                                  pa.list_(pa.float32()))}))
    return ray.data.from_arrow(tables)


def _toy(n=300, d=6, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, d))
    base[:, 0] *= 5.0  # dominant direction
    return base.astype(np.float32)


def test_covariance_blocking_invariant(ray_session):
    x = _toy()
    a = covariance_long(_emb_ds(x, 1)).to_pylist()
    b = covariance_long(_emb_ds(x, 7)).to_pylist()
    assert a == b


def test_covariance_matches_numpy(ray_session):
    x = _toy()
    got = covariance_long(_emb_ds(x, 4)).to_pandas()
    xf = np.floor(x.astype(np.float64) * FP).astype(np.int64)
    n = len(xf)
    want = n * (xf.T @ xf) - np.outer(xf.sum(0), xf.sum(0))
    for _, r in got.iterrows():
        assert r["cov_n2"] == want[int(r["i"]), int(r["j"])]


def test_top_component_matches_eigh(ray_session):
    x = _toy()
    comp = pca_top_component(_emb_ds(x, 5)).to_pandas()
    v = comp["component_fp"].to_numpy() / FP
    xf = np.floor(x.astype(np.float64) * FP).astype(np.int64)
    n = len(xf)
    C = (n * (xf.T @ xf)
         - np.outer(xf.sum(0), xf.sum(0))).astype(np.float64)
    w, vecs = np.linalg.eigh(C)
    top = vecs[:, -1]
    cos = abs(float(v @ top) / (np.linalg.norm(v)
                                * np.linalg.norm(top)))
    assert cos > 0.999
    share = comp["eigenvalue_share_fp"].iloc[0] / 1e6
    assert share == pytest.approx(w[-1] / np.trace(C), abs=1e-3)
