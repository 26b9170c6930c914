"""Product quantization: deterministic codes, working compression."""

import numpy as np
import pyarrow as pa

import ray.data

from the_yelp_collaborative_knowledge_graph_ray.functions.kmeans import (
    FP_SCALE,
)
from the_yelp_collaborative_knowledge_graph_ray.functions.pq import (
    pq_encode,
)


def _emb_ds(x, blocks):
    tables = []
    for part in np.array_split(np.arange(len(x)), blocks):
        tables.append(pa.table({
            "vec_id": pa.array(part, pa.int64()),
            "embedding": pa.array([x[i].tolist() for i in part],
                                  pa.list_(pa.float32()))}))
    return ray.data.from_arrow(tables)


def _toy(n=200, d=16, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(8, d)) * 2
    x = centers[rng.integers(0, 8, n)] + 0.1 * rng.normal(size=(n, d))
    return x.astype(np.float32)


def test_codes_blocking_invariant(ray_session):
    x = _toy()
    a, _ = pq_encode(_emb_ds(x, 1), m=4, k=8, iters=3)
    b, _ = pq_encode(_emb_ds(x, 5), m=4, k=8, iters=3)
    assert a.to_pandas().equals(b.to_pandas())


def test_reconstruction_beats_mean(ray_session):
    x = _toy()
    codes, books = pq_encode(_emb_ds(x, 3), m=4, k=8, iters=3)
    df = codes.to_pandas().sort_values("vec_id")
    xf = np.floor(x.astype(np.float64) * FP_SCALE)
    d = x.shape[1]
    bounds = [(i * d // 4, (i + 1) * d // 4) for i in range(4)]
    recon = np.zeros_like(xf)
    for i, (lo, hi) in enumerate(bounds):
        recon[:, lo:hi] = books[i][df[f"code_{i}"].to_numpy()]
    err_pq = ((xf - recon) ** 2).mean()
    err_mean = ((xf - xf.mean(0)) ** 2).mean()
    assert err_pq < 0.25 * err_mean  # codes carry real signal


def test_adc_search_recall_and_determinism(ray_session):
    from the_yelp_collaborative_knowledge_graph_ray.functions.pq import (
        pq_search,
    )
    x = _toy(n=300)
    a = pq_search(_emb_ds(x, 2), k=10, n_queries=4, iters=3).to_pandas()
    b = pq_search(_emb_ds(x, 6), k=10, n_queries=4, iters=3).to_pandas()
    assert a.equals(b)  # blocking-invariant
    # recall vs EXACT integer inner-product top-10
    xf = np.floor(x.astype(np.float64) * FP_SCALE).astype(np.int64)
    hits = total = 0
    for q in range(4):
        s = xf @ xf[q]
        s[:4] = np.iinfo(np.int64).min  # exclude query ids
        true = set(np.lexsort((np.arange(len(s)), -s))[:10].tolist())
        got = set(a[a.query_id == q]["vec_id"].tolist())
        hits += len(true & got)
        total += 10
    assert hits / total >= 0.5
