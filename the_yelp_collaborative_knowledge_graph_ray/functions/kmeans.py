"""Distributed Lloyd k-means over an embedding column — in EXACT integer
arithmetic, so the distributed run is bit-identical to a sequential one.

Float k-means is doubly nondeterministic at cluster scale: centroid means
depend on summation order, and near-tie assignments flip with them. Here
both problems are removed (the same trick as functions/pagerank and
stages/similarity.grouped_centroids):

* vectors are floored ONCE to 2^20 fixed point (int64);
* assignment = argmin of the INTEGER squared L2 distance
  Σ_j (x_j − c_j)² (d·(2^21)²·dims ≪ 2^63 — exact), ties to the lowest
  cluster id;
* the update is the fixed-point grouped mean: int64 component sums
  (commutative) and floor division.

Execution per round: centroids (k×d ints) are ``ray.put`` once; a
stateless ``map_batches`` assigns and emits per-(cluster, dim) partial
sums (map-side combined — ≤ k·d rows per block); one small sort-aggregate
reduces them; the driver folds the k×d result into the next round's
centroid matrix (empty clusters keep their centroid). The corpus is
scanned once per round and never shuffled.

Relation to the rest of the engine: `stages/dedup.semantic_dedup` uses a
bounded-SAMPLE k-means on the driver (SemDeDup's cheap variant); this is
the full-corpus trainer you would refresh those centroids (or an IVF
index's coarse quantizer, `stages/similarity.ivf_topk`) with.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .grouped import sorted_aggregate

FP_SCALE = 1 << 20


def _fp_matrix(b: pa.Table, vec_col: str) -> np.ndarray:
    vec = b[vec_col]
    if isinstance(vec, pa.ChunkedArray):
        vec = vec.combine_chunks()
    d = len(vec[0])
    return np.floor(vec.flatten().to_numpy(zero_copy_only=False)
                    .astype(np.float64) * FP_SCALE) \
        .astype(np.int64).reshape(-1, d)


def _assign(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin integer squared L2 per row, ties to the lowest cluster id.
    ||x−c||² = ||x||² − 2x·c + ||c||²; the cross term is exact in int64
    for fp-scaled embeddings (|x·c| ≤ d·2^42 ≪ 2^63)."""
    xx = np.einsum("ij,ij->i", m, m)
    cc = np.einsum("ij,ij->i", cents, cents)
    d2 = xx[:, None] - 2 * (m @ cents.T) + cc[None, :]
    return d2.argmin(axis=1).astype(np.int64)  # argmin takes the first min


def kmeans_fp(embeddings: ray.data.Dataset, k: int = 8, iters: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding",
              num_partitions: int = 4
              ) -> tuple[ray.data.Dataset, np.ndarray]:
    """Returns ``(assignments, centroids_fp)``: a (vec_id, cluster) Dataset
    sorted by id, and the final k×d int64 fixed-point centroid matrix.
    Deterministic init: the k vectors with the lowest ids."""
    seed_rows = embeddings.sort(id_col).limit(k)
    cents = _fp_matrix(pa.Table.from_pylist(seed_rows.take_all()), vec_col)

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(b: pa.Table) -> pa.Table:
            out_schema = pa.schema([("c", pa.int64()), ("dim", pa.int64()),
                                    ("s", pa.int64()), ("n", pa.int64())])
            if b.num_rows == 0:
                return out_schema.empty_table()
            cn = ray.get(ref)
            m = _fp_matrix(b, vec_col)
            a = _assign(m, cn)
            kk, d = cn.shape
            sums = np.zeros((kk, d), np.int64)
            np.add.at(sums, a, m)
            cnt = np.bincount(a, minlength=kk).astype(np.int64)
            seen = np.flatnonzero(cnt)
            return pa.table({
                "c": pa.array(np.repeat(seen, d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                        len(seen))),
                "s": pa.array(sums[seen].ravel()),
                "n": pa.array(np.repeat(cnt[seen], d))}, schema=out_schema)

        agg = sorted_aggregate(
            embeddings.map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True),
            ["c", "dim"], [("s", "sum"), ("n", "sum")],
            ["c", "dim", "s", "n"], num_partitions)
        rows = pa.Table.from_pylist(agg.take_all())  # ≤ k·d ints
        nxt = cents.copy()  # empty clusters keep their centroid
        if rows.num_rows:
            ci = rows["c"].to_numpy()
            di = rows["dim"].to_numpy()
            nxt[ci, di] = rows["s"].to_numpy() // rows["n"].to_numpy()
        cents = nxt

    final_ref = ray.put(cents)

    def assign_out(b: pa.Table) -> pa.Table:
        cn = ray.get(final_ref)
        a = _assign(_fp_matrix(b, vec_col), cn)
        return pa.table({id_col: pc.cast(b[id_col], pa.int64()),
                         "cluster": pa.array(a)})

    out = embeddings.map_batches(assign_out, batch_format="pyarrow",
                                 zero_copy_batch=True).sort(id_col)
    return out, cents
