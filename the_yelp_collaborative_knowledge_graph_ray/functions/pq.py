"""Product quantization (PQ) — compressed vector codes for ANN at scale.

The other half of the IVF-PQ index (Jégou et al. 2011, "Product
quantization for nearest neighbor search"; `stages/similarity.ivf_topk`
is the IVF half): split the d-dim embedding into m subspaces, train a
small codebook per subspace, and store each vector as m small codes —
64 float32 dims become 4 bytes, the compression that lets a 100-TB
vector corpus live in RAM-speed storage.

Everything inherits the engine's exact-integer k-means
(`functions/kmeans.kmeans_fp`): per-subspace codebooks train with the
fixed-point distributed Lloyd trainer (bit-reproducible under any
blocking), and the final encode pass is one stateless ``map_batches``
computing integer argmin distances against the broadcast codebooks —
so the code table is DETERMINISTIC, retry-safe, and pytest-verified
blocking-invariant. (At true corpus scale codebooks train on a bounded
sample — swap the training input for ``Dataset.limit``; the encode
pass is the corpus-sized part either way.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .kmeans import _fp_matrix, kmeans_fp

PQ_M = 4      # subspaces
PQ_K = 16     # codes per subspace


def _slice_ds(emb: ray.data.Dataset, lo: int, hi: int,
              id_col: str, vec_col: str) -> ray.data.Dataset:
    def cut(b: pa.Table) -> pa.Table:
        vec = b[vec_col]
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        d = len(vec[0])
        x = vec.flatten().to_numpy(zero_copy_only=False) \
            .reshape(-1, d)[:, lo:hi]
        return pa.table({
            id_col: pc.cast(b[id_col], pa.int64()),
            vec_col: pa.array(list(x), pa.list_(pa.float32()))})

    return emb.map_batches(cut, batch_format="pyarrow")


def pq_encode(emb: ray.data.Dataset, m: int = PQ_M, k: int = PQ_K,
              iters: int = 5, id_col: str = "vec_id",
              vec_col: str = "embedding"
              ) -> tuple[ray.data.Dataset, list[np.ndarray]]:
    """Returns ``(codes, codebooks)``: a (vec_id, code_0..code_{m-1})
    Dataset sorted by id, and the per-subspace int64 fixed-point
    codebook matrices."""
    d = len(emb.limit(1).take_all()[0][vec_col])
    bounds = [(i * d // m, (i + 1) * d // m) for i in range(m)]

    books = []
    for lo, hi in bounds:
        _assignments, cents = kmeans_fp(
            _slice_ds(emb, lo, hi, id_col, vec_col), k=k, iters=iters,
            id_col=id_col, vec_col=vec_col)
        books.append(cents)
    books_ref = ray.put(books)

    def encode(b: pa.Table) -> pa.Table:
        bks = ray.get(books_ref)
        x = _fp_matrix(b, vec_col)
        cols = {id_col: pc.cast(b[id_col], pa.int64())}
        for i, (lo, hi) in enumerate(bounds):
            sub = x[:, lo:hi]
            cn = bks[i]
            # exact integer squared distances; ties -> lowest code
            d2 = ((sub[:, None, :].astype(np.int64)
                   - cn[None, :, :]) ** 2).sum(axis=2)
            cols[f"code_{i}"] = pa.array(np.argmin(d2, axis=1)
                                         .astype(np.int64))
        return pa.table(cols)

    codes = emb.map_batches(encode, batch_format="pyarrow") \
        .sort(id_col)
    return codes, books
