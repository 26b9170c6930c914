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


def pq_search(emb: ray.data.Dataset, k: int = 10, n_queries: int = 8,
              m: int = PQ_M, kk: int = PQ_K, iters: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding"
              ) -> ray.data.Dataset:
    """Asymmetric-distance (ADC) search over PQ codes — the query half
    of IVF-PQ: each query precomputes an m×k lookup table of exact
    integer inner products against the codebooks, and scoring a vector
    is m table lookups instead of a d-dim dot product (the 16×
    compute/memory reduction that makes billion-vector search work).

    Everything integer: queries floor to the same 2^20 fixed point as
    the codebooks, LUT entries are int64 products, scores are int64
    sums — so the (approximate by construction) result is DETERMINISTIC
    under any blocking, and the pytest measures recall against the
    exact integer inner-product top-k. Output (query_id, vec_id,
    score_fp, rank)."""
    import pyarrow.compute as _pc

    codes_ds, books = pq_encode(emb, m=m, k=kk, iters=iters,
                                id_col=id_col, vec_col=vec_col)
    qtab = pa.Table.from_pylist(
        emb.filter(expr=f"{id_col} < {n_queries}").take_all())
    q_ids = qtab[id_col].to_numpy()
    q_fp = _fp_matrix(qtab, vec_col)
    order = np.argsort(q_ids)
    q_ids, q_fp = q_ids[order], q_fp[order]
    d = q_fp.shape[1]
    bounds = [(i * d // m, (i + 1) * d // m) for i in range(m)]
    # LUT[qi, i, c] = <q_sub_i, book_i[c]>  (exact int64)
    lut = np.stack([q_fp[:, lo:hi] @ books[i].T
                    for i, (lo, hi) in enumerate(bounds)], axis=1)
    ref = ray.put((q_ids, lut))

    def score(b: pa.Table) -> pa.Table:
        qi, lt = ray.get(ref)
        ids = _pc.cast(b[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = ~np.isin(ids, qi)
        codes = np.stack([b[f"code_{i}"].to_numpy(zero_copy_only=False)
                          for i in range(m)], axis=1)[keep]
        ids = ids[keep]
        out_q, out_v, out_s = [], [], []
        if len(ids):
            for j, q_id in enumerate(qi):
                s = np.zeros(len(ids), np.int64)
                for i in range(m):
                    s += lt[j, i][codes[:, i]]
                kloc = min(k, len(ids))
                order = np.lexsort((ids, -s))[:kloc]
                out_q.extend([int(q_id)] * kloc)
                out_v.extend(int(x) for x in ids[order])
                out_s.extend(int(x) for x in s[order])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score_fp": pa.array(out_s, pa.int64())})

    local = codes_ds.map_batches(score, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        s = g["score_fp"].to_numpy(zero_copy_only=False)
        v = g["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -s))[:k]
        return pa.table({
            "query_id": g["query_id"].take(pa.array(order)),
            "vec_id": pa.array(v[order], pa.int64()),
            "score_fp": pa.array(s[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64))})

    return local.groupby("query_id").map_groups(
        merge, batch_format="pyarrow").sort(["query_id", "rank"])
