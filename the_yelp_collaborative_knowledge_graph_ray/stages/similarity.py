"""Similarity search over the ``embeddings`` table (list<float> column).

Approximate-nearest-neighbor building blocks for a training-data engine:

* :func:`brute_force_topk` — exact cosine top-k: the (small) query matrix is
  broadcast via ``ray.put``; every batch of the corpus does ONE numpy matmul
  against it and emits its local top-k per query; a per-query
  ``groupby.map_groups`` merge yields the global top-k. This is the
  map-side-combine pattern (local top-k before the shuffle moves only
  ``k * n_queries`` rows per block, not the full score matrix).
* :func:`ivf_topk` — IVF-style scale path: corpus vectors are bucketed by
  nearest centroid (k-means on a driver-side sample, broadcast centroids);
  queries probe only ``n_probe`` nearest buckets. Same output schema;
  recall < 1 by construction, measured against the brute-force baseline in
  tests (not oracle-matched — approximate by design).

Scoring mirrors the reference's all-pairs cosine + row-argmax mapper
(``Code/UtilityFunctions/category_mappings.py:84-98``) with the decision rule
generalized from top-1 to top-k and made deterministic: order by
(rounded score desc, vec_id asc).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _to_matrix(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = b["vec_id"].to_numpy()
    mat = np.asarray(
        b["embedding"].combine_chunks().to_numpy(zero_copy_only=False).tolist(),
        dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


class _LocalTopK:
    """Batch scorer: local top-k of this batch's vectors for every query."""

    def __init__(self, queries_ref, k: int, exclude_query_ids: bool):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q_ids, self.q_mat = q
        self.k = k
        self.exclude = exclude_query_ids

    def __call__(self, b: pa.Table) -> pa.Table:
        ids, mat = _to_matrix(b)
        if self.exclude:
            keep = ~np.isin(ids, self.q_ids)
            ids, mat = ids[keep], mat[keep]
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        scores = np.round(self.q_mat @ mat.T, 6)  # (n_queries, batch)
        out_q, out_v, out_s = [], [], []
        k = min(self.k, len(ids))
        for qi, q_id in enumerate(self.q_ids):
            s = scores[qi]
            # deterministic local top-k: (rounded score desc, vec_id asc) —
            # the same order the global merge and the SQL window use, so
            # boundary ties resolve identically at every level
            order = np.lexsort((ids, -s))[:k]
            out_q.extend([int(q_id)] * k)
            out_v.extend(int(x) for x in ids[order])
            out_s.extend(s[order].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})


def _merge_topk(k: int):
    def merge(g: pa.Table) -> pa.Table:
        s = g["cosine"].to_numpy()
        v = g["vec_id"].to_numpy()
        # deterministic: rounded score desc, then vec_id asc
        order = np.lexsort((v, -s))[:k]
        n = len(order)
        return pa.table({
            "query_id": g["query_id"].take(pa.array(order)),
            "vec_id": pa.array(v[order], pa.int64()),
            "cosine": pa.array(s[order], pa.float64()),
            "rank": pa.array(np.arange(1, n + 1), pa.int64())})
    return merge


def load_queries(embeddings: ray.data.Dataset,
                 n_queries: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """First n vec_ids as the query set (driver-side tiny read)."""
    qb = embeddings.filter(
        expr=f"vec_id < {n_queries}").to_arrow_refs()
    tabs = [ray.get(r) for r in qb]
    tab = pa.concat_tables([t for t in tabs if t.num_rows])
    ids, mat = _to_matrix(tab)
    order = np.argsort(ids)
    return ids[order], mat[order]


def brute_force_topk(embeddings: ray.data.Dataset, k: int = 10,
                     n_queries: int = 8,
                     concurrency: int = 4) -> ray.data.Dataset:
    """Exact cosine top-k of every corpus vector (query ids excluded) for
    each of the first ``n_queries`` vectors. Output: (query_id, vec_id,
    cosine, rank), sorted by (query_id, rank)."""
    q = load_queries(embeddings, n_queries)
    from ..functions.broadcast import broadcast_map_batches
    local = broadcast_map_batches(
        embeddings, lambda: _LocalTopK(q, k, True),
        batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)
    merged = local.groupby("query_id").map_groups(
        _merge_topk(k), batch_format="pyarrow")
    return merged.sort(["query_id", "rank"])


# --------------------------------------------------------------------------
# IVF scale path
# --------------------------------------------------------------------------

def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 10,
            seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)),
                     replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            m = sample[assign == c]
            if len(m):
                v = m.mean(axis=0)
                n = np.linalg.norm(v) or 1.0
                cent[c] = v / n
    return cent


def ivf_topk(embeddings: ray.data.Dataset, k: int = 10, n_queries: int = 8,
             n_clusters: int = 16, n_probe: int = 4, iters: int = 5,
             sample_n: int = 4096,
             concurrency: int = 4) -> ray.data.Dataset:
    """IVF-bucketed ANN with EXACT integer routing, so the whole index —
    training, routing, probing — is deterministic and SQL-twinnable
    (``queries._ivf_sql``), leaving only the final candidate cosine in the
    same round-to-1e-6 float idiom the green ``ann_topk_cosine`` twin uses:

    * coarse quantizer: fixed-point Lloyd k-means
      (``functions.kmeans.kmeans_fp``) trained on the deterministic
      low-id sample ``vec_id < sample_n`` — bounded and scale-safe, like
      the driver-sample trainer it replaces, but bit-reproducible;
    * corpus routing: integer squared-L2 argmin to the centroids (ties to
      the lowest cluster id), the same ``_assign`` the trainer uses;
    * query probing: integer squared-L2 to the centroids, ``n_probe``
      lowest (ties to the lowest cluster id);
    * candidate scoring: exact cosine over the probed buckets, rounded to
      1e-6, top-k by (cosine desc, vec_id).

    Output schema matches :func:`brute_force_topk`."""
    from ..functions.kmeans import _assign, _fp_matrix, kmeans_fp
    q_ids, q_mat = load_queries(embeddings, n_queries)
    sample = embeddings.filter(expr=f"vec_id < {sample_n}")
    _asg, cents = kmeans_fp(sample, k=n_clusters, iters=iters)

    # query probe: integer L2 over the RAW fixed-point query vectors
    qb = embeddings.filter(expr=f"vec_id < {n_queries}").to_arrow_refs()
    qtab = pa.concat_tables([t for t in (ray.get(r) for r in qb)
                             if t.num_rows])
    qtab = qtab.take(pa.array(np.argsort(qtab["vec_id"].to_numpy())))
    qfp = _fp_matrix(qtab, "embedding")
    d2 = ((qfp[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probed_sets = [set(np.argsort(row, kind="stable")[:n_probe].tolist())
                   for row in d2]
    ref = ray.put((q_ids, q_mat, cents, probed_sets))

    class ProbeScorer:
        def __init__(self):
            self.q_ids, self.q_mat, self.cents, self.probed = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids, mat = _to_matrix(b)
            keep = ~np.isin(ids, self.q_ids)
            out_q, out_v, out_s = [], [], []
            if keep.any():
                bucket = _assign(_fp_matrix(b, "embedding")[keep],
                                 self.cents)
                ids, mat = ids[keep], mat[keep]
                for qi, q_id in enumerate(self.q_ids):
                    sel = np.isin(bucket, list(self.probed[qi]))
                    if not sel.any():
                        continue
                    s = np.round(self.q_mat[qi] @ mat[sel].T, 6)
                    cand = ids[sel]
                    kk = min(k, len(cand))
                    part = np.argpartition(-s, kk - 1)[:kk]
                    out_q.extend([int(q_id)] * kk)
                    out_v.extend(int(x) for x in cand[part])
                    out_s.extend(s[part].tolist())
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "vec_id": pa.array(out_v, pa.int64()),
                             "cosine": pa.array(out_s, pa.float64())})

    from ..functions.broadcast import broadcast_map_batches
    local = broadcast_map_batches(
        embeddings, ProbeScorer, batch_format="pyarrow", batch_size=4096,
        zero_copy_batch=True)
    merged = local.groupby("query_id").map_groups(
        _merge_topk(k), batch_format="pyarrow")
    return merged.sort(["query_id", "rank"])


CENTROID_SCALE = 1 << 20  # fixed-point scale for exact, order-proof sums


def grouped_centroids(embeddings: ray.data.Dataset, group_col: str,
                      vec_col: str = "embedding",
                      num_partitions: int = 4) -> ray.data.Dataset:
    """Per-group mean vector (centroids) in int64 fixed point — the vector
    analog of groupby-mean (SURVEY §2.5 A1) and the building block IVF-style
    indexes re-train with (stages/similarity.ivf_topk currently samples
    centroids; this is the exact full-corpus aggregation).

    Float vector sums are summation-order-dependent, so each component is
    floored to ``CENTROID_SCALE`` fixed point FIRST (floor, not round —
    numpy rounds half-even, DuckDB half-away) and the int64 sums commute.
    Per block, one (groups × dims) scatter-add partial crosses the shuffle
    in long (group, dim, s, n) form — corpus vectors never do. Output:
    (group, dim, centroid_fp, n) with centroid_fp = floor-div of exact
    sums, sorted by (group, dim)."""
    import pyarrow.compute as pc

    from ..functions.grouped import sorted_aggregate

    def partial(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("g", pa.int64()), ("dim", pa.int64()),
                                ("s", pa.int64()), ("n", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        g = pc.cast(b[group_col], pa.int64()).to_numpy(zero_copy_only=False)
        vec = b[vec_col]
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        d = len(vec[0])
        m = np.floor(vec.flatten().to_numpy(zero_copy_only=False)
                     .astype(np.float64) * CENTROID_SCALE) \
            .astype(np.int64).reshape(len(g), d)
        uniq, inv = np.unique(g, return_inverse=True)
        sums = np.zeros((len(uniq), d), np.int64)
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        k = len(uniq)
        return pa.table({
            "g": pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(cnt, d))}, schema=out_schema)

    partials = embeddings.map_batches(partial, batch_format="pyarrow",
                                      zero_copy_batch=True)
    agg = sorted_aggregate(partials, ["g", "dim"],
                           [("s", "sum"), ("n", "sum")],
                           ["g", "dim", "s", "n"], num_partitions)

    def finalize(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy()
        n = b["n"].to_numpy()
        return pa.table({"g": b["g"], "dim": b["dim"],
                         "centroid_fp": pa.array(s // n, pa.int64()),
                         "n": b["n"]})

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


RP_OUT_DIM = 8
RP_SEED = 0x5EED


def rp_sign_matrix(in_dim: int, out_dim: int = RP_OUT_DIM,
                   seed: int = RP_SEED) -> np.ndarray:
    """Deterministic Rademacher (+-1) projection matrix: sign(i, j) from
    one splitmix64 bit per cell, so any worker on any cluster shape
    reconstructs the identical matrix — the matrix is a pure function of
    (in_dim, out_dim, seed), never shipped."""
    from ..functions.sampling import splitmix64
    idx = np.arange(in_dim * out_dim, dtype=np.uint64) + np.uint64(seed)
    bits = splitmix64(idx) & np.uint64(1)
    return (bits.astype(np.int64) * 2 - 1).reshape(in_dim, out_dim)


def random_projection(embeddings: ray.data.Dataset,
                      out_dim: int = RP_OUT_DIM,
                      seed: int = RP_SEED) -> ray.data.Dataset:
    """Johnson-Lindenstrauss-style dimensionality reduction with a
    Rademacher sign matrix, in EXACT integers: each float32 component is
    fixed-pointed as floor(x * 1e6) (floor — both engines agree; round
    halves don't) and the projection is one int64 matmul per batch
    against the broadcast-free deterministic sign matrix. Stateless
    map_batches, zero shuffle; long-form output (vec_id, j, proj_c) so
    the DuckDB oracle can recompute it relationally.

    |x| <= ~1 so |proj_c| <= in_dim * 1e6 — five orders of magnitude of
    int64 headroom; a guard raises if an input violates the bound."""
    out_schema = pa.schema([("vec_id", pa.int64()), ("j", pa.int64()),
                            ("proj_c", pa.int64())])

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        emb = b["embedding"].combine_chunks()
        d = len(emb[0])
        m = np.floor(emb.flatten().to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1_000_000.0)
        if np.abs(m).max(initial=0.0) >= float(1 << 40):
            raise OverflowError("random_projection: component exceeds "
                                "fixed-point headroom")
        mat = m.astype(np.int64).reshape(b.num_rows, d)
        proj = mat @ rp_sign_matrix(d, out_dim, seed)
        vid = b["vec_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(np.repeat(vid, out_dim), pa.int64()),
            "j": pa.array(np.tile(np.arange(out_dim, dtype=np.int64),
                                  b.num_rows)),
            "proj_c": pa.array(proj.ravel(), pa.int64())},
            schema=out_schema)

    return embeddings.map_batches(block, batch_format="pyarrow",
                                  zero_copy_batch=True)


def label_coherence(embeddings: ray.data.Dataset,
                    target_block_rows: int = 8192) -> "pa.Table":
    """Embedding label-coherence metric: exact pairwise cosine sums split
    into same-label vs cross-label pairs — (n_intra, sum_intra_fp,
    n_inter, sum_inter_fp) with each pair's cosine rounded ONCE to 1e-6
    fixed point (int64 sums are summation-order-independent). A healthy
    labeled embedding space has mean intra >> mean inter; the evaluation
    card an embedding-model upgrade is judged on.

    Distribution shape: the dedup layer's blocked all-pairs engine —
    normalized blocks in the object store, one stateless task per block
    pair emitting ONE partial row, a constant-key integer sum. All-pairs
    is O(N²) by definition; past corpus scale the same fold runs over a
    deterministic hash sample (sampling.sample_hash upstream).
    """
    from ..functions.grouped import sorted_aggregate
    from .dedup import _load_matrix

    def norm_keep_label(b: pa.Table) -> pa.Table:
        ids, mat = _load_matrix(b)
        return pa.table({
            "vec_id": pa.array(ids.astype(np.int64)),
            "label": pc.cast(b["label"], pa.int64()),
            "embedding": pa.array(list(mat), pa.list_(pa.float64()))})

    n = embeddings.count()
    num_blocks = max(1, -(-n // target_block_rows))
    refs = embeddings.map_batches(norm_keep_label, batch_format="pyarrow",
                                  zero_copy_batch=True) \
        .repartition(num_blocks).to_arrow_refs()

    def load(ref):
        t = ray.get(ref)
        ids = t["vec_id"].to_numpy()
        lab = t["label"].to_numpy()
        mat = np.asarray(t["embedding"].combine_chunks()
                         .to_numpy(zero_copy_only=False).tolist(),
                         dtype=np.float64)
        return ids, lab, mat

    def fold(b: pa.Table) -> pa.Table:
        ni = si = ne = se = 0
        for i, j in zip(b["i"].to_pylist(), b["j"].to_pylist()):
            ida, la, ma = load(refs[i])
            idb, lb, mb = load(refs[j])
            s = np.rint(ma @ mb.T * 1_000_000.0).astype(np.int64)
            mask = (ida[:, None] < idb[None, :]) if i == j \
                else np.ones_like(s, dtype=bool)
            same = la[:, None] == lb[None, :]
            mi = mask & same
            me = mask & ~same
            ni += int(mi.sum()); si += int(s[mi].sum())
            ne += int(me.sum()); se += int(s[me].sum())
        return pa.table({"__g": pa.array([0], pa.int64()),
                         "n_intra": pa.array([ni], pa.int64()),
                         "sum_intra_fp": pa.array([si], pa.int64()),
                         "n_inter": pa.array([ne], pa.int64()),
                         "sum_inter_fp": pa.array([se], pa.int64())})

    B = len(refs)
    pairs = ray.data.from_items(
        [{"i": i, "j": j} for i in range(B) for j in range(i, B)])
    return sorted_aggregate(
        pairs.map_batches(fold, batch_format="pyarrow", batch_size=1),
        ["__g"],
        [("n_intra", "sum"), ("sum_intra_fp", "sum"),
         ("n_inter", "sum"), ("sum_inter_fp", "sum")],
        ["__g", "n_intra", "sum_intra_fp", "n_inter", "sum_inter_fp"],
        1).map_batches(
        lambda b: b.select(["n_intra", "sum_intra_fp",
                            "n_inter", "sum_inter_fp"]),
        batch_format="pyarrow", zero_copy_batch=True)


def filtered_topk(embeddings: ray.data.Dataset, k: int = 10,
                  n_queries: int = 8, label: int = 3,
                  concurrency: int = 4) -> ray.data.Dataset:
    """Metadata-FILTERED vector search — the practical vector-db query
    shape ("nearest neighbors among vectors WHERE label = L"): exact
    cosine top-k restricted to the predicate's corpus slice. The filter
    runs BEFORE scoring inside the same streaming pass (predicate
    pushdown for vector search — an index-side post-filter would scan k/
    selectivity times more); queries come from the unfiltered corpus.
    Output schema matches :func:`brute_force_topk`."""
    q = load_queries(embeddings.drop_columns(["label"]), n_queries)
    ref = ray.put(q)

    def pre(b: pa.Table) -> pa.Table:
        m = pc.equal(pc.cast(b["label"], pa.int64()),
                     pa.scalar(label, pa.int64()))
        return b.filter(m).select(["vec_id", "embedding"])

    corpus = embeddings.map_batches(pre, batch_format="pyarrow",
                                    zero_copy_batch=True)
    from ..functions.broadcast import broadcast_map_batches
    local = broadcast_map_batches(
        corpus, lambda: _LocalTopK(ref, k, True),
        batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)
    merged = local.groupby("query_id").map_groups(
        _merge_topk(k), batch_format="pyarrow")
    return merged.sort(["query_id", "rank"])


def mmr_topk(embeddings: ray.data.Dataset, k_pool: int = 20,
             k_out: int = 5, n_queries: int = 8,
             concurrency: int = 4) -> pa.Table:
    """Maximal-marginal-relevance diversified retrieval (Carbonell &
    Goldstein 1998) — the re-ranking stage between vector search and a
    RAG/training-data consumer: from each query's exact top-``k_pool``
    pool, greedily pick ``k_out`` results maximizing
    λ·sim(q,c) − (1−λ)·max_{s∈S} sim(c,s) with λ = 1/2, so twice the
    score is the EXACT integer ``simq_fp − max_pair_fp`` (cosines
    rounded once to 1e-6 fixed point, ties to the lowest vec_id) — a
    deterministic, oracle-gateable MMR, which float implementations
    are not.

    Scale shape: the corpus-sized work is the distributed top-pool
    (:func:`brute_force_topk`); the greedy loop runs on the driver over
    a BOUNDED n_queries × k_pool candidate set (the standard re-ranker
    contract). Output: (query_id, step, vec_id)."""
    pool = brute_force_topk(embeddings, k=k_pool, n_queries=n_queries,
                            concurrency=concurrency).to_pandas()
    need = pa.array(sorted(set(pool["vec_id"].astype(int))), pa.int64())
    need_ref = ray.put(need)

    def pick(b: pa.Table) -> pa.Table:
        m = pc.is_in(pc.cast(b["vec_id"], pa.int64()),
                     value_set=ray.get(need_ref))
        return b.filter(m).select(["vec_id", "embedding"])

    cand = pa.concat_tables(
        [ray.get(r) for r in embeddings.map_batches(
            pick, batch_format="pyarrow",
            zero_copy_batch=True).to_arrow_refs()])
    ids, mat = _to_matrix(cand)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    pair_fp = np.rint(mat @ mat.T * 1_000_000.0).astype(np.int64)
    pos = {int(v): i for i, v in enumerate(ids)}

    rows_q, rows_s, rows_v = [], [], []
    for qid, g in pool.groupby("query_id"):
        cand_ids = g["vec_id"].astype(int).to_numpy()
        simq = np.rint(g["cosine"].to_numpy() * 1e6).astype(np.int64)
        idx = np.array([pos[int(v)] for v in cand_ids])
        selected: list[int] = []
        remaining = np.ones(len(cand_ids), bool)
        for step in range(1, k_out + 1):
            if step == 1:
                score = simq.copy()
            else:
                sel_idx = [pos[v] for v in selected]
                mp = pair_fp[np.ix_(idx, sel_idx)].max(axis=1)
                score = simq - mp
            score_masked = np.where(remaining, score, np.int64(-2**62))
            best = int(np.lexsort((cand_ids, -score_masked))[0])
            selected.append(int(cand_ids[best]))
            remaining[best] = False
            rows_q.append(int(qid))
            rows_s.append(step)
            rows_v.append(int(cand_ids[best]))
    return pa.table({"query_id": pa.array(rows_q, pa.int64()),
                     "step": pa.array(rows_s, pa.int64()),
                     "vec_id": pa.array(rows_v, pa.int64())})
