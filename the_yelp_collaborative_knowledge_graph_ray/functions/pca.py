"""Distributed covariance matrix + PCA top component over embeddings.

The covariance accumulation is the d²-bounded reduction that makes PCA
viable at 100 TB: the corpus never shuffles — each block contributes ONE
d×d integer second-moment matrix plus d dimension sums (vectors floored
once to 2^20 fixed point, so the int64 partial sums are exact and
commute under any blocking/retry — the same trick as functions/kmeans).
The assembled matrix ``cov_n2[i,j] = n·Σxᵢxⱼ − ΣxᵢΣxⱼ`` is EXACT
integers, which is why it can be DuckDB-oracle-gated (long-form upper
triangle) — a float covariance would differ in the low bits by
summation order.

The top principal component is then a DRIVER-side power iteration on the
tiny d×d matrix (fixed 60 iterations, deterministic e₀ start, sign
normalized by the largest-|component| entry) — the O(corpus) work is all
in the one scan above. Verified against ``numpy.linalg.eigh`` in
``tests/test_pca.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .grouped import sorted_aggregate
from .kmeans import _fp_matrix

FP = 1 << 20


def covariance_long(emb: ray.data.Dataset, vec_col: str = "embedding",
                    num_partitions: int = 4) -> pa.Table:
    """Long-form exact covariance: (i, j, cov_n2) for i <= j, plus the
    driver-checked int64 overflow guard."""
    def partial(b: pa.Table) -> pa.Table:
        x = _fp_matrix(b, vec_col)
        d = x.shape[1]
        s2 = x.T @ x  # int64; 2^40 per term, safe to ~2^22 rows/block
        s1 = x.sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": pa.array(np.r_[iu, np.arange(d)], pa.int64()),
            "j": pa.array(np.r_[ju, np.full(d, -1)], pa.int64()),
            "sxy": pa.array(np.r_[s2[iu, ju], s1], pa.int64()),
            "n": pa.array(np.r_[np.full(len(iu), 0),
                                np.full(d, len(x))], pa.int64())})

    agg = sorted_aggregate(
        emb.map_batches(partial, batch_format="pyarrow"),
        ["i", "j"], [("sxy", "sum"), ("n", "sum")],
        ["i", "j", "sxy", "n"], num_partitions).to_pandas() \
        .sort_values(["i", "j"]).reset_index(drop=True)
    # (per-block group_by emits hash order; the d²-sized frame sorts on
    # the driver so output order is deterministic under any blocking)

    sums = agg[agg["j"] == -1].set_index("i")
    n = int(sums["n"].iloc[0]) if len(sums) else 0
    pairs = agg[agg["j"] >= 0]
    i = pairs["i"].to_numpy().astype(np.int64)
    j = pairs["j"].to_numpy().astype(np.int64)
    sxy = pairs["sxy"].to_numpy().astype(np.int64)
    s1 = sums["sxy"]
    cov = [n * int(v) - int(s1.loc[a]) * int(s1.loc[b])
           for a, b, v in zip(i, j, sxy)]
    for v in cov:
        if abs(v) >= 2**63:
            raise OverflowError("covariance_long: rescale FP")
    return pa.table({"i": pa.array(i), "j": pa.array(j),
                     "cov_n2": pa.array(cov, pa.int64())})


def pca_top_component(emb: ray.data.Dataset,
                      vec_col: str = "embedding",
                      iters: int = 40) -> pa.Table:
    """(dim, component_fp, eigenvalue_share_fp): top eigenvector of the
    exact integer covariance via an EXACT-INTEGER power iteration, so the
    result is hash-comparable to a DuckDB unrolled-CTE twin
    (``queries._pca_sql`` — round-4; the float/L2 iteration it replaces
    was rows-only):

    * Cq = floor(cov_n2 · 2^20 / max|cov_n2|) — one shared scaling so the
      per-step products fit int64 on both engines (Python ints here,
      HUGEINT intermediates in SQL);
    * v₀ = 2^20 (the all-ones direction), then ``iters`` rounds of
      w = Cq·v; v = floor(w · 2^20 / max|w|) — max-normalization instead
      of L2 (no sqrt, floor-exact; same trick as eigenvector_centrality);
    * sign fixed so the largest-|component| entry (ties: lowest dim) is
      positive; eigenvalue share = floor(10^6 · vᵀCv / (tr(C) · vᵀv)).

    Components are max-normalized 2^20 fixed point (largest |entry| =
    2^20) — direction identical to the L2-normalized eigenvector, so the
    ``tests/test_pca.py`` cosine check vs ``numpy.linalg.eigh`` is
    unaffected (cosine is scale-invariant). All driver arithmetic uses
    Python ints (arbitrary precision — vᵀCv overflows int64 by design);
    the O(corpus) work stays in the one covariance scan."""
    longf = covariance_long(emb, vec_col).to_pandas()
    d = int(longf["i"].max()) + 1 if len(longf) else 0
    C = [[0] * d for _ in range(d)]
    for a, b, x in zip(longf["i"], longf["j"], longf["cov_n2"]):
        C[int(a)][int(b)] = C[int(b)][int(a)] = int(x)
    m = max((abs(C[a][b]) for a in range(d) for b in range(d)), default=0)
    if m == 0:
        v = [0] * d
    else:
        Cq = [[(C[a][b] * FP) // m for b in range(d)] for a in range(d)]
        v = [FP] * d
        for _ in range(iters):
            w = [sum(Cq[a][b] * v[b] for b in range(d)) for a in range(d)]
            mw = max(abs(x) for x in w)
            if mw == 0:
                v = [0] * d
                break
            v = [(x * FP) // mw for x in w]
    k = max(range(d), key=lambda a: (abs(v[a]), -a), default=0)
    if d and v[k] < 0:
        v = [-x for x in v]
    lam_num = sum(v[a] * C[a][b] * v[b] for a in range(d) for b in range(d))
    tr = sum(C[a][a] for a in range(d))
    vtv = sum(x * x for x in v)
    share_fp = (10**6 * lam_num) // (tr * vtv) if tr > 0 and vtv > 0 else 0
    return pa.table({
        "dim": pa.array(np.arange(d, dtype=np.int64)),
        "component_fp": pa.array(v, pa.int64()),
        "eigenvalue_share_fp": pa.array(
            np.full(d, share_fp, np.int64))})
