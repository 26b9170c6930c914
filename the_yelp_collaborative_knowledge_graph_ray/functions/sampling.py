"""Deterministic hash-based sampling — reproducible row sampling at any scale.

A 100-TB curation run cannot use ``Dataset.random_sample`` for anything that
must be reproducible (train/eval splits, audit samples, A/B partitions):
re-runs, retries and resumes must select the SAME rows. The standard trick is
a keyed hash: keep a row iff ``u01(splitmix64(key)) < rate``. Properties:

* deterministic — same key, same verdict, on any cluster shape, forever;
* stateless and shuffle-free — a plain ``map_batches`` filter, each batch
  decided locally (contrast ``random_sample`` which is also per-block but
  non-reproducible, and ``limit`` which is order-dependent);
* composable — disjoint rate bands give disjoint splits (e.g. eval =
  ``u01 < 0.01``, train = ``u01 >= 0.01``) with no coordination.

splitmix64 (Steele et al., "Fast splittable pseudorandom number generators",
OOPSLA 2014) is used because it is a strong 64-bit mixer that is exactly
expressible BOTH as vectorized numpy uint64 arithmetic (wrap-around mul/add)
AND in ANSI-ish SQL via ``HUGEINT`` modular arithmetic — so the DuckDB oracle
reproduces the sample bit-for-bit (see ``queries._SPLITMIX_SQL``).

Reference parity: the reference pipeline subsamples with pandas
``DataFrame.sample`` (non-reproducible across partitionings); this is the
distributed-safe replacement.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
_TWO64 = float(2 ** 64)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array (wrapping)."""
    old = np.seterr(over="ignore")
    try:
        z = x.astype(np.uint64, copy=True) + _GOLDEN
        z = (z ^ (z >> np.uint64(30))) * _MIX1
        z = (z ^ (z >> np.uint64(27))) * _MIX2
        return z ^ (z >> np.uint64(31))
    finally:
        np.seterr(**old)


def hash_u01(keys: pa.Array | pa.ChunkedArray, seed: int = 0) -> np.ndarray:
    """Map an int64 key column to deterministic floats in [0, 1).

    ``seed`` shifts the keyspace (key XOR splitmix64(seed)) so independent
    samples of the same table are uncorrelated.
    """
    k = pc.cast(keys, pa.int64())
    if isinstance(k, pa.ChunkedArray):
        k = k.combine_chunks()
    x = k.to_numpy(zero_copy_only=False).view(np.uint64)
    if seed:
        x = x ^ splitmix64(np.array([seed], np.uint64))[0]
    return splitmix64(x) / _TWO64


def sample_hash(ds: ray.data.Dataset, key: str, rate: float,
                seed: int = 0) -> ray.data.Dataset:
    """Keep rows whose ``u01(hash(key)) < rate`` — a deterministic,
    shuffle-free Bernoulli sample keyed on ``key``."""
    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(hash_u01(b[key], seed) < rate))
    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def sample_stratified(ds: ray.data.Dataset, key: str, stratum: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      seed: int = 0) -> ray.data.Dataset:
    """Per-stratum deterministic sampling: row kept iff
    ``u01(hash(key)) < rates[stratum]``.

    ``rates`` is a SMALL dict (one entry per stratum value) captured in the
    task closure — broadcast once per task by Ray, never shuffled. This is
    the scale pattern for rebalancing skewed sources (e.g. downsample crawl
    dumps to 1%, keep curated sources at 100%) in one streaming pass.
    """
    def keep(b: pa.Table) -> pa.Table:
        u = hash_u01(b[key], seed)
        strat = b[stratum].to_numpy(zero_copy_only=False)
        thr = np.array([rates.get(s, default_rate) for s in
                        np.unique(strat)])
        uniq = np.unique(strat)
        # vectorized dict lookup: searchsorted into the sorted unique strata
        idx = np.searchsorted(uniq, strat)
        return b.filter(pa.array(u < thr[idx]))
    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def sample_per_key(ds: ray.data.Dataset, key: str, id_col: str, n: int,
                   seed: int = 0) -> ray.data.Dataset:
    """Deterministic n-per-key sample: rank each key group by
    ``u01(splitmix64(id))`` (uniform, reproducible on any cluster shape /
    arrival order — the id hash IS the random draw) and keep the first n.
    Rides :func:`functions.topn.top_n_per_key`, so blocks are map-side
    pruned to <= n rows per (key, block) before the one all-to-all.

    Unlike ``sample_hash`` (Bernoulli: keeps rate*|group| in expectation)
    this guarantees EXACTLY min(n, |group|) rows per key — the "cap each
    source at N docs" curation rule with a lottery instead of a quality
    ordering."""
    from .topn import top_n_per_key

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("__h", pa.array(hash_u01(b[id_col], seed)))

    tagged = ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True)
    out = top_n_per_key(tagged, [key], [("__h", True), (id_col, True)], n)
    return out.map_batches(lambda b: b.drop_columns(["__h"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def sample_weighted_mix(ds: ray.data.Dataset, id_col: str, stratum: str,
                        weights: dict[str, int], frac_num: int = 1,
                        frac_den: int = 2, seed: int = 0
                        ) -> ray.data.Dataset:
    """Deterministic MIX-TO-TARGET resampling — the training-data "source
    mixing" step: shrink the corpus to N·frac rows whose stratum
    proportions follow integer ``weights``, taking each stratum's quota by
    hash lottery (smallest ``u01(splitmix64(id))`` first).

    Quotas are exact integer algebra so every engine agrees bit-for-bit:
    ``T = N·frac_num // frac_den``; ``n_s = min(count_s, w_s·T // Σw)``
    (Σw over strata PRESENT in the data). Plan: one tiny
    :func:`grouped_count` fixes the quotas on the driver (strata are few —
    the dict rides in the task closure, never the corpus), then ONE
    :func:`functions.topn.top_n_per_key` pass whose map-side prune ships
    ≤ max(n_s) rows per (stratum, block); the per-stratum rank cut is a
    vectorized dict probe on the ranked output. Strata missing from
    ``weights`` get weight 0 (dropped).
    """
    from .grouped import grouped_count
    from .topn import top_n_per_key

    counts = grouped_count(ds.select_columns([stratum]), [stratum],
                           num_partitions=1).take_all()
    if not counts:
        return ds
    total = sum(r["n"] for r in counts)
    target = total * frac_num // frac_den
    present = [r[stratum] for r in counts]
    sum_w = sum(int(weights.get(s, 0)) for s in present)
    if sum_w <= 0:
        raise ValueError("sample_weighted_mix: no positive weight present")
    quota = {r[stratum]: min(int(r["n"]),
                             int(weights.get(r[stratum], 0)) * target
                             // sum_w)
             for r in counts}
    max_n = max(quota.values(), default=0)

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("__h", pa.array(hash_u01(b[id_col], seed)))

    ranked = top_n_per_key(
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True),
        [stratum], [("__h", True), (id_col, True)], max(max_n, 1))

    strat_arr = pa.array(list(quota), pa.string())
    quota_np = np.array([quota[s] for s in quota], np.int64)

    def cut(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.drop_columns(["__h", "rank"])
        idx = pc.index_in(pc.cast(b[stratum], pa.string()),
                          value_set=strat_arr).combine_chunks() \
            .fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        lim = np.where(idx >= 0, quota_np[np.maximum(idx, 0)], 0)
        rank = b["rank"].combine_chunks().to_numpy(zero_copy_only=False)
        return b.filter(pa.array(rank <= lim)) \
            .drop_columns(["__h", "rank"])

    return ranked.map_batches(cut, batch_format="pyarrow",
                              zero_copy_batch=True)
