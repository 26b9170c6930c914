"""Train/eval contamination check — n-gram overlap against a benchmark set.

Before training on a web-scale corpus you must measure how much of each
training document's content appears in the evaluation benchmarks
(decontamination, e.g. GPT-3 appendix C / PaLM app. F style n-gram overlap).
Shape of the problem: TRAIN is huge (the 100-TB side), EVAL is small by
construction (benchmarks are a few MB). That asymmetry makes this a
broadcast-probe, not a join:

1. shingle the EVAL docs (same word-k-gram semantics as the dedup family,
   ``dedup._distinct_doc_shingles``) and collect the DISTINCT shingle set to
   the driver — small because eval is small;
2. ``ray.put`` the sorted shingle array once; every train task reads it
   zero-copy from the object store (one copy per NODE, not per task);
3. stream TRAIN through one stateless ``map_batches``: per batch, shingle
   vectorized, probe the broadcast set at the batch-DICTIONARY level (each
   distinct shingle tested once via ``np.isin`` against the sorted set),
   scatter hits back to docs with a bincount.

No shuffle touches the train corpus; the only all-to-all is none at all.
Matching is on shingle STRINGS (not hashes), so the result is exact and the
DuckDB oracle (shingle CTE + semi join) agrees row-for-row.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .dedup import SHINGLE_K, _distinct_doc_shingles


def eval_shingle_set(eval_docs: ray.data.Dataset, text_col: str = "text",
                     k: int = SHINGLE_K) -> np.ndarray:
    """Sorted distinct shingle strings of the (small) eval set.

    Driver-side collect is bounded by the EVAL corpus size — the documented
    assumption of this operator. For a pathologically large eval set, swap
    the probe for a hash-partitioned semi join (functions/joins.py).
    """
    def sh(b: pa.Table) -> pa.Table:
        _, codes, dictionary = _distinct_doc_shingles(b[text_col], k)
        u = np.unique(codes)
        return pa.table({"s": dictionary.take(pa.array(u))})

    parts = eval_docs.map_batches(sh, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all()
    if not parts:
        return np.empty(0, dtype="U1")
    return np.unique(np.asarray([p["s"] for p in parts], dtype="U"))


def contamination_check(train: ray.data.Dataset, eval_docs: ray.data.Dataset,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = SHINGLE_K, min_overlap_frac: float = 0.2
                        ) -> ray.data.Dataset:
    """Per-train-doc shingle overlap with the eval set.

    Returns (id, n_shingles, n_overlap, overlap_frac, contaminated) for
    EVERY train doc — docs with < k words have n_shingles = 0 and are
    never contaminated. ``contaminated`` flags overlap_frac >=
    ``min_overlap_frac`` (exact IEEE division, matching the SQL oracle).
    """
    ev = ray.put(eval_shingle_set(eval_docs, text_col, k))

    def probe(b: pa.Table) -> pa.Table:
        evs = ray.get(ev)
        doc_idx, codes, dictionary = _distinct_doc_shingles(b[text_col], k)
        n_rows = b.num_rows
        if len(doc_idx):
            n_sh = np.bincount(doc_idx, minlength=n_rows).astype(np.int64)
            dict_hit = np.isin(
                np.asarray(dictionary.to_numpy(zero_copy_only=False),
                           dtype="U"), evs, assume_unique=False)
            hits = dict_hit[codes]
            n_ov = np.bincount(doc_idx, weights=hits,
                               minlength=n_rows).astype(np.int64)
        else:
            n_sh = np.zeros(n_rows, np.int64)
            n_ov = np.zeros(n_rows, np.int64)
        frac = np.divide(n_ov, n_sh, out=np.zeros(n_rows, np.float64),
                         where=n_sh > 0)
        return pa.table({
            id_col: b[id_col],
            "n_shingles": pa.array(n_sh),
            "n_overlap": pa.array(n_ov),
            "overlap_frac": pa.array(frac),
            "contaminated": pa.array(frac >= min_overlap_frac)})

    return train.map_batches(probe, batch_format="pyarrow",
                              zero_copy_batch=True)
