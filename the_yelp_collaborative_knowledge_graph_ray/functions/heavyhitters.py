"""Distributed heavy hitters: mergeable Misra–Gries candidates + exact
verify (Misra & Gries 1982; merge guarantee per Agarwal et al., "Mergeable
Summaries", PODS 2012 — both public).

Finding every key with count > N/(k+1) naively is a full groupby — an
all-to-all over EVERY key in the corpus. This operator never shuffles the
key space at all:

1. **Summary pass** — each block folds to its exact per-key counts (one
   vectorized Arrow ``group_by``) and truncates them to a Misra–Gries
   summary: ``residual = count − floor(n_block/(k+1))`` kept only where
   positive. At most k keys survive per block (k+1 keys above
   n_block/(k+1) would sum past n_block) and the per-key undercount is
   ≤ n_block/(k+1).
2. **Candidate fold** — the ≤ k-row block summaries are summed on the
   driver. Undercounts add to ≤ N/(k+1) across blocks, so every key with
   true count > N/(k+1) has a positive merged residual: the candidate set
   provably contains all true heavy hitters, in O(k · n_blocks) driver
   memory, independent of corpus key cardinality.
3. **Exact verify** — candidates broadcast once (``ray.put``); each block
   emits its candidate counts via one vectorized ``pc.index_in`` +
   ``np.bincount`` (slot -1 carries the block's row count so N rides the
   same pass), one tiny ``sorted_aggregate``, then the strict integer
   threshold ``(k+1)·count > N``.

The output is EXACTLY ``GROUP BY key HAVING (k+1)*count(*) > N`` — the
sketch only prunes, the verify is exact — so the DuckDB oracle gates it
with a plain SQL aggregate and the result is independent of block
boundaries and merge order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .grouped import sorted_aggregate

_SUMMARY_SCHEMA = pa.schema([("key", pa.string()),
                             ("residual", pa.int64())])


def _mg_summary(b: pa.Table, key: str, k: int) -> pa.Table:
    """Exact block counts truncated to a ≤ k-row Misra–Gries summary."""
    if b.num_rows == 0:
        return _SUMMARY_SCHEMA.empty_table()
    kc = pc.cast(b[key], pa.string())
    if kc.null_count:
        raise ValueError(f"heavy_hitters: key column {key!r} has nulls")
    t = pa.table({"key": kc,
                  "residual": pa.nulls(b.num_rows, pa.int64()).fill_null(1)})
    counts = t.group_by(["key"], use_threads=False) \
        .aggregate([("residual", "sum")]) \
        .rename_columns(["key", "residual"])
    cut = b.num_rows // (k + 1)
    kept = counts.filter(pc.greater(counts["residual"], cut))
    return pa.table({"key": kept["key"],
                     "residual": pc.subtract(kept["residual"], cut)},
                    schema=_SUMMARY_SCHEMA)


def heavy_hitters(ds: ray.data.Dataset, key: str, k: int
                  ) -> ray.data.Dataset:
    """Keys of string column ``key`` with count > N/(k+1), exact counts.

    Output (key, cnt) sorted by cnt desc then key asc. Two scans of the
    input (summaries, verify); only O(k) rows per block ever shuffle.
    """
    summaries = ds.map_batches(lambda b: _mg_summary(b, key, k),
                               batch_format="pyarrow", zero_copy_batch=True)
    # ≤ k rows per block: driver fold is O(k · n_blocks), never the corpus
    merged = pa.concat_tables(
        [rb if isinstance(rb, pa.Table) else pa.Table.from_batches([rb])
         for rb in summaries.iter_batches(batch_format="pyarrow")
         if rb.num_rows] or [_SUMMARY_SCHEMA.empty_table()])
    cand = merged.group_by(["key"], use_threads=False) \
        .aggregate([("residual", "sum")])["key"]
    cand = pa.array(sorted(cand.to_pylist()), pa.string())
    cand_ref = ray.put(cand)

    class Verify:
        def __init__(self):
            self.cand = ray.get(cand_ref)
            self.n_cand = len(self.cand)

        def __call__(self, b: pa.Table) -> pa.Table:
            idx = pc.index_in(pc.cast(b[key], pa.string()),
                              value_set=self.cand) \
                .combine_chunks().fill_null(-1) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            # slot 0 = total-N carrier, slots 1.. = candidates
            cnt = np.bincount(idx + 1, minlength=self.n_cand + 1)
            cnt[0] = b.num_rows
            return pa.table({
                "slot": pa.array(np.arange(self.n_cand + 1), pa.int64()),
                "cnt": pa.array(cnt, pa.int64())})

    from .broadcast import broadcast_map_batches
    partials = broadcast_map_batches(ds, Verify, batch_format="pyarrow",
                                     zero_copy_batch=True)
    agg = sorted_aggregate(partials, ["slot"], [("cnt", "sum")],
                           ["slot", "cnt"], 1)
    cand_names = cand

    def finalize(b: pa.Table) -> pa.Table:
        schema = pa.schema([("key", pa.string()), ("cnt", pa.int64())])
        if b.num_rows == 0:
            return schema.empty_table()
        slot = b["slot"].to_numpy(zero_copy_only=False)
        cnt = b["cnt"].to_numpy(zero_copy_only=False)
        total = int(cnt[slot == 0][0])
        keep = (slot > 0) & ((k + 1) * cnt > total)
        names = np.asarray(cand_names.to_pylist(), dtype=object)[
            slot[keep] - 1]
        c = cnt[keep]
        # ≤ k survivors: a python sort is exact and trivially cheap here
        order = sorted(range(len(c)), key=lambda i: (-c[i], names[i]))
        return pa.table({"key": pa.array(names[order], pa.string()),
                         "cnt": pa.array(c[order], pa.int64())},
                        schema=schema)

    return agg.map_batches(finalize, batch_format="pyarrow",
                           batch_size=None)
