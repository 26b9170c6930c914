"""Deterministic per-key top-N — the distributed per-group head.

A curation staple: "keep the N best documents per source", "first N events
per user". SQL expresses it as ``row_number() OVER (PARTITION BY key ORDER
BY ...) <= n``; Ray Data has no window functions, so it is built from the
repo's sorted-block primitive (``functions/grouped.sorted_group_apply``)
with a map-side prune:

1. PRUNE (stateless ``map_batches``): each input block locally keeps at
   most n rows per key — everything beyond rank n in a single block can
   never enter the global top-n. The all-to-all that follows therefore
   moves <= n rows per (key, block) instead of the whole table; for n <<
   rows-per-block this prunes ~everything before the shuffle.
2. ONE key-sort colocates complete groups per block
   (sorted_group_apply's invariant), and the same local head selection per
   block IS the global answer.

Determinism: rows are ranked by ``(order_col, *tie_cols)`` with an explicit
ascending/descending flag per column; callers must pass tie columns that
make the ordering total (e.g. the row id), exactly as the SQL oracle's
ORDER BY does.

Reference parity: generalizes SURVEY §2 O2 (per-group top-1 argmax in the
link decision, `stages/link.py`) to arbitrary n with the same
sorted-block machinery.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .grouped import group_ids, sorted_group_apply


def _head_per_group(b: pa.Table, keys: list[str],
                    order: list[tuple[str, bool]], n: int) -> pa.Table:
    """Keep the first n rows of each key group under ``order`` (column,
    ascending). The block must contain complete groups (or be a local
    prune, where partial groups are fine — pruning is monotone)."""
    if b.num_rows == 0:
        return b
    sort_keys = [(k, "ascending") for k in keys] + \
        [(c, "ascending" if asc else "descending") for c, asc in order]
    b = b.sort_by(sort_keys)
    gid, starts = group_ids(b, keys)
    rank = np.arange(b.num_rows, dtype=np.int64) - starts[gid]
    return b.filter(pa.array(rank < n))


def top_n_per_key(ds: ray.data.Dataset, keys: list[str],
                  order: list[tuple[str, bool]], n: int,
                  num_partitions: int | None = None) -> ray.data.Dataset:
    """Top ``n`` rows per ``keys`` group ordered by ``order``
    [(column, ascending), ...] — ordering must be total for determinism.
    Output is sorted by keys, then rank order, with a ``rank`` column
    (1-based, matching SQL ``row_number()``)."""
    pruned = ds.map_batches(lambda b: _head_per_group(b, keys, order, n),
                            batch_format="pyarrow", zero_copy_batch=True)

    def finalize(b: pa.Table) -> pa.Table:
        b = _head_per_group(b, keys, order, n)
        gid, starts = group_ids(b, keys)
        if b.num_rows == 0:
            return b.append_column("rank", pa.array([], pa.int64()))
        rank = np.arange(b.num_rows, dtype=np.int64) - starts[gid] + 1
        return b.append_column("rank", pa.array(rank))

    return sorted_group_apply(pruned, keys, finalize, num_partitions)


def _rank_head_per_group(b: pa.Table, keys: list[str],
                         order: list[tuple[str, bool]], n: int) -> pa.Table:
    """Keep rows with RANK ≤ n per group (WITH TIES semantics: rank = 1 +
    count of strictly-better rows, so every row tied with the n-th
    survives). Monotone as a local prune: ≥ n strictly-better block-mates
    ⇒ global rank > n."""
    if b.num_rows == 0:
        return b
    sort_keys = [(k, "ascending") for k in keys] + \
        [(c, "ascending" if asc else "descending") for c, asc in order]
    b = b.sort_by(sort_keys)
    gid, starts = group_ids(b, keys)
    pos = np.arange(b.num_rows, dtype=np.int64) - starts[gid]
    # value-change flags over the ORDER columns only (ties share a rank)
    same = np.ones(b.num_rows, bool)
    same[0] = False
    for c, _ in order:
        col = b[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.to_numpy(zero_copy_only=False)
        same[1:] &= v[1:] == v[:-1]
    same[1:] &= gid[1:] == gid[:-1]
    new_val = ~same
    # RANK() = in-group position of each tie-run's first row, +1
    run_first = np.maximum.accumulate(
        np.where(new_val, np.arange(b.num_rows), 0))
    rank = pos[run_first] + 1
    return b.filter(pa.array(rank <= n))


def top_n_with_ties_per_key(ds: ray.data.Dataset, keys: list[str],
                            order: list[tuple[str, bool]], n: int,
                            num_partitions: int | None = None
                            ) -> ray.data.Dataset:
    """FETCH FIRST n WITH TIES per key group (== SQL ``RANK() <= n``):
    same two-phase plan as :func:`top_n_per_key` — monotone map-side
    prune, ONE key sort, per-block final — but ranked by ORDER-column
    VALUES, so whole tie-runs survive together. Output keeps input
    columns plus a 1-based ``rank`` column (the SQL RANK value)."""
    pruned = ds.map_batches(
        lambda b: _rank_head_per_group(b, keys, order, n),
        batch_format="pyarrow", zero_copy_batch=True)

    def finalize(b: pa.Table) -> pa.Table:
        b = _rank_head_per_group(b, keys, order, n)
        if b.num_rows == 0:
            return b.append_column("rank", pa.array([], pa.int64()))
        gid, starts = group_ids(b, keys)
        pos = np.arange(b.num_rows, dtype=np.int64) - starts[gid]
        same = np.ones(b.num_rows, bool)
        same[0] = False
        for c, _ in order:
            col = b[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            v = col.to_numpy(zero_copy_only=False)
            same[1:] &= v[1:] == v[:-1]
        same[1:] &= gid[1:] == gid[:-1]
        run_first = np.maximum.accumulate(
            np.where(~same, np.arange(b.num_rows), 0))
        return b.append_column("rank", pa.array(pos[run_first] + 1))

    return sorted_group_apply(pruned, keys, finalize, num_partitions)
