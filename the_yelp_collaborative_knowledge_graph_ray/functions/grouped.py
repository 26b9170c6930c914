"""Sorted-block group processing — the fast replacement for ``map_groups``.

``Dataset.groupby(...).map_groups(fn)`` costs one Python call + table slice +
concat PER GROUP; at 10^5-10^6 groups the per-group overhead dominates the
actual work by 10-100x. The alternative used throughout this engine:

    ds.sort(keys) -> map_batches(block_fn, batch_size=None)

After a Ray sort, rows with equal keys are always contiguous *within one
block* (consistent ``side="left"`` boundary search in every map task + one
merged output block per range partition — the invariant proven and
stress-tested in ``stages/materialize.py``). So a ``batch_size=None`` batch
contains only COMPLETE groups, and ``block_fn`` can process thousands of
groups with vectorized numpy over group-boundary offsets instead of one
Python call each.

CAVEAT: the invariant covers rows equal on the FULL sort key only. Grouping
by a prefix of a longer sort key is NOT safe — a range boundary can split a
prefix-group mid-stream (e.g. sorting by (user, ts) and grouping by user).
Sort by exactly the group key; order within the group inside the block
(``np.lexsort``) if needed — see ``pipelines/relational.py:sessionize``.

Helpers here compute the group boundary structure once per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def group_ids(block: pa.Table, keys: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(gid, starts) for a block sorted by ``keys``: ``gid[i]`` is the dense
    group index of row i; ``starts`` are the first-row offsets per group
    (append ``len(block)`` for ends)."""
    n = block.num_rows
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if len(keys) == 1:
        col = block[keys[0]]
    else:
        parts = []
        for k in keys:
            parts.append(pc.cast(block[k], pa.string()))
        col = pc.binary_join_element_wise(*parts, "\x1f")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.to_numpy(zero_copy_only=False)
    change = np.concatenate([[True], arr[1:] != arr[:-1]])
    gid = np.cumsum(change) - 1
    starts = np.flatnonzero(change)
    return gid, starts


def sorted_group_apply(ds: ray.data.Dataset, keys: list[str],
                       block_fn) -> ray.data.Dataset:
    """Sort by ``keys`` and apply ``block_fn(block)`` per whole block; every
    group is complete within its block (module docstring)."""
    return ds.sort(keys).map_batches(block_fn, batch_format="pyarrow",
                                     batch_size=None, zero_copy_batch=True)


def sorted_aggregate(ds: ray.data.Dataset, keys: list[str],
                     aggs: list[tuple[str, str]],
                     out_names: list[str]) -> ray.data.Dataset:
    """Exact global grouped aggregation as sort + per-block Arrow group_by.

    Ray's ``groupby().aggregate()`` reduce merges rows in Python (~10x slower
    than its own sort at 10^6 rows — measured in stages/materialize.py); here
    the sort colocates complete groups per block and one C-speed
    ``pa.Table.group_by`` per block IS the global aggregate. Output rows stay
    sorted by ``keys`` (Arrow hash group-by emits first-seen order, and the
    block is sorted).

    ``aggs`` are Arrow (column, function) pairs, e.g. ``[("x", "sum")]``;
    ``out_names`` names the output columns (keys first, then aggregates).
    """
    def block_agg(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return b.group_by(keys, use_threads=False).aggregate(aggs) \
                .rename_columns(out_names)

    return sorted_group_apply(ds, keys, block_agg)


def pairs_within_groups(ds: ray.data.Dataset, keys: list[str], id_col: str,
                        count_col: str = "n",
                        max_group: int | None = None) -> ray.data.Dataset:
    """For each key-group, emit all unordered id pairs (a < b); return
    globally aggregated pair counts (doc_a, doc_b, count_col).

    Pair expansion runs per block (complete groups) with a numpy loop whose
    body is O(group²) vectorized ops; a per-block Arrow ``group_by`` partial
    count collapses repeats before the global combine (map-side combine).
    """

    def block_pairs(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                                (count_col, pa.int64())])
        gid, starts = group_ids(b, keys)
        if len(starts) == 0:
            return out_schema.empty_table()
        ids = pc.cast(b[id_col], pa.int64())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids = ids.to_numpy()
        ends = np.append(starts[1:], b.num_rows)
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            d = np.unique(ids[s:e])
            if len(d) < 2:
                continue
            if max_group is not None and len(d) > max_group:
                d = d[:max_group]  # hot-group cap (stop-shingle drop)
            iu, ju = np.triu_indices(len(d), k=1)
            out_a.append(d[iu])
            out_b.append(d[ju])
        if not out_a:
            return out_schema.empty_table()
        t = pa.table({"doc_a": pa.array(np.concatenate(out_a)),
                      "doc_b": pa.array(np.concatenate(out_b))})
        # local combine before the shuffle
        return t.group_by(["doc_a", "doc_b"], use_threads=False) \
                .aggregate([("doc_a", "count")]) \
                .rename_columns(["doc_a", "doc_b", count_col])

    local = sorted_group_apply(ds, keys, block_pairs)
    return sorted_aggregate(local, ["doc_a", "doc_b"],
                            [(count_col, "sum")],
                            ["doc_a", "doc_b", count_col])
