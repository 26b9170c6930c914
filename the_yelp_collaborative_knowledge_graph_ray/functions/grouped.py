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

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

logger = logging.getLogger(__name__)


def concat_nonempty(tables: list[pa.Table]) -> pa.Table:
    """``pa.concat_tables`` that tolerates Ray sort's empty range
    partitions: an empty partition materializes as a zero-column block whose
    schema ("no fields") crashes a naive concat against the real blocks.
    Zero-row blocks carry no data, so dropping them is semantics-free; if
    everything is empty, return the first block as-is."""
    keep = [t for t in tables if t.num_rows > 0]
    if keep:
        return pa.concat_tables(keep)
    return tables[0] if tables else pa.table({})


def _cap_group(d: np.ndarray, max_group: int | None, key_desc: str) -> np.ndarray:
    """Apply the hot-group posting cap, LOUDLY: when a group exceeds
    ``max_group`` ids, keep the first ``max_group`` and emit a warning with
    the dropped count. Once a cap fires, intersection counts of retained
    pairs become LOWER BOUNDS (a pair may also co-occur in the capped tail),
    which can only under-report similarity — callers relying on exactness
    must size ``max_group`` above their hottest key."""
    if max_group is None or len(d) <= max_group:
        return d
    logger.warning(
        "pairs_within_groups: hot group capped (%d ids > max_group=%d, "
        "%d ids dropped) for group %s — retained pair counts are now "
        "lower bounds", len(d), max_group, len(d) - max_group, key_desc)
    return d[:max_group]


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
                       block_fn, num_partitions: int | None = None
                       ) -> ray.data.Dataset:
    """Sort by ``keys`` and apply ``block_fn(block)`` per whole block; every
    group is complete within its block (module docstring).

    ``num_partitions`` coalesces the input before the sort: Ray's sort makes
    one range partition PER INPUT BLOCK, so a small dataset fragmented into
    64 blocks pays a 64x64 micro-task shuffle. Callers whose intermediate
    data is far smaller than the cluster default block count should pass an
    explicit partition count sized to the DATA, not the CPUs.
    """
    # Parquet blocks read straight off disk carry pandas schema metadata
    # (a dict) that Ray's shuffle cannot hash — every reduce task then logs
    # "Failed to hash the schemas". Stripping metadata is zero-copy and the
    # map fuses with the upstream read.
    ds = ds.map_batches(
        lambda b: b.replace_schema_metadata(None) if b.schema.metadata else b,
        batch_format="pyarrow", zero_copy_batch=True)
    if num_partitions is not None:
        ds = ds.repartition(num_partitions)
    return ds.sort(keys).map_batches(block_fn, batch_format="pyarrow",
                                     batch_size=None, zero_copy_batch=True)


def sorted_aggregate(ds: ray.data.Dataset, keys: list[str],
                     aggs: list[tuple[str, str]],
                     out_names: list[str],
                     num_partitions: int | None = None) -> ray.data.Dataset:
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

    return sorted_group_apply(ds, keys, block_agg, num_partitions)


def grouped_count(ds: ray.data.Dataset, keys: list[str],
                  out_name: str = "n",
                  num_partitions: int | None = None) -> ray.data.Dataset:
    """Exact grouped row count — ``groupby(keys).count()`` without Ray's
    row-wise Python reduce: each batch collapses to its distinct keys with
    one Arrow ``group_by`` (map-side combine), then a sum-of-partials
    :func:`sorted_aggregate`. Output columns: keys + ``out_name``, sorted
    by keys."""
    def partial(b: pa.Table) -> pa.Table:
        t = b.select(keys)
        return t.append_column("__one", pa.array(
            np.ones(t.num_rows, np.int64))) \
            .group_by(keys, use_threads=False) \
            .aggregate([("__one", "sum")]) \
            .rename_columns(keys + [out_name])

    return sorted_aggregate(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys, [(out_name, "sum")], keys + [out_name], num_partitions)


def _pair_index_arrays(gid: np.ndarray, ids: np.ndarray,
                       drop_over: int | None, max_group: int | None,
                       keys_desc: str
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized within-group unordered-pair enumeration for a block whose
    rows carry dense group ids. Returns ``(sel, first, second)``: ``sel``
    maps deduped-row positions back to input rows (sorted by (group, id),
    one row per distinct (group, id)); ``first``/``second`` index ``sel``'s
    rows so that every within-group pair appears once with
    ``ids[sel[first]] < ids[sel[second]]``. Replaces the per-group Python
    loop (O(#groups) interpreter iterations — ~2.3 s/task over ~250k
    mostly-singleton LSH buckets) with cumsum/repeat index arithmetic.

    ``drop_over`` drops whole groups with more distinct ids (exact stop-key
    rule); ``max_group`` truncates a group to its first ids, logging per
    capped group via :func:`_cap_group`.
    """
    if len(ids) == 0:
        e = np.empty(0, np.int64)
        return e, e, e
    order = np.lexsort((ids, gid))            # stable: first occurrence wins
    g, d = gid[order], ids[order]
    keep = np.concatenate([[True], (g[1:] != g[:-1]) | (d[1:] != d[:-1])])
    g, d, sel = g[keep], d[keep], order[keep]

    def _regroup(g):
        row = np.arange(len(g), dtype=np.int64)
        is_start = np.concatenate([[True], g[1:] != g[:-1]])
        grp_start = np.maximum.accumulate(np.where(is_start, row, 0))
        starts = np.flatnonzero(is_start)
        sizes = np.diff(np.append(starts, len(g)))
        return row, grp_start, starts, sizes

    if len(g) == 0:
        e = np.empty(0, np.int64)
        return e, e, e
    row, grp_start, starts, sizes = _regroup(g)
    mask = None
    if drop_over is not None:
        mask = np.repeat(sizes, sizes) <= drop_over
    if max_group is not None:
        for gi in np.flatnonzero(sizes > max_group):  # rare by construction
            s = int(starts[gi])
            _cap_group(d[s:s + int(sizes[gi])], max_group,
                       f"{keys_desc}@row{s}")
        cap_mask = (row - grp_start) < max_group
        mask = cap_mask if mask is None else (mask & cap_mask)
    if mask is not None:
        g, d, sel = g[mask], d[mask], sel[mask]
        if len(g) == 0:
            e = np.empty(0, np.int64)
            return e, e, e
        row, grp_start, starts, sizes = _regroup(g)
    j_local = row - grp_start                 # pairs ending at each row
    total = int(j_local.sum())
    if total == 0:
        e = np.empty(0, np.int64)
        return sel, e, e
    second = np.repeat(row, j_local)
    csum = np.cumsum(j_local) - j_local
    first = (np.arange(total, dtype=np.int64)
             - np.repeat(csum, j_local) + np.repeat(grp_start, j_local))
    return sel, first, second


def pairs_within_groups(ds: ray.data.Dataset, keys: list[str], id_col: str,
                        count_col: str = "n",
                        max_group: int | None = None,
                        drop_over: int | None = None,
                        num_partitions: int | None = None) -> ray.data.Dataset:
    """For each key-group, emit all unordered id pairs (a < b); return
    globally aggregated pair counts (doc_a, doc_b, count_col).

    Pair expansion runs per block (complete groups) with a numpy loop whose
    body is O(group²) vectorized ops; a per-block Arrow ``group_by`` partial
    count collapses repeats before the global combine (map-side combine).

    Skew controls: ``max_group`` TRUNCATES an oversize group to its first
    ids (lossy for retained pairs' counts — logged, see :func:`_cap_group`);
    ``drop_over`` drops the WHOLE group instead — an exact, declarative
    semantic ("ignore keys shared by more than N ids", the classic stop-key
    rule) that an SQL oracle can mirror with ``HAVING count(*) <= N``.
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
        sel, first, second = _pair_index_arrays(
            gid, ids, drop_over, max_group, str(keys))
        if len(first) == 0:
            return out_schema.empty_table()
        d = ids[sel]
        t = pa.table({"doc_a": pa.array(d[first]),
                      "doc_b": pa.array(d[second])})
        # local combine before the shuffle
        return t.group_by(["doc_a", "doc_b"], use_threads=False) \
                .aggregate([("doc_a", "count")]) \
                .rename_columns(["doc_a", "doc_b", count_col])

    local = sorted_group_apply(ds, keys, block_pairs, num_partitions)
    return sorted_aggregate(local, ["doc_a", "doc_b"],
                            [(count_col, "sum")],
                            ["doc_a", "doc_b", count_col],
                            num_partitions)


def pairs_with_carry(ds: ray.data.Dataset, keys: list[str], id_col: str,
                     carry_col: str, count_col: str = "n",
                     max_group: int | None = None,
                     num_partitions: int | None = None) -> ray.data.Dataset:
    """:func:`pairs_within_groups` plus a per-id carried attribute: returns
    (doc_a, doc_b, count_col, carry_a, carry_b) where carry_* is the id's
    ``carry_col`` value (constant per id — e.g. its shingle count). Carrying
    the attribute through the pair expansion replaces a join-back against a
    per-id attribute table — two fewer shuffles in the caller's DAG."""

    def block_pairs(b: pa.Table) -> pa.Table:
        i64 = pa.int64()
        out_schema = pa.schema([("doc_a", i64), ("doc_b", i64),
                                (count_col, i64), ("carry_a", i64),
                                ("carry_b", i64)])
        gid, starts = group_ids(b, keys)
        if len(starts) == 0:
            return out_schema.empty_table()
        ids = pc.cast(b[id_col], i64).combine_chunks().to_numpy()
        car = pc.cast(b[carry_col], i64).combine_chunks().to_numpy()
        sel, first, second = _pair_index_arrays(
            gid, ids, None, max_group, str(keys))
        if len(first) == 0:
            return out_schema.empty_table()
        d, c = ids[sel], car[sel]
        t = pa.table({"doc_a": pa.array(d[first]),
                      "doc_b": pa.array(d[second]),
                      "carry_a": pa.array(c[first]),
                      "carry_b": pa.array(c[second])})
        # local combine before the shuffle; carry is constant per id -> min
        return t.group_by(["doc_a", "doc_b"], use_threads=False) \
                .aggregate([("doc_a", "count"), ("carry_a", "min"),
                            ("carry_b", "min")]) \
                .rename_columns(["doc_a", "doc_b", count_col,
                                 "carry_a", "carry_b"])

    local = sorted_group_apply(ds, keys, block_pairs, num_partitions)
    return sorted_aggregate(local, ["doc_a", "doc_b"],
                            [(count_col, "sum"), ("carry_a", "min"),
                             ("carry_b", "min")],
                            ["doc_a", "doc_b", count_col,
                             "carry_a", "carry_b"],
                            num_partitions)
