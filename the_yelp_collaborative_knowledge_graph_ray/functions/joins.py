"""Shuffle-native equi-join helpers.

``Dataset.join`` (hash-shuffle, ray 2.49) crashes when a partition receives
ZERO left-side shards: ``JoinAggregator.finalize`` builds the empty side as a
schema-less table and ``pyarrow.Table.join`` then fails with "No match or
multiple matches for key field reference ..." (``ray/data/_internal/execution/
operators/join.py:104-126``). That happens whenever the left side is sparse
relative to ``num_partitions`` — e.g. a small candidate-pair set being joined
back to a big table.

:func:`attach_column` implements the same inner equi-join as one UNION + one
``groupby().map_groups`` co-group — both primitives tolerate empty partitions
— so small-left joins are safe. Semantics: for every left row, append
``source``'s value column matched on the key (inner: left rows without a
match are dropped; ``source`` must be unique per key, which holds for all
our uses — joining attributes back by primary key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_MARK = "__is_src"
_KEY = "__k"


def distinct_int_keys(ds: ray.data.Dataset, cols: list[str],
                      fanin: int = 8) -> np.ndarray:
    """Sorted distinct int64 values across ``cols``, folded WORKER-SIDE: a
    per-block local unique task per block, merged through a tree of remote
    ``np.unique(concat)`` tasks with fan-in ``fanin``. The driver receives
    exactly ONE array — the final distinct set, which must fit in memory
    anyway to be ``ray.put`` by :func:`broadcast_semi_filter`. Neither raw
    blocks nor the per-block unique lists are ever concatenated on the
    driver, so the pre-fold candidate volume can exceed driver memory."""
    @ray.remote
    def block_unique(t: pa.Table) -> np.ndarray:
        if t.num_rows == 0:
            return np.empty(0, np.int64)
        return np.unique(np.concatenate([
            pc.cast(t[c], pa.int64()).combine_chunks()
            .to_numpy(zero_copy_only=False) for c in cols]))

    @ray.remote
    def merge(*arrs: np.ndarray) -> np.ndarray:
        return np.unique(np.concatenate(arrs))

    level = [block_unique.remote(r)
             for r in ds.select_columns(cols).materialize().to_arrow_refs()]
    while len(level) > 1:
        level = [merge.remote(*grp) if len(grp) > 1 else grp[0]
                 for grp in (level[i:i + fanin]
                             for i in range(0, len(level), fanin))]
    return ray.get(level[0]) if level else np.empty(0, np.int64)


def distinct_str_keys(ds: ray.data.Dataset, cols: list[str],
                      fanin: int = 8,
                      cap: int | None = None) -> pa.Array | None:
    """Sorted distinct string values across ``cols``, folded WORKER-SIDE
    (the string sibling of :func:`distinct_int_keys`): per-block unique
    tasks merged through a remote tree; the driver receives exactly ONE
    array — the final distinct set it was going to broadcast anyway.

    Folding runs in ``large_string`` so a merge of multi-GB node-string
    sets never overflows 32-bit string offsets mid-tree. With ``cap``
    set, the size gate ALSO runs remotely: an over-cap distinct set is
    never shipped to the driver at all — the call returns ``None`` and
    the caller takes its shuffle-join fallback with zero driver memory
    spent on the strings. An under-cap result is collected sorted and
    cast back to ``string`` when its offsets allow (the broadcast-probe
    fast path downstream is type-agnostic either way)."""
    ls = pa.large_string()

    @ray.remote
    def block_unique(t: pa.Table) -> pa.Array:
        if t.num_rows == 0:
            return pa.array([], ls)
        return pc.unique(pa.chunked_array(
            [pc.cast(t[c], ls) for c in cols]))

    @ray.remote
    def merge(*arrs: pa.Array) -> pa.Array:
        return pc.unique(pa.chunked_array(list(arrs)))

    @ray.remote
    def finish(arr: pa.Array) -> pa.Array | None:
        if cap is not None and len(arr) > cap:
            return None
        arr = arr.take(pc.sort_indices(arr))
        if arr.nbytes < (1 << 31) - 64:
            arr = pc.cast(arr, pa.string())
        return arr

    level = [block_unique.remote(r)
             for r in ds.select_columns(cols).materialize().to_arrow_refs()]
    while len(level) > 1:
        level = [merge.remote(*grp) if len(grp) > 1 else grp[0]
                 for grp in (level[i:i + fanin]
                             for i in range(0, len(level), fanin))]
    if not level:
        return pa.array([], pa.string())
    return ray.get(finish.remote(level[0]))


class BloomFilter:
    """Vectorized numpy Bloom filter over int64 keys.

    ``n_hashes`` independent probes derived from splitmix64 with distinct
    seeds; the bitset is a packed uint64 array (m bits for n keys at
    ``bits_per_key``, false-positive rate ~ (1 - e^{-kn/m})^k ≈ 0.05% at
    16 bits/key, 4 hashes). No false negatives ever — safe wherever a
    downstream EXACT step re-verifies survivors (the semi-filter contract).
    """

    def __init__(self, keys: np.ndarray, bits_per_key: int = 16,
                 n_hashes: int = 4):
        from .sampling import splitmix64
        m = 1 << max(6, int(np.ceil(np.log2(max(len(keys), 1)
                                            * bits_per_key))))
        self.mask = np.uint64(m - 1)
        self.seeds = splitmix64(np.arange(1, n_hashes + 1, dtype=np.uint64))
        self.bits = np.zeros(m >> 6, np.uint64)
        for idx in self._positions(np.asarray(keys, np.int64)):
            np.bitwise_or.at(self.bits, idx >> np.uint64(6),
                             np.uint64(1) << (idx & np.uint64(63)))

    def _positions(self, keys: np.ndarray):
        from .sampling import splitmix64
        k = keys.view(np.uint64)
        return [splitmix64(k ^ s) & self.mask for s in self.seeds]

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        out = np.ones(len(keys), bool)
        for idx in self._positions(np.asarray(keys, np.int64)):
            word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
        return out


def broadcast_semi_filter(big: ray.data.Dataset, key_col: str,
                          keys: np.ndarray,
                          max_exact_keys: int | None = None
                          ) -> ray.data.Dataset:
    """Semi-join: keep ``big`` rows whose ``key_col`` is in ``keys``.

    The key array is ``ray.put`` ONCE; each task reads it zero-copy from the
    shared object store (same-node workers map the same plasma buffer — the
    array is NOT copied per task) and probes with a binary search. This is
    the scale-safe way to join a big table against a small key set: the big
    side is only SCANNED (streaming, no shuffle); whatever survives is
    candidate-sized and cheap to shuffle afterwards. Keys must fit in the
    object store (~10^9 int64 = 8 GB); beyond ``max_exact_keys`` (when set)
    the exact array is swapped for a :class:`BloomFilter` at 16 bits/key —
    false positives (~0.05%) only add rows for the downstream exact join to
    drop, so correctness is unaffected, while the broadcast shrinks 32x."""
    keys = np.ascontiguousarray(np.unique(keys))
    bloom = (max_exact_keys is not None and len(keys) > max_exact_keys)
    ref = ray.put(BloomFilter(keys) if bloom else keys)
    n_keys = len(keys)

    def probe(b: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        if b.num_rows == 0 or n_keys == 0:
            return b.slice(0, 0)
        v = pc.cast(b[key_col], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        if bloom:
            return b.filter(pa.array(ks.might_contain(v)))
        idx = np.searchsorted(ks, v)
        idx[idx == len(ks)] = 0
        return b.filter(pa.array(ks[idx] == v))

    return big.map_batches(probe, batch_format="pyarrow",
                           zero_copy_batch=True)


def attach_column(left: ray.data.Dataset, source: ray.data.Dataset,
                  left_cols: list[tuple[str, pa.DataType]], left_key: str,
                  source_key: str, source_val: str, out_col: str,
                  out_type: pa.DataType = pa.string(),
                  num_partitions: int | None = None,
                  key_type: pa.DataType = pa.int64()) -> ray.data.Dataset:
    """Inner-join ``source[source_val]`` onto ``left`` by key.

    ``left_cols`` declares the left schema (name, type) explicitly so both
    union sides align block-for-block. ``num_partitions`` coalesces the
    unioned input before the co-group sort (see
    ``functions/grouped.sorted_group_apply``) — pass it when both sides are
    small relative to the cluster's default block count. ``key_type``
    defaults to int64; pass ``pa.string()`` to join on IRI/string keys
    (the sorted co-group is key-type-agnostic).
    """
    out_fields = [*left_cols, (out_col, out_type)]
    schema = pa.schema([(_KEY, key_type), (_MARK, pa.bool_())] + out_fields)

    def from_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {_KEY: pc.cast(b[left_key], key_type),
                _MARK: pa.nulls(n, pa.bool_()).fill_null(False)}
        for name, typ in left_cols:
            cols[name] = pc.cast(b[name], typ)
        cols[out_col] = pa.nulls(n, out_type)
        return pa.table(cols, schema=schema)

    def from_source(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {_KEY: pc.cast(b[source_key], key_type),
                _MARK: pa.nulls(n, pa.bool_()).fill_null(True)}
        for name, typ in left_cols:
            cols[name] = pa.nulls(n, typ)
        cols[out_col] = pc.cast(b[source_val], out_type)
        return pa.table(cols, schema=schema)

    u = left.map_batches(from_left, batch_format="pyarrow") \
        .union(source.map_batches(from_source, batch_format="pyarrow"))

    out_schema = pa.schema(out_fields)

    def cogroup_block(b: pa.Table) -> pa.Table:
        """One sorted block = complete key groups (functions/grouped.py);
        fully vectorized: map each group to its source row index, gather."""
        import numpy as np

        from .grouped import group_ids
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, [_KEY])
        mark = b[_MARK].combine_chunks().to_numpy(zero_copy_only=False)
        src_idx = np.flatnonzero(mark)
        val_row = np.full(int(gid[-1]) + 1, -1, dtype=np.int64)
        val_row[gid[src_idx]] = src_idx  # <=1 source row per key
        take_from = val_row[gid]
        keep = (~mark) & (take_from >= 0)
        dst = b.filter(pa.array(keep))
        vals = b[out_col].take(pa.array(take_from[keep]))
        cols = {name: pc.cast(dst[name], typ) for name, typ in left_cols}
        cols[out_col] = pc.cast(vals, out_type)
        return pa.table(cols, schema=out_schema)

    from .grouped import sorted_group_apply
    return sorted_group_apply(u, [_KEY], cogroup_block, num_partitions)


def zip_with_index(ds: ray.data.Dataset, id_col: str = "nid",
                   order_by: str | None = None) -> ray.data.Dataset:
    """Append a contiguous int64 row id (0..n-1) — distributed zipWithIndex.

    The dataset is materialized; per-block row counts (ONE int per block)
    come back to the driver, offsets are the exclusive cumsum, and each
    block gets ``offset + arange`` attached in a remote task. No block data
    ever moves to the driver, so this scales to any row count.

    Without ``order_by`` the id↔row assignment depends on ``to_arrow_refs``
    block order — NOT guaranteed stable even right after a sort (observed
    scrambled) — use it only for INTERNAL dense ids. With ``order_by``
    (input must be globally sorted on that column, so block ranges are
    disjoint) the driver orders blocks by each block's FIRST value of the
    column, making the id the deterministic global sort rank."""
    mat = ds.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def meta(t: pa.Table):
        first = (t[order_by][0].as_py() if order_by and t.num_rows
                 else None)
        return t.num_rows, first

    @ray.remote
    def tag(t: pa.Table, off: int) -> pa.Table:
        return t.append_column(id_col, pa.array(
            off + np.arange(t.num_rows, dtype=np.int64)))

    metas = ray.get([meta.remote(r) for r in refs])
    pairs = list(zip(refs, metas))
    if order_by is not None:
        pairs.sort(key=lambda rm: (rm[1][1] is None, rm[1][1]))
    sizes = [m[0] for _, m in pairs]
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    return ray.data.from_arrow_refs(
        [tag.remote(r, int(o)) for (r, _), o in zip(pairs, offs)])


def zip_with_prefix_sum(ds: ray.data.Dataset, val_col: str,
                        out_col: str, order_by: str,
                        idx_col: str | None = None) -> ray.data.Dataset:
    """Append the INCLUSIVE global running total of ``val_col`` in
    ``order_by`` order — the distributed prefix-sum behind Pareto/ABC
    and Lorenz-curve classes. Same block plan as :func:`zip_with_index`:
    per-block (first key, value sum) metas (TWO ints per block) come
    back to the driver, block offsets are the exclusive cumsum, and each
    block attaches ``offset + in-block cumsum`` in a remote task; no
    block data ever reaches the driver.

    ``order_by`` must be a column the input is globally sorted on with
    NO duplicate values at block boundaries (pack tie-breaks into the
    key, e.g. ``(rev << 32) - partkey``), else block order — and the
    running total at the tie — is nondeterministic.

    ``idx_col`` additionally attaches the 0-based global sort rank in
    the SAME pass (prefix sum + zipWithIndex share the block metas), so
    rank-normalized running statistics (average precision, Lorenz
    shares) need one materialization, not two."""
    mat = ds.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def meta(t: pa.Table):
        first = t[order_by][0].as_py() if t.num_rows else None
        s = (int(t[val_col].to_numpy(zero_copy_only=False).sum())
             if t.num_rows else 0)
        return s, first, t.num_rows

    @ray.remote
    def tag(t: pa.Table, off: int, ioff: int) -> pa.Table:
        cum = off + np.cumsum(
            t[val_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        t = t.append_column(out_col, pa.array(cum, pa.int64()))
        if idx_col is not None:
            t = t.append_column(idx_col, pa.array(
                ioff + np.arange(t.num_rows, dtype=np.int64)))
        return t

    metas = ray.get([meta.remote(r) for r in refs])
    pairs = list(zip(refs, metas))
    pairs.sort(key=lambda rm: (rm[1][1] is None, rm[1][1]))
    sums = [m[0] for _, m in pairs]
    cnts = [m[2] for _, m in pairs]
    offs = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)
    ioffs = np.concatenate([[0], np.cumsum(cnts)[:-1]]).astype(np.int64)
    return ray.data.from_arrow_refs(
        [tag.remote(r, int(o), int(io))
         for (r, _), o, io in zip(pairs, offs, ioffs)])


def full_outer_unique(left: ray.data.Dataset, right: ray.data.Dataset,
                      key_col: str,
                      left_vals: list[tuple[str, pa.DataType]],
                      right_vals: list[tuple[str, pa.DataType]],
                      key_type: pa.DataType = pa.int64(),
                      num_partitions: int | None = None
                      ) -> ray.data.Dataset:
    """FULL OUTER join of two keyed tables that are UNIQUE per key — the
    post-aggregation reconciliation shape ("which keys exist in system A,
    system B, or both?"). Same union-tag + ONE key-sort co-group plan as
    :func:`attach_column`; a block holds complete key groups, so each key
    resolves locally with numpy scatters (no per-row Python).

    Missing sides surface as integer presence flags ``in_left``/
    ``in_right`` plus ZERO-filled value columns rather than nulls: nulls
    in numeric columns degrade to float NaN on the pandas path and
    engines disagree on null hashing — zeros + flags keep the result
    hash-exact. Output: (key_col, in_left, in_right, *left_vals,
    *right_vals), one row per distinct key on either side.
    """
    import numpy as np

    all_vals = [*left_vals, *right_vals]
    u_schema = pa.schema([(key_col, key_type), (_MARK, pa.bool_())]
                         + all_vals)
    out_schema = pa.schema([(key_col, key_type),
                            ("in_left", pa.int64()),
                            ("in_right", pa.int64())] + all_vals)

    def _tag(side_vals, is_right: bool):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {key_col: pc.cast(b[key_col], key_type),
                    _MARK: pa.nulls(n, pa.bool_()).fill_null(is_right)}
            names = {name for name, _ in side_vals}
            for name, typ in all_vals:
                cols[name] = (pc.cast(b[name], typ) if name in names
                              else pa.nulls(n, typ))
            return pa.table(cols, schema=u_schema)
        return fn

    u = left.map_batches(_tag(left_vals, False), batch_format="pyarrow") \
        .union(right.map_batches(_tag(right_vals, True),
                                 batch_format="pyarrow"))

    def combine(b: pa.Table) -> pa.Table:
        from .grouped import group_ids
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, [key_col])
        n_keys = int(gid[-1]) + 1
        mark = b[_MARK].combine_chunks().to_numpy(zero_copy_only=False)
        row_of = np.full((2, n_keys), -1, np.int64)
        idx = np.arange(len(gid))
        row_of[0][gid[~mark]] = idx[~mark]
        row_of[1][gid[mark]] = idx[mark]
        cols = {key_col: b[key_col].take(pa.array(starts)),
                "in_left": pa.array((row_of[0] >= 0).astype(np.int64)),
                "in_right": pa.array((row_of[1] >= 0).astype(np.int64))}
        for side, side_vals in ((0, left_vals), (1, right_vals)):
            src = np.maximum(row_of[side], 0)
            present = row_of[side] >= 0
            for name, typ in side_vals:
                v = b[name].take(pa.array(src))
                v = pc.if_else(pa.array(present), v,
                               pc.cast(pa.scalar(0), typ))
                cols[name] = pc.cast(v, typ)
        return pa.table(cols, schema=out_schema)

    from .grouped import sorted_group_apply
    return sorted_group_apply(u, [key_col], combine, num_partitions)


def probe_sorted(keys: "np.ndarray", vals: "np.ndarray", k: "np.ndarray",
                 missing=None) -> "np.ndarray":
    """Binary-search probe of a broadcast (sorted keys → vals) pair — the
    vectorized core of every broadcast-dimension join in this repo: one
    ``np.searchsorted`` per batch, no Python dict, no per-row loop.
    Returns ``vals[i]`` where ``keys[i] == k`` else ``missing`` (defaults
    to -1 in vals' dtype). Safe on an empty lookup."""
    import numpy as np
    if missing is None:
        missing = vals.dtype.type(-1)
    if len(keys) == 0:
        return np.full(len(k), missing, vals.dtype)
    idx = np.searchsorted(keys, k)
    idx[idx == len(keys)] = 0
    return np.where(keys[idx] == k, vals[idx], missing)
