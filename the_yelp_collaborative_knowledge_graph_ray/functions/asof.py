"""Distributed as-of join — a custom operator Ray Data lacks natively.

For every left row, find the right row with the GREATEST timestamp
strictly before the left row's timestamp, within the same key group
(the classic "most recent prior event" join; DuckDB spells it
``ASOF JOIN ... ON l.k = r.k AND r.ts < l.ts``).

Dataflow shape (the engine's sorted-block pattern, ``functions/grouped``):
tag both sides, union, ONE sort on the key column (equal keys land whole
in one block — the proven invariant), then a single vectorized in-block
pass per block:

* order rows by (group, ts, side, id) — lefts BEFORE rights at equal ts,
  so a strictly-smaller-ts match can never see an equal-ts right; rights
  at the same ts are ordered by id so the match is DETERMINISTIC
  (max id at the max prior ts);
* ``np.maximum.accumulate`` over right-row positions yields, at every left
  row, the position of the latest prior right row — one O(n) scan per
  block, no per-group Python;
* a per-group floor masks matches that would leak across key groups.

Partitioning assumption (documented per the task brief): the sort key is
the GROUP key only — per-key data must fit a block, which holds whenever
a single user's/entity's history fits in memory (same assumption as
sessionization). Timestamps order within the block via lexsort, not the
shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .grouped import group_ids, sorted_group_apply


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset,
              by: str, ts_col: str, id_col: str,
              num_partitions: int | None = 16) -> ray.data.Dataset:
    """Inner as-of join: (id_col, by, ts_col, src_id, src_ts) for every
    left row with at least one same-key right row at a strictly earlier
    timestamp. ``src_id`` is the max id among rights at the matched ts."""
    i64 = pa.int64()

    def tag(is_right: bool):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({
                "k": pc.cast(b[by], i64),
                "ts": pc.cast(b[ts_col], pa.timestamp("us")),
                "is_right": pa.nulls(n, pa.int8()).fill_null(
                    1 if is_right else 0),
                "id": pc.cast(b[id_col], i64)})
        return f

    u = left.map_batches(tag(False), batch_format="pyarrow") \
        .union(right.map_batches(tag(True), batch_format="pyarrow"))

    out_schema = pa.schema([
        (id_col, i64), (by, i64), (ts_col, pa.timestamp("us")),
        ("src_id", i64), ("src_ts", pa.timestamp("us"))])

    def block_asof(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["k"])
        ts = b["ts"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        side = b["is_right"].combine_chunks().to_numpy()
        ids = b["id"].combine_chunks().to_numpy()
        keys = b["k"].combine_chunks().to_numpy()
        order = np.lexsort((ids, side, ts, gid))
        gid_o, ts_o = gid[order], ts[order]
        side_o, ids_o, keys_o = side[order], ids[order], keys[order]
        n = len(order)
        pos = np.arange(n)
        lastr = np.maximum.accumulate(np.where(side_o == 1, pos, -1))
        # per-group floor: group start position in the new order
        first = np.flatnonzero(
            np.concatenate([[True], gid_o[1:] != gid_o[:-1]]))
        gstart = first[np.cumsum(
            np.concatenate([[True], gid_o[1:] != gid_o[:-1]])) - 1]
        is_left = side_o == 0
        m = lastr
        ok = is_left & (m >= gstart) & (m >= 0)
        lp = np.flatnonzero(ok)
        mp = m[lp]
        return pa.table({
            id_col: pa.array(ids_o[lp]),
            by: pa.array(keys_o[lp]),
            ts_col: pa.array(ts_o[lp].astype("datetime64[us]")),
            "src_id": pa.array(ids_o[mp]),
            "src_ts": pa.array(ts_o[mp].astype("datetime64[us]"))},
            schema=out_schema)

    return sorted_group_apply(u, ["k"], block_asof, num_partitions) \
        .sort(id_col)
