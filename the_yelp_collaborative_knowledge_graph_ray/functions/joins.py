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

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_MARK = "__is_src"
_KEY = "__k"


def attach_column(left: ray.data.Dataset, source: ray.data.Dataset,
                  left_cols: list[tuple[str, pa.DataType]], left_key: str,
                  source_key: str, source_val: str, out_col: str,
                  out_type: pa.DataType = pa.string(),
                  num_partitions: int | None = None) -> ray.data.Dataset:
    """Inner-join ``source[source_val]`` onto ``left`` by key.

    ``left_cols`` declares the left schema (name, type) explicitly so both
    union sides align block-for-block. ``num_partitions`` coalesces the
    unioned input before the co-group sort (see
    ``functions/grouped.sorted_group_apply``) — pass it when both sides are
    small relative to the cluster's default block count.
    """
    out_fields = [*left_cols, (out_col, out_type)]
    schema = pa.schema([(_KEY, pa.int64()), (_MARK, pa.bool_())] + out_fields)

    def from_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {_KEY: pc.cast(b[left_key], pa.int64()),
                _MARK: pa.nulls(n, pa.bool_()).fill_null(False)}
        for name, typ in left_cols:
            cols[name] = pc.cast(b[name], typ)
        cols[out_col] = pa.nulls(n, out_type)
        return pa.table(cols, schema=schema)

    def from_source(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {_KEY: pc.cast(b[source_key], pa.int64()),
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
