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
                  out_type: pa.DataType = pa.string()) -> ray.data.Dataset:
    """Inner-join ``source[source_val]`` onto ``left`` by key.

    ``left_cols`` declares the left schema (name, type) explicitly so both
    union sides align block-for-block.
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

    def cogroup(g: pa.Table) -> pa.Table:
        src = g.filter(g[_MARK])
        dst = g.filter(pc.invert(g[_MARK]))
        if src.num_rows == 0 or dst.num_rows == 0:
            return pa.schema(out_fields).empty_table()
        val = src[out_col][0]
        n = dst.num_rows
        cols = {name: dst[name] for name, _ in left_cols}
        cols[out_col] = pa.nulls(n, out_type).fill_null(val)
        return pa.table(cols, schema=pa.schema(out_fields))

    return u.groupby(_KEY).map_groups(cogroup, batch_format="pyarrow")
