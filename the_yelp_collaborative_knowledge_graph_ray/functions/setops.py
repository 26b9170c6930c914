"""Distributed distinct set operations — INTERSECT / EXCEPT over two
Datasets on a key tuple.

The reference's only set logic is in-process (`set()` caches,
`create_yelp_nt_files.py:47,101-108`; ordered intersection-first,
`location_from_wikidata.py:168-171`) — not portable to a cluster. Here both
SQL set operators run as ONE all-to-all: each side tags two int64 indicator
columns, the union flows through the engine's sort-based aggregate
(map-side combine collapses duplicate keys per block before the shuffle, so
a hot key crossing the wire costs one partial row per block, not one row
per occurrence), and a vectorized membership filter picks the op's rows.
Set semantics are DISTINCT on both sides, matching SQL INTERSECT/EXCEPT.

At 100 TB this is the right shape: the shuffle carries only distinct-key
partials, never the source rows, and the output is key-sorted for free
(useful to downstream merge consumers).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .grouped import sorted_aggregate


def distinct_set_op(a: ray.data.Dataset, b: ray.data.Dataset,
                    keys: list[str], op: str,
                    num_partitions: int = 8) -> ray.data.Dataset:
    """``a INTERSECT b`` / ``a EXCEPT b`` (distinct set semantics) on
    ``keys``. Returns the key columns only, sorted by ``keys``."""
    if op not in ("intersect", "except"):
        raise ValueError(f"op must be 'intersect' or 'except', got {op!r}")

    def tag(ia: int, ib: int):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            # map-side combine: collapse to distinct keys per block BEFORE
            # the shuffle, so a hot key crosses the wire once per block
            t = t.select(keys) \
                .append_column("__a", pa.array(np.full(n, ia, np.int64))) \
                .append_column("__b", pa.array(np.full(n, ib, np.int64)))
            return t.group_by(keys, use_threads=False).aggregate(
                [("__a", "sum"), ("__b", "sum")]) \
                .rename_columns(keys + ["__a", "__b"])
        return f

    u = a.map_batches(tag(1, 0), batch_format="pyarrow",
                      zero_copy_batch=True) \
        .union(b.map_batches(tag(0, 1), batch_format="pyarrow",
                             zero_copy_batch=True))
    agg = sorted_aggregate(u, keys, [("__a", "sum"), ("__b", "sum")],
                           keys + ["__na", "__nb"], num_partitions)

    def pick(t: pa.Table) -> pa.Table:
        in_a = pc.greater(t["__na"], 0)
        if op == "intersect":
            m = pc.and_(in_a, pc.greater(t["__nb"], 0))
        else:
            m = pc.and_(in_a, pc.equal(t["__nb"], 0))
        return t.filter(m).select(keys)

    return agg.map_batches(pick, batch_format="pyarrow",
                           zero_copy_batch=True)


def anti_join(left: ray.data.Dataset, right: ray.data.Dataset,
              left_key: str, right_key: str,
              left_cols: list[tuple[str, pa.DataType]],
              num_partitions: int = 8) -> ray.data.Dataset:
    """Distributed ANTI JOIN: left rows whose key has NO match in ``right``
    (``WHERE key NOT IN (SELECT ...)`` with non-null keys). Same sorted-block
    co-group shape as ``functions/joins.attach_column`` but key-type-generic
    (no int64 cast — works on IRI strings) and with the inverted keep rule:
    groups containing a right-side marker emit nothing; the rest emit their
    left rows. ``Dataset.join(join_type=...)`` is avoided for the usual
    sparse-partition crash (functions/joins.py docstring).

    ``left_cols`` declares the carried left schema (name, type); the right
    side contributes only its key column — per-block deduped before the
    shuffle, so a right table with billions of repeats of few keys ships
    one marker row per (key, block)."""
    from .grouped import group_ids, sorted_group_apply

    key_field = None
    for name, typ in left_cols:
        if name == left_key:
            key_field = typ
    if key_field is None:
        raise ValueError(f"left_key {left_key!r} must appear in left_cols")
    schema = pa.schema([("__k", key_field), ("__m", pa.bool_())]
                       + [(n, t) for n, t in left_cols])

    def from_left(b: pa.Table) -> pa.Table:
        cols = {"__k": pc.cast(b[left_key], key_field),
                "__m": pa.nulls(b.num_rows, pa.bool_()).fill_null(False)}
        for name, typ in left_cols:
            cols[name] = pc.cast(b[name], typ)
        return pa.table(cols, schema=schema)

    def from_right(b: pa.Table) -> pa.Table:
        k = pc.unique(pc.cast(b[right_key], key_field))  # per-block dedup
        cols = {"__k": k,
                "__m": pa.nulls(len(k), pa.bool_()).fill_null(True)}
        for name, typ in left_cols:
            cols[name] = pa.nulls(len(k), typ)
        return pa.table(cols, schema=schema)

    u = left.map_batches(from_left, batch_format="pyarrow") \
        .union(right.map_batches(from_right, batch_format="pyarrow"))
    out_schema = pa.schema(left_cols)

    def cogroup(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["__k"])
        mark = b["__m"].combine_chunks().to_numpy(zero_copy_only=False)
        hit = np.zeros(int(gid[-1]) + 1, bool)
        hit[gid[mark]] = True
        keep = (~hit[gid]) & ~mark
        t = b.filter(pa.array(keep))
        return pa.table({n: t[n] for n, _ in left_cols}, schema=out_schema)

    return sorted_group_apply(u, ["__k"], cogroup, num_partitions)
