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
            return t.select(keys) \
                .append_column("__a", pa.array(np.full(n, ia, np.int64))) \
                .append_column("__b", pa.array(np.full(n, ib, np.int64)))
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
