"""Count-Min sketch (Cormode & Muthukrishnan 2005, public) — approximate
per-key frequencies in fixed space, with a DETERMINISTIC integer sketch.

The HLL companion (functions/hll.py) answers "how many distinct"; this
answers "how often does key k appear" without shuffling the keys at all:
``depth`` hash rows × ``width`` counters, ``cms[r][h_r(key) % width] += 1``.
Counter merges are SUMS of non-negative ints — commutative/associative —
so the sketch is bit-identical under any shuffle order or partitioning and
the DuckDB oracle can gate the whole table exactly. Per block, one
bincount per row crosses the shuffle as ≤ depth·width partial rows;
the corpus never does.

Point estimate (driver-side, :func:`cms_estimate`): min over rows of the
key's counter — never an underestimate, overestimates bounded by
ε·N with ε = e/width at confidence 1−(1/e)^depth (standard CMS bound).

Row hashes reuse the repo's splitmix64: ``h_r(k) = splitmix64(k XOR
splitmix64(r+1))`` — the same seeded-keyspace-shift ``sampling.hash_u01``
uses, already reproduced bit-for-bit in SQL (queries._splitmix_cte).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .grouped import sorted_aggregate
from .sampling import splitmix64

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_row_seeds(depth: int = CMS_DEPTH) -> np.ndarray:
    """The per-row keyspace shifts: splitmix64(r+1) for row r."""
    return splitmix64(np.arange(1, depth + 1, dtype=np.uint64))


def cms_sketch(ds: ray.data.Dataset, key: str, depth: int = CMS_DEPTH,
               width: int = CMS_WIDTH, num_partitions: int = 4
               ) -> ray.data.Dataset:
    """Sparse CMS table (row:int64, col:int64, cnt:int64) over int64 column
    ``key``, sorted by (row, col). Only per-block (row, col, partial-count)
    rows are shuffled."""
    seeds = cms_row_seeds(depth)

    def partial(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("row", pa.int64()), ("col", pa.int64()),
                                ("cnt", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        k = pc.cast(b[key], pa.int64())
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        if k.null_count:
            raise ValueError(f"cms: key column {key!r} contains nulls")
        x = k.to_numpy(zero_copy_only=False).view(np.uint64)
        rows, cols, cnts = [], [], []
        for r, s in enumerate(seeds):
            c = (splitmix64(x ^ s) % np.uint64(width)).astype(np.int64)
            m = np.bincount(c, minlength=width).astype(np.int64)
            seen = np.flatnonzero(m)
            rows.append(np.full(len(seen), r, np.int64))
            cols.append(seen)
            cnts.append(m[seen])
        return pa.table({"row": pa.array(np.concatenate(rows)),
                         "col": pa.array(np.concatenate(cols)),
                         "cnt": pa.array(np.concatenate(cnts))},
                        schema=out_schema)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return sorted_aggregate(partials, ["row", "col"], [("cnt", "sum")],
                            ["row", "col", "cnt"], num_partitions)


def cms_estimate(sketch: pa.Table | "ray.data.Dataset", keys: np.ndarray,
                 depth: int = CMS_DEPTH, width: int = CMS_WIDTH
                 ) -> np.ndarray:
    """Point frequency estimates for ``keys`` from a (row, col, cnt) table —
    driver-side math over the ≤ depth·width sketch rows."""
    if isinstance(sketch, ray.data.Dataset):
        sketch = pa.Table.from_pylist(sketch.take_all())
    m = np.zeros((depth, width), np.int64)
    if sketch.num_rows:
        m[sketch["row"].to_numpy(), sketch["col"].to_numpy()] = \
            sketch["cnt"].to_numpy()
    x = np.asarray(keys, np.int64).view(np.uint64)
    est = np.full(len(x), np.iinfo(np.int64).max, np.int64)
    for r, s in enumerate(cms_row_seeds(depth)):
        c = (splitmix64(x ^ s) % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, m[r, c])
    return est
