"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, public) with a
fully DETERMINISTIC, integer-only register table.

The reference has no approximate aggregates (SURVEY §2.5) — at 10^12 turns
an exact COUNT(DISTINCT) is a full all-to-all of every distinct key, while
the HLL register table is 2^b ints REGARDLESS of cardinality; per-block
partials merge with MAX, which is commutative/associative/idempotent, so
the sketch is identical under any shuffle order, retry, or cluster shape —
unlike float sums, it is safely hash-gateable.

Layout (b=10 → m=1024 registers, σ ≈ 1.04/√m ≈ 3.3%):

    h        = splitmix64(key)           (the repo's standard mixer)
    register = h >> 54                   (top b bits)
    w        = h & (2^54 - 1)            (remaining 54 bits)
    rank     = 55 - bitlen(w)            (leading zeros in the 54-bit
                                          field + 1; w=0 → 55)
    M[register] = max(rank)

The SKETCH is the query output — a sparse (register, max_rank) int64 table
that the DuckDB oracle reproduces exactly (``bin()`` gives the bit length
with integer string ops; no float log2 anywhere). The cardinality ESTIMATE
is a driver-side function over those ≤1024 rows (float only at the very
end, never inside the distributed computation), with the standard
linear-counting small-range correction.

Vectorized bitlen: uint64 → 8 big-endian bytes; bitlen = 8·(bytes right of
the highest non-zero byte) + LUT[that byte] — exact (no float, no per-row
Python), unlike ``log2`` which rounds near powers of two.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .grouped import sorted_aggregate
from .sampling import splitmix64

HLL_B = 10
HLL_M = 1 << HLL_B
_W_BITS = 64 - HLL_B

_BITLEN_LUT = np.array([0] + [int(v).bit_length() for v in range(1, 256)],
                       np.int64)


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of a uint64 array."""
    by = w.astype(">u8").view(np.uint8).reshape(len(w), 8)
    nz = by != 0
    # index of the highest (leftmost) non-zero byte; 8 if all zero
    first = np.where(nz.any(axis=1), nz.argmax(axis=1), 8)
    top = by[np.arange(len(w)), np.minimum(first, 7)]
    return np.where(first == 8, 0, (7 - first) * 8 + _BITLEN_LUT[top])


def _reg_rank(b: pa.Table, key: str, seed: int
              ) -> tuple[np.ndarray, np.ndarray]:
    """(register, rank) per row — the sketch-defining math, shared by the
    global and grouped variants so it can never desynchronize. Nulls are
    rejected loudly: a single null would make Arrow hand back a float64
    (NaN) array whose BIT PATTERNS get hashed, silently corrupting every
    key in the block."""
    k = pc.cast(b[key], pa.int64())
    if isinstance(k, pa.ChunkedArray):
        k = k.combine_chunks()
    if k.null_count:
        raise ValueError(f"hll: key column {key!r} contains nulls — "
                         "drop_null() upstream")
    x = k.to_numpy(zero_copy_only=False).view(np.uint64)
    if seed:
        x = x ^ splitmix64(np.array([seed], np.uint64))[0]
    h = splitmix64(x)
    reg = (h >> np.uint64(_W_BITS)).astype(np.int64)
    w = h & np.uint64((1 << _W_BITS) - 1)
    rank = (_W_BITS + 1) - _bitlen_u64(w)
    return reg, rank


def hll_registers(ds: ray.data.Dataset, key: str, seed: int = 0,
                  num_partitions: int = 4) -> ray.data.Dataset:
    """Sparse HLL register table (register:int64, max_rank:int64) for the
    distinct values of int64 column ``key``; sorted by register. Per-block
    partial registers (≤ m rows each) are the ONLY thing shuffled."""
    def partial(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("register", pa.int64()),
                                ("max_rank", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        reg, rank = _reg_rank(b, key, seed)
        # per-block register max: one bincount-style scatter
        m = np.zeros(HLL_M, np.int64)
        np.maximum.at(m, reg, rank)
        seen = np.flatnonzero(m)
        return pa.table({"register": pa.array(seen, pa.int64()),
                         "max_rank": pa.array(m[seen], pa.int64())},
                        schema=out_schema)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return sorted_aggregate(partials, ["register"], [("max_rank", "max")],
                            ["register", "max_rank"], num_partitions)


def hll_estimate(registers: pa.Table | "ray.data.Dataset") -> float:
    """Cardinality estimate from a (register, max_rank) table — driver-side
    math over ≤ m rows (the one place floats appear). Standard HLL with the
    linear-counting small-range correction."""
    if isinstance(registers, ray.data.Dataset):
        registers = pa.Table.from_pylist(registers.take_all())
    ranks = np.zeros(HLL_M, np.float64)
    if registers.num_rows:
        ranks[registers["register"].to_numpy()] = \
            registers["max_rank"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / HLL_M)
    est = alpha * HLL_M * HLL_M / np.sum(np.exp2(-ranks))
    zeros = int((ranks == 0).sum())
    if est <= 2.5 * HLL_M and zeros:
        est = HLL_M * np.log(HLL_M / zeros)  # linear counting
    return float(est)


def grouped_hll_registers(ds: ray.data.Dataset, group_col: str, key: str,
                          seed: int = 0, num_partitions: int = 4
                          ) -> ray.data.Dataset:
    """Per-group HLL register tables — approximate COUNT(DISTINCT key)
    GROUP BY group, in one pass + one tiny all-to-all of (group, register,
    max_rank) partials (≤ m rows per group per block). Same determinism
    argument as :func:`hll_registers`: max-merge commutes, so the grouped
    sketch is hash-gateable. Feed one group's rows to
    :func:`hll_estimate` for its cardinality."""
    def partial(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("g", pa.int64()), ("register", pa.int64()),
                                ("max_rank", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        g = b[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        gv = pc.cast(g, pa.int64()).to_numpy(zero_copy_only=False) \
            if pa.types.is_integer(g.type) else None
        if gv is None:
            raise ValueError("grouped_hll_registers needs an int64 group "
                             "column; dictionary-encode strings first")
        reg, rank = _reg_rank(b, key, seed)
        uniq, ginv = np.unique(gv, return_inverse=True)
        m = np.zeros(len(uniq) * HLL_M, np.int64)
        np.maximum.at(m, ginv * HLL_M + reg, rank)
        seen = np.flatnonzero(m)
        return pa.table({
            "g": pa.array(uniq[seen // HLL_M], pa.int64()),
            "register": pa.array(seen % HLL_M, pa.int64()),
            "max_rank": pa.array(m[seen], pa.int64())}, schema=out_schema)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return sorted_aggregate(partials, ["g", "register"],
                            [("max_rank", "max")],
                            ["g", "register", "max_rank"], num_partitions)
