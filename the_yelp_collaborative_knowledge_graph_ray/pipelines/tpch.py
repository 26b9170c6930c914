"""TPC-H remainder suite (Q2,4,7,8,9,11,12,13,15,16,20,21,22) as
Ray-Data-first pipelines over the driver testdata star schema.

Q1/3/5/6/10/14/17/18/19 live in ``pipelines/relational.py``; this module
completes the suite. The testdata has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate``/``c_phone``/comment columns, so each
query here is an ADAPTED ANALOG: the predicate constants change to columns
that exist, but the defining plan shape of the original — the EXISTS
semi-join of Q4, the two-nation volume join of Q7, the market-share ratio
of Q8, the scale-relative HAVING of Q11, the count-of-counts left join of
Q13, the argmin-per-part correlated subquery of Q2, the per-order
exists/not-exists co-group of Q21, the anti-join + scalar-subquery
threshold of Q22 — is preserved, because the plan shape is what has to
survive at 100 TB. Every adaptation is stated in the query docstring.

Scale idioms (same vocabulary as relational.py):
- money/percent columns are exact fixed-point int64 (`_scaled_int`) so
  sums are order/retry-independent and hash-gate exact;
- small dimensions (part, supplier, customer, nation) broadcast once via
  ``ray.put`` as sorted key/value arrays probed with ``probe_sorted``;
- the one genuinely big×big edge (lineitem⋈orders) goes through the
  distributed sorted co-group ``functions/joins.attach_column`` — orders
  is never broadcast — and the lineitem side is always pre-filtered or
  pre-aggregated map-side so the shuffle carries the minimum;
- aggregations fold to per-block Arrow partials before ONE
  ``functions/grouped.sorted_aggregate`` exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from .relational import _read, _scaled_int

HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def _broadcast_sorted(sf_dir: str, table: str, key: str, cols: list[str]):
    """Read a small dimension once on the driver, sort by key, and
    ``ray.put`` the (keys, columns...) tuple for shuffle-free probes."""
    t = pq.read_table(f"{sf_dir}/{table}.parquet", columns=[key] + cols)
    k = pc.cast(t[key], pa.int64()).to_numpy()
    order = np.argsort(k)
    out = [k[order]]
    for c in cols:
        col = t[c].combine_chunks()
        if pa.types.is_integer(col.type):
            out.append(col.to_numpy(zero_copy_only=False)
                       .astype(np.int64)[order])
        elif pa.types.is_floating(col.type):
            out.append(col.to_numpy(zero_copy_only=False)[order])
        else:
            out.append(col.take(pa.array(order)))
    return ray.put(tuple(out))


def tpch_q4(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q4 (order priority checking) — the EXISTS semi-join.

    Adapted: the testdata has no l_commitdate/l_receiptdate, so the "late
    line" witness is ``l_returnflag = 'R'``. Orders placed in 1996 Q3 that
    have at least one such line, counted per priority.

    Plan: flagged lineitems collapse to DISTINCT orderkeys map-side
    (grouped_count partials — billions of lines become one row per
    (orderkey, block) before the shuffle), then ONE sorted co-group
    attaches the existence marker to the date-windowed orders scan
    (semi-join = inner attach of a distinct key set), then a tiny grouped
    count per priority."""
    from ..functions.grouped import grouped_count, sorted_aggregate
    from ..functions.joins import attach_column

    flagged = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]) \
        .map_batches(lambda b: b.filter(pc.equal(b["l_returnflag"], "R"))
                     .select(["l_orderkey"]),
                     batch_format="pyarrow", zero_copy_batch=True)
    witness = grouped_count(flagged, ["l_orderkey"], "__n", 8)

    def window(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"]
        m = pc.and_(
            pc.and_(pc.equal(pc.year(d), 1996),
                    pc.greater_equal(pc.month(d), 7)),
            pc.less_equal(pc.month(d), 9))
        return b.filter(m).select(["o_orderkey", "o_orderpriority"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                      "o_orderpriority"]) \
        .map_batches(window, batch_format="pyarrow", zero_copy_batch=True)
    semi = attach_column(
        orders, witness,
        [("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())],
        "o_orderkey", "l_orderkey", "__n", "__hit", pa.int64(), 8)
    return grouped_count(semi, ["o_orderpriority"], "order_count", 1)


def tpch_q12(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q12 (shipping-mode priority split) — the big×big join with
    conditional counts.

    Adapted: no l_shipmode/l_receiptdate; the grouping column is
    ``l_returnflag`` and the window is ship-year 1996. Per flag, count
    lines from high-priority orders (1-URGENT / 2-HIGH) vs the rest.

    Plan: lineitem pre-filters to the ship-year map-side, the order
    priority attaches through the distributed sorted co-group (orders is
    never broadcast), and the conditional counts fold to per-block
    partials before one 3-row exchange."""
    from ..functions.grouped import sorted_aggregate
    from ..functions.joins import attach_column

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag",
                                    "l_shipdate"]) \
        .map_batches(lambda b: b.filter(
            pc.equal(pc.year(b["l_shipdate"]), 1996))
            .select(["l_orderkey", "l_returnflag"]),
            batch_format="pyarrow", zero_copy_batch=True)
    joined = attach_column(
        li, _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]),
        [("l_orderkey", pa.int64()), ("l_returnflag", pa.string())],
        "l_orderkey", "o_orderkey", "o_orderpriority", "o_orderpriority",
        pa.string(), 8)

    def partial(b: pa.Table) -> pa.Table:
        hi = pc.cast(pc.is_in(b["o_orderpriority"],
                              value_set=pa.array(HIGH_PRIORITIES)),
                     pa.int64())
        t = pa.table({"l_returnflag": b["l_returnflag"],
                      "high_line_count": hi,
                      "low_line_count": pc.subtract(pa.scalar(1), hi)})
        return t.group_by(["l_returnflag"], use_threads=False).aggregate(
            [("high_line_count", "sum"), ("low_line_count", "sum")]) \
            .rename_columns(["l_returnflag", "high_line_count",
                             "low_line_count"])

    return sorted_aggregate(
        joined.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["l_returnflag"],
        [("high_line_count", "sum"), ("low_line_count", "sum")],
        ["l_returnflag", "high_line_count", "low_line_count"], 1)


def tpch_q13(sf_dir: str) -> pa.Table:
    """TPC-H Q13 (customer order-count distribution) — the count-of-counts
    with an explicit zero bucket.

    Adapted: no o_comment; the exclusion predicate is
    ``o_orderpriority <> '5-LOW'``.

    Plan: per-customer counts via grouped_count partials (one wide
    exchange keyed on custkey), then the distribution is a grouped count
    OVER the counts (tiny). The classic LEFT JOIN's zero bucket needs no
    join at all: customers-with-zero = |customer| − Σ custdist, where
    |customer| comes from parquet METADATA (no row is read) — the
    driver-side subtraction replaces an all-to-all outer join."""
    from ..functions.grouped import grouped_count

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]) \
        .map_batches(lambda b: b.filter(
            pc.not_equal(b["o_orderpriority"], "5-LOW"))
            .select(["o_custkey"]),
            batch_format="pyarrow", zero_copy_batch=True)
    per_cust = grouped_count(orders, ["o_custkey"], "c_count", 8)
    hist = grouped_count(per_cust, ["c_count"], "custdist", 1).to_pandas()

    n_cust = pq.ParquetFile(f"{sf_dir}/customer.parquet") \
        .metadata.num_rows
    n_zero = int(n_cust) - int(hist["custdist"].sum())
    counts = hist["c_count"].to_numpy().astype(np.int64)
    dist = hist["custdist"].to_numpy().astype(np.int64)
    if n_zero > 0:
        counts = np.concatenate([counts, [0]])
        dist = np.concatenate([dist, [n_zero]])
    return pa.table({"c_count": pa.array(counts, pa.int64()),
                     "custdist": pa.array(dist, pa.int64())})
