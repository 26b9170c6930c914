"""Relational operator demos over the TPC-H-ish testdata tables.

Each function is the Ray-Data-first expression of one operator family from
SURVEY.md §2, oracle-checked against DuckDB by the driver:

* :func:`lineitem_agg` — grouped aggregation with map-side partial combine
  (A1/A8: ``groupby().mean()`` / CQ-style aggregates). The per-block Arrow
  ``group_by`` collapses 60k rows to ~4 partials per block BEFORE the
  shuffle, so the all-to-all moves O(groups x blocks), not O(rows).
* :func:`orders_by_mktsegment` — broadcast-small-side join (J3,
  ``location_from_wikidata.py:398``): the 1.5k-row customer table rides the
  object store once; probe inside ``map_batches``.
* :func:`topk_customers` — groupby-sum + sort + limit (O3: ``ORDER BY SUM
  DESC LIMIT``).
* :func:`first_order_per_customer` — dedup-before-expensive-work (A4/ST5):
  ``groupby(key).min()``.
* :func:`revenue_by_brand` — two-hop broadcast join lineitem -> part.
* :func:`sessionize_events` — per-key ordered processing (§2.9 contract):
  ``groupby(user).map_groups`` with in-group sort by ts; a session breaks
  when the gap exceeds 30 minutes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

SESSION_GAP_S = 1800


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _scaled_int(arr, factor: float) -> pa.ChunkedArray:
    """Exact fixed-point encoding of a money/percentage column: the testdata
    amounts are exact multiples of 1/factor, so round(x*factor) is an exact
    int64 and SUMS BECOME ORDER-INDEPENDENT — a float64 sum over 60k rows
    differs from DuckDB's in the low bits (summation order), which would
    trip the driver's value-hash compare even though both are 'correct'.
    The oracle SQL applies the identical encoding."""
    return pc.cast(pc.round(pc.multiply(arr, pa.scalar(factor))), pa.int64())


def lineitem_agg(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-style pricing summary with map-side partial aggregation."""
    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        disc_price = pc.multiply(b["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "l_quantity": b["l_quantity"],
            "base_c": _scaled_int(b["l_extendedprice"], 100.0),
            "disc_price_c": _scaled_int(disc_price, 10000.0),
            "disc_c": _scaled_int(b["l_discount"], 100.0)})
        return t.group_by(["l_returnflag", "l_linestatus"],
                          use_threads=False).aggregate(
            [("l_quantity", "sum"), ("base_c", "sum"),
             ("disc_price_c", "sum"), ("disc_c", "sum"),
             ("l_quantity", "count")]).rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_c",
             "sum_disc_price_c", "sum_disc_c", "n_rows"])

    partials = li.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    from ..functions.grouped import sorted_aggregate
    agg = sorted_aggregate(
        partials, ["l_returnflag", "l_linestatus"],
        [("sum_qty", "sum"), ("sum_base_c", "sum"),
         ("sum_disc_price_c", "sum"), ("sum_disc_c", "sum"),
         ("n_rows", "sum")],
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_c",
         "sum_disc_price_c", "sum_disc_c", "count_order"],
        num_partitions=1)

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b["count_order"], pa.float64())
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "sum_qty": b["sum_qty"],
            "sum_base_price": pc.divide(
                pc.cast(b["sum_base_c"], pa.float64()), pa.scalar(100.0)),
            "sum_disc_price": pc.divide(
                pc.cast(b["sum_disc_price_c"], pa.float64()),
                pa.scalar(10000.0)),
            "avg_qty": pc.divide(pc.cast(b["sum_qty"], pa.float64()), n),
            "avg_disc": pc.divide(
                pc.divide(pc.cast(b["sum_disc_c"], pa.float64()),
                          pa.scalar(100.0)), n),
            "count_order": b["count_order"]})

    return agg.map_batches(finalize, batch_format="pyarrow") \
              .sort(["l_returnflag", "l_linestatus"])


def orders_by_mktsegment(sf_dir: str) -> ray.data.Dataset:
    """Broadcast join orders ⋈ customer -> revenue per market segment.

    The canonical big×small shape: the small side is `ray.put` ONCE as a
    sorted (custkey, segment-code) pair of numpy arrays and probed with a
    binary search per batch — no Python dict, no per-row loop. Each batch
    pre-aggregates to its ~5 segment partials (map-side combine), so the
    only all-to-all moves a handful of rows per block into one
    `sorted_aggregate`."""
    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    ck = cust["c_custkey"].to_numpy()
    seg = cust["c_mktsegment"].combine_chunks().dictionary_encode()
    seg_names = seg.dictionary.to_pylist()
    order = np.argsort(ck)
    lookup_ref = ray.put((ck[order],
                          seg.indices.to_numpy().astype(np.int32)[order]))

    class Probe:
        def __init__(self):
            self.keys, self.codes = ray.get(lookup_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            from ..functions.joins import probe_sorted
            k = pc.cast(b["o_custkey"], pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            codes = probe_sorted(self.keys, self.codes, k)
            part = pa.table({
                "seg_code": pa.array(codes, pa.int32()),
                "price_c": _scaled_int(b["o_totalprice"], 100.0)})
            return part.group_by("seg_code", use_threads=False).aggregate(
                [("price_c", "sum"), ("price_c", "count")]) \
                .rename_columns(["seg_code", "revenue_c", "n_orders"])

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    from ..functions.broadcast import broadcast_map_batches
    probed = broadcast_map_batches(orders, Probe, batch_format="pyarrow",
                                   zero_copy_batch=True)
    from ..functions.grouped import sorted_aggregate
    agg = sorted_aggregate(probed, ["seg_code"],
                           [("revenue_c", "sum"), ("n_orders", "sum")],
                           ["seg_code", "revenue_c", "n_orders"],
                           num_partitions=1)
    names_arr = pa.array(seg_names, pa.string())

    def finalize(b: pa.Table) -> pa.Table:
        code = b["seg_code"]
        # -1 = custkey absent from the small side (never in TPC-H FK data;
        # kept as a null segment like the dict-probe `.get` used to)
        name = pc.if_else(pc.less(code, 0), pa.scalar(None, pa.string()),
                          pc.take(names_arr, pc.max_element_wise(code, 0)))
        return pa.table({
            "mktsegment": name,
            "revenue": pc.divide(pc.cast(b["revenue_c"], pa.float64()),
                                 pa.scalar(100.0)),
            "n_orders": b["n_orders"]})

    return agg.map_batches(finalize, batch_format="pyarrow") \
              .sort("mktsegment")


def topk_customers(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        # map-side combine: collapse the batch to its distinct custkeys
        # before the shuffle (orders for one customer cluster in batches)
        t = pa.table({"o_custkey": b["o_custkey"],
                      "price_c": _scaled_int(b["o_totalprice"], 100.0)})
        return t.group_by("o_custkey", use_threads=False) \
                .aggregate([("price_c", "sum")]) \
                .rename_columns(["o_custkey", "price_c"])

    from ..functions.grouped import sorted_aggregate
    totals = sorted_aggregate(
        orders.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["o_custkey"], [("price_c", "sum")], ["o_custkey", "total_c"],
        num_partitions=8)

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"],
            "total_spent": pc.divide(pc.cast(b["total_c"], pa.float64()),
                                     pa.scalar(100.0))})

    return totals.map_batches(finalize, batch_format="pyarrow") \
                 .sort(["total_spent", "o_custkey"],
                       descending=[True, False]).limit(k)


def first_order_per_customer(sf_dir: str) -> ray.data.Dataset:
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by("o_custkey", use_threads=False) \
                .aggregate([("o_orderdate", "min"),
                            ("o_orderdate", "count")]) \
                .rename_columns(["o_custkey", "first_order", "n_orders"])

    from ..functions.grouped import sorted_aggregate
    # min-of-mins / sum-of-counts over the partials; sorted_aggregate
    # output is already globally ordered by o_custkey (range sort)
    return sorted_aggregate(
        orders.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["o_custkey"], [("first_order", "min"), ("n_orders", "sum")],
        ["o_custkey", "first_order", "n_orders"], num_partitions=8)


def revenue_by_brand(sf_dir: str) -> ray.data.Dataset:
    """lineitem ⋈ part (broadcast) -> discounted revenue per brand.

    Same shape as :func:`orders_by_mktsegment`: broadcast sorted
    (partkey, brand-code) arrays probed by binary search, per-batch partial
    aggregation to ~25 brand rows, one tiny global sorted_aggregate."""
    import pyarrow.parquet as pq
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    pk = part["p_partkey"].to_numpy()
    brand = part["p_brand"].combine_chunks().dictionary_encode()
    brand_names = brand.dictionary.to_pylist()
    order = np.argsort(pk)
    lookup_ref = ray.put((pk[order],
                          brand.indices.to_numpy().astype(np.int32)[order]))

    class Probe:
        def __init__(self):
            self.keys, self.codes = ray.get(lookup_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            from ..functions.joins import probe_sorted
            k = pc.cast(b["l_partkey"], pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            codes = probe_sorted(self.keys, self.codes, k)
            rev = pc.multiply(b["l_extendedprice"],
                              pc.subtract(pa.scalar(1.0), b["l_discount"]))
            part_t = pa.table({"brand_code": pa.array(codes, pa.int32()),
                               "revenue_c": _scaled_int(rev, 10000.0)})
            return part_t.group_by("brand_code", use_threads=False) \
                .aggregate([("revenue_c", "sum")]) \
                .rename_columns(["brand_code", "revenue_c"])

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount"])
    from ..functions.broadcast import broadcast_map_batches
    probed = broadcast_map_batches(li, Probe, batch_format="pyarrow",
                                   zero_copy_batch=True)
    from ..functions.grouped import sorted_aggregate
    agg = sorted_aggregate(probed, ["brand_code"], [("revenue_c", "sum")],
                           ["brand_code", "revenue_c"], num_partitions=1)
    names_arr = pa.array(brand_names, pa.string())

    def finalize(b: pa.Table) -> pa.Table:
        code = b["brand_code"]
        name = pc.if_else(pc.less(code, 0), pa.scalar(None, pa.string()),
                          pc.take(names_arr, pc.max_element_wise(code, 0)))
        return pa.table({
            "brand": name,
            "revenue": pc.divide(pc.cast(b["revenue_c"], pa.float64()),
                                 pa.scalar(10000.0))})

    return agg.map_batches(finalize, batch_format="pyarrow").sort("brand")


def windowed_event_agg(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-hour windows per event_type: the windowed-aggregate
    operator Ray Data lacks natively, composed as truncate-to-window
    (vectorized ``pc.floor_temporal``) + per-block partial combine +
    sorted-block global aggregate."""
    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        w = pc.floor_temporal(b["ts"], unit="hour")
        t = pa.table({"event_type": b["event_type"], "w": w,
                      "value_c": _scaled_int(b["value"], 100.0)})
        return t.group_by(["event_type", "w"], use_threads=False).aggregate(
            [("value_c", "sum"), ("value_c", "count")]).rename_columns(
            ["event_type", "w", "sum_value_c", "n"])

    from ..functions.grouped import sorted_aggregate
    partials = ev.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = sorted_aggregate(partials, ["event_type", "w"],
                           [("sum_value_c", "sum"), ("n", "sum")],
                           ["event_type", "w", "sum_value_c", "n"])

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"], "w": b["w"],
            "sum_value": pc.divide(pc.cast(b["sum_value_c"], pa.float64()),
                                   pa.scalar(100.0)),
            "n": b["n"]})

    return agg.map_batches(finalize, batch_format="pyarrow")


def json_props_sum(sf_dir: str) -> ray.data.Dataset:
    """Parse the stringified-JSON ``props`` column (the reference's
    stringified-dict repair, ``create_yelp_nt_files.py:116-119``, made
    vectorized): extract ``$.k`` with one RE2 kernel, sum per event_type."""
    ev = _read(sf_dir, "events", columns=["event_type", "props"])

    def extract(b: pa.Table) -> pa.Table:
        g = pc.extract_regex(b["props"], r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(g, "k"), pa.int64())
        t = pa.table({"event_type": b["event_type"], "k": k})
        return t.group_by(["event_type"], use_threads=False).aggregate(
            [("k", "sum"), ("k", "count")]).rename_columns(
            ["event_type", "sum_k", "n"])

    from ..functions.grouped import sorted_aggregate
    partials = ev.map_batches(extract, batch_format="pyarrow",
                              zero_copy_batch=True)
    return sorted_aggregate(partials, ["event_type"],
                            [("sum_k", "sum"), ("n", "sum")],
                            ["event_type", "sum_k", "n"])


def sessionize_events(sf_dir: str) -> ray.data.Dataset:
    """(user_id, n_events, n_sessions): session breaks at gaps > 30 min.
    Per-user ordered logic = groupby + in-group sort by ts (the transcript
    ordering contract of SURVEY.md §2.9 applied to the events table)."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def sessions_block(b: pa.Table) -> pa.Table:
        """Block sorted by user_id holds complete user groups
        (functions/grouped.py invariant; sorting by (user_id, ts) would NOT
        guarantee this — a range boundary could split one user mid-stream).
        ts is ordered per group inside the block with one lexsort; session
        counts are a vectorized diff + bincounts — no per-group Python."""
        from ..functions.grouped import group_ids
        out_schema = pa.schema([("user_id", pa.int64()),
                                ("n_events", pa.int64()),
                                ("n_sessions", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["user_id"])
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, gid))  # stable per-group ts ordering
        ts, ogid = ts[order], gid[order]
        gap = np.zeros(len(ts), dtype=np.int64)
        gap[1:] = (np.diff(ts) > SESSION_GAP_S * 1_000_000) & \
                  (ogid[1:] == ogid[:-1])
        n_events = np.bincount(ogid)
        n_sessions = np.bincount(ogid, weights=gap).astype(np.int64) + 1
        users = b["user_id"].take(pa.array(starts))
        return pa.table({
            "user_id": pc.cast(users, pa.int64()),
            "n_events": pa.array(n_events, pa.int64()),
            "n_sessions": pa.array(n_sessions, pa.int64())}, schema=out_schema)

    from ..functions.grouped import sorted_group_apply
    return sorted_group_apply(ev, ["user_id"], sessions_block) \
        .sort("user_id")


def running_sum_per_user(sf_dir: str) -> ray.data.Dataset:
    """Per-user running (cumulative) sum of ``value`` ordered by (ts,
    event_id) — the ``SUM(...) OVER (PARTITION BY user ORDER BY ts)``
    window function Ray Data lacks, built on the sorted-block primitive:
    ONE key-sort colocates each user's complete history in one block
    (functions/grouped.py invariant), an in-block lexsort orders it, and the
    prefix sum is a vectorized group-offset cumsum — no per-group Python.

    Values are fixed-point cents (int64) end to end so the prefix sums are
    order-independent-exact vs the SQL oracle (DuckDB's windowed SUM uses a
    segment tree whose float association differs from a sequential cumsum —
    integers make both associations identical).

    Scale note: one all-to-all on user_id; a user's whole history must fit a
    block, the same per-key bound sessionize already documents.
    """
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "value"])

    def cumsum_block(b: pa.Table) -> pa.Table:
        from ..functions.grouped import group_ids
        out_schema = pa.schema([("event_id", pa.int64()),
                                ("user_id", pa.int64()),
                                ("cum_value_c", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["user_id"])
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].to_numpy()
        order = np.lexsort((eid, ts, gid))  # (user, ts, event_id) total order
        v = _scaled_int(b["value"], 100.0).to_numpy()[order]
        cs = np.cumsum(v)
        # subtract the prefix before each group start -> per-group cumsum
        base = np.where(starts > 0, cs[np.maximum(starts - 1, 0)], 0)
        cum = cs - base[gid[order]]
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "user_id": pc.cast(b["user_id"].take(pa.array(order)), pa.int64()),
            "cum_value_c": pa.array(cum, pa.int64())}, schema=out_schema)

    from ..functions.grouped import sorted_group_apply
    return sorted_group_apply(ev, ["user_id"], cumsum_block).sort("event_id")


def lag_gap_per_user(sf_dir: str) -> ray.data.Dataset:
    """Per-event gap to the user's PREVIOUS event in microseconds — the
    ``LAG()`` window function (NULL for each user's first event), built on
    the same sorted-block + in-block lexsort shape as
    :func:`running_sum_per_user`. Output: (event_id, user_id, prev_gap_us)
    sorted by event_id."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def lag_block(b: pa.Table) -> pa.Table:
        from ..functions.grouped import group_ids
        out_schema = pa.schema([("event_id", pa.int64()),
                                ("user_id", pa.int64()),
                                ("prev_gap_us", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].to_numpy()
        order = np.lexsort((eid, ts, gid))
        ts, ogid, eid = ts[order], gid[order], eid[order]
        gap = np.empty(len(ts), np.int64)
        gap[1:] = ts[1:] - ts[:-1]
        first = np.concatenate([[True], ogid[1:] != ogid[:-1]])
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pc.cast(b["user_id"].take(pa.array(order)),
                               pa.int64()),
            "prev_gap_us": pa.array(np.ma.masked_array(gap, mask=first),
                                    pa.int64())}, schema=out_schema)

    from ..functions.grouped import sorted_group_apply
    return sorted_group_apply(ev, ["user_id"], lag_block).sort("event_id")


def lineitem_rollup(sf_dir: str) -> ray.data.Dataset:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) over lineitem quantity —
    the hierarchy-subtotal aggregate. Ray Data has no ROLLUP; it is three
    grouped sums where each coarser level re-aggregates the PREVIOUS
    level's (already tiny) output, so the full table is shuffled exactly
    once. NULL marks the rolled-up dimension, as in SQL."""
    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(["l_returnflag", "l_linestatus"],
                          use_threads=False) \
                .aggregate([("l_quantity", "sum")]) \
                .rename_columns(["l_returnflag", "l_linestatus", "sum_qty"])

    from ..functions.grouped import sorted_aggregate
    lvl2 = sorted_aggregate(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["l_returnflag", "l_linestatus"], [("sum_qty", "sum")],
        ["l_returnflag", "l_linestatus", "sum_qty"], 1).materialize()
    lvl1 = sorted_aggregate(lvl2, ["l_returnflag"], [("sum_qty", "sum")],
                            ["l_returnflag", "sum_qty"], 1) \
        .map_batches(lambda b: b.add_column(
            1, "l_linestatus", pa.nulls(b.num_rows, pa.string())),
            batch_format="pyarrow").materialize()
    total = lvl1.map_batches(
        lambda b: pa.table({
            "l_returnflag": pa.nulls(1, pa.string()),
            "l_linestatus": pa.nulls(1, pa.string()),
            "sum_qty": pa.array([pc.sum(b["sum_qty"]).as_py()],
                                pa.float64())})
        if b.num_rows else b, batch_format="pyarrow", batch_size=None)
    # lvl1 arrives in one block (num_partitions=1), so `total` is exact
    return lvl2.union(lvl1, total.limit(1))


def sliding_window_agg(sf_dir: str, width_s: int = 3600,
                       slide_s: int = 1800) -> ray.data.Dataset:
    """OVERLAPPING (sliding) windows per event_type — the hop-window
    generalization of :func:`windowed_event_agg`. Each event belongs to
    exactly ``width/slide`` windows; the replication happens MAP-SIDE with a
    bounded fan-out and is partial-combined per block before the one
    all-to-all, so the shuffle moves (type, window) partials, not
    width/slide copies of the event stream.

    Window starts are epoch-second integers on both engines (kept as BIGINT
    end to end — no timestamp round-tripping to disagree over).
    """
    assert width_s % slide_s == 0
    k = width_s // slide_s
    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        # Arrow timestamp -> epoch seconds (column unit is us in the fixture;
        # derive the divisor from the type so any unit works)
        unit = b.schema.field("ts").type.unit
        div = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        sec = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False) \
            // div
        w0 = (sec // slide_s) * slide_s
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        vc = _scaled_int(b["value"], 100.0)
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        t = pa.table({
            "event_type": pa.concat_arrays([et] * k),
            "w_start_s": pa.array(np.concatenate(
                [w0 - i * slide_s for i in range(k)])),
            "value_c": pa.concat_arrays([vc] * k)})
        return t.group_by(["event_type", "w_start_s"],
                          use_threads=False).aggregate(
            [("value_c", "sum"), ("value_c", "count")]).rename_columns(
            ["event_type", "w_start_s", "sum_value_c", "n"])

    from ..functions.grouped import sorted_aggregate
    partials = ev.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = sorted_aggregate(partials, ["event_type", "w_start_s"],
                           [("sum_value_c", "sum"), ("n", "sum")],
                           ["event_type", "w_start_s", "sum_value_c", "n"])

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"], "w_start_s": b["w_start_s"],
            "sum_value": pc.divide(pc.cast(b["sum_value_c"], pa.float64()),
                                   pa.scalar(100.0)),
            "n": b["n"]})

    return agg.map_batches(finalize, batch_format="pyarrow")


def moving_sum_per_user(sf_dir: str, width: int = 3) -> ray.data.Dataset:
    """Per-user moving-window sum over the last ``width`` events ordered by
    (ts, event_id) — the ``SUM(...) OVER (... ROWS BETWEEN width-1 PRECEDING
    AND CURRENT ROW)`` window frame, built on the same sorted-block +
    in-block lexsort shape as :func:`running_sum_per_user`: ONE all-to-all on
    user_id, then a vectorized within-group prefix-sum difference
    ``cum[i] - cum[i-width]`` (no per-group Python). Values are fixed-point
    cents so the Ray sum and DuckDB's windowed sum are bit-identical.
    Output: (event_id, user_id, win_sum_c, win_n) sorted by event_id."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "value"])

    def window_block(b: pa.Table) -> pa.Table:
        from ..functions.grouped import group_ids
        out_schema = pa.schema([("event_id", pa.int64()),
                                ("user_id", pa.int64()),
                                ("win_sum_c", pa.int64()),
                                ("win_n", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["user_id"])
        n = b.num_rows
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].to_numpy()
        order = np.lexsort((eid, ts, gid))
        v = _scaled_int(b["value"], 100.0).to_numpy()[order]
        ogid = gid[order]  # lexsort is stable on its last key: still grouped
        cs = np.cumsum(v)
        base = np.where(starts > 0, cs[np.maximum(starts - 1, 0)], 0)
        cumw = cs - base[ogid]                      # within-group cumsum
        pos = np.arange(n) - starts[ogid]           # 0-based pos in group
        prev = np.zeros(n, np.int64)
        far = pos >= width                          # window fully inside grp
        prev[far] = cumw[np.flatnonzero(far) - width]
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "user_id": pc.cast(b["user_id"].take(pa.array(order)),
                               pa.int64()),
            "win_sum_c": pa.array(cumw - prev, pa.int64()),
            "win_n": pa.array(np.minimum(pos + 1, width), pa.int64())},
            schema=out_schema)

    from ..functions.grouped import sorted_group_apply
    return sorted_group_apply(ev, ["user_id"], window_block).sort("event_id")


def rank_events_per_user(sf_dir: str) -> ray.data.Dataset:
    """``RANK()`` and ``DENSE_RANK()`` per user over event value (cents,
    descending) — the tie-aware window ranks Ray Data lacks, in one key-sort:
    within each sorted block, order rows by (user, -value_c) and derive both
    ranks from value-change flags (rank = offset of the last change row
    inside the group + 1; dense rank = running count of change rows) — all
    numpy accumulations, no per-group Python. Ties share a rank on BOTH
    engines because both order by the identical int64 cents key.
    Output: (event_id, user_id, rk, drk) sorted by event_id."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def rank_block(b: pa.Table) -> pa.Table:
        from ..functions.grouped import group_ids
        out_schema = pa.schema([("event_id", pa.int64()),
                                ("user_id", pa.int64()),
                                ("rk", pa.int64()), ("drk", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["user_id"])
        n = b.num_rows
        v = _scaled_int(b["value"], 100.0).to_numpy()
        eid = b["event_id"].to_numpy()
        order = np.lexsort((-v, gid))
        ov, ogid, oeid = v[order], gid[order], eid[order]
        chg = np.empty(n, bool)
        chg[0] = True
        chg[1:] = (ov[1:] != ov[:-1]) | (ogid[1:] != ogid[:-1])
        last_chg = np.maximum.accumulate(np.where(chg, np.arange(n), -1))
        rk = last_chg - starts[ogid] + 1
        c = np.cumsum(chg)
        drk = c - (c[starts[ogid]] - 1)
        return pa.table({
            "event_id": pa.array(oeid, pa.int64()),
            "user_id": pc.cast(b["user_id"].take(pa.array(order)),
                               pa.int64()),
            "rk": pa.array(rk, pa.int64()),
            "drk": pa.array(drk, pa.int64())}, schema=out_schema)

    from ..functions.grouped import sorted_group_apply
    return sorted_group_apply(ev, ["user_id"], rank_block).sort("event_id")


def tag_late_events(sf_dir: str, lateness_us: int = 3_600_000_000
                    ) -> ray.data.Dataset:
    """Watermark-style out-of-order tagging — the streaming late-data
    concept expressed over a batch table (the reference is batch-only,
    SURVEY §2.9): events arrive per user in ``event_id`` order; the
    watermark before event e is the running max event-time of everything
    that arrived earlier, minus ``lateness_us``. An event whose own time
    sits below that watermark would have been dropped/special-cased by a
    streaming engine — tagging them is how a backfill audits its sources.

    Arrival model: the fixture's event_ids are assigned in timestamp order
    (zero out-of-orderness by construction), so arrival is modeled as a
    4-shard collector — shard ``event_id % 4``, each shard delivering in
    (ts, event_id) order, shards concatenated — the classic multi-source
    backfill where later shards replay history and look late.

    Same sorted-block shape as the other window ops: ONE all-to-all on
    user_id; the per-group running max is pandas ``groupby().cummax()``
    (vectorized C — numpy has no exact segmented cummax, and the
    offset-into-disjoint-ranges trick overflows int64 on microsecond
    timestamps). Output: (event_id, user_id, watermark_us [null for each
    user's first arrival], is_late) sorted by event_id."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def late_block(b: pa.Table) -> pa.Table:
        import pandas as pd

        from ..functions.grouped import group_ids
        out_schema = pa.schema([("event_id", pa.int64()),
                                ("user_id", pa.int64()),
                                ("watermark_us", pa.int64()),
                                ("is_late", pa.bool_())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].to_numpy()
        shard = eid % 4
        order = np.lexsort((eid, ts, shard, gid))  # shard-major arrival
        ts_o, ogid, eid_o = ts[order], gid[order], eid[order]
        runmax = pd.Series(ts_o).groupby(ogid).cummax().to_numpy()
        prev = np.empty_like(runmax)
        prev[1:] = runmax[:-1]
        first = np.empty(len(ts_o), bool)
        first[0] = True
        first[1:] = ogid[1:] != ogid[:-1]
        wm = prev - lateness_us
        late = (~first) & (ts_o < wm)
        return pa.table({
            "event_id": pa.array(eid_o, pa.int64()),
            "user_id": pc.cast(b["user_id"].take(pa.array(order)),
                               pa.int64()),
            "watermark_us": pa.array(np.ma.masked_array(wm, mask=first),
                                     pa.int64()),
            "is_late": pa.array(late)}, schema=out_schema)

    from ..functions.grouped import sorted_group_apply
    return sorted_group_apply(ev, ["user_id"], late_block).sort("event_id")


def tpch_q3_revenue(sf_dir: str, segment: str = "BUILDING",
                    cutoff: str = "1997-01-01", k: int = 10
                    ) -> ray.data.Dataset:
    """TPC-H Q3 shape — the three-table composition demo: segment customers
    ⋈ pre-cutoff orders ⋈ post-cutoff lineitems, top-k orders by revenue.

    Every join picks the engine's scale idiom for its shape:
    1. customer is the small side — its segment keys broadcast once
       (`joins.distinct_int_keys` + `broadcast_semi_filter`), so orders are
       only SCANNED, never shuffled against customer;
    2. lineitem revenue pre-aggregates map-side per (block, orderkey) in
       exact fixed point (cents × percent: price_c · (100 − disc_pct), all
       int64) before ONE sum all-to-all;
    3. order dates attach to the aggregated (order-count-sized) table via
       the int-key co-group join;
    4. global top-k rides `topn.top_n_per_key` with a constant key — its
       map-side prune ships ≤ k rows per block to the final cut.
    Output: (l_orderkey, revenue_fp, o_orderdate), revenue_fp at the
    10^-4 fixed-point scale, ordered by revenue desc / orderkey asc."""
    from ..functions.joins import (
        attach_column,
        broadcast_semi_filter,
        distinct_int_keys,
    )
    from ..functions.topn import top_n_per_key

    cut = np.datetime64(cutoff, "us")
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    seg_keys = distinct_int_keys(
        cust.map_batches(
            lambda b: b.filter(pc.equal(b["c_mktsegment"], segment)),
            batch_format="pyarrow", zero_copy_batch=True),
        ["c_custkey"])

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda b: b.filter(pc.less(b["o_orderdate"],
                                   pa.scalar(cut.item(),
                                             pa.timestamp("us")))),
        batch_format="pyarrow", zero_copy_batch=True)
    orders = broadcast_semi_filter(orders, "o_custkey", seg_keys)

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b["l_shipdate"],
                                pa.scalar(cut.item(), pa.timestamp("us"))))
        price_c = _scaled_int(t["l_extendedprice"], 100.0).to_numpy()
        disc = _scaled_int(t["l_discount"], 100.0).to_numpy()
        rev = price_c * (100 - disc)
        p = pa.table({"l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                      "rev": pa.array(rev, pa.int64())})
        return p.group_by(["l_orderkey"], use_threads=False) \
            .aggregate([("rev", "sum")]) \
            .rename_columns(["l_orderkey", "rev"])

    from ..functions.grouped import sorted_aggregate
    rev = sorted_aggregate(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["l_orderkey"], [("rev", "sum")], ["l_orderkey", "revenue_fp"], 8)

    dated = attach_column(
        rev, orders, [("l_orderkey", pa.int64()),
                      ("revenue_fp", pa.int64())],
        "l_orderkey", "o_orderkey", "o_orderdate", "o_orderdate",
        pa.timestamp("us"), 8)

    topk = top_n_per_key(
        dated.map_batches(
            lambda b: b.append_column("__g", pa.array(
                np.zeros(b.num_rows, np.int64))),
            batch_format="pyarrow", zero_copy_batch=True),
        ["__g"], [("revenue_fp", False), ("l_orderkey", True)], k)
    return topk.map_batches(
        lambda b: b.select(["l_orderkey", "revenue_fp", "o_orderdate"]),
        batch_format="pyarrow", zero_copy_batch=True)


def funnel_per_user(sf_dir: str,
                    stages: tuple[str, ...] = ("view", "click", "purchase")
                    ) -> ray.data.Dataset:
    """Funnel analysis: for each user, the earliest strictly-ordered
    completion of the stage sequence (first 'view', then the first 'click'
    AFTER it, then the first 'purchase' after that) — the classic product
    funnel, which SQL needs chained self-joins for and Ray Data has no
    native operator for.

    ONE all-to-all on user_id; inside each sorted block the per-stage
    "first event after the previous stage's time" is a masked
    ``np.minimum.at`` per group — no ordering pass needed at all, because
    each stage is an independent min under a (type, ts > prev) mask.
    Output: (user_id, t1_us, t2_us, t3_us) with nulls where the funnel
    stalls, sorted by user_id."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def funnel_block(b: pa.Table) -> pa.Table:
        from ..functions.grouped import group_ids
        names = [f"t{i + 1}_us" for i in range(len(stages))]
        out_schema = pa.schema([("user_id", pa.int64())]
                               + [(n, pa.int64()) for n in names])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["user_id"])
        n_groups = len(starts)
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        prev = np.full(n_groups, -(2 ** 62), np.int64)
        cols = {"user_id": pc.cast(
            b["user_id"].take(pa.array(starts)), pa.int64())}
        big = 2 ** 62
        for stage, name in zip(stages, names):
            cur = np.full(n_groups, big, np.int64)
            m = (et == stage) & (ts > prev[gid])
            np.minimum.at(cur, gid[m], ts[m])
            cols[name] = pa.array(
                np.ma.masked_array(cur, mask=cur == big), pa.int64())
            prev = cur
        return pa.table(cols, schema=out_schema)

    from ..functions.grouped import sorted_group_apply
    return sorted_group_apply(ev, ["user_id"], funnel_block).sort("user_id")


def event_transitions(sf_dir: str) -> ray.data.Dataset:
    """Per-user event-type transition counts — the Markov-chain statistic
    behavioral pipelines build (``LAG`` + grouped count in SQL): for each
    user's arrival-ordered stream, count (previous type -> type) pairs,
    summed over all users.

    Sorted-block lexsort gives each user's ordered stream; the shifted
    type-code array pairs every event with its predecessor (first event per
    user has none); per-block Arrow ``group_by`` partials collapse to the
    ~|types|² matrix before ONE tiny all-to-all. Output: (prev_type,
    event_type, n) sorted."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        from ..functions.grouped import group_ids
        out_schema = pa.schema([("prev_type", pa.string()),
                                ("event_type", pa.string()),
                                ("n", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].to_numpy()
        order = np.lexsort((eid, ts, gid))
        et = b["event_type"].to_numpy(zero_copy_only=False)[order]
        ogid = gid[order]
        has_prev = np.empty(len(et), bool)
        has_prev[0] = False
        has_prev[1:] = ogid[1:] == ogid[:-1]
        prev = np.roll(et, 1)
        t = pa.table({"prev_type": pa.array(prev[has_prev], pa.string()),
                      "event_type": pa.array(et[has_prev], pa.string())})
        return t.group_by(["prev_type", "event_type"],
                          use_threads=False).aggregate([([], "count_all")]) \
            .rename_columns(["prev_type", "event_type", "n"])

    from ..functions.grouped import sorted_aggregate, sorted_group_apply
    partials = sorted_group_apply(ev, ["user_id"], partial)
    return sorted_aggregate(partials, ["prev_type", "event_type"],
                            [("n", "sum")],
                            ["prev_type", "event_type", "n"], 1)


def retention_cohorts(sf_dir: str) -> ray.data.Dataset:
    """Cohort retention matrix — the product-analytics staple: users are
    grouped by the week of their FIRST event (cohort) and counted in every
    week they were active, yielding (cohort_week, week, n_users).

    Weeks are pure integer buckets (epoch_us // 7-days-of-us) so both
    engines bucket identically — calendar `date_trunc('week')` semantics
    differ subtly between engines. Three passes, each the engine's scale
    idiom: grouped min (cohort), distinct (activity), int-key co-group
    attach, grouped count with map-side combine."""
    from ..functions.grouped import grouped_count, sorted_aggregate
    from ..functions.joins import attach_column
    from ..functions.pagerank import _distinct

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    week_us = 7 * 86400 * 10**6

    def to_weeks(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        return pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "wk": pc.divide(us, pa.scalar(week_us, pa.int64()))})

    w = ev.map_batches(to_weeks, batch_format="pyarrow",
                       zero_copy_batch=True)
    first = sorted_aggregate(w, ["user_id"], [("wk", "min")],
                             ["user_id", "cohort"], 4)
    activity = _distinct(w, ["user_id", "wk"], 4)
    joined = attach_column(
        activity, first, [("user_id", pa.int64()), ("wk", pa.int64())],
        "user_id", "user_id", "cohort", "cohort", pa.int64(), 4)
    return grouped_count(
        joined.map_batches(lambda b: b.select(["cohort", "wk"]),
                           batch_format="pyarrow", zero_copy_batch=True),
        ["cohort", "wk"], "n_users", 4)


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def bloom_semi_join(sf_dir: str) -> ray.data.Dataset:
    """Two-phase Bloom semi-join: lineitem rows of URGENT orders, aggregated.

    The scale pattern for big-probe/medium-build semi-joins (SURVEY.md §2.6
    joins family): instead of shuffling 100 TB of lineitem against the
    filtered orders, (1) each block of the filtered BUILD side reduces to
    distinct keys, (2) the keys become a Bloom filter (16 bits/key — 32x
    smaller than the key array) broadcast via ``ray.put`` ONCE, (3) the
    probe side is only SCANNED, dropping ~all non-matching rows in place,
    and (4) the bloom's false positives (~0.05%, never negatives) are
    removed by an EXACT shuffle co-group join of the tiny survivor set
    against the build keys (``functions/joins.attach_column``). The final
    grouped sum uses map-side partials in fixed point.

    Output: (l_returnflag, sum_qty_c) — sum of quantity cents over lineitem
    rows whose order is 1-URGENT.
    """
    from ..functions.grouped import sorted_aggregate
    from ..functions.joins import (BloomFilter, attach_column,
                                   distinct_int_keys)

    orders = _read(sf_dir, "orders", columns=["o_orderkey",
                                              "o_orderpriority"])
    urgent = orders.map_batches(
        lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))
        .select(["o_orderkey"]),
        batch_format="pyarrow", zero_copy_batch=True)
    keys = distinct_int_keys(urgent, ["o_orderkey"])
    bloom_ref = ray.put(BloomFilter(keys))

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag",
                                            "l_quantity"])

    def probe(b: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref)
        if b.num_rows == 0:
            return b
        v = pc.cast(b["l_orderkey"], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(bf.might_contain(v)))
        return pa.table({"l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                         "l_returnflag": t["l_returnflag"],
                         "qty_c": _scaled_int(t["l_quantity"], 100.0)})

    survivors = li.map_batches(probe, batch_format="pyarrow",
                               zero_copy_batch=True)
    # exact verify: inner co-group join against the true key set drops the
    # bloom's false positives (urgent orders re-read as a Dataset so the
    # exact phase is a shuffle, not another driver broadcast)
    verified = attach_column(
        survivors, urgent.map_batches(
            lambda b: b.append_column("one", pa.nulls(b.num_rows, pa.int8())),
            batch_format="pyarrow"),
        [("l_returnflag", pa.string()), ("qty_c", pa.int64())],
        "l_orderkey", "o_orderkey", "one", "one", pa.int8())

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(["l_returnflag"], use_threads=False) \
                .aggregate([("qty_c", "sum")]) \
                .rename_columns(["l_returnflag", "sum_qty_c"])

    return sorted_aggregate(
        verified.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag"], [("sum_qty_c", "sum")],
        ["l_returnflag", "sum_qty_c"], 1)


def pivot_event_counts(sf_dir: str) -> ray.data.Dataset:
    """PIVOT: per-user event counts, one column per event type.

    Ray Data has no pivot; the closed type vocabulary (``EVENT_TYPES``)
    makes it a fixed-width grouped sum: each block scatters its rows into a
    (users-in-block x types) count matrix via ``np.add.at`` (one pass, no
    per-group Python), emits one partial row per user, and ONE shuffle sums
    the partials. Unknown types fail loudly rather than silently dropping.
    """
    from ..functions.grouped import sorted_aggregate

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    cols = [f"n_{t}" for t in EVENT_TYPES]

    def partial(b: pa.Table) -> pa.Table:
        schema = pa.schema([("user_id", pa.int64())] +
                           [(c, pa.int64()) for c in cols])
        if b.num_rows == 0:
            return schema.empty_table()
        et = pc.index_in(b["event_type"],
                         value_set=pa.array(EVENT_TYPES))
        if et.null_count:
            raise ValueError("pivot_event_counts: unknown event_type")
        uid = pc.cast(b["user_id"], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        users, uidx = np.unique(uid, return_inverse=True)
        counts = np.zeros((len(users), len(EVENT_TYPES)), np.int64)
        np.add.at(counts, (uidx, et.combine_chunks()
                           .to_numpy(zero_copy_only=False)), 1)
        return pa.table(
            {"user_id": pa.array(users, pa.int64()),
             **{c: pa.array(counts[:, i], pa.int64())
                for i, c in enumerate(cols)}}, schema=schema)

    return sorted_aggregate(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], [(c, "sum") for c in cols], ["user_id", *cols], 4)


def gap_fill_daily_counts(sf_dir: str) -> ray.data.Dataset:
    """Calendar densification: per (event_type, day) counts with explicit
    zero rows for every day in the observed [min, max] range — the gap-fill
    / date-spine operator time-series pipelines need before windowing.

    The spine is a DIMENSION table (days x closed type set — tiny at any
    data scale: 10 years x 1000 types = 3.65M rows) built driver-side from
    two scalar aggregates (min/max day — per-block partials reduce to one
    pair per block before the driver sees anything); the fill is a UNION of
    the real counts with zero spine rows followed by the same grouped sum
    the counts used, so there is no left join at all. ``day`` is the
    integer epoch-day bucket (epoch_us // 86400e6) — pure integer on both
    engines, immune to calendar/timezone divergence.
    """
    from ..functions.grouped import grouped_count, sorted_aggregate

    ev = _read(sf_dir, "events", columns=["event_type", "ts"])
    day_us = 86400 * 10**6

    def to_days(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "day": pc.divide(pc.cast(b["ts"], pa.int64()),
                             pa.scalar(day_us, pa.int64()))})

    days = ev.map_batches(to_days, batch_format="pyarrow",
                          zero_copy_batch=True)
    counts = grouped_count(days, ["event_type", "day"], "n", 4)

    def minmax_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("lo", pa.int64()),
                              ("hi", pa.int64())]).empty_table()
        return pa.table({"lo": [pc.min(b["day"]).as_py()],
                         "hi": [pc.max(b["day"]).as_py()]})

    mm = pa.concat_tables(ray.get(
        days.map_batches(minmax_partial, batch_format="pyarrow")
        .to_arrow_refs()))
    lo = pc.min(mm["lo"]).as_py()
    hi = pc.max(mm["hi"]).as_py()
    dr = np.arange(lo, hi + 1, dtype=np.int64)
    spine = ray.data.from_arrow(pa.table({
        "event_type": pa.array(np.repeat(EVENT_TYPES, len(dr))),
        "day": pa.array(np.tile(dr, len(EVENT_TYPES)), pa.int64()),
        "n": pa.array(np.zeros(len(dr) * len(EVENT_TYPES), np.int64))}))
    return sorted_aggregate(counts.union(spine), ["event_type", "day"],
                            [("n", "sum")], ["event_type", "day", "n"], 4)


def percent_rank_qty(sf_dir: str) -> ray.data.Dataset:
    """PERCENT_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
    in exact fixed point: pr6 = (rank - 1) * 10^6 // (n_group - 1).

    Same sorted-block window shape as :func:`rank_events_per_user`: ONE
    key-sort colocates each flag's rows, an in-block lexsort orders by
    quantity, RANK comes from value-change flags, and the integer division
    keeps the result bit-identical to the SQL oracle (PERCENT_RANK itself
    returns a double whose low bits differ by evaluation order).
    """
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_returnflag",
                        "l_quantity"])

    def pr_block(b: pa.Table) -> pa.Table:
        from ..functions.grouped import group_ids
        out_schema = pa.schema([
            ("l_orderkey", pa.int64()), ("l_linenumber", pa.int32()),
            ("l_returnflag", pa.string()), ("pr6", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["l_returnflag"])
        qty = b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        ln = b["l_linenumber"].combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.lexsort((ln, ok, qty, gid))
        g, q = gid[order], qty[order]
        pos = np.arange(len(g), dtype=np.int64) - starts[g]
        new_val = np.concatenate([[True],
                                  (q[1:] != q[:-1]) | (g[1:] != g[:-1])])
        # RANK(): position of the first row of each tie run within its group
        rank = pos[np.maximum.accumulate(
            np.where(new_val, np.arange(len(g)), 0))] + 1
        sizes = np.diff(np.append(starts, len(g)))
        pr6 = (rank - 1) * 1_000_000 // np.maximum(sizes[g] - 1, 1)
        return pa.table({
            "l_orderkey": pa.array(ok[order], pa.int64()),
            "l_linenumber": pa.array(ln[order], pa.int32()),
            "l_returnflag": b["l_returnflag"].take(pa.array(order)),
            "pr6": pa.array(pr6, pa.int64())}, schema=out_schema)

    from ..functions.grouped import sorted_group_apply
    return sorted_group_apply(li, ["l_returnflag"], pr_block)


def collapse_rapid_repeats(sf_dir: str, window_s: int = 60
                           ) -> ray.data.Dataset:
    """Burst collapse: drop events that repeat the same (user, event_type)
    within ``window_s`` of the previous such event — the near-consecutive
    dedup stage click-stream pipelines run before counting. LAG semantics
    (gap to the previous RAW event, not the previous KEPT one), so the op
    is one sorted-block window, embarrassingly parallel after ONE key
    shuffle. Output: surviving (event_id, user_id, event_type).
    """
    ev = _read(sf_dir, "events", columns=["event_id", "user_id",
                                          "event_type", "ts"])
    win_us = window_s * 10**6

    def keep_block(b: pa.Table) -> pa.Table:
        from ..functions.grouped import group_ids
        out_schema = pa.schema([("event_id", pa.int64()),
                                ("user_id", pa.int64()),
                                ("event_type", pa.string())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["user_id", "event_type"])
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, gid))
        ts, g, eid = ts[order], gid[order], eid[order]
        gap = np.empty(len(ts), np.int64)
        gap[0] = win_us  # first row: no predecessor -> keep
        gap[1:] = np.where(g[1:] == g[:-1], ts[1:] - ts[:-1], win_us)
        keep = gap >= win_us
        sel = pa.array(order[keep])
        return pa.table({
            "event_id": pa.array(eid[keep], pa.int64()),
            "user_id": pc.cast(b["user_id"].take(sel), pa.int64()),
            "event_type": b["event_type"].take(sel)}, schema=out_schema)

    from ..functions.grouped import sorted_group_apply
    return sorted_group_apply(ev, ["user_id", "event_type"], keep_block) \
        .sort("event_id")


def anomaly_events(sf_dir: str) -> ray.data.Dataset:
    """Per-type z-score outliers in EXACT integer arithmetic: flag events
    with value > mean + 2*stddev of their event_type.

    stddev needs a sqrt, which no integer engine has — so the comparison is
    squared instead: with cents v, group stats n, S=sum(v), SS=sum(v^2),

        v > mu + 2*sigma  <=>  d := n*v - S > 0  and  d^2 > 4*(n*SS - S^2)

    (both sides multiplied by n^2 — population variance). Stats are one
    tiny grouped sum (map-side partials); the per-row flag is a broadcast
    probe, so the table is scanned exactly twice and nothing but the
    5-row stats table crosses stages. Magnitudes: v<=5e4 cents, n<=2e4 at
    sf0.1 -> d^2 <= 9.6e17 < 2^63, checked at runtime.

    Output: flagged (event_id, event_type, value_c) rows.
    """
    from ..functions.grouped import sorted_aggregate

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def stats_partial(b: pa.Table) -> pa.Table:
        v = _scaled_int(b["value"], 100.0)
        t = pa.table({"event_type": b["event_type"], "n": pa.nulls(
            b.num_rows, pa.int64()).fill_null(1),
            "s": v, "ss": pc.multiply(v, v)})
        return t.group_by(["event_type"], use_threads=False).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")]) \
            .rename_columns(["event_type", "n", "s", "ss"])

    stats = sorted_aggregate(
        ev.map_batches(stats_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["event_type"], [("n", "sum"), ("s", "sum"), ("ss", "sum")],
        ["event_type", "n", "s", "ss"], 1)
    st = stats.take_all()  # closed type set: always a handful of rows
    by_type = {r["event_type"]: (r["n"], r["s"], r["ss"]) for r in st}
    for n, s, ss in by_type.values():
        if n * ss >= (1 << 62):  # headroom check for d^2 below
            raise OverflowError("anomaly_events: rescale values")
    ref = ray.put(by_type)

    def flag(b: pa.Table) -> pa.Table:
        schema = pa.schema([("event_id", pa.int64()),
                            ("event_type", pa.string()),
                            ("value_c", pa.int64())])
        if b.num_rows == 0:
            return schema.empty_table()
        tbl = ray.get(ref)
        et = b["event_type"].combine_chunks()
        v = _scaled_int(b["value"], 100.0).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        types, (ns, ses, sss) = list(tbl), zip(*tbl.values())
        code = pc.index_in(et, value_set=pa.array(types)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = np.asarray(ns, np.int64)[code]
        s = np.asarray(ses, np.int64)[code]
        ss = np.asarray(sss, np.int64)[code]
        d = n * v - s
        keep = (d > 0) & (d * d > 4 * (n * ss - s * s))
        t = b.filter(pa.array(keep))
        return pa.table({"event_id": pc.cast(t["event_id"], pa.int64()),
                         "event_type": t["event_type"],
                         "value_c": _scaled_int(t["value"], 100.0)},
                        schema=schema)

    return ev.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def lineitem_cube(sf_dir: str) -> ray.data.Dataset:
    """GROUP BY CUBE(l_returnflag, l_linestatus): all four grouping sets.
    Extends :func:`lineitem_rollup` with the (NULL, l_linestatus) level —
    every coarser level re-aggregates the finest (already tiny) level, so
    the full table still shuffles exactly once."""
    from ..functions.grouped import sorted_aggregate

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"l_returnflag": b["l_returnflag"],
                      "l_linestatus": b["l_linestatus"],
                      "qty_c": _scaled_int(b["l_quantity"], 100.0)})
        return t.group_by(["l_returnflag", "l_linestatus"],
                          use_threads=False) \
                .aggregate([("qty_c", "sum")]) \
                .rename_columns(["l_returnflag", "l_linestatus", "sum_qty_c"])

    base = sorted_aggregate(
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["l_returnflag", "l_linestatus"], [("sum_qty_c", "sum")],
        ["l_returnflag", "l_linestatus", "sum_qty_c"], 1).materialize()

    def roll(ds, keys, null_col):
        out = sorted_aggregate(ds, keys, [("sum_qty_c", "sum")],
                               [*keys, "sum_qty_c"], 1)
        idx = 0 if null_col == "l_returnflag" else 1
        return out.map_batches(
            lambda b: b.add_column(idx, null_col,
                                   pa.nulls(b.num_rows, pa.string())),
            batch_format="pyarrow")

    by_flag = roll(base, ["l_returnflag"], "l_linestatus").materialize()
    by_status = roll(base, ["l_linestatus"], "l_returnflag")
    total = by_flag.map_batches(
        lambda b: pa.table({
            "l_returnflag": pa.nulls(1, pa.string()),
            "l_linestatus": pa.nulls(1, pa.string()),
            "sum_qty_c": pa.array([pc.sum(b["sum_qty_c"]).as_py()],
                                  pa.int64())})
        if b.num_rows else b, batch_format="pyarrow", batch_size=None)
    return base.union(by_flag, by_status, total.limit(1))


def cov_qty_price(sf_dir: str) -> ray.data.Dataset:
    """Grouped covariance in EXACT integer arithmetic: per l_returnflag,
    report n and the scaled covariance numerator

        cov_n2 = n*sum(x*y) - sum(x)*sum(y)   ( = n^2 * cov_pop(x, y) )

    with x = quantity (integral units) and y = floor(price) dollars — the
    two-column grouped-moment family (corr/cov) without any float: the
    numerator is shuffle-order-exact and hash-gateable; callers divide by
    n^2 at presentation time. Magnitude headroom is checked at runtime
    (x<=50, y<=1e5, n<=6e5 at sf0.1 keeps every term under 2^62).
    One map-side partial pass, one tiny grouped sum.
    """
    from ..functions.grouped import sorted_aggregate

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        x = pc.cast(pc.floor(b["l_quantity"]), pa.int64())
        y = pc.cast(pc.floor(b["l_extendedprice"]), pa.int64())
        t = pa.table({
            "l_returnflag": b["l_returnflag"],
            "n": pa.nulls(b.num_rows, pa.int64()).fill_null(1),
            "sx": x, "sy": y, "sxy": pc.multiply(x, y)})
        return t.group_by(["l_returnflag"], use_threads=False).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("sxy", "sum")]) \
            .rename_columns(["l_returnflag", "n", "sx", "sy", "sxy"])

    sums = sorted_aggregate(
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["l_returnflag"], [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
                           ("sxy", "sum")],
        ["l_returnflag", "n", "sx", "sy", "sxy"], 1)

    def finalize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("l_returnflag", pa.string()),
                              ("n", pa.int64()),
                              ("cov_n2", pa.int64())]).empty_table()
        n = b["n"].to_numpy(zero_copy_only=False)
        sx = b["sx"].to_numpy(zero_copy_only=False)
        sy = b["sy"].to_numpy(zero_copy_only=False)
        sxy = b["sxy"].to_numpy(zero_copy_only=False)
        # guard in float64 (never wraps) BEFORE the int64 products — an
        # int64 product that already wrapped would sail past its own check
        f = np.float64
        if (n.astype(f) * np.abs(sxy).astype(f)).max(initial=0.0) \
           >= float(1 << 62) or \
           (np.abs(sx).astype(f) * np.abs(sy).astype(f)).max(initial=0.0) \
           >= float(1 << 62):
            raise OverflowError("cov_qty_price: rescale units")
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "n": pa.array(n, pa.int64()),
                         "cov_n2": pa.array(n * sxy - sx * sy, pa.int64())})

    return sums.map_batches(finalize, batch_format="pyarrow",
                            batch_size=None)


def time_weighted_value(sf_dir: str) -> ray.data.Dataset:
    """Per-user TIME-WEIGHTED average of ``value`` as an exact integer
    (numerator, denominator) pair: each event's value holds until the
    user's next event (LEAD window), so

        twa = sum(value_cents * dt_us) / sum(dt_us)

    over the user's non-final events. Both sums are int64 (bounded by
    value_max * observed-span — checked at runtime), shuffle-order-exact,
    and hash-gateable; the float division happens at presentation time.
    Same ONE-key-sort sorted-block shape as the other window operators.
    Output: (user_id, twa_num, twa_den), users with <2 events dropped.
    """
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "value"])

    def twa_block(b: pa.Table) -> pa.Table:
        from ..functions.grouped import group_ids
        out_schema = pa.schema([("user_id", pa.int64()),
                                ("twa_num", pa.int64()),
                                ("twa_den", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["user_id"])
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        v = _scaled_int(b["value"], 100.0).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, gid))
        ts, g, v = ts[order], gid[order], v[order]
        dt = np.zeros(len(ts), np.int64)
        same = np.empty(len(ts), bool)
        same[:-1] = g[1:] == g[:-1]
        same[-1] = False
        dt[same] = (ts[1:] - ts[:-1])[same[:-1]]
        num = np.zeros(int(g[-1]) + 1, np.int64)
        den = np.zeros(int(g[-1]) + 1, np.int64)
        # guard in float64 BEFORE multiplying/accumulating in int64: a
        # wrapped product or sum would pass its own post-hoc check
        fv = np.abs(v).astype(np.float64)
        fdt = dt.astype(np.float64)
        if (fv * fdt).max(initial=0.0) >= float(1 << 61):
            raise OverflowError("time_weighted_value: rescale units")
        fnum = np.zeros(int(g[-1]) + 1, np.float64)
        np.add.at(fnum, g, fv * fdt)
        if fnum.max(initial=0.0) >= float(1 << 62):
            raise OverflowError("time_weighted_value: rescale units")
        contrib = v * dt
        np.add.at(num, g, contrib)
        np.add.at(den, g, dt)
        keep = den > 0
        uid = b["user_id"].take(pa.array(order[starts])) \
            .combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": pa.array(uid[keep].astype(np.int64), pa.int64()),
            "twa_num": pa.array(num[keep], pa.int64()),
            "twa_den": pa.array(den[keep], pa.int64())}, schema=out_schema)

    from ..functions.grouped import sorted_group_apply
    return sorted_group_apply(ev, ["user_id"], twa_block, 8)


def tpch_q5_local_volume(sf_dir: str, region: str = "ASIA",
                         date_lo: str = "1996-01-01",
                         date_hi: str = "1998-01-01") -> ray.data.Dataset:
    """TPC-H Q5 shape — the six-table composition: revenue by nation where
    the ordering customer and the line's supplier sit in the SAME nation of
    one region, within a date window.

    Join plan by shape (nothing big ever shuffles against a dimension):
    1. region ⋈ nation fold on the driver (≤ 30 rows total);
    2. customer and supplier become sorted (key → nationkey) numpy pairs,
       `ray.put` ONCE, probed via binary search inside map_batches — the
       canonical broadcast dimension join (at 100 TB these stay the small
       side: dimension cardinality grows ~linearly in warehouse size but is
       dwarfed by the fact tables; were they ever too big to broadcast the
       same plan swaps steps 3/4's probe for another `attach_column`);
    3. orders filter (date window + in-region customer) runs map-side and
       projects to (o_orderkey, c_nat) — the only order columns that move;
    4. lineitem revenue rows carry (s_nat, rev_fp) and meet orders in ONE
       int-key co-group `attach_column` — the single big×big exchange;
    5. the same-nation filter + per-nation partial sum collapse each block
       to ≤ |nations in region| rows before a tiny `sorted_aggregate`.
    Revenue is exact fixed point (cents × (100 − disc_pct), int64; overflow
    headroom asserted at runtime). Output (n_name, n_items, revenue_fp)
    ordered by revenue desc.
    """
    import pyarrow.parquet as pq

    from ..functions.grouped import sorted_aggregate
    from ..functions.joins import attach_column

    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"][0] \
        .as_py()
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nat = nat.filter(pc.equal(nat["n_regionkey"], rkey))
    nat_keys = nat["n_nationkey"].to_numpy().astype(np.int64)
    nat_names = np.asarray(nat["n_name"].to_pylist(), dtype=object)

    def _dim(table: str, key: str, natcol: str):
        t = pq.read_table(f"{sf_dir}/{table}.parquet",
                          columns=[key, natcol])
        t = t.filter(pc.is_in(t[natcol], value_set=pa.array(nat_keys)))
        k = t[key].to_numpy().astype(np.int64)
        nv = t[natcol].to_numpy().astype(np.int32)
        o = np.argsort(k)
        return k[o], nv[o]

    cust_ref = ray.put(_dim("customer", "c_custkey", "c_nationkey"))
    supp_ref = ray.put(_dim("supplier", "s_suppkey", "s_nationkey"))
    lo = pa.scalar(np.datetime64(date_lo, "us").item(), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(date_hi, "us").item(), pa.timestamp("us"))

    from ..functions.joins import probe_sorted as _probe

    class OrderSide:
        def __init__(self):
            self.k, self.n = ray.get(cust_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            t = b.filter(pc.and_(pc.greater_equal(b["o_orderdate"], lo),
                                 pc.less(b["o_orderdate"], hi)))
            k = pc.cast(t["o_custkey"], pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            cn = _probe(self.k, self.n, k)
            keep = cn >= 0
            return pa.table({
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64())
                .filter(pa.array(keep)),
                "c_nat": pa.array(cn[keep], pa.int32())})

    from ..functions.broadcast import broadcast_map_batches
    orders = broadcast_map_batches(
        _read(sf_dir, "orders",
              columns=["o_orderkey", "o_custkey", "o_orderdate"]),
        OrderSide, batch_format="pyarrow", zero_copy_batch=True)

    class LineSide:
        def __init__(self):
            self.k, self.n = ray.get(supp_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            k = pc.cast(b["l_suppkey"], pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            sn = _probe(self.k, self.n, k)
            keep = sn >= 0
            t = b.filter(pa.array(keep))
            price_c = _scaled_int(t["l_extendedprice"], 100.0).to_numpy()
            disc = _scaled_int(t["l_discount"], 100.0).to_numpy()
            rev = price_c * (100 - disc)
            return pa.table({
                "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "s_nat": pa.array(sn[keep], pa.int32()),
                "rev": pa.array(rev, pa.int64())})

    li = broadcast_map_batches(
        _read(sf_dir, "lineitem",
              columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                       "l_discount"]),
        LineSide, batch_format="pyarrow", zero_copy_batch=True)

    joined = attach_column(
        li, orders, [("s_nat", pa.int32()), ("rev", pa.int64())],
        "l_orderkey", "o_orderkey", "c_nat", "c_nat", pa.int32())

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["s_nat"], b["c_nat"]))
        t = pa.table({"nat": pc.cast(t["s_nat"], pa.int32()),
                      "n_items": pa.nulls(t.num_rows, pa.int64())
                      .fill_null(1), "rev": t["rev"]})
        return t.group_by(["nat"], use_threads=False).aggregate(
            [("n_items", "sum"), ("rev", "sum")]) \
            .rename_columns(["nat", "n_items", "rev"])

    agg = sorted_aggregate(
        joined.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        ["nat"], [("n_items", "sum"), ("rev", "sum")],
        ["nat", "n_items", "rev"], 1)

    nat_pos = {int(k): i for i, k in enumerate(nat_keys)}

    def finalize(b: pa.Table) -> pa.Table:
        schema = pa.schema([("n_name", pa.string()),
                            ("n_items", pa.int64()),
                            ("revenue_fp", pa.int64())])
        if b.num_rows == 0:
            return schema.empty_table()
        rev = b["rev"].to_numpy(zero_copy_only=False)
        if np.abs(rev).max(initial=0) >= (1 << 62):
            raise OverflowError("tpch_q5: rescale revenue units")
        pos = np.array([nat_pos[int(x)] for x in
                        b["nat"].to_numpy(zero_copy_only=False)])
        order = np.argsort(-rev, kind="stable")
        return pa.table({
            "n_name": pa.array(nat_names[pos][order], pa.string()),
            "n_items": pa.array(
                b["n_items"].to_numpy(zero_copy_only=False)[order]),
            "revenue_fp": pa.array(rev[order], pa.int64())}, schema=schema)

    return agg.map_batches(finalize, batch_format="pyarrow",
                           batch_size=None)


def tpch_q17_small_qty_revenue(sf_dir: str, brand: str = "Brand#1"
                               ) -> ray.data.Dataset:
    """TPC-H Q17 shape — the correlated per-group-average filter: total
    revenue of brand lineitems whose quantity is below 20%% of that part's
    average quantity.

    The correlated subquery becomes a two-pass plan with NO driver
    materialization of the fact table:
    1. brand part keys broadcast once (`distinct_int_keys`) and semi-filter
       lineitem at the scan (parts-of-one-brand is the tiny side);
    2. per-part (sum_qty, n) folds map-side per block, then one tiny
       `sorted_aggregate`; the pair is packed into ONE int64
       (sum_qty·2²⁰ + n, headroom asserted) so the join-back ships a single
       value column;
    3. the packed stats rejoin the filtered lineitems by partkey via the
       int-key co-group `attach_column`;
    4. the avg filter is exact integer algebra — qty < sum/(5n) ⇔
       5·qty·n < sum — no float division anywhere.
    Output is ONE row (total_price_c, n_rows); fixed-point cents.
    """
    from ..functions.grouped import sorted_aggregate
    from ..functions.joins import (
        attach_column,
        broadcast_semi_filter,
        distinct_int_keys,
    )

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    brand_keys = distinct_int_keys(
        part.map_batches(
            lambda b: b.filter(pc.equal(b["p_brand"], brand)),
            batch_format="pyarrow", zero_copy_batch=True),
        ["p_partkey"])

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])
    li = broadcast_semi_filter(li, "l_partkey", brand_keys)

    def stats_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"l_partkey": pc.cast(b["l_partkey"], pa.int64()),
                      "sq": pc.cast(pc.floor(b["l_quantity"]), pa.int64()),
                      "n": pa.nulls(b.num_rows, pa.int64()).fill_null(1)})
        return t.group_by(["l_partkey"], use_threads=False).aggregate(
            [("sq", "sum"), ("n", "sum")]) \
            .rename_columns(["l_partkey", "sq", "n"])

    stats = sorted_aggregate(
        li.map_batches(stats_partial, batch_format="pyarrow",
                       batch_size=None),
        ["l_partkey"], [("sq", "sum"), ("n", "sum")],
        ["l_partkey", "sq", "n"], 4)

    def pack(b: pa.Table) -> pa.Table:
        sq = b["sq"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        if n.max(initial=0) >= (1 << 20) or sq.max(initial=0) >= (1 << 42):
            raise OverflowError("tpch_q17: per-part stats exceed packing "
                                "headroom — widen the pack layout")
        return pa.table({"l_partkey": b["l_partkey"],
                         "packed": pa.array((sq << 20) | n, pa.int64())})

    packed = stats.map_batches(pack, batch_format="pyarrow",
                               batch_size=None)

    def to_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": pc.cast(b["l_partkey"], pa.int64()),
            "qty": pc.cast(pc.floor(b["l_quantity"]), pa.int64()),
            "price_c": _scaled_int(b["l_extendedprice"], 100.0)})

    rows = li.map_batches(to_rows, batch_format="pyarrow",
                          zero_copy_batch=True)
    joined = attach_column(
        rows, packed, [("qty", pa.int64()), ("price_c", pa.int64())],
        "l_partkey", "l_partkey", "packed", "packed", pa.int64(), 4)

    def below_avg(b: pa.Table) -> pa.Table:
        packed_v = b["packed"].to_numpy(zero_copy_only=False)
        sq, n = packed_v >> 20, packed_v & ((1 << 20) - 1)
        qty = b["qty"].to_numpy(zero_copy_only=False)
        keep = 5 * qty * n < sq
        kept = b["price_c"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({"total_price_c": pa.array([kept.sum()], pa.int64()),
                         "n_rows": pa.array([int(keep.sum())], pa.int64())})

    partials = joined.map_batches(below_avg, batch_format="pyarrow",
                                  batch_size=None)

    def total(b: pa.Table) -> pa.Table:
        schema = pa.schema([("total_price_c", pa.int64()),
                            ("n_rows", pa.int64())])
        return pa.table({
            "total_price_c": pa.array(
                [pc.sum(b["total_price_c"]).as_py() or 0], pa.int64()),
            "n_rows": pa.array([pc.sum(b["n_rows"]).as_py() or 0],
                               pa.int64())}, schema=schema)

    return partials.repartition(1).map_batches(total,
                                               batch_format="pyarrow",
                                               batch_size=None)


def window_distinct_users(sf_dir: str, window_days: int = 7
                          ) -> ray.data.Dataset:
    """Trailing-window DISTINCT COUNT: for every calendar day in the event
    span, how many distinct users had ≥1 event in the last ``window_days``
    days (inclusive).

    The naive plan is a day-spine × events range join + per-day DISTINCT —
    an all-to-all whose width multiplies by the window. This one never
    re-ships an event per covered day:
    1. per-block distinct (user, day) collapse (vectorized group_by);
    2. ONE user sort; inside each sorted block every user's unique days
       fold into maximal covered intervals [d, d+w−1] (gap > w−1 splits),
       emitted as ±1 boundary deltas — output is O(intervals), not
       O(events × w);
    3. deltas sum per day in a tiny `sorted_aggregate`, then ONE small
       block does the prefix sum over the full day spine (spine length =
       calendar span, thousands of rows at any corpus size).
    The interval identity: user counts toward window-end day d iff some
    event day e satisfies d−w < e ≤ d, i.e. d ∈ ∪ᵢ [eᵢ, eᵢ+w−1].
    Output (day, n_users), day = days since epoch, one row per spine day.
    """
    from ..functions.grouped import group_ids, sorted_aggregate

    w = int(window_days)
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def to_days(b: pa.Table) -> pa.Table:
        ts = b["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        t = pa.table({"user_id": pc.cast(b["user_id"], pa.int64()),
                      "day": pa.array(ts // 86_400_000_000, pa.int64())})
        return t.group_by(["user_id", "day"], use_threads=False) \
            .aggregate([]).rename_columns(["user_id", "day"])

    pairs = ev.map_batches(to_days, batch_format="pyarrow",
                           zero_copy_batch=True)

    def deltas_block(b: pa.Table) -> pa.Table:
        schema = pa.schema([("day", pa.int64()), ("delta", pa.int64())])
        if b.num_rows == 0:
            return schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        day = b["day"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((day, gid))
        g, d = gid[order], day[order]
        uniq = np.empty(len(g), bool)
        uniq[0] = True
        uniq[1:] = (g[1:] != g[:-1]) | (d[1:] != d[:-1])
        g, d = g[uniq], d[uniq]
        new = np.empty(len(g), bool)
        new[0] = True
        new[1:] = (g[1:] != g[:-1]) | (d[1:] - d[:-1] > w - 1)
        last = np.roll(new, -1)
        last[-1] = True
        days = np.concatenate([d[new], d[last] + w])
        dlt = np.concatenate([np.ones(int(new.sum()), np.int64),
                              np.full(int(last.sum()), -1, np.int64)])
        t = pa.table({"day": pa.array(days, pa.int64()),
                      "delta": pa.array(dlt, pa.int64())})
        return t.group_by(["day"], use_threads=False) \
            .aggregate([("delta", "sum")]) \
            .rename_columns(["day", "delta"])

    from ..functions.grouped import sorted_group_apply
    deltas = sorted_group_apply(pairs, ["user_id"], deltas_block, 8)
    agg = sorted_aggregate(deltas, ["day"], [("delta", "sum")],
                           ["day", "delta"], 1)

    def spine(b: pa.Table) -> pa.Table:
        schema = pa.schema([("day", pa.int64()), ("n_users", pa.int64())])
        if b.num_rows == 0:
            return schema.empty_table()
        day = b["day"].to_numpy(zero_copy_only=False)
        dlt = b["delta"].to_numpy(zero_copy_only=False)
        # the span is already IN the delta table — no second corpus scan:
        # the global min delta day is some user's first interval START
        # (= the global min event day) and the global max delta day is the
        # global max event day's interval END marker at max_day + w
        day_lo = int(day.min())
        day_hi = int(day.max()) - w
        n_days = day_hi - day_lo + 1
        diff = np.zeros(n_days + 1, np.int64)
        pos = np.clip(day - day_lo, 0, n_days)
        np.add.at(diff, pos, dlt)
        counts = np.cumsum(diff)[:n_days]
        return pa.table({
            "day": pa.array(np.arange(day_lo, day_hi + 1), pa.int64()),
            "n_users": pa.array(counts, pa.int64())}, schema=schema)

    return agg.map_batches(spine, batch_format="pyarrow", batch_size=None)


def ntile_customers(sf_dir: str, tiles: int = 4) -> ray.data.Dataset:
    """NTILE(t) OVER (PARTITION BY segment ORDER BY acctbal, custkey):
    equal-height buckets with SQL's exact fill rule — the first n mod t
    buckets hold ceil(n/t) rows, the rest floor(n/t).

    Same ONE-key-sort sorted-block window shape as
    :func:`percent_rank_qty`; the bucket id is closed-form from the
    in-group position, so no second pass:
    ``pos < r·(q+1) ? pos // (q+1) : r + (pos − r·(q+1)) // q`` with
    q = n//t, r = n mod t. Ties are broken by custkey on BOTH engines —
    bare SQL NTILE over a tied ORDER BY is nondeterministic, which would
    trip the driver's value hash. acctbal is compared in exact cents.
    Output (c_custkey, c_mktsegment, tile).
    """
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment", "c_acctbal"])
    t_ = int(tiles)

    def nt_block(b: pa.Table) -> pa.Table:
        from ..functions.grouped import group_ids
        out_schema = pa.schema([("c_custkey", pa.int64()),
                                ("c_mktsegment", pa.string()),
                                ("tile", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["c_mktsegment"])
        bal = _scaled_int(b["c_acctbal"], 100.0).to_numpy()
        ck = pc.cast(b["c_custkey"], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, bal, gid))
        g = gid[order]
        pos = np.arange(len(g), dtype=np.int64) - starts[g]
        n = np.diff(np.append(starts, len(g)))[g]
        q, r = n // t_, n % t_
        cut = r * (q + 1)
        tile = np.where(pos < cut, pos // np.maximum(q + 1, 1),
                        r + (pos - cut) // np.maximum(q, 1)) + 1
        return pa.table({
            "c_custkey": pa.array(ck[order], pa.int64()),
            "c_mktsegment": b["c_mktsegment"].take(pa.array(order)),
            "tile": pa.array(tile, pa.int64())}, schema=out_schema)

    from ..functions.grouped import sorted_group_apply
    return sorted_group_apply(cust, ["c_mktsegment"], nt_block)


def quantile_sketch_prices(sf_dir: str, bin_c: int = 10_000
                           ) -> ray.data.Dataset:
    """Histogram-sketch quantiles — the MERGEABLE fixed-space scale path
    beside the exact order statistics of `functions/quantiles.py`: prices
    bucket into fixed ``bin_c``-cent bins (one vectorized integer divide),
    per-block bin counts fold map-side, the tiny (≤ thousands-row) bin
    table sums in ONE aggregate, and each requested quantile reads the
    first bin whose cumulative count reaches ceil(q·N).

    Error is bounded by the bin width by construction and the whole
    computation is integer-deterministic, so — unlike a t-digest, whose
    centroids depend on merge order — the DuckDB oracle gates it exactly.
    Sketch size is O(value range / bin_c), independent of N: the 100 TB
    shape (counts shuffle, values never do). Output
    (q1e4, bin, lo_edge_c) for q ∈ {25, 50, 75, 90, 99}%.
    """
    from ..functions.grouped import sorted_aggregate

    li = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    qs = np.array([2500, 5000, 7500, 9000, 9900], np.int64)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "bin": pc.divide(_scaled_int(b["l_extendedprice"], 100.0),
                             pa.scalar(bin_c, pa.int64())),
            "cnt": pa.nulls(b.num_rows, pa.int64()).fill_null(1)})
        return t.group_by(["bin"], use_threads=False) \
            .aggregate([("cnt", "sum")]).rename_columns(["bin", "cnt"])

    hist = sorted_aggregate(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["bin"], [("cnt", "sum")], ["bin", "cnt"], 1)

    def finalize(b: pa.Table) -> pa.Table:
        schema = pa.schema([("q1e4", pa.int64()), ("bin", pa.int64()),
                            ("lo_edge_c", pa.int64())])
        if b.num_rows == 0:
            return schema.empty_table()
        bins = b["bin"].to_numpy(zero_copy_only=False)
        cum = np.cumsum(b["cnt"].to_numpy(zero_copy_only=False))
        n = int(cum[-1])
        ranks = (qs * n + 9999) // 10000
        idx = np.searchsorted(cum, ranks)
        sel = bins[idx]
        return pa.table({"q1e4": pa.array(qs, pa.int64()),
                         "bin": pa.array(sel, pa.int64()),
                         "lo_edge_c": pa.array(sel * bin_c, pa.int64())},
                        schema=schema)

    return hist.map_batches(finalize, batch_format="pyarrow",
                            batch_size=None)


def full_outer_activity(sf_dir: str) -> ray.data.Dataset:
    """FULL OUTER reconciliation of two keyed systems: per-key event
    activity (events.user_id) vs order activity (orders.o_custkey) —
    which keys exist only as event users, only as order customers, or
    both, with both sides' aggregates on one row.

    Each side folds map-side to unique-per-key partials first (the small
    post-aggregation tables are what co-group, never the fact rows), then
    ONE union-tag key sort resolves every key locally
    (`functions/joins.full_outer_unique`). Missing sides are zero-filled
    with in_left/in_right flags — null-free, so the driver hash is exact.
    """
    from ..functions.grouped import sorted_aggregate
    from ..functions.joins import full_outer_unique

    ev = _read(sf_dir, "events", columns=["user_id", "value"])

    def ev_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"k": pc.cast(b["user_id"], pa.int64()),
                      "n_events": pa.nulls(b.num_rows, pa.int64())
                      .fill_null(1),
                      "events_value_c": _scaled_int(b["value"], 100.0)})
        return t.group_by(["k"], use_threads=False).aggregate(
            [("n_events", "sum"), ("events_value_c", "sum")]) \
            .rename_columns(["k", "n_events", "events_value_c"])

    e = sorted_aggregate(
        ev.map_batches(ev_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["k"], [("n_events", "sum"), ("events_value_c", "sum")],
        ["k", "n_events", "events_value_c"], 4)

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def o_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"k": pc.cast(b["o_custkey"], pa.int64()),
                      "n_orders": pa.nulls(b.num_rows, pa.int64())
                      .fill_null(1),
                      "orders_value_c": _scaled_int(b["o_totalprice"],
                                                    100.0)})
        return t.group_by(["k"], use_threads=False).aggregate(
            [("n_orders", "sum"), ("orders_value_c", "sum")]) \
            .rename_columns(["k", "n_orders", "orders_value_c"])

    o = sorted_aggregate(
        orders.map_batches(o_partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["k"], [("n_orders", "sum"), ("orders_value_c", "sum")],
        ["k", "n_orders", "orders_value_c"], 4)

    return full_outer_unique(
        e, o, "k",
        [("n_events", pa.int64()), ("events_value_c", pa.int64())],
        [("n_orders", pa.int64()), ("orders_value_c", pa.int64())],
        num_partitions=4)


def mad_prices_by_flag(sf_dir: str) -> ray.data.Dataset:
    """Median absolute deviation per group — the robust-statistics
    companion to the z-score anomaly op (events_anomaly), in exact cents:
    MAD = median(|x − median(x)|) with the LOW median (quantile_disc 0.5)
    in BOTH passes so every intermediate is an actual data value and the
    driver hash is exact (no interpolation floats).

    Two passes of the per-group order-statistic machinery
    (`functions/quantiles.grouped_quantiles`, ONE key sort each): the
    group-median table is group-cardinality-sized (a handful of flags), so
    it rides the closure into the deviation map — the corpus is never
    joined against itself. Output (l_returnflag, mad_c).
    """
    from ..functions.quantiles import grouped_quantiles

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "pc_": _scaled_int(b["l_extendedprice"], 100.0)})

    cents = li.map_batches(to_cents, batch_format="pyarrow",
                           zero_copy_batch=True)
    med_rows = grouped_quantiles(cents, "l_returnflag", "pc_",
                                 [0.5], 1).take_all()
    flags = [r["l_returnflag"] for r in med_rows]
    meds = np.array([int(r["value"]) for r in med_rows], np.int64)
    flag_arr = pa.array(flags, pa.string())

    def deviations(b: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(b["l_returnflag"], pa.string()),
                          value_set=flag_arr).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["pc_"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "dev": pa.array(np.abs(v - meds[idx]), pa.int64())})

    dev = cents.map_batches(deviations, batch_format="pyarrow",
                            zero_copy_batch=True)

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "mad_c": pc.cast(pc.round(b["value"]), pa.int64())})

    return grouped_quantiles(dev, "l_returnflag", "dev", [0.5], 1) \
        .map_batches(finalize, batch_format="pyarrow", batch_size=None)


def top_event_per_user(sf_dir: str) -> ray.data.Dataset:
    """Per-group ARGMAX as a first-class relational query: each user's
    single highest-value event (value compared in exact cents, event_id
    tie-break). Rides `functions/topn.top_n_per_key` n=1, whose map-side
    prune ships ONE row per (user, block) into the key sort — the
    distributed argmax never moves the fact table.
    Output (user_id, event_id, event_type, value_c).
    """
    from ..functions.topn import top_n_per_key

    ev = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "event_id": pc.cast(b["event_id"], pa.int64()),
            "event_type": b["event_type"],
            "value_c": _scaled_int(b["value"], 100.0)})

    prepped = ev.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = top_n_per_key(prepped, ["user_id"],
                        [("value_c", False), ("event_id", True)], 1, 8)
    return out.map_batches(lambda b: b.drop_columns(["rank"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def error_recovery_times(sf_dir: str, window_s: int = 3600
                         ) -> ray.data.Dataset:
    """Event-pattern join (MATCH_RECOGNIZE-lite): for every 'error' event,
    the user's FIRST 'purchase' within the next ``window_s`` seconds — the
    incident-recovery / next-conversion-after-failure shape.

    ONE user-key sort colocates each user's events; inside a block the
    match is pure vectorized numpy: both sides sorted by (user, ts,
    event_id), a `searchsorted` of error times into an offset-composed
    key (user-rank ≪ combined with time) finds each error's next purchase
    in O(log n) — never the quadratic self-join the SQL oracle runs.
    Output (error_id, purchase_id, delta_us) for matched errors only.
    """
    from ..functions.grouped import group_ids, sorted_group_apply

    ev = _read(sf_dir, "events", columns=["event_id", "user_id",
                                          "event_type", "ts"])
    win_us = window_s * 10**6

    def match_block(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("error_id", pa.int64()),
                                ("purchase_id", pa.int64()),
                                ("delta_us", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        kind = b["event_type"].combine_chunks()
        is_err = pc.equal(kind, "error").to_numpy(zero_copy_only=False)
        is_buy = pc.equal(kind, "purchase").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, gid))
        g, t, e = gid[order], ts[order], eid[order]
        err = is_err[order]
        buy = is_buy[order]
        # purchases per (group, time): searchsorted over a composed key —
        # group stride makes cross-user matches impossible
        bt = t[buy]
        bg = g[buy]
        be = e[buy]
        if not len(bt):
            return out_schema.empty_table()
        span = np.int64(1) << 42  # |ts| < 2^42 us from epoch? NO: rebase
        t0 = t.min()
        rt = t - t0  # rebased block-local times
        if rt.max(initial=0) >= span:
            raise OverflowError("error_recovery: time span exceeds 2^42 us"
                                " — widen the key layout")
        bkey = bg * span + rt[buy]
        ekey = g[err] * span + rt[err]
        pos = np.searchsorted(bkey, ekey, side="right")
        ok = pos < len(bkey)
        posc = np.minimum(pos, len(bkey) - 1)
        same = bg[posc] == g[err]
        dt = bt[posc] - t[err]
        hit = ok & same & (dt > 0) & (dt <= win_us)
        return pa.table({
            "error_id": pa.array(e[err][hit], pa.int64()),
            "purchase_id": pa.array(be[posc][hit], pa.int64()),
            "delta_us": pa.array(dt[hit], pa.int64())}, schema=out_schema)

    return sorted_group_apply(ev, ["user_id"], match_block, 8)


def pareto_block(b: pa.Table) -> pa.Table:
    """Exact skyline of one block on (minimize price_c, maximize qty) under
    STRICT dominance (exact duplicates all survive). Vectorized sweep: sort
    (price asc, qty desc); a row survives iff its qty equals its price-run's
    max and beats every strictly-cheaper run's max. Lossless as a per-block
    prune: dominance by a block-mate implies global dominance."""
    if b.num_rows == 0:
        return b
    p = b["price_c"].combine_chunks().to_numpy(zero_copy_only=False)
    q = b["qty"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((-q, p))
    ps, qs = p[order], q[order]
    new_run = np.empty(len(ps), bool)
    new_run[0] = True
    new_run[1:] = ps[1:] != ps[:-1]
    run_id = np.cumsum(new_run) - 1
    run_max = qs[new_run]  # qty desc within a price run
    # strictly-cheaper runs' best qty, exclusive prefix max
    before = np.empty(len(run_max), np.int64)
    before[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(run_max[:-1], out=before[1:])
    survive = (qs == run_max[run_id]) & (run_max[run_id] > before[run_id])
    return b.take(pa.array(order[survive]))


def skyline_lineitem(sf_dir: str) -> ray.data.Dataset:
    """SKYLINE (Pareto frontier) query: lineitems not STRICTLY dominated on
    (minimize price, maximize quantity) — the multi-objective shortlist
    operator (Börzsönyi et al., ICDE 2001, public).

    Distribution exploits dominance monotonicity: a point dominated by a
    BLOCK-mate is dominated globally, so a per-block skyline prune is
    lossless and the all-to-all ships only local survivors (~log-sized on
    independent dims); ONE small final block runs the same kernel for the
    exact global answer. The kernel is a vectorized sweep: sort by (price
    asc, qty desc); a row survives iff its qty equals its price-run's max
    AND beats every strictly-cheaper run's max (exact-duplicate points all
    survive, matching SQL's strict-dominance NOT EXISTS).
    Output (l_orderkey, l_linenumber, price_c, qty).
    """
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity",
                        "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
            "l_linenumber": pc.cast(b["l_linenumber"], pa.int32()),
            "price_c": _scaled_int(b["l_extendedprice"], 100.0),
            "qty": pc.cast(pc.floor(b["l_quantity"]), pa.int64())})

    survivors = li.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .map_batches(pareto_block, batch_format="pyarrow",
                     zero_copy_batch=True)
    return survivors.repartition(1).map_batches(
        pareto_block, batch_format="pyarrow", batch_size=None)


def mode_event_per_user(sf_dir: str) -> ray.data.Dataset:
    """Grouped MODE: each user's most frequent event type (count desc,
    lexically-smallest tie-break) — the categorical companion to the
    numeric argmax. Composition of two engine primitives: exact
    (user, type) counts via `grouped_count` (map-side combine collapses a
    block to its distinct pairs before the shuffle), then
    `top_n_per_key` n=1 over the counts table. Output
    (user_id, event_type, n).
    """
    from ..functions.grouped import grouped_count
    from ..functions.topn import top_n_per_key

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    counts = grouped_count(ev, ["user_id", "event_type"], "n", 8)
    out = top_n_per_key(counts, ["user_id"],
                        [("n", False), ("event_type", True)], 1, 4)
    return out.map_batches(lambda b: b.drop_columns(["rank"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def type_diversity_per_user(sf_dir: str) -> ray.data.Dataset:
    """Grouped GINI-IMPURITY diversity in exact integers: per user report
    n (events) and sum_sq (Σ count(type)²) — the categorical-diversity
    metric with zero float association; callers present
    gini = 1 − sum_sq/n² at display time.

    Two map-side-combined aggregates back to back: exact (user, type)
    counts via `grouped_count`, then per-block fold of n/Σn² partials into
    one tiny keyed sum — the type table (users × types) is the only thing
    the second exchange moves. Output (user_id, n, sum_sq).
    """
    from ..functions.grouped import grouped_count, sorted_aggregate

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    counts = grouped_count(ev, ["user_id", "event_type"], "n", 8)

    def partial(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        t = pa.table({"user_id": pc.cast(b["user_id"], pa.int64()),
                      "n": pa.array(n, pa.int64()),
                      "sum_sq": pa.array(n * n, pa.int64())})
        return t.group_by(["user_id"], use_threads=False).aggregate(
            [("n", "sum"), ("sum_sq", "sum")]) \
            .rename_columns(["user_id", "n", "sum_sq"])

    return sorted_aggregate(
        counts.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["user_id"], [("n", "sum"), ("sum_sq", "sum")],
        ["user_id", "n", "sum_sq"], 4)


def type_xcorr_daily(sf_dir: str, type_a: str = "click",
                     type_b: str = "purchase") -> ray.data.Dataset:
    """Cross-correlation of two event-type DAILY-COUNT series at lags
    −1/0/+1, in exact integers: dot(lag) = Σ_d a(d)·b(d+lag) plus the
    overlapping-day count — the time-series alignment probe ("do clicks
    lead purchases by a day?"); normalization is presentation-time.

    One `grouped_count` over (day, type) reduces the corpus to a
    days×2 table; the lag products happen in ONE small block via numpy
    searchsorted alignment (no day self-join ever touches the events).
    Output (lag, dot, n_days) for each lag.
    """
    from ..functions.grouped import grouped_count

    ev = _read(sf_dir, "events", columns=["event_type", "ts"])

    def to_day(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["event_type"],
                     value_set=pa.array([type_a, type_b]))
        t = b.filter(m)
        ts = t["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({"day": pa.array(ts // 86_400_000_000, pa.int64()),
                         "event_type": t["event_type"]})

    days = ev.map_batches(to_day, batch_format="pyarrow",
                          zero_copy_batch=True)
    counts = grouped_count(days, ["day", "event_type"], "n", 1)

    def finalize(b: pa.Table) -> pa.Table:
        schema = pa.schema([("lag", pa.int64()), ("dot", pa.int64()),
                            ("n_days", pa.int64())])
        if b.num_rows == 0:
            return schema.empty_table()
        day = b["day"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        kind = b["event_type"].combine_chunks()
        a_m = pc.equal(kind, type_a).to_numpy(zero_copy_only=False)
        b_m = pc.equal(kind, type_b).to_numpy(zero_copy_only=False)
        ad, av = day[a_m], n[a_m]
        bd, bv = day[b_m], n[b_m]
        ao = np.argsort(ad)
        ad, av = ad[ao], av[ao]
        bo = np.argsort(bd)
        bd, bv = bd[bo], bv[bo]
        # float-domain guard BEFORE the int64 products (wrapped products
        # pass their own check)
        if float(av.max(initial=0)) * float(bv.max(initial=0)) \
           * max(len(ad), 1) >= float(1 << 62):
            raise OverflowError("type_xcorr_daily: rescale counts")
        lags, dots, nds = [], [], []
        for lag in (-1, 0, 1):
            # align a(d) with b(d + lag) via searchsorted on sorted days
            tgt = ad + lag
            pos = np.searchsorted(bd, tgt)
            ok = pos < len(bd)
            posc = np.minimum(pos, max(len(bd) - 1, 0))
            hit = ok & (len(bd) > 0) & (bd[posc] == tgt) \
                if len(bd) else np.zeros(len(ad), bool)
            lags.append(lag)
            dots.append(int((av[hit] * bv[posc[hit]]).sum()))
            nds.append(int(hit.sum()))
        return pa.table({"lag": pa.array(lags, pa.int64()),
                         "dot": pa.array(dots, pa.int64()),
                         "n_days": pa.array(nds, pa.int64())},
                        schema=schema)

    return counts.map_batches(finalize, batch_format="pyarrow",
                              batch_size=None)


def ffill_last_purchase(sf_dir: str) -> ray.data.Dataset:
    """Forward-fill imputation (LOCF): at EVERY event, the user's most
    recent purchase value so far (including a purchase row itself) — the
    missing-data carry-forward every feature pipeline needs.

    ONE user sort, then a fully vectorized segmented fill: each row maps
    to the index of the last purchase at-or-before it IN ITS GROUP via a
    single `np.maximum.accumulate` over group-composed keys
    (g·(N+1) + idx+1 — group id strictly grows down the sorted block, so
    the running max can never leak a previous user's purchase). Missing
    history is zero-filled with a has_prior flag (null-free, hash-exact).
    Output (event_id, user_id, last_purchase_c, has_prior).
    """
    from ..functions.grouped import group_ids, sorted_group_apply

    ev = _read(sf_dir, "events", columns=["event_id", "user_id",
                                          "event_type", "ts", "value"])

    def fill_block(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("event_id", pa.int64()),
                                ("user_id", pa.int64()),
                                ("last_purchase_c", pa.int64()),
                                ("has_prior", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        uid = b["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        vc = _scaled_int(b["value"], 100.0).to_numpy()
        mark = pc.equal(b["event_type"].combine_chunks(),
                        "purchase").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, gid))
        g, e, u, v, m = (gid[order], eid[order], uid[order], vc[order],
                         mark[order])
        n = len(g)
        base = g.astype(np.int64) * np.int64(n + 1)
        gval = base + np.where(m, np.arange(n, dtype=np.int64) + 1, 0)
        acc = np.maximum.accumulate(gval)
        has = acc > base  # a purchase seen in THIS group at/before row
        src = np.maximum(acc - base - 1, 0)
        last = np.where(has, v[src], 0)
        return pa.table({
            "event_id": pa.array(e, pa.int64()),
            "user_id": pa.array(u.astype(np.int64), pa.int64()),
            "last_purchase_c": pa.array(last, pa.int64()),
            "has_prior": pa.array(has.astype(np.int64), pa.int64())},
            schema=out_schema)

    return sorted_group_apply(ev, ["user_id"], fill_block, 8)


def unpivot_lineitem_measures(sf_dir: str) -> ray.data.Dataset:
    """UNPIVOT (wide→long reshape): each lineitem's (quantity, price,
    discount) columns become three (measure, value_c) rows — the
    melt/long-format step feature stores and plotting layers expect.
    Stateless per-block Arrow concat (zero shuffle, 3× row fan-out);
    values in exact fixed point (qty ×100 to share one scale).
    Output (l_orderkey, l_linenumber, measure, value_c).
    """
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def melt(b: pa.Table) -> pa.Table:
        n = b.num_rows
        ok = pc.cast(b["l_orderkey"], pa.int64()).combine_chunks()
        ln = pc.cast(b["l_linenumber"], pa.int32()).combine_chunks()
        cols = [("quantity", _scaled_int(b["l_quantity"], 100.0)),
                ("price", _scaled_int(b["l_extendedprice"], 100.0)),
                ("discount", _scaled_int(b["l_discount"], 100.0))]
        return pa.table({
            "l_orderkey": pa.concat_arrays([ok] * 3),
            "l_linenumber": pa.concat_arrays([ln] * 3),
            "measure": pa.concat_arrays(
                [pa.array([name] * n, pa.string())
                 for name, _ in cols]),
            "value_c": pa.concat_arrays(
                [v.combine_chunks() if isinstance(v, pa.ChunkedArray)
                 else v for _, v in cols])})

    return li.map_batches(melt, batch_format="pyarrow",
                          zero_copy_batch=True)


def ols_qty_price_by_flag(sf_dir: str) -> ray.data.Dataset:
    """Grouped OLS REGRESSION SLOPE in exact integers — the one-feature
    linear-fit family on the same moment sums as :func:`cov_qty_price`:

        slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)  =  slope_num / slope_den

    Both terms are int64, shuffle-order-exact and hash-gateable; the float
    division is presentation-time. One map-side moment pass (adds Sxx to
    the covariance partials), one tiny grouped sum, float-domain overflow
    guards before every int64 product. Output
    (l_returnflag, n, slope_num, slope_den).
    """
    from ..functions.grouped import sorted_aggregate

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        x = pc.cast(pc.floor(b["l_quantity"]), pa.int64())
        y = pc.cast(pc.floor(b["l_extendedprice"]), pa.int64())
        t = pa.table({
            "l_returnflag": b["l_returnflag"],
            "n": pa.nulls(b.num_rows, pa.int64()).fill_null(1),
            "sx": x, "sy": y, "sxy": pc.multiply(x, y),
            "sxx": pc.multiply(x, x)})
        return t.group_by(["l_returnflag"], use_threads=False).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("sxy", "sum"),
             ("sxx", "sum")]) \
            .rename_columns(["l_returnflag", "n", "sx", "sy", "sxy",
                             "sxx"])

    sums = sorted_aggregate(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["l_returnflag"], [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
                           ("sxy", "sum"), ("sxx", "sum")],
        ["l_returnflag", "n", "sx", "sy", "sxy", "sxx"], 1)

    def finalize(b: pa.Table) -> pa.Table:
        schema = pa.schema([("l_returnflag", pa.string()),
                            ("n", pa.int64()),
                            ("slope_num", pa.int64()),
                            ("slope_den", pa.int64())])
        if b.num_rows == 0:
            return schema.empty_table()
        f = np.float64
        n = b["n"].to_numpy(zero_copy_only=False)
        sx = b["sx"].to_numpy(zero_copy_only=False)
        sy = b["sy"].to_numpy(zero_copy_only=False)
        sxy = b["sxy"].to_numpy(zero_copy_only=False)
        sxx = b["sxx"].to_numpy(zero_copy_only=False)
        lim = float(1 << 62)
        if max((n.astype(f) * np.abs(sxy).astype(f)).max(initial=0.0),
               (np.abs(sx).astype(f) * np.abs(sy).astype(f))
               .max(initial=0.0),
               (n.astype(f) * sxx.astype(f)).max(initial=0.0),
               (sx.astype(f) * sx.astype(f)).max(initial=0.0)) >= lim:
            raise OverflowError("ols_qty_price: rescale units")
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "n": pa.array(n, pa.int64()),
                         "slope_num": pa.array(n * sxy - sx * sy,
                                               pa.int64()),
                         "slope_den": pa.array(n * sxx - sx * sx,
                                               pa.int64())}, schema=schema)

    return sums.map_batches(finalize, batch_format="pyarrow",
                            batch_size=None)


def weighted_median_price(sf_dir: str) -> ray.data.Dataset:
    """Grouped WEIGHTED (low) MEDIAN: per returnflag, the smallest price
    whose cumulative QUANTITY weight reaches ceil(total_weight/2) — order
    statistics where every row counts ``weight`` times, without
    materializing the expansion.

    ONE key sort colocates each flag; the block kernel sorts by value,
    cumulative-sums the int weights and reads the first crossing —
    all exact integers. Output (l_returnflag, wmedian_c, total_w).
    """
    from ..functions.grouped import group_ids, sorted_group_apply

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "price_c": _scaled_int(b["l_extendedprice"], 100.0),
            "w": pc.cast(pc.floor(b["l_quantity"]), pa.int64())})

    prepped = li.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)

    def wmed_block(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("l_returnflag", pa.string()),
                                ("wmedian_c", pa.int64()),
                                ("total_w", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["l_returnflag"])
        v = b["price_c"].combine_chunks().to_numpy(zero_copy_only=False)
        w = b["w"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((v, gid))
        g, vs, ws = gid[order], v[order], w[order]
        cum = np.cumsum(ws)
        ends = np.append(starts[1:], len(g)) - 1
        group_tot = cum[ends] - np.concatenate([[0], cum[ends[:-1]]])
        # first index per group where in-group cumsum reaches ceil(W/2)
        base = np.concatenate([[0], cum[ends[:-1]]])
        target = base + (group_tot + 1) // 2
        idx = np.searchsorted(cum, target)  # cum is globally increasing
        return pa.table({
            "l_returnflag": b["l_returnflag"].take(pa.array(order[idx])),
            "wmedian_c": pa.array(vs[idx], pa.int64()),
            "total_w": pa.array(group_tot, pa.int64())}, schema=out_schema)

    return sorted_group_apply(prepped, ["l_returnflag"], wmed_block, 1)


def cum_distinct_types(sf_dir: str) -> ray.data.Dataset:
    """Cumulative DISTINCT count window: at every event, how many distinct
    event types the user has seen so far (inclusive) — the
    exploration-breadth curve, a window SQL can only express via a
    first-occurrence indicator (COUNT(DISTINCT) OVER is unsupported).

    ONE user sort; inside a block two vectorized passes: (1) sort by
    (user, type, ts, id) marks each (user, type)'s first occurrence,
    (2) sort by (user, ts, id) segment-cumsums the indicator (cumsum minus
    per-group base — no per-group loop).
    Output (event_id, user_id, n_types).
    """
    from ..functions.grouped import group_ids, sorted_group_apply

    ev = _read(sf_dir, "events", columns=["event_id", "user_id",
                                          "event_type", "ts"])

    def block(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("event_id", pa.int64()),
                                ("user_id", pa.int64()),
                                ("n_types", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        uid = b["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tcode = b["event_type"].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False)
        # pass 1: first occurrence of each (user, type), in time order
        o1 = np.lexsort((eid, ts, tcode, gid))
        g1, t1 = gid[o1], tcode[o1]
        first = np.empty(len(g1), bool)
        first[0] = True
        first[1:] = (g1[1:] != g1[:-1]) | (t1[1:] != t1[:-1])
        fs = np.empty(len(g1), np.int64)
        fs[o1] = first.astype(np.int64)  # back to original row positions
        # pass 2: segmented cumulative sum in (user, ts, id) order
        o2 = np.lexsort((eid, ts, gid))
        g2, f2 = gid[o2], fs[o2]
        cs = np.cumsum(f2)
        new_g = np.empty(len(g2), bool)
        new_g[0] = True
        new_g[1:] = g2[1:] != g2[:-1]
        base = np.repeat(cs[new_g] - f2[new_g],
                         np.diff(np.append(np.flatnonzero(new_g),
                                           len(g2))))
        return pa.table({
            "event_id": pa.array(eid[o2], pa.int64()),
            "user_id": pa.array(uid[o2].astype(np.int64), pa.int64()),
            "n_types": pa.array(cs - base, pa.int64())}, schema=out_schema)

    return sorted_group_apply(ev, ["user_id"], block, 8)


def ratio_to_report_prices(sf_dir: str) -> ray.data.Dataset:
    """RATIO_TO_REPORT / percent-of-total window as an exact integer pair:
    every lineitem carries (price_c, flag_total_c) — its share of its
    returnflag's total revenue, division at presentation time.

    The per-flag totals fold map-side into a ≤|flags|-row table that rides
    the task closure (never a self-join against the fact table); the
    attach pass is stateless. Output
    (l_orderkey, l_linenumber, l_returnflag, price_c, flag_total_c).
    """
    from ..functions.grouped import sorted_aggregate

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_returnflag",
                        "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"l_returnflag": b["l_returnflag"],
                      "s": _scaled_int(b["l_extendedprice"], 100.0)})
        return t.group_by(["l_returnflag"], use_threads=False) \
            .aggregate([("s", "sum")]).rename_columns(["l_returnflag",
                                                       "s"])

    totals = sorted_aggregate(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["l_returnflag"], [("s", "sum")], ["l_returnflag", "s"],
        1).take_all()
    flags = pa.array([r["l_returnflag"] for r in totals], pa.string())
    tot = np.array([r["s"] for r in totals], np.int64)

    def attach(b: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(b["l_returnflag"], pa.string()),
                          value_set=flags).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "l_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
            "l_linenumber": pc.cast(b["l_linenumber"], pa.int32()),
            "l_returnflag": b["l_returnflag"],
            "price_c": _scaled_int(b["l_extendedprice"], 100.0),
            "flag_total_c": pa.array(tot[idx], pa.int64())})

    return li.map_batches(attach, batch_format="pyarrow",
                          zero_copy_batch=True)


def ks_drift_prices(sf_dir: str, flag_a: str = "A", flag_b: str = "R"
                    ) -> ray.data.Dataset:
    """Exact two-sample KOLMOGOROV–SMIRNOV statistic between two groups'
    price distributions — the distribution-drift detector a curation
    pipeline runs between sources/snapshots — in pure integers:

        ks_scaled = max over values |n_b·cumA(v) − n_a·cumB(v)|

    (KS = ks_scaled / (n_a·n_b), division at presentation time.)

    Plan: per-value (cntA, cntB) via ONE map-side-combined sort-aggregate
    (range-ordered output blocks — materialize.py's stress-tested sort
    invariant), then the distributed PREFIX-SCAN pattern of
    `joins.zip_with_index`: per-block subtotals (two ints per block) come
    to the driver, exclusive cumsum gives each block its base offsets, a
    remote task per block computes its local max — no block data ever
    moves to the driver, one O(N log N) sort total. Float-domain overflow
    guard before the int64 cross products.
    Output ONE row (ks_scaled, n_a, n_b).
    """
    from ..functions.grouped import sorted_aggregate

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["l_returnflag"],
                              value_set=pa.array([flag_a, flag_b])))
        isa = pc.equal(t["l_returnflag"], flag_a)
        tt = pa.table({
            "val": _scaled_int(t["l_extendedprice"], 100.0),
            "na": pc.cast(isa, pa.int64()),
            "nb": pc.cast(pc.invert(isa), pa.int64())})
        return tt.group_by(["val"], use_threads=False).aggregate(
            [("na", "sum"), ("nb", "sum")]) \
            .rename_columns(["val", "na", "nb"])

    counts = sorted_aggregate(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["val"], [("na", "sum"), ("nb", "sum")], ["val", "na", "nb"], 8)

    mat = counts.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def subtotal(t: pa.Table):
        return (int(pc.sum(t["na"]).as_py() or 0),
                int(pc.sum(t["nb"]).as_py() or 0),
                pc.min(t["val"]).as_py() if t.num_rows else None)

    subs = ray.get([subtotal.remote(r) for r in refs])
    # sorted_aggregate's blocks hold disjoint key RANGES but are not
    # internally ordered (per-block hash group_by), and to_arrow_refs
    # block order is not the sort order either (observed scrambled):
    # order blocks by MIN value here, sort rows inside each block task
    order = sorted(range(len(refs)),
                   key=lambda i: (subs[i][2] is None, subs[i][2]))
    refs = [refs[i] for i in order]
    subs = [subs[i] for i in order]
    na_tot = sum(s[0] for s in subs)
    nb_tot = sum(s[1] for s in subs)
    base_a = np.concatenate([[0], np.cumsum([s[0] for s in subs])[:-1]])
    base_b = np.concatenate([[0], np.cumsum([s[1] for s in subs])[:-1]])
    if float(nb_tot) * float(na_tot + nb_tot) >= float(1 << 62):
        raise OverflowError("ks_drift: rescale (n_a*n_b cross products "
                            "exceed int64 headroom)")

    @ray.remote
    def block_max(t: pa.Table, ba: int, bb: int) -> int:
        if t.num_rows == 0:
            return 0
        t = t.sort_by("val")
        ca = ba + np.cumsum(t["na"].to_numpy(zero_copy_only=False))
        cb = bb + np.cumsum(t["nb"].to_numpy(zero_copy_only=False))
        return int(np.abs(nb_tot * ca - na_tot * cb).max())

    ks = max(ray.get([block_max.remote(r, int(a), int(b))
                      for r, a, b in zip(refs, base_a, base_b)]),
             default=0)
    return ray.data.from_arrow(pa.table({
        "ks_scaled": pa.array([ks], pa.int64()),
        "n_a": pa.array([na_tot], pa.int64()),
        "n_b": pa.array([nb_tot], pa.int64())}))


def trimmed_mean_prices(sf_dir: str, lo_pct: int = 10, hi_pct: int = 90
                        ) -> ray.data.Dataset:
    """Grouped TRIMMED MEAN as an exact integer (sum, count) pair: per
    returnflag, the sum and count of prices whose in-group rank (1-based,
    value-then-rowid order) satisfies 100·rank > lo_pct·n and
    100·rank ≤ hi_pct·n — the outlier-robust average, division at
    presentation time. The cut is pure INTEGER algebra on both engines
    (a float 0.1·n ceil disagrees with (n+9)//10 at exact multiples).

    ONE key sort; in-block rank from position (lexsort on value with
    orderkey/linenumber tie-break so both engines trim the SAME rows
    under duplicate values). Output (l_returnflag, trimmed_sum_c, n_kept).
    """
    from ..functions.grouped import group_ids, sorted_group_apply

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_orderkey", "l_linenumber",
                        "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "ok_": pc.cast(b["l_orderkey"], pa.int64()),
            "ln_": pc.cast(b["l_linenumber"], pa.int64()),
            "price_c": _scaled_int(b["l_extendedprice"], 100.0)})

    def block(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("l_returnflag", pa.string()),
                                ("trimmed_sum_c", pa.int64()),
                                ("n_kept", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["l_returnflag"])
        v = b["price_c"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = b["ok_"].combine_chunks().to_numpy(zero_copy_only=False)
        ln = b["ln_"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ln, ok, v, gid))
        g, vs = gid[order], v[order]
        pos = np.arange(len(g), dtype=np.int64) - starts[g] + 1
        n = np.diff(np.append(starts, len(g)))[g]
        keep = (100 * pos > lo_pct * n) & (100 * pos <= hi_pct * n)
        t = pa.table({"f": b["l_returnflag"].take(pa.array(order[keep])),
                      "s": pa.array(vs[keep], pa.int64()),
                      "c": pa.array(np.ones(int(keep.sum()), np.int64))})
        return t.group_by(["f"], use_threads=False).aggregate(
            [("s", "sum"), ("c", "sum")]) \
            .rename_columns(["l_returnflag", "trimmed_sum_c", "n_kept"])

    return sorted_group_apply(li.map_batches(prep, batch_format="pyarrow",
                                             zero_copy_batch=True),
                              ["l_returnflag"], block, 1)


def longest_streak_per_user(sf_dir: str) -> ray.data.Dataset:
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active
    days — the classic streak query (SQL: day - ROW_NUMBER() island key,
    two GROUP BYs). Retention/engagement feature for training-data
    curation.

    Scale shape: a stateless per-block (user, day) distinct partial first
    (events collapse ~day-cardinality-fold before any shuffle), then ONE
    user-keyed sort; inside each sorted block the island decomposition is
    pure numpy — distinct (user, day) again (cross-block dupes), break
    flags where the day gap != 1, run lengths via flatnonzero diffs, and
    a per-user ``maximum.reduceat`` over run lengths. One row per user
    crosses out of the block. Output (user_id, streak_days).
    """
    from ..functions.grouped import group_ids, sorted_group_apply

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def day_partial(b: pa.Table) -> pa.Table:
        day = b["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[D]").astype(np.int64)
        t = pa.table({"user_id": b["user_id"],
                      "day": pa.array(day, pa.int64())})
        return t.group_by(["user_id", "day"], use_threads=False) \
            .aggregate([]).rename_columns(["user_id", "day"])

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("streak_days", pa.int64())])

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["user_id"])
        day = b["day"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((day, gid))
        g, d = gid[order], day[order]
        uniq = np.concatenate([[True], (g[1:] != g[:-1]) | (d[1:] != d[:-1])])
        g, d = g[uniq], d[uniq]
        brk = np.concatenate([[True],
                              (g[1:] != g[:-1]) | (d[1:] != d[:-1] + 1)])
        run_starts = np.flatnonzero(brk)
        run_len = np.diff(np.append(run_starts, len(g)))
        run_g = g[brk]
        user_first_run = np.concatenate([[True], run_g[1:] != run_g[:-1]])
        best = np.maximum.reduceat(run_len,
                                   np.flatnonzero(user_first_run))
        users = b["user_id"].take(pa.array(starts))
        return pa.table({"user_id": users,
                         "streak_days": pa.array(best, pa.int64())},
                        schema=out_schema)

    pre = ev.map_batches(day_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    return sorted_group_apply(pre, ["user_id"], block, 8)


def cume_dist_qty(sf_dir: str) -> ray.data.Dataset:
    """CUME_DIST() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
    in exact fixed point: cd6 = (rows with value <= mine, ties included)
    * 10^6 // n_group. Same ONE-key-sort sorted-block window shape as
    :func:`percent_rank_qty`; the <=-count is the END of each tie run
    (run-id indexed last positions), so ties share the value exactly as
    the SQL RANGE frame does.
    """
    from ..functions.grouped import group_ids, sorted_group_apply

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_returnflag",
                        "l_quantity"])

    out_schema = pa.schema([
        ("l_orderkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_returnflag", pa.string()), ("cd6", pa.int64())])

    def cd_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["l_returnflag"])
        qty = b["l_quantity"].combine_chunks().to_numpy(
            zero_copy_only=False)
        ok = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        ln = b["l_linenumber"].combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.lexsort((ln, ok, qty, gid))
        g, q = gid[order], qty[order]
        new_val = np.concatenate([[True],
                                  (q[1:] != q[:-1]) | (g[1:] != g[:-1])])
        run_id = np.cumsum(new_val) - 1
        run_last = np.flatnonzero(np.append(new_val[1:], True))
        count_le = run_last[run_id] - starts[g] + 1
        sizes = np.diff(np.append(starts, len(g)))
        cd6 = count_le * 1_000_000 // sizes[g]
        return pa.table({
            "l_orderkey": pa.array(ok[order], pa.int64()),
            "l_linenumber": pa.array(ln[order], pa.int32()),
            "l_returnflag": b["l_returnflag"].take(pa.array(order)),
            "cd6": pa.array(cd6, pa.int64())}, schema=out_schema)

    return sorted_group_apply(li, ["l_returnflag"], cd_block)


def scd2_intervals(sf_dir: str) -> ray.data.Dataset:
    """CDC → slowly-changing-dimension type-2 intervals: per user, the
    runs of the event_type stream collapse to (user_id, event_type,
    valid_from, valid_to) validity rows — consecutive duplicates merge,
    each interval closes at the NEXT change's timestamp, the current
    (open) interval carries valid_to = -1 (sentinel, not NULL — join
    outputs stay null-free for engine-independent hashing).

    ONE user-keyed sort; in-block it is a change-flag mask + two
    shifted-array reads, no per-group loop. Timestamps in epoch
    microseconds, tie-broken by event_id exactly like the oracle.
    """
    from ..functions.grouped import group_ids, sorted_group_apply

    ev = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])
    out_schema = pa.schema([("user_id", pa.int64()),
                            ("event_type", pa.string()),
                            ("valid_from", pa.int64()),
                            ("valid_to", pa.int64())])

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        ts = b["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, gid))
        g, t = gid[order], ts[order]
        typ = b["event_type"].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False)[order]
        change = np.concatenate([[True],
                                 (g[1:] != g[:-1]) | (typ[1:] != typ[:-1])])
        si = np.flatnonzero(change)
        sg = g[si]
        nxt_same_user = np.append(sg[1:] == sg[:-1], False)
        valid_to = np.where(nxt_same_user,
                            np.append(t[si[1:]], -1), -1)
        take = pa.array(order[si])
        return pa.table({
            "user_id": pc.cast(b["user_id"].take(take), pa.int64()),
            "event_type": b["event_type"].take(take),
            "valid_from": pa.array(t[si], pa.int64()),
            "valid_to": pa.array(valid_to, pa.int64())},
            schema=out_schema)

    return sorted_group_apply(ev, ["user_id"], block, 8)


def mannwhitney_u_events(sf_dir: str, type_a: str = "click",
                         type_b: str = "purchase") -> ray.data.Dataset:
    """Exact two-sample Mann-Whitney U (rank-sum) statistic between two
    event types' value distributions, in PURE integers: with average
    ranks over ties, 2*R_A is always integral — for a tie run of
    combined size c starting after s combined rows, each A-member
    contributes (2s + c + 1) to 2*R_A. Then 2*U_A = 2*R_A − n_A(n_A+1).

    Same distributed-prefix-scan shape as :func:`ks_drift_prices`: the
    corpus folds map-side to per-value (n_a, n_b) counts, ONE value sort
    colocates ranges, per-block subtotals give each block its base
    offset, and the per-block contribution is one vectorized pass.
    Output a single row (n_a, n_b, u2_a)."""
    from ..functions.grouped import sorted_aggregate

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["event_type"],
                              value_set=pa.array([type_a, type_b])))
        isa = pc.equal(t["event_type"], type_a)
        tt = pa.table({
            "v": _scaled_int(t["value"], 100.0),
            "na": pc.cast(isa, pa.int64()),
            "nb": pc.cast(pc.invert(isa), pa.int64())})
        return tt.group_by(["v"], use_threads=False).aggregate(
            [("na", "sum"), ("nb", "sum")]).rename_columns(
            ["v", "na", "nb"])

    counts = sorted_aggregate(
        ev.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["v"], [("na", "sum"), ("nb", "sum")], ["v", "na", "nb"], 8)

    mat = counts.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def subtotal(t: pa.Table):
        return (int(pc.sum(t["na"]).as_py() or 0),
                int(pc.sum(t["nb"]).as_py() or 0),
                pc.min(t["v"]).as_py() if t.num_rows else None)

    subs = ray.get([subtotal.remote(r) for r in refs])
    order = sorted(range(len(refs)),
                   key=lambda i: (subs[i][2] is None, subs[i][2]))
    refs = [refs[i] for i in order]
    subs = [subs[i] for i in order]
    n_a = sum(s[0] for s in subs)
    n_b = sum(s[1] for s in subs)
    tot = [s[0] + s[1] for s in subs]
    bases = np.concatenate([[0], np.cumsum(tot)[:-1]]).astype(np.int64)
    if float(n_a) * float(n_a + n_b) * 2.0 >= float(1 << 62):
        raise OverflowError("mannwhitney_u: rescale (rank sums exceed "
                            "int64 headroom)")

    @ray.remote
    def block_r2(t: pa.Table, base: int) -> int:
        if t.num_rows == 0:
            return 0
        t = t.sort_by("v")
        na = t["na"].to_numpy(zero_copy_only=False)
        c = na + t["nb"].to_numpy(zero_copy_only=False)
        s = base + np.concatenate([[0], np.cumsum(c)[:-1]])
        return int((na * (2 * s + c + 1)).sum())

    r2_a = sum(ray.get([block_r2.remote(r, int(b))
                        for r, b in zip(refs, bases)]))
    u2_a = r2_a - n_a * (n_a + 1)
    return ray.data.from_arrow(pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "u2_a": pa.array([u2_a], pa.int64())}))


def top_event_paths(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Sequential-pattern mining: the k most common 3-step event-type
    journeys (consecutive per user, time-ordered). ONE user-keyed sort;
    in-block the trigrams are two shifted-array reads under a same-user
    mask; counts fold map-side per block to <= |types|^3 rows, ONE tiny
    sum all-to-all, then a |types|^3-row sort — the corpus never moves.
    Ties broken (n DESC, t1, t2, t3) identically to the oracle."""
    from ..functions.grouped import group_ids, sorted_aggregate, \
        sorted_group_apply

    ev = _read(sf_dir, "events", columns=["event_id", "user_id",
                                          "event_type", "ts"])
    part_schema = pa.schema([("t1", pa.string()), ("t2", pa.string()),
                             ("t3", pa.string()), ("n", pa.int64())])

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows < 3:
            return part_schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        ts = b["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, gid))
        g = gid[order]
        typ = b["event_type"].combine_chunks().take(pa.array(order))
        m = len(g) - 2
        same = (g[:-2] == g[2:])  # rows i, i+1, i+2 share the user
        t = pa.table({"t1": typ.slice(0, m), "t2": typ.slice(1, m),
                      "t3": typ.slice(2, m),
                      "n": pa.array(np.ones(m, np.int64))}) \
            .filter(pa.array(same))
        return t.group_by(["t1", "t2", "t3"], use_threads=False) \
            .aggregate([("n", "sum")]) \
            .rename_columns(["t1", "t2", "t3", "n"]).cast(part_schema)

    counts = sorted_aggregate(
        sorted_group_apply(ev, ["user_id"], block, 8),
        ["t1", "t2", "t3"], [("n", "sum")], ["t1", "t2", "t3", "n"], 1)
    return counts.sort(["n", "t1", "t2", "t3"],
                       descending=[True, False, False, False]).limit(k)


def pareto_abc_customers(sf_dir: str) -> ray.data.Dataset:
    """Pareto / ABC revenue classification: customers ranked by total
    order revenue DESC; class A while the cumulative share is <= 80%,
    B to 95%, C after — decided in exact integers (100*cum vs 80*total),
    never a float share.

    Grouped revenue partials -> ONE (rev DESC, custkey) sort (unique
    composite key, so no tie can straddle a block boundary) -> the
    distributed prefix-scan: per-block subtotals give each block its
    base, classes assigned in ONE vectorized pass per block."""
    from ..functions.grouped import sorted_aggregate

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"o_custkey": b["o_custkey"],
                      "rev_c": _scaled_int(b["o_totalprice"], 100.0)})
        return t.group_by(["o_custkey"], use_threads=False).aggregate(
            [("rev_c", "sum")]).rename_columns(["o_custkey", "rev_c"])

    rev = sorted_aggregate(
        orders.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["o_custkey"], [("rev_c", "sum")], ["o_custkey", "rev_c"], 8)
    ranked = rev.sort(["rev_c", "o_custkey"],
                      descending=[True, False]).materialize()
    refs = ranked.to_arrow_refs()

    @ray.remote
    def subtotal(t: pa.Table):
        if t.num_rows == 0:
            return 0, None, None
        return (int(pc.sum(t["rev_c"]).as_py()),
                -int(t["rev_c"][0].as_py()), int(t["o_custkey"][0].as_py()))

    subs = ray.get([subtotal.remote(r) for r in refs])
    order = sorted(range(len(refs)),
                   key=lambda i: (subs[i][1] is None,
                                  subs[i][1], subs[i][2]))
    refs = [refs[i] for i in order]
    tots = [subs[i][0] for i in order]
    total = sum(tots)
    bases = np.concatenate([[0], np.cumsum(tots)[:-1]]).astype(np.int64)
    if float(total) * 100.0 >= float(1 << 62):
        raise OverflowError("pareto_abc: rescale (cumulative revenue "
                            "exceeds int64 headroom)")

    @ray.remote
    def classify(t: pa.Table, base: int, tot: int) -> pa.Table:
        out_schema = pa.schema([("o_custkey", pa.int64()),
                                ("rev_c", pa.int64()),
                                ("abc", pa.string())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        cum = base + np.cumsum(t["rev_c"].to_numpy(zero_copy_only=False))
        cls = np.where(100 * cum <= 80 * tot, "A",
                       np.where(100 * cum <= 95 * tot, "B", "C"))
        return pa.table({"o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                         "rev_c": t["rev_c"],
                         "abc": pa.array(cls, pa.string())},
                        schema=out_schema)

    import ray.data as rd
    return rd.from_arrow_refs(
        [classify.remote(r, int(b), int(total))
         for r, b in zip(refs, bases)])


def robust_anomaly_events(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Robust (median/MAD) outlier flagging — the heavy-tail-safe
    companion to the mean/sigma z-score op (events_anomaly): flag events
    with |value_c − median| > k·MAD, per event type, all in exact cents
    (LOW median both passes, same contract as mad_prices_by_flag).

    Two order-statistic passes produce a |types|-row stats table that
    rides the task closure; the corpus itself streams through ONE
    stateless filter pass. Output (event_id, event_type, vc)."""
    from ..functions.quantiles import grouped_quantiles

    ev = _read(sf_dir, "events", columns=["event_id", "event_type",
                                          "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table({"event_id": b["event_id"],
                         "event_type": b["event_type"],
                         "vc": _scaled_int(b["value"], 100.0)})

    cents = ev.map_batches(to_cents, batch_format="pyarrow",
                           zero_copy_batch=True)
    med_rows = grouped_quantiles(cents, "event_type", "vc",
                                 [0.5], 1).take_all()
    types = [r["event_type"] for r in med_rows]
    meds = np.array([int(r["value"]) for r in med_rows], np.int64)
    type_arr = pa.array(types, pa.string())

    def deviations(b: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(b["event_type"], pa.string()),
                          value_set=type_arr).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["vc"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"event_type": b["event_type"],
                         "dev": pa.array(np.abs(v - meds[idx]), pa.int64())})

    mad_rows = grouped_quantiles(
        cents.map_batches(deviations, batch_format="pyarrow",
                          zero_copy_batch=True),
        "event_type", "dev", [0.5], 1).take_all()
    mads = {r["event_type"]: int(r["value"]) for r in mad_rows}
    mad_np = np.array([mads[t] for t in types], np.int64)

    def flag(b: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(b["event_type"], pa.string()),
                          value_set=type_arr).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["vc"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.abs(v - meds[idx]) > k * mad_np[idx]
        return b.filter(pa.array(keep))

    return cents.map_batches(flag, batch_format="pyarrow",
                             zero_copy_batch=True)


def winsorize_events(sf_dir: str, lo_q: float = 0.05,
                     hi_q: float = 0.95) -> ray.data.Dataset:
    """Winsorization (outlier capping) — the curation transform that
    CLIPS instead of dropping: per event type, values cap at the q05/q95
    order statistics (quantile_disc semantics: actual data values, so
    everything stays exact cents). The |types|×2 cap table rides the
    task closure; the corpus streams through ONE stateless clip pass.
    Output (event_id, event_type, vc_capped)."""
    from ..functions.quantiles import grouped_quantiles

    ev = _read(sf_dir, "events", columns=["event_id", "event_type",
                                          "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table({"event_id": b["event_id"],
                         "event_type": b["event_type"],
                         "vc": _scaled_int(b["value"], 100.0)})

    cents = ev.map_batches(to_cents, batch_format="pyarrow",
                           zero_copy_batch=True)
    rows = grouped_quantiles(cents, "event_type", "vc",
                             [lo_q, hi_q], 1).take_all()
    lo = {r["event_type"]: int(r["value"]) for r in rows
          if r["q"] == lo_q}
    hi = {r["event_type"]: int(r["value"]) for r in rows
          if r["q"] == hi_q}
    types = sorted(lo)
    type_arr = pa.array(types, pa.string())
    lo_np = np.array([lo[t] for t in types], np.int64)
    hi_np = np.array([hi[t] for t in types], np.int64)

    def clip(b: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(b["event_type"], pa.string()),
                          value_set=type_arr).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["vc"].combine_chunks().to_numpy(zero_copy_only=False)
        capped = np.minimum(np.maximum(v, lo_np[idx]), hi_np[idx])
        return pa.table({"event_id": b["event_id"],
                         "event_type": b["event_type"],
                         "vc_capped": pa.array(capped, pa.int64())})

    return cents.map_batches(clip, batch_format="pyarrow",
                             zero_copy_batch=True)


def trailing_sum_1h(sf_dir: str) -> ray.data.Dataset:
    """Time-RANGE window (the interval sibling of the ROWS-frame
    moving_sum): at every event, the sum of that user's values within the
    trailing hour INCLUSIVE of order-key peers — exactly SQL's
    ``RANGE BETWEEN 3_600_000_000 PRECEDING AND CURRENT ROW`` (peers =
    same-timestamp rows, so the frame can extend past the current row's
    position; ROWS frames cannot express this).

    ONE user sort; in-block: composed (user, time) keys, a prefix-sum
    array, and two searchsorted passes (window start via side='left' on
    t−1h, peer-run end via side='right' on the own key). Exact cents.
    """
    from ..functions.grouped import group_ids, sorted_group_apply

    ev = _read(sf_dir, "events", columns=["event_id", "user_id",
                                          "value", "ts"])
    out_schema = pa.schema([("event_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("win_sum_c", pa.int64())])
    HOUR_US = 3_600_000_000

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        ts = b["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        vc = _scaled_int(b["value"], 100.0).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, gid))
        g, t, e, v = gid[order], ts[order], eid[order], vc[order]
        tmin = int(t.min(initial=0))
        span = int(t.max(initial=0)) - tmin + HOUR_US + 2
        key = g * span + (t - tmin)
        lo_t = np.maximum(t - HOUR_US - tmin, 0)
        lo = np.searchsorted(key, g * span + lo_t, side="left")
        hi = np.searchsorted(key, key, side="right") - 1
        cs = np.cumsum(v)
        win = cs[hi] - np.where(lo > 0, cs[lo - 1], 0)
        uid = b["user_id"].combine_chunks().to_numpy(
            zero_copy_only=False)[order]
        return pa.table({
            "event_id": pa.array(e, pa.int64()),
            "user_id": pa.array(uid.astype(np.int64), pa.int64()),
            "win_sum_c": pa.array(win, pa.int64())}, schema=out_schema)

    return sorted_group_apply(ev, ["user_id"], block, 8)


def time_in_state(sf_dir: str) -> ray.data.Dataset:
    """Dwell time per (user, event_type): total microseconds each user
    spent 'in' each type, from the CLOSED SCD2 validity intervals
    (:func:`scd2_intervals` composition — the open tail interval is
    excluded on both engines). Per-block (user, type) partials, ONE tiny
    grouped sum. Output (user_id, event_type, n_intervals, total_us)."""
    from ..functions.grouped import sorted_aggregate

    iv = scd2_intervals(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.not_equal(b["valid_to"], -1))
        tt = pa.table({
            "user_id": t["user_id"], "event_type": t["event_type"],
            "n_intervals": pa.array(np.ones(t.num_rows, np.int64)),
            "total_us": pc.subtract(t["valid_to"], t["valid_from"])})
        return tt.group_by(["user_id", "event_type"],
                           use_threads=False).aggregate(
            [("n_intervals", "sum"), ("total_us", "sum")]) \
            .rename_columns(["user_id", "event_type",
                             "n_intervals", "total_us"])

    return sorted_aggregate(
        iv.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id", "event_type"],
        [("n_intervals", "sum"), ("total_us", "sum")],
        ["user_id", "event_type", "n_intervals", "total_us"], 8)


def above_avg_orders(sf_dir: str) -> ray.data.Dataset:
    """Correlated-subquery decorrelation: for every customer, how many of
    their orders cost strictly more than THEIR OWN average order price
    (the classic ``WHERE price > (SELECT avg(...) ... correlated)``
    shape). Decorrelated Ray-Data-first: ONE shuffle co-locates each
    customer's orders, then the per-group comparison is pure block-local
    arithmetic — no second scan, no join back.

    Exact integers: prices are cents (``_scaled_int``), and ``price >
    avg`` is evaluated as ``cents * n > sum_cents`` so no float division
    ever happens (ties at exactly-average are excluded identically on
    both engines). Output: (o_custkey, n_orders, n_above) by custkey.
    """
    from ..functions.grouped import group_ids, sorted_group_apply
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": b["o_custkey"],
                         "cents": _scaled_int(b["o_totalprice"], 100)})

    out_schema = pa.schema([("o_custkey", pa.int64()),
                            ("n_orders", pa.int64()),
                            ("n_above", pa.int64())])

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["o_custkey"])
        c = b["cents"].to_numpy()
        n = np.diff(np.append(starts, len(gid))).astype(np.int64)
        s = np.add.reduceat(c, starts)
        above = (c * n[gid] > s[gid]).astype(np.int64)
        n_above = np.add.reduceat(above, starts)
        keys = pc.cast(b["o_custkey"], pa.int64()).take(pa.array(starts))
        return pa.table({"o_custkey": keys,
                         "n_orders": pa.array(n),
                         "n_above": pa.array(n_above)}, schema=out_schema)

    return sorted_group_apply(
        orders.map_batches(cents, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["o_custkey"], block, 8).sort("o_custkey")


def tpch_q18(sf_dir: str, qty_threshold: int = 300,
             limit: int = 100) -> ray.data.Dataset:
    """TPC-H Q18 (large-volume customers): orders whose total lineitem
    quantity exceeds ``qty_threshold``, with customer name, ordered by
    order value.

    Shape: ONE shuffle (the per-order quantity sum); the HAVING filter
    makes the surviving set tiny by construction (Q18 hunts outliers), so
    it broadcasts as a sorted (orderkey, sum_qty) array probed inside a
    single pass over orders — no second all-to-all. Customer is the
    classic small dimension, broadcast the same way for the name lookup.
    Partitioning assumption documented: the HAVING-filtered set must fit
    the object store comfortably (it's ~ppm of orders at any scale; if a
    threshold made it large, the fallback is the attach_column co-group).
    Quantities are integral in TPC-H; summed as exact int64.
    """
    import pyarrow.parquet as pq

    from ..functions.grouped import sorted_aggregate
    from ..functions.joins import probe_sorted

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty(b: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "q": _scaled_int(b["l_quantity"], 1.0)})

    sums = sorted_aggregate(
        li.map_batches(qty, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"], [("q", "sum")], ["l_orderkey", "sum_qty"], 8) \
        .filter(expr=f"sum_qty > {qty_threshold}")
    nonempty = [t for t in ray.get(sums.to_arrow_refs()) if t.num_rows]
    if nonempty:
        tb = pa.concat_tables(nonempty)
        ok = tb["l_orderkey"].to_numpy()
        qv = tb["sum_qty"].to_numpy()
    else:
        ok = qv = np.empty(0, np.int64)
    o = np.argsort(ok)
    hot_ref = ray.put((ok[o], qv[o]))

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    ck = cust["c_custkey"].to_numpy()
    names = cust["c_name"].combine_chunks()
    corder = np.argsort(ck)
    cust_ref = ray.put((ck[corder],
                        names.take(pa.array(corder))))

    class Probe:
        def __init__(self):
            self.ok, self.qty = ray.get(hot_ref)
            self.ck, self.names = ray.get(cust_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            k = pc.cast(b["o_orderkey"], pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            q = probe_sorted(self.ok, self.qty, k, missing=-1)
            hit = q >= 0
            t = b.filter(pa.array(hit))
            cu = pc.cast(t["o_custkey"], pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.ck, cu)
            return pa.table({
                "c_name": self.names.take(pa.array(pos)),
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "total_c": _scaled_int(t["o_totalprice"], 100.0),
                "sum_qty": pa.array(q[hit], pa.int64())})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_totalprice"])
    # broadcast-built probe as stateless tasks: no pool to wedge a
    # low-CPU session (the old verify-skill gotcha) and no spawn tail
    from ..functions.broadcast import broadcast_map_batches
    return broadcast_map_batches(orders, Probe, batch_format="pyarrow") \
        .sort(["total_c", "o_orderkey"], descending=[True, False]) \
        .limit(limit)


def tpch_q6(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q6 (forecasting revenue change): one filtered scan, zero
    joins, zero wide shuffles — the canonical predicate-pushdown +
    map-side-fold query. Revenue = Σ extendedprice·discount over 1996
    shipments with discount in [0.05, 0.07] and quantity < 24, in exact
    integer units (cents × discount-percent), folded to one partial row
    per block before a single tiny constant-key sum."""
    from ..functions.grouped import sorted_aggregate

    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity",
                "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        disc_c = _scaled_int(b["l_discount"], 100.0)
        m = pc.and_(
            pc.and_(pc.equal(pc.year(b["l_shipdate"]), 1996),
                    pc.less(_scaled_int(b["l_quantity"], 1.0), 24)),
            pc.and_(pc.greater_equal(disc_c, 5), pc.less_equal(disc_c, 7)))
        t = b.filter(m)
        rev = (_scaled_int(t["l_extendedprice"], 100.0).to_numpy()
               * _scaled_int(t["l_discount"], 100.0).to_numpy())
        return pa.table({"__g": pa.array([0], pa.int64()),
                         "n_rows": pa.array([t.num_rows], pa.int64()),
                         "revenue_c2": pa.array([int(rev.sum())],
                                                pa.int64())})

    return sorted_aggregate(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["__g"], [("n_rows", "sum"), ("revenue_c2", "sum")],
        ["__g", "n_rows", "revenue_c2"], 1).map_batches(
        lambda b: b.select(["n_rows", "revenue_c2"]),
        batch_format="pyarrow", zero_copy_batch=True)


def tpch_q14(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q14 (promotion effect): lineitem ⋈ part with the 200-row
    part dimension broadcast as a sorted (partkey, is_promo) array —
    the shuffle-free big×small join — and exact integer revenue units
    cents×(100−disc). The single float (promo revenue share) happens
    once on the driver from the two integer sums."""
    import pyarrow.parquet as pq

    from ..functions.grouped import sorted_aggregate
    from ..functions.joins import probe_sorted

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pk = part["p_partkey"].to_numpy()
    promo = pc.equal(part["p_type"], "PROMO").to_numpy(
        zero_copy_only=False).astype(np.int64)
    order = np.argsort(pk)
    lookup = ray.put((pk[order], promo[order]))

    class Fold:
        def __init__(self):
            self.pk, self.promo = ray.get(lookup)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = pc.and_(pc.equal(pc.year(b["l_shipdate"]), 1996),
                        pc.equal(pc.month(b["l_shipdate"]), 3))
            t = b.filter(m)
            k = pc.cast(t["l_partkey"], pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            is_promo = probe_sorted(self.pk, self.promo, k, missing=0)
            rev = (_scaled_int(t["l_extendedprice"], 100.0).to_numpy()
                   * (100 - _scaled_int(t["l_discount"], 100.0)
                      .to_numpy()))
            return pa.table({
                "__g": pa.array([0], pa.int64()),
                "promo_c2": pa.array([int(rev[is_promo == 1].sum())],
                                     pa.int64()),
                "total_c2": pa.array([int(rev.sum())], pa.int64())})

    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_partkey", "l_discount",
                "l_extendedprice"])
    from ..functions.broadcast import broadcast_map_batches
    s = sorted_aggregate(
        broadcast_map_batches(li, Fold, batch_format="pyarrow"),
        ["__g"], [("promo_c2", "sum"), ("total_c2", "sum")],
        ["__g", "promo_c2", "total_c2"], 1).to_pandas()
    promo_c2, total_c2 = int(s["promo_c2"][0]), int(s["total_c2"][0])
    pct = 100.0 * promo_c2 / total_c2 if total_c2 else 0.0
    return pa.table({"promo_c2": pa.array([promo_c2], pa.int64()),
                     "total_c2": pa.array([total_c2], pa.int64()),
                     "promo_pct": pa.array([pct], pa.float64())})


FK_RELATIONS = (
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
)


def fk_integrity_audit(sf_dir: str) -> ray.data.Dataset:
    """Referential-integrity audit across the star schema: per FK
    relation, (n_child_rows, n_distinct_keys, n_orphans) — the
    relational companion of quality_audit_events. Parent key sets
    broadcast as sorted arrays (the biggest, orders, is ~1% of lineitem
    bytes; past broadcast scale the `functions/setops.anti_join` is the
    drop-in orphan path); each child table folds map-side to ONE partial
    row per block, so the audit adds no wide shuffle at all. The count
    columns keep the oracle row informative even at zero orphans."""
    import pyarrow.parquet as pq

    from ..functions.grouped import sorted_aggregate
    from ..functions.joins import probe_sorted

    parts = []
    for fk, child, ccol, parent, pcol in FK_RELATIONS:
        keys = np.sort(pq.read_table(f"{sf_dir}/{parent}.parquet",
                                     columns=[pcol])[pcol].to_numpy())
        ones = np.ones(len(keys), np.int64)
        lookup = ray.put((keys, ones))
        name = fk

        def fold(b: pa.Table, _l=lookup, _n=name, _c=ccol) -> pa.Table:
            """Per-block partial: row/orphan counts fold to ONE row, and
            the block's distinct keys are emitted as (fk, k) rows so the
            per-fk distinct count reduces EXACTLY downstream (summing
            per-block distinct partials would overcount keys that repeat
            across blocks)."""
            k = pc.cast(b[_c], pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            pk, pv = ray.get(_l)
            hit = probe_sorted(pk, pv, k, missing=0)
            uk = np.unique(k)
            n = len(uk)
            return pa.table({
                "fk": pa.array([_n] * n, pa.string()),
                "k": pa.array(uk, pa.int64()),
                "n_child_rows": pa.array(
                    np.concatenate([[len(k)], np.zeros(n - 1, np.int64)])
                    if n else np.empty(0, np.int64)),
                "n_orphans": pa.array(
                    np.concatenate([[int((hit == 0).sum())],
                                    np.zeros(n - 1, np.int64)])
                    if n else np.empty(0, np.int64))})

        parts.append(_read(sf_dir, child, [ccol]).map_batches(
            fold, batch_format="pyarrow"))

    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    per_key = sorted_aggregate(
        u, ["fk", "k"],
        [("n_child_rows", "sum"), ("n_orphans", "sum"), ("k", "count")],
        ["fk", "k", "n_child_rows", "n_orphans", "__one"], 8)

    def collapse(b: pa.Table) -> pa.Table:
        return b.group_by(["fk"], use_threads=False).aggregate(
            [("n_child_rows", "sum"), ("n_orphans", "sum"),
             ("k", "count")]) \
            .rename_columns(["fk", "n_child_rows", "n_orphans",
                             "n_distinct_keys"])

    agg = sorted_aggregate(
        per_key.map_batches(collapse, batch_format="pyarrow"),
        ["fk"],
        [("n_child_rows", "sum"), ("n_orphans", "sum"),
         ("n_distinct_keys", "sum")],
        ["fk", "n_child_rows", "n_orphans", "n_distinct_keys"], 1)
    return agg.map_batches(
        lambda b: b.select(["fk", "n_child_rows", "n_distinct_keys",
                            "n_orphans"]),
        batch_format="pyarrow", zero_copy_batch=True).sort("fk")


def tpch_q10(sf_dir: str, limit: int = 20) -> ray.data.Dataset:
    """TPC-H Q10 (returned-item reporting): top customers by revenue lost
    to returns in 1996 Q1. The big×big lineitem⋈orders edge goes through
    the DISTRIBUTED co-group attach (functions/joins.attach_column) —
    orders is NOT broadcast (at corpus scale it no longer fits); the
    returned-and-windowed lineitem side pre-aggregates per (orderkey)
    map-side first, so the join input is return-sized, not corpus-sized.
    Customer (the true small dim) broadcasts for the name. Revenue in
    exact integer cents×(100−disc) units."""
    import pyarrow.parquet as pq

    from ..functions.grouped import sorted_aggregate
    from ..functions.joins import attach_column, probe_sorted

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_shipdate",
                "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        sd = b["l_shipdate"]
        m = pc.and_(pc.equal(b["l_returnflag"], "R"),
                    pc.and_(pc.equal(pc.year(sd), 1996),
                            pc.less_equal(pc.month(sd), 3)))
        t = b.filter(m)
        rev = (_scaled_int(t["l_extendedprice"], 100.0).to_numpy()
               * (100 - _scaled_int(t["l_discount"], 100.0).to_numpy()))
        part = pa.table({"l_orderkey": pc.cast(t["l_orderkey"],
                                               pa.int64()),
                         "rev_c2": pa.array(rev, pa.int64())})
        return part.group_by(["l_orderkey"], use_threads=False) \
            .aggregate([("rev_c2", "sum")]) \
            .rename_columns(["l_orderkey", "rev_c2"])

    per_order = sorted_aggregate(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["l_orderkey"], [("rev_c2", "sum")],
        ["l_orderkey", "rev_c2"], 8)
    with_cust = attach_column(
        per_order, _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        [("l_orderkey", pa.int64()), ("rev_c2", pa.int64())],
        "l_orderkey", "o_orderkey", "o_custkey", "o_custkey",
        pa.int64(), 8)
    per_cust = sorted_aggregate(
        with_cust, ["o_custkey"], [("rev_c2", "sum")],
        ["o_custkey", "revenue_c2"], 8) \
        .sort(["revenue_c2", "o_custkey"], descending=[True, False]) \
        .limit(limit)

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    ck = cust["c_custkey"].to_numpy()
    names = cust["c_name"].combine_chunks()
    corder = np.argsort(ck)
    lookup = ray.put((ck[corder], names.take(pa.array(corder))))

    def name(b: pa.Table) -> pa.Table:
        ks, nm = ray.get(lookup)
        k = pc.cast(b["o_custkey"], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, k)
        return pa.table({"o_custkey": b["o_custkey"],
                         "c_name": nm.take(pa.array(pos)),
                         "revenue_c2": b["revenue_c2"]})

    return per_cust.map_batches(name, batch_format="pyarrow")


def tpch_q19(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): revenue
    from lineitems matching ANY of three (brand, size-range, qty-range)
    conjunction arms — the OR-of-ANDs shape that defeats naive predicate
    pushdown. Part attributes (brand code, size) broadcast as sorted
    arrays; each arm is one vectorized mask, OR-combined per batch, and
    everything folds map-side to one partial row per block. Exact
    integer cents×(100−disc) revenue units."""
    import pyarrow.parquet as pq

    from ..functions.grouped import sorted_aggregate
    from ..functions.joins import probe_sorted

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part["p_partkey"].to_numpy()
    brand = part["p_brand"].combine_chunks().dictionary_encode()
    brand_names = brand.dictionary.to_pylist()
    order = np.argsort(pk)
    lookup = ray.put((pk[order],
                      brand.indices.to_numpy().astype(np.int64)[order],
                      part["p_size"].to_numpy().astype(np.int64)[order],
                      brand_names))

    ARMS = (("Brand#1", 1, 10, 1, 15),   # brand, size lo-hi, qty lo-hi
            ("Brand#2", 1, 20, 10, 25),
            ("Brand#3", 1, 30, 20, 35))

    class Fold:
        def __init__(self):
            self.pk, self.bcode, self.size, names = ray.get(lookup)
            self.brand_of = {n: i for i, n in enumerate(names)}

        def __call__(self, b: pa.Table) -> pa.Table:
            k = pc.cast(b["l_partkey"], pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(self.pk, k), 0,
                          len(self.pk) - 1)
            valid = self.pk[pos] == k  # inner-join semantics on the FK
            bc = np.where(valid, self.bcode[pos], -1)
            sz = self.size[pos]
            qty = _scaled_int(b["l_quantity"], 1.0).to_numpy()
            m = np.zeros(len(k), bool)
            for bname, slo, shi, qlo, qhi in ARMS:
                code = self.brand_of.get(bname, -2)  # -1 marks orphans
                m |= ((bc == code) & (sz >= slo) & (sz <= shi)
                      & (qty >= qlo) & (qty <= qhi))
            rev = (_scaled_int(b["l_extendedprice"], 100.0).to_numpy()
                   * (100 - _scaled_int(b["l_discount"], 100.0)
                      .to_numpy()))
            return pa.table({
                "__g": pa.array([0], pa.int64()),
                "n_rows": pa.array([int(m.sum())], pa.int64()),
                "revenue_c2": pa.array([int(rev[m].sum())], pa.int64())})

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"])
    from ..functions.broadcast import broadcast_map_batches
    return sorted_aggregate(
        broadcast_map_batches(li, Fold, batch_format="pyarrow"),
        ["__g"], [("n_rows", "sum"), ("revenue_c2", "sum")],
        ["__g", "n_rows", "revenue_c2"], 1).map_batches(
        lambda b: b.select(["n_rows", "revenue_c2"]),
        batch_format="pyarrow", zero_copy_batch=True)


CORR_MEASURES = (("qty", "l_quantity", 1.0),
                 ("price", "l_extendedprice", 0.01),  # floor dollars
                 ("disc", "l_discount", 100.0),
                 ("tax", "l_tax", 100.0))


def correlation_matrix(sf_dir: str) -> pa.Table:
    """Pairwise Pearson correlation matrix over the lineitem measures —
    the feature-screening pass of a training-data pipeline, in EXACT
    integer moment arithmetic (the same family as rel_cov_qty_price /
    rel_ols_slope): per block, ONE partial row per measure pair carrying
    (n, Σx, Σy, Σxy, Σx², Σy²); the only exchange is |pairs| rows per
    block. The driver assembles n·Σxy − ΣxΣy and n·Σx² − (Σx)² in Python
    big-int (overflow-free), verifies the published int64 pieces fit, and
    the single float (corr) is the identical ``cov / sqrt(vx·vy)`` IEEE
    expression the SQL twin uses. Zero variance pins corr = 0.0 on both
    sides (degenerate-stat convention)."""
    from ..functions.grouped import sorted_aggregate

    names = [n for n, _, _ in CORR_MEASURES]
    pairs = [(i, j) for i in range(len(names))
             for j in range(i + 1, len(names))]

    def partial(b: pa.Table) -> pa.Table:
        enc = {}
        for n, col, factor in CORR_MEASURES:
            if factor == 0.01:  # marker: floor dollars, not cents
                enc[n] = np.floor(b[col].to_numpy(
                    zero_copy_only=False)).astype(np.int64)
            else:
                enc[n] = _scaled_int(b[col], factor).to_numpy()
        rows = {"pair": [], "n": [], "sx": [], "sy": [], "sxy": [],
                "sxx": [], "syy": []}
        for i, j in pairs:
            x, y = enc[names[i]], enc[names[j]]
            rows["pair"].append(f"{names[i]}|{names[j]}")
            rows["n"].append(len(x))
            rows["sx"].append(int(x.sum()))
            rows["sy"].append(int(y.sum()))
            rows["sxy"].append(int((x * y).sum()))
            rows["sxx"].append(int((x * x).sum()))
            rows["syy"].append(int((y * y).sum()))
        return pa.table({"pair": pa.array(rows["pair"], pa.string()),
                         **{k: pa.array(rows[k], pa.int64())
                            for k in ("n", "sx", "sy", "sxy", "sxx",
                                      "syy")}})

    li = _read(sf_dir, "lineitem", [c for _, c, _ in CORR_MEASURES])
    agg = sorted_aggregate(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["pair"],
        [("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("sxy", "sum"),
         ("sxx", "sum"), ("syy", "sum")],
        ["pair", "n", "sx", "sy", "sxy", "sxx", "syy"], 1).to_pandas()

    out = {"var_x": [], "var_y": [], "n": [], "cov_n2": [],
           "varx_n2": [], "vary_n2": [], "corr": []}
    for _, r in agg.iterrows():
        vx, vy = r["pair"].split("|")
        n = int(r["n"])
        cov = n * int(r["sxy"]) - int(r["sx"]) * int(r["sy"])
        vxx = n * int(r["sxx"]) - int(r["sx"]) ** 2
        vyy = n * int(r["syy"]) - int(r["sy"]) ** 2
        for v in (cov, vxx, vyy):
            if abs(v) >= 2**63:
                raise OverflowError(
                    "correlation_matrix: rescale measure units")
        corr = (float(cov) / np.sqrt(float(vxx) * float(vyy))
                if vxx > 0 and vyy > 0 else 0.0)
        out["var_x"].append(vx)
        out["var_y"].append(vy)
        out["n"].append(n)
        out["cov_n2"].append(cov)
        out["varx_n2"].append(vxx)
        out["vary_n2"].append(vyy)
        out["corr"].append(corr)
    return pa.table({
        "var_x": pa.array(out["var_x"], pa.string()),
        "var_y": pa.array(out["var_y"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "cov_n2": pa.array(out["cov_n2"], pa.int64()),
        "varx_n2": pa.array(out["varx_n2"], pa.int64()),
        "vary_n2": pa.array(out["vary_n2"], pa.int64()),
        "corr": pa.array(out["corr"], pa.float64())})


GROUPING_SETS = (("l_returnflag", "l_linestatus"),
                 ("l_returnflag", "l_year"),
                 ("l_year",),
                 ())


def lineitem_grouping_sets(sf_dir: str) -> ray.data.Dataset:
    """GROUP BY GROUPING SETS over (returnflag, linestatus, ship-year) —
    the arbitrary-set generalization of rollup/cube. The finest level
    (all three dims) aggregates with ONE full-table shuffle; every
    requested set then re-aggregates that already-tiny base, so adding
    sets costs nothing corpus-sized. Each output row carries the classic
    GROUPING_ID bitmask (bit set = dimension aggregated away, MSB =
    first dim) so consumers can tell levels apart; absent dims are NULL
    (the SQL twin's convention)."""
    from ..functions.grouped import sorted_aggregate

    dims = ["l_returnflag", "l_linestatus", "l_year"]

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "l_year": pc.cast(pc.year(b["l_shipdate"]), pa.int64()),
            "qty_c": _scaled_int(b["l_quantity"], 100.0),
            "n_rows": pa.array(np.ones(b.num_rows, np.int64))})
        return t.group_by(dims, use_threads=False) \
            .aggregate([("qty_c", "sum"), ("n_rows", "sum")]) \
            .rename_columns([*dims, "sum_qty_c", "n_rows"])

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_shipdate",
                "l_quantity"])
    base = sorted_aggregate(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        dims, [("sum_qty_c", "sum"), ("n_rows", "sum")],
        [*dims, "sum_qty_c", "n_rows"], 1).materialize()

    types = {"l_returnflag": pa.string(), "l_linestatus": pa.string(),
             "l_year": pa.int64()}
    outs = []
    for keys in GROUPING_SETS:
        gid = sum(1 << (len(dims) - 1 - i)
                  for i, d in enumerate(dims) if d not in keys)
        if keys:
            lvl = sorted_aggregate(
                base, list(keys),
                [("sum_qty_c", "sum"), ("n_rows", "sum")],
                [*keys, "sum_qty_c", "n_rows"], 1)
        else:
            # grand total: per-block one-row partials off the tiny base,
            # summed on the driver (block-count-agnostic, unlike a
            # single map over an assumed-single block)
            tot = base.map_batches(
                lambda b: pa.table({
                    "sum_qty_c": pa.array(
                        [int(pc.sum(b["sum_qty_c"]).as_py() or 0)],
                        pa.int64()),
                    "n_rows": pa.array(
                        [int(pc.sum(b["n_rows"]).as_py() or 0)],
                        pa.int64())}),
                batch_format="pyarrow", zero_copy_batch=True).to_pandas()
            lvl = ray.data.from_arrow(pa.table({
                "sum_qty_c": pa.array([int(tot["sum_qty_c"].sum())],
                                      pa.int64()),
                "n_rows": pa.array([int(tot["n_rows"].sum())],
                                   pa.int64())}))

        def widen(b: pa.Table, _keys=keys, _gid=gid) -> pa.Table:
            cols = {}
            for d in dims:
                cols[d] = (pc.cast(b[d], types[d]) if d in _keys
                           else pa.nulls(b.num_rows, types[d]))
            cols["grouping_id"] = pa.array([_gid] * b.num_rows,
                                           pa.int64())
            cols["sum_qty_c"] = b["sum_qty_c"]
            cols["n_rows"] = b["n_rows"]
            return pa.table(cols)

        outs.append(lvl.map_batches(widen, batch_format="pyarrow"))

    u = outs[0]
    for o in outs[1:]:
        u = u.union(o)
    return u


# Cumulative Poisson(1) CDF in integer parts-per-billion — hardcoded so
# the Ray side and the SQL twin draw IDENTICAL weights (a runtime exp()
# could differ in the last bit). weight = #{t : u_ppb >= t}.
POISSON1_CDF_PPB = (367879441, 735758882, 919698602, 981011843,
                    996340153, 999405815, 999916758, 999989750)
BOOTSTRAP_B = 32


def bootstrap_means(sf_dir: str, n_boot: int = BOOTSTRAP_B
                    ) -> ray.data.Dataset:
    """Poisson bootstrap of the mean event value — the resampling trick
    that made the bootstrap distributed-friendly (Chamandy et al. 2012,
    "Estimating uncertainty for massive data streams"): instead of
    resampling n rows WITH replacement (which needs global coordination),
    each row independently draws a Poisson(1) multiplicity per replicate.
    Here the draw is DETERMINISTIC — u01(splitmix64(event_id ⊕
    splitmix64(b+1))) inverted through a hardcoded integer-ppb Poisson
    CDF — so any cluster shape, retry or blocking produces bit-identical
    replicates AND the whole estimator is DuckDB-oracle-gated (one of
    the few exactly-checkable bootstrap implementations anywhere).

    One scan: each block folds all B replicates to (b, n_eff, sum_vc)
    partials — B rows per block — and ONE tiny keyed exchange finishes.
    The CI consumer reads the B replicate means; mean_c is the exact
    integer pair divided once (same IEEE division in the twin)."""
    from ..functions.grouped import sorted_aggregate
    from ..functions.sampling import hash_u01

    def partial(b: pa.Table) -> pa.Table:
        vc = _scaled_int(b["value"], 100.0).to_numpy()
        keys = b["event_id"]
        rows = {"b": [], "n_eff": [], "sum_vc": []}
        thresh = np.array(POISSON1_CDF_PPB, np.int64)
        for rep in range(n_boot):
            u_ppb = np.floor(hash_u01(keys, seed=rep + 1)
                             * 1_000_000_000).astype(np.int64)
            w = np.searchsorted(thresh, u_ppb, side="right")
            rows["b"].append(rep)
            rows["n_eff"].append(int(w.sum()))
            rows["sum_vc"].append(int((w * vc).sum()))
        return pa.table({"b": pa.array(rows["b"], pa.int64()),
                         "n_eff": pa.array(rows["n_eff"], pa.int64()),
                         "sum_vc": pa.array(rows["sum_vc"], pa.int64())})

    ev = _read(sf_dir, "events", ["event_id", "value"])
    agg = sorted_aggregate(
        ev.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["b"], [("n_eff", "sum"), ("sum_vc", "sum")],
        ["b", "n_eff", "sum_vc"], 1)

    def mean(t: pa.Table) -> pa.Table:
        n = t["n_eff"].to_numpy(zero_copy_only=False)
        s = t["sum_vc"].to_numpy(zero_copy_only=False)
        m = np.where(n > 0, 1.0 * s / np.maximum(n, 1), 0.0)
        return t.append_column("mean_c", pa.array(m, pa.float64()))

    return agg.map_batches(mean, batch_format="pyarrow",
                           zero_copy_batch=True)


APPORTION_TOTAL = 1_000_000


def apportion_budget(sf_dir: str, total: int = APPORTION_TOTAL
                     ) -> pa.Table:
    """Largest-remainder (Hamilton) apportionment — the pro-rata
    allocation every budgeting/sampling pipeline eventually needs:
    distribute an integer ``total`` across customer nations
    proportionally to their order counts so the shares are integers AND
    sum EXACTLY to ``total`` (naive floor quotas undershoot; naive
    rounding drifts). quota = n_g·T // N; the leftover goes +1 each to
    the groups with the largest remainders (n_g·T % N), ties broken by
    nation key — fully integer, fully deterministic.

    Plan: ONE grouped count (orders never shuffle — custkey→nation is a
    broadcast probe, counts fold map-side); the apportionment itself
    runs on the driver over the |nations|-row result."""
    from ..functions.grouped import sorted_aggregate
    from ..functions.joins import probe_sorted
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy()
    order = np.argsort(ck)
    lookup = ray.put((ck[order],
                      cust["c_nationkey"].to_numpy()
                      .astype(np.int64)[order]))

    class Fold:
        def __init__(self):
            self.ck, self.nat = ray.get(lookup)

        def __call__(self, b: pa.Table) -> pa.Table:
            k = pc.cast(b["o_custkey"], pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            nat = probe_sorted(self.ck, self.nat, k, missing=-1)
            t = pa.table({"nation": pa.array(nat, pa.int64()),
                          "n": pa.array(np.ones(len(nat), np.int64))})
            return t.group_by(["nation"], use_threads=False) \
                .aggregate([("n", "sum")]) \
                .rename_columns(["nation", "n"])

    from ..functions.broadcast import broadcast_map_batches
    counts = sorted_aggregate(
        broadcast_map_batches(
            _read(sf_dir, "orders", ["o_custkey"]), Fold,
            batch_format="pyarrow"),
        ["nation"], [("n", "sum")], ["nation", "n"], 1).to_pandas() \
        .sort_values("nation").reset_index(drop=True)

    n = counts["n"].to_numpy().astype(object)  # python ints (no overflow)
    N = int(sum(n))
    floor_q = np.array([int(x) * total // N for x in n], np.int64)
    rem = np.array([int(x) * total % N for x in n], np.int64)
    leftover = total - int(floor_q.sum())
    order2 = np.lexsort((counts["nation"].to_numpy(), -rem))
    bump = np.zeros(len(n), np.int64)
    bump[order2[:leftover]] = 1
    share = floor_q + bump
    assert int(share.sum()) == total
    return pa.table({
        "nation": pa.array(counts["nation"].astype("int64")),
        "n_orders": pa.array(counts["n"].astype("int64")),
        "share": pa.array(share)})


def mom_revenue(sf_dir: str) -> ray.data.Dataset:
    """Month-over-month revenue deltas — window-over-aggregate
    composition: per-month exact integer revenue (map-side partials,
    ONE tiny exchange), then LAG/delta/pct on the months table inside
    its single sorted block. pct is the one float, same IEEE division
    as the twin; the first month pins prev=0, delta=0, pct=0."""
    from ..functions.grouped import sorted_aggregate

    def partial(b: pa.Table) -> pa.Table:
        ym = pc.add(pc.multiply(pc.cast(pc.year(b["l_shipdate"]),
                                        pa.int64()),
                                pa.scalar(100, pa.int64())),
                    pc.cast(pc.month(b["l_shipdate"]), pa.int64()))
        rev = (_scaled_int(b["l_extendedprice"], 100.0).to_numpy()
               * (100 - _scaled_int(b["l_discount"], 100.0).to_numpy()))
        return pa.table({"ym": ym, "rev_c2": pa.array(rev, pa.int64())}) \
            .group_by(["ym"], use_threads=False) \
            .aggregate([("rev_c2", "sum")]) \
            .rename_columns(["ym", "rev_c2"])

    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_extendedprice", "l_discount"])
    months = sorted_aggregate(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["ym"], [("rev_c2", "sum")], ["ym", "rev_c2"], 1)

    def window(b: pa.Table) -> pa.Table:
        b = b.sort_by("ym")
        rev = b["rev_c2"].to_numpy(zero_copy_only=False)
        prev = np.concatenate([[0], rev[:-1]]).astype(np.int64)
        delta = np.where(prev > 0, rev - prev, 0).astype(np.int64)
        pct = np.where(prev > 0, 100.0 * delta / np.maximum(prev, 1),
                       0.0)
        return pa.table({"ym": b["ym"], "rev_c2": b["rev_c2"],
                         "prev_c2": pa.array(prev),
                         "delta_c2": pa.array(delta),
                         "pct": pa.array(pct, pa.float64())})

    return months.map_batches(window, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)


ZORDER_BITS = 16


def zorder_keys(sf_dir: str, bits: int = ZORDER_BITS) -> ray.data.Dataset:
    """Z-order (Morton) clustering keys over (custkey, order-day) — the
    lakehouse data-layout primitive (Delta/Iceberg OPTIMIZE ZORDER BY):
    interleaving the bits of two dimensions gives a 1-D sort key whose
    ranges are 2-D-local, so files sorted by it prune on EITHER
    predicate column. Emitted per order as exact integers (pure bit
    arithmetic — the SQL twin is the same shift/mask expression), ready
    to feed ``Dataset.sort("zkey")`` + partitioned write at deploy
    scale. Stateless map — no shuffle in the key computation itself."""
    def z(b: pa.Table) -> pa.Table:
        x = (pc.cast(b["o_custkey"], pa.int64())
             .to_numpy(zero_copy_only=False) % (1 << bits))
        day = (pc.cast(b["o_orderdate"], pa.int64())
               .to_numpy(zero_copy_only=False)
               // 86_400_000_000) % (1 << bits)
        zk = np.zeros(len(x), np.int64)
        for i in range(bits):
            zk |= ((x >> i) & 1) << (2 * i)
            zk |= ((day >> i) & 1) << (2 * i + 1)
        return pa.table({
            "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
            "zkey": pa.array(zk, pa.int64())})

    return _read(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(z, batch_format="pyarrow",
                     zero_copy_batch=True).sort("o_orderkey")


JOIN_EST_PAIRS = (
    ("lineitem.l_orderkey=orders.o_orderkey",
     "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("events.user_id=customer.c_custkey",
     "events", "user_id", "customer", "c_custkey"),
)


def join_cardinality_estimates(sf_dir: str) -> pa.Table:
    """Query-optimizer cardinality diagnostics: for each join pair, the
    textbook uniform-containment estimate |L|·|R| / max(ndv_L, ndv_R)
    next to the TRUE join size — the number every cost-based planner
    bets on, surfaced as data so skew that breaks the uniformity
    assumption is visible before a 100-TB join is scheduled.

    All exact integers: per-side grouped counts (map-side combined)
    give n and ndv; the true size is Σ_k cnt_L(k)·cnt_R(k), computed by
    attaching the right counts onto the left count table through the
    keyed co-group (key-distinct inputs — pair-table-sized, never the
    raw tables) and folding products per block."""
    from ..functions.grouped import grouped_count, sorted_aggregate
    from ..functions.joins import attach_column

    rows = []
    for name, lt, lk, rt, rk in JOIN_EST_PAIRS:
        lcnt = grouped_count(_read(sf_dir, lt, [lk]), [lk], "cl",
                             8).materialize()
        rcnt = grouped_count(_read(sf_dir, rt, [rk]), [rk], "cr",
                             8).materialize()

        def side_stats(ds, cname):
            t = ds.map_batches(
                lambda b, _c=cname: pa.table({
                    "n": pa.array([int(pc.sum(b[_c]).as_py() or 0)],
                                  pa.int64()),
                    "ndv": pa.array([b.num_rows], pa.int64())}),
                batch_format="pyarrow", zero_copy_batch=True).to_pandas()
            return int(t["n"].sum()), int(t["ndv"].sum())

        n_l, ndv_l = side_stats(lcnt, "cl")
        n_r, ndv_r = side_stats(rcnt, "cr")

        joined = attach_column(
            lcnt, rcnt, [(lk, pa.int64()), ("cl", pa.int64())],
            lk, rk, "cr", "cr", pa.int64(), 8)
        prods = joined.map_batches(
            lambda b: pa.table({"p": pa.array(
                [int((b["cl"].to_numpy(zero_copy_only=False)
                      * b["cr"].to_numpy(zero_copy_only=False)).sum())],
                pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True).to_pandas()
        actual = int(prods["p"].sum())
        est = n_l * n_r // max(ndv_l, ndv_r, 1)
        rows.append((name, n_l, n_r, ndv_l, ndv_r, est, actual))

    t = list(zip(*rows))
    return pa.table({
        "pair": pa.array(t[0], pa.string()),
        "n_left": pa.array(t[1], pa.int64()),
        "n_right": pa.array(t[2], pa.int64()),
        "ndv_left": pa.array(t[3], pa.int64()),
        "ndv_right": pa.array(t[4], pa.int64()),
        "est_rows": pa.array(t[5], pa.int64()),
        "actual_rows": pa.array(t[6], pa.int64())})


def seasonal_decompose_daily(sf_dir: str) -> ray.data.Dataset:
    """Classical seasonal decomposition of the daily purchase-revenue
    series — centered 7-day moving trend and day-of-week detrended
    component, all in EXACT integers (the MA is kept ×7 instead of
    divided: trend7x = Σ window, detrend7x = 7·rev − trend7x — floor
    division would lose exactness, multiplication never does).

    Edge days without a full window pin (trend, detrend) = 0 with a
    validity flag — the engine's null-free degenerate convention. Day
    gaps are densified with a zero-filled spine (calendar days are
    bounded no matter the corpus size, so the dense series legitimately
    lives in ONE sorted block; the corpus-sized work is only the daily
    grouped sum). dow = (epoch_day + 4) % 7 — pure arithmetic shared
    with the twin, 0 = Sunday."""
    from ..functions.grouped import sorted_aggregate

    def partial(b: pa.Table) -> pa.Table:
        m = pc.equal(b["event_type"], "purchase")
        t = b.filter(m)
        day = pc.divide(pc.cast(t["ts"], pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"day": day,
                         "rev_c": _scaled_int(t["value"], 100.0)}) \
            .group_by(["day"], use_threads=False) \
            .aggregate([("rev_c", "sum")]) \
            .rename_columns(["day", "rev_c"])

    daily = sorted_aggregate(
        _read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True),
        ["day"], [("rev_c", "sum")], ["day", "rev_c"], 1)

    def decompose(b: pa.Table) -> pa.Table:
        schema = pa.schema([("day", pa.int64()), ("dow", pa.int64()),
                            ("rev_c", pa.int64()),
                            ("trend7x", pa.int64()),
                            ("detrend7x", pa.int64()),
                            ("valid", pa.int64())])
        if b.num_rows == 0:
            return schema.empty_table()
        b = b.sort_by("day")
        days = b["day"].to_numpy(zero_copy_only=False)
        revs = b["rev_c"].to_numpy(zero_copy_only=False)
        lo, hi = int(days[0]), int(days[-1])
        dense = np.zeros(hi - lo + 1, np.int64)
        dense[days - lo] = revs
        n = len(dense)
        cs = np.concatenate([[0], np.cumsum(dense)])
        idx = np.arange(n)
        lo_i = np.maximum(idx - 3, 0)
        hi_i = np.minimum(idx + 3, n - 1)
        trend = (cs[hi_i + 1] - cs[lo_i]).astype(np.int64)
        valid = ((idx >= 3) & (idx <= n - 4)).astype(np.int64)
        trend = trend * valid
        detrend = (7 * dense - trend) * valid
        day_col = lo + idx
        return pa.table({
            "day": pa.array(day_col, pa.int64()),
            "dow": pa.array((day_col + 4) % 7, pa.int64()),
            "rev_c": pa.array(dense, pa.int64()),
            "trend7x": pa.array(trend, pa.int64()),
            "detrend7x": pa.array(detrend, pa.int64()),
            "valid": pa.array(valid, pa.int64())}, schema=schema)

    return daily.map_batches(decompose, batch_format="pyarrow",
                             batch_size=None, zero_copy_batch=True)


def seasonal_anomaly_days(sf_dir: str) -> ray.data.Dataset:
    """Seasonal-residual anomaly detection — the composition a real
    monitoring pipeline runs: days whose detrended revenue (the ×7
    centered-MA residual from :func:`seasonal_decompose_daily`) sits
    more than 3 robust deviations from the median residual. Median and
    MAD use the LOW-median convention (DuckDB ``quantile_disc(0.5)`` =
    lower middle, the engine's standard for exact integer medians), so
    the flag is a pure integer comparison:
    ``|detrend − med| > 3·MAD`` — no float anywhere."""
    daily = seasonal_decompose_daily(sf_dir)

    def flag(b: pa.Table) -> pa.Table:
        schema = pa.schema([("day", pa.int64()),
                            ("detrend7x", pa.int64()),
                            ("med", pa.int64()), ("mad", pa.int64()),
                            ("is_anomaly", pa.int64())])
        if b.num_rows == 0:
            return schema.empty_table()
        valid = b.filter(pc.equal(b["valid"], 1))
        det = valid["detrend7x"].to_numpy(zero_copy_only=False)
        if len(det) == 0:
            return schema.empty_table()
        srt = np.sort(det)
        med = int(srt[(len(srt) - 1) // 2])
        dev = np.sort(np.abs(det - med))
        mad = int(dev[(len(dev) - 1) // 2])
        flags = (np.abs(det - med) > 3 * mad).astype(np.int64)
        return pa.table({
            "day": valid["day"],
            "detrend7x": valid["detrend7x"],
            "med": pa.array(np.full(len(det), med, np.int64)),
            "mad": pa.array(np.full(len(det), mad, np.int64)),
            "is_anomaly": pa.array(flags)}, schema=schema)

    return daily.map_batches(flag, batch_format="pyarrow",
                             batch_size=None, zero_copy_batch=True)


RFM_TILES = 4


def rfm_segments(sf_dir: str, tiles: int = RFM_TILES
                 ) -> ray.data.Dataset:
    """RFM customer segmentation — the classic marketing/curation
    scoring: per customer (recency = last order day, frequency = order
    count, monetary = total cents), each dimension NTILE(4)-scored over
    the WHOLE customer population, segment code = r·100 + f·10 + m.

    Unlike :func:`ntile_customers` (per-segment groups fit in sorted
    blocks) the three ranks here are GLOBAL, so each dimension uses the
    distributed rank path: ONE sort on a packed (value, custkey) int64
    key + ``zip_with_index(order_by=...)`` (block order by range, rank
    = global sort position), then SQL-NTILE's exact fill rule in closed
    form from (rank, n). Tiles are ascending in the metric on all three
    dimensions (tie-break custkey), matching the twin's
    ``NTILE(4) OVER (ORDER BY dim, custkey)`` exactly. Scores attach
    back by custkey co-group; orders is scanned once."""
    from ..functions.grouped import sorted_aggregate
    from ..functions.joins import attach_column, zip_with_index

    def partial(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b["o_orderdate"], pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({
            "c": pc.cast(b["o_custkey"], pa.int64()),
            "recency": day,
            "frequency": pa.array(np.ones(b.num_rows, np.int64)),
            "monetary": _scaled_int(b["o_totalprice"], 100.0)}) \
            .group_by(["c"], use_threads=False) \
            .aggregate([("recency", "max"), ("frequency", "sum"),
                        ("monetary", "sum")]) \
            .rename_columns(["c", "recency", "frequency", "monetary"])

    per_cust = sorted_aggregate(
        _read(sf_dir, "orders",
              ["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True),
        ["c"], [("recency", "max"), ("frequency", "sum"),
                ("monetary", "sum")],
        ["c", "recency", "frequency", "monetary"], 8).materialize()
    n = per_cust.count()
    t_ = int(tiles)
    q, r = n // t_, n % t_
    cut = r * (q + 1)

    def tile_of(rank: np.ndarray) -> np.ndarray:
        return np.where(rank < cut, rank // max(q + 1, 1),
                        r + (rank - cut) // max(q, 1)) + 1

    tiled = per_cust
    for dim in ("recency", "frequency", "monetary"):
        def pack(b: pa.Table, _d=dim) -> pa.Table:
            v = b[_d].to_numpy(zero_copy_only=False)
            c = b["c"].to_numpy(zero_copy_only=False)
            if (v < 0).any() or (v >= 1 << 30).any() \
                    or (c >= 1 << 33).any():
                raise OverflowError("rfm pack: rescale dimensions")
            return b.append_column("__k", pa.array((v << 33) | c,
                                                   pa.int64()))

        ranked = zip_with_index(
            per_cust.map_batches(pack, batch_format="pyarrow",
                                 zero_copy_batch=True).sort("__k"),
            id_col="__rank", order_by="__k")

        def score(b: pa.Table, _d=dim) -> pa.Table:
            rank = b["__rank"].to_numpy(zero_copy_only=False)
            return pa.table({
                "c": pc.cast(b["c"], pa.int64()),
                f"{_d}_tile": pa.array(tile_of(rank), pa.int64())})

        scores = ranked.map_batches(score, batch_format="pyarrow")
        carried = [("c", pa.int64()), ("recency", pa.int64()),
                   ("frequency", pa.int64()), ("monetary", pa.int64())]
        for prev in ("recency", "frequency", "monetary"):
            if f"{prev}_tile" in tiled.schema().names:
                carried.append((f"{prev}_tile", pa.int64()))
        tiled = attach_column(
            tiled, scores, carried, "c", "c", f"{dim}_tile",
            f"{dim}_tile", pa.int64(), 8)

    def seg(b: pa.Table) -> pa.Table:
        rt = b["recency_tile"].to_numpy(zero_copy_only=False)
        ft = b["frequency_tile"].to_numpy(zero_copy_only=False)
        mt = b["monetary_tile"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": b["c"],
            "recency_tile": b["recency_tile"],
            "frequency_tile": b["frequency_tile"],
            "monetary_tile": b["monetary_tile"],
            "segment": pa.array(rt * 100 + ft * 10 + mt, pa.int64())})

    return tiled.map_batches(seg, batch_format="pyarrow").sort(
        "c_custkey")


def funnel_latency(sf_dir: str) -> ray.data.Dataset:
    """Funnel-step latency: per user, microseconds from the FIRST 'view'
    to the FIRST 'purchase' at-or-after it — the time-to-convert metric
    behind every activation dashboard. ONE user-key sort; inside a block
    each group reduces with masked ``minimum.reduceat`` (views → first
    view, purchases gated by it → first conversion), emitting one exact
    integer row per converting user."""
    from ..functions.grouped import group_ids, sorted_group_apply

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type",
                                  "ts"])
    out_schema = pa.schema([("user_id", pa.int64()),
                            ("delta_us", pa.int64())])
    BIG = np.int64(2**62)

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["user_id"])
        ts = b["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        kind = b["event_type"].combine_chunks()
        is_view = pc.equal(kind, "view").to_numpy(zero_copy_only=False)
        is_buy = pc.equal(kind, "purchase").to_numpy(
            zero_copy_only=False)
        vt = np.where(is_view, ts, BIG)
        first_view = np.minimum.reduceat(vt, starts)
        gate = first_view[gid]
        bt = np.where(is_buy & (ts >= gate), ts, BIG)
        first_buy = np.minimum.reduceat(bt, starts)
        users = b["user_id"].to_numpy(zero_copy_only=False)[starts]
        ok = (first_view < BIG) & (first_buy < BIG)
        return pa.table({
            "user_id": pa.array(users[ok].astype(np.int64)),
            "delta_us": pa.array((first_buy - first_view)[ok])},
            schema=out_schema)

    return sorted_group_apply(ev, ["user_id"], block, 8).sort("user_id")


PSI_BINS = 10


def psi_drift(sf_dir: str, bins: int = PSI_BINS) -> pa.Table:
    """Population stability index between the 'view' and 'purchase'
    value distributions — the standard production drift metric (banking
    scorecard lineage; PSI > 0.25 = investigate). Bin edges are exact
    integer equi-width cuts over the global cents range (driver scalars
    from per-block min/max partials); per-(bin, side) counts fold
    map-side; PSI itself is the only float, computed from
    Laplace-smoothed exact integer counts with the same ln/IEEE
    expression as the twin. Output: one row per bin
    (bin, n_view, n_purchase, psi)."""
    from ..functions.grouped import sorted_aggregate

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def mm(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["event_type"],
                     value_set=pa.array(["view", "purchase"]))
        t = b.filter(m)
        vc = _scaled_int(t["value"], 100.0)
        s = pc.min_max(vc)
        lo, hi = s["min"].as_py(), s["max"].as_py()
        return pa.table({
            "mn": pa.array([lo if lo is not None else 2**62],
                           pa.int64()),
            "mx": pa.array([hi if hi is not None else -2**62],
                           pa.int64())})

    mmt = ev.map_batches(mm, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    mn, mx = int(mmt["mn"].min()), int(mmt["mx"].max())
    span = max(mx - mn + 1, 1)

    def counts(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["event_type"],
                     value_set=pa.array(["view", "purchase"]))
        t = b.filter(m)
        vc = _scaled_int(t["value"], 100.0).to_numpy()
        bin_ = np.minimum((vc - mn) * bins // span, bins - 1)
        is_v = pc.equal(t["event_type"], "view").to_numpy(
            zero_copy_only=False).astype(np.int64)
        tt = pa.table({"bin": pa.array(bin_, pa.int64()),
                       "n_view": pa.array(is_v),
                       "n_purchase": pa.array(1 - is_v)})
        return tt.group_by(["bin"], use_threads=False).aggregate(
            [("n_view", "sum"), ("n_purchase", "sum")]) \
            .rename_columns(["bin", "n_view", "n_purchase"])

    agg = sorted_aggregate(
        ev.map_batches(counts, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["bin"], [("n_view", "sum"), ("n_purchase", "sum")],
        ["bin", "n_view", "n_purchase"], 1).to_pandas() \
        .sort_values("bin").reset_index(drop=True)

    full = np.zeros((bins, 2), np.int64)
    full[agg["bin"].to_numpy(), 0] = agg["n_view"].to_numpy()
    full[agg["bin"].to_numpy(), 1] = agg["n_purchase"].to_numpy()
    na, nb = full[:, 0] + 1, full[:, 1] + 1  # Laplace smoothing
    pa_ = na / na.sum()
    pb_ = nb / nb.sum()
    psi = float(((pa_ - pb_) * np.log(pa_ / pb_)).sum())
    return pa.table({
        "bin": pa.array(np.arange(bins, dtype=np.int64)),
        "n_view": pa.array(full[:, 0]),
        "n_purchase": pa.array(full[:, 1]),
        "psi": pa.array(np.full(bins, psi), pa.float64())})


def churn_labels(sf_dir: str) -> ray.data.Dataset:
    """Training-label generation for churn modeling: one row per
    (user, active-week) with ``will_return`` = user is also active in
    week+1 — the standard temporal label join an ML data pipeline must
    get right WITHOUT leakage (the label looks strictly forward).

    Shape: distinct (user, week) partials (one corpus exchange), then
    the forward-shift join is the engine's indicator-union trick — the
    same table re-emitted at week−1 as a 'next' marker, ONE grouped sum,
    label = marker presence. No self-join, null-free."""
    from ..functions.grouped import grouped_count, sorted_aggregate

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def weeks(b: pa.Table) -> pa.Table:
        wk = pc.divide(pc.divide(pc.cast(b["ts"], pa.int64()),
                                 pa.scalar(86_400_000_000, pa.int64())),
                       pa.scalar(7, pa.int64()))
        return pa.table({"user_id": pc.cast(b["user_id"], pa.int64()),
                         "week": wk})

    uw = grouped_count(
        ev.map_batches(weeks, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id", "week"], "__n", 8).materialize()

    def base(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "user_id": b["user_id"], "week": b["week"],
            "is_base": pa.array(np.ones(n, np.int64)),
            "nxt": pa.array(np.zeros(n, np.int64))})

    def shifted(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "user_id": b["user_id"],
            "week": pc.subtract(b["week"], pa.scalar(1, pa.int64())),
            "is_base": pa.array(np.zeros(n, np.int64)),
            "nxt": pa.array(np.ones(n, np.int64))})

    u = uw.map_batches(base, batch_format="pyarrow") \
        .union(uw.map_batches(shifted, batch_format="pyarrow"))
    agg = sorted_aggregate(
        u, ["user_id", "week"], [("is_base", "sum"), ("nxt", "sum")],
        ["user_id", "week", "is_base", "nxt"], 8)

    def label(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["is_base"], 1))
        nxt = t["nxt"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"], "week": t["week"],
            "will_return": pa.array(np.minimum(nxt, 1))})

    return agg.map_batches(label, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .sort(["user_id", "week"])


def peak_concurrency(sf_dir: str, gap_s: int = SESSION_GAP_S
                     ) -> pa.Table:
    """Peak concurrent sessions — the capacity-planning sweep: sessions
    (gap-windowed per user, the engine's standard 1800 s rule) become
    ±1 boundary deltas, per-timestamp nets collapse with ONE keyed
    exchange (tie order vanishes — net per instant first, prefix
    after), and the global running-maximum is the classic associative
    two-level scan: each block (sorted in-block, blocks range-ordered)
    reports (Σnet, max-prefix); the driver folds |blocks| summaries.
    Ends are exclusive at en+1 µs. Output: (n_sessions, peak)."""
    from ..functions.grouped import group_ids, sorted_aggregate, \
        sorted_group_apply

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    ses_schema = pa.schema([("st", pa.int64()), ("en", pa.int64())])
    gap_us = gap_s * 10**6

    def sessions(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return ses_schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        ts = b["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, gid))
        g, t = gid[order], ts[order]
        brk = np.concatenate(
            [[True], (g[1:] != g[:-1]) | (t[1:] - t[:-1] > gap_us)])
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(t)) - 1
        return pa.table({"st": pa.array(t[starts], pa.int64()),
                         "en": pa.array(t[ends], pa.int64())},
                        schema=ses_schema)

    ses = sorted_group_apply(ev, ["user_id"], sessions, 8).materialize()
    n_sessions = ses.count()

    def deltas(b: pa.Table) -> pa.Table:
        st = b["st"].to_numpy(zero_copy_only=False)
        en = b["en"].to_numpy(zero_copy_only=False)
        t = np.concatenate([st, en + 1])
        dv = np.concatenate([np.ones(len(st), np.int64),
                             -np.ones(len(en), np.int64)])
        return pa.table({"t": pa.array(t), "net": pa.array(dv)}) \
            .group_by(["t"], use_threads=False) \
            .aggregate([("net", "sum")]).rename_columns(["t", "net"])

    nets = sorted_aggregate(
        ses.map_batches(deltas, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["t"], [("net", "sum")], ["t", "net"], 8)

    def block_scan(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("t0", pa.int64()), ("s", pa.int64()),
                              ("mp", pa.int64())]).empty_table()
        b = b.sort_by("t")
        net = b["net"].to_numpy(zero_copy_only=False)
        cs = np.cumsum(net)
        return pa.table({"t0": pa.array([int(b["t"][0].as_py())],
                                        pa.int64()),
                         "s": pa.array([int(cs[-1])], pa.int64()),
                         "mp": pa.array([int(cs.max())], pa.int64())})

    summ = nets.map_batches(block_scan, batch_format="pyarrow",
                            batch_size=None,
                            zero_copy_batch=True).to_pandas() \
        .sort_values("t0")
    running = 0
    peak = 0
    for _, r in summ.iterrows():
        peak = max(peak, running + int(r["mp"]))
        running += int(r["s"])
    return pa.table({"n_sessions": pa.array([n_sessions], pa.int64()),
                     "peak": pa.array([peak], pa.int64())})


def gaps_islands_orderkeys(sf_dir: str) -> ray.data.Dataset:
    """Gaps-and-islands over the 'F'-status orderkey sequence — the classic
    SQL-idiom operator (key − rank() is constant within a consecutive run).

    Distributed plan: filter + project at the read, ONE global sort via
    :func:`functions.joins.zip_with_index` (order_by gives the
    deterministic global rank without moving block data to the driver),
    island id = key − rank computed per block, then a grouped (min, max,
    count) — the island table scales with the data, so it is aggregated
    with the same sorted-aggregate machinery as every other grouped op,
    never driver-folded. Output (island_start, island_end, island_len)
    sorted by island_start."""
    from ..functions.grouped import sorted_aggregate
    from ..functions.joins import zip_with_index

    o = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])

    def keys(b: pa.Table) -> pa.Table:
        m = pc.equal(b["o_orderstatus"], "F")
        return pa.table({"k": pc.filter(b["o_orderkey"], m)})

    ks = o.map_batches(keys, batch_format="pyarrow",
                       zero_copy_batch=True).sort("k")
    ranked = zip_with_index(ks, id_col="rank", order_by="k")

    def isl(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        r = b["rank"].to_numpy(zero_copy_only=False)
        return pa.table({"isl": pa.array(k - r, pa.int64()),
                         "k_min": pa.array(k, pa.int64()),
                         "k_max": pa.array(k, pa.int64()),
                         "one": pa.array(np.ones(len(k), np.int64))})

    agg = sorted_aggregate(
        ranked.map_batches(isl, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["isl"], [("k_min", "min"), ("k_max", "max"), ("one", "sum")],
        ["isl", "island_start", "island_end", "island_len"], 4)

    def drop_isl(b: pa.Table) -> pa.Table:
        return b.drop_columns(["isl"])

    return agg.map_batches(drop_isl, batch_format="pyarrow",
                           zero_copy_batch=True).sort("island_start")


AUTOCORR_MAX_LAG = 7


def autocorr_daily(sf_dir: str) -> pa.Table:
    """Lag-1..7 autocorrelation of the zero-filled daily event count
    series, as exact integer (num, den) pairs: with N days, total S and
    centered z_t = N·c_t − S,

        r_k = num_k / den,  num_k = Σ_t z_t·z_{t+k},  den = Σ_t z_t²

    (both sides scaled by N² — the float never materializes, so the hash
    compare is exact). The distributed work is the grouped daily count;
    the correlation fold runs on the day spine, which is bounded by the
    time RANGE (10 years = 3.7k rows), not the data size."""
    from ..functions.grouped import grouped_count

    ev = _read(sf_dir, "events", columns=["ts"])
    day_us = 86400 * 10**6

    def to_days(b: pa.Table) -> pa.Table:
        return pa.table({"day": pc.divide(pc.cast(b["ts"], pa.int64()),
                                          pa.scalar(day_us, pa.int64()))})

    counts = grouped_count(
        ev.map_batches(to_days, batch_format="pyarrow",
                       zero_copy_batch=True), ["day"], "c", 4).to_pandas()
    days = counts["day"].to_numpy()
    lo, hi = int(days.min()), int(days.max())
    c = np.zeros(hi - lo + 1, dtype=object)  # python ints: no overflow
    c[days - lo] = [int(v) for v in counts["c"]]
    n = len(c)
    s = int(sum(c))
    z = n * c - s
    den = int((z * z).sum())
    lags = list(range(1, AUTOCORR_MAX_LAG + 1))
    nums = [int((z[:-k] * z[k:]).sum()) if k < n else 0 for k in lags]
    if max([den] + [abs(v) for v in nums]) >= 1 << 62:
        raise OverflowError("autocorr_daily: rescale counts")
    return pa.table({"lag": pa.array(lags, pa.int64()),
                     "num": pa.array(nums, pa.int64()),
                     "den": pa.array([den] * len(lags), pa.int64())})


SURVIVAL_CENSOR_DAYS = 2


def survival_table(sf_dir: str) -> pa.Table:
    """Kaplan-Meier risk table over user activity lifetimes (duration =
    last active day − first active day; users still active within
    SURVIVAL_CENSOR_DAYS of the corpus end are right-censored). Output per
    distinct duration: (duration, n_risk, n_death, n_censored) — all exact
    integers, the standard survival-analysis input (Kaplan & Meier 1958).

    Per-user extents aggregate distributed (user table can be billions of
    rows); the duration histogram is bounded by the day RANGE, so the
    reverse-cumulative n_risk folds on the driver."""
    from ..functions.grouped import sorted_aggregate

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    day_us = 86400 * 10**6

    def to_days(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(b["ts"], pa.int64()),
                      pa.scalar(day_us, pa.int64()))
        return pa.table({"user_id": b["user_id"], "f": d, "l": d})

    users = sorted_aggregate(
        ev.map_batches(to_days, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id"], [("f", "min"), ("l", "max")],
        ["user_id", "f", "l"], 4)

    # global max day: one int per block to the driver
    def mx(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("m", pa.int64())]).empty_table()
        return pa.table({"m": [pc.max(b["l"]).as_py()]})

    users = users.materialize()
    gmax = int(pc.max(pa.concat_tables(ray.get(
        users.map_batches(mx, batch_format="pyarrow")
        .to_arrow_refs()))["m"]).as_py())

    def to_hist(b: pa.Table) -> pa.Table:
        f = b["f"].to_numpy(zero_copy_only=False)
        ll = b["l"].to_numpy(zero_copy_only=False)
        cens = (ll >= gmax - SURVIVAL_CENSOR_DAYS).astype(np.int64)
        return pa.table({"duration": pa.array(ll - f, pa.int64()),
                         "nd": pa.array(1 - cens), "nc": pa.array(cens)})

    hist = sorted_aggregate(
        users.map_batches(to_hist, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["duration"], [("nd", "sum"), ("nc", "sum")],
        ["duration", "nd", "nc"], 1).to_pandas().sort_values("duration")

    tot = (hist["nd"] + hist["nc"]).to_numpy()
    n_risk = tot[::-1].cumsum()[::-1]
    return pa.table({
        "duration": pa.array(hist["duration"].to_numpy(), pa.int64()),
        "n_risk": pa.array(n_risk, pa.int64()),
        "n_death": pa.array(hist["nd"].to_numpy(), pa.int64()),
        "n_censored": pa.array(hist["nc"].to_numpy(), pa.int64())})
