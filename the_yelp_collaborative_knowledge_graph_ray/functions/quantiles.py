"""Exact distributed quantiles — histogram-narrowed rank selection.

Percentiles of a numeric column over a huge Dataset, EXACT (not a sketch),
without a global sort. A global ``Dataset.sort`` computes far more than rank
selection needs; the classic alternative is iterative range narrowing:

1. pass 1 — per-block (count, min, max), combined on the driver (tiny);
2. pass 2 — per-block fixed-width histogram over [min, max], summed on the
   driver; a cumulative sum locates the bin containing each target rank;
3. pass 3 — stream the column once more, keeping ONLY values inside the
   candidate bins (a ~1/n_bins fraction of the data per quantile) together
   with per-block counts of values below each bin; exact selection happens
   driver-side on that small remainder.

Three streaming passes over ONE column (column-pruned read), no shuffle, no
materialization beyond n_bins integers per block plus the narrowed values.
If a bin is still too large (adversarially concentrated data), the same
narrowing recurses inside the bin; uniform-ish data finishes in one round.

Rank semantics match DuckDB ``quantile_disc``: the value at 0-indexed rank
``ceil(n * q) - 1`` (clamped to >= 0) of the sorted column — verified
empirically against DuckDB across group sizes and q values (see
tests/test_curation_ops.py).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _col_np(b: pa.Table, col: str) -> np.ndarray:
    arr = b[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    v = arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    return v[~np.isnan(v)]


def _pass1(ds: ray.data.Dataset, col: str) -> tuple[int, float, float]:
    """Global (count, min, max) from per-block partials — ONE scan, shared
    by the disc and cont entry points."""
    def mm(b: pa.Table) -> pa.Table:
        v = _col_np(b, col)
        if len(v) == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "lo": pa.array([np.inf]),
                             "hi": pa.array([-np.inf])})
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "lo": pa.array([v.min()]),
                         "hi": pa.array([v.max()])})

    parts = ds.map_batches(mm, batch_format="pyarrow").take_all()
    n = int(sum(p["n"] for p in parts))
    if n == 0:
        return 0, np.inf, -np.inf
    return n, min(p["lo"] for p in parts), max(p["hi"] for p in parts)


def quantiles_exact(ds: ray.data.Dataset, col: str, qs: list[float],
                    n_bins: int = 4096, driver_budget: int = 4_000_000
                    ) -> pa.Table:
    """Exact ``quantile_disc``-style quantiles of ``ds[col]``.

    Returns a small Arrow table (q, value) sorted by q. ``driver_budget``
    bounds how many narrowed values may be pulled to the driver per round;
    exceeding it triggers another narrowing round instead of a big collect.
    """
    qs = sorted(qs)
    n, lo, hi = _pass1(ds, col)
    if n == 0:
        return pa.table({"q": pa.array(qs, pa.float64()),
                         "value": pa.array([None] * len(qs), pa.float64())})
    # DuckDB quantile_disc rank: ceil(n*q) - 1, clamped at 0 (probed
    # empirically across n/q — floor((n-1)*q) disagrees at e.g. q=0.95)
    ranks = [max(0, int(np.ceil(n * q)) - 1) for q in qs]
    values = _values_at_ranks(ds, col, ranks, lo, hi, n_bins, driver_budget)
    return pa.table({
        "q": pa.array(qs, pa.float64()),
        "value": pa.array([values[r] for r in ranks], pa.float64())})


def _values_at_ranks(ds: ray.data.Dataset, col: str, ranks: list[int],
                     lo: float, hi: float, n_bins: int = 4096,
                     driver_budget: int = 4_000_000) -> dict[int, float]:
    """Value of the 0-indexed ascending order statistic at each rank, via
    histogram narrowing (module docstring)."""
    # narrowing rounds: histogram -> locate rank bins -> collect or recurse
    # active[i] = (lo_i, hi_i, rank_within_range_i, base_count_below_lo_i)
    values: dict[int, float] = {}
    active = [(lo, hi, r) for r in ranks]
    for _round in range(8):
        if not active:
            break
        glo = min(a[0] for a in active)
        ghi = max(a[1] for a in active)
        if glo == ghi:
            for a in active:
                values[a[2]] = glo
            break
        edges = np.linspace(glo, ghi, n_bins + 1)
        edges[-1] = np.nextafter(ghi, np.inf)  # hi value lands in last bin

        def hist(b: pa.Table) -> pa.Table:
            v = _col_np(b, col)
            v = v[(v >= glo) & (v <= ghi)]
            h, _ = np.histogram(v, bins=edges)
            return pa.table({"h": pa.array([h.astype(np.int64)]),
                             "below": pa.array(
                                 [int((_col_np(b, col) < glo).sum())],
                                 pa.int64())})

        hp = ds.map_batches(hist, batch_format="pyarrow").take_all()
        h = np.sum([p["h"] for p in hp], axis=0)
        below_glo = int(sum(p["below"] for p in hp))
        cum = np.concatenate([[0], np.cumsum(h)])  # counts < edges[i] + glo..

        # locate each active rank's bin
        nxt: list[tuple[float, float, int]] = []
        bins_needed: dict[int, list[int]] = {}
        for a_lo, a_hi, r in active:
            ri = r - below_glo  # rank within [glo, ghi] segment
            b_i = int(np.searchsorted(cum, ri, side="right") - 1)
            b_i = min(max(b_i, 0), n_bins - 1)
            bins_needed.setdefault(b_i, []).append(r)
        small = {b_i: rs for b_i, rs in bins_needed.items()
                 if h[b_i] <= max(driver_budget // max(len(bins_needed), 1),
                                  65536)}
        big = {b_i: rs for b_i, rs in bins_needed.items() if b_i not in small}

        if small:
            sel = sorted(small)
            los = edges[sel]
            his = edges[np.array(sel) + 1]

            def collect(b: pa.Table) -> pa.Table:
                v = _col_np(b, col)
                keep = np.zeros(len(v), bool)
                for s_lo, s_hi in zip(los, his):
                    keep |= (v >= s_lo) & (v < s_hi)
                return pa.table({"v": pa.array(v[keep])})

            got = np.sort(np.array(
                [p["v"] for p in
                 ds.map_batches(collect, batch_format="pyarrow").take_all()],
                np.float64))
            for b_i in sel:
                base = below_glo + int(cum[b_i])
                # offset of this bin's values inside `got`
                in_bin_lo, in_bin_hi = edges[b_i], edges[b_i + 1]
                seg = got[(got >= in_bin_lo) & (got < in_bin_hi)]
                for r in small[b_i]:
                    values[r] = float(seg[r - base])

        for b_i, rs in big.items():
            n_lo = float(edges[b_i])
            n_hi = float(np.nextafter(edges[b_i + 1], -np.inf))
            if n_hi <= n_lo or np.nextafter(n_lo, np.inf) >= edges[b_i + 1]:
                # bin narrowed to a single representable double (massive
                # duplicate concentration): every value in it IS n_lo
                for r in rs:
                    values[r] = n_lo
                continue
            for r in rs:
                nxt.append((n_lo, n_hi, r))
        active = nxt
    else:
        raise RuntimeError("quantile narrowing did not converge in 8 rounds")

    return values


def grouped_quantiles(ds: ray.data.Dataset, key: str, col: str,
                      qs: list[float],
                      num_partitions: int | None = None) -> ray.data.Dataset:
    """Per-key ``quantile_disc``: ONE key sort colocates complete groups per
    block (functions/grouped.sorted_group_apply invariant); within a block a
    single pass of per-group sorted-rank picks computes every quantile.

    Output: (key, q, value) — one row per key per q, sorted by (key, q).
    Assumes one key's rows fit a block; for a pathological single hot key,
    run :func:`quantiles_exact` on that key's slice instead (documented
    partitioning assumption).
    """
    from .grouped import group_ids, sorted_group_apply
    qs = sorted(qs)

    def block_fn(b: pa.Table) -> pa.Table:
        key_t = b.schema.field(key).type
        out_schema = pa.schema([(key, key_t), ("q", pa.float64()),
                                ("value", pa.float64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, [key])
        v = _col(b, col)
        ends = np.append(starts[1:], b.num_rows)
        keys_out, q_out, v_out = [], [], []
        for s, e in zip(starts, ends):
            vv = np.sort(v[s:e])
            vv = vv[~np.isnan(vv)]
            for q in qs:
                keys_out.append(s)
                q_out.append(q)
                v_out.append(
                    float(vv[max(0, int(np.ceil(len(vv) * q)) - 1)])
                             if len(vv) else None)
        return pa.table({
            key: b[key].take(pa.array(keys_out, pa.int64())),
            "q": pa.array(q_out, pa.float64()),
            "value": pa.array(v_out, pa.float64())}, schema=out_schema)

    return sorted_group_apply(ds.select_columns([key, col]), [key],
                              block_fn, num_partitions)


def _col(b: pa.Table, col: str) -> np.ndarray:
    arr = b[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)


def quantiles_cont(ds: ray.data.Dataset, col: str,
                   qs: list[float]) -> pa.Table:
    """Interpolated (PERCENTILE_CONT) quantiles — exact vs an SQL twin that
    spells out the same formula.

    ``value(q) = v[rf] + frac · (v[rf+1] − v[rf])`` with
    ``rf = floor((n−1)·q)``, ``frac = (n−1)·q − rf`` over the ascending
    order statistics v[0..n−1]. Both order statistics come from the exact
    histogram-narrowed rank selector (:func:`_values_at_ranks`, sharing
    :func:`_pass1`'s single count/min/max scan); the interpolation itself
    runs driver-side over ≤ 2·|qs| floats with the identical IEEE
    expression the oracle SQL uses, so hash-gating holds without trusting
    any engine's internal quantile implementation."""
    n, lo, hi_v = _pass1(ds, col)
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    pos = []
    need: set[int] = set()
    for q in qs:
        x = (n - 1) * float(q)
        rf = min(int(np.floor(x)), n - 1)
        frac = x - rf
        hi = min(rf + 1, n - 1)
        pos.append((q, rf, hi, frac))
        need.update((rf, hi))
    by_rank = _values_at_ranks(ds, col, sorted(need), lo, hi_v)
    vals = [by_rank[rf] + frac * (by_rank[hi] - by_rank[rf])
            for _, rf, hi, frac in pos]
    return pa.table({"q": pa.array([float(q) for q in qs], pa.float64()),
                     "value": pa.array(vals, pa.float64())})
