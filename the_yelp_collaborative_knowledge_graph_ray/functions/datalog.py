"""Distributed TRANSITIVE CLOSURE by path doubling — the datalog /
RDFS-reasoning primitive (`p+`, `subClassOf*`, org-chart roll-ups):

    R₁ = E;   R₂ₖ = Rₖ ∪ (Rₖ ∘ Rₖ)

Each round is ONE m:n co-group join (`functions/bgp.cogroup_join`, the
same union-tag + single-sort kernel the BGP matcher uses) plus ONE
distinct, so a relation of diameter d closes in ⌈log₂ d⌉ rounds — the
standard trade against semi-naive iteration (fewer, fatter rounds; right
for BSP engines where per-round scheduling dominates).

Scale envelope (documented assumption): meant for RELATION graphs whose
closure itself is storable — type lattices, category hierarchies,
management chains — not for closing a social graph (whose closure is
quadratic regardless of engine). The hot-key guard inside cogroup_join
raises before a pathological hub silently OOMs a block.

Reference parity: the reference walks its Schema.org lattice with a
driver-side networkx DFS (`Code/create_schema_nt_files.py:14-34`); this
is the same closure computed distributed, so it also serves hierarchies
too big to fold on one driver.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .bgp import cogroup_join
from .pagerank import _distinct


def transitive_closure(edges: ray.data.Dataset, src: str = "src",
                       dst: str = "dst", max_rounds: int = 20,
                       num_partitions: int = 4) -> ray.data.Dataset:
    """All (a, b) with a path a→…→b in string-column edge list ``edges``
    (the edges themselves included). Fixed point detected by row count —
    closure rows only ever grow. ``max_rounds`` bounds diameter at
    2^max_rounds; raises if the fixed point is not reached."""
    def half(mid_col: str, keep: str, keep_as: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({"mid": pc.cast(b[mid_col], pa.string()),
                             keep_as: pc.cast(b[keep], pa.string())})
        return f

    closure = _distinct(edges, [src, dst], num_partitions).materialize()
    n = closure.count()
    for _ in range(max_rounds):
        left = closure.map_batches(half(dst, src, src),
                                   batch_format="pyarrow")
        right = closure.map_batches(half(src, dst, dst),
                                    batch_format="pyarrow")
        two_hop = cogroup_join(left, right, ["mid"], ["mid", src],
                               ["mid", dst],
                               num_partitions=num_partitions) \
            .map_batches(lambda b: b.select([src, dst]),
                         batch_format="pyarrow", zero_copy_batch=True)
        closure = _distinct(closure.union(two_hop), [src, dst],
                            num_partitions).materialize()
        n2 = closure.count()
        if n2 == n:
            return closure
        n = n2
    raise RuntimeError(f"transitive_closure: no fixed point in "
                       f"{max_rounds} doubling rounds "
                       f"(diameter > 2^{max_rounds}?)")


def scc_labels(edges: ray.data.Dataset, src: str = "src",
               dst: str = "dst", max_rounds: int = 20,
               num_partitions: int = 4) -> ray.data.Dataset:
    """Strongly-connected-component labels of a string-keyed digraph:
    scc_id(n) = min(n, {m : n→…→m and m→…→n}). Composed entirely from
    existing distributed primitives — :func:`transitive_closure` (path
    doubling), ONE undirected-key grouped count to find mutual pairs
    (the closure is distinct, so a pair key carrying BOTH directions
    counts exactly 2), and ONE grouped min for the label. Inherits the
    closure's scale envelope: relation-sized graphs (tool/type/category
    lattices), not social graphs.

    Output (node, scc_id) — every edge endpoint appears; singleton SCCs
    label themselves.
    """
    from .grouped import grouped_count, sorted_aggregate
    from .pagerank import _distinct

    closure = transitive_closure(edges, src, dst, max_rounds,
                                 num_partitions)
    sep = "\x1f"

    def undirected(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(b[src], b[dst]))
        t = b.filter(keep)
        lo = pc.min_element_wise(t[src], t[dst])
        hi = pc.max_element_wise(t[src], t[dst])
        return pa.table({"k": pc.binary_join_element_wise(lo, hi, sep)})

    both = grouped_count(closure.map_batches(
        undirected, batch_format="pyarrow", zero_copy_batch=True),
        ["k"], "n", num_partitions)

    def to_pairs(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["n"], 2))  # both directions present
        parts = pc.split_pattern(t["k"].combine_chunks(), sep)
        lo, hi = pc.list_element(parts, 0), pc.list_element(parts, 1)
        return pa.table({"node": pa.concat_arrays([lo, hi]),
                         "m": pa.concat_arrays([hi, lo])})

    mutual = both.map_batches(to_pairs, batch_format="pyarrow")

    def endpoints(b: pa.Table) -> pa.Table:
        n = pa.concat_arrays([pc.cast(b[src], pa.string()).combine_chunks(),
                              pc.cast(b[dst], pa.string()).combine_chunks()])
        return pa.table({"node": pc.unique(n)})

    nodes = _distinct(edges.map_batches(endpoints, batch_format="pyarrow"),
                      ["node"], num_partitions)
    selfp = nodes.map_batches(
        lambda b: pa.table({"node": b["node"], "m": b["node"]}),
        batch_format="pyarrow")
    return sorted_aggregate(mutual.union(selfp), ["node"],
                            [("m", "min")], ["node", "scc_id"],
                            num_partitions)


def apsp_min_plus(edges: ray.data.Dataset, src: str = "src",
                  dst: str = "dst", max_rounds: int = 6,
                  num_partitions: int = 4) -> ray.data.Dataset:
    """All-pairs shortest path lengths (unit edge weights) by min-plus
    path doubling: d_{2k}(a,b) = min(d_k(a,b), min_mid d_k(a,mid) +
    d_k(mid,b)) — ⌈log₂ diameter⌉ co-group rounds, the distance-tracking
    sibling of :func:`transitive_closure`. Returns (src, dst, d) with
    the exact minimum hop count per ordered reachable pair (self-pairs
    excluded unless on a cycle). Fixed point detected on (row count,
    Σd) — counts only grow and distances only shrink, so the pair is
    stable iff converged. Distances ride the string co-group join as
    decimal strings (exact round-trip casts)."""
    from .bgp import cogroup_join
    from .grouped import sorted_aggregate

    def init(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({"src": pc.cast(b[src], pa.string()),
                         "dst": pc.cast(b[dst], pa.string()),
                         "d": pa.nulls(n, pa.int64()).fill_null(1)})

    def dmin(ds):
        return sorted_aggregate(ds, ["src", "dst"], [("d", "min")],
                                ["src", "dst", "d"], num_partitions)

    cur = dmin(edges.map_batches(init, batch_format="pyarrow"))
    cur = cur.materialize()

    def stats(ds):
        # streaming aggregates — the distance table never hits the driver
        return ds.count(), int(ds.sum("d") or 0)

    sig = stats(cur)
    for _ in range(max_rounds):
        left = cur.map_batches(
            lambda b: pa.table({"mid": b["dst"], "src": b["src"],
                                "d1": pc.cast(b["d"], pa.string())}),
            batch_format="pyarrow")
        right = cur.map_batches(
            lambda b: pa.table({"mid": b["src"], "dst": b["dst"],
                                "d2": pc.cast(b["d"], pa.string())}),
            batch_format="pyarrow")
        two = cogroup_join(left, right, ["mid"], ["mid", "src", "d1"],
                           ["mid", "dst", "d2"], num_partitions) \
            .map_batches(
                lambda b: pa.table({
                    "src": b["src"], "dst": b["dst"],
                    "d": pc.add(pc.cast(b["d1"], pa.int64()),
                                pc.cast(b["d2"], pa.int64()))}),
                batch_format="pyarrow")
        cur = dmin(cur.union(two)).materialize()
        sig2 = stats(cur)
        if sig2 == sig:
            return cur
        sig = sig2
    raise RuntimeError(f"apsp_min_plus: no fixed point in {max_rounds} "
                       f"doubling rounds (diameter > 2^{max_rounds}?)")
