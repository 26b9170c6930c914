"""Distributed triangle counting over an oriented edge Dataset.

Graph-analytics companion to :mod:`functions.pagerank` /
:mod:`functions.components`: counts closed triples (a–b, b–c, a–c) in an
undirected graph given as ordered edges ``u < v``. The classic two-join
formulation — wedges from edges⋈edges, closed against the edge list —
each join a hash shuffle, the count a streaming reduce; nothing ever
materializes on the driver.

Orientation note: with id-orientation (u < v) every triangle appears
exactly once as (a < b < c), but a low-id hub fans out O(deg²) wedges. The
standard scale upgrade is DEGREE orientation (orient each edge toward the
higher-degree endpoint, ties by id), which bounds wedge fan-out by the
graph's arboricity; that is one extra degree join away and left out here
because the co-mention graphs this serves are vocabulary-bounded
(≤ |vocab|² edges).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .grouped import _pair_index_arrays, group_ids, sorted_group_apply
from .pagerank import _distinct


def within_group_pairs(ds: ray.data.Dataset, key: str, val: str,
                       num_partitions: int = 8,
                       distinct: bool = True) -> ray.data.Dataset:
    """Distinct unordered co-occurrence pairs (u < v) of string ``val``
    values sharing a ``key`` — e.g. mentions co-occurring in a turn. ONE
    key-sort colocates complete groups; pair expansion is the vectorized
    index arithmetic of ``_pair_index_arrays`` over per-block string codes
    (``np.unique`` order == lexicographic, so code order == string order);
    a global distinct collapses repeats across groups.

    ``distinct=False`` returns the raw per-group pair stream (one row per
    co-occurring group) for counted consumers (e.g. pair lift), skipping
    the distinct exchange."""
    def block(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("u", pa.string()), ("v", pa.string())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, [key])
        vals = b[val].to_numpy(zero_copy_only=False)
        dic, inv = np.unique(vals, return_inverse=True)
        sel, first, second = _pair_index_arrays(gid, inv.astype(np.int64),
                                                None, None, key)
        if len(first) == 0:
            return out_schema.empty_table()
        return pa.table({"u": pa.array(dic[inv[sel[first]]], pa.string()),
                         "v": pa.array(dic[inv[sel[second]]], pa.string())},
                        schema=out_schema)

    pairs = sorted_group_apply(ds, [key], block)
    if not distinct:
        return pairs
    return _distinct(pairs, ["u", "v"], num_partitions)


def triangle_count(edges: ray.data.Dataset,
                   num_partitions: int = 8) -> pa.Table:
    """edges: Dataset with string columns (u, v), distinct, u < v.
    Returns a one-row Arrow table (n_triangles,)."""
    wedges = edges.join(edges, join_type="inner",
                        num_partitions=num_partitions,
                        on=("v",), right_on=("u",),
                        left_suffix="", right_suffix="_r") \
        .map_batches(lambda b: pa.table({"a": b["u"], "c": b["v_r"]}),
                     batch_format="pyarrow")
    closed = wedges.join(edges, join_type="inner",
                         num_partitions=num_partitions,
                         on=("a", "c"), right_on=("u", "v"),
                         left_suffix="", right_suffix="_r")
    return pa.table({"n_triangles": pa.array([closed.count()], pa.int64())})


def triangles_per_node(edges: ray.data.Dataset,
                       num_partitions: int = 8) -> ray.data.Dataset:
    """Per-node triangle participation + wedge capacity — the local
    clustering coefficient as an EXACT integer pair (n_triangles,
    n_wedges = d(d−1)/2); the division is presentation-time.

    Same two-join shape as :func:`triangle_count` but wedges keep their
    CENTER: a wedge centered at x certifies one triangle containing x
    when its endpoints close, and each triangle is certified exactly once
    per center, so the per-center grouped count IS the per-node triangle
    count (no ÷3). Degrees come from the mirrored edge list with one
    grouped count; the two tiny per-node tables reconcile in ONE
    union-tag grouped sum."""
    import pyarrow.compute as pc

    from .grouped import grouped_count, sorted_aggregate

    def mirror(b: pa.Table) -> pa.Table:
        return pa.table({
            "x": pa.concat_arrays([b["u"].combine_chunks(),
                                   b["v"].combine_chunks()]),
            "y": pa.concat_arrays([b["v"].combine_chunks(),
                                   b["u"].combine_chunks()])})

    # edges feed three consumers and und two — sever lineage once (the
    # edge list is vocabulary-bounded by contract, same as triangle_count)
    # or the whole upstream pair-extraction re-executes per consumer.
    # Joins go through the engine's cogroup_join (NOT Dataset.join, which
    # crashes on the empty partitions a sparse graph produces — the same
    # failure functions/bfs.py documents).
    from .bgp import cogroup_join
    edges = edges.materialize()
    und = edges.map_batches(mirror, batch_format="pyarrow").materialize()
    und2 = und.map_batches(
        lambda b: pa.table({"x": b["x"], "y2": b["y"]}),
        batch_format="pyarrow")
    wedges = cogroup_join(und, und2, ["x"], ["x", "y"], ["x", "y2"],
                          num_partitions) \
        .map_batches(lambda b: pa.table(
            {"x": b["x"], "a": b["y"], "c": b["y2"]}).filter(
                pc.less(b["y"], b["y2"])),
            batch_format="pyarrow")
    ekeys = edges.map_batches(
        lambda b: pa.table({"a": b["u"], "c": b["v"]}),
        batch_format="pyarrow")
    closed = cogroup_join(wedges, ekeys, ["a", "c"], ["a", "c", "x"],
                          ["a", "c"], num_partitions)
    tri = grouped_count(
        closed.map_batches(lambda b: b.select(["x"]),
                           batch_format="pyarrow"),
        ["x"], "n_tri", num_partitions)
    deg = grouped_count(und.map_batches(
        lambda b: b.select(["x"]), batch_format="pyarrow"),
        ["x"], "d", num_partitions)

    def tag_tri(b: pa.Table) -> pa.Table:
        z = pa.nulls(b.num_rows, pa.int64()).fill_null(0)
        return pa.table({"node": b["x"], "n_triangles": b["n_tri"],
                         "n_wedges": z})

    def tag_deg(b: pa.Table) -> pa.Table:
        d = b["d"].combine_chunks().to_numpy(zero_copy_only=False)
        z = pa.nulls(b.num_rows, pa.int64()).fill_null(0)
        return pa.table({"node": b["x"], "n_triangles": z,
                         "n_wedges": pa.array(d * (d - 1) // 2, pa.int64())})

    u = tri.map_batches(tag_tri, batch_format="pyarrow").union(
        deg.map_batches(tag_deg, batch_format="pyarrow"))
    return sorted_aggregate(u, ["node"],
                            [("n_triangles", "sum"), ("n_wedges", "sum")],
                            ["node", "n_triangles", "n_wedges"],
                            num_partitions)


def edge_support(edges: ray.data.Dataset,
                 num_partitions: int = 8) -> ray.data.Dataset:
    """Per-edge triangle support over an oriented (u < v) distinct string
    edge list: returns (u, v, sup) for every edge in >=1 triangle.

    Each triangle a<b<c is certified exactly once through its oriented
    wedge (a,b)+(b,c) closed by (a,c) — the same two-co-group shape as
    :func:`triangle_count` (cogroup_join, not Dataset.join, for the
    empty-partition reason documented in :func:`triangles_per_node`) —
    then votes for all three of its edges; one grouped count per edge."""
    from .bgp import cogroup_join
    from .grouped import grouped_count
    edges = edges.materialize()
    lft = edges.map_batches(
        lambda b: pa.table({"j": b["v"], "a": b["u"]}),
        batch_format="pyarrow")
    rgt = edges.map_batches(
        lambda b: pa.table({"j": b["u"], "c": b["v"]}),
        batch_format="pyarrow")
    wed = cogroup_join(lft, rgt, ["j"], ["j", "a"], ["j", "c"],
                       num_partitions).map_batches(
        lambda b: pa.table({"a": b["a"], "b": b["j"], "c": b["c"]}),
        batch_format="pyarrow")
    ek = edges.map_batches(
        lambda b: pa.table({"a": b["u"], "c": b["v"]}),
        batch_format="pyarrow")
    closed = cogroup_join(wed, ek, ["a", "c"], ["a", "c", "b"],
                          ["a", "c"], num_partitions)

    def votes(t: pa.Table) -> pa.Table:
        a, b, c = (t[x].combine_chunks() for x in ("a", "b", "c"))
        return pa.table({"u": pa.concat_arrays([a, b, a]),
                         "v": pa.concat_arrays([b, c, c])})

    return grouped_count(
        closed.map_batches(votes, batch_format="pyarrow"),
        ["u", "v"], "sup", num_partitions)


def ktruss_edges(edges: ray.data.Dataset, k: int = 4, rounds: int = 3,
                 num_partitions: int = 8) -> ray.data.Dataset:
    """Bounded k-truss peeling: ``rounds`` alternations of per-edge
    triangle support + threshold filter (sup >= k-2), returning the
    surviving (u, v) edges.

    A FIXED round count (not run-to-fixpoint) keeps the unrolled SQL twin
    finite; both engines pin the same count, so outputs agree even on
    graphs where peeling hasn't converged yet. Each round is two string
    co-groups + one grouped count — the truss never materializes node
    neighborhoods."""
    e = edges.materialize()
    for _ in range(rounds):
        if e.count() == 0:
            break
        sup = edge_support(e, num_partitions)
        e = sup.filter(expr=f"sup >= {k - 2}").map_batches(
            lambda b: b.select(["u", "v"]),
            batch_format="pyarrow").materialize()
    return e
