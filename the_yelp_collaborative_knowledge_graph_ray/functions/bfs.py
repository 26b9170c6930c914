"""Multi-source BFS shortest-path distances over an edge Dataset.

Companion to :mod:`functions.components` (same BSP conventions: materialized
edge table reused per round, per-round lineage severing) and
:mod:`functions.pagerank`. The reference's only traversal is a driver-side
networkx DFS over the tiny Schema.org lattice
(``Code/UtilityFunctions/schema_functions.py:124-132``); this is the
cluster-shaped generalization: unweighted shortest-path distance from a SEED
SET to every reachable node, over an edge list far too large for one
machine.

Frontier BSP, one co-group shuffle + one min-aggregate per round:

    dist_0(seeds) = 0
    round t: candidates = { (v, t) : (u, v) ∈ E, dist(u) = t-1 }
             dist <- min-merge(dist, candidates)
             frontier_t = nodes whose merged dist == t  (first reached now)

The per-round expansion is a SEMI-JOIN of the edge table against the
frontier on the source endpoint. ``Dataset.join`` is deliberately not used:
a frontier is intrinsically sparse relative to the partition count (often a
handful of nodes by the last rounds), which is exactly the
empty-left-partition case where ray 2.49's hash join crashes
(``functions/joins.py`` module docstring). Instead both sides union into
one sorted-block co-group (string keys, tolerant of empty partitions):
groups holding a frontier marker emit their edge rows' destinations.
The min-merge is the engine's sort-based aggregate with map-side combine,
so a hub reached from thousands of frontier neighbors crosses the shuffle
as one partial row per block. BFS invariant: a node's distance is final
the round it first appears, so early-exit when a round adds no new nodes
is exact.

Measured negative result (kept for the record): pagerank's int-id encode
(``joins.zip_with_index`` + two string-key ``attach_column`` passes) made
BFS SLOWER at sf0.1 (20.7 s → 35.0 s) — the encode joins are themselves
union-sorts of the full edge table, which costs more than six cheaper
int-key rounds save at this depth. The encode pays off when
rounds × per-round savings exceed two full-table sorts (pagerank's fixed
5 × hash-join rounds on a reused table), not for shallow frontier BFS.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .components import _sever
from .grouped import group_ids, sorted_aggregate, sorted_group_apply

_EXPAND_SCHEMA = pa.schema([("k", pa.string()), ("__f", pa.bool_()),
                            ("v", pa.string())])


def _expand_frontier(und: ray.data.Dataset, frontier: ray.data.Dataset,
                     depth: int, num_partitions: int) -> ray.data.Dataset:
    """(v, dist=depth) for every edge (u, v) whose u is in ``frontier`` —
    a string-key semi-join co-group (see module docstring)."""
    def from_edges(b: pa.Table) -> pa.Table:
        return pa.table({"k": b["u"],
                         "__f": pa.nulls(b.num_rows, pa.bool_())
                         .fill_null(False),
                         "v": b["v"]}, schema=_EXPAND_SCHEMA)

    def from_frontier(b: pa.Table) -> pa.Table:
        return pa.table({"k": b["node"],
                         "__f": pa.nulls(b.num_rows, pa.bool_())
                         .fill_null(True),
                         "v": pa.nulls(b.num_rows, pa.string())},
                        schema=_EXPAND_SCHEMA)

    u = und.map_batches(from_edges, batch_format="pyarrow") \
        .union(frontier.map_batches(from_frontier, batch_format="pyarrow"))
    out_schema = pa.schema([("node", pa.string()), ("dist", pa.int64())])

    def cogroup(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["k"])
        mark = b["__f"].combine_chunks().to_numpy(zero_copy_only=False)
        hit = np.zeros(int(gid[-1]) + 1, bool)
        hit[gid[mark]] = True                 # groups with a frontier row
        keep = hit[gid] & ~mark               # ... their edge rows
        dst = b["v"].filter(pa.array(keep))
        # map-side combine: every candidate this round has the SAME dist,
        # so the min-partial is a plain per-block node dedup — a hub
        # reached from thousands of frontier neighbors leaves this block
        # as ONE row
        dst = pc.unique(dst)
        return pa.table({
            "node": dst,
            "dist": pa.array(np.full(len(dst), depth, np.int64))},
            schema=out_schema)

    return sorted_group_apply(u, ["k"], cogroup, num_partitions)


def bfs_distances(edges: ray.data.Dataset, seeds: ray.data.Dataset,
                  max_depth: int = 6, directed: bool = False,
                  num_partitions: int = 8) -> ray.data.Dataset:
    """``edges``: Dataset with string columns (src, dst). ``seeds``: Dataset
    with a string ``node`` column (distance 0). Returns (node, dist:int64)
    for every node reachable within ``max_depth`` hops, key-sorted."""
    def undirect(b: pa.Table) -> pa.Table:
        s, d = b["src"].combine_chunks(), b["dst"].combine_chunks()
        if directed:
            return pa.table({"u": s, "v": d})
        return pa.table({"u": pa.concat_arrays([s, d]),
                         "v": pa.concat_arrays([d, s])})

    und = _sever(edges.map_batches(undirect,
                                   batch_format="pyarrow").materialize())

    def tag0(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"],
                         "dist": pa.array(np.zeros(b.num_rows, np.int64))})

    # distinct seeds (a seed list with dupes must not emit twice)
    dist = _sever(sorted_aggregate(
        seeds.map_batches(tag0, batch_format="pyarrow"), ["node"],
        [("dist", "min")], ["node", "dist"], num_partitions).materialize())
    frontier = dist
    n_nodes = dist.count()
    for t in range(1, max_depth + 1):
        cand = _expand_frontier(und, frontier, t, num_partitions)
        dist = _sever(sorted_aggregate(dist.union(cand), ["node"],
                                       [("dist", "min")], ["node", "dist"],
                                       num_partitions).materialize())
        n_new = dist.count()
        if n_new == n_nodes:
            break  # no node first reached this round -> BFS complete
        n_nodes = n_new
        # nodes first reached this round: their merged dist == t
        frontier = dist.map_batches(
            lambda b, t=t: b.filter(pc.equal(b["dist"], t)),
            batch_format="pyarrow", zero_copy_batch=True)
    return dist
