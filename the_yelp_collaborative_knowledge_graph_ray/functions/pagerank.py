"""Fixed-point integer PageRank over an edge Dataset — graph importance for
the materialized KG (which entities/tools dominate the conversation graph),
the iterative-BSP companion to :mod:`functions.components`.

Why integers: PageRank is usually float, but float sums are
summation-order-dependent, which would make a distributed run unverifiable
against a sequential oracle. Here every quantity is an int64 fixed-point
mass (``SCALE = 10**12`` per node at t=0) and every step uses floor
division, so the Ray run and the DuckDB unrolled-CTE oracle agree
BIT-FOR-BIT after any shuffle order:

    rank_0(v)   = SCALE
    rank_t+1(v) = floor(0.15*SCALE)
                  + (85 * Σ_{(u,v)∈E} floor(rank_t(u) / outdeg(u))) // 100

Dangling-node mass evaporates (the standard simplification — no
redistribution term), so total mass only shrinks and int64 never overflows
for graphs up to ~9e6 nodes at this SCALE; larger graphs lower SCALE (the
85× step already uses the overflow-free decomposition
``85*(s//100) + (85*(s%100))//100 == (85*s)//100``).

Execution shape (same as connected_components): the edge+outdegree table is
built ONCE and materialized; each of the fixed ``iters`` rounds is one hash
join (ship ranks to edges — a rank row per node, never the edge list twice)
plus one sort-aggregate sum by destination. Per-round ``_sever`` cuts the
plan lineage so a long run cannot overflow Ray's stats recursion
(components.py:38-45). Skew note: a celebrity destination node's
contributions are pre-summed map-side by sorted_aggregate's partial
combine, so hot in-degree keys cost one shuffled partial per block, not one
row per in-edge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .components import _sever
from .grouped import grouped_count, sorted_aggregate

SCALE = 10**12
BASE = 15 * SCALE // 100  # floor(0.15 * SCALE)


def _distinct(ds: ray.data.Dataset, keys: list[str],
              num_partitions: int) -> ray.data.Dataset:
    """Distinct rows via the engine's sort-aggregate (map-side combine
    included), dropping the count column."""
    cnt = grouped_count(ds, keys, "_n", num_partitions)
    return cnt.map_batches(lambda b: b.select(keys), batch_format="pyarrow",
                           zero_copy_batch=True)


def pagerank(edges: ray.data.Dataset, iters: int = 5,
             num_partitions: int = 8) -> ray.data.Dataset:
    """edges: Dataset with string columns (src, dst), already distinct.
    Returns (node, rank) — int64 fixed-point rank after ``iters`` rounds,
    sorted by node."""
    edges = _sever(edges.materialize())

    outdeg = grouped_count(edges, ["src"], "outdeg", num_partitions)
    ew = _sever(edges.join(outdeg, join_type="inner",
                           num_partitions=num_partitions,
                           on=("src",), left_suffix="", right_suffix="_r")
                .materialize())

    def to_nodes(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [b["src"].combine_chunks(), b["dst"].combine_chunks()])})

    nodes = _sever(_distinct(
        edges.map_batches(to_nodes, batch_format="pyarrow"),
        ["node"], num_partitions).materialize())

    ranks = nodes.map_batches(
        lambda b: b.append_column(
            "rank", pa.array(np.full(b.num_rows, SCALE, np.int64))),
        batch_format="pyarrow")

    def to_contrib(b: pa.Table) -> pa.Table:
        c = b["rank"].to_numpy() // b["outdeg"].to_numpy()
        return pa.table({"node": b["dst"], "c": pa.array(c, pa.int64())})

    zeros = nodes.map_batches(
        lambda b: b.append_column("c", pa.array(
            np.zeros(b.num_rows, np.int64))), batch_format="pyarrow")

    def damp(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy()
        r = BASE + 85 * (s // 100) + (85 * (s % 100)) // 100
        return pa.table({"node": b["node"], "rank": pa.array(r, pa.int64())})

    for _ in range(iters):
        prop = ew.join(ranks, join_type="inner",
                       num_partitions=num_partitions,
                       on=("src",), right_on=("node",),
                       left_suffix="", right_suffix="_r")
        contrib = prop.map_batches(to_contrib, batch_format="pyarrow")
        sums = sorted_aggregate(contrib.union(zeros), ["node"],
                                [("c", "sum")], ["node", "s"],
                                num_partitions)
        ranks = _sever(sums.map_batches(
            damp, batch_format="pyarrow").materialize())

    return ranks.sort("node")
