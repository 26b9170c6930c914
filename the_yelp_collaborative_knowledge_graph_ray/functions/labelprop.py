"""Synchronous label-propagation community detection (fixed rounds).

The classic semi-supervised community algorithm (Raghavan et al. 2007,
"Near linear time algorithm to detect community structures in large-scale
networks") in its SYNCHRONOUS, deterministic form: every node starts as
its own label; each round every node simultaneously adopts the most
frequent label among its neighbours, ties broken by the lexicographically
smallest label. A FIXED round count (default 3) replaces the usual
run-to-convergence so the result is deterministic and SQL-twinnable (the
oracle unrolls the same rounds as CTE chain — asynchronous LPA with
random visit order would be neither).

Distributed shape per round — no driver-side graph, no full
materialization of anything but the O(V) label table:
  1. neighbour labels: ONE string-keyed sorted co-group attaches the
     current label of ``v`` to each directed edge (u, v)
     (functions/joins.attach_column; the label table ships one row per
     node);
  2. votes: grouped count per (u, label) with map-side Arrow partials;
  3. winner: ``top_n_per_key(n=1)`` under (count desc, label asc) — a
     local monotone prune per block, then one keyed exchange.
All three are the engine's standard primitives, so skew handling
(per-block combine before every shuffle) comes for free; a hub node's
votes collapse to one row per (label, block) before they travel.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def label_propagation(edges: ray.data.Dataset, rounds: int = 3,
                      num_partitions: int = 8) -> ray.data.Dataset:
    """``edges``: string columns (u, v), distinct unordered pairs (u < v).
    Returns (node, community) for every node with at least one edge."""
    from .grouped import grouped_count
    from .joins import attach_column
    from .topn import top_n_per_key

    def undirect(b: pa.Table) -> pa.Table:
        return pa.table({
            "u": pa.concat_arrays([b["u"].combine_chunks(),
                                   b["v"].combine_chunks()]),
            "v": pa.concat_arrays([b["v"].combine_chunks(),
                                   b["u"].combine_chunks()])})

    und = edges.map_batches(undirect, batch_format="pyarrow") \
        .materialize()

    labels = grouped_count(und, ["u"], "__n", num_partitions) \
        .map_batches(lambda b: pa.table({"node": b["u"], "lbl": b["u"]}),
                     batch_format="pyarrow").materialize()

    for _ in range(rounds):
        nbr = attach_column(
            und, labels, [("u", pa.string()), ("v", pa.string())],
            "v", "node", "lbl", "nlbl", pa.string(), num_partitions,
            key_type=pa.string())
        votes = grouped_count(nbr, ["u", "nlbl"], "c", num_partitions)
        labels = top_n_per_key(
            votes, ["u"], [("c", False), ("nlbl", True)], 1,
            num_partitions).map_batches(
            lambda b: pa.table({"node": b["u"], "lbl": b["nlbl"]}),
            batch_format="pyarrow").materialize()

    return labels.map_batches(
        lambda b: pa.table({"node": b["node"], "community": b["lbl"]}),
        batch_format="pyarrow")
