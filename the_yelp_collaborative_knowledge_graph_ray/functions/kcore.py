"""k-core subgraph extraction — iterative degree peeling.

The k-core (Seidman 1983, public) is the maximal subgraph where every node
has degree ≥ k — the standard "dense cohesive region" filter applied to
KG-derived graphs before community/embedding work (it strips the long tail
of barely-connected mentions that dominate co-occurrence graphs).

BSP peeling, same conventions as components/pagerank (materialize + sever
per round):

    round: deg = grouped count over surviving edges (map-side combined)
           survivors = edges whose BOTH endpoints have deg >= k
           stop when the edge count stops shrinking (fixpoint)

Endpoint filtering is the engine's union+co-group semi-join (string keys,
sparse-safe — ``Dataset.join`` is avoided as usual): kept-node markers
union with the edge rows keyed on one endpoint; marked groups emit their
edges; two passes filter both endpoints. Deleting a node can only LOWER
other nodes' degrees, so peeling is monotone and the fixpoint is reached
in at most diameter-ish rounds; once stable, extra rounds are no-ops —
which is what lets the DuckDB oracle run a FIXED unroll (≥ the converged
round count) and still match bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .components import _sever
from .grouped import group_ids, grouped_count, sorted_group_apply

_SEMI_SCHEMA = pa.schema([("k", pa.string()), ("__m", pa.bool_()),
                          ("other", pa.string())])


def _edges_with_kept_endpoint(und: ray.data.Dataset,
                              kept: ray.data.Dataset, endpoint: str,
                              num_partitions: int) -> ray.data.Dataset:
    """Surviving (w, x) edge rows whose ``endpoint`` column ('w') is in
    ``kept`` (a (node) Dataset) — union + sorted-block co-group semi."""
    other = "x" if endpoint == "w" else "w"

    def from_edges(b: pa.Table) -> pa.Table:
        return pa.table({"k": b[endpoint],
                         "__m": pa.nulls(b.num_rows, pa.bool_())
                         .fill_null(False),
                         "other": b[other]}, schema=_SEMI_SCHEMA)

    def from_kept(b: pa.Table) -> pa.Table:
        return pa.table({"k": b["node"],
                         "__m": pa.nulls(b.num_rows, pa.bool_())
                         .fill_null(True),
                         "other": pa.nulls(b.num_rows, pa.string())},
                        schema=_SEMI_SCHEMA)

    u = und.map_batches(from_edges, batch_format="pyarrow") \
        .union(kept.map_batches(from_kept, batch_format="pyarrow"))
    out_schema = pa.schema([("w", pa.string()), ("x", pa.string())])

    def cogroup(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["k"])
        mark = b["__m"].combine_chunks().to_numpy(zero_copy_only=False)
        hit = np.zeros(int(gid[-1]) + 1, bool)
        hit[gid[mark]] = True
        keep = hit[gid] & ~mark
        t = b.filter(pa.array(keep))
        return pa.table({"w": t["k"] if endpoint == "w" else t["other"],
                         "x": t["other"] if endpoint == "w" else t["k"]},
                        schema=out_schema)

    return sorted_group_apply(u, ["k"], cogroup, num_partitions)


def kcore_edges(edges: ray.data.Dataset, k: int = 3,
                num_partitions: int = 8,
                max_iter: int = 20) -> tuple[ray.data.Dataset, int]:
    """``edges``: distinct string (u, v) pairs, u < v, of a simple
    undirected graph. Returns ``(core_edges, rounds)``: the k-core's edge
    set in the same (u, v, u < v) form, and how many peel rounds ran
    (callers gate oracle unrolls on it)."""
    def undirect(b: pa.Table) -> pa.Table:
        return pa.table({
            "w": pa.concat_arrays([b["u"].combine_chunks(),
                                   b["v"].combine_chunks()]),
            "x": pa.concat_arrays([b["v"].combine_chunks(),
                                   b["u"].combine_chunks()])})

    und = _sever(edges.map_batches(undirect,
                                   batch_format="pyarrow").materialize())
    n_edges = und.count()
    rounds = 0
    for _ in range(max_iter):
        if n_edges == 0:
            break
        deg = grouped_count(und, ["w"], "d", num_partitions)
        kept = deg.map_batches(
            lambda b: pa.table({"node": b.filter(
                pc.greater_equal(b["d"], k))["w"]}),
            batch_format="pyarrow", zero_copy_batch=True)
        f1 = _edges_with_kept_endpoint(und, kept, "w", num_partitions)
        und = _sever(_edges_with_kept_endpoint(
            f1, kept, "x", num_partitions).materialize())
        rounds += 1
        n_new = und.count()
        if n_new == n_edges:
            break  # fixpoint: every surviving node already has deg >= k
        n_edges = n_new

    def forward(b: pa.Table) -> pa.Table:
        t = b.filter(pc.less(b["w"], b["x"]))
        return pa.table({"u": t["w"], "v": t["x"]})

    return und.map_batches(forward, batch_format="pyarrow",
                           zero_copy_batch=True), rounds
