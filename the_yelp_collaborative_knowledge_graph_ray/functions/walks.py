"""Deterministic random-walk corpus generation (DeepWalk/node2vec input).

Graph-embedding training (Perozzi et al. 2014 "DeepWalk", Grover &
Leskovec 2016 "node2vec") starts from a corpus of random walks — at
100 TB that corpus generation IS a data-pipeline job, and a
nondeterministic one poisons reproducibility: a retried task would emit
different walks. Here every step is a pure function of (current node,
step index): the neighbor chosen at step s from node u is

    neighbors_sorted(u)[ uint32(md5(u + '#' + s)[:4]) % degree(u) ]

— the engine's standard md5 bridge, so the whole walk table is
DuckDB-oracle-gated (row_number adjacency + the same hex arithmetic),
which practically no walk generator can claim.

Distributed shape: adjacency ranks materialize once from the undirected
edge list (ONE key sort; rank = position among sorted neighbors);
every step is one degree-attach plus one composite-key co-group join
(`functions/bgp.cogroup_join`) — L steps = L small joins over
node-table-sized frontiers, never the corpus. The per-row md5 runs on
the frontier (|V| rows/step), not on edges.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

WALK_LEN = 3
SEP = "\x1f"


def _md5_idx(node: str, step: int) -> int:
    h = hashlib.md5(f"{node}#{step}".encode("utf-8")).hexdigest()[:8]
    return int(h, 16)


def random_walks(edges: ray.data.Dataset, length: int = WALK_LEN,
                 num_partitions: int = 8) -> ray.data.Dataset:
    """``edges``: distinct (u, v) string pairs, u < v. Returns one walk
    per node: (start, hop1, ..., hopL)."""
    from .bgp import cogroup_join
    from .grouped import group_ids, grouped_count, sorted_group_apply
    from .joins import attach_column

    def undirect(b: pa.Table) -> pa.Table:
        return pa.table({
            "u": pa.concat_arrays([b["u"].combine_chunks(),
                                   b["v"].combine_chunks()]),
            "v": pa.concat_arrays([b["v"].combine_chunks(),
                                   b["u"].combine_chunks()])})

    und = edges.map_batches(undirect, batch_format="pyarrow")

    adj_schema = pa.schema([("key", pa.string()), ("v", pa.string())])

    def rank_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return adj_schema.empty_table()
        b = b.sort_by([("u", "ascending"), ("v", "ascending")])
        gid, starts = group_ids(b, ["u"])
        rn = np.arange(b.num_rows, dtype=np.int64) - starts[gid]
        u = b["u"].to_numpy(zero_copy_only=False)
        key = [f"{a}{SEP}{r}" for a, r in zip(u, rn)]
        return pa.table({"key": pa.array(key, pa.string()),
                         "v": b["v"]}, schema=adj_schema)

    adj = sorted_group_apply(und, ["u"], rank_block,
                             num_partitions).materialize()
    deg = grouped_count(und, ["u"], "deg", num_partitions) \
        .map_batches(lambda b: pa.table({"node": b["u"],
                                         "deg": b["deg"]}),
                     batch_format="pyarrow").materialize()

    frontier = deg.map_batches(
        lambda b: pa.table({"start": b["node"], "cur": b["node"]}),
        batch_format="pyarrow")

    hop_cols: list[str] = []
    for s in range(1, length + 1):
        carried = [("start", pa.string())] + \
            [(h, pa.string()) for h in hop_cols] + [("cur", pa.string())]
        with_deg = attach_column(
            frontier, deg, carried, "cur", "node", "deg", "__deg",
            pa.int64(), num_partitions, key_type=pa.string())

        def mk_key(b: pa.Table, _s=s, _carried=tuple(carried)
                   ) -> pa.Table:
            cur = b["cur"].to_numpy(zero_copy_only=False)
            dg = b["__deg"].to_numpy(zero_copy_only=False)
            key = [f"{c}{SEP}{_md5_idx(c, _s) % d}"
                   for c, d in zip(cur, dg)]
            cols = {n: b[n] for n, _t in _carried}
            cols["key"] = pa.array(key, pa.string())
            return pa.table(cols)

        keyed = with_deg.map_batches(mk_key, batch_format="pyarrow")
        joined = cogroup_join(
            keyed, adj, ["key"],
            [n for n, _t in carried], ["v"], num_partitions)
        hop = f"hop{s}"
        hop_cols.append(hop)

        def advance(b: pa.Table, _hop=hop,
                    _prev=tuple(hop_cols[:-1])) -> pa.Table:
            cols = {"start": b["start"]}
            for h in _prev:
                cols[h] = b[h]
            cols[_hop] = b["v"]
            cols["cur"] = b["v"]
            return pa.table(cols)

        frontier = joined.map_batches(advance,
                                      batch_format="pyarrow")

    out_cols = ["start"] + hop_cols
    return frontier.map_batches(
        lambda b: b.select(out_cols), batch_format="pyarrow") \
        .sort("start")
