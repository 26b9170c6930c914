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

# Node-state size cap for the BSP fast path: below this the per-node state
# (rank/outdeg/seed, 24 B/node -> ~100 MB at the cap) is driver-resident and
# broadcast per round, edges stay PINNED in per-shard actors, and each round
# is K actor calls instead of two Dataset shuffles. Above it, the join path
# below runs unchanged — same arithmetic, bit-identical output.
BROADCAST_NODES_MAX = 1 << 22


@ray.remote
class _EdgeShard:
    """One preprocessed edge partition for BSP PageRank rounds.

    ``__init__`` (once): concatenate this shard's edge blocks and sort by
    destination, caching the permuted source ids and the destination run
    starts. Each ``contribute`` round is then two numpy gathers plus one
    ``np.add.reduceat`` — pure C over int64, no hashing, no Python rows —
    returning the shard's SPARSE (destination, partial-sum) arrays."""

    def __init__(self, *blocks: pa.Table):
        tabs = [t for t in blocks if t.num_rows]
        if not tabs:
            self.du = np.empty(0, np.int64)
            return
        sid = np.concatenate(
            [t["sid"].to_numpy(zero_copy_only=False) for t in tabs])
        did = np.concatenate(
            [t["did"].to_numpy(zero_copy_only=False) for t in tabs])
        order = np.argsort(did, kind="stable")
        d = did[order]
        self.sid_perm = sid[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        self.du = d[starts]
        self.starts = starts

    def contribute(self, q: np.ndarray):
        if not len(self.du):
            return self.du, self.du
        return self.du, np.add.reduceat(q[self.sid_perm], self.starts)

    def out_degrees(self):
        """Sparse (source id, out-degree) of THIS shard's edges — folded
        densely on the driver, so the out-degree table costs one actor
        round instead of a count-groupby shuffle."""
        if not len(self.du):
            return self.du, self.du
        return np.unique(self.sid_perm, return_counts=True)


def _distinct(ds: ray.data.Dataset, keys: list[str],
              num_partitions: int) -> ray.data.Dataset:
    """Distinct rows via the engine's sort-aggregate (map-side combine
    included), dropping the count column."""
    cnt = grouped_count(ds, keys, "_n", num_partitions)
    return cnt.map_batches(lambda b: b.select(keys), batch_format="pyarrow",
                           zero_copy_batch=True)


def _encode_edges(edges: ray.data.Dataset, num_partitions: int
                  ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Compress the (src, dst) string edge list to dense int64 node ids:
    distinct nodes -> ``zip_with_index`` -> two string-key co-groups, ONCE,
    so every iterative round downstream shuffles 16-byte int rows instead
    of IRI strings. Returns (eint = (sid, did), ids = (node, nid))."""
    from .joins import attach_column, zip_with_index
    edges = _sever(edges.materialize())

    def to_nodes(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [b["src"].combine_chunks(), b["dst"].combine_chunks()])})

    nodes = _distinct(edges.map_batches(to_nodes, batch_format="pyarrow"),
                      ["node"], num_partitions)
    ids = _sever(zip_with_index(nodes))  # (node, nid) — internal dense ids

    e1 = attach_column(edges, ids, [("src", pa.string()),
                                    ("dst", pa.string())],
                       "src", "node", "nid", "sid", pa.int64(),
                       num_partitions, key_type=pa.string())
    e2 = attach_column(e1, ids, [("sid", pa.int64()), ("dst", pa.string())],
                       "dst", "node", "nid", "did", pa.int64(),
                       num_partitions, key_type=pa.string())
    eint = _sever(e2.map_batches(lambda b: b.select(["sid", "did"]),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True).materialize())
    return eint, ids


def _encode_edges_broadcast(edges: ray.data.Dataset
                            ) -> tuple[ray.data.Dataset, pa.Array | None]:
    """Broadcast node-id encode for graphs under ``BROADCAST_NODES_MAX``:
    distinct node strings fold WORKER-SIDE (``joins.distinct_str_keys`` —
    no groupby shuffle), the sorted node array broadcasts once via
    ``ray.put``, and ONE stateless map rewrites edges to dense int ids
    with ``pc.index_in`` (hash probe in C++). Replaces the generic
    ``_encode_edges`` plan — a distinct groupby + zip_with_index + TWO
    string-key co-group joins — with zero shuffles. nid = rank in the
    sorted node array, so driver-side results are ALREADY in final node
    order and need no closing sort.

    Returns ``(eint, nodes_sorted)``; on cap overflow returns
    ``(edges_materialized, None)`` so the caller falls back to the join
    path without recomputing the edge Dataset. The cap gate runs INSIDE
    :func:`joins.distinct_str_keys` (remote, large_string fold): an
    above-cap graph's node strings are never materialized on the driver
    on the way to the join fallback."""
    from .joins import distinct_str_keys
    edges = _sever(edges.materialize())
    nodes = distinct_str_keys(edges, ["src", "dst"],
                              cap=BROADCAST_NODES_MAX)
    if nodes is None:
        return edges, None
    nref = ray.put(nodes)

    def intify(b: pa.Table) -> pa.Table:
        ns = ray.get(nref)
        sid = pc.index_in(pc.cast(b["src"], ns.type), value_set=ns)
        did = pc.index_in(pc.cast(b["dst"], ns.type), value_set=ns)
        if sid.null_count or did.null_count:
            raise ValueError("edge endpoint missing from the folded node "
                             "set (non-deterministic upstream recompute?)")
        return pa.table({"sid": pc.cast(sid, pa.int64()),
                         "did": pc.cast(did, pa.int64())})

    eint = _sever(edges.map_batches(intify, batch_format="pyarrow",
                                    zero_copy_batch=True).materialize())
    return eint, nodes


def _edge_shards(eint: ray.data.Dataset, max_shards: int = 32) -> list:
    """Spin up the pinned-edge BSP actors over a materialized int edge
    list's blocks (round-robin so shard sizes balance)."""
    refs = eint.to_arrow_refs()
    n_shards = max(1, min(len(refs), max_shards))
    return [_EdgeShard.remote(*refs[i::n_shards]) for i in range(n_shards)]


def _fold_contribs(shards: list, q: np.ndarray, n_nodes: int) -> np.ndarray:
    """One BSP round: broadcast q, gather each shard's sparse per-destination
    partial sums, fold densely (destinations are unique per shard, so the
    fancy-index add is exact)."""
    qref = ray.put(q)
    s = np.zeros(n_nodes, np.int64)
    for du, sums in ray.get([sh.contribute.remote(qref) for sh in shards]):
        s[du] += sums
    return s


EIG_SCALE = 10**6


def eigenvector_centrality(edges: ray.data.Dataset, iters: int = 3,
                           num_partitions: int = 8) -> ray.data.Dataset:
    """Fixed-point integer eigenvector centrality (power iteration with
    max-normalization) over a string edge Dataset.

    Pinned integer convention (both engines, bit-equal under any shuffle):

        x_0(v)   = EIG_SCALE
        s_t(v)   = Σ_{(u,v)∈E} x_t(u)          (in-edge sum, missing -> 0)
        x_{t+1}  = EIG_SCALE * s_t(v) // max_w s_t(w)   (0 if the max is 0)

    Max-normalization instead of the usual L2 keeps everything int64 and
    floor-exact; EIG_SCALE=1e6 is overflow-safe for max in-degree < ~9e6
    (s <= indeg*1e6, then *1e6 < 2^63). Same two execution paths as
    :func:`pagerank`: pinned-edge BSP actors + driver node state below
    ``BROADCAST_NODES_MAX``, per-round co-group join + sort-aggregate above
    it. Returns (node, score) sorted by node."""
    from .joins import attach_column
    i64 = pa.int64()
    maybe_eint, nodes = _encode_edges_broadcast(edges)
    if nodes is not None:
        n_nodes = len(nodes)
        if n_nodes == 0:
            return ray.data.from_arrow(pa.table(
                {"node": pa.array([], pa.string()),
                 "score": pa.array([], i64)}))
        shards = _edge_shards(maybe_eint)
        x = np.full(n_nodes, EIG_SCALE, np.int64)
        for _ in range(iters):
            s = _fold_contribs(shards, x, n_nodes)
            m = int(s.max())
            x = (EIG_SCALE * s // m if m > 0
                 else np.zeros(n_nodes, np.int64))
        del shards
        return ray.data.from_arrow(pa.table(
            {"node": nodes, "score": pa.array(x, i64)}))
    eint, ids = _encode_edges(maybe_eint, num_partitions)
    xt = _sever(ids.map_batches(
        lambda b: pa.table({
            "nid": b["nid"],
            "x": pa.array(np.full(b.num_rows, EIG_SCALE, np.int64))}),
        batch_format="pyarrow").materialize())
    for _ in range(iters):
        prop = attach_column(eint, xt,
                             [("sid", i64), ("did", i64)],
                             "sid", "nid", "x", "q", i64,
                             num_partitions)
        contrib = prop.map_batches(
            lambda b: pa.table({"nid": b["did"], "c": b["q"]}),
            batch_format="pyarrow", zero_copy_batch=True)
        zeros = xt.map_batches(
            lambda b: pa.table({"nid": b["nid"], "c": pa.array(
                np.zeros(b.num_rows, np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True)
        sums = _sever(sorted_aggregate(
            contrib.union(zeros), ["nid"], [("c", "sum")],
            ["nid", "s"], num_partitions).materialize())
        m = int(sums.max("s") or 0)

        def rescale(b: pa.Table, m: int = m) -> pa.Table:
            s = b["s"].to_numpy()
            x = (EIG_SCALE * s // m if m > 0
                 else np.zeros(len(s), np.int64))
            return pa.table({"nid": b["nid"],
                             "x": pa.array(x, i64)})

        xt = _sever(sums.map_batches(
            rescale, batch_format="pyarrow").materialize())
    out = attach_column(xt, ids, [("nid", i64), ("x", i64)],
                        "nid", "nid", "node", "node", pa.string(),
                        num_partitions)
    return out.map_batches(
        lambda b: pa.table({"node": b["node"], "score": b["x"]}),
        batch_format="pyarrow", zero_copy_batch=True).sort("node")


def pagerank(edges: ray.data.Dataset, iters: int = 5,
             num_partitions: int = 8,
             seed_filter=None) -> ray.data.Dataset:
    """edges: Dataset with string columns (src, dst), already distinct.
    Returns (node, rank) — int64 fixed-point rank after ``iters`` rounds,
    sorted by node.

    ``seed_filter`` (optional): a vectorized predicate
    ``pa.Array[string] -> pa.BooleanArray`` selecting the PERSONALIZED
    restart set (random-walk-with-restart relevance, the KG-retrieval
    primitive): seeds start with the full SCALE mass and receive the
    0.15·SCALE restart each round; non-seeds start at 0 and receive none.
    A predicate rather than a seed Dataset keeps the personalization
    join-free (one vectorized pass over the node table) and lets the SQL
    oracle mirror it as a WHERE/CASE expression. ``None`` = classic
    PageRank (every node is a seed).

    Iteration runs entirely on dense int64 node ids: IRI strings are
    compressed ONCE through ``joins.zip_with_index`` + two string-key
    ``attach_column`` passes, so the per-round shuffles move 16-byte int
    rows instead of ~60-120-byte IRI keys (measured 29.4 s → 13.1 s for
    5 rounds at 1M edges / 335k nodes, sf0.1, 32 CPUs), and strings come
    back with one final join. Each round is ONE edge co-group + ONE
    aggregate: the rank/outdeg division is a plain map because the static
    out-degree rides inside the rank table (0 for dangling; it survives
    the sum-aggregate as a max column on the per-node zero rows)."""
    from .joins import attach_column

    # Broadcast fast path (graphs under BROADCAST_NODES_MAX): zero-shuffle
    # node-id encode, out-degrees folded from the pinned edge shards, node
    # state driver-resident, one broadcast + K sparse partials per round.
    # Identical floor arithmetic to the join path -> bit-equal ranks; the
    # output is already in sorted node order (nid = rank in the sorted
    # node array), so no closing sort job either.
    maybe_eint, nodes = _encode_edges_broadcast(edges)
    if nodes is not None:
        n_nodes = len(nodes)
        if n_nodes == 0:
            return ray.data.from_arrow(pa.table(
                {"node": pa.array([], pa.string()),
                 "rank": pa.array([], pa.int64())}))
        shards = _edge_shards(maybe_eint)
        outdeg_arr = np.zeros(n_nodes, np.int64)
        for u, c in ray.get([sh.out_degrees.remote() for sh in shards]):
            outdeg_arr[u] += c
        sd_arr = np.ones(n_nodes, np.int64) if seed_filter is None else \
            seed_filter(nodes).to_numpy(
                zero_copy_only=False).astype(np.int64)
        rank_arr = sd_arr * SCALE
        src_mask = outdeg_arr > 0
        safe_deg = np.maximum(outdeg_arr, 1)
        for _ in range(iters):
            q = np.where(src_mask, rank_arr // safe_deg, 0)
            s = _fold_contribs(shards, q, n_nodes)
            rank_arr = sd_arr * BASE + 85 * (s // 100) \
                + (85 * (s % 100)) // 100
        del shards
        return ray.data.from_arrow(pa.table(
            {"node": nodes, "rank": pa.array(rank_arr, pa.int64())}))

    eint, ids = _encode_edges(maybe_eint, num_partitions)

    # static out-degree folded INTO the rank table (0 for dangling nodes),
    # so each round is ONE edge co-group + ONE aggregate — no node-sized
    # join: q = rank // outdeg is a plain map, and outdeg survives the
    # aggregate as a max column (contrib rows carry 0, the per-node zero
    # row carries the true value).
    deg_rows = grouped_count(eint, ["sid"], "outdeg", num_partitions) \
        .map_batches(lambda b: pa.table({
            "nid": b["sid"], "outdeg": b["outdeg"],
            "sd": pa.array(np.zeros(b.num_rows, np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True)

    def zero_row(b: pa.Table) -> pa.Table:
        # every node appears here, so this is where the seed flag is
        # computed (node strings in hand) and folded into the rank table
        sd = np.ones(b.num_rows, np.int64) if seed_filter is None else \
            seed_filter(b["node"].combine_chunks()
                        if isinstance(b["node"], pa.ChunkedArray)
                        else b["node"]).to_numpy(
                zero_copy_only=False).astype(np.int64)
        return pa.table({"nid": b["nid"],
                         "outdeg": pa.array(np.zeros(b.num_rows, np.int64)),
                         "sd": pa.array(sd)})

    zero_deg = ids.map_batches(zero_row, batch_format="pyarrow")
    ranks = _sever(sorted_aggregate(
        deg_rows.union(zero_deg), ["nid"],
        [("outdeg", "max"), ("sd", "max")],
        ["nid", "outdeg", "sd"], num_partitions).map_batches(
        lambda b: b.append_column("rank", pa.array(
            b["sd"].to_numpy() * SCALE)),
        batch_format="pyarrow").materialize())

    def damp(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy()
        r = b["sd"].to_numpy() * BASE + 85 * (s // 100) \
            + (85 * (s % 100)) // 100
        return pa.table({"nid": b["nid"], "outdeg": b["outdeg"],
                         "sd": b["sd"], "rank": pa.array(r, pa.int64())})

    for _ in range(iters):
        # per-source contribution: a plain map over the rank table
        def to_q(b: pa.Table) -> pa.Table:
            t = b.filter(pc.greater(b["outdeg"], 0))
            return pa.table({
                "nid": t["nid"],
                "q": pa.array(t["rank"].to_numpy()
                              // t["outdeg"].to_numpy(), pa.int64())})

        q = ranks.map_batches(to_q, batch_format="pyarrow",
                              zero_copy_batch=True)
        # scatter to edges: one int-key co-group over (sid, did)
        prop = attach_column(eint, q,
                             [("sid", pa.int64()), ("did", pa.int64())],
                             "sid", "nid", "q", "q", pa.int64(),
                             num_partitions)
        contrib = prop.map_batches(
            lambda b: pa.table({"nid": b["did"], "c": b["q"],
                                "outdeg": pa.array(
                                    np.zeros(b.num_rows, np.int64)),
                                "sd": pa.array(
                                    np.zeros(b.num_rows, np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True)
        zeros = ranks.map_batches(
            lambda b: pa.table({"nid": b["nid"], "c": pa.array(
                np.zeros(b.num_rows, np.int64)), "outdeg": b["outdeg"],
                "sd": b["sd"]}),
            batch_format="pyarrow", zero_copy_batch=True)
        sums = sorted_aggregate(contrib.union(zeros), ["nid"],
                                [("c", "sum"), ("outdeg", "max"),
                                 ("sd", "max")],
                                ["nid", "s", "outdeg", "sd"],
                                num_partitions)
        ranks = _sever(sums.map_batches(
            damp, batch_format="pyarrow").materialize())

    # decode ids back to IRI strings, once
    out = attach_column(ranks, ids,
                        [("nid", pa.int64()), ("rank", pa.int64())],
                        "nid", "nid", "node", "node", pa.string(),
                        num_partitions)
    return out.map_batches(lambda b: b.select(["node", "rank"]),
                           batch_format="pyarrow",
                           zero_copy_batch=True).sort("node")
