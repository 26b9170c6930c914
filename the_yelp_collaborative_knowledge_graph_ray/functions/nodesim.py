"""Node-pair similarity over a graph: common-neighbor counts and Jaccard —
the classic link-prediction / related-entity primitive (Liben-Nowell &
Kleinberg 2003, public).

For the KG's co-mention graph this answers "which two entities share the
most context" even when they never co-occur directly: a common neighbor is
a node adjacent to both. Shape: for every node w, every unordered pair of
w's neighbors gains one shared witness — so common-neighbor counting IS
within-group pair counting keyed on w (the same vectorized pair-expansion
machinery the dedup family uses), followed by one sum all-to-all. Degrees
attach via the string-key co-group join, and the Jaccard score is exact
int64 fixed point: jaccard_fp = 10^6·common // (deg_u + deg_v − common).

Skew note: a hub of degree d contributes O(d²) pairs — the same blow-up
triangle counting documents; the degree-orientation trick applies here too
if hubs appear. At the mention-graph scale the group sizes are the
co-mention neighborhoods (bounded by vocabulary), so the quadratic term is
benign.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .grouped import (
    _pair_index_arrays,
    group_ids,
    grouped_count,
    sorted_aggregate,
    sorted_group_apply,
)
from .joins import attach_column

JACCARD_SCALE = 10**6


def jaccard_node_pairs(edges: ray.data.Dataset, top_k: int = 50,
                       num_partitions: int = 8) -> ray.data.Dataset:
    """edges: distinct string (u, v) pairs, u < v. Returns the ``top_k``
    node pairs by Jaccard neighbor overlap: (u, v, common, deg_u, deg_v,
    jaccard_fp), ordered by (jaccard_fp desc, u, v)."""
    def undirect(b: pa.Table) -> pa.Table:
        return pa.table({
            "w": pa.concat_arrays([b["u"].combine_chunks(),
                                   b["v"].combine_chunks()]),
            "x": pa.concat_arrays([b["v"].combine_chunks(),
                                   b["u"].combine_chunks()])})

    und = edges.map_batches(undirect, batch_format="pyarrow")
    pair_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                             ("common", pa.int64())])

    def block_pairs(b: pa.Table) -> pa.Table:
        """Complete w-groups per sorted block: every unordered neighbor
        pair gains one witness; local Arrow partial collapses repeats."""
        if b.num_rows == 0:
            return pair_schema.empty_table()
        gid, _ = group_ids(b, ["w"])
        x = b["x"].to_numpy(zero_copy_only=False)
        dic, inv = np.unique(x, return_inverse=True)
        sel, first, second = _pair_index_arrays(
            gid, inv.astype(np.int64), None, None, "jaccard_node_pairs")
        if len(first) == 0:
            return pair_schema.empty_table()
        t = pa.table({"u": pa.array(dic[inv[sel[first]]], pa.string()),
                      "v": pa.array(dic[inv[sel[second]]], pa.string())})
        return t.group_by(["u", "v"], use_threads=False) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["u", "v", "common"])

    partials = sorted_group_apply(und, ["w"], block_pairs, num_partitions)
    common = sorted_aggregate(partials, ["u", "v"], [("common", "sum")],
                              ["u", "v", "common"], num_partitions)

    deg = grouped_count(und, ["w"], "d", num_partitions)
    with_du = attach_column(
        common, deg,
        [("u", pa.string()), ("v", pa.string()), ("common", pa.int64())],
        "u", "w", "d", "deg_u", pa.int64(), num_partitions,
        key_type=pa.string())
    with_dv = attach_column(
        with_du, deg,
        [("u", pa.string()), ("v", pa.string()), ("common", pa.int64()),
         ("deg_u", pa.int64())],
        "v", "w", "d", "deg_v", pa.int64(), num_partitions,
        key_type=pa.string())

    def score(b: pa.Table) -> pa.Table:
        c = b["common"].to_numpy()
        du = b["deg_u"].to_numpy()
        dv = b["deg_v"].to_numpy()
        j = (JACCARD_SCALE * c) // (du + dv - c)
        return b.append_column("jaccard_fp", pa.array(j, pa.int64())) \
            .append_column("__g", pa.array(np.zeros(len(c), np.int64)))

    scored = with_dv.map_batches(score, batch_format="pyarrow",
                                 zero_copy_batch=True)
    from .topn import top_n_per_key
    top = top_n_per_key(scored, ["__g"],
                        [("jaccard_fp", False), ("u", True), ("v", True)],
                        top_k)
    return top.map_batches(
        lambda b: b.select(["u", "v", "common", "deg_u", "deg_v",
                            "jaccard_fp"]),
        batch_format="pyarrow", zero_copy_batch=True)


AA_SCALE = 10**6


def adamic_adar_pairs(incidence: ray.data.Dataset,
                      num_partitions: int = 8) -> ray.data.Dataset:
    """Adamic–Adar link-prediction scores over a bipartite incidence list.

    ``incidence``: distinct (w, x) string rows — witness w (here: a turn)
    contains entity x (here: a canonical mention). For every unordered
    entity pair sharing a witness, score(u, v) = Σ_w 1/ln(deg w) over the
    shared witnesses (Adamic & Adar 2003, public). High score = many
    LOW-degree shared contexts — rarer co-occurrence contexts weigh more
    than hub contexts, the refinement Jaccard (above) lacks.

    Exactness contract: each witness's weight is rounded ONCE to int64
    fixed point (round(10^6 / ln(deg_w))) and summed in integer space, so
    the result is independent of summation order — engine-reproducible,
    and an SQL oracle mirrors it term for term. Witness degree = the size
    of its complete sorted group, so no degree join is needed at all: one
    sort by w, one pair expansion with the weight carried, one integer
    sum all-to-all. deg >= 2 is implied (singleton witnesses emit no
    pairs), so ln() never sees 1.
    """
    pair_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                             ("n_shared", pa.int64()),
                             ("aa_fp", pa.int64())])

    def block_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pair_schema.empty_table()
        gid, _ = group_ids(b, ["w"])
        x = b["x"].to_numpy(zero_copy_only=False)
        dic, inv = np.unique(x, return_inverse=True)
        sel, first, second = _pair_index_arrays(
            gid, inv.astype(np.int64), None, None, "adamic_adar_pairs")
        if len(first) == 0:
            return pair_schema.empty_table()
        # witness degree = distinct-x count of the group, counted on the
        # deduped rows `sel` (complete groups per sorted block)
        gsel = gid[sel]
        deg = np.bincount(gsel, minlength=gid.max() + 1)
        wt = np.round(AA_SCALE / np.log(np.maximum(deg, 2))).astype(
            np.int64)
        t = pa.table({"u": pa.array(dic[inv[sel[first]]], pa.string()),
                      "v": pa.array(dic[inv[sel[second]]], pa.string()),
                      "one": pa.array(np.ones(len(first), np.int64)),
                      "aa": pa.array(wt[gsel[first]])})
        return t.group_by(["u", "v"], use_threads=False) \
            .aggregate([("one", "sum"), ("aa", "sum")]) \
            .rename_columns(["u", "v", "n_shared", "aa_fp"])

    partials = sorted_group_apply(incidence, ["w"], block_pairs,
                                  num_partitions)
    return sorted_aggregate(partials, ["u", "v"],
                            [("n_shared", "sum"), ("aa_fp", "sum")],
                            ["u", "v", "n_shared", "aa_fp"],
                            num_partitions).sort(["u", "v"])
