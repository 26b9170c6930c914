"""Stage 3 — canonicalization of mention surface forms.

Reference semantics generalized (SURVEY.md §2.7, §7): the reference collapses
variant category strings to one IRI via sanitize (``create_yelp_nt_files.py:93``)
+ manual split (``category_mappings.py:25-28``) + singularize/lowercase
(``string_functions.py:17-41``), with in-process ``set()`` caches for dedup
(``create_yelp_nt_files.py:47,101-108``). Here:

1. **Split expansion** — alias-table rows whose ``surface_norm`` maps to >1
   canonical are compound forms ("coffee_tea" -> [coffee, tea]); these are
   hyperedges, *not* equivalences, and are expanded before clustering
   (merging them would fuse 'coffee' with 'tea').
2. **Equivalence clustering** — single-target alias rows (plural / case /
   punctuation variants) are undirected edges; connected components are
   computed distributed (``functions/components.py``: groupby-min label
   propagation — the union-find-over-shuffle of ``BASELINE.json north_star``)
   and each cluster's canonical form is its lexicographic minimum member
   (deterministic tie-break, SURVEY.md §7).
3. **Rewrite** — the resulting canonical map is broadcast (``ray.put`` once,
   read per actor) and mention triples are rewritten through it with fully
   vectorized gather/explode. The map is bounded by the curated alias table +
   observed vocabulary; if a future corpus makes it exceed broadcast budget,
   swap step 3 for ``Dataset.join`` on the surface-norm key (same semantics,
   hash-shuffle instead of broadcast).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .. import config as C
from ..functions.components import connected_components
from .extract import TRIPLE_SCHEMA

MENTION_PREFIX = C.ENT + "mention/"


def split_alias_rows(alias_rows: list[tuple[str, str]]):
    """Partition alias rows into equivalence edges and split hyperedges."""
    targets: dict[str, list[str]] = {}
    for s, c in alias_rows:
        targets.setdefault(s, []).append(c)
    equiv = [(s, cs[0]) for s, cs in targets.items() if len(cs) == 1]
    splits = {s: sorted(cs) for s, cs in targets.items() if len(cs) > 1}
    return equiv, splits


def build_canonical_map(alias_rows: list[tuple[str, str]],
                        num_partitions: int = 8) -> dict[str, tuple[str, ...]]:
    """Canonical map from alias rows, with *distributed* equivalence
    clustering. Returns surface_norm -> tuple of canonical forms."""
    equiv, splits = split_alias_rows(alias_rows)
    out: dict[str, tuple[str, ...]] = {}
    if equiv:
        edges = ray.data.from_arrow(pa.table({
            "u": [e[0] for e in equiv], "v": [e[1] for e in equiv]}))
        labels = connected_components(edges, num_partitions=num_partitions)
        for row in labels.take_all():
            if row["node"] != row["label"]:
                out[row["node"]] = (row["label"],)
    for s, cs in splits.items():
        # split targets may themselves be variants -> resolve one hop
        out[s] = tuple(sorted({out.get(c, (c,))[0] for c in cs}))
    return out


def build_canonical_map_local(alias_rows) -> dict[str, tuple[str, ...]]:
    """Driver-side oracle twin of :func:`build_canonical_map` (tests assert
    both agree): transitive, cycle-safe resolution of alias targets."""
    equiv, splits = split_alias_rows(alias_rows)
    parent = dict(equiv)

    def resolve(x: str) -> str:
        seen = set()
        while x in parent and x not in seen:
            seen.add(x)
            x = parent[x]
        return x

    out = {s: (resolve(s),) for s, _ in equiv}
    out = {s: v for s, v in out.items() if (v[0],) != (s,)}
    for s, cs in splits.items():
        out[s] = tuple(sorted({resolve(c) for c in cs}))
    return out


class MentionRewriter:
    """Actor-pool callable: rewrites mention-triple objects through the
    canonical map; multi-target forms explode into one triple per canonical.
    Vectorized gather: unique -> per-unique target lists -> flat gather."""

    def __init__(self, canon_map_ref):
        self.cmap = (ray.get(canon_map_ref)
                     if isinstance(canon_map_ref, ray.ObjectRef) else canon_map_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        objs = pc.replace_substring(batch["obj"].combine_chunks(),
                                    MENTION_PREFIX, "").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(objs, return_inverse=True)
        canon_lists = [self.cmap.get(u, (u,)) for u in uniq]
        counts_u = np.array([len(c) for c in canon_lists], dtype=np.int64)
        flat = np.array([c for lst in canon_lists for c in lst], dtype=object)
        starts_u = np.cumsum(counts_u) - counts_u
        row_counts = counts_u[inv]
        total = int(row_counts.sum())
        row_idx = np.repeat(np.arange(len(objs)), row_counts)
        row_starts = np.cumsum(row_counts) - row_counts
        offsets = np.arange(total) - np.repeat(row_starts, row_counts)
        flat_pos = np.repeat(starts_u[inv], row_counts) + offsets
        canons_out = flat[flat_pos]

        taken = batch.take(pa.array(row_idx))
        new_obj = pc.binary_join_element_wise(
            MENTION_PREFIX, pa.array(canons_out.astype(str), pa.string()), "")
        cols = {name: taken[name] for name in taken.schema.names}
        cols["obj"] = new_obj
        return pa.table(cols, schema=TRIPLE_SCHEMA)


def canonicalize_mentions(mention_ds: ray.data.Dataset,
                          canon_map: dict[str, tuple[str, ...]],
                          concurrency: int | None = None) -> ray.data.Dataset:
    """Broadcast the canonical map once; rewrite runs as STATELESS tasks
    through the worker-level broadcast cache (one map deserialize per
    worker, no actor-pool startup tail — see functions.broadcast)."""
    del concurrency
    from ..functions.broadcast import cached_object
    ref = ray.put(MentionRewriter(canon_map))

    def rewrite(batch):
        return cached_object(ref)(batch)

    return mention_ds.map_batches(
        rewrite, batch_format="pyarrow",
        batch_size=16384, zero_copy_batch=True)
