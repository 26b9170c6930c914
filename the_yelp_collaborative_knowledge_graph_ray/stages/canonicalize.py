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
3. **Rewrite** — two interchangeable paths (SURVEY §7: "broadcast or
   shuffle join depending on map size"), equality pytest-pinned:

   * *broadcast* (:func:`canonicalize_mentions`) — the map is ``ray.put``
     once and mention triples are rewritten as stateless tasks with fully
     vectorized gather/explode. Right while the map is dictionary-sized
     (curated alias table + observed vocabulary — the present corpora).
   * *shuffle* (:func:`canonicalize_mentions_shuffle`) — the map is a
     ``(surface_norm, canonical)`` Dataset and the rewrite is ONE sorted
     co-group on the form key (the engine's join machinery), so a map too
     large for any single node's memory never exists as a driver dict or
     a broadcast object at all.

   :func:`canonicalize_mentions_auto` threshold-selects between them.
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


def canon_map_to_dataset(canon_map: dict[str, tuple[str, ...]]
                         ) -> ray.data.Dataset:
    """Flatten a canonical map into its ``(surface_norm, canonical)`` row
    form — the shuffle path's input (at true scale this Dataset would come
    straight from the clustering stage, never through a driver dict)."""
    s, c = [], []
    for form, targets in canon_map.items():
        for t in targets:
            s.append(form)
            c.append(t)
    return ray.data.from_arrow(pa.table({
        "surface_norm": pa.array(s, pa.string()),
        "canonical": pa.array(c, pa.string())}))


def canonicalize_mentions_shuffle(mention_ds: ray.data.Dataset,
                                  canon_map_ds: ray.data.Dataset,
                                  num_partitions: int = 8
                                  ) -> ray.data.Dataset:
    """Shuffle-join rewrite — the scale path for canonical maps too large
    to broadcast: mention triples and map rows meet in ONE sorted co-group
    on the surface-form key (``functions/grouped.sorted_group_apply`` —
    the same machinery every engine join uses). Within a group each
    mention row explodes into one triple per canonical target (targets in
    ascending order, matching the broadcast path's sorted tuples); forms
    absent from the map pass through unchanged. Output is row-identical to
    :func:`canonicalize_mentions` (pytest-pinned)."""
    from ..functions.grouped import group_ids, sorted_group_apply

    u_schema = pa.schema([("__k", pa.string()), ("__c", pa.string())]
                         + [(f.name, f.type) for f in TRIPLE_SCHEMA])

    def from_mentions(b: pa.Table) -> pa.Table:
        form = pc.replace_substring(
            pc.cast(b["obj"], pa.string()), MENTION_PREFIX, "")
        cols = {"__k": form, "__c": pa.nulls(b.num_rows, pa.string())}
        for f in TRIPLE_SCHEMA:
            cols[f.name] = pc.cast(b[f.name], f.type)
        return pa.table(cols, schema=u_schema)

    def from_map(b: pa.Table) -> pa.Table:
        cols = {"__k": pc.cast(b["surface_norm"], pa.string()),
                "__c": pc.cast(b["canonical"], pa.string())}
        for f in TRIPLE_SCHEMA:
            cols[f.name] = pa.nulls(b.num_rows, f.type)
        return pa.table(cols, schema=u_schema)

    u = mention_ds.map_batches(from_mentions, batch_format="pyarrow") \
        .union(canon_map_ds.map_batches(from_map, batch_format="pyarrow"))

    def cogroup(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return TRIPLE_SCHEMA.empty_table()
        gid, _ = group_ids(b, ["__k"])
        cvals = b["__c"].combine_chunks()
        is_map = pc.is_valid(cvals).to_numpy(zero_copy_only=False)
        n_groups = int(gid[-1]) + 1
        midx = np.flatnonzero(is_map)
        mg = gid[midx]
        mtargets = cvals.take(pa.array(midx)) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((mtargets, mg))   # targets ascending per group
        mg, mtargets = mg[order], mtargets[order]
        nmap = np.bincount(mg, minlength=n_groups).astype(np.int64)
        map_start = np.cumsum(nmap) - nmap
        men_idx = np.flatnonzero(~is_map)
        if len(men_idx) == 0:
            return TRIPLE_SCHEMA.empty_table()
        men_g = gid[men_idx]
        cnt = np.maximum(nmap[men_g], 1)
        total = int(cnt.sum())
        row_idx = np.repeat(men_idx, cnt)
        row_starts = np.cumsum(cnt) - cnt
        offs = np.arange(total) - np.repeat(row_starts, cnt)
        has = np.repeat(nmap[men_g] > 0, cnt)
        tpos = np.repeat(map_start[men_g], cnt) + offs
        taken = b.take(pa.array(row_idx))
        tgt = taken["__k"].combine_chunks() \
            .to_numpy(zero_copy_only=False).copy()
        tgt[has] = mtargets[tpos[has]]
        new_obj = pc.binary_join_element_wise(
            MENTION_PREFIX, pa.array(tgt.astype(str), pa.string()), "")
        cols = {f.name: taken[f.name] for f in TRIPLE_SCHEMA}
        cols["obj"] = new_obj
        return pa.table(cols, schema=TRIPLE_SCHEMA)

    return sorted_group_apply(u, ["__k"], cogroup, num_partitions)


# Broadcast-vs-shuffle selection threshold for the rewrite: flat map
# entries (form->target pairs). ~1M string pairs is ~100 MB broadcast —
# comfortably under a worker heap; beyond it the co-group path wins.
CANON_BROADCAST_MAX = 1 << 20


def canonicalize_mentions_auto(mention_ds: ray.data.Dataset,
                               canon_map: dict[str, tuple[str, ...]],
                               concurrency: int | None = None,
                               num_partitions: int = 8,
                               max_broadcast: int = CANON_BROADCAST_MAX
                               ) -> ray.data.Dataset:
    """SURVEY §7's "broadcast or shuffle join depending on map size":
    dictionary-sized maps take the broadcast rewrite, oversized ones the
    sorted co-group — same output either way (pytest equality)."""
    total = sum(len(v) for v in canon_map.values())
    if total <= max_broadcast:
        return canonicalize_mentions(mention_ds, canon_map, concurrency)
    return canonicalize_mentions_shuffle(
        mention_ds, canon_map_to_dataset(canon_map), num_partitions)
