"""Stage 5 — type-hierarchy enrichment (Schema.org lattice analog).

The reference loads the full Schema.org type CSV into a ``networkx.DiGraph``
and DFS-walks it from every *mapped* type, emitting ``rdfs:subClassOf``
triples for the transitive supertype closure
(``Code/create_schema_nt_files.py:14-34``, ``schema_functions.py:105-138``).

The type lattice is genuinely tiny (thousands of rows even for all of
Schema.org), so the closure is precomputed on the driver with a plain BFS
(no networkx dependency) and broadcast; what is *distributed* is the
restriction to types actually reachable from linked entities — a groupby
over the link Dataset. Emits:

  (wd:QID, yckg:instanceOf, ENT:type/<type_id>)       per linked entity
  (ENT:type/<t>, rdfs:subClassOf, ENT:type/<super>)   transitive closure,
                                                      restricted to used types
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .. import config as C
from .extract import TRIPLE_SCHEMA

TYPE_PREFIX = C.ENT + "type/"


def type_closure(edges: list[tuple[str, str]]) -> dict[str, set[str]]:
    """type_id -> set of all transitive supertypes (driver-side BFS;
    multi-parent DAG safe, cycle safe)."""
    parents: dict[str, set[str]] = {}
    for t, sup in edges:
        parents.setdefault(t, set()).add(sup)
    closure: dict[str, set[str]] = {}

    def walk(t: str) -> set[str]:
        if t in closure:
            return closure[t]
        closure[t] = set()  # cycle guard
        acc: set[str] = set()
        for p in parents.get(t, ()):
            acc.add(p)
            acc |= walk(p)
        closure[t] = acc
        return acc

    for t in parents:
        walk(t)
    return closure


def enrichment_triples(links: ray.data.Dataset,
                       entity_types: dict[str, str],
                       hierarchy_edges: list[tuple[str, str]]) -> ray.data.Dataset:
    """links: (form, entity_id) Dataset from the scorer. entity_types and the
    hierarchy are broadcast small sides (curated config tables)."""
    closure = type_closure(hierarchy_edges)
    etypes_ref = ray.put(entity_types)
    closure_ref = ray.put({t: sorted(s) for t, s in closure.items()})

    class Expand:
        def __init__(self):
            self.etypes = ray.get(etypes_ref)
            self.closure = ray.get(closure_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            eids = pc.unique(b["entity_id"].combine_chunks()).to_pylist()
            inst_s, inst_o = [], []
            sub_s, sub_o = [], []
            seen_types = set()
            for eid in sorted(eids):
                t = self.etypes.get(eid)
                if t is None:
                    continue
                inst_s.append(C.WD + eid)
                inst_o.append(TYPE_PREFIX + t)
                if t not in seen_types:
                    seen_types.add(t)
                    for sup in self.closure.get(t, ()):
                        sub_s.append(TYPE_PREFIX + t)
                        sub_o.append(TYPE_PREFIX + sup)
            def mk(s, p, o):
                n = len(s)
                return pa.table({
                    "subj": pa.array(s, pa.string()),
                    "pred": pa.nulls(n, pa.string()).fill_null(p),
                    "obj": pa.array(o, pa.string()),
                    "obj_is_literal": pa.nulls(n, pa.bool_()).fill_null(False),
                    "obj_datatype": pa.nulls(n, pa.string()),
                    "src_conv_id": pa.nulls(n, pa.string()),
                    "src_turn_idx": pa.nulls(n, pa.int32()),
                }, schema=TRIPLE_SCHEMA)
            return pa.concat_tables([mk(inst_s, C.PRED_INSTANCE_OF, inst_o),
                                     mk(sub_s, C.RDFS_SUBCLASS_OF, sub_o)])

    from ..functions.broadcast import broadcast_map_batches
    return broadcast_map_batches(links, Expand, batch_format="pyarrow")
