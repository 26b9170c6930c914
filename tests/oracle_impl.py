"""Slow, obviously-correct single-process oracle of the full KG semantics.

Independent re-implementation (plain Python dicts/sets over the fixture
parquet, one record at a time — deliberately the reference's execution style,
``create_yelp_nt_files.py:50-181``) used to compute triple-set P/R of the Ray
pipeline (acceptance: P/R >= 0.95, BASELINE.json north_rule).
"""

from __future__ import annotations

import pyarrow.parquet as pq

from the_yelp_collaborative_knowledge_graph_ray import config as C
from the_yelp_collaborative_knowledge_graph_ray.functions.normalize import (
    normalize_one,
)


def oracle_triples(fixture_dir: str) -> set[tuple[str, str, str]]:
    t = pq.read_table(f"{fixture_dir}/transcripts.parquet").to_pylist()
    vocab_t = pq.read_table(f"{fixture_dir}/vocab.parquet")
    vocab = list(zip(vocab_t["surface_form"].to_pylist(),
                     vocab_t["canonical"].to_pylist()))
    ents = pq.read_table(f"{fixture_dir}/entities.parquet").to_pylist()
    ov = pq.read_table(f"{fixture_dir}/manual_overrides.parquet").to_pylist()
    th = pq.read_table(f"{fixture_dir}/type_hierarchy.parquet").to_pylist()

    triples: set[tuple[str, str, str]] = set()
    none_vals = set(C.NONE_VALUES)
    canonicals_seen: set[str] = set()

    for row in t:
        turn = f"{C.ENT}turn/{row['conv_id']}/{row['turn_idx']}"
        conv = f"{C.ENT}conversation/{row['conv_id']}"
        triples.add((turn, C.RDF_TYPE, C.CLASS_TURN))
        triples.add((turn, C.PRED_IS_PART_OF, conv))
        triples.add((conv, C.RDF_TYPE, C.CLASS_CONVERSATION))
        triples.add((turn, C.PRED_POSITION, str(row["turn_idx"])))
        triples.add((turn, C.PRED_ROLE, row["role"]))
        triples.add((turn, C.PRED_DATE_CREATED,
                     row["ts"].strftime("%Y-%m-%dT%H:%M:%S")))
        triples.add((turn, C.PRED_TEXT, row["text"]))
        tool = row["tool"]
        if tool is not None and tool not in none_vals:
            tool_iri = C.ENT + "tool/" + normalize_one(tool)
            triples.add((turn, C.PRED_USES_TOOL, tool_iri))
            triples.add((tool_iri, C.RDF_TYPE, C.CLASS_TOOL))
        low = row["text"].lower()
        for surface, canonical in vocab:
            if surface in low:
                triples.add((turn, C.PRED_MENTIONS,
                             C.ENT + "mention/" + canonical))
                canonicals_seen.add(canonical)

    for c in canonicals_seen:
        triples.add((C.ENT + "mention/" + c, C.RDF_TYPE, C.CLASS_MENTION))
        triples.add((C.ENT + "mention/" + c, C.RDFS_LABEL, c))

    # exact-match linking with override precedence
    names: dict[str, set[str]] = {}
    etype: dict[str, str] = {}
    for e in ents:
        etype[e["entity_id"]] = e["type_id"]
        names.setdefault(normalize_one(e["label"]), set()).add(e["entity_id"])
        for a in e["aliases"] or []:
            names.setdefault(normalize_one(a), set()).add(e["entity_id"])
    overrides = {r["surface_norm"]: r["entity_id"] for r in ov}
    linked: set[str] = set()
    for c in canonicals_seen:
        eid = overrides.get(c) or (min(names[c]) if c in names else None)
        if eid:
            triples.add((C.ENT + "mention/" + c, C.PRED_SAME_AS, C.WD + eid))
            linked.add(eid)

    parents: dict[str, set[str]] = {}
    for r in th:
        parents.setdefault(r["type_id"], set()).add(r["super_type_id"])

    def ancestors(x, seen=None):
        seen = seen or set()
        out = set()
        for p in parents.get(x, ()):
            if p not in seen:
                seen.add(p)
                out.add(p)
                out |= ancestors(p, seen)
        return out

    for eid in linked:
        ty = etype[eid]
        triples.add((C.WD + eid, C.PRED_INSTANCE_OF, C.ENT + "type/" + ty))
        for anc in ancestors(ty):
            triples.add((C.ENT + "type/" + ty, C.RDFS_SUBCLASS_OF,
                         C.ENT + "type/" + anc))
    return triples
