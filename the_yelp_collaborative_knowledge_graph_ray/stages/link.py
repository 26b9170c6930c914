"""Stage 4 — entity linking against an offline external-KG snapshot.

Reference semantics (SURVEY.md §3.2, ST1): the category->Schema.org mapper
embeds *all* Yelp categories and *all* Schema labels with a
SentenceTransformer, computes the full cosine matrix, takes row-wise argmax
over a threshold (``category_mappings.py:65-103``), and lets a
manually-verified CSV override the scored mappings (``README.md:55``); the
Wikidata mapping queries a remote endpoint per type
(``create_schema_wiki_mapping.py:16-84``).

Scale re-design (per ``BASELINE.json north_star``): all-pairs is quadratic
and remote endpoints don't exist at 10^12 turns, so:

1. **Candidate generation (blocking)** — char n-gram blocking: a mention and
   an entity label are candidates iff they share >=1 character 3-gram of
   their normalized forms. The entity index (ngram -> entity rows) is built
   ONCE per actor from a broadcast snapshot (``ray.put`` on the driver).
2. **Scoring** — deterministic feature-hashed char-ngram embeddings
   (dim=``EMBED_DIM``), cosine via one numpy matmul per batch against the
   candidate matrix. This is the container-safe stand-in for a transformer
   bi-encoder: the actor-pool plumbing (model "loaded" in ``__init__``,
   batched matmul in ``__call__``) is exactly the production shape — swap
   ``_embed`` for a real encoder and nothing else changes.
3. **Decision** — top-1 by (score desc, entity_id asc) with
   score >= ``LINK_THRESHOLD``; rows in ``manual_overrides`` win regardless
   of score (reference's manual-CSV precedence).

Input: the distinct canonical mention forms (dedup-before-expensive-work,
the reference's geocode-memo pattern ST5 made distributed via groupby).
Output: (mention IRI, schema:sameAs, wd:QID) triples.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .. import config as C
from ..functions.normalize import normalize_one
from .extract import TRIPLE_SCHEMA


def _ngrams(s: str, n: int = C.NGRAM_N) -> set[str]:
    padded = f"#{s}#"
    if len(padded) < n:
        return {padded}
    return {padded[i:i + n] for i in range(len(padded) - n + 1)}


def _embed(strings: list[str], dim: int = C.EMBED_DIM) -> np.ndarray:
    """Deterministic char-ngram feature-hashing embedder, L2-normalized.

    Uses zlib.crc32 (stable across processes, unlike builtin str hash) for
    the feature index and a sign bit — the classic hashing trick.
    """
    import zlib
    out = np.zeros((len(strings), dim), dtype=np.float32)
    for i, s in enumerate(strings):
        for g in _ngrams(s):
            h = zlib.crc32(g.encode("utf-8"))
            idx = (h >> 1) % dim
            sign = 1.0 if (h & 1) else -1.0
            out[i, idx] += sign
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


class EntitySnapshot:
    """Driver-built, broadcast-once snapshot index: entities + overrides."""

    def __init__(self, entity_rows: list[tuple[str, str, list[str]]],
                 overrides: dict[str, str]):
        # entity_rows: (entity_id, label, aliases)
        names, ids = [], []
        for eid, label, aliases in entity_rows:
            for name in [label] + list(aliases or []):
                names.append(normalize_one(name))
                ids.append(eid)
        order = np.argsort(np.array(ids, dtype=object), kind="stable")
        self.names = [names[i] for i in order]
        self.entity_ids = [ids[i] for i in order]
        self.vectors = _embed(self.names)
        self.block_index: dict[str, list[int]] = {}
        for j, name in enumerate(self.names):
            for g in _ngrams(name):
                self.block_index.setdefault(g, []).append(j)
        self.overrides = dict(overrides)


class LinkScorer:
    """Actor-pool callable over batches of distinct mention forms.

    ``__init__`` cost (snapshot fetch + nothing else; index prebuilt on the
    driver and shared via object store) is paid once per actor, not per batch.
    """

    def __init__(self, snapshot_ref):
        self.snap: EntitySnapshot = (
            ray.get(snapshot_ref) if isinstance(snapshot_ref, ray.ObjectRef)
            else snapshot_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        forms = batch["form"].to_pylist()
        snap = self.snap
        out_form, out_eid = [], []
        # candidate generation per form (union of ngram postings), then one
        # vectorized dot product per form against its candidate sub-matrix
        vecs = _embed(forms)
        for i, form in enumerate(forms):
            if form in snap.overrides:
                out_form.append(form)
                out_eid.append(snap.overrides[form])
                continue
            cand: set[int] = set()
            for g in _ngrams(form):
                cand.update(snap.block_index.get(g, ()))
            if not cand:
                continue
            idx = np.fromiter(cand, dtype=np.int64)
            idx.sort()  # deterministic candidate order
            scores = snap.vectors[idx] @ vecs[i]
            best_pos = int(np.argmax(scores))  # first max -> lowest row index
            # tie-break: among equal scores pick smallest entity_id
            best_score = scores[best_pos]
            if best_score < C.LINK_THRESHOLD:
                continue
            ties = idx[scores >= best_score - 1e-7]
            best_eid = min(snap.entity_ids[j] for j in ties)
            out_form.append(form)
            out_eid.append(best_eid)
        return pa.table({
            "form": pa.array(out_form, pa.string()),
            "entity_id": pa.array(out_eid, pa.string())})


def link_mentions(canonical_mentions: ray.data.Dataset,
                  snapshot: EntitySnapshot,
                  concurrency: int | None = None) -> ray.data.Dataset:
    """canonical_mentions: triples Dataset after canonicalization. Returns
    sameAs triples for linkable canonical forms.

    Dedup-before-score: ``groupby(form)`` first so the scorer sees each
    distinct form once — at 10^12 turns the distinct-mention set is orders of
    magnitude smaller than the mention stream.
    """
    import pyarrow.compute as pc

    from ..functions.grouped import sorted_aggregate

    def to_forms(b: pa.Table) -> pa.Table:
        # per-block pre-dedup: only distinct forms leave the block (at 10^12
        # turns the distinct set per block is tiny vs the mention stream)
        return pa.table({"form": pc.unique(pc.replace_substring(
            b["obj"].combine_chunks(), C.ENT + "mention/", ""))})

    forms = canonical_mentions.map_batches(to_forms, batch_format="pyarrow",
                                           zero_copy_batch=True)
    distinct = sorted_aggregate(forms, ["form"], [("form", "count")],
                                ["form", "n"])
    if concurrency is None:
        concurrency = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
    ref = ray.put(snapshot)
    links = distinct.map_batches(
        LinkScorer, fn_constructor_args=(ref,), batch_format="pyarrow",
        batch_size=4096, concurrency=(1, concurrency))

    def to_triples(b: pa.Table) -> pa.Table:
        n = b.num_rows
        const = lambda s: pa.nulls(n, pa.string()).fill_null(s)  # noqa: E731
        return pa.table({
            "subj": pc.binary_join_element_wise(C.ENT + "mention/", b["form"], ""),
            "pred": const(C.PRED_SAME_AS),
            "obj": pc.binary_join_element_wise(C.WD, b["entity_id"], ""),
            "obj_is_literal": pa.nulls(n, pa.bool_()).fill_null(False),
            "obj_datatype": pa.nulls(n, pa.string()),
            "src_conv_id": pa.nulls(n, pa.string()),
            "src_turn_idx": pa.nulls(n, pa.int32()),
        }, schema=TRIPLE_SCHEMA)

    return links.map_batches(to_triples, batch_format="pyarrow")


def load_snapshot(fixture_dir: str) -> EntitySnapshot:
    import pyarrow.parquet as pq
    ents = pq.read_table(f"{fixture_dir}/entities.parquet")
    rows = list(zip(ents["entity_id"].to_pylist(), ents["label"].to_pylist(),
                    ents["aliases"].to_pylist()))
    ov = pq.read_table(f"{fixture_dir}/manual_overrides.parquet")
    overrides = dict(zip(ov["surface_norm"].to_pylist(),
                         ov["entity_id"].to_pylist()))
    return EntitySnapshot(rows, overrides)
