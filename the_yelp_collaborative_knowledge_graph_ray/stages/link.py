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
import pyarrow.compute as pc

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


def _embed_scalar(strings: list[str], dim: int = C.EMBED_DIM) -> np.ndarray:
    """Per-string reference implementation of the hashing-trick embedder
    (kept for the bitwise-parity pytest; the pipeline path is the
    batch-vectorized :func:`_embed`)."""
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


def _embed(strings, dim: int = C.EMBED_DIM) -> np.ndarray:
    """Deterministic char-ngram feature-hashing embedder, L2-normalized.

    Batch-vectorized: grams via the Arrow slice kernels of
    :func:`_batch_grams`, per-string DISTINCT grams via dictionary codes +
    ``np.unique`` (matching the set semantics of :func:`_ngrams`), crc32
    only over the batch's gram DICTIONARY, accumulation with one
    ``np.add.at``. Bitwise identical to :func:`_embed_scalar` — the ±1
    accumulands are small integers, exact in float32 under any order —
    asserted in tests. crc32 is process-stable (builtin ``hash`` is not).
    """
    import zlib
    col = strings if isinstance(strings, (pa.Array, pa.ChunkedArray)) \
        else pa.array(list(strings), pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = np.zeros((len(col), dim), dtype=np.float32)
    rows, grams = _batch_grams(col)
    if len(rows):
        dic = grams.dictionary_encode()
        codes = dic.indices.to_numpy().astype(np.int64)
        V = max(len(dic.dictionary), 1)
        key = np.unique(rows * V + codes)  # per-string distinct grams
        r, c = key // V, key % V
        h = np.fromiter((zlib.crc32(g.encode("utf-8"))
                         for g in dic.dictionary.to_pylist()),
                        dtype=np.int64, count=len(dic.dictionary))
        idx = (h >> 1) % dim
        sign = np.where(h & 1, np.float32(1.0), np.float32(-1.0))
        np.add.at(out, (r, idx[c]), sign[c])
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


def get_encoder(name: str | None = None):
    """Encoder registry — the ST1 real-model seam. Interface: callable
    ``(list[str]) -> L2-normalized float32 (n, d)``.

    * ``"hashed"`` (default, ``config.LINK_ENCODER``): the deterministic
      char-ngram feature-hashing embedder above — container-safe stand-in.
    * ``"transformer"``: a real SentenceTransformer bi-encoder
      (``category_mappings.py:77`` uses one) when ``sentence_transformers``
      is importable; the swap is this one config flag — snapshot build and
      scorer both go through this registry, nothing else changes.
    * ``"mini_transformer"``: the VENDORED pure-numpy transformer
      (``stages/mini_encoder.py`` — seeded weights, real attention/FFN/LN
      forward pass), so the transformer lane runs and is parity-tested
      OFFLINE in this container (round 5; the sentence_transformers wheel
      has never been installable here). Linking quality under each lane
      is measured in BASELINE.md "encoder lanes"."""
    name = name or C.LINK_ENCODER
    if name == "hashed":
        return _embed
    if name == "mini_transformer":
        from .mini_encoder import mini_encoder
        return mini_encoder()
    if name == "transformer":
        from sentence_transformers import SentenceTransformer  # import-guarded
        model = SentenceTransformer("all-MiniLM-L6-v2")

        def enc(strings: list[str], dim: int | None = None) -> np.ndarray:
            return np.asarray(
                model.encode(list(strings), normalize_embeddings=True),
                dtype=np.float32)
        return enc
    raise ValueError(f"unknown LINK_ENCODER {name!r}")


class EntitySnapshot:
    """Driver-built, broadcast-once snapshot index: entities + overrides.

    Blocking postings are stored CSR over the EXACT gram vocabulary
    (``gram_vocab`` pa.Array + ``post_off``/``post_rows``) so candidate
    generation is pure gather arithmetic per batch — no per-form Python at
    scoring time even at a 10k+-entity snapshot. Entity ids carry a dense
    rank (``eid_rank``/``eid_by_rank``) for the vectorized min-tie-break,
    and override keys are a sorted array for a vectorized membership probe."""

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
        self.vectors = get_encoder()(self.names)
        # CSR postings: gram -> sorted name rows
        by_gram: dict[str, list[int]] = {}
        for j, name in enumerate(self.names):
            for g in _ngrams(name):
                by_gram.setdefault(g, []).append(j)
        grams = sorted(by_gram)
        self.gram_vocab = pa.array(grams, pa.string())
        cnt = np.array([len(by_gram[g]) for g in grams], np.int64)
        self.post_off = np.concatenate([[0], np.cumsum(cnt)])
        self.post_cnt = cnt
        self.post_rows = (np.concatenate([by_gram[g] for g in grams])
                          if grams else np.empty(0)).astype(np.int64)
        # dense entity-id ranks (string-min tie-break as an int min)
        uniq = sorted(set(self.entity_ids))
        rank = {e: i for i, e in enumerate(uniq)}
        self.eid_rank = np.array([rank[e] for e in self.entity_ids],
                                 np.int64)
        self.eid_by_rank = uniq
        self.overrides = dict(overrides)
        ov = sorted(overrides)
        self.ov_keys = np.array(ov, dtype=object)
        self.ov_vals = [overrides[k] for k in ov]


def _batch_grams(forms_col) -> tuple[np.ndarray, pa.Array]:
    """(row_idx, gram) pairs of every form in the column, vectorized: one
    Arrow slice kernel per gram offset over the '#'-padded column (max form
    length bounds the loop, not row count)."""
    if isinstance(forms_col, pa.ChunkedArray):
        forms_col = forms_col.combine_chunks()
    padded = pc.binary_join_element_wise("#", forms_col, "#", "")
    lens = pc.utf8_length(padded).to_numpy().astype(np.int64)
    max_len = int(lens.max()) if len(lens) else 0
    rows_l, grams_l = [], []
    for off in range(max(max_len - C.NGRAM_N + 1, 0)):
        valid = np.flatnonzero(lens >= off + C.NGRAM_N)
        if len(valid) == 0:
            break
        g = pc.utf8_slice_codeunits(padded, off, off + C.NGRAM_N)
        rows_l.append(valid)
        grams_l.append(g.take(pa.array(valid)))
    short = np.flatnonzero(lens < C.NGRAM_N)  # form "" -> single gram "##"
    if len(short):
        rows_l.append(short)
        grams_l.append(padded.take(pa.array(short)))
    if not rows_l:
        return np.empty(0, np.int64), pa.array([], pa.string())
    return (np.concatenate(rows_l),
            pa.concat_arrays([a.combine_chunks()
                              if isinstance(a, pa.ChunkedArray) else a
                              for a in grams_l]))


class LinkScorer:
    """Actor-pool callable over batches of distinct mention forms.

    ``__init__`` cost (snapshot fetch + nothing else; index prebuilt on the
    driver and shared via object store) is paid once per actor, not per
    batch. Candidate generation is fully vectorized: batch grams via Arrow
    slice kernels, gram ids via one ``index_in`` against the snapshot
    vocabulary, postings expanded with repeat/cumsum gathers, per-row top-1
    + epsilon-tie-break via ``reduceat`` — no per-form Python loop."""

    def __init__(self, snapshot_ref):
        self.snap: EntitySnapshot = (
            ray.get(snapshot_ref) if isinstance(snapshot_ref, ray.ObjectRef)
            else snapshot_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        snap = self.snap
        forms_col = batch["form"]
        forms = forms_col.to_pylist()
        m = len(forms)
        empty = pa.table({"form": pa.array([], pa.string()),
                          "entity_id": pa.array([], pa.string())})
        if m == 0:
            return empty
        # vectorized override membership (overrides win regardless of score)
        fa = np.array(forms, dtype=object)
        if len(snap.ov_keys):
            pos = np.searchsorted(snap.ov_keys, fa)
            posc = np.minimum(pos, len(snap.ov_keys) - 1)
            is_ov = snap.ov_keys[posc] == fa
            ov_pos = posc
        else:
            is_ov = np.zeros(m, bool)
            ov_pos = np.zeros(m, np.int64)
        # (row, gram_id) pairs -> candidate (row, name) pairs by CSR gather
        rows, grams = _batch_grams(forms_col)
        gid = pc.index_in(grams, value_set=snap.gram_vocab)
        ok = pc.is_valid(gid).to_numpy(zero_copy_only=False)
        rows = rows[ok]
        gids = gid.to_numpy(zero_copy_only=False)[ok].astype(np.int64)
        n_grams = len(snap.gram_vocab)
        if len(rows):
            rg = np.unique(rows * n_grams + gids)
            rows, gids = rg // n_grams, rg % n_grams
        ln = snap.post_cnt[gids] if len(rows) else np.empty(0, np.int64)
        tot = int(ln.sum())
        pair_row = np.repeat(rows, ln)
        within = (np.arange(tot, dtype=np.int64)
                  - np.repeat(np.cumsum(ln) - ln, ln))
        pair_name = snap.post_rows[np.repeat(snap.post_off[gids], ln)
                                   + within]
        n_names = len(snap.names)
        if len(pair_row):
            rn = np.unique(pair_row * n_names + pair_name)
            pair_row, pair_name = rn // n_names, rn % n_names
            keep_pair = ~is_ov[pair_row]
            pair_row, pair_name = pair_row[keep_pair], pair_name[keep_pair]
        # score every candidate pair; per-row max + epsilon tie-break.
        # Shape-adaptive scoring: when the dense (batch x names) score
        # matrix is affordable, ONE BLAS matmul + a fancy-index gather
        # (measured 4-6x faster than per-pair elementwise products, whose
        # two gathered (pairs x dim) temporaries are pure memory traffic);
        # for huge snapshots where dense would blow memory, chunked
        # per-pair einsum keeps the peak bounded at ~1M pairs per chunk.
        out_eid_rank = np.full(m, -1, np.int64)
        if len(pair_row):
            vecs = get_encoder()(forms)
            if m * n_names <= 64_000_000:
                scores = (vecs @ snap.vectors.T)[pair_row, pair_name]
            else:
                scores = np.empty(len(pair_row), np.float32)
                for c0 in range(0, len(pair_row), 1_000_000):
                    sl = slice(c0, c0 + 1_000_000)
                    scores[sl] = np.einsum(
                        "ij,ij->i", vecs[pair_row[sl]],
                        snap.vectors[pair_name[sl]])
            starts = np.flatnonzero(np.concatenate(
                [[True], pair_row[1:] != pair_row[:-1]]))
            rmax = np.maximum.reduceat(scores, starts)
            rmax_per_pair = np.repeat(rmax, np.diff(
                np.append(starts, len(pair_row))))
            tie = scores >= rmax_per_pair - 1e-7
            rank = np.where(tie, snap.eid_rank[pair_name],
                            np.iinfo(np.int64).max)
            best_rank = np.minimum.reduceat(rank, starts)
            linked_rows = pair_row[starts][rmax >= C.LINK_THRESHOLD]
            out_eid_rank[linked_rows] = \
                best_rank[rmax >= C.LINK_THRESHOLD]
        # emit in batch order: overrides inline, then scored links
        emit = np.flatnonzero(is_ov | (out_eid_rank >= 0))
        out_form = [forms[i] for i in emit]
        out_eid = [snap.ov_vals[ov_pos[i]] if is_ov[i]
                   else snap.eid_by_rank[out_eid_rank[i]] for i in emit]
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
    del concurrency
    from ..functions.broadcast import cached_object
    # the scorer holds only the prebuilt snapshot index — broadcast the
    # CONSTRUCTED scorer once and score in stateless tasks (worker-level
    # cache; no actor-pool startup tail — see functions.broadcast)
    ref = ray.put(LinkScorer(snapshot))

    def score(batch):
        return cached_object(ref)(batch)

    links = distinct.map_batches(
        score, batch_format="pyarrow", batch_size=4096)

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
