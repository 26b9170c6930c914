"""Stage 2 — mention detection over turn text.

Analog of the reference's category extraction: each business record's
``categories`` string is split and each category becomes a sanitized IRI plus
a membership triple (``create_yelp_nt_files.py:86-108``). Transcript text has
no delimiter, so the detector scans for a controlled vocabulary of surface
forms (``vocab.parquet``: surface_form -> canonical form(s), pre-exploded for
compounds — the split-table analog of ``manually_split_categories.csv``,
``category_mappings.py:25-28``).

Detection spec (shared with the DuckDB oracle): turn mentions surface ``s``
iff ``lower(s)`` is a substring of ``lower(text)``.

Execution shape: a *stateful actor pool* — the vocabulary is loaded from the
broadcast object store ref once per actor in ``__init__`` (never re-shipped
per batch), then each batch does one vectorized ``pc.match_substring`` pass
per surface form (RE2-free fast substring scan). ~N_vocab passes per batch of
C++ kernels; for vocabularies beyond ~10k forms swap the inner loop for an
Aho-Corasick automaton built in ``__init__`` — the stage signature doesn't
change (documented scale path).

The detector emits the *normalized raw surface form* (``mention/<norm>``);
mapping norms to canonical forms is the canonicalization stage's job
(``stages/canonicalize.py``) — mirroring the reference's order: extract
surface categories first (``create_yelp_nt_files.py:86-108``), canonicalize
via split/singularize tables afterwards (``category_mappings.py:10-34``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .. import config as C
from ..functions import iri
from ..functions.normalize import normalize_one
from .extract import TRIPLE_SCHEMA


class AhoCorasick:
    """Multi-pattern substring automaton (classic goto/fail/output BFS
    build). One O(len(text)) scan finds ALL patterns present regardless of
    vocabulary size — the scale path for >~512-surface vocabularies, where
    the per-surface ``pc.match_substring`` loop's O(vocab) passes per batch
    stop being competitive. Output sets are merged along fail links at build
    time, so scanning is a dict hop + set union per character."""

    def __init__(self, patterns: list[str]):
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[set[int]] = [set()]
        for pi, p in enumerate(patterns):
            st = 0
            for ch in p:
                nxt = self.goto[st].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append(set())
                    nxt = len(self.goto) - 1
                    self.goto[st][ch] = nxt
                st = nxt
            self.out[st].add(pi)
        from collections import deque
        self.fail = [0] * len(self.goto)
        q = deque(self.goto[0].values())
        while q:
            st = q.popleft()
            for ch, nxt in self.goto[st].items():
                q.append(nxt)
                f = self.fail[st]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.goto[f].get(ch, 0) \
                    if self.goto[f].get(ch, 0) != nxt else 0
                self.out[nxt] |= self.out[self.fail[nxt]]

    def scan(self, text: str) -> set[int]:
        """Indices of every pattern occurring as a substring of ``text``."""
        st, found = 0, set()
        goto, fail, out = self.goto, self.fail, self.out
        for ch in text:
            while st and ch not in goto[st]:
                st = fail[st]
            st = goto[st].get(ch, 0)
            if out[st]:
                found |= out[st]
        return found


# vocabulary size above which MentionDetector builds the automaton instead
# of looping pc.match_substring per surface (O(vocab) C passes per batch)
AC_VOCAB_THRESHOLD = 512


class MentionDetector:
    """Actor-pool callable: vocab loaded once per actor (SURVEY.md ST1-style).

    Two equivalent engines chosen by vocabulary size (equality asserted in
    tests): per-surface vectorized substring passes (small vocab — each pass
    is one C kernel over the whole batch), or one Aho-Corasick automaton
    built in ``__init__`` and scanned once per text (large vocab — cost
    independent of vocabulary size)."""

    def __init__(self, vocab_ref, force_engine: str | None = None):
        surfaces = ray.get(vocab_ref) if isinstance(vocab_ref, ray.ObjectRef) else vocab_ref
        # (lowercase search pattern, normalized form) — sorted for determinism
        self.patterns = sorted({(s.lower(), normalize_one(s.lower()))
                                for s in surfaces})
        use_ac = (len(self.patterns) > AC_VOCAB_THRESHOLD
                  if force_engine is None else force_engine == "ac")
        self.ac = AhoCorasick([s for s, _ in self.patterns]) if use_ac else None

    def _match_ac(self, lower: pa.Array) -> tuple[list[int], list[str]]:
        idxs: list[int] = []
        norms: list[str] = []
        pat = self.patterns
        for i, txt in enumerate(lower.to_pylist()):
            for pi in sorted(self.ac.scan(txt)):
                idxs.append(i)
                norms.append(pat[pi][1])
        return idxs, norms

    def __call__(self, batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch["text"]).combine_chunks()
        conv, tidx = batch["conv_id"], batch["turn_idx"]
        turn = iri.turn_iri(conv, tidx)
        if self.ac is not None:
            idxs, norms = self._match_ac(lower)
            if not idxs:
                return TRIPLE_SCHEMA.empty_table()
            take = pa.array(idxs, pa.int64())
            tbl = pa.table({
                "subj": turn.take(take) if not isinstance(turn, pa.ChunkedArray)
                else turn.combine_chunks().take(take),
                "canon": pa.array(norms, pa.string()),
                "src_conv_id": conv.combine_chunks().take(take)
                if isinstance(conv, pa.ChunkedArray) else conv.take(take),
                "src_turn_idx": tidx.combine_chunks().take(take)
                if isinstance(tidx, pa.ChunkedArray) else tidx.take(take)})
            return self._finalize(tbl)
        out_turn, out_canon, out_conv, out_tidx = [], [], [], []
        for surface, norm in self.patterns:
            mask = pc.match_substring(lower, surface)
            if not pc.any(mask).as_py():
                continue
            t_sel = pc.filter(turn, mask)
            out_turn.append(t_sel)
            out_canon.append(pa.nulls(len(t_sel), pa.string()).fill_null(norm))
            out_conv.append(pc.filter(conv, mask))
            out_tidx.append(pc.filter(tidx, mask))
        if not out_turn:
            return TRIPLE_SCHEMA.empty_table()
        subj = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                                 for a in out_turn])
        canon = pa.concat_arrays(out_canon)
        conv_l = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                                   for a in out_conv])
        tidx_l = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                                   for a in out_tidx])
        tbl = pa.table({
            "subj": subj, "canon": canon,
            "src_conv_id": conv_l, "src_turn_idx": tidx_l})
        return self._finalize(tbl)

    def _finalize(self, tbl: pa.Table) -> pa.Table:
        # batch-local dedup of (turn, canonical): several vocab entries can hit
        # the same canonical in one turn (e.g. "coffee" and "coffees")
        tbl = tbl.group_by(["subj", "canon", "src_conv_id", "src_turn_idx"],
                           use_threads=False).aggregate([])
        n = tbl.num_rows
        return pa.table({
            "subj": tbl["subj"],
            "pred": pa.nulls(n, pa.string()).fill_null(C.PRED_MENTIONS),
            "obj": iri.mention_iri(tbl["canon"]),
            "obj_is_literal": pa.nulls(n, pa.bool_()).fill_null(False),
            "obj_datatype": pa.nulls(n, pa.string()),
            "src_conv_id": tbl["src_conv_id"],
            "src_turn_idx": tbl["src_turn_idx"],
        }, schema=TRIPLE_SCHEMA)


def load_vocab_surfaces(fixture_dir: str) -> list[str]:
    """Distinct detection surface forms (the vocab table's key column)."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{fixture_dir}/vocab.parquet", columns=["surface_form"])
    return sorted(set(t["surface_form"].to_pylist()))


def mention_triples(transcripts: ray.data.Dataset, vocab: list[str],
                    concurrency: int | None = None) -> ray.data.Dataset:
    """Detect mentions; returns triples Dataset (turn -mentions-> mention IRI).

    ``vocab`` is put in the object store ONCE; each actor reads it in
    ``__init__`` — broadcast, not per-batch shipping.
    """
    if concurrency is None:
        concurrency = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
    vocab_ref = ray.put(vocab)
    return transcripts.map_batches(
        MentionDetector, fn_constructor_args=(vocab_ref,),
        batch_format="pyarrow", batch_size=8192, zero_copy_batch=True,
        concurrency=(1, concurrency))


def mention_entity_triples(mention_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-mention class + label triples, deduped (ST3 cache analog -> global
    dedup via groupby, SURVEY.md §2.7)."""
    def expand(batch: pa.Table) -> pa.Table:
        # batch rows are mention triples; derive distinct mention IRIs locally
        objs = pc.unique(batch["obj"].combine_chunks())
        canon = pc.replace_substring(objs, C.ENT + "mention/", "")
        n = len(objs)
        const = lambda s: pa.nulls(n, pa.string()).fill_null(s)  # noqa: E731
        boolf = pa.nulls(n, pa.bool_()).fill_null(False)
        boolt = pa.nulls(n, pa.bool_()).fill_null(True)
        t1 = pa.table({"subj": objs, "pred": const(C.RDF_TYPE),
                       "obj": const(C.CLASS_MENTION), "obj_is_literal": boolf,
                       "obj_datatype": pa.nulls(n, pa.string()),
                       "src_conv_id": pa.nulls(n, pa.string()),
                       "src_turn_idx": pa.nulls(n, pa.int32())}, schema=TRIPLE_SCHEMA)
        t2 = pa.table({"subj": objs, "pred": const(C.RDFS_LABEL),
                       "obj": canon, "obj_is_literal": boolt,
                       "obj_datatype": const(C.XSD_STRING),
                       "src_conv_id": pa.nulls(n, pa.string()),
                       "src_turn_idx": pa.nulls(n, pa.int32())}, schema=TRIPLE_SCHEMA)
        return pa.concat_tables([t1, t2])
    return mention_ds.map_batches(expand, batch_format="pyarrow",
                                  zero_copy_batch=True)
