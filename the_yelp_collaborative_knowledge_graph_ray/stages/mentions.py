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
per batch). Two equivalent engines chosen by vocabulary size: one vectorized
``pc.match_substring`` pass per surface form (tiny vocabularies — each pass
is one C kernel over the whole batch), or a dense-table Aho-Corasick
automaton built once per actor and scanned **vectorized across rows** with
numpy (default above ~24 forms; scan cost independent of vocabulary size,
~11x faster than the substring loop at the fixture's 305 forms).

The detector emits the *normalized raw surface form* (``mention/<norm>``);
mapping norms to canonical forms is the canonicalization stage's job
(``stages/canonicalize.py``) — mirroring the reference's order: extract
surface categories first (``create_yelp_nt_files.py:86-108``), canonicalize
via split/singularize tables afterwards (``category_mappings.py:10-34``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .. import config as C
from ..functions import iri
from ..functions.normalize import normalize_one
from .extract import TRIPLE_SCHEMA


class AhoCorasick:
    """Multi-pattern substring automaton with a DENSE byte-level transition
    table, scanned **vectorized across rows**: numpy steps every row's state
    one character per iteration (``state = trans[state, byte_column]``), so
    the sequential dimension is max text length, not rows x length. One
    batch pass finds ALL patterns regardless of vocabulary size. Patterns
    are matched on UTF-8 bytes (a valid UTF-8 needle byte-matches iff it
    char-matches — lead/continuation byte ranges are disjoint, so matches
    always align to character boundaries).

    Output sets are merged along fail links at build time and stored CSR
    (``out_off``/``out_ids``), so emitting hits is a repeat+gather, no
    per-row Python. Memory: the dense table is 1 KiB per trie state
    (int32 x 256); a 10k-surface vocabulary (~100k states) costs ~100 MiB
    per actor — built once in ``__init__``, shared by every batch. Above
    ``dense_max_states`` the dense closure is NOT materialized: the
    automaton keeps only the trie edges as one sorted ``state*256+byte``
    key array (~12 B/state — a 100k-surface vocabulary fits in ~15 MiB)
    plus the fail array, and each scan step resolves misses with a
    VECTORIZED fail-link walk (every iteration is a batch searchsorted
    over the still-unresolved rows; iterations are bounded by trie depth).
    Both engines are bit-identical (asserted in tests)."""

    def __init__(self, patterns: list[str],
                 dense_max_states: int = 262_144):
        from collections import deque
        pats = [p.encode("utf-8") for p in patterns]
        goto: list[dict[int, int]] = [{}]
        out: list[set[int]] = [set()]
        for pi, p in enumerate(pats):
            st = 0
            for ch in p:
                nxt = goto[st].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append(set())
                    nxt = len(goto) - 1
                    goto[st][ch] = nxt
                st = nxt
            out[st].add(pi)
        n = len(goto)
        fail = np.zeros(n, np.int32)
        # classic fail-link BFS (dense-free): fail[nxt] = the closed
        # transition of fail[s] on ch, found by walking fail links of the
        # (already complete) shallower states
        q = deque(goto[0].values())
        bfs = []
        while q:
            s = q.popleft()
            bfs.append(s)
            for ch, nxt in goto[s].items():
                f = fail[s]
                while f and ch not in goto[f]:
                    f = fail[f]
                t = goto[f].get(ch, 0)
                fail[nxt] = t if t != nxt else 0
                out[nxt] |= out[fail[nxt]]
                q.append(nxt)
        self.fail = fail
        if n <= dense_max_states:
            trans = np.zeros((n, 256), np.int32)
            for ch, nxt in goto[0].items():
                trans[0, ch] = nxt
            for s in bfs:  # fail[s] is shallower, so its row is complete
                trans[s] = trans[fail[s]]
                for ch, nxt in goto[s].items():
                    trans[s, ch] = nxt
            self.trans = trans
            self.edge_keys = self.edge_vals = None
        else:
            self.trans = None
            keys, vals = [], []
            for s, g in enumerate(goto):
                for ch, nxt in g.items():
                    keys.append(s * 256 + ch)
                    vals.append(nxt)
            order = np.argsort(np.asarray(keys, np.int64))
            self.edge_keys = np.asarray(keys, np.int64)[order]
            self.edge_vals = np.asarray(vals, np.int32)[order]
        self.n_states = n
        self.n_patterns = len(pats)
        cnt = np.array([len(o) for o in out], np.int64)
        self.out_cnt = cnt
        self.out_off = np.concatenate([[0], np.cumsum(cnt)])
        self.out_ids = (np.concatenate([sorted(o) for o in out if o])
                        if cnt.sum() else np.empty(0, np.int64)).astype(np.int64)
        self.has_out = cnt > 0

    def _step(self, st: np.ndarray, byts: np.ndarray) -> np.ndarray:
        """Closed-automaton transition for a VECTOR of (state, byte) rows.
        Dense engine: one 2D gather. Sparse engine: per iteration, one
        searchsorted over the still-unresolved rows; a miss at the root
        resolves to the root, otherwise the row follows its fail link."""
        if self.trans is not None:
            return self.trans[st, byts]
        nxt = np.zeros(len(st), np.int32)
        cur = st.astype(np.int64)
        active = np.flatnonzero(np.ones(len(st), bool))
        ek, ev, fail = self.edge_keys, self.edge_vals, self.fail
        while len(active):
            key = cur[active] * 256 + byts[active]
            pos = np.searchsorted(ek, key)
            posc = np.minimum(pos, max(len(ek) - 1, 0))
            hit = (ek[posc] == key) if len(ek) else np.zeros(len(key), bool)
            nxt[active[hit]] = ev[posc[hit]] if len(ek) else 0
            miss = active[~hit]
            at_root = cur[miss] == 0
            nxt[miss[at_root]] = 0
            rem = miss[~at_root]
            cur[rem] = fail[cur[rem]]
            active = rem
        return nxt

    def scan(self, text: str) -> set[int]:
        """Indices of every pattern occurring as a substring of ``text``
        (reference scalar path; the batch path is :meth:`scan_batch`)."""
        st, found = np.zeros(1, np.int32), set()
        for ch in text.encode("utf-8"):
            st = self._step(st, np.array([ch], np.uint8))
            s = int(st[0])
            if self.has_out[s]:
                o = self.out_off[s]
                found.update(self.out_ids[o:o + self.out_cnt[s]].tolist())
        return found

    def scan_batch(self, arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """All distinct (row, pattern) hits over a string Array, vectorized.

        Rows are length-sorted descending and processed column-major in
        segments capped at ~16 MiB of padded byte matrix (one pathological
        long row can't blow up rows x max_len). Returns (row_idx, pat_idx)
        sorted by (row, pattern)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        if n == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        off_width = np.int64 if pa.types.is_large_string(arr.type) else np.int32
        offs = np.frombuffer(arr.buffers()[1], off_width)[
            arr.offset:arr.offset + n + 1].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], np.uint8)
        lengths = np.diff(offs)
        order = np.argsort(-lengths, kind="stable")
        has_out = self.has_out
        rows_hit: list[np.ndarray] = []
        states_hit: list[np.ndarray] = []
        seg_budget = 16 << 20
        lo = 0
        while lo < n:
            L = int(lengths[order[lo]])
            if L == 0:
                break
            hi = min(n, lo + max(1, seg_budget // L))
            sel = order[lo:hi]
            ls = lengths[sel]
            m = hi - lo
            # gather each row's bytes into a row-major padded matrix
            pe = np.cumsum(ls)
            ps = pe - ls
            flat = np.repeat(offs[sel] - ps, ls) + np.arange(pe[-1])
            pad = np.zeros((m, L), np.uint8)
            pad[np.arange(L)[None, :] < ls[:, None]] = data[flat]
            # active rows at step t form a prefix (descending lengths)
            ks = np.searchsorted(-ls, -np.arange(L), side="left")
            st = np.zeros(m, np.int32)
            for t in range(L):
                k = ks[t]
                if k == 0:
                    break
                stk = self._step(st[:k], pad[:k, t])
                st[:k] = stk
                h = np.nonzero(has_out[stk])[0]
                if h.size:
                    rows_hit.append(sel[h])
                    states_hit.append(stk[h])
            lo = hi
        if not rows_hit:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        rows = np.concatenate(rows_hit).astype(np.int64)
        sts = np.concatenate(states_hit)
        cnt = self.out_cnt[sts]
        pe = np.cumsum(cnt)
        fi = np.repeat(self.out_off[sts] - (pe - cnt), cnt) + np.arange(pe[-1])
        key = np.unique(np.repeat(rows, cnt) * self.n_patterns
                        + self.out_ids[fi])
        return key // self.n_patterns, key % self.n_patterns


# vocabulary size above which MentionDetector builds the automaton instead
# of looping pc.match_substring per surface (O(vocab) C passes per batch).
# The vectorized scan costs ~32 ms per 8192-row batch independent of vocab;
# one pc.match_substring pass costs ~1.2 ms, so the crossover is ~25 forms.
AC_VOCAB_THRESHOLD = 24


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

    def _match_ac(self, lower: pa.Array) -> tuple[np.ndarray, list[str]]:
        idxs, pids = self.ac.scan_batch(lower)
        pat = self.patterns
        return idxs, [pat[p][1] for p in pids]

    def __call__(self, batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch["text"]).combine_chunks()
        conv, tidx = batch["conv_id"], batch["turn_idx"]
        turn = iri.turn_iri(conv, tidx)
        if self.ac is not None:
            idxs, norms = self._match_ac(lower)
            if not len(idxs):
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

    The detector — automaton included — is built ONCE on the driver and
    ``ray.put`` as a broadcast object; the per-batch scan runs as
    STATELESS tasks fetching it through the worker-level cache
    (``functions.broadcast``). This replaced the actor-pool idiom (build
    per actor in ``__init__``): same once-per-worker cost model (numpy
    automaton tables come out of plasma zero-copy), but no actor spawns
    (the pool ramp was a measured ~2-4 s fixed tail per run at 16 CPUs),
    no N-fold rebuild of the same automaton, and full operator fusion
    with the transcript read. ``concurrency`` is retained for API
    compatibility; tasks schedule on whatever the cluster has."""
    del concurrency
    from ..functions.broadcast import cached_object
    det_ref = ray.put(MentionDetector(vocab))

    def detect(batch: pa.Table) -> pa.Table:
        return cached_object(det_ref)(batch)

    return transcripts.map_batches(
        detect, batch_format="pyarrow", batch_size=8192,
        zero_copy_batch=True)


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
