"""Text-analysis operators over the ``documents`` table.

Large-scale training-data curation needs per-document statistics computed in
a single pass; everything here is one stateless ``map_batches`` of vectorized
pyarrow kernels (quality/token counting, with DuckDB-matched semantics for
the oracle) or a broadcast-profile actor stage (language ID).

* :func:`quality_stats` — n_chars / n_words / alpha chars / stopword ratio /
  mean word length. All RE2 regex + Arrow kernels; the DuckDB oracle uses
  the same RE2 patterns so counts match exactly.
* :func:`token_counts` — whitespace tokens and a BPE-ish regex token count
  (``[A-Za-z]+|[0-9]+|punct``), both vectorized (``pc.count_substring_regex``).
* :class:`LangIdClassifier` — character-bigram-profile language ID: integer
  dot product of a document's char-bigram counts against fixed-point
  quantized per-language profiles built from small built-in seed texts (no
  model download; the actor-pool plumbing is the production shape — swap
  the profile table for fastText-style weights and nothing else changes).
  Integer scores are summation-order independent, so the DuckDB oracle
  verifies the classifier exactly. Analog of the reference's
  embedding-based category mapper decision rule: argmax with a
  deterministic tie-break (``category_mappings.py:92-98``).
* :func:`fingerprints` — winnowing document fingerprints (rolling Rabin-Karp
  k-char hashes, minimum per sliding window), the classic local fingerprint
  for plagiarism/near-dup detection.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# RE2 patterns shared verbatim with the DuckDB oracle (both engines are RE2).
ALPHA_PATTERN = "[A-Za-z]"
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
STOPWORDS = ("the", "a", "an", "and", "or", "of", "in", "on", "to", "is")


def quality_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc quality metrics (doc_id, n_chars, n_words, n_alpha,
    stopword_ratio, mean_word_len), sorted by doc_id."""
    sw = pa.array(STOPWORDS)

    def stats(b: pa.Table) -> pa.Table:
        text = b["text"].combine_chunks()
        n_chars = pc.utf8_length(text)
        words = pc.split_pattern(text, " ")
        n_words = pc.list_value_length(words)
        n_alpha = pc.count_substring_regex(text, ALPHA_PATTERN)
        # stopword count: flatten words, membership test, re-aggregate by row
        # via cumsum over (relative) list offsets — no per-row Python
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = pc.list_flatten(words)
        is_sw = pc.cast(pc.is_in(pc.utf8_lower(flat), value_set=sw), pa.int64())
        rel = words.offsets.to_numpy()
        rel = rel - rel[0]
        cs = np.concatenate([[0], np.cumsum(is_sw.to_numpy())])
        n_sw = cs[rel[1:]] - cs[rel[:-1]]
        no_space = pc.utf8_length(pc.replace_substring(text, " ", ""))
        nw = n_words.to_numpy().astype(np.float64)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_words": pc.cast(n_words, pa.int64()),
            "n_alpha": pc.cast(n_alpha, pa.int64()),
            "stopword_ratio": pa.array(n_sw / nw, pa.float64()),
            "mean_word_len": pa.array(
                no_space.to_numpy().astype(np.float64) / nw, pa.float64()),
        })

    return docs.map_batches(stats, batch_format="pyarrow",
                            zero_copy_batch=True).sort("doc_id")


def token_counts(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, ws_tokens, re_tokens) per doc, sorted by doc_id."""
    def counts(b: pa.Table) -> pa.Table:
        text = b["text"].combine_chunks()
        ws = pc.list_value_length(pc.split_pattern(text, " "))
        re_t = pc.count_substring_regex(text, BPE_TOKEN_PATTERN)
        return pa.table({
            "doc_id": b["doc_id"],
            "ws_tokens": pc.cast(ws, pa.int64()),
            "re_tokens": pc.cast(re_t, pa.int64())})

    return docs.map_batches(counts, batch_format="pyarrow",
                            zero_copy_batch=True).sort("doc_id")


def repetition_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1,
    the classic "fraction of duplicate n-grams" quality filters), as exact
    INTEGER counts so the DuckDB oracle matches bit-for-bit and callers pick
    their own thresholds: (doc_id, n_words, n_distinct_words, n_bigrams,
    top_bigram_count), sorted by doc_id. Words are the lowercased
    single-space split shared with the dedup shingle layer; a doc's
    duplicate-word fraction is ``1 - n_distinct_words/n_words`` and its
    top-bigram fraction ``top_bigram_count/n_bigrams``.

    One stateless ``map_batches``: words flatten once, per-doc distinct
    counts come from ``np.unique`` over (doc, word-code) keys, and the most
    frequent bigram per doc from one more unique + ``np.maximum.reduceat``
    over (doc, code, code) keys — no Python row loop."""
    def stats(b: pa.Table) -> pa.Table:
        from .dedup import _words_flat
        n = b.num_rows
        words, doc_of = _words_flat(b["text"])
        n_words = np.bincount(doc_of, minlength=n).astype(np.int64)
        dic = pa.array(words, pa.string()).dictionary_encode()
        codes = dic.indices.to_numpy().astype(np.int64)
        D = max(len(dic.dictionary), 1)
        ukey = np.unique(doc_of * D + codes)
        n_distinct = np.bincount(ukey // D, minlength=n).astype(np.int64)
        top = np.zeros(n, np.int64)
        if len(codes) > 1:
            within = doc_of[:-1] == doc_of[1:]
            bkey = ((doc_of[:-1] * D + codes[:-1]) * D + codes[1:])[within]
            if len(bkey):
                ub, cnt = np.unique(bkey, return_counts=True)
                ud = ub // (D * D)
                starts = np.flatnonzero(
                    np.concatenate([[True], ud[1:] != ud[:-1]]))
                top[ud[starts]] = np.maximum.reduceat(cnt, starts)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_words": pa.array(n_words),
            "n_distinct_words": pa.array(n_distinct),
            "n_bigrams": pa.array(np.maximum(n_words - 1, 0)),
            "top_bigram_count": pa.array(top)})

    return docs.map_batches(stats, batch_format="pyarrow",
                            zero_copy_batch=True).sort("doc_id")


def dup_span_stats(docs: ray.data.Dataset,
                   num_partitions: int = 16) -> ray.data.Dataset:
    """Per-document duplicate-substring coverage via winnowing fingerprints
    (the span-level dedup signal of Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): (doc_id, n_fp,
    n_shared_fp) where n_fp is the doc's distinct winnowing picks and
    n_shared_fp how many of them occur in at least one OTHER document.
    ``n_shared_fp / n_fp`` approximates the fraction of the document
    covered by text duplicated elsewhere in the corpus — the gating signal
    for span-level dedup. Integer counts only, so the DuckDB oracle (the
    shared winnow CTE + a document-frequency join) matches exactly.

    Scale shape: fingerprint postings shuffle ONCE grouped by fingerprint
    (document frequency = complete-group size, no join — winnow picks are
    distinct per doc so rows per group ARE distinct docs), per-block
    combine collapses to per-doc partial counts, and one final grouped sum
    by doc_id. No driver materialization, no all-pairs work."""
    from ..functions.grouped import group_ids, sorted_aggregate, \
        sorted_group_apply

    def explode(b: pa.Table) -> pa.Table:
        did = pc.cast(b["doc_id"], pa.int64()).combine_chunks().to_numpy() \
            if isinstance(b["doc_id"], pa.ChunkedArray) \
            else pc.cast(b["doc_id"], pa.int64()).to_numpy()
        fps, owners = [], []
        for i, t in enumerate(b["text"].to_pylist()):
            f = winnow_fingerprints(t)
            fps.extend(f)
            owners.extend([int(did[i])] * len(f))
        return pa.table({"fp": pa.array(fps, pa.int64()),
                         "doc_id": pa.array(owners, pa.int64())})

    def df_partial(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("doc_id", pa.int64()),
                                ("n_fp", pa.int64()),
                                ("n_shared_fp", pa.int64())])
        gid, starts = group_ids(b, ["fp"])
        if len(starts) == 0:
            return out_schema.empty_table()
        sizes = np.diff(np.append(starts, b.num_rows))
        shared = (np.repeat(sizes, sizes) >= 2).astype(np.int64)
        t = pa.table({"doc_id": b["doc_id"],
                      "n_fp": pa.array(np.ones(b.num_rows, np.int64)),
                      "n_shared_fp": pa.array(shared)})
        return t.group_by(["doc_id"], use_threads=False) \
                .aggregate([("n_fp", "sum"), ("n_shared_fp", "sum")]) \
                .rename_columns(["doc_id", "n_fp", "n_shared_fp"])

    postings = docs.map_batches(explode, batch_format="pyarrow",
                                zero_copy_batch=True)
    local = sorted_group_apply(postings, ["fp"], df_partial, num_partitions)
    return sorted_aggregate(local, ["doc_id"],
                            [("n_fp", "sum"), ("n_shared_fp", "sum")],
                            ["doc_id", "n_fp", "n_shared_fp"],
                            num_partitions)


CHUNK_WORDS = 32  # fixed chunk width (words) for chunk_documents


def chunk_documents(docs: ray.data.Dataset,
                    width: int = CHUNK_WORDS) -> ray.data.Dataset:
    """Fixed-length document chunking — the training-data packing staple
    (split every document into consecutive ``width``-word chunks; the last
    chunk keeps the remainder; every doc yields >= 1 chunk). Output
    (doc_id, chunk_idx, n_tokens, chunk_text) sorted by (doc_id,
    chunk_idx).

    Zero-copy construction: the batch splits ONCE into an Arrow list array;
    chunk texts are a new ListArray over the SAME flat word buffer with
    re-drawn offsets (non-overlapping windows keep offsets monotonic, which
    Arrow requires) joined by one vectorized ``pc.binary_join``. No Python
    loop over rows or chunks, no string copies until the final join."""
    def chunks(b: pa.Table) -> pa.Table:
        lst = pc.split_pattern(b["text"].combine_chunks(), " ")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        counts = pc.list_value_length(lst).to_numpy().astype(np.int64)
        doc_words = lst.offsets.to_numpy()     # word offsets per doc
        n_chunks = np.maximum((counts + width - 1) // width, 1)
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), n_chunks)
        # chunk_idx within doc via the grp-start cumsum trick
        row = np.arange(len(doc_of), dtype=np.int64)
        first = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        cidx = row - np.repeat(first, n_chunks)
        start = cidx * width
        end = np.minimum(start + width, counts[doc_of])
        # new list offsets over the SAME flat values buffer (zero-copy):
        # boundaries are doc_word_offset + chunk start / final end
        bounds = np.append(doc_words[doc_of] + start,
                           doc_words[-1]).astype(np.int32)
        chunk_lists = pa.ListArray.from_arrays(pa.array(bounds, pa.int32()),
                                               lst.values)
        text = pc.binary_join(chunk_lists, " ")
        did = pc.cast(b["doc_id"], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False) \
            if isinstance(b["doc_id"], pa.ChunkedArray) \
            else pc.cast(b["doc_id"], pa.int64()).to_numpy(
                zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(did[doc_of]),
            "chunk_idx": pa.array(cidx),
            "n_tokens": pa.array(end - start),
            "chunk_text": text})

    return docs.map_batches(chunks, batch_format="pyarrow",
                            zero_copy_batch=True).sort(["doc_id",
                                                        "chunk_idx"])


def dup_chunk_stats(docs: ray.data.Dataset, width: int = CHUNK_WORDS,
                    num_partitions: int = 8) -> ray.data.Dataset:
    """Per-document duplicate-CHUNK fraction — the segment-level exact
    dedup quality signal large curation pipelines gate on (the
    fixed-width analog of Dolma/FineWeb's duplicate-paragraph/line
    fraction; this corpus has no newline structure, so segments are the
    engine's own ``chunk_documents`` windows).

    A chunk is "duplicated" iff its exact text occurs >= 2 times
    corpus-wide. Output (doc_id, n_chunks, n_dup_chunks, dup_frac_fp)
    with ``dup_frac_fp = 10^6 * n_dup_chunks // n_chunks``, sorted.

    Scale shape: only (digest-hex, doc_id) rows shuffle — never chunk
    texts; corpus-wide occurrence counts come from the map-side-combined
    grouped count, attach back via ONE string-key co-group, and the
    per-doc fold is a second map-side-combined grouped sum. MD5 equality
    stands in for text equality exactly as in the exact-dedup family
    (full 128-bit digests)."""
    from ..functions.grouped import grouped_count, sorted_aggregate
    from ..functions.joins import attach_column
    from .dedup import _md5_with_key

    chunks = chunk_documents(docs, width)

    def dig(b: pa.Table) -> pa.Table:
        hx, _ = _md5_with_key(b["chunk_text"].to_pylist())
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "digest": hx})

    digs = chunks.map_batches(dig, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    counts = grouped_count(digs, ["digest"], "n", num_partitions)
    withn = attach_column(
        digs, counts, [("doc_id", pa.int64()), ("digest", pa.string())],
        "digest", "digest", "n", "n", pa.int64(), num_partitions,
        key_type=pa.string())

    def partial(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(did, return_inverse=True)
        return pa.table({
            "doc_id": pa.array(uniq),
            "n_chunks": pa.array(np.bincount(inv).astype(np.int64)),
            "n_dup_chunks": pa.array(np.bincount(
                inv, weights=(n >= 2).astype(np.float64))
                .astype(np.int64))})

    agg = sorted_aggregate(
        withn.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["doc_id"], [("n_chunks", "sum"), ("n_dup_chunks", "sum")],
        ["doc_id", "n_chunks", "n_dup_chunks"], num_partitions)

    def finalize(b: pa.Table) -> pa.Table:
        nc = b["n_chunks"].to_numpy(zero_copy_only=False)
        nd = b["n_dup_chunks"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "dup_frac_fp",
            pa.array(10**6 * nd // np.maximum(nc, 1), pa.int64()))

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True).sort("doc_id")


PACK_BUDGET = 128  # token budget per packed sequence


def pack_sequences(docs: ray.data.Dataset, budget: int = PACK_BUDGET,
                   num_partitions: int | None = 8) -> ray.data.Dataset:
    """Greedy sequence packing — the LLM-training batching staple: within
    each ``source`` shard, documents (ordered by doc_id) are packed into
    sequences whose whitespace-token sum stays <= ``budget``; a document
    that would overflow starts the next sequence, and an oversized document
    sits alone. Output (source, doc_id, n_tokens, seq_idx) sorted by
    (source, doc_id).

    Packing is inherently sequential, so it is SHARD-LOCAL by design (the
    industry-standard shape — global greedy packing would serialize the
    whole corpus): one key-sort colocates each source's docs, and the
    per-group scan is O(#sequences) numpy ``searchsorted`` hops over the
    token cumsum, not a per-doc Python loop. The DuckDB oracle replays the
    same greedy rule with a recursive CTE over per-source ranks."""
    from ..functions.grouped import group_ids, sorted_group_apply

    def counts(b: pa.Table) -> pa.Table:
        text = b["text"].combine_chunks()
        n = pc.list_value_length(pc.split_pattern(text, " "))
        return pa.table({"source": b["source"],
                         "doc_id": pc.cast(b["doc_id"], pa.int64()),
                         "n_tokens": pc.cast(n, pa.int64())})

    def pack(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("source", pa.string()),
                                ("doc_id", pa.int64()),
                                ("n_tokens", pa.int64()),
                                ("seq_idx", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        b = b.sort_by([("source", "ascending"), ("doc_id", "ascending")])
        gid, starts = group_ids(b, ["source"])
        n = b["n_tokens"].to_numpy()
        ends = np.append(starts[1:], b.num_rows)
        seq = np.empty(b.num_rows, np.int64)
        for s, e in zip(starts, ends):        # per source shard
            cs = np.cumsum(n[s:e])
            base, i, si = 0, 0, 0
            while i < e - s:                  # one hop per SEQUENCE
                j = int(np.searchsorted(cs, base + budget,
                                        side="right")) - 1
                j = max(j, i)                 # oversized doc sits alone
                seq[s + i:s + j + 1] = si
                base, i, si = int(cs[j]), j + 1, si + 1
        return pa.table({"source": b["source"], "doc_id": b["doc_id"],
                         "n_tokens": b["n_tokens"],
                         "seq_idx": pa.array(seq)})

    sized = docs.map_batches(counts, batch_format="pyarrow",
                             zero_copy_batch=True)
    return sorted_group_apply(sized, ["source"], pack, num_partitions)


# --------------------------------------------------------------------------
# language identification
# --------------------------------------------------------------------------

# Small built-in seed corpora (public pangrams / common phrases written for
# this engine) from which char-bigram profiles are derived.
_SEED_TEXTS = {
    "en": "the quick brown fox jumps over the lazy dog and then it was "
          "running with their friends because this is what they wanted",
    "de": "der schnelle braune fuchs springt über den faulen hund und dann "
          "lief er mit seinen freunden weil das ist was sie wollten nicht",
    "es": "el rápido zorro marrón salta sobre el perro perezoso y luego "
          "corría con sus amigos porque esto es lo que querían hacer",
    "fr": "le rapide renard brun saute par dessus le chien paresseux et puis "
          "il courait avec ses amis parce que cest ce quils voulaient",
    "zh": "敏捷的棕色狐狸跳过懒狗然后它和朋友们一起跑因为这就是他们想要的东西快速的狐狸跳过了狗",
}


def _bigram_counts(text: str) -> dict[str, int]:
    t = text.lower()
    counts: dict[str, int] = {}
    for i in range(len(t) - 1):
        g = t[i:i + 2]
        counts[g] = counts.get(g, 0) + 1
    return counts


def _bigram_vector(text: str) -> dict[str, float]:
    counts = _bigram_counts(text)
    norm = sum(v * v for v in counts.values()) ** 0.5 or 1.0
    return {g: v / norm for g, v in counts.items()}


# profile weights are L2-normalized floats QUANTIZED to integers (1e9
# fixed-point): scores become exact integer dot products, identical in any
# summation order on any engine — which is what lets the DuckDB oracle
# reproduce the classifier bit-exactly (queries.py builds the profile
# VALUES table from langid_profile_rows()). Per-doc normalization is
# dropped: it is a positive per-doc constant, so the argmax over languages
# is unchanged.
def _int_profiles(seed_texts: dict[str, str]) -> dict[str, dict[str, int]]:
    return {lang: {g: int(round(w * 1_000_000_000))
                   for g, w in _bigram_vector(t).items()}
            for lang, t in sorted(seed_texts.items())}


def langid_profile_rows(seed_texts: dict[str, str] | None = None
                        ) -> list[tuple[str, str, int]]:
    """(lang, bigram, int_weight) rows — the classifier's exact model, used
    verbatim by the SQL oracle."""
    profs = _int_profiles(seed_texts or _SEED_TEXTS)
    return [(lang, g, w) for lang in sorted(profs)
            for g, w in sorted(profs[lang].items())]


class LangIdClassifier:
    """Actor-pool callable: profiles built once in ``__init__``, per-batch
    scoring; integer-exact argmax, lexicographic tie-break, 'und' when no
    profile bigram occurs.

    Batch scoring is fully vectorized: the batch's texts become ONE flat
    codepoint array (utf-32 decode of the concatenation), bigrams become
    int64 codes ``cp[i] << 21 | cp[i+1]`` (codepoints < 2^21, no
    collisions), matched against the model's sorted bigram-code array with
    one ``searchsorted``, and per-(doc, lang) integer scores accumulate via
    one ``np.add.at`` scatter of the matched rows of the (bigram × lang)
    weight matrix. Identical semantics to :meth:`classify_one` (the pytest
    pins batch == per-row on real sentences): integer scores are
    summation-order independent, ``argmax`` keeps the first (lex-min)
    language on ties, and docs with zero profile-bigram hits stay 'und'."""

    def __init__(self, seed_texts: dict[str, str] | None = None):
        self.profiles = _int_profiles(seed_texts or _SEED_TEXTS)
        self.langs = np.array(sorted(self.profiles), dtype=object)
        code_of = {}
        for prof in self.profiles.values():
            for g in prof:
                code_of.setdefault(g, (ord(g[0]) << 21) | ord(g[1]))
        codes = np.array(sorted(set(code_of.values())), dtype=np.int64)
        weights = np.zeros((len(codes), len(self.langs)), dtype=np.int64)
        for j, lang in enumerate(self.langs):
            for g, w in self.profiles[lang].items():
                weights[np.searchsorted(codes, code_of[g]), j] = w
        self.codes, self.weights = codes, weights

    def classify_one(self, text: str) -> str:
        counts = _bigram_counts(text)
        best, best_s = "und", 0
        for lang, prof in self.profiles.items():  # sorted -> deterministic
            s = sum(c * prof.get(g, 0) for g, c in counts.items())
            if s > best_s:  # strict: ties keep the earlier (lex-min) lang
                best, best_s = lang, s
        return best

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = [t.lower() for t in b["text"].to_pylist()]
        n = len(texts)
        lens = np.fromiter((len(t) for t in texts), np.int64, n)
        cp = np.frombuffer("".join(texts).encode("utf-32-le"),
                           dtype=np.uint32).astype(np.int64)
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        if len(cp) > 1:
            doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
            within = doc_of[:-1] == doc_of[1:]  # bigram doesn't straddle docs
            bcodes = (cp[:-1] << 21) | cp[1:]
            idx = np.searchsorted(self.codes, bcodes)
            idx_c = np.minimum(idx, len(self.codes) - 1)
            hit = within & (self.codes[idx_c] == bcodes) if len(self.codes) \
                else np.zeros(len(bcodes), dtype=bool)
            d, w = doc_of[:-1][hit], self.weights[idx_c[hit]]
            if lens.max(initial=0) < 8_000_000:
                # bincount (one pass per language) is ~5x np.add.at's row
                # scatter. Its float64 accumulator is integer-exact while
                # every per-doc score < 2^53: weights < 2^30, so that holds
                # up to ~8M bigram hits in one doc — guarded above.
                for j in range(len(self.langs)):
                    scores[:, j] = np.bincount(
                        d, weights=w[:, j], minlength=n).astype(np.int64)
            else:
                np.add.at(scores, d, w)  # exact int64 path for huge docs
        best = scores.argmax(axis=1)  # first max == lex-min lang on ties
        best_s = scores[np.arange(n), best]
        preds = np.where(best_s > 0, self.langs[best], "und")
        return pa.table({"doc_id": b["doc_id"],
                         "pred_lang": pa.array(preds, pa.string())})


def language_id(docs: ray.data.Dataset, concurrency: int = 16) -> ray.data.Dataset:
    del concurrency
    from ..functions.broadcast import broadcast_map_batches
    return broadcast_map_batches(
        docs, LangIdClassifier, batch_format="pyarrow", batch_size=4096,
        zero_copy_batch=True).sort("doc_id")


# --------------------------------------------------------------------------
# winnowing fingerprints
# --------------------------------------------------------------------------

FP_K = 5   # char k-gram width
FP_W = 8   # winnowing window


def _fp_hash(s: str) -> int:
    """k-gram hash = first 8 hex digits of md5 (chosen over crc32 so the
    DuckDB oracle can reproduce it bit-exactly: ('0x' ||
    substring(md5(g), 1, 8))::BIGINT — crc32 does not exist in DuckDB)."""
    import hashlib
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def winnow_fingerprints(text: str, k: int = FP_K, w: int = FP_W) -> list[int]:
    """Winnowing (Schleimer et al. 2003): min hash per sliding window over
    rolling k-gram hashes; deduplicate consecutive picks."""
    t = text.lower()
    if len(t) < k:
        return [_fp_hash(t)]
    hs = np.fromiter((_fp_hash(t[i:i + k])
                      for i in range(len(t) - k + 1)), dtype=np.int64)
    if len(hs) <= w:
        return [int(hs.min())]
    # sliding-window minimum via stride tricks
    win = np.lib.stride_tricks.sliding_window_view(hs, w)
    mins = win.min(axis=1)
    picks = sorted(set(mins.tolist()))
    return [int(x) for x in picks]


def fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_fp, fp_min, fp_xor): winnowing fingerprint summary per doc."""
    def fp(b: pa.Table) -> pa.Table:
        n, mn, xr = [], [], []
        for t in b["text"].to_pylist():
            fps = winnow_fingerprints(t)
            n.append(len(fps))
            mn.append(min(fps))
            acc = 0
            for x in fps:
                acc ^= x
            xr.append(acc)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_fp": pa.array(n, pa.int64()),
            "fp_min": pa.array(mn, pa.int64()),
            "fp_xor": pa.array(xr, pa.int64())})

    return docs.map_batches(fp, batch_format="pyarrow",
                            zero_copy_batch=True).sort("doc_id")


# --------------------------------------------------------------------------
# TF-IDF top terms — the corpus-statistic broadcast pattern
# --------------------------------------------------------------------------

def document_frequencies(docs: ray.data.Dataset,
                         num_partitions: int = 16) -> ray.data.Dataset:
    """(term, df) for every distinct lowercased whitespace word.

    Map-side combine: each batch emits each (doc, term) pair ONCE (distinct
    within doc via a dictionary-encode + unique pass), partially counted per
    block, so the shuffle moves vocabulary-sized partials, not word
    occurrences. The global combine is ONE sorted-block aggregate.
    """
    from .dedup import _words_flat
    from ..functions.grouped import sorted_aggregate

    def partial(b: pa.Table) -> pa.Table:
        words, doc_of = _words_flat(b["text"])
        if len(words) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        dic = pa.array(words, pa.string()).dictionary_encode()
        codes = dic.indices.to_numpy().astype(np.int64)
        nd = len(dic.dictionary)
        u = np.unique(doc_of * nd + codes)      # distinct (doc, term)
        cnt = np.bincount(u % nd, minlength=nd) # block-local df partial
        return pa.table({"term": dic.dictionary,
                         "df": pa.array(cnt.astype(np.int64))})

    partials = docs.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    return sorted_aggregate(partials, ["term"], [("df", "sum")],
                            ["term", "df"], num_partitions)


def tfidf_top_terms(docs: ray.data.Dataset, k: int = 3,
                    num_partitions: int = 16) -> ray.data.Dataset:
    """Per-document top-k terms by tf-idf — two streaming passes.

    Pass 1 computes the global document-frequency table (vocabulary-sized —
    orders of magnitude smaller than the corpus) and broadcasts it ONCE via
    ``ray.put`` (one plasma copy per node); pass 2 re-streams the corpus and
    scores each document's terms locally against the broadcast table: the
    corpus itself is never shuffled. For a vocabulary too big for the object
    store, swap the broadcast for an ``attach_column`` co-group join keyed
    on term — same output, one extra all-to-all.

    Score = (tf / n_words_doc) * (N / df): the classic tf-idf shape with a
    RATIO idf instead of log(N/df), chosen because it is pure IEEE
    arithmetic — bit-identical between numpy and the DuckDB oracle, where
    libm log implementations may differ in the last ulp. Ties rank by term
    ascending (binary collation; matches SQL ``ORDER BY score DESC, term``).

    Output: (doc_id, term, score, rank 1..k) sorted by (doc_id, rank).
    """
    from .dedup import _words_flat

    n_docs = docs.count()  # parquet metadata read — no data pass
    from ..functions.grouped import concat_nonempty
    df_tbl = concat_nonempty(
        ray.get(document_frequencies(docs, num_partitions)
                .materialize().to_arrow_refs()))
    # blocks are each sorted but their DRIVER-side concat order is a Ray
    # scheduling detail — re-sort explicitly (vocabulary-sized, cheap) so
    # the searchsorted probe below is always valid
    terms_np = np.asarray(df_tbl["term"].to_numpy(zero_copy_only=False),
                          dtype="U")
    dfs_np = df_tbl["df"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(terms_np)
    df_ref = ray.put((terms_np[order], dfs_np[order]))

    def score(b: pa.Table) -> pa.Table:
        terms, dfs = ray.get(df_ref)
        words, doc_of = _words_flat(b["text"])
        did = pc.cast(b["doc_id"], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        out_schema = pa.schema([("doc_id", pa.int64()),
                                ("term", pa.string()),
                                ("score", pa.float64()),
                                ("rank", pa.int64())])
        if len(words) == 0:
            return out_schema.empty_table()
        n_words = np.bincount(doc_of, minlength=b.num_rows).astype(np.float64)
        dic = pa.array(words, pa.string()).dictionary_encode()
        codes = dic.indices.to_numpy().astype(np.int64)
        nd = len(dic.dictionary)
        key = doc_of * nd + codes
        ukey, tf = np.unique(key, return_counts=True)
        u_doc, u_code = ukey // nd, ukey % nd
        dict_np = np.asarray(dic.dictionary.to_numpy(zero_copy_only=False),
                             dtype="U")
        u_df = dfs[np.searchsorted(terms, dict_np[u_code])]
        # EXACT expression tree of the SQL oracle: (tf/n_words) * (N/df)
        sc = (tf.astype(np.float64) / n_words[u_doc]) \
            * (float(n_docs) / u_df)
        # per-doc top-k on (-score, term): lexsort is stable, last key major
        order = np.lexsort((dict_np[u_code], -sc, u_doc))
        u_doc, u_code, sc = u_doc[order], u_code[order], sc[order]
        starts = np.flatnonzero(
            np.concatenate([[True], u_doc[1:] != u_doc[:-1]]))
        pos = np.arange(len(u_doc)) - starts[
            np.cumsum(np.concatenate([[True], u_doc[1:] != u_doc[:-1]])) - 1]
        keep = pos < k
        return pa.table({
            "doc_id": pa.array(did[u_doc[keep]]),
            "term": pa.array(dict_np[u_code[keep]], pa.string()),
            "score": pa.array(sc[keep]),
            "rank": pa.array(pos[keep] + 1)}, schema=out_schema)

    return docs.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True).sort(["doc_id", "rank"])


def top_ngrams(docs: ray.data.Dataset, topn: int = 20,
               num_partitions: int = 4) -> ray.data.Dataset:
    """Corpus-level n-gram document frequencies, top ``topn`` — the "what
    does this corpus talk about" statistic every curation run starts with.

    Map-side: one vectorized shingle pass per batch (the dedup layer's
    ``_distinct_doc_shingles`` — k=3 lowercased word-grams, <k-word docs
    contribute nothing) collapsed to per-batch (ngram, df) partials, so the
    one all-to-all moves the batch's DICTIONARY of distinct shingles, not
    the token stream. Reduce: sum of partials (sorted_aggregate), then one
    tiny global sort on (df desc, ngram asc) + limit.

    Output: (ngram, df) — df = number of documents containing the ngram.
    """
    from ..functions.grouped import sorted_aggregate
    from .dedup import _distinct_doc_shingles

    def partial(b: pa.Table) -> pa.Table:
        _, codes, dictionary = _distinct_doc_shingles(b["text"])
        cnt = np.bincount(codes, minlength=len(dictionary)).astype(np.int64)
        return pa.table({"ngram": dictionary,
                         "df": pa.array(cnt, pa.int64())})

    partials = docs.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    df = sorted_aggregate(partials, ["ngram"], [("df", "sum")],
                          ["ngram", "df"], num_partitions)
    return df.sort(["df", "ngram"], descending=[True, False]).limit(topn)


def unigram_freq_score(docs: ray.data.Dataset,
                       num_partitions: int = 4) -> ray.data.Dataset:
    """Per-document mean corpus-frequency of its tokens — the zero-model
    stand-in for a unigram-LM fluency/quality score (docs made of rare
    tokens score low, boilerplate made of corpus-dominant tokens scores
    high). Two passes, both distributed:

    1. global token occurrence counts: per-batch ``np.unique`` partials
       summed with one all-to-all (sorted_aggregate) — the classic
       "corpus statistics" pass BM25 already uses;
    2. per-doc token multiplicities hash-joined to the counts table on the
       token (the counts side is (vocab)-sized, NOT broadcast — at 100 TB
       the vocabulary itself is sharded), then one grouped sum per doc.

    All integer: ``mean_freq_fp = floor(1e6 * Σcount / n_tokens)`` computed
    as ``1e6*(s//m) + ((s%m)*1e6)//m`` so int64 never overflows even when
    Σcount approaches 2^63 (the SQL twin gets the same floor via HUGEINT).
    Output: (doc_id, freq_sum, n_tokens, mean_freq_fp) sorted by doc_id.
    """
    from ..functions.grouped import sorted_aggregate
    from .dedup import _words_flat

    def count_partial(b: pa.Table) -> pa.Table:
        words, _ = _words_flat(b["text"])
        uw, cnt = np.unique(words, return_counts=True)
        return pa.table({"w": pa.array(uw, pa.string()),
                         "c": pa.array(cnt.astype(np.int64))})

    counts = sorted_aggregate(
        docs.map_batches(count_partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["w"], [("c", "sum")], ["w", "c"], num_partitions).materialize()

    def token_partial(b: pa.Table) -> pa.Table:
        words, doc_of = _words_flat(b["text"])
        did = b["doc_id"].to_numpy()
        codes, inv = np.unique(words, return_inverse=True)
        key = doc_of.astype(np.int64) * len(codes) + inv
        ukey, mult = np.unique(key, return_counts=True)
        return pa.table({
            "doc_id": pa.array(did[ukey // len(codes)], pa.int64()),
            "w": pa.array(codes[ukey % len(codes)], pa.string()),
            "m": pa.array(mult.astype(np.int64))})

    tokens = docs.map_batches(token_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    joined = tokens.join(counts, join_type="inner",
                         num_partitions=num_partitions, on=("w",))

    def weigh(b: pa.Table) -> pa.Table:
        m = b["m"].to_numpy()
        c = b["c"].to_numpy()
        return pa.table({"doc_id": b["doc_id"],
                         "s": pa.array(m * c, pa.int64()),
                         "m": b["m"]})

    per_doc = sorted_aggregate(
        joined.map_batches(weigh, batch_format="pyarrow"),
        ["doc_id"], [("s", "sum"), ("m", "sum")],
        ["doc_id", "freq_sum", "n_tokens"], num_partitions)

    def finalize(b: pa.Table) -> pa.Table:
        s = b["freq_sum"].to_numpy()
        m = b["n_tokens"].to_numpy()
        fp = 1_000_000 * (s // m) + ((s % m) * 1_000_000) // m
        return b.append_column("mean_freq_fp", pa.array(fp, pa.int64()))

    return per_doc.map_batches(finalize, batch_format="pyarrow") \
                  .sort("doc_id")


KWIC_TERMS = ("merge", "spark", "window")
KWIC_WIDTH = 24


def kwic_concordance(docs: ray.data.Dataset,
                     terms: tuple[str, ...] = KWIC_TERMS,
                     width: int = KWIC_WIDTH) -> ray.data.Dataset:
    """KWIC (key-word-in-context) concordance: for every document and
    every query term, the FIRST occurrence position (1-based, SQL
    ``position()`` convention) plus a +-``width``-char context snippet —
    the corpus-inspection operator a curation UI sits on.

    Stateless vectorized scan: one ``pc.find_substring`` pass per term
    (O(|terms|) passes per batch — same small-vocab contract as the
    mention detector; a 10k-term list would use the Aho-Corasick path in
    stages/mentions.py), context sliced with ``utf8_slice_codeunits``.
    No shuffle at all — the operator is embarrassingly parallel.
    """
    out_schema = pa.schema([("doc_id", pa.int64()), ("term", pa.string()),
                            ("pos", pa.int64()), ("ctx", pa.string())])

    def block(b: pa.Table) -> pa.Table:
        parts = []
        text = b["text"].combine_chunks()
        for term in terms:
            idx0 = pc.find_substring(text, term)  # 0-based, -1 absent
            mask = pc.greater_equal(idx0, 0)
            if pc.sum(pc.cast(mask, pa.int64())).as_py() in (0, None):
                continue
            sel = pc.filter(pa.table({
                "doc_id": b["doc_id"], "text": text,
                "idx0": pc.cast(idx0, pa.int64())}), mask)
            i0 = sel["idx0"].to_numpy(zero_copy_only=False)
            start = i0 - np.minimum(i0, width)
            stop = i0 + len(term) + width  # clamped at end-of-string below
            n = sel.num_rows
            # vectorized per-row byte slice: gather the snippet bytes from
            # the Arrow data buffer with ONE fancy-index pass (pyarrow's
            # slice kernels take scalar bounds only; a python loop here
            # would be a per-row hot path). ASCII corpus: bytes == chars.
            arr = sel["text"].combine_chunks()
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
                arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            sa = offs[:-1] + start
            ea = np.minimum(offs[:-1] + stop, offs[1:])
            lens = ea - sa
            total = int(lens.sum())
            base = np.repeat(sa, lens)
            local = np.arange(total, dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
            out_bytes = data[base + local].tobytes()
            new_offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
            ctx = pa.StringArray.from_buffers(
                n, pa.py_buffer(new_offs.tobytes()),
                pa.py_buffer(out_bytes))
            parts.append(pa.table({
                "doc_id": pc.cast(sel["doc_id"], pa.int64()),
                "term": pa.nulls(n, pa.string()).fill_null(term),
                "pos": pa.array(i0 + 1, pa.int64()),
                "ctx": ctx}, schema=out_schema))
        if not parts:
            return out_schema.empty_table()
        return pa.concat_tables(parts)

    return docs.map_batches(block, batch_format="pyarrow",
                            zero_copy_batch=True)


PMI_MIN_COUNT = 5


def pmi_bigrams(docs: ray.data.Dataset, min_count: int = PMI_MIN_COUNT,
                num_partitions: int = 4) -> ray.data.Dataset:
    """Pointwise-mutual-information collocations (Church & Hanks 1990,
    public): adjacent lowercased word bigrams scored by
    pmi = ln(c_ab) + 2·ln(N) − ln(M) − ln(c_a) − ln(c_b)
    where N = corpus token count, M = corpus bigram count. High PMI =
    words that co-occur far above chance — the multi-word-expression
    detector a tokenizer-training pipeline runs before vocabulary builds.

    Distribution shape: two corpus-statistics passes (bigram counts,
    unigram counts) as per-batch np.unique partials + one all-to-all sum
    each — the shuffle moves batch DICTIONARIES, not token streams; the
    min_count filter lands right after the global bigram sum, so the two
    unigram attach joins (functions/joins.attach_column, string keys)
    only see surviving collocation candidates. N and M are streaming
    scalar sums of the tiny aggregate tables (never the corpus). The ln
    happens once per output row in float64 from exact integer counts —
    both engines see identical integers, so the float agrees to ulp.

    Output: (a, b, n_ab, pmi) for bigrams with n_ab >= min_count,
    ordered by (a, b).
    """
    import math

    from ..functions.grouped import sorted_aggregate
    from ..functions.joins import attach_column
    from .dedup import _words_flat

    def bi_partial(b: pa.Table) -> pa.Table:
        words, doc_of = _words_flat(b["text"])
        if len(words) == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        adj = doc_of[1:] == doc_of[:-1]
        t = pa.table({"a": pa.array(words[:-1][adj], pa.string()),
                      "b": pa.array(words[1:][adj], pa.string())})
        return t.group_by(["a", "b"], use_threads=False) \
            .aggregate([([], "count_all")]).rename_columns(["a", "b", "c"])

    def uni_partial(b: pa.Table) -> pa.Table:
        words, _ = _words_flat(b["text"])
        uw, cnt = np.unique(words, return_counts=True)
        return pa.table({"w": pa.array(uw, pa.string()),
                         "c": pa.array(cnt.astype(np.int64))})

    bi = sorted_aggregate(
        docs.map_batches(bi_partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["a", "b"], [("c", "sum")], ["a", "b", "c"],
        num_partitions).materialize()
    uni = sorted_aggregate(
        docs.map_batches(uni_partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["w"], [("c", "sum")], ["w", "c"], num_partitions).materialize()
    m_total = int(bi.sum("c"))
    n_total = int(uni.sum("c"))

    cand = bi.filter(expr=f"c >= {min_count}")
    with_ca = attach_column(
        cand, uni,
        [("a", pa.string()), ("b", pa.string()), ("c", pa.int64())],
        "a", "w", "c", "c_a", pa.int64(), num_partitions,
        key_type=pa.string())
    with_cb = attach_column(
        with_ca, uni,
        [("a", pa.string()), ("b", pa.string()), ("c", pa.int64()),
         ("c_a", pa.int64())],
        "b", "w", "c", "c_b", pa.int64(), num_partitions,
        key_type=pa.string())

    base = 2.0 * math.log(n_total) - math.log(m_total)

    def score(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy().astype(np.float64)
        ca = b["c_a"].to_numpy().astype(np.float64)
        cb = b["c_b"].to_numpy().astype(np.float64)
        pmi = np.log(c) + base - np.log(ca) - np.log(cb)
        return pa.table({"a": b["a"], "b": b["b"], "n_ab": b["c"],
                         "pmi": pa.array(pmi)})

    return with_cb.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True).sort(["a", "b"])


def readability_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-document Flesch-style readability in exact integer fixed point.

    Deterministic proxies (both twins use the SAME definitions, so the
    hash gate is exact): words = whitespace-delimited fields (splits + 1,
    empty fields count — matching SQL ``string_split``), sentences =
    occurrences of [.!?], syllables = maximal [aeiouy]+ runs in the
    lowercased text (the classic vowel-group estimator). The score is the
    Flesch reading-ease formula in milli-points with floor division:

        flesch_fp = (206835·s·w − 1015·w² − 84600·y·s) // (s·w)

    with s,w clamped to ≥1. Fully vectorized: three RE2 count kernels per
    batch (``pc.count_substring_regex`` — the same RE2 DuckDB runs), no
    Python per row, no shuffle at all (embarrassingly parallel)."""
    def stats(b: pa.Table) -> pa.Table:
        text = b["text"]
        low = pc.utf8_lower(text)
        w = pc.add(pc.count_substring(text, " "),
                   pa.scalar(1, pa.int32()))
        s = pc.count_substring_regex(text, "[.!?]")
        y = pc.count_substring_regex(low, "[aeiouy]+")
        wn = pc.cast(w, pa.int64()).to_numpy(zero_copy_only=False)
        sn = pc.cast(s, pa.int64()).to_numpy(zero_copy_only=False)
        yn = pc.cast(y, pa.int64()).to_numpy(zero_copy_only=False)
        wc = np.maximum(wn, 1)
        sc = np.maximum(sn, 1)
        num = 206835 * sc * wc - 1015 * wc * wc - 84600 * yn * sc
        den = sc * wc
        # DuckDB's integer // truncates toward zero; numpy floors —
        # correct negative non-exact quotients up by one to match.
        fp = num // den + ((num % den != 0) & (num < 0))
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "n_words": pa.array(wn, pa.int64()),
            "n_sentences": pa.array(sn, pa.int64()),
            "n_syllables": pa.array(yn, pa.int64()),
            "flesch_fp": pa.array(fp, pa.int64())})

    return docs.map_batches(stats, batch_format="pyarrow",
                            zero_copy_batch=True)


HASH_FEATURE_DIM = 64


def hash_features(docs: ray.data.Dataset,
                  k: int = HASH_FEATURE_DIM) -> ray.data.Dataset:
    """Feature hashing (the "hashing trick", Weinberger et al. 2009):
    each document's token counts fold into a fixed k-dim vector by
    hashing tokens to buckets — the constant-memory vectorizer that
    needs NO global vocabulary pass, which is what makes it the 100-TB
    featurizer (a fitted CountVectorizer would be a giant broadcast).

    Emitted long-form as (doc_id, bucket, cnt). bucket =
    uint32(md5(token)[:4]) % k — the engine's standard SQL-twinnable
    hash (DuckDB: ('0x' || substring(md5(w),1,8))::BIGINT). Documents
    never span blocks, so the whole op is embarrassingly parallel: one
    tokenize kernel, md5 over the block's DISTINCT tokens only
    (dictionary-encoded — the per-token Python cost is bounded by the
    block vocabulary, not the token count), one bincount scatter."""
    import hashlib

    def feats(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("doc_id", pa.int64()),
                                ("bucket", pa.int64()),
                                ("cnt", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        toks = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        toks = toks.combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_ids = pc.cast(b["doc_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        doc_of_tok = np.repeat(np.arange(len(lens)), lens)
        uniq, inv = np.unique(flat, return_inverse=True)
        bucket_of = np.fromiter(
            (int(hashlib.md5(u.encode("utf-8")).hexdigest()[:8], 16) % k
             for u in uniq), np.int64, len(uniq))
        key = doc_of_tok * k + bucket_of[inv]
        counts = np.bincount(key, minlength=len(lens) * k)
        nz = np.flatnonzero(counts)
        return pa.table({
            "doc_id": pa.array(doc_ids[nz // k], pa.int64()),
            "bucket": pa.array(nz % k, pa.int64()),
            "cnt": pa.array(counts[nz], pa.int64())}, schema=out_schema)

    return docs.map_batches(feats, batch_format="pyarrow",
                            zero_copy_batch=True).sort(["doc_id",
                                                        "bucket"])


def compression_ratio(docs: ray.data.Dataset,
                      level: int = 6) -> ray.data.Dataset:
    """Per-document zlib compression ratio — the classic cheap
    redundancy/quality signal (used alongside the Gopher rules:
    highly compressible text is boilerplate/repetition, incompressible
    text is noise/binary). Emitted as exact integers (n_bytes,
    n_compressed) plus ratio_fp = 10^6·compressed//raw so thresholds
    are engine-independent; zlib output is deterministic for a fixed
    level and library, and per-doc work is inherent (the stage is
    embarrassingly parallel — an actor pool would only matter if a
    dictionary were preloaded). No SQL twin (DuckDB has no zlib) —
    pytest pins planted repetitive vs random docs."""
    import zlib

    def stats(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        raw = np.fromiter((len(t.encode("utf-8")) for t in texts),
                          np.int64, len(texts))
        comp = np.fromiter(
            (len(zlib.compress(t.encode("utf-8"), level))
             for t in texts), np.int64, len(texts))
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "n_bytes": pa.array(raw),
            "n_compressed": pa.array(comp),
            "ratio_fp": pa.array(10**6 * comp // np.maximum(raw, 1))})

    return docs.map_batches(stats, batch_format="pyarrow",
                            zero_copy_batch=True).sort("doc_id")


def surprisal_scores(docs: ray.data.Dataset,
                     num_partitions: int = 4) -> ray.data.Dataset:
    """Integer unigram surprisal — the perplexity-filter proxy in EXACT
    integers: per document, Σ over token occurrences of
    ``bitlen(T // c_w)`` (T = corpus token count, c_w = token corpus
    count) — the floor-log₂ self-information a unigram LM assigns,
    computable without a single float log (bitlen == length of the
    binary expansion, which DuckDB spells ``length(bin(x))``, so the
    quality score is hash-gated — real-log perplexities never are,
    because ln() differs across engines in the last bit).

    Same two-pass shape as :func:`unigram_freq_score`: vocabulary counts
    (dictionary-sized exchange), sharded token⋈vocab join, per-doc sum.
    High surprisal/token = rare-token text; low = boilerplate."""
    from ..functions.grouped import sorted_aggregate
    from .dedup import _words_flat

    def count_partial(b: pa.Table) -> pa.Table:
        words, _ = _words_flat(b["text"])
        uw, cnt = np.unique(words, return_counts=True)
        return pa.table({"w": pa.array(uw, pa.string()),
                         "c": pa.array(cnt.astype(np.int64))})

    counts = sorted_aggregate(
        docs.map_batches(count_partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["w"], [("c", "sum")], ["w", "c"], num_partitions).materialize()
    totals = counts.map_batches(
        lambda b: pa.table({"t": pa.array(
            [int(pc.sum(b["c"]).as_py() or 0)], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    T = int(totals["t"].sum())

    def token_partial(b: pa.Table) -> pa.Table:
        words, doc_of = _words_flat(b["text"])
        did = b["doc_id"].to_numpy()
        codes, inv = np.unique(words, return_inverse=True)
        key = doc_of.astype(np.int64) * len(codes) + inv
        ukey, mult = np.unique(key, return_counts=True)
        return pa.table({
            "doc_id": pa.array(did[ukey // len(codes)], pa.int64()),
            "w": pa.array(codes[ukey % len(codes)], pa.string()),
            "m": pa.array(mult.astype(np.int64))})

    tokens = docs.map_batches(token_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    joined = tokens.join(counts, join_type="inner",
                         num_partitions=num_partitions, on=("w",))

    def weigh(b: pa.Table) -> pa.Table:
        m = b["m"].to_numpy()
        c = b["c"].to_numpy()
        q = (T // c).astype(np.float64)  # < 2^53: frexp exponent exact
        bl = np.frexp(q)[1].astype(np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "s": pa.array(m * bl, pa.int64()),
                         "m": b["m"]})

    return sorted_aggregate(
        joined.map_batches(weigh, batch_format="pyarrow"),
        ["doc_id"], [("s", "sum"), ("m", "sum")],
        ["doc_id", "surprisal_int", "n_tokens"],
        num_partitions).sort("doc_id")
