"""Distributed BPE (byte-pair-encoding) vocabulary induction.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"),
restructured for Ray Data:

* the corpus is scanned ONCE into a word-frequency table (grouped-count
  partials — the only corpus-sized exchange in the whole trainer);
  every merge round afterwards runs over the VOCABULARY, which is
  bounded (Heaps' law) no matter how many tokens the corpus has —
  this is exactly why classic BPE trainers count over word types, and
  it is what makes the trainer viable at 100 TB;
* each round: a stateless ``map_batches`` over the vocab counts symbol
  pairs weighted by word frequency (vectorized: one split kernel,
  adjacent-pair join, ``np.bincount`` over pair codes), ONE
  dictionary-sized sort-aggregate reduces them, the driver picks the
  argmax pair (count desc, pair lexicographic asc — the deterministic
  tie-break), and the merge is applied vocab-side by a broadcast
  rewrite (left-to-right non-overlapping, the classic greedy rule).
* symbol state is a space-joined string per word (words are
  space-split, so a space can never occur inside a symbol).

Exactness: ``tests/test_bpe.py`` verifies the distributed trainer's
merge list equals a sequential dict-based reference merge-for-merge.
Iterative state rewriting is not SQL-expressible, so the query entry is
rows-only (same class as k-means / logreg).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .grouped import grouped_count, sorted_aggregate

END = "▁"  # end-of-word marker symbol (never in space-split words)


def _word_freqs(docs: ray.data.Dataset,
                num_partitions: int = 8) -> ray.data.Dataset:
    """(word, freq) over lowercased space-split tokens; the one
    corpus-sized exchange."""
    def words(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        return pa.table({"word": flat})

    return grouped_count(
        docs.map_batches(words, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["word"], "freq", num_partitions)


def _to_symbols(word: str) -> str:
    return " ".join(list(word) + [END])


def _merge_syms(s: str, left: str, right: str) -> str:
    """Greedy left-to-right non-overlapping merge of adjacent
    (left, right) symbol pairs — 'a a a a' under (a,a) -> 'aa aa'."""
    parts = s.split(" ")
    out, i = [], 0
    while i < len(parts):
        if (i + 1 < len(parts) and parts[i] == left
                and parts[i + 1] == right):
            out.append(left + right)
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return " ".join(out)


def _pair_counts_block(b: pa.Table) -> pa.Table:
    """Per-block weighted symbol-pair counts — vectorized: split once,
    pair adjacent symbols within words via offset masks, bincount over
    pair codes with word frequencies as weights."""
    out_schema = pa.schema([("pair", pa.string()), ("c", pa.int64())])
    if b.num_rows == 0:
        return out_schema.empty_table()
    syms = pc.split_pattern(b["syms"], " ")
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    flat = syms.flatten().to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(syms).to_numpy(zero_copy_only=False)
    freq = pc.cast(b["freq"], pa.int64()).to_numpy(zero_copy_only=False)
    if len(flat) < 2:
        return out_schema.empty_table()
    word_of = np.repeat(np.arange(len(lens)), lens)
    same = word_of[:-1] == word_of[1:]
    left, right = flat[:-1][same], flat[1:][same]
    w = freq[word_of[:-1][same]]
    if len(left) == 0:
        return out_schema.empty_table()
    pairs = np.char.add(np.char.add(left.astype(str), "\x1f"),
                        right.astype(str))
    uniq, inv = np.unique(pairs, return_inverse=True)
    counts = np.bincount(inv, weights=w.astype(np.float64)) \
        .astype(np.int64)
    return pa.table({"pair": pa.array(uniq, pa.string()),
                     "c": pa.array(counts, pa.int64())},
                    schema=out_schema)


def train_bpe(docs: ray.data.Dataset, n_merges: int = 10,
              num_partitions: int = 8) -> pa.Table:
    """Returns the merge table (rank, left, right, merged, count)."""
    vocab = _word_freqs(docs, num_partitions).map_batches(
        lambda b: pa.table({
            "syms": pa.array([_to_symbols(w) for w in
                              b["word"].to_pylist()], pa.string()),
            "freq": pc.cast(b["freq"], pa.int64())}),
        batch_format="pyarrow").materialize()

    merges = []
    for rank in range(n_merges):
        counts = sorted_aggregate(
            vocab.map_batches(_pair_counts_block,
                              batch_format="pyarrow",
                              zero_copy_batch=True),
            ["pair"], [("c", "sum")], ["pair", "c"], num_partitions)
        top = counts.sort(["c", "pair"],
                          descending=[True, False]).limit(1).to_pandas()
        if top.empty or int(top["c"][0]) < 1:
            break
        left, right = top["pair"][0].split("\x1f")
        count = int(top["c"][0])
        merges.append((rank, left, right, left + right, count))

        def apply(b: pa.Table, _l=left, _r=right) -> pa.Table:
            # vocab-bounded Python walk per word (NOT corpus-bounded);
            # str.replace would share separator spaces between adjacent
            # matches and miss the second of back-to-back pairs
            out = [_merge_syms(s, _l, _r) for s in b["syms"].to_pylist()]
            return pa.table({"syms": pa.array(out, pa.string()),
                             "freq": b["freq"]})

        vocab = vocab.map_batches(apply,
                                  batch_format="pyarrow").materialize()

    t = list(zip(*merges)) if merges else [[], [], [], [], []]
    return pa.table({"rank": pa.array(t[0], pa.int64()),
                     "left": pa.array(t[1], pa.string()),
                     "right": pa.array(t[2], pa.string()),
                     "merged": pa.array(t[3], pa.string()),
                     "count": pa.array(t[4], pa.int64())})


def train_bpe_local(texts: list[str], n_merges: int = 10) -> list[tuple]:
    """Sequential dict-based reference — the pytest twin."""
    from collections import Counter
    freqs = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                freqs[w] += 1
    vocab = {_to_symbols(w): f for w, f in freqs.items()}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            parts = syms.split(" ")
            for a, b in zip(parts, parts[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # deterministic: count desc, then "left\x1fright" lexicographic
        # asc (matching the distributed sort key exactly)
        count = max(pairs.values())
        left, right = min(("\x1f".join(p) for p, c in pairs.items()
                           if c == count)).split("\x1f")
        merges.append((rank, left, right, left + right, count))
        nv: dict[str, int] = {}
        for s, f in vocab.items():
            k = _merge_syms(s, left, right)
            nv[k] = nv.get(k, 0) + f
        vocab = nv
    return merges


def encode_with_merges(docs: ray.data.Dataset, merges: list[tuple],
                       num_partitions: int = 8) -> ray.data.Dataset:
    """Tokenizer APPLY: per document, the subword count under a learned
    merge list — the encode half of the BPE story (train_bpe produces
    the merges). The merge loop runs over each block's DISTINCT words
    (dictionary-encoded — the same vocab-bounded trick as training), so
    a billion-token block pays the Python merge walk only once per
    distinct word. Returns (doc_id, n_words, n_subwords); no SQL twin
    (iterative rewriting) — pytest checks against a per-word sequential
    encode."""
    order = [(left, right) for (_r, left, right, _m, _c) in merges]
    merges_ref = ray.put(order)

    def encode(b: pa.Table) -> pa.Table:
        ms = ray.get(merges_ref)
        toks = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        dic = flat.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64) if len(flat) else np.empty(0, np.int64)
        vocab = dic.dictionary.to_pylist() if len(flat) else []
        n_sub = np.empty(len(vocab), np.int64)
        for i, w in enumerate(vocab):
            s = _to_symbols(w)
            for left, right in ms:
                if " " not in s:
                    break
                s = _merge_syms(s, left, right)
            n_sub[i] = s.count(" ") + 1
        doc_of = np.repeat(np.arange(len(lens)), lens)
        per_doc = np.zeros(len(lens), np.int64)
        if len(codes):
            np.add.at(per_doc, doc_of, n_sub[codes])
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "n_words": pa.array(lens.astype(np.int64)),
            "n_subwords": pa.array(per_doc)})

    return docs.map_batches(encode, batch_format="pyarrow",
                            zero_copy_batch=True).sort("doc_id")
