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
    profile bigram occurs."""

    def __init__(self, seed_texts: dict[str, str] | None = None):
        self.profiles = _int_profiles(seed_texts or _SEED_TEXTS)

    def classify_one(self, text: str) -> str:
        counts = _bigram_counts(text)
        best, best_s = "und", 0
        for lang, prof in self.profiles.items():  # sorted -> deterministic
            s = sum(c * prof.get(g, 0) for g, c in counts.items())
            if s > best_s:  # strict: ties keep the earlier (lex-min) lang
                best, best_s = lang, s
        return best

    def __call__(self, b: pa.Table) -> pa.Table:
        preds = [self.classify_one(t) for t in b["text"].to_pylist()]
        return pa.table({"doc_id": b["doc_id"],
                         "pred_lang": pa.array(preds, pa.string())})


def language_id(docs: ray.data.Dataset, concurrency: int = 4) -> ray.data.Dataset:
    return docs.map_batches(
        LangIdClassifier, batch_format="pyarrow", batch_size=4096,
        zero_copy_batch=True, concurrency=(1, concurrency)).sort("doc_id")


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
