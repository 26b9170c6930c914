"""Fuzzy surface-form matching: all pairs within Levenshtein distance 1,
via deletion-neighborhood blocking.

The reference canonicalizes surface variants with hand tables + a
singularizer (``Code/UtilityFunctions/string_functions.py:17-41``); typo-level
variants ("bagel"/"bagels", "bakery"/"bakerys") slip through unless someone
curates them. This operator finds every ED<=1 pair exactly, with NO all-pairs
comparison, using the classic deletion-neighborhood identity (FastSS;
Bocek et al. 2007, public): for strings a, b

    ED(a, b) <= 1  <=>  ({a} ∪ D1(a)) ∩ ({b} ∪ D1(b)) ≠ ∅

where D1(s) is the set of strings obtained by deleting ONE character of s.
So each form emits len(s)+1 keys (itself + its deletions), candidates are
pairs sharing a key (a sorted-block co-group — the same machinery as every
other blocked join here), and a vectorized verifier removes the false
positives the intersection admits (e.g. "ab"/"ba" share key "a"+"b" but
ED=2). Work per form is O(len²) key bytes — independent of corpus size —
and the shuffle carries (key, form) rows, never the corpus.

Verification is one numpy pass over the candidate batch (utf-32 codepoint
matrices, the same trick langid's batch scorer uses): equal-length pairs
need <=1 mismatching column; length±1 pairs need the suffix after the first
mismatch to align one-shifted. No per-pair Python.

Scale notes: hot keys (e.g. the empty string, shared by every 1-char form)
grow candidate groups quadratically; callers matching corpora with many
ultra-short strings should pre-filter lengths. Candidate volume ~=
Σ_key |group|² stays near-linear for natural vocabularies where deletion
keys are rare.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .grouped import group_ids, sorted_aggregate, sorted_group_apply


def _codepoints(strs: np.ndarray, width: int) -> np.ndarray:
    """(n, width) uint32 codepoint matrix, NUL-padded."""
    u = strs.astype(f"U{width}")
    return u.view(np.uint32).reshape(len(strs), width)


def _strings_from_codepoints(mat: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(mat).view(f"U{mat.shape[1]}").ravel()


def deletion_keys(forms: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """For each form emit (key, form) rows: the form itself + every
    single-character deletion. Vectorized: one column-delete pass per
    deletion position (<= max form length iterations, each over ALL rows)."""
    n = len(forms)
    if n == 0:
        return forms, forms
    lens = np.char.str_len(forms)
    width = int(lens.max())
    mat = _codepoints(forms, width)
    keys = [forms]
    owners = [np.arange(n)]
    for i in range(width):
        rows = np.flatnonzero(lens > i)
        if not len(rows):
            break
        sub = np.delete(mat[rows], i, axis=1)
        if sub.shape[1] == 0:
            sub = np.zeros((len(rows), 1), np.uint32)  # 1-char -> empty key
        keys.append(_strings_from_codepoints(sub))
        owners.append(rows)
    key_arr = np.concatenate(keys)
    owner_arr = np.concatenate(owners)
    return key_arr, forms[owner_arr]


def _ed_le1_mask(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """True where Levenshtein(a[i], b[i]) <= 1, fully vectorized. Assumes
    abs(len difference) <= 1 (guaranteed by deletion-key candidates)."""
    n = len(a)
    if n == 0:
        return np.zeros(0, bool)
    la, lb = np.char.str_len(a), np.char.str_len(b)
    # orient so the shorter string is S, the longer L
    swap = la > lb
    s_str = np.where(swap, b, a)
    l_str = np.where(swap, a, b)
    ls, ll = np.minimum(la, lb), np.maximum(la, lb)
    width = int(ll.max()) + 1
    S = _codepoints(s_str, width)
    L = _codepoints(l_str, width)
    eq = S == L
    mism = ~eq
    n_mism = mism.sum(axis=1)
    same_len = ls == ll
    out = np.zeros(n, bool)
    # substitution case: equal lengths, <=1 mismatching column
    out[same_len] = n_mism[same_len] <= 1
    # indel case: len+1 — suffix after the first mismatch aligns one-shifted
    ind = ~same_len
    if ind.any():
        k = mism.argmax(axis=1)           # first mismatch column
        no_mism = n_mism == 0             # L = S + trailing char
        # C[:, j] := S[j] == L[j+1]; padding NULs align (lb == la+1)
        C = S[:, :-1] == L[:, 1:]
        suff = np.logical_and.accumulate(C[:, ::-1], axis=1)[:, ::-1]
        w = suff.shape[1]
        kk = np.minimum(k, w - 1)
        suffix_ok = suff[np.arange(n), kk] | (k >= w)
        out[ind] = no_mism[ind] | suffix_ok[ind]
    return out


def ed1_pairs(forms: ray.data.Dataset, col: str,
              num_partitions: int = 8) -> ray.data.Dataset:
    """All unordered pairs of DISTINCT ``col`` values within edit distance 1.
    Returns (form_a, form_b, dist:int64=1), sorted by (form_a, form_b)."""
    def emit(b: pa.Table) -> pa.Table:
        c = b[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        f = np.unique(c.to_numpy(zero_copy_only=False).astype(str))
        k, o = deletion_keys(f)
        return pa.table({"k": pa.array(k), "form": pa.array(o)})

    keyed = forms.map_batches(emit, batch_format="pyarrow")
    pair_schema = pa.schema([("form_a", pa.string()),
                             ("form_b", pa.string())])

    def block_pairs(b: pa.Table) -> pa.Table:
        """Complete key-groups per sorted block: emit every in-group
        unordered form pair (a < b), locally deduped. Reuses the engine's
        vectorized pair enumeration (grouped._pair_index_arrays) by
        factorizing forms to int codes whose order IS lexicographic order
        (np.unique sorts), so id-ordered pairs are string-ordered pairs."""
        from .grouped import _pair_index_arrays
        if b.num_rows == 0:
            return pair_schema.empty_table()
        gid, _ = group_ids(b, ["k"])
        f = b["form"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(str)
        _, inv = np.unique(f, return_inverse=True)
        sel, first, second = _pair_index_arrays(
            gid, inv.astype(np.int64), None, None, "ed1_pairs")
        t = pa.table({"form_a": pa.array(f[sel[first]]),
                      "form_b": pa.array(f[sel[second]])},
                     schema=pair_schema)
        return t.group_by(["form_a", "form_b"],
                          use_threads=False).aggregate([]) \
            .select(["form_a", "form_b"])

    cand = sorted_group_apply(keyed, ["k"], block_pairs, num_partitions)
    # global distinct (a pair can share several deletion keys) — the shared
    # helper includes the map-side per-block combine, so a pair crosses the
    # shuffle once per block, not once per shared key
    from .pagerank import _distinct
    distinct = _distinct(cand, ["form_a", "form_b"], num_partitions)

    def verify(b: pa.Table) -> pa.Table:
        a = b["form_a"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(str)
        c = b["form_b"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(str)
        m = _ed_le1_mask(a, c)
        t = b.filter(pa.array(m))
        return pa.table({
            "form_a": t["form_a"], "form_b": t["form_b"],
            "dist": pa.array(np.ones(t.num_rows, np.int64))})

    return distinct.map_batches(verify, batch_format="pyarrow")
