"""Deduplication operators over the ``documents`` table.

The reference's only dedup is exact, via in-process ``set()`` caches and
pandas ``drop_duplicates`` (SURVEY.md §2.7, ``create_yelp_nt_files.py:47``,
``create_schema_wiki_mapping.py:44-47``). A training-data engine needs the
full family; each operator here is expressed with shuffle-native Ray Data
primitives so the same code runs at 100 TB:

* :func:`exact_dedup` — hash-partition on a content digest, keep-first per
  group. The digest (md5) is computed per block so only 16-byte keys (not
  full documents) enter the shuffle.
* :func:`ngram_jaccard_pairs` — exact word-``k``-gram-shingle Jaccard via an
  inverted shingle index: explode (shingle, doc) postings, co-group by
  shingle, emit intra-bucket pairs, aggregate intersection counts, then a
  hash join back to per-doc shingle counts. Exact but quadratic in hot
  shingles — the scale path is :func:`minhash_lsh_pairs`; hot-shingle
  buckets are capped (``max_posting``) with the cap logged, mirroring how a
  100 TB run would drop stop-shingles.
* :func:`minhash_lsh_pairs` — MinHash signatures (``k`` permutations, CRC32
  base hash), banded LSH bucketing (groupby on band key), candidate-pair
  dedup, exact-Jaccard verification via hash joins on doc_id. With the
  default 32 bands x 2 rows, a pair at the configured J=0.5 threshold is
  missed with p≈1e-4 and anything above J=0.6 with p<4e-7 — sized to the
  THRESHOLD, not just to planted high-J pairs — so its output equals the
  exact brute-force oracle on the test corpora (asserted by the driver
  harness).
* :func:`simhash_pairs` — 64-bit SimHash fingerprints, 4x16-bit band
  bucketing, Hamming-distance verification. Candidates must collide on one
  of the 4 bands — guaranteed for distance <= 3 by pigeonhole, so the
  band stage loses nothing vs all-pairs at the default threshold.
* :func:`embedding_topk_pairs` / :func:`embedding_near_dup_blocked` — exact
  cosine over the ``embeddings`` table via a distributed block-nested-loop
  (object-store block refs, two blocks per task, no driver materialization).
* :func:`embedding_near_dup_pairs` — the scale path: random-hyperplane LSH
  bucketing + in-bucket exact verify + cross-band dedup (see the section
  comment for the miss-probability arithmetic).

All thresholds are parameters; the defaults match the planted near-dup
structure of the synthetic corpus (25 pairs at J>=0.97, next pair <0.2).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# MinHash parameters: k hash functions as k affine permutations of a CRC32
# base hash, banded b x r with b*r == k. 32 bands x 2 rows sizes the banding
# guarantee to the configured threshold (0.5) rather than only to the planted
# high-J pairs: a pair at J=0.5 is missed with (1 - 0.5^2)^32 ~= 1e-4 and at
# J=0.54 with ~1.6e-5 (the 16x4 scheme missed near-threshold pairs with
# ~20-25% per seed). More bands = more candidates; the exact verify keeps
# the output identical to brute force.
MINHASH_K = 64
MINHASH_BANDS = 32
MINHASH_ROWS = 2
_MERSENNE = (1 << 61) - 1
_RNG = np.random.RandomState(1234)
_PERM_A = _RNG.randint(1, _MERSENNE, size=MINHASH_K, dtype=np.int64)
_PERM_B = _RNG.randint(0, _MERSENNE, size=MINHASH_K, dtype=np.int64)

SHINGLE_K = 3  # word-shingle width shared by jaccard/minhash/oracle SQL
# candidate-text broadcast cutoff for the minhash verify stage: below this,
# surviving texts ride the object store once (one plasma copy per node) and
# the verify is a single stateless map; above it, co-group sort joins.
_BROADCAST_TEXT_BYTES = 2 << 30


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def _md5_array(texts: list[str]) -> pa.Array:
    return pa.array([hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts],
                    pa.string())


def exact_dedup(docs: ray.data.Dataset,
                num_partitions: int | None = None) -> ray.data.Dataset:
    """(text_hash, n_dups, keep_doc_id): keep-first (min doc_id) per distinct
    content digest. Only digests + ids travel through the shuffle, and the
    one range-partitioned sort doubles as the grouped aggregate
    (``functions/grouped.sorted_aggregate``) and the output ordering."""
    from ..functions.grouped import sorted_aggregate

    def digest(b: pa.Table) -> pa.Table:
        return pa.table({
            "text_hash": _md5_array(b["text"].to_pylist()),
            "doc_id": b["doc_id"]})

    hashed = docs.map_batches(digest, batch_format="pyarrow",
                              zero_copy_batch=True)
    return sorted_aggregate(hashed, ["text_hash"],
                            [("doc_id", "count"), ("doc_id", "min")],
                            ["text_hash", "n_dups", "keep_doc_id"],
                            num_partitions)


# --------------------------------------------------------------------------
# Incremental (cross-snapshot) exact dedup against a committed digest index
# --------------------------------------------------------------------------
# The 100-TB ingestion shape: history was deduped ONCE into a bucketed
# digest index (SMB layout, functions/bucketed.py); each new delta drop
# dedupes against all of history by joining ONLY its matching buckets —
# history is never rescanned, and the index update is an append of the
# delta's novel keepers into the same bucket dirs via
# functions.bucketed.append_bucketed — staged in a tmp dir and renamed in
# as complete part files, so the update is retry-safe against BOTH
# duplicate appends (readers key on content digests) and crashes
# mid-write (a truncated parquet never lands in the live layout).


def _md5_with_key(texts: list[str]) -> tuple[pa.Array, np.ndarray]:
    """(hex digest, int64 bucket key = first 16 hex chars as int64, shifted
    to signed range). One hashlib pass computes both."""
    hexes = []
    keys = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        h = hashlib.md5(t.encode("utf-8")).hexdigest()
        hexes.append(h)
        keys[i] = int(h[:16], 16) - (1 << 63)
    return pa.array(hexes, pa.string()), keys


def build_digest_index(history: ray.data.Dataset, index_dir: str,
                       n_buckets: int = 64) -> str:
    """Build (once) the committed digest index of a historical corpus:
    (hist_digest, h, hist_keep=min doc_id per digest), hive-bucketed by
    the int64 digest key. Only digests shuffle — never documents."""
    from ..functions.bucketed import write_bucketed
    from ..functions.grouped import sorted_aggregate

    def digest(b: pa.Table) -> pa.Table:
        hx, keys = _md5_with_key(b["text"].to_pylist())
        return pa.table({"hist_digest": hx, "h": pa.array(keys),
                         "doc_id": pc.cast(b["doc_id"], pa.int64())})

    keep = sorted_aggregate(
        history.map_batches(digest, batch_format="pyarrow",
                            zero_copy_batch=True),
        ["hist_digest"], [("h", "min"), ("doc_id", "min")],
        ["hist_digest", "h", "hist_keep"])
    return write_bucketed(keep, "h", index_dir, n_buckets)


def incremental_exact_dedup(delta: ray.data.Dataset, index_dir: str,
                            scratch_dir: str,
                            update_index: bool = False) -> ray.data.Dataset:
    """(doc_id, dup_of) for every delta doc: ``dup_of`` = the history
    keeper if the content exists in the index, else the earliest delta doc
    with the same content, else NULL (novel). Requires nonnegative doc
    ids (sentinel arithmetic). ``update_index=True`` afterwards appends
    the novel keepers' digests into the index buckets, so an immediate
    re-run of the same delta reports every row as a duplicate
    (idempotent ingestion — pytest-pinned)."""
    import json as _json
    import os as _os

    from ..functions.bucketed import bucketed_join, write_bucketed
    from ..functions.grouped import sorted_group_apply

    with open(_os.path.join(index_dir, "meta.json")) as f:
        n_buckets = _json.load(f)["n_buckets"]

    def digest(b: pa.Table) -> pa.Table:
        hx, keys = _md5_with_key(b["text"].to_pylist())
        return pa.table({"digest": hx, "h": pa.array(keys),
                         "doc_id": pc.cast(b["doc_id"], pa.int64())})

    ddir = _os.path.join(scratch_dir, "delta_bucketed")
    write_bucketed(delta.map_batches(digest, batch_format="pyarrow",
                                     zero_copy_batch=True),
                   "h", ddir, n_buckets)

    j_schema = pa.schema([("h", pa.int64()), ("digest", pa.string()),
                          ("doc_id", pa.int64()),
                          ("hist_digest", pa.string()),
                          ("hist_keep", pa.int64())])
    matches = bucketed_join(
        ddir, index_dir, "h",
        left_cols=["h", "digest", "doc_id"],
        right_cols=["h", "hist_digest", "hist_keep"],
        join_type="inner", empty=j_schema.empty_table())

    u_schema = pa.schema([("digest", pa.string()), ("doc_id", pa.int64()),
                          ("ref", pa.int64())])

    def hist_rows(b: pa.Table) -> pa.Table:
        # 64-bit key collisions only ADD join rows; full-digest equality
        # filters them here
        t = b.filter(pc.equal(b["digest"], b["hist_digest"]))
        return pa.table({"digest": t["digest"],
                         "doc_id": pa.nulls(t.num_rows, pa.int64())
                         .fill_null(-1),
                         "ref": pc.cast(t["hist_keep"], pa.int64())},
                        schema=u_schema)

    def delta_rows(b: pa.Table) -> pa.Table:
        return pa.table({"digest": b["digest"],
                         "doc_id": pc.cast(b["doc_id"], pa.int64()),
                         "ref": pa.nulls(b.num_rows, pa.int64())
                         .fill_null(-1)}, schema=u_schema)

    # NOTE: columns= together with partitioning=None trips an
    # UnboundLocalError inside ray 2.49's parquet datasource — project
    # post-read instead
    union = ray.data.read_parquet(ddir, partitioning=None,
                                  file_extensions=["parquet"]) \
        .select_columns(["digest", "doc_id"]) \
        .map_batches(delta_rows, batch_format="pyarrow") \
        .union(matches.map_batches(hist_rows, batch_format="pyarrow"))

    out_schema = pa.schema([("doc_id", pa.int64()), ("dup_of", pa.int64())])
    BIG = np.int64(1) << 62

    def assemble(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        dg = b["digest"].combine_chunks().to_numpy(zero_copy_only=False)
        doc = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ref = b["ref"].combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate([[True], dg[1:] != dg[:-1]]))
        sizes = np.diff(np.append(starts, len(dg)))
        # per group: history keeper (refs of a digest group are all equal;
        # -1 marks delta rows) and the earliest delta doc id
        g_hist = np.maximum.reduceat(ref, starts)
        g_dmin = np.minimum.reduceat(np.where(doc >= 0, doc, BIG), starts)
        hist_pp = np.repeat(g_hist, sizes)
        dmin_pp = np.repeat(g_dmin, sizes)
        is_delta = doc >= 0
        dup = np.where(hist_pp >= 0, hist_pp,
                       np.where(dmin_pp < doc, dmin_pp, np.int64(-1)))
        d = dup[is_delta]
        return pa.table({
            "doc_id": pa.array(doc[is_delta]),
            "dup_of": pc.if_else(pa.array(d >= 0), pa.array(d),
                                 pa.scalar(None, pa.int64()))},
            schema=out_schema)

    out = sorted_group_apply(union, ["digest"], assemble).sort("doc_id") \
        .materialize()

    if update_index:
        novel = out.map_batches(
            lambda b: b.filter(pc.is_null(b["dup_of"])),
            batch_format="pyarrow", zero_copy_batch=True)

        def to_index(b: pa.Table) -> pa.Table:
            return pa.table({"hist_digest": b["digest"],
                             "h": b["h"],
                             "hist_keep": pc.cast(b["doc_id"], pa.int64())})

        from ..functions.joins import broadcast_semi_filter, distinct_int_keys
        keep_ids = distinct_int_keys(novel, ["doc_id"])
        if len(keep_ids):
            keepers = broadcast_semi_filter(
                ray.data.read_parquet(ddir, partitioning=None,
                                      file_extensions=["parquet"]),
                "doc_id",
                keep_ids).map_batches(to_index, batch_format="pyarrow")
            from ..functions.bucketed import append_bucketed
            append_bucketed(keepers, "h", index_dir)
    return out


# --------------------------------------------------------------------------
# Incremental (cross-snapshot) NEAR-dup dedup against a committed LSH index
# --------------------------------------------------------------------------
# The near-dup sibling of incremental_exact_dedup: history's MinHash band
# rows (32 ints per doc) and texts are committed ONCE as two bucketed SMB
# layouts; each delta drop computes its own band rows, joins ONLY the
# matching band buckets for cross-snapshot candidates (history signatures
# are never rescanned), adds delta-internal candidates via the normal
# band groupby, and runs the shared exact-Jaccard verify over delta texts
# plus exactly the matched history docs (fetched from the text layout by
# bucket — not a history scan).


def build_minhash_index(history: ray.data.Dataset, index_dir: str,
                        n_buckets: int = 32,
                        k: int = SHINGLE_K) -> str:
    """Commit the LSH index of a historical corpus: ``bands/`` —
    (bk=band-mixed hash, band, band_hash, doc_id) bucketed by bk; and
    ``texts/`` — (doc_id, text) bucketed by doc_id (the verify side).
    Returns ``index_dir``."""
    import os as _os

    from ..functions.bucketed import write_bucketed

    def bands(b: pa.Table) -> pa.Table:
        t = minhash_band_rows(b, k)
        bk = (t["band_hash"].to_numpy(zero_copy_only=False)
              + t["band"].to_numpy(zero_copy_only=False))
        return t.append_column("bk", pa.array(bk.astype(np.int64)))

    write_bucketed(history.map_batches(bands, batch_format="pyarrow",
                                       zero_copy_batch=True),
                   "bk", _os.path.join(index_dir, "bands"), n_buckets)

    def text_rows(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(b["doc_id"], pa.int64()),
                         "text": pc.cast(b["text"], pa.string())})

    write_bucketed(history.map_batches(text_rows, batch_format="pyarrow",
                                       zero_copy_batch=True),
                   "doc_id", _os.path.join(index_dir, "texts"), n_buckets)
    return index_dir


# worker-process-level LRU over committed text-bucket reads (the verify
# side of the incremental near-dup engine): each wanted-id batch probes a
# handful of buckets, and a HOT bucket (wanted by many batches) would be
# re-read from storage every time. True LRU — a hit refreshes recency, so
# interleaved stages evict the coldest bucket, not the earliest-inserted
# hot one. Keyed by (dir, sorted part-file list) so an appended/rewritten
# layout is never served stale. ``_TEXT_BUCKET_READS`` counts actual
# storage reads per dir — the test hook asserting reads stay <= #buckets
# per worker.
_TEXT_BUCKET_CACHE: dict = {}
_TEXT_BUCKET_CACHE_MAX = 4
_TEXT_BUCKET_READS: dict = {}


def _cached_text_bucket(d: str) -> pa.Table:
    import os as _os

    import pyarrow.parquet as _pq
    files = tuple(sorted(f for f in _os.listdir(d)
                         if f.endswith(".parquet")))
    key = (d, files)
    t = _TEXT_BUCKET_CACHE.get(key)
    if t is not None:
        _TEXT_BUCKET_CACHE[key] = _TEXT_BUCKET_CACHE.pop(key)  # -> MRU end
        return t
    if len(_TEXT_BUCKET_CACHE) >= _TEXT_BUCKET_CACHE_MAX:
        _TEXT_BUCKET_CACHE.pop(next(iter(_TEXT_BUCKET_CACHE)))
    t = _pq.read_table(d, columns=["doc_id", "text"])
    _TEXT_BUCKET_CACHE[key] = t
    _TEXT_BUCKET_READS[d] = _TEXT_BUCKET_READS.get(d, 0) + 1
    return t


def incremental_minhash_dedup(delta: ray.data.Dataset, index_dir: str,
                              scratch_dir: str, threshold: float = 0.5,
                              k: int = SHINGLE_K,
                              num_partitions: int = 16) -> ray.data.Dataset:
    """(doc_a, doc_b, jaccard) near-dup pairs of the delta against
    history ∪ delta (doc_a < doc_b): cross-snapshot candidates come from
    joining the delta's band rows against ONLY their matching committed
    band buckets; delta-internal candidates from the usual band groupby;
    both verified exactly by :func:`verify_candidate_pairs` over delta
    texts + just the matched history docs."""
    import json as _json
    import os as _os

    import pyarrow.parquet as _pq

    from ..functions.bucketed import bucketed_join, write_bucketed
    from ..functions.grouped import pairs_within_groups, sorted_aggregate
    from ..functions.joins import broadcast_semi_filter, distinct_int_keys

    with open(_os.path.join(index_dir, "bands", "meta.json")) as f:
        n_buckets = _json.load(f)["n_buckets"]

    def bands(b: pa.Table) -> pa.Table:
        t = minhash_band_rows(b, k)
        bk = (t["band_hash"].to_numpy(zero_copy_only=False)
              + t["band"].to_numpy(zero_copy_only=False))
        return t.append_column("bk", pa.array(bk.astype(np.int64)))

    delta_bands = delta.map_batches(bands, batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
    # spill the DELTA side with renamed columns (the index — the big,
    # committed side — is joined as-is; renaming avoids Acero clashes at
    # the cost of one pass over the small delta, never over history)
    dbdir = _os.path.join(scratch_dir, "delta_bands")
    write_bucketed(delta_bands.map_batches(
        lambda t: t.rename_columns(
            [c if c == "bk" else c + "_l" for c in t.column_names]),
        batch_format="pyarrow", zero_copy_batch=True),
        "bk", dbdir, n_buckets)

    # cross-snapshot candidates: per-bucket join on the mixed band key,
    # exact (band, band_hash) equality refilter, map-side distinct
    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])

    def refine(j: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(j["band_l"], j["band"]),
                    pc.equal(j["band_hash_l"], j["band_hash"]))
        t = j.filter(m)
        a = t["doc_id_l"].to_numpy(zero_copy_only=False)
        b_ = t["doc_id"].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(a, b_), np.maximum(a, b_)
        keep = lo != hi  # ids are nonnegative < 2^32 by contract
        key = np.unique(lo[keep] * (1 << 32) + hi[keep]) \
            if len(lo) else np.empty(0, np.int64)
        return pa.table({"doc_a": pa.array(key >> 32),
                         "doc_b": pa.array(key & ((1 << 32) - 1))},
                        schema=pair_schema)

    cross = bucketed_join(
        dbdir, _os.path.join(index_dir, "bands"), "bk",
        left_cols=["bk", "band_l", "band_hash_l", "doc_id_l"],
        right_cols=["bk", "band", "band_hash", "doc_id"],
        join_type="inner", combine=refine,
        empty=pair_schema.empty_table())

    internal = pairs_within_groups(
        delta_bands.select_columns(["band", "band_hash", "doc_id"]),
        ["band", "band_hash"], "doc_id", count_col="n_bands",
        num_partitions=num_partitions).select_columns(["doc_a", "doc_b"])

    candidates = sorted_aggregate(
        cross.union(internal), ["doc_a", "doc_b"],
        [("doc_a", "count")], ["doc_a", "doc_b", "n"],
        num_partitions).select_columns(["doc_a", "doc_b"])

    # verify corpus: the delta plus ONLY the matched history docs, fetched
    # from the committed text layout bucket-by-bucket
    cand_ids = distinct_int_keys(candidates, ["doc_a", "doc_b"])
    tdir = _os.path.join(index_dir, "texts")
    from ..functions.bucketed import bucket_of

    def fetch_hist(b: pa.Table) -> pa.Table:
        out = []
        want = b["id"].to_numpy(zero_copy_only=False)
        for bkt in np.unique(bucket_of(pa.array(want),
                                       n_buckets).to_numpy()):
            d = _os.path.join(tdir, f"bucket={int(bkt)}")
            if not _os.path.isdir(d):
                # legal: hive writes create no dir for an empty bucket.
                # A genuinely missing history doc (corrupt layout) fails
                # loudly downstream — verify_candidate_pairs checks every
                # candidate id against the assembled corpus before gather.
                continue
            # worker-level LRU: a hot committed bucket wanted by many id
            # batches is read from disk once per worker, not once per batch
            t = _cached_text_bucket(d)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            out.append(t.filter(pa.array(np.isin(ids, want))))
        return (pa.concat_tables(out) if out
                else pa.schema([("doc_id", pa.int64()),
                                ("text", pa.string())]).empty_table())

    hist_texts = ray.data.from_arrow(
        pa.table({"id": pa.array(cand_ids, pa.int64())})) \
        .map_batches(fetch_hist, batch_format="pyarrow")
    corpus = delta.select_columns(["doc_id", "text"]).union(hist_texts)
    # history docs that are ALSO in the delta id space would duplicate the
    # corpus rows; keep first occurrence per id
    corpus = sorted_aggregate(
        corpus, ["doc_id"], [("text", "min")], ["doc_id", "text"],
        num_partitions)
    return verify_candidate_pairs(candidates, corpus, k=k,
                                  threshold=threshold,
                                  num_partitions=num_partitions)


# --------------------------------------------------------------------------
# shingles
# --------------------------------------------------------------------------

def _shingles(text: str, k: int = SHINGLE_K) -> set[str]:
    """Word-k-gram shingle set. Docs with fewer than k words yield the EMPTY
    set — matching the SQL oracle's CTE exactly (its ``range(1, len-1)``
    emits nothing for short docs), so short docs drop out of every dedup
    variant identically on both sides."""
    ws = text.lower().split(" ")
    if len(ws) < k:
        return set()
    return {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}


# ---- vectorized batch tokenization (shared by jaccard/minhash/simhash) ----
#
# One Arrow split pass per batch; all per-doc structure is offset arithmetic
# over the flattened word array (no Python loop over rows). The only
# remaining Python loops run over the batch's DICTIONARY of distinct
# words/shingles (hashing), which is far smaller than the token stream.

def _words_flat(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat_words, doc_of): lowercased whitespace-split words of every doc
    in the batch, flattened, with the owning doc index per word."""
    lst = pc.split_pattern(pc.utf8_lower(col), " ")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    counts = pc.list_value_length(lst).to_numpy().astype(np.int64)
    words = lst.flatten().to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(len(counts)), counts)
    return words, doc_of


def _distinct_doc_shingles(col, k: int = SHINGLE_K
                           ) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """Distinct (doc_idx, shingle) pairs of a batch, vectorized.

    Returns (doc_idx ascending, shingle_code, dictionary) where
    ``dictionary[shingle_code]`` is the shingle string. Docs with < k words
    contribute nothing (see :func:`_shingles`).
    """
    lst = pc.split_pattern(pc.utf8_lower(col), " ")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    counts = pc.list_value_length(lst).to_numpy().astype(np.int64)
    doc_of = np.repeat(np.arange(len(counts)), counts)
    warr = lst.flatten()
    T = len(warr)
    empty = (np.empty(0, np.int64), np.empty(0, np.int64),
             pa.array([], pa.string()))
    if T < k:
        return empty
    # valid shingle start positions: all k words in the same doc
    valid = doc_of[:T - k + 1] == doc_of[k - 1:]
    starts = np.flatnonzero(valid)
    if len(starts) == 0:
        return empty
    # all T-k+1 consecutive shingles via zero-copy slices joined in one
    # Arrow kernel pass, then take the doc-interior starts — var-width C
    # string handling, no fixed-width numpy unicode blow-up
    sh_all = pc.binary_join_element_wise(
        *[warr.slice(off, T - k + 1) for off in range(k)], " ")
    dic = sh_all.take(pa.array(starts)).dictionary_encode()
    codes = dic.indices.to_numpy().astype(np.int64)
    n_dict = len(dic.dictionary)
    key = doc_of[starts] * n_dict + codes  # distinct per doc
    ukey = np.unique(key)
    return ukey // n_dict, ukey % n_dict, dic.dictionary


def _crc32_dict(dictionary: pa.Array) -> np.ndarray:
    return np.fromiter((zlib.crc32(s.encode("utf-8"))
                        for s in dictionary.to_pylist()),
                       dtype=np.int64, count=len(dictionary))


def _pairs_table(a: list[int], b: list[int], extra: dict | None = None) -> pa.Table:
    cols = {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
    if extra:
        cols.update(extra)
    return pa.table(cols)


# --------------------------------------------------------------------------
# exact n-gram Jaccard via inverted shingle index
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(docs: ray.data.Dataset, threshold: float = 0.5,
                        k: int = SHINGLE_K, num_partitions: int = 16,
                        max_posting: int = 10_000) -> ray.data.Dataset:
    """All pairs (doc_a < doc_b) with word-k-gram Jaccard >= threshold.

    Returns (doc_a, doc_b, jaccard) sorted. ``max_posting`` caps the posting
    list of a hot shingle (stop-shingle drop; exactness documented in the
    module docstring — unlimited on the test corpora).
    """
    def explode(b: pa.Table) -> pa.Table:
        """(shingle, doc_id, n_shingles) postings — the doc's shingle count
        rides along so no join-back against a sizes table is needed."""
        doc_idx, codes, dictionary = _distinct_doc_shingles(b["text"], k)
        n = np.bincount(doc_idx, minlength=b.num_rows).astype(np.int64) \
            if len(doc_idx) else np.zeros(b.num_rows, np.int64)
        did = pc.cast(b["doc_id"], pa.int64()).combine_chunks().to_numpy()
        return pa.table({
            "shingle": dictionary.take(pa.array(codes)),
            "doc_id": pa.array(did[doc_idx], pa.int64()),
            "n_shingles": pa.array(n[doc_idx], pa.int64())})

    postings = docs.map_batches(explode, batch_format="pyarrow",
                                zero_copy_batch=True)

    # sorted-block pair expansion + map-side combine with the shingle count
    # CARRIED through (functions/grouped.pairs_with_carry): 3 shuffles total
    # (bucket sort, pair aggregate, output sort) — no sizes join.
    from ..functions.grouped import pairs_with_carry
    pair_counts = pairs_with_carry(
        postings, ["shingle"], "doc_id", "n_shingles", count_col="n_inter",
        max_group=max_posting, num_partitions=num_partitions)

    def jacc(b: pa.Table) -> pa.Table:
        # raw IEEE division of exact integer counts — bit-identical to the
        # DuckDB oracle's CAST(ni AS DOUBLE)/(na+nb-ni)
        inter = b["n_inter"].to_numpy().astype(np.float64)
        union = (b["carry_a"].to_numpy() + b["carry_b"].to_numpy()) - inter
        j = inter / union
        t = pa.table({
            "doc_a": b["doc_a"], "doc_b": b["doc_b"],
            "jaccard": pa.array(j, pa.float64())})
        return t.filter(pc.greater_equal(t["jaccard"], threshold))

    return pair_counts.map_batches(jacc, batch_format="pyarrow") \
                      .sort(["doc_a", "doc_b"])


def ngram_dice_pairs(docs: ray.data.Dataset, threshold: float = 0.6,
                     k: int = SHINGLE_K, num_partitions: int = 16,
                     max_posting: int = 10_000) -> ray.data.Dataset:
    """All pairs (doc_a < doc_b) with word-k-gram SØRENSEN–DICE coefficient
    2·|A∩B|/(|A|+|B|) >= threshold — the size-sum-normalized sibling of
    :func:`ngram_jaccard_pairs` (monotone in Jaccard, D = 2J/(1+J), but the
    conventional threshold in record-linkage toolchains). Identical plan:
    postings → pairs_with_carry (3 shuffles) → vectorized scoring."""
    def explode(b: pa.Table) -> pa.Table:
        doc_idx, codes, dictionary = _distinct_doc_shingles(b["text"], k)
        n = np.bincount(doc_idx, minlength=b.num_rows).astype(np.int64) \
            if len(doc_idx) else np.zeros(b.num_rows, np.int64)
        did = pc.cast(b["doc_id"], pa.int64()).combine_chunks().to_numpy()
        return pa.table({
            "shingle": dictionary.take(pa.array(codes)),
            "doc_id": pa.array(did[doc_idx], pa.int64()),
            "n_shingles": pa.array(n[doc_idx], pa.int64())})

    postings = docs.map_batches(explode, batch_format="pyarrow",
                                zero_copy_batch=True)
    from ..functions.grouped import pairs_with_carry
    pair_counts = pairs_with_carry(
        postings, ["shingle"], "doc_id", "n_shingles", count_col="n_inter",
        max_group=max_posting, num_partitions=num_partitions)

    def dice(b: pa.Table) -> pa.Table:
        inter = b["n_inter"].to_numpy().astype(np.float64)
        d = 2.0 * inter / (b["carry_a"].to_numpy()
                           + b["carry_b"].to_numpy())
        t = pa.table({
            "doc_a": b["doc_a"], "doc_b": b["doc_b"],
            "dice": pa.array(d, pa.float64())})
        return t.filter(pc.greater_equal(t["dice"], threshold))

    return pair_counts.map_batches(dice, batch_format="pyarrow") \
                      .sort(["doc_a", "doc_b"])


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def minhash_signature(text: str, k: int = SHINGLE_K) -> np.ndarray | None:
    """k-permutation MinHash signature of a document; None for docs with no
    shingles (reference implementation for tests — the pipeline path is the
    batch-vectorized :func:`_minhash_signatures`)."""
    ss = sorted(_shingles(text, k))
    if not ss:
        return None
    h = np.fromiter((zlib.crc32(s.encode("utf-8")) for s in ss),
                    dtype=np.int64, count=len(ss))
    # (n_shingles, K) affine permutations mod Mersenne prime, min per column
    vals = (h[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) % _MERSENNE
    return vals.min(axis=0)


def _minhash_signatures(col, k: int = SHINGLE_K
                        ) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, signatures): batch-vectorized MinHash — one tokenize pass,
    dictionary-level CRC32, one (pairs x K) affine-permutation matrix, and a
    per-doc column-min via ``np.minimum.reduceat`` over doc offsets. Only
    docs with >= 1 shingle appear in the output."""
    doc_idx, codes, dictionary = _distinct_doc_shingles(col, k)
    if len(doc_idx) == 0:
        return np.empty(0, np.int64), np.empty((0, MINHASH_K), np.int64)
    # permutations depend ONLY on the shingle: do the modular arithmetic on
    # the batch DICTIONARY (distinct shingles), then gather per row — on
    # repetitive corpora the dictionary is ~10x smaller than the (doc,
    # shingle) rows and the gather is a memcpy, not arithmetic.
    # Memory shape: everything runs in K-chunks with preallocated buffers
    # (a single expression would materialize three fresh (dict x K) int64
    # temporaries ≈ 3 x 8K bytes/shingle — fresh pages are the dominant
    # cost in a cold worker, and peak heap matters at scale regardless)
    h = _crc32_dict(dictionary)
    starts = np.flatnonzero(
        np.concatenate([[True], doc_idx[1:] != doc_idx[:-1]]))
    sigs = np.empty((len(starts), MINHASH_K), np.int64)
    kc = 16  # permutations per chunk
    gather_buf = np.empty((len(codes), kc), np.int64)
    # Adaptive inner shape. Repetitive corpus (dictionary much smaller than
    # the (doc, shingle) rows): arithmetic per DICT entry, then one random
    # gather of results per row — K x fewer mod-muls. Near-distinct corpus:
    # the big gather moves (rows x K x 8) bytes randomly for no arithmetic
    # saving, so gather the 8-byte hash per row ONCE and run the affine
    # chunks in-place over rows — sequential memory, one small gather.
    repetitive = len(codes) >= 4 * len(h)
    if repetitive:
        perm_buf = np.empty((len(h), kc), np.int64)
        src = h
    else:
        src = np.take(h, codes)
    for c0 in range(0, MINHASH_K, kc):
        c1 = min(c0 + kc, MINHASH_K)
        gb = gather_buf[:, :c1 - c0]
        if repetitive:
            pb = perm_buf[:, :c1 - c0]
            np.multiply(src[:, None], _PERM_A[None, c0:c1], out=pb)
            np.add(pb, _PERM_B[None, c0:c1], out=pb)
            np.remainder(pb, _MERSENNE, out=pb)
            np.take(pb, codes, axis=0, out=gb)
        else:
            np.multiply(src[:, None], _PERM_A[None, c0:c1], out=gb)
            np.add(gb, _PERM_B[None, c0:c1], out=gb)
            np.remainder(gb, _MERSENNE, out=gb)
        np.minimum.reduceat(gb, starts, axis=0, out=sigs[:, c0:c1])
    return doc_idx[starts], sigs


def _verify_jaccard_vec(da: np.ndarray, db: np.ndarray, uniq_ids: np.ndarray,
                        uniq_texts, k: int, threshold: float) -> pa.Table:
    """Exact word-k-gram Jaccard of each candidate pair, batch-vectorized.

    ``uniq_ids`` (sorted int64) / ``uniq_texts`` carry each distinct doc of
    the batch ONCE; shingling runs through :func:`_distinct_doc_shingles`
    (one Arrow pass over the distinct texts). Per-pair intersection counts
    come from one sort of ``pair_idx * n_dict + shingle_code`` keys: per-doc
    shingles are distinct, so a shingle shared by both sides of a pair
    appears exactly twice and |A∩B| is a duplicate count — no Python loop
    over pairs or shingle sets. Division is int64→float64 IEEE, identical
    to ``len(sa & sb) / len(sa | sb)`` on Python ints."""
    P = len(da)
    empty = _pairs_table([], [], {"jaccard": pa.array([], pa.float64())})
    if P == 0:
        return empty
    doc_idx, codes, dic = _distinct_doc_shingles(uniq_texts, k)
    n_dict = max(len(dic), 1)
    counts = (np.bincount(doc_idx, minlength=len(uniq_ids)).astype(np.int64)
              if len(doc_idx) else np.zeros(len(uniq_ids), np.int64))
    offsets = np.concatenate([[0], np.cumsum(counts)])
    ia = np.searchsorted(uniq_ids, da)
    ib = np.searchsorted(uniq_ids, db)

    def side_keys(pos: np.ndarray) -> np.ndarray:
        ln = counts[pos]
        tot = int(ln.sum())
        pair_of = np.repeat(np.arange(P, dtype=np.int64), ln)
        within = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(ln) - ln, ln)
        return pair_of * n_dict + codes[np.repeat(offsets[pos], ln) + within]

    both = np.concatenate([side_keys(ia), side_keys(ib)])
    both.sort(kind="stable")
    inter_pairs = both[1:][both[1:] == both[:-1]] // n_dict
    n_inter = np.bincount(inter_pairs, minlength=P).astype(np.int64)
    union = counts[ia] + counts[ib] - n_inter
    j = np.divide(n_inter, union, out=np.zeros(P, np.float64),
                  where=union > 0)
    keep = j >= threshold
    return _pairs_table(da[keep], db[keep],
                        {"jaccard": pa.array(j[keep], pa.float64())})


def minhash_band_rows(b: pa.Table, k: int = SHINGLE_K) -> pa.Table:
    """(doc_id, band, band_hash) LSH band rows of a batch. The band key
    mixes the band's r signature values into one int64 with a
    splitmix-style multiply-xor fold — process-stable (builtin ``hash()``
    is salted per process and would silently kill all LSH collisions);
    accidental band-hash collisions only ADD candidates for the exact
    verify to drop."""
    doc_idx, sigs = _minhash_signatures(b["text"], k)
    did = pc.cast(b["doc_id"], pa.int64()).combine_chunks().to_numpy()
    n = len(doc_idx)
    bands3d = sigs.reshape(n, MINHASH_BANDS, MINHASH_ROWS).astype(np.uint64)
    mix = np.uint64(0x9E3779B97F4A7C15)
    acc = np.zeros((n, MINHASH_BANDS), dtype=np.uint64)
    for r in range(MINHASH_ROWS):
        acc ^= (bands3d[:, :, r] + mix) * np.uint64(0xBF58476D1CE4E5B9)
        acc ^= acc >> np.uint64(29)
        acc *= np.uint64(0x94D049BB133111EB)
    return pa.table({
        "doc_id": pa.array(np.repeat(did[doc_idx], MINHASH_BANDS)),
        "band": pa.array(
            np.tile(np.arange(MINHASH_BANDS, dtype=np.int32), n)),
        "band_hash": pa.array(acc.reshape(-1).view(np.int64))})


def minhash_lsh_pairs(docs: ray.data.Dataset, threshold: float = 0.5,
                      k: int = SHINGLE_K,
                      num_partitions: int = 16) -> ray.data.Dataset:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    Output schema and semantics match :func:`ngram_jaccard_pairs` (the LSH
    stage only prunes candidates; survivors are verified exactly against the
    documents joined back by id).
    """
    from ..functions.grouped import pairs_within_groups
    candidates = pairs_within_groups(
        docs.map_batches(lambda b: minhash_band_rows(b, k),
                         batch_format="pyarrow", zero_copy_batch=True),
        ["band", "band_hash"], "doc_id", count_col="n_bands",
        num_partitions=num_partitions)
    return verify_candidate_pairs(candidates, docs, k=k,
                                  threshold=threshold,
                                  num_partitions=num_partitions)


def verify_candidate_pairs(candidates: ray.data.Dataset,
                           docs: ray.data.Dataset, k: int = SHINGLE_K,
                           threshold: float = 0.5,
                           num_partitions: int = 16) -> ray.data.Dataset:
    """Exact-Jaccard verification of a candidate-pair Dataset against the
    documents joined back by id — the shared tail of every LSH-candidate
    engine (:func:`minhash_lsh_pairs`, :func:`incremental_minhash_dedup`).
    Returns (doc_a, doc_b, jaccard >= threshold) sorted."""
    from ..functions.joins import (attach_column, broadcast_semi_filter,
                                   distinct_int_keys)
    i64, s = pa.int64(), pa.string()
    # Scale shape of the verify join: candidates are tiny next to the
    # corpus, so the corpus is never shuffled — it is STREAMED through a
    # broadcast semi-filter (binary-search probe against the candidate id
    # set) and only the surviving candidate docs (materialized: they are
    # candidate-sized and read twice) go through the verify. The candidate
    # id set folds WORKER-SIDE (per-block uniques merged through a remote
    # tree in ``distinct_int_keys``); the driver only ever holds the final
    # distinct-id array it must broadcast anyway — never the pair blocks.
    candidates = candidates.materialize()
    cand_ids = distinct_int_keys(candidates, ["doc_a", "doc_b"])
    texts = broadcast_semi_filter(
        docs.select_columns(["doc_id", "text"]), "doc_id",
        cand_ids).materialize()

    # Two ways to hand each candidate pair its two texts. The surviving
    # texts are candidate-sized by construction; when they are also SMALL in
    # bytes (the common case — near-dup candidates are a sliver of a corpus)
    # broadcast them once and verify in a single stateless map: zero extra
    # all-to-alls. Only when candidate texts are genuinely big (multi-GB at
    # 100 TB) do we pay the two co-group sort joins, sized to the measured
    # candidate volume rather than the cluster default. Either way the
    # per-batch verify is the vectorized :func:`_verify_jaccard_vec`.
    if texts.size_bytes() <= _BROADCAST_TEXT_BYTES:
        from ..functions.grouped import concat_nonempty

        @ray.remote
        def build_lookup(*parts: pa.Table):
            # assembled in a WORKER; the return value lands in the object
            # store and the driver only passes the ref around
            tb = concat_nonempty(list(parts))
            ids = tb["doc_id"].to_numpy(zero_copy_only=False) \
                if tb.num_rows else np.empty(0, np.int64)
            order = np.argsort(ids)
            txt = (tb["text"].combine_chunks().take(pa.array(order))
                   if tb.num_rows else pa.array([], pa.string()))
            return ids[order], txt

        lookup = build_lookup.remote(*texts.to_arrow_refs())

        def verify_bcast(b: pa.Table) -> pa.Table:
            ids, txt = ray.get(lookup)
            da = b["doc_a"].to_numpy(zero_copy_only=False)
            db = b["doc_b"].to_numpy(zero_copy_only=False)
            # shingle each distinct doc of THIS batch once; an EMPTY block
            # (Ray emits them) must short-circuit BEFORE the corpus guard,
            # or an empty candidate set over an empty corpus would raise
            ub = np.unique(np.concatenate([da, db]))
            if len(ub) == 0:
                return _pairs_table(
                    [], [], {"jaccard": pa.array([], pa.float64())})
            pos = np.searchsorted(ids, ub)
            # fail LOUDLY if a candidate id is absent from the corpus (a
            # corrupted/partial texts layout): an unchecked gather here
            # would silently verify against the WRONG text
            if len(ids) == 0 or pos.max(initial=-1) >= len(ids) \
                    or not np.array_equal(ids[np.minimum(pos, len(ids) - 1)],
                                          ub):
                missing = ub[(pos >= len(ids))] if len(ids) else ub
                if len(ids):
                    inb = pos < len(ids)
                    missing = np.concatenate(
                        [ub[~inb], ub[inb][ids[pos[inb]] != ub[inb]]])
                raise ValueError(
                    "verify_candidate_pairs: candidate doc ids missing "
                    f"from the corpus (first 5: {missing[:5].tolist()})")
            utexts = txt.take(pa.array(pos))
            return _verify_jaccard_vec(da, db, ub, utexts, k, threshold)

        return candidates.map_batches(verify_bcast, batch_format="pyarrow",
                                      batch_size=16384) \
            .sort(["doc_a", "doc_b"])

    np_join = max(1, min(num_partitions,
                         (candidates.count() + 49_999) // 50_000))
    joined = attach_column(
        candidates, texts,
        left_cols=[("doc_a", i64), ("doc_b", i64)],
        left_key="doc_a", source_key="doc_id", source_val="text",
        out_col="text_a", out_type=s, num_partitions=np_join)
    joined = attach_column(
        joined, texts,
        left_cols=[("doc_a", i64), ("doc_b", i64), ("text_a", s)],
        left_key="doc_b", source_key="doc_id", source_val="text",
        out_col="text_b", out_type=s, num_partitions=np_join)

    def verify(b: pa.Table) -> pa.Table:
        da = b["doc_a"].to_numpy(zero_copy_only=False)
        db = b["doc_b"].to_numpy(zero_copy_only=False)
        ids = np.concatenate([da, db])
        txt = pa.concat_arrays([b["text_a"].combine_chunks(),
                                b["text_b"].combine_chunks()])
        uniq, first = np.unique(ids, return_index=True)
        return _verify_jaccard_vec(da, db, uniq, txt.take(pa.array(first)),
                                   k, threshold)

    return joined.map_batches(verify, batch_format="pyarrow",
                              batch_size=16384) \
                 .sort(["doc_a", "doc_b"])


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over word features (unweighted) — reference
    implementation for tests; the pipeline path is the batch-vectorized
    :func:`_simhash_batch`."""
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for w in set(text.lower().split(" ")):
        h = np.uint64(int.from_bytes(
            hashlib.md5(w.encode("utf-8")).digest()[:8], "little"))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    fp = 0
    for i in range(64):
        if acc[i] > 0:
            fp |= (1 << i)
    return fp


def _simhash_batch(col) -> np.ndarray:
    """Vectorized SimHash of every doc in a batch (uint64 per doc): one
    tokenize pass, per-doc DISTINCT words via dictionary codes, md5 only
    over the batch's word dictionary, then a (pairs x 64) +-1 vote matrix
    summed per doc with ``np.add.reduceat``. Bit-identical to
    :func:`simhash64` (asserted in tests)."""
    words, doc_of = _words_flat(col)
    n_docs = int(doc_of[-1]) + 1 if len(doc_of) else 0
    dic = pa.array(words, pa.string()).dictionary_encode()
    codes = dic.indices.to_numpy().astype(np.int64)
    n_dict = len(dic.dictionary)
    ukey = np.unique(doc_of * n_dict + codes)  # distinct (doc, word)
    udoc, ucode = ukey // n_dict, ukey % n_dict
    hu = np.fromiter(
        (int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "little")
         for w in dic.dictionary.to_pylist()),
        dtype=np.uint64, count=n_dict)
    h = hu[ucode]
    shifts = np.arange(64, dtype=np.uint64)
    # bit matrix via ONE unpackbits pass over the little-endian byte view
    # (x86 byte 0 = least significant, so column j == bit j): uint8 output,
    # 8x smaller than the previous shift-matrix of int32 votes whose four
    # (pairs x 64) temporaries dominated the stage (measured 2.5-6.9 s vs
    # 0.09 s per 4096-doc batch). Vote sign: acc = 2*ones - n, so
    # acc > 0  <=>  2*bitcount > n_words — computed on the small (docs x
    # 64) count matrix instead.
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little")       # (pairs, 64) of 0/1
    starts = np.flatnonzero(np.concatenate([[True], udoc[1:] != udoc[:-1]]))
    cnt = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
    nw = np.append(starts[1:], len(h)) - starts   # distinct words per doc
    fp = ((2 * cnt > nw[:, None]).astype(np.uint64) << shifts[None, :]) \
        .sum(axis=1, dtype=np.uint64)
    out = np.zeros(n_docs, dtype=np.uint64)
    out[udoc[starts]] = fp
    return out


def simhash_pairs(docs: ray.data.Dataset, max_hamming: int = 3,
                  num_partitions: int = 16) -> ray.data.Dataset:
    """Pairs with SimHash Hamming distance <= max_hamming, via 4x16-bit band
    bucketing (pigeonhole-complete for distance <= 3)."""

    def fp_rows(b: pa.Table) -> pa.Table:
        fp = _simhash_batch(b["text"])                       # (n,) uint64
        did = pc.cast(b["doc_id"], pa.int64()).combine_chunks().to_numpy()
        n = len(fp)
        band = np.tile(np.arange(4, dtype=np.int32), n)
        fp_rep = np.repeat(fp, 4)
        keys = (fp_rep >> (band.astype(np.uint64) * np.uint64(16))) \
            & np.uint64(0xFFFF)
        return pa.table({
            "doc_id": pa.array(np.repeat(did, 4)),
            "band": pa.array(band),
            "band_key": pa.array(keys.astype(np.int64)),
            "fp": pa.array(fp_rep.view(np.int64))})  # store as signed int64

    def block_pairs(b: pa.Table) -> pa.Table:
        # complete (band, band_key) groups per block (functions/grouped.py).
        # Fully vectorized across ALL groups in the block (the previous
        # per-group Python loop over ~250k mostly-singleton buckets cost
        # ~7 s/task at 200k docs): rows are re-ordered by (group, doc_id),
        # every within-group ordered pair is enumerated with cumsum/repeat
        # index arithmetic, and hamming distance is ONE unpackbits popcount
        # over the XOR of the gathered fingerprint pairs.
        from ..functions.grouped import group_ids
        out_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                                ("hamming", pa.int64())])
        gid, starts = group_ids(b, ["band", "band_key"])
        if len(starts) == 0:
            return out_schema.empty_table()
        ids = b["doc_id"].to_numpy()
        fps = b["fp"].to_numpy().astype(np.int64).view(np.uint64)
        # sort rows by (group, doc_id): pairs come out doc_a < doc_b
        order = np.lexsort((ids, gid))
        gid_s, ids_s, fps_s = gid[order], ids[order], fps[order]
        # j_local(r) = #rows before r in its group = pair count ending at r
        row = np.arange(len(gid_s), dtype=np.int64)
        is_start = np.concatenate([[True], gid_s[1:] != gid_s[:-1]])
        grp_start = np.maximum.accumulate(np.where(is_start, row, 0))
        j_local = row - grp_start
        total = int(j_local.sum())
        if total == 0:
            return out_schema.empty_table()
        # second elements: row r repeated j_local(r) times; first elements:
        # consecutive ranges grp_start(r) .. r-1
        second = np.repeat(row, j_local)
        csum = np.cumsum(j_local) - j_local
        first = (np.arange(total, dtype=np.int64)
                 - np.repeat(csum, j_local) + np.repeat(grp_start, j_local))
        x = fps_s[first] ^ fps_s[second]
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1) \
            .sum(axis=1, dtype=np.int64)
        # equal-id guard (the old per-group np.unique dropped duplicates);
        # with unique doc_ids this filters nothing
        keep = (ham <= max_hamming) & (ids_s[first] != ids_s[second])
        if not keep.any():
            return out_schema.empty_table()
        t = pa.table({"doc_a": pa.array(ids_s[first[keep]]),
                      "doc_b": pa.array(ids_s[second[keep]]),
                      "hamming": pa.array(ham[keep])})
        return t.group_by(["doc_a", "doc_b"], use_threads=False) \
                .aggregate([("hamming", "min")]) \
                .rename_columns(["doc_a", "doc_b", "hamming"])

    from ..functions.grouped import sorted_aggregate, sorted_group_apply
    local = sorted_group_apply(
        docs.map_batches(fp_rows, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["band", "band_key"], block_pairs, num_partitions)
    # sorted_aggregate output is already sorted by (doc_a, doc_b)
    return sorted_aggregate(local, ["doc_a", "doc_b"],
                            [("hamming", "min")],
                            ["doc_a", "doc_b", "hamming"],
                            num_partitions)


# --------------------------------------------------------------------------
# embedding cosine: blocked exact engine + random-hyperplane LSH scale path
# --------------------------------------------------------------------------
#
# Two engines, same output contract (doc_a < doc_b, cosine rounded to 6 dp):
#
# * blocked exact — a distributed block-nested-loop over all O(B^2) ordered
#   block pairs. The normalized blocks live in the OBJECT STORE (the driver
#   holds only ObjectRefs); each block-pair task pulls exactly two blocks,
#   does one matmul, and emits either thresholded pairs or a local top-k.
#   O(N^2) compute (inherent to exact all-pairs) but O(block^2) task memory
#   and zero driver materialization — the 100 TB failure mode of round 1
#   (to_arrow_refs -> ray.get -> driver concat) is gone.
# * random-hyperplane LSH — the scale path: a stateless map_batches emits
#   (band, bucket_key) signature rows, one sort colocates buckets, and an
#   in-bucket exact cosine verify emits pairs; a sorted aggregate dedups
#   pairs found in multiple bands. Only O(bands) small rows per vector are
#   shuffled; no stage ever sees more than one bucket group at a time.
#   Collision probability per hyperplane is 1 - theta/pi, so with
#   ``rows_per_band`` r and ``bands`` b the miss probability of a pair at
#   cosine c is (1 - p^r)^b, p = 1 - arccos(c)/pi. The defaults below
#   (r=2, b=128) give < 1e-26 at c = 0.35 — verified exhaustively against
#   the blocked engine in tests and against the DuckDB all-pairs oracle.

_LSH_SEED = 777


def _load_matrix(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = b["vec_id"].to_numpy()
    mat = np.asarray(b["embedding"].combine_chunks().to_numpy(zero_copy_only=False).tolist(),
                     dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


# worker-process-level decoded-block cache for the blocked engine: tasks on
# the same worker reuse the numpy conversion (the object-store fetch itself
# is zero-copy within a node). Keyed by ObjectRef hex; LRU-bounded.
_BLOCK_CACHE: dict[str, tuple[np.ndarray, np.ndarray]] = {}


def _cached_block(ref) -> tuple[np.ndarray, np.ndarray]:
    key = ref.hex()
    if key not in _BLOCK_CACHE:
        if len(_BLOCK_CACHE) >= 8:
            _BLOCK_CACHE.pop(next(iter(_BLOCK_CACHE)))
        _BLOCK_CACHE[key] = _load_matrix(ray.get(ref))
    return _BLOCK_CACHE[key]


def _block_pair_task(refs, threshold, topk):
    """Task function for the blocked engine: scores one (i, j) ordered block
    pair per input row. Runs in the stateless task pool (no actor startup);
    decoded blocks are cached per worker process (:data:`_BLOCK_CACHE`)."""

    def score_pairs(b: pa.Table) -> pa.Table:
            out = []
            for i, j in zip(b["i"].to_pylist(), b["j"].to_pylist()):
                ids_a, mat_a = _cached_block(refs[i])
                ids_b, mat_b = _cached_block(refs[j])
                s = np.round(mat_a @ mat_b.T, 6)  # (na, nb)
                if i == j:
                    # within a block each unordered pair appears twice;
                    # keep the id-ascending triangle
                    mask = ids_a[:, None] < ids_b[None, :]
                else:
                    # across blocks each unordered pair appears exactly once;
                    # blocks are NOT globally id-ordered (the streaming
                    # executor reorders blocks), so canonicalize below
                    mask = np.ones_like(s, dtype=bool)
                if threshold is not None:
                    mask &= s >= threshold
                ia, ib = np.nonzero(mask)
                da, db, sc = ids_a[ia], ids_b[ib], s[ia, ib]
                if i != j:
                    da, db = np.minimum(da, db), np.maximum(da, db)
                if topk is not None and len(sc) > topk:
                    # local top-k on ROUNDED scores, (doc_a, doc_b) asc
                    # tie-break — matches the global sort exactly, so ties
                    # at the k-th score cannot be dropped nondeterministically
                    order = np.lexsort((db, da, -sc))[:topk]
                    da, db, sc = da[order], db[order], sc[order]
                out.append((da, db, sc))
            if not out:
                return pa.table({"doc_a": pa.array([], pa.int64()),
                                 "doc_b": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            return pa.table({
                "doc_a": pa.array(np.concatenate([o[0] for o in out]).astype(np.int64)),
                "doc_b": pa.array(np.concatenate([o[1] for o in out]).astype(np.int64)),
                "cosine": pa.array(np.concatenate([o[2] for o in out]).astype(np.float64))})

    return score_pairs


def _normalized_block_refs(embeddings: ray.data.Dataset,
                           target_block_rows: int = 8192) -> list:
    """Materialize L2-normalized (vec_id, embedding) blocks INTO THE OBJECT
    STORE and return their refs (driver holds refs only, never the data)."""
    def norm(b: pa.Table) -> pa.Table:
        ids, mat = _load_matrix(b)
        return pa.table({
            "vec_id": pa.array(ids.astype(np.int64)),
            "embedding": pa.array(list(mat), pa.list_(pa.float64()))})

    n = embeddings.count()
    num_blocks = max(1, -(-n // target_block_rows))
    # always repartition to the target: the task count of the pair stage is
    # O(blocks^2), so both oversized AND undersized natural blocks hurt
    normed = embeddings.map_batches(norm, batch_format="pyarrow",
                                    zero_copy_batch=True) \
                       .repartition(num_blocks)
    return normed.to_arrow_refs()


def _blocked_pairs(embeddings: ray.data.Dataset, threshold: float | None,
                   topk: int | None, concurrency: int = 8,
                   target_block_rows: int = 8192) -> ray.data.Dataset:
    refs = _normalized_block_refs(embeddings, target_block_rows)
    B = len(refs)
    pair_items = [{"i": i, "j": j} for i in range(B) for j in range(i, B)]
    pairs = ray.data.from_items(pair_items)
    fn = _block_pair_task(refs, threshold, topk)
    # stateless task pool: one task per block pair, auto-scaled by the
    # streaming executor (``concurrency`` kept for API compat; unused)
    return pairs.map_batches(fn, batch_format="pyarrow", batch_size=1)


def embedding_topk_pairs(embeddings: ray.data.Dataset, topk: int = 20,
                         concurrency: int = 8) -> ray.data.Dataset:
    """Global top-k most-similar vector pairs by cosine (exact, blocked
    engine). Each of the O(B^2) block-pair tasks keeps its local top-k
    (rounded-score order with id tie-break), then ONE small global sort
    picks the winners. Deterministic: (cosine desc, doc_a, doc_b)."""
    scored = _blocked_pairs(embeddings, None, topk, concurrency)
    return scored.sort(["cosine", "doc_a", "doc_b"],
                       descending=[True, False, False]).limit(topk)


def embedding_near_dup_blocked(embeddings: ray.data.Dataset,
                               threshold: float = 0.35,
                               concurrency: int = 8) -> ray.data.Dataset:
    """All pairs with cosine >= threshold — exact blocked engine (the
    baseline the LSH path is verified against)."""
    return _blocked_pairs(embeddings, threshold, None, concurrency) \
        .sort(["doc_a", "doc_b"])


def embedding_near_dup_pairs(embeddings: ray.data.Dataset,
                             threshold: float = 0.35,
                             bands: int = 128, rows_per_band: int = 2,
                             seed: int = _LSH_SEED,
                             num_partitions: int | None = None,
                             broadcast_bytes: int = _BROADCAST_TEXT_BYTES
                             ) -> ray.data.Dataset:
    """All pairs with cosine >= threshold via random-hyperplane LSH — the
    scale path (module comment): signature rows shuffle, in-bucket exact
    verify, cross-band dedup.

    Vector transport (how the verify stage gets its vectors) is two-regime:

    * **broadcast** — when the whole embedding matrix fits a node's object
      store (``size <= broadcast_bytes``): a WORKER task concatenates the
      blocks into one sorted (ids, matrix) lookup (the driver only passes
      ObjectRefs — no driver materialization) and every bucket gathers its
      rows from the shared plasma buffer. The shuffle then carries three
      small ints per signature row instead of the full vector once per
      band — a ``bands``-fold shuffle-byte reduction.
    * **ride-along** — beyond that, the embedding column rides the shuffle
      once per band; no stage ever holds more than its bucket. Unbounded
      scale, ``bands``x the shuffle bytes.

    Parameter guidance: the miss probability of a pair at cosine c is
    (1 - p^r)^b with p = 1 - arccos(c)/pi. Defaults (b=128, r=2) are sized
    for low thresholds (c >= 0.35 -> < 1e-26); for c >= 0.9 use e.g.
    (b=16, r=8) to keep buckets small at scale. Hyperplanes are a fixed
    function of (seed, dim) so reruns are deterministic.
    """
    nbits = bands * rows_per_band
    weights = (1 << np.arange(rows_per_band, dtype=np.int64))
    sz = embeddings.size_bytes()
    broadcast = sz is not None and sz <= broadcast_bytes
    lookup = None
    if broadcast:
        embeddings = embeddings.materialize()  # consumed twice in this mode
        refs = embeddings.to_arrow_refs()

        @ray.remote
        def _build_lookup(*blocks: pa.Table):
            from ..functions.grouped import concat_nonempty
            ids, mat = _load_matrix(concat_nonempty(list(blocks)))
            order = np.argsort(ids)
            return ids[order], mat[order]

        lookup = _build_lookup.remote(*refs)

    def sig_rows(b: pa.Table) -> pa.Table:
        ids, mat = _load_matrix(b)
        n, dim = mat.shape
        # deterministic per (seed, dim); cheap enough to build per batch
        H = np.random.RandomState(seed).standard_normal((nbits, dim))
        bits = (mat @ H.T) > 0                       # (n, nbits)
        keys = bits.reshape(n, bands, rows_per_band) @ weights  # (n, bands)
        band_idx = np.tile(np.arange(bands, dtype=np.int32), n)
        cols = {
            "band": pa.array(band_idx),
            "bkey": pa.array(keys.reshape(-1).astype(np.int64)),
            "vec_id": pa.array(np.repeat(ids.astype(np.int64), bands))}
        if not broadcast:
            cols["embedding"] = pa.array(
                list(np.repeat(mat, bands, axis=0)), pa.list_(pa.float64()))
        return pa.table(cols)

    def bucket_pairs(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                                ("cosine", pa.float64())])
        from ..functions.grouped import group_ids
        gid, starts = group_ids(b, ["band", "bkey"])
        if len(starts) == 0:
            return out_schema.empty_table()
        ids = b["vec_id"].to_numpy()
        if broadcast:
            sids, smat = ray.get(lookup)
        else:
            mat = np.asarray(
                b["embedding"].combine_chunks()
                .to_numpy(zero_copy_only=False).tolist(), dtype=np.float64)
        ends = np.append(starts[1:], b.num_rows)
        out_a, out_b, out_s = [], [], []
        for s, e in zip(starts, ends):
            d, idx = np.unique(ids[s:e], return_index=True)
            if len(d) < 2:
                continue
            m = smat[np.searchsorted(sids, d)] if broadcast \
                else mat[s:e][idx]
            sc = np.round(m @ m.T, 6)
            iu, ju = np.triu_indices(len(d), k=1)
            keep = sc[iu, ju] >= threshold
            out_a.append(d[iu][keep])
            out_b.append(d[ju][keep])
            out_s.append(sc[iu, ju][keep])
        if not out_a:
            return out_schema.empty_table()
        t = pa.table({"doc_a": pa.array(np.concatenate(out_a)),
                      "doc_b": pa.array(np.concatenate(out_b)),
                      "cosine": pa.array(np.concatenate(out_s))})
        # local combine: same pair found in several buckets of one block
        return t.group_by(["doc_a", "doc_b"], use_threads=False) \
                .aggregate([("cosine", "min")]) \
                .rename_columns(["doc_a", "doc_b", "cosine"])

    from ..functions.grouped import sorted_aggregate, sorted_group_apply
    local = sorted_group_apply(
        embeddings.map_batches(sig_rows, batch_format="pyarrow",
                               zero_copy_batch=True),
        ["band", "bkey"], bucket_pairs, num_partitions)
    # cross-band dedup; cosine identical in every band -> min is the value
    return sorted_aggregate(local, ["doc_a", "doc_b"],
                            [("cosine", "min")],
                            ["doc_a", "doc_b", "cosine"],
                            num_partitions)


def fingerprint_near_dup_pairs(docs: ray.data.Dataset, min_common: int = 5,
                               max_df: int = 64,
                               num_partitions: int = 16) -> ray.data.Dataset:
    """Near-duplicate pairs by shared winnowing fingerprints (the
    plagiarism-detection classic — Schleimer et al., SIGMOD 2003): two docs
    pair when they share >= ``min_common`` distinct fingerprint values.

    Composition of existing primitives: the winnowing stage
    (``textstats.winnow_fingerprints``) explodes each doc into its distinct
    fingerprint picks; ``functions/grouped.pairs_within_groups`` turns the
    (fingerprint -> docs) postings into counted pairs. Fingerprints shared
    by more than ``max_df`` docs are DROPPED whole (``drop_over``): the
    standard stop-key rule — boilerplate grams pair everything with
    everything and carry no near-dup signal — and an exact semantic the SQL
    oracle mirrors with ``HAVING count(*) <= max_df``.

    Scale shape: postings shuffle once (grouped by fingerprint), pairs
    aggregate once; no driver materialization, no all-pairs scan.
    """
    from .textstats import winnow_fingerprints
    from ..functions.grouped import pairs_within_groups

    def explode(b: pa.Table) -> pa.Table:
        did = pc.cast(b["doc_id"], pa.int64()).combine_chunks().to_numpy() \
            if isinstance(b["doc_id"], pa.ChunkedArray) \
            else pc.cast(b["doc_id"], pa.int64()).to_numpy()
        fps, owners = [], []
        for i, t in enumerate(b["text"].to_pylist()):
            f = winnow_fingerprints(t)
            fps.extend(f)
            owners.extend([did[i]] * len(f))
        return pa.table({"fp": pa.array(fps, pa.int64()),
                         "doc_id": pa.array(owners, pa.int64())})

    postings = docs.map_batches(explode, batch_format="pyarrow",
                                zero_copy_batch=True)
    pairs = pairs_within_groups(postings, ["fp"], "doc_id",
                                count_col="n_common", drop_over=max_df,
                                num_partitions=num_partitions)

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["n_common"], min_common))

    return pairs.map_batches(keep, batch_format="pyarrow",
                             zero_copy_batch=True).sort(["doc_a", "doc_b"])


def _local_components(u: np.ndarray, v: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray]:
    """(nodes, canon): connected components of a small edge list by
    vectorized min-label propagation with pointer jumping — all numpy, no
    Python loop over edges. Semantically identical to
    ``functions/components.connected_components`` (canon = numeric minimum
    id of the component)."""
    uniq, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    eu, ev = inv[:len(u)], inv[len(u):]
    lab = np.arange(len(uniq), dtype=np.int64)
    while True:
        m = np.minimum(lab[eu], lab[ev])
        nl = lab.copy()
        np.minimum.at(nl, eu, m)
        np.minimum.at(nl, ev, m)
        nl = nl[nl]  # pointer jumping halves tree depth per round
        if np.array_equal(nl, lab):
            break
        lab = nl
    # uniq is ascending, so min dense index == min id
    return uniq, uniq[lab]


def dedup_canonical_map(docs: ray.data.Dataset, pairs: ray.data.Dataset,
                        id_col: str = "doc_id",
                        num_partitions: int = 8,
                        local_threshold: int = 2_000_000
                        ) -> ray.data.Dataset:
    """(doc_id, canon_id, is_dup): every document mapped to the MINIMUM doc
    id of its near-duplicate component — the keep/drop decision that turns a
    pair list into an actual dedup.

    Near-dup "same document" relations are not transitive pair-by-pair, but
    dedup must be: if A~B and B~C, keeping A and C double-counts B's
    content. Components over the pair graph (functions/components.py —
    shuffle-native min-label propagation) give the transitive closure;
    canon = component minimum (deterministic keep-first).

    Scale shape: components run on the PAIR set (candidate-sized — a sliver
    of the corpus); the resulting (node -> label) map is pair-sized too and
    is broadcast once; the corpus itself streams through one stateless map
    and never shuffles. Docs in no pair are their own canonical.
    """
    from ..functions.components import connected_components

    # components compare labels as STRINGS: zero-pad ids so lexicographic
    # min == numeric min (doc "10" < "9" otherwise)
    def to_edges(b: pa.Table) -> pa.Table:
        def pad(c):
            return pc.utf8_lpad(pc.cast(pc.cast(b[c], pa.int64()),
                                        pa.string()), 20, "0")
        return pa.table({"u": pad("doc_a"), "v": pad("doc_b")})

    # size the propagation shuffle to the MEASURED pair volume (pairs are
    # re-read every propagation round anyway, so materializing is free):
    # Ray's hash join crashes on partitions that receive zero left shards
    # (functions/joins.py module comment), which a tiny pair graph at the
    # cluster-default partition count would hit.
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs <= local_threshold:
        # Pair graphs are candidate-sized (a sliver of the corpus), and the
        # blocks are already materialized for sizing: below the threshold
        # run the vectorized local propagation directly on them — the
        # distributed loop pays join + aggregate + convergence-check
        # executor jobs PER ROUND, a fixed multi-second tax a 10k-edge
        # graph doesn't deserve. Same labels either way (pytest-pinned).
        from ..functions.grouped import concat_nonempty
        ptbl = concat_nonempty(ray.get(pairs.to_arrow_refs()))
        if ptbl.num_rows:
            u = pc.cast(ptbl["doc_a"], pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            v = pc.cast(ptbl["doc_b"], pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            nodes, canon = _local_components(u, v)
        else:
            nodes = canon = np.empty(0, np.int64)
        map_ref = ray.put((nodes, canon))  # nodes ascending from np.unique
    else:
        np_cc = max(1, min(num_partitions, (n_pairs + 99_999) // 100_000))
        labels = connected_components(
            pairs.map_batches(to_edges, batch_format="pyarrow"),
            num_partitions=np_cc)
        from ..functions.grouped import concat_nonempty
        lab_tbl = concat_nonempty(
            ray.get(labels.materialize().to_arrow_refs()))
        nodes = pc.cast(lab_tbl["node"], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        canon = pc.cast(lab_tbl["label"], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        order = np.argsort(nodes)
        map_ref = ray.put((nodes[order], canon[order]))

    def assign(b: pa.Table) -> pa.Table:
        ns, cs = ray.get(map_ref)
        did = pc.cast(b[id_col], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False) \
            if isinstance(b[id_col], pa.ChunkedArray) \
            else pc.cast(b[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        out = did.copy()
        if len(ns):
            idx = np.searchsorted(ns, did)
            idx[idx == len(ns)] = 0
            hit = ns[idx] == did
            out[hit] = cs[idx[hit]]
        return pa.table({
            id_col: pa.array(did),
            "canon_id": pa.array(out),
            "is_dup": pa.array(out != did)})

    return docs.map_batches(assign, batch_format="pyarrow",
                            zero_copy_batch=True).sort(id_col)


def _kmeans_fp_local(mfp: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Driver-local twin of ``functions.kmeans.kmeans_fp`` for BOUNDED
    samples (arithmetic-identical; equality pytest-pinned): lowest-id
    init, integer-L2 first-min assignment, floor-division centroid means,
    empty clusters keep their previous centroid."""
    from ..functions.kmeans import _assign
    cents = mfp[:min(k, len(mfp))].copy()
    for _ in range(iters):
        a = _assign(mfp, cents)
        nxt = cents.copy()
        for c in range(len(cents)):
            sel = mfp[a == c]
            if len(sel):
                nxt[c] = sel.sum(axis=0) // len(sel)
        cents = nxt
    return cents


def semantic_dedup(embeddings: ray.data.Dataset, threshold: float = 0.35,
                   n_clusters: int = 16,
                   sample_rows: int = 4096,
                   iters: int = 5) -> ray.data.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): k-means
    cluster the embedding space, then GREEDILY keep the lowest-id member of
    every cosine>=threshold neighborhood within each cluster — a later
    vector is dropped iff it is within threshold of an already-KEPT earlier
    one (chains past the threshold survive; that is the paper's semantics,
    distinct from the connected-component keep rule of
    :func:`dedup_canonical_map`).

    Deterministic end to end (round 5 — the last no-oracle dedup op made
    hash-gateable): clustering uses the EXACT fixed-point Lloyd trainer on
    the deterministic low-id sample ``vec_id < sample_rows``
    (``functions.kmeans.kmeans_fp`` — the same bit-reproducible quantizer
    the green IVF twin uses) and integer squared-L2 routing with ties to
    the lowest cluster id; the in-cluster greedy compares cosines rounded
    to 1e-6 (the green ann-cosine idiom). The DuckDB twin
    (``queries._semantic_dedup_sql``) unrolls the Lloyd chain and replays
    the greedy with a per-cluster recursive CTE carrying the kept set.

    Scale shape: centroids come from a BOUNDED sample (never the full
    matrix) and are broadcast once via ``ray.put``; cluster assignment is a
    stateless broadcast-state ``map_batches``; ONE sort on cluster
    colocates each complete cluster in a block (functions/grouped.py
    invariant), and the in-block greedy does one (k x k) matmul per
    cluster plus an O(k) scan with vectorized inner steps. Per-cluster
    size is the memory bound — size ``n_clusters`` to the corpus (the same
    bound IVF documents). Still approximate BY DESIGN at the clustering
    level (a near-dup pair split across clusters is missed) — but now
    deterministically so, hence oracle-checkable.

    Output: (vec_id, cluster, keep) sorted by vec_id.
    """
    from ..functions.grouped import sorted_group_apply
    from ..functions.kmeans import _assign, _fp_matrix

    # Lloyd on the BOUNDED sample runs DRIVER-LOCAL: the sample is <=
    # sample_rows rows by construction (vec_id < sample_rows, unique ids
    # — ~2 MB of fp vectors), and the trainer below is arithmetic-
    # identical to functions.kmeans.kmeans_fp (lowest-id init, integer-L2
    # first-min assignment, floor-division means, empty clusters keep
    # their centroid; equality pytest-pinned), so training costs zero Ray
    # jobs instead of 5 iterations x (map + shuffle + take_all) of
    # scheduling latency. The full-corpus distributed trainer remains
    # `kmeans_fp` for unbounded inputs.
    sample_parts = [t for t in (ray.get(r) for r in embeddings.filter(
        expr=f"vec_id < {sample_rows}").to_arrow_refs()) if t.num_rows]
    if not sample_parts:
        raise ValueError(
            f"semantic_dedup: no vectors with vec_id < {sample_rows} to "
            "train centroids on (empty corpus, or ids do not start near "
            "0 — raise sample_rows)")
    sample_tab = pa.concat_tables(sample_parts)
    sample_tab = sample_tab.take(
        pa.array(np.argsort(sample_tab["vec_id"].to_numpy())))
    cents = _kmeans_fp_local(_fp_matrix(sample_tab, "embedding"),
                             n_clusters, iters)
    cent_ref = ray.put(cents)

    class Assign:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids, mat = _load_matrix(b)
            cl = _assign(_fp_matrix(b, "embedding"), self.cent)
            return pa.table({
                "vec_id": pa.array(ids.astype(np.int64)),
                "cluster": pa.array(cl),
                "embedding": pa.array(list(mat), pa.list_(pa.float64()))})

    from ..functions.broadcast import broadcast_map_batches
    assigned = broadcast_map_batches(embeddings, Assign,
                                     batch_format="pyarrow",
                                     batch_size=4096, zero_copy_batch=True)

    def greedy_block(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("vec_id", pa.int64()),
                                ("cluster", pa.int64()),
                                ("keep", pa.bool_())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        ids, mat = _load_matrix(b)
        cl = b["cluster"].to_numpy()
        order = np.lexsort((ids, cl))
        ids, mat, cl = ids[order], mat[order], cl[order]
        starts = np.flatnonzero(
            np.concatenate([[True], cl[1:] != cl[:-1]]))
        bounds = np.append(starts, len(cl))
        keep = np.ones(len(cl), bool)
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = mat[s:e]
            if e - s > 1:
                sims = np.round(m @ m.T, 6)
                kept: list[int] = []
                for i in range(e - s):
                    if kept and sims[i, kept].max() >= threshold:
                        keep[s + i] = False
                    else:
                        kept.append(i)
        return pa.table({"vec_id": pa.array(ids.astype(np.int64)),
                         "cluster": pa.array(cl.astype(np.int64)),
                         "keep": pa.array(keep)}, schema=out_schema)

    return sorted_group_apply(assigned, ["cluster"], greedy_block) \
        .sort("vec_id")


# --------------------------------------------------------------------------
# prefix / truncation duplicates
# --------------------------------------------------------------------------
# Scraped corpora carry truncation dups: one capture is a PREFIX of a longer
# capture of the same page. Exact dedup misses them (different hashes);
# shingle dedup finds only high-Jaccard ones. Prefix containment has a
# sort-native exact algorithm: after a global sort by text, doc A is a
# prefix of SOME other doc iff (a) its immediate successor starts with A's
# text, or (b) its immediate predecessor equals A's text. (If A <= B <= C
# sorted and C starts with A, every string in between starts with A too —
# so checking the successor alone is complete; the predecessor-equal case
# covers the last member of an equal run.) One all-to-all (the sort), one
# vectorized byte-compare pass per block, plus O(#blocks) boundary rows
# stitched on the driver — no pairwise blow-up anywhere.


def _next_startswith(offs: np.ndarray, data: np.ndarray) -> np.ndarray:
    """bool[i] = row i+1's string starts with row i's (last row False).
    One flat byte-gather per block (the kwic offset trick) — no per-row
    Python."""
    n = len(offs) - 1
    if n <= 1:
        return np.zeros(n, bool)
    starts, lens = offs[:-1], np.diff(offs)
    l_own = lens[:-1]
    res = l_own <= lens[1:]           # length-compatible (empty -> True)
    cand = np.flatnonzero(res & (l_own > 0))
    if len(cand):
        ls = l_own[cand]
        seg_end = np.cumsum(ls)
        pos = np.arange(seg_end[-1]) - np.repeat(seg_end - ls, ls)
        own = data[np.repeat(starts[:-1][cand], ls) + pos]
        nxt = data[np.repeat(starts[1:][cand], ls) + pos]
        bad = np.unique(np.searchsorted(seg_end, np.flatnonzero(own != nxt),
                                        side="right"))
        ok = np.ones(len(cand), bool)
        ok[bad] = False
        res[cand] = ok
    return np.append(res, False)


def _text_bytes(col) -> tuple[np.ndarray, np.ndarray]:
    """(int64 offsets, uint8 data) views of a string column, copy-free up
    to the large_string cast."""
    a = pc.cast(col, pa.large_string())
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    offs = np.frombuffer(a.buffers()[1], np.int64,
                         len(a) + 1, a.offset * 8)
    data = np.frombuffer(a.buffers()[2], np.uint8)
    return offs, data


def prefix_duplicates(docs: ray.data.Dataset,
                      num_partitions: int | None = None
                      ) -> ray.data.Dataset:
    """Return the (doc_id) rows whose text is a prefix of (or equal to)
    some OTHER document's text, sorted by doc_id. See the section comment
    for the sort-adjacency argument."""
    ds = docs.map_batches(
        lambda b: (b.replace_schema_metadata(None)
                   if b.schema.metadata else b),
        batch_format="pyarrow", zero_copy_batch=True)
    if num_partitions is not None:
        ds = ds.repartition(num_partitions)
    # sort by text ONLY: the equal-keys-never-split block invariant
    # (stages/materialize.py) must hold for equal TEXTS — a (text, id)
    # composite key would let an equal-text run straddle blocks and the
    # block-local predecessor-equal check would miss the run's tail
    # (caught by the hypothesis brute-force property test)
    srt = ds.sort(["text"]).materialize()

    # boundary stitch: last row of block i vs first row of block i+1 in
    # global text order. O(#blocks) tiny rows via one remote task per
    # block ref — the blocks themselves never touch the driver.
    @ray.remote
    def edge_rows(block: pa.Table):
        if block.num_rows == 0:
            return None
        f, l = block.slice(0, 1), block.slice(block.num_rows - 1, 1)
        return (f["text"][0].as_py(), f["doc_id"][0].as_py(),
                l["text"][0].as_py(), l["doc_id"][0].as_py())

    infos = [e for e in ray.get(
        [edge_rows.remote(r) for r in srt.to_arrow_refs()]) if e]
    infos.sort(key=lambda e: (e[0], e[1]))  # block order = range order
    boundary_dups = {prev[3] for prev, nxt in zip(infos, infos[1:])
                     if nxt[0].startswith(prev[2])}
    bset = ray.put(np.array(sorted(boundary_dups), np.int64))

    def block_flags(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("doc_id", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        offs, data = _text_bytes(b["text"])
        nsw = _next_startswith(offs, data)
        lens = np.diff(offs)
        # predecessor equal <=> predecessor startswith AND same length
        prev_eq = np.concatenate([[False], nsw[:-1] &
                                  (lens[:-1] == lens[1:])])
        ids = pc.cast(b["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        flag = nsw | prev_eq | np.isin(ids, ray.get(bset))
        return pa.table({"doc_id": pa.array(ids[flag])}, schema=out_schema)

    return srt.map_batches(block_flags, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True) \
        .sort("doc_id")


def suffix_duplicates(docs: ray.data.Dataset,
                      num_partitions: int | None = None
                      ) -> ray.data.Dataset:
    """Suffix/truncation duplicates: doc ids whose text is a SUFFIX of (or
    equal to) another document's — head-truncated captures, the mirror of
    :func:`prefix_duplicates`. A suffix of s is a prefix of reverse(s), so
    this is one vectorized ``utf8_reverse`` pass feeding the same
    sort-adjacency machinery (codepoint reversal is consistent on both
    sides of the oracle; only equality of reversed strings matters)."""
    rev = docs.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"],
                            "text": pc.utf8_reverse(b["text"])}),
        batch_format="pyarrow", zero_copy_batch=True)
    return prefix_duplicates(rev, num_partitions)


def dedup_keep_best(docs: ray.data.Dataset, pairs: ray.data.Dataset,
                    num_partitions: int = 8) -> ray.data.Dataset:
    """Survivor selection per near-dup cluster by a QUALITY policy:
    (canon_id, keep_doc_id, sz) keeping the LONGEST document (tie: lowest
    doc_id) of each component — real curation keeps the best capture,
    not the arbitrary first. Composes :func:`dedup_canonical_map`'s
    component labels with one per-cluster argmax: the label map is
    pair-sized, docs attach their length via one int-keyed co-group, and
    the argmax runs on complete sorted canon groups."""
    from ..functions.grouped import group_ids, sorted_group_apply
    from ..functions.joins import attach_column

    cm = dedup_canonical_map(docs, pairs, num_partitions=num_partitions)
    labeled = attach_column(
        cm.map_batches(lambda b: b.select(["doc_id", "canon_id"]),
                       batch_format="pyarrow", zero_copy_batch=True),
        docs,
        [("doc_id", pa.int64()), ("canon_id", pa.int64())],
        "doc_id", "doc_id", "n_chars", "n_chars", pa.int64(),
        num_partitions)

    out_schema = pa.schema([("canon_id", pa.int64()),
                            ("keep_doc_id", pa.int64()),
                            ("sz", pa.int64())])

    def argmax_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["canon_id"])
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        ln = b["n_chars"].to_numpy(zero_copy_only=False)
        # per group: max n_chars, then min doc_id among the maxima —
        # one lexsort, pick each group's first row
        order = np.lexsort((ids, -ln, gid))
        g_sorted = gid[order]
        first = np.flatnonzero(
            np.concatenate([[True], g_sorted[1:] != g_sorted[:-1]]))
        sz = np.diff(np.append(starts, len(gid))).astype(np.int64)
        return pa.table({
            "canon_id": pc.cast(b["canon_id"], pa.int64()).take(
                pa.array(starts)),
            "keep_doc_id": pa.array(ids[order[first]]),
            "sz": pa.array(sz)}, schema=out_schema)

    return sorted_group_apply(labeled, ["canon_id"], argmax_block,
                              num_partitions).sort("canon_id")


def containment_pairs(docs: ray.data.Dataset, threshold: float = 0.8,
                      k: int = SHINGLE_K, num_partitions: int = 16,
                      max_posting: int = 10_000) -> ray.data.Dataset:
    """Asymmetric near-dup detection by shingle CONTAINMENT
    (Broder 1997's other resemblance measure): C = |A∩B| / min(|A|,|B|)
    ≥ threshold. Catches the pair symmetric Jaccard structurally CANNOT
    — a short document wholly embedded in a much longer one (quote,
    boilerplate wrapper, prefix crop) has J ≈ |A|/|B| → 0 but C = 1.
    Same scale shape as :func:`ngram_jaccard_pairs` — the posting
    expansion and pair aggregation are shared; only the final ratio
    differs (IEEE division of the same exact integer counts, so the
    DuckDB twin uses least(sa, sb) and matches bit-for-bit)."""
    def explode(b: pa.Table) -> pa.Table:
        doc_idx, codes, dictionary = _distinct_doc_shingles(b["text"], k)
        n = np.bincount(doc_idx, minlength=b.num_rows).astype(np.int64) \
            if len(doc_idx) else np.zeros(b.num_rows, np.int64)
        did = pc.cast(b["doc_id"], pa.int64()).combine_chunks().to_numpy()
        return pa.table({
            "shingle": dictionary.take(pa.array(codes)),
            "doc_id": pa.array(did[doc_idx], pa.int64()),
            "n_shingles": pa.array(n[doc_idx], pa.int64())})

    from ..functions.grouped import pairs_with_carry
    pair_counts = pairs_with_carry(
        docs.map_batches(explode, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["shingle"], "doc_id", "n_shingles", count_col="n_inter",
        max_group=max_posting, num_partitions=num_partitions)

    def contain(b: pa.Table) -> pa.Table:
        inter = b["n_inter"].to_numpy().astype(np.float64)
        lo = np.minimum(b["carry_a"].to_numpy(), b["carry_b"].to_numpy())
        c = inter / lo
        t = pa.table({
            "doc_a": b["doc_a"], "doc_b": b["doc_b"],
            "containment": pa.array(c, pa.float64())})
        return t.filter(pc.greater_equal(t["containment"], threshold))

    return pair_counts.map_batches(contain, batch_format="pyarrow") \
                      .sort(["doc_a", "doc_b"])


# --------------------------------------------------------------------------
# Sorted-neighborhood method (SNM)
# --------------------------------------------------------------------------
# Hernández & Stolfo 1995 (public): entity-resolution candidate generation
# by ONE global sort on a cheap blocking key followed by a fixed-width
# sliding window over the sorted order — O(N·w) candidates instead of the
# O(N²) cross product, and unlike pure key-blocking the window crosses key
# boundaries, so near-miss keys still meet. Distributed plan: in-window
# pairs are emitted per sorted block (vectorized shifts); the <= w rows on
# each side of every block boundary are stitched on the driver via one tiny
# remote task per block ref (the prefix_duplicates edge-row pattern above)
# — O(#blocks·w) driver rows, the blocks themselves never leave the store.


SNM_KEY_LEN = 12
SNM_KEY8 = 8


def _snm_key(text_col) -> pa.Array:
    """Blocking key: first SNM_KEY_LEN chars of the lowercased text with
    spaces removed — cheap, typo-tolerant at the tail, fully vectorized."""
    a = pc.replace_substring(pc.utf8_lower(text_col), " ", "")
    return pc.utf8_slice_codeunits(a, 0, SNM_KEY_LEN)


def sorted_neighborhood_pairs(docs: ray.data.Dataset, window: int = 2,
                              num_partitions: int | None = None
                              ) -> ray.data.Dataset:
    """Candidate pairs (doc_a, doc_b, dist, same_key8) where doc_a is the
    doc at the LOWER sort rank and dist = rank distance (1..window);
    same_key8 flags agreement of the first SNM_KEY8 key chars (the cheap
    comparator an ER pipeline would apply before expensive matching).
    Sorted by (doc_a, doc_b)."""
    w = int(window)

    def keyed(b: pa.Table) -> pa.Table:
        return pa.table({"key": _snm_key(b["text"]),
                         "doc_id": pc.cast(b["doc_id"], pa.int64())})

    ds = docs.map_batches(keyed, batch_format="pyarrow")
    if num_partitions is not None:
        ds = ds.repartition(num_partitions)
    # (key, doc_id) is a total order: every rank lives in exactly one
    # block, so in-block windows + boundary strips cover all pairs.
    srt = ds.sort(["key", "doc_id"]).materialize()

    @ray.remote
    def edge_rows(block: pa.Table):
        n = block.num_rows
        if n == 0:
            return None
        m = min(w, n)
        head = block.slice(0, m)
        tail = block.slice(n - m, m)
        return (block["key"][0].as_py(), block["doc_id"][0].as_py(), n,
                list(zip(head["key"].to_pylist(),
                         head["doc_id"].to_pylist())),
                list(zip(tail["key"].to_pylist(),
                         tail["doc_id"].to_pylist())))

    infos = [e for e in ray.get(
        [edge_rows.remote(r) for r in srt.to_arrow_refs()]) if e]
    infos.sort(key=lambda e: (e[0], e[1]))  # block order = range order
    # reconstruct global ranks of the strip rows (O(#blocks·w) metadata
    # rows), then pair strip rows at rank distance 1..w across DIFFERENT
    # blocks with the SAME searchsorted/shift arithmetic as the in-block
    # pass — rank r pairs with rank r+d iff r+d is also a strip row
    # (guaranteed for cross-block neighbors: both sides of a boundary are
    # in the strips). No Python pair loop.
    ranks, keys, ids, blocks = [], [], [], []
    base = 0
    for bi, (_, _, n, head, tail) in enumerate(infos):
        m = len(head)
        for j, (k, d) in enumerate(head):
            ranks.append(base + j)
            keys.append(k)
            ids.append(d)
            blocks.append(bi)
        for j, (k, d) in enumerate(tail):
            r = base + n - m + j
            if r >= base + m:  # avoid double-adding head==tail rows
                ranks.append(r)
                keys.append(k)
                ids.append(d)
                blocks.append(bi)
        base += n
    i64 = pa.int64()
    out_schema = pa.schema([("doc_a", i64), ("doc_b", i64),
                            ("dist", i64), ("same_key8", i64)])
    ranks_a = np.asarray(ranks, np.int64)
    order = np.argsort(ranks_a)
    ranks_a = ranks_a[order]
    ids_a = np.asarray(ids, np.int64)[order]
    blocks_a = np.asarray(blocks, np.int64)[order]
    k8 = np.asarray([k[:SNM_KEY8] for k in keys], dtype=object)[order]
    parts = [out_schema.empty_table()]
    for d in range(1, (w + 1) if len(ranks_a) else 0):
        idx = np.searchsorted(ranks_a, ranks_a + d)
        idxc = np.minimum(idx, len(ranks_a) - 1)
        ok = ((idx < len(ranks_a)) & (ranks_a[idxc] == ranks_a + d)
              & (blocks_a[idxc] != blocks_a))
        src = np.flatnonzero(ok)
        dst = idxc[src]
        parts.append(pa.table({
            "doc_a": pa.array(ids_a[src]),
            "doc_b": pa.array(ids_a[dst]),
            "dist": pa.array(np.full(len(src), d, np.int64)),
            "same_key8": pa.array((k8[src] == k8[dst]).astype(np.int64))},
            schema=out_schema))
    cross_tab = pa.concat_tables(parts)

    def block_pairs(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n < 2:
            return out_schema.empty_table()
        ids = pc.cast(b["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        k8 = pc.utf8_slice_codeunits(b["key"], 0, SNM_KEY8) \
            .to_numpy(zero_copy_only=False)
        parts = []
        for d in range(1, w + 1):
            if n <= d:
                break
            parts.append(pa.table({
                "doc_a": pa.array(ids[:-d]),
                "doc_b": pa.array(ids[d:]),
                "dist": pa.array(np.full(n - d, d, np.int64)),
                "same_key8": pa.array(
                    (k8[:-d] == k8[d:]).astype(np.int64))},
                schema=out_schema))
        return pa.concat_tables(parts) if parts else out_schema.empty_table()

    in_block = srt.map_batches(block_pairs, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True)
    return in_block.union(ray.data.from_arrow(cross_tab)) \
        .sort(["doc_a", "doc_b"])
