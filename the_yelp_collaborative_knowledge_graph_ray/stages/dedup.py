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
  default 16 bands x 4 rows, a pair at J=0.8 is missed with p≈2e-4 and the
  planted J≈0.98 fixtures with p≈1e-20 — so its output equals the exact
  brute-force oracle on the test corpora (asserted by the driver harness).
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
# base hash, banded b x r with b*r == k.
MINHASH_K = 64
MINHASH_BANDS = 16
MINHASH_ROWS = 4
_MERSENNE = (1 << 61) - 1
_RNG = np.random.RandomState(1234)
_PERM_A = _RNG.randint(1, _MERSENNE, size=MINHASH_K, dtype=np.int64)
_PERM_B = _RNG.randint(0, _MERSENNE, size=MINHASH_K, dtype=np.int64)

SHINGLE_K = 3  # word-shingle width shared by jaccard/minhash/oracle SQL


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def _md5_array(texts: list[str]) -> pa.Array:
    return pa.array([hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts],
                    pa.string())


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
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
                            ["text_hash", "n_dups", "keep_doc_id"])


# --------------------------------------------------------------------------
# shingles
# --------------------------------------------------------------------------

def _shingles(text: str, k: int = SHINGLE_K) -> set[str]:
    ws = text.lower().split(" ")
    if len(ws) < k:
        return {" ".join(ws)}
    return {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}


def _shingle_hashes(text: str, k: int = SHINGLE_K) -> np.ndarray:
    return np.fromiter(
        (zlib.crc32(s.encode("utf-8")) for s in _shingles(text, k)),
        dtype=np.int64)


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
        ids, shs = [], []
        sizes_id, sizes_n = [], []
        for did, text in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            ss = _shingles(text, k)
            sizes_id.append(did)
            sizes_n.append(len(ss))
            ids.extend([did] * len(ss))
            shs.extend(ss)
        return pa.table({"shingle": pa.array(shs, pa.string()),
                         "doc_id": pa.array(ids, pa.int64())})

    def sizes(b: pa.Table) -> pa.Table:
        n = [len(_shingles(t, k)) for t in b["text"].to_pylist()]
        return pa.table({"doc_id": b["doc_id"],
                         "n_shingles": pa.array(n, pa.int64())})

    postings = docs.map_batches(explode, batch_format="pyarrow",
                                zero_copy_batch=True)
    doc_sizes = docs.map_batches(sizes, batch_format="pyarrow",
                                 zero_copy_batch=True)

    # sorted-block pair expansion + map-side combine (functions/grouped.py):
    # ~50x less per-group overhead than groupby().map_groups at 10^5 shingles
    from ..functions.grouped import pairs_within_groups
    pair_counts = pairs_within_groups(
        postings, ["shingle"], "doc_id", count_col="n_inter",
        max_group=max_posting)

    from ..functions.joins import attach_column
    i64 = pa.int64()
    joined = attach_column(
        pair_counts, doc_sizes,
        left_cols=[("doc_a", i64), ("doc_b", i64), ("n_inter", i64)],
        left_key="doc_a", source_key="doc_id", source_val="n_shingles",
        out_col="n_a", out_type=i64)
    joined = attach_column(
        joined, doc_sizes,
        left_cols=[("doc_a", i64), ("doc_b", i64), ("n_inter", i64),
                   ("n_a", i64)],
        left_key="doc_b", source_key="doc_id", source_val="n_shingles",
        out_col="n_b", out_type=i64)

    def jacc(b: pa.Table) -> pa.Table:
        # raw IEEE division of exact integer counts — bit-identical to the
        # DuckDB oracle's CAST(ni AS DOUBLE)/(na+nb-ni)
        inter = b["n_inter"].to_numpy().astype(np.float64)
        union = (b["n_a"].to_numpy() + b["n_b"].to_numpy()) - inter
        j = inter / union
        t = pa.table({
            "doc_a": b["doc_a"], "doc_b": b["doc_b"],
            "jaccard": pa.array(j, pa.float64())})
        return t.filter(pc.greater_equal(t["jaccard"], threshold))

    return joined.map_batches(jacc, batch_format="pyarrow") \
                 .sort(["doc_a", "doc_b"])


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def minhash_signature(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """k-permutation MinHash signature of a document (vectorized numpy)."""
    h = _shingle_hashes(text, k)
    # (n_shingles, K) affine permutations mod Mersenne prime, min per column
    vals = (h[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) % _MERSENNE
    return vals.min(axis=0)


def minhash_lsh_pairs(docs: ray.data.Dataset, threshold: float = 0.5,
                      k: int = SHINGLE_K,
                      num_partitions: int = 16) -> ray.data.Dataset:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    Output schema and semantics match :func:`ngram_jaccard_pairs` (the LSH
    stage only prunes candidates; survivors are verified exactly against the
    documents joined back by id).
    """
    def band_rows(b: pa.Table) -> pa.Table:
        ids, bands, hashes = [], [], []
        for did, text in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            sig = minhash_signature(text, k)
            for band in range(MINHASH_BANDS):
                chunk = sig[band * MINHASH_ROWS:(band + 1) * MINHASH_ROWS]
                ids.append(did)
                bands.append(band)
                # process-stable band hash (builtin hash() is salted per
                # process and would silently kill all LSH collisions)
                hashes.append(zlib.crc32(chunk.tobytes()))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "band": pa.array(bands, pa.int32()),
            "band_hash": pa.array(hashes, pa.int64())})

    from ..functions.grouped import pairs_within_groups
    candidates = pairs_within_groups(
        docs.map_batches(band_rows, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["band", "band_hash"], "doc_id", count_col="n_bands")

    from ..functions.joins import attach_column
    i64, s = pa.int64(), pa.string()
    texts = docs.select_columns(["doc_id", "text"])
    joined = attach_column(
        candidates, texts,
        left_cols=[("doc_a", i64), ("doc_b", i64)],
        left_key="doc_a", source_key="doc_id", source_val="text",
        out_col="text_a", out_type=s)
    joined = attach_column(
        joined, texts,
        left_cols=[("doc_a", i64), ("doc_b", i64), ("text_a", s)],
        left_key="doc_b", source_key="doc_id", source_val="text",
        out_col="text_b", out_type=s)

    def verify(b: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for da, db, ta, tb in zip(b["doc_a"].to_pylist(), b["doc_b"].to_pylist(),
                                  b["text_a"].to_pylist(), b["text_b"].to_pylist()):
            sa, sb = _shingles(ta, k), _shingles(tb, k)
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                out_a.append(da)
                out_b.append(db)
                out_j.append(j)
        return _pairs_table(out_a, out_b,
                            {"jaccard": pa.array(out_j, pa.float64())})

    return joined.map_batches(verify, batch_format="pyarrow") \
                 .sort(["doc_a", "doc_b"])


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over word features (unweighted)."""
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


def simhash_pairs(docs: ray.data.Dataset, max_hamming: int = 3,
                  num_partitions: int = 16) -> ray.data.Dataset:
    """Pairs with SimHash Hamming distance <= max_hamming, via 4x16-bit band
    bucketing (pigeonhole-complete for distance <= 3)."""
    from ray.data.aggregate import Count, Min

    def fp_rows(b: pa.Table) -> pa.Table:
        ids, bands, keys, fps = [], [], [], []
        for did, text in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            fp = simhash64(text)
            for band in range(4):
                ids.append(did)
                bands.append(band)
                keys.append((fp >> (band * 16)) & 0xFFFF)
                fps.append(fp - (1 << 63))  # store as signed int64
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "band": pa.array(bands, pa.int32()),
            "band_key": pa.array(keys, pa.int64()),
            "fp": pa.array(fps, pa.int64())})

    def block_pairs(b: pa.Table) -> pa.Table:
        # complete (band, band_key) groups per block (functions/grouped.py);
        # per group: vectorized popcount over the XOR of all fp pairs
        from ..functions.grouped import group_ids
        out_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                                ("hamming", pa.int64())])
        gid, starts = group_ids(b, ["band", "band_key"])
        if len(starts) == 0:
            return out_schema.empty_table()
        ids = b["doc_id"].to_numpy()
        fps = b["fp"].to_numpy().astype(np.int64).view(np.uint64)
        ends = np.append(starts[1:], b.num_rows)
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            d, idx = np.unique(ids[s:e], return_index=True)
            if len(d) < 2:
                continue
            f = fps[s:e][idx]
            iu, ju = np.triu_indices(len(d), k=1)
            x = f[iu] ^ f[ju]
            ham = np.zeros(len(x), dtype=np.int64)
            while x.any():
                ham += (x & np.uint64(1)).astype(np.int64)
                x = x >> np.uint64(1)
            keep = ham <= max_hamming
            out_a.append(d[iu][keep])
            out_b.append(d[ju][keep])
            out_h.append(ham[keep])
        if not out_a:
            return out_schema.empty_table()
        t = pa.table({"doc_a": pa.array(np.concatenate(out_a)),
                      "doc_b": pa.array(np.concatenate(out_b)),
                      "hamming": pa.array(np.concatenate(out_h))})
        return t.group_by(["doc_a", "doc_b"], use_threads=False) \
                .aggregate([("hamming", "min")]) \
                .rename_columns(["doc_a", "doc_b", "hamming"])

    from ..functions.grouped import sorted_aggregate, sorted_group_apply
    local = sorted_group_apply(
        docs.map_batches(fp_rows, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["band", "band_key"], block_pairs)
    # sorted_aggregate output is already sorted by (doc_a, doc_b)
    return sorted_aggregate(local, ["doc_a", "doc_b"],
                            [("hamming", "min")],
                            ["doc_a", "doc_b", "hamming"])


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
                             seed: int = _LSH_SEED) -> ray.data.Dataset:
    """All pairs with cosine >= threshold via random-hyperplane LSH — the
    scale path (module comment): signature rows shuffle, vectors ride along
    once per band, in-bucket exact verify, cross-band dedup.

    Parameter guidance: the miss probability of a pair at cosine c is
    (1 - p^r)^b with p = 1 - arccos(c)/pi. Defaults (b=128, r=2) are sized
    for low thresholds (c >= 0.35 -> < 1e-26); for c >= 0.9 use e.g.
    (b=16, r=8) to keep buckets small at scale. Hyperplanes are a fixed
    function of (seed, dim) so reruns are deterministic.
    """
    nbits = bands * rows_per_band
    weights = (1 << np.arange(rows_per_band, dtype=np.int64))

    def sig_rows(b: pa.Table) -> pa.Table:
        ids, mat = _load_matrix(b)
        n, dim = mat.shape
        # deterministic per (seed, dim); cheap enough to build per batch
        H = np.random.RandomState(seed).standard_normal((nbits, dim))
        bits = (mat @ H.T) > 0                       # (n, nbits)
        keys = bits.reshape(n, bands, rows_per_band) @ weights  # (n, bands)
        band_idx = np.tile(np.arange(bands, dtype=np.int32), n)
        return pa.table({
            "band": pa.array(band_idx),
            "bkey": pa.array(keys.reshape(-1).astype(np.int64)),
            "vec_id": pa.array(np.repeat(ids.astype(np.int64), bands)),
            "embedding": pa.array(
                list(np.repeat(mat, bands, axis=0)), pa.list_(pa.float64()))})

    def bucket_pairs(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                                ("cosine", pa.float64())])
        from ..functions.grouped import group_ids
        gid, starts = group_ids(b, ["band", "bkey"])
        if len(starts) == 0:
            return out_schema.empty_table()
        ids = b["vec_id"].to_numpy()
        mat = np.asarray(
            b["embedding"].combine_chunks().to_numpy(zero_copy_only=False).tolist(),
            dtype=np.float64)
        ends = np.append(starts[1:], b.num_rows)
        out_a, out_b, out_s = [], [], []
        for s, e in zip(starts, ends):
            d, idx = np.unique(ids[s:e], return_index=True)
            if len(d) < 2:
                continue
            m = mat[s:e][idx]
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
        ["band", "bkey"], bucket_pairs)
    # cross-band dedup; cosine identical in every band -> min is the value
    return sorted_aggregate(local, ["doc_a", "doc_b"],
                            [("cosine", "min")],
                            ["doc_a", "doc_b", "cosine"])
