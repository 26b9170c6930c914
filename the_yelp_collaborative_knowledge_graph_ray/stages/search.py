"""Keyword top-k search over the ``documents`` table: BM25 (Robertson &
Zaragoza 2009, the classic probabilistic ranking function) as a
two-pass Ray Data job — the lexical complement to the embedding ANN family
(``stages/similarity.py``).

Scale shape (the corpus-statistic broadcast pattern, same as
``textstats.tfidf_top_terms``):

1. **Stats pass** — one stateless ``map_batches`` emits a ONE-ROW partial
   per block (n_docs, total_words, per-query-term document frequencies as a
   fixed-order list); the driver folds the tiny partial list into integer
   corpus statistics. Only O(blocks × terms) rows ever leave the workers —
   the corpus itself is never collected.
2. **Score pass** — per-term IDF and the average document length are
   derived ONCE on the driver from those integers and closed over (a
   broadcast of a few floats); each batch computes exact per-(doc, term)
   term frequencies via the flat-word dictionary-code trick
   (``dedup._words_flat`` + ``np.unique`` over (doc, code) keys) and emits
   integer fixed-point scores. Docs are whole within a batch, so batch
   scores ARE final scores.
3. **Top-k** — ``functions/topn.top_n_per_key`` (map-side prune + one key
   sort) yields the deterministic per-query head.

Determinism / oracle parity: every float constant (idf per term, avgdl,
k1, k1+1, 1-b, b) is computed ONCE in Python and injected verbatim into
BOTH engines (the numpy kernel closes over them; the DuckDB oracle gets
their ``repr`` as literals — the same device the langid profile and
splitmix64 oracles use), and the per-term contribution is truncated with
``floor`` (identical semantics in numpy and SQL, unlike round's
half-even/half-away split) to int64 fixed-point before the order-free
integer sum. Division and multiplication on identical doubles are
correctly rounded in both engines, so scores match bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

BM25_K1 = 1.2
BM25_B = 0.75


def _term_codes(col, terms_arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(code, doc_of) per flat word: index into the sorted term list, -1
    for non-query words."""
    from .dedup import _words_flat
    words, doc_of = _words_flat(col)
    code = pc.index_in(pa.array(words, pa.string()), value_set=terms_arr) \
        .fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
    return code, doc_of


def corpus_stats(docs: ray.data.Dataset, terms: list[str]
                 ) -> tuple[int, int, np.ndarray]:
    """(n_docs, total_words, df[term]) — exact integers, computed
    distributed with one-row-per-block partials."""
    tarr = pa.array(terms, pa.string())
    T = len(terms)

    def partial(b: pa.Table) -> pa.Table:
        code, doc_of = _term_codes(b["text"], tarr)
        valid = code >= 0
        key = np.unique(doc_of[valid] * T + code[valid]) if T else \
            np.empty(0, np.int64)
        df = np.bincount(key % T, minlength=T) if T else \
            np.empty(0, np.int64)
        return pa.table({
            "n_docs": pa.array([b.num_rows], pa.int64()),
            "total_words": pa.array([len(code)], pa.int64()),
            "df": pa.array([df.astype(np.int64).tolist()],
                           pa.list_(pa.int64()))})

    rows = docs.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    n_docs = sum(r["n_docs"] for r in rows)
    total_words = sum(r["total_words"] for r in rows)
    df = np.zeros(T, np.int64)
    for r in rows:
        df += np.asarray(r["df"], np.int64)
    return int(n_docs), int(total_words), df


def bm25_constants(n_docs: int, total_words: int, df: np.ndarray,
                   k1: float = BM25_K1, b: float = BM25_B
                   ) -> tuple[np.ndarray, float, float, float, float]:
    """(idf[term], avgdl, k1, k1+1, 1-b) — THE float constants both engines
    must share; computed once here, closed over by the kernel and
    ``repr``-injected into the SQL oracle."""
    idf = np.array([math.log((n_docs - int(d) + 0.5) / (int(d) + 0.5) + 1.0)
                    for d in df], np.float64)
    avgdl = (total_words / n_docs) if n_docs else 1.0
    return idf, avgdl, k1, k1 + 1.0, 1.0 - b


def bm25_topk(docs: ray.data.Dataset, queries: list[str], k: int = 10,
              k1: float = BM25_K1, b: float = BM25_B,
              num_partitions: int | None = 8) -> ray.data.Dataset:
    """(query_id, doc_id, score, rank): deterministic BM25 top-k per query
    (score desc, doc_id asc tie-break; integer fixed-point scores). Only
    documents containing at least one query term are candidates."""
    terms = sorted({t for q in queries for t in q.lower().split(" ")})
    tarr = pa.array(terms, pa.string())
    T = len(terms)
    n_docs, total_words, df = corpus_stats(docs, terms)
    idf, avgdl, k1, k1p1, one_m_b = bm25_constants(n_docs, total_words, df,
                                                   k1, b)
    qcodes = [np.array([terms.index(t)
                        for t in dict.fromkeys(q.lower().split(" "))],
                       np.int64) for q in queries]

    def score(bt: pa.Table) -> pa.Table:
        out_schema = pa.schema([("query_id", pa.int64()),
                                ("doc_id", pa.int64()),
                                ("score", pa.int64())])
        did = pc.cast(bt["doc_id"], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False) \
            if isinstance(bt["doc_id"], pa.ChunkedArray) \
            else pc.cast(bt["doc_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        code, doc_of = _term_codes(bt["text"], tarr)
        n = bt.num_rows
        dl = np.bincount(doc_of, minlength=n).astype(np.float64)
        valid = code >= 0
        if not valid.any():
            return out_schema.empty_table()
        ukey, tf = np.unique(doc_of[valid] * T + code[valid],
                             return_counts=True)
        udoc, ucode = ukey // T, ukey % T
        tff = tf.astype(np.float64)
        # mirrored VERBATIM by the SQL oracle (operation tree + floor)
        denom = tff + k1 * (one_m_b + b * (dl[udoc] / avgdl))
        contrib = np.floor((idf[ucode] * ((tff * k1p1) / denom))
                           * 1e6).astype(np.int64)
        qs, ds_, ss = [], [], []
        for qi, qc in enumerate(qcodes):
            m = np.isin(ucode, qc)
            if not m.any():
                continue
            s = np.zeros(n, np.int64)
            np.add.at(s, udoc[m], contrib[m])
            hit = np.unique(udoc[m])
            qs.append(np.full(len(hit), qi, np.int64))
            ds_.append(did[hit])
            ss.append(s[hit])
        if not qs:
            return out_schema.empty_table()
        return pa.table({"query_id": pa.array(np.concatenate(qs)),
                         "doc_id": pa.array(np.concatenate(ds_)),
                         "score": pa.array(np.concatenate(ss))})

    scored = docs.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True)
    from ..functions.topn import top_n_per_key
    return top_n_per_key(scored, ["query_id"],
                         [("score", False), ("doc_id", True)], k,
                         num_partitions)


POSTINGS_TOP = 50


def build_postings(docs: ray.data.Dataset,
                   top: int = POSTINGS_TOP,
                   num_partitions: int = 8) -> ray.data.Dataset:
    """Inverted-index construction — the artifact behind :func:`bm25_topk`
    surfaced as data: for the ``top`` highest-df terms, the sorted
    posting list (term, df, postings_csv).

    Scale shape: the corpus collapses to DISTINCT (term, doc) pairs via
    grouped-count partials (the one corpus-sized exchange); document
    frequencies are a grouped count over pairs; the top-term cut is a
    deterministic (df desc, term asc) global sort of the tiny df table;
    the winner set broadcasts back as a semi-filter, and each term's
    posting list materializes in its complete sorted group (numeric doc
    order — at real index scale the csv column becomes one Parquet
    file per term range, same layout)."""
    import numpy as np

    from ..functions.grouped import (group_ids, grouped_count,
                                     sorted_group_apply)

    def pairs(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = pc.cast(b["doc_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "term": flat,
            "doc_id": pa.array(np.repeat(doc, lens), pa.int64())})

    td = grouped_count(
        docs.map_batches(pairs, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["term", "doc_id"], "__n", num_partitions).materialize()

    df = grouped_count(td, ["term"], "df", num_partitions)
    winners = df.sort(["df", "term"], descending=[True, False]) \
        .limit(top).to_pandas()
    keep = ray.put(pa.array(winners["term"], pa.string()))
    df_of = ray.put(dict(zip(winners["term"],
                             winners["df"].astype(int))))

    def semi(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b["term"], value_set=ray.get(keep))
        return b.filter(mask).select(["term", "doc_id"])

    out_schema = pa.schema([("term", pa.string()),
                            ("df", pa.int64()),
                            ("postings_csv", pa.string())])

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        dfo = ray.get(df_of)
        gid, starts = group_ids(b, ["term"])
        docs_np = b["doc_id"].to_numpy(zero_copy_only=False)
        terms = b["term"].to_numpy(zero_copy_only=False)
        bounds = np.append(starts, len(gid))
        rows_t, rows_d, rows_p = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            t = terms[s]
            rows_t.append(t)
            rows_d.append(dfo[t])
            rows_p.append(",".join(str(d) for d in
                                   np.sort(docs_np[s:e])))
        return pa.table({"term": pa.array(rows_t, pa.string()),
                         "df": pa.array(rows_d, pa.int64()),
                         "postings_csv": pa.array(rows_p, pa.string())},
                        schema=out_schema)

    return sorted_group_apply(
        td.map_batches(semi, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["term"], block, 1)
