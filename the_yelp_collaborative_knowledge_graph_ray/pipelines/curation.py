"""End-to-end training-corpus curation: the document-side flagship.

Chains the training-data operators into the pipeline a 100 TB curation run
actually executes — every stage streaming, every rule SQL-expressible so
the whole chain is oracle-checked end to end:

1. **quality gate** — vectorized per-doc stats inline (same kernels as
   ``stages/textstats``); keep docs with >= ``min_words`` words and
   alphabetic ratio >= ``min_alpha``. A streaming filter — no driver-side
   id collection anywhere in this pipeline.
2. **exact dedup** — md5 digest, keep the LOWEST doc_id per digest (only
   16-byte digests + ids shuffle); keepers re-attach to their stats via
   the engine's co-group join (``functions/joins.attach_column``), NOT a
   broadcast — the keeper set is corpus-sized.
3. **near-dup removal** — word-shingle Jaccard pairs at ``threshold``
   (exact engine here; :func:`..stages.dedup.minhash_lsh_pairs` is the
   drop-in scale path with identical output on these corpora); drop every
   doc that duplicates a LOWER id (appears as ``doc_b`` of a pair).
   Deterministic keep-lowest without a connected-components pass: in any
   dup chain the lowest id survives and every other member pairs with
   something lower. The drop side flows through the DISTRIBUTED anti-join
   (``functions/setops.anti_join``) — at a realistic 20–40% dup rate on
   100 TB the drop set is billions of ids, so it must never be collected
   to the driver or broadcast; the anti-join's per-block right-side dedup
   ships one marker row per (id, block) through ONE co-group exchange.
4. **emit** — surviving (doc_id, n_words, n_chars) corpus manifest.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.joins import attach_column
from ..stages.dedup import exact_dedup, ngram_jaccard_pairs

STOP_MARK = None  # stats semantics shared with stages/textstats oracle


def _gate(min_words: int, min_alpha: float):
    def with_stats(b: pa.Table) -> pa.Table:
        text = b["text"]
        n_chars = pc.utf8_length(text)
        n_words = pc.list_value_length(pc.split_pattern(text, " "))
        n_alpha = pc.utf8_length(
            pc.replace_substring_regex(text, "[^A-Za-z]", ""))
        alpha_ratio = pc.divide(
            pc.cast(n_alpha, pa.float64()),
            pc.cast(pc.max_element_wise(n_chars, 1), pa.float64()))
        keep = pc.and_(pc.greater_equal(n_words, min_words),
                       pc.greater_equal(alpha_ratio, min_alpha))
        t = pa.table({"doc_id": pc.cast(b["doc_id"], pa.int64()),
                      "text": text,
                      "n_words": pc.cast(n_words, pa.int64()),
                      "n_chars": pc.cast(n_chars, pa.int64())})
        return t.filter(keep)
    return with_stats


def curate_documents(docs: ray.data.Dataset, min_words: int = 8,
                     min_alpha: float = 0.5,
                     jaccard_threshold: float = 0.5,
                     num_partitions: int = 16) -> ray.data.Dataset:
    """(doc_id, n_words, n_chars) of the curated corpus (see module doc)."""
    clean = docs.map_batches(_gate(min_words, min_alpha),
                             batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    # exact dedup over quality survivors: the keeper ids join back to the
    # stats by id (co-group join; corpus-sized side never broadcast)
    exact = exact_dedup(clean.select_columns(["doc_id", "text"]),
                        num_partitions=num_partitions)
    keepers = exact.map_batches(
        lambda b: pa.table({"doc_id": pc.cast(b["keep_doc_id"], pa.int64()),
                            "flag": pa.nulls(b.num_rows, pa.int64())
                            .fill_null(1)}),
        batch_format="pyarrow")
    i64 = pa.int64()
    stats = clean.select_columns(["doc_id", "n_words", "n_chars"])
    kept = attach_column(
        stats, keepers,
        left_cols=[("doc_id", i64), ("n_words", i64), ("n_chars", i64)],
        left_key="doc_id", source_key="doc_id", source_val="flag",
        out_col="flag", out_type=i64, num_partitions=num_partitions)

    # near-dup removal: distributed anti-join on the pair Dataset's doc_b
    # side — the drop set is NEVER collected to the driver (at 100 TB it
    # is billions of ids); the anti-join per-block-dedups the right keys
    # so each drop id ships once per block through one co-group exchange
    from ..functions.setops import anti_join
    pairs = ngram_jaccard_pairs(clean.select_columns(["doc_id", "text"]),
                                threshold=jaccard_threshold,
                                num_partitions=num_partitions)
    return anti_join(
        kept, pairs, left_key="doc_id", right_key="doc_b",
        left_cols=[("doc_id", i64), ("n_words", i64), ("n_chars", i64)],
        num_partitions=num_partitions).sort("doc_id")


MM_MIN_WORDS = 30
MM_MIN_ZC = 29            # median sawtooth zero-crossing count (measured)
MM_MIN_MOTION_PEAK = 6000  # median per-step MJPEG motion energy (measured)


def curate_multimodal(docs: ray.data.Dataset,
                      min_words: int = MM_MIN_WORDS,
                      min_zc: int = MM_MIN_ZC,
                      min_motion_peak: int = MM_MIN_MOTION_PEAK,
                      num_partitions: int = 8) -> ray.data.Dataset:
    """Cross-MODALITY curation: keep documents passing a text gate AND an
    audio gate AND a video gate, each computed through the REAL decode
    paths (stages/media_codecs) and joined per doc:

    * text  — >= ``min_words`` whitespace words;
    * audio — decoded FLAC zero-crossing count >= ``min_zc`` (the
      silence/static filter of an audio corpus);
    * video — peak consecutive-frame motion energy of the decoded MJPEG
      frames >= ``min_motion_peak`` (drops static clips).

    Each leg filters FIRST (the gates are selective), then the survivors
    meet in two co-group joins on doc id — at 100 TB the media tables are
    genuinely separate sources, so the join shape (not a fused per-row
    map) is the honest one. Output: (doc_id, n_words, zero_crossings,
    motion_peak) of full-pass documents, sorted by doc_id; hash-gated
    against a three-leg SQL twin (formula audio/video replays + the text
    split)."""
    from ..stages.media_codecs import avi_motion_features, flac_features
    i64 = pa.int64()

    def text_leg(b: pa.Table) -> pa.Table:
        n_words = pc.list_value_length(pc.split_pattern(b["text"], " "))
        t = pa.table({"doc_id": pc.cast(b["doc_id"], i64),
                      "n_words": pc.cast(n_words, i64)})
        return t.filter(pc.greater_equal(t["n_words"], min_words))

    txt = docs.map_batches(text_leg, batch_format="pyarrow",
                           zero_copy_batch=True)

    def aud_leg(b: pa.Table) -> pa.Table:
        t = pa.table({"media_id": pc.cast(b["media_id"], i64),
                      "zero_crossings": pc.cast(b["zero_crossings"], i64)})
        return t.filter(pc.greater_equal(t["zero_crossings"], min_zc))

    aud = flac_features(docs).map_batches(aud_leg, batch_format="pyarrow",
                                          zero_copy_batch=True)

    def mot_leg(b: pa.Table) -> pa.Table:
        t = pa.table({"media_id": pc.cast(b["media_id"], i64),
                      "motion_peak": pc.cast(b["motion_peak"], i64)})
        return t.filter(pc.greater_equal(t["motion_peak"],
                                         min_motion_peak))

    mot = avi_motion_features(docs).map_batches(
        mot_leg, batch_format="pyarrow", zero_copy_batch=True)

    j1 = attach_column(
        txt, aud, left_cols=[("doc_id", i64), ("n_words", i64)],
        left_key="doc_id", source_key="media_id",
        source_val="zero_crossings", out_col="zero_crossings",
        out_type=i64, num_partitions=num_partitions)
    j2 = attach_column(
        j1, mot,
        left_cols=[("doc_id", i64), ("n_words", i64),
                   ("zero_crossings", i64)],
        left_key="doc_id", source_key="media_id", source_val="motion_peak",
        out_col="motion_peak", out_type=i64,
        num_partitions=num_partitions)
    return j2.sort("doc_id")


AUDIT_KNOWN_TYPES = ("click", "purchase", "signup", "view")
AUDIT_VALUE_CAP_C = 300_00          # cents
AUDIT_TS_CUTOFF_US = 1_737_763_200_000_000  # 2025-01-25T00:00:00Z (unused)
AUDIT_CUTOFF = "2024-01-25 00:00:00"


def quality_audit_events(sf_dir: str) -> ray.data.Dataset:
    """Data-quality audit / expectation suite over the events stream —
    the validation report a 100 TB ingest runs before training: one row
    per rule with its violation count.

      * ``dup_event_id``      — duplicate primary keys (n − n_distinct)
      * ``value_over_cap``    — value > 300.00 (range expectation)
      * ``unknown_event_type``— type outside the declared domain
      * ``ts_after_cutoff``   — event time at/after the snapshot cutoff

    The three scan rules fold map-side to ONE partial row per block
    (zero shuffle beyond the tiny union); the uniqueness rule is the only
    keyed exchange (grouped count on the key column). Violations are
    COUNTED, not materialized — the row-level dead-letter channel
    (stages/extract.extract_dead_letter) is the companion that keeps the
    offending rows."""
    import numpy as np

    from ..functions.grouped import grouped_count

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value", "ts"])

    out_schema = pa.schema([("rule", pa.string()),
                            ("n_violations", pa.int64())])
    cutoff = np.datetime64(AUDIT_CUTOFF.replace(" ", "T"), "us") \
        .astype(np.int64)

    def scan_partial(b: pa.Table) -> pa.Table:
        vc = pc.cast(pc.round(pc.multiply(b["value"], 100.0)), pa.int64())
        over = pc.sum(pc.cast(pc.greater(vc, AUDIT_VALUE_CAP_C),
                              pa.int64())).as_py() or 0
        unk = pc.sum(pc.cast(pc.invert(pc.is_in(
            b["event_type"], value_set=pa.array(AUDIT_KNOWN_TYPES))),
            pa.int64())).as_py() or 0
        ts = b["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        late = int((ts >= cutoff).sum())
        return pa.table({
            "rule": ["value_over_cap", "unknown_event_type",
                     "ts_after_cutoff"],
            "n_violations": pa.array([over, unk, late], pa.int64())},
            schema=out_schema)

    scans = ev.map_batches(scan_partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    # uniqueness: per-key counts, violations = sum(cnt - 1) over keys
    keyed = grouped_count(ev.select_columns(["event_id"]), ["event_id"],
                          "cnt", 8)

    def dup_partial(b: pa.Table) -> pa.Table:
        extra = pc.sum(pc.subtract(b["cnt"], 1)).as_py() or 0
        return pa.table({"rule": ["dup_event_id"],
                         "n_violations": pa.array([extra], pa.int64())},
                        schema=out_schema)

    dups = keyed.map_batches(dup_partial, batch_format="pyarrow",
                             zero_copy_batch=True)

    from ..functions.grouped import sorted_aggregate
    return sorted_aggregate(scans.union(dups), ["rule"],
                            [("n_violations", "sum")],
                            ["rule", "n_violations"], 1)


CHAR_BUDGET = 60_000


def char_budget_sample(docs, budget: int = CHAR_BUDGET,
                       num_partitions: int = 8):
    """Budget-constrained corpus selection: fill a character budget with
    documents in deterministic hash-priority order — the "give me N
    tokens of data, reproducibly" primitive every training run starts
    with. Priority = u01(splitmix64(doc_id)) (bit-exact SQL twin), so the
    selection is stable under any shuffle and any cluster size.

    Shape: ONE (priority, doc_id) sort, then the distributed prefix scan
    (per-block char subtotals -> driver base offsets -> one vectorized
    cumsum pass per block; the same machinery as the Pareto/ABC op) —
    the corpus is never collected, only O(#blocks) subtotal rows.
    Output: (doc_id, n_chars, cum_chars) for docs whose RUNNING total
    stays within the budget, by doc_id.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray
    import ray.data as rd

    from ..functions.sampling import hash_u01

    def prio(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "n_chars": pc.cast(b["n_chars"], pa.int64()),
            "u01": pa.array(hash_u01(b["doc_id"]))})

    ranked = docs.map_batches(prio, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .repartition(num_partitions) \
        .sort(["u01", "doc_id"]).materialize()
    refs = ranked.to_arrow_refs()

    @ray.remote
    def subtotal(t: pa.Table):
        if t.num_rows == 0:
            return 0, None, None
        return (int(pc.sum(t["n_chars"]).as_py()),
                float(t["u01"][0].as_py()), int(t["doc_id"][0].as_py()))

    subs = ray.get([subtotal.remote(r) for r in refs])
    order = sorted(range(len(refs)),
                   key=lambda i: (subs[i][1] is None,
                                  subs[i][1], subs[i][2]))
    refs = [refs[i] for i in order]
    tots = [subs[i][0] for i in order]
    bases = np.concatenate([[0], np.cumsum(tots)[:-1]]).astype(np.int64)

    @ray.remote
    def pick(t: pa.Table, base: int) -> pa.Table:
        out_schema = pa.schema([("doc_id", pa.int64()),
                                ("n_chars", pa.int64()),
                                ("cum_chars", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        cum = base + np.cumsum(t["n_chars"].to_numpy(zero_copy_only=False))
        keep = cum <= budget
        return pa.table({"doc_id": t["doc_id"].filter(pa.array(keep)),
                         "n_chars": t["n_chars"].filter(pa.array(keep)),
                         "cum_chars": pa.array(cum[keep])},
                        schema=out_schema)

    return rd.from_arrow_refs(
        [pick.remote(r, int(b)) for r, b in zip(refs, bases)]) \
        .sort("doc_id")


# -- dataset profiling / audit operators ---------------------------------

# (column, kind) schema spec for the orders profile; kinds pick the exact
# integer encoding that makes min/max/distinct hash-safe (floats never
# cross the wire): int -> as-is, money -> cents, ts -> epoch microseconds,
# str -> raw string (ASCII data, so Arrow byte order == DuckDB collation).
ORDERS_PROFILE_SPEC = (
    ("o_orderkey", "int"), ("o_custkey", "int"),
    ("o_orderstatus", "str"), ("o_totalprice", "money"),
    ("o_orderdate", "ts"), ("o_orderpriority", "str"))


def profile_columns(sf_dir: str, table: str = "orders",
                    spec=ORDERS_PROFILE_SPEC) -> pa.Table:
    """Column-level data profile — the ingestion-time audit every corpus
    needs before a 100 TB run: per column (rows, nulls, exact distinct,
    min/max). Numeric/date ranges ride dedicated int64 columns (0 for
    string columns), string ranges ride string columns ('' for numeric) —
    the null-free convention that keeps value hashes engine-independent.

    Plan: ONE scan; counts and min/max fold to one partial row per
    (column, block) — zero wide shuffle; exact distinct counts collapse
    per block to (column, value) partials first, so the only all-to-all
    ships distinct values, not rows. The two tiny results (|columns| rows
    each) merge on the driver."""
    import numpy as np

    from ..functions.grouped import grouped_count, sorted_aggregate
    from .relational import _read, _scaled_int

    cols = [c for c, _ in spec]
    kinds = dict(spec)

    def encode_num(b: pa.Table, c: str) -> pa.ChunkedArray | None:
        k = kinds[c]
        if k == "int":
            return pc.cast(b[c], pa.int64())
        if k == "money":
            return _scaled_int(b[c], 100.0)
        if k == "ts":
            return pc.cast(b[c], pa.int64())  # timestamp[us] -> epoch_us
        return None

    def stats_partial(b: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            num = encode_num(b, c)
            nulls = int(b[c].null_count)
            if num is not None:
                mm = pc.min_max(num)
                lo = mm["min"].as_py()
                hi = mm["max"].as_py()
                rows.append((c, b.num_rows, nulls,
                             lo if lo is not None else 2**62,
                             hi if hi is not None else -2**62, "", ""))
            else:
                mm = pc.min_max(b[c])
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                rows.append((c, b.num_rows, nulls, 0, 0,
                             lo if lo is not None else "\x7f",
                             hi if hi is not None else ""))
        t = list(zip(*rows))
        return pa.table({
            "col_name": pa.array(t[0], pa.string()),
            "n_rows": pa.array(t[1], pa.int64()),
            "n_nulls": pa.array(t[2], pa.int64()),
            "min_num": pa.array(t[3], pa.int64()),
            "max_num": pa.array(t[4], pa.int64()),
            "min_str": pa.array(t[5], pa.string()),
            "max_str": pa.array(t[6], pa.string())})

    ds = _read(sf_dir, table, cols)
    stats = sorted_aggregate(
        ds.map_batches(stats_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["col_name"],
        [("n_rows", "sum"), ("n_nulls", "sum"), ("min_num", "min"),
         ("max_num", "max"), ("min_str", "min"), ("max_str", "max")],
        ["col_name", "n_rows", "n_nulls", "min_num", "max_num",
         "min_str", "max_str"], 1).to_pandas()

    def distinct_partial(b: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in cols:
            num = encode_num(b, c)
            enc = (pc.cast(num, pa.string()) if num is not None
                   else pc.cast(b[c], pa.string()))
            u = pc.unique(pc.drop_null(enc))
            names.append(pa.array([c] * len(u), pa.string()))
            vals.append(u)
        return pa.table({
            "col_name": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in names]),
            "val": pa.concat_arrays(
                [v.combine_chunks() if isinstance(v, pa.ChunkedArray)
                 else v for v in vals])})

    per_val = grouped_count(
        ds.map_batches(distinct_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["col_name", "val"], "__n", 8)
    nd = grouped_count(per_val, ["col_name"], "n_distinct", 1) \
        .to_pandas()

    merged = stats.merge(nd, on="col_name", how="left")
    merged["n_distinct"] = merged["n_distinct"].fillna(0).astype("int64")
    order = [c for c in cols]
    merged["__o"] = merged["col_name"].map({c: i for i, c
                                           in enumerate(order)})
    merged = merged.sort_values("__o")
    return pa.table({
        "col_name": pa.array(merged["col_name"], pa.string()),
        "n_rows": pa.array(merged["n_rows"].astype("int64")),
        "n_nulls": pa.array(merged["n_nulls"].astype("int64")),
        "n_distinct": pa.array(merged["n_distinct"]),
        "min_num": pa.array(merged["min_num"].astype("int64")),
        "max_num": pa.array(merged["max_num"].astype("int64")),
        "min_str": pa.array(merged["min_str"], pa.string()),
        "max_str": pa.array(merged["max_str"], pa.string())})


# Exact Benford expectations in integer permille — hardcoded (not
# computed from log10 at runtime) so the Ray side and the SQL twin can
# never disagree in the last float bit.
BENFORD_PERMILLE = (301, 176, 125, 97, 79, 67, 58, 51, 46)


def benford_audit(sf_dir: str, table: str = "orders",
                  column: str = "o_totalprice") -> ray.data.Dataset:
    """Benford's-law first-significant-digit audit of a money column —
    the classic fraud / synthetic-data smell test. The first significant
    digit is taken from the exact cents encoding (invariant under the
    ×100 scaling), counted per digit with map-side partials, and reported
    against the hardcoded Benford expectation with observed shares as
    exact integer permille (n·1000 // total both sides)."""
    import numpy as np

    from ..functions.grouped import grouped_count
    from .relational import _read, _scaled_int

    def digits(b: pa.Table) -> pa.Table:
        cents = _scaled_int(b[column], 100.0)
        first = pc.utf8_slice_codeunits(pc.cast(cents, pa.string()), 0, 1)
        return pa.table({"digit": pc.cast(first, pa.int64())})

    counts = grouped_count(
        _read(sf_dir, table, [column]).map_batches(
            digits, batch_format="pyarrow", zero_copy_batch=True),
        ["digit"], "n", 1).to_pandas()
    total = int(counts["n"].sum())
    d = counts["digit"].to_numpy().astype(np.int64)
    n = counts["n"].to_numpy().astype(np.int64)
    exp = np.array([BENFORD_PERMILLE[i - 1] if 1 <= i <= 9 else 0
                    for i in d], np.int64)
    obs = n * 1000 // max(total, 1)
    return pa.table({"digit": pa.array(d), "n": pa.array(n),
                     "observed_permille": pa.array(obs),
                     "expected_permille": pa.array(exp)})
