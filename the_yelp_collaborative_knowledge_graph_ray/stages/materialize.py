"""Stage 6 — graph materialization: global dedup + sort + Parquet sink.

The reference appends N-Triples text to gzip files in input order with no
global dedup (``create_yelp_nt_files.py:31,180-181``); per ``BASELINE.json
north_star`` our output is the *sorted, deduplicated* (subj, pred, obj)
triples table (set semantics — order-insensitive comparison makes the added
sort semantics-preserving, SURVEY.md §2.6).

Shuffle plan (the expensive part at 100 TB) — ONE all-to-all, not two:

1. per-block local dedup (cheap Arrow ``group_by`` over all five columns) —
   collapses the heavy duplicate classes (one conversation-type triple per
   *turn*, one tool-type triple per *call*) before anything moves;
2. ONE global range-partitioned ``sort`` over **all five columns**;
3. per-block adjacent-row dedup (vectorized neighbor compare).

Step 3 is an *exact* global dedup, not an approximation, because of two
invariants of Ray's sort shuffle (verified against ray 2.49 source):

* map-side partitioning uses ``np.searchsorted(..., side="left")`` on the
  sampled boundary for ascending keys (``ray/data/_internal/util.py``
  ``find_partition_index``), identically in every map task — so all rows
  equal to a boundary value land in the *same* range partition, never split;
* each merge/reduce task "merges the sorted blocks into one sorted block"
  per partition (``planner/exchange/sort_task_spec.py``) — one output block
  per partition.

Hence identical rows are always adjacent *within one block* after the sort,
and a per-block neighbor-compare with ``batch_size=None`` (one batch == one
block) removes every duplicate. ``tests/test_kg_stages.py`` stress-tests this
with a key duplicated millions of times under a tiny
``target_max_block_size`` so a Ray behavior change would fail loudly.

This replaced a ``groupby([subj,pred,obj]).aggregate(Min,Min)`` dedup that
cost 33 s at sf0.1 (vs 2.5 s for the sort itself — the sort-shuffle
aggregate reduce is row-wise Python); measured end-to-end this cut the
flagship materialize stage ~4x.

An optional N-Triples text renderer reproduces the reference's output format
byte-for-byte-comparable (typed literals, ``create_yelp_nt_files.py:168-175``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .. import config as C

SORT_COLS = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype"]

OUT_SCHEMA = pa.schema([
    ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
    ("obj_is_literal", pa.bool_()), ("obj_datatype", pa.string())])


def _enforce(batch: pa.Table) -> pa.Table:
    """Project to the five output columns with one stable schema (all-null
    blocks can surface as ``pa.null()`` typed columns after shuffles)."""
    return pa.table(
        {f.name: pc.cast(batch[f.name], f.type) for f in OUT_SCHEMA},
        schema=OUT_SCHEMA)


# Probe gate for the per-block dedup: local_dedup is a pure OPTIMIZATION
# (exactness comes from the post-sort neighbor dedup), so when a cheap
# sample shows a block is near-unique, the full 5-column hash group-by —
# measured ~44% of the flagship's hottest fused stage at bench3200, for a
# ~1% row reduction on that corpus — is skipped. Blocks under 2x the
# probe keep the unconditional dedup (tiny cost, and unit tests exercise
# small blocks); a dup-heavy block (the case the pass exists for) clears
# the threshold in the probe and pays the full group-by as before.
_DEDUP_PROBE_ROWS = 32_768
_DEDUP_SKIP_BELOW = 0.05


def local_dedup(batch: pa.Table) -> pa.Table:
    """Per-block exact-dup reduction (Arrow hash group-by, C speed),
    probe-gated: near-unique blocks pass through untouched (see gate
    comment — downstream global dedup keeps exactness either way)."""
    b = _enforce(batch)
    if b.num_rows > 2 * _DEDUP_PROBE_ROWS:
        probe = b.slice(0, _DEDUP_PROBE_ROWS)
        kept = probe.group_by(SORT_COLS, use_threads=False) \
            .aggregate([]).num_rows
        if (_DEDUP_PROBE_ROWS - kept) / _DEDUP_PROBE_ROWS \
                < _DEDUP_SKIP_BELOW:
            return b
    return b.group_by(SORT_COLS, use_threads=False).aggregate([]).cast(OUT_SCHEMA)


def _row_key(batch: pa.Table) -> pa.Array:
    """One string per row encoding the full 5-tuple (\\x1f-joined; nulls and
    bools mapped to sentinels so the encoding is injective)."""
    dt = pc.fill_null(batch["obj_datatype"], "\x00")
    lit = pc.if_else(batch["obj_is_literal"], "1", "0")
    return pc.binary_join_element_wise(
        batch["subj"], batch["pred"], batch["obj"], lit, dt, "\x1f")


def dedup_sorted_block(batch: pa.Table) -> pa.Table:
    """Drop rows equal to their predecessor (exact global dedup after the
    full-key sort; see module docstring for why this never misses)."""
    if batch.num_rows <= 1:
        return batch
    key = _row_key(batch)
    if isinstance(key, pa.ChunkedArray):
        key = key.combine_chunks()
    neq = pc.not_equal(key.slice(1), key.slice(0, len(key) - 1))
    keep = pa.concat_arrays(
        [pa.array([True]), pc.fill_null(neq, True).combine_chunks()
         if isinstance(neq, pa.ChunkedArray) else pc.fill_null(neq, True)])
    return batch.filter(keep)


import re as _re

_PFX = pa.array(C.SORT_PREFIXES, pa.string())
_PFX_RE = ("(?s)^(?P<pfx>"
           + "|".join(_re.escape(p) for p in C.SORT_PREFIXES)
           + ")(?P<rest>.*)$")
# bucket -> prefix to re-attach at decode: odd bucket 2i+1 = prefix i,
# even buckets = no prefix (suffix IS the full string)
_PFX_BY_BUCKET = pa.array(
    [C.SORT_PREFIXES[b // 2] if b % 2 else ""
     for b in range(2 * len(C.SORT_PREFIXES) + 1)], pa.string())


def _prefix_encode(col: pa.Array) -> tuple[pa.Array, pa.Array]:
    """(bucket:int8, suffix:string) whose lexicographic order equals the
    full string's, with the prefix bytes stripped from the shuffled payload.

    ``SORT_PREFIXES`` is prefix-free, so at most one prefix matches any
    string and any two distinct prefixes differ at a position inside both —
    hence comparing two prefixed strings resolves inside the prefix region
    exactly like comparing the prefixes themselves. A string s matching no
    prefix gets bucket ``2r`` where r = #prefixes < s: every string with
    prefix p_i < s sorts before s (first-difference inside p_i), every one
    with p_j > s after, so even/odd bucket interleaving preserves total
    order. The map s -> (bucket, suffix) is injective (odd: s = p + suffix;
    even: s = suffix), so neighbor-equality dedup is unchanged.

    One anchored RE2 alternation pass splits (prefix, rest) — measured 4x
    cheaper than per-prefix ``starts_with`` + slice + ``if_else`` (each of
    those materializes the full string column); the rank scan for unmatched
    rows runs only when such rows exist."""
    if col.null_count:
        raise ValueError("prefix encode expects non-null IRI/literal column")
    ex = pc.extract_regex(col, pattern=_PFX_RE)
    hit = pc.is_valid(ex)  # struct-level: fields of null rows hold garbage
    pfx, rest = ex.field("pfx"), ex.field("rest")
    bucket = pc.cast(pc.add(pc.multiply(
        pc.index_in(pfx, value_set=_PFX), 2), 1), pa.int8())
    if not pc.all(hit).as_py():
        rank = None  # r = #prefixes < s, for interleaving unmatched strings
        for p in C.SORT_PREFIXES:
            gt = pc.cast(pc.greater(col, p), pa.int8())
            rank = gt if rank is None else pc.add(rank, gt)
        bucket = pc.if_else(hit, bucket,
                            pc.multiply(rank, pa.scalar(2, pa.int8())))
        suffix = pc.if_else(hit, rest, col)
    else:
        suffix = rest
    return bucket, suffix


def _prefix_decode(bucket, suffix) -> pa.Array:
    if isinstance(bucket, pa.ChunkedArray):
        bucket = bucket.combine_chunks()
    if isinstance(suffix, pa.ChunkedArray):
        suffix = suffix.combine_chunks()
    return pc.binary_join_element_wise(_PFX_BY_BUCKET.take(bucket), suffix, "")


def materialize(triples: ray.data.Dataset, sort: bool = True,
                known_combos: list[tuple[str, bool, str | None]] | None = None,
                bundle_rows: int | None = None) -> ray.data.Dataset:
    """Exact global dedup + global sort of a triples Dataset.

    The sorted path integer-encodes the low-cardinality columns before the
    shuffle: ``pred`` (dozens of distinct IRIs, ~35 B each) and
    ``(obj_is_literal, obj_datatype)`` become two int32 rank columns whose
    order mirrors the string order, cutting ~1 GB of the ~2.7 GB that the
    bench-scale sort moves. Ranks are computed from the actual distinct sets
    (one cheap per-block pass over the materialized pre-deduped Dataset), so
    arbitrary vocabularies work; strings are restored per block after the
    sort. On top of that, ``subj``/``obj`` IRI namespaces from the
    prefix-free ``config.SORT_PREFIXES`` are stripped into int8 bucket
    columns (``_prefix_encode``; ~36 of ~50 subj bytes and ~35 bytes on the
    ~46% of objs that are IRIs), roughly halving the sorted payload again.
    Ordering and dedup exactness are unchanged: the encoded sort key
    (sb, subj, pid, ob, obj, lid) induces exactly the (subj, pred, obj,
    obj_is_literal, obj_datatype) order (proof at ``_prefix_encode``).
    """
    # bundle_rows (opt-in) bundles that many upstream rows per local_dedup
    # task: dedup then collapses duplicates ACROSS many small input blocks
    # and the downstream sort sees few, uniform input blocks (one range
    # partition per block) without an extra repartition pass. ONLY pass it
    # when the input is a many-small-blocks union of MATERIALIZED stages
    # (pipelines/kg.py): on a raw read->extract chain the bundling fuses
    # into the read and serializes it (measured 40x slower at sf0.1).
    ds = triples.map_batches(local_dedup, batch_format="pyarrow",
                             batch_size=bundle_rows, zero_copy_batch=True)
    if sort:
        if known_combos is not None:
            # closed vocabulary supplied by the pipeline (config.py): skips a
            # full materialize + scan of the pre-deduped Dataset (~10-15 s
            # and one extra object-store copy at bench scale). Unknown
            # combos fail loudly at encode (assert below), never silently.
            combos = [{"pred": p, "obj_is_literal": l, "obj_datatype": d}
                      for p, l, d in known_combos]
        else:
            ds = ds.materialize()
            # distinct (pred)/(lit,dtype) sets: per-block unique, tiny rows
            def block_combos(b: pa.Table) -> pa.Table:
                return b.select(["pred", "obj_is_literal", "obj_datatype"]) \
                    .group_by(["pred", "obj_is_literal", "obj_datatype"],
                              use_threads=False).aggregate([])
            combos = ds.map_batches(block_combos, batch_format="pyarrow",
                                    zero_copy_batch=True).take_all()
        pred_arr, lit_arr, dt_arr, ld_key_arr = _combo_tables(combos)
        strict = known_combos is not None
        encode = _make_encode(pred_arr, ld_key_arr, strict)
        decode_dedup = _make_decode_dedup(pred_arr, lit_arr, dt_arr)
        # uniform, moderately-sized blocks before the sort: skewed tiny
        # blocks multiply per-task overhead (measured 2-4x sort wall time;
        # Ray makes one sort partition per input block). Coalescing happens
        # MAP-SIDE via batch_size bundling — each encode task gathers input
        # blocks until ~1M rows — instead of the former repartition(), which
        # was a second all-to-all copying the whole encoded payload through
        # the object store (the ~18 s fixed tail in the round-1 scaling
        # matrix).
        enc = ds.map_batches(encode, batch_format="pyarrow",
                             zero_copy_batch=True)
        s = enc.sort(ENC_SORT_COLS)
        return s.map_batches(decode_dedup, batch_format="pyarrow",
                             batch_size=None, zero_copy_batch=True)
    # unsorted exact dedup (audit paths): single synthetic-key shuffle
    keyed = ds.map_batches(
        lambda b: pa.table({"key": _row_key(b)}), batch_format="pyarrow",
        zero_copy_batch=True)
    distinct = keyed.groupby("key").count()

    def from_key(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["key"], "\x1f")
        f = lambda i: pc.list_element(parts, i)  # noqa: E731
        dt = f(4)
        return pa.table({
            "subj": f(0), "pred": f(1), "obj": f(2),
            "obj_is_literal": pc.equal(f(3), "1"),
            "obj_datatype": pc.if_else(pc.equal(dt, "\x00"),
                                       pa.scalar(None, pa.string()), dt),
        }, schema=OUT_SCHEMA)

    return distinct.map_batches(from_key, batch_format="pyarrow")


ENC_SORT_COLS = ["sb", "subj", "pid", "ob", "obj", "lid"]


def _combo_tables(combos):
    """Rank tables for the integer encoding of the low-cardinality columns:
    (pred_arr, lit_arr, dt_arr, ld_key_arr), ordered like the string sort
    ((lit, dtype): False<True, nulls last)."""
    preds = sorted({c["pred"] for c in combos})
    lds = sorted({(c["obj_is_literal"], c["obj_datatype"]) for c in combos},
                 key=lambda x: (x[0], x[1] is None, x[1] or ""))
    pred_arr = pa.array(preds, pa.string())
    lit_arr = pa.array([x[0] for x in lds], pa.bool_())
    dt_arr = pa.array([x[1] for x in lds], pa.string())
    ld_key_arr = pa.array(
        [("1" if x[0] else "0") + "\x1f" + (x[1] if x[1] is not None else "\x00")
         for x in lds], pa.string())
    return pred_arr, lit_arr, dt_arr, ld_key_arr


def _make_encode(pred_arr, ld_key_arr, strict):
    """Factory for the pre-sort integer/prefix encoder (shared by the
    monolithic and the range-bucketed materialize paths)."""
    def encode(b: pa.Table) -> pa.Table:
        lit = pc.if_else(b["obj_is_literal"], "1", "0")
        dt = pc.fill_null(b["obj_datatype"], "\x00")
        ld_key = pc.binary_join_element_wise(lit, dt, "\x1f")
        pid = pc.index_in(b["pred"], value_set=pred_arr)
        lid = pc.index_in(ld_key, value_set=ld_key_arr)
        if strict and (pid.null_count or lid.null_count):
            bad_preds = pc.unique(
                pc.filter(b["pred"], pc.is_null(pid))).to_pylist()[:5]
            # a KNOWN predicate can still carry an unknown
            # (obj_is_literal, obj_datatype) pairing — report those too,
            # not just unknown predicates
            bad_ld = pc.unique(
                pc.filter(ld_key, pc.is_null(lid))).to_pylist()[:5]
            bad_combos = [
                {"obj_is_literal": k.split("\x1f")[0] == "1",
                 "obj_datatype": (None if k.split("\x1f")[1] == "\x00"
                                  else k.split("\x1f")[1])}
                for k in bad_ld]
            raise ValueError(
                f"materialize(known_combos=...) missing combos: "
                f"unknown predicates {bad_preds}; unknown "
                f"(literal, datatype) pairings {bad_combos}")
        sb, subj = _prefix_encode(b["subj"].combine_chunks()
                                  if isinstance(b["subj"], pa.ChunkedArray)
                                  else b["subj"])
        ob, obj = _prefix_encode(b["obj"].combine_chunks()
                                 if isinstance(b["obj"], pa.ChunkedArray)
                                 else b["obj"])
        return pa.table({
            "sb": sb, "subj": subj, "ob": ob, "obj": obj,
            "pid": pc.cast(pid, pa.int32()),
            "lid": pc.cast(lid, pa.int32())})
    return encode


def _neighbor_dedup_mask(b: pa.Table) -> pa.Array:
    """keep[i] = row i differs from row i-1 on some encoded sort column —
    exact dedup over a SORTED encoded table (module docstring invariant)."""
    keep = None
    for col in ("sb", "subj", "pid", "ob", "obj", "lid"):
        a = b[col].combine_chunks() \
            if isinstance(b[col], pa.ChunkedArray) else b[col]
        neq = pc.not_equal(a.slice(1), a.slice(0, len(a) - 1))
        neq = pc.fill_null(neq, True)
        keep = neq if keep is None else pc.or_(keep, neq)
    if isinstance(keep, pa.ChunkedArray):
        keep = keep.combine_chunks()
    return pa.concat_arrays([pa.array([True]), keep])


def _make_decode(pred_arr, lit_arr, dt_arr):
    """String-restore map over (already deduped) encoded rows: rank gather
    + prefix re-attachment — purely row-local, so callers may apply it to
    any SLICE of a table independently (the streaming-write fast path)."""
    def decode(d: pa.Table) -> pa.Table:
        if d.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        pid, lid = d["pid"], d["lid"]
        return pa.table({
            "subj": pc.cast(_prefix_decode(d["sb"], d["subj"]), pa.string()),
            "pred": pred_arr.take(pid),
            "obj": pc.cast(_prefix_decode(d["ob"], d["obj"]), pa.string()),
            "obj_is_literal": lit_arr.take(lid),
            "obj_datatype": dt_arr.take(lid)}, schema=OUT_SCHEMA)
    return decode


def _make_decode_dedup(pred_arr, lit_arr, dt_arr):
    """Factory for the post-sort neighbor-dedup + string-restore block map
    (shared by the monolithic and the range-bucketed materialize paths)."""
    decode = _make_decode(pred_arr, lit_arr, dt_arr)

    def decode_dedup(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        return decode(b.filter(_neighbor_dedup_mask(b)))
    return decode_dedup


# single-byte rank characters for composing the (sb, subj) range key: sb is
# an int8 < 2*len(SORT_PREFIXES)+1 « 64, and chr(0..63) are one UTF-8 byte
# each, so chr(sb)+subj compares bytewise exactly like the (sb, subj) tuple.
_CHR64 = pa.array([chr(i) for i in range(64)], pa.string())


def _range_key(sb, subj) -> pa.Array:
    """One string per row whose bytewise order equals (sb, subj) order —
    the bucket key of the partitioned materialize (a PREFIX of the full
    encoded sort key, so every group of identical rows shares one key)."""
    if isinstance(sb, pa.ChunkedArray):
        sb = sb.combine_chunks()
    if isinstance(subj, pa.ChunkedArray):
        subj = subj.combine_chunks()
    return pc.binary_join_element_wise(_CHR64.take(sb), subj, "")


def materialize_partitioned(triples: ray.data.Dataset, ck, stage: str = "final",
                            known_combos=None, bundle_rows: int | None = None,
                            n_buckets: int = 32, sample_stride: int = 64,
                            upstream: list[str] = (),
                            fail_hook=None,
                            concurrent_ranges: int = 1,
                            task_sort_max_bytes: int = 512 << 20,
                            encode_first: bool = False) -> ray.data.Dataset:
    """:func:`materialize` with the ONE monolithic range sort split into
    ``n_buckets`` independent per-range sorts, each committing its own
    checkpoint partition (north_rule resume granularity for the FINAL stage,
    not just extraction). Three checkpointed phases under ``ck``:

    1. ``<stage>_plan`` — one streaming, column-pruned sample pass records
       strided (sb, subj) range keys (and the pred/datatype vocabulary when
       ``known_combos`` is not supplied); the driver derives ``n_buckets-1``
       quantile boundaries from it. Committed, so a resumed run re-reads the
       SAME boundaries and reproduces the partitioning bit-for-bit.
    2. ``<stage>_spill`` — one streaming pass: local dedup → integer/prefix
       encode → range-bucket assignment (vectorized ``>= boundary`` sums) →
       each map task writes its batch's bucket slices DIRECTLY to
       ``bucket=<b>/`` parquet under the stage tmp dir (atomic rename on
       completion). The encoded payload never sits in the object store as a
       whole — each bucket spills to storage and is re-read by exactly its
       own sort, which is what removes the single-sort memory wall
       (BASELINE.md "bench800").
    3. ``<stage>_ranges`` — ``partitioned_stage`` over the buckets: each
       bucket whose spill bytes fit ``task_sort_max_bytes`` sorts in ONE
       remote task (read spill runs → Arrow ``sort_by`` → decode_dedup —
       the external-sort reduce; the spill pass was the only all-to-all),
       else it falls back to a distributed ``read → sort → decode_dedup``
       Ray sort job; either way the range commits its own manifest. Death
       mid-sort resumes at the first incomplete RANGE; completed ranges
       are read back, never re-sorted. Size ``n_buckets`` so a typical
       bucket lands under ``task_sort_max_bytes`` (corpus_spill_bytes /
       n_buckets) — that is the per-worker memory contract of the fast
       path, and the fallback keeps oversized stragglers correct.

    Output equals :func:`materialize` row-for-row: the bucket key is a
    prefix of the encoded sort key (ties inseparable → identical rows land
    in one bucket → in-bucket neighbor dedup stays exact), and bucket-order
    concatenation of sorted buckets is globally sorted. The ON-DISK stage
    artifact (range dirs in bucket order, files in name order) is globally
    sorted — asserted in tests; the returned Dataset's in-memory iteration
    order additionally requires ``execution_options.preserve_order`` (Ray's
    streaming executor otherwise yields read blocks in completion order —
    set semantics, same as every oracle comparison). The checkpoint dir
    must be on storage all workers share (same contract as every other
    checkpointed stage). ``fail_hook(bucket_key)`` is a test seam invoked
    before each range build (fault injection for the resume test).
    """
    import json
    import os
    import uuid

    import numpy as np
    import pyarrow.parquet as pqt

    need_combos = known_combos is None
    if encode_first and need_combos:
        raise ValueError("encode_first requires known_combos: the encoder "
                         "vocabulary must exist before the single "
                         "dedup+encode pass")

    # encode_first: dedup + integer/prefix-encode the corpus ONCE, BEFORE
    # the stage boundary, and materialize the ENCODED form — the plan and
    # spill passes then read ~60 B/row instead of full-IRI strings
    # (~150 B/row pre-dedup). This is the right shape when the input is a
    # COMPUTED stream (the flagship's union of extract/link stages): the
    # alternative — materializing the raw triples so two passes can read
    # them — pushes 2-4x the bytes through the shared object store, which
    # is exactly the one-box plasma ceiling BASELINE.md's bench800 section
    # documents. Leave False when the input is already disk-backed
    # (checkpointed parquet): there the plan pass reads only the pruned
    # subj column from storage and the spill pass streams, so nothing
    # needs to sit in the object store at all.
    enc_ds = None
    if encode_first:
        combos = [{"pred": p, "obj_is_literal": l, "obj_datatype": d}
                  for p, l, d in known_combos]
        pred_arr, lit_arr, dt_arr, ld_key_arr = _combo_tables(combos)
        encode = _make_encode(pred_arr, ld_key_arr, True)
        decode_dedup = _make_decode_dedup(pred_arr, lit_arr, dt_arr)
        decode = _make_decode(pred_arr, lit_arr, dt_arr)
        if not (ck.is_complete(stage + "_plan")
                and ck.is_complete(stage + "_spill")):
            # batch_size=None (per-block dedup), NOT bundle_rows: on a lazy
            # computed chain a row-bundled batch fuses into the upstream
            # read and serializes it (see materialize()'s bundle_rows
            # note). The heavy duplicate classes are intra-conversation,
            # so per-block dedup already collapses them; stragglers fall
            # to the in-range neighbor dedup.
            enc_ds = triples.map_batches(
                local_dedup, batch_format="pyarrow",
                zero_copy_batch=True) \
                .map_batches(encode, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    def sample_block_enc(b: pa.Table) -> pa.Table:
        """Plan sampler over the ALREADY-ENCODED corpus (encode_first)."""
        s = pa.schema([("kind", pa.string()), ("pred", pa.string()),
                       ("lit", pa.bool_()), ("dt", pa.string()),
                       ("skey", pa.string())])
        idx = pa.array(np.arange(0, b.num_rows, sample_stride,
                                 dtype=np.int64))
        sk = _range_key(b["sb"].take(idx), b["subj"].take(idx))
        n = len(sk)
        return pa.table({
            "kind": pa.array(["skey"] * n), "pred": pa.nulls(n, pa.string()),
            "lit": pa.nulls(n, pa.bool_()), "dt": pa.nulls(n, pa.string()),
            "skey": sk}, schema=s)

    def sample_block(b: pa.Table) -> pa.Table:
        parts = []
        s = pa.schema([("kind", pa.string()), ("pred", pa.string()),
                       ("lit", pa.bool_()), ("dt", pa.string()),
                       ("skey", pa.string())])
        if need_combos:
            co = _enforce(b).select(
                ["pred", "obj_is_literal", "obj_datatype"]) \
                .group_by(["pred", "obj_is_literal", "obj_datatype"],
                          use_threads=False).aggregate([])
            n = co.num_rows
            parts.append(pa.table({
                "kind": pa.array(["combo"] * n), "pred": co["pred"],
                "lit": co["obj_is_literal"], "dt": co["obj_datatype"],
                "skey": pa.nulls(n, pa.string())}, schema=s))
        subj = b["subj"].combine_chunks() \
            if isinstance(b["subj"], pa.ChunkedArray) else b["subj"]
        subj = pc.cast(subj, pa.string())
        idx = pa.array(np.arange(0, len(subj), sample_stride, dtype=np.int64))
        sb, suf = _prefix_encode(subj.take(idx))
        sk = _range_key(sb, suf)
        n = len(sk)
        parts.append(pa.table({
            "kind": pa.array(["skey"] * n), "pred": pa.nulls(n, pa.string()),
            "lit": pa.nulls(n, pa.bool_()), "dt": pa.nulls(n, pa.string()),
            "skey": sk}, schema=s))
        return pa.concat_tables(parts)

    if encode_first:
        plan = ck.stage(stage + "_plan",
                        lambda: enc_ds.select_columns(["sb", "subj"])
                        .map_batches(sample_block_enc,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True),
                        upstream=list(upstream))
    else:
        sample_in = (triples if need_combos
                     else triples.select_columns(["subj"]))
        plan = ck.stage(stage + "_plan",
                        lambda: sample_in.map_batches(
                            sample_block, batch_format="pyarrow",
                            zero_copy_batch=True),
                        upstream=list(upstream))
    rows = plan.take_all()
    skeys = sorted(r["skey"] for r in rows if r["kind"] == "skey")
    if known_combos is not None:
        combos = [{"pred": p, "obj_is_literal": l, "obj_datatype": d}
                  for p, l, d in known_combos]
    else:
        combos = [{"pred": r["pred"], "obj_is_literal": r["lit"],
                   "obj_datatype": r["dt"]} for r in rows
                  if r["kind"] == "combo"]
        combos = [dict(t) for t in
                  {tuple(sorted(c.items(), key=lambda kv: kv[0]))
                   for c in combos}]
    if skeys and n_buckets > 1:
        pick = np.linspace(0, len(skeys) - 1, n_buckets + 1)[1:-1]
        boundaries = sorted({skeys[int(i)] for i in pick})
    else:
        boundaries = []
    eff = len(boundaries) + 1

    if not encode_first:
        pred_arr, lit_arr, dt_arr, ld_key_arr = _combo_tables(combos)
        encode = _make_encode(pred_arr, ld_key_arr,
                              known_combos is not None)
        decode_dedup = _make_decode_dedup(pred_arr, lit_arr, dt_arr)
        decode = _make_decode(pred_arr, lit_arr, dt_arr)

    def spill_writer(tmp: str) -> dict:
        for bk in range(eff):
            os.makedirs(os.path.join(tmp, f"bucket={bk}"), exist_ok=True)

        def write_block(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"bucket": pa.array([], pa.int32()),
                                 "rows": pa.array([], pa.int64())})
            sk = _range_key(t["sb"], t["subj"])
            bucket = None
            for bd in boundaries:
                ge = pc.cast(pc.greater_equal(sk, bd), pa.int32())
                bucket = ge if bucket is None else pc.add(bucket, ge)
            bk = (bucket.to_numpy(zero_copy_only=False)
                  if bucket is not None
                  else np.zeros(t.num_rows, np.int32))
            order = np.argsort(bk, kind="stable")
            tt = t.take(pa.array(order))
            bs = bk[order]
            present = np.unique(bs)
            starts = np.searchsorted(bs, present)
            ends = np.append(starts[1:], len(bs))
            fn = uuid.uuid4().hex
            out_b, out_r = [], []
            for p, s0, s1 in zip(present, starts, ends):
                sl = tt.slice(int(s0), int(s1 - s0))
                pqt.write_table(sl, os.path.join(
                    tmp, f"bucket={int(p)}", f"part-{fn}.parquet"))
                out_b.append(int(p))
                out_r.append(int(s1 - s0))
            return pa.table({"bucket": pa.array(out_b, pa.int32()),
                             "rows": pa.array(out_r, pa.int64())})

        if encode_first:
            # the encoded corpus is MATERIALIZED, so bundling here cannot
            # fuse into (and serialize) an upstream read — bundle to ~4M
            # rows (~250 MB encoded) per spill task. Per-task spill writes
            # then produce a handful of LARGE per-bucket runs instead of
            # one sliver per tiny block: measured at bench3200, hundreds
            # of ~1 MB files per bucket became ~tens, and every range
            # sort's file-open tail shrank with them (round-5 VERDICT #1).
            enc = enc_ds
            spill_bundle = 4_194_304
        else:
            enc = triples.map_batches(local_dedup, batch_format="pyarrow",
                                      batch_size=bundle_rows,
                                      zero_copy_batch=True) \
                         .map_batches(encode, batch_format="pyarrow",
                                      zero_copy_batch=True)
            spill_bundle = None
        summary = enc.map_batches(write_block, batch_format="pyarrow",
                                  batch_size=spill_bundle,
                                  zero_copy_batch=True).take_all()
        per = {}
        for r in summary:
            per[r["bucket"]] = per.get(r["bucket"], 0) + r["rows"]
        return {"granularity": "range-bucket", "n_buckets": eff,
                "rows": int(sum(per.values())),
                "bucket_rows": {str(k): int(v)
                                for k, v in sorted(per.items())}}

    spill_dir = ck.custom_stage(stage + "_spill", spill_writer,
                                upstream=[stage + "_plan", *upstream])

    part_keys = [f"{bk:05d}" for bk in range(eff)]

    @ray.remote
    def sort_bucket_to_file(file_list: list[str], out_path: str) -> int:
        # external-sort reduce: ONE vectorized Arrow pass per range, with
        # the parquet WRITE inside the same task. The spill pass already
        # did the only all-to-all (range partitioning to disk), so sorting
        # a bucket needs no second shuffle — read the bucket's spill runs,
        # one C++ sort_by over the 6 encoded sort columns, neighbor-dedup
        # on the ENCODED rows, then decode + write the committed range in
        # ~1M-row slices through one ParquetWriter. Writing here (round 5)
        # instead of returning the decoded table to a separate write task
        # keeps the ~1 GB decoded range out of the shared object store
        # entirely; slicing the decode bounds the task's peak heap at the
        # encoded table + ONE decoded slice (the string blow-up never
        # exists whole), which is what lets k concurrent sessions on one
        # box (the node-scaling experiment) stay out of the OOM killer.
        t = pa.concat_tables(pqt.read_table(f) for f in file_list)
        t = t.combine_chunks().sort_by(
            [(c, "ascending") for c in ENC_SORT_COLS])
        t = t.filter(_neighbor_dedup_mask(t))
        total = 0
        step = 1 << 20
        writer = pqt.ParquetWriter(out_path, OUT_SCHEMA)
        try:
            for off in range(0, t.num_rows, step):
                d = decode(t.slice(off, step))
                writer.write_table(d)
                total += d.num_rows
        finally:
            writer.close()
        return total

    def write_bucket(pkey: str, data_dir: str) -> None:
        if fail_hook is not None:
            fail_hook(pkey)
        bdir = os.path.join(spill_dir, f"bucket={int(pkey)}")
        files = [os.path.join(bdir, f) for f in sorted(os.listdir(bdir))
                 if f.endswith(".parquet")]
        if not files:
            return  # empty range: data dir stays empty (rows=0 manifest)
        # single-task in-memory sort whenever the bucket's spill bytes fit
        # a worker's heap; a bucket that outgrew the plan's sizing (skewed
        # range, undersized n_buckets) falls back to a distributed Ray
        # sort job over the same files — same output, bounded memory.
        spill_bytes = sum(os.path.getsize(f) for f in files)
        if spill_bytes <= task_sort_max_bytes:
            ray.get(sort_bucket_to_file.remote(
                files, os.path.join(data_dir, "part-00000.parquet")))
            return
        ray.data.read_parquet(files) \
            .sort(ENC_SORT_COLS) \
            .map_batches(decode_dedup, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True) \
            .write_parquet(data_dir)

    # concurrent_ranges > 1 sorts that many ranges as concurrent Ray jobs
    # (each still commits atomically) — amortizes the per-sort-job startup
    # that otherwise serializes n_buckets times; keep 1 for strictly
    # ordered resume points (the checkpointed-job default).
    return ck.partitioned_stage(stage + "_ranges", part_keys, None,
                                upstream=[stage + "_spill", *upstream],
                                max_concurrent=concurrent_ranges,
                                write_one=write_bucket)


def render_ntriples(batch: pa.Table) -> pa.Table:
    """Triples -> one N-Triples line per row (text renderer, S4 analog)."""
    subj = pc.binary_join_element_wise("<", batch["subj"], "> ", "")
    pred = pc.binary_join_element_wise("<", batch["pred"], "> ", "")
    # literal objects: escape backslash + quote + newline, add datatype tag
    esc = pc.replace_substring(batch["obj"], "\\", "\\\\")
    esc = pc.replace_substring(esc, '"', '\\"')
    esc = pc.replace_substring(esc, "\n", "\\n")
    lit = pc.binary_join_element_wise(
        '"', esc, '"^^<', pc.fill_null(batch["obj_datatype"], C.XSD_STRING),
        "> .", "")
    iri_obj = pc.binary_join_element_wise("<", batch["obj"], "> .", "")
    obj = pc.if_else(batch["obj_is_literal"], lit, iri_obj)
    line = pc.binary_join_element_wise(subj, pred, obj, "")
    return pa.table({"text": line})


class _TextLineSink:
    """Raw text-line datasink factory (NOT a CSV writer: N-Triples lines
    legally contain quotes, which Arrow's unquoted CSV writer rejects as
    RFC4180 structural characters — a latent bug of the previous
    ``write_csv(quoting_style="none")`` sink for every literal triple)."""

    @staticmethod
    def build(path: str, compression: str | None):
        from ray.data.datasource import BlockBasedFileDatasink

        class _Sink(BlockBasedFileDatasink):
            def write_block_to_file(self, block, file) -> None:
                col = block.to_arrow()["text"]
                for chunk in (col.chunks if isinstance(col, pa.ChunkedArray)
                              else [col]):
                    if len(chunk):
                        file.write("\n".join(chunk.to_pylist())
                                   .encode("utf-8") + b"\n")

        ext = "nt" if compression is None else "nt.gz"
        args = ({"compression": "gzip"} if compression == "gzip" else None)
        return _Sink(path, file_format=ext, open_stream_args=args)


def write_ntriples(triples: ray.data.Dataset, out_dir: str,
                   compression: str | None = None) -> None:
    """Text N-Triples sink; ``compression="gzip"`` writes ``.nt.gz`` part
    files (parity with the reference's gzip sink,
    ``create_yelp_nt_files.py:31`` — but one file PER BLOCK with atomic
    directory semantics, not one append-mode stream)."""
    triples.map_batches(render_ntriples, batch_format="pyarrow",
                        zero_copy_batch=True) \
        .write_datasink(_TextLineSink.build(out_dir, compression))


# Turtle prefix table: longest-prefix-first so e.g. the entity namespace
# never shadows a longer one. Kept tiny and closed — Turtle compaction is
# a RENDERING concern; the engine's canonical form stays full-IRI.
TTL_PREFIXES = (
    ("ent", C.ENT),
    ("prop", C.PROP),
    ("schema", C.SCHEMA),
    ("rdf", C.RDF),
    ("rdfs", C.RDFS),
    ("xsd", C.XSD),
    ("wd", C.WD),
)


def ttl_header() -> str:
    """The @prefix block every Turtle part file starts with."""
    return "\n".join(f"@prefix {p}: <{iri}> ."
                     for p, iri in TTL_PREFIXES) + "\n"


def _ttl_compact(col):
    """IRI column -> prefixed-name column where a prefix applies (local
    names here are [A-Za-z0-9_/]-safe by construction; names containing
    '/' keep the full <IRI> form since Turtle PN_LOCAL forbids it)."""
    out = pc.binary_join_element_wise("<", col, ">", "")
    for p, iri in TTL_PREFIXES:
        local = pc.replace_substring(col, iri, "")
        ok = pc.and_(pc.starts_with(col, iri),
                     pc.invert(pc.match_substring(local, "/")))
        out = pc.if_else(ok, pc.binary_join_element_wise(
            pa.nulls(len(col), pa.string()).fill_null(p + ":"),
            local, ""), out)
    return out


def render_turtle(batch: pa.Table) -> pa.Table:
    """Triples -> one compact Turtle statement per row (no grouping by
    subject — keeps the renderer stateless/block-local; Turtle permits
    repeated subjects). Literal escaping matches the N-Triples renderer;
    xsd:string literals drop the redundant datatype tag (Turtle default),
    other datatypes keep ``^^prefixed``."""
    subj = _ttl_compact(batch["subj"])
    pred = _ttl_compact(batch["pred"])
    esc = pc.replace_substring(batch["obj"], "\\", "\\\\")
    esc = pc.replace_substring(esc, '"', '\\"')
    esc = pc.replace_substring(esc, "\n", "\\n")
    dt = pc.fill_null(batch["obj_datatype"], C.XSD_STRING)
    plain = pc.binary_join_element_wise('"', esc, '" .', "")
    typed = pc.binary_join_element_wise(
        '"', esc, '"^^', _ttl_compact(dt), " .", "")
    lit = pc.if_else(pc.equal(dt, C.XSD_STRING), plain, typed)
    iri_obj = pc.binary_join_element_wise(
        _ttl_compact(batch["obj"]), " .", "")
    obj = pc.if_else(batch["obj_is_literal"], lit, iri_obj)
    line = pc.binary_join_element_wise(subj, " ", pred, " ", obj, "")
    return pa.table({"text": line})


def write_turtle(triples: ray.data.Dataset, out_dir: str,
                 compression: str | None = None) -> None:
    """Turtle sink: every part file carries the @prefix header so each is
    independently parseable (resumable-output contract — a failed run's
    completed part files stand alone)."""
    from ray.data.datasource import BlockBasedFileDatasink

    header = ttl_header().encode("utf-8")

    class _Sink(BlockBasedFileDatasink):
        def write_block_to_file(self, block, file) -> None:
            col = block.to_arrow()["text"]
            file.write(header)
            for chunk in (col.chunks if isinstance(col, pa.ChunkedArray)
                          else [col]):
                if len(chunk):
                    file.write("\n".join(chunk.to_pylist())
                               .encode("utf-8") + b"\n")

    ext = "ttl" if compression is None else "ttl.gz"
    args = ({"compression": "gzip"} if compression == "gzip" else None)
    triples.map_batches(render_turtle,
                        batch_format="pyarrow").write_datasink(
        _Sink(out_dir, file_format=ext, open_stream_args=args))
