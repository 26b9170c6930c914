"""The flagship pipeline: extract → link → canonicalize → materialize.

End-to-end composition of the four stages mandated by ``BASELINE.json
north_star``, mirroring the reference's ``create_YCKG.py`` driver
(``create_YCKG.py:25-52``: per-domain emission, then schema enrichment, then
wikidata mapping) as one streaming Ray Data job:

  transcripts ─┬─ structural triples (stateless map_batches)
               ├─ mention triples (detector actor pool)
               │     └─ canonicalize (broadcast alias map rewrite)
               │           ├─ mention class/label triples
               │           └─ distinct forms ─ link scorer (actor pool)
               │                 ├─ sameAs triples
               │                 └─ type enrichment triples
               └─ dead-letter Dataset (audit channel)
  union(all triples) ─ global dedup ─ global sort ─ parquet (+ manifests)

Every stage is optionally checkpointed through ``state.checkpoint`` so a
killed run resumes from the last complete stage with identical output.
"""

from __future__ import annotations

import os

import ray
import ray.data

from ..fixtures import generator
from ..stages import canonicalize as canon
from ..stages import enrich, extract, link, materialize, mentions
from ..state.checkpoint import CheckpointedRun


def load_config_tables(fixture_dir: str):
    """Driver-side load of the tiny curated tables (broadcast sides)."""
    import pyarrow.parquet as pq
    alias = pq.read_table(f"{fixture_dir}/alias_table.parquet")
    alias_rows = list(zip(alias["surface_norm"].to_pylist(),
                          alias["canonical"].to_pylist()))
    vocab_surfaces = mentions.load_vocab_surfaces(fixture_dir)
    snapshot = link.load_snapshot(fixture_dir)
    ents = pq.read_table(f"{fixture_dir}/entities.parquet",
                         columns=["entity_id", "type_id"])
    entity_types = dict(zip(ents["entity_id"].to_pylist(),
                            ents["type_id"].to_pylist()))
    th = pq.read_table(f"{fixture_dir}/type_hierarchy.parquet")
    hierarchy = list(zip(th["type_id"].to_pylist(),
                         th["super_type_id"].to_pylist()))
    return alias_rows, vocab_surfaces, snapshot, entity_types, hierarchy


def build_graph(transcripts: ray.data.Dataset, fixture_dir: str,
                concurrency: int | None = None,
                include_enrichment: bool = True,
                checkpoint_dir: str | None = None,
                distributed_canon_map: bool = False,
                final_ckpt_dir: str | None = None,
                n_buckets: int = 32) -> ray.data.Dataset:
    """Full KG construction; returns the materialized (sorted, deduped)
    triples Dataset. ``distributed_canon_map=True`` computes the alias
    closure with the shuffle-native components job instead of the driver
    (identical result; used to exercise the scale path).

    ``final_ckpt_dir``: use the range-bucketed, disk-spilling final
    materialize (``materialize.materialize_partitioned``) with its
    checkpoint under that dir — the memory-boundary scale path for corpora
    whose encoded sort payload presses the per-node object store (BASELINE
    "bench800"). With ``encode_first`` the union streams ONCE through
    dedup+encode, so upstream stages stay lazy exactly as in the
    monolithic path."""
    if concurrency is None:
        # autoscaling actor pools sized to the cluster (1 CPU per actor)
        concurrency = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
    alias_rows, vocab, snapshot, entity_types, hierarchy = \
        load_config_tables(fixture_dir)
    if distributed_canon_map:
        cmap = canon.build_canonical_map(alias_rows)
    else:
        cmap = canon.build_canonical_map_local(alias_rows)

    ck = CheckpointedRun(checkpoint_dir) if checkpoint_dir else None
    two_pass_final = final_ckpt_dir is not None

    def _stage(name, build, upstream=(), fan_out=True):
        """Stage boundary. With a checkpoint dir: atomic parquet + manifest
        per stage. Without: materialize ONLY outputs consumed by more than
        one downstream (``fan_out``) — single-consumer stages stay lazy so
        the streaming executor pipelines them into the next job (extract
        overlaps the final sort; mentions+canonicalize actor pools overlap
        in one executor graph)."""
        if ck is None:
            ds = build()
            return ds.materialize() if fan_out else ds
        return ck.stage(name, build, upstream)

    structural = _stage("structural",
                        lambda: extract.structural_triples(transcripts),
                        fan_out=False)
    raw_mentions = _stage("mentions",
                          lambda: mentions.mention_triples(
                              transcripts, vocab, concurrency=concurrency),
                          fan_out=False)
    canon_mentions = _stage("canonical_mentions",
                            lambda: canon.canonicalize_mentions(
                                raw_mentions, cmap, concurrency=concurrency),
                            upstream=["mentions"])
    parts = [structural, canon_mentions,
             mentions.mention_entity_triples(canon_mentions)]
    if include_enrichment:
        links = link.link_mentions(canon_mentions, snapshot,
                                   concurrency=concurrency)
        link_triples = _stage("links", lambda: links,
                              upstream=["canonical_mentions"])
        # re-derive (form, entity_id) pairs from the sameAs triples for the
        # enrichment expansion (cheap projection)
        import pyarrow.compute as pc
        import pyarrow as pa
        from .. import config as C

        def to_pairs(b: pa.Table) -> pa.Table:
            return pa.table({
                "form": pc.replace_substring(b["subj"].combine_chunks(),
                                             C.ENT + "mention/", ""),
                "entity_id": pc.replace_substring(b["obj"].combine_chunks(),
                                                  C.WD, "")})
        pairs = link_triples.map_batches(to_pairs, batch_format="pyarrow")
        parts.append(link_triples)
        parts.append(enrich.enrichment_triples(pairs, entity_types, hierarchy))
    all_triples = parts[0]
    for p in parts[1:]:
        all_triples = all_triples.union(p)
    from .. import config as C
    if two_pass_final:
        # encode_first: the union streams ONCE through dedup+encode and
        # only the compact ENCODED corpus is materialized for the plan and
        # spill passes — materializing the raw full-IRI triples here
        # pushed 2-4x the bytes through the shared object store (the
        # bench800 plasma ceiling). Range sorts are single remote tasks
        # (corpus/n_buckets rows each, ~1 CPU apiece), so size their
        # concurrency TO THE CLUSTER: the fixed 8 of round 4 left half a
        # 16-CPU node idle through the whole ranges phase (measured
        # 33 s of 123 s at bench3200/16); capped at 16 so peak per-task
        # heap (~2.5 GB sort+decode working set) stays bounded.
        cr = min(16, max(8, int(ray.cluster_resources().get("CPU", 8))))
        return materialize.materialize_partitioned(
            all_triples, CheckpointedRun(final_ckpt_dir), stage="final",
            known_combos=C.KNOWN_COMBOS, bundle_rows=None,
            n_buckets=n_buckets, concurrent_ranges=cr, encode_first=True)
    final = _stage("final", lambda: materialize.materialize(
        all_triples, known_combos=C.KNOWN_COMBOS, bundle_rows=1_048_576),
        upstream=["structural", "canonical_mentions", "links"])
    return final


def _link_pairs(link_triples: ray.data.Dataset) -> ray.data.Dataset:
    """(form, entity_id) pairs re-derived from sameAs triples (projection)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .. import config as C

    def to_pairs(b: pa.Table) -> pa.Table:
        return pa.table({
            "form": pc.replace_substring(b["subj"].combine_chunks(),
                                         C.ENT + "mention/", ""),
            "entity_id": pc.replace_substring(b["obj"].combine_chunks(),
                                              C.WD, "")})
    return link_triples.map_batches(to_pairs, batch_format="pyarrow")


def _partition_triples(ts: ray.data.Dataset, tables,
                       concurrency: int) -> ray.data.Dataset:
    """Per-TURN triples for ONE input partition (structural + canonical
    mention + mention-entity) — embarrassingly parallel across input
    files. The per-FORM stages (link, enrichment) are NOT here: they are
    deterministic functions of the distinct form set, so
    :func:`run_kg_partitioned` hoists them into ONE global pass over the
    distinct forms of ALL shards — per-shard scoring re-scored every form
    repeated across shards (collapsed later in the materialize, correct
    but wasted scorer work at 100x shard counts)."""
    alias_rows, vocab, snapshot, entity_types, hierarchy = tables
    cmap = canon.build_canonical_map_local(alias_rows)
    structural = extract.structural_triples(ts)
    raw = mentions.mention_triples(ts, vocab, concurrency=concurrency)
    cm = canon.canonicalize_mentions(raw, cmap,
                                     concurrency=concurrency).materialize()
    parts = [structural, cm, mentions.mention_entity_triples(cm)]
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    return u


def run_kg_partitioned(sf_dir: str, checkpoint_dir: str,
                       concurrency: int = 4,
                       include_enrichment: bool = True,
                       n_buckets: int = 32,
                       fail_hook=None) -> ray.data.Dataset:
    """Flagship build with PER-PARTITION checkpoint/resume (north_rule's
    resume granularity) END TO END: the extraction phase is sharded by
    input transcript file, every shard commits independently
    (``state.checkpoint.partitioned_stage``); the per-FORM work — link
    scoring + enrichment — runs ONCE globally over the distinct forms of
    ALL shards (its own committed stage; per-shard scoring would re-score
    every form repeated across shards); and the final global materialize
    is range-bucketed (``materialize.materialize_partitioned``) so each
    of its ``n_buckets`` sort ranges ALSO commits independently — a death
    mid-sort resumes at the first incomplete range instead of redoing the
    whole-corpus sort. Output is identical to :func:`run_kg` (verified in
    tests). ``fail_hook(bucket_key)`` is the test fault-injection seam
    for the materialize phase."""
    from .. import config as C
    fdir = generator.ensure_fixtures(sf_dir)
    tdir = os.path.join(fdir, "transcripts.parquet")
    part_files = sorted(f for f in os.listdir(tdir) if f.endswith(".parquet"))
    tables = load_config_tables(fdir)
    ck = CheckpointedRun(checkpoint_dir)

    def build_one(pkey: str) -> ray.data.Dataset:
        ts = ray.data.read_parquet(os.path.join(tdir, pkey))
        return _partition_triples(ts, tables, concurrency)

    tri = ck.partitioned_stage("extract_triples", part_files, build_one)
    upstream = ["extract_triples"]
    if include_enrichment:
        import pyarrow.compute as pc
        _, _, snapshot, entity_types, hierarchy = tables

        def build_links() -> ray.data.Dataset:
            # canonical mention rows of EVERY shard (column-pruned read of
            # the committed parquet); link_mentions dedups to the global
            # distinct form set before the scorer sees anything
            cm = tri.filter(
                expr=f"pred == '{C.PRED_MENTIONS}'")
            return link.link_mentions(cm, snapshot,
                                      concurrency=concurrency)

        links = ck.stage("links", build_links, upstream=upstream)
        enr = enrich.enrichment_triples(_link_pairs(links),
                                        entity_types, hierarchy)
        tri = tri.union(links).union(enr)
        upstream = upstream + ["links"]
    return materialize.materialize_partitioned(
        tri, ck, stage="final", known_combos=C.KNOWN_COMBOS,
        bundle_rows=1_048_576, n_buckets=n_buckets,
        upstream=upstream, fail_hook=fail_hook)


def read_transcripts(fdir: str) -> ray.data.Dataset:
    """Parallel transcript read. This Ray version issues ONE read task per
    parquet file (``override_num_blocks`` merely appends a SplitBlocks op —
    a single 2M-turn file read single-threaded for ~15 s and starved every
    fused map stage, per ds.stats()), so the fixture is a DIRECTORY of 64k-row
    part files (fixtures/generator.py) and the read fans out per file."""
    return ray.data.read_parquet(os.path.join(fdir, "transcripts.parquet"))


def run_kg(sf_dir: str, concurrency: int | None = None,
           include_enrichment: bool = True,
           checkpoint_dir: str | None = None,
           final_ckpt_dir: str | None = None,
           n_buckets: int | None = None) -> ray.data.Dataset:
    """Convenience entry: fixtures for this sf, read transcripts, build KG.

    ``n_buckets=None`` sizes the partitioned final's range count to the
    CORPUS so every bucket honors the fast path's per-task spill contract
    (~400 MB < task_sort_max_bytes): ~7.3 triples/turn x ~60 B/row
    encoded, floored at 32 buckets for parallelism. Corpora up to
    bench3200 resolve to the round-4/5 measured 32; bench6400 doubles to
    68 instead of silently pushing every range onto the distributed-sort
    fallback."""
    import pyarrow.parquet as pqt
    fdir = generator.ensure_fixtures(sf_dir)
    if n_buckets is None:
        tdir = os.path.join(fdir, "transcripts.parquet")
        turns = sum(
            pqt.ParquetFile(os.path.join(tdir, f)).metadata.num_rows
            for f in os.listdir(tdir) if f.endswith(".parquet"))
        spill_bytes = int(turns * 7.3 * 60)
        n_buckets = min(96, max(32, spill_bytes // (400 << 20)))
    ts = read_transcripts(fdir)
    return build_graph(ts, fdir, concurrency=concurrency,
                       include_enrichment=include_enrichment,
                       checkpoint_dir=checkpoint_dir,
                       final_ckpt_dir=final_ckpt_dir, n_buckets=n_buckets)
