"""Driver-facing query registry: Ray implementation + DuckDB oracle per op.

Each ``queries()`` entry is one operator/pipeline from SURVEY.md §2; the
matching ``oracle_sql()`` string recomputes the same result in ANSI SQL over
the same parquet inputs (testdata views + the deterministic transcript
fixtures under ``/tmp/yckg_fixtures``). Column names are aligned on both
sides — the driver sorts columns by name and hashes values.

The KG queries read the *generated* transcripts fixture (the
``BASELINE.json input_hint`` table shape); ``oracle_sql()`` triggers fixture
generation for sf0.01 so the SQL paths exist regardless of call order.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from . import config as C
from .fixtures import generator
from .functions.normalize import normalize_sql

SF_ORACLE = "sf0.01"  # the driver's correctness scale


def _fx(sf_dir: str) -> str:
    return generator.ensure_fixtures(sf_dir)


def _read_transcripts(sf_dir: str, columns=None) -> ray.data.Dataset:
    # multi-file dir -> one read task per part file (fixtures/generator.py)
    return ray.data.read_parquet(
        os.path.join(_fx(sf_dir), "transcripts.parquet"), columns=columns)


TOOL_OK_SQL = ("tool IS NOT NULL AND tool NOT IN " +
               "(" + ",".join(f"'{v}'" for v in C.NONE_VALUES if v) + ",'')")


def _sql_prefix(fdir: str) -> str:
    """Shared CTEs: transcripts with IRIs, detection vocab, entity names."""
    return f"""
WITH t AS (
  SELECT *,
    '{C.ENT}turn/' || conv_id || '/' || turn_idx AS turn_iri,
    '{C.ENT}conversation/' || conv_id AS conv_iri
  FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
),
vocab AS (SELECT DISTINCT surface_form, canonical
          FROM read_parquet('{fdir}/vocab.parquet')),
mention AS (
  SELECT DISTINCT t.turn_iri, t.conv_id, t.turn_idx, v.canonical
  FROM t JOIN vocab v ON position(v.surface_form IN lower(t.text)) > 0
),
forms AS (SELECT DISTINCT canonical AS form FROM mention),
ent_names AS (
  SELECT entity_id, {normalize_sql('label')} AS nname
  FROM read_parquet('{fdir}/entities.parquet')
  UNION
  SELECT entity_id, {normalize_sql('al.a')} AS nname
  FROM read_parquet('{fdir}/entities.parquet') e, unnest(e.aliases) AS al(a)
),
linked AS (
  SELECT f.form,
         coalesce(ov.entity_id,
                  (SELECT min(e.entity_id) FROM ent_names e
                   WHERE e.nname = f.form)) AS entity_id
  FROM forms f
  LEFT JOIN read_parquet('{fdir}/manual_overrides.parquet') ov
         ON ov.surface_norm = f.form
)
"""


def _structural_sql() -> str:
    return f"""
  SELECT turn_iri AS subj, '{C.RDF_TYPE}' AS pred, '{C.CLASS_TURN}' AS obj,
         false AS obj_is_literal, CAST(NULL AS VARCHAR) AS obj_datatype FROM t
  UNION
  SELECT turn_iri, '{C.PRED_IS_PART_OF}', conv_iri, false, NULL FROM t
  UNION
  SELECT conv_iri, '{C.RDF_TYPE}', '{C.CLASS_CONVERSATION}', false, NULL FROM t
  UNION
  SELECT turn_iri, '{C.PRED_POSITION}', CAST(turn_idx AS VARCHAR), true,
         '{C.XSD_INTEGER}' FROM t
  UNION
  SELECT turn_iri, '{C.PRED_ROLE}', role, true, '{C.XSD_STRING}' FROM t
  UNION
  SELECT turn_iri, '{C.PRED_DATE_CREATED}',
         strftime(ts, '%Y-%m-%dT%H:%M:%S'), true, '{C.XSD_DATETIME}' FROM t
  UNION
  SELECT turn_iri, '{C.PRED_TEXT}', text, true, '{C.XSD_STRING}' FROM t
  UNION
  SELECT turn_iri, '{C.PRED_USES_TOOL}',
         '{C.ENT}tool/' || {normalize_sql('tool')}, false, NULL
  FROM t WHERE {TOOL_OK_SQL}
  UNION
  SELECT '{C.ENT}tool/' || {normalize_sql('tool')}, '{C.RDF_TYPE}',
         '{C.CLASS_TOOL}', false, NULL
  FROM t WHERE {TOOL_OK_SQL}
"""


def _mention_sql() -> str:
    return f"""
  SELECT DISTINCT turn_iri AS subj, '{C.PRED_MENTIONS}' AS pred,
         '{C.ENT}mention/' || canonical AS obj,
         false AS obj_is_literal, CAST(NULL AS VARCHAR) AS obj_datatype
  FROM mention
"""


def _mention_entity_sql() -> str:
    return f"""
  SELECT '{C.ENT}mention/' || form AS subj, '{C.RDF_TYPE}' AS pred,
         '{C.CLASS_MENTION}' AS obj, false AS obj_is_literal,
         CAST(NULL AS VARCHAR) AS obj_datatype FROM forms
  UNION
  SELECT '{C.ENT}mention/' || form, '{C.RDFS_LABEL}', form, true,
         '{C.XSD_STRING}' FROM forms
"""


def _link_sql() -> str:
    return f"""
  SELECT '{C.ENT}mention/' || form AS subj, '{C.PRED_SAME_AS}' AS pred,
         '{C.WD}' || entity_id AS obj, false AS obj_is_literal,
         CAST(NULL AS VARCHAR) AS obj_datatype
  FROM linked WHERE entity_id IS NOT NULL
"""


def _enrich_sql(fdir: str) -> str:
    return f"""
  SELECT DISTINCT '{C.WD}' || l.entity_id AS subj,
         '{C.PRED_INSTANCE_OF}' AS pred,
         '{C.ENT}type/' || e.type_id AS obj, false AS obj_is_literal,
         CAST(NULL AS VARCHAR) AS obj_datatype
  FROM linked l JOIN read_parquet('{fdir}/entities.parquet') e
       ON e.entity_id = l.entity_id
  WHERE l.entity_id IS NOT NULL
  UNION
  SELECT DISTINCT '{C.ENT}type/' || ancp.t, '{C.RDFS_SUBCLASS_OF}',
         '{C.ENT}type/' || ancp.a, false, NULL
  FROM (
    WITH RECURSIVE anc(t, a) AS (
      SELECT th.type_id, th.super_type_id
      FROM read_parquet('{fdir}/type_hierarchy.parquet') th
      WHERE th.type_id IN (
        SELECT e.type_id FROM linked l
        JOIN read_parquet('{fdir}/entities.parquet') e
          ON e.entity_id = l.entity_id
        WHERE l.entity_id IS NOT NULL)
      UNION
      SELECT anc.t, th.super_type_id
      FROM anc JOIN read_parquet('{fdir}/type_hierarchy.parquet') th
        ON th.type_id = anc.a
    ) SELECT t, a FROM anc
  ) AS ancp(t, a)
"""


# --------------------------------------------------------------------------
# Ray implementations
# --------------------------------------------------------------------------

def _q_structural(sf_dir: str):
    from .stages import extract, materialize
    ts = _read_transcripts(sf_dir)
    return materialize.materialize(extract.structural_triples(ts))


def _q_mentions(sf_dir: str):
    from .pipelines.kg import load_config_tables
    from .stages import canonicalize as canon
    from .stages import materialize, mentions
    fdir = _fx(sf_dir)
    alias_rows, vocab, *_ = load_config_tables(fdir)
    ts = _read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"])
    m = mentions.mention_triples(ts, vocab)
    cm = canon.canonicalize_mentions(m, canon.build_canonical_map_local(alias_rows))
    return materialize.materialize(cm)


def _q_dead_letter(sf_dir: str):
    from .stages import extract
    ts = _read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "tool"])
    return extract.dead_letter(ts)


def _q_full(sf_dir: str):
    from .pipelines.kg import run_kg
    return run_kg(sf_dir)


def _q_turns_per_role(sf_dir: str):
    from .functions.grouped import grouped_count
    ts = _read_transcripts(sf_dir, columns=["role"])
    return grouped_count(ts, ["role"], num_partitions=1).sort("role")


def _q_mean_turns_per_conv(sf_dir: str):
    from .functions.grouped import grouped_count
    ts = _read_transcripts(sf_dir, columns=["conv_id"])
    agg = grouped_count(ts, ["conv_id"], num_partitions=16)

    def summarize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_convs": pa.array([batch.num_rows], pa.int64()),
            "total_turns": pa.array([pc.sum(batch["n"]).as_py()], pa.int64())})
    parts = agg.map_batches(summarize, batch_format="pyarrow").to_pandas()
    n_convs = int(parts["n_convs"].sum())
    total = int(parts["total_turns"].sum())
    import pandas as pd
    # plain IEEE division on both sides -> bit-identical doubles
    return pd.DataFrame({"n_convs": [n_convs], "total_turns": [total],
                         "mean_turns": [total / n_convs]})


def _q_busiest_day_by_tool(sf_dir: str):
    ts = _read_transcripts(sf_dir, columns=["tool", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        from .stages.extract import _tool_mask
        sel = b.filter(_tool_mask(b["tool"]))
        return pa.table({"day": pc.strftime(sel["ts"], format="%Y-%m-%d")})
    days = ts.map_batches(prep, batch_format="pyarrow")
    from .functions.grouped import grouped_count
    counts = grouped_count(days, ["day"], num_partitions=4)
    return counts.sort(["n", "day"], descending=[True, False]).limit(1)


def _q_convs_over_10_turns(sf_dir: str):
    from .functions.grouped import grouped_count
    ts = _read_transcripts(sf_dir, columns=["conv_id"])
    agg = grouped_count(ts, ["conv_id"], num_partitions=16)
    big = agg.map_batches(
        lambda b: b.filter(pc.greater(b["n"], 10)), batch_format="pyarrow")
    import pandas as pd
    return pd.DataFrame({"n_convs": [big.count()]})


def _q_turns_in_month(sf_dir: str):
    ts = _read_transcripts(sf_dir, columns=["ts"])

    def f(b: pa.Table) -> pa.Table:
        m = pc.strftime(b["ts"], format="%Y-%m")
        return pa.table({"hit": pc.cast(pc.equal(m, "2025-02"), pa.int64())})
    import pandas as pd
    n = ts.map_batches(f, batch_format="pyarrow").sum("hit")
    return pd.DataFrame({"n_turns": [int(n or 0)]})


def _q_distinct_mentions(sf_dir: str):
    ds = _q_mentions(sf_dir)
    import pandas as pd
    objs = ds.map_batches(lambda b: pa.table({"obj": b["obj"]}),
                          batch_format="pyarrow")
    return pd.DataFrame({"n_forms": [objs.unique("obj").__len__()]})


def _q_top_tools(sf_dir: str):
    ts = _read_transcripts(sf_dir, columns=["tool"])

    def prep(b: pa.Table) -> pa.Table:
        from .stages.extract import _tool_mask
        return pa.table({"tool": b.filter(_tool_mask(b["tool"]))["tool"]})
    from .functions.grouped import grouped_count
    counts = grouped_count(ts.map_batches(prep, batch_format="pyarrow"),
                           ["tool"], num_partitions=1)
    return counts.sort(["n", "tool"], descending=[True, False]).limit(5)


# --------------------------------------------------------------------------
# CQ analogs 9-16: the remaining reference competency-question shapes
# (/root/reference/Code/CompetencyQuestions/Yelp_CQ.md) — day-of-week and
# year/month extraction (:179-188,359-370), per-entity ORDER BY DESC(SUM)
# LIMIT 1 (:168-169,201-202), HAVING on grouped counts (:252-261), count
# of linked/typed entities (:50-66,73-88), ratio-of-counts (:267-309).
# --------------------------------------------------------------------------

def _q_convs_mentioning(sf_dir: str):
    """CQ2/3 analog (count entities of one category): conversations that
    mention the canonical form 'coffee'."""
    ds = _q_mentions(sf_dir)
    target = C.ENT + "mention/coffee"

    def convs(b: pa.Table) -> pa.Table:
        sel = b.filter(pc.equal(b["obj"], target))
        path = pc.replace_substring(sel["subj"].combine_chunks(),
                                    C.ENT + "turn/", "")
        conv = pc.list_element(pc.split_pattern(path, "/"), 0)
        return pa.table({"conv_id": conv})
    import pandas as pd
    n = ds.map_batches(convs, batch_format="pyarrow").unique("conv_id")
    return pd.DataFrame({"n_convs": [len(n)]})


def _q_linked_forms(sf_dir: str):
    """CQ4 analog (how many businesses have been reviewed): how many
    distinct mention forms link to a KG entity."""
    from .pipelines.kg import load_config_tables
    from .stages import canonicalize as canon
    from .stages import link, mentions
    fdir = _fx(sf_dir)
    alias_rows, vocab, snapshot, *_ = load_config_tables(fdir)
    ts = _read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"])
    m = mentions.mention_triples(ts, vocab)
    cm = canon.canonicalize_mentions(
        m, canon.build_canonical_map_local(alias_rows))
    links = link.link_mentions(cm, snapshot)
    import pandas as pd
    return pd.DataFrame({"n_linked": [links.unique("subj").__len__()]})


def _q_busiest_conv(sf_dir: str):
    """CQ9 analog (most-visited business): the conversation with the most
    turns, deterministic tie-break."""
    from .functions.grouped import grouped_count
    ts = _read_transcripts(sf_dir, columns=["conv_id"])
    counts = grouped_count(ts, ["conv_id"], num_partitions=16)
    return counts.sort(["n", "conv_id"], descending=[True, False]).limit(1)


def _q_avg_mentions_per_turn(sf_dir: str):
    """CQ12 analog (average friends per user): mention rows / turn rows,
    one IEEE double division on both sides."""
    import pandas as pd
    n_mentions = _q_mentions(sf_dir).count()
    n_turns = _read_transcripts(sf_dir, columns=["conv_id"]).count()
    return pd.DataFrame({"n_mentions": [n_mentions], "n_turns": [n_turns],
                         "avg_mentions": [n_mentions / n_turns]})


def _q_turns_per_weekday(sf_dir: str):
    """CQ8 analog (visits per day-of-week): ISO weekday extraction
    (Monday=1..Sunday=7 — pc.day_of_week and DuckDB isodow agree)."""
    ts = _read_transcripts(sf_dir, columns=["ts"])

    def dow(b: pa.Table) -> pa.Table:
        d = pc.add(pc.day_of_week(b["ts"], count_from_zero=True,
                                  week_start=1), 1)
        return pa.table({"dow": pc.cast(d, pa.int64())})
    from .functions.grouped import grouped_count
    return grouped_count(ts.map_batches(dow, batch_format="pyarrow"),
                         ["dow"], num_partitions=1).sort("dow")


def _q_convs_with_min_tools(sf_dir: str):
    """CQ11 analog (users with >10 friends): conversations using more than
    2 DISTINCT tools (HAVING over a distinct-count)."""
    from .functions.grouped import sorted_aggregate
    ts = _read_transcripts(sf_dir, columns=["conv_id", "tool"])

    def prep(b: pa.Table) -> pa.Table:
        from .stages.extract import _tool_mask
        sel = b.filter(_tool_mask(b["tool"]))
        return pa.table({"conv_id": sel["conv_id"], "tool": sel["tool"]})
    pairs = sorted_aggregate(
        ts.map_batches(prep, batch_format="pyarrow"),
        ["conv_id", "tool"], [("tool", "count")],
        ["conv_id", "tool", "cnt"], num_partitions=16)
    per_conv = sorted_aggregate(pairs, ["conv_id"], [("tool", "count")],
                                ["conv_id", "n_tools"], num_partitions=16)
    big = per_conv.map_batches(
        lambda b: b.filter(pc.greater(b["n_tools"], 2)),
        batch_format="pyarrow")
    import pandas as pd
    return pd.DataFrame({"n_convs": [big.count()]})


def _q_top_tool_per_role(sf_dir: str):
    """CQ8/9 analog (per-entity ORDER BY DESC(SUM) LIMIT 1): for every
    role, its most-used tool (count desc, tool asc tie-break)."""
    from .functions.grouped import sorted_aggregate, sorted_group_apply
    ts = _read_transcripts(sf_dir, columns=["role", "tool"])

    def prep(b: pa.Table) -> pa.Table:
        from .stages.extract import _tool_mask
        sel = b.filter(_tool_mask(b["tool"]))
        return pa.table({"role": sel["role"], "tool": sel["tool"]})
    counts = sorted_aggregate(
        ts.map_batches(prep, batch_format="pyarrow"),
        ["role", "tool"], [("tool", "count")],
        ["role", "tool", "n"], num_partitions=8)

    def top1(b: pa.Table) -> pa.Table:
        import numpy as np

        from .functions.grouped import group_ids
        if b.num_rows == 0:
            return b
        gid, starts = group_ids(b, ["role"])
        n = b["n"].combine_chunks().to_numpy()
        tool = b["tool"].combine_chunks().to_numpy(zero_copy_only=False)
        ends = np.append(starts[1:], b.num_rows)
        keep = []
        for s, e in zip(starts, ends):
            order = np.lexsort((tool[s:e], -n[s:e]))
            keep.append(s + order[0])
        return b.take(pa.array(keep))
    return sorted_group_apply(counts, ["role"], top1, num_partitions=4)


def _q_turns_per_year_month(sf_dir: str):
    """CQ14 analog (reviews per year/month): calendar extraction + grouped
    count over (year, month)."""
    ts = _read_transcripts(sf_dir, columns=["ts"])

    def ym(b: pa.Table) -> pa.Table:
        return pa.table({"y": pc.cast(pc.year(b["ts"]), pa.int64()),
                         "m": pc.cast(pc.month(b["ts"]), pa.int64())})
    from .functions.grouped import sorted_aggregate
    return sorted_aggregate(ts.map_batches(ym, batch_format="pyarrow"),
                            ["y", "m"], [("m", "count")],
                            ["y", "m", "n"], num_partitions=8)


def _q_reverse_geocode(sf_dir: str):
    """S8/M21: floor-grid coordinate keys + memoized nearest-place lookup
    (distinct cells resolved once, result joined back)."""
    import ray as _ray

    from .stages.geocode import load_places, reverse_geocode
    fdir = _fx(sf_dir)
    conv_geo = ray.data.read_parquet(os.path.join(fdir, "conv_geo.parquet"))
    return reverse_geocode(conv_geo, _ray.put(load_places(fdir)))


def _q_meta_flatten(sf_dir: str):
    """M5 struct flattener over the nested conv_meta table: every leaf
    becomes a dotted column; the 'hours' subtree is EXCLUDED (the
    reference's exclusion-list semantics, dictionary_functions.py:1-18)."""
    from .stages.flatten import flatten_structs
    fdir = _fx(sf_dir)
    ds = ray.data.read_parquet(os.path.join(fdir, "conv_meta.parquet"))
    return flatten_structs(ds, exclude=("hours",))


def _q_meta_flatten_agg(sf_dir: str):
    """Flatten feeding a distributed aggregate: request stats per
    (client, device os) over flattened leaves."""
    from .functions.grouped import sorted_aggregate
    flat = _q_meta_flatten(sf_dir)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"client": b["meta.client"],
                         "os": b["meta.device.os"],
                         "latency_ms": b["meta.latency_ms"]})
    return sorted_aggregate(
        flat.map_batches(rename, batch_format="pyarrow"),
        ["client", "os"], [("latency_ms", "count"), ("latency_ms", "sum")],
        ["client", "os", "n", "sum_latency"], num_partitions=8)


# --------------------------------------------------------------------------
# training-data ops (documents / embeddings tables)
# --------------------------------------------------------------------------

def _docs(sf_dir: str):
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "text"])


def _emb(sf_dir: str):
    return ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                 columns=["vec_id", "embedding"])


def _q_ntriples_lines(sf_dir: str):
    """S4 sink analog, oracle-checked: structural triples rendered to
    N-Triples text lines (typed literals + escaping)."""
    from .stages import extract, materialize
    ts = _read_transcripts(sf_dir)
    t = materialize.materialize(extract.structural_triples(ts))
    return t.map_batches(materialize.render_ntriples, batch_format="pyarrow",
                         zero_copy_batch=True)


def _q_conv_stats_salted(sf_dir: str):
    """Per-conversation aggregate through the salted two-level path — the
    explicit hot-conversation skew handling of BASELINE.json north_star
    (the fixture plants conversations 10-100x the median length)."""
    from .functions.salting import salted_aggregate
    ts = _read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "ts"])
    return salted_aggregate(
        ts, "conv_id",
        level1=[("turn_idx", "count"), ("ts", "min"), ("ts", "max")],
        level2=[("n_turns", "sum"), ("first_ts", "min"), ("last_ts", "max")],
        out_names=["conv_id", "n_turns", "first_ts", "last_ts"])


def _q_dedup_exact(sf_dir: str):
    from .stages.dedup import exact_dedup
    return exact_dedup(_docs(sf_dir))


def _q_dedup_ngram_jaccard(sf_dir: str):
    from .stages.dedup import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_docs(sf_dir), threshold=0.5)


def _q_dedup_minhash_lsh(sf_dir: str):
    from .stages.dedup import minhash_lsh_pairs
    return minhash_lsh_pairs(_docs(sf_dir), threshold=0.5)


def _q_dedup_simhash(sf_dir: str):
    from .stages.dedup import simhash_pairs
    return simhash_pairs(_docs(sf_dir), max_hamming=3)


# threshold 0.35 is the highest decade with a non-vacuous oracle row set on
# the driver testdata (the synthetic embeddings top out at cosine ~0.51;
# ~270 pairs clear 0.35 at sf0.01) — a 0.9 threshold would compare 0 == 0
# rows and prove nothing.
EMB_NEAR_DUP_THRESHOLD = 0.35


def _q_dedup_embedding_cosine(sf_dir: str):
    """Scale path: random-hyperplane LSH + in-bucket exact verify; the
    fixed-seed banding (b=128, r=2) has miss probability < 1e-26 at the
    configured threshold, so its output equals the all-pairs SQL oracle."""
    from .stages.dedup import embedding_near_dup_pairs
    df = embedding_near_dup_pairs(
        _emb(sf_dir), threshold=EMB_NEAR_DUP_THRESHOLD).to_pandas()
    if df.empty:  # an empty Dataset loses its schema through sort
        import pandas as pd
        df = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                           "doc_b": pd.Series(dtype="int64"),
                           "cosine": pd.Series(dtype="float64")})
    return df


def _q_dedup_embedding_blocked(sf_dir: str):
    """Exact baseline: distributed block-nested-loop all-pairs (same oracle
    as the LSH path — the two engines must agree)."""
    from .stages.dedup import embedding_near_dup_blocked
    return embedding_near_dup_blocked(
        _emb(sf_dir), threshold=EMB_NEAR_DUP_THRESHOLD)


def _q_embedding_topk_pairs(sf_dir: str):
    from .stages.dedup import embedding_topk_pairs
    return embedding_topk_pairs(_emb(sf_dir), topk=20)


def _q_curation_pipeline(sf_dir: str):
    """End-to-end corpus curation: quality gate -> exact dedup keep-first
    -> near-dup drop -> manifest. The document-side flagship
    (pipelines/curation.py), oracle-checked as ONE chained SQL."""
    from .pipelines.curation import curate_documents
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "text"])
    return curate_documents(docs, min_words=30, min_alpha=0.8,
                            jaccard_threshold=0.5)


# BM25 keyword search: fixed query set over the testdata documents
# vocabulary; every query's terms are distinct (the engine scores per
# distinct term).
_BM25_QUERIES = ["hash join", "slow scan", "sort merge batch",
                 "customer order value"]


def _q_search_bm25(sf_dir: str):
    """BM25 keyword top-10 per query (stages/search.py): distributed
    corpus-stats pass -> broadcast float constants -> exact fixed-point
    scoring -> per-key pruned top-k."""
    from .stages.search import bm25_topk
    return bm25_topk(_docs(sf_dir), _BM25_QUERIES, k=10)


def _bm25_sql() -> str:
    """BM25 oracle: the SAME float constants the Ray kernel closes over
    (idf per term, avgdl, k1, k1+1, 1-b), computed once here from the
    oracle-scale documents table and repr-injected as CAST(.. AS DOUBLE)
    literals (DuckDB parses bare decimal literals as DECIMAL, which would
    break IEEE parity); the scoring expression mirrors the numpy operation
    tree verbatim, with floor (not round) into int64 fixed-point."""
    import pyarrow.parquet as pq

    from .stages.search import BM25_B, BM25_K1, bm25_constants
    path = os.path.join("/root/testdata", SF_ORACLE, "documents.parquet")
    terms = sorted({t for q in _BM25_QUERIES for t in q.lower().split(" ")})
    texts = [t.lower().split(" ")
             for t in pq.read_table(path, columns=["text"])
             ["text"].to_pylist()]
    n_docs, total_words = len(texts), sum(len(w) for w in texts)
    import numpy as np
    df = np.array([sum(1 for ws in texts if t in set(ws)) for t in terms],
                  np.int64)
    idf, avgdl, k1, k1p1, one_m_b = bm25_constants(n_docs, total_words, df,
                                                   BM25_K1, BM25_B)

    def dbl(x: float) -> str:
        return f"CAST({x!r} AS DOUBLE)"

    idf_of = dict(zip(terms, idf))
    qrows = ", ".join(
        f"({qi}, '{t}', {dbl(float(idf_of[t]))})"
        for qi, q in enumerate(_BM25_QUERIES)
        for t in dict.fromkeys(q.lower().split(" ")))
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                   FROM documents),
        w AS (SELECT doc_id, unnest(ws) AS w FROM d),
        dl AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY 1),
        tf AS (SELECT doc_id, w, count(*) AS tf FROM w
               WHERE w IN ({in_list}) GROUP BY 1, 2),
        q(query_id, term, idf) AS (VALUES {qrows}),
        contrib AS (SELECT q.query_id, tf.doc_id,
            CAST(floor((q.idf * ((tf.tf * {dbl(k1p1)}) /
                 (tf.tf + {dbl(k1)} * ({dbl(one_m_b)} + {dbl(BM25_B)}
                  * (dl.dl / {dbl(avgdl)})))))
                 * 1000000.0) AS BIGINT) AS c
            FROM q JOIN tf ON tf.w = q.term
                   JOIN dl ON dl.doc_id = tf.doc_id),
        s AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score
              FROM contrib GROUP BY 1, 2),
        r AS (SELECT query_id, doc_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id)
                       AS rank
              FROM s)
        SELECT query_id, doc_id, score, rank FROM r WHERE rank <= 10
        ORDER BY query_id, rank"""


def _q_ann_topk(sf_dir: str):
    from .stages.similarity import brute_force_topk
    return brute_force_topk(_emb(sf_dir), k=10, n_queries=8)


def _q_ann_filtered(sf_dir: str):
    """Metadata-filtered vector search (similarity.filtered_topk):
    exact cosine top-k among vectors WHERE label = 3, predicate pushed
    before scoring."""
    from .stages.similarity import filtered_topk
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"])
    return filtered_topk(emb, k=10, n_queries=8, label=3)


def _q_ann_mmr(sf_dir: str):
    """MMR diversified retrieval (similarity.mmr_topk): greedy λ=1/2
    re-rank of the exact top-20 pool in integer fixed point — the
    oracle unrolls the 5 greedy steps as CTEs."""
    from .stages.similarity import mmr_topk
    return mmr_topk(_emb(sf_dir))


def _mmr_sql(k_out: int = 5, k_pool: int = 20) -> str:
    head = f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                   FROM embeddings WHERE vec_id < 8),
        c AS (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id NOT IN (SELECT query_id FROM q)),
        s AS (SELECT q.query_id, c.vec_id,
                     CAST(round(list_cosine_similarity(
                       CAST(q.qe AS DOUBLE[]),
                       CAST(c.embedding AS DOUBLE[])) * 1000000)
                       AS BIGINT) AS fp
              FROM q CROSS JOIN c),
        top AS (SELECT query_id, vec_id, fp FROM (
                  SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY fp DESC, vec_id) AS rn FROM s)
                WHERE rn <= {k_pool}),
        pair AS (SELECT t1.query_id, t1.vec_id AS a, t2.vec_id AS b,
                        CAST(round(list_cosine_similarity(
                          CAST(e1.embedding AS DOUBLE[]),
                          CAST(e2.embedding AS DOUBLE[])) * 1000000)
                          AS BIGINT) AS p
                 FROM top t1
                 JOIN top t2 ON t1.query_id = t2.query_id
                            AND t1.vec_id <> t2.vec_id
                 JOIN embeddings e1 ON e1.vec_id = t1.vec_id
                 JOIN embeddings e2 ON e2.vec_id = t2.vec_id),
        sel1 AS (SELECT query_id, vec_id FROM (
                   SELECT query_id, vec_id, row_number() OVER (
                     PARTITION BY query_id ORDER BY fp DESC, vec_id)
                     AS rn FROM top) WHERE rn = 1)"""
    parts = [head]
    prev_union = "SELECT query_id, vec_id FROM sel1"
    for k in range(2, k_out + 1):
        parts.append(f"""
        , prev{k} AS ({prev_union})
        , mx{k} AS (SELECT p.query_id, p.a AS vec_id,
                           CAST(max(p.p) AS BIGINT) AS mp
                    FROM pair p JOIN prev{k} s
                      ON s.query_id = p.query_id AND s.vec_id = p.b
                    GROUP BY 1, 2)
        , cand{k} AS (SELECT t.query_id, t.vec_id, t.fp - m.mp AS sc
                      FROM top t
                      JOIN mx{k} m ON m.query_id = t.query_id
                                  AND m.vec_id = t.vec_id
                      LEFT JOIN prev{k} sp
                        ON sp.query_id = t.query_id
                       AND sp.vec_id = t.vec_id
                      WHERE sp.vec_id IS NULL)
        , sel{k} AS (SELECT query_id, vec_id FROM (
                       SELECT *, row_number() OVER (
                         PARTITION BY query_id
                         ORDER BY sc DESC, vec_id) AS rn
                       FROM cand{k}) WHERE rn = 1)""")
        prev_union += f" UNION ALL SELECT query_id, vec_id FROM sel{k}"
    finals = " UNION ALL ".join(
        f"SELECT query_id, CAST({k} AS BIGINT) AS step, vec_id "
        f"FROM sel{k}" for k in range(1, k_out + 1))
    parts.append(f" SELECT * FROM ({finals}) ORDER BY query_id, step")
    return "".join(parts)


def _q_ann_pq_search(sf_dir: str):
    """ADC search over PQ codes (functions/pq.pq_search): integer LUT
    scoring, approximate by construction -> rows-only; pytest:
    blocking-invariance + recall >= 0.5 vs exact integer IP top-k."""
    from .functions.pq import pq_search
    return pq_search(_emb(sf_dir))


def _q_ann_ivf(sf_dir: str):
    from .stages.similarity import ivf_topk
    return ivf_topk(_emb(sf_dir), k=10, n_queries=8)


def _q_text_quality(sf_dir: str):
    from .stages.textstats import quality_stats
    return quality_stats(_docs(sf_dir))


def _q_text_tokens(sf_dir: str):
    from .stages.textstats import token_counts
    return token_counts(_docs(sf_dir))


def _q_text_repetition(sf_dir: str):
    """Gopher-style repetition filters as exact integer counts
    (textstats.repetition_stats): duplicate-word and top-bigram signals per
    document, one stateless vectorized pass."""
    from .stages.textstats import repetition_stats
    return repetition_stats(_docs(sf_dir))


def _q_text_pack(sf_dir: str):
    """Greedy per-source sequence packing (textstats.pack_sequences):
    one key-sort, O(#sequences) searchsorted hops per shard."""
    import os as _os

    from .stages.textstats import pack_sequences
    docs = ray.data.read_parquet(
        _os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"])
    return pack_sequences(docs)


def _q_text_chunks(sf_dir: str):
    """Fixed-width document chunking (textstats.chunk_documents):
    zero-copy list-offset rebuild + one vectorized binary_join."""
    from .stages.textstats import chunk_documents
    return chunk_documents(_docs(sf_dir))


def _q_text_dup_spans(sf_dir: str):
    """Per-doc duplicate-substring coverage (textstats.dup_span_stats):
    winnowing-fingerprint postings grouped once by fingerprint (document
    frequency = complete-group size), per-doc shared-pick counts."""
    from .stages.textstats import dup_span_stats
    return dup_span_stats(_docs(sf_dir))


def _kg_edges(sf_dir: str) -> ray.data.Dataset:
    """Distinct IRI→IRI edge list of the KG (structural ∪ mention triples,
    non-literal objects) — shared by kg_pagerank and kg_degree_stats."""
    from .functions.pagerank import _distinct
    tri = _q_structural(sf_dir).union(_q_mentions(sf_dir))

    def to_edges(b: pa.Table) -> pa.Table:
        t = b.filter(pc.invert(b["obj_is_literal"]))
        return pa.table({"src": t["subj"], "dst": t["obj"]})

    return _distinct(tri.map_batches(to_edges, batch_format="pyarrow"),
                     ["src", "dst"], 8)


def _q_kg_degree_stats(sf_dir: str):
    """Per-node in/out degree over the KG edge list — one all-to-all, no
    join: each edge emits two (node, o, i) indicator rows, summed with the
    sort-aggregate (map-side combine collapses hot nodes per block)."""
    from .functions.grouped import sorted_aggregate

    def indicators(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "node": pa.concat_arrays([b["src"].combine_chunks(),
                                      b["dst"].combine_chunks()]),
            "o": pa.array(np.concatenate([np.ones(n, np.int64),
                                          np.zeros(n, np.int64)])),
            "i": pa.array(np.concatenate([np.zeros(n, np.int64),
                                          np.ones(n, np.int64)]))})

    deg = _kg_edges(sf_dir).map_batches(indicators, batch_format="pyarrow")
    return sorted_aggregate(deg, ["node"], [("o", "sum"), ("i", "sum")],
                            ["node", "out_deg", "in_deg"], 8).sort("node")


def _q_kg_comention_triangles(sf_dir: str):
    """Triangle count of the mention co-occurrence graph
    (functions/triangles.py): edges = canonical mentions sharing a turn
    (vectorized within-group pair expansion + global distinct), triangles =
    two hash joins + a streaming count. Node naming cancels out of the
    count, so the Ray side runs on mention-IRI pairs while the oracle runs
    on raw canonicals."""
    from .functions.triangles import triangle_count, within_group_pairs
    m = _q_mentions(sf_dir).map_batches(
        lambda b: pa.table({"turn": b["subj"], "c": b["obj"]}),
        batch_format="pyarrow")
    return triangle_count(within_group_pairs(m, "turn", "c"))


def _q_kg_components(sf_dir: str):
    """Connected components of the mention co-occurrence graph
    (functions/components.py): distinct co-mention pairs -> iterated
    min-label propagation; component id = lexicographic min canonical.
    The first oracle gate on the distributed components machinery itself
    (previously pytest-only vs a local union-find)."""
    from .functions.components import connected_components
    from .functions.triangles import within_group_pairs
    pre = C.ENT + "mention/"
    m = _q_mentions(sf_dir).map_batches(
        lambda b: pa.table({
            "turn": b["subj"],
            "c": pc.utf8_slice_codeunits(b["obj"], len(pre))}),
        batch_format="pyarrow")
    edges = within_group_pairs(m, "turn", "c")
    cc = connected_components(edges)
    return cc.map_batches(
        lambda b: pa.table({"node": b["node"], "component": b["label"]}),
        batch_format="pyarrow", zero_copy_batch=True).sort("node")


def _q_ml_logreg(sf_dir: str):
    """Deterministic distributed logistic regression
    (functions/logreg.py): full-batch GD, per-row quantized gradients,
    integer-only cross-block reduction — bit-identical to the sequential
    twin (pytest-verified). Iterative sigmoid training is not
    SQL-expressible -> rows-only."""
    from .functions.logreg import logreg_train
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["embedding", "label"])
    table, _stats = logreg_train(emb, iters=10)
    return table


def _q_text_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training (functions/bpe.py): merge list
    over the documents corpus — pair counts over the word-frequency
    table (vocab-sized rounds after ONE corpus exchange). Iterative
    state rewriting is not SQL-expressible -> rows-only; pytest verifies
    merge-for-merge equality with the sequential reference."""
    from .functions.bpe import train_bpe
    docs = ray.data.read_parquet(os.path.join(sf_dir,
                                              "documents.parquet"),
                                 columns=["doc_id", "text"])
    return train_bpe(docs, n_merges=10)


def _q_emb_covariance(sf_dir: str):
    """Exact-integer embedding covariance matrix (functions/pca.py):
    d²-bounded per-block second-moment partials — the corpus never
    shuffles; long-form upper triangle, hash-gated."""
    from .functions.pca import covariance_long
    return covariance_long(_emb(sf_dir))


def _q_ml_pca_component(sf_dir: str):
    """PCA top component (functions/pca.py): driver power iteration on
    the exact covariance (itself oracle-gated via emb_covariance);
    iterative eigensolve is not SQL-expressible -> rows-only; pytest
    checks cos > 0.999 vs numpy.linalg.eigh."""
    from .functions.pca import pca_top_component
    return pca_top_component(_emb(sf_dir))


def _q_dedup_containment(sf_dir: str):
    """Asymmetric shingle-containment near-dups (dedup.containment_pairs):
    |A∩B|/min(|A|,|B|) >= 0.8 — the embedded-document case symmetric
    Jaccard misses; shared posting machinery, hash-gated ratio."""
    from .stages.dedup import containment_pairs
    docs = ray.data.read_parquet(os.path.join(sf_dir,
                                              "documents.parquet"),
                                 columns=["doc_id", "text"])
    df = containment_pairs(docs).to_pandas()
    if df.empty:  # empty sort loses schema
        import pandas as pd
        df = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                           "doc_b": pd.Series(dtype="int64"),
                           "containment": pd.Series(dtype="float64")})
    return df


def _q_text_compression(sf_dir: str):
    """zlib compression-ratio quality signal (textstats.compression_ratio):
    exact integer (bytes, compressed, ratio_fp). No SQL twin (DuckDB has
    no zlib) -> rows-only; pytest pins repetitive < random ordering and
    determinism."""
    from .stages.textstats import compression_ratio
    return compression_ratio(_docs(sf_dir))


def _q_text_bpe_encode(sf_dir: str):
    """Tokenizer APPLY (functions/bpe.encode_with_merges): per-doc
    subword counts under the corpus-trained merge list; dictionary-
    bounded merge walks. Iterative -> rows-only; pytest vs sequential
    encode."""
    from .functions.bpe import encode_with_merges, train_bpe
    docs = ray.data.read_parquet(os.path.join(sf_dir,
                                              "documents.parquet"),
                                 columns=["doc_id", "text"])
    merges = train_bpe(docs, n_merges=10).to_pylist()
    rows = [(m["rank"], m["left"], m["right"], m["merged"], m["count"])
            for m in merges]
    return encode_with_merges(docs, rows)


def _q_kg_label_prop(sf_dir: str):
    """Synchronous label-propagation communities over the co-mention
    graph (functions/labelprop.py): 3 fixed rounds, most-frequent
    neighbour label with lexicographic-min tie-break. Every round is
    attach + grouped count + per-node top-1 — all map-side-combined
    primitives; the oracle unrolls the identical rounds as a CTE chain."""
    from .functions.labelprop import label_propagation
    from .functions.triangles import within_group_pairs
    pre = C.ENT + "mention/"
    m = _q_mentions(sf_dir).map_batches(
        lambda b: pa.table({
            "turn": b["subj"],
            "c": pc.utf8_slice_codeunits(b["obj"], len(pre))}),
        batch_format="pyarrow")
    edges = within_group_pairs(m, "turn", "c")
    return label_propagation(edges, rounds=3).sort("node")


def _label_prop_sql(rounds: int = 3) -> str:
    """Unrolled synchronous LPA as a CTE chain (appended to the mention
    prefix): l0 = identity labels; each round joins current labels onto
    the undirected edges, votes, and picks (count desc, label asc)."""
    parts = [""", ce AS (SELECT DISTINCT a.canonical AS u,
                         b.canonical AS v
                  FROM mention a JOIN mention b
                    ON a.turn_iri = b.turn_iri
                   AND a.canonical < b.canonical),
            und AS (SELECT u, v FROM ce UNION SELECT v, u FROM ce),
            l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM und)"""]
    for i in range(1, rounds + 1):
        parts.append(f"""
            , r{i} AS (SELECT e.u AS node, l.lbl AS lbl, count(*) AS c
                       FROM und e JOIN l{i - 1} l ON l.node = e.v
                       GROUP BY 1, 2)
            , l{i} AS (SELECT node, lbl FROM (
                         SELECT node, lbl, row_number() OVER (
                           PARTITION BY node ORDER BY c DESC, lbl) AS rn
                         FROM r{i}) WHERE rn = 1)""")
    parts.append(f"""
        SELECT node, lbl AS community FROM l{rounds} ORDER BY node""")
    return "".join(parts)


def _q_kg_random_walks(sf_dir: str):
    """Deterministic random-walk corpus (functions/walks.py): one
    3-hop walk per co-mention node; each step = md5(node#step) % degree
    into the rank-sorted adjacency — the DeepWalk input corpus, fully
    oracle-gated."""
    from .functions.triangles import within_group_pairs
    from .functions.walks import random_walks
    pre = C.ENT + "mention/"
    m = _q_mentions(sf_dir).map_batches(
        lambda b: pa.table({
            "turn": b["subj"],
            "c": pc.utf8_slice_codeunits(b["obj"], len(pre))}),
        batch_format="pyarrow")
    return random_walks(within_group_pairs(m, "turn", "c"), length=3)


def _random_walks_sql(length: int = 3) -> str:
    parts = [""", ce AS (SELECT DISTINCT a.canonical AS u,
                         b.canonical AS v
                  FROM mention a JOIN mention b
                    ON a.turn_iri = b.turn_iri
                   AND a.canonical < b.canonical),
            und AS (SELECT u, v FROM ce UNION SELECT v, u FROM ce),
            adj AS (SELECT u, v,
                           row_number() OVER (PARTITION BY u
                                              ORDER BY v) - 1 AS rn,
                           count(*) OVER (PARTITION BY u) AS deg
                    FROM und),
            w0 AS (SELECT DISTINCT u AS start, u AS cur FROM und)"""]
    prev = "w0"
    hops: list[str] = []
    for s in range(1, length + 1):
        hop_sel = ", ".join([f"{prev}.{h}" for h in hops])
        hop_sel = (hop_sel + ", ") if hop_sel else ""
        parts.append(f"""
            , w{s} AS (SELECT {prev}.start, {hop_sel}
                              a.v AS hop{s}, a.v AS cur
                       FROM {prev} JOIN adj a
                         ON a.u = {prev}.cur
                        AND a.rn = ('0x' || substring(
                              md5({prev}.cur || '#{s}'), 1, 8))::BIGINT
                              % a.deg)""")
        hops.append(f"hop{s}")
        prev = f"w{s}"
    parts.append(f"""
        SELECT start, {', '.join(hops)} FROM w{length}
        ORDER BY start""")
    return "".join(parts)


def _q_kg_walk_skipgrams(sf_dir: str):
    """Skip-gram training pairs from the deterministic walk corpus
    (the stage after functions/walks.py in a DeepWalk pipeline):
    (center, context) counts for every ordered pair within window 2
    over each (start, hop1..hop3) walk. Pure column pairing over the
    node-sized walk table — map-side pair partials, ONE tiny grouped
    sum."""
    from .functions.grouped import grouped_count
    walks = _q_kg_random_walks(sf_dir)

    def pairs(b: pa.Table) -> pa.Table:
        seq = [b["start"], b["hop1"], b["hop2"], b["hop3"]]
        centers, contexts = [], []
        for i in range(len(seq)):
            for j in range(len(seq)):
                if i != j and abs(i - j) <= 2:
                    centers.append(seq[i].combine_chunks()
                                   if isinstance(seq[i], pa.ChunkedArray)
                                   else seq[i])
                    contexts.append(seq[j].combine_chunks()
                                    if isinstance(seq[j],
                                                  pa.ChunkedArray)
                                    else seq[j])
        return pa.table({
            "center": pa.concat_arrays(centers),
            "context": pa.concat_arrays(contexts)})

    return grouped_count(
        walks.map_batches(pairs, batch_format="pyarrow"),
        ["center", "context"], "n", 8)


def _skipgram_sql() -> str:
    s = _random_walks_sql(3)
    ctes, final = s.rsplit("SELECT start,", 1)
    final = ("SELECT start," + final).replace("ORDER BY start", "")
    offs = [("start", 0), ("hop1", 1), ("hop2", 2), ("hop3", 3)]
    arms = []
    for ci, cpos in offs:
        for xi, xpos in offs:
            if ci != xi and abs(cpos - xpos) <= 2:
                arms.append(f"SELECT {ci} AS center, {xi} AS context "
                            f"FROM walks")
    return (ctes + ", walks AS (" + final + ") "
            "SELECT center, context, CAST(count(*) AS BIGINT) AS n "
            "FROM (" + " UNION ALL ".join(arms)
            + ") GROUP BY 1, 2 ORDER BY 1, 2")


def _q_ann_pq_codes(sf_dir: str):
    """Product-quantization codes (functions/pq.py): per-subspace
    exact-integer k-means codebooks + argmin encode — the PQ half of
    IVF-PQ (ann_ivf_topk is the IVF half). Iterative training ->
    rows-only; pytest: blocking-invariant codes, reconstruction beats
    the mean baseline 4x."""
    from .functions.pq import pq_encode
    codes, _books = pq_encode(_emb(sf_dir))
    return codes


def _q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd k-means in exact integer arithmetic
    (functions/kmeans.py): bit-reproducible assignments under any shuffle
    (integer distances, fixed-point centroid updates). Iterative argmin
    is not SQL-expressible -> rows-only; the pytest asserts exact equality
    with a sequential numpy reference."""
    from .functions.kmeans import kmeans_fp
    out, _cents = kmeans_fp(_emb(sf_dir), k=8, iters=5)
    return out


def _q_kg_node_similarity(sf_dir: str):
    """Jaccard node similarity over the co-mention graph
    (functions/nodesim.py): top related-entity pairs by shared-neighbor
    overlap — link prediction on the KG."""
    from .functions.nodesim import jaccard_node_pairs
    from .functions.triangles import within_group_pairs
    pre = C.ENT + "mention/"
    m = _q_mentions(sf_dir).map_batches(
        lambda b: pa.table({
            "turn": b["subj"],
            "c": pc.utf8_slice_codeunits(b["obj"], len(pre))}),
        batch_format="pyarrow")
    return jaccard_node_pairs(within_group_pairs(m, "turn", "c"))


def _q_dedup_semantic(sf_dir: str):
    """SemDeDup-style semantic dedup (dedup.semantic_dedup): k-means
    clusters from a bounded sample, in-cluster greedy cosine keep/drop.
    Approximate by design (cross-cluster pairs missed) -> rows-only in the
    driver; the pytest asserts exact equality with a sequential reference."""
    from .stages.dedup import semantic_dedup
    return semantic_dedup(_emb(sf_dir), threshold=EMB_NEAR_DUP_THRESHOLD)


def _q_kg_pagerank(sf_dir: str):
    """Fixed-point integer PageRank over the KG's IRI→IRI edges
    (functions/pagerank.py): which entities/tools/conversations dominate the
    graph. Edge list = structural ∪ mention triples with non-literal
    objects; 5 BSP rounds of join + sort-aggregate, bit-exact vs the
    unrolled-CTE oracle."""
    from .functions.pagerank import pagerank
    return pagerank(_kg_edges(sf_dir))


def _q_fuzzy_ed1(sf_dir: str):
    """Typo-level fuzzy matching (functions/editdist.py): every pair of
    distinct vocabulary surface forms within Levenshtein distance 1, via
    deletion-neighborhood blocking (FastSS) — no all-pairs comparison; the
    shuffle carries (deletion-key, form) rows only."""
    from .functions.editdist import ed1_pairs
    vocab = ray.data.read_parquet(os.path.join(_fx(sf_dir), "vocab.parquet"),
                                  columns=["surface_form"])
    return ed1_pairs(vocab, "surface_form")


def _q_kg_ppr_tools(sf_dir: str):
    """Personalized PageRank (random-walk-with-restart) seeded at the tool
    nodes — KG relevance retrieval: which entities/conversations sit
    closest to tool usage. Same int-id fixed-point machinery as
    kg_pagerank; the seed set is a vectorized prefix predicate, so
    personalization costs no join."""
    from .config import ENT
    from .functions.pagerank import pagerank
    pre = ENT + "tool/"
    return pagerank(_kg_edges(sf_dir),
                    seed_filter=lambda a: pc.starts_with(a, pre))


def _q_conv_tool_paths(sf_dir: str):
    """Per-conversation ordered tool sequence ('WebSearch->Code->...') —
    the ``string_agg(... ORDER BY)`` grouped-sequence operator Ray Data
    lacks, fully vectorized: ONE conv-keyed sort, then inside each sorted
    block the ordered tool strings become a ListArray built from group
    offsets and ONE ``pc.binary_join`` concatenates every conversation's
    path with zero per-group Python. Sequence-mining prep (tool-usage
    patterns)."""
    from .functions.grouped import group_ids, sorted_group_apply
    from .stages.extract import _tool_mask
    t = _read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "tool"])
    out_schema = pa.schema([("conv_id", pa.string()),
                            ("tool_path", pa.string())])

    def paths_block(b: pa.Table) -> pa.Table:
        b = b.filter(_tool_mask(b["tool"]))
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["conv_id"])
        tidx = b["turn_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tidx, gid))
        tools = b["tool"].combine_chunks().take(pa.array(order))
        offsets = np.append(starts, b.num_rows).astype(np.int32)
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), tools)
        return pa.table({
            "conv_id": b["conv_id"].take(pa.array(starts)),
            "tool_path": pc.binary_join(la, "->")}, schema=out_schema)

    return sorted_group_apply(t, ["conv_id"], paths_block).sort("conv_id")


KCORE_K = 4


def _q_kg_kcore(sf_dir: str):
    """k-core subgraph of the KG edge graph (functions/kcore.py): iterative
    degree peeling, two semi-join co-groups + one grouped count per round,
    fixpoint early exit. k=4 strips roughly half the graph at every tested
    scale (turn leaves and sparse mentions)."""
    from .functions.kcore import kcore_edges
    und = _kg_edges(sf_dir).map_batches(
        lambda b: pa.table({
            "u": pc.min_element_wise(b["src"], b["dst"]),
            "v": pc.max_element_wise(b["src"], b["dst"])}),
        batch_format="pyarrow")
    from .functions.pagerank import _distinct
    core, _rounds = kcore_edges(_distinct(und, ["u", "v"], 8), k=KCORE_K)
    return core.sort(["u", "v"])


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled peel (functions/kcore.py semantics): monotone deletion
    reaches fixpoint, so any unroll >= the converged round count matches
    bit-for-bit. Expects CTE ``edges(src, dst)`` in scope."""
    # every level MUST be MATERIALIZED: s{r} references s{r-1} three times
    # (directly + via d{r}), so DuckDB's default CTE inlining would expand
    # the upstream tree 3^rounds times (observed as 'Too many open files'
    # from hundreds of copies of the parquet scan)
    ctes = ["""s0 AS MATERIALIZED (
        WITH uv AS (SELECT DISTINCT least(src, dst) AS u,
                           greatest(src, dst) AS v FROM edges)
        SELECT u AS w, v AS x FROM uv UNION ALL SELECT v, u FROM uv)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""d{r} AS MATERIALIZED (
                SELECT w, count(*) AS d FROM s{r - 1} GROUP BY 1),
            s{r} AS MATERIALIZED (
                SELECT e.w, e.x FROM s{r - 1} e
                JOIN d{r} a ON a.w = e.w AND a.d >= {k}
                JOIN d{r} b ON b.w = e.x AND b.d >= {k})""")
    return (",\n".join(ctes) +
            f"\nSELECT w AS u, x AS v FROM s{rounds} WHERE w < x "
            "ORDER BY 1, 2")


BFS_MAX_DEPTH = 6


def _q_kg_bfs_distances(sf_dir: str):
    """Multi-source BFS (functions/bfs.py): undirected hop distance from
    every tool node to each reachable KG node, capped at BFS_MAX_DEPTH.
    Frontier BSP — only nodes first reached last round join the edge table
    each round; min-merge via the sort-aggregate with map-side combine."""
    from .config import ENT
    from .functions.bfs import bfs_distances
    edges = _kg_edges(sf_dir)
    seeds = edges.map_batches(
        lambda b: pa.table({"node": pa.concat_arrays(
            [b["src"].combine_chunks(), b["dst"].combine_chunks()])}),
        batch_format="pyarrow").map_batches(
        lambda b: b.filter(pc.starts_with(b["node"], ENT + "tool/")),
        batch_format="pyarrow", zero_copy_batch=True)
    return bfs_distances(edges, seeds,
                         max_depth=BFS_MAX_DEPTH).sort("node")


def _pagerank_sql(iters: int = 5, seed_sql: str | None = None) -> str:
    """Unrolled fixed-point PageRank CTE chain (functions/pagerank.py
    semantics: SCALE=1e12, floor damping, dangling mass evaporates).
    Expects CTEs ``edges(src, dst)`` to be in scope. ``seed_sql`` (a
    boolean expression over column ``{n}``) personalizes the restart:
    seeds start at SCALE and receive the 0.15·SCALE term; others 0."""
    def seeded(const: str, node_expr: str) -> str:
        if seed_sql is None:
            return const
        return (f"CASE WHEN {seed_sql.format(n=node_expr)} "
                f"THEN {const} ELSE 0 END")

    ctes = [f"""nodes AS (SELECT src AS node FROM edges
                         UNION SELECT dst FROM edges),
               outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
               r0 AS (SELECT node,
                      CAST({seeded('1000000000000', 'node')} AS BIGINT)
                        AS rank
                      FROM nodes)"""]
    for t in range(1, iters + 1):
        ctes.append(f"""r{t} AS (
            SELECT n.node,
                   CAST({seeded('150000000000', 'n.node')}
                        + (85 * COALESCE(s.s, 0)) // 100
                        AS BIGINT) AS rank
            FROM nodes n LEFT JOIN (
              SELECT e.dst AS node, sum(r.rank // o.d) AS s
              FROM edges e JOIN outdeg o ON o.src = e.src
              JOIN r{t - 1} r ON r.node = e.src
              GROUP BY 1) s ON s.node = n.node)""")
    return (",\n".join(ctes) +
            f"\nSELECT node, rank FROM r{iters} ORDER BY node")


def _eigen_sql(iters: int = 3) -> str:
    """Unrolled integer power-iteration CTE chain
    (functions/pagerank.eigenvector_centrality semantics: x0 = 1e6,
    in-edge sum, max-normalized floor rescale). Expects CTE
    ``edges(src, dst)`` in scope."""
    ctes = ["""nodes AS (SELECT src AS node FROM edges
                         UNION SELECT dst FROM edges),
               x0 AS (SELECT node, CAST(1000000 AS BIGINT) AS x
                      FROM nodes)"""]
    for t in range(1, iters + 1):
        ctes.append(f"""s{t} AS (
            SELECT n.node, COALESCE(s.s, 0) AS s
            FROM nodes n LEFT JOIN (
              SELECT e.dst AS node, sum(x.x) AS s
              FROM edges e JOIN x{t - 1} x ON x.node = e.src
              GROUP BY 1) s ON s.node = n.node),
        x{t} AS (
            SELECT node,
                   CAST(CASE WHEN (SELECT max(s) FROM s{t}) > 0
                        THEN 1000000 * s // (SELECT max(s) FROM s{t})
                        ELSE 0 END AS BIGINT) AS x
            FROM s{t})""")
    return (",\n".join(ctes) +
            f"\nSELECT node, x AS score FROM x{iters} ORDER BY node")


def _q_text_top_ngrams(sf_dir: str):
    """Corpus n-gram document frequencies (textstats.top_ngrams): map-side
    dictionary partials, one sum all-to-all, one tiny top-n sort."""
    from .stages.textstats import top_ngrams
    return top_ngrams(_docs(sf_dir))


def _q_text_unigram_freq(sf_dir: str):
    """Unigram-LM quality proxy (textstats.unigram_freq_score): corpus token
    counts pass + hash join back to per-doc multiplicities, all integer."""
    from .stages.textstats import unigram_freq_score
    return unigram_freq_score(_docs(sf_dir))


def _q_events_lag(sf_dir: str):
    """LAG() window function (relational.lag_gap_per_user): per-user gap to
    the previous event, NULL for the first."""
    from .pipelines.relational import lag_gap_per_user
    return lag_gap_per_user(sf_dir)


def _q_events_moving_sum(sf_dir: str):
    """Moving-window SUM (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) per user
    (relational.moving_sum_per_user): one key-sort, vectorized within-group
    prefix-sum difference, fixed-point cents."""
    from .pipelines.relational import moving_sum_per_user
    return moving_sum_per_user(sf_dir)


def _q_events_rank(sf_dir: str):
    """RANK() / DENSE_RANK() per user by event value desc
    (relational.rank_events_per_user): tie-aware window ranks from
    value-change flags inside sorted blocks."""
    from .pipelines.relational import rank_events_per_user
    return rank_events_per_user(sf_dir)


def _user_event_days(sf_dir: str, event_type: str):
    """Distinct-able (user_id, day) pairs for one event type — the inputs to
    the set-operation queries. Column-pruned read, vectorized day derivation;
    DISTINCT happens inside the set op's aggregate, not here."""
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts", "event_type"])

    def f(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["event_type"], event_type))
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "day": pc.strftime(t["ts"], "%Y-%m-%d")})

    return ev.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _q_events_days_intersect(sf_dir: str):
    """Distributed INTERSECT (functions/setops.py): (user, day) pairs where
    the user both clicked AND purchased — one indicator-sum all-to-all over
    distinct-key partials, never the source rows."""
    from .functions.setops import distinct_set_op
    return distinct_set_op(_user_event_days(sf_dir, "click"),
                           _user_event_days(sf_dir, "purchase"),
                           ["user_id", "day"], "intersect")


def _q_events_days_except(sf_dir: str):
    """Distributed EXCEPT (functions/setops.py): click-days with no
    purchase — same one-shuffle indicator shape as the intersect."""
    from .functions.setops import distinct_set_op
    return distinct_set_op(_user_event_days(sf_dir, "click"),
                           _user_event_days(sf_dir, "purchase"),
                           ["user_id", "day"], "except")


def _q_rel_rollup(sf_dir: str):
    """GROUP BY ROLLUP (relational.lineitem_rollup): hierarchy subtotals
    with one full-table shuffle; coarser levels re-aggregate the previous
    level's output."""
    from .pipelines.relational import lineitem_rollup
    return lineitem_rollup(sf_dir)


def _q_events_cumsum(sf_dir: str):
    """Running SUM() OVER (PARTITION BY user ORDER BY ts) window function
    (relational.running_sum_per_user): sorted-block prefix sums in fixed
    point."""
    from .pipelines.relational import running_sum_per_user
    return running_sum_per_user(sf_dir)


def _q_text_langid(sf_dir: str):
    from .stages.textstats import language_id
    return language_id(_docs(sf_dir))


def _q_text_langid_confusion(sf_dir: str):
    """Classifier-quality confusion matrix: the exact integer langid
    predictions (same actor-pool scorer as text_langid) crossed with the
    labeled lang column — (pred_lang, true_lang, n). The label attaches
    through the doc-keyed co-group (corpus-sized, never broadcast), then
    one tiny grouped count. The model-eval op every curation pipeline
    runs after training a filter."""
    from .functions.grouped import grouped_count
    from .functions.joins import attach_column
    from .stages.textstats import language_id
    pred = language_id(_docs(sf_dir))
    labels = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang"])
    joined = attach_column(
        pred, labels,
        [("doc_id", pa.int64()), ("pred_lang", pa.string())],
        "doc_id", "doc_id", "lang", "true_lang", pa.string(), 4)
    return grouped_count(joined, ["pred_lang", "true_lang"], "n", 1)


def _q_text_surprisal(sf_dir: str):
    """Integer unigram surprisal (textstats.surprisal_scores): the
    perplexity-filter proxy as exact floor-log2 self-information."""
    from .stages.textstats import surprisal_scores
    return surprisal_scores(_docs(sf_dir))


def _q_text_fingerprint(sf_dir: str):
    from .stages.textstats import fingerprints
    return fingerprints(_docs(sf_dir))


def _q_multimodal(sf_dir: str):
    from .stages.multimodal import extract_features, synthesize_media
    return extract_features(synthesize_media(_docs(sf_dir)))


def _q_sample_hash(sf_dir: str):
    """Deterministic splitmix64 Bernoulli sample (functions/sampling.py):
    reproducible splits with zero shuffle; the oracle reproduces the mixer
    bit-for-bit in HUGEINT modular SQL."""
    from .functions.sampling import sample_hash
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "source", "n_chars"])
    return sample_hash(docs, "doc_id", rate=0.2)


def _q_sample_per_key(sf_dir: str):
    """Exact n-per-key lottery sample (functions/sampling.sample_per_key):
    rank within each user by u01(splitmix64(event_id)), keep the first 3 —
    map-side pruned to <=3 rows per (key, block) before the one shuffle."""
    from .functions.sampling import sample_per_key
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "user_id"])
    ev = ev.map_batches(
        lambda b: pa.table({"event_id": pc.cast(b["event_id"], pa.int64()),
                            "user_id": pc.cast(b["user_id"], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    return sample_per_key(ev, "user_id", "event_id", 3)


def _q_events_late(sf_dir: str):
    """Watermark out-of-order tagging (relational.tag_late_events): running
    max event-time by arrival order per user, minus 1h lateness; events
    below it are late."""
    from .pipelines.relational import tag_late_events
    return tag_late_events(sf_dir)


def _q_emb_centroids(sf_dir: str):
    """Grouped vector centroids (similarity.grouped_centroids): per-label
    mean embedding in int64 fixed point — vector sums commute, so the
    result is shuffle-order-exact and hash-gateable."""
    from .stages.similarity import grouped_centroids
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                columns=["label", "embedding"])
    return grouped_centroids(emb, "label")


def _q_approx_distinct_grouped(sf_dir: str):
    """Grouped HLL (functions/hll.grouped_hll_registers): approximate
    distinct customers per order year — per-(year, register) max partials
    are the only shuffled rows."""
    from .functions.hll import grouped_hll_registers
    orders = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                   columns=["o_custkey", "o_orderdate"])
    yr = orders.map_batches(
        lambda b: pa.table({"y": pc.cast(pc.year(b["o_orderdate"]),
                                         pa.int64()),
                            "o_custkey": b["o_custkey"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    return grouped_hll_registers(yr, "y", "o_custkey")


def _q_cms_parts(sf_dir: str):
    """Count-Min sketch (functions/cms.py) of part-key frequencies in
    lineitem: fixed 4x1024 integer counters, sum-merge = shuffle-order-
    proof, so the sketch itself is hash-gated."""
    from .functions.cms import cms_sketch
    li = ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_partkey"])
    return cms_sketch(li, "l_partkey")


def _q_rel_anti_join(sf_dir: str):
    """Distributed ANTI JOIN (functions/setops.anti_join): customers with no
    1995 order — left rows co-group with per-block-deduped right key markers;
    groups holding a marker emit nothing."""
    from .functions.setops import anti_join
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_mktsegment"])
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"])
    o95 = orders.map_batches(
        lambda b: b.filter(pc.equal(pc.year(b["o_orderdate"]), 1995)),
        batch_format="pyarrow", zero_copy_batch=True)
    return anti_join(cust, o95, "c_custkey", "o_custkey",
                     [("c_custkey", pa.int64()), ("c_name", pa.string()),
                      ("c_mktsegment", pa.string())])


def _q_approx_distinct(sf_dir: str):
    """HyperLogLog distinct-count sketch (functions/hll.py) over lineitem
    order keys: the query output IS the integer register table (max-merge =
    shuffle-order-proof), so the sketch itself is oracle hash-gated; the
    float estimate is a driver-side helper over <=1024 rows."""
    from .functions.hll import hll_registers
    li = ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_orderkey"])
    return hll_registers(li, "l_orderkey")


def _q_sample_split(sf_dir: str):
    """Deterministic train/val/test assignment (80/10/10) from ONE hash:
    split = bucket of u01(splitmix64(doc_id)) — stateless, shuffle-free,
    reproducible on any cluster shape, and keys never move between splits
    when the corpus grows (the property random shuffles lack)."""
    from .functions.sampling import hash_u01
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id"])

    def tag(b: pa.Table) -> pa.Table:
        u = hash_u01(b["doc_id"])
        split = np.where(u < 0.8, "train",
                         np.where(u < 0.9, "val", "test"))
        return pa.table({"doc_id": pc.cast(b["doc_id"], pa.int64()),
                         "split": pa.array(split.astype(str))})

    return docs.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True)


def _q_source_size_histogram(sf_dir: str):
    """Histogram of group sizes (docs per source) — the skew-diagnosis
    operator: one grouped count, then a grouped count OF the counts.
    Both all-to-alls carry only per-block partials."""
    from .functions.grouped import grouped_count
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "source"])
    per_source = grouped_count(docs, ["source"], "n_docs", 4)
    return grouped_count(
        per_source.map_batches(lambda b: b.select(["n_docs"]),
                               batch_format="pyarrow",
                               zero_copy_batch=True),
        ["n_docs"], "n_sources", 1)


# per-source keep rates for the stratified sampler: sources are "src{i}";
# rate cycles 0.125/0.375/0.625/0.875 so every stratum is non-vacuous.
# 1024 covers any scale factor's source cardinality; the dict is tiny and
# rides in the task closure (never shuffled).
_STRAT_RATES = {f"src{i}": (i % 4) / 4 + 0.125 for i in range(1024)}


def _q_sample_stratified(sf_dir: str):
    """Per-source deterministic downsampling (skewed-source rebalancing) —
    one streaming pass, rates broadcast in the closure."""
    from .functions.sampling import sample_stratified
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "source"])
    return sample_stratified(docs, "doc_id", "source", _STRAT_RATES)


def _q_text_redact(sf_dir: str):
    """PII-style regex scrub (stages/redact.py). The fixture text has no
    PII, so deterministic email/phone markers derived from doc_id are
    planted FIRST (identically in the SQL oracle) — the scrub and its
    per-rule counts are then genuinely exercised, not vacuous."""
    from .stages.redact import redact
    docs = _docs(sf_dir)

    def plant(b: pa.Table) -> pa.Table:
        did = pc.cast(b["doc_id"], pa.string())
        txt = pc.binary_join_element_wise(
            b["text"], " contact user", did, "@mail.example.com or +1-555-",
            did, "")
        return pa.table({"doc_id": b["doc_id"], "text": txt})

    planted = docs.map_batches(plant, batch_format="pyarrow",
                               zero_copy_batch=True)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"], "text": b["text"],
            "n_email": pc.cast(b["n_email"], pa.int64()),
            "n_phone": pc.cast(b["n_phone"], pa.int64()),
            "n_ipv4": pc.cast(b["n_ipv4"], pa.int64())})

    return redact(planted).map_batches(finish, batch_format="pyarrow",
                                       zero_copy_batch=True)


def _q_contamination(sf_dir: str):
    """Train/eval n-gram contamination check (stages/contamination.py):
    eval = doc_id % 20 == 0, train = the rest; eval shingle set broadcast,
    train streamed with no shuffle."""
    from .stages.contamination import contamination_check

    def split(keep_eval: bool):
        def f(b: pa.Table) -> pa.Table:
            did = pc.cast(b["doc_id"], pa.int64()).to_numpy(
                zero_copy_only=False)
            m = (did % 20 == 0) if keep_eval else (did % 20 != 0)
            return b.filter(pa.array(m))
        return f

    docs = _docs(sf_dir)
    train = docs.map_batches(split(False), batch_format="pyarrow",
                             zero_copy_batch=True)
    ev = docs.map_batches(split(True), batch_format="pyarrow",
                          zero_copy_batch=True)
    return contamination_check(train, ev, min_overlap_frac=0.2)


def _q_multimodal_resize(sf_dir: str):
    """Fake-kernel image resize over binary payloads (multimodal.py): the
    actor-pool plumbing and the byte-level transform are hash-verified —
    the SQL oracle reproduces the deterministic fake kernel via hex-string
    slicing (only the codec call itself is a container-boundary stub)."""
    from .stages.multimodal import resize_images, synthesize_media
    return resize_images(synthesize_media(_docs(sf_dir))).sort("media_id")


def _q_multimodal_frames(sf_dir: str):
    """Fake-kernel video frame sampling: one row per sampled frame
    (explode-shaped multimodal stage), hex-slice oracle as above."""
    from .stages.multimodal import sample_frames, synthesize_media
    return sample_frames(synthesize_media(_docs(sf_dir))) \
        .sort(["media_id", "frame_idx"])


def _q_dedup_canonical(sf_dir: str):
    """Pair list -> transitive keep/drop map (dedup.dedup_canonical_map):
    connected components over the minhash pair graph, canon = component
    minimum, corpus streamed against the broadcast label map. Oracle is a
    recursive-CTE transitive closure over the exact-Jaccard pair set (which
    the minhash output provably equals on this corpus)."""
    from .stages.dedup import dedup_canonical_map, minhash_lsh_pairs
    docs = _docs(sf_dir)
    return dedup_canonical_map(docs, minhash_lsh_pairs(docs))


def _q_dedup_fingerprint(sf_dir: str):
    """Winnowing-fingerprint near-dup pairs (stages/dedup.py): postings
    shuffle once grouped by fingerprint, stop-keys (df > 64) dropped whole,
    pairs need >= 5 shared picks."""
    from .stages.dedup import fingerprint_near_dup_pairs
    return fingerprint_near_dup_pairs(_docs(sf_dir))


def _q_text_tfidf(sf_dir: str):
    """Per-doc top-3 tf-idf terms (textstats.tfidf_top_terms): the corpus-
    statistic broadcast pattern — vocabulary-sized DF table computed with
    map-side combine, broadcast once, corpus re-streamed (never shuffled).
    Ratio idf (N/df) instead of log for IEEE-exact oracle parity."""
    from .stages.textstats import tfidf_top_terms
    return tfidf_top_terms(_docs(sf_dir), k=3)


def _q_cap_per_source(sf_dir: str):
    """Deterministic per-key head (functions/topn.py): the 20 longest docs
    per source — map-side prune bounds the shuffle at n rows per
    (key, block), one key sort finalizes."""
    from .functions.topn import top_n_per_key
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "source", "n_chars"])
    return top_n_per_key(docs, ["source"],
                         [("n_chars", False), ("doc_id", True)], 20)


def _q_rel_quantiles_by_flag(sf_dir: str):
    """Per-group quantile_disc (functions/quantiles.grouped_quantiles):
    one key sort, per-group sorted-rank picks inside complete-group blocks."""
    from .functions.quantiles import grouped_quantiles
    li = ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_returnflag", "l_extendedprice"])
    return grouped_quantiles(li, "l_returnflag", "l_extendedprice",
                             [0.25, 0.5, 0.75, 0.95])


def _q_events_sliding_window(sf_dir: str):
    """Overlapping hop windows (relational.sliding_window_agg): map-side
    bounded replication + partial combine, ONE all-to-all of partials."""
    from .pipelines.relational import sliding_window_agg
    return sliding_window_agg(sf_dir)


def _q_rel_quantiles(sf_dir: str):
    """Exact distributed quantiles (functions/quantiles.py): histogram-
    narrowed rank selection, three streaming passes, no sort/shuffle;
    matches DuckDB quantile_disc exactly."""
    from .functions.quantiles import quantiles_exact
    li = ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_extendedprice"])
    return quantiles_exact(li, "l_extendedprice", [0.25, 0.5, 0.75, 0.95])


def _q_rel_quantiles_cont(sf_dir: str):
    """Interpolated PERCENTILE_CONT (functions/quantiles.quantiles_cont):
    two exact order statistics per q from the histogram-narrowed selector,
    driver-side IEEE interpolation matching the oracle's spelled-out
    formula."""
    from .functions.quantiles import quantiles_cont
    li = ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_extendedprice"])
    return quantiles_cont(li, "l_extendedprice", [0.25, 0.5, 0.75, 0.9])


def _q_events_funnel(sf_dir: str):
    """Funnel analysis (relational.funnel_per_user): earliest strictly-
    ordered view -> click -> purchase per user; masked per-group minima,
    one shuffle."""
    from .pipelines.relational import funnel_per_user
    return funnel_per_user(sf_dir)


def _q_events_retention(sf_dir: str):
    """Cohort retention matrix (relational.retention_cohorts): users
    bucketed by first-event week, counted per active week."""
    from .pipelines.relational import retention_cohorts
    return retention_cohorts(sf_dir)


def _q_events_transitions(sf_dir: str):
    """Per-user event-type transition matrix (relational.event_transitions):
    LAG + grouped count, partials collapse to |types|^2 before one tiny
    all-to-all."""
    from .pipelines.relational import event_transitions
    return event_transitions(sf_dir)


def _q_rel_tpch_q3(sf_dir: str):
    """TPC-H Q3 composition (relational.tpch_q3_revenue): broadcast
    semi-filter (customer segment) -> map-side fixed-point revenue partials
    -> one sum all-to-all -> int-key co-group date attach -> pruned global
    top-k."""
    from .pipelines.relational import tpch_q3_revenue
    return tpch_q3_revenue(sf_dir)


# --------------------------------------------------------------------------
# relational operator demos (TPC-H-ish tables)
# --------------------------------------------------------------------------

def _q_rel_lineitem(sf_dir: str):
    from .pipelines.relational import lineitem_agg
    return lineitem_agg(sf_dir)


def _q_rel_mktsegment(sf_dir: str):
    from .pipelines.relational import orders_by_mktsegment
    return orders_by_mktsegment(sf_dir)


def _q_rel_topk_customers(sf_dir: str):
    from .pipelines.relational import topk_customers
    return topk_customers(sf_dir)


def _q_rel_first_order(sf_dir: str):
    from .pipelines.relational import first_order_per_customer
    return first_order_per_customer(sf_dir)


def _q_rel_brand(sf_dir: str):
    from .pipelines.relational import revenue_by_brand
    return revenue_by_brand(sf_dir)


def _q_events_sessionize(sf_dir: str):
    from .pipelines.relational import sessionize_events
    return sessionize_events(sf_dir)


def _q_events_window(sf_dir: str):
    from .pipelines.relational import windowed_event_agg
    return windowed_event_agg(sf_dir)


def _q_events_json(sf_dir: str):
    from .pipelines.relational import json_props_sum
    return json_props_sum(sf_dir)


def _q_events_interval_join(sf_dir: str):
    """Range join (custom operator; functions/ranges.py): purchases inside
    the 10-minute window after an error by the same user."""
    from .functions.ranges import interval_join
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "user_id", "ts",
                                        "event_type"])
    points = ev.filter(expr="event_type == 'purchase'")

    def to_iv(b: pa.Table) -> pa.Table:
        s = pc.cast(b["ts"], pa.timestamp("us"))
        e = pc.cast(pc.add(pc.cast(s, pa.int64()), 600_000_000),
                    pa.timestamp("us"))
        return pa.table({"error_id": b["event_id"], "user_id": b["user_id"],
                         "s": s, "e": e})
    intervals = ev.filter(expr="event_type == 'error'") \
        .map_batches(to_iv, batch_format="pyarrow")
    return interval_join(points, intervals, by="user_id", ts_col="ts",
                         start_col="s", end_col="e", point_id="event_id",
                         interval_id="error_id",
                         bin_width_us=600_000_000)


def _q_events_asof(sf_dir: str):
    """As-of join (custom operator; functions/asof.py): every purchase
    event matched to the user's most recent STRICTLY-earlier click."""
    from .functions.asof import asof_join
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "user_id", "ts",
                                        "event_type"])
    left = ev.filter(expr="event_type == 'purchase'")
    right = ev.filter(expr="event_type == 'click'")
    return asof_join(left, right, by="user_id", ts_col="ts",
                     id_col="event_id")


_STOPWORD_SQL = ",".join(f"'{w}'" for w in
                         ("the", "a", "an", "and", "or", "of", "in", "on",
                          "to", "is"))

_SHINGLE_CTE = """
docs AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                      FOR i IN range(1, len(ws) - 1)]) AS s
       FROM docs),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
"""

# shared all-pairs oracle for BOTH embedding near-dup engines (LSH + blocked
# exact): the two Ray paths and this SQL must agree pair-for-pair.
_EMB_NEAR_DUP_SQL = f"""
    SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6)
          >= {EMB_NEAR_DUP_THRESHOLD}
    ORDER BY doc_a, doc_b"""

# near-dup pair graph -> transitive components -> canonical minimum: the
# shared tail of the canonical-map oracle and the cluster-size histogram.
_CANON_CTE = """
            p AS (SELECT i.doc_a, i.doc_b FROM inter i
                  JOIN sizes sa ON sa.doc_id = i.doc_a
                  JOIN sizes sb ON sb.doc_id = i.doc_b
                  WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.5),
            e AS (SELECT doc_a AS u, doc_b AS v FROM p
                  UNION SELECT doc_b, doc_a FROM p),
            reach(node, r) AS (
              SELECT u, u FROM e
              UNION
              SELECT e.u, reach.r FROM e JOIN reach ON reach.node = e.v),
            canon AS (SELECT node, min(r) AS c FROM reach GROUP BY 1)
"""

_JACCARD_SQL = """
WITH """ + _SHINGLE_CTE + """
SELECT i.doc_a, i.doc_b,
       CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.5
ORDER BY doc_a, doc_b
"""


def _langid_sql() -> str:
    """The langid classifier reproduced exactly: integer-quantized bigram
    profile as a VALUES table (same model object the actor pool loads),
    integer dot-product scores (order-independent), argmax with lex
    tie-break, 'und' for zero overlap."""
    from .stages.textstats import langid_profile_rows
    vals = ",".join(
        "('{}', '{}', {})".format(lang, g.replace("'", "''"), w)
        for lang, g, w in langid_profile_rows())
    return f"""
        WITH prof(lang, g, w) AS (VALUES {vals}),
        d AS (SELECT doc_id, lower(text) AS t,
                     length(lower(text)) AS L FROM documents),
        gi AS (SELECT doc_id, t, unnest(range(1, L)) AS i
               FROM d WHERE L >= 2),
        bg AS (SELECT doc_id, substring(t, i, 2) AS g, count(*) AS c
               FROM gi GROUP BY 1, 2),
        sc AS (SELECT b.doc_id, p.lang, sum(b.c * p.w) AS s
               FROM bg b JOIN prof p ON p.g = b.g GROUP BY 1, 2),
        best AS (SELECT doc_id, lang, row_number() OVER
                   (PARTITION BY doc_id ORDER BY s DESC, lang) AS rk
                 FROM sc WHERE s > 0)
        SELECT d.doc_id, coalesce(b.lang, 'und') AS pred_lang
        FROM d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rk = 1
        ORDER BY d.doc_id"""


# winnowing reproduced exactly in SQL (shared by text_fingerprint and
# dedup_fingerprint): k-gram hash = first 8 hex digits of md5 (the Ray side
# uses the same hash precisely so this oracle is possible — DuckDB has no
# crc32); complete-window (w=8) running min via ROWS BETWEEN 7 PRECEDING,
# distinct picks, with the reference's short-doc (<k chars) and few-grams
# (<=w) degenerate branches unioned in. Ends in ``allp(doc_id, w)`` =
# distinct fingerprint picks per doc.
_WINNOW_CTE = """
WITH t AS (SELECT doc_id, lower(text) AS t,
                  length(lower(text)) AS L FROM documents),
short AS (SELECT doc_id,
                 ('0x' || substring(md5(t), 1, 8))::BIGINT AS w
          FROM t WHERE L < 5),
gi AS (SELECT doc_id, t, unnest(range(1, L - 3)) AS i
       FROM t WHERE L >= 5),
grams AS (SELECT doc_id, i,
                 ('0x' || substring(md5(substring(t, i, 5)),
                                    1, 8))::BIGINT AS h
          FROM gi),
counts AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
wins AS (SELECT doc_id, i,
                min(h) OVER (PARTITION BY doc_id ORDER BY i
                             ROWS BETWEEN 7 PRECEDING
                             AND CURRENT ROW) AS w
         FROM grams),
picks AS (SELECT DISTINCT g.doc_id, g.w
          FROM wins g JOIN counts c USING (doc_id)
          WHERE c.n > 8 AND g.i >= 8),
smallpicks AS (SELECT g.doc_id, min(h) AS w
               FROM grams g JOIN counts c USING (doc_id)
               WHERE c.n <= 8 GROUP BY 1),
allp AS (SELECT * FROM picks UNION ALL
         SELECT * FROM smallpicks UNION ALL
         SELECT * FROM short)"""


# --- splitmix64 reproduced in SQL (must match functions/sampling.py
# bit-for-bit): xor/shift on UBIGINT, multiply via HUGEINT 32/32 split so the
# 128-bit partials never overflow, everything mod 2^64. Verified bit-exact
# against the numpy implementation over 5000 keys (tests/test_training_ops).
_M64 = 18446744073709551616  # 2^64


def _sql_mix(x: str, mult: int) -> str:
    mh, ml = divmod(mult, 1 << 32)
    h = f"(CAST({x} AS HUGEINT) // 4294967296)"
    lo = f"(CAST({x} AS HUGEINT) % 4294967296)"
    return (f"CAST((({h} * {ml} + {lo} * {mh}) * 4294967296 + {lo} * {ml}) "
            f"% {_M64} AS UBIGINT)")


def _splitmix_cte(table: str, key: str, cols: str) -> str:
    """CTE chain ending in a view ``u`` with ``cols`` plus ``u01`` in [0,1)."""
    return f"""
z0 AS (SELECT {cols},
              CAST((CAST({key} AS HUGEINT) + 11400714819323198485)
                   % {_M64} AS UBIGINT) AS z FROM {table}),
z1 AS (SELECT * EXCLUDE (z),
       {_sql_mix('xor(z, z >> 30)', 0xBF58476D1CE4E5B9)} AS z FROM z0),
z2 AS (SELECT * EXCLUDE (z),
       {_sql_mix('xor(z, z >> 27)', 0x94D049BB133111EB)} AS z FROM z1),
u AS (SELECT * EXCLUDE (z),
      CAST(xor(z, z >> 31) AS DOUBLE) / {_M64}.0 AS u01 FROM z2)"""


def _cms_sql() -> str:
    """Count-Min sketch twin (functions/cms.py): per hash row r, col =
    splitmix64(key XOR splitmix64(r+1)) % width; the row seeds are Python-
    computed constants injected as UBIGINT literals."""
    from .functions.cms import CMS_WIDTH, cms_row_seeds
    seeds = ", ".join(f"({r}, CAST('{int(s)}' AS UBIGINT))"
                      for r, s in enumerate(cms_row_seeds()))
    return f"""
            WITH seeds(r, s) AS (VALUES {seeds}),
            base AS (SELECT seeds.r AS rw,
                            xor(CAST(l_partkey AS UBIGINT), s) AS kx
                     FROM lineitem CROSS JOIN seeds),
            {_splitmix_cte('base', 'kx', 'rw')},
            hh AS (SELECT rw, xor(z, z >> 31) AS h FROM z2)
            SELECT CAST(rw AS BIGINT) AS row,
                   CAST(h % {CMS_WIDTH} AS BIGINT) AS col,
                   count(*) AS cnt
            FROM hh GROUP BY 1, 2 ORDER BY 1, 2"""


def _redact_sql() -> str:
    """Sequential plant -> count -> replace chain built from the SAME rule
    list the Ray stage uses (stages/redact.py DEFAULT_RULES); both engines
    are RE2, so counts and replacements agree byte-for-byte."""
    from .stages.redact import DEFAULT_RULES
    plant = ("text || ' contact user' || CAST(doc_id AS VARCHAR) || "
             "'@mail.example.com or +1-555-' || CAST(doc_id AS VARCHAR)")
    sql = f"WITH r0 AS (SELECT doc_id, {plant} AS t FROM documents)"
    prev, counts = "r0", []
    for i, (name, pat, repl) in enumerate(DEFAULT_RULES, 1):
        carried = ", ".join(counts) + (", " if counts else "")
        counts.append(f"n_{name}")
        sql += (f",\nr{i} AS (SELECT doc_id, {carried}"
                f"len(regexp_extract_all(t, '{pat}')) AS n_{name}, "
                f"regexp_replace(t, '{pat}', '{repl}', 'g') AS t FROM {prev})")
        prev = f"r{i}"
    return (sql + f"\nSELECT doc_id, t AS text, " + ", ".join(counts)
            + f" FROM {prev} ORDER BY doc_id")


# train = doc_id % 20 <> 0, eval = the rest — mirrors queries._q_contamination;
# shingle semantics identical to _SHINGLE_CTE (k=3 lowercased word-grams,
# <k-word docs contribute zero shingles and are never contaminated).
_CONTAMINATION_SQL = """
WITH docs AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
              FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                      FOR i IN range(1, len(ws) - 1)]) AS s
       FROM docs),
ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
tsh AS (SELECT doc_id, count(*) AS n_sh,
               count(CASE WHEN s IN (SELECT s FROM ev) THEN 1 END) AS n_ov
        FROM sh WHERE doc_id % 20 <> 0 GROUP BY 1),
tr AS (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0)
SELECT t.doc_id, coalesce(n_sh, 0) AS n_shingles,
       coalesce(n_ov, 0) AS n_overlap,
       CASE WHEN coalesce(n_sh, 0) > 0 THEN CAST(n_ov AS DOUBLE) / n_sh
            ELSE 0.0 END AS overlap_frac,
       CASE WHEN coalesce(n_sh, 0) > 0 THEN CAST(n_ov AS DOUBLE) / n_sh
            ELSE 0.0 END >= 0.2 AS contaminated
FROM tr t LEFT JOIN tsh USING (doc_id) ORDER BY doc_id"""


def _q_rel_bloom_semi_join(sf_dir: str):
    """Two-phase Bloom semi-join (relational.bloom_semi_join): broadcast a
    16-bit/key Bloom of the urgent-order keys, scan-filter lineitem in
    place, exact-verify the tiny survivor set with one shuffle co-group."""
    from .pipelines.relational import bloom_semi_join
    return bloom_semi_join(sf_dir)


def _q_events_pivot(sf_dir: str):
    """PIVOT (relational.pivot_event_counts): per-user count per event type
    as fixed columns — block-local scatter-add partials, one grouped sum."""
    from .pipelines.relational import pivot_event_counts
    return pivot_event_counts(sf_dir)


def _q_events_gap_fill(sf_dir: str):
    """Calendar densification (relational.gap_fill_daily_counts): zero rows
    for missing (event_type, epoch-day) cells via a driver-built date spine
    unioned into the grouped count — no left join."""
    from .pipelines.relational import gap_fill_daily_counts
    return gap_fill_daily_counts(sf_dir)


def _q_events_anomaly(sf_dir: str):
    """Integer z-score outliers (relational.anomaly_events): value > mean +
    2*stddev per event_type decided by exact squared comparison — two scans,
    only the 5-row stats table crosses stages."""
    from .pipelines.relational import anomaly_events
    return anomaly_events(sf_dir)


def _q_rel_percent_rank(sf_dir: str):
    """PERCENT_RANK window function (relational.percent_rank_qty) in exact
    fixed point: (rank-1)*1e6 // (n-1) per l_returnflag partition."""
    from .pipelines.relational import percent_rank_qty
    return percent_rank_qty(sf_dir)


def _q_events_collapse(sf_dir: str):
    """Burst collapse (relational.collapse_rapid_repeats): drop events
    repeating the same (user, type) within 60s of the previous one — the
    LAG-window dedup stage of click-stream pipelines."""
    from .pipelines.relational import collapse_rapid_repeats
    return collapse_rapid_repeats(sf_dir)


def _q_rel_cov(sf_dir: str):
    """Grouped covariance numerator in exact integers
    (relational.cov_qty_price): n^2 * cov_pop as n*Sxy - Sx*Sy — the
    two-column grouped-moment family with zero float association."""
    from .pipelines.relational import cov_qty_price
    return cov_qty_price(sf_dir)


def _q_events_twa(sf_dir: str):
    """Time-weighted average (relational.time_weighted_value): LEAD-window
    hold-until-next weighting, exact integer (numerator, denominator)."""
    from .pipelines.relational import time_weighted_value
    return time_weighted_value(sf_dir)


def _q_rel_tpch_q5(sf_dir: str):
    """TPC-H Q5 six-table composition (relational.tpch_q5_local_volume):
    broadcast dims + ONE big×big co-group attach, exact fixed-point."""
    from .pipelines.relational import tpch_q5_local_volume
    return tpch_q5_local_volume(sf_dir)


def _q_rel_tpch_q17(sf_dir: str):
    """TPC-H Q17 correlated avg-per-part filter
    (relational.tpch_q17_small_qty_revenue): semi-filter + packed-stats
    join-back, 5·qty·n < sum exact-integer threshold."""
    from .pipelines.relational import tpch_q17_small_qty_revenue
    return tpch_q17_small_qty_revenue(sf_dir)


def _q_freq_heavy_hitters(sf_dir: str):
    """Mergeable Misra-Gries heavy hitters + exact verify
    (functions/heavyhitters.heavy_hitters): event types with count >
    N/(k+1), k=4 — exact counts, never a full-keyspace shuffle."""
    import ray.data as rd

    from .functions.heavyhitters import heavy_hitters
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type"])
    return heavy_hitters(ev, "event_type", 4)


def _q_events_window_distinct(sf_dir: str):
    """Trailing 7-day distinct users per spine day
    (relational.window_distinct_users): per-user interval union folded to
    ±1 boundary deltas + one small prefix-sum block."""
    from .pipelines.relational import window_distinct_users
    return window_distinct_users(sf_dir)


def _q_rel_ntile(sf_dir: str):
    """NTILE(4) equal-height buckets per segment
    (relational.ntile_customers): closed-form bucket id from in-group
    position, deterministic custkey tie-break on both engines."""
    from .pipelines.relational import ntile_customers
    return ntile_customers(sf_dir)


def _q_curation_mix_sources(sf_dir: str):
    """Deterministic mix-to-target resampling
    (functions/sampling.sample_weighted_mix): corpus shrunk to N//2 docs
    with per-source quotas ∝ integer weights (src index mod 4 + 1), taken
    smallest-hash-first — the training-data source-mixing step."""
    import ray.data as rd

    from .functions.sampling import sample_weighted_mix
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "source"])
    # 1024 covers any scale factor's source cardinality (same convention
    # as _STRAT_RATES); the oracle derives w from the name, so both sides
    # agree for every srcN the generator can emit.
    weights = {f"src{i}": i % 4 + 1 for i in range(1024)}
    return sample_weighted_mix(docs, "doc_id", "source", weights)


def _q_rel_quantile_sketch(sf_dir: str):
    """Histogram-sketch quantiles (relational.quantile_sketch_prices):
    mergeable fixed-space bins, integer-deterministic, error ≤ bin width —
    the scale path beside the exact order statistics."""
    from .pipelines.relational import quantile_sketch_prices
    return quantile_sketch_prices(sf_dir)


def _q_rel_full_outer(sf_dir: str):
    """FULL OUTER key reconciliation (relational.full_outer_activity via
    joins.full_outer_unique): zero-filled sides + presence flags, ONE
    union-tag co-group sort over the post-aggregation tables."""
    from .pipelines.relational import full_outer_activity
    return full_outer_activity(sf_dir)


def _q_rel_mad(sf_dir: str):
    """Grouped median absolute deviation (relational.mad_prices_by_flag):
    robust spread in exact cents, LOW median both passes, group-median
    table rides the closure."""
    from .pipelines.relational import mad_prices_by_flag
    return mad_prices_by_flag(sf_dir)


def _q_events_argmax(sf_dir: str):
    """Per-group ARGMAX (relational.top_event_per_user): each user's
    highest-value event via top_n_per_key n=1 — map-side prune ships one
    row per (user, block)."""
    from .pipelines.relational import top_event_per_user
    return top_event_per_user(sf_dir)


def _q_events_error_recovery(sf_dir: str):
    """Event-pattern join (relational.error_recovery_times): first
    purchase within 1h after each error, per user — composed-key
    searchsorted inside sorted blocks, never a quadratic self-join."""
    from .pipelines.relational import error_recovery_times
    return error_recovery_times(sf_dir)


def _q_rel_skyline(sf_dir: str):
    """SKYLINE / Pareto frontier (relational.skyline_lineitem): lossless
    per-block dominance prune + one small exact final block."""
    from .pipelines.relational import skyline_lineitem
    return skyline_lineitem(sf_dir)


def _q_events_mode(sf_dir: str):
    """Grouped MODE (relational.mode_event_per_user): exact pair counts +
    top-1 per key, deterministic lexical tie-break."""
    from .pipelines.relational import mode_event_per_user
    return mode_event_per_user(sf_dir)


def _q_events_diversity(sf_dir: str):
    """Grouped Gini-impurity diversity in exact integers
    (relational.type_diversity_per_user): (n, Σ count²) per user, float
    division at presentation time."""
    from .pipelines.relational import type_diversity_per_user
    return type_diversity_per_user(sf_dir)


def _q_events_xcorr(sf_dir: str):
    """Daily cross-correlation at lags −1/0/+1
    (relational.type_xcorr_daily): exact integer dot products over the
    tiny days×2 count table, searchsorted alignment."""
    from .pipelines.relational import type_xcorr_daily
    return type_xcorr_daily(sf_dir)


def _q_events_topk_ties(sf_dir: str):
    """FETCH FIRST n WITH TIES per key (topn.top_n_with_ties_per_key ==
    SQL RANK() <= n): whole tie-runs survive together; monotone map-side
    prune, rank column matches SQL RANK."""
    import ray.data as rd

    from .functions.topn import top_n_with_ties_per_key
    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "value"])

    def prep(b):
        import pyarrow as pa_
        import pyarrow.compute as pc_
        return pa_.table({
            "user_id": pc_.cast(b["user_id"], pa_.int64()),
            "event_id": pc_.cast(b["event_id"], pa_.int64()),
            "value_c": pc_.cast(pc_.round(pc_.multiply(
                b["value"], pa_.scalar(100.0))), pa_.int64())})

    prepped = ev.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    return top_n_with_ties_per_key(prepped, ["user_id"],
                                   [("value_c", False)], 2, 8)


def _q_events_ffill(sf_dir: str):
    """Forward-fill / LOCF imputation (relational.ffill_last_purchase):
    segmented fill via ONE maximum.accumulate over group-composed keys;
    zero-fill + has_prior flag."""
    from .pipelines.relational import ffill_last_purchase
    return ffill_last_purchase(sf_dir)


def _q_rel_unpivot(sf_dir: str):
    """UNPIVOT / melt (relational.unpivot_lineitem_measures): wide→long
    reshape as a stateless per-block Arrow concat, zero shuffle."""
    from .pipelines.relational import unpivot_lineitem_measures
    return unpivot_lineitem_measures(sf_dir)


def _q_rel_ols(sf_dir: str):
    """Grouped OLS slope in exact integers
    (relational.ols_qty_price_by_flag): (n·Sxy−SxSy) / (n·Sxx−Sx²) as an
    integer (num, den) pair from one moment pass."""
    from .pipelines.relational import ols_qty_price_by_flag
    return ols_qty_price_by_flag(sf_dir)


def _q_rel_wmedian(sf_dir: str):
    """Grouped weighted (low) median (relational.weighted_median_price):
    first price whose cumulative quantity weight reaches ceil(W/2), exact
    integers, no expansion materialized."""
    from .pipelines.relational import weighted_median_price
    return weighted_median_price(sf_dir)


def _q_events_cum_distinct(sf_dir: str):
    """Cumulative distinct-type window (relational.cum_distinct_types):
    first-occurrence indicator + segmented cumsum, both vectorized."""
    from .pipelines.relational import cum_distinct_types
    return cum_distinct_types(sf_dir)


def _q_rel_ratio_to_report(sf_dir: str):
    """RATIO_TO_REPORT / percent-of-total as an exact integer pair
    (relational.ratio_to_report_prices): per-flag totals ride the
    closure, stateless attach."""
    from .pipelines.relational import ratio_to_report_prices
    return ratio_to_report_prices(sf_dir)


def _q_kg_inferred_types(sf_dir: str):
    """RDFS-style type-inference materialization over the built KG:
    entity instanceOf t ∧ subClassOf⁺(t, T) ⇒ (entity, T). The
    subClassOf closure is computed DISTRIBUTED by path doubling
    (functions/datalog.transitive_closure — ⌈log₂ diameter⌉ co-group
    rounds), then ONE m:n cogroup join onto the instanceOf edges; the
    triple table is materialized once (it is the flagship's bounded
    output, not the input corpus)."""
    from .functions.bgp import cogroup_join
    from .functions.datalog import transitive_closure
    from .functions.pagerank import _distinct
    from .pipelines.kg import run_kg
    tri = run_kg(sf_dir).materialize()

    def pick(pred: str, a: str, b_: str):
        def f(t: pa.Table) -> pa.Table:
            m = t.filter(pc.equal(t["pred"], pred))
            return pa.table({a: pc.cast(m["subj"], pa.string()),
                             b_: pc.cast(m["obj"], pa.string())})
        return f

    sub = tri.map_batches(pick(C.RDFS_SUBCLASS_OF, "s", "o"),
                          batch_format="pyarrow")
    inst = tri.map_batches(pick(C.PRED_INSTANCE_OF, "e", "t"),
                           batch_format="pyarrow")
    clo = transitive_closure(sub, "s", "o")
    clo_t = clo.map_batches(
        lambda b: pa.table({"t": b["s"], "o": b["o"]}),
        batch_format="pyarrow")
    sup = cogroup_join(inst, clo_t, ["t"], ["t", "e"], ["t", "o"],
                       num_partitions=4) \
        .map_batches(lambda b: pa.table({"entity": b["e"],
                                         "type_iri": b["o"]}),
                     batch_format="pyarrow")
    direct = inst.map_batches(
        lambda b: pa.table({"entity": b["e"], "type_iri": b["t"]}),
        batch_format="pyarrow")
    return _distinct(direct.union(sup), ["entity", "type_iri"], 4)


def _q_kg_negative_edges(sf_dir: str, m: int = 6, k: int = 3):
    """Deterministic NEGATIVE-EDGE sampling for link-prediction training
    over the co-mention graph: per node, the first k of m hash-derived
    candidate partners that are NOT actual neighbors (and not self).
    Candidate pos = (pos·2654435761 + j·40503) mod N over the node table's
    lexicographic ranks, so both engines draw identical lotteries. All
    distributed primitives: sort+zip_with_index for ranks (range-ordered
    blocks — the same sort invariant materialize.py stress-tests),
    `attach_column` to name candidates, the general string `anti_join`
    against undirected edge keys, `top_n_per_key` for first-k-surviving."""
    from .functions.joins import attach_column, zip_with_index
    from .functions.pagerank import _distinct
    from .functions.setops import anti_join
    from .functions.topn import top_n_per_key
    from .functions.triangles import within_group_pairs

    pre = C.ENT + "mention/"
    mm = _q_mentions(sf_dir).map_batches(
        lambda b: pa.table({
            "turn": b["subj"],
            "c": pc.utf8_slice_codeunits(b["obj"], len(pre))}),
        batch_format="pyarrow")
    edges = within_group_pairs(mm, "turn", "c")

    def both_dirs(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [b["u"].combine_chunks(), b["v"].combine_chunks()])})

    nodes = _distinct(edges.map_batches(both_dirs,
                                        batch_format="pyarrow"),
                      ["node"], 4).sort("node")
    nodes = zip_with_index(nodes, "pos", order_by="node")
    n_nodes = nodes.count()

    def propose(b: pa.Table) -> pa.Table:
        pos = b["pos"].combine_chunks().to_numpy(zero_copy_only=False)
        node = b["node"].combine_chunks()
        js = np.arange(1, m + 1, dtype=np.int64)
        cpos = (np.repeat(pos, m) * np.int64(2654435761)
                + np.tile(js, len(pos)) * np.int64(40503)) % \
            np.int64(n_nodes)
        idx = pa.array(np.repeat(np.arange(len(pos)), m))
        return pa.table({"node": node.take(idx),
                         "j": pa.array(np.tile(js, len(pos)), pa.int64()),
                         "cand_pos": pa.array(cpos, pa.int64())})

    cand = nodes.map_batches(propose, batch_format="pyarrow")
    named = attach_column(
        cand, nodes, [("node", pa.string()), ("j", pa.int64())],
        "cand_pos", "pos", "node", "neg", pa.string(), 4)

    def keyed(b: pa.Table) -> pa.Table:
        t = b.filter(pc.invert(pc.equal(b["node"], b["neg"])))
        return t.append_column("key", pc.binary_join_element_wise(
            t["node"], t["neg"], "|"))

    cand_k = named.map_batches(keyed, batch_format="pyarrow")

    def edge_keys(b: pa.Table) -> pa.Table:
        return pa.table({"key": pa.concat_arrays([
            pc.binary_join_element_wise(b["u"], b["v"], "|")
            .combine_chunks(),
            pc.binary_join_element_wise(b["v"], b["u"], "|")
            .combine_chunks()])})

    und = edges.map_batches(edge_keys, batch_format="pyarrow")
    surv = anti_join(cand_k, und, "key", "key",
                     [("key", pa.string()), ("node", pa.string()),
                      ("neg", pa.string()), ("j", pa.int64())], 4)
    out = top_n_per_key(surv, ["node"], [("j", True)], k, 4)
    return out.map_batches(lambda b: b.select(["node", "neg", "j"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def _q_rel_ks_drift(sf_dir: str):
    """Exact two-sample KS statistic (relational.ks_drift_prices):
    distribution-drift detection in pure integers via the distributed
    prefix-scan pattern (per-block subtotals → driver offsets → per-block
    max), ONE value sort."""
    from .pipelines.relational import ks_drift_prices
    return ks_drift_prices(sf_dir)


def _q_rel_trimmed_mean(sf_dir: str):
    """Grouped trimmed mean (relational.trimmed_mean_prices): exact
    integer rank cut (100·rank vs pct·n) so both engines trim identical
    rows."""
    from .pipelines.relational import trimmed_mean_prices
    return trimmed_mean_prices(sf_dir)


def _q_kg_bgp_conv_tools(sf_dir: str):
    """Generic SPARQL-style BGP matcher (functions/bgp.bgp_match) run over
    the actual triple Dataset: {?t :usesTool ?tool . ?t :isPartOf ?conv}
    -> DISTINCT (conv, tool). One scan per pattern, one m:n cogroup join
    on the shared variable, one distinct."""
    from .functions.bgp import bgp_match
    from .stages import extract
    ts = _read_transcripts(sf_dir)
    tri = extract.structural_triples(ts)
    return bgp_match(
        tri, [("?t", C.PRED_USES_TOOL, "?tool"),
              ("?t", C.PRED_IS_PART_OF, "?conv")],
        ["conv", "tool"], num_partitions=8).sort(["conv", "tool"])


def _q_kg_bgp_mention_tool(sf_dir: str):
    """Three-pattern BGP over the union of mention + structural triples:
    {?t :mentions ?m . ?t :usesTool ?tool} -> DISTINCT (m, tool)
    co-occurrence — the planner chains two cogroup joins on ?t."""
    from .functions.bgp import bgp_match
    from .pipelines.kg import load_config_tables
    from .stages import canonicalize as canon
    from .stages import extract, mentions
    fdir = _fx(sf_dir)
    alias_rows, vocab, *_ = load_config_tables(fdir)
    ts = _read_transcripts(sf_dir)
    # materialize the actor-pool stage BEFORE unioning into the join/sort
    # graph: two actor pools + a sort in ONE executor graph wedge at low
    # CPU counts (see pipelines/kg.py:_stage and the verify skill note)
    m = canon.canonicalize_mentions(
        mentions.mention_triples(
            ts.select_columns(["conv_id", "turn_idx", "text"]), vocab),
        canon.build_canonical_map_local(alias_rows)).materialize()
    tri = extract.structural_triples(ts).union(m)
    return bgp_match(
        tri, [("?t", C.PRED_MENTIONS, "?m"),
              ("?t", C.PRED_USES_TOOL, "?tool")],
        ["m", "tool"], num_partitions=8).sort(["m", "tool"])


def _q_rel_cube(sf_dir: str):
    """GROUP BY CUBE (relational.lineitem_cube): all four grouping sets of
    (returnflag, linestatus) with one full-table shuffle."""
    from .pipelines.relational import lineitem_cube
    return lineitem_cube(sf_dir)


def _q_kg_bgp_optional_link(sf_dir: str):
    """SPARQL OPTIONAL over the mention + link triples:
    {?t :mentions ?m . OPTIONAL {?m schema:sameAs ?ent}} -> DISTINCT
    (m, ent); unlinked mentions survive with ent='' (the engine's
    null-free stand-in for SPARQL unbound). Exercises the left-join mode
    of functions/bgp.cogroup_join."""
    from .functions.bgp import bgp_match
    from .pipelines.kg import load_config_tables
    from .stages import canonicalize as canon
    from .stages import link, mentions
    fdir = _fx(sf_dir)
    alias_rows, vocab, *_ = load_config_tables(fdir)
    ts = _read_transcripts(sf_dir)
    m = canon.canonicalize_mentions(
        mentions.mention_triples(
            ts.select_columns(["conv_id", "turn_idx", "text"]), vocab),
        canon.build_canonical_map_local(alias_rows)).materialize()
    snapshot = link.load_snapshot(fdir)
    links = link.link_mentions(m, snapshot).materialize()
    return bgp_match(
        m.union(links), [("?t", C.PRED_MENTIONS, "?m")],
        ["m", "ent"], num_partitions=8,
        optional_patterns=[("?m", C.PRED_SAME_AS, "?ent")]) \
        .sort(["m", "ent"])


def _q_kg_provenance(sf_dir: str):
    """Per-predicate provenance/lineage aggregate over the structural
    triples (the north_rule's per-partition lineage counters, surfaced as
    a query): triple count, DISTINCT source conversations, min/max source
    turn. Two-level reduction — per-block (pred, conv) partials collapse
    the 10^12-turn stream to ~|preds|x|convs| before the ONE keyed
    shuffle; conv-distinctness falls out of the first level so no
    count-distinct machinery is needed."""
    from .functions.grouped import sorted_aggregate
    from .stages import extract
    ts = _read_transcripts(sf_dir)
    tri = extract.structural_triples(ts)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "pred": b["pred"], "conv": b["src_conv_id"],
            "n": pa.array(np.ones(b.num_rows, np.int64)),
            "mn": pc.cast(b["src_turn_idx"], pa.int64()),
            "mx": pc.cast(b["src_turn_idx"], pa.int64())})
        return t.group_by(["pred", "conv"], use_threads=False).aggregate(
            [("n", "sum"), ("mn", "min"), ("mx", "max")]) \
            .rename_columns(["pred", "conv", "n", "mn", "mx"])

    lvl1 = sorted_aggregate(
        tri.map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["pred", "conv"], [("n", "sum"), ("mn", "min"), ("mx", "max")],
        ["pred", "conv", "n", "mn", "mx"], 8)

    def partial2(b: pa.Table) -> pa.Table:
        t = pa.table({
            "pred": b["pred"], "n": b["n"],
            "c": pa.array(np.ones(b.num_rows, np.int64)),
            "mn": b["mn"], "mx": b["mx"]})
        return t.group_by(["pred"], use_threads=False).aggregate(
            [("n", "sum"), ("c", "sum"), ("mn", "min"), ("mx", "max")]) \
            .rename_columns(["pred", "n_triples", "n_convs",
                             "min_turn", "max_turn"])

    return sorted_aggregate(
        lvl1.map_batches(partial2, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["pred"], [("n_triples", "sum"), ("n_convs", "sum"),
                   ("min_turn", "min"), ("max_turn", "max")],
        ["pred", "n_triples", "n_convs", "min_turn", "max_turn"], 1) \
        .sort("pred")


def _rp_sql() -> str:
    """Oracle twin of similarity.random_projection: the +-1 matrix is
    injected as a VALUES table (a constant of the operator, like the CMS
    row seeds), components fixed-pointed with the identical
    floor(CAST(x AS DOUBLE) * 1e6) encoding."""
    from .stages.similarity import RP_OUT_DIM, rp_sign_matrix
    sm = rp_sign_matrix(64, RP_OUT_DIM)
    vals = ", ".join(f"({i + 1}, {j}, {int(sm[i, j])})"
                     for i in range(64) for j in range(RP_OUT_DIM))
    return f"""
            WITH s(i, j, sgn) AS (VALUES {vals}),
            e AS (SELECT vec_id, g.i AS i,
                         CAST(floor(CAST(embedding[g.i] AS DOUBLE)
                                    * 1000000) AS BIGINT) AS e_c
                  FROM embeddings, generate_series(1, 64) AS g(i))
            SELECT vec_id, CAST(j AS BIGINT) AS j,
                   CAST(sum(sgn * e_c) AS BIGINT) AS proj_c
            FROM e JOIN s USING (i) GROUP BY 1, 2 ORDER BY 1, 2"""


def _lsh_bucket_sql() -> str:
    """Oracle twin of ann_lsh_buckets: the ±1 hyperplane matrix rides in
    as a VALUES table (same splitmix64 constants as the Ray side),
    projections in exact fixed-point integers, bucket = 8 sign bits."""
    from .stages.similarity import rp_sign_matrix
    sm = rp_sign_matrix(64, 8)
    vals = ", ".join(f"({i + 1}, {j}, {int(sm[i, j])})"
                     for i in range(64) for j in range(8))
    return f"""
            WITH s(i, j, sgn) AS (VALUES {vals}),
            e AS (SELECT vec_id, g.i AS i,
                         CAST(floor(CAST(embedding[g.i] AS DOUBLE)
                                    * 1000000) AS BIGINT) AS e_c
                  FROM embeddings, generate_series(1, 64) AS g(i)),
            p AS (SELECT vec_id, j, sum(sgn * e_c) AS proj
                  FROM e JOIN s USING (i) GROUP BY 1, 2),
            bkt AS (SELECT vec_id,
                           sum(CASE WHEN proj >= 0
                               THEN CAST(1 AS BIGINT) << j
                               ELSE 0 END) AS bucket
                    FROM p GROUP BY 1)
            SELECT CAST(bucket AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n_vecs,
                   CAST(min(vec_id) AS BIGINT) AS min_vec_id
            FROM bkt GROUP BY 1 ORDER BY 1"""


def _tool_transition_edges(sf_dir: str) -> ray.data.Dataset:
    """Distinct (src, dst) edges of the tool-transition digraph —
    consecutive tool uses within a conversation; per-conversation LEAD
    inside sorted blocks over the full transcript stream with per-block
    distinct partials. Shared by the SCC and APSP/centrality queries."""
    from .functions.grouped import group_ids, sorted_group_apply
    from .functions.normalize import normalize_array
    from .stages.extract import _tool_mask

    t = _read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "tool"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(_tool_mask(b["tool"]))
        return pa.table({"conv_id": b["conv_id"],
                         "turn_idx": b["turn_idx"],
                         "tool": normalize_array(b["tool"])})

    edge_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows < 2:
            return edge_schema.empty_table()
        gid, _ = group_ids(b, ["conv_id"])
        tidx = b["turn_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tidx, gid))
        g = gid[order]
        tools = b["tool"].combine_chunks().take(pa.array(order))
        src, dst = tools.slice(0, len(tools) - 1), tools.slice(1)
        mask = pc.and_(pa.array(g[1:] == g[:-1]),
                       pc.invert(pc.equal(src, dst)))
        e = pa.table({"src": src, "dst": dst}).filter(mask)
        return e.group_by(["src", "dst"], use_threads=False) \
            .aggregate([]).rename_columns(["src", "dst"]) \
            .cast(edge_schema)

    return sorted_group_apply(
        t.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["conv_id"], block, 8)


def _q_kg_hits(sf_dir: str):
    """Two-step unnormalized HITS over the tool-transition digraph:
    auth1 = in-degree, hub1(u) = Σ_out auth1, auth2(v) = Σ_in hub1 —
    the iterative hub/authority recursion cut at two synchronized
    steps so every score stays an EXACT integer (normalization is a
    driver-side display concern, not a correctness one). Each step is
    one string-keyed attach + one grouped sum; the node table assembles
    null-free via indicator-column union partials."""
    from .functions.grouped import grouped_count, sorted_aggregate
    from .functions.joins import attach_column

    # _tool_transition_edges is distinct per BLOCK only (complete-conv
    # blocks) — HITS sums over edges, so dedupe globally first
    edges = grouped_count(_tool_transition_edges(sf_dir),
                          ["src", "dst"], "__n", 4) \
        .map_batches(lambda b: b.select(["src", "dst"]),
                     batch_format="pyarrow").materialize()
    a1 = grouped_count(edges, ["dst"], "in_deg", 4) \
        .map_batches(lambda b: pa.table({"node": b["dst"],
                                         "v": b["in_deg"]}),
                     batch_format="pyarrow").materialize()
    with_a1 = attach_column(
        edges, a1, [("src", pa.string()), ("dst", pa.string())],
        "dst", "node", "v", "a1", pa.int64(), 4, key_type=pa.string())
    h1 = sorted_aggregate(
        with_a1.map_batches(
            lambda b: pa.table({"node": b["src"], "h": b["a1"]}),
            batch_format="pyarrow"),
        ["node"], [("h", "sum")], ["node", "v"], 4).materialize()
    with_h1 = attach_column(
        edges, h1, [("src", pa.string()), ("dst", pa.string())],
        "src", "node", "v", "h1", pa.int64(), 4, key_type=pa.string())
    a2 = sorted_aggregate(
        with_h1.map_batches(
            lambda b: pa.table({"node": b["dst"], "a": b["h1"]}),
            batch_format="pyarrow"),
        ["node"], [("a", "sum")], ["node", "v"], 4)

    def tag(col):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            z = pa.array(np.zeros(n, np.int64))
            cols = {"node": b["node"], "in_deg": z, "hub1": z,
                    "auth2": z}
            cols[col] = pc.cast(b["v"], pa.int64())
            return pa.table(cols)
        return f

    u = a1.map_batches(tag("in_deg"), batch_format="pyarrow") \
        .union(h1.map_batches(tag("hub1"), batch_format="pyarrow"),
               a2.map_batches(tag("auth2"), batch_format="pyarrow"))
    # nodes that appear only as sources of leaves still need a row:
    srcs = grouped_count(edges, ["src"], "__n", 4).map_batches(
        lambda b: pa.table({
            "node": b["src"],
            "in_deg": pa.array(np.zeros(b.num_rows, np.int64)),
            "hub1": pa.array(np.zeros(b.num_rows, np.int64)),
            "auth2": pa.array(np.zeros(b.num_rows, np.int64))}),
        batch_format="pyarrow")
    return sorted_aggregate(
        u.union(srcs), ["node"],
        [("in_deg", "sum"), ("hub1", "sum"), ("auth2", "sum")],
        ["node", "in_deg", "hub1", "auth2"], 4).sort("node")


DISPERSION_TOP = 20


def _q_text_dispersion(sf_dir: str):
    """Term dispersion/burstiness moments: for the top-20 corpus terms,
    (df, total occurrences, Σ per-doc-count²) in exact integers — the
    variance-to-mean (index of dispersion) inputs that separate bursty
    topical terms from evenly-spread function words (Church & Gale 1995,
    public). One dictionary-sized shuffle of per-batch (doc, term)
    multiplicity partials; the top-k head is a tiny sort."""
    from .functions.grouped import sorted_aggregate
    from .stages.dedup import _words_flat

    def partial(b: pa.Table) -> pa.Table:
        words, doc_of = _words_flat(b["text"])
        if len(words) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "total": pa.array([], pa.int64()),
                             "sum_sq": pa.array([], pa.int64())})
        codes, inv = np.unique(words, return_inverse=True)
        key = doc_of.astype(np.int64) * len(codes) + inv
        ukey, mult = np.unique(key, return_counts=True)
        m = mult.astype(np.int64)
        t = pa.table({"term": pa.array(codes[ukey % len(codes)],
                                       pa.string()),
                      "df": pa.array(np.ones(len(ukey), np.int64)),
                      "total": pa.array(m),
                      "sum_sq": pa.array(m * m)})
        return t.group_by(["term"], use_threads=False).aggregate(
            [("df", "sum"), ("total", "sum"), ("sum_sq", "sum")]) \
            .rename_columns(["term", "df", "total", "sum_sq"])

    agg = sorted_aggregate(
        _docs(sf_dir).map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True),
        ["term"], [("df", "sum"), ("total", "sum"), ("sum_sq", "sum")],
        ["term", "df", "total", "sum_sq"], 4)
    return agg.sort(["total", "term"], descending=[True, False]) \
        .limit(DISPERSION_TOP)


def _q_rel_merge_upsert(sf_dir: str):
    """Lakehouse MERGE INTO / CDC upsert (last-writer-wins): apply
    purchase events as account-balance changes onto the customer base
    snapshot — per key the latest (ts, event_id) change wins, keys with
    no change keep the base row, change keys absent from the base are
    INSERTED. ONE shuffle: both sides union tagged, each key's complete
    sorted group resolves with a vectorized argmax; n_updates counts the
    applied change rows (audit column). Exact cents."""
    from .functions.grouped import group_ids, sorted_group_apply
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_acctbal"])
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type", "value", "ts", "event_id"])

    def base_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "k": pc.cast(b["c_custkey"], pa.int64()),
            "v": pc.cast(pc.round(pc.multiply(b["c_acctbal"], 100.0)),
                         pa.int64()),
            "t": pa.nulls(n, pa.int64()).fill_null(-1),
            "s": pa.nulls(n, pa.int64()).fill_null(-1),
            "chg": pa.nulls(n, pa.int64()).fill_null(0)})

    def chg_rows(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["event_type"], "purchase"))
        return pa.table({
            "k": pc.cast(t["user_id"], pa.int64()),
            "v": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                         pa.int64()),
            "t": pc.cast(t["ts"], pa.int64()),
            "s": pc.cast(t["event_id"], pa.int64()),
            "chg": pa.nulls(t.num_rows, pa.int64()).fill_null(1)})

    u = cust.map_batches(base_rows, batch_format="pyarrow") \
        .union(ev.map_batches(chg_rows, batch_format="pyarrow"))

    out_schema = pa.schema([("custkey", pa.int64()),
                            ("acctbal_c", pa.int64()),
                            ("n_updates", pa.int64())])

    def resolve(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["k"])
        t = b["t"].to_numpy(zero_copy_only=False)
        s = b["s"].to_numpy(zero_copy_only=False)
        chg = b["chg"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-s, -t, gid))  # per key: latest (t, s) first
        g_sorted = gid[order]
        first = np.flatnonzero(
            np.concatenate([[True], g_sorted[1:] != g_sorted[:-1]]))
        win = order[first]
        n_upd = np.add.reduceat(chg, starts)
        return pa.table({
            "custkey": pc.cast(b["k"], pa.int64()).take(pa.array(starts)),
            "acctbal_c": pc.cast(b["v"], pa.int64()).take(pa.array(win)),
            "n_updates": pa.array(n_upd)}, schema=out_schema)

    return sorted_group_apply(u, ["k"], resolve, 8).sort("custkey")


def _q_emb_label_coherence(sf_dir: str):
    """Embedding label coherence (similarity.label_coherence): exact
    intra- vs inter-label pairwise cosine sums in 1e-6 fixed point over
    the blocked all-pairs engine."""
    from .stages.similarity import label_coherence
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "label", "embedding"])
    return label_coherence(emb)


def _q_kg_graph_diameter(sf_dir: str):
    """Directed eccentricity profile of the tool digraph from the same
    min-plus APSP table: per node e(v) = max_u d(v,u), plus the graph's
    diameter (max e) and radius (min e) — the connectivity card next to
    the VoID stats. Reachable-pairs-only semantics (standard for
    digraphs that are not strongly connected)."""
    from .functions.datalog import apsp_min_plus
    from .functions.grouped import sorted_aggregate
    sp = apsp_min_plus(_tool_transition_edges(sf_dir), num_partitions=4)

    def fold(b: pa.Table) -> pa.Table:
        t = b.filter(pc.invert(pc.equal(b["src"], b["dst"])))
        return t.group_by(["src"], use_threads=False) \
            .aggregate([("d", "max")]).rename_columns(["node", "ecc"])

    ecc = sorted_aggregate(
        sp.map_batches(fold, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["node"], [("ecc", "max")], ["node", "ecc"], 4).to_pandas()
    return pa.table({
        "n_nodes": pa.array([len(ecc)], pa.int64()),
        "diameter": pa.array([int(ecc.ecc.max())], pa.int64()),
        "radius": pa.array([int(ecc.ecc.min())], pa.int64())})


def _q_kg_scc_tools(sf_dir: str):
    """Strongly connected components of the tool-transition digraph
    (edges = consecutive tool uses within a conversation). The edge
    derivation is the scale stage (_tool_transition_edges); the
    component labeling composes the existing path-doubling closure +
    ONE grouped count + ONE grouped min (functions/datalog.scc_labels)."""
    from .functions.datalog import scc_labels
    return scc_labels(_tool_transition_edges(sf_dir),
                      num_partitions=4).sort("node")


def _q_kg_harmonic_centrality(sf_dir: str):
    """Harmonic centrality over the tool-transition digraph: h(v) =
    Σ_{u reachable from v} 1/d(v,u) — the connectivity-robust closeness
    variant (Boldi & Vigna 2014, public). Distances come from
    functions/datalog.apsp_min_plus (min-plus path doubling, the
    distance-tracking sibling of the closure); each 1/d term rounds ONCE
    to int64 fixed point so the sum is order-independent. APSP is
    O(N²) pairs by definition — the op targets small DERIVED graphs
    (the tool digraph), like the SCC labeling it composes with."""
    from .functions.datalog import apsp_min_plus
    sp = apsp_min_plus(_tool_transition_edges(sf_dir), num_partitions=4)

    out_schema = pa.schema([("node", pa.string()),
                            ("n_reachable", pa.int64()),
                            ("harmonic_fp", pa.int64())])

    def fold(b: pa.Table) -> pa.Table:
        t = b.filter(pc.invert(pc.equal(b["src"], b["dst"])))
        if t.num_rows == 0:
            return out_schema.empty_table()
        d = t["d"].to_numpy(zero_copy_only=False)
        wt = np.round(1_000_000.0 / d).astype(np.int64)
        part = pa.table({"node": t["src"],
                         "one": pa.nulls(t.num_rows,
                                         pa.int64()).fill_null(1),
                         "h": pa.array(wt)})
        return part.group_by(["node"], use_threads=False) \
            .aggregate([("one", "sum"), ("h", "sum")]) \
            .rename_columns(["node", "n_reachable", "harmonic_fp"])

    from .functions.grouped import sorted_aggregate
    return sorted_aggregate(
        sp.map_batches(fold, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["node"], [("n_reachable", "sum"), ("harmonic_fp", "sum")],
        ["node", "n_reachable", "harmonic_fp"], 4).sort("node")


def _q_events_scd2(sf_dir: str):
    """CDC -> SCD2 validity intervals (relational.scd2_intervals):
    run-collapse + next-change close in ONE user-keyed sort."""
    from .pipelines.relational import scd2_intervals
    return scd2_intervals(sf_dir)


def _q_cq_response_latency(sf_dir: str):
    """Per-conversation user->assistant response latency: every user turn
    pairs with the NEXT assistant turn (by turn_idx) in its conversation;
    output (conv_id, n_pairs, sum_lat_us) in exact integers. ONE conv
    sort; in-block the next-match is a composed-key searchsorted (the
    events_error_recovery kernel) — no quadratic self-join."""
    from .functions.grouped import group_ids, sorted_group_apply

    t = _read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "role",
                                           "ts"])
    out_schema = pa.schema([("conv_id", pa.string()),
                            ("n_pairs", pa.int64()),
                            ("sum_lat_us", pa.int64())])

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["conv_id"])
        tidx = b["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = b["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        role = b["role"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((tidx, gid))
        g, ix, e, r = gid[order], tidx[order], ts[order], role[order]
        span = int(ix.max(initial=0)) + 2
        key = g * span + ix  # composed (conv, turn) key, strictly sorted
        a_mask = r == "assistant"
        a_key, a_ts, a_g = key[a_mask], e[a_mask], g[a_mask]
        u_mask = r == "user"
        pos = np.searchsorted(a_key, key[u_mask], side="right")
        ok = pos < len(a_key)
        pos_c = np.minimum(pos, max(len(a_key) - 1, 0))
        ok &= len(a_key) > 0
        if len(a_key):
            ok &= a_g[pos_c] == g[u_mask]
        lat = np.where(ok, (a_ts[pos_c] if len(a_key) else 0)
                       - e[u_mask], 0)
        ug = g[u_mask]
        n_groups = len(starts)
        n_pairs = np.zeros(n_groups, np.int64)
        np.add.at(n_pairs, ug[ok], 1)
        sums = np.zeros(n_groups, np.int64)
        np.add.at(sums, ug[ok], lat[ok])
        keep = n_pairs > 0
        convs = b["conv_id"].take(pa.array(starts))
        return pa.table({
            "conv_id": convs.filter(pa.array(keep)),
            "n_pairs": pa.array(n_pairs[keep], pa.int64()),
            "sum_lat_us": pa.array(sums[keep], pa.int64())},
            schema=out_schema)

    return sorted_group_apply(t, ["conv_id"], block, 8).sort("conv_id")


def _q_events_top_paths(sf_dir: str):
    """Top-k 3-step event-type journeys (relational.top_event_paths):
    trigram emission in sorted blocks, map-side count fold, tiny global
    sort."""
    from .pipelines.relational import top_event_paths
    return top_event_paths(sf_dir)


def _q_rel_pareto_abc(sf_dir: str):
    """Pareto/ABC revenue classes (relational.pareto_abc_customers):
    exact-integer cumulative-share thresholds on the distributed prefix
    scan."""
    from .pipelines.relational import pareto_abc_customers
    return pareto_abc_customers(sf_dir).sort(["rev_c", "o_custkey"],
                                             descending=[True, False])


BGP_FILTER_TOOLS = ("bash", "web_search")
BGP_FILTER_EXCL = "espresso"
PRED_CO_OCCURS = C.PROP + "coOccursWith"


def _mention_union_tri(sf_dir: str) -> ray.data.Dataset:
    """Structural + canonicalized-mention triples, the graph every
    mention-aware BGP query runs over. The actor-pool mention stage is
    materialized BEFORE unioning into the join/sort graph: two actor
    pools + a sort in ONE executor graph wedge at low CPU counts (see
    pipelines/kg.py:_stage and the verify skill note)."""
    from .pipelines.kg import load_config_tables
    from .stages import canonicalize as canon
    from .stages import extract, mentions
    fdir = _fx(sf_dir)
    alias_rows, vocab, *_ = load_config_tables(fdir)
    ts = _read_transcripts(sf_dir)
    m = canon.canonicalize_mentions(
        mentions.mention_triples(
            ts.select_columns(["conv_id", "turn_idx", "text"]), vocab),
        canon.build_canonical_map_local(alias_rows)).materialize()
    return extract.structural_triples(ts).union(m)


def _q_kg_bgp_filtered(sf_dir: str):
    """SPARQL FILTER + VALUES over the mention/tool BGP:
    {?t :mentions ?m . ?t :usesTool ?tool
     VALUES ?tool {bash web_search} FILTER(?m != :espresso)}
    -> DISTINCT (m, tool). Exercises the matcher's vectorized
    FILTER/VALUES masks."""
    from .functions.bgp import bgp_match
    return bgp_match(
        _mention_union_tri(sf_dir),
        [("?t", C.PRED_MENTIONS, "?m"),
         ("?t", C.PRED_USES_TOOL, "?tool")],
        ["m", "tool"], num_partitions=8,
        filters=[("m", "!=", C.ENT + "mention/" + BGP_FILTER_EXCL)],
        values={"tool": [C.ENT + "tool/" + t for t in BGP_FILTER_TOOLS]}) \
        .sort(["m", "tool"])


def _q_kg_bgp_union(sf_dir: str):
    """SPARQL UNION of two pattern groups:
    {?t :usesTool ?x . ?t :isPartOf ?c} UNION
    {?t :mentions ?x . ?t :isPartOf ?c} -> DISTINCT (c, x): every
    conversation paired with every tool-or-mention entity it touches.
    One zero-shuffle Dataset.union of the two binding streams, one
    shared distinct (functions/bgp.bgp_union)."""
    from .functions.bgp import bgp_union
    tri = _mention_union_tri(sf_dir)
    return bgp_union(
        tri,
        [[("?t", C.PRED_USES_TOOL, "?x"), ("?t", C.PRED_IS_PART_OF, "?c")],
         [("?t", C.PRED_MENTIONS, "?x"), ("?t", C.PRED_IS_PART_OF, "?c")]],
        ["c", "x"], num_partitions=8).sort(["c", "x"])


def _q_kg_bgp_minus(sf_dir: str):
    """SPARQL MINUS (anti-join mode of functions/bgp.cogroup_join):
    {?t :mentions ?m . MINUS {?t :usesTool :tool/bash}} -> DISTINCT
    (t, m): mention edges on turns that did NOT use the bash tool."""
    from .functions.bgp import bgp_match
    return bgp_match(
        _mention_union_tri(sf_dir),
        [("?t", C.PRED_MENTIONS, "?m")],
        ["t", "m"], num_partitions=8,
        minus_patterns=[("?t", C.PRED_USES_TOOL, C.ENT + "tool/bash")]) \
        .sort(["t", "m"])


def _q_kg_bgp_path(sf_dir: str):
    """SPARQL property path (functions/bgp.expand_paths): ?c
    ^schema:isPartOf/prop:usesTool ?tool — inverse step then sequence
    step, rewritten statically to a two-pattern chain with a fresh
    intermediate variable. Semantically identical to kg_bgp_conv_tools;
    this entry proves the path machinery produces the same rows."""
    from .functions.bgp import bgp_match
    from .stages import extract
    tri = extract.structural_triples(_read_transcripts(sf_dir))
    return bgp_match(
        tri, [("?c", ("^" + C.PRED_IS_PART_OF, C.PRED_USES_TOOL), "?tool")],
        ["c", "tool"], num_partitions=8).sort(["c", "tool"])


def _q_kg_bgp_alt(sf_dir: str):
    """SPARQL alternation path p|q: {?t (:mentions|:usesTool) ?x} ->
    DISTINCT (t, x). The alternation compiles to ONE scan with an is_in
    predicate filter — no union, no second pass over the triples."""
    from .functions.bgp import bgp_match
    return bgp_match(
        _mention_union_tri(sf_dir),
        [("?t", C.PRED_MENTIONS + "|" + C.PRED_USES_TOOL, "?x")],
        ["t", "x"], num_partitions=8).sort(["t", "x"])


def _q_kg_construct_cooccurs(sf_dir: str):
    """SPARQL CONSTRUCT (functions/bgp.bgp_construct): derive
    {?m prop:coOccursWith ?tool} from {?t :mentions ?m . ?t :usesTool
    ?tool} — materialized co-occurrence edges as new graph triples,
    the generic derived-triple operator (the reference derives edges
    while building, Code/CompetencyQuestions/Yelp_CQ.md queries them)."""
    from .functions.bgp import bgp_construct
    return bgp_construct(
        _mention_union_tri(sf_dir),
        [("?t", C.PRED_MENTIONS, "?m"), ("?t", C.PRED_USES_TOOL, "?tool")],
        [("?m", PRED_CO_OCCURS, "?tool")],
        num_partitions=8).sort(["subj", "obj"])


def _q_kg_sparql_group_agg(sf_dir: str):
    """SPARQL aggregate over BGP bindings: SELECT ?tool (COUNT(DISTINCT
    ?m) AS n_mentions) WHERE {?t :mentions ?m . ?t :usesTool ?tool}
    GROUP BY ?tool — the matcher's distinct (m, tool) bindings feed one
    grouped count, the same partial-then-shuffle aggregate every CQ
    uses."""
    from .functions.bgp import bgp_match
    from .functions.grouped import grouped_count
    dd = bgp_match(
        _mention_union_tri(sf_dir),
        [("?t", C.PRED_MENTIONS, "?m"), ("?t", C.PRED_USES_TOOL, "?tool")],
        ["m", "tool"], num_partitions=8)
    return grouped_count(dd, ["tool"], "n_mentions", 8).sort("tool")


def _q_kg_sparql_having(sf_dir: str):
    """SPARQL HAVING over a BGP aggregate: SELECT ?m (COUNT(?t) AS n)
    WHERE {?t :mentions ?m} GROUP BY ?m HAVING (?n·128 >= total_turns)
    — prevalent entities, mentioned in >= 1/128 of all turns. The
    threshold is scale-RELATIVE in exact integers (a constant cut can't
    be non-vacuous at every corpus size; 1/128 cuts inside the observed
    prevalence band at both driver scales), completing the GROUP BY /
    GROUP_CONCAT / ORDER / LIMIT modifier family; the filter runs
    vectorized on the tiny aggregate, never the bindings."""
    from .functions.bgp import bgp_match
    from .functions.grouped import grouped_count
    total = _read_transcripts(sf_dir, columns=["conv_id"]).count()
    dd = bgp_match(_mention_union_tri(sf_dir),
                   [("?t", C.PRED_MENTIONS, "?m")],
                   ["t", "m"], num_partitions=8)

    def having(b: pa.Table) -> pa.Table:
        n = b["n_turns"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(n * 128 >= total))

    return grouped_count(dd, ["m"], "n_turns", 8) \
        .map_batches(having, batch_format="pyarrow",
                     zero_copy_batch=True).sort("m")


def _q_kg_adamic_adar(sf_dir: str):
    """Adamic–Adar link prediction over the turn->mention incidence
    (functions/nodesim.adamic_adar_pairs): shared low-degree turns weigh
    more than hub turns; exact int64 fixed point (weight rounded once per
    witness, integer sums) so the score is summation-order-independent."""
    from .functions.nodesim import adamic_adar_pairs
    pre = C.ENT + "mention/"
    m = _q_mentions(sf_dir).map_batches(
        lambda b: pa.table({
            "w": b["subj"],
            "x": pc.utf8_slice_codeunits(b["obj"], len(pre))}),
        batch_format="pyarrow")
    return adamic_adar_pairs(m, num_partitions=8)


def _q_events_entropy(sf_dir: str):
    """Grouped Shannon entropy of each user's event-type distribution:
    H = ln(n) - Σ c·ln(c)/n from exact integer counts (both engines see
    identical integers; the ln happens once per user). Low entropy =
    single-behavior user, high = diverse — the behavioral-diversity twin
    of the Gini operator."""
    from .functions.grouped import group_ids, grouped_count, \
        sorted_group_apply
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "event_type"])
    counts = grouped_count(ev, ["user_id", "event_type"], "c", 8)
    out_schema = pa.schema([("user_id", pa.int64()),
                            ("n_events", pa.int64()),
                            ("n_types", pa.int64()),
                            ("entropy", pa.float64())])

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["user_id"])
        c = b["c"].to_numpy().astype(np.int64)
        n_types = np.diff(np.append(starts, len(gid))).astype(np.int64)
        n = np.add.reduceat(c, starts)
        clnc = np.add.reduceat(c * np.log(c), starts)
        ent = np.log(n) - clnc / n
        keys = pc.cast(b["user_id"], pa.int64()).take(pa.array(starts))
        return pa.table({"user_id": keys, "n_events": pa.array(n),
                         "n_types": pa.array(n_types),
                         "entropy": pa.array(ent)}, schema=out_schema)

    return sorted_group_apply(counts, ["user_id"], block, 8) \
        .sort("user_id")


def _q_text_pmi_bigrams(sf_dir: str):
    """PMI collocations (stages/textstats.pmi_bigrams): adjacent-word
    bigrams scored against corpus unigram frequencies."""
    from .stages.textstats import pmi_bigrams
    return pmi_bigrams(_docs(sf_dir))


def _q_rel_above_avg(sf_dir: str):
    """Correlated-subquery decorrelation (relational.above_avg_orders):
    orders above the customer's OWN average, one shuffle, exact cents."""
    from .pipelines.relational import above_avg_orders
    return above_avg_orders(sf_dir)


def _q_dedup_prefix(sf_dir: str):
    """Truncation duplicates (stages/dedup.prefix_duplicates): docs whose
    text is a prefix of (or equal to) another doc's — sort-adjacency
    exact, one all-to-all plus O(#blocks) boundary stitching."""
    from .stages.dedup import prefix_duplicates
    return prefix_duplicates(_docs(sf_dir), num_partitions=8)


def _q_rel_tpch_q18(sf_dir: str):
    """TPC-H Q18 large-volume customers (relational.tpch_q18): one
    quantity-sum shuffle, HAVING-filtered hot set broadcast, customer
    dimension broadcast — no second all-to-all."""
    from .pipelines.relational import tpch_q18
    return tpch_q18(sf_dir)


def _q_events_chi2(sf_dir: str):
    """Chi-square test of independence, event_type x ISO weekday: the
    contingency table reduces via one grouped count (tiny result); the
    statistic uses chi2 = N·Σ o²/(r·c) − N, which needs only OBSERVED
    cells (zero-observed cells contribute nothing to Σo²/e), so neither
    engine must densify the table. dof = (#types−1)·(#dows−1)."""
    from .functions.grouped import grouped_count
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "ts"])

    def dow(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b["event_type"],
                         "dow": pc.cast(pc.add(pc.day_of_week(b["ts"]), 1),
                                        pa.int64())})

    cells = grouped_count(ev.map_batches(dow, batch_format="pyarrow"),
                          ["event_type", "dow"], "n", 4).to_pandas()
    r = cells.groupby("event_type")["n"].sum()
    c = cells.groupby("dow")["n"].sum()
    tot = int(cells["n"].sum())
    e = (r[cells["event_type"]].to_numpy().astype(np.float64) *
         c[cells["dow"]].to_numpy().astype(np.float64))
    chi2 = tot * float((cells["n"].to_numpy().astype(np.float64) ** 2
                        / e).sum()) - tot
    return pa.table({"n": pa.array([tot], pa.int64()),
                     "dof": pa.array([(len(r) - 1) * (len(c) - 1)],
                                     pa.int64()),
                     "chi2": pa.array([chi2], pa.float64())})


def _q_kg_assortativity(sf_dir: str):
    """Degree assortativity of the co-mention graph (Newman 2002,
    public): Pearson correlation of endpoint degrees over the
    symmetrized edge list. All five moment sums are exact int64 over
    integer degrees (one constant-key aggregate); the single float
    division happens once on the driver. Positive r = hubs link hubs."""
    from .functions.grouped import grouped_count, sorted_aggregate
    from .functions.joins import attach_column
    from .functions.triangles import within_group_pairs
    pre = C.ENT + "mention/"
    m = _q_mentions(sf_dir).map_batches(
        lambda b: pa.table({
            "turn": b["subj"],
            "c": pc.utf8_slice_codeunits(b["obj"], len(pre))}),
        batch_format="pyarrow")
    edges = within_group_pairs(m, "turn", "c")

    def undirect(b: pa.Table) -> pa.Table:
        return pa.table({
            "u": pa.concat_arrays([b["u"].combine_chunks(),
                                   b["v"].combine_chunks()]),
            "v": pa.concat_arrays([b["v"].combine_chunks(),
                                   b["u"].combine_chunks()])})

    und = edges.map_batches(undirect, batch_format="pyarrow")
    deg = grouped_count(und, ["u"], "d", 8)
    with_du = attach_column(
        und, deg, [("u", pa.string()), ("v", pa.string())],
        "u", "u", "d", "x", pa.int64(), 8, key_type=pa.string())
    with_dv = attach_column(
        with_du, deg,
        [("u", pa.string()), ("v", pa.string()), ("x", pa.int64())],
        "v", "u", "d", "y", pa.int64(), 8, key_type=pa.string())

    def moments(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy()
        y = b["y"].to_numpy()
        return pa.table({"__g": pa.array([0], pa.int64()),
                         "m2": pa.array([len(x)], pa.int64()),
                         "sx": pa.array([int(x.sum())], pa.int64()),
                         "sxy": pa.array([int((x * y).sum())], pa.int64()),
                         "sx2": pa.array([int((x * x).sum())], pa.int64())})

    s = sorted_aggregate(
        with_dv.map_batches(moments, batch_format="pyarrow"),
        ["__g"], [("m2", "sum"), ("sx", "sum"), ("sxy", "sum"),
                  ("sx2", "sum")],
        ["__g", "m2", "sx", "sxy", "sx2"], 1).to_pandas()
    m2, sx, sxy, sx2 = (int(s["m2"][0]), int(s["sx"][0]),
                        int(s["sxy"][0]), int(s["sx2"][0]))
    den = m2 * sx2 - sx * sx
    # zero degree variance (e.g. a complete or regular graph) leaves r
    # undefined; both engines pin it to 0.0 by convention
    r = (m2 * sxy - sx * sx) / den if den else 0.0
    return pa.table({"n_edges": pa.array([m2 // 2], pa.int64()),
                     "r": pa.array([r], pa.float64())})


ASK_TOOL_TRUE = "bash"
ASK_TOOL_FALSE = "zzz_never_a_tool"
DESCRIBE_NODE_TOOL = "bash"


def _q_kg_describe(sf_dir: str):
    """SPARQL DESCRIBE (the fourth verb next to SELECT/ASK/CONSTRUCT):
    every triple whose subject OR object is the node — one vectorized
    mask pass over the streaming triple scan, no join. Returns the
    node's full star: its rdf:type plus every usesTool edge into it."""
    node = C.ENT + "tool/" + DESCRIBE_NODE_TOOL

    def star(b: pa.Table) -> pa.Table:
        m = pc.or_(pc.equal(b["subj"], node), pc.equal(b["obj"], node))
        t = b.filter(m)
        return pa.table({"subj": t["subj"], "pred": t["pred"],
                         "obj": t["obj"]})

    # the raw stream repeats e.g. the tool's rdf:type once per using
    # turn — DESCRIBE is a graph (set) view, so dedup the filtered star
    from .functions.pagerank import _distinct
    return _distinct(
        _mention_union_tri(sf_dir).map_batches(
            star, batch_format="pyarrow", zero_copy_batch=True),
        ["subj", "pred", "obj"], 4).sort(["subj", "pred", "obj"])


def _q_events_ab_test(sf_dir: str):
    """Two-proportion z-test over a deterministic A/B split (arm =
    user_id % 2; conversion = the user made MORE purchase events than
    view events — "any purchase" saturates to p=1 on this corpus, which
    degenerates the test): z = (p1-p0)/sqrt(p̂(1-p̂)(1/n0+1/n1)). The
    per-user fold is ONE grouped sum pair; the four counts are exact
    integers, the single float happens once on the driver — the
    experiment-analysis primitive next to the KS / Mann-Whitney drift
    tests. Zero pooled variance pins z to 0.0 on both engines."""
    import math

    from .functions.grouped import sorted_aggregate
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "event_type"])

    def flags(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "np": pc.cast(pc.equal(b["event_type"], "purchase"),
                          pa.int64()),
            "nv": pc.cast(pc.equal(b["event_type"], "view"), pa.int64())})

    users = sorted_aggregate(
        ev.map_batches(flags, batch_format="pyarrow"),
        ["user_id"], [("np", "sum"), ("nv", "sum")],
        ["user_id", "np", "nv"], 4).to_pandas()
    arm = users["user_id"].to_numpy() % 2
    conv = (users["np"].to_numpy() > users["nv"].to_numpy()) \
        .astype(np.int64)
    n0, n1 = int((arm == 0).sum()), int((arm == 1).sum())
    c0, c1 = int(conv[arm == 0].sum()), int(conv[arm == 1].sum())
    p = (c0 + c1) / (n0 + n1)
    se = math.sqrt(p * (1 - p) * (1 / n0 + 1 / n1))
    z = (c1 / n1 - c0 / n0) / se if se else 0.0
    return pa.table({"n_a": pa.array([n0], pa.int64()),
                     "n_b": pa.array([n1], pa.int64()),
                     "conv_a": pa.array([c0], pa.int64()),
                     "conv_b": pa.array([c1], pa.int64()),
                     "z": pa.array([z], pa.float64())})


def _q_dedup_suffix(sf_dir: str):
    """Head-truncation duplicates (stages/dedup.suffix_duplicates): the
    reversed-text twin of dedup_prefix."""
    from .stages.dedup import suffix_duplicates
    df = suffix_duplicates(_docs(sf_dir), num_partitions=8).to_pandas()
    if df.empty:  # an empty Dataset loses its schema through sort
        import pandas as pd
        df = pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    return df


ZIPF_TOP = 100


def _q_kg_group_concat(sf_dir: str):
    """SPARQL GROUP_CONCAT over BGP bindings: per tool, the sorted
    comma-joined list of co-occurring mention canonicals (plus the
    count) — the order-sensitive string aggregate (collect_list class)
    the engine lacked. The matcher's distinct (m, tool) bindings are
    already deduped, so one key sort colocates each tool's mentions and
    the per-group join is deterministic via an in-block value sort."""
    from .functions.bgp import bgp_match
    from .functions.grouped import group_ids, sorted_group_apply
    pre = C.ENT + "mention/"
    dd = bgp_match(
        _mention_union_tri(sf_dir),
        [("?t", C.PRED_MENTIONS, "?m"), ("?t", C.PRED_USES_TOOL, "?tool")],
        ["m", "tool"], num_partitions=8)

    def strip(b: pa.Table) -> pa.Table:
        return pa.table({"tool": b["tool"],
                         "m": pc.utf8_slice_codeunits(b["m"], len(pre))})

    out_schema = pa.schema([("tool", pa.string()),
                            ("mentions_csv", pa.string()),
                            ("n_mentions", pa.int64())])

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["tool"])
        m = b["m"].to_numpy(zero_copy_only=False)
        bounds = np.append(starts, len(gid))
        csv = [",".join(sorted(m[s:e]))
               for s, e in zip(bounds[:-1], bounds[1:])]
        return pa.table({
            "tool": b["tool"].take(pa.array(starts)),
            "mentions_csv": pa.array(csv, pa.string()),
            "n_mentions": pa.array(np.diff(bounds))}, schema=out_schema)

    return sorted_group_apply(
        dd.map_batches(strip, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["tool"], block, 8).sort("tool")


DELTA_MOD = 10


def _q_kg_bgp_transitive(sf_dir: str):
    """SPARQL p+ transitive property path ({?c rdfs:subClassOf+ ?root}):
    the scan runs over the distributed path-doubling closure of the
    subClassOf edges (functions/bgp._scan plus-mode), so one-or-more
    paths compose with every other pattern. Triples come straight from
    the ontology fixture — the same edges the flagship's enrichment
    materializes."""
    import pyarrow.parquet as pq

    from .functions.bgp import bgp_match
    fdir = _fx(sf_dir)
    th = pq.read_table(f"{fdir}/type_hierarchy.parquet")
    pre = C.ENT + "type/"
    tri = ray.data.from_arrow(pa.table({
        "subj": pc.binary_join_element_wise(
            pa.nulls(th.num_rows, pa.string()).fill_null(pre),
            pc.cast(th["type_id"], pa.string()), ""),
        "pred": pa.nulls(th.num_rows,
                         pa.string()).fill_null(C.RDFS_SUBCLASS_OF),
        "obj": pc.binary_join_element_wise(
            pa.nulls(th.num_rows, pa.string()).fill_null(pre),
            pc.cast(th["super_type_id"], pa.string()), "")}))
    return bgp_match(tri, [("?c", C.RDFS_SUBCLASS_OF + "+", "?root")],
                     ["c", "root"], num_partitions=4).sort(["c", "root"])


SPARQL_TOPK = 10


def _q_dedup_keep_best(sf_dir: str):
    """Survivor selection per near-dup cluster (dedup.dedup_keep_best):
    keep the LONGEST doc (tie: lowest id) instead of the arbitrary
    first — the curation policy layer on top of the canonical map."""
    from .stages.dedup import dedup_keep_best, minhash_lsh_pairs
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"])
    return dedup_keep_best(docs, minhash_lsh_pairs(_docs(sf_dir)))


def _q_kg_void_stats(sf_dir: str):
    """VoID-style per-predicate dataset profile (W3C VoID property
    partitions, public): for every predicate of the distinct graph,
    (n_triples, n_distinct_subj, n_distinct_obj) — the schema-statistics
    card a KG publishes and a query planner feeds on. One graph distinct,
    then three dictionary-sized grouped counts; the per-pred tables are
    #preds rows and merge on the driver."""
    from .functions.grouped import grouped_count
    from .functions.pagerank import _distinct
    tri = _distinct(_mention_union_tri(sf_dir).map_batches(
        lambda b: b.select(["subj", "pred", "obj"]),
        batch_format="pyarrow", zero_copy_batch=True),
        ["subj", "pred", "obj"], 8).materialize()
    nt = grouped_count(tri, ["pred"], "n_triples", 4).to_pandas()
    ns = grouped_count(
        _distinct(tri, ["pred", "subj"], 8), ["pred"], "n_subj", 4) \
        .to_pandas()
    no = grouped_count(
        _distinct(tri, ["pred", "obj"], 8), ["pred"], "n_obj", 4) \
        .to_pandas()
    df = nt.merge(ns, on="pred").merge(no, on="pred") \
        .sort_values("pred").reset_index(drop=True)
    return df


def _q_rel_tpch_q6(sf_dir: str):
    """TPC-H Q6 (relational.tpch_q6): one filtered scan, map-side fold,
    exact cents x discount-percent integer revenue."""
    from .pipelines.relational import tpch_q6
    return tpch_q6(sf_dir)


def _q_rel_tpch_q14(sf_dir: str):
    """TPC-H Q14 (relational.tpch_q14): 200-row part dim broadcast,
    promo revenue share from two integer sums."""
    from .pipelines.relational import tpch_q14
    return tpch_q14(sf_dir)


def _q_rel_tpch_q19(sf_dir: str):
    """TPC-H Q19 (relational.tpch_q19): disjunctive (brand, size, qty)
    predicate arms over the broadcast part attributes, map-side fold."""
    from .pipelines.relational import tpch_q19
    return tpch_q19(sf_dir)


SYSTEMATIC_K = 7


def _q_sample_systematic(sf_dir: str):
    """Systematic (every k-th) sampling in deterministic hash order:
    rank docs by u01(splitmix64(doc_id)) — the same bit-exact priority
    the budget sampler uses — and keep rank % 7 == 0. Equal-probability
    without a global shuffle of the corpus: ONE priority sort of
    (doc_id, u01) pairs + the distributed zipWithIndex rank."""
    from .functions.joins import zip_with_index
    from .functions.sampling import hash_u01
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def prio(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(b["doc_id"], pa.int64()),
                         "u01": pa.array(hash_u01(b["doc_id"]))})

    ranked = zip_with_index(
        docs.map_batches(prio, batch_format="pyarrow",
                         zero_copy_batch=True)
        .repartition(8).sort("u01"),
        id_col="rk", order_by="u01")
    def keep(b: pa.Table) -> pa.Table:
        rk = b["rk"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(rk % SYSTEMATIC_K == 0)) \
            .select(["doc_id"])

    return ranked.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True).sort("doc_id")


def _q_rel_tpch_q10(sf_dir: str):
    """TPC-H Q10 (relational.tpch_q10): returned-item revenue per
    customer through the DISTRIBUTED co-group attach (orders never
    broadcast), exact integer revenue."""
    from .pipelines.relational import tpch_q10
    return tpch_q10(sf_dir)


def _q_rel_fk_audit(sf_dir: str):
    """Referential-integrity audit (relational.fk_integrity_audit):
    per FK relation, child rows / distinct keys / orphans, all map-side
    folds + one tiny keyed reduce."""
    from .pipelines.relational import fk_integrity_audit
    return fk_integrity_audit(sf_dir)


def _q_rel_tpch_q4(sf_dir: str):
    """TPC-H Q4 analog (pipelines/tpch.tpch_q4): EXISTS semi-join via a
    distinct-key co-group attach; 'late line' adapted to returnflag='R'
    (testdata has no commit/receipt dates)."""
    from .pipelines.tpch import tpch_q4
    return tpch_q4(sf_dir)


def _q_rel_tpch_q12(sf_dir: str):
    """TPC-H Q12 analog (pipelines/tpch.tpch_q12): priority split per
    returnflag through the distributed lineitem⋈orders attach."""
    from .pipelines.tpch import tpch_q12
    return tpch_q12(sf_dir)


def _q_rel_tpch_q13(sf_dir: str):
    """TPC-H Q13 analog (pipelines/tpch.tpch_q13): order-count
    distribution with a metadata-derived zero bucket (no outer join)."""
    from .pipelines.tpch import tpch_q13
    return tpch_q13(sf_dir)


def _q_rel_tpch_q7(sf_dir: str):
    """TPC-H Q7 (pipelines/tpch.tpch_q7): two-nation shipping volume —
    broadcast nation probes + ONE big×big co-group attach."""
    from .pipelines.tpch import tpch_q7
    df = tpch_q7(sf_dir).to_pandas()
    if df.empty:  # an empty Dataset loses its schema through sort
        import pandas as pd
        df = pd.DataFrame({"supp_nation": pd.Series(dtype=object),
                           "cust_nation": pd.Series(dtype=object),
                           "l_year": pd.Series(dtype="int64"),
                           "revenue_c2": pd.Series(dtype="int64")})
    return df


def _q_rel_tpch_q8(sf_dir: str):
    """TPC-H Q8 (pipelines/tpch.tpch_q8): national market share via a
    packed (custkey, year) single-attach; share ratio from exact ints."""
    from .pipelines.tpch import tpch_q8
    return tpch_q8(sf_dir)


def _q_rel_tpch_q9(sf_dir: str):
    """TPC-H Q9 analog (pipelines/tpch.tpch_q9): profit per (nation,
    order-year); supply cost adapted to p_retailprice (no partsupp)."""
    from .pipelines.tpch import tpch_q9
    return tpch_q9(sf_dir)


def _q_rel_tpch_q11(sf_dir: str):
    """TPC-H Q11 analog (pipelines/tpch.tpch_q11): mean-relative
    important-stock cut (val·n > 2·total) in exact integer algebra."""
    from .pipelines.tpch import tpch_q11
    return tpch_q11(sf_dir)


def _q_rel_tpch_q15(sf_dir: str):
    """TPC-H Q15 (pipelines/tpch.tpch_q15): top supplier(s) by exact
    integer quarter revenue — the correlated MAX subquery."""
    from .pipelines.tpch import tpch_q15
    return tpch_q15(sf_dir)


def _q_rel_tpch_q16(sf_dir: str):
    """TPC-H Q16 analog (pipelines/tpch.tpch_q16): distinct-supplier
    counts per part attribute triple with brand/acctbal exclusions."""
    from .pipelines.tpch import tpch_q16
    return tpch_q16(sf_dir)


def _q_rel_tpch_q2(sf_dir: str):
    """TPC-H Q2 analog (pipelines/tpch.tpch_q2): argmin supplier per
    part over shipped distinct pairs (acctbal stands in for supplycost,
    no partsupp)."""
    from .pipelines.tpch import tpch_q2
    return tpch_q2(sf_dir)


def _q_rel_tpch_q20(sf_dir: str):
    """TPC-H Q20 analog (pipelines/tpch.tpch_q20): suppliers shipping
    more than half a PROMO part's 1996 volume — nested-aggregate semi."""
    from .pipelines.tpch import tpch_q20
    return tpch_q20(sf_dir)


def _q_rel_tpch_q21(sf_dir: str):
    """TPC-H Q21 analog (pipelines/tpch.tpch_q21): per-order
    EXISTS/NOT-EXISTS waiting-supplier detection via in-block reduceat."""
    from .pipelines.tpch import tpch_q21
    return tpch_q21(sf_dir)


def _q_rel_tpch_q22(sf_dir: str):
    """TPC-H Q22 analog (pipelines/tpch.tpch_q22): above-average balances
    with no recent orders, per country code (nationkey mod 10)."""
    from .pipelines.tpch import tpch_q22
    return tpch_q22(sf_dir)


def _q_curation_profile(sf_dir: str):
    """Column-level data profile of orders (curation.profile_columns):
    rows/nulls/exact-distinct/min-max per column, one scan + one
    distinct-value exchange."""
    from .pipelines.curation import profile_columns
    return profile_columns(sf_dir)


def _profile_sql() -> str:
    from .pipelines.curation import ORDERS_PROFILE_SPEC
    sels = []
    for c, kind in ORDERS_PROFILE_SPEC:
        if kind == "int":
            lo, hi = f"CAST(min({c}) AS BIGINT)", f"CAST(max({c}) AS BIGINT)"
            ls, hs = "''", "''"
        elif kind == "money":
            enc = f"CAST(round({c} * 100) AS BIGINT)"
            lo, hi = f"min({enc})", f"max({enc})"
            ls, hs = "''", "''"
        elif kind == "ts":
            lo, hi = f"min(epoch_us({c}))", f"max(epoch_us({c}))"
            ls, hs = "''", "''"
        else:
            lo, hi = "CAST(0 AS BIGINT)", "CAST(0 AS BIGINT)"
            ls, hs = f"min({c})", f"max({c})"
        sels.append(f"""
            SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
                   CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
                   {lo} AS min_num, {hi} AS max_num,
                   {ls} AS min_str, {hs} AS max_str
            FROM orders""")
    return " UNION ALL ".join(sels)


def _q_curation_benford(sf_dir: str):
    """Benford first-digit audit of o_totalprice (curation.benford_audit):
    exact integer permille vs the hardcoded Benford table."""
    from .pipelines.curation import benford_audit
    return benford_audit(sf_dir)


def _benford_sql() -> str:
    from .pipelines.curation import BENFORD_PERMILLE
    case = " ".join(f"WHEN {i + 1} THEN {p}"
                    for i, p in enumerate(BENFORD_PERMILLE))
    return f"""
        WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
                        AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
                   FROM orders),
        c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
              FROM d GROUP BY 1),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        SELECT digit, n,
               CAST(n * 1000 // total AS BIGINT) AS observed_permille,
               CAST(CASE digit {case} ELSE 0 END AS BIGINT)
                 AS expected_permille
        FROM c, t ORDER BY digit"""


def _q_rel_corr_matrix(sf_dir: str):
    """Pairwise Pearson correlation matrix over lineitem measures
    (relational.correlation_matrix): exact integer moments per pair, one
    |pairs|-row exchange; zero variance pins corr = 0."""
    from .pipelines.relational import correlation_matrix
    return correlation_matrix(sf_dir)


def _corr_matrix_sql() -> str:
    from .pipelines.relational import CORR_MEASURES
    enc = []
    for n, col, factor in CORR_MEASURES:
        if factor == 0.01:
            enc.append(f"CAST(floor({col}) AS BIGINT) AS {n}")
        elif factor == 1.0:
            enc.append(f"CAST(round({col}) AS BIGINT) AS {n}")
        else:
            enc.append(f"CAST(round({col} * {int(factor)}) AS BIGINT)"
                       f" AS {n}")
    names = [n for n, _, _ in CORR_MEASURES]
    sels = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            x, y = names[i], names[j]
            sels.append(f"""
              SELECT '{x}' AS var_x, '{y}' AS var_y,
                     CAST(n AS BIGINT) AS n,
                     CAST(n * sxy - sx * sy AS BIGINT) AS cov_n2,
                     CAST(n * sxx - sx * sx AS BIGINT) AS varx_n2,
                     CAST(n * syy - sy * sy AS BIGINT) AS vary_n2,
                     CASE WHEN n * sxx - sx * sx > 0
                           AND n * syy - sy * sy > 0
                          THEN CAST(n * sxy - sx * sy AS DOUBLE)
                               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                      * CAST(n * syy - sy * sy
                                             AS DOUBLE))
                          ELSE 0.0 END AS corr
              FROM (SELECT CAST(count(*) AS HUGEINT) AS n,
                           sum(CAST({x} AS HUGEINT)) AS sx,
                           sum(CAST({y} AS HUGEINT)) AS sy,
                           sum(CAST({x} AS HUGEINT)
                               * CAST({y} AS HUGEINT)) AS sxy,
                           sum(CAST({x} AS HUGEINT)
                               * CAST({x} AS HUGEINT)) AS sxx,
                           sum(CAST({y} AS HUGEINT)
                               * CAST({y} AS HUGEINT)) AS syy
                    FROM m)""")
    return ("WITH m AS (SELECT " + ", ".join(enc) + " FROM lineitem) "
            + " UNION ALL ".join(sels))


def _q_text_readability(sf_dir: str):
    """Flesch-style readability per document (textstats.readability_stats):
    vectorized RE2 count kernels, exact integer milli-point score."""
    from .stages.textstats import readability_stats
    import ray.data
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return readability_stats(docs).sort("doc_id")


def _q_rel_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS (relational.lineitem_grouping_sets):
    arbitrary set list off one finest-level shuffle, GROUPING_ID
    bitmask per row."""
    from .pipelines.relational import lineitem_grouping_sets
    return lineitem_grouping_sets(sf_dir)


def _grouping_sets_sql() -> str:
    from .pipelines.relational import GROUPING_SETS
    dims = ["l_returnflag", "l_linestatus", "l_year"]
    sels = []
    for keys in GROUPING_SETS:
        gid = sum(1 << (len(dims) - 1 - i)
                  for i, d in enumerate(dims) if d not in keys)
        proj = []
        for d in dims:
            if d in keys:
                proj.append(d)
            elif d == "l_year":
                proj.append("CAST(NULL AS BIGINT) AS l_year")
            else:
                proj.append(f"CAST(NULL AS VARCHAR) AS {d}")
        group = (f"GROUP BY {', '.join(k for k in keys)}" if keys else "")
        sels.append(f"""
            SELECT {', '.join(proj)},
                   CAST({gid} AS BIGINT) AS grouping_id,
                   CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM m {group}""")
    return ("""WITH m AS (SELECT l_returnflag, l_linestatus,
                       CAST(year(l_shipdate) AS BIGINT) AS l_year,
                       CAST(round(l_quantity * 100) AS BIGINT) AS qty_c
                FROM lineitem) """
            + " UNION ALL ".join(sels))


def _q_text_hash_features(sf_dir: str):
    """Feature-hashing vectorizer (textstats.hash_features): k-dim hashed
    token counts, long-form (doc_id, bucket, cnt); md5-bucket hash shared
    with the SQL twin."""
    from .stages.textstats import hash_features
    import ray.data
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return hash_features(docs)


def _q_events_bootstrap(sf_dir: str):
    """Deterministic Poisson bootstrap of the mean event value
    (relational.bootstrap_means): B replicates from one scan, splitmix
    weights, exact integer (n_eff, sum) pairs per replicate."""
    from .pipelines.relational import bootstrap_means
    return bootstrap_means(sf_dir)


def _bootstrap_sql() -> str:
    from .functions.sampling import splitmix64
    from .pipelines.relational import BOOTSTRAP_B, POISSON1_CDF_PPB
    import numpy as np
    seeds = ", ".join(
        f"({b}, CAST('{int(splitmix64(np.array([b + 1], np.uint64))[0])}'"
        " AS UBIGINT))" for b in range(BOOTSTRAP_B))
    wsum = " + ".join(f"(CASE WHEN u >= {t} THEN 1 ELSE 0 END)"
                      for t in POISSON1_CDF_PPB)
    return f"""
        WITH seeds(rep, s) AS (VALUES {seeds}),
        base AS (SELECT seeds.rep AS rep,
                        xor(CAST(event_id AS UBIGINT), s) AS kx,
                        CAST(round(value * 100) AS BIGINT) AS vc
                 FROM events CROSS JOIN seeds),
        {_splitmix_cte('base', 'kx', 'rep, vc')},
        pp AS (SELECT rep, vc,
                      CAST(floor(u01 * 1000000000) AS BIGINT) AS u
               FROM u),
        wt AS (SELECT rep, vc, {wsum} AS w FROM pp)
        SELECT rep AS b, CAST(sum(w) AS BIGINT) AS n_eff,
               CAST(sum(w * vc) AS BIGINT) AS sum_vc,
               CASE WHEN sum(w) > 0
                    THEN 1.0 * sum(w * vc) / sum(w) ELSE 0.0 END
                 AS mean_c
        FROM wt GROUP BY 1 ORDER BY 1"""


def _q_search_postings(sf_dir: str):
    """Inverted-index construction (search.build_postings): top-df terms
    with numerically-sorted posting lists."""
    from .stages.search import build_postings
    docs = ray.data.read_parquet(os.path.join(sf_dir,
                                              "documents.parquet"),
                                 columns=["doc_id", "text"])
    return build_postings(docs)


def _q_approx_overlap(sf_dir: str):
    """HLL set-operation estimation (inclusion-exclusion): register
    tables for A = 1996-active custkeys, B = 1997-active, and A∪B
    (max-merge — the mergeability that makes HLL the sketch for
    cross-partition set ops). |A∩B| ≈ E(a)+E(b)−E(u) on the driver; the
    SKETCHES are exact and hash-gated (side, register, max_rank)."""
    from .functions.hll import hll_registers
    from .functions.grouped import sorted_aggregate

    def year_keys(yrs):
        def f(b: pa.Table) -> pa.Table:
            yr = pc.year(b["o_orderdate"])
            m = pc.is_in(pc.cast(yr, pa.int64()),
                         value_set=pa.array(list(yrs), pa.int64()))
            return b.filter(m).select(["o_custkey"])
        return f

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"])
    out = []
    for side, yrs in (("a", (1996,)), ("b", (1997,)),
                      ("u", (1996, 1997))):
        regs = hll_registers(
            orders.map_batches(year_keys(yrs), batch_format="pyarrow",
                               zero_copy_batch=True), "o_custkey")
        out.append(regs.map_batches(
            lambda t, _s=side: t.append_column(
                "side", pa.array([_s] * t.num_rows, pa.string())),
            batch_format="pyarrow"))
    u = out[0].union(out[1], out[2])
    return u.map_batches(
        lambda t: t.select(["side", "register", "max_rank"]),
        batch_format="pyarrow").sort(["side", "register"])


def _approx_overlap_sql() -> str:
    sides = []
    for side, pred in (("a", "year(o_orderdate) = 1996"),
                       ("b", "year(o_orderdate) = 1997"),
                       ("u", "year(o_orderdate) IN (1996, 1997)")):
        sides.append(f"""
            SELECT '{side}' AS side, register,
                   CAST(max(r) AS BIGINT) AS max_rank
            FROM (
              WITH src AS (SELECT o_custkey FROM orders WHERE {pred}),
              {_splitmix_cte('src', 'o_custkey', 'o_custkey')},
              hh AS (SELECT xor(z, z >> 31) AS h FROM z2),
              rr AS (SELECT CAST(h >> 54 AS BIGINT) AS register,
                            h % 18014398509481984 AS w FROM hh)
              SELECT register,
                     CASE WHEN w = 0 THEN 55
                          ELSE 55 - length(bin(w)) END AS r FROM rr)
            GROUP BY 1, 2""")
    return " UNION ALL ".join(sides) + " ORDER BY side, register"


def _q_rel_zorder(sf_dir: str):
    """Z-order clustering keys (relational.zorder_keys): bit-interleaved
    (custkey, order-day) Morton codes, pure integer bit arithmetic."""
    from .pipelines.relational import zorder_keys
    return zorder_keys(sf_dir)


def _zorder_sql() -> str:
    from .pipelines.relational import ZORDER_BITS
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"(((x >> {i}) & 1) << {2 * i})")
        terms.append(f"(((d >> {i}) & 1) << {2 * i + 1})")
    return f"""
        WITH m AS (SELECT o_orderkey,
                          CAST(o_custkey % {1 << ZORDER_BITS} AS BIGINT)
                            AS x,
                          CAST((epoch_us(o_orderdate) // 86400000000)
                               % {1 << ZORDER_BITS} AS BIGINT) AS d
                   FROM orders)
        SELECT o_orderkey, CAST({' | '.join(terms)} AS BIGINT) AS zkey
        FROM m ORDER BY o_orderkey"""


def _q_diag_join_estimate(sf_dir: str):
    """Join-cardinality diagnostics (relational.join_cardinality_estimates):
    uniform-containment estimate vs true join size, exact integers."""
    from .pipelines.relational import join_cardinality_estimates
    return join_cardinality_estimates(sf_dir)


def _join_estimate_sql() -> str:
    from .pipelines.relational import JOIN_EST_PAIRS
    sels = []
    for name, lt, lk, rt, rk in JOIN_EST_PAIRS:
        sels.append(f"""
            SELECT '{name}' AS pair,
                   (SELECT CAST(count(*) AS BIGINT) FROM {lt}) AS n_left,
                   (SELECT CAST(count(*) AS BIGINT) FROM {rt})
                     AS n_right,
                   (SELECT CAST(count(DISTINCT {lk}) AS BIGINT)
                    FROM {lt}) AS ndv_left,
                   (SELECT CAST(count(DISTINCT {rk}) AS BIGINT)
                    FROM {rt}) AS ndv_right,
                   CAST((SELECT count(*) FROM {lt})
                        * (SELECT count(*) FROM {rt})
                        // greatest(
                            (SELECT count(DISTINCT {lk}) FROM {lt}),
                            (SELECT count(DISTINCT {rk}) FROM {rt}), 1)
                        AS BIGINT) AS est_rows,
                   (SELECT CAST(count(*) AS BIGINT)
                    FROM {lt} JOIN {rt} ON {lk} = {rk}) AS actual_rows""")
    return " UNION ALL ".join(sels) + " ORDER BY pair"


def _q_events_seasonal(sf_dir: str):
    """Seasonal decomposition of daily purchase revenue
    (relational.seasonal_decompose_daily): exact ×7 centered moving
    trend + dow detrended component over a zero-filled day spine."""
    from .pipelines.relational import seasonal_decompose_daily
    return seasonal_decompose_daily(sf_dir)


def _q_events_seasonal_anomaly(sf_dir: str):
    """Seasonal-residual anomalies (relational.seasonal_anomaly_days):
    |detrend − LOW-median| > 3·MAD, pure integer comparisons."""
    from .pipelines.relational import seasonal_anomaly_days
    return seasonal_anomaly_days(sf_dir)


def _q_rel_rfm(sf_dir: str):
    """RFM segmentation (relational.rfm_segments): three global NTILE
    ranks via packed-key sorts + zip_with_index, exact fill rule."""
    from .pipelines.relational import rfm_segments
    return rfm_segments(sf_dir)


def _q_events_funnel_latency(sf_dir: str):
    """Time-to-convert per user (relational.funnel_latency): first view
    -> first purchase at-or-after it, exact integer microseconds."""
    from .pipelines.relational import funnel_latency
    return funnel_latency(sf_dir)


def _q_rel_psi_drift(sf_dir: str):
    """PSI drift between view/purchase value distributions
    (relational.psi_drift): exact integer bin counts + one float PSI."""
    from .pipelines.relational import psi_drift
    return psi_drift(sf_dir)


def _q_events_churn_labels(sf_dir: str):
    """Leakage-safe churn labels (relational.churn_labels): per
    (user, active-week), will_return = active in week+1 via the
    indicator-union forward shift."""
    from .pipelines.relational import churn_labels
    return churn_labels(sf_dir)


def _q_events_peak_concurrency(sf_dir: str):
    """Peak concurrent sessions (relational.peak_concurrency): ±1
    boundary deltas + associative two-level prefix-max scan."""
    from .pipelines.relational import peak_concurrency
    return peak_concurrency(sf_dir)


RRF_K = 60


def _q_search_rrf(sf_dir: str):
    """Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval
    systems: per query, BM25 relevance (distributed scorer) fused with
    a global rare-vocabulary quality ranking (unigram mean-frequency
    asc) via rrf_fp = Σ 10^6 // (60 + rank) — integer floor division,
    so the fused ranking is hash-exact. Both input rankings are
    distributed jobs; the fusion itself runs on the bounded
    (queries × k) driver frame, which is the re-ranker contract."""
    import pandas as pd
    from .stages.textstats import unigram_freq_score
    bm = to_pandas_any(_q_search_bm25(sf_dir))
    qual = to_pandas_any(
        unigram_freq_score(_docs(sf_dir))
        .sort(["mean_freq_fp", "doc_id"]).limit(10))
    qual = qual.reset_index(drop=True)
    qrank = {int(d): i + 1 for i, d in enumerate(qual["doc_id"])}
    rows = []
    for qid, g in bm.groupby("query_id"):
        arank = {int(d): int(r) for d, r in zip(g["doc_id"], g["rank"])}
        cand = set(arank) | set(qrank)
        scored = []
        for d in cand:
            s = 0
            if d in arank:
                s += 10**6 // (RRF_K + arank[d])
            if d in qrank:
                s += 10**6 // (RRF_K + qrank[d])
            scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(scored[:10], 1):
            rows.append((int(qid), d, s, r))
    t = list(zip(*rows)) if rows else [[], [], [], []]
    return pa.table({"query_id": pa.array(t[0], pa.int64()),
                     "doc_id": pa.array(t[1], pa.int64()),
                     "rrf_fp": pa.array(t[2], pa.int64()),
                     "rank": pa.array(t[3], pa.int64())})


def to_pandas_any(obj):
    import pandas as pd
    import ray.data as rd
    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _rrf_sql() -> str:
    return f"""
        WITH bm AS (SELECT * FROM ({_bm25_sql()})),
        qual AS (SELECT doc_id, rn FROM (
                   SELECT doc_id, row_number() OVER (
                     ORDER BY mean_freq_fp, doc_id) AS rn
                   FROM ({{UNIGRAM}})) WHERE rn <= 10),
        cand AS (SELECT query_id, doc_id FROM bm
                 UNION
                 SELECT b2.query_id, qual.doc_id
                 FROM (SELECT DISTINCT query_id FROM bm) b2
                 CROSS JOIN qual),
        scored AS (SELECT c.query_id, c.doc_id,
                          coalesce((SELECT 1000000 // ({RRF_K} + bm.rank)
                                    FROM bm
                                    WHERE bm.query_id = c.query_id
                                      AND bm.doc_id = c.doc_id), 0)
                        + coalesce((SELECT 1000000 // ({RRF_K} + q.rn)
                                    FROM qual q
                                    WHERE q.doc_id = c.doc_id), 0)
                            AS rrf_fp
                   FROM cand c)
        SELECT query_id, doc_id, CAST(rrf_fp AS BIGINT) AS rrf_fp,
               CAST(rank AS BIGINT) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY rrf_fp DESC, doc_id) AS rank FROM scored)
        WHERE rank <= 10 ORDER BY query_id, rank"""


PSEUDO_SALT = 271828


def _q_privacy_pseudonymize(sf_dir: str):
    """Salted pseudonymization (privacy engineering's reversible-only-
    with-salt id replacement): user_id → splitmix64(id ⊕ splitmix64(salt))
    — deterministic, collision-free in practice, joinable across tables
    pseudonymized with the same salt. Output per pseudonym: event count
    (the count column doubles as the bijection check — row count equals
    the distinct-user count iff no collision). Stateless map + one
    grouped count."""
    from .functions.grouped import grouped_count
    from .functions.sampling import splitmix64

    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id"])

    def pseud(b: pa.Table) -> pa.Table:
        import numpy as np
        x = pc.cast(b["user_id"], pa.int64()).to_numpy(
            zero_copy_only=False).view(np.uint64)
        salt = splitmix64(np.array([PSEUDO_SALT], np.uint64))[0]
        p = splitmix64(x ^ salt).view(np.int64)
        return pa.table({"pseud": pa.array(p, pa.int64())})

    return grouped_count(
        ev.map_batches(pseud, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["pseud"], "n_events", 4)


def _pseudonymize_sql() -> str:
    from .functions.sampling import splitmix64
    import numpy as np
    salt = int(splitmix64(np.array([PSEUDO_SALT], np.uint64))[0])
    return f"""
        WITH src AS (SELECT xor(CAST(user_id AS UBIGINT),
                                CAST('{salt}' AS UBIGINT)) AS kx
                     FROM events),
        {_splitmix_cte('src', 'kx', 'kx')},
        hh AS (SELECT xor(z, z >> 31) AS h FROM z2)
        SELECT CAST(CAST(h AS HUGEINT)
                    - CASE WHEN h >= 9223372036854775808
                           THEN {_M64} ELSE 0 END AS BIGINT) AS pseud,
               CAST(count(*) AS BIGINT) AS n_events
        FROM hh GROUP BY 1 ORDER BY 1"""


def _q_rel_apportion(sf_dir: str):
    """Largest-remainder apportionment (relational.apportion_budget):
    integer shares proportional to order counts, summing exactly to the
    budget."""
    from .pipelines.relational import apportion_budget
    return apportion_budget(sf_dir)


def _q_rel_mom_revenue(sf_dir: str):
    """Month-over-month revenue deltas (relational.mom_revenue):
    window-over-aggregate, exact integer deltas + IEEE pct."""
    from .pipelines.relational import mom_revenue
    return mom_revenue(sf_dir)


def _fk_audit_sql() -> str:
    from .pipelines.relational import FK_RELATIONS
    sels = []
    for fk, child, ccol, parent, pcol in FK_RELATIONS:
        sels.append(f"""
            SELECT '{fk}' AS fk,
                   CAST(count(*) AS BIGINT) AS n_child_rows,
                   CAST(count(DISTINCT c.{ccol}) AS BIGINT)
                     AS n_distinct_keys,
                   CAST(sum(CASE WHEN p.{pcol} IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_orphans
            FROM {child} c LEFT JOIN {parent} p ON p.{pcol} = c.{ccol}""")
    return " UNION ALL ".join(sels) + " ORDER BY fk"


K_ANON = 5


def _q_privacy_k_anonymity(sf_dir: str):
    """k-anonymity audit (Sweeney 2002, public) over the events quasi-
    identifier (event_type, ISO weekday, hour): equivalence classes with
    fewer than k=5 members are re-identification risks a release
    pipeline must suppress or generalize — the structural privacy check
    that complements the row-level PII redaction stage. One
    dictionary-sized grouped count, risky classes filtered vectorized."""
    from .functions.grouped import grouped_count
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "ts"])

    def qi(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b["event_type"],
                         "dow": pc.cast(pc.add(pc.day_of_week(b["ts"]), 1),
                                        pa.int64()),
                         "hod": pc.cast(pc.hour(b["ts"]), pa.int64())})

    cells = grouped_count(ev.map_batches(qi, batch_format="pyarrow"),
                          ["event_type", "dow", "hod"], "n", 4)
    df = cells.filter(expr=f"n < {K_ANON}") \
        .sort(["event_type", "dow", "hod"]).to_pandas()
    if df.empty:  # an empty Dataset loses its schema through sort
        import pandas as pd
        df = pd.DataFrame({"event_type": pd.Series(dtype=object),
                           "dow": pd.Series(dtype="int64"),
                           "hod": pd.Series(dtype="int64"),
                           "n": pd.Series(dtype="int64")})
    return df


def _q_kg_bgp_reordered(sf_dir: str):
    """Join-order planning (functions/bgp.plan_order): the user writes
    the catastrophic order — a full (?t ?p ?x) scan first — and the
    greedy selectivity planner seeds from the constant-rich espresso
    pattern instead, so intermediate bindings stay espresso-turn-sized.
    Result: every fact about turns that mention espresso."""
    from .functions.bgp import bgp_match
    esp = C.ENT + "mention/" + BGP_FILTER_EXCL
    return bgp_match(
        _mention_union_tri(sf_dir),
        [("?t", "?p", "?x"),
         ("?t", C.PRED_MENTIONS, "?m"),
         ("?t", C.PRED_MENTIONS, esp)],
        ["t", "p", "x"], num_partitions=8).sort(["t", "p", "x"])


def _q_curation_char_budget(sf_dir: str):
    """Budget-constrained selection (curation.char_budget_sample): fill
    a 60k-character budget in deterministic hash-priority order via the
    distributed prefix scan."""
    from .pipelines.curation import char_budget_sample
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"])
    return char_budget_sample(docs)


def _q_kg_sparql_topk(sf_dir: str):
    """SPARQL solution modifiers ORDER BY DESC + LIMIT over a BGP
    aggregate: the 10 most-mentioned entities — SELECT ?m (COUNT(?t) AS
    n_turns) WHERE {?t :mentions ?m} GROUP BY ?m ORDER BY DESC(?n) ?m
    LIMIT 10. Distinct bindings feed one grouped count; the head is one
    tiny sort with a deterministic (count desc, m asc) tie-break."""
    from .functions.bgp import bgp_match
    from .functions.grouped import grouped_count
    dd = bgp_match(_mention_union_tri(sf_dir),
                   [("?t", C.PRED_MENTIONS, "?m")],
                   ["t", "m"], num_partitions=8)
    return grouped_count(dd, ["m"], "n_turns", 8) \
        .sort(["n_turns", "m"], descending=[True, False]) \
        .limit(SPARQL_TOPK)


def _q_kg_incremental_delta(sf_dir: str):
    """Incremental KG maintenance: split the corpus into a base build
    (90% of conversations) and a new-arrivals delta (conv numeric suffix
    % 10 == 0), construct triples for each side, and return exactly the
    triples the delta ADDS to the materialized graph — delta EXCEPT base
    via the distributed set operator (functions/setops.py), so already-
    present facts (a shared tool's rdf:type, a mention both sides make)
    are NOT re-emitted. This is the update path a 100 TB KG needs: the
    base graph is never rebuilt, only the delta flows, and the EXCEPT
    shuffle carries distinct-key partials, not triples-per-occurrence."""
    from .functions.setops import distinct_set_op
    from .pipelines.kg import load_config_tables
    from .stages import canonicalize as canon
    from .stages import extract, mentions
    fdir = _fx(sf_dir)
    alias_rows, vocab, *_ = load_config_tables(fdir)
    cmap = canon.build_canonical_map_local(alias_rows)
    ts = _read_transcripts(sf_dir)

    def side(want_delta: bool) -> ray.data.Dataset:
        def pick(b: pa.Table) -> pa.Table:
            num = pc.cast(pc.utf8_slice_codeunits(b["conv_id"], 4),
                          pa.int64())
            mod = pc.subtract(num, pc.multiply(
                pc.divide(num, DELTA_MOD), DELTA_MOD))
            m = pc.equal(mod, 0) if want_delta else pc.not_equal(mod, 0)
            return b.filter(m)

        part = ts.map_batches(pick, batch_format="pyarrow",
                              zero_copy_batch=True)
        men = canon.canonicalize_mentions(
            mentions.mention_triples(
                part.select_columns(["conv_id", "turn_idx", "text"]),
                vocab), cmap).materialize()
        return extract.structural_triples(part).union(men)

    return distinct_set_op(side(True), side(False),
                           ["subj", "pred", "obj"], "except", 8) \
        .sort(["subj", "pred", "obj"])


def _q_text_zipf_fit(sf_dir: str):
    """Zipf's-law fit of the corpus unigram distribution: OLS slope of
    ln(count) on ln(rank) over the top-100 terms (slope ≈ -1 for natural
    text — a corpus-health diagnostic; synthetic/templated corpora run
    much flatter). Counts reduce via one dictionary-sized shuffle; rank
    assignment and the 100-point regression are driver-side on the tiny
    sorted head, with deterministic (count desc, word) tie-break."""
    from .functions.grouped import sorted_aggregate
    from .stages.dedup import _words_flat

    def partial(b: pa.Table) -> pa.Table:
        words, _ = _words_flat(b["text"])
        uw, cnt = np.unique(words, return_counts=True)
        return pa.table({"w": pa.array(uw, pa.string()),
                         "c": pa.array(cnt.astype(np.int64))})

    top = sorted_aggregate(
        _docs(sf_dir).map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True),
        ["w"], [("c", "sum")], ["w", "c"], 4) \
        .sort(["c", "w"], descending=[True, False]).limit(ZIPF_TOP) \
        .to_pandas()
    c = top["c"].to_numpy().astype(np.float64)
    x = np.log(np.arange(1, len(c) + 1, dtype=np.float64))
    y = np.log(c)
    n = len(c)
    sx, sy, sxy, sx2 = x.sum(), y.sum(), (x * y).sum(), (x * x).sum()
    slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    intercept = (sy - slope * sx) / n
    return pa.table({"n_terms": pa.array([n], pa.int64()),
                     "slope": pa.array([slope], pa.float64()),
                     "intercept": pa.array([intercept], pa.float64())})


def _q_kg_sparql_ask(sf_dir: str):
    """SPARQL ASK (functions/bgp.bgp_ask): boolean pattern existence —
    the third SPARQL verb next to SELECT and CONSTRUCT. Short-circuits
    via limit(1): the scan stops as soon as one binding materializes."""
    from .functions.bgp import bgp_ask
    tri = _mention_union_tri(sf_dir).materialize()
    rows = []
    for t in (ASK_TOOL_TRUE, ASK_TOOL_FALSE):
        ans = bgp_ask(tri, [("?t", C.PRED_USES_TOOL, C.ENT + "tool/" + t),
                            ("?t", C.PRED_MENTIONS, "?m")],
                      num_partitions=4)
        rows.append((C.ENT + "tool/" + t, int(ans)))
    return pa.table({"q": pa.array([r[0] for r in rows]),
                     "answer": pa.array([r[1] for r in rows], pa.int64())})


def _q_events_trailing_sum(sf_dir: str):
    """True time-RANGE window (relational.trailing_sum_1h): trailing-hour
    per-user sums with SQL peer semantics, prefix sums + two
    searchsorted passes in sorted blocks."""
    from .pipelines.relational import trailing_sum_1h
    return trailing_sum_1h(sf_dir)


def _q_events_time_in_state(sf_dir: str):
    """Dwell time per (user, type) from closed SCD2 intervals
    (relational.time_in_state)."""
    from .pipelines.relational import time_in_state
    return time_in_state(sf_dir)


def _q_kg_clustering(sf_dir: str):
    """Local clustering coefficient per co-mention node as an exact
    integer pair (functions/triangles.triangles_per_node): center-keeping
    wedge join + closing edge join + per-center grouped count; wedge
    capacity d(d−1)/2 from one degree count — the graph feature set a
    link-prediction trainer consumes."""
    from .functions.triangles import triangles_per_node, within_group_pairs
    pre = C.ENT + "mention/"
    m = _q_mentions(sf_dir).map_batches(
        lambda b: pa.table({
            "turn": b["subj"],
            "c": pc.utf8_slice_codeunits(b["obj"], len(pre))}),
        batch_format="pyarrow")
    edges = within_group_pairs(m, "turn", "c")
    return triangles_per_node(edges).sort("node")


def _q_events_winsorized(sf_dir: str):
    """Winsorization / outlier capping (relational.winsorize_events):
    per-type q05/q95 order-statistic caps, corpus clipped in ONE
    stateless pass, exact cents."""
    from .pipelines.relational import winsorize_events
    return winsorize_events(sf_dir)


def _q_kg_bgp_conv_entity(sf_dir: str):
    """Three-hop BGP across all four triple families:
    {?t isPartOf ?c . ?t mentions ?m . ?m sameAs ?ent} -> DISTINCT
    (c, ent) — which conversations ground to which external entities.
    Chains two cogroup joins on ?t then one on ?m; the planner's
    longest exercised join chain."""
    from .functions.bgp import bgp_match
    from .pipelines.kg import load_config_tables
    from .stages import canonicalize as canon
    from .stages import extract, link, mentions
    fdir = _fx(sf_dir)
    alias_rows, vocab, *_ = load_config_tables(fdir)
    ts = _read_transcripts(sf_dir)
    m = canon.canonicalize_mentions(
        mentions.mention_triples(
            ts.select_columns(["conv_id", "turn_idx", "text"]), vocab),
        canon.build_canonical_map_local(alias_rows)).materialize()
    links = link.link_mentions(m, link.load_snapshot(fdir)).materialize()
    tri = extract.structural_triples(ts).union(m).union(links)
    return bgp_match(
        tri, [("?t", C.PRED_IS_PART_OF, "?c"),
              ("?t", C.PRED_MENTIONS, "?m"),
              ("?m", C.PRED_SAME_AS, "?ent")],
        ["c", "ent"], num_partitions=8).sort(["c", "ent"])


def _q_kg_completeness(sf_dir: str):
    """KG completeness metrics — the graph-quality audit (companion to
    the row-level quality_audit_events): per check, (n_total, n_missing)
    as exact integers. Checks: mentions without an entity link
    (grounding gap), conversations with no tool-using turn (automation
    gap), turns with no mention (coverage gap). Each is one map-side
    fold over a stream already produced by the pipeline — no new
    shuffles beyond the tiny per-check aggregates."""
    from .functions.grouped import grouped_count, sorted_aggregate
    from .pipelines.kg import load_config_tables
    from .stages import canonicalize as canon
    from .stages import link, mentions
    from .stages.extract import _tool_mask
    fdir = _fx(sf_dir)
    alias_rows, vocab, *_ = load_config_tables(fdir)
    ts = _read_transcripts(sf_dir)
    m = canon.canonicalize_mentions(
        mentions.mention_triples(
            ts.select_columns(["conv_id", "turn_idx", "text"]), vocab),
        canon.build_canonical_map_local(alias_rows)).materialize()
    links = link.link_mentions(m, link.load_snapshot(fdir)).materialize()

    out_schema = pa.schema([("check", pa.string()),
                            ("n_total", pa.int64()),
                            ("n_missing", pa.int64())])

    # grounding gap: distinct mention forms vs linked forms (both tiny
    # after the distinct fold; links are one row per linked form)
    def to_form(b: pa.Table) -> pa.Table:
        return pa.table({"form": pc.unique(b["obj"].combine_chunks())})

    forms = grouped_count(m.map_batches(to_form, batch_format="pyarrow"),
                          ["form"], "__c", 4)
    n_forms = forms.count()
    n_linked = links.count()

    # automation gap: conversations with no tool-ok turn
    def conv_partial(b: pa.Table) -> pa.Table:
        ok = pc.cast(_tool_mask(b["tool"]), pa.int64())
        return pa.table({"conv_id": b["conv_id"], "ok": ok}) \
            .group_by(["conv_id"], use_threads=False) \
            .aggregate([("ok", "sum")]).rename_columns(["conv_id", "ok"])

    convs = sorted_aggregate(
        ts.select_columns(["conv_id", "tool"]).map_batches(
            conv_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["conv_id"], [("ok", "sum")], ["conv_id", "ok"], 8)

    def conv_fold(b: pa.Table) -> pa.Table:
        tot = b.num_rows
        miss = pc.sum(pc.cast(pc.equal(b["ok"], 0), pa.int64())).as_py() or 0
        return pa.table({"check": ["conv_without_tool"],
                         "n_total": pa.array([tot], pa.int64()),
                         "n_missing": pa.array([miss], pa.int64())},
                        schema=out_schema)

    # conv_fold is a per-block PARTIAL (sorted_aggregate emits several
    # blocks) — one tiny grouped sum folds the partials to one row
    conv_rows = sorted_aggregate(
        convs.map_batches(conv_fold, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["check"], [("n_total", "sum"), ("n_missing", "sum")],
        ["check", "n_total", "n_missing"], 1)

    # coverage gap: turns with no mention — mention triples carry one row
    # per (turn, form); distinct turns with >=1 mention vs all turns
    def to_turn(b: pa.Table) -> pa.Table:
        return pa.table({"turn": pc.unique(b["subj"].combine_chunks())})

    turns_m = grouped_count(m.map_batches(to_turn, batch_format="pyarrow"),
                            ["turn"], "__c", 4).count()
    n_turns = ts.count()

    head = ray.data.from_arrow(pa.table({
        "check": ["mention_unlinked", "turn_without_mention"],
        "n_total": pa.array([n_forms, n_turns], pa.int64()),
        "n_missing": pa.array([n_forms - n_linked, n_turns - turns_m],
                              pa.int64())}, schema=out_schema))
    return head.union(conv_rows).sort("check")


def _q_events_attribution(sf_dir: str):
    """Last-touch attribution: every purchase attributes to the LAST
    preceding click within 1 h by the same user — the mirror of the
    next-match join (events_error_recovery), searchsorted side='left'
    minus one on composed keys inside sorted blocks. Output
    (purchase_id, click_id, gap_us)."""
    from .functions.grouped import group_ids, sorted_group_apply
    from .pipelines.relational import _read

    ev = _read(sf_dir, "events", columns=["event_id", "user_id",
                                          "event_type", "ts"])
    out_schema = pa.schema([("purchase_id", pa.int64()),
                            ("click_id", pa.int64()),
                            ("gap_us", pa.int64())])
    HOUR_US = 3_600_000_000

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        ts = b["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        typ = b["event_type"].combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.lexsort((eid, ts, gid))
        g, t, e, ty = gid[order], ts[order], eid[order], typ[order]
        span = int(t.max(initial=0)) - int(t.min(initial=0)) + 2
        base = t - (t.min(initial=0))
        key = g * span + base  # composed (user, time) key, sorted
        cm = ty == "click"
        c_key, c_ts, c_eid, c_g = key[cm], t[cm], e[cm], g[cm]
        pm = ty == "purchase"
        if not pm.any() or not cm.any():
            return out_schema.empty_table()
        # strictly-before click: right insertion point minus one over
        # click keys < purchase key (clicks at the same us tie-break by
        # never matching — strictly earlier only, like the oracle's <)
        pos = np.searchsorted(c_key, key[pm], side="left") - 1
        ok = pos >= 0
        pos_c = np.maximum(pos, 0)
        ok &= c_g[pos_c] == g[pm]
        gap = t[pm] - c_ts[pos_c]
        ok &= (gap > 0) & (gap <= HOUR_US)
        return pa.table({
            "purchase_id": pa.array(e[pm][ok], pa.int64()),
            "click_id": pa.array(c_eid[pos_c][ok], pa.int64()),
            "gap_us": pa.array(gap[ok], pa.int64())}, schema=out_schema)

    return sorted_group_apply(ev, ["user_id"], block, 8) \
        .sort("purchase_id")


def _q_cq_trending_tools(sf_dir: str):
    """Trending tools: per calendar day, the top-3 tools by turn count
    (ties by tool name) — grouped_count partials fold map-side to
    (day, tool) rows, then the pruned distributed top-k
    (functions/topn.top_n_per_key, rank == ROW_NUMBER)."""
    from .functions.grouped import grouped_count
    from .functions.normalize import normalize_array
    from .functions.topn import top_n_per_key
    from .stages.extract import _tool_mask

    t = _read_transcripts(sf_dir, columns=["tool", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(_tool_mask(b["tool"]))
        day = b["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({"day": pa.array(day, pa.int64()),
                         "tool": normalize_array(b["tool"])})

    counts = grouped_count(
        t.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["day", "tool"], "n", 8)
    return top_n_per_key(counts, ["day"], [("n", False), ("tool", True)],
                         3, 4).sort(["day", "rank"])


def _q_events_stickiness(sf_dir: str):
    """DAU/WAU stickiness: per event day, (dau, wau) as an exact integer
    pair — DAU from the distinct (user, day) fold, WAU from the
    interval-union trailing-window distinct (window_distinct_users); the
    two day-keyed tables are tiny and reconcile in ONE union-tag grouped
    sum (no join against the corpus)."""
    from .functions.grouped import grouped_count, sorted_aggregate
    from .pipelines.relational import window_distinct_users

    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts"])

    def day_partial(b: pa.Table) -> pa.Table:
        day = b["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[D]").astype(np.int64)
        t = pa.table({"user_id": b["user_id"],
                      "day": pa.array(day, pa.int64())})
        return t.group_by(["user_id", "day"], use_threads=False) \
            .aggregate([]).rename_columns(["user_id", "day"])

    pairs = grouped_count(
        ev.map_batches(day_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id", "day"], "__c", 8)
    dau = grouped_count(pairs.select_columns(["day"]), ["day"], "dau", 4)
    wau = window_distinct_users(sf_dir, 7)

    def tag_dau(b: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(b.num_rows, np.int64))
        return pa.table({"day": b["day"], "dau": b["dau"], "wau": z})

    def tag_wau(b: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(b.num_rows, np.int64))
        return pa.table({"day": b["day"], "dau": z, "wau": b["n_users"]})

    u = dau.map_batches(tag_dau, batch_format="pyarrow").union(
        wau.map_batches(tag_wau, batch_format="pyarrow"))
    merged = sorted_aggregate(u, ["day"], [("dau", "sum"), ("wau", "sum")],
                              ["day", "dau", "wau"], 1)
    return merged.map_batches(
        lambda b: b.filter(pc.greater(b["dau"], 0)),
        batch_format="pyarrow", zero_copy_batch=True).sort("day")


def _q_dedup_cluster_size_hist(sf_dir: str):
    """Near-dup cluster-size histogram — the dedup QUALITY diagnostic
    (how much mass sits in big duplicate families): canonical map →
    per-canon sizes → size histogram, two grouped counts, corpus never
    broadcast."""
    from .functions.grouped import grouped_count
    from .stages.dedup import dedup_canonical_map, minhash_lsh_pairs
    docs = _docs(sf_dir)
    cm = dedup_canonical_map(docs, minhash_lsh_pairs(docs))
    sizes = grouped_count(cm.select_columns(["canon_id"]),
                          ["canon_id"], "sz", 8)
    hist = grouped_count(sizes.select_columns(["sz"]), ["sz"],
                         "n_clusters", 1)
    return hist.map_batches(
        lambda b: b.rename_columns(["cluster_size", "n_clusters"]),
        batch_format="pyarrow", zero_copy_batch=True).sort("cluster_size")


def _q_kg_type_rollup(sf_dir: str):
    """OLAP-over-ontology rollup: entity counts per type INCLUDING
    inferred supertypes — one grouped count over the RDFS inference
    materialization (kg_inferred_types)."""
    from .functions.grouped import grouped_count
    inf = _q_kg_inferred_types(sf_dir)
    return grouped_count(inf.select_columns(["type_iri"]),
                         ["type_iri"], "n_entities", 1).sort("type_iri")


def _q_events_robust_anomaly(sf_dir: str):
    """Median/MAD robust outlier flags (relational.robust_anomaly_events):
    heavy-tail-safe companion to the z-score op, exact cents."""
    from .pipelines.relational import robust_anomaly_events
    return robust_anomaly_events(sf_dir)


def _q_quality_audit(sf_dir: str):
    """Data-quality audit / expectation suite
    (curation.quality_audit_events): per-rule violation counts; scan
    rules fold map-side, uniqueness is the only keyed exchange."""
    from .pipelines.curation import quality_audit_events
    return quality_audit_events(sf_dir)


def _q_rel_mannwhitney(sf_dir: str):
    """Exact-integer two-sample Mann-Whitney U
    (relational.mannwhitney_u_events): tie-averaged rank sums via the
    distributed prefix scan; 2*U_A stays integral."""
    from .pipelines.relational import mannwhitney_u_events
    return mannwhitney_u_events(sf_dir)


def _q_text_kwic(sf_dir: str):
    """KWIC concordance (textstats.kwic_concordance): first occurrence of
    each query term per document with a +-24-char context snippet —
    stateless vectorized scan (find_substring + one byte-gather slice
    pass), zero shuffle."""
    from .stages.textstats import kwic_concordance
    return kwic_concordance(_docs(sf_dir)).sort(["doc_id", "term"])


def _q_emb_random_projection(sf_dir: str):
    """Deterministic Rademacher random projection
    (similarity.random_projection): exact-integer JL dimensionality
    reduction, one int64 matmul per batch against a splitmix64-derived
    +-1 matrix reconstructed on every worker."""
    from .stages.similarity import random_projection
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                columns=["vec_id", "embedding"])
    return random_projection(emb).sort(["vec_id", "j"])


def _q_events_longest_streak(sf_dir: str):
    """Gaps-and-islands longest consecutive-day streak per user
    (relational.longest_streak_per_user): per-block (user, day) distinct
    partial, ONE user sort, numpy island decomposition in-block."""
    from .pipelines.relational import longest_streak_per_user
    return longest_streak_per_user(sf_dir)


def _q_rel_cume_dist(sf_dir: str):
    """CUME_DIST window in exact fixed point
    (relational.cume_dist_qty): tie-run END count * 1e6 // group size."""
    from .pipelines.relational import cume_dist_qty
    return cume_dist_qty(sf_dir)


def _q_rel_division(sf_dir: str):
    """Relational division (Codd's ÷, the 'suppliers who supply ALL
    parts' pattern): customers with at least one order in EVERY order
    year present in the corpus. Distributed plan: distinct (custkey,
    year) via one grouped count (the only exchange over order-sized
    data), then a per-customer year count compared on the driver
    against the tiny global distinct-year total — no join, no second
    shuffle over raw orders."""
    from .functions.grouped import grouped_count
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"])

    def cy(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"],
            "y": pc.cast(pc.year(b["o_orderdate"]), pa.int64())})

    pairs = grouped_count(
        orders.map_batches(cy, batch_format="pyarrow"),
        ["o_custkey", "y"], "n", 8)
    per_cust = grouped_count(pairs, ["o_custkey"], "n_years", 8)
    n_years_total = grouped_count(pairs, ["y"], "nn", 4).count()
    return per_cust.filter(expr=f"n_years == {int(n_years_total)}") \
        .sort("o_custkey")


def _q_events_cusum(sf_dir: str):
    """CUSUM changepoint scan (Page 1954) over the daily event-count
    series, exact integers: S_k = Σ_{i<=k} (D·n_i − T) (the mean is
    multiplied out, so no floats), peak day = argmax |S_k|. The
    distributed pass is ONE grouped daily count; the cumulative scan
    runs on the bounded days-sized frame."""
    from .functions.grouped import grouped_count
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts"])

    def day(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        return pa.table({"day": pc.divide(us, 86400000000)})

    df = grouped_count(ev.map_batches(day, batch_format="pyarrow"),
                       ["day"], "n_events", 4).to_pandas()
    df = df.sort_values("day").reset_index(drop=True)
    nd, tot = len(df), int(df["n_events"].sum())
    s = (nd * df["n_events"].astype("int64") - tot).cumsum()
    peak = int(s.abs().max()) if nd else 0
    df["cusum"] = s
    df["is_peak"] = (s.abs() == peak).astype("int64")
    return df


L_DIVERSITY = 3


def _q_privacy_l_diversity_events(sf_dir: str):
    """l-diversity audit (Machanavajjhala et al. 2007, the successor
    to k-anonymity): within each quasi-identifier class (event_type,
    weekday, hour), the sensitive attribute (user cohort = user_id % 8)
    must take >= l distinct values or the class is vulnerable to
    homogeneity attacks even when k-anonymous. Two cascaded grouped
    counts — (QI, sensitive) distinct pairs, then distinct-sensitive
    and member tallies per QI — both map-side combined."""
    from .functions.grouped import grouped_count, sorted_aggregate
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "ts", "user_id"])

    def qi(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "dow": pc.cast(pc.add(pc.day_of_week(b["ts"]), 1), pa.int64()),
            "hod": pc.cast(pc.hour(b["ts"]), pa.int64()),
            "sens": pc.bit_wise_and(b["user_id"], 7)})

    cells = grouped_count(ev.map_batches(qi, batch_format="pyarrow"),
                          ["event_type", "dow", "hod", "sens"], "n", 8)

    def fold(b: pa.Table) -> pa.Table:
        return b.append_column("one", pa.array(
            np.ones(b.num_rows, np.int64)))

    agg = sorted_aggregate(
        cells.map_batches(fold, batch_format="pyarrow"),
        ["event_type", "dow", "hod"],
        [("n", "sum"), ("one", "sum")],
        ["event_type", "dow", "hod", "n_members", "n_sensitive"], 8)

    def flag(b: pa.Table) -> pa.Table:
        return b.append_column("is_diverse", pc.cast(
            pc.greater_equal(b["n_sensitive"], L_DIVERSITY), pa.int64()))

    return agg.map_batches(flag, batch_format="pyarrow") \
        .sort(["event_type", "dow", "hod"])


def _q_ml_decision_stump(sf_dir: str):
    """Decision-stump training (1R / AdaBoost weak learner): the best
    threshold on l_quantity predicting l_returnflag == 'R', scored by
    exact integer misclassification count min(pos,n−pos) per side.
    The distributed pass is ONE (quantity, label) grouped count; the
    candidate-threshold scan is a cumsum over the <= 100-row distinct
    frame. is_best marks the argmin with the smallest-threshold
    tie-break — all integers, no Gini floats needed for the argmin."""
    from .functions.grouped import grouped_count
    li = ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_quantity", "l_returnflag"])

    def fl(b: pa.Table) -> pa.Table:
        return pa.table({
            "q": pc.cast(b["l_quantity"], pa.int64()),
            "pos": pc.cast(pc.equal(b["l_returnflag"], "R"), pa.int64())})

    cnt = grouped_count(li.map_batches(fl, batch_format="pyarrow"),
                        ["q", "pos"], "n", 4).to_pandas()
    import pandas as pd
    g = cnt.assign(np=cnt["n"] * cnt["pos"]) \
        .groupby("q", as_index=False).agg(nq=("n", "sum"), pq=("np", "sum")) \
        .sort_values("q").reset_index(drop=True)
    nl = g["nq"].cumsum()
    pl = g["pq"].cumsum()
    tot, totpos = int(nl.iloc[-1]) if len(g) else 0, \
        int(pl.iloc[-1]) if len(g) else 0
    nr, pr = tot - nl, totpos - pl
    mis = (np.minimum(pl, nl - pl) + np.minimum(pr, nr - pr)).astype("int64")
    best = int(mis.min()) if len(g) else 0
    is_best = (mis == best)
    # smallest threshold among the argmin set
    if len(g):
        first = g["q"][is_best].min()
        is_best = is_best & (g["q"] == first)
    return pd.DataFrame({
        "threshold": g["q"].astype("int64"),
        "n_left": nl.astype("int64"), "pos_left": pl.astype("int64"),
        "n_right": nr.astype("int64"), "pos_right": pr.astype("int64"),
        "miscls": mis, "is_best": is_best.astype("int64")})


def _q_dedup_snm(sf_dir: str):
    """Sorted-neighborhood candidate generation (Hernández & Stolfo
    1995): ONE global sort on a cheap blocking key + a width-2 sliding
    window — O(N·w) candidates, window crosses key boundaries. In-block
    pairs vectorized; block boundaries stitched from O(#blocks·w)
    edge rows (stages/dedup.sorted_neighborhood_pairs)."""
    from .stages.dedup import sorted_neighborhood_pairs
    return sorted_neighborhood_pairs(_docs(sf_dir), window=2,
                                     num_partitions=8)


def _q_rec_item_cooccur(sf_dir: str):
    """Item-item co-occurrence (the classic 'frequently bought
    together' recommender primitive, Linden et al. 2003): brand pairs
    co-appearing in an order, counted over all orders. Broadcast
    partkey→brand probe (ray.put once, binary-search per batch), ONE
    grouped distinct on (order, brand), per-order pair expansion in
    complete sorted groups, top-20 with a full deterministic
    tie-break."""
    from .functions.grouped import grouped_count, pairs_within_groups
    from .functions.joins import probe_sorted
    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"]).to_pandas()
    bid = part["p_brand"].str.slice(6).astype("int64").to_numpy()
    order = np.argsort(part["p_partkey"].to_numpy())
    ref = ray.put((part["p_partkey"].to_numpy()[order], bid[order]))

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"])

    def to_brand(b: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)
        bb = probe_sorted(keys, vals,
                          b["l_partkey"].to_numpy(zero_copy_only=False))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "b": pa.array(bb, pa.int64())})

    ob = grouped_count(li.map_batches(to_brand, batch_format="pyarrow"),
                       ["l_orderkey", "b"], "nn", 8)
    pairs = pairs_within_groups(ob, ["l_orderkey"], "b", "n_orders",
                                num_partitions=8)

    def rn(b: pa.Table) -> pa.Table:
        return b.rename_columns(["brand_a", "brand_b", "n_orders"])

    return pairs.map_batches(rn, batch_format="pyarrow") \
        .sort(["n_orders", "brand_a", "brand_b"],
              descending=[True, False, False]).limit(20)


KNN_K = 5


def _q_ml_knn(sf_dir: str):
    """k-NN classification (Cover & Hart 1967): majority label of the
    k=5 exact-cosine nearest corpus vectors per query. The distributed
    job is the brute-force top-k scan (shared with ann_topk_cosine —
    identical rounded scores, so the neighbor sets hash-match the SQL);
    the vote runs on the bounded queries×k frame (re-ranker
    contract)."""
    import pandas as pd
    from .stages.similarity import brute_force_topk
    nb = to_pandas_any(brute_force_topk(_emb(sf_dir), k=KNN_K,
                                        n_queries=8))
    ids = sorted(set(int(v) for v in nb["vec_id"]))
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "label"])

    def keep(b: pa.Table) -> pa.Table:
        m = np.isin(b["vec_id"].to_numpy(zero_copy_only=False),
                    np.asarray(ids, np.int64))
        return b.filter(pa.array(m))

    lab = emb.map_batches(keep, batch_format="pyarrow").to_pandas()
    lut = dict(zip(lab["vec_id"].astype(int), lab["label"].astype(int)))
    nb["label"] = nb["vec_id"].map(lut).astype("int64")
    v = nb.groupby(["query_id", "label"], as_index=False).size() \
        .rename(columns={"size": "votes"})
    v = v.sort_values(["query_id", "votes", "label"],
                      ascending=[True, False, True])
    top = v.groupby("query_id", as_index=False).first()
    return pd.DataFrame({
        "query_id": top["query_id"].astype("int64"),
        "pred_label": top["label"].astype("int64"),
        "votes": top["votes"].astype("int64")})


PHRASE_W1, PHRASE_W2 = "hash", "join"


def _q_search_phrase(sf_dir: str):
    """Positional phrase search ('hash join' as adjacent tokens) — the
    inverted-index phrase-query primitive: one vectorized pass builds
    flat token masks for the two phrase words and counts same-document
    adjacencies via offset arithmetic; no postings shuffle, no Python
    row loop. Output per matching doc: occurrence count + 1-based
    token position of the first match."""
    docs = _docs(sf_dir)
    i64 = pa.int64()
    out_schema = pa.schema([("doc_id", i64), ("n_matches", i64),
                            ("first_pos", i64)])

    def f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        toks = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = np.asarray(toks.offsets)
        flat = toks.flatten()
        m1 = pc.equal(flat, PHRASE_W1).to_numpy(zero_copy_only=False)
        m2 = pc.equal(flat, PHRASE_W2).to_numpy(zero_copy_only=False)
        if len(m1) < 2:
            return out_schema.empty_table()
        adj = m1[:-1] & m2[1:]
        # a (i, i+1) pair is in-document iff i+1 is not a doc start
        starts = offs[1:-1] - offs[0]
        adj[starts[starts > 0] - 1] = False
        hit = np.flatnonzero(adj)
        if len(hit) == 0:
            return out_schema.empty_table()
        doc = np.searchsorted(offs - offs[0], hit, side="right") - 1
        ids = pc.cast(b["doc_id"], i64).to_numpy(zero_copy_only=False)
        udoc, first = np.unique(doc, return_index=True)
        cnt = np.bincount(doc)[udoc]
        fpos = hit[first] - (offs[udoc] - offs[0]) + 1
        return pa.table({"doc_id": pa.array(ids[udoc]),
                         "n_matches": pa.array(cnt.astype(np.int64)),
                         "first_pos": pa.array(fpos.astype(np.int64))},
                        schema=out_schema)

    out = docs.map_batches(f, batch_format="pyarrow").sort("doc_id")
    df = out.to_pandas()
    if df.empty:
        import pandas as pd
        df = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                           "n_matches": pd.Series(dtype="int64"),
                           "first_pos": pd.Series(dtype="int64")})
    return df


def _q_rel_gaps_islands(sf_dir: str):
    """Gaps-and-islands (consecutive-run detection) over the 'F'-status
    orderkey sequence — key − global_rank is constant per run; rank from
    the distributed zipWithIndex, runs aggregated with sorted_aggregate
    (relational.gaps_islands_orderkeys)."""
    from .pipelines.relational import gaps_islands_orderkeys
    return gaps_islands_orderkeys(sf_dir)


def _q_events_autocorr(sf_dir: str):
    """Daily-count autocorrelation at lags 1..7 as exact integer
    (num, den) pairs — N²-scaled centering means no float ever forms
    (relational.autocorr_daily)."""
    from .pipelines.relational import autocorr_daily
    return autocorr_daily(sf_dir)


def _q_events_survival(sf_dir: str):
    """Kaplan-Meier risk table over user activity lifetimes with
    right-censoring at the corpus end (relational.survival_table)."""
    from .pipelines.relational import survival_table
    return survival_table(sf_dir)


def _q_rec_assoc_rules(sf_dir: str):
    """Association rules (Agrawal & Srikant 1994) over per-order brand
    baskets: directed rules antecedent→consequent with scale-relative
    support (100·n_both >= n_orders). All metrics exact integers
    (confidence = n_both/n_ant, lift = n_both·n_orders/(n_ant·n_cons) are
    derivable ratios — no float ordering anywhere). Reuses the
    co-occurrence machinery: broadcast brand probe, ONE grouped distinct,
    in-group pair expansion; the per-brand count table is
    vocabulary-bounded, so it broadcasts back onto the pair frame."""
    from .functions.grouped import grouped_count, pairs_within_groups
    from .functions.joins import probe_sorted
    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"]).to_pandas()
    bid = part["p_brand"].str.slice(6).astype("int64").to_numpy()
    order = np.argsort(part["p_partkey"].to_numpy())
    ref = ray.put((part["p_partkey"].to_numpy()[order], bid[order]))

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"])

    def to_brand(b: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)
        bb = probe_sorted(keys, vals,
                          b["l_partkey"].to_numpy(zero_copy_only=False))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "b": pa.array(bb, pa.int64())})

    ob = grouped_count(li.map_batches(to_brand, batch_format="pyarrow"),
                       ["l_orderkey", "b"], "nn", 8).materialize()
    # brand supports (vocabulary-bounded) + total basket count
    per_brand = grouped_count(ob, ["b"], "n_ant", 1).to_pandas()
    n_orders = int(grouped_count(ob, ["l_orderkey"], "x", 8).count())
    sup = dict(zip(per_brand["b"].astype(int),
                   per_brand["n_ant"].astype(int)))
    pairs = pairs_within_groups(ob, ["l_orderkey"], "b", "n_both",
                                num_partitions=8)
    sup_ref = ray.put(sup)
    i64 = pa.int64()
    out_schema = pa.schema([
        ("antecedent", i64), ("consequent", i64), ("n_both", i64),
        ("n_ant", i64), ("n_cons", i64), ("n_orders", i64)])

    def rules(b: pa.Table) -> pa.Table:
        s = ray.get(sup_ref)
        a = b["doc_a"].to_numpy(zero_copy_only=False)
        c = b["doc_b"].to_numpy(zero_copy_only=False)
        nb = b["n_both"].to_numpy(zero_copy_only=False)
        keep = nb * 100 >= n_orders
        a, c, nb = a[keep], c[keep], nb[keep]
        na = np.array([s[int(v)] for v in a], np.int64)
        nc = np.array([s[int(v)] for v in c], np.int64)
        # emit both rule directions from each unordered pair
        return pa.table({
            "antecedent": pa.array(np.concatenate([a, c]), i64),
            "consequent": pa.array(np.concatenate([c, a]), i64),
            "n_both": pa.array(np.concatenate([nb, nb]), i64),
            "n_ant": pa.array(np.concatenate([na, nc]), i64),
            "n_cons": pa.array(np.concatenate([nc, na]), i64),
            "n_orders": pa.array(
                np.full(2 * len(a), n_orders, np.int64), i64)},
            schema=out_schema)

    return pairs.map_batches(rules, batch_format="pyarrow") \
        .sort(["antecedent", "consequent"])


def _q_privacy_t_closeness(sf_dir: str):
    """t-closeness audit (Li, Li & Venkatasubramanian 2007 — the
    successor to l-diversity): per quasi-identifier class, the total
    variation distance between the class's sensitive-attribute
    distribution and the GLOBAL one, as an exact integer fraction

        tvd = tvd_num / tvd_den,
        tvd_num = Σ_s |n_gs·N − N_s·n_g|,  tvd_den = 2·n_g·N

    (absent sensitive values contribute N_s·n_g — the full sens spine is
    enumerated). The distributed pass is the (QI, sens) grouped count;
    the TVD assembly runs on the vocabulary-bounded cell frame
    (types × 168 hours × 8 cohorts)."""
    from .functions.grouped import grouped_count
    import pandas as pd
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "ts", "user_id"])

    def qi(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "dow": pc.cast(pc.add(pc.day_of_week(b["ts"]), 1), pa.int64()),
            "hod": pc.cast(pc.hour(b["ts"]), pa.int64()),
            "sens": pc.bit_wise_and(b["user_id"], 7)})

    cells = grouped_count(ev.map_batches(qi, batch_format="pyarrow"),
                          ["event_type", "dow", "hod", "sens"], "n", 8) \
        .to_pandas()
    N = int(cells["n"].sum())
    ns = cells.groupby("sens")["n"].sum()  # global sens counts
    piv = cells.pivot_table(index=["event_type", "dow", "hod"],
                            columns="sens", values="n", fill_value=0,
                            aggfunc="sum")
    piv = piv.reindex(columns=ns.index, fill_value=0)
    ngs = piv.to_numpy(dtype=np.int64)
    ng = ngs.sum(axis=1)
    if float(N) * float(ng.max(initial=0)) >= float(1 << 62):
        raise OverflowError("t_closeness: rescale counts")
    num = np.abs(ngs * N - ns.to_numpy()[None, :] * ng[:, None]) \
        .sum(axis=1)
    idx = piv.index.to_frame(index=False)
    return pd.DataFrame({
        "event_type": idx["event_type"],
        "dow": idx["dow"].astype("int64"),
        "hod": idx["hod"].astype("int64"),
        "n_members": pd.Series(ng, dtype="int64"),
        "tvd_num": pd.Series(num, dtype="int64"),
        "tvd_den": pd.Series(2 * ng * N, dtype="int64")}) \
        .sort_values(["event_type", "dow", "hod"]).reset_index(drop=True)


def _q_ml_ols_two_features(sf_dir: str):
    """Two-feature OLS with intercept (price ~ quantity + discount) via
    the normal equations, solved exactly: one distributed moment pass
    (9 int64 partial sums per block, ONE row each to the driver), then
    Cramer's rule in Python big ints. Coefficients are emitted as
    UNREDUCED integer (num, den) pairs rendered as strings — they exceed
    int64 but match DuckDB HUGEINT arithmetic digit for digit, so the
    hash compare stays exact with zero float anywhere."""
    import pandas as pd
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_discount", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        x1 = pc.cast(pc.floor(b["l_quantity"]), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        x2 = pc.cast(pc.round(pc.multiply(b["l_discount"], 100.0)),
                     pa.int64()).to_numpy(zero_copy_only=False)
        y = pc.cast(pc.floor(b["l_extendedprice"]), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        vals = [len(x1), x1.sum(), x2.sum(), y.sum(),
                (x1 * x1).sum(), (x1 * x2).sum(), (x2 * x2).sum(),
                (x1 * y).sum(), (x2 * y).sum()]
        names = ["n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y",
                 "s2y"]
        return pa.table({k: pa.array([int(v)], pa.int64())
                         for k, v in zip(names, vals)})

    parts = pa.concat_tables(ray.get(
        li.map_batches(partial, batch_format="pyarrow")
          .to_arrow_refs())).to_pandas()
    n, s1, s2, sy, s11, s12, s22, s1y, s2y = \
        (int(parts[c].sum()) for c in parts.columns)

    def det3(m):
        return (m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
                - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
                + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]))

    A = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]
    bv = [sy, s1y, s2y]
    den = det3(A)
    nums = []
    for j in range(3):
        M = [[bv[i] if k == j else A[i][k] for k in range(3)]
             for i in range(3)]
        nums.append(det3(M))
    return pd.DataFrame({
        "coef": ["intercept", "x1_quantity", "x2_discount_pct"],
        "num": [str(v) for v in nums],
        "den": [str(den)] * 3})


BOOL_AND1, BOOL_AND2, BOOL_NOT = "hash", "data", "slow"


def _q_search_boolean(sf_dir: str):
    """Boolean retrieval (AND / AND-NOT) over exact token sets — the
    inverted-index set-algebra primitive, evaluated as ONE streaming
    scan: flat token masks per required/forbidden word, per-doc
    any-match via bincount over the split offsets; no postings
    materialized, no shuffle. Output (doc_id, n_tokens) of docs
    containing both AND terms and not the NOT term."""
    docs = _docs(sf_dir)
    i64 = pa.int64()
    out_schema = pa.schema([("doc_id", i64), ("n_tokens", i64)])

    def f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        toks = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        counts = pc.list_value_length(toks).to_numpy().astype(np.int64)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        flat = toks.flatten()

        def has(word):
            m = pc.equal(flat, word).to_numpy(zero_copy_only=False)
            return np.bincount(doc_of[m], minlength=b.num_rows) > 0

        keep = has(BOOL_AND1) & has(BOOL_AND2) & ~has(BOOL_NOT)
        ids = pc.cast(b["doc_id"], i64).to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(ids[keep]),
                         "n_tokens": pa.array(counts[keep])},
                        schema=out_schema)

    out = docs.map_batches(f, batch_format="pyarrow").sort("doc_id")
    df = out.to_pandas()
    if df.empty:
        import pandas as pd
        df = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                           "n_tokens": pd.Series(dtype="int64")})
    return df


def _q_events_rolling_median(sf_dir: str):
    """Trailing 7-day rolling median of the zero-filled daily event
    count — robust smoothing; the LOWER median (sorted[(k−1)//2]) keeps
    every value an exact integer, matching DuckDB's windowed
    quantile_disc. The distributed pass is the grouped daily count; the
    rolling scan runs on the day spine (bounded by the time range)."""
    from .functions.grouped import grouped_count
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts"])
    day_us = 86400 * 10**6

    def to_days(b: pa.Table) -> pa.Table:
        return pa.table({"day": pc.divide(pc.cast(b["ts"], pa.int64()),
                                          pa.scalar(day_us, pa.int64()))})

    counts = grouped_count(
        ev.map_batches(to_days, batch_format="pyarrow",
                       zero_copy_batch=True), ["day"], "c", 4).to_pandas()
    days = counts["day"].to_numpy()
    lo, hi = int(days.min()), int(days.max())
    c = np.zeros(hi - lo + 1, dtype=np.int64)
    c[days - lo] = counts["c"].to_numpy()
    med = np.empty(len(c), dtype=np.int64)
    for i in range(len(c)):
        w = np.sort(c[max(0, i - 6):i + 1])
        med[i] = w[(len(w) - 1) // 2]
    return pa.table({"day": pa.array(np.arange(lo, hi + 1), pa.int64()),
                     "c": pa.array(c), "med7": pa.array(med)})


def _q_emb_int8_quantize(sf_dir: str):
    """Per-dimension scalar quantization to 8-bit codes (the FAISS SQ8 /
    vector-DB storage primitive): code = (e_c − mn_d)·255 // (mx_d − mn_d)
    over fixed-point components e_c = floor(x·1e6) — ALL integer
    arithmetic, so block order, summation order and DuckDB `//`
    truncation (nonnegative here) cannot diverge. Pass 1 folds per-block
    per-dim min/max (one 2·d-int row per block to the driver); pass 2 is
    a stateless vectorized map. Long-form output (vec_id, dim 1-based,
    q) for the relational oracle."""
    emb = _emb(sf_dir)
    i64 = pa.int64()

    def mm(b: pa.Table) -> pa.Table:
        e = b["embedding"].combine_chunks()
        d = len(e[0])
        m = np.floor(e.flatten().to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1e6).astype(np.int64) \
            .reshape(b.num_rows, d)
        return pa.table({"dim": pa.array(np.arange(1, d + 1), i64),
                         "mn": pa.array(m.min(axis=0), i64),
                         "mx": pa.array(m.max(axis=0), i64)})

    parts = pa.concat_tables(ray.get(
        emb.map_batches(mm, batch_format="pyarrow").to_arrow_refs())) \
        .to_pandas()
    g = parts.groupby("dim").agg(mn=("mn", "min"), mx=("mx", "max"))
    mn = g["mn"].to_numpy()
    mx = g["mx"].to_numpy()
    rng = np.maximum(mx - mn, 1)  # mx==mn → q = 0 either way
    out_schema = pa.schema([("vec_id", i64), ("dim", i64), ("q", i64)])

    def quant(b: pa.Table) -> pa.Table:
        e = b["embedding"].combine_chunks()
        d = len(e[0])
        m = np.floor(e.flatten().to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1e6).astype(np.int64) \
            .reshape(b.num_rows, d)
        q = (m - mn[None, :]) * 255 // rng[None, :]
        vid = b["vec_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(np.repeat(vid, d), i64),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    b.num_rows)),
            "q": pa.array(q.ravel(), i64)}, schema=out_schema)

    return emb.map_batches(quant, batch_format="pyarrow",
                           zero_copy_batch=True).sort(["vec_id", "dim"])


def _q_ann_lsh_buckets(sf_dir: str):
    """Random-hyperplane LSH bucketing (Charikar 2002 — the SimHash-for-
    embeddings ANN index): bucket = 8 sign bits of the EXACT-INTEGER
    Rademacher projection (similarity.rp_sign_matrix — the same
    fixed-point floor(x·1e6) encoding as emb_random_projection, so sign
    decisions cannot flip with summation order). One stateless pass +
    one grouped aggregate. Output per bucket: (bucket, n_vecs,
    min_vec_id) — the index manifest an ANN reader would load."""
    from .functions.grouped import sorted_aggregate
    from .stages.similarity import rp_sign_matrix
    emb = _emb(sf_dir)
    i64 = pa.int64()

    def bucketize(b: pa.Table) -> pa.Table:
        e = b["embedding"].combine_chunks()
        d = len(e[0])
        m = np.floor(e.flatten().to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1e6).astype(np.int64) \
            .reshape(b.num_rows, d)
        proj = m @ rp_sign_matrix(d, 8)
        bucket = ((proj >= 0).astype(np.int64)
                  << np.arange(8, dtype=np.int64)[None, :]).sum(axis=1)
        vid = pc.cast(b["vec_id"], i64).to_numpy(zero_copy_only=False)
        return pa.table({"bucket": pa.array(bucket, i64),
                         "n_vecs": pa.array(np.ones(len(vid), np.int64)),
                         "min_vec_id": pa.array(vid, i64)})

    return sorted_aggregate(
        emb.map_batches(bucketize, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["bucket"], [("n_vecs", "sum"), ("min_vec_id", "min")],
        ["bucket", "n_vecs", "min_vec_id"], 4)


def _q_multimodal_hash_dedup(sf_dir: str):
    """Exact dedup over BINARY media payloads — content-hash dedup on an
    opaque blob column (the multimodal analog of dedup_exact): md5 of
    the payload bytes, keep-first per digest, digests-only shuffle. The
    oracle hashes the generating text (payload == UTF-8 bytes of it, so
    the digests coincide — documented equivalence)."""
    from .functions.grouped import sorted_aggregate
    from .stages.multimodal import synthesize_media
    import hashlib as _hl
    media = synthesize_media(_docs(sf_dir))

    def digest(b: pa.Table) -> pa.Table:
        hs = [_hl.md5(p).hexdigest()
              for p in b["payload"].to_pylist()]
        return pa.table({"payload_hash": pa.array(hs, pa.string()),
                         "media_id": b["media_id"]})

    hashed = media.map_batches(digest, batch_format="pyarrow",
                               zero_copy_batch=True)
    return sorted_aggregate(hashed, ["payload_hash"],
                            [("media_id", "count"), ("media_id", "min")],
                            ["payload_hash", "n_dups", "keep_media_id"],
                            4)


def _q_kg_katz(sf_dir: str):
    """Truncated Katz centrality (Katz 1953) over the deduped tool-
    transition digraph: in-path counts p1/p2/p3 (walks of length 1..3
    ending at each node) via two propagation rounds (attach + grouped
    sum — the HITS plumbing with walk-count semantics), combined as
    katz_fp = 64·p1 + 8·p2 + p3 (β = 1/8 in 8³ fixed point, exact
    integers end to end)."""
    from .functions.grouped import grouped_count, sorted_aggregate
    from .functions.joins import attach_column

    edges = grouped_count(_tool_transition_edges(sf_dir),
                          ["src", "dst"], "__n", 4) \
        .map_batches(lambda b: b.select(["src", "dst"]),
                     batch_format="pyarrow").materialize()
    p1 = grouped_count(edges, ["dst"], "n", 4) \
        .map_batches(lambda b: pa.table({"node": b["dst"],
                                         "v": b["n"]}),
                     batch_format="pyarrow").materialize()

    def step(prev):
        """p_{k+1}(v) = Σ_{u→v} p_k(u): attach p_k at the SOURCE, sum
        into the destination."""
        w = attach_column(
            edges, prev, [("src", pa.string()), ("dst", pa.string())],
            "src", "node", "v", "pk", pa.int64(), 4,
            key_type=pa.string())
        return sorted_aggregate(
            w.map_batches(
                lambda b: pa.table({"node": b["dst"], "p": b["pk"]}),
                batch_format="pyarrow"),
            ["node"], [("p", "sum")], ["node", "v"], 4).materialize()

    p2 = step(p1)
    p3 = step(p2)

    def tag(col):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            z = pa.array(np.zeros(n, np.int64))
            cols = {"node": b["node"], "p1": z, "p2": z, "p3": z}
            cols[col] = pc.cast(b["v"], pa.int64())
            return pa.table(cols)
        return f

    srcs = grouped_count(edges, ["src"], "__n", 4).map_batches(
        lambda b: pa.table({
            "node": b["src"],
            "p1": pa.array(np.zeros(b.num_rows, np.int64)),
            "p2": pa.array(np.zeros(b.num_rows, np.int64)),
            "p3": pa.array(np.zeros(b.num_rows, np.int64))}),
        batch_format="pyarrow")
    u = p1.map_batches(tag("p1"), batch_format="pyarrow") \
        .union(p2.map_batches(tag("p2"), batch_format="pyarrow"),
               p3.map_batches(tag("p3"), batch_format="pyarrow"),
               srcs)
    agg = sorted_aggregate(
        u, ["node"], [("p1", "sum"), ("p2", "sum"), ("p3", "sum")],
        ["node", "p1", "p2", "p3"], 4)

    def fp(b: pa.Table) -> pa.Table:
        return b.append_column("katz_fp", pc.add(
            pc.add(pc.multiply(b["p1"], pa.scalar(64, pa.int64())),
                   pc.multiply(b["p2"], pa.scalar(8, pa.int64()))),
            b["p3"]))

    return agg.map_batches(fp, batch_format="pyarrow").sort("node")


def _q_events_interarrival(sf_dir: str):
    """Inter-arrival-time histogram: per-user consecutive event gaps in
    log2 buckets (bucket = bit_length(gap_s + 1) − 1 — pure integer, the
    floor-log2 trick shared with text_surprisal). Per-user diffs run in
    complete sorted user groups (the LAG shape); per-block bucket
    partials collapse before ONE tiny grouped sum."""
    from .functions.grouped import group_ids, sorted_aggregate, \
        sorted_group_apply
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "user_id", "ts"])

    def buckets(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("bucket", pa.int64()),
                                ("n", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].to_numpy()
        order = np.lexsort((eid, ts, gid))
        ts, ogid = ts[order], gid[order]
        gap_s = (ts[1:] - ts[:-1]) // 1_000_000
        same = ogid[1:] == ogid[:-1]
        g = gap_s[same]
        # bit_length(g+1) − 1 == floor(log2(g+1)); frexp exponent is
        # exact for ints < 2^53
        bk = (np.frexp(g + 1.0)[1] - 1).astype(np.int64)
        ub, cnt = np.unique(bk, return_counts=True)
        return pa.table({"bucket": pa.array(ub, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))},
                        schema=out_schema)

    partials = sorted_group_apply(ev, ["user_id"], buckets)
    return sorted_aggregate(partials, ["bucket"], [("n", "sum")],
                            ["bucket", "n"], 1)


def _q_events_ewma(sf_dir: str):
    """EWMA (α = 1/2) over the zero-filled daily count series. The
    distributed pass is the grouped daily count; the fold runs on the
    bounded day spine in the EXACT order the oracle's recursive CTE
    uses — s_t = (s_{t−1} + c_t) / 2.0, the same IEEE ops in the same
    sequence, so the doubles are bit-identical (the PSI/float
    contract)."""
    from .functions.grouped import grouped_count
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts"])
    day_us = 86400 * 10**6

    def to_days(b: pa.Table) -> pa.Table:
        return pa.table({"day": pc.divide(pc.cast(b["ts"], pa.int64()),
                                          pa.scalar(day_us, pa.int64()))})

    counts = grouped_count(
        ev.map_batches(to_days, batch_format="pyarrow",
                       zero_copy_batch=True), ["day"], "c", 4).to_pandas()
    days = counts["day"].to_numpy()
    lo, hi = int(days.min()), int(days.max())
    c = np.zeros(hi - lo + 1, dtype=np.int64)
    c[days - lo] = counts["c"].to_numpy()
    ew = np.empty(len(c), dtype=np.float64)
    s = float(c[0])
    ew[0] = s
    for i in range(1, len(c)):
        s = (s + float(c[i])) / 2.0
        ew[i] = s
    return pa.table({"day": pa.array(np.arange(lo, hi + 1), pa.int64()),
                     "c": pa.array(c), "ewma": pa.array(ew)})


def _q_ml_prf(sf_dir: str):
    """Per-class precision/recall inputs (TP / FP / FN / support) for
    the langid classifier vs the labeled lang column — the eval-harness
    op downstream of the confusion matrix, all exact integers (P, R, F1
    are derivable ratios). Confusion counts aggregate distributed; the
    per-class assembly runs on the language-vocabulary-bounded frame."""
    import pandas as pd
    from .functions.grouped import grouped_count
    from .functions.joins import attach_column
    from .stages.textstats import language_id
    pred = language_id(_docs(sf_dir))
    labels = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang"])
    joined = attach_column(
        pred, labels,
        [("doc_id", pa.int64()), ("pred_lang", pa.string())],
        "doc_id", "doc_id", "lang", "true_lang", pa.string(), 4)
    conf = grouped_count(joined, ["pred_lang", "true_lang"], "n", 1) \
        .to_pandas()
    langs = sorted(set(conf["pred_lang"]) | set(conf["true_lang"]))
    tp = {l: 0 for l in langs}
    pp = {l: 0 for l in langs}
    ll = {l: 0 for l in langs}
    for p, t, n in zip(conf["pred_lang"], conf["true_lang"], conf["n"]):
        n = int(n)
        pp[p] += n
        ll[t] += n
        if p == t:
            tp[p] += n
    return pd.DataFrame({
        "lang": langs,
        "n_tp": pd.Series([tp[l] for l in langs], dtype="int64"),
        "n_fp": pd.Series([pp[l] - tp[l] for l in langs], dtype="int64"),
        "n_fn": pd.Series([ll[l] - tp[l] for l in langs], dtype="int64"),
        "support": pd.Series([ll[l] for l in langs], dtype="int64")})


def _q_rec_item_cosine(sf_dir: str):
    """Item-item cosine similarity over customer co-purchase vectors
    (v_b[c] = orders by customer c containing brand b) — the sparse
    AᵀA / co-cluster product behind neighborhood recommenders, in EXACT
    integers: (dot, ‖a‖², ‖b‖²) per brand pair (cosine is a derivable
    ratio). Plan: distinct (order, brand) → customer attach by the
    co-group join → per-(customer, brand) order counts → weighted
    in-group pair products in complete customer blocks (the
    _pair_index_arrays machinery with a product payload) → ONE tiny
    grouped sum; norms broadcast back onto the brand-pair frame."""
    from .functions.grouped import _pair_index_arrays, group_ids, \
        grouped_count, sorted_aggregate, sorted_group_apply
    from .functions.joins import attach_column, probe_sorted
    i64 = pa.int64()
    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"]).to_pandas()
    bid = part["p_brand"].str.slice(6).astype("int64").to_numpy()
    order = np.argsort(part["p_partkey"].to_numpy())
    ref = ray.put((part["p_partkey"].to_numpy()[order], bid[order]))

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"])

    def to_brand(b: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)
        bb = probe_sorted(keys, vals,
                          b["l_partkey"].to_numpy(zero_copy_only=False))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "b": pa.array(bb, i64)})

    ob = grouped_count(li.map_batches(to_brand, batch_format="pyarrow"),
                       ["l_orderkey", "b"], "nn", 8)
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"])
    oc = attach_column(ob, orders, [("l_orderkey", i64), ("b", i64)],
                       "l_orderkey", "o_orderkey", "o_custkey", "cust",
                       i64, 8)
    v = grouped_count(oc, ["cust", "b"], "v", 8)

    # ‖b‖² partials: brand-vocabulary-bounded
    def sq(b: pa.Table) -> pa.Table:
        vv = b["v"].to_numpy(zero_copy_only=False)
        return pa.table({"b": b["b"], "s2": pa.array(vv * vv, i64)})

    n2 = sorted_aggregate(v.map_batches(sq, batch_format="pyarrow"),
                          ["b"], [("s2", "sum")], ["b", "s2"], 1) \
        .to_pandas()
    n2map = dict(zip(n2["b"].astype(int), n2["s2"].astype(int)))

    pair_schema = pa.schema([("brand_a", i64), ("brand_b", i64),
                             ("dot", i64)])

    def pair_products(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pair_schema.empty_table()
        gid, _ = group_ids(b, ["cust"])
        ids = pc.cast(b["b"], i64)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids = ids.to_numpy()
        sel, first, second = _pair_index_arrays(gid, ids, None, None,
                                                "cust")
        if len(first) == 0:
            return pair_schema.empty_table()
        w = b["v"].to_numpy(zero_copy_only=False)[sel]
        d = ids[sel]
        t = pa.table({"brand_a": pa.array(d[first], i64),
                      "brand_b": pa.array(d[second], i64),
                      "dot": pa.array(w[first] * w[second], i64)})
        return t.group_by(["brand_a", "brand_b"], use_threads=False) \
            .aggregate([("dot", "sum")]) \
            .rename_columns(["brand_a", "brand_b", "dot"])

    dots = sorted_aggregate(
        sorted_group_apply(v, ["cust"], pair_products, 8),
        ["brand_a", "brand_b"], [("dot", "sum")],
        ["brand_a", "brand_b", "dot"], 1)

    def attach_norms(b: pa.Table) -> pa.Table:
        a = b["brand_a"].to_numpy(zero_copy_only=False)
        c = b["brand_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "brand_a": b["brand_a"], "brand_b": b["brand_b"],
            "dot": b["dot"],
            "na2": pa.array([n2map[int(x)] for x in a], i64),
            "nb2": pa.array([n2map[int(x)] for x in c], i64)})

    return dots.map_batches(attach_norms, batch_format="pyarrow") \
        .sort(["brand_a", "brand_b"])


def _q_ml_naive_bayes(sf_dir: str):
    """Multinomial naive-Bayes TRAINING (the count model — priors and
    per-class token counts are the whole classifier; scoring is a
    derivable log-ratio): one flat-token pass, ONE dictionary-sized
    grouped count by (lang, token), per-class doc counts riding in from
    a second tiny grouped count. All exact integers."""
    from .functions.grouped import grouped_count
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"])

    def toks(b: pa.Table) -> pa.Table:
        lst = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        counts = pc.list_value_length(lst).to_numpy().astype(np.int64)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        lang = b["lang"].to_numpy(zero_copy_only=False)
        return pa.table({"lang": pa.array(lang[doc_of]),
                         "token": lst.flatten()})

    tok_counts = grouped_count(
        docs.map_batches(toks, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["lang", "token"], "n_tok", 4)
    nd = grouped_count(docs.map_batches(
        lambda b: b.select(["lang"]), batch_format="pyarrow"),
        ["lang"], "n_docs", 1).to_pandas()
    ndmap = dict(zip(nd["lang"], nd["n_docs"].astype(int)))

    def attach(b: pa.Table) -> pa.Table:
        langs = b["lang"].to_numpy(zero_copy_only=False)
        return b.append_column("n_docs_lang", pa.array(
            [ndmap[l] for l in langs], pa.int64()))

    return tok_counts.map_batches(attach, batch_format="pyarrow") \
        .sort(["lang", "token"])


ANN_RANGE_TAU = 0.35
ANN_RANGE_NQ = 4


def _q_ann_range_search(sf_dir: str):
    """Range search (the ε-ball dual of top-k ANN): every corpus vector
    with cosine >= τ of each query, exact, ONE streaming scan — the
    broadcast query matrix scores each batch with a single matmul and
    rows pass a vectorized threshold; no shuffle, no top-k state.
    Scores rounded to 6 dp like every similarity op (ties and the
    boundary resolve identically to the SQL)."""
    from .stages.similarity import _to_matrix, load_queries
    emb = _emb(sf_dir)
    q_ids, q_mat = load_queries(emb, ANN_RANGE_NQ)
    ref = ray.put((q_ids, q_mat))
    i64, f64 = pa.int64(), pa.float64()
    out_schema = pa.schema([("query_id", i64), ("vec_id", i64),
                            ("cosine", f64)])

    def scan(b: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        ids, mat = _to_matrix(b)
        keep = ~np.isin(ids, qi)
        ids, mat = ids[keep], mat[keep]
        if len(ids) == 0:
            return out_schema.empty_table()
        s = np.round(qm @ mat.T, 6)
        hit_q, hit_v = np.nonzero(s >= ANN_RANGE_TAU)
        return pa.table({
            "query_id": pa.array(qi[hit_q].astype(np.int64)),
            "vec_id": pa.array(ids[hit_v].astype(np.int64)),
            "cosine": pa.array(s[hit_q, hit_v])}, schema=out_schema)

    out = emb.map_batches(scan, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .sort(["query_id", "vec_id"])
    df = out.to_pandas()
    if df.empty:
        import pandas as pd
        df = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                           "vec_id": pd.Series(dtype="int64"),
                           "cosine": pd.Series(dtype="float64")})
    return df


def _q_rel_gini(sf_dir: str):
    """Gini coefficient of per-brand revenue as an exact integer
    fraction: with revenues x_1 <= … <= x_n,

        gini = Σ_i (2i − n − 1)·x_i  /  n·Σ x_i

    Revenue folds distributed in exact cents×pct fixed point (the
    TPC-H Q3 encoding); the Lorenz scan runs on the brand-bounded
    frame. Value-equal brands commute in the numerator, so the order
    tie-break is presentation-only."""
    from .functions.grouped import sorted_aggregate
    from .functions.joins import probe_sorted
    import pandas as pd
    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"]).to_pandas()
    bid = part["p_brand"].str.slice(6).astype("int64").to_numpy()
    order = np.argsort(part["p_partkey"].to_numpy())
    ref = ray.put((part["p_partkey"].to_numpy()[order], bid[order]))

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)
        brand = probe_sorted(
            keys, vals, b["l_partkey"].to_numpy(zero_copy_only=False))
        price_c = pc.cast(pc.round(pc.multiply(
            b["l_extendedprice"], 100.0)), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        disc = pc.cast(pc.round(pc.multiply(b["l_discount"], 100.0)),
                       pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"b": pa.array(brand, pa.int64()),
                      "rev": pa.array(price_c * (100 - disc))})
        return t.group_by(["b"], use_threads=False) \
            .aggregate([("rev", "sum")]).rename_columns(["b", "rev"])

    rev = sorted_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        ["b"], [("rev", "sum")], ["b", "rev"], 1).to_pandas() \
        .sort_values(["rev", "b"]).reset_index(drop=True)
    x = rev["rev"].to_numpy()
    n = len(x)
    i = np.arange(1, n + 1, dtype=np.int64)
    num = int(((2 * i - n - 1) * x).sum())
    den = int(n * x.sum())
    if max(abs(num), den) >= 1 << 62:
        raise OverflowError("gini: rescale revenue units")
    return pd.DataFrame({"n_brands": pd.Series([n], dtype="int64"),
                         "gini_num": pd.Series([num], dtype="int64"),
                         "gini_den": pd.Series([den], dtype="int64")})


SAMPLE_W_CAP = 2000


def _q_sample_weighted(sf_dir: str):
    """Weight-proportional deterministic Bernoulli sample: keep doc iff
    splitmix64(doc_id) % CAP < min(n_chars, CAP) — inclusion probability
    ∝ document length (capped), pure integer comparison, zero shuffle,
    reproducible on any cluster shape (the weighted counterpart of
    sample_hash)."""
    from .functions.sampling import splitmix64
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"])

    def keep(b: pa.Table) -> pa.Table:
        ids = pc.cast(b["doc_id"], pa.int64())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = splitmix64(ids.to_numpy().view(np.uint64))
        w = np.minimum(b["n_chars"].to_numpy(zero_copy_only=False),
                       SAMPLE_W_CAP)
        t = b.filter(pa.array((h % np.uint64(SAMPLE_W_CAP))
                              .astype(np.int64) < w))
        ww = np.minimum(t["n_chars"].to_numpy(zero_copy_only=False),
                        SAMPLE_W_CAP)
        return t.append_column("w", pa.array(ww, pa.int64()))

    return docs.map_batches(keep, batch_format="pyarrow",
                            zero_copy_batch=True).sort("doc_id")


def _q_rel_herfindahl(sf_dir: str):
    """Herfindahl–Hirschman market-concentration index of per-supplier
    revenue, as an exact integer fraction: HHI = Σ s_i² with
    s_i = rev_i / total, reported as (Σ r_i², (Σ r_i)²) so no float
    division ever happens. Revenue folds distributed in cents×pct
    fixed point (TPC-H Q3 encoding); per-supplier totals are floored
    to 100-dollar units IDENTICALLY on both sides so the squares stay
    inside int64 (guarded)."""
    from .functions.grouped import sorted_aggregate
    import pandas as pd
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(
            b["l_extendedprice"], 100.0)), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        disc = pc.cast(pc.round(pc.multiply(b["l_discount"], 100.0)),
                       pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"s": pc.cast(b["l_suppkey"], pa.int64()),
                      "rev": pa.array(price_c * (100 - disc))})
        return t.group_by(["s"], use_threads=False) \
            .aggregate([("rev", "sum")]).rename_columns(["s", "rev"])

    rev = sorted_aggregate(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["s"], [("rev", "sum")], ["s", "rev"], 1).to_pandas()
    # cents×pct -> 100-dollar units, floored per supplier (both twins)
    r = rev["rev"].to_numpy() // 1_000_000
    num = int((r.astype(object) ** 2).sum())
    den = int(r.sum()) ** 2
    if max(num, den) >= 1 << 62:
        raise OverflowError("herfindahl: rescale revenue units")
    return pd.DataFrame({
        "n_suppliers": pd.Series([len(r)], dtype="int64"),
        "hhi_num": pd.Series([num], dtype="int64"),
        "hhi_den": pd.Series([den], dtype="int64")})


def _q_kg_reciprocity(sf_dir: str):
    """Digraph reciprocity of the tool-transition graph: the count of
    directed edges whose reverse edge also exists, over the total edge
    count (self-loops are excluded by edge construction). Edges are
    globally deduped first (the per-block distinct contract of
    ``_tool_transition_edges``); the deduped edge table is vocab²-
    bounded, so the reverse-membership check is a bounded driver set
    op — the same pattern as the SCC condensation."""
    from .functions.grouped import grouped_count
    import pandas as pd
    edges = grouped_count(_tool_transition_edges(sf_dir),
                          ["src", "dst"], "__n", 4).to_pandas()
    pairs = set(zip(edges["src"], edges["dst"]))
    n_recip = sum((b, a) in pairs for a, b in pairs)
    return pd.DataFrame({
        "n_edges": pd.Series([len(pairs)], dtype="int64"),
        "n_recip": pd.Series([n_recip], dtype="int64")})


def _q_text_heaps_law(sf_dir: str):
    """Heaps'-law vocabulary-growth curve: cumulative token and distinct-
    word counts at 10 doc-id checkpoints d_k = k·max(doc_id)//10. The
    distributed form needs NO prefix scan over docs: a word first
    appears at first_doc = min(doc_id), so cum_vocab(d_k) is a count of
    words with first_doc ≤ d_k — one grouped-min over the token stream,
    then a 10-bucket histogram + driver cumsum. Token counts bucket the
    same way. Single pass over text; only 10-row partials leave it."""
    from .functions.grouped import sorted_aggregate
    import pandas as pd
    mx = int(ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id"]).max("doc_id"))
    docs = _docs(sf_dir)

    def tok(b: pa.Table) -> pa.Table:
        lst = pc.split_pattern(pc.utf8_lower(b["text"].combine_chunks()),
                               " ")
        n_tok = pc.list_value_length(lst).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        # k-bucket of a doc: smallest k with doc_id <= k*mx//10
        kb = -(-10 * did // mx) if mx else np.zeros(len(did), np.int64)
        tk = pa.table({"k": pa.array(kb, pa.int64()),
                       "t": pa.array(n_tok)}) \
            .group_by(["k"], use_threads=False) \
            .aggregate([("t", "sum")]).rename_columns(["k", "t"])
        words = pa.table({
            "w": pc.list_flatten(lst),
            "fd": pa.array(np.repeat(did, n_tok), pa.int64())}) \
            .group_by(["w"], use_threads=False) \
            .aggregate([("fd", "min")]).rename_columns(["w", "fd"])
        return pa.table({
            "w": pa.concat_arrays([pa.array([None] * tk.num_rows,
                                            pa.string()),
                                   words["w"].combine_chunks()]),
            "k": pa.concat_arrays([tk["k"].combine_chunks(),
                                   pa.array([-1] * words.num_rows,
                                            pa.int64())]),
            "t": pa.concat_arrays([tk["t"].combine_chunks(),
                                   words["fd"].combine_chunks()])})

    # ONE tokenize pass feeds both consumers (indicator-union partials)
    stream = docs.map_batches(tok, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    tok_hist = sorted_aggregate(
        stream.map_batches(
            lambda b: b.filter(pc.is_null(b["w"])).select(["k", "t"]),
            batch_format="pyarrow"),
        ["k"], [("t", "sum")], ["k", "t"], 1).to_pandas()
    first = sorted_aggregate(
        stream.map_batches(
            lambda b: b.filter(pc.is_valid(b["w"])).select(["w", "t"]),
            batch_format="pyarrow"),
        ["w"], [("t", "min")], ["w", "fd"], 4)

    def vb(b: pa.Table) -> pa.Table:
        fd = b["fd"].to_numpy(zero_copy_only=False)
        kb = -(-10 * fd // mx) if mx else np.zeros(len(fd), np.int64)
        return pa.table({"k": pa.array(kb, pa.int64()),
                         "v": pa.array(np.ones(len(fd), np.int64))}) \
            .group_by(["k"], use_threads=False) \
            .aggregate([("v", "sum")]).rename_columns(["k", "v"])

    voc_hist = sorted_aggregate(
        first.map_batches(vb, batch_format="pyarrow"),
        ["k"], [("v", "sum")], ["k", "v"], 1).to_pandas()
    ks = np.arange(1, 11, dtype=np.int64)
    tcum = np.zeros(11, np.int64)
    np.add.at(tcum, np.clip(tok_hist["k"].to_numpy(), 0, 10),
              tok_hist["t"].to_numpy())
    vcum = np.zeros(11, np.int64)
    np.add.at(vcum, np.clip(voc_hist["k"].to_numpy(), 0, 10),
              voc_hist["v"].to_numpy())
    return pd.DataFrame({
        "k": pd.Series(ks, dtype="int64"),
        "doc_threshold": pd.Series(ks * mx // 10, dtype="int64"),
        "cum_tokens": pd.Series(np.cumsum(tcum)[1:], dtype="int64"),
        "cum_vocab": pd.Series(np.cumsum(vcum)[1:], dtype="int64")})


def _q_rel_spearman(sf_dir: str):
    """Spearman rank correlation between order price and order date
    over orders ("do later orders cost more"), reported as the exact
    integer pair (n, Σd²) with d = rank_price − rank_day and both
    ranks the DETERMINISTIC global sort position with
    (value, o_orderkey) tie-break — row_number semantics on both
    twins, so ties commute identically. Each rank is ONE packed-int64
    sort + zip_with_index (the RFM machinery); ranks join back by
    order key and the d² sum folds distributed. (lineitem has no
    unique line key in this testdata, hence orders.)"""
    from .functions.joins import attach_column, zip_with_index
    import pandas as pd
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def base(b: pa.Table) -> pa.Table:
        key = b["o_orderkey"].to_numpy(zero_copy_only=False)
        q = pc.divide(pc.cast(b["o_orderdate"], pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64())) \
            .to_numpy(zero_copy_only=False)
        p = pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        if (key >= 1 << 30).any() or (p >= 1 << 33).any() \
                or (q >= 1 << 33).any():
            raise OverflowError("spearman pack: rescale keys")
        return pa.table({"key": pa.array(key), "q": pa.array(q),
                         "p": pa.array(p)})

    tab = od.map_batches(base, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()

    def ranked(col: str) -> ray.data.Dataset:
        def pack(b: pa.Table, _c=col) -> pa.Table:
            v = b[_c].to_numpy(zero_copy_only=False)
            k = b["key"].to_numpy(zero_copy_only=False)
            return pa.table({"key": b["key"],
                             "__k": pa.array((v << 30) | k, pa.int64())})
        return zip_with_index(
            tab.map_batches(pack, batch_format="pyarrow").sort("__k"),
            id_col="__rank", order_by="__k") \
            .map_batches(lambda b: b.select(["key", "__rank"]),
                         batch_format="pyarrow")

    rq, rp = ranked("q"), ranked("p")
    joined = attach_column(
        rq, rp, [("key", pa.int64()), ("__rank", pa.int64())],
        "key", "key", "__rank", "__rp", pa.int64(), 8)

    def d2(b: pa.Table) -> pa.Table:
        d = (b["__rank"].to_numpy(zero_copy_only=False)
             - b["__rp"].to_numpy(zero_copy_only=False))
        m = int(np.abs(d).max()) if len(d) else 0
        if m * m * max(len(d), 1) >= 1 << 62:  # silent int64 wrap guard
            raise OverflowError("spearman: block d2 overflow")
        return pa.table({"n": pa.array([b.num_rows], pa.int64()),
                         "sd": pa.array([int((d * d).sum())], pa.int64())})

    parts = joined.map_batches(d2, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    sd = int(parts["sd"].sum())
    if sd >= 1 << 62:
        raise OverflowError("spearman: d2 sum overflow")
    return pd.DataFrame({"n_rows": pd.Series([n], dtype="int64"),
                         "sum_d2": pd.Series([sd], dtype="int64")})


PROX_W1, PROX_W2, PROX_K = "hash", "merge", 5


def _q_search_proximity(sf_dir: str):
    """Proximity search: docs where '{hash}' and '{merge}' occur within
    5 token positions, with the exact minimum gap. One vectorized pass:
    flat token masks for the two terms, then the merged-order adjacency
    invariant (the minimizing cross pair has no other hit between it,
    so it is ADJACENT in the merged position order — an O(hits) scan,
    never the O(occ²) cross join the SQL twin runs). Docs live whole in
    rows, so block partials are final."""
    docs = _docs(sf_dir)
    i64 = pa.int64()
    out_schema = pa.schema([("doc_id", i64), ("min_gap", i64)])

    def f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        toks = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = np.asarray(toks.offsets) - toks.offsets[0].as_py()
        flat = toks.flatten()
        m1 = pc.equal(flat, PROX_W1).to_numpy(zero_copy_only=False)
        m2 = pc.equal(flat, PROX_W2).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(m1 | m2)
        if len(idx) < 2:
            return out_schema.empty_table()
        doc = np.searchsorted(offs, idx, side="right") - 1
        typ = m1[idx]
        same_doc = doc[1:] == doc[:-1]
        cross = typ[1:] != typ[:-1]
        ok = same_doc & cross
        if not ok.any():
            return out_schema.empty_table()
        gaps = (idx[1:] - idx[:-1])[ok]
        gdoc = doc[1:][ok]
        udoc, start = np.unique(gdoc, return_index=True)
        mg = np.minimum.reduceat(gaps, start)
        keep = mg <= PROX_K
        ids = pc.cast(b["doc_id"], i64).to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(ids[udoc[keep]]),
                         "min_gap": pa.array(mg[keep].astype(np.int64))},
                        schema=out_schema)

    df = docs.map_batches(f, batch_format="pyarrow").sort("doc_id") \
        .to_pandas()
    if df.empty:
        import pandas as pd
        df = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                           "min_gap": pd.Series(dtype="int64")})
    return df


def _q_ml_calibration_bins(sf_dir: str):
    """Calibration / reliability table for a score-vs-label pair: order
    price (cents) as the score, status 'F' as the positive label, 10
    equi-width bins over the global [min, max] — per bin the row count
    and positive count, the exact integers a reliability diagram plots.
    Two tiny metadata aggregates fix the bin edges; the histogram folds
    as 10-row block partials (no shuffle of order rows)."""
    from .functions.grouped import sorted_aggregate
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_totalprice", "o_orderstatus"])

    def cents(b: pa.Table) -> pa.Table:
        p = pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                    pa.int64())
        return pa.table({"p": p, "pos": pc.cast(
            pc.equal(b["o_orderstatus"], "F"), pa.int64())})

    base = od.map_batches(cents, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    mn = int(base.min("p"))
    mx = int(base.max("p"))
    width = mx - mn + 1

    def hist(b: pa.Table) -> pa.Table:
        p = b["p"].to_numpy(zero_copy_only=False)
        binx = (p - mn) * 10 // width
        return pa.table({"bin": pa.array(binx, pa.int64()),
                         "n": pa.array(np.ones(len(p), np.int64)),
                         "n_pos": b["pos"]}) \
            .group_by(["bin"], use_threads=False) \
            .aggregate([("n", "sum"), ("n_pos", "sum")]) \
            .rename_columns(["bin", "n", "n_pos"])

    return sorted_aggregate(
        base.map_batches(hist, batch_format="pyarrow"),
        ["bin"], [("n", "sum"), ("n_pos", "sum")],
        ["bin", "n", "n_pos"], 1).sort("bin")


DP_SALT = 0x5DEECE66D


def _q_privacy_dp_noisy_counts(sf_dir: str):
    """Differential-privacy-STYLE noisy release of per-event-type counts:
    noise = splitmix64(n XOR salt) % 21 − 10, clamped at zero. The noise
    is DETERMINISTIC (seeded from the exact count) so the oracle can
    twin it bit-for-bit — the released mechanism plumbing (count →
    noise → clamp) is the operator under test, not the entropy source;
    swap the seed for a real RNG in production. Counts fold distributed;
    the noise pass touches only the vocab-bounded result."""
    from .functions.grouped import grouped_count
    from .functions.sampling import splitmix64
    import pandas as pd
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type"])
    cnt = grouped_count(ev, ["event_type"], "n", 1).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    n = cnt["n"].to_numpy().astype(np.uint64)
    h = splitmix64(n ^ np.uint64(DP_SALT))
    noise = (h % np.uint64(21)).astype(np.int64) - 10
    noisy = np.maximum(cnt["n"].to_numpy() + noise, 0)
    return pd.DataFrame({"event_type": cnt["event_type"],
                         "n_noisy": pd.Series(noisy, dtype="int64")})


REGEX_PATTERN = r"(?:hash|merge) (?:join|scan)"  # non-capturing: pyarrow
# extract_regex rejects unnamed capture groups


def _q_text_regex_extract(sf_dir: str):
    """Regex extraction over the corpus: the first match of an
    alternation pattern per document (both engines are RE2 — identical
    leftmost-first semantics). `pc.extract_regex` runs the compiled
    automaton once per batch; non-matching docs drop out."""
    docs = _docs(sf_dir)
    i64 = pa.int64()
    out_schema = pa.schema([("doc_id", i64), ("match", pa.string())])

    def f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        ex = pc.extract_regex(pc.utf8_lower(b["text"]),
                              f"(?P<m>{REGEX_PATTERN})")
        m = pc.struct_field(ex, "m")
        keep = pc.is_valid(m)
        return pa.table({"doc_id": pc.cast(b["doc_id"], i64)
                         .filter(keep),
                         "match": m.filter(keep)}, schema=out_schema)

    df = docs.map_batches(f, batch_format="pyarrow").sort("doc_id") \
        .to_pandas()
    if df.empty:
        import pandas as pd
        df = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                           "match": pd.Series(dtype="object")})
    return df


def _q_rel_lorenz(sf_dir: str):
    """Lorenz-curve deciles of customer spend — the curve behind the
    Gini scalar: customers NTILE(10)-ranked by total spend (cents, tie
    -break custkey), per-decile and cumulative revenue as exact ints.
    The global decile uses the distributed rank path (packed int64
    sort + zip_with_index + SQL-NTILE's closed-form fill rule, the RFM
    machinery); only 10-row partials reach the driver."""
    from .functions.grouped import sorted_aggregate
    from .functions.joins import zip_with_index
    import pandas as pd
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({
            "ck": pc.cast(b["o_custkey"], pa.int64()),
            "spend": pc.cast(pc.round(pc.multiply(
                b["o_totalprice"], 100.0)), pa.int64())}) \
            .group_by(["ck"], use_threads=False) \
            .aggregate([("spend", "sum")]).rename_columns(["ck", "spend"])

    per_cust = sorted_aggregate(
        od.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["ck"], [("spend", "sum")], ["ck", "spend"], 8).materialize()
    n = per_cust.count()
    q, r = n // 10, n % 10
    cut = r * (q + 1)

    def pack(b: pa.Table) -> pa.Table:
        s = b["spend"].to_numpy(zero_copy_only=False)
        c = b["ck"].to_numpy(zero_copy_only=False)
        if (s >= 1 << 32).any() or (c >= 1 << 31).any() or (s < 0).any():
            raise OverflowError("lorenz pack: rescale spend")
        return b.append_column("__k", pa.array((s << 31) | c, pa.int64()))

    ranked = zip_with_index(
        per_cust.map_batches(pack, batch_format="pyarrow",
                             zero_copy_batch=True).sort("__k"),
        id_col="__rank", order_by="__k")

    def dec(b: pa.Table) -> pa.Table:
        rank = b["__rank"].to_numpy(zero_copy_only=False)
        d = np.where(rank < cut, rank // max(q + 1, 1),
                     r + (rank - cut) // max(q, 1)) + 1
        return pa.table({"decile": pa.array(d, pa.int64()),
                         "n": pa.array(np.ones(len(d), np.int64)),
                         "rev": b["spend"]}) \
            .group_by(["decile"], use_threads=False) \
            .aggregate([("n", "sum"), ("rev", "sum")]) \
            .rename_columns(["decile", "n", "rev"])

    h = sorted_aggregate(
        ranked.map_batches(dec, batch_format="pyarrow"),
        ["decile"], [("n", "sum"), ("rev", "sum")],
        ["decile", "n", "rev"], 1).to_pandas() \
        .sort_values("decile").reset_index(drop=True)
    return pd.DataFrame({
        "decile": h["decile"].astype("int64"),
        "n_customers": h["n"].astype("int64"),
        "decile_rev_c": h["rev"].astype("int64"),
        "cum_rev_c": h["rev"].cumsum().astype("int64")})


HOLT_S = 1024  # level/trend fixed-point scale


def _tdiv2(x: np.ndarray) -> np.ndarray:
    """Integer division by 2 truncating toward zero (DuckDB ``//``
    semantics; numpy's ``//`` floors, diverging on odd negatives)."""
    return x // 2 + ((x % 2 != 0) & (x < 0))


def _q_events_holt(sf_dir: str):
    """Holt double-exponential smoothing (level + trend) over the
    zero-filled daily event-count series, α=β=1/2 in ×1024 integer
    fixed point with trunc-toward-zero halving — bit-equal to the
    recursive-CTE twin. Daily counts fold distributed; the sequential
    recursion runs on the driver over the day-bounded series (days
    don't grow with row count)."""
    from .functions.grouped import grouped_count
    import pandas as pd
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def days(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        return pa.table({"day": pc.divide(
            us, pa.scalar(86_400_000_000, pa.int64()))})

    d = grouped_count(ev.map_batches(days, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      ["day"], "c", 1).to_pandas()
    lo, hi = int(d["day"].min()), int(d["day"].max())
    spine = np.zeros(hi - lo + 1, np.int64)
    spine[d["day"].to_numpy() - lo] = d["c"].to_numpy()
    n = len(spine)
    lvl = np.zeros(n, np.int64)
    trd = np.zeros(n, np.int64)
    lvl[0] = spine[0] * HOLT_S
    for t in range(1, n):
        lvl[t] = _tdiv2(np.array([lvl[t - 1] + trd[t - 1]
                                  + spine[t] * HOLT_S]))[0]
        trd[t] = _tdiv2(np.array([trd[t - 1]
                                  + (lvl[t] - lvl[t - 1])]))[0]
    return pd.DataFrame({
        "day": pd.Series(np.arange(lo, hi + 1), dtype="int64"),
        "c": pd.Series(spine, dtype="int64"),
        "level_fp": pd.Series(lvl, dtype="int64"),
        "trend_fp": pd.Series(trd, dtype="int64")})


def _q_kg_transitivity(sf_dir: str):
    """Global transitivity of the co-mention graph: the exact integer
    pair (closed triads = 3·triangles via the two-join streaming count,
    wedges = Σ d(d−1)/2 from one grouped degree count) — the ratio a
    caller divides at presentation time. Node naming cancels from both
    counts, so the Ray side runs on mention-IRI pairs while the oracle
    runs on raw canonicals; the degree table is vocab-bounded."""
    from .functions.grouped import grouped_count
    from .functions.triangles import triangle_count, within_group_pairs
    import pandas as pd
    m = _q_mentions(sf_dir).map_batches(
        lambda b: pa.table({"turn": b["subj"], "c": b["obj"]}),
        batch_format="pyarrow")
    edges = within_group_pairs(m, "turn", "c").materialize()
    tri = int(triangle_count(edges)["n_triangles"][0].as_py())
    und = edges.map_batches(
        lambda b: pa.table({"n": pa.concat_arrays(
            [b["u"].combine_chunks(), b["v"].combine_chunks()])}),
        batch_format="pyarrow")
    deg = grouped_count(und, ["n"], "d", 4).to_pandas()
    dd = deg["d"].to_numpy()
    wedges = int((dd * (dd - 1) // 2).sum())
    return pd.DataFrame({
        "n_triangles": pd.Series([tri], dtype="int64"),
        "n_wedges": pd.Series([wedges], dtype="int64")})


def _q_events_cohort_revenue(sf_dir: str):
    """Cohort revenue matrix (ARPU numerator): total value cents per
    (first-event-week cohort, weeks-since-cohort age) — the revenue
    companion to the retention user-count matrix. Same three-pass
    shape: grouped min (cohort), int-key attach, grouped fixed-point
    sum with map-side combine."""
    from .functions.grouped import sorted_aggregate
    from .functions.joins import attach_column
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "value"])
    week_us = 7 * 86400 * 10**6

    def prep(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        return pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "wk": pc.divide(us, pa.scalar(week_us, pa.int64())),
            "v": pc.cast(pc.round(pc.multiply(b["value"], 100.0)),
                         pa.int64())})

    w = ev.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True).materialize()
    first = sorted_aggregate(
        w.map_batches(lambda b: b.select(["user_id", "wk"]),
                      batch_format="pyarrow"),
        ["user_id"], [("wk", "min")], ["user_id", "cohort"], 4)
    joined = attach_column(
        w, first, [("user_id", pa.int64()), ("wk", pa.int64()),
                   ("v", pa.int64())],
        "user_id", "user_id", "cohort", "cohort", pa.int64(), 4)

    def partial(b: pa.Table) -> pa.Table:
        age = pc.subtract(b["wk"], b["cohort"])
        return pa.table({"cohort": b["cohort"], "age": age,
                         "rev_c": b["v"]}) \
            .group_by(["cohort", "age"], use_threads=False) \
            .aggregate([("rev_c", "sum")]) \
            .rename_columns(["cohort", "age", "rev_c"])

    return sorted_aggregate(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["cohort", "age"], [("rev_c", "sum")],
        ["cohort", "age", "rev_c"], 4)


def _q_ml_tree_depth2(sf_dir: str):
    """Greedy CART tree of depth 2 over (l_quantity, l_discount pct)
    predicting l_returnflag == 'R', scored by exact integer
    misclassification (the stump criterion, so the argmin needs no
    Gini floats). ONE distributed grouped count over the ≤ |q|·|d|·2
    distinct (feature, feature, label) combos is the only pass over
    data; the greedy root + two branch scans run on that bounded
    frame. Split tie-break: (miscls, feature name, threshold) — the
    all-left threshold is excluded so both children are non-empty.
    Output: one row per node (root/left/right)."""
    from .functions.grouped import grouped_count
    import pandas as pd
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_discount", "l_returnflag"])

    def fl(b: pa.Table) -> pa.Table:
        return pa.table({
            "q": pc.cast(pc.round(b["l_quantity"]), pa.int64()),
            "d": pc.cast(pc.round(pc.multiply(b["l_discount"], 100.0)),
                         pa.int64()),
            "pos": pc.cast(pc.equal(b["l_returnflag"], "R"), pa.int64())})

    c = grouped_count(li.map_batches(fl, batch_format="pyarrow"),
                      ["q", "d", "pos"], "n", 4).to_pandas()
    c["npos"] = c["n"] * c["pos"]

    def best_split(fr):
        T, P = int(fr["n"].sum()), int(fr["npos"].sum())
        best = None
        for feat in ("d", "q"):  # lexicographic feature tie-break
            g = fr.groupby(feat).agg(nq=("n", "sum"),
                                     pq=("npos", "sum")).sort_index()
            if len(g) < 2:
                continue
            nl = g["nq"].cumsum().to_numpy()[:-1]
            pl = g["pq"].cumsum().to_numpy()[:-1]
            thr = g.index.to_numpy()[:-1]
            mis = (np.minimum(pl, nl - pl)
                   + np.minimum(P - pl, (T - nl) - (P - pl)))
            i = int(np.lexsort((thr, mis))[0])
            cand = (int(mis[i]), feat, int(thr[i]))
            if best is None or cand < best:
                best = cand
        if best is None:
            return ("none", 0, min(P, T - P), T, P)
        return (best[1], best[2], best[0], T, P)

    f0, t0, m0, T, P = best_split(c)
    if f0 == "none":
        raise ValueError("tree root: no splittable feature")
    left = c[c[f0] <= t0]
    right = c[c[f0] > t0]
    rows = [("root", f0, t0, T, P, m0)]
    for node, fr in (("left", left), ("right", right)):
        f, t, m, n, p = best_split(fr)
        rows.append((node, f, t, n, p, m))
    out = pd.DataFrame(rows, columns=["node", "feature", "threshold",
                                      "n", "n_pos", "split_mis"])
    for col in ("threshold", "n", "n_pos", "split_mis"):
        out[col] = out[col].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def _q_events_decay_engagement(sf_dir: str):
    """Recency-weighted engagement score per user: Σ value_cents >> age
    with age = days before the corpus max day — exponential half-life
    decay in EXACT integers (a right shift per day, floor semantics
    identical to SQL ``//`` power-of-two division on the non-negative
    values). One metadata max + one pass of per-user partials."""
    from .functions.grouped import sorted_aggregate
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "value"])
    mx = int(ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts"])
        .map_batches(lambda b: pa.table({"day": pc.divide(
            pc.cast(b["ts"], pa.int64()),
            pa.scalar(86_400_000_000, pa.int64()))}),
            batch_format="pyarrow").max("day"))

    def partial(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b["ts"], pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64())) \
            .to_numpy(zero_copy_only=False)
        v = pc.cast(pc.round(pc.multiply(b["value"], 100.0)), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        age = np.minimum(mx - day, 62)
        return pa.table({"user_id": pc.cast(b["user_id"], pa.int64()),
                         "s": pa.array(v >> age)}) \
            .group_by(["user_id"], use_threads=False) \
            .aggregate([("s", "sum")]) \
            .rename_columns(["user_id", "decay_score_c"])

    return sorted_aggregate(
        ev.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id"], [("decay_score_c", "sum")],
        ["user_id", "decay_score_c"], 4)


def _q_kg_comention_lift(sf_dir: str):
    """Association lift of entity co-mention pairs: lift = P(x,y) /
    (P(x)·P(y)) over turns, released as the exact integer
    10⁶·N·n_xy // (n_x·n_y) (no float logs — the PMI ordering is
    monotone in lift). Pair counts come from the counted (non-distinct)
    within-turn pair expansion; marginals are one grouped count. All
    result tables are vocab-bounded, so the final arithmetic is a
    bounded driver merge (the reciprocity pattern)."""
    from .functions.grouped import grouped_count
    from .functions.triangles import within_group_pairs
    import pandas as pd
    pre = C.ENT + "mention/"
    m = _q_mentions(sf_dir).map_batches(
        lambda b: pa.table({
            "turn": b["subj"],
            "c": pc.utf8_slice_codeunits(b["obj"], len(pre))}),
        batch_format="pyarrow").materialize()
    n_turns = int(grouped_count(
        m.map_batches(lambda b: b.select(["turn"]),
                      batch_format="pyarrow"),
        ["turn"], "__n", 4).count())
    marg = grouped_count(m.map_batches(
        lambda b: b.select(["c"]), batch_format="pyarrow"),
        ["c"], "nx", 4).to_pandas()
    pairs = grouped_count(
        within_group_pairs(m, "turn", "c", distinct=False),
        ["u", "v"], "n_xy", 4).to_pandas()
    nx = dict(zip(marg["c"], marg["nx"]))
    lift = [10**6 * n_turns * int(n) // (nx[u] * nx[v])
            for u, v, n in zip(pairs["u"], pairs["v"], pairs["n_xy"])]
    return pd.DataFrame({
        "entity_a": pairs["u"], "entity_b": pairs["v"],
        "n_xy": pairs["n_xy"].astype("int64"),
        "lift_fp": pd.Series(lift, dtype="int64")}) \
        .sort_values(["entity_a", "entity_b"]).reset_index(drop=True)


GEN_K, GEN_BASE_SHIFT, GEN_MAX_LEVEL = 10, 10, 10


def _q_privacy_generalization(sf_dir: str):
    """k-anonymity generalization ladder over customer balances: find
    the smallest bucket-width level ℓ (width 2^(10+ℓ) cents) where
    every populated bucket holds ≥ 10 customers, and release that
    level's histogram. The distributed pass builds only the LEVEL-0
    histogram (range-bounded, since balances live in a fixed interval);
    every coarser level is a right-shift fold of it on the driver —
    both twins coarsen the same base histogram, so floor semantics
    agree (offsets make all values non-negative)."""
    from .functions.grouped import grouped_count
    import pandas as pd
    cu = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_acctbal"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({"p": pc.cast(
            pc.round(pc.multiply(b["c_acctbal"], 100.0)), pa.int64())})

    base = cu.map_batches(cents, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    mn = int(base.min("p"))

    def h0(b: pa.Table) -> pa.Table:
        p = b["p"].to_numpy(zero_copy_only=False)
        return pa.table({"b0": pa.array((p - mn) >> GEN_BASE_SHIFT,
                                        pa.int64()),
                         "n": pa.array(np.ones(len(p), np.int64))}) \
            .group_by(["b0"], use_threads=False) \
            .aggregate([("n", "sum")]).rename_columns(["b0", "n"])

    from .functions.grouped import sorted_aggregate
    hist0 = sorted_aggregate(
        base.map_batches(h0, batch_format="pyarrow"),
        ["b0"], [("n", "sum")], ["b0", "n"], 1).to_pandas()
    b0 = hist0["b0"].to_numpy()
    n0 = hist0["n"].to_numpy()
    level = GEN_MAX_LEVEL
    for lv in range(GEN_MAX_LEVEL + 1):
        bl = b0 >> lv
        agg = np.bincount(bl - bl.min(), weights=n0)
        if agg[agg > 0].min() >= GEN_K:
            level = lv
            break
    bl = b0 >> level
    out = pd.DataFrame({"bucket": bl, "n": n0}) \
        .groupby("bucket", as_index=False)["n"].sum() \
        .sort_values("bucket").reset_index(drop=True)
    return pd.DataFrame({
        "level": pd.Series(np.full(len(out), level), dtype="int64"),
        "bucket": out["bucket"].astype("int64"),
        "n": out["n"].astype("int64")})


def _q_kg_shacl_validation(sf_dir: str):
    """SHACL-lite shape validation over the FULL materialized graph:
    per shape, (n_checked, n_violations) as exact integers. Shapes:
    turns with schema:text must carry schema:position; isPartOf
    targets must be rdf:typed; mention objects must be rdf:typed (the
    deliberately-failing shape — mention nodes are untyped by design,
    so the check is non-vacuous). ONE pass re-keys each triple to its
    focus/property role as indicator columns; a grouped MAX per IRI
    then tiny count folds — no joins, no per-shape rescans."""
    from .functions.grouped import sorted_aggregate
    from .pipelines.kg import run_kg
    import pandas as pd
    tri = run_kg(sf_dir)
    ind = ["f1", "p1", "f2", "f3", "p23"]
    schema = pa.schema([("k", pa.string())]
                       + [(c, pa.int64()) for c in ind])

    def rekey(b: pa.Table) -> pa.Table:
        pred = b["pred"]
        subj, obj = b["subj"], b["obj"]

        def m(p):
            return pc.cast(pc.equal(pred, p), pa.int64())

        z = pa.array(np.zeros(b.num_rows, np.int64))
        skey = pa.table({"k": subj, "f1": m(C.PRED_TEXT),
                         "p1": m(C.PRED_POSITION), "f2": z, "f3": z,
                         "p23": m(C.RDF_TYPE)}, schema=schema)
        okey = pa.table({"k": obj, "f1": z, "p1": z,
                         "f2": m(C.PRED_IS_PART_OF),
                         "f3": m(C.PRED_MENTIONS), "p23": z},
                        schema=schema)
        both = pa.concat_tables([skey, okey])
        return both.group_by(["k"], use_threads=False) \
            .aggregate([(c, "max") for c in ind]) \
            .rename_columns(["k"] + ind)

    keyed = sorted_aggregate(
        tri.map_batches(rekey, batch_format="pyarrow"),
        ["k"], [(c, "max") for c in ind], ["k"] + ind, 4)

    def fold(b: pa.Table) -> pa.Table:
        d = {c: b[c].to_numpy(zero_copy_only=False) for c in ind}
        return pa.table({
            "c1": pa.array([int(d["f1"].sum())], pa.int64()),
            "v1": pa.array([int((d["f1"] * (1 - d["p1"])).sum())]),
            "c2": pa.array([int(d["f2"].sum())]),
            "v2": pa.array([int((d["f2"] * (1 - d["p23"])).sum())]),
            "c3": pa.array([int(d["f3"].sum())]),
            "v3": pa.array([int((d["f3"] * (1 - d["p23"])).sum())])})

    s = keyed.map_batches(fold, batch_format="pyarrow").to_pandas().sum()
    return pd.DataFrame({
        "shape": ["ispartof_target_typed", "mention_object_typed",
                  "turn_has_position"],
        "n_checked": pd.Series([s["c2"], s["c3"], s["c1"]],
                               dtype="int64"),
        "n_violations": pd.Series([s["v2"], s["v3"], s["v1"]],
                                  dtype="int64")})


def _q_rel_chi2_independence(sf_dir: str):
    """Pearson χ² independence components for market segment ×
    order priority: per cell the exact integer
    chi2_fp = 10⁶·(N·n_xy − n_x·n_y)² // (N·n_x·n_y) (Σ/10⁶ is the
    statistic). Segment attaches to orders by the broadcast sorted
    probe (customer maps ship once via ray.put); cell counts fold
    distributed; marginal arithmetic runs on the 5×5 cell frame in
    exact Python ints."""
    from .functions.grouped import sorted_aggregate
    from .functions.joins import probe_sorted
    import pandas as pd
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"]).to_pandas()
    segs = np.sort(cust["c_mktsegment"].unique())
    sid = {s: i for i, s in enumerate(segs)}
    order = np.argsort(cust["c_custkey"].to_numpy())
    ref = ray.put((cust["c_custkey"].to_numpy()[order],
                   cust["c_mktsegment"].map(sid).to_numpy()[order]))

    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"])

    def partial(b: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)
        sg = probe_sorted(keys, vals,
                          b["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({"sg": pa.array(sg, pa.int64()),
                         "pri": b["o_orderpriority"],
                         "n": pa.array(np.ones(b.num_rows, np.int64))}) \
            .group_by(["sg", "pri"], use_threads=False) \
            .aggregate([("n", "sum")]).rename_columns(["sg", "pri", "n"])

    cells = sorted_aggregate(
        od.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["sg", "pri"], [("n", "sum")], ["sg", "pri", "n"], 1).to_pandas()
    cells["segment"] = segs[cells["sg"]]
    N = int(cells["n"].sum())
    nx = cells.groupby("segment")["n"].sum().to_dict()
    ny = cells.groupby("pri")["n"].sum().to_dict()
    fp = [10**6 * (N * int(n) - nx[s] * ny[p]) ** 2
          // (N * nx[s] * ny[p])
          for s, p, n in zip(cells["segment"], cells["pri"], cells["n"])]
    return pd.DataFrame({
        "segment": cells["segment"], "priority": cells["pri"],
        "n": cells["n"].astype("int64"),
        "chi2_fp": pd.Series(fp, dtype="int64")}) \
        .sort_values(["segment", "priority"]).reset_index(drop=True)


def _q_kg_two_hop(sf_dir: str):
    """Two-hop reach per tool node: |{v ≠ u reachable in ≤ 2 directed
    steps}| — the ego-network size k=2. Globally-deduped edges, one
    self-join for the 2-step pairs (the triangle-count join shape),
    union with 1-step, global distinct, grouped count."""
    from .functions.grouped import grouped_count
    from .functions.pagerank import _distinct
    edges = grouped_count(_tool_transition_edges(sf_dir),
                          ["src", "dst"], "__n", 4) \
        .map_batches(lambda b: b.select(["src", "dst"]),
                     batch_format="pyarrow").materialize()
    two = edges.join(edges, join_type="inner", num_partitions=4,
                     on=("dst",), right_on=("src",),
                     left_suffix="", right_suffix="_r") \
        .map_batches(lambda b: pa.table({"src": b["src"],
                                         "dst": b["dst_r"]}),
                     batch_format="pyarrow")
    reach = _distinct(edges.union(two), ["src", "dst"], 4) \
        .map_batches(lambda b: b.filter(
            pc.invert(pc.equal(b["src"], b["dst"]))),
            batch_format="pyarrow")
    return grouped_count(reach, ["src"], "n_reach2", 4) \
        .map_batches(lambda b: pa.table({"node": b["src"],
                                         "n_reach2": b["n_reach2"]}),
                     batch_format="pyarrow").sort("node")


RAKE_TOP = 20


def _q_text_rake(sf_dir: str):
    """RAKE keyword scores (Rose et al. 2010): phrases are maximal
    stopword-free token runs; per word freq = occurrences, deg = Σ
    length of containing phrases; score_fp = 1000·deg // freq, top 20
    by (score, word). One vectorized pass: flat tokens, phrase ids by
    cumsum over (stopword | doc-start) breaks, run lengths via
    np.unique — word partials fold distributed, the 20-row head is the
    only driver data."""
    from .functions.grouped import sorted_aggregate
    from .stages.textstats import STOPWORDS
    import pandas as pd
    docs = _docs(sf_dir)
    sw = pa.array(list(STOPWORDS))

    empty = pa.schema([("word", pa.string()), ("freq", pa.int64()),
                       ("deg", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        if len(flat) == 0:
            return empty.empty_table()
        offs = np.asarray(toks.offsets) - toks.offsets[0].as_py()
        stop = pc.is_in(flat, value_set=sw) \
            .to_numpy(zero_copy_only=False)
        brk = stop.copy()
        brk[offs[:-1]] = True  # doc starts break phrases too
        pid = np.cumsum(brk)
        keep = ~stop
        if not keep.any():
            return pa.table({"word": pa.array([], pa.string()),
                             "freq": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        kpid = pid[keep]
        uniq, inv, cnt = np.unique(kpid, return_inverse=True,
                                   return_counts=True)
        plen = cnt[inv]  # phrase length at each kept token
        words = flat.filter(pa.array(keep))
        return pa.table({"word": words,
                         "freq": pa.array(np.ones(len(kpid), np.int64)),
                         "deg": pa.array(plen.astype(np.int64))}) \
            .group_by(["word"], use_threads=False) \
            .aggregate([("freq", "sum"), ("deg", "sum")]) \
            .rename_columns(["word", "freq", "deg"])

    agg = sorted_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["word"], [("freq", "sum"), ("deg", "sum")],
        ["word", "freq", "deg"], 4)
    scored = agg.map_batches(
        lambda b: b.append_column(
            "score_fp", pc.cast(pc.divide(
                pc.multiply(b["deg"], pa.scalar(1000, pa.int64())),
                b["freq"]), pa.int64())),
        batch_format="pyarrow")
    return scored.sort(["score_fp", "word"],
                       descending=[True, False]) \
        .limit(RAKE_TOP).to_pandas()


def _q_ml_adaboost(sf_dir: str):
    """Two-round AdaBoost-style boosting of misclassification stumps
    with INTEGER sample weights: stump 1 on unit weights, weights of
    its misclassified rows double, stump 2 on the reweighted counts —
    every pick and error count an exact integer (the classic exp(α)
    reweight is replaced by the fixed ×2 so both twins agree bit-for-
    bit; the greedy structure is the operator under test). Same ONE
    distributed grouped count as the depth-2 tree; both stump scans
    run on the bounded (q, d, label) frame. Left/right leaf predicts
    its majority label, ties → 0."""
    from .functions.grouped import grouped_count
    import pandas as pd
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_discount", "l_returnflag"])

    def fl(b: pa.Table) -> pa.Table:
        return pa.table({
            "q": pc.cast(pc.round(b["l_quantity"]), pa.int64()),
            "d": pc.cast(pc.round(pc.multiply(b["l_discount"], 100.0)),
                         pa.int64()),
            "pos": pc.cast(pc.equal(b["l_returnflag"], "R"), pa.int64())})

    c = grouped_count(li.map_batches(fl, batch_format="pyarrow"),
                      ["q", "d", "pos"], "n", 4).to_pandas()
    c["npos"] = c["n"] * c["pos"]

    def best_split(fr):
        T, P = int(fr["n"].sum()), int(fr["npos"].sum())
        best = None
        for feat in ("d", "q"):
            g = fr.groupby(feat).agg(nq=("n", "sum"),
                                     pq=("npos", "sum")).sort_index()
            if len(g) < 2:
                continue
            nl = g["nq"].cumsum().to_numpy()[:-1]
            pl = g["pq"].cumsum().to_numpy()[:-1]
            thr = g.index.to_numpy()[:-1]
            mis = (np.minimum(pl, nl - pl)
                   + np.minimum(P - pl, (T - nl) - (P - pl)))
            i = int(np.lexsort((thr, mis))[0])
            cand = (int(mis[i]), feat, int(thr[i]),
                    int(nl[i]), int(pl[i]))
            if best is None or cand[:3] < best[:3]:
                best = cand
        if best is None:
            raise ValueError("adaboost: no splittable feature")
        return best

    m1, f1, t1, nl1, pl1 = best_split(c)
    T, P = int(c["n"].sum()), int(c["npos"].sum())
    # leaf predictions: majority label, tie -> 0
    pred_l = 1 if 2 * pl1 > nl1 else 0
    pred_r = 1 if 2 * (P - pl1) > (T - nl1) else 0
    on_left = c[f1] <= t1
    pred = np.where(on_left, pred_l, pred_r)
    wrong = (pred != c["pos"].to_numpy()).astype(np.int64)
    w = c.copy()
    w["n"] = c["n"] * (1 + wrong)  # x2 on misclassified rows
    w["npos"] = w["n"] * w["pos"]
    m2, f2, t2, _, _ = best_split(w)
    return pd.DataFrame({
        "round": pd.Series([1, 2], dtype="int64"),
        "feature": [f1, f2],
        "threshold": pd.Series([t1, t2], dtype="int64"),
        "mis_weighted": pd.Series([m1, m2], dtype="int64"),
        "total_weight": pd.Series([T, int(w["n"].sum())],
                                  dtype="int64")})


SLA_DAYS = 30


def _q_rel_shipping_sla(sf_dir: str):
    """Shipping SLA conformance per order priority: lineitems shipped
    more than 30 days after their order date, over all lineitems —
    the big×big equi-join pattern (lineitem ⋈ orders on orderkey) via
    the int-key sorted co-group attach; date arithmetic in exact
    epoch-days; per-priority counts fold as tiny partials."""
    from .functions.grouped import sorted_aggregate
    from .functions.joins import attach_column
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"])

    def opack(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b["o_orderdate"], pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64())) \
            .to_numpy(zero_copy_only=False)
        pid = pc.cast(
            pc.utf8_slice_codeunits(b["o_orderpriority"], 0, 1),
            pa.int64()).to_numpy(zero_copy_only=False)
        if (day >= 1 << 20).any():
            raise OverflowError("sla pack: day out of range")
        return pa.table({"k": b["o_orderkey"],
                         "v": pa.array((pid << 20) | day, pa.int64())})

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"])

    def lprep(b: pa.Table) -> pa.Table:
        sday = pc.divide(pc.cast(b["l_shipdate"], pa.int64()),
                         pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"l_orderkey": pc.cast(b["l_orderkey"],
                                               pa.int64()),
                         "sday": sday})

    joined = attach_column(
        li.map_batches(lprep, batch_format="pyarrow",
                       zero_copy_batch=True),
        od.map_batches(opack, batch_format="pyarrow",
                       zero_copy_batch=True),
        [("l_orderkey", pa.int64()), ("sday", pa.int64())],
        "l_orderkey", "k", "v", "ov", pa.int64(), 8)

    def partial(b: pa.Table) -> pa.Table:
        ov = b["ov"].to_numpy(zero_copy_only=False)
        pid = ov >> 20
        oday = ov & ((1 << 20) - 1)
        late = (b["sday"].to_numpy(zero_copy_only=False) - oday
                > SLA_DAYS).astype(np.int64)
        return pa.table({"pid": pa.array(pid, pa.int64()),
                         "n_lines": pa.array(np.ones(len(ov), np.int64)),
                         "n_late": pa.array(late)}) \
            .group_by(["pid"], use_threads=False) \
            .aggregate([("n_lines", "sum"), ("n_late", "sum")]) \
            .rename_columns(["pid", "n_lines", "n_late"])

    return sorted_aggregate(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["pid"], [("n_lines", "sum"), ("n_late", "sum")],
        ["pid", "n_lines", "n_late"], 1).sort("pid")


def _q_text_ttr(sf_dir: str):
    """Type-token ratio (lexical diversity) per document: distinct
    words / tokens in ×10⁶ fixed point. Docs live whole in rows, so
    one vectorized block pass suffices: flat tokens lexsorted by
    (doc, word), per-doc type counts via boundary flags + reduceat —
    no per-doc Python loop, no shuffle."""
    docs = _docs(sf_dir)
    i64 = pa.int64()
    schema = pa.schema([("doc_id", i64), ("n_tokens", i64),
                        ("n_types", i64), ("ttr_fp", i64)])

    def f(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        if len(flat) == 0:
            return schema.empty_table()
        offs = np.asarray(toks.offsets) - toks.offsets[0].as_py()
        n_tok = np.diff(offs).astype(np.int64)
        doc = np.repeat(np.arange(b.num_rows), n_tok)
        code = pa.compute.dictionary_encode(flat).indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((code, doc))
        ds_, cs_ = doc[order], code[order]
        new = np.ones(len(ds_), bool)
        new[1:] = (ds_[1:] != ds_[:-1]) | (cs_[1:] != cs_[:-1])
        starts = offs[:-1]
        n_types = np.add.reduceat(new.astype(np.int64), starts)
        ids = pc.cast(b["doc_id"], i64).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(n_tok),
            "n_types": pa.array(n_types),
            "ttr_fp": pa.array(10**6 * n_types // n_tok)}, schema=schema)

    return docs.map_batches(f, batch_format="pyarrow").sort("doc_id")


def _q_events_spike_days(sf_dir: str):
    """Rate-spike detection over daily event counts: day t flags when
    7·c_t > 2·Σ(c_{t−7..t−1}) — a trailing-mean threshold in exact
    integer cross-multiplication (no float rate). Counts fold
    distributed; the trailing comparison runs on the day-bounded spine
    (the Holt pattern); days 0-6 never flag (incomplete window),
    matching the twin's window-size guard."""
    from .functions.grouped import grouped_count
    import pandas as pd
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def days(b: pa.Table) -> pa.Table:
        return pa.table({"day": pc.divide(
            pc.cast(b["ts"], pa.int64()),
            pa.scalar(86_400_000_000, pa.int64()))})

    d = grouped_count(ev.map_batches(days, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      ["day"], "c", 1).to_pandas()
    lo, hi = int(d["day"].min()), int(d["day"].max())
    spine = np.zeros(hi - lo + 1, np.int64)
    spine[d["day"].to_numpy() - lo] = d["c"].to_numpy()
    cum = np.concatenate([[0], np.cumsum(spine)])
    trail = np.zeros_like(spine)
    trail[7:] = cum[7:-1] - cum[:-8]
    flag = np.zeros_like(spine)
    flag[7:] = (7 * spine[7:] > 2 * trail[7:]).astype(np.int64)
    return pd.DataFrame({
        "day": pd.Series(np.arange(lo, hi + 1), dtype="int64"),
        "c": pd.Series(spine, dtype="int64"),
        "trail7": pd.Series(trail, dtype="int64"),
        "is_spike": pd.Series(flag, dtype="int64")})


def _q_kg_sparql_sample_agg(sf_dir: str):
    """SPARQL SAMPLE() aggregate: per tool, SAMPLE(?m) + COUNT(?m)
    over the mentions×usesTool BGP — SAMPLE made deterministic as the
    lexicographic MIN binding (a SPARQL engine may pick any; the twin
    pins the same choice). One grouped (min, count) over the matcher's
    distinct bindings."""
    from .functions.bgp import bgp_match
    from .functions.grouped import sorted_aggregate
    pre = C.ENT + "mention/"
    dd = bgp_match(
        _mention_union_tri(sf_dir),
        [("?t", C.PRED_MENTIONS, "?m"), ("?t", C.PRED_USES_TOOL, "?tool")],
        ["m", "tool"], num_partitions=8)

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "tool": b["tool"],
            "sample_m": pc.utf8_slice_codeunits(b["m"], len(pre)),
            "n_bindings": pa.array(np.ones(b.num_rows, np.int64))})

    return sorted_aggregate(
        dd.map_batches(prep, batch_format="pyarrow"),
        ["tool"], [("sample_m", "min"), ("n_bindings", "sum")],
        ["tool", "sample_m", "n_bindings"], 4).sort("tool")


SPARQL_PAGE, SPARQL_PAGE_SIZE = 1, 10


def _q_kg_sparql_order_offset(sf_dir: str):
    """SPARQL pagination: ORDER BY ?m OFFSET 10 LIMIT 10 over the
    distinct mention bindings — the OFFSET solution modifier
    (kg_sparql_topk covers LIMIT alone). The page slices DISTRIBUTED:
    one global sort + zip_with_index rank, rank∈[10,20) filtered in a
    map — no driver take of the prefix, so a deep OFFSET stays
    scale-safe."""
    from .functions.bgp import bgp_match
    from .functions.joins import zip_with_index
    pre = C.ENT + "mention/"
    dd = bgp_match(
        _mention_union_tri(sf_dir),
        [("?t", C.PRED_MENTIONS, "?m"), ("?t", C.PRED_USES_TOOL, "?tool")],
        ["m", "tool"], num_partitions=8)
    rows = dd.map_batches(
        lambda b: pa.table({
            "m": pc.utf8_slice_codeunits(b["m"], len(pre)),
            "tool": b["tool"]}),
        batch_format="pyarrow") \
        .map_batches(lambda b: b.append_column(
            "__k", pc.binary_join_element_wise(b["m"], b["tool"], "\x00")),
            batch_format="pyarrow")
    ranked = zip_with_index(rows.sort("__k"), id_col="__r",
                            order_by="__k")
    lo = SPARQL_PAGE * SPARQL_PAGE_SIZE
    hi = lo + SPARQL_PAGE_SIZE
    return ranked.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b["__r"], lo), pc.less(b["__r"], hi)))
        .select(["m", "tool"]),
        batch_format="pyarrow").sort(["m", "tool"])


def _q_kg_property_cardinality(sf_dir: str):
    """Per-predicate cardinality profile of the FULL graph — the
    schema-discovery stats a KG curator reads first: triple count,
    distinct subjects, and the max fan-out (triples per subject).
    Two-level aggregate: ONE grouped (pred, subj) count, then tiny
    per-pred folds of (sum, count, max) — never a distinct over raw
    triples."""
    from .functions.grouped import grouped_count, sorted_aggregate
    from .pipelines.kg import run_kg
    ps = grouped_count(
        run_kg(sf_dir).map_batches(
            lambda b: b.select(["pred", "subj"]),
            batch_format="pyarrow"),
        ["pred", "subj"], "n", 8)

    def fold(b: pa.Table) -> pa.Table:
        return pa.table({"pred": b["pred"], "n_triples": b["n"],
                         "n_subjects": pa.array(
                             np.ones(b.num_rows, np.int64)),
                         "max_per_subj": b["n"]}) \
            .group_by(["pred"], use_threads=False) \
            .aggregate([("n_triples", "sum"), ("n_subjects", "sum"),
                        ("max_per_subj", "max")]) \
            .rename_columns(["pred", "n_triples", "n_subjects",
                             "max_per_subj"])

    return sorted_aggregate(
        ps.map_batches(fold, batch_format="pyarrow"),
        ["pred"], [("n_triples", "sum"), ("n_subjects", "sum"),
                   ("max_per_subj", "max")],
        ["pred", "n_triples", "n_subjects", "max_per_subj"], 1) \
        .sort("pred")


def _q_text_char_density(sf_dir: str):
    """Character-class density per document (script/quality signal):
    total chars, vowels, spaces, and the ×10⁶ vowel ratio — one
    compiled-regex count kernel per class per batch
    (pc.count_substring_regex), no tokenization, no Python chars."""
    docs = _docs(sf_dir)
    i64 = pa.int64()

    def f(b: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(b["text"])
        n = pc.utf8_length(txt)
        nv = pc.count_substring_regex(txt, "[aeiou]")
        ns = pc.count_substring_regex(txt, " ")
        n64 = pc.cast(n, i64).to_numpy(zero_copy_only=False)
        nv64 = pc.cast(nv, i64).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], i64),
            "n_chars": pa.array(n64),
            "n_vowels": pa.array(nv64),
            "n_spaces": pc.cast(ns, i64),
            "vowel_fp": pa.array(
                10**6 * nv64 // np.maximum(n64, 1))})

    return docs.map_batches(f, batch_format="pyarrow").sort("doc_id")


COOC_WORDS = ("hash", "join", "merge", "scan")
COOC_MAXDIST = 2


def _q_text_window_cooccur(sf_dir: str):
    """Windowed co-occurrence counts for a fixed query vocabulary:
    unordered word pairs within token distance 1..2 (skip-gram-style
    context pairs over raw text, where pmi_bigrams sees only
    adjacency). Vectorized: code array over flat tokens (−1 =
    non-query), one shifted AND per distance — O(tokens·maxdist), no
    positional join; the oracle pays the O(occ²) positional self-join
    instead. Pair counts fold as |vocab|²-bounded partials."""
    from .functions.grouped import sorted_aggregate
    docs = _docs(sf_dir)
    wl = list(COOC_WORDS)
    i64 = pa.int64()
    empty = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                       ("dist", i64), ("n", i64)])

    def f(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        if len(flat) == 0:
            return empty.empty_table()
        offs = np.asarray(toks.offsets) - toks.offsets[0].as_py()
        code = np.full(len(flat), -1, np.int64)
        for ci, w in enumerate(wl):
            code[pc.equal(flat, w).to_numpy(zero_copy_only=False)] = ci
        doc = np.searchsorted(offs, np.arange(len(flat)),
                              side="right") - 1
        parts = []
        k = len(wl)
        for dist in range(1, COOC_MAXDIST + 1):
            a, bcode = code[:-dist], code[dist:]
            ok = (a >= 0) & (bcode >= 0) & (doc[:-dist] == doc[dist:])
            if not ok.any():
                continue
            lo = np.minimum(a[ok], bcode[ok])
            hi = np.maximum(a[ok], bcode[ok])
            cnt = np.bincount(lo * k + hi, minlength=k * k)
            nz = np.flatnonzero(cnt)
            parts.append(pa.table({
                "w1": pa.array([wl[i // k] for i in nz]),
                "w2": pa.array([wl[i % k] for i in nz]),
                "dist": pa.array(np.full(len(nz), dist, np.int64)),
                "n": pa.array(cnt[nz].astype(np.int64))}, schema=empty))
        if not parts:
            return empty.empty_table()
        return pa.concat_tables(parts)

    return sorted_aggregate(
        docs.map_batches(f, batch_format="pyarrow"),
        ["w1", "w2", "dist"], [("n", "sum")],
        ["w1", "w2", "dist", "n"], 1).sort(["w1", "w2", "dist"])


SPARQL_REGEX = "o$"  # canonicals ending in 'o'


def _q_kg_sparql_filter_regex(sf_dir: str):
    """SPARQL FILTER regex(?m, "o$") over the mentions×usesTool BGP —
    the regex FILTER builtin (comparison FILTERs are covered by
    kg_bgp_filtered). The compiled-RE2 match runs vectorized over the
    matcher's distinct bindings; both engines evaluate the same RE2
    pattern."""
    from .functions.bgp import bgp_match
    pre = C.ENT + "mention/"
    dd = bgp_match(
        _mention_union_tri(sf_dir),
        [("?t", C.PRED_MENTIONS, "?m"), ("?t", C.PRED_USES_TOOL, "?tool")],
        ["m", "tool"], num_partitions=8)

    def f(b: pa.Table) -> pa.Table:
        m = pc.utf8_slice_codeunits(b["m"], len(pre))
        keep = pc.match_substring_regex(m, SPARQL_REGEX)
        return pa.table({"m": m, "tool": b["tool"]}).filter(keep)

    return dd.map_batches(f, batch_format="pyarrow") \
        .sort(["m", "tool"])


SUPPRESS_K = 50


def _q_privacy_cell_suppression(sf_dir: str):
    """Statistical-disclosure-control primary cell suppression: the
    (segment × priority × order-year) contingency table with cells
    under k=50 zeroed and flagged — the census-release primitive.
    Segment attaches via the broadcast sorted probe; cell counts fold
    distributed; the suppression rule is a vectorized map over the
    bounded cell frame."""
    from .functions.grouped import sorted_aggregate
    from .functions.joins import probe_sorted
    import pandas as pd
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"]).to_pandas()
    segs = np.sort(cust["c_mktsegment"].unique())
    sid = {s: i for i, s in enumerate(segs)}
    order = np.argsort(cust["c_custkey"].to_numpy())
    ref = ray.put((cust["c_custkey"].to_numpy()[order],
                   cust["c_mktsegment"].map(sid).to_numpy()[order]))

    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority", "o_orderdate"])

    def partial(b: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)
        sg = probe_sorted(keys, vals,
                          b["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({
            "sg": pa.array(sg, pa.int64()),
            "pri": b["o_orderpriority"],
            "y": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64))}) \
            .group_by(["sg", "pri", "y"], use_threads=False) \
            .aggregate([("n", "sum")]) \
            .rename_columns(["sg", "pri", "y", "n"])

    cells = sorted_aggregate(
        od.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["sg", "pri", "y"], [("n", "sum")],
        ["sg", "pri", "y", "n"], 1).to_pandas()
    supp = (cells["n"] < SUPPRESS_K).astype("int64")
    return pd.DataFrame({
        "segment": segs[cells["sg"]],
        "priority": cells["pri"],
        "year": cells["y"].astype("int64"),
        "n_released": (cells["n"] * (1 - supp)).astype("int64"),
        "suppressed": supp}) \
        .sort_values(["segment", "priority", "year"]) \
        .reset_index(drop=True)


def _q_rel_revenue_pacing(sf_dir: str):
    """Bookings pacing curve: per order day, daily and cumulative
    revenue cents plus the running share against the grand total as an
    exact integer pair — the cumulative-distribution view of Lorenz.
    Daily sums fold distributed; the cumsum runs on the day-bounded
    series (the Holt/spike pattern)."""
    from .functions.grouped import sorted_aggregate
    import pandas as pd
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({
            "day": pc.divide(pc.cast(b["o_orderdate"], pa.int64()),
                             pa.scalar(86_400_000_000, pa.int64())),
            "rev": pc.cast(pc.round(pc.multiply(
                b["o_totalprice"], 100.0)), pa.int64())}) \
            .group_by(["day"], use_threads=False) \
            .aggregate([("rev", "sum")]).rename_columns(["day", "rev"])

    d = sorted_aggregate(
        od.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["day"], [("rev", "sum")], ["day", "rev"], 1).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    cum = d["rev"].cumsum()
    return pd.DataFrame({
        "day": d["day"].astype("int64"),
        "rev_c": d["rev"].astype("int64"),
        "cum_rev_c": cum.astype("int64"),
        "total_rev_c": pd.Series(np.full(len(d), int(d["rev"].sum())),
                                 dtype="int64")})


ABANDON_US = 86_400_000_000  # 24h purchase window


def _q_events_abandoned_views(sf_dir: str):
    """Per-event temporal anti-join: each view flagged abandoned when
    the SAME user makes NO purchase within 24 hours at-or-after it —
    the cart-abandonment labeler (funnel_latency sees only first
    events; this labels EVERY view). ONE user-sort colocates complete
    per-user groups; inside a block, each user's sorted purchase
    timestamps answer all their views via one np.searchsorted — the
    oracle pays a correlated NOT EXISTS instead."""
    from .functions.grouped import group_ids, sorted_group_apply
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"])
    i64 = pa.int64()
    out_schema = pa.schema([("event_id", i64), ("user_id", i64),
                            ("abandoned", i64)])

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["event_type"],
                        value_set=pa.array(["view", "purchase"]))
        t = b.filter(keep)
        return pa.table({
            "user_id": pc.cast(t["user_id"], i64),
            "event_id": pc.cast(t["event_id"], i64),
            "us": pc.cast(t["ts"], i64),
            "is_view": pc.cast(pc.equal(t["event_type"], "view"), i64)})

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        us = b["us"].to_numpy(zero_copy_only=False)
        isv = b["is_view"].to_numpy(zero_copy_only=False).astype(bool)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        n = b.num_rows
        # ONE lexsort by (gid, ts, view-before-purchase-on-ties), then
        # the nearest at-or-after purchase per position is a reversed
        # minimum.accumulate over purchase indices — fully vectorized,
        # no per-view loop. Views sort BEFORE equal-ts purchases so an
        # exactly-simultaneous purchase still counts (ts >= view ts).
        order = np.lexsort(((~isv).astype(np.int64), us, gid))
        g, t_, v_ = gid[order], us[order], isv[order]
        pidx = np.where(~v_, np.arange(n), n)  # n = +inf sentinel
        nxt = np.minimum.accumulate(pidx[::-1])[::-1]
        safe = np.minimum(nxt, n - 1)
        exists = (nxt < n) & (g[safe] == g) \
            & (t_[safe] <= t_ + ABANDON_US)
        vmask = v_
        return pa.table({
            "event_id": pa.array(eid[order][vmask]),
            "user_id": pa.array(uid[order][vmask]),
            "abandoned": pa.array((~exists[vmask]).astype(np.int64))},
            schema=out_schema)

    return sorted_group_apply(
        ev.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id"], block, 8).sort("event_id")


PR_BINS = 10


def _q_ml_pr_curve(sf_dir: str):
    """Precision-recall curve points: 10 equi-width thresholds over the
    n_chars score predicting lang = 'en', each row the exact integer
    confusion counts (tp, fp, fn) — the plotting table behind a PR
    curve, no float division anywhere. One pass of (score-bin, label)
    partials; the threshold sweep is a cumsum over the 10-row frame."""
    from .functions.grouped import sorted_aggregate
    import pandas as pd
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["n_chars", "lang"])
    stats = docs.map_batches(
        lambda b: pa.table({
            "mn": pa.array([pc.min(b["n_chars"]).as_py()], pa.int64()),
            "mx": pa.array([pc.max(b["n_chars"]).as_py()], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    mn, mx = int(stats["mn"].min()), int(stats["mx"].max())
    width = mx - mn + 1

    def hist(b: pa.Table) -> pa.Table:
        s = b["n_chars"].to_numpy(zero_copy_only=False)
        binx = (s - mn) * PR_BINS // width
        return pa.table({
            "bin": pa.array(binx, pa.int64()),
            "n": pa.array(np.ones(len(s), np.int64)),
            "npos": pc.cast(pc.equal(b["lang"], "en"), pa.int64())}) \
            .group_by(["bin"], use_threads=False) \
            .aggregate([("n", "sum"), ("npos", "sum")]) \
            .rename_columns(["bin", "n", "npos"])

    h = sorted_aggregate(
        docs.map_batches(hist, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["bin"], [("n", "sum"), ("npos", "sum")],
        ["bin", "n", "npos"], 1).to_pandas().sort_values("bin")
    full = np.zeros((PR_BINS, 2), np.int64)
    full[h["bin"].to_numpy()] = h[["n", "npos"]].to_numpy()
    P = int(full[:, 1].sum())
    # predict positive when bin >= t: suffix sums
    sn = np.cumsum(full[::-1, 0])[::-1]
    sp = np.cumsum(full[::-1, 1])[::-1]
    return pd.DataFrame({
        "threshold_bin": pd.Series(np.arange(PR_BINS), dtype="int64"),
        "tp": pd.Series(sp, dtype="int64"),
        "fp": pd.Series(sn - sp, dtype="int64"),
        "fn": pd.Series(P - sp, dtype="int64")})


def _q_rel_forecast_error(sf_dir: str):
    """Naive-lag forecast evaluation: per month, actual revenue cents,
    the previous month's revenue as the forecast, and the absolute
    error — the exact-integer numerators of WAPE/MAE backtesting.
    Monthly sums fold distributed; the lag runs on the month-bounded
    frame. Months are pure integer buckets (year·12 + month−1), no
    calendar strings."""
    from .functions.grouped import sorted_aggregate
    import pandas as pd
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        y = pc.year(b["o_orderdate"])
        m = pc.month(b["o_orderdate"])
        mi = pc.add(pc.multiply(pc.cast(y, pa.int64()),
                                pa.scalar(12, pa.int64())),
                    pc.subtract(pc.cast(m, pa.int64()),
                                pa.scalar(1, pa.int64())))
        return pa.table({
            "mi": mi,
            "rev": pc.cast(pc.round(pc.multiply(
                b["o_totalprice"], 100.0)), pa.int64())}) \
            .group_by(["mi"], use_threads=False) \
            .aggregate([("rev", "sum")]).rename_columns(["mi", "rev"])

    d = sorted_aggregate(
        od.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["mi"], [("rev", "sum")], ["mi", "rev"], 1).to_pandas() \
        .sort_values("mi").reset_index(drop=True)
    rev = d["rev"].to_numpy()
    prev = np.empty_like(rev)
    prev[0] = -1  # no forecast for the first month (dropped below)
    prev[1:] = rev[:-1]
    out = pd.DataFrame({
        "month_index": d["mi"].astype("int64"),
        "rev_c": d["rev"].astype("int64"),
        "forecast_c": pd.Series(prev, dtype="int64"),
        "abs_err_c": pd.Series(np.abs(rev - prev), dtype="int64")})
    return out.iloc[1:].reset_index(drop=True)


IPW_MAX_K = 3


def _q_sample_ipw_estimate(sf_dir: str):
    """Inverse-propensity-weighted survey estimation: per source
    stratum, a deterministic 1-in-k systematic hash sample (k = 1 +
    source_id mod 3), the IPW estimate k·Σ_sampled n_chars, and the
    true total — the estimator-vs-truth audit in exact integers.
    Sampling is a shuffle-free hash filter; both totals fold in the
    SAME single pass."""
    from .functions.grouped import sorted_aggregate
    from .functions.sampling import splitmix64
    import pandas as pd
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        src = b["source"]
        sid = pc.cast(pc.utf8_slice_codeunits(src, 3, 99), pa.int64()) \
            .to_numpy(zero_copy_only=False)  # 'srcN' -> N, vectorized
        k = 1 + sid % IPW_MAX_K
        h = splitmix64(b["doc_id"].to_numpy(zero_copy_only=False)
                       .astype(np.uint64))
        keep = (h % k.astype(np.uint64)) == 0
        nc = b["n_chars"].to_numpy(zero_copy_only=False)
        return pa.table({
            "source": src,
            "n_sampled": pa.array(keep.astype(np.int64)),
            "est_chars": pa.array(np.where(keep, nc * k, 0)),
            "true_chars": pa.array(nc)}) \
            .group_by(["source"], use_threads=False) \
            .aggregate([("n_sampled", "sum"), ("est_chars", "sum"),
                        ("true_chars", "sum")]) \
            .rename_columns(["source", "n_sampled", "est_chars",
                             "true_chars"])

    return sorted_aggregate(
        docs.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["source"], [("n_sampled", "sum"), ("est_chars", "sum"),
                     ("true_chars", "sum")],
        ["source", "n_sampled", "est_chars", "true_chars"], 1) \
        .sort("source")


PIT_WINDOW_US = 7 * 86_400_000_000


def _q_events_pit_features(sf_dir: str):
    """Point-in-time (leakage-safe) feature generation: for every
    purchase, the count of the SAME user's views in the trailing 7-day
    window [t−7d, t) — the feature-store as-of join. Ghost-row merge:
    each purchase contributes a marker at t−7d; ONE user-sort of
    (ghosts ∪ purchases ∪ views) with the tie order ghost < purchase
    < view makes the answer an exclusive prefix-count difference —
    no per-purchase search, no correlated scan (the oracle pays the
    correlated COUNT)."""
    from .functions.grouped import group_ids, sorted_group_apply
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"])
    i64 = pa.int64()
    out_schema = pa.schema([("event_id", i64), ("user_id", i64),
                            ("n_views_7d", i64)])

    def prep(b: pa.Table) -> pa.Table:
        isv = pc.equal(b["event_type"], "view")
        isp = pc.equal(b["event_type"], "purchase")
        keep = pc.or_(isv, isp)
        t = b.filter(keep)
        us = pc.cast(t["ts"], i64).to_numpy(zero_copy_only=False)
        uid = pc.cast(t["user_id"], i64).to_numpy(zero_copy_only=False)
        eid = pc.cast(t["event_id"], i64).to_numpy(zero_copy_only=False)
        isp_n = pc.equal(t["event_type"], "purchase") \
            .to_numpy(zero_copy_only=False)
        # kind: 0 = ghost (t-7d marker), 1 = purchase, 2 = view
        pn = int(isp_n.sum())
        return pa.table({
            "user_id": pa.array(np.concatenate(
                [uid[isp_n], uid[isp_n], uid[~isp_n]])),
            "event_id": pa.array(np.concatenate(
                [eid[isp_n], eid[isp_n], eid[~isp_n]])),
            "us": pa.array(np.concatenate(
                [us[isp_n] - PIT_WINDOW_US, us[isp_n], us[~isp_n]])),
            "kind": pa.array(np.concatenate(
                [np.zeros(pn, np.int64), np.ones(pn, np.int64),
                 np.full(len(us) - pn, 2, np.int64)]))})

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        us = b["us"].to_numpy(zero_copy_only=False)
        kind = b["kind"].to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((kind, us, gid))
        k_, e_, u_ = kind[order], eid[order], uid[order]
        cv = np.concatenate([[0], np.cumsum(k_ == 2)[:-1]])
        gm, pm = k_ == 0, k_ == 1
        ge, gc = e_[gm], cv[gm]
        pe, pc_ = e_[pm], cv[pm]
        go, po = np.argsort(ge, kind="stable"), \
            np.argsort(pe, kind="stable")
        n7 = pc_[po] - gc[go]  # ghost/purchase pairs share event_id
        return pa.table({"event_id": pa.array(pe[po]),
                         "user_id": pa.array(u_[pm][po]),
                         "n_views_7d": pa.array(n7)},
                        schema=out_schema)

    return sorted_group_apply(
        ev.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id"], block, 8).sort("event_id")


SHARD_COUNT = 8


def _q_multimodal_shard_plan(sf_dir: str):
    """Content-shard layout planning for binary media payloads:
    size-rank round-robin assignment (shard = global size-desc rank mod
    8 — the parallel-exact stand-in for greedy first-fit-decreasing,
    within 1 max-item of its balance) and per-shard (n_items,
    total_bytes). The rank is ONE packed sort + zip_with_index; only
    the 8-row plan leaves the fold."""
    from .functions.grouped import sorted_aggregate
    from .functions.joins import zip_with_index
    from .stages.multimodal import synthesize_media
    media = synthesize_media(_docs(sf_dir))

    def pack(b: pa.Table) -> pa.Table:
        size = pc.binary_length(b["payload"]) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        mid = b["media_id"].to_numpy(zero_copy_only=False)
        if (size >= 1 << 30).any() or (mid >= 1 << 33).any():
            raise OverflowError("shard pack: rescale sizes")
        return pa.table({
            "size": pa.array(size),
            "__k": pa.array((((1 << 30) - 1 - size) << 33) | mid)})

    ranked = zip_with_index(
        media.map_batches(pack, batch_format="pyarrow").sort("__k"),
        id_col="__r", order_by="__k")

    def assign(b: pa.Table) -> pa.Table:
        r = b["__r"].to_numpy(zero_copy_only=False)
        return pa.table({"shard": pa.array(r % SHARD_COUNT, pa.int64()),
                         "n_items": pa.array(np.ones(len(r), np.int64)),
                         "total_bytes": b["size"]}) \
            .group_by(["shard"], use_threads=False) \
            .aggregate([("n_items", "sum"), ("total_bytes", "sum")]) \
            .rename_columns(["shard", "n_items", "total_bytes"])

    return sorted_aggregate(
        ranked.map_batches(assign, batch_format="pyarrow"),
        ["shard"], [("n_items", "sum"), ("total_bytes", "sum")],
        ["shard", "n_items", "total_bytes"], 1).sort("shard")


VOCAB_COVER_NUM, VOCAB_COVER_DEN = 19, 20  # 95% token mass


def _q_text_vocab_coverage(sf_dir: str):
    """Frequency-cutoff vocabulary sizing: the minimal k such that the
    top-k words (count desc, word asc) cover ≥ 95% of token mass —
    exact integer cross-multiplication, no percent floats. Word counts
    fold distributed; the cumulative scan runs on the vocabulary-
    bounded count table (the corpus-vocab « corpus invariant every
    tokenizer stage here relies on)."""
    from .functions.grouped import sorted_aggregate
    import pandas as pd
    docs = _docs(sf_dir)

    def wc(b: pa.Table) -> pa.Table:
        lst = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        flat = pc.list_flatten(lst)
        t = pa.table({"w": flat, "c": pa.array(
            np.ones(len(flat), np.int64))})
        return t.group_by(["w"], use_threads=False) \
            .aggregate([("c", "sum")]).rename_columns(["w", "c"])

    cnt = sorted_aggregate(
        docs.map_batches(wc, batch_format="pyarrow"),
        ["w"], [("c", "sum")], ["w", "c"], 4).to_pandas()
    cnt = cnt.sort_values(["c", "w"], ascending=[False, True]) \
        .reset_index(drop=True)
    cum = cnt["c"].cumsum().to_numpy()
    tot = int(cum[-1]) if len(cum) else 0
    k = int(np.argmax(cum * VOCAB_COVER_DEN
                      >= VOCAB_COVER_NUM * tot)) + 1 if tot else 0
    return pd.DataFrame({
        "k": pd.Series([k], dtype="int64"),
        "covered_tokens": pd.Series([int(cum[k - 1]) if tot else 0],
                                    dtype="int64"),
        "total_tokens": pd.Series([tot], dtype="int64")})


def _q_dedup_rate_by_source(sf_dir: str):
    """Duplicate-rate audit per corpus source: docs vs distinct text
    digests per source — the curation health report that decides which
    feeds need dedup first. Digests-only shuffle (16-byte md5, never
    documents), ONE grouped distinct + tiny per-source counts."""
    from .functions.grouped import grouped_count, sorted_aggregate
    import hashlib as _hl
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["source", "text"])

    def digest(b: pa.Table) -> pa.Table:
        hs = [_hl.md5(t.encode()).hexdigest()
              for t in b["text"].to_pylist()]
        return pa.table({"source": b["source"],
                         "h": pa.array(hs, pa.string()),
                         "n": pa.array(np.ones(b.num_rows, np.int64))}) \
            .group_by(["source", "h"], use_threads=False) \
            .aggregate([("n", "sum")]) \
            .rename_columns(["source", "h", "n"])

    per_hash = sorted_aggregate(
        docs.map_batches(digest, batch_format="pyarrow"),
        ["source", "h"], [("n", "sum")], ["source", "h", "n"], 4)

    def fold(b: pa.Table) -> pa.Table:
        return pa.table({"source": b["source"], "n_docs": b["n"],
                         "n_distinct": pa.array(
                             np.ones(b.num_rows, np.int64))}) \
            .group_by(["source"], use_threads=False) \
            .aggregate([("n_docs", "sum"), ("n_distinct", "sum")]) \
            .rename_columns(["source", "n_docs", "n_distinct"])

    return sorted_aggregate(
        per_hash.map_batches(fold, batch_format="pyarrow"),
        ["source"], [("n_docs", "sum"), ("n_distinct", "sum")],
        ["source", "n_docs", "n_distinct"], 1).sort("source")


def _q_events_runs_test(sf_dir: str):
    """Wald–Wolfowitz runs-test counts over daily event-count moves:
    n_up, n_down, n_runs of the day-over-day delta signs (zeros
    dropped, the standard convention) — the randomness diagnostic in
    exact integers; the z-score is presentation-time. Daily counts
    fold distributed; the sign scan runs on the day-bounded spine."""
    from .functions.grouped import grouped_count
    import pandas as pd
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts"])
    d = grouped_count(
        ev.map_batches(lambda b: pa.table({"day": pc.divide(
            pc.cast(b["ts"], pa.int64()),
            pa.scalar(86_400_000_000, pa.int64()))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["day"], "c", 1).to_pandas()
    lo, hi = int(d["day"].min()), int(d["day"].max())
    spine = np.zeros(hi - lo + 1, np.int64)
    spine[d["day"].to_numpy() - lo] = d["c"].to_numpy()
    sgn = np.sign(np.diff(spine))
    sgn = sgn[sgn != 0]
    n_up = int((sgn > 0).sum())
    n_down = int((sgn < 0).sum())
    n_runs = int(1 + (sgn[1:] != sgn[:-1]).sum()) if len(sgn) else 0
    return pd.DataFrame({
        "n_up": pd.Series([n_up], dtype="int64"),
        "n_down": pd.Series([n_down], dtype="int64"),
        "n_runs": pd.Series([n_runs], dtype="int64")})


def _q_kg_dangling_objects(sf_dir: str):
    """Dangling-reference audit per predicate: IRI objects that never
    appear as a subject anywhere in the graph (the generic link-rot
    check behind the SHACL shapes). Same indicator re-key as
    shacl_validation: one grouped MAX per IRI over (is-subject,
    obj-of-pred-p indicators), tiny per-pred count folds."""
    from .functions.grouped import sorted_aggregate
    from .pipelines.kg import run_kg
    import pandas as pd
    tri = run_kg(sf_dir)
    i64 = pa.int64()

    def rekey(b: pa.Table) -> pa.Table:
        nonlit = pc.invert(b["obj_is_literal"])
        t = b.filter(nonlit)
        n1, n2 = b.num_rows, t.num_rows
        return pa.table({
            "k": pa.concat_arrays([b["subj"].combine_chunks(),
                                   t["obj"].combine_chunks()]),
            "pred": pa.concat_arrays(
                [pa.nulls(n1, pa.string()),
                 t["pred"].combine_chunks()]),
            "is_subj": pa.array(np.concatenate(
                [np.ones(n1, np.int64), np.zeros(n2, np.int64)]))})

    keyed = tri.map_batches(rekey, batch_format="pyarrow")
    subj_flag = sorted_aggregate(
        keyed.map_batches(
            lambda b: pa.table({"k": b["k"], "is_subj": b["is_subj"]})
            .group_by(["k"], use_threads=False)
            .aggregate([("is_subj", "max")])
            .rename_columns(["k", "is_subj"]),
            batch_format="pyarrow"),
        ["k"], [("is_subj", "max")], ["k", "is_subj"], 8).materialize()
    # distinct (pred, obj) pairs of IRI objects
    from .functions.pagerank import _distinct
    from .functions.joins import attach_column
    po = _distinct(
        keyed.map_batches(
            lambda b: b.filter(pc.is_valid(b["pred"]))
            .select(["pred", "k"]), batch_format="pyarrow"),
        ["pred", "k"], 8)
    flagged = attach_column(
        po, subj_flag, [("pred", pa.string()), ("k", pa.string())],
        "k", "k", "is_subj", "has_subj", i64, 8, key_type=pa.string())

    def fold(b: pa.Table) -> pa.Table:
        dang = pc.subtract(pa.scalar(1, i64), b["has_subj"])
        return pa.table({"pred": b["pred"],
                         "n_objects": pa.array(
                             np.ones(b.num_rows, np.int64)),
                         "n_dangling": dang}) \
            .group_by(["pred"], use_threads=False) \
            .aggregate([("n_objects", "sum"), ("n_dangling", "sum")]) \
            .rename_columns(["pred", "n_objects", "n_dangling"])

    return sorted_aggregate(
        flagged.map_batches(fold, batch_format="pyarrow"),
        ["pred"], [("n_objects", "sum"), ("n_dangling", "sum")],
        ["pred", "n_objects", "n_dangling"], 1).sort("pred")


CV_FOLDS = 3


def _q_ml_cv_stump(sf_dir: str):
    """Grouped 3-fold cross-validation of the quantity stump: folds
    assigned per ORDER (splitmix64(l_orderkey) mod 3 — group k-fold,
    so an order's lines never straddle train/test), per fold the best
    train-split threshold and its exact train/test misclassification.
    ONE distributed (fold, q, label) grouped count; the 3 threshold
    scans run on the ≤ 3·|q|·2 frame."""
    from .functions.grouped import grouped_count
    from .functions.sampling import splitmix64
    import pandas as pd
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity", "l_returnflag"])

    def fl(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        fold = (splitmix64(ok.astype(np.uint64))
                % np.uint64(CV_FOLDS)).astype(np.int64)
        return pa.table({
            "fold": pa.array(fold),
            "q": pc.cast(pc.round(b["l_quantity"]), pa.int64()),
            "pos": pc.cast(pc.equal(b["l_returnflag"], "R"), pa.int64())})

    c = grouped_count(li.map_batches(fl, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      ["fold", "q", "pos"], "n", 4).to_pandas()
    c["npos"] = c["n"] * c["pos"]
    rows = []
    for f in range(CV_FOLDS):
        tr = c[c["fold"] != f]
        te = c[c["fold"] == f]
        g = tr.groupby("q").agg(nq=("n", "sum"),
                                pq=("npos", "sum")).sort_index()
        T, P = int(g["nq"].sum()), int(g["pq"].sum())
        nl = g["nq"].cumsum().to_numpy()[:-1]
        pl = g["pq"].cumsum().to_numpy()[:-1]
        thr = g.index.to_numpy()[:-1]
        mis = (np.minimum(pl, nl - pl)
               + np.minimum(P - pl, (T - nl) - (P - pl)))
        i = int(np.lexsort((thr, mis))[0])
        t0, m0 = int(thr[i]), int(mis[i])
        # leaf labels from the TRAIN side at the chosen threshold
        predl = 1 if 2 * pl[i] > nl[i] else 0
        predr = 1 if 2 * (P - pl[i]) > (T - nl[i]) else 0
        left = te["q"] <= t0
        pred = np.where(left, predl, predr)
        test_mis = int((te["n"] * (pred != te["pos"])).sum())
        rows.append((f, t0, m0, test_mis))
    out = pd.DataFrame(rows, columns=["fold", "threshold",
                                      "train_mis", "test_mis"])
    return out.astype({c_: "int64" for c_ in out.columns})


NOVELTY_N = 3


def _q_text_novelty_scores(sf_dir: str):
    """Streaming novelty scoring: per document, its word-3-gram count
    and how many of those 3-grams appear in NO earlier document (by
    doc_id) — the dedup-adjacent freshness signal for curation. The
    Heaps'-law first-occurrence trick at n-gram level: novelty needs
    no per-prefix state, just ONE grouped min (first_doc per gram) and
    a join-back counted per doc; distinct grams per doc keep the
    shuffle gram-deduplicated."""
    from .functions.grouped import sorted_aggregate
    docs = _docs(sf_dir)
    i64 = pa.int64()

    empty = pa.schema([("g", pa.string()), ("d", i64)])

    def grams(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        if len(flat) < NOVELTY_N:
            return empty.empty_table()
        offs = np.asarray(toks.offsets) - toks.offsets[0].as_py()
        ids = pc.cast(b["doc_id"], i64).to_numpy(zero_copy_only=False)
        # vectorized 3-gram join over the flat token array; a gram at
        # position i is valid iff i and i+2 fall in the same doc
        g = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 2), flat.slice(1, len(flat) - 2),
            flat.slice(2), " ")
        doc = np.searchsorted(offs, np.arange(len(flat)),
                              side="right") - 1
        ok = doc[:-2] == doc[2:]
        t = pa.table({"g": g.filter(pa.array(ok)),
                      "d": pa.array(ids[doc[:-2][ok]])}, schema=empty)
        # per-doc distinct grams: one Arrow group_by, no Python rows
        return t.group_by(["g", "d"], use_threads=False) \
            .aggregate([]).rename_columns(["g", "d"]).cast(empty)

    gstream = docs.map_batches(grams, batch_format="pyarrow") \
        .materialize()
    first = sorted_aggregate(
        gstream, ["g"], [("d", "min")], ["g", "fd"], 8).materialize()
    from .functions.joins import attach_column
    joined = attach_column(
        gstream, first, [("g", pa.string()), ("d", i64)],
        "g", "g", "fd", "fd", i64, 8, key_type=pa.string())

    def fold(b: pa.Table) -> pa.Table:
        novel = pc.cast(pc.equal(b["d"], b["fd"]), i64)
        return pa.table({"doc_id": b["d"],
                         "n_grams": pa.array(
                             np.ones(b.num_rows, np.int64)),
                         "n_novel": novel}) \
            .group_by(["doc_id"], use_threads=False) \
            .aggregate([("n_grams", "sum"), ("n_novel", "sum")]) \
            .rename_columns(["doc_id", "n_grams", "n_novel"])

    return sorted_aggregate(
        joined.map_batches(fold, batch_format="pyarrow"),
        ["doc_id"], [("n_grams", "sum"), ("n_novel", "sum")],
        ["doc_id", "n_grams", "n_novel"], 4).sort("doc_id")


SKEW_TOP = 10


def _q_diag_key_skew(sf_dir: str):
    """Join-key skew diagnostic: the top-10 heaviest l_partkey values
    with their row counts, plus per-row the ×10⁶ ratio of that count
    to the MEAN key frequency — the report that decides whether a
    shuffle needs salting. ONE grouped count; the top-k head is a
    distributed sort-limit; totals ride along as exact integers."""
    from .functions.grouped import grouped_count
    import pandas as pd
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_partkey"])
    cnt = grouped_count(li, ["l_partkey"], "n", 4).materialize()
    totals = cnt.map_batches(
        lambda b: pa.table({
            "rows": pa.array([int(pc.sum(b["n"]).as_py() or 0)],
                             pa.int64()),
            "keys": pa.array([b.num_rows], pa.int64())}),
        batch_format="pyarrow").to_pandas().sum()
    n_rows, n_keys = int(totals["rows"]), int(totals["keys"])
    top = cnt.sort(["n", "l_partkey"], descending=[True, False]) \
        .limit(SKEW_TOP).to_pandas()
    # skew_fp = n · n_keys · 10^6 // n_rows  (count over mean frequency)
    skew = [10**6 * int(n) * n_keys // n_rows for n in top["n"]]
    return pd.DataFrame({
        "l_partkey": top["l_partkey"].astype("int64"),
        "n": top["n"].astype("int64"),
        "skew_fp": pd.Series(skew, dtype="int64")})


STOPWORD_DF_NUM, STOPWORD_DF_DEN = 1, 2  # df > 50% of docs


def _q_text_stopword_discovery(sf_dir: str):
    """Corpus-driven stopword discovery: words whose document frequency
    exceeds half the corpus — the preprocessing step that derives the
    stoplist instead of assuming one. Per-doc-distinct words (one
    Arrow group_by per block) keep the shuffle df-shaped; the df
    threshold is integer cross-multiplication."""
    from .functions.grouped import sorted_aggregate
    docs = _docs(sf_dir)
    n_docs = int(ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id"]).count())

    def dfp(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = np.asarray(toks.offsets) - toks.offsets[0].as_py()
        doc = np.searchsorted(offs, np.arange(len(flat)),
                              side="right") - 1
        t = pa.table({"w": flat, "d": pa.array(doc, pa.int64())})
        dd = t.group_by(["w", "d"], use_threads=False).aggregate([])
        return pa.table({"w": dd["w"], "df": pa.array(
            np.ones(dd.num_rows, np.int64))}) \
            .group_by(["w"], use_threads=False) \
            .aggregate([("df", "sum")]).rename_columns(["w", "df"])

    df = sorted_aggregate(
        docs.map_batches(dfp, batch_format="pyarrow"),
        ["w"], [("df", "sum")], ["w", "df"], 4)
    return df.map_batches(
        lambda b: b.filter(pc.greater(
            pc.multiply(b["df"], pa.scalar(STOPWORD_DF_DEN, pa.int64())),
            pa.scalar(STOPWORD_DF_NUM * n_docs, pa.int64()))),
        batch_format="pyarrow").sort("w") \
        .map_batches(lambda b: b.rename_columns(["word", "df"]),
                     batch_format="pyarrow")


def _q_rel_aov_by_order_rank(sf_dir: str):
    """Repeat-purchase economics: order value by the customer's order
    SEQUENCE number (1st order, 2nd, …) — per rank, count and total
    cents (AOV = total/n at presentation). The rank is a per-customer
    row_number (date, orderkey tie-break) computed inside complete
    sorted customer groups; only rank-bounded partials shuffle."""
    from .functions.grouped import group_ids, sorted_aggregate, \
        sorted_group_apply
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "ck": pc.cast(b["o_custkey"], pa.int64()),
            "ok": pc.cast(b["o_orderkey"], pa.int64()),
            "day": pc.divide(pc.cast(b["o_orderdate"], pa.int64()),
                             pa.scalar(86_400_000_000, pa.int64())),
            "p": pc.cast(pc.round(pc.multiply(
                b["o_totalprice"], 100.0)), pa.int64())})

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("rank", pa.int64()),
                              ("n", pa.int64()),
                              ("total_c", pa.int64())]).empty_table()
        gid, _ = group_ids(b, ["ck"])
        day = b["day"].to_numpy(zero_copy_only=False)
        ok = b["ok"].to_numpy(zero_copy_only=False)
        p = b["p"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, day, gid))
        g = gid[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], g[1:] != g[:-1]]))
        rank = np.arange(len(g)) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(g)]]))) + 1
        return pa.table({"rank": pa.array(rank, pa.int64()),
                         "n": pa.array(np.ones(len(g), np.int64)),
                         "total_c": pa.array(p[order])}) \
            .group_by(["rank"], use_threads=False) \
            .aggregate([("n", "sum"), ("total_c", "sum")]) \
            .rename_columns(["rank", "n", "total_c"])

    ranked = sorted_group_apply(
        od.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["ck"], block, 8)
    return sorted_aggregate(
        ranked, ["rank"], [("n", "sum"), ("total_c", "sum")],
        ["rank", "n", "total_c"], 1).sort("rank")


BRAND_TOPK = 3


def _q_rel_top3_parts_per_brand(sf_dir: str):
    """Grouped top-k (k=3): the three highest-revenue parts within
    every brand, full deterministic tie-break (revenue desc, partkey
    asc) — the per-group head operator beyond top-1. Revenue folds in
    cents×pct fixed point; the per-brand heads are picked inside
    complete sorted brand groups, so only 3·|brands| rows survive."""
    from .functions.grouped import group_ids, sorted_aggregate, \
        sorted_group_apply
    from .functions.joins import probe_sorted
    import pandas as pd
    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"]).to_pandas()
    bid = part["p_brand"].str.slice(6).astype("int64").to_numpy()
    order = np.argsort(part["p_partkey"].to_numpy())
    ref = ray.put((part["p_partkey"].to_numpy()[order], bid[order]))

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)
        brand = probe_sorted(
            keys, vals, b["l_partkey"].to_numpy(zero_copy_only=False))
        price_c = pc.cast(pc.round(pc.multiply(
            b["l_extendedprice"], 100.0)), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        disc = pc.cast(pc.round(pc.multiply(b["l_discount"], 100.0)),
                       pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"b": pa.array(brand, pa.int64()),
                         "pk": pc.cast(b["l_partkey"], pa.int64()),
                         "rev": pa.array(price_c * (100 - disc))}) \
            .group_by(["b", "pk"], use_threads=False) \
            .aggregate([("rev", "sum")]) \
            .rename_columns(["b", "pk", "rev"])

    per_part = sorted_aggregate(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["b", "pk"], [("rev", "sum")], ["b", "pk", "rev"], 8)

    def heads(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        gid, _ = group_ids(b, ["b"])
        rev = b["rev"].to_numpy(zero_copy_only=False)
        pk = b["pk"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, -rev, gid))
        g = gid[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], g[1:] != g[:-1]]))
        rank = np.arange(len(g)) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(g)]])))
        keep = rank < BRAND_TOPK
        sel = order[keep]
        return pa.table({
            "brand_id": pc.cast(b["b"], pa.int64()).take(
                pa.array(sel)),
            "p_partkey": b["pk"].take(pa.array(sel)),
            "rev": b["rev"].take(pa.array(sel)),
            "rk": pa.array(rank[keep] + 1, pa.int64())})

    out = sorted_group_apply(per_part, ["b"], heads, 8).to_pandas()
    return out.sort_values(["brand_id", "rk"]).reset_index(drop=True) \
        .astype({"brand_id": "int64", "p_partkey": "int64",
                 "rev": "int64", "rk": "int64"})


# RDFS domain/range schema for the graph's object properties — the rule
# table an RDFS reasoner materializes rdf:type entailments from.
RDFS_RULES = {
    C.PRED_IS_PART_OF: (C.CLASS_TURN, C.CLASS_CONVERSATION),
    C.PRED_USES_TOOL: (C.CLASS_TURN, C.CLASS_TOOL),
    C.PRED_MENTIONS: (C.CLASS_TURN, C.CLASS_MENTION),
    # These three entail types the pipeline never asserts (external
    # Wikidata entities as schema:Thing, type IRIs as rdfs:Class) — the
    # non-vacuous part of the entailment.
    C.PRED_SAME_AS: (C.CLASS_MENTION, C.SCHEMA + "Thing"),
    C.PRED_INSTANCE_OF: (C.SCHEMA + "Thing", C.RDFS + "Class"),
    C.RDFS_SUBCLASS_OF: (C.RDFS + "Class", C.RDFS + "Class"),
}


def _q_kg_rdfs_inference(sf_dir: str):
    """RDFS domain/range entailment: for every (s, p, o) whose predicate
    carries a domain/range declaration, infer (s, rdf:type, domain) and
    (o, rdf:type, range); report only the NEWLY entailed type triples
    (inferred MINUS asserted). Rules live in the closure (3 predicates);
    inference is per-pred vectorized masks, distinct is one grouped
    count, and the subtraction is the shared anti co-group join — no
    driver-side triple sets."""
    from .functions.bgp import cogroup_join
    from .functions.grouped import grouped_count
    from .pipelines.kg import run_kg
    tri = run_kg(sf_dir)
    preds = pa.array(list(RDFS_RULES), pa.string())

    def infer(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["pred"], value_set=preds))
        outs = []
        for p, (dcls, rcls) in RDFS_RULES.items():
            s = t.filter(pc.equal(t["pred"], p))
            if s.num_rows == 0:
                continue
            fill = lambda v: pa.nulls(s.num_rows, pa.string()).fill_null(v)
            outs.append(pa.table({"node": pc.cast(s["subj"], pa.string()),
                                  "type_iri": fill(dcls)}))
            outs.append(pa.table({"node": pc.cast(s["obj"], pa.string()),
                                  "type_iri": fill(rcls)}))
        if not outs:
            return pa.schema([("node", pa.string()),
                              ("type_iri", pa.string())]).empty_table()
        return pa.concat_tables(outs)

    inferred = grouped_count(
        tri.map_batches(infer, batch_format="pyarrow"),
        ["node", "type_iri"], "n", 8).drop_columns(["n"])
    asserted = tri.map_batches(
        lambda b: b.filter(pc.equal(b["pred"], C.RDF_TYPE))
                   .select(["subj", "obj"])
                   .rename_columns(["node", "type_iri"]),
        batch_format="pyarrow")
    return cogroup_join(inferred, asserted, ["node", "type_iri"],
                        ["node", "type_iri"], ["node", "type_iri"],
                        num_partitions=8, how="anti") \
        .sort(["node", "type_iri"])


SCD_OPEN_END = 1 << 62  # pinned "still valid" sentinel, both engines


def _q_rel_scd2_intervals(sf_dir: str):
    """SCD type-2 dimension build from a change log: per user, collapse
    consecutive runs of equal event_type (ordered by ts, event_id) into
    [valid_from, valid_to) validity intervals; the open interval ends at
    the pinned sentinel. Run detection happens inside complete sorted
    user groups (sort key = the run key alone — the block-run
    invariant), so only interval rows leave the stage."""
    from .functions.grouped import group_ids, sorted_group_apply
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"])
    i64 = pa.int64()
    schema = pa.schema([
        ("user_id", i64), ("seg", i64), ("event_type", pa.string()),
        ("valid_from_us", i64), ("valid_to_us", i64), ("n_events", i64)])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"u": pc.cast(b["user_id"], i64),
                         "t": pc.cast(b["ts"], i64),
                         "e": pc.cast(b["event_id"], i64),
                         "k": pc.cast(b["event_type"], pa.string())})

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return schema.empty_table()
        gid, _ = group_ids(b, ["u"])
        t = b["t"].to_numpy(zero_copy_only=False)
        e = b["e"].to_numpy(zero_copy_only=False)
        k = b["k"].to_numpy(zero_copy_only=False)
        u = b["u"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, gid))
        g, tt, kk, uu = gid[order], t[order], k[order], u[order]
        new = np.concatenate([[True], (g[1:] != g[:-1])
                              | (kk[1:] != kk[:-1])])
        starts = np.flatnonzero(new)
        n = np.diff(np.append(starts, len(g)))
        vf, gr = tt[starts], g[starts]
        vt = np.append(vf[1:], SCD_OPEN_END)
        vt[np.append(gr[1:] != gr[:-1], True)] = SCD_OPEN_END
        ustart = np.concatenate([[True], gr[1:] != gr[:-1]])
        row = np.arange(len(gr), dtype=np.int64)
        seg = row - np.maximum.accumulate(np.where(ustart, row, 0)) + 1
        return pa.table({"user_id": pa.array(uu[starts], i64),
                         "seg": pa.array(seg, i64),
                         "event_type": pa.array(kk[starts], pa.string()),
                         "valid_from_us": pa.array(vf, i64),
                         "valid_to_us": pa.array(vt, i64),
                         "n_events": pa.array(n, i64)}, schema=schema)

    return sorted_group_apply(
        ev.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["u"], block, 8).sort(["user_id", "seg"])


def _q_events_cumulative_users(sf_dir: str):
    """Cumulative distinct users by day — the audience-growth curve: a
    user counts on their FIRST-seen day only (per-user grouped min, not
    a running distinct over raw events), then daily new-user counts and
    one bounded cumulative fold over the day table."""
    from .functions.grouped import sorted_aggregate
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])
    i64 = pa.int64()

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "u": pc.cast(b["user_id"], i64),
            "d": pc.divide(pc.cast(b["ts"], i64),
                           pa.scalar(86_400_000_000, i64))}) \
            .group_by(["u"], use_threads=False) \
            .aggregate([("d", "min")]).rename_columns(["u", "d"])

    first = sorted_aggregate(
        ev.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["u"], [("d", "min")], ["u", "d"], 8)

    def daycnt(b: pa.Table) -> pa.Table:
        return b.append_column("n", pa.array(
            np.ones(b.num_rows, np.int64))) \
            .group_by(["d"], use_threads=False) \
            .aggregate([("n", "sum")]).rename_columns(["d", "n"])

    days = sorted_aggregate(
        first.map_batches(daycnt, batch_format="pyarrow"),
        ["d"], [("n", "sum")], ["d", "n"], 1)

    def cum(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({"day": b["d"], "n_new": b["n"],
                         "cum_users": pa.array(np.cumsum(n), i64)})

    return days.map_batches(cum, batch_format="pyarrow", batch_size=None)


WITHIN_DAYS = 7


def _q_rel_orders_within_week(sf_dir: str):
    """Interval self-join (range join): per order, how many OTHER orders
    the same customer placed within ±7 days. Inside complete sorted
    customer groups the window count is two np.searchsorted passes over
    a (group, day) packed key — O(n log n) per block versus the oracle's
    O(n·m) BETWEEN join; no pair ever materializes."""
    from .functions.grouped import group_ids, sorted_group_apply
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_orderdate"])
    i64 = pa.int64()

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "ck": pc.cast(b["o_custkey"], i64),
            "ok": pc.cast(b["o_orderkey"], i64),
            "day": pc.divide(pc.cast(b["o_orderdate"], i64),
                             pa.scalar(86_400_000_000, i64))})

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("o_orderkey", i64),
                              ("n_within", i64)]).empty_table()
        gid, _ = group_ids(b, ["ck"])
        day = b["day"].to_numpy(zero_copy_only=False)
        ok = b["ok"].to_numpy(zero_copy_only=False)
        order = np.lexsort((day, gid))
        packed = gid[order] * 1_000_000 + day[order]
        lo = np.searchsorted(packed, packed - WITHIN_DAYS, side="left")
        hi = np.searchsorted(packed, packed + WITHIN_DAYS, side="right")
        return pa.table({"o_orderkey": pa.array(ok[order], i64),
                         "n_within": pa.array(hi - lo - 1, i64)})

    return sorted_group_apply(
        od.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["ck"], block, 8).sort("o_orderkey")


def _q_text_bigram_surprisal(sf_dir: str):
    """Bigram-LM surprisal per document — the conditional next-token
    analog of text_surprisal, Laplace-smoothed, in EXACT integers:
    Σ over bigram occurrences of bitlen((c_u + V) // (c_uv + 1)), where
    c_uv is the corpus bigram count, c_u its left marginal and V the
    vocabulary size. One tokenize pass yields per-doc bigram
    multiplicities; corpus tables are bigram-dictionary-sized; the two
    count attachments are hash joins, never a matrix."""
    from .functions.grouped import grouped_count, sorted_aggregate
    from .stages.dedup import _words_flat
    docs = _docs(sf_dir)
    i64 = pa.int64()
    part_schema = pa.schema([("doc_id", i64), ("uv", pa.string()),
                             ("u", pa.string()), ("m", i64)])

    def bigram_partial(b: pa.Table) -> pa.Table:
        words, doc_of = _words_flat(b["text"])
        did = b["doc_id"].to_numpy()
        if len(words) < 2:
            return part_schema.empty_table()
        m = doc_of[1:] == doc_of[:-1]
        u = pa.array(words[:-1][m], pa.string())
        v = pa.array(words[1:][m], pa.string())
        d = pa.array(did[doc_of[:-1][m]], i64)
        uv = pc.binary_join_element_wise(u, v, "\x1f")
        return pa.table({"doc_id": d, "uv": uv, "u": u,
                         "m": pa.array(np.ones(len(u), np.int64))},
                        schema=part_schema) \
            .group_by(["doc_id", "uv", "u"], use_threads=False) \
            .aggregate([("m", "sum")]) \
            .rename_columns(["doc_id", "uv", "u", "m"])

    parts = docs.map_batches(bigram_partial, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()
    cuv = sorted_aggregate(
        parts.map_batches(lambda b: b.select(["uv", "m"]),
                          batch_format="pyarrow"),
        ["uv"], [("m", "sum")], ["uv", "cuv"], 8)
    cu = sorted_aggregate(
        parts.map_batches(lambda b: b.select(["u", "m"]),
                          batch_format="pyarrow"),
        ["u"], [("m", "sum")], ["u", "cu"], 8)

    def vocab_partial(b: pa.Table) -> pa.Table:
        words, _ = _words_flat(b["text"])
        return pa.table({"w": pa.array(np.unique(words), pa.string())})

    V = int(grouped_count(
        docs.map_batches(vocab_partial, batch_format="pyarrow",
                         zero_copy_batch=True), ["w"], "n", 8).count())

    joined = parts.join(cuv, join_type="inner", num_partitions=8,
                        on=("uv",)) \
        .join(cu, join_type="inner", num_partitions=8, on=("u",))

    def weigh(b: pa.Table) -> pa.Table:
        m = b["m"].to_numpy(zero_copy_only=False)
        q = ((b["cu"].to_numpy(zero_copy_only=False) + V)
             // (b["cuv"].to_numpy(zero_copy_only=False) + 1)
             ).astype(np.float64)
        bl = np.frexp(q)[1].astype(np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "s": pa.array(m * bl, i64), "m": b["m"]})

    return sorted_aggregate(
        joined.map_batches(weigh, batch_format="pyarrow"),
        ["doc_id"], [("s", "sum"), ("m", "sum")],
        ["doc_id", "bits", "n_bigrams"], 8).sort("doc_id")


PATH_TOPK = 10


def _q_events_session_paths(sf_dir: str):
    """Session path mining: the top-10 most common 3-event-type
    sequences inside gap-windowed sessions (the behavioral n-gram miner
    behind funnel discovery). Sessionization + trigram emission happen
    inside complete sorted user groups; only (path, count) partials —
    bounded by |event_type|³ — ever shuffle."""
    from .functions.grouped import group_ids, sorted_aggregate, \
        sorted_group_apply
    from .pipelines.relational import SESSION_GAP_S
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"])
    i64 = pa.int64()
    gap_us = SESSION_GAP_S * 1_000_000

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"u": pc.cast(b["user_id"], i64),
                         "t": pc.cast(b["ts"], i64),
                         "e": pc.cast(b["event_id"], i64),
                         "k": pc.cast(b["event_type"], pa.string())})

    out_schema = pa.schema([("path", pa.string()), ("n", i64)])

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows < 3:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["u"])
        t = b["t"].to_numpy(zero_copy_only=False)
        e = b["e"].to_numpy(zero_copy_only=False)
        k = b["k"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, gid))
        g, tt, kk = gid[order], t[order], k[order]
        new = np.concatenate(
            [[True], (g[1:] != g[:-1]) | (np.diff(tt) > gap_us)])
        sid = np.cumsum(new)
        ok = (sid[:-2] == sid[1:-1]) & (sid[1:-1] == sid[2:])
        if not ok.any():
            return out_schema.empty_table()
        a1 = pa.array(kk[:-2][ok], pa.string())
        a2 = pa.array(kk[1:-1][ok], pa.string())
        a3 = pa.array(kk[2:][ok], pa.string())
        path = pc.binary_join_element_wise(a1, a2, a3, ">")
        return pa.table({"path": path, "n": pa.array(
            np.ones(len(a1), np.int64))}, schema=out_schema) \
            .group_by(["path"], use_threads=False) \
            .aggregate([("n", "sum")]).rename_columns(["path", "n"])

    partials = sorted_group_apply(
        ev.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True), ["u"], block, 8)
    return sorted_aggregate(partials, ["path"], [("n", "sum")],
                            ["path", "n"], 1) \
        .sort(["n", "path"], descending=[True, False]).limit(PATH_TOPK)


def _q_kg_transe_negatives(sf_dir: str):
    """Deterministic negative sampling for KG-embedding training
    (TransE-style corrupted triples): for every (turn, usesTool, tool)
    edge, a corrupted object drawn from the ranked tool list at index
    md5(subj#obj)[:8 hex] % |tools|, stepping one slot on a collision
    with the true object. The candidate list is vocabulary-sized and
    rides in the closure; edges stream through one hash pass."""
    from .functions.grouped import grouped_count
    from .pipelines.kg import run_kg
    import hashlib
    tri = run_kg(sf_dir).map_batches(
        lambda b: b.filter(pc.equal(b["pred"], C.PRED_USES_TOOL))
                   .select(["subj", "obj"]),
        batch_format="pyarrow").materialize()
    tools = sorted(grouped_count(
        tri.map_batches(lambda b: b.select(["obj"]),
                        batch_format="pyarrow"),
        ["obj"], "n", 4).to_pandas()["obj"])
    n = len(tools)
    tools_ref = ray.put(tools)

    def corrupt(b: pa.Table) -> pa.Table:
        cand = ray.get(tools_ref)
        s = b["subj"].to_numpy(zero_copy_only=False)
        o = b["obj"].to_numpy(zero_copy_only=False)
        idx = np.array([int(hashlib.md5(
            (a + "#" + c).encode()).hexdigest()[:8], 16) % n
            for a, c in zip(s, o)], np.int64)
        neg = [cand[(i + 1) % n] if cand[i] == c else cand[i]
               for i, c in zip(idx, o)]
        return pa.table({"subj": b["subj"], "obj": b["obj"],
                         "neg_obj": pa.array(neg, pa.string())})

    return tri.map_batches(corrupt, batch_format="pyarrow") \
        .sort(["subj", "obj"])


CONTAM_K, CONTAM_BENCH = 5, "src0"


def _q_text_contamination(sf_dir: str):
    """Benchmark decontamination: flag every non-benchmark document
    sharing at least one 5-gram with the benchmark slice (source
    'src0') and count its shared 5-grams — the train/test-overlap
    scrub every LLM data pipeline runs before training. Distinct
    (shingle, doc) postings shuffle ONCE on the shingle; inside each
    complete shingle group a benchmark flag fans out to train rows —
    no doc pair and no benchmark set ever materializes on the driver."""
    from .functions.grouped import group_ids, grouped_count, \
        sorted_group_apply
    from .stages.dedup import _distinct_doc_shingles
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"])
    i64 = pa.int64()
    post_schema = pa.schema([("s", pa.string()), ("doc_id", i64),
                             ("source", pa.string()),
                             ("bench", pa.bool_())])

    def postings(b: pa.Table) -> pa.Table:
        doc_idx, codes, dic = _distinct_doc_shingles(b["text"], CONTAM_K)
        if len(doc_idx) == 0:
            return post_schema.empty_table()
        did = b["doc_id"].to_numpy()
        src = b["source"].to_numpy(zero_copy_only=False)
        return pa.table({
            "s": pa.array(dic.take(pa.array(codes)), pa.string()),
            "doc_id": pa.array(did[doc_idx], i64),
            "source": pa.array(src[doc_idx], pa.string()),
            "bench": pa.array(src[doc_idx] == CONTAM_BENCH)},
            schema=post_schema)

    hit_schema = pa.schema([("doc_id", i64), ("source", pa.string()),
                            ("h", i64)])

    def flag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return hit_schema.empty_table()
        gid, _ = group_ids(b, ["s"])
        bench = b["bench"].combine_chunks().to_numpy(
            zero_copy_only=False)
        has = np.zeros(gid[-1] + 1, bool)
        np.logical_or.at(has, gid, bench)
        keep = np.flatnonzero(has[gid] & ~bench)
        t = b.take(pa.array(keep))
        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "h": pa.array(np.ones(len(keep), np.int64))},
                        schema=hit_schema)

    hits = sorted_group_apply(
        docs.map_batches(postings, batch_format="pyarrow",
                         zero_copy_batch=True), ["s"], flag, 8)
    df = grouped_count(
        hits.map_batches(lambda b: b.select(["doc_id", "source"]),
                         batch_format="pyarrow"),
        ["doc_id", "source"], "n_hits", 4).sort("doc_id").to_pandas()
    if df.empty:  # an empty Dataset loses its schema through sort
        import pandas as pd
        df = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                           "source": pd.Series(dtype="object"),
                           "n_hits": pd.Series(dtype="int64")})
    return df


def _q_text_repetition_filter(sf_dir: str):
    """MassiveText-style repetition signals per document: the top
    unigram's share of tokens and the duplicate-trigram fraction, both
    ×10⁶ exact-integer ratios — the rule-based quality gate that drops
    looping/boilerplate text before training. All counting is Arrow
    group_by inside the block (documents live whole in rows); output is
    one row per doc."""
    from .stages.dedup import _words_flat
    docs = _docs(sf_dir)
    i64 = pa.int64()

    def f(b: pa.Table) -> pa.Table:
        words, doc_of = _words_flat(b["text"])
        did = b["doc_id"].to_numpy()
        wc = pa.table({"d": pa.array(doc_of, i64),
                       "w": pa.array(words, pa.string())}) \
            .group_by(["d", "w"], use_threads=False) \
            .aggregate([("w", "count")])
        uni = wc.group_by(["d"], use_threads=False) \
            .aggregate([("w_count", "sum"), ("w_count", "max")])
        ud = uni["d"].to_numpy(zero_copy_only=False)
        ntok = uni["w_count_sum"].to_numpy(zero_copy_only=False)
        topc = uni["w_count_max"].to_numpy(zero_copy_only=False)
        order = np.argsort(ud)
        ud, ntok, topc = ud[order], ntok[order], topc[order]

        m2 = doc_of[2:] == doc_of[:-2]
        n_g = np.zeros(len(ud), np.int64)
        n_d = np.zeros(len(ud), np.int64)
        if m2.any():
            g = pc.binary_join_element_wise(
                pa.array(words[:-2][m2], pa.string()),
                pa.array(words[1:-1][m2], pa.string()),
                pa.array(words[2:][m2], pa.string()), " ")
            gd = doc_of[:-2][m2]
            tg = pa.table({"d": pa.array(gd, i64), "g": g}) \
                .group_by(["d", "g"], use_threads=False) \
                .aggregate([("g", "count")])
            tri = tg.group_by(["d"], use_threads=False) \
                .aggregate([("g_count", "sum"), ("g_count", "count")])
            td = tri["d"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ud, td)
            n_g[pos] = tri["g_count_sum"].to_numpy(zero_copy_only=False)
            n_d[pos] = tri["g_count_count"].to_numpy(
                zero_copy_only=False)
        dup_fp = np.where(n_g > 0, 10**6 * (n_g - n_d)
                          // np.maximum(n_g, 1), 0)
        return pa.table({
            "doc_id": pa.array(did[ud], i64),
            "n_tokens": pa.array(ntok, i64),
            "top_fp": pa.array(10**6 * topc // ntok, i64),
            "dup_fp": pa.array(dup_fp, i64)})

    return docs.map_batches(f, batch_format="pyarrow",
                            zero_copy_batch=True).sort("doc_id")


PACK_BUDGET = 512  # tokens per training pack


def _q_text_pack_plan(sf_dir: str):
    """Streaming document packing: assign each doc (in doc_id order) to
    the training pack its running token offset falls in — the
    context-window packing planner. Exact distributed prefix sum in the
    zip_with_index style (functions/joins.py:190): per-block token
    totals (ONE int each) come to the driver, blocks get exclusive
    offsets, local cumsum + offset never moves block data."""
    import ray as _ray
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"])
    i64 = pa.int64()

    def toks(b: pa.Table) -> pa.Table:
        lst = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        return pa.table({"doc_id": pc.cast(b["doc_id"], i64),
                         "n_tokens": pc.cast(
                             pc.list_value_length(lst), i64)})

    mat = docs.map_batches(toks, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .sort("doc_id").materialize()
    refs = mat.to_arrow_refs()

    @_ray.remote
    def meta(t: pa.Table):
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        first = t["doc_id"][0].as_py() if t.num_rows else None
        return int(n.sum()), first

    @_ray.remote
    def tag(t: pa.Table, off: int) -> pa.Table:
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        cum = off + np.concatenate([[0], np.cumsum(n)[:-1]])
        return t.append_column(
            "pack_id", pa.array(cum // PACK_BUDGET, pa.int64()))

    metas = _ray.get([meta.remote(r) for r in refs])
    pairs = sorted(zip(refs, metas),
                   key=lambda rm: (rm[1][1] is None, rm[1][1]))
    offs = np.concatenate(
        [[0], np.cumsum([m[0] for _, m in pairs])[:-1]])
    return ray.data.from_arrow_refs(
        [tag.remote(r, int(o)) for (r, _), o in zip(pairs, offs)])


def _q_kg_sparql_path_star(sf_dir: str):
    """SPARQL zero-or-more property path: {?a rdfs:subClassOf* ?b} over
    the full graph — the closure of the type hierarchy plus the
    identity on every node incident to a subClassOf edge (scoped
    zero-length semantics, functions/bgp._scan). Completes the path
    surface: ^p, p/q, p|q, p+, p*."""
    from .functions.bgp import bgp_match
    from .pipelines.kg import run_kg
    return bgp_match(
        run_kg(sf_dir), [("?a", C.RDFS_SUBCLASS_OF + "*", "?b")],
        ["a", "b"], num_partitions=8).sort(["a", "b"])


def _q_ml_auc(sf_dir: str):
    """Exact ROC-AUC (Mann-Whitney U with ties) for the n_chars score
    predicting lang = 'en', in pure integers: 2U = Σ over distinct
    scores of npos·(2·nneg_below + nneg_equal), AUC×10⁶ = 10⁶·2U //
    (2·P·N). One histogram-shaped grouped count (distinct scores, not
    rows) shuffles; the rank fold runs over that tiny frame."""
    from .functions.grouped import sorted_aggregate
    import pandas as pd
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["n_chars", "lang"])

    def hist(b: pa.Table) -> pa.Table:
        return pa.table({
            "v": pc.cast(b["n_chars"], pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
            "np_": pc.cast(pc.equal(b["lang"], "en"), pa.int64())}) \
            .group_by(["v"], use_threads=False) \
            .aggregate([("n", "sum"), ("np_", "sum")]) \
            .rename_columns(["v", "n", "np_"])

    h = sorted_aggregate(
        docs.map_batches(hist, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["v"], [("n", "sum"), ("np_", "sum")],
        ["v", "n", "np_"], 1).to_pandas().sort_values("v")
    npos = h["np_"].to_numpy()
    nneg = h["n"].to_numpy() - npos
    below = np.concatenate([[0], np.cumsum(nneg)[:-1]])
    u2 = int((npos * (2 * below + nneg)).sum())
    P, N = int(npos.sum()), int(nneg.sum())
    return pd.DataFrame({
        "n_pos": pd.Series([P], dtype="int64"),
        "n_neg": pd.Series([N], dtype="int64"),
        "u2": pd.Series([u2], dtype="int64"),
        "auc_fp": pd.Series([10**6 * u2 // (2 * P * N)],
                            dtype="int64")})


LATE_DAYS = 365


def _q_rel_late_arrivals(sf_dir: str):
    """Streaming watermark accounting: processing orders in o_orderkey
    (arrival) order, an order is LATE when its event day falls more
    than 365 days behind the watermark (running max event day over all
    earlier arrivals). The prefix max distributes as a block scan
    (pack-plan pattern): per-block (max, first-key) summaries to the
    driver, exclusive max carried back in — block data never moves."""
    import ray as _ray
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"])
    i64 = pa.int64()

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "ok": pc.cast(b["o_orderkey"], i64),
            "d": pc.divide(pc.cast(b["o_orderdate"], i64),
                           pa.scalar(86_400_000_000, i64)),
            "yr": pc.cast(pc.year(b["o_orderdate"]), i64)})

    mat = od.map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True).sort("ok").materialize()
    refs = mat.to_arrow_refs()

    @_ray.remote
    def meta(t: pa.Table):
        d = t["d"].to_numpy(zero_copy_only=False)
        first = t["ok"][0].as_py() if t.num_rows else None
        return (int(d.max()) if t.num_rows else None), first

    @_ray.remote
    def late_partial(t: pa.Table, carry: int) -> pa.Table:
        d = t["d"].to_numpy(zero_copy_only=False)
        wm = np.maximum(np.concatenate(
            [[carry], np.maximum.accumulate(d)[:-1]]), carry)
        late = (d < wm - LATE_DAYS).astype(np.int64)
        return pa.table({"year": t["yr"],
                         "n": pa.array(np.ones(len(d), np.int64)),
                         "n_late": pa.array(late)}) \
            .group_by(["year"], use_threads=False) \
            .aggregate([("n", "sum"), ("n_late", "sum")]) \
            .rename_columns(["year", "n_orders", "n_late"])

    metas = _ray.get([meta.remote(r) for r in refs])
    pairs = sorted(zip(refs, metas),
                   key=lambda rm: (rm[1][1] is None, rm[1][1]))
    carry = -(1 << 62)
    tasks = []
    for r, (mx, _) in pairs:
        tasks.append(late_partial.remote(r, carry))
        if mx is not None:
            carry = max(carry, mx)
    from .functions.grouped import sorted_aggregate
    return sorted_aggregate(
        ray.data.from_arrow_refs(tasks),
        ["year"], [("n_orders", "sum"), ("n_late", "sum")],
        ["year", "n_orders", "n_late"], 1).sort("year")


def _q_rel_division_all_priorities(sf_dir: str):
    """Relational division: customers whose orders span EVERY order
    priority present in the table — the 'for all' join SQL spells
    HAVING count(DISTINCT) = total. ONE distinct (custkey, priority)
    grouped count, per-customer fold, and a broadcast scalar for the
    divisor; output is the qualifying customer keys."""
    from .functions.grouped import grouped_count, sorted_aggregate
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"])
    pairs = grouped_count(
        od.map_batches(
            lambda b: pa.table({
                "ck": pc.cast(b["o_custkey"], pa.int64()),
                "pri": pc.cast(b["o_orderpriority"], pa.string())}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["ck", "pri"], "n", 8).materialize()
    total = int(grouped_count(
        pairs.map_batches(lambda b: b.select(["pri"]),
                          batch_format="pyarrow"),
        ["pri"], "n", 1).count())

    def fold(b: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": b["ck"], "l": pa.array(
            np.ones(b.num_rows, np.int64))}) \
            .group_by(["o_custkey"], use_threads=False) \
            .aggregate([("l", "sum")]).rename_columns(["o_custkey", "l"])

    per_cust = sorted_aggregate(
        pairs.map_batches(fold, batch_format="pyarrow"),
        ["o_custkey"], [("l", "sum")], ["o_custkey", "l"], 8)
    return per_cust.filter(expr=f"l == {total}") \
        .map_batches(lambda b: b.select(["o_custkey"]),
                     batch_format="pyarrow").sort("o_custkey")


L_DIV = 2


def _q_privacy_l_diversity(sf_dir: str):
    """l-diversity audit (Machanavajjhala 2007, public): quasi-
    identifier classes (source, n_chars//50) of the documents release
    whose sensitive attribute (lang) takes fewer than l=2 distinct
    values — homogeneous classes leak the attribute even when
    k-anonymous. Distinct (QI, lang) collapse first, so only
    class-sized partials shuffle."""
    from .functions.grouped import grouped_count, sorted_aggregate
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["source", "n_chars", "lang"])
    i64 = pa.int64()

    def qi(b: pa.Table) -> pa.Table:
        return pa.table({
            "source": pc.cast(b["source"], pa.string()),
            "b": pc.divide(pc.cast(b["n_chars"], i64),
                           pa.scalar(50, i64)),
            "lang": pc.cast(b["lang"], pa.string()),
            "n": pa.array(np.ones(b.num_rows, np.int64))}) \
            .group_by(["source", "b", "lang"], use_threads=False) \
            .aggregate([("n", "sum")]) \
            .rename_columns(["source", "b", "lang", "n"])

    cells = sorted_aggregate(
        docs.map_batches(qi, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["source", "b", "lang"], [("n", "sum")],
        ["source", "b", "lang", "n"], 4)

    def fold(b: pa.Table) -> pa.Table:
        return pa.table({"source": b["source"], "b": b["b"],
                         "n": b["n"], "l": pa.array(
                             np.ones(b.num_rows, np.int64))}) \
            .group_by(["source", "b"], use_threads=False) \
            .aggregate([("n", "sum"), ("l", "sum")]) \
            .rename_columns(["source", "b", "n", "l"])

    groups = sorted_aggregate(
        cells.map_batches(fold, batch_format="pyarrow"),
        ["source", "b"], [("n", "sum"), ("l", "sum")],
        ["source", "b", "n", "l"], 4)
    df = groups.filter(expr=f"l < {L_DIV}") \
        .sort(["source", "b"]).to_pandas()
    if df.empty:  # an empty Dataset loses its schema through sort
        import pandas as pd
        df = pd.DataFrame({"source": pd.Series(dtype=object),
                           "b": pd.Series(dtype="int64"),
                           "n": pd.Series(dtype="int64"),
                           "l": pd.Series(dtype="int64")})
    return df


KWIC_TERM, KWIC_WIN = "window", 3


def _q_search_kwic(sf_dir: str):
    """Keyword-in-context snippets: for every document containing the
    query term, the 1-based position of its FIRST occurrence and the
    ±3-token window around it — the hit-highlighting operator of a
    search stack. Fully vectorized: one tokenize pass, np.minimum.at
    for first hits, and the variable-width windows re-assemble as ONE
    Arrow ListArray joined per row — no per-doc Python."""
    from .stages.dedup import _words_flat
    docs = _docs(sf_dir)
    i64 = pa.int64()
    out_schema = pa.schema([("doc_id", i64), ("pos", i64),
                            ("snippet", pa.string())])

    def f(b: pa.Table) -> pa.Table:
        words, doc_of = _words_flat(b["text"])
        did = b["doc_id"].to_numpy()
        nd = len(did)
        if len(words) == 0:
            return out_schema.empty_table()
        counts = np.bincount(doc_of, minlength=nd)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        local = np.arange(len(words)) - starts[doc_of]
        hit = words == KWIC_TERM
        first = np.full(nd, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(first, doc_of[hit], local[hit])
        sel = np.flatnonzero(first < np.iinfo(np.int64).max)
        if len(sel) == 0:
            return out_schema.empty_table()
        f0 = first[sel]
        s0 = np.maximum(0, f0 - KWIC_WIN)
        e0 = np.minimum(counts[sel], f0 + KWIC_WIN + 1)
        ln = e0 - s0
        offs = np.concatenate([[0], np.cumsum(ln)])
        gather = (np.repeat(starts[sel] + s0, ln)
                  + np.arange(offs[-1]) - np.repeat(offs[:-1], ln))
        la = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()),
            pa.array(words[gather], pa.string()))
        return pa.table({"doc_id": pa.array(did[sel], i64),
                         "pos": pa.array(f0 + 1, i64),
                         "snippet": pc.binary_join(la, " ")},
                        schema=out_schema)

    return docs.map_batches(f, batch_format="pyarrow",
                            zero_copy_batch=True).sort("doc_id")


def _q_ml_label_centroids(sf_dir: str):
    """Per-label embedding centroids in fixed point — the class-
    prototype table behind nearest-centroid classification and
    SemDeDup-style cluster pruning: per (label, dim), the exact integer
    Σ floor(10⁶·x) and the vector count (the centroid is sum/n at
    presentation). Per-block partial sums collapse 64-dim vectors to
    |labels|×64 rows before the one tiny shuffle."""
    from .functions.grouped import sorted_aggregate
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["embedding", "label"])
    i64 = pa.int64()

    def partial(b: pa.Table) -> pa.Table:
        lst = b["embedding"]
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        d = pc.list_value_length(lst).to_numpy()[0]
        x = lst.flatten().to_numpy().astype(np.float64)
        fp = np.floor(1e6 * x).astype(np.int64)
        lab = np.repeat(
            b["label"].to_numpy(zero_copy_only=False).astype(np.int64),
            d)
        dim = np.tile(np.arange(d, dtype=np.int64), b.num_rows)
        return pa.table({"label": pa.array(lab, i64),
                         "dim": pa.array(dim, i64),
                         "sum_fp": pa.array(fp, i64),
                         "n": pa.array(np.ones(len(dim), np.int64))}) \
            .group_by(["label", "dim"], use_threads=False) \
            .aggregate([("sum_fp", "sum"), ("n", "sum")]) \
            .rename_columns(["label", "dim", "sum_fp", "n"])

    return sorted_aggregate(
        emb.map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["label", "dim"], [("sum_fp", "sum"), ("n", "sum")],
        ["label", "dim", "sum_fp", "n"], 1).sort(["label", "dim"])


def _q_kg_sparql_path_opt(sf_dir: str):
    """SPARQL zero-or-one property path {?a rdfs:subClassOf? ?b}: the
    base edges unioned with the identity on incident nodes — the last
    missing path modifier (^, /, |, +, * already covered)."""
    from .functions.bgp import bgp_match
    from .pipelines.kg import run_kg
    return bgp_match(
        run_kg(sf_dir), [("?a", C.RDFS_SUBCLASS_OF + "?", "?b")],
        ["a", "b"], num_partitions=8).sort(["a", "b"])


GAP_WEEK_BUCKET = 7


def _q_rel_reorder_gaps(sf_dir: str):
    """Reorder-latency histogram: day gaps between a customer's
    consecutive orders, bucketed to weeks — the repeat-purchase cadence
    distribution. Consecutive diffs happen inside complete sorted
    customer groups; only (bucket, count) partials shuffle."""
    from .functions.grouped import group_ids, sorted_aggregate, \
        sorted_group_apply
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_orderdate"])
    i64 = pa.int64()

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "ck": pc.cast(b["o_custkey"], i64),
            "ok": pc.cast(b["o_orderkey"], i64),
            "day": pc.divide(pc.cast(b["o_orderdate"], i64),
                             pa.scalar(86_400_000_000, i64))})

    out_schema = pa.schema([("bucket", i64), ("n", i64)])

    def block(b: pa.Table) -> pa.Table:
        if b.num_rows < 2:
            return out_schema.empty_table()
        gid, _ = group_ids(b, ["ck"])
        day = b["day"].to_numpy(zero_copy_only=False)
        ok = b["ok"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, day, gid))
        g, d = gid[order], day[order]
        same = g[1:] == g[:-1]
        gaps = (d[1:] - d[:-1])[same]
        if len(gaps) == 0:
            return out_schema.empty_table()
        return pa.table({"bucket": pa.array(
            gaps // GAP_WEEK_BUCKET, i64),
            "n": pa.array(np.ones(len(gaps), np.int64))},
            schema=out_schema) \
            .group_by(["bucket"], use_threads=False) \
            .aggregate([("n", "sum")]).rename_columns(["bucket", "n"])

    partials = sorted_group_apply(
        od.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True), ["ck"], block, 8)
    return sorted_aggregate(partials, ["bucket"], [("n", "sum")],
                            ["bucket", "n"], 1).sort("bucket")


SPLIT_TRAIN_PCT, SPLIT_VAL_PCT = 80, 10


def _q_sample_exact_split(sf_dir: str):
    """Exact-proportion train/val/test split: rank every doc by its
    splitmix64 hash (a bijection on uint64 — ranks are unique) and cut
    at floor(80%) / floor(90%) of the total — EXACT split sizes, unlike
    the Bernoulli sample_hash whose sizes fluctuate. The global rank is
    zip_with_index over the hash sort; assignment is two integer
    thresholds; no driver data."""
    from .functions.joins import zip_with_index
    from .functions.sampling import splitmix64
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
    i64 = pa.int64()
    n = int(docs.count())
    cut1 = n * SPLIT_TRAIN_PCT // 100
    cut2 = n * (SPLIT_TRAIN_PCT + SPLIT_VAL_PCT) // 100

    def hashed(b: pa.Table) -> pa.Table:
        k = pc.cast(b["doc_id"], i64).to_numpy(zero_copy_only=False)
        h = splitmix64(k.astype(np.uint64)).astype(np.int64)
        return pa.table({"doc_id": pa.array(k, i64),
                         "h": pa.array(h, i64)})

    # rank by the SIGNED view of the hash on both engines: the oracle
    # casts the UBIGINT hash to BIGINT the same way, so order matches.
    ranked = zip_with_index(
        docs.map_batches(hashed, batch_format="pyarrow",
                         zero_copy_batch=True).sort("h"),
        id_col="rk", order_by="h")

    def assign(b: pa.Table) -> pa.Table:
        rk = b["rk"].to_numpy(zero_copy_only=False)
        split = np.where(rk < cut1, "train",
                         np.where(rk < cut2, "val", "test"))
        return pa.table({"doc_id": b["doc_id"],
                         "split": pa.array(split, pa.string())})

    return ranked.map_batches(assign, batch_format="pyarrow") \
        .sort("doc_id")


ROLL_WIN_DAYS = 7


def _q_events_rolling_distinct_users(sf_dir: str):
    """Trailing-7-day distinct active users per day — the sliding-
    window COUNT DISTINCT the oracle spells as a correlated subquery.
    Exact and shuffle-light: distinct (user, day) pairs collapse first;
    inside complete sorted user groups the active days merge into
    coverage intervals (a user covers window-day w iff some active day
    lies in [w-6, w]) emitting ±1 deltas; a calendar-bounded cumsum
    turns deltas into counts. No pair of users ever meets."""
    from .functions.grouped import group_ids, grouped_count, \
        sorted_group_apply
    import pandas as pd
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])
    i64 = pa.int64()
    W = ROLL_WIN_DAYS - 1

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "u": pc.cast(b["user_id"], i64),
            "d": pc.divide(pc.cast(b["ts"], i64),
                           pa.scalar(86_400_000_000, i64))})

    ud = grouped_count(
        ev.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["u", "d"], "n", 8).drop_columns(["n"]).materialize()
    mm = ud.map_batches(
        lambda b: pa.table({"lo": pa.array(
            [int(pc.min(b["d"]).as_py())], i64),
            "hi": pa.array([int(pc.max(b["d"]).as_py())], i64)}),
        batch_format="pyarrow").to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    delta_schema = pa.schema([("day", i64), ("delta", i64)])

    def intervals(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return delta_schema.empty_table()
        gid, _ = group_ids(b, ["u"])
        d = b["d"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, gid))
        g, dd = gid[order], d[order]
        # new coverage interval when the user changes or the gap > W
        new = np.concatenate(
            [[True], (g[1:] != g[:-1]) | (dd[1:] - dd[:-1] > W)])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(dd)) - 1
        a = dd[starts]                    # interval covers [a, b+W]
        z = dd[ends] + W + 1
        return pa.table({
            "day": pa.array(np.concatenate([a, z]), i64),
            "delta": pa.array(np.concatenate(
                [np.ones(len(a), np.int64),
                 -np.ones(len(a), np.int64)]))}, schema=delta_schema)

    deltas = sorted_group_apply(ud, ["u"], intervals, 8)
    agg = grouped_count(deltas, ["day", "delta"], "m", 4).to_pandas()
    days = np.arange(lo, hi + 1)
    net = np.zeros(hi - lo + 2 + ROLL_WIN_DAYS, np.int64)
    for day, delta, m in agg.itertuples(index=False):
        if day <= hi:
            net[day - lo] += delta * m
    counts = np.cumsum(net)[:len(days)]
    return pd.DataFrame({"day": pd.Series(days, dtype="int64"),
                         "n_users": pd.Series(counts, dtype="int64")})


def _q_ml_nearest_centroid(sf_dir: str):
    """Nearest-centroid classification confusion matrix: assign every
    embedding to the label whose fixed-point centroid (sum_fp // n,
    pinned floor convention) minimizes exact integer squared L2
    (tie → smallest label), then count (label_true, label_pred) cells.
    Centroids are a |labels|×64 broadcast; assignment is one numpy
    matmul-shaped pass per block; only confusion cells shuffle."""
    from .functions.grouped import grouped_count
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["embedding", "label"])
    cen = _q_ml_label_centroids(sf_dir).to_pandas()
    labels = np.sort(cen["label"].unique()).astype(np.int64)
    d = int(cen["dim"].max()) + 1
    C_fp = np.zeros((len(labels), d), np.int64)
    pos = {int(l): i for i, l in enumerate(labels)}
    for lab, dim, s, n in cen[["label", "dim", "sum_fp", "n"]] \
            .itertuples(index=False):
        q = int(s) // int(n)
        if s < 0 and s % n != 0:
            q += 1  # truncate toward zero — DuckDB // convention
        C_fp[pos[int(lab)], int(dim)] = q
    cen_ref = ray.put((C_fp, labels))

    def assign(b: pa.Table) -> pa.Table:
        Cm, labs = ray.get(cen_ref)
        lst = b["embedding"]
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        x = lst.flatten().to_numpy().astype(np.float64)
        fp = np.floor(1e6 * x).astype(np.int64).reshape(b.num_rows, -1)
        # exact integer distances: (v-c)·(v-c) per centroid
        d2 = ((fp[:, None, :] - Cm[None, :, :]) ** 2).sum(axis=2)
        pred = labs[np.argmin(d2, axis=1)]
        return pa.table({
            "label_true": pc.cast(b["label"], pa.int64()),
            "label_pred": pa.array(pred, pa.int64())})

    return grouped_count(
        emb.map_batches(assign, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["label_true", "label_pred"], "n", 4) \
        .sort(["label_true", "label_pred"])


def _q_rel_cume_dist_prices(sf_dir: str):
    """Global cumulative distribution (SQL cume_dist) of order value in
    cents, ×10⁶ integer: per order, (#orders with value ≤ mine) / N.
    Never ranks raw rows — the distinct-value histogram (AUC pattern)
    cumsums once, and values attach back to orders by a sorted probe of
    the broadcast histogram (distinct order prices are histogram-
    sized); ties get the shared ≤-count exactly as cume_dist does."""
    from .functions.grouped import sorted_aggregate
    from .functions.joins import probe_sorted
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice"])
    i64 = pa.int64()

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "ok": pc.cast(b["o_orderkey"], i64),
            "p": pc.cast(pc.round(pc.multiply(
                b["o_totalprice"], 100.0)), i64)})

    cents = od.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    def hist(b: pa.Table) -> pa.Table:
        return b.select(["p"]).append_column(
            "n", pa.array(np.ones(b.num_rows, np.int64))) \
            .group_by(["p"], use_threads=False) \
            .aggregate([("n", "sum")]).rename_columns(["p", "n"])

    h = sorted_aggregate(
        cents.map_batches(hist, batch_format="pyarrow"),
        ["p"], [("n", "sum")], ["p", "n"], 1).to_pandas().sort_values("p")
    vals = h["p"].to_numpy()
    le = np.cumsum(h["n"].to_numpy())
    N = int(le[-1])
    ref = ray.put((vals, le))

    def attach(b: pa.Table) -> pa.Table:
        v, c = ray.get(ref)
        le_mine = probe_sorted(v, c, b["p"].to_numpy(
            zero_copy_only=False))
        return pa.table({
            "o_orderkey": b["ok"],
            "price_c": b["p"],
            "cume_fp": pa.array(10**6 * le_mine // N, i64)})

    return cents.map_batches(attach, batch_format="pyarrow") \
        .sort("o_orderkey")


VOCAB_OVERLAP_TOPK = 10


def _q_text_source_vocab_overlap(sf_dir: str):
    """Pairwise source-vocabulary Jaccard — the corpus-mixing
    diagnostic that tells which sources are near-duplicates of each
    other at the vocabulary level. Distinct (word, source-id) postings
    shuffle once; the shared vectorized pair machinery
    (functions/grouped.pairs_within_groups) emits ≤C(20,2) counted
    pairs per word group; marginals are a 20-row broadcast; top-10 by
    Jaccard ×10⁶ with full numeric tie-break."""
    from .functions.grouped import grouped_count, pairs_within_groups
    from .stages.dedup import _words_flat
    import pandas as pd
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["text", "source"])
    i64 = pa.int64()

    def postings(b: pa.Table) -> pa.Table:
        words, doc_of = _words_flat(b["text"])
        sid = pc.cast(pc.utf8_slice_codeunits(
            b["source"], 3, 32), i64).to_numpy(zero_copy_only=False)
        return pa.table({"w": pa.array(words, pa.string()),
                         "s": pa.array(sid[doc_of], i64)}) \
            .group_by(["w", "s"], use_threads=False).aggregate([])

    ws = grouped_count(
        docs.map_batches(postings, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["w", "s"], "n", 8).drop_columns(["n"]).materialize()
    sizes = grouped_count(
        ws.map_batches(lambda b: b.select(["s"]),
                       batch_format="pyarrow"),
        ["s"], "n", 1).to_pandas()
    size_of = dict(zip(sizes["s"].astype(int), sizes["n"].astype(int)))

    inter = pairs_within_groups(ws, ["w"], "s", count_col="inter",
                                num_partitions=8).to_pandas()
    na = inter["doc_a"].map(size_of).astype(int)
    nb = inter["doc_b"].map(size_of).astype(int)
    iv = inter["inter"].astype(int)
    jac = (10**6 * iv) // (na + nb - iv)
    out = pd.DataFrame({
        "src_a": pd.Series(inter["doc_a"].to_numpy(), dtype="int64"),
        "src_b": pd.Series(inter["doc_b"].to_numpy(), dtype="int64"),
        "n_inter": pd.Series(iv.to_numpy(), dtype="int64"),
        "jaccard_fp": pd.Series(jac.to_numpy(), dtype="int64")})
    return out.sort_values(
        ["jaccard_fp", "src_a", "src_b"],
        ascending=[False, True, True]).head(VOCAB_OVERLAP_TOPK) \
        .reset_index(drop=True)


def _q_events_retention_matrix(sf_dir: str):
    """Weekly retention triangle: distinct users active at week-age k
    per first-week cohort — the user-count twin of the cohort revenue
    matrix. Distinct (user, week) pairs collapse first; the cohort
    attaches by a per-user grouped min inside the same sorted pass;
    only (cohort, age, count) cells shuffle."""
    from .functions.grouped import group_ids, grouped_count, \
        sorted_group_apply, sorted_aggregate
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])
    i64 = pa.int64()

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "u": pc.cast(b["user_id"], i64),
            "wk": pc.divide(pc.cast(b["ts"], i64),
                            pa.scalar(7 * 86_400_000_000, i64))})

    uw = grouped_count(
        ev.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["u", "wk"], "n", 8).drop_columns(["n"])
    cell_schema = pa.schema([("cohort", i64), ("age", i64), ("m", i64)])

    def cells(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return cell_schema.empty_table()
        gid, starts = group_ids(b, ["u"])
        wk = b["wk"].to_numpy(zero_copy_only=False)
        order = np.lexsort((wk, gid))
        w = wk[order]
        first = np.minimum.reduceat(w, starts)
        cohort = np.repeat(first, np.diff(np.append(starts, len(w))))
        return pa.table({"cohort": pa.array(cohort, i64),
                         "age": pa.array(w - cohort, i64),
                         "m": pa.array(np.ones(len(w), np.int64))},
                        schema=cell_schema) \
            .group_by(["cohort", "age"], use_threads=False) \
            .aggregate([("m", "sum")]) \
            .rename_columns(["cohort", "age", "m"])

    return sorted_aggregate(
        sorted_group_apply(uw, ["u"], cells, 8),
        ["cohort", "age"], [("m", "sum")],
        ["cohort", "age", "n_users"], 1).sort(["cohort", "age"])


def _q_ml_best_f1_threshold(sf_dir: str):
    """Operating-point selection on the PR sweep: the threshold bin
    maximizing F1, picked by the ×10⁶-floored F1 (pinned convention on
    both engines — the floor IS the comparison key, then smallest bin)
    so the argmax is engine-independent. Reuses the one-pass PR
    histogram; the sweep is a 10-row driver fold."""
    import pandas as pd
    pr = _q_ml_pr_curve(sf_dir)
    tp = pr["tp"].to_numpy()
    fp = pr["fp"].to_numpy()
    fn = pr["fn"].to_numpy()
    den = 2 * tp + fp + fn
    f1 = np.where(den > 0, 10**6 * 2 * tp // np.maximum(den, 1), 0)
    best = int(np.argmax(f1))  # first max = smallest bin on ties
    return pd.DataFrame({
        "best_bin": pd.Series([best], dtype="int64"),
        "tp": pd.Series([tp[best]], dtype="int64"),
        "fp": pd.Series([fp[best]], dtype="int64"),
        "fn": pd.Series([fn[best]], dtype="int64"),
        "f1_fp": pd.Series([f1[best]], dtype="int64")})


def _q_dedup_cluster_sizes(sf_dir: str):
    """Duplicate-cluster statistics: connected components over the
    verified near-dup pair graph (Jaccard ≥ 0.5), reported as
    (cluster representative = min doc_id, size) — the release report a
    dedup stage publishes. Doc ids ride zero-padded so the components'
    lexicographic-min label IS the numeric min; the component labels
    come from the same distributed label-propagation used by
    canonicalization."""
    from .functions.components import connected_components
    from .stages.dedup import minhash_lsh_pairs
    import pandas as pd
    pairs = minhash_lsh_pairs(_docs(sf_dir), threshold=0.5)

    def edges(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy(zero_copy_only=False)
        c = b["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(np.char.zfill(a.astype(str), 12), pa.string()),
            "v": pa.array(np.char.zfill(c.astype(str), 12),
                          pa.string())})

    labels = connected_components(
        pairs.map_batches(edges, batch_format="pyarrow"),
        num_partitions=4).to_pandas()
    if labels.empty:
        return pd.DataFrame({"cluster_rep": pd.Series(dtype="int64"),
                             "size": pd.Series(dtype="int64")})
    g = labels.groupby("label").size().reset_index(name="size")
    return pd.DataFrame({
        "cluster_rep": pd.Series(g["label"].astype("int64").to_numpy(),
                                 dtype="int64"),
        "size": pd.Series(g["size"].to_numpy(), dtype="int64")}) \
        .sort_values("cluster_rep").reset_index(drop=True)


BURST_MIN = 2


def _q_events_burst_users(sf_dir: str):
    """Bot/burst detection heuristic: users with ≥ 2 events inside any
    single minute — the rate-limit screen of an abuse/quality pipeline.
    ONE grouped (user, minute) count, per-user max fold, threshold
    filter; schema pinned for the legally-empty result."""
    from .functions.grouped import grouped_count, sorted_aggregate
    import pandas as pd
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])
    i64 = pa.int64()

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "u": pc.cast(b["user_id"], i64),
            "minute": pc.divide(pc.cast(b["ts"], i64),
                                pa.scalar(60_000_000, i64))})

    um = grouped_count(
        ev.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True), ["u", "minute"], "k", 8)

    def fold(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["u"], "max_per_min": b["k"],
                         "n_events": b["k"]}) \
            .group_by(["user_id"], use_threads=False) \
            .aggregate([("max_per_min", "max"), ("n_events", "sum")]) \
            .rename_columns(["user_id", "max_per_min", "n_events"])

    per_user = sorted_aggregate(
        um.map_batches(fold, batch_format="pyarrow"),
        ["user_id"], [("max_per_min", "max"), ("n_events", "sum")],
        ["user_id", "max_per_min", "n_events"], 4)
    df = per_user.filter(expr=f"max_per_min >= {BURST_MIN}") \
        .sort("user_id").to_pandas()
    if df.empty:  # an empty Dataset loses its schema through sort
        df = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                           "max_per_min": pd.Series(dtype="int64"),
                           "n_events": pd.Series(dtype="int64")})
    return df


MARKOV_ITERS = 3


def _q_events_markov_stationary(sf_dir: str):
    """Stationary mass of the event-type Markov chain after 3 integer
    power-iteration rounds — 'where does user attention settle': the
    transition MATRIX (|types|² rows, tiny by contract however large
    the event log) comes from the distributed LAG+count pipeline; the
    iteration itself is a driver numpy fold with per-term floor
    division (x_i·n_ij // rowsum_i), bit-equal to the unrolled SQL.
    Mass entering a type with no outgoing transitions evaporates
    (same convention as dangling PageRank mass)."""
    import pandas as pd
    from .functions.grouped import grouped_count
    tr = _q_events_transitions(sf_dir).to_pandas()
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type"])
    st = grouped_count(ev, ["event_type"], "n", 1).to_pandas()
    states = sorted(st["event_type"])
    k = len(states)
    idx = {s: i for i, s in enumerate(states)}
    n = np.zeros((k, k), np.int64)
    for s, d, c in zip(tr["prev_type"], tr["event_type"], tr["n"]):
        n[idx[s], idx[d]] = c
    rowsum = n.sum(axis=1)
    safe = np.maximum(rowsum, 1)
    x = np.full(k, 10**6, np.int64)
    for _ in range(MARKOV_ITERS):
        contrib = (x[:, None] * n) // safe[:, None]
        contrib[rowsum == 0, :] = 0
        x = contrib.sum(axis=0)
    return pd.DataFrame({"event_type": pd.Series(states, dtype=object),
                         "mass_fp": pd.Series(x, dtype="int64")})


BURSTY_TOPK = 20


def _q_text_term_burstiness(sf_dir: str):
    """Term burstiness (Church/Gale): variance-to-mean ratio ×10⁶ of
    per-document counts over ALL docs, for the top-20 terms by total
    frequency — separates topical terms (bursty, VMR >> 1) from
    function words (VMR ≈ 1). Per-(term, doc) counts are per-batch
    exact; only vocabulary-sized (term, tf, Σc²) partials shuffle;
    the VMR fold runs on the 20 survivors."""
    from .functions.grouped import sorted_aggregate
    from .stages.dedup import _words_flat
    i64 = pa.int64()
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    n_docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id"]).count()

    def partials(b: pa.Table) -> pa.Table:
        words, doc_of = _words_flat(b["text"])
        per_doc = pa.table({
            "w": pa.array(words, pa.string()),
            "d": pa.array(doc_of, i64)}) \
            .group_by(["w", "d"], use_threads=False) \
            .aggregate([("d", "count")]) \
            .rename_columns(["w", "d", "c"])
        c = per_doc["c"].to_numpy()
        return pa.table({"w": per_doc["w"],
                         "tf": per_doc["c"],
                         "ss": pa.array(c * c, i64)}) \
            .group_by(["w"], use_threads=False) \
            .aggregate([("tf", "sum"), ("ss", "sum")]) \
            .rename_columns(["w", "tf", "ss"])

    agg = sorted_aggregate(
        docs.map_batches(partials, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["w"], [("tf", "sum"), ("ss", "sum")], ["w", "tf", "ss"], 8)
    top = agg.sort(["tf", "w"], descending=[True, False]) \
        .limit(BURSTY_TOPK).to_pandas()
    tf = top["tf"].to_numpy()
    ss = top["ss"].to_numpy()
    vmr = (10**6 * (n_docs * ss - tf * tf)) // (n_docs * tf)
    import pandas as pd
    return pd.DataFrame({
        "term": pd.Series(top["w"].to_numpy(), dtype=object),
        "tf": pd.Series(tf, dtype="int64"),
        "vmr_fp": pd.Series(vmr, dtype="int64")})


def _q_sample_balanced_classes(sf_dir: str):
    """Class-balanced downsample: every language keeps exactly
    min-class-count docs — the deterministic variant (smallest doc_ids
    win) of balanced training-set construction. Class counts are a
    tiny driver fold; selection runs on colocated complete lang groups
    (class cardinality is small by contract — a per-class block is the
    documented partitioning assumption)."""
    from .functions.grouped import grouped_count, sorted_group_apply
    i64 = pa.int64()
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang"])
    counts = grouped_count(
        docs.map_batches(lambda b: b.select(["lang"]),
                         batch_format="pyarrow"),
        ["lang"], "n", 1).to_pandas()
    m = int(counts["n"].min())

    def head_m(b: pa.Table) -> pa.Table:
        pdf = b.to_pandas().sort_values(["lang", "doc_id"])
        out = pdf.groupby("lang", sort=False).head(m)
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(), i64),
            "lang": pa.array(out["lang"].to_numpy(), pa.string())})

    return sorted_group_apply(docs, ["lang"], head_m, 4).sort("doc_id")


ANN_RECALL_K = 10


def _q_ann_recall_at_k(sf_dir: str):
    """Recall@10 of the IVF index against exact brute force over the
    same 8 queries — the eval harness every ANN deployment ships with.
    Both arms reuse the existing operators; the overlap fold runs on
    the (n_queries × k)-sized results. No SQL twin: IVF probe routing
    is not SQL-expressible (rows-only check, like ann_ivf_topk
    itself)."""
    import pandas as pd
    bf = _q_ann_topk(sf_dir).to_pandas()
    ivf = _q_ann_ivf(sf_dir).to_pandas()
    inter = pd.merge(bf[["query_id", "vec_id"]],
                     ivf[["query_id", "vec_id"]],
                     on=["query_id", "vec_id"])
    nq = bf["query_id"].nunique()
    recall_fp = 10**6 * len(inter) // (nq * ANN_RECALL_K)
    return pd.DataFrame({
        "k": pd.Series([ANN_RECALL_K], dtype="int64"),
        "n_queries": pd.Series([nq], dtype="int64"),
        "n_overlap": pd.Series([len(inter)], dtype="int64"),
        "recall_fp": pd.Series([recall_fp], dtype="int64")})


GOPHER_MIN_WORDS = 25
GOPHER_MWL_LO = 4_000_000
GOPHER_MWL_HI = 5_000_000
GOPHER_TTR_MIN = 350_000


def _q_text_gopher_rules(sf_dir: str):
    """Gopher-style quality-rule report per source (Rae et al. 2021 §A1.1
    adapted to the fixture corpus): per-doc word count, mean word length
    and type-token ratio, thresholded to fail flags, rolled up to a
    per-source curation report (how much of each crawl source a filter
    battery would drop). All per-doc stats are exact integers computed
    inside one stateless vectorized pass; only |sources| partial rows
    shuffle."""
    from .functions.grouped import sorted_aggregate
    i64 = pa.int64()
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["text", "source"])
    names = ["source", "n_docs", "fail_words", "fail_meanlen",
             "fail_ttr", "n_pass"]
    out_schema = pa.schema([(n, pa.string() if n == "source" else i64)
                            for n in names])

    def partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        lst = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        counts = pc.list_value_length(lst).to_numpy().astype(np.int64)
        flat = lst.flatten()
        doc_of = np.repeat(np.arange(n), counts)
        wl = pc.utf8_length(flat).to_numpy().astype(np.int64)
        nc = np.bincount(doc_of, weights=wl, minlength=n).astype(np.int64)
        words = flat.to_numpy(zero_copy_only=False)
        dic, inv = np.unique(words, return_inverse=True)
        uk = np.unique(doc_of * len(dic) + inv)
        nd = np.bincount(uk // len(dic), minlength=n).astype(np.int64)
        nw = np.maximum(counts, 1)
        mwl = 1_000_000 * nc // nw
        ttr = 1_000_000 * nd // nw
        f1 = (counts < GOPHER_MIN_WORDS).astype(np.int64)
        f2 = ((mwl < GOPHER_MWL_LO) | (mwl > GOPHER_MWL_HI)).astype(np.int64)
        f3 = (ttr < GOPHER_TTR_MIN).astype(np.int64)
        ok = ((f1 | f2 | f3) == 0).astype(np.int64)
        return pa.table({
            "source": b["source"],
            "n_docs": pa.array(np.ones(n, np.int64)),
            "fail_words": pa.array(f1), "fail_meanlen": pa.array(f2),
            "fail_ttr": pa.array(f3), "n_pass": pa.array(ok)},
            schema=out_schema) \
            .group_by(["source"], use_threads=False) \
            .aggregate([(c, "sum") for c in names[1:]]) \
            .rename_columns(names)

    return sorted_aggregate(
        docs.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["source"], [(c, "sum") for c in names[1:]], names, 4).sort("source")


NDCG_K = 10
NDCG_W = [int(round(1_000_000 / np.log2(i + 1)))
          for i in range(1, NDCG_K + 1)]


def _q_ml_ndcg(sf_dir: str):
    """NDCG@10 of the BM25 ranking against graded relevance = total
    query-term occurrences per doc (the standard ranking-eval harness).
    Discount weights are integer fixed-point constants hardcoded on BOTH
    sides (round(1e6/log2(rank+1))), so DCG sums are exact integers.
    Relevance is a sparse stateless pass (each doc wholly inside its
    batch); the ideal top-10 uses the pruned per-key top-k; the final
    fold runs on |queries|·k rows."""
    import pandas as pd
    from .functions.topn import top_n_per_key
    from .stages.dedup import _words_flat
    i64 = pa.int64()
    terms_per_q = [list(dict.fromkeys(q.lower().split(" ")))
                   for q in _BM25_QUERIES]
    rel_schema = pa.schema([("query_id", i64), ("doc_id", i64),
                            ("rel", i64)])

    def rel_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return rel_schema.empty_table()
        words, doc_of = _words_flat(b["text"])
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        outs = []
        for qi, ts in enumerate(terms_per_q):
            mask = np.isin(words, ts)
            if not mask.any():
                continue
            cnt = np.bincount(doc_of[mask], minlength=b.num_rows)
            nz = np.nonzero(cnt)[0]
            outs.append(pa.table({
                "query_id": pa.array(np.full(len(nz), qi, np.int64)),
                "doc_id": pa.array(did[nz], i64),
                "rel": pa.array(cnt[nz].astype(np.int64))},
                schema=rel_schema))
        return pa.concat_tables(outs) if outs else rel_schema.empty_table()

    rel = _docs(sf_dir).map_batches(rel_partial, batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
    ideal = top_n_per_key(rel, ["query_id"],
                          [("rel", False), ("doc_id", True)],
                          NDCG_K).to_pandas()
    idcg = {int(q): int((g["rel"].to_numpy()
                         * np.array(NDCG_W[:len(g)], np.int64)).sum())
            for q, g in ideal.sort_values("rank").groupby("query_id")}
    bm = to_pandas_any(_q_search_bm25(sf_dir))
    keys = set((bm["query_id"].astype("int64") * 10**12
                + bm["doc_id"].astype("int64")).tolist())

    def pick(b: pa.Table) -> pa.Table:
        k = (b["query_id"].to_numpy(zero_copy_only=False) * 10**12
             + b["doc_id"].to_numpy(zero_copy_only=False))
        return b.filter(pa.array(np.isin(k, np.fromiter(
            keys, np.int64, len(keys)))))

    hits = rel.map_batches(pick, batch_format="pyarrow").to_pandas()
    m = bm.merge(hits, on=["query_id", "doc_id"], how="left")
    m["rel"] = m["rel"].fillna(0).astype("int64")
    m["w"] = np.array(NDCG_W, np.int64)[m["rank"].to_numpy() - 1]
    dcg = (m["rel"] * m["w"]).groupby(m["query_id"]).sum()
    qs = sorted(idcg)
    rows = [(q, int(dcg.get(q, 0)), idcg[q],
             1_000_000 * int(dcg.get(q, 0)) // idcg[q] if idcg[q] else 0)
            for q in qs]
    return pd.DataFrame(rows, columns=["query_id", "dcg", "idcg",
                                       "ndcg_fp"]).astype("int64")


def _q_events_type_jaccard(sf_dir: str):
    """Exact Jaccard overlap of USER SETS between every co-occurring
    event-type pair — the audience-overlap matrix (the exact twin of
    approx_distinct_overlap's HLL estimate). Distinct (type, user) pairs
    collapse per batch first; pair expansion runs on colocated complete
    user groups (a user's type set is bounded by |types|); only
    |types|²-sized counts reach the driver."""
    import pandas as pd
    from .functions.grouped import grouped_count
    from .functions.triangles import within_group_pairs
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "user_id"])
    tu = grouped_count(ev, ["event_type", "user_id"], "n", 4)
    sizes = grouped_count(
        tu.map_batches(lambda b: b.select(["event_type"]),
                       batch_format="pyarrow"),
        ["event_type"], "n", 1).to_pandas()
    n_of = dict(zip(sizes["event_type"], sizes["n"].astype(int)))
    pairs = within_group_pairs(
        tu.map_batches(lambda b: pa.table(
            {"user_id": b["user_id"], "t": b["event_type"]}),
            batch_format="pyarrow"),
        "user_id", "t", distinct=False)
    inter = grouped_count(pairs, ["u", "v"], "inter", 4).to_pandas()
    na = inter["u"].map(n_of).astype("int64")
    nb = inter["v"].map(n_of).astype("int64")
    iv = inter["inter"].astype("int64")
    return pd.DataFrame({
        "type_a": pd.Series(inter["u"].to_numpy(), dtype=object),
        "type_b": pd.Series(inter["v"].to_numpy(), dtype=object),
        "n_a": na, "n_b": nb, "inter": iv,
        "jac_fp": (1_000_000 * iv // (na + nb - iv)).astype("int64")}) \
        .sort_values(["type_a", "type_b"]).reset_index(drop=True)


KCENTER_K = 4


def _q_sample_coreset_kcenter(sf_dir: str):
    """Greedy k-center coreset (Gonzalez 1985) over the embedding table —
    the classic diverse-subset selector for training-data curation. All
    distances are exact integers on fixed-point components floor(x·1e6),
    so the argmax is deterministic (ties → smallest vec_id). Each of the
    K-1 rounds is ONE stateless pass: centers broadcast via ray.put, each
    block emits its single best candidate row (id, min-dist², vector),
    the driver folds block partials — never the matrix."""
    import pandas as pd
    emb = _emb(sf_dir)
    i64 = pa.int64()

    def fp_rows(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        e = b["embedding"].combine_chunks()
        d = len(e[0])
        m = np.floor(e.flatten().to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1e6).astype(np.int64) \
            .reshape(b.num_rows, d)
        return m, b["vec_id"].to_numpy(zero_copy_only=False)

    cand_schema = pa.schema([("vec_id", i64), ("d2", i64),
                             ("vec", pa.list_(i64))])

    def seed_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return cand_schema.empty_table()
        m, vid = fp_rows(b)
        j = int(np.argmin(vid))
        return pa.table({"vec_id": pa.array([vid[j]], i64),
                         "d2": pa.array([0], i64),
                         "vec": pa.array([m[j].tolist()], pa.list_(i64))},
                        schema=cand_schema)

    def far_partial(centers_ref):
        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return cand_schema.empty_table()
            cm = ray.get(centers_ref) if isinstance(
                centers_ref, ray.ObjectRef) else centers_ref
            m, vid = fp_rows(b)
            dif = m[:, None, :] - cm[None, :, :]
            mind = np.einsum("nkd,nkd->nk", dif, dif).min(axis=1)
            j = int(np.lexsort((vid, -mind))[0])
            return pa.table({"vec_id": pa.array([vid[j]], i64),
                             "d2": pa.array([int(mind[j])], i64),
                             "vec": pa.array([m[j].tolist()],
                                             pa.list_(i64))},
                            schema=cand_schema)
        return fn

    def fold(parts: pa.Table, by_min_id: bool) -> tuple[int, int, np.ndarray]:
        vid = parts["vec_id"].to_numpy(zero_copy_only=False)
        d2 = parts["d2"].to_numpy(zero_copy_only=False)
        j = (int(np.argmin(vid)) if by_min_id
             else int(np.lexsort((vid, -d2))[0]))
        return int(vid[j]), int(d2[j]), np.asarray(
            parts["vec"][j].as_py(), np.int64)

    parts = pa.concat_tables(ray.get(
        emb.map_batches(seed_partial, batch_format="pyarrow",
                        zero_copy_batch=True).to_arrow_refs()))
    v0, _, vec0 = fold(parts, by_min_id=True)
    chosen = [(1, v0, 0)]
    centers = [vec0]
    for r in range(2, KCENTER_K + 1):
        ref = ray.put(np.stack(centers))
        parts = pa.concat_tables(ray.get(
            emb.map_batches(far_partial(ref), batch_format="pyarrow",
                            zero_copy_batch=True).to_arrow_refs()))
        v, d2, vec = fold(parts, by_min_id=False)
        chosen.append((r, v, d2))
        centers.append(vec)
    return pd.DataFrame(chosen, columns=["sel_order", "vec_id", "d2"]) \
        .astype("int64")


KTRUSS_K = 4
KTRUSS_ROUNDS = 3


def _ktruss_sql(k: int, rounds: int) -> str:
    """Unrolled bounded k-truss peeling (functions/triangles.ktruss_edges
    semantics). Expects CTE ``ce(u, v)`` (oriented u < v distinct edges)
    in scope."""
    # AS MATERIALIZED: each e{t} is referenced 3x by the wedge join of the
    # next round — without it DuckDB inlines the whole upstream (incl. the
    # expensive mention CTE) per reference (measured 125 s -> ~3 s).
    ctes = ["e0 AS MATERIALIZED (SELECT u, v FROM ce)"]
    for t in range(1, rounds + 1):
        p = t - 1
        ctes.append(f"""t{t} AS MATERIALIZED (
              SELECT w1.u AS a, w1.v AS b, w2.v AS c
              FROM e{p} w1 JOIN e{p} w2 ON w2.u = w1.v
              JOIN e{p} w3 ON w3.u = w1.u AND w3.v = w2.v),
        s{t} AS (SELECT u, v, count(*) AS sup FROM (
                 SELECT a AS u, b AS v FROM t{t}
                 UNION ALL SELECT b, c FROM t{t}
                 UNION ALL SELECT a, c FROM t{t}) GROUP BY 1, 2),
        e{t} AS MATERIALIZED (
              SELECT u, v FROM s{t} WHERE sup >= {k - 2})""")
    return (",\n".join(ctes) +
            f"\nSELECT u, v FROM e{rounds} ORDER BY 1, 2")


def _q_kg_ktruss(sf_dir: str):
    """Bounded k-truss of the mention co-occurrence graph
    (functions/triangles.ktruss_edges): edges surviving 3 rounds of
    'every edge must sit in >= k-2 triangles' peeling — the cohesive-
    subgraph mining step above k-core (kg_kcore_edges). Node naming
    mirrors kg_comention_components (canonical surface forms)."""
    import pandas as pd
    from .functions.triangles import ktruss_edges, within_group_pairs
    pre = C.ENT + "mention/"
    m = _q_mentions(sf_dir).map_batches(
        lambda b: pa.table({
            "turn": b["subj"],
            "c": pc.utf8_slice_codeunits(b["obj"], len(pre))}),
        batch_format="pyarrow")
    edges = within_group_pairs(m, "turn", "c")
    df = ktruss_edges(edges, KTRUSS_K, KTRUSS_ROUNDS) \
        .sort(["u", "v"]).to_pandas()
    if df.empty:  # all-empty sort loses the schema — pin it
        df = pd.DataFrame({"u": pd.Series(dtype=object),
                           "v": pd.Series(dtype=object)})
    return df


def _q_kg_subclass_depth(sf_dir: str):
    """Ontology depth profile: per class, the number of distinct proper
    ancestors along rdfs:subClassOf (0 for roots) — the class-hierarchy
    health check of a KG release. Reuses datalog.transitive_closure on
    the subclass edges only (vocabulary-sized), one grouped count, and
    a zero-row union so roots surface."""
    from .functions.datalog import transitive_closure
    from .functions.grouped import grouped_count, sorted_aggregate
    from .pipelines.kg import run_kg
    tri = run_kg(sf_dir)  # subClassOf triples come from the enrich stage

    def to_edges(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["pred"], C.RDFS_SUBCLASS_OF))
        return pa.table({"src": t["subj"], "dst": t["obj"]})

    edges = tri.map_batches(to_edges,
                            batch_format="pyarrow").materialize()
    clo = transitive_closure(edges)
    cnt = grouped_count(
        clo.map_batches(lambda b: b.select(["src"]),
                        batch_format="pyarrow"),
        ["src"], "depth", 4).map_batches(
        lambda b: b.rename_columns(["class_iri", "depth"]),
        batch_format="pyarrow")

    def zeros(b: pa.Table) -> pa.Table:
        n = pa.concat_arrays([b["src"].combine_chunks(),
                              b["dst"].combine_chunks()])
        return pa.table({"class_iri": n, "depth": pa.array(
            np.zeros(len(n), np.int64))})

    return sorted_aggregate(
        edges.map_batches(zeros, batch_format="pyarrow").union(cnt),
        ["class_iri"], [("depth", "max")], ["class_iri", "depth"],
        4).sort("class_iri")


def _q_dedup_incremental(sf_dir: str):
    """Incremental dedup of a 'new batch' against the existing corpus:
    the top-decile doc ids (delta, id >= ceil(9N/10)) checked for
    near-duplicates (minhash J >= 0.5) among the base; output
    (doc_id, dup_of = min base partner). The delta boundary is an
    integer function of max(doc_id), pinned on both engines. Reuses
    the full minhash pair machinery; pairs crossing the cut are a
    vectorized mask; one grouped min."""
    import pandas as pd
    from .functions.grouped import sorted_aggregate
    from .stages.dedup import minhash_lsh_pairs
    docs = _docs(sf_dir)
    n = int(docs.max("doc_id")) + 1
    cut = (9 * n + 9) // 10  # ceil(9N/10)
    pairs = minhash_lsh_pairs(docs)

    def crossing(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(pc.greater_equal(b["doc_b"], cut),
                             pc.less(b["doc_a"], cut)))
        return pa.table({"doc_id": t["doc_b"], "dup_of": t["doc_a"]})

    df = sorted_aggregate(
        pairs.map_batches(crossing, batch_format="pyarrow"),
        ["doc_id"], [("dup_of", "min")], ["doc_id", "dup_of"],
        4).sort("doc_id").to_pandas()
    if df.empty:
        df = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                           "dup_of": pd.Series(dtype="int64")})
    return df


TERM_LIFT_TOPK = 3
TERM_LIFT_MIN_DF = 5


def _q_text_source_term_lift(sf_dir: str):
    """Per-source discriminative vocabulary: the top-3 terms by lift =
    P(term|source)/P(term) over document frequencies, ×10⁶ floored —
    the 'what makes this source different' corpus diagnostic. Distinct
    (term, doc) postings are per-batch exact (a doc never spans
    batches); term marginals ride back through ONE string-key
    co-group; per-source top-3 runs on colocated complete groups."""
    from .functions.grouped import (grouped_count, sorted_aggregate,
                                    sorted_group_apply)
    from .functions.joins import attach_column
    from .stages.dedup import _words_flat
    i64 = pa.int64()
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"])

    def postings(b: pa.Table) -> pa.Table:
        # distinct (term, DOC) — not (term, source): df counts documents,
        # and a doc never spans batches, so per-batch distinct is exact
        words, doc_of = _words_flat(b["text"])
        src = b["source"].to_numpy(zero_copy_only=False)
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"w": pa.array(words, pa.string()),
                         "s": pa.array(src[doc_of], pa.string()),
                         "d": pa.array(did[doc_of], pa.int64())}) \
            .group_by(["w", "s", "d"], use_threads=False).aggregate([]) \
            .select(["w", "s"])

    dfs = grouped_count(
        docs.map_batches(postings, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["w", "s"], "df_s", 8).materialize()
    dft = sorted_aggregate(dfs, ["w"], [("df_s", "sum")],
                           ["w", "df"], 8)
    joined = attach_column(dfs, dft,
                           [("w", pa.string()), ("s", pa.string()),
                            ("df_s", i64)],
                           "w", "w", "df", "df", i64, 8,
                           key_type=pa.string())
    sizes = grouped_count(
        docs.map_batches(lambda b: b.select(["source"]),
                         batch_format="pyarrow"),
        ["source"], "d_s", 1).to_pandas()
    total_d = int(sizes["d_s"].sum())
    src_sorted = sizes.sort_values("source")
    sref = ray.put((src_sorted["source"].to_numpy(),
                    src_sorted["d_s"].to_numpy().astype(np.int64)))

    def lift(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["df"], TERM_LIFT_MIN_DF))
        names, d_s = ray.get(sref)
        idx = np.searchsorted(names, t["s"].to_numpy(
            zero_copy_only=False))
        lf = (10**6 * t["df_s"].to_numpy() * total_d
              // (d_s[idx] * t["df"].to_numpy()))
        return pa.table({"s": t["s"], "w": t["w"],
                         "lift_fp": pa.array(lf, i64)})

    scored = joined.map_batches(lift, batch_format="pyarrow",
                                zero_copy_batch=True)

    def top3(b: pa.Table) -> pa.Table:
        pdf = b.to_pandas().sort_values(
            ["s", "lift_fp", "w"], ascending=[True, False, True])
        out = pdf.groupby("s", sort=False).head(TERM_LIFT_TOPK)
        return pa.table({
            "source": pa.array(out["s"].to_numpy(), pa.string()),
            "term": pa.array(out["w"].to_numpy(), pa.string()),
            "lift_fp": pa.array(out["lift_fp"].to_numpy(), i64)})

    return sorted_group_apply(scored, ["s"], top3, 4) \
        .sort(["source", "term"])


def _q_kg_eigencentrality(sf_dir: str):
    """Integer power-iteration eigenvector centrality over the KG edge
    list (functions/pagerank.eigenvector_centrality) — influence
    weighted by neighbors' influence, the undamped companion to
    kg_pagerank. Same execution shape: pinned edge-shard BSP actors +
    broadcast node state below the node cap, per-round co-group join
    above it; max-normalized floor arithmetic makes both engines
    bit-equal."""
    from .functions.pagerank import eigenvector_centrality
    return eigenvector_centrality(_kg_edges(sf_dir))


def _q_kg_pred_cooccurrence(sf_dir: str):
    """Predicate co-occurrence profile (LODStats-style schema
    discovery): for each unordered predicate pair, how many subjects
    carry BOTH. Predicates map onto the fixed 12-IRI vocabulary
    (config.KNOWN_COMBOS, sorted — so int pair order IS string order);
    distinct (subj, pid) collapses first; the shared pair machinery
    emits <=C(12,2) counted pairs per subject group map-side."""
    from .functions.grouped import grouped_count, pairs_within_groups
    from .pipelines.kg import run_kg
    preds = sorted(p for p, _, _ in C.KNOWN_COMBOS)
    pred_arr = pa.array(preds, pa.string())

    def to_pid(b: pa.Table) -> pa.Table:
        pid = pc.index_in(b["pred"], value_set=pred_arr)
        if pid.null_count:
            raise ValueError("predicate outside config.KNOWN_COMBOS")
        return pa.table({"subj": b["subj"],
                         "pid": pc.cast(pid, pa.int64())})

    sp = grouped_count(
        run_kg(sf_dir).map_batches(to_pid, batch_format="pyarrow"),
        ["subj", "pid"], "n", 8).drop_columns(["n"])
    pairs = pairs_within_groups(sp, ["subj"], "pid", count_col="n_subj",
                                num_partitions=4)

    def decode(b: pa.Table) -> pa.Table:
        return pa.table({"pred_a": pc.take(pred_arr, b["doc_a"]),
                         "pred_b": pc.take(pred_arr, b["doc_b"]),
                         "n_subj": b["n_subj"]})

    return pairs.map_batches(decode, batch_format="pyarrow") \
        .sort(["pred_a", "pred_b"])


def _q_rel_target_encoding(sf_dir: str):
    """Leave-one-out target encoding of customer nation on order value
    — the leakage-safe categorical encoder of a feature pipeline:
    loo_cents(o) = (nation_sum - own) // (nation_n - 1), 0 for
    singleton nations. The custkey->nation map broadcasts as sorted
    arrays probed per batch; the 25-row nation aggregate is a driver
    fold; the per-order pass stays map-only."""
    import pyarrow.parquet as pq
    from .functions.grouped import sorted_aggregate
    from .functions.joins import probe_sorted
    i64 = pa.int64()
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy()
    nk = pc.cast(cust["c_nationkey"], i64).to_numpy()
    order = np.argsort(ck)
    cust_ref = ray.put((ck[order], nk[order]))

    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    class Attach:
        def __init__(self):
            self.keys, self.nations = ray.get(cust_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            k = pc.cast(b["o_custkey"], i64).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            return pa.table({
                "o_orderkey": pc.cast(b["o_orderkey"], i64),
                "nation": pa.array(
                    probe_sorted(self.keys, self.nations, k), i64),
                "p": pc.cast(pc.round(pc.multiply(
                    b["o_totalprice"], 100.0)), i64)})

    tagged = od.map_batches(Attach, batch_format="pyarrow",
                            zero_copy_batch=True,
                            concurrency=(1, 4)).materialize()

    def partial(b: pa.Table) -> pa.Table:
        return b.select(["nation", "p"]).append_column(
            "n", pa.array(np.ones(b.num_rows, np.int64))) \
            .group_by(["nation"], use_threads=False) \
            .aggregate([("p", "sum"), ("n", "sum")]) \
            .rename_columns(["nation", "sp", "n"])

    g = sorted_aggregate(
        tagged.map_batches(partial, batch_format="pyarrow"),
        ["nation"], [("sp", "sum"), ("n", "sum")],
        ["nation", "sp", "n"], 1).to_pandas()
    nat = g["nation"].to_numpy()
    norder = np.argsort(nat)
    g_ref = ray.put((nat[norder], g["sp"].to_numpy()[norder],
                     g["n"].to_numpy()[norder]))

    def loo(b: pa.Table) -> pa.Table:
        gn, gsp, gcnt = ray.get(g_ref)
        idx = np.searchsorted(gn, b["nation"].to_numpy())
        sp, n = gsp[idx], gcnt[idx]
        p = b["p"].to_numpy()
        w = np.where(n > 1, (sp - p) // np.maximum(n - 1, 1), 0)
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "nation": b["nation"],
                         "loo_cents": pa.array(w, i64)})

    return tagged.map_batches(loo, batch_format="pyarrow",
                              zero_copy_batch=True).sort("o_orderkey")


def _q_curation_dup_weights(sf_dir: str):
    """Soft-dedup sampling weights: every document keeps weight
    10^6 // near-dup-cluster-size (the 'downweight duplicates instead
    of dropping them' training-data policy). Reuses the canonical map
    (minhash components); cluster sizes ride back onto members through
    ONE int-key co-group — the corpus text never reshuffles."""
    from .functions.grouped import grouped_count
    from .functions.joins import attach_column
    from .stages.dedup import dedup_canonical_map, minhash_lsh_pairs
    i64 = pa.int64()
    docs = _docs(sf_dir)
    cm = dedup_canonical_map(docs, minhash_lsh_pairs(docs)).materialize()
    sizes = grouped_count(
        cm.map_batches(lambda b: b.select(["canon_id"]),
                       batch_format="pyarrow"), ["canon_id"], "sz", 8)
    out = attach_column(cm, sizes,
                        [("doc_id", i64), ("canon_id", i64)],
                        "canon_id", "canon_id", "sz", "sz", i64, 8)

    def weight(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"], "canon_id": b["canon_id"],
            "weight_fp": pa.array(
                10**6 // b["sz"].to_numpy(), i64)})

    return out.map_batches(weight, batch_format="pyarrow",
                           zero_copy_batch=True).sort("doc_id")


def _q_ml_mrr(sf_dir: str):
    """MRR@10 of the BM25 ranking against exact-PHRASE relevance: per
    query, the first rank whose document contains the query words
    adjacent and in order (bag-of-words BM25 ignores adjacency, so the
    first phrase hit lands at rank > 1 for some queries — term-level
    relevance would be vacuously rank 1, a positive score implies a term
    hit); rr_fp = 10^6 // rank, 0 when no top-10 doc has the phrase.
    Phrase containment is one space-padded match_substring per query over
    the stateless doc pass, restricted to the |queries|·k candidates; the
    fold runs on |queries|·k rows on the driver."""
    import pandas as pd
    i64 = pa.int64()
    phrases = [q.lower() for q in _BM25_QUERIES]
    bm = to_pandas_any(_q_search_bm25(sf_dir))
    cand = np.unique(bm["doc_id"].to_numpy().astype(np.int64))
    cov_schema = pa.schema([("query_id", i64), ("doc_id", i64)])

    def cov(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return cov_schema.empty_table()
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.isin(did, cand)
        if not keep.any():
            return cov_schema.empty_table()
        sub = b.filter(pa.array(keep))
        padded = pc.binary_join_element_wise(
            " ", pc.utf8_lower(sub["text"]), " ", "")
        sdid = sub["doc_id"].to_numpy(zero_copy_only=False)
        outs = []
        for qi, ph in enumerate(phrases):
            m = pc.match_substring(padded, f" {ph} ") \
                .to_numpy(zero_copy_only=False)
            nz = np.nonzero(m)[0]
            if len(nz):
                outs.append(pa.table({
                    "query_id": pa.array(np.full(len(nz), qi, np.int64)),
                    "doc_id": pa.array(sdid[nz], i64)}, schema=cov_schema))
        return pa.concat_tables(outs) if outs else cov_schema.empty_table()

    hits = _docs(sf_dir).map_batches(cov, batch_format="pyarrow",
                                     zero_copy_batch=True).to_pandas()
    covered = set((hits["query_id"].astype("int64") * 10**12
                   + hits["doc_id"].astype("int64")).tolist())
    bmk = (bm["query_id"].astype("int64") * 10**12
           + bm["doc_id"].astype("int64"))
    rel = bmk.isin(covered).to_numpy()
    rows = []
    for qi in range(len(_BM25_QUERIES)):
        sub = bm[(bm["query_id"].to_numpy() == qi) & rel]
        r = int(sub["rank"].min()) if len(sub) else 0
        rows.append((qi, r, 10**6 // r if r else 0))
    return pd.DataFrame(rows, columns=["query_id", "first_rank",
                                       "rr_fp"]).astype("int64")


# quasi-identifier bucket width for the uniqueness-risk audit: fine enough
# that singleton classes exist in the synthetic corpus (non-vacuous check).
UNIQ_QI_BUCKET = 20


def _q_privacy_uniqueness(sf_dir: str):
    """Sample-uniqueness (journalist-risk) audit: the fraction of records
    whose quasi-identifier combination (lang, source, n_chars//20) is
    UNIQUE in the release — the re-identification risk metric that
    k-anonymity generalizes. Only distinct QI classes shuffle (grouped
    count); the class-size histogram folds to one row via per-block
    partials, so nothing scales with the record count."""
    import pandas as pd
    from .functions.grouped import grouped_count
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["lang", "source", "n_chars"])
    i64 = pa.int64()
    qi = docs.map_batches(lambda b: pa.table({
        "lang": b["lang"], "source": b["source"],
        "bucket": pc.divide(pc.cast(b["n_chars"], i64), UNIQ_QI_BUCKET)}),
        batch_format="pyarrow")
    classes = grouped_count(qi, ["lang", "source", "bucket"], "sz", 4)

    def partial(b: pa.Table) -> pa.Table:
        sz = b["sz"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_classes": pa.array([len(sz)], i64),
            "n_unique_classes": pa.array([int((sz == 1).sum())], i64),
            "n_records": pa.array([int(sz.sum())], i64)})

    p = classes.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    nc, nu, nr = (int(p["n_classes"].sum()), int(p["n_unique_classes"].sum()),
                  int(p["n_records"].sum()))
    return pd.DataFrame({"n_classes": [nc], "n_unique_classes": [nu],
                         "n_records": [nr],
                         "risk_fp": [10**6 * nu // max(nr, 1)]}) \
        .astype("int64")


ZONEMAP_ORDERKEY_BLOCK = 512   # unclustered layout: orderkey-range blocks
ZONEMAP_ROW_BLOCK = 4096       # clustered layout: rows per block
ZONEMAP_CUTOFF_DAY = int(np.datetime64("1997-01-01", "D").astype(np.int64))


def _q_diag_zonemap_prune(sf_dir: str):
    """Zone-map (block min/max) pruning effectiveness for the predicate
    l_shipdate >= 1997-01-01 under TWO physical layouts: the natural
    orderkey-range blocking (dates uncorrelated with orderkey — near-zero
    pruning) vs shipdate-clustered blocking (sort + zip_with_index rank //
    block_rows — near-perfect pruning). The storage-layout diagnostic that
    justifies a cluster/z-order rewrite before a scan-heavy workload.
    Per-block max folds as bounded partials; only block summaries move."""
    import pandas as pd
    from .functions.grouped import sorted_aggregate
    from .functions.joins import zip_with_index
    i64 = pa.int64()
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_shipdate"])

    def days(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(pc.cast(b["l_shipdate"], pa.timestamp("us")),
                                i64), 86_400_000_000)
        return pa.table({"blk": pc.divide(pc.cast(b["l_orderkey"], i64),
                                          ZONEMAP_ORDERKEY_BLOCK),
                         "day": day,
                         # total-order pack for the clustered layout rank:
                         # day (<=14 bits at any horizon) * 2^44 +
                         # orderkey * 8 + linenumber
                         "key": pc.add(
                             pc.multiply(day, 2**44),
                             pc.add(pc.multiply(pc.cast(b["l_orderkey"],
                                                        i64), 8),
                                    pc.cast(b["l_linenumber"], i64)))})

    d = li.map_batches(days, batch_format="pyarrow").materialize()

    def fold(ds, blk_col: str) -> tuple[int, int]:
        per = sorted_aggregate(ds, [blk_col], [("day", "max")],
                               [blk_col, "mx"], num_partitions=8)

        def partial(b: pa.Table) -> pa.Table:
            mx = b["mx"].to_numpy(zero_copy_only=False)
            return pa.table({
                "n": pa.array([len(mx)], i64),
                "pruned": pa.array(
                    [int((mx < ZONEMAP_CUTOFF_DAY).sum())], i64)})
        p = per.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
        return int(p["n"].sum()), int(p["pruned"].sum())

    n_u, p_u = fold(d.map_batches(
        lambda b: b.select(["blk", "day"]), batch_format="pyarrow"), "blk")
    ranked = zip_with_index(
        d.map_batches(lambda b: b.select(["key", "day"]),
                      batch_format="pyarrow").sort("key"),
        "rn", order_by="key")
    clustered = ranked.map_batches(
        lambda b: pa.table({"blk": pc.divide(b["rn"], ZONEMAP_ROW_BLOCK),
                            "day": b["day"]}), batch_format="pyarrow")
    n_c, p_c = fold(clustered, "blk")
    return pd.DataFrame({
        "blocks_unclustered": [n_u], "pruned_unclustered": [p_u],
        "prune_unclustered_fp": [10**6 * p_u // max(n_u, 1)],
        "blocks_clustered": [n_c], "pruned_clustered": [p_c],
        "prune_clustered_fp": [10**6 * p_c // max(n_c, 1)]}).astype("int64")


def _q_events_tumbling_dedup(sf_dir: str):
    """Streaming windowed dedup: ONE event per (user, type, 10-minute
    tumbling window) — the earliest ts, ties by event_id (the
    at-least-once → exactly-once compaction step of a streaming intake).
    Sorts on exactly the group key (grouped.py CAVEAT: a longer sort key
    would let a range boundary split a group); the first row per group is
    picked inside complete sorted groups by an in-block lexsort."""
    from .functions.grouped import group_ids, sorted_group_apply
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "user_id", "ts",
                                        "event_type"])
    i64 = pa.int64()

    def prep(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), i64)
        return pa.table({"user_id": b["user_id"],
                         "event_type": b["event_type"],
                         "win": pc.divide(us, 600_000_000),
                         "ts_us": us, "event_id": b["event_id"]})

    keys = ["user_id", "event_type", "win"]

    def firsts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        gid, starts = group_ids(b, keys)
        order = np.lexsort((b["event_id"].to_numpy(zero_copy_only=False),
                            b["ts_us"].to_numpy(zero_copy_only=False), gid))
        first = order[np.searchsorted(gid[order],
                                      np.arange(len(starts)))]
        return b.take(pa.array(np.sort(first)))

    return sorted_group_apply(ev.map_batches(prep, batch_format="pyarrow"),
                              keys, firsts, num_partitions=8) \
        .map_batches(lambda b: b.select(
            ["event_id", "user_id", "event_type", "win"]),
            batch_format="pyarrow").sort("event_id")


# structural predicates excluded by the negated-property-set query: what
# remains are the "semantic" edges (mentions/links/typing hierarchy).
SPARQL_NEG_PREDS = (C.PRED_TEXT, C.PRED_DATE_CREATED, C.PRED_POSITION,
                    C.PRED_ROLE, C.PRED_IS_PART_OF, C.RDF_TYPE)


def _q_kg_sparql_path_neg(sf_dir: str):
    """SPARQL negated property set: {?s !(text|dateCreated|position|role|
    isPartOf|rdf:type) ?o} — every NON-structural edge, aggregated to a
    per-subject count. The negation is ONE inverted is_in scan in
    functions/bgp._scan (same vectorized pass as alternation), so !(...)
    composes with every other pattern and modifier."""
    from .functions.bgp import bgp_match
    from .functions.grouped import grouped_count
    from .pipelines.kg import run_kg
    b = bgp_match(run_kg(sf_dir),
                  [("?s", "!(" + "|".join(SPARQL_NEG_PREDS) + ")", "?o")],
                  ["s", "o"], num_partitions=8)
    return grouped_count(b, ["s"], "n", 8).sort("s")


KAPPA_CHAR_MIN = 500
KAPPA_WORD_MIN = 90


def _q_ml_cohens_kappa(sf_dir: str):
    """Cohen's kappa between two deterministic document quality gates
    (rater A: n_chars >= 500; rater B: >= 90 whitespace words) — the
    inter-rater agreement harness. The 2x2 contingency folds as 4-cell
    per-block partials; kappa = (N·agree − Σ marginal products) /
    (N² − Σ marginal products) as exact integers, ×10⁶ FLOOR division
    (the SQL twin adds the trunc→floor correction for a negative
    numerator)."""
    import pandas as pd
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["text", "n_chars"])

    def cells(b: pa.Table) -> pa.Table:
        nch = pc.cast(b["n_chars"], i64).to_numpy(zero_copy_only=False)
        nw = pc.cast(pc.add(pc.count_substring(b["text"], " "), 1), i64) \
            .to_numpy(zero_copy_only=False)
        ra = nch >= KAPPA_CHAR_MIN
        rb = nw >= KAPPA_WORD_MIN
        return pa.table({
            "pp": pa.array([int((ra & rb).sum())], i64),
            "pn": pa.array([int((ra & ~rb).sum())], i64),
            "np_": pa.array([int((~ra & rb).sum())], i64),
            "nn": pa.array([int((~ra & ~rb).sum())], i64)})

    p = docs.map_batches(cells, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    pp, pn, np_, nn = (int(p["pp"].sum()), int(p["pn"].sum()),
                       int(p["np_"].sum()), int(p["nn"].sum()))
    n = pp + pn + np_ + nn
    pe_num = (pp + pn) * (pp + np_) + (np_ + nn) * (pn + nn)
    num = n * (pp + nn) - pe_num
    den = n * n - pe_num
    return pd.DataFrame({
        "n_pp": [pp], "n_pn": [pn], "n_np": [np_], "n_nn": [nn],
        "kappa_fp": [10**6 * num // max(den, 1)]}).astype("int64")


def _q_ml_lift_deciles(sf_dir: str):
    """Decile lift/gain chart for the n_chars score predicting
    lang = 'en' (the ROC-AUC pair rendered as the campaign-targeting
    curve): documents NTILE(10)-ranked by score DESC, per-decile and
    cumulative positives, lift_fp = 10⁶·(cum_pos·N) // (cum_n·P).
    Global deciles ride the packed-sort + zip_with_index rank path
    (the Lorenz/RFM machinery); only 10-row partials reach the
    driver."""
    import pandas as pd
    from .functions.grouped import sorted_aggregate
    from .functions.joins import zip_with_index
    i64 = pa.int64()
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars", "lang"]).materialize()
    n = docs.count()
    q, r = n // 10, n % 10
    cut = r * (q + 1)

    def pack(b: pa.Table) -> pa.Table:
        s = pc.cast(b["n_chars"], i64).to_numpy(zero_copy_only=False)
        d = pc.cast(b["doc_id"], i64).to_numpy(zero_copy_only=False)
        if (s >= 1 << 31).any() or (d >= 1 << 31).any():
            raise OverflowError("lift pack: rescale score")
        # descending score, ascending doc_id total order
        inv = ((1 << 31) - 1 - s) << 31 | d
        return pa.table({"__k": pa.array(inv, i64),
                         "pos": pc.cast(pc.equal(b["lang"], "en"), i64)})

    ranked = zip_with_index(
        docs.map_batches(pack, batch_format="pyarrow").sort("__k"),
        id_col="__rank", order_by="__k")

    def dec(b: pa.Table) -> pa.Table:
        rank = b["__rank"].to_numpy(zero_copy_only=False)
        d = np.where(rank < cut, rank // max(q + 1, 1),
                     r + (rank - cut) // max(q, 1)) + 1
        return pa.table({"decile": pa.array(d, i64),
                         "n": pa.array(np.ones(len(d), np.int64)),
                         "pos": b["pos"]}) \
            .group_by(["decile"], use_threads=False) \
            .aggregate([("n", "sum"), ("pos", "sum")]) \
            .rename_columns(["decile", "n", "pos"])

    h = sorted_aggregate(
        ranked.map_batches(dec, batch_format="pyarrow"),
        ["decile"], [("n", "sum"), ("pos", "sum")],
        ["decile", "n", "pos"], 1).to_pandas() \
        .sort_values("decile").reset_index(drop=True)
    total_p = int(h["pos"].sum())
    cum_n = h["n"].astype("int64").cumsum()
    cum_p = h["pos"].astype("int64").cumsum()
    return pd.DataFrame({
        "decile": h["decile"].astype("int64"),
        "n_docs": h["n"].astype("int64"),
        "n_pos": h["pos"].astype("int64"),
        "cum_pos": cum_p,
        "lift_fp": (10**6 * cum_p * n) // (cum_n * max(total_p, 1))}) \
        .astype("int64")


def _q_rel_theilsen(sf_dir: str):
    """Theil–Sen robust trend of daily order revenue: the (lower)
    median of all pairwise slopes 10⁶·Δcents // Δdays (floor division
    both sides; the SQL twin corrects DuckDB's trunc-toward-zero on
    negative numerators). Daily totals fold distributed and are
    CALENDAR-BOUNDED (≤ a few thousand rows at any data scale), so the
    O(days²) slope enumeration runs vectorized on the driver — same
    scaling argument as Holt/seasonal."""
    import pandas as pd
    from .functions.grouped import sorted_aggregate
    i64 = pa.int64()
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"])

    def daily(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(pc.cast(b["o_orderdate"],
                                        pa.timestamp("us")), i64),
                        86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                        i64)
        return pa.table({"day": day, "cents": cents}) \
            .group_by(["day"], use_threads=False) \
            .aggregate([("cents", "sum")]).rename_columns(["day", "cents"])

    d = sorted_aggregate(
        od.map_batches(daily, batch_format="pyarrow"),
        ["day"], [("cents", "sum")], ["day", "cents"], 8).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    day = d["day"].to_numpy().astype(np.int64)
    c = d["cents"].to_numpy().astype(np.int64)
    i, j = np.triu_indices(len(day), k=1)
    slopes = (10**6 * (c[j] - c[i])) // (day[j] - day[i])
    slopes.sort()
    med = int(slopes[(len(slopes) - 1) // 2]) if len(slopes) else 0
    return pd.DataFrame({"n_days": [len(day)], "n_pairs": [len(slopes)],
                         "median_slope_fp": [med]}).astype("int64")


def _q_events_windowed_topk(sf_dir: str):
    """Per-window heavy hitters: top-3 event types per DAY (tumbling
    1-day window), ties by type — the rolling trending-list shape of a
    streaming dashboard. One grouped count (day × type, bounded by
    calendar × |types|) then the pruned per-key top-k; nothing scales
    with the event count after the first fold."""
    from .functions.grouped import grouped_count
    from .functions.topn import top_n_per_key
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts", "event_type"])
    i64 = pa.int64()
    d = ev.map_batches(lambda b: pa.table({
        "day": pc.divide(pc.cast(pc.cast(b["ts"], pa.timestamp("us")),
                                 i64), 86_400_000_000),
        "event_type": b["event_type"]}), batch_format="pyarrow")
    cnt = grouped_count(d, ["day", "event_type"], "n", 8)
    return top_n_per_key(cnt, ["day"], [("n", False), ("event_type", True)],
                         3, num_partitions=4)


def _q_rel_iqr_outliers(sf_dir: str):
    """Tukey-fence outlier audit per order priority: exact ordinal
    quartiles over total-price cents (LOWER convention pinned on both
    sides: q1 at index (n−1)//4, q3 at 3·(n−1)//4 of the sorted group),
    fence = q ± 3·IQR//2, per-group outlier counts. Groups are complete
    per block (sort on exactly the group key); the in-block selection is
    one lexsort + offset indexing, no per-group Python."""
    from .functions.grouped import group_ids, sorted_group_apply
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderpriority", "o_totalprice"])
    i64 = pa.int64()

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "prio": b["o_orderpriority"],
            "cents": pc.cast(pc.round(pc.multiply(
                b["o_totalprice"], 100.0)), i64)})

    def fences(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("o_orderpriority", pa.string()),
                              ("n", i64), ("q1_c", i64), ("q3_c", i64),
                              ("n_out", i64)]).empty_table()
        gid, starts = group_ids(b, ["prio"])
        c = b["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((c, gid))
        cs = c[order]
        ends = np.append(starts[1:], len(c))
        sizes = ends - starts
        q1 = cs[starts + (sizes - 1) // 4]
        q3 = cs[starts + 3 * (sizes - 1) // 4]
        iqr = q3 - q1
        lo, hi = q1 - 3 * iqr // 2, q3 + 3 * iqr // 2
        out = (c < lo[gid]) | (c > hi[gid])
        n_out = np.bincount(gid[out], minlength=len(starts)) \
            .astype(np.int64)
        prio = b["prio"].take(pa.array(starts))
        return pa.table({"o_orderpriority": prio,
                         "n": pa.array(sizes.astype(np.int64)),
                         "q1_c": pa.array(q1), "q3_c": pa.array(q3),
                         "n_out": pa.array(n_out)})

    return sorted_group_apply(
        od.map_batches(prep, batch_format="pyarrow"), ["prio"], fences,
        num_partitions=4)


def _q_emb_norm_stats(sf_dir: str):
    """Per-label embedding-norm profile: n, Σ/min/max of the exact
    integer squared norm Σ_d floor(10³·x_d)² — the embedding-health
    audit (collapsed or exploding norms per class). One vectorized
    reshape+square per batch; |labels|-bounded partials fold in a tiny
    grouped pass."""
    from .functions.grouped import sorted_aggregate
    i64 = pa.int64()
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                columns=["vec_id", "embedding", "label"])

    def norms(b: pa.Table) -> pa.Table:
        lst = b["embedding"]
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = np.floor(lst.flatten().to_numpy(zero_copy_only=False)
                        .astype(np.float64) * 1000.0).astype(np.int64)
        dim = len(flat) // max(b.num_rows, 1)
        n2 = (flat.reshape(b.num_rows, dim) ** 2).sum(axis=1)
        return pa.table({"label": pc.cast(b["label"], i64),
                         "n": pa.array(np.ones(b.num_rows, np.int64)),
                         "s": pa.array(n2), "mn": pa.array(n2),
                         "mx": pa.array(n2)}) \
            .group_by(["label"], use_threads=False) \
            .aggregate([("n", "sum"), ("s", "sum"), ("mn", "min"),
                        ("mx", "max")]) \
            .rename_columns(["label", "n", "s", "mn", "mx"])

    return sorted_aggregate(
        emb.map_batches(norms, batch_format="pyarrow"),
        ["label"], [("n", "sum"), ("s", "sum"), ("mn", "min"),
                    ("mx", "max")],
        ["label", "n", "sum_norm2", "min_norm2", "max_norm2"], 1)


def _q_ml_mcc(sf_dir: str):
    """Matthews correlation of the n_chars >= 500 gate predicting
    lang = 'en', exactly: MCC² ×10⁶ as the integer fraction
    (TP·TN − FP·FN)² // Π(marginals) with the sign reported separately
    (sqrt-free — MCC itself is irrational). 4-cell block partials fold
    on the driver in Python bigints."""
    import pandas as pd
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["n_chars", "lang"])

    def cells(b: pa.Table) -> pa.Table:
        pred = pc.cast(b["n_chars"], i64).to_numpy(
            zero_copy_only=False) >= KAPPA_CHAR_MIN
        truth = pc.equal(b["lang"], "en").to_numpy(zero_copy_only=False)
        return pa.table({
            "tp": pa.array([int((pred & truth).sum())], i64),
            "fp": pa.array([int((pred & ~truth).sum())], i64),
            "fn": pa.array([int((~pred & truth).sum())], i64),
            "tn": pa.array([int((~pred & ~truth).sum())], i64)})

    p = docs.map_batches(cells, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    tp, fp = int(p["tp"].sum()), int(p["fp"].sum())
    fn, tn = int(p["fn"].sum()), int(p["tn"].sum())
    num = tp * tn - fp * fn
    den = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    return pd.DataFrame({
        "tp": [tp], "fp": [fp], "fn": [fn], "tn": [tn],
        "mcc_sign": [(num > 0) - (num < 0)],
        "mcc2_fp": [10**6 * num * num // max(den, 1)]}).astype("int64")


def _q_kg_sparql_bind(sf_dir: str):
    """SPARQL BIND: { ?t schema:position ?p . BIND(xsd:integer(?p)//5 AS
    ?bucket) } GROUP BY ?bucket — a computed binding (functions/bgp
    .bgp_bind, per-batch vectorized, never shuffles) feeding the grouped
    aggregate surface; completes SELECT-expression support alongside
    FILTER/VALUES/HAVING/ORDER."""
    from .functions.bgp import bgp_bind, bgp_match
    from .functions.grouped import grouped_count
    from .pipelines.kg import run_kg
    b = bgp_match(run_kg(sf_dir), [("?t", C.PRED_POSITION, "?p")],
                  ["t", "p"], num_partitions=8)
    bound = bgp_bind(b, "bucket", lambda t: pc.divide(
        pc.cast(t["p"], pa.int64()), 5))
    return grouped_count(bound.map_batches(
        lambda t: t.select(["bucket"]), batch_format="pyarrow"),
        ["bucket"], "n", 4).sort("bucket")


PREFIX_QUERIES = ("merg", "sca", "batc")


def _q_search_prefix(sf_dir: str):
    """Wildcard / prefix search (`merg*`): per prefix query, how many
    documents contain a matching token and how many token hits total —
    one pc.starts_with scan over the flat token array per query (docs
    whole in their batch, so per-doc distinct folds locally); |queries|
    -bounded partials reach the driver."""
    import pandas as pd
    from .stages.dedup import _words_flat
    i64 = pa.int64()

    def hits(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("query_id", i64), ("n_docs", i64),
                              ("n_hits", i64)]).empty_table()
        words, doc_of = _words_flat(b["text"])
        warr = pa.array(words)
        rows = []
        for qi, pref in enumerate(PREFIX_QUERIES):
            m = pc.starts_with(warr, pref).to_numpy(zero_copy_only=False)
            rows.append((qi, len(np.unique(doc_of[m])), int(m.sum())))
        q, d, h = zip(*rows)
        return pa.table({"query_id": pa.array(q, i64),
                         "n_docs": pa.array(d, i64),
                         "n_hits": pa.array(h, i64)})

    p = _docs(sf_dir).map_batches(hits, batch_format="pyarrow",
                                  zero_copy_batch=True).to_pandas()
    g = p.groupby("query_id", as_index=False).sum()
    return pd.DataFrame({
        "query_id": g["query_id"].astype("int64"),
        "n_docs": g["n_docs"].astype("int64"),
        "n_hits": g["n_hits"].astype("int64")}) \
        .sort_values("query_id").reset_index(drop=True)


GINI_THRESHOLDS = (300, 400, 500, 600, 700, 800)


def _q_ml_gini_gain(sf_dir: str):
    """Gini-gain curve for the n_chars split predicting lang = 'en':
    for every candidate threshold, the exact impurity decrease
    gain = [(N²−Sp)·nL·nR − N·(nR·(nL²−SL) + nL·(nR²−SR))] /
    (N²·nL·nR) ×10⁶ floored — the split-quality surface a tree learner
    scans (ml_tree_depth2 picks by misclassification; this is the
    CART criterion). Per-threshold 4-cell partials fold per block; the
    fraction evaluates in Python bigints on a |thresholds|-row frame
    (the SQL twin uses HUGEINT)."""
    import pandas as pd
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["n_chars", "lang"])
    ths = list(GINI_THRESHOLDS)

    def cells(b: pa.Table) -> pa.Table:
        nch = pc.cast(b["n_chars"], i64).to_numpy(zero_copy_only=False)
        pos = pc.equal(b["lang"], "en").to_numpy(zero_copy_only=False)
        rows = []
        for t in ths:
            left = nch < t
            rows.append((t, int(left.sum()), int((left & pos).sum()),
                         int((~left).sum()), int((~left & pos).sum())))
        t_, nl, pl, nr, pr = zip(*rows)
        return pa.table({"thr": pa.array(t_, i64),
                         "nl": pa.array(nl, i64), "pl": pa.array(pl, i64),
                         "nr": pa.array(nr, i64), "pr": pa.array(pr, i64)})

    p = docs.map_batches(cells, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas() \
        .groupby("thr", as_index=False).sum()
    out = []
    for _, r in p.iterrows():
        nl, pl, nr, pr = (int(r["nl"]), int(r["pl"]),
                          int(r["nr"]), int(r["pr"]))
        n = nl + nr
        if nl == 0 or nr == 0:
            out.append((int(r["thr"]), nl, nr, 0))
            continue
        sp = (pl + pr) ** 2 + (n - pl - pr) ** 2
        sl = pl * pl + (nl - pl) ** 2
        sr = pr * pr + (nr - pr) ** 2
        num = ((n * n - sp) * nl * nr
               - n * (nr * (nl * nl - sl) + nl * (nr * nr - sr)))
        out.append((int(r["thr"]), nl, nr,
                    10**6 * num // (n * n * nl * nr)))
    return pd.DataFrame(out, columns=["thr", "n_left", "n_right",
                                      "gain_fp"]).astype("int64") \
        .sort_values("thr").reset_index(drop=True)


EQUIDEPTH_BUCKETS = 8


def _q_diag_equidepth_hist(sf_dir: str):
    """Equi-depth histogram boundaries for optimizer statistics: the
    exact ordinal values of l_extendedprice cents at ranks i·(n−1)//B,
    i = 0..B — the quantile-sketch's exact twin a planner would store.
    Global ranks via packed sort + zip_with_index; only the B+1 boundary
    rows leave the workers (rank set broadcast in the closure)."""
    import pandas as pd
    from .functions.joins import zip_with_index
    i64 = pa.int64()
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"])

    def pack(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(b["l_extendedprice"], 100.0)),
                    i64).to_numpy(zero_copy_only=False)
        ok = pc.cast(b["l_orderkey"], i64).to_numpy(zero_copy_only=False)
        ln = pc.cast(b["l_linenumber"], i64).to_numpy(zero_copy_only=False)
        if (c >= 1 << 33).any() or (ok >= 1 << 27).any():
            raise OverflowError("equidepth pack: rescale")
        return pa.table({"cents": pa.array(c),
                         "__k": pa.array((c << 30) | (ok << 3) | ln, i64)})

    d = li.map_batches(pack, batch_format="pyarrow").materialize()
    n = d.count()
    bounds = np.unique([(i * (n - 1)) // EQUIDEPTH_BUCKETS
                        for i in range(EQUIDEPTH_BUCKETS + 1)])
    ranked = zip_with_index(d.sort("__k"), id_col="__rank",
                            order_by="__k")

    def pick(b: pa.Table) -> pa.Table:
        rank = b["__rank"].to_numpy(zero_copy_only=False)
        m = np.isin(rank, bounds)
        t = b.filter(pa.array(m))
        return pa.table({"rank": t["__rank"], "cents": t["cents"]})

    out = ranked.map_batches(pick, batch_format="pyarrow").to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    out["bucket"] = np.arange(len(out), dtype=np.int64)
    return out[["bucket", "rank", "cents"]].astype("int64")


def _q_diag_fanout_hist(sf_dir: str):
    """Join fan-out histogram — the optimizer statistic behind join-size
    estimation (diag_join_estimate gives the scalar; this is the full
    distribution): how many orders have k lineitems, for every k. Two
    cascaded grouped counts; after the first fold nothing scales with
    the row count."""
    from .functions.grouped import grouped_count
    li = ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_orderkey"])
    sizes = grouped_count(li, ["l_orderkey"], "fanout", 8)
    return grouped_count(
        sizes.map_batches(lambda b: b.select(["fanout"]),
                          batch_format="pyarrow"),
        ["fanout"], "n_orders", 2).sort("fanout")


def _q_events_peak_hour(sf_dir: str):
    """Diurnal peak per event type: the hour-of-day (UTC) with the most
    events, ties to the earliest hour — the seasonality headline of a
    traffic dashboard. |types|×24-bounded grouped count, then the pruned
    per-key top-1."""
    from .functions.grouped import grouped_count
    from .functions.topn import top_n_per_key
    i64 = pa.int64()
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts", "event_type"])
    d = ev.map_batches(lambda b: pa.table({
        "event_type": b["event_type"],
        "hour": pc.cast(pc.hour(pc.cast(b["ts"], pa.timestamp("us"))),
                        i64)}), batch_format="pyarrow")
    cnt = grouped_count(d, ["event_type", "hour"], "n", 4)
    top = top_n_per_key(cnt, ["event_type"],
                        [("n", False), ("hour", True)], 1,
                        num_partitions=2)
    return top.map_batches(lambda b: b.select(["event_type", "hour", "n"]),
                           batch_format="pyarrow")


def _q_events_next_best(sf_dir: str):
    """Next-best-action table: for every event type, the most frequent
    NEXT type in per-user arrival order (ties alphabetical) — the greedy
    policy read off the Markov transition matrix (events_transitions
    gives the matrix; this is its per-state argmax via the pruned
    per-key top-1)."""
    from .functions.topn import top_n_per_key
    from .pipelines.relational import event_transitions
    t = event_transitions(sf_dir)
    top = top_n_per_key(t, ["prev_type"],
                        [("n", False), ("event_type", True)], 1,
                        num_partitions=2)
    return top.map_batches(
        lambda b: b.select(["prev_type", "event_type", "n"]),
        batch_format="pyarrow")


LC_FRACTIONS = 4  # learning-curve prefixes: N·k//4 for k = 1..4


def _q_ml_learning_curve(sf_dir: str):
    """Deterministic learning curve: train a decision stump (predict
    lang='en' iff n_chars >= thr, thr from GINI_THRESHOLDS) on doc_id-
    ordered prefixes of size N·k//4, pick the thr minimizing prefix
    misclassification (tie: lower thr), report full-set accuracy ×10⁶
    per prefix — the does-more-data-help diagnostic. Per-(k, thr)
    misclassification cells fold as |k|·|thr| block partials over the
    zip_with_index global rank; the argmin scans a 24-row frame."""
    import pandas as pd
    from .functions.joins import zip_with_index
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "n_chars", "lang"]) \
        .materialize()
    n = docs.count()
    cuts = [(n * k) // LC_FRACTIONS for k in range(1, LC_FRACTIONS + 1)]
    ths = list(GINI_THRESHOLDS)
    ranked = zip_with_index(docs.sort("doc_id"), id_col="__rank",
                            order_by="doc_id")

    def cells(b: pa.Table) -> pa.Table:
        rank = b["__rank"].to_numpy(zero_copy_only=False)
        nch = pc.cast(b["n_chars"], i64).to_numpy(zero_copy_only=False)
        pos = pc.equal(b["lang"], "en").to_numpy(zero_copy_only=False)
        rows = []
        for k, cut in enumerate(cuts):
            inpre = rank < cut
            for t in ths:
                mis = (nch >= t) != pos
                rows.append((k + 1, t, int((inpre & mis).sum()),
                             int(mis.sum())))
        kk, tt, mp, mf = zip(*rows)
        return pa.table({"k": pa.array(kk, i64), "thr": pa.array(tt, i64),
                         "mis_prefix": pa.array(mp, i64),
                         "mis_full": pa.array(mf, i64)})

    p = ranked.map_batches(cells, batch_format="pyarrow").to_pandas() \
        .groupby(["k", "thr"], as_index=False).sum()
    out = []
    for k in range(1, LC_FRACTIONS + 1):
        sub = p[p["k"] == k].sort_values(["mis_prefix", "thr"])
        best = sub.iloc[0]
        out.append((k, cuts[k - 1], int(best["thr"]),
                    10**6 * (n - int(best["mis_full"])) // n))
    return pd.DataFrame(out, columns=["k", "n_train", "best_thr",
                                      "full_acc_fp"]).astype("int64")


DICT_GAIN_COLS = ("p_brand", "p_type", "p_name")


def _q_diag_dict_gain(sf_dir: str):
    """Dictionary-encoding gain estimate per string column — the storage
    -planner audit that decides parquet encodings: raw bytes vs
    bit-packed codes (bitlen(n_distinct−1) bits/value) + dictionary
    bytes, ×10⁶ signed gain. Per column one distinct-collapse grouped
    count (shuffle sized to the dictionary, not the rows) then a 1-row
    fold."""
    import pandas as pd
    from .functions.grouped import grouped_count
    i64 = pa.int64()
    rows = []
    for col in DICT_GAIN_COLS:
        t = ray.data.read_parquet(os.path.join(sf_dir, "part.parquet"),
                                  columns=[col])
        d = grouped_count(t, [col], "n", 4)

        def fold(b: pa.Table, c=col) -> pa.Table:
            ln = pc.cast(pc.utf8_length(b[c]), i64) \
                .to_numpy(zero_copy_only=False)
            n = b["n"].to_numpy(zero_copy_only=False)
            return pa.table({
                "n_rows": pa.array([int(n.sum())], i64),
                "n_distinct": pa.array([len(n)], i64),
                "raw_bytes": pa.array([int((ln * n).sum())], i64),
                "dict_bytes": pa.array([int(ln.sum())], i64)})

        p = d.map_batches(fold, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
        nr, nd = int(p["n_rows"].sum()), int(p["n_distinct"].sum())
        raw, db = int(p["raw_bytes"].sum()), int(p["dict_bytes"].sum())
        bits = (nd - 1).bit_length()
        enc = (nr * bits + 7) // 8 + db
        rows.append((col, nr, nd, raw, bits,
                     10**6 * (raw - enc) // max(raw, 1)))
    out = pd.DataFrame(rows, columns=["col", "n_rows", "n_distinct",
                                      "raw_bytes", "bits_per_value",
                                      "gain_fp"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out.sort_values("col").reset_index(drop=True)


def _q_events_switchback(sf_dir: str):
    """Switchback experiment readout: hour-sliced alternating assignment
    (arm = epoch-hour % 2 — the time-sliced design used when user-level
    randomization leaks interference), per-arm events, purchases,
    purchase cents and conversion ×10⁶. One |arms|-bounded grouped
    fold."""
    from .functions.grouped import sorted_aggregate
    i64 = pa.int64()
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        hr = pc.divide(pc.cast(pc.cast(b["ts"], pa.timestamp("us")), i64),
                       3_600_000_000)
        isp = pc.cast(pc.equal(b["event_type"], "purchase"), i64)
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0)), i64)
        return pa.table({
            "arm": pc.bit_wise_and(hr, 1),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
            "n_purchase": isp,
            "purchase_cents": pc.multiply(isp, cents)}) \
            .group_by(["arm"], use_threads=False) \
            .aggregate([("n", "sum"), ("n_purchase", "sum"),
                        ("purchase_cents", "sum")]) \
            .rename_columns(["arm", "n", "n_purchase", "purchase_cents"])

    h = sorted_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["arm"], [("n", "sum"), ("n_purchase", "sum"),
                  ("purchase_cents", "sum")],
        ["arm", "n", "n_purchase", "purchase_cents"], 1)

    def conv(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        p = b["n_purchase"].to_numpy(zero_copy_only=False)
        return b.append_column("conv_fp", pa.array(
            10**6 * p // np.maximum(n, 1), i64))

    return h.map_batches(conv, batch_format="pyarrow",
                         zero_copy_batch=True)


def _q_search_autocomplete(sf_dir: str):
    """Autocomplete table: top-3 corpus words per 2-char prefix by
    (frequency desc, word asc) — the query-suggestion index build. One
    word-frequency grouped count (dictionary-sized shuffle), prefix
    sliced vectorized, pruned per-key top-k."""
    from .functions.grouped import grouped_count
    from .functions.topn import top_n_per_key
    from .stages.dedup import _words_flat
    i64 = pa.int64()

    def words(b: pa.Table) -> pa.Table:
        w, _ = _words_flat(b["text"])
        return pa.table({"word": pa.array(w)})

    freq = grouped_count(_docs(sf_dir).map_batches(
        words, batch_format="pyarrow", zero_copy_batch=True),
        ["word"], "n", 8)
    pre = freq.map_batches(lambda b: pa.table({
        "prefix": pc.utf8_slice_codeunits(b["word"], 0, 2),
        "word": b["word"], "n": b["n"]}), batch_format="pyarrow")
    top = top_n_per_key(pre, ["prefix"], [("n", False), ("word", True)],
                        3, num_partitions=4)
    return top.map_batches(
        lambda b: b.select(["prefix", "word", "n", "rank"]),
        batch_format="pyarrow")


BLOOM_FPR_M = 65536        # filter bits
BLOOM_FPR_SHIFT = 10**9    # offset making guaranteed non-member probes


def _q_diag_bloom_fpr(sf_dir: str):
    """Bloom-filter false-positive audit (the measured twin of the
    (1−e^{−kn/m})^k design formula): k=2 splitmix64 positions per key
    into m=2^16 bits built from the DISTINCT order keys; probed with
    every part key (all true members — the zero-false-negative check)
    and every part key + 10^9 (guaranteed non-members — the FPR
    numerator). The bit set is m-BOUNDED (8 KB broadcast at any data
    scale); build and probe are distinct-collapse grouped passes."""
    import pandas as pd
    from .functions.cms import cms_row_seeds
    from .functions.grouped import grouped_count
    from .functions.sampling import splitmix64
    i64 = pa.int64()
    s1, s2 = [np.uint64(s) for s in cms_row_seeds()[:2]]

    def pos_of(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        u = keys.astype(np.int64).view(np.uint64)
        h1 = splitmix64(u ^ s1) % np.uint64(BLOOM_FPR_M)
        h2 = splitmix64(u ^ s2) % np.uint64(BLOOM_FPR_M)
        return h1.astype(np.int64), h2.astype(np.int64)

    ok = grouped_count(
        ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                              columns=["o_orderkey"]),
        ["o_orderkey"], "__n", 8)

    def build(b: pa.Table) -> pa.Table:
        h1, h2 = pos_of(b["o_orderkey"].to_numpy(zero_copy_only=False))
        return pa.table({"pos": pa.array(np.concatenate([h1, h2]), i64)})

    pos = grouped_count(ok.map_batches(build, batch_format="pyarrow"),
                        ["pos"], "__n", 2).to_pandas()
    bits = np.zeros(BLOOM_FPR_M, bool)
    bits[pos["pos"].to_numpy()] = True
    n_keys = ok.count()

    pk = grouped_count(
        ray.data.read_parquet(os.path.join(sf_dir, "part.parquet"),
                              columns=["p_partkey"]),
        ["p_partkey"], "__n", 4)

    def probe(b: pa.Table) -> pa.Table:
        k = pc.cast(b["p_partkey"], i64).to_numpy(zero_copy_only=False)
        rows = []
        for member, keys in ((1, k), (0, k + BLOOM_FPR_SHIFT)):
            h1, h2 = pos_of(keys)
            rows.append((member, len(keys),
                         int((bits[h1] & bits[h2]).sum())))
        m_, t_, p_ = zip(*rows)
        return pa.table({"member": pa.array(m_, i64),
                         "n_tested": pa.array(t_, i64),
                         "n_pass": pa.array(p_, i64)})

    p = pk.map_batches(probe, batch_format="pyarrow").to_pandas() \
        .groupby("member", as_index=False).sum()
    mem = p[p["member"] == 1].iloc[0]
    non = p[p["member"] == 0].iloc[0]
    return pd.DataFrame({
        "n_keys": [n_keys], "n_bits_set": [int(bits.sum())],
        "n_members_tested": [int(mem["n_tested"])],
        "n_members_pass": [int(mem["n_pass"])],
        "n_nonmembers_tested": [int(non["n_tested"])],
        "n_false_pos": [int(non["n_pass"])],
        "fpr_fp": [10**6 * int(non["n_pass"])
                   // max(int(non["n_tested"]), 1)]}).astype("int64")


def _q_text_hapax_ratio(sf_dir: str):
    """Per-source lexical richness: vocabulary size, hapax legomena
    (words occurring exactly once in the source) and the hapax ratio
    ×10⁶ — the corpus-health signal between type-token ratio (per doc)
    and Heaps' law (growth curve). One (source, word) grouped count
    (dictionary-sized shuffle); the per-source fold sums distinct-word
    rows only."""
    from .functions.grouped import grouped_count, sorted_aggregate
    from .stages.dedup import _words_flat
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["source", "text"])

    def words(b: pa.Table) -> pa.Table:
        w, doc_of = _words_flat(b["text"])
        src = b["source"].to_numpy(zero_copy_only=False)
        return pa.table({"source": pa.array(src[doc_of]),
                         "word": pa.array(w)})

    c = grouped_count(docs.map_batches(words, batch_format="pyarrow",
                                       zero_copy_batch=True),
                      ["source", "word"], "n", 8)

    def partial(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({"source": b["source"],
                         "v": pa.array(np.ones(len(n), np.int64)),
                         "h": pa.array((n == 1).astype(np.int64)),
                         "t": pa.array(n)}) \
            .group_by(["source"], use_threads=False) \
            .aggregate([("v", "sum"), ("h", "sum"), ("t", "sum")]) \
            .rename_columns(["source", "v", "h", "t"])

    agg = sorted_aggregate(
        c.map_batches(partial, batch_format="pyarrow"),
        ["source"], [("v", "sum"), ("h", "sum"), ("t", "sum")],
        ["source", "n_vocab", "n_hapax", "n_tokens"], 1)
    return agg.map_batches(lambda b: b.append_column(
        "hapax_fp", pa.array(
            10**6 * b["n_hapax"].to_numpy(zero_copy_only=False)
            // b["n_vocab"].to_numpy(zero_copy_only=False), i64)),
        batch_format="pyarrow", zero_copy_batch=True)


def _q_ml_class_weights(sf_dir: str):
    """Inverse-frequency class weights for imbalanced training:
    weight_fp = 10⁶·N // (|classes|·n_c) per embedding label (sklearn's
    'balanced' heuristic in exact integers). One |labels|-bounded
    grouped count; the fold runs on that tiny frame."""
    import pandas as pd
    from .functions.grouped import grouped_count
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                columns=["label"])
    h = grouped_count(
        emb.map_batches(lambda b: pa.table(
            {"label": pc.cast(b["label"], pa.int64())}),
            batch_format="pyarrow"),
        ["label"], "n", 2).to_pandas()
    n_total = int(h["n"].sum())
    k = len(h)
    return pd.DataFrame({
        "label": h["label"].astype("int64"),
        "n": h["n"].astype("int64"),
        "weight_fp": (10**6 * n_total
                      // (k * h["n"].astype("int64")))}).astype("int64") \
        .sort_values("label").reset_index(drop=True)


def _q_curation_dedup_savings(sf_dir: str):
    """Dedup savings report: per source, documents dropped by exact
    keep-first dedup (min doc_id per identical text) and the token
    budget those drops free — the curation accounting line a 100-TB run
    reports per shard. Doc rows shuffle ONCE as (digest, doc_id, source,
    n_tokens); groups are complete per block, so keep/drop marking is
    offset arithmetic."""
    from .functions.grouped import group_ids, sorted_aggregate, \
        sorted_group_apply
    from .stages.dedup import _md5_array
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "source", "text"])

    def digest(b: pa.Table) -> pa.Table:
        ntok = pc.cast(pc.add(pc.count_substring(b["text"], " "), 1), i64)
        return pa.table({"h": _md5_array(b["text"].to_pylist()),
                         "doc_id": b["doc_id"], "source": b["source"],
                         "ntok": ntok})

    def mark(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("source", pa.string()), ("n_docs", i64),
                              ("n_dropped", i64), ("tokens_dropped", i64),
                              ("tokens_kept", i64)]).empty_table()
        gid, starts = group_ids(b, ["h"])
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        kmin = np.full(gid.max() + 1, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(kmin, gid, did)
        dropped = did != kmin[gid]
        nt = b["ntok"].to_numpy(zero_copy_only=False)
        return pa.table({
            "source": b["source"],
            "n_docs": pa.array(np.ones(len(did), np.int64)),
            "n_dropped": pa.array(dropped.astype(np.int64)),
            "tokens_dropped": pa.array(np.where(dropped, nt, 0)),
            "tokens_kept": pa.array(np.where(dropped, 0, nt))}) \
            .group_by(["source"], use_threads=False) \
            .aggregate([("n_docs", "sum"), ("n_dropped", "sum"),
                        ("tokens_dropped", "sum"), ("tokens_kept", "sum")]) \
            .rename_columns(["source", "n_docs", "n_dropped",
                             "tokens_dropped", "tokens_kept"])

    marked = sorted_group_apply(
        docs.map_batches(digest, batch_format="pyarrow",
                         zero_copy_batch=True), ["h"], mark,
        num_partitions=8)
    return sorted_aggregate(
        marked, ["source"],
        [("n_docs", "sum"), ("n_dropped", "sum"),
         ("tokens_dropped", "sum"), ("tokens_kept", "sum")],
        ["source", "n_docs", "n_dropped", "tokens_dropped",
         "tokens_kept"], 1)


def _q_events_median_gap(sf_dir: str):
    """Exact (lower-)median inter-arrival seconds per event type, pooled
    over each user's per-type stream — the latency-SLO statistic the
    log2 histogram (events_interarrival_hist) approximates. Gaps emit
    from complete (user, type) sorted groups; the median picks the
    ordinal (n−1)//2 element from a (type, gap) HISTOGRAM cumsum, so
    the second shuffle is distinct-gap-sized, not gap-count-sized."""
    from .functions.grouped import group_ids, grouped_count, \
        sorted_group_apply
    i64 = pa.int64()
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "user_id", "ts",
                                        "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"], "event_type": b["event_type"],
            "ts_us": pc.cast(pc.cast(b["ts"], pa.timestamp("us")), i64),
            "event_id": b["event_id"]})

    def gaps(b: pa.Table) -> pa.Table:
        schema = pa.schema([("event_type", pa.string()), ("gap", i64)])
        if b.num_rows == 0:
            return schema.empty_table()
        gid, _ = group_ids(b, ["user_id", "event_type"])
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, gid))
        has_prev = np.empty(len(order), bool)
        has_prev[0] = False
        has_prev[1:] = gid[order][1:] == gid[order][:-1]
        gap = np.empty(len(order), np.int64)
        gap[1:] = (ts[order][1:] - ts[order][:-1]) // 1_000_000
        et = b["event_type"].to_numpy(zero_copy_only=False)[order]
        return pa.table({"event_type": pa.array(et[has_prev]),
                         "gap": pa.array(gap[1:][has_prev[1:]])},
                        schema=schema)

    g = sorted_group_apply(ev.map_batches(prep, batch_format="pyarrow"),
                           ["user_id", "event_type"], gaps,
                           num_partitions=8)
    hist = grouped_count(g, ["event_type", "gap"], "n", 4)

    def med(b: pa.Table) -> pa.Table:
        schema = pa.schema([("event_type", pa.string()), ("n_gaps", i64),
                            ("median_gap_s", i64)])
        if b.num_rows == 0:
            return schema.empty_table()
        gid, starts = group_ids(b, ["event_type"])
        gap = b["gap"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((gap, gid))
        gs, ns, gd = gap[order], n[order], gid[order]
        rows = []
        et = b["event_type"].to_numpy(zero_copy_only=False)
        for gi, (s0, e0) in enumerate(zip(
                np.searchsorted(gd, np.arange(len(starts))),
                np.searchsorted(gd, np.arange(len(starts)), "right"))):
            tot = int(ns[s0:e0].sum())
            target = (tot - 1) // 2
            local = np.cumsum(ns[s0:e0])
            idx = int(np.searchsorted(local, target, side="right"))
            rows.append((et[starts[gi]], tot, int(gs[s0 + idx])))
        t, ng, mg = zip(*rows)
        return pa.table({"event_type": pa.array(list(t)),
                         "n_gaps": pa.array(ng, i64),
                         "median_gap_s": pa.array(mg, i64)}, schema=schema)

    return sorted_group_apply(hist, ["event_type"], med, num_partitions=1)


def _q_kg_blocking_quality(sf_dir: str):
    """Entity-linking blocking audit: reduction ratio and pairs
    completeness of the char-3-gram blocking index (stages/link.py's
    candidate generation, reproduced as data): candidate = (form,
    entity) sharing ≥1 gram over any entity name; truth = canonical ==
    label under the shared normalizer. The record-linkage quality gate
    run BEFORE committing to a blocking scheme at 10¹² pairs. Gram
    postings join via the m:n co-group; all counts are
    dictionary-sized."""
    import pandas as pd
    from .functions.bgp import cogroup_join
    from .functions.grouped import grouped_count
    from .functions.normalize import normalize_array
    from .stages.link import _ngrams
    fdir = _fx(sf_dir)
    vocab = ray.data.read_parquet(os.path.join(fdir, "vocab.parquet"))
    ents = ray.data.read_parquet(os.path.join(fdir, "entities.parquet"))

    def form_rows(b: pa.Table) -> pa.Table:
        nf = normalize_array(b["surface_form"]).to_pylist()
        nc = normalize_array(b["canonical"]).to_pylist()
        return pa.table({"nf": pa.array(nf, pa.string()),
                         "nc": pa.array(nc, pa.string())})

    forms = grouped_count(
        vocab.map_batches(form_rows, batch_format="pyarrow"),
        ["nf", "nc"], "__n", 2)

    def form_grams(b: pa.Table) -> pa.Table:
        gs, fs = [], []
        for f in b["nf"].to_pylist():
            for g in _ngrams(f):
                gs.append(g)
                fs.append(f)
        return pa.table({"g": pa.array(gs, pa.string()),
                         "nf": pa.array(fs, pa.string())})

    fg = grouped_count(
        forms.map_batches(form_grams, batch_format="pyarrow"),
        ["g", "nf"], "__n", 4).map_batches(
        lambda b: b.select(["g", "nf"]), batch_format="pyarrow")

    def ent_grams(b: pa.Table) -> pa.Table:
        from .functions.normalize import normalize_one
        gs, ids = [], []
        for eid, label, alias in zip(b["entity_id"].to_pylist(),
                                     b["label"].to_pylist(),
                                     b["aliases"].to_pylist()):
            names = {normalize_one(label)} | {normalize_one(a)
                                              for a in (alias or [])}
            for nm in names:
                for g in _ngrams(nm):
                    gs.append(g)
                    ids.append(eid)
        return pa.table({"g": pa.array(gs, pa.string()),
                         "entity_id": pa.array(ids, pa.string())})

    eg = grouped_count(
        ents.map_batches(ent_grams, batch_format="pyarrow"),
        ["g", "entity_id"], "__n", 4).map_batches(
        lambda b: b.select(["g", "entity_id"]), batch_format="pyarrow")

    joined = cogroup_join(fg, eg, ["g"], ["g", "nf"], ["g", "entity_id"],
                          num_partitions=8, max_group=10_000_000)
    cand = grouped_count(joined.map_batches(
        lambda b: b.select(["nf", "entity_id"]), batch_format="pyarrow"),
        ["nf", "entity_id"], "__n", 8).map_batches(
        lambda b: b.select(["nf", "entity_id"]), batch_format="pyarrow") \
        .materialize()

    lab = ents.map_batches(lambda b: pa.table({
        "key": normalize_array(b["label"]),
        "entity_id": b["entity_id"]}), batch_format="pyarrow")
    tp = grouped_count(
        cogroup_join(
            forms.map_batches(lambda b: pa.table(
                {"key": b["nc"], "nf": b["nf"]}), batch_format="pyarrow"),
            lab, ["key"], ["key", "nf"], ["key", "entity_id"],
            num_partitions=2),
        ["nf", "entity_id"], "__n", 2).map_batches(
        lambda b: b.select(["nf", "entity_id"]), batch_format="pyarrow") \
        .materialize()

    n_forms = grouped_count(
        forms.map_batches(lambda b: b.select(["nf"]),
                          batch_format="pyarrow"),
        ["nf"], "__n", 2).count()
    n_entities = ents.count()
    n_cand = cand.count()
    n_true = tp.count()
    missing = cogroup_join(tp, cand, ["nf", "entity_id"],
                           ["nf", "entity_id"], ["nf", "entity_id"],
                           num_partitions=2, how="anti").count()
    covered = n_true - missing
    tot = n_forms * n_entities
    return pd.DataFrame({
        "n_forms": [n_forms], "n_entities": [n_entities],
        "n_true": [n_true], "n_candidates": [n_cand],
        "n_true_covered": [covered],
        "completeness_fp": [10**6 * covered // max(n_true, 1)],
        "reduction_fp": [10**6 * (tot - n_cand) // max(tot, 1)]}) \
        .astype("int64")


NEYMAN_BUDGET = 1000


def _q_sample_neyman_alloc(sf_dir: str):
    """Neyman-optimal stratified sample allocation over order
    priorities: n_h ∝ N_h·σ_h, realized exactly as w_h = isqrt(N_h·Σx²
    − (Σx)²) (= ⌊N_h·σ_h⌋ in x = cents//1000 units) with
    largest-remainder rounding to the fixed budget — the
    variance-matched upgrade of proportional stratification
    (sample_stratified). Per-stratum moment partials fold per block;
    the isqrt/apportionment runs on the |strata|-row frame in Python
    bigints (the SQL twin carries the float-sqrt exactness
    correction)."""
    import math

    import pandas as pd
    i64 = pa.int64()
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderpriority", "o_totalprice"])

    def moments(b: pa.Table) -> pa.Table:
        x = (pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)), i64)
             .to_numpy(zero_copy_only=False) // 1000)
        return pa.table({"prio": b["o_orderpriority"],
                         "n": pa.array(np.ones(len(x), np.int64)),
                         "sx": pa.array(x), "sx2": pa.array(x * x)}) \
            .group_by(["prio"], use_threads=False) \
            .aggregate([("n", "sum"), ("sx", "sum"), ("sx2", "sum")]) \
            .rename_columns(["prio", "n", "sx", "sx2"])

    p = od.map_batches(moments, batch_format="pyarrow").to_pandas() \
        .groupby("prio", as_index=False).sum().sort_values("prio") \
        .reset_index(drop=True)
    w = [math.isqrt(int(r["n"]) * int(r["sx2"]) - int(r["sx"]) ** 2)
         for _, r in p.iterrows()]
    tw = sum(w)
    floor_a = [NEYMAN_BUDGET * wi // tw for wi in w]
    rem = [NEYMAN_BUDGET * wi - fa * tw for wi, fa in zip(w, floor_a)]
    left = NEYMAN_BUDGET - sum(floor_a)
    order = sorted(range(len(w)), key=lambda i: (-rem[i], p["prio"][i]))
    alloc = list(floor_a)
    for i in order[:left]:
        alloc[i] += 1
    return pd.DataFrame({
        "o_orderpriority": p["prio"],
        "n_h": p["n"].astype("int64"),
        "w": pd.Series(w, dtype="int64"),
        "alloc": pd.Series(alloc, dtype="int64")})


def _q_rel_gap_interpolate(sf_dir: str):
    """Linear interpolation of missing DAYS in the daily-revenue series
    (the imputation upgrade of events_gap_fill's zero-fill): a missing
    day d between anchors (p, v_p) and (q, v_q) gets v_p + (v_q−v_p)·
    (d−p) // (q−p), FLOOR division both sides (the SQL twin corrects
    DuckDB's trunc for falling segments). The distributed daily fold is
    calendar-bounded, so the spine walk runs vectorized on the
    driver."""
    import pandas as pd
    from .functions.grouped import sorted_aggregate
    i64 = pa.int64()
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"])

    def daily(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(pc.cast(b["o_orderdate"],
                                        pa.timestamp("us")), i64),
                        86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                        i64)
        return pa.table({"day": day, "cents": cents}) \
            .group_by(["day"], use_threads=False) \
            .aggregate([("cents", "sum")]).rename_columns(["day", "cents"])

    d = sorted_aggregate(
        od.map_batches(daily, batch_format="pyarrow"),
        ["day"], [("cents", "sum")], ["day", "cents"], 8).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    day = d["day"].to_numpy().astype(np.int64)
    c = d["cents"].to_numpy().astype(np.int64)
    spine = np.arange(day[0], day[-1] + 1, dtype=np.int64)
    pos = np.searchsorted(day, spine)
    present = (pos < len(day)) & (day[np.minimum(pos, len(day) - 1)]
                                  == spine)
    nxt = np.minimum(pos, len(day) - 1)
    prv = np.maximum(pos - 1, 0)
    v = np.where(present, c[nxt],
                 c[prv] + (c[nxt] - c[prv]) * (spine - day[prv])
                 // np.maximum(day[nxt] - day[prv], 1))
    return pd.DataFrame({
        "day": spine, "cents": v,
        "interpolated": (~present).astype("int64")}).astype("int64")


def _q_rel_running_balance(sf_dir: str):
    """Inventory running balance per part: shipments ordered by
    (shipdate, orderkey, linenumber) add quantity when l_returnflag='R'
    (restock) and subtract otherwise; report each part's final and
    MINIMUM running balance — the stockout-risk scan. Complete part
    groups per block (sort on exactly l_partkey); in-block ordering and
    the segmented cumsum/min are pure numpy offset arithmetic."""
    from .functions.grouped import group_ids, sorted_group_apply
    i64 = pa.int64()
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_orderkey", "l_linenumber", "l_quantity",
                 "l_returnflag", "l_shipdate"])

    def prep(b: pa.Table) -> pa.Table:
        qty = pc.cast(pc.round(b["l_quantity"]), i64) \
            .to_numpy(zero_copy_only=False)
        restock = pc.equal(b["l_returnflag"], "R") \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "pk": pc.cast(b["l_partkey"], i64),
            "day": pc.divide(pc.cast(pc.cast(b["l_shipdate"],
                                             pa.timestamp("us")), i64),
                             86_400_000_000),
            "ok": pc.cast(b["l_orderkey"], i64),
            "ln": pc.cast(b["l_linenumber"], i64),
            "delta": pa.array(np.where(restock, qty, -qty))})

    def scan(b: pa.Table) -> pa.Table:
        schema = pa.schema([("l_partkey", i64), ("n_moves", i64),
                            ("final_balance", i64), ("min_balance", i64)])
        if b.num_rows == 0:
            return schema.empty_table()
        gid, starts = group_ids(b, ["pk"])
        order = np.lexsort((b["ln"].to_numpy(zero_copy_only=False),
                            b["ok"].to_numpy(zero_copy_only=False),
                            b["day"].to_numpy(zero_copy_only=False), gid))
        d = b["delta"].to_numpy(zero_copy_only=False)[order]
        og = gid[order]
        cum = np.cumsum(d)
        ends = np.append(starts[1:], len(d)) - 1
        # segmented cumsum: subtract the previous group's closing total
        prev_close = np.concatenate([[0], cum[ends[:-1]]])
        bal = cum - prev_close[og]
        final = bal[ends]
        mins = np.full(len(starts), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mins, og, bal)
        pk = b["pk"].to_numpy(zero_copy_only=False)[starts]
        return pa.table({"l_partkey": pa.array(pk),
                         "n_moves": pa.array(
                             (ends - starts + 1).astype(np.int64)),
                         "final_balance": pa.array(final),
                         "min_balance": pa.array(mins)}, schema=schema)

    return sorted_group_apply(
        li.map_batches(prep, batch_format="pyarrow"), ["pk"], scan,
        num_partitions=8)


def _q_dedup_normalized(sf_dir: str):
    """Canonical-form dedup: keep-first per NORMALIZED text (the shared
    camel/case/punctuation normalizer) — catches trivial re-encodings
    exact_dedup misses while staying cheaper than near-dup. Only
    (digest-of-normalized, doc_id) shuffles."""
    from .functions.grouped import sorted_aggregate
    from .functions.normalize import normalize_array
    from .stages.dedup import _md5_array

    def digest(b: pa.Table) -> pa.Table:
        norm = normalize_array(b["text"])
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()
        return pa.table({"norm_hash": _md5_array(norm.to_pylist()),
                         "doc_id": b["doc_id"]})

    return sorted_aggregate(
        _docs(sf_dir).map_batches(digest, batch_format="pyarrow",
                                  zero_copy_batch=True),
        ["norm_hash"], [("doc_id", "count"), ("doc_id", "min")],
        ["norm_hash", "n_dups", "keep_doc_id"], 8)


def _q_emb_triplet_accuracy(sf_dir: str):
    """Embedding triplet evaluation: for every anchor a, positive p =
    the next vec_id with the SAME label (cyclic within label), negative
    n = the next vec_id with a DIFFERENT label (cyclic global scan) —
    fully deterministic triplets; accuracy = fraction with cos(a,p) >
    cos(a,n) on 6-dp rounded scores (ties lose). The metric-learning
    sanity check that label_coherence aggregates away. Triplet ids come
    from two sorted scans; scoring gathers rows from the broadcast
    normalized matrix (the ANN transport; ride-along beyond object-store
    scale)."""
    import pandas as pd
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                columns=["vec_id", "embedding", "label"]) \
        .materialize()
    meta = emb.map_batches(lambda b: pa.table(
        {"vec_id": pc.cast(b["vec_id"], pa.int64()),
         "label": pc.cast(b["label"], pa.int64())}),
        batch_format="pyarrow").to_pandas().sort_values("vec_id") \
        .reset_index(drop=True)
    vid = meta["vec_id"].to_numpy()
    lab = meta["label"].to_numpy()
    n = len(vid)
    # positive: next id in the SAME label (cyclic per label)
    pos = np.empty(n, np.int64)
    for lv in np.unique(lab):
        idx = np.flatnonzero(lab == lv)
        pos[idx] = vid[np.roll(idx, -1)]
    # negative: next id (cyclic) with a DIFFERENT label — vectorized
    # backward fill over the doubled array: positions where the successor
    # differs are anchors; everything else takes the nearest anchor to
    # its right (labels form runs after the vec_id sort only by accident,
    # so this is exact regardless of run structure)
    dbl_v = np.concatenate([vid, vid])
    dbl_l = np.concatenate([lab, lab])
    m2 = 2 * n - 1
    succ_diff = dbl_l[1:] != dbl_l[:-1]
    anchor_idx = np.where(succ_diff, np.arange(m2), m2)
    nearest = np.minimum.accumulate(anchor_idx[::-1])[::-1]
    neg_full = np.where(nearest < m2, dbl_v[np.minimum(nearest, m2 - 1) + 1],
                        -1)
    neg = neg_full[:n]
    if (neg < 0).all():  # degenerate single-label corpus: no triplets
        return pd.DataFrame({"n_triplets": [0], "n_wins": [0],
                             "acc_fp": [0]}).astype("int64")
    from .stages.dedup import _load_matrix, _normalized_block_refs
    refs = _normalized_block_refs(emb)
    mats = [_load_matrix(ray.get(r)) for r in refs]
    ids = np.concatenate([m[0] for m in mats])
    mat = np.concatenate([m[1] for m in mats])
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]

    def vec(v):
        return mat[np.searchsorted(ids, v)]

    ca = np.round(np.einsum("ij,ij->i", vec(vid), vec(pos)), 6)
    cn = np.round(np.einsum("ij,ij->i", vec(vid), vec(neg)), 6)
    wins = int((ca > cn).sum())
    return pd.DataFrame({
        "n_triplets": [n], "n_wins": [wins],
        "acc_fp": [10**6 * wins // n]}).astype("int64")


def _q_kg_ego_subgraph(sf_dir: str):
    """Ego-subgraph extraction: the induced IRI→IRI subgraph within 2
    undirected hops of a deterministic seed (the lexicographically
    smallest sameAs target) — the neighborhood-export primitive behind
    entity debugging and GNN sampling. Two frontier-broadcast scan
    rounds (the frontier is a node SET, shipped once per round), then
    one induced-edge filter; the graph itself never leaves the
    workers."""
    from .pipelines.kg import run_kg
    tri = run_kg(sf_dir).materialize()

    def edges_only(b: pa.Table) -> pa.Table:
        t = b.filter(pc.invert(b["obj_is_literal"]))
        return pa.table({"subj": t["subj"], "pred": t["pred"],
                         "obj": t["obj"]})

    e = tri.map_batches(edges_only, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()
    seed = e.filter(expr=f"pred == '{C.PRED_SAME_AS}'") \
        .map_batches(lambda b: pa.table({"o": b["obj"]}),
                     batch_format="pyarrow").to_pandas()["o"].min()
    frontier = {seed}
    nodes = {seed}
    for _ in range(2):
        fr = frontier

        def expand(b: pa.Table, fr=fr) -> pa.Table:
            fa = pa.array(sorted(fr), pa.string())
            m = pc.or_(pc.is_in(b["subj"], value_set=fa),
                       pc.is_in(b["obj"], value_set=fa))
            t = b.filter(m)
            return pa.table({"n": pa.concat_arrays(
                [t["subj"].combine_chunks(), t["obj"].combine_chunks()])})

        nb = e.map_batches(expand, batch_format="pyarrow") \
            .map_batches(lambda b: pa.table(
                {"n": pc.unique(b["n"].combine_chunks())}),
                batch_format="pyarrow").to_pandas()
        new = set(nb["n"]) - nodes
        nodes |= new
        frontier = new
        if not frontier:
            break
    na = pa.array(sorted(nodes), pa.string())

    def induced(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_in(b["subj"], value_set=na),
                    pc.is_in(b["obj"], value_set=na))
        return b.filter(m)

    return e.map_batches(induced, batch_format="pyarrow",
                         zero_copy_batch=True).sort(["subj", "pred",
                                                     "obj"])


SELECTIVITY_PREDS = (
    ("returnflag_R", "l_returnflag = 'R'"),
    ("ship_1995_plus", "epoch_us(l_shipdate) // 86400000000 >= 9131"),
    ("qty_ge_25", "round(l_quantity) >= 25"),
    ("disc_gt_5pct", "round(l_discount * 100) > 5"),
    ("combo_R_and_qty", "l_returnflag = 'R' AND round(l_quantity) >= 25"),
)


def _q_diag_selectivity(sf_dir: str):
    """Predicate selectivity profile ×10⁶ for a fixed planner predicate
    set (incl. one conjunction — the independence-assumption check:
    compare combo selectivity to the product of its parts). ONE scan
    computes every predicate as a vectorized mask; |preds| counters
    fold."""
    import pandas as pd
    i64 = pa.int64()
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_shipdate", "l_quantity", "l_discount"])

    def masks(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(pc.cast(b["l_shipdate"],
                                        pa.timestamp("us")), i64),
                        86_400_000_000).to_numpy(zero_copy_only=False)
        rf = pc.equal(b["l_returnflag"], "R").to_numpy(
            zero_copy_only=False)
        qty = pc.cast(pc.round(b["l_quantity"]), i64) \
            .to_numpy(zero_copy_only=False)
        dc = pc.cast(pc.round(pc.multiply(b["l_discount"], 100.0)), i64) \
            .to_numpy(zero_copy_only=False)
        vals = {"returnflag_R": rf, "ship_1995_plus": day >= 9131,
                "qty_ge_25": qty >= 25, "disc_gt_5pct": dc > 5,
                "combo_R_and_qty": rf & (qty >= 25)}
        names = [n for n, _ in SELECTIVITY_PREDS]
        return pa.table({
            "pred": pa.array(names, pa.string()),
            "n_match": pa.array([int(vals[n].sum()) for n in names], i64),
            "n_rows": pa.array([b.num_rows] * len(names), i64)})

    p = li.map_batches(masks, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas() \
        .groupby("pred", as_index=False).sum()
    p["sel_fp"] = (10**6 * p["n_match"].astype("int64")
                   // p["n_rows"].astype("int64"))
    return p.sort_values("pred").reset_index(drop=True).astype(
        {"n_match": "int64", "n_rows": "int64", "sel_fp": "int64"})


def _q_emb_quantization_error(sf_dir: str):
    """Reconstruction-error audit of the SQ8 quantizer
    (emb_int8_quantize's codes dequantized back): total squared error
    and max |error| in fixed-point units — the quality side of the
    4x storage saving. Same two-pass shape (per-dim min/max fold, then
    one stateless pass); only 3 counters leave the workers."""
    import pandas as pd
    emb = _emb(sf_dir)
    i64 = pa.int64()

    def mm(b: pa.Table) -> pa.Table:
        e = b["embedding"].combine_chunks()
        d = len(e[0])
        m = np.floor(e.flatten().to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1e6).astype(np.int64) \
            .reshape(b.num_rows, d)
        return pa.table({"dim": pa.array(np.arange(1, d + 1), i64),
                         "mn": pa.array(m.min(axis=0), i64),
                         "mx": pa.array(m.max(axis=0), i64)})

    parts = pa.concat_tables(ray.get(
        emb.map_batches(mm, batch_format="pyarrow").to_arrow_refs())) \
        .to_pandas()
    g = parts.groupby("dim").agg(mn=("mn", "min"), mx=("mx", "max"))
    mn = g["mn"].to_numpy()
    rng = np.maximum(g["mx"].to_numpy() - mn, 1)

    def err(b: pa.Table) -> pa.Table:
        e = b["embedding"].combine_chunks()
        d = len(e[0])
        m = np.floor(e.flatten().to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1e6).astype(np.int64) \
            .reshape(b.num_rows, d)
        q = (m - mn[None, :]) * 255 // rng[None, :]
        deq = mn[None, :] + q * rng[None, :] // 255
        diff = m - deq
        return pa.table({
            "n": pa.array([b.num_rows], i64),
            "sse": pa.array([int((diff * diff).sum())], i64),
            "max_abs": pa.array([int(np.abs(diff).max(initial=0))], i64)})

    p = emb.map_batches(err, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    return pd.DataFrame({
        "n_vecs": [int(p["n"].sum())], "sse": [int(p["sse"].sum())],
        "max_abs_err": [int(p["max_abs"].max())]}).astype("int64")


BOOT_BLOCK_DAYS = 7
BOOT_N_BLOCKS = 100


def _q_sample_block_bootstrap(sf_dir: str):
    """Deterministic moving-block bootstrap of mean daily revenue (the
    time-series resampler that preserves week-scale autocorrelation,
    where the iid bootstrap breaks it): 100 week-long blocks chosen by
    splitmix64(i) % n_starts, mean over the resample in exact cents.
    The daily fold is distributed and calendar-bounded; block draws are
    pure integer hashing reproduced verbatim in SQL."""
    import pandas as pd
    from .functions.grouped import sorted_aggregate
    from .functions.sampling import splitmix64
    i64 = pa.int64()
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"])

    def daily(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(pc.cast(b["o_orderdate"],
                                        pa.timestamp("us")), i64),
                        86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                        i64)
        return pa.table({"day": day, "cents": cents}) \
            .group_by(["day"], use_threads=False) \
            .aggregate([("cents", "sum")]).rename_columns(["day", "cents"])

    d = sorted_aggregate(
        od.map_batches(daily, batch_format="pyarrow"),
        ["day"], [("cents", "sum")], ["day", "cents"], 8).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    day = d["day"].to_numpy().astype(np.int64)
    c = d["cents"].to_numpy().astype(np.int64)
    # dense spine (missing days = 0 revenue) so blocks are calendar weeks
    spine = np.arange(day[0], day[-1] + 1, dtype=np.int64)
    v = np.zeros(len(spine), np.int64)
    v[day - day[0]] = c
    n_starts = len(spine) - BOOT_BLOCK_DAYS + 1
    draws = (splitmix64(np.arange(BOOT_N_BLOCKS).astype(np.uint64))
             % np.uint64(n_starts)).astype(np.int64)
    idx = draws[:, None] + np.arange(BOOT_BLOCK_DAYS)[None, :]
    total = int(v[idx].sum())
    n_days = BOOT_N_BLOCKS * BOOT_BLOCK_DAYS
    return pd.DataFrame({
        "n_blocks": [BOOT_N_BLOCKS], "n_days": [n_days],
        "total_cents": [total],
        "mean_cents": [total // n_days]}).astype("int64")


def _q_ml_wilson_ci(sf_dir: str):
    """Wilson 95% score interval (z = 2 exactly, so every term is
    rational) for the per-source share of lang='en' docs: bounds ×10⁶ =
    (10⁶·(s+2) ± 2·isqrt(10¹²·(s·(n−s)+n)//n)) // (n+4) — the
    small-sample-honest CI the normal approximation gets wrong. One
    |sources|-bounded grouped fold; isqrt exact in Python (the SQL twin
    carries the float-sqrt ±1 correction)."""
    import math

    import pandas as pd
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["source", "lang"])

    def cells(b: pa.Table) -> pa.Table:
        return pa.table({
            "source": b["source"],
            "n": pa.array(np.ones(b.num_rows, np.int64)),
            "s": pc.cast(pc.equal(b["lang"], "en"), i64)}) \
            .group_by(["source"], use_threads=False) \
            .aggregate([("n", "sum"), ("s", "sum")]) \
            .rename_columns(["source", "n", "s"])

    p = docs.map_batches(cells, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas() \
        .groupby("source", as_index=False).sum().sort_values("source") \
        .reset_index(drop=True)
    rows = []
    for _, r in p.iterrows():
        n, s = int(r["n"]), int(r["s"])
        t = math.isqrt(10**12 * (s * (n - s) + n) // n)
        lo = (10**6 * (s + 2) - 2 * t) // (n + 4)
        hi = (10**6 * (s + 2) + 2 * t) // (n + 4)
        rows.append((r["source"], n, s, lo, hi))
    out = pd.DataFrame(rows, columns=["source", "n", "s", "lo_fp",
                                      "hi_fp"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


RANK_DRIFT_K = 50


def _q_text_rank_drift(sf_dir: str):
    """Corpus drift as rank agreement: Spearman rho ×10⁶ between two
    sources' frequency RANKS of the shared top-50 vocabulary (by
    combined count, tie word asc; rank within source by (count desc,
    word), absent words count 0) — the cheap leading indicator of
    distribution shift between shards. Word counts fold
    dictionary-sized; the rank/rho math runs on a 50-row frame."""
    import pandas as pd
    from .functions.grouped import grouped_count
    from .stages.dedup import _words_flat
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["source", "text"])

    def words(b: pa.Table) -> pa.Table:
        w, doc_of = _words_flat(b["text"])
        src = b["source"].to_numpy(zero_copy_only=False)
        return pa.table({"source": pa.array(src[doc_of]),
                         "word": pa.array(w)})

    c = grouped_count(docs.map_batches(words, batch_format="pyarrow",
                                       zero_copy_batch=True),
                      ["source", "word"], "n", 8).to_pandas()
    srcs = sorted(c["source"].unique())[:2]
    a, b_ = srcs[0], srcs[1]
    sub = c[c["source"].isin(srcs)]
    piv = sub.pivot_table(index="word", columns="source", values="n",
                          aggfunc="sum", fill_value=0)
    for s in srcs:
        if s not in piv:
            piv[s] = 0
    piv["tot"] = piv[a] + piv[b_]
    # deterministic top-K: (tot desc, word asc)
    top = piv.reset_index().sort_values(["tot", "word"],
                                        ascending=[False, True]) \
        .head(RANK_DRIFT_K)
    k = len(top)

    def ranks(col):
        o = top.sort_values([col, "word"],
                            ascending=[False, True]).reset_index()
        r = pd.Series(np.arange(1, k + 1, dtype=np.int64),
                      index=o["word"])
        return top["word"].map(r).to_numpy()

    d = ranks(a).astype(np.int64) - ranks(b_).astype(np.int64)
    sd2 = int((d * d).sum())
    den = k * (k * k - 1)
    num = den - 6 * sd2
    rho_fp = (10**6 * num) // den  # Python floor, matches corrected SQL
    return pd.DataFrame({"source_a": [a], "source_b": [b_],
                         "k": [k], "sum_d2": [sd2],
                         "rho_fp": [rho_fp]}).astype(
        {"k": "int64", "sum_d2": "int64", "rho_fp": "int64"})


def _q_emb_split_drift(sf_dir: str):
    """Centroid stability audit: per label, the exact squared distance
    between the even-vec_id and odd-vec_id half centroids, ×10⁶ via
    cross-multiplication (Σ(se·no − so·ne)² // (ne·no)²) — a two-sample
    drift check that needs no division inside the sum. |labels|×64
    fixed-point partials fold; the bigint fraction evaluates on the
    driver (HUGEINT in the SQL twin)."""
    import pandas as pd
    i64 = pa.int64()
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                columns=["vec_id", "embedding", "label"])

    def partial(b: pa.Table) -> pa.Table:
        e = b["embedding"].combine_chunks()
        d = len(e[0])
        m = np.floor(e.flatten().to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1e6).astype(np.int64) \
            .reshape(b.num_rows, d)
        lab = pc.cast(b["label"], i64).to_numpy(zero_copy_only=False)
        par = pc.cast(b["vec_id"], i64).to_numpy(zero_copy_only=False) % 2
        key = lab * 2 + par
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.zeros((len(uk), d), np.int64)
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table({
            "key": pa.array(np.repeat(uk, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(uk))),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(cnt, d))})

    p = emb.map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas() \
        .groupby(["key", "dim"], as_index=False).sum()
    rows = []
    for lab in sorted({k // 2 for k in p["key"].unique()}):
        ev = p[p["key"] == lab * 2].sort_values("dim")
        od = p[p["key"] == lab * 2 + 1].sort_values("dim")
        if len(ev) == 0 or len(od) == 0:
            continue
        ne = int(ev["n"].iloc[0])
        no = int(od["n"].iloc[0])
        se = ev["s"].to_numpy()
        so = od["s"].to_numpy()
        num = sum((int(a) * no - int(b) * ne) ** 2
                  for a, b in zip(se, so))
        rows.append((lab, ne, no, 10**6 * num // (ne * ne * no * no)))
    return pd.DataFrame(rows, columns=["label", "n_even", "n_odd",
                                       "dist2_fp"]).astype("int64")


def _q_ml_brier_score(sf_dir: str):
    """Brier score of the min-max-calibrated n_chars 'probability' of
    lang='en' — the proper scoring rule pairing ml_calibration_bins:
    p_fp = 10⁶·(x−mn)//(mx−mn), brier_sum = Σ(p_fp − 10⁶·y)² exactly.
    Pass 1 folds global min/max (2 ints/block); pass 2 folds the
    squared-error sum."""
    import pandas as pd
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["n_chars", "lang"])

    def mm(b: pa.Table) -> pa.Table:
        x = pc.cast(b["n_chars"], i64).to_numpy(zero_copy_only=False)
        return pa.table({"mn": pa.array([int(x.min())], i64),
                         "mx": pa.array([int(x.max())], i64)})

    mmp = docs.map_batches(mm, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    mn, mx = int(mmp["mn"].min()), int(mmp["mx"].max())
    rng = max(mx - mn, 1)

    def err(b: pa.Table) -> pa.Table:
        x = pc.cast(b["n_chars"], i64).to_numpy(zero_copy_only=False)
        y = pc.equal(b["lang"], "en").to_numpy(zero_copy_only=False)
        p = 10**6 * (x - mn) // rng
        d = p - 10**6 * y.astype(np.int64)
        return pa.table({"n": pa.array([b.num_rows], i64),
                         "se": pa.array([int((d * d).sum())], i64)})

    p = docs.map_batches(err, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    n, se = int(p["n"].sum()), int(p["se"].sum())
    return pd.DataFrame({"n": [n], "brier_sum": [se],
                         "brier_fp": [se // n]}).astype("int64")


def _q_kg_pred_fanout_p99(sf_dir: str):
    """Per-predicate p99 subject fan-out (exact ordinal at index
    99·(n−1)//100 of the sorted per-subject out-degrees) — the
    cardinality-rule miner behind 'pred X is (nearly) functional'.
    Per-(pred, subj) grouped count, then the ordinal pick from a
    (pred, fanout) HISTOGRAM cumsum — the second shuffle is
    distinct-fanout-sized."""
    from .functions.grouped import group_ids, grouped_count, \
        sorted_group_apply
    from .pipelines.kg import run_kg
    i64 = pa.int64()
    tri = run_kg(sf_dir)
    fo = grouped_count(tri.map_batches(
        lambda b: b.select(["pred", "subj"]), batch_format="pyarrow"),
        ["pred", "subj"], "fanout", 8)
    hist = grouped_count(fo.map_batches(
        lambda b: b.select(["pred", "fanout"]), batch_format="pyarrow"),
        ["pred", "fanout"], "n", 4)

    def p99(b: pa.Table) -> pa.Table:
        schema = pa.schema([("pred", pa.string()), ("n_subjects", i64),
                            ("p99_fanout", i64)])
        if b.num_rows == 0:
            return schema.empty_table()
        gid, starts = group_ids(b, ["pred"])
        f = b["fanout"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((f, gid))
        fs, ns, gd = f[order], n[order], gid[order]
        preds = b["pred"].to_numpy(zero_copy_only=False)
        rows = []
        for gi in range(len(starts)):
            s0 = int(np.searchsorted(gd, gi))
            e0 = int(np.searchsorted(gd, gi, "right"))
            tot = int(ns[s0:e0].sum())
            target = 99 * (tot - 1) // 100
            local = np.cumsum(ns[s0:e0])
            idx = int(np.searchsorted(local, target, side="right"))
            rows.append((preds[starts[gi]], tot, int(fs[s0 + idx])))
        pr, nsub, pf = zip(*rows)
        return pa.table({"pred": pa.array(list(pr)),
                         "n_subjects": pa.array(nsub, i64),
                         "p99_fanout": pa.array(pf, i64)}, schema=schema)

    return sorted_group_apply(hist, ["pred"], p99, num_partitions=1)


def _q_events_haar_energy(sf_dir: str):
    """Level-1/level-2 Haar wavelet energy of the daily event-count
    series (dense spine, odd tail dropped per level) — the integer
    signal decomposition separating day-to-day jitter (E1) from
    week-ish swings (E2): E_k = Σ(a_{2i} − a_{2i+1})² over level-k
    approximations a. The distributed fold is calendar-bounded; the
    transform is driver numpy."""
    import pandas as pd
    from .functions.grouped import sorted_aggregate
    i64 = pa.int64()
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts"])

    def daily(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(pc.cast(b["ts"], pa.timestamp("us")), i64),
                        86_400_000_000)
        return pa.table({"day": day,
                         "n": pa.array(np.ones(b.num_rows, np.int64))}) \
            .group_by(["day"], use_threads=False) \
            .aggregate([("n", "sum")]).rename_columns(["day", "n"])

    d = sorted_aggregate(ev.map_batches(daily, batch_format="pyarrow"),
                         ["day"], [("n", "sum")], ["day", "n"], 4) \
        .to_pandas().sort_values("day").reset_index(drop=True)
    day = d["day"].to_numpy().astype(np.int64)
    c = d["n"].to_numpy().astype(np.int64)
    spine = np.zeros(int(day[-1] - day[0] + 1), np.int64)
    spine[day - day[0]] = c
    a = spine
    energies = []
    for _ in range(2):
        m = len(a) // 2
        ev_, od_ = a[:2 * m:2], a[1:2 * m:2]
        energies.append(int(((ev_ - od_) ** 2).sum()))
        a = ev_ + od_
    return pd.DataFrame({
        "n_days": [len(spine)], "e1": [energies[0]],
        "e2": [energies[1]]}).astype("int64")


def _q_rel_kendall_tau(sf_dir: str):
    """Kendall tau-a between daily revenue and daily order count:
    concordant minus discordant over all day pairs, tau ×10⁶ //
    n(n−1)/2 — the rank-correlation complement of Spearman
    (rel_spearman) that needs no rank construction. Daily folds are
    calendar-bounded; the O(days²) comparison is vectorized driver
    numpy (the oracle pays the same pair join)."""
    import pandas as pd
    from .functions.grouped import sorted_aggregate
    i64 = pa.int64()
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"])

    def daily(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(pc.cast(b["o_orderdate"],
                                        pa.timestamp("us")), i64),
                        86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                        i64)
        return pa.table({"day": day, "cents": cents,
                         "n": pa.array(np.ones(b.num_rows, np.int64))}) \
            .group_by(["day"], use_threads=False) \
            .aggregate([("cents", "sum"), ("n", "sum")]) \
            .rename_columns(["day", "cents", "n"])

    d = sorted_aggregate(
        od.map_batches(daily, batch_format="pyarrow"),
        ["day"], [("cents", "sum"), ("n", "sum")],
        ["day", "cents", "n"], 8).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    x = d["cents"].to_numpy().astype(np.int64)
    y = d["n"].to_numpy().astype(np.int64)
    i, j = np.triu_indices(len(x), k=1)
    sx = np.sign(x[j] - x[i])
    sy = np.sign(y[j] - y[i])
    conc = int(((sx * sy) > 0).sum())
    disc = int(((sx * sy) < 0).sum())
    n0 = len(i)
    num = conc - disc
    tau = 10**6 * num // n0  # Python floor; SQL twin corrects trunc
    return pd.DataFrame({
        "n_days": [len(x)], "concordant": [conc], "discordant": [disc],
        "tau_fp": [tau]}).astype("int64")


def _q_kg_sameas_rewrite(sf_dir: str):
    """Entity-resolution rewrite applied to the graph: mention edges
    re-targeted through sameAs (turn —mentions→ mention-node becomes
    turn→ENTITY), counted per resolved entity — the 'query the KG by
    real-world entity' view. The sameAs map is vocabulary-bounded, so
    it broadcasts in the rewrite closure; mention edges stream."""
    from .functions.grouped import grouped_count
    from .pipelines.kg import run_kg
    tri = run_kg(sf_dir).materialize()
    sa = tri.filter(expr=f"pred == '{C.PRED_SAME_AS}'") \
        .map_batches(lambda b: pa.table({"m": b["subj"], "e": b["obj"]}),
                     batch_format="pyarrow").to_pandas()
    m2e = dict(zip(sa["m"], sa["e"]))
    keys = pa.array(sorted(m2e), pa.string())
    vals = np.array([m2e[k] for k in sorted(m2e)], dtype=object)

    def rewrite(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["pred"], C.PRED_MENTIONS))
        if t.num_rows == 0:
            return pa.schema([("entity", pa.string())]).empty_table()
        obj = t["obj"].combine_chunks()
        idx = pc.index_in(obj, value_set=keys)
        hit = pc.is_valid(idx)
        ii = idx.to_numpy(zero_copy_only=False)
        sel = hit.to_numpy(zero_copy_only=False)
        return pa.table({"entity": pa.array(
            vals[ii[sel].astype(np.int64)], pa.string())})

    ent = tri.map_batches(rewrite, batch_format="pyarrow",
                          zero_copy_batch=True)
    return grouped_count(ent, ["entity"], "n", 4).sort("entity")


def _q_ml_point_biserial(sf_dir: str):
    """Point-biserial correlation of n_chars with lang='en', sqrt-free:
    sign + r² ×10⁶ = 10⁶·(n·Σxy − Σx·Σy)² // ((n·Σx² − (Σx)²)·(n·Σy −
    (Σy)²)) — the feature-vs-binary-target screen (corr_matrix covers
    numeric×numeric). Five integer moments fold per block; the bigint
    fraction evaluates on the driver."""
    import pandas as pd
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["n_chars", "lang"])

    def mom(b: pa.Table) -> pa.Table:
        x = pc.cast(b["n_chars"], i64).to_numpy(zero_copy_only=False)
        y = pc.equal(b["lang"], "en").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"n": pa.array([len(x)], i64),
                         "sx": pa.array([int(x.sum())], i64),
                         "sx2": pa.array([int((x * x).sum())], i64),
                         "sy": pa.array([int(y.sum())], i64),
                         "sxy": pa.array([int((x * y).sum())], i64)})

    p = docs.map_batches(mom, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    n, sx, sx2 = int(p["n"].sum()), int(p["sx"].sum()), int(p["sx2"].sum())
    sy, sxy = int(p["sy"].sum()), int(p["sxy"].sum())
    num = n * sxy - sx * sy
    vx = n * sx2 - sx * sx
    vy = n * sy - sy * sy  # y binary: Σy² = Σy
    den = max(vx * vy, 1)
    return pd.DataFrame({
        "n": [n], "sign": [(num > 0) - (num < 0)],
        "r2_fp": [10**6 * num * num // den]}).astype("int64")


ALARM_HI_CENTS = 15000
ALARM_LO_CENTS = 1000


def _q_events_hysteresis_alarms(sf_dir: str):
    """Hysteresis alarm counting (Schmitt-trigger semantics): an alarm
    FIRES on a value above HI only if the latest prior boundary
    excursion (above HI or below LO) in that user's stream was a
    clear (< LO) or absent — re-fires above HI do not re-alarm until
    the signal drops below LO. Sequential state collapses to one LAG
    over the boundary-row subsequence, so it stays vectorized in
    complete sorted user groups."""
    from .functions.grouped import group_ids, sorted_group_apply
    i64 = pa.int64()
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "user_id", "ts",
                                        "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": pc.cast(pc.cast(b["ts"], pa.timestamp("us")), i64),
            "event_id": b["event_id"],
            "cents": pc.cast(pc.round(pc.multiply(b["value"], 100.0)),
                             i64)})

    def alarms(b: pa.Table) -> pa.Table:
        schema = pa.schema([("user_id", i64), ("n_alarms", i64)])
        if b.num_rows == 0:
            return schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        c = b["cents"].to_numpy(zero_copy_only=False)
        bd = (c > ALARM_HI_CENTS) | (c < ALARM_LO_CENTS)
        if not bd.any():
            return schema.empty_table()
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, gid))
        ob = order[bd[order]]
        og, oc = gid[ob], c[ob]
        ishi = oc > ALARM_HI_CENTS
        first = np.empty(len(ob), bool)
        first[0] = True
        first[1:] = og[1:] != og[:-1]
        prev_hi = np.empty(len(ob), bool)
        prev_hi[1:] = ishi[:-1]
        fire = ishi & (first | (~first & ~prev_hi))
        uid = b["user_id"].to_numpy(zero_copy_only=False)[ob]
        cnt = np.zeros(int(og.max()) + 1, np.int64)
        np.add.at(cnt, og[fire], 1)
        nz = np.unique(og[fire])
        first_row = np.searchsorted(og, nz)
        return pa.table({"user_id": pa.array(uid[first_row], i64),
                         "n_alarms": pa.array(cnt[nz], i64)},
                        schema=schema)

    return sorted_group_apply(
        ev.map_batches(prep, batch_format="pyarrow"), ["user_id"],
        alarms, num_partitions=4).sort("user_id")


WJ_THRESHOLD_FP = 400_000


def _q_dedup_weighted_jaccard(sf_dir: str):
    """IDF-weighted Jaccard near-dups: shingle weight 10⁶ // df, pair
    score Σ_shared w / (Σ_a w + Σ_b w − Σ_shared w) — rare-shingle
    overlap counts more than boilerplate (the uniform-weight variant is
    dedup_ngram_jaccard; the scale path stays minhash). ONE shingle
    sort yields df, pair weight sums AND per-doc totals (totals ride as
    doc_b = −1 marker rows); totals join back via two int-key
    attaches."""
    import pandas as pd
    from .functions.grouped import _pair_index_arrays, group_ids, \
        sorted_aggregate, sorted_group_apply
    from .functions.joins import attach_column
    from .stages.dedup import _distinct_doc_shingles
    i64 = pa.int64()
    docs = _docs(sf_dir)

    def postings(b: pa.Table) -> pa.Table:
        doc_idx, codes, dic = _distinct_doc_shingles(b["text"])
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        if len(doc_idx) == 0:
            return pa.schema([("s", pa.string()),
                              ("doc_id", i64)]).empty_table()
        return pa.table({"s": pc.take(dic, pa.array(codes)),
                         "doc_id": pa.array(did[doc_idx], i64)})

    post = docs.map_batches(postings, batch_format="pyarrow",
                            zero_copy_batch=True)

    def expand(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("doc_a", i64), ("doc_b", i64),
                                ("w", i64)])
        if b.num_rows == 0:
            return out_schema.empty_table()
        gid, starts = group_ids(b, ["s"])
        sizes = np.diff(np.append(starts, b.num_rows))
        wgrp = 10**6 // sizes
        ids = b["doc_id"].combine_chunks().to_numpy()
        tot = pa.table({"doc_a": pa.array(ids),
                        "doc_b": pa.array(np.full(len(ids), -1,
                                                  np.int64)),
                        "w": pa.array(wgrp[gid])})
        sel, first, second = _pair_index_arrays(gid, ids, None, None,
                                                "shingle")
        if len(first) == 0:
            pairs = out_schema.empty_table()
        else:
            d, gs = ids[sel], gid[sel]
            pairs = pa.table({"doc_a": pa.array(d[first]),
                              "doc_b": pa.array(d[second]),
                              "w": pa.array(wgrp[gs[second]])})
        both = pa.concat_tables([tot, pairs])
        return both.group_by(["doc_a", "doc_b"], use_threads=False) \
            .aggregate([("w", "sum")]) \
            .rename_columns(["doc_a", "doc_b", "w"])

    agg = sorted_aggregate(
        sorted_group_apply(post, ["s"], expand, num_partitions=8),
        ["doc_a", "doc_b"], [("w", "sum")], ["doc_a", "doc_b", "w"],
        8).materialize()
    totals = agg.filter(expr="doc_b == -1").map_batches(
        lambda b: pa.table({"doc_id": b["doc_a"], "tw": b["w"]}),
        batch_format="pyarrow")
    pairs = agg.filter(expr="doc_b >= 0")
    pairs = attach_column(pairs, totals,
                          [("doc_a", i64), ("doc_b", i64), ("w", i64)],
                          "doc_a", "doc_id", "tw", "ta", i64, 4)
    pairs = attach_column(pairs, totals,
                          [("doc_a", i64), ("doc_b", i64), ("w", i64),
                           ("ta", i64)],
                          "doc_b", "doc_id", "tw", "tb", i64, 4)

    def score(b: pa.Table) -> pa.Table:
        wi = b["w"].to_numpy(zero_copy_only=False)
        ta = b["ta"].to_numpy(zero_copy_only=False)
        tb = b["tb"].to_numpy(zero_copy_only=False)
        fp = 10**6 * wi // (ta + tb - wi)
        t = b.append_column("wj_fp", pa.array(fp, i64))
        return t.filter(pa.array(fp >= WJ_THRESHOLD_FP)) \
            .select(["doc_a", "doc_b", "w", "wj_fp"])

    df = pairs.map_batches(score, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if df.empty:
        df = pd.DataFrame({c: pd.Series(dtype="int64")
                           for c in ["doc_a", "doc_b", "w", "wj_fp"]})
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _q_rel_ledger_reconcile(sf_dir: str):
    """Ledger reconciliation: per-order header total vs the sum of its
    line amounts round(extprice·(1−disc)·(1+tax)·100) — the
    data-quality gate before any revenue rollup is trusted. Line sums
    fold per order (int-key grouped), header cents attach via one
    co-group; the report collapses to sign counts + total |diff|."""
    import pandas as pd
    from .functions.grouped import sorted_aggregate
    from .functions.joins import attach_column
    i64 = pa.int64()
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"])

    def amounts(b: pa.Table) -> pa.Table:
        # half-UP via floor(x + 0.5): pc.round is half-even but DuckDB
        # round() is half-away — line amounts (unlike 2-dp prices) DO
        # land on exact .5 cents, so the tie rule must be pinned
        v = (b["l_extendedprice"].to_numpy(zero_copy_only=False)
             * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
             * (1.0 + b["l_tax"].to_numpy(zero_copy_only=False)))
        amt = pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64))
        return pa.table({"ok": pc.cast(b["l_orderkey"], i64),
                         "amt": amt}) \
            .group_by(["ok"], use_threads=False) \
            .aggregate([("amt", "sum")]).rename_columns(["ok", "amt"])

    lsum = sorted_aggregate(
        li.map_batches(amounts, batch_format="pyarrow"),
        ["ok"], [("amt", "sum")], ["ok", "line_cents"], 8)
    hdr = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice"]).map_batches(
        lambda b: pa.table({
            "ok": pc.cast(b["o_orderkey"], i64),
            "hdr_cents": pc.cast(pc.round(pc.multiply(
                b["o_totalprice"], 100.0)), i64)}),
        batch_format="pyarrow")
    j = attach_column(lsum, hdr, [("ok", i64), ("line_cents", i64)],
                      "ok", "ok", "hdr_cents", "hdr_cents", i64, 8)

    def fold(b: pa.Table) -> pa.Table:
        d = (b["hdr_cents"].to_numpy(zero_copy_only=False)
             - b["line_cents"].to_numpy(zero_copy_only=False))
        return pa.table({
            "n_orders": pa.array([b.num_rows], i64),
            "n_over": pa.array([int((d > 0).sum())], i64),
            "n_under": pa.array([int((d < 0).sum())], i64),
            "n_exact": pa.array([int((d == 0).sum())], i64),
            "abs_diff_cents": pa.array([int(np.abs(d).sum())], i64)})

    p = j.map_batches(fold, batch_format="pyarrow",
                      zero_copy_batch=True).to_pandas()
    return pd.DataFrame({c: [int(p[c].sum())] for c in
                         ["n_orders", "n_over", "n_under", "n_exact",
                          "abs_diff_cents"]}).astype("int64")


def _q_events_new_vs_returning(sf_dir: str):
    """Daily new-vs-returning user split: per day, events from users
    seen for the first time that day vs users with history — the
    acquisition/retention headline. First-seen day is one grouped min
    (user-bounded); the tag rides back onto events via an int-key
    attach, then a calendar-bounded grouped count."""
    from .functions.grouped import sorted_aggregate
    from .functions.joins import attach_column
    i64 = pa.int64()
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts"]).map_batches(
        lambda b: pa.table({
            "user_id": pc.cast(b["user_id"], i64),
            "day": pc.divide(pc.cast(pc.cast(b["ts"], pa.timestamp("us")),
                                     i64), 86_400_000_000)}),
        batch_format="pyarrow").materialize()
    first = sorted_aggregate(ev, ["user_id"], [("day", "min")],
                             ["user_id", "first_day"], 4)
    tagged = attach_column(ev, first, [("user_id", i64), ("day", i64)],
                           "user_id", "user_id", "first_day",
                           "first_day", i64, 4)

    def counts(b: pa.Table) -> pa.Table:
        new = pc.equal(b["day"], b["first_day"])
        return pa.table({
            "day": b["day"],
            "n_new": pc.cast(new, i64),
            "n_returning": pc.cast(pc.invert(new), i64)}) \
            .group_by(["day"], use_threads=False) \
            .aggregate([("n_new", "sum"), ("n_returning", "sum")]) \
            .rename_columns(["day", "n_new", "n_returning"])

    return sorted_aggregate(
        tagged.map_batches(counts, batch_format="pyarrow"),
        ["day"], [("n_new", "sum"), ("n_returning", "sum")],
        ["day", "n_new", "n_returning"], 2)


SPELL_QUERIES = ("scann", "merg", "batchh")


def _q_search_spell_suggest(sf_dir: str):
    """Did-you-mean suggestions: for each misspelled query, the corpus
    word within Levenshtein distance 1 with the highest frequency
    (ties alphabetical) — FastSS deletion-neighborhood matching (the
    ed1-pairs machinery pointed at a query), so no per-word edit-
    distance scan: the query's ≤|q|+1 deletion keys broadcast and meet
    the vocabulary's keys in one vectorized pass over the frequency
    dictionary."""
    import pandas as pd
    from .functions.grouped import grouped_count
    from .stages.dedup import _words_flat

    def del_neighborhood(w: str) -> set[str]:
        return {w} | {w[:i] + w[i + 1:] for i in range(len(w))}

    qnb = {q: del_neighborhood(q) for q in SPELL_QUERIES}

    def words(b: pa.Table) -> pa.Table:
        w, _ = _words_flat(b["text"])
        return pa.table({"word": pa.array(w)})

    freq = grouped_count(_docs(sf_dir).map_batches(
        words, batch_format="pyarrow", zero_copy_batch=True),
        ["word"], "n", 8).to_pandas()
    # FastSS index over the frequency dictionary: deletion-key -> words
    # (one pass over the vocab, which is dictionary-sized); each query
    # then probes its <=|q|+1 keys and exact-verifies ed<=1.
    index: dict[str, list[int]] = {}
    vocab = freq["word"].to_numpy()
    cnt = freq["n"].to_numpy().astype(np.int64)
    for wi, w in enumerate(vocab):
        for k in del_neighborhood(w):
            index.setdefault(k, []).append(wi)
    rows = []
    for q in SPELL_QUERIES:
        cand = sorted({wi for k in qnb[q] for wi in index.get(k, ())})
        best = None
        for wi in cand:
            w, c = vocab[wi], int(cnt[wi])
            if abs(len(w) - len(q)) <= 1 and _ed1_ok(q, w):
                key = (-c, w)
                if best is None or key < best[0]:
                    best = (key, w, c)
        rows.append((q, best[1], best[2]) if best else (q, "", 0))
    return pd.DataFrame(rows, columns=["query", "suggestion", "n"]) \
        .astype({"n": "int64"})


def _ed1_ok(a: str, b: str) -> bool:
    """Exact Levenshtein <= 1 (lengths within 1 assumed by caller)."""
    if a == b:
        return True
    if len(a) == len(b):
        return sum(x != y for x, y in zip(a, b)) <= 1
    s, t = (a, b) if len(a) < len(b) else (b, a)
    i = 0
    while i < len(s) and s[i] == t[i]:
        i += 1
    return s[i:] == t[i + 1:]


MINK_QI_BUCKET = 50


def _q_privacy_min_k_report(sf_dir: str):
    """Minimum-k report: the release's effective k-anonymity level (the
    SMALLEST QI class size over (lang, source, n_chars//50)) plus the
    five smallest classes — the headline number a privacy review asks
    for first. Distinct QI classes shuffle; the 5-row head comes off
    the pruned per-key sort."""
    from .functions.grouped import grouped_count
    from .functions.topn import top_n_per_key
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["lang", "source", "n_chars"])
    qi = docs.map_batches(lambda b: pa.table({
        "lang": b["lang"], "source": b["source"],
        "bucket": pc.divide(pc.cast(b["n_chars"], i64),
                            MINK_QI_BUCKET)}), batch_format="pyarrow")
    classes = grouped_count(qi, ["lang", "source", "bucket"], "sz", 4) \
        .map_batches(lambda b: b.append_column(
            "one", pa.array(np.zeros(b.num_rows, np.int64))),
            batch_format="pyarrow")
    top = top_n_per_key(classes, ["one"],
                        [("sz", True), ("lang", True), ("source", True),
                         ("bucket", True)], 5, num_partitions=2)
    return top.map_batches(lambda b: b.select(
        ["lang", "source", "bucket", "sz", "rank"]),
        batch_format="pyarrow")


def _q_rel_date_fk_audit(sf_dir: str):
    """Temporal-integrity audit: lineitems shipped BEFORE their order's
    date, per year — the cross-table invariant check (rel_fk_audit
    covers key existence; this covers ordering). Order dates attach to
    lineitems through ONE int-key co-group; violations fold per
    year."""
    from .functions.grouped import sorted_aggregate
    from .functions.joins import attach_column
    i64 = pa.int64()
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"]).map_batches(
        lambda b: pa.table({
            "ok": pc.cast(b["l_orderkey"], i64),
            "sday": pc.divide(pc.cast(pc.cast(b["l_shipdate"],
                                              pa.timestamp("us")), i64),
                              86_400_000_000)}), batch_format="pyarrow")
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda b: pa.table({
            "ok": pc.cast(b["o_orderkey"], i64),
            "oday": pc.divide(pc.cast(pc.cast(b["o_orderdate"],
                                              pa.timestamp("us")), i64),
                              86_400_000_000)}), batch_format="pyarrow")
    j = attach_column(li, od, [("ok", i64), ("sday", i64)],
                      "ok", "ok", "oday", "oday", i64, 8)

    def fold2(b: pa.Table) -> pa.Table:
        s = b["sday"].to_numpy(zero_copy_only=False)
        o = b["oday"].to_numpy(zero_copy_only=False)
        yr = (np.array(s, dtype="datetime64[D]")
              .astype("datetime64[Y]").astype(np.int64) + 1970)
        return pa.table({"year": pa.array(yr, i64),
                         "n": pa.array(np.ones(len(s), np.int64)),
                         "n_viol": pa.array((s < o).astype(np.int64))}) \
            .group_by(["year"], use_threads=False) \
            .aggregate([("n", "sum"), ("n_viol", "sum")]) \
            .rename_columns(["year", "n", "n_viol"])

    return sorted_aggregate(
        j.map_batches(fold2, batch_format="pyarrow"),
        ["year"], [("n", "sum"), ("n_viol", "sum")],
        ["year", "n", "n_viol"], 2)


def _q_ml_permutation_importance(sf_dir: str):
    """Deterministic permutation importance of the n_chars stump: full-
    set accuracy with the true feature vs the feature CYCLED one doc
    forward in doc_id order (a fixed derangement standing in for a
    random permutation — reproducible on both engines via lead());
    drop_fp is the importance. Global order comes from
    zip_with_index."""
    import pandas as pd
    from .functions.joins import zip_with_index
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "n_chars", "lang"]) \
        .materialize()
    n = docs.count()
    ranked = zip_with_index(docs.sort("doc_id"), id_col="__rank",
                            order_by="doc_id").materialize()
    # shifted feature for rank r is x at rank (r+1) mod n
    from .functions.joins import attach_column
    shifted_src = ranked.map_batches(lambda b: pa.table({
        "rank": pa.array(
            (b["__rank"].to_numpy(zero_copy_only=False) - 1) % n),
        "x_shift": pc.cast(b["n_chars"], i64)}), batch_format="pyarrow")
    base = ranked.map_batches(lambda b: pa.table({
        "rank": b["__rank"], "x": pc.cast(b["n_chars"], i64),
        "y": pc.cast(pc.equal(b["lang"], "en"), i64)}),
        batch_format="pyarrow")
    j = attach_column(base, shifted_src,
                      [("rank", i64), ("x", i64), ("y", i64)],
                      "rank", "rank", "x_shift", "x_shift", i64, 4)

    def accs(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        xs = b["x_shift"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([b.num_rows], i64),
            "ok_true": pa.array(
                [int(((x >= KAPPA_CHAR_MIN) == (y == 1)).sum())], i64),
            "ok_shift": pa.array(
                [int(((xs >= KAPPA_CHAR_MIN) == (y == 1)).sum())], i64)})

    p = j.map_batches(accs, batch_format="pyarrow",
                      zero_copy_batch=True).to_pandas()
    nn = int(p["n"].sum())
    a_t = 10**6 * int(p["ok_true"].sum()) // nn
    a_s = 10**6 * int(p["ok_shift"].sum()) // nn
    return pd.DataFrame({"n": [nn], "acc_fp": [a_t],
                         "acc_shifted_fp": [a_s],
                         "drop_fp": [a_t - a_s]}).astype("int64")


def _q_events_mann_kendall(sf_dir: str):
    """Mann–Kendall trend statistic over daily event counts: S =
    Σ_{i<j} sign(c_j − c_i) (time order) plus the exact variance
    NUMERATOR 18·Var = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) over tie groups
    — the standard monotone-trend test, sqrt-free. Calendar-bounded
    driver math after the distributed daily fold."""
    import pandas as pd
    from .functions.grouped import sorted_aggregate
    i64 = pa.int64()
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts"])

    def daily(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(pc.cast(b["ts"], pa.timestamp("us")), i64),
                        86_400_000_000)
        return pa.table({"day": day,
                         "n": pa.array(np.ones(b.num_rows, np.int64))}) \
            .group_by(["day"], use_threads=False) \
            .aggregate([("n", "sum")]).rename_columns(["day", "n"])

    d = sorted_aggregate(ev.map_batches(daily, batch_format="pyarrow"),
                         ["day"], [("n", "sum")], ["day", "n"], 4) \
        .to_pandas().sort_values("day").reset_index(drop=True)
    c = d["n"].to_numpy().astype(np.int64)
    n = len(c)
    i, j = np.triu_indices(n, k=1)
    s = int(np.sign(c[j] - c[i]).sum())
    _, tie_counts = np.unique(c, return_counts=True)
    ties = int(sum(int(t) * (t - 1) * (2 * t + 5)
                   for t in tie_counts if t > 1))
    var18 = n * (n - 1) * (2 * n + 5) - ties
    return pd.DataFrame({"n_days": [n], "s": [s],
                         "var18": [var18]}).astype("int64")


def _q_emb_isotropy(sf_dir: str):
    """Embedding isotropy: the mean pairwise dot product over ALL
    n(n−1) ordered pairs WITHOUT enumerating pairs — Σ_{i≠j} vᵢ·vⱼ =
    ‖Σv‖² − Σ‖v‖² over fixed-point components floor(x·10⁶), exact
    integers end to end (sqrt-free, unlike a cosine mean). A clumped
    (anisotropic) space sits far from 0. Per-dim component sums and
    the norm total fold per block; the closed form evaluates in Python
    bigints (HUGEINT in the twin). mean_dot_fp is ×10⁶ (the 10¹²
    product scale divided back once)."""
    import pandas as pd
    i64 = pa.int64()
    emb = _emb(sf_dir)

    def parts(b: pa.Table) -> pa.Table:
        e = b["embedding"].combine_chunks()
        d = len(e[0])
        m = np.floor(e.flatten().to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1e6).astype(np.int64) \
            .reshape(b.num_rows, d)
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "s": pa.array(m.sum(axis=0)),
            "n": pa.array(np.full(d, b.num_rows, np.int64)),
            "norm2": pa.array((m * m).sum(axis=0))})

    p = emb.map_batches(parts, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas() \
        .groupby("dim", as_index=False).sum()
    n = int(p["n"].iloc[0])  # per-dim block partials sum to total vecs
    s = p["s"].to_numpy()
    sum_norm2 = int(p["norm2"].sum())  # per-dim m² column sums re-sum
    tot = int(sum(int(x) ** 2 for x in s)) - sum_norm2
    pairs = n * (n - 1)
    # tot itself can exceed int64 — only the scaled mean is emitted
    return pd.DataFrame({
        "n_vecs": [n],
        "mean_dot_fp": [tot // (pairs * 10**6)]}).astype("int64")


HIER_BUDGET = 10_000


def _q_rel_hierarchical_alloc(sf_dir: str):
    """Two-level hierarchical budget allocation: 10 000 units split
    across REGIONS by revenue (largest-remainder), then each region's
    share split across its NATIONS the same way — the cascading
    apportionment every planning rollup needs (rel_apportion_budget is
    the one-level primitive). Revenue folds distributed; both
    allocation rounds run on |regions| / |nations| rows."""
    import pandas as pd
    from .functions.grouped import sorted_aggregate
    from .functions.joins import attach_column
    i64 = pa.int64()
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda b: pa.table({"ck": pc.cast(b["c_custkey"], i64),
                            "nk": pc.cast(b["c_nationkey"], i64)}),
        batch_format="pyarrow")
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"]).map_batches(
        lambda b: pa.table({
            "ck": pc.cast(b["o_custkey"], i64),
            "cents": pc.cast(pc.round(pc.multiply(
                b["o_totalprice"], 100.0)), i64)}),
        batch_format="pyarrow")
    withnat = attach_column(od, cust, [("ck", i64), ("cents", i64)],
                            "ck", "ck", "nk", "nk", i64, 8)
    pernat = sorted_aggregate(
        withnat.map_batches(lambda b: pa.table(
            {"nk": b["nk"], "cents": b["cents"]})
            .group_by(["nk"], use_threads=False)
            .aggregate([("cents", "sum")]).rename_columns(
                ["nk", "cents"]), batch_format="pyarrow"),
        ["nk"], [("cents", "sum")], ["nk", "cents"], 2).to_pandas()
    import pyarrow.parquet as pq
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")) \
        .to_pandas()  # 25 rows: driver tiny-table (reference S3 shape)
    m = pernat.merge(nat, left_on="nk", right_on="n_nationkey")

    def largest_remainder(weights, budget, tie_keys):
        tw = int(sum(weights))
        floor_a = [budget * int(w) // tw for w in weights]
        rem = [budget * int(w) - f * tw for w, f in zip(weights,
                                                        floor_a)]
        left = budget - sum(floor_a)
        order = sorted(range(len(weights)),
                       key=lambda i: (-rem[i], tie_keys[i]))
        out = list(floor_a)
        for i in order[:left]:
            out[i] += 1
        return out

    per_region = m.groupby("n_regionkey", as_index=False)["cents"].sum() \
        .sort_values("n_regionkey").reset_index(drop=True)
    ralloc = largest_remainder(per_region["cents"].tolist(), HIER_BUDGET,
                               per_region["n_regionkey"].tolist())
    rmap = dict(zip(per_region["n_regionkey"], ralloc))
    rows = []
    for rk, grp in m.sort_values("nk").groupby("n_regionkey"):
        nalloc = largest_remainder(grp["cents"].tolist(), rmap[rk],
                                   grp["nk"].tolist())
        for (_, r), a in zip(grp.iterrows(), nalloc):
            rows.append((int(rk), int(r["nk"]), int(r["cents"]), a))
    out = pd.DataFrame(rows, columns=["regionkey", "nationkey", "cents",
                                      "alloc"]).astype("int64")
    return out.sort_values(["regionkey", "nationkey"]) \
        .reset_index(drop=True)


def _q_events_fano_factor(sf_dir: str):
    """Fano factor (variance-to-mean of daily counts) per event type —
    the burstiness index: 1 for Poisson, >1 for bursty: fano_fp =
    10⁶·(nΣx² − (Σx)²) // (n·Σx) exactly over the DENSE calendar spine
    (zero days count). Calendar × |types| bounded fold."""
    import pandas as pd
    from .functions.grouped import grouped_count
    i64 = pa.int64()
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts", "event_type"]).map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "day": pc.divide(pc.cast(pc.cast(b["ts"], pa.timestamp("us")),
                                     i64), 86_400_000_000)}),
        batch_format="pyarrow")
    c = grouped_count(ev, ["event_type", "day"], "x", 4).to_pandas()
    d0, d1 = int(c["day"].min()), int(c["day"].max())
    span = d1 - d0 + 1
    rows = []
    for et, g in c.groupby("event_type"):
        x = g["x"].to_numpy().astype(np.int64)
        n = span  # zero days included
        sx = int(x.sum())
        sx2 = int((x * x).sum())
        num = n * sx2 - sx * sx
        rows.append((et, n, sx, 10**6 * num // (n * sx)))
    return pd.DataFrame(rows, columns=["event_type", "n_days",
                                       "n_events", "fano_fp"]) \
        .astype({"n_days": "int64", "n_events": "int64",
                 "fano_fp": "int64"}) \
        .sort_values("event_type").reset_index(drop=True)


def _q_events_max_type_run(sf_dir: str):
    """Longest run of identical consecutive event types per user (the
    stuck-in-a-loop / bot-behavior signal): run boundaries are one
    shifted compare inside complete sorted user groups; per-user max
    via one grouped fold."""
    from .functions.grouped import group_ids, sorted_group_apply
    i64 = pa.int64()
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "user_id", "ts",
                                        "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": pc.cast(pc.cast(b["ts"], pa.timestamp("us")), i64),
            "event_id": b["event_id"], "event_type": b["event_type"]})

    def runs(b: pa.Table) -> pa.Table:
        schema = pa.schema([("user_id", i64), ("max_run", i64),
                            ("run_type", pa.string())])
        if b.num_rows == 0:
            return schema.empty_table()
        gid, starts = group_ids(b, ["user_id"])
        order = np.lexsort((b["event_id"].to_numpy(zero_copy_only=False),
                            b["ts_us"].to_numpy(zero_copy_only=False),
                            gid))
        et = b["event_type"].to_numpy(zero_copy_only=False)[order]
        og = gid[order]
        new_run = np.empty(len(og), bool)
        new_run[0] = True
        new_run[1:] = (og[1:] != og[:-1]) | (et[1:] != et[:-1])
        rid = np.cumsum(new_run) - 1
        run_len = np.bincount(rid).astype(np.int64)
        run_user = og[new_run]
        run_type = et[new_run]
        # per user: max run length, tie -> lexicographically smallest type
        order2 = np.lexsort((run_type, -run_len, run_user))
        ru, rl, rt = run_user[order2], run_len[order2], run_type[order2]
        first = np.empty(len(ru), bool)
        first[0] = True
        first[1:] = ru[1:] != ru[:-1]
        uid = b["user_id"].to_numpy(zero_copy_only=False)[order][new_run]
        return pa.table({"user_id": pa.array(uid[order2][first], i64),
                         "max_run": pa.array(rl[first]),
                         "run_type": pa.array(rt[first])}, schema=schema)

    return sorted_group_apply(
        ev.map_batches(prep, batch_format="pyarrow"), ["user_id"],
        runs, num_partitions=4).sort("user_id")


def _q_kg_sparql_unbound_filter(sf_dir: str):
    """SPARQL FILTER(!bound(?tool)): {?t :mentions ?m . OPTIONAL {?t
    :usesTool ?tool} FILTER(!bound(?tool))} — mentions arising in turns
    with NO tool call (the organic-vs-tool-driven mention split; most
    turns carry no tool, so the filter bites non-vacuously). The
    engine's null-free unbound ('') makes !bound a plain equality
    filter over the OPTIONAL left join; output counts per mention."""
    from .functions.bgp import bgp_match
    from .functions.grouped import grouped_count
    from .pipelines.kg import run_kg
    b = bgp_match(run_kg(sf_dir),
                  [("?t", C.PRED_MENTIONS, "?m")],
                  ["t", "m"], num_partitions=8,
                  optional_patterns=[("?t", C.PRED_USES_TOOL, "?tool")],
                  filters=[("tool", "==", "")])
    return grouped_count(b.map_batches(
        lambda t: t.select(["m"]), batch_format="pyarrow"),
        ["m"], "n_turns", 4).sort("m")


def _q_kg_sparql_exists_filter(sf_dir: str):
    """SPARQL FILTER EXISTS: {?t :usesTool ?tool . FILTER EXISTS {?t
    :mentions ?m}} — tool usage counted only over turns that ALSO
    mention an entity (functions/bgp.bgp_filter_exists: a semi-join on
    the shared variable that binds nothing, unlike chaining the
    pattern). Distinct-key right side keeps the co-group 1:1."""
    from .functions.bgp import bgp_filter_exists, bgp_match
    from .functions.grouped import grouped_count
    from .pipelines.kg import run_kg
    tri = run_kg(sf_dir).materialize()
    b = bgp_match(tri, [("?t", C.PRED_USES_TOOL, "?tool")],
                  ["t", "tool"], num_partitions=8)
    kept = bgp_filter_exists(tri, b, ("?t", C.PRED_MENTIONS, "?m"),
                             num_partitions=4)
    return grouped_count(kept.map_batches(
        lambda t: t.select(["tool"]), batch_format="pyarrow"),
        ["tool"], "n_turns", 2).sort("tool")


def _q_text_simpson_diversity(sf_dir: str):
    """Simpson diversity (repeat-probability) per source: λ ×10⁶ =
    10⁶·Σn(n−1) // (N(N−1)) over word counts — the quadratic
    complement of the entropy family (exact, no logs). Dictionary-sized
    fold per source."""
    import pandas as pd
    from .functions.grouped import grouped_count
    from .stages.dedup import _words_flat
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["source", "text"])

    def words(b: pa.Table) -> pa.Table:
        w, doc_of = _words_flat(b["text"])
        src = b["source"].to_numpy(zero_copy_only=False)
        return pa.table({"source": pa.array(src[doc_of]),
                         "word": pa.array(w)})

    c = grouped_count(docs.map_batches(words, batch_format="pyarrow",
                                       zero_copy_batch=True),
                      ["source", "word"], "n", 8).to_pandas()
    rows = []
    for src, g in c.groupby("source"):
        n = g["n"].to_numpy().astype(np.int64)
        big_n = int(n.sum())
        rep = int((n * (n - 1)).sum())
        rows.append((src, big_n, rep,
                     10**6 * rep // (big_n * (big_n - 1))))
    return pd.DataFrame(rows, columns=["source", "n_tokens", "n_repeat",
                                       "simpson_fp"]) \
        .astype({"n_tokens": "int64", "n_repeat": "int64",
                 "simpson_fp": "int64"}) \
        .sort_values("source").reset_index(drop=True)


def _q_rel_xyz_classification(sf_dir: str):
    """XYZ variability classes per part (the ABC analysis' second
    axis): CV² = (nΣq²−(Σq)²)/(Σq)² compared CROSS-MULTIPLIED against
    1/4 and 1 — X (steady) / Y / Z (erratic) with zero square roots.
    Per-part moment partials fold; only class counts leave."""
    import pandas as pd
    from .functions.grouped import sorted_aggregate
    i64 = pa.int64()
    li = ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_partkey", "l_quantity"])

    def mom(b: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(b["l_quantity"]), i64) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"pk": pc.cast(b["l_partkey"], i64),
                         "n": pa.array(np.ones(len(q), np.int64)),
                         "sq": pa.array(q), "sq2": pa.array(q * q)}) \
            .group_by(["pk"], use_threads=False) \
            .aggregate([("n", "sum"), ("sq", "sum"), ("sq2", "sum")]) \
            .rename_columns(["pk", "n", "sq", "sq2"])

    per = sorted_aggregate(
        li.map_batches(mom, batch_format="pyarrow"),
        ["pk"], [("n", "sum"), ("sq", "sum"), ("sq2", "sum")],
        ["pk", "n", "sq", "sq2"], 8)

    def classify(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        sq = b["sq"].to_numpy(zero_copy_only=False)
        sq2 = b["sq2"].to_numpy(zero_copy_only=False)
        var_num = n * sq2 - sq * sq
        m2 = sq * sq
        cls = np.where(4 * var_num <= m2, 0,
                       np.where(var_num <= m2, 1, 2))
        labels = np.array(["X", "Y", "Z"])
        return pa.table({"xyz_class": pa.array(labels[cls]),
                         "n_parts": pa.array(np.ones(len(n), np.int64))}) \
            .group_by(["xyz_class"], use_threads=False) \
            .aggregate([("n_parts", "sum")]) \
            .rename_columns(["xyz_class", "n_parts"])

    return sorted_aggregate(
        per.map_batches(classify, batch_format="pyarrow"),
        ["xyz_class"], [("n_parts", "sum")],
        ["xyz_class", "n_parts"], 1)


def _q_rel_revenue_waterfall(sf_dir: str):
    """Revenue waterfall: gross → −discount → net → +tax → final, all
    exact cents in ONE lineitem scan (each component rounded per line
    with the pinned half-up rule, so the bridge reconciles to the
    ledger audit's line totals). Five counters fold."""
    import pandas as pd
    i64 = pa.int64()
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_discount", "l_tax"])

    def parts(b: pa.Table) -> pa.Table:
        ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = b["l_discount"].to_numpy(zero_copy_only=False)
        tx = b["l_tax"].to_numpy(zero_copy_only=False)
        gross = np.floor(ep * 100.0 + 0.5).astype(np.int64)
        disc = np.floor(ep * dc * 100.0 + 0.5).astype(np.int64)
        net = np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
        tax = np.floor(ep * (1.0 - dc) * tx * 100.0 + 0.5) \
            .astype(np.int64)
        return pa.table({
            "gross_c": pa.array([int(gross.sum())], i64),
            "discount_c": pa.array([int(disc.sum())], i64),
            "net_c": pa.array([int(net.sum())], i64),
            "tax_c": pa.array([int(tax.sum())], i64)})

    p = li.map_batches(parts, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas()
    g, d = int(p["gross_c"].sum()), int(p["discount_c"].sum())
    n, t = int(p["net_c"].sum()), int(p["tax_c"].sum())
    return pd.DataFrame({"gross_c": [g], "discount_c": [d],
                         "net_c": [n], "tax_c": [t],
                         "final_c": [n + t]}).astype("int64")


def _q_kg_object_namespaces(sf_dir: str):
    """Object-namespace rollup: triples per OBJECT namespace (schema /
    entity / wikidata / prop / rdf / rdfs / literal) — the graph-shape
    fingerprint VoID's per-predicate stats don't give. One vectorized
    starts_with cascade per batch; |namespaces| counters fold."""
    from .functions.grouped import sorted_aggregate
    from .pipelines.kg import run_kg
    i64 = pa.int64()
    spaces = [("schema", C.SCHEMA), ("entity", C.ENT),
              ("wikidata", C.WD), ("prop", C.PROP),
              ("rdf", C.RDF), ("rdfs", C.RDFS)]

    def ns(b: pa.Table) -> pa.Table:
        obj = b["obj"]
        lit = b["obj_is_literal"].to_numpy(zero_copy_only=False)
        out = np.where(lit, "literal", "other")
        for name, pre in spaces:
            m = pc.starts_with(obj, pre).to_numpy(zero_copy_only=False)
            out = np.where(~lit & m, name, out)
        return pa.table({"namespace": pa.array(out),
                         "n": pa.array(np.ones(b.num_rows, np.int64))}) \
            .group_by(["namespace"], use_threads=False) \
            .aggregate([("n", "sum")]).rename_columns(["namespace", "n"])

    return sorted_aggregate(
        run_kg(sf_dir).map_batches(ns, batch_format="pyarrow",
                                   zero_copy_batch=True),
        ["namespace"], [("n", "sum")], ["namespace", "n"], 1)


COST_FN = 5  # missing a positive costs 5x a false alarm


def _q_ml_cost_curve(sf_dir: str):
    """Cost-sensitive threshold curve: expected cost = 5·FN + FP per
    candidate n_chars threshold (the business-asymmetric view the
    accuracy-optimal stump ignores) + the argmin row flag. Per-threshold
    2-cell partials fold; the curve is |thresholds| rows."""
    import pandas as pd
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["n_chars", "lang"])
    ths = list(GINI_THRESHOLDS)

    def cells(b: pa.Table) -> pa.Table:
        x = pc.cast(b["n_chars"], i64).to_numpy(zero_copy_only=False)
        y = pc.equal(b["lang"], "en").to_numpy(zero_copy_only=False)
        rows = [(t, int(((x >= t) & ~y).sum()),
                 int(((x < t) & y).sum())) for t in ths]
        tt, fp, fn = zip(*rows)
        return pa.table({"thr": pa.array(tt, i64),
                         "fp": pa.array(fp, i64),
                         "fn": pa.array(fn, i64)})

    p = docs.map_batches(cells, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas() \
        .groupby("thr", as_index=False).sum()
    p["cost"] = COST_FN * p["fn"].astype("int64") + p["fp"].astype(
        "int64")
    best = p.sort_values(["cost", "thr"]).iloc[0]["thr"]
    p["is_best"] = (p["thr"] == best).astype("int64")
    return p.sort_values("thr").reset_index(drop=True).astype(
        {"thr": "int64", "fp": "int64", "fn": "int64", "cost": "int64",
         "is_best": "int64"})


def _q_kg_literal_length_stats(sf_dir: str):
    """Literal-payload profile per predicate: n, total and max UTF-8
    length of literal objects — the storage/size fingerprint of the
    graph's text columns (which predicate dominates bytes). Vectorized
    utf8_length, |preds| partials."""
    from .functions.grouped import sorted_aggregate
    from .pipelines.kg import run_kg
    i64 = pa.int64()

    def stats(b: pa.Table) -> pa.Table:
        t = b.filter(b["obj_is_literal"])
        if t.num_rows == 0:
            return pa.schema([("pred", pa.string()), ("n", i64),
                              ("sum_len", i64),
                              ("max_len", i64)]).empty_table()
        ln = pc.cast(pc.utf8_length(t["obj"]), i64)
        return pa.table({"pred": t["pred"],
                         "n": pa.array(np.ones(t.num_rows, np.int64)),
                         "sum_len": ln, "max_len": ln}) \
            .group_by(["pred"], use_threads=False) \
            .aggregate([("n", "sum"), ("sum_len", "sum"),
                        ("max_len", "max")]) \
            .rename_columns(["pred", "n", "sum_len", "max_len"])

    return sorted_aggregate(
        run_kg(sf_dir).map_batches(stats, batch_format="pyarrow",
                                   zero_copy_batch=True),
        ["pred"], [("n", "sum"), ("sum_len", "sum"), ("max_len", "max")],
        ["pred", "n", "sum_len", "max_len"], 1)


def _q_rel_unit_price_audit(sf_dir: str):
    """Unit-price anomaly audit per brand: lineitems whose implied unit
    price deviates >5% from the catalog retail price, decided by the
    exact cross-multiplication 20·|100·ext_c − qty·retail_c| >
    qty·retail_c (no division) — the pricing-integrity check. Retail
    cents attach to lines through ONE int-key co-group."""
    from .functions.grouped import sorted_aggregate
    from .functions.joins import attach_column
    i64 = pa.int64()
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_quantity"]) \
        .map_batches(lambda b: pa.table({
            "pk": pc.cast(b["l_partkey"], i64),
            "ext_c": pc.cast(pc.round(pc.multiply(
                b["l_extendedprice"], 100.0)), i64),
            "qty": pc.cast(pc.round(b["l_quantity"]), i64)}),
            batch_format="pyarrow")
    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_retailprice"]).map_batches(
        lambda b: pa.table({
            "pk": pc.cast(b["p_partkey"], i64),
            "retail_c": pc.cast(pc.round(pc.multiply(
                b["p_retailprice"], 100.0)), i64)}),
        batch_format="pyarrow")
    brand = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"]).map_batches(
        lambda b: pa.table({"pk": pc.cast(b["p_partkey"], i64),
                            "brand": b["p_brand"]}),
        batch_format="pyarrow")
    j = attach_column(li, part, [("pk", i64), ("ext_c", i64),
                                 ("qty", i64)],
                      "pk", "pk", "retail_c", "retail_c", i64, 8)

    def flag(b: pa.Table) -> pa.Table:
        ext = b["ext_c"].to_numpy(zero_copy_only=False)
        qty = b["qty"].to_numpy(zero_copy_only=False)
        rc = b["retail_c"].to_numpy(zero_copy_only=False)
        dev = 20 * np.abs(100 * ext - qty * rc) > qty * rc
        return pa.table({"pk": b["pk"],
                         "n": pa.array(np.ones(len(ext), np.int64)),
                         "n_out": pa.array(dev.astype(np.int64))}) \
            .group_by(["pk"], use_threads=False) \
            .aggregate([("n", "sum"), ("n_out", "sum")]) \
            .rename_columns(["pk", "n", "n_out"])

    per_pk = sorted_aggregate(
        j.map_batches(flag, batch_format="pyarrow"),
        ["pk"], [("n", "sum"), ("n_out", "sum")],
        ["pk", "n", "n_out"], 8)
    withbrand = attach_column(per_pk, brand,
                              [("pk", i64), ("n", i64), ("n_out", i64)],
                              "pk", "pk", "brand", "brand",
                              pa.string(), 4)
    return sorted_aggregate(
        withbrand.map_batches(lambda b: pa.table(
            {"p_brand": b["brand"], "n": b["n"], "n_out": b["n_out"]})
            .group_by(["p_brand"], use_threads=False)
            .aggregate([("n", "sum"), ("n_out", "sum")])
            .rename_columns(["p_brand", "n", "n_out"]),
            batch_format="pyarrow"),
        ["p_brand"], [("n", "sum"), ("n_out", "sum")],
        ["p_brand", "n_lines", "n_outliers"], 1)


def _q_dedup_cross_source_clusters(sf_dir: str):
    """Cross-source contamination in near-dup clusters: clusters (from
    the minhash canonical map) whose members span >1 SOURCE — the
    mirror-site / re-crawl signal a per-source dedup would miss
    entirely. Sources ride onto the cluster map via one int-key
    attach; per-cluster distinct-source counts fold."""
    import pandas as pd
    from .functions.grouped import grouped_count
    from .functions.joins import attach_column
    from .stages.dedup import dedup_canonical_map, minhash_lsh_pairs
    i64 = pa.int64()
    docs = _docs(sf_dir)
    cm = dedup_canonical_map(docs, minhash_lsh_pairs(docs)).materialize()
    src = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                columns=["doc_id", "source"]).map_batches(
        lambda b: pa.table({"doc_id": pc.cast(b["doc_id"], i64),
                            "source": b["source"]}),
        batch_format="pyarrow")
    m = attach_column(cm.map_batches(lambda b: pa.table(
        {"doc_id": pc.cast(b["doc_id"], i64),
         "canon_id": pc.cast(b["canon_id"], i64)}),
        batch_format="pyarrow"), src,
        [("doc_id", i64), ("canon_id", i64)],
        "doc_id", "doc_id", "source", "source", pa.string(), 8)
    per = grouped_count(m.map_batches(
        lambda b: b.select(["canon_id", "source"]),
        batch_format="pyarrow"), ["canon_id", "source"], "__n", 4)
    sizes = grouped_count(per.map_batches(
        lambda b: b.select(["canon_id"]), batch_format="pyarrow"),
        ["canon_id"], "n_sources", 2).to_pandas()
    total = len(sizes)
    crossed = int((sizes["n_sources"] >= 2).sum())
    return pd.DataFrame({
        "n_clusters": [total], "n_cross_source": [crossed],
        "cross_fp": [10**6 * crossed // max(total, 1)]}).astype("int64")


POSBIAS_TERMS = ("hash", "scan", "window", "stream")


def _q_text_term_position_bias(sf_dir: str):
    """Positional bias per query term: do occurrences cluster early or
    late in documents? Per occurrence the relative position (i−1)·10⁶
    // (len−1) (0 = first token, 10⁶ = last); report n and the SUM of
    position fp (mean = sum // n is derivable, sums stay
    blocking-invariant). One flat-token pass, |terms| partials."""
    import pandas as pd
    from .stages.dedup import _words_flat
    i64 = pa.int64()
    terms = list(POSBIAS_TERMS)

    def pos(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("term", pa.string()), ("n", i64),
                              ("sum_pos_fp", i64)]).empty_table()
        words, doc_of = _words_flat(b["text"])
        lens = np.bincount(doc_of, minlength=b.num_rows).astype(np.int64)
        starts = np.zeros(b.num_rows, np.int64)
        starts[1:] = np.cumsum(lens)[:-1]
        tok_idx = np.arange(len(words)) - starts[doc_of]
        denom = np.maximum(lens[doc_of] - 1, 1)
        fp = 10**6 * tok_idx // denom
        rows = []
        for t in terms:
            m = words == t
            rows.append((t, int(m.sum()), int(fp[m].sum())))
        tt, nn, ss = zip(*rows)
        return pa.table({"term": pa.array(tt, pa.string()),
                         "n": pa.array(nn, i64),
                         "sum_pos_fp": pa.array(ss, i64)})

    p = _docs(sf_dir).map_batches(pos, batch_format="pyarrow",
                                  zero_copy_batch=True).to_pandas() \
        .groupby("term", as_index=False).sum()
    p["mean_pos_fp"] = (p["sum_pos_fp"].astype("int64")
                        // p["n"].astype("int64").clip(lower=1))
    return p.sort_values("term").reset_index(drop=True).astype(
        {"n": "int64", "sum_pos_fp": "int64", "mean_pos_fp": "int64"})


TIER_WARM_DAYS = 365
TIER_HOT_DAYS = 90


def _q_rel_storage_tiering(sf_dir: str):
    """Storage-tiering plan: parts classified hot/warm/cold by days
    since LAST shipment relative to the corpus horizon (max shipdate) —
    the lifecycle policy input for a 100-TB lakehouse. Per-part max
    day folds; the horizon is one scalar; tier counts leave."""
    import pandas as pd
    from .functions.grouped import sorted_aggregate
    i64 = pa.int64()
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_shipdate"]).map_batches(
        lambda b: pa.table({
            "pk": pc.cast(b["l_partkey"], i64),
            "day": pc.divide(pc.cast(pc.cast(b["l_shipdate"],
                                             pa.timestamp("us")), i64),
                             86_400_000_000)}),
        batch_format="pyarrow").materialize()
    last = sorted_aggregate(li, ["pk"], [("day", "max")],
                            ["pk", "last_day"], 8).materialize()
    horizon = int(last.map_batches(
        lambda b: pa.table({"m": pa.array(
            [int(b["last_day"].to_numpy(zero_copy_only=False).max())],
            i64)}), batch_format="pyarrow").to_pandas()["m"].max())

    def tier(b: pa.Table) -> pa.Table:
        age = horizon - b["last_day"].to_numpy(zero_copy_only=False)
        t = np.where(age <= TIER_HOT_DAYS, "hot",
                     np.where(age <= TIER_WARM_DAYS, "warm", "cold"))
        return pa.table({"tier": pa.array(t),
                         "n_parts": pa.array(
                             np.ones(len(age), np.int64))}) \
            .group_by(["tier"], use_threads=False) \
            .aggregate([("n_parts", "sum")]) \
            .rename_columns(["tier", "n_parts"])

    return sorted_aggregate(
        last.map_batches(tier, batch_format="pyarrow"),
        ["tier"], [("n_parts", "sum")], ["tier", "n_parts"], 1)


def _q_kg_schema_summary(sf_dir: str):
    """Schema-graph extraction: (subject class, predicate, object
    class-or-datatype) pattern counts — the ontology USAGE summary a
    KG catalog shows (VoID gives predicate totals; this types both
    ends). Subject/object classes ride in through two co-group
    attaches against the rdf:type edges; nothing assumes the node
    count fits anywhere."""
    from .functions.bgp import cogroup_join
    from .functions.grouped import grouped_count
    from .pipelines.kg import run_kg
    tri = run_kg(sf_dir).materialize()
    types_s = tri.filter(expr=f"pred == '{C.RDF_TYPE}'").map_batches(
        lambda b: pa.table({"subj": b["subj"], "cls": b["obj"]}),
        batch_format="pyarrow")
    types_o = tri.filter(expr=f"pred == '{C.RDF_TYPE}'").map_batches(
        lambda b: pa.table({"node": b["subj"], "cls": b["obj"]}),
        batch_format="pyarrow")

    def base(b: pa.Table) -> pa.Table:
        ocls = pc.if_else(
            b["obj_is_literal"],
            pc.fill_null(b["obj_datatype"], "literal"),
            pa.nulls(b.num_rows, pa.string()).fill_null("__iri__"))
        return pa.table({"subj": b["subj"], "pred": b["pred"],
                         "obj": b["obj"],
                         "ocls_lit": pc.cast(ocls, pa.string())})

    edges = tri.map_batches(base, batch_format="pyarrow",
                            zero_copy_batch=True)
    with_s = cogroup_join(
        edges, types_s, ["subj"],
        ["subj", "pred", "obj", "ocls_lit"], ["subj", "cls"],
        num_partitions=8, how="left", max_group=10_000_000) \
        .map_batches(lambda b: pa.table({
            "scls": pc.if_else(pc.equal(b["cls"], ""),
                               pa.nulls(b.num_rows, pa.string())
                               .fill_null("untyped"), b["cls"]),
            "pred": b["pred"], "node": b["obj"],
            "ocls_lit": b["ocls_lit"]}), batch_format="pyarrow")
    with_o = cogroup_join(
        with_s, types_o, ["node"],
        ["node", "scls", "pred", "ocls_lit"], ["node", "cls"],
        num_partitions=8, how="left", max_group=10_000_000) \
        .map_batches(lambda b: pa.table({
            "scls": b["scls"], "pred": b["pred"],
            "ocls": pc.if_else(
                pc.equal(b["ocls_lit"], "__iri__"),
                pc.if_else(pc.equal(b["cls"], ""),
                           pa.nulls(b.num_rows, pa.string())
                           .fill_null("untyped"), b["cls"]),
                b["ocls_lit"])}), batch_format="pyarrow")
    return grouped_count(with_o, ["scls", "pred", "ocls"], "n", 4) \
        .sort(["scls", "pred", "ocls"])


SPLIT_PCT = 80  # train fraction of the day span


def _q_sample_temporal_split(sf_dir: str):
    """Temporal train/test split + leakage audit: cutoff at the
    SPLIT_PCT ordinal of the day span, train = before, test = after;
    leakage = test events whose user ALSO appears in train (the
    user-level contamination a random split hides). First-seen day is
    one grouped min; everything else is counters."""
    import pandas as pd
    from .functions.grouped import sorted_aggregate
    i64 = pa.int64()
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts"]).map_batches(
        lambda b: pa.table({
            "user_id": pc.cast(b["user_id"], i64),
            "day": pc.divide(pc.cast(pc.cast(b["ts"], pa.timestamp("us")),
                                     i64), 86_400_000_000)}),
        batch_format="pyarrow").materialize()
    mm = ev.map_batches(lambda b: pa.table({
        "mn": pa.array([int(b["day"].to_numpy(
            zero_copy_only=False).min())], i64),
        "mx": pa.array([int(b["day"].to_numpy(
            zero_copy_only=False).max())], i64)}),
        batch_format="pyarrow").to_pandas()
    d0, d1 = int(mm["mn"].min()), int(mm["mx"].max())
    cutoff = d0 + (d1 - d0) * SPLIT_PCT // 100
    first = sorted_aggregate(ev, ["user_id"], [("day", "min")],
                             ["user_id", "first_day"], 4)
    from .functions.joins import attach_column
    tagged = attach_column(ev, first, [("user_id", i64), ("day", i64)],
                           "user_id", "user_id", "first_day",
                           "first_day", i64, 4)

    def fold(b: pa.Table) -> pa.Table:
        day = b["day"].to_numpy(zero_copy_only=False)
        fd = b["first_day"].to_numpy(zero_copy_only=False)
        test = day > cutoff
        leaked = test & (fd <= cutoff)
        return pa.table({
            "n_train": pa.array([int((~test).sum())], i64),
            "n_test": pa.array([int(test.sum())], i64),
            "n_leaked": pa.array([int(leaked.sum())], i64)})

    p = tagged.map_batches(fold, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    ntr, nte = int(p["n_train"].sum()), int(p["n_test"].sum())
    nlk = int(p["n_leaked"].sum())
    return pd.DataFrame({
        "cutoff_day": [cutoff], "n_train": [ntr], "n_test": [nte],
        "n_leaked": [nlk],
        "leak_fp": [10**6 * nlk // max(nte, 1)]}).astype("int64")


def _q_text_dup_ngram_coverage(sf_dir: str):
    """Duplicated-n-gram coverage per source: the fraction of corpus
    TOKENS lying inside at least one 3-gram shared with another
    document — the contamination-surface headline (dup-span finds the
    spans; this prices them corpus-wide). Shingle df folds once; dup
    flags ride back to each doc's positions and the covered-token
    union is a vectorized running-max sweep per doc."""
    import pandas as pd
    from .functions.bgp import cogroup_join
    from .functions.grouped import grouped_count
    from .stages.dedup import SHINGLE_K, _distinct_doc_shingles, \
        _words_flat
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "source", "text"]) \
        .materialize()

    def postings(b: pa.Table) -> pa.Table:
        doc_idx, codes, dic = _distinct_doc_shingles(b["text"])
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        if len(doc_idx) == 0:
            return pa.schema([("s", pa.string())]).empty_table()
        return pa.table({"s": pc.take(dic, pa.array(codes))})

    df = grouped_count(docs.map_batches(postings, batch_format="pyarrow",
                                        zero_copy_batch=True),
                       ["s"], "df", 8)
    dup = df.map_batches(lambda b: b.filter(
        pc.greater_equal(b["df"], 2)).select(["s"]),
        batch_format="pyarrow").to_pandas()
    dup_set = set(dup["s"])

    def coverage(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("source", pa.string()), ("n_tokens", i64),
                              ("n_covered", i64)]).empty_table()
        words, doc_of = _words_flat(b["text"])
        src = b["source"].to_numpy(zero_copy_only=False)
        lens = np.bincount(doc_of, minlength=b.num_rows).astype(np.int64)
        starts = np.zeros(b.num_rows, np.int64)
        starts[1:] = np.cumsum(lens)[:-1]
        covered = np.zeros(len(words), bool)
        k = SHINGLE_K
        # duplicated-shingle starts cover positions [i, i+k)
        T = len(words)
        if T >= k:
            valid = doc_of[:T - k + 1] == doc_of[k - 1:]
            sstart = np.flatnonzero(valid)
            if len(sstart):
                joined = np.array([" ".join(words[s:s + k])
                                   for s in sstart], dtype=object)
                isdup = np.fromiter((x in dup_set for x in joined),
                                    bool, len(joined))
                for off in range(k):
                    covered[sstart[isdup] + off] = True
        ncov = np.bincount(doc_of, weights=covered.astype(np.int64),
                           minlength=b.num_rows).astype(np.int64)
        return pa.table({"source": pa.array(src),
                         "n_tokens": pa.array(lens),
                         "n_covered": pa.array(ncov)}) \
            .group_by(["source"], use_threads=False) \
            .aggregate([("n_tokens", "sum"), ("n_covered", "sum")]) \
            .rename_columns(["source", "n_tokens", "n_covered"])

    p = docs.map_batches(coverage, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas() \
        .groupby("source", as_index=False).sum()
    p["cov_fp"] = (10**6 * p["n_covered"].astype("int64")
                   // p["n_tokens"].astype("int64").clip(lower=1))
    return p.sort_values("source").reset_index(drop=True).astype(
        {"n_tokens": "int64", "n_covered": "int64", "cov_fp": "int64"})


def _q_ml_mcnemar(sf_dir: str):
    """McNemar paired-classifier test between the two quality gates of
    ml_cohens_kappa (A: chars, B: words) on lang='en': discordant cells
    b (A right, B wrong) / c (A wrong, B right) and the
    continuity-corrected statistic ×10⁶ = 10⁶·(|b−c|−1)² // (b+c) —
    kappa says HOW MUCH they agree; McNemar says whether their ERRORS
    differ systematically. 2-cell partials fold."""
    import pandas as pd
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["text", "n_chars", "lang"])

    def cells(b: pa.Table) -> pa.Table:
        nch = pc.cast(b["n_chars"], i64).to_numpy(zero_copy_only=False)
        nw = pc.cast(pc.add(pc.count_substring(b["text"], " "), 1), i64) \
            .to_numpy(zero_copy_only=False)
        y = pc.equal(b["lang"], "en").to_numpy(zero_copy_only=False)
        a_ok = (nch >= KAPPA_CHAR_MIN) == y
        b_ok = (nw >= KAPPA_WORD_MIN) == y
        return pa.table({
            "b": pa.array([int((a_ok & ~b_ok).sum())], i64),
            "c": pa.array([int((~a_ok & b_ok).sum())], i64)})

    p = docs.map_batches(cells, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    bb, cc = int(p["b"].sum()), int(p["c"].sum())
    stat = (10**6 * max(abs(bb - cc) - 1, 0) ** 2 // max(bb + cc, 1))
    return pd.DataFrame({"n_b": [bb], "n_c": [cc],
                         "mcnemar_fp": [stat]}).astype("int64")


def _q_emb_norm_outliers(sf_dir: str):
    """Norm-outlier vectors: embeddings whose exact integer squared
    norm falls outside the global Tukey fences (ordinal quartiles at
    (n−1)//4 / 3(n−1)//4, fence q ± 3·IQR//2) — the corrupt-row /
    failed-encode detector upstream of any similarity work. Quartiles
    come from a (norm2) histogram ordinal pick; the flag pass is
    stateless."""
    from .functions.grouped import grouped_count
    i64 = pa.int64()
    emb = _emb(sf_dir).materialize()

    def norms(b: pa.Table) -> pa.Table:
        e = b["embedding"].combine_chunks()
        d = len(e[0])
        m = np.floor(e.flatten().to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1000.0).astype(np.int64) \
            .reshape(b.num_rows, d)
        return pa.table({"vec_id": pc.cast(b["vec_id"], i64),
                         "norm2": pa.array((m * m).sum(axis=1))})

    nm = emb.map_batches(norms, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    hist = grouped_count(nm.map_batches(
        lambda b: b.select(["norm2"]), batch_format="pyarrow"),
        ["norm2"], "n", 2).to_pandas().sort_values("norm2") \
        .reset_index(drop=True)
    cnt = hist["n"].to_numpy().astype(np.int64)
    vals = hist["norm2"].to_numpy().astype(np.int64)
    tot = int(cnt.sum())
    cum = np.cumsum(cnt)
    q1 = int(vals[np.searchsorted(cum, (tot - 1) // 4, "right")])
    q3 = int(vals[np.searchsorted(cum, 3 * (tot - 1) // 4, "right")])
    lo, hi = q1 - 3 * (q3 - q1) // 2, q3 + 3 * (q3 - q1) // 2

    def flag(b: pa.Table) -> pa.Table:
        n2 = b["norm2"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array((n2 < lo) | (n2 > hi)))

    out = nm.map_batches(flag, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    import pandas as pd
    if out.empty:
        out = pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                            "norm2": pd.Series(dtype="int64")})
    return out.sort_values("vec_id").reset_index(drop=True)


DORMANT_DAYS = 3


def _q_events_reactivations(sf_dir: str):
    """Dormancy→reactivation counting: per user, active-day gaps of ≥3
    days (the win-back events a lifecycle team measures). Distinct
    active days collapse first (grouped count), gaps come from
    complete sorted user groups."""
    from .functions.grouped import group_ids, grouped_count, \
        sorted_group_apply
    i64 = pa.int64()
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts"]).map_batches(
        lambda b: pa.table({
            "user_id": pc.cast(b["user_id"], i64),
            "day": pc.divide(pc.cast(pc.cast(b["ts"], pa.timestamp("us")),
                                     i64), 86_400_000_000)}),
        batch_format="pyarrow")
    days = grouped_count(ev, ["user_id", "day"], "__n", 4).map_batches(
        lambda b: b.select(["user_id", "day"]), batch_format="pyarrow")

    def gaps(b: pa.Table) -> pa.Table:
        schema = pa.schema([("user_id", i64), ("n_reactivations", i64)])
        if b.num_rows == 0:
            return schema.empty_table()
        gid, starts = group_ids(b, ["user_id"])
        day = b["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((day, gid))
        od, og = day[order], gid[order]
        is_gap = np.zeros(len(od), bool)
        is_gap[1:] = (og[1:] == og[:-1]) & (od[1:] - od[:-1]
                                            >= DORMANT_DAYS)
        cnt = np.zeros(len(starts), np.int64)
        np.add.at(cnt, og[is_gap], 1)
        nz = np.flatnonzero(cnt > 0)
        uid = b["user_id"].to_numpy(zero_copy_only=False)[starts]
        return pa.table({"user_id": pa.array(uid[nz], i64),
                         "n_reactivations": pa.array(cnt[nz])},
                        schema=schema)

    return sorted_group_apply(days, ["user_id"], gaps,
                              num_partitions=4).sort("user_id")


RO_ORIGINS = (60, 70, 80, 90)  # % of the day span
RO_HORIZON = 7


def _q_sample_rolling_origin(sf_dir: str):
    """Rolling-origin evaluation splits (time-series cross-validation):
    four origins at 60/70/80/90% of the day span, each with a 7-day
    test horizon — train/test sizes per fold, the leakage-free eval
    schedule for any forecast model. One scan, |origins| counters."""
    import pandas as pd
    i64 = pa.int64()
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts"]).map_batches(
        lambda b: pa.table({
            "day": pc.divide(pc.cast(pc.cast(b["ts"], pa.timestamp("us")),
                                     i64), 86_400_000_000)}),
        batch_format="pyarrow").materialize()
    mm = ev.map_batches(lambda b: pa.table({
        "mn": pa.array([int(b["day"].to_numpy(
            zero_copy_only=False).min())], i64),
        "mx": pa.array([int(b["day"].to_numpy(
            zero_copy_only=False).max())], i64)}),
        batch_format="pyarrow").to_pandas()
    d0, d1 = int(mm["mn"].min()), int(mm["mx"].max())
    cuts = [d0 + (d1 - d0) * p // 100 for p in RO_ORIGINS]

    def fold(b: pa.Table) -> pa.Table:
        day = b["day"].to_numpy(zero_copy_only=False)
        rows = []
        for p, c in zip(RO_ORIGINS, cuts):
            rows.append((p, c, int((day <= c).sum()),
                         int(((day > c) & (day <= c + RO_HORIZON))
                             .sum())))
        pp, cc, tr, te = zip(*rows)
        return pa.table({"origin_pct": pa.array(pp, i64),
                         "cutoff_day": pa.array(cc, i64),
                         "n_train": pa.array(tr, i64),
                         "n_test": pa.array(te, i64)})

    p = ev.map_batches(fold, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas() \
        .groupby(["origin_pct", "cutoff_day"], as_index=False).sum()
    return p.sort_values("origin_pct").reset_index(drop=True) \
        .astype("int64")


def _q_kg_degree_mixing(sf_dir: str):
    """Degree-mixing matrix of the co-mention graph: edge counts per
    (log2 degree bucket of u, log2 bucket of v), unordered — the full
    assortativity picture behind kg_assortativity's single scalar.
    Degrees attach to both edge endpoints via co-groups; the matrix is
    log²-bounded."""
    from .functions.bgp import cogroup_join
    from .functions.grouped import grouped_count
    from .functions.triangles import within_group_pairs
    pre = C.ENT + "mention/"
    m = _q_mentions(sf_dir).map_batches(
        lambda b: pa.table({
            "turn": b["subj"],
            "c": pc.utf8_slice_codeunits(b["obj"], len(pre))}),
        batch_format="pyarrow")
    edges = within_group_pairs(m, "turn", "c").materialize()
    deg_u = grouped_count(edges.map_batches(
        lambda b: pa.table({"node": pa.concat_arrays(
            [b["u"].combine_chunks(), b["v"].combine_chunks()])}),
        batch_format="pyarrow"), ["node"], "deg", 4)
    du = deg_u.map_batches(lambda b: pa.table(
        {"u": b["node"], "du": pc.cast(b["deg"], pa.string())}),
        batch_format="pyarrow")
    dv = deg_u.map_batches(lambda b: pa.table(
        {"v": b["node"], "dv": pc.cast(b["deg"], pa.string())}),
        batch_format="pyarrow")
    e1 = cogroup_join(edges, du, ["u"], ["u", "v"], ["u", "du"],
                      num_partitions=4)
    e2 = cogroup_join(e1, dv, ["v"], ["v", "u", "du"], ["v", "dv"],
                      num_partitions=4)

    def buckets(b: pa.Table) -> pa.Table:
        du_ = np.array([int(x).bit_length() - 1
                        for x in b["du"].to_pylist()], np.int64)
        dv_ = np.array([int(x).bit_length() - 1
                        for x in b["dv"].to_pylist()], np.int64)
        lo = np.minimum(du_, dv_)
        hi = np.maximum(du_, dv_)
        return pa.table({"bucket_lo": pa.array(lo),
                         "bucket_hi": pa.array(hi)})

    return grouped_count(e2.map_batches(buckets, batch_format="pyarrow"),
                         ["bucket_lo", "bucket_hi"], "n_edges", 2) \
        .sort(["bucket_lo", "bucket_hi"])


PRICE_BASE_YEAR = 1995
PRICE_COMP_YEAR = 1996


def _q_rel_price_index(sf_dir: str):
    """Laspeyres price index 1996 vs 1995: Σ p₁·q₀ // Σ p₀·q₀ ×10⁶
    over parts traded in BOTH years, with unit price p = 10⁶·ext_c //
    qty per (part, year) — the base-year-basket inflation measure.
    Per-(part, year) totals fold once; the basket join is an in-block
    pairing of complete part groups."""
    import pandas as pd
    from .functions.grouped import group_ids, sorted_aggregate, \
        sorted_group_apply
    i64 = pa.int64()
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        yr = pc.year(pc.cast(b["l_shipdate"], pa.timestamp("us")))
        t = pa.table({
            "pk": pc.cast(b["l_partkey"], i64),
            "yr": pc.cast(yr, i64),
            "ext_c": pc.cast(pc.round(pc.multiply(
                b["l_extendedprice"], 100.0)), i64),
            "qty": pc.cast(pc.round(b["l_quantity"]), i64)})
        t = t.filter(pc.is_in(t["yr"], value_set=pa.array(
            [PRICE_BASE_YEAR, PRICE_COMP_YEAR], pa.int64())))
        return t.group_by(["pk", "yr"], use_threads=False) \
            .aggregate([("ext_c", "sum"), ("qty", "sum")]) \
            .rename_columns(["pk", "yr", "ext_c", "qty"])

    per = sorted_aggregate(
        li.map_batches(prep, batch_format="pyarrow"),
        ["pk", "yr"], [("ext_c", "sum"), ("qty", "sum")],
        ["pk", "yr", "ext_c", "qty"], 8)

    def pair(b: pa.Table) -> pa.Table:
        schema = pa.schema([("num", i64), ("den", i64), ("n_parts", i64)])
        if b.num_rows == 0:
            return schema.empty_table()
        gid, starts = group_ids(b, ["pk"])
        sizes = np.diff(np.append(starts, b.num_rows))
        both = starts[sizes == 2]
        if len(both) == 0:
            return schema.empty_table()
        yr = b["yr"].to_numpy(zero_copy_only=False)
        ext = b["ext_c"].to_numpy(zero_copy_only=False)
        qty = b["qty"].to_numpy(zero_copy_only=False)
        # rows within a pk group sorted by yr? sort key is pk only —
        # order the two rows explicitly
        a, c = both, both + 1
        base_first = yr[a] == PRICE_BASE_YEAR
        bi = np.where(base_first, a, c)
        ci = np.where(base_first, c, a)
        p0 = 10**6 * ext[bi] // np.maximum(qty[bi], 1)
        p1 = 10**6 * ext[ci] // np.maximum(qty[ci], 1)
        q0 = qty[bi]
        return pa.table({"num": pa.array([int((p1 * q0).sum())], i64),
                         "den": pa.array([int((p0 * q0).sum())], i64),
                         "n_parts": pa.array([len(both)], i64)},
                        schema=schema)

    p = sorted_group_apply(per, ["pk"], pair, num_partitions=4) \
        .to_pandas()
    num, den = int(p["num"].sum()), int(p["den"].sum())
    return pd.DataFrame({
        "n_parts": [int(p["n_parts"].sum())],
        "index_fp": [10**6 * num // max(den, 1)]}).astype("int64")


def _q_rel_fifo_cogs(sf_dir: str):
    """FIFO cost-of-goods-sold per part: restocks (l_returnflag='R')
    form the day-ordered purchase queue; sales (everything else)
    consume from its front. COGS = full cost of every purchase line
    wholly consumed + ext_c·take // qty of the boundary line — the
    inventory-accounting op that is 'sequential' in a ledger but
    collapses to ONE cumulative-quantity searchsorted per part inside
    complete sorted groups. Output per part: qty sold/bought, qty
    matched, cogs cents."""
    from .functions.grouped import group_ids, sorted_group_apply
    i64 = pa.int64()
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_orderkey", "l_linenumber", "l_shipdate",
                 "l_quantity", "l_extendedprice", "l_returnflag"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "pk": pc.cast(b["l_partkey"], i64),
            "day": pc.divide(pc.cast(pc.cast(b["l_shipdate"],
                                             pa.timestamp("us")), i64),
                             86_400_000_000),
            "ok": pc.cast(b["l_orderkey"], i64),
            "ln": pc.cast(b["l_linenumber"], i64),
            "qty": pc.cast(pc.round(b["l_quantity"]), i64),
            "ext_c": pc.cast(pc.round(pc.multiply(
                b["l_extendedprice"], 100.0)), i64),
            "isbuy": pc.cast(pc.equal(b["l_returnflag"], "R"), i64)})

    def fifo(b: pa.Table) -> pa.Table:
        # fully vectorized FIFO: each purchase row i contributes
        # ext_i · clip(sold_g − cum_before_i, 0, qty_i) // qty_i —
        # wholly-consumed lines reduce to ext_i exactly, the boundary
        # line to the floor'd partial, later lines to 0; no per-group
        # Python loop (grouped.py's map_groups lesson)
        schema = pa.schema([("l_partkey", i64), ("qty_sold", i64),
                            ("qty_bought", i64), ("qty_matched", i64),
                            ("cogs_c", i64)])
        if b.num_rows == 0:
            return schema.empty_table()
        gid, starts = group_ids(b, ["pk"])
        order = np.lexsort((b["ln"].to_numpy(zero_copy_only=False),
                            b["ok"].to_numpy(zero_copy_only=False),
                            b["day"].to_numpy(zero_copy_only=False),
                            gid))
        qty = b["qty"].to_numpy(zero_copy_only=False)[order]
        ext = b["ext_c"].to_numpy(zero_copy_only=False)[order]
        buy = b["isbuy"].to_numpy(zero_copy_only=False)[order] == 1
        og = gid[order]
        n_grp = len(starts)
        sold = np.zeros(n_grp, np.int64)
        np.add.at(sold, og[~buy], qty[~buy])
        bought = np.zeros(n_grp, np.int64)
        np.add.at(bought, og[buy], qty[buy])
        bq, bx, bg = qty[buy], ext[buy], og[buy]
        cum = np.cumsum(bq)
        first = np.concatenate([[True], bg[1:] != bg[:-1]]) \
            if len(bg) else np.empty(0, bool)
        # cumulative qty BEFORE each buy row, within its group
        prev_total = np.concatenate([[0], cum[:-1]]) if len(bq) else cum
        grp_base = np.zeros(len(bq), np.int64)
        if len(bq):
            base_idx = np.maximum.accumulate(
                np.where(first, np.arange(len(bq)), 0))
            grp_base = prev_total[base_idx]
        cum_before = prev_total - grp_base
        take = np.clip(sold[bg] - cum_before, 0, bq) if len(bq) \
            else np.empty(0, np.int64)
        cogs_rows = bx * take // np.maximum(bq, 1)
        cogs = np.zeros(n_grp, np.int64)
        np.add.at(cogs, bg, cogs_rows)
        pk = b["pk"].to_numpy(zero_copy_only=False)[starts]
        return pa.table({"l_partkey": pa.array(pk, i64),
                         "qty_sold": pa.array(sold),
                         "qty_bought": pa.array(bought),
                         "qty_matched": pa.array(
                             np.minimum(sold, bought)),
                         "cogs_c": pa.array(cogs)}, schema=schema)

    return sorted_group_apply(
        li.map_batches(prep, batch_format="pyarrow"), ["pk"], fifo,
        num_partitions=8)


def _q_rel_suppliers_per_part(sf_dir: str):
    """Supplier-diversification histogram: how many parts are
    single-sourced vs k-sourced (distinct suppliers per part) — the
    supply-chain-risk headline. Distinct (part, supplier) collapses
    first, then two cascaded counts; nothing scales past the
    dictionary."""
    from .functions.grouped import grouped_count
    li = ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_partkey", "l_suppkey"])
    ps = grouped_count(li, ["l_partkey", "l_suppkey"], "__n", 8)
    per = grouped_count(ps.map_batches(
        lambda b: b.select(["l_partkey"]), batch_format="pyarrow"),
        ["l_partkey"], "n_suppliers", 4)
    return grouped_count(per.map_batches(
        lambda b: b.select(["n_suppliers"]), batch_format="pyarrow"),
        ["n_suppliers"], "n_parts", 1).sort("n_suppliers")


def _q_kg_redundant_assertions(sf_dir: str):
    """Redundant-assertion audit: asserted rdf:type triples ALSO
    entailed by the RDFS domain/range rules — the compression
    opportunity (drop them, re-derive on load) dual to
    kg_rdfs_inference's missing-entailment view. Same rule-table
    inference; the overlap is the inner co-group instead of the
    anti."""
    from .functions.bgp import cogroup_join
    from .functions.grouped import grouped_count
    from .pipelines.kg import run_kg
    tri = run_kg(sf_dir).materialize()
    preds = pa.array(list(RDFS_RULES), pa.string())

    def infer(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["pred"], value_set=preds))
        outs = []
        for p, (dcls, rcls) in RDFS_RULES.items():
            s = t.filter(pc.equal(t["pred"], p))
            if s.num_rows == 0:
                continue
            def fill(v, n=s.num_rows):
                return pa.nulls(n, pa.string()).fill_null(v)
            outs.append(pa.table({"node": pc.cast(s["subj"], pa.string()),
                                  "type_iri": fill(dcls)}))
            outs.append(pa.table({"node": pc.cast(s["obj"], pa.string()),
                                  "type_iri": fill(rcls)}))
        if not outs:
            return pa.schema([("node", pa.string()),
                              ("type_iri", pa.string())]).empty_table()
        return pa.concat_tables(outs)

    inferred = grouped_count(
        tri.map_batches(infer, batch_format="pyarrow"),
        ["node", "type_iri"], "n", 8).drop_columns(["n"])
    asserted = tri.map_batches(
        lambda b: b.filter(pc.equal(b["pred"], C.RDF_TYPE))
                   .select(["subj", "obj"])
                   .rename_columns(["node", "type_iri"]),
        batch_format="pyarrow")
    return cogroup_join(asserted, inferred, ["node", "type_iri"],
                        ["node", "type_iri"], ["node", "type_iri"],
                        num_partitions=8, how="inner") \
        .sort(["node", "type_iri"])


def _q_kg_tool_trend(sf_dir: str):
    """Per-tool usage trend: exact OLS slope NUMERATOR n·Σxy − Σx·Σy
    over (month-index, monthly usage count) — rising/falling tool
    adoption with zero floats (the denominator is tool-independent, so
    the numerator ranks identically). Month × |tools| bounded
    moments."""
    import pandas as pd
    from .functions.grouped import grouped_count
    from .pipelines.kg import run_kg
    i64 = pa.int64()
    tri = run_kg(sf_dir)
    ut = tri.filter(expr=f"pred == '{C.PRED_USES_TOOL}'").map_batches(
        lambda b: pa.table({"tool": b["obj"], "turn": b["subj"]}),
        batch_format="pyarrow")
    dc = tri.filter(expr=f"pred == '{C.PRED_DATE_CREATED}'").map_batches(
        lambda b: pa.table({"turn": b["subj"],
                            "month": pc.utf8_slice_codeunits(
                                b["obj"], 0, 7)}),
        batch_format="pyarrow")
    from .functions.bgp import cogroup_join
    j = cogroup_join(ut, dc, ["turn"], ["turn", "tool"],
                     ["turn", "month"], num_partitions=8)
    c = grouped_count(j.map_batches(
        lambda b: b.select(["tool", "month"]), batch_format="pyarrow"),
        ["tool", "month"], "n", 4).to_pandas()
    months = sorted(c["month"].unique())
    midx = {m: i for i, m in enumerate(months)}
    rows = []
    for tool, g in c.groupby("tool"):
        x = np.array([midx[m] for m in g["month"]], np.int64)
        y = g["n"].to_numpy().astype(np.int64)
        # dense month spine: missing months count 0
        full = np.zeros(len(months), np.int64)
        full[x] = y
        xs = np.arange(len(months), dtype=np.int64)
        n = len(months)
        num = n * int((xs * full).sum()) - int(xs.sum()) * int(full.sum())
        rows.append((tool, int(full.sum()), num))
    return pd.DataFrame(rows, columns=["tool", "n_uses", "slope_num"]) \
        .astype({"n_uses": "int64", "slope_num": "int64"}) \
        .sort_values("tool").reset_index(drop=True)


LL_GAP_S = 1800  # session gap, matches events_sessionize


def _q_events_littles_law(sf_dir: str):
    """Little's-law triple for the session 'queue': L (average
    concurrent sessions) = λ (arrival rate) × W (mean session
    duration), each measured EXACTLY from gap-windowed sessions: L_fp =
    10⁶·Σdur // span, λ per-day fp = 10⁶·86400·n // span, W = Σdur //
    n — the consistency identity L = λW holds by construction, making
    this the queueing sanity panel. Session extraction runs in complete
    sorted user groups."""
    import pandas as pd
    from .functions.grouped import group_ids, sorted_group_apply
    i64 = pa.int64()
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts"]).map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"],
            "ts_s": pc.divide(pc.cast(pc.cast(b["ts"],
                                              pa.timestamp("us")), i64),
                              1_000_000)}), batch_format="pyarrow")

    def sessions(b: pa.Table) -> pa.Table:
        schema = pa.schema([("n", i64), ("dur", i64), ("mn", i64),
                            ("mx", i64)])
        if b.num_rows == 0:
            return schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        ts = b["ts_s"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, gid))
        ot, og = ts[order], gid[order]
        new = np.empty(len(ot), bool)
        new[0] = True
        new[1:] = (og[1:] != og[:-1]) | (ot[1:] - ot[:-1] > LL_GAP_S)
        sid = np.cumsum(new) - 1
        last = np.zeros(sid.max() + 1, np.int64)
        np.maximum.at(last, sid, ot)  # ts_s > 0, zero init safe for max
        first = np.full(sid.max() + 1, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(first, sid, ot)
        dur = last - first
        return pa.table({"n": pa.array([len(first)], i64),
                         "dur": pa.array([int(dur.sum())], i64),
                         "mn": pa.array([int(ot.min())], i64),
                         "mx": pa.array([int(ot.max())], i64)},
                        schema=schema)

    p = sorted_group_apply(ev, ["user_id"], sessions,
                           num_partitions=4).to_pandas()
    n = int(p["n"].sum())
    dur = int(p["dur"].sum())
    span = int(p["mx"].max()) - int(p["mn"].min())
    return pd.DataFrame({
        "n_sessions": [n], "total_session_s": [dur], "span_s": [span],
        "avg_concurrency_fp": [10**6 * dur // max(span, 1)],
        "arrivals_per_day_fp": [10**6 * 86400 * n // max(span, 1)],
        "mean_duration_s": [dur // max(n, 1)]}).astype("int64")


HASHPART_BUCKETS = 64


def _q_diag_hash_partition_balance(sf_dir: str):
    """Hash-partitioner balance report: lineitem rows per
    splitmix64(l_orderkey) % 64 bucket, plus max/mean skew ×10⁶ — the
    pre-flight check that the shuffle key hashes evenly (a sequential
    key through a weak hash silently hot-spots one reducer). One
    grouped count; the skew scalar folds 64 rows."""
    import pandas as pd
    from .functions.grouped import grouped_count
    from .functions.sampling import splitmix64
    i64 = pa.int64()
    li = ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_orderkey"])

    def bucket(b: pa.Table) -> pa.Table:
        k = pc.cast(b["l_orderkey"], i64).to_numpy(zero_copy_only=False)
        h = (splitmix64(k.view(np.uint64))
             % np.uint64(HASHPART_BUCKETS)).astype(np.int64)
        return pa.table({"bucket": pa.array(h)})

    cnt = grouped_count(li.map_batches(bucket, batch_format="pyarrow"),
                        ["bucket"], "n_rows", 2).to_pandas()
    n = cnt["n_rows"].to_numpy().astype(np.int64)
    total = int(n.sum())
    mx = int(n.max())
    skew_fp = 10**6 * mx * HASHPART_BUCKETS // total
    out = cnt.sort_values("bucket").reset_index(drop=True).astype(
        {"bucket": "int64", "n_rows": "int64"})
    out["skew_fp"] = np.int64(skew_fp)
    return out


def _q_ml_shapley_two_features(sf_dir: str):
    """Exact Shapley attribution over the 2-feature coalition lattice
    {∅, A, B, AB} on accuracy (A: chars gate, B: words gate, AB: AND;
    v(∅) = majority-class rate): φ_A ×10⁶ = (10⁶·(v_A−v_∅) +
    10⁶·(v_AB−v_B)) // 2 — the only Shapley computable without
    sampling, and the fair split of the joint gate's skill. Four
    accuracy counters fold in one scan."""
    import pandas as pd
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["text", "n_chars", "lang"])

    def cells(b: pa.Table) -> pa.Table:
        nch = pc.cast(b["n_chars"], i64).to_numpy(zero_copy_only=False)
        nw = pc.cast(pc.add(pc.count_substring(b["text"], " "), 1), i64) \
            .to_numpy(zero_copy_only=False)
        y = pc.equal(b["lang"], "en").to_numpy(zero_copy_only=False)
        a = nch >= KAPPA_CHAR_MIN
        bb = nw >= KAPPA_WORD_MIN
        return pa.table({
            "n": pa.array([b.num_rows], i64),
            "n_pos": pa.array([int(y.sum())], i64),
            "ok_a": pa.array([int((a == y).sum())], i64),
            "ok_b": pa.array([int((bb == y).sum())], i64),
            "ok_ab": pa.array([int(((a & bb) == y).sum())], i64)})

    p = docs.map_batches(cells, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    n = int(p["n"].sum())
    npos = int(p["n_pos"].sum())
    v0 = 10**6 * max(npos, n - npos) // n  # majority-class accuracy
    va = 10**6 * int(p["ok_a"].sum()) // n
    vb = 10**6 * int(p["ok_b"].sum()) // n
    vab = 10**6 * int(p["ok_ab"].sum()) // n
    phi_a = ((va - v0) + (vab - vb)) // 2
    phi_b = ((vb - v0) + (vab - va)) // 2
    return pd.DataFrame({
        "v_empty_fp": [v0], "v_a_fp": [va], "v_b_fp": [vb],
        "v_ab_fp": [vab], "phi_a_fp": [phi_a],
        "phi_b_fp": [phi_b]}).astype("int64")


def _q_events_dose_response(sf_dir: str):
    """Dose–response curve: conversion rate by VIEW exposure (log2
    bucket of views BEFORE first purchase for converters, all views
    for non-converters) — the diminishing-returns read on exposure.
    Per-user scalars come from complete sorted groups; the curve is
    log2-bounded."""
    from .functions.grouped import group_ids, grouped_count, \
        sorted_group_apply
    i64 = pa.int64()
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"]).map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"],
            "ts_us": pc.cast(pc.cast(b["ts"], pa.timestamp("us")), i64),
            "event_id": b["event_id"], "event_type": b["event_type"]}),
        batch_format="pyarrow")

    def per_user(b: pa.Table) -> pa.Table:
        schema = pa.schema([("bucket", i64), ("n_users", i64),
                            ("n_converted", i64)])
        if b.num_rows == 0:
            return schema.empty_table()
        gid, starts = group_ids(b, ["user_id"])
        et = b["event_type"].to_numpy(zero_copy_only=False)
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        isp = et == "purchase"
        isv = et == "view"
        n_grp = len(starts)
        # first purchase INSTANT per user (strict-before semantics:
        # views at the exact purchase microsecond don't count — no
        # event_id tie-break needed, identical convention in the twin)
        fp = np.full(n_grp, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(fp, gid[isp], ts[isp])
        conv = fp < np.iinfo(np.int64).max
        pre_view = isv & (ts < fp[gid])
        views = np.zeros(n_grp, np.int64)
        np.add.at(views, gid[pre_view], 1)
        allv = np.zeros(n_grp, np.int64)
        np.add.at(allv, gid[isv], 1)
        dose = np.where(conv, views, allv)
        bucket = np.array([int(x).bit_length() for x in dose], np.int64)
        return pa.table({"bucket": pa.array(bucket),
                         "n_users": pa.array(np.ones(n_grp, np.int64)),
                         "n_converted": pa.array(conv.astype(np.int64))},
                        schema=schema) \
            .group_by(["bucket"], use_threads=False) \
            .aggregate([("n_users", "sum"), ("n_converted", "sum")]) \
            .rename_columns(["bucket", "n_users", "n_converted"])

    agg = sorted_group_apply(ev, ["user_id"], per_user, num_partitions=4)
    from .functions.grouped import sorted_aggregate
    out = sorted_aggregate(agg, ["bucket"],
                           [("n_users", "sum"), ("n_converted", "sum")],
                           ["bucket", "n_users", "n_converted"], 1)
    return out.map_batches(lambda b: b.append_column(
        "rate_fp", pa.array(
            10**6 * b["n_converted"].to_numpy(zero_copy_only=False)
            // b["n_users"].to_numpy(zero_copy_only=False),
            pa.int64())), batch_format="pyarrow", zero_copy_batch=True)


FOOTER_TABLES = ("customer", "lineitem", "orders", "part", "events",
                 "documents", "embeddings")


def _q_diag_parquet_footers(sf_dir: str):
    """Parquet footer introspection: rows and row-group counts per
    input table read from METADATA ONLY (the same footer-level planning
    state/compact.py uses — no data pages touched), the split-planning
    input for the 100-TB read stage. Driver-side pyarrow footer reads;
    the twin uses DuckDB's parquet_file_metadata."""
    import pandas as pd
    import pyarrow.parquet as pq
    rows = []
    for t in FOOTER_TABLES:
        md = pq.ParquetFile(os.path.join(sf_dir, f"{t}.parquet")).metadata
        rows.append((t, md.num_rows, md.num_row_groups))
    return pd.DataFrame(rows, columns=["tbl", "num_rows",
                                       "num_row_groups"]) \
        .astype({"num_rows": "int64", "num_row_groups": "int64"}) \
        .sort_values("tbl").reset_index(drop=True)


DATE_SHIFT_RANGE = 15  # each user shifted by splitmix(user) % 15 - 7 days


def _q_privacy_date_shift(sf_dir: str):
    """Deterministic per-user date shifting (the longitudinal-privacy
    transform that keeps WITHIN-user intervals exact while breaking
    cross-user alignment): shift = splitmix64(user_id) % 15 − 7 days;
    report per user the shift and the shifted activity window —
    mechanism plumbing oracle-twinned bit-for-bit."""
    from .functions.grouped import sorted_aggregate
    from .functions.sampling import splitmix64
    i64 = pa.int64()
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts"]).map_batches(
        lambda b: pa.table({
            "user_id": pc.cast(b["user_id"], i64),
            "day": pc.divide(pc.cast(pc.cast(b["ts"], pa.timestamp("us")),
                                     i64), 86_400_000_000)}),
        batch_format="pyarrow")
    mm = sorted_aggregate(ev, ["user_id"],
                          [("day", "min"), ("day", "max")],
                          ["user_id", "mn", "mx"], 4)

    def shift(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        sh = (splitmix64(uid.view(np.uint64))
              % np.uint64(DATE_SHIFT_RANGE)).astype(np.int64) - 7
        return pa.table({
            "user_id": b["user_id"], "shift_days": pa.array(sh),
            "from_day": pa.array(
                b["mn"].to_numpy(zero_copy_only=False) + sh),
            "to_day": pa.array(
                b["mx"].to_numpy(zero_copy_only=False) + sh)})

    return mm.map_batches(shift, batch_format="pyarrow",
                          zero_copy_batch=True).sort("user_id")


def _q_rel_two_way_interaction(sf_dir: str):
    """Two-way cell analysis (returnflag × linestatus on quantity):
    per-cell mean ×10⁶ plus the interaction contrast cell − row − col
    + grand (all fp means pinned to 10⁶·sum // n, so the contrast is
    deterministic integer adds) — the ANOVA-table view of a categorical
    pair. One grouped moment pass; margins fold on a |cells| frame."""
    import pandas as pd
    i64 = pa.int64()
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def mom(b: pa.Table) -> pa.Table:
        return pa.table({
            "rf": b["l_returnflag"], "ls": b["l_linestatus"],
            "n": pa.array(np.ones(b.num_rows, np.int64)),
            "sq": pc.cast(pc.round(b["l_quantity"]), i64)}) \
            .group_by(["rf", "ls"], use_threads=False) \
            .aggregate([("n", "sum"), ("sq", "sum")]) \
            .rename_columns(["rf", "ls", "n", "sq"])

    p = li.map_batches(mom, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas() \
        .groupby(["rf", "ls"], as_index=False).sum()
    p["cell_fp"] = 10**6 * p["sq"].astype("int64") // p["n"].astype(
        "int64")
    row = p.groupby("rf").agg(n=("n", "sum"), sq=("sq", "sum"))
    row["fp"] = 10**6 * row["sq"] // row["n"]
    col = p.groupby("ls").agg(n=("n", "sum"), sq=("sq", "sum"))
    col["fp"] = 10**6 * col["sq"] // col["n"]
    grand = 10**6 * int(p["sq"].sum()) // int(p["n"].sum())
    p["interaction_fp"] = (p["cell_fp"]
                           - p["rf"].map(row["fp"]).astype("int64")
                           - p["ls"].map(col["fp"]).astype("int64")
                           + grand)
    out = p[["rf", "ls", "n", "cell_fp", "interaction_fp"]].copy()
    out.columns = ["l_returnflag", "l_linestatus", "n", "cell_fp",
                   "interaction_fp"]
    return out.sort_values(["l_returnflag", "l_linestatus"]) \
        .reset_index(drop=True).astype(
        {"n": "int64", "cell_fp": "int64", "interaction_fp": "int64"})


def _q_kg_construct_agg(sf_dir: str):
    """Aggregate CONSTRUCT — materialized-statistics triples: derive
    (conv, prop:toolUseCount, n) for every conversation from a grouped
    count over usesTool + isPartOf edges, emitted as typed integer
    literals ready to union into the graph (the reference's derived-
    triple pattern lifted to aggregates; plain CONSTRUCT is per-binding,
    this is per-GROUP). Two predicate scans, one co-group, one count."""
    from .functions.bgp import cogroup_join
    from .functions.grouped import grouped_count
    from .pipelines.kg import run_kg
    tri = run_kg(sf_dir).materialize()
    ut = tri.filter(expr=f"pred == '{C.PRED_USES_TOOL}'").map_batches(
        lambda b: pa.table({"turn": b["subj"]}), batch_format="pyarrow")
    po = tri.filter(expr=f"pred == '{C.PRED_IS_PART_OF}'").map_batches(
        lambda b: pa.table({"turn": b["subj"], "conv": b["obj"]}),
        batch_format="pyarrow")
    j = cogroup_join(ut, po, ["turn"], ["turn"], ["turn", "conv"],
                     num_partitions=8)
    c = grouped_count(j.map_batches(lambda b: b.select(["conv"]),
                                    batch_format="pyarrow"),
                      ["conv"], "n", 4)

    def render(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "subj": b["conv"],
            "pred": pa.nulls(b.num_rows, pa.string()).fill_null(
                C.PROP + "toolUseCount"),
            "obj": pa.array([str(int(x)) for x in n], pa.string()),
            "obj_datatype": pa.nulls(b.num_rows, pa.string()).fill_null(
                C.XSD_INTEGER)})

    return c.map_batches(render, batch_format="pyarrow",
                         zero_copy_batch=True).sort("subj")


def _q_ml_fairness_odds_gap(sf_dir: str):
    """Equalized-odds audit per source group: TPR and FPR ×10⁶ of the
    n_chars gate predicting lang='en' in each source, plus the max
    pairwise gaps — the group-fairness check run before shipping any
    filter that gates documents. 4 counters per group fold."""
    import pandas as pd
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["source", "n_chars", "lang"])

    def cells(b: pa.Table) -> pa.Table:
        p = pc.cast(b["n_chars"], i64).to_numpy(
            zero_copy_only=False) >= KAPPA_CHAR_MIN
        y = pc.equal(b["lang"], "en").to_numpy(zero_copy_only=False)
        return pa.table({
            "source": b["source"],
            "tp": pa.array((p & y).astype(np.int64)),
            "fp": pa.array((p & ~y).astype(np.int64)),
            "pos": pa.array(y.astype(np.int64)),
            "neg": pa.array((~y).astype(np.int64))}) \
            .group_by(["source"], use_threads=False) \
            .aggregate([("tp", "sum"), ("fp", "sum"), ("pos", "sum"),
                        ("neg", "sum")]) \
            .rename_columns(["source", "tp", "fp", "pos", "neg"])

    p = docs.map_batches(cells, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas() \
        .groupby("source", as_index=False).sum().sort_values("source")
    p["tpr_fp"] = (10**6 * p["tp"].astype("int64")
                   // p["pos"].astype("int64").clip(lower=1))
    p["fpr_fp"] = (10**6 * p["fp"].astype("int64")
                   // p["neg"].astype("int64").clip(lower=1))
    p["tpr_gap_fp"] = np.int64(int(p["tpr_fp"].max())
                               - int(p["tpr_fp"].min()))
    p["fpr_gap_fp"] = np.int64(int(p["fpr_fp"].max())
                               - int(p["fpr_fp"].min()))
    return p[["source", "tpr_fp", "fpr_fp", "tpr_gap_fp",
              "fpr_gap_fp"]].reset_index(drop=True).astype(
        {"tpr_fp": "int64", "fpr_fp": "int64", "tpr_gap_fp": "int64",
         "fpr_gap_fp": "int64"})


ATTR_WINDOWS_S = (3600, 21600, 86400)


def _q_events_attribution_windows(sf_dir: str):
    """Attribution-window sensitivity: purchases credited to a prior
    view within 1 h / 6 h / 24 h (last-touch), as three counters from
    ONE pass — how much 'conversion' is an artifact of the window
    choice. The most-recent-view time is a running max inside complete
    sorted user groups (no per-purchase search)."""
    import pandas as pd
    from .functions.grouped import group_ids, sorted_group_apply
    i64 = pa.int64()
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"]).map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"],
            "ts_s": pc.divide(pc.cast(pc.cast(b["ts"],
                                              pa.timestamp("us")), i64),
                              1_000_000),
            "event_id": b["event_id"], "event_type": b["event_type"]}),
        batch_format="pyarrow")

    def windows(b: pa.Table) -> pa.Table:
        schema = pa.schema([("window_s", i64), ("n_purchases", i64),
                            ("n_attributed", i64)])
        if b.num_rows == 0:
            return schema.empty_table()
        gid, _ = group_ids(b, ["user_id"])
        ts = b["ts_s"].to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, gid))
        ot, og, oe = ts[order], gid[order], et[order]
        isv = oe == "view"
        # most-recent STRICTLY-PRIOR view time per row: shift the view
        # times down one, reset at group starts (sentinel -1: ts_s > 0),
        # then a segmented cummax via the per-segment stride offset
        # (value range [-1, ~2^31) << stride, so cross-segment values
        # can never win the accumulate)
        vt = np.where(isv, ot, -1)
        first = np.empty(len(ot), bool)
        first[0] = True
        first[1:] = og[1:] != og[:-1]
        prev = np.empty(len(ot), np.int64)
        prev[0] = -1
        prev[1:] = vt[:-1]
        prev[first] = -1
        seg = np.cumsum(first) - 1
        stride = np.int64(1) << 34
        run = np.maximum.accumulate(prev + seg * stride) - seg * stride
        isp = oe == "purchase"
        last_view = run[isp]
        gaps = ot[isp] - last_view
        rows = [(w, int(isp.sum()),
                 int(((last_view >= 0) & (gaps <= w)).sum()))
                for w in ATTR_WINDOWS_S]
        a, c, d = zip(*rows)
        return pa.table({"window_s": pa.array(a, i64),
                         "n_purchases": pa.array(c, i64),
                         "n_attributed": pa.array(d, i64)},
                        schema=schema)

    p = sorted_group_apply(ev, ["user_id"], windows,
                           num_partitions=4).to_pandas() \
        .groupby("window_s", as_index=False).sum()
    p["attr_fp"] = (10**6 * p["n_attributed"].astype("int64")
                    // p["n_purchases"].astype("int64").clip(lower=1))
    return p.sort_values("window_s").reset_index(drop=True).astype(
        {"window_s": "int64", "n_purchases": "int64",
         "n_attributed": "int64", "attr_fp": "int64"})


def _q_text_cross_perplexity(sf_dir: str):
    """Cross-domain code length: tokens of source A coded under source
    B's Laplace unigram model (and vice versa), bits = bitlen((N_B + V)
    // (c_B + 1)) per token — the exact-integer domain-mismatch
    measure (self-surprisal is text_surprisal; this is the transfer
    direction). Everything folds on the dictionary-sized (source,
    word) frame."""
    import pandas as pd
    from .functions.grouped import grouped_count
    from .stages.dedup import _words_flat
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["source", "text"])

    def words(b: pa.Table) -> pa.Table:
        w, doc_of = _words_flat(b["text"])
        src = b["source"].to_numpy(zero_copy_only=False)
        return pa.table({"source": pa.array(src[doc_of]),
                         "word": pa.array(w)})

    c = grouped_count(docs.map_batches(words, batch_format="pyarrow",
                                       zero_copy_batch=True),
                      ["source", "word"], "n", 8).to_pandas()
    srcs = sorted(c["source"].unique())[:2]
    a, b_ = srcs
    sub = c[c["source"].isin(srcs)]
    piv = sub.pivot_table(index="word", columns="source", values="n",
                          aggfunc="sum", fill_value=0).reset_index()
    for s in srcs:
        if s not in piv:
            piv[s] = 0
    v = len(piv)
    rows = []
    for frm, to in ((a, b_), (b_, a)):
        n_to = int(piv[to].sum())
        ca = piv[frm].to_numpy().astype(np.int64)
        cb = piv[to].to_numpy().astype(np.int64)
        bits = np.array([int((n_to + v) // (x + 1)).bit_length()
                         for x in cb], np.int64)
        total = int((ca * bits).sum())
        ntok = int(ca.sum())
        rows.append((frm, to, ntok, total,
                     10**6 * total // max(ntok, 1)))
    return pd.DataFrame(rows, columns=["src_from", "src_to", "n_tokens",
                                       "total_bits", "mean_bits_fp"]) \
        .astype({"n_tokens": "int64", "total_bits": "int64",
                 "mean_bits_fp": "int64"}) \
        .sort_values(["src_from"]).reset_index(drop=True)


RICH_CLUB_K = 3


def _q_kg_rich_club(sf_dir: str):
    """Rich-club coefficient of the co-mention graph: among nodes with
    degree ≥ 3, the realized fraction of possible edges ×10⁶ — do the
    hubs talk to each other? Degrees attach to both edge endpoints via
    co-groups; only 4 counters leave."""
    import pandas as pd
    from .functions.bgp import cogroup_join
    from .functions.grouped import grouped_count
    from .functions.triangles import within_group_pairs
    pre = C.ENT + "mention/"
    m = _q_mentions(sf_dir).map_batches(
        lambda b: pa.table({
            "turn": b["subj"],
            "c": pc.utf8_slice_codeunits(b["obj"], len(pre))}),
        batch_format="pyarrow")
    edges = within_group_pairs(m, "turn", "c").materialize()
    deg = grouped_count(edges.map_batches(
        lambda b: pa.table({"node": pa.concat_arrays(
            [b["u"].combine_chunks(), b["v"].combine_chunks()])}),
        batch_format="pyarrow"), ["node"], "deg", 4).materialize()
    rich = deg.map_batches(lambda b: b.filter(
        pc.greater_equal(b["deg"], RICH_CLUB_K)).select(["node"]),
        batch_format="pyarrow")
    n_rich = rich.count()
    du = rich.map_batches(lambda b: pa.table({"u": b["node"]}),
                          batch_format="pyarrow")
    dv = rich.map_batches(lambda b: pa.table({"v": b["node"]}),
                          batch_format="pyarrow")
    e1 = cogroup_join(edges, du, ["u"], ["u", "v"], ["u"],
                      num_partitions=4)
    e2 = cogroup_join(e1, dv, ["v"], ["v", "u"], ["v"],
                      num_partitions=4)
    n_edges = e2.count()
    denom = max(n_rich * (n_rich - 1) // 2, 1)
    return pd.DataFrame({
        "k": [RICH_CLUB_K], "n_rich": [n_rich], "n_edges": [n_edges],
        "phi_fp": [10**6 * n_edges // denom]}).astype("int64")


def _q_ml_margin_histogram(sf_dir: str):
    """Decision-margin histogram: |n_chars − 500| in log2 buckets split
    by correctness — errors should concentrate near the boundary; a fat
    wrong-tail far from it means the feature, not the threshold, is
    broken. One scan, log2×2 counters."""
    from .functions.grouped import sorted_aggregate
    i64 = pa.int64()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["n_chars", "lang"])

    def cells(b: pa.Table) -> pa.Table:
        x = pc.cast(b["n_chars"], i64).to_numpy(zero_copy_only=False)
        y = pc.equal(b["lang"], "en").to_numpy(zero_copy_only=False)
        margin = np.abs(x - KAPPA_CHAR_MIN)
        bucket = np.array([int(v).bit_length() for v in margin],
                          np.int64)
        correct = ((x >= KAPPA_CHAR_MIN) == y).astype(np.int64)
        return pa.table({"bucket": pa.array(bucket),
                         "n": pa.array(np.ones(len(x), np.int64)),
                         "n_correct": pa.array(correct)}) \
            .group_by(["bucket"], use_threads=False) \
            .aggregate([("n", "sum"), ("n_correct", "sum")]) \
            .rename_columns(["bucket", "n", "n_correct"])

    out = sorted_aggregate(
        docs.map_batches(cells, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["bucket"], [("n", "sum"), ("n_correct", "sum")],
        ["bucket", "n", "n_correct"], 1)
    return out.map_batches(lambda b: b.append_column(
        "acc_fp", pa.array(
            10**6 * b["n_correct"].to_numpy(zero_copy_only=False)
            // b["n"].to_numpy(zero_copy_only=False), pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True)


def _q_kg_label_assortativity(sf_dir: str):
    """Label-mixing matrix of the co-mention graph: edge counts per
    unordered ENTITY-TYPE pair (types via mention→sameAs→entity→
    instanceOf→type chain; unlinked mentions bucket as 'untyped') plus
    the same-type edge share ×10⁶ — do entities co-occur within their
    kind? The categorical counterpart of degree assortativity. Two
    dictionary-bounded maps ride in the closure; edges stream."""
    import pandas as pd
    from .functions.grouped import grouped_count
    from .functions.triangles import within_group_pairs
    from .pipelines.kg import run_kg
    tri = run_kg(sf_dir).materialize()
    pre = C.ENT + "mention/"
    sa = tri.filter(expr=f"pred == '{C.PRED_SAME_AS}'").map_batches(
        lambda b: pa.table({
            "c": pc.utf8_slice_codeunits(b["subj"], len(pre)),
            "ent": b["obj"]}), batch_format="pyarrow").to_pandas()
    io = tri.filter(expr=f"pred == '{C.PRED_INSTANCE_OF}'").map_batches(
        lambda b: pa.table({"ent": b["subj"], "ty": b["obj"]}),
        batch_format="pyarrow").to_pandas()
    c2t = dict(zip(sa["c"], sa["ent"].map(
        dict(zip(io["ent"], io["ty"]))).fillna("untyped")))
    m = tri.filter(expr=f"pred == '{C.PRED_MENTIONS}'").map_batches(
        lambda b: pa.table({
            "turn": b["subj"],
            "c": pc.utf8_slice_codeunits(b["obj"], len(pre))}),
        batch_format="pyarrow")
    edges = within_group_pairs(m, "turn", "c")

    def to_types(b: pa.Table) -> pa.Table:
        tu = np.array([c2t.get(x, "untyped")
                       for x in b["u"].to_pylist()], dtype=object)
        tv = np.array([c2t.get(x, "untyped")
                       for x in b["v"].to_pylist()], dtype=object)
        lo = np.minimum(tu, tv)
        hi = np.maximum(tu, tv)
        return pa.table({"type_a": pa.array(lo, pa.string()),
                         "type_b": pa.array(hi, pa.string())})

    cnt = grouped_count(edges.map_batches(to_types,
                                          batch_format="pyarrow"),
                        ["type_a", "type_b"], "n_edges", 4).to_pandas()
    total = int(cnt["n_edges"].sum())
    same = int(cnt.loc[cnt["type_a"] == cnt["type_b"],
                       "n_edges"].sum())
    cnt["same_share_fp"] = np.int64(10**6 * same // max(total, 1))
    return cnt.sort_values(["type_a", "type_b"]) \
        .reset_index(drop=True).astype(
        {"n_edges": "int64", "same_share_fp": "int64"})


FLOOR_MIN_PER_STRATUM = 50
FLOOR_BUDGET = 500


def _q_sample_floor_allocation(sf_dir: str):
    """Floor-plus-proportional sampling allocation: every priority
    stratum gets ≥50 slots, the remaining budget splits proportionally
    to stratum size with largest-remainder — the minimum-representation
    policy plain proportional allocation violates for rare strata.
    |strata| counters fold."""
    import pandas as pd
    from .functions.grouped import grouped_count
    od = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                               columns=["o_orderpriority"])
    h = grouped_count(od, ["o_orderpriority"], "n", 2).to_pandas() \
        .sort_values("o_orderpriority").reset_index(drop=True)
    k = len(h)
    rest = FLOOR_BUDGET - k * FLOOR_MIN_PER_STRATUM
    w = h["n"].to_numpy().astype(np.int64)
    tw = int(w.sum())
    floor_a = [rest * int(x) // tw for x in w]
    rem = [rest * int(x) - f * tw for x, f in zip(w, floor_a)]
    left = rest - sum(floor_a)
    order = sorted(range(k), key=lambda i: (-rem[i],
                                            h["o_orderpriority"][i]))
    alloc = [FLOOR_MIN_PER_STRATUM + f for f in floor_a]
    for i in order[:left]:
        alloc[i] += 1
    h["alloc"] = pd.Series(alloc, dtype="int64")
    return h.astype({"n": "int64", "alloc": "int64"})


PERIOD_MAX_LAG = 14


def _q_events_dominant_period(sf_dir: str):
    """Dominant periodicity: the lag (2..14 days) maximizing the
    length-normalized autocovariance numerator ×10⁶ // (n−lag) of the
    dense daily counts (tie: smallest lag) — the autoperiod detector
    behind 'is it weekly?'. Calendar-bounded driver math after the
    distributed daily fold; all lags reported."""
    import pandas as pd
    from .functions.grouped import sorted_aggregate
    i64 = pa.int64()
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts"])

    def daily(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(pc.cast(b["ts"], pa.timestamp("us")), i64),
                        86_400_000_000)
        return pa.table({"day": day,
                         "n": pa.array(np.ones(b.num_rows, np.int64))}) \
            .group_by(["day"], use_threads=False) \
            .aggregate([("n", "sum")]).rename_columns(["day", "n"])

    d = sorted_aggregate(ev.map_batches(daily, batch_format="pyarrow"),
                         ["day"], [("n", "sum")], ["day", "n"], 4) \
        .to_pandas().sort_values("day").reset_index(drop=True)
    day = d["day"].to_numpy().astype(np.int64)
    c = np.zeros(int(day[-1] - day[0] + 1), np.int64)
    c[day - day[0]] = d["n"].to_numpy().astype(np.int64)
    n = len(c)
    rows = []
    for lag in range(2, PERIOD_MAX_LAG + 1):
        if lag >= n:
            break
        a, b_ = c[:-lag], c[lag:]
        m = n - lag
        num = m * int((a * b_).sum()) - int(a.sum()) * int(b_.sum())
        rows.append((lag, 10**6 * num // (m * m)))
    best = min(rows, key=lambda r: (-r[1], r[0]))[0]
    out = pd.DataFrame(rows, columns=["lag", "autocov_fp"])
    out["is_dominant"] = (out["lag"] == best).astype("int64")
    return out.astype({"lag": "int64", "autocov_fp": "int64"})


def queries() -> dict[str, Callable]:
    return {
        "kg_structural_triples": _q_structural,
        "kg_mention_triples": _q_mentions,
        "kg_dead_letter": _q_dead_letter,
        "kg_pipeline_full": _q_full,
        "cq_turns_per_role": _q_turns_per_role,
        "cq_mean_turns_per_conv": _q_mean_turns_per_conv,
        "cq_busiest_day_by_tool": _q_busiest_day_by_tool,
        "cq_convs_over_10_turns": _q_convs_over_10_turns,
        "cq_turns_in_month": _q_turns_in_month,
        "cq_distinct_mentions": _q_distinct_mentions,
        "cq_top_tools": _q_top_tools,
        "cq_conv_stats_salted": _q_conv_stats_salted,
        "cq_convs_mentioning": _q_convs_mentioning,
        "cq_linked_forms": _q_linked_forms,
        "cq_busiest_conv": _q_busiest_conv,
        "cq_avg_mentions_per_turn": _q_avg_mentions_per_turn,
        "cq_turns_per_weekday": _q_turns_per_weekday,
        "cq_convs_with_min_tools": _q_convs_with_min_tools,
        "cq_top_tool_per_role": _q_top_tool_per_role,
        "cq_turns_per_year_month": _q_turns_per_year_month,
        "cq_conv_tool_paths": _q_conv_tool_paths,
        "geo_reverse_geocode": _q_reverse_geocode,
        "kg_pagerank": _q_kg_pagerank,
        "kg_ppr_tools": _q_kg_ppr_tools,
        "kg_degree_stats": _q_kg_degree_stats,
        "kg_bfs_distances": _q_kg_bfs_distances,
        "kg_kcore_edges": _q_kg_kcore,
        "kg_comention_triangles": _q_kg_comention_triangles,
        "kg_comention_components": _q_kg_components,
        "kg_label_prop": _q_kg_label_prop,
        "kg_random_walks": _q_kg_random_walks,
        "kg_walk_skipgrams": _q_kg_walk_skipgrams,
        "kg_hits_tools": _q_kg_hits,
        "kg_node_similarity": _q_kg_node_similarity,
        "meta_struct_flatten": _q_meta_flatten,
        "meta_flatten_agg": _q_meta_flatten_agg,
        "kg_ntriples_lines": _q_ntriples_lines,
        # training-data ops
        "curation_pipeline": _q_curation_pipeline,
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": _q_dedup_minhash_lsh,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_embedding_cosine": _q_dedup_embedding_cosine,
        "dedup_fingerprint": _q_dedup_fingerprint,
        "dedup_canonical_map": _q_dedup_canonical,
        "dedup_embedding_blocked": _q_dedup_embedding_blocked,
        "dedup_semantic": _q_dedup_semantic,
        "dedup_fuzzy_ed1": _q_fuzzy_ed1,
        "ml_kmeans_clusters": _q_kmeans_clusters,
        "ann_pq_codes": _q_ann_pq_codes,
        "ml_logreg_weights": _q_ml_logreg,
        "text_bpe_merges": _q_text_bpe_merges,
        "text_bpe_encode": _q_text_bpe_encode,
        "text_compression_ratio": _q_text_compression,
        "emb_covariance": _q_emb_covariance,
        "ml_pca_component": _q_ml_pca_component,
        "embedding_topk_pairs": _q_embedding_topk_pairs,
        "ann_topk_cosine": _q_ann_topk,
        "ann_filtered_topk": _q_ann_filtered,
        "ann_mmr_rerank": _q_ann_mmr,
        "ann_pq_search": _q_ann_pq_search,
        "ann_ivf_topk": _q_ann_ivf,
        "search_bm25": _q_search_bm25,
        "text_quality": _q_text_quality,
        "text_token_count": _q_text_tokens,
        "text_repetition": _q_text_repetition,
        "text_dup_spans": _q_text_dup_spans,
        "text_chunks": _q_text_chunks,
        "text_pack_sequences": _q_text_pack,
        "text_langid": _q_text_langid,
        "text_top_ngrams": _q_text_top_ngrams,
        "text_unigram_freq": _q_text_unigram_freq,
        "events_cumsum": _q_events_cumsum,
        "events_lag": _q_events_lag,
        "events_moving_sum": _q_events_moving_sum,
        "events_rank": _q_events_rank,
        "events_days_intersect": _q_events_days_intersect,
        "events_days_except": _q_events_days_except,
        "events_late_tag": _q_events_late,
        "events_funnel": _q_events_funnel,
        "events_transitions": _q_events_transitions,
        "events_retention_cohorts": _q_events_retention,
        "rel_rollup": _q_rel_rollup,
        "text_fingerprint": _q_text_fingerprint,
        "multimodal_features": _q_multimodal,
        "multimodal_resize": _q_multimodal_resize,
        "multimodal_frame_sample": _q_multimodal_frames,
        "sample_hash": _q_sample_hash,
        "sample_stratified": _q_sample_stratified,
        "sample_per_key": _q_sample_per_key,
        "sample_train_val_test": _q_sample_split,
        "diag_source_size_histogram": _q_source_size_histogram,
        "approx_distinct_orders": _q_approx_distinct,
        "approx_distinct_custs_by_year": _q_approx_distinct_grouped,
        "cms_part_frequencies": _q_cms_parts,
        "rel_anti_join_customers": _q_rel_anti_join,
        "emb_grouped_centroids": _q_emb_centroids,
        "text_redact": _q_text_redact,
        "contamination_check": _q_contamination,
        "text_tfidf": _q_text_tfidf,
        "curation_cap_per_source": _q_cap_per_source,
        "rel_quantiles": _q_rel_quantiles,
        "rel_quantiles_by_flag": _q_rel_quantiles_by_flag,
        "rel_quantiles_cont": _q_rel_quantiles_cont,
        "rel_tpch_q3": _q_rel_tpch_q3,
        "events_sliding_window": _q_events_sliding_window,
        # relational operator demos
        "rel_groupby_lineitem": _q_rel_lineitem,
        "rel_join_orders_customer": _q_rel_mktsegment,
        "rel_topk_customers": _q_rel_topk_customers,
        "rel_first_order_per_customer": _q_rel_first_order,
        "rel_revenue_by_brand": _q_rel_brand,
        "events_sessionize": _q_events_sessionize,
        "events_asof_join": _q_events_asof,
        "events_interval_join": _q_events_interval_join,
        "events_window_agg": _q_events_window,
        "events_json_props_sum": _q_events_json,
        "rel_bloom_semi_join": _q_rel_bloom_semi_join,
        "events_pivot_counts": _q_events_pivot,
        "events_gap_fill": _q_events_gap_fill,
        "events_anomaly": _q_events_anomaly,
        "rel_percent_rank": _q_rel_percent_rank,
        "events_collapse_bursts": _q_events_collapse,
        "rel_cube": _q_rel_cube,
        "kg_bgp_conv_tools": _q_kg_bgp_conv_tools,
        "kg_bgp_mention_tool": _q_kg_bgp_mention_tool,
        "rel_cov_qty_price": _q_rel_cov,
        "events_time_weighted": _q_events_twa,
        "rel_tpch_q5": _q_rel_tpch_q5,
        "rel_tpch_q17": _q_rel_tpch_q17,
        "freq_heavy_hitters": _q_freq_heavy_hitters,
        "events_window_distinct": _q_events_window_distinct,
        "rel_ntile": _q_rel_ntile,
        "curation_mix_sources": _q_curation_mix_sources,
        "rel_quantile_sketch": _q_rel_quantile_sketch,
        "rel_full_outer_activity": _q_rel_full_outer,
        "rel_mad_by_flag": _q_rel_mad,
        "events_top_per_user": _q_events_argmax,
        "events_error_recovery": _q_events_error_recovery,
        "rel_skyline": _q_rel_skyline,
        "events_mode_per_user": _q_events_mode,
        "events_type_diversity": _q_events_diversity,
        "events_type_xcorr": _q_events_xcorr,
        "events_topk_with_ties": _q_events_topk_ties,
        "events_ffill_purchase": _q_events_ffill,
        "rel_unpivot_measures": _q_rel_unpivot,
        "rel_ols_slope": _q_rel_ols,
        "rel_weighted_median": _q_rel_wmedian,
        "events_cum_distinct_types": _q_events_cum_distinct,
        "rel_ratio_to_report": _q_rel_ratio_to_report,
        "kg_inferred_types": _q_kg_inferred_types,
        "kg_negative_edges": _q_kg_negative_edges,
        "rel_ks_drift": _q_rel_ks_drift,
        "rel_trimmed_mean": _q_rel_trimmed_mean,
        "events_longest_streak": _q_events_longest_streak,
        "rel_cume_dist": _q_rel_cume_dist,
        "kg_bgp_optional_link": _q_kg_bgp_optional_link,
        "kg_triple_provenance": _q_kg_provenance,
        "text_kwic": _q_text_kwic,
        "emb_random_projection": _q_emb_random_projection,
        "kg_scc_tools": _q_kg_scc_tools,
        "events_scd2_intervals": _q_events_scd2,
        "quality_audit_events": _q_quality_audit,
        "rel_mannwhitney_u": _q_rel_mannwhitney,
        "cq_response_latency": _q_cq_response_latency,
        "events_top_paths": _q_events_top_paths,
        "rel_pareto_abc": _q_rel_pareto_abc,
        "cq_trending_tools": _q_cq_trending_tools,
        "events_stickiness": _q_events_stickiness,
        "kg_bgp_conv_entity": _q_kg_bgp_conv_entity,
        "kg_completeness_metrics": _q_kg_completeness,
        "events_attribution": _q_events_attribution,
        "dedup_cluster_size_hist": _q_dedup_cluster_size_hist,
        "kg_type_rollup_counts": _q_kg_type_rollup,
        "events_robust_anomaly": _q_events_robust_anomaly,
        "kg_clustering_coeff": _q_kg_clustering,
        "events_winsorized": _q_events_winsorized,
        "events_trailing_sum_1h": _q_events_trailing_sum,
        "events_time_in_state": _q_events_time_in_state,
        "kg_bgp_filtered": _q_kg_bgp_filtered,
        "kg_bgp_union": _q_kg_bgp_union,
        "kg_bgp_minus": _q_kg_bgp_minus,
        "kg_bgp_path": _q_kg_bgp_path,
        "kg_bgp_alt": _q_kg_bgp_alt,
        "kg_construct_cooccurs": _q_kg_construct_cooccurs,
        "kg_sparql_group_agg": _q_kg_sparql_group_agg,
        "kg_adamic_adar": _q_kg_adamic_adar,
        "events_entropy_by_user": _q_events_entropy,
        "text_pmi_bigrams": _q_text_pmi_bigrams,
        "rel_above_avg_orders": _q_rel_above_avg,
        "dedup_prefix": _q_dedup_prefix,
        "rel_tpch_q18": _q_rel_tpch_q18,
        "events_chi2_dow": _q_events_chi2,
        "kg_assortativity": _q_kg_assortativity,
        "kg_sparql_ask": _q_kg_sparql_ask,
        "kg_describe": _q_kg_describe,
        "events_ab_test": _q_events_ab_test,
        "dedup_suffix": _q_dedup_suffix,
        "text_zipf_fit": _q_text_zipf_fit,
        "kg_group_concat": _q_kg_group_concat,
        "kg_incremental_delta": _q_kg_incremental_delta,
        "kg_bgp_transitive": _q_kg_bgp_transitive,
        "kg_sparql_topk": _q_kg_sparql_topk,
        "dedup_keep_best": _q_dedup_keep_best,
        "curation_char_budget": _q_curation_char_budget,
        "kg_void_stats": _q_kg_void_stats,
        "kg_bgp_reordered": _q_kg_bgp_reordered,
        "privacy_k_anonymity": _q_privacy_k_anonymity,
        "rel_tpch_q6": _q_rel_tpch_q6,
        "rel_tpch_q14": _q_rel_tpch_q14,
        "rel_fk_audit": _q_rel_fk_audit,
        "rel_tpch_q10": _q_rel_tpch_q10,
        "rel_tpch_q19": _q_rel_tpch_q19,
        "rel_tpch_q4": _q_rel_tpch_q4,
        "rel_tpch_q12": _q_rel_tpch_q12,
        "rel_tpch_q13": _q_rel_tpch_q13,
        "rel_tpch_q7": _q_rel_tpch_q7,
        "rel_tpch_q8": _q_rel_tpch_q8,
        "rel_tpch_q9": _q_rel_tpch_q9,
        "rel_tpch_q11": _q_rel_tpch_q11,
        "rel_tpch_q15": _q_rel_tpch_q15,
        "rel_tpch_q16": _q_rel_tpch_q16,
        "curation_profile": _q_curation_profile,
        "curation_benford": _q_curation_benford,
        "rel_corr_matrix": _q_rel_corr_matrix,
        "text_readability": _q_text_readability,
        "rel_grouping_sets": _q_rel_grouping_sets,
        "text_hash_features": _q_text_hash_features,
        "events_bootstrap_mean": _q_events_bootstrap,
        "search_postings": _q_search_postings,
        "approx_distinct_overlap": _q_approx_overlap,
        "rel_apportion_budget": _q_rel_apportion,
        "rel_mom_revenue": _q_rel_mom_revenue,
        "dedup_containment": _q_dedup_containment,
        "text_langid_confusion": _q_text_langid_confusion,
        "text_surprisal": _q_text_surprisal,
        "rel_zorder_keys": _q_rel_zorder,
        "diag_join_estimate": _q_diag_join_estimate,
        "events_seasonal_decompose": _q_events_seasonal,
        "events_seasonal_anomaly": _q_events_seasonal_anomaly,
        "privacy_pseudonymize": _q_privacy_pseudonymize,
        "rel_rfm_segments": _q_rel_rfm,
        "events_funnel_latency": _q_events_funnel_latency,
        "rel_psi_drift": _q_rel_psi_drift,
        "search_rrf_fusion": _q_search_rrf,
        "events_churn_labels": _q_events_churn_labels,
        "events_peak_concurrency": _q_events_peak_concurrency,
        "rel_tpch_q2": _q_rel_tpch_q2,
        "rel_tpch_q20": _q_rel_tpch_q20,
        "rel_tpch_q21": _q_rel_tpch_q21,
        "rel_tpch_q22": _q_rel_tpch_q22,
        "sample_systematic": _q_sample_systematic,
        "kg_sparql_having": _q_kg_sparql_having,
        "kg_harmonic_centrality": _q_kg_harmonic_centrality,
        "kg_graph_diameter": _q_kg_graph_diameter,
        "emb_label_coherence": _q_emb_label_coherence,
        "rel_merge_upsert": _q_rel_merge_upsert,
        "text_dispersion": _q_text_dispersion,
        "rel_division": _q_rel_division,
        "events_cusum_changepoint": _q_events_cusum,
        "privacy_l_diversity_events": _q_privacy_l_diversity_events,
        "ml_decision_stump": _q_ml_decision_stump,
        "dedup_sorted_neighborhood": _q_dedup_snm,
        "rec_item_cooccur": _q_rec_item_cooccur,
        "ml_knn_classify": _q_ml_knn,
        "search_phrase": _q_search_phrase,
        "rel_gaps_islands": _q_rel_gaps_islands,
        "events_autocorr": _q_events_autocorr,
        "events_survival_table": _q_events_survival,
        "rec_assoc_rules": _q_rec_assoc_rules,
        "privacy_t_closeness": _q_privacy_t_closeness,
        "ml_ols_two_features": _q_ml_ols_two_features,
        "search_boolean": _q_search_boolean,
        "events_rolling_median": _q_events_rolling_median,
        "emb_int8_quantize": _q_emb_int8_quantize,
        "ann_lsh_buckets": _q_ann_lsh_buckets,
        "multimodal_hash_dedup": _q_multimodal_hash_dedup,
        "kg_katz_paths": _q_kg_katz,
        "events_interarrival_hist": _q_events_interarrival,
        "events_ewma_daily": _q_events_ewma,
        "ml_prf_metrics": _q_ml_prf,
        "rec_item_cosine": _q_rec_item_cosine,
        "ml_naive_bayes_model": _q_ml_naive_bayes,
        "ann_range_search": _q_ann_range_search,
        "rel_gini_revenue": _q_rel_gini,
        "sample_weighted": _q_sample_weighted,
        "rel_herfindahl": _q_rel_herfindahl,
        "kg_reciprocity": _q_kg_reciprocity,
        "text_heaps_law": _q_text_heaps_law,
        "rel_spearman": _q_rel_spearman,
        "search_proximity": _q_search_proximity,
        "ml_calibration_bins": _q_ml_calibration_bins,
        "privacy_dp_noisy_counts": _q_privacy_dp_noisy_counts,
        "text_regex_extract": _q_text_regex_extract,
        "rel_lorenz_deciles": _q_rel_lorenz,
        "events_holt_smoothing": _q_events_holt,
        "kg_transitivity": _q_kg_transitivity,
        "events_cohort_revenue": _q_events_cohort_revenue,
        "ml_tree_depth2": _q_ml_tree_depth2,
        "events_decay_engagement": _q_events_decay_engagement,
        "kg_comention_lift": _q_kg_comention_lift,
        "privacy_generalization": _q_privacy_generalization,
        "kg_shacl_validation": _q_kg_shacl_validation,
        "rel_chi2_independence": _q_rel_chi2_independence,
        "kg_two_hop_reach": _q_kg_two_hop,
        "text_rake_keywords": _q_text_rake,
        "ml_adaboost_stumps": _q_ml_adaboost,
        "rel_shipping_sla": _q_rel_shipping_sla,
        "text_type_token_ratio": _q_text_ttr,
        "events_spike_days": _q_events_spike_days,
        "kg_sparql_sample_agg": _q_kg_sparql_sample_agg,
        "kg_sparql_order_offset": _q_kg_sparql_order_offset,
        "kg_property_cardinality": _q_kg_property_cardinality,
        "text_char_density": _q_text_char_density,
        "text_window_cooccur": _q_text_window_cooccur,
        "kg_sparql_filter_regex": _q_kg_sparql_filter_regex,
        "privacy_cell_suppression": _q_privacy_cell_suppression,
        "rel_revenue_pacing": _q_rel_revenue_pacing,
        "events_abandoned_views": _q_events_abandoned_views,
        "ml_pr_curve": _q_ml_pr_curve,
        "rel_forecast_error": _q_rel_forecast_error,
        "sample_ipw_estimate": _q_sample_ipw_estimate,
        "events_pit_features": _q_events_pit_features,
        "multimodal_shard_plan": _q_multimodal_shard_plan,
        "text_vocab_coverage": _q_text_vocab_coverage,
        "dedup_rate_by_source": _q_dedup_rate_by_source,
        "events_runs_test": _q_events_runs_test,
        "kg_dangling_objects": _q_kg_dangling_objects,
        "ml_cv_stump": _q_ml_cv_stump,
        "text_novelty_scores": _q_text_novelty_scores,
        "diag_key_skew": _q_diag_key_skew,
        "text_stopword_discovery": _q_text_stopword_discovery,
        "rel_aov_by_order_rank": _q_rel_aov_by_order_rank,
        "rel_top3_parts_per_brand": _q_rel_top3_parts_per_brand,
        "kg_rdfs_inference": _q_kg_rdfs_inference,
        "rel_scd2_intervals": _q_rel_scd2_intervals,
        "events_cumulative_users": _q_events_cumulative_users,
        "rel_orders_within_week": _q_rel_orders_within_week,
        "text_bigram_surprisal": _q_text_bigram_surprisal,
        "events_session_paths": _q_events_session_paths,
        "kg_transe_negatives": _q_kg_transe_negatives,
        "text_contamination": _q_text_contamination,
        "text_repetition_filter": _q_text_repetition_filter,
        "text_pack_plan": _q_text_pack_plan,
        "kg_sparql_path_star": _q_kg_sparql_path_star,
        "ml_auc": _q_ml_auc,
        "rel_late_arrivals": _q_rel_late_arrivals,
        "rel_division_all_priorities": _q_rel_division_all_priorities,
        "privacy_l_diversity": _q_privacy_l_diversity,
        "search_kwic": _q_search_kwic,
        "ml_label_centroids": _q_ml_label_centroids,
        "kg_sparql_path_opt": _q_kg_sparql_path_opt,
        "rel_reorder_gaps": _q_rel_reorder_gaps,
        "sample_exact_split": _q_sample_exact_split,
        "events_rolling_distinct_users": _q_events_rolling_distinct_users,
        "ml_nearest_centroid": _q_ml_nearest_centroid,
        "rel_cume_dist_prices": _q_rel_cume_dist_prices,
        "text_source_vocab_overlap": _q_text_source_vocab_overlap,
        "events_retention_matrix": _q_events_retention_matrix,
        "ml_best_f1_threshold": _q_ml_best_f1_threshold,
        "dedup_cluster_sizes": _q_dedup_cluster_sizes,
        "events_burst_users": _q_events_burst_users,
        "kg_eigencentrality": _q_kg_eigencentrality,
        "kg_pred_cooccurrence": _q_kg_pred_cooccurrence,
        "rel_target_encoding": _q_rel_target_encoding,
        "curation_dup_weights": _q_curation_dup_weights,
        "ml_mrr": _q_ml_mrr,
        "privacy_uniqueness_risk": _q_privacy_uniqueness,
        "diag_zonemap_prune": _q_diag_zonemap_prune,
        "events_tumbling_dedup": _q_events_tumbling_dedup,
        "kg_sparql_path_neg": _q_kg_sparql_path_neg,
        "ml_cohens_kappa": _q_ml_cohens_kappa,
        "ml_lift_deciles": _q_ml_lift_deciles,
        "rel_theilsen_slope": _q_rel_theilsen,
        "events_windowed_topk": _q_events_windowed_topk,
        "rel_iqr_outliers": _q_rel_iqr_outliers,
        "emb_norm_stats": _q_emb_norm_stats,
        "ml_mcc": _q_ml_mcc,
        "kg_sparql_bind": _q_kg_sparql_bind,
        "search_prefix": _q_search_prefix,
        "ml_gini_gain": _q_ml_gini_gain,
        "diag_equidepth_hist": _q_diag_equidepth_hist,
        "diag_fanout_hist": _q_diag_fanout_hist,
        "events_peak_hour_per_type": _q_events_peak_hour,
        "events_next_best_action": _q_events_next_best,
        "ml_learning_curve": _q_ml_learning_curve,
        "diag_dict_encoding_gain": _q_diag_dict_gain,
        "events_switchback_arms": _q_events_switchback,
        "search_autocomplete_top": _q_search_autocomplete,
        "diag_bloom_fpr": _q_diag_bloom_fpr,
        "text_hapax_ratio": _q_text_hapax_ratio,
        "ml_class_weights": _q_ml_class_weights,
        "curation_dedup_savings": _q_curation_dedup_savings,
        "events_median_gap_per_type": _q_events_median_gap,
        "kg_blocking_quality": _q_kg_blocking_quality,
        "sample_neyman_alloc": _q_sample_neyman_alloc,
        "rel_gap_interpolate": _q_rel_gap_interpolate,
        "rel_running_balance": _q_rel_running_balance,
        "dedup_normalized": _q_dedup_normalized,
        "emb_triplet_accuracy": _q_emb_triplet_accuracy,
        "kg_ego_subgraph": _q_kg_ego_subgraph,
        "diag_selectivity_profile": _q_diag_selectivity,
        "emb_quantization_error": _q_emb_quantization_error,
        "sample_block_bootstrap": _q_sample_block_bootstrap,
        "ml_wilson_ci": _q_ml_wilson_ci,
        "text_rank_drift": _q_text_rank_drift,
        "emb_split_drift": _q_emb_split_drift,
        "ml_brier_score": _q_ml_brier_score,
        "kg_pred_fanout_p99": _q_kg_pred_fanout_p99,
        "events_haar_energy": _q_events_haar_energy,
        "rel_kendall_tau": _q_rel_kendall_tau,
        "kg_sameas_rewrite": _q_kg_sameas_rewrite,
        "ml_point_biserial": _q_ml_point_biserial,
        "events_hysteresis_alarms": _q_events_hysteresis_alarms,
        "dedup_weighted_jaccard": _q_dedup_weighted_jaccard,
        "rel_ledger_reconcile": _q_rel_ledger_reconcile,
        "events_new_vs_returning": _q_events_new_vs_returning,
        "search_spell_suggest": _q_search_spell_suggest,
        "privacy_min_k_report": _q_privacy_min_k_report,
        "rel_date_fk_audit": _q_rel_date_fk_audit,
        "ml_permutation_importance": _q_ml_permutation_importance,
        "events_mann_kendall": _q_events_mann_kendall,
        "emb_isotropy": _q_emb_isotropy,
        "rel_hierarchical_alloc": _q_rel_hierarchical_alloc,
        "events_fano_factor": _q_events_fano_factor,
        "events_max_type_run": _q_events_max_type_run,
        "kg_sparql_unbound_filter": _q_kg_sparql_unbound_filter,
        "kg_sparql_exists_filter": _q_kg_sparql_exists_filter,
        "text_simpson_diversity": _q_text_simpson_diversity,
        "rel_xyz_classification": _q_rel_xyz_classification,
        "rel_revenue_waterfall": _q_rel_revenue_waterfall,
        "kg_object_namespaces": _q_kg_object_namespaces,
        "ml_cost_curve": _q_ml_cost_curve,
        "kg_literal_length_stats": _q_kg_literal_length_stats,
        "rel_unit_price_audit": _q_rel_unit_price_audit,
        "dedup_cross_source_clusters": _q_dedup_cross_source_clusters,
        "text_term_position_bias": _q_text_term_position_bias,
        "rel_storage_tiering": _q_rel_storage_tiering,
        "kg_schema_summary": _q_kg_schema_summary,
        "sample_temporal_split": _q_sample_temporal_split,
        "text_dup_ngram_coverage": _q_text_dup_ngram_coverage,
        "ml_mcnemar": _q_ml_mcnemar,
        "emb_norm_outliers": _q_emb_norm_outliers,
        "events_reactivations": _q_events_reactivations,
        "sample_rolling_origin": _q_sample_rolling_origin,
        "kg_degree_mixing_matrix": _q_kg_degree_mixing,
        "rel_price_index": _q_rel_price_index,
        "rel_fifo_cogs": _q_rel_fifo_cogs,
        "rel_suppliers_per_part_hist": _q_rel_suppliers_per_part,
        "kg_redundant_assertions": _q_kg_redundant_assertions,
        "kg_tool_trend": _q_kg_tool_trend,
        "events_littles_law": _q_events_littles_law,
        "diag_hash_partition_balance": _q_diag_hash_partition_balance,
        "ml_shapley_two_features": _q_ml_shapley_two_features,
        "events_dose_response": _q_events_dose_response,
        "diag_parquet_footers": _q_diag_parquet_footers,
        "privacy_date_shift": _q_privacy_date_shift,
        "rel_two_way_interaction": _q_rel_two_way_interaction,
        "kg_construct_agg_triples": _q_kg_construct_agg,
        "ml_fairness_odds_gap": _q_ml_fairness_odds_gap,
        "events_attribution_windows": _q_events_attribution_windows,
        "text_cross_perplexity": _q_text_cross_perplexity,
        "kg_rich_club": _q_kg_rich_club,
        "ml_margin_histogram": _q_ml_margin_histogram,
        "kg_label_assortativity": _q_kg_label_assortativity,
        "sample_floor_allocation": _q_sample_floor_allocation,
        "events_dominant_period": _q_events_dominant_period,
        "kg_ktruss_edges": _q_kg_ktruss,
        "kg_subclass_depth": _q_kg_subclass_depth,
        "dedup_incremental": _q_dedup_incremental,
        "text_source_term_lift": _q_text_source_term_lift,
        "events_markov_stationary": _q_events_markov_stationary,
        "text_term_burstiness": _q_text_term_burstiness,
        "sample_balanced_classes": _q_sample_balanced_classes,
        "ann_recall_at_k": _q_ann_recall_at_k,
        "text_gopher_rules": _q_text_gopher_rules,
        "ml_ndcg": _q_ml_ndcg,
        "events_type_jaccard": _q_events_type_jaccard,
        "sample_coreset_kcenter": _q_sample_coreset_kcenter,
    }


def _tree_split_ctes(sub: str, tag: str) -> str:
    """CTE chain picking the best (feature, threshold, miscls) split of
    ``sub`` (columns q, d, pos, n) — ends in ``{tag}pf`` with a 'none'
    fallback row when no threshold leaves both children non-empty.
    Mirrors ``_q_ml_tree_depth2.best_split`` exactly: the all-left
    threshold is excluded (nl < tot), tie-break (mis, feat, thr)."""
    return f"""
{tag}f AS (
  SELECT 'q' AS feat, q AS thr, sum(n) AS nq, sum(n * pos) AS pq
  FROM {sub} GROUP BY 1, 2
  UNION ALL
  SELECT 'd', d, sum(n), sum(n * pos) FROM {sub} GROUP BY 1, 2),
{tag}t AS (SELECT sum(n) AS tot, sum(n * pos) AS totp FROM {sub}),
{tag}c AS (SELECT feat, thr,
                  sum(nq) OVER (PARTITION BY feat ORDER BY thr
                                ROWS UNBOUNDED PRECEDING) AS nl,
                  sum(pq) OVER (PARTITION BY feat ORDER BY thr
                                ROWS UNBOUNDED PRECEDING) AS pl
           FROM {tag}f),
{tag}m AS (SELECT feat, thr,
                  least(pl, nl - pl)
                  + least(t.totp - pl, (t.tot - nl) - (t.totp - pl))
                    AS mis
           FROM {tag}c, {tag}t t WHERE nl < t.tot),
{tag}p AS (SELECT feat, thr, mis FROM {tag}m
           ORDER BY mis, feat, thr LIMIT 1),
{tag}pf AS (SELECT * FROM {tag}p
            UNION ALL
            SELECT 'none', CAST(0 AS BIGINT),
                   (SELECT least(totp, tot - totp) FROM {tag}t)
            WHERE NOT EXISTS (SELECT 1 FROM {tag}p))"""


def oracle_sql() -> dict[str, str]:
    fdir = generator.ensure_fixtures(SF_ORACLE)
    P = _sql_prefix(fdir)
    out = {
        "kg_structural_triples": P + "SELECT * FROM (" + _structural_sql() + ")",
        "kg_mention_triples": P + _mention_sql(),
        "kg_dead_letter": f"""
            SELECT conv_id AS src_conv_id, turn_idx AS src_turn_idx,
                   'tool' AS key, tool AS value, 'none_value' AS reason
            FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
            WHERE NOT ({TOOL_OK_SQL})""",
        "kg_pipeline_full": P + "SELECT * FROM (" + "\nUNION\n".join([
            _structural_sql(), _mention_sql(), _mention_entity_sql(),
            _link_sql(), _enrich_sql(fdir)]) + ")",
        "kg_inferred_types": P + f"""
            SELECT DISTINCT '{C.WD}' || q.e AS entity,
                   '{C.ENT}type/' || q.t AS type_iri
            FROM (
              WITH RECURSIVE r(e, t) AS (
                SELECT l.entity_id, e2.type_id
                FROM linked l
                JOIN read_parquet('{fdir}/entities.parquet') e2
                  ON e2.entity_id = l.entity_id
                WHERE l.entity_id IS NOT NULL
                UNION
                SELECT r.e, th.super_type_id
                FROM r JOIN read_parquet('{fdir}/type_hierarchy.parquet')
                  th ON th.type_id = r.t
              ) SELECT e, t FROM r) q
            ORDER BY 1, 2""",
        "kg_negative_edges": P + """
            , ce AS (SELECT DISTINCT a.canonical AS u, b.canonical AS v
                     FROM mention a JOIN mention b
                       ON a.turn_iri = b.turn_iri
                      AND a.canonical < b.canonical),
            und AS (SELECT u, v FROM ce UNION SELECT v, u FROM ce),
            nn AS (SELECT node,
                          row_number() OVER (ORDER BY node) - 1 AS pos
                   FROM (SELECT DISTINCT u AS node FROM und)),
            cnt AS (SELECT count(*) AS n FROM nn),
            cand AS (SELECT a.node, j.j,
                            (a.pos * 2654435761 + j.j * 40503) % cnt.n
                              AS cpos
                     FROM nn a CROSS JOIN cnt,
                          (VALUES (1), (2), (3), (4), (5), (6)) j(j)),
            named AS (SELECT c.node, c.j, b.node AS neg
                      FROM cand c JOIN nn b ON b.pos = c.cpos),
            surv AS (SELECT * FROM named
                     WHERE node != neg AND NOT EXISTS (
                       SELECT 1 FROM und
                       WHERE und.u = named.node AND und.v = named.neg)),
            ranked AS (SELECT node, neg, j,
                              row_number() OVER (PARTITION BY node
                                                 ORDER BY j) AS rk
                       FROM surv)
            SELECT node, neg, j FROM ranked WHERE rk <= 3
            ORDER BY 1, 3""",
        "cq_turns_per_role": f"""
            SELECT role, count(*) AS n
            FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
            GROUP BY role ORDER BY role""",
        "cq_mean_turns_per_conv": f"""
            SELECT count(DISTINCT conv_id) AS n_convs, count(*) AS total_turns,
                   CAST(count(*) AS DOUBLE) / count(DISTINCT conv_id)
                     AS mean_turns
            FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')""",
        "cq_busiest_day_by_tool": f"""
            SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
            FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
            WHERE {TOOL_OK_SQL}
            GROUP BY 1 ORDER BY n DESC, day ASC LIMIT 1""",
        "cq_convs_over_10_turns": f"""
            SELECT count(*) AS n_convs FROM (
              SELECT conv_id FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
              GROUP BY conv_id HAVING count(*) > 10)""",
        "cq_turns_in_month": f"""
            SELECT count(*) AS n_turns
            FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
            WHERE strftime(ts, '%Y-%m') = '2025-02'""",
        "cq_distinct_mentions": P + "SELECT count(*) AS n_forms FROM forms",
        "cq_top_tools": f"""
            SELECT tool, count(*) AS n
            FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
            WHERE {TOOL_OK_SQL}
            GROUP BY 1 ORDER BY n DESC, tool ASC LIMIT 5""",
        "cq_conv_stats_salted": f"""
            SELECT conv_id, count(*) AS n_turns, min(ts) AS first_ts,
                   max(ts) AS last_ts
            FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
            GROUP BY 1 ORDER BY 1""",
        "cq_convs_mentioning": P + """
            SELECT count(DISTINCT conv_id) AS n_convs FROM mention
            WHERE canonical = 'coffee'""",
        "cq_linked_forms": P + """
            SELECT count(*) AS n_linked FROM linked
            WHERE entity_id IS NOT NULL""",
        "cq_busiest_conv": f"""
            SELECT conv_id, count(*) AS n
            FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
            GROUP BY 1 ORDER BY n DESC, conv_id ASC LIMIT 1""",
        "cq_avg_mentions_per_turn": P + """
            SELECT (SELECT count(*) FROM mention) AS n_mentions,
                   (SELECT count(*) FROM t) AS n_turns,
                   CAST((SELECT count(*) FROM mention) AS DOUBLE)
                     / (SELECT count(*) FROM t) AS avg_mentions""",
        "cq_turns_per_weekday": f"""
            SELECT CAST(isodow(ts) AS BIGINT) AS dow, count(*) AS n
            FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
            GROUP BY 1 ORDER BY 1""",
        "cq_convs_with_min_tools": f"""
            SELECT count(*) AS n_convs FROM (
              SELECT conv_id FROM (
                SELECT DISTINCT conv_id, tool
                FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
                WHERE {TOOL_OK_SQL})
              GROUP BY conv_id HAVING count(*) > 2)""",
        "cq_top_tool_per_role": f"""
            SELECT role, tool, n FROM (
              SELECT role, tool, count(*) AS n,
                     row_number() OVER (PARTITION BY role
                                        ORDER BY count(*) DESC, tool ASC)
                       AS rk
              FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
              WHERE {TOOL_OK_SQL}
              GROUP BY role, tool)
            WHERE rk = 1 ORDER BY role""",
        "cq_turns_per_year_month": f"""
            SELECT CAST(year(ts) AS BIGINT) AS y,
                   CAST(month(ts) AS BIGINT) AS m, count(*) AS n
            FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "cq_conv_tool_paths": f"""
            SELECT conv_id,
                   string_agg(tool, '->' ORDER BY turn_idx) AS tool_path
            FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
            WHERE {TOOL_OK_SQL}
            GROUP BY 1 ORDER BY 1""",
        # floor (never round) on both engines: DuckDB rounds half-away-
        # from-zero, numpy half-to-even — floor is bit-identical. Distance
        # is squared-distance to the CELL CENTER (a pure function of the
        # cell key), which is what makes the per-cell memo sound.
        "geo_reverse_geocode": f"""
            WITH g AS (
              SELECT conv_id, CAST(floor(lat) AS BIGINT) AS fla,
                     CAST(floor(lon) AS BIGINT) AS flo
              FROM read_parquet('{fdir}/conv_geo.parquet')),
            p AS (
              SELECT place_id, lat, lon, CAST(floor(lat) AS BIGINT) AS fla,
                     CAST(floor(lon) AS BIGINT) AS flo
              FROM read_parquet('{fdir}/places.parquet')),
            cand AS (
              SELECT g.conv_id, g.fla, g.flo, p.place_id,
                     (g.fla + 0.5 - p.lat) * (g.fla + 0.5 - p.lat)
                     + (g.flo + 0.5 - p.lon) * (g.flo + 0.5 - p.lon) AS d
              FROM g JOIN p ON g.fla = p.fla AND g.flo = p.flo),
            r AS (SELECT *, row_number() OVER
                    (PARTITION BY conv_id ORDER BY d, place_id) AS rk
                  FROM cand)
            SELECT conv_id,
                   CAST(fla AS VARCHAR) || ':' || CAST(flo AS VARCHAR)
                     AS coord_key,
                   place_id
            FROM r WHERE rk = 1 ORDER BY conv_id""",
        "meta_struct_flatten": f"""
            SELECT conv_id,
                   meta.client AS "meta.client",
                   meta.device.os AS "meta.device.os",
                   meta.device.version AS "meta.device.version",
                   meta.latency_ms AS "meta.latency_ms",
                   meta.flags.beta AS "meta.flags.beta",
                   meta.flags.verbose AS "meta.flags.verbose"
            FROM read_parquet('{fdir}/conv_meta.parquet')""",
        "meta_flatten_agg": f"""
            SELECT meta.client AS client, meta.device.os AS os,
                   count(*) AS n,
                   CAST(sum(meta.latency_ms) AS BIGINT) AS sum_latency
            FROM read_parquet('{fdir}/conv_meta.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "kg_ntriples_lines": P + f"""
            SELECT '<' || subj || '> <' || pred || '> ' ||
                   CASE WHEN obj_is_literal THEN
                     '"' || replace(replace(replace(obj,
                         chr(92), chr(92) || chr(92)),
                         '"', chr(92) || '"'),
                         chr(10), chr(92) || 'n')
                     || '"^^<' || coalesce(obj_datatype, '{C.XSD_STRING}')
                     || '> .'
                   ELSE '<' || obj || '> .' END AS text
            FROM ({_structural_sql()})""",
        # ------ training-data ops (documents/embeddings testdata views) ----
        "dedup_exact": """
            SELECT md5(text) AS text_hash, count(*) AS n_dups,
                   min(doc_id) AS keep_doc_id
            FROM documents GROUP BY 1 ORDER BY 1""",
        # the whole curation chain as ONE SQL: quality gate -> exact-dedup
        # keep-lowest -> near-dup doc_b drop (pairs computed over quality
        # survivors only, mirroring pipelines/curation.py stage order)
        "curation_pipeline": """
            WITH s AS (
              SELECT doc_id, text, length(text) AS n_chars,
                     len(string_split(text, ' ')) AS n_words,
                     length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                       AS n_alpha
              FROM documents),
            clean AS (
              SELECT * FROM s
              WHERE n_words >= 30
                AND CAST(n_alpha AS DOUBLE) / greatest(n_chars, 1) >= 0.8),
            keepers AS (
              SELECT min(doc_id) AS doc_id FROM clean GROUP BY md5(text)),
            docs AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                     FROM clean),
            sh AS (SELECT DISTINCT doc_id,
                          unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                  FOR i IN range(1, len(ws) - 1)]) AS s
                   FROM docs),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                             count(*) AS ni
                      FROM sh a JOIN sh b
                        ON a.s = b.s AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            dups AS (SELECT DISTINCT i.doc_b FROM inter i
                     JOIN sizes sa ON sa.doc_id = i.doc_a
                     JOIN sizes sb ON sb.doc_id = i.doc_b
                     WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni)
                           >= 0.5)
            SELECT c.doc_id, c.n_words, c.n_chars
            FROM clean c JOIN keepers k USING (doc_id)
            WHERE c.doc_id NOT IN (SELECT doc_b FROM dups)
            ORDER BY c.doc_id""",
        "dedup_ngram_jaccard": _JACCARD_SQL,
        # MinHash banding at 32x2 is sized to the 0.5 threshold itself
        # (miss p ~1e-4 AT the threshold, <4e-7 above J=0.6) and the verify
        # stage is exact, so its output equals the brute-force oracle on
        # these corpora (stages/dedup.py docstring).
        "dedup_minhash_lsh": _JACCARD_SQL,
        # SimHash reproduced bit-exactly in SQL: per distinct lowercased
        # word, h = little-endian uint64 of md5(w)[:8] (hex-digit arithmetic
        # replaces byte extraction); per-bit +-1 vote, fp = majority bits;
        # all pairs at bit_count(xor) <= 3. The Ray side's 4x16-bit band
        # bucketing is pigeonhole-complete for distance <= 3, so the
        # brute-force SQL equals the banded pipeline exactly.
        "dedup_simhash": """
            WITH w AS (
              SELECT DISTINCT doc_id, w FROM (
                SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
                FROM documents)
            ), h AS (
              SELECT doc_id, md5(w) AS hx FROM w
            ), bits AS (
              SELECT doc_id, t.j,
                     CASE WHEN ((16 * (strpos('0123456789abcdef',
                                       substring(hx, 2*(t.j//8)+1, 1)) - 1)
                                 + (strpos('0123456789abcdef',
                                       substring(hx, 2*(t.j//8)+2, 1)) - 1))
                                // CAST(power(2, t.j % 8) AS BIGINT)) % 2 = 1
                          THEN 1 ELSE -1 END AS v
              FROM h CROSS JOIN range(64) t(j)
            ), acc AS (
              SELECT doc_id, j, sum(v) AS s FROM bits GROUP BY 1, 2
            ), fp AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN s > 0
                              THEN CAST(1 AS UBIGINT) << CAST(j AS INTEGER)
                              ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS fp
              FROM acc GROUP BY 1
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.fp, b.fp)) <= 3
            ORDER BY 1, 2""",
        "dedup_embedding_cosine": _EMB_NEAR_DUP_SQL,
        # transitive closure of the exact-Jaccard pair graph via a recursive
        # CTE; canon = min reachable node; docs in no pair keep themselves
        "dedup_canonical_map": "WITH RECURSIVE " + _SHINGLE_CTE + ","
            + _CANON_CTE + """
            SELECT d.doc_id, coalesce(c.c, d.doc_id) AS canon_id,
                   coalesce(c.c, d.doc_id) <> d.doc_id AS is_dup
            FROM documents d LEFT JOIN canon c ON c.node = d.doc_id
            ORDER BY d.doc_id""",
        "dedup_cluster_size_hist": "WITH RECURSIVE " + _SHINGLE_CTE + ","
            + _CANON_CTE + """,
            m AS (SELECT d.doc_id, coalesce(c.c, d.doc_id) AS canon_id
                  FROM documents d LEFT JOIN canon c ON c.node = d.doc_id),
            s AS (SELECT canon_id, count(*) AS sz FROM m GROUP BY 1)
            SELECT CAST(sz AS BIGINT) AS cluster_size,
                   count(*) AS n_clusters
            FROM s GROUP BY 1 ORDER BY 1""",
        "dedup_embedding_blocked": _EMB_NEAR_DUP_SQL,
        "embedding_topk_pairs": """
            SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6)
                     AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            ORDER BY cosine DESC, doc_a, doc_b LIMIT 20""",
        "ann_mmr_rerank": _mmr_sql(),
        "ann_filtered_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id < 8),
            c AS (SELECT vec_id, embedding FROM embeddings
                  WHERE label = 3
                    AND vec_id NOT IN (SELECT query_id FROM q)),
            s AS (SELECT q.query_id, c.vec_id,
                         round(list_cosine_similarity(
                           CAST(q.qe AS DOUBLE[]),
                           CAST(c.embedding AS DOUBLE[])), 6) AS cosine
                  FROM q CROSS JOIN c),
            r AS (SELECT *, row_number() OVER
                    (PARTITION BY query_id ORDER BY cosine DESC, vec_id)
                    AS rank FROM s)
            SELECT query_id, vec_id, cosine, rank FROM r
            WHERE rank <= 10 ORDER BY query_id, rank""",
        "ann_topk_cosine": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id < 8),
            c AS (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id NOT IN (SELECT query_id FROM q)),
            s AS (SELECT q.query_id, c.vec_id,
                         round(list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6)
                           AS cosine
                  FROM q CROSS JOIN c),
            r AS (SELECT *, row_number() OVER
                    (PARTITION BY query_id ORDER BY cosine DESC, vec_id)
                    AS rank FROM s)
            SELECT query_id, vec_id, cosine, rank FROM r
            WHERE rank <= 10 ORDER BY query_id, rank""",
        "text_quality": f"""
            SELECT doc_id, length(text) AS n_chars,
                   len(string_split(text, ' ')) AS n_words,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                     AS n_alpha,
                   CAST(len(list_filter(string_split(lower(text), ' '),
                        w -> w IN ({_STOPWORD_SQL}))) AS DOUBLE)
                     / len(string_split(text, ' ')) AS stopword_ratio,
                   CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / len(string_split(text, ' ')) AS mean_word_len
            FROM documents ORDER BY doc_id""",
        "text_langid": _langid_sql(),
        "kg_pagerank": P + """
            , triples AS (""" + _structural_sql() + """
              UNION """ + _mention_sql() + """),
            edges AS (SELECT DISTINCT subj AS src, obj AS dst FROM triples
                      WHERE NOT obj_is_literal),
            """ + _pagerank_sql(),
        "kg_ppr_tools": P + """
            , triples AS (""" + _structural_sql() + """
              UNION """ + _mention_sql() + """),
            edges AS (SELECT DISTINCT subj AS src, obj AS dst FROM triples
                      WHERE NOT obj_is_literal),
            """ + _pagerank_sql(
            seed_sql="{n} LIKE '" + C.ENT + "tool/%'"),
        "kg_kcore_edges": P + """
            , triples AS (""" + _structural_sql() + """
              UNION """ + _mention_sql() + """),
            edges AS (SELECT DISTINCT subj AS src, obj AS dst FROM triples
                      WHERE NOT obj_is_literal),
            """ + _kcore_sql(KCORE_K, 8),
        "kg_degree_stats": P + """
            , triples AS (""" + _structural_sql() + """
              UNION """ + _mention_sql() + """),
            edges AS (SELECT DISTINCT subj AS src, obj AS dst FROM triples
                      WHERE NOT obj_is_literal),
            deg AS (SELECT src AS node, 1 AS o, 0 AS i FROM edges
                    UNION ALL SELECT dst, 0, 1 FROM edges)
            SELECT node, CAST(sum(o) AS BIGINT) AS out_deg,
                   CAST(sum(i) AS BIGINT) AS in_deg
            FROM deg GROUP BY 1 ORDER BY 1""",
        "dedup_fuzzy_ed1": f"""
            WITH w AS (SELECT DISTINCT surface_form AS w
                       FROM read_parquet('{fdir}/vocab.parquet'))
            SELECT a.w AS form_a, b.w AS form_b,
                   CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
            FROM w a JOIN w b ON a.w < b.w AND levenshtein(a.w, b.w) <= 1
            ORDER BY 1, 2""",
        # WITH RECURSIVE may prefix a CTE list whose first members are not
        # recursive — only `walk` is
        "kg_bfs_distances": P.replace("\nWITH t AS", "\nWITH RECURSIVE t AS",
                                      1) + """
            , triples AS (""" + _structural_sql() + """
              UNION """ + _mention_sql() + """),
            edges AS (SELECT DISTINCT subj AS src, obj AS dst FROM triples
                      WHERE NOT obj_is_literal),
            und AS (SELECT src AS u, dst AS v FROM edges
                    UNION SELECT dst, src FROM edges),
            walk(node, d) AS (
                SELECT DISTINCT u AS node, 0 AS d FROM und
                WHERE u LIKE '""" + C.ENT + """tool/%'
                UNION
                SELECT und.v, w.d + 1 FROM walk w JOIN und ON und.u = w.node
                WHERE w.d < """ + str(BFS_MAX_DEPTH) + """)
            SELECT node, CAST(min(d) AS BIGINT) AS dist FROM walk
            GROUP BY 1 ORDER BY 1""",
        "kg_comention_components": P.replace(
            "\nWITH t AS", "\nWITH RECURSIVE t AS", 1) + """
            , ce AS (SELECT DISTINCT a.canonical AS u, b.canonical AS v
                     FROM mention a JOIN mention b
                       ON a.turn_iri = b.turn_iri
                      AND a.canonical < b.canonical),
            und AS (SELECT u, v FROM ce UNION SELECT v, u FROM ce),
            cnodes AS (SELECT DISTINCT u AS node FROM und),
            walk(node, lbl) AS (
                SELECT node, node FROM cnodes
                UNION
                SELECT e.v, w.lbl FROM walk w JOIN und e ON e.u = w.node)
            SELECT node, min(lbl) AS component FROM walk
            GROUP BY 1 ORDER BY 1""",
        "kg_label_prop": P + _label_prop_sql(3),
        "kg_random_walks": P + _random_walks_sql(3),
        "kg_walk_skipgrams": P + _skipgram_sql(),
        "kg_node_similarity": P + """
            , ce AS (SELECT DISTINCT a.canonical AS u, b.canonical AS v
                     FROM mention a JOIN mention b
                       ON a.turn_iri = b.turn_iri
                      AND a.canonical < b.canonical),
            und AS (SELECT u, v FROM ce UNION SELECT v, u FROM ce),
            cn AS (SELECT a.v AS u, b.v AS v, count(*) AS common
                   FROM und a JOIN und b ON a.u = b.u AND a.v < b.v
                   GROUP BY 1, 2),
            deg AS (SELECT u AS node, count(*) AS d FROM und GROUP BY 1)
            SELECT cn.u, cn.v, cn.common, du.d AS deg_u, dv.d AS deg_v,
                   CAST((1000000 * cn.common)
                        // (du.d + dv.d - cn.common) AS BIGINT)
                     AS jaccard_fp
            FROM cn JOIN deg du ON du.node = cn.u
            JOIN deg dv ON dv.node = cn.v
            ORDER BY jaccard_fp DESC, cn.u, cn.v LIMIT 50""",
        "kg_comention_triangles": P + """
            , ce AS (SELECT DISTINCT a.canonical AS u, b.canonical AS v
                     FROM mention a JOIN mention b
                       ON a.turn_iri = b.turn_iri
                      AND a.canonical < b.canonical)
            SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM ce e1 JOIN ce e2 ON e2.u = e1.v
            JOIN ce e3 ON e3.u = e1.u AND e3.v = e2.v""",
        "text_top_ngrams": "WITH " + _SHINGLE_CTE + """
            SELECT s AS ngram, CAST(count(*) AS BIGINT) AS df
            FROM sh GROUP BY 1
            ORDER BY df DESC, ngram ASC LIMIT 20""",
        "text_unigram_freq": """
            WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' '))
                              AS w
                       FROM documents),
            cnt AS (SELECT w, count(*) AS c FROM w GROUP BY 1),
            doc AS (SELECT w.doc_id, sum(c.c) AS s, count(*) AS m
                    FROM w JOIN cnt c ON c.w = w.w GROUP BY 1)
            SELECT doc_id, CAST(s AS BIGINT) AS freq_sum,
                   CAST(m AS BIGINT) AS n_tokens,
                   CAST((1000000 * s) // m AS BIGINT) AS mean_freq_fp
            FROM doc ORDER BY doc_id""",
        "events_cumsum": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS cum_value_c
            FROM events ORDER BY event_id""",
        "events_lag": """
            SELECT event_id, user_id,
                   CAST(epoch_us(ts) - LAG(epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        AS BIGINT) AS prev_gap_us
            FROM events ORDER BY event_id""",
        "events_moving_sum": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS win_sum_c,
                   CAST(count(*)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS win_n
            FROM events ORDER BY event_id""",
        "events_rank": """
            SELECT event_id, user_id,
                   CAST(rank() OVER (
                        PARTITION BY user_id
                        ORDER BY CAST(round(value * 100) AS BIGINT) DESC)
                        AS BIGINT) AS rk,
                   CAST(dense_rank() OVER (
                        PARTITION BY user_id
                        ORDER BY CAST(round(value * 100) AS BIGINT) DESC)
                        AS BIGINT) AS drk
            FROM events ORDER BY event_id""",
        "events_days_intersect": """
            SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
            FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
            FROM events WHERE event_type = 'purchase'
            ORDER BY user_id, day""",
        "events_days_except": """
            SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
            FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
            FROM events WHERE event_type = 'purchase'
            ORDER BY user_id, day""",
        "rel_rollup": """
            SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
            ORDER BY 1, 2""",
        "search_bm25": _bm25_sql(),
        # greedy per-source packing replayed exactly: recursive CTE over
        # per-source ranks, one iteration per rank (bounded by the largest
        # shard), CASE mirroring "overflow starts a new sequence".
        "text_pack_sequences": """
            WITH RECURSIVE d AS (
                SELECT source, doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                       CAST(row_number() OVER (PARTITION BY source
                                               ORDER BY doc_id) AS BIGINT)
                         AS rk
                FROM documents),
            r AS (
                SELECT source, doc_id, n, rk,
                       CAST(0 AS BIGINT) AS seq_idx, n AS cum
                FROM d WHERE rk = 1
                UNION ALL
                SELECT d.source, d.doc_id, d.n, d.rk,
                       CASE WHEN r.cum + d.n > 128
                            THEN r.seq_idx + 1 ELSE r.seq_idx END,
                       CASE WHEN r.cum + d.n > 128
                            THEN d.n ELSE r.cum + d.n END
                FROM r JOIN d ON d.source = r.source AND d.rk = r.rk + 1)
            SELECT source, doc_id, n AS n_tokens, seq_idx
            FROM r ORDER BY source, doc_id""",
        # fixed-width chunking: DuckDB list slices are 1-based inclusive,
        # so chunk i covers ws[i*32+1 : least((i+1)*32, len(ws))]. No
        # lower(): chunks preserve original text (both engines).
        "text_chunks": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents),
            c AS (SELECT doc_id, ws,
                         unnest(range(0, greatest(
                             CAST(ceil(len(ws) / 32.0) AS BIGINT), 1)))
                           AS chunk_idx
                  FROM d)
            SELECT doc_id, chunk_idx,
                   least(chunk_idx * 32 + 32, len(ws)) - chunk_idx * 32
                     AS n_tokens,
                   array_to_string(ws[chunk_idx * 32 + 1 :
                                      least(chunk_idx * 32 + 32, len(ws))],
                                   ' ') AS chunk_text
            FROM c ORDER BY doc_id, chunk_idx""",
        "text_fingerprint": _WINNOW_CTE + """
            SELECT doc_id, count(*) AS n_fp, min(w) AS fp_min,
                   bit_xor(w) AS fp_xor
            FROM allp GROUP BY 1 ORDER BY 1""",
        # duplicate-substring coverage: document frequency of each winnow
        # pick, then per-doc count of picks shared with >= 1 other doc.
        # count(*) FILTER keeps BIGINT (SUM over ints would be HUGEINT).
        "text_dup_spans": _WINNOW_CTE + """,
            df AS (SELECT w, count(*) AS d FROM allp GROUP BY 1)
            SELECT a.doc_id, count(*) AS n_fp,
                   count(*) FILTER (WHERE df.d >= 2) AS n_shared_fp
            FROM allp a JOIN df USING (w)
            GROUP BY 1 ORDER BY 1""",
        # shared-fingerprint pairs with the stop-key rule mirrored exactly:
        # fingerprints held by > max_df (64) docs are excluded wholesale
        # (Ray side: pairs_within_groups(drop_over=64)), pairs need
        # >= min_common (5) shared picks.
        "dedup_fingerprint": _WINNOW_CTE + """,
            keepw AS (SELECT w FROM allp GROUP BY w
                      HAVING count(*) <= 64)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   count(*) AS n_common
            FROM allp a JOIN allp b ON a.w = b.w AND a.doc_id < b.doc_id
            WHERE a.w IN (SELECT w FROM keepw)
            GROUP BY 1, 2 HAVING count(*) >= 5 ORDER BY 1, 2""",
        "sample_hash": f"""
            WITH {_splitmix_cte('documents', 'doc_id',
                                'doc_id, source, n_chars')}
            SELECT doc_id, source, n_chars FROM u
            WHERE u01 < 0.2 ORDER BY doc_id""",
        "sample_per_key": f"""
            WITH {_splitmix_cte('events', 'event_id',
                                'event_id, user_id')}
            SELECT event_id, user_id, rank FROM (
              SELECT event_id, user_id,
                     CAST(row_number() OVER (
                          PARTITION BY user_id ORDER BY u01, event_id)
                          AS BIGINT) AS rank
              FROM u)
            WHERE rank <= 3 ORDER BY user_id, rank""",
        "sample_train_val_test": f"""
            WITH {_splitmix_cte('documents', 'doc_id', 'doc_id')}
            SELECT doc_id,
                   CASE WHEN u01 < 0.8 THEN 'train'
                        WHEN u01 < 0.9 THEN 'val'
                        ELSE 'test' END AS split
            FROM u ORDER BY doc_id""",
        "diag_source_size_histogram": """
            SELECT n_docs, count(*) AS n_sources FROM (
              SELECT source, count(*) AS n_docs
              FROM documents GROUP BY 1)
            GROUP BY 1 ORDER BY 1""",
        # HLL register table: b=10 (register = top 10 hash bits), rank =
        # leading zeros of the low-54-bit field + 1; bin() gives the exact
        # bit length with integer string ops (functions/hll.py)
        "approx_distinct_orders": f"""
            WITH {_splitmix_cte('lineitem', 'l_orderkey', 'l_orderkey')},
            hh AS (SELECT xor(z, z >> 31) AS h FROM z2),
            rr AS (SELECT CAST(h >> 54 AS BIGINT) AS register,
                          h % 18014398509481984 AS w FROM hh),
            rk AS (SELECT register,
                          CASE WHEN w = 0 THEN 55
                               ELSE 55 - length(bin(w)) END AS r FROM rr)
            SELECT register, CAST(max(r) AS BIGINT) AS max_rank
            FROM rk GROUP BY 1 ORDER BY 1""",
        "approx_distinct_custs_by_year": f"""
            WITH yo AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS g,
                               o_custkey FROM orders),
            {_splitmix_cte('yo', 'o_custkey', 'g')},
            hh AS (SELECT g, xor(z, z >> 31) AS h FROM z2),
            rr AS (SELECT g, CAST(h >> 54 AS BIGINT) AS register,
                          h % 18014398509481984 AS w FROM hh),
            rk AS (SELECT g, register,
                          CASE WHEN w = 0 THEN 55
                               ELSE 55 - length(bin(w)) END AS r FROM rr)
            SELECT g, register, CAST(max(r) AS BIGINT) AS max_rank
            FROM rk GROUP BY 1, 2 ORDER BY 1, 2""",
        "cms_part_frequencies": _cms_sql(),
        # arrival = 4-shard collector: shard event_id % 4, shard-major,
        # (ts, event_id) within shard (relational.tag_late_events)
        "events_late_tag": """
            SELECT event_id, user_id,
                   CAST(max(epoch_us(ts)) OVER (
                        PARTITION BY user_id
                        ORDER BY event_id % 4, ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        - 3600000000 AS BIGINT) AS watermark_us,
                   COALESCE(epoch_us(ts) <
                            max(epoch_us(ts)) OVER (
                              PARTITION BY user_id
                              ORDER BY event_id % 4, ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) - 3600000000,
                            FALSE) AS is_late
            FROM events ORDER BY event_id""",
        "rel_anti_join_customers": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE c_custkey NOT IN (
              SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
            ORDER BY c_custkey""",
        # parallel unnests zip in DuckDB; floor-div spelled with a
        # non-negative mod so HUGEINT sums divide exactly like numpy's //
        "emb_grouped_centroids": """
            WITH e AS (SELECT CAST(label AS BIGINT) AS g,
                              unnest(range(len(embedding))) AS dim,
                              CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                         * 1048576) AS BIGINT) AS fp
                       FROM embeddings),
            a AS (SELECT g, dim, CAST(sum(fp) AS BIGINT) AS s,
                         count(*) AS n
                  FROM e GROUP BY 1, 2)
            SELECT g, dim,
                   CAST((s - ((s % n + n) % n)) // n AS BIGINT)
                     AS centroid_fp,
                   CAST(n AS BIGINT) AS n
            FROM a ORDER BY g, dim""",
        # rate per stratum = (i % 4) / 4 + 0.125 for source 'src{{i}}' —
        # exact binary fractions, so the float threshold compare is
        # bit-identical on both engines (queries._STRAT_RATES).
        "sample_stratified": f"""
            WITH {_splitmix_cte('documents', 'doc_id', 'doc_id, source')}
            SELECT doc_id, source FROM u
            WHERE u01 < (CAST(substring(source, 4) AS BIGINT) % 4) / 4.0
                        + 0.125
            ORDER BY doc_id""",
        "text_redact": _redact_sql(),
        "contamination_check": _CONTAMINATION_SQL,
        # score = (tf/n_words) * (N/df) with the exact expression tree the
        # Ray side evaluates — pure IEEE arithmetic, no libm (log) calls
        # whose last-ulp behavior could differ between engines.
        "text_tfidf": """
            WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' '))
                              AS term
                       FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
            nw AS (SELECT doc_id, count(*) AS n_words FROM w GROUP BY 1),
            df AS (SELECT term, count(DISTINCT doc_id) AS df FROM w
                   GROUP BY 1),
            nn AS (SELECT count(*) AS n FROM documents),
            s AS (SELECT tf.doc_id, tf.term,
                         (CAST(tf.tf AS DOUBLE) / nw.n_words)
                         * (CAST(nn.n AS DOUBLE) / df.df) AS score
                  FROM tf JOIN nw USING (doc_id) JOIN df USING (term)
                  CROSS JOIN nn),
            r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rank FROM s)
            SELECT doc_id, term, score, rank FROM r WHERE rank <= 3
            ORDER BY doc_id, rank""",
        "curation_cap_per_source": """
            SELECT doc_id, source, n_chars, rank FROM (
              SELECT doc_id, source, n_chars,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY n_chars DESC, doc_id)
                       AS rank
              FROM documents)
            WHERE rank <= 20 ORDER BY source, rank""",
        "rel_quantiles": """
            SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS q,
                   unnest([quantile_disc(l_extendedprice, 0.25),
                           quantile_disc(l_extendedprice, 0.5),
                           quantile_disc(l_extendedprice, 0.75),
                           quantile_disc(l_extendedprice, 0.95)]) AS value
            FROM lineitem""",
        # PERCENTILE_CONT spelled out (functions/quantiles.quantiles_cont):
        # both engines evaluate lo + frac*(hi-lo) on the same two order
        # statistics with the same doubles — no reliance on either engine's
        # internal quantile interpolation
        "rel_quantiles_cont": """
            WITH s AS (SELECT l_extendedprice AS v,
                              row_number() OVER (ORDER BY l_extendedprice)
                                - 1 AS r
                       FROM lineitem),
            cnt AS (SELECT count(*) AS n FROM lineitem),
            qq AS (SELECT unnest([0.25, 0.5, 0.75, 0.9]) AS q),
            pos AS (SELECT CAST(q AS DOUBLE) AS q,
                           CAST(floor((n - 1) * CAST(q AS DOUBLE))
                                AS BIGINT) AS rf,
                           (n - 1) * CAST(q AS DOUBLE)
                             - floor((n - 1) * CAST(q AS DOUBLE)) AS frac,
                           n FROM qq, cnt)
            SELECT q, lo.v + frac * (hi.v - lo.v) AS value
            FROM pos JOIN s lo ON lo.r = pos.rf
            JOIN s hi ON hi.r = least(pos.rf + 1, pos.n - 1)
            ORDER BY q""",
        "events_retention_cohorts": """
            WITH w AS (SELECT user_id,
                              epoch_us(ts) // 604800000000 AS wk
                       FROM events),
            f AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY 1),
            a AS (SELECT DISTINCT user_id, wk FROM w)
            SELECT f.cohort, a.wk, count(*) AS n_users
            FROM a JOIN f USING(user_id)
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "events_transitions": """
            WITH w AS (SELECT event_type,
                              lag(event_type) OVER (
                                PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev_type
                       FROM events)
            SELECT prev_type, event_type, count(*) AS n FROM w
            WHERE prev_type IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "events_funnel": """
            WITH u0 AS (SELECT DISTINCT user_id FROM events),
            s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
                   WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
                   FROM events e JOIN s1 ON s1.user_id = e.user_id
                    AND epoch_us(e.ts) > s1.t1
                   WHERE e.event_type = 'click' GROUP BY 1),
            s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
                   FROM events e JOIN s2 ON s2.user_id = e.user_id
                    AND epoch_us(e.ts) > s2.t2
                   WHERE e.event_type = 'purchase' GROUP BY 1)
            SELECT u0.user_id, CAST(t1 AS BIGINT) AS t1_us,
                   CAST(t2 AS BIGINT) AS t2_us, CAST(t3 AS BIGINT) AS t3_us
            FROM u0 LEFT JOIN s1 USING(user_id)
            LEFT JOIN s2 USING(user_id) LEFT JOIN s3 USING(user_id)
            ORDER BY user_id""",
        # revenue in 1e-4 fixed point: price cents x (100 - discount pct),
        # both exact int64 (relational.tpch_q3_revenue)
        "rel_tpch_q3": """
            SELECT l_orderkey,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                     AS revenue_fp,
                   o_orderdate
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING'
              AND c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND o_orderdate < TIMESTAMP '1997-01-01'
              AND l_shipdate > TIMESTAMP '1997-01-01'
            GROUP BY 1, 3
            ORDER BY revenue_fp DESC, l_orderkey LIMIT 10""",
        # the synthetic media table reproduced in SQL (payload = UTF-8 of
        # text via encode(); metadata derived from doc_id, mirroring
        # multimodal.synthesize_media); byte slices compared as hex strings
        # because this DuckDB lacks BLOB substring/md5.
        "multimodal_resize": """
            WITH m AS (SELECT doc_id AS media_id,
                              hex(encode(text)) AS H,
                              octet_length(encode(text)) AS len_bytes,
                              CAST(doc_id % 640 + 64 AS BIGINT) AS width,
                              CAST(doc_id % 480 + 48 AS BIGINT) AS height
                       FROM documents WHERE doc_id % 3 = 0)
            SELECT media_id,
                   CAST(width // 2 AS INTEGER) AS width,
                   CAST(height // 2 AS INTEGER) AS height,
                   CAST((len_bytes + 3) // 4 AS BIGINT) AS n_bytes,
                   substring(H, 1, ((len_bytes + 3) // 4) * 2)
                     AS payload_hex
            FROM m ORDER BY media_id""",
        "multimodal_frame_sample": """
            WITH m AS (SELECT doc_id AS media_id,
                              hex(encode(text)) AS H,
                              octet_length(encode(text)) AS len_bytes,
                              CAST(doc_id % 90 * 1000 AS BIGINT)
                                AS duration_ms
                       FROM documents WHERE doc_id % 3 = 2),
            v AS (SELECT *, least(duration_ms // 1000 + 1, 8) AS n FROM m),
            v2 AS (SELECT *, greatest(1, len_bytes // n) AS stride FROM v),
            f AS (SELECT media_id, stride, H,
                         unnest(range(0, n)) AS frame_idx FROM v2)
            SELECT media_id, frame_idx,
                   frame_idx * 1000 AS ts_ms,
                   length(substring(H, frame_idx * stride * 2 + 1,
                                    stride * 2)) // 2 AS frame_bytes,
                   substring(H, frame_idx * stride * 2 + 1, stride * 2)
                     AS frame_hex
            FROM f ORDER BY media_id, frame_idx""",
        "text_token_count": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
                     AS re_tokens
            FROM documents ORDER BY doc_id""",
        # Gopher-style repetition signals; integer counts only, so the
        # cross-check is exact. Bigrams keep (w1, w2) as two group keys —
        # no string re-concatenation that could alias distinct bigrams.
        "text_repetition": """
            WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                       FROM documents),
            w AS (SELECT doc_id, unnest(ws) AS w FROM d),
            dw AS (SELECT doc_id, count(*) AS n_words,
                          count(DISTINCT w) AS n_distinct_words
                   FROM w GROUP BY 1),
            bg AS (SELECT doc_id, unnest(ws[1:len(ws)-1]) AS w1,
                          unnest(ws[2:len(ws)]) AS w2
                   FROM d WHERE len(ws) > 1),
            bgc AS (SELECT doc_id, w1, w2, count(*) AS c
                    FROM bg GROUP BY 1, 2, 3),
            top AS (SELECT doc_id, max(c) AS top_bigram_count
                    FROM bgc GROUP BY 1)
            SELECT d.doc_id, dw.n_words, dw.n_distinct_words,
                   greatest(dw.n_words - 1, 0) AS n_bigrams,
                   coalesce(top.top_bigram_count, 0) AS top_bigram_count
            FROM d LEFT JOIN dw USING (doc_id) LEFT JOIN top USING (doc_id)
            ORDER BY doc_id""",
        # ------ relational operator demos (TPC-H-ish views) ----------------
        # money/percent columns are exact multiples of 0.01: summing exact
        # int64 fixed-point values (round(x*100)) on BOTH sides makes the
        # sums order-independent, so the driver's value-hash compare cannot
        # be tripped by float summation order (the Ray side applies the
        # identical encoding; see relational.py:_scaled_int).
        "rel_groupby_lineitem": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
                     AS sum_base_price,
                   sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                       AS BIGINT)) / 10000.0 AS sum_disc_price,
                   avg(l_quantity) AS avg_qty,
                   (sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0)
                     / count(*) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
        "rel_join_orders_customer": """
            SELECT c.c_mktsegment AS mktsegment,
                   sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0
                     AS revenue,
                   count(*) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1 ORDER BY 1""",
        "rel_topk_customers": """
            SELECT o_custkey,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
                     AS total_spent
            FROM orders GROUP BY 1
            ORDER BY total_spent DESC, o_custkey LIMIT 10""",
        "rel_first_order_per_customer": """
            SELECT o_custkey, min(o_orderdate) AS first_order,
                   count(*) AS n_orders
            FROM orders GROUP BY 1 ORDER BY 1""",
        "rel_revenue_by_brand": """
            SELECT p.p_brand AS brand,
                   sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                       * 10000) AS BIGINT)) / 10000.0 AS revenue
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1 ORDER BY 1""",
        "events_sessionize": """
            WITH x AS (SELECT user_id, ts,
                              lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                AS pts
                       FROM events)
            SELECT user_id, count(*) AS n_events,
                   count(CASE WHEN pts IS NULL OR epoch(ts - pts) > 1800
                         THEN 1 END) AS n_sessions
            FROM x GROUP BY 1 ORDER BY 1""",
        # deterministic as-of semantics spelled out (DuckDB's ASOF JOIN
        # leaves the equal-src_ts tie unspecified): matched ts = greatest
        # strictly-earlier right ts; src id = max right id at that ts
        "events_asof_join": """
            WITH l AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
            r AS (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'click'),
            m AS (SELECT l.event_id, l.user_id, l.ts, max(r.ts) AS src_ts
                  FROM l JOIN r ON l.user_id = r.user_id AND r.ts < l.ts
                  GROUP BY 1, 2, 3)
            SELECT m.event_id, m.user_id, m.ts,
                   max(r.event_id) AS src_id, m.src_ts
            FROM m JOIN r ON r.user_id = m.user_id AND r.ts = m.src_ts
            GROUP BY m.event_id, m.user_id, m.ts, m.src_ts
            ORDER BY m.event_id""",
        "events_interval_join": """
            WITH p AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
            iv AS (SELECT event_id AS error_id, user_id, ts AS s,
                          ts + INTERVAL 600 SECOND AS e
                   FROM events WHERE event_type = 'error')
            SELECT p.event_id, iv.error_id, p.user_id
            FROM p JOIN iv ON p.user_id = iv.user_id
                          AND p.ts >= iv.s AND p.ts < iv.e
            ORDER BY p.event_id, iv.error_id""",
        "rel_quantiles_by_flag": """
            SELECT l_returnflag, unnest([0.25, 0.5, 0.75, 0.95]) AS q,
                   unnest([quantile_disc(l_extendedprice, 0.25),
                           quantile_disc(l_extendedprice, 0.5),
                           quantile_disc(l_extendedprice, 0.75),
                           quantile_disc(l_extendedprice, 0.95)]) AS value
            FROM lineitem GROUP BY 1 ORDER BY 1, 2""",
        # hop windows: every event in exactly width/slide = 2 windows;
        # window starts as epoch-second BIGINTs on both engines
        "events_sliding_window": """
            WITH e AS (SELECT event_type, epoch_ms(ts) // 1000 AS sec, value
                       FROM events),
            x AS (SELECT event_type,
                         (sec // 1800) * 1800 - i.i * 1800 AS w_start_s,
                         value
                  FROM e CROSS JOIN (SELECT unnest(range(0, 2)) AS i) i)
            SELECT event_type, w_start_s,
                   sum(CAST(round(value * 100) AS BIGINT)) / 100.0
                     AS sum_value,
                   count(*) AS n
            FROM x GROUP BY 1, 2 ORDER BY 1, 2""",
        "events_window_agg": """
            SELECT event_type, date_trunc('hour', ts) AS w,
                   sum(CAST(round(value * 100) AS BIGINT)) / 100.0
                     AS sum_value,
                   count(*) AS n
            FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
        "events_json_props_sum": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                        AS BIGINT) AS sum_k,
                   count(*) AS n
            FROM events GROUP BY 1 ORDER BY 1""",
        "rel_bloom_semi_join": """
            SELECT l_returnflag,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                        AS BIGINT) AS sum_qty_c
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_orderpriority = '1-URGENT')
            GROUP BY 1 ORDER BY 1""",
        "events_pivot_counts": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click')    AS n_click,
                   count(*) FILTER (event_type = 'error')    AS n_error,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (event_type = 'signup')   AS n_signup,
                   count(*) FILTER (event_type = 'view')     AS n_view
            FROM events GROUP BY 1 ORDER BY 1""",
        "events_gap_fill": """
            WITH d AS (SELECT event_type,
                              epoch_us(ts) // 86400000000 AS day
                       FROM events),
            spine AS (
              SELECT t.event_type, s.day
              FROM (SELECT DISTINCT event_type FROM d) t
              CROSS JOIN (SELECT unnest(generate_series(
                            (SELECT min(day) FROM d),
                            (SELECT max(day) FROM d))) AS day) s)
            SELECT sp.event_type, CAST(sp.day AS BIGINT) AS day,
                   CAST(count(d.day) AS BIGINT) AS n
            FROM spine sp LEFT JOIN d
              ON d.event_type = sp.event_type AND d.day = sp.day
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "events_anomaly": """
            WITH v AS (SELECT event_id, event_type,
                              CAST(round(value * 100) AS BIGINT) AS vc
                       FROM events),
            s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                         CAST(sum(vc) AS HUGEINT) AS sm,
                         CAST(sum(CAST(vc AS HUGEINT) * vc) AS HUGEINT)
                           AS ss
                  FROM v GROUP BY 1)
            SELECT v.event_id, v.event_type, v.vc AS value_c
            FROM v JOIN s USING (event_type)
            WHERE (s.n * v.vc - s.sm) > 0
              AND (s.n * v.vc - s.sm) * (s.n * v.vc - s.sm)
                  > 4 * (s.n * s.ss - s.sm * s.sm)
            ORDER BY v.event_id""",
        "rel_percent_rank": """
            SELECT l_orderkey, l_linenumber, l_returnflag,
                   CAST((rank() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_quantity) - 1) * 1000000
                        // GREATEST(count(*) OVER (
                             PARTITION BY l_returnflag) - 1, 1)
                        AS BIGINT) AS pr6
            FROM lineitem ORDER BY l_returnflag, l_quantity, l_orderkey,
                                   l_linenumber""",
        "events_collapse_bursts": """
            SELECT event_id, user_id, event_type FROM (
              SELECT event_id, user_id, event_type,
                     epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS gap
              FROM events)
            WHERE gap IS NULL OR gap >= 60000000
            ORDER BY event_id""",
        "rel_cube": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                        AS BIGINT) AS sum_qty_c
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY 1, 2""",
        "kg_bgp_conv_tools": P + f"""
            SELECT DISTINCT conv_iri AS conv,
                   '{C.ENT}tool/' || {normalize_sql('tool')} AS tool
            FROM t WHERE {TOOL_OK_SQL}
            ORDER BY 1, 2""",
        "kg_bgp_mention_tool": P + f"""
            SELECT DISTINCT '{C.ENT}mention/' || m.canonical AS m,
                   '{C.ENT}tool/' || {normalize_sql('t.tool')} AS tool
            FROM mention m
            JOIN t ON t.turn_iri = m.turn_iri
            WHERE {TOOL_OK_SQL}
            ORDER BY 1, 2""",
        "freq_heavy_hitters": """
            SELECT event_type AS key, count(*) AS cnt
            FROM events
            GROUP BY 1 HAVING 5 * count(*) > (SELECT count(*) FROM events)
            ORDER BY cnt DESC, key""",
        "events_window_distinct": """
            WITH bounds AS (
              SELECT CAST(epoch(min(date_trunc('day', ts))) AS BIGINT)
                       // 86400 AS lo,
                     CAST(epoch(max(date_trunc('day', ts))) AS BIGINT)
                       // 86400 AS hi
              FROM events),
            days AS (SELECT unnest(generate_series(lo, hi)) AS day
                     FROM bounds),
            ed AS (SELECT DISTINCT user_id,
                          CAST(epoch(date_trunc('day', ts)) AS BIGINT)
                            // 86400 AS eday
                   FROM events)
            SELECT d.day, count(DISTINCT ed.user_id) AS n_users
            FROM days d LEFT JOIN ed ON ed.eday BETWEEN d.day - 6 AND d.day
            GROUP BY 1 ORDER BY 1""",
        "curation_mix_sources": f"""
            WITH {_splitmix_cte('documents', 'doc_id', 'doc_id, source')},
            c AS (SELECT source, CAST(count(*) AS BIGINT) AS cnt,
                         CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS w
                  FROM documents GROUP BY 1),
            p AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                         CAST(sum(w) AS BIGINT) AS sum_w FROM c),
            q AS (SELECT source,
                         least(cnt, w * (total // 2) // sum_w) AS n_s
                  FROM c, p),
            r AS (SELECT doc_id, source,
                         row_number() OVER (PARTITION BY source
                                            ORDER BY u01, doc_id) AS rk
                  FROM u)
            SELECT r.doc_id, r.source
            FROM r JOIN q USING (source) WHERE r.rk <= q.n_s
            ORDER BY 2, 1""",
        "rel_quantile_sketch": """
            WITH b AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                              // 10000 AS bin
                       FROM lineitem),
            c AS (SELECT bin, count(*) AS cnt FROM b GROUP BY 1),
            t AS (SELECT bin,
                         CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT)
                           AS cum,
                         (SELECT count(*) FROM b) AS n
                  FROM c),
            q(q1e4) AS (VALUES (2500), (5000), (7500), (9000), (9900))
            SELECT CAST(q.q1e4 AS BIGINT) AS q1e4,
                   min(t.bin) AS bin,
                   min(t.bin) * 10000 AS lo_edge_c
            FROM q JOIN t ON t.cum >= (q.q1e4 * t.n + 9999) // 10000
            GROUP BY 1 ORDER BY 1""",
        "rel_full_outer_activity": """
            WITH e AS (
              SELECT user_id AS k, count(*) AS n_events,
                     CAST(sum(CAST(round(value * 100) AS BIGINT))
                          AS BIGINT) AS events_value_c
              FROM events GROUP BY 1),
            o AS (
              SELECT o_custkey AS k, count(*) AS n_orders,
                     CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS orders_value_c
              FROM orders GROUP BY 1)
            SELECT COALESCE(e.k, o.k) AS k,
                   CASE WHEN e.k IS NULL THEN 0 ELSE 1 END AS in_left,
                   CASE WHEN o.k IS NULL THEN 0 ELSE 1 END AS in_right,
                   COALESCE(e.n_events, 0) AS n_events,
                   COALESCE(e.events_value_c, 0) AS events_value_c,
                   COALESCE(o.n_orders, 0) AS n_orders,
                   COALESCE(o.orders_value_c, 0) AS orders_value_c
            FROM e FULL OUTER JOIN o ON e.k = o.k ORDER BY 1""",
        "rel_mad_by_flag": """
            WITH c AS (SELECT l_returnflag,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                                AS pc_
                       FROM lineitem),
            m AS (SELECT l_returnflag, quantile_disc(pc_, 0.5) AS med
                  FROM c GROUP BY 1)
            SELECT c.l_returnflag,
                   CAST(quantile_disc(abs(c.pc_ - m.med), 0.5) AS BIGINT)
                     AS mad_c
            FROM c JOIN m USING (l_returnflag)
            GROUP BY 1 ORDER BY 1""",
        "events_top_per_user": """
            SELECT user_id, event_id, event_type, value_c FROM (
              SELECT user_id, event_id, event_type,
                     CAST(round(value * 100) AS BIGINT) AS value_c,
                     row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(round(value * 100) AS BIGINT) DESC,
                                event_id) AS rk
              FROM events)
            WHERE rk = 1 ORDER BY 1""",
        "events_error_recovery": """
            WITH err AS (SELECT event_id AS error_id, user_id, ts
                         FROM events WHERE event_type = 'error'),
            buy AS (SELECT event_id AS purchase_id, user_id, ts
                    FROM events WHERE event_type = 'purchase'),
            m AS (SELECT e.error_id, b.purchase_id,
                         epoch_us(b.ts) - epoch_us(e.ts) AS delta_us,
                         row_number() OVER (
                           PARTITION BY e.error_id
                           ORDER BY b.ts, b.purchase_id) AS rk
                  FROM err e JOIN buy b ON b.user_id = e.user_id
                   AND b.ts > e.ts
                   AND epoch_us(b.ts) - epoch_us(e.ts) <= 3600000000)
            SELECT error_id, purchase_id, delta_us
            FROM m WHERE rk = 1 ORDER BY 1""",
        # window form of strict-dominance skyline — equivalent to the
        # quadratic NOT EXISTS (verified equal at sf0.001/0.01) but
        # O(n log n): survive iff qty == its price-run's max AND that max
        # beats every strictly-cheaper run's max
        "rel_skyline": """
            WITH p AS (SELECT l_orderkey, l_linenumber,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                                AS price_c,
                              CAST(floor(l_quantity) AS BIGINT) AS qty
                       FROM lineitem),
            r AS (SELECT *, max(qty) OVER (PARTITION BY price_c) AS qmax,
                         max(qty) OVER (ORDER BY price_c
                           RANGE BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS bef
                  FROM p)
            SELECT l_orderkey, l_linenumber, price_c, qty FROM r
            WHERE qty = qmax AND (bef IS NULL OR qmax > bef)
            ORDER BY 1, 2""",
        "events_mode_per_user": """
            SELECT user_id, event_type, n FROM (
              SELECT user_id, event_type, count(*) AS n,
                     row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY count(*) DESC, event_type) AS rk
              FROM events GROUP BY 1, 2)
            WHERE rk = 1 ORDER BY 1""",
        "events_type_diversity": """
            WITH c AS (SELECT user_id, event_type, count(*) AS n
                       FROM events GROUP BY 1, 2)
            SELECT user_id, CAST(sum(n) AS BIGINT) AS n,
                   CAST(sum(n * n) AS BIGINT) AS sum_sq
            FROM c GROUP BY 1 ORDER BY 1""",
        "events_type_xcorr": """
            WITH d AS (SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT)
                              // 86400 AS day,
                              event_type
                       FROM events
                       WHERE event_type IN ('click', 'purchase')),
            c AS (SELECT day, event_type, count(*) AS n
                  FROM d GROUP BY 1, 2),
            a AS (SELECT day, n FROM c WHERE event_type = 'click'),
            b AS (SELECT day, n FROM c WHERE event_type = 'purchase'),
            l(lag) AS (VALUES (-1), (0), (1))
            SELECT CAST(l.lag AS BIGINT) AS lag,
                   CAST(coalesce(sum(a.n * b.n), 0) AS BIGINT) AS dot,
                   count(b.day) AS n_days
            FROM l CROSS JOIN a LEFT JOIN b ON b.day = a.day + l.lag
            GROUP BY 1 ORDER BY 1""",
        "events_topk_with_ties": """
            SELECT user_id, event_id, value_c, rank FROM (
              SELECT user_id, event_id,
                     CAST(round(value * 100) AS BIGINT) AS value_c,
                     CAST(RANK() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(round(value * 100) AS BIGINT) DESC)
                       AS BIGINT) AS rank
              FROM events)
            WHERE rank <= 2 ORDER BY 1, 3 DESC, 2""",
        "events_ffill_purchase": """
            WITH s AS (SELECT event_id, user_id, ts,
                              CASE WHEN event_type = 'purchase'
                                   THEN CAST(round(value * 100) AS BIGINT)
                              END AS pc_
                       FROM events)
            SELECT event_id, user_id,
                   coalesce(last_value(pc_ IGNORE NULLS) OVER w, 0)
                     AS last_purchase_c,
                   CASE WHEN last_value(pc_ IGNORE NULLS) OVER w IS NULL
                        THEN 0 ELSE 1 END AS has_prior
            FROM s
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
            ORDER BY 1""",
        "rel_unpivot_measures": """
            SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
                   CAST(round(l_quantity * 100) AS BIGINT) AS value_c
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'price',
                   CAST(round(l_extendedprice * 100) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'discount',
                   CAST(round(l_discount * 100) AS BIGINT)
            FROM lineitem
            ORDER BY 1, 2, 3""",
        "rel_ols_slope": """
            WITH s AS (
              SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(CAST(floor(l_quantity) AS BIGINT))
                          AS HUGEINT) AS sx,
                     CAST(sum(CAST(floor(l_extendedprice) AS BIGINT))
                          AS HUGEINT) AS sy,
                     CAST(sum(CAST(floor(l_quantity) AS BIGINT)
                              * CAST(floor(l_extendedprice) AS BIGINT))
                          AS HUGEINT) AS sxy,
                     CAST(sum(CAST(floor(l_quantity) AS BIGINT)
                              * CAST(floor(l_quantity) AS BIGINT))
                          AS HUGEINT) AS sxx
              FROM lineitem GROUP BY 1)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                   CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
                   CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
            FROM s ORDER BY 1""",
        "rel_weighted_median": """
            WITH c AS (SELECT l_returnflag,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                                AS price_c,
                              CAST(floor(l_quantity) AS BIGINT) AS w
                       FROM lineitem),
            x AS (SELECT l_returnflag, price_c,
                         CAST(sum(w) OVER (PARTITION BY l_returnflag
                                           ORDER BY price_c) AS BIGINT)
                           AS cw,
                         CAST(sum(w) OVER (PARTITION BY l_returnflag)
                              AS BIGINT) AS total_w
                  FROM c)
            SELECT l_returnflag, min(price_c) AS wmedian_c, total_w
            FROM x WHERE cw >= (total_w + 1) // 2
            GROUP BY 1, 3 ORDER BY 1""",
        "events_cum_distinct_types": """
            WITH f AS (SELECT event_id, user_id, ts,
                              CASE WHEN row_number() OVER (
                                     PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) = 1
                                   THEN 1 ELSE 0 END AS first_seen
                       FROM events)
            SELECT event_id, user_id,
                   CAST(sum(first_seen) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS n_types
            FROM f ORDER BY 1""",
        "rel_ratio_to_report": """
            SELECT l_orderkey, l_linenumber, l_returnflag,
                   CAST(round(l_extendedprice * 100) AS BIGINT)
                     AS price_c,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        OVER (PARTITION BY l_returnflag) AS BIGINT)
                     AS flag_total_c
            FROM lineitem ORDER BY 1, 2""",
        "rel_ks_drift": """
            WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                              AS val,
                              CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0
                              END AS a,
                              CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
                              END AS b
                       FROM lineitem WHERE l_returnflag IN ('A', 'R')),
            c AS (SELECT val, CAST(sum(a) AS BIGINT) AS na,
                         CAST(sum(b) AS BIGINT) AS nb
                  FROM v GROUP BY 1),
            t AS (SELECT CAST(sum(na) OVER (ORDER BY val) AS BIGINT)
                           AS ca,
                         CAST(sum(nb) OVER (ORDER BY val) AS BIGINT)
                           AS cb,
                         (SELECT CAST(sum(a) AS BIGINT) FROM v) AS ta,
                         (SELECT CAST(sum(b) AS BIGINT) FROM v) AS tb
                  FROM c)
            SELECT CAST(max(abs(tb * ca - ta * cb)) AS BIGINT)
                     AS ks_scaled,
                   CAST(max(ta) AS BIGINT) AS n_a,
                   CAST(max(tb) AS BIGINT) AS n_b
            FROM t""",
        "rel_trimmed_mean": """
            WITH r AS (SELECT l_returnflag,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                                AS price_c,
                              row_number() OVER (
                                PARTITION BY l_returnflag
                                ORDER BY CAST(round(l_extendedprice * 100)
                                              AS BIGINT),
                                         l_orderkey, l_linenumber)
                                AS rk,
                              count(*) OVER (PARTITION BY l_returnflag)
                                AS n
                       FROM lineitem)
            SELECT l_returnflag,
                   CAST(sum(price_c) AS BIGINT) AS trimmed_sum_c,
                   count(*) AS n_kept
            FROM r WHERE 100 * rk > 10 * n AND 100 * rk <= 90 * n
            GROUP BY 1 ORDER BY 1""",
        "rel_ntile": """
            SELECT c_custkey, c_mktsegment,
                   CAST(NTILE(4) OVER (
                     PARTITION BY c_mktsegment
                     ORDER BY CAST(round(c_acctbal * 100) AS BIGINT),
                              c_custkey) AS BIGINT) AS tile
            FROM customer ORDER BY 2, 3, 1""",
        "rel_tpch_q5": """
            SELECT n_name, count(*) AS n_items,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                     AS revenue_fp
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY 1 ORDER BY revenue_fp DESC""",
        "rel_tpch_q17": """
            WITH bl AS (
              SELECT l_partkey,
                     CAST(floor(l_quantity) AS BIGINT) AS qty,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
              FROM lineitem JOIN part ON p_partkey = l_partkey
              WHERE p_brand = 'Brand#1'),
            st AS (
              SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sq,
                     count(*) AS n
              FROM bl GROUP BY 1)
            SELECT CAST(coalesce(sum(price_c), 0) AS BIGINT)
                     AS total_price_c,
                   count(*) AS n_rows
            FROM bl JOIN st USING (l_partkey)
            WHERE 5 * bl.qty * st.n < st.sq""",
        "rel_cov_qty_price": """
            WITH s AS (
              SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(CAST(floor(l_quantity) AS BIGINT))
                          AS HUGEINT) AS sx,
                     CAST(sum(CAST(floor(l_extendedprice) AS BIGINT))
                          AS HUGEINT) AS sy,
                     CAST(sum(CAST(floor(l_quantity) AS BIGINT)
                              * CAST(floor(l_extendedprice) AS BIGINT))
                          AS HUGEINT) AS sxy
              FROM lineitem GROUP BY 1)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                   CAST(n * sxy - sx * sy AS BIGINT) AS cov_n2
            FROM s ORDER BY 1""",
        "events_time_weighted": """
            WITH d AS (
              SELECT user_id,
                     CAST(round(value * 100) AS BIGINT) AS vc,
                     LEAD(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                     - epoch_us(ts) AS dt
              FROM events)
            SELECT user_id,
                   CAST(sum(vc * dt) AS BIGINT) AS twa_num,
                   CAST(sum(dt) AS BIGINT) AS twa_den
            FROM d WHERE dt IS NOT NULL
            GROUP BY 1 HAVING sum(dt) > 0 ORDER BY 1""",
        "events_longest_streak": """
            WITH d AS (
              SELECT DISTINCT user_id,
                     date_diff('day', DATE '1970-01-01',
                               CAST(ts AS DATE)) AS day
              FROM events),
            i AS (
              SELECT user_id, day,
                     day - ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY day) AS isl
              FROM d),
            r AS (SELECT user_id, isl, count(*) AS len
                  FROM i GROUP BY 1, 2)
            SELECT user_id, CAST(max(len) AS BIGINT) AS streak_days
            FROM r GROUP BY 1 ORDER BY 1""",
        "rel_cume_dist": """
            SELECT l_orderkey, l_linenumber, l_returnflag,
                   CAST(count(*) OVER (
                          PARTITION BY l_returnflag ORDER BY l_quantity
                          RANGE BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) * 1000000
                        // count(*) OVER (PARTITION BY l_returnflag)
                        AS BIGINT) AS cd6
            FROM lineitem""",
        "kg_bgp_optional_link": P + f"""
            SELECT DISTINCT '{C.ENT}mention/' || mn.canonical AS m,
                   CASE WHEN l.entity_id IS NULL THEN ''
                        ELSE '{C.WD}' || l.entity_id END AS ent
            FROM mention mn LEFT JOIN linked l ON l.form = mn.canonical
            ORDER BY 1, 2""",
        "kg_triple_provenance": P + f"""
            , raw AS (
              SELECT '{C.RDF_TYPE}' AS pred, conv_id, turn_idx FROM t
              UNION ALL
              SELECT '{C.RDF_TYPE}', conv_id, turn_idx FROM t
              UNION ALL
              SELECT '{C.PRED_IS_PART_OF}', conv_id, turn_idx FROM t
              UNION ALL
              SELECT '{C.PRED_POSITION}', conv_id, turn_idx FROM t
              UNION ALL
              SELECT '{C.PRED_ROLE}', conv_id, turn_idx FROM t
              UNION ALL
              SELECT '{C.PRED_DATE_CREATED}', conv_id, turn_idx FROM t
              UNION ALL
              SELECT '{C.PRED_TEXT}', conv_id, turn_idx FROM t
              UNION ALL
              SELECT '{C.PRED_USES_TOOL}', conv_id, turn_idx FROM t
              WHERE {TOOL_OK_SQL}
              UNION ALL
              SELECT '{C.RDF_TYPE}', conv_id, turn_idx FROM t
              WHERE {TOOL_OK_SQL})
            SELECT pred, count(*) AS n_triples,
                   count(DISTINCT conv_id) AS n_convs,
                   CAST(min(turn_idx) AS BIGINT) AS min_turn,
                   CAST(max(turn_idx) AS BIGINT) AS max_turn
            FROM raw GROUP BY 1 ORDER BY 1""",
        "text_kwic": """
            WITH terms(term) AS (VALUES ('merge'), ('spark'), ('window')),
            h AS (SELECT doc_id, term, position(term IN text) AS pos, text
                  FROM documents, terms
                  WHERE position(term IN text) > 0)
            SELECT doc_id, term, CAST(pos AS BIGINT) AS pos,
                   substr(text, greatest(pos - 24, 1),
                          least(pos - 1, 24) + length(term) + 24) AS ctx
            FROM h ORDER BY doc_id, term""",
        "emb_random_projection": _rp_sql(),
        "kg_hits_tools": f"""
            WITH ts AS (
              SELECT conv_id, turn_idx, {normalize_sql('tool')} AS tool
              FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
              WHERE {TOOL_OK_SQL}),
            seq AS (SELECT conv_id, tool,
                           LEAD(tool) OVER (PARTITION BY conv_id
                                            ORDER BY turn_idx) AS nxt
                    FROM ts),
            edges AS (SELECT DISTINCT tool AS src, nxt AS dst
                      FROM seq WHERE nxt IS NOT NULL AND nxt <> tool),
            a1 AS (SELECT dst AS node, CAST(count(*) AS BIGINT)
                            AS in_deg
                   FROM edges GROUP BY 1),
            h1 AS (SELECT e.src AS node,
                          CAST(sum(a.in_deg) AS BIGINT) AS h
                   FROM edges e JOIN a1 a ON a.node = e.dst GROUP BY 1),
            a2 AS (SELECT e.dst AS node, CAST(sum(h.h) AS BIGINT) AS a
                   FROM edges e JOIN h1 h ON h.node = e.src GROUP BY 1),
            nodes AS (SELECT src AS node FROM edges
                      UNION SELECT dst FROM edges)
            SELECT n.node, coalesce(a1.in_deg, 0) AS in_deg,
                   coalesce(h1.h, 0) AS hub1,
                   coalesce(a2.a, 0) AS auth2
            FROM nodes n LEFT JOIN a1 USING (node)
            LEFT JOIN h1 USING (node) LEFT JOIN a2 USING (node)
            ORDER BY 1""",
        "kg_scc_tools": f"""
            WITH RECURSIVE ts AS (
              SELECT conv_id, turn_idx, {normalize_sql('tool')} AS tool
              FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
              WHERE {TOOL_OK_SQL}),
            seq AS (SELECT conv_id, tool,
                           LEAD(tool) OVER (PARTITION BY conv_id
                                            ORDER BY turn_idx) AS nxt
                    FROM ts),
            edges AS (SELECT DISTINCT tool AS src, nxt AS dst
                      FROM seq WHERE nxt IS NOT NULL AND nxt <> tool),
            reach AS (SELECT src AS a, dst AS b FROM edges
                      UNION
                      SELECT r.a, e.dst
                      FROM reach r JOIN edges e ON r.b = e.src),
            nodes AS (SELECT src AS n FROM edges
                      UNION SELECT dst FROM edges),
            mut AS (SELECT r1.a AS n, r1.b AS m
                    FROM reach r1 JOIN reach r2
                      ON r1.a = r2.b AND r1.b = r2.a
                    WHERE r1.a <> r1.b),
            base AS (SELECT n, n AS m FROM nodes
                     UNION ALL SELECT n, m FROM mut)
            SELECT n AS node, min(m) AS scc_id
            FROM base GROUP BY 1 ORDER BY 1""",
        "events_scd2_intervals": """
            WITH o AS (
              SELECT user_id, event_type, ts, event_id,
                     LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events),
            s AS (SELECT user_id, event_type, ts, event_id FROM o
                  WHERE prev IS NULL OR prev <> event_type)
            SELECT user_id, event_type, epoch_us(ts) AS valid_from,
                   coalesce(LEAD(epoch_us(ts)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id), -1)
                     AS valid_to
            FROM s ORDER BY 1, 3""",
        "quality_audit_events": """
            SELECT 'dup_event_id' AS rule,
                   count(*) - count(DISTINCT event_id) AS n_violations
            FROM events
            UNION ALL
            SELECT 'value_over_cap',
                   CAST(sum(CASE WHEN CAST(round(value * 100) AS BIGINT)
                                      > 30000 THEN 1 ELSE 0 END) AS BIGINT)
            FROM events
            UNION ALL
            SELECT 'unknown_event_type',
                   CAST(sum(CASE WHEN event_type NOT IN
                             ('click', 'purchase', 'signup', 'view')
                             THEN 1 ELSE 0 END) AS BIGINT)
            FROM events
            UNION ALL
            SELECT 'ts_after_cutoff',
                   CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-25 00:00:00'
                             THEN 1 ELSE 0 END) AS BIGINT)
            FROM events
            ORDER BY 1""",
        "rel_mannwhitney_u": """
            WITH d AS (
              SELECT CAST(round(value * 100) AS BIGINT) AS v,
                     CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
              FROM events WHERE event_type IN ('click', 'purchase')),
            g AS (SELECT v, CAST(sum(ia) AS BIGINT) AS na,
                         CAST(count(*) - sum(ia) AS BIGINT) AS nb
                  FROM d GROUP BY 1),
            o AS (SELECT v, na, nb,
                         coalesce(sum(na + nb) OVER (
                           ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS s
                  FROM g)
            SELECT CAST(sum(na) AS BIGINT) AS n_a,
                   CAST(sum(nb) AS BIGINT) AS n_b,
                   CAST(sum(na * (2 * s + na + nb + 1))
                        - sum(na) * (sum(na) + 1) AS BIGINT) AS u2_a
            FROM o""",
        "cq_response_latency": f"""
            WITH x AS (
              SELECT conv_id, turn_idx, role, epoch_us(ts) AS e,
                     first_value(CASE WHEN role = 'assistant'
                                      THEN epoch_us(ts) END IGNORE NULLS)
                       OVER (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS BETWEEN 1 FOLLOWING
                                  AND UNBOUNDED FOLLOWING) AS next_a
              FROM read_parquet('{fdir}/transcripts.parquet/*.parquet'))
            SELECT conv_id, count(*) AS n_pairs,
                   CAST(sum(next_a - e) AS BIGINT) AS sum_lat_us
            FROM x WHERE role = 'user' AND next_a IS NOT NULL
            GROUP BY 1 ORDER BY 1""",
        "events_top_paths": """
            WITH s AS (
              SELECT event_type AS t1,
                     LEAD(event_type, 1) OVER w AS t2,
                     LEAD(event_type, 2) OVER w AS t3
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT t1, t2, t3, count(*) AS n FROM s WHERE t3 IS NOT NULL
            GROUP BY 1, 2, 3 ORDER BY n DESC, t1, t2, t3 LIMIT 20""",
        "rel_pareto_abc": """
            WITH r AS (
              SELECT o_custkey,
                     CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS rev_c
              FROM orders GROUP BY 1),
            c AS (SELECT o_custkey, rev_c,
                         sum(rev_c) OVER (ORDER BY rev_c DESC, o_custkey
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum,
                         sum(rev_c) OVER () AS total
                  FROM r)
            SELECT o_custkey, rev_c,
                   CASE WHEN 100 * cum <= 80 * total THEN 'A'
                        WHEN 100 * cum <= 95 * total THEN 'B'
                        ELSE 'C' END AS abc
            FROM c ORDER BY rev_c DESC, o_custkey""",
        "events_robust_anomaly": """
            WITH c AS (SELECT event_id, event_type,
                              CAST(round(value * 100) AS BIGINT) AS vc
                       FROM events),
            m AS (SELECT event_type, quantile_disc(vc, 0.5) AS med
                  FROM c GROUP BY 1),
            d AS (SELECT c.event_type, abs(vc - med) AS dev
                  FROM c JOIN m USING (event_type)),
            md AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad
                   FROM d GROUP BY 1)
            SELECT event_id, c.event_type, vc
            FROM c JOIN m USING (event_type) JOIN md USING (event_type)
            WHERE abs(vc - med) > 3 * mad ORDER BY event_id""",
        "cq_trending_tools": f"""
            WITH c AS (
              SELECT date_diff('day', DATE '1970-01-01',
                               CAST(ts AS DATE)) AS day,
                     {normalize_sql('tool')} AS tool, count(*) AS n
              FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
              WHERE {TOOL_OK_SQL} GROUP BY 1, 2),
            r AS (SELECT *, row_number() OVER (
                    PARTITION BY day ORDER BY n DESC, tool) AS rk
                  FROM c)
            SELECT day, tool, n, rk AS rank FROM r
            WHERE rk <= 3 ORDER BY day, rk""",
        "events_stickiness": """
            WITH d AS (SELECT DISTINCT user_id,
                         date_diff('day', DATE '1970-01-01',
                                   CAST(ts AS DATE)) AS day FROM events),
            dau AS (SELECT day, count(*) AS dau FROM d GROUP BY 1),
            wau AS (SELECT s.day, count(DISTINCT d.user_id) AS wau
                    FROM (SELECT DISTINCT day FROM d) s
                    JOIN d ON d.day BETWEEN s.day - 6 AND s.day
                    GROUP BY 1)
            SELECT day, dau, wau FROM dau JOIN wau USING (day)
            ORDER BY 1""",
        "kg_bgp_conv_entity": P + f"""
            SELECT DISTINCT
                   '{C.ENT}conversation/' || mn.conv_id AS c,
                   '{C.WD}' || l.entity_id AS ent
            FROM mention mn JOIN linked l
              ON l.form = mn.canonical AND l.entity_id IS NOT NULL
            ORDER BY 1, 2""",
        "kg_completeness_metrics": P + f"""
            SELECT 'conv_without_tool' AS check,
                   (SELECT count(DISTINCT conv_id) FROM t) AS n_total,
                   (SELECT count(*) FROM (
                      SELECT conv_id FROM t GROUP BY 1
                      HAVING sum(CASE WHEN {TOOL_OK_SQL}
                                 THEN 1 ELSE 0 END) = 0)) AS n_missing
            UNION ALL
            SELECT 'mention_unlinked',
                   (SELECT count(*) FROM forms),
                   (SELECT count(*) FROM forms)
                   - (SELECT count(*) FROM linked
                      WHERE entity_id IS NOT NULL)
            UNION ALL
            SELECT 'turn_without_mention',
                   (SELECT count(*) FROM t),
                   (SELECT count(*) FROM t)
                   - (SELECT count(DISTINCT turn_iri) FROM mention)
            ORDER BY 1""",
        "events_attribution": """
            WITH p AS (SELECT event_id AS purchase_id, user_id, ts
                       FROM events WHERE event_type = 'purchase'),
            c AS (SELECT event_id AS click_id, user_id, ts
                  FROM events WHERE event_type = 'click'),
            j AS (SELECT p.purchase_id, c.click_id,
                         epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
                         row_number() OVER (
                           PARTITION BY p.purchase_id
                           ORDER BY c.ts DESC, c.click_id DESC) AS rk
                  FROM p JOIN c ON c.user_id = p.user_id AND c.ts < p.ts
                   AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000)
            SELECT purchase_id, click_id, gap_us FROM j
            WHERE rk = 1 ORDER BY purchase_id""",
        "kg_clustering_coeff": P + """
            , ce AS (SELECT DISTINCT a.canonical AS u, b.canonical AS v
                     FROM mention a JOIN mention b
                       ON a.turn_iri = b.turn_iri
                      AND a.canonical < b.canonical),
            und AS (SELECT u AS x, v AS y FROM ce
                    UNION ALL SELECT v, u FROM ce),
            tri AS (SELECT p.x AS node, count(*) AS n_triangles
                    FROM und p JOIN und q ON p.x = q.x AND p.y < q.y
                    JOIN ce ON ce.u = p.y AND ce.v = q.y
                    GROUP BY 1),
            deg AS (SELECT x AS node, count(*) AS d FROM und GROUP BY 1)
            SELECT deg.node, coalesce(tri.n_triangles, 0) AS n_triangles,
                   CAST(d * (d - 1) // 2 AS BIGINT) AS n_wedges
            FROM deg LEFT JOIN tri USING (node) ORDER BY 1""",
        "events_winsorized": """
            WITH c AS (SELECT event_id, event_type,
                              CAST(round(value * 100) AS BIGINT) AS vc
                       FROM events),
            q AS (SELECT event_type,
                         quantile_disc(vc, 0.05) AS lo,
                         quantile_disc(vc, 0.95) AS hi
                  FROM c GROUP BY 1)
            SELECT event_id, c.event_type,
                   least(greatest(vc, lo), hi) AS vc_capped
            FROM c JOIN q USING (event_type) ORDER BY event_id""",
        "events_trailing_sum_1h": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS win_sum_c
            FROM events ORDER BY event_id""",
        "events_time_in_state": """
            WITH o AS (
              SELECT user_id, event_type, ts, event_id,
                     LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events),
            s AS (SELECT user_id, event_type, ts, event_id FROM o
                  WHERE prev IS NULL OR prev <> event_type),
            i AS (SELECT user_id, event_type, epoch_us(ts) AS valid_from,
                         LEAD(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id)
                           AS valid_to
                  FROM s)
            SELECT user_id, event_type, count(*) AS n_intervals,
                   CAST(sum(valid_to - valid_from) AS BIGINT) AS total_us
            FROM i WHERE valid_to IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "kg_bgp_filtered": P + f"""
            SELECT DISTINCT '{C.ENT}mention/' || m.canonical AS m,
                   '{C.ENT}tool/' || {normalize_sql('t.tool')} AS tool
            FROM mention m JOIN t ON t.turn_iri = m.turn_iri
            WHERE {TOOL_OK_SQL.replace('tool', 't.tool')}
              AND {normalize_sql('t.tool')} IN {BGP_FILTER_TOOLS!r}
              AND m.canonical <> '{BGP_FILTER_EXCL}'
            ORDER BY 1, 2""",
        "kg_bgp_union": P + f"""
            SELECT DISTINCT c, x FROM (
              SELECT conv_iri AS c,
                     '{C.ENT}tool/' || {normalize_sql('tool')} AS x
              FROM t WHERE {TOOL_OK_SQL}
              UNION
              SELECT '{C.ENT}conversation/' || conv_id AS c,
                     '{C.ENT}mention/' || canonical AS x
              FROM mention)
            ORDER BY 1, 2""",
        "kg_bgp_minus": P + f"""
            SELECT DISTINCT m.turn_iri AS t,
                   '{C.ENT}mention/' || m.canonical AS m
            FROM mention m
            WHERE m.turn_iri NOT IN (
              SELECT turn_iri FROM t
              WHERE {TOOL_OK_SQL} AND {normalize_sql('tool')} = 'bash')
            ORDER BY 1, 2""",
        "kg_bgp_path": P + f"""
            SELECT DISTINCT conv_iri AS c,
                   '{C.ENT}tool/' || {normalize_sql('tool')} AS tool
            FROM t WHERE {TOOL_OK_SQL}
            ORDER BY 1, 2""",
        "kg_bgp_alt": P + f"""
            SELECT DISTINCT t, x FROM (
              SELECT turn_iri AS t,
                     '{C.ENT}tool/' || {normalize_sql('tool')} AS x
              FROM t WHERE {TOOL_OK_SQL}
              UNION
              SELECT turn_iri AS t, '{C.ENT}mention/' || canonical AS x
              FROM mention)
            ORDER BY 1, 2""",
        "kg_construct_cooccurs": P + f"""
            SELECT DISTINCT '{C.ENT}mention/' || m.canonical AS subj,
                   '{PRED_CO_OCCURS}' AS pred,
                   '{C.ENT}tool/' || {normalize_sql('t.tool')} AS obj
            FROM mention m JOIN t ON t.turn_iri = m.turn_iri
            WHERE {TOOL_OK_SQL.replace('tool', 't.tool')}
            ORDER BY 1, 3""",
        "kg_sparql_group_agg": P + f"""
            SELECT '{C.ENT}tool/' || {normalize_sql('t.tool')} AS tool,
                   count(DISTINCT m.canonical) AS n_mentions
            FROM mention m JOIN t ON t.turn_iri = m.turn_iri
            WHERE {TOOL_OK_SQL.replace('tool', 't.tool')}
            GROUP BY 1 ORDER BY 1""",
        "kg_adamic_adar": P + """
            , md AS (SELECT DISTINCT turn_iri, canonical FROM mention),
            wt AS (SELECT turn_iri,
                          CAST(round(1000000.0 / ln(count(*))) AS BIGINT)
                            AS w
                   FROM md GROUP BY 1 HAVING count(*) >= 2)
            SELECT a.canonical AS u, b.canonical AS v,
                   CAST(count(*) AS BIGINT) AS n_shared,
                   CAST(sum(wt.w) AS BIGINT) AS aa_fp
            FROM md a JOIN md b ON a.turn_iri = b.turn_iri
                                AND a.canonical < b.canonical
            JOIN wt ON wt.turn_iri = a.turn_iri
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "events_entropy_by_user": """
            WITH c AS (SELECT user_id, event_type, count(*) AS c
                       FROM events GROUP BY 1, 2)
            SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
                   CAST(count(*) AS BIGINT) AS n_types,
                   ln(sum(c)) - sum(c * ln(c)) / sum(c) AS entropy
            FROM c GROUP BY 1 ORDER BY 1""",
        "text_pmi_bigrams": """
            WITH w AS (SELECT string_split(lower(text), ' ') AS ws
                       FROM documents),
            idx AS (SELECT ws, unnest(range(1, len(ws))) AS i FROM w),
            bi AS (SELECT ws[i] AS a, ws[i + 1] AS b FROM idx),
            bc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
                   FROM bi GROUP BY 1, 2),
            uc AS (SELECT unnest(ws) AS w FROM w),
            u AS (SELECT w, count(*) AS c FROM uc GROUP BY 1),
            tot AS (SELECT (SELECT count(*) FROM uc) AS n,
                           (SELECT count(*) FROM bi) AS m)
            SELECT bc.a, bc.b, bc.n_ab,
                   ln(bc.n_ab) + 2 * ln(tot.n) - ln(tot.m)
                     - ln(ua.c) - ln(ub.c) AS pmi
            FROM bc CROSS JOIN tot
            JOIN u ua ON ua.w = bc.a
            JOIN u ub ON ub.w = bc.b
            WHERE bc.n_ab >= 5
            ORDER BY bc.a, bc.b""",
        "rel_above_avg_orders": """
            WITH o AS (SELECT o_custkey,
                              CAST(round(o_totalprice * 100) AS BIGINT)
                                AS cents
                       FROM orders),
            s AS (SELECT o_custkey, sum(cents) AS s, count(*) AS n
                  FROM o GROUP BY 1)
            SELECT s.o_custkey, CAST(s.n AS BIGINT) AS n_orders,
                   CAST(sum(CASE WHEN o.cents * s.n > s.s
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_above
            FROM o JOIN s ON o.o_custkey = s.o_custkey
            GROUP BY 1, 2 ORDER BY 1""",
        "dedup_prefix": """
            SELECT d.doc_id FROM documents d
            WHERE EXISTS (SELECT 1 FROM documents e
                          WHERE e.doc_id <> d.doc_id
                            AND left(e.text, length(d.text)) = d.text)
            ORDER BY doc_id""",
        "rel_tpch_q18": """
            WITH q AS (SELECT l_orderkey,
                              CAST(sum(CAST(round(l_quantity) AS BIGINT))
                                   AS BIGINT) AS sum_qty
                       FROM lineitem GROUP BY 1
                       HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300)
            SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
                   CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_c,
                   q.sum_qty
            FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY total_c DESC, o.o_orderkey LIMIT 100""",
        "events_chi2_dow": """
            WITH c AS (SELECT event_type, isodow(ts) AS dow,
                              count(*) AS n
                       FROM events GROUP BY 1, 2),
            rt AS (SELECT event_type, sum(n) AS r FROM c GROUP BY 1),
            ct AS (SELECT dow, sum(n) AS cl FROM c GROUP BY 1),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c)
            SELECT tot.t AS n,
                   CAST(((SELECT count(*) FROM rt) - 1)
                        * ((SELECT count(*) FROM ct) - 1) AS BIGINT)
                     AS dof,
                   tot.t * sum(CAST(c.n AS DOUBLE) * c.n
                               / (CAST(rt.r AS DOUBLE) * ct.cl))
                     - tot.t AS chi2
            FROM c JOIN rt USING (event_type) JOIN ct USING (dow)
            CROSS JOIN tot GROUP BY 1, 2""",
        "kg_assortativity": P + """
            , ce AS (SELECT DISTINCT a.canonical AS u, b.canonical AS v
                     FROM mention a JOIN mention b
                       ON a.turn_iri = b.turn_iri
                      AND a.canonical < b.canonical),
            und AS (SELECT u, v FROM ce UNION ALL SELECT v, u FROM ce),
            deg AS (SELECT u AS node, count(*) AS d FROM und GROUP BY 1),
            j AS (SELECT du.d AS x, dv.d AS y FROM und
                  JOIN deg du ON du.node = und.u
                  JOIN deg dv ON dv.node = und.v),
            s AS (SELECT CAST(count(*) AS BIGINT) AS m2,
                         CAST(sum(x) AS BIGINT) AS sx,
                         CAST(sum(x * y) AS BIGINT) AS sxy,
                         CAST(sum(x * x) AS BIGINT) AS sx2 FROM j)
            SELECT CAST(m2 // 2 AS BIGINT) AS n_edges,
                   CASE WHEN m2 * sx2 - sx * sx = 0 THEN 0.0
                        ELSE CAST(m2 * sxy - sx * sx AS DOUBLE)
                             / (m2 * sx2 - sx * sx) END AS r
            FROM s""",
        "kg_sparql_ask": P + f"""
            SELECT q, CAST(CASE WHEN EXISTS (
                     SELECT 1 FROM mention m JOIN t
                       ON t.turn_iri = m.turn_iri
                     WHERE {TOOL_OK_SQL.replace('tool', 't.tool')}
                       AND '{C.ENT}tool/' || {normalize_sql('t.tool')} = q)
                   THEN 1 ELSE 0 END AS BIGINT) AS answer
            FROM (VALUES ('{C.ENT}tool/{ASK_TOOL_TRUE}'),
                         ('{C.ENT}tool/{ASK_TOOL_FALSE}')) AS v(q)
            ORDER BY q""",
        "kg_describe": P + f"""
            SELECT subj, pred, obj
            FROM ({_structural_sql()} UNION {_mention_sql()})
            WHERE subj = '{C.ENT}tool/{DESCRIBE_NODE_TOOL}'
               OR obj = '{C.ENT}tool/{DESCRIBE_NODE_TOOL}'
            ORDER BY 1, 2, 3""",
        "events_ab_test": """
            WITH u AS (SELECT user_id,
                              CASE WHEN sum(CASE WHEN event_type
                                                      = 'purchase'
                                                 THEN 1 ELSE 0 END)
                                        > sum(CASE WHEN event_type
                                                        = 'view'
                                                   THEN 1 ELSE 0 END)
                                   THEN 1 ELSE 0 END AS conv
                       FROM events GROUP BY 1),
            a AS (SELECT user_id % 2 AS arm, count(*) AS n,
                         sum(conv) AS c
                  FROM u GROUP BY 1),
            p AS (SELECT CAST(max(CASE WHEN arm = 0 THEN n END)
                              AS BIGINT) AS n_a,
                         CAST(max(CASE WHEN arm = 1 THEN n END)
                              AS BIGINT) AS n_b,
                         CAST(max(CASE WHEN arm = 0 THEN c END)
                              AS BIGINT) AS conv_a,
                         CAST(max(CASE WHEN arm = 1 THEN c END)
                              AS BIGINT) AS conv_b
                  FROM a)
            SELECT n_a, n_b, conv_a, conv_b,
                   CASE WHEN conv_a + conv_b = 0
                          OR conv_a + conv_b = n_a + n_b THEN 0.0
                        ELSE (CAST(conv_b AS DOUBLE) / n_b
                              - CAST(conv_a AS DOUBLE) / n_a)
                             / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                                     / (n_a + n_b))
                                    * (1 - CAST(conv_a + conv_b AS DOUBLE)
                                           / (n_a + n_b))
                                    * (1.0 / n_a + 1.0 / n_b)) END AS z
            FROM p""",
        "dedup_suffix": """
            SELECT d.doc_id FROM documents d
            WHERE EXISTS (SELECT 1 FROM documents e
                          WHERE e.doc_id <> d.doc_id
                            AND right(e.text, length(d.text)) = d.text)
            ORDER BY doc_id""",
        "text_zipf_fit": f"""
            WITH uc AS (SELECT unnest(string_split(lower(text), ' '))
                               AS w
                        FROM documents),
            u AS (SELECT w, count(*) AS c FROM uc GROUP BY 1),
            top AS (SELECT c, row_number() OVER (ORDER BY c DESC, w)
                             AS rnk
                    FROM u ORDER BY c DESC, w LIMIT {ZIPF_TOP}),
            pts AS (SELECT ln(CAST(rnk AS DOUBLE)) AS x,
                           ln(CAST(c AS DOUBLE)) AS y FROM top),
            s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
                         sum(y) AS sy, sum(x * y) AS sxy,
                         sum(x * x) AS sx2 FROM pts)
            SELECT n AS n_terms,
                   (n * sxy - sx * sy) / (n * sx2 - sx * sx) AS slope,
                   (sy - (n * sxy - sx * sy) / (n * sx2 - sx * sx) * sx)
                     / n AS intercept
            FROM s""",
        "kg_group_concat": P + f"""
            , dd AS (SELECT DISTINCT m.canonical,
                            '{C.ENT}tool/' || {normalize_sql('t.tool')}
                              AS tool
                     FROM mention m JOIN t ON t.turn_iri = m.turn_iri
                     WHERE {TOOL_OK_SQL.replace('tool', 't.tool')})
            SELECT tool,
                   string_agg(canonical, ',' ORDER BY canonical)
                     AS mentions_csv,
                   CAST(count(*) AS BIGINT) AS n_mentions
            FROM dd GROUP BY 1 ORDER BY 1""",
        "kg_incremental_delta": P + f"""
            , tb AS (SELECT * FROM t
                     WHERE CAST(substring(conv_id, 5) AS BIGINT)
                           % {DELTA_MOD} <> 0),
            td AS (SELECT * FROM t
                   WHERE CAST(substring(conv_id, 5) AS BIGINT)
                         % {DELTA_MOD} = 0)
            SELECT subj, pred, obj FROM (
              SELECT subj, pred, obj
              FROM ({_structural_sql().replace('FROM t', 'FROM td')})
              UNION
              SELECT m.turn_iri, '{C.PRED_MENTIONS}',
                     '{C.ENT}mention/' || canonical
              FROM mention m
              WHERE CAST(substring(m.conv_id, 5) AS BIGINT)
                    % {DELTA_MOD} = 0
              EXCEPT
              (SELECT subj, pred, obj
               FROM ({_structural_sql().replace('FROM t', 'FROM tb')})
               UNION
               SELECT m.turn_iri, '{C.PRED_MENTIONS}',
                      '{C.ENT}mention/' || canonical
               FROM mention m
               WHERE CAST(substring(m.conv_id, 5) AS BIGINT)
                     % {DELTA_MOD} <> 0))
            ORDER BY 1, 2, 3""",
        "kg_bgp_transitive": f"""
            SELECT DISTINCT '{C.ENT}type/' || a AS c,
                   '{C.ENT}type/' || b AS root
            FROM (
              WITH RECURSIVE r(a, b) AS (
                SELECT type_id, super_type_id
                FROM read_parquet('{fdir}/type_hierarchy.parquet')
                UNION
                SELECT r.a, th.super_type_id
                FROM r
                JOIN read_parquet('{fdir}/type_hierarchy.parquet') th
                  ON th.type_id = r.b
              ) SELECT a, b FROM r) q
            ORDER BY 1, 2""",
        "kg_sparql_topk": P + f"""
            SELECT '{C.ENT}mention/' || canonical AS m,
                   CAST(count(DISTINCT turn_iri) AS BIGINT) AS n_turns
            FROM mention GROUP BY 1
            ORDER BY n_turns DESC, m LIMIT {SPARQL_TOPK}""",
        "dedup_keep_best": "WITH RECURSIVE " + _SHINGLE_CTE + ","
            + _CANON_CTE + """,
            m AS (SELECT d.doc_id, coalesce(c.c, d.doc_id) AS canon_id,
                         d.n_chars
                  FROM documents d LEFT JOIN canon c ON c.node = d.doc_id),
            r AS (SELECT canon_id, doc_id,
                         row_number() OVER (PARTITION BY canon_id
                                            ORDER BY n_chars DESC,
                                                     doc_id) AS rn,
                         count(*) OVER (PARTITION BY canon_id) AS sz
                  FROM m)
            SELECT canon_id, doc_id AS keep_doc_id,
                   CAST(sz AS BIGINT) AS sz
            FROM r WHERE rn = 1 ORDER BY canon_id""",
        "curation_char_budget": "WITH "
            + _splitmix_cte("documents", "doc_id", "doc_id, n_chars")
            + """,
            r AS (SELECT doc_id, n_chars,
                         sum(n_chars) OVER (ORDER BY u01, doc_id
                                            ROWS UNBOUNDED PRECEDING)
                           AS cum
                  FROM u)
            SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(cum AS BIGINT) AS cum_chars
            FROM r WHERE cum <= 60000 ORDER BY doc_id""",
        "kg_void_stats": P + f"""
            SELECT pred, CAST(count(*) AS BIGINT) AS n_triples,
                   CAST(count(DISTINCT subj) AS BIGINT) AS n_subj,
                   CAST(count(DISTINCT obj) AS BIGINT) AS n_obj
            FROM ({_structural_sql()} UNION {_mention_sql()})
            GROUP BY 1 ORDER BY 1""",
        "kg_bgp_reordered": P + f"""
            SELECT DISTINCT tri.subj AS t, tri.pred AS p, tri.obj AS x
            FROM ({_structural_sql()} UNION {_mention_sql()}) tri
            JOIN (SELECT DISTINCT turn_iri FROM mention
                  WHERE canonical = '{BGP_FILTER_EXCL}') esp
              ON esp.turn_iri = tri.subj
            ORDER BY 1, 2, 3""",
        "privacy_k_anonymity": f"""
            SELECT event_type, isodow(ts) AS dow,
                   CAST(hour(ts) AS BIGINT) AS hod,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2, 3
            HAVING count(*) < {K_ANON}
            ORDER BY 1, 2, 3""",
        "rel_tpch_q6": """
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(coalesce(sum(
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round(l_discount * 100) AS BIGINT)), 0)
                     AS BIGINT) AS revenue_c2
            FROM lineitem
            WHERE year(l_shipdate) = 1996
              AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
              AND CAST(round(l_quantity) AS BIGINT) < 24""",
        "rel_tpch_q14": """
            WITH j AS (
              SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       AS rev_c2,
                     CAST(p.p_type = 'PROMO' AS BIGINT) AS is_promo
              FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
              WHERE year(l_shipdate) = 1996 AND month(l_shipdate) = 3)
            SELECT CAST(coalesce(sum(rev_c2 * is_promo), 0) AS BIGINT)
                     AS promo_c2,
                   CAST(coalesce(sum(rev_c2), 0) AS BIGINT) AS total_c2,
                   100.0 * coalesce(sum(rev_c2 * is_promo), 0)
                     / sum(rev_c2) AS promo_pct
            FROM j""",
        "rel_fk_audit": _fk_audit_sql(),
        "rel_tpch_q10": """
            WITH r AS (
              SELECT o.o_custkey,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100)
                                       AS BIGINT))) AS revenue_c2
              FROM lineitem l JOIN orders o
                ON o.o_orderkey = l.l_orderkey
              WHERE l.l_returnflag = 'R'
                AND year(l.l_shipdate) = 1996
                AND month(l.l_shipdate) <= 3
              GROUP BY 1)
            SELECT r.o_custkey, c.c_name,
                   CAST(r.revenue_c2 AS BIGINT) AS revenue_c2
            FROM r JOIN customer c ON c.c_custkey = r.o_custkey
            ORDER BY r.revenue_c2 DESC, r.o_custkey LIMIT 20""",
        "rel_tpch_q19": """
            WITH j AS (
              SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       AS rev_c2,
                     CAST(round(l_quantity) AS BIGINT) AS qty,
                     p.p_brand AS brand, p.p_size AS sz
              FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
            m AS (SELECT * FROM j WHERE
                  (brand = 'Brand#1' AND sz BETWEEN 1 AND 10
                   AND qty BETWEEN 1 AND 15)
               OR (brand = 'Brand#2' AND sz BETWEEN 1 AND 20
                   AND qty BETWEEN 10 AND 25)
               OR (brand = 'Brand#3' AND sz BETWEEN 1 AND 30
                   AND qty BETWEEN 20 AND 35))
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(coalesce(sum(rev_c2), 0) AS BIGINT) AS revenue_c2
            FROM m""",
        "sample_systematic": "WITH "
            + _splitmix_cte("documents", "doc_id", "doc_id") + f""",
            r AS (SELECT doc_id,
                         row_number() OVER (ORDER BY u01) - 1 AS rk
                  FROM u)
            SELECT doc_id FROM r WHERE rk % {SYSTEMATIC_K} = 0
            ORDER BY doc_id""",
        "kg_sparql_having": P + f"""
            SELECT '{C.ENT}mention/' || canonical AS m,
                   CAST(count(DISTINCT turn_iri) AS BIGINT) AS n_turns
            FROM mention GROUP BY 1
            HAVING count(DISTINCT turn_iri) * 128
                   >= (SELECT count(*) FROM t)
            ORDER BY 1""",
        "kg_harmonic_centrality": f"""
            WITH RECURSIVE ts AS (
              SELECT conv_id, turn_idx, {normalize_sql('tool')} AS tool
              FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
              WHERE {TOOL_OK_SQL}),
            seq AS (SELECT conv_id, tool,
                           LEAD(tool) OVER (PARTITION BY conv_id
                                            ORDER BY turn_idx) AS nxt
                    FROM ts),
            edges AS (SELECT DISTINCT tool AS src, nxt AS dst
                      FROM seq WHERE nxt IS NOT NULL AND nxt <> tool),
            -- d < 32 caps the walk; a shortest path is simple, so any
            -- graph with <= 33 nodes (the tool vocabulary) is exact
            w(src, dst, d) AS (
              SELECT src, dst, 1 FROM edges
              UNION
              SELECT w.src, e.dst, w.d + 1
              FROM w JOIN edges e ON e.src = w.dst WHERE w.d < 32),
            sp AS (SELECT src, dst, min(d) AS dist FROM w
                   WHERE src <> dst GROUP BY 1, 2)
            SELECT src AS node, CAST(count(*) AS BIGINT) AS n_reachable,
                   CAST(sum(CAST(round(1000000.0 / dist) AS BIGINT))
                        AS BIGINT) AS harmonic_fp
            FROM sp GROUP BY 1 ORDER BY 1""",
    }
    out["text_dispersion"] = f"""
        WITH w AS (SELECT doc_id,
                          unnest(string_split(lower(text), ' ')) AS w
                   FROM documents),
        m AS (SELECT doc_id, w, count(*) AS m FROM w GROUP BY 1, 2)
        SELECT w AS term, CAST(count(*) AS BIGINT) AS df,
               CAST(sum(m) AS BIGINT) AS total,
               CAST(sum(m * m) AS BIGINT) AS sum_sq
        FROM m GROUP BY 1
        ORDER BY total DESC, term LIMIT {DISPERSION_TOP}"""
    out["rel_merge_upsert"] = """
        WITH ch AS (SELECT user_id AS k,
                           CAST(round(value * 100) AS BIGINT) AS v,
                           epoch_us(ts) AS t, event_id AS s
                    FROM events WHERE event_type = 'purchase'),
        u AS (SELECT c_custkey AS k,
                     CAST(round(c_acctbal * 100) AS BIGINT) AS v,
                     CAST(-1 AS BIGINT) AS t, CAST(-1 AS BIGINT) AS s
              FROM customer
              UNION ALL SELECT k, v, t, s FROM ch),
        r AS (SELECT k, v, row_number() OVER (
                PARTITION BY k ORDER BY t DESC, s DESC) AS rn FROM u),
        n AS (SELECT k, CAST(count(*) AS BIGINT) AS n_updates
              FROM ch GROUP BY 1)
        SELECT r.k AS custkey, r.v AS acctbal_c,
               coalesce(n.n_updates, 0) AS n_updates
        FROM r LEFT JOIN n ON n.k = r.k WHERE rn = 1 ORDER BY 1"""
    out["emb_label_coherence"] = """
        WITH p AS (
          SELECT CAST(round(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])) * 1000000)
                 AS BIGINT) AS fp,
                 CAST(a.label = b.label AS BIGINT) AS same
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        SELECT CAST(sum(same) AS BIGINT) AS n_intra,
               CAST(sum(fp * same) AS BIGINT) AS sum_intra_fp,
               CAST(sum(1 - same) AS BIGINT) AS n_inter,
               CAST(sum(fp * (1 - same)) AS BIGINT) AS sum_inter_fp
        FROM p"""
    out["kg_graph_diameter"] = out["kg_harmonic_centrality"].replace(
        """SELECT src AS node, CAST(count(*) AS BIGINT) AS n_reachable,
                   CAST(sum(CAST(round(1000000.0 / dist) AS BIGINT))
                        AS BIGINT) AS harmonic_fp
            FROM sp GROUP BY 1 ORDER BY 1""",
        """SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                   CAST(max(ecc) AS BIGINT) AS diameter,
                   CAST(min(ecc) AS BIGINT) AS radius
            FROM (SELECT src, max(dist) AS ecc FROM sp GROUP BY 1)""")
    out["rel_tpch_q4"] = """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders
        WHERE year(o_orderdate) = 1996
          AND month(o_orderdate) BETWEEN 7 AND 9
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_returnflag = 'R')
        GROUP BY 1 ORDER BY 1"""
    out["rel_tpch_q12"] = """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT)
                 AS low_line_count
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE year(l_shipdate) = 1996
        GROUP BY 1 ORDER BY 1"""
    out["rel_tpch_q13"] = """
        WITH o AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS c_count
                   FROM orders WHERE o_orderpriority <> '5-LOW'
                   GROUP BY 1),
        j AS (SELECT c.c_custkey, coalesce(o.c_count, 0) AS c_count
              FROM customer c LEFT JOIN o ON o.o_custkey = c.c_custkey)
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM j GROUP BY 1 ORDER BY custdist DESC, c_count DESC"""
    out["rel_tpch_q7"] = """
        WITH j AS (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS BIGINT) AS l_year,
                 CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
          FROM lineitem, orders, customer, supplier, nation n1, nation n2
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND l_suppkey = s_suppkey
            AND s_nationkey = n1.n_nationkey
            AND c_nationkey = n2.n_nationkey
            AND ((n1.n_nationkey = 3 AND n2.n_nationkey = 8)
                 OR (n1.n_nationkey = 8 AND n2.n_nationkey = 3))
            AND year(l_shipdate) IN (1996, 1997))
        SELECT supp_nation, cust_nation, l_year,
               CAST(sum(rev) AS BIGINT) AS revenue_c2
        FROM j GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""
    out["rel_tpch_q8"] = """
        WITH j AS (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev,
                 CAST(s_nationkey = 3 AS BIGINT) AS is_tgt
          FROM lineitem, orders, customer, supplier, part,
               nation n2, region
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND l_suppkey = s_suppkey AND l_partkey = p_partkey
            AND c_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r_regionkey AND r_regionkey = 1
            AND p_type = 'PROMO'
            AND year(o_orderdate) IN (1996, 1997))
        SELECT o_year,
               CAST(sum(rev * is_tgt) AS BIGINT) AS nation_c2,
               CAST(sum(rev) AS BIGINT) AS total_c2,
               1.0 * sum(rev * is_tgt) / sum(rev) AS mkt_share
        FROM j GROUP BY 1 ORDER BY 1"""
    out["rel_tpch_q9"] = """
        WITH j AS (
          SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))
                 - 100 * CAST(round(p_retailprice * 100) AS BIGINT)
                   * CAST(floor(l_quantity) AS BIGINT) AS profit
          FROM lineitem, orders, supplier, part, nation
          WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
            AND l_partkey = p_partkey AND s_nationkey = n_nationkey
            AND p_type = 'PROMO')
        SELECT n_name, o_year, CAST(sum(profit) AS BIGINT) AS profit_c2
        FROM j GROUP BY 1, 2 ORDER BY 1, 2"""
    out["rel_tpch_q11"] = """
        WITH v AS (
          SELECT l_partkey,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100)
                                        AS BIGINT))) AS BIGINT) AS value_c2
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          WHERE s_nationkey = 3 GROUP BY 1),
        t AS (SELECT CAST(sum(value_c2) AS BIGINT) AS total,
                     CAST(count(*) AS BIGINT) AS n FROM v)
        SELECT l_partkey, value_c2 FROM v, t
        WHERE value_c2 * n > 2 * total ORDER BY value_c2 DESC"""
    out["rel_tpch_q15"] = """
        WITH r AS (
          SELECT l_suppkey AS s_suppkey,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100)
                                        AS BIGINT))) AS BIGINT)
                   AS total_revenue_c2
          FROM lineitem
          WHERE year(l_shipdate) = 1996 AND month(l_shipdate) <= 3
          GROUP BY 1)
        SELECT s_suppkey, s_name, total_revenue_c2
        FROM r JOIN supplier USING (s_suppkey)
        WHERE total_revenue_c2 = (SELECT max(total_revenue_c2) FROM r)
        ORDER BY s_suppkey"""
    out["rel_tpch_q16"] = """
        SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) li
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE p_brand <> 'Brand#1' AND s_acctbal >= 1000
        GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, 1, 2, 3"""
    out["rel_tpch_q2"] = """
        WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey
                       FROM lineitem),
        cand AS (
          SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
                 n.n_name,
                 CAST(round(s.s_acctbal * 100) AS BIGINT) AS s_acctbal_c,
                 row_number() OVER (
                   PARTITION BY p.p_partkey
                   ORDER BY round(s.s_acctbal * 100), s.s_suppkey) AS rn
          FROM pairs
          JOIN part p ON p.p_partkey = pairs.l_partkey
          JOIN supplier s ON s.s_suppkey = pairs.l_suppkey
          JOIN nation n ON n.n_nationkey = s.s_nationkey
          WHERE p.p_type = 'STANDARD' AND p.p_size >= 25
            AND n.n_regionkey = 3)
        SELECT s_acctbal_c, s_name, n_name, p_partkey, p_name
        FROM cand WHERE rn = 1 ORDER BY s_acctbal_c DESC, p_partkey"""
    out["rel_tpch_q20"] = """
        WITH sp AS (
          SELECT l_partkey, l_suppkey,
                 CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                   AS q
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_type = 'PROMO' AND year(l_shipdate) = 1996
          GROUP BY 1, 2),
        pt AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS tq
               FROM sp GROUP BY 1)
        SELECT DISTINCT s.s_suppkey, s.s_name
        FROM sp JOIN pt USING (l_partkey)
        JOIN supplier s ON s.s_suppkey = sp.l_suppkey
        WHERE 2 * sp.q > pt.tq ORDER BY 1"""
    out["rel_tpch_q21"] = """
        WITH ls AS (
          SELECT l_orderkey, l_suppkey,
                 max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
          FROM lineitem GROUP BY 1, 2),
        o AS (SELECT l_orderkey, count(*) AS ns,
                     CAST(sum(r) AS BIGINT) AS nr
              FROM ls GROUP BY 1)
        SELECT s.s_suppkey, s.s_name,
               CAST(count(*) AS BIGINT) AS numwait
        FROM ls JOIN o USING (l_orderkey)
        JOIN orders ON o_orderkey = ls.l_orderkey
        JOIN supplier s ON s.s_suppkey = ls.l_suppkey
        WHERE o_orderstatus = 'F' AND ls.r = 1
          AND o.ns >= 2 AND o.nr = 1
        GROUP BY 1, 2 ORDER BY numwait DESC, 1"""
    out["rel_tpch_q22"] = """
        WITH sel AS (
          SELECT c_custkey, c_nationkey % 10 AS cntrycode,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
          FROM customer WHERE c_nationkey % 10 BETWEEN 1 AND 7),
        pos AS (SELECT CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(bal_c) AS BIGINT) AS s
                FROM sel WHERE bal_c > 0)
        SELECT CAST(cntrycode AS BIGINT) AS cntrycode,
               CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
        FROM sel, pos
        WHERE bal_c * n > s
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY 1 ORDER BY 1"""
    out["curation_profile"] = _profile_sql()
    out["events_bootstrap_mean"] = _bootstrap_sql()
    out["approx_distinct_overlap"] = _approx_overlap_sql()
    out["rel_zorder_keys"] = _zorder_sql()
    out["privacy_pseudonymize"] = _pseudonymize_sql()
    out["events_peak_concurrency"] = """
        WITH o AS (SELECT user_id, ts, event_id,
                          CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                                 OR epoch_us(ts) - LAG(epoch_us(ts))
                                    OVER w > 1800000000
                               THEN 1 ELSE 0 END AS brk
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id)),
        sid AS (SELECT user_id, ts,
                       sum(brk) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS s
                FROM o),
        ses AS (SELECT user_id, s, min(epoch_us(ts)) AS st,
                       max(epoch_us(ts)) AS en
                FROM sid GROUP BY 1, 2),
        d AS (SELECT st AS t, 1 AS dv FROM ses
              UNION ALL SELECT en + 1, -1 FROM ses),
        g AS (SELECT t, CAST(sum(dv) AS BIGINT) AS net
              FROM d GROUP BY 1),
        p AS (SELECT max(c) AS peak FROM (
                SELECT sum(net) OVER (ORDER BY t) AS c FROM g))
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM ses)
                 AS n_sessions,
               CAST(p.peak AS BIGINT) AS peak
        FROM p"""
    out["events_churn_labels"] = """
        WITH uw AS (SELECT DISTINCT user_id,
                           epoch_us(ts) // 86400000000 // 7 AS week
                    FROM events)
        SELECT a.user_id, CAST(a.week AS BIGINT) AS week,
               CAST(EXISTS(SELECT 1 FROM uw b
                           WHERE b.user_id = a.user_id
                             AND b.week = a.week + 1) AS BIGINT)
                 AS will_return
        FROM uw a ORDER BY 1, 2"""
    out["search_rrf_fusion"] = _rrf_sql().replace(
        "{UNIGRAM}", out["text_unigram_freq"])
    out["rel_psi_drift"] = """
        WITH e AS (SELECT event_type,
                          CAST(round(value * 100) AS BIGINT) AS vc
                   FROM events
                   WHERE event_type IN ('view', 'purchase')),
        bnd AS (SELECT min(vc) AS mn, max(vc) AS mx FROM e),
        binned AS (SELECT least((vc - mn) * 10 // (mx - mn + 1), 9)
                            AS bin,
                          CAST(event_type = 'view' AS BIGINT) AS isv
                   FROM e, bnd),
        spine AS (SELECT unnest(generate_series(0, 9)) AS bin),
        c2 AS (SELECT CAST(spine.bin AS BIGINT) AS bin,
                      CAST(coalesce(sum(bn.isv), 0) AS BIGINT)
                        AS n_view,
                      CAST(coalesce(sum(1 - bn.isv), 0) AS BIGINT)
                        AS n_purchase
               FROM spine LEFT JOIN binned bn ON bn.bin = spine.bin
               GROUP BY 1),
        t AS (SELECT CAST(sum(n_view) + 10 AS DOUBLE) AS ta,
                     CAST(sum(n_purchase) + 10 AS DOUBLE) AS tb
              FROM c2),
        p AS (SELECT sum(((n_view + 1) / ta - (n_purchase + 1) / tb)
                         * ln(((n_view + 1) / ta)
                              / ((n_purchase + 1) / tb))) AS psi
              FROM c2, t)
        SELECT c2.bin, c2.n_view, c2.n_purchase, p.psi
        FROM c2, p ORDER BY 1"""
    out["events_funnel_latency"] = """
        WITH fv AS (SELECT user_id, min(ts) AS vts FROM events
                    WHERE event_type = 'view' GROUP BY 1),
        fb AS (SELECT e.user_id, min(e.ts) AS bts
               FROM events e JOIN fv ON fv.user_id = e.user_id
               WHERE e.event_type = 'purchase' AND e.ts >= fv.vts
               GROUP BY 1)
        SELECT fv.user_id,
               CAST(epoch_us(fb.bts) - epoch_us(fv.vts) AS BIGINT)
                 AS delta_us
        FROM fv JOIN fb ON fb.user_id = fv.user_id
        ORDER BY 1"""
    out["rel_rfm_segments"] = """
        WITH pc AS (
          SELECT o_custkey AS c,
                 CAST(max(epoch_us(o_orderdate) // 86400000000)
                      AS BIGINT) AS recency,
                 CAST(count(*) AS BIGINT) AS frequency,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS monetary
          FROM orders GROUP BY 1),
        t AS (SELECT c,
                     NTILE(4) OVER (ORDER BY recency, c) AS rt,
                     NTILE(4) OVER (ORDER BY frequency, c) AS ft,
                     NTILE(4) OVER (ORDER BY monetary, c) AS mt
              FROM pc)
        SELECT c AS c_custkey,
               CAST(rt AS BIGINT) AS recency_tile,
               CAST(ft AS BIGINT) AS frequency_tile,
               CAST(mt AS BIGINT) AS monetary_tile,
               CAST(rt * 100 + ft * 10 + mt AS BIGINT) AS segment
        FROM t ORDER BY 1"""
    out["text_surprisal"] = """
        WITH w AS (SELECT doc_id,
                          unnest(string_split(lower(text), ' ')) AS w
                   FROM documents),
        cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c
                FROM w GROUP BY 1),
        t AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM cnt)
        SELECT doc_id,
               CAST(sum(length(bin(total // c.c))) AS BIGINT)
                 AS surprisal_int,
               CAST(count(*) AS BIGINT) AS n_tokens
        FROM w JOIN cnt c USING (w), t
        GROUP BY 1 ORDER BY 1"""
    out["diag_join_estimate"] = _join_estimate_sql()
    out["events_seasonal_decompose"] = """
        WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          CAST(round(value * 100) AS BIGINT) AS vc
                   FROM events WHERE event_type = 'purchase'),
        d AS (SELECT day, CAST(sum(vc) AS BIGINT) AS rev_c
              FROM e GROUP BY 1),
        b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
        spine AS (SELECT unnest(generate_series(lo, hi)) AS day FROM b),
        s AS (SELECT spine.day AS day, coalesce(d.rev_c, 0) AS rev_c
              FROM spine LEFT JOIN d USING (day)),
        w AS (SELECT day, rev_c,
                     CAST(sum(rev_c) OVER (ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                          AS BIGINT) AS t7,
                     row_number() OVER (ORDER BY day) AS rn,
                     count(*) OVER () AS n
              FROM s)
        SELECT CAST(day AS BIGINT) AS day,
               CAST((day + 4) % 7 AS BIGINT) AS dow, rev_c,
               CAST(CASE WHEN rn > 3 AND rn <= n - 3 THEN t7
                         ELSE 0 END AS BIGINT) AS trend7x,
               CAST(CASE WHEN rn > 3 AND rn <= n - 3
                         THEN 7 * rev_c - t7
                         ELSE 0 END AS BIGINT) AS detrend7x,
               CAST(CASE WHEN rn > 3 AND rn <= n - 3 THEN 1
                         ELSE 0 END AS BIGINT) AS valid
        FROM w ORDER BY day"""
    out["text_langid_confusion"] = ("""
        SELECT p.pred_lang, d.lang AS true_lang,
               CAST(count(*) AS BIGINT) AS n
        FROM (""" + _langid_sql() + """) p
        JOIN documents d USING (doc_id)
        GROUP BY 1, 2 ORDER BY 1, 2""")
    out["dedup_containment"] = """
WITH """ + _SHINGLE_CTE + """
SELECT i.doc_a, i.doc_b,
       CAST(i.ni AS DOUBLE) / least(sa.n, sb.n) AS containment
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.ni AS DOUBLE) / least(sa.n, sb.n) >= 0.8
ORDER BY doc_a, doc_b"""
    from .pipelines.relational import APPORTION_TOTAL
    out["rel_apportion_budget"] = f"""
        WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
                          c_custkey FROM customer),
        o AS (SELECT nation, CAST(count(*) AS BIGINT) AS n
              FROM orders JOIN c ON c_custkey = o_custkey GROUP BY 1),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM o),
        q AS (SELECT nation, n, n * {APPORTION_TOTAL} // total AS fq,
                     n * {APPORTION_TOTAL} % total AS rem FROM o, t),
        l AS (SELECT {APPORTION_TOTAL} - sum(fq) AS leftover FROM q),
        r AS (SELECT nation, n, fq, row_number() OVER (
                ORDER BY rem DESC, nation) AS rn FROM q)
        SELECT nation, n AS n_orders,
               CAST(fq + CASE WHEN rn <= (SELECT leftover FROM l)
                              THEN 1 ELSE 0 END AS BIGINT) AS share
        FROM r ORDER BY nation"""
    out["rel_mom_revenue"] = """
        WITH m AS (
          SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate)
                      AS BIGINT) AS ym,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100)
                                        AS BIGINT))) AS BIGINT) AS rev_c2
          FROM lineitem GROUP BY 1),
        w AS (SELECT ym, rev_c2,
                     coalesce(LAG(rev_c2) OVER (ORDER BY ym), 0)
                       AS prev_c2
              FROM m)
        SELECT ym, rev_c2, prev_c2,
               CAST(CASE WHEN prev_c2 > 0 THEN rev_c2 - prev_c2
                         ELSE 0 END AS BIGINT) AS delta_c2,
               CASE WHEN prev_c2 > 0
                    THEN 100.0 * (rev_c2 - prev_c2) / prev_c2
                    ELSE 0.0 END AS pct
        FROM w ORDER BY ym"""
    from .stages.search import POSTINGS_TOP
    out["search_postings"] = f"""
        WITH w AS (SELECT DISTINCT doc_id,
                          unnest(string_split(lower(text), ' ')) AS term
                   FROM documents),
        df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
               FROM w GROUP BY 1),
        top AS (SELECT term, df FROM df
                ORDER BY df DESC, term LIMIT {POSTINGS_TOP})
        SELECT t.term, t.df,
               string_agg(CAST(w.doc_id AS VARCHAR), ','
                          ORDER BY w.doc_id) AS postings_csv
        FROM top t JOIN w ON w.term = t.term
        GROUP BY 1, 2 ORDER BY 1"""
    out["curation_benford"] = _benford_sql()
    out["rel_corr_matrix"] = _corr_matrix_sql()
    out["text_readability"] = """
        WITH d AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
                 CAST(len(regexp_extract_all(text, '[.!?]'))
                      AS BIGINT) AS s,
                 CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                      AS BIGINT) AS y
          FROM documents)
        SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_syllables,
               CAST((206835 * GREATEST(s, 1) * GREATEST(w, 1)
                     - 1015 * GREATEST(w, 1) * GREATEST(w, 1)
                     - 84600 * y * GREATEST(s, 1))
                    // (GREATEST(s, 1) * GREATEST(w, 1)) AS BIGINT)
                 AS flesch_fp
        FROM d ORDER BY doc_id"""
    out["rel_grouping_sets"] = _grouping_sets_sql()
    out["emb_covariance"] = """
        WITH e AS (
          SELECT vec_id, i,
                 CAST(floor(CAST(list_extract(embedding, i) AS DOUBLE)
                            * 1048576.0) AS BIGINT) AS x
          FROM embeddings, generate_series(1, 64) AS t(i)),
        m AS (SELECT a.i AS i, b.i AS j,
                     sum(CAST(a.x AS HUGEINT) * CAST(b.x AS HUGEINT))
                       AS sxy
              FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
              GROUP BY 1, 2),
        s AS (SELECT i, CAST(sum(x) AS HUGEINT) AS sx FROM e GROUP BY 1),
        n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings)
        SELECT CAST(m.i - 1 AS BIGINT) AS i, CAST(m.j - 1 AS BIGINT) AS j,
               CAST(n.n * m.sxy - sa.sx * sb.sx AS BIGINT) AS cov_n2
        FROM m, n
        JOIN s sa ON sa.i = m.i JOIN s sb ON sb.i = m.j
        ORDER BY 1, 2"""
    from .stages.textstats import HASH_FEATURE_DIM
    out["text_hash_features"] = f"""
        WITH w AS (SELECT doc_id,
                          unnest(string_split(lower(text), ' ')) AS w
                   FROM documents),
        b AS (SELECT doc_id,
                     ('0x' || substring(md5(w), 1, 8))::BIGINT
                       % {HASH_FEATURE_DIM} AS bucket
              FROM w)
        SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM b GROUP BY 1, 2 ORDER BY 1, 2"""
    # strip only the TRAILING ORDER BY — the window clauses inside the
    # decompose SQL also say "ORDER BY day" and must survive
    _seasonal_body = "".join(
        out["events_seasonal_decompose"].rsplit("ORDER BY day", 1))
    out["events_seasonal_anomaly"] = ("""
        WITH base AS (""" + _seasonal_body + """),
        v AS (SELECT day, detrend7x FROM base WHERE valid = 1),
        st AS (SELECT CAST(quantile_disc(detrend7x, 0.5) AS BIGINT)
                        AS med
               FROM v),
        md AS (SELECT CAST(quantile_disc(abs(detrend7x - med), 0.5)
                           AS BIGINT) AS mad
               FROM v, st)
        SELECT v.day, v.detrend7x, st.med, md.mad,
               CAST(abs(v.detrend7x - st.med) > 3 * md.mad AS BIGINT)
                 AS is_anomaly
        FROM v, st, md ORDER BY v.day""")
    out["kg_type_rollup_counts"] = (
        "SELECT type_iri, count(*) AS n_entities FROM ("
        + out["kg_inferred_types"] + ") GROUP BY 1 ORDER BY 1")
    out["rel_division"] = """
        WITH cy AS (SELECT DISTINCT o_custkey,
                           CAST(year(o_orderdate) AS BIGINT) AS y
                    FROM orders),
        d AS (SELECT count(DISTINCT y) AS ny FROM cy)
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_years
        FROM cy, d GROUP BY o_custkey, d.ny
        HAVING count(*) = d.ny ORDER BY o_custkey"""
    out["events_cusum_changepoint"] = """
        WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          count(*) AS n FROM events GROUP BY 1),
        t AS (SELECT count(*) AS nd, sum(n) AS tot FROM d),
        c AS (SELECT day, n,
                     sum(t.nd * d.n - t.tot) OVER (ORDER BY day) AS s
              FROM d, t)
        SELECT CAST(day AS BIGINT) AS day, CAST(n AS BIGINT) AS n_events,
               CAST(s AS BIGINT) AS cusum,
               CAST(abs(s) = (SELECT max(abs(s)) FROM c) AS BIGINT)
                 AS is_peak
        FROM c ORDER BY day"""
    out["privacy_l_diversity_events"] = f"""
        WITH cell AS (SELECT event_type,
                             CAST(isodow(ts) AS BIGINT) AS dow,
                             CAST(hour(ts) AS BIGINT) AS hod,
                             user_id % 8 AS sens, count(*) AS n
                      FROM events GROUP BY 1, 2, 3, 4)
        SELECT event_type, dow, hod,
               CAST(sum(n) AS BIGINT) AS n_members,
               CAST(count(*) AS BIGINT) AS n_sensitive,
               CAST(count(*) >= {L_DIVERSITY} AS BIGINT) AS is_diverse
        FROM cell GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""
    out["ml_decision_stump"] = """
        WITH c AS (SELECT CAST(l_quantity AS BIGINT) AS q,
                          CAST(l_returnflag = 'R' AS BIGINT) AS pos,
                          count(*) AS n
                   FROM lineitem GROUP BY 1, 2),
        qq AS (SELECT q, sum(n) AS nq, sum(n * pos) AS pq
               FROM c GROUP BY 1),
        t AS (SELECT sum(nq) AS tot, sum(pq) AS totpos FROM qq),
        cum AS (SELECT q, sum(nq) OVER (ORDER BY q) AS nl,
                       sum(pq) OVER (ORDER BY q) AS pl
                FROM qq),
        sc AS (SELECT q, nl, pl, t.tot - nl AS nr, t.totpos - pl AS pr,
                      least(pl, nl - pl) + least(t.totpos - pl,
                        (t.tot - nl) - (t.totpos - pl)) AS mis
               FROM cum, t)
        SELECT CAST(q AS BIGINT) AS threshold,
               CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
               CAST(nr AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right,
               CAST(mis AS BIGINT) AS miscls,
               CAST(mis = (SELECT min(mis) FROM sc)
                    AND q = (SELECT min(q) FROM sc
                             WHERE mis = (SELECT min(mis) FROM sc))
                    AS BIGINT) AS is_best
        FROM sc ORDER BY threshold"""
    out["dedup_sorted_neighborhood"] = """
        WITH k AS (SELECT doc_id,
                          substr(replace(lower(text), ' ', ''), 1, 12)
                            AS key
                   FROM documents),
        r AS (SELECT doc_id, key,
                     row_number() OVER (ORDER BY key, doc_id) AS rn
              FROM k)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(b.rn - a.rn AS BIGINT) AS dist,
               CAST(substr(a.key, 1, 8) = substr(b.key, 1, 8) AS BIGINT)
                 AS same_key8
        FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 2
        ORDER BY doc_a, doc_b"""
    out["rec_item_cooccur"] = """
        WITH ob AS (SELECT DISTINCT l.l_orderkey,
                           CAST(substr(p.p_brand, 7) AS BIGINT) AS b
                    FROM lineitem l
                    JOIN part p ON p.p_partkey = l.l_partkey)
        SELECT a.b AS brand_a, c.b AS brand_b,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM ob a JOIN ob c
          ON a.l_orderkey = c.l_orderkey AND a.b < c.b
        GROUP BY 1, 2
        ORDER BY n_orders DESC, brand_a, brand_b LIMIT 20"""
    out["ml_knn_classify"] = f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                   FROM embeddings WHERE vec_id < 8),
        c AS (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id NOT IN (SELECT query_id FROM q)),
        s AS (SELECT q.query_id, c.vec_id,
                     round(list_cosine_similarity(
                       CAST(q.qe AS DOUBLE[]),
                       CAST(c.embedding AS DOUBLE[])), 6) AS cosine
              FROM q CROSS JOIN c),
        r AS (SELECT *, row_number() OVER
                (PARTITION BY query_id ORDER BY cosine DESC, vec_id)
                AS rank FROM s),
        nb AS (SELECT query_id, vec_id FROM r WHERE rank <= {KNN_K}),
        v AS (SELECT nb.query_id, CAST(e.label AS BIGINT) AS label,
                     count(*) AS votes
              FROM nb JOIN embeddings e ON e.vec_id = nb.vec_id
              GROUP BY 1, 2)
        SELECT query_id, label AS pred_label,
               CAST(votes AS BIGINT) AS votes
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY votes DESC, label) AS rn FROM v)
        WHERE rn = 1 ORDER BY query_id"""
    out["search_phrase"] = f"""
        WITH sp AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM documents),
        pos AS (SELECT doc_id, CAST(i AS BIGINT) AS i, w[i] AS tok
                FROM sp, unnest(generate_series(1, len(w))) AS t(i)),
        m AS (SELECT a.doc_id, a.i
              FROM pos a JOIN pos b
                ON b.doc_id = a.doc_id AND b.i = a.i + 1
              WHERE a.tok = '{PHRASE_W1}' AND b.tok = '{PHRASE_W2}')
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
               CAST(min(i) AS BIGINT) AS first_pos
        FROM m GROUP BY 1 ORDER BY 1"""
    out["rel_gaps_islands"] = """
        WITH o AS (SELECT DISTINCT o_orderkey AS k FROM orders
                   WHERE o_orderstatus = 'F'),
        i AS (SELECT k, k - row_number() OVER (ORDER BY k) AS isl FROM o)
        SELECT min(k) AS island_start, max(k) AS island_end,
               CAST(count(*) AS BIGINT) AS island_len
        FROM i GROUP BY isl ORDER BY island_start"""
    out["events_autocorr"] = """
        WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          count(*) AS c
                   FROM events GROUP BY 1),
        sp AS (SELECT t.day, coalesce(d.c, 0) AS c
               FROM (SELECT unnest(generate_series(
                       (SELECT min(day) FROM d),
                       (SELECT max(day) FROM d))) AS day) t
               LEFT JOIN d ON d.day = t.day),
        s AS (SELECT count(*) AS n, sum(c) AS tot FROM sp),
        z AS (SELECT day, (SELECT n FROM s) * c - (SELECT tot FROM s)
                     AS z FROM sp),
        dn AS (SELECT sum(z * z) AS den FROM z)
        SELECT ks.k AS lag,
               CAST(coalesce(sum(a.z * b.z), 0) AS BIGINT) AS num,
               (SELECT CAST(den AS BIGINT) FROM dn) AS den
        FROM (SELECT unnest(generate_series(1, 7)) AS k) ks
        CROSS JOIN z a JOIN z b ON b.day = a.day + ks.k
        GROUP BY ks.k ORDER BY lag"""
    out["events_survival_table"] = """
        WITH u AS (SELECT user_id,
                          min(epoch_us(ts) // 86400000000) AS f,
                          max(epoch_us(ts) // 86400000000) AS l
                   FROM events GROUP BY 1),
        g AS (SELECT max(l) AS gmax FROM u),
        d AS (SELECT l - f AS duration,
                     CASE WHEN l >= (SELECT gmax FROM g) - 2
                          THEN 1 ELSE 0 END AS cens
              FROM u),
        h AS (SELECT duration, sum(1 - cens) AS nd, sum(cens) AS nc
              FROM d GROUP BY 1)
        SELECT duration,
               CAST(sum(nd + nc) OVER (ORDER BY duration DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n_risk,
               CAST(nd AS BIGINT) AS n_death,
               CAST(nc AS BIGINT) AS n_censored
        FROM h ORDER BY duration"""
    out["rec_assoc_rules"] = """
        WITH ob AS (SELECT DISTINCT l.l_orderkey,
                           CAST(substr(p.p_brand, 7) AS BIGINT) AS b
                    FROM lineitem l
                    JOIN part p ON p.p_partkey = l.l_partkey),
        no AS (SELECT count(DISTINCT l_orderkey) AS n FROM ob),
        sup AS (SELECT b, count(*) AS n_b FROM ob GROUP BY 1),
        pr AS (SELECT a.b AS antecedent, c.b AS consequent,
                      count(*) AS n_both
               FROM ob a JOIN ob c
                 ON a.l_orderkey = c.l_orderkey AND a.b <> c.b
               GROUP BY 1, 2)
        SELECT pr.antecedent, pr.consequent,
               CAST(pr.n_both AS BIGINT) AS n_both,
               CAST(sa.n_b AS BIGINT) AS n_ant,
               CAST(sc.n_b AS BIGINT) AS n_cons,
               (SELECT CAST(n AS BIGINT) FROM no) AS n_orders
        FROM pr
        JOIN sup sa ON sa.b = pr.antecedent
        JOIN sup sc ON sc.b = pr.consequent
        WHERE pr.n_both * 100 >= (SELECT n FROM no)
        ORDER BY antecedent, consequent"""
    out["privacy_t_closeness"] = """
        WITH cell AS (SELECT event_type,
                             CAST(isodow(ts) AS BIGINT) AS dow,
                             CAST(hour(ts) AS BIGINT) AS hod,
                             user_id % 8 AS sens, count(*) AS n
                      FROM events GROUP BY 1, 2, 3, 4),
        g AS (SELECT event_type, dow, hod, sum(n) AS ng
              FROM cell GROUP BY 1, 2, 3),
        sg AS (SELECT sens, sum(n) AS ns FROM cell GROUP BY 1),
        tot AS (SELECT sum(n) AS nn FROM cell),
        sp AS (SELECT g.event_type, g.dow, g.hod, g.ng, s.sens, s.ns,
                      coalesce(c.n, 0) AS ngs
               FROM g CROSS JOIN sg s
               LEFT JOIN cell c
                 ON c.event_type = g.event_type AND c.dow = g.dow
                AND c.hod = g.hod AND c.sens = s.sens)
        SELECT event_type, dow, hod,
               CAST(ng AS BIGINT) AS n_members,
               CAST(sum(abs(ngs * (SELECT nn FROM tot) - ns * ng))
                    AS BIGINT) AS tvd_num,
               CAST(2 * ng * (SELECT nn FROM tot) AS BIGINT) AS tvd_den
        FROM sp GROUP BY event_type, dow, hod, ng
        ORDER BY 1, 2, 3"""
    out["ml_ols_two_features"] = """
        WITH r AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS x1,
                          CAST(round(l_discount * 100) AS BIGINT) AS x2,
                          CAST(floor(l_extendedprice) AS BIGINT) AS y
                   FROM lineitem),
        m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(x1) AS HUGEINT) AS s1,
                     CAST(sum(x2) AS HUGEINT) AS s2,
                     CAST(sum(y) AS HUGEINT) AS sy,
                     CAST(sum(x1 * x1) AS HUGEINT) AS s11,
                     CAST(sum(x1 * x2) AS HUGEINT) AS s12,
                     CAST(sum(x2 * x2) AS HUGEINT) AS s22,
                     CAST(sum(x1 * y) AS HUGEINT) AS s1y,
                     CAST(sum(x2 * y) AS HUGEINT) AS s2y
              FROM r),
        d AS (SELECT
          n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s12 - s11 * s2) AS den,
          sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
            + s2 * (s1y * s12 - s11 * s2y) AS b0,
          n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2) AS b1,
          n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
            + sy * (s1 * s12 - s11 * s2) AS b2
          FROM m)
        SELECT 'intercept' AS coef, CAST(b0 AS VARCHAR) AS num,
               CAST(den AS VARCHAR) AS den FROM d
        UNION ALL
        SELECT 'x1_quantity', CAST(b1 AS VARCHAR), CAST(den AS VARCHAR)
        FROM d
        UNION ALL
        SELECT 'x2_discount_pct', CAST(b2 AS VARCHAR),
               CAST(den AS VARCHAR) FROM d
        ORDER BY coef"""
    out["search_boolean"] = f"""
        WITH sp AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM documents)
        SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens
        FROM sp
        WHERE list_contains(w, '{BOOL_AND1}')
          AND list_contains(w, '{BOOL_AND2}')
          AND NOT list_contains(w, '{BOOL_NOT}')
        ORDER BY doc_id"""
    out["events_rolling_median"] = """
        WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          count(*) AS c
                   FROM events GROUP BY 1),
        sp AS (SELECT t.day, coalesce(d.c, 0) AS c
               FROM (SELECT unnest(generate_series(
                       (SELECT min(day) FROM d),
                       (SELECT max(day) FROM d))) AS day) t
               LEFT JOIN d ON d.day = t.day)
        SELECT day, CAST(c AS BIGINT) AS c,
               CAST(quantile_disc(c, 0.5) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS med7
        FROM sp ORDER BY day"""
    out["emb_int8_quantize"] = """
        WITH e AS (SELECT vec_id, CAST(g.i AS BIGINT) AS dim,
                          CAST(floor(CAST(embedding[g.i] AS DOUBLE)
                                     * 1000000) AS BIGINT) AS ec
                   FROM embeddings, generate_series(1, 64) AS g(i)),
        mm AS (SELECT dim, min(ec) AS mn, max(ec) AS mx
               FROM e GROUP BY 1)
        SELECT e.vec_id, e.dim,
               CAST(CASE WHEN mm.mx = mm.mn THEN 0
                    ELSE ((e.ec - mm.mn) * 255) // (mm.mx - mm.mn)
                    END AS BIGINT) AS q
        FROM e JOIN mm USING (dim) ORDER BY vec_id, dim"""
    out["ann_lsh_buckets"] = _lsh_bucket_sql()
    out["multimodal_hash_dedup"] = """
        SELECT md5(text) AS payload_hash,
               CAST(count(*) AS BIGINT) AS n_dups,
               CAST(min(doc_id) AS BIGINT) AS keep_media_id
        FROM documents GROUP BY 1 ORDER BY 1"""
    out["kg_katz_paths"] = f"""
        WITH ts AS (
          SELECT conv_id, turn_idx, {normalize_sql('tool')} AS tool
          FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
          WHERE {TOOL_OK_SQL}),
        seq AS (SELECT conv_id, tool,
                       LEAD(tool) OVER (PARTITION BY conv_id
                                        ORDER BY turn_idx) AS nxt
                FROM ts),
        edges AS (SELECT DISTINCT tool AS src, nxt AS dst
                  FROM seq WHERE nxt IS NOT NULL AND nxt <> tool),
        p1 AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS p
               FROM edges GROUP BY 1),
        p2 AS (SELECT e.dst AS node, CAST(sum(p1.p) AS BIGINT) AS p
               FROM edges e JOIN p1 ON p1.node = e.src GROUP BY 1),
        p3 AS (SELECT e.dst AS node, CAST(sum(p2.p) AS BIGINT) AS p
               FROM edges e JOIN p2 ON p2.node = e.src GROUP BY 1),
        nodes AS (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges)
        SELECT n.node,
               CAST(coalesce(p1.p, 0) AS BIGINT) AS p1,
               CAST(coalesce(p2.p, 0) AS BIGINT) AS p2,
               CAST(coalesce(p3.p, 0) AS BIGINT) AS p3,
               CAST(64 * coalesce(p1.p, 0) + 8 * coalesce(p2.p, 0)
                    + coalesce(p3.p, 0) AS BIGINT) AS katz_fp
        FROM nodes n LEFT JOIN p1 ON p1.node = n.node
        LEFT JOIN p2 ON p2.node = n.node
        LEFT JOIN p3 ON p3.node = n.node
        ORDER BY 1"""
    out["events_interarrival_hist"] = """
        WITH g AS (SELECT (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id))
                     // 1000000 AS gap_s
                   FROM events)
        SELECT CAST(length(bin(gap_s + 1)) - 1 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM g WHERE gap_s IS NOT NULL
        GROUP BY 1 ORDER BY 1"""
    out["events_ewma_daily"] = """
        WITH RECURSIVE d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                                    count(*) AS c
                             FROM events GROUP BY 1),
        sp AS (SELECT t.day, coalesce(d.c, 0) AS c
               FROM (SELECT unnest(generate_series(
                       (SELECT min(day) FROM d),
                       (SELECT max(day) FROM d))) AS day) t
               LEFT JOIN d ON d.day = t.day),
        idx AS (SELECT day, c,
                       row_number() OVER (ORDER BY day) AS rn FROM sp),
        r(rn, day, c, ewma) AS (
          SELECT rn, day, c, CAST(c AS DOUBLE) FROM idx WHERE rn = 1
          UNION ALL
          SELECT i.rn, i.day, i.c, (r.ewma + i.c) / 2.0
          FROM r JOIN idx i ON i.rn = r.rn + 1)
        SELECT day, CAST(c AS BIGINT) AS c, ewma FROM r ORDER BY day"""
    out["ml_prf_metrics"] = ("""
        WITH conf AS (
          SELECT p.pred_lang, d.lang AS true_lang, count(*) AS n
          FROM (""" + _langid_sql() + """) p
          JOIN documents d USING (doc_id) GROUP BY 1, 2),
        cls AS (SELECT pred_lang AS lang FROM conf
                UNION SELECT true_lang FROM conf),
        tp AS (SELECT pred_lang AS lang, n FROM conf
               WHERE pred_lang = true_lang),
        pp AS (SELECT pred_lang AS lang, sum(n) AS np
               FROM conf GROUP BY 1),
        ll AS (SELECT true_lang AS lang, sum(n) AS nl
               FROM conf GROUP BY 1)
        SELECT c.lang,
               CAST(coalesce(tp.n, 0) AS BIGINT) AS n_tp,
               CAST(coalesce(pp.np, 0) - coalesce(tp.n, 0) AS BIGINT)
                 AS n_fp,
               CAST(coalesce(ll.nl, 0) - coalesce(tp.n, 0) AS BIGINT)
                 AS n_fn,
               CAST(coalesce(ll.nl, 0) AS BIGINT) AS support
        FROM cls c LEFT JOIN tp USING (lang)
        LEFT JOIN pp USING (lang) LEFT JOIN ll USING (lang)
        ORDER BY lang""")
    out["rec_item_cosine"] = """
        WITH ob AS (SELECT DISTINCT l.l_orderkey,
                           CAST(substr(p.p_brand, 7) AS BIGINT) AS b
                    FROM lineitem l
                    JOIN part p ON p.p_partkey = l.l_partkey),
        oc AS (SELECT o.o_custkey AS cust, ob.b
               FROM ob JOIN orders o ON o.o_orderkey = ob.l_orderkey),
        v AS (SELECT cust, b, count(*) AS v FROM oc GROUP BY 1, 2),
        d AS (SELECT a.b AS brand_a, c.b AS brand_b,
                     sum(a.v * c.v) AS dot
              FROM v a JOIN v c ON a.cust = c.cust AND a.b < c.b
              GROUP BY 1, 2),
        n2 AS (SELECT b, sum(v * v) AS s2 FROM v GROUP BY 1)
        SELECT d.brand_a, d.brand_b, CAST(d.dot AS BIGINT) AS dot,
               CAST(na.s2 AS BIGINT) AS na2,
               CAST(nb.s2 AS BIGINT) AS nb2
        FROM d JOIN n2 na ON na.b = d.brand_a
        JOIN n2 nb ON nb.b = d.brand_b
        ORDER BY brand_a, brand_b"""
    out["ml_naive_bayes_model"] = """
        WITH tk AS (SELECT d.lang, t.tok AS token
                    FROM documents d,
                         unnest(string_split(lower(d.text), ' '))
                           AS t(tok)),
        tc AS (SELECT lang, token, count(*) AS n_tok
               FROM tk GROUP BY 1, 2),
        nd AS (SELECT lang, count(*) AS n_docs FROM documents
               GROUP BY 1)
        SELECT tc.lang, tc.token, CAST(tc.n_tok AS BIGINT) AS n_tok,
               CAST(nd.n_docs AS BIGINT) AS n_docs_lang
        FROM tc JOIN nd USING (lang)
        ORDER BY lang, token"""
    out["ann_range_search"] = f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                   FROM embeddings WHERE vec_id < {ANN_RANGE_NQ}),
        c AS (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id NOT IN (SELECT query_id FROM q))
        SELECT q.query_id, c.vec_id,
               round(list_cosine_similarity(
                 CAST(q.qe AS DOUBLE[]),
                 CAST(c.embedding AS DOUBLE[])), 6) AS cosine
        FROM q CROSS JOIN c
        WHERE round(list_cosine_similarity(
                CAST(q.qe AS DOUBLE[]),
                CAST(c.embedding AS DOUBLE[])), 6) >= {ANN_RANGE_TAU}
        ORDER BY query_id, vec_id"""
    out["rel_gini_revenue"] = """
        WITH r AS (SELECT CAST(substr(p.p_brand, 7) AS BIGINT) AS b,
                          sum(CAST(round(l.l_extendedprice * 100)
                                   AS BIGINT)
                              * (100 - CAST(round(l.l_discount * 100)
                                            AS BIGINT))) AS rev
                   FROM lineitem l
                   JOIN part p ON p.p_partkey = l.l_partkey
                   GROUP BY 1),
        o AS (SELECT rev, row_number() OVER (ORDER BY rev, b) AS i,
                     count(*) OVER () AS n
              FROM r)
        SELECT CAST(max(n) AS BIGINT) AS n_brands,
               CAST(sum((2 * i - n - 1) * rev) AS BIGINT) AS gini_num,
               CAST(max(n) * sum(rev) AS BIGINT) AS gini_den
        FROM o"""
    out["sample_weighted"] = f"""
        WITH base AS (SELECT doc_id, n_chars,
                             CAST(doc_id AS UBIGINT) AS kx,
                             least(n_chars, {SAMPLE_W_CAP}) AS w
                      FROM documents),
        {_splitmix_cte('base', 'kx', 'doc_id, n_chars, w')},
        h AS (SELECT doc_id, n_chars, w, xor(z, z >> 31) AS hh
              FROM z2)
        SELECT doc_id, n_chars, CAST(w AS BIGINT) AS w
        FROM h WHERE CAST(hh % {SAMPLE_W_CAP} AS BIGINT) < w
        ORDER BY doc_id"""
    out["rel_herfindahl"] = """
        WITH r AS (SELECT l_suppkey AS s,
                          sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                              * (100 - CAST(round(l_discount * 100)
                                            AS BIGINT))) AS rev
                   FROM lineitem GROUP BY 1),
        d AS (SELECT CAST(rev AS BIGINT) // 1000000 AS rd FROM r)
        SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(sum(rd * rd) AS BIGINT) AS hhi_num,
               CAST(sum(rd) * sum(rd) AS BIGINT) AS hhi_den
        FROM d"""
    out["kg_reciprocity"] = f"""
        WITH ts AS (
          SELECT conv_id, turn_idx, {normalize_sql('tool')} AS tool
          FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
          WHERE {TOOL_OK_SQL}),
        seq AS (SELECT conv_id, tool,
                       LEAD(tool) OVER (PARTITION BY conv_id
                                        ORDER BY turn_idx) AS nxt
                FROM ts),
        edges AS (SELECT DISTINCT tool AS src, nxt AS dst
                  FROM seq WHERE nxt IS NOT NULL AND nxt <> tool)
        SELECT CAST(count(*) AS BIGINT) AS n_edges,
               CAST(sum(CASE WHEN EXISTS (
                     SELECT 1 FROM edges e2
                     WHERE e2.src = e1.dst AND e2.dst = e1.src)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_recip
        FROM edges e1"""
    out["text_heaps_law"] = """
        WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' '))
                          AS w
                   FROM documents),
        fw AS (SELECT w, min(doc_id) AS fd FROM w GROUP BY 1),
        tt AS (SELECT doc_id, count(*) AS nt FROM w GROUP BY 1),
        m AS (SELECT max(doc_id) AS mx FROM documents),
        ks AS (SELECT unnest(range(1, 11)) AS k)
        SELECT CAST(k AS BIGINT) AS k,
               CAST((k * m.mx) // 10 AS BIGINT) AS doc_threshold,
               CAST((SELECT coalesce(sum(nt), 0) FROM tt
                     WHERE tt.doc_id <= (k * m.mx) // 10) AS BIGINT)
                 AS cum_tokens,
               CAST((SELECT count(*) FROM fw
                     WHERE fw.fd <= (k * m.mx) // 10) AS BIGINT)
                 AS cum_vocab
        FROM ks, m ORDER BY k"""
    out["rel_spearman"] = """
        WITH b AS (SELECT o_orderkey AS key,
                          epoch_us(o_orderdate) // 86400000000 AS q,
                          CAST(round(o_totalprice * 100) AS BIGINT)
                            AS p
                   FROM orders),
        rq AS (SELECT key, row_number() OVER (ORDER BY q, key) - 1 AS r
               FROM b),
        rp AS (SELECT key, row_number() OVER (ORDER BY p, key) - 1 AS r
               FROM b)
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum((rq.r - rp.r) * (rq.r - rp.r)) AS BIGINT)
                 AS sum_d2
        FROM rq JOIN rp ON rq.key = rp.key"""
    out["search_proximity"] = f"""
        WITH sp AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM documents),
        pos AS (SELECT doc_id, CAST(i AS BIGINT) AS i, w[i] AS tok
                FROM sp, unnest(generate_series(1, len(w))) AS t(i)),
        g AS (SELECT a.doc_id, min(abs(a.i - b.i)) AS min_gap
              FROM pos a JOIN pos b ON b.doc_id = a.doc_id
              WHERE a.tok = '{PROX_W1}' AND b.tok = '{PROX_W2}'
              GROUP BY 1)
        SELECT doc_id, CAST(min_gap AS BIGINT) AS min_gap
        FROM g WHERE min_gap <= {PROX_K} ORDER BY doc_id"""
    out["ml_calibration_bins"] = """
        WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS p,
                          CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                            AS pos
                   FROM orders),
        mm AS (SELECT min(p) AS mn, max(p) - min(p) + 1 AS width FROM c)
        SELECT CAST((p - mn) * 10 // width AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pos) AS BIGINT) AS n_pos
        FROM c, mm GROUP BY 1 ORDER BY 1"""
    out["privacy_dp_noisy_counts"] = f"""
        WITH cnt AS (SELECT event_type, count(*) AS n
                     FROM events GROUP BY 1),
        base AS (SELECT event_type, n,
                        xor(CAST(n AS UBIGINT),
                            CAST({DP_SALT} AS UBIGINT)) AS kx
                 FROM cnt),
        {_splitmix_cte('base', 'kx', 'event_type, n')},
        h AS (SELECT event_type, n, xor(z, z >> 31) AS hh FROM z2)
        SELECT event_type,
               greatest(CAST(n AS BIGINT)
                        + CAST(hh % 21 AS BIGINT) - 10, 0) AS n_noisy
        FROM h ORDER BY event_type"""
    out["text_regex_extract"] = f"""
        SELECT doc_id,
               regexp_extract(lower(text), '{REGEX_PATTERN}', 0) AS match
        FROM documents
        WHERE regexp_matches(lower(text), '{REGEX_PATTERN}')
        ORDER BY doc_id"""
    out["rel_lorenz_deciles"] = """
        WITH s AS (SELECT o_custkey AS ck,
                          CAST(sum(CAST(round(o_totalprice * 100)
                                        AS BIGINT)) AS BIGINT) AS spend
                   FROM orders GROUP BY 1),
        t AS (SELECT ck, spend,
                     NTILE(10) OVER (ORDER BY spend, ck) AS dec
              FROM s)
        SELECT CAST(dec AS BIGINT) AS decile,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(spend) AS BIGINT) AS decile_rev_c,
               CAST(sum(sum(spend)) OVER (ORDER BY dec
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev_c
        FROM t GROUP BY dec ORDER BY decile"""
    out["events_holt_smoothing"] = f"""
        WITH RECURSIVE d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                                    count(*) AS c
                             FROM events GROUP BY 1),
        sp AS (SELECT t.day, coalesce(d.c, 0) AS c
               FROM (SELECT unnest(generate_series(
                       (SELECT min(day) FROM d),
                       (SELECT max(day) FROM d))) AS day) t
               LEFT JOIN d ON d.day = t.day),
        idx AS (SELECT day, CAST(c AS BIGINT) AS c,
                       row_number() OVER (ORDER BY day) AS rn FROM sp),
        r(rn, day, c, lvl, trd) AS (
          SELECT rn, day, c, c * {HOLT_S}, CAST(0 AS BIGINT)
          FROM idx WHERE rn = 1
          UNION ALL
          SELECT i.rn, i.day, i.c,
                 (r.lvl + r.trd + i.c * {HOLT_S}) // 2,
                 (r.trd + ((r.lvl + r.trd + i.c * {HOLT_S}) // 2
                           - r.lvl)) // 2
          FROM r JOIN idx i ON i.rn = r.rn + 1)
        SELECT day, c, CAST(lvl AS BIGINT) AS level_fp,
               CAST(trd AS BIGINT) AS trend_fp
        FROM r ORDER BY day"""
    out["kg_transitivity"] = P + """
        , ce AS (SELECT DISTINCT a.canonical AS u, b.canonical AS v
                 FROM mention a JOIN mention b
                   ON a.turn_iri = b.turn_iri
                  AND a.canonical < b.canonical),
        und AS (SELECT u AS n FROM ce UNION ALL SELECT v FROM ce),
        deg AS (SELECT n, count(*) AS d FROM und GROUP BY 1),
        tri AS (SELECT count(*) AS t
                FROM ce e1 JOIN ce e2 ON e2.u = e1.v
                JOIN ce e3 ON e3.u = e1.u AND e3.v = e2.v)
        SELECT CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles,
               CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges
        FROM deg"""
    out["events_cohort_revenue"] = """
        WITH w AS (SELECT user_id,
                          epoch_us(ts) // 604800000000 AS wk,
                          CAST(round(value * 100) AS BIGINT) AS v
                   FROM events),
        f AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY 1)
        SELECT f.cohort, w.wk - f.cohort AS age,
               CAST(sum(w.v) AS BIGINT) AS rev_c
        FROM w JOIN f USING(user_id)
        GROUP BY 1, 2 ORDER BY 1, 2"""
    out["ml_tree_depth2"] = f"""
        WITH cc AS (SELECT CAST(round(l_quantity) AS BIGINT) AS q,
                           CAST(round(l_discount * 100) AS BIGINT) AS d,
                           CAST(l_returnflag = 'R' AS BIGINT) AS pos,
                           count(*) AS n
                    FROM lineitem GROUP BY 1, 2, 3),
        {_tree_split_ctes('cc', 'root')},
        lsub AS (SELECT cc.* FROM cc, rootpf rp
                 WHERE (CASE WHEN rp.feat = 'q' THEN cc.q ELSE cc.d END)
                       <= rp.thr),
        rsub AS (SELECT cc.* FROM cc, rootpf rp
                 WHERE (CASE WHEN rp.feat = 'q' THEN cc.q ELSE cc.d END)
                       > rp.thr),
        {_tree_split_ctes('lsub', 'l')},
        {_tree_split_ctes('rsub', 'r')}
        SELECT * FROM (
          SELECT 'root' AS node, feat AS feature,
                 CAST(thr AS BIGINT) AS threshold,
                 CAST((SELECT tot FROM roott) AS BIGINT) AS n,
                 CAST((SELECT totp FROM roott) AS BIGINT) AS n_pos,
                 CAST(mis AS BIGINT) AS split_mis
          FROM rootpf
          UNION ALL
          SELECT 'left', feat, CAST(thr AS BIGINT),
                 CAST(coalesce((SELECT tot FROM lt), 0) AS BIGINT),
                 CAST(coalesce((SELECT totp FROM lt), 0) AS BIGINT),
                 CAST(mis AS BIGINT)
          FROM lpf
          UNION ALL
          SELECT 'right', feat, CAST(thr AS BIGINT),
                 CAST(coalesce((SELECT tot FROM rt), 0) AS BIGINT),
                 CAST(coalesce((SELECT totp FROM rt), 0) AS BIGINT),
                 CAST(mis AS BIGINT)
          FROM rpf)
        ORDER BY node"""
    out["events_decay_engagement"] = """
        WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                          CAST(round(value * 100) AS BIGINT) AS v
                   FROM events),
        mx AS (SELECT max(day) AS m FROM d)
        SELECT user_id,
               CAST(sum(v // (CAST(1 AS BIGINT)
                              << least(m - day, 62))) AS BIGINT)
                 AS decay_score_c
        FROM d, mx GROUP BY 1 ORDER BY 1"""
    out["kg_comention_lift"] = P + """
        , mcount AS (SELECT canonical, count(*) AS nx
                     FROM mention GROUP BY 1),
        nt AS (SELECT count(DISTINCT turn_iri) AS nn FROM mention),
        pr AS (SELECT a.canonical AS u, b.canonical AS v,
                      count(*) AS n_xy
               FROM mention a JOIN mention b
                 ON a.turn_iri = b.turn_iri AND a.canonical < b.canonical
               GROUP BY 1, 2)
        SELECT u AS entity_a, v AS entity_b,
               CAST(n_xy AS BIGINT) AS n_xy,
               CAST(1000000 * (SELECT nn FROM nt) * n_xy
                    // (x.nx * y.nx) AS BIGINT) AS lift_fp
        FROM pr JOIN mcount x ON x.canonical = u
        JOIN mcount y ON y.canonical = v
        ORDER BY 1, 2"""
    out["privacy_generalization"] = f"""
        WITH cts AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS p
                     FROM customer),
        mn AS (SELECT min(p) AS m FROM cts),
        h0 AS (SELECT (p - m) >> {GEN_BASE_SHIFT} AS b0, count(*) AS n
               FROM cts, mn GROUP BY 1),
        lv AS (SELECT unnest(range(0, {GEN_MAX_LEVEL + 1})) AS l),
        hl AS (SELECT l, b0 >> l AS b, sum(n) AS n
               FROM h0, lv GROUP BY 1, 2),
        mins AS (SELECT l, min(n) AS mnn FROM hl GROUP BY 1),
        pick AS (SELECT coalesce((SELECT min(l) FROM mins
                                  WHERE mnn >= {GEN_K}),
                                 {GEN_MAX_LEVEL}) AS l)
        SELECT CAST(p.l AS BIGINT) AS level,
               CAST(hl.b AS BIGINT) AS bucket, CAST(hl.n AS BIGINT) AS n
        FROM hl JOIN pick p ON hl.l = p.l ORDER BY bucket"""
    full_body = "\nUNION\n".join([
        _structural_sql(), _mention_sql(), _mention_entity_sql(),
        _link_sql(), _enrich_sql(fdir)])
    out["kg_shacl_validation"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        tk AS (SELECT subj AS k,
                      max(CASE WHEN pred = '{C.PRED_TEXT}'
                          THEN 1 ELSE 0 END) AS f1,
                      max(CASE WHEN pred = '{C.PRED_POSITION}'
                          THEN 1 ELSE 0 END) AS p1,
                      max(CASE WHEN pred = '{C.RDF_TYPE}'
                          THEN 1 ELSE 0 END) AS p23
               FROM tri GROUP BY 1),
        ok AS (SELECT obj AS k,
                      max(CASE WHEN pred = '{C.PRED_IS_PART_OF}'
                          THEN 1 ELSE 0 END) AS f2,
                      max(CASE WHEN pred = '{C.PRED_MENTIONS}'
                          THEN 1 ELSE 0 END) AS f3
               FROM tri
               WHERE pred IN ('{C.PRED_IS_PART_OF}',
                              '{C.PRED_MENTIONS}')
               GROUP BY 1),
        m AS (SELECT coalesce(tk.k, ok.k) AS k,
                     coalesce(f1, 0) AS f1, coalesce(p1, 0) AS p1,
                     coalesce(p23, 0) AS p23, coalesce(f2, 0) AS f2,
                     coalesce(f3, 0) AS f3
              FROM tk FULL JOIN ok ON ok.k = tk.k)
        SELECT * FROM (
          SELECT 'turn_has_position' AS shape,
                 CAST(sum(f1) AS BIGINT) AS n_checked,
                 CAST(sum(f1 * (1 - p1)) AS BIGINT) AS n_violations
          FROM m
          UNION ALL
          SELECT 'ispartof_target_typed', CAST(sum(f2) AS BIGINT),
                 CAST(sum(f2 * (1 - p23)) AS BIGINT) FROM m
          UNION ALL
          SELECT 'mention_object_typed', CAST(sum(f3) AS BIGINT),
                 CAST(sum(f3 * (1 - p23)) AS BIGINT) FROM m)
        ORDER BY shape"""
    out["rel_chi2_independence"] = """
        WITH cells AS (SELECT c.c_mktsegment AS segment,
                              o.o_orderpriority AS priority,
                              count(*) AS n
                       FROM orders o
                       JOIN customer c ON c.c_custkey = o.o_custkey
                       GROUP BY 1, 2),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
        mx AS (SELECT segment, CAST(sum(n) AS BIGINT) AS nx
               FROM cells GROUP BY 1),
        my AS (SELECT priority, CAST(sum(n) AS BIGINT) AS ny
               FROM cells GROUP BY 1)
        SELECT cells.segment, cells.priority,
               CAST(cells.n AS BIGINT) AS n,
               CAST(CAST(1000000 AS HUGEINT)
                    * CAST(t.nn * cells.n - mx.nx * my.ny AS HUGEINT)
                    * CAST(t.nn * cells.n - mx.nx * my.ny AS HUGEINT)
                    // CAST(t.nn * mx.nx * my.ny AS HUGEINT)
                    AS BIGINT) AS chi2_fp
        FROM cells, t
        JOIN mx ON mx.segment = cells.segment
        JOIN my ON my.priority = cells.priority
        ORDER BY 1, 2"""
    out["kg_two_hop_reach"] = f"""
        WITH ts AS (
          SELECT conv_id, turn_idx, {normalize_sql('tool')} AS tool
          FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
          WHERE {TOOL_OK_SQL}),
        seq AS (SELECT conv_id, tool,
                       LEAD(tool) OVER (PARTITION BY conv_id
                                        ORDER BY turn_idx) AS nxt
                FROM ts),
        edges AS (SELECT DISTINCT tool AS src, nxt AS dst
                  FROM seq WHERE nxt IS NOT NULL AND nxt <> tool),
        two AS (SELECT e1.src, e2.dst
                FROM edges e1 JOIN edges e2 ON e2.src = e1.dst),
        reach AS (SELECT src, dst FROM edges
                  UNION SELECT src, dst FROM two)
        SELECT src AS node, CAST(count(*) AS BIGINT) AS n_reach2
        FROM reach WHERE src <> dst GROUP BY 1 ORDER BY 1"""
    from .stages.textstats import STOPWORDS
    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS)
    out["text_rake_keywords"] = f"""
        WITH sp AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM documents),
        pos AS (SELECT doc_id, CAST(i AS BIGINT) AS i, w[i] AS tok
                FROM sp, unnest(generate_series(1, len(w))) AS t(i)),
        ph AS (SELECT doc_id, i, tok,
                      CASE WHEN tok IN ({stoplist}) THEN 1 ELSE 0 END
                        AS stop,
                      sum(CASE WHEN tok IN ({stoplist})
                          THEN 1 ELSE 0 END)
                        OVER (PARTITION BY doc_id ORDER BY i
                              ROWS UNBOUNDED PRECEDING) AS pid
               FROM pos),
        nw AS (SELECT doc_id, pid, tok FROM ph WHERE stop = 0),
        pl AS (SELECT doc_id, pid, count(*) AS plen
               FROM nw GROUP BY 1, 2),
        sc AS (SELECT n.tok AS word, count(*) AS freq,
                      sum(p.plen) AS deg
               FROM nw n JOIN pl p
                 ON p.doc_id = n.doc_id AND p.pid = n.pid
               GROUP BY 1)
        SELECT word, CAST(freq AS BIGINT) AS freq,
               CAST(deg AS BIGINT) AS deg,
               CAST(1000 * deg // freq AS BIGINT) AS score_fp
        FROM sc ORDER BY score_fp DESC, word LIMIT {RAKE_TOP}"""
    out["ml_adaboost_stumps"] = f"""
        WITH cc AS (SELECT CAST(round(l_quantity) AS BIGINT) AS q,
                           CAST(round(l_discount * 100) AS BIGINT) AS d,
                           CAST(l_returnflag = 'R' AS BIGINT) AS pos,
                           count(*) AS n
                    FROM lineitem GROUP BY 1, 2, 3),
        {_tree_split_ctes('cc', 'a1')},
        a1s AS (SELECT c.nl, c.pl FROM a1c c, a1pf pf
                WHERE c.feat = pf.feat AND c.thr = pf.thr),
        st AS (SELECT CASE WHEN 2 * s.pl > s.nl THEN 1 ELSE 0 END
                 AS predl,
               CASE WHEN 2 * (t.totp - s.pl) > (t.tot - s.nl)
                 THEN 1 ELSE 0 END AS predr
               FROM a1s s, a1t t),
        wc AS (SELECT cc.q, cc.d, cc.pos,
                      cc.n * (1 + CASE WHEN
                        (CASE WHEN (CASE WHEN pf.feat = 'q'
                                    THEN cc.q ELSE cc.d END) <= pf.thr
                         THEN st.predl ELSE st.predr END) <> cc.pos
                        THEN 1 ELSE 0 END) AS n
               FROM cc, a1pf pf, st),
        {_tree_split_ctes('wc', 'a2')}
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS round, feat AS feature,
                 CAST(thr AS BIGINT) AS threshold,
                 CAST(mis AS BIGINT) AS mis_weighted,
                 CAST((SELECT tot FROM a1t) AS BIGINT) AS total_weight
          FROM a1pf
          UNION ALL
          SELECT 2, feat, CAST(thr AS BIGINT), CAST(mis AS BIGINT),
                 CAST((SELECT tot FROM a2t) AS BIGINT)
          FROM a2pf)
        ORDER BY round"""
    out["rel_shipping_sla"] = f"""
        SELECT CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS pid,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CASE WHEN epoch_us(l.l_shipdate) // 86400000000
                               - epoch_us(o.o_orderdate) // 86400000000
                             > {SLA_DAYS} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_late
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1 ORDER BY 1"""
    out["text_type_token_ratio"] = """
        WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' '))
                          AS w
                   FROM documents),
        d AS (SELECT doc_id, count(*) AS n_tokens,
                     count(DISTINCT w) AS n_types
              FROM w GROUP BY 1)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_types AS BIGINT) AS n_types,
               CAST(1000000 * n_types // n_tokens AS BIGINT) AS ttr_fp
        FROM d ORDER BY doc_id"""
    out["events_spike_days"] = """
        WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          count(*) AS c
                   FROM events GROUP BY 1),
        sp AS (SELECT t.day, coalesce(d.c, 0) AS c
               FROM (SELECT unnest(generate_series(
                       (SELECT min(day) FROM d),
                       (SELECT max(day) FROM d))) AS day) t
               LEFT JOIN d ON d.day = t.day),
        tr AS (SELECT day, CAST(c AS BIGINT) AS c,
                      row_number() OVER (ORDER BY day) AS rn,
                      coalesce(sum(c) OVER (ORDER BY day
                        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0)
                        AS t7
               FROM sp)
        SELECT day, c,
               CAST(CASE WHEN rn > 7 THEN t7 ELSE 0 END AS BIGINT)
                 AS trail7,
               CAST(CASE WHEN rn > 7 AND 7 * c > 2 * t7
                    THEN 1 ELSE 0 END AS BIGINT) AS is_spike
        FROM tr ORDER BY day"""
    out["kg_sparql_sample_agg"] = P + f"""
        SELECT '{C.ENT}tool/' || {normalize_sql('t.tool')} AS tool,
               min(m.canonical) AS sample_m,
               count(DISTINCT m.canonical) AS n_bindings
        FROM mention m JOIN t ON t.turn_iri = m.turn_iri
        WHERE {TOOL_OK_SQL.replace('tool', 't.tool')}
        GROUP BY 1 ORDER BY 1"""
    out["kg_sparql_order_offset"] = P + f"""
        SELECT m, tool FROM (
          SELECT DISTINCT m.canonical AS m,
                 '{C.ENT}tool/' || {normalize_sql('t.tool')} AS tool
          FROM mention m JOIN t ON t.turn_iri = m.turn_iri
          WHERE {TOOL_OK_SQL.replace('tool', 't.tool')})
        ORDER BY m, tool
        LIMIT {SPARQL_PAGE_SIZE} OFFSET {SPARQL_PAGE * SPARQL_PAGE_SIZE}"""
    out["kg_property_cardinality"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        ps AS (SELECT pred, subj, count(*) AS n FROM tri GROUP BY 1, 2)
        SELECT pred, CAST(sum(n) AS BIGINT) AS n_triples,
               CAST(count(*) AS BIGINT) AS n_subjects,
               CAST(max(n) AS BIGINT) AS max_per_subj
        FROM ps GROUP BY 1 ORDER BY 1"""
    out["text_char_density"] = """
        WITH c AS (SELECT doc_id,
                          CAST(length(lower(text)) AS BIGINT) AS n,
                          CAST(length(lower(text))
                               - length(regexp_replace(lower(text),
                                        '[aeiou]', '', 'g')) AS BIGINT)
                            AS nv,
                          CAST(length(text)
                               - length(replace(text, ' ', '')) AS BIGINT)
                            AS ns
                   FROM documents)
        SELECT doc_id, n AS n_chars, nv AS n_vowels, ns AS n_spaces,
               CAST(1000000 * nv // greatest(n, 1) AS BIGINT)
                 AS vowel_fp
        FROM c ORDER BY doc_id"""
    cooc_list = ", ".join(f"'{w}'" for w in COOC_WORDS)
    out["text_window_cooccur"] = f"""
        WITH sp AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM documents),
        pos AS (SELECT doc_id, CAST(i AS BIGINT) AS i, w[i] AS tok
                FROM sp, unnest(generate_series(1, len(w))) AS t(i)),
        hits AS (SELECT doc_id, i, tok FROM pos
                 WHERE tok IN ({cooc_list}))
        SELECT least(a.tok, b.tok) AS w1, greatest(a.tok, b.tok) AS w2,
               CAST(b.i - a.i AS BIGINT) AS dist,
               CAST(count(*) AS BIGINT) AS n
        FROM hits a JOIN hits b
          ON b.doc_id = a.doc_id
         AND b.i - a.i BETWEEN 1 AND {COOC_MAXDIST}
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""
    out["kg_sparql_filter_regex"] = P + f"""
        SELECT m, tool FROM (
          SELECT DISTINCT m.canonical AS m,
                 '{C.ENT}tool/' || {normalize_sql('t.tool')} AS tool
          FROM mention m JOIN t ON t.turn_iri = m.turn_iri
          WHERE {TOOL_OK_SQL.replace('tool', 't.tool')})
        WHERE regexp_matches(m, '{SPARQL_REGEX}')
        ORDER BY m, tool"""
    out["privacy_cell_suppression"] = f"""
        WITH cells AS (SELECT c.c_mktsegment AS segment,
                              o.o_orderpriority AS priority,
                              CAST(year(o.o_orderdate) AS BIGINT)
                                AS year,
                              count(*) AS n
                       FROM orders o
                       JOIN customer c ON c.c_custkey = o.o_custkey
                       GROUP BY 1, 2, 3)
        SELECT segment, priority, year,
               CAST(CASE WHEN n < {SUPPRESS_K} THEN 0 ELSE n END
                    AS BIGINT) AS n_released,
               CAST(CASE WHEN n < {SUPPRESS_K} THEN 1 ELSE 0 END
                    AS BIGINT) AS suppressed
        FROM cells ORDER BY 1, 2, 3"""
    out["rel_revenue_pacing"] = """
        WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                          CAST(sum(CAST(round(o_totalprice * 100)
                                        AS BIGINT)) AS BIGINT) AS rev
                   FROM orders GROUP BY 1)
        SELECT day, rev AS rev_c,
               CAST(sum(rev) OVER (ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev_c,
               CAST(sum(rev) OVER () AS BIGINT) AS total_rev_c
        FROM d ORDER BY day"""
    out["events_abandoned_views"] = f"""
        SELECT event_id, user_id,
               CAST(CASE WHEN EXISTS (
                      SELECT 1 FROM events p
                      WHERE p.user_id = v.user_id
                        AND p.event_type = 'purchase'
                        AND epoch_us(p.ts) >= epoch_us(v.ts)
                        AND epoch_us(p.ts) <= epoch_us(v.ts)
                                                + {ABANDON_US})
                    THEN 0 ELSE 1 END AS BIGINT) AS abandoned
        FROM events v WHERE v.event_type = 'view' ORDER BY event_id"""
    out["ml_pr_curve"] = f"""
        WITH c AS (SELECT n_chars AS s,
                          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
                   FROM documents),
        mm AS (SELECT min(s) AS mn, max(s) - min(s) + 1 AS width FROM c),
        h AS (SELECT (s - mn) * {PR_BINS} // width AS bin,
                     count(*) AS n, sum(pos) AS np
              FROM c, mm GROUP BY 1),
        ks AS (SELECT unnest(range(0, {PR_BINS})) AS t)
        SELECT CAST(t AS BIGINT) AS threshold_bin,
               CAST(coalesce((SELECT sum(np) FROM h WHERE bin >= t), 0)
                    AS BIGINT) AS tp,
               CAST(coalesce((SELECT sum(n - np) FROM h WHERE bin >= t),
                             0) AS BIGINT) AS fp,
               CAST((SELECT sum(np) FROM h)
                    - coalesce((SELECT sum(np) FROM h WHERE bin >= t),
                               0) AS BIGINT) AS fn
        FROM ks ORDER BY 1"""
    out["rel_forecast_error"] = """
        WITH m AS (SELECT year(o_orderdate) * 12 + month(o_orderdate)
                            - 1 AS mi,
                          CAST(sum(CAST(round(o_totalprice * 100)
                                        AS BIGINT)) AS BIGINT) AS rev
                   FROM orders GROUP BY 1),
        l AS (SELECT mi, rev, lag(rev) OVER (ORDER BY mi) AS prev
              FROM m)
        SELECT CAST(mi AS BIGINT) AS month_index, rev AS rev_c,
               CAST(prev AS BIGINT) AS forecast_c,
               CAST(abs(rev - prev) AS BIGINT) AS abs_err_c
        FROM l WHERE prev IS NOT NULL ORDER BY 1"""
    out["sample_ipw_estimate"] = f"""
        WITH base AS (SELECT doc_id, source, n_chars,
                             CAST(substr(source, 4) AS BIGINT) AS sid,
                             CAST(doc_id AS UBIGINT) AS kx
                      FROM documents),
        {_splitmix_cte('base', 'kx', 'doc_id, source, n_chars, sid')},
        h AS (SELECT source, n_chars, 1 + sid % {IPW_MAX_K} AS k,
                     xor(z, z >> 31) AS hh
              FROM z2)
        SELECT source,
               CAST(sum(CASE WHEN hh % CAST(k AS UBIGINT) = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
               CAST(sum(CASE WHEN hh % CAST(k AS UBIGINT) = 0
                        THEN n_chars * k ELSE 0 END) AS BIGINT)
                 AS est_chars,
               CAST(sum(n_chars) AS BIGINT) AS true_chars
        FROM h GROUP BY 1 ORDER BY 1"""
    out["events_pit_features"] = f"""
        SELECT event_id, user_id,
               CAST((SELECT count(*) FROM events v
                     WHERE v.user_id = p.user_id
                       AND v.event_type = 'view'
                       AND epoch_us(v.ts) >= epoch_us(p.ts)
                                             - {PIT_WINDOW_US}
                       AND epoch_us(v.ts) < epoch_us(p.ts)) AS BIGINT)
                 AS n_views_7d
        FROM events p WHERE p.event_type = 'purchase'
        ORDER BY event_id"""
    out["multimodal_shard_plan"] = f"""
        WITH m AS (SELECT doc_id AS media_id,
                          CAST(length(text) AS BIGINT) AS size
                   FROM documents),
        r AS (SELECT size,
                     row_number() OVER (ORDER BY size DESC, media_id)
                       - 1 AS rk
              FROM m)
        SELECT CAST(rk % {SHARD_COUNT} AS BIGINT) AS shard,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(size) AS BIGINT) AS total_bytes
        FROM r GROUP BY 1 ORDER BY 1"""
    out["text_vocab_coverage"] = f"""
        WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS w
                   FROM documents),
        cnt AS (SELECT w, count(*) AS c FROM w GROUP BY 1),
        o AS (SELECT w, c,
                     row_number() OVER (ORDER BY c DESC, w) AS rn,
                     sum(c) OVER (ORDER BY c DESC, w
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                     sum(c) OVER () AS tot
              FROM cnt)
        SELECT CAST(rn AS BIGINT) AS k,
               CAST(cum AS BIGINT) AS covered_tokens,
               CAST(tot AS BIGINT) AS total_tokens
        FROM o WHERE cum * {VOCAB_COVER_DEN} >= {VOCAB_COVER_NUM} * tot
        ORDER BY rn LIMIT 1"""
    out["dedup_rate_by_source"] = """
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct
        FROM documents GROUP BY 1 ORDER BY 1"""
    out["events_runs_test"] = """
        WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          count(*) AS c
                   FROM events GROUP BY 1),
        sp AS (SELECT t.day, coalesce(d.c, 0) AS c
               FROM (SELECT unnest(generate_series(
                       (SELECT min(day) FROM d),
                       (SELECT max(day) FROM d))) AS day) t
               LEFT JOIN d ON d.day = t.day),
        s AS (SELECT day, c - lag(c) OVER (ORDER BY day) AS delta
              FROM sp),
        nz AS (SELECT day, CASE WHEN delta > 0 THEN 1 ELSE -1 END AS sg
               FROM s WHERE delta IS NOT NULL AND delta <> 0),
        r AS (SELECT day, sg, lag(sg) OVER (ORDER BY day) AS prev
              FROM nz)
        SELECT CAST(coalesce(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END),
                             0) AS BIGINT) AS n_up,
               CAST(coalesce(sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END),
                             0) AS BIGINT) AS n_down,
               CAST(coalesce(sum(CASE WHEN prev IS NULL OR sg <> prev
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_runs
        FROM r"""
    out["kg_dangling_objects"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        subs AS (SELECT DISTINCT subj AS k FROM tri),
        po AS (SELECT DISTINCT pred, obj FROM tri
               WHERE NOT obj_is_literal)
        SELECT pred, CAST(count(*) AS BIGINT) AS n_objects,
               CAST(sum(CASE WHEN NOT EXISTS (
                     SELECT 1 FROM subs WHERE subs.k = po.obj)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_dangling
        FROM po GROUP BY 1 ORDER BY 1"""
    cv_parts = []
    for f in range(CV_FOLDS):
        cv_parts.append(f"""
        f{f}g AS (SELECT q, sum(n) AS nq, sum(n * pos) AS pq
                  FROM cc WHERE fold <> {f} GROUP BY 1),
        f{f}t AS (SELECT sum(nq) AS tot, sum(pq) AS totp FROM f{f}g),
        f{f}c AS (SELECT q,
                         sum(nq) OVER (ORDER BY q
                           ROWS UNBOUNDED PRECEDING) AS nl,
                         sum(pq) OVER (ORDER BY q
                           ROWS UNBOUNDED PRECEDING) AS pl
                  FROM f{f}g),
        f{f}m AS (SELECT q, nl, pl,
                         least(pl, nl - pl)
                         + least(t.totp - pl,
                                 (t.tot - nl) - (t.totp - pl)) AS mis
                  FROM f{f}c, f{f}t t WHERE nl < t.tot),
        f{f}p AS (SELECT q, nl, pl, mis FROM f{f}m
                  ORDER BY mis, q LIMIT 1),
        f{f}s AS (SELECT p.q AS thr, p.mis,
                         CASE WHEN 2 * p.pl > p.nl THEN 1 ELSE 0 END
                           AS predl,
                         CASE WHEN 2 * (t.totp - p.pl)
                                   > (t.tot - p.nl) THEN 1 ELSE 0 END
                           AS predr
                  FROM f{f}p p, f{f}t t),
        f{f}e AS (SELECT CAST({f} AS BIGINT) AS fold,
                         CAST(s.thr AS BIGINT) AS threshold,
                         CAST(s.mis AS BIGINT) AS train_mis,
                         CAST(sum(CASE WHEN (CASE WHEN cc.q <= s.thr
                                             THEN s.predl
                                             ELSE s.predr END)
                                       <> cc.pos
                                  THEN cc.n ELSE 0 END) AS BIGINT)
                           AS test_mis
                  FROM cc, f{f}s s WHERE cc.fold = {f}
                  GROUP BY 1, 2, 3)""")
    out["ml_cv_stump"] = f"""
        WITH b0 AS (SELECT CAST(round(l_quantity) AS BIGINT) AS q,
                           CAST(l_returnflag = 'R' AS BIGINT) AS pos,
                           CAST(l_orderkey AS UBIGINT) AS kx
                    FROM lineitem),
        {_splitmix_cte('b0', 'kx', 'q, pos')},
        cc AS (SELECT q, pos,
                      CAST(xor(z, z >> 31) % {CV_FOLDS} AS BIGINT)
                        AS fold,
                      count(*) AS n
               FROM z2 GROUP BY 1, 2, 3),
        {','.join(cv_parts)}
        SELECT * FROM (SELECT * FROM f0e UNION ALL
                       SELECT * FROM f1e UNION ALL
                       SELECT * FROM f2e)
        ORDER BY fold"""
    out["text_novelty_scores"] = """
        WITH sp AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM documents),
        gr AS (SELECT DISTINCT doc_id,
                      w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS g
               FROM sp, unnest(generate_series(1, len(w) - 2)) AS t(i)),
        fd AS (SELECT g, min(doc_id) AS fd FROM gr GROUP BY 1)
        SELECT gr.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN fd.fd = gr.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel
        FROM gr JOIN fd USING(g) GROUP BY 1 ORDER BY 1"""
    out["diag_key_skew"] = f"""
        WITH cnt AS (SELECT l_partkey, count(*) AS n
                     FROM lineitem GROUP BY 1),
        tot AS (SELECT sum(n) AS nr, count(*) AS nk FROM cnt)
        SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
               CAST(n AS BIGINT) AS n,
               CAST(1000000 * n * t.nk // t.nr AS BIGINT) AS skew_fp
        FROM cnt, tot t
        ORDER BY n DESC, l_partkey LIMIT {SKEW_TOP}"""
    out["text_stopword_discovery"] = f"""
        WITH sp AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM documents),
        tw AS (SELECT DISTINCT doc_id, t.x AS word
               FROM sp, unnest(w) AS t(x)),
        df AS (SELECT word, CAST(count(*) AS BIGINT) AS df
               FROM tw GROUP BY 1),
        nd AS (SELECT count(*) AS n FROM documents)
        SELECT word, df FROM df, nd
        WHERE df * {STOPWORD_DF_DEN} > {STOPWORD_DF_NUM} * nd.n
        ORDER BY word"""
    out["rel_aov_by_order_rank"] = """
        WITH r AS (SELECT o_custkey,
                          row_number() OVER (
                              PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rank,
                          CAST(round(o_totalprice * 100) AS BIGINT) AS p
                   FROM orders)
        SELECT CAST(rank AS BIGINT) AS rank,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(p) AS BIGINT) AS total_c
        FROM r GROUP BY 1 ORDER BY 1"""
    out["rel_top3_parts_per_brand"] = f"""
        WITH rev AS (
          SELECT CAST(substr(p_brand, 7) AS BIGINT) AS brand_id,
                 CAST(l_partkey AS BIGINT) AS p_partkey,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100)
                                        AS BIGINT))) AS BIGINT) AS rev
          FROM lineitem JOIN part ON p_partkey = l_partkey
          GROUP BY 1, 2),
        rk AS (SELECT brand_id, p_partkey, rev,
                      row_number() OVER (
                          PARTITION BY brand_id
                          ORDER BY rev DESC, p_partkey) AS rk
               FROM rev)
        SELECT brand_id, p_partkey, rev, CAST(rk AS BIGINT) AS rk
        FROM rk WHERE rk <= {BRAND_TOPK} ORDER BY brand_id, rk"""
    rules_vals = ", ".join(
        f"('{p}', '{d}', '{r}')" for p, (d, r) in RDFS_RULES.items())
    out["kg_rdfs_inference"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        rules(p, dcls, rcls) AS (VALUES {rules_vals}),
        inf AS (SELECT DISTINCT node, type_iri FROM (
            SELECT t.subj AS node, r.dcls AS type_iri
            FROM tri t JOIN rules r ON t.pred = r.p
            UNION ALL
            SELECT t.obj, r.rcls
            FROM tri t JOIN rules r ON t.pred = r.p))
        SELECT node, type_iri FROM inf
        EXCEPT
        SELECT subj, obj FROM tri WHERE pred = '{C.RDF_TYPE}'
        ORDER BY node, type_iri"""
    out["rel_scd2_intervals"] = f"""
        WITH e AS (SELECT user_id, event_type, event_id,
                          CAST(epoch_us(ts) AS BIGINT) AS t FROM events),
        m AS (SELECT *, lag(event_type) OVER (
                  PARTITION BY user_id ORDER BY t, event_id) AS prev
              FROM e),
        s AS (SELECT *, sum(CASE WHEN prev IS NULL
                                   OR prev <> event_type
                                 THEN 1 ELSE 0 END) OVER (
                  PARTITION BY user_id ORDER BY t, event_id
                  ROWS UNBOUNDED PRECEDING) AS seg
              FROM m),
        r AS (SELECT user_id, seg, min(event_type) AS event_type,
                     min(t) AS valid_from_us, count(*) AS n_events
              FROM s GROUP BY 1, 2)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(seg AS BIGINT) AS seg, event_type,
               CAST(valid_from_us AS BIGINT) AS valid_from_us,
               CAST(coalesce(lead(valid_from_us) OVER (
                        PARTITION BY user_id ORDER BY seg),
                    {SCD_OPEN_END}) AS BIGINT) AS valid_to_us,
               CAST(n_events AS BIGINT) AS n_events
        FROM r ORDER BY user_id, seg"""
    out["events_cumulative_users"] = """
        WITH f AS (SELECT user_id,
                          min(CAST(epoch_us(ts) // 86400000000
                                   AS BIGINT)) AS day
                   FROM events GROUP BY 1),
        d AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new
              FROM f GROUP BY 1)
        SELECT day, n_new,
               CAST(sum(n_new) OVER (ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        FROM d ORDER BY day"""
    out["rel_orders_within_week"] = f"""
        WITH o AS (SELECT o_orderkey, o_custkey,
                          CAST(epoch_us(o_orderdate) // 86400000000
                               AS BIGINT) AS d
                   FROM orders)
        SELECT a.o_orderkey,
               CAST(count(b.o_orderkey) AS BIGINT) AS n_within
        FROM o a LEFT JOIN o b
          ON a.o_custkey = b.o_custkey
         AND b.d BETWEEN a.d - {WITHIN_DAYS} AND a.d + {WITHIN_DAYS}
         AND b.o_orderkey <> a.o_orderkey
        GROUP BY 1 ORDER BY 1"""
    out["text_bigram_surprisal"] = """
        WITH sp AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM documents),
        tok AS (SELECT doc_id, w[i] AS u, w[i + 1] AS v
                FROM sp, unnest(generate_series(1, len(w) - 1)) AS t(i)),
        cuv AS (SELECT u, v, count(*) AS cuv FROM tok GROUP BY 1, 2),
        cu AS (SELECT u, sum(cuv) AS cu FROM cuv GROUP BY 1),
        vocab AS (SELECT count(DISTINCT x) AS V
                  FROM (SELECT unnest(w) AS x FROM sp)),
        s AS (SELECT tok.doc_id,
                     length(bin((cu.cu + vocab.V) // (cuv.cuv + 1)))
                       AS b
              FROM tok JOIN cuv ON tok.u = cuv.u AND tok.v = cuv.v
              JOIN cu ON tok.u = cu.u, vocab)
        SELECT doc_id, CAST(sum(b) AS BIGINT) AS bits,
               CAST(count(*) AS BIGINT) AS n_bigrams
        FROM s GROUP BY 1 ORDER BY 1"""
    out["events_session_paths"] = f"""
        WITH e AS (SELECT user_id, event_id, event_type,
                          CAST(epoch_us(ts) AS BIGINT) AS t FROM events),
        m AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
                               OR t - lag(t) OVER w > {1_800_000_000}
                             THEN 1 ELSE 0 END AS brk
              FROM e
              WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        s AS (SELECT *, sum(brk) OVER (
                  PARTITION BY user_id ORDER BY t, event_id
                  ROWS UNBOUNDED PRECEDING) AS sid
              FROM m),
        g AS (SELECT event_type, lead(event_type, 1) OVER w2 AS e2,
                     lead(event_type, 2) OVER w2 AS e3
              FROM s
              WINDOW w2 AS (PARTITION BY user_id, sid
                            ORDER BY t, event_id)),
        p AS (SELECT event_type || '>' || e2 || '>' || e3 AS path
              FROM g WHERE e3 IS NOT NULL)
        SELECT path, CAST(count(*) AS BIGINT) AS n FROM p
        GROUP BY 1 ORDER BY n DESC, path LIMIT {PATH_TOPK}"""
    out["kg_transe_negatives"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        e AS (SELECT DISTINCT subj, obj FROM tri
              WHERE pred = '{C.PRED_USES_TOOL}'),
        tl AS (SELECT obj AS tool,
                      row_number() OVER (ORDER BY obj) - 1 AS pos
               FROM (SELECT DISTINCT obj FROM e)),
        nt AS (SELECT count(*) AS n FROM tl),
        h AS (SELECT subj, obj,
                     ('0x' || substring(md5(subj || '#' || obj), 1, 8))
                       ::BIGINT % n.n AS idx, n.n AS n
              FROM e, nt n)
        SELECT h.subj, h.obj,
               CASE WHEN t1.tool = h.obj THEN t2.tool
                    ELSE t1.tool END AS neg_obj
        FROM h JOIN tl t1 ON t1.pos = h.idx
        JOIN tl t2 ON t2.pos = (h.idx + 1) % h.n
        ORDER BY h.subj, h.obj"""
    shingle_expr = " || ' ' || ".join(
        f"w[i + {j}]" for j in range(CONTAM_K))
    out["text_contamination"] = f"""
        WITH sp AS (SELECT doc_id, source,
                           string_split(lower(text), ' ') AS w
                    FROM documents),
        g AS (SELECT DISTINCT doc_id, source, {shingle_expr} AS s
              FROM sp, unnest(generate_series(1, len(w) - {CONTAM_K - 1}))
                   AS t(i)),
        bench AS (SELECT DISTINCT s FROM g
                  WHERE source = '{CONTAM_BENCH}')
        SELECT doc_id, min(source) AS source,
               CAST(count(*) AS BIGINT) AS n_hits
        FROM g WHERE source <> '{CONTAM_BENCH}'
          AND s IN (SELECT s FROM bench)
        GROUP BY doc_id ORDER BY doc_id"""
    out["text_repetition_filter"] = """
        WITH sp AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM documents),
        t AS (SELECT doc_id, t.x AS wd FROM sp, unnest(w) AS t(x)),
        wc AS (SELECT doc_id, wd, count(*) AS c FROM t GROUP BY 1, 2),
        uni AS (SELECT doc_id, sum(c) AS n_tokens, max(c) AS topc
                FROM wc GROUP BY 1),
        g AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
              FROM sp, unnest(generate_series(1, len(w) - 2)) AS t(i)),
        gg AS (SELECT doc_id, count(*) AS n_g,
                      count(DISTINCT s) AS n_d
               FROM g GROUP BY 1)
        SELECT u.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(1000000 * topc // n_tokens AS BIGINT) AS top_fp,
               CAST(CASE WHEN coalesce(n_g, 0) > 0
                         THEN 1000000 * (n_g - n_d) // n_g
                         ELSE 0 END AS BIGINT) AS dup_fp
        FROM uni u LEFT JOIN gg ON gg.doc_id = u.doc_id
        ORDER BY u.doc_id"""
    out["text_pack_plan"] = f"""
        WITH t AS (SELECT doc_id,
                          CAST(len(string_split(text, ' ')) AS BIGINT)
                            AS n_tokens
                   FROM documents),
        c AS (SELECT doc_id, n_tokens,
                     coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS cum
              FROM t)
        SELECT doc_id, n_tokens,
               CAST(cum // {PACK_BUDGET} AS BIGINT) AS pack_id
        FROM c ORDER BY doc_id"""
    out["kg_sparql_path_star"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        edges AS (SELECT subj AS s, obj AS o FROM tri
                  WHERE pred = '{C.RDFS_SUBCLASS_OF}'),
        nodes AS (SELECT s AS n FROM edges UNION SELECT o FROM edges),
        clo AS (SELECT a, b FROM (
            WITH RECURSIVE r(a, b) AS (
                SELECT s, o FROM edges
                UNION
                SELECT r.a, e.o FROM r JOIN edges e ON e.s = r.b)
            SELECT a, b FROM r))
        SELECT DISTINCT a, b FROM (
            SELECT n AS a, n AS b FROM nodes
            UNION ALL SELECT a, b FROM clo)
        ORDER BY a, b"""
    out["ml_auc"] = """
        WITH s AS (SELECT n_chars AS v, count(*) AS n,
                          sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                            AS np_
                   FROM documents GROUP BY 1),
        c AS (SELECT v, np_, n - np_ AS nn,
                     coalesce(sum(n - np_) OVER (ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS below
              FROM s),
        u AS (SELECT sum(np_ * (2 * below + nn)) AS u2 FROM c),
        t AS (SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p,
                     sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS nn
              FROM documents)
        SELECT CAST(p AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
               CAST(u2 AS BIGINT) AS u2,
               CAST(1000000 * u2 // (2 * p * nn) AS BIGINT) AS auc_fp
        FROM u, t"""
    out["rel_late_arrivals"] = f"""
        WITH e AS (SELECT o_orderkey,
                          CAST(epoch_us(o_orderdate) // 86400000000
                               AS BIGINT) AS d,
                          CAST(year(o_orderdate) AS BIGINT) AS yr
                   FROM orders),
        m AS (SELECT *, max(d) OVER (ORDER BY o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS wm
              FROM e)
        SELECT yr AS year, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN wm IS NOT NULL
                              AND d < wm - {LATE_DAYS}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        FROM m GROUP BY 1 ORDER BY 1"""
    out["rel_division_all_priorities"] = """
        SELECT CAST(o_custkey AS BIGINT) AS o_custkey
        FROM orders GROUP BY 1
        HAVING count(DISTINCT o_orderpriority) =
               (SELECT count(DISTINCT o_orderpriority) FROM orders)
        ORDER BY 1"""
    out["privacy_l_diversity"] = f"""
        WITH g AS (SELECT source, n_chars // 50 AS b,
                          CAST(count(*) AS BIGINT) AS n,
                          CAST(count(DISTINCT lang) AS BIGINT) AS l
                   FROM documents GROUP BY 1, 2)
        SELECT source, CAST(b AS BIGINT) AS b, n, l FROM g
        WHERE l < {L_DIV} ORDER BY source, b"""
    out["search_kwic"] = f"""
        WITH sp AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM documents),
        h AS (SELECT doc_id, w,
                     list_position(w, '{KWIC_TERM}') AS i, len(w) AS nw
              FROM sp)
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               array_to_string(w[greatest(1, i - {KWIC_WIN}) :
                                 least(nw, i + {KWIC_WIN})], ' ')
                 AS snippet
        FROM h WHERE i > 0 ORDER BY doc_id"""
    out["ml_label_centroids"] = """
        WITH u AS (SELECT label, g.i - 1 AS dim,
                          CAST(floor(1000000 *
                               CAST(embedding[g.i] AS DOUBLE))
                               AS BIGINT) AS fp
                   FROM embeddings,
                        unnest(generate_series(1, len(embedding)))
                          AS g(i))
        SELECT CAST(label AS BIGINT) AS label,
               CAST(dim AS BIGINT) AS dim,
               CAST(sum(fp) AS BIGINT) AS sum_fp,
               CAST(count(*) AS BIGINT) AS n
        FROM u GROUP BY 1, 2 ORDER BY 1, 2"""
    out["kg_sparql_path_opt"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        edges AS (SELECT subj AS s, obj AS o FROM tri
                  WHERE pred = '{C.RDFS_SUBCLASS_OF}'),
        nodes AS (SELECT s AS n FROM edges UNION SELECT o FROM edges)
        SELECT DISTINCT a, b FROM (
            SELECT n AS a, n AS b FROM nodes
            UNION ALL SELECT s, o FROM edges)
        ORDER BY a, b"""
    out["rel_reorder_gaps"] = f"""
        WITH o AS (SELECT o_custkey,
                          CAST(epoch_us(o_orderdate) // 86400000000
                               AS BIGINT) AS d, o_orderkey
                   FROM orders),
        g AS (SELECT d - lag(d) OVER (
                  PARTITION BY o_custkey
                  ORDER BY d, o_orderkey) AS gap
              FROM o)
        SELECT CAST(gap // {GAP_WEEK_BUCKET} AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY 1"""
    out["sample_exact_split"] = f"""
        WITH {_splitmix_cte('documents', 'doc_id', 'doc_id')},
        hh AS (SELECT doc_id, xor(z, z >> 31) AS hu FROM z2),
        hs AS (SELECT doc_id,
                      CAST(CAST(hu AS HUGEINT)
                           - CASE WHEN hu >= 9223372036854775808
                                  THEN {_M64} ELSE 0 END AS BIGINT)
                        AS h
               FROM hh),
        r AS (SELECT doc_id,
                     row_number() OVER (ORDER BY h) - 1 AS rk
              FROM hs),
        nn AS (SELECT count(*) AS n FROM documents)
        SELECT doc_id,
               CASE WHEN rk < nn.n * {SPLIT_TRAIN_PCT} // 100
                    THEN 'train'
                    WHEN rk < nn.n
                         * {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} // 100
                    THEN 'val' ELSE 'test' END AS split
        FROM r, nn ORDER BY doc_id"""
    out["events_rolling_distinct_users"] = f"""
        WITH ud AS (SELECT DISTINCT user_id,
                           CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                             AS d
                    FROM events),
        mm AS (SELECT min(d) AS lo, max(d) AS hi FROM ud),
        spine AS (SELECT unnest(generate_series(lo, hi)) AS day
                  FROM mm)
        SELECT day,
               CAST((SELECT count(DISTINCT user_id) FROM ud
                     WHERE ud.d BETWEEN day - {ROLL_WIN_DAYS - 1}
                       AND day) AS BIGINT) AS n_users
        FROM spine ORDER BY day"""
    out["ml_nearest_centroid"] = """
        WITH u AS (SELECT vec_id, label, g.i - 1 AS dim,
                          CAST(floor(1000000 *
                               CAST(embedding[g.i] AS DOUBLE))
                               AS BIGINT) AS fp
                   FROM embeddings,
                        unnest(generate_series(1, len(embedding)))
                          AS g(i)),
        c AS (SELECT label AS cl, dim, sum(fp) // count(*) AS cfp
              FROM u GROUP BY 1, 2),
        d2 AS (SELECT u.vec_id, min(u.label) AS label_true, c.cl,
                      sum((u.fp - c.cfp) * (u.fp - c.cfp)) AS d2
               FROM u JOIN c ON c.dim = u.dim
               GROUP BY u.vec_id, c.cl),
        pick AS (SELECT vec_id, label_true, cl,
                        row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2, cl) AS rn
                 FROM d2)
        SELECT CAST(label_true AS BIGINT) AS label_true,
               CAST(cl AS BIGINT) AS label_pred,
               CAST(count(*) AS BIGINT) AS n
        FROM pick WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2"""
    out["rel_cume_dist_prices"] = """
        WITH o AS (SELECT o_orderkey,
                          CAST(round(o_totalprice * 100) AS BIGINT)
                            AS p
                   FROM orders),
        c AS (SELECT o_orderkey, p,
                     count(*) OVER (ORDER BY p RANGE BETWEEN
                         UNBOUNDED PRECEDING AND CURRENT ROW) AS le,
                     count(*) OVER () AS n
              FROM o)
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               p AS price_c,
               CAST(1000000 * le // n AS BIGINT) AS cume_fp
        FROM c ORDER BY o_orderkey"""
    out["text_source_vocab_overlap"] = f"""
        WITH sp AS (SELECT CAST(substr(source, 4) AS BIGINT) AS s,
                           string_split(lower(text), ' ') AS w
                    FROM documents),
        ws AS (SELECT DISTINCT s, t.x AS wd
               FROM sp, unnest(w) AS t(x)),
        sz AS (SELECT s, count(*) AS n FROM ws GROUP BY 1),
        pr AS (SELECT a.s AS sa, b.s AS sb, count(*) AS inter
               FROM ws a JOIN ws b ON a.wd = b.wd AND a.s < b.s
               GROUP BY 1, 2)
        SELECT CAST(sa AS BIGINT) AS src_a, CAST(sb AS BIGINT) AS src_b,
               CAST(inter AS BIGINT) AS n_inter,
               CAST(1000000 * inter // (za.n + zb.n - inter) AS BIGINT)
                 AS jaccard_fp
        FROM pr JOIN sz za ON za.s = sa JOIN sz zb ON zb.s = sb
        ORDER BY jaccard_fp DESC, src_a, src_b
        LIMIT {VOCAB_OVERLAP_TOPK}"""
    out["events_retention_matrix"] = """
        WITH uw AS (SELECT DISTINCT user_id,
                           CAST(epoch_us(ts) // 604800000000 AS BIGINT)
                             AS wk
                    FROM events),
        f AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY 1)
        SELECT CAST(f.cohort AS BIGINT) AS cohort,
               CAST(uw.wk - f.cohort AS BIGINT) AS age,
               CAST(count(*) AS BIGINT) AS n_users
        FROM uw JOIN f ON f.user_id = uw.user_id
        GROUP BY 1, 2 ORDER BY 1, 2"""
    out["ml_best_f1_threshold"] = f"""
        WITH c AS (SELECT n_chars AS s,
                          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
                   FROM documents),
        mm AS (SELECT min(s) AS mn, max(s) - min(s) + 1 AS width FROM c),
        h AS (SELECT (s - mn) * {PR_BINS} // width AS bin,
                     count(*) AS n, sum(pos) AS np
              FROM c, mm GROUP BY 1),
        ks AS (SELECT unnest(range(0, {PR_BINS})) AS t),
        sweep AS (SELECT t,
                 coalesce((SELECT sum(np) FROM h WHERE bin >= t), 0)
                   AS tp,
                 coalesce((SELECT sum(n - np) FROM h WHERE bin >= t),
                          0) AS fp,
                 (SELECT sum(np) FROM h)
                 - coalesce((SELECT sum(np) FROM h WHERE bin >= t), 0)
                   AS fn
                  FROM ks),
        scored AS (SELECT t, tp, fp, fn,
                          CASE WHEN 2 * tp + fp + fn > 0
                               THEN 1000000 * 2 * tp
                                    // (2 * tp + fp + fn)
                               ELSE 0 END AS f1
                   FROM sweep)
        SELECT CAST(t AS BIGINT) AS best_bin, CAST(tp AS BIGINT) AS tp,
               CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
               CAST(f1 AS BIGINT) AS f1_fp
        FROM scored ORDER BY f1 DESC, t LIMIT 1"""
    out["dedup_cluster_sizes"] = "WITH " + _SHINGLE_CTE + """
        , p AS (SELECT i.doc_a AS a, i.doc_b AS b
                FROM inter i
                JOIN sizes sa ON sa.doc_id = i.doc_a
                JOIN sizes sb ON sb.doc_id = i.doc_b
                WHERE CAST(i.ni AS DOUBLE)
                      / (sa.n + sb.n - i.ni) >= 0.5),
        e AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p),
        r AS (SELECT u, v FROM (
            WITH RECURSIVE rr(u, v) AS (
                SELECT u, v FROM e
                UNION
                SELECT rr.u, e.v FROM rr JOIN e ON e.u = rr.v)
            SELECT u, v FROM rr)),
        lab AS (SELECT u AS node, least(u, min(v)) AS rep
                FROM r GROUP BY 1)
        SELECT CAST(rep AS BIGINT) AS cluster_rep,
               CAST(count(*) AS BIGINT) AS size
        FROM lab GROUP BY 1 ORDER BY 1"""
    out["events_burst_users"] = f"""
        WITH um AS (SELECT user_id,
                           epoch_us(ts) // 60000000 AS minute,
                           count(*) AS k
                    FROM events GROUP BY 1, 2),
        pu AS (SELECT user_id, max(k) AS max_per_min,
                      sum(k) AS n_events
               FROM um GROUP BY 1)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(max_per_min AS BIGINT) AS max_per_min,
               CAST(n_events AS BIGINT) AS n_events
        FROM pu WHERE max_per_min >= {BURST_MIN} ORDER BY 1"""
    out["kg_eigencentrality"] = P + """
        , triples AS (""" + _structural_sql() + """
          UNION """ + _mention_sql() + """),
        edges AS (SELECT DISTINCT subj AS src, obj AS dst FROM triples
                  WHERE NOT obj_is_literal),
        """ + _eigen_sql()
    out["kg_pred_cooccurrence"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        sp AS (SELECT DISTINCT subj, pred FROM tri)
        SELECT a.pred AS pred_a, b.pred AS pred_b,
               CAST(count(*) AS BIGINT) AS n_subj
        FROM sp a JOIN sp b ON a.subj = b.subj AND a.pred < b.pred
        GROUP BY 1, 2 ORDER BY 1, 2"""
    out["rel_target_encoding"] = """
        WITH o AS (SELECT o_orderkey, c_nationkey AS nation,
                          CAST(round(o_totalprice * 100) AS BIGINT) AS p
                   FROM orders JOIN customer ON c_custkey = o_custkey),
        g AS (SELECT nation, sum(p) AS sp, count(*) AS n
              FROM o GROUP BY 1)
        SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o.nation AS BIGINT) AS nation,
               CAST(CASE WHEN g.n > 1 THEN (g.sp - o.p) // (g.n - 1)
                    ELSE 0 END AS BIGINT) AS loo_cents
        FROM o JOIN g USING (nation) ORDER BY o_orderkey"""
    out["curation_dup_weights"] = "WITH RECURSIVE " + _SHINGLE_CTE \
        + "," + _CANON_CTE + """
        , cm AS (SELECT d.doc_id, coalesce(c.c, d.doc_id) AS canon_id
                 FROM documents d LEFT JOIN canon c ON c.node = d.doc_id),
        sz AS (SELECT canon_id, count(*) AS n FROM cm GROUP BY 1)
        SELECT CAST(cm.doc_id AS BIGINT) AS doc_id,
               CAST(cm.canon_id AS BIGINT) AS canon_id,
               CAST(1000000 // sz.n AS BIGINT) AS weight_fp
        FROM cm JOIN sz USING (canon_id) ORDER BY cm.doc_id"""
    out["kg_ktruss_edges"] = P + """
        , ce AS (SELECT DISTINCT a.canonical AS u, b.canonical AS v
                 FROM mention a JOIN mention b
                   ON a.turn_iri = b.turn_iri
                  AND a.canonical < b.canonical),
        """ + _ktruss_sql(KTRUSS_K, KTRUSS_ROUNDS)
    out["kg_subclass_depth"] = P.replace(
        "\nWITH t AS", "\nWITH RECURSIVE t AS", 1) + f"""
        , tri AS (SELECT * FROM ({full_body})),
        sce AS (SELECT DISTINCT subj AS s, obj AS o FROM tri
                WHERE pred = '{C.RDFS_SUBCLASS_OF}'),
        scanc(s, o) AS (SELECT s, o FROM sce
                        UNION
                        SELECT a.s, e.o FROM scanc a
                        JOIN sce e ON e.s = a.o),
        scnodes AS (SELECT DISTINCT n FROM (
                    SELECT s AS n FROM sce
                    UNION ALL SELECT o FROM sce)),
        sccnt AS (SELECT s, count(*) AS d FROM scanc GROUP BY 1)
        SELECT n AS class_iri, CAST(coalesce(c.d, 0) AS BIGINT) AS depth
        FROM scnodes LEFT JOIN sccnt c ON c.s = n ORDER BY 1"""
    out["dedup_incremental"] = "WITH " + _SHINGLE_CTE + """
        , mx AS (SELECT max(doc_id) + 1 AS n FROM documents),
        p AS (SELECT i.doc_a, i.doc_b FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b
              WHERE CAST(i.ni AS DOUBLE)
                    / (sa.n + sb.n - i.ni) >= 0.5),
        cut AS (SELECT (9 * n + 9) // 10 AS c FROM mx)
        SELECT CAST(doc_b AS BIGINT) AS doc_id,
               CAST(min(doc_a) AS BIGINT) AS dup_of
        FROM p, cut WHERE doc_b >= c AND doc_a < c
        GROUP BY 1 ORDER BY 1"""
    out["text_source_term_lift"] = f"""
        WITH dd AS (SELECT doc_id, source,
                           string_split(lower(text), ' ') AS ws
                    FROM documents),
        post AS (SELECT DISTINCT doc_id, source, t.x AS w
                 FROM dd, unnest(ws) AS t(x)),
        dfs AS (SELECT w, source, count(*) AS df_s
                FROM post GROUP BY 1, 2),
        df AS (SELECT w, sum(df_s) AS df FROM dfs GROUP BY 1),
        ds AS (SELECT source, count(*) AS d_s FROM documents
               GROUP BY 1),
        d AS (SELECT count(*) AS d FROM documents),
        scored AS (SELECT dfs.source, dfs.w,
                          1000000 * dfs.df_s * d.d
                            // (ds.d_s * df.df) AS lift_fp
                   FROM dfs JOIN df USING (w)
                   JOIN ds ON ds.source = dfs.source, d
                   WHERE df.df >= {TERM_LIFT_MIN_DF}),
        rk AS (SELECT *, row_number() OVER (
                   PARTITION BY source
                   ORDER BY lift_fp DESC, w) AS rn
               FROM scored)
        SELECT source, w AS term, CAST(lift_fp AS BIGINT) AS lift_fp
        FROM rk WHERE rn <= {TERM_LIFT_TOPK}
        ORDER BY source, term"""
    markov = ["""
        WITH w AS (SELECT event_type,
                          lag(event_type) OVER (
                            PARTITION BY user_id
                            ORDER BY ts, event_id) AS prev_type
                   FROM events),
        trans AS (SELECT prev_type AS src, event_type AS dst,
                         count(*) AS n
                  FROM w WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        st AS (SELECT DISTINCT event_type AS et FROM events),
        rs AS (SELECT src, sum(n) AS s FROM trans GROUP BY 1),
        x0 AS (SELECT et, CAST(1000000 AS BIGINT) AS x FROM st)"""]
    for t in range(1, MARKOV_ITERS + 1):
        markov.append(f""",
        x{t} AS (SELECT st.et, COALESCE(s.v, 0) AS x
                 FROM st LEFT JOIN (
                   SELECT t.dst AS et, sum(x.x * t.n // rs.s) AS v
                   FROM trans t JOIN x{t - 1} x ON x.et = t.src
                   JOIN rs ON rs.src = t.src GROUP BY 1) s
                 ON s.et = st.et)""")
    out["events_markov_stationary"] = "".join(markov) + f"""
        SELECT et AS event_type, CAST(x AS BIGINT) AS mass_fp
        FROM x{MARKOV_ITERS} ORDER BY 1"""
    out["text_term_burstiness"] = f"""
        WITH dd AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                    FROM documents),
        c AS (SELECT doc_id, t.x AS w, count(*) AS c
              FROM dd, unnest(ws) AS t(x) GROUP BY 1, 2),
        a AS (SELECT w, sum(c) AS tf, sum(c * c) AS ss FROM c
              GROUP BY 1),
        d AS (SELECT count(*) AS d FROM documents),
        top AS (SELECT * FROM a ORDER BY tf DESC, w
                LIMIT {BURSTY_TOPK})
        SELECT w AS term, CAST(tf AS BIGINT) AS tf,
               CAST((1000000 * (d.d * ss - tf * tf)) // (d.d * tf)
                    AS BIGINT) AS vmr_fp
        FROM top, d ORDER BY tf DESC, term"""
    out["sample_balanced_classes"] = """
        WITH c AS (SELECT lang, count(*) AS n FROM documents
                   GROUP BY 1),
        m AS (SELECT min(n) AS m FROM c),
        r AS (SELECT doc_id, lang, row_number() OVER (
                  PARTITION BY lang ORDER BY doc_id) AS rn
              FROM documents)
        SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
        FROM r, m WHERE rn <= m.m ORDER BY doc_id"""
    out["text_gopher_rules"] = f"""
        WITH w AS (SELECT doc_id, source,
                          string_split(lower(text), ' ') AS ws
                   FROM documents),
        s AS (SELECT doc_id, source, len(ws) AS nw,
                (SELECT sum(length(x)) FROM unnest(ws) AS t(x)) AS nc,
                (SELECT count(DISTINCT x) FROM unnest(ws) AS t(x)) AS nd
              FROM w),
        f AS (SELECT source,
                CASE WHEN nw < {GOPHER_MIN_WORDS} THEN 1 ELSE 0 END AS f1,
                CASE WHEN 1000000 * nc // nw < {GOPHER_MWL_LO}
                       OR 1000000 * nc // nw > {GOPHER_MWL_HI}
                     THEN 1 ELSE 0 END AS f2,
                CASE WHEN 1000000 * nd // nw < {GOPHER_TTR_MIN}
                     THEN 1 ELSE 0 END AS f3
              FROM s)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(f1) AS BIGINT) AS fail_words,
               CAST(sum(f2) AS BIGINT) AS fail_meanlen,
               CAST(sum(f3) AS BIGINT) AS fail_ttr,
               CAST(sum(CASE WHEN f1 + f2 + f3 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pass
        FROM f GROUP BY 1 ORDER BY 1"""
    ndcg_terms = ", ".join(
        f"({qi}, '{t}')" for qi, q in enumerate(_BM25_QUERIES)
        for t in dict.fromkeys(q.lower().split(" ")))
    ndcg_wt = ", ".join(f"({i + 1}, {w})" for i, w in enumerate(NDCG_W))
    out["ml_ndcg"] = f"""
        WITH bm AS ({_bm25_sql().rsplit("ORDER BY", 1)[0]}),
        terms(query_id, term) AS (VALUES {ndcg_terms}),
        wt(rn, wt) AS (VALUES {ndcg_wt}),
        wrd AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
                FROM documents),
        rel AS (SELECT t.query_id, wrd.doc_id, count(*) AS rel
                FROM wrd JOIN terms t ON t.term = wrd.w GROUP BY 1, 2),
        ideal AS (SELECT query_id, rel, row_number() OVER (
                    PARTITION BY query_id ORDER BY rel DESC, doc_id) AS rn
                  FROM rel),
        idcg AS (SELECT query_id, sum(rel * wt.wt) AS idcg
                 FROM ideal JOIN wt ON wt.rn = ideal.rn
                 WHERE ideal.rn <= {NDCG_K} GROUP BY 1),
        dcg AS (SELECT bm.query_id,
                       sum(coalesce(rel.rel, 0) * wt.wt) AS dcg
                FROM bm JOIN wt ON wt.rn = bm.rank
                LEFT JOIN rel ON rel.query_id = bm.query_id
                             AND rel.doc_id = bm.doc_id
                GROUP BY 1)
        SELECT i.query_id, CAST(d.dcg AS BIGINT) AS dcg,
               CAST(i.idcg AS BIGINT) AS idcg,
               CAST(CASE WHEN i.idcg = 0 THEN 0
                    ELSE 1000000 * d.dcg // i.idcg END AS BIGINT)
                 AS ndcg_fp
        FROM idcg i JOIN dcg d USING (query_id) ORDER BY query_id"""
    out["events_type_jaccard"] = """
        WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        c AS (SELECT event_type, count(*) AS n FROM tu GROUP BY 1),
        p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                     count(*) AS inter
              FROM tu a JOIN tu b ON a.user_id = b.user_id
                                 AND a.event_type < b.event_type
              GROUP BY 1, 2)
        SELECT type_a, type_b, CAST(ca.n AS BIGINT) AS n_a,
               CAST(cb.n AS BIGINT) AS n_b, CAST(inter AS BIGINT) AS inter,
               CAST(1000000 * inter // (ca.n + cb.n - inter) AS BIGINT)
                 AS jac_fp
        FROM p JOIN c ca ON ca.event_type = type_a
               JOIN c cb ON cb.event_type = type_b
        ORDER BY type_a, type_b"""
    kc = ["""
        WITH e AS (SELECT vec_id, CAST(g.i AS BIGINT) AS dim,
                          CAST(floor(CAST(embedding[g.i] AS DOUBLE)
                                     * 1000000) AS BIGINT) AS ec
                   FROM embeddings, generate_series(1, 64) AS g(i)),
        c1 AS (SELECT min(vec_id) AS v FROM embeddings),
        m1 AS (SELECT e.vec_id, sum((e.ec - c.ec) * (e.ec - c.ec)) AS d
               FROM e JOIN e c ON c.dim = e.dim
                              AND c.vec_id = (SELECT v FROM c1)
               GROUP BY 1)"""]
    for r in range(2, KCENTER_K + 1):
        kc.append(f""",
        c{r} AS (SELECT vec_id AS v, d FROM m{r - 1}
                 ORDER BY d DESC, vec_id LIMIT 1),
        m{r} AS (SELECT m.vec_id, least(m.d, s.d) AS d
                 FROM m{r - 1} m JOIN (
                   SELECT e.vec_id,
                          sum((e.ec - c.ec) * (e.ec - c.ec)) AS d
                   FROM e JOIN e c ON c.dim = e.dim
                                  AND c.vec_id = (SELECT v FROM c{r})
                   GROUP BY 1) s ON s.vec_id = m.vec_id)""")
    sel = ["""
        SELECT * FROM (
          SELECT 1 AS sel_order, (SELECT v FROM c1) AS vec_id,
                 CAST(0 AS BIGINT) AS d2"""]
    sel += [f"""
          UNION ALL SELECT {r}, v, CAST(d AS BIGINT) FROM c{r}"""
            for r in range(2, KCENTER_K + 1)]
    out["sample_coreset_kcenter"] = ("".join(kc) + "".join(sel)
                                     + ") ORDER BY sel_order")
    mrr_q = ", ".join(f"({qi}, '{q.lower()}')"
                      for qi, q in enumerate(_BM25_QUERIES))
    out["ml_mrr"] = f"""
        WITH bm AS ({_bm25_sql().rsplit("ORDER BY", 1)[0]}),
        q(query_id, phrase) AS (VALUES {mrr_q}),
        cov AS (SELECT q.query_id, d.doc_id
                FROM documents d JOIN q
                  ON position(' ' || q.phrase || ' '
                              IN ' ' || lower(d.text) || ' ') > 0),
        fr AS (SELECT bm.query_id, min(bm.rank) AS r
               FROM bm JOIN cov ON cov.query_id = bm.query_id
                              AND cov.doc_id = bm.doc_id
               GROUP BY 1)
        SELECT q.query_id,
               CAST(coalesce(fr.r, 0) AS BIGINT) AS first_rank,
               CAST(CASE WHEN fr.r IS NULL THEN 0
                    ELSE 1000000 // fr.r END AS BIGINT) AS rr_fp
        FROM q LEFT JOIN fr ON fr.query_id = q.query_id
        ORDER BY q.query_id"""
    out["privacy_uniqueness_risk"] = f"""
        WITH c AS (SELECT lang, source, n_chars // {UNIQ_QI_BUCKET} AS b,
                          count(*) AS sz
                   FROM documents GROUP BY 1, 2, 3)
        SELECT CAST(count(*) AS BIGINT) AS n_classes,
               CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_unique_classes,
               CAST(sum(sz) AS BIGINT) AS n_records,
               CAST(1000000 * sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END)
                    // greatest(sum(sz), 1) AS BIGINT) AS risk_fp
        FROM c"""
    out["diag_zonemap_prune"] = f"""
        WITH l AS (SELECT l_orderkey, l_linenumber,
                          epoch_us(l_shipdate) // 86400000000 AS day
                   FROM lineitem),
        u AS (SELECT l_orderkey // {ZONEMAP_ORDERKEY_BLOCK} AS blk,
                     max(day) AS mx FROM l GROUP BY 1),
        r AS (SELECT day, row_number() OVER (
                ORDER BY day, l_orderkey, l_linenumber) - 1 AS rn FROM l),
        c AS (SELECT rn // {ZONEMAP_ROW_BLOCK} AS blk, max(day) AS mx
              FROM r GROUP BY 1),
        fu AS (SELECT count(*) AS n, sum(CASE WHEN mx < {ZONEMAP_CUTOFF_DAY}
                      THEN 1 ELSE 0 END) AS p FROM u),
        fc AS (SELECT count(*) AS n, sum(CASE WHEN mx < {ZONEMAP_CUTOFF_DAY}
                      THEN 1 ELSE 0 END) AS p FROM c)
        SELECT CAST(fu.n AS BIGINT) AS blocks_unclustered,
               CAST(fu.p AS BIGINT) AS pruned_unclustered,
               CAST(1000000 * fu.p // greatest(fu.n, 1) AS BIGINT)
                 AS prune_unclustered_fp,
               CAST(fc.n AS BIGINT) AS blocks_clustered,
               CAST(fc.p AS BIGINT) AS pruned_clustered,
               CAST(1000000 * fc.p // greatest(fc.n, 1) AS BIGINT)
                 AS prune_clustered_fp
        FROM fu, fc"""
    out["events_tumbling_dedup"] = """
        WITH e AS (SELECT event_id, user_id, event_type,
                          epoch_us(ts) // 600000000 AS win,
                          epoch_us(ts) AS ts_us
                   FROM events),
        r AS (SELECT e.*, row_number() OVER (
                PARTITION BY user_id, event_type, win
                ORDER BY ts_us, event_id) AS rn FROM e)
        SELECT event_id, user_id, event_type, CAST(win AS BIGINT) AS win
        FROM r WHERE rn = 1 ORDER BY event_id"""
    neg_list = ", ".join(f"'{p}'" for p in SPARQL_NEG_PREDS)
    out["kg_sparql_path_neg"] = P + f"""
        , tri AS (SELECT * FROM ({full_body}))
        SELECT subj AS s, CAST(count(*) AS BIGINT) AS n
        FROM tri WHERE pred NOT IN ({neg_list})
        GROUP BY 1 ORDER BY 1"""
    out["ml_cohens_kappa"] = f"""
        WITH f AS (SELECT
            CASE WHEN n_chars >= {KAPPA_CHAR_MIN} THEN 1 ELSE 0 END AS ra,
            CASE WHEN len(string_split(text, ' ')) >= {KAPPA_WORD_MIN}
                 THEN 1 ELSE 0 END AS rb
            FROM documents),
        c AS (SELECT sum(ra * rb) AS pp, sum(ra * (1 - rb)) AS pn,
                     sum((1 - ra) * rb) AS np_,
                     sum((1 - ra) * (1 - rb)) AS nn, count(*) AS n
              FROM f),
        k AS (SELECT *, (pp + pn) * (pp + np_) + (np_ + nn) * (pn + nn)
                          AS pe_num FROM c),
        d AS (SELECT *, n * (pp + nn) - pe_num AS num,
                     greatest(n * n - pe_num, 1) AS den FROM k)
        SELECT CAST(pp AS BIGINT) AS n_pp, CAST(pn AS BIGINT) AS n_pn,
               CAST(np_ AS BIGINT) AS n_np, CAST(nn AS BIGINT) AS n_nn,
               CAST(1000000 * num // den
                    - CASE WHEN (1000000 * num) % den <> 0 AND num < 0
                           THEN 1 ELSE 0 END AS BIGINT) AS kappa_fp
        FROM d"""
    out["ml_lift_deciles"] = """
        WITH s AS (SELECT doc_id, n_chars,
                          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
                          ntile(10) OVER (ORDER BY n_chars DESC, doc_id)
                            AS decile
                   FROM documents),
        t AS (SELECT count(*) AS n, sum(pos) AS p FROM s),
        h AS (SELECT decile, count(*) AS n_docs, sum(pos) AS n_pos
              FROM s GROUP BY 1),
        c AS (SELECT h.*, sum(n_docs) OVER (ORDER BY decile) AS cum_n,
                     sum(n_pos) OVER (ORDER BY decile) AS cum_pos
              FROM h)
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_pos AS BIGINT) AS n_pos,
               CAST(cum_pos AS BIGINT) AS cum_pos,
               CAST(1000000 * cum_pos * t.n
                    // (cum_n * greatest(t.p, 1)) AS BIGINT) AS lift_fp
        FROM c, t ORDER BY decile"""
    out["rel_theilsen_slope"] = """
        WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                          CAST(sum(CAST(round(o_totalprice * 100.0)
                                        AS BIGINT)) AS BIGINT) AS cents
                   FROM orders GROUP BY 1),
        p AS (SELECT (1000000 * (b.cents - a.cents)) // (b.day - a.day)
                     - CASE WHEN (1000000 * (b.cents - a.cents))
                                 % (b.day - a.day) <> 0
                                 AND b.cents < a.cents
                            THEN 1 ELSE 0 END AS sfp
              FROM d a JOIN d b ON b.day > a.day),
        o AS (SELECT sfp, row_number() OVER (ORDER BY sfp) - 1 AS rn,
                     count(*) OVER () AS np FROM p)
        SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
               CAST(max(np) AS BIGINT) AS n_pairs,
               CAST(max(CASE WHEN rn = (np - 1) // 2 THEN sfp END)
                    AS BIGINT) AS median_slope_fp
        FROM o"""
    out["events_windowed_topk"] = """
        WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          event_type, count(*) AS n
                   FROM events GROUP BY 1, 2),
        r AS (SELECT c.*, row_number() OVER (PARTITION BY day
                 ORDER BY n DESC, event_type) AS rank FROM c)
        SELECT CAST(day AS BIGINT) AS day, event_type,
               CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank
        FROM r WHERE rank <= 3 ORDER BY day, rank"""
    out["rel_iqr_outliers"] = """
        WITH c AS (SELECT o_orderpriority AS prio,
                          CAST(round(o_totalprice * 100.0) AS BIGINT)
                            AS cents
                   FROM orders),
        r AS (SELECT prio, cents, row_number() OVER (
                 PARTITION BY prio ORDER BY cents) - 1 AS rn,
                 count(*) OVER (PARTITION BY prio) AS n FROM c),
        q AS (SELECT prio, max(n) AS n,
                     max(CASE WHEN rn = (n - 1) // 4 THEN cents END)
                       AS q1_c,
                     max(CASE WHEN rn = 3 * (n - 1) // 4 THEN cents END)
                       AS q3_c
              FROM r GROUP BY 1),
        f AS (SELECT q.*, q1_c - 3 * (q3_c - q1_c) // 2 AS lo,
                     q3_c + 3 * (q3_c - q1_c) // 2 AS hi FROM q)
        SELECT f.prio AS o_orderpriority, CAST(f.n AS BIGINT) AS n,
               CAST(f.q1_c AS BIGINT) AS q1_c,
               CAST(f.q3_c AS BIGINT) AS q3_c,
               CAST(sum(CASE WHEN c.cents < f.lo OR c.cents > f.hi
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_out
        FROM f JOIN c ON c.prio = f.prio
        GROUP BY 1, 2, 3, 4 ORDER BY 1"""
    out["emb_norm_stats"] = """
        WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                          sum(CAST(floor(CAST(embedding[g.i] AS DOUBLE)
                                         * 1000) AS BIGINT)
                              * CAST(floor(CAST(embedding[g.i] AS DOUBLE)
                                           * 1000) AS BIGINT)) AS n2
                   FROM embeddings, generate_series(1, 64) AS g(i)
                   GROUP BY 1, 2)
        SELECT label, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n2) AS BIGINT) AS sum_norm2,
               CAST(min(n2) AS BIGINT) AS min_norm2,
               CAST(max(n2) AS BIGINT) AS max_norm2
        FROM e GROUP BY 1 ORDER BY 1"""
    out["ml_mcc"] = f"""
        WITH f AS (SELECT
            CASE WHEN n_chars >= {KAPPA_CHAR_MIN} THEN 1 ELSE 0 END AS p,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t
            FROM documents),
        c AS (SELECT sum(p * t) AS tp, sum(p * (1 - t)) AS fp,
                     sum((1 - p) * t) AS fn, sum((1 - p) * (1 - t)) AS tn
              FROM f),
        d AS (SELECT *, CAST(tp AS HUGEINT) * tn
                        - CAST(fp AS HUGEINT) * fn AS num,
                     greatest(CAST(tp + fp AS HUGEINT) * (tp + fn)
                              * (tn + fp) * (tn + fn), 1) AS den
              FROM c)
        SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
               CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
               CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1
                    ELSE 0 END AS BIGINT) AS mcc_sign,
               CAST(1000000 * num * num // den AS BIGINT) AS mcc2_fp
        FROM d"""
    out["kg_sparql_bind"] = f"""
        SELECT CAST(turn_idx // 5 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
        GROUP BY 1 ORDER BY 1"""
    pref_rows = ", ".join(f"({qi}, '{p_}')"
                          for qi, p_ in enumerate(PREFIX_QUERIES))
    out["search_prefix"] = f"""
        WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' '))
                     AS w FROM documents),
        q(query_id, pref) AS (VALUES {pref_rows}),
        h AS (SELECT q.query_id, w.doc_id
              FROM w JOIN q ON w.w LIKE q.pref || '%')
        SELECT q.query_id,
               CAST(count(DISTINCT h.doc_id) AS BIGINT) AS n_docs,
               CAST(count(h.doc_id) AS BIGINT) AS n_hits
        FROM q LEFT JOIN h ON h.query_id = q.query_id
        GROUP BY 1 ORDER BY 1"""
    gth = ", ".join(f"({t})" for t in GINI_THRESHOLDS)
    out["ml_gini_gain"] = f"""
        WITH t(thr) AS (VALUES {gth}),
        c AS (SELECT t.thr,
                sum(CASE WHEN d.n_chars < t.thr THEN 1 ELSE 0 END) AS nl,
                sum(CASE WHEN d.n_chars < t.thr AND d.lang = 'en'
                    THEN 1 ELSE 0 END) AS pl,
                sum(CASE WHEN d.n_chars >= t.thr THEN 1 ELSE 0 END) AS nr,
                sum(CASE WHEN d.n_chars >= t.thr AND d.lang = 'en'
                    THEN 1 ELSE 0 END) AS pr
              FROM documents d CROSS JOIN t GROUP BY 1),
        g AS (SELECT thr, nl, nr,
                CASE WHEN nl = 0 OR nr = 0 THEN CAST(0 AS HUGEINT) ELSE
                  1000000 * (
                    (CAST(nl + nr AS HUGEINT) * (nl + nr)
                     - (CAST(pl + pr AS HUGEINT) * (pl + pr)
                        + CAST(nl + nr - pl - pr AS HUGEINT)
                          * (nl + nr - pl - pr))) * nl * nr
                    - CAST(nl + nr AS HUGEINT) * (
                        nr * (CAST(nl AS HUGEINT) * nl
                              - (CAST(pl AS HUGEINT) * pl
                                 + CAST(nl - pl AS HUGEINT) * (nl - pl)))
                      + nl * (CAST(nr AS HUGEINT) * nr
                              - (CAST(pr AS HUGEINT) * pr
                                 + CAST(nr - pr AS HUGEINT)
                                   * (nr - pr)))))
                  // (CAST(nl + nr AS HUGEINT) * (nl + nr) * nl * nr)
                END AS gain
              FROM c)
        SELECT CAST(thr AS BIGINT) AS thr, CAST(nl AS BIGINT) AS n_left,
               CAST(nr AS BIGINT) AS n_right,
               CAST(gain AS BIGINT) AS gain_fp
        FROM g ORDER BY thr"""
    out["diag_equidepth_hist"] = f"""
        WITH c AS (SELECT CAST(round(l_extendedprice * 100.0) AS BIGINT)
                            AS cents, l_orderkey, l_linenumber
                   FROM lineitem),
        r AS (SELECT cents, row_number() OVER (
                 ORDER BY cents, l_orderkey, l_linenumber) - 1 AS rn,
                 count(*) OVER () AS n FROM c),
        b AS (SELECT DISTINCT (g.i * ((SELECT max(n) FROM r) - 1))
                              // {EQUIDEPTH_BUCKETS} AS rk
              FROM generate_series(0, {EQUIDEPTH_BUCKETS}) AS g(i)),
        p AS (SELECT r.rn, r.cents FROM r JOIN b ON b.rk = r.rn)
        SELECT CAST(row_number() OVER (ORDER BY rn) - 1 AS BIGINT)
                 AS bucket,
               CAST(rn AS BIGINT) AS rank, CAST(cents AS BIGINT) AS cents
        FROM p ORDER BY rank"""
    out["diag_fanout_hist"] = """
        WITH s AS (SELECT l_orderkey, count(*) AS fanout
                   FROM lineitem GROUP BY 1)
        SELECT CAST(fanout AS BIGINT) AS fanout,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM s GROUP BY 1 ORDER BY 1"""
    out["events_peak_hour_per_type"] = """
        WITH c AS (SELECT event_type,
                          CAST(hour(ts) AS BIGINT) AS hour,
                          count(*) AS n
                   FROM events GROUP BY 1, 2),
        r AS (SELECT c.*, row_number() OVER (PARTITION BY event_type
                 ORDER BY n DESC, hour) AS rn FROM c)
        SELECT event_type, hour, CAST(n AS BIGINT) AS n
        FROM r WHERE rn = 1 ORDER BY event_type"""
    out["events_next_best_action"] = """
        WITH o AS (SELECT user_id, event_type, lag(event_type) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id)
                     AS prev_type
                   FROM events),
        c AS (SELECT prev_type, event_type, count(*) AS n FROM o
              WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        r AS (SELECT c.*, row_number() OVER (PARTITION BY prev_type
                 ORDER BY n DESC, event_type) AS rn FROM c)
        SELECT prev_type, event_type, CAST(n AS BIGINT) AS n
        FROM r WHERE rn = 1 ORDER BY prev_type"""
    lc_th = ", ".join(f"({t})" for t in GINI_THRESHOLDS)
    lc_k = ", ".join(f"({k})" for k in range(1, LC_FRACTIONS + 1))
    out["ml_learning_curve"] = f"""
        WITH d AS (SELECT n_chars,
                          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
                          row_number() OVER (ORDER BY doc_id) - 1 AS rank,
                          count(*) OVER () AS n
                   FROM documents),
        t(thr) AS (VALUES {lc_th}), k(k) AS (VALUES {lc_k}),
        cells AS (SELECT k.k, t.thr, max(d.n) AS n,
                    max(d.n * k.k // {LC_FRACTIONS}) AS cut,
                    sum(CASE WHEN d.rank < d.n * k.k // {LC_FRACTIONS}
                             AND (CASE WHEN d.n_chars >= t.thr
                                  THEN 1 ELSE 0 END) <> d.pos
                             THEN 1 ELSE 0 END) AS mis_prefix,
                    sum(CASE WHEN (CASE WHEN d.n_chars >= t.thr
                                   THEN 1 ELSE 0 END) <> d.pos
                             THEN 1 ELSE 0 END) AS mis_full
                  FROM d CROSS JOIN t CROSS JOIN k GROUP BY 1, 2),
        pick AS (SELECT cells.*, row_number() OVER (PARTITION BY k
                   ORDER BY mis_prefix, thr) AS rn FROM cells)
        SELECT CAST(k AS BIGINT) AS k, CAST(cut AS BIGINT) AS n_train,
               CAST(thr AS BIGINT) AS best_thr,
               CAST(1000000 * (n - mis_full) // n AS BIGINT)
                 AS full_acc_fp
        FROM pick WHERE rn = 1 ORDER BY k"""
    dict_parts = []
    for col in DICT_GAIN_COLS:
        dict_parts.append(f"""
        SELECT '{col}' AS col, CAST(nr AS BIGINT) AS n_rows,
               CAST(nd AS BIGINT) AS n_distinct,
               CAST(raw AS BIGINT) AS raw_bytes,
               CAST(bits AS BIGINT) AS bits_per_value,
               CAST(1000000 * (raw - enc) // raw
                    - CASE WHEN (1000000 * (raw - enc)) % raw <> 0
                                AND raw < enc THEN 1 ELSE 0 END
                    AS BIGINT) AS gain_fp
        FROM (SELECT *, (nr * bits + 7) // 8 + db AS enc FROM (
          SELECT *, CASE WHEN nd = 1 THEN 0
                         ELSE length(bin(nd - 1)) END AS bits FROM (
            SELECT count(*) AS nd, sum(n) AS nr,
                   sum(len(v) * n) AS raw, sum(len(v)) AS db
            FROM (SELECT {col} AS v, count(*) AS n FROM part
                  GROUP BY 1))))""")
    out["diag_dict_encoding_gain"] = \
        " UNION ALL ".join(dict_parts) + " ORDER BY col"
    out["events_switchback_arms"] = """
        WITH e AS (SELECT epoch_us(ts) // 3600000000 % 2 AS arm,
                          CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END AS isp,
                          CAST(round(value * 100.0) AS BIGINT) AS cents
                   FROM events)
        SELECT CAST(arm AS BIGINT) AS arm, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(isp) AS BIGINT) AS n_purchase,
               CAST(sum(isp * cents) AS BIGINT) AS purchase_cents,
               CAST(1000000 * sum(isp) // count(*) AS BIGINT) AS conv_fp
        FROM e GROUP BY 1 ORDER BY 1"""
    out["search_autocomplete_top"] = """
        WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS word
                   FROM documents),
        f AS (SELECT word, count(*) AS n FROM w GROUP BY 1),
        p AS (SELECT substr(word, 1, 2) AS prefix, word, n,
                     row_number() OVER (PARTITION BY substr(word, 1, 2)
                        ORDER BY n DESC, word) AS rank
              FROM f)
        SELECT prefix, word, CAST(n AS BIGINT) AS n,
               CAST(rank AS BIGINT) AS rank
        FROM p WHERE rank <= 3 ORDER BY prefix, rank"""
    from .functions.cms import cms_row_seeds as _crs
    bs1, bs2 = _crs()[:2]
    out["diag_bloom_fpr"] = f"""
        WITH seeds(r, s) AS (VALUES (0, CAST('{int(bs1)}' AS UBIGINT)),
                                    (1, CAST('{int(bs2)}' AS UBIGINT))),
        ok AS (SELECT DISTINCT o_orderkey AS key FROM orders),
        pkk AS (SELECT DISTINCT p_partkey AS key FROM part),
        allk AS (SELECT 'b' AS tag, key FROM ok
                 UNION ALL SELECT 'm', key FROM pkk
                 UNION ALL SELECT 'n', key + {BLOOM_FPR_SHIFT} FROM pkk),
        base AS (SELECT tag, key, xor(CAST(key AS UBIGINT), s) AS kx
                 FROM allk CROSS JOIN seeds),
        {_splitmix_cte('base', 'kx', 'tag, key')},
        h AS (SELECT tag, key,
                     CAST(xor(z, z >> 31) % {BLOOM_FPR_M} AS BIGINT) AS pos
              FROM z2),
        pset AS (SELECT DISTINCT pos FROM h WHERE tag = 'b'),
        pr AS (SELECT tag, key,
                 CASE WHEN sum(CASE WHEN pos IN (SELECT pos FROM pset)
                               THEN 1 ELSE 0 END) = count(*)
                      THEN 1 ELSE 0 END AS pass
               FROM h WHERE tag <> 'b' GROUP BY 1, 2)
        SELECT CAST((SELECT count(*) FROM ok) AS BIGINT) AS n_keys,
               CAST((SELECT count(*) FROM pset) AS BIGINT) AS n_bits_set,
               CAST((SELECT count(*) FROM pr WHERE tag = 'm') AS BIGINT)
                 AS n_members_tested,
               CAST((SELECT sum(pass) FROM pr WHERE tag = 'm') AS BIGINT)
                 AS n_members_pass,
               CAST((SELECT count(*) FROM pr WHERE tag = 'n') AS BIGINT)
                 AS n_nonmembers_tested,
               CAST((SELECT sum(pass) FROM pr WHERE tag = 'n') AS BIGINT)
                 AS n_false_pos,
               CAST(1000000 * (SELECT sum(pass) FROM pr WHERE tag = 'n')
                    // greatest((SELECT count(*) FROM pr
                                 WHERE tag = 'n'), 1) AS BIGINT) AS fpr_fp
        """
    out["text_hapax_ratio"] = """
        WITH w AS (SELECT source, unnest(string_split(lower(text), ' '))
                     AS w FROM documents),
        c AS (SELECT source, w, count(*) AS n FROM w GROUP BY 1, 2)
        SELECT source, CAST(count(*) AS BIGINT) AS n_vocab,
               CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_hapax,
               CAST(sum(n) AS BIGINT) AS n_tokens,
               CAST(1000000 * sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                    // count(*) AS BIGINT) AS hapax_fp
        FROM c GROUP BY 1 ORDER BY 1"""
    out["ml_class_weights"] = """
        WITH c AS (SELECT CAST(label AS BIGINT) AS label, count(*) AS n
                   FROM embeddings GROUP BY 1),
        t AS (SELECT sum(n) AS total, count(*) AS k FROM c)
        SELECT label, CAST(n AS BIGINT) AS n,
               CAST(1000000 * t.total // (t.k * n) AS BIGINT) AS weight_fp
        FROM c, t ORDER BY label"""
    out["curation_dedup_savings"] = """
        WITH d AS (SELECT doc_id, source,
                          CAST(len(string_split(text, ' ')) AS BIGINT)
                            AS ntok,
                          min(doc_id) OVER (PARTITION BY text) AS keep
                   FROM documents)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN doc_id <> keep THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dropped,
               CAST(sum(CASE WHEN doc_id <> keep THEN ntok ELSE 0 END)
                    AS BIGINT) AS tokens_dropped,
               CAST(sum(CASE WHEN doc_id = keep THEN ntok ELSE 0 END)
                    AS BIGINT) AS tokens_kept
        FROM d GROUP BY 1 ORDER BY 1"""
    out["events_median_gap_per_type"] = """
        WITH o AS (SELECT event_type, user_id, epoch_us(ts) AS us,
                          lag(epoch_us(ts)) OVER (
                            PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts), event_id) AS prev
                   FROM events),
        g AS (SELECT event_type, (us - prev) // 1000000 AS gap FROM o
              WHERE prev IS NOT NULL),
        r AS (SELECT event_type, gap, row_number() OVER (
                 PARTITION BY event_type ORDER BY gap) - 1 AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n FROM g)
        SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps,
               CAST(max(CASE WHEN rn = (n - 1) // 2 THEN gap END)
                    AS BIGINT) AS median_gap_s
        FROM r GROUP BY 1 ORDER BY 1"""
    from .functions.normalize import normalize_sql as _nsql
    out["kg_blocking_quality"] = f"""
        WITH f AS (SELECT DISTINCT {_nsql('surface_form')} AS nf,
                          {_nsql('canonical')} AS nc
                   FROM read_parquet('{fdir}/vocab.parquet')),
        en AS (SELECT entity_id, {_nsql('label')} AS nm
               FROM read_parquet('{fdir}/entities.parquet')
               UNION
               SELECT entity_id, {_nsql('u.a')} AS nm
               FROM read_parquet('{fdir}/entities.parquet'),
                    unnest(aliases) AS u(a)),
        lab AS (SELECT entity_id, {_nsql('label')} AS nl
                FROM read_parquet('{fdir}/entities.parquet')),
        fp AS (SELECT DISTINCT nf, '#' || nf || '#' AS p FROM f),
        fg AS (SELECT DISTINCT nf, substr(p, t.i, 3) AS g
               FROM fp, unnest(generate_series(
                   1, greatest(len(p) - 2, 1))) AS t(i)),
        ep AS (SELECT entity_id, '#' || nm || '#' AS p FROM en),
        eg AS (SELECT DISTINCT entity_id, substr(p, t.i, 3) AS g
               FROM ep, unnest(generate_series(
                   1, greatest(len(p) - 2, 1))) AS t(i)),
        cand AS (SELECT DISTINCT fg.nf, eg.entity_id
                 FROM fg JOIN eg USING (g)),
        tp AS (SELECT DISTINCT f.nf, lab.entity_id
               FROM f JOIN lab ON lab.nl = f.nc),
        nums AS (SELECT
            (SELECT count(DISTINCT nf) FROM f) AS n_forms,
            (SELECT count(*) FROM
               read_parquet('{fdir}/entities.parquet')) AS n_entities,
            (SELECT count(*) FROM tp) AS n_true,
            (SELECT count(*) FROM cand) AS n_candidates,
            (SELECT count(*) FROM tp WHERE EXISTS (
                SELECT 1 FROM cand WHERE cand.nf = tp.nf
                  AND cand.entity_id = tp.entity_id)) AS covered)
        SELECT CAST(n_forms AS BIGINT) AS n_forms,
               CAST(n_entities AS BIGINT) AS n_entities,
               CAST(n_true AS BIGINT) AS n_true,
               CAST(n_candidates AS BIGINT) AS n_candidates,
               CAST(covered AS BIGINT) AS n_true_covered,
               CAST(1000000 * covered // greatest(n_true, 1) AS BIGINT)
                 AS completeness_fp,
               CAST(1000000 * (n_forms * n_entities - n_candidates)
                    // greatest(n_forms * n_entities, 1) AS BIGINT)
                 AS reduction_fp
        FROM nums"""
    out["sample_neyman_alloc"] = f"""
        WITH m AS (SELECT o_orderpriority AS prio, count(*) AS n,
                          sum(CAST(round(o_totalprice * 100.0) AS BIGINT)
                              // 1000) AS sx,
                          sum((CAST(round(o_totalprice * 100.0) AS BIGINT)
                               // 1000)
                              * (CAST(round(o_totalprice * 100.0)
                                      AS BIGINT) // 1000)) AS sx2
                   FROM orders GROUP BY 1),
        v AS (SELECT prio, n, n * sx2 - sx * sx AS var FROM m),
        w0 AS (SELECT *, CAST(floor(sqrt(CAST(var AS DOUBLE)))
                              AS BIGINT) AS s0 FROM v),
        w AS (SELECT prio, n,
                     s0 - CASE WHEN s0 * s0 > var THEN 1 ELSE 0 END
                        + CASE WHEN (s0 + 1) * (s0 + 1) <= var
                               THEN 1 ELSE 0 END AS w
              FROM w0),
        t AS (SELECT sum(w) AS tw FROM w),
        fl AS (SELECT w.prio, w.n, w.w,
                      {NEYMAN_BUDGET} * w.w // t.tw AS fa,
                      {NEYMAN_BUDGET} * w.w
                        - ({NEYMAN_BUDGET} * w.w // t.tw) * t.tw AS rem
               FROM w, t),
        lv AS (SELECT {NEYMAN_BUDGET} - sum(fa) AS leftover FROM fl),
        rk AS (SELECT fl.*, row_number() OVER (
                 ORDER BY rem DESC, prio) AS rnk FROM fl)
        SELECT rk.prio AS o_orderpriority, CAST(rk.n AS BIGINT) AS n_h,
               CAST(rk.w AS BIGINT) AS w,
               CAST(rk.fa + CASE WHEN rk.rnk <= lv.leftover
                            THEN 1 ELSE 0 END AS BIGINT) AS alloc
        FROM rk, lv ORDER BY o_orderpriority"""
    out["rel_gap_interpolate"] = """
        WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                          CAST(sum(CAST(round(o_totalprice * 100.0)
                                        AS BIGINT)) AS BIGINT) AS cents
                   FROM orders GROUP BY 1),
        sp AS (SELECT unnest(generate_series(
                 (SELECT min(day) FROM d),
                 (SELECT max(day) FROM d))) AS day),
        j AS (SELECT sp.day, d.cents FROM sp LEFT JOIN d USING (day)),
        a AS (SELECT j.day, j.cents,
                     (SELECT max(day) FROM d WHERE d.day <= j.day) AS p,
                     (SELECT min(day) FROM d WHERE d.day >= j.day) AS q
              FROM j),
        v AS (SELECT a.day,
                     CASE WHEN a.cents IS NOT NULL THEN a.cents
                     ELSE (SELECT cents FROM d WHERE d.day = a.p)
                          + ((SELECT cents FROM d WHERE d.day = a.q)
                             - (SELECT cents FROM d WHERE d.day = a.p))
                            * (a.day - a.p) // (a.q - a.p)
                          - CASE WHEN ((SELECT cents FROM d
                                        WHERE d.day = a.q)
                                       - (SELECT cents FROM d
                                          WHERE d.day = a.p))
                                      * (a.day - a.p) % (a.q - a.p) <> 0
                                  AND (SELECT cents FROM d
                                       WHERE d.day = a.q)
                                      < (SELECT cents FROM d
                                         WHERE d.day = a.p)
                                 THEN 1 ELSE 0 END
                     END AS cents,
                     CASE WHEN a.cents IS NULL THEN 1 ELSE 0 END AS interp
              FROM a)
        SELECT CAST(day AS BIGINT) AS day, CAST(cents AS BIGINT) AS cents,
               CAST(interp AS BIGINT) AS interpolated
        FROM v ORDER BY day"""
    out["rel_running_balance"] = """
        WITH l AS (SELECT l_partkey, CAST(round(l_quantity) AS BIGINT)
                          * CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END
                            AS delta,
                          epoch_us(l_shipdate) // 86400000000 AS day,
                          l_orderkey, l_linenumber
                   FROM lineitem),
        r AS (SELECT l_partkey,
                     sum(delta) OVER (PARTITION BY l_partkey
                        ORDER BY day, l_orderkey, l_linenumber
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS bal,
                     row_number() OVER (PARTITION BY l_partkey
                        ORDER BY day, l_orderkey, l_linenumber) AS rn
              FROM l)
        SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
               CAST(count(*) AS BIGINT) AS n_moves,
               CAST(max_by(bal, rn) AS BIGINT) AS final_balance,
               CAST(min(bal) AS BIGINT) AS min_balance
        FROM r GROUP BY 1 ORDER BY 1"""
    norm_expr = _nsql("text")
    out["dedup_normalized"] = f"""
        WITH n AS (SELECT doc_id, {norm_expr} AS nt FROM documents),
        g AS (SELECT nt, CAST(count(*) AS BIGINT) AS n_dups,
                     CAST(min(doc_id) AS BIGINT) AS keep_doc_id
              FROM n GROUP BY 1)
        SELECT md5(nt) AS norm_hash, n_dups, keep_doc_id
        FROM g ORDER BY norm_hash"""
    out["emb_triplet_accuracy"] = """
        WITH m AS (SELECT vec_id, CAST(label AS BIGINT) AS label
                   FROM embeddings),
        t AS (SELECT a.vec_id AS a,
                coalesce((SELECT min(b.vec_id) FROM m b
                          WHERE b.label = a.label AND b.vec_id > a.vec_id),
                         (SELECT min(b.vec_id) FROM m b
                          WHERE b.label = a.label)) AS pos,
                coalesce((SELECT min(b.vec_id) FROM m b
                          WHERE b.label <> a.label
                            AND b.vec_id > a.vec_id),
                         (SELECT min(b.vec_id) FROM m b
                          WHERE b.label <> a.label)) AS neg
              FROM m a),
        s AS (SELECT t.a,
                round(list_cosine_similarity(
                  CAST(ea.embedding AS DOUBLE[]),
                  CAST(ep.embedding AS DOUBLE[])), 6) AS cp,
                round(list_cosine_similarity(
                  CAST(ea.embedding AS DOUBLE[]),
                  CAST(en.embedding AS DOUBLE[])), 6) AS cn
              FROM t JOIN embeddings ea ON ea.vec_id = t.a
                     JOIN embeddings ep ON ep.vec_id = t.pos
                     JOIN embeddings en ON en.vec_id = t.neg)
        SELECT CAST(count(*) AS BIGINT) AS n_triplets,
               CAST(sum(CASE WHEN cp > cn THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_wins,
               CAST(1000000 * sum(CASE WHEN cp > cn THEN 1 ELSE 0 END)
                    // greatest(count(*), 1) AS BIGINT) AS acc_fp
        FROM s"""
    out["kg_ego_subgraph"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        e AS (SELECT subj, pred, obj FROM tri WHERE NOT obj_is_literal),
        seed AS (SELECT min(obj) AS s FROM e
                 WHERE pred = '{C.PRED_SAME_AS}'),
        n1 AS (SELECT DISTINCT n FROM (
                 SELECT subj AS n FROM e, seed WHERE e.obj = seed.s
                 UNION SELECT obj FROM e, seed WHERE e.subj = seed.s
                 UNION SELECT s FROM seed)),
        n2 AS (SELECT DISTINCT n FROM (
                 SELECT e.subj AS n FROM e JOIN n1 ON e.obj = n1.n
                 UNION SELECT e.obj FROM e JOIN n1 ON e.subj = n1.n
                 UNION SELECT n FROM n1))
        SELECT subj, pred, obj FROM e
        WHERE subj IN (SELECT n FROM n2) AND obj IN (SELECT n FROM n2)
        ORDER BY subj, pred, obj"""
    sel_conds = {
        "returnflag_R": "l_returnflag = 'R'",
        "ship_1995_plus": "epoch_us(l_shipdate) // 86400000000 >= 9131",
        "qty_ge_25": "round(l_quantity) >= 25",
        "disc_gt_5pct": "round(l_discount * 100) > 5",
        "combo_R_and_qty": "l_returnflag = 'R' AND round(l_quantity) >= 25",
    }
    out["diag_selectivity_profile"] = " UNION ALL ".join(f"""
        SELECT '{name}' AS pred,
               CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_match,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(1000000 * sum(CASE WHEN {cond} THEN 1 ELSE 0 END)
                    // count(*) AS BIGINT) AS sel_fp
        FROM lineitem""" for name, cond in sel_conds.items()) \
        + " ORDER BY pred"
    out["emb_quantization_error"] = """
        WITH e AS (SELECT vec_id, g.i AS dim,
                          CAST(floor(CAST(embedding[g.i] AS DOUBLE)
                                     * 1000000) AS BIGINT) AS ec
                   FROM embeddings, generate_series(1, 64) AS g(i)),
        mm AS (SELECT dim, min(ec) AS mn,
                      greatest(max(ec) - min(ec), 1) AS rng
               FROM e GROUP BY 1),
        q AS (SELECT e.vec_id, e.ec,
                     mm.mn + (e.ec - mm.mn) * 255 // mm.rng
                             * mm.rng // 255 AS deq
              FROM e JOIN mm USING (dim))
        SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
               CAST(sum((ec - deq) * (ec - deq)) AS BIGINT) AS sse,
               CAST(max(abs(ec - deq)) AS BIGINT) AS max_abs_err
        FROM q"""
    out["sample_block_bootstrap"] = f"""
        WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                          CAST(sum(CAST(round(o_totalprice * 100.0)
                                        AS BIGINT)) AS BIGINT) AS cents
                   FROM orders GROUP BY 1),
        sp AS (SELECT unnest(generate_series(
                 (SELECT min(day) FROM d),
                 (SELECT max(day) FROM d))) AS day),
        vv AS (SELECT sp.day, coalesce(dd.cents, 0) AS cents
               FROM sp LEFT JOIN d dd USING (day)),
        par AS (SELECT (SELECT max(day) - min(day) + 1 FROM d)
                         - {BOOT_BLOCK_DAYS - 1} AS n_starts,
                       (SELECT min(day) FROM d) AS d0),
        ii AS (SELECT unnest(generate_series(0, {BOOT_N_BLOCKS - 1}))
                 AS bi),
        base AS (SELECT bi, CAST(bi AS UBIGINT) AS kx FROM ii),
        {_splitmix_cte('base', 'kx', 'bi')},
        h AS (SELECT bi, xor(z, z >> 31) AS hv FROM z2),
        dr AS (SELECT h.bi, CAST(h.hv % CAST(par.n_starts AS UBIGINT)
                                 AS BIGINT) AS st
               FROM h, par),
        sel AS (SELECT dr.bi, vv.cents
                FROM dr CROSS JOIN par
                JOIN vv ON vv.day >= par.d0 + dr.st
                       AND vv.day < par.d0 + dr.st + {BOOT_BLOCK_DAYS})
        SELECT CAST({BOOT_N_BLOCKS} AS BIGINT) AS n_blocks,
               CAST({BOOT_N_BLOCKS * BOOT_BLOCK_DAYS} AS BIGINT) AS n_days,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               CAST(sum(cents) // {BOOT_N_BLOCKS * BOOT_BLOCK_DAYS}
                    AS BIGINT) AS mean_cents
        FROM sel"""
    out["ml_wilson_ci"] = """
        WITH c AS (SELECT source, count(*) AS n,
                          sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                            AS s
                   FROM documents GROUP BY 1),
        v AS (SELECT *, (CAST(1000000000000 AS HUGEINT)
                         * (s * (n - s) + n)) // n AS arg FROM c),
        t0 AS (SELECT *, CAST(floor(sqrt(CAST(arg AS DOUBLE)))
                              AS HUGEINT) AS s0 FROM v),
        t AS (SELECT *, s0 - CASE WHEN s0 * s0 > arg THEN 1 ELSE 0 END
                        + CASE WHEN (s0 + 1) * (s0 + 1) <= arg
                               THEN 1 ELSE 0 END AS tt FROM t0)
        SELECT source, CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS s,
               CAST((1000000 * (s + 2) - 2 * tt) // (n + 4) AS BIGINT)
                 AS lo_fp,
               CAST((1000000 * (s + 2) + 2 * tt) // (n + 4) AS BIGINT)
                 AS hi_fp
        FROM t ORDER BY source"""
    out["text_rank_drift"] = f"""
        WITH w AS (SELECT source, unnest(string_split(lower(text), ' '))
                     AS w FROM documents),
        cc AS (SELECT source, w, count(*) AS n FROM w GROUP BY 1, 2),
        ss AS (SELECT DISTINCT source FROM documents
               ORDER BY source LIMIT 2),
        ab AS (SELECT min(source) AS a, max(source) AS b FROM ss),
        voc AS (SELECT w,
                  coalesce(sum(CASE WHEN cc.source = (SELECT a FROM ab)
                               THEN n END), 0) AS na,
                  coalesce(sum(CASE WHEN cc.source = (SELECT b FROM ab)
                               THEN n END), 0) AS nb
                FROM cc WHERE source IN (SELECT source FROM ss)
                GROUP BY 1),
        top AS (SELECT w, na, nb FROM voc
                ORDER BY na + nb DESC, w LIMIT {RANK_DRIFT_K}),
        ra AS (SELECT w, row_number() OVER (ORDER BY na DESC, w) AS r
               FROM top),
        rb AS (SELECT w, row_number() OVER (ORDER BY nb DESC, w) AS r
               FROM top),
        dd AS (SELECT ra.r - rb.r AS d FROM ra JOIN rb USING (w)),
        kk AS (SELECT count(*) AS k, sum(d * d) AS sd2 FROM dd)
        SELECT (SELECT a FROM ab) AS source_a,
               (SELECT b FROM ab) AS source_b,
               CAST(k AS BIGINT) AS k, CAST(sd2 AS BIGINT) AS sum_d2,
               CAST(1000000 * (k * (k * k - 1) - 6 * sd2)
                      // (k * (k * k - 1))
                    - CASE WHEN (1000000 * (k * (k * k - 1) - 6 * sd2))
                                % (k * (k * k - 1)) <> 0
                            AND k * (k * k - 1) < 6 * sd2
                           THEN 1 ELSE 0 END AS BIGINT) AS rho_fp
        FROM kk"""
    out["emb_split_drift"] = """
        WITH e AS (SELECT vec_id % 2 AS par, CAST(label AS BIGINT)
                     AS label, g.i AS dim,
                          CAST(floor(CAST(embedding[g.i] AS DOUBLE)
                                     * 1000000) AS BIGINT) AS ec
                   FROM embeddings, generate_series(1, 64) AS g(i)),
        s AS (SELECT label, par, dim, sum(ec) AS sm, count(*) AS cnt
              FROM e GROUP BY 1, 2, 3),
        j AS (SELECT a.label, a.dim, a.sm AS se, b.sm AS so,
                     a.cnt AS ne, b.cnt AS no
              FROM s a JOIN s b ON a.label = b.label AND a.dim = b.dim
                               AND a.par = 0 AND b.par = 1),
        agg AS (SELECT label, max(ne) AS ne, max(no) AS no,
                  sum((CAST(se AS HUGEINT) * no
                       - CAST(so AS HUGEINT) * ne)
                      * (CAST(se AS HUGEINT) * no
                         - CAST(so AS HUGEINT) * ne)) AS num
                FROM j GROUP BY 1)
        SELECT label, CAST(ne AS BIGINT) AS n_even,
               CAST(no AS BIGINT) AS n_odd,
               CAST(CAST(1000000 AS HUGEINT) * num
                    // (CAST(ne AS HUGEINT) * ne * no * no) AS BIGINT)
                 AS dist2_fp
        FROM agg ORDER BY label"""
    out["ml_brier_score"] = """
        WITH mm AS (SELECT min(n_chars) AS mn,
                           greatest(max(n_chars) - min(n_chars), 1)
                             AS rng
                    FROM documents),
        e AS (SELECT 1000000 * (n_chars - mm.mn) // mm.rng
                     - CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS d
              FROM documents, mm)
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(d * d) AS BIGINT) AS brier_sum,
               CAST(sum(d * d) // count(*) AS BIGINT) AS brier_fp
        FROM e"""
    out["kg_pred_fanout_p99"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        fo AS (SELECT pred, subj, count(*) AS fanout FROM tri
               GROUP BY 1, 2),
        r AS (SELECT pred, fanout, row_number() OVER (
                 PARTITION BY pred ORDER BY fanout) - 1 AS rn,
                 count(*) OVER (PARTITION BY pred) AS n FROM fo)
        SELECT pred, CAST(max(n) AS BIGINT) AS n_subjects,
               CAST(max(CASE WHEN rn = 99 * (n - 1) // 100
                        THEN fanout END) AS BIGINT) AS p99_fanout
        FROM r GROUP BY 1 ORDER BY 1"""
    out["events_haar_energy"] = """
        WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          count(*) AS n FROM events GROUP BY 1),
        sp AS (SELECT unnest(generate_series(
                 (SELECT min(day) FROM d),
                 (SELECT max(day) FROM d))) AS day),
        v AS (SELECT sp.day - (SELECT min(day) FROM d) AS i,
                     coalesce(d.n, 0) AS c
              FROM sp LEFT JOIN d USING (day)),
        l1 AS (SELECT i // 2 AS j,
                      max(CASE WHEN i % 2 = 0 THEN c END) AS a,
                      max(CASE WHEN i % 2 = 1 THEN c END) AS b
               FROM v GROUP BY 1),
        l1c AS (SELECT j, a, b FROM l1
                WHERE a IS NOT NULL AND b IS NOT NULL),
        e1 AS (SELECT coalesce(sum((a - b) * (a - b)), 0) AS e FROM l1c),
        s1 AS (SELECT j, a + b AS c FROM l1c),
        l2 AS (SELECT j // 2 AS k,
                      max(CASE WHEN j % 2 = 0 THEN c END) AS a,
                      max(CASE WHEN j % 2 = 1 THEN c END) AS b
               FROM s1 GROUP BY 1),
        l2c AS (SELECT * FROM l2
                WHERE a IS NOT NULL AND b IS NOT NULL),
        e2 AS (SELECT coalesce(sum((a - b) * (a - b)), 0) AS e FROM l2c)
        SELECT CAST((SELECT max(day) - min(day) + 1 FROM d) AS BIGINT)
                 AS n_days,
               CAST(e1.e AS BIGINT) AS e1, CAST(e2.e AS BIGINT) AS e2
        FROM e1, e2"""
    out["rel_kendall_tau"] = """
        WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                          sum(CAST(round(o_totalprice * 100.0)
                                   AS BIGINT)) AS cents,
                          count(*) AS n
                   FROM orders GROUP BY 1),
        p AS (SELECT sign(b.cents - a.cents) * sign(b.n - a.n) AS s
              FROM d a JOIN d b ON b.day > a.day),
        k AS (SELECT count(*) AS n0,
                     sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS c,
                     sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS dd
              FROM p)
        SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
               CAST(c AS BIGINT) AS concordant,
               CAST(dd AS BIGINT) AS discordant,
               CAST(1000000 * (c - dd) // n0
                    - CASE WHEN (1000000 * (c - dd)) % n0 <> 0
                                AND c < dd THEN 1 ELSE 0 END AS BIGINT)
                 AS tau_fp
        FROM k"""
    out["kg_sameas_rewrite"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        sa AS (SELECT subj AS mention, obj AS entity FROM tri
               WHERE pred = '{C.PRED_SAME_AS}'),
        m AS (SELECT obj AS mention FROM tri
              WHERE pred = '{C.PRED_MENTIONS}')
        SELECT sa.entity, CAST(count(*) AS BIGINT) AS n
        FROM m JOIN sa USING (mention) GROUP BY 1 ORDER BY 1"""
    out["ml_point_biserial"] = """
        WITH m AS (SELECT count(*) AS n,
                          sum(n_chars) AS sx,
                          sum(CAST(n_chars AS HUGEINT) * n_chars) AS sx2,
                          sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                            AS sy,
                          sum(CASE WHEN lang = 'en' THEN n_chars
                              ELSE 0 END) AS sxy
                   FROM documents),
        d AS (SELECT n, CAST(n AS HUGEINT) * sxy
                        - CAST(sx AS HUGEINT) * sy AS num,
                     CAST(n AS HUGEINT) * sx2
                        - CAST(sx AS HUGEINT) * sx AS vx,
                     CAST(n AS HUGEINT) * sy
                        - CAST(sy AS HUGEINT) * sy AS vy
              FROM m)
        SELECT CAST(n AS BIGINT) AS n,
               CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1
                    ELSE 0 END AS BIGINT) AS sign,
               CAST(1000000 * num * num
                    // greatest(vx * vy, 1) AS BIGINT) AS r2_fp
        FROM d"""
    out["events_hysteresis_alarms"] = f"""
        WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                          CAST(round(value * 100.0) AS BIGINT) AS cents
                   FROM events),
        b AS (SELECT *, CASE WHEN cents > {ALARM_HI_CENTS}
                        THEN 1 ELSE 0 END AS ishi
              FROM o WHERE cents > {ALARM_HI_CENTS}
                 OR cents < {ALARM_LO_CENTS}),
        l AS (SELECT *, lag(ishi) OVER (PARTITION BY user_id
                 ORDER BY us, event_id) AS prev FROM b)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(sum(CASE WHEN ishi = 1
                             AND (prev IS NULL OR prev = 0)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms
        FROM l GROUP BY 1
        HAVING sum(CASE WHEN ishi = 1 AND (prev IS NULL OR prev = 0)
                   THEN 1 ELSE 0 END) > 0
        ORDER BY 1"""
    out["dedup_weighted_jaccard"] = f"""
        WITH docs AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                      FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                              FOR i IN range(1, len(ws) - 1)]) AS s
               FROM docs),
        df AS (SELECT s, count(*) AS df FROM sh GROUP BY 1),
        w AS (SELECT s, 1000000 // df AS w FROM df),
        tot AS (SELECT sh.doc_id, sum(w.w) AS tw
                FROM sh JOIN w USING (s) GROUP BY 1),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         sum(w.w) AS wi
                  FROM sh a JOIN sh b ON a.s = b.s
                                     AND a.doc_id < b.doc_id
                  JOIN w ON w.s = a.s GROUP BY 1, 2)
        SELECT doc_a, doc_b, CAST(wi AS BIGINT) AS w,
               CAST(1000000 * wi // (ta.tw + tb.tw - wi) AS BIGINT)
                 AS wj_fp
        FROM inter JOIN tot ta ON ta.doc_id = doc_a
                   JOIN tot tb ON tb.doc_id = doc_b
        WHERE 1000000 * wi // (ta.tw + tb.tw - wi)
              >= {WJ_THRESHOLD_FP}
        ORDER BY doc_a, doc_b"""
    out["rel_ledger_reconcile"] = """
        WITH ls AS (SELECT l_orderkey AS ok,
                           sum(CAST(floor(l_extendedprice
                                          * (1 - l_discount)
                                          * (1 + l_tax) * 100.0 + 0.5)
                                    AS BIGINT)) AS line_cents
                    FROM lineitem GROUP BY 1),
        j AS (SELECT ls.line_cents,
                     CAST(round(o.o_totalprice * 100.0) AS BIGINT)
                       - ls.line_cents AS d
              FROM ls JOIN orders o ON o.o_orderkey = ls.ok)
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_over,
               CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_under,
               CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_exact,
               CAST(sum(abs(d)) AS BIGINT) AS abs_diff_cents
        FROM j"""
    out["events_new_vs_returning"] = """
        WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
                   FROM events),
        f AS (SELECT user_id, min(day) AS fd FROM e GROUP BY 1)
        SELECT CAST(e.day AS BIGINT) AS day,
               CAST(sum(CASE WHEN e.day = f.fd THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(sum(CASE WHEN e.day <> f.fd THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_returning
        FROM e JOIN f USING (user_id) GROUP BY 1 ORDER BY 1"""
    spell_rows = ", ".join(f"('{q}')" for q in SPELL_QUERIES)
    out["search_spell_suggest"] = f"""
        WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS word
                   FROM documents),
        f AS (SELECT word, count(*) AS n FROM w GROUP BY 1),
        q(query) AS (VALUES {spell_rows}),
        cand AS (SELECT q.query, f.word, f.n,
                        row_number() OVER (PARTITION BY q.query
                           ORDER BY f.n DESC, f.word) AS rn
                 FROM q JOIN f ON levenshtein(q.query, f.word) <= 1)
        SELECT q.query, coalesce(c.word, '') AS suggestion,
               CAST(coalesce(c.n, 0) AS BIGINT) AS n
        FROM q LEFT JOIN cand c ON c.query = q.query AND c.rn = 1
        ORDER BY q.query"""
    out["privacy_min_k_report"] = f"""
        WITH c AS (SELECT lang, source, n_chars // {MINK_QI_BUCKET}
                            AS bucket, count(*) AS sz
                   FROM documents GROUP BY 1, 2, 3),
        r AS (SELECT c.*, row_number() OVER (
                 ORDER BY sz, lang, source, bucket) AS rank FROM c)
        SELECT lang, source, CAST(bucket AS BIGINT) AS bucket,
               CAST(sz AS BIGINT) AS sz, CAST(rank AS BIGINT) AS rank
        FROM r WHERE rank <= 5 ORDER BY rank"""
    out["rel_date_fk_audit"] = """
        WITH j AS (SELECT CAST(year(l.l_shipdate) AS BIGINT) AS year,
                          CASE WHEN epoch_us(l.l_shipdate)
                                    // 86400000000
                                  < epoch_us(o.o_orderdate)
                                    // 86400000000
                               THEN 1 ELSE 0 END AS v
                   FROM lineitem l
                   JOIN orders o ON o.o_orderkey = l.l_orderkey)
        SELECT year, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS n_viol
        FROM j GROUP BY 1 ORDER BY 1"""
    out["ml_permutation_importance"] = f"""
        WITH r AS (SELECT n_chars,
                          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                          row_number() OVER (ORDER BY doc_id) - 1 AS rk,
                          count(*) OVER () AS n
                   FROM documents),
        s AS (SELECT r1.n, r1.n_chars AS x, r1.y, r2.n_chars AS xs
              FROM r r1 JOIN r r2 ON r2.rk = (r1.rk + 1) % r1.n),
        a AS (SELECT max(n) AS n,
                     1000000 * sum(CASE WHEN (x >= {KAPPA_CHAR_MIN})
                                        = (y = 1) THEN 1 ELSE 0 END)
                       // count(*) AS at,
                     1000000 * sum(CASE WHEN (xs >= {KAPPA_CHAR_MIN})
                                        = (y = 1) THEN 1 ELSE 0 END)
                       // count(*) AS ash
              FROM s)
        SELECT CAST(n AS BIGINT) AS n, CAST(at AS BIGINT) AS acc_fp,
               CAST(ash AS BIGINT) AS acc_shifted_fp,
               CAST(at - ash AS BIGINT) AS drop_fp
        FROM a"""
    out["events_mann_kendall"] = """
        WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          count(*) AS n FROM events GROUP BY 1),
        p AS (SELECT sign(b.n - a.n) AS s FROM d a
              JOIN d b ON b.day > a.day),
        t AS (SELECT n AS v, count(*) AS t FROM d GROUP BY 1),
        ties AS (SELECT coalesce(sum(CASE WHEN t > 1
                      THEN t * (t - 1) * (2 * t + 5) ELSE 0 END), 0)
                   AS tt FROM t),
        k AS (SELECT count(*) AS n FROM d)
        SELECT CAST(k.n AS BIGINT) AS n_days,
               CAST((SELECT sum(s) FROM p) AS BIGINT) AS s,
               CAST(k.n * (k.n - 1) * (2 * k.n + 5) - ties.tt AS BIGINT)
                 AS var18
        FROM k, ties"""
    out["emb_isotropy"] = """
        WITH e AS (SELECT vec_id, g.i AS dim,
                          CAST(floor(CAST(embedding[g.i] AS DOUBLE)
                                     * 1000000) AS BIGINT) AS ec
                   FROM embeddings, generate_series(1, 64) AS g(i)),
        s AS (SELECT dim, CAST(sum(ec) AS HUGEINT) AS s,
                     sum(CAST(ec AS HUGEINT) * ec) AS n2
              FROM e GROUP BY 1),
        k AS (SELECT count(DISTINCT vec_id) AS n FROM e),
        f AS (SELECT (SELECT sum(s * s) FROM s)
                     - (SELECT sum(n2) FROM s) AS tot,
                     k.n AS n FROM k)
        SELECT CAST(n AS BIGINT) AS n_vecs,
               CAST(tot // (CAST(n AS HUGEINT) * (n - 1) * 1000000)
                    - CASE WHEN tot % (CAST(n AS HUGEINT) * (n - 1)
                                       * 1000000) <> 0 AND tot < 0
                           THEN 1 ELSE 0 END AS BIGINT) AS mean_dot_fp
        FROM f"""
    out["rel_hierarchical_alloc"] = f"""
        WITH rev AS (SELECT n.n_regionkey AS rk, n.n_nationkey AS nk,
                            sum(CAST(round(o.o_totalprice * 100.0)
                                     AS BIGINT)) AS cents
                     FROM orders o
                     JOIN customer c ON c.c_custkey = o.o_custkey
                     JOIN nation n ON n.n_nationkey = c.c_nationkey
                     GROUP BY 1, 2),
        reg AS (SELECT rk, sum(cents) AS rc FROM rev GROUP BY 1),
        t1 AS (SELECT sum(rc) AS tw FROM reg),
        f1 AS (SELECT reg.rk, reg.rc,
                      {HIER_BUDGET} * reg.rc // t1.tw AS fa,
                      {HIER_BUDGET} * reg.rc
                        - ({HIER_BUDGET} * reg.rc // t1.tw) * t1.tw
                        AS rem
               FROM reg, t1),
        l1 AS (SELECT {HIER_BUDGET} - sum(fa) AS leftover FROM f1),
        r1 AS (SELECT f1.*, row_number() OVER (ORDER BY rem DESC, rk)
                 AS rnk FROM f1),
        ra AS (SELECT r1.rk, fa + CASE WHEN rnk <= l1.leftover
                                  THEN 1 ELSE 0 END AS ralloc
               FROM r1, l1),
        t2 AS (SELECT rk, sum(cents) AS tw FROM rev GROUP BY 1),
        f2 AS (SELECT rev.rk, rev.nk, rev.cents, ra.ralloc,
                      ra.ralloc * rev.cents // t2.tw AS fa,
                      ra.ralloc * rev.cents
                        - (ra.ralloc * rev.cents // t2.tw) * t2.tw
                        AS rem
               FROM rev JOIN ra USING (rk) JOIN t2 USING (rk)),
        l2 AS (SELECT rk, max(ralloc) - sum(fa) AS leftover
               FROM f2 GROUP BY 1),
        r2 AS (SELECT f2.*, row_number() OVER (PARTITION BY rk
                 ORDER BY rem DESC, nk) AS rnk FROM f2)
        SELECT CAST(r2.rk AS BIGINT) AS regionkey,
               CAST(r2.nk AS BIGINT) AS nationkey,
               CAST(r2.cents AS BIGINT) AS cents,
               CAST(fa + CASE WHEN rnk <= l2.leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc
        FROM r2 JOIN l2 USING (rk) ORDER BY regionkey, nationkey"""
    out["events_fano_factor"] = """
        WITH c AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                          count(*) AS x
                   FROM events GROUP BY 1, 2),
        a AS (SELECT event_type, sum(x) AS sx, sum(x * x) AS sx2
              FROM c GROUP BY 1),
        k AS (SELECT (SELECT max(day) FROM c)
                     - (SELECT min(day) FROM c) + 1 AS n)
        SELECT event_type, CAST(k.n AS BIGINT) AS n_days,
               CAST(sx AS BIGINT) AS n_events,
               CAST(1000000 * (k.n * sx2 - sx * sx) // (k.n * sx)
                    AS BIGINT) AS fano_fp
        FROM a, k ORDER BY 1"""
    out["events_max_type_run"] = """
        WITH o AS (SELECT user_id, event_type,
                          row_number() OVER (PARTITION BY user_id
                             ORDER BY epoch_us(ts), event_id) AS rn,
                          row_number() OVER (
                             PARTITION BY user_id, event_type
                             ORDER BY epoch_us(ts), event_id) AS rnt
                   FROM events),
        r AS (SELECT user_id, event_type, rn - rnt AS grp,
                     count(*) AS len
              FROM o GROUP BY 1, 2, 3),
        p AS (SELECT user_id, event_type, len, row_number() OVER (
                 PARTITION BY user_id ORDER BY len DESC, event_type)
                 AS k FROM r)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(len AS BIGINT) AS max_run, event_type AS run_type
        FROM p WHERE k = 1 ORDER BY user_id"""
    out["kg_sparql_unbound_filter"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        m AS (SELECT DISTINCT subj AS t, obj AS m FROM tri
              WHERE pred = '{C.PRED_MENTIONS}'),
        ut AS (SELECT DISTINCT subj AS t FROM tri
               WHERE pred = '{C.PRED_USES_TOOL}')
        SELECT m.m AS m, CAST(count(*) AS BIGINT) AS n_turns
        FROM m WHERE m.t NOT IN (SELECT t FROM ut)
        GROUP BY 1 ORDER BY 1"""
    out["kg_sparql_exists_filter"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        u AS (SELECT DISTINCT subj AS t, obj AS tool FROM tri
              WHERE pred = '{C.PRED_USES_TOOL}'),
        me AS (SELECT DISTINCT subj AS t FROM tri
               WHERE pred = '{C.PRED_MENTIONS}')
        SELECT tool, CAST(count(*) AS BIGINT) AS n_turns
        FROM u WHERE t IN (SELECT t FROM me)
        GROUP BY 1 ORDER BY 1"""
    out["text_simpson_diversity"] = """
        WITH w AS (SELECT source, unnest(string_split(lower(text), ' '))
                     AS w FROM documents),
        c AS (SELECT source, w, count(*) AS n FROM w GROUP BY 1, 2)
        SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
               CAST(sum(n * (n - 1)) AS BIGINT) AS n_repeat,
               CAST(1000000 * sum(n * (n - 1))
                    // (sum(n) * (sum(n) - 1)) AS BIGINT) AS simpson_fp
        FROM c GROUP BY 1 ORDER BY 1"""
    out["rel_xyz_classification"] = """
        WITH m AS (SELECT l_partkey, count(*) AS n,
                          sum(CAST(round(l_quantity) AS BIGINT)) AS sq,
                          sum(CAST(round(l_quantity) AS BIGINT)
                              * CAST(round(l_quantity) AS BIGINT)) AS sq2
                   FROM lineitem GROUP BY 1),
        c AS (SELECT CASE WHEN 4 * (n * sq2 - sq * sq) <= sq * sq
                          THEN 'X'
                          WHEN (n * sq2 - sq * sq) <= sq * sq THEN 'Y'
                          ELSE 'Z' END AS xyz_class
              FROM m)
        SELECT xyz_class, CAST(count(*) AS BIGINT) AS n_parts
        FROM c GROUP BY 1 ORDER BY 1"""
    out["rel_revenue_waterfall"] = """
        WITH p AS (SELECT
            CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS g,
            CAST(floor(l_extendedprice * l_discount * 100.0 + 0.5)
                 AS BIGINT) AS d,
            CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                 AS BIGINT) AS n,
            CAST(floor(l_extendedprice * (1 - l_discount) * l_tax
                       * 100.0 + 0.5) AS BIGINT) AS t
            FROM lineitem)
        SELECT CAST(sum(g) AS BIGINT) AS gross_c,
               CAST(sum(d) AS BIGINT) AS discount_c,
               CAST(sum(n) AS BIGINT) AS net_c,
               CAST(sum(t) AS BIGINT) AS tax_c,
               CAST(sum(n) + sum(t) AS BIGINT) AS final_c
        FROM p"""
    ns_case = " ".join(
        f"WHEN obj LIKE '{pre}%' THEN '{name}'"
        for name, pre in [("schema", C.SCHEMA), ("entity", C.ENT),
                          ("wikidata", C.WD), ("prop", C.PROP),
                          ("rdf", C.RDF), ("rdfs", C.RDFS)])
    out["kg_object_namespaces"] = P + f"""
        , tri AS (SELECT * FROM ({full_body}))
        SELECT CASE WHEN obj_is_literal THEN 'literal'
                    {ns_case} ELSE 'other' END AS namespace,
               CAST(count(*) AS BIGINT) AS n
        FROM tri GROUP BY 1 ORDER BY 1"""
    cost_th = ", ".join(f"({t})" for t in GINI_THRESHOLDS)
    out["ml_cost_curve"] = f"""
        WITH t(thr) AS (VALUES {cost_th}),
        c AS (SELECT t.thr,
                sum(CASE WHEN d.n_chars >= t.thr AND d.lang <> 'en'
                    THEN 1 ELSE 0 END) AS fp,
                sum(CASE WHEN d.n_chars < t.thr AND d.lang = 'en'
                    THEN 1 ELSE 0 END) AS fn
              FROM documents d CROSS JOIN t GROUP BY 1),
        k AS (SELECT c.*, {COST_FN} * fn + fp AS cost FROM c),
        b AS (SELECT thr AS best FROM k ORDER BY cost, thr LIMIT 1)
        SELECT CAST(thr AS BIGINT) AS thr, CAST(fp AS BIGINT) AS fp,
               CAST(fn AS BIGINT) AS fn, CAST(cost AS BIGINT) AS cost,
               CAST(CASE WHEN thr = b.best THEN 1 ELSE 0 END AS BIGINT)
                 AS is_best
        FROM k, b ORDER BY thr"""
    out["kg_literal_length_stats"] = P + f"""
        , tri AS (SELECT * FROM ({full_body}))
        SELECT pred, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(length(obj)) AS BIGINT) AS sum_len,
               CAST(max(length(obj)) AS BIGINT) AS max_len
        FROM tri WHERE obj_is_literal GROUP BY 1 ORDER BY 1"""
    out["rel_unit_price_audit"] = """
        WITH l AS (SELECT l_partkey AS pk,
                          CAST(round(l_extendedprice * 100.0) AS BIGINT)
                            AS ext_c,
                          CAST(round(l_quantity) AS BIGINT) AS qty
                   FROM lineitem),
        p AS (SELECT p_partkey AS pk, p_brand,
                     CAST(round(p_retailprice * 100.0) AS BIGINT)
                       AS retail_c
              FROM part)
        SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CASE WHEN 20 * abs(100 * l.ext_c
                                           - l.qty * p.retail_c)
                                  > l.qty * p.retail_c
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM l JOIN p USING (pk) GROUP BY 1 ORDER BY 1"""
    out["dedup_cross_source_clusters"] = \
        "WITH RECURSIVE " + _SHINGLE_CTE + "," + _CANON_CTE + """,
        m AS (SELECT d.doc_id, d.source,
                     coalesce(c.c, d.doc_id) AS canon_id
              FROM documents d LEFT JOIN canon c ON c.node = d.doc_id),
        per AS (SELECT canon_id, count(DISTINCT source) AS ns
                FROM m GROUP BY 1)
        SELECT CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(sum(CASE WHEN ns >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_cross_source,
               CAST(1000000 * sum(CASE WHEN ns >= 2 THEN 1 ELSE 0 END)
                    // greatest(count(*), 1) AS BIGINT) AS cross_fp
        FROM per"""
    pos_terms = ", ".join(f"('{t}')" for t in POSBIAS_TERMS)
    out["text_term_position_bias"] = f"""
        WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                   FROM documents),
        occ AS (SELECT ws[t.i] AS term,
                       1000000 * (t.i - 1)
                         // greatest(len(ws) - 1, 1) AS fp
                FROM d, unnest(generate_series(1, len(ws))) AS t(i)),
        q(term) AS (VALUES {pos_terms})
        SELECT q.term, CAST(count(occ.term) AS BIGINT) AS n,
               CAST(coalesce(sum(occ.fp), 0) AS BIGINT) AS sum_pos_fp,
               CAST(coalesce(sum(occ.fp), 0)
                    // greatest(count(occ.term), 1) AS BIGINT)
                 AS mean_pos_fp
        FROM q LEFT JOIN occ ON occ.term = q.term
        GROUP BY 1 ORDER BY 1"""
    out["rel_storage_tiering"] = f"""
        WITH l AS (SELECT l_partkey AS pk,
                          epoch_us(l_shipdate) // 86400000000 AS day
                   FROM lineitem),
        last AS (SELECT pk, max(day) AS last_day FROM l GROUP BY 1),
        h AS (SELECT max(last_day) AS horizon FROM last),
        t AS (SELECT CASE WHEN h.horizon - last_day <= {TIER_HOT_DAYS}
                          THEN 'hot'
                          WHEN h.horizon - last_day <= {TIER_WARM_DAYS}
                          THEN 'warm' ELSE 'cold' END AS tier
              FROM last, h)
        SELECT tier, CAST(count(*) AS BIGINT) AS n_parts
        FROM t GROUP BY 1 ORDER BY 1"""
    out["kg_schema_summary"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        ty AS (SELECT subj AS node, obj AS cls FROM tri
               WHERE pred = '{C.RDF_TYPE}'),
        s AS (SELECT tri.*, coalesce(ty.cls, 'untyped') AS scls
              FROM tri LEFT JOIN ty ON ty.node = tri.subj),
        o AS (SELECT s.scls, s.pred,
                CASE WHEN s.obj_is_literal
                     THEN coalesce(s.obj_datatype, 'literal')
                     ELSE coalesce(ty2.cls, 'untyped') END AS ocls
              FROM s LEFT JOIN ty ty2 ON ty2.node = s.obj)
        SELECT scls, pred, ocls, CAST(count(*) AS BIGINT) AS n
        FROM o GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""
    out["sample_temporal_split"] = f"""
        WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
                   FROM events),
        k AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        c AS (SELECT d0 + (d1 - d0) * {SPLIT_PCT} // 100 AS cutoff
              FROM k),
        f AS (SELECT user_id, min(day) AS fd FROM e GROUP BY 1)
        SELECT CAST(c.cutoff AS BIGINT) AS cutoff_day,
               CAST(sum(CASE WHEN e.day <= c.cutoff THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_train,
               CAST(sum(CASE WHEN e.day > c.cutoff THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_test,
               CAST(sum(CASE WHEN e.day > c.cutoff AND f.fd <= c.cutoff
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked,
               CAST(1000000 * sum(CASE WHEN e.day > c.cutoff
                                       AND f.fd <= c.cutoff
                                  THEN 1 ELSE 0 END)
                    // greatest(sum(CASE WHEN e.day > c.cutoff
                                    THEN 1 ELSE 0 END), 1) AS BIGINT)
                 AS leak_fp
        FROM e JOIN f USING (user_id), c GROUP BY 1"""
    out["text_dup_ngram_coverage"] = """
        WITH docs AS (SELECT doc_id, source,
                             string_split(lower(text), ' ') AS ws
                      FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                              FOR i IN range(1, len(ws) - 1)]) AS s
               FROM docs),
        df AS (SELECT s FROM (SELECT s, count(*) AS c FROM sh
                              GROUP BY 1) WHERE c >= 2),
        st AS (SELECT doc_id, t.i AS i,
                      ws[t.i] || ' ' || ws[t.i+1] || ' ' || ws[t.i+2]
                        AS s
               FROM docs, unnest(generate_series(1, len(ws) - 2))
                    AS t(i)),
        dup_starts AS (SELECT doc_id, i FROM st
                       WHERE s IN (SELECT s FROM df)),
        pos AS (SELECT doc_id, source, t.i AS p
                FROM docs, unnest(generate_series(1, len(ws))) AS t(i)),
        cov AS (SELECT pos.source,
                  CASE WHEN EXISTS (SELECT 1 FROM dup_starts d
                                    WHERE d.doc_id = pos.doc_id
                                      AND d.i BETWEEN pos.p - 2
                                                  AND pos.p)
                       THEN 1 ELSE 0 END AS c
                FROM pos)
        SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(c) AS BIGINT) AS n_covered,
               CAST(1000000 * sum(c) // greatest(count(*), 1) AS BIGINT)
                 AS cov_fp
        FROM cov GROUP BY 1 ORDER BY 1"""
    out["ml_mcnemar"] = f"""
        WITH f AS (SELECT
            CASE WHEN (n_chars >= {KAPPA_CHAR_MIN})
                      = (lang = 'en') THEN 1 ELSE 0 END AS a_ok,
            CASE WHEN (len(string_split(text, ' ')) >= {KAPPA_WORD_MIN})
                      = (lang = 'en') THEN 1 ELSE 0 END AS b_ok
            FROM documents),
        c AS (SELECT sum(a_ok * (1 - b_ok)) AS b,
                     sum((1 - a_ok) * b_ok) AS c FROM f)
        SELECT CAST(b AS BIGINT) AS n_b, CAST(c AS BIGINT) AS n_c,
               CAST(1000000 * greatest(abs(b - c) - 1, 0)
                    * greatest(abs(b - c) - 1, 0)
                    // greatest(b + c, 1) AS BIGINT) AS mcnemar_fp
        FROM c"""
    out["emb_norm_outliers"] = """
        WITH n AS (SELECT vec_id,
                          sum(CAST(floor(CAST(embedding[g.i] AS DOUBLE)
                                         * 1000) AS BIGINT)
                              * CAST(floor(CAST(embedding[g.i] AS DOUBLE)
                                           * 1000) AS BIGINT)) AS norm2
                   FROM embeddings, generate_series(1, 64) AS g(i)
                   GROUP BY 1),
        r AS (SELECT norm2, row_number() OVER (ORDER BY norm2) - 1
                       AS rn, count(*) OVER () AS tot FROM n),
        q AS (SELECT max(CASE WHEN rn = (tot - 1) // 4
                         THEN norm2 END) AS q1,
                     max(CASE WHEN rn = 3 * (tot - 1) // 4
                         THEN norm2 END) AS q3
              FROM r),
        f AS (SELECT q1 - 3 * (q3 - q1) // 2 AS lo,
                     q3 + 3 * (q3 - q1) // 2 AS hi FROM q)
        SELECT CAST(n.vec_id AS BIGINT) AS vec_id,
               CAST(n.norm2 AS BIGINT) AS norm2
        FROM n, f WHERE n.norm2 < f.lo OR n.norm2 > f.hi
        ORDER BY vec_id"""
    out["events_reactivations"] = f"""
        WITH e AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 86400000000 AS day
                   FROM events),
        l AS (SELECT user_id, day - lag(day) OVER (
                 PARTITION BY user_id ORDER BY day) AS gap FROM e)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(sum(CASE WHEN gap >= {DORMANT_DAYS}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_reactivations
        FROM l GROUP BY 1
        HAVING sum(CASE WHEN gap >= {DORMANT_DAYS} THEN 1 ELSE 0 END) > 0
        ORDER BY 1"""
    ro_vals = ", ".join(f"({p})" for p in RO_ORIGINS)
    out["sample_rolling_origin"] = f"""
        WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day
                   FROM events),
        k AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        o(p) AS (VALUES {ro_vals}),
        c AS (SELECT o.p, k.d0 + (k.d1 - k.d0) * o.p // 100 AS cutoff
              FROM o, k)
        SELECT CAST(c.p AS BIGINT) AS origin_pct,
               CAST(c.cutoff AS BIGINT) AS cutoff_day,
               CAST(sum(CASE WHEN e.day <= c.cutoff THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_train,
               CAST(sum(CASE WHEN e.day > c.cutoff
                             AND e.day <= c.cutoff + {RO_HORIZON}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_test
        FROM e CROSS JOIN c GROUP BY 1, 2 ORDER BY 1"""
    out["kg_degree_mixing_matrix"] = P + """
        , ce AS (SELECT DISTINCT a.canonical AS u, b.canonical AS v
                 FROM mention a JOIN mention b
                   ON a.turn_iri = b.turn_iri
                  AND a.canonical < b.canonical),
        d AS (SELECT node, count(*) AS deg FROM (
                SELECT u AS node FROM ce
                UNION ALL SELECT v FROM ce) GROUP BY 1),
        x AS (SELECT du.deg AS du, dv.deg AS dv
              FROM ce JOIN d du ON du.node = ce.u
                      JOIN d dv ON dv.node = ce.v),
        bkt AS (SELECT least(length(bin(du)) - 1, length(bin(dv)) - 1)
                         AS bucket_lo,
                       greatest(length(bin(du)) - 1,
                                length(bin(dv)) - 1) AS bucket_hi
                FROM x)
        SELECT CAST(bucket_lo AS BIGINT) AS bucket_lo,
               CAST(bucket_hi AS BIGINT) AS bucket_hi,
               CAST(count(*) AS BIGINT) AS n_edges
        FROM bkt GROUP BY 1, 2 ORDER BY 1, 2"""
    out["rel_price_index"] = f"""
        WITH l AS (SELECT l_partkey AS pk,
                          CAST(year(l_shipdate) AS BIGINT) AS yr,
                          sum(CAST(round(l_extendedprice * 100.0)
                                   AS BIGINT)) AS ext_c,
                          sum(CAST(round(l_quantity) AS BIGINT)) AS qty
                   FROM lineitem
                   WHERE year(l_shipdate)
                         IN ({PRICE_BASE_YEAR}, {PRICE_COMP_YEAR})
                   GROUP BY 1, 2),
        b AS (SELECT pk, 1000000 * ext_c // greatest(qty, 1) AS p0,
                     qty AS q0
              FROM l WHERE yr = {PRICE_BASE_YEAR}),
        c AS (SELECT pk, 1000000 * ext_c // greatest(qty, 1) AS p1
              FROM l WHERE yr = {PRICE_COMP_YEAR}),
        j AS (SELECT b.pk, b.p0, b.q0, c.p1 FROM b JOIN c USING (pk))
        SELECT CAST(count(*) AS BIGINT) AS n_parts,
               CAST(1000000 * sum(p1 * q0)
                    // greatest(sum(p0 * q0), 1) AS BIGINT) AS index_fp
        FROM j"""
    out["rel_fifo_cogs"] = """
        WITH l AS (SELECT l_partkey AS pk,
                          epoch_us(l_shipdate) // 86400000000 AS day,
                          l_orderkey AS ok, l_linenumber AS ln,
                          CAST(round(l_quantity) AS BIGINT) AS qty,
                          CAST(round(l_extendedprice * 100.0) AS BIGINT)
                            AS ext_c,
                          CASE WHEN l_returnflag = 'R'
                               THEN 1 ELSE 0 END AS isbuy
                   FROM lineitem),
        s AS (SELECT pk,
                     sum(CASE WHEN isbuy = 0 THEN qty ELSE 0 END)
                       AS sold,
                     sum(CASE WHEN isbuy = 1 THEN qty ELSE 0 END)
                       AS bought
              FROM l GROUP BY 1),
        b AS (SELECT pk, ext_c, qty,
                     coalesce(sum(qty) OVER (PARTITION BY pk
                        ORDER BY day, ok, ln
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS cumb
              FROM l WHERE isbuy = 1),
        c AS (SELECT b.pk,
                     sum(b.ext_c * least(greatest(s.sold - b.cumb, 0),
                                         b.qty) // b.qty) AS cogs
              FROM b JOIN s USING (pk) GROUP BY 1)
        SELECT CAST(s.pk AS BIGINT) AS l_partkey,
               CAST(s.sold AS BIGINT) AS qty_sold,
               CAST(s.bought AS BIGINT) AS qty_bought,
               CAST(least(s.sold, s.bought) AS BIGINT) AS qty_matched,
               CAST(coalesce(c.cogs, 0) AS BIGINT) AS cogs_c
        FROM s LEFT JOIN c USING (pk) ORDER BY 1"""
    out["rel_suppliers_per_part_hist"] = """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        per AS (SELECT l_partkey, count(*) AS n_suppliers FROM ps
                GROUP BY 1)
        SELECT CAST(n_suppliers AS BIGINT) AS n_suppliers,
               CAST(count(*) AS BIGINT) AS n_parts
        FROM per GROUP BY 1 ORDER BY 1"""
    out["kg_redundant_assertions"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        rules(p, dcls, rcls) AS (VALUES {rules_vals}),
        inf AS (SELECT DISTINCT node, type_iri FROM (
            SELECT t.subj AS node, r.dcls AS type_iri
            FROM tri t JOIN rules r ON t.pred = r.p
            UNION ALL
            SELECT t.obj, r.rcls
            FROM tri t JOIN rules r ON t.pred = r.p))
        SELECT subj AS node, obj AS type_iri FROM tri
        WHERE pred = '{C.RDF_TYPE}'
        INTERSECT
        SELECT node, type_iri FROM inf
        ORDER BY node, type_iri"""
    out["kg_tool_trend"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        dc AS (SELECT subj AS turn, substr(obj, 1, 7) AS month FROM tri
               WHERE pred = '{C.PRED_DATE_CREATED}'),
        ut AS (SELECT subj AS turn, obj AS tool FROM tri
               WHERE pred = '{C.PRED_USES_TOOL}'),
        c AS (SELECT ut.tool, dc.month, count(*) AS n
              FROM ut JOIN dc USING (turn) GROUP BY 1, 2),
        mo AS (SELECT month, row_number() OVER (ORDER BY month) - 1
                 AS xi FROM (SELECT DISTINCT month FROM c)),
        k AS (SELECT count(*) AS nm, sum(xi) AS sx FROM mo),
        tl AS (SELECT DISTINCT tool FROM c),
        g AS (SELECT tl.tool, mo.xi, coalesce(c.n, 0) AS y
              FROM tl CROSS JOIN mo
              LEFT JOIN c ON c.tool = tl.tool AND c.month = mo.month)
        SELECT tool, CAST(sum(y) AS BIGINT) AS n_uses,
               CAST((SELECT nm FROM k) * sum(xi * y)
                    - (SELECT sx FROM k) * sum(y) AS BIGINT)
                 AS slope_num
        FROM g GROUP BY 1 ORDER BY 1"""
    out["events_littles_law"] = f"""
        WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS t
                   FROM events),
        m AS (SELECT *, lag(t) OVER (PARTITION BY user_id ORDER BY t)
                 AS prev FROM e),
        s AS (SELECT *, sum(CASE WHEN prev IS NULL
                                   OR t - prev > {LL_GAP_S}
                                 THEN 1 ELSE 0 END) OVER (
                 PARTITION BY user_id ORDER BY t
                 ROWS UNBOUNDED PRECEDING) AS seg FROM m),
        r AS (SELECT user_id, seg, max(t) - min(t) AS dur
              FROM s GROUP BY 1, 2),
        k AS (SELECT count(*) AS n, sum(dur) AS dur FROM r),
        sp AS (SELECT max(t) - min(t) AS span FROM e)
        SELECT CAST(k.n AS BIGINT) AS n_sessions,
               CAST(k.dur AS BIGINT) AS total_session_s,
               CAST(sp.span AS BIGINT) AS span_s,
               CAST(1000000 * k.dur // greatest(sp.span, 1) AS BIGINT)
                 AS avg_concurrency_fp,
               CAST(CAST(86400000000 AS BIGINT) * k.n
                    // greatest(sp.span, 1) AS BIGINT)
                 AS arrivals_per_day_fp,
               CAST(k.dur // greatest(k.n, 1) AS BIGINT)
                 AS mean_duration_s
        FROM k, sp"""
    out["diag_hash_partition_balance"] = f"""
        WITH base AS (SELECT CAST(l_orderkey AS UBIGINT) AS kx
                      FROM lineitem),
        {_splitmix_cte('base', 'kx', 'kx')},
        h AS (SELECT CAST(xor(z, z >> 31) % {HASHPART_BUCKETS}
                          AS BIGINT) AS bucket FROM z2),
        c AS (SELECT bucket, count(*) AS n_rows FROM h GROUP BY 1),
        k AS (SELECT max(n_rows) AS mx, sum(n_rows) AS tot FROM c)
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(n_rows AS BIGINT) AS n_rows,
               CAST(1000000 * k.mx * {HASHPART_BUCKETS} // k.tot
                    AS BIGINT) AS skew_fp
        FROM c, k ORDER BY bucket"""
    out["ml_shapley_two_features"] = f"""
        WITH f AS (SELECT
            CASE WHEN n_chars >= {KAPPA_CHAR_MIN} THEN 1 ELSE 0 END AS a,
            CASE WHEN len(string_split(text, ' ')) >= {KAPPA_WORD_MIN}
                 THEN 1 ELSE 0 END AS b,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM documents),
        c AS (SELECT count(*) AS n, sum(y) AS np_,
                     sum(CASE WHEN a = y THEN 1 ELSE 0 END) AS ok_a,
                     sum(CASE WHEN b = y THEN 1 ELSE 0 END) AS ok_b,
                     sum(CASE WHEN (a * b) = y THEN 1 ELSE 0 END)
                       AS ok_ab
              FROM f),
        v AS (SELECT 1000000 * greatest(np_, n - np_) // n AS v0,
                     1000000 * ok_a // n AS va,
                     1000000 * ok_b // n AS vb,
                     1000000 * ok_ab // n AS vab
              FROM c)
        SELECT CAST(v0 AS BIGINT) AS v_empty_fp,
               CAST(va AS BIGINT) AS v_a_fp,
               CAST(vb AS BIGINT) AS v_b_fp,
               CAST(vab AS BIGINT) AS v_ab_fp,
               CAST(((va - v0) + (vab - vb)) // 2
                    - CASE WHEN ((va - v0) + (vab - vb)) % 2 <> 0
                                AND (va - v0) + (vab - vb) < 0
                           THEN 1 ELSE 0 END AS BIGINT) AS phi_a_fp,
               CAST(((vb - v0) + (vab - va)) // 2
                    - CASE WHEN ((vb - v0) + (vab - va)) % 2 <> 0
                                AND (vb - v0) + (vab - va) < 0
                           THEN 1 ELSE 0 END AS BIGINT) AS phi_b_fp
        FROM v"""
    out["events_dose_response"] = """
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t
                   FROM events),
        fp AS (SELECT user_id, min(t) AS pt FROM e
               WHERE event_type = 'purchase' GROUP BY 1),
        u AS (SELECT e.user_id,
                     max(CASE WHEN fp.pt IS NOT NULL
                         THEN 1 ELSE 0 END) AS conv,
                     sum(CASE WHEN e.event_type = 'view'
                              AND (fp.pt IS NULL OR e.t < fp.pt)
                         THEN 1 ELSE 0 END) AS dose
              FROM e LEFT JOIN fp USING (user_id) GROUP BY 1),
        b AS (SELECT CASE WHEN dose = 0 THEN 0
                     ELSE length(bin(dose)) END AS bucket, conv FROM u)
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(conv) AS BIGINT) AS n_converted,
               CAST(1000000 * sum(conv) // count(*) AS BIGINT)
                 AS rate_fp
        FROM b GROUP BY 1 ORDER BY 1"""
    # footer paths are embedded at the oracle scale (the same
    # SF_ORACLE-pinning every fixture-backed oracle uses)
    tdir = os.path.join("/root/testdata", SF_ORACLE)
    footer_parts = " UNION ALL ".join(f"""
        SELECT '{t}' AS tbl, CAST(num_rows AS BIGINT) AS num_rows,
               CAST(num_row_groups AS BIGINT) AS num_row_groups
        FROM parquet_file_metadata('{tdir}/{t}.parquet')"""
        for t in FOOTER_TABLES)
    out["diag_parquet_footers"] = \
        "SELECT * FROM (" + footer_parts + ") ORDER BY tbl"
    out["privacy_date_shift"] = f"""
        WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
                   FROM events),
        mm AS (SELECT user_id, min(day) AS mn, max(day) AS mx FROM e
               GROUP BY 1),
        base AS (SELECT user_id, mn, mx,
                        CAST(user_id AS UBIGINT) AS kx FROM mm),
        {_splitmix_cte('base', 'kx', 'user_id, mn, mx')},
        sh AS (SELECT user_id, mn, mx,
                      CAST(xor(z, z >> 31) % {DATE_SHIFT_RANGE}
                           AS BIGINT) - 7 AS s FROM z2)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(s AS BIGINT) AS shift_days,
               CAST(mn + s AS BIGINT) AS from_day,
               CAST(mx + s AS BIGINT) AS to_day
        FROM sh ORDER BY user_id"""
    out["rel_two_way_interaction"] = """
        WITH m AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
                          count(*) AS n,
                          sum(CAST(round(l_quantity) AS BIGINT)) AS sq
                   FROM lineitem GROUP BY 1, 2),
        cell AS (SELECT *, 1000000 * sq // n AS cell_fp FROM m),
        rw AS (SELECT rf, 1000000 * sum(sq) // sum(n) AS fp FROM m
               GROUP BY 1),
        cl AS (SELECT ls, 1000000 * sum(sq) // sum(n) AS fp FROM m
               GROUP BY 1),
        g AS (SELECT 1000000 * sum(sq) // sum(n) AS fp FROM m)
        SELECT cell.rf AS l_returnflag, cell.ls AS l_linestatus,
               CAST(cell.n AS BIGINT) AS n,
               CAST(cell.cell_fp AS BIGINT) AS cell_fp,
               CAST(cell.cell_fp - rw.fp - cl.fp + g.fp AS BIGINT)
                 AS interaction_fp
        FROM cell JOIN rw USING (rf) JOIN cl USING (ls), g
        ORDER BY 1, 2"""
    out["kg_construct_agg_triples"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        ut AS (SELECT subj AS turn FROM tri
               WHERE pred = '{C.PRED_USES_TOOL}'),
        po AS (SELECT subj AS turn, obj AS conv FROM tri
               WHERE pred = '{C.PRED_IS_PART_OF}'),
        c AS (SELECT po.conv, count(*) AS n
              FROM ut JOIN po USING (turn) GROUP BY 1)
        SELECT conv AS subj,
               '{C.PROP}toolUseCount' AS pred,
               CAST(n AS VARCHAR) AS obj,
               '{C.XSD_INTEGER}' AS obj_datatype
        FROM c ORDER BY subj"""
    out["ml_fairness_odds_gap"] = f"""
        WITH c AS (SELECT source,
                sum(CASE WHEN n_chars >= {KAPPA_CHAR_MIN}
                         AND lang = 'en' THEN 1 ELSE 0 END) AS tp,
                sum(CASE WHEN n_chars >= {KAPPA_CHAR_MIN}
                         AND lang <> 'en' THEN 1 ELSE 0 END) AS fp,
                sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
                sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS neg
              FROM documents GROUP BY 1),
        r AS (SELECT source,
                     1000000 * tp // greatest(pos, 1) AS tpr_fp,
                     1000000 * fp // greatest(neg, 1) AS fpr_fp
              FROM c),
        g AS (SELECT max(tpr_fp) - min(tpr_fp) AS tg,
                     max(fpr_fp) - min(fpr_fp) AS fg FROM r)
        SELECT source, CAST(tpr_fp AS BIGINT) AS tpr_fp,
               CAST(fpr_fp AS BIGINT) AS fpr_fp,
               CAST(g.tg AS BIGINT) AS tpr_gap_fp,
               CAST(g.fg AS BIGINT) AS fpr_gap_fp
        FROM r, g ORDER BY source"""
    aw_vals = ", ".join(f"({w})" for w in ATTR_WINDOWS_S)
    out["events_attribution_windows"] = f"""
        WITH e AS (SELECT user_id, event_id, event_type,
                          epoch_us(ts) // 1000000 AS t FROM events),
        o AS (SELECT *, max(CASE WHEN event_type = 'view'
                            THEN t END) OVER (
                 PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS lv
              FROM e),
        p AS (SELECT t, lv FROM o WHERE event_type = 'purchase'),
        w(window_s) AS (VALUES {aw_vals})
        SELECT CAST(w.window_s AS BIGINT) AS window_s,
               CAST(count(*) AS BIGINT) AS n_purchases,
               CAST(sum(CASE WHEN p.lv IS NOT NULL
                             AND p.t - p.lv <= w.window_s
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
               CAST(1000000 * sum(CASE WHEN p.lv IS NOT NULL
                                       AND p.t - p.lv <= w.window_s
                                  THEN 1 ELSE 0 END)
                    // greatest(count(*), 1) AS BIGINT) AS attr_fp
        FROM p CROSS JOIN w GROUP BY 1 ORDER BY 1"""
    out["text_cross_perplexity"] = """
        WITH w AS (SELECT source, unnest(string_split(lower(text), ' '))
                     AS w FROM documents),
        cc AS (SELECT source, w, count(*) AS n FROM w GROUP BY 1, 2),
        ss AS (SELECT DISTINCT source FROM documents
               ORDER BY source LIMIT 2),
        ab AS (SELECT min(source) AS a, max(source) AS b FROM ss),
        voc AS (SELECT w,
                  coalesce(sum(CASE WHEN cc.source = (SELECT a FROM ab)
                               THEN n END), 0) AS na,
                  coalesce(sum(CASE WHEN cc.source = (SELECT b FROM ab)
                               THEN n END), 0) AS nb
                FROM cc WHERE source IN (SELECT source FROM ss)
                GROUP BY 1),
        k AS (SELECT count(*) AS v, sum(na) AS ta, sum(nb) AS tb
              FROM voc),
        d AS (SELECT (SELECT a FROM ab) AS src_from,
                     (SELECT b FROM ab) AS src_to,
                     sum(voc.na) AS n_tokens,
                     sum(voc.na * length(bin((k.tb + k.v)
                                             // (voc.nb + 1))))
                       AS total_bits
              FROM voc, k
              UNION ALL
              SELECT (SELECT b FROM ab), (SELECT a FROM ab),
                     sum(voc.nb),
                     sum(voc.nb * length(bin((k.ta + k.v)
                                             // (voc.na + 1))))
              FROM voc, k)
        SELECT src_from, src_to, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(total_bits AS BIGINT) AS total_bits,
               CAST(1000000 * total_bits // greatest(n_tokens, 1)
                    AS BIGINT) AS mean_bits_fp
        FROM d ORDER BY src_from"""
    out["kg_rich_club"] = P + f"""
        , ce AS (SELECT DISTINCT a.canonical AS u, b.canonical AS v
                 FROM mention a JOIN mention b
                   ON a.turn_iri = b.turn_iri
                  AND a.canonical < b.canonical),
        d AS (SELECT node, count(*) AS deg FROM (
                SELECT u AS node FROM ce
                UNION ALL SELECT v FROM ce) GROUP BY 1),
        rich AS (SELECT node FROM d WHERE deg >= {RICH_CLUB_K}),
        re AS (SELECT * FROM ce
               WHERE u IN (SELECT node FROM rich)
                 AND v IN (SELECT node FROM rich)),
        k AS (SELECT (SELECT count(*) FROM rich) AS nr,
                     (SELECT count(*) FROM re) AS ne)
        SELECT CAST({RICH_CLUB_K} AS BIGINT) AS k,
               CAST(nr AS BIGINT) AS n_rich,
               CAST(ne AS BIGINT) AS n_edges,
               CAST(1000000 * ne
                    // greatest(nr * (nr - 1) // 2, 1) AS BIGINT)
                 AS phi_fp
        FROM k"""
    out["ml_margin_histogram"] = f"""
        WITH f AS (SELECT abs(n_chars - {KAPPA_CHAR_MIN}) AS margin,
                          CASE WHEN (n_chars >= {KAPPA_CHAR_MIN})
                                    = (lang = 'en')
                               THEN 1 ELSE 0 END AS correct
                   FROM documents),
        b AS (SELECT CASE WHEN margin = 0 THEN 0
                     ELSE length(bin(margin)) END AS bucket, correct
              FROM f)
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(correct) AS BIGINT) AS n_correct,
               CAST(1000000 * sum(correct) // count(*) AS BIGINT)
                 AS acc_fp
        FROM b GROUP BY 1 ORDER BY 1"""
    mpre_len = len(C.ENT + "mention/") + 1
    out["kg_label_assortativity"] = P + f"""
        , tri AS (SELECT * FROM ({full_body})),
        ce AS (SELECT DISTINCT a.canonical AS u, b.canonical AS v
               FROM mention a JOIN mention b
                 ON a.turn_iri = b.turn_iri
                AND a.canonical < b.canonical),
        sa AS (SELECT substr(subj, {mpre_len}) AS c, obj AS ent
               FROM tri WHERE pred = '{C.PRED_SAME_AS}'),
        io AS (SELECT subj AS ent, obj AS ty FROM tri
               WHERE pred = '{C.PRED_INSTANCE_OF}'),
        tmap AS (SELECT sa.c, coalesce(io.ty, 'untyped') AS ty
                 FROM sa LEFT JOIN io USING (ent)),
        x AS (SELECT coalesce(tu.ty, 'untyped') AS ta,
                     coalesce(tv.ty, 'untyped') AS tb
              FROM ce LEFT JOIN tmap tu ON tu.c = ce.u
                      LEFT JOIN tmap tv ON tv.c = ce.v),
        p AS (SELECT least(ta, tb) AS type_a, greatest(ta, tb)
                       AS type_b, count(*) AS n_edges
              FROM x GROUP BY 1, 2),
        tot_cte AS (SELECT sum(n_edges) AS tot,
                     sum(CASE WHEN type_a = type_b
                         THEN n_edges ELSE 0 END) AS same FROM p)
        SELECT type_a, type_b, CAST(n_edges AS BIGINT) AS n_edges,
               CAST(1000000 * tot_cte.same // greatest(tot_cte.tot, 1)
                    AS BIGINT) AS same_share_fp
        FROM p, tot_cte ORDER BY 1, 2"""
    fb_rest = FLOOR_BUDGET
    out["sample_floor_allocation"] = f"""
        WITH h AS (SELECT o_orderpriority, count(*) AS n FROM orders
                   GROUP BY 1),
        k AS (SELECT count(*) AS k, sum(n) AS tw FROM h),
        f AS (SELECT h.*, ({fb_rest} - k.k * {FLOOR_MIN_PER_STRATUM})
                          * h.n // k.tw AS fa,
                     ({fb_rest} - k.k * {FLOOR_MIN_PER_STRATUM}) * h.n
                       - (({fb_rest} - k.k * {FLOOR_MIN_PER_STRATUM})
                          * h.n // k.tw) * k.tw AS rem
              FROM h, k),
        l AS (SELECT ({fb_rest} - (SELECT k FROM k)
                      * {FLOOR_MIN_PER_STRATUM}) - sum(fa) AS leftover
              FROM f),
        r AS (SELECT f.*, row_number() OVER (
                 ORDER BY rem DESC, o_orderpriority) AS rnk FROM f)
        SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
               CAST({FLOOR_MIN_PER_STRATUM} + fa
                    + CASE WHEN rnk <= l.leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc
        FROM r, l ORDER BY 1"""
    lag_vals = ", ".join(f"({x})" for x in range(2, PERIOD_MAX_LAG + 1))
    out["events_dominant_period"] = f"""
        WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          count(*) AS n FROM events GROUP BY 1),
        sp AS (SELECT unnest(generate_series(
                 (SELECT min(day) FROM d),
                 (SELECT max(day) FROM d))) AS day),
        v AS (SELECT sp.day - (SELECT min(day) FROM d) AS i,
                     coalesce(d.n, 0) AS c
              FROM sp LEFT JOIN d USING (day)),
        lags(lag) AS (VALUES {lag_vals}),
        a AS (SELECT l.lag, count(*) AS m, sum(x.c * y.c) AS sxy,
                     sum(x.c) AS sx, sum(y.c) AS sy
              FROM lags l JOIN v x ON TRUE
              JOIN v y ON y.i = x.i + l.lag GROUP BY 1),
        f AS (SELECT lag, m, m * sxy - sx * sy AS num FROM a
              WHERE m > 0),
        g AS (SELECT lag, 1000000 * num // (m * m)
                     - CASE WHEN (1000000 * num) % (m * m) <> 0
                                 AND num < 0 THEN 1 ELSE 0 END AS fp
              FROM f),
        b AS (SELECT lag AS best FROM g ORDER BY fp DESC, lag LIMIT 1)
        SELECT CAST(g.lag AS BIGINT) AS lag,
               CAST(g.fp AS BIGINT) AS autocov_fp,
               CAST(CASE WHEN g.lag = b.best THEN 1 ELSE 0 END
                    AS BIGINT) AS is_dominant
        FROM g, b ORDER BY lag"""
    return out
