"""Mini-driver: every queries() entry with an oracle_sql() must hash-match
DuckDB on sf0.001 (the real driver runs sf0.01 — same code path)."""

import pytest

from compare_util import compare
from the_yelp_collaborative_knowledge_graph_ray import queries as Q
from the_yelp_collaborative_knowledge_graph_ray.fixtures import generator

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle(monkeypatch=None):
    # point the oracle at the sf0.001 fixtures for the fast test run
    old = Q.SF_ORACLE
    Q.SF_ORACLE = "sf0.001"
    sqls = Q.oracle_sql()
    Q.SF_ORACLE = old
    return sqls


def _names():
    return sorted(set(Q.queries()) & set(Q.oracle_sql()))


@pytest.mark.parametrize("name", [
    "kg_structural_triples", "kg_mention_triples", "kg_dead_letter",
    "cq_turns_per_role", "cq_mean_turns_per_conv", "cq_busiest_day_by_tool",
    "cq_convs_over_10_turns", "cq_turns_in_month", "cq_distinct_mentions",
    "cq_top_tools", "kg_pipeline_full", "cq_conv_stats_salted",
    "kg_ntriples_lines",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_embedding_cosine", "embedding_topk_pairs", "ann_topk_cosine",
    "text_quality", "text_token_count", "text_repetition",
    "text_dup_spans", "search_bm25", "text_chunks", "text_pack_sequences",
    "sample_hash", "sample_stratified", "text_redact",
    "contamination_check", "rel_quantiles",
    "text_tfidf", "curation_cap_per_source",
    "dedup_fingerprint", "dedup_canonical_map",
    "multimodal_resize", "multimodal_frame_sample",
    "rel_quantiles_by_flag", "events_sliding_window",
    "rel_groupby_lineitem", "rel_join_orders_customer", "rel_topk_customers",
    "rel_first_order_per_customer", "rel_revenue_by_brand",
    "events_sessionize", "events_window_agg", "events_json_props_sum",
])
def test_query_matches_oracle(ray_session, oracle, name):
    qs = Q.queries()
    assert name in qs, f"query {name} missing"
    assert name in oracle, f"oracle for {name} missing"
    ok, msg = compare(qs[name](SF_DIR), oracle[name], SF_DIR)
    assert ok, msg


def test_every_oracle_key_has_query():
    qs, sqls = Q.queries(), Q.oracle_sql()
    assert set(sqls) <= set(qs)
