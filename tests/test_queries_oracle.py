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


# EVERY oracle-gated query — derived from the registries at collection time
# so a new queries()+oracle_sql() pair is auto-covered by this mini-driver.
@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(ray_session, oracle, name):
    qs = Q.queries()
    assert name in qs, f"query {name} missing"
    assert name in oracle, f"oracle for {name} missing"
    ok, msg = compare(qs[name](SF_DIR), oracle[name], SF_DIR)
    assert ok, msg


def test_every_oracle_key_has_query():
    qs, sqls = Q.queries(), Q.oracle_sql()
    assert set(sqls) <= set(qs)
