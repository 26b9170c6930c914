"""Property tests (hypothesis): the engine's core grouped primitive must
agree with DuckDB on arbitrary inputs, not just the curated fixtures."""

import duckdb
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray.data

from the_yelp_collaborative_knowledge_graph_ray.functions.grouped import (
    grouped_count, sorted_aggregate)

rows = st.lists(
    st.tuples(st.integers(0, 5), st.text("abc", max_size=2),
              st.integers(-10**9, 10**9)),
    min_size=0, max_size=150)


@given(data=rows)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_sorted_aggregate_matches_duckdb(ray_session, data):
    t = pa.table({
        "k1": pa.array([d[0] for d in data], pa.int64()),
        "k2": pa.array([d[1] for d in data], pa.string()),
        "x": pa.array([d[2] for d in data], pa.int64())})
    got = sorted_aggregate(
        ray.data.from_arrow(t).repartition(3), ["k1", "k2"],
        [("x", "sum"), ("x", "min"), ("x", "max"), ("x", "count")],
        ["k1", "k2", "s", "mn", "mx", "n"], 2).to_pandas()
    if not data:
        assert got.empty
        return
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql("""
        SELECT k1, k2, CAST(sum(x) AS BIGINT) AS s, min(x) AS mn,
               max(x) AS mx, count(x) AS n
        FROM t GROUP BY 1, 2 ORDER BY 1, 2""").df()
    got = got.sort_values(["k1", "k2"]).reset_index(drop=True)
    want = want.sort_values(["k1", "k2"]).reset_index(drop=True)
    assert got.to_dict("list") == want.to_dict("list")


@given(data=rows)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_grouped_count_matches_duckdb(ray_session, data):
    t = pa.table({
        "k1": pa.array([d[0] for d in data], pa.int64()),
        "k2": pa.array([d[1] for d in data], pa.string())})
    got = grouped_count(ray.data.from_arrow(t).repartition(3),
                        ["k1", "k2"], "n", 2).to_pandas()
    if not data:
        assert got.empty
        return
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql("SELECT k1, k2, count(*) AS n FROM t GROUP BY 1, 2 "
                   "ORDER BY 1, 2").df()
    got = got.sort_values(["k1", "k2"]).reset_index(drop=True)
    want = want.sort_values(["k1", "k2"]).reset_index(drop=True)
    assert got.to_dict("list") == want.to_dict("list")


two_tables = st.tuples(
    st.lists(st.integers(0, 15), min_size=0, max_size=80),
    st.lists(st.integers(0, 15), min_size=0, max_size=80))


@given(ab=two_tables)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_set_ops_and_anti_join_match_duckdb(ray_session, ab):
    """INTERSECT / EXCEPT / anti-join == DuckDB on arbitrary multisets
    (duplicates, empty sides, disjoint and identical key ranges)."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.setops import (
        anti_join, distinct_set_op)
    ka, kb = ab
    ta = pa.table({"k": pa.array(ka, pa.int64())})
    tb = pa.table({"k": pa.array(kb, pa.int64())})
    a = ray.data.from_arrow(ta).repartition(3)
    b = ray.data.from_arrow(tb).repartition(2)
    con = duckdb.connect()
    con.register("a", ta)
    con.register("b", tb)
    for op, sql in (("intersect", "INTERSECT"), ("except", "EXCEPT")):
        got = sorted(r["k"] for r in distinct_set_op(a, b, ["k"],
                                                     op).take_all())
        want = sorted(r[0] for r in con.sql(
            f"SELECT k FROM a {sql} SELECT k FROM b").fetchall())
        assert got == want, op
    got = sorted(r["k"] for r in anti_join(
        a, b, "k", "k", [("k", pa.int64())]).take_all())
    want = sorted(r[0] for r in con.sql(
        "SELECT k FROM a WHERE k NOT IN (SELECT k FROM b)"
        if kb else "SELECT k FROM a").fetchall())
    assert got == want


@given(st.lists(st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
                min_size=1, max_size=400),
       st.integers(min_value=1, max_value=6))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_heavy_hitters_matches_duckdb(ray_session, keys, k):
    """MG candidates + exact verify == plain GROUP BY HAVING, under
    adversarial multisets AND block boundaries (8 tiny blocks spread every
    key so no key need be heavy in any single block)."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.heavyhitters \
        import heavy_hitters

    t = pa.table({"k": pa.array(keys, pa.string())})
    ds = ray.data.from_arrow(t).repartition(8)
    got = heavy_hitters(ds, "k", k).to_pandas()
    want = duckdb.sql(
        f"""SELECT k AS key, count(*) AS cnt FROM t
            GROUP BY 1 HAVING {k + 1} * count(*) > (SELECT count(*) FROM t)
            ORDER BY cnt DESC, key""").df()
    assert got.values.tolist() == want.values.tolist()


@given(st.dictionaries(st.integers(min_value=-50, max_value=50),
                       st.integers(min_value=-1000, max_value=1000),
                       max_size=40),
       st.dictionaries(st.integers(min_value=-50, max_value=50),
                       st.integers(min_value=-1000, max_value=1000),
                       max_size=40))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_full_outer_unique_matches_duckdb(ray_session, lmap, rmap):
    """full_outer_unique == SQL FULL OUTER JOIN (zero-fill + flags) on
    arbitrary unique-keyed sides, including empty and disjoint ones."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.joins import (
        full_outer_unique,
    )

    lt = pa.table({"k": pa.array(list(lmap), pa.int64()),
                   "lv": pa.array(list(lmap.values()), pa.int64())})
    rt = pa.table({"k": pa.array(list(rmap), pa.int64()),
                   "rv": pa.array(list(rmap.values()), pa.int64())})
    got = full_outer_unique(
        ray.data.from_arrow(lt).repartition(3),
        ray.data.from_arrow(rt).repartition(3), "k",
        [("lv", pa.int64())], [("rv", pa.int64())],
        num_partitions=2).to_pandas()
    if not lmap and not rmap:
        assert len(got) == 0
        return
    got = got.sort_values("k").reset_index(drop=True)
    want = duckdb.sql("""
        SELECT COALESCE(lt.k, rt.k) AS k,
               CASE WHEN lt.k IS NULL THEN 0 ELSE 1 END AS in_left,
               CASE WHEN rt.k IS NULL THEN 0 ELSE 1 END AS in_right,
               COALESCE(lt.lv, 0) AS lv, COALESCE(rt.rv, 0) AS rv
        FROM lt FULL OUTER JOIN rt ON lt.k = rt.k ORDER BY 1""").df()
    assert got.values.tolist() == want.values.tolist()


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=8),
                          st.integers(min_value=0, max_value=8)),
                min_size=1, max_size=200))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_skyline_matches_duckdb(ray_session, pts):
    """Per-block pareto prune + final pass == strict-dominance NOT EXISTS,
    under heavy duplicate mass and arbitrary block splits (tiny value
    domain forces ties in both dimensions)."""
    from the_yelp_collaborative_knowledge_graph_ray.pipelines.relational \
        import pareto_block

    t = pa.table({"l_orderkey": pa.array(range(len(pts)), pa.int64()),
                  "l_linenumber": pa.array([0] * len(pts), pa.int32()),
                  "price_c": pa.array([p for p, _ in pts], pa.int64()),
                  "qty": pa.array([q for _, q in pts], pa.int64())})
    ds = ray.data.from_arrow(t).repartition(4)
    out = ds.map_batches(pareto_block, batch_format="pyarrow") \
        .repartition(1).map_batches(pareto_block, batch_format="pyarrow",
                                    batch_size=None).to_pandas()
    got = out.sort_values(["l_orderkey"]).reset_index(drop=True)
    want = duckdb.sql("""
        SELECT l_orderkey, l_linenumber, price_c, qty FROM t a
        WHERE NOT EXISTS (
          SELECT 1 FROM t b
          WHERE b.price_c <= a.price_c AND b.qty >= a.qty
            AND (b.price_c < a.price_c OR b.qty > a.qty))
        ORDER BY 1""").df()
    assert got.values.tolist() == want.values.tolist()


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=3),
                          st.integers(min_value=0, max_value=4)),
                min_size=1, max_size=120),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_top_n_with_ties_matches_duckdb(ray_session, rows_kv, n):
    """WITH TIES top-n == SQL RANK() <= n under tie-saturated domains and
    arbitrary block splits (value domain of 5 forces giant tie runs)."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.topn import (
        top_n_with_ties_per_key,
    )

    t = pa.table({"k": pa.array([k for k, _ in rows_kv], pa.int64()),
                  "rid": pa.array(range(len(rows_kv)), pa.int64()),
                  "v": pa.array([v for _, v in rows_kv], pa.int64())})
    got = top_n_with_ties_per_key(
        ray.data.from_arrow(t).repartition(4), ["k"], [("v", False)], n,
        2).to_pandas().sort_values(["k", "rid"]).reset_index(drop=True)
    want = duckdb.sql(f"""
        SELECT k, rid, v, rank FROM (
          SELECT k, rid, v,
                 CAST(RANK() OVER (PARTITION BY k ORDER BY v DESC)
                      AS BIGINT) AS rank
          FROM t)
        WHERE rank <= {n} ORDER BY k, rid""").df()
    assert got[["k", "rid", "v", "rank"]].values.tolist() == \
        want.values.tolist()


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=12),
                          st.integers(min_value=0, max_value=12)),
                min_size=1, max_size=30))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_transitive_closure_matches_duckdb(ray_session, raw_edges):
    """Path-doubling closure == WITH RECURSIVE on arbitrary digraphs —
    chains (multi-round doubling), DAGs, CYCLES and self-loops."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.datalog \
        import transitive_closure

    t = pa.table({"src": pa.array([f"n{a}" for a, _ in raw_edges],
                                  pa.string()),
                  "dst": pa.array([f"n{b}" for _, b in raw_edges],
                                  pa.string())})
    got = sorted((r["src"], r["dst"]) for r in transitive_closure(
        ray.data.from_arrow(t).repartition(3), "src", "dst").take_all())
    want = sorted((a, b) for a, b in duckdb.sql("""
        WITH RECURSIVE r(s, d) AS (
          SELECT src, dst FROM t
          UNION
          SELECT r.s, t.dst FROM r JOIN t ON t.src = r.d)
        SELECT s, d FROM r""").fetchall())
    assert got == want


@given(st.lists(st.text("abcdef", min_size=1, max_size=4), min_size=1,
                max_size=120, unique=True))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_zip_with_index_order_by_is_sort_rank(ray_session, names):
    """zip_with_index(order_by=...) over a sorted Dataset assigns the
    exact lexicographic rank regardless of to_arrow_refs block order
    (which is unstable) — many tiny blocks force the reorder path."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.joins import (
        zip_with_index,
    )

    t = pa.table({"node": pa.array(names, pa.string())})
    ds = ray.data.from_arrow(t).repartition(5).sort("node")
    got = {r["node"]: r["pos"]
           for r in zip_with_index(ds, "pos", order_by="node").take_all()}
    want = {n: i for i, n in enumerate(sorted(names))}
    assert got == want
