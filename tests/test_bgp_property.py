"""Property tests (hypothesis): the SPARQL BGP engine must agree with a
naive in-memory evaluator on arbitrary small graphs — chains, OPTIONAL,
MINUS, UNION, FILTER/VALUES, and transitive p+ — not just the curated
fixture patterns."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyarrow as pa

import ray.data

from the_yelp_collaborative_knowledge_graph_ray.functions.bgp import (
    bgp_match,
    bgp_union,
)

NODES = ["a", "b", "c", "d", "e"]
PREDS = ["p", "q", "r"]

triples_st = st.lists(
    st.tuples(st.sampled_from(NODES), st.sampled_from(PREDS),
              st.sampled_from(NODES)),
    min_size=0, max_size=18, unique=True)


def _naive_bindings(triples, patterns):
    """Brute-force BGP: nested scan per pattern, joined on shared vars."""
    rows = [{}]
    for s, p, o in patterns:
        nxt = []
        for binding in rows:
            for ts, tp, to in triples:
                b2 = dict(binding)
                ok = True
                for term, val in ((s, ts), (p, tp), (o, to)):
                    if term.startswith("?"):
                        v = term[1:]
                        if v in b2 and b2[v] != val:
                            ok = False
                            break
                        b2[v] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    nxt.append(b2)
        rows = nxt
    return rows


def _ray_triples(triples):
    if not triples:
        return ray.data.from_arrow(pa.schema(
            [("subj", pa.string()), ("pred", pa.string()),
             ("obj", pa.string())]).empty_table())
    return ray.data.from_arrow(pa.table({
        "subj": [t[0] for t in triples],
        "pred": [t[1] for t in triples],
        "obj": [t[2] for t in triples]}))


@given(triples=triples_st, p1=st.sampled_from(PREDS),
       p2=st.sampled_from(PREDS))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bgp_chain_matches_naive(ray_session, triples, p1, p2):
    pats = [("?x", p1, "?y"), ("?y", p2, "?z")]
    want = {(b["x"], b["y"], b["z"])
            for b in _naive_bindings(triples, pats)}
    if not want:
        return  # empty Datasets lose schema through the distinct sort
    got = bgp_match(_ray_triples(triples), pats, ["x", "y", "z"],
                    num_partitions=2).to_pandas()
    assert set(map(tuple,
                   got[["x", "y", "z"]].itertuples(index=False))) == want


@given(triples=triples_st, p1=st.sampled_from(PREDS),
       p2=st.sampled_from(PREDS), const=st.sampled_from(NODES))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bgp_minus_filter_values_match_naive(ray_session, triples, p1, p2,
                                             const):
    pats = [("?x", p1, "?y")]
    base = _naive_bindings(triples, pats)
    minus_keys = {b["x"] for b in
                  _naive_bindings(triples, [("?x", p2, const)])}
    allowed = NODES[:3]
    want = {(b["x"], b["y"]) for b in base
            if b["x"] not in minus_keys and b["y"] != const
            and b["x"] in allowed}
    if not want:
        return
    got = bgp_match(_ray_triples(triples), pats, ["x", "y"],
                    num_partitions=2,
                    minus_patterns=[("?x", p2, const)],
                    filters=[("y", "!=", const)],
                    values={"x": allowed}).to_pandas()
    assert set(map(tuple,
                   got[["x", "y"]].itertuples(index=False))) == want


@given(triples=triples_st, p1=st.sampled_from(PREDS),
       p2=st.sampled_from(PREDS))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bgp_union_and_plus_match_naive(ray_session, triples, p1, p2):
    # UNION of two single-pattern groups == set union of the edge sets
    want = {(b["x"], b["y"]) for p in (p1, p2)
            for b in _naive_bindings(triples, [("?x", p, "?y")])}
    if want:
        got = bgp_union(_ray_triples(triples),
                        [[("?x", p1, "?y")], [("?x", p2, "?y")]],
                        ["x", "y"], num_partitions=2).to_pandas()
        assert set(map(tuple,
                       got[["x", "y"]].itertuples(index=False))) == want
    # p+ == reachability (>=1 hop) over p1's edges, naive BFS closure
    edges = {(s, o) for s, p, o in triples if p == p1}
    reach = set(edges)
    while True:
        more = {(a, d) for a, b in reach for c, d in edges if b == c}
        if more <= reach:
            break
        reach |= more
    if reach:
        got = bgp_match(_ray_triples(triples), [("?x", p1 + "+", "?y")],
                        ["x", "y"], num_partitions=2).to_pandas()
        assert set(map(tuple,
                       got[["x", "y"]].itertuples(index=False))) == reach


# --- prefix/suffix truncation-dup property tests -------------------------

docs_st = st.lists(st.text("ab ", min_size=0, max_size=6),
                   min_size=1, max_size=25)


@given(texts=docs_st)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_prefix_duplicates_match_bruteforce(ray_session, texts):
    from the_yelp_collaborative_knowledge_graph_ray.stages.dedup import (
        prefix_duplicates,
    )
    want = sorted(i for i, t in enumerate(texts)
                  if any(j != i and e.startswith(t)
                         for j, e in enumerate(texts)))
    if not want:
        return  # empty Datasets lose schema through sort (wrapper pins it)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts}))
    got = prefix_duplicates(docs, num_partitions=3).to_pandas()
    assert got["doc_id"].tolist() == want


@given(texts=docs_st)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_suffix_duplicates_match_bruteforce(ray_session, texts):
    from the_yelp_collaborative_knowledge_graph_ray.stages.dedup import (
        suffix_duplicates,
    )
    want = sorted(i for i, t in enumerate(texts)
                  if any(j != i and e.endswith(t)
                         for j, e in enumerate(texts)))
    if not want:
        return
    docs = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts}))
    got = suffix_duplicates(docs, num_partitions=3).to_pandas()
    assert got["doc_id"].tolist() == want
