"""Brute-force cross-checks for the windowed/greedy analytics operators.

Each test recomputes the operator with a direct, obviously-correct pure-
Python reference on the sf0.001 tables and asserts equality with the
distributed implementation — independent of the SQL oracles (which share
formulas; these share nothing)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from the_yelp_collaborative_knowledge_graph_ray import queries as Q

SF = "/root/testdata/sf0.001"


def _docs_rows():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def test_proximity_matches_bruteforce(ray_session):
    got = Q.queries()["search_proximity"](SF)
    exp = {}
    for did, text in _docs_rows():
        toks = text.lower().split(" ")
        p1 = [i for i, t in enumerate(toks) if t == Q.PROX_W1]
        p2 = [i for i, t in enumerate(toks) if t == Q.PROX_W2]
        if p1 and p2:
            mg = min(abs(a - b) for a in p1 for b in p2)
            if mg <= Q.PROX_K:
                exp[did] = mg
    assert dict(zip(got["doc_id"], got["min_gap"])) == exp
    assert len(exp) > 0  # non-vacuous on the fixture corpus


def test_window_cooccur_matches_bruteforce(ray_session):
    got = Q.queries()["text_window_cooccur"](SF).to_pandas()
    exp: dict[tuple, int] = {}
    ws = set(Q.COOC_WORDS)
    for _did, text in _docs_rows():
        toks = text.lower().split(" ")
        for i, a in enumerate(toks):
            if a not in ws:
                continue
            for d in range(1, Q.COOC_MAXDIST + 1):
                if i + d < len(toks) and toks[i + d] in ws:
                    k = (min(a, toks[i + d]), max(a, toks[i + d]), d)
                    exp[k] = exp.get(k, 0) + 1
    gotd = {(r.w1, r.w2, r.dist): r.n for r in got.itertuples()}
    assert gotd == exp and len(exp) > 0


def test_ttr_matches_bruteforce(ray_session):
    got = Q.queries()["text_type_token_ratio"](SF).to_pandas()
    for r in got.sample(20, random_state=7).itertuples():
        text = dict(_docs_rows())[r.doc_id]
        toks = text.lower().split(" ")
        assert r.n_tokens == len(toks)
        assert r.n_types == len(set(toks))
        assert r.ttr_fp == 10**6 * len(set(toks)) // len(toks)


def test_tree_depth2_beats_or_ties_every_split(ray_session):
    """The greedy root split must achieve the global miscls argmin over
    ALL (feature, threshold) candidates, recomputed by exhaustive scan."""
    tree = Q.queries()["ml_tree_depth2"](SF)
    root = tree[tree["node"] == "root"].iloc[0]
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_quantity", "l_discount",
                                "l_returnflag"]).to_pandas()
    q = li["l_quantity"].round().astype(np.int64).to_numpy()
    d = (li["l_discount"] * 100).round().astype(np.int64).to_numpy()
    pos = (li["l_returnflag"] == "R").to_numpy().astype(np.int64)
    best = None
    for f, arr in (("q", q), ("d", d)):
        for t in np.unique(arr)[:-1]:
            left = arr <= t
            pl, nl = pos[left].sum(), left.sum()
            pr, nr = pos.sum() - pl, len(arr) - nl
            mis = min(pl, nl - pl) + min(pr, nr - pr)
            if best is None or mis < best:
                best = int(mis)
    assert int(root["split_mis"]) == best
    # children partition the frame
    kids = tree[tree["node"] != "root"]
    assert int(kids["n"].sum()) == len(li)


def test_spike_days_window_guard(ray_session):
    out = Q.queries()["events_spike_days"](SF)
    assert (out["is_spike"][:7] == 0).all()
    # trailing sums recompute from the c column itself
    c = out["c"].to_numpy()
    for i in range(7, len(c)):
        assert out["trail7"][i] == c[i - 7:i].sum()
        assert out["is_spike"][i] == int(7 * c[i] > 2 * c[i - 7:i].sum())


def test_rake_scores_match_bruteforce(ray_session):
    from the_yelp_collaborative_knowledge_graph_ray.stages.textstats import (
        STOPWORDS,
    )
    got = Q.queries()["text_rake_keywords"](SF)
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    sw = set(STOPWORDS)
    for _did, text in _docs_rows():
        toks = text.lower().split(" ")
        phrase: list[str] = []
        for t in toks + ["the"]:  # sentinel stopword flushes the tail
            if t in sw:
                for w in phrase:
                    freq[w] = freq.get(w, 0) + 1
                    deg[w] = deg.get(w, 0) + len(phrase)
                phrase = []
            else:
                phrase.append(t)
    exp = sorted(((1000 * deg[w] // freq[w], w) for w in freq),
                 key=lambda x: (-x[0], x[1]))[:Q.RAKE_TOP]
    gotl = [(r.score_fp, r.word) for r in got.itertuples()]
    assert gotl == exp


def test_decay_engagement_exact(ray_session):
    got = Q.queries()["events_decay_engagement"](SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "value"]).to_pandas()
    day = (ev["ts"].astype("int64") // 10**6 // 86400).to_numpy()
    v = (ev["value"] * 100).round().astype(np.int64).to_numpy()
    age = np.minimum(day.max() - day, 62)
    s = pd.Series(v >> age).groupby(ev["user_id"]).sum()
    assert dict(zip(got["user_id"], got["decay_score_c"])) == s.to_dict()


def test_sax_word_census_invariants(ray_session):
    from the_yelp_collaborative_knowledge_graph_ray import queries as Q
    from the_yelp_collaborative_knowledge_graph_ray.queries import SAX_WORD
    df = Q.queries()["events_sax_motifs"]("/root/testdata/sf0.001")
    assert set("".join(df["word"])) <= set("abc")
    assert (df["word"].str.len() == SAX_WORD).all()
    # every sliding window contributes exactly one word
    ks = Q.queries()["events_runs_test_median"]("/root/testdata/sf0.001")
    T = int(ks["n_days"].iloc[0])
    assert int(df["n"].sum()) == T - SAX_WORD + 1
    assert df["first_i"].between(0, T - SAX_WORD).all()


def test_kmv_estimate_within_loose_bounds(ray_session):
    from the_yelp_collaborative_knowledge_graph_ray import queries as Q
    df = Q.queries()["approx_distinct_kmv"]("/root/testdata/sf0.001")
    est, exact = int(df["est"].iloc[0]), int(df["n_exact"].iloc[0])
    assert exact > 0 and 0.3 * exact <= est <= 3 * exact


def test_pps_systematic_invariants(ray_session):
    from the_yelp_collaborative_knowledge_graph_ray import queries as Q
    from the_yelp_collaborative_knowledge_graph_ray.queries import \
        PPS_N_SAMPLE
    df = Q.queries()["sample_pps_systematic"]("/root/testdata/sf0.001")
    total_hits = int(df["n_hits"].sum())
    # one hit per selection point; boundary rounding allows +-1
    assert abs(total_hits - PPS_N_SAMPLE) <= 1
    assert (df["n_hits"] >= 1).all()
