"""Distributed BPE trainer == sequential dict reference, merge-for-merge."""

import pyarrow as pa

import ray.data

from the_yelp_collaborative_knowledge_graph_ray.functions.bpe import (
    train_bpe,
    train_bpe_local,
)

TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a hat and a bat and a cat",
    "low lower lowest low low",
    "newer newest new news",
    "the the the tht hte",
]


def _docs(blocks=3):
    tables = []
    step = max(1, len(TEXTS) // blocks)
    for i in range(0, len(TEXTS), step):
        tables.append(pa.table({
            "doc_id": pa.array(list(range(i, min(i + step, len(TEXTS)))),
                               pa.int64()),
            "text": pa.array(TEXTS[i:i + step], pa.string())}))
    return ray.data.from_arrow(tables)


def test_matches_sequential(ray_session):
    got = train_bpe(_docs(), n_merges=8).to_pylist()
    want = [{"rank": r, "left": a, "right": b, "merged": m, "count": c}
            for (r, a, b, m, c) in train_bpe_local(TEXTS, n_merges=8)]
    assert got == want
    assert len(got) == 8


def test_greedy_overlap_rule(ray_session):
    # "aaaa" with merge (a,a): left-to-right non-overlapping -> "aa aa",
    # so round 2 merges (aa, aa), not (a, aa)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["aaaa aaaa"], pa.string())}))
    got = train_bpe(docs, n_merges=2).to_pylist()
    assert (got[0]["left"], got[0]["right"]) == ("a", "a")
    assert (got[1]["left"], got[1]["right"]) == ("aa", "aa")
