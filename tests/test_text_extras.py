"""Compression-ratio signal and BPE encode (tokenizer apply)."""

import numpy as np
import pyarrow as pa

import ray.data

from the_yelp_collaborative_knowledge_graph_ray.functions.bpe import (
    _merge_syms,
    _to_symbols,
    encode_with_merges,
    train_bpe,
    train_bpe_local,
)
from the_yelp_collaborative_knowledge_graph_ray.stages.textstats import (
    compression_ratio,
)


def _docs(texts, blocks=2):
    tables = []
    step = max(1, len(texts) // blocks)
    for i in range(0, len(texts), step):
        tables.append(pa.table({
            "doc_id": pa.array(range(i, min(i + step, len(texts))),
                               pa.int64()),
            "text": pa.array(texts[i:i + step], pa.string())}))
    return ray.data.from_arrow(tables)


def test_compression_ratio_orders_quality(ray_session):
    rep = "spam " * 200
    rng = np.random.default_rng(0)
    noise = "".join(chr(33 + int(c)) for c in rng.integers(0, 90, 800))
    df = compression_ratio(_docs([rep, noise])).to_pandas()
    assert df["ratio_fp"][0] < df["ratio_fp"][1]  # repetitive < random
    assert (df["n_bytes"] > 0).all()
    # deterministic: second run identical
    df2 = compression_ratio(_docs([rep, noise])).to_pandas()
    assert df.equals(df2)


def _encode_local(text, merges):
    n = 0
    for w in text.lower().split(" "):
        s = _to_symbols(w)
        for (_r, left, right, _m, _c) in merges:
            if " " not in s:
                break
            s = _merge_syms(s, left, right)
        n += s.count(" ") + 1
    return n


def test_bpe_encode_matches_sequential(ray_session):
    texts = ["the cat sat on the mat", "lower lowest low low",
             "a b  c"]  # double space -> empty word, kept both sides
    merges = train_bpe_local(texts, n_merges=6)
    merge_rows = [(r, a, b, m, c) for (r, a, b, m, c) in merges]
    got = encode_with_merges(_docs(texts), merge_rows).to_pandas()
    for i, t in enumerate(texts):
        assert int(got["n_subwords"][i]) == _encode_local(t, merges)
        assert int(got["n_words"][i]) == len(t.split(" "))
    # merges strictly reduce token count vs raw chars+end markers
    raw = sum(len(w) + 1 for w in texts[0].split(" "))
    assert int(got["n_subwords"][0]) < raw


def test_dup_chunk_stats_planted_duplicates(ray_session):
    """dup_chunk_stats flags exactly the planted cross-document duplicate
    chunks: doc 0 and doc 1 share their first 32-word chunk verbatim; doc
    2 is fully unique; doc 3 duplicates doc 0 entirely."""
    from the_yelp_collaborative_knowledge_graph_ray.stages.textstats import (
        dup_chunk_stats,
    )

    shared = " ".join(f"s{i}" for i in range(32))
    tail_a = " ".join(f"a{i}" for i in range(32))
    tail_b = " ".join(f"b{i}" for i in range(32))
    uniq = " ".join(f"u{i}" for i in range(70))
    texts = [shared + " " + tail_a,   # doc 0: chunk0 shared, chunk1 dup'd by doc 3
             shared + " " + tail_b,   # doc 1: chunk0 shared, chunk1 unique
             uniq,                    # doc 2: 3 chunks, all unique
             shared + " " + tail_a]   # doc 3: identical to doc 0
    got = dup_chunk_stats(_docs(texts)).to_pandas().set_index("doc_id")
    assert got.loc[0, "n_chunks"] == 2 and got.loc[0, "n_dup_chunks"] == 2
    assert got.loc[1, "n_chunks"] == 2 and got.loc[1, "n_dup_chunks"] == 1
    assert got.loc[2, "n_chunks"] == 3 and got.loc[2, "n_dup_chunks"] == 0
    assert got.loc[3, "n_dup_chunks"] == 2
    assert got.loc[0, "dup_frac_fp"] == 1_000_000
    assert got.loc[1, "dup_frac_fp"] == 500_000
    assert got.loc[2, "dup_frac_fp"] == 0
