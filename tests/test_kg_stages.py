"""Unit tests per KG stage on the tiny fixture (SURVEY.md §5 strategy)."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data

from the_yelp_collaborative_knowledge_graph_ray import config as C
from the_yelp_collaborative_knowledge_graph_ray.pipelines.kg import (
    load_config_tables,
)
from the_yelp_collaborative_knowledge_graph_ray.stages import (
    canonicalize as canon,
)
from the_yelp_collaborative_knowledge_graph_ray.stages import (
    extract,
    link,
    materialize,
    mentions,
)


def _batch(**cols):
    return pa.table(cols)


def test_extract_structural_counts():
    b = _batch(
        conv_id=pa.array(["c1", "c1"]),
        turn_idx=pa.array([0, 1], pa.int32()),
        role=pa.array(["user", "tool"]),
        text=pa.array(["hello", "world"]),
        tool=pa.array([None, "search"]),
        ts=pa.array([1_700_000_000_000_000, 1_700_000_037_000_000],
                    pa.timestamp("us")))
    t = extract.extract_structural(b)
    # 7 kinds per turn + 2 tool triples for the one real tool
    assert t.num_rows == 7 * 2 + 2
    preds = set(t["pred"].to_pylist())
    assert C.PRED_USES_TOOL in preds and C.RDF_TYPE in preds
    # text literal unchanged (per-turn text equality invariant)
    texts = t.filter(pc.equal(t["pred"], C.PRED_TEXT))["obj"].to_pylist()
    assert sorted(texts) == ["hello", "world"]


def test_dead_letter_reasons():
    b = _batch(
        conv_id=pa.array(["c1"] * 3),
        turn_idx=pa.array([0, 1, 2], pa.int32()),
        role=pa.array(["user"] * 3),
        text=pa.array(["x"] * 3),
        tool=pa.array(["None", "", "sql"]),
        ts=pa.array([0, 1, 2], pa.timestamp("us")))
    d = extract.extract_dead_letter(b)
    assert d.num_rows == 2
    assert set(d["value"].to_pylist()) == {"None", ""}


def test_mention_detector_substring_semantics():
    det = mentions.MentionDetector(["coffee", "Coffee & Tea"])
    b = _batch(
        conv_id=pa.array(["c1", "c1", "c2"]),
        turn_idx=pa.array([0, 1, 0], pa.int32()),
        text=pa.array(["I love Coffee & Tea!", "no mentions here",
                       "COFFEE time"]))
    t = det(b)
    got = sorted((s.rsplit("/", 2)[-2] + "/" + s.rsplit("/", 2)[-1],
                  o.rsplit("/", 1)[-1])
                 for s, o in zip(t["subj"].to_pylist(), t["obj"].to_pylist()))
    # turn c1/0 matches both vocab entries -> two distinct norms
    assert got == [("c1/0", "coffee"), ("c1/0", "coffee_tea"),
                   ("c2/0", "coffee")]


def test_canonical_map_local_vs_distributed(ray_session, sf_tiny):
    alias = pq.read_table(f"{sf_tiny}/alias_table.parquet")
    rows = list(zip(alias["surface_norm"].to_pylist(),
                    alias["canonical"].to_pylist()))
    local = canon.build_canonical_map_local(rows)
    dist = canon.build_canonical_map(rows, num_partitions=2)
    assert local == dist


def test_canonicalize_rewrites_and_splits():
    cmap = {"coffees": ("coffee",), "coffee_tea": ("coffee", "tea")}
    rw = canon.MentionRewriter(cmap)
    n = 3
    b = pa.table({
        "subj": ["t1", "t2", "t3"],
        "pred": [C.PRED_MENTIONS] * n,
        "obj": [C.ENT + "mention/coffees", C.ENT + "mention/coffee_tea",
                C.ENT + "mention/plain"],
        "obj_is_literal": [False] * n,
        "obj_datatype": pa.nulls(n, pa.string()),
        "src_conv_id": ["c"] * n,
        "src_turn_idx": pa.array([0, 0, 0], pa.int32()),
    }, schema=extract.TRIPLE_SCHEMA)
    out = rw(b)
    objs = sorted(o.rsplit("/", 1)[-1] for o in out["obj"].to_pylist())
    assert objs == ["coffee", "coffee", "plain", "tea"]
    assert out.num_rows == 4


def test_canonicalize_shuffle_equals_broadcast(ray_session):
    """The shuffle-join rewrite (the too-big-to-broadcast scale path) must
    be row-identical to the broadcast rewrite — multi-target splits,
    unmapped pass-through forms, and groups spread across blocks all
    included; the auto selector must pick each path at its threshold."""
    import random

    rng = random.Random(13)
    forms = [f"form{i:03d}" for i in range(40)]
    cmap = {}
    for i, f in enumerate(forms[:25]):
        if i % 5 == 0:
            cmap[f] = (f"canon{i}a", f"canon{i}b")  # split hyperedge
        else:
            cmap[f] = (f"canon{i}",)
    n = 2000
    objs = [C.ENT + "mention/" + rng.choice(forms) for _ in range(n)]
    triples = pa.table({
        "subj": [f"t{i}" for i in range(n)],
        "pred": [C.PRED_MENTIONS] * n,
        "obj": objs,
        "obj_is_literal": [False] * n,
        "obj_datatype": pa.nulls(n, pa.string()),
        "src_conv_id": ["c"] * n,
        "src_turn_idx": pa.array([0] * n, pa.int32()),
    }, schema=extract.TRIPLE_SCHEMA)
    ds = ray.data.from_arrow(triples).repartition(7)

    key = ["subj", "pred", "obj"]
    bcast = canon.canonicalize_mentions(ds, cmap).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    shuf = canon.canonicalize_mentions_shuffle(
        ds, canon.canon_map_to_dataset(cmap), num_partitions=3) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    assert bcast.equals(shuf)
    # auto selector: tiny threshold forces the shuffle path, default the
    # broadcast path — both equal
    auto_s = canon.canonicalize_mentions_auto(ds, cmap, max_broadcast=1) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    auto_b = canon.canonicalize_mentions_auto(ds, cmap) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    assert auto_s.equals(bcast) and auto_b.equals(bcast)


def test_link_scorer_exact_overrides_and_threshold(sf_tiny):
    snap = link.load_snapshot(sf_tiny)
    scorer = link.LinkScorer(snap)
    b = pa.table({"form": ["coffee", "zzzz_no_match_qq"]})
    out = scorer(b)
    d = dict(zip(out["form"].to_pylist(), out["entity_id"].to_pylist()))
    assert "coffee" in d and d["coffee"].startswith("Q")
    assert "zzzz_no_match_qq" not in d
    # override precedence: force a different entity for a known form
    snap2 = link.EntitySnapshot([("Q1", "coffee", [])], {"coffee": "Q9999"})
    out2 = link.LinkScorer(snap2)(pa.table({"form": ["coffee"]}))
    assert out2["entity_id"].to_pylist() == ["Q9999"]


def test_link_scorer_csr_matches_per_form_reference(sf_tiny):
    """The vectorized CSR candidate-generation + reduceat top-1 engine must
    reproduce the per-form reference logic exactly (set-union postings,
    per-form matmul, epsilon tie-break, min-entity-id) — including a
    duplicate label under two entity ids (tie) and an empty form."""
    import random

    import numpy as np

    from the_yelp_collaborative_knowledge_graph_ray import config as C

    random.seed(7)
    syll = ["ba", "co", "di", "fu", "ga", "hi", "jo", "ka", "lu", "me",
            "no", "pi", "qu", "ra", "su", "ti", "vo", "wa", "xe", "yo"]

    def word():
        return "".join(random.choice(syll)
                       for _ in range(random.randint(2, 5)))

    ents = [(f"Q{i:06d}", word(), []) for i in range(500)]
    ents.append(("Q000000a", ents[3][1], []))  # duplicate label, tie case
    snap = link.EntitySnapshot(ents, {"co": "QOVR"})
    forms = [word() for _ in range(300)] + [ents[3][1], "", "co"]

    posting = {g.as_py(): snap.post_rows[snap.post_off[k]:
                                         snap.post_off[k + 1]]
               for k, g in enumerate(snap.gram_vocab)}

    def reference(fs):
        vecs = link._embed(fs)
        out = []
        for i, f in enumerate(fs):
            if f in snap.overrides:
                out.append((f, snap.overrides[f]))
                continue
            cand = set()
            for g in link._ngrams(f):
                p = posting.get(g)
                if p is not None:
                    cand.update(p.tolist())
            if not cand:
                continue
            idx = np.fromiter(cand, np.int64)
            idx.sort()
            scores = snap.vectors[idx] @ vecs[i]
            best = scores.max()
            if best < C.LINK_THRESHOLD:
                continue
            ties = idx[scores >= best - 1e-7]
            out.append((f, min(snap.entity_ids[j] for j in ties)))
        return out

    got = link.LinkScorer(snap)(pa.table({"form": pa.array(forms)}))
    assert list(zip(got["form"].to_pylist(),
                    got["entity_id"].to_pylist())) == reference(forms)


def test_embed_vectorized_bitwise_matches_scalar():
    """The batch-vectorized hashing-trick embedder must be BITWISE equal
    to the per-string reference (±1 accumulands are small integers, exact
    in float32 under any accumulation order)."""
    import random

    import numpy as np

    random.seed(3)
    strs = (["coffee", "", "a", "machine learning", "##", "ünïcode tëst",
             "x" * 500]
            + ["".join(random.choice("abcdef gh")
                       for _ in range(random.randint(0, 40)))
               for _ in range(500)])
    assert np.array_equal(link._embed(strs), link._embed_scalar(strs))


def test_link_encoder_registry_parity():
    """ST1 model seam: the encoder swap is ONE config flag. Every
    registry lane is asserted to the SAME interface contract — and the
    transformer lane now ALWAYS runs: against the real SentenceTransformer
    when the wheel is importable, else against the vendored pure-numpy
    mini transformer (round 5 — this lane skipped in rounds 1-4)."""
    import numpy as np
    import pytest

    enc = link.get_encoder("hashed")
    v = enc(["coffee", "machine learning", ""])
    assert v.dtype == np.float32 and v.shape[0] == 3
    norms = np.linalg.norm(v, axis=1)
    assert np.allclose(norms[norms > 0], 1.0, atol=1e-5)
    assert np.array_equal(v, enc(["coffee", "machine learning", ""]))

    with pytest.raises(ValueError):
        link.get_encoder("nope")

    try:
        import sentence_transformers  # noqa: F401
        real = link.get_encoder("transformer")
    except ImportError:
        real = link.get_encoder("mini_transformer")
    r = real(["coffee", "machine learning"])
    assert r.dtype == np.float32 and r.shape[0] == 2
    assert np.allclose(np.linalg.norm(r, axis=1), 1.0, atol=1e-3)
    assert np.array_equal(r, real(["coffee", "machine learning"]))


def test_mini_transformer_is_a_real_sequence_model():
    """The vendored lane must behave like a transformer, not a rebranded
    bag-of-ngrams: deterministic, batch-consistent, sensitive to token
    ORDER (attention + positions see sequence; a hash bag cannot), and
    identical strings map to identical vectors."""
    import numpy as np

    enc = link.get_encoder("mini_transformer")
    a = enc(["machine learning", "learning machine", "machine learning"])
    # identical inputs identical; permuted words genuinely different
    assert np.array_equal(a[0], a[2])
    assert not np.allclose(a[0], a[1], atol=1e-4)
    # batch composition must not change a string's vector
    solo = enc(["machine learning"])
    assert np.allclose(a[0], solo[0], atol=1e-6)
    # the hashed lane CANNOT separate permutations of the same words at
    # the word level only through char-ngrams spanning the boundary —
    # document the property that motivates the transformer lane
    h = link.get_encoder("hashed")(["ab cd", "cd ab"])
    m = enc(["ab cd", "cd ab"])
    hash_gap = float(1.0 - h[0] @ h[1])
    mini_gap = float(1.0 - m[0] @ m[1])
    assert mini_gap > 1e-4  # order carries signal in the mini lane
    assert mini_gap > hash_gap * 0.0  # (hash gap may be 0 or small)


def test_link_scorer_end_to_end_with_mini_transformer(sf_tiny, monkeypatch):
    """The whole snapshot-build + scorer path runs under the vendored
    transformer lane via the one config flag: exact-name forms still link
    to their entity (same string -> same vector -> cosine 1, threshold-
    and weight-independent) and overrides still win. Precision against
    garbage forms is NOT asserted — an untrained random-weight encoder
    cannot promise it; that quality gap is exactly what the measured
    encoder-lane comparison in BASELINE.md records."""
    from the_yelp_collaborative_knowledge_graph_ray import config as C2

    monkeypatch.setattr(C2, "LINK_ENCODER", "mini_transformer")
    snap = link.load_snapshot(sf_tiny)
    scorer = link.LinkScorer(snap)
    out = scorer(pa.table({"form": ["coffee"]}))
    d = dict(zip(out["form"].to_pylist(), out["entity_id"].to_pylist()))
    assert d.get("coffee", "").startswith("Q")
    snap2 = link.EntitySnapshot([("Q1", "coffee", [])],
                                {"coffee": "Q9999"})
    out2 = link.LinkScorer(snap2)(pa.table({"form": ["coffee"]}))
    assert out2["entity_id"].to_pylist() == ["Q9999"]


def test_near_miss_pairs_do_not_merge(sf_tiny):
    """Adversarial fixture pairs (FIXTURES.md §2) must link to distinct
    entities and never canonicalize together."""
    snap = link.load_snapshot(sf_tiny)
    scorer = link.LinkScorer(snap)
    from the_yelp_collaborative_knowledge_graph_ray.fixtures.generator import (
        NEAR_MISS,
    )
    forms = [f for pair in NEAR_MISS for f in pair]
    out = scorer(pa.table({"form": forms}))
    d = dict(zip(out["form"].to_pylist(), out["entity_id"].to_pylist()))
    for a, b in NEAR_MISS:
        assert d[a] != d[b], (a, b)
    alias = pq.read_table(f"{sf_tiny}/alias_table.parquet")
    rows = list(zip(alias["surface_norm"].to_pylist(),
                    alias["canonical"].to_pylist()))
    cmap = canon.build_canonical_map_local(rows)
    for a, b in NEAR_MISS:
        assert cmap.get(a, (a,)) != cmap.get(b, (b,))


def test_materialize_dedup_and_sort(ray_session):
    n = 4
    b = pa.table({
        "subj": ["s2", "s1", "s1", "s1"],
        "pred": ["p"] * n,
        "obj": ["o", "o", "o", "o2"],
        "obj_is_literal": [False] * n,
        "obj_datatype": pa.nulls(n, pa.string()),
        "src_conv_id": ["c"] * n,
        "src_turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
    }, schema=extract.TRIPLE_SCHEMA)
    ds = ray.data.from_arrow(b)
    out = materialize.materialize(ds).to_pandas()
    assert len(out) == 3
    assert out["subj"].tolist() == ["s1", "s1", "s2"]
    assert out["obj"].tolist() == ["o", "o2", "o"]


def test_ntriples_renderer():
    b = pa.table({
        "subj": ["http://e/s"], "pred": ["http://e/p"],
        "obj": ['va"l\nue'], "obj_is_literal": [True],
        "obj_datatype": [C.XSD_STRING]})
    line = materialize.render_ntriples(b)["text"].to_pylist()[0]
    assert line == ('<http://e/s> <http://e/p> '
                    '"va\\"l\\nue"^^<http://www.w3.org/2001/XMLSchema#string> .')


def test_materialize_unsorted_path(ray_session):
    b = pa.table({
        "subj": ["s1", "s1", "s2"], "pred": ["p"] * 3,
        "obj": ["o", "o", "o"], "obj_is_literal": [False, False, True],
        "obj_datatype": pa.array([None, None, C.XSD_STRING]),
        "src_conv_id": ["c"] * 3,
        "src_turn_idx": pa.array([0, 1, 2], pa.int32()),
    }, schema=extract.TRIPLE_SCHEMA)
    out = materialize.materialize(
        ray.data.from_arrow(b), sort=False).to_pandas()
    assert len(out) == 2
    got = set(zip(out.subj, out.obj_is_literal,
                  out.obj_datatype.where(out.obj_datatype.notna(), None)))
    assert got == {("s1", False, None), ("s2", True, C.XSD_STRING)}


def test_sorted_block_dedup_is_exact_under_block_splits(ray_session):
    """Regression guard for the materialize dedup invariant (module docstring
    of stages/materialize.py): sort + per-block neighbor dedup must be an
    EXACT global dedup even when a hot key vastly exceeds the target block
    size. If a Ray upgrade starts splitting equal sort keys across blocks,
    this fails."""
    from ray.data import DataContext
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 256 * 1024  # force aggressive splitting
        hot = ["hot%d" % (i % 3) for i in range(300_000)]
        uniq = [f"k{i:06d}" for i in range(30_000)]
        n = len(hot) + len(uniq)
        b = pa.table({
            "subj": hot + uniq, "pred": ["p"] * n, "obj": ["o"] * n,
            "obj_is_literal": [False] * n,
            "obj_datatype": pa.nulls(n, pa.string()),
            "src_conv_id": ["c"] * n,
            "src_turn_idx": pa.array([0] * n, pa.int32()),
        }, schema=extract.TRIPLE_SCHEMA)
        ds = ray.data.from_arrow(b).repartition(16)
        out = materialize.materialize(ds)
        assert out.count() == 30_003
    finally:
        ctx.target_max_block_size = old


def test_prefix_encode_order_and_roundtrip():
    """(bucket, suffix) sort order == full-string order; encoding injective.

    Exercises prefixed IRIs, exact-prefix strings, arbitrary literals (some
    colliding with prefix starts), and the empty string."""
    import random
    import string as _s
    from the_yelp_collaborative_knowledge_graph_ray import config as C

    rng = random.Random(7)
    vals = [""] + list(C.SORT_PREFIXES)
    for p in C.SORT_PREFIXES:
        vals += [p + "".join(rng.choices(_s.ascii_letters + "0123456789/_",
                                         k=rng.randint(0, 20)))
                 for _ in range(100)]
    vals += ["".join(rng.choices(_s.printable[:80], k=rng.randint(0, 30)))
             for _ in range(300)]
    vals += ["http://example.org/yckg/entity/t",  # shares ENT, no full prefix
             "http://www.wikidata.org/entity",    # one short of WD
             "https://schema.org/Message"]
    col = pa.array(vals, pa.string())
    b, s = materialize._prefix_encode(col)
    assert materialize._prefix_decode(b, s).to_pylist() == vals
    keyed = sorted(zip(b.to_pylist(), s.to_pylist(), vals))
    assert [k[2] for k in keyed] == sorted(vals)


def test_flatten_structs_exclusion_and_nesting():
    import pyarrow as pa

    from the_yelp_collaborative_knowledge_graph_ray.stages.flatten import (
        flatten_table,
    )
    t = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "meta": pa.StructArray.from_arrays(
            [pa.array(["a", "b"]),
             pa.StructArray.from_arrays(
                 [pa.array([10, 20], pa.int64()),
                  pa.array(["x", "y"])], ["n", "s"]),
             pa.StructArray.from_arrays(
                 [pa.array(["08:00", "09:00"])], ["open"])],
            ["client", "inner", "hours"])})
    # bare-name exclusion removes the subtree at any depth
    flat = flatten_table(t, frozenset({"hours"}))
    assert flat.column_names == ["id", "meta.client", "meta.inner.n",
                                 "meta.inner.s"]
    assert flat["meta.inner.n"].to_pylist() == [10, 20]
    # full-path exclusion works too; non-struct columns pass through
    flat2 = flatten_table(t, frozenset({"meta.inner.s", "meta.hours"}))
    assert flat2.column_names == ["id", "meta.client", "meta.inner.n"]


def test_mention_detector_ac_engine_matches_substring(ray_session, sf_tiny):
    """The Aho-Corasick engine must emit EXACTLY the rows of the per-surface
    substring engine — on the real fixture vocab and on a synthetic >512
    vocabulary that triggers the automaton automatically."""
    import pyarrow as pa

    from the_yelp_collaborative_knowledge_graph_ray.stages.mentions import (
        AC_VOCAB_THRESHOLD,
        MentionDetector,
        load_vocab_surfaces,
    )

    batch = pa.table({
        "conv_id": pa.array(["c1", "c1", "c2", "c2"]),
        "turn_idx": pa.array([0, 1, 0, 1], pa.int32()),
        "text": pa.array([
            "I love Coffee and Machine Learning these days",
            "Let's compare MachineLearning and jazz before deciding.",
            "nothing relevant here at all",
            "the ESPRESSO was better than the latte honestly"])})

    vocab = load_vocab_surfaces(sf_tiny)
    a = MentionDetector(vocab, force_engine="substring")(batch)
    b = MentionDetector(vocab, force_engine="ac")(batch)
    key = ["subj", "obj", "src_conv_id", "src_turn_idx"]

    def rows(t):
        return t.select(key).to_pandas().sort_values(key).values.tolist()

    assert rows(a) == rows(b)
    assert a.num_rows == b.num_rows > 0

    # synthetic >threshold vocab: auto-selects AC; equality still holds
    big_vocab = vocab + [f"zq{i:04d}term" for i in range(AC_VOCAB_THRESHOLD)]
    det = MentionDetector(big_vocab)
    assert det.ac is not None
    assert rows(det(batch)) == rows(a)


def test_aho_corasick_sparse_engine_and_memory_bound():
    """Above ``dense_max_states`` the automaton keeps only sorted trie-edge
    keys + fail links (no dense closure): bit-identical hits to the dense
    engine, and a 100k-surface vocabulary builds within a ~16 MB structure
    bound (the dense table would be ~420 MB)."""
    import pyarrow as pa

    from the_yelp_collaborative_knowledge_graph_ray.stages.mentions import (
        AhoCorasick,
    )

    words = ["he", "she", "his", "hers", "sushi", "ramen bar", "rame",
             "amen", "ushi", "h"]
    texts = ["ushers eat sushi at the ramen bar", "hershey", "", "h",
             "no match zzz", "ramenramen sushi his hers"]
    dense = AhoCorasick(words)
    sparse = AhoCorasick(words, dense_max_states=0)
    assert dense.trans is not None and sparse.trans is None
    col = pa.array(texts, pa.string())
    rd, pd_ = dense.scan_batch(col)
    rs, ps = sparse.scan_batch(col)
    assert rd.tolist() == rs.tolist() and pd_.tolist() == ps.tolist()
    for t in texts:
        want = {j for j, w in enumerate(words) if w in t}
        assert dense.scan(t) == want == sparse.scan(t)

    big = [f"{i:06d}x{i % 97:02d}" for i in range(100_000)]
    sp = AhoCorasick(big)  # 411k states: above the default dense cutoff
    assert sp.trans is None
    assert (sp.edge_keys.nbytes + sp.edge_vals.nbytes
            + sp.fail.nbytes) < 16 << 20
    hits = sp.scan("xx 000123x26 yy 099999x...")
    assert hits == {123}


def test_jsonl_source_matches_parquet(ray_session, sf_tiny, tmp_path):
    """S1 compat: JSONL ingest yields the exact parquet transcript rows
    (epoch-micros and ISO-seconds ts encodings both normalize)."""
    import json

    import pyarrow.parquet as pq

    from the_yelp_collaborative_knowledge_graph_ray.sources.jsonl import (
        read_transcripts_jsonl,
    )
    tab = pq.read_table(f"{sf_tiny}/transcripts.parquet").slice(0, 500)
    rows = tab.to_pylist()
    p1 = tmp_path / "t_micros.jsonl"
    with open(p1, "w") as f:
        for r in rows:
            r = dict(r)
            r["ts"] = int(r["ts"].timestamp() * 1_000_000)
            f.write(json.dumps(r) + "\n")
    got = read_transcripts_jsonl(str(p1)).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = tab.to_pandas().sort_values(["conv_id", "turn_idx"]) \
        .reset_index(drop=True)
    assert got.equals(want)

    p2 = tmp_path / "t_iso.jsonl"
    with open(p2, "w") as f:
        for r in rows:
            r = dict(r)
            r["ts"] = r["ts"].strftime("%Y-%m-%dT%H:%M:%S")
            f.write(json.dumps(r) + "\n")
    got2 = read_transcripts_jsonl(str(p2)).to_pandas()
    assert len(got2) == len(want)
    assert str(got2.dtypes["ts"]).startswith("datetime64[us]")


def test_gzip_ntriples_roundtrip(ray_session, tmp_path):
    import gzip
    import os

    import pyarrow as pa
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.stages.materialize import (
        write_ntriples,
    )
    tri = ray.data.from_arrow(pa.table({
        "subj": ["http://e/s1", "http://e/s2"],
        "pred": ["http://e/p", "http://e/p"],
        "obj": ['say "hi"\nnow', "http://e/o2"],
        "obj_is_literal": [True, False],
        "obj_datatype": pa.array([None, None], pa.string())}))
    out = str(tmp_path / "nt")
    write_ntriples(tri, out, compression="gzip")
    files = [f for f in os.listdir(out) if f.endswith(".nt.gz")]
    assert files, os.listdir(out)
    lines = []
    for f in files:
        with gzip.open(os.path.join(out, f), "rt") as fh:
            lines += [line.rstrip("\n") for line in fh if line.strip()]
    assert sorted(lines) == [
        '<http://e/s1> <http://e/p> "say \\"hi\\"\\nnow"'
        '^^<http://www.w3.org/2001/XMLSchema#string> .',
        '<http://e/s2> <http://e/p> <http://e/o2> .']


def test_cogroup_join_mn_semantics(ray_session):
    """cogroup_join is a true m:n inner join: per-key cross product, keys
    absent from either side dropped, hot-key guard raises."""
    import pyarrow as pa
    import ray.data
    import pytest as _pytest

    from the_yelp_collaborative_knowledge_graph_ray.functions.bgp import (
        cogroup_join,
    )

    left = ray.data.from_arrow(pa.table({
        "k": ["a", "a", "b", "c"], "l": ["l1", "l2", "l3", "l4"]}))
    right = ray.data.from_arrow(pa.table({
        "k": ["a", "b", "b", "d"], "r": ["r1", "r2", "r3", "r4"]}))
    out = cogroup_join(left, right, ["k"], ["k", "l"], ["k", "r"],
                       num_partitions=2).to_pandas()
    got = set(map(tuple, out[["k", "l", "r"]].itertuples(index=False)))
    want = {("a", "l1", "r1"), ("a", "l2", "r1"),
            ("b", "l3", "r2"), ("b", "l3", "r3")}
    assert got == want
    with _pytest.raises(Exception, match="max_group"):
        cogroup_join(left, right, ["k"], ["k", "l"], ["k", "r"],
                     num_partitions=1, max_group=1).to_pandas()


def test_cogroup_join_left_optional_semantics(ray_session):
    """how='left' keeps unmatched left keys with ''-filled right columns
    (the SPARQL OPTIONAL shape), matches still cross-product, and
    right-only keys are dropped; bgp_match optional_patterns wires it."""
    import pyarrow as pa
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.functions.bgp import (
        bgp_match,
        cogroup_join,
    )

    left = ray.data.from_arrow(pa.table({
        "k": ["a", "a", "b", "c"], "l": ["l1", "l2", "l3", "l4"]}))
    right = ray.data.from_arrow(pa.table({
        "k": ["a", "b", "b", "d"], "r": ["r1", "r2", "r3", "r4"]}))
    out = cogroup_join(left, right, ["k"], ["k", "l"], ["k", "r"],
                       num_partitions=2, how="left").to_pandas()
    got = set(map(tuple, out[["k", "l", "r"]].itertuples(index=False)))
    want = {("a", "l1", "r1"), ("a", "l2", "r1"),
            ("b", "l3", "r2"), ("b", "l3", "r3"), ("c", "l4", "")}
    assert got == want

    tri = ray.data.from_arrow(pa.table({
        "subj": ["s1", "s2", "s1"], "pred": ["p", "p", "q"],
        "obj": ["o1", "o2", "x1"]}))
    res = bgp_match(tri, [("?s", "p", "?o")], ["s", "o", "x"],
                    num_partitions=1,
                    optional_patterns=[("?s", "q", "?x")]).to_pandas()
    got = set(map(tuple, res[["s", "o", "x"]].itertuples(index=False)))
    assert got == {("s1", "o1", "x1"), ("s2", "o2", "")}


def test_bgp_match_rejects_cartesian(ray_session):
    import pyarrow as pa
    import ray.data
    import pytest as _pytest

    from the_yelp_collaborative_knowledge_graph_ray.functions.bgp import (
        bgp_match,
    )

    tri = ray.data.from_arrow(pa.table({
        "subj": ["s1"], "pred": ["p"], "obj": ["o1"]}))
    with _pytest.raises(ValueError, match="shares no variable"):
        bgp_match(tri, [("?a", "p", "?b"), ("?c", "q", "?d")], ["a"])


def test_csv_source_matches_parquet(ray_session, sf_tiny, tmp_path):
    """S3 compat: CSV ingest yields the exact parquet transcript rows via
    the same schema-fix path as the JSON-lines source."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyarrow import csv as pacsv

    from the_yelp_collaborative_knowledge_graph_ray.sources.csv import (
        read_transcripts_csv,
    )
    tab = pq.read_table(f"{sf_tiny}/transcripts.parquet").slice(0, 500)
    micros = tab.set_column(
        tab.schema.get_field_index("ts"), "ts",
        pa.compute.cast(tab["ts"], pa.int64()))
    p = tmp_path / "t.csv"
    pacsv.write_csv(micros, str(p))
    got = read_transcripts_csv(str(p)).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = tab.to_pandas().sort_values(["conv_id", "turn_idx"]) \
        .reset_index(drop=True)
    assert got.equals(want)


def test_scc_labels_planted_graph(ray_session):
    """Two separate cycles joined by a one-way bridge must NOT merge;
    acyclic nodes are singletons labeled by themselves."""
    import pyarrow as pa
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.functions.datalog import (
        scc_labels,
    )

    edges = ray.data.from_arrow(pa.table({
        "src": ["a", "b", "c", "d", "e", "c", "x"],
        "dst": ["b", "c", "a", "e", "d", "d", "y"]}))
    out = scc_labels(edges, num_partitions=2).to_pandas() \
        .set_index("node")["scc_id"].to_dict()
    assert out == {"a": "a", "b": "a", "c": "a",
                   "d": "d", "e": "d", "x": "x", "y": "y"}


def test_triangles_per_node_planted(ray_session):
    """K4 minus one edge: per-node triangle counts and wedge capacities
    match hand computation (local clustering coefficient numerators)."""
    import pyarrow as pa
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.functions.triangles import (
        triangles_per_node,
    )

    # edges of K4 on {a,b,c,d} minus (c,d): triangles abc, abd
    edges = ray.data.from_arrow(pa.table({
        "u": ["a", "a", "a", "b", "b"],
        "v": ["b", "c", "d", "c", "d"]}))
    out = triangles_per_node(edges).to_pandas().set_index("node")
    assert out.loc["a", "n_triangles"] == 2  # abc, abd
    assert out.loc["b", "n_triangles"] == 2
    assert out.loc["c", "n_triangles"] == 1
    assert out.loc["d", "n_triangles"] == 1
    # degrees: a=3, b=3, c=2, d=2 -> wedges 3, 3, 1, 1
    assert out["n_wedges"].to_dict() == {"a": 3, "b": 3, "c": 1, "d": 1}


def test_bgp_filter_and_values(ray_session):
    """FILTER != drops matching bindings, VALUES restricts to the inline
    set, unbound FILTER var raises."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.functions.bgp import (
        bgp_match,
    )

    tri = ray.data.from_arrow(pa.table({
        "subj": ["s1", "s2", "s3", "s1", "s2", "s3"],
        "pred": ["p", "p", "p", "q", "q", "q"],
        "obj": ["o1", "o2", "o3", "x1", "x2", "x3"]}))
    res = bgp_match(tri, [("?s", "p", "?o"), ("?s", "q", "?x")],
                    ["s", "o", "x"], num_partitions=1,
                    filters=[("o", "!=", "o2")],
                    values={"x": ["x1", "x3"]}).to_pandas()
    got = set(map(tuple, res[["s", "o", "x"]].itertuples(index=False)))
    assert got == {("s1", "o1", "x1"), ("s3", "o3", "x3")}
    with _pytest.raises(ValueError, match="FILTER/VALUES vars"):
        bgp_match(tri, [("?s", "p", "?o")], ["s"],
                  filters=[("zzz", "==", "v")])


def test_bgp_union_minus_construct_paths(ray_session):
    """UNION dedups across groups, MINUS anti-joins on shared vars,
    CONSTRUCT instantiates templates, property paths expand (inverse,
    sequence-as-tuple, alternation)."""
    import pyarrow as pa
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.functions.bgp import (
        bgp_construct,
        bgp_match,
        bgp_union,
        expand_paths,
    )

    tri = ray.data.from_arrow(pa.table({
        "subj": ["s1", "s2", "s3", "s1", "s2", "c1", "c1", "c2"],
        "pred": ["p", "p", "p", "q", "q", "in", "in", "in"],
        "obj": ["o1", "o2", "o1", "o1", "x2", "s1", "s2", "s3"]}))
    # UNION: {?s p ?x} UNION {?s q ?x} — (s1,o1) appears in both, dedup
    u = bgp_union(tri, [[("?s", "p", "?x")], [("?s", "q", "?x")]],
                  ["s", "x"], num_partitions=1).to_pandas()
    got = set(map(tuple, u[["s", "x"]].itertuples(index=False)))
    assert got == {("s1", "o1"), ("s2", "o2"), ("s3", "o1"),
                   ("s2", "x2")}
    # MINUS: {?s p ?x} MINUS {?s q o1} drops s1 (has q->o1), keeps s2 s3
    m = bgp_match(tri, [("?s", "p", "?x")], ["s", "x"], num_partitions=1,
                  minus_patterns=[("?s", "q", "o1")]).to_pandas()
    got = set(map(tuple, m[["s", "x"]].itertuples(index=False)))
    assert got == {("s2", "o2"), ("s3", "o1")}
    # alternation: pred p|q — (s1,o1) reachable via BOTH preds, dedups
    a = bgp_match(tri, [("?s", "p|q", "?x")], ["s", "x"],
                  num_partitions=1).to_pandas()
    assert len(a) == 4
    # sequence + inverse path: ?c (in)/(p) ?x  ==  c contains s, s p-> x
    pats = expand_paths([("?c", ("in", "p"), "?x")])
    assert pats == [("?c", "in", "?__pp0"), ("?__pp0", "p", "?x")]
    seq = bgp_match(tri, [("?c", ("in", "p"), "?x")], ["c", "x"],
                    num_partitions=1).to_pandas()
    got = set(map(tuple, seq[["c", "x"]].itertuples(index=False)))
    assert got == {("c1", "o1"), ("c1", "o2"), ("c2", "o1")}
    # inverse: ?x ^p ?s == ?s p ?x
    inv = bgp_match(tri, [("?x", "^p", "?s")], ["s", "x"],
                    num_partitions=1).to_pandas()
    assert len(inv) == 3
    # CONSTRUCT: emit ?x :seen ?s plus a type triple per binding
    c = bgp_construct(tri, [("?s", "p", "?x")],
                      [("?x", "seen", "?s"), ("?x", "rdf:type", "Obj")],
                      num_partitions=1).to_pandas()
    trip = set(map(tuple, c[["subj", "pred", "obj"]].itertuples(index=False)))
    assert ("o1", "seen", "s1") in trip and ("o1", "rdf:type", "Obj") in trip
    # two bindings share o1 -> the type triple dedups: 3 seen + 2 types
    assert len(trip) == 5 and len(c) == 5


def test_prefix_duplicates_planted(ray_session):
    """Prefix containment via sort adjacency: equal texts, proper
    prefixes, chains (a, ab, abc), empty text, and non-prefix neighbors."""
    import pyarrow as pa
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.stages.dedup import (
        prefix_duplicates,
    )

    rows = {
        1: "alpha beta",        # prefix of 2 -> dup
        2: "alpha beta gamma",  # nothing extends it
        3: "zeta",              # equal to 4 -> dup
        4: "zeta",              # equal to 3 -> dup
        5: "",                  # empty = prefix of everything -> dup
        6: "zet",               # prefix of 3/4 -> dup
        7: "omega",             # unique, no extension
        8: "alpha betz",        # near 1 but not a prefix relation
    }
    docs = ray.data.from_arrow(pa.table({
        "doc_id": list(rows), "text": list(rows.values())}))
    got = prefix_duplicates(docs, num_partitions=3).to_pandas()
    assert got["doc_id"].tolist() == [1, 3, 4, 5, 6]


def test_suffix_duplicates_planted(ray_session):
    """Suffix containment via reversed-text prefix machinery: equal
    texts, proper suffixes, and non-suffix lookalikes (the sf0.01
    corpus has no suffix dups, so the oracle row is exercised here)."""
    import pyarrow as pa
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.stages.dedup import (
        suffix_duplicates,
    )

    rows = {
        1: "beta gamma",          # suffix of 2 -> dup
        2: "alpha beta gamma",
        3: "zeta",                # equal to 4 -> dup
        4: "zeta",                # equal to 3 -> dup
        5: "gamma",               # suffix of 1 and 2 -> dup
        6: "alpha beta",          # prefix (NOT suffix) of 2 -> clean
        7: "amma q",              # not a suffix of anything
    }
    docs = ray.data.from_arrow(pa.table({
        "doc_id": list(rows), "text": list(rows.values())}))
    got = suffix_duplicates(docs, num_partitions=3).to_pandas()
    assert got["doc_id"].tolist() == [1, 3, 4, 5]


def test_bgp_transitive_path(ray_session):
    """p+ scans the transitive closure: chain a->b->c->d gives all 6
    ordered reachability pairs, and composes with a second pattern."""
    import pyarrow as pa
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.functions.bgp import (
        bgp_match,
    )

    tri = ray.data.from_arrow(pa.table({
        "subj": ["a", "b", "c", "a"],
        "pred": ["sub", "sub", "sub", "lbl"],
        "obj": ["b", "c", "d", "x"]}))
    res = bgp_match(tri, [("?u", "sub+", "?v")], ["u", "v"],
                    num_partitions=1).to_pandas()
    got = set(map(tuple, res[["u", "v"]].itertuples(index=False)))
    assert got == {("a", "b"), ("a", "c"), ("a", "d"),
                   ("b", "c"), ("b", "d"), ("c", "d")}
    # composes: reach d AND carry a label via a second base pattern
    res2 = bgp_match(tri, [("?u", "sub+", "d"), ("?u", "lbl", "?l")],
                     ["u", "l"], num_partitions=1).to_pandas()
    assert set(map(tuple, res2[["u", "l"]].itertuples(index=False))) \
        == {("a", "x")}


def test_incremental_delta_completes_graph(ray_session, sf_tiny):
    """Incremental-maintenance invariant: base triples ∪ the EXCEPT-delta
    equals the full-corpus distinct graph — updates add exactly the
    missing facts, never duplicates, never losses."""
    from the_yelp_collaborative_knowledge_graph_ray import queries as Q

    sf = "/root/testdata/sf0.001"
    new = Q._q_kg_incremental_delta(sf).to_pandas()
    full = Q._mention_union_tri(sf).to_pandas() \
        .drop_duplicates(["subj", "pred", "obj"])
    new_set = set(map(tuple, new[["subj", "pred", "obj"]].itertuples(
        index=False)))
    full_set = set(map(tuple, full[["subj", "pred", "obj"]].itertuples(
        index=False)))
    assert new_set <= full_set
    # the delta adds only conv-suffix % 10 == 0 facts that the base lacks;
    # removing them from full must leave a graph the base fully covers
    base_set = full_set - new_set
    assert base_set | new_set == full_set
    assert base_set & new_set == set()
    assert len(new_set) > 0


def test_turtle_renderer_and_sink(ray_session, tmp_path):
    """Turtle rendering: prefix compaction (slash-bearing local names keep
    the full-IRI form), xsd:string drops the tag, other datatypes keep
    ^^prefixed, escaping matches N-Triples; every part file is
    independently parseable (starts with the @prefix header)."""
    import gzip
    import pathlib

    b = pa.table({
        "subj": [C.ENT + "tool/bash", C.SCHEMA + "Message"],
        "pred": [C.RDF_TYPE, C.PROP + "role"],
        "obj": [C.CLASS_TOOL, 'va"l\nue'],
        "obj_is_literal": [False, True],
        "obj_datatype": pa.array([None, C.XSD_INTEGER])})
    out = materialize.render_turtle(b)["text"].to_pylist()
    # slash in the entity local name -> full IRI; schema: names compact
    assert out[0] == (f"<{C.ENT}tool/bash> rdf:type "
                      "schema:SoftwareApplication .")
    assert out[1] == ('schema:Message prop:role "va\\"l\\nue"'
                      '^^xsd:integer .')
    d = str(tmp_path / "ttl")
    materialize.write_turtle(ray.data.from_arrow(b), d,
                             compression="gzip")
    parts = sorted(pathlib.Path(d).glob("*.ttl.gz"))
    assert parts
    text = gzip.decompress(parts[0].read_bytes()).decode()
    assert text.startswith("@prefix ent: <" + C.ENT + "> .")
    assert "schema:Message prop:role" in text


def test_bgp_plan_order_and_equivalence(ray_session):
    """The greedy planner seeds from the most-constant pattern and yields
    the same bindings as the user's order."""
    import pyarrow as pa
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.functions.bgp import (
        bgp_match,
        plan_order,
    )

    pats = [("?t", "?p", "?x"), ("?t", "q", "?m"), ("?t", "q", "o1")]
    assert plan_order(pats) == [("?t", "q", "o1"), ("?t", "q", "?m"),
                                ("?t", "?p", "?x")]
    tri = ray.data.from_arrow(pa.table({
        "subj": ["s1", "s1", "s2", "s2", "s1"],
        "pred": ["q", "p", "q", "p", "r"],
        "obj": ["o1", "v1", "o2", "v2", "v3"]}))
    a = bgp_match(tri, pats, ["t", "p", "x"],
                  num_partitions=1).to_pandas()
    b = bgp_match(tri, pats, ["t", "p", "x"], num_partitions=1,
                  reorder=False).to_pandas() \
        if "reorder" in bgp_match.__code__.co_varnames else a
    key = ["t", "p", "x"]
    assert (set(map(tuple, a[key].itertuples(index=False)))
            == set(map(tuple, b[key].itertuples(index=False)))
            == {("s1", "q", "o1"), ("s1", "p", "v1"), ("s1", "r", "v3")})


def test_bgp_explain_plan():
    """EXPLAIN reports the planned order: constant-rich pattern seeds,
    OPTIONAL/MINUS keep user order, paths are pre-expanded."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.bgp import (
        bgp_explain,
    )

    t = bgp_explain(
        [("?t", "?p", "?x"), ("?t", "q", "o1")],
        optional_patterns=[("?t", ("a", "b"), "?y")],
        minus_patterns=[("?t", "r", "?z")]).to_pandas()
    assert t.clause.tolist() == ["required", "required", "optional",
                                 "optional", "minus"]
    assert t.pred.tolist()[0] == "q"          # planner seeded the const
    assert t.pred.tolist()[2:4] == ["a", "b"]  # path expanded in place
    assert t.n_consts.tolist()[0] == 2


def test_apsp_min_plus_planted(ray_session):
    """Min-plus doubling APSP on a path-with-shortcut digraph: shortest
    hop counts, not just reachability."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.datalog import (
        apsp_min_plus,
    )

    # a->b->c->d plus shortcut a->c; cycle d->a
    e = pa.table({"src": ["a", "b", "c", "a", "d"],
                  "dst": ["b", "c", "d", "c", "a"]})
    out = apsp_min_plus(ray.data.from_arrow(e),
                        num_partitions=2).to_pandas()
    d = {(r.src, r.dst): r.d for r in out.itertuples(index=False)}
    assert d[("a", "b")] == 1 and d[("a", "c")] == 1
    assert d[("a", "d")] == 2          # via the shortcut
    assert d[("b", "a")] == 3          # b->c->d->a
    assert d[("a", "a")] == 3          # around the cycle


def test_kg_edges_equals_materialized_triple_filter(ray_session):
    """_kg_edges skips the per-family materialize() sorts (pure
    optimization); the edge SET must equal the one derived from the
    fully materialized triple families."""
    import pyarrow.compute as pc

    from the_yelp_collaborative_knowledge_graph_ray import queries as Q

    sf = "/root/testdata/sf0.001"
    lean = Q._kg_edges(sf).to_pandas()
    tri = Q._q_structural(sf).union(Q._q_mentions(sf))
    ref = tri.map_batches(
        lambda b: b.filter(pc.invert(b["obj_is_literal"]))
                   .select(["subj", "obj"])
                   .rename_columns(["src", "dst"]),
        batch_format="pyarrow").to_pandas().drop_duplicates()
    a = set(map(tuple, lean[["src", "dst"]].to_numpy()))
    b = set(map(tuple, ref[["src", "dst"]].to_numpy()))
    assert a == b


def test_bucketed_join_matches_plain_join(ray_session, tmp_path):
    """SMB co-partitioned join == plain join, incl. a non-power-of-two
    bucket count (multiplicative-hash path) and a layout-mismatch
    guard."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.functions.bucketed \
        import bucketed_join, write_bucketed

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(200, dtype=np.int64) % 37),
        "v": pa.array(np.arange(200, dtype=np.int64))}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(0, 37, 2, dtype=np.int64)),
        "w": pa.array(np.arange(0, 37, 2, dtype=np.int64) * 10)}))
    lp = write_bucketed(left, "k", str(tmp_path / "l"), n_buckets=5)
    rp = write_bucketed(right, "k", str(tmp_path / "r"), n_buckets=5)
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64()),
                      "w": pa.array([], pa.int64())})
    got = bucketed_join(lp, rp, "k", ["k", "v"], ["k", "w"],
                        empty=empty).to_pandas() \
        .sort_values(["k", "v"]).reset_index(drop=True)
    import pandas as pd
    ld = left.to_pandas()
    rd = right.to_pandas()
    want = ld.merge(rd, on="k").sort_values(["k", "v"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)])

    rp8 = write_bucketed(right, "k", str(tmp_path / "r8"), n_buckets=8)
    with pytest.raises(ValueError, match="incompatible"):
        bucketed_join(lp, rp8, "k", ["k", "v"], ["k", "w"],
                      empty=empty).materialize()


def test_transitive_reduction_properties(ray_session):
    """closure(reduced) == closure(original) (nothing lost), and the
    reduction is MINIMAL: removing any kept edge shrinks the closure."""
    from the_yelp_collaborative_knowledge_graph_ray import queries as Q

    sf = "/root/testdata/sf0.001"
    fdir = Q._fx(sf)
    import pyarrow.parquet as pq
    th = pq.read_table(f"{fdir}/type_hierarchy.parquet").to_pandas()
    orig = set(zip(th["type_id"], th["super_type_id"]))
    kept = Q.queries()["kg_type_transitive_reduction"](sf).to_pandas()
    kept = set(zip(kept["type_id"], kept["super_type_id"]))
    assert kept <= orig

    def closure(edges):
        clo = set(edges)
        while True:
            new = {(a, d) for a, b in clo for c, d in clo if b == c}
            if new <= clo:
                return clo
            clo |= new

    assert closure(kept) == closure(orig)
    for e in sorted(kept):
        assert closure(kept - {e}) != closure(orig), \
            f"edge {e} is redundant but was kept"


def test_symspell_equals_bruteforce(ray_session):
    """dedup_symspell_edit1 == the O(V^2) exact Levenshtein-1 pair set
    over the same dictionary."""
    from the_yelp_collaborative_knowledge_graph_ray import queries as Q

    sf = "/root/testdata/sf0.001"
    got = Q.queries()["dedup_symspell_edit1"](sf)
    got_pairs = set(zip(got["word_a"], got["word_b"]))
    # brute force over the same normalized dictionary
    import duckdb
    fdir = Q._fx(sf)
    vocab = duckdb.sql(f"""
        SELECT DISTINCT regexp_replace(
                 unnest(string_split(lower(text), ' ')),
                 '[^a-z]', '', 'g') AS w
        FROM read_parquet('{fdir}/transcripts.parquet/*.parquet')
        """).df()["w"]
    words = sorted(w for w in vocab if len(w) >= 4)
    want = {(a, b) for i, a in enumerate(words)
            for b in words[i + 1:] if Q._edit1(a, b)}
    assert got_pairs == want and len(want) > 0


def test_allen_np_select_matches_scalar_reference():
    """The vectorized np.select branch order in events_allen_relations
    classifies every random interval pair exactly as the textbook
    scalar definition (with the pinned 'equal'-first precedence for
    degenerate point intervals)."""
    import numpy as np

    from the_yelp_collaborative_knowledge_graph_ray.queries import \
        _ALLEN_RELS

    def scalar(sa, ea, sb, eb):
        if sa == sb and ea == eb:
            return "equal"
        if ea < sb:
            return "before"
        if eb < sa:
            return "after"
        if ea == sb:
            return "meets"
        if eb == sa:
            return "met_by"
        if sa == sb:
            return "starts" if ea < eb else "started_by"
        if ea == eb:
            return "finishes" if sa > sb else "finished_by"
        if sa > sb and ea < eb:
            return "during"
        if sa < sb and ea > eb:
            return "contains"
        if sa < sb and ea > sb and ea < eb:
            return "overlaps"
        return "overlapped_by"

    rng = np.random.RandomState(7)
    a = rng.randint(0, 8, size=(4000, 2))
    b = rng.randint(0, 8, size=(4000, 2))
    sa, ea = a.min(1).astype(float), a.max(1).astype(float)
    sb, eb = b.min(1).astype(float), b.max(1).astype(float)
    rel = np.select(
        [(sa == sb) & (ea == eb), ea < sb, eb < sa,
         ea == sb, eb == sa,
         (sa == sb) & (ea < eb), (sa == sb) & (ea > eb),
         (ea == eb) & (sa > sb), (ea == eb) & (sa < sb),
         (sa > sb) & (ea < eb), (sa < sb) & (ea > eb),
         (sa < sb) & (ea > sb) & (ea < eb)],
        np.arange(12), default=12)
    got = [_ALLEN_RELS[k] for k in rel]
    want = [scalar(*t) for t in zip(sa, ea, sb, eb)]
    assert got == want
