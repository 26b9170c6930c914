"""Unit tests for the curation operators added in round 2: deterministic
sampling, PII redaction, train/eval contamination, exact distributed
quantiles — each against a Python/DuckDB brute-force oracle."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from the_yelp_collaborative_knowledge_graph_ray.functions.quantiles import (
    quantiles_exact,
)
from the_yelp_collaborative_knowledge_graph_ray.functions.sampling import (
    hash_u01,
    sample_hash,
    sample_stratified,
    splitmix64,
)
from the_yelp_collaborative_knowledge_graph_ray.stages.contamination import (
    contamination_check,
)
from the_yelp_collaborative_knowledge_graph_ray.stages.redact import (
    redact_batch,
)


def test_splitmix_sql_twin_bit_exact():
    """The DuckDB oracle reproduces numpy splitmix64 bit-for-bit."""
    from the_yelp_collaborative_knowledge_graph_ray.queries import (
        _M64,
        _splitmix_cte,
    )
    sql = (f"WITH d AS (SELECT range AS k FROM range(0, 4096)),"
           f"{_splitmix_cte('d', 'k', 'k')} "
           f"SELECT k, u01 FROM u ORDER BY k")
    got = duckdb.sql(sql).df()["u01"].to_numpy()
    exp = splitmix64(np.arange(4096, dtype=np.uint64)) / float(2 ** 64)
    assert (got == exp).all()
    assert _M64 == 2 ** 64


def _ids_ds(n=2000):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "source": pa.array([f"s{i % 5}" for i in range(n)], pa.string())}))


def test_sample_hash_deterministic_nested_and_unbiased(ray_session):
    ds = _ids_ds()
    a = sorted(r["doc_id"] for r in sample_hash(ds, "doc_id", 0.3).take_all())
    b = sorted(r["doc_id"] for r in sample_hash(ds, "doc_id", 0.3).take_all())
    assert a == b  # reproducible across runs
    sup = {r["doc_id"] for r in sample_hash(ds, "doc_id", 0.6).take_all()}
    assert set(a) <= sup  # rate bands nest: u01 < .3 implies u01 < .6
    assert 0.25 <= len(a) / 2000 <= 0.35  # unbiased-ish at n=2000
    # a different seed decorrelates
    c = {r["doc_id"] for r in
         sample_hash(ds, "doc_id", 0.3, seed=7).take_all()}
    assert c != set(a)


def test_sample_stratified_rates_and_exactness(ray_session):
    ds = _ids_ds()
    rates = {"s0": 0.0, "s1": 1.0, "s2": 0.5}
    got = sample_stratified(ds, "doc_id", "source", rates).take_all()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert "s0" not in by_src                      # rate 0 drops all
    assert len(by_src["s1"]) == 400                # rate 1 keeps all
    assert "s3" not in by_src and "s4" not in by_src  # default_rate=0
    # s2 rows are exactly the hash_u01 < 0.5 subset (brute force)
    ids = np.arange(2000)
    s2 = ids[ids % 5 == 2]
    exp = set(s2[hash_u01(pa.array(s2, pa.int64())) < 0.5].tolist())
    assert by_src["s2"] == exp


def test_redact_batch_counts_and_replacements():
    texts = pa.array([
        "mail me at a.b+spam@site.io or c@d.org today",
        "call +1-555-123456 or 44-202-7946000",
        "server at 10.0.0.1 and 192.168.1.254 down",
        "clean text with nothing sensitive at all",
    ])
    red, counts = redact_batch(texts)
    out = red.to_pylist()
    assert out[0] == "mail me at <EMAIL> or <EMAIL> today"
    assert out[1] == "call <PHONE> or <PHONE>"
    assert out[2] == "server at <IP> and <IP> down"
    assert out[3] == texts[3].as_py()
    assert counts["email"].to_pylist() == [2, 0, 0, 0]
    assert counts["phone"].to_pylist() == [0, 2, 0, 0]
    assert counts["ipv4"].to_pylist() == [0, 0, 2, 0]


def test_contamination_brute_force(ray_session):
    train_texts = {
        0: "the quick brown fox jumps over the lazy dog tonight",
        1: "completely unrelated sentence about database query planning",
        2: "the quick brown fox sleeps all day long instead",
        3: "hi there",  # < 3 words of shingle -> 0 shingles, never flagged
    }
    eval_texts = {100: "watch the quick brown fox jumps high"}
    mk = lambda d: ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(d), pa.int64()),
        "text": pa.array(list(d.values()), pa.string())}))
    got = {r["doc_id"]: r for r in
           contamination_check(mk(train_texts), mk(eval_texts),
                               min_overlap_frac=0.25).take_all()}

    def sh(t):
        ws = t.lower().split(" ")
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    ev = set().union(*(sh(t) for t in eval_texts.values()))
    for did, t in train_texts.items():
        s = sh(t)
        assert got[did]["n_shingles"] == len(s)
        assert got[did]["n_overlap"] == len(s & ev)
        frac = len(s & ev) / len(s) if s else 0.0
        assert got[did]["overlap_frac"] == frac
        assert got[did]["contaminated"] == (frac >= 0.25)
    assert got[0]["n_overlap"] > 0          # non-vacuous: doc 0 overlaps
    assert got[3]["n_shingles"] == 0        # short-doc branch


def _q_oracle(vals, qs):
    v = np.sort(vals)
    return [float(v[max(0, int(np.ceil(len(v) * q)) - 1)]) for q in qs]


def test_quantiles_exact_matches_quantile_disc(ray_session):
    rng = np.random.RandomState(7)
    vals = np.concatenate([rng.lognormal(3, 2, 20000),
                           rng.uniform(-50, 50, 20000)])
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals)}))
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    got = quantiles_exact(ds, "x", qs)
    assert got["value"].to_pylist() == _q_oracle(vals, qs)
    # matches DuckDB quantile_disc semantics too
    con = duckdb.connect()
    con.register("vals", pa.table({"x": pa.array(vals)}))
    for q, v in zip(qs, got["value"].to_pylist()):
        assert con.sql(f"SELECT quantile_disc(x, {q}) FROM vals") \
                  .fetchone()[0] == v


def test_quantiles_converge_on_massive_duplicates(ray_session):
    # 100k copies of one value forces the bin-collapse path (> the 65536
    # small-bin cutoff at every narrowing round until one-ULP width)
    vals = np.concatenate([np.full(100_000, 0.5),
                           np.linspace(0, 1, 5000)])
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals)}))
    got = quantiles_exact(ds, "x", [0.5], driver_budget=70_000)
    assert got["value"].to_pylist() == _q_oracle(vals, [0.5]) == [0.5]


def test_quantiles_empty_and_single(ray_session):
    ds = ray.data.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    assert quantiles_exact(ds, "x", [0.5])["value"].to_pylist() == [None]
    one = ray.data.from_arrow(pa.table({"x": pa.array([42.0])}))
    assert quantiles_exact(one, "x", [0.0, 0.5, 1.0])["value"].to_pylist() \
        == [42.0, 42.0, 42.0]


def test_top_n_per_key_matches_window(ray_session):
    rng = np.random.RandomState(3)
    n = 5000
    import pandas as pd
    df = pd.DataFrame({
        "id": np.arange(n),
        "key": rng.randint(0, 40, n),
        "v": rng.randint(0, 25, n),   # many ties -> tie-break exercised
    })
    from the_yelp_collaborative_knowledge_graph_ray.functions.topn import (
        top_n_per_key,
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    got = top_n_per_key(ds, ["key"], [("v", False), ("id", True)], 7,
                        num_partitions=4).to_pandas()
    df["rank"] = df.sort_values(["v", "id"], ascending=[False, True]) \
                   .groupby("key").cumcount() + 1
    exp = df[df["rank"] <= 7].sort_values(["key", "rank"])
    assert got[["id", "key", "v", "rank"]].reset_index(drop=True) \
        .equals(exp[["id", "key", "v", "rank"]].reset_index(drop=True))


def test_bloom_filter_no_false_negatives_low_fp():
    from the_yelp_collaborative_knowledge_graph_ray.functions.joins import (
        BloomFilter,
    )
    rng = np.random.RandomState(11)
    members = np.unique(rng.randint(0, 1 << 62, 50_000).astype(np.int64))
    bf = BloomFilter(members)
    assert bf.might_contain(members).all()          # never a false negative
    probe = np.unique(rng.randint(0, 1 << 62, 100_000).astype(np.int64))
    outsiders = np.setdiff1d(probe, members)
    fp = bf.might_contain(outsiders).mean()
    assert fp < 0.01, fp                            # ~0.05% expected


def test_bloom_semi_filter_keeps_minhash_exact(ray_session):
    """Forcing the verify semi-filter through the Bloom path must not change
    minhash output — false positives are dropped by the exact verify."""
    from the_yelp_collaborative_knowledge_graph_ray.functions import joins
    from the_yelp_collaborative_knowledge_graph_ray.stages import dedup
    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                                 columns=["doc_id", "text"])
    exact = dedup.minhash_lsh_pairs(docs).to_pandas()

    orig = joins.broadcast_semi_filter
    try:
        joins.broadcast_semi_filter = (
            lambda big, key_col, keys, max_exact_keys=None:
            orig(big, key_col, keys, max_exact_keys=0))
        bloomed = dedup.minhash_lsh_pairs(docs).to_pandas()
    finally:
        joins.broadcast_semi_filter = orig
    assert exact.equals(bloomed)


def test_dedup_canonical_map_is_transitive(ray_session):
    """A~B and B~C (but no direct A~C pair) must still collapse to one
    canonical id — the component closure, not the raw pair list."""
    from the_yelp_collaborative_knowledge_graph_ray.stages.dedup import (
        dedup_canonical_map,
    )
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([3, 7, 11, 42], pa.int64()),
        "text": pa.array(["a", "b", "c", "lone"], pa.string())}))
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([3, 7], pa.int64()),
        "doc_b": pa.array([7, 11], pa.int64())}))
    got = {r["doc_id"]: r for r in
           dedup_canonical_map(docs, pairs).take_all()}
    assert got[3]["canon_id"] == got[7]["canon_id"] \
        == got[11]["canon_id"] == 3
    assert not got[3]["is_dup"] and got[7]["is_dup"] and got[11]["is_dup"]
    assert got[42]["canon_id"] == 42 and not got[42]["is_dup"]


def test_dedup_canonical_map_local_equals_distributed(ray_session):
    """The size-gated local union-find fast path and the distributed
    min-label propagation (forced via local_threshold=0) must emit the
    same keep/drop map on a random multi-component pair graph."""
    from the_yelp_collaborative_knowledge_graph_ray.stages.dedup import (
        dedup_canonical_map,
    )
    rng = np.random.RandomState(13)
    ids = np.arange(400, dtype=np.int64)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "text": pa.array([f"d{i}" for i in ids], pa.string())}))
    # chains within 40-id strides + some random cross edges
    ea = list(range(0, 399))
    eb = [i + 1 for i in ea if (i + 1) % 40]
    ea = [i for i in ea if (i + 1) % 40]
    extra = rng.randint(0, 400, size=(30, 2))
    for a, b in extra:
        if a != b:
            ea.append(int(min(a, b)))
            eb.append(int(max(a, b)))
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array(ea, pa.int64()),
        "doc_b": pa.array(eb, pa.int64())}))
    local = dedup_canonical_map(docs, pairs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    dist = dedup_canonical_map(docs, pairs, local_threshold=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert local.equals(dist)


def test_fingerprint_pairs_rank_exact_dups_highest(ray_session):
    """Exact duplicates share every fingerprint; unrelated docs share few.
    Also checks the stop-key drop keeps the operator exact on its own
    declared semantics (brute-force reproduction below)."""
    from the_yelp_collaborative_knowledge_graph_ray.stages.dedup import (
        fingerprint_near_dup_pairs,
    )
    from the_yelp_collaborative_knowledge_graph_ray.stages.textstats import (
        winnow_fingerprints,
    )
    texts = {
        0: "the quick brown fox jumps over the lazy dog again and again",
        1: "the quick brown fox jumps over the lazy dog again and again",
        2: "a completely different document about ray data pipelines here",
        3: "the quick brown fox jumps over the sleepy dog again and again",
    }
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string())}))
    got = {(r["doc_a"], r["doc_b"]): r["n_common"] for r in
           fingerprint_near_dup_pairs(docs, min_common=3,
                                      max_df=10).take_all()}
    # brute force with the same stop-key rule
    fps = {i: set(winnow_fingerprints(t)) for i, t in texts.items()}
    from collections import Counter
    df = Counter(f for s in fps.values() for f in s)
    keep = {f for f, c in df.items() if c <= 10}
    exp = {}
    for a in texts:
        for b in texts:
            if a < b:
                n = len(fps[a] & fps[b] & keep)
                if n >= 3:
                    exp[(a, b)] = n
    assert got == exp
    assert got[(0, 1)] == len(fps[0] & keep)   # exact dup shares everything
    assert (0, 3) in got                        # near dup found
    assert (0, 2) not in got                    # unrelated absent


def test_multimodal_resize_and_frames(ray_session):
    from the_yelp_collaborative_knowledge_graph_ray.stages.multimodal import (
        FrameSampler,
        ImageResizer,
        resize_images,
        sample_frames,
        synthesize_media,
    )
    import pytest as _pytest
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 2, 3, 14], pa.int64()),   # image/video/image/video
        "text": pa.array(["abcdefgh", "0123456789abcdef", "", "xy"],
                         pa.string())}))
    media = synthesize_media(docs)
    rz = {r["media_id"]: r for r in resize_images(media).take_all()}
    assert set(rz) == {0, 3}                 # images only
    assert rz[0]["n_bytes"] == 2             # ceil(8/4)
    assert rz[0]["payload_hex"] == b"abcdefgh".hex().upper()[:4]
    assert rz[0]["width"] == (0 % 640 + 64) // 2
    assert rz[3]["n_bytes"] == 0 and rz[3]["payload_hex"] == ""  # empty doc
    fr = [r for r in sample_frames(media).take_all()]
    by_id = {}
    for r in fr:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {2, 14}             # videos only
    # duration_ms = (2 % 90) * 1000 = 2000 -> n = 2000//1000 + 1 = 3
    assert len(by_id[2]) == 3
    joined = "".join(r["frame_hex"] for r in sorted(by_id[2],
                                                    key=lambda r: r["frame_idx"]))
    # fake slicing covers a prefix of the payload without overlap
    assert b"0123456789abcdef".hex().upper().startswith(joined[:10])
    with _pytest.raises(NotImplementedError):
        ImageResizer(mode="real")(pa.table({"media_type": pa.array(["image"])}))
    with _pytest.raises(NotImplementedError):
        FrameSampler(mode="real")(pa.table({"media_type": pa.array(["video"])}))


def test_grouped_quantiles_matches_duckdb(ray_session):
    from the_yelp_collaborative_knowledge_graph_ray.functions.quantiles import (
        grouped_quantiles,
    )
    rng = np.random.RandomState(5)
    n = 30000
    tbl = pa.table({"g": pa.array(rng.randint(0, 4, n).astype("int64")),
                    "x": pa.array(rng.lognormal(2, 1, n))})
    got = grouped_quantiles(ray.data.from_arrow(tbl), "g", "x",
                            [0.1, 0.5, 0.9], num_partitions=4).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql("""
        SELECT g, unnest([0.1, 0.5, 0.9]) AS q,
               unnest([quantile_disc(x, 0.1), quantile_disc(x, 0.5),
                       quantile_disc(x, 0.9)]) AS value
        FROM t GROUP BY g ORDER BY 1, 2""").df()
    got = got.sort_values(["g", "q"]).reset_index(drop=True)
    assert (got["value"].to_numpy() == exp["value"].to_numpy()).all()


def test_sliding_window_every_event_in_two_windows(ray_session):
    from the_yelp_collaborative_knowledge_graph_ray.pipelines.relational import (
        sliding_window_agg,
    )
    res = sliding_window_agg("/root/testdata/sf0.001").to_pandas()
    import pyarrow.parquet as pq
    n_events = pq.read_metadata(
        "/root/testdata/sf0.001/events.parquet").num_rows
    assert res["n"].sum() == 2 * n_events        # width/slide = 2 replicas
    assert (res["w_start_s"] % 1800 == 0).all()  # aligned hop starts


def test_rank_and_moving_sum_with_planted_ties(ray_session, tmp_path):
    """RANK/DENSE_RANK tie semantics and the moving-window prefix-sum
    difference, on a corpus BUILT to have within-user value ties and
    groups shorter/longer than the window width — vs DuckDB windows."""
    import pandas as pd

    from the_yelp_collaborative_knowledge_graph_ray.pipelines.relational import (
        moving_sum_per_user,
        rank_events_per_user,
    )

    rng = np.random.RandomState(7)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 12, n).astype(np.int64),  # some users rare
        "ts": pd.to_datetime("2025-03-01")
        + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
        # values on a coarse grid -> many exact ties within a user
        "value": rng.randint(0, 5, n) * 0.25,
    })
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/events.parquet", index=False)
    con = duckdb.connect()
    con.register("events", df)

    got = rank_events_per_user(sf).to_pandas()
    exp = con.sql("""
        SELECT event_id,
               rank() OVER (PARTITION BY user_id
                            ORDER BY CAST(round(value*100) AS BIGINT) DESC)
                 AS rk,
               dense_rank() OVER (PARTITION BY user_id
                            ORDER BY CAST(round(value*100) AS BIGINT) DESC)
                 AS drk
        FROM events ORDER BY event_id""").df()
    got = got.sort_values("event_id").reset_index(drop=True)
    assert (got["rk"].to_numpy() == exp["rk"].to_numpy()).all()
    assert (got["drk"].to_numpy() == exp["drk"].to_numpy()).all()
    # planted grid actually produced ties (rank != dense_rank somewhere)
    assert (got["rk"] != got["drk"]).any()

    got = moving_sum_per_user(sf).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    exp = con.sql("""
        SELECT event_id,
               sum(CAST(round(value*100) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS win_sum_c,
               count(*)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS win_n
        FROM events ORDER BY event_id""").df()
    assert (got["win_sum_c"].to_numpy() == exp["win_sum_c"].to_numpy()).all()
    assert (got["win_n"].to_numpy() == exp["win_n"].to_numpy()).all()
    assert got["win_n"].min() == 1 and got["win_n"].max() == 3


def test_distinct_set_op_semantics(ray_session):
    """INTERSECT/EXCEPT are DISTINCT-set ops: duplicate input rows collapse,
    and membership ignores multiplicity — vs DuckDB on the same tables."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.setops import (
        distinct_set_op,
    )
    rng = np.random.RandomState(3)
    ta = pa.table({"k": rng.randint(0, 20, 300).astype(np.int64)})
    tb = pa.table({"k": rng.randint(10, 30, 300).astype(np.int64)})
    a, b = ray.data.from_arrow(ta), ray.data.from_arrow(tb)
    con = duckdb.connect()
    con.register("a", ta)
    con.register("b", tb)
    for op, sql_op in (("intersect", "INTERSECT"), ("except", "EXCEPT")):
        got = sorted(r["k"] for r in
                     distinct_set_op(a, b, ["k"], op).take_all())
        exp = sorted(r[0] for r in con.sql(
            f"SELECT k FROM a {sql_op} SELECT k FROM b").fetchall())
        assert got == exp, op
        assert len(got) == len(set(got))  # distinct output
    import pytest as _pytest
    with _pytest.raises(ValueError):
        distinct_set_op(a, b, ["k"], "union")


def test_sample_per_key_exact_counts_and_determinism(ray_session):
    """sample_per_key keeps EXACTLY min(n, group size) rows per key, the
    same rows on every run/partitioning, and different rows per seed."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.sampling import (
        sample_per_key,
    )
    rng = np.random.RandomState(11)
    t = pa.table({"id": np.arange(1000, dtype=np.int64),
                  "key": rng.randint(0, 37, 1000).astype(np.int64)})
    import pandas as pd
    sizes = pd.Series(t["key"].to_numpy()).value_counts()

    a = sample_per_key(ray.data.from_arrow(t), "key", "id", 5).to_pandas()
    b = sample_per_key(ray.data.from_arrow(t).repartition(7),
                       "key", "id", 5).to_pandas()
    got_sizes = a.groupby("key").size()
    for k, sz in sizes.items():
        assert got_sizes.get(k, 0) == min(5, sz)
    key_a = sorted(map(tuple, a[["key", "id"]].to_numpy().tolist()))
    key_b = sorted(map(tuple, b[["key", "id"]].to_numpy().tolist()))
    assert key_a == key_b                      # partitioning-independent
    c = sample_per_key(ray.data.from_arrow(t), "key", "id", 5,
                       seed=99).to_pandas()
    key_c = sorted(map(tuple, c[["key", "id"]].to_numpy().tolist()))
    assert key_c != key_a                      # seed changes the lottery


def test_hll_estimate_accuracy_and_merge_invariance(ray_session):
    """HLL estimate within 4 sigma (sigma ~= 1.04/sqrt(1024) ~= 3.3%) on
    three planted cardinalities, and the register table is identical under
    different partitionings (max-merge is shuffle-order-proof)."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.hll import (
        _bitlen_u64,
        hll_estimate,
        hll_registers,
    )
    # exact vectorized bitlen vs python int.bit_length
    w = np.concatenate([[0, 1, 2, 3], 2 ** np.arange(54),
                        2 ** np.arange(54) - 1]).astype(np.uint64)
    assert (_bitlen_u64(w) ==
            np.array([int(v).bit_length() for v in w])).all()

    for n_true in (800, 20_000, 150_000):
        keys = np.arange(n_true, dtype=np.int64) * 7919 + 13
        # each key appears 1-3 times: multiplicity must not matter
        reps = np.concatenate([keys, keys[: n_true // 2], keys[: n_true // 3]])
        ds = ray.data.from_arrow(pa.table({"k": reps}))
        regs = hll_registers(ds, "k")
        est = hll_estimate(regs)
        assert abs(est - n_true) / n_true < 4 * 1.04 / np.sqrt(1024), \
            (n_true, est)
        regs2 = hll_registers(
            ray.data.from_arrow(pa.table({"k": reps})).repartition(9), "k")
        assert sorted(map(tuple, pa.Table.from_pylist(
            regs.take_all()).to_pandas().to_numpy().tolist())) == \
            sorted(map(tuple, pa.Table.from_pylist(
                regs2.take_all()).to_pandas().to_numpy().tolist()))


def test_anti_join_semantics(ray_session):
    """anti_join == NOT IN on random tables, incl. duplicate right keys and
    duplicate left rows (all surviving copies kept)."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.setops import (
        anti_join,
    )
    rng = np.random.RandomState(5)
    lt = pa.table({"k": rng.randint(0, 40, 300).astype(np.int64),
                   "v": np.arange(300, dtype=np.int64)})
    rt = pa.table({"rk": rng.randint(20, 60, 500).astype(np.int64)})
    got = anti_join(ray.data.from_arrow(lt).repartition(5),
                    ray.data.from_arrow(rt).repartition(5),
                    "k", "rk", [("k", pa.int64()), ("v", pa.int64())]) \
        .to_pandas().sort_values("v")
    con = duckdb.connect()
    con.register("lt", lt)
    con.register("rt", rt)
    exp = con.sql("SELECT k, v FROM lt WHERE k NOT IN (SELECT rk FROM rt) "
                  "ORDER BY v").df()
    assert got["v"].tolist() == exp["v"].tolist()
    assert got["k"].tolist() == exp["k"].tolist()
    assert len(got) > 0


def test_grouped_centroids_vs_brute_force(ray_session):
    """Fixed-point grouped vector means == numpy brute force, identical
    under repartitioning (int sums commute), incl. negative components
    (floor, not truncation)."""
    from the_yelp_collaborative_knowledge_graph_ray.stages.similarity import (
        CENTROID_SCALE,
        grouped_centroids,
    )
    rng = np.random.RandomState(2)
    n, d = 300, 8
    g = rng.randint(0, 5, n).astype(np.int64)
    m = (rng.randn(n, d) * 0.7).astype(np.float32)
    t = pa.table({"label": g, "embedding": pa.array(list(m), type=pa.list_(pa.float32()))})
    got = grouped_centroids(ray.data.from_arrow(t).repartition(6),
                            "label").to_pandas().sort_values(["g", "dim"])
    fp = np.floor(m.astype(np.float64) * CENTROID_SCALE).astype(np.int64)
    for gg in np.unique(g):
        sub = fp[g == gg]
        exp = sub.sum(axis=0) // len(sub)
        rows = got[got["g"] == gg].sort_values("dim")
        assert (rows["centroid_fp"].to_numpy() == exp).all()
        assert (rows["n"] == len(sub)).all()


def test_quantiles_cont_matches_numpy(ray_session):
    """quantiles_cont == numpy linear-interpolation percentiles on random
    doubles (numpy 'linear' method IS the PERCENTILE_CONT formula)."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.quantiles import (
        quantiles_cont,
    )
    rng = np.random.RandomState(4)
    x = np.round(rng.lognormal(3, 1, 5000) * 100) / 100
    ds = ray.data.from_arrow(pa.table({"x": x})).repartition(8)
    qs = [0.1, 0.25, 0.5, 0.9, 0.99]
    got = quantiles_cont(ds, "x", qs)
    exp = np.percentile(x, [q * 100 for q in qs], method="linear")
    assert np.allclose(got["value"].to_numpy(), exp, rtol=0, atol=1e-9)


def test_funnel_vs_sequential(ray_session, tmp_path):
    """funnel_per_user == a sequential greedy scan, incl. users who stall
    at each stage and strict-inequality succession."""
    import pandas as pd

    from the_yelp_collaborative_knowledge_graph_ray.pipelines.relational import (
        funnel_per_user,
    )
    rng = np.random.RandomState(9)
    n = 600
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 25, n).astype(np.int64),
        "ts": pd.to_datetime("2025-01-01")
        + pd.to_timedelta(rng.randint(0, 10**5, n), unit="s"),
        "event_type": rng.choice(["view", "click", "purchase", "error"], n,
                                 p=[0.5, 0.25, 0.05, 0.2]),
    })
    df.to_parquet(f"{tmp_path}/events.parquet", index=False)
    got = funnel_per_user(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()

    us = df["ts"].astype("int64") // 1000  # ns -> us
    for uid, sub in df.assign(us=us).groupby("user_id"):
        prev = -np.inf
        exp = []
        for stage in ("view", "click", "purchase"):
            c = sub[(sub["event_type"] == stage) & (sub["us"] > prev)]
            t = c["us"].min() if len(c) else None
            exp.append(t)
            prev = t if t is not None else np.inf
        row = got.loc[uid]
        for name, e in zip(["t1_us", "t2_us", "t3_us"], exp):
            g = row[name]
            assert (pd.isna(g) and e is None) or g == e, (uid, name, g, e)
    # at least one user must stall mid-funnel for the test to mean anything
    assert got["t3_us"].isna().any() and got["t1_us"].notna().any()


def test_cms_estimates_bound_true_counts(ray_session):
    """CMS point estimates: never below the true count, within the eps*N
    bound for heavy hitters, and merge-invariant across partitionings."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.cms import (
        CMS_WIDTH,
        cms_estimate,
        cms_sketch,
    )
    rng = np.random.RandomState(6)
    # Zipf-ish: a few heavy keys + a long tail
    keys = np.concatenate([
        np.repeat([7, 13, 99], [5000, 3000, 1500]),
        rng.randint(1000, 9000, 20000)]).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys}))
    sk = pa.Table.from_pylist(cms_sketch(ds, "k").take_all())
    import collections
    true = collections.Counter(keys.tolist())
    probe = np.array([7, 13, 99, 1000, 4242], np.int64)
    est = cms_estimate(sk, probe)
    eps_n = np.e / CMS_WIDTH * len(keys)
    for k, e in zip(probe, est):
        assert e >= true[k]
        assert e <= true[k] + 4 * eps_n
    sk2 = pa.Table.from_pylist(
        cms_sketch(ds.repartition(11), "k").take_all())
    a = sorted(map(tuple, sk.to_pandas().to_numpy().tolist()))
    b = sorted(map(tuple, sk2.to_pandas().to_numpy().tolist()))
    assert a == b


def test_kmeans_fp_matches_sequential(ray_session):
    """Distributed integer-exact Lloyd == a sequential numpy twin,
    bit-for-bit (assignments AND centroids), across partitionings."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.kmeans import (
        FP_SCALE,
        kmeans_fp,
    )
    rng = np.random.RandomState(12)
    n, d, k, iters = 300, 8, 4, 5
    m = rng.standard_normal((n, d)).astype(np.float32)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(m.tolist(), pa.list_(pa.float32()))}))

    fp = np.floor(m.astype(np.float64) * FP_SCALE).astype(np.int64)
    cents = fp[:k].copy()
    for _ in range(iters):
        d2 = (fp * fp).sum(1)[:, None] - 2 * (fp @ cents.T) \
            + (cents * cents).sum(1)[None, :]
        a = d2.argmin(1)
        nxt = cents.copy()
        for c in range(k):
            sel = fp[a == c]
            if len(sel):
                nxt[c] = sel.sum(0) // len(sel)
        cents = nxt
    d2 = (fp * fp).sum(1)[:, None] - 2 * (fp @ cents.T) \
        + (cents * cents).sum(1)[None, :]
    exp_assign = d2.argmin(1)

    got, got_cents = kmeans_fp(ds.repartition(6), k=k, iters=iters)
    ga = got.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    assert (ga == exp_assign).all()
    assert (got_cents == cents).all()
    assert len(np.unique(ga)) > 1      # nontrivial clustering


def test_longest_streak_and_cume_dist_planted(ray_session, tmp_path):
    """Gaps-and-islands streaks on a corpus with planted gaps, same-day
    duplicate events and single-day users; CUME_DIST on a coarse tie grid
    — both vs the exact DuckDB window/group equivalents."""
    import pandas as pd

    from the_yelp_collaborative_knowledge_graph_ray.pipelines.relational import (
        cume_dist_qty,
        longest_streak_per_user,
    )

    rng = np.random.RandomState(11)
    n = 600
    # random users with day offsets drawn from a small range -> streaks
    df = pd.DataFrame({
        "user_id": rng.randint(0, 15, n).astype(np.int64),
        "ts": pd.to_datetime("2025-03-01")
        + pd.to_timedelta(rng.randint(0, 20, n), unit="D")
        + pd.to_timedelta(rng.randint(0, 86400, n), unit="s"),
    })
    # planted: user 100 has exactly days {0,1,2,3,4} then {10,11} -> 5
    planted = pd.DataFrame({
        "user_id": np.int64(100),
        "ts": pd.to_datetime("2025-06-01")
        + pd.to_timedelta([0, 1, 2, 3, 4, 4, 10, 11], unit="D"),
    })
    # planted: user 101 active one day only -> streak 1
    single = pd.DataFrame({"user_id": [np.int64(101)],
                           "ts": [pd.to_datetime("2025-06-05")]})
    df = pd.concat([df, planted, single], ignore_index=True)
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/events.parquet", index=False)
    con = duckdb.connect()
    con.register("events", df)

    got = longest_streak_per_user(sf).to_pandas().sort_values(
        "user_id").reset_index(drop=True)
    exp = con.sql("""
        WITH d AS (SELECT DISTINCT user_id,
                     date_diff('day', DATE '1970-01-01',
                               CAST(ts AS DATE)) AS day FROM events),
        i AS (SELECT user_id, day,
                     day - ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY day) AS isl FROM d),
        r AS (SELECT user_id, isl, count(*) AS len FROM i GROUP BY 1, 2)
        SELECT user_id, CAST(max(len) AS BIGINT) AS streak_days
        FROM r GROUP BY 1 ORDER BY 1""").df()
    assert (got["user_id"].to_numpy() == exp["user_id"].to_numpy()).all()
    assert (got["streak_days"].to_numpy()
            == exp["streak_days"].to_numpy()).all()
    byu = got.set_index("user_id")["streak_days"]
    assert byu[100] == 5 and byu[101] == 1

    li = pd.DataFrame({
        "l_orderkey": np.arange(500, dtype=np.int64),
        "l_linenumber": np.ones(500, dtype=np.int32),
        "l_returnflag": rng.choice(["A", "N", "R"], 500),
        "l_quantity": rng.randint(1, 8, 500).astype(np.float64),  # ties
    })
    li.to_parquet(f"{sf}/lineitem.parquet", index=False)
    con.register("lineitem", li)
    got = cume_dist_qty(sf).to_pandas().sort_values(
        ["l_orderkey", "l_linenumber"]).reset_index(drop=True)
    exp = con.sql("""
        SELECT l_orderkey,
               count(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               * 1000000 // count(*) OVER (PARTITION BY l_returnflag)
                 AS cd6
        FROM lineitem ORDER BY l_orderkey""").df()
    assert (got["cd6"].to_numpy() == exp["cd6"].to_numpy()).all()
    # the top value of every group must close at exactly 1.0
    assert got.groupby("l_returnflag")["cd6"].max().eq(1_000_000).all()


def test_mannwhitney_and_audit_planted(ray_session, tmp_path):
    """2*U_A equals the naive pairwise definition (2*#(a>b) + #ties) on a
    tie-heavy planted sample; the audit counts planted violations."""
    import pandas as pd

    from the_yelp_collaborative_knowledge_graph_ray.pipelines.curation import (
        quality_audit_events,
    )
    from the_yelp_collaborative_knowledge_graph_ray.pipelines.relational import (
        mannwhitney_u_events,
    )

    rng = np.random.RandomState(5)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["click", "purchase", "error"], n),
        "value": rng.randint(0, 12, n) * 0.25,      # heavy exact ties
        "ts": pd.to_datetime("2024-01-10")
        + pd.to_timedelta(rng.randint(0, 30 * 86400, n), unit="s"),
    })
    # planted duplicate primary key
    df.loc[n - 1, "event_id"] = df.loc[0, "event_id"]
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/events.parquet", index=False)

    out = mannwhitney_u_events(sf).to_pandas().iloc[0]
    a = np.round(df[df.event_type == "click"].value.to_numpy() * 100)
    b = np.round(df[df.event_type == "purchase"].value.to_numpy() * 100)
    gt = (a[:, None] > b[None, :]).sum()
    eq = (a[:, None] == b[None, :]).sum()
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    assert out["u2_a"] == 2 * gt + eq

    audit = quality_audit_events(sf).to_pandas() \
        .set_index("rule")["n_violations"].to_dict()
    assert audit["dup_event_id"] == 1
    assert audit["unknown_event_type"] == (df.event_type == "error").sum()
    assert audit["value_over_cap"] == 0  # values max 2.75
    assert audit["ts_after_cutoff"] == (
        df.ts >= pd.Timestamp("2024-01-25")).sum()


def test_pareto_abc_exact_boundaries(ray_session, tmp_path):
    """Cumulative share thresholds decided in integers: a customer whose
    cumulative share is EXACTLY 80% is still class A (<=), the next one
    crosses into B; same at 95%."""
    import pandas as pd

    from the_yelp_collaborative_knowledge_graph_ray.pipelines.relational import (
        pareto_abc_customers,
    )

    # revenues 40, 40, 15, 5 -> cum shares 40%, 80%, 95%, 100%
    df = pd.DataFrame({
        "o_custkey": np.array([1, 2, 3, 4], np.int64),
        "o_totalprice": [40.0, 40.0, 15.0, 5.0],
    })
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/orders.parquet", index=False)
    out = pareto_abc_customers(sf).to_pandas() \
        .sort_values("o_custkey").reset_index(drop=True)
    assert out["abc"].tolist() == ["A", "A", "B", "C"]
    # ties in revenue break by custkey: cust 1 before cust 2


def test_response_latency_planted(ray_session):
    """Each user turn pairs with the NEXT assistant turn only; trailing
    user turns and assistant-free convs drop out."""
    import pyarrow as pa
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.queries import (
        _q_cq_response_latency,
    )
    from the_yelp_collaborative_knowledge_graph_ray.functions.grouped import (
        sorted_group_apply,  # noqa: F401  (import guard for the kernel)
    )

    # reach into the wrapper's block through a tiny in-memory dataset by
    # monkey-free reconstruction: build the same shape the wrapper reads
    import the_yelp_collaborative_knowledge_graph_ray.queries as Q

    t = pa.table({
        "conv_id": ["c1"] * 4 + ["c2"] * 2,
        "turn_idx": pa.array([0, 1, 2, 3, 0, 1], pa.int32()),
        "role": ["user", "assistant", "user", "user",
                 "user", "system"],
        "ts": pa.array([0, 5_000_000, 7_000_000, 9_000_000,
                        0, 1_000_000], pa.timestamp("us")),
    })
    orig = Q._read_transcripts
    try:
        Q._read_transcripts = (
            lambda sf_dir, columns=None: ray.data.from_arrow(
                t.select(columns) if columns else t))
        out = _q_cq_response_latency("ignored").to_pandas()
    finally:
        Q._read_transcripts = orig
    # c1: only turn 0 pairs (lat 5s); turns 2,3 have no later assistant.
    # c2: no assistant at all -> dropped.
    assert out["conv_id"].tolist() == ["c1"]
    assert out["n_pairs"].tolist() == [1]
    assert out["sum_lat_us"].tolist() == [5_000_000]


def test_robust_anomaly_planted_outlier(ray_session, tmp_path):
    """A gross outlier is flagged; grid inliers are not (MAD > 0 case)."""
    import pandas as pd

    from the_yelp_collaborative_knowledge_graph_ray.pipelines.relational import (
        robust_anomaly_events,
    )

    rng = np.random.RandomState(2)
    n = 200
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": ["click"] * n,
        "value": rng.randint(8, 13, n) * 1.0,   # med ~10, MAD ~1
    })
    df.loc[0, "value"] = 1000.0                 # planted outlier
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/events.parquet", index=False)
    out = robust_anomaly_events(sf).to_pandas()
    assert 0 in out["event_id"].tolist()
    # median±MAD band members never flagged
    vals = out["vc"].to_numpy()
    assert (np.abs(vals - 1000) <= 3 * 200).sum() <= len(vals)
    med = np.median(np.round(df["value"] * 100))
    mad = np.median(np.abs(np.round(df["value"] * 100) - med))
    exp = set(df.event_id[np.abs(np.round(df["value"] * 100) - med)
                          > 3 * mad])
    assert set(out["event_id"]) == exp


def test_trailing_range_window_peer_semantics(ray_session, tmp_path):
    """RANGE frames include order-key PEERS: two events at the identical
    timestamp must each see BOTH values in their window — a ROWS frame
    cannot express this. Verified against DuckDB's RANGE window."""
    import pandas as pd

    from the_yelp_collaborative_knowledge_graph_ray.pipelines.relational import (
        trailing_sum_1h,
    )

    base = pd.Timestamp("2024-01-01 12:00:00")
    df = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "user_id": np.int64(1),
        "value": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0],
        "ts": [base, base,                       # peers at t0
               base + pd.Timedelta(minutes=30),
               base + pd.Timedelta(minutes=61),  # t0 pair ages out
               base + pd.Timedelta(hours=3),
               base + pd.Timedelta(hours=3)],    # peers again
    })
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/events.parquet", index=False)
    got = trailing_sum_1h(sf).to_pandas().sort_values("event_id")
    assert got["win_sum_c"].tolist() == [
        300, 300,            # each t0 peer sees both (1+2)
        700,                 # 1+2+4
        1200,                # 4+8 (t0 exactly 61min old -> out)
        4800, 4800]          # 16+32 peers
    con = duckdb.connect(); con.register("events", df)
    exp = con.sql("""
        SELECT CAST(sum(CAST(round(value*100) AS BIGINT)) OVER (
          PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) s
        FROM events ORDER BY event_id""").df()["s"]
    assert got["win_sum_c"].tolist() == exp.tolist()


def test_cluster_balanced_cap_and_determinism(ray_session):
    """curation_cluster_balanced keeps at most CAP rows per cluster,
    selects by the deterministic hash lottery (two runs identical), and
    every kept row's cluster matches the trainer's assignment."""
    from the_yelp_collaborative_knowledge_graph_ray import queries as Q

    sf = "/root/testdata/sf0.01"
    a = Q._q_curation_cluster_balanced(sf).to_pandas() \
        .sort_values(["cluster", "rank"]).reset_index(drop=True)
    b = Q._q_curation_cluster_balanced(sf).to_pandas() \
        .sort_values(["cluster", "rank"]).reset_index(drop=True)
    assert a.equals(b)
    per = a.groupby("cluster").size()
    assert (per <= Q.CLUSTER_BAL_CAP).all()
    assert a["rank"].min() == 1
    # assignments come from the bit-reproducible trainer
    from the_yelp_collaborative_knowledge_graph_ray.functions.kmeans import (
        kmeans_fp,
    )
    asg, _ = kmeans_fp(Q._emb(sf), k=Q.CLUSTER_BAL_K, iters=5)
    m = asg.to_pandas().set_index("vec_id")["cluster"]
    assert (a.set_index("vec_id")["cluster"] == m.loc[a["vec_id"]]).all()
