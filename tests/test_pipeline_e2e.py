"""End-to-end acceptance: triple-set P/R vs oracle, resume, invariants."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from oracle_impl import oracle_triples
from the_yelp_collaborative_knowledge_graph_ray import config as C
from the_yelp_collaborative_knowledge_graph_ray.pipelines.kg import run_kg


@pytest.fixture(scope="module")
def built(ray_session, sf_tiny):
    ds = run_kg("sf0.001")
    df = ds.to_pandas()
    return df, sf_tiny


def test_triple_pr_vs_oracle(built):
    df, fdir = built
    got = set(zip(df["subj"], df["pred"], df["obj"]))
    want = oracle_triples(fdir)
    tp = len(got & want)
    precision = tp / len(got)
    recall = tp / len(want)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # on the controlled fixture the match should in fact be exact
    assert got == want, (
        f"extra={list(got - want)[:5]} missing={list(want - got)[:5]}")


def test_output_sorted_and_deduped(built):
    df, _ = built
    key = list(zip(df["subj"], df["pred"], df["obj"]))
    assert key == sorted(key)
    assert len(key) == len(set(key))


def test_per_turn_text_equality(built):
    """input_hint invariant: text literals match input rows exactly under
    (conv_id, turn_idx)."""
    df, fdir = built
    texts = df[df["pred"] == C.PRED_TEXT]
    got = {row.subj: row.obj for row in texts.itertuples()}
    src = pq.read_table(f"{fdir}/transcripts.parquet").to_pylist()
    assert len(got) == len(src)
    for r in src:
        iri = f"{C.ENT}turn/{r['conv_id']}/{r['turn_idx']}"
        assert got[iri] == r["text"]


def test_resume_identical(ray_session, sf_tiny, tmp_path):
    ck = str(tmp_path / "ck")
    df1 = run_kg("sf0.001", checkpoint_dir=ck).to_pandas()
    # simulate failure after the mention stage: final + links lost
    shutil.rmtree(os.path.join(ck, "final"))
    shutil.rmtree(os.path.join(ck, "links"))
    df2 = run_kg("sf0.001", checkpoint_dir=ck).to_pandas()
    a = df1.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    b = df2.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    assert a.equals(b)
    # manifests carry lineage + counters
    import json
    m = json.load(open(os.path.join(ck, "final", "manifest.json")))
    assert m["complete"] and m["rows"] == len(df1) and m["upstream"]


def test_partitioned_stage_kill_and_resume(ray_session, tmp_path):
    """north_rule resume granularity: a stage killed at partition k resumes
    by recomputing ONLY k..n — completed partitions are read back, never
    rebuilt, and the final bytes equal a clean run."""
    import json

    import pyarrow as pa
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.state.checkpoint import (
        CheckpointedRun,
    )

    parts = [f"p{i}" for i in range(5)]
    built = []  # records every build_one invocation

    def make_build(fail_at=None):
        def build_one(pkey):
            if pkey == fail_at:
                raise RuntimeError("simulated mid-stage death")
            built.append(pkey)
            i = int(pkey[1:])
            return ray.data.from_arrow(pa.table({
                "part": pa.array([pkey] * 10),
                "v": pa.array(range(i * 10, i * 10 + 10), pa.int64())}))
        return build_one

    ck = CheckpointedRun(str(tmp_path / "ck"))
    # first run dies at partition p3 (mid-stage, after committing p0-p2)
    with pytest.raises(RuntimeError):
        ck.partitioned_stage("s", parts, make_build(fail_at="p3"))
    assert built == ["p0", "p1", "p2"]
    assert ck.partition_complete("s", "p2")
    assert not ck.partition_complete("s", "p3")
    assert not os.path.exists(os.path.join(str(tmp_path / "ck"), "s",
                                           "manifest.json"))

    # resume: only p3, p4 recompute
    built.clear()
    ds = ck.partitioned_stage("s", parts, make_build())
    assert built == ["p3", "p4"]
    df = ds.to_pandas().sort_values("v").reset_index(drop=True)
    assert df["v"].tolist() == list(range(50))

    # clean-run comparison: byte-identical partition data files
    ck2 = CheckpointedRun(str(tmp_path / "ck2"))
    built.clear()
    ck2.partitioned_stage("s", parts, make_build())
    for pkey in parts:
        d1 = os.path.join(str(tmp_path / "ck"), "s", "parts",
                          f"part={pkey}", "data")
        d2 = os.path.join(str(tmp_path / "ck2"), "s", "parts",
                          f"part={pkey}", "data")
        b1 = b"".join(open(os.path.join(d1, f), "rb").read()
                      for f in sorted(os.listdir(d1)))
        b2 = b"".join(open(os.path.join(d2, f), "rb").read()
                      for f in sorted(os.listdir(d2)))
        assert b1 == b2, pkey

    # second rerun is a pure no-op (everything complete)
    built.clear()
    ck.partitioned_stage("s", parts, make_build())
    assert built == []
    m = json.load(open(os.path.join(str(tmp_path / "ck"), "s",
                                    "manifest.json")))
    assert m["granularity"] == "partition" and m["rows"] == 50
    assert [p["partition"] for p in m["partitions"]] == parts


def test_materialize_kill_and_resume_per_range(ray_session, sf_tiny, tmp_path):
    """north_rule resume granularity for the FINAL stage: a death inside
    the materialize sort (between range commits) resumes at the first
    incomplete RANGE — completed ranges are read back, never re-sorted —
    and the result is identical to a clean run. Also asserts the on-disk
    stage artifact is globally sorted across range dirs and files."""
    from the_yelp_collaborative_knowledge_graph_ray.pipelines.kg import (
        run_kg_partitioned,
    )

    cols = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype"]

    def canon(df):
        return df[cols].sort_values(cols).reset_index(drop=True)

    clean = canon(run_kg("sf0.001").to_pandas())

    ck = str(tmp_path / "ckkill")
    calls, armed = [], [True]

    def hook(pkey):
        calls.append(pkey)
        if pkey == "00003" and armed[0]:
            raise RuntimeError("simulated mid-sort death")

    with pytest.raises(RuntimeError):
        run_kg_partitioned("sf0.001", ck, n_buckets=8, fail_hook=hook)
    assert calls == ["00000", "00001", "00002", "00003"]

    armed[0] = False
    calls.clear()
    got = run_kg_partitioned("sf0.001", ck, n_buckets=8, fail_hook=hook)
    # ranges 0-2 committed before the death: resume starts at 00003
    assert calls[0] == "00003" and "00000" not in calls
    assert clean.equals(canon(got.to_pandas()))

    # the committed artifact is globally sorted in (range dir, file) order
    root = os.path.join(ck, "final_ranges", "parts")
    prev = None
    for pdir in sorted(os.listdir(root)):
        ddir = os.path.join(root, pdir, "data")
        if not os.path.isdir(ddir):
            continue
        for fn in sorted(x for x in os.listdir(ddir)
                         if x.endswith(".parquet")):
            t = pq.read_table(os.path.join(ddir, fn),
                              columns=["subj", "pred", "obj"])
            rows = list(zip(t["subj"].to_pylist(), t["pred"].to_pylist(),
                            t["obj"].to_pylist()))
            assert rows == sorted(rows), (pdir, fn)
            if rows:
                assert prev is None or rows[0] >= prev, (pdir, fn)
                prev = rows[-1]


def test_run_kg_partitioned_equals_run_kg(ray_session, sf_tiny, tmp_path):
    from the_yelp_collaborative_knowledge_graph_ray.pipelines.kg import (
        run_kg_partitioned,
    )
    a = run_kg("sf0.001").to_pandas() \
        .sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    b = run_kg_partitioned("sf0.001", str(tmp_path / "ckp")).to_pandas() \
        .sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    assert a.equals(b)


def test_partitioned_task_sort_equals_distributed_fallback(
        ray_session, sf_tiny, tmp_path):
    """The per-range single-task Arrow sort (external-sort reduce, the
    default) and the distributed Ray-sort fallback (forced via
    ``task_sort_max_bytes=0`` — the path a skewed over-sized bucket takes)
    must produce identical committed artifacts."""
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray import config as C
    from the_yelp_collaborative_knowledge_graph_ray.fixtures import generator
    from the_yelp_collaborative_knowledge_graph_ray.pipelines.kg import (
        read_transcripts,
    )
    from the_yelp_collaborative_knowledge_graph_ray.stages import (
        extract,
        materialize,
    )
    from the_yelp_collaborative_knowledge_graph_ray.state.checkpoint import (
        CheckpointedRun,
    )

    fdir = generator.ensure_fixtures("sf0.001")
    tri = extract.structural_triples(read_transcripts(fdir)).materialize()
    outs = []
    for name, cap in (("fast", 512 << 20), ("fallback", 0)):
        ds = materialize.materialize_partitioned(
            tri, CheckpointedRun(str(tmp_path / name)), stage="final",
            known_combos=C.KNOWN_COMBOS, n_buckets=4,
            task_sort_max_bytes=cap)
        outs.append(ds.to_pandas().sort_values(
            ["subj", "pred", "obj"]).reset_index(drop=True))
    assert outs[0].equals(outs[1])
    assert len(outs[0]) > 0


def test_streaming_encode_first_final_equals_monolithic(
        ray_session, sf_tiny, tmp_path):
    """``run_kg(final_ckpt_dir=...)`` — the streaming build with the
    encode-first range-bucketed final (the bench800 memory-boundary path)
    — must equal the monolithic ``run_kg`` row-for-row."""
    cols = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype"]

    def canon(df):
        return df[cols].sort_values(cols).reset_index(drop=True)

    a = canon(run_kg("sf0.001").to_pandas())
    b = canon(run_kg("sf0.001",
                     final_ckpt_dir=str(tmp_path / "ckef"),
                     n_buckets=8).to_pandas())
    assert a.equals(b)


def test_incremental_merge_equals_full_rebuild(ray_session):
    """Delta-ingestion invariance: build the KG on two disjoint
    conversation subsets, merge with the materializer (union + ONE global
    sort-dedup — the engine's incremental-merge operation), and the result
    is row-identical to a single full build. This is what lets a 100 TB
    deployment ingest new transcript drops without recomputing history."""
    import pyarrow.compute as pc

    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.fixtures import generator
    from the_yelp_collaborative_knowledge_graph_ray.pipelines.kg import (
        build_graph,
    )
    from the_yelp_collaborative_knowledge_graph_ray.stages.materialize import (
        materialize,
    )
    fdir = generator.ensure_fixtures("sf0.001")
    full_t = ray.data.read_parquet(f"{fdir}/transcripts.parquet")

    def half(keep_odd: bool):
        def f(b):
            odd = None
            for ch in "13579":  # conv-level split: last-digit parity
                m = pc.ends_with(b["conv_id"], ch)
                odd = m if odd is None else pc.or_(odd, m)
            return b.filter(odd if keep_odd else pc.invert(odd))
        return full_t.map_batches(f, batch_format="pyarrow",
                                  zero_copy_batch=True)

    a = build_graph(half(True), fdir, concurrency=2)
    b = build_graph(half(False), fdir, concurrency=2)
    assert a.count() > 0 and b.count() > 0  # the split is non-degenerate
    merged = materialize(a.union(b)).to_pandas()
    full = build_graph(full_t, fdir, concurrency=2).to_pandas()
    cols = list(full.columns)
    m = sorted(map(tuple, merged[cols].to_numpy().tolist()))
    f = sorted(map(tuple, full[cols].to_numpy().tolist()))
    assert m == f
