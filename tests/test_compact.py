"""Parquet small-file compaction: lossless, fewer files, atomic manifest."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from the_yelp_collaborative_knowledge_graph_ray.state.compact import (
    compact_parquet_dir,
    plan_groups,
)


def _make_small_files(d, n_files=12, rows_each=50):
    os.makedirs(d, exist_ok=True)
    for i in range(n_files):
        pq.write_table(pa.table({
            "k": pa.array(range(i * rows_each, (i + 1) * rows_each),
                          pa.int64()),
            "v": pa.array([f"r{i}-{j}" for j in range(rows_each)],
                          pa.string())}),
            os.path.join(d, f"block-{i:04d}.parquet"))


def test_plan_groups_packing():
    files = [(f"f{i}", 50) for i in range(12)]
    groups = plan_groups(files, target_rows=200)
    assert [len(g) for g in groups] == [4, 4, 4]
    # oversized file stays alone, never blocks others
    groups = plan_groups([("big", 500), ("a", 50), ("b", 50)], 200)
    assert groups[0] == ["big"]


def test_compact_lossless(ray_session, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _make_small_files(src)
    manifest = compact_parquet_dir(src, dst, target_rows=200)
    assert manifest["n_input_files"] == 12
    assert manifest["n_output_files"] == 3
    before = pq.read_table(src).sort_by("k")
    parts = [os.path.join(dst, f) for f in sorted(os.listdir(dst))
             if f.endswith(".parquet")]
    after = pa.concat_tables([pq.read_table(p) for p in parts]) \
        .sort_by("k")
    assert before.equals(after)
    # lineage: every source appears exactly once across outputs
    srcs = [s for o in manifest["outputs"] for s in o["sources"]]
    assert sorted(srcs) == sorted(os.listdir(src))
    assert os.path.exists(os.path.join(dst, "manifest.json"))
