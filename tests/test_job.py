"""The `ray job submit` entrypoint: idempotent resume, metrics, NT output."""

import glob
import gzip
import json
import os
import shutil

from the_yelp_collaborative_knowledge_graph_ray import job


def test_job_run_resume_and_metrics(ray_session, sf_tiny, tmp_path):
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "nt")
    m1 = job.run_job("sf0.001", ck, output=out, gzip=True)
    assert m1["triples"] > 0
    assert m1["rebuilt_partitions"] == len(m1["partitions"]) >= 1
    # every partition carries lineage metrics
    assert all(p["rows"] > 0 and "wall_sec" in p for p in m1["partitions"])
    # metrics.json persisted next to the manifests
    md = json.load(open(os.path.join(ck, "metrics.json")))
    assert md["triples"] == m1["triples"]
    # gzip NT part files round-trip and line count == triple count
    lines = []
    for fn in glob.glob(os.path.join(out, "*.nt.gz")):
        with gzip.open(fn, "rt") as f:
            lines.extend(f.read().splitlines())
    assert len(lines) == m1["triples"]
    assert all(ln.endswith(" .") for ln in lines[:50])

    # resubmit same command: full resume — nothing recomputed
    m2 = job.run_job("sf0.001", ck)
    assert m2["rebuilt_partitions"] == 0
    assert m2["triples"] == m1["triples"]

    # kill one extraction partition + two materialize RANGES: exactly one
    # extract shard and exactly two sort ranges rebuild (the rest resume)
    parts = sorted(os.listdir(os.path.join(ck, "extract_triples", "parts")))
    shutil.rmtree(os.path.join(ck, "extract_triples", "parts", parts[0]))
    rparts = sorted(os.listdir(os.path.join(ck, "final_ranges", "parts")))
    for rp in rparts[:2]:
        shutil.rmtree(os.path.join(ck, "final_ranges", "parts", rp))
    m3 = job.run_job("sf0.001", ck)
    assert m3["rebuilt_partitions"] == 1
    assert m3["stages"]["final_ranges"]["rebuilt_ranges"] == 2
    assert m3["triples"] == m1["triples"]


def test_job_cli_main(ray_session, sf_tiny, tmp_path, capsys):
    ck = str(tmp_path / "ck2")
    rc = job.main(["--input", "sf0.001", "--checkpoint-dir", ck,
                   "--no-enrichment"])
    assert rc == 0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["triples"] > 0 and printed["output"] is None
