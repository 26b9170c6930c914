"""Benchmark harness for the Ray-Data KG engine.

Default mode: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and print ONE JSON line::

    {"metric": "kg_end_to_end_triples_per_sec", "value": N, "unit": "sec",
     "queries": {"kg_pipeline_full": sec, ...}, "sf": "sf0.1", "num_cpus": 32}

``--scaling`` mode (BASELINE.md protocol): run the flagship pipeline twice in
FRESH subprocesses — ``num_cpus=8`` then ``num_cpus=32`` — on the same input
and report both throughputs plus scaling efficiency
``throughput_32 / (4 * throughput_8)``.

This script OWNS its Ray session (the only non-test surface that does).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Queries timed in the default bench run: the flagship KG build plus one
# representative per operator family (SURVEY.md §2 / training-data ops).
HEADLINE_QUERIES = [
    "kg_pipeline_full",
    "kg_structural_triples",
    "kg_mention_triples",
    "curation_pipeline",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_topk_cosine",
    "search_bm25",
    "text_quality",
    "text_langid",
    "rel_groupby_lineitem",
    "rel_join_orders_customer",
    "events_sessionize",
    "kg_pagerank",
    "dedup_semantic",
    "rel_tpch_q3",
]


def _init_ray(num_cpus: int) -> None:
    # Ray's default object store here is 42.9% of RAM and its resource
    # manager throttles shuffle-heavy jobs against that budget well before
    # any spilling (bench800's final sort ran 1.5x slower on the default);
    # Ray itself recommends >= 50%. Applies identically to every arm of a
    # scaling pair — the analog of sizing per-node memory on a real cluster.
    os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.6")
    # Console log level ERROR for ray.data in driver AND workers (the env
    # var is inherited by the raylet's worker processes in local mode);
    # file logging stays at DEBUG. See ray_data_logging_quiet.yaml.
    quiet = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "ray_data_logging_quiet.yaml")
    if os.path.exists(quiet):
        os.environ.setdefault("RAY_DATA_LOGGING_CONFIG", quiet)
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    # Ray Data's per-operator resource reservation (reserves 50% of the
    # budget per operator pair) throttles multi-branch union pipelines to
    # a fraction of the cluster on this box: the flagship's fused
    # extract→union→dedup+encode job ran ~1 task at a time, 25 s wall for
    # ~130 CPU-s of work on 16 CPUs. Disabling it (measured, bench800)
    # cut that phase 25 s → 11.4 s with identical output. The memory
    # budgeting it provides matters when the working set presses the
    # object store — here the store is sized to 60% of RAM (above) and
    # every stage streams, so admission control is pure idle time.
    DataContext.get_current().op_resource_reservation_enabled = False


def _consume(res) -> int:
    """Force full execution; return row count."""
    import pandas as pd
    import pyarrow as pa

    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, (pd.DataFrame, pa.Table)):
        return len(res)
    return 0


def run_default(sf_dir: str, num_cpus: int) -> dict:
    _init_ray(num_cpus)
    from the_yelp_collaborative_knowledge_graph_ray import queries as Q
    from the_yelp_collaborative_knowledge_graph_ray.fixtures import generator

    generator.ensure_fixtures(sf_dir)  # exclude fixture gen from timings
    qs = Q.queries()
    # min of 2 reps per query: this host charges a large, PER-PROCESS
    # first-touch page-fault tax that swings 2-30x run to run (BASELINE.md
    # "ambient spread"); the second rep reuses worker processes and heap
    # pages, so min-of-2 measures the code, not the allocator weather.
    # Reported explicitly as reps=2.
    reps = 2
    timings: dict[str, float] = {}
    kg_triples = 0
    for name in HEADLINE_QUERIES:
        if name not in qs:
            continue
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            n = _consume(qs[name](sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        if name == "kg_pipeline_full":
            kg_triples = n
    total = round(sum(timings.values()), 3)
    kg_sec = timings.get("kg_pipeline_full", 0.0) or 1.0
    return {
        "metric": "kg_end_to_end_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "num_cpus": num_cpus,
        "kg_triples": kg_triples,
        "kg_triples_per_sec": round(kg_triples / kg_sec, 1),
    }


def run_child(sf_name: str, num_cpus: int, partitioned: bool = False) -> dict:
    """One fresh-process scaling arm: the flagship runs TWICE in the same
    Ray session and the arm reports the min (both walls kept in the JSON).
    Applied identically to both arms, so the ratio is unchanged in
    expectation; what the second rep removes is this host's per-process
    first-touch page-fault tax (2-30x swings — BASELINE.md "ambient
    spread"), which hit the low-CPU arm's longer wall hardest and produced
    the degraded-window repeats 7-8.

    ``partitioned=True`` times the streaming build with the range-bucketed
    disk-spilling final materialize (fresh checkpoint dir per rep) — the
    memory-boundary scale path measured for the bench800 corpus."""
    _init_ray(num_cpus)
    import shutil
    import tempfile

    from the_yelp_collaborative_knowledge_graph_ray.fixtures import generator
    from the_yelp_collaborative_knowledge_graph_ray.pipelines.kg import run_kg

    generator.ensure_fixtures(sf_name)
    walls, n = [], 0
    for _ in range(2):
        t0 = time.time()
        # actor pools sized to the cluster (1 CPU/actor, autoscaling pools)
        if partitioned:
            # streaming build + range-bucketed disk-spilling final (the
            # bench800 memory-boundary path); fresh ckpt dir per rep so
            # nothing resumes across reps
            ckdir = tempfile.mkdtemp(prefix="kgbench_ck_")
            try:
                n = run_kg(sf_name, concurrency=num_cpus,
                           final_ckpt_dir=ckdir).count()
            finally:
                shutil.rmtree(ckdir, ignore_errors=True)
        else:
            n = run_kg(sf_name, concurrency=num_cpus).count()
        walls.append(round(time.time() - t0, 3))
    dt = min(walls)
    return {"num_cpus": num_cpus, "triples": n, "sec": dt, "walls": walls,
            "partitioned": partitioned,
            "triples_per_sec": round(n / dt, 1)}


# dedup/curation operators timed at 200k docs (40x the sf0.1 documents
# table) — the testdata corpus times these as pure scheduling overhead;
# this is the scale where the shuffle/verify machinery actually works.
DOCS_QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_canonical_map",
    # dedup_fingerprint excluded: char-5-gram fingerprints need natural-text
    # gram rarity; in the synthetic word-salad corpus every gram is shared
    # by hundreds of docs, so the stop-key rule (correctly) drops them all
    "text_quality",
    "text_tfidf",
    "text_langid",
    "text_token_count",
    "text_repetition",
    "contamination_check",
    "sample_hash",
    "curation_cap_per_source",
]


def run_docs(num_cpus: int) -> dict:
    _init_ray(num_cpus)
    from the_yelp_collaborative_knowledge_graph_ray import queries as Q
    from the_yelp_collaborative_knowledge_graph_ray.fixtures import generator

    ddir = generator.ensure_docs_fixture("docsbench")
    qs = Q.queries()
    # min of 2 reps, same rationale as the default mode: the second rep
    # reuses worker processes/pages, so the recorded number is the code,
    # not per-process startup + this host's first-touch page-fault swings.
    reps = 2
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in DOCS_QUERIES:
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            rows[name] = _consume(qs[name](ddir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    return {
        "metric": "docs_dedup_suite_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "rows": rows,
        "n_docs": generator.DOCS_PROFILES["docsbench"],
        "num_cpus": num_cpus,
    }


def run_sessions_scaling(sf_name: str, n: int = 8, k: int = 4,
                         partitioned: bool = True) -> dict:
    """The round-4 node-scaling experiment (BASELINE.md): ONE solo n-CPU
    Ray session, then ``k`` CONCURRENT independent n-CPU sessions — each
    with its own raylet, plasma store and driver, i.e. the closest
    one-box analog of ``k`` shared-nothing cluster nodes (conservative:
    real nodes do not share memory bandwidth or disk). Efficiency =
    aggregate throughput of the k sessions / (k x solo throughput)."""
    from the_yelp_collaborative_knowledge_graph_ray.fixtures import generator
    generator.ensure_fixtures(sf_name)

    def cmd():
        c = [sys.executable, os.path.abspath(__file__), "--_child", sf_name,
             "--num-cpus", str(n)]
        if partitioned:
            c.append("--partitioned")
        return c

    # each "node" gets 1/k of the box's RAM for its object store — the
    # honest analog of k real nodes (a node's store does not grow because
    # other nodes exist), applied IDENTICALLY to the solo arm so the
    # ratio compares equal per-node configurations. Without this, k
    # sessions each sized at 60% of TOTAL RAM oversubscribe the box and
    # the memory-boundary corpora (bench3200) hit the OOM killer.
    env = dict(os.environ,
               RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION=str(
                   round(0.6 / k, 4)))
    solo = json.loads(subprocess.run(
        cmd(), capture_output=True, text=True, env=env,
        check=True).stdout.strip().splitlines()[-1])
    procs = [subprocess.Popen(cmd(), stdout=subprocess.PIPE, text=True,
                              env=env)
             for _ in range(k)]
    outs = []
    for p in procs:
        stdout, _ = p.communicate()
        if p.returncode != 0:
            raise RuntimeError("concurrent session failed")
        outs.append(json.loads(stdout.strip().splitlines()[-1]))
    agg = sum(o["triples_per_sec"] for o in outs)
    return {
        "metric": f"node_scaling_efficiency_1_to_{k}_sessions_{n}cpu",
        "value": round(agg / (k * solo["triples_per_sec"]), 3),
        "unit": "ratio",
        "sf": sf_name,
        "partitioned": partitioned,
        "solo_session": solo,
        "concurrent_sessions": outs,
        "aggregate_triples_per_sec": round(agg, 1),
    }


def run_scaling(sf_name: str, n: int = 8, partitioned: bool = False) -> dict:
    """Same input, fresh ray sessions at N and 4N CPUs (BASELINE.md)."""
    # generate fixtures once in the parent so children skip it
    from the_yelp_collaborative_knowledge_graph_ray.fixtures import generator
    generator.ensure_fixtures(sf_name)
    results = {}
    for cpus in (n, 4 * n):
        cmd = [sys.executable, os.path.abspath(__file__), "--_child", sf_name,
               "--num-cpus", str(cpus)]
        if partitioned:
            cmd.append("--partitioned")
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    t_lo = results[n]["triples_per_sec"]
    t_hi = results[4 * n]["triples_per_sec"]
    return {
        "metric": f"scaling_efficiency_{n}_to_{4 * n}_cpus",
        "value": round(t_hi / (4 * t_lo), 3),
        "unit": "ratio",
        "sf": sf_name,
        "partitioned": partitioned,
        f"run_{n}cpu": results[n],
        f"run_{4 * n}cpu": results[4 * n],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-sessions", action="store_true",
                    help="node-scaling experiment: 1 solo 8-CPU session vs "
                         "4 concurrent independent 8-CPU sessions (the "
                         "BASELINE.md node-scaling headline)")
    ap.add_argument("--sessions-sf", default="bench800",
                    help="fixture profile for --scaling-sessions. NOTE "
                         "bench3200 x4 concurrent sessions exceeds this "
                         "single box's DISK (4 x ~35 GB of spill+ranges+"
                         "object-spill transients vs ~45 GB free) — "
                         "measured, not conjectured; see BASELINE.md. The "
                         "round-5 configuration that satisfies the >=60s "
                         "steady-state clause within the box is bench800 "
                         "at 4-CPU nodes (--sessions-n 4): solo arm "
                         "~100 s.")
    ap.add_argument("--sessions-n", type=int, default=4,
                    help="CPUs per session-'node' in --scaling-sessions")
    ap.add_argument("--docs", action="store_true",
                    help="time the dedup/curation suite at 200k docs")
    ap.add_argument("--scaling-sf", default="bench3200",
                    help="fixture profile for the scaling run (round-4 "
                         "default: the ~227M-triple corpus that keeps the "
                         "4N arm >= 60 s steady-state; see BASELINE.md)")
    ap.add_argument("--scaling-n", type=int, default=4,
                    help="small cluster size N; the run compares N vs 4N")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--num-cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--_child", dest="child_sf", default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--partitioned", action="store_true",
                    help="time the flagship with the range-bucketed, "
                         "disk-spilling final materialize")
    args = ap.parse_args()

    import ray
    if args.child_sf:
        print(json.dumps(run_child(args.child_sf, args.num_cpus,
                                   args.partitioned)))
    elif args.docs:
        print(json.dumps(run_docs(args.num_cpus)))
    elif args.scaling_sessions:
        print(json.dumps(run_sessions_scaling(args.sessions_sf,
                                              n=args.sessions_n, k=4)))
    elif args.scaling:
        # the memory-boundary corpora always use the range-bucketed final
        # (the monolithic sort of a 50M+-triple encoded payload is exactly
        # the single-sort memory wall the partitioned path exists to avoid)
        part = args.partitioned or args.scaling_sf in ("bench800",
                                                       "bench3200",
                                                       "bench6400")
        print(json.dumps(run_scaling(args.scaling_sf, args.scaling_n,
                                     part)))
    else:
        print(json.dumps(run_default(args.sf_dir, args.num_cpus)))
    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
