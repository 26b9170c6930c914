"""`ray job submit` entrypoint for the flagship KG build (north_rule).

The north rule requires the pipeline to be "run via ray job submit on a
fixed-size multi-node Ray cluster" and to be "resumable from checkpoint with
per-partition lineage + metrics". This module is that job script:

    ray job submit --working-dir . -- \
        python -m the_yelp_collaborative_knowledge_graph_ray.job \
        --input /data/sf0.1 --checkpoint-dir /ckpt/run1 --output /out/kg

(locally: ``python -m the_yelp_collaborative_knowledge_graph_ray.job ...``
— same contract, one process). Semantics:

* the extraction phase is sharded per input transcript file and every shard
  commits atomically with its own lineage manifest
  (``state.checkpoint.CheckpointedRun.partitioned_stage``) — re-submitting
  the same command after a mid-run failure recomputes ONLY the unfinished
  shards, then the final global materialize;
* output is the sorted, exact-deduplicated triple set as Parquet (always,
  under ``<checkpoint-dir>/final_ranges/parts/part=*/data`` — one committed
  directory per sort range) plus, with ``--output``, rendered
  N-Triples text (``--gzip`` for ``.nt.gz`` parity with the reference's
  gzip sink, ``create_yelp_nt_files.py:31``);
* a ``metrics.json`` is written to the checkpoint dir: triple counts,
  per-partition rows + wall seconds (straight from the stage manifests),
  and end-to-end throughput — the per-partition metrics the rule names;
* the driver owns the Ray session only when none exists (``ray job submit``
  provides one; local runs auto-init), so library code stays init-free.

Exit code 0 only after the final manifest is complete, so external
schedulers can retry the submission idempotently.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import ray

from .pipelines import kg
from .stages import materialize
from .state.checkpoint import CheckpointedRun


def run_job(input_dir: str, checkpoint_dir: str, output: str | None = None,
            gzip: bool = False, concurrency: int = 4,
            include_enrichment: bool = True) -> dict:
    """Run (or resume) the flagship build; returns the metrics dict."""
    t0 = time.time()
    triples = kg.run_kg_partitioned(
        input_dir, checkpoint_dir, concurrency=concurrency,
        include_enrichment=include_enrichment)
    if output is not None:
        materialize.write_ntriples(triples, output,
                                   compression="gzip" if gzip else None)
    ck = CheckpointedRun(checkpoint_dir)
    extract_m = ck.manifest("extract_triples")
    final_m = ck.manifest("final_ranges")  # per-RANGE materialize commits
    wall = round(time.time() - t0, 3)
    metrics = {
        "input": input_dir,
        "checkpoint_dir": checkpoint_dir,
        "output": output,
        "triples": final_m["rows"],
        "pre_dedup_triples": extract_m["rows"],
        "wall_sec": wall,
        "triples_per_sec": round(final_m["rows"] / max(wall, 1e-9)),
        "partitions": extract_m["partitions"],
        "rebuilt_partitions": extract_m["rebuilt_partitions"],
        "stages": {"extract_triples": {k: extract_m[k]
                                       for k in ("rows", "granularity")},
                   "final_ranges": {"rows": final_m["rows"],
                                    "granularity": final_m["granularity"],
                                    "ranges": final_m["partitions"],
                                    "rebuilt_ranges":
                                        final_m["rebuilt_partitions"]}},
    }
    with open(os.path.join(checkpoint_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m the_yelp_collaborative_knowledge_graph_ray.job",
        description="Flagship KG build: transcripts parquet -> sorted "
                    "deduplicated N-Triples, per-partition checkpoint/resume")
    ap.add_argument("--input", required=True,
                    help="input dir holding the transcript parquet tables "
                         "(sf dir; fixtures are derived deterministically)")
    ap.add_argument("--checkpoint-dir", required=True,
                    help="checkpoint root; re-running with the same dir "
                         "resumes, skipping completed partitions")
    ap.add_argument("--output", default=None,
                    help="optional N-Triples text output dir")
    ap.add_argument("--gzip", action="store_true",
                    help="gzip the N-Triples output (.nt.gz part files)")
    ap.add_argument("--concurrency", type=int, default=4,
                    help="actor-pool size for stateful stages")
    ap.add_argument("--no-enrichment", action="store_true",
                    help="skip the link+enrichment stages")
    args = ap.parse_args(argv)
    if not ray.is_initialized():  # ray job submit / local both land here once
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)
    metrics = run_job(args.input, args.checkpoint_dir, output=args.output,
                      gzip=args.gzip, concurrency=args.concurrency,
                      include_enrichment=not args.no_enrichment)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
