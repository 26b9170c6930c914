"""Small-file compaction for partitioned Parquet stage outputs.

A long-running streaming job (or a per-partition resumable one —
state/checkpoint.py) accumulates one Parquet file per block: at 100 TB
that is millions of small files, and small files destroy read
parallelism economics (per-file open cost, undersized row groups, remote
store request amplification). Compaction is the standard lakehouse
maintenance op (Iceberg/Delta "rewrite data files"): bin-pack small
files into ~target-sized ones WITHOUT a shuffle.

Plan-on-metadata, move-no-data-through-the-driver:
* the driver reads ONLY Parquet footers (row counts — no data I/O) and
  greedily packs consecutive files into groups of ≈``target_rows``
  (consecutive order preserves any on-disk sort/partition locality);
* one Ray task per output group streams its source files and writes ONE
  file — groups are independent, so compaction parallelism = output
  file count and a failed task reruns alone (idempotent: it rewrites
  its own tmp file);
* the output directory commits atomically (tmp dir + POSIX rename, the
  state/checkpoint.py convention) with a ``manifest.json`` mapping
  every output file to its source files — the lineage a resumable
  pipeline needs to garbage-collect inputs safely.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray


@ray.remote
def _write_group(srcs: list[str], dst: str) -> tuple[str, int]:
    tables = [pq.read_table(s) for s in srcs]
    t = pa.concat_tables(tables, promote_options="default")
    pq.write_table(t, dst)
    return dst, t.num_rows


def plan_groups(files: list[tuple[str, int]],
                target_rows: int) -> list[list[str]]:
    """Greedy consecutive bin-packing: close a group once it reaches
    ``target_rows``; an oversized single file stays its own group."""
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_rows = 0
    for path, rows in files:
        if cur and cur_rows + rows > target_rows:
            groups.append(cur)
            cur, cur_rows = [], 0
        cur.append(path)
        cur_rows += rows
        if cur_rows >= target_rows:
            groups.append(cur)
            cur, cur_rows = [], 0
    if cur:
        groups.append(cur)
    return groups


def compact_parquet_dir(src_dir: str, dst_dir: str,
                        target_rows: int = 1_000_000) -> dict:
    """Compact ``src_dir/*.parquet`` into ``dst_dir`` (atomic). Returns
    the manifest dict."""
    files = sorted(
        os.path.join(src_dir, f) for f in os.listdir(src_dir)
        if f.endswith(".parquet"))
    sized = [(f, pq.ParquetFile(f).metadata.num_rows) for f in files]
    groups = plan_groups(sized, target_rows)

    tmp = dst_dir + f".tmp{os.getpid()}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    t0 = time.time()
    futs = []
    outputs = []
    for i, g in enumerate(groups):
        out = os.path.join(tmp, f"part-{i:05d}.parquet")
        outputs.append({"file": os.path.basename(out), "sources":
                        [os.path.basename(s) for s in g]})
        futs.append(_write_group.remote(g, out))
    written = ray.get(futs)
    for meta, (_, rows) in zip(outputs, written):
        meta["rows"] = rows

    manifest = {
        "complete": True,
        "n_input_files": len(files),
        "n_output_files": len(groups),
        "rows": sum(r for _, r in written),
        "target_rows": target_rows,
        "outputs": outputs,
        "wall_s": round(time.time() - t0, 3),
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    if os.path.exists(dst_dir):
        shutil.rmtree(dst_dir)
    os.rename(tmp, dst_dir)
    return manifest
