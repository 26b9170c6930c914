"""Sort-merge-bucket (SMB) layout: pay ONE bucketed write, then every
subsequent equi-join on the bucket key is shuffle-free.

The pattern (Hive/Spark bucketed tables, re-expressed Ray-Data-first):

* :func:`write_bucketed` — hash-partition a Dataset on an int64 key into
  ``n_buckets`` hive directories (``bucket=K/``) with ONE
  ``write_parquet(partition_cols=...)`` pass. At 100 TB this is the
  "pick ONE partitioning key and reuse it across stages" investment:
  the bucketed copy is written once per key, not per join.
* :func:`bucketed_join` — join two co-bucketed tables with NO shuffle:
  one Ray task per bucket opens ONLY that bucket's files on both sides
  and joins them in-task with Arrow's (Acero) hash join. Each task's
  working set is ~1/n_buckets of each table, so ``n_buckets`` is the
  memory knob; tasks are embarrassingly parallel and a failed bucket
  retries alone (Ray task retry), which is the resumability story too.

Correctness rests on co-partitioning: both sides MUST be written with the
same ``n_buckets`` and key semantics (enforced via a tiny meta.json).
``queries._q_src_smb_join`` drives the pattern end-to-end against a DuckDB
join of the original tables.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def bucket_of(keys: pa.Array, n_buckets: int) -> pa.Array:
    """Bucket id per key — int64, ``key & (n-1)`` for power-of-two n
    (cheapest stable assignment), else a multiplicative hash mod n."""
    k = pc.cast(keys, pa.int64())
    if n_buckets & (n_buckets - 1) == 0:
        return pc.bit_wise_and(k, n_buckets - 1)
    h = (k.to_numpy(zero_copy_only=False).view(np.uint64)
         * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
    return pa.array((h % np.uint64(n_buckets)).astype(np.int64))


def write_bucketed(ds: ray.data.Dataset, key: str, path: str,
                   n_buckets: int = 8) -> str:
    """Write ``ds`` hive-bucketed by ``key`` under ``path``; returns path.

    Near-atomic overwrite: the layout is staged under a uuid-suffixed tmp
    dir (two writers never collide, even pid-sharing hosts on a shared
    FS), the PREVIOUS layout is renamed aside (never rmtree'd in place),
    and the new layout renamed in. A crash therefore leaves either the old
    complete layout (before the aside-rename), the recoverable aside copy
    (between the two renames — the one narrow window where ``path`` is
    briefly absent), or the new complete layout; never truncated parts and
    never NO recoverable layout. Concurrent readers mid-swap may observe
    the brief absent window — single-writer-at-a-time remains the layout's
    documented contract.
    """
    import shutil
    import uuid

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("bucket", bucket_of(b[key], n_buckets))

    run = uuid.uuid4().hex[:12]
    tmp = path + f".tmp-{run}"
    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        tmp, partition_cols=["bucket"])
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"key": key, "n_buckets": n_buckets}, f)
    old = path + f".old-{run}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return path


def append_bucketed(ds: ray.data.Dataset, key: str, path: str) -> str:
    """Append ``ds`` into an EXISTING bucketed layout at ``path`` without
    ever exposing a partial part file to readers: rows are staged as a
    complete hive layout under a tmp dir first, then each finished part
    file is ``os.rename``d (atomic on POSIX, same filesystem) into its
    live ``bucket=K/`` dir under a fresh unique name. A crash mid-stage
    leaves only the invisible tmp dir; a crash mid-rename leaves some
    COMPLETE part files appended — a retry then re-appends (duplicate
    rows, which every reader of these layouts tolerates by contract:
    dedup indexes key on content digests), never a truncated parquet."""
    import shutil
    import uuid

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta["key"] != key:
        raise ValueError(f"append_bucketed: layout at {path} is bucketed "
                         f"by {meta['key']!r}, not {key!r}")
    n_buckets = meta["n_buckets"]

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("bucket", bucket_of(b[key], n_buckets))

    tmp = path + f".append_tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        tmp, partition_cols=["bucket"])
    run = uuid.uuid4().hex
    for bdir in sorted(os.listdir(tmp)):
        src = os.path.join(tmp, bdir)
        if not (bdir.startswith("bucket=") and os.path.isdir(src)):
            continue
        dst = os.path.join(path, bdir)
        os.makedirs(dst, exist_ok=True)
        for i, fn in enumerate(sorted(os.listdir(src))):
            if fn.endswith(".parquet"):
                os.rename(os.path.join(src, fn),
                          os.path.join(dst, f"append-{run}-{i}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)
    return path


def bucketed_join(left_path: str, right_path: str, key: str,
                  left_cols: list[str], right_cols: list[str],
                  join_type: str = "inner",
                  combine=None,
                  empty: pa.Table | None = None) -> ray.data.Dataset:
    """Shuffle-free join of two co-bucketed table directories.

    ``combine`` (optional): a ``pa.Table -> pa.Table`` map applied to each
    bucket's join output INSIDE the task (map-side combine) — pass a
    group-aggregate here so only partials leave the task.
    ``empty`` pins the output schema for buckets absent on either side
    (a key range can legally hash no rows).
    """
    import pyarrow.parquet as pq
    metas = []
    for p in (left_path, right_path):
        with open(os.path.join(p, "meta.json")) as f:
            metas.append(json.load(f))
    if (metas[0]["key"] != key or metas[1]["key"] != key
            or metas[0]["n_buckets"] != metas[1]["n_buckets"]):
        raise ValueError(f"bucketed_join: incompatible layouts {metas}")
    n_buckets = metas[0]["n_buckets"]

    def join_one(b: pa.Table) -> pa.Table:
        outs = []
        for bk in b["b"].to_pylist():
            ld = os.path.join(left_path, f"bucket={bk}")
            rd = os.path.join(right_path, f"bucket={bk}")
            if not (os.path.isdir(ld) and os.path.isdir(rd)):
                continue
            lt = pq.read_table(ld, columns=left_cols)
            rt = pq.read_table(rd, columns=right_cols)
            j = lt.join(rt, keys=key, join_type=join_type)
            outs.append(combine(j) if combine is not None else j)
        if outs:
            return pa.concat_tables(outs)
        if empty is not None:
            return empty
        raise ValueError(
            "bucketed_join: bucket absent on one side and no `empty` "
            "schema table was provided")

    return ray.data.from_items(
        [{"b": i} for i in range(n_buckets)]) \
        .map_batches(join_one, batch_format="pyarrow", batch_size=1)
