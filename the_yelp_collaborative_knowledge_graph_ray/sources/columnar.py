"""Arrow IPC (Feather V2) source/sink — zero-parse columnar interchange.

Ray Data ships parquet/csv/json readers but no Arrow-IPC source; the
format is first-class in lakehouse interchange (mmap-friendly, zstd
frames) and pyarrow decodes it natively. The pattern is the engine's
standard per-file read parallelism (pipelines/kg.py
``read_transcripts`` note): a Dataset of FILE PATHS fans out one read
task per file via ``map_batches`` — each task opens exactly its file
with the pyarrow reader and emits the whole table as one block, so a
directory of N part files reads with N-way parallelism and column
pruning, just like the parquet path. The writer is a per-block map task
emitting one part file per block (uuid names — append-safe, no
coordination), the same shape as every other sink in the engine.
(The ORC edge of the source surface lives in
``queries._q_src_orc_roundtrip`` — the inline "graft ANY format"
recipe with md5-idempotent block writes.)

``queries._q_src_ipc_roundtrip`` drives write→read→aggregate against a
DuckDB oracle over the ORIGINAL parquet, so any roundtrip corruption
fails the hash.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa

import ray.data


def _read_via_paths(paths: list[str], reader, columns=None
                    ) -> ray.data.Dataset:
    """One read task per file: paths Dataset -> map_batches fan-out."""
    ds = ray.data.from_items([{"path": p} for p in sorted(paths)])

    def read_one(b: pa.Table) -> pa.Table:
        tabs = [reader(p.as_py(), columns) for p in b["path"]]
        tabs = [t for t in tabs if t.num_rows]
        if not tabs:
            return reader(b["path"][0].as_py(), columns).schema \
                .empty_table()
        return pa.concat_tables(tabs)

    # batch_size=1: one file per task, the per-file parallelism contract
    return ds.map_batches(read_one, batch_format="pyarrow", batch_size=1)


# ---- Arrow IPC (Feather V2) --------------------------------------------

def write_ipc(ds: ray.data.Dataset, out_dir: str) -> str:
    """One .arrow part file per block (Arrow IPC file format — zero-parse
    interchange; mmap-friendly)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(b: pa.Table) -> pa.Table:
        from pyarrow import feather
        if b.num_rows:
            feather.write_feather(
                b, os.path.join(out_dir,
                                f"part-{uuid.uuid4().hex}.arrow"),
                compression="zstd")
        return pa.table({"rows": pa.array([b.num_rows], pa.int64())})

    ds.map_batches(write_block, batch_format="pyarrow",
                   zero_copy_batch=True).materialize()
    return out_dir


def read_ipc(path: str, columns: list[str] | None = None
             ) -> ray.data.Dataset:
    def reader(p: str, cols):
        from pyarrow import feather
        return feather.read_table(p, columns=cols)

    paths = ([os.path.join(path, f) for f in os.listdir(path)
              if f.endswith(".arrow")] if os.path.isdir(path) else [path])
    return _read_via_paths(paths, reader, columns)
