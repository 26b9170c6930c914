"""JSON-lines ingest (SURVEY.md S1 compat).

The reference streams Yelp's JSON-lines dumps line-by-line
(``create_yelp_nt_files.py:56-64``, one ``json.loads`` per line). The Ray
Data equivalent is ``ray.data.read_json`` (Arrow's multithreaded JSON
reader, one read task per file) plus one vectorized schema-fix batch pass —
no per-line Python.

:func:`read_transcripts_jsonl` returns a Dataset with EXACTLY the parquet
transcript schema (``BASELINE.json input_hint``), so every downstream stage
is source-agnostic: pipelines compose against the schema, not the format.
``ts`` may arrive as epoch microseconds (int) or ISO-8601 seconds (string);
both are normalized to ``timestamp[us]``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def _fix_schema(b: pa.Table) -> pa.Table:
    ts = b["ts"]
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    if pa.types.is_integer(ts.type):
        ts = pc.cast(ts, pa.timestamp("us"))
    elif pa.types.is_string(ts.type):
        ts = pc.strptime(ts, format="%Y-%m-%dT%H:%M:%S", unit="us")
    elif pa.types.is_timestamp(ts.type):
        ts = pc.cast(ts, pa.timestamp("us"))
    return pa.table({
        "conv_id": pc.cast(b["conv_id"], pa.string()),
        "turn_idx": pc.cast(b["turn_idx"], pa.int32()),
        "role": pc.cast(b["role"], pa.string()),
        "text": pc.cast(b["text"], pa.string()),
        "tool": pc.cast(b["tool"], pa.string()),
        "ts": ts}, schema=TRANSCRIPT_SCHEMA)


def read_transcripts_jsonl(path: str) -> ray.data.Dataset:
    """Read newline-delimited-JSON transcripts into the canonical schema."""
    return ray.data.read_json(path).map_batches(
        _fix_schema, batch_format="pyarrow", zero_copy_batch=True)
