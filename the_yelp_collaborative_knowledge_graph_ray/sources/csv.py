"""CSV ingest (SURVEY.md S3 compat — the reference's mapping tables are
CSV: ``category_mappings.py`` loads hand-curated CSV files).

Same contract as :mod:`.jsonl`: whatever the wire format, the Dataset that
leaves the source has EXACTLY the transcript schema from
``BASELINE.json input_hint``, so downstream stages are source-agnostic.
``ray.data.read_csv`` is Arrow's multithreaded CSV reader with one read
task per file; the schema fix is one vectorized batch pass that fuses with
the read (no per-line Python). ``ts`` accepts epoch microseconds or
ISO-8601 seconds, as in the JSON-lines source.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from .jsonl import _fix_schema


def read_transcripts_csv(paths: str | list[str]) -> ray.data.Dataset:
    """Read transcript CSV file(s) into the canonical transcript schema."""
    from pyarrow import csv as pacsv
    ds = ray.data.read_csv(
        paths,
        # ts stays inferred: epoch ints arrive as int64, ISO strings as
        # timestamp — both normalize in _fix_schema, the SAME code path the
        # JSON-lines source uses
        convert_options=pacsv.ConvertOptions(
            column_types={"conv_id": pa.string(), "role": pa.string(),
                          "text": pa.string(), "tool": pa.string(),
                          "turn_idx": pa.int32()}))
    return ds.map_batches(_fix_schema, batch_format="pyarrow",
                          zero_copy_batch=True)
