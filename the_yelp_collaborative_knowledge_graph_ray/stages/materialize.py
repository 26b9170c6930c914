"""Stage 6 — graph materialization: global dedup + sort + Parquet sink.

The reference appends N-Triples text to gzip files in input order with no
global dedup (``create_yelp_nt_files.py:31,180-181``); per ``BASELINE.json
north_star`` our output is the *sorted, deduplicated* (subj, pred, obj)
triples table (set semantics — order-insensitive comparison makes the added
sort semantics-preserving, SURVEY.md §2.6).

Shuffle plan (the expensive part at 100 TB):
1. per-batch local dedup (cheap Arrow group_by) — collapses the heavy
   duplicate classes (one conversation-type triple per *turn*, one tool-type
   triple per *call*) before anything moves;
2. global exact dedup via hash-shuffle ``groupby([subj, pred, obj])`` with
   Min-aggregates over the dependent columns;
3. global range-partitioned ``sort([subj, pred, obj])``.

An optional N-Triples text renderer reproduces the reference's output format
byte-for-byte-comparable (typed literals, ``create_yelp_nt_files.py:168-175``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Min

from .. import config as C


def local_dedup(batch: pa.Table) -> pa.Table:
    cols = [c for c in C.TRIPLE_COLUMNS if c in batch.schema.names]
    return batch.select(cols).group_by(
        ["subj", "pred", "obj"], use_threads=False).aggregate(
        [("obj_is_literal", "min"), ("obj_datatype", "min")]).rename_columns(
        ["subj", "pred", "obj", "obj_is_literal", "obj_datatype"])


def materialize(triples: ray.data.Dataset, sort: bool = True) -> ray.data.Dataset:
    """Exact global dedup + global sort of a triples Dataset."""
    ds = triples.map_batches(local_dedup, batch_format="pyarrow",
                             zero_copy_batch=True)
    ds = ds.groupby(["subj", "pred", "obj"]).aggregate(
        Min("obj_is_literal", alias_name="obj_is_literal"),
        Min("obj_datatype", alias_name="obj_datatype", ignore_nulls=False))

    # all-null blocks can come back as pa.null() after the shuffle; pin the
    # declared schema so unions/writes downstream see one stable schema
    out_schema = pa.schema([
        ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
        ("obj_is_literal", pa.bool_()), ("obj_datatype", pa.string())])

    def enforce(batch: pa.Table) -> pa.Table:
        return pa.table(
            {f.name: pc.cast(batch[f.name], f.type) for f in out_schema},
            schema=out_schema)

    ds = ds.map_batches(enforce, batch_format="pyarrow", zero_copy_batch=True)
    if sort:
        ds = ds.sort(["subj", "pred", "obj"])
    return ds


def render_ntriples(batch: pa.Table) -> pa.Table:
    """Triples -> one N-Triples line per row (text renderer, S4 analog)."""
    subj = pc.binary_join_element_wise("<", batch["subj"], "> ", "")
    pred = pc.binary_join_element_wise("<", batch["pred"], "> ", "")
    # literal objects: escape backslash + quote + newline, add datatype tag
    esc = pc.replace_substring(batch["obj"], "\\", "\\\\")
    esc = pc.replace_substring(esc, '"', '\\"')
    esc = pc.replace_substring(esc, "\n", "\\n")
    lit = pc.binary_join_element_wise(
        '"', esc, '"^^<', pc.fill_null(batch["obj_datatype"], C.XSD_STRING),
        "> .", "")
    iri_obj = pc.binary_join_element_wise("<", batch["obj"], "> .", "")
    obj = pc.if_else(batch["obj_is_literal"], lit, iri_obj)
    line = pc.binary_join_element_wise(subj, pred, obj, "")
    return pa.table({"text": line})


def write_ntriples(triples: ray.data.Dataset, out_dir: str) -> None:
    triples.map_batches(render_ntriples, batch_format="pyarrow",
                        zero_copy_batch=True).write_csv(
        out_dir, arrow_csv_args_fn=lambda: {
            "write_options": __import__("pyarrow.csv", fromlist=["WriteOptions"])
            .WriteOptions(include_header=False, quoting_style="none")})
