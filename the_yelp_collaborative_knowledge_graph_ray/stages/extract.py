"""Stage 1 — rule-based triple extraction (structural triples).

Ray-Data-native analog of the reference's per-record emission loop
(``Code/create_yelp_nt_files.py:58-181``): one input turn expands to ~7-9
triples. The reference walks a Python dict per record; here one zero-copy
Arrow batch expands to a triples sub-table per *triple kind* — each kind is a
handful of vectorized pyarrow kernels over whole columns — concatenated at
the end. No per-row Python in the hot path.

Key semantics reproduced:

* key -> (predicate, XSD datatype) mapping (``schema_functions.py:12-76``)
  becomes a fixed kind list below;
* FK rewriting (review -> business, ``create_yelp_nt_files.py:76-81``)
  becomes turn -> conversation / turn -> tool IRI edges;
* none-value filtering with a dead-letter side channel
  (``create_yelp_nt_files.py:112-114,189-195``);
* date ISO-ification ``" " -> "T"`` (``create_yelp_nt_files.py:146,170``)
  via ``pc.strftime``;
* the per-turn ``schema:text`` literal carries the raw text unchanged —
  the per-turn text-equality invariant of ``BASELINE.json input_hint``.

Scale notes (100 TB): stateless ``map_batches`` fan-out, ~9x row expansion —
keep ``batch_size`` modest (8-16k turns) so output blocks stay near the
target block size; lineage columns ride along for checkpoint manifests and
are dropped at materialization.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .. import config as C
from ..functions import iri
from ..functions.normalize import normalize_array

TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("obj_is_literal", pa.bool_()),
    ("obj_datatype", pa.string()),
    ("src_conv_id", pa.string()),
    ("src_turn_idx", pa.int32()),
])


def _kind(subj, pred: str, obj, literal: bool, dtype: str | None,
          conv, tidx) -> pa.Table:
    n = len(subj)
    return pa.table({
        "subj": subj,
        "pred": pa.nulls(n, pa.string()).fill_null(pred),
        "obj": obj,
        "obj_is_literal": pa.nulls(n, pa.bool_()).fill_null(literal),
        "obj_datatype": (pa.nulls(n, pa.string()) if dtype is None
                         else pa.nulls(n, pa.string()).fill_null(dtype)),
        "src_conv_id": conv,
        "src_turn_idx": tidx,
    }, schema=TRIPLE_SCHEMA)


def _tool_mask(tool: pa.ChunkedArray | pa.Array) -> pa.Array:
    """True where the tool value is real (reference none-filter, M12)."""
    return pc.and_not(pc.is_valid(tool),
                      pc.is_in(tool, value_set=pa.array(C.NONE_VALUES)))


def extract_structural(batch: pa.Table) -> pa.Table:
    """One Arrow batch of turns -> one Arrow batch of structural triples."""
    conv, tidx = batch["conv_id"], batch["turn_idx"]
    turn = iri.turn_iri(conv, tidx)
    conv_iri = iri.conversation_iri(conv)
    n = batch.num_rows
    const = lambda s: pa.nulls(n, pa.string()).fill_null(s)  # noqa: E731
    parts = [
        _kind(turn, C.RDF_TYPE, const(C.CLASS_TURN), False, None, conv, tidx),
        _kind(turn, C.PRED_IS_PART_OF, conv_iri, False, None, conv, tidx),
        _kind(conv_iri, C.RDF_TYPE, const(C.CLASS_CONVERSATION), False, None, conv, tidx),
        _kind(turn, C.PRED_POSITION, pc.cast(tidx, pa.string()), True,
              C.XSD_INTEGER, conv, tidx),
        _kind(turn, C.PRED_ROLE, batch["role"], True, C.XSD_STRING, conv, tidx),
        # cast to second precision first: pyarrow %S would emit fractional
        # seconds, the reference format (M9) has none
        _kind(turn, C.PRED_DATE_CREATED,
              pc.strftime(pc.cast(batch["ts"], pa.timestamp("s"), safe=False),
                          format="%Y-%m-%dT%H:%M:%S"), True,
              C.XSD_DATETIME, conv, tidx),
        _kind(turn, C.PRED_TEXT, batch["text"], True, C.XSD_STRING, conv, tidx),
    ]
    # tool edges only where tool passes the none-filter
    mask = _tool_mask(batch["tool"])
    sel = batch.filter(mask)
    if sel.num_rows:
        t_iri = iri.tool_iri(normalize_array(sel["tool"]))
        turn_sel = iri.turn_iri(sel["conv_id"], sel["turn_idx"])
        m = sel.num_rows
        constm = lambda s: pa.nulls(m, pa.string()).fill_null(s)  # noqa: E731
        parts.append(_kind(turn_sel, C.PRED_USES_TOOL, t_iri, False, None,
                           sel["conv_id"], sel["turn_idx"]))
        parts.append(_kind(t_iri, C.RDF_TYPE, constm(C.CLASS_TOOL), False, None,
                           sel["conv_id"], sel["turn_idx"]))
    return pa.concat_tables(parts).combine_chunks()


def extract_dead_letter(batch: pa.Table) -> pa.Table:
    """Dead-letter channel: rows whose tool value was filtered (S5 analog).

    The reference appends these to ``none_triples`` text files
    (``create_yelp_nt_files.py:36,112-114,189-191``); we emit a first-class
    Dataset with lineage so a 100 TB run can audit skips per partition.
    """
    bad = batch.filter(pc.invert(_tool_mask(batch["tool"])))
    n = bad.num_rows
    const = lambda s: pa.nulls(n, pa.string()).fill_null(s)  # noqa: E731
    return pa.table({
        "src_conv_id": bad["conv_id"],
        "src_turn_idx": bad["turn_idx"],
        "key": const("tool"),
        "value": bad["tool"],
        "reason": const("none_value"),
    })


def structural_triples(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    return transcripts.map_batches(extract_structural, batch_format="pyarrow",
                                   batch_size=8192, zero_copy_batch=True)


def dead_letter(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    return transcripts.map_batches(extract_dead_letter, batch_format="pyarrow",
                                   batch_size=8192, zero_copy_batch=True)
