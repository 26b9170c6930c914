"""IRI minting — vectorized analog of the reference's ``get_iri``
(``Code/UtilityFunctions/get_iri.py:5-18``): namespace + type path + raw id.

Blank nodes in the reference are process-random (``create_yelp_nt_files.py:122,
227,270``); here every second-class entity gets a deterministic skolem IRI
derived from ``(conv_id, turn_idx, kind)`` so triple sets are comparable
across runs (SURVEY.md §7 "what's hard").
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import ENT


def _concat(*parts) -> pa.Array:
    """Element-wise string concat; str parts are broadcast as scalars."""
    return pc.binary_join_element_wise(*parts, "")


def turn_iri(conv_id, turn_idx) -> pa.Array:
    """ENT + 'turn/{conv_id}/{turn_idx}'."""
    idx_str = pc.cast(turn_idx, pa.string())
    return _concat(ENT + "turn/", conv_id, "/", idx_str)


def conversation_iri(conv_id) -> pa.Array:
    return _concat(ENT + "conversation/", conv_id)


def tool_iri(tool_norm) -> pa.Array:
    return _concat(ENT + "tool/", tool_norm)


def mention_iri(canonical_form) -> pa.Array:
    return _concat(ENT + "mention/", canonical_form)


def mention_iri_one(canonical_form: str) -> str:
    return ENT + "mention/" + canonical_form
