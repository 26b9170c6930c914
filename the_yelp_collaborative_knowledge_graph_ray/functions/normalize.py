"""Surface-form normalization — the canonicalization key.

One shared normalizer replaces the reference's three inconsistent sanitizers
(``create_yelp_nt_files.py:93``, ``create_schema_wiki_mapping.py:64``,
``string_functions.py:17-41``): lowercase, trim, collapse separator/punctuation
runs to ``_``, strip leading/trailing ``_``.

Two implementations, guaranteed equivalent (tested in
``tests/test_normalize.py``):

* :func:`normalize_array` — vectorized pyarrow kernel for hot paths
  (RE2 via ``pc.replace_substring_regex``);
* :func:`normalize_one` — plain-Python for driver-side table prep;
* :func:`normalize_sql` — the DuckDB SQL expression the oracle uses
  (DuckDB ``regexp_replace`` is also RE2, so the same pattern applies).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..config import NORMALIZE_PATTERN

_PY_RE = re.compile(NORMALIZE_PATTERN)


def normalize_one(s: str) -> str:
    return _PY_RE.sub("_", s.strip().lower()).strip("_")


def normalize_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized normalizer: Arrow string array in, Arrow string array out."""
    out = pc.utf8_lower(pc.utf8_trim_whitespace(arr))
    out = pc.replace_substring_regex(out, NORMALIZE_PATTERN, "_")
    return pc.utf8_trim(out, "_")


def normalize_sql(expr: str) -> str:
    """DuckDB SQL expression computing the same normalization of ``expr``."""
    # '' -> escaped single quote inside SQL string literal
    pat = NORMALIZE_PATTERN.replace("'", "''")
    return f"trim(regexp_replace(lower(trim({expr})), '{pat}', '_', 'g'), '_')"
