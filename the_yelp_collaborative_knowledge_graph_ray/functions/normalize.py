"""Surface-form normalization — the canonicalization key.

One shared normalizer replaces the reference's three inconsistent sanitizers
(``create_yelp_nt_files.py:93``, ``create_schema_wiki_mapping.py:64``,
``string_functions.py:17-41``): split camelCase (the reference's
``split_words`` regex ``string_functions.py:40-41``, re-expressed RE2-safe —
RE2 has no lookbehind — as a lower/digit->upper boundary split, so
``WebSearch`` and ``web search`` canonicalize together), then lowercase,
trim, collapse separator/punctuation runs to ``_``, strip leading/trailing
``_``.

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

from ..config import CAMEL_PATTERN, NORMALIZE_PATTERN

_PY_RE = re.compile(NORMALIZE_PATTERN)
_PY_CAMEL = re.compile(CAMEL_PATTERN)


def normalize_one(s: str) -> str:
    s = _PY_CAMEL.sub(r"\1 \2", s)  # camel split BEFORE lowercasing
    return _PY_RE.sub("_", s.strip().lower()).strip("_")


def normalize_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized normalizer: Arrow string array in, Arrow string array out."""
    out = pc.replace_substring_regex(arr, CAMEL_PATTERN, r"\1 \2")
    out = pc.utf8_lower(pc.utf8_trim_whitespace(out))
    out = pc.replace_substring_regex(out, NORMALIZE_PATTERN, "_")
    return pc.utf8_trim(out, "_")


def normalize_sql(expr: str) -> str:
    """DuckDB SQL expression computing the same normalization of ``expr``."""
    # '' -> escaped single quote inside SQL string literal
    pat = NORMALIZE_PATTERN.replace("'", "''")
    camel = CAMEL_PATTERN.replace("'", "''")
    inner = f"regexp_replace({expr}, '{camel}', '\\1 \\2', 'g')"
    return (f"trim(regexp_replace(lower(trim({inner})), '{pat}', '_', 'g'),"
            f" '_')")
