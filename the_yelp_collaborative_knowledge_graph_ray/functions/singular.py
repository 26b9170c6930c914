"""Rule-based English singularizer (SURVEY.md ST2).

The reference singularizes category nouns with the ``inflect`` engine held
in process state (``string_functions.py:17-38``, ``p.singular_noun``). That
library isn't in this container and its full irregular tables are overkill
for surface-form canonicalization; this is the standard suffix-rule core
(ies->y, ves->f/fe, sses/xes/ches/shes -> drop es, s -> drop s) plus an
irregular map, in the engine's usual two equivalent forms:

* :func:`singular_one` — plain Python (driver-side table prep);
* :func:`singular_array` — vectorized Arrow (RE2 kernels, hot path).

Used by ``fixtures/generator`` alias-edge construction semantics and
available to canonicalization as a rule path where no alias table exists.
Like the reference (``category_mappings.py:25-28``), curated alias tables
ALWAYS win over rules — rules only fill gaps.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

IRREGULAR = {
    "children": "child", "feet": "foot", "geese": "goose", "men": "man",
    "mice": "mouse", "people": "person", "teeth": "tooth", "women": "woman",
}

# (RE2 pattern, replacement) applied first-match-wins, all lowercase input
_RULES = [
    (r"ies$", "y"),          # bakeries -> bakery
    (r"([^aeiou])ves$", r"\1f"),  # wolves -> wolf
    (r"zzes$", "z"),         # quizzes -> quiz
    (r"(ss|x|ch|sh|z)es$", r"\1"),  # boxes, churches, classes
    (r"([^s])s$", r"\1"),    # plain plural; leaves 'ss' and bare 's' alone
]


def singular_one(w: str) -> str:
    import re
    if w in IRREGULAR:
        return IRREGULAR[w]
    for pat, rep in _RULES:
        new = re.sub(pat, rep, w)
        if new != w:
            return new
    return w


def singular_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized singularizer: first-match-wins over the same rules.

    Each rule applies only where no earlier rule fired (tracked with a
    ``done`` mask) so the semantics equal :func:`singular_one` exactly
    (asserted in tests)."""
    out = arr
    # irregulars: one index_in + take
    irr_from = pa.array(list(IRREGULAR), pa.string())
    irr_to = pa.array([IRREGULAR[k] for k in IRREGULAR], pa.string())
    idx = pc.index_in(out, value_set=irr_from)
    hit = pc.is_valid(idx)
    out = pc.if_else(hit, irr_to.take(pc.fill_null(idx, 0)), out)
    done = hit
    for pat, rep in _RULES:
        applied = pc.replace_substring_regex(out, pat, rep)
        changed = pc.and_(pc.invert(done), pc.not_equal(applied, out))
        out = pc.if_else(changed, applied, out)
        done = pc.or_(done, changed)
    return out
