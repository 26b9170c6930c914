"""Nested-struct flattener (SURVEY.md M5).

The reference flattens nested business-attribute dicts into dotted keys with
an exclusion list for subtrees that must stay opaque
(``Code/UtilityFunctions/dictionary_functions.py:1-18`` — ``flatten_dict``
with the ``hours`` exclusion). Here the same operator over Arrow struct
columns: a stateless ``map_batches`` visits every struct field recursively
(``pc.struct_field`` — a zero-copy child projection, no Python per row),
emitting one flat column per leaf as ``parent.child`` and skipping excluded
subtrees. Non-struct columns pass through untouched.

Scale shape: pure column metadata work per batch — the child arrays are the
SAME buffers the struct column already holds, so flattening a 100 TB table
costs no data movement at all (and downstream ``columns=`` pruning then
applies per leaf).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def flatten_table(b: pa.Table, exclude: frozenset[str] = frozenset(),
                  sep: str = ".") -> pa.Table:
    """Flatten all struct columns of one Arrow table (recursive).

    ``exclude`` entries match either a full dotted path (``meta.hours``) or
    a bare field name (``hours``) — mirroring the reference's key-based
    exclusion list.
    """
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}

    def visit(path: str, leaf_name: str, arr) -> None:
        if leaf_name in exclude or path in exclude:
            return
        typ = arr.type if not isinstance(arr, pa.ChunkedArray) else arr.type
        if pa.types.is_struct(typ):
            for f in typ:
                visit(f"{path}{sep}{f.name}", f.name,
                      pc.struct_field(arr, f.name))
        else:
            cols[path] = arr

    for name in b.column_names:
        visit(name, name, b[name])
    return pa.table(cols)


def flatten_structs(ds: ray.data.Dataset,
                    exclude: tuple[str, ...] = (),
                    sep: str = ".") -> ray.data.Dataset:
    ex = frozenset(exclude)
    return ds.map_batches(lambda b: flatten_table(b, ex, sep),
                          batch_format="pyarrow", zero_copy_batch=True)
