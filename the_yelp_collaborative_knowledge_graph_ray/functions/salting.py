"""Salted two-level aggregation for hot-key skew.

``BASELINE.json north_star`` requires explicit salting for hot-conversation
skew: a Zipf-ish corpus has conversations 10-100x the median length, and any
``groupby("conv_id")`` sends a hot conversation's entire row set to one
reduce task. The standard fix, expressed Ray-Data-native:

1. **salt**: map each row's key to ``(key, hash(row) % S)`` — hot keys fan
   out over ``S`` sub-partitions;
2. **level-1 aggregate**: grouped aggregate on the salted key (the heavy,
   skew-prone shuffle now balances);
3. **level-2 aggregate**: re-aggregate the ``<= S`` partials per key (tiny).

Only aggregations with a decomposition (count/sum/min/max, and anything
expressible as their combination) can ride this path — the helper takes the
Arrow aggregate spec for both levels explicitly.

Both levels run through ``functions.grouped.sorted_aggregate`` (per-block
Arrow kernels after a range sort). At the test scales the unsalted path is
fine; the fixture's planted hot conversations (FIXTURES.md §1) plus
``tests/test_training_ops.py`` keep the salted path exercised and exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .grouped import sorted_aggregate


def salted_aggregate(ds: ray.data.Dataset, key: str,
                     level1: list[tuple[str, str]],
                     level2: list[tuple[str, str]],
                     out_names: list[str],
                     num_salts: int = 16) -> ray.data.Dataset:
    """Two-level grouped aggregation with a salted first shuffle.

    ``level1``: Arrow (col, fn) aggregates computed per (key, salt).
    ``level2``: (col, fn) re-aggregates over the level-1 partial columns —
    name partials so that level2's inputs match level1's outputs.
    ``out_names``: final column names (key first, then level2 outputs).
    """
    def add_salt(b: pa.Table) -> pa.Table:
        # row-index salt: cheap, uniform, deterministic per block content
        salt = np.arange(b.num_rows, dtype=np.int64) % num_salts
        return b.append_column("__salt", pa.array(salt))

    salted = ds.map_batches(add_salt, batch_format="pyarrow",
                            zero_copy_batch=True)
    l1_names = [key, "__salt"] + [n for n in out_names[1:]]
    partials = sorted_aggregate(salted, [key, "__salt"], level1, l1_names)
    final = sorted_aggregate(partials, [key], level2, out_names)
    return final
