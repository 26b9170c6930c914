"""Driver-style comparison: Ray result vs DuckDB oracle.

Mimics the driver's check: row count + schema (column names) + an
order-insensitive value comparison with columns sorted by name.
"""

from __future__ import annotations

import duckdb
import pandas as pd


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data
    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.sql(sql).df()


def canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)  # None -> 'None' consistently
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(ray_res, sql: str, sf_dir: str) -> tuple[bool, str]:
    a = canon_frame(to_pandas(ray_res))
    b = canon_frame(run_oracle(sql, sf_dir))
    if list(a.columns) != list(b.columns):
        return False, f"schema mismatch: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count mismatch: {len(a)} vs {len(b)}"
    # numeric tolerance for float columns, exact elsewhere
    for c in a.columns:
        if str(a[c].dtype).startswith("float") or str(b[c].dtype).startswith("float"):
            import numpy as np
            if not np.allclose(a[c].astype(float), b[c].astype(float),
                               rtol=1e-9, atol=1e-9, equal_nan=True):
                return False, f"float column {c} differs"
        else:
            if not (a[c].astype(str).values == b[c].astype(str).values).all():
                bad = (a[c].astype(str).values != b[c].astype(str).values).nonzero()[0][:5]
                return False, (f"column {c} differs at rows {bad.tolist()}: "
                               f"{a[c].iloc[bad].tolist()} vs {b[c].iloc[bad].tolist()}")
    return True, "ok"
