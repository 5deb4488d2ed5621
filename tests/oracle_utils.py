"""Local replica of the driver's Spark-vs-DuckDB comparison so oracle
mismatches surface in pytest before the driver's per-round check."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_run(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows — the
    order-insensitive shape the driver hashes."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _dtype_kind(s: pd.Series) -> str:
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    return "object"


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns differ: {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row counts differ: {len(a)} vs {len(b)}"
    # The driver hashes VALUES, so int64 123 vs float64 123.0 is a mismatch
    # even when == coerces — compare post-normalize dtype kinds too.
    for c in a.columns:
        ka = _dtype_kind(a[c])
        kb = _dtype_kind(b[c])
        assert ka == kb, (
            f"{name}: column {c} dtype kind differs: spark={a[c].dtype} ({ka}) "
            f"vs duckdb={b[c].dtype} ({kb}) — driver hash would mismatch"
        )
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            ok = (
                (av.isna() & bv.isna())
                | (av == bv)
                | (np.isclose(av.fillna(0), bv.fillna(0), rtol=0, atol=0))
            )
        else:
            ok = (av.isna() & bv.isna()) | (av == bv)
        if not ok.all():
            bad = (~ok).idxmax()
            raise AssertionError(
                f"{name}: column {c} differs at row {bad}: "
                f"spark={av[bad]!r} duckdb={bv[bad]!r} "
                f"({int((~ok).sum())}/{len(a)} rows differ)"
            )
