"""Local mirror of the driver's correctness gate: run a queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet
tables, and compare row count, column set, and values."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

TABLES = (
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
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, sql: str, sf_dir: str, *, atol: float = 1e-9) -> None:
    """Raise AssertionError on any mismatch (driver-style check, but
    with tolerant float compare so we see the size of any drift)."""
    got = _normalize(spark_df.toPandas())
    want = _normalize(duckdb_con(sf_dir).execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count differs: spark={len(got)} oracle={len(want)}"
    for col in got.columns:
        g, w = got[col].to_numpy(), want[col].to_numpy()
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
            g = g.astype(float)
            w = w.astype(float)
            both_nan = np.isnan(g) & np.isnan(w)
            close = np.isclose(g, w, atol=atol, rtol=0) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                raise AssertionError(
                    f"column {col!r} differs at row {i}: spark={g[i]!r} oracle={w[i]!r}"
                    f" ({int((~close).sum())} rows differ)"
                )
        else:
            if not (g == w).all():
                bad = np.argmin(g == w)
                raise AssertionError(
                    f"column {col!r} differs at row {bad}: spark={g[bad]!r} oracle={w[bad]!r}"
                )
