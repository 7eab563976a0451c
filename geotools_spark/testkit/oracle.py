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


def compare(spark_df, sql: str, sf_dir: str, *, atol: float = 0.0) -> None:
    """Raise AssertionError on any mismatch.

    Mirrors the driver's value-hash gate, which is REPRESENTATION-exact:
    an int64 column vs a DuckDB HUGEINT (arriving as float64) mismatches
    even when numerically equal, and -0.0 vs +0.0 mismatches.  So by
    default we require (a) matching dtype kind (int vs float vs object)
    and (b) bit-exact float equality including the sign of zero.  Pass a
    non-zero ``atol`` only for queries that are deliberately tolerant
    (none of the driver-gated ones may be).
    """
    got = _normalize(spark_df.toPandas())
    want = _normalize(duckdb_con(sf_dir).execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count differs: spark={len(got)} oracle={len(want)}"
    for col in got.columns:
        g, w = got[col].to_numpy(), want[col].to_numpy()
        g_float = np.issubdtype(g.dtype, np.floating)
        w_float = np.issubdtype(w.dtype, np.floating)
        g_int = np.issubdtype(g.dtype, np.integer)
        w_int = np.issubdtype(w.dtype, np.integer)
        if g_float != w_float or g_int != w_int:
            raise AssertionError(
                f"column {col!r} dtype kind differs (driver hash would mismatch):"
                f" spark={g.dtype} oracle={w.dtype}"
            )
        if g_float:
            g = g.astype(np.float64)
            w = w.astype(np.float64)
            both_nan = np.isnan(g) & np.isnan(w)
            if atol > 0.0:
                close = np.isclose(g, w, atol=atol, rtol=0) | both_nan
            else:
                # bit-exact: value equality AND same sign of zero
                close = ((g == w) & (np.signbit(g) == np.signbit(w))) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                raise AssertionError(
                    f"column {col!r} differs at row {i}: spark={g[i]!r} oracle={w[i]!r}"
                    f" ({int((~close).sum())} rows differ)"
                )
        else:
            eq = g == w
            if not eq.all():
                bad = int(np.argmin(eq))
                raise AssertionError(
                    f"column {col!r} differs at row {bad}: spark={g[bad]!r} oracle={w[bad]!r}"
                )
