"""Local mini-version of the driver's DuckDB-oracle comparison:
row-count + schema(column names) + order-insensitive value comparison.
Catches mismatches before the driver's t2 gate does."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from zvdb_spark.sources.tables import TABLES


def portable_h(s: str) -> int:
    """Python twin of the shared portable hash — delegates to the
    package's single definition (queries/text.py h_py)."""
    from zvdb_spark.queries.text import h_py

    return h_py(s)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        # adversarial-fixture dirs (tmp_path parquet written by a
        # test) carry only the tables the query reads; DuckDB binds
        # views eagerly, so skip absent files instead of failing
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written fixture: a part-file dir
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: str(float(v)) if isinstance(v, (int, float)) else str(v)
            )
        elif pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_matches_oracle(spark_df, oracle: str, sf_dir: str, atol: float = 1e-6):
    got = _normalize(spark_df.toPandas())
    con = duckdb_con(sf_dir)
    try:
        want = _normalize(con.execute(oracle).df())
    finally:
        con.close()
    assert list(got.columns) == list(want.columns), (
        f"schema mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g, w)):
                both_nan = (
                    isinstance(a, float)
                    and isinstance(b, float)
                    and math.isnan(a)
                    and math.isnan(b)
                )
                if not both_nan:
                    assert a == b or abs(a - b) <= atol, (
                        f"col {c} row {i}: spark={a!r} oracle={b!r}"
                    )
        else:
            mism = (g.astype(str) != w.astype(str))
            assert not mism.any(), (
                f"col {c}: first mismatch row {mism.idxmax()}: "
                f"spark={g[mism.idxmax()]!r} oracle={w[mism.idxmax()]!r}"
            )
