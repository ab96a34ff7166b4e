"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered query's Spark plan and its DuckDB oracle SQL on the same
parquet tables, sorts columns by name and rows by value (the driver hashes
order-insensitively), and asserts equality.  Floats are compared exactly —
queries are expected to round on both sides — with a tiny np.isclose
fallback to flag near-misses distinctly from hard mismatches.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from bigdata_20251_steam_spark.schemas import TESTDATA_TABLES


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "?") -> None:
    got = _canon(spark_df.toPandas())
    exp = _canon(oracle_df)
    assert list(got.columns) == list(exp.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    def _is_null(v) -> bool:
        # scalar null in any of pandas' spellings: None, float nan, NaT
        if v is None:
            return True
        if isinstance(v, (list, tuple)):
            return False
        try:
            return bool(pd.isna(v))
        except (TypeError, ValueError):
            return False

    for col in got.columns:
        g, e = got[col], exp[col]
        for i, (gv, ev) in enumerate(zip(g, e)):
            if _is_null(gv):
                assert _is_null(ev), f"{name}.{col}[{i}]: {gv!r} vs {ev!r}"
            elif isinstance(gv, float) and isinstance(ev, float):
                assert gv == ev or math.isclose(gv, ev, rel_tol=1e-12, abs_tol=1e-12), (
                    f"{name}.{col}[{i}]: {gv!r} vs {ev!r}"
                )
            else:
                assert gv == ev, f"{name}.{col}[{i}]: {gv!r} vs {ev!r}"
