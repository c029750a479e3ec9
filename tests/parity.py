"""Oracle-parity checker mirroring the driver's compare.

The driver runs the Spark query and the DuckDB oracle SQL side by side and
compares row count, schema (column names sorted) and an order-insensitive
value hash.  This helper reproduces that check so every queries()/oracle_sql()
pair is pre-verified in pytest before the driver ever sees it.
"""

from __future__ import annotations

import math

import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # normalize dtypes: ints may come back int32/int64, floats float32/64
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def assert_parity(spark_df, ddb, oracle_sql: str, float_tol: float = 0.0,
                  name: str = "") -> None:
    got = _canon(spark_df.toPandas())
    exp = _canon(ddb.execute(oracle_sql).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: schema mismatch {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rowcount {len(got)} vs {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g):
            both_nan = g.isna() & e.isna()
            close = (g - e).abs() <= float_tol
            ok = both_nan | close.fillna(False)
            if not ok.all():
                bad = (~ok).idxmax()
                raise AssertionError(
                    f"{name}: column {c} differs at row {bad}: "
                    f"{g[bad]!r} vs {e[bad]!r} (tol={float_tol})"
                )
        else:
            same = (g == e) | (g.isna() & e.isna())
            if not same.all():
                bad = (~same).idxmax()
                raise AssertionError(
                    f"{name}: column {c} differs at row {bad}: "
                    f"{g[bad]!r} vs {e[bad]!r}"
                )


def assert_exact_parity(spark_df, ddb, oracle_sql: str, name: str = "") -> None:
    """Bit-exact compare (what the driver's value-hash effectively needs)."""
    assert_parity(spark_df, ddb, oracle_sql, float_tol=0.0, name=name)
