"""Oracle-parity checker mirroring the driver's compare.

The driver runs the Spark query and the DuckDB oracle SQL side by side and
compares row count, schema (column names sorted) and an order-insensitive
value hash.  This helper reproduces that check so every queries()/oracle_sql()
pair is pre-verified in pytest before the driver ever sees it.

Hash semantics matter beyond ``==``: the driver hashes *representations*, so
two classes that compare equal in pandas still mismatch there and MUST fail
here too:

  * float ``-0.0`` vs ``+0.0`` (seen in round-1 ``hag``: DuckDB ROUND emitted
    468x ``-0.0``) — caught via ``np.signbit``;
  * integer vs float dtype for equal values (round-1 ``sessionize``: DuckDB
    windowed SUM -> HUGEINT -> pandas float64 ``56.0`` vs Spark bigint
    ``56``) — caught by comparing dtype *kinds* before any normalization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _kind(dtype) -> str:
    """Collapse a dtype to the driver-visible representation class."""
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    return "object"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # normalize widths only (int32->int64, float32->float64); int vs float
    # is NOT normalized away — _kind() is compared before this is used.
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


def assert_frames_parity(
    got: pd.DataFrame,
    exp: pd.DataFrame,
    float_tol: float = 0.0,
    name: str = "",
) -> None:
    """Driver-equivalent compare of two pandas frames (got=Spark,
    exp=oracle)."""
    for c in sorted(set(got.columns) & set(exp.columns)):
        gk, ek = _kind(got[c].dtype), _kind(exp[c].dtype)
        assert gk == ek, (
            f"{name}: column {c} dtype kind mismatch: spark={gk} "
            f"({got[c].dtype}) vs oracle={ek} ({exp[c].dtype}) — equal "
            "values with different representations still fail the driver "
            "hash"
        )
    got = _canon(got)
    exp = _canon(exp)
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
            if float_tol == 0.0:
                # bit-exactness: -0.0 vs +0.0 hash differently downstream
                gz = np.signbit(g.to_numpy(dtype="float64", na_value=0.0))
                ez = np.signbit(e.to_numpy(dtype="float64", na_value=0.0))
                sb = gz != ez
                if sb.any():
                    bad = int(np.argmax(sb))
                    raise AssertionError(
                        f"{name}: column {c} sign-of-zero differs at row "
                        f"{bad}: {g[bad]!r} vs {e[bad]!r} (driver hashes "
                        "-0.0 and +0.0 differently)"
                    )
        else:
            same = (g == e) | (g.isna() & e.isna())
            if not same.all():
                bad = (~same).idxmax()
                raise AssertionError(
                    f"{name}: column {c} differs at row {bad}: "
                    f"{g[bad]!r} vs {e[bad]!r}"
                )


def assert_parity(spark_df, ddb, oracle_sql: str, float_tol: float = 0.0,
                  name: str = "") -> None:
    assert_frames_parity(
        spark_df.toPandas(),
        ddb.execute(oracle_sql).df(),
        float_tol=float_tol,
        name=name,
    )


def assert_exact_parity(spark_df, ddb, oracle_sql: str, name: str = "") -> None:
    """Bit-exact compare (what the driver's value-hash effectively needs)."""
    assert_parity(spark_df, ddb, oracle_sql, float_tol=0.0, name=name)
