"""Regression tests for the two round-1 driver hash failures.

Both cases compare EQUAL under naive ``==`` but hash differently in the
driver; tests/parity.py must reject them pre-flight.

  * ``hag``: DuckDB ``ROUND(z - idw, 6)`` emitted ``-0.0`` where Spark
    emitted ``+0.0`` (468 rows at sf0.01).
  * ``sessionize``: DuckDB windowed SUM -> HUGEINT -> pandas float64
    (``56.0``) vs Spark bigint (``56``).
"""

import pandas as pd
import pytest

from tests.parity import assert_frames_parity


def test_negative_zero_rejected():
    got = pd.DataFrame({"hag": [0.0, 1.5]})
    exp = pd.DataFrame({"hag": [-0.0, 1.5]})
    with pytest.raises(AssertionError, match="sign-of-zero"):
        assert_frames_parity(got, exp, name="hag_regression")


def test_negative_zero_ok_with_tolerance():
    # tolerance mode is for analytical (non-driver) checks; signbit only
    # enforced for the bit-exact (tol=0) path
    got = pd.DataFrame({"v": [0.0]})
    exp = pd.DataFrame({"v": [-0.0]})
    assert_frames_parity(got, exp, float_tol=1e-9, name="tol_mode")


def test_int_vs_float_dtype_rejected():
    got = pd.DataFrame({"n_sessions": pd.array([56, 3], dtype="int64")})
    exp = pd.DataFrame({"n_sessions": pd.array([56.0, 3.0], dtype="float64")})
    with pytest.raises(AssertionError, match="dtype kind"):
        assert_frames_parity(got, exp, name="sessionize_regression")


def test_equal_frames_pass():
    df = pd.DataFrame({"a": [1, 2], "b": [0.5, -0.25]})
    assert_frames_parity(df.copy(), df.copy(), name="identical")


def test_int_width_normalized():
    got = pd.DataFrame({"a": pd.array([1, 2], dtype="int32")})
    exp = pd.DataFrame({"a": pd.array([1, 2], dtype="int64")})
    assert_frames_parity(got, exp, name="width")
