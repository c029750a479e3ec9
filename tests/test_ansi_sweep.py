"""ANSI-robustness gate (opt-in: set SPARK_GRAFT_ANSI_SWEEP=1).

The repo session runs with ``spark.sql.ansi.enabled=false`` (Spark's
historical arithmetic), but the DRIVER's verification session runs
ANSI-ON — so a query that silently wraps an int64 under the repo session
throws ``ARITHMETIC_OVERFLOW`` under the driver and ships a red
correctness row that pytest can never see.  Round 3 shipped exactly that
bug: ``plans/lineage.py`` fingerprinted batches with
``F.sum(F.xxhash64(...))``, which wraps with near-certainty past a few
thousand rows (fixed to ``bit_xor`` in round 4; VERDICT r3 #1/#2).

This sweep replays the entire driver window under ANSI-ON semantics with
full oracle parity, so no window query can depend on the session's
overflow/cast behavior.  ``spark.sql.ansi.enabled`` is a runtime SQL
conf, so the shared session is flipped per-test and always restored.

Run: SPARK_GRAFT_ANSI_SWEEP=1 python -m pytest tests/test_ansi_sweep.py -q
(~4 min at the oracle SF; also runs inside the full suite when the env
var is exported).
"""

from __future__ import annotations

import os

import pytest

ENABLED = os.environ.get("SPARK_GRAFT_ANSI_SWEEP")

pytestmark = pytest.mark.skipif(
    not ENABLED,
    reason="ANSI sweep is opt-in: set SPARK_GRAFT_ANSI_SWEEP=1",
)


def _window_pairs():
    if not ENABLED:
        return []
    from rgr_pdal_topo_spark.queries import DRIVER_WINDOW, ORACLES, QUERIES

    # no-oracle window entries (if any) still run — crash coverage is the
    # point; parity is checked where an oracle exists
    return [(n, QUERIES[n], ORACLES.get(n)) for n in DRIVER_WINDOW]


_PAIRS = _window_pairs()


@pytest.fixture()
def ansi_spark(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize(
    "name,fn,sql", _PAIRS, ids=[n for n, _, _ in _PAIRS]
)
def test_window_query_ansi_on(ansi_spark, ddb, name, fn, sql):
    from tests.conftest import SF_DIR_ORACLE
    from tests.parity import assert_parity

    df = fn(ansi_spark, SF_DIR_ORACLE)
    if sql is None:
        assert df.count() >= 0  # crash coverage only
    else:
        assert_parity(df, ddb, sql, float_tol=0.0, name=name)
