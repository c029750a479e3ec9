"""Sweep every queries()/oracle_sql() pair through the driver-style compare
at the oracle scale factor (sf0.01).  This is the pre-flight for
CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_ORACLE
from tests.parity import assert_parity


def _pairs():
    from rgr_pdal_topo_spark.queries import ORACLES, QUERIES

    return sorted((name, QUERIES[name], ORACLES[name]) for name in ORACLES)


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=lambda p: p if isinstance(p, str) else "")
def test_query_matches_oracle(spark, ddb, name, fn, sql):
    df = fn(spark, SF_DIR_ORACLE)
    assert_parity(df, ddb, sql, float_tol=0.0, name=name)


def test_all_queries_have_callables(spark):
    from rgr_pdal_topo_spark.queries import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) >= 15
