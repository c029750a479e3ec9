"""Cross-scale parity gate (opt-in: set SPARK_GRAFT_XSCALE_DIR).

The driver checks oracle parity at sf0.01 only; this sweep replays the
whole driver window at another scale factor (typically sf0.1, denser
grids, ~10x points per cell).  It exists because it has caught real
bugs the fixed-scale gate cannot:

* full 13x13 TPI windows only populate at sf0.1 — the rounds-1-2 tpi
  oracle divided by 112 instead of the kernel's 84 and was vacuously
  green at sf0.01;
* SUM(z)/COUNT aggregation-order drift only crossed a ROUND(,6)
  half-boundary at ~150 points/cell (grid_mean, mosaic_tiles,
  perm_ensemble, resample_bilinear at sf0.1) — fixed by the 2^-20
  z-quantization; the sweep is the regression guard that the mean
  family stays bit-stable at ANY scale.

Run: SPARK_GRAFT_XSCALE_DIR=/root/testdata/sf0.1 python -m pytest \
    tests/test_cross_scale.py -q          (~8 min at sf0.1)
"""

from __future__ import annotations

import os

import pytest

XDIR = os.environ.get("SPARK_GRAFT_XSCALE_DIR")

pytestmark = pytest.mark.skipif(
    not XDIR,
    reason="cross-scale gate is opt-in: set SPARK_GRAFT_XSCALE_DIR "
    "(e.g. /root/testdata/sf0.1)",
)


@pytest.fixture(scope="module")
def xddb():
    import duckdb

    from rgr_pdal_topo_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{XDIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _window_pairs():
    if not XDIR:
        return []
    from rgr_pdal_topo_spark.queries import DRIVER_WINDOW, ORACLES, QUERIES

    return [(n, QUERIES[n], ORACLES[n]) for n in DRIVER_WINDOW]


_PAIRS = _window_pairs()


@pytest.mark.parametrize(
    "name,fn,sql", _PAIRS, ids=[n for n, _, _ in _PAIRS]
)
def test_window_query_matches_oracle_at_xscale(spark, xddb, name, fn, sql):
    from tests.parity import assert_parity

    assert_parity(fn(spark, XDIR), xddb, sql, float_tol=0.0, name=name)
