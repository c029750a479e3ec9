"""Property-based tests (hypothesis) for the exact-arithmetic layers:
cell-index hierarchy and the portable dedup hash.  These run pure numpy /
DuckDB (no Spark) so hundreds of examples stay fast."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rgr_pdal_topo_spark.functions import cells
from rgr_pdal_topo_spark.operators import dedup

_lon = st.floats(min_value=-179.999, max_value=179.999,
                 allow_nan=False, allow_infinity=False)
_lat = st.floats(min_value=-89.999, max_value=89.999,
                 allow_nan=False, allow_infinity=False)


def _quad_np(lon: float, lat: float, res: int) -> int:
    n = 1 << res
    ix = min(max(int(np.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
    iy = min(max(int(np.floor((90.0 - lat) / 180.0 * n)), 0), n - 1)
    return (1 << (2 * res)) + int(
        cells._morton_np(np.array([ix]), np.array([iy]), res)[0]
    )


@settings(max_examples=200, deadline=None)
@given(_lon, _lat)
def test_quad_parent_containment(lon, lat):
    # encoding at res r then shifting equals encoding at res r-1, for the
    # whole resolution ladder
    ids = [_quad_np(lon, lat, r) for r in cells.H3_RES_RANGE]
    for fine, coarse in zip(ids[1:], ids[:-1]):
        assert fine >> 2 == coarse


@settings(max_examples=200, deadline=None)
@given(_lon, _lat)
def test_s2_id_round_trip_face_and_range(lon, lat):
    cid = int(cells.s2_cell_np(np.array([lon]), np.array([lat]))[0])
    face = cid >> (2 * cells.S2_LEVEL)
    assert 0 <= face <= 5
    assert 0 <= cid - (face << (2 * cells.S2_LEVEL)) < 1 << (2 * cells.S2_LEVEL)


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=40))
def test_portable_hash_cross_engine(s):
    con = duckdb.connect()
    expr = dedup.horner_hash_sql("h")
    got = con.execute(
        f"SELECT {expr} FROM (SELECT md5(?) AS h)", [s]
    ).fetchone()[0]
    # DuckDB Horner == the engine's conv spelling == value in [0, P)
    import hashlib

    hx = hashlib.md5(s.encode("utf-8")).hexdigest()
    assert got == int(hx[:15], 16) % dedup.MINHASH_P
    assert 0 <= got < dedup.MINHASH_P
