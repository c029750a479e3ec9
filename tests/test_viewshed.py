"""Viewshed operator: planted-scenario semantics + exact pure-Python
replay (the operator is all-BIGINT, so the replay matches bit-for-bit).
"""

from __future__ import annotations

import pytest

from rgr_pdal_topo_spark.operators import viewshed as vs

Q = 1 << 20  # Q20 elevation unit (1 m)


def _demq(spark, cells):
    return spark.createDataFrame(
        [(r, c, z * Q) for r, c, z in cells],
        "cell_row INT, cell_col INT, vq BIGINT",
    )


def _obs(spark, r, c, z):
    return spark.createDataFrame(
        [(r, c, z * Q + vs.OBS_HEIGHT_Q)],
        "orow INT, ocol INT, ozq BIGINT",
    )


def test_ridge_blocks_gap_never_blocks_grazing_blocks(spark):
    # One west-east line: observer on (0,0) at z=10 (eye 12), a z=50
    # ridge at col 4.  Cell (0,2) is a DATA GAP.
    cells = [(0, 0, 10), (0, 1, 0), (0, 3, 0), (0, 4, 50), (0, 5, 0),
             (0, 6, 0), (0, 7, 200), (0, 8, 88)]
    out = vs.viewshed(_demq(spark, cells), _obs(spark, 0, 0, 10))
    got = {(r.cell_row, r.cell_col): (r.dist, r.visible)
           for r in out.collect()}
    assert got[(0, 1)] == (1, 1)      # dist 1: no samples, visible
    # (0,3): samples pass the gap at (0,2) -> gap never blocks
    assert got[(0, 3)] == (3, 1)
    assert got[(0, 4)] == (4, 1)      # the ridge crest itself is seen
    assert got[(0, 5)] == (5, 0)      # behind the ridge: blocked
    assert got[(0, 6)] == (6, 0)
    # (0,7) z=200 towers above the ridge sight line: visible
    assert got[(0, 7)] == (7, 1)
    # (0,8) z=88 grazes the ridge EXACTLY ((50-12)*8 == (88-12)*4):
    # equality blocks, identically in both engines
    assert got[(0, 8)] == (8, 0)
    assert (0, 0) not in got          # observer cell excluded


def test_pick_observer_highest_then_smallest_cell(spark):
    cells = [(5, 5, 9), (2, 7, 9), (2, 3, 9), (0, 0, 1)]
    row = vs.pick_observer(_demq(spark, cells)).collect()[0]
    assert (row.orow, row.ocol) == (2, 3)
    assert row.ozq == 9 * Q + vs.OBS_HEIGHT_Q


def _replay(cells, orow, ocol, ozq):
    """Naive pure-Python R3 viewshed — the exact integer contract."""
    dem = {(r, c): z for r, c, z in cells}
    out = {}
    for (tr, tc), tz in dem.items():
        if (tr, tc) == (orow, ocol):
            continue
        dr, dc = tr - orow, tc - ocol
        d = max(abs(dr), abs(dc))
        blocked = 0
        for k in range(1, d):
            sr = (2 * (orow * d + dr * k) + d) // (2 * d)
            sc = (2 * (ocol * d + dc * k) + d) // (2 * d)
            sz = dem.get((sr, sc), vs.NEVER_BLOCKS_Q)
            if (sz - ozq) * d >= (tz - ozq) * k:
                blocked = 1
        out[(tr, tc)] = (d, 0 if blocked else 1)
    return out


def test_pure_python_replay_exact(spark):
    # Deterministic pseudo-random 12x12 grid with holes: every cell's
    # elevation from a multiplicative hash; ~1/7 of cells missing.
    cells = []
    for r in range(12):
        for c in range(12):
            h = (r * 12 + c) * 2654435761 % 97
            if h % 7 == 0:
                continue
            cells.append((r, c, (h % 23) * (1 << 18)))  # sub-metre z
    demq = spark.createDataFrame(
        cells, "cell_row INT, cell_col INT, vq BIGINT"
    )
    obs = vs.pick_observer(demq)
    orow, ocol, ozq = obs.collect()[0]
    got = {(r.cell_row, r.cell_col): (r.dist, r.visible)
           for r in vs.viewshed(demq, obs).collect()}
    want = _replay(cells, orow, ocol, ozq)
    assert got == want
    vis = [v for _, v in got.values()]
    assert 0 < sum(vis) < len(vis)  # non-vacuous: both outcomes occur


def test_query_registered():
    from rgr_pdal_topo_spark.queries import ORACLES, QUERIES

    assert "viewshed" in QUERIES and "viewshed" in ORACLES
