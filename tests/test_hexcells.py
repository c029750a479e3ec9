"""Hexagonal cell-index tests (functions/hexcells.py): cube-rounding
validity, nearest-center correctness, k-ring symmetry/equidistance,
parent containment, Column == pandas_udf == DuckDB id equality."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rgr_pdal_topo_spark.functions import hexcells as hx


def _pts(n=400, seed=7):
    rng = np.random.default_rng(seed)  # fresh per call: same n+seed, same pts
    lon = rng.uniform(-180.0, 180.0, n)
    lat = rng.uniform(-85.0, 85.0, n)
    return [(int(i), float(a), float(b)) for i, (a, b) in
            enumerate(zip(lon, lat))]


def _df(spark, pts):
    return spark.createDataFrame(pts, "pid long, lon double, lat double")


def _centers_np(q, r, res):
    s = hx.hex_size(res)
    return s * math.sqrt(3.0) * (q + r / 2.0), s * 1.5 * r


def test_hex_cell_is_nearest_center(spark):
    """The encoded cell's center is no farther than any neighbour's
    center (the defining property cube rounding must deliver)."""
    rows = (
        _df(spark, _pts(300))
        .select(
            "pid", "lon", "lat",
            hx.hex_cell(F.col("lon"), F.col("lat"), 7).alias("c"),
        )
        .collect()
    )
    mask = (1 << 28) - 1
    for row in rows:
        q = ((row.c >> 28) & mask) - (1 << 27)
        r = (row.c & mask) - (1 << 27)
        cx, cy = _centers_np(q, r, 7)
        d0 = (row.lon - cx) ** 2 + (row.lat - cy) ** 2
        for dq, dr in hx.HEX_NEIGHBOR_DELTAS:
            nx, ny = _centers_np(q + dq, r + dr, 7)
            dn = (row.lon - nx) ** 2 + (row.lat - ny) ** 2
            assert d0 <= dn + 1e-9


def test_k_ring_symmetry_and_equidistance(spark):
    """b in ring(a) <=> a in ring(b); all six neighbour centers are the
    same distance from the cell center (the hex property squares lack)."""
    deltas = hx.HEX_NEIGHBOR_DELTAS
    # symmetry: the delta set is closed under negation
    assert {(-dq, -dr) for dq, dr in deltas} == set(deltas)
    q, r, res = 11, -4, 7
    cx, cy = _centers_np(q, r, res)
    dists = []
    for dq, dr in deltas:
        nx, ny = _centers_np(q + dq, r + dr, res)
        dists.append(math.hypot(nx - cx, ny - cy))
    assert max(dists) - min(dists) < 1e-9
    # and the packed-id ring arithmetic produces exactly those neighbours
    row = (
        _df(spark, [(1, cx, cy)])
        .select(hx.hex_k_ring(
            hx.hex_cell(F.col("lon"), F.col("lat"), res)).alias("ring"))
        .collect()[0]
    )
    got = set(row.ring)
    want = {(res << 56) + ((q + dq + (1 << 27)) << 28) + (r + dr + (1 << 27))
            for dq, dr in deltas + ((0, 0),)}
    assert got == want


def test_parent_center_containment(spark):
    """The child's center encodes to its parent at res-1 (H3 semantics);
    the child's ORIGINAL point may straddle — but the parent must be one
    of the point's own res-1 candidates (its cell or a neighbour)."""
    rows = (
        _df(spark, _pts(300))
        .select(
            hx.hex_cell(F.col("lon"), F.col("lat"), 8).alias("c8"),
            hx.hex_parent(
                hx.hex_cell(F.col("lon"), F.col("lat"), 8), 8
            ).alias("p"),
            hx.hex_cell(F.col("lon"), F.col("lat"), 7).alias("c7"),
            hx.hex_k_ring(
                hx.hex_cell(F.col("lon"), F.col("lat"), 7)
            ).alias("ring7"),
        )
        .collect()
    )
    n_exact = 0
    for row in rows:
        assert row.p >> 56 == 7  # parent res marker
        assert row.p in set(row.ring7)  # never farther than one cell off
        n_exact += int(row.p == row.c7)
    # straddling is the exception, not the rule
    assert n_exact >= len(rows) * 0.6


@pytest.fixture()
def pts_view(ddb):
    pts = _pts(500)
    ddb.register("pts", pd.DataFrame(pts, columns=["pid", "lon", "lat"]))
    yield pts
    ddb.unregister("pts")


def test_column_udf_duckdb_bit_equality(spark, ddb, pts_view):
    """One spelling, three engines: the Column expression, the Arrow
    pandas_udf, and the DuckDB SQL twin produce identical ids."""
    df = _df(spark, pts_view)
    for res in (5, 9, 12):
        rows = (
            df.select(
                "pid",
                hx.hex_cell(F.col("lon"), F.col("lat"), res).alias("col"),
                hx.hex_cell_udf(res)(F.col("lon"), F.col("lat")).alias(
                    "udf"
                ),
            )
            .collect()
        )
        by_pid = {r.pid: r for r in rows}
        assert all(r.col == r.udf for r in rows)
        got = ddb.execute(
            "SELECT pid, "
            + hx.hex_cell_sql("lon", "lat", res)
            + " AS c FROM pts ORDER BY pid"
        ).fetchall()
        assert len(got) == len(rows)
        assert all(by_pid[pid].col == c for pid, c in got)


def test_parent_sql_twin_matches(spark, ddb, pts_view):
    rows = (
        _df(spark, pts_view)
        .select(
            "pid",
            hx.hex_parent(
                hx.hex_cell(F.col("lon"), F.col("lat"), 6), 6
            ).alias("p"),
        )
        .collect()
    )
    by_pid = {r.pid: r.p for r in rows}
    cell = hx.hex_cell_sql("lon", "lat", 6)
    got = ddb.execute(
        f"SELECT pid, {hx.hex_parent_sql(cell, 6)} AS p FROM pts "
        "ORDER BY pid"
    ).fetchall()
    assert len(got) == len(rows)
    assert all(by_pid[pid] == p for pid, p in got)


def test_ids_self_describing_and_res_unique(spark):
    df = _df(spark, [(1, 10.0, 10.0)])
    vals = df.select(
        *[
            hx.hex_cell(F.col("lon"), F.col("lat"), r).alias(f"r{r}")
            for r in hx.HEX_RES_RANGE
        ]
    ).collect()[0]
    ids = [vals[f"r{r}"] for r in hx.HEX_RES_RANGE]
    assert len(set(ids)) == len(ids)
    for r, cid in zip(hx.HEX_RES_RANGE, ids):
        assert cid >> 56 == r


def test_k_ring_radius_generalization(spark):
    """kRing(k) sizes follow 1 + 3k(k+1); every k=2 member is within
    hex distance 2 of the center (distance = (|dq|+|dr|+|dq+dr|)/2)."""
    assert len(hx.hex_disk_deltas(1)) == 7
    assert len(hx.hex_disk_deltas(2)) == 19
    assert len(hx.hex_disk_deltas(3)) == 37
    for dq, dr in hx.hex_disk_deltas(2):
        assert (abs(dq) + abs(dr) + abs(dq + dr)) // 2 <= 2
    row = (
        _df(spark, [(1, 10.0, 10.0)])
        .select(
            hx.hex_cell(F.col("lon"), F.col("lat"), 7).alias("c"),
            hx.hex_k_ring(
                hx.hex_cell(F.col("lon"), F.col("lat"), 7), 2
            ).alias("ring2"),
            hx.hex_k_ring(
                hx.hex_cell(F.col("lon"), F.col("lat"), 7)
            ).alias("ring1"),
        )
        .collect()[0]
    )
    assert len(set(row.ring2)) == 19
    assert set(row.ring1) < set(row.ring2)
    assert row.c in set(row.ring1)


def test_antimeridian_normalization_three_spellings(spark, ddb):
    """lon, lon+360, and lon-360 encode to the SAME cell in all three
    encoders (Column, Arrow UDF, DuckDB SQL twin); in-range ids are
    bit-unchanged by the normalization (exact no-op floor term)."""
    import numpy as np

    base = [(-179.99, 10.0), (179.99, -45.0), (180.0, 0.0),
            (0.0, 0.0), (-180.0, 33.3), (123.456, 67.89)]
    rows = []
    for i, (lo, la) in enumerate(base):
        for j, shift in enumerate((0.0, 360.0, -360.0)):
            rows.append((i * 10 + j, i, lo + shift, la))
    df = spark.createDataFrame(
        rows, "pid long, grp int, lon double, lat double"
    )
    for res in (5, 12):
        got = df.select(
            "grp",
            hx.hex_cell(F.col("lon"), F.col("lat"), res).alias("c"),
            hx.hex_cell_udf(res)(F.col("lon"), F.col("lat")).alias("u"),
        ).collect()
        assert all(r.c == r.u for r in got)
        per_grp = {}
        for r in got:
            per_grp.setdefault(r.grp, set()).add(r.c)
        assert all(len(s) == 1 for s in per_grp.values()), per_grp
        ddb.register(
            "amr", pd.DataFrame(rows, columns=["pid", "grp", "lon", "lat"])
        )
        sql = ddb.execute(
            "SELECT grp, COUNT(DISTINCT "
            + hx.hex_cell_sql("lon", "lat", res)
            + ") AS n, MIN(" + hx.hex_cell_sql("lon", "lat", res)
            + ") AS c FROM amr GROUP BY grp"
        ).fetchall()
        ddb.unregister("amr")
        assert all(n == 1 for _, n, _ in sql)
        spark_by_grp = {r.grp: r.c for r in got}
        assert all(spark_by_grp[g] == c for g, n, c in sql)
    # lon=+180 normalizes onto the WEST side of the seam: same cell as
    # lon=-180 at the same latitude (groups 2 and part of 4 share lat 0
    # vs 33.3 — compare explicitly at one latitude)
    pair = spark.createDataFrame(
        [(0, 180.0, 12.5), (1, -180.0, 12.5)], "pid long, lon double, lat double"
    ).select(hx.hex_cell(F.col("lon"), F.col("lat"), 8).alias("c")).collect()
    assert pair[0].c == pair[1].c
