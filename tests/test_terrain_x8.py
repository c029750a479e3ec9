"""X8 random-priority-filling terrain tests: kernel invariants, chi-mode
area/slope laws, distributed-ensemble == sequential-kernel equality, and
the null-model envelope shape."""

from __future__ import annotations

import numpy as np
import pytest

from rgr_pdal_topo_spark.functions.kernels import (
    D8_COL_KERNEL,
    D8_DS_CODES,
    D8_ROW_KERNEL,
)
from rgr_pdal_topo_spark.functions.terrain import random_priority_fill
from rgr_pdal_topo_spark.grid import GridSpec

_CODE2K = {int(D8_DS_CODES[k]): k for k in range(8)}


def _parent(r, c, fd):
    k = _CODE2K[int(fd[r, c])]
    return r + int(D8_ROW_KERNEL[k]), c + int(D8_COL_KERNEL[k])


def _check_tree(out, n, dx, slope=None, ksn=None, theta=None):
    z, fd = out["z"], out["fd"]
    assert not np.isnan(z).any()
    for r in range(n):
        for c in range(n):
            if fd[r, c] == 0:
                assert r in (0, n - 1) or c in (0, n - 1)
                assert z[r, c] == 0.0
                continue
            pr, pc = _parent(r, c, fd)
            k = _CODE2K[int(fd[r, c])]
            dist = float(np.hypot(D8_ROW_KERNEL[k] * dx,
                                  D8_COL_KERNEL[k] * dx))
            s = (ksn * out["area"][r, c] ** theta) if ksn else slope
            assert z[r, c] == pytest.approx(z[pr, pc] + s * dist, rel=1e-12)


def test_random_mode_invariants():
    out = random_priority_fill(24, 24, 10.0, 0.02, seed=9)
    _check_tree(out, 24, 10.0, slope=0.02)
    # deterministic per seed, different across seeds
    again = random_priority_fill(24, 24, 10.0, 0.02, seed=9)
    assert np.array_equal(out["z"], again["z"])
    other = random_priority_fill(24, 24, 10.0, 0.02, seed=10)
    assert not np.array_equal(out["z"], other["z"])


def test_elevation_and_longwave_modes():
    out = random_priority_fill(16, 16, 10.0, 0.02, seed=3, mode="elevation")
    _check_tree(out, 16, 10.0, slope=0.02)
    pg = np.tile(np.linspace(0.0, 1.0, 16), (16, 1))
    out2 = random_priority_fill(
        16, 16, 10.0, 0.02, seed=3, mode="longwave", priority_grid=pg
    )
    _check_tree(out2, 16, 10.0, slope=0.02)


def test_chi_mode_area_and_slope_law():
    pxl = 100.0
    amap = {400.0: np.array([300.0, 200.0]), 300.0: np.array([200.0]),
            200.0: np.array([100.0])}
    out = random_priority_fill(
        12, 12, 10.0, 0.0, seed=7, mode="chi", ksn=50.0, theta=0.45,
        area_map=amap,
    )
    _check_tree(out, 12, 10.0, ksn=50.0, theta=-0.45)
    # synthetic areas only take observed values, the pixel floor, or a
    # remaining-area residual; always finite and >= 0 is the hard floor
    assert np.isfinite(out["area"]).all()


def test_mask_and_outlets():
    mask = np.ones((16, 16), dtype=bool)
    mask[:, 12:] = False
    out = random_priority_fill(
        16, 16, 10.0, 0.02, seed=1, outlets=np.array([[0, 0]]), mask=mask
    )
    assert np.isnan(out["z"][:, 12:]).all()
    inb = out["z"][:, :12]
    assert not np.isnan(inb).any()
    assert (out["fd"][~np.isnan(out["z"])] == 0).sum() == 1  # one outlet


def test_distributed_ensemble_matches_kernel(spark):
    from rgr_pdal_topo_spark.operators.terrain import random_terrain_ensemble

    grid = GridSpec(cell=10.0, nrows=20, ncols=20)
    ens = random_terrain_ensemble(
        spark, grid, n_members=3, fill_slope=0.02, seed_base=100
    ).toPandas()
    assert set(ens.member_id) == {0, 1, 2}
    for m in range(3):
        ref = random_priority_fill(20, 20, 10.0, 0.02, seed=100 + m)
        sub = ens[ens.member_id == m]
        got = np.full((20, 20), np.nan)
        got[sub.cell_row, sub.cell_col] = sub.z
        np.testing.assert_array_equal(got, ref["z"])


def test_radial_envelope_shape(spark):
    from rgr_pdal_topo_spark.operators.terrain import (
        radial_ensemble_histogram,
        random_terrain_ensemble,
    )

    grid = GridSpec(cell=10.0, nrows=20, ncols=20)
    ens = random_terrain_ensemble(
        spark, grid, n_members=4, fill_slope=0.02, seed_base=55
    )
    env = radial_ensemble_histogram(ens, max_length=300.0).toPandas()
    assert len(env) > 0
    assert (env.n_members <= 4).all()
    assert (env.min_cells <= env.med_cells).all()
    assert (env.med_cells <= env.max_cells).all()


def test_chi_area_mapping(spark):
    from rgr_pdal_topo_spark.operators.terrain import chi_area_mapping

    # toy net: 3 -> 2 -> 1 (areas 100, 200, 400), plus leaf 4 -> 1
    rows = [
        (0, 0, 400.0, None, None),
        (0, 1, 200.0, 0, 0),
        (0, 2, 100.0, 0, 1),
        (1, 0, 100.0, 0, 0),
    ]
    fm = spark.createDataFrame(
        rows,
        "cell_row int, cell_col int, area double, down_row int, "
        "down_col int",
    )
    got = {
        (r.down_area, r.donor_area)
        for r in chi_area_mapping(fm, pxl=100.0).collect()
    }
    # donors with area > 1 pixel only: 200 -> 400; 100-area leaves excluded
    assert got == {(400.0, 200.0)}


def test_radial_envelope_cardinal_angles_and_zero_members(spark):
    import math

    from rgr_pdal_topo_spark.operators.terrain import (
        radial_ensemble_histogram,
    )

    # D8 sweeps emit mean_dir EXACTLY pi/2 (due north) and pi (due west);
    # both must land in a sector (round-1 window arithmetic dropped them),
    # and a member with zero cells in a bin must pull min_cells to 0
    rows = [
        (0, 50.0, math.pi / 2.0),
        (0, 50.0, math.pi),
        (0, 50.0, -math.pi),
        (1, 50.0, math.pi / 2.0),
    ]
    ens = spark.createDataFrame(
        rows, "member_id long, max_l double, mean_dir double"
    )
    env = radial_ensemble_histogram(
        ens, n_length_bins=2, max_length=200.0
    ).toPandas()
    assert len(env) == 2 * 8  # fixed-shape bin universe
    by_bin = env.set_index(["l_bin", "t_bin"])
    # pi/2 sector (t_bin 6 = [pi/2, 3pi/4)): both members have 1 -> min 1
    assert by_bin.loc[(0, 6)].min_cells == 1
    assert by_bin.loc[(0, 6)].max_cells == 1
    # pi/-pi sector (t_bin 0 = [-pi, -3pi/4)): member 0 has 2, member 1
    # has 0 -> the zero-member rule makes min_cells 0
    assert by_bin.loc[(0, 0)].max_cells == 2
    assert by_bin.loc[(0, 0)].min_cells == 0


def test_ensemble_closure_carries_no_raster(spark):
    """The ensemble UDF ships the priority surface by Broadcast HANDLE:
    its serialized closure must stay KB-sized even when the surface is
    MB-sized (closure capture would re-pickle the grid into every task)."""
    from pyspark.serializers import CloudPickleSerializer

    from rgr_pdal_topo_spark.operators.terrain import _member_fill_fn

    big = np.zeros((600, 600))  # 2.9 MB as float64
    pg_bc = spark.sparkContext.broadcast(big)
    fn = _member_fill_fn(
        600, 600, 10.0, 0.01, 4242, "priority_grid", None, None, False,
        pg_bc, None,
    )
    n = len(CloudPickleSerializer().dumps(fn))
    assert n < 50_000, f"per-member closure serialized to {n} bytes"
    # Pickling a live Broadcast side-registers it in the thread-local
    # _pickled_broadcast_vars (Broadcast.__reduce__) — the registry
    # PySpark drains into the NEXT serialized Python-UDF command on
    # this thread.  Destroying pg_bc while it sits there made the next
    # UDF-bearing test fail with "Attempted to use Broadcast(N) after
    # it was destroyed" (test_viewshed, ~1-in-2 full-suite runs).
    # Clear the registry BEFORE destroying so the handle never leaks
    # into a later job.
    spark.sparkContext._pickled_broadcast_vars.clear()
    pg_bc.destroy()
