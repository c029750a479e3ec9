"""Spectral suite: distributed ops vs sequential kernels + math properties."""

from __future__ import annotations

import numpy as np
import pandas as pd

from rgr_pdal_topo_spark.functions import spectral_kernels as sk
from rgr_pdal_topo_spark.grid import GridSpec
from rgr_pdal_topo_spark.operators import cluster, spectral

GRID = GridSpec(x0=0.0, y0=0.0, cell=10.0, nrows=48, ncols=48)


def make_dem() -> np.ndarray:
    rng = np.random.default_rng(7)
    r = np.arange(GRID.nrows)[:, None]
    c = np.arange(GRID.ncols)[None, :]
    return (
        50.0
        + 0.04 * r
        - 0.02 * c
        + 3.0 * np.sin(2 * np.pi * r / 24.0)  # 240 m wavelength
        + 1.0 * np.sin(2 * np.pi * c / 4.0)   # 40 m wavelength
        + 0.2 * rng.random((GRID.nrows, GRID.ncols))
    )


def coords():
    r = np.arange(GRID.nrows)[:, None]
    c = np.arange(GRID.ncols)[None, :]
    x = (c + 0.5) * GRID.cell + GRID.x0
    y = ((GRID.nrows - 1) - r + 0.5) * GRID.cell + GRID.y0
    return (
        np.broadcast_to(x, (GRID.nrows, GRID.ncols)).copy(),
        np.broadcast_to(y, (GRID.nrows, GRID.ncols)).copy(),
    )


def dem_df(spark, z):
    rr, cc = np.nonzero(~np.isnan(z))
    return spark.createDataFrame(
        pd.DataFrame(
            {"cell_row": rr.astype("int32"), "cell_col": cc.astype("int32"),
             "value": z[rr, cc]}
        )
    )


def test_plane_fit_matches_lstsq(spark):
    z = make_dem()
    x, y = coords()
    exp = sk.plane_fit(x, y, z)
    got = spectral.plane_fit_coeffs(dem_df(spark, z), GRID).first()
    assert abs(got["sx_coef"] - exp[0]) < 1e-8
    assert abs(got["sy_coef"] - exp[1]) < 1e-8
    assert abs(got["intercept"] - exp[2]) < 1e-5


def test_fft_roundtrip_identity():
    """inverse(forward(z)) == z with no filters (fftGrid.py:138-150)."""
    z = make_dem()
    x, y = coords()
    fwd = sk.fft_forward(z, x, y, GRID.cell, GRID.cell)
    back = sk.fft_inverse(fwd)
    assert np.max(np.abs(back - z)) < 1e-9


def test_lowpass_removes_short_wavelengths():
    z = make_dem()
    x, y = coords()
    fwd = sk.fft_forward(z, x, y, GRID.cell, GRID.cell)
    lp = sk.filter_lowpass(fwd["L"], 100.0)
    back = sk.fft_inverse(fwd, [lp])
    # the 40 m ripple (amp 1.0) must be gone, the 240 m one kept:
    # project onto the two sine patterns
    c = np.arange(GRID.ncols)[None, :]
    r = np.arange(GRID.nrows)[:, None]
    short = np.sin(2 * np.pi * c / 4.0) * np.ones_like(z)
    long_ = np.sin(2 * np.pi * r / 24.0) * np.ones_like(z)

    def amp(field, pat):
        return np.sum(field * pat) / np.sum(pat * pat)

    # the 40 m ripple is erased, the 240 m ripple passes unchanged
    # (compare against the unfiltered field so trend leakage cancels)
    assert abs(amp(z, short)) > 0.9
    assert abs(amp(back, short)) < 0.05
    assert abs(amp(back, long_) - amp(z, long_)) < 0.05


def test_distributed_fft_single_tile_matches_kernel(spark):
    """tile_cells == grid size -> distributed == sequential, exactly."""
    z = make_dem()
    x, y = coords()
    fwd = sk.fft_forward(z, x, y, GRID.cell, GRID.cell)
    out = (
        spectral.fft_power_tiles(dem_df(spark, z), GRID, tile_cells=48)
        .toPandas()
        .sort_values(["f_row", "f_col"])
    )
    got = out["power"].to_numpy().reshape(GRID.nrows, GRID.ncols)
    assert np.array_equal(got, fwd["power"])
    b = sk.binned_median_power(fwd["L"], fwd["power"])
    bo = (
        spectral.fft_binned_power_tiles(dem_df(spark, z), GRID, tile_cells=48)
        .toPandas()
        .sort_values("bin_id")
    )
    assert np.allclose(
        bo["median_power"].to_numpy(), b["median_power"], equal_nan=True
    )


def test_distributed_filter_multi_tile_runs(spark):
    """4-tile filtered output exists for every input cell and is finite."""
    z = make_dem()
    out = spectral.fft_filter_tiles(
        dem_df(spark, z), GRID,
        [("lowpass", {"minimum_wavelength": 100.0})], tile_cells=24,
    ).toPandas()
    assert len(out) == z.size
    assert np.isfinite(out["filtered"]).all()


def test_kmeans_matches_numpy_lloyd(spark):
    z = make_dem()
    feat = np.abs(np.gradient(z)[0]).ravel()
    df = spark.createDataFrame(
        pd.DataFrame({"cell_row": 0, "cell_col": np.arange(feat.size),
                      "s": feat})
    )
    got, centers = cluster.kmeans_1d(df, "s", k=2, iters=5)
    # sequential Lloyd, same init and tie rule
    c = [feat.min(), feat.max()]
    for _ in range(5):
        assign = (np.abs(feat - c[0]) <= np.abs(feat - c[1])).astype(int)
        assign = 1 - assign  # 0 where closer to c0
        for i in (0, 1):
            sel = feat[assign == i]
            if len(sel):
                c[i] = sel.mean()
    assert abs(centers[0] - c[0]) < 1e-9
    assert abs(centers[1] - c[1]) < 1e-9
    gp = got.toPandas().sort_values("cell_col")["cluster"].to_numpy()
    exp_assign = 1 - (np.abs(feat - c[0]) <= np.abs(feat - c[1])).astype(int)
    assert np.array_equal(gp, exp_assign)


def test_piecewise_powerlaw_recovers_break():
    """Synthetic two-segment power law -> fitted break within one grid
    step of truth, slopes near the true exponents."""
    rng = np.random.default_rng(3)
    L = np.logspace(1, 3, 400)
    brk, bl, br = 100.0, 3.0, 0.5
    P = np.where(L <= brk, L**bl, brk**bl * (L / brk) ** br)
    P *= 10 ** (0.02 * rng.standard_normal(L.size))
    fit = sk.piecewise_powerlaw(L, P, n_breaks=80)
    assert abs(np.log10(fit["break_wavelength"]) - 2.0) < 0.1
    assert abs(fit["b_left"] - bl) < 0.1
    assert abs(fit["b_right"] - br) < 0.1


def test_spectral_break_tiles_runs(spark):
    z = make_dem()
    out = spectral.spectral_break_tiles(
        dem_df(spark, z), GRID, tile_cells=48
    ).toPandas()
    assert len(out) == 1
    assert np.isfinite(out["break_wavelength"]).all()


def test_diamond_square_deterministic_and_rough():
    from rgr_pdal_topo_spark.functions.terrain import diamond_square

    a = diamond_square(40, 40, 0.8, 1.0, seed=5)
    b = diamond_square(40, 40, 0.8, 1.0, seed=5)
    assert np.array_equal(a, b)
    c = diamond_square(40, 40, 0.8, 1.0, seed=6)
    assert not np.array_equal(a, c)
    # higher H -> relatively less short-wavelength energy
    def hf_ratio(h):
        z = diamond_square(64, 64, h, 1.0, seed=7)
        d = np.diff(z, axis=0)
        return np.var(d) / np.var(z)
    assert hf_ratio(0.1) > hf_ratio(0.9)


def test_best_fit_roughness_discriminates(spark):
    """The search can't recover H unbiased (the reference's amplitude
    estimate std(z - plane) shifts the optimum — same behavior as
    fftGrid.py:482-539), but it must ORDER surfaces by roughness: a
    smoother observed surface (higher H) fits a higher candidate H."""
    from rgr_pdal_topo_spark.functions.terrain import diamond_square
    from rgr_pdal_topo_spark.operators.terrain import best_fit_roughness

    fits = {}
    for true_h in (0.1, 0.9):
        z = diamond_square(48, 48, true_h, 2.0, seed=11)
        out = best_fit_roughness(
            dem_df(spark, z), GRID, n_h=11, tile_cells=48
        ).collect()
        assert len(out) == 1 and np.isfinite(out[0]["l2"])
        fits[true_h] = out[0]["best_h"]
    assert fits[0.9] > fits[0.1]


def _dbscan_pts(spark, cells):
    """cells: {(gx, gy): count} -> (gx, gy) point rows."""
    rows = [(gx, gy) for (gx, gy), n in cells.items() for _ in range(n)]
    return spark.createDataFrame(rows, "gx int, gy int")


def test_dbscan_grid_planted_shapes(spark):
    # small total -> absolute floor (5) governs; three planted clusters:
    #   A: non-convex L of five 6-count cells (the shape kmeans cannot
    #      label), two legs joined only through the corner cell;
    #   B: two cells touching DIAGONALLY only (8-adjacency must connect);
    #   C: a singleton core cell (no edges -> coalesce path);
    # plus 4-count noise cells everywhere in between (never emitted).
    cells = {
        (10, 10): 6, (11, 10): 6, (12, 10): 6, (12, 11): 6, (12, 12): 6,
        (50, 50): 5, (51, 51): 5,
        (100, 100): 7,
        (30, 30): 4, (13, 10): 4, (12, 13): 4,  # sub-core noise
    }
    got = {
        r.cluster: (r.n_cells, r.n_points,
                    r.min_gx, r.max_gx, r.min_gy, r.max_gy)
        for r in cluster.dbscan_grid(_dbscan_pts(spark, cells)).collect()
    }
    assert got == {
        10 * 200 + 10: (5, 30, 10, 12, 10, 12),   # L-blob, min cid label
        50 * 200 + 50: (2, 10, 50, 51, 50, 51),   # diagonal pair
        100 * 200 + 100: (1, 7, 100, 100, 100, 100),  # singleton core
    }


def test_dbscan_grid_relative_threshold(spark):
    # one point in EVERY lattice cell (uniform wash) + 8 extra on (5,5)
    # and 7 extra on (8,8): total = 40015 -> core floor becomes
    # ceil(8 * 40015 / 40000) = 9, so (5,5) at 9 is core and (8,8) at 8
    # is NOT — the scale-free relative rule, not the absolute floor,
    # decides.  Uniform cells (count 1) stay noise.
    uni = spark.range(40000).selectExpr(
        "CAST(id % 200 AS INT) AS gx", "CAST(id DIV 200 AS INT) AS gy"
    )
    extra = _dbscan_pts(spark, {(5, 5): 8, (8, 8): 7})
    got = cluster.dbscan_grid(uni.union(extra)).collect()
    assert [(r.cluster, r.n_cells, r.n_points) for r in got] == [
        (5 * 200 + 5, 1, 9)
    ]
