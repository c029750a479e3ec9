"""Gridding operators (A1-A3) vs a pandas oracle and salted-vs-plain parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR

from rgr_pdal_topo_spark.grid import GridSpec
from rgr_pdal_topo_spark.operators import gridding
from rgr_pdal_topo_spark.synth import points_df

GRID = GridSpec()


@pytest.fixture(scope="module")
def pts_pdf(spark):
    return points_df(spark, SF_DIR).toPandas()


def _cells(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out["cell_col"] = np.floor(out.x / GRID.cell).astype(int)
    out["cell_row"] = (GRID.nrows - 1 - np.floor(out.y / GRID.cell)).astype(int)
    return out


def test_grid_mean_matches_pandas(spark, pts_pdf):
    got = (
        gridding.grid_points(points_df(spark, SF_DIR), GRID, output_type="mean")
        .toPandas()
        .sort_values(["cell_row", "cell_col"])
        .reset_index(drop=True)
    )
    exp = (
        _cells(pts_pdf)
        .groupby(["cell_row", "cell_col"])
        .agg(value=("z", "mean"), n=("z", "size"))
        .reset_index()
        .sort_values(["cell_row", "cell_col"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    np.testing.assert_allclose(got.value, exp.value, rtol=1e-12)
    assert (got.n.to_numpy() == exp.n.to_numpy()).all()


def test_grid_idw_matches_pandas(spark, pts_pdf):
    got = (
        gridding.grid_points(points_df(spark, SF_DIR), GRID, output_type="idw")
        .toPandas()
        .sort_values(["cell_row", "cell_col"])
        .reset_index(drop=True)
    )
    c = _cells(pts_pdf)
    cx = (c.cell_col + 0.5) * GRID.cell
    cy = (GRID.nrows - 1 - c.cell_row + 0.5) * GRID.cell
    d2 = (c.x - cx) ** 2 + (c.y - cy) ** 2 + gridding.IDW_EPS
    c["w"] = 1.0 / d2
    c["wz"] = c.w * c.z
    exp = (
        c.groupby(["cell_row", "cell_col"])
        .agg(swv=("wz", "sum"), sw=("w", "sum"))
        .reset_index()
    )
    exp["value"] = exp.swv / exp.sw
    exp = exp.sort_values(["cell_row", "cell_col"]).reset_index(drop=True)
    np.testing.assert_allclose(got.value, exp.value, rtol=1e-9)


def test_salted_equals_plain(spark):
    pts = points_df(spark, SF_DIR)
    plain = (
        gridding.grid_points(pts, GRID, output_type="idw")
        .toPandas()
        .sort_values(["cell_row", "cell_col"])
        .reset_index(drop=True)
    )
    salted = (
        gridding.grid_points(pts, GRID, output_type="idw", salt=8)
        .toPandas()
        .sort_values(["cell_row", "cell_col"])
        .reset_index(drop=True)
    )
    assert (plain.n.to_numpy() == salted.n.to_numpy()).all()
    np.testing.assert_allclose(plain.value, salted.value, rtol=1e-9)


def test_count_min_max(spark, pts_pdf):
    pts = points_df(spark, SF_DIR)
    cnt = gridding.grid_points(pts, GRID, output_type="count").toPandas()
    assert cnt.value.sum() == len(pts_pdf)
    mx = (
        gridding.grid_points(pts, GRID, output_type="max")
        .toPandas()
        .sort_values(["cell_row", "cell_col"])
    )
    exp = (
        _cells(pts_pdf)
        .groupby(["cell_row", "cell_col"])["z"].max()
        .reset_index()
        .sort_values(["cell_row", "cell_col"])
    )
    np.testing.assert_allclose(mx.value.to_numpy(), exp.z.to_numpy())


def test_fill_empty_cells(spark, pts_pdf):
    pts = points_df(spark, SF_DIR).filter("cls = 2")
    g = gridding.grid_points(pts, GRID, output_type="mean")
    filled = gridding.fill_empty_cells(g, GRID, window_size=6).toPandas()
    # dense universe minus cells that stayed empty (no neighbor in radius 6)
    assert len(filled) <= GRID.nrows * GRID.ncols
    assert (filled.filled.isin([0, 1])).all()
    base = g.toPandas()
    n_filled_cells = (filled.filled == 1).sum()
    assert len(filled) == len(base) + n_filled_cells
    # spot-check one filled cell against a pandas IDW of neighbor cells
    f1 = filled[filled.filled == 1]
    if len(f1):
        row = f1.iloc[0]
        b = base.set_index(["cell_row", "cell_col"])
        num = den = 0.0
        for dr in range(-6, 7):
            for dc in range(-6, 7):
                if dr == 0 and dc == 0:
                    continue
                key = (row.cell_row + dr, row.cell_col + dc)
                if key in b.index:
                    d2 = (dr * GRID.cell) ** 2 + (dc * GRID.cell) ** 2
                    num += b.loc[key, "value"] / d2
                    den += 1.0 / d2
        assert den > 0
        np.testing.assert_allclose(row.value, num / den, rtol=1e-9)


def test_auto_salt_detects_skew_and_matches_plain(spark):
    """80% of points piled into one cell: the pre-pass must pick salt > 0
    and the salted result must equal the plain aggregation."""
    import pandas as pd

    from rgr_pdal_topo_spark.operators.gridding import (
        detect_max_cell_count,
        grid_points,
        grid_points_auto,
    )

    n = 200_000
    rng = np.random.default_rng(4)
    heavy = rng.random(n) < 0.8
    x = np.where(heavy, 2.0 + rng.random(n) * 6.0, rng.random(n) * 1000.0)
    y = np.where(heavy, 2.0 + rng.random(n) * 6.0, rng.random(n) * 1000.0)
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": np.arange(n), "x": x, "y": y,
                      "z": rng.random(n) * 10.0})
    )
    est = detect_max_cell_count(pts, GRID, fraction=0.05)
    assert est > 100_000  # the dense cell is visible in the sample
    auto = grid_points_auto(
        pts, GRID, output_type="mean", max_rows_per_task=10_000,
        sample_fraction=0.05,
    ).toPandas().sort_values(["cell_row", "cell_col"]).reset_index(drop=True)
    plain = grid_points(pts, GRID, output_type="mean").toPandas().sort_values(
        ["cell_row", "cell_col"]
    ).reset_index(drop=True)
    assert (auto.n.to_numpy() == plain.n.to_numpy()).all()
    np.testing.assert_allclose(auto.value, plain.value, rtol=1e-9)
