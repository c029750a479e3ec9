"""Distributed procedural terrain + roughness search (SURVEY.md §2.9,
X7 diamond-square, X9 best-fit roughness).

Spark mapping: generation is embarrassingly parallel over (tile, H,
permutation) keys — each ``applyInPandas`` group generates its surface
from a deterministic per-key seed, so any tile batch is reproducible and
resumable without coordination (the per-tile-seed strategy SURVEY.md §7
Stage 5 calls for).  The X9 search is a union over candidate roughness
values scored against the observed spectrum and reduced with one
``min_by`` — the reference's serial 20-iteration loop
(calcBestFittingDiamondSquareRoughness, fftGrid.py:482-539) becomes a
single shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rgr_pdal_topo_spark.functions import spectral_kernels as sk
from rgr_pdal_topo_spark.functions.terrain import diamond_square
from rgr_pdal_topo_spark.grid import GridSpec
from rgr_pdal_topo_spark.operators.spectral import _dense_tile, _tile_groups


def diamond_square_tiles(
    spark: SparkSession,
    grid: GridSpec,
    roughness: float,
    starting_scale: float = 1.0,
    tile_cells: int = 50,
    seed_base: int = 771,
) -> DataFrame:
    """X7: one independent fractal surface per tile, seed = f(tile_id)."""
    tiles_x = -(-grid.ncols // tile_cells)
    tiles_y = -(-grid.nrows // tile_cells)
    ids = spark.range(tiles_x * tiles_y).select(
        F.col("id").alias("tile_id")
    )
    schema = "tile_id long, cell_row int, cell_col int, value double"

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        tile_id = int(pdf["tile_id"].iloc[0])
        tr, tc = divmod(tile_id, tiles_x)
        r0, c0 = tr * tile_cells, tc * tile_cells
        nr = min(tile_cells, grid.nrows - r0)
        nc = min(tile_cells, grid.ncols - c0)
        z = diamond_square(
            nr, nc, roughness, starting_scale, seed_base + tile_id
        )
        rr, cc = np.meshgrid(
            np.arange(r0, r0 + nr), np.arange(c0, c0 + nc), indexing="ij"
        )
        return pd.DataFrame(
            {
                "tile_id": tile_id,
                "cell_row": rr.ravel().astype("int32"),
                "cell_col": cc.ravel().astype("int32"),
                "value": z.ravel(),
            }
        )

    return ids.groupBy("tile_id").applyInPandas(per_tile, schema)


def best_fit_roughness(
    grid_df: DataFrame,
    grid: GridSpec,
    n_h: int = 20,
    tile_cells: int = 50,
    n_bins: int = 20,
    seed_base: int = 20406,
) -> DataFrame:
    """X9: brute-force H in linspace(0, 1, n_h) per tile
    (calcBestFittingDiamondSquareRoughness, fftGrid.py:482-539):

    observed spectrum = Hann-windowed detrended FFT, binned medians;
    candidate = diamond-square at H with starting scale = std of the
    detrended tile, Hann FFT without detrending; score = L2 of
    log10-power differences over jointly valid bins.  All (tile, H)
    pairs run concurrently; one min_by picks the winner per tile."""
    hs = grid_df.sparkSession.range(n_h).select(
        F.col("id").cast("int").alias("h_idx")
    )
    tiles = _tile_groups(grid_df, grid, tile_cells).crossJoin(F.broadcast(hs))
    schema = "tile_id long, h double, l2 double"

    def per_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        h_idx = int(pdf["h_idx"].iloc[0])
        h = float(np.linspace(0.0, 1.0, num=max(n_h, 2))[h_idx])
        tile_id, _, _, z, x, y = _dense_tile(pdf, grid, tile_cells)
        obs = sk.fft_forward(z, x, y, grid.cell, grid.cell, hann=True)
        bo = sk.binned_median_power(obs["L"], obs["power"], n_bins)
        scale = float(np.std(z - obs["plane"]))
        gen = diamond_square(
            z.shape[0], z.shape[1], h, scale,
            seed_base + int(tile_id) * 1000 + h_idx,
        )
        gf = sk.fft_forward(
            gen, x, y, grid.cell, grid.cell, hann=True, detrend=False
        )
        bg = sk.binned_median_power(gf["L"], gf["power"], n_bins)
        good = (
            ~np.isnan(bo["median_power"]) & ~np.isnan(bg["median_power"])
            & (bo["median_power"] > 0) & (bg["median_power"] > 0)
        )
        l2 = float(
            np.sum(
                (
                    np.log10(bg["median_power"][good])
                    - np.log10(bo["median_power"][good])
                )
                ** 2
            )
        )
        return pd.DataFrame(
            {"tile_id": [tile_id], "h": [h], "l2": [l2]}
        )

    scored = tiles.groupBy("tile_id", "h_idx").applyInPandas(
        per_pair, schema
    )
    return scored.groupBy("tile_id").agg(
        F.min_by("h", "l2").alias("best_h"), F.min("l2").alias("l2")
    )
