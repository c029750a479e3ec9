"""Raster mosaic / warp / reprojection + histogram ops
(SURVEY.md §2: K7/J6/U3 merge_warp_dems, F5 reprojection, A7 radial
histogram, F16/O6 stratified subsample).

The reference shells out to GDAL (merge_warp_dems,
pointCloudCreation.py:641-677) and pyproj (reprojectXYPoints, :134-153).
Here every step is relational:

  * mosaic    — unionByName over tile DEMs + per-cell overlap resolution
    (average, or first-by-priority via one window) — J6's halo dedup;
  * resample  — cell-id remapping between two GridSpecs: 'near' is an
    equi-join on the containing source cell, 'average' a groupBy of
    source centers per dest cell, 'bilinear' a 4-corner broadcast-offset
    join with weight columns (all Catalyst, no UDF);
  * reproject — vectorized pandas UDF implementing the public spherical
    web-mercator formulas EPSG:4326 <-> 3857 (the Arrow-batched
    replacement for filters.reprojection);
  * radial_histogram — (length x theta) bin counts with wrap-around
    theta windows (_radialLengthThetaHistogram, randomGrids.py:572-606);
  * stratified_sample — per-bin top-n by deterministic hash rank
    (plotThisGridAgainstAnotherGrid subsampling, baseGrid.py:992-1024,
    with a replayable rank instead of np.random.shuffle).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from rgr_pdal_topo_spark.grid import GridSpec

# ---------------------------------------------------------------------------
# K7/J6: mosaic
# ---------------------------------------------------------------------------


def mosaic(
    tiles: list[DataFrame], mode: str = "average"
) -> DataFrame:
    """Merge overlapping tile DEMs (long form, (cell_row, cell_col,
    value)).  mode='average' mean-blends overlaps (GDAL resampleAlg=
    'average'); mode='first' keeps the earliest source (list order =
    priority, GDAL default mosaic rule)."""
    tagged = [
        t.select("cell_row", "cell_col", "value").withColumn(
            "src_id", F.lit(i)
        )
        for i, t in enumerate(tiles)
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    if mode == "average":
        return u.groupBy("cell_row", "cell_col").agg(
            F.avg("value").alias("value"), F.count(F.lit(1)).alias("n_src")
        )
    if mode == "first":
        w = Window.partitionBy("cell_row", "cell_col").orderBy("src_id")
        return (
            u.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("cell_row", "cell_col", "value", "src_id",
                    F.lit(1).alias("n_src"))
        )
    raise ValueError(mode)


# ---------------------------------------------------------------------------
# K7: resample between grids
# ---------------------------------------------------------------------------


def resample(
    grid_df: DataFrame, src: GridSpec, dst: GridSpec, mode: str = "near"
) -> DataFrame:
    """Regrid a long-form raster from src to dst geometry (the xRes/yRes +
    resampleAlg leg of merge_warp_dems).  Modes: near | average | bilinear.
    """
    spark = grid_df.sparkSession
    if mode == "average":
        # mean of source-cell centers falling inside each dest cell
        cx = src.cell_cx(F.col("cell_col"))
        cy = src.cell_cy(F.col("cell_row"))
        return (
            grid_df.withColumn("d_row", dst.row_of(cy))
            .withColumn("d_col", dst.col_of(cx))
            .filter(
                (F.col("d_row") >= 0) & (F.col("d_row") < dst.nrows)
                & (F.col("d_col") >= 0) & (F.col("d_col") < dst.ncols)
            )
            .groupBy(
                F.col("d_row").alias("cell_row"),
                F.col("d_col").alias("cell_col"),
            )
            .agg(F.avg("value").alias("value"), F.count(F.lit(1)).alias("n"))
        )

    # dest-driven modes need the dest cell universe
    dcells = (
        spark.range(dst.nrows * dst.ncols)
        .select(
            (F.col("id") / dst.ncols).cast("int").alias("cell_row"),
            F.pmod(F.col("id"), F.lit(dst.ncols)).cast("int").alias("cell_col"),
        )
        .withColumn("dx_", dst.cell_cx(F.col("cell_col")))
        .withColumn("dy_", dst.cell_cy(F.col("cell_row")))
    )
    if mode == "near":
        src_keyed = grid_df.select(
            F.col("cell_row").alias("s_row"),
            F.col("cell_col").alias("s_col"),
            "value",
        )
        return (
            dcells.withColumn("s_row", src.row_of(F.col("dy_")))
            .withColumn("s_col", src.col_of(F.col("dx_")))
            .join(src_keyed, ["s_row", "s_col"])
            .select("cell_row", "cell_col", "value")
        )
    if mode == "bilinear":
        # fractional position of the dest center in source cell space
        fx = (F.col("dx_") - F.lit(src.x0)) / F.lit(src.cell) - 0.5
        fy = (
            F.lit(float(src.nrows - 1))
            - ((F.col("dy_") - F.lit(src.y0)) / F.lit(src.cell) - 0.5)
        )
        d = (
            dcells.withColumn("gx", fx)
            .withColumn("gy", fy)
            .withColumn("c0", F.floor("gx").cast("int"))
            .withColumn("r0", F.floor("gy").cast("int"))
            .withColumn("wx", F.col("gx") - F.col("c0"))
            .withColumn("wy", F.col("gy") - F.col("r0"))
        )
        offs = spark.createDataFrame(
            [(0, 0), (0, 1), (1, 0), (1, 1)], "dr int, dc int"
        )
        src_keyed = grid_df.select(
            F.col("cell_row").alias("s_row"),
            F.col("cell_col").alias("s_col"),
            "value",
        )
        corners = (
            d.crossJoin(F.broadcast(offs))
            .withColumn("s_row", F.col("r0") + F.col("dr"))
            .withColumn("s_col", F.col("c0") + F.col("dc"))
            .join(src_keyed, ["s_row", "s_col"])
            .withColumn(
                "w",
                (
                    F.when(F.col("dr") == 0, 1.0 - F.col("wy")).otherwise(
                        F.col("wy")
                    )
                )
                * (
                    F.when(F.col("dc") == 0, 1.0 - F.col("wx")).otherwise(
                        F.col("wx")
                    )
                ),
            )
        )
        return (
            corners.groupBy("cell_row", "cell_col")
            .agg(
                (F.sum(F.col("w") * F.col("value")) / F.sum("w")).alias(
                    "value"
                ),
                F.count(F.lit(1)).alias("n"),
            )
            .filter(F.col("n") == 4)  # all four corners present
            .drop("n")
        )
    raise ValueError(mode)


# ---------------------------------------------------------------------------
# F5: reprojection (vectorized pandas UDF; public spherical-mercator math)
# ---------------------------------------------------------------------------

_R_MAJOR = 6378137.0


@pandas_udf(DoubleType())
def lonlat_to_mercator_x(lon: pd.Series) -> pd.Series:
    return _R_MAJOR * np.radians(lon)


@pandas_udf(DoubleType())
def lonlat_to_mercator_y(lat: pd.Series) -> pd.Series:
    return _R_MAJOR * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))


def reproject_4326_to_3857(
    df: DataFrame, lon_col: str = "lon", lat_col: str = "lat"
) -> DataFrame:
    """filters.reprojection analogue (pointCloudCreation.py:250-255):
    Arrow-batched vectorized transform, no per-row Python."""
    return df.withColumn(
        "merc_x", lonlat_to_mercator_x(F.col(lon_col))
    ).withColumn("merc_y", lonlat_to_mercator_y(F.col(lat_col)))


# ---------------------------------------------------------------------------
# A7: radial (length x theta) histogram with wrap-around theta windows
# ---------------------------------------------------------------------------


def radial_histogram(
    grid_df: DataFrame,
    grid: GridSpec,
    n_length_bins: int = 5,
    max_length: float | None = None,
    theta_mids: list[float] | None = None,
    theta_win: float = math.pi / 8.0,
) -> DataFrame:
    """_radialLengthThetaHistogram (randomGrids.py:572-606): counts of
    cells per (length bin x theta window) around the grid center, theta
    windows wrapping at +/-pi.  Windows may overlap, as in the reference
    (each (bin, mid) pair is counted independently)."""
    spark = grid_df.sparkSession
    if max_length is None:
        max_length = grid.cell * max(grid.nrows, grid.ncols) / 2.0
    if theta_mids is None:
        theta_mids = [-math.pi + (k + 0.5) * math.pi / 4.0 for k in range(8)]
    cx0 = grid.x0 + grid.ncols * grid.cell / 2.0
    cy0 = grid.y0 + grid.nrows * grid.cell / 2.0
    lw = max_length / n_length_bins

    base = (
        grid_df.withColumn("px", grid.cell_cx(F.col("cell_col")) - cx0)
        .withColumn("py", grid.cell_cy(F.col("cell_row")) - cy0)
        .withColumn("length", F.sqrt(F.col("px") ** 2 + F.col("py") ** 2))
        .withColumn("theta", F.atan2(F.col("py"), F.col("px")))
        .withColumn(
            "l_bin", F.floor(F.col("length") / F.lit(lw)).cast("int")
        )
        .filter(F.col("l_bin") < n_length_bins)
    )
    mids = spark.createDataFrame(
        [(j, m) for j, m in enumerate(theta_mids)], "t_bin int, t_mid double"
    )
    lo = F.col("t_mid") - theta_win
    hi = F.col("t_mid") + theta_win
    # wrap: if the window crosses +/-pi the predicate becomes a disjunction
    in_win = (
        F.when(lo < -math.pi,
               (F.col("theta") >= lo + 2 * math.pi) | (F.col("theta") < hi))
        .when(hi > math.pi,
              (F.col("theta") >= lo) | (F.col("theta") < hi - 2 * math.pi))
        .otherwise((F.col("theta") >= lo) & (F.col("theta") < hi))
    )
    return (
        base.crossJoin(F.broadcast(mids))
        .filter(in_win)
        .groupBy("l_bin", "t_bin")
        .agg(F.count(F.lit(1)).alias("n_cells"))
    )


# ---------------------------------------------------------------------------
# F16/O6: stratified subsample with a replayable rank
# ---------------------------------------------------------------------------


def stratified_sample(
    df: DataFrame, bin_col: str, key_col: str, n_per_bin: int
) -> DataFrame:
    """Per-bin top-n under a deterministic integer hash of the key —
    the engine's replayable analogue of rand()-ranked subsampling
    (baseGrid.py:992-1024); same hash runs in the DuckDB oracle."""
    rank_key = F.pmod(
        F.col(key_col).cast("long") * F.lit(2654435761), F.lit(1000000007)
    )
    w = Window.partitionBy(bin_col).orderBy(rank_key, F.col(key_col))
    return df.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= n_per_bin
    ).drop("rn")
