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

    Scale shape: the dest cell universe comes from spark.range (generated
    distributively, never collected or hand-broadcast), and the corner
    lookup is a pure equi-join on source cell ids — at test scale Spark
    broadcasts the small raster side (asserted in test_plan_shapes); when
    the raster grows with the data AQE falls back to a shuffle-hash join
    on the same keys, so no plan rewrite is needed at 100 TB.
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
# F5 (general): parameterized CRS registry — closed-form transforms keyed by
# (src_epsg, dst_epsg), matching reprojectXYPoints's arbitrary-EPSG surface
# (pointCloudCreation.py:134-153) for the projections the reference's
# workflows actually use (geographic -> web mercator / UTM).  Constants are
# computed once in Python and embedded as identical literals in the numpy
# path and the oracle SQL, and every power is spelled as explicit
# multiplication — the op SEQUENCE matches, but the two sides' trig
# libraries (numpy vs DuckDB libm) differ by ulps on some inputs, so
# outputs are only identical after the mm-level rounding the queries
# apply (empirically ~50 ulp-different raw doubles per 150k rows, zero
# after rounding; asserted by the parity sweep, not assumed).
# ---------------------------------------------------------------------------

_UTM_K0 = 0.9996
_UTM_F = 1.0 / 298.257223563  # WGS84 flattening
_UTM_E2 = _UTM_F * (2.0 - _UTM_F)
_UTM_EP2 = _UTM_E2 / (1.0 - _UTM_E2)
_UTM_M1 = 1.0 - _UTM_E2 / 4.0 - 3.0 * _UTM_E2**2 / 64.0 \
    - 5.0 * _UTM_E2**3 / 256.0
_UTM_M2 = 3.0 * _UTM_E2 / 8.0 + 3.0 * _UTM_E2**2 / 32.0 \
    + 45.0 * _UTM_E2**3 / 1024.0
_UTM_M3 = 15.0 * _UTM_E2**2 / 256.0 + 45.0 * _UTM_E2**3 / 1024.0
_UTM_M4 = 35.0 * _UTM_E2**3 / 3072.0


def utm_zone_epsg(zone: int, south: bool = False) -> int:
    return (32700 if south else 32600) + zone


def _utm_forward_np(lon: np.ndarray, lat: np.ndarray, zone: int,
                    south: bool) -> tuple[np.ndarray, np.ndarray]:
    """Redfearn-series Transverse Mercator forward (the standard UTM
    expansion, e.g. Snyder 1987 eq. 8-9..8-15), vectorized."""
    a, k0, e2, ep2 = _R_MAJOR, _UTM_K0, _UTM_E2, _UTM_EP2
    lam0 = math.radians(zone * 6.0 - 183.0)
    phi = np.radians(lat)
    lam = np.radians(lon)
    sinp = np.sin(phi)
    cosp = np.cos(phi)
    tanp = np.tan(phi)
    n = a / np.sqrt(1.0 - e2 * (sinp * sinp))
    t = tanp * tanp
    c = ep2 * (cosp * cosp)
    aa = (lam - lam0) * cosp
    a2 = aa * aa
    a3 = a2 * aa
    a4 = a2 * a2
    a5 = a4 * aa
    a6 = a4 * a2
    m = a * (_UTM_M1 * phi - _UTM_M2 * np.sin(2.0 * phi)
             + _UTM_M3 * np.sin(4.0 * phi) - _UTM_M4 * np.sin(6.0 * phi))
    x = k0 * (n * (aa + (1.0 - t + c) * a3 / 6.0
                   + (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * ep2)
                   * a5 / 120.0)) + 500000.0
    y = k0 * (m + n * tanp * (a2 / 2.0
                              + (5.0 - t + 9.0 * c + 4.0 * (c * c))
                              * a4 / 24.0
                              + (61.0 - 58.0 * t + t * t + 600.0 * c
                                 - 330.0 * ep2) * a6 / 720.0))
    if south:
        y = y + 10000000.0
    return x, y


def utm_forward_sql(lon_expr: str, lat_expr: str, zone: int,
                    south: bool = False) -> tuple[str, str]:
    """The series as SQL text (DuckDB oracle twin of _utm_forward_np;
    same literals and operation order — equal only up to trig-library
    ulps, see the section comment above)."""
    a, k0, e2, ep2 = _R_MAJOR, _UTM_K0, _UTM_E2, _UTM_EP2
    lam0 = math.radians(zone * 6.0 - 183.0)
    phi = f"RADIANS({lat_expr})"
    aa = f"((RADIANS({lon_expr}) - {lam0!r}) * COS({phi}))"
    t = f"(TAN({phi}) * TAN({phi}))"
    c = f"({ep2!r} * (COS({phi}) * COS({phi})))"
    n = f"({a!r} / SQRT(1.0 - {e2!r} * (SIN({phi}) * SIN({phi}))))"
    a2 = f"({aa} * {aa})"
    a3 = f"({a2} * {aa})"
    a4 = f"({a2} * {a2})"
    a5 = f"({a4} * {aa})"
    a6 = f"({a4} * {a2})"
    m = (f"({a!r} * ({_UTM_M1!r} * {phi} - {_UTM_M2!r} * SIN(2.0 * {phi}) "
         f"+ {_UTM_M3!r} * SIN(4.0 * {phi}) - {_UTM_M4!r} * "
         f"SIN(6.0 * {phi})))")
    x = (f"({k0!r} * ({n} * ({aa} + (1.0 - {t} + {c}) * {a3} / 6.0 "
         f"+ (5.0 - 18.0 * {t} + {t} * {t} + 72.0 * {c} - 58.0 * {ep2!r}) "
         f"* {a5} / 120.0)) + 500000.0)")
    y = (f"({k0!r} * ({m} + {n} * TAN({phi}) * ({a2} / 2.0 "
         f"+ (5.0 - {t} + 9.0 * {c} + 4.0 * ({c} * {c})) * {a4} / 24.0 "
         f"+ (61.0 - 58.0 * {t} + {t} * {t} + 600.0 * {c} "
         f"- 330.0 * {ep2!r}) * {a6} / 720.0)))")
    if south:
        y = f"({y} + 10000000.0)"
    return x, y


def reproject_points(
    df: DataFrame,
    src_epsg: int,
    dst_epsg: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    out_x: str = "proj_x",
    out_y: str = "proj_y",
) -> DataFrame:
    """General (src, dst) EPSG transform over a DataFrame — the engine's
    reprojectXYPoints.  Supported: 4326 identity, 4326->3857, and
    4326->UTM 326xx/327xx (closed-form series; a new pair is one registry
    entry).  Unknown pairs raise rather than silently passing through."""
    if src_epsg != 4326:
        raise NotImplementedError(
            f"source EPSG {src_epsg} not in registry (geographic sources "
            "only; reproject to 4326 upstream)"
        )
    if dst_epsg == 4326:
        return df.withColumn(out_x, F.col(lon_col).cast("double")) \
                 .withColumn(out_y, F.col(lat_col).cast("double"))
    if dst_epsg == 3857:
        return df.withColumn(
            out_x, lonlat_to_mercator_x(F.col(lon_col))
        ).withColumn(out_y, lonlat_to_mercator_y(F.col(lat_col)))
    if 32601 <= dst_epsg <= 32660 or 32701 <= dst_epsg <= 32760:
        south = dst_epsg > 32700
        zone = dst_epsg - (32700 if south else 32600)

        @pandas_udf("x double, y double")
        def _utm(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
            x, y = _utm_forward_np(
                lon.to_numpy(dtype="float64"),
                lat.to_numpy(dtype="float64"),
                zone, south,
            )
            return pd.DataFrame({"x": x, "y": y})

        proj = _utm(F.col(lon_col), F.col(lat_col))
        return df.withColumn("__p", proj) \
                 .withColumn(out_x, F.col("__p.x")) \
                 .withColumn(out_y, F.col("__p.y")) \
                 .drop("__p")
    raise NotImplementedError(f"EPSG pair ({src_epsg}, {dst_epsg}) "
                              "not in registry")


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
    (baseGrid.py:992-1024); same hash runs in the DuckDB oracle.

    The key is reduced mod P BEFORE the multiply: (P-1) * 2654435761 <
    2^63, so the rank never overflows int64 in ANY engine — a raw
    key * A would wrap silently in Spark (ANSI off) but error/diverge
    elsewhere once keys pass ~3.5e9 (the 10^12-row regime)."""
    rank_key = F.pmod(
        F.pmod(F.col(key_col).cast("long"), F.lit(1000000007))
        * F.lit(2654435761),
        F.lit(1000000007),
    )
    w = Window.partitionBy(bin_col).orderBy(rank_key, F.col(key_col))
    return df.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= n_per_bin
    ).drop("rn")


def contour_cases(grid: DataFrame, levels: tuple[int, ...]) -> DataFrame:
    """(level, mcase, n_cells): marching-squares case histogram — for
    every complete 2x2 block of the grid and every contour level, the
    4-bit case index ``8*(v00>L) + 4*(v01>L) + 2*(v11>L) + (v10>L)``
    (corners clockwise from top-left, the standard marching-squares
    numbering), counting the non-trivial cases 1..14.  The histogram is
    the contour-extraction workload's shape: each case maps to a fixed
    segment stencil, so n_cells per case IS the segment census an
    isoline pass would emit.

    Exactness: comparisons run on the Q20-pinned mean-DEM values
    (bit-equal across engines by the GRID_MEAN_CTE contract) against
    integer level literals — no float arithmetic at all, so counts are
    exact.

    Scale shape — NO self-joins: a naive 2x2 assembly is three
    equi-joins of the grid against shifted copies of ITSELF, and Spark
    plans that as four independent scans + aggregations of the source
    (the shifted projections differ, so ReuseExchange never fires —
    measured: 4 FileScans, 8 HashAggregates, 0 reuse).  Instead each
    cell REPLICATES to the <= 4 blocks it is a corner of (the
    pip_join_partitioned cover-cell doctrine), and one groupBy on the
    block key folds the corners back with max-over-tag; complete blocks
    are exactly those with corner count 4.  One scan, one grid shuffle,
    one block shuffle.  The level fan-out explodes AFTER the quad
    assembly so it runs once, not K times; the final agg combines
    map-side onto at most K x 14 rows.  Blocks with any absent corner
    fail the nc = 4 gate (documented: sparse borders undercount vs a
    dense raster)."""
    g = grid.select("cell_row", "cell_col", "value")
    offsets = [(0, 0, 0), (0, -1, 1), (-1, 0, 2), (-1, -1, 3)]
    fan = g.select(
        "cell_row",
        "cell_col",
        "value",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(dr).alias("dr"),
                        F.lit(dc).alias("dc"),
                        F.lit(tag).alias("tag"),
                    )
                    for dr, dc, tag in offsets
                ]
            )
        ).alias("o"),
    )
    corners = fan.select(
        (F.col("cell_row") + F.col("o.dr")).alias("cell_row"),
        (F.col("cell_col") + F.col("o.dc")).alias("cell_col"),
        F.col("o.tag").alias("tag"),
        "value",
    )

    def _corner(tag: int):
        return F.max(F.when(F.col("tag") == tag, F.col("value")))

    block = (
        corners.groupBy("cell_row", "cell_col")
        .agg(
            F.count(F.lit(1)).alias("nc"),
            _corner(0).alias("v00"),
            _corner(1).alias("v01"),
            _corner(2).alias("v10"),
            _corner(3).alias("v11"),
        )
        .filter(F.col("nc") == 4)
    )
    fan = block.select(
        "v00",
        "v01",
        "v10",
        "v11",
        F.explode(F.array(*[F.lit(int(l)) for l in levels])).alias("level"),
    )

    def _bit(c: str):
        return F.when(F.col(c) > F.col("level"), F.lit(1)).otherwise(
            F.lit(0)
        )

    cases = fan.select(
        F.col("level").cast("long").alias("level"),
        (
            _bit("v00") * 8 + _bit("v01") * 4 + _bit("v11") * 2 + _bit("v10")
        ).cast("long").alias("mcase"),
    )
    return (
        cases.filter((F.col("mcase") > 0) & (F.col("mcase") < 15))
        .groupBy("level", "mcase")
        .agg(F.count(F.lit(1)).alias("n_cells"))
    )


# ---------------------------------------------------------------------------
# geomorphons: 10-class landform classification (engine addition)
# ---------------------------------------------------------------------------

#: D8 direction unit offsets, kernel order (N, NE, E, SE, S, SW, W, NW).
_GM_DIRS = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1),
            (-1, -1)]

#: Geomorphon form matrix (after Jasiewicz & Stepinski 2013, Fig. 4 —
#: the r.geomorphon lookup), indexed [n_lo][n_hi]: n_hi = directions
#: whose steepest line-of-sight slope RISES past the flatness angle
#: (terrain above), n_lo = falls below it.  All 8 above -> the cell is
#: a depression; all 8 below -> a summit; 3/3 -> mid-slope.  Cells with
#: n_lo + n_hi > 8 are impossible and absent.
_GM_FORMS = {
    (0, 0): "flat", (0, 1): "flat", (0, 2): "flat", (0, 3): "footslope",
    (0, 4): "footslope", (0, 5): "valley", (0, 6): "valley",
    (0, 7): "valley", (0, 8): "depression",
    (1, 0): "flat", (1, 1): "flat", (1, 2): "footslope",
    (1, 3): "footslope", (1, 4): "footslope", (1, 5): "valley",
    (1, 6): "valley", (1, 7): "valley",
    (2, 0): "flat", (2, 1): "shoulder", (2, 2): "slope", (2, 3): "slope",
    (2, 4): "hollow", (2, 5): "hollow", (2, 6): "valley",
    (3, 0): "shoulder", (3, 1): "shoulder", (3, 2): "slope",
    (3, 3): "slope", (3, 4): "slope", (3, 5): "hollow",
    (4, 0): "shoulder", (4, 1): "shoulder", (4, 2): "slope",
    (4, 3): "slope", (4, 4): "slope",
    (5, 0): "ridge", (5, 1): "ridge", (5, 2): "spur", (5, 3): "slope",
    (6, 0): "ridge", (6, 1): "ridge", (6, 2): "ridge",
    (7, 0): "ridge", (7, 1): "ridge",
    (8, 0): "summit",
}


def geomorphon_case_sql(n_lo: str = "n_lo", n_hi: str = "n_hi") -> str:
    """The form-matrix lookup as ONE portable CASE spelling (engine via
    F.expr, oracle verbatim), keyed on n_lo * 9 + n_hi."""
    whens = " ".join(
        f"WHEN {lo * 9 + hi} THEN '{name}'"
        for (lo, hi), name in sorted(_GM_FORMS.items())
    )
    return f"CASE {n_lo} * 9 + {n_hi} {whens} END"


def geomorphons(
    zgrid: DataFrame, t_flat: int, lookup: int = 5
) -> DataFrame:
    """Geomorphons (Jasiewicz & Stepinski 2013): classify every DEM
    cell into one of 10 landform classes from the ternary
    rises/flat/falls pattern of its 8 directional horizons — the
    modern landform-mapping pass the reference's fixed stencil kernels
    (slope/TPI/curvature, dem.py:176-224) stop short of.

    zgrid: (cell_row, cell_col, zq) with zq the INTEGER-quantized
    elevation (the caller owns the quantization spelling).  Per
    direction d the horizon is the steepest slope to any cell within
    ``lookup`` steps: max_k (zq_k - zq_0) / k.  The ratio comparison is
    made integer-exact by the LCM trick — the slope key is
    s = (zq_k - zq_0) * (lcm(1..lookup) / k), an exact BIGINT monotone
    in the true ratio — so horizons, the ternary split at ``t_flat``
    (same s units), and the (n_lo, n_hi) counts carry no float anywhere.
    Ternary rule per direction: +1 if smax > t and smax > -smin, -1 if
    smin < -t and -smin > smax, else 0 (both-sides-exceed ties fall to
    0).  Distance is measured in STEPS for all 8 directions (the
    diagonal sqrt(2) is deliberately dropped — an irrational distance
    would poison integer exactness; documented metric choice, same
    doctrine as hexcells' planar lattice).  Directions truncated by the
    grid edge simply contribute fewer candidate cells; isolated cells
    (no in-grid neighbour at any offset) are unclassifiable and absent.

    Scale shape: the (dir, step) fan-out is ONE inline explode of
    8 * lookup offsets over the AGGREGATED cell table (the
    semivariogram lag-census pattern — no 40-branch union, no band
    join), one equi-join on the exact target key, and two
    partial+final groupBys.  At raster scale the same candidates fall
    out of the stencil engine's halo replication; the census here stays
    a narrow (int, int, int64) join either way."""
    lcm = math.lcm(*range(1, lookup + 1))
    fan = zgrid.select(
        "cell_row",
        "cell_col",
        "zq",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("dir"),
                        F.lit(dr * k).alias("dr"),
                        F.lit(dc * k).alias("dc"),
                        F.lit(lcm // k).alias("m"),
                    )
                    for d, (dr, dc) in enumerate(_GM_DIRS)
                    for k in range(1, lookup + 1)
                ]
            )
        ).alias("o"),
    ).select(
        "cell_row",
        "cell_col",
        "zq",
        F.col("o.dir").alias("dir"),
        (F.col("cell_row") + F.col("o.dr")).alias("tr"),
        (F.col("cell_col") + F.col("o.dc")).alias("tc"),
        F.col("o.m").alias("m"),
    )
    nbr = zgrid.select(
        F.col("cell_row").alias("tr"),
        F.col("cell_col").alias("tc"),
        F.col("zq").alias("nzq"),
    )
    s = (F.col("nzq") - F.col("zq")) * F.col("m")
    dirs = (
        fan.join(nbr, ["tr", "tc"])
        .groupBy("cell_row", "cell_col", "dir")
        .agg(F.max(s).alias("smax"), F.min(s).alias("smin"))
    )
    t = F.lit(int(t_flat))
    v = (
        F.when(
            (F.col("smax") > t) & (F.col("smax") > -F.col("smin")), 1
        )
        .when(
            (F.col("smin") < -t) & (-F.col("smin") > F.col("smax")), -1
        )
        .otherwise(0)
    )
    return (
        dirs.select("cell_row", "cell_col", v.alias("v"))
        .groupBy("cell_row", "cell_col")
        .agg(
            F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).alias("n_hi"),
            F.sum(F.when(F.col("v") == -1, 1).otherwise(0)).alias("n_lo"),
        )
        .withColumn("landform", F.expr(geomorphon_case_sql()))
    )
