"""points2grid-style gridding: the reference's ``writers.gdal`` sink (A1-A3).

Reference semantics (pointCloudCreation.py:301-324, :311-322):
  * points binned to cells of ``resolution`` metres;
  * ``output_type: "idw"``: inverse-distance-squared weighted mean of the
    points in a cell, distances measured to the CELL CENTER;
  * ``output_type: "mean"/"count"/"min"/"max"``: plain per-cell aggregates;
  * ``window_size: 6``: cells left empty get filled from already-computed
    neighbor CELL values within a square search window of up-to-6-cell
    radius, IDW-weighted by center-to-center distance (points2grid
    densification; PDAL writers.gdal window_size).

Spark shape: one hash aggregation (map-side partial + final) on the cell id —
the canonical scalable groupBy.  The fallback is a second, much smaller join:
empty cells x (<=13x13) neighbor offsets -> filled cells -> one more agg.

Skew (north_rule): a web-scale payload can hash astronomically many records
to one cell.  ``grid_points(..., salt=N)`` runs the same aggregate as an
explicit two-phase (salted) aggregation: partial sums per (cell, salt) then
final per cell.  Results are identical because all aggregates used are
algebraic (sum/count/min/max decompose exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rgr_pdal_topo_spark.grid import GridSpec

#: guards 1/d^2 when a point lies exactly on a cell center; value chosen so
#: it never affects the 6-decimal rounded outputs for off-center points.
IDW_EPS = 1e-12


def with_cell(df: DataFrame, grid: GridSpec) -> DataFrame:
    """Attach (cell_row, cell_col) — relational getRowColFromXY
    (baseGrid.py:656-668)."""
    return df.withColumn("cell_col", grid.col_of(F.col("x"))).withColumn(
        "cell_row", grid.row_of(F.col("y"))
    )


def _idw_weight(grid: GridSpec) -> Column:
    dx = F.col("x") - grid.cell_cx(F.col("cell_col"))
    dy = F.col("y") - grid.cell_cy(F.col("cell_row"))
    return F.lit(1.0) / (dx * dx + dy * dy + F.lit(IDW_EPS))


def grid_points(
    points: DataFrame,
    grid: GridSpec,
    value_col: str = "z",
    output_type: str = "idw",
    salt: int = 0,
) -> DataFrame:
    """Aggregate points into a long-form grid DF
    (cell_row, cell_col, value, n).

    ``salt > 0`` forces an explicit two-phase aggregation over a salt key
    derived from the point id — the dense-cell skew strategy required by the
    north_rule (AQE skew handling remains on as backstop).
    """
    pts = with_cell(points, grid)
    v = F.col(value_col)
    if output_type == "idw":
        w = _idw_weight(grid)
        partials = {
            "swv": F.sum(w * v),
            "sw": F.sum(w),
            "n": F.count(F.lit(1)),
        }
        final = (F.col("swv") / F.col("sw")).alias("value")
    elif output_type == "mean":
        partials = {"sv": F.sum(v), "n": F.count(F.lit(1))}
        final = (F.col("sv") / F.col("n")).alias("value")
    elif output_type == "count":
        partials = {"n": F.count(F.lit(1))}
        final = F.col("n").cast("double").alias("value")
    elif output_type in ("min", "max"):
        agg = F.min(v) if output_type == "min" else F.max(v)
        partials = {"mv": agg, "n": F.count(F.lit(1))}
        final = F.col("mv").alias("value")
    else:
        raise ValueError(f"unknown output_type {output_type!r}")

    if salt > 0:
        salted = pts.withColumn("_salt", F.pmod(F.col("pid"), F.lit(salt)))
        phase1 = salted.groupBy("cell_row", "cell_col", "_salt").agg(
            *[c.alias(k) for k, c in partials.items()]
        )
        # re-combine partials: sums add, counts add, min/max re-min/max
        recomb = []
        for k in partials:
            if k in ("swv", "sw", "sv", "n"):
                recomb.append(F.sum(F.col(k)).alias(k))
            elif k == "mv":
                col = (
                    F.min(F.col(k)) if output_type == "min" else F.max(F.col(k))
                )
                recomb.append(col.alias(k))
        agged = phase1.groupBy("cell_row", "cell_col").agg(*recomb)
    else:
        agged = pts.groupBy("cell_row", "cell_col").agg(
            *[c.alias(k) for k, c in partials.items()]
        )

    return agged.select(
        "cell_row", "cell_col", final, F.col("n").alias("n")
    )


def all_cells(spark, grid: GridSpec) -> DataFrame:
    """Dense cell universe (nrows x ncols) — used to densify sparse grids."""
    return (
        spark.range(grid.nrows * grid.ncols)
        .selectExpr(
            f"CAST(id / {grid.ncols} AS INT) AS cell_row",
            f"CAST(id % {grid.ncols} AS INT) AS cell_col",
        )
    )


def densify(grid_df: DataFrame, grid: GridSpec) -> DataFrame:
    """Left-join the sparse grid onto the dense cell universe
    (value NULL = NoData, the relational NaN of baseGrid.py:856-858)."""
    spark = grid_df.sparkSession
    return (
        all_cells(spark, grid)
        .join(grid_df, ["cell_row", "cell_col"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    )


def neighbor_offsets(spark, radius: int, exclude_center: bool = True) -> DataFrame:
    """Square (2r+1)^2 offset table (dr, dc) — broadcast-sized."""
    off = spark.range(-radius, radius + 1).selectExpr("CAST(id AS INT) AS dr")
    off2 = spark.range(-radius, radius + 1).selectExpr("CAST(id AS INT) AS dc")
    out = off.crossJoin(off2)
    if exclude_center:
        out = out.filter("NOT (dr = 0 AND dc = 0)")
    return out


def fill_empty_cells(
    grid_df: DataFrame, grid: GridSpec, window_size: int = 6,
    checkpoint: bool = True,
) -> DataFrame:
    """points2grid window fallback (A3): fill empty cells from filled
    neighbor-cell values within Chebyshev radius ``window_size``, weighted
    by 1/center-distance^2 (pointCloudCreation.py:320 window_size=6).

    Returns the dense grid with columns (cell_row, cell_col, value, n,
    filled int) where filled=1 marks fallback-filled cells.

    checkpoint=True materializes the densified grid once before the
    three branches that reuse it (filled pass-through, neighbor join,
    unreachable anti-join) — Spark does not CSE common subplans, so the
    upstream gridding aggregation would otherwise run 4x.  Same caveat
    as cluster.kmeans_1d: localCheckpoint blocks are executor-local; on
    a real cluster prefer DISK persist / reliable checkpoint if the
    upstream pipeline is very expensive to replay.
    """
    spark = grid_df.sparkSession
    dense = densify(grid_df, grid)
    if checkpoint:
        dense = dense.localCheckpoint(eager=True)
    filled = dense.filter(F.col("value").isNotNull())
    empty = dense.filter(F.col("value").isNull()).select("cell_row", "cell_col")

    offs = neighbor_offsets(spark, window_size)
    # empty cell -> candidate neighbor coordinates -> join filled cells.
    cand = (
        empty.crossJoin(F.broadcast(offs))
        .withColumn("n_row", F.col("cell_row") + F.col("dr"))
        .withColumn("n_col", F.col("cell_col") + F.col("dc"))
        .filter(
            (F.col("n_row") >= 0)
            & (F.col("n_row") < grid.nrows)
            & (F.col("n_col") >= 0)
            & (F.col("n_col") < grid.ncols)
        )
    )
    cell = float(grid.cell)
    joined = cand.join(
        filled.select(
            F.col("cell_row").alias("n_row"),
            F.col("cell_col").alias("n_col"),
            F.col("value").alias("n_value"),
        ),
        ["n_row", "n_col"],
    )
    d2 = (
        (F.col("dr") * F.lit(cell)) * (F.col("dr") * F.lit(cell))
        + (F.col("dc") * F.lit(cell)) * (F.col("dc") * F.lit(cell))
    )
    w = F.lit(1.0) / d2
    fills = joined.groupBy("cell_row", "cell_col").agg(
        (F.sum(w * F.col("n_value")) / F.sum(w)).alias("value")
    )
    # empties with no filled neighbor in range stay as explicit NoData
    # rows so the result is the complete dense universe
    unreachable = (
        empty.join(fills.select("cell_row", "cell_col"),
                   ["cell_row", "cell_col"], "left_anti")
        .withColumn("value", F.lit(None).cast("double"))
    )
    return (
        filled.withColumn("filled", F.lit(0))
        .unionByName(
            fills.withColumn("n", F.lit(0).cast("long")).withColumn(
                "filled", F.lit(1)
            )
        )
        .unionByName(
            unreachable.withColumn("n", F.lit(0).cast("long")).withColumn(
                "filled", F.lit(0)
            )
        )
    )


def detect_max_cell_count(
    points: DataFrame, grid: GridSpec, fraction: float = 0.01,
    seed: int = 99,
) -> int:
    """Skew pre-pass: estimate the densest cell's row count from a seeded
    Bernoulli sample (one cheap partial agg over ~fraction of the data).
    At 10^12 rows a handful of H3 cells can hold billions of points
    (SURVEY.md §7 risk 4); this estimate decides the salting factor
    BEFORE the shuffle instead of discovering the straggler after it."""
    sampled = with_cell(points.sample(fraction=fraction, seed=seed), grid)
    row = (
        sampled.groupBy("cell_row", "cell_col")
        .count()
        .agg(F.max("count").alias("m"))
        .first()
    )
    m = row["m"] or 0
    return int(m / fraction)


def grid_points_auto(
    points: DataFrame,
    grid: GridSpec,
    value_col: str = "z",
    output_type: str = "idw",
    max_rows_per_task: int = 2_000_000,
    sample_fraction: float = 0.01,
) -> DataFrame:
    """grid_points with automatic dense-cell skew handling: a sampling
    pre-pass estimates the heaviest cell; if it exceeds the per-task
    budget the aggregation runs salted two-phase with
    salt = ceil(max_cell / budget) (capped at 64), else single-phase.
    The explicit spelling of the north_rule's "salted-repartition handling
    of dense-cell skew" (AQE remains on as backstop for joins)."""
    est = detect_max_cell_count(points, grid, sample_fraction)
    salt = 0
    if est > max_rows_per_task:
        salt = min(64, -(-est // max_rows_per_task))
    return grid_points(
        points, grid, value_col=value_col, output_type=output_type,
        salt=salt,
    )
