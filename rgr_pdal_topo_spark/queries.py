"""Driver-facing query registry: one entry per implemented operator
(SURVEY.md §2), each with a DuckDB-oracle SQL equivalent.

Spark side = engine operators (operators/*, synth.py); oracle side = ANSI
SQL over the same parquet views.  Float aggregates are rounded identically
on both sides (sum order is engine-dependent; everything else in the
pipeline is bit-exact by construction — see synth.py).

Naming contract: every computed column is aliased identically in the Spark
plan and the oracle SQL (the driver sorts columns by name and value-hashes).
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rgr_pdal_topo_spark import synth
from rgr_pdal_topo_spark.grid import DEFAULT_GRID as G
from rgr_pdal_topo_spark.operators import dedup, gridding, joins, similarity, textstats
from rgr_pdal_topo_spark.sources.tables import register_views
from rgr_pdal_topo_spark.synth import (
    gps_df,
    gps_sql,
    points_df,
    points_sql,
    polygons_df,
    polygons_sql,
    segments_values_sql,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# shared SQL fragments
# ---------------------------------------------------------------------------

PTS = points_sql()  # identical text runs in both engines
ROW_OF = G.sql_row_of("y")
COL_OF = G.sql_col_of("x")
CELLS = (
    f"SELECT pid, x, y, z, cls, intensity, {ROW_OF} AS cell_row, "
    f"{COL_OF} AS cell_col FROM pts"
)
_CX = G.sql_cell_cx("cell_col")
_CY = G.sql_cell_cy("cell_row")
_W = f"(1.0 / ((x - {_CX}) * (x - {_CX}) + (y - {_CY}) * (y - {_CY}) + 1e-12))"

GRID_MEAN_CTE = (
    "SELECT cell_row, cell_col, SUM(z) / COUNT(*) AS value, COUNT(*) AS n "
    "FROM cells GROUP BY cell_row, cell_col"
)
GRID_IDW_CTE = (
    f"SELECT cell_row, cell_col, SUM({_W} * z) / SUM({_W}) AS value, "
    "COUNT(*) AS n FROM cells GROUP BY cell_row, cell_col"
)
GRID_IDW_GROUND_CTE = (
    f"SELECT cell_row, cell_col, SUM({_W} * z) / SUM({_W}) AS value, "
    "COUNT(*) AS n FROM cells WHERE cls = 2 GROUP BY cell_row, cell_col"
)


def _with(*ctes: str) -> str:
    return "WITH " + ", ".join(ctes) + " "


_BASE = _with(f"pts AS ({PTS})", f"cells AS ({CELLS})")


# ---------------------------------------------------------------------------
# S/F: scans, projections, filters
# ---------------------------------------------------------------------------


@query(
    "points_extract",
    f"SELECT * FROM ({PTS}) p",
)
def q_points_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13/S1: deterministic coordinate extraction from the page table —
    all JVM-side column arithmetic (no UDF)."""
    return points_df(spark, sf_dir)


@query(
    "filter_noise",
    f"SELECT pid, x, y, z, cls FROM ({PTS}) p WHERE cls <> 7",
)
def q_filter_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: Classification![7:7] anti-predicate
    (pointCloudCreation.py:184-188)."""
    return points_df(spark, sf_dir).filter("cls <> 7").select(
        "pid", "x", "y", "z", "cls"
    )


@query(
    "grid_extent",
    _BASE
    + "SELECT MIN(x) AS minx, MAX(x) AS maxx, MIN(y) AS miny, MAX(y) AS maxy, "
    "COUNT(*) AS n FROM cells",
)
def q_grid_extent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15: getGridExtent (baseGrid.py:691-699)."""
    return points_df(spark, sf_dir).agg(
        F.min("x").alias("minx"),
        F.max("x").alias("maxx"),
        F.min("y").alias("miny"),
        F.max("y").alias("maxy"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# A1-A4: gridding + stats
# ---------------------------------------------------------------------------


@query(
    "grid_mean",
    _BASE
    + "SELECT cell_row, cell_col, ROUND(value, 6) AS value, n FROM "
    f"({GRID_MEAN_CTE}) g",
)
def q_grid_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-cell mean gridding (writers.gdal output_type=mean)."""
    g = gridding.grid_points(points_df(spark, sf_dir), G, output_type="mean")
    return g.select(
        "cell_row", "cell_col", F.round("value", 6).alias("value"), "n"
    )


@query(
    "grid_count",
    _BASE
    + "SELECT cell_row, cell_col, CAST(COUNT(*) AS DOUBLE) AS value, "
    "COUNT(*) AS n FROM cells GROUP BY cell_row, cell_col",
)
def q_grid_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-cell count gridding."""
    return gridding.grid_points(points_df(spark, sf_dir), G, output_type="count")


@query(
    "grid_idw",
    _BASE
    + "SELECT cell_row, cell_col, ROUND(value, 6) AS value, n FROM "
    f"({GRID_IDW_CTE}) g",
)
def q_grid_idw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-cell IDW gridding, w=1/d^2 to cell center
    (points2grid core, pointCloudCreation.py:311-322)."""
    g = gridding.grid_points(points_df(spark, sf_dir), G, output_type="idw")
    return g.select(
        "cell_row", "cell_col", F.round("value", 6).alias("value"), "n"
    )


@query(
    "grid_stats",
    _BASE
    + f"SELECT ROUND(AVG(value), 4) AS mean_z, ROUND(MIN(value), 4) AS min_z, "
    f"ROUND(MAX(value), 4) AS max_z, ROUND(STDDEV(value), 4) AS std_z, "
    f"ROUND(QUANTILE_CONT(value, 0.5), 4) AS median_z, "
    f"ROUND(ROUND(MAX(value), 4) - ROUND(MIN(value), 4), 4) AS relief, COUNT(*) AS n_cells "
    f"FROM ({GRID_MEAN_CTE}) g",
)
def q_grid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: NaN-aware global grid statistics incl. relief = max - min
    (baseGrid.py:544-609)."""
    g = gridding.grid_points(points_df(spark, sf_dir), G, output_type="mean")
    return g.agg(
        F.round(F.avg("value"), 4).alias("mean_z"),
        F.round(F.min("value"), 4).alias("min_z"),
        F.round(F.max("value"), 4).alias("max_z"),
        F.round(F.stddev("value"), 4).alias("std_z"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("median_z"),
        F.round(
            F.round(F.max("value"), 4) - F.round(F.min("value"), 4), 4
        ).alias("relief"),
        F.count(F.lit(1)).alias("n_cells"),
    )


@query(
    "binned_intensity",
    _BASE
    + "SELECT CAST(FLOOR((z - 100.0) / 5.0) AS INT) AS z_bucket, "
    "COUNT(*) AS n, "
    "ROUND(QUANTILE_CONT(intensity, 0.025), 6) AS p025, "
    "ROUND(QUANTILE_CONT(intensity, 0.5), 6) AS median_i, "
    "ROUND(QUANTILE_CONT(intensity, 0.975), 6) AS p975 "
    "FROM cells GROUP BY CAST(FLOOR((z - 100.0) / 5.0) AS INT)",
)
def q_binned_intensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: binned median + [2.5, 97.5] percentile envelope
    (calcMedianValuesBinnedByAnotherGrid, baseGrid.py:868-893)."""
    pts = points_df(spark, sf_dir)
    return (
        pts.withColumn(
            "z_bucket",
            F.floor((F.col("z") - F.lit(100.0)) / F.lit(5.0)).cast("int"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(intensity, 0.025)"), 6).alias("p025"),
            F.round(F.expr("percentile(intensity, 0.5)"), 6).alias("median_i"),
            F.round(F.expr("percentile(intensity, 0.975)"), 6).alias("p975"),
        )
    )


# ---------------------------------------------------------------------------
# J1: point-in-polygon
# ---------------------------------------------------------------------------

_POLY = polygons_sql()


@query(
    "pip_pairs",
    _with(f"pts AS ({PTS})", f"poly AS ({_POLY})")
    + "SELECT p.pid, g.polygon_id FROM pts p JOIN poly g ON "
    "p.x >= g.xmin AND p.x < g.xmin + g.width AND "
    "p.y >= g.ymin AND p.y < g.ymin + g.height",
)
def q_pip_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: point-in-polygon containment pairs (broadcast range join)."""
    return joins.pip_join_rect(
        points_df(spark, sf_dir), polygons_df(spark, sf_dir)
    ).select("pid", "polygon_id")


@query(
    "pip_stats",
    _with(f"pts AS ({PTS})", f"poly AS ({_POLY})")
    + "SELECT g.polygon_id, g.unit, COUNT(*) AS n_points, "
    "ROUND(SUM(p.z) / COUNT(*), 6) AS mean_z FROM pts p JOIN poly g ON "
    "p.x >= g.xmin AND p.x < g.xmin + g.width AND "
    "p.y >= g.ymin AND p.y < g.ymin + g.height "
    "GROUP BY g.polygon_id, g.unit",
)
def q_pip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+A: per-unit point counts and mean elevation (the ClusterScarp /
    FanRoughness per-map-unit statistics pattern)."""
    j = joins.pip_join_rect(points_df(spark, sf_dir), polygons_df(spark, sf_dir))
    return j.groupBy("polygon_id", "unit").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum("z") / F.count(F.lit(1)), 6).alias("mean_z"),
    )


# ---------------------------------------------------------------------------
# J4: kNN
# ---------------------------------------------------------------------------


@query(
    "knn_gps",
    _with(f"pts AS ({PTS})", f"gps AS ({gps_sql()})")
    + "SELECT gps_id, pid AS nn_pid, ROUND(SQRT(dist2), 6) AS nn_dist, "
    "ROUND(CASE WHEN SQRT(dist2) > 100.0 THEN -9999.0 ELSE z END, 6) AS nn_value "
    "FROM (SELECT g.gps_id, p.pid, p.z, "
    "(p.x - g.gx) * (p.x - g.gx) + (p.y - g.gy) * (p.y - g.gy) AS dist2, "
    "ROW_NUMBER() OVER (PARTITION BY g.gps_id ORDER BY "
    "(p.x - g.gx) * (p.x - g.gx) + (p.y - g.gy) * (p.y - g.gy) ASC, p.pid ASC) "
    "AS rn FROM pts p CROSS JOIN gps g) q WHERE rn = 1",
)
def q_knn_gps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: nearest-neighbor (k=1) with maxDist sentinel
    (networkGraph.py:688-741)."""
    out = joins.knn_join_broadcast(
        points_df(spark, sf_dir), gps_df(spark, sf_dir), max_dist=100.0
    )
    return out.select(
        "gps_id",
        F.col("pid").alias("nn_pid"),
        F.round("nn_dist", 6).alias("nn_dist"),
        F.round("nn_value", 6).alias("nn_value"),
    )


# ---------------------------------------------------------------------------
# J2/F4: profile projection + swath
# ---------------------------------------------------------------------------

_SEGS = segments_values_sql()
_PROJ_CTE = (
    "SELECT p.pid, s.profile_id, s.seg_idx, s.x1, s.y1, s.x2, s.y2, s.l_start, "
    "((p.x - s.x1) * (s.x2 - s.x1) + (p.y - s.y1) * (s.y2 - s.y1)) / s.l2 AS t, "
    "p.x, p.y FROM pts p CROSS JOIN seg s"
)
_PROJ_VALID = (
    "SELECT pid, profile_id, seg_idx, l_start, x, y, "
    "x1 + t * (x2 - x1) AS projx, y1 + t * (y2 - y1) AS projy, x1, y1 "
    "FROM cand WHERE t >= 0 AND t <= 1"
)
_PROJ_DL = (
    "SELECT pid, profile_id, seg_idx, "
    "SQRT((projx - x) * (projx - x) + (projy - y) * (projy - y)) AS d, "
    "l_start + SQRT((projx - x1) * (projx - x1) + (projy - y1) * (projy - y1)) "
    "AS l, ROW_NUMBER() OVER (PARTITION BY pid, profile_id ORDER BY seg_idx) "
    "AS rn FROM valid"
)


@query(
    "profile_extract",
    _with(
        f"pts AS ({PTS})",
        f"seg AS ({_SEGS})",
        f"cand AS ({_PROJ_CTE})",
        f"valid AS ({_PROJ_VALID})",
        f"proj AS ({_PROJ_DL})",
    )
    + "SELECT pid, profile_id, seg_idx, ROUND(d, 6) AS d, ROUND(l, 6) AS l "
    "FROM proj WHERE rn = 1",
)
def q_profile_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: first-segment-wins point->polyline projection with (d, l)
    outputs (projectPointsOntoLine, pointCloudCreation.py:41-94)."""
    out = joins.profile_project(points_df(spark, sf_dir))
    return out.select(
        "pid",
        "profile_id",
        "seg_idx",
        F.round("d", 6).alias("d"),
        F.round("l", 6).alias("l"),
    )


@query(
    "swath_profile",
    _with(
        f"pts AS ({PTS})",
        f"seg AS ({_SEGS})",
        f"cand AS ({_PROJ_CTE})",
        f"valid AS ({_PROJ_VALID})",
        f"proj AS ({_PROJ_DL})",
        "sw AS (SELECT * FROM (VALUES (0, CAST(50.0 AS DOUBLE)), "
        "(1, CAST(30.0 AS DOUBLE))) AS sw(profile_id, swath_width))",
    )
    + "SELECT p.pid, p.profile_id, ROUND(p.d, 6) AS d, ROUND(p.l, 6) AS l "
    "FROM proj p JOIN sw ON p.profile_id = sw.profile_id "
    "WHERE p.rn = 1 AND p.d <= sw.swath_width",
)
def q_swath_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+F4: swath trim d <= swath_width (filters.range D[0:w],
    pointCloudCreation.py:599-604)."""
    proj = joins.profile_project(points_df(spark, sf_dir))
    sw = spark.createDataFrame(
        [(p["profile_id"], p["swath_width"]) for p in synth.PROFILES],
        "profile_id int, swath_width double",
    )
    out = proj.join(F.broadcast(sw), "profile_id").filter(
        F.col("d") <= F.col("swath_width")
    )
    return out.select(
        "pid", "profile_id",
        F.round("d", 6).alias("d"), F.round("l", 6).alias("l"),
    )


# ---------------------------------------------------------------------------
# J8/J5: HAG + grid residuals
# ---------------------------------------------------------------------------


@query(
    "hag",
    _BASE.rstrip()
    + f", ground AS ({GRID_IDW_GROUND_CTE}) "
    "SELECT c.pid, c.cell_row, c.cell_col, "
    "ROUND(c.z - g.value, 6) AS hag FROM cells c "
    "JOIN ground g ON c.cell_row = g.cell_row AND c.cell_col = g.cell_col "
    "WHERE c.cls <> 7",
)
def q_hag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/K3: height above IDW ground surface (filters.hag_dem,
    pointCloudCreation.py:419-424)."""
    pts = points_df(spark, sf_dir)
    ground = gridding.grid_points(pts.filter("cls = 2"), G, output_type="idw")
    out = joins.height_above_ground(pts.filter("cls <> 7"), ground, G)
    return out.filter(F.col("ground_z").isNotNull()).select(
        "pid", "cell_row", "cell_col", F.round("hag", 6).alias("hag")
    )


@query(
    "grid_residuals",
    _BASE.rstrip()
    + f", ga AS ({GRID_MEAN_CTE}), gb AS ({GRID_IDW_CTE}) "
    "SELECT ROUND(SUM((ga.value - gb.value) * (ga.value - gb.value)), 4) "
    "AS ssr, COUNT(*) AS n_cells FROM ga "
    "JOIN gb ON ga.cell_row = gb.cell_row AND ga.cell_col = gb.cell_col",
)
def q_grid_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: grid-vs-grid cellwise L2 residuals
    (sumSquaredResiduals, baseGrid.py:611-628)."""
    pts = points_df(spark, sf_dir)
    a = gridding.grid_points(pts, G, output_type="mean")
    b = gridding.grid_points(pts, G, output_type="idw")
    return joins.grid_residuals(a, b).select(
        F.round("ssr", 4).alias("ssr"), "n_cells"
    )


# ---------------------------------------------------------------------------
# relational / events (engine breadth: Catalyst agg + joins + windows)
# ---------------------------------------------------------------------------


def _shared_sql(name: str, sql: str, doc: str = ""):
    """Register a query whose Spark side runs the same SQL text over temp
    views — used where both dialects agree verbatim."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    fn.__doc__ = doc
    fn.__name__ = f"q_{name}"
    QUERIES[name] = fn
    ORACLES[name] = sql
    return fn


_shared_sql(
    "tpch_pricing",
    "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 4) AS sum_qty, "
    "ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price, "
    "ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_qty, COUNT(*) AS n "
    "FROM lineitem WHERE l_shipdate <= DATE '1998-09-02' "
    "GROUP BY l_returnflag, l_linestatus",
    doc="A-class relational baseline: partial+final hash agg with pushdown.",
)

_shared_sql(
    "region_revenue",
    "SELECT r.r_name AS region, ROUND(SUM(o.o_totalprice), 4) AS revenue, "
    "COUNT(*) AS n_orders FROM orders o "
    "JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "GROUP BY r.r_name",
    doc="Star join: dims broadcast, fact streams (no fact shuffle).",
)

_shared_sql(
    "order_priority",
    "SELECT o_orderpriority, COUNT(*) AS n FROM orders o WHERE EXISTS ("
    "SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
    "AND l.l_shipdate > o.o_orderdate) GROUP BY o_orderpriority",
    doc="Semi-join (EXISTS) — U2 anti/semi set-op analogue.",
)

_shared_sql(
    "top_customers",
    "SELECT c_custkey, c_name, revenue, rn AS rank FROM ("
    "SELECT c.c_custkey, c.c_name, "
    "ROUND(SUM(o.o_totalprice), 4) AS revenue, "
    "ROW_NUMBER() OVER (ORDER BY ROUND(SUM(o.o_totalprice), 4) DESC, "
    "c.c_custkey ASC) AS rn "
    "FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey "
    "GROUP BY c.c_custkey, c.c_name) t WHERE rn <= 10",
    doc="O4/O6 top-k: agg + deterministic windowed rank.",
)

_shared_sql(
    "events_hourly",
    "SELECT DATE_TRUNC('hour', ts) AS hour, event_type, COUNT(*) AS n, "
    "ROUND(SUM(value), 6) AS sum_value FROM events "
    "GROUP BY DATE_TRUNC('hour', ts), event_type",
    doc="Streaming-shaped tumbling-window agg in its batch spelling "
    "(streaming/windows.py runs the same plan via readStream).",
)

_shared_sql(
    "sessionize",
    "SELECT user_id, COUNT(*) AS n_events, MAX(session_id) + 1 AS n_sessions "
    "FROM (SELECT user_id, SUM(is_new) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id "
    "FROM (SELECT user_id, ts, event_id, "
    "CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "IS NULL THEN 0 WHEN ts > LAG(ts) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id) + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new "
    "FROM events) g) s GROUP BY user_id",
    doc="Gap-based sessionization: lag + running sum windows.",
)
