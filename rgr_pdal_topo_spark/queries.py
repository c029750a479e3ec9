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
    (networkGraph.py:688-741) — cell-ring candidate join, not cross join."""
    out = joins.knn_join_grid(
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


# ---------------------------------------------------------------------------
# W1/W2/W5 + W11 + W13: stencil queries — Spark side runs the tiled
# applyInPandas engine (operators/stencils.py); oracle recomputes via
# window functions / neighbor-offset joins on the densified grid.
# NaN (engine) <-> NULL (SQL) normalized on output.
# ---------------------------------------------------------------------------

_SIN_ALT = repr(math.sin(45.0 * math.pi / 180.0))
_COS_ALT = repr(math.cos(45.0 * math.pi / 180.0))
_AZC = repr((360.0 - 315.0) * math.pi / 180.0 - math.pi / 2.0)

_DENSE_DUCK = (
    "SELECT a.cell_row, a.cell_col, g.value FROM "
    "(SELECT CAST(id // 100 AS INT) AS cell_row, CAST(id % 100 AS INT) "
    "AS cell_col FROM range(10000) t(id)) a "
    "LEFT JOIN gmean g ON a.cell_row = g.cell_row AND a.cell_col = g.cell_col"
)
_NBRS_DUCK = (
    "SELECT cell_row, cell_col, value, "
    "CASE WHEN cell_col = 99 THEN value ELSE LEAD(value) OVER wr END AS rv, "
    "CASE WHEN cell_col = 0 THEN value ELSE LAG(value) OVER wr END AS lv, "
    "CASE WHEN cell_row = 0 THEN value ELSE LAG(value) OVER wc END AS nv, "
    "CASE WHEN cell_row = 99 THEN value ELSE LEAD(value) OVER wc END AS sv "
    "FROM dense WINDOW "
    "wr AS (PARTITION BY cell_row ORDER BY cell_col), "
    "wc AS (PARTITION BY cell_col ORDER BY cell_row)"
)
_SLOPES_DUCK = (
    "SELECT cell_row, cell_col, value, (rv - lv) / 20.0 AS sx, "
    "(nv - sv) / 20.0 AS sy FROM nbrs"
)


def _nan_to_null(df: DataFrame, cols: list[str]) -> DataFrame:
    for c in cols:
        df = df.withColumn(
            c, F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c))
        )
    return df


@query(
    "slope_hillshade",
    _BASE.rstrip()
    + f", gmean AS ({GRID_MEAN_CTE}), dense AS ({_DENSE_DUCK}), "
    f"nbrs AS ({_NBRS_DUCK}), slopes AS ({_SLOPES_DUCK}) "
    "SELECT cell_row, cell_col, ROUND(sx, 6) AS sx, ROUND(sy, 6) AS sy, "
    "ROUND(SQRT(sx * sx + sy * sy), 6) AS smag, "
    "CASE WHEN value IS NULL THEN NULL ELSE ROUND(255.0 * ("
    f"{_SIN_ALT} * SIN(PI() / 2.0 - ATAN(SQRT(sx * sx + sy * sy))) + "
    f"{_COS_ALT} * COS(PI() / 2.0 - ATAN(SQRT(sx * sx + sy * sy))) * "
    f"COS({_AZC} - ATAN2(sy, sx))), 4) END AS hillshade "
    "FROM slopes",
)
def q_slope_hillshade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2/W5: slopes + hillshade over the mean DEM — runs the tiled
    applyInPandas stencil engine (edge-repeat BC, dem.py:162-186, 259-291).
    """
    from rgr_pdal_topo_spark.operators.stencils import run_stencils

    g = gridding.grid_points(points_df(spark, sf_dir), G, output_type="mean")
    out = run_stencils(
        g,
        G,
        {
            "sx": ("slope_x", {}),
            "sy": ("slope_y", {}),
            "smag": ("slope_mag", {}),
            "hillshade": ("hillshade", {}),
        },
        tile_cells=50,
    )
    out = out.select(
        "cell_row",
        "cell_col",
        F.round("sx", 6).alias("sx"),
        F.round("sy", 6).alias("sy"),
        F.round("smag", 6).alias("smag"),
        F.round("hillshade", 4).alias("hillshade"),
    )
    return _nan_to_null(out, ["sx", "sy", "smag", "hillshade"])


def _offsets_duck(radius: int, exclude_center: bool = True) -> str:
    lo, n = -radius, 2 * radius + 1
    cond = "WHERE NOT (dr = 0 AND dc = 0)" if exclude_center else ""
    return (
        f"SELECT CAST(a.id + {lo} AS INT) AS dr, CAST(b.id + {lo} AS INT) "
        f"AS dc FROM range({n}) a(id) CROSS JOIN range({n}) b(id) {cond}"
    )


@query(
    "windowed_std",
    _BASE.rstrip()
    + f", gmean AS ({GRID_MEAN_CTE}), dense AS ({_DENSE_DUCK}), "
    f"offs AS ({_offsets_duck(2, exclude_center=False)}), "
    "win AS (SELECT d.cell_row, d.cell_col, COUNT(n.value) AS n_valid, "
    "ROUND(STDDEV_POP(n.value), 6) AS sd "
    "FROM dense d JOIN offs o ON TRUE "
    "LEFT JOIN dense n ON n.cell_row = d.cell_row + o.dr "
    "AND n.cell_col = d.cell_col + o.dc "
    "GROUP BY d.cell_row, d.cell_col) "
    "SELECT cell_row, cell_col, "
    "CASE WHEN n_valid = 25 THEN sd ELSE NULL END AS roughness FROM win",
)
def q_windowed_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11: windowed-STD roughness (calculateWindowedSTD, dem.py:462-490;
    NaN-in-window propagates like generic_filter cval=NaN)."""
    from rgr_pdal_topo_spark.operators.stencils import run_stencil

    g = gridding.grid_points(points_df(spark, sf_dir), G, output_type="mean")
    out = run_stencil(
        g, G, "windowed_std", {"pixel_width": 5}, tile_cells=50,
        out_col="roughness",
    )
    out = out.select(
        "cell_row", "cell_col", F.round("roughness", 6).alias("roughness")
    )
    return _nan_to_null(out, ["roughness"])


@query(
    "tpi",
    _BASE.rstrip()
    + f", gmean AS ({GRID_MEAN_CTE}), dense AS ({_DENSE_DUCK}), "
    f"offs AS ({_offsets_duck(6, exclude_center=False)}), "
    "ann AS (SELECT dr, dc, SQRT((dr * 10.0) * (dr * 10.0) + (dc * 10.0) * "
    "(dc * 10.0)) AS dist FROM offs), "
    "win AS (SELECT d.cell_row, d.cell_col, d.value, "
    "COUNT(n.value) AS n_any, "
    "SUM(CASE WHEN a.dist > 30.0 AND a.dist <= 60.0 THEN n.value END) AS s_ann, "
    "COUNT(CASE WHEN a.dist > 30.0 AND a.dist <= 60.0 THEN n.value END) AS n_ann "
    "FROM dense d JOIN ann a ON TRUE "
    "LEFT JOIN dense n ON n.cell_row = d.cell_row + a.dr "
    "AND n.cell_col = d.cell_col + a.dc "
    "GROUP BY d.cell_row, d.cell_col, d.value) "
    "SELECT cell_row, cell_col, CASE WHEN n_any = 169 "
    "THEN ROUND(value - s_ann / 112.0, 6) ELSE NULL END AS tpi FROM win",
)
def q_tpi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W13: TPI annulus (inner 30 m, outer 60 m at 10 m cells -> 112 annulus
    members in a 13x13 kernel; NaN propagates through the full square like
    ndi.convolve cval=NaN — dem.py:522-565)."""
    from rgr_pdal_topo_spark.operators.stencils import run_stencil

    g = gridding.grid_points(points_df(spark, sf_dir), G, output_type="mean")
    out = run_stencil(
        g, G, "tpi", {"inner_radius": 30.0, "outer_radius": 60.0},
        tile_cells=50, out_col="tpi",
    )
    out = out.select("cell_row", "cell_col", F.round("tpi", 6).alias("tpi"))
    return _nan_to_null(out, ["tpi"])


# ---------------------------------------------------------------------------
# text analysis (documents)
# ---------------------------------------------------------------------------

_STOP_IN = ", ".join(f"'{w}'" for w in textstats.STOPWORDS_FLAT)
_TOKS_DUCK = (
    "SELECT doc_id, lang, length(text) AS n_chars, "
    "list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents"
)


@query(
    "text_stats",
    _with(f"toks AS ({_TOKS_DUCK})")
    + "SELECT doc_id, lang, n_chars, len(t) AS n_tokens, "
    "len(list_distinct(t)) AS n_distinct_tokens, "
    "ROUND(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / "
    "CAST(len(t) AS DOUBLE), 6) AS avg_token_len, "
    f"ROUND(CAST(len(list_filter(t, x -> x IN ({_STOP_IN}))) AS DOUBLE) / "
    "CAST(len(t) AS DOUBLE), 6) AS stopword_ratio, "
    "CAST(list_sum(list_transform(t, x -> CAST(ceil(length(x) / 4.0) "
    "AS BIGINT))) AS BIGINT) AS bpe_tokens_est FROM toks",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting / quality metrics / BPE-ish token estimate —
    all higher-order-function columnar, no UDF."""
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    s = textstats.text_stats(docs)
    return s.select(
        "doc_id", "lang", "n_chars", "n_tokens", "n_distinct_tokens",
        F.round("avg_token_len", 6).alias("avg_token_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        "bpe_tokens_est",
    )


@query(
    "quality_filter",
    _with(f"toks AS ({_TOKS_DUCK})")
    + "SELECT doc_id, CASE WHEN len(t) >= 20 AND "
    "CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / "
    "CAST(len(t) AS DOUBLE) <= 12.0 AND "
    "CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) >= 0.1 "
    "THEN 1 ELSE 0 END AS keep FROM toks",
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style quality gating decision per document."""
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return textstats.quality_filter(docs).select("doc_id", "keep")


def _lang_scores_duck() -> str:
    cols = []
    for code, words in textstats.LANG_STOPWORDS.items():
        inl = ", ".join(f"'{w}'" for w in words)
        cols.append(
            f"len(list_filter(t, x -> x IN ({inl}))) AS score_{code}"
        )
    return ", ".join(cols)


@query(
    "langid",
    _with(f"toks AS ({_TOKS_DUCK})")
    + f"SELECT doc_id, lang, {_lang_scores_duck()}, "
    "CASE WHEN len(list_filter(t, x -> x IN ('le','la','de','et','les'))) > "
    "GREATEST(len(list_filter(t, x -> x IN ('the','a','and','of','to'))), "
    "len(list_filter(t, x -> x IN ('el','la','de','que','y'))), "
    "len(list_filter(t, x -> x IN ('der','die','das','und','ist')))) THEN 'fr' "
    "WHEN len(list_filter(t, x -> x IN ('der','die','das','und','ist'))) > "
    "GREATEST(len(list_filter(t, x -> x IN ('the','a','and','of','to'))), "
    "len(list_filter(t, x -> x IN ('el','la','de','que','y')))) THEN 'de' "
    "WHEN len(list_filter(t, x -> x IN ('el','la','de','que','y'))) > "
    "len(list_filter(t, x -> x IN ('the','a','and','of','to'))) THEN 'es' "
    "ELSE 'en' END AS pred_lang FROM toks",
)
def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic with deterministic argmax."""
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return textstats.langid_scores(docs)


_shared_sql(
    "lang_dist",
    "SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 6) AS avg_chars "
    "FROM documents GROUP BY lang",
    doc="Language distribution of the corpus (exact: integer sums).",
)


# ---------------------------------------------------------------------------
# dedup (documents)
# ---------------------------------------------------------------------------

_shared_sql(
    "dedup_exact",
    "SELECT MIN(doc_id) AS canonical_doc, COUNT(*) AS group_size "
    "FROM documents GROUP BY text",
    doc="Exact dedup: one hash agg on content (A-class at any scale).",
)

_TOKS_SET_DUCK = (
    "SELECT DISTINCT doc_id, tok FROM (SELECT doc_id, "
    "unnest(string_split(text, ' ')) AS tok FROM documents) u WHERE tok <> ''"
)
_VOCAB_DUCK = (
    "SELECT tok, CAST(DENSE_RANK() OVER (ORDER BY tok) AS BIGINT) AS tid "
    "FROM (SELECT DISTINCT tok FROM toks) v"
)
_DT_DUCK = "SELECT doc_id, tid FROM toks JOIN vocab USING (tok)"
_PERMS_DUCK = "SELECT * FROM (VALUES " + ", ".join(
    f"({j}, {dedup.MINHASH_A[j]}, {dedup.MINHASH_B[j]})"
    for j in range(dedup.N_PERM)
) + ") AS p(perm, a, b)"
_SIG_DUCK = (
    "SELECT doc_id, perm, MIN((a * tid + b) % 2147483647) AS minhash "
    "FROM dt CROSS JOIN perms GROUP BY doc_id, perm"
)
_BANDS_DUCK = (
    "SELECT doc_id, CAST(FLOOR(perm / 2.0) AS INT) AS band, "
    "CAST(SUM(minhash * (CASE WHEN perm % 2 = 0 THEN 1 ELSE 31 END)) "
    "AS BIGINT) AS band_key FROM sig "
    "GROUP BY doc_id, CAST(FLOOR(perm / 2.0) AS INT)"
)

_MINHASH_CTES = _with(
    f"toks AS ({_TOKS_SET_DUCK})",
    f"vocab AS ({_VOCAB_DUCK})",
    f"dt AS ({_DT_DUCK})",
    f"perms AS ({_PERMS_DUCK})",
    f"sig AS ({_SIG_DUCK})",
    f"bandmix AS ({_BANDS_DUCK})",
)


@query(
    "minhash_buckets",
    _MINHASH_CTES
    + "SELECT band, band_key, COUNT(*) AS n_docs, MIN(doc_id) AS "
    "canonical_doc FROM bandmix GROUP BY band, band_key",
)
def q_minhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH band buckets (16 perms, 8 bands x 2 rows): docs sharing a
    bucket are near-dup candidates.  All hashing is explicit integer
    arithmetic (oracle-replicable)."""
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sig = dedup.minhash_signatures(dedup.token_ids(docs))
    return dedup.lsh_band_buckets(sig)


@query(
    "minhash_pairs",
    _MINHASH_CTES.rstrip()
    + ", pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM bandmix a JOIN bandmix b ON a.band = b.band AND "
    "a.band_key = b.band_key AND a.doc_id < b.doc_id), "
    "sizes AS (SELECT doc_id, COUNT(*) AS sz FROM dt GROUP BY doc_id), "
    "inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS inter FROM pairs p "
    "JOIN dt x ON x.doc_id = p.doc_a JOIN dt y ON y.doc_id = p.doc_b "
    "AND y.tid = x.tid GROUP BY p.doc_a, p.doc_b) "
    "SELECT i.doc_a, i.doc_b, i.inter, "
    "ROUND(CAST(i.inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.inter AS DOUBLE), "
    "6) AS jaccard FROM inter i "
    "JOIN sizes sa ON sa.doc_id = i.doc_a JOIN sizes sb ON sb.doc_id = i.doc_b",
)
def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs + exact token-set Jaccard verification."""
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    dt = dedup.token_ids(docs)
    sig = dedup.minhash_signatures(dt)
    pairs = dedup.minhash_candidate_pairs(sig)
    jc = dedup.jaccard_pairs(dt, pairs)
    return jc.select(
        "doc_a", "doc_b", "inter", F.round("jaccard", 6).alias("jaccard")
    )


_BITS_DUCK = "SELECT * FROM (VALUES " + ", ".join(
    f"({b}, {(2 * b + 3) * 2654435761 % dedup.MINHASH_P}, "
    f"{(b * 69621 + 7) % dedup.MINHASH_P})"
    for b in range(dedup.SIMHASH_BITS)
) + ") AS bt(bit, p, c)"


@query(
    "simhash",
    _with(
        f"toks AS ({_TOKS_SET_DUCK})",
        f"vocab AS ({_VOCAB_DUCK})",
        f"dt AS ({_DT_DUCK})",
        f"bits AS ({_BITS_DUCK})",
        "perbit AS (SELECT doc_id, bit, SUM(CAST((tid * p + c) % 1000 AS "
        "DOUBLE) - 499.5) AS s FROM dt CROSS JOIN bits GROUP BY doc_id, bit)",
    )
    + "SELECT doc_id, CAST(SUM((CASE WHEN s > 0 THEN 1 ELSE 0 END) * "
    "CAST(POWER(2.0, bit) AS BIGINT)) AS BIGINT) AS simhash "
    "FROM perbit GROUP BY doc_id",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprint (sign-of-weighted-sum; exact half-integer
    arithmetic -> bit-reproducible)."""
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash(dedup.token_ids(docs))


@query("doc_fingerprint")  # posexplode order — no ORDINALITY in DuckDB 1.0
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling document fingerprint (rows-only check)."""
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return textstats.doc_fingerprint(docs)


# ---------------------------------------------------------------------------
# similarity search (embeddings)
# ---------------------------------------------------------------------------

_EMB_DUCK = (
    "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"
)
_NORM_DUCK = (
    "SELECT vec_id, v, SQRT(list_dot_product(v, v)) AS nrm FROM e"
)


@query(
    "cosine_topk",
    _with(f"e AS ({_EMB_DUCK})", f"n AS ({_NORM_DUCK})")
    + "SELECT query_id, rank, nn_id, cosine FROM ("
    "SELECT q.vec_id AS query_id, n.vec_id AS nn_id, "
    "ROUND(list_dot_product(n.v, q.v) / (n.nrm * q.nrm), 5) AS cosine, "
    "ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
    "ROUND(list_dot_product(n.v, q.v) / (n.nrm * q.nrm), 5) DESC, "
    "n.vec_id ASC) AS rank "
    "FROM n JOIN n q ON q.vec_id < 10 AND n.vec_id <> q.vec_id) r "
    "WHERE rank <= 5",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k (zip_with/aggregate dot products —
    JVM-side, no UDF)."""
    from rgr_pdal_topo_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, n_queries=10, k=5)


@query("cosine_topk_lsh")  # approximate — rows-only check + recall pytest
def q_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed approximate top-k (the 100 TB scale path)."""
    from rgr_pdal_topo_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk_lsh(emb, n_queries=10, k=5)


def _planes_duck(n_planes: int = 4, dim: int = 64) -> list[str]:
    out = []
    for j in range(n_planes):
        vals = ", ".join(
            repr(float((j * dim + d) * 48271 % 2001 - 1000)) for d in range(dim)
        )
        out.append(f"[{vals}]")
    return out


_PLANES = _planes_duck()
_BUCKET_DUCK = " + ".join(
    f"(CASE WHEN list_dot_product(v, {_PLANES[j]}) > 0 THEN {1 << j} "
    "ELSE 0 END)"
    for j in range(4)
)


@query(
    "embedding_near_dups",
    _with(
        f"e AS ({_EMB_DUCK})",
        f"n AS (SELECT vec_id, v, SQRT(list_dot_product(v, v)) AS nrm, "
        f"{_BUCKET_DUCK} AS bucket FROM e)",
    )
    + "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
    "ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 5) AS cosine "
    "FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id "
    "WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 5) >= 0.35",
)
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs within LSH buckets (cos >= 0.35)."""
    from rgr_pdal_topo_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dups(emb, threshold=0.35)


@query(
    "multimodal_meta",
    "SELECT doc_id, octet_length(encode(text)) AS payload_bytes, "
    "n_chars FROM documents",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payload + typed metadata
    (decode stubs live in operators/multimodal.py)."""
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length(F.encode(F.col("text"), "UTF-8")).alias("payload_bytes"),
        "n_chars",
    )
