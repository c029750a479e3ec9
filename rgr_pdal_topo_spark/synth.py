"""Deterministic synthetic spatial payload derived from the driver tables.

The BASELINE input is a Common-Crawl-style page table; coordinates are
"extracted from each page" (BASELINE.json north_star).  The synthetic
stand-in (FIXTURES.md §2) derives a point record 1:1 from each ``orders``
row (unique key ``o_orderkey``; the largest uniquely-keyed driver table) via pure integer/double arithmetic — the PDAL dimensions
``X, Y, Z, Classification, Intensity`` of the reference
(pointCloudCreation.py:100-108) become columns ``x, y, z, cls, intensity``.

CRITICAL PARITY DESIGN: every derivation below is a SQL fragment written in
the common Spark-SQL/DuckDB dialect (integer ``*``/``%``, CAST, CASE,
GREATEST, fixed left-to-right float addition).  The Spark engine evaluates
the fragment via ``selectExpr`` and the DuckDB oracle embeds the *same
string*, so both engines compute bit-identical doubles — no transcendental
functions appear anywhere in the synthesis path.

GPS points (kNN targets, FIXTURES.md §6) derive from ``supplier``; rectangle
"fault-scarp" polygons (FIXTURES.md §4) derive from ``nation``; profile
polylines (FIXTURES.md §5) are module constants whose per-segment geometry is
precomputed in Python and embedded as float literals in both plans.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

# --------------------------------------------------------------------------
# points: one per orders row (pid = o_orderkey).  Extent [0, 1000) x [0, 1000) metres.
# Surface = plane + scarp step at x=500 + quadratic hill at (250,250) + noise,
# exercising slope / hillshade / curvature / classification filters
# (class 7 = noise 5%, 1 = unclassified 15%, 2 = ground 80% — mirrors
# pointCloudCreation.py:184-188, 304-309 filter semantics).
# --------------------------------------------------------------------------

POINTS_STEP1: dict[str, str] = {
    "x": "CAST((pid * 48271) % 100000 AS DOUBLE) / 100.0",
    "y": "CAST((pid * 69621 + 12345) % 100000 AS DOUBLE) / 100.0",
    "cls": (
        "CAST(CASE WHEN (pid * 7919) % 20 = 0 THEN 7 "
        "WHEN (pid * 7919) % 20 <= 3 THEN 1 ELSE 2 END AS INT)"
    ),
    "intensity": "CAST((pid * 104729) % 25500 AS DOUBLE) / 100.0",
}

POINTS_STEP2: dict[str, str] = {
    "z": (
        "100.0 + 0.02 * x - 0.015 * y"
        " + (CASE WHEN x >= 500.0 THEN 12.0 ELSE 0.0 END)"
        " + 15.0 * GREATEST(0.0, 1.0 - ((x - 250.0) * (x - 250.0)"
        " + (y - 250.0) * (y - 250.0)) / 40000.0)"
        # ((pid % 1000) * 761) % 1000 == (pid * 2654435761) % 1000 exactly
        # (2654435761 % 1000 = 761), but the intermediate stays < 10^6 —
        # raw pid * 2654435761 would raise ARITHMETIC_OVERFLOW under an
        # ANSI session once pid > ~3.5e9.  Values (and thus all goldens
        # and oracles) are unchanged.
        " + CAST(((pid % 1000) * 761) % 1000 AS DOUBLE) / 1000.0"
    ),
}

POINT_COLUMNS = ["pid", "x", "y", "z", "cls", "intensity"]


def points_sql(orders: str = "orders") -> str:
    """Full derivation as one SQL text, valid in both Spark SQL and DuckDB."""
    s1 = ", ".join(f"{expr} AS {name}" for name, expr in POINTS_STEP1.items())
    s2 = ", ".join(f"{expr} AS {name}" for name, expr in POINTS_STEP2.items())
    return (
        f"SELECT pid, x, y, z, cls, intensity FROM ("
        f"SELECT pid, x, y, cls, intensity, {s2} FROM ("
        f"SELECT pid, {s1} FROM (SELECT o_orderkey AS pid FROM {orders}) o) s1) s2"
    )


def points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Points DataFrame: pure Column arithmetic, JVM-side, no UDFs."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "o_orderkey AS pid"
    )
    step1 = orders.selectExpr(
        "pid", *[f"{expr} AS {name}" for name, expr in POINTS_STEP1.items()]
    )
    return step1.selectExpr(
        "pid", "x", "y", "cls", "intensity",
        *[f"{expr} AS {name}" for name, expr in POINTS_STEP2.items()],
    ).select(*POINT_COLUMNS)


# --------------------------------------------------------------------------
# gps points: small kNN query set (reference Point_Proj.shp role,
# networkGraph.py:688-741 nearest-value assignment).
# --------------------------------------------------------------------------

GPS_EXPRS: dict[str, str] = {
    "gx": "CAST((s_suppkey * 40503 + 77) % 100000 AS DOUBLE) / 100.0",
    "gy": "CAST((s_suppkey * 69621 + 331) % 100000 AS DOUBLE) / 100.0",
}


def gps_sql(supplier: str = "supplier") -> str:
    cols = ", ".join(f"{expr} AS {name}" for name, expr in GPS_EXPRS.items())
    return f"SELECT s_suppkey AS gps_id, {cols} FROM {supplier}"


def gps_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select("s_suppkey")
    return sup.selectExpr(
        "s_suppkey AS gps_id",
        *[f"{expr} AS {name}" for name, expr in GPS_EXPRS.items()],
    )


# --------------------------------------------------------------------------
# polygons: axis-aligned rectangles from nation (broadcastable dim table).
# The generic-polygon path (ray casting in a pandas UDF) is exercised by
# pytest fixtures; the oracle-checked path uses rectangles so containment is
# exact integer-free range arithmetic in both engines.
# --------------------------------------------------------------------------

POLY_EXPRS: dict[str, str] = {
    "xmin": "CAST(((n_nationkey * 131) % 16) * 50 AS DOUBLE)",
    "ymin": "CAST(((n_nationkey * 197) % 16) * 50 AS DOUBLE)",
    "width": "100.0 + CAST(((n_nationkey * 11) % 4) * 50 AS DOUBLE)",
    "height": "100.0 + CAST(((n_nationkey * 17) % 4) * 50 AS DOUBLE)",
}


def polygons_sql(nation: str = "nation") -> str:
    cols = ", ".join(f"{expr} AS {name}" for name, expr in POLY_EXPRS.items())
    return f"SELECT n_nationkey AS polygon_id, n_name AS unit, {cols} FROM {nation}"


def polygons_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    return nat.selectExpr(
        "n_nationkey AS polygon_id",
        "n_name AS unit",
        *[f"{expr} AS {name}" for name, expr in POLY_EXPRS.items()],
    )


# --------------------------------------------------------------------------
# profiles: transect polylines (profiles_for_project.shp role).  Segment
# geometry precomputed once in Python; the identical float literals feed both
# the Spark plan and the DuckDB oracle (first-segment-wins projection,
# pointCloudCreation.py:69-89).
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class ProfileSegment:
    profile_id: int
    seg_idx: int
    x1: float
    y1: float
    x2: float
    y2: float
    l2: float  # squared segment length
    l_start: float  # cumulative polyline length before this segment


PROFILES: list[dict] = [
    {
        "profile_id": 0,
        "name": "Tobin",
        "vertices": [(100.0, 100.0), (450.0, 500.0), (900.0, 450.0)],
        "swath_width": 50.0,
    },
    {
        "profile_id": 1,
        "name": "Pinon",
        "vertices": [(200.0, 800.0), (800.0, 200.0)],
        "swath_width": 30.0,
    },
]


def profile_segments() -> list[ProfileSegment]:
    segs: list[ProfileSegment] = []
    for p in PROFILES:
        l_cum = 0.0
        verts = p["vertices"]
        for i in range(len(verts) - 1):
            (x1, y1), (x2, y2) = verts[i], verts[i + 1]
            l2 = (x2 - x1) ** 2 + (y2 - y1) ** 2
            segs.append(
                ProfileSegment(p["profile_id"], i, x1, y1, x2, y2, l2, l_cum)
            )
            l_cum += math.sqrt(l2)
    return segs


def segments_values_sql() -> str:
    """VALUES table of segments — identical literal text for both engines."""
    def d(v: float) -> str:
        # Spark types bare decimal literals as DECIMAL; force DOUBLE in both
        # engines (repr round-trips, strtod is correctly rounded in both).
        return f"CAST({v!r} AS DOUBLE)"

    rows = ", ".join(
        f"({s.profile_id}, {s.seg_idx}, {d(s.x1)}, {d(s.y1)}, {d(s.x2)}, "
        f"{d(s.y2)}, {d(s.l2)}, {d(s.l_start)})"
        for s in profile_segments()
    )
    return (
        f"SELECT * FROM (VALUES {rows}) AS seg("
        "profile_id, seg_idx, x1, y1, x2, y2, l2, l_start)"
    )


def segments_df(spark: SparkSession) -> DataFrame:
    return spark.sql(segments_values_sql())


# ---------------------------------------------------------------------------
# DBSCAN lattice points: a deterministic planted blob mixture over a
# 200x200 integer lattice, derived from orders exactly like points_sql.
# 70% of rows fall into 8 compact 3x3 blobs (two of them — centers
# (60,170) and (63,170) — deliberately ADJACENT so their core cells
# density-connect into ONE cluster: the transitivity case kmeans-style
# assignment cannot produce); 30% spray uniformly as noise.  All pure
# integer modular arithmetic — ONE SQL text runs unchanged in Spark and
# DuckDB, so the planted structure is engine-exact by construction.
# ---------------------------------------------------------------------------

DBSCAN_CX_SQL = (
    "CASE pid % 8 WHEN 0 THEN 30 WHEN 1 THEN 90 WHEN 2 THEN 150 "
    "WHEN 3 THEN 30 WHEN 4 THEN 90 WHEN 5 THEN 150 WHEN 6 THEN 60 "
    "ELSE 63 END"
)
DBSCAN_CY_SQL = (
    "CASE pid % 8 WHEN 0 THEN 30 WHEN 1 THEN 30 WHEN 2 THEN 30 "
    "WHEN 3 THEN 120 WHEN 4 THEN 120 WHEN 5 THEN 120 WHEN 6 THEN 170 "
    "ELSE 170 END"
)
DBSCAN_GX_SQL = (
    f"CASE WHEN pid % 10 < 7 THEN {DBSCAN_CX_SQL} + "
    "((pid * 7919) % 1000003) % 3 - 1 "
    "ELSE ((pid * 48271) % 999983) % 200 END"
)
DBSCAN_GY_SQL = (
    f"CASE WHEN pid % 10 < 7 THEN {DBSCAN_CY_SQL} + "
    "((pid * 104729) % 1000033) % 3 - 1 "
    "ELSE ((pid * 16807) % 999979) % 200 END"
)


def dbscan_points_sql(orders: str = "orders") -> str:
    """The lattice-point derivation as one SQL text (both engines)."""
    return (
        f"SELECT pid, {DBSCAN_GX_SQL} AS gx, {DBSCAN_GY_SQL} AS gy "
        f"FROM (SELECT o_orderkey AS pid FROM {orders}) o"
    )


def dbscan_points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine twin of dbscan_points_sql (same expression text)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "o_orderkey AS pid"
    )
    return orders.selectExpr(
        "pid", f"{DBSCAN_GX_SQL} AS gx", f"{DBSCAN_GY_SQL} AS gy"
    )
