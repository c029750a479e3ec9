"""Synthesis-layer parity: bit-exact agreement between Spark and DuckDB."""

from __future__ import annotations

from tests.conftest import SF_DIR_ORACLE
from tests.parity import assert_exact_parity


def test_points_parity(spark, ddb):
    from rgr_pdal_topo_spark.synth import points_df, points_sql

    df = points_df(spark, SF_DIR_ORACLE)
    assert_exact_parity(df, ddb, points_sql(), name="points")


def test_points_distribution(spark):
    from rgr_pdal_topo_spark.synth import points_df

    df = points_df(spark, SF_DIR_ORACLE)
    row = df.selectExpr(
        "count(*) AS n",
        "min(x) AS minx", "max(x) AS maxx",
        "min(y) AS miny", "max(y) AS maxy",
        "sum(CASE WHEN cls = 7 THEN 1 ELSE 0 END) AS noise",
        "sum(CASE WHEN cls = 2 THEN 1 ELSE 0 END) AS ground",
    ).first()
    assert row.n == 15000
    assert 0.0 <= row.minx and row.maxx < 1000.0
    assert 0.0 <= row.miny and row.maxy < 1000.0
    # 5% noise / 80% ground by construction
    assert abs(row.noise / row.n - 0.05) < 0.01
    assert abs(row.ground / row.n - 0.80) < 0.02


def test_gps_polygons_segments_parity(spark, ddb):
    from rgr_pdal_topo_spark import synth

    assert_exact_parity(
        synth.gps_df(spark, SF_DIR_ORACLE), ddb, synth.gps_sql(), name="gps"
    )
    assert_exact_parity(
        synth.polygons_df(spark, SF_DIR_ORACLE),
        ddb,
        synth.polygons_sql(),
        name="polygons",
    )
    assert_exact_parity(
        synth.segments_df(spark), ddb, synth.segments_values_sql(),
        name="segments",
    )
