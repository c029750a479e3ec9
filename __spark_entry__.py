"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship pipeline; queries()/oracle_sql() expose every
implemented operator (SURVEY.md §2 + training-data ops) with DuckDB-oracle
parity pre-verified in tests/test_query_parity.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: point extraction ->
    noise filter -> mean-DEM gridding -> tiled hillshade/slope/roughness
    stencils -> per-fault-scarp-polygon stats join (the reference's
    ClusterScarp + points2grid pipeline end to end)."""
    from pyspark.sql import functions as F

    from rgr_pdal_topo_spark.grid import DEFAULT_GRID as G
    from rgr_pdal_topo_spark.operators import gridding, joins
    from rgr_pdal_topo_spark.operators.stencils import run_stencils
    from rgr_pdal_topo_spark.synth import points_df, polygons_df

    sf_dir = "/root/testdata/sf0.001"
    pts = points_df(spark, sf_dir).filter("cls <> 7")
    dem = gridding.fill_empty_cells(  # points2grid window-6 fallback (A3)
        gridding.grid_points(pts.filter("cls = 2"), G, output_type="idw"),
        G,
    )
    metrics = run_stencils(
        dem,
        G,
        {
            "hillshade": ("hillshade", {}),
            "slope_mag": ("slope_mag", {}),
            "roughness": ("windowed_std", {"pixel_width": 5}),
        },
        tile_cells=50,
    )
    cell_pts = gridding.with_cell(pts, G)
    enriched = cell_pts.join(metrics, ["cell_row", "cell_col"], "left")
    pip = joins.pip_join_rect(enriched, polygons_df(spark, sf_dir))
    def _nanavg(c: str):  # avg() skips NULL but NOT NaN: mask NaN first
        col = F.col(c)
        return F.avg(F.when(~F.isnan(col), col))

    return pip.groupBy("polygon_id", "unit").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.avg("z"), 4).alias("mean_z"),
        F.round(_nanavg("hillshade"), 4).alias("mean_hillshade"),
        F.round(_nanavg("slope_mag"), 6).alias("mean_slope"),
        F.round(_nanavg("roughness"), 6).alias("mean_roughness"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rgr_pdal_topo_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from rgr_pdal_topo_spark.queries import ORACLES

    return dict(ORACLES)
