"""Point-cloud source (SURVEY.md §2.1: S1 EPT scan, S2 LAS scan,
F12 bbox subset, F17 resolution pushdown, F1 noise filter).

The reference's readers.ept pushes bounds and a decimation resolution into
the remote Entwine scan (pointCloudCreation.py:176-192: bounds at :178,
``resolution = 1/sqrt(density)`` pushdown at :191-192, 697-698) and drops
Classification 7 noise (:184-188).  The engine spelling: the page table is
the cloud; coordinate predicates are plain column filters that Catalyst
pushes into the parquet scan (asserted on PushedFilters in
tests/test_plan_shapes.py), and decimation is a pre-shuffle Bernoulli
sample — the same work-avoidance the EPT reader does server-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rgr_pdal_topo_spark.synth import points_df


def read_points(
    spark: SparkSession,
    sf_dir: str,
    bounds: tuple[float, float, float, float] | None = None,
    density: float | None = None,
    drop_noise: bool = True,
    seed: int = 13,
) -> DataFrame:
    """S1/S2 scan with the reference's pushdowns.

    bounds: (minx, maxx, miny, maxy) — bbox predicate, pushed to the scan
    (filters.crop / readers.ept bounds).
    density: target fraction in (0, 1] — EPT resolution decimation
    (``pointResolution = 1/sqrt(density)``); implemented as seeded
    Bernoulli sample BEFORE any shuffle.
    drop_noise: Classification![7:7] (F1).
    """
    pts = points_df(spark, sf_dir)
    if bounds is not None:
        minx, maxx, miny, maxy = bounds
        pts = pts.filter(
            (pts.x >= minx) & (pts.x < maxx)
            & (pts.y >= miny) & (pts.y < maxy)
        )
    if drop_noise:
        pts = pts.filter("cls <> 7")
    if density is not None and density < 1.0:
        pts = pts.sample(fraction=density, seed=seed)
    return pts
