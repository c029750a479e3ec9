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
from pyspark.sql import functions as F

from rgr_pdal_topo_spark.synth import points_df

# Knuth multiplicative hash over the prime P: the same replayable
# rank construction stratified_sample uses (operators/raster.py), so
# decimation is deterministic, partition-independent, and expressible
# verbatim in the DuckDB oracle.  ((pid % P) * A) <= (P-1)*A < 2^63:
# no int64 overflow in either engine.
DECIMATE_P = 1000000007
DECIMATE_A = 2654435761


def decimate_rank(pid_col) -> F.Column:
    """Deterministic per-point rank in [0, P) — uniform under the
    multiplicative hash; keep rank < density * P for an unbiased
    density-fraction subsample."""
    return (pid_col % F.lit(DECIMATE_P)) * F.lit(DECIMATE_A) % F.lit(
        DECIMATE_P
    )


def decimate_rank_sql(pid_expr: str) -> str:
    """The identical rank in ANSI SQL (oracle twin)."""
    return f"(({pid_expr} % {DECIMATE_P}) * {DECIMATE_A}) % {DECIMATE_P}"


def read_points(
    spark: SparkSession,
    sf_dir: str,
    bounds: tuple[float, float, float, float] | None = None,
    density: float | None = None,
    drop_noise: bool = True,
    seed: int | None = None,
) -> DataFrame:
    """S1/S2 scan with the reference's pushdowns.

    bounds: (minx, maxx, miny, maxy) — bbox predicate, pushed to the scan
    (filters.crop / readers.ept bounds).
    density: target fraction in (0, 1] — EPT resolution decimation
    (``pointResolution = 1/sqrt(density)``, pointCloudCreation.py:191-192,
    697-698); implemented as a deterministic hash-rank predicate BEFORE
    any shuffle (replaces the earlier seeded Bernoulli sample: same
    work-avoidance, but replayable across retries/resumes and oracle-
    checkable — F17).
    drop_noise: Classification![7:7] (F1).
    seed: DEPRECATED and ignored — decimation was a seeded Bernoulli
    sample through round 2; the hash-rank predicate is seed-free (and
    selects a different, deterministic subset for the same density, so
    goldens derived from the old sample shift).  Accepted for one
    release so existing callers keep working; warns when passed.
    """
    if seed is not None:
        import warnings

        warnings.warn(
            "read_points(seed=...) is deprecated and ignored: decimation "
            "is a deterministic hash-rank predicate since round 3",
            DeprecationWarning,
            stacklevel=2,
        )
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
        pts = pts.filter(
            decimate_rank(F.col("pid")) < F.lit(int(density * DECIMATE_P))
        )
    return pts
