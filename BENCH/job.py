#!/usr/bin/env python
"""Scaling-evidence job: identical workload at two parallelism levels.

Run via spark-submit --py-files (BENCH/run_scaling.sh); prints one JSON
line with rows processed, wall seconds, rows/sec.

The workload is the flagship spatial pipeline scaled up so it is
CPU/parallelism-bound (replicated point payload, 500x500 grid, full stencil
suite, PiP + profile joins) — the shape that must hold at 1000 executors.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "64"))

    from rgr_pdal_topo_spark.grid import GridSpec
    from rgr_pdal_topo_spark.operators import gridding, joins
    from rgr_pdal_topo_spark.operators.stencils import run_stencils
    from rgr_pdal_topo_spark.session import get_spark
    from rgr_pdal_topo_spark.synth import points_df, polygons_df

    spark = get_spark(app_name=f"scaling_{cpus}")

    # replicate the payload deterministically: pid' = pid*R + r with jittered
    # coordinates so cells stay balanced.  The source is one parquet file ->
    # one scan task; repartition the (small) base BEFORE the x64 blow-up so
    # the derivation parallelizes across all cores.
    base = points_df(spark, sf_dir).repartition(int(cpus) * 3, "pid")
    rep = spark.range(replicate).withColumnRenamed("id", "r")
    pts = (
        base.crossJoin(rep)
        .withColumn("pid", F.col("pid") * replicate + F.col("r"))
        .withColumn(
            "x",
            F.pmod(
                F.col("x") + F.col("r").cast("double") * 61.803398875,
                F.lit(1000.0),
            ),
        )
        .withColumn(
            "y",
            F.pmod(
                F.col("y") + F.col("r").cast("double") * 141.421356237,
                F.lit(1000.0),
            ),
        )
        .drop("r")
    )
    grid = GridSpec(cell=2.0, nrows=500, ncols=500)

    # warm up: JVM + parquet footers + python workers
    base.count()

    t0 = time.perf_counter()
    phases = {}
    tp = time.perf_counter()
    n_pts = pts.count()
    phases["derive"] = round(time.perf_counter() - tp, 3)

    dem = gridding.grid_points(pts.filter("cls = 2"), grid, output_type="idw")
    metrics = run_stencils(
        dem,
        grid,
        {
            "hillshade": ("hillshade", {}),
            "smag": ("slope_mag", {}),
            "rough": ("windowed_std", {"pixel_width": 5}),
            "tpi": ("tpi", {"inner_radius": 6.0, "outer_radius": 12.0}),
        },
        tile_cells=50,
    )
    tp = time.perf_counter()
    n_cells = metrics.count()
    phases["grid_stencil"] = round(time.perf_counter() - tp, 3)

    pip = joins.pip_join_rect(pts, polygons_df(spark, sf_dir))
    tp = time.perf_counter()
    n_pip = pip.count()
    phases["pip"] = round(time.perf_counter() - tp, 3)

    prof = joins.profile_project(pts)
    tp = time.perf_counter()
    n_prof = prof.count()
    phases["profile"] = round(time.perf_counter() - tp, 3)

    dt = time.perf_counter() - t0
    rows = n_pts + n_cells + n_pip + n_prof
    print(
        json.dumps(
            {
                "cpus": int(cpus),
                "rows": rows,
                "sec": round(dt, 3),
                "rows_per_sec": round(rows / dt, 1),
                "n_pts": n_pts,
                "n_cells": n_cells,
                "n_pip": n_pip,
                "n_prof": n_prof,
                "phases": phases,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
