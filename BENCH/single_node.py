#!/usr/bin/env python
"""Single-node reference-shape baseline (see BENCH/BASELINE.md).

The flagship workload of BENCH/job.py re-implemented as eager
single-threaded vectorized NumPy — a FLATTERING stand-in for the
reference (which additionally pays a serial tile loop, out-of-process
PDAL, and GeoTIFF IO; SURVEY.md §6).  Prints one JSON line with per-phase
seconds at the same 38.4M-point payload (sf0.1 x 256).
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    from rgr_pdal_topo_spark.grid import GridSpec
    from rgr_pdal_topo_spark.operators.stencils import apply_kernel_full
    from rgr_pdal_topo_spark.synth import profile_segments

    sf_dir = "/root/testdata/sf0.1"
    R = 256
    t0 = time.time()
    phases = {}

    con = duckdb.connect()
    pids = con.execute(
        f"SELECT o_orderkey FROM read_parquet('{sf_dir}/orders.parquet')"
    ).df()["o_orderkey"].to_numpy()
    r = np.arange(R)
    pid = (pids[:, None] * R + r[None, :]).ravel()
    x0 = ((pids * 48271) % 100000) / 100.0
    y0 = ((pids * 69621 + 12345) % 100000) / 100.0
    x = ((x0[:, None] + r[None, :] * 61.803398875) % 1000.0).ravel()
    y = ((y0[:, None] + r[None, :] * 141.421356237) % 1000.0).ravel()
    cls = np.repeat(
        np.where((pids * 7919) % 20 == 0, 7,
                 np.where((pids * 7919) % 20 <= 3, 1, 2)), R)
    z = (100.0 + 0.02 * x - 0.015 * y + np.where(x >= 500.0, 12.0, 0.0)
         + 15.0 * np.maximum(
             0.0, 1.0 - ((x - 250) ** 2 + (y - 250) ** 2) / 40000.0)
         + ((pid * 2654435761) % 1000) / 1000.0)
    phases["derive"] = round(time.time() - t0, 1)

    t = time.time()
    g = cls == 2
    cell, n = 2.0, 500
    col = np.clip((x[g] / cell).astype(np.int64), 0, n - 1)
    row = np.clip(n - 1 - (y[g] / cell).astype(np.int64), 0, n - 1)
    cx = (col + 0.5) * cell
    cy = (n - 1 - row + 0.5) * cell
    w = 1.0 / ((x[g] - cx) ** 2 + (y[g] - cy) ** 2 + 1e-12)
    idx = row * n + col
    num = np.bincount(idx, weights=w * z[g], minlength=n * n)
    den = np.bincount(idx, weights=w, minlength=n * n)
    dem = (num / np.where(den == 0, np.nan, den)).reshape(n, n)
    phases["idw_grid"] = round(time.time() - t, 1)

    t = time.time()
    grid = GridSpec(cell=2.0, nrows=500, ncols=500)
    for k, p in [("hillshade", {}), ("slope_mag", {}),
                 ("windowed_std", {"pixel_width": 5}),
                 ("tpi", {"inner_radius": 6.0, "outer_radius": 12.0})]:
        apply_kernel_full(dem, grid, k, p)
    phases["stencils"] = round(time.time() - t, 1)

    t = time.time()
    nat = con.execute(
        f"SELECT n_nationkey FROM read_parquet('{sf_dir}/nation.parquet')"
    ).df()["n_nationkey"].to_numpy()
    n_pip = 0
    for k in nat:
        xmin = (k * 131) % 800
        ymin = (k * 257) % 800
        wdt = 80 + (k * 37) % 120
        hgt = 80 + (k * 53) % 120
        n_pip += int(np.sum((x >= xmin) & (x < xmin + wdt)
                            & (y >= ymin) & (y < ymin + hgt)))
    phases["pip"] = round(time.time() - t, 1)

    t = time.time()
    by_profile: dict[int, list] = {}
    for s in profile_segments():
        by_profile.setdefault(s.profile_id, []).append(s)
    n_prof = 0
    for _, plist in by_profile.items():
        assigned = np.zeros(len(x), dtype=bool)
        for s in sorted(plist, key=lambda s: s.seg_idx):
            tt = ((x - s.x1) * (s.x2 - s.x1)
                  + (y - s.y1) * (s.y2 - s.y1)) / s.l2
            ok = (~assigned) & (tt >= 0) & (tt <= 1)
            px = s.x1 + tt * (s.x2 - s.x1)
            py = s.y1 + tt * (s.y2 - s.y1)
            # the engine's profile operator emits the orthogonal
            # distance column; charge the baseline the same arithmetic
            np.sqrt((px - x) ** 2 + (py - y) ** 2)
            assigned |= ok
            n_prof += int(ok.sum())
    phases["profile"] = round(time.time() - t, 1)

    print(json.dumps({
        "n_points": int(len(x)), "sec": round(time.time() - t0, 1),
        "phases": phases, "n_pip": n_pip, "n_prof": n_prof,
    }))


if __name__ == "__main__":
    main()
