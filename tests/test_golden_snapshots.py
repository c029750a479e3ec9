"""Golden snapshots for the no-SQL (FFT / seeded-RNG) queries.

These six queries have no DuckDB oracle — their kernels are instead
verified against independent NumPy reference implementations in their own
test modules (test_spectral, test_terrain_x8, ...).  The snapshots add a
second, driver-shaped guarantee: every output is deterministic (fixed
seeds, fixed tiling), so the full query result at sf0.01 is pinned
bit-for-bit against a committed parquet.  Any unintended change to a
kernel, tiling, seed derivation or query projection fails here even if
the per-kernel property tests still hold.

Regenerate (after an INTENDED change) with exactly this recipe — any
deviation in sorting or dtypes pins the wrong bytes:

    from rgr_pdal_topo_spark.session import get_spark
    from rgr_pdal_topo_spark.queries import QUERIES
    spark = get_spark(app_name="golden", master="local[8]",
                      shuffle_partitions=8)
    for name in NAMES:
        pdf = QUERIES[name](spark, "/root/testdata/sf0.01").toPandas()
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
        pdf.reset_index(drop=True).to_parquet(
            f"tests/golden/{name}_sf0.01.parquet", index=False)

Review the value/row-count diff before committing a new golden.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SF_DIR = "/root/testdata/sf0.01"

NAMES = [
    "diamond_square",
    "fft_binned_power",
    "fft_lowpass",
    "spectral_break",
    "roughness_search",
    "random_terrain",
]


@pytest.mark.parametrize("name", NAMES)
def test_snapshot(spark, name):
    from rgr_pdal_topo_spark.queries import QUERIES

    golden = pd.read_parquet(
        os.path.join(GOLDEN_DIR, f"{name}_sf0.01.parquet")
    )
    got = (
        QUERIES[name](spark, SF_DIR)
        .toPandas()
        .sort_values(list(golden.columns), kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, golden, check_exact=True)
