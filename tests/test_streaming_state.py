"""Stateful streaming gridding: incremental state across micro-batches
AND across query restarts (checkpoint resume)."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest

from rgr_pdal_topo_spark.grid import GridSpec
from rgr_pdal_topo_spark.streaming.stateful import incremental_grid_stream

GRID = GridSpec(x0=0.0, y0=0.0, cell=100.0, nrows=10, ncols=10)
SCHEMA = "pid long, x double, y double, z double"


def _pts(n, seed):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "pid": np.arange(n, dtype="int64") + seed * 1000000,
            "x": rng.uniform(0, 1000, n),
            "y": rng.uniform(0, 1000, n),
            "z": rng.uniform(100, 130, n),
        }
    )


def _run_once(spark, src_dir, ckpt, table):
    stream = (
        spark.readStream.schema(SCHEMA).parquet(src_dir)
    )
    out = incremental_grid_stream(stream, GRID)
    collected: list[pd.DataFrame] = []

    def sink(batch_df, batch_id):
        collected.append(batch_df.toPandas())

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if not collected:
        return pd.DataFrame(
            columns=["cell_row", "cell_col", "value", "n"]
        )
    return pd.concat(collected, ignore_index=True)


@pytest.mark.filterwarnings("ignore")
def test_incremental_grid_resumes_from_checkpoint(spark):
    base = tempfile.mkdtemp(prefix="sgs_")
    src = f"{base}/src"
    ckpt = f"{base}/ckpt"
    try:
        a = _pts(500, 1)
        spark.createDataFrame(a).coalesce(1).write.mode("append").parquet(src)
        out1 = _run_once(spark, src, ckpt, "t_batch1")
        assert out1["n"].sum() == 500

        b = _pts(300, 2)
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(src)
        out2 = _run_once(spark, src, ckpt, "t_batch2")
        # second run processed ONLY batch b, but state carries batch a:
        # every emitted cell's (value, n) equals the full-batch mean/count
        allpts = pd.concat([a, b])
        allpts["cell_row"] = (
            GRID.nrows - 1 - np.floor(allpts["y"] / GRID.cell)
        ).astype(int)
        allpts["cell_col"] = np.floor(allpts["x"] / GRID.cell).astype(int)
        exp = (
            allpts.groupby(["cell_row", "cell_col"])["z"]
            .agg(["mean", "count"])
            .reset_index()
        )
        merged = out2.merge(exp, on=["cell_row", "cell_col"], how="left")
        assert len(merged) > 0
        assert (merged["n"] == merged["count"]).all()
        assert np.allclose(merged["value"], merged["mean"])
        # cells untouched by batch b are not re-emitted (update mode)
        assert len(out2) < len(exp)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_streaming_grid_resume_query_matches_batch(spark):
    """The driver query (queries.streaming_grid_resume) must equal the
    one-shot batch mean DEM bit-for-bit: the kill/restart protocol plus
    the Q20 ingress quantization make the streaming fold order
    immaterial (same doctrine as grid_mean)."""
    from pyspark.sql import functions as F

    from rgr_pdal_topo_spark.queries import QUERIES, mean_dem
    from tests.conftest import SF_DIR

    got = (
        QUERIES["streaming_grid_resume"](spark, SF_DIR)
        .toPandas()
        .sort_values(["cell_row", "cell_col"])
        .reset_index(drop=True)
    )
    exp = (
        mean_dem(spark, SF_DIR)
        .select(
            "cell_row",
            "cell_col",
            F.round("value", 6).alias("value"),
            "n",
        )
        .toPandas()
        .sort_values(["cell_row", "cell_col"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    assert (got["cell_row"].values == exp["cell_row"].values).all()
    assert (got["cell_col"].values == exp["cell_col"].values).all()
    assert (got["n"].values == exp["n"].values).all()
    # bit-equality, not allclose: the whole point of the Q20 doctrine
    assert (
        got["value"].values.view("int64")
        == exp["value"].values.view("int64")
    ).all()
