"""Streaming funnel state machine: multi-micro-batch drain reproduces
the batch funnel_steps query's stage counts exactly, state survives
batch boundaries mid-funnel, and completed funnels drop their state."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import pytest

from rgr_pdal_topo_spark.streaming.funnel import STAGES, funnel_stream

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _drain(spark, src_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file = one micro-batch
        .parquet(src_dir)
    )
    out = funnel_stream(stream)
    collected: list[pd.DataFrame] = []

    def sink(batch_df, batch_id):
        collected.append(batch_df.toPandas())

    ckpt = tempfile.mkdtemp(prefix="sfn_ck_")
    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    shutil.rmtree(ckpt, ignore_errors=True)
    if not collected:
        return {}
    allb = pd.concat(collected, ignore_index=True)
    # update mode: the LAST emission per user is its final stage
    return dict(
        allb.groupby("user_id", sort=False).last()["stage"].items()
    )


@pytest.mark.filterwarnings("ignore")
def test_streaming_funnel_drain_equals_batch(spark):
    """Drain the sf0.001 event stream in three chronological
    micro-batches: per-stage completion counts equal the batch
    funnel_steps query on the identical events table — funnels that
    straddle micro-batch boundaries included."""
    from rgr_pdal_topo_spark.queries import QUERIES
    from rgr_pdal_topo_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").orderBy(
        "ts", "event_id"
    )
    pdf = ev.toPandas()
    base = tempfile.mkdtemp(prefix="sfn_")
    src = os.path.join(base, "src")
    os.makedirs(src)
    n = len(pdf)
    for i, (lo, hi) in enumerate(
        [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    ):
        spark.createDataFrame(pdf.iloc[lo:hi], SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(src, f"b{i}"))
    # chronological micro-batches: feed file-per-batch via maxFilesPerTrigger
    stream_dir = os.path.join(base, "stream")
    os.makedirs(stream_dir)
    import glob

    t_base = 1_700_000_000
    for i in range(3):
        for j, f in enumerate(
            glob.glob(os.path.join(src, f"b{i}", "*.parquet"))
        ):
            dst = os.path.join(stream_dir, f"{i:02d}_{j}.parquet")
            shutil.copy(f, dst)
            # FileStreamSource orders micro-batches by modification
            # time; copies land within the same ms, so pin mtimes
            os.utime(dst, (t_base + i, t_base + i))

    final = _drain(spark, stream_dir)

    batch = {
        r.stage: r.n_users
        for r in QUERIES["funnel_steps"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    stream_counts = {
        k + 1: sum(1 for s in final.values() if s >= k + 1)
        for k in range(len(STAGES))
    }
    assert stream_counts == batch
    shutil.rmtree(base, ignore_errors=True)


@pytest.mark.filterwarnings("ignore")
def test_streaming_funnel_state_machine_planted(spark):
    """Hand stream over two micro-batches: a funnel advancing ACROSS
    the batch boundary, the 48 h window enforced from the previous
    stage's event, and order-before-signup ignored."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 3, 1, 12, 0, 0)
    h = lambda n: t0 + timedelta(hours=n)
    b1 = [
        (0, h(-1), 2, "view", 0.0, "{}"),    # before signup: ignored
        (1, h(0), 1, "signup", 0.0, "{}"),
        (2, h(0), 2, "signup", 0.0, "{}"),
        (3, h(1), 1, "view", 0.0, "{}"),
    ]
    b2 = [
        (4, h(2), 1, "click", 0.0, "{}"),     # across-boundary advance
        (5, h(3), 1, "purchase", 0.0, "{}"),
        (6, h(60), 2, "view", 0.0, "{}"),     # outside 48 h window
    ]
    base = tempfile.mkdtemp(prefix="sfnp_")
    src = os.path.join(base, "src")
    os.makedirs(src)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(base, f"tmp{i}"))
        import glob

        for j, f in enumerate(
            glob.glob(os.path.join(base, f"tmp{i}", "*.parquet"))
        ):
            dst = os.path.join(src, f"{i:02d}_{j}.parquet")
            shutil.copy(f, dst)
            os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    final = _drain(spark, src)
    assert final == {1: 4, 2: 1}  # user 1 completes; user 2 stalls
    shutil.rmtree(base, ignore_errors=True)
