"""Drain == batch for the streaming session-concurrency sweep: the
gauge computed from a multi-micro-batch stream's session intervals must
equal the oracle-backed batch ``session_peaks`` query bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_streaming_sweep_drains_to_session_peaks(spark, tmp_path):
    from rgr_pdal_topo_spark.queries import QUERIES
    from rgr_pdal_topo_spark.streaming.concurrency import (
        peaks_from_drained,
        session_intervals_stream,
    )
    from rgr_pdal_topo_spark.streaming.windows import (
        events_stream,
        run_to_memory,
    )

    events_dir = tmp_path / "events_conc"
    # 3 files -> 3 micro-batches: session merges and therefore interval
    # boundaries must come out right ACROSS micro-batch boundaries
    spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(3).write.parquet(
        str(events_dir)
    )

    stream = session_intervals_stream(
        events_stream(spark, str(events_dir)), watermark="400 days"
    )
    drained = run_to_memory(stream, "conc_test", output_mode="complete")

    got = (
        peaks_from_drained(drained)
        .toPandas()
        .sort_values("bucket_ts")
        .reset_index(drop=True)
    )
    exp = (
        QUERIES["session_peaks"](spark, SF_DIR)
        .toPandas()
        .sort_values("bucket_ts")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    for c in ("bucket_ts", "n_changes", "peak", "end_level"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # non-vacuity: the stream's intervals really did overlap somewhere
    assert int(exp["peak"].max()) >= 2


def test_interval_stream_matches_batch_sessionize_intervals(spark, tmp_path):
    """The interval mapping itself: [w.start, w.end - gap] from the
    drained stream equals the batch [MIN(ts), MAX(ts)] per-session
    intervals as a SET (the sweep only sees the interval multiset, so
    this is the precise precondition for drain == batch)."""
    from rgr_pdal_topo_spark.streaming.concurrency import (
        session_intervals_stream,
    )
    from rgr_pdal_topo_spark.streaming.windows import (
        events_stream,
        run_to_memory,
    )
    from pyspark.sql import Window

    events_dir = tmp_path / "events_iv"
    spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(3).write.parquet(
        str(events_dir)
    )
    drained = run_to_memory(
        session_intervals_stream(
            events_stream(spark, str(events_dir)), watermark="400 days"
        ),
        "iv_test",
        output_mode="complete",
    )
    got = {
        (r["s_start"], r["s_end"])
        for r in drained.select("s_start", "s_end").collect()
    }

    ev = spark.read.parquet(str(events_dir)).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    wuo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag = F.lag("ts").over(wuo)
    g = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(lag.isNull(), 0)
        .when(F.col("ts") > lag + F.expr("INTERVAL 30 MINUTE"), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    s = g.withColumn(
        "sid",
        F.sum("is_new").over(wuo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    exp = {
        (r["a"], r["b"])
        for r in s.groupBy("user_id", "sid")
        .agg(F.min("ts").alias("a"), F.max("ts").alias("b"))
        .collect()
    }
    assert got == exp and len(got) > 0


def test_streaming_coverage_drains_to_session_coverage(spark, tmp_path):
    """Drain == batch for the interval-UNION coverage: daily covered
    time computed from the drained stream's session intervals equals
    the oracle-backed batch session_coverage query bit-for-bit."""
    from rgr_pdal_topo_spark.queries import QUERIES
    from rgr_pdal_topo_spark.streaming.concurrency import (
        coverage_from_drained,
        session_intervals_stream,
    )
    from rgr_pdal_topo_spark.streaming.windows import (
        events_stream,
        run_to_memory,
    )

    events_dir = tmp_path / "events_cov"
    spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(3).write.parquet(
        str(events_dir)
    )
    drained = run_to_memory(
        session_intervals_stream(
            events_stream(spark, str(events_dir)), watermark="400 days"
        ),
        "cov_drain_test",
        output_mode="complete",
    )
    got = (
        coverage_from_drained(drained)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    exp = (
        QUERIES["session_coverage"](spark, SF_DIR)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    for c in ("day", "n_started", "covered_us", "cov_ratio"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # non-vacuity: some day is partially covered (0 < ratio < 1)
    assert ((exp["cov_ratio"] > 0) & (exp["cov_ratio"] < 1)).any()
