"""Drain == batch for the stream-stream interval join (click-to-view
attribution): the joined pair SET from a multi-micro-batch run equals
the batch join with the identical predicate, including the strict
window boundary."""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_DIR


def test_stream_stream_join_drains_to_batch(spark, tmp_path):
    from rgr_pdal_topo_spark.streaming.joins import (
        attributed_clicks_batch,
        attributed_clicks_stream,
    )
    from rgr_pdal_topo_spark.streaming.windows import (
        events_stream,
        run_to_memory,
    )

    events_dir = tmp_path / "events_ssj"
    spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(
        3
    ).write.parquet(str(events_dir))

    out = attributed_clicks_stream(
        events_stream(spark, str(events_dir)),
        events_stream(spark, str(events_dir)),
        watermark="400 days",
    )
    got = run_to_memory(out, "ssj_test", output_mode="append").toPandas()
    exp = attributed_clicks_batch(
        spark.read.parquet(str(events_dir))
    ).toPandas()
    key = ["user_id", "click_id", "view_id", "lag_sec"]
    gset = set(map(tuple, got[key].itertuples(index=False)))
    eset = set(map(tuple, exp[key].itertuples(index=False)))
    assert len(got) == len(exp) > 0          # no dup emission
    assert gset == eset
    assert (exp.lag_sec >= 0).all() and (exp.lag_sec < 1800).all()


def test_stream_stream_join_strict_boundary(spark, tmp_path):
    """A click exactly at view_ts + 30 min is NOT attributed; one
    second earlier is.  Planted rows through real files -> real
    micro-batches."""
    from rgr_pdal_topo_spark.streaming.joins import (
        attributed_clicks_batch,
        attributed_clicks_stream,
    )
    from rgr_pdal_topo_spark.streaming.windows import (
        events_stream,
        run_to_memory,
    )

    rows = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 10:00:00",   # view
                    "2024-01-01 10:30:00",   # click AT the bound: out
                    "2024-01-01 10:29:59",   # click inside: attributed
                ]
            ),
            "user_id": [5, 5, 5],
            "event_type": ["view", "click", "click"],
            "value": [0.0, 0.0, 0.0],
            "props": ["{}", "{}", "{}"],
        }
    )
    d = tmp_path / "planted_ssj"
    spark.createDataFrame(rows).repartition(2).write.parquet(str(d))
    out = attributed_clicks_stream(
        events_stream(spark, str(d)),
        events_stream(spark, str(d)),
        watermark="400 days",
    )
    got = run_to_memory(out, "ssj_bound", output_mode="append").toPandas()
    assert set(got.click_id) == {3}
    assert got.lag_sec.tolist() == [1799]
    exp = attributed_clicks_batch(spark.read.parquet(str(d))).toPandas()
    assert set(exp.click_id) == {3}
