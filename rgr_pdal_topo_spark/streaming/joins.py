"""Stream-stream interval join: click-to-view attribution.

The last Structured-Streaming capability the engine's streaming surface
had not exercised: joining TWO unbounded streams on a key + time-range
condition.  Spark buffers both sides in the state store and uses the two
watermarks plus the range bound to expire state — exactly the mechanics
a production attribution pipeline (ad view -> click within the window)
relies on; without the range bound the state would grow without limit.

Semantics pinned by tests/test_streaming_joins.py: the drained
stream-stream join equals the BATCH join with the identical predicate
row-for-row (drain == batch, the house streaming contract), including
the strict upper bound (a click exactly at view_ts + window is NOT
attributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTR_WINDOW = "30 minutes"


def _sides(events: DataFrame):
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    return clicks, views


_COND = (
    "c_user = v_user AND view_ts <= click_ts "
    f"AND click_ts < view_ts + interval {ATTR_WINDOW}"
)


def attributed_clicks_stream(
    clicks_src: DataFrame,
    views_src: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: every (click, preceding view within
    ATTR_WINDOW) pair per user.  Both sides carry watermarks so the
    state store can discard views older than watermark + window and
    clicks older than watermark — bounded state on unbounded input."""
    c = _sides(clicks_src)[0].withWatermark("click_ts", watermark)
    v = _sides(views_src)[1].withWatermark("view_ts", watermark)
    return c.join(v, F.expr(_COND), "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "view_id",
        (
            F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts")
        ).alias("lag_sec"),
    )


def attributed_clicks_batch(events: DataFrame) -> DataFrame:
    """The batch twin: identical predicate, identical output columns."""
    clicks, views = _sides(events)
    return clicks.join(views, F.expr(_COND), "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "view_id",
        (
            F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts")
        ).alias("lag_sec"),
    )
