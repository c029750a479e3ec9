"""Streaming twin of the batch ``session_peaks`` sweep (SURVEY.md §2.10).

The batch query answers "how many sessions were open at once, per hour"
over gap-based sessions; this module produces the SAME interval set
from the live event stream, so the sweep-line levels computed from a
drained stream equal the batch query's rows bit-for-bit.

The bridge is the session_window boundary identity already pinned in
tests/test_pipeline_extras.py: Spark's merge-on-touching semantics make
``w.start`` the session's FIRST event timestamp and ``w.end`` its LAST
event timestamp plus the gap, exactly — so ``[w.start, w.end - gap]``
is the batch sessionize interval ``[MIN(ts), MAX(ts)]`` with no float
or rounding anywhere (timestamp arithmetic is exact integer
microseconds).  Composing the already-verified pieces, rather than
re-deriving levels statefully, keeps ONE sweep implementation
(operators/temporal.py ``sweep_concurrency``) as the single source of
truth for the +-1-at-the-boundary semantics.

Scale shape: session state is Spark's own session-window store (one
open interval per active user inside the watermark horizon); the
drained interval table is sessions-sized (two boundary events each),
orders of magnitude below the event stream, and the sweep's only
global window runs over the hour rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgr_pdal_topo_spark.operators.temporal import sweep_concurrency
from rgr_pdal_topo_spark.streaming.windows import session_counts_stream


def session_intervals_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming (user_id, s_start, s_end, n_events) session intervals
    in the batch sessionize convention ([first event, last event]):
    ``session_window`` merge state does the sessionization, and the
    gap is subtracted back off the window end (exact timestamp
    arithmetic) so the interval matches ``MAX(ts)`` — the identity the
    boundary-semantics test pins."""
    s = session_counts_stream(events, gap=gap, watermark=watermark)
    return s.select(
        "user_id",
        F.col("session_start").alias("s_start"),
        (F.col("session_end") - F.expr(f"INTERVAL {gap}")).alias("s_end"),
        "n_events",
    )


def peaks_from_drained(intervals: DataFrame) -> DataFrame:
    """Per-hour (bucket_ts, n_changes, peak, end_level) over a DRAINED
    interval table — the batch sweep applied to the stream's output;
    equals the ``session_peaks`` query exactly once every session has
    closed (tests/test_streaming_concurrency.py)."""
    return sweep_concurrency(intervals, "s_start", "s_end", bucket="hour")


def coverage_from_drained(intervals: DataFrame) -> DataFrame:
    """Per-day (day, n_started, covered_us, cov_ratio) over a DRAINED
    interval table — the batch ``daily_coverage`` applied verbatim to
    the stream's session intervals; equals the oracle-backed
    ``session_coverage`` query exactly once every session has closed
    (tests/test_streaming_concurrency.py)."""
    from rgr_pdal_topo_spark.operators.temporal import daily_coverage

    return daily_coverage(intervals)
