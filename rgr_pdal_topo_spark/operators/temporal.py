"""Time-series as-of join (backward/forward, optional tolerance).

Spark has no ASOF JOIN (SPARK-22947 is open); the classic workaround — a
range join + argmax per left row — explodes to O(left x captures-per-key)
pairs before the argmax prunes them.  This module implements the
linear-work spelling instead:

  union both sides tagged -> ONE shuffle on the key -> running
  last-non-null carry of the right payload over (ts, tag) order ->
  keep left rows.

No join node at all: each left row picks up the latest right row with
``right_ts <= left_ts`` (backward; ``>=`` forward) from the carry.  At
equal timestamps the right row sorts first (tag 0 < 1), so a same-instant
observation IS visible — the inclusive semantics of pandas
``merge_asof`` and DuckDB ``ASOF JOIN`` (the oracle).

Scale note — the one window per key is sequential per key, so a key with
a 10^9-row timeline serializes.  ``bucket_width`` bounds that: rows
window within (key, time-bucket) partitions instead, and the
cross-bucket carry travels through a bucket-LEVEL cummax (one window
over per-bucket summary rows — cardinality = buckets, not rows) that is
seeded into each bucket as a synthetic pre-first row.  Identical output
(tests pin simple == bucketed), partition size bounded by the bucket
width regardless of key skew.

Reference anchor: J4's closest-value assignment (networkGraph.py:688-741)
is the as-of-in-SPACE twin of this as-of-in-time operator; SURVEY.md §2
listed time-series as-of joins as a gap until this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_TAG = "__asof_tag"
_PAY = "__asof_pay"
_BKT = "__asof_bkt"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    direction: str = "backward",
    tolerance: int | None = None,
    bucket_width: int | None = None,
) -> DataFrame:
    """Attach to each left row the latest right row at-or-before its
    timestamp (``backward``; ``forward`` = earliest at-or-after).

    Output: every left column, then ``matched_ts`` (the matched right
    timestamp, NULL when nothing qualifies) and the right ``payload``
    columns (NULL likewise).  ``tolerance`` (same units as the
    timestamps) drops matches staler than ``|left_ts - matched_ts|``.
    ``bucket_width`` switches to the skew-bounded two-level plan."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    sign = 1 if direction == "backward" else -1
    lcols = left.columns
    r_pay = F.struct(
        F.col(right_ts).cast("long").alias("matched_ts"),
        *[F.col(c) for c in payload],
    )
    r = right.select(
        F.col(key).alias(key),
        (F.lit(sign) * F.col(right_ts).cast("long")).alias(_TS),
        F.lit(0).alias(_TAG),
        r_pay.alias(_PAY),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols
          if c != key],
    )
    l = left.select(
        F.col(key).alias(key),
        (F.lit(sign) * F.col(left_ts).cast("long")).alias(_TS),
        F.lit(1).alias(_TAG),
        F.lit(None).cast(r.schema[_PAY].dataType).alias(_PAY),
        *[F.col(c) for c in lcols if c != key],
    )
    u = r.unionByName(l)

    if bucket_width is None:
        w = (
            Window.partitionBy(key)
            .orderBy(_TS, _TAG)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = u.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))
    else:
        carried = _bucketed_carry(u, key, int(bucket_width))

    out = carried.filter(F.col(_TAG) == 1)
    matched = F.col(_PAY)["matched_ts"]
    if tolerance is not None:
        # staleness in real time regardless of direction: _TS is the
        # signed left ts, so staleness = _TS - sign * matched_ts
        # (backward: left - matched; forward: matched - left)
        ok = (F.col(_TS) - F.lit(sign) * matched) <= F.lit(int(tolerance))
        out = out.withColumn(
            _PAY, F.when(ok, F.col(_PAY)).otherwise(F.lit(None))
        )
    return out.select(
        key,
        *[c for c in lcols if c != key],
        F.col(_PAY)["matched_ts"].alias("matched_ts"),
        *[F.col(_PAY)[c].alias(c) for c in payload],
    )


def _bucketed_carry(u: DataFrame, key: str, width: int) -> DataFrame:
    """Two-level carry: window within (key, bucket), with the latest
    right payload from ALL earlier buckets seeded in as a synthetic
    pre-first row per bucket.

    The cross-bucket state rides a window over per-(key, bucket) summary
    rows — cardinality is the number of occupied buckets, not the number
    of input rows, so no partition anywhere exceeds one bucket's rows +
    one seed."""
    b = u.withColumn(_BKT, F.floor(F.col(_TS) / F.lit(width)))
    # latest right payload inside each (key, bucket): argmax on (ts, tag)
    per_bkt = (
        b.filter(F.col(_TAG) == 0)
        .groupBy(key, _BKT)
        .agg(F.max_by(_PAY, F.struct(_TS, _TAG)).alias("__last_r"))
    )
    # bucket universe = every occupied bucket (left or right rows)
    universe = b.select(key, _BKT).distinct()
    wb = (
        Window.partitionBy(key)
        .orderBy(_BKT)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seeds = (
        universe.join(per_bkt, [key, _BKT], "left")
        .withColumn("__seed", F.last("__last_r", ignorenulls=True).over(wb))
        .filter(F.col("__seed").isNotNull())
        .select(
            key,
            _BKT,
            # sorts before every real row of its bucket: ts below the
            # bucket's floor, tag -1 below right rows
            (F.col(_BKT) * F.lit(width) - F.lit(1)).alias(_TS),
            F.lit(-1).alias(_TAG),
            F.col("__seed").alias(_PAY),
        )
    )
    other = [c for c in u.columns if c not in (key, _TS, _TAG, _PAY)]
    for c in other:
        seeds = seeds.withColumn(c, F.lit(None).cast(u.schema[c].dataType))
    w = (
        Window.partitionBy(key, _BKT)
        .orderBy(_TS, _TAG)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        b.unionByName(seeds.select(*b.columns))
        .withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))
    )


def sweep_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Per-bucket peak concurrency of closed intervals — the sweep-line
    ("how many sessions are open right now") statistic, spelled as a
    TWO-LEVEL SEGMENTED PREFIX SCAN instead of one global running sum.

    Semantics: an interval is open at instant t iff start <= t <= end
    (closed on both ends; timestamps are microsecond-granular, so the
    -1 boundary event fires at end + 1 microsecond).  For every time
    bucket containing at least one boundary event the output row
    carries

      bucket_ts   DATE_TRUNC(bucket) of the boundary instants
      n_changes   boundary events in the bucket (BIGINT)
      peak        max open-interval count reached in the bucket
      end_level   open-interval count after the bucket's last boundary

    (buckets strictly inside a long interval have no boundary and no
    row — their level is the previous row's end_level by construction).

    Scale shape — the reason this module spelling exists: the naive
    sweep is ONE window over the globally time-ordered boundary stream
    (the oracle's spelling), which at 10^11 boundaries is a
    single-ordering sort with a sequential tail.  Here the running sum
    is split the textbook way (Blelloch's two-phase scan): boundary
    deltas aggregate per distinct instant (map-side combinable), the
    within-bucket running sum windows over (bucket) partitions — each
    bounded by the bucket width — and the cross-bucket carry is a
    cumulative sum over the BUCKET ROLLUP (cardinality = buckets, not
    boundaries) joined back.  Every count is an exact BIGINT; nothing
    to round, no Python anywhere.  The same decomposition is
    asof_join's ``bucket_width`` carry with SUM in place of
    last-non-null.
    """
    # both boundary events leave ONE interval row via an inline explode —
    # a union of a +1 and a -1 projection would replay the (possibly
    # expensive) interval-building subtree twice, once per branch
    boundary = F.explode(
        F.array(
            F.struct(F.col(start_col).alias("t"), F.lit(1).alias("d")),
            F.struct(
                (F.col(end_col) + F.expr("INTERVAL 1 MICROSECOND")).alias(
                    "t"
                ),
                F.lit(-1).alias("d"),
            ),
        )
    )
    deltas = (
        intervals.select(boundary.alias("b"))
        .select(F.col("b.t").alias("t"), F.col("b.d").alias("d"))
        .groupBy("t")
        .agg(
            F.sum("d").cast("long").alias("d"),
            F.count(F.lit(1)).cast("long").alias("nc"),
        )
        .withColumn("bucket_ts", F.date_trunc(bucket, F.col("t")))
    )
    win = (
        Window.partitionBy("bucket_ts")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = deltas.withColumn("run", F.sum("d").over(win).cast("long"))
    per_bucket = within.groupBy("bucket_ts").agg(
        F.sum("d").cast("long").alias("s"),
        F.sum("nc").cast("long").alias("n_changes"),
        F.max("run").cast("long").alias("peak_within"),
    )
    carry_w = Window.orderBy("bucket_ts").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        per_bucket.withColumn(
            "carry", F.coalesce(F.sum("s").over(carry_w), F.lit(0)).cast("long")
        )
        .select(
            "bucket_ts",
            "n_changes",
            (F.col("carry") + F.col("peak_within")).alias("peak"),
            (F.col("carry") + F.col("s")).alias("end_level"),
        )
    )


def interval_self_join(
    intervals: DataFrame,
    keys: list[str],
    start: str = "s_start",
    end: str = "s_end",
    bucket_s: int = 3600,
) -> DataFrame:
    """All overlapping pairs of CLOSED intervals [start, end] — the
    interval range join — as a bucket-replicated EQUI-join: each
    interval replicates to the time buckets it spans, candidates meet
    on the bucket key, and a pair is kept only in the bucket of the
    LATER start, so every overlapping pair materializes EXACTLY once
    with no dedup step (the pip_partitioned cover-cell trick in time).

    Returns one row per unordered pair (lexicographic on ``keys``):
    the left/right key columns suffixed _a/_b plus ``ov_us``, the exact
    overlap duration in microseconds (0 = touching endpoints; closed
    intervals touch-count, matching DuckDB's BETWEEN spelling).

    Why not a plain range join: Spark plans ``a.start <= b.end AND
    b.start <= a.end`` as a nested-loop product.  With bucketing the
    join is a hash join on the bucket key, and the replication factor
    is ceil(duration / bucket_s) + 1 — pick ``bucket_s`` at the upper
    end of the duration distribution (sessions here are gap-bounded).

    Exactness: bucket ids and overlaps are exact BIGINT microsecond
    arithmetic (unix_micros — the views_asof spelling); there is no
    float anywhere.

    Scale shape: one explode (bounded fan-out), one hash equi-join on
    the bucket key, no cartesian/BNLJ node (plan-pinned), no window.
    Skewed buckets (a flash-crowd hour) salt like any hot join key;
    the meet-bucket rule is salt-compatible because it depends only on
    the pair's own timestamps."""
    w_us = bucket_s * 1_000_000
    # unix_micros requires TIMESTAMP; the driver tables carry
    # TIMESTAMP_NTZ and the session timezone is pinned to UTC, so the
    # cast is value-preserving (the streaming/windows.py precedent)
    t = intervals.select(
        *keys,
        F.unix_micros(F.col(start).cast("timestamp")).alias("t0"),
        F.unix_micros(F.col(end).cast("timestamp")).alias("t1"),
    )
    r = t.select(
        *keys, "t0", "t1",
        F.explode(
            F.expr(f"sequence(t0 DIV {w_us}, t1 DIV {w_us})")
        ).alias("bkt"),
    )
    a, b = r.alias("a"), r.alias("b")
    ka = F.struct(*[F.col(f"a.{k}") for k in keys])
    kb = F.struct(*[F.col(f"b.{k}") for k in keys])
    later_start = F.greatest(F.col("a.t0"), F.col("b.t0"))
    pairs = a.join(
        b,
        (F.col("a.bkt") == F.col("b.bkt"))
        & (ka < kb)
        & (F.col("a.t0") <= F.col("b.t1"))
        & (F.col("b.t0") <= F.col("a.t1"))
        & (later_start - (later_start % w_us) == F.col("a.bkt") * w_us),
    )
    sel = [F.col(f"a.{k}").alias(f"{k}_a") for k in keys]
    sel += [F.col(f"b.{k}").alias(f"{k}_b") for k in keys]
    sel.append(
        (F.least(F.col("a.t1"), F.col("b.t1")) - later_start)
        .alias("ov_us")
    )
    return pairs.select(*sel)


def union_coverage(
    intervals: DataFrame,
    start: str = "s_start",
    end: str = "s_end",
    bucket_s: int = 3600,
) -> DataFrame:
    """Exact covered time of the UNION of half-open microsecond
    intervals [t0, t1), per ``bucket_s`` bucket — the Lebesgue-measure
    companion of sweep_concurrency (which reports the level's PEAK;
    this is the integral of ``level > 0``): "how much wall-clock had at
    least one open session".  Merging overlapping AND touching
    intervals is free under the net-delta spelling: +1 at t0 and -1 at
    t1 folded per distinct instant make a touch (one -1 and one +1 at
    the same t) cancel, so the level never dips to 0 between abutting
    intervals.  Zero-length intervals (t0 == t1) net to nothing and
    contribute nothing, exactly like their measure.

    Returns (bkt, covered_us): bucket index (epoch_us DIV bucket) and
    the exact BIGINT covered microseconds within it.  Buckets with no
    overlapping interval have no row (outer-join zeros are the
    caller's rollup choice).

    Scale shape — no global ordered scan: every interval is CLIPPED to
    the buckets it spans (bounded fan-out for gap-bounded sessions,
    the interval_self_join discipline), so each bucket's sweep is
    self-contained: the clipped level returns to 0 at the bucket edge,
    the within-bucket running sum windows over (bkt) partitions only
    — bounded by the bucket's boundary count — and the last boundary
    in a bucket always has level 0, so the missing LEAD there is
    harmless by construction, not by convention.  All-integer; no
    Python; the only cross-bucket coupling is the final rollup the
    caller applies."""
    w_us = bucket_s * 1_000_000
    t = (
        intervals.select(
            F.unix_micros(F.col(start).cast("timestamp")).alias("t0"),
            F.unix_micros(F.col(end).cast("timestamp")).alias("t1"),
        )
        .filter(F.col("t1") > F.col("t0"))
    )
    clipped = (
        t.select(
            "t0", "t1",
            F.explode(
                F.expr(f"sequence(t0 DIV {w_us}, (t1 - 1) DIV {w_us})")
            ).alias("bkt"),
        )
        .select(
            "bkt",
            F.greatest(F.col("t0"), F.col("bkt") * w_us).alias("c0"),
            F.least(F.col("t1"), (F.col("bkt") + 1) * w_us).alias("c1"),
        )
    )
    deltas = (
        clipped.select("bkt", F.col("c0").alias("t"), F.lit(1).alias("d"))
        .unionByName(
            clipped.select(
                "bkt", F.col("c1").alias("t"), F.lit(-1).alias("d")
            )
        )
        .groupBy("bkt", "t")
        .agg(F.sum("d").alias("dd"))
    )
    w = Window.partitionBy("bkt").orderBy("t")
    sc = deltas.select(
        "bkt",
        "t",
        F.sum("dd").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("lvl"),
        F.lead("t").over(w).alias("nt"),
    )
    return sc.groupBy("bkt").agg(
        F.sum(
            F.when(F.col("lvl") > 0, F.col("nt") - F.col("t")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("covered_us")
    )


DAY_US = 86_400_000_000


def daily_coverage(
    intervals: DataFrame,
    start: str = "s_start",
    end: str = "s_end",
) -> DataFrame:
    """Per-day (day, n_started, covered_us, cov_ratio) over an interval
    table: union_coverage's hourly cells rolled up to epoch days plus
    the sessions-STARTED count, full-outer-joined so a day covered only
    by a session that started the previous day keeps n_started = 0 and
    a day of only zero-length sessions keeps covered_us = 0.  The one
    float is covered_us / day — a correctly-rounded division of exact
    integers, ROUND(,6)-guarded.  Shared verbatim by the batch
    session_coverage query and the streaming drain (so drain == batch
    pins the interval SET, not a re-derivation)."""
    cov = (
        union_coverage(intervals, start, end, bucket_s=3600)
        .groupBy(F.expr("bkt DIV 24").alias("day"))
        .agg(F.sum("covered_us").cast("long").alias("covered_us"))
    )
    st = intervals.groupBy(
        F.expr(
            f"unix_micros(CAST({start} AS TIMESTAMP)) DIV {DAY_US}"
        ).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_started"))
    return cov.join(st, "day", "full").select(
        "day",
        F.coalesce(F.col("n_started"), F.lit(0)).cast("long").alias(
            "n_started"
        ),
        F.coalesce(F.col("covered_us"), F.lit(0)).cast("long").alias(
            "covered_us"
        ),
        F.round(
            F.coalesce(F.col("covered_us"), F.lit(0)).cast("double")
            / F.lit(float(DAY_US)),
            6,
        ).alias("cov_ratio"),
    )


def series_autocorr(series: DataFrame, lags: list) -> DataFrame:
    """Pearson autocorrelation of an integer time series at the given
    integer lags — the periodicity detector (daily/weekly traffic
    rhythm) over an (t, c) table that MUST be dense (missing ticks
    pre-filled with 0; on a sparse table a lag join silently skips
    gaps and the statistic stops being an autocorrelation).

    Returns (lag, n, r): pair count and ROUND(r, 6) per lag.

    Exactness: the five accumulators (sx, sy, sxy, sxx, syy) and the
    three moment combinations n*sxy - sx*sy etc. are exact BIGINTs;
    r's denominator is sqrt of their exact product — sqrt IS correctly
    rounded under IEEE-754 (unlike ln/exp), so both engines compute
    bit-identical doubles from identical integers and the one division
    is correctly rounded, ROUND(,6)-guarded.  (The moment products
    stay inside int64 for series up to ~10^4 ticks of ~10^3 counts;
    longer series should pre-aggregate to coarser ticks first.)

    Scale shape: the series is a TICK-GRAIN rollup (hours: 10^4 rows
    for a year), so the lag replication (x |lags|) and the per-lag
    shifted equi-join run on bounded aggregates, never raw events."""
    la = series.select(
        "t", "c", F.explode(F.array(*[F.lit(x) for x in lags])).alias("lag")
    )
    lb = series.select(
        F.col("t").alias("tb"), F.col("c").alias("cb")
    )
    pairs = la.join(
        lb, F.col("tb") == F.col("t") + F.col("lag")
    )
    mom = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sx"),
        F.sum("cb").alias("sy"),
        F.sum(F.col("c") * F.col("cb")).alias("sxy"),
        F.sum(F.col("c") * F.col("c")).alias("sxx"),
        F.sum(F.col("cb") * F.col("cb")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return mom.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n"),
        F.round(
            num.cast("double") / F.sqrt((dx * dy).cast("double")), 6
        ).alias("r"),
    )


MK_Q13 = 8192  #: Theil-Sen slope quantization grid (2^-13, repo-wide)


def mann_kendall(
    events: DataFrame,
    group: str = "event_type",
    day_col: str | None = None,
) -> DataFrame:
    """(event_type, n_days, s_stat, var18, slope_ts) — the
    Mann-Kendall monotonic-trend test plus the Theil-Sen robust slope
    over each group's DAILY count series: the standard
    is-this-metric-drifting pair for operational time series (crawl
    volume, error rates), robust where slope_area_fit's OLS is not
    (one outlier day moves OLS arbitrarily; it moves these two not at
    all).

      s_stat = sum over day pairs i<j of sign(c_j - c_i)   (integer)
      var18  = n(n-1)(2n+5) - sum_ties t(t-1)(2t+5)        (integer;
               exactly 18x the tie-corrected Var[S] — kept as the
               exact integer numerator, no float variance ever forms)
      slope_ts = median over pairs of (c_j - c_i)/(d_j - d_i),
               each slope pinned to the 2^-13 grid BEFORE the median

    Cross-engine exactness: counts, day indices, signs, the variance
    polynomial — all integer.  Each pair slope is ONE correctly-rounded
    IEEE division of integer-valued doubles (bit-identical in both
    engines), the *8192 is an exact exponent shift and FLOOR(+0.5)
    lands on integers; the median of those integers is (lo + hi) / 2
    over the two middle order statistics — exact in float64 and equal
    to DuckDB's interpolating median because every quantity is an
    exactly-representable integer.  The final /8192.0 is exact.

    Scale shape: the pair join is quadratic in DISTINCT TIME BUCKETS,
    not rows — the heavy lift is the first partial+final groupBy that
    folds 10^12 events into (group, day) counts; a 10-year daily
    series is ~3.7k buckets -> ~6.6M pairs per group, and the pair
    join shuffles on the group key only (tiny aggregate input).  The
    per-group median runs over that bounded pair set.
    """
    day = (
        F.col(day_col).cast("long")
        if day_col
        else F.unix_date(F.to_date("ts")).cast("long")
    )
    daily = events.groupBy(
        F.col(group), day.alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))

    a, b = daily.alias("a"), daily.alias("b")
    ac, bc = F.col("a.c"), F.col("b.c")
    pairs = a.join(
        b,
        (F.col(f"a.{group}") == F.col(f"b.{group}"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col(f"a.{group}").alias(group),
        F.when(bc > ac, F.lit(1)).when(bc < ac, F.lit(-1))
        .otherwise(F.lit(0)).alias("sgn"),
        F.floor(
            (bc - ac).cast("double")
            / (F.col("b.d") - F.col("a.d")).cast("double")
            * F.lit(float(MK_Q13))
            + F.lit(0.5)
        ).cast("long").alias("sq"),
    )

    w = Window.partitionBy(group).orderBy("sq")
    ranked = pairs.withColumn("rn", F.row_number().over(w))
    np_ = pairs.groupBy(group).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("sgn").cast("long").alias("s_stat"),
    )
    med = (
        ranked.join(np_, group)
        .filter(
            (F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2))
            | (F.col("rn") == F.floor(F.col("n_pairs") / 2) + 1)
        )
        .groupBy(group)
        .agg(
            (
                (F.min("sq") + F.max("sq")).cast("double")
                / F.lit(2.0)
                / F.lit(float(MK_Q13))
            ).alias("slope_ts"),
            F.first("s_stat").alias("s_stat"),
        )
    )

    nd = daily.groupBy(group).agg(F.count(F.lit(1)).alias("n_days"))
    ties = (
        daily.groupBy(group, "c")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy(group)
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("long").alias("tie_term")
        )
    )
    n = F.col("n_days")
    return (
        nd.join(med, group)
        .join(ties, group, "left")
        .select(
            group,
            "n_days",
            "s_stat",
            (
                n * (n - 1) * (2 * n + 5)
                - F.coalesce(F.col("tie_term"), F.lit(0))
            ).cast("long").alias("var18"),
            "slope_ts",
        )
    )


DECAY_K = 40  # weight grid: newest-day weight 2^K, halves per day


def decayed_counts(
    events: DataFrame,
    group: str = "event_type",
    day_col: str | None = None,
) -> DataFrame:
    """(group, n_events, n_live, score_q, score): exponentially
    recency-decayed activity per group — the freshness signal behind
    re-crawl scheduling and trending-topic ranking, where a plain
    COUNT weighs a year-old event like yesterday's.

    Each event weighs 2^(DECAY_K - age_days) with age measured in
    whole epoch-days back from the NEWEST day in the table (the
    data-derived reference point, so the result is replayable), i.e. a
    one-day half-life on a dyadic grid; events older than DECAY_K days
    weigh exactly 0 (n_live counts the others).  Exactness: ages are
    integers, every weight is an exact BIGINT power of two (bit shift,
    no POWER()), score_q is an exact BIGINT sum bounded by
    n_events * 2^40 (ANSI-safe to ~8M events per group per 2^63; a
    larger corpus lowers DECAY_K), and the reported score is the one
    shared CAST / 2^40 spelling.

    The halving is per-DAY-bucket, not per-second — that is what makes
    the non-associative-looking exponential decay an exact associative
    SUM (the same bucketing trick as the histogram sketch).  Scale
    shape: one scalar max broadcast as a 1-row frame, one projection,
    one partial+final groupBy.

    ``day_col`` names a precomputed integer epoch-day column (e.g. a
    fetch log's warc_epoch // 86400); default derives it from ``ts``."""
    day = (
        F.col(day_col)
        if day_col
        else (F.unix_timestamp("ts") / 86400).cast("long")
    )
    d = events.select(F.col(group), day.alias("day"))
    ref = d.agg(F.max("day").alias("ref_day"))
    aged = d.crossJoin(F.broadcast(ref)).select(
        group,
        (F.col("ref_day") - F.col("day")).alias("age"),
    )
    w = F.when(
        F.col("age") <= DECAY_K,
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST({DECAY_K} - age AS INT))"
        ),
    ).otherwise(F.lit(0).cast("long"))
    return (
        aged.withColumn("w", w)
        .groupBy(group)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("w") > 0, 1).otherwise(0)).alias(
                "n_live"
            ),
            F.sum("w").alias("score_q"),
        )
        .withColumn(
            "score",
            F.col("score_q").cast("double") / F.lit(float(1 << DECAY_K)),
        )
    )
