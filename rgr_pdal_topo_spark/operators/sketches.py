"""Deterministic cardinality sketches (HyperLogLog over portable ids).

The 100 TB planning question every dedup/ANN job asks first is "how many
distinct shingles / tokens / urls are there?" — the answer sizes the
MinHash band tables, the LSH bucket caps, and the IVF list counts, and an
exact COUNT(DISTINCT) at that scale is itself a full shuffle of the key
universe.  This module answers it with a Flajolet-style HyperLogLog
register fold whose scale shape is the best possible one: the raw
(non-distinct!) shingle stream folds map-side into ``M`` registers via
``groupBy(reg).agg(MAX(rho))`` — duplicates cannot move a maximum, so no
``distinct`` and no wide shuffle ever happens; the only thing crossing
the wire is at most ``M`` (reg, rho) int rows per input partition.

Everything is engine-portable and integer-exact up to the single final
division:

* ids are the shared 60-bit portable md5 ids (operators/dedup.py:139) —
  register = ``tid % M`` (low p bits), rho = leading-zero count of the
  remaining 52-bit word + 1, spelled ``53 - LENGTH(bin(w))`` (``bin``
  prints minimal binary digits identically in Spark and DuckDB; w == 0
  maps to the sentinel 53).
* the harmonic denominator ``SUM(2^(53 - rho))`` is an exact BIGINT
  (<= 256 * 2^53 < 2^63), so the sketch itself hashes integer-exactly.
* the estimate is ONE correctly-rounded double division of that integer
  into a single precomputed literal ``ALPHA_M * M^2 * 2^53`` — both
  engines see the same literal and the same int64, so even the float is
  bit-stable (ROUND(,4) guards it anyway).

The register table (not just the estimate) is first-class because HLL
registers MERGE by elementwise max — union two crawls' sketches without
rescanning either, the property that makes the sketch a per-partition /
per-day manifest statistic at scale.

Reference anchor: the same role as the reference's global grid stats
summary (baseGrid.py getGridStats-style one-pass reductions) — a whole-
dataset statistic computed without materializing the dataset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rgr_pdal_topo_spark.operators import dedup

HLL_P = 8                      #: register-index bits
HLL_M = 1 << HLL_P             #: register count (256)
#: rho sentinel / shift base: the post-index word has 60 - p = 52 bits,
#: so rho ranges 1..52 for nonzero words and 53 when the word is zero.
HLL_K = 53
#: bias-corrected alpha for m >= 128 (Flajolet et al. 2007, public)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
#: the whole estimator numerator folded into ONE double literal so both
#: engines perform a single identical division: alpha * m^2 * 2^K
HLL_EST_NUM = HLL_ALPHA * (HLL_M * HLL_M) * float(1 << HLL_K)


def _rho(word: Column) -> Column:
    """Leading-zero rank of the 52-bit word: 53 - bit_length(word), with
    the zero word mapping to the 53 sentinel (all 52 bits zero)."""
    return F.when(word == 0, F.lit(HLL_K)).otherwise(
        F.lit(HLL_K) - F.length(F.bin(word))
    )


def hll_fold(ids: DataFrame, id_col: str = "tid") -> DataFrame:
    """Fold a stream of 60-bit portable ids into (reg, rho) registers.

    The input needs NO distinct: register maxima are multiplicity-blind,
    which is the entire scale story — partial aggregation combines to
    ``HLL_M`` rows map-side before the (tiny) shuffle."""
    tid = F.col(id_col)
    return (
        ids.select(
            (tid % F.lit(HLL_M)).alias("reg"),
            _rho(F.shiftright(tid, HLL_P)).alias("rho"),
        )
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union register tables by elementwise max — the HLL merge law.
    Lets per-partition / per-snapshot sketches combine without rescans."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("reg").agg(F.max("rho").alias("rho"))


def hll_summary(ids: DataFrame, id_col: str = "tid") -> DataFrame:
    """One-row sketch summary: exact distinct count (the verification
    column), set-register count, exact BIGINT harmonic denominator, and
    the rounded HLL estimate.

    Empty registers contribute 2^53 to the denominator (rho = 0); the
    register fold only materializes set registers, so the missing mass
    is added arithmetically: (M - n_set) * 2^53 — integer-exact and
    cheaper than a 256-row dimension join."""
    regs = hll_fold(ids, id_col)
    # F.shiftleft only takes a literal shift; the SQL form shifts by a
    # column (integer-exact: rho <= 53 so the shift stays in [0, 52])
    folded = regs.agg(
        F.count(F.lit(1)).alias("n_regs_set"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_K} - rho)"))
        .alias("set_mass"),
    )
    exact = ids.agg(F.count_distinct(F.col(id_col)).alias("n_exact"))
    harmonic = (
        F.col("set_mass")
        + (F.lit(HLL_M).cast("long") - F.col("n_regs_set"))
        * F.lit(1 << HLL_K).cast("long")
    )
    return (
        exact.crossJoin(folded)
        .withColumn("harmonic_q", harmonic)
        .select(
            "n_exact",
            "n_regs_set",
            "harmonic_q",
            F.round(
                F.lit(HLL_EST_NUM) / F.col("harmonic_q").cast("double"), 4
            ).alias("est"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch (frequency / heavy hitters) — the companion question to
# HLL's "how many distinct": "how often does THIS key occur", answered from
# d*w counters instead of a full per-key groupBy.  Hash rows reuse the
# dedup family's overflow-free split-half permutations
# (operators/dedup.py:148) with a final fold onto CMS_W columns, so the
# whole sketch is integer arithmetic both engines replay exactly.  The
# estimate is MIN over rows of the probed counters — always >= the true
# count (counters only ever over-count on collisions), within eN/CMS_W
# additive error with high probability.  The counter table is <= CMS_D *
# CMS_W rows regardless of input size: it broadcasts for lookups and
# merges by elementwise ADD across partitions/snapshots (cms_merge).
# ---------------------------------------------------------------------------

CMS_D = 4     #: hash rows (error probability ~ exp(-CMS_D))
CMS_W = 4096  #: counters per row (additive error ~ e * N / CMS_W)


def _cms_hashes(tid) -> list[Column]:
    return [
        dedup._permute(
            tid,
            dedup.MINHASH_A[j],
            dedup.MINHASH_C[j],
            dedup.MINHASH_B[j],
            dedup.MINHASH_P,
        )
        % F.lit(CMS_W)
        for j in range(CMS_D)
    ]


def cms_fold(ids: DataFrame, id_col: str = "tid") -> DataFrame:
    """Fold an OCCURRENCE stream of 60-bit ids into (j, h, n) counters.
    Like hll_fold this wants no distinct — frequency is the signal — and
    partial aggregation collapses each partition to <= CMS_D * CMS_W
    rows before the (tiny) shuffle."""
    arr = F.array(*_cms_hashes(F.col(id_col)))
    return (
        ids.select(F.posexplode(arr).alias("j", "h"))
        .groupBy("j", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Counters merge by elementwise sum — the CMS merge law."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "h").agg(F.sum("n").alias("n"))


def cms_lookup(cms: DataFrame, keys: DataFrame, id_col: str = "tid") -> DataFrame:
    """Point-estimate every key's frequency: probe the CMS_D counters and
    take the min.  The counter table is bounded (<= CMS_D * CMS_W rows),
    so it BROADCASTS — the probe never shuffles the key side.  Missing
    cells read as 0 (a key never folded estimates 0 exactly)."""
    cols = [c for c in keys.columns]
    probes = keys.select(
        *cols, F.posexplode(F.array(*_cms_hashes(F.col(id_col)))).alias(
            "__j", "__h"
        )
    )
    joined = probes.join(
        F.broadcast(cms),
        (F.col("__j") == F.col("j")) & (F.col("__h") == F.col("h")),
        "left",
    )
    return joined.groupBy(*cols).agg(
        F.min(F.coalesce(F.col("n"), F.lit(0).cast("long"))).alias("est_n")
    )


# ---------------------------------------------------------------------------
# Histogram quantile sketch — the third classic: "what is the p99", from a
# bounded equi-width histogram instead of a global sort.  Buckets are
# 2^QSK_SHIFT-wide integer ranges, so the fold is one partial+final
# groupBy (counts merge by add, like CMS) and the quantile read is a
# cumulative sum over the BUCKET table (bounded rows — the window never
# sees the data).  Everything is integer arithmetic: the k-th order
# statistic uses the type-1 (discontinuous) definition k = ceil(q * N),
# and the sketch brackets it within one bucket width:
# est_lo <= exact <= est_hi, |est - exact| < 2^QSK_SHIFT by construction.
# The same fold at shift 0 IS the exact computation — one spelling, two
# granularities, so sketch and verification cannot drift.
# ---------------------------------------------------------------------------

QSK_SHIFT = 4  #: bucket width 2^4 = 16 (error bound per quantile)


def hist_fold(vals: DataFrame, col: str, shift: int = QSK_SHIFT) -> DataFrame:
    """(bucket, n) equi-width histogram of a nonnegative integer column.
    shift=0 degenerates to exact value counts (the verification path)."""
    return (
        vals.groupBy(F.shiftright(F.col(col), shift).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def hist_quantile_read(
    hist: DataFrame, n_total: int, q_millis: list[int]
) -> DataFrame:
    """(q_milli, k, bucket) — smallest bucket whose cumulative count
    reaches the k-th order statistic (k = ceil(q_milli * N / 1000),
    integer-exact).  Windows run over the bounded bucket table only."""
    spark = hist.sparkSession
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("n").over(w))
    qs = spark.createDataFrame(
        [(int(q),) for q in q_millis], "q_milli int"
    ).withColumn(
        "k",
        F.expr(
            f"(CAST(q_milli AS BIGINT) * {int(n_total)} + 999) DIV 1000"
        ),
    )
    return (
        qs.join(cum, cum["cum"] >= qs["k"], "inner")
        .groupBy("q_milli", "k")
        .agg(F.min("bucket").alias("bucket"))
    )


def quantile_sketch_summary(
    vals: DataFrame, col: str, q_millis: list[int]
) -> DataFrame:
    """(q_milli, k, est_lo, est_hi, exact) — bracketed sketch estimates
    beside the true order statistics, both read with the SAME fold (the
    sketch at shift QSK_SHIFT, the truth at shift 0)."""
    n_total = vals.count()
    est = hist_quantile_read(
        hist_fold(vals, col, QSK_SHIFT), n_total, q_millis
    ).select(
        "q_milli",
        "k",
        F.shiftleft(F.col("bucket"), QSK_SHIFT).alias("est_lo"),
        (F.shiftleft(F.col("bucket"), QSK_SHIFT)
         + F.lit((1 << QSK_SHIFT) - 1)).alias("est_hi"),
    )
    exact = hist_quantile_read(
        hist_fold(vals, col, 0), n_total, q_millis
    ).select("q_milli", F.col("bucket").alias("exact"))
    return est.join(exact, "q_milli").select(
        "q_milli", "k", "est_lo", "est_hi", "exact"
    )


def shingle_tid_stream(documents: DataFrame, k: int = dedup.SHINGLE_K) -> DataFrame:
    """(tid) — the raw shingle-id stream (per-doc distinct, globally NOT
    distinct): exactly what hll_fold wants, one narrow projection."""
    return (
        dedup.shingles(documents, k)
        .select(dedup._portable_id(F.md5("shingle")).alias("tid"))
    )


def hll_overlap_summary(
    ids_a: DataFrame, ids_b: DataFrame, id_col: str = "tid"
) -> DataFrame:
    """One-row overlap estimate between two id streams via
    inclusion-exclusion over MERGED sketches: est(A ∩ B) =
    est(A) + est(B) - est(A ∪ B), where the union sketch is the
    elementwise register max (hll_merge) — no rescan of either side.

    This is the 100 TB pre-dedup planning question in one cheap pass:
    "how much of crawl B is already in crawl A" decides whether the
    cross-crawl near-dup join is worth scheduling at all, and the union
    sketch comes from the two crawls' already-persisted per-snapshot
    registers (manifest NDV tier) rather than any data scan.  The three
    exact columns (the verification surface) each pay the full distinct
    shuffle the sketch avoids.

    Float discipline: the three harmonic masses are exact BIGINTs; the
    estimate is three correctly-rounded divisions of those integers into
    the ONE shared literal, summed in a fixed spelled order — bit-stable
    across engines, ROUND(,4) guards it anyway."""
    ra = hll_fold(ids_a, id_col).localCheckpoint(eager=True)
    rb = hll_fold(ids_b, id_col).localCheckpoint(eager=True)
    ru = hll_merge(ra, rb)

    def harmonic(regs: DataFrame, out: str) -> DataFrame:
        m = regs.agg(
            F.count(F.lit(1)).alias("ns"),
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_K} - rho)")
            ).alias("sm"),
        )
        return m.select(
            (
                F.col("sm")
                + (F.lit(HLL_M).cast("long") - F.col("ns"))
                * F.lit(1 << HLL_K).cast("long")
            ).alias(out)
        )

    sa = ids_a.select(F.col(id_col).alias("tid")).distinct()
    sb = ids_b.select(F.col(id_col).alias("tid")).distinct()
    exact = (
        sa.agg(F.count(F.lit(1)).alias("n_exact_a"))
        .crossJoin(sb.agg(F.count(F.lit(1)).alias("n_exact_b")))
        .crossJoin(
            sa.join(sb, "tid").agg(F.count(F.lit(1)).alias("n_exact_inter"))
        )
    )
    num = F.lit(HLL_EST_NUM)
    return (
        exact.crossJoin(harmonic(ra, "harmonic_a"))
        .crossJoin(harmonic(rb, "harmonic_b"))
        .crossJoin(harmonic(ru, "harmonic_u"))
        .select(
            "n_exact_a",
            "n_exact_b",
            "n_exact_inter",
            "harmonic_a",
            "harmonic_b",
            "harmonic_u",
            F.round(
                num / F.col("harmonic_a").cast("double")
                + num / F.col("harmonic_b").cast("double")
                - num / F.col("harmonic_u").cast("double"),
                4,
            ).alias("est_inter"),
        )
    )


def hll_fold_grouped(
    ids: DataFrame, keys: tuple[str, ...] = ("lang",), id_col: str = "tid"
) -> DataFrame:
    """(keys..., reg, rho) — one register table PER GROUP in a single
    fold: ``groupBy(keys, reg).max(rho)``.  The grouped twin of
    hll_fold: per-group distinct counts (distinct shingles per language,
    per host, per day-partition) from ONE pass with <= M int rows per
    group crossing the wire — the shape Iceberg's per-partition NDV
    columns and any GROUP BY approx_count_distinct want."""
    tid = F.col(id_col)
    return (
        ids.select(
            *keys,
            (tid % F.lit(HLL_M)).alias("reg"),
            _rho(F.shiftright(tid, HLL_P)).alias("rho"),
        )
        .groupBy(*keys, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_summary_grouped(
    ids: DataFrame, keys: tuple[str, ...] = ("lang",), id_col: str = "tid"
) -> DataFrame:
    """(keys..., n_exact, n_regs_set, harmonic_q, est) — hll_summary per
    group.  n_exact (the verification column) pays the per-group
    distinct the sketch avoids; harmonic_q is the exact BIGINT mass and
    est the single correctly-rounded division, exactly as in the global
    summary."""
    regs = hll_fold_grouped(ids, keys, id_col)
    folded = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_regs_set"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_K} - rho)"))
        .alias("set_mass"),
    )
    exact = ids.groupBy(*keys).agg(
        F.count_distinct(F.col(id_col)).alias("n_exact")
    )
    harmonic = (
        F.col("set_mass")
        + (F.lit(HLL_M).cast("long") - F.col("n_regs_set"))
        * F.lit(1 << HLL_K).cast("long")
    )
    return (
        exact.join(folded, list(keys))
        .withColumn("harmonic_q", harmonic)
        .select(
            *keys,
            "n_exact",
            "n_regs_set",
            "harmonic_q",
            F.round(
                F.lit(HLL_EST_NUM) / F.col("harmonic_q").cast("double"), 4
            ).alias("est"),
        )
    )


# ---------------------------------------------------------------------------
# KMV / bottom-k distinct sketch — the third cardinality answer next to HLL:
# keep the k SMALLEST distinct hash values ever seen; if the k-th smallest
# of n uniform draws from [0, U) sits at h, then n ~ (k-1) * U / h (the
# classic KMV estimator, Bar-Yossef et al. 2002, public).  Two properties
# HLL lacks make it worth carrying alongside:
#   * the sketch IS a uniform sample of the distinct keys — the k survivors
#     can be joined back to carry payloads (e.g. "show me 64 representative
#     distinct shingles"), which registers cannot;
#   * sketches intersect as well as union (bottom-k of the union = bottom-k
#     of concatenated sketches; Jaccard over the combined bottom-k is the
#     theta-sketch trick), so per-snapshot KMVs support set algebra.
# Scale shape: the per-partition fold keeps a BOUNDED (<= k) sorted-unique
# int64 array across Arrow batches (mapInPandas with running state — the
# documented honest Python stage, vectorized via np.unique, never per-row),
# so the shuffle sees <= k rows PER PARTITION; the global cut is a
# TakeOrdered over <= k * P rows.  The full-universe distinct only exists
# as the n_exact verification column.  Everything before the single
# guarded division is integer-exact: ids are the shared 60-bit portable
# md5 ids, the k-th value is a BIGINT, and the estimator numerator
# (k-1) * 2^60 is ONE shared double literal (exactly representable:
# 63 * 2^60 carries 6 significant bits).
# ---------------------------------------------------------------------------

KMV_K = 64                                #: sketch size (stderr ~ 1/sqrt(k-2))
KMV_EST_NUM = float((KMV_K - 1) * (1 << 60))  #: (k-1) * universe, one literal


def kmv_fold(ids: DataFrame, id_col: str = "tid", k: int = KMV_K) -> DataFrame:
    """(tid) — the k smallest DISTINCT 60-bit ids of the stream.

    Bottom-k distributes exactly: bottom-k(distinct(union)) ==
    bottom-k(union of per-partition bottom-k's), so the per-partition
    fold is lossless and the wide stage never sees the key universe."""
    src = ids.select(F.col(id_col).alias("tid"))

    def bottom_k(batches):
        import numpy as np
        import pandas as pd

        best = np.empty(0, dtype=np.int64)
        for pdf in batches:
            vals = pdf["tid"].to_numpy(dtype=np.int64, copy=False)
            best = np.unique(np.concatenate([best, vals]))
            if best.size > k:
                best = best[:k]
        yield pd.DataFrame({"tid": best})

    local = src.mapInPandas(bottom_k, "tid long")
    # <= k rows per input partition reach here; distinct + TakeOrdered
    # run on that bounded set only
    return local.distinct().orderBy("tid").limit(k)


def kmv_merge(*sketches: DataFrame, k: int = KMV_K) -> DataFrame:
    """Union sketches by re-cutting bottom-k over the concatenation —
    the KMV merge law (per-snapshot sketches combine without rescans)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("tid").limit(k)


def kmv_summary(ids: DataFrame, id_col: str = "tid") -> DataFrame:
    """One-row sketch summary: exact distinct count (the verification
    column), the number of survivors actually held, the exact BIGINT
    k-th minimum, and the estimate.  When the stream has fewer than k
    distinct ids the sketch holds the WHOLE set and the estimate is the
    exact count — the standard small-set escape, spelled identically in
    the oracle."""
    bot = kmv_fold(ids, id_col)
    sk = bot.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("tid").alias("kth_q"),
    )
    exact = ids.agg(F.count_distinct(F.col(id_col)).alias("n_exact"))
    return exact.crossJoin(sk).select(
        "n_exact",
        "k_used",
        "kth_q",
        F.when(
            F.col("k_used") < F.lit(KMV_K),
            F.col("k_used").cast("double"),
        )
        .otherwise(
            F.round(
                F.lit(KMV_EST_NUM) / F.col("kth_q").cast("double"), 4
            )
        )
        .alias("est"),
    )


def shingle_tid_stream_by(
    documents: DataFrame, key: str = "lang", k: int = dedup.SHINGLE_K
) -> DataFrame:
    """(key, tid) — the per-doc-distinct shingle-id stream carrying a
    grouping column, input to the grouped fold."""
    d = documents.select(key, dedup._tok_array().alias("toks"))
    sh = d.select(
        key, F.explode(dedup._shingle_array(F.col("toks"), k)).alias("sh")
    )
    return sh.select(key, dedup._portable_id(F.md5("sh")).alias("tid"))
