"""Deduplication operators over the documents table.

Web-scale training pipelines dedup at several strengths; each operator here
is a pure DataFrame composition designed for the 100 TB shape:

  * exact:     one hash agg on the text (content-defined key);
  * minhash:   token-set signatures -> LSH band buckets -> candidate pairs
               (band bucket join replaces the all-pairs O(n^2));
  * simhash:   bitwise fingerprint via sign-of-weighted-sum, hamming
               bucketing;
  * jaccard:   exact token-set verification on (small) candidate sets.

PARITY DESIGN: token ids come from a dense_rank over the distinct-token
dimension (deterministic binary string order in both Spark and DuckDB), and
all hash mixing is explicit integer arithmetic — the DuckDB oracle can run
the identical math.  At true 100 TB scale the rank dimension would be
replaced by a 64-bit string hash (xxhash/md5 prefix); the rank form is the
oracle-checkable spelling of the same plan (one broadcast dim join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# MinHash permutation parameters: (a_j, b_j) over prime P.
MINHASH_P = 2147483647
N_PERM = 16
MINHASH_A = [(2 * j + 1) * 2654435761 % MINHASH_P for j in range(N_PERM)]
MINHASH_B = [(j * 40503 + 12345) % MINHASH_P for j in range(N_PERM)]

SIMHASH_BITS = 16


def tokens(documents: DataFrame) -> DataFrame:
    """(doc_id, tok) — whitespace tokenization, empty tokens dropped."""
    return documents.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")


def token_ids(documents: DataFrame) -> DataFrame:
    """(doc_id, tid) distinct — tid = dense_rank of token (1-based)."""
    toks = tokens(documents).distinct()
    vocab = toks.select("tok").distinct().withColumn(
        "tid", F.dense_rank().over(Window.orderBy("tok"))
    )
    return toks.join(F.broadcast(vocab), "tok").select("doc_id", "tid")


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Exact dedup groups: (canonical doc, group size) per distinct text."""
    return documents.groupBy("text").agg(
        F.min("doc_id").alias("canonical_doc"),
        F.count(F.lit(1)).alias("group_size"),
    ).select("canonical_doc", "group_size")


def minhash_signatures(doc_tids: DataFrame, n_perm: int = N_PERM) -> DataFrame:
    """(doc_id, perm, minhash) long-form signature."""
    spark = doc_tids.sparkSession
    perms = spark.createDataFrame(
        [(j, MINHASH_A[j], MINHASH_B[j]) for j in range(n_perm)],
        "perm int, a long, b long",
    )
    h = (F.col("a") * F.col("tid") + F.col("b")) % F.lit(MINHASH_P)
    return (
        doc_tids.crossJoin(F.broadcast(perms))
        .groupBy("doc_id", "perm")
        .agg(F.min(h).alias("minhash"))
    )


def _check_banding(bands: int, rows_per_band: int) -> None:
    if bands * rows_per_band != N_PERM:
        raise ValueError(
            f"bands ({bands}) x rows_per_band ({rows_per_band}) must equal "
            f"N_PERM ({N_PERM})"
        )


def lsh_band_buckets(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """(band, band_key, n_docs, canonical_doc): docs sharing a band key are
    near-dup candidates.  band_key mixes the band's row minhashes
    order-sensitively (31^pos weights — exact int64 arithmetic)."""
    _check_banding(bands, rows_per_band)
    sig = signatures.withColumn(
        "band", (F.col("perm") / F.lit(rows_per_band)).cast("int")
    ).withColumn("pos", F.col("perm") % F.lit(rows_per_band))
    mixed = sig.groupBy("doc_id", "band").agg(
        F.sum(
            F.col("minhash")
            * F.pow(F.lit(31.0), F.col("pos").cast("double")).cast("long")
        ).alias("band_key")
    )
    return mixed.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("canonical_doc"),
    )


def minhash_candidate_pairs(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one band key."""
    _check_banding(bands, rows_per_band)
    sig = signatures.withColumn(
        "band", (F.col("perm") / F.lit(rows_per_band)).cast("int")
    ).withColumn("pos", F.col("perm") % F.lit(rows_per_band))
    mixed = sig.groupBy("doc_id", "band").agg(
        F.sum(
            F.col("minhash")
            * F.pow(F.lit(31.0), F.col("pos").cast("double")).cast("long")
        ).alias("band_key")
    )
    l = mixed.select(
        F.col("doc_id").alias("doc_a"), "band", "band_key"
    )
    r = mixed.select(
        F.col("doc_id").alias("doc_b"), "band", "band_key"
    )
    return (
        l.join(r, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_pairs(doc_tids: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact token-set Jaccard for given (doc_a, doc_b) pairs."""
    sizes = doc_tids.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = doc_tids.select(F.col("doc_id").alias("doc_a"), "tid")
    b = doc_tids.select(F.col("doc_id").alias("doc_b"), "tid")
    inter = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "tid"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
    )


def simhash(doc_tids: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): bit b = 1 iff sum over tokens of
    (((tid * P_b + C_b) % 1000) - 499.5) > 0 — all-integer/half-integer,
    bit-reproducible in any engine."""
    spark = doc_tids.sparkSession
    bit_tbl = spark.createDataFrame(
        [(b, (2 * b + 3) * 2654435761 % MINHASH_P, (b * 69621 + 7) % MINHASH_P)
         for b in range(bits)],
        "bit int, p long, c long",
    )
    contrib = (
        (F.col("tid") * F.col("p") + F.col("c")) % F.lit(1000)
    ).cast("double") - F.lit(499.5)
    per_bit = (
        doc_tids.crossJoin(F.broadcast(bit_tbl))
        .groupBy("doc_id", "bit")
        .agg(F.sum(contrib).alias("s"))
        .withColumn(
            "bitval",
            F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)),
        )
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.col("bitval")
            * F.pow(F.lit(2.0), F.col("bit").cast("double")).cast("long")
        ).alias("simhash")
    )
