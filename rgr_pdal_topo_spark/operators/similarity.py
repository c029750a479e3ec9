"""Similarity search over the embeddings table (array<float> columns).

* ``cosine_topk``         — exact brute-force top-k for a broadcastable
                            query set (the correctness baseline); dot
                            products stay JVM-side via zip_with/aggregate.
* ``cosine_topk_lsh``     — random-hyperplane LSH bucketing: queries and
                            corpus are sign-bucketed by deterministic
                            pseudo-hyperplanes; top-k runs inside (multi-
                            probe) buckets only — the 100 TB scale path.
* ``embedding_near_dups`` — near-duplicate pairs above a cosine threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

COS_ROUND = 5  # cross-engine float tolerance for ordering/outputs


def _vec_double(col: str) -> Column:
    return F.transform(F.col(col), lambda v: v.cast("double"))


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _vec_double(vec_col)
    dot = F.aggregate(
        F.zip_with(v, v, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.withColumn("vec", v).withColumn("norm", F.sqrt(dot))


def cosine_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors of the first ``n_queries`` vectors.

    Broadcast the query side; one windowed top-k per query.  Ordering ties
    are broken on (rounded cosine desc, neighbor id) so results are
    deterministic across engines and partitionings.
    """
    base = with_norm(emb).select(
        F.col(id_col).alias("nn_id"), "vec", "norm"
    )
    q = (
        with_norm(emb)
        .filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("norm").alias("qnorm"),
        )
    )
    j = base.crossJoin(F.broadcast(q)).filter(
        F.col("nn_id") != F.col("query_id")
    )
    dot = F.aggregate(
        F.zip_with(F.col("vec"), F.col("qvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    j = j.withColumn(
        "cosine", F.round(dot / (F.col("norm") * F.col("qnorm")), COS_ROUND)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nn_id").asc()
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nn_id", "cosine")
    )


DEFAULT_PLANES = 8


def n_planes_for(n_vectors: int, target_bucket: int = 64) -> int:
    """Plane count scaling with corpus size: enough buckets that the
    expected bucket occupancy is ~``target_bucket`` (so within-bucket work
    stays bounded as n grows), clamped to [4, 24].  At 10^12 vectors with
    target 64 this is 24 planes -> 16.7M buckets."""
    import math

    if n_vectors <= target_bucket:
        return 4
    return max(4, min(24, math.ceil(math.log2(n_vectors / target_bucket))))


def _hyperplane_sign_bits(vec_col: str, n_planes: int, dim: int) -> Column:
    """Deterministic pseudo-hyperplane sign bucket (int).  Plane j component
    d = ((j*dim + d)*48271 % 2001) - 1000 (integer, zero-mean)."""
    bucket = F.lit(0)
    for j in range(n_planes):
        coeffs = F.array(
            *[
                F.lit(float((j * dim + d) * 48271 % 2001 - 1000))
                for d in range(dim)
            ]
        )
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), coeffs, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def _probe_buckets(bucket: Column, n_planes: int) -> Column:
    """Multi-probe key list: the bucket itself plus every 1-bit flip, so a
    probe join covers all buckets at Hamming distance <= 1 while staying a
    pure equi-join (no inequality/cross join at any scale)."""
    return F.array(
        bucket, *[bucket.bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)]
    )


def cosine_topk_lsh(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_planes: int = DEFAULT_PLANES,
    dim: int = 64,
    id_col: str = "vec_id",
    multi_probe: bool = True,
) -> DataFrame:
    """LSH-bucketed approximate top-k: only candidates in the query's
    bucket (or, with ``multi_probe``, any bucket at Hamming distance <= 1)
    are scored.  At scale the bucket column is the shuffle/partition key;
    the broadcast-query case shown here keeps one agg + one windowed
    top-k.  A (query, candidate) pair matches at most one probe key, so no
    dedup is needed."""
    base = with_norm(emb).withColumn(
        "bucket", _hyperplane_sign_bits("vec", n_planes, dim)
    )
    q = (
        base.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("norm").alias("qnorm"),
            F.col("bucket").alias("qbucket"),
        )
    )
    if multi_probe:
        q = q.withColumn(
            "qbucket", F.explode(_probe_buckets(F.col("qbucket"), n_planes))
        )
    cand = base.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col(id_col) != F.col("query_id")),
    )
    dot = F.aggregate(
        F.zip_with(F.col("vec"), F.col("qvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = cand.withColumn(
        "cosine", F.round(dot / (F.col("norm") * F.col("qnorm")), COS_ROUND)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col(id_col).alias("nn_id"), "cosine")
    )


def cosine_topk_ivf(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: an inverted file over a coarse
    quantizer.  Every vector is assigned to its argmax-cosine centroid
    (ties on centroid id); a query scores only the members of its
    ``n_probe`` nearest centroid lists.

    The default quantizer is deterministic seed centroids (the first
    ``n_centroids`` vectors) so the whole structure — assignment,
    inverted lists, probe selection, in-list search — is replayable in
    the SQL oracle; pass ``centroids`` (e.g. from cluster.kmeans_nd) to
    use a TRAINED quantizer with everything downstream identical.  At
    scale: centroids broadcast, the corpus partitions BY LIST ID (the
    shuffle key), and each query moves to ``n_probe`` partitions — the
    complement of the LSH variant's sign-bucket structure."""
    base = with_norm(emb)
    if centroids is not None:
        spark = emb.sparkSession
        rows = [
            (i, [float(x) for x in c], float(sum(x * x for x in c)) ** 0.5)
            for i, c in enumerate(centroids)
        ]
        cents = spark.createDataFrame(
            rows, "cid long, cvec array<double>, cnorm double"
        )
    else:
        cents = base.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cid"),
            F.col("vec").alias("cvec"),
            F.col("norm").alias("cnorm"),
        )

    def centroid_ranked(df: DataFrame) -> DataFrame:
        """Rank the broadcast centroids per vector (crn 1 = nearest)."""
        cdot = F.aggregate(
            F.zip_with(F.col("vec"), F.col("cvec"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            df.crossJoin(F.broadcast(cents))
            .withColumn(
                "ccos",
                F.round(cdot / (F.col("norm") * F.col("cnorm")), COS_ROUND),
            )
            .withColumn(
                "crn",
                F.row_number().over(
                    Window.partitionBy(id_col).orderBy(
                        F.col("ccos").desc(), F.col("cid").asc()
                    )
                ),
            )
        )

    # the corpus-sized assignment feeds ONLY the member side; probes
    # re-rank just the tiny query subset (filter pushed below the
    # scoring), so no corpus-sized subplan is duplicated across the
    # join sides (Spark does not CSE common subplans)
    members = centroid_ranked(base).filter(F.col("crn") == 1).select(
        F.col(id_col).alias("nn_id"), "vec", "norm", "cid"
    )
    probes = centroid_ranked(
        base.filter(F.col(id_col) < n_queries)
    ).filter(F.col("crn") <= n_probe).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        "cid",
    )
    # a member sits in exactly ONE list and probe cids are distinct, so
    # each (query, candidate) pair scores at most once — no dedup needed
    cand = members.join(
        F.broadcast(probes.withColumnRenamed("cid", "pcid")),
        (F.col("cid") == F.col("pcid"))
        & (F.col("nn_id") != F.col("query_id")),
    ).drop("pcid")
    dot = F.aggregate(
        F.zip_with(F.col("vec"), F.col("qvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = cand.withColumn(
        "cosine", F.round(dot / (F.col("norm") * F.col("qnorm")), COS_ROUND)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nn_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nn_id", "cosine")
    )


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    n_planes: int = DEFAULT_PLANES,
    dim: int = 64,
    multi_probe: bool = True,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, scored only inside the
    LSH structure (same bucket, or Hamming distance <= 1 with
    ``multi_probe``).  The left side explodes its probe keys and the right
    side keeps its plain bucket, so each unordered pair joins exactly once
    and the whole thing stays an equi-join on an int key."""
    base = with_norm(emb).withColumn(
        "bucket", _hyperplane_sign_bits("vec", n_planes, dim)
    )
    l = base.select(
        F.col(id_col).alias("id_a"),
        F.col("vec").alias("vec_a"),
        F.col("norm").alias("norm_a"),
        (
            F.explode(_probe_buckets(F.col("bucket"), n_planes))
            if multi_probe
            else F.col("bucket")
        ).alias("bucket"),
    )
    r = base.select(
        F.col(id_col).alias("id_b"),
        F.col("vec").alias("vec_b"),
        F.col("norm").alias("norm_b"),
        "bucket",
    )
    j = l.join(r, "bucket").filter(F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with(F.col("vec_a"), F.col("vec_b"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        j.withColumn(
            "cosine",
            F.round(dot / (F.col("norm_a") * F.col("norm_b")), COS_ROUND),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# SQ8: scalar-quantized compressed-vector search
# ---------------------------------------------------------------------------

def sq8_trained_scale(emb: DataFrame, vec_col: str = "embedding") -> float:
    """FAISS-style trained quantizer scale: 127 / max|component| over the
    corpus, so the int8 grid spans exactly the observed value range (a
    fixed scale either clamps wide corpora or wastes grid on narrow
    ones).  One distributed max-abs agg; the scalar division happens in
    Python — IEEE double, bit-identical to the oracle's SQL spelling
    ``127.0 / MAX(GREATEST(ABS(list_min(v)), ABS(list_max(v))))``."""
    v = _vec_double(vec_col)
    mx = emb.agg(
        F.max(F.greatest(F.abs(F.array_min(v)), F.abs(F.array_max(v))))
    ).collect()[0][0]
    if not mx:  # empty corpus or all-zero vectors: nothing to quantize
        raise ValueError("cannot train SQ8 scale: max |component| is 0")
    return 127.0 / mx


def quantize_sq8(vec_col: str, scale: float) -> Column:
    """Component-wise scalar quantization to the int8 grid (the FAISS
    SQ8 idea): q_i = clamp(floor(v_i * scale + 0.5), -127, 127).

    The 100 TB rationale is memory, not speed: float32 embeddings are
    the dominant byte cost of a vector corpus, and 4x compression is the
    difference between a corpus that fits executor memory and one that
    spills.  Distances over quantized vectors are EXACT INTEGER
    arithmetic — reproducible across engines bit-for-bit, unlike float
    dot products whose aggregation order matters.  Rounding is spelled
    FLOOR(v + 0.5) (Spark/DuckDB ROUND disagree on halves)."""
    return F.transform(
        F.col(vec_col),
        lambda v: F.greatest(
            F.least(
                F.floor(v.cast("double") * F.lit(scale) + F.lit(0.5)),
                F.lit(127),
            ),
            F.lit(-127),
        ),
    )


def _int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_topk_sq8(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
    scale: float | None = None,
) -> DataFrame:
    """Top-k cosine over SQ8-quantized vectors (the compressed twin of
    :func:`cosine_topk`): approximate cosine = qdot / sqrt(qn_a * qn_b),
    integer until the one final sqrt+division, so the DuckDB oracle
    replays it exactly (no agg-order float drift anywhere).  Recall vs
    the exact float path is pinned in tests/test_similarity.py.
    ``scale=None`` trains it from the corpus (:func:`sq8_trained_scale`)."""
    if scale is None:
        scale = sq8_trained_scale(emb)
    qz = emb.withColumn("qv", quantize_sq8("embedding", scale))
    base = qz.select(
        F.col(id_col).alias("nn_id"),
        "qv",
        _int_dot(F.col("qv"), F.col("qv")).alias("qn"),
    )
    q = (
        qz.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.col("qv").alias("qqv"),
            _int_dot(F.col("qv"), F.col("qv")).alias("qqn"),
        )
    )
    j = base.crossJoin(F.broadcast(q)).filter(
        F.col("nn_id") != F.col("query_id")
    )
    cos = F.round(
        _int_dot(F.col("qv"), F.col("qqv"))
        / F.sqrt((F.col("qn") * F.col("qqn")).cast("double")),
        COS_ROUND,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nn_id").asc()
    )
    return (
        j.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nn_id", "cosine")
    )


def cosine_topk_ivf_sq8(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    scale: float | None = None,
) -> DataFrame:
    """IVF coarse quantizer OVER the SQ8 compressed scan — the two
    approximations composed the way production ANN stacks deploy them
    (FAISS's ``IVF<n>,SQ8`` index): the coarse quantizer routes each
    query to its ``n_probe`` inverted lists, and the scan INSIDE each
    list runs on int8-quantized vectors.

    Division of labour at 100 TB: IVF bounds WORK (each query touches
    n_probe/n_centroids of the corpus — the shuffle-partitioning story,
    lists are the partition key) while SQ8 bounds MEMORY (4x smaller
    resident vectors decide whether the probed lists fit executor
    memory).  Composition details that keep it oracle-exact: list
    ASSIGNMENT uses the float vectors (assignment quality should not
    pay quantization error — FAISS does the same; the dot product is a
    sequential fold, bit-identical in both engines), while in-list
    distances are exact integer arithmetic until one final
    sqrt+division.  Recall vs the exact float path is pinned in
    tests/test_similarity.py."""
    if scale is None:
        scale = sq8_trained_scale(emb)
    base = (
        with_norm(emb)
        .withColumn("qv", quantize_sq8("embedding", scale))
        .withColumn("qn", _int_dot(F.col("qv"), F.col("qv")))
    )
    cents = base.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
    )

    def centroid_ranked(df: DataFrame) -> DataFrame:
        cdot = F.aggregate(
            F.zip_with(F.col("vec"), F.col("cvec"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            df.crossJoin(F.broadcast(cents))
            .withColumn(
                "ccos",
                F.round(cdot / (F.col("norm") * F.col("cnorm")), COS_ROUND),
            )
            .withColumn(
                "crn",
                F.row_number().over(
                    Window.partitionBy(id_col).orderBy(
                        F.col("ccos").desc(), F.col("cid").asc()
                    )
                ),
            )
        )

    # corpus-sized assignment feeds only the member side (same
    # no-subplan-duplication shape as cosine_topk_ivf)
    members = centroid_ranked(base).filter(F.col("crn") == 1).select(
        F.col(id_col).alias("nn_id"), "qv", "qn", "cid"
    )
    probes = centroid_ranked(
        base.filter(F.col(id_col) < n_queries)
    ).filter(F.col("crn") <= n_probe).select(
        F.col(id_col).alias("query_id"),
        F.col("qv").alias("qqv"),
        F.col("qn").alias("qqn"),
        "cid",
    )
    cand = members.join(
        F.broadcast(probes.withColumnRenamed("cid", "pcid")),
        (F.col("cid") == F.col("pcid"))
        & (F.col("nn_id") != F.col("query_id")),
    ).drop("pcid")
    cos = F.round(
        _int_dot(F.col("qv"), F.col("qqv"))
        / F.sqrt((F.col("qn") * F.col("qqn")).cast("double")),
        COS_ROUND,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nn_id").asc()
    )
    return (
        cand.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nn_id", "cosine")
    )


SEMDEDUP_THRESHOLD = 0.95  #: within-cluster semantic-duplicate cutoff


def semdedup(
    emb: DataFrame,
    threshold: float = SEMDEDUP_THRESHOLD,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    scale: float | None = None,
) -> DataFrame:
    """(cid, n_vectors, n_dup_pairs, n_dropped, n_kept) — SemDeDup
    ("SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", Abbas et al. 2023): embeddings are coarsely
    clustered, pairwise similarity is computed ONLY within a cluster,
    and every member with a qualifying near-duplicate is dropped in
    favor of one representative.  This is the semantic member of the
    dedup family — exact (digest), line-level (CCNet), lexical near-dup
    (MinHash/SimHash), positional (dup_spans) all miss paraphrases and
    re-encodings that embed to nearly the same vector.

    Determinism contract: the coarse quantizer is the IVF seed-centroid
    assignment (argmax float cosine over the first ``n_centroids``
    vectors — assignment stays float for the same reason FAISS keeps
    it float); within-cluster similarity runs on trained-scale SQ8
    int8 vectors, exact integer arithmetic until one final
    sqrt+division; the keep rule is "lowest id in each duplicate pair
    survives" (a vector drops iff SOME smaller-id member of its
    cluster is >= threshold similar), a deterministic simplification
    of the paper's keep-farthest-from-centroid rule.

    Scale shape: centroids broadcast; the corpus partitions by cluster
    id; the within-cluster self-join is the method's intrinsic cost and
    is bounded by cluster size — at web scale K grows with N to hold
    clusters at ~10^4-10^5 members (the paper uses the same lever), and
    a skewed giant cluster splits by re-running the quantizer inside
    it.  Only (cid, id, int8-vector) rows shuffle."""
    if scale is None:
        scale = sq8_trained_scale(emb)
    base = with_norm(emb)
    cents = base.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
    )
    cdot = F.aggregate(
        F.zip_with(F.col("vec"), F.col("cvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # argmax as an AGGREGATE, not a row_number window: the max-struct
    # partials combine map-side, so the N x n_centroids expansion never
    # shuffles (a per-id window would sort-exchange all 16 candidate
    # rows per vector first).  max over (ccos, -cid) is the same total
    # order as (ccos DESC, cid ASC) — the cid negation is integer, so
    # there is no -0.0 subtlety anywhere near the float.
    asg = (
        base.crossJoin(F.broadcast(cents))
        .withColumn(
            "ccos",
            F.round(cdot / (F.col("norm") * F.col("cnorm")), COS_ROUND),
        )
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("ccos").alias("ccos"),
                    (-F.col("cid")).alias("ncid"),
                )
            ).alias("best")
        )
        .select(id_col, (-F.col("best.ncid")).alias("cid"))
    )
    qz = emb.withColumn("qv", quantize_sq8("embedding", scale)).select(
        id_col, "qv", _int_dot(F.col("qv"), F.col("qv")).alias("qn")
    )
    m = asg.join(qz, id_col)
    l = m.select(
        "cid",
        F.col(id_col).alias("id_a"),
        F.col("qv").alias("qa"),
        F.col("qn").alias("qna"),
    )
    r = m.select(
        "cid",
        F.col(id_col).alias("id_b"),
        F.col("qv").alias("qb"),
        F.col("qn").alias("qnb"),
    )
    cos = F.round(
        _int_dot(F.col("qa"), F.col("qb"))
        / F.sqrt((F.col("qna") * F.col("qnb")).cast("double")),
        COS_ROUND,
    )
    dup = (
        l.join(r, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("cid", "id_a", "id_b")
    )
    sizes = m.groupBy("cid").agg(F.count(F.lit(1)).alias("n_vectors"))
    per = dup.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_dup_pairs"),
        F.countDistinct("id_b").alias("n_dropped"),
    )
    return (
        sizes.join(per, "cid", "left")
        .select(
            "cid",
            "n_vectors",
            F.coalesce(F.col("n_dup_pairs"), F.lit(0)).alias(
                "n_dup_pairs"
            ),
            F.coalesce(F.col("n_dropped"), F.lit(0)).alias("n_dropped"),
            (
                F.col("n_vectors")
                - F.coalesce(F.col("n_dropped"), F.lit(0))
            ).alias("n_kept"),
        )
    )


def _dot(a: Column, b: Column) -> Column:
    """Sequential in-row dot product — the same left-to-right fold
    DuckDB's list_dot_product performs, so the doubles are
    bit-identical across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_reconstruct(
    base: DataFrame,
    m: int,
    n_codes: int,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """(nn_id, xhat, rnorm): PQ-encode ``base`` (nn_id, vec) and return
    each vector's subspace-ordered reconstruction with its in-row norm.
    Shared by the flat ADC scan (cosine_topk_pq) and the IVF-routed one
    (cosine_topk_ivf_pq).

    Default codebooks are the first ``n_codes`` vectors' subvectors
    (deterministic seed doctrine); pass ``codebooks`` —
    ``codebooks[j][k]`` = subspace j's k-th centroid, e.g. from one
    cluster.kmeans_nd run per subspace — for a TRAINED quantizer with
    everything downstream identical (the cosine_topk_ivf ``centroids``
    contract)."""
    spark = base.sparkSession
    sub = spark.range(m).select(F.col("id").cast("int").alias("j"))

    # per-(vector, subspace) slices
    def slices(df: DataFrame, idc: str) -> DataFrame:
        w = (F.size(F.col("vec")) / F.lit(m)).cast("int")
        return df.crossJoin(F.broadcast(sub)).select(
            idc,
            "j",
            F.slice(
                F.col("vec"), F.col("j") * w + F.lit(1), w
            ).alias("sv"),
        )

    if codebooks is not None:
        rows = [
            (int(j), int(k), [float(x) for x in c])
            for j, subs in enumerate(codebooks)
            for k, c in enumerate(subs)
        ]
        cb = spark.createDataFrame(
            rows, "j int, code int, cv array<double>"
        ).withColumn("bb", _dot(F.col("cv"), F.col("cv")))
    else:
        cb = slices(
            base.filter(F.col("nn_id") < n_codes), "nn_id"
        ).select(
            F.col("nn_id").cast("int").alias("code"),
            "j",
            F.col("sv").alias("cv"),
            _dot(F.col("sv"), F.col("sv")).alias("bb"),
        )
    enc = (
        slices(base, "nn_id")
        .join(F.broadcast(cb), "j")
        .select(
            "nn_id",
            "j",
            "code",
            "cv",
            "bb",
            F.round(
                _dot(F.col("sv"), F.col("sv"))
                - F.lit(2.0) * _dot(F.col("sv"), F.col("cv"))
                + F.col("bb"),
                COS_ROUND,
            ).alias("d2"),
        )
        .groupBy("nn_id", "j")
        .agg(
            F.min_by(F.col("cv"), F.struct("d2", "code")).alias("cv")
        )
    )
    return enc.groupBy("nn_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "cv"))),
                lambda s: s["cv"],
            )
        ).alias("xhat"),
    ).withColumn(
        # |x_hat| from the ASSEMBLED vector, in-row sequential — a
        # cross-row SUM of the per-subspace |c_j|^2 would be
        # association-order-dependent
        "rnorm",
        F.sqrt(_dot(F.col("xhat"), F.col("xhat"))),
    )



def cosine_topk_pq(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Product-quantization ADC search (Jégou et al. 2011) — the third
    member of the compressed-vector family beside SQ8 (uniform int8)
    and IVF (coarse lists): the 64-d vector splits into ``m``
    orthogonal subspaces, each encoded as its nearest of ``n_codes``
    per-subspace codebook entries, so a vector stores as m small codes
    (8 bytes vs 256 — the 32x memory win that keeps a 10^12-vector
    index in cluster RAM).  Queries score candidates against the
    RECONSTRUCTION x_hat (codebook entries concatenated in subspace
    order): adc_cosine = <q, x_hat> / (|q| * |x_hat|), with
    |x_hat|^2 = sum_j |c_j|^2 exactly, by subspace orthogonality.

    Determinism/parity contract: codebooks are the first ``n_codes``
    vectors' subvectors (the cosine_topk_ivf seed-quantizer doctrine —
    swap in kmeans_nd per subspace for a trained codebook with
    everything downstream identical); encoding argmin orders on
    (ROUND(d2, 5), code) with d2 spelled aa - 2ab + bb from three
    sequential in-row dots, so seeds encode to themselves exactly
    (d2 == 0.0) and both engines see bit-identical doubles; every
    cross-row float SUM is avoided — x_hat assembles by subspace-
    ordered flatten and all dots are in-row sequential folds.

    Scale shape: the codebook (m x n_codes subvectors) and the LUT-
    bearing query set broadcast; encoding is ONE corpus x m explode
    joined to the m-keyed codebook with a min_by fold (paid once at
    ingest, like the manifest's stats); the ADC scan is a broadcast
    cross join scoring codes-only data — compose with the IVF coarse
    quantizer (cosine_topk_ivf) to prune the scan to n_probe lists,
    exactly as FAISS 'IVF16,PQ8'."""
    base = with_norm(emb).select(
        F.col(id_col).alias("nn_id"), "vec", "norm"
    )
    recon = _pq_reconstruct(base, m, n_codes, codebooks)
    q = base.filter(F.col("nn_id") < n_queries).select(
        F.col("nn_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    cand = recon.crossJoin(F.broadcast(q)).filter(
        F.col("nn_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "nn_id",
        F.round(
            _dot(F.col("qvec"), F.col("xhat"))
            / (F.col("qnorm") * F.col("rnorm")),
            COS_ROUND,
        ).alias("adc_cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cosine").desc(), F.col("nn_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nn_id", "adc_cosine")
    )


def cosine_topk_ivf_pq(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF coarse quantizer OVER the PQ-ADC scan — FAISS's canonical
    ``IVF<n>,PQ<m>`` index, the workhorse of billion-scale ANN: the
    coarse quantizer routes each query to ``n_probe`` inverted lists
    (bounding WORK — lists are the partition key), and the scan inside
    each list scores PQ reconstructions (bounding MEMORY 32x — 8 codes
    resident per vector).  Same division of labour as
    cosine_topk_ivf_sq8, swapping the uniform int8 grid for per-
    subspace codebooks.

    Composition contract: list ASSIGNMENT uses the float vectors
    (assignment quality should not pay quantization error — FAISS
    likewise); codes here encode the RAW vectors, not the per-list
    residuals FAISS adds as a further refinement (documented
    simplification — residual encoding needs per-list codebooks,
    which the seed-codebook determinism doctrine does not reach).
    Scoring, rounding and tie-breaks are exactly cosine_topk_pq's;
    routing is exactly cosine_topk_ivf's — so each half is separately
    oracle-witnessed and the composed row certifies the join of the
    two structures."""
    base = with_norm(emb)
    cents = base.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
    )

    def centroid_ranked(df: DataFrame) -> DataFrame:
        cdot = F.aggregate(
            F.zip_with(F.col("vec"), F.col("cvec"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            df.crossJoin(F.broadcast(cents))
            .withColumn(
                "ccos",
                F.round(cdot / (F.col("norm") * F.col("cnorm")), COS_ROUND),
            )
            .withColumn(
                "crn",
                F.row_number().over(
                    Window.partitionBy(id_col).orderBy(
                        F.col("ccos").desc(), F.col("cid").asc()
                    )
                ),
            )
        )

    recon = _pq_reconstruct(
        base.select(F.col(id_col).alias("nn_id"), "vec", "norm"),
        m,
        n_codes,
    )
    members = (
        centroid_ranked(base)
        .filter(F.col("crn") == 1)
        .select(F.col(id_col).alias("nn_id"), "cid")
        .join(recon, "nn_id")
    )
    probes = centroid_ranked(
        base.filter(F.col(id_col) < n_queries)
    ).filter(F.col("crn") <= n_probe).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.col("cid").alias("pcid"),
    )
    cand = members.join(
        F.broadcast(probes),
        (F.col("cid") == F.col("pcid"))
        & (F.col("nn_id") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id",
        "nn_id",
        F.round(
            _dot(F.col("qvec"), F.col("xhat"))
            / (F.col("qnorm") * F.col("rnorm")),
            COS_ROUND,
        ).alias("adc_cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cosine").desc(), F.col("nn_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nn_id", "adc_cosine")
    )
