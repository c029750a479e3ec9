"""BM25 ranked retrieval over the document corpus (search-engine shape).

The webtext north-star's missing verb: given a handful of keyword
queries, score every matching document with Okapi BM25 (k1 = 1.2,
b = 0.75).  The plan is the classic retrieval shape re-expressed
Spark-first:

  tokens -> postings (doc, tok, tf) + doc lengths + per-token df
  -> broadcast the (tiny) query-token dimension into the postings scan
  -> one partial+final groupBy (qid, doc) sum.

Cross-engine float policy (the repo's q13 doctrine applied to IR):

* the ONLY transcendental is the idf log, in the Lucene-clamped form
  ``ln(1 + (N - df + 0.5) / (df + 0.5))`` (plain BM25 idf goes NEGATIVE
  for tokens in more than half the corpus — with a 31-token vocabulary
  that is most tokens).  Algebraically that is ``ln((2N + 2) /
  (2df + 1))``: a single division of two INTEGER-valued doubles, so both
  engines hand libm bit-identical inputs (verified bit-equal across the
  whole realistic (N, df) range; a DECIMAL-literal spelling of the same
  expression differed by 6e-8), and the value is always positive.
  The result is then pinned to the integer grid ``FLOOR(ln * 256 +
  0.5)`` (FLOOR(+0.5), never ROUND — Spark and DuckDB disagree on
  halves).
* everything after the idf is one exact integer pair per (query token,
  doc): with k1 = 6/5 and b = 3/4 and S = total corpus tokens,
  N = corpus docs,
      term = idf_q * 22 * tf * S / (10 * tf * S + 3 * S + 9 * dl * N)
  (multiply BM25's numerator and denominator by 10 * S to clear every
  fraction; avgdl = S / N never materializes).  Both sides stay under
  2^53, the division is one correctly-rounded IEEE op on identical
  int-valued doubles, the * 8192 is an exact exponent shift, and the
  FLOOR lands on the 2^-13 grid — so the per-term quantized score is
  bit-identical across engines and the final per-doc score is an exact
  BIGINT SUM (aggregation order immaterial).

Reference anchor: the reference has no retrieval module; this is a §2.12
engine addition (the corpus-side twin of the geospatial kNN lookups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgr_pdal_topo_spark.operators import dedup

#: fixed keyword queries over the corpus vocabulary (deterministic)
BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (0, "slow hash batch"),
    (1, "window fast query"),
    (2, "big data merge"),
)

IDF_SCALE = 256   #: idf quantization grid (1/256 resolution)
Q13 = 8192        #: per-term score grid (2^-13, the repo-wide step)

#: shared SQL fragments (identical text in Spark and DuckDB) — the frame
#: they run over carries columns n, s, df, tf, dl
IDF_Q_SQL = (
    "CAST(FLOOR(ln(CAST(2 * n + 2 AS DOUBLE) / "
    f"CAST(2 * df + 1 AS DOUBLE)) * {IDF_SCALE} + 0.5) AS BIGINT)"
)
TERM_Q13_SQL = (
    f"CAST(FLOOR(CAST({IDF_Q_SQL} * 22 * tf * s AS DOUBLE) / "
    f"CAST(10 * tf * s + 3 * s + 9 * dl * n AS DOUBLE) * {Q13}) AS BIGINT)"
)


SNIPPET_RADIUS = 2  #: context tokens kept on each side of the first hit


def kwic_snippets(
    documents: DataFrame,
    queries: tuple[tuple[int, str], ...] = BM25_QUERIES,
) -> DataFrame:
    """(qid, doc_id, hit_pos, snippet) — the search-result snippet:
    the earliest query-token hit in each matching document with
    SNIPPET_RADIUS tokens of context each side (keyword-in-context).

    All array built-ins, verified semantics-identical across engines:
    array_position / list_position are both 1-based with 0 for absent,
    and both slice spellings clamp past the array end.  The query-token
    dimension broadcasts (<= a few rows); the hit scan is one
    zero-shuffle projection per (doc, query token) and the snippet
    slice joins back on doc_id only for documents that hit."""
    spark = documents.sparkSession
    d = documents.select("doc_id", dedup._tok_array().alias("toks"))
    qt = (
        spark.createDataFrame(list(queries), "qid int, qtext string")
        .select("qid", F.explode(F.split("qtext", " ")).alias("tok"))
        .distinct()
    )
    hits = (
        d.crossJoin(F.broadcast(qt))
        .select(
            "qid", "doc_id",
            F.array_position(F.col("toks"), F.col("tok")).alias("p"),
        )
        .filter(F.col("p") > 0)
        .groupBy("qid", "doc_id")
        .agg(F.min("p").alias("hit_pos"))
    )
    start = F.greatest(F.col("hit_pos") - F.lit(SNIPPET_RADIUS), F.lit(1))
    length = F.col("hit_pos") + F.lit(SNIPPET_RADIUS) - start + F.lit(1)
    return (
        hits.join(d, "doc_id")
        .select(
            "qid", "doc_id", "hit_pos",
            F.array_join(
                F.slice(F.col("toks"), start, length), " "
            ).alias("snippet"),
        )
    )


def bm25_scores(
    documents: DataFrame,
    queries: tuple[tuple[int, str], ...] = BM25_QUERIES,
) -> DataFrame:
    """(qid, doc_id, n_hits, score_q13) for every document matching at
    least one query token.

    Scale shape: the query-token dimension broadcasts into the postings
    scan (a semi-filter — only matching postings survive), doc lengths
    join on doc_id AFTER that filter, per-token df and the two corpus
    scalars broadcast, and the score is one partial+final sum of exact
    BIGINT terms."""
    spark = documents.sparkSession
    toks = dedup.tokens(documents)
    postings = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    dft = postings.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    stats = documents.agg(F.count(F.lit(1)).alias("n")).crossJoin(
        toks.agg(F.count(F.lit(1)).alias("s"))
    )
    qt = (
        spark.createDataFrame(list(queries), "qid int, qtext string")
        .select("qid", F.explode(F.split("qtext", " ")).alias("tok"))
        .distinct()
    )
    m = (
        postings.join(F.broadcast(qt), "tok")
        .join(dl, "doc_id")
        .join(F.broadcast(dft), "tok")
        .crossJoin(F.broadcast(stats))
    )
    return (
        m.withColumn("term", F.expr(TERM_Q13_SQL))
        .groupBy("qid", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.sum("term").alias("score_q13"),
        )
    )


SEARCH_TOP_K = 5  #: results per query on the composed search page


def search_results(
    documents: DataFrame,
    queries: tuple[tuple[int, str], ...] = BM25_QUERIES,
    k: int = SEARCH_TOP_K,
) -> DataFrame:
    """(qid, doc_id, rnk, score_q13, hit_pos, snippet) — the search
    PAGE composed end to end: BM25 scores -> top-k per query (ties
    broken by doc_id so the cut is engine-exact) -> keyword-in-context
    snippet for each surviving result.

    Every scored document has a snippet by construction (a nonzero
    score requires a query-token posting, and the snippet hit scan
    tests the same token set), so the final join is total and INNER.

    Scale shape: the top-k window runs over the already-aggregated
    (qid, doc) score table and Spark pushes the k-cut below its shuffle
    (WindowGroupLimit — <= k rows per qid per partition move); the
    snippet join then touches only q x k rows of the corpus."""
    from pyspark.sql import Window

    scores = bm25_scores(documents, queries)
    w = Window.partitionBy("qid").orderBy(
        F.col("score_q13").desc(), F.col("doc_id").asc()
    )
    top = (
        scores.select("qid", "doc_id", "score_q13")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )
    sn = kwic_snippets(documents, queries)
    return top.join(sn, ["qid", "doc_id"]).select(
        "qid", "doc_id", "rnk", "score_q13", "hit_pos", "snippet"
    )


def phrase_hits(
    documents: DataFrame,
    queries: tuple[tuple[int, str], ...] = BM25_QUERIES,
) -> DataFrame:
    """(qid, doc_id, n_hits, first_pos) — EXACT positional phrase
    search: a document hits only where the query's tokens occur
    CONSECUTIVELY, in order (the `"quoted phrase"` verb of a search
    engine, which bm25_scores' bag-of-words scoring cannot express).

    Plan: the positional postings list (doc_id, pos, tok) — the
    canonical web-search index structure — is built by one posexplode;
    the (qid, offset, tok) phrase dimension broadcasts into that scan
    as a semi-filter, each surviving posting is rebased to its implied
    phrase START (anchor = pos - offset), and ONE groupBy counts
    distinct matched offsets per (qid, doc, anchor): an anchor where
    every offset matched is a phrase occurrence.  No positional
    self-join per phrase word — the classic k-way adjacency join
    collapses into a single count-distinct aggregation whose input is
    already filtered to query-vocabulary postings, so shuffle volume
    is bounded by the phrase words' posting lists, not the corpus.
    Repeated tokens inside a phrase are handled by construction (the
    DISTINCT is on offsets, not tokens).

    Everything is integer: positions, offsets, counts — no float
    anywhere, so cross-engine parity is exact with no rounding policy.
    """
    spark = documents.sparkSession
    d = documents.select("doc_id", dedup._tok_array().alias("toks"))
    pos = d.select(
        "doc_id", F.posexplode(F.col("toks")).alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "tok")
    qw = (
        spark.createDataFrame(list(queries), "qid int, qtext string")
        .select(
            "qid",
            F.posexplode(F.split("qtext", " ")).alias("off", "tok"),
        )
    )
    qlen = qw.groupBy("qid").agg(F.count(F.lit(1)).alias("qlen"))
    anchored = pos.join(F.broadcast(qw), "tok").select(
        "qid", "doc_id", (F.col("pos") - F.col("off")).alias("anchor"),
        "off",
    )
    return (
        anchored.groupBy("qid", "doc_id", "anchor")
        .agg(F.count_distinct(F.col("off")).alias("k"))
        .join(F.broadcast(qlen), "qid")
        .filter((F.col("k") == F.col("qlen")) & (F.col("anchor") >= 1))
        .groupBy("qid", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("anchor").cast("long").alias("first_pos"),
        )
    )


def postings_gap_census(documents: DataFrame) -> DataFrame:
    """(gap_bits, n_gaps, varint_bytes): the delta-gap compressibility
    census of the inverted index — the pass an index builder runs to
    size postings storage before choosing a codec.  Postings are the
    DISTINCT (token, doc_id) pairs under the corpus's one tokenizer
    spelling; each posting stores as its delta from the previous doc_id
    in the same list (the universal postings layout), the FIRST posting
    as doc_id + 1 (delta from the virtual -1, so every posting has a
    strictly positive gap and the byte total prices the whole index).
    gap_bits = LENGTH(BIN(gap)) — the degree_histogram log2 idiom — is
    both the census bucket and the Elias-gamma cost basis;
    varint_bytes = floor((gap_bits + 6) / 7) * n at the bucket grain
    (LEB128: 7 payload bits per byte).  All-integer, no rounding
    policy.

    Scale shape: the distinct collapses the corpus to the postings
    table once; the lag window partitions by TOKEN (the posting-list
    key — exactly how shards store them, no global window); the census
    folds onto <= 64 rows with full map-side combine."""
    from pyspark.sql import Window

    toks = (
        documents.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.col("text"), " "), lambda t: t != ""
                )
            ).alias("tok"),
        )
        .distinct()
    )
    w = Window.partitionBy("tok").orderBy("doc_id")
    gap = (
        F.col("doc_id")
        - F.coalesce(F.lag("doc_id").over(w), F.lit(-1).cast("long"))
    )
    bits = F.length(F.bin(gap)).cast("long")
    return (
        toks.select(bits.alias("gap_bits"))
        .groupBy("gap_bits")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
        .select(
            "gap_bits",
            "n_gaps",
            (
                F.floor((F.col("gap_bits") + 6) / F.lit(7.0)).cast("long")
                * F.col("n_gaps")
            ).alias("varint_bytes"),
        )
    )


RRF_K = 60        #: the canonical reciprocal-rank-fusion constant
RRF_Q = 1 << 20   #: integer grid for the reciprocal contributions


def search_fused(
    documents: DataFrame,
    queries: tuple[tuple[int, str], ...] = BM25_QUERIES,
    k: int = SEARCH_TOP_K,
) -> DataFrame:
    """(qid, doc_id, r_bm25, r_phrase, rrf_q): reciprocal-rank fusion
    (Cormack, Clarke & Buettcher 2009) of the BM25 bag-of-words
    ranking and the exact quoted-phrase ranking — THE standard way
    modern stacks combine heterogeneous retrievers (keyword + vector,
    here keyword + positional), robust because it consumes only RANKS:
    rrf(d) = sum over lists of 1 / (60 + rank_list(d)), zero for a
    list that missed the doc.

    Exactness: both input rankings are already integer-exact (BIGINT
    BM25 scores; integer phrase hit counts/positions) with total
    tie-break orders, and each reciprocal is one exact floor-division
    onto the 2^-20 grid — rrf_q is an exact BIGINT sum, no float in
    the fusion at all.  The k-cut orders on (rrf_q DESC, doc_id).

    Scale shape: both rankings window over their own (qid, doc)
    AGGREGATES (WindowGroupLimit-friendly), the fusion is one full
    outer join on (qid, doc_id) of two qid-partitioned rank tables,
    and the k-cut runs on the fused aggregate."""
    from pyspark.sql import Window

    from rgr_pdal_topo_spark.operators.linkgraph import _exact_div

    bw = Window.partitionBy("qid").orderBy(
        F.col("score_q13").desc(), F.col("doc_id").asc()
    )
    br = (
        bm25_scores(documents, queries)
        .select(
            "qid",
            "doc_id",
            F.row_number().over(bw).cast("long").alias("r_bm25"),
        )
    )
    pw = Window.partitionBy("qid").orderBy(
        F.col("n_hits").desc(),
        F.col("first_pos").asc(),
        F.col("doc_id").asc(),
    )
    pr = (
        phrase_hits(documents, queries)
        .select(
            "qid",
            "doc_id",
            F.row_number().over(pw).cast("long").alias("r_phrase"),
        )
    )
    u = br.join(pr, ["qid", "doc_id"], "full")
    contrib = lambda r: F.coalesce(  # noqa: E731
        _exact_div(F.lit(RRF_Q), F.lit(RRF_K) + F.col(r)),
        F.lit(0).cast("long"),
    )
    fused = u.select(
        "qid",
        "doc_id",
        "r_bm25",
        "r_phrase",
        (contrib("r_bm25") + contrib("r_phrase")).alias("rrf_q"),
    )
    kw = Window.partitionBy("qid").orderBy(
        F.col("rrf_q").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rk", F.row_number().over(kw))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )
