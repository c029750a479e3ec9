"""Deduplication operators over the documents table.

Web-scale training pipelines dedup at several strengths; each operator here
is a pure DataFrame composition designed for the 100 TB shape:

  * exact:     one hash agg on md5(text) — the shuffle carries a 32-char
               digest, never the document body;
  * minhash:   k-token shingles -> portable integer ids -> minhash
               signatures -> LSH band buckets -> candidate pairs (band
               bucket join replaces the all-pairs O(n^2)); oversized
               buckets are capped before the self-join so one hot key can
               never explode quadratically;
  * simhash:   bitwise fingerprint via sign-of-weighted-sum over unigram
               token ids;
  * jaccard:   exact shingle-set verification on (small) candidate sets.

PARITY DESIGN: shingle/token ids are the base-16 value of the first 15
hex chars of md5 — a 60-bit space, pure string/integer built-ins that
evaluate identically in Spark SQL and DuckDB, so every stage stays
oracle-checkable with NO global window, NO vocabulary broadcast, and NO
shuffle wider than (doc_id, int64).  (Round 1 used dense_rank over the
whole vocabulary — a single-partition global sort Spark itself warns
about; this replaces it.)

ID-SPACE BOUND: with 60-bit ids, a candidate pair's exact-Jaccard verify
is perturbed only if two DIFFERENT shingles across the two documents
collide in id: for ~2,000-shingle pages that is 2000 * 2000 / 2^60
~ 3.5e-12 per pair — negligible at any corpus size, because Jaccard
compares two documents' sets, never the whole corpus at once.  (The
earlier 31-bit fold put that figure at ~2e-3 per pair and reached
even-odds of SOME corpus-wide collision at ~65k distinct shingles;
10^12-doc corpora hold ~10^13 distinct shingles.)  MinHash permutations
map the 60-bit ids into the 31-bit signature space below — standard
32-bit MinHash; a within-document permutation-value collision only
matters if it lands exactly at the min, which perturbs one of 16
signature slots with probability ~1e-6.

Reference behavior: text dedup for a Common-Crawl-style corpus (the graft
payload); shingling follows the standard MinHash construction (Broder).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame  # noqa: F401 (Column in hints)
from pyspark.sql import Window
from pyspark.sql import functions as F

# Portable-id space: ids are the first ID_CHARS md5 hex digits read as an
# integer — [0, 16^15) = [0, 2^60), exact in int64 (and in DuckDB BIGINT).
ID_CHARS = 15
ID_SPACE = 16 ** ID_CHARS  # 2^60

# MinHash permutation parameters over prime P — P is the SIGNATURE space
# (31-bit, standard 32-bit MinHash), not the id space.  Because ids are
# 60-bit, a_j * tid would overflow int64; each permutation therefore
# hashes the id's 31-bit low half and 29-bit high half separately:
#   h_j(tid) = (a_j * (tid % 2^31) + c_j * (tid // 2^31) + b_j) % P
# max intermediate < 2^62 + 2^60 + 2^31 < 2^63 — ANSI-safe in both
# engines, and a proper 2-term universal-style hash of the full 60 bits
# (ids differing only in high bits do not collide systematically).
MINHASH_P = 2147483647
N_PERM = 16
MINHASH_A = [(2 * j + 1) * 2654435761 % MINHASH_P for j in range(N_PERM)]
MINHASH_C = [(2 * j + 1) * 3266489917 % MINHASH_P for j in range(N_PERM)]
MINHASH_B = [(j * 40503 + 12345) % MINHASH_P for j in range(N_PERM)]
TID_SPLIT = 1 << 31  # lo = tid % TID_SPLIT, hi = tid // TID_SPLIT

SIMHASH_BITS = 16
SHINGLE_K = 3
MAX_BUCKET = 64  # cap on band-bucket size before the candidate self-join

_HEX = "0123456789abcdef"


def horner_hash_sql(
    hex_col: str, chars: int = ID_CHARS, mod: int | None = None
) -> str:
    """SQL text folding the first ``chars`` hex digits of ``hex_col`` into an
    integer (base-16 Horner).  Uses only instr/substring (and % when a
    modulus is requested), which evaluate identically in Spark SQL and
    DuckDB — the portable stand-in for xxhash64 so oracles can replay the
    exact same ids.  With ``mod=None`` (the default) the fold is exact:
    intermediates are bounded by 16^chars = 2^60 at the default width, so
    no modulus — and no overflow — is ever involved."""
    # BIGINT accumulator: Spark would otherwise fold in int32 and overflow
    v = "CAST(0 AS BIGINT)"
    for i in range(1, chars + 1):
        d = f"(instr('{_HEX}', substring({hex_col}, {i}, 1)) - 1)"
        v = f"({v} * 16 + {d})" if mod is None else f"(({v} * 16 + {d}) % {mod})"
    return v


def tokens(documents: DataFrame) -> DataFrame:
    """(doc_id, tok) — whitespace tokenization, empty tokens dropped."""
    return documents.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")


def _tok_array() -> Column:
    return F.filter(F.split(F.col("text"), " "), lambda t: t != "")


def shingles(documents: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingle) distinct — k consecutive tokens joined by one
    space.  Docs with fewer than k tokens produce no shingles.

    The token array is materialized as a real column BEFORE the per-index
    transform: inlining the split+filter expression into each element_at
    makes Catalyst re-split the text per shingle position (O(len^2) — a
    measured 6x slowdown at sf0.1)."""
    d = documents.select("doc_id", _tok_array().alias("toks"))
    return d.select(
        "doc_id",
        F.explode(_shingle_array(F.col("toks"), k)).alias("shingle"),
    )


def _shingle_array(toks: Column, k: int, distinct: bool = True) -> Column:
    """array<string> of k-token shingles from a materialized token-array
    column — the ONE spelling of the shingle window, shared by the
    exploded (``shingles``) and row-local (``_shingle_tid_array``)
    paths so they cannot drift apart.  DISTINCT by default (the dedup
    semantics); ``distinct=False`` keeps every occurrence (the
    repetition-quality semantics — how often a shingle repeats IS the
    signal there)."""
    n = F.size(toks)
    idx = F.when(
        n >= F.lit(k), F.sequence(F.lit(1), n - F.lit(k - 1))
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]
        ),
    )
    return F.array_distinct(sh) if distinct else sh


def _portable_id(hex_col: str | Column) -> Column:
    """Engine spelling of the portable id: one base-16 conv of the first
    ID_CHARS md5 hex chars — a 60-bit value.  Numerically identical to
    horner_hash_sql but a single JVM intrinsic instead of a 15-level
    expression tree; the DuckDB oracles keep the Horner text and the
    parity sweep pins the two spellings to each other."""
    return F.conv(F.substring(hex_col, 1, ID_CHARS), 16, 10).cast("long")


def _permute(tid: Column, a: int, c: int, b: int, m: int) -> Column:
    """(a * lo + c * hi + b) % m over the 60-bit id's (31-bit lo, 29-bit
    hi) halves — the overflow-free permutation spelling shared by the
    exploded and row-local minhash paths and mirrored in the oracles."""
    lo = tid % F.lit(TID_SPLIT)
    hi = F.shiftright(tid, 31)
    return (F.lit(a) * lo + F.lit(c) * hi + F.lit(b)) % F.lit(m)


def shingle_ids(documents: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, tid) distinct — portable integer shingle ids.  One narrow
    projection per row: no window, no dimension join, no broadcast."""
    return (
        shingles(documents, k)
        .withColumn("__h", F.md5("shingle"))
        .select("doc_id", _portable_id("__h").alias("tid"))
        .distinct()
    )


def token_ids(documents: DataFrame) -> DataFrame:
    """(doc_id, tid) distinct — portable integer unigram-token ids (used by
    simhash, whose fingerprint is a content distribution, not an n-gram
    structure)."""
    return (
        tokens(documents)
        .distinct()
        .withColumn("__h", F.md5("tok"))
        .select("doc_id", _portable_id("__h").alias("tid"))
        .distinct()
    )


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Exact dedup groups: (canonical doc, group size) per distinct text.
    Grouping key is md5(text), so the shuffle carries a digest rather than
    the document body (same answer, bounded row width at any scale)."""
    return (
        documents.groupBy(F.md5("text").alias("__k"))
        .agg(
            F.min("doc_id").alias("canonical_doc"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .select("canonical_doc", "group_size")
    )


def minhash_signatures(doc_tids: DataFrame, n_perm: int = N_PERM) -> DataFrame:
    """(doc_id, perm, minhash) long-form signature.

    All ``n_perm`` mins are computed in ONE groupBy(doc_id) pass (16 agg
    columns, then an unpivot) instead of exploding every (doc_id, tid)
    row 16x through a permutation cross join — same values, 1/16th the
    shuffle input at any scale."""
    aggs = [
        F.min(
            _permute(
                F.col("tid"), MINHASH_A[j], MINHASH_C[j], MINHASH_B[j],
                MINHASH_P,
            )
        ).alias(f"m{j}")
        for j in range(n_perm)
    ]
    wide = doc_tids.groupBy("doc_id").agg(*aggs)
    stack = (
        f"stack({n_perm}, "
        + ", ".join(f"{j}, m{j}" for j in range(n_perm))
        + ") AS (perm, minhash)"
    )
    return wide.select("doc_id", F.expr(stack))


def _check_banding(bands: int, rows_per_band: int) -> None:
    if bands * rows_per_band != N_PERM:
        raise ValueError(
            f"bands ({bands}) x rows_per_band ({rows_per_band}) must equal "
            f"N_PERM ({N_PERM})"
        )


def _band_mix(
    signatures: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """(doc_id, band, band_key): order-sensitive 31^pos mix of the band's
    row minhashes (exact int64 arithmetic)."""
    sig = signatures.withColumn(
        "band", (F.col("perm") / F.lit(rows_per_band)).cast("int")
    ).withColumn("pos", F.col("perm") % F.lit(rows_per_band))
    return sig.groupBy("doc_id", "band").agg(
        F.sum(
            F.col("minhash")
            * F.pow(F.lit(31.0), F.col("pos").cast("double")).cast("long")
        ).alias("band_key")
    )


def _shingle_tid_array(k: int = SHINGLE_K) -> Column:
    """array<long> of portable shingle ids for one document row (expects a
    materialized ``__toks`` token-array column) — the row-local twin of
    ``shingle_ids``, built from the same ``_shingle_array`` +
    ``_portable_id`` spellings.  Duplicate ids are harmless under the min
    that consumes them, so the exploded path's tid-level distinct is
    skipped."""
    return F.transform(
        _shingle_array(F.col("__toks"), k),
        lambda s: _portable_id(F.md5(s)),
    )


def minhash_bands_rowwise(
    documents: DataFrame,
    bands: int = 8,
    rows_per_band: int = 2,
    k: int = SHINGLE_K,
) -> DataFrame:
    """(doc_id, band, band_key) computed entirely ROW-LOCALLY: shingles,
    permutation minima and the band mix are array expressions over each
    document row, so the whole banding runs with ZERO shuffle — vs the
    exploded chain _band_mix(minhash_signatures(shingle_ids(docs)))'s
    three (explode-distinct, signature groupBy, band-mix groupBy).
    Bit-identical output (tests/test_streaming_neardup.py pins the two
    spellings to each other); docs with fewer than ``k`` tokens produce
    no rows, matching the exploded path.

    When to use which: higher-order-function lambdas are INTERPRETED
    (no whole-stage codegen), and measured ~6x more CPU than the
    exploded chain at sf0.1 — more than the chain's narrow integer
    shuffles cost on a healthy cluster, so BATCH pipelines should keep
    the exploded spelling.  This one exists for STREAMING, where it is
    structural: the banding must reach ``applyInPandasWithState``
    stateless (a pre-state groupBy would be a second stateful operator,
    which Structured Streaming rejects), and for shuffle-starved
    deployments where network, not CPU, is the binding constraint."""
    _check_banding(bands, rows_per_band)
    tids = (
        documents.select("doc_id", _tok_array().alias("__toks"))
        .select("doc_id", _shingle_tid_array(k).alias("__tids"))
        .filter(F.size("__tids") > 0)
    )

    def perm_min(j: int) -> Column:
        # nb: exactly ONE lambda parameter — pyspark reads the signature
        # and a second parameter means (element, index)
        return F.array_min(
            F.transform(
                F.col("__tids"),
                lambda t: _permute(
                    t, MINHASH_A[j], MINHASH_C[j], MINHASH_B[j], MINHASH_P
                ),
            )
        ).alias(f"m{j}")

    mins = tids.select("doc_id", *[perm_min(j) for j in range(N_PERM)])
    band_keys = [
        sum(
            F.col(f"m{b * rows_per_band + pos}") * F.lit(31 ** pos)
            for pos in range(rows_per_band)
        ).alias(f"bk{b}")
        for b in range(bands)
    ]
    stack = (
        f"stack({bands}, "
        + ", ".join(f"{b}, bk{b}" for b in range(bands))
        + ") AS (band, band_key)"
    )
    return mins.select("doc_id", *band_keys).select("doc_id", F.expr(stack))


def _bucket_stats(mixed: DataFrame) -> DataFrame:
    return mixed.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("canonical_doc"),
    )


def lsh_band_buckets(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """(band, band_key, n_docs, canonical_doc): docs sharing a band key are
    near-dup candidates."""
    _check_banding(bands, rows_per_band)
    return _bucket_stats(_band_mix(signatures, bands, rows_per_band))


def lsh_dropped_buckets(
    signatures: DataFrame,
    bands: int = 8,
    rows_per_band: int = 2,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """(band, band_key, n_docs) for every bucket the size cap excludes from
    the candidate self-join — the coverage ledger for the cap in
    ``minhash_candidate_pairs``.  Empty iff the pair output is exhaustive."""
    _check_banding(bands, rows_per_band)
    mixed = _band_mix(signatures, bands, rows_per_band)
    return (
        mixed.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket)
    )


def lsh_drop_report(
    signatures: DataFrame,
    bands: int = 8,
    rows_per_band: int = 2,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """One metrics row surfacing what the bucket cap skipped:
    (n_dropped_buckets, n_docs_affected) where n_docs_affected counts
    DISTINCT documents having at least one dropped bucket (such documents
    may still pair through their other, smaller buckets).  At 100 TB this
    row is the difference between "deduped everything" and "deduped
    everything except these hot shards" — never let the cap drop silently."""
    mixed = _band_mix(signatures, bands, rows_per_band)
    dropped = mixed.join(
        lsh_dropped_buckets(
            signatures, bands, rows_per_band, max_bucket
        ).select("band", "band_key"),
        ["band", "band_key"],
    )
    return dropped.agg(
        F.count_distinct("band", "band_key").alias("n_dropped_buckets"),
        F.count_distinct("doc_id").alias("n_docs_affected"),
    )


def minhash_candidate_pairs(
    signatures: DataFrame,
    bands: int = 8,
    rows_per_band: int = 2,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one band key.

    Buckets larger than ``max_bucket`` are dropped before the self-join: a
    single hot band key would otherwise yield O(n^2) pairs.  (A bucket that
    big means the banding is non-selective for that content — at 100 TB the
    right response is to either tighten bands or route the bucket through
    exact dedup, not to materialize the quadratic join.)  The drop is NOT
    silent: ``lsh_drop_report`` / ``lsh_dropped_buckets`` enumerate exactly
    what the cap excluded; pipelines should emit that row next to the
    pairs."""
    _check_banding(bands, rows_per_band)
    mixed = _band_mix(signatures, bands, rows_per_band)
    sizes = mixed.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("__n")
    )
    capped = mixed.join(
        sizes.filter(F.col("__n") <= max_bucket), ["band", "band_key"]
    ).select("doc_id", "band", "band_key")
    l = capped.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    r = capped.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    return (
        l.join(r, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_pairs(doc_tids: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact id-set Jaccard for given (doc_a, doc_b) pairs."""
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


def duplicate_components(pairs: DataFrame, max_rounds: int = 20) -> DataFrame:
    """(doc_id, cluster): connected components of the verified near-dup
    pair graph, cluster = MIN doc_id in the component — the canonical
    assignment that completes the dedup pipeline (keep cluster == doc_id,
    drop the rest).  Only docs that appear in at least one pair are
    emitted; singletons are trivially their own cluster.

    Min-label propagation with per-round path compression (label <-
    label-of-label), each round two hash joins over (id, label) rows.
    Near-dup components are shallow (stars/cliques around shared
    templates), so few rounds suffice; a pathologically long chain at
    100 TB would call for the large-star/small-star CC algorithm — the
    loop raises rather than silently truncating if it has not converged
    within ``max_rounds``."""
    sym = pairs.select(
        F.col("doc_a").alias("x"), F.col("doc_b").alias("y")
    ).union(pairs.select(F.col("doc_b").alias("x"), F.col("doc_a").alias("y")))
    sym = sym.localCheckpoint(eager=True)
    lab = (
        sym.select("x").distinct()
        .select(F.col("x").alias("id"), F.col("x").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        nb = (
            sym.join(
                lab.select(F.col("id").alias("y"), F.col("lbl").alias("ylbl")),
                "y",
            )
            .groupBy("x")
            .agg(F.min("ylbl").alias("nlbl"))
        )
        # materialize before the compression self-join: prop feeds both
        # sides and Spark would otherwise run the neighbor-min agg twice
        prop = lab.join(nb, lab.id == nb.x, "left").select(
            "id",
            F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl")))
            .alias("lbl"),
        ).localCheckpoint(eager=True)
        comp = (
            prop.alias("a")
            .join(
                prop.select(
                    F.col("id").alias("bid"), F.col("lbl").alias("blbl")
                ),
                F.col("a.lbl") == F.col("bid"),
                "left",
            )
            .select(
                F.col("a.id").alias("id"),
                F.coalesce(F.col("blbl"), F.col("a.lbl")).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        n_moving = (
            comp.alias("n")
            .join(lab.alias("o"), "id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        lab = comp
        if n_moving == 0:
            return lab.select(
                F.col("id").alias("doc_id"), F.col("lbl").alias("cluster")
            )
    raise RuntimeError(
        f"component labeling did not converge within {max_rounds} rounds"
    )


def simhash_params(b: int) -> tuple[int, int, int]:
    """Per-bit hash constants (P_b, Q_b, C_b) — shared with the DuckDB
    oracle.  P_b/Q_b multiply the 60-bit token id's lo/hi halves (the same
    split-hash spelling as ``_permute``); C_b is the additive term."""
    return (
        (2 * b + 3) * 2654435761 % MINHASH_P,
        (2 * b + 3) * 3266489917 % MINHASH_P,
        (b * 69621 + 7) % MINHASH_P,
    )


def simhash(doc_tids: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): bit b = 1 iff sum over tokens of
    (((P_b * lo(tid) + Q_b * hi(tid) + C_b) % 1000) - 499.5) > 0 —
    all-integer/half-integer, bit-reproducible in any engine.  (lo < 2^31
    and hi < 2^29 with P_b, Q_b < 2^31, so the two products stay inside
    int64 — the split spelling exists exactly because tid itself is
    60-bit; the per-bit sums are sums of half-integers,
    exact in float64, so aggregation order cannot perturb the sign.)

    All ``bits`` sums run as conditional aggregates in ONE
    groupBy(doc_id) pass — the same one-pass shape as
    ``minhash_signatures`` (a bit-table cross join would explode every
    (doc_id, tid) row ``bits``-fold BEFORE the shuffle; this keeps the
    shuffle input at exactly one row per (doc_id, tid))."""
    aggs = []
    for b in range(bits):
        p, q, c = simhash_params(b)
        contrib = (
            _permute(F.col("tid"), p, q, c, 1000)
        ).cast("double") - F.lit(499.5)
        aggs.append(F.sum(contrib).alias(f"s{b}"))
    wide = doc_tids.groupBy("doc_id").agg(*aggs)
    acc = F.lit(0)
    for b in range(bits):
        acc = acc + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(
            F.lit(0)
        )
    return wide.select("doc_id", acc.cast("long").alias("simhash"))


def _simhash_banded(sigs: DataFrame, n_bands: int, bits: int) -> DataFrame:
    """(doc_id, simhash, band, band_key): one row per disjoint contiguous
    bit range of the fingerprint — the shared banding for pair search and
    the drop report."""
    if bits % n_bands != 0:
        raise ValueError(f"n_bands ({n_bands}) must divide bits ({bits})")
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    stack = (
        f"stack({n_bands}, "
        + ", ".join(
            f"{b}, shiftright(simhash, {b * band_bits}) & {mask}"
            for b in range(n_bands)
        )
        + ") AS (band, band_key)"
    )
    return sigs.select("doc_id", "simhash", F.expr(stack))


def simhash_drop_report(
    sigs: DataFrame,
    n_bands: int = 4,
    bits: int = SIMHASH_BITS,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """One metrics row (n_dropped_buckets, n_docs_affected) for the
    ``simhash_pairs`` bucket cap — the fingerprint-side twin of
    ``lsh_drop_report``, same never-silent contract: emit this next to
    the pairs so a hot shard skipped by the cap is visible, not implied
    covered."""
    banded = _simhash_banded(sigs, n_bands, bits)
    hot = (
        banded.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_bucket)
        .select("band", "band_key")
    )
    return banded.join(hot, ["band", "band_key"]).agg(
        F.count_distinct("band", "band_key").alias("n_dropped_buckets"),
        F.count_distinct("doc_id").alias("n_docs_affected"),
    )


def simhash_pairs(
    sigs: DataFrame,
    n_bands: int = 4,
    bits: int = SIMHASH_BITS,
    max_hamming: int | None = None,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """(doc_a, doc_b, hamming): SimHash near-dup pairs by pigeonhole
    banding — the fingerprint-side twin of ``minhash_candidate_pairs``.

    The ``bits``-bit fingerprint splits into ``n_bands`` disjoint
    contiguous bit ranges; if two fingerprints differ in at most
    ``n_bands - 1`` bits, at least one band is bit-identical (pigeonhole),
    so an equi-join on (band, band_key) finds EVERY pair within that
    Hamming radius — never an all-pairs compare.  Candidates are then
    verified with the exact popcount of the XOR and filtered to
    ``max_hamming`` (default ``n_bands - 1``, the radius the banding
    guarantees exhaustive; a larger value returns best-effort extras).
    This is the Manku/Jain/Sarma WWW'07 design (64-bit/4-band there)
    at this engine's fingerprint width.

    Scale notes: band keys ride the shuffle as one small int per
    (doc, band) — ``n_bands`` rows per doc, same fan-out as MinHash LSH
    banding.  Bucket selectivity is 2^(bits/n_bands) values per band, so
    at corpus scale call ``simhash`` with a wider fingerprint (e.g.
    bits=32 -> 256 buckets/band at n_bands=4) rather than shrinking
    bands below the recall you need.  Buckets above ``max_bucket`` are
    dropped before the self-join — same O(n^2) rationale and the same
    "never silent" contract as ``minhash_candidate_pairs``
    (``simhash_drop_report`` surfaces what the cap excluded)."""
    if max_hamming is None:
        max_hamming = n_bands - 1
    banded = _simhash_banded(sigs, n_bands, bits)
    sizes = banded.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("__n")
    )
    capped = banded.join(
        sizes.filter(F.col("__n") <= max_bucket), ["band", "band_key"]
    ).select("doc_id", "simhash", "band", "band_key")
    l = capped.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("__sa"),
        "band",
        "band_key",
    )
    r = capped.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("__sb"),
        "band",
        "band_key",
    )
    cand = (
        l.join(r, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "__sa", "__sb")
        .distinct()
    )
    ham = F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= F.lit(max_hamming))
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# incremental near-dup: a persistent LSH index over manifest snapshots
# ---------------------------------------------------------------------------

def incremental_near_dups(
    spark,
    new_docs: DataFrame,
    store_root: str,
    bands: int = 8,
    rows_per_band: int = 2,
    max_bucket: int = MAX_BUCKET,
    n_files: int = 4,
) -> DataFrame:
    """Near-dup pairs for ONE NEW BATCH against everything seen so far,
    without recomputing the corpus — the shape incremental training-data
    ingestion needs at 10^12 docs (re-banding the whole lake per WARC
    drop is the quadratic trap).

    The signature store is a MANIFEST TABLE (sources/manifest.py) of
    banded keys ``(doc_id, band, band_key)``, range-clustered on
    ``band_key`` so the probe join prunes store files by key range.
    Protocol per batch:

    1. band the new docs (one groupBy, as the batch path);
    2. read the store PINNED at its current snapshot (later appends
       cannot leak into this read — the exactly-once trick the
       SnapshotConsumer uses);
    3. emit new-vs-store and new-vs-new candidate pairs through the
       usual bucket-size cap, sized over store+batch TOGETHER;
    4. commit the new keys as the next snapshot (atomic visibility: a
       crash before the commit re-processes the batch, never halves it).

    Pair-set semantics vs one batch-mode run over the union: identical
    while no bucket crosses ``max_bucket`` BETWEEN batches; a bucket
    that grows past the cap mid-stream keeps the pairs it emitted while
    small (no retraction), where batch mode would drop them all — the
    incremental output is a superset in exactly that case, and
    ``lsh_dropped_buckets`` over the store enumerates the affected keys.
    Caller contract: doc_ids are unique across all batches.
    """
    from rgr_pdal_topo_spark.sources import manifest as man

    mixed_new = _band_mix(
        minhash_signatures(token_ids(new_docs)), bands, rows_per_band
    )
    log = man.snapshots(store_root)
    mixed_old = (
        man.scan(spark, store_root, snapshot=log[-1]["id"]) if log else None
    )
    union = (
        mixed_new if mixed_old is None
        else mixed_old.unionByName(mixed_new)
    )
    keep = (
        union.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_bucket)
        .select("band", "band_key")
    )
    cn = mixed_new.join(keep, ["band", "band_key"]).select(
        "doc_id", "band", "band_key"
    )
    l = cn.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    r = cn.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    pairs = (
        l.join(r, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    if mixed_old is not None:
        co = mixed_old.join(keep, ["band", "band_key"]).select(
            F.col("doc_id").alias("doc_o"), "band", "band_key"
        )
        cross = (
            cn.join(co, ["band", "band_key"])
            .select(
                F.least("doc_id", "doc_o").alias("doc_a"),
                F.greatest("doc_id", "doc_o").alias("doc_b"),
            )
            # a doc_id present in BOTH the store and this batch (e.g. a
            # batch replayed after a crash between commit() and the
            # caller persisting the pairs) would otherwise emit a
            # self-pair through least/greatest
            .filter(F.col("doc_a") != F.col("doc_b"))
        )
        pairs = pairs.unionByName(cross)
    pairs = pairs.distinct().localCheckpoint(eager=True)
    # materialized BEFORE the commit: the pair plan must never observe
    # the store state that includes this batch's own keys
    man.commit(mixed_new, store_root, ["band_key"], n_files=n_files)
    return pairs


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    k: int = SHINGLE_K,
) -> DataFrame:
    """Eval-set contamination flags: (doc_id, n_hits) for every corpus
    document sharing at least one k-token shingle with the benchmark
    set — the standard pre-training decontamination pass (drop or
    downweight training documents that leak evaluation data).

    Scale shape: the benchmark side is eval-suite-sized (thousands of
    documents), so its distinct shingle ids BROADCAST; the corpus side
    is one shingle projection + semi-join + partial/final count —
    nothing wider than (doc_id, int64) ever shuffles, the same property
    the MinHash path has.  ``n_hits`` counts DISTINCT overlapping
    shingles (shingle_ids is distinct per doc), so thresholding on it
    expresses the usual "quarantine at >= N colliding n-grams" policy
    rather than a boolean.
    """
    corpus = shingle_ids(documents, k)
    bench = F.broadcast(shingle_ids(benchmark, k).select("tid").distinct())
    return (
        corpus.join(bench, "tid")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


# ---------------------------------------------------------------------------
# repetition quality signal (Gopher-style repeated n-grams)
# ---------------------------------------------------------------------------

def repetition_stats(documents: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, n_shingles, n_distinct, top_count): the repeated-n-gram
    quality signal (the Gopher/MassiveText "fraction of characters in
    the most common n-gram" family, over token shingles): boilerplate,
    keyword stuffing, and template spam all show a dominant shingle.
    Callers threshold e.g. ``top_count * 10 > n_shingles`` (top shingle
    >10% of all shingle occurrences) or ``n_distinct * 2 < n_shingles``
    (heavy global repetition).

    Scale shape: shingles keep every occurrence (no distinct — the
    repetition IS the signal), fold to 60-bit ids so the shuffle is
    (doc_id, int64), then two nested aggregations — per-(doc, shingle)
    counts, then per-doc max/sum — both partial+final hash aggs."""
    d = documents.select("doc_id", _tok_array().alias("toks"))
    raw = d.select(
        "doc_id",
        F.explode(_shingle_array(F.col("toks"), k, distinct=False)).alias(
            "shingle"
        ),
    )
    per = (
        raw.withColumn("__h", F.md5("shingle"))
        .select("doc_id", _portable_id("__h").alias("tid"))
        .groupBy("doc_id", "tid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per.groupBy("doc_id").agg(
        F.sum("n").alias("n_shingles"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("n").alias("top_count"),
    )


def shingle_dup_stats(documents: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, n_shingles, n_dup, dup_ratio): the CORPUS-duplication
    quality signal (RefinedWeb/Dolma's "fraction of n-grams duplicated
    elsewhere"): for each document, how many of its distinct k-token
    shingles occur in at least one OTHER document.  Complements
    repetition_stats (WITHIN-doc repetition) — a document can be
    internally clean yet wholly assembled from corpus boilerplate, and
    this is the signal that catches it.  Thresholding dup_ratio is the
    usual pre-training "remove template spam / mirrored content" policy
    between exact dedup and MinHash.

    Scale shape: shingles fold to 60-bit ids so nothing wider than
    (doc_id, int64) shuffles; the document-frequency agg is
    partial+final; the join back to shingle rows is tid-keyed — the one
    genuine corpus-sized shuffle join here, the same cost class as the
    LSH banding join (both sides partition on the shingle id).  A
    document's shingle occurring twice WITHIN it counts once
    (shingle_ids is distinct per doc), so df >= 2 means "some other
    document shares it"."""
    dt = shingle_ids(documents, k)
    dfq = dt.groupBy("tid").agg(F.count(F.lit(1)).alias("df"))
    dup = (F.col("df") >= 2).cast("long")
    return (
        dt.join(dfq, "tid")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(dup).alias("n_dup"),
        )
        .withColumn(
            "dup_ratio",
            F.round(
                F.col("n_dup").cast("double")
                / F.col("n_shingles").cast("double"),
                6,
            ),
        )
    )


MIN_SPAN_TOKENS = 6  # report only spans of at least 2*SHINGLE_K tokens


def duplicated_spans(
    documents: DataFrame,
    k: int = SHINGLE_K,
    min_count: int = 2,
    min_span: int = MIN_SPAN_TOKENS,
) -> DataFrame:
    """(doc_id, n_spans, max_span, dup_tokens): MAXIMAL duplicated-span
    detection — the token-level re-expression of suffix-array exact
    substring dedup ("Deduplicating Training Data Makes Language Models
    Better": any substring repeated anywhere in the corpus is a removal
    candidate).  A position's k-gram is "duplicated" when that k-gram
    occurs >= ``min_count`` times corpus-wide (any doc, including its
    own — verbatim self-repeats are exactly what ExactSubstr removes);
    overlapping duplicated k-gram windows then merge into maximal spans,
    so a repeated L-token passage reports once as one span of length L,
    not as L-k+1 shingle hits.  Spans shorter than ``min_span`` are
    noise (stopword collocations) and drop, mirroring the paper's
    minimum-match-length threshold.

    Differs from repetition_stats (within-doc occurrence counts, no
    positions) and shingle_dup_stats (distinct-shingle document
    frequency, no positions): this is the POSITIONAL signal — where the
    duplicated text sits and how long it runs — i.e. what a removal pass
    would actually cut.

    Scale shape: positional k-grams fold to 60-bit ids so nothing wider
    than (doc_id, int, int64) shuffles; the corpus-frequency agg is
    partial+final on tid; the hit filter is a tid-keyed equi-join (both
    sides partition on tid — LSH-banding cost class); the island merge
    is a per-doc window, bounded by document length, partitioned on
    doc_id — no global window anywhere."""
    d = documents.select("doc_id", _tok_array().alias("toks"))
    # localCheckpoint: the positional stream feeds BOTH the corpus-count
    # agg and the join back — without it Spark re-reads and re-shingles
    # the corpus twice (measured 1.7x slower at sf0.1); the materialized
    # rows are narrow (doc_id, pos, tid), a fraction of corpus bytes
    psh = (
        d.select(
            "doc_id",
            F.posexplode(
                _shingle_array(F.col("toks"), k, distinct=False)
            ).alias("pos0", "shingle"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("long").alias("pos"),
            _portable_id(F.md5("shingle")).alias("tid"),
        )
        .localCheckpoint(eager=True)
    )
    dup = (
        psh.groupBy("tid")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select("tid")
    )
    hits = psh.join(dup, "tid").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # windows [pos, pos+k-1]; a new island starts when the previous
    # duplicated window cannot overlap this one (pos > prev + k - 1)
    isl = hits.withColumn(
        "is_new",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") > F.lag("pos").over(w) + F.lit(k - 1)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("span_id", F.sum("is_new").over(run))
    spans = (
        isl.groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .withColumn(
            "span_len", F.col("span_end") - F.col("span_start") + F.lit(1)
        )
    )
    return (
        spans.filter(F.col("span_len") >= min_span)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.max("span_len").cast("long").alias("max_span"),
            F.sum("span_len").alias("dup_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# line-level dedup (CCNet / RefinedWeb boilerplate-line removal)
# ---------------------------------------------------------------------------

LINE_MIN_DOCS = 3  # a line in >= this many distinct docs is boilerplate


def line_dedup(
    documents: DataFrame,
    min_docs: int = LINE_MIN_DOCS,
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate-line removal — the CCNet / RefinedWeb line-level
    dedup stage that sits BETWEEN exact document dedup and shingle
    near-dup: navigation menus, cookie banners, and footers repeat
    verbatim across pages of a site without making whole documents
    near-duplicates.  A line occurring in >= ``min_docs`` DISTINCT
    documents is boilerplate; every occurrence is dropped and the
    document is reassembled from its surviving lines in original order.

    Returns (doc_id, n_lines, n_kept, n_intra_dup, clean_text) — the
    within-doc repeated-line count (Gopher's "duplicate line fraction"
    numerator) falls out of the same aggregation for free.

    Scale shape: detection shuffles nothing wider than
    (doc_id, int64) — lines fold to the portable 60-bit md5 ids, the
    document-frequency agg is distinct + partial/final count, and the
    resulting boilerplate id set BROADCASTS (ids only, ~8 bytes each:
    a >=k-doc line set is ~10^7-10^8 even at web scale; past that,
    flip the marker join to a tid-keyed shuffle semi-join, the same
    cost class as LSH banding).  The single wide shuffle is the
    reassembly groupBy(doc_id) — that is the rewrite itself, it
    replaces the corpus, and it parallelizes perfectly on doc_id."""
    lines = documents.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("lid", _portable_id(F.md5(F.col("line"))))
    boiler = (
        lines.select("doc_id", "lid")
        .distinct()
        .groupBy("lid")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("lid", F.lit(True).alias("__boiler"))
    )
    marked = lines.join(F.broadcast(boiler), "lid", "left")
    keep = F.col("__boiler").isNull()
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(keep.cast("long")).alias("n_kept"),
        (F.count(F.lit(1)) - F.countDistinct("lid")).alias("n_intra_dup"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(keep, F.struct(F.col("pos"), F.col("line")))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )


N_SPLIT_BUCKETS = 10  # hash buckets: 0-7 train, 8 val, 9 test
VAL_BUCKET = 8
TEST_BUCKET = 9


def split_col(doc_id: Column) -> Column:
    """Deterministic split label from doc_id alone — md5 -> portable
    60-bit fold -> mod-10 bucket (0-7 train / 8 val / 9 test).  A pure
    function of the key, so split membership is stable under retries,
    AQE re-plans, and re-ingestion (the points_decimate property), and
    any stage can recompute it without a join."""
    b = _portable_id(F.md5(doc_id.cast("string"))) % F.lit(N_SPLIT_BUCKETS)
    return (
        F.when(b == F.lit(VAL_BUCKET), F.lit("val"))
        .when(b == F.lit(TEST_BUCKET), F.lit("test"))
        .otherwise(F.lit("train"))
    )


def split_leakage(documents: DataFrame) -> DataFrame:
    """(split, n_docs, n_exact_leaked, n_near_leaked) over the eval
    splits — the release audit every train/val/test cut needs before
    the datasheet ships: how many held-out documents also appear in the
    training split verbatim (md5 text digest) or as a near-duplicate
    (>= 50% of the eval doc's distinct 3-token shingles occur in SOME
    training document — the one-sided containment twin of the
    decontaminate gate, aimed the other way: decontaminate protects the
    BENCHMARK from the corpus, this protects the SPLIT from itself).

    Eval docs with fewer than k tokens have no shingles and cannot be
    near-leaked (they are still exact-audited via the digest path).

    Scale shape: both audits shuffle only narrow keys — (digest) and
    (tid, int64) — against distinct train-side sets; per-doc overlap is
    one partial+final agg; the final rollup is two rows.  No bodies
    move after the first projection."""
    slim = documents.select(
        "doc_id", split_col(F.col("doc_id")).alias("split"),
        F.md5("text").alias("dg"),
    )
    train_dg = (
        slim.filter(F.col("split") == "train").select("dg").distinct()
        .withColumn("__e", F.lit(1))
    )
    ev = slim.filter(F.col("split") != "train")
    exact = ev.join(train_dg, "dg", "left").select(
        "doc_id", "split",
        F.coalesce(F.col("__e"), F.lit(0)).cast("long").alias("leak_exact"),
    )
    dt = shingle_ids(documents).withColumn(
        "split", split_col(F.col("doc_id"))
    )
    train_tid = (
        dt.filter(F.col("split") == "train").select("tid").distinct()
        .withColumnRenamed("tid", "ttid")
    )
    ov = (
        dt.filter(F.col("split") != "train")
        .join(train_tid, F.col("tid") == F.col("ttid"), "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_own"),
            F.sum(
                F.when(F.col("ttid").isNull(), 0).otherwise(1)
            ).alias("n_shared"),
        )
        .select(
            "doc_id",
            F.when(
                F.lit(2) * F.col("n_shared") >= F.col("n_own"), F.lit(1)
            ).otherwise(F.lit(0)).cast("long").alias("leak_near"),
        )
    )
    return (
        exact.join(ov, "doc_id", "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("leak_exact").alias("n_exact_leaked"),
            F.sum(F.coalesce(F.col("leak_near"), F.lit(0))).alias(
                "n_near_leaked"
            ),
        )
    )


def survivor_stats(
    docs: DataFrame, components: DataFrame, group_col: str = "lang"
) -> DataFrame:
    """Per-``group_col`` corpus effect of the dedup pass: (group, n_docs,
    n_kept, n_dropped, chars_total, chars_kept) — all exact BIGINTs.

    The end-product every dedup pipeline actually ships is the KEEP list
    (cluster canonical = MIN doc_id survives, other members drop) plus
    the before/after accounting that goes in the datasheet.  ``docs``
    contributes only (doc_id, group, n_chars) — bodies never enter the
    join — and the drop flag arrives by a narrow left join on doc_id, so
    the plan is one slim shuffle join + one partial/final agg no matter
    how large the corpus.  Docs in no component are kept by definition
    (duplicate_components emits members only)."""
    drops = components.filter(F.col("doc_id") != F.col("cluster")).select(
        "doc_id", F.lit(1).alias("is_dropped")
    )
    slim = docs.select("doc_id", group_col, "n_chars")
    flagged = slim.join(drops, "doc_id", "left")
    dropped = F.coalesce(F.col("is_dropped"), F.lit(0)).cast("long")
    return (
        flagged.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(dropped).alias("n_dropped"),
            F.sum("n_chars").alias("chars_total"),
            F.sum(
                F.when(F.col("is_dropped").isNull(), F.col("n_chars"))
                .otherwise(F.lit(0))
            ).alias("chars_kept"),
        )
        .select(
            group_col,
            "n_docs",
            (F.col("n_docs") - F.col("n_dropped")).alias("n_kept"),
            "n_dropped",
            "chars_total",
            "chars_kept",
        )
    )


WINNOW_W = 4  #: winnowing window: w consecutive k-gram hashes


def winnow_fingerprints(
    documents: DataFrame, k: int = SHINGLE_K, w: int = WINNOW_W
) -> DataFrame:
    """(doc_id, n_grams, n_selected, fp_xor): robust winnowing
    (Schleimer/Wilkerson/Aiken 2003, the MOSS fingerprinting scheme):
    over each window of ``w`` consecutive k-gram hashes select the
    RIGHTMOST minimum; the selected (position, hash) pairs are the
    document's fingerprint sketch.  Winnowing guarantees every
    ``w``-window contributes a fingerprint (no gap longer than w), with
    expected density 2/(w+1) — the position-robust alternative to "every
    0 mod p hash" selection, and the standard local-similarity
    fingerprint between full shingling and MinHash.

    Documents with fewer than w k-grams have no full window and emit no
    row (documented contract; they are fully covered by exact dedup).
    fp_xor folds the selected pairs order-independently
    (bit_xor of hash XOR position — the lineage-fingerprint discipline:
    xor never overflows under ANSI).

    Scale shape: the hash stream is (doc_id, int, int64); the sliding
    minimum is a per-doc w-row window; the rightmost-argmin resolves by
    an offset-explode equi-join (w rows per window end, w is a small
    constant) — nothing wider than ids shuffles, no global window."""
    d = documents.select("doc_id", _tok_array().alias("toks"))
    psh = (
        d.select(
            "doc_id",
            F.posexplode(
                _shingle_array(F.col("toks"), k, distinct=False)
            ).alias("pos0", "shingle"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("long").alias("pos"),
            _portable_id(F.md5("shingle")).alias("h"),
        )
        .localCheckpoint(eager=True)
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        -(w - 1), Window.currentRow
    )
    cnt_w = Window.partitionBy("doc_id")
    ends = (
        psh.withColumn("min_h", F.min("h").over(win))
        .withColumn("m", F.max("pos").over(cnt_w))
        .filter(F.col("pos") >= w)  # full windows only
        .select("doc_id", F.col("pos").alias("q"), "min_h", "m")
    )
    # rightmost position attaining the window minimum: offset-explode
    # the w candidate positions and equi-join back to the hash stream
    cand = ends.select(
        "doc_id", "q", "min_h", "m",
        F.explode(
            F.array(*[F.lit(o) for o in range(w)])
        ).alias("o"),
    ).select(
        "doc_id", "q", "min_h", "m", (F.col("q") - F.col("o")).alias("pos")
    )
    sel = (
        cand.join(psh, ["doc_id", "pos"])
        .filter(F.col("h") == F.col("min_h"))
        .groupBy("doc_id", "q", "min_h", "m")
        .agg(F.max("pos").alias("sel_pos"))
        .select("doc_id", "m", "sel_pos", "min_h")
        .distinct()
    )
    return sel.groupBy("doc_id").agg(
        F.max("m").alias("n_grams"),
        F.count(F.lit(1)).alias("n_selected"),
        F.expr("bit_xor(min_h ^ sel_pos)").alias("fp_xor"),
    )


# --- edit-distance near-dup ------------------------------------------------

EDITDIST_PREFIX = 64  #: chars of text compared (bounds the DP cost)
EDITDIST_MAX = 2      #: keep pairs within this distance


def editdist_pairs(
    documents: DataFrame,
    prefix: int = EDITDIST_PREFIX,
    threshold: int = EDITDIST_MAX,
) -> DataFrame:
    """(doc_a, doc_b, dist): near-duplicate pairs by Levenshtein edit
    distance over the first ``prefix`` chars, candidates blocked on the
    exact (lang, n_chars) key — the character-level near-dup detector
    that catches single-typo mirrors and template stamps which
    token-level MinHash/SimHash shingling smears out (one char edit
    flips every k-gram it touches but costs edit distance 1).

    The blocking key is deliberately EXACT: a near-identical mirror
    preserves length under substitution, and at corpus scale the
    (lang, n_chars) blocks stay small (the length distribution is wide)
    so the within-block pair join is bounded — the standard
    sorted-neighborhood compromise.  Insertions/deletions change the
    length and are out of contract (they're the shingle family's job).

    Exactness: classic Levenshtein DP on ASCII prefixes — identical
    integers in both engines; the engine passes ``threshold`` so
    Spark's banded O(n*k) early-exit DP does the filtering (returns -1
    past the cap), while the oracle computes the full DP and applies
    the same cap.

    Scale shape: one projection of (doc_id, prefix, lang, n_chars),
    one self-equi-join on the narrow block key (never cartesian), and
    the banded DP runs inside whole-stage codegen — no Python, no
    shuffle beyond the block-key hash."""
    d = documents.select(
        "doc_id",
        F.substring("text", 1, prefix).alias("p"),
        "lang",
        "n_chars",
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.n_chars") == F.col("b.n_chars"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.p"), F.col("b.p"), threshold)
            .cast("long")
            .alias("dist"),
        )
        .filter(F.col("dist") >= 0)
    )


# ---------------------------------------------------------------------------
# exact set-similarity self-join (AllPairs prefix filtering)
# ---------------------------------------------------------------------------

#: Jaccard threshold tau = ALLPAIRS_NUM / ALLPAIRS_DEN, kept rational so
#: every gate is integer arithmetic (no float tau anywhere).
ALLPAIRS_NUM = 4
ALLPAIRS_DEN = 5


def allpairs_jaccard(
    doc_tids: DataFrame,
    num: int = ALLPAIRS_NUM,
    den: int = ALLPAIRS_DEN,
) -> DataFrame:
    """EXACT set-similarity self-join: ALL pairs with Jaccard >= num/den,
    by prefix filtering (SSJoin/AllPairs/PPJoin lineage) — the
    completeness-guaranteed complement of the MinHash/SimHash family
    (which trades recall for candidate volume; reference parity target:
    the same near-dup detection duty as RGR's tiled duplicate checks).

    Candidate generation self-joins the PREFIXES only: each doc's
    p = s - ceil(tau*s) + 1 globally-rarest ids (total order: document
    frequency asc, tid asc).  Completeness proof (the prefix-filtering
    lemma, made airtight by the size bound that J >= tau itself
    implies): qualifying pairs have min(sa,sb) >= tau*max(sa,sb), so
    o = |A n B| >= tau*(sa+sb)/(1+tau) >= tau*max(sa,sb) =: take
    alpha = ceil(tau*max); both actual prefixes are at least
    s - alpha + 1 long (since ceil(tau*s) <= alpha for both sides).
    Let c* be the GLOBALLY SMALLEST common id.  If c* fell past A's
    prefix, A's suffix (alpha - 1 slots, c* included) would have to
    hold ALL o >= alpha common ids — every other common id sorts after
    c* — a contradiction; symmetrically for B.  So c* sits in BOTH
    prefixes and the equi-join finds the pair.  The same argument is
    why the order must be one TOTAL order shared by all docs: with
    per-doc orders "every other common id sorts after c*" fails and so
    does completeness.

    Every gate is integer-exact: ceil(tau*s) = (num*s + den - 1) DIV den;
    the size prune den*min(sa,sb) >= num*max(sa,sb) (a consequence of
    J >= tau, so it never drops a qualifying pair) and the final verify
    den*inter >= num*uni never touch a float.  The reported jaccard is
    ONE correctly-rounded division of two exact integers,
    ROUND(,6)-guarded — bit-identical cross-engine.

    Scale shape: ids only, bodies never shuffle.  The document-frequency
    table is token-keyed (map-side combinable); the prefix cut is a
    per-doc window (narrow, doc-partitioned); the candidate join streams
    prefix-vs-prefix — O((1-tau)*s) ids per doc on BOTH legs, and
    candidate volume is driven by RARE ids (common ids fall past every
    prefix), the known AllPairs skew discipline; verification touches
    candidate pairs only, through the shared jaccard_pairs kernel.
    Pruning stages only ever SHRINK the candidate set — the verified
    output is invariant to them, which is what the definitional
    quadratic oracle certifies."""
    from pyspark.sql import Window

    sizes = doc_tids.groupBy("doc_id").agg(F.count(F.lit(1)).alias("s"))
    stream = doc_tids.join(sizes, "doc_id")
    dfreq = doc_tids.groupBy("tid").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("doc_id").orderBy("__df", "tid")
    prefix = (
        stream.join(dfreq, "tid")
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            F.col("__rn")
            <= F.expr(f"s - (({num} * s + {den - 1}) DIV {den}) + 1")
        )
        .select(F.col("doc_id").alias("__dp"), "tid", F.col("s").alias("__sp"))
    )
    probe = prefix.select(
        F.col("__dp").alias("__dt"), "tid", F.col("__sp").alias("__st")
    )
    cand = (
        prefix.join(probe, "tid")
        .filter(F.col("__dp") != F.col("__dt"))
        .filter(
            F.lit(den) * F.least("__sp", "__st")
            >= F.lit(num) * F.greatest("__sp", "__st")
        )
        .select(
            F.least("__dp", "__dt").alias("doc_a"),
            F.greatest("__dp", "__dt").alias("doc_b"),
        )
        .distinct()
    )
    v = jaccard_pairs(doc_tids, cand)
    uni = (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("long")
    return (
        v.filter(F.lit(den) * F.col("inter") >= F.lit(num) * uni)
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").cast("long").alias("inter"),
            uni.alias("uni"),
            F.round(
                F.col("inter").cast("double") / uni.cast("double"), 6
            ).alias("jaccard"),
        )
    )


#: containment threshold tau = CONTAIN_NUM / CONTAIN_DEN (rational —
#: every gate stays integer, the ALLPAIRS discipline).
CONTAIN_NUM = 9
CONTAIN_DEN = 10


def containment_pairs(
    doc_tids: DataFrame,
    num: int = CONTAIN_NUM,
    den: int = CONTAIN_DEN,
) -> DataFrame:
    """EXACT asymmetric containment self-join: ALL ordered pairs with
    |A n B| / |A| >= num/den, A != B — "doc A's shingle content is
    (nearly) subsumed by doc B", the quote / mirror / provenance
    detector a training-data pipeline runs where symmetric Jaccard is
    blind (a paragraph quoted inside a book has Jaccard ~0 but
    containment ~1).

    Candidate generation indexes each doc's PREFIX — its
    p = s - ceil(tau*s) + 1 globally-rarest ids — and probes the FULL
    id stream (Bayardo's All-Pairs indexing scheme).  Unlike
    allpairs_jaccard, index-vs-full is FORCED here, not chosen:
    containment implies no size bound on the superset side (B may be
    arbitrarily large), and without min >= tau*max the prefix-prefix
    completeness argument collapses — the superset's prefix can be
    entirely ids the subset never saw.  The index-vs-full lemma needs
    only the subset side: containment >= tau gives o >= ceil(tau*|A|)
    common ids, A's suffix has ceil(tau*|A|) - 1 slots, so some
    prefix(A) id lands in B and the equi-join finds the ordered pair.

    All gates integer (ceil via DIV; verify den*inter >= num*s_sub);
    the reported containment is one correctly-rounded division,
    ROUND(,6)-guarded.  Exact duplicates appear in BOTH directions —
    the relation is not symmetric and not deduplicated, by contract.

    Scale shape: ids only; the probe side streams the full id table
    but meets only PREFIX ids on the join key — common ids fall past
    every prefix, so candidate volume is driven by rare ids exactly as
    in allpairs_jaccard; verification touches candidate pairs only."""
    from pyspark.sql import Window

    sizes = doc_tids.groupBy("doc_id").agg(F.count(F.lit(1)).alias("s"))
    dfreq = doc_tids.groupBy("tid").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("doc_id").orderBy("__df", "tid")
    prefix = (
        doc_tids.join(sizes, "doc_id")
        .join(dfreq, "tid")
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            F.col("__rn")
            <= F.expr(f"s - (({num} * s + {den - 1}) DIV {den}) + 1")
        )
        .select(F.col("doc_id").alias("doc_sub"), "tid")
    )
    cand = (
        prefix.join(
            doc_tids.select(F.col("doc_id").alias("doc_sup"), "tid"),
            "tid",
        )
        .filter(F.col("doc_sub") != F.col("doc_sup"))
        .select("doc_sub", "doc_sup")
        .distinct()
    )
    sub = doc_tids.select(F.col("doc_id").alias("doc_sub"), "tid")
    sup = doc_tids.select(F.col("doc_id").alias("doc_sup"), "tid")
    inter = (
        cand.join(sub, "doc_sub")
        .join(sup, ["doc_sup", "tid"])
        .groupBy("doc_sub", "doc_sup")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_sub").withColumnRenamed(
                "s", "size_sub"
            ),
            "doc_sub",
        )
        .filter(F.lit(den) * F.col("inter") >= F.lit(num) * F.col("size_sub"))
        .select(
            "doc_sub",
            "doc_sup",
            F.col("inter").cast("long").alias("inter"),
            F.col("size_sub").cast("long").alias("size_sub"),
            F.round(
                F.col("inter").cast("double")
                / F.col("size_sub").cast("double"),
                6,
            ).alias("containment"),
        )
    )


def bag_jaccard(documents: DataFrame, pairs: DataFrame) -> DataFrame:
    """Weighted (multiset / bag-of-words) Jaccard for given
    (doc_a, doc_b) pairs:
    J_w = sum_t min(tf_a, tf_b) / sum_t max(tf_a, tf_b) — the
    repetition-aware refinement of set Jaccard (two docs with the same
    vocabulary but one of them looping a sentence 50x look identical
    to set Jaccard; the bag score exposes them).  Standard second
    stage over an exact or LSH near-dup pair set.

    Exactness: the identity sum(max) = tot_a + tot_b - sum(min) keeps
    everything in ONE shared-token join — term frequencies, the min
    fold and both totals are exact BIGINTs; J_w is one
    correctly-rounded division, ROUND(,6)-guarded.

    Scale shape: tf/totals are (doc, token)-keyed map-side-combinable
    folds over the PAIRED docs only (semi-join pushdown via the pair
    list); the min fold touches candidate pairs x shared tokens.
    Pairs sharing no token at all would drop (inner join) — callers
    feed near-dup pairs, where that set is empty by construction."""
    tok = tokens(documents)
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    tot = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("tot"))
    a = tf.select(
        F.col("doc_id").alias("doc_a"), "tok", F.col("tf").alias("tf_a")
    )
    b = tf.select(
        F.col("doc_id").alias("doc_b"), "tok", F.col("tf").alias("tf_b")
    )
    smin = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least("tf_a", "tf_b")).alias("w_inter"))
    )
    w_uni = (F.col("tot_a") + F.col("tot_b") - F.col("w_inter")).cast(
        "long"
    )
    return (
        smin.join(
            tot.select(F.col("doc_id").alias("doc_a"),
                       F.col("tot").alias("tot_a")),
            "doc_a",
        )
        .join(
            tot.select(F.col("doc_id").alias("doc_b"),
                       F.col("tot").alias("tot_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("w_inter").cast("long").alias("w_inter"),
            w_uni.alias("w_uni"),
            F.round(
                F.col("w_inter").cast("double") / w_uni.cast("double"), 6
            ).alias("w_jaccard"),
        )
    )
