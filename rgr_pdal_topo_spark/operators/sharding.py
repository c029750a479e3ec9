"""Rendezvous (highest-random-weight) sharding of the document space.

The shard-assignment layer a 10^12-doc crawl store needs under
elasticity: every doc goes to argmax_s weight(doc, s), so assignment
needs NO central table, any node can compute it, and — the HRW
guarantee — adding shard N+1 moves exactly the docs whose new shard's
weight beats all old ones (expected fraction 1/(N+1)), while every
other doc stays put.  Hash-mod sharding reshuffles (N)/(N+1) of the
corpus on the same event; this module measures the difference instead
of asserting it.

Weights are the repo's portable construction — md5 over
"doc_id:shard" folded by the exact base-16 Horner (operators/dedup.py
horner_hash_sql) — so the DuckDB oracle replays every weight
bit-for-bit; no xxhash64 dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgr_pdal_topo_spark.operators.dedup import _portable_id

N_SHARDS = 16


def rendezvous_assign(
    documents: DataFrame, n_shards: int = N_SHARDS
) -> DataFrame:
    """(doc_id, shard): highest-random-weight assignment over
    ``n_shards`` shards — ties (md5-impossible in practice, but the
    ordering must still be total) break to the SMALLEST shard id."""
    s = documents.select("doc_id").select(
        "doc_id",
        F.explode(
            F.array(*[F.lit(i) for i in range(n_shards)])
        ).alias("s"),
    )
    w = _portable_id(
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("s").cast("string"),
            )
        )
    )
    return (
        s.select("doc_id", "s", w.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.max(
                F.struct(F.col("w"), (-F.col("s")).alias("ns"))
            ).alias("m")
        )
        .select("doc_id", (-F.col("m.ns")).cast("long").alias("shard"))
    )


def rendezvous_report(
    documents: DataFrame, n_shards: int = N_SHARDS
) -> DataFrame:
    """Per-shard elasticity report for growing ``n_shards`` ->
    ``n_shards + 1``: (shard, n_docs, n_moved, moved_frac), where
    n_moved counts docs this shard loses to the NEW shard (HRW moves
    docs nowhere else, and the report proves it: moved docs' new
    assignment is always shard n_shards).

    One explode to n_shards + 1 weights per doc, both argmaxes in ONE
    aggregation (the old-universe argmax is a filtered conditional max
    of the same structs) — no second pass over the corpus.  All counts
    exact BIGINTs; moved_frac is one correctly-rounded division,
    ROUND(,6)-guarded.

    Scale shape: a narrow (doc_id, shard) explode with bounded fan-out
    (N+1), one doc-keyed agg with map-side combine, one shard-keyed
    rollup of n_shards rows.  No window, no Python, no collect."""
    s = documents.select("doc_id").select(
        "doc_id",
        F.explode(
            F.array(*[F.lit(i) for i in range(n_shards + 1)])
        ).alias("s"),
    )
    w = _portable_id(
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("s").cast("string"),
            )
        )
    )
    assigned = (
        s.select("doc_id", "s", w.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.max(
                F.when(
                    F.col("s") < n_shards,
                    F.struct(F.col("w"), (-F.col("s")).alias("ns")),
                )
            ).alias("m_old"),
            F.max(
                F.struct(F.col("w"), (-F.col("s")).alias("ns"))
            ).alias("m_new"),
        )
        .select(
            (-F.col("m_old.ns")).cast("long").alias("shard"),
            (-F.col("m_new.ns")).cast("long").alias("shard_plus"),
        )
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            (F.col("shard_plus") != F.col("shard")).cast("long")
        ).alias("n_moved"),
        F.round(
            F.sum((F.col("shard_plus") != F.col("shard")).cast("long"))
            .cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("moved_frac"),
    )
