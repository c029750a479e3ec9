"""Streaming MinHash near-dup: stateless banding parity with the batch
operators, drained-stream == batch candidate set, hot-bucket markers."""

import pytest
from pyspark.sql import functions as F

from rgr_pdal_topo_spark.operators import dedup
from rgr_pdal_topo_spark.sources.tables import load_table
from rgr_pdal_topo_spark.streaming import neardup
from rgr_pdal_topo_spark.streaming.windows import run_to_memory
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def test_banded_signatures_match_batch_chain(spark, docs):
    """The per-row array spelling must be bit-identical to the batch
    shingle_ids -> minhash_signatures -> band-mix chain."""
    got = {
        (r.doc_id, r.band, r.band_key)
        for r in neardup.banded_signatures(docs).collect()
    }
    exp = {
        (r.doc_id, r.band, r.band_key)
        for r in dedup._band_mix(
            dedup.minhash_signatures(dedup.shingle_ids(docs)), 8, 2
        ).collect()
    }
    assert got == exp and len(got) > 0


def _drain(spark, docs, max_bucket, n_files=4):
    import tempfile

    src = tempfile.mkdtemp()
    docs.repartition(n_files).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = neardup.lsh_candidate_stream(
        neardup.banded_signatures(stream), max_bucket=max_bucket
    )
    return run_to_memory(out, "neardup_pairs", output_mode="append")


def test_stream_drain_equals_batch_candidates(spark, docs):
    """With no bucket over the cap, arrival order is irrelevant and the
    drained distinct pair set equals the batch LSH candidate set."""
    res = _drain(spark, docs, max_bucket=10**6)
    got = {
        (r.doc_a, r.doc_b)
        for r in res.filter(F.col("doc_b").isNotNull())
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    }
    exp = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_candidate_pairs(
            dedup.minhash_signatures(dedup.shingle_ids(docs)),
            max_bucket=10**6,
        ).collect()
    }
    assert got == exp and len(got) > 0
    assert res.filter(F.col("doc_b").isNull()).count() == 0


def test_stream_hot_bucket_prefix_greedy(spark):
    """8 identical docs with cap 4: the first 4 residents pair (C(4,2)=6
    distinct pairs), the later 4 emit skip markers in every band instead
    of growing the bucket."""
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(8)],
        "doc_id long, text string",
    )
    res = _drain(spark, df, max_bucket=4, n_files=8)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in res.filter(F.col("doc_b").isNotNull())
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    }
    assert len(pairs) == 6
    skipped = {
        r.doc_a
        for r in res.filter(F.col("doc_b").isNull()).collect()
    }
    assert len(skipped) == 4 and skipped.isdisjoint({a for a, _ in pairs})


def test_stream_redelivery_silent_and_bigint_exact(spark):
    """At-least-once delivery: redelivered residents emit nothing extra
    (pairs stay C(cap,2)); markers stay confined to the skipped docs; and
    doc_ids above 2^53 survive marker-mixed batches exactly (a float64
    round-trip would corrupt the odd ids)."""
    import tempfile
    import time

    base = 2 ** 53
    ids = [base + i for i in (1, 3, 5, 7, 9, 11)]
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in ids],
        "doc_id long, text string",
    )
    src = tempfile.mkdtemp()
    df.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    df.coalesce(1).write.mode("append").parquet(src)  # full redelivery
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = neardup.lsh_candidate_stream(
        neardup.banded_signatures(stream), max_bucket=3
    )
    res = run_to_memory(out, "redelivery_pairs", output_mode="append")
    pairs = {
        (r.doc_a, r.doc_b)
        for r in res.filter(F.col("doc_b").isNotNull())
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    }
    residents, skipped_exp = set(ids[:3]), set(ids[3:])
    assert pairs == {
        (a, b) for a in residents for b in residents if a < b
    }
    # exact-count check: redelivered residents are SILENT, so the only
    # non-distinct pair rows are the 8 bands' worth from first arrival
    assert (
        res.filter(F.col("doc_b").isNotNull()).count() == 3 * 8
    )
    markers = [r.doc_a for r in res.filter(F.col("doc_b").isNull()).collect()]
    assert set(markers) == skipped_exp  # int-exact above 2^53
