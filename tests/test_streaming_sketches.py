"""Streaming sketches: the drained stream's registers/counters equal the
batch fold over the same files (micro-batch boundaries invisible), and
the streaming state is the bounded sketch itself."""

from __future__ import annotations

import shutil
import tempfile

from rgr_pdal_topo_spark.operators import dedup, sketches
from rgr_pdal_topo_spark.streaming import sketches as ssk
from rgr_pdal_topo_spark.streaming.dedup import docs_stream
from rgr_pdal_topo_spark.streaming.windows import run_to_memory


def _write_docs(spark):
    src = tempfile.mkdtemp()
    rows = [
        (i, " ".join("tok%d" % ((i * 7 + j) % 50) for j in range(12)))
        for i in range(60)
    ]
    # several files -> several micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame(rows, "doc_id long, text string").repartition(
        3
    ).write.mode("overwrite").parquet(src)
    return src


def test_streaming_hll_equals_batch(spark):
    src = _write_docs(spark)
    try:
        got = run_to_memory(
            ssk.hll_register_stream(docs_stream(spark, src)), "hll_stream"
        )
        batch = sketches.hll_fold(
            sketches.shingle_tid_stream(spark.read.parquet(src))
        )
        assert {tuple(r) for r in got.collect()} == {
            tuple(r) for r in batch.collect()
        }
        assert got.count() <= sketches.HLL_M  # state bound
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_streaming_cms_equals_batch(spark):
    src = _write_docs(spark)
    try:
        got = run_to_memory(
            ssk.cms_counter_stream(docs_stream(spark, src)), "cms_stream"
        )
        from pyspark.sql import functions as F

        docs = spark.read.parquet(src)
        raw = docs.select(dedup._tok_array().alias("toks")).select(
            F.explode(
                dedup._shingle_array(F.col("toks"), dedup.SHINGLE_K,
                                     distinct=False)
            ).alias("shingle")
        )
        batch = sketches.cms_fold(
            raw.select(dedup._portable_id(F.md5("shingle")).alias("tid"))
        )
        assert {tuple(r) for r in got.collect()} == {
            tuple(r) for r in batch.collect()
        }
        assert got.count() <= sketches.CMS_D * sketches.CMS_W  # state bound
    finally:
        shutil.rmtree(src, ignore_errors=True)
