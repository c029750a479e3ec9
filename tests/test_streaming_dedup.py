"""Streaming exact-dedup: the drained stream equals the batch operator's
group count, and the plan carries the digest, not the body."""

from __future__ import annotations

import shutil
import tempfile

from rgr_pdal_topo_spark.operators import dedup as batch_dedup
from rgr_pdal_topo_spark.streaming import dedup as sdedup


def test_stream_dedup_matches_batch(spark):
    src = tempfile.mkdtemp()
    try:
        rows = [(i, "text-%d" % (i % 7)) for i in range(40)]
        spark.createDataFrame(rows, "doc_id long, text string").repartition(
            4
        ).write.mode("overwrite").parquet(src)
        out = sdedup.run_stream_to_memory(
            sdedup.exact_dedup_stream(sdedup.docs_stream(spark, src)),
            "dedup_stream",
        )
        got_texts = sorted(r.text for r in out.collect())
        assert got_texts == sorted("text-%d" % i for i in range(7))
        n_groups = batch_dedup.exact_duplicates(
            spark.read.parquet(src)
        ).count()
        assert out.count() == n_groups == 7
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_watermarked_variant_builds(spark):
    src = tempfile.mkdtemp()
    try:
        rows = [(i, "t-%d" % (i % 3), "2026-01-01 00:0%d:00" % (i % 6))
                for i in range(12)]
        (spark.createDataFrame(rows, "doc_id long, text string, ts string")
         .write.mode("overwrite").parquet(src))
        stream = sdedup.exact_dedup_stream(
            sdedup.docs_stream(spark, src), ts_col="ts", watermark="10 minutes"
        )
        out = sdedup.run_stream_to_memory(stream, "dedup_wm")
        # all events inside one watermark horizon -> exact dedup
        assert out.count() == 3
        plan = stream._jdf.queryExecution().analyzed().toString()
        assert "dropDuplicatesWithinWatermark" in plan.replace(" ", "") or \
            "DeduplicateWithinWatermark" in plan
    finally:
        shutil.rmtree(src, ignore_errors=True)
