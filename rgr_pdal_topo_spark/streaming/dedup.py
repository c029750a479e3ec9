"""Streaming deduplication (training-data ingest shape).

A Common-Crawl-style ingest stream dedups as it lands: the batch
operators in operators/dedup.py have direct Structured Streaming twins
here.

* ``exact_dedup_stream``  — dropDuplicatesWithinWatermark on the md5
  content digest: state is bounded by the watermark horizon (an unbounded
  dropDuplicates would grow state forever at 10^12 docs), and the key the
  state store holds is the 32-char digest, never the document body —
  the same shuffle-width argument as the batch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def docs_stream(spark: SparkSession, docs_dir: str) -> DataFrame:
    """File-source stream over the documents parquet directory."""
    schema = spark.read.parquet(docs_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )


def exact_dedup_stream(
    docs: DataFrame,
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Emit each distinct text exactly once (first arrival wins).

    With ``ts_col`` the stream keeps digest state only within the
    watermark horizon (dropDuplicatesWithinWatermark); without an event
    time it falls back to global dropDuplicates (test/bounded streams
    only — documented as the non-scale path)."""
    keyed = docs.withColumn("__digest", F.md5("text"))
    if ts_col is not None:
        keyed = keyed.withColumn(
            ts_col, F.col(ts_col).cast("timestamp")
        ).withWatermark(ts_col, watermark)
        return keyed.dropDuplicatesWithinWatermark(["__digest"]).drop(
            "__digest"
        )
    return keyed.dropDuplicates(["__digest"]).drop("__digest")


def run_stream_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Drain an append-mode stream into an in-memory sink."""
    from rgr_pdal_topo_spark.streaming.windows import run_to_memory

    return run_to_memory(stream_df, name, output_mode="append")
