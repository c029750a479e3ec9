"""Bucketed-table layout: shuffle-free co-located joins.

The reference is single-process, so "join locality" never arises there;
at cluster scale it is the difference between a join that moves 100 TB
over the network and one that moves nothing (SURVEY.md §4 "Partitioning
& shuffle" — bucketing is listed as ours to add).  Writing both sides of
a recurring equi-join bucketed BY THE JOIN KEY with the SAME bucket
count lets every Spark scan report a compatible output partitioning, so
the sort-merge join runs with NO Exchange on either side — the shuffle
is paid once at write time and amortized over every subsequent join.

Bucket placement uses Spark's Murmur3 ``hash`` — the same function
``repartition(n, key)`` uses — so :func:`write_bucketed` pre-partitions
the frame identically to the bucket spec and each write task holds
exactly one bucket: one file per bucket.  (Per-bucket ``sortBy``
metadata is written too, but Spark 3+ no longer propagates it as scan
output ordering unless ``spark.sql.legacy.bucketedTableScan.
outputOrdering`` is set — the merge join keeps a cheap per-bucket
in-memory Sort; the Exchange, i.e. the network cost, is what the
layout eliminates.)

Catalog note: table METADATA (the bucket spec) lives in the session
catalog — in-memory here, Hive/Glue/Unity on a real deployment — while
the parquet files live at the caller's ``path`` (external table).  A
plain ``spark.read.parquet(path)`` of the same files still works but
sees no bucket spec and falls back to shuffling; always read back via
:func:`read_bucketed` / ``spark.table``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | str,
    n_buckets: int,
    path: str,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external parquet table bucketed on ``keys``.

    ``sort=True`` additionally sorts each bucket file by the keys —
    better compression and range-readable files; see the module note on
    when Spark will also elide the join-side Sort.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    writer = (
        df.repartition(n_buckets, *keys)
        .write.format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
    )
    if sort:
        writer = writer.sortBy(*keys)
    writer.mode(mode).saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog-aware read: the scan carries the bucket spec, so joins and
    aggregations on the bucket keys skip their Exchange."""
    return spark.table(table)
