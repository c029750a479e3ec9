"""Table sources.

The engine's canonical source is an Iceberg-layout table; in this sandbox
the driver materializes the same tables as plain parquet under
``/root/testdata/sf*/``.  ``spark.read.parquet`` gives identical pushdown
behavior (column pruning + predicate pushdown + partition pruning) to the
Iceberg reader for our purposes — the reference analogue is the EPT reader's
bounds/resolution pushdown (pointCloudCreation.py:176-192).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all driver tables as temp views (for spark.sql plans)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
