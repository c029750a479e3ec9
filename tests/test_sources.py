"""Source-layer tests: parquet vs catalog-table dispatch."""

from __future__ import annotations

import pytest

from rgr_pdal_topo_spark.sources.tables import TABLES, load_table


def test_unknown_table_rejected(spark):
    with pytest.raises(KeyError):
        load_table(spark, "/root/testdata/sf0.001", "nope")


def test_catalog_dispatch_reads_through_session_catalog(spark):
    # a temp view stands in for an Iceberg catalog table: the table: path
    # must resolve through spark.read.table, not the filesystem
    pq = load_table(spark, "/root/testdata/sf0.001", "documents")
    pq.createOrReplaceTempView("documents")
    cat = load_table(spark, "table:", "documents")
    assert cat.columns == pq.columns
    assert cat.count() == pq.count()


def test_all_tables_load(spark):
    for t in TABLES:
        df = load_table(spark, "/root/testdata/sf0.001", t)
        assert len(df.columns) > 0
