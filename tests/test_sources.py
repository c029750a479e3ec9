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


def test_jsonl_roundtrip_and_corrupt_quarantine(spark, tmp_path):
    """JSONL ingest: declared-schema read equals the parquet content
    byte-for-byte after a write->read roundtrip, and malformed lines are
    quarantined into _corrupt instead of failing or vanishing."""
    import os

    from rgr_pdal_topo_spark.sources.jsonl import (
        corrupt_lines,
        read_documents_jsonl,
        write_documents_jsonl,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, path)
    back = read_documents_jsonl(spark, path, drop_corrupt=True)
    a = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    b = back.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert list(b.columns) == list(a.columns)
    assert a.equals(b[a.columns])

    # plant two malformed lines next to the good ones
    bad = str(tmp_path / "bad.jsonl")
    with open(bad, "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", '
                '"source": "s", "n_chars": 2}\n')
        f.write('{"doc_id": "not-a-number", "text": 5, "lang": []}\n')
        f.write('this is not json at all\n')
    # corrupt-only-column queries need a materialized batch (see
    # corrupt_lines docstring) — cache once like an ingest job would
    df = read_documents_jsonl(spark, bad).cache()
    assert df.filter("_corrupt IS NULL").count() == 1
    assert corrupt_lines(df).count() == 2
    assert read_documents_jsonl(spark, bad, drop_corrupt=True).count() == 1
