"""Bucketed-table co-location: the join must be Exchange-free and the
results identical to the plain shuffled join."""

import pytest
from pyspark.sql import functions as F

from rgr_pdal_topo_spark.sources.bucketed import read_bucketed, write_bucketed
from rgr_pdal_topo_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    """documents bucketed by doc_id x a per-doc stats dim bucketed the
    same way — the recurring join every dedup/quality pipeline makes."""
    base = tmp_path_factory.mktemp("bucketed")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    stats = docs.select(
        "doc_id", F.length("text").alias("n_chars")
    )
    write_bucketed(docs, "b_docs", "doc_id", 8, str(base / "docs"))
    write_bucketed(stats, "b_stats", "doc_id", 8, str(base / "stats"))
    yield "b_docs", "b_stats"
    for t in ("b_docs", "b_stats"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _no_broadcast(spark):
    return spark.conf.get("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    t_docs, t_stats = bucketed_pair
    prev = _no_broadcast(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, t_docs).join(
            read_bucketed(spark, t_stats), "doc_id"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        # both scans must actually carry the bucket spec
        assert plan.count("Bucketed: true") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    t_docs, t_stats = bucketed_pair
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    stats = docs.select("doc_id", F.length("text").alias("n_chars"))
    exp = sorted(
        (r.doc_id, r.n_chars) for r in docs.join(stats, "doc_id").collect()
    )
    got = sorted(
        (r.doc_id, r.n_chars)
        for r in read_bucketed(spark, t_docs)
        .join(read_bucketed(spark, t_stats), "doc_id")
        .collect()
    )
    assert got == exp and len(got) > 0


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also reuses the write-time layout."""
    t_docs, _ = bucketed_pair
    agg = read_bucketed(spark, t_docs).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
