"""JSONL (newline-delimited JSON) source for the page/documents tables.

Common-Crawl-style corpora commonly interchange as gzipped JSONL long
before they land in a columnar table.  This reader mirrors the parquet
path's scale discipline:

* the schema is DECLARED, never inferred — ``spark.read.json`` without a
  schema runs a full extra pass over 100 TB just to guess types;
* ``columnNameOfCorruptRecord`` quarantines malformed lines into a
  ``_corrupt`` column instead of failing the batch or silently dropping
  rows (callers decide: count them, route them to a dead-letter sink);
* column pruning still reaches the scan (Jackson parses only requested
  fields), though unlike parquet there is no row-group predicate skip —
  JSONL is the INGEST format; convert to parquet/Iceberg before query
  workloads (write_documents_jsonl exists mainly to produce test
  fixtures and dead-letter samples).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession, path: str, drop_corrupt: bool = False
) -> DataFrame:
    """Read a documents JSONL directory/file with the declared schema.

    Returns all schema columns plus ``_corrupt`` (NULL for well-formed
    lines).  With ``drop_corrupt`` the quarantined lines are filtered
    out — use ``corrupt_lines`` first if they must be accounted for."""
    df = (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    if drop_corrupt:
        df = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    return df


def corrupt_lines(df: DataFrame) -> DataFrame:
    """The quarantine: raw text of lines that failed the schema.

    Spark disallows queries whose referenced columns are ONLY the
    corrupt-record column on a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the parsed
    batch must be materialized first.  The materialization is scoped to
    this call: the input is persisted only long enough to checkpoint the
    (small) quarantine, then unpersisted — an earlier spelling left
    ``df.cache()`` pinned for the whole session, which accumulates
    executor storage across repeated ingest batches.  Callers that also
    query the parsed side should ``.cache()``/``.unpersist()`` around
    their own two-query pattern (see tests/test_sources.py)."""
    was_cached = df.is_cached
    if not was_cached:
        df.persist()
    try:
        return df.filter(F.col("_corrupt").isNotNull()).select(
            "_corrupt"
        ).localCheckpoint(eager=True)
    finally:
        if not was_cached:
            df.unpersist()


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    """Write the documents table as JSONL (fixture/dead-letter helper)."""
    docs.select("doc_id", "text", "lang", "source", "n_chars").write.mode(
        "overwrite"
    ).json(path)
