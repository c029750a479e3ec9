"""Streaming sketch twins (HLL registers / CMS counters as live state).

Sketches are the streaming-native answer to "how many distinct" and
"how often" at ingest time: both folds are plain streaming aggregations
whose state store holds the SKETCH ITSELF — at most 256 (reg, rho) rows
for HLL and CMS_D * CMS_W counter rows for CMS, regardless of how many
documents flow past.  That bounded-state property is exactly the merge
law the batch side pins (hll_merge / cms_merge): Spark's state store IS
the incremental merge.

Drain-equals-batch is pinned in tests/test_streaming_sketches.py: the
completed stream's registers/counters equal the batch fold over the same
files, micro-batch boundaries invisible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from rgr_pdal_topo_spark.operators import sketches


def hll_register_stream(docs: DataFrame) -> DataFrame:
    """Live HLL-256 registers over a documents stream (complete mode);
    state: <= 256 rows."""
    return sketches.hll_fold(sketches.shingle_tid_stream(docs))


def cms_counter_stream(docs: DataFrame) -> DataFrame:
    """Live count-min counters over a documents stream (complete mode);
    state: <= CMS_D * CMS_W rows."""
    from pyspark.sql import functions as F

    from rgr_pdal_topo_spark.operators import dedup

    raw = docs.select(dedup._tok_array().alias("toks")).select(
        F.explode(
            dedup._shingle_array(F.col("toks"), dedup.SHINGLE_K,
                                 distinct=False)
        ).alias("shingle")
    )
    ids = raw.select(dedup._portable_id(F.md5("shingle")).alias("tid"))
    return sketches.cms_fold(ids)
