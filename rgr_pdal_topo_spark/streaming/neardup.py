"""Streaming MinHash near-dup detection (crawl-ingest shape).

The batch pipeline (operators/dedup.py) finds near-dup candidates with
shingled MinHash + LSH banding over a landed corpus; a Common-Crawl-style
ingest wants the same answer AS DOCUMENTS ARRIVE.  Two stages:

* :func:`banded_signatures` — STATELESS per-row re-spelling of
  shingle_ids -> minhash_signatures -> band mix as pure array
  expressions (split/transform/array_min), so the signature never needs
  the batch path's groupBy: no shuffle, no state, works identically on
  a static or streaming frame (the parity test pins it bit-for-bit to
  the batch operators).
* :func:`lsh_candidate_stream` — stateful banding join via
  ``applyInPandasWithState`` keyed by (band, band_key): state holds the
  doc_ids seen in the bucket (bounded by ``max_bucket``); each arriving
  doc emits candidate pairs against the bucket's residents.

Semantics vs batch: the batch cap is RETROSPECTIVE (a bucket that ends
up over ``max_bucket`` contributes no pairs at all); a stream cannot
retract, so the cap here is PREFIX-GREEDY — the first ``max_bucket``
residents pair normally, later arrivals are reported as skip rows
(``doc_b IS NULL``, one per hot band) rather than dropped silently —
the streaming twin of ``lsh_drop_report``'s never-silent contract.
On a corpus where no bucket crosses the cap the drained pair set equals
the batch candidate set exactly (asserted in tests/test_streaming_neardup.py).

Scale notes: per-bucket state is at most ``max_bucket`` int64s (plus a
hot flag — hot buckets drop their resident list, so the hottest key
holds the LEAST state); the only shuffle is the state-store hash on
(band, band_key), the same key the batch self-join shuffles on.  For
unbounded ingest add a state TTL (GroupStateTimeout) at the horizon
your dedup window needs — candidates only form within bucket lifetime.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from rgr_pdal_topo_spark.operators.dedup import (
    MAX_BUCKET,
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    N_PERM,
    SHINGLE_K,
    _tok_array,
)


def _tid_array(k: int) -> Column:
    """array<long> of portable shingle ids for one document row — the
    per-row twin of shingle_ids (duplicates are harmless under min, so
    the batch path's distinct is skipped)."""
    toks = F.col("__toks")
    n = F.size(toks)
    idx = F.when(
        n >= F.lit(k), F.sequence(F.lit(1), n - F.lit(k - 1))
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]
        ),
    )
    return F.transform(
        F.array_distinct(sh),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % F.lit(MINHASH_P),
    )


def banded_signatures(
    docs: DataFrame,
    bands: int = 8,
    rows_per_band: int = 2,
    k: int = SHINGLE_K,
) -> DataFrame:
    """(doc_id, band, band_key) — one row per band per doc, computed
    entirely row-locally.  Bit-identical to the batch chain
    _band_mix(minhash_signatures(shingle_ids(docs))); docs with fewer
    than ``k`` tokens produce no rows (no shingles -> no signature),
    matching the batch path."""
    if bands * rows_per_band != N_PERM:
        raise ValueError(
            f"bands ({bands}) x rows_per_band ({rows_per_band}) must "
            f"equal N_PERM ({N_PERM})"
        )
    tids = (
        docs.select("doc_id", _tok_array().alias("__toks"))
        .select("doc_id", _tid_array(k).alias("__tids"))
        .filter(F.size("__tids") > 0)
    )
    def perm_min(j: int) -> Column:
        # nb: the lambda must take exactly ONE parameter — pyspark reads
        # the signature and a second parameter means (element, index)
        return F.array_min(
            F.transform(
                F.col("__tids"),
                lambda t: (F.lit(MINHASH_A[j]) * t + F.lit(MINHASH_B[j]))
                % F.lit(MINHASH_P),
            )
        ).alias(f"m{j}")

    mins = tids.select("doc_id", *[perm_min(j) for j in range(N_PERM)])
    band_keys = [
        sum(
            F.col(f"m{b * rows_per_band + pos}") * F.lit(31 ** pos)
            for pos in range(rows_per_band)
        ).alias(f"bk{b}")
        for b in range(bands)
    ]
    stack = (
        f"stack({bands}, "
        + ", ".join(f"{b}, bk{b}" for b in range(bands))
        + ") AS (band, band_key)"
    )
    return mins.select("doc_id", *band_keys).select("doc_id", F.expr(stack))


_OUT = StructType(
    [
        StructField("doc_a", LongType()),
        StructField("doc_b", LongType()),
        StructField("band", IntegerType()),
    ]
)
_STATE = StructType(
    [
        StructField("doc_ids", ArrayType(LongType())),
        StructField("hot", BooleanType()),
    ]
)


def _bucket_fold(max_bucket: int):
    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band, _band_key = key
        if state.exists:
            seen, hot = list(state.get[0]), bool(state.get[1])
        else:
            seen, hot = [], False
        res = set(seen)
        out_a: list[int] = []
        out_b: list[float | None] = []
        for pdf in pdfs:
            for d in sorted(set(int(x) for x in pdf["doc_id"])):
                if d in res:
                    continue
                if hot or len(seen) >= max_bucket:
                    hot = True
                    out_a.append(d)
                    out_b.append(None)
                    continue
                for s in seen:
                    out_a.append(min(s, d))
                    out_b.append(max(s, d))
                seen.append(d)
                res.add(d)
        # hot buckets keep NO resident list: state for the hottest key is
        # the smallest, and arrival there stays O(1)
        state.update((([] if hot else seen), hot))
        if out_a:
            yield pd.DataFrame(
                {"doc_a": out_a, "doc_b": out_b, "band": int(band)}
            )

    return fold


def lsh_candidate_stream(
    banded: DataFrame, max_bucket: int = MAX_BUCKET
) -> DataFrame:
    """(doc_a, doc_b, band) candidate pairs as they form; ``doc_b IS
    NULL`` rows are hot-bucket skip markers (see module docstring).
    Use ``.writeStream.outputMode("append")`` + a checkpoint; distinct
    (doc_a, doc_b) over non-NULL rows is the candidate set."""
    return banded.groupBy("band", "band_key").applyInPandasWithState(
        _bucket_fold(max_bucket),
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
