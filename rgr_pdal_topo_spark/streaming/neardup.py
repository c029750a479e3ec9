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
(``doc_b IS NULL``, one per hot band per arrival — at-least-once under
redelivery; dedupe on (doc_a, band) for exact-once accounting) rather
than dropped silently — the streaming twin of ``lsh_drop_report``'s
never-silent contract.  On a corpus where no bucket crosses the cap the
drained pair set equals the batch candidate set exactly (asserted in
tests/test_streaming_neardup.py).

Scale notes: per-bucket state is at most ``max_bucket`` int64s (the
resident list is kept even once hot — bounded, and forgetting it would
mis-mark redelivered residents as skipped) plus a hot flag; post-hot
arrivals are NOT added to state, so a hot bucket's state stops growing
at the cap.  The only shuffle is the state-store hash on
(band, band_key), the same key the batch self-join shuffles on.  For
unbounded ingest add a state TTL (GroupStateTimeout) at the horizon
your dedup window needs — candidates only form within bucket lifetime.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
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
    SHINGLE_K,
    minhash_bands_rowwise,
)


def banded_signatures(
    docs: DataFrame,
    bands: int = 8,
    rows_per_band: int = 2,
    k: int = SHINGLE_K,
) -> DataFrame:
    """(doc_id, band, band_key) — one row per band per doc, computed
    entirely row-locally (operators/dedup.minhash_bands_rowwise, the
    shared batch/stream spelling): bit-identical to the exploded batch
    chain, and legal on an unbounded stream because nothing shuffles."""
    return minhash_bands_rowwise(docs, bands, rows_per_band, k)


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
        out_b: list[int | None] = []
        for pdf in pdfs:
            for d in sorted(set(int(x) for x in pdf["doc_id"])):
                if d in res:
                    # already a resident: its pairs were emitted when it
                    # arrived — at-least-once redelivery stays silent
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
        # the resident list stays in state even once hot (bounded at
        # max_bucket ids): dropping it would make redelivered RESIDENTS
        # look new and emit spurious skip markers.  Post-hot arrivals are
        # deliberately NOT recorded — remembering every skipped doc is
        # exactly the unbounded state the cap exists to avoid, so their
        # markers are at-least-once under redelivery (dedupe downstream
        # on (doc_a, band) if exact-once accounting matters).
        state.update((seen, hot))
        if out_a:
            yield pd.DataFrame(
                {
                    "doc_a": pd.array(out_a, dtype="Int64"),
                    # plain int64 would be promoted to float64 by the None
                    # markers and corrupt doc ids above 2^53 — keep the
                    # nullable integer dtype through Arrow
                    "doc_b": pd.array(out_b, dtype="Int64"),
                    "band": int(band),
                }
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
