"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real image/audio decode libraries are not in this container; the DECODE
step is stubbed (deterministic fake, or NotImplementedError when
``strict=True``), but everything Spark-side is real and tested: binary
columns, schema, Arrow batch shape through ``mapInPandas``, partitioning.
Swapping the stub for a real decoder (PIL/ffmpeg) changes one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_TYPES = ("image/png", "audio/wav", "video/mp4")


def attach_payload(documents: DataFrame) -> DataFrame:
    """Make the documents table multimodal-shaped: binary payload + typed
    metadata columns (media_type, payload_bytes)."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.length(F.encode(F.col("text"), "UTF-8")).alias("payload_bytes"),
    )


def _decode_stub(payload: bytes, media_type: str, strict: bool) -> np.ndarray:
    """STUB decoder: a real implementation would decode image pixels /
    audio samples here.  The deterministic fake derives FEATURE_DIM floats
    from the payload digest so the pipeline is testable end to end."""
    if strict:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in "
            "this environment; run with strict=False for the deterministic "
            "stub"
        )
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((4 * FEATURE_DIM) // 32 + 1))[: 4 * FEATURE_DIM],
                        dtype="<u4")
    return (raw.astype("float64") / 2**32).astype("float32")


def extract_features(
    payloads: DataFrame, strict: bool = False, batch_hint: int | None = None
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas keeps the binary column out of JVM<->Python row serde
    (whole Arrow batches), the shape a real decoder needs.
    """
    schema = (
        "doc_id long, media_type string, payload_bytes long, "
        f"feature array<float>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, m, strict)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": pdf["payload_bytes"],
                    "feature": feats,
                }
            )

    return payloads.mapInPandas(run, schema=schema)


def resize_stub(
    payloads: DataFrame, width: int = 32, height: int = 32,
    strict: bool = False,
) -> DataFrame:
    """'Resize' plumbing: a real image pipeline decodes the payload and
    resamples pixels to (width, height) here; the STUB emits the resize
    metadata plus a deterministic content digest bound to the target
    geometry, so the Spark-side contract — one Arrow stage, binary never
    in row serde, typed output schema — is real and testable.  Swapping
    in PIL changes only the per-row body."""
    schema = (
        "doc_id long, width int, height int, n_pixels long, "
        "resized_digest string"
    )
    suffix = f":{width}x{height}".encode()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image resize requires an image library not present "
                    "in this environment; run with strict=False for the "
                    "deterministic stub"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "n_pixels": np.int64(width) * height,
                    "resized_digest": [
                        hashlib.sha256(bytes(p) + suffix).hexdigest()[:16]
                        for p in pdf["payload"]
                    ],
                }
            )

    return payloads.mapInPandas(run, schema=schema)


def frame_sample(
    payloads: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' plumbing: one output row per sampled frame offset
    (a real video pipeline emits decoded frames; the stub emits byte
    offsets + a frame digest).  Demonstrates the 1->N mapInPandas shape."""
    schema = "doc_id long, frame_idx int, frame_offset long, frame_digest string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                for i in range(n):
                    off = i * every_n_bytes
                    chunk = payload[off : off + every_n_bytes]
                    rows.append(
                        (
                            doc_id,
                            i,
                            off,
                            hashlib.md5(chunk).hexdigest()[:16],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame_offset", "frame_digest"],
            )

    return payloads.mapInPandas(run, schema=schema)
