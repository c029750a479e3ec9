"""Per-partition checkpoint lineage: resumable tile-batch processing.

The reference memoizes derivatives as suffixed files and skips recompute
when they exist (loadDerivedGrid baseGrid.py:1150-1173;
_areGridsAlreadyCalculated flowRoutingGrids.py:122-141).  The engine's
version is partition-granular, as the north_rule requires: any tile batch
is resumable, with a manifest recording lineage + metrics per batch.

Layout under ``base_path``:
    out/batch=<k>/...parquet     -- results of batch k
    manifest/...parquet          -- one row per completed batch:
        batch_id, input_fingerprint, n_rows, completed_at, fp_version

``run`` computes only PENDING batches (all batches anti-join manifest) and
validates that completed batches' input fingerprints still match (input
drift -> loud error, not silent staleness).  The fingerprint is an
order-insensitive aggregate over the batch's input rows, computed in the
same job that processes the batch (no extra scan of done batches).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# Fingerprint algorithm version, persisted per manifest row.  v1 was
# SUM(xxhash64) (overflows int64 under ANSI sessions); v2 is bit_xor.
# The algorithms produce different values for identical inputs, so a
# manifest written by one can NEVER be validated by the other — the
# version column turns that silent everything-drifted false alarm into
# a loud rebuild instruction.
FP_VERSION = 2


class BatchCheckpointer:
    def __init__(self, base_path: str, n_batches: int = 16):
        self.base = base_path.rstrip("/")
        self.n_batches = n_batches
        self.out_path = f"{self.base}/out"
        self.manifest_path = f"{self.base}/manifest"

    # -- manifest ----------------------------------------------------------
    def completed(self, spark: SparkSession) -> DataFrame:
        if not os.path.exists(self.manifest_path):
            return spark.createDataFrame(
                [],
                "batch_id int, input_fingerprint long, n_rows long, "
                "completed_at double, fp_version int",
            )
        done = spark.read.parquet(self.manifest_path)
        if "fp_version" not in done.columns:
            # manifests written before versioning used the v1 SUM
            # fingerprint
            done = done.withColumn("fp_version", F.lit(1))
        return done

    def _check_fp_version(self, done: DataFrame) -> None:
        stale = done.filter(F.col("fp_version") != F.lit(FP_VERSION))
        n = stale.count()
        if n:
            vs = sorted(
                r.fp_version
                for r in stale.select("fp_version").distinct().collect()
            )
            raise RuntimeError(
                f"{n} completed batches carry fingerprint version(s) {vs} "
                f"but this engine computes version {FP_VERSION}; their "
                "stored fingerprints cannot be re-validated — delete the "
                f"manifest at {self.manifest_path} to rebuild"
            )

    # -- main entry ---------------------------------------------------------
    def run(
        self,
        inputs: DataFrame,
        transform,
        batch_col: str = "pid",
    ) -> DataFrame:
        """Process pending batches of ``inputs`` through ``transform``
        (DataFrame -> DataFrame; must keep the ``batch_id`` column), append
        results + manifest rows, and return the full checkpointed output.
        """
        spark = inputs.sparkSession
        batched = inputs.withColumn(
            "batch_id",
            F.pmod(F.col(batch_col), F.lit(self.n_batches)).cast("int"),
        )
        done = self.completed(spark)
        done_ids = [r.batch_id for r in done.select("batch_id").collect()]

        if done_ids:
            self._check_fp_version(done)

        if done_ids:  # completed-batch input drift -> loud error
            drift = self.validate(inputs, batch_col)
            n_drift = drift.count()
            if n_drift:
                raise RuntimeError(
                    f"{n_drift} completed batches' inputs drifted since "
                    "checkpointing; refusing to resume (delete the "
                    "manifest to rebuild)"
                )

        pending = batched.filter(~F.col("batch_id").isin(done_ids)) if done_ids else batched

        # Fingerprint of pending inputs: bit_xor over per-row xxhash64.
        # XOR is order-insensitive AND overflow-free — a SUM of uniform
        # int64 hashes wraps with near-certainty past a few thousand rows,
        # which is silent under ansi.enabled=false but ARITHMETIC_OVERFLOW
        # under an ANSI session.  (Known xor caveat: adding the same row an
        # even number of times cancels; drift detection on real inputs is
        # about edits/appends, where this is negligible.)
        fps = (
            pending.withColumn("__h", F.xxhash64(*inputs.columns))
            .groupBy("batch_id")
            .agg(
                F.expr("bit_xor(__h)").alias("input_fingerprint"),
                F.count(F.lit(1)).alias("n_input_rows"),
            )
        )

        out = transform(pending)
        if "batch_id" not in out.columns:
            raise ValueError("transform must preserve batch_id")
        # dynamic partition overwrite: re-running a batch after a crash
        # between the data write and the manifest write replaces (not
        # duplicates) that batch's partition -> resume is idempotent
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self.out_path)
        )

        result_counts = (
            spark.read.parquet(self.out_path)
            .groupBy("batch_id")
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )
        new_manifest = (
            fps.join(result_counts, "batch_id")
            .withColumn("completed_at", F.lit(time.time()))
            .withColumn("fp_version", F.lit(FP_VERSION))
            .select(
                "batch_id", "input_fingerprint", "n_rows", "completed_at",
                "fp_version",
            )
        )
        new_manifest.write.mode("append").parquet(self.manifest_path)
        return spark.read.parquet(self.out_path)

    def validate(self, inputs: DataFrame, batch_col: str = "pid") -> DataFrame:
        """Recompute input fingerprints and compare with the manifest;
        returns rows whose inputs drifted since checkpointing."""
        spark = inputs.sparkSession
        batched = inputs.withColumn(
            "batch_id",
            F.pmod(F.col(batch_col), F.lit(self.n_batches)).cast("int"),
        )
        fps = (
            batched.withColumn("__h", F.xxhash64(*inputs.columns))
            .groupBy("batch_id")
            .agg(F.expr("bit_xor(__h)").alias("fp_now"))
        )
        done = self.completed(spark)
        self._check_fp_version(done)
        return (
            done.join(fps, "batch_id")
            .filter(F.col("fp_now") != F.col("input_fingerprint"))
            .select("batch_id", "input_fingerprint", "fp_now")
        )
