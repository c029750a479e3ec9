"""Cursor-based incremental consumer over a manifest table.

The ingestion loop the north rule implies — "re-process ONLY the new
WARC batch, resumable from checkpoint" — expressed over the Iceberg-lite
snapshot log (sources/manifest.py): a consumer holds a durable cursor
(last fully processed snapshot id) and, on each run, processes the
snapshots committed past it, in order, exactly once from the sink's
point of view.

Why not Structured Streaming's file source: ``readStream`` discovers
work by LISTING directories, so a crashed producer's orphan files would
be consumed; here the snapshot log is the source of truth (orphans are
invisible by construction) and the unit of progress is a whole atomic
snapshot, never a partial file set.  The shape is the same as a
micro-batch trigger=AvailableNow pass, with the manifest as the offset
log.

Exactly-once protocol per snapshot k (same order as lineage's
BatchCheckpointer, plans/lineage.py):

1. read ONLY the files snapshot k added (``manifest_entries`` range),
2. apply the caller's transform, write to ``out/snap=k`` with
   mode=overwrite (idempotent — a retry rewrites the same directory),
3. advance the cursor file with an atomic rename.

A crash between 2 and 3 replays snapshot k on the next run; the
overwrite makes the replay invisible downstream.  Reference analogue:
``_areGridsAlreadyCalculated`` + suffix-cache reload
(flowRoutingGrids.py:122-173) — the single-process "skip what's done"
check, upgraded with an atomic cursor and append-only snapshot source.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from rgr_pdal_topo_spark.sources import manifest as man

__all__ = ["SnapshotConsumer"]


class SnapshotConsumer:
    """Processes an append-only manifest table one snapshot at a time."""

    def __init__(self, table_root: str, state_dir: str) -> None:
        self.table_root = table_root
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    @property
    def _cursor_path(self) -> str:
        return os.path.join(self.state_dir, "cursor.json")

    def cursor(self) -> int:
        """Last fully processed snapshot id (0 = nothing yet)."""
        if not os.path.exists(self._cursor_path):
            return 0
        with open(self._cursor_path) as fh:
            return json.load(fh)["snapshot"]

    def _advance(self, snap_id: int) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.state_dir, prefix=".cursor-")
        with os.fdopen(fd, "w") as fh:
            json.dump({"snapshot": snap_id}, fh)
        os.replace(tmp, self._cursor_path)

    def pending(self) -> list[int]:
        """Committed APPEND snapshot ids past the cursor, oldest first.

        Compaction snapshots rewrite rows the consumer already
        processed (operation != "append", zero new rows) — processing
        one would double-count, so they are skipped, exactly like
        Iceberg CDC skips replace snapshots.
        """
        cur = self.cursor()
        return [
            s["id"]
            for s in man.snapshots(self.table_root)
            if s["id"] > cur
            and s.get("operation", "append") == "append"
            and s["added_rows"] > 0  # empty ingest batch: nothing to do
        ]

    def out_dir(self, snap_id: int) -> str:
        return os.path.join(self.state_dir, "out", f"snap={snap_id}")

    def run(
        self,
        spark: SparkSession,
        transform: Callable[[DataFrame], DataFrame],
    ) -> list[int]:
        """Process every pending snapshot; returns the ids processed.

        Each snapshot's input is exactly the files it added (no
        re-reading of history); its output lands in ``out/snap=<id>``
        before the cursor advances, so a crash anywhere leaves either
        a fully-committed snapshot or a replayable one — never a torn
        or skipped batch.
        """
        done: list[int] = []
        for sid in self.pending():
            batch = man.scan(
                spark,
                self.table_root,
                snapshot=sid,
                since_snapshot=sid - 1 if sid > 1 else None,
            )
            transform(batch).write.mode("overwrite").parquet(
                self.out_dir(sid)
            )
            self._advance(sid)
            done.append(sid)
        return done

    def outputs(self, spark: SparkSession) -> DataFrame:
        """Union of every committed snapshot's output."""
        cur = self.cursor()
        if cur == 0:
            raise ValueError("no snapshots processed yet")
        dirs = [
            self.out_dir(s["id"])
            for s in man.snapshots(self.table_root)
            if s["id"] <= cur
            and s.get("operation", "append") == "append"
            and s["added_rows"] > 0  # skipped empties have no output
        ]
        return spark.read.parquet(*dirs)
