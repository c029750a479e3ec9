"""Iceberg-lite snapshot/manifest table layout: file skipping, time
travel, incremental reads.

The north rule frames the engine's canonical input as an Iceberg table;
``sources/tables.py`` reads plain parquet (identical row-level pushdown)
but, as its docstring concedes, plain ``spark.read.parquet`` cannot
prune at the MANIFEST level — at 100 TB the difference between "open
every footer under the prefix" and "consult a KB-sized manifest and open
3 of 800 files" is the whole ballgame.  This module implements the part
of the Iceberg design the engine actually relies on, from scratch:

* **append-only snapshots** — each :func:`commit` writes data files into
  a fresh ``data/snap=<id>/`` directory plus a ``manifest-<id>.json``
  listing the files it ADDED with per-file row counts and per-column
  min/max stats; the snapshot log is then swapped in with an atomic
  rename.  A crash mid-commit leaves orphan files no manifest
  references — readers never see them (same visibility rule as
  Iceberg's metadata pointer swap).
* **file skipping** — :func:`scan` evaluates interval predicates against
  the manifest stats and hands Spark only the surviving files.  Stats
  are collected DISTRIBUTED (read-back grouped by ``input_file_name``),
  never by looping footers on the driver; the manifest itself is
  files-not-rows sized, the one thing that is legitimately
  driver-resident.  Pruning is conservative (a file is kept unless its
  stats PROVE no row can match) and the residual row filter is always
  re-applied, so correctness never depends on stats.
* **never-silent metrics** — :func:`scan_report` returns how many files
  each predicate kept/skipped (the ``lsh_drop_report`` doctrine: a scan
  that silently read 1/800th of the table and a scan that pruned
  796 files look identical in the result schema; the report is how you
  tell).
* **time travel / incremental** — ``snapshot=k`` reads the table as of
  snapshot k; ``since_snapshot=k`` reads only files added after k (the
  CDC-style incremental consumer the resumable-pipeline story needs:
  re-process ONLY the new WARC batch, not the whole lake).

Effective pruning needs clustered files: :func:`commit` therefore
``repartitionByRange`` s on the leading stat column (Iceberg's
sort-order spec plays this role), so each file owns a tight value range
and interval predicates skip hard.

Reference analogue: the EPT reader's bounds pushdown + the derived-grid
suffix cache (pointCloudCreation.py:176-192, baseGrid.py:1118-1173);
both are single-process file-naming conventions — the snapshot log,
stats manifest, and atomic visibility swap are the cluster-scale
re-expression.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "commit",
    "compact",
    "vacuum",
    "snapshots",
    "manifest_entries",
    "prune",
    "scan",
    "scan_report",
]

_LOG = "snapshots.json"


def _data_dir(root: str, snap_id: int) -> str:
    return os.path.join(root, "data", f"snap={snap_id}")


def _manifest_path(root: str, snap_id: int) -> str:
    return os.path.join(root, "manifest", f"manifest-{snap_id}.json")


def _normalize_file(uri: str) -> str:
    """input_file_name() yields file:///...; store plain paths."""
    if uri.startswith("file:"):
        uri = uri[len("file:"):]
        while uri.startswith("//"):
            uri = uri[1:]
    return uri


def snapshots(root: str) -> list[dict[str, Any]]:
    """The committed snapshot log, oldest first (empty for a new table)."""
    path = os.path.join(root, _LOG)
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return json.load(fh)["snapshots"]


def commit(
    df: DataFrame,
    root: str,
    stat_cols: Sequence[str],
    n_files: int = 8,
) -> int:
    """Append ``df`` to the table at ``root`` as a new snapshot.

    Files are range-clustered on ``stat_cols[0]`` so their min/max stats
    are tight (one value range per file -> interval predicates skip
    whole files).  Returns the new snapshot id.  Commit order: data
    files, then the manifest, then an atomic snapshot-log rename — a
    crash before the rename leaves invisible orphans, never a torn
    table.

    Scale note: stats here come from a distributed READ-BACK pass over
    the files just written (footer-cheap in practice, but a second scan
    nonetheless).  A production writer folds stats collection into the
    write itself (per-task min/max accumulated as files close — what
    Iceberg's writers do); the manifest format and everything downstream
    are unchanged by that swap.  The manifest itself is files-not-rows
    sized; past ~10^6 files per table the JSON-per-snapshot spelling
    should become parquet manifests pruned BY a Spark job (Iceberg's
    manifest-list tier) — same two-level design, bigger metadata tier.
    """
    return _write_snapshot(df, root, stat_cols, n_files, [], "append")


def compact(
    spark: SparkSession,
    root: str,
    stat_cols: Sequence[str],
    n_files: int = 8,
) -> int:
    """Rewrite the table's CURRENT live files into ``n_files``
    re-clustered ones, as a new snapshot that replaces them.

    Incremental appends accrete small files (the classic small-file
    problem: at 100 TB, per-file overhead and loose stats eat the
    pruning win); compaction restores tight range clustering without
    changing a single row.  The replaced files stay on disk and every
    pre-compaction snapshot stays exactly time-travelable — the new
    manifest merely lists them as removed from the CURRENT state.
    Readers that iterate snapshots (SnapshotConsumer) see
    ``operation: "compact"`` in the log and skip it: it carries no new
    rows.  (Full snapshot EXPIRY is deliberately out of scope: these
    manifests are deltas, so state is a fold over all of them — Iceberg
    can drop old metadata because every snapshot carries a complete
    manifest list; here retiring history would mean squashing deltas
    into a base manifest, complexity the engine doesn't need yet.)
    """
    entries = manifest_entries(root)
    if not entries:
        raise ValueError(f"nothing to compact at {root}")
    files = [e["file"] for e in entries]
    return _write_snapshot(
        spark.read.parquet(*files), root, stat_cols, n_files, files,
        "compact",
    )


def vacuum(root: str, grace_seconds: float = 3600.0) -> list[str]:
    """Delete data files no manifest references (crashed-commit orphans).

    Files REPLACED by compaction are still referenced by their original
    manifest and are kept — deleting them would break time travel; only
    never-committed files go.  Files younger than ``grace_seconds`` are
    also kept: an IN-FLIGHT commit's data files are unreferenced until
    its log rename lands, and deleting them would break the snapshot
    that is about to become visible (Iceberg's remove_orphan_files has
    the same retention guard).  Returns the deleted paths
    (never-silent).
    """
    import time

    referenced = {
        e["file"]
        for s in snapshots(root)
        for e in _read_manifest(root, s["id"])["entries"]
    }
    cutoff = time.time() - grace_seconds
    deleted: list[str] = []
    data_root = os.path.join(root, "data")
    for dirpath, _dirs, names in os.walk(data_root):
        for name in names:
            p = os.path.join(dirpath, name)
            if (
                name.endswith(".parquet")
                and p not in referenced
                and os.path.getmtime(p) <= cutoff
            ):
                os.remove(p)
                deleted.append(p)
    return deleted


def _read_manifest(root: str, snap_id: int) -> dict[str, Any]:
    with open(_manifest_path(root, snap_id)) as fh:
        m = json.load(fh)
    m.setdefault("removed_files", [])
    return m


def _write_snapshot(
    df: DataFrame,
    root: str,
    stat_cols: Sequence[str],
    n_files: int,
    removed_files: list[str],
    operation: str,
) -> int:
    """Single-writer commit: snapshot-id allocation is a read-modify-
    write of the log, and the atomic ``os.replace`` protects READERS
    from torn state, not two concurrent writers from each other — a
    multi-writer deployment puts the log swap behind a catalog
    compare-and-swap (exactly Iceberg's catalog requirement)."""
    from pyspark.sql import types as T

    stat_cols = list(stat_cols)
    if not stat_cols:
        raise ValueError("need at least one stat column")
    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files}")
    fields = {f.name: f.dataType for f in df.schema.fields}
    ok_types = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.StringType,
    )
    for c in stat_cols:
        if c not in fields:
            raise ValueError(f"stat column {c!r} not in {sorted(fields)}")
        if not isinstance(fields[c], ok_types):
            # JSON would stringify the min/max (default=str) and prune()
            # would then compare lexicographically — silently wrong.
            raise ValueError(
                f"stat column {c!r} has type {fields[c]}, which does not "
                "round-trip through JSON stats ordered; derive an "
                "int/double/string column first (e.g. epoch day for "
                "timestamps, as manifest_time_scan does)"
            )
    log = snapshots(root)
    snap_id = (log[-1]["id"] + 1) if log else 1
    ddir = _data_dir(root, snap_id)

    df.repartitionByRange(n_files, *stat_cols).write.mode(
        "overwrite"
    ).parquet(ddir)

    # Distributed stats pass: one partial+final agg over the files just
    # written; the collect is manifest-sized (one row per FILE).
    spark = df.sparkSession
    stats = (
        spark.read.parquet(ddir)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                agg(c).alias(f"{tag}__{c}")
                for c in stat_cols
                for tag, agg in (("min", F.min), ("max", F.max))
            ],
        )
        .collect()
    )
    entries = [
        {
            "file": _normalize_file(r["file"]),
            "snapshot": snap_id,
            "n_rows": r["n_rows"],
            "stats": {
                c: [r[f"min__{c}"], r[f"max__{c}"]] for c in stat_cols
            },
        }
        for r in stats
    ]
    entries.sort(key=lambda e: e["file"])

    os.makedirs(os.path.dirname(_manifest_path(root, snap_id)), exist_ok=True)
    with open(_manifest_path(root, snap_id), "w") as fh:
        json.dump(
            {"entries": entries, "removed_files": removed_files},
            fh,
            default=str,
        )

    log = log + [
        {
            "id": snap_id,
            "operation": operation,
            "added_files": len(entries),
            "added_rows": int(sum(e["n_rows"] for e in entries)),
            "removed_files": len(removed_files),
        }
    ]
    fd, tmp = tempfile.mkstemp(dir=root, prefix=".snapshots-")
    with os.fdopen(fd, "w") as fh:
        json.dump({"snapshots": log}, fh)
    os.replace(tmp, os.path.join(root, _LOG))  # the visibility swap
    return snap_id


def manifest_entries(
    root: str,
    snapshot: int | None = None,
    since_snapshot: int | None = None,
) -> list[dict[str, Any]]:
    """All file entries visible in the requested snapshot range.

    ``snapshot`` = read the table as of that snapshot (time travel:
    the fold of every delta up to it); ``since_snapshot`` = the CHANGE
    STREAM after that snapshot — only rows that are genuinely new, so
    non-append snapshots (compaction rewrites of already-delivered
    rows) are excluded from it, exactly as Iceberg CDC skips replace
    snapshots.  Default: the current table.
    """
    log = snapshots(root)
    ids = [s["id"] for s in log]
    ops = {s["id"]: s.get("operation", "append") for s in log}
    if snapshot is not None and snapshot not in ids:
        raise ValueError(f"unknown snapshot {snapshot}; have {ids}")
    if since_snapshot is not None and since_snapshot not in ids:
        raise ValueError(f"unknown snapshot {since_snapshot}; have {ids}")
    lo = since_snapshot if since_snapshot is not None else 0
    hi = snapshot if snapshot is not None else (ids[-1] if ids else 0)
    incremental = since_snapshot is not None
    out: list[dict[str, Any]] = []
    for sid in ids:
        if not lo < sid <= hi:
            continue
        if incremental and ops[sid] != "append":
            continue  # rewrite of rows the consumer already saw
        m = _read_manifest(root, sid)
        if m["removed_files"]:  # compaction replaces earlier files
            gone = set(m["removed_files"])
            out = [e for e in out if e["file"] not in gone]
        out.extend(m["entries"])
    return out


def prune(
    entries: Iterable[Mapping[str, Any]],
    predicates: Mapping[str, tuple[Any, Any]] | None,
) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Split entries into (kept, skipped) under interval ``predicates``.

    ``predicates`` maps column -> (lo, hi), either bound None for
    one-sided.  Conservative: a file is skipped only when its stats
    PROVE emptiness (max < lo or min > hi); missing/NULL stats keep the
    file.  Pure function — unit-testable without Spark.
    """
    kept: list[dict[str, Any]] = []
    skipped: list[dict[str, Any]] = []
    for e in entries:
        drop = False
        for col, (lo, hi) in (predicates or {}).items():
            stat = e.get("stats", {}).get(col)
            if stat is None or stat[0] is None or stat[1] is None:
                continue
            if (lo is not None and stat[1] < lo) or (
                hi is not None and stat[0] > hi
            ):
                drop = True
                break
        (skipped if drop else kept).append(dict(e))
    return kept, skipped


def scan(
    spark: SparkSession,
    root: str,
    predicates: Mapping[str, tuple[Any, Any]] | None = None,
    snapshot: int | None = None,
    since_snapshot: int | None = None,
) -> DataFrame:
    """Manifest-pruned scan; the residual row filter is always applied.

    Only files the manifest references are ever read (orphans from a
    crashed commit are invisible); of those, only files whose stats
    intersect ``predicates``.  When pruning eliminates every file, one
    surviving-manifest file is still scanned so the result keeps its
    schema (the residual filter returns zero of its rows).
    """
    entries = manifest_entries(root, snapshot, since_snapshot)
    if not entries:
        raise ValueError(
            f"no data files in the requested snapshot range at {root}"
        )
    kept, _ = prune(entries, predicates)
    files = [e["file"] for e in kept] or [entries[0]["file"]]
    df = spark.read.parquet(*files)
    for col, (lo, hi) in (predicates or {}).items():
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
    return df


def scan_report(
    root: str,
    predicates: Mapping[str, tuple[Any, Any]] | None = None,
    snapshot: int | None = None,
    since_snapshot: int | None = None,
) -> dict[str, int]:
    """Never-silent pruning metrics for the matching :func:`scan`."""
    entries = manifest_entries(root, snapshot, since_snapshot)
    kept, skipped = prune(entries, predicates)
    return {
        "files_total": len(entries),
        "files_kept": len(kept),
        "files_skipped": len(skipped),
        "rows_total": int(sum(e["n_rows"] for e in entries)),
        "rows_kept_bound": int(sum(e["n_rows"] for e in kept)),
    }
