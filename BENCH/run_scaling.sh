#!/usr/bin/env bash
# Scaling evidence: identical job at N and 4N local cores via
# spark-submit --py-files (north_rule protocol adapted to the sandbox).
# Each level runs $RUNS times and the BEST run is kept: the sandbox host is
# shared/noisy, and best-of-k is the standard way to estimate the
# contention-free time at each parallelism.
set -euo pipefail
cd "$(dirname "$0")/.."

RUNS=${RUNS:-2}
REP=${SPARK_GRAFT_REPLICATE:-1024}
OUT=${OUT:-BENCH/scaling_raw.jsonl}

ZIP=/tmp/rgr_pdal_topo_spark.zip
rm -f "$ZIP"
zip -qr "$ZIP" rgr_pdal_topo_spark -x '*__pycache__*'

: > "$OUT"
for c in 2 8 32; do
  for i in $(seq "$RUNS"); do
    SPARK_GRAFT_CPUS=$c SPARK_GRAFT_REPLICATE=$REP spark-submit \
      --master "local[$c]" \
      --py-files "$ZIP" \
      --conf spark.sql.shuffle.partitions=$((c * 2)) \
      --driver-memory 40g \
      BENCH/job.py 2>/dev/null | tail -1 >> "$OUT"
  done
done
cat "$OUT"
