#!/usr/bin/env python
"""Platform-ceiling microbenchmark (see BENCH/BASELINE.md).

Zero-shuffle, zero-Python, embarrassingly-parallel whole-stage-codegen
aggregation — measures the best parallel efficiency ANY Spark plan can
reach on this host at each core count (captures hypervisor steal, turbo
disparity, single-JVM scheduling).

Usage: python BENCH/ceiling.py [cores ...]   (default: 2 8 32)
Prints one JSON line per level.
"""

from __future__ import annotations

import json
import subprocess
import sys

_CODE = """
import time, sys
from pyspark.sql import SparkSession, functions as F
c = int(sys.argv[1])
spark = (SparkSession.builder.master(f"local[{c}]")
         .config("spark.driver.memory", "40g").getOrCreate())
df = spark.range(0, 4_000_000_000, 1, c * 3)
expr = F.sum((F.col("id") % 97) * (F.col("id") % 89))
df.agg(expr).collect()  # warm JVM + codegen
t0 = time.time()
df.agg(expr).collect()
print("RESULT", __import__("json").dumps(
    {"cores": c, "sec": round(time.time() - t0, 3)}))
spark.stop()
"""


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [2, 8, 32]
    for c in levels:
        out = subprocess.run(
            [sys.executable, "-c", _CODE, str(c)],
            capture_output=True, text=True, check=True,
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line[len("RESULT "):])


if __name__ == "__main__":
    main()
