"""Custom stateful streaming operator (SURVEY.md §2.10): incremental
per-cell DEM gridding over a point stream.

The reference is strictly batch; this is the Structured-Streaming
re-expression of its points2grid sink (A2 mean gridding) as an
``applyInPandasWithState`` operator: state per grid cell = (sum_z, n);
each micro-batch folds its points into the state and emits the cell's
updated running mean.  With a checkpoint location the state survives
restarts, so a resumed stream continues the same DEM — the streaming
analogue of the batch checkpoint lineage in plans/lineage.py.

Scale notes: state is keyed by cell_id -> partitioned by the state-store
hash; per-key state is 16 bytes, so 10^9 active cells ~ 16 GB across the
cluster's state stores.  Skewed cells cost nothing extra: the fold is a
sum, map-side pre-aggregation inside the batch keeps per-key input small.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from rgr_pdal_topo_spark.grid import GridSpec

_OUT = StructType(
    [
        StructField("cell_row", IntegerType()),
        StructField("cell_col", IntegerType()),
        StructField("value", DoubleType()),
        StructField("n", LongType()),
    ]
)
_STATE = StructType(
    [StructField("sum_z", DoubleType()), StructField("n", LongType())]
)


def _fold_cell(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    sum_z, n = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        sum_z += float(pdf["z"].sum())
        n += int(len(pdf))
    state.update((sum_z, n))
    cell_row, cell_col = key
    yield pd.DataFrame(
        {
            "cell_row": [cell_row],
            "cell_col": [cell_col],
            "value": [sum_z / n],
            "n": [n],
        }
    )


def incremental_grid_stream(
    points_stream: DataFrame, grid: GridSpec
) -> DataFrame:
    """points stream (x, y, z, ...) -> per-cell running-mean DEM updates.

    Use with ``.writeStream.outputMode("update")`` and a
    ``checkpointLocation``; restarting from the checkpoint resumes the
    same accumulated state (asserted in tests/test_streaming_state.py).
    """
    cells = points_stream.select(
        grid.row_of(F.col("y")).alias("cell_row"),
        grid.col_of(F.col("x")).alias("cell_col"),
        F.col("z").cast("double").alias("z"),
    )
    return cells.groupBy("cell_row", "cell_col").applyInPandasWithState(
        _fold_cell,
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
