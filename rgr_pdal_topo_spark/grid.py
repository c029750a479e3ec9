"""Grid / tiling model: the engine's raster data model.

Mirrors the reference's ``baseGrid`` georeferencing (a dense 2-D array plus
``_dx/_dy/_xllcenter/_yllcenter``, row 0 = northernmost row — GDAL
convention, reference baseGrid.py:19-75, :50) re-expressed relationally:

    long-form grid DF: (cell_row int, cell_col int, value double, n bigint)

A dense grid is a partitioned table keyed by spatial cell; NoData is NULL
(reference uses NaN, baseGrid.py:856-858 — NULL is the relational spelling).

Cell encoding is the relational replacement for ``getRowColFromXY``
(baseGrid.py:656-668).  Every encoding function exists twice, by design:

  * as a PySpark Column expression (JVM-side, codegen'd), and
  * as an ANSI-SQL string fragment (identical arithmetic) used verbatim in
    the DuckDB oracle queries — parity is by construction, not by luck.

For multi-tile scale-out, cells roll up into square tiles of
``tile_cells`` x ``tile_cells`` cells (``tile_id`` row-major); stencil
operators materialize one tile (+halo) per applyInPandas group, mirroring
the reference's tiled requests with ``tileOverlap`` halo
(pointCloudCreation.py:458-495, overlap at :489).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class GridSpec:
    """Georeferencing of a raster grid over the synthetic extent.

    x in [x0, x0 + ncols*cell), y in [y0, y0 + nrows*cell);
    cell_row 0 is the NORTH row (max y), matching GDAL / baseGrid.py:50.
    """

    x0: float = 0.0
    y0: float = 0.0
    cell: float = 10.0
    nrows: int = 100
    ncols: int = 100

    # ---- Spark Column encoders -------------------------------------------------
    def col_of(self, x: Column) -> Column:
        return F.floor((x - F.lit(self.x0)) / F.lit(self.cell)).cast("int")

    def row_of(self, y: Column) -> Column:
        # north-up: largest y -> row 0
        return (
            F.lit(self.nrows - 1)
            - F.floor((y - F.lit(self.y0)) / F.lit(self.cell)).cast("int")
        ).cast("int")

    def cell_id(self, row: Column, col: Column) -> Column:
        return (row.cast("long") * F.lit(self.ncols) + col.cast("long")).alias("cell_id")

    def cell_cx(self, col: Column) -> Column:
        """x of cell center."""
        return (col.cast("double") + F.lit(0.5)) * F.lit(self.cell) + F.lit(self.x0)

    def cell_cy(self, row: Column) -> Column:
        """y of cell center (row 0 = north)."""
        return (
            F.lit(float(self.nrows - 1)) - row.cast("double") + F.lit(0.5)
        ) * F.lit(self.cell) + F.lit(self.y0)

    def tile_id(self, row: Column, col: Column, tile_cells: int) -> Column:
        tiles_x = (self.ncols + tile_cells - 1) // tile_cells
        return (
            F.floor(row / F.lit(tile_cells)).cast("long") * F.lit(tiles_x)
            + F.floor(col / F.lit(tile_cells)).cast("long")
        )

    # ---- SQL fragment encoders (DuckDB-compatible ANSI; identical math) --------
    def sql_col_of(self, x: str) -> str:
        return f"CAST(FLOOR(({x} - {self.x0!r}) / {self.cell!r}) AS INT)"

    def sql_row_of(self, y: str) -> str:
        return (
            f"CAST({self.nrows - 1} - FLOOR(({y} - {self.y0!r}) / {self.cell!r}) AS INT)"
        )

    def sql_cell_cx(self, col: str) -> str:
        return f"((CAST({col} AS DOUBLE) + 0.5) * {self.cell!r} + {self.x0!r})"

    def sql_cell_cy(self, row: str) -> str:
        return (
            f"(({float(self.nrows - 1)!r} - CAST({row} AS DOUBLE) + 0.5)"
            f" * {self.cell!r} + {self.y0!r})"
        )


#: Default grid over the synthetic 1000 m x 1000 m extent at 10 m cells —
#: the engine analogue of the reference smoke run's cell_size=1.0 m,
#: tileWidth=1e3 m geometry (pointCloudCreation.py:694-696) scaled to the
#: fixture extent.
DEFAULT_GRID = GridSpec()
