"""Procedural terrain kernels (SURVEY.md §2.9, X7): diamond-square
fractal grids with roughness control.

Mirrors proceduralGrid_diamondSquare (randomGrids.py:58-224) exactly:
arbitrary (non 2^n+1) grid sizes with bounds-filtered kernels, grid
initialized from seeded Gaussian noise at the starting scale, square then
diamond sweeps per level, amplitude divided by 2**H per level, every
random draw taken serially from one np.random.RandomState — so a given
(seed, shape, H, scale) reproduces the reference's array bit-for-bit
given the same draw order.
"""

from __future__ import annotations

import numpy as np

_SQ_KR = np.array([-1, -1, 1, 1])
_SQ_KC = np.array([-1, 1, -1, 1])
_DI_KR = np.array([-1, 0, 0, 1])
_DI_KC = np.array([0, -1, 1, 0])


def diamond_square(
    nrows: int,
    ncols: int,
    roughness: float,
    starting_scale: float,
    seed: int,
) -> np.ndarray:
    """randomGrids.py:103-177: returns an (nrows, ncols) fractal surface."""
    rs = np.random.RandomState(seed)
    grid = rs.randn(nrows, ncols) * starting_scale
    width = int(2 ** np.ceil(np.log2(max(nrows, ncols) - 1)) + 1)
    scale = float(starting_scale)

    def update(r, c, kr, kc, sc):
        rows = r + kr
        cols = c + kc
        ok = (rows >= 0) & (rows < nrows) & (cols >= 0) & (cols < ncols)
        grid[r, c] = np.mean(grid[rows[ok], cols[ok]]) + sc * rs.randn()

    while width > 1:
        half = width // 2
        for r in range(half, nrows, width):
            for c in range(half, ncols, width):
                update(r, c, _SQ_KR * half, _SQ_KC * half, scale)
        row = 0
        for r in range(0, nrows, half):
            if row % 2 == 0:
                cols_iter = range(half, ncols, width)
            else:
                cols_iter = range(0, ncols, width)
            for c in cols_iter:
                update(r, c, _DI_KR * half, _DI_KC * half, scale)
            row += 1
        width = width // 2
        scale /= 2.0**roughness
    return grid
