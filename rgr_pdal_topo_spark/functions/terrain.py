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


# ---------------------------------------------------------------------------
# X8: random-priority upstream filling (proceduralGrid_randomPriorityFilling
# and subclasses, randomGrids.py:231-502, 609-740, 742-1013)
# ---------------------------------------------------------------------------

def _d8_tables():
    from rgr_pdal_topo_spark.functions.kernels import (
        D8_COL_KERNEL, D8_DS_CODES, D8_ROW_KERNEL,
    )
    # ArcGIS code of the direction (nr,nc) -> (r,c), i.e. the OPPOSITE of
    # kernel slot k
    opp = np.zeros(8, dtype=np.int64)
    for k in range(8):
        for k2 in range(8):
            if (D8_ROW_KERNEL[k2] == -D8_ROW_KERNEL[k]
                    and D8_COL_KERNEL[k2] == -D8_COL_KERNEL[k]):
                opp[k] = D8_DS_CODES[k2]
    return D8_ROW_KERNEL, D8_COL_KERNEL, opp


def random_priority_fill(
    nrows: int,
    ncols: int,
    dx: float,
    fill_slope: float,
    seed: int,
    mode: str = "random",
    priority_grid: np.ndarray | None = None,
    outlets: np.ndarray | None = None,
    mask: np.ndarray | None = None,
    ksn: float | None = None,
    theta: float | None = None,
    area_map: dict[float, np.ndarray] | None = None,
    outlet_areas: np.ndarray | None = None,
    allow_unfilled: bool = False,
) -> dict[str, np.ndarray]:
    """X8 core: procedural terrain by random-priority upstream filling
    from outlets (Barnes priority flood run in reverse; Johnstone et al.
    2017 null-model terrain).  Faithful to
    proceduralGrid_randomPriorityFilling._calculateRandomInstanceArray
    (randomGrids.py:353-479): a FIFO-tie heap seeded at the outlets with
    random priorities; each pop assigns its still-open neighbors (visited
    in seeded-shuffled order) elevation z_parent + slope * dist and
    pushes them with a mode-dependent priority.

    Modes (priority of a newly grown cell):
      * random     — U(0,1)                        (randomGrids.py:451-462)
      * elevation  — U(0,1) * z                    (:464-479)
      * longwave   — priority_grid * U(0,1)        (:733-740; the grid is
                     the 0..1-rescaled low-pass topography, built by the
                     caller with the engine's X4/X5 FFT operators)
      * chi        — U(0,1) * (1/ksn) * area**-theta with synthetic areas
                     drawn from ``area_map`` (:901-1013); slope becomes
                     ksn * area**theta.  Unlike the reference, the
                     last-open-neighbor / reserve tests count open cells
                     among THIS cell's neighbors (the reference's
                     ``np.sum(~isClosed)`` over the whole grid looks
                     unintended and defeats both branches).

    Returns {"z", "fd" (ArcGIS codes toward the parent, 0 at outlets),
    "area" (chi mode only)}.  All randomness comes from one seeded
    RandomState, so outputs are reproducible per (params, seed).
    """
    import heapq

    drk, dck, opp = _d8_tables()
    rng = np.random.RandomState(seed)
    if mask is None:
        mask = np.ones((nrows, ncols), dtype=bool)
    if outlets is None:
        # template-free default: every masked border cell is an outlet
        border = np.zeros_like(mask)
        border[0, :] = border[-1, :] = True
        border[:, 0] = border[:, -1] = True
        rr, cc = np.where(border & mask)
        outlets = np.stack([rr, cc], axis=1)
    z = np.zeros((nrows, ncols))
    z[~mask] = np.nan
    closed = ~mask
    fd = np.zeros((nrows, ncols), dtype=np.int64)
    pxl = dx * dx
    chi_mode = mode == "chi"
    area = None
    if chi_mode:
        if ksn is None or theta is None or area_map is None:
            raise ValueError("chi mode needs ksn, theta and area_map")
        theta = -abs(theta)
        area = np.full((nrows, ncols), pxl)
        area[~mask] = np.nan
        if outlet_areas is not None:
            area[outlets[:, 0], outlets[:, 1]] = outlet_areas

    heap: list[tuple[float, int, int, int]] = []
    counter = 0
    for r, c in outlets:
        closed[r, c] = True
        heapq.heappush(heap, (rng.rand(), counter, int(r), int(c)))
        counter += 1

    def _priority(nr: int, nc: int) -> float:
        if mode == "random":
            return rng.rand()
        if mode == "elevation":
            return rng.rand() * z[nr, nc]
        if mode == "longwave":
            return priority_grid[nr, nc] * rng.rand()
        return rng.rand() * (1.0 / ksn) * area[nr, nc] ** -theta

    while heap:
        _, _, r, c = heapq.heappop(heap)
        ks = [k for k in range(8)
              if 0 <= r + drk[k] < nrows and 0 <= c + dck[k] < ncols]
        order = np.array(ks)
        rng.shuffle(order)
        open_ks = [k for k in order if not closed[r + drk[k], c + dck[k]]]
        if chi_mode:
            remaining = float(area[r, c])
            avail = area_map.get(float(area[r, c]), np.empty(0))
        for pos, k in enumerate(open_ks):
            nr, nc = r + int(drk[k]), c + int(dck[k])
            dist = float(np.hypot(drk[k] * dx, dck[k] * dx))
            if chi_mode:
                if pos == len(open_ks) - 1:
                    # pixel floor: earlier pxl draws can leave a residual
                    # <= 0, and slope/priority need area > 0
                    a = max(remaining, pxl)
                elif len(avail) == 0 or pxl * (len(open_ks) - pos - 1) >= remaining:
                    a = pxl
                else:
                    a = float(rng.choice(avail))
                area[nr, nc] = a
                remaining -= a
                slope = ksn * a ** theta
            else:
                slope = fill_slope
            z[nr, nc] = z[r, c] + slope * dist
            fd[nr, nc] = opp[k]
            prio = _priority(nr, nc)
            # boundary guard (randomGrids.py:436-441): cells touching the
            # outside of the mask fill last (priority inf) so boundaries
            # stay low-order
            for k2 in range(8):
                r2, c2 = nr + drk[k2], nc + dck[k2]
                if 0 <= r2 < nrows and 0 <= c2 < ncols and not mask[r2, c2]:
                    prio = np.inf
                    break
            if not np.isnan(prio):
                heapq.heappush(heap, (prio, counter, nr, nc))
                counter += 1
            closed[nr, nc] = True

    # a NaN priority deliberately terminates a flow path (reference
    # semantics, randomGrids.py:443-445) — but a terminated path can
    # orphan enclosed cells, which would silently keep z=0/fd=0 and
    # masquerade as interior outlets.  Fail loudly unless the caller
    # opted into the reference's silent behavior.
    unfilled = int((~closed).sum())
    if unfilled and not allow_unfilled:
        raise ValueError(
            f"{unfilled} masked cells were never reached (NaN priorities "
            "terminated every path into them); pass allow_unfilled=True "
            "to keep the reference's silent z=0 behavior"
        )
    out = {"z": z, "fd": fd}
    if chi_mode:
        out["area"] = area
    return out
