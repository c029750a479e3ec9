"""Flow-routing kernels (SURVEY.md §2.8, G1-G10): priority-flood pit
filling, D8 area/chi/order sweeps.

Pure NumPy/heapq, float64.  Each function is written once and used twice:

  * as the per-tile / per-basin worker inside the distributed operators
    (operators/flow.py), and
  * as the whole-grid single-process oracle in tests/test_flow.py.

Semantics mirror the reference exactly (cited per function):

  * priority flood     — flowRoutingGrids.py:268-324 (Barnes et al. 2013),
    heap with FIFO tie-break (stablePriorityQueue.py:10-57), seeded at the
    mask-boundary cells (_findMaskBoundaries, baseGrid.py:1198-1229 —
    includes the outer ring of the grid);
  * D8 kernel order + ArcGIS codes — flowRoutingGrids.py:52-65;
  * area accumulation  — _calcD8Area, flowRoutingGrids.py:326-367:
    descending-filled-elevation sweep, area[downstream] += area[cell];
  * chi integration    — calcChiGrid/_nonRecursiveUpstreamChiSearch,
    flowRoutingGrids.py:414-446, 492-519: chi[us] = chi[ds] +
    (A_0/A[us])**theta * dist, stopping below Amin;
  * stream order       — calcOrderGrid, flowRoutingGrids.py:448-490:
    ascending-area sweep, increment on equal-order confluence.

Deterministic tie-breaks: the reference sorts with unstable np.argsort
(flowRoutingGrids.py:332, 456), leaving equal-value visit order undefined;
this engine pins ties to ascending row-major cell index (stable lexsort) so
results are reproducible across partitionings.  Distance uses
sqrt((dr*dy)^2 + (dc*dx)^2); the reference swaps dx/dy in
_getNeighborIndices (flowRoutingGrids.py:617) which is identical for the
square cells used throughout.
"""

from __future__ import annotations

import heapq

import numpy as np

from rgr_pdal_topo_spark.functions.kernels import (
    D8_COL_KERNEL,
    D8_DS_CODES,
    D8_ROW_KERNEL,
)

#: code -> (dr, dc): downstream offset for each ArcGIS D8 code.
D8_CODE_TO_DR = {int(c): int(D8_ROW_KERNEL[k]) for k, c in enumerate(D8_DS_CODES)}
D8_CODE_TO_DC = {int(c): int(D8_COL_KERNEL[k]) for k, c in enumerate(D8_DS_CODES)}


def flood_seeds(valid: np.ndarray) -> np.ndarray:
    """Boolean mask of priority-flood seed cells for a validity mask.

    Mirrors _findMaskBoundaries (baseGrid.py:1198-1229): cells whose 3x3
    window (reflect BC, scipy maximum/minimum_filter default) mixes valid
    and invalid, plus every valid cell on the outer ring of the array.
    """
    m = valid.astype(float)
    p = np.pad(m, 1, mode="symmetric")  # scipy 'reflect' == np.pad symmetric
    n, c = valid.shape
    mx = np.full((n, c), -np.inf)
    mn = np.full((n, c), np.inf)
    for di in range(3):
        for dj in range(3):
            w = p[di : di + n, dj : dj + c]
            np.maximum(mx, w, out=mx)
            np.minimum(mn, w, out=mn)
    edges = np.ones_like(valid, dtype=bool)
    edges[1:-1, 1:-1] = False
    return ((mx == 1) & (mn == 0) & valid) | (valid & edges)


def priority_flood(
    z: np.ndarray,
    dx: float,
    dy: float,
    agg_slope: float = 1e-7,
    seed_mask: np.ndarray | None = None,
    seed_elev: np.ndarray | None = None,
) -> np.ndarray:
    """Barnes et al. 2013 priority-flood (flowRoutingGrids.py:268-324).

    NaN cells are treated as closed (outside the mask).  With the default
    seeds this is the reference algorithm verbatim (heap keyed by
    elevation with FIFO ties, seeded row-major at the mask boundary).

    seed_mask/seed_elev support the distributed tile fixpoint
    (operators/flow.py): seed cells are closed at ``seed_elev`` (their
    current fill estimate) instead of their raw elevation.
    """
    filled = z.astype("float64").copy()
    nrows, ncols = filled.shape
    closed = np.isnan(filled)
    if seed_mask is None:
        seed_mask = flood_seeds(~closed)
        seed_elev = filled
    heap: list[tuple[float, int, int, int]] = []
    count = 0
    for r, c in zip(*np.where(seed_mask & ~closed)):  # row-major, as np.where
        closed[r, c] = True
        filled[r, c] = seed_elev[r, c]
        count += 1
        heapq.heappush(heap, (filled[r, c], count, r, c))
    while heap:
        elev, _, r, c = heapq.heappop(heap)
        for k in range(8):
            nr = r + int(D8_ROW_KERNEL[k])
            nc = c + int(D8_COL_KERNEL[k])
            if nr < 0 or nr >= nrows or nc < 0 or nc >= ncols:
                continue
            if closed[nr, nc]:
                continue
            d = np.sqrt(
                (dy * float(nr - r)) ** 2 + (dx * float(nc - c)) ** 2
            )
            if filled[nr, nc] <= elev:
                filled[nr, nc] = elev + agg_slope * d
            closed[nr, nc] = True
            count += 1
            heapq.heappush(heap, (filled[nr, nc], count, nr, nc))
    return filled


def basin_sweeps(
    rows: np.ndarray,
    cols: np.ndarray,
    z: np.ndarray,
    fill: np.ndarray,
    fd: np.ndarray,
    dx: float,
    dy: float,
    a0: float = 1e6,
    theta: float = 0.45,
    amin: float | None = None,
    ksn_theta: float = 0.5,
) -> dict[str, np.ndarray]:
    """Sequential D8 sweeps over an arbitrary cell set (one basin, or the
    whole grid as the test oracle).  Returns per-cell arrays aligned with
    the input:

      area  — drainage area (_calcD8Area descending-fill sweep),
      L     — along-flow distance from the outlet (networkNode.L,
              networkGraph.py:165-216: L_child = L_parent + dist),
      chi   — chi integration from every fd==0 outlet (chi=0 at outlet),
      order — stream order (calcOrderGrid ascending-area sweep),
      ksn   — channel steepness S * A**ksn_theta with S = (Z_ds - Z) /
              (L_ds - L) (__singleNodeChannelSteepness__,
              networkGraph.py:938-948); NaN where there is no downstream
              node (networkHead.Ksn = nan, networkGraph.py:477).

    Cells interact only through fd edges, so running this per basin equals
    running it once globally (tests assert exactly that).
    """
    n = len(rows)
    pxl = abs(dx * dy)
    idx_of = {(int(r), int(c)): i for i, (r, c) in enumerate(zip(rows, cols))}
    down = np.full(n, -1, dtype="int64")
    dist = np.zeros(n)
    for i in range(n):
        code = int(fd[i])
        if code > 0:
            dr = D8_CODE_TO_DR[code]
            dc = D8_CODE_TO_DC[code]
            j = idx_of.get((int(rows[i]) + dr, int(cols[i]) + dc), -1)
            down[i] = j
            dist[i] = np.sqrt((dy * dr) ** 2 + (dx * dc) ** 2)

    flat = rows.astype("int64") * (int(cols.max()) + 1 if n else 1) + cols
    # descending fill, ties by ascending row-major index (engine-pinned)
    desc = np.lexsort((flat, -fill))
    area = np.full(n, pxl)
    for i in desc:
        if down[i] >= 0:
            area[down[i]] += area[i]

    # L and chi: downstream cell always has strictly lower fill (fd needs a
    # positive descent), so ascending-fill order is topological from roots.
    asc = desc[::-1]
    L = np.zeros(n)
    chi = np.zeros(n)
    if amin is None:
        amin = pxl
    for i in asc:
        j = down[i]
        if j >= 0:
            L[i] = L[j] + dist[i]
            if area[i] >= amin:
                chi[i] = chi[j] + (a0 / area[i]) ** theta * dist[i]

    # stream order: ascending area, ties by ascending row-major index
    order = np.zeros(n)
    for i in np.lexsort((flat, area)):
        j = down[i]
        if j >= 0:
            if order[i] == order[j]:
                order[j] += 1
            elif order[i] > order[j]:
                order[j] = order[i]

    ksn = np.full(n, np.nan)
    slope_d8 = np.zeros(n)  # calcD8SlopeGrid zero-init, flowRoutingGrids.py:393
    has_down = down >= 0
    j = down[has_down]
    with np.errstate(invalid="ignore", divide="ignore"):
        s = (z[j] - z[has_down]) / (L[j] - L[has_down])
        ksn[has_down] = s * area[has_down] ** ksn_theta
        slope_d8[has_down] = (z[has_down] - z[j]) / dist[has_down]

    # G7: max flow length + mean direction of the longest upstream path
    # (calculateMaxLMeanDir, flowRoutingGrids.py:625-688): ascending-area
    # sweep pushing maxL + step distance downstream, keeping the max and
    # its (delX, delY); meanDir = atan2(delY, delX), NaN where no inflow.
    max_l = np.zeros(n)
    del_x = np.zeros(n)
    del_y = np.zeros(n)
    for i in np.lexsort((flat, area)):
        jd = down[i]
        if jd >= 0:
            new_l = max_l[i] + dist[i]
            if max_l[jd] < new_l:
                code = int(fd[i])
                max_l[jd] = new_l
                del_x[jd] = del_x[i] + dx * D8_CODE_TO_DC[code]
                del_y[jd] = del_y[i] + dy * (-D8_CODE_TO_DR[code])
    mean_dir = np.arctan2(del_y, del_x)
    mean_dir[max_l == 0] = np.nan

    # G9: greatest-area path upstream from each fd==0 outlet
    # (findGreatestAreaPathUpstream, flowRoutingGrids.py:904-944): walk up
    # always taking the max-area upstream neighbor; ties resolved by
    # np.argmax first-max over the kernel-ordered neighbor list.
    path_step = np.full(n, -1, dtype="int64")
    ups: dict[int, list[int]] = {}
    for i in range(n):
        if down[i] >= 0:
            ups.setdefault(int(down[i]), []).append(i)

    def _kernel_pos(i: int, j: int) -> int:
        dr = int(rows[i]) - int(rows[j])
        dc = int(cols[i]) - int(cols[j])
        for k in range(8):
            if D8_ROW_KERNEL[k] == dr and D8_COL_KERNEL[k] == dc:
                return k
        return 8

    for root in range(n):
        if int(fd[root]) != 0:
            continue
        cur, step = root, 0
        path_step[cur] = step
        while True:
            cands = ups.get(cur, [])
            if not cands:
                break
            cur = min(cands, key=lambda i: (-area[i], _kernel_pos(i, cur)))
            step += 1
            path_step[cur] = step

    return {"area": area, "L": L, "chi": chi, "order": order, "ksn": ksn,
            "slope_d8": slope_d8, "max_l": max_l, "mean_dir": mean_dir,
            "path_step": path_step}
