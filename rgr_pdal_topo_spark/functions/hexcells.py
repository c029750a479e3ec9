"""Hexagonal cell ids: the genuinely-hex half of the north rule's
"H3 (res 5-12)" index layer.

``functions/cells.py``'s quadkey family stands in for H3's API (res
range, parent/child, k-ring) but its cells are squares.  This module
adds what squares cannot give — the geometric properties that make H3
hexagonal in the first place:

* every cell has exactly SIX neighbours, all sharing an edge (a square
  cell has 4 edge + 4 corner neighbours, two different adjacency
  classes — the reason k-ring prefilters over quadkeys over-fetch
  corners);
* all six neighbour centers are EQUIDISTANT from the cell center, so a
  k-ring is a honest distance band (on a square grid the diagonal
  neighbour is sqrt(2) further than the edge neighbour);
* the quantization error of "snap a point to its cell center" is the
  tightest of any plane tiling (hexagons are the optimal covering).

Geometry: a pointy-top hexagonal lattice over the same equirectangular
lon/lat plane the quadkey family uses.  Resolution ``r`` has hex size
(circumradius, degrees) ``HEX_SIZE0 / 2**r`` — aperture 4, so res 5..12
spans ~11 deg down to ~0.09 deg (res 5 cells sized like the quadkey
res-5 tiles pages_grid bins into).  (True
H3 is aperture 7 on an icosahedron; its sqrt(7)-with-rotation scaling
is irrational in the plane and would poison cross-engine float parity,
so the aperture is the one deliberate departure — documented here, not
hidden.)  Like H3, parenthood is CENTER containment: ``hex_parent``
re-encodes the child's center at res-1; children straddle parent
borders exactly as H3 cells do (H3's own containment is approximate —
that is a property of hex nesting, not a shortcut).

Encoding: lon/lat -> fractional axial coords (q, r) -> cube rounding
(the standard nearest-hex algorithm) -> packed int64
``res<<56 | (q+2^27)<<28 | (r+2^27)``.  Every float step is a fixed
token-for-token expression over IEEE doubles (one sqrt(3), correctly
rounded in both engines; rounding spelled ``FLOOR(v + 0.5)`` because
Spark ROUND half-up and DuckDB round half-even disagree), so the DuckDB
oracle replays ids bit-for-bit — same doctrine as ``quad_cell_sql``.

The encoder exists as pure Column expressions (whole-stage codegen, the
10^12-row hot path), an ANSI-SQL twin (the oracle), and an Arrow-batched
``pandas_udf`` (the north-star's stated API shape) — bit-equality across
all three is pinned in tests/test_cells.py.

Reference analogue: the tiling keys of pointCloudCreation.py's grid
assignment (file:176-192) generalized to the hex lattice; no reference
file implements hexagons — this module is net-new engine surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

HEX_SIZE0 = 360.0  # res-0 circumradius in degrees; res r => 360 / 2**r
HEX_RES_RANGE = range(5, 13)  # mirror the north-star H3 band
_OFF = 1 << 27  # axial offset: |q| < ~13k even at res 20, 2^27 is ample
_QSHIFT = 28
_RSHIFT = 56

# axial neighbour deltas, pointy-top, clockwise from east
HEX_NEIGHBOR_DELTAS = ((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))


def hex_size(res: int) -> float:
    """Circumradius (degrees) at ``res`` — exact in binary (45 / 2**r)."""
    return HEX_SIZE0 / (1 << res)


# ---------------------------------------------------------------------------
# Column spelling (the hot path)
# ---------------------------------------------------------------------------

def _axial_round(qf: Column, rf: Column) -> tuple[Column, Column]:
    """Cube rounding, Column spelling.  rnd = FLOOR(v + 0.5) (identical
    in Spark and DuckDB; their ROUNDs differ on halves).  Only the rx /
    rz corrections matter for (q, r); the ry branch never reaches the
    output."""
    yf = F.lit(0.0) - qf - rf
    rx = F.floor(qf + F.lit(0.5)).cast("long")
    ry = F.floor(yf + F.lit(0.5)).cast("long")
    rz = F.floor(rf + F.lit(0.5)).cast("long")
    dx = F.abs(rx.cast("double") - qf)
    dy = F.abs(ry.cast("double") - yf)
    dz = F.abs(rz.cast("double") - rf)
    x_worst = (dx > dy) & (dx > dz)
    q = F.when(x_worst, F.lit(0) - ry - rz).otherwise(rx)
    r = F.when(~x_worst & ~(dy > dz), F.lit(0) - rx - ry).otherwise(rz)
    return q, r


def hex_axial(
    lon: Column, lat: Column, res: int, normalize: bool = True
) -> tuple[Column, Column]:
    """lon/lat degrees -> integer axial (q, r) of the nearest hex center
    at ``res``.  Longitude is pre-normalized into [-180, 180) (lon,
    lon+360, lon-360 encode to the SAME cell); the normalization term is
    spelled ``lon - 360*FLOOR((lon+180)/360)`` identically in all three
    encoders, and is an exact no-op (floor term 0.0) for already-in-range
    inputs, so in-range ids are bit-unchanged.

    ``normalize=False`` is the LATTICE-INTERNAL planar spelling:
    normalization is a data-ingress concern (longitude conventions),
    but cell centers of seam-adjacent cells legitimately stick past
    +-180, and wrapping THEM would tear the parent/center hierarchy
    apart at the seam — so :func:`hex_parent` re-encodes planar."""
    s = F.lit(hex_size(res))
    if normalize:
        lon = lon - F.lit(360.0) * F.floor(
            (lon + F.lit(180.0)) / F.lit(360.0)
        )
    qf = (lon * F.sqrt(F.lit(3.0)) / F.lit(3.0) - lat / F.lit(3.0)) / s
    rf = lat * F.lit(2.0) / F.lit(3.0) / s
    return _axial_round(qf, rf)


def hex_pack(q: Column, r: Column, res: int) -> Column:
    return (
        F.lit(res << _RSHIFT).cast("long")
        + F.shiftleft((q + F.lit(_OFF)).cast("long"), _QSHIFT)
        + (r + F.lit(_OFF)).cast("long")
    )


def hex_cell(
    lon: Column, lat: Column, res: int, normalize: bool = True
) -> Column:
    """Packed hex cell id at ``res`` (self-describing: res in the top
    byte, axial q/r below).  See :func:`hex_axial` for the longitude
    normalization contract and its ``normalize=False`` internal form."""
    q, r = hex_axial(lon, lat, res, normalize=normalize)
    return hex_pack(q, r, res)


def hex_unpack(cell: Column) -> tuple[Column, Column, Column]:
    """cell -> (res, q, r)."""
    res = F.shiftright(cell, _RSHIFT)
    q = F.shiftright(cell, _QSHIFT).bitwiseAND(F.lit((1 << _QSHIFT) - 1)) - F.lit(_OFF)
    r = cell.bitwiseAND(F.lit((1 << _QSHIFT) - 1)) - F.lit(_OFF)
    return res, q, r


def hex_center(q: Column, r: Column, res: int) -> tuple[Column, Column]:
    """Axial (q, r) -> cell-center lon/lat degrees."""
    s = F.lit(hex_size(res))
    lon = s * F.sqrt(F.lit(3.0)) * (
        q.cast("double") + r.cast("double") / F.lit(2.0)
    )
    lat = s * F.lit(1.5) * r.cast("double")
    return lon, lat


def hex_parent(cell: Column, res: int) -> Column:
    """Center-containment parent at ``res - 1`` (H3 semantics: the
    parent is the coarser cell holding the CHILD'S CENTER; children near
    a parent edge straddle it, as hex nesting always does).  ``res`` is
    the child resolution, passed explicitly so the size constants stay
    literals (codegen-friendly; the packed id carries res for checking
    but deriving doubles from it would block constant folding).

    The center re-encode is PLANAR (normalize=False): a seam-adjacent
    cell's center may lie just past +-180, and wrapping it would assign
    a parent ~360 degrees away — the hierarchy is a lattice property,
    not a longitude-convention one (pinned by the hypothesis ladder
    test in tests/test_properties.py)."""
    _, q, r = hex_unpack(cell)
    lon, lat = hex_center(q, r, res)
    return hex_cell(lon, lat, res - 1, normalize=False)


def hex_disk_deltas(k: int) -> list[tuple[int, int]]:
    """Axial offsets of the radius-``k`` hex disk (self + all cells
    within hex distance k): the standard |dq|, |dr|, |dq+dr| <= k
    lattice ball — 1 + 3k(k+1) cells, e.g. 7 at k=1, 19 at k=2."""
    return [
        (dq, dr)
        for dq in range(-k, k + 1)
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1)
    ]


def hex_k_ring(cell: Column, k: int = 1) -> Column:
    """The cell plus every cell within hex distance ``k`` (H3's
    kRing(k)) — pure packed-id integer arithmetic: q/r offsets never
    under/overflow the 2^27 bias at any supported res, so neighbours
    are literal adds (1 + 3k(k+1) of them; keep k small — the ring is
    a join-prefilter fan-out, not a search structure).

    DOMAIN CONTRACT — the antimeridian: the lattice is PLANAR over
    equirectangular lon/lat.  The encoder normalizes longitude into
    [-180, 180), but rings do NOT wrap across the +-180 seam: a cell
    touching lon=-180 and one touching lon=+180 are lattice-distant
    even though they are geographically adjacent (true H3's icosahedron
    has no such seam; the plane necessarily does).  Workloads needing
    cylindrical adjacency at the seam use the standard dual-encoding
    trick — index seam-straddling records at BOTH lon and lon±360 and
    dedup after the ring join."""
    return F.array(
        *[
            cell + F.lit((dq << _QSHIFT) + dr).cast("long")
            if (dq, dr) != (0, 0)
            else cell
            for dq, dr in hex_disk_deltas(k)
        ]
    )


# ---------------------------------------------------------------------------
# ANSI-SQL twin (the oracle) — token-for-token the Column spelling
# ---------------------------------------------------------------------------

def hex_cell_sql(lon: str, lat: str, res: int, normalize: bool = True) -> str:
    """DuckDB twin of :func:`hex_cell` — identical expression tree over
    IEEE doubles, so ids match bit-for-bit (pinned by the hex_pages
    oracle + tests).  ``normalize`` mirrors the Column spelling's
    longitude-normalization contract (False = lattice-internal planar
    form, used by :func:`hex_parent_sql`)."""
    s = repr(hex_size(res))
    ln = (
        f"(({lon}) - 360.0 * FLOOR((({lon}) + 180.0) / 360.0))"
        if normalize else f"({lon})"
    )
    qf = f"(({ln} * SQRT(3.0) / 3.0 - ({lat}) / 3.0) / {s})"
    rf = f"(({lat}) * 2.0 / 3.0 / {s})"
    yf = f"(0.0 - {qf} - {rf})"
    rx = f"CAST(FLOOR({qf} + 0.5) AS BIGINT)"
    ry = f"CAST(FLOOR({yf} + 0.5) AS BIGINT)"
    rz = f"CAST(FLOOR({rf} + 0.5) AS BIGINT)"
    dx = f"ABS(CAST({rx} AS DOUBLE) - {qf})"
    dy = f"ABS(CAST({ry} AS DOUBLE) - {yf})"
    dz = f"ABS(CAST({rz} AS DOUBLE) - {rf})"
    x_worst = f"({dx} > {dy} AND {dx} > {dz})"
    q = f"(CASE WHEN {x_worst} THEN 0 - {ry} - {rz} ELSE {rx} END)"
    r = (
        f"(CASE WHEN NOT {x_worst} AND NOT ({dy} > {dz}) "
        f"THEN 0 - {rx} - {ry} ELSE {rz} END)"
    )
    return (
        f"(CAST({res << _RSHIFT} AS BIGINT) + (({q} + {_OFF}) << {_QSHIFT})"
        f" + ({r} + {_OFF}))"
    )


def hex_parent_sql(cell: str, res: int) -> str:
    """DuckDB twin of :func:`hex_parent` (decode -> center -> re-encode
    one res up; planar — see hex_parent on why centers never wrap)."""
    mask = (1 << _QSHIFT) - 1
    q = f"((({cell}) >> {_QSHIFT}) & {mask}) - {_OFF}"
    r = f"(({cell}) & {mask}) - {_OFF}"
    s = repr(hex_size(res))
    lon = f"({s} * SQRT(3.0) * (CAST({q} AS DOUBLE) + CAST({r} AS DOUBLE) / 2.0))"
    lat = f"({s} * 1.5 * CAST({r} AS DOUBLE))"
    return hex_cell_sql(lon, lat, res - 1, normalize=False)


# ---------------------------------------------------------------------------
# Arrow-batched pandas_udf (the north-star API shape) — same semantics
# ---------------------------------------------------------------------------

def _hex_cell_np(
    lon: np.ndarray, lat: np.ndarray, res: int, normalize: bool = True
) -> np.ndarray:
    s = hex_size(res)
    if normalize:
        lon = lon - 360.0 * np.floor((lon + 180.0) / 360.0)
    qf = (lon * np.sqrt(3.0) / 3.0 - lat / 3.0) / s
    rf = lat * 2.0 / 3.0 / s
    yf = 0.0 - qf - rf
    rx = np.floor(qf + 0.5).astype(np.int64)
    ry = np.floor(yf + 0.5).astype(np.int64)
    rz = np.floor(rf + 0.5).astype(np.int64)
    dx = np.abs(rx.astype(np.float64) - qf)
    dy = np.abs(ry.astype(np.float64) - yf)
    dz = np.abs(rz.astype(np.float64) - rf)
    x_worst = (dx > dy) & (dx > dz)
    q = np.where(x_worst, 0 - ry - rz, rx)
    r = np.where(~x_worst & ~(dy > dz), 0 - rx - ry, rz)
    return (res << _RSHIFT) + ((q + _OFF) << _QSHIFT) + (r + _OFF)


def hex_cell_udf(res: int):
    """Arrow-batched encoder: (lon, lat) series -> packed hex id.  The
    Column spelling is the hot path (codegen, zero Python); this is the
    library-shaped twin, bit-equal by test."""

    @pandas_udf(LongType())
    def _enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        out = _hex_cell_np(
            lon.to_numpy(dtype=np.float64), lat.to_numpy(dtype=np.float64),
            res,
        )
        return pd.Series(out)

    return _enc
