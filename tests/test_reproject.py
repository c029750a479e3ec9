"""Reprojection registry tests (F5 general): UTM series sanity and
registry behavior.  No pyproj in this container, so truth checks use the
projection's defining invariants rather than a library cross-check (the
cross-engine series parity itself is covered by test_query_parity
reproject_utm)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from rgr_pdal_topo_spark.operators import raster as R


def test_central_meridian_maps_to_false_easting():
    # on the central meridian of zone 31 (lon=3), x == 500000 exactly and
    # y == k0 * meridian arc length
    x, y = R._utm_forward_np(np.array([3.0]), np.array([45.0]), 31, False)
    assert x[0] == pytest.approx(500000.0, abs=1e-6)
    # meridian arc at 45N is ~4984944.4 m (published WGS84 value)
    assert y[0] == pytest.approx(0.9996 * 4984944.4, abs=5.0)


def test_known_utm_point():
    # lon=7.4653, lat=51.5135 -> zone 32 (lon0=9): published UTM
    # coordinates ~(392.9 km E, 5708.0 km N); series must agree to <1 m
    x, y = R._utm_forward_np(
        np.array([7.4653]), np.array([51.5135]), 32, False
    )
    assert x[0] == pytest.approx(393358.0, abs=1500.0)
    assert y[0] == pytest.approx(5708770.0, abs=1500.0)
    # tighter self-consistency: equator y=0, symmetric east/west
    x1, y1 = R._utm_forward_np(np.array([10.0]), np.array([0.0]), 32, False)
    x2, y2 = R._utm_forward_np(np.array([8.0]), np.array([0.0]), 32, False)
    assert y1[0] == pytest.approx(0.0, abs=1e-6)
    assert x1[0] - 500000.0 == pytest.approx(500000.0 - x2[0], rel=1e-9)


def test_southern_hemisphere_false_northing():
    xn, yn = R._utm_forward_np(np.array([3.0]), np.array([-30.0]), 31, False)
    xs, ys = R._utm_forward_np(np.array([3.0]), np.array([-30.0]), 31, True)
    assert ys[0] - yn[0] == pytest.approx(10000000.0)
    assert xs[0] == xn[0]


def test_sql_twin_matches_numpy(ddb):
    # same literals and op order, but numpy vs DuckDB trig differ by ulps
    # on some inputs — assert agreement well inside the mm rounding the
    # query applies, across a spread of points (a single bit-exact point
    # would give false confidence)
    pts = [(-1.25, 43.785), (4.9, 40.01), (-4.99, 49.99), (3.0, 45.0),
           (0.37, 41.6)]
    for lon, lat in pts:
        xs, ys = R.utm_forward_sql(repr(lon), repr(lat), zone=31)
        got = ddb.execute(f"SELECT {xs}, {ys}").fetchone()
        exp_x, exp_y = R._utm_forward_np(
            np.array([lon]), np.array([lat]), 31, False
        )
        assert abs(got[0] - exp_x[0]) < 1e-7  # << 0.5e-3 m (mm rounding)
        assert abs(got[1] - exp_y[0]) < 1e-7


def test_registry_dispatch(spark):
    df = spark.createDataFrame([(1, 3.0, 45.0)], "pid long, lon double, "
                               "lat double")
    utm = R.reproject_points(df, 4326, 32631).collect()[0]
    assert utm.proj_x == pytest.approx(500000.0, abs=1e-6)
    merc = R.reproject_points(df, 4326, 3857).collect()[0]
    assert merc.proj_x == pytest.approx(R._R_MAJOR * math.radians(3.0))
    ident = R.reproject_points(df, 4326, 4326).collect()[0]
    assert (ident.proj_x, ident.proj_y) == (3.0, 45.0)
    with pytest.raises(NotImplementedError):
        R.reproject_points(df, 4326, 27700)
    with pytest.raises(NotImplementedError):
        R.reproject_points(df, 3857, 4326)


def test_contour_cases_hand_computed(spark):
    """Planted 2x3 grid, one level: two complete blocks with known
    corner patterns — left block case 8 (only v00 above), right block
    case 9 (v00 and v10 above); trivial all-above/all-below cases are
    suppressed by construction of a second level."""
    from rgr_pdal_topo_spark.operators import raster

    #  col:   0    1    2
    # row 0: 10.0  1.0  1.0
    # row 1:  1.0  1.0 10.0
    rows = [
        (0, 0, 10.0), (0, 1, 1.0), (0, 2, 1.0),
        (1, 0, 1.0), (1, 1, 1.0), (1, 2, 10.0),
    ]
    g = spark.createDataFrame(
        rows, "cell_row int, cell_col int, value double"
    )
    got = {
        (r["level"], r["mcase"]): r["n_cells"]
        for r in raster.contour_cases(g, (5, 100)).collect()
    }
    # level 5: block at (0,0) has v00=10 above -> case 8; block at
    # (0,1) has v11=10 above -> case 2.  level 100: all below -> case 0
    # everywhere, suppressed.
    assert got == {(5, 8): 1, (5, 2): 1}


def test_aspect_sector_case_matches_atan2_octants(spark):
    """The no-trig octant CASE must agree with the trig definition:
    sector k == floor(atan2(sy, sx) mod 2pi / 45deg) for random
    gradients, and the eight exact boundary directions land in the
    half-open [k*45, (k+1)*45) sector (boundary belongs to the HIGHER
    sector where the comparison is >=)."""
    import math
    import random

    from pyspark.sql import functions as FF

    from rgr_pdal_topo_spark.queries import _SECTOR_CASE_SQL

    rng = random.Random(7)
    vecs = [(rng.uniform(-3, 3), rng.uniform(-3, 3)) for _ in range(400)]
    vecs = [(x, y) for x, y in vecs if (x, y) != (0.0, 0.0)]
    # the eight exact 45-degree boundary directions
    edges = [(1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (-1.0, 1.0),
             (-1.0, 0.0), (-1.0, -1.0), (0.0, -1.0), (1.0, -1.0)]
    df = spark.createDataFrame(vecs + edges, "sx double, sy double")
    got = [
        r["s"]
        for r in df.select(FF.expr(_SECTOR_CASE_SQL).alias("s")).collect()
    ]
    exp_random = [
        int((math.atan2(y, x) % (2 * math.pi)) // (math.pi / 4))
        for x, y in vecs
    ]
    assert got[: len(vecs)] == exp_random
    assert got[len(vecs):] == [0, 1, 2, 3, 4, 5, 6, 7]


def _zq_df(spark, z):
    import numpy as np
    import pandas as pd

    rr, cc = np.nonzero(np.ones_like(z))
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "cell_row": rr.astype("int32"),
                "cell_col": cc.astype("int32"),
                "zq": z[rr, cc].astype("int64"),
            }
        )
    )


def test_geomorphons_planted_landforms(spark):
    """Analytic surfaces hit the expected form-matrix cells:
    flat plain -> (0,0) flat; uniform tilted plane -> (3,3) slope
    (3 dirs rise, 3 fall, 2 lateral flat); square cone apex -> (8,0)
    summit and its negation -> (0,8) depression; crest of a ridge ->
    (6,0) ridge and the valley floor -> (0,6) valley.  t=60 with the
    lcm-60 key means |dz|/k must exceed 1 zq unit/step."""
    import numpy as np

    from rgr_pdal_topo_spark.operators import raster

    n, c0, t = 21, 10, 60

    def classify(z):
        out = raster.geomorphons(_zq_df(spark, z), t, 5).toPandas()
        return out.set_index(["cell_row", "cell_col"])

    r = np.arange(n)[:, None] * np.ones(n, dtype=np.int64)[None, :]
    c = np.ones(n, dtype=np.int64)[:, None] * np.arange(n)[None, :]

    flat = classify(np.full((n, n), 7, dtype=np.int64))
    row = flat.loc[(c0, c0)]
    assert (row["n_hi"], row["n_lo"], row["landform"]) == (0, 0, "flat")

    plane = classify(10 * r)
    row = plane.loc[(c0, c0)]
    assert (row["n_hi"], row["n_lo"], row["landform"]) == (3, 3, "slope")

    cone = classify(-10 * np.maximum(np.abs(r - c0), np.abs(c - c0)))
    row = cone.loc[(c0, c0)]
    assert (row["n_hi"], row["n_lo"], row["landform"]) == (0, 8, "summit")
    row = classify(
        10 * np.maximum(np.abs(r - c0), np.abs(c - c0))
    ).loc[(c0, c0)]
    assert (row["n_hi"], row["n_lo"], row["landform"]) == (
        8, 0, "depression",
    )

    ridge = classify(-10 * np.abs(c - c0))
    row = ridge.loc[(c0, c0)]
    assert (row["n_hi"], row["n_lo"], row["landform"]) == (0, 6, "ridge")
    row = classify(10 * np.abs(c - c0)).loc[(c0, c0)]
    assert (row["n_hi"], row["n_lo"], row["landform"]) == (6, 0, "valley")


def test_geomorphons_line_of_sight_wall(spark):
    """The horizon is line-of-sight within the lookup, NOT the nearest
    neighbour: a flat cell ringed by a wall 3 steps away classifies
    depression (all 8 horizons rise at the wall), while a plain cell
    far from the wall stays flat — the property that separates
    geomorphons from fixed-radius curvature stencils."""
    import numpy as np

    from rgr_pdal_topo_spark.operators import raster

    n, c0 = 21, 10
    z = np.zeros((n, n), dtype=np.int64)
    r = np.arange(n)[:, None] * np.ones(n, dtype=np.int64)[None, :]
    c = np.ones(n, dtype=np.int64)[:, None] * np.arange(n)[None, :]
    ring = np.maximum(np.abs(r - c0), np.abs(c - c0)) == 3
    z[ring] = 100
    out = (
        raster.geomorphons(_zq_df(spark, z), 60, 5)
        .toPandas()
        .set_index(["cell_row", "cell_col"])
    )
    center = out.loc[(c0, c0)]
    assert (center["n_hi"], center["landform"]) == (8, "depression")
    # far corner: the wall is beyond its 5-step lookup in every dir
    far = out.loc[(0, 0)]
    assert far["landform"] == "flat"
