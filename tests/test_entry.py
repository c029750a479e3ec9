"""Driver-contract smoke: entry() runs and returns rows with stable schema."""

from __future__ import annotations


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "polygon_id", "unit", "n_points", "mean_z", "mean_hillshade",
        "mean_slope", "mean_roughness",
    }
    total = sum(r.n_points for r in rows)
    assert total > 0


def test_contract_shapes(spark):
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
    for name, fn in qs.items():
        assert callable(fn), name


def test_driver_window_is_fully_oracle_backed():
    """The driver's correctness harness hashes only the FIRST 50
    registered queries — every slot must carry a DuckDB oracle, and the
    curated ranking must be what's actually registered."""
    from rgr_pdal_topo_spark.queries import DRIVER_WINDOW, ORACLES, QUERIES

    first50 = list(QUERIES)[:50]
    assert first50 == DRIVER_WINDOW
    missing = [n for n in first50 if n not in ORACLES]
    assert not missing, f"window queries without oracles: {missing}"
