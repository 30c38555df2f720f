"""Driver-contract smoke tests (mirrors what the driver's t1 does)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"l_returnflag", "max_price"}


def test_registry_consistency():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert len(q) >= 40
    # every oracle refers to a registered query
    assert set(o) <= set(q)
    # the flagship is oracle-checked
    assert "flagship_max_price" in o


def test_all_queries_run_at_smoke_sf(spark, sf_dir):
    """Every registered query must at least plan+execute at sf0.001."""
    for name, fn in entry_mod.queries().items():
        n = fn(spark, sf_dir).count()
        assert n >= 0, name
