"""Smoke: the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as e


def test_entry_runs(spark):
    df = e.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert df.columns == ["word", "cnt"]


def test_contract_shapes(spark):
    qs = e.queries()
    oracles = e.oracle_sql()
    assert "wordcount_canonical" in qs
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
