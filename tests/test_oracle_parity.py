"""Every registered query with an oracle must hash-match DuckDB —
the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from prisma_migrator_spark.plans import ORACLES, QUERIES
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    compare(spark, QUERIES[name], ORACLES[name], sf_dir)


def test_all_queries_run(spark, sf_dir):
    """Queries without an oracle still must run and return a schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
