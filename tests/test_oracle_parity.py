"""Every registered query with an oracle must hash-match DuckDB —
the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from prisma_migrator_spark.plans import ORACLES, QUERIES
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    compare(spark, QUERIES[name], ORACLES[name], sf_dir)


@pytest.mark.slow  # multi-minute: default-deselected tier (pytest.ini)
def test_all_queries_run(spark, sf_dir):
    """Queries without an oracle still must run and return a schema —
    and NO registered query may return a top-level array/map/struct
    column: the round driver's canonicalizer pandas-sorts every output
    column and dies on unhashable cells (the CORRECTNESS_r07 cluster-
    query episode; VERDICT r7 item 2)."""
    from tools.driver_canon import banned_top_level_fields

    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        banned = banned_top_level_fields(df.schema)
        assert not banned, (
            f"{name} returns driver-ungateable top-level column(s) "
            f"{banned} — the driver's pandas canonicalizer errors on "
            f"array/map/struct cells; return a concat_ws string or "
            f"explode instead"
        )
        assert df.count() >= 0, name


def test_driver_canon_rejects_array_columns(spark):
    """The replica's canonicalization must FAIL on a deliberately
    array-returning result, proving the pre-close gate now has the
    driver's own strictness (r7's replica tuple-ized lists and let
    three array-schema queries through to a driver ERR)."""
    import pytest as _pytest
    from pyspark.sql import Row

    from tools.driver_canon import banned_top_level_fields, driver_canon

    df = spark.createDataFrame(
        [Row(k=1, member_ids=[1, 2]), Row(k=2, member_ids=[3])]
    )
    assert banned_top_level_fields(df.schema) == ["member_ids"]
    rows = [tuple(r) for r in df.collect()]
    with _pytest.raises(Exception):
        driver_canon(df.columns, rows)
    # and the string form it should have been passes
    ok = spark.createDataFrame(
        [Row(k=1, member_ids="1,2"), Row(k=2, member_ids="3")]
    )
    assert banned_top_level_fields(ok.schema) == []
    driver_canon(ok.columns, [tuple(r) for r in ok.collect()])


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_driver_window_composition_rules():
    """The rotation rules the r7 verdict set (items 3+4) hold for
    whatever window is currently wired: the driver gates the FIRST
    50 queries() entries, so (a) every window name is registered,
    (b) no duplicates, (c) rows-only entries are capped at 20% of
    the gated slice so >= 80% of the driver's CORRECTNESS rows are
    hash-verified."""
    import __spark_entry__ as e
    from prisma_migrator_spark.plans import ORACLES, QUERIES

    gated = list(e.queries())[:50]
    assert len(set(gated)) == 50
    assert all(q in QUERIES for q in gated)
    rows_only = [q for q in gated if q not in ORACLES]
    assert len(rows_only) <= 10, (
        f"{len(rows_only)}/50 rows-only entries in the driver window "
        f"(cap is 10 = 20%): {rows_only}"
    )
