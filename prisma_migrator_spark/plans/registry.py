"""Registry pairing each named query's Spark impl with its DuckDB oracle.

The driver contract (``__spark_entry__.py``) wants ``queries()`` and
``oracle_sql()`` dicts whose results hash-match at sf0.01. Keeping the
pair registered together at the definition site is what keeps column
names/aliases in sync — the #1 hash-mismatch cause.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks it non-SQL-expressible
    (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
