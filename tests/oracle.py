"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL over the same parquet
fixtures and compares row count, column names, and an
order-insensitive multiset of row values (normalized).
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from collections import Counter

import duckdb

from prisma_migrator_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / FP dust after the queries' own round(6)
        return round(v, 9)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:  # pragma: no cover
        pass
    return v


def normalize_rows(cols, rows):
    """Sort columns by name, normalize values, return multiset."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark, query_fn, oracle_sql: str, sf_dir: str):
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)

    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    s_norm = normalize_rows(s_cols, s_rows)
    o_norm = normalize_rows(o_cols, o_rows)
    if s_norm != o_norm:
        missing = list((o_norm - s_norm).items())[:5]
        extra = list((s_norm - o_norm).items())[:5]
        raise AssertionError(
            f"value mismatch.\n oracle-only (5): {missing}\n spark-only (5): {extra}"
        )
