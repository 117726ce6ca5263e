"""The ROUND DRIVER's result canonicalization, replicated faithfully.

Why this exists (VERDICT r7 item 2): the driver canonicalizes every
query's collected rows through a pandas ``sort_values`` over ALL
columns before hashing. ``pandas.factorize`` cannot hash list/dict
cells, so any registered query that returns a top-level array or map
column ERRORS at the driver — which is exactly what happened to the
three cluster queries in CORRECTNESS_r07. The r7 replica
(`tools/drive_driver.py`) was strictly MORE permissive: its ``norm``
tuple-ized lists, so the pre-close gate accepted output schemas the
real driver rejects.

This module is the single canonicalization path now used by BOTH the
replica and the pytest registry lint, so an array-schema regression
fails pre-close the same way it would fail at the driver.
"""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd

#: Top-level Spark SQL types the driver cannot canonicalize. Nested
#: arrays INSIDE structs would die the same way, so structs are banned
#: outright too — no registered query returns one.
_BANNED_TYPE_NAMES = ("ArrayType", "MapType", "StructType")


def banned_top_level_fields(schema) -> list[str]:
    """Names of fields in a pyspark StructType whose type the driver's
    pandas canonicalizer cannot sort (array/map/struct)."""
    return [
        f.name
        for f in schema.fields
        if type(f.dataType).__name__ in _BANNED_TYPE_NAMES
    ]


def _norm(v):
    """Per-cell normalization applied AFTER the pandas sort — float
    rounding so Spark/DuckDB double jitter doesn't flip a hash."""
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, bytearray):
        return bytes(v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    return v


def driver_canon(cols, rows) -> list[tuple]:
    """Driver-shaped canonical form of a collected result: a pandas
    frame sorted over every (name-sorted) column, then normalized row
    tuples. Raises ``TypeError: unhashable type`` on list/dict cells —
    deliberately, because that is precisely the driver's behavior."""
    order = sorted(cols)
    pdf = pd.DataFrame(list(rows), columns=list(cols))[order]
    if len(pdf):
        pdf = pdf.sort_values(order)
    return [
        tuple(_norm(v) for v in r)
        for r in pdf.itertuples(index=False, name=None)
    ]
