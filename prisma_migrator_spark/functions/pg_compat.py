"""PostgreSQL-semantics function shim (SURVEY §2.8, §4.2).

The reference's SQL runs on PostgreSQL; a handful of functions have
subtly different Spark translations. This module pins the correct
ones so every query in the engine uses the same, tested semantics:

- PG ``LOG(x)`` is **base-10** (reference src/utils/lib.ts:349,438,
  484-486) → Spark ``log10``, NOT ``log`` (natural). F3 in SURVEY §2.8.
- ``NULLIF(score,0) / NULLIF(max,1)`` null-safe normalization
  (reference src/utils/lib.ts:393-394,463-464). F2.
- ``TO_CHAR(d, 'MM-DD-YYYY')`` → ``date_format(d, 'MM-dd-yyyy')``
  (pattern-letter case differs). F5, reference src/utils/lib.ts:391.
- Excel ``=HYPERLINK`` formula cells + CSV quote escaping
  (reference src/utils/lib.ts:509-527). F8.

All of these are built-in Column expressions — JVM-side, codegen'd,
zero Python UDFs — so they stay inside WholeStageCodegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nullif(col: Column, value) -> Column:
    """PG NULLIF(col, value)."""
    return F.nullif(col, F.lit(value))


def log10_1p(col: Column) -> Column:
    """PG ``LOG(x + 1)`` — base-10 (reference src/utils/lib.ts:349)."""
    return F.log10(col + F.lit(1))


def coalesce_lit(col: Column, default) -> Column:
    """PG ``COALESCE(col, default)`` with a literal default."""
    return F.coalesce(col, F.lit(default))


def pg_normalize(score: Column, global_max: Column) -> Column:
    """The reference's min-max normalization idiom
    ``COALESCE(NULLIF(score, 0) / NULLIF(max, 1), 0)``
    (reference src/utils/lib.ts:393-394).

    Faithfully reproduces the quirk that a global max of exactly 1
    yields NULL → 0 (SURVEY §7.3 hard-part 4).
    """
    return F.coalesce(nullif(score, 0) / nullif(global_max, 1), F.lit(0.0))


def to_char_mmddyyyy(col: Column) -> Column:
    """PG ``TO_CHAR(d, 'MM-DD-YYYY')`` (reference src/utils/lib.ts:391)."""
    return F.date_format(col, "MM-dd-yyyy")


def csv_quote_escape(col: Column) -> Column:
    """Escape double quotes for CSV formula cells — `"` → `""`
    (reference src/utils/lib.ts:509)."""
    return F.regexp_replace(col, '"', '""')


def hyperlink(url: Column, text: Column) -> Column:
    """Excel ``=HYPERLINK("url", "text")`` formula cell
    (reference src/utils/lib.ts:509,513,527,543)."""
    return F.concat(
        F.lit('=HYPERLINK("'),
        url,
        F.lit('", "'),
        csv_quote_escape(text),
        F.lit('")'),
    )
