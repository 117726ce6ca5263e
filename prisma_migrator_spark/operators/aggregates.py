"""Distinct array aggregation (SURVEY §2.4 A4).

PG: ``ARRAY_AGG(DISTINCT ARRAY[c.name, c.handle])`` per group
(reference src/utils/lib.ts:363-369). PG returns elements sorted (the
DISTINCT implies a sort); Spark's ``collect_set`` is unordered, so we
wrap in ``array_sort`` for deterministic output (SURVEY §7.3 hard-part
5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_pair_agg(
    df: DataFrame,
    group: Sequence[str],
    elements: Sequence[Column | str],
    out: str = "pairs",
) -> DataFrame:
    """Per group: sorted set of ``array(*elements)`` values.

    ObjectHashAggregate under the hood; partial aggregation still
    applies (sets merge map-side), so the shuffle carries deduped sets,
    not raw rows.
    """
    cols = [F.col(e) if isinstance(e, str) else e for e in elements]
    return df.groupBy(*group).agg(
        F.array_sort(F.collect_set(F.array(*cols))).alias(out)
    )


def salted_distinct_pair_agg(
    df: DataFrame,
    group: Sequence[str],
    elements: Sequence[Column | str],
    out: str = "pairs",
    n_salt: int = 16,
) -> DataFrame:
    """Skew-resistant form of :func:`distinct_pair_agg` for hot keys.

    A single hot group key sends every one of its rows to ONE reducer;
    with a large distinct set that reducer becomes the straggler (AQE
    skew-join splitting does not apply to aggregations). Two phases:

    1. groupBy(keys, salt) where salt = hash(elements) % n_salt — the
       hot key's rows spread over ``n_salt`` reducers, each building a
       partial set. Salting by element hash (not random) keeps
       duplicates of the same element on the same salt, so partials
       are already deduped.
    2. groupBy(keys) merges n_salt pre-deduped arrays per key —
       bounded fan-in, no re-dedup needed beyond flatten+sort
       (partials are disjoint by construction).

    Results are identical to the unsalted form; use when a key's group
    size is ≫ the average (e.g. one app in every category).
    """
    cols = [F.col(e) if isinstance(e, str) else e for e in elements]
    elem = F.array(*cols)
    salt = F.pmod(F.hash(elem), F.lit(n_salt)).alias("__salt")
    partial = df.groupBy(*group, salt).agg(
        F.collect_set(elem).alias("__partial")
    )
    return partial.groupBy(*group).agg(
        F.array_sort(F.flatten(F.collect_list("__partial"))).alias(out)
    )


def distinct_string_agg(
    df: DataFrame,
    group: Sequence[str],
    element: Column | str,
    sep: str = ";",
    out: str = "agg",
) -> DataFrame:
    """Per group: distinct values of ``element`` sorted and joined with
    ``sep`` — the hash-stable flat form of :func:`distinct_pair_agg`
    (equals PG ``STRING_AGG(DISTINCT x, sep ORDER BY x)``)."""
    col = F.col(element) if isinstance(element, str) else element
    return df.groupBy(*group).agg(
        F.array_join(F.array_sort(F.collect_set(col)), sep).alias(out)
    )
