"""Latest-per-key dedup and exact dedup.

``latest_per_key`` is the Spark-native form of PostgreSQL
``SELECT DISTINCT ON (key) ... ORDER BY key, ts DESC``
(reference src/utils/lib.ts:303,313,371-374,469-471 — W2 in SURVEY
§2.5). PG's DISTINCT ON is nondeterministic under ties; we require
explicit tiebreakers so results are stable across engines and runs
(SURVEY §7.3 hard-part 2).

Scale notes: a single window ``row_number() == 1`` is one shuffle on
the partition key — the minimum possible; no global sort. At 100 TB
this is the standard pattern and AQE handles skewed keys (e.g. one
hot app handle) via skew-join/partition splitting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str] = (),
    descending: bool = True,
) -> DataFrame:
    """Keep exactly one row per key: the first under
    ``ORDER BY order_col [DESC], *tiebreakers [DESC]``.

    Matches PG ``DISTINCT ON (keys) ... ORDER BY keys, order_col DESC``
    with a pinned deterministic tiebreak.
    """
    direction = F.desc if descending else F.asc
    ordering = [direction(order_col)] + [direction(t) for t in tiebreakers]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    rn = "__pms_rn"
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) == 1)
        .drop(rn)
    )


def exact_dedupe(df: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal.

    With ``keys=None``: full-row ``dropDuplicates()`` (hash-groupBy on
    all columns). With keys: keeps an arbitrary-but-deterministic row
    per key? No — Spark's dropDuplicates(keys) keeps an arbitrary row;
    for deterministic semantics use :func:`latest_per_key`. This
    variant is the fast path when any representative row is fine.
    """
    return df.dropDuplicates(list(keys)) if keys else df.dropDuplicates()
