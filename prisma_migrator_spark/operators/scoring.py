"""Scoring / normalization operators (SURVEY §2.4 A1-A3, §2.5 W1).

These are the aggregation shapes behind the reference's popularity
ranking (src/utils/lib.ts:337-415):

- ``group_sizes``: COUNT(DISTINCT x) per group (A1, lib.ts:342-346).
- ``weighted_reciprocal_rank``: SUM(1/(position+1) * weight) per group
  (A2/A3, lib.ts:348-362) — weight defaults to 1.
- ``with_global_max`` / ``normalize_by_global_max``: the reference's
  ``MAX(...) OVER ()`` (W1, lib.ts:380-381) rewritten as a scalar
  aggregate + broadcast cross-join. Identical semantics, but avoids
  the empty-partition window that would funnel ALL rows through a
  single task — the classic 100 TB killer (SURVEY §4.2).

All are plain groupBy/agg: Catalyst runs them as two-phase
HashAggregate (partial map-side combine, then final after a shuffle
on the group key) — the minimal-shuffle plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prisma_migrator_spark.functions.pg_compat import pg_normalize


def group_sizes(
    df: DataFrame, group: Sequence[str], distinct_col: str, out: str = "total"
) -> DataFrame:
    """COUNT(DISTINCT distinct_col) per group (A1)."""
    return df.groupBy(*group).agg(F.countDistinct(distinct_col).alias(out))


def weighted_reciprocal_rank(
    df: DataFrame,
    group: Sequence[str],
    position_col: str,
    weight: Column | None = None,
    out: str = "score",
) -> DataFrame:
    """SUM((1.0 / (position + 1)) * weight) per group (A2/A3,
    reference src/utils/lib.ts:348-353,355-362)."""
    term = F.lit(1.0) / (F.col(position_col) + F.lit(1))
    if weight is not None:
        term = term * weight
    return df.groupBy(*group).agg(F.sum(term).alias(out))


def with_global_maxes(df: DataFrame, cols: dict[str, str]) -> DataFrame:
    """Attach the global max of several columns at once: ONE scalar
    aggregate + ONE broadcast cross-join for all of them (calling
    :func:`with_global_max` N times would rebuild ``df``'s lineage N
    extra times — no ReusedExchange saves you across separate aggs)."""
    maxima = df.agg(*[F.max(c).alias(out) for c, out in cols.items()])
    return df.crossJoin(F.broadcast(maxima))


def with_global_max(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """Attach the global max of ``col`` to every row.

    Semantics of ``MAX(col) OVER ()`` (reference src/utils/lib.ts:
    380-381) without the single-partition window: a 1-row aggregate is
    computed first and broadcast-joined. The 1-row side is always
    broadcast — no shuffle of ``df`` at all.
    """
    out = out or f"max_{col}"
    maxima = df.agg(F.max(col).alias(out))
    return df.crossJoin(F.broadcast(maxima))


def normalize_by_global_max(
    df: DataFrame, col: str, out: str | None = None
) -> DataFrame:
    """Min-max normalize ``col`` by its global max with the reference's
    NULLIF guards (lib.ts:393-394): NULLIF(x,0)/NULLIF(max,1), 0 on null."""
    out = out or f"{col}_normalized"
    tmp = f"__pms_max_{col}"
    normalized = with_global_max(df, col, tmp)
    return normalized.withColumn(
        out, pg_normalize(F.col(col), F.col(tmp))
    ).drop(tmp)
