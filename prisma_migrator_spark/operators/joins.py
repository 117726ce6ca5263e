"""Semi/anti join wrappers (SURVEY §2.3 J3; §2.1 S5's Spark mapping).

The reference uses an IN-subquery semi-join (src/utils/lib.ts:305-312)
and Prisma ``skipDuplicates`` (src/migrate.ts:64) whose distributed
equivalent is an anti-join against existing keys.

Scale: Catalyst plans these as BroadcastHashJoin when the right side
is small (the usual case: key sets, dimension tables); otherwise
sort-merge with both sides shuffled on the join key. Pass
``broadcast_right=True`` to force the hint when you know the right
side is a dimension.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prep(right: DataFrame, on: Sequence[str], broadcast_right: bool) -> DataFrame:
    right = right.select(*on).dropDuplicates(list(on))
    return F.broadcast(right) if broadcast_right else right


def semi_join(
    left: DataFrame, right: DataFrame, on: Sequence[str], broadcast_right: bool = False
) -> DataFrame:
    """Rows of ``left`` whose key exists in ``right`` (EXISTS / IN)."""
    return left.join(_prep(right, on, broadcast_right), list(on), "left_semi")


def anti_join(
    left: DataFrame, right: DataFrame, on: Sequence[str], broadcast_right: bool = False
) -> DataFrame:
    """Rows of ``left`` whose key does NOT exist in ``right``
    (NOT EXISTS) — the skip-duplicates primitive."""
    return left.join(_prep(right, on, broadcast_right), list(on), "left_anti")
