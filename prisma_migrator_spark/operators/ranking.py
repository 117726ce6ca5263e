"""Ranking / top-k-per-group operators.

The reference has no ranking windows or LIMIT/top-k anywhere
(SURVEY §2.13: "No ... ranking/lag/lead windows ... LIMIT/top-k"),
but its latest-per-key idiom (reference src/utils/lib.ts:303,313) is
the k=1 special case — any real analytics replacement needs the
general operator.

Scale notes:
- ``topk_per_group`` uses ``row_number`` over (keys, order) — one
  shuffle on the group key, per-partition sort, early filter. For
  k=1 prefer :func:`prisma_migrator_spark.operators.dedup.
  latest_per_key` (max(struct) hash-agg, partial combine, no sort).
  For small k over huge groups the window form is the right plan:
  Spark's WindowExec streams each group, emitting only k rows past
  the filter; no full-group materialization in the driver.
- All orderings take explicit tiebreakers so results are
  deterministic under ties (same requirement as W2 — hash-compare
  against another engine flakes otherwise).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(
    order_by: str, descending: bool, tiebreakers: Sequence[str]
) -> list[Column]:
    lead = F.col(order_by).desc() if descending else F.col(order_by).asc()
    return [lead, *(F.col(t).asc() for t in tiebreakers)]


def bounded_global_window(*order_cols, anchor: str | Column, bound: str):
    """A global-order ``WindowSpec`` for frames whose row count is
    STRUCTURALLY bounded (a top-V vocabulary, an n_buckets offset
    table, a report page) — ``bound`` is the mandatory one-line
    rationale naming that bound.

    Partitioning on a constant instead of leaving the partition spec
    empty makes execution identical (one task sorts the bounded frame)
    but keeps WindowExec's "No Partition Defined" warning out of the
    logs — so any remaining warning in a bench run is a REAL unbounded
    global window, the single strongest scale-smell signal we have.
    Every global window in this package must come from here; a bare
    ``Window.orderBy`` is a review error.

    ``anchor`` is any column of the frame: the constant is written as
    ``pmod(xxhash64(anchor), 1)`` — 0 for every row (xxhash64 is
    null-safe, so NULL anchors land in the same partition) but not
    foldable and opaque enough that no optimizer rule strips it;
    Spark 4's ``EliminateWindowPartitions`` removes a bare ``lit(0)``
    (and arithmetic reducible to one), restoring the warning.
    """
    if not isinstance(bound, str) or not bound.strip():
        raise ValueError(
            "bounded_global_window requires a non-empty `bound` rationale"
        )
    a = F.col(anchor) if isinstance(anchor, str) else anchor
    return Window.partitionBy(F.pmod(F.xxhash64(a), F.lit(1))).orderBy(
        *order_cols
    )


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: str,
    k: int,
    tiebreakers: Sequence[str] = (),
    descending: bool = True,
    rank_col: str = "rn",
) -> DataFrame:
    """Top ``k`` rows per group under a deterministic total order;
    emits ``rank_col`` (1-based row_number) alongside the payload."""
    w = Window.partitionBy(*keys).orderBy(
        *_order_cols(order_by, descending, tiebreakers)
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def ntile_buckets(
    df: DataFrame,
    order_by: str,
    n: int,
    tiebreakers: Sequence[str] = (),
    descending: bool = False,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Assign each row to one of ``n`` equal-height buckets over a
    deterministic global order (quartiles/deciles).

    Scale caveat: an unpartitioned window is a single-task sort — the
    same hazard as ``MAX() OVER ()`` (SURVEY §7.3 #6). Fine for
    result-set-sized frames (reports); for fact-scale frames compute
    quantile cut points first and bucket by comparison —
    ``plans/llm.quality_deciles_q`` is that path end-to-end (9
    broadcast percentile cuts, map-side bucket assignment), and
    ``plans/analytics.approx_event_value_quantiles`` shows the
    sketch-based cut-point computation.
    """
    w = bounded_global_window(
        *_order_cols(order_by, descending, tiebreakers),
        anchor=order_by,
        bound="report-sized frame — caller contract (see docstring)",
    )
    return df.withColumn(bucket_col, F.ntile(n).over(w))
