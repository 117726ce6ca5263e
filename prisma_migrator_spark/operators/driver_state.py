"""Bounded driver-state collection.

Every ``.collect()`` in this package pulls STRUCTURALLY bounded state
to the driver (a file list, k centroids, a Bloom vocabulary, partition
values, a 1-row aggregate) — never a data-proportional result set.
That bound used to be convention; :func:`bounded_collect` makes it a
contract, the same discipline ``bounded_global_window`` imposed on
global windows: the caller states the bound and WHY it holds, and the
call raises instead of silently materializing an unbounded frame on
the driver when a refactor breaks the invariant. ``tests/``
grep-guards that no bare ``.collect()`` remains in package code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row


def bounded_collect(df: DataFrame, max_rows: int, why: str) -> list[Row]:
    """Collect ``df`` to the driver, asserting it holds at most
    ``max_rows`` rows. ``why`` documents the structural reason the
    bound holds (shown in the error so a tripped bound explains
    itself). The probe fetches ``max_rows + 1`` rows via ``limit`` —
    the overflow check costs one extra row, not a count job.
    """
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"bounded_collect: frame exceeded the declared driver-state "
            f"bound of {max_rows} rows ({why}); refusing to materialize "
            f"an unbounded result on the driver"
        )
    return rows
