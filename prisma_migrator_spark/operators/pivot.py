"""Dynamic pivot: array column → up-to-N wide columns (SURVEY §2.11 R1).

The reference does this client-side for the CSV report: for each app,
``Category 1..maxCategories`` columns from the categories array,
missing entries as '' (src/utils/lib.ts:504-529). Same two-pass shape
here: (1) tiny 1-row aggregate for the max width, (2) one projection.

Scale: pass 1 is a scalar ``max(size(col))`` — a full scan but only of
one small array column; pass 2 is a pure projection (no shuffle). The
width must come back to the driver because it determines the *schema*
— that is a 1-int collect, not data materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dynamic_pivot(
    df: DataFrame,
    array_col: str,
    prefix: str = "Category ",
    max_width: int | None = None,
    fill: str = "",
    drop_source: bool = True,
) -> DataFrame:
    """Explode ``array_col`` horizontally into ``{prefix}1..N`` columns.

    N = ``max_width`` if given, else the observed max array length
    (reference's ``Math.max(...lengths)``, lib.ts:505).
    """
    if max_width is None:
        row = df.agg(F.max(F.size(array_col))).first()
        max_width = row[0] or 0
    wide = [
        F.coalesce(F.col(array_col)[i], F.lit(fill)).alias(f"{prefix}{i + 1}")
        for i in range(max_width)
    ]
    out = df.select("*", *wide)
    return out.drop(array_col) if drop_source else out
