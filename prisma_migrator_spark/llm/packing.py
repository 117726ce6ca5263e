"""Sequence packing: lay a corpus's token stream into fixed-size
training contexts.

GPT-style stream packing: documents are concatenated in a
deterministic global order (``order by doc_id``) and the stream is cut
every ``ctx`` tokens; a document crossing a boundary is split across
the adjacent packs. Output is one row per (doc, pack) span — exactly
what a loader needs to materialize packed examples. The complement of
fixed-length *chunking* (``doc_chunks``), which cuts each doc
independently and pads the tail.

Scale shape — the interesting part is the global prefix sum. The
naive form is ``sum(n) OVER (ORDER BY doc_id)``: an unpartitioned
window, which Spark executes as a SINGLE task after a global sort —
the whole corpus through one reducer. Instead, a two-level
distributed prefix sum:

1. bucket docs by id range (``n_buckets`` contiguous ranges);
2. per-bucket token totals — tiny aggregate, ``n_buckets`` rows;
3. exclusive running total ACROSS buckets — a window over those few
   rows (single task over ``n_buckets`` rows, not over the corpus);
4. broadcast the bucket offsets back and take a window WITHIN each
   bucket — partitioned by bucket, all buckets in parallel.

Same numbers as the global window, but the corpus-sized work is
hash-partitioned across every executor; the serial section is
O(n_buckets). The pack-span explode afterwards is pure map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_running_offset(
    df: DataFrame,
    len_col: str,
    order_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Add ``start_off``: the exclusive prefix sum of ``len_col`` in
    ``order_col`` order — distributed (see module docstring), identical
    to ``sum(len) OVER (ORDER BY order_col) - len``.

    ``order_col`` must be unique per row (it is the tiebreak that makes
    the packing deterministic).
    """
    lo, hi = df.agg(F.min(order_col), F.max(order_col)).first()
    span = (int(hi) - int(lo)) // n_buckets + 1
    b = ((F.col(order_col) - F.lit(int(lo))) / F.lit(span)).cast("long")
    bucketed = df.withColumn("__b", b)

    totals = bucketed.groupBy("__b").agg(F.sum(len_col).alias("__t"))
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__t").over(w_b), F.lit(0)).alias("__base")
    )

    w_in = (
        Window.partitionBy("__b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.join(F.broadcast(offsets), "__b")
        .withColumn(
            "start_off",
            F.col("__base") + F.coalesce(F.sum(len_col).over(w_in), F.lit(0)),
        )
        .drop("__b", "__base")
    )


def pack_stream(
    docs_with_len: DataFrame,
    ctx: int = 512,
    len_col: str = "n_tokens",
    order_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """One row per (doc, pack) span of the concatenated token stream:
    ``pack_id``, ``start_in_pack``, ``tok_start`` (offset inside the
    doc) and ``span_len``. Zero-length docs are dropped (they occupy
    no stream positions).
    """
    n = F.col(len_col)
    with_off = global_running_offset(
        docs_with_len.where(n >= 1), len_col, order_col, n_buckets
    )
    first_p = F.floor(F.col("start_off") / ctx)
    last_p = F.floor((F.col("start_off") + n - 1) / ctx)
    packs = with_off.select(
        order_col,
        "start_off",
        n.alias("__n"),
        F.explode(F.sequence(first_p, last_p)).alias("pack_id"),
    )
    p0 = F.col("pack_id") * ctx  # stream offset where this pack starts
    span_start = F.greatest(F.col("start_off"), p0)
    span_end = F.least(F.col("start_off") + F.col("__n"), p0 + ctx)
    return packs.select(
        order_col,
        F.col("pack_id").cast("long").alias("pack_id"),
        (span_start - p0).cast("int").alias("start_in_pack"),
        (span_start - F.col("start_off")).cast("int").alias("tok_start"),
        (span_end - span_start).cast("int").alias("span_len"),
    )
