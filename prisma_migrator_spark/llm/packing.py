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
    the packing deterministic), and integer-valued (the range
    bucketing does integer span arithmetic on it).

    r9 (guide §1.2/§2.4): the id range used to size the buckets was an
    EAGER ``df.agg(min, max).first()`` — a separate driver-blocking
    job that recomputed ``df``'s whole upstream (for pack_stream: a
    full extra tokenization pass of the corpus just to learn the id
    range). It is now a 1-row aggregate broadcast INTO the plan: the
    range subtree prunes to the order column only, runs inside the
    same job, and the driver never blocks. Bucket assignment is
    unchanged (same span arithmetic, now as column expressions).
    """
    # loud contract check (ADVICE r9): the range bucketing does integer
    # span arithmetic on order_col — a non-integral column would
    # mis-bucket silently under float division, so reject it here.
    dtype = dict(df.dtypes).get(order_col)
    if dtype not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"global_running_offset: order_col {order_col!r} must be an "
            f"integral column (got {dtype!r}); cast it upstream"
        )
    rng = df.groupBy().agg(
        F.min(order_col).cast("long").alias("__lo"),
        F.max(order_col).cast("long").alias("__hi"),
    )
    # bucket = (order - lo) DIV span with span = (hi - lo) DIV n + 1 —
    # pure LONG arithmetic (ADVICE r9: the former double division is
    # exact only while the span fits 2^53; DIV is exact for any long
    # range). Bucket boundaries are identical for in-range inputs, and
    # start_off is invariant to them anyway (any order-monotone
    # contiguous bucketing yields the same two-level prefix sum).
    b = F.expr(
        f"(`{order_col}` - __lo) DIV ((__hi - __lo) DIV {int(n_buckets)} + 1)"
    )
    bucketed = (
        df.crossJoin(F.broadcast(rng))
        .withColumn("__b", b)
        .drop("__lo", "__hi")
    )

    from prisma_migrator_spark.operators.ranking import bounded_global_window

    totals = bucketed.groupBy("__b").agg(F.sum(len_col).alias("__t"))
    w_b = bounded_global_window(
        F.col("__b"), anchor="__b", bound=f"n_buckets={n_buckets} offset rows"
    ).rowsBetween(Window.unboundedPreceding, -1)
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
    # offsets run over ALL docs (zero-length docs add 0 to every
    # prefix sum), so the range probe's scan prunes to the order
    # column — filtering first would drag the token counting into it
    # (r9); the n >= 1 drop happens before the span explode below.
    with_off = global_running_offset(
        docs_with_len, len_col, order_col, n_buckets
    ).where(n >= 1)
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


def pack_greedy(
    docs_with_len: DataFrame,
    ctx: int = 512,
    len_col: str = "n_tokens",
    order_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """No-split packing: first-fit-decreasing bins whole documents into
    packs of at most ``ctx`` tokens (a doc longer than ``ctx`` becomes
    its own oversize pack — flag or chunk upstream). Use when examples
    must not cross document boundaries (SFT, contrastive pairs);
    :func:`pack_stream` is the higher-efficiency splitting form.

    Distributed shape: docs hash into ``n_buckets`` buckets; FFD runs
    independently per bucket in an Arrow-batched ``applyInPandas``
    (sequential by nature — the greedy choice depends on every prior
    placement, so the parallel unit is the bucket, not the row).
    ``pack_id = bucket * 2^40 + local`` keeps ids globally unique
    without coordination. Per-bucket FFD wastes at most one pack's
    residual capacity per open bin vs global FFD; with buckets ≫ docs
    per bucket the efficiency loss is bounded and the test pins a
    floor. Deterministic: bucket by hash(order_col), place by
    (len desc, order_col asc).
    """

    def ffd(pdf):
        import pandas as pd

        pdf = pdf.sort_values([len_col, order_col], ascending=[False, True])
        bucket = int(pdf["__b"].iloc[0])
        # bins scanned first-fit; docs per bucket is corpus/n_buckets,
        # so the quadratic scan stays small per task
        bins: list[int] = []  # remaining capacity per local pack
        out = []
        for doc, n in zip(pdf[order_col], pdf[len_col]):
            n = int(n)
            placed = None
            if n < ctx:  # oversize (n >= ctx) always opens its own bin
                for i, rem in enumerate(bins):
                    if rem >= n:
                        placed = i
                        bins[i] = rem - n
                        break
            if placed is None:
                placed = len(bins)
                bins.append(max(ctx - n, 0))
            out.append(
                {
                    order_col: int(doc),
                    len_col: n,
                    "pack_id": (bucket << 40) | placed,
                }
            )
        return pd.DataFrame(out)

    b = F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_buckets))
    return (
        docs_with_len.where(F.col(len_col) >= 1)
        .select(
            F.col(order_col).cast("long").alias(order_col),
            F.col(len_col).cast("int").alias(len_col),
            b.alias("__b"),
        )
        .groupBy("__b")
        .applyInPandas(ffd, f"{order_col} long, {len_col} int, pack_id long")
    )


def assign_shards(
    docs_with_len: DataFrame,
    tokens_per_shard: int,
    len_col: str = "n_tokens",
    order_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Assign each document to a training shard of ~``tokens_per_shard``
    tokens, in deterministic ``order_col`` order, WITHOUT splitting
    documents: shard_id = (exclusive running token offset) // target.
    The shard map is what a writer uses to emit balanced training files
    (`partitionBy("shard_id")`), and what a loader uses to address them.

    Same distributed two-level prefix sum as ``pack_stream`` — the
    corpus-sized window is partitioned by id-range bucket; the serial
    section is O(n_buckets) — so shard assignment of a 100 TB corpus
    never funnels through one task. Every shard lands within one
    document of the target size (a doc straddling a boundary stays in
    the shard its first token falls in).
    """
    off = global_running_offset(
        docs_with_len.where(F.col(len_col) >= 1),
        len_col,
        order_col=order_col,
        n_buckets=n_buckets,
    )
    return off.withColumn(
        "shard_id", (F.col("start_off") / F.lit(tokens_per_shard)).cast("long")
    ).drop("start_off")


def length_bucketed_batches(
    docs_with_len: DataFrame,
    max_tokens_per_batch: int,
    len_col: str = "n_tokens",
    order_col: str = "doc_id",
    boundaries: tuple[int, ...] = (32, 64, 128, 256, 512, 1024, 2048, 4096),
) -> DataFrame:
    """Length-bucketed training batches: documents are grouped by
    padded sequence length (the smallest power-of-2 boundary that
    fits), then greedily batched within each bucket so a batch's
    PADDED token footprint (`bucket width x rows`, what the
    accelerator actually allocates) stays under the budget. Mixing
    a 30-token doc with a 4000-token doc pads the short one to 4096;
    bucketing first is the standard fix.

    Output: one row per doc with ``bucket`` (padded length),
    ``batch_id`` (dense within bucket, deterministic in ``order_col``
    order), and the raw length. Docs longer than the top boundary get
    the ceiling bucket (truncation policy belongs to chunking,
    llm/dedup-adjacent `doc_chunks`).

    Scale shape: bucket assignment is a map-side integer CASE; the
    per-bucket cumulative sum runs over ~|boundaries| partitions —
    each bucket's window is independent, and for corpora where one
    bucket dominates, the same two-level prefix sum as
    :func:`global_running_offset` applies (documented swap, identical
    semantics). The padded-cost formulation makes batch capacity an
    integer multiple of the bucket width, so batch_id is exclusive
    padded-prefix // budget — docs never split."""
    from pyspark.sql import Window

    bucket = F.lit(boundaries[-1])
    for b in reversed(boundaries):
        bucket = F.when(F.col(len_col) <= b, F.lit(b)).otherwise(bucket)
    w = (
        Window.partitionBy("bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    padded_before = F.coalesce(F.sum("bucket").over(w), F.lit(0))
    return (
        docs_with_len.withColumn("bucket", bucket)
        .withColumn(
            "batch_id",
            (padded_before / F.lit(max_tokens_per_batch)).cast("long"),
        )
        .select(order_col, len_col, "bucket", "batch_id")
    )
