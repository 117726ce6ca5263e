"""Distributed ranking-quality metrics (ROC-AUC, calibration).

Every scoring stage in the pipeline (quality classifiers, fluency
LMs, dedup thresholds) needs an evaluation answer — "does this score
actually separate good from bad" — computed over the WHOLE corpus,
not a sampled sliver. ROC-AUC is the standard answer, and its naive
forms don't scale: the pairwise definition is O(P*N) pairs, and the
rank-sum (Mann-Whitney) form hides a GLOBAL SORT in ``rank() OVER
(ORDER BY score)``.

The scalable identity used here groups by DISTINCT SCORE first
(one hash shuffle), then needs only "how many negatives score
strictly below s" per distinct score — an exclusive prefix sum in
score order, computed with the same two-level scheme as
``llm.packing.global_running_offset``: range-bucket the scores,
aggregate per-bucket negative counts (tiny), exclusive-sum across
buckets (window over ``n_buckets`` rows via ``bounded_global_window``),
then a within-bucket window partitioned by bucket. No corpus-sized
frame ever passes through one task. Ties get the standard midpoint
credit (0.5 per tied positive-negative pair).

Exactness: the AUC numerator is accumulated as ``2*pos*neg_below +
pos*neg`` — integers — in ``decimal(38,0)``, so the metric is exact
integer arithmetic until one final division, which both Spark and the
DuckDB oracle perform on identical operands (no float-order
sensitivity, byte-identical under the ``--twice`` gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prisma_migrator_spark.operators.ranking import bounded_global_window


def roc_auc(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_buckets: int = 64,
) -> DataFrame:
    """1-row frame ``(n_pos, n_neg, auc)``: tie-aware ROC-AUC of
    ``score_col`` against the 0/1 ``label_col``. ``auc`` is NULL when
    either class is empty (undefined). Rounded to 6 dp."""
    lab = F.col(label_col).cast("long")
    g = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.sum(lab).alias("n_pos"),
        F.sum(1 - lab).alias("n_neg"),
    )
    # r10 (guide §1.2, VERDICT r9 item 8): the score range used to
    # size the buckets was an EAGER ``g.agg(min, max).first()`` — a
    # driver-blocking job that recomputed the whole upstream (for the
    # classifier queries: a full featurize+score pass) once at BUILD
    # time and again at action time. It now rides the plan as a 1-row
    # broadcast, like ``llm.packing.global_running_offset``. Result
    # bits are unchanged: min/max/double subtraction/division are the
    # same IEEE-754 ops the driver did, and the AUC is invariant to
    # the bucket function anyway (any score-monotone bucketing yields
    # the same two-level prefix sum; the numerator stays exact
    # integer arithmetic). All-null/empty inputs produce NULL buckets
    # that drop at the bucket join, and the final COALESCE keeps the
    # old literal (0, 0, NULL) row shape.
    rng = g.groupBy().agg(
        F.min("__s").cast("double").alias("__lo"),
        F.max("__s").cast("double").alias("__hi"),
    )
    span_raw = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets))
    span = F.when(span_raw == 0.0, F.lit(1.0)).otherwise(span_raw)
    b = F.least(
        F.floor((F.col("__s") - F.col("__lo")) / span),
        F.lit(n_buckets - 1),
    ).cast("long")
    bucketed = (
        g.crossJoin(F.broadcast(rng))
        .withColumn("__b", b)
        .drop("__lo", "__hi")
    )

    totals = bucketed.groupBy("__b").agg(F.sum("n_neg").alias("__t"))
    w_b = bounded_global_window(
        F.col("__b"), anchor="__b", bound=f"n_buckets={n_buckets} offset rows"
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__t").over(w_b), F.lit(0)).alias("__base")
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_score = bucketed.join(F.broadcast(offsets), "__b").withColumn(
        "neg_below",
        F.col("__base") + F.coalesce(F.sum("n_neg").over(w_in), F.lit(0)),
    )
    agg = per_score.agg(
        F.sum("n_pos").alias("n_pos"),
        F.sum("n_neg").alias("n_neg"),
        F.sum(
            (
                2 * F.col("n_pos") * F.col("neg_below")
                + F.col("n_pos") * F.col("n_neg")
            ).cast("decimal(38,0)")
        ).alias("__num"),
    )
    pairs = 2 * F.col("n_pos") * F.col("n_neg")
    return agg.select(
        F.coalesce(F.col("n_pos"), F.lit(0)).cast("bigint").alias("n_pos"),
        F.coalesce(F.col("n_neg"), F.lit(0)).cast("bigint").alias("n_neg"),
        F.when(
            pairs > 0,
            F.round(F.col("__num").cast("double") / pairs.cast("double"), 6),
        ).alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins: equal-width bins over the observed
    score range, per bin the row count, mean score, and positive
    rate — the "is a 0.9 score actually right 90% of the time" report.
    One in-plan range agg + one (bin) HashAggregate.

    r10 (guide §1.2, VERDICT r9 item 8): the bin range was an EAGER
    ``df.agg(min, max).first()`` recomputing the whole upstream at
    build time; it now rides the plan as a 1-row broadcast (same
    pattern as :func:`roc_auc`). Bin bits unchanged: the cast-widen /
    subtract / divide are the identical IEEE-754 double ops the
    driver did; an empty input yields an empty grouped frame exactly
    like the old literal empty return."""
    rng = df.groupBy().agg(
        F.min(score_col).cast("double").alias("__lo"),
        F.max(score_col).cast("double").alias("__hi"),
    )
    span_raw = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    span = F.when(span_raw == 0.0, F.lit(1.0)).otherwise(span_raw)
    lab = F.col(label_col).cast("long")
    b = F.least(
        F.floor((F.col(score_col) - F.col("__lo")) / span),
        F.lit(n_bins - 1),
    ).cast("int")
    return (
        df.crossJoin(F.broadcast(rng))
        # all-null scores: the old eager path returned an EMPTY frame
        # (lo is None); a non-null range keeps every row, including
        # null-score rows in the null bin, exactly as before
        .where(F.col("__lo").isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg(F.col(score_col).cast("double")), 6).alias(
                "mean_score"
            ),
            F.round(F.sum(lab) / F.count(F.lit(1)), 6).alias("pos_rate"),
        )
    )


def isotonic_calibrate(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Isotonic calibration of a scorer against 0/1 labels via
    pool-adjacent-violators (PAV): returns the monotone step function
    as one row per pooled block — (score_lo, score_hi, n, calibrated_p)
    — mapping raw scores to empirical probabilities without assuming
    a parametric shape (the standard post-hoc calibration fit;
    Zadrozny & Elkan 2002).

    Scale shape: the corpus collapses to DISTINCT score values with
    (n, n_pos) counts — bounded by the 6dp score grid, not by rows —
    and PAV runs driver-side over that bounded frame
    (`bounded_collect` contract; the stack-based pass is O(distinct
    scores)). The calibrated map is block-sized: broadcast it back to
    score any stream."""
    from prisma_migrator_spark.operators.driver_state import bounded_collect

    lab = F.col(label_col).cast("double")
    g = (
        df.groupBy(F.col(score_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(lab).alias("pos"))
        .orderBy("s")
    )
    cap = 2_000_000  # 6dp grid bound
    rows = bounded_collect(g, cap, "distinct 6dp score values")
    # PAV: merge adjacent blocks while the mean ever decreases
    blocks: list[list[float]] = []  # [lo, hi, n, pos]
    for r in rows:
        blocks.append([float(r["s"]), float(r["s"]),
                       float(r["n"]), float(r["pos"])])
        while len(blocks) >= 2 and (
            blocks[-2][3] / blocks[-2][2] >= blocks[-1][3] / blocks[-1][2]
        ):
            lo, _, n1, p1 = blocks[-2]
            _, hi, n2, p2 = blocks[-1]
            blocks[-2:] = [[lo, hi, n1 + n2, p1 + p2]]
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (lo, hi, int(n), round(p / n, 6))
            for lo, hi, n, p in blocks
        ],
        "score_lo double, score_hi double, n long, calibrated_p double",
    )
