"""Eval-set decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

The standard pre-training hygiene step (C4/Dolma-style): any training
document containing an n-gram that also occurs in an eval benchmark is
suspect — keeping it inflates eval scores. Semantics: per training
doc, the number of DISTINCT n-grams it shares with the union of all
eval docs' n-grams, plus a boolean flag.

Scale shape: the eval side is small (benchmarks are thousands of
docs, not billions) — its distinct-gram set is broadcast, so the
training corpus is scanned ONCE with a map-side broadcast hash join;
the only shuffle is the per-doc hit-count aggregation, keyed on
doc_id. The training side's grams are NOT collected or deduped
globally; per-doc dedup rides the same aggregation. n-gram machinery
is shared with the near-dup stack (:func:`..dedup.shingles`).

In production ``k`` is 8-13 (an 8-gram hit is near-certain leakage);
tests use the corpus-wide k=3 convention so the oracle SQL stays
shared with the Jaccard/minhash queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prisma_migrator_spark.llm.dedup import shingles


def eval_gram_set(eval_docs: DataFrame, k: int = 3) -> DataFrame:
    """DISTINCT n-grams over the whole eval set — one column ``shingle``.

    Deduped across docs (a gram appearing in many eval docs must count
    once per training doc), which also minimizes the broadcast size.
    Eval sets are broadcast-small by definition, so the shingling
    skips the parallelism repartition (r9): one task over a benchmark
    is cheaper than the exchange that would spread it.
    """
    return (
        shingles(eval_docs, k=k, distinct=False, parallelize=False)
        .select("shingle")
        .distinct()
    )


def decontaminate(
    train_docs: DataFrame,
    eval_grams: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per training doc: ``n_eval_grams_hit`` (distinct shared n-grams)
    and ``contaminated`` — every training doc appears, zero hits
    included. Docs shorter than ``k`` tokens have no grams and count 0.

    One-pass shape (r9, guide §2.3/§2.4): the former zero-fill was a
    second scan of ``train_docs`` left-joined onto the hit counts.
    Instead the broadcast membership probe is a LEFT join on the gram
    stream itself and the count is conditional — every doc reaches the
    aggregate (``keep_empty`` emits a NULL-gram row for sub-k docs,
    which the null-skipping count tallies as 0), so the pipeline is
    ONE text scan, one broadcast probe, one aggregation.
    """
    grams = shingles(
        train_docs, k=k, id_col=id_col, distinct=False, keep_empty=True
    )
    probe = F.broadcast(
        eval_grams.select(F.col("shingle").alias("__eg"))
    )
    hits = (
        grams.join(probe, F.col("shingle") == F.col("__eg"), "left")
        .groupBy(id_col)
        # count_distinct skips nulls: unmatched grams (__eg null) and
        # the keep_empty NULL-gram rows both contribute 0
        .agg(F.count_distinct("__eg").alias("n_eval_grams_hit"))
    )
    return hits.select(
        id_col,
        "n_eval_grams_hit",
        (F.col("n_eval_grams_hit") > 0).alias("contaminated"),
    )


def contamination_by_eval_doc(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """The reverse attribution of :func:`decontaminate`: per EVAL doc,
    how many training docs share ≥1 distinct k-gram with it and how
    many distinct grams are shared — the "which benchmarks are
    compromised" report (dropping contaminated training docs fixes
    future runs; a benchmark whose answers already leaked into a
    trained model needs to be flagged on the EVAL side).

    Every eval doc appears, zero rows included. Scale shape: the eval
    gram table broadcasts (benchmarks are small); the join fan-out is
    Σ_gram df_train(g)·df_eval(g), which is why production uses
    k=8-13 — at that length df_train of any shared gram is ~1 and the
    fan-out collapses to the true leak count. k=3 here keeps the
    oracle SQL shared with the Jaccard/minhash family.
    """
    ev = shingles(eval_docs, k=k, id_col=id_col, distinct=True).select(
        F.col(id_col).alias("eval_id"), "shingle"
    )
    tr = shingles(train_docs, k=k, id_col=id_col, distinct=True).select(
        F.col(id_col).alias("train_id"), "shingle"
    )
    agg = (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("eval_id")
        .agg(
            F.count_distinct("train_id").alias("n_train_docs_sharing"),
            F.count_distinct("shingle").alias("n_shared_grams"),
        )
    )
    return (
        eval_docs.select(F.col(id_col).alias("eval_id"))
        # agg is eval-sized (benchmarks are small by definition):
        # broadcast it so the zero-fill join never sorts either side
        .join(F.broadcast(agg), "eval_id", "left")
        .select(
            "eval_id",
            F.coalesce("n_train_docs_sharing", F.lit(0)).alias(
                "n_train_docs_sharing"
            ),
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
        )
    )
