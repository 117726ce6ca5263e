"""Distributed BPE merge learning (Sennrich et al. 2016) — the
tokenizer-training step of an LLM data pipeline, expressed with
DataFrame ops only (no Python UDFs anywhere, including the per-word
merge application, which is an ``F.aggregate`` fold).

Reference scope note: the reference engine (its-anas/prisma-migrator)
has no tokenizer training; this is part of the mandated
training-data-pipeline extension surface.

Scale shape (the standard fastBPE factoring): training operates on
the DISTINCT-WORD frequency table, not the corpus — one corpus-sized
shuffle up front (word → count), then every merge iteration touches
only |vocab| rows (~10⁵-10⁷ regardless of corpus size). Per
iteration: one map-side pair explode + one hash-agg shuffle keyed on
the symbol pair, a 1-row TakeOrdered to pick the winner (never a
global sort), and a map-only fold that rewrites each word's symbol
array. Iteration state is snapshotted with eager ``localCheckpoint``
— same rationale as ``connected_components`` (PERF.md #29): per-round
persist leaves lineage chains that silently recompute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prisma_migrator_spark.operators.driver_state import bounded_collect


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table — BPE's working set. One shuffle
    over the corpus (map-side combine on the word key)."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
                "word"
            )
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _chars(word: Column) -> Column:
    # split(w, '') emits a trailing '' artifact on some engines; filter
    # keeps only real single characters
    return F.filter(F.split(word, ""), lambda x: x != F.lit(""))


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (left, right)
    symbol pairs into one symbol — a fold, not a UDF. Literals go
    through ``F.lit`` so arbitrary corpus symbols (quotes,
    backslashes) never touch SQL-string escaping."""
    la, lb, lab = F.lit(left), F.lit(right), F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (x == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(lab)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns one row per learned merge, in order:
    ``(rank int, left string, right string, merged string,
    pair_count bigint)`` where pair_count is the (word-frequency-
    weighted) number of adjacent occurrences at the time the rule was
    learned. Ties break deterministically: count DESC, left ASC,
    right ASC — so the output is stable across partitionings, AQE
    re-plans, and cluster sizes.

    Stops early when no pair reaches ``min_pair_count``.
    """
    spark = docs.sparkSession
    words = (
        word_freqs(docs, text_col)
        .select(_chars(F.col("word")).alias("syms"), "freq")
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        # guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, so a
        # 1-symbol word must short-circuit to an empty pair list
        pairs = words.select(
            F.explode(
                F.expr(
                    "if(size(syms) < 2, "
                    "array()::array<struct<l:string,r:string>>, "
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(element_at(syms, i) AS l, "
                    "element_at(syms, i + 1) AS r)))"
                )
            ).alias("p"),
            "freq",
        )
        best = bounded_collect(
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("p.l"), F.asc("p.r"))
            .limit(1),  # TakeOrdered: 1 row to the driver, no global sort
            1,
            "argmax pair per merge round",
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        left, right, n = best[0]["p"]["l"], best[0]["p"]["r"], int(best[0]["n"])
        merges.append((rank, left, right, left + right, n))
        words = words.select(
            _merge_fold(F.col("syms"), left, right).alias("syms"), "freq"
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count bigint"
    )


def apply_bpe_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize text with an ordered merge list: per word, start from
    characters and apply each rule in learned order — ``len(merges)``
    chained map-side folds, zero shuffles, zero UDFs. Fine for the
    short rule lists tested here; a production tokenizer with 10⁴⁺
    rules would batch this differently (e.g. a Pandas-UDF trie), but
    the training side above is the distributed-compute part."""
    out_words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tokenized = F.transform(
        F.filter(out_words, lambda w: F.length(w) > 0),
        lambda w: _apply_all(_chars(w), merges),
    )
    return docs.select(
        id_col, F.flatten(tokenized).alias("bpe_tokens")
    )


def _apply_all(syms: Column, merges: list[tuple[str, str]]) -> Column:
    for left, right in merges:
        syms = _merge_fold(syms, left, right)
    return syms
