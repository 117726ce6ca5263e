"""Mergeable corpus-level set sketches (one-permutation MinHash).

Document-level near-dup machinery (:mod:`llm.dedup`) answers "which
PAIRS of documents overlap"; curation also needs the corpus-level
question — "how much does crawl snapshot A overlap source B as a
whole" — to decide whether a new dump is worth ingesting at all,
before paying for a pair-level dedup run. The classic answer is a
MinHash sketch per corpus (Broder 1997) in its one-permutation form
(Li, Owen & Zhang, "One Permutation Hashing", NIPS 2012): hash every
shingle once, split the 60-bit hash space into ``n_bins`` residue
classes, keep the minimum hash per class. Two corpora's sketches then
estimate Jaccard as the fraction of classes whose minima agree —
within each class the minimum of the union is a uniform draw from the
union, and it matches between the two sketches iff it lies in the
intersection.

Scale shape (100 TB): the sketch build is ONE map-side hash expression
plus ONE HashAggregate keyed on (corpus, bin) — map-side partial mins
reduce each task's output to at most |corpora| x n_bins rows, so the
shuffle is sketch-sized regardless of corpus size, and the sketch is
mergeable across files/days/partitions by taking elementwise mins
(the same algebra HLL/KMV sketches rely on). The pairwise comparison
touches only |corpora| x n_bins rows — |corpora|^2 x n_bins work, the
cost every sketch-comparison scheme shares, trivial next to a scan.
md5-derived hashes keep the sketch engine-portable, so a DuckDB
oracle reproduces it bit-for-bit (same discipline as
``llm.dedup.minhash_signatures``).

Empty-bin caveat: a corpus with fewer than ~``n_bins`` distinct
shingles leaves residue classes empty; an empty class simply cannot
contribute a match (the estimate biases low for degenerate corpora).
``n_bins`` should sit far below the smallest corpus's distinct-shingle
count — the registered query uses 32 bins against sources holding
thousands of distinct shingles each.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Salt for the single OPH hash permutation; the oracle uses the same.
OPH_SALT = "oph"


def oph_hash(shingle: Column) -> Column:
    """The single 60-bit hash permutation: first 15 hex digits of
    md5('oph:' || shingle) parsed base-16 — nonnegative, so ``% n``
    and ``pmod`` agree across engines."""
    h = F.md5(F.concat(F.lit(f"{OPH_SALT}:"), shingle))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def oph_sketch(
    sh: DataFrame,
    group_col: str = "source",
    shingle_col: str = "shingle",
    n_bins: int = 32,
) -> DataFrame:
    """One-permutation MinHash sketch per group: ``(group, bin,
    min_hash)`` with at most ``n_bins`` rows per group. Shingle
    multiplicity is irrelevant to MIN, so callers should feed
    non-deduped shingles (skips a shuffle, same result)."""
    hv = oph_hash(F.col(shingle_col))
    return (
        sh.select(group_col, hv.alias("__hv"))
        .withColumn("bin", F.pmod(F.col("__hv"), F.lit(n_bins)).cast("int"))
        .groupBy(group_col, "bin")
        .agg(F.min("__hv").alias("min_hash"))
    )


def oph_pairwise_jaccard(
    sketch: DataFrame, group_col: str = "source", n_bins: int = 32
) -> DataFrame:
    """Estimated Jaccard for every unordered group pair from their OPH
    sketches: ``est_jaccard = n_match / n_bins`` where ``n_match``
    counts residue classes whose minima agree.

    Every frame here is sketch-sized (|groups| x n_bins rows), so the
    non-equi pair join and the left join both broadcast; pairs sharing
    no populated bin still appear, with ``n_match = 0`` — the pair
    list is generated from the groups, not from the join hits.
    """
    groups = sketch.select(F.col(group_col).alias("src_a")).distinct()
    pairs = groups.join(
        groups.select(F.col("src_a").alias("src_b")),
        F.col("src_a") < F.col("src_b"),
    )
    a = sketch.select(
        F.col(group_col).alias("src_a"), "bin", F.col("min_hash").alias("mh_a")
    )
    b = sketch.select(
        F.col(group_col).alias("src_b"), "bin", F.col("min_hash").alias("mh_b")
    )
    matches = (
        a.join(b, "bin")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(
                F.when(F.col("mh_a") == F.col("mh_b"), 1).otherwise(0)
            ).alias("n_match")
        )
    )
    return pairs.join(F.broadcast(matches), ["src_a", "src_b"], "left").select(
        "src_a",
        "src_b",
        F.coalesce(F.col("n_match"), F.lit(0)).cast("bigint").alias("n_match"),
        F.round(
            F.coalesce(F.col("n_match"), F.lit(0)) / F.lit(float(n_bins)), 6
        ).alias("est_jaccard"),
    )
