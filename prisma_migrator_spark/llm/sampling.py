"""Deterministic sampling for corpus construction.

``DataFrame.sample`` draws from a per-partition RNG stream, so its
output changes with partitioning, task retries, and AQE re-plans —
unacceptable for a training corpus that must be reproducible from a
recipe. These samplers key every keep/drop decision on a content hash
instead: the same row with the same salt is kept or dropped identically
on every engine, every cluster size, every rerun. Zero shuffle — the
decision is a map-side filter that composes with whatever the plan was
already doing.

The mixture use case (SURVEY §2.13 has no sampling surface; this is
the training-pipeline extension): each domain/source gets a target
keep rate, so the sampled corpus hits a prescribed domain mixture —
the standard "down-weight the crawl, keep all of the books" step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5 prefix of 15 hex digits = 60 bits; dividing by 2^60 gives a
# deterministic uniform in [0, 1) with plenty of resolution.
_UNIT_DENOM = float(1 << 60)


def hash_unit(key: Column, salt: str = "sample") -> Column:
    """Deterministic uniform-[0,1) draw from a key column: the first
    60 bits of md5(salt:key) scaled down. Engine-portable (md5 and
    base-16 parsing agree across Spark/DuckDB/Postgres), so the oracle
    can reproduce draws bit-for-bit."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") / F.lit(
        _UNIT_DENOM
    )


def deterministic_sample(
    df: DataFrame, rate: Column, key_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep each row iff its hash draw falls under ``rate`` (a Column,
    so per-row/per-domain rates work). Expected kept fraction = rate;
    exact membership is a pure function of (key, salt)."""
    return df.where(hash_unit(F.col(key_col), salt) < rate)


def deterministic_shuffle_rank(
    df: DataFrame,
    key_col: str = "doc_id",
    salt: str = "shuffle",
    n_buckets: int = 256,
) -> DataFrame:
    """Add ``shuffle_pos``: a dense 0..n-1 global permutation in
    md5(salt:key) order — the reproducible corpus shuffle every
    training run needs (same recipe -> same order, on any engine or
    cluster size; appending docs later permutes them in without
    moving anything already written... with a fresh salt per epoch).

    The naive form is ``row_number() OVER (ORDER BY hash)`` — a
    global sort through ONE task. Here the hash's own uniformity
    replaces the sort's sampling: bucket on the first hash byte(s),
    count per bucket (tiny agg), exclusive-sum the counts across
    buckets (window over n_buckets rows), then row_number WITHIN
    each bucket — every corpus-sized stage hash-partitioned, the
    serial section O(n_buckets). Same two-level shape as
    ``packing.global_running_offset`` with count playing len.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    # bucket on the hash PREFIX (top bits), not a modulus: prefix
    # buckets are range-contiguous in hash order, so sorting by
    # (bucket, hash) IS the global hash order
    hv = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    bits = max((n_buckets - 1).bit_length(), 1)
    bucketed = df.withColumn("__h", hv).withColumn(
        "__b", F.shiftright(F.col("__h"), 60 - bits)
    )
    from prisma_migrator_spark.operators.ranking import bounded_global_window

    counts = bucketed.groupBy("__b").agg(F.count("*").alias("__c"))
    w_b = bounded_global_window(
        F.col("__b"), anchor="__b", bound=f"n_buckets={n_buckets} offset rows"
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__c").over(w_b), F.lit(0)).alias("__base")
    )
    w_in = Window.partitionBy("__b").orderBy("__h", key_col)
    return (
        bucketed.join(F.broadcast(offsets), "__b")
        .withColumn(
            "shuffle_pos", F.col("__base") + F.row_number().over(w_in) - 1
        )
        .drop("__b", "__h", "__base")
    )


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight: Column,
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (the
    exponential-keys / A-ES scheme of Efraimidis & Spirakis): each row
    draws u = hash_unit(key) and scores u^(1/w); the k largest scores
    are the sample, and inclusion probabilities follow the weights
    exactly as in sequential weighted sampling without replacement.

    Fully deterministic — the draw is a pure function of (key, salt) —
    so retries, AQE re-plans, and the DuckDB oracle all reproduce the
    same sample. Plan shape: one map-side score, then a distributed
    top-k (``orderBy().limit(k)`` = TakeOrdered: per-partition partial
    top-k, driver merges k rows — never a global sort). Zero-weight
    rows score 0 and are only drawn after every positive-weight row.
    """
    u = hash_unit(F.col(key_col), salt)
    score = F.when(
        weight > 0, F.pow(u, F.lit(1.0) / weight)
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn("__ws", F.round(score, 12))
        .orderBy(F.desc("__ws"), F.asc(key_col))
        .limit(k)
        .drop("__ws")
    )
