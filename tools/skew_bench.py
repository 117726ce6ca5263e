#!/usr/bin/env python
"""Skew benchmark: synthetic hot keys over the sf0.1 fixtures.

SURVEY §8 candidate "skew benchmarks with synthetic hot keys". Two
scenarios, both with ~90% of the fact rows landing on ONE key — the
shape that turns a 1000-executor job into a single-straggler job:

1. distinct-set aggregation: unsalted ``distinct_pair_agg`` (hot key's
   rows converge on one reducer) vs ``salted_distinct_pair_agg``
   (element-hash salt spreads them over 16 reducers). AQE cannot help
   here — skew splitting applies to joins, not aggregations.
2. skewed fact-to-fact join, AQE skew-join ON vs OFF (dim side made
   non-broadcastable so the sort-merge path is exercised; AQE splits
   the hot partition into parallel subtasks). Note a downstream
   shuffle-requiring operator suppresses the split — keep aggregations
   off the skewed join's direct output or accept the straggler.

Usage: python tools/skew_bench.py  [prints one JSON line]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from prisma_migrator_spark.catalog import load_table  # noqa: E402
from prisma_migrator_spark.operators.aggregates import (  # noqa: E402
    distinct_pair_agg,
    salted_distinct_pair_agg,
)
from prisma_migrator_spark.session import get_spark  # noqa: E402


def _timed(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("skew-bench")

    li = load_table(spark, sf_dir, "lineitem")
    # Amplify 32x: ~19M rows with ~90% on ONE key. The hot key's
    # reducer-side work (16M set-inserts unsalted) is the critical
    # path; everything map-side is identical for both forms.
    amp = li.select(
        "l_orderkey",
        "l_suppkey",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("i"),
    )
    skewed = amp.select(
        F.when(F.pmod(F.col("l_orderkey"), F.lit(10)) < 9, F.lit(0))
        .otherwise(F.col("l_suppkey"))
        .alias("hot_key"),
        # ~86x duplication: the reducer's set-insert work is what
        # salting parallelizes; all-distinct elements would make the
        # single-reducer array build the floor for both forms.
        F.pmod(F.col("l_orderkey") * 32 + F.col("i"), F.lit(500000)).alias("elem"),
    )
    # The fixture parquet is single-row-group -> the scan (and the
    # explode above it) would run as ONE task; spread before persist
    # so the map side is parallel and the reducer skew is what's
    # measured.
    skewed = skewed.repartition(32)
    skewed.persist().count()

    results: dict[str, float | int] = {}
    # warm both plans once (JIT/codegen), then time
    for name, df in [
        ("agg_unsalted", distinct_pair_agg(skewed, ["hot_key"], ["elem"])),
        (
            "agg_salted",
            salted_distinct_pair_agg(skewed, ["hot_key"], ["elem"], n_salt=16),
        ),
    ]:
        _timed(df)
        results[name] = round(_timed(df), 3)

    # sanity: identical results
    a = distinct_pair_agg(skewed, ["hot_key"], ["elem"])
    b = salted_distinct_pair_agg(skewed, ["hot_key"], ["elem"], n_salt=16)
    mismatch = a.join(b.withColumnRenamed("pairs", "p2"), "hot_key").where(
        F.col("pairs") != F.col("p2")
    ).count()
    results["agg_mismatch_groups"] = mismatch

    # scenario 2: skewed SMJ, AQE skew split on vs off. One build row
    # per key keeps output = probe size, so what's timed is the hot
    # partition's sort+probe, not result explosion. Local shuffle
    # partitions are far smaller than the 256MB default skew
    # threshold, so scale the thresholds down to the local data size —
    # on a real cluster the defaults fire at proportional volumes.
    probe = amp.select(
        F.when(F.pmod(F.col("l_orderkey"), F.lit(10)) < 9, F.lit(0))
        .otherwise(F.col("l_orderkey") % 1000)
        .alias("jk"),
        (F.col("l_orderkey") * 32 + F.col("i")).alias("payload"),
    )
    build = (
        li.select((F.col("l_orderkey") % 1000).alias("jk"))
        .distinct()
        .withColumn("w", F.lit(2.0))
    )
    probe = probe.repartition(32)
    probe.persist().count()
    build.persist().count()
    # No aggregation after the join: a downstream operator that
    # requires the join's hash partitioning makes AQE decline to
    # split the skewed partition (splitting breaks the distribution
    # guarantee). The noop write has no distribution requirement.
    join = probe.join(build, "jk").select(
        (F.col("payload") * F.col("w")).alias("s")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    spark.conf.set(  # AQE's runtime broadcast conversion too
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4MB"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB")
    for flag in ["true", "false"]:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", flag)
        _timed(join)
        results[f"join_aqe_skew_{flag}"] = round(_timed(join), 3)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    # scenario 2b: the case AQE can NOT fix — join followed by a
    # same-key aggregate. The aggregate requires the join's hash
    # partitioning, so AQE must keep the skewed partition intact
    # (splitting would break the distribution guarantee) and the hot
    # key serializes onto one task end-to-end. salted_join makes the
    # join key (jk, salt): the hot key's probe rows spread over 32
    # reducers for the join AND the aggregate's map-side combine; the
    # final jk-keyed agg then receives 32 partial rows for the hot
    # key, not 16M raw ones.
    from prisma_migrator_spark.operators.joins import salted_join

    agg_plain = (
        probe.join(build, "jk")
        .groupBy("jk")
        .agg(F.round(F.sum(F.col("payload") * F.col("w")), 2).alias("s"))
    )
    agg_salted = (
        salted_join(probe, build, ["jk"], n_salt=32)
        .groupBy("jk")
        .agg(F.round(F.sum(F.col("payload") * F.col("w")), 2).alias("s"))
    )
    for name, df in [("join_agg_plain", agg_plain), ("join_agg_salted", agg_salted)]:
        _timed(df)
        results[name] = round(_timed(df), 3)
    results["join_agg_ratio"] = round(
        results["join_agg_plain"] / results["join_agg_salted"], 3
    )
    a = {r["jk"]: r["s"] for r in agg_plain.collect()}
    b = {r["jk"]: r["s"] for r in agg_salted.collect()}
    results["join_agg_mismatch"] = sum(1 for k in a if a[k] != b.get(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")

    # scenario 3: the FLAGSHIP query under a 90%-hot l_suppkey.
    # The pair-level partial aggregate keyed (l_suppkey, l_partkey) is
    # the skew defense: a single hot supplier spreads over its
    # partkeys, so no reducer owns 90% of the fact table, and
    # map-side combine collapses the hot pairs before the shuffle.
    # Uniform and skewed copies are REWRITTEN with identical layout
    # (same repartition) so the only difference is key distribution.
    import shutil
    import tempfile

    from prisma_migrator_spark.plans.registry import QUERIES

    tmp = tempfile.mkdtemp(prefix="pms_skew_")
    try:
        uni_dir = os.path.join(tmp, "uniform")
        skew_dir = os.path.join(tmp, "skew")
        os.makedirs(uni_dir)
        os.makedirs(skew_dir)
        for d in (uni_dir, skew_dir):
            for t in ("part", "supplier"):
                os.symlink(
                    os.path.join(sf_dir, f"{t}.parquet"),
                    os.path.join(d, f"{t}.parquet"),
                )
        hot = li.select(F.min("l_suppkey")).first()[0]
        li.repartition(32).write.parquet(os.path.join(uni_dir, "lineitem.parquet"))
        li.withColumn(
            "l_suppkey",
            F.when(F.pmod(F.col("l_orderkey"), F.lit(10)) < 9, F.lit(hot)).otherwise(
                F.col("l_suppkey")
            ),
        ).repartition(32).write.parquet(os.path.join(skew_dir, "lineitem.parquet"))

        for name, d in [("flagship_uniform", uni_dir), ("flagship_skew90", skew_dir)]:
            df = QUERIES["flagship_popularity"](spark, d)
            _timed(df)  # warm: codegen + page cache
            results[name] = round(_timed(df), 3)
        results["flagship_skew_ratio"] = round(
            results["flagship_skew90"] / results["flagship_uniform"], 3
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # scenario 4: repeated-span stats under BOILERPLATE skew — 90% of
    # 200k docs share one 16-token block, so one window hash carries
    # ~180k rows into the dup-hash join (the hot-reducer hazard the
    # spans docstring documents). Defense in the plan: the dup-hash
    # side is tiny -> AQE converts the join to a runtime broadcast, so
    # the hot hash never concentrates on one reducer. Compare against
    # an all-unique corpus of identical size/shape.
    from prisma_migrator_spark.llm.spans import repeated_span_stats

    base = spark.range(200_000).select(F.col("id").alias("doc_id"))
    block = " ".join(f"bp{i}" for i in range(16))
    uniq_tail = F.concat_ws(
        " ", *[F.concat(F.lit(f"u{j}x"), F.col("doc_id")) for j in range(8)]
    )
    boiler = base.select(
        "doc_id",
        F.when(
            F.pmod("doc_id", F.lit(10)) < 9,
            F.concat(F.lit(block + " "), uniq_tail),
        )
        .otherwise(
            F.concat_ws(
                " ",
                *[F.concat(F.lit(f"v{j}x"), F.col("doc_id")) for j in range(24)],
            )
        )
        .alias("text"),
    ).repartition(32).persist()
    unique = base.select(
        "doc_id",
        F.concat_ws(
            " ", *[F.concat(F.lit(f"w{j}x"), F.col("doc_id")) for j in range(24)]
        ).alias("text"),
    ).repartition(32).persist()
    boiler.count(), unique.count()
    for name, df in [
        ("spans_unique", repeated_span_stats(unique, k=8, stride=4)),
        ("spans_boilerplate90", repeated_span_stats(boiler, k=8, stride=4)),
    ]:
        _timed(df)
        results[name] = round(_timed(df), 3)
    results["spans_skew_ratio"] = round(
        results["spans_boilerplate90"] / results["spans_unique"], 3
    )
    # sanity: the boilerplate docs (and only those) are flagged
    flagged = (
        repeated_span_stats(boiler, k=8, stride=4)
        .where(F.col("n_dup_windows") > 0)
        .count()
    )
    results["spans_flagged_docs"] = flagged

    print(json.dumps({"metric": "skew_bench", "sf_dir": sf_dir, **results}))


if __name__ == "__main__":
    main()
