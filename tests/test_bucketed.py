"""Proof that the bucketed-table layout (writers/bucketed.py) buys
what it claims: a join or aggregation on the bucket key over two
co-bucketed tables runs with ZERO exchanges — the shuffle was paid
once at write time and never again.

This is the storage-level answer to the 100 TB fact-fact join: plan
strings are asserted, not just results, because the whole point of
bucketing is the plan shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prisma_migrator_spark.catalog import load_table
from prisma_migrator_spark.writers.bucketed import write_bucketed


@pytest.fixture(scope="module")
def bucket_db(spark, sf_dir, tmp_path_factory):
    """A throwaway metastore database whose tables live under tmp —
    saveAsTable needs a catalog entry, not just a path. The two
    co-bucketed tables are written here so every test in the module
    is independent of execution order."""
    loc = tmp_path_factory.mktemp("bucket_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS pms_bucket_test LOCATION '{loc}'")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    write_bucketed(
        orders, "pms_bucket_test.orders_b", ["o_custkey"], 8,
        sort_cols=["o_custkey"],
    )
    write_bucketed(
        cust, "pms_bucket_test.customer_b", ["c_custkey"], 8,
        sort_cols=["c_custkey"],
    )
    yield "pms_bucket_test"
    spark.sql("DROP DATABASE IF EXISTS pms_bucket_test CASCADE")


def _executed(df) -> str:
    df.collect()  # AQE finalizes the executed plan only after a run
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_runs_with_zero_exchanges(spark, sf_dir, bucket_db):
    """orders ⋈ customer on custkey: plain parquet reads shuffle BOTH
    sides; the same join over co-bucketed tables must contain no
    Exchange at all, and with sorted buckets no extra Sort either,
    while returning identical results."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_ord = spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob = spark.table(f"{bucket_db}.orders_b")
        cb = spark.table(f"{bucket_db}.customer_b")
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey).select(
            "o_orderkey", "c_name", "o_totalprice"
        )
        plan = _executed(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # With outputOrdering honored (SPARK-28216 gates it behind a
        # conf because the one-file-per-bucket check costs a listing),
        # the bucket-local sort order also elides both Sort nodes —
        # write_bucketed's repartition guarantees one file per bucket.
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        sorted_plan = _executed(
            ob.join(cb, ob.o_custkey == cb.c_custkey).select(
                "o_orderkey", "c_name", "o_totalprice"
            )
        )
        assert "Exchange" not in sorted_plan, sorted_plan
        assert "Sort " not in sorted_plan, sorted_plan

        # same join over the plain parquet frames shuffles both sides
        plain = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
            "o_orderkey", "c_name", "o_totalprice"
        )
        plain_plan = _executed(plain)
        assert plain_plan.count("Exchange hashpartitioning") >= 2

        # and the answers are identical
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", prev_ord
        )


def test_bucketed_aggregation_skips_the_shuffle(spark, sf_dir, bucket_db):
    """groupBy on the bucket key: the hash aggregate reads bucket-local
    data — no exchange between partial and final (Spark plans ONE
    final aggregate directly over the scan)."""
    ob = spark.table(f"{bucket_db}.orders_b")
    agg = ob.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("spend")
    )
    plan = _executed(agg)
    assert "Exchange" not in plan, plan

    base = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
    )
    assert sorted(map(tuple, agg.collect())) == sorted(
        map(tuple, base.collect())
    )
