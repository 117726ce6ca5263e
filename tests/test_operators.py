"""Operator-level properties not visible through the oracle queries."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from prisma_migrator_spark.catalog import load_table
from prisma_migrator_spark.operators.aggregates import (
    distinct_pair_agg,
    salted_distinct_pair_agg,
)
from prisma_migrator_spark.operators.dedup import latest_per_key


def test_salted_distinct_agg_matches_unsalted(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = distinct_pair_agg(li, ["l_suppkey"], ["l_returnflag", "l_linestatus"])
    salted = salted_distinct_pair_agg(
        li, ["l_suppkey"], ["l_returnflag", "l_linestatus"], n_salt=8
    )
    a = {r.l_suppkey: r.pairs for r in plain.collect()}
    b = {r.l_suppkey: r.pairs for r in salted.collect()}
    assert a == b


def test_latest_per_key_map_fallback(spark):
    # a MapType payload is not orderable -> window fallback must kick in
    df = spark.createDataFrame(
        [
            Row(k=1, ts=1, m={"a": 1}),
            Row(k=1, ts=2, m={"b": 2}),
            Row(k=2, ts=5, m={"c": 3}),
        ]
    )
    out = latest_per_key(df, ["k"], "ts")
    got = {r.k: (r.ts, dict(r.m)) for r in out.collect()}
    assert got == {1: (2, {"b": 2}), 2: (5, {"c": 3})}


def test_latest_per_key_null_order_key_loses(spark):
    df = spark.createDataFrame(
        [Row(k=1, ts=None, v="null-ts"), Row(k=1, ts=3, v="real")],
        "k int, ts int, v string",
    )
    out = latest_per_key(df, ["k"], "ts")
    assert out.collect()[0].v == "real"
