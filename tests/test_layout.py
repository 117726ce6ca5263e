"""Layout optimization: physical chunking changes, data does not."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from prisma_migrator_spark.catalog import load_table, read_parquet
from prisma_migrator_spark.sources.layout import optimize_layout


def test_optimize_layout_preserves_data(spark, sf_dir, tmp_path):
    out = optimize_layout(
        sf_dir, cache_root=str(tmp_path), row_group_rows=500, min_rows=1000
    )
    for t in ["lineitem", "events", "nation"]:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        a = read_parquet(spark, src)
        b = read_parquet(spark, dst)
        assert a.schema == b.schema
        assert a.count() == b.count()
        assert a.exceptAll(b).isEmpty()
        assert b.exceptAll(a).isEmpty()
    # big table got re-chunked; tiny table is a symlink, not a copy
    assert pq.ParquetFile(os.path.join(out, "lineitem.parquet")).metadata.num_row_groups > 1
    assert os.path.islink(os.path.join(out, "nation.parquet"))
    # second call is a cached no-op (mtimes unchanged)
    before = os.path.getmtime(os.path.join(out, "lineitem.parquet"))
    optimize_layout(sf_dir, cache_root=str(tmp_path), row_group_rows=500, min_rows=1000)
    assert os.path.getmtime(os.path.join(out, "lineitem.parquet")) == before


def test_zorder_write_narrows_both_dims(spark, sf_dir, tmp_path):
    from prisma_migrator_spark.sources.layout import zorder_write

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    out = str(tmp_path / "z")
    zorder_write(li, out, ["l_partkey", "l_suppkey"], n_files=16)
    back = spark.read.parquet(out)

    # equality: same multiset of rows
    assert back.count() == li.count()
    assert back.exceptAll(li).count() == 0

    # per-file min/max spans: BOTH z-order columns must be tight.
    spans = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("l_partkey") - F.min("l_partkey")).alias("dp"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("ds"),
        )
        .agg(F.avg("dp").alias("adp"), F.avg("ds").alias("ads"))
        .first()
    )
    g = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("gp"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("gs"),
    ).first()
    # 16 files; a single-column sort gives ~global/16 on one dim and
    # ~global on the other. Z-order: both well under half the global
    # span (sqrt(16)=4x narrowing per dim in the ideal grid).
    assert spans.adp < g.gp / 2, (spans.adp, g.gp)
    assert spans.ads < g.gs / 2, (spans.ads, g.gs)


def test_dynamic_partition_pruning_on_hive_partitioned_fact(spark, sf_dir, tmp_path):
    """Hive-partition the fact on its join key; a selective broadcast
    dim must inject a dynamicpruning subquery into the fact's
    PartitionFilters so non-matching partitions never scan — the
    cluster-side mechanism behind star-schema queries at 100 TB (the
    file-level sibling of the runtime bloom-filter test)."""
    from prisma_migrator_spark.catalog import load_table

    fact_path = str(tmp_path / "li_part")
    li = load_table(spark, sf_dir, "lineitem")
    li.write.partitionBy("l_returnflag").mode("overwrite").parquet(fact_path)

    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        fact = spark.read.parquet(fact_path)
        # the selective predicate sits on a NON-join dim column, so it
        # cannot be statically pushed into the fact scan — pruning the
        # fact's partitions requires the RUNTIME subquery (DPP)
        from pyspark.sql import Row

        dim = spark.createDataFrame(
            [Row(rf="A", grade="keep"), Row(rf="N", grade="drop"),
             Row(rf="R", grade="drop")]
        ).where(F.col("grade") == "keep")
        joined = fact.join(
            F.broadcast(dim), fact["l_returnflag"] == dim["rf"]
        ).groupBy("l_returnflag").agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan
        got = {r.l_returnflag: r.n for r in joined.collect()}
        exact = {
            r.l_returnflag: r.n
            for r in li.where("l_returnflag = 'A'")
            .groupBy("l_returnflag")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == exact
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev
        )
