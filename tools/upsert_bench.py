"""Upsert-path benchmark: full rewrite vs file-granularity CoW vs
partition-pruned, on a lineitem-derived keyed table at a chosen SF.

Scenario: an order-keyed table (clustered — the table is written
sorted by key, the natural layout of monotonically appended ids),
split across files sized ~5k rows (file count scales with the base,
32 at sf0.1) / date partitions; a FIXED-SIZE batch (~300 keys,
clustered in one key range / one partition) merges in. The three
paths produce identical table contents; what differs is how much of
the table each one rewrites:

- ``upsert_parquet``       reads + rewrites all N files
- ``upsert_parquet_cow``   rewrites only files whose footer key range
                           intersects the batch (expected: 1-2)
- ``upsert_partitioned``   rewrites only the touched hive partitions

The batch is fixed-size ON PURPOSE (VERDICT r4 item 8): the claim
under test is that CoW/partitioned rewrite cost is proportional to
TOUCHED files/partitions, not base size — so across sf0.1/sf1/sf10
``full_rewrite_s`` should grow ~linearly while ``cow_s`` and
``partitioned_s`` stay ~flat. Run:

    python tools/upsert_bench.py [sf_dir]

prints one JSON line per run; curves recorded in SCALE_r{N}.json /
PERF.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from prisma_migrator_spark.catalog import load_table  # noqa: E402
from prisma_migrator_spark.session import get_spark  # noqa: E402
from prisma_migrator_spark.writers.upsert import (  # noqa: E402
    upsert_parquet,
    upsert_parquet_cow,
    upsert_partitioned,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROWS_PER_FILE = 5_000
BATCH_KEYS = 300


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_DIR
    spark = get_spark("pms-upsert-bench")
    base = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
            F.max("l_shipdate").alias("last_ship"),
        )
        .withColumn("part_month", F.date_format("last_ship", "yyyy-MM"))
    )
    n_rows = base.count()
    n_files = max(32, n_rows // ROWS_PER_FILE)
    # batch: the BATCH_KEYS smallest keys (one narrow key range),
    # values bumped — fixed-size regardless of SF so touched-files
    # stays ~constant while the base grows 10x per decade. The
    # 300-row limit+collect is driver-bounded by construction.
    hi = max(
        r[0]
        for r in base.select("l_orderkey")
        .orderBy("l_orderkey")
        .limit(BATCH_KEYS)
        .collect()
    )
    batch = base.where(F.col("l_orderkey") <= hi).withColumn(
        "total", F.col("total") + 1.0
    )
    n_batch = batch.count()

    work = tempfile.mkdtemp(prefix="pms_upsert_bench_")
    out = {"sf_dir": sf_dir, "rows": n_rows, "batch": n_batch,
           "files": n_files}
    try:
        # flat table, clustered by key, ~5k rows/file
        flat = os.path.join(work, "flat.parquet")
        (
            base.repartitionByRange(n_files, "l_orderkey")
            .sortWithinPartitions("l_orderkey")
            .write.parquet(flat)
        )
        cow = os.path.join(work, "cow.parquet")
        shutil.copytree(flat, cow)
        part = os.path.join(work, "part.parquet")
        base.write.partitionBy("part_month").parquet(part)

        t0 = time.time()
        upsert_parquet(spark, batch, flat, ["l_orderkey"])
        out["full_rewrite_s"] = round(time.time() - t0, 2)

        before = {
            f: os.path.getmtime(os.path.join(cow, f))
            for f in os.listdir(cow)
            if f.endswith(".parquet")
        }
        t0 = time.time()
        upsert_parquet_cow(spark, batch, cow, ["l_orderkey"])
        out["cow_s"] = round(time.time() - t0, 2)
        after = [
            f
            for f in os.listdir(cow)
            if f.endswith(".parquet")
        ]
        untouched = sum(1 for f in after if f in before)
        out["cow_files_total"] = len(after)
        out["cow_files_untouched"] = untouched

        t0 = time.time()
        upsert_partitioned(
            spark, batch, part, ["l_orderkey"], partition_col="part_month"
        )
        out["partitioned_s"] = round(time.time() - t0, 2)

        # all three tables end with identical logical content
        a = spark.read.parquet(flat).select("l_orderkey", "total", "last_ship")
        b = spark.read.parquet(cow).select("l_orderkey", "total", "last_ship")
        c = spark.read.parquet(part).select("l_orderkey", "total", "last_ship")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        assert a.exceptAll(c).count() == 0 and c.exceptAll(a).count() == 0
        out["tables_identical"] = True

        # RANDOM-KEY scenario: the range-pruning worst case. The table
        # is keyed by md5(orderkey) with hash layout, so every file's
        # footer (min, max) spans the whole key space — range-pruned
        # CoW degrades to a full rewrite. A 5-key point batch (the CDC
        # trickle / targeted-fixup shape) then measures the Bloom
        # sidecar fix: expected rewrites ≈ 5 files + fpp, flat across
        # SFs, vs ALL files without sidecars. Build time is reported
        # separately (amortized over every subsequent merge).
        from prisma_migrator_spark.writers.bloom import build_bloom_sidecars

        rnd = base.withColumn(
            "rk", F.md5(F.col("l_orderkey").cast("string"))
        ).select("rk", "total", "last_ship")
        rnd_a = os.path.join(work, "rnd_a.parquet")
        rnd.repartition(n_files).write.parquet(rnd_a)
        rnd_b = os.path.join(work, "rnd_b.parquet")
        shutil.copytree(rnd_a, rnd_b)

        # 5 keys scattered across the md5 space (md5 of 5 arbitrary
        # orderkeys) — NOT the 5 smallest rk values: extreme-tail keys
        # fall below most files' footer min and range pruning would
        # accidentally engage, hiding the worst case under test
        keys5 = [
            r[0]
            for r in base.orderBy("l_orderkey")
            .limit(5)
            .select(F.md5(F.col("l_orderkey").cast("string")).alias("rk"))
            .collect()
        ]
        batch5 = rnd.where(F.col("rk").isin(keys5)).withColumn(
            "total", F.col("total") + 1.0
        )

        t0 = time.time()
        rep = upsert_parquet_cow(spark, batch5, rnd_a, ["rk"])
        out["cow_random_s"] = round(time.time() - t0, 2)
        out["cow_random_rewritten"] = rep["files_rewritten"]

        t0 = time.time()
        build_bloom_sidecars(spark, rnd_b, "rk", fpp=0.001)
        out["bloom_build_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        rep = upsert_parquet_cow(spark, batch5, rnd_b, ["rk"], bloom=True)
        out["cow_random_bloom_s"] = round(time.time() - t0, 2)
        out["cow_random_bloom_rewritten"] = rep["files_rewritten"]
        out["cow_random_files_total"] = rep["files_total"]

        ra = spark.read.parquet(rnd_a)
        rb = spark.read.parquet(rnd_b)
        assert ra.exceptAll(rb).count() == 0 and rb.exceptAll(ra).count() == 0
        out["random_tables_identical"] = True
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
