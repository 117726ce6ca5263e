"""Catalog / source layer.

Mirrors the reference's schema-generic behavior (`getModels` +
per-model scans, reference src/migrate.ts:27-30,48): enumerate tables
dynamically, read each with its own schema preserved. For the test
fixtures the catalog is a directory of Parquet files; the JDBC variant
lives in :mod:`prisma_migrator_spark.sources.jdbc`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: The driver-generated fixture tables (TESTDATA.md).
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def list_tables(sf_dir: str) -> list[str]:
    """Enumerate tables in a parquet directory (catalog introspection,
    reference src/migrate.ts:27-30 analog)."""
    return sorted(
        f[: -len(".parquet")]
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Full-table scan of one fixture table (reference src/migrate.ts:48
    analog — but partitioned/columnar, never driver-materialized).

    ``events.ts`` is written as Parquet TIMESTAMP(NANOS), which Spark 4
    rejects outright; we read it as raw nanos
    (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild a proper
    TimestampType at microsecond precision — the same floor-truncation
    DuckDB applies, so both engines see identical values.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            # integer DIV, not `/`: epoch-nanos exceed double precision
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view so ``spark.sql`` works over
    the same names the DuckDB oracle sees."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
