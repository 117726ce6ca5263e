"""JDBC source/sink helpers (SURVEY §2.1 S1-S4 at 100 TB).

The reference's actual deployment target is Postgres-to-Postgres
(src/migrate.ts:32-36, src/utils/lib.ts:10-14). This module carries
the JDBC half of the engine: partitioned scans with automatic bound
discovery and a catalog listing via ``information_schema``.

No database is available in the test container, so these are
covered by construction-only tests (options dict assembly); the
parquet backend exercises the same downstream operators.

Scale notes:
- A JDBC scan WITHOUT partitioning options is a single-task read —
  the distributed equivalent of the reference's whole-table
  ``findMany()`` (migrate.ts:48). ``partitioned_jdbc_reader`` probes
  min/max of the partition column first and fans the scan out over
  ``num_partitions`` range predicates, so each executor pulls its own
  slice.
- Writes go through ``foreachPartition``-style batched inserts that
  the JDBC writer already implements (``batchsize``); upsert semantics
  use the anti-join writer (writers/upsert.py) on file backends, or
  the staging table + server-side ``INSERT ... ON CONFLICT`` sink in
  writers/jdbc_sink.py (tested against embedded DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    **extra: str,
) -> dict[str, str]:
    opts = {"url": url, "dbtable": table}
    if user:
        opts["user"] = user
    if password:
        opts["password"] = password
    opts.update(extra)
    return opts


def partition_bounds_query(table: str, column: str) -> str:
    """The min/max probe used to derive scan bounds (one tiny query,
    like an index-only scan server-side)."""
    return (
        f"(SELECT MIN({column}) AS lo, MAX({column}) AS hi FROM {table}) AS b"
    )


def partitioned_scan_options(
    url: str,
    table: str,
    partition_column: str,
    lower: int,
    upper: int,
    num_partitions: int = 32,
    fetchsize: int = 10_000,
    **extra: str,
) -> dict[str, str]:
    """Options for a fanned-out JDBC scan: ``num_partitions`` range
    predicates over ``partition_column``."""
    return jdbc_options(
        url,
        table,
        partitionColumn=partition_column,
        lowerBound=str(lower),
        upperBound=str(upper),
        numPartitions=str(num_partitions),
        fetchsize=str(fetchsize),
        **extra,
    )


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    num_partitions: int = 32,
    **extra: str,
) -> DataFrame:
    """Probe bounds, then scan partitioned. Requires a reachable DB."""
    bounds = (
        spark.read.format("jdbc")
        .options(**jdbc_options(url, partition_bounds_query(table, partition_column), **extra))
        .load()
        .first()
    )
    return (
        spark.read.format("jdbc")
        .options(
            **partitioned_scan_options(
                url,
                table,
                partition_column,
                int(bounds["lo"]),
                int(bounds["hi"]) + 1,
                num_partitions,
                **extra,
            )
        )
        .load()
    )


LIST_TABLES_SQL = (
    "(SELECT table_name FROM information_schema.tables "
    "WHERE table_schema = 'public') AS t"
)
