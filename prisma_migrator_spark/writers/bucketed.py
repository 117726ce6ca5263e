"""Bucketed table layout — co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling
both sides. Bucketing is the storage-level fix: write each table
hash-partitioned into N buckets on the join key (optionally sorted
within buckets); any later join/aggregation on that key reads the
buckets directly — the exchanges (and with sorted buckets, the sorts)
disappear from every downstream plan that uses the key. The write
pays the shuffle ONCE; every subsequent query skips it.

This is the Spark-native analog of the reference's implicit reliance
on Postgres indexes/clustering for its repeated per-key scans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    managed parquet table. ``num_buckets`` should be sized so one
    bucket of the larger table fits an executor's memory at the
    target scale; both sides of a co-located join must use the same
    bucket count and columns."""
    # One task (and therefore one file) per bucket: without this,
    # every input partition writes its own file into every bucket —
    # P×N small files — and Spark only trusts bucket-local sort order
    # (eliding the join-side Sort) when a bucket is a single file.
    df = df.repartition(num_buckets, *bucket_cols)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
