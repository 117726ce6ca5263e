"""Training-data export sinks: JSONL shards.

The reference's only export surface is CSV spreadsheets
(`src/utils/lib.ts:498-554` — re-expressed in sources/csv_report.py).
A training pipeline's handoff format is newline-delimited JSON in
size-balanced shard files (what tokenizer workers and dataloaders
address); this module is that sink, built on the shard-assignment
prefix sum of :mod:`llm.packing`.

Scale shape: shard assignment is the two-level distributed prefix sum
(serial section O(n_buckets)); the write itself is
``partitionBy("shard_id")`` so each shard is produced by the tasks
that own its rows — no global sort, no driver involvement. One
repartition on shard_id keeps it to one file per shard (atomic unit
a dataloader maps); drop it if many small files per shard are fine.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    tokens_per_shard: int,
    len_col: str = "n_tokens",
    order_col: str = "doc_id",
) -> int:
    """Write ``df`` as JSONL shard directories of ~``tokens_per_shard``
    tokens each (documents never split across shards; deterministic
    ``order_col`` order defines shard membership, so re-exports are
    byte-stable given the same input). Returns the shard count.

    Layout: ``path/shard_id=N/part-*.json`` — one JSON object per
    line, Spark's native JSON text sink (hive-partitioned so a loader
    globs one shard without listing the rest).
    """
    from prisma_migrator_spark.llm.packing import assign_shards

    sharded = assign_shards(
        df, tokens_per_shard, len_col=len_col, order_col=order_col
    ).drop("start_off")
    (
        sharded.repartition(F.col("shard_id"))
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .json(path)
    )
    return df.sparkSession.read.json(path).select("shard_id").distinct().count()


def write_jsonl_sized(
    df: DataFrame,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Write ``df`` as JSONL split into files of ~``target_bytes``
    serialized size, for frames without a token-length column: one
    estimation pass sums the exact serialized row sizes (JVM-side
    ``octet_length(to_json(...))``), then a round-robin repartition to
    the file count. Returns the file count.

    Unlike :func:`write_jsonl_shards` this makes no ordering promise —
    it is the generic "give me N-byte JSONL files" exporter.
    """
    row_json = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    total = df.agg(
        F.sum(F.octet_length(row_json) + F.lit(1)).alias("b")
    ).collect()[0]["b"]
    n_files = max(1, math.ceil((total or 0) / target_bytes))
    df.repartition(n_files).write.mode("overwrite").json(path)
    return n_files
