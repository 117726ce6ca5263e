"""Distributed Arrow IPC (Feather v2) shard reader.

Consumption side of `writers/export.write_arrow_shards` (whose
round-trip was previously verified with a driver-side pyarrow loop).
Spark has no native Arrow IPC source, so the reader follows the same
shape as :mod:`sources.webdataset`: ``binaryFile`` gives one row per
``shard-*.arrow`` (one task per shard — the format's unit of
distribution), and an Arrow-batched ``mapInPandas`` opens each shard
with pyarrow and yields its record batch as pandas — Arrow to Arrow,
no text parse anywhere on the path.

Fault isolation matches the other readers: an unreadable shard is
DATA — it lands in a quarantine frame (path + error), never a task
failure, and good shards are unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_arrow_shards(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read ``shard-*.arrow`` Feather-v2 shards under ``path``
    against an explicit DDL ``schema`` (the columns the shards were
    written with, e.g. ``"doc_id bigint, text string"``).

    Returns ``(rows, quarantine)``: one row per stored record with
    a ``shard`` provenance column appended, and one ``(shard,
    error)`` row per unreadable shard."""
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql.types import StructType

    files = spark.read.format("binaryFile").load(f"{path}/shard-*.arrow")
    out_schema = f"{schema}, shard string, error string"
    # ADVICE r8: fromDDL, not schema.split(',') — a parameterized or
    # nested type (decimal(10,2), map<string,int>) contains commas
    cols = StructType.fromDDL(schema).fieldNames()

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io

        import pyarrow.feather as feather

        for pdf in batches:
            for shard, content in zip(pdf["path"], pdf["content"]):
                try:
                    table = feather.read_table(io.BytesIO(bytes(content)))
                except Exception as exc:
                    yield pd.DataFrame(
                        [{**{c: None for c in cols},
                          "shard": shard, "error": repr(exc)}]
                    )
                    continue
                # OUTSIDE the quarantine try (ADVICE r8): a READABLE
                # shard missing a declared column is a schema/config
                # error on the reader side — quarantining it would
                # silently divert the whole corpus on a typo'd column
                # name. Fail the job instead.
                missing = [c for c in cols if c not in table.column_names]
                if missing:
                    raise ValueError(
                        f"declared column(s) {missing} absent from "
                        f"readable shard {shard} (has "
                        f"{table.column_names}): reader schema/config "
                        "error, not data corruption"
                    )
                body = table.select(cols).to_pandas()
                body["shard"] = shard
                body["error"] = None
                yield body

    parsed = files.select("path", "content").mapInPandas(parse, out_schema)
    rows = parsed.where(F.col("error").isNull()).drop("error")
    quarantine = parsed.where(F.col("error").isNotNull()).select(
        "shard", "error"
    )
    return rows, quarantine
