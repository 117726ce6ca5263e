"""Driver-gated round-trips for the distributed shard readers.

VERDICT r8 item 2: the three training-shard readers (JSONL with
corrupt-line quarantine, WebDataset tar, Arrow IPC) were the only
operator family with zero CORRECTNESS visibility — pytest-verified
only, so a reader regression would never appear in a driver row.
These queries close that: each one synthesizes shards
DETERMINISTICALLY from the ``documents`` table using the existing
writers (`writers/export`), injects a fixed damage recipe, reads the
shards back through the reader under test, and returns per-bucket
content aggregates whose oracle is derived ANALYTICALLY from the
synthesis recipe — the `url_canonicalize` discipline: DuckDB never
sees the shards, it predicts what a correct write→damage→read cycle
must yield straight from ``documents`` plus the injected literals.

All three share one output shape, ``(bucket, n_rows, id_sum,
char_sum)``: row counts catch lost/duplicated records, the id sum
catches substituted ids, the character sum catches payload
truncation/corruption, and the quarantine bucket pins the
fault-isolation contract (bad input is DATA, never a task failure,
and never leaks into the good frame).

Scale note: the writers and readers under test are the audited
distributed forms (hash shard assignment, one task per shard,
map-side parse); the gate merely drives them end-to-end at gate SF.
Shards land under /tmp keyed by sf tag; every run rewrites them
(the writers are atomic-swap + byte-stable), so back-to-back runs
(--twice) are identical by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prisma_migrator_spark.catalog import load_table
from prisma_migrator_spark.plans.registry import query

_SUMMARY_SCHEMA = ("bucket", "n_rows", "id_sum", "char_sum")


def _ingest_dir(kind: str, sf_dir: str) -> str:
    """Deterministic per-(reader, sf) scratch root: stable across the
    build→collect gap (the driver collects AFTER the query function
    returns, so tempfile-per-call would race the cleanup) and across
    --twice reruns (same path, atomic overwrite)."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    base = f"/tmp/pm_spark_ingest/{kind}_{tag}"
    os.makedirs(base, exist_ok=True)
    return base


def _summary(df: DataFrame, bucket: str, id_col, char_col) -> DataFrame:
    """(bucket, n_rows, id_sum, char_sum) over one frame."""
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.coalesce(F.sum(id_col), F.lit(0)).cast("bigint").alias("id_sum"),
        F.coalesce(F.sum(char_col), F.lit(0))
        .cast("bigint")
        .alias("char_sum"),
    ).select(F.lit(bucket).alias("bucket"), *_SUMMARY_SCHEMA[1:])


# --- JSONL ------------------------------------------------------------------

# The fixed damage recipe, injected verbatim into shard_id=0 after
# every export. The oracle derives its constants from these literals.
_JL_TRUNCATED = '{"doc_id": -1, "text": "tru'
_JL_JUNK = "not json at all"
_JL_NULL = "null"
_JL_EVOLVED = '{"doc_id": -2, "text": "evolved", "extra_col": 1}'
_JL_EVOLVED_TEXT = "evolved"
_JL_QUAR_CHARS = len(_JL_TRUNCATED) + len(_JL_JUNK) + len(_JL_NULL)

_JSONL_INGEST_ORACLE = f"""
SELECT 'good' AS bucket,
       CAST(COUNT(*) + 1 AS BIGINT) AS n_rows,
       CAST(SUM(doc_id) - 2 AS BIGINT) AS id_sum,
       CAST(COALESCE(SUM(LENGTH(text)), 0)
            + {len(_JL_EVOLVED_TEXT)} AS BIGINT) AS char_sum
FROM documents
UNION ALL
SELECT 'quarantine', 3, 0, {_JL_QUAR_CHARS}
"""


@query("jsonl_shard_ingest", oracle=_JSONL_INGEST_ORACLE)
def jsonl_shard_ingest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL shard round-trip gate: export ``documents`` as
    token-sized JSONL shards (`write_jsonl_shards`), inject the fixed
    damage recipe (a truncated object, a junk line, a literal
    ``null``, a blank line, and a schema-evolved extra object), read
    everything back through `sources.jsonl.read_jsonl`, and summarize
    both frames. The oracle predicts the summary analytically: good =
    every document plus the evolved object (ids and text chars shift
    by its literals), quarantine = exactly the three non-parseable
    non-blank lines with their literal character count — so a reader
    that drops the null literal, quarantines a parseable line, loses
    a shard, or truncates a payload mismatches on some column.

    Plan shape: the writer is one shuffle (shard assignment) + the
    JSON text sink; the reader is one text scan with a map-side
    from_json split; the summary is two scalar aggregates unioned."""
    from prisma_migrator_spark.llm.text import token_count
    from prisma_migrator_spark.sources.jsonl import read_jsonl
    from prisma_migrator_spark.writers.export import write_jsonl_shards

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", token_count(F.col("text")).alias("n_tokens")
    )
    base = _ingest_dir("jsonl", sf_dir)
    write_jsonl_shards(docs, base, tokens_per_shard=50_000)
    shard0 = os.path.join(base, "shard_id=0")
    os.makedirs(shard0, exist_ok=True)
    with open(os.path.join(shard0, "zzz_damage.json"), "w") as f:
        f.write(
            f"{_JL_TRUNCATED}\n{_JL_JUNK}\n{_JL_NULL}\n\n{_JL_EVOLVED}\n"
        )
    good, bad = read_jsonl(
        spark, base, "doc_id bigint, text string, n_tokens int"
    )
    return _summary(good, "good", "doc_id", F.length("text")).unionByName(
        _summary(bad, "quarantine", F.lit(0), F.length("corrupt_line"))
    )


# --- WebDataset tar ---------------------------------------------------------

_WDS_INGEST_ORACLE = """
SELECT 'txt' AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       CAST(COALESCE(SUM(LENGTH(COALESCE(text, ''))), 0) AS BIGINT)
         AS char_sum
FROM documents
UNION ALL
SELECT 'json', CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT),
       CAST(2 * COUNT(*) AS BIGINT)
FROM documents
UNION ALL
SELECT 'quarantine', 1, 0, 0
"""


@query("webdataset_shard_ingest", oracle=_WDS_INGEST_ORACLE)
def webdataset_shard_ingest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset tar round-trip gate: export ``documents`` as tar
    shards (`write_webdataset_shards` — one ``{doc_id}.txt`` payload
    plus one ``{doc_id}.json`` companion per sample), drop a junk
    non-tar shard next to them, read back through
    `sources.webdataset.read_webdataset`, and summarize per
    extension. The oracle predicts both member families straight from
    ``documents``: every doc yields one txt member whose payload
    character count is its (null-coalesced) text length and one
    2-character ``{}`` json companion, keys parse back to the doc
    ids, and exactly the one junk shard quarantines. Key/ext
    splitting bugs, lost members, payload truncation, or a quarantine
    leak each break a different column.

    Plan shape: writer = hash shard assignment + one owning task per
    tar (applyInPandas sink IO); reader = binaryFile scan + map-side
    tar parse; summary = one (ext) aggregate + a scalar union."""
    from prisma_migrator_spark.sources.webdataset import read_webdataset
    from prisma_migrator_spark.writers.export import (
        write_webdataset_shards,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = _ingest_dir("wds", sf_dir)
    write_webdataset_shards(docs, base, samples_per_shard=200)
    with open(os.path.join(base, "shard-99999.tar"), "wb") as f:
        f.write(b"definitely not a tar archive")
    samples, bad = read_webdataset(spark, base)
    per_ext = (
        samples.groupBy(F.col("ext").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("key").cast("bigint"))
            .cast("bigint")
            .alias("id_sum"),
            F.sum(F.length(F.decode("payload", "utf-8")))
            .cast("bigint")
            .alias("char_sum"),
        )
    )
    return per_ext.unionByName(
        _summary(bad, "quarantine", F.lit(0), F.lit(0))
    )


# --- Arrow IPC --------------------------------------------------------------

_ARROW_INGEST_ORACLE = """
SELECT COALESCE(lang, '<null>') AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       CAST(COALESCE(SUM(LENGTH(text)), 0) AS BIGINT) AS char_sum
FROM documents
GROUP BY 1
UNION ALL
SELECT 'quarantine', 1, 0, 0
"""


@query("arrow_shard_ingest", oracle=_ARROW_INGEST_ORACLE)
def arrow_shard_ingest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow IPC (Feather v2) shard round-trip gate: export
    ``documents`` as uncompressed Arrow shards
    (`write_arrow_shards`), drop a junk non-Arrow shard next to them,
    read back through `sources.arrow_shards.read_arrow_shards`
    against the declared DDL, and summarize per language. The
    per-lang grouping makes the check column-sensitive: a reader that
    scrambles column order, loses a shard's rows, or corrupts the
    text payload mismatches some (lang, count, id-sum, char-sum) row;
    the junk shard must land in quarantine alone.

    Plan shape: writer = hash shard assignment + one owning task per
    Feather file; reader = binaryFile scan + Arrow-to-Arrow
    mapInPandas (no text parse); summary = one (lang) aggregate plus
    a scalar union."""
    from prisma_migrator_spark.sources.arrow_shards import (
        read_arrow_shards,
    )
    from prisma_migrator_spark.writers.export import write_arrow_shards

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    base = _ingest_dir("arrow", sf_dir)
    write_arrow_shards(docs, base, samples_per_shard=200)
    with open(os.path.join(base, "shard-99999.arrow"), "wb") as f:
        f.write(b"not an arrow file")
    rows, bad = read_arrow_shards(
        spark,
        base,
        "doc_id bigint, text string, lang string, source string",
    )
    per_lang = (
        rows.groupBy(
            F.coalesce("lang", F.lit("<null>")).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
            F.coalesce(F.sum(F.length("text")), F.lit(0))
            .cast("bigint")
            .alias("char_sum"),
        )
    )
    return per_lang.unionByName(
        _summary(bad, "quarantine", F.lit(0), F.lit(0))
    )
