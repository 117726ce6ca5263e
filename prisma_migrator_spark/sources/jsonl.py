"""JSONL corpus reader with corrupt-line quarantine.

Newline-delimited JSON is the interchange format every LLM-data
pipeline ingests (crawl dumps, distillation outputs, the shards
:mod:`writers.export` itself writes), and at corpus scale some lines
are ALWAYS broken — truncated uploads, encoding damage, half-written
records from a crashed producer. Spark's built-in
``columnNameOfCorruptRecord`` path has a documented trap: a query
that references only the corrupt column forces a cache or a second
read. This reader avoids the trap by parsing explicitly — one
``spark.read.text`` scan, ``from_json`` against the DECLARED schema
(schema inference over 100 TB of JSONL is a full extra pass and
nondeterministic under drift; production readers declare), and a
null-struct test splitting good rows from quarantined lines.

Scale shape: one text scan, map-side parse, zero shuffles; both
returned frames are lazy projections of the same scan. Fault
isolation matches the multimodal decoders (a corrupt payload is
data, never a task failure): bad lines land in a quarantine frame
carrying the raw line + its source file, ready to be written to a
dead-letter path and re-crawled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON under ``path`` against an explicit
    ``schema`` (DDL string, e.g. ``"doc_id bigint, text string"``).

    Returns ``(good, quarantine)``:

    - ``good`` — one row per parseable line, the declared columns.
      A parseable object missing a declared field yields NULL for
      that field (the PERMISSIVE contract); extra undeclared fields
      are ignored (schema evolution on the producer side does not
      break the reader).
    - ``quarantine`` — one row per NON-parseable, non-blank line:
      ``(corrupt_line, source_file)``, the dead-letter frame.

    The split predicate is a corrupt-record field DECLARED INSIDE
    the ``from_json`` struct (PERMISSIVE ``from_json`` yields
    an all-null struct for a broken line — indistinguishable from a
    parseable all-null object — so a bare null-struct test cannot
    split; the in-struct corrupt column is populated exactly for
    non-parseable lines). The field uses a collision-safe name
    (ADVICE r8: a producer object legitimately carrying
    ``_corrupt_record`` must parse as GOOD, not divert to
    quarantine), and a non-blank line whose JSON is the literal
    ``null`` — which parses to a NULL struct with no corrupt marker
    — quarantines too, honoring the 'every non-parseable non-blank
    line quarantines' contract (a JSON ``null`` is not a record).
    Because the corrupt column lives on a parsed expression over a
    text scan, the builtin JSON reader's "referencing only the
    corrupt column requires caching" trap does not apply — both
    frames are lazy projections of one scan."""
    # fixed obscure suffix, not a per-run UUID: plan/text stability
    # matters (--twice), and a real field colliding with this name is
    # astronomically unlikely (documented reserved)
    corrupt = "__corrupt_record_c7e4b2d8a1f04d63"
    parsed_schema = f"{schema}, {corrupt} string"
    lines = spark.read.text(path).select(
        F.col("value"),
        F.input_file_name().alias("source_file"),
    )
    parsed = lines.select(
        "value",
        "source_file",
        F.from_json(
            "value",
            parsed_schema,
            {"columnNameOfCorruptRecord": corrupt},
        ).alias("__j"),
    )
    nonblank = F.length(F.trim("value")) > 0
    # a blank line parses to a NULL struct (its corrupt field is null
    # too) — good rows need a present struct AND a null corrupt field
    good = parsed.where(
        F.col("__j").isNotNull() & F.col(f"__j.{corrupt}").isNull()
    ).select("__j.*").drop(corrupt)
    # quarantine = marked corrupt, OR a non-blank line that parsed to
    # no struct at all (the literal `null` case)
    quarantine = parsed.where(
        (F.col(f"__j.{corrupt}").isNotNull() | F.col("__j").isNull())
        & nonblank
    ).select(
        F.col("value").alias("corrupt_line"),
        "source_file",
    )
    return good, quarantine
