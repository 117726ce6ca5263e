"""Distributed WebDataset tar-shard reader.

`writers/export.write_webdataset_shards` produces the format; this is
the consumption side — the multimodal/training loader path brought
into the engine so a corpus exported as tar shards can be joined,
deduped, and audited WITHOUT a driver-side tarfile loop (the
round-trip test previously read shards on the driver; at a thousand
shards that is the anti-pattern every operator here avoids).

Scale shape: ``spark.read.format("binaryFile")`` gives one row per
``shard-*.tar`` (whole-file, never split — a tar has no Spark-visible
record boundaries), each parsed by the ONE task that owns it inside
an Arrow-batched ``mapInPandas`` — Python is the right layer, this is
source IO against a stdlib container format, the same justification
as the sink side. Parallelism = number of shards, which is exactly
WebDataset's own contract (shards, not samples, are the unit of
distribution); a shard must fit in executor memory, which its writer
guarantees by construction (``samples_per_shard``).

Fault isolation mirrors :mod:`sources.jsonl`: a corrupt tar is DATA,
never a task failure — its entries are skipped and the shard lands in
a quarantine frame (path + error), ready for a dead-letter re-fetch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ENTRY_SCHEMA = (
    "key string, ext string, payload binary, shard string, error string"
)


def read_webdataset(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read ``shard-*.tar`` WebDataset shards under ``path``.

    Returns ``(samples, quarantine)``:

    - ``samples`` — one row per tar member: ``(key, ext, payload,
      shard)``. ``key``/``ext`` split at the FIRST dot of the member
      BASENAME, keeping any directory prefix in the key (the upstream
      webdataset loader's convention, ADVICE r8 — ``123.seg.png`` is
      key ``123``, ext ``seg.png``; ``train/000123.txt`` is key
      ``train/000123``, ext ``txt``, NOT key ``train/000123`` split
      at a dotted directory), so a sample's companion files
      (``.txt`` + ``.json`` from the writer; images/audio in the
      general case) group back together with a plain
      ``groupBy("key")`` even in directory-structured external tars.
    - ``quarantine`` — one row per UNREADABLE shard: ``(shard,
      error)`` — the dead-letter frame; good shards are unaffected.
    """
    import tarfile

    from collections.abc import Iterator

    import pandas as pd

    files = spark.read.format("binaryFile").load(f"{path}/shard-*.tar")

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io

        for pdf in batches:
            rows = []
            for shard, content in zip(pdf["path"], pdf["content"]):
                try:
                    with tarfile.open(
                        fileobj=io.BytesIO(bytes(content))
                    ) as tar:
                        entries = []
                        for m in tar.getmembers():
                            if not m.isfile():
                                continue
                            # split at the basename's first dot; the
                            # directory prefix stays in the key
                            dirname, _, base = m.name.rpartition("/")
                            stem, _, ext = base.partition(".")
                            key = f"{dirname}/{stem}" if dirname else stem
                            entries.append(
                                (key, ext,
                                 tar.extractfile(m).read(), shard, None)
                            )
                except Exception as exc:  # corrupt shard -> quarantine
                    rows.append((None, None, None, shard, repr(exc)))
                    continue
                rows.extend(entries)
            yield pd.DataFrame(
                rows,
                columns=["key", "ext", "payload", "shard", "error"],
            )

    parsed = files.select("path", "content").mapInPandas(
        parse, _ENTRY_SCHEMA
    )
    samples = parsed.where(F.col("error").isNull()).drop("error")
    quarantine = parsed.where(F.col("error").isNotNull()).select(
        "shard", "error"
    )
    return samples, quarantine
