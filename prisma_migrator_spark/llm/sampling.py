"""Deterministic sampling for corpus construction.

``DataFrame.sample`` draws from a per-partition RNG stream, so its
output changes with partitioning, task retries, and AQE re-plans —
unacceptable for a training corpus that must be reproducible from a
recipe. These samplers key every keep/drop decision on a content hash
instead: the same row with the same salt is kept or dropped identically
on every engine, every cluster size, every rerun. Zero shuffle — the
decision is a map-side filter that composes with whatever the plan was
already doing.

The mixture use case (SURVEY §2.13 has no sampling surface; this is
the training-pipeline extension): each domain/source gets a target
keep rate, so the sampled corpus hits a prescribed domain mixture —
the standard "down-weight the crawl, keep all of the books" step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5 prefix of 15 hex digits = 60 bits; dividing by 2^60 gives a
# deterministic uniform in [0, 1) with plenty of resolution.
_UNIT_DENOM = float(1 << 60)


def hash_unit(key: Column, salt: str = "sample") -> Column:
    """Deterministic uniform-[0,1) draw from a key column: the first
    60 bits of md5(salt:key) scaled down. Engine-portable (md5 and
    base-16 parsing agree across Spark/DuckDB/Postgres), so the oracle
    can reproduce draws bit-for-bit."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") / F.lit(
        _UNIT_DENOM
    )


def deterministic_sample(
    df: DataFrame, rate: Column, key_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep each row iff its hash draw falls under ``rate`` (a Column,
    so per-row/per-domain rates work). Expected kept fraction = rate;
    exact membership is a pure function of (key, salt)."""
    return df.where(hash_unit(F.col(key_col), salt) < rate)
