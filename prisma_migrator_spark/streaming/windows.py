"""Event-time windows — batch and streaming forms (SURVEY §2.9, §7.2 M5).

The reference has no streaming operators; its closest analog is the
append-only ``capturedAt`` snapshot log processed in batch (SURVEY
§2.9). These extensions give the engine proper event-time semantics
over such logs using Spark's native window functions:

- tumbling / sliding: ``F.window(ts, size[, slide])`` — pure
  event-time bucketing, runs identically over a batch DataFrame or a
  stream;
- session: ``F.session_window(ts, gap)`` — gap-based sessionization,
  the stateful-streaming shape, also usable in batch.

The same functions accept a streaming DataFrame: add
``withWatermark`` upstream (see :mod:`stream_jobs`) and the plan
becomes an incremental stateful aggregation with late-data handling —
that is the point of expressing these with the built-in window
operators rather than hand-rolled bucketing.

Scale: one shuffle on (window, keys); partial aggregation applies.
Session windows shuffle on the session keys then merge adjacent
intervals per key — Spark's ``session_window`` implementation, not a
driver-side loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_windows(
    df: DataFrame,
    ts_col: str,
    size: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Non-overlapping event-time buckets of ``size`` (e.g. '1 hour')."""
    aggs = list(aggs) if aggs else [F.count("*").alias("n_events")]
    return df.groupBy(F.window(ts_col, size).alias("w"), *keys).agg(*aggs)


def sliding_windows(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Overlapping buckets: each event lands in size/slide windows."""
    aggs = list(aggs) if aggs else [F.count("*").alias("n_events")]
    return df.groupBy(F.window(ts_col, size, slide).alias("w"), *keys).agg(*aggs)


def session_windows(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Gap-based sessions per key: a session spans events whose
    inter-arrival time is < ``gap``; window end = last event + gap."""
    aggs = list(aggs) if aggs else [F.count("*").alias("n_events")]
    return df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys).agg(*aggs)
