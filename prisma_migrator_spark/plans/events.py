"""Event-time window queries over the ``events`` table (extensions).

Window bounds are emitted as epoch microseconds (bigint) — engine-
neutral, hash-stable. DuckDB oracles reconstruct the same windows
with ``time_bucket`` / lag-based sessionization, proving the Spark
window semantics rather than restating them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prisma_migrator_spark.catalog import load_table
from prisma_migrator_spark.plans.registry import query
from prisma_migrator_spark.streaming.windows import (
    session_windows,
    sliding_windows,
    tumbling_windows,
)

_TUMBLING_ORACLE = """
SELECT EPOCH_US(time_bucket(INTERVAL '1 hour', ts)) AS window_start_us,
       EPOCH_US(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour') AS window_end_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS total_value
FROM events
GROUP BY 1, 2, 3
"""


@query("events_tumbling_hourly", oracle=_TUMBLING_ORACLE)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = tumbling_windows(
        ev,
        "ts",
        "1 hour",
        keys=["event_type"],
        aggs=[
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        ],
    )
    return out.select(
        F.unix_micros("w.start").alias("window_start_us"),
        F.unix_micros("w.end").alias("window_end_us"),
        "event_type",
        "n_events",
        "total_value",
    )


# Sliding 1h/30m: every event belongs to exactly 2 windows — the
# 30-minute bucket it falls in and the one 30 minutes earlier.
_SLIDING_ORACLE = """
WITH starts AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS w_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value
  FROM events
)
SELECT EPOCH_US(w_start) AS window_start_us,
       EPOCH_US(w_start + INTERVAL '1 hour') AS window_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS total_value
FROM starts
GROUP BY 1, 2
"""


@query("events_sliding_1h_30m", oracle=_SLIDING_ORACLE)
def events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = sliding_windows(
        ev,
        "ts",
        "1 hour",
        "30 minutes",
        aggs=[
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        ],
    )
    return out.select(
        F.unix_micros("w.start").alias("window_start_us"),
        F.unix_micros("w.end").alias("window_end_us"),
        "n_events",
        "total_value",
    )


# Session windows (30 min gap per user). Spark's session end = last
# event + gap; the oracle reproduces that with lag + cumulative sum.
_SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       EPOCH_US(MIN(ts)) AS session_start_us,
       EPOCH_US(MAX(ts) + INTERVAL '30 minutes') AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS total_value
FROM numbered
GROUP BY user_id, session_id
"""


@query("events_session_30m", oracle=_SESSION_ORACLE)
def events_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = session_windows(
        ev,
        "ts",
        "30 minutes",
        keys=["user_id"],
        aggs=[
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        ],
    )
    return out.select(
        "user_id",
        F.unix_micros("w.start").alias("session_start_us"),
        F.unix_micros("w.end").alias("session_end_us"),
        "n_events",
        "total_value",
    )


_JSON_PROPS_ORACLE = r"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS k_max
FROM events
WHERE CAST(json_extract(props, '$.k') AS INT) IS NOT NULL
GROUP BY event_type
"""


@query("events_json_props", oracle=_JSON_PROPS_ORACLE)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured read path: parse the JSON ``props`` column with
    ``from_json`` into a typed struct, then aggregate the extracted
    field. The reference only ever *writes* JSON (SURVEY §2.1 S8);
    reading it back with schema projection is the Spark-native
    completion of that surface — `from_json` is codegen'd JVM-side,
    and at scale the parse happens once per row in the scan stage, no
    shuffle before the aggregate's partial phase."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    ev = load_table(spark, sf_dir, "events")
    schema = StructType([StructField("k", IntegerType())])
    parsed = ev.select(
        "event_type", F.from_json("props", schema).getField("k").alias("k")
    )
    return (
        parsed.where(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").cast("bigint").alias("k_sum"),
            F.max("k").cast("int").alias("k_max"),
        )
    )


# --- as-of join (operator Spark lacks; DuckDB has it natively) ---------

_ASOF_ORACLE = """
WITH rd AS (
  SELECT o_custkey, o_orderdate, o_totalprice FROM (
    SELECT o_custkey, o_orderdate, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders) t
  WHERE rn = 1
)
SELECT e.event_id, e.user_id,
       STRFTIME(rd.o_orderdate, '%Y-%m-%d') AS last_order_date,
       ROUND(rd.o_totalprice, 2) AS last_order_total
FROM events e
ASOF LEFT JOIN rd ON e.user_id = rd.o_custkey AND e.ts >= rd.o_orderdate
"""


@query("asof_last_order", oracle=_ASOF_ORACLE)
def asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event picks up the user's most recent
    order at-or-before the event time. Verified against DuckDB's
    native ASOF JOIN; see operators/joins.asof_join for the
    merge-sorted single-shuffle implementation."""
    from prisma_migrator_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        F.col("o_orderdate").alias("last_order_ts"),
        "o_totalprice",
        "o_orderkey",
    )
    out = asof_join(
        ev,
        orders,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["last_order_ts", "o_totalprice", "o_orderkey"],
        right_tiebreakers=["o_orderkey"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("last_order_ts", "yyyy-MM-dd").alias("last_order_date"),
        F.round("o_totalprice", 2).alias("last_order_total"),
    )


_ROLLING_1H_ORACLE = """
SELECT event_id, user_id,
       EPOCH_US(ts) AS ts_us,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       ROUND(SUM(value) OVER w, 6) AS sum_value_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


@query("events_rolling_1h", oracle=_ROLLING_1H_ORACLE)
def events_rolling_1h_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1h count and value sum per user — the
    event-TIME rolling window (RANGE frame on epoch micros, not a
    row-count frame), e.g. rate limiting or activity features. One
    shuffle on user_id; the range frame slides per partition without
    re-scanning. Tie-robust: RANGE includes peers with equal ts on
    both engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        us.alias("ts_us"),
        F.count("*").over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 6).alias("sum_value_1h"),
    )


_HOPPING_ORACLE = """
WITH starts AS (
  SELECT e.event_type, e.value,
         (EPOCH_US(e.ts) // 900000000 - g.i) * 900000000 AS window_start_us
  FROM events e, LATERAL UNNEST(range(4)) AS g(i)
  WHERE (EPOCH_US(e.ts) // 900000000 - g.i) * 900000000
        > EPOCH_US(e.ts) - 3600000000
)
SELECT window_start_us,
       window_start_us + 3600000000 AS window_end_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS total_value
FROM starts
GROUP BY 1, 2, 3
"""


@query("events_hopping_1h_15m", oracle=_HOPPING_ORACLE)
def events_hopping_1h_15m_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window: 1-hour windows every 15 minutes —
    each event replicates into window/hop = 4 rows map-side (Spark's
    Expand, same cost model as ROLLUP), then ONE hash aggregate. The
    oracle reproduces the window assignment with integer epoch
    arithmetic; window membership: start in (ts - 1h, ts]."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "15 minutes")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            F.unix_micros("w.end").alias("window_end_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --- bucketized interval join: busy-window attribution ----------------

_BUSY_WINDOW_ORACLE = """
WITH hours AS (
  SELECT event_type, EPOCH_US(time_bucket(INTERVAL '1 hour', ts)) AS hour_us,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
), top3 AS (
  SELECT event_type, hour_us,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY n DESC, hour_us ASC) AS rn
  FROM hours
), win AS (
  SELECT event_type, hour_us - 3600000000 AS start_us,
         hour_us + 7200000000 AS end_us
  FROM top3 WHERE rn <= 3
)
SELECT w.event_type, w.start_us AS window_start_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(e.value), 6) AS total_value
FROM win w JOIN events e
  ON e.event_type = w.event_type
 AND EPOCH_US(e.ts) >= w.start_us AND EPOCH_US(e.ts) < w.end_us
GROUP BY 1, 2
"""

_HOUR_US = 3_600_000_000


@query("busy_window_events", oracle=_BUSY_WINDOW_ORACLE)
def busy_window_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute events to each type's 3 busiest hours, widened to
    [hour-1h, hour+2h) — overlapping 3-hour windows, so this is a
    genuine point-in-interval join (an event can land in up to 3
    windows), not a bucketing groupBy.

    Exercises ``bucketed_interval_join``: the time axis itself becomes
    a join key (points keyed by their hour bucket, intervals exploded
    over the ≤3 buckets they overlap), so the join stays a hash equi
    join with a residual range filter even though event_type alone
    (4 values) could never partition the work at scale. Windows
    derive from the same events frame via the ranked top-k-per-group
    operator with deterministic tie-breaks."""
    from prisma_migrator_spark.operators.joins import bucketed_interval_join
    from prisma_migrator_spark.operators.ranking import topk_per_group

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("us"), "value"
    )
    hours = ev.groupBy(
        "event_type",
        (F.floor(F.col("us") / _HOUR_US) * _HOUR_US).alias("hour_us"),
    ).agg(F.count(F.lit(1)).alias("n"))
    win = topk_per_group(
        hours, ["event_type"], "n", k=3, tiebreakers=["hour_us"]
    ).select(
        "event_type",
        (F.col("hour_us") - _HOUR_US).alias("start_us"),
        (F.col("hour_us") + 2 * _HOUR_US).alias("end_us"),
    )
    joined = bucketed_interval_join(
        ev,
        win,
        "us",
        "start_us",
        "end_us",
        on=["event_type"],
        bucket_width=_HOUR_US,
    )
    return (
        joined.groupBy("event_type", "start_us")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "event_type",
            F.col("start_us").alias("window_start_us"),
            "n_events",
            "total_value",
        )
    )


# --- burst dedup (telemetry de-bounce) --------------------------------

_BURST_DEDUP_ORACLE = """
WITH flagged AS (
  SELECT event_id, user_id, event_type, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 15 MINUTE
              THEN 1 ELSE 0 END AS newf
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
)
SELECT event_id, user_id, event_type,
       EPOCH_US(ts) AS ts_us, ROUND(value, 6) AS value
FROM flagged WHERE newf = 1
"""


@query("event_burst_dedup", oracle=_BURST_DEDUP_ORACLE)
def event_burst_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry de-bounce: collapse bursts of the same (user, type)
    arriving within 15 min of the previous kept-or-dropped event to
    their FIRST occurrence — double-clicks, retry storms, duplicate
    beacons. (Real telemetry uses seconds; the fixture's event times
    are minutes apart, so the tolerance is 15 min to keep the query
    non-vacuous — 40 events collapse at sf0.01.) Gaps-and-islands with a chain-tolerant twist: an event
    is kept iff the gap to its immediate PREDECESSOR exceeds the
    tolerance (so a long burst collapses to one row even if it spans
    more than the tolerance end-to-end). One (user, type)-keyed shuffle; the
    lag and the filter are map-side within each key partition."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    return (
        ev.withColumn(
            "__new",
            F.when(gap_us.isNull() | (gap_us > 900_000_000), 1).otherwise(0),
        )
        .where(F.col("__new") == 1)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
            F.round("value", 6).alias("value"),
        )
    )
