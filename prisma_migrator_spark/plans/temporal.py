"""Temporal / snapshot-history operators.

The reference's core data model is append-only snapshot history —
``AppSnapshot (handle, capturedAt)``, ``CategoryAppPositionHistory
(categoryHandle, appHandle, capturedAt)`` (src/utils/lib.ts:220,
267-274) — but the only temporal READ it ever performs is
latest-per-key (``DISTINCT ON … ORDER BY capturedAt DESC``,
src/utils/lib.ts:303,313). A user who owns that history wants the
rest of the temporal toolkit: validity intervals (SCD Type 2),
change detection between consecutive captures, point-in-time
("as of") reconstruction, and time-bucketed downsampling. Each is
expressed here over the lineitem fixture's (l_partkey, l_shipdate)
history, per FIXTURES.md §C.

Scale stance: every window below is PARTITIONED by its key (never a
global ORDER BY); groupBy shapes rely on partial aggregation. All
shuffles are on the history's natural key, so at 100 TB each query
is one key-hash shuffle of pruned columns.

Hash-stability conventions follow plans/core.py: ROUND(x, 6) on
computed doubles, timestamps as epoch micros, explicit tiebreakers
under every window order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prisma_migrator_spark.catalog import load_table
from prisma_migrator_spark.operators.dedup import latest_per_key
from prisma_migrator_spark.plans.registry import query

# --- SCD Type 2: snapshot rows -> validity intervals -------------------

_SCD2_ORACLE = """
SELECT l_partkey,
       EPOCH_US(l_shipdate) AS valid_from_us,
       LEAD(EPOCH_US(l_shipdate)) OVER w AS valid_to_us,
       CASE WHEN LEAD(l_shipdate) OVER w IS NULL THEN TRUE ELSE FALSE
            END AS is_current,
       ROUND(l_extendedprice, 2) AS price
FROM lineitem
WINDOW w AS (PARTITION BY l_partkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber)
"""


@query("scd2_part_history", oracle=_SCD2_ORACLE)
def scd2_part_history_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 intervals from an append-only
    snapshot log: each capture becomes a row with
    ``[valid_from, valid_to)`` and the open (current) interval gets
    ``valid_to = NULL`` — the standard warehouse materialization of
    the reference's AppSnapshot history (src/utils/lib.ts:220).

    Plan: one shuffle on the key; ``lead()`` runs inside each key
    partition (bounded by snapshots-per-key, never corpus-sized).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    nxt = F.lead("l_shipdate").over(w)
    return li.select(
        "l_partkey",
        F.unix_micros("l_shipdate").alias("valid_from_us"),
        F.unix_micros(nxt).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
        F.round("l_extendedprice", 2).alias("price"),
    )


# --- change detection between consecutive captures ---------------------

_CHANGES_ORACLE = """
SELECT l_partkey,
       EPOCH_US(l_shipdate) AS ts_us,
       ROUND(prev_price, 2) AS old_price,
       ROUND(l_extendedprice, 2) AS new_price,
       ROUND(l_extendedprice - prev_price, 2) AS delta
FROM (
  SELECT l_partkey, l_shipdate, l_extendedprice,
         LAG(l_extendedprice) OVER (
             PARTITION BY l_partkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_price
  FROM lineitem) t
WHERE prev_price IS NOT NULL AND l_extendedprice <> prev_price
"""


@query("part_price_changes", oracle=_CHANGES_ORACLE)
def part_price_changes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff: emit one row per observed value CHANGE between
    consecutive captures of a key (old, new, delta) — the audit-log /
    CDC-extraction read over a snapshot history. First capture per key
    emits nothing (no predecessor).

    Same single key-partitioned shuffle as SCD2; the change filter is
    applied after ``lag()`` map-side, so output is change-sized, not
    history-sized.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    prev = F.lag("l_extendedprice").over(w)
    return (
        li.withColumn("__prev", prev)
        .where(F.col("__prev").isNotNull() & (F.col("l_extendedprice") != F.col("__prev")))
        .select(
            "l_partkey",
            F.unix_micros("l_shipdate").alias("ts_us"),
            F.round("__prev", 2).alias("old_price"),
            F.round("l_extendedprice", 2).alias("new_price"),
            F.round(F.col("l_extendedprice") - F.col("__prev"), 2).alias("delta"),
        )
    )


# --- point-in-time (as-of) state reconstruction ------------------------

_ASOF_STATE_ORACLE = """
SELECT l_partkey,
       EPOCH_US(l_shipdate) AS ts_us,
       ROUND(l_extendedprice, 2) AS price,
       l_returnflag
FROM (
  SELECT li.*, ROW_NUMBER() OVER (
      PARTITION BY l_partkey
      ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
  FROM lineitem li
  WHERE li.l_shipdate <= TIMESTAMP '1995-06-30 00:00:00') t
WHERE rn = 1
"""


@query("part_state_asof", oracle=_ASOF_STATE_ORACLE)
def part_state_asof_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time reconstruction: the state of every key AS OF a
    literal timestamp — ``WHERE ts <= T`` then latest-per-key. This is
    the time-travel read over the reference's snapshot tables ("what
    did the rankings look like last June"). The filter is pushed into
    the parquet scan (min/max row-group pruning discards post-T files
    wholesale), then the same max-struct aggregate as W2 latest-per-key
    — one shuffle of one candidate row per key per partition.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_orderkey", "l_linenumber",
        "l_extendedprice", "l_returnflag",
    )
    asof = li.where(F.col("l_shipdate") <= F.lit("1995-06-30 00:00:00").cast("timestamp"))
    latest = latest_per_key(
        asof, ["l_partkey"], "l_shipdate", tiebreakers=["l_orderkey", "l_linenumber"]
    )
    return latest.select(
        "l_partkey",
        F.unix_micros("l_shipdate").alias("ts_us"),
        F.round("l_extendedprice", 2).alias("price"),
        "l_returnflag",
    )


# --- OHLC time-bucket downsampling -------------------------------------

_OHLC_ORACLE = """
SELECT l_partkey, month,
       ROUND(MAX(CASE WHEN rn_a = 1 THEN l_extendedprice END), 2) AS open,
       ROUND(MAX(l_extendedprice), 2) AS high,
       ROUND(MIN(l_extendedprice), 2) AS low,
       ROUND(MAX(CASE WHEN rn_d = 1 THEN l_extendedprice END), 2) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_obs
FROM (
  SELECT l_partkey, l_extendedprice,
         STRFTIME(l_shipdate, '%Y-%m') AS month,
         ROW_NUMBER() OVER (
             PARTITION BY l_partkey, STRFTIME(l_shipdate, '%Y-%m')
             ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn_a,
         ROW_NUMBER() OVER (
             PARTITION BY l_partkey, STRFTIME(l_shipdate, '%Y-%m')
             ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC
         ) AS rn_d
  FROM lineitem) t
GROUP BY l_partkey, month
"""


@query("part_price_ohlc_monthly", oracle=_OHLC_ORACLE)
def part_price_ohlc_monthly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open/high/low/close) downsampling of a value series into
    monthly bars per key — the canonical lossy compaction of a dense
    snapshot history for dashboards and drift monitoring.

    Spark shape: ONE hash-able aggregate per (key, bucket) — open and
    close ride min/max over a (ts, tiebreak…, value) struct, high/low
    are plain min/max, so the whole bar is a single groupBy with
    map-side partials (no windows, no second shuffle; the struct
    min/max pays SortAggregate like latest_per_key, still one row per
    group per partition pre-shuffle). The oracle expresses open/close
    with row_number windows instead — same semantics, independent
    derivation.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    li = li.withColumn("month", F.date_format("l_shipdate", "yyyy-MM"))
    ordered = F.struct("l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice")
    return (
        li.groupBy("l_partkey", "month")
        .agg(
            F.min(ordered).alias("__first"),
            F.max(ordered).alias("__last"),
            F.round(F.max("l_extendedprice"), 2).alias("high"),
            F.round(F.min("l_extendedprice"), 2).alias("low"),
            F.count("*").alias("n_obs"),
        )
        .select(
            "l_partkey",
            "month",
            F.round(F.col("__first.l_extendedprice"), 2).alias("open"),
            "high",
            "low",
            F.round(F.col("__last.l_extendedprice"), 2).alias("close"),
            "n_obs",
        )
    )


# --- exponential time-decay scoring ------------------------------------

#: Decay half-life ~ 7 days: tau such that exp(-age/tau) halves per
#: 7 days. tau_us = 7d / ln(2) in microseconds. Anchor just past the
#: fixture events' one-month span (Jan 2024).
_DECAY_ANCHOR = "2024-02-01 00:00:00"
_TAU_US = 7.0 * 86_400_000_000.0 / 0.6931471805599453

_DECAY_ORACLE = f"""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value * EXP(-(EPOCH_US(TIMESTAMP '{_DECAY_ANCHOR}')
                               - EPOCH_US(ts)) / {_TAU_US!r})), 6)
           AS decayed_score
FROM events
WHERE ts <= TIMESTAMP '{_DECAY_ANCHOR}'
GROUP BY user_id
"""


@query("events_decayed_score", oracle=_DECAY_ORACLE)
def events_decayed_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted popularity: per-user sum of event values with
    a 30-day-half-life exponential decay against a fixed anchor — the
    time-aware upgrade of the reference's reciprocal-rank popularity
    weighting (src/utils/lib.ts:348-362). Decay is computed map-side
    (zero extra shuffle over the plain groupBy); the sum keeps partial
    aggregation because exp() is applied per row, not per group.
    """
    ev = load_table(spark, sf_dir, "events")
    anchor = F.lit(_DECAY_ANCHOR).cast("timestamp")
    age_us = F.unix_micros(anchor) - F.unix_micros(F.col("ts"))
    return (
        ev.where(F.col("ts") <= anchor)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value") * F.exp(-age_us / F.lit(_TAU_US))), 6
            ).alias("decayed_score"),
        )
    )


# --- distribution outliers (z-score) -----------------------------------

_OUTLIERS_ORACLE = """
WITH stats AS (
  SELECT event_type,
         AVG(value) AS mu,
         STDDEV_SAMP(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       ROUND(e.value, 6) AS value,
       ROUND((e.value - s.mu) / s.sigma, 4) AS z
FROM events e JOIN stats s USING (event_type)
WHERE s.sigma > 0 AND ABS((e.value - s.mu) / s.sigma) > 2.5
"""


@query("event_value_outliers", oracle=_OUTLIERS_ORACLE)
def event_value_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score anomaly detection: events whose value sits
    more than 2.5 sigma from their type's mean — the data-quality
    screen a snapshot-ingest pipeline runs before trusting a scrape.
    Group stats are a tiny aggregate (one row per event_type) joined
    back by broadcast; the fact table is scanned once and never
    shuffled (stats shuffle is group-count-sized).
    """
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("__mu"),
        F.stddev_samp("value").alias("__sigma"),
    )
    z = (F.col("value") - F.col("__mu")) / F.col("__sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where((F.col("__sigma") > 0) & (F.abs(z) > 2.5))
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round(z, 4).alias("z"),
        )
    )


# --- gaps-and-islands sessionization ------------------------------------

_GAP_SESSIONS_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       EPOCH_US(MIN(ts)) AS start_us,
       EPOCH_US(MAX(ts)) AS end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS total_value
FROM numbered
GROUP BY user_id, session_idx
"""


@query("event_sessions_gap30m", oracle=_GAP_SESSIONS_ORACLE)
def event_sessions_gap30m_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    gap to the previous event exceeds 30 minutes; the session index is
    the running count of session starts. The classic SQL idiom — same
    semantics as ``session_window`` (events_session_30m) but it also
    yields a per-event session ID that downstream joins can key on,
    which the native operator doesn't expose.

    Plan: both windows and the final groupBy share the user_id
    partitioning — ONE shuffle total; the running sum is per-user,
    never global.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "__new",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_idx",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy("user_id", "session_idx")
        .agg(
            F.unix_micros(F.min("ts")).alias("start_us"),
            F.unix_micros(F.max("ts")).alias("end_us"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_idx").cast("bigint").alias("session_idx"),
            "start_us",
            "end_us",
            "n_events",
            "total_value",
        )
    )


# --- session path mining (sequence n-grams) ---------------------------

_PATH_TRIGRAMS_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS newf
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, SUM(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), tri AS (
  SELECT event_type AS t1,
         LEAD(event_type, 1) OVER ws AS t2,
         LEAD(event_type, 2) OVER ws AS t3
  FROM numbered
  WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
)
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
FROM tri WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, t1, t2, t3
LIMIT 20
"""


@query("session_path_trigrams", oracle=_PATH_TRIGRAMS_ORACLE)
def session_path_trigrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step behavior paths within 30-minute sessions —
    sequence mining, n-gram flavor (the useful core of PrefixSpan for
    funnel/path analysis without the exponential pattern lattice).

    Plan: sessionization windows, the per-session LEADs, and nothing
    else share ONE user_id-keyed shuffle (the lead window's
    (user_id, session_idx) partitioning is a refinement of user_id,
    so Spark reuses the same exchange); the trigram count is a
    64-key aggregate with map-side combine and the top-20 is a
    TakeOrdered — no global sort. Scale: state per task is one
    user's session, never the corpus."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    numbered = ev.withColumn(
        "__new",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
    ).withColumn(
        "sid",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    tri = numbered.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(ws).alias("t2"),
        F.lead("event_type", 2).over(ws).alias("t3"),
    ).where(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        tri.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(20)
    )


# --- incremental sessionization (append-only batch maintenance) -------


def sessionize_events(
    ev: DataFrame, gap_us: int = 1_800_000_000, round_values: bool = True
) -> DataFrame:
    """Gaps-and-islands sessionization to one row per session:
    ``(user_id, session_idx, start_us, end_us, n_events,
    total_value)``. One user_id-keyed shuffle (both windows and the
    groupBy share it).

    ``round_values=False`` leaves ``total_value`` unrounded — required
    when the output feeds :func:`incremental_sessionize`, which must
    add partial sums at full precision and round ONCE at the end
    (adding two already-rounded partials can differ from the
    full-recompute value in the last digit)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    numbered = ev.withColumn(
        "__new", F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    ).withColumn(
        "session_idx",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy("user_id", "session_idx")
        .agg(
            F.unix_micros(F.min("ts")).alias("start_us"),
            F.unix_micros(F.max("ts")).alias("end_us"),
            F.count("*").alias("n_events"),
            (
                F.round(F.sum("value"), 6) if round_values else F.sum("value")
            ).alias("total_value"),
        )
        .withColumn("session_idx", F.col("session_idx").cast("bigint"))
    )


def incremental_sessionize(
    prev: DataFrame,
    new_events: DataFrame,
    gap_us: int = 1_800_000_000,
    round_values: bool = True,
) -> DataFrame:
    """Maintain a sessions table under an append-only event feed
    WITHOUT reprocessing history — the daily-batch pattern at 100 TB:
    yesterday's sessions table plus today's partition in, updated
    sessions table out, cost proportional to the DELTA.

    Assumes per-user time-ordered appends (every new event lands at
    or after that user's last known event — true for a time-
    partitioned feed processed in order; late data beyond the
    previous batch boundary needs that user re-run from raw events).

    Shape: sessionize ONLY the delta (one shuffle over |delta|), then
    a per-user merge against the previous LAST session (max-struct
    latest-per-key, broadcast-or-hash join on user_id): the delta's
    first session fuses with the previous last one when the gap
    closes within ``gap_us``; later delta sessions renumber after the
    previous max index. Unaffected users pass through via an
    anti-join against the (delta-sized) replaced-session keys — a
    broadcast when the delta fits, a key-hash shuffle of the sessions
    TABLE (not the raw events) otherwise; either way history events
    are never re-read. Output is exactly what full recompute over
    (history ∪ delta) would produce, which is what the registered
    query's oracle checks.

    Precision: pass ``prev`` with UNROUNDED ``total_value`` (i.e. from
    ``sessionize_events(..., round_values=False)`` or a store that
    keeps full precision). Partial sums are added unrounded here and
    rounded ONCE at the final output (when ``round_values``); a
    pre-rounded ``prev`` can differ from full recompute in the last
    digit on values with >6 decimal places."""
    new_sess = sessionize_events(new_events, gap_us, round_values=False)
    last_prev = (
        prev.groupBy("user_id")
        .agg(
            F.max(
                F.struct("session_idx", "start_us", "end_us",
                         "n_events", "total_value")
            ).alias("s")
        )
        .select("user_id", "s.*")
        .withColumnRenamed("session_idx", "last_idx")
        .withColumnRenamed("start_us", "last_start")
        .withColumnRenamed("end_us", "last_end")
        .withColumnRenamed("n_events", "last_n")
        .withColumnRenamed("total_value", "last_v")
    )
    joined = new_sess.join(last_prev, "user_id", "left")
    merges = (F.col("session_idx") == 1) & (
        F.col("last_end").isNotNull()
        & ((F.col("start_us") - F.col("last_end")) <= gap_us)
    )
    delta_out = joined.select(
        "user_id",
        F.when(
            merges, F.col("last_idx")
        ).otherwise(
            F.col("session_idx")
            + F.coalesce("last_idx", F.lit(0))
            - F.when(
                # the delta's first session merged: later ones shift by 1
                (F.col("last_idx").isNotNull())
                & ((F.first("start_us").over(
                    Window.partitionBy("user_id").orderBy("session_idx")
                ) - F.col("last_end")) <= gap_us),
                1,
            ).otherwise(0)
        ).alias("session_idx"),
        F.when(merges, F.col("last_start")).otherwise(F.col("start_us")).alias(
            "start_us"
        ),
        "end_us",
        (F.col("n_events") + F.when(merges, F.col("last_n")).otherwise(0)).alias(
            "n_events"
        ),
        # full-precision partial-sum add; rounding happens ONCE below
        (
            F.col("total_value")
            + F.when(merges, F.col("last_v")).otherwise(0.0)
        ).alias("total_value"),
    )
    # delta_out feeds BOTH the output union and the replaced-key
    # anti-join below; snapshot the (delta-sized) frame once so the
    # delta pipeline doesn't execute twice
    delta_out = delta_out.localCheckpoint()
    # previous sessions survive unless replaced by a merged row
    replaced = delta_out.select(
        "user_id", F.col("session_idx").alias("__ridx")
    ).distinct()
    kept_prev = prev.join(
        replaced,
        (prev["user_id"] == replaced["user_id"])
        & (prev["session_idx"] == replaced["__ridx"]),
        "left_anti",
    )
    out = kept_prev.unionByName(delta_out)
    if round_values:
        out = out.withColumn("total_value", F.round("total_value", 6))
    return out


_INCR_SESSIONS_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS newf
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, SUM(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
       EPOCH_US(MIN(ts)) AS start_us, EPOCH_US(MAX(ts)) AS end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS total_value
FROM numbered GROUP BY 1, 2
"""


@query("incremental_sessions", oracle=_INCR_SESSIONS_ORACLE)
def incremental_sessions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split the events table at its median timestamp, sessionize the
    first half the ordinary way, then roll the second half in with
    ``incremental_sessionize`` — the oracle is FULL RECOMPUTE over
    all events, so a hash match proves the incremental maintenance
    path is exact (boundary sessions fuse, indexes renumber,
    untouched users pass through)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    cut = ev.agg(
        F.expr("percentile_approx(unix_micros(ts), 0.5, 10000)").alias("c")
    )
    with_cut = ev.crossJoin(F.broadcast(cut))
    hist = with_cut.where(F.unix_micros("ts") <= F.col("c")).drop("c")
    delta = with_cut.where(F.unix_micros("ts") > F.col("c")).drop("c")
    return incremental_sessionize(
        sessionize_events(hist, round_values=False), delta
    )


# --- exponential smoothing (recursive filter as a fold) ---------------

_SES_ORACLE = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(list_reduce(list(value ORDER BY ts, event_id),
                              (acc, x) -> 0.3 * x + 0.7 * acc) AS DOUBLE),
             6) AS ses_level
FROM events
GROUP BY user_id
"""


@query("user_value_ses", oracle=_SES_ORACLE)
def user_value_ses_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple exponential smoothing (α = 0.3) of each user's event
    values in time order — the recursive filter
    ``level ← α·x + (1-α)·level`` that SQL window functions cannot
    express (each step depends on the previous OUTPUT, not a frame of
    inputs). Spark-first shape: ONE user-keyed shuffle collects each
    series into an ordered array (struct-sorted for a deterministic
    tiebreak), then the recursion is a map-side ``F.aggregate`` fold
    seeded with the first observation — no UDF, no iteration, no
    driver. Per-task state is one user's series; 100 TB scales by
    users; `user_value_ses_2level` is the same computation decomposed
    for series too long for one buffer (affine chunk composition,
    hash-verified equal)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "value"
    )
    series = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_sort(
            F.collect_list(F.struct("ts_us", "event_id", "value"))
        ).alias("s"),
    )
    vals = F.transform(F.col("s"), lambda r: r["value"])
    ses = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1).cast("double"),
        lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc,
    )
    return series.select(
        "user_id", "n_events", F.round(ses, 6).alias("ses_level")
    )


_SES_2LEVEL_ORACLE = _SES_ORACLE  # same result by construction


@query("user_value_ses_2level", oracle=_SES_2LEVEL_ORACLE)
def user_value_ses_2level_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME exponential smoothing as `user_value_ses`, computed as
    a TWO-LEVEL distributed recursion — the shape that survives
    series too long for one aggregation buffer (the `pack_stream`
    prefix-sum idea applied to a recursive filter).

    Key identity: a chunk of observations acts on the incoming level
    as an AFFINE map — level_out = A·level_in + B with
    A = (1-α)^n and B following the same recursion seeded at 0 — and
    affine maps compose. So: level 1 groups (user, time-bucket) and
    folds each bucket's (bounded) slice into (A, B, first-chunk
    seed); level 2 folds the per-user sequence of bucket summaries in
    time order. State per task is one BUCKET's rows at level 1 and
    one user's BUCKET COUNT at level 2 — never the whole series.
    Registered against the single-fold oracle: the hash match proves
    the decomposition is exact, not approximately so."""
    alpha = 0.3
    bucket_us = 6 * 3600 * 1_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "value"
    )
    chunks = (
        ev.withColumn("bucket", F.floor(F.col("ts_us") / bucket_us))
        .groupBy("user_id", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.array_sort(
                F.collect_list(F.struct("ts_us", "event_id", "value"))
            ).alias("s"),
        )
    )
    vals = F.transform(F.col("s"), lambda r: r["value"].cast("double"))
    step = lambda acc, x: F.lit(alpha) * x + F.lit(1 - alpha) * acc  # noqa: E731
    a_coef = F.pow(F.lit(1 - alpha), F.col("n"))
    b_coef = F.aggregate(vals, F.lit(0.0), step)
    seed = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        step,
    )
    summaries = chunks.select(
        "user_id",
        "bucket",
        "n",
        a_coef.alias("a"),
        b_coef.alias("b"),
        seed.alias("seed"),
    )
    per_user = summaries.groupBy("user_id").agg(
        F.sum("n").alias("n_events"),
        F.array_sort(
            F.collect_list(F.struct("bucket", "a", "b", "seed"))
        ).alias("cs"),
    )
    cs = F.col("cs")
    first = F.element_at(cs, 1)
    rest = F.slice(cs, 2, F.greatest(F.size(cs) - 1, F.lit(0)))
    level = F.aggregate(
        rest,
        first["seed"],
        lambda acc, c: c["a"] * acc + c["b"],
    )
    return per_user.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.round(level, 6).alias("ses_level"),
    )


# --- robust (MAD) outlier screen --------------------------------------

_MAD_ORACLE = """
WITH med AS (
  SELECT event_type, MEDIAN(value) AS med FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, MEDIAN(ABS(e.value - m.med)) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
)
SELECT e.event_id, e.event_type,
       ROUND(e.value, 6) AS value,
       ROUND((e.value - m.med) / (1.4826 * d.mad), 6) AS robust_z
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
WHERE d.mad > 0
  AND ABS((e.value - m.med) / (1.4826 * d.mad)) > 3.5
"""


@query("event_value_mad_outliers", oracle=_MAD_ORACLE)
def event_value_mad_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen: |modified z| > 3.5 using median/MAD
    (Iglewicz-Hoaglin) — unlike mean/stddev (event_value_outliers),
    the cutoff itself cannot be dragged by the outliers it hunts.

    Plan: two group-stat passes (median, then MAD — the second needs
    the first's output), each a GROUP-SIZED exact percentile
    aggregate broadcast back to the fact scan; the fact table never
    shuffles. Exact `percentile` is safe here because the groups are
    few (4 event types) — per-group state is the sorted value list;
    with high-cardinality groups swap in `percentile_approx` (sketch
    buffer, same plan shape)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    with_med = ev.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    z = (F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .where((F.col("mad") > 0) & (F.abs(z) > 3.5))
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round(z, 6).alias("robust_z"),
        )
    )


# --- time-weighted average (TWAP) -------------------------------------

_TWAP_ORACLE = """
WITH iv AS (
  SELECT l_partkey,
         l_extendedprice AS price,
         EPOCH_US(l_shipdate) AS t0,
         LEAD(EPOCH_US(l_shipdate)) OVER (
             PARTITION BY l_partkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber) AS t1
  FROM lineitem
)
SELECT l_partkey,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       ROUND(SUM(price * (t1 - t0)) / SUM(t1 - t0), 6) AS twap
FROM iv WHERE t1 IS NOT NULL AND t1 > t0
GROUP BY l_partkey
"""


@query("part_price_twap", oracle=_TWAP_ORACLE)
def part_price_twap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per part over its snapshot history:
    each observation holds until the next one, so the mean weights
    each price by its interval duration — the correct average for
    irregularly-sampled state (a plain AVG over-weights busy
    periods). Zero-duration repeats and the open last interval drop
    out. Same single key-partitioned lead() shuffle as the SCD2
    family; the weighted mean is one aggregate over interval rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    t0 = F.unix_micros("l_shipdate")
    t1 = F.unix_micros(F.lead("l_shipdate").over(w))
    iv = li.select(
        "l_partkey",
        F.col("l_extendedprice").alias("price"),
        t0.alias("t0"),
        t1.alias("t1"),
    ).where(F.col("t1").isNotNull() & (F.col("t1") > F.col("t0")))
    dur = F.col("t1") - F.col("t0")
    return iv.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(F.sum(F.col("price") * dur) / F.sum(dur), 6).alias("twap"),
    )


# --- running balance (keyed cumulative sum) ---------------------------

_RUNNING_BALANCE_ORACLE = """
SELECT l_partkey,
       EPOCH_US(l_shipdate) AS ts_us,
       l_orderkey, l_linenumber,
       ROUND(SUM(l_quantity) OVER (
           PARTITION BY l_partkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS UNBOUNDED PRECEDING), 6) AS cum_qty
FROM lineitem
"""


@query("part_running_balance", oracle=_RUNNING_BALANCE_ORACLE)
def part_running_balance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running quantity balance per part over its event history — the
    ledger/inventory read. KEY-partitioned running sum (one shuffle,
    window state = one accumulator per key partition); the global
    single-task variant of this is the banned shape
    (order_price_quartiles' NTILE lesson), but per-key prefix sums
    scale with the key count."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return li.select(
        "l_partkey",
        F.unix_micros("l_shipdate").alias("ts_us"),
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 6).alias("cum_qty"),
    )
