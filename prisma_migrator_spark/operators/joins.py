"""Semi/anti join wrappers (SURVEY §2.3 J3; §2.1 S5's Spark mapping).

The reference uses an IN-subquery semi-join (src/utils/lib.ts:305-312)
and Prisma ``skipDuplicates`` (src/migrate.ts:64) whose distributed
equivalent is an anti-join against existing keys.

Scale: Catalyst plans these as BroadcastHashJoin when the right side
is small (the usual case: key sets, dimension tables); otherwise
sort-merge with both sides shuffled on the join key. Pass
``broadcast_right=True`` to force the hint when you know the right
side is a dimension.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prep(right: DataFrame, on: Sequence[str], broadcast_right: bool) -> DataFrame:
    # Keys only — but NO dropDuplicates: semi/anti joins are
    # insensitive to right-side duplicates, and the Aggregate it
    # plans (a) costs an extra hash-exchange stage and (b) blocks
    # InjectRuntimeFilter, which only builds a runtime bloom filter
    # when the creation side is Filter/Project over a scan. With a
    # plain projection, a selective dim predicate prunes the FACT
    # scan via bloom when the right side is too big to broadcast —
    # the 100 TB path (pinned in tests/test_plans.py).
    right = right.select(*on)
    return F.broadcast(right) if broadcast_right else right


def semi_join(
    left: DataFrame, right: DataFrame, on: Sequence[str], broadcast_right: bool = False
) -> DataFrame:
    """Rows of ``left`` whose key exists in ``right`` (EXISTS / IN)."""
    return left.join(_prep(right, on, broadcast_right), list(on), "left_semi")


def anti_join(
    left: DataFrame, right: DataFrame, on: Sequence[str], broadcast_right: bool = False
) -> DataFrame:
    """Rows of ``left`` whose key does NOT exist in ``right``
    (NOT EXISTS) — the skip-duplicates primitive."""
    return left.join(_prep(right, on, broadcast_right), list(on), "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    right_tiebreakers: Sequence[str] = (),
    dedup_right: bool = False,
) -> DataFrame:
    """Backward as-of LEFT join: each left row picks up ``payload``
    from the latest right row with ``right_ts <= left_ts`` per key —
    DuckDB/kdb ``ASOF JOIN``, which Spark has no native operator for.

    Implemented as the merge-sorted union (the scale-correct plan, vs
    the naive per-row range join that explodes to |L|·|R| candidates):

    1. union the two sides tagged 0 (right) / 1 (left), sorted within
       each key by (ts, tag, tiebreakers, payload) — a right row at
       exactly left's ts sorts first, giving <= semantics, and at
       equal ts the max-tiebreaker right row sorts LAST so it wins;
    2. running ``last(struct(payload), ignorenulls=True)`` over the
       sorted stream carries the winning right row's values forward to
       every later left row.

    Cost: ONE shuffle of |L|+|R| rows keyed on ``on`` + a
    per-partition sort, regardless of how many right rows precede each
    left row. (r9, guide §2.4: the former separate
    latest-per-(key, ts) dedup pass over the right side — a
    SortAggregate with its own exchange and two sorts — folds into the
    window's sort order: ordering right rows ascending by tiebreakers
    then payload makes "last row before the left row" and "max
    tiebreaker per (key, ts)" the same row, deterministically.
    Carrying the payload as ONE struct also makes the fill row-wise —
    a null payload FIELD on the winning row stays null, exactly ASOF
    semantics — where per-column ``last`` would back-fill it from an
    older row.)

    ``dedup_right=True`` (VERDICT r9 item 6) reinstates the
    latest-per-(key, ts) pre-dedup of the right side BEFORE the union:
    the merge window then shuffles |R'| deduped rows instead of |R|.
    The winner per (key, ts) is the max-(tiebreakers, payload) row —
    exactly the row the merged window's sort order would keep — so the
    result is identical; pay the extra aggregate pass only when the
    right side is duplicate-heavy enough that shrinking the union
    shuffle beats it (at 100 TB: dup factor ≳ 2 on a shuffle-bound
    join). Default False keeps the r9 single-shuffle plan.
    """
    from pyspark.sql import Window

    on = list(on)
    payload = list(payload)
    tbs = [t for t in right_tiebreakers]
    r_cols = list(dict.fromkeys([*tbs, *payload]))
    r = right.select(*on, right_ts, *r_cols)

    ts_type = dict(left.dtypes)[left_ts]
    left_only = [c for c in left.columns if c not in on]
    p_struct = F.struct(*payload)
    p_type = r.select(p_struct.alias("__p")).schema["__p"].dataType

    from prisma_migrator_spark.operators.dedup import _orderable

    if dedup_right:
        if _orderable(p_type):
            # winner = max (tiebreakers…, payload struct) per (key, ts)
            # — the same total order (same null placement) the window
            # below applies, so the kept row is the row it would pick.
            m = F.max(
                F.struct(*[F.col(t) for t in tbs], p_struct.alias("__pp"))
            ).alias("__m")
            r = r.groupBy(*on, right_ts).agg(m).select(
                *on,
                right_ts,
                *[
                    (
                        F.col(f"__m.{c}")
                        if c in tbs
                        else F.col("__m.__pp").getField(c)
                    ).alias(c)
                    for c in r_cols
                ],
            )
        else:
            # non-orderable payload (MapType): tiebreaker-only
            # determinism, matching the windowed path's own fallback.
            w_d = Window.partitionBy(*on, right_ts).orderBy(
                *[F.col(t).desc() for t in tbs] or [F.lit(1)]
            )
            r = (
                r.withColumn("__rn", F.row_number().over(w_d))
                .where(F.col("__rn") == 1)
                .drop("__rn")
            )
    tb_names = [f"__tb{i}" for i in range(len(tbs))]
    r_dtypes = dict(r.dtypes)
    lt = left.select(
        *on,
        F.col(left_ts).cast(ts_type).alias("__t"),
        F.lit(1).alias("__is_left"),
        *left_only,
        *[
            F.lit(None).cast(r_dtypes[t]).alias(n)
            for t, n in zip(tbs, tb_names)
        ],
        F.lit(None).cast(p_type).alias("__p"),
    )
    rt = r.select(
        *on,
        F.col(right_ts).cast(ts_type).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_only],
        *[F.col(t).alias(n) for t, n in zip(tbs, tb_names)],
        p_struct.alias("__p"),
    )
    tagged = lt.unionByName(rt)
    # exact right-side duplicates (same key, ts, every tiebreaker):
    # order by the payload struct itself so the winner is pinned —
    # the same full-row determinism the old max(struct) dedup had.
    # Skipped when the payload is not orderable (MapType), matching
    # the old row_number fallback's tiebreaker-only determinism.
    order_cols = ["__t", "__is_left", *tb_names]
    if _orderable(p_type):
        order_cols.append("__p")
    w = (
        Window.partitionBy(*on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn("__p", F.last("__p", ignorenulls=True).over(w))
    return carried.where(F.col("__is_left") == 1).select(
        *on,
        *left_only,
        *[F.col(f"__p.{p}").alias(p) for p in payload],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_start: str,
    duration: str,
    broadcast_right: bool = False,
) -> DataFrame:
    """Bounded equi + range join: left rows whose ``left_ts`` falls in
    ``[right_start, right_start + duration)`` for the matching key —
    the batch analog of a watermarked stream-stream interval join
    (attribution windows, event-to-session assignment).

    The equi keys do the heavy lifting: Catalyst hash-partitions both
    sides on ``on`` and applies the range bound as a residual filter
    inside the (broadcast-)hash join — never a cross product. Keep the
    equi component non-degenerate at scale; a pure range join without
    keys degrades to BroadcastNestedLoop.
    """
    # Rename the right side up front: the anchor frame is often derived
    # from the left (self-join lineage), and raw left[k] == right[k]
    # predicates are ambiguous there.
    rcols = list(right.columns)
    carried = [c for c in rcols if c not in on and c != right_start]
    clash = [c for c in carried if c in left.columns]
    if clash:
        raise ValueError(f"right columns collide with left: {clash}")
    r = right.select(*[F.col(c).alias(f"__r_{c}") for c in rcols])
    if broadcast_right:
        r = F.broadcast(r)
    cond = None
    for k in on:
        c = left[k] == F.col(f"__r_{k}")
        cond = c if cond is None else cond & c
    lo = F.col(f"__r_{right_start}")
    cond = (
        cond
        & (left[left_ts] >= lo)
        & (left[left_ts] < lo + F.expr(f"INTERVAL {duration}"))
    )
    joined = left.join(r, cond, "inner").drop(*[f"__r_{k}" for k in on])
    joined = joined.withColumnRenamed(f"__r_{right_start}", right_start)
    for c in carried:
        joined = joined.withColumnRenamed(f"__r_{c}", c)
    return joined


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: Sequence[str] = (),
    bucket_width: int = 3_600_000_000,
) -> DataFrame:
    """Point-in-interval join on NUMERIC axes (epoch micros, offsets)
    WITHOUT requiring a selective equi key — the bucketized
    decomposition of a 1-D range join.

    ``interval_join`` above relies on its equi keys to partition the
    work; with no key (or a low-cardinality one) that shape degrades
    to a broadcast-nested-loop over |P|·|I|. Here the axis itself
    becomes the key: every point maps to ONE bucket
    (floor(p / width)); every interval explodes to the buckets it
    overlaps ([start, end) half-open); the join is then a plain hash
    equi join on (keys…, bucket) with the exact range bound as a
    residual filter. Each (point, interval) pair can only meet in the
    point's own bucket, so no post-join dedup exists.

    Scale: shuffle is |P| + Σ(interval spans / width) rows, hash-
    partitioned on the bucket — parallelism follows the axis, not the
    key cardinality. Pick ``bucket_width`` near the TYPICAL interval
    length: much smaller multiplies interval replication, much larger
    packs many intervals per bucket (toward the nested-loop you were
    avoiding). Long-tail intervals replicate span/width times — cap
    or split outliers upstream if the length distribution is heavy-
    tailed.
    """
    on = list(on)
    b = int(bucket_width)
    p = points.withColumn(
        "__bkt", F.floor(F.col(point_col) / F.lit(b)).cast("long")
    )
    icols = list(intervals.columns)
    clash = [c for c in icols if c in points.columns and c not in on]
    if clash:
        raise ValueError(f"interval columns collide with points: {clash}")
    i = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(b)).cast("long"),
                F.floor((F.col(end_col) - F.lit(1)) / F.lit(b)).cast("long"),
            )
        ),
    )
    joined = p.join(i, [*on, "__bkt"], "inner").where(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("__bkt")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salt: int = 16,
    how: str = "inner",
    hot_keys: Sequence | None = None,
) -> DataFrame:
    """Skew-resistant equi join: identical results to
    ``left.join(right, on, how)``, but a hot key's probe rows spread
    over ``n_salt`` reducers instead of serializing onto one.

    AQE's skew-join splitting already handles most cases (it splits
    oversized LEFT partitions and replicates the matching right
    partition) — reach for explicit salting when AQE can't see the
    skew: a skewed side feeding from a cached/exchange-reused stage, a
    broadcast too large to build, or a join followed by a same-key
    aggregate where the exchange is reused and AQE must keep it
    intact.

    Mechanics: the left side gets a DETERMINISTIC per-row salt
    (hash of the whole row, never ``rand()`` — task retries and AQE
    re-plans must re-derive the same salt); the right side replicates
    each row under every salt. ``hot_keys`` (values of ``on[0]`` for
    single-key joins, tuples for composite) restricts both the
    salting and the replication to the hot keys only, so the
    replication cost is n_salt × |hot right rows|, not n_salt ×
    |right|. ``how`` supports inner/left — the salt never drops or
    duplicates matches because (key, salt) partitions the original
    key's row set.
    """
    on = list(on)
    salts = F.sequence(F.lit(0), F.lit(n_salt - 1))
    no_salt = F.array(F.lit(0))
    if hot_keys is not None:
        if len(on) == 1:
            is_hot = F.col(on[0]).isin(list(hot_keys))
        else:
            is_hot = F.struct(*on).isin(
                [F.struct(*[F.lit(v) for v in t]) for t in hot_keys]
            )
        l_salt = F.when(
            is_hot, F.pmod(F.xxhash64(*left.columns), n_salt)
        ).otherwise(0)
        r_salts = F.when(is_hot, salts).otherwise(no_salt)
    else:
        l_salt = F.pmod(F.xxhash64(*left.columns), n_salt)
        r_salts = salts
    lf = left.withColumn("__salt", l_salt.cast("int"))
    rf = right.withColumn("__salt", F.explode(r_salts)).withColumn(
        "__salt", F.col("__salt").cast("int")
    )
    return lf.join(rf, [*on, "__salt"], how).drop("__salt")
