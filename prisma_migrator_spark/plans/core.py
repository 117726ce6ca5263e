"""Operator-level queries: one registry entry per SURVEY §2 row.

Each pairs an idiomatic Spark DataFrame implementation (built from the
operators library) with a DuckDB oracle. Column aliases match exactly
on both sides — the driver hashes values after sorting columns by
name.

Conventions for hash stability across engines:
- computed doubles are ROUND(x, 6) on both sides (summation order
  differs between engines; 1e-12-scale FP noise would flip the hash);
- timestamps are emitted as formatted strings or epoch microseconds;
- array outputs are emitted as sorted ';'-joined strings (the driver's
  value hash serializes engine-native arrays differently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prisma_migrator_spark.catalog import load_table
from prisma_migrator_spark.functions.pg_compat import (
    hyperlink,
    to_char_mmddyyyy,
)
from prisma_migrator_spark.operators.aggregates import distinct_string_agg
from prisma_migrator_spark.operators.dedup import latest_per_key
from prisma_migrator_spark.operators.joins import anti_join, semi_join
from prisma_migrator_spark.operators.pivot import dynamic_pivot
from prisma_migrator_spark.operators.scoring import (
    group_sizes,
    normalize_by_global_max,
    weighted_reciprocal_rank,
)
from prisma_migrator_spark.plans.registry import query

# --- W2: latest-per-key dedup (PG DISTINCT ON, lib.ts:303,313) ---------

_LATEST_LINEITEM_ORACLE = """
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
       l_quantity, ROUND(l_extendedprice, 2) AS l_extendedprice,
       l_returnflag, l_linestatus,
       STRFTIME(l_shipdate, '%Y-%m-%d') AS ship_date
FROM (
  SELECT li.*, ROW_NUMBER() OVER (
      PARTITION BY l_partkey
      ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
  FROM lineitem li) t
WHERE rn = 1
"""


@query("latest_per_key_lineitem", oracle=_LATEST_LINEITEM_ORACLE)
def latest_per_key_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Project BEFORE the dedup: max(struct(*)) folds every column into
    # the aggregate buffer, which blocks Catalyst's column pruning from
    # reaching the scan — at 100 TB the two unused doubles are real IO.
    # Safe: (l_orderkey, l_linenumber) is unique, so dropped payload
    # columns can never decide the struct comparison.
    li = li.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    )
    latest = latest_per_key(
        li, ["l_partkey"], "l_shipdate", tiebreakers=["l_orderkey", "l_linenumber"]
    )
    return latest.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        F.round("l_extendedprice", 2).alias("l_extendedprice"),
        "l_returnflag",
        "l_linestatus",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


_LATEST_EVENT_ORACLE = """
SELECT user_id, event_id, event_type,
       ROUND(value, 6) AS value,
       EPOCH_US(ts) AS ts_us
FROM (
  SELECT e.*, ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events e) t
WHERE rn = 1
"""


@query("latest_event_per_user", oracle=_LATEST_EVENT_ORACLE)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # project first so pruning reaches the scan (props is unused; see
    # latest_per_key_lineitem for why the struct-agg blocks pruning)
    ev = ev.select("user_id", "event_id", "event_type", "value", "ts")
    latest = latest_per_key(ev, ["user_id"], "ts", tiebreakers=["event_id"])
    return latest.select(
        "user_id",
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        F.unix_micros("ts").alias("ts_us"),
    )


# --- A1: count-distinct group sizes (lib.ts:342-346) -------------------

_CATEGORY_SIZES_ORACLE = """
SELECT l_suppkey, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS total_apps
FROM lineitem GROUP BY l_suppkey
"""


@query("category_sizes", oracle=_CATEGORY_SIZES_ORACLE)
def category_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return group_sizes(li, ["l_suppkey"], "l_partkey", out="total_apps")


# --- A2: weighted reciprocal-rank with log10 weight (lib.ts:348-353) ---

_RANK_SCORES_ORACLE = """
WITH category_sizes AS (
  SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS total_apps
  FROM lineitem GROUP BY l_suppkey
)
SELECT li.l_partkey,
       ROUND(SUM((1.0 / (li.l_linenumber + 1)) * LOG10(cs.total_apps + 1)), 6)
         AS weighted_category_score
FROM lineitem li JOIN category_sizes cs ON li.l_suppkey = cs.l_suppkey
GROUP BY li.l_partkey
"""


@query("rank_scores", oracle=_RANK_SCORES_ORACLE)
def rank_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prisma_migrator_spark.functions.pg_compat import log10_1p

    li = load_table(spark, sf_dir, "lineitem")
    sizes = group_sizes(li, ["l_suppkey"], "l_partkey", out="total_apps")
    scored = weighted_reciprocal_rank(
        li.join(F.broadcast(sizes), "l_suppkey"),
        ["l_partkey"],
        "l_linenumber",
        weight=log10_1p(F.col("total_apps")),
        out="raw",
    )
    return scored.select(
        "l_partkey", F.round("raw", 6).alias("weighted_category_score")
    )


# --- A3: recommendation in-degree metrics (lib.ts:355-362) -------------

_REC_METRICS_ORACLE = """
SELECT l_partkey,
       CAST(COUNT(*) AS INT) AS recommendation_count,
       ROUND(SUM(1.0 / (l_linenumber + 1)), 6) AS weighted_recommendation_score
FROM lineitem
WHERE l_partkey IS NOT NULL
GROUP BY l_partkey
"""


@query("recommendation_metrics", oracle=_REC_METRICS_ORACLE)
def recommendation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    scored = weighted_reciprocal_rank(
        li.filter(F.col("l_partkey").isNotNull()),
        ["l_partkey"],
        "l_linenumber",
        out="raw",
    )
    counts = (
        li.filter(F.col("l_partkey").isNotNull())
        .groupBy("l_partkey")
        .agg(F.count("*").cast("int").alias("recommendation_count"))
    )
    return counts.join(scored, "l_partkey").select(
        "l_partkey",
        "recommendation_count",
        F.round("raw", 6).alias("weighted_recommendation_score"),
    )


# --- A4: sorted distinct pair agg (lib.ts:363-369) ---------------------

_DISTINCT_PAIRS_ORACLE = """
SELECT li.l_orderkey,
       STRING_AGG(DISTINCT p.p_brand || '|' || p.p_type, ';'
                  ORDER BY p.p_brand || '|' || p.p_type) AS pairs
FROM lineitem li JOIN part p ON li.l_partkey = p.p_partkey
GROUP BY li.l_orderkey
"""


@query("distinct_pair_agg", oracle=_DISTINCT_PAIRS_ORACLE)
def distinct_pair_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return distinct_string_agg(
        joined,
        ["l_orderkey"],
        F.concat_ws("|", "p_brand", "p_type"),
        sep=";",
        out="pairs",
    )


# --- J3: semi-join via IN-subquery (lib.ts:305-312) --------------------

_SEMI_JOIN_ORACLE = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice,
       o_orderstatus
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


@query("semi_join_orders", oracle=_SEMI_JOIN_ORACLE)
def semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    keys = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("o_custkey")
    )
    return semi_join(orders, keys, ["o_custkey"], broadcast_right=True).select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderstatus",
    )


# --- S5's primitive: anti-join (NOT EXISTS) ----------------------------

_ANTI_JOIN_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


@query("anti_join_customers", oracle=_ANTI_JOIN_ORACLE)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no high-value order (NOT EXISTS). The price
    filter keeps the result non-empty at every sf — a 0-row anti-join
    would vacuously 'match' the oracle and test nothing."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    keys = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return anti_join(cust, keys, ["c_custkey"]).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# --- P3/P4/P5/P6: membership + range + null filters --------------------

_FILTER_ORACLE = """
SELECT p_partkey, p_name, p_brand, p_size, ROUND(p_retailprice, 2) AS p_retailprice
FROM part
WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
  AND p_size <= 25
  AND p_type IS NOT NULL
"""


@query("filter_inlist_range", oracle=_FILTER_ORACLE)
def filter_inlist_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .filter(F.col("p_size") <= 25)
        .filter(F.col("p_type").isNotNull())
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            "p_size",
            F.round("p_retailprice", 2).alias("p_retailprice"),
        )
    )


# --- F5: TO_CHAR date formatting (lib.ts:391) --------------------------

_DATE_FORMAT_ORACLE = """
SELECT o_orderkey,
       STRFTIME(o_orderdate, '%m-%d-%Y') AS launch_date,
       o_orderpriority
FROM orders
"""


@query("date_format_orders", oracle=_DATE_FORMAT_ORACLE)
def date_format_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        to_char_mmddyyyy(F.col("o_orderdate")).alias("launch_date"),
        "o_orderpriority",
    )


# --- W1/F2: global-max normalization with NULLIF guards ----------------

_NORMALIZED_ORACLE = """
WITH part_scores AS (
  SELECT l_partkey, SUM(l_extendedprice) AS score
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey,
       ROUND(score, 2) AS score,
       ROUND(COALESCE(NULLIF(score, 0) / NULLIF(MAX(score) OVER (), 1), 0), 6)
         AS score_normalized
FROM part_scores
"""


@query("normalized_part_scores", oracle=_NORMALIZED_ORACLE)
def normalized_part_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    scores = li.groupBy("l_partkey").agg(F.sum("l_extendedprice").alias("score"))
    normalized = normalize_by_global_max(scores, "score", out="norm_raw")
    return normalized.select(
        "l_partkey",
        F.round("score", 2).alias("score"),
        F.round("norm_raw", 6).alias("score_normalized"),
    )


# --- R1: dynamic pivot (lib.ts:504-529) --------------------------------

_PIVOT_ORACLE = """
WITH cats AS (
  SELECT li.l_partkey,
         LIST_SORT(LIST_DISTINCT(LIST(s.s_name))) AS categories
  FROM lineitem li JOIN supplier s ON li.l_suppkey = s.s_suppkey
  GROUP BY li.l_partkey
)
SELECT l_partkey,
       COALESCE(categories[1], '') AS "Category 1",
       COALESCE(categories[2], '') AS "Category 2",
       COALESCE(categories[3], '') AS "Category 3"
FROM cats
"""


@query("dynamic_pivot_categories", oracle=_PIVOT_ORACLE)
def dynamic_pivot_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    cats = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.array_sort(F.collect_set("s_name")).alias("categories"))
    )
    return dynamic_pivot(cats, "categories", prefix="Category ", max_width=3)


# --- S9/F8: CSV report cells with =HYPERLINK formulas ------------------

_HYPERLINK_ORACLE = """
SELECT s_suppkey,
       '=HYPERLINK("https://apps.example.com/' || s_suppkey || '", "'
         || REPLACE(s_name, '"', '""') || '")' AS app_link,
       ROUND(s_acctbal, 2) AS acctbal
FROM supplier
"""


@query("hyperlink_report", oracle=_HYPERLINK_ORACLE)
def hyperlink_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        hyperlink(
            F.concat(F.lit("https://apps.example.com/"), F.col("s_suppkey")),
            F.col("s_name"),
        ).alias("app_link"),
        F.round("s_acctbal", 2).alias("acctbal"),
    )


# --- hierarchy rollup over the full dim chain (region <- nation) -------

_REGION_ROLLUP_ORACLE = """
SELECT r.r_name AS region_name,
       CAST(COUNT(DISTINCT n.n_nationkey) AS INT) AS n_nations,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(c.c_acctbal), 2) AS total_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY region_name
"""


@query("region_rollup", oracle=_REGION_ROLLUP_ORACLE)
def region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level dimension hierarchy rollup (Category.parentHandle
    analog, SURVEY §1.1 'Hierarchies'): fact joined through the
    nation -> region adjacency, both dims broadcast, one hash agg."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "r_name"
        )
    )
    return (
        cust.join(dims, cust.c_nationkey == F.col("n_nationkey"))
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.countDistinct("n_nationkey").cast("int").alias("n_nations"),
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
        .orderBy("region_name")
    )


# --- cluster-consistent (key-coherent) sampling -----------------------

_CLUSTER_SAMPLE_ORACLE = """
WITH keep AS (
  SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
  FROM orders
  WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':cs'), 1, 8))
             AS BIGINT) % 4 = 0
)
SELECT k.o_orderkey, k.o_custkey, k.o_totalprice,
       CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_items,
       ROUND(SUM(l.l_extendedprice), 2) AS items_value
FROM keep k JOIN lineitem l ON l.l_orderkey = k.o_orderkey
GROUP BY 1, 2, 3
"""


@query("order_cluster_sample", oracle=_CLUSTER_SAMPLE_ORACLE)
def order_cluster_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~25% sample of ORDERS (not rows) with every sampled order's
    lineitems intact — cluster/key-coherent sampling, the correct way
    to downsample relational or conversation-shaped training data
    (row-level sampling shears children off parents and biases any
    per-parent statistic).

    Deterministic: membership is a pure hash of the key — stable
    under retries, AQE, and engine (no rand()). The child table is
    filtered by JOINING the sampled keys (hash-partitioned on the
    key both sides, or broadcast when the sample is small) — child
    rows never evaluate the hash themselves, so parent and child can
    never disagree on membership."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    # md5-derived membership (not xxhash64): portable across engines,
    # so the DuckDB oracle reproduces the sample EXACTLY — same device
    # as the MinHash signatures
    keep = o.where(
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":cs"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(4),
        )
        == 0
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    return (
        keep.join(li, "o_orderkey")
        .groupBy("o_orderkey", "o_custkey", "o_totalprice")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("items_value"),
        )
    )


# --- P7 + J3 + W2 composed: the parameterized getAppsByCategory entry
# point (reference src/utils/lib.ts:281-318) ---------------------------


def apps_by_category(
    spark: SparkSession,
    sf_dir: str,
    category_handles: list | None = None,
    max_position: int | None = None,
) -> DataFrame:
    """Parameterized replica of the reference's one remaining composed
    entry point, ``getAppsByCategory(categoriesHandles, maxPosition)``
    (src/utils/lib.ts:281-318): dynamic predicate assembly (P7 — the
    category list collapses to TRUE when absent, the position cap is
    appended only when given), a semi-join against the qualifying
    handles (J3), then the latest-snapshot-per-key star projection
    (W2, DISTINCT ON ... ORDER BY capturedAt DESC).

    Fixture realization (FIXTURES.md §C): App→``part``,
    CategoryAppPositionHistory→``lineitem`` (categoryHandle=l_suppkey,
    position=l_linenumber), AppCategoryHistory→``lineitem``
    (role=l_returnflag, PRIMARY/SECONDARY→{'A','N'}),
    AppSnapshot→``lineitem`` history keyed (l_partkey, l_shipdate).

    Spark-first re-derivation: the reference INNER-joins
    App⋈capp⋈ach (a multiplicative fan-out) and then dedups through
    ``IN (...)``; here each existence test is its own LEFT SEMI join
    on the app key — no fan-out rows ever materialize, each semi is
    one hash join whose right side is a filtered projection (so at
    100 TB the selective predicates reach the fact scan, broadcast or
    bloom-pruned — same physics as ``semi_join_orders``). The dynamic
    predicates stay Column expressions, so Catalyst pushes them into
    the parquet scan of each branch.
    """
    li = load_table(spark, sf_dir, "lineitem")
    snap = li.select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus",
        "l_shipdate",
    )
    # CategoryAppPositionHistory branch: optional handle + position caps
    capp = li.select("l_partkey", "l_suppkey", "l_linenumber")
    if category_handles:
        capp = capp.filter(F.col("l_suppkey").isin(list(category_handles)))
    if max_position is not None:
        capp = capp.filter(F.col("l_linenumber") <= max_position)
    # AppCategoryHistory branch: handle + role filters only when handles
    # are given (reference: the role predicate lives INSIDE the
    # category branch; the TRUE branch imposes bare existence)
    ach = li.select("l_partkey", "l_suppkey", "l_returnflag")
    if category_handles:
        ach = ach.filter(
            F.col("l_suppkey").isin(list(category_handles))
            & F.col("l_returnflag").isin("A", "N")
        )
    keys = load_table(spark, sf_dir, "part").select("p_partkey")
    keys = semi_join(
        keys, capp.select(F.col("l_partkey").alias("p_partkey")), ["p_partkey"]
    )
    keys = semi_join(
        keys, ach.select(F.col("l_partkey").alias("p_partkey")), ["p_partkey"]
    )
    qualified = semi_join(
        snap, keys.select(F.col("p_partkey").alias("l_partkey")), ["l_partkey"]
    )
    latest = latest_per_key(
        qualified, ["l_partkey"], "l_shipdate",
        tiebreakers=["l_orderkey", "l_linenumber"],
    )
    return latest.select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        F.round("l_extendedprice", 2).alias("l_extendedprice"),
        "l_returnflag", "l_linestatus",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


_APPS_BY_CATEGORY_ORACLE = """
WITH keys AS (
  SELECT p_partkey FROM part
  WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                      WHERE l_suppkey IN (1, 2, 3) AND l_linenumber <= 3)
    AND p_partkey IN (SELECT l_partkey FROM lineitem
                      WHERE l_suppkey IN (1, 2, 3)
                        AND l_returnflag IN ('A', 'N'))
)
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
       ROUND(l_extendedprice, 2) AS l_extendedprice,
       l_returnflag, l_linestatus,
       STRFTIME(l_shipdate, '%Y-%m-%d') AS ship_date
FROM (
  SELECT li.*, ROW_NUMBER() OVER (
      PARTITION BY l_partkey
      ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
  FROM lineitem li
  WHERE l_partkey IN (SELECT p_partkey FROM keys)) t
WHERE rn = 1
"""


@query("apps_by_category", oracle=_APPS_BY_CATEGORY_ORACLE)
def apps_by_category_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative instantiation: both dynamic parameters engaged
    (handles={1,2,3}, max_position=3) — the fully-assembled predicate
    branch of src/utils/lib.ts:285-299."""
    return apps_by_category(
        spark, sf_dir, category_handles=[1, 2, 3], max_position=3
    )


_APPS_BY_CATEGORY_OPEN_ORACLE = """
WITH keys AS (
  SELECT p_partkey FROM part
  WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_linenumber <= 2)
    AND p_partkey IN (SELECT l_partkey FROM lineitem)
)
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
       ROUND(l_extendedprice, 2) AS l_extendedprice,
       l_returnflag, l_linestatus,
       STRFTIME(l_shipdate, '%Y-%m-%d') AS ship_date
FROM (
  SELECT li.*, ROW_NUMBER() OVER (
      PARTITION BY l_partkey
      ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
  FROM lineitem li
  WHERE l_partkey IN (SELECT p_partkey FROM keys)) t
WHERE rn = 1
"""


@query("apps_by_category_open", oracle=_APPS_BY_CATEGORY_OPEN_ORACLE)
def apps_by_category_open_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OTHER assembly branch: no category list (condition collapses
    to TRUE, role filter disengaged — src/utils/lib.ts:293-295) with
    only the optional position cap appended."""
    return apps_by_category(spark, sf_dir, max_position=2)
