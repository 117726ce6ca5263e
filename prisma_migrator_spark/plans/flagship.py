"""Flagship queries: popularity ranking + category difficulty.

These re-express the reference's two multi-CTE analytics reports on
the fixture schema:

- ``flagship_popularity`` ⇐ ``getAppsByPopularity()``
  (reference src/utils/lib.ts:337-415). Entity mapping (FIXTURES.md
  §C): App→part, CategoryAppPositionHistory/RecommendedAppHistory→
  lineitem (category=l_suppkey, position=l_linenumber,
  capturedAt=l_shipdate), Developer/Category→supplier,
  AppSnapshot→latest lineitem row per part.
- ``category_difficulty`` ⇐ ``getCategoriesByDifficulty()``
  (reference src/utils/lib.ts:425-496). Category→nation,
  App→customer, reviews→order spend.

Both exercise: COUNT DISTINCT group sizes (A1), weighted
reciprocal-rank sums with base-10 log weights (A2/A3, PG LOG=log10!),
sorted distinct aggs (A4), latest-per-key dedup (W2), global-max
normalization with NULLIF guards (W1/F2), multi-way LEFT joins
(J5-J10), COALESCE defaulting (F1), TO_CHAR date formatting (F5), and
a global ORDER BY on the computed score (O1).

Scale shape: every CTE is a two-phase hash aggregate shuffling only
its group key; the dimension join (supplier) is broadcast; the global
max is a 1-row aggregate broadcast back (never a MAX() OVER ()
single-partition window); the final 4-way left join runs under AQE
which broadcasts every post-aggregation side small enough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prisma_migrator_spark.catalog import load_table
from prisma_migrator_spark.functions.pg_compat import (
    log10_1p,
    pg_normalize,
    to_char_mmddyyyy,
)
from prisma_migrator_spark.operators.scoring import group_sizes, with_global_maxes
from prisma_migrator_spark.plans.registry import query

REC_WEIGHT = 0.7  # reference src/utils/lib.ts:338
CAT_WEIGHT = 0.3  # reference src/utils/lib.ts:339

_POPULARITY_ORACLE = """
WITH category_sizes AS (
  SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS total_apps
  FROM lineitem GROUP BY l_suppkey
), rank_scores AS (
  SELECT li.l_partkey,
         SUM((1.0 / (li.l_linenumber + 1)) * LOG10(cs.total_apps + 1))
           AS weighted_category_score
  FROM lineitem li JOIN category_sizes cs ON li.l_suppkey = cs.l_suppkey
  GROUP BY li.l_partkey
), recommendation_metrics AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS INT) AS recommendation_count,
         SUM(1.0 / (l_linenumber + 1)) AS weighted_recommendation_score
  FROM lineitem GROUP BY l_partkey
), app_categories AS (
  SELECT li.l_partkey,
         STRING_AGG(DISTINCT s.s_name, ';' ORDER BY s.s_name) AS categories
  FROM lineitem li JOIN supplier s ON li.l_suppkey = s.s_suppkey
  GROUP BY li.l_partkey
), latest_snapshots AS (
  SELECT * FROM (
    SELECT li.*, ROW_NUMBER() OVER (
        PARTITION BY l_partkey
        ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
    FROM lineitem li) t
  WHERE rn = 1
), scores AS (
  SELECT p.p_partkey, p.p_name,
         COALESCE(rm.weighted_recommendation_score, 0) AS rec_score,
         COALESCE(rs.weighted_category_score, 0) AS cat_score,
         COALESCE(rm.recommendation_count, 0) AS recommendation_count,
         MAX(COALESCE(rm.weighted_recommendation_score, 0)) OVER () AS max_rec,
         MAX(COALESCE(rs.weighted_category_score, 0)) OVER () AS max_cat
  FROM part p
  LEFT JOIN recommendation_metrics rm ON p.p_partkey = rm.l_partkey
  LEFT JOIN rank_scores rs ON p.p_partkey = rs.l_partkey
)
SELECT sc.p_partkey AS app_key,
       sc.p_name AS app_name,
       COALESCE(s.s_name, '') AS developer_name,
       COALESCE(STRFTIME(ls.l_shipdate, '%m-%d-%Y'), '') AS latest_ship_date,
       CAST(COALESCE(ls.l_quantity, 0) AS INT) AS review_count,
       ROUND(COALESCE(ls.l_extendedprice, 0), 2) AS rating,
       COALESCE(ac.categories, '') AS categories,
       CAST(sc.recommendation_count AS INT) AS recommendation_count,
       ROUND(0.7 * COALESCE(NULLIF(sc.rec_score, 0) / NULLIF(sc.max_rec, 1), 0)
           + 0.3 * COALESCE(NULLIF(sc.cat_score, 0) / NULLIF(sc.max_cat, 1), 0),
           6) AS popularity_score
FROM scores sc
LEFT JOIN latest_snapshots ls ON sc.p_partkey = ls.l_partkey
LEFT JOIN supplier s ON ls.l_suppkey = s.s_suppkey
LEFT JOIN app_categories ac ON sc.p_partkey = ac.l_partkey
ORDER BY popularity_score DESC, app_key
"""


@query("flagship_popularity", oracle=_POPULARITY_ORACLE)
def flagship_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apps(parts) ranked by 0.7·normalized recommendation score +
    0.3·normalized category-rank score (reference lib.ts:337-415).

    Scale shape — ONE wide shuffle, zero sorts before the output
    ordering. The reference's five CTEs over the fact table
    (category_sizes, rank_scores, recommendation_metrics,
    app_categories, latest_snapshots) all fold into ONE app-keyed
    ObjectHashAggregate over the dimension-enriched fact rows:

    - the row-level reciprocal-rank weight Σ 1/(pos+1)·log10(size+1)
      (A2/A3) sums directly — the category size joins in as a
      broadcast before the aggregate;
    - COUNT(DISTINCT app) per category (A1) is its own tiny
      two-phase distinct aggregate, broadcast back;
    - latest-per-key (DISTINCT ON, W2) ⇒ ``max(struct(ts, tiebreak...,
      payload...))`` — struct ordering is lexicographic by field, so
      the max struct IS the latest row;
    - sorted distinct categories (A4) ⇒ ``array_sort(collect_set)``.

    Total data movement: one wide shuffle of per-app partial
    aggregates (map-side combine collapses ~30:1 BEFORE the
    exchange), a category-size aggregate broadcast back, a broadcast
    dim join, a 1-row global-max aggregate broadcast back. The r8
    variant staged a (category, app) pair-level aggregate first:
    measured at sf0.1 that collapsed ~nothing (600k rows -> ~535k
    pairs) while adding an Exchange and two SortAggregate sorts
    (immutable max(struct) buffer); OPTIMIZATION_r09.md has the
    before/after. The window-based translation costs 4 extra lineitem
    scans+shuffles — measured 3× slower at sf0.1 and strictly worse
    at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")

    # category_sizes (lib.ts:342-346 / A1): COUNT(DISTINCT l_partkey)
    # per category. One row per category -> broadcast.
    sizes = li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("total_apps")
    )

    # supplier is a dim table -> broadcast; left join preserves row
    # multiplicity even for dangling FKs (collect_set skips null).
    enriched = li.join(F.broadcast(sizes), "l_suppkey").join(
        F.broadcast(supp.select("s_suppkey", "s_name")),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left",
    )

    # ONE aggregation straight to the app level (r9, guide §2.3/§2.4).
    # The r8 shape staged this through a (category, app) pair-level
    # aggregate first — but the fixture (and any history table whose
    # rows are mostly-unique (category, app) observations) collapses
    # ~nothing at the pair level (sf0.1: 600k rows -> ~535k pairs), so
    # the pair pass cost a full extra Exchange plus TWO sorts: its
    # max(struct) payload has an immutable agg buffer, forcing
    # SortAggregate for partial AND final. Aggregating directly by
    # l_partkey collapses 30:1 in the partial pass (map-side combine
    # before the only wide shuffle), and because collect_set rides in
    # the same aggregate, Spark plans ObjectHashAggregate — no sort at
    # all. Every reciprocal-rank term is multiplied by its category
    # weight at row level, exactly the oracle's formulation.
    recip = F.lit(1.0) / (F.col("l_linenumber") + F.lit(1))
    agged = (
        enriched.groupBy("l_partkey")
        .agg(
            # rank_scores (lib.ts:348-353 / A2) — PG LOG = log10
            F.sum(recip * log10_1p(F.col("total_apps"))).alias(
                "weighted_category_score"
            ),
            # recommendation_metrics (lib.ts:355-362 / A3)
            F.count("*").cast("int").alias("recommendation_count"),
            F.sum(recip).alias("weighted_recommendation_score"),
            # app_categories (lib.ts:363-369 / A4), sorted for determinism
            F.concat_ws(";", F.array_sort(F.collect_set("s_name"))).alias(
                "categories"
            ),
            # latest_snapshots (lib.ts:370-375 / W2): max struct =
            # ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber
            # DESC LIMIT 1 per app; the winning row's s_name rides
            # along after the (unique) tiebreakers.
            F.max(
                F.struct(
                    "l_shipdate",
                    "l_orderkey",
                    "l_linenumber",
                    "s_name",
                    "l_quantity",
                    "l_extendedprice",
                )
            ).alias("latest"),
        )
        .withColumnRenamed("l_partkey", "p_partkey")
    )

    # scores: left-join metrics onto the full app list, attach global
    # maxima (MAX() OVER () rewritten as scalar agg + broadcast, W1).
    scores = (
        part.select("p_partkey", "p_name")
        .join(agged, "p_partkey", "left")
        .withColumn(
            "rec_score", F.coalesce("weighted_recommendation_score", F.lit(0.0))
        )
        .withColumn("cat_score", F.coalesce("weighted_category_score", F.lit(0.0)))
        .withColumn(
            "recommendation_count",
            F.coalesce("recommendation_count", F.lit(0)).cast("int"),
        )
    )
    # No persist needed: the maxima aggregate and the main branch are
    # two subtrees of ONE physical plan sharing identical exchanges —
    # ReusedExchange makes the second pass read shuffle output
    # (measured: persist is net-negative, it adds a materialization).
    scores = with_global_maxes(
        scores, {"rec_score": "max_rec", "cat_score": "max_cat"}
    )

    popularity = F.round(
        F.lit(REC_WEIGHT) * pg_normalize(F.col("rec_score"), F.col("max_rec"))
        + F.lit(CAT_WEIGHT) * pg_normalize(F.col("cat_score"), F.col("max_cat")),
        6,
    )

    return scores.select(
        F.col("p_partkey").alias("app_key"),
        F.col("p_name").alias("app_name"),
        F.coalesce("latest.s_name", F.lit("")).alias("developer_name"),
        F.coalesce(to_char_mmddyyyy(F.col("latest.l_shipdate")), F.lit("")).alias(
            "latest_ship_date"
        ),
        F.coalesce("latest.l_quantity", F.lit(0.0)).cast("int").alias("review_count"),
        F.round(F.coalesce("latest.l_extendedprice", F.lit(0.0)), 2).alias("rating"),
        F.coalesce("categories", F.lit("")).alias("categories"),
        F.col("recommendation_count"),
        popularity.alias("popularity_score"),
    ).orderBy(F.desc("popularity_score"), "app_key")


_DIFFICULTY_ORACLE = """
WITH customer_spend AS (
  SELECT o_custkey, SUM(o_totalprice) AS total_spend
  FROM orders GROUP BY o_custkey
), popularity_scores AS (
  SELECT c.c_custkey, c.c_nationkey, c.c_acctbal,
         COALESCE(cs.total_spend, 0) AS total_spend
  FROM customer c LEFT JOIN customer_spend cs ON c.c_custkey = cs.o_custkey
)
SELECT n.n_name AS category_name,
       CAST(COUNT(DISTINCT ps.c_custkey) AS INT) AS app_count,
       ROUND(AVG(ps.c_acctbal), 6) AS avg_popularity,
       ROUND(SUM(ps.total_spend), 2) AS total_reviews,
       ROUND(LOG10(COUNT(DISTINCT ps.c_custkey) + 1)
             * AVG(ps.c_acctbal)
             * LOG10(SUM(ps.total_spend) + 1), 6) AS difficulty_score
FROM popularity_scores ps
JOIN nation n ON ps.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY difficulty_score DESC, category_name
"""


@query("category_difficulty", oracle=_DIFFICULTY_ORACLE)
def category_difficulty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categories(nations) ranked by the reference's difficulty score
    LOG10(count+1) * AVG(popularity) * LOG10(SUM(reviews)+1)
    (reference src/utils/lib.ts:478-491 / A5)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    spend = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("total_spend")
    )
    pop = (
        cust.join(spend, cust.c_custkey == spend.o_custkey, "left")
        .withColumn("total_spend", F.coalesce("total_spend", F.lit(0.0)))
        .select("c_custkey", "c_nationkey", "c_acctbal", "total_spend")
    )
    # COUNT(DISTINCT ps.c_custkey) == COUNT(*) here: c_custkey is the
    # customer table's key (unique at every fixture SF — verified
    # r9), and pop is customer LEFT JOIN a by-custkey aggregate, so
    # each customer contributes exactly one row. The plain count drops
    # Catalyst's two-phase distinct machinery (an Expand plus an extra
    # (n_name, c_custkey)-keyed Exchange) from the plan — 2 fewer
    # shuffles, identical result (oracle-gated at all three SFs).
    agg = (
        pop.join(F.broadcast(nation), pop.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("int").alias("app_count"),
            F.avg("c_acctbal").alias("avg_pop_raw"),
            F.sum("total_spend").alias("total_spend_raw"),
        )
    )
    return agg.select(
        F.col("n_name").alias("category_name"),
        F.col("app_count"),
        F.round("avg_pop_raw", 6).alias("avg_popularity"),
        F.round("total_spend_raw", 2).alias("total_reviews"),
        F.round(
            log10_1p(F.col("app_count").cast("double"))
            * F.col("avg_pop_raw")
            * log10_1p(F.col("total_spend_raw")),
            6,
        ).alias("difficulty_score"),
    ).orderBy(F.desc("difficulty_score"), "category_name")


_CATEGORY_REPORT_ORACLE = """
WITH customer_spend AS (
  SELECT o_custkey, SUM(o_totalprice) AS total_spend
  FROM orders GROUP BY o_custkey
), popularity_scores AS (
  SELECT c.c_custkey, c.c_nationkey, c.c_acctbal,
         COALESCE(cs.total_spend, 0) AS total_spend
  FROM customer c LEFT JOIN customer_spend cs ON c.c_custkey = cs.o_custkey
), agg AS (
  SELECT n.n_name AS category_name,
         CAST(COUNT(DISTINCT ps.c_custkey) AS INT) AS app_count,
         ROUND(AVG(ps.c_acctbal), 6) AS avg_popularity,
         ROUND(SUM(ps.total_spend), 2) AS total_reviews,
         ROUND(LOG10(COUNT(DISTINCT ps.c_custkey) + 1)
               * AVG(ps.c_acctbal)
               * LOG10(SUM(ps.total_spend) + 1), 6) AS difficulty_score
  FROM popularity_scores ps
  JOIN nation n ON ps.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT '=HYPERLINK("https://apps.example.com/categories/' || category_name
         || '/all", "' || REPLACE(category_name, '"', '""') || '")' AS category_link,
       app_count, avg_popularity, total_reviews, difficulty_score
FROM agg
ORDER BY difficulty_score DESC, category_name
"""


@query("category_report", oracle=_CATEGORY_REPORT_ORACLE)
def category_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's SECOND CSV exporter (getCategoriesStats,
    src/utils/lib.ts:539-554): the difficulty ranking with an
    =HYPERLINK formula cell per category, ready for the quoted-CSV
    sink (sources/csv_report.write_csv_report)."""
    from prisma_migrator_spark.functions.pg_compat import hyperlink

    ranked = category_difficulty(spark, sf_dir)
    return ranked.select(
        hyperlink(
            F.concat(
                F.lit("https://apps.example.com/categories/"),
                F.col("category_name"),
                F.lit("/all"),
            ),
            F.col("category_name"),
        ).alias("category_link"),
        "app_count",
        "avg_popularity",
        "total_reviews",
        "difficulty_score",
    )
