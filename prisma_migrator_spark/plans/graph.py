"""Graph operators over relationship edges.

The reference's recommendation table IS a graph —
``RecommendedAppHistory(appHandle → recommendedAppHandle, position)``
(src/utils/lib.ts:231-238) — but the only graph read it performs is
weighted in-degree (src/utils/lib.ts:355-362, our
``recommendation_metrics``). The natural next question ("which apps
are central in the recommendation network, transitively?") is
PageRank. This module builds a co-purchase graph from the fixtures
(parts co-occurring in an order, per FIXTURES.md §C's
recommendation-edge mapping) and runs a fixed-iteration PageRank —
expressed entirely in DataFrame joins/aggregations so Catalyst/AQE
plan every step.

Scale notes:
- Edge generation is a self-join on the order key: candidate cost is
  Σ per-order-size² (orders hold ≤7 items), never n².
- Each PageRank iteration is ONE shuffle: edges ⋈ ranks on src
  (both pre-partitioned on the join key — AQE reuses the layout),
  then a groupBy(dst) sum. Ranks are persisted per iteration and
  unpersisted after the next materializes (same discipline as
  llm/dedup.connected_components' label propagation).
- Determinism: contributions are rounded per iteration on BOTH
  engines, so cross-engine float summation drift cannot compound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prisma_migrator_spark.catalog import load_table
from prisma_migrator_spark.plans.registry import query

#: Damping factor (standard) and fixed iteration count — fixed so the
#: result is deterministic and SQL-expressible (the oracle unrolls the
#: same three iterations).
_DAMPING = 0.85
_N_ITER = 3
#: Per-iteration rounding: kills sub-1e-9 cross-engine summation drift
#: before it can compound through the next iteration.
_ITER_SCALE = 9


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Symmetric co-purchase edges: (src, dst) part pairs appearing in
    the same order, distinct. Σ per-order² pairs, bounded by order
    size — the scalable edge generator (contrast: joining on a global
    attribute would be quadratic in the table)."""
    a = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
    )
    return pairs.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionByName(pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))


def pagerank(edges: DataFrame, n_iter: int = _N_ITER, damping: float = _DAMPING) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    ``rank_{k+1}(v) = (1-d)/N + d * Σ_{u→v} rank_k(u)/outdeg(u)``.

    The symmetric co-purchase graph has no dangling nodes (every node
    with an edge has out-degree ≥ 1), so no dangling-mass term is
    needed. N is computed as a 1-row aggregate broadcast back — no
    driver collect. Each iteration: one join + one aggregate = one
    shuffle on the edge key.
    """
    out = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    weighted = (
        edges.join(out, "src")
        .select("src", "dst", (1.0 / F.col("outdeg")).alias("w"))
    )
    # eager snapshots, not persist: each iteration's plan would chain
    # through every prior iteration otherwise (PERF.md #29), and the
    # printed-plan subtree re-emission disappears too
    weighted = weighted.localCheckpoint()
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint()
    n_df = nodes.agg(F.count("*").alias("__n"))

    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", F.round(1.0 / F.col("__n"), _ITER_SCALE).alias("rank")
    )
    for _ in range(n_iter):
        contrib = (
            weighted.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("__in"))
        )
        ranks = (
            nodes.join(contrib.select(F.col("dst").alias("node"), "__in"), "node", "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.col("__n")
                    + damping * F.coalesce(F.col("__in"), F.lit(0.0)),
                    _ITER_SCALE,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


_PAGERANK_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), edges AS (
  SELECT pa AS src, pb AS dst FROM pairs
  UNION ALL
  SELECT pb AS src, pa AS dst FROM pairs
), outdeg AS (
  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
), w AS (
  SELECT e.src, e.dst, CAST(1.0 AS DOUBLE) / o.outdeg AS w
  FROM edges e JOIN outdeg o USING (src)
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
), nn AS (
  SELECT COUNT(*) AS n FROM nodes
), r0 AS (
  SELECT node, ROUND(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn), {_ITER_SCALE}) AS rank
  FROM nodes
), r1 AS (
  SELECT nodes.node,
         ROUND(CAST({1.0 - _DAMPING!r} AS DOUBLE) / (SELECT n FROM nn)
               + CAST({_DAMPING!r} AS DOUBLE) * COALESCE(SUM(r0.rank * w.w), 0.0),
               {_ITER_SCALE}) AS rank
  FROM nodes
  LEFT JOIN w ON w.dst = nodes.node
  LEFT JOIN r0 ON r0.node = w.src
  GROUP BY nodes.node
), r2 AS (
  SELECT nodes.node,
         ROUND(CAST({1.0 - _DAMPING!r} AS DOUBLE) / (SELECT n FROM nn)
               + CAST({_DAMPING!r} AS DOUBLE) * COALESCE(SUM(r1.rank * w.w), 0.0),
               {_ITER_SCALE}) AS rank
  FROM nodes
  LEFT JOIN w ON w.dst = nodes.node
  LEFT JOIN r1 ON r1.node = w.src
  GROUP BY nodes.node
), r3 AS (
  SELECT nodes.node,
         ROUND(CAST({1.0 - _DAMPING!r} AS DOUBLE) / (SELECT n FROM nn)
               + CAST({_DAMPING!r} AS DOUBLE) * COALESCE(SUM(r2.rank * w.w), 0.0),
               {_ITER_SCALE}) AS rank
  FROM nodes
  LEFT JOIN w ON w.dst = nodes.node
  LEFT JOIN r2 ON r2.node = w.src
  GROUP BY nodes.node
)
SELECT node AS l_partkey, ROUND(rank * 1000000.0, 4) AS pagerank_ppm
FROM r3
"""


@query("part_copurchase_pagerank", oracle=_PAGERANK_ORACLE)
def part_copurchase_pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (3 iterations,
    d=0.85), reported in parts-per-million — transitive centrality of
    each part in the purchase network, the graph upgrade of the
    reference's one-hop weighted in-degree
    (src/utils/lib.ts:355-362). The oracle unrolls the identical
    three iterations as chained CTEs."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ranks = pagerank(copurchase_edges(li))
    return ranks.select(
        F.col("node").alias("l_partkey"),
        F.round(F.col("rank") * 1_000_000, 4).alias("pagerank_ppm"),
    )


# --- triangle counting (degree-oriented) ------------------------------

_TRIANGLES_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), tri AS (
  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.pa = e1.pb
  JOIN pairs e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
)
SELECT part, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (
  SELECT a AS part FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
GROUP BY part
"""


@query("copurchase_triangles", oracle=_TRIANGLES_ORACLE)
def copurchase_triangles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts in the co-purchase graph (the local
    clustering signal behind community/bundle detection).

    Spark plan uses the DEGREE-ORIENTED (compact-forward) algorithm:
    orient each undirected edge from its lower-(degree, id) endpoint
    to the higher one, build wedges by joining oriented edges
    head-to-tail, close them against a third oriented edge. Every
    triangle is found EXACTLY once, and the wedge join's cost is
    Σ out-deg² where out-degree is bounded by O(√|E|) on any graph —
    the hub that breaks the naive a<b<c join (its wedge count is
    Σ deg² over raw degrees) only ever fans out to higher-degree
    neighbors. The oracle keeps the naive orientation: same
    triangles, independently derived.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # snapshot the symmetric edge list once: it feeds the degree agg
    # AND (via the orientation) all three legs of the triangle join —
    # without the checkpoint the lineitem self-join subtree re-executes
    # per consumer (the plan printer showed it ~100x)
    und = copurchase_edges(li).localCheckpoint()
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # orient by (deg, id): lower endpoint -> higher endpoint
    e = (
        und.join(deg.withColumnRenamed("src", "s_join"), und.src == F.col("s_join"))
        .drop("s_join")
        .withColumnRenamed("deg", "deg_src")
        .join(
            deg.select(F.col("src").alias("d_join"), F.col("deg").alias("deg_dst")),
            und.dst == F.col("d_join"),
        )
        .drop("d_join")
        .where(
            (F.col("deg_src") < F.col("deg_dst"))
            | ((F.col("deg_src") == F.col("deg_dst")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
    ).localCheckpoint()  # one oriented-edge frame feeds three join legs
    wedges = (
        e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(
            e.select(F.col("src").alias("v"), F.col("dst").alias("w")), "v"
        )
    )
    closed = wedges.join(
        e.select(F.col("src").alias("u"), F.col("dst").alias("w")),
        ["u", "w"],
    )
    corners = (
        closed.select(F.col("u").alias("part"))
        .unionByName(closed.select(F.col("v").alias("part")))
        .unionByName(closed.select(F.col("w").alias("part")))
    )
    return corners.groupBy("part").agg(F.count(F.lit(1)).alias("n_triangles"))


# --- market-basket lift -----------------------------------------------

_BASKET_LIFT_ORACLE = """
WITH baskets AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders
         FROM baskets),
item AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item
  FROM baskets GROUP BY l_partkey
), pair AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, n_pair,
       ROUND(n_pair * (SELECT n_orders FROM n)
             / (ia.n_item * ib.n_item), 6) AS lift
FROM pair
JOIN item ia ON ia.l_partkey = part_a
JOIN item ib ON ib.l_partkey = part_b
WHERE n_pair >= 3
"""


@query("basket_lift_pairs", oracle=_BASKET_LIFT_ORACLE)
def basket_lift_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: for co-purchased part pairs seen in ≥3
    orders (63 pairs at sf0.01 — the fixture's baskets are small), the LIFT P(a,b)·N / (P(a)·P(b)·N²·…) — >1 means the pair
    co-occurs more than independence predicts (the association-rule
    screen behind "bought together"). Pair generation is the same
    Σ per-order² order-keyed join as copurchase_edges (bounded by
    basket size, never catalog²); item counts broadcast back onto the
    support-filtered pair frame, so the expensive join output shrinks
    before the lift math."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    n = baskets.agg(
        F.countDistinct("l_orderkey").cast("double").alias("__n_orders")
    )
    item = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    a = baskets.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = baskets.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pair = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= 3)
    )
    return (
        pair.join(
            item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("__ia")),
            "part_a",
        )
        .join(
            item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("__ib")),
            "part_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_pair",
            F.round(
                F.col("n_pair") * F.col("__n_orders")
                / (F.col("__ia") * F.col("__ib")),
                6,
            ).alias("lift"),
        )
    )
