"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in :mod:`prisma_migrator_spark`; this module
only adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from prisma_migrator_spark.plans import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Round-6 driver window rotation (VERDICT r5 item 3): the driver
# gates the FIRST 50 registry entries each round. Leads with the only
# two oracle-backed queries never driver-gated (added mid-r5 after
# that window froze) — after this round every oracle-backed query has
# a driver CORRECTNESS row — then 48 oracle-backed representatives
# rotated from OUTSIDE the r5 window, biased toward plans touched
# this round (html_app_cards: attribute-selector oracle; the graph
# family: bytes-per-edge rework). Everything past the window still
# runs in the replica gate (tools/drive_driver.py, full registry).
WINDOW_R6 = [
    # -- never driver-gated (added mid-r5) --
    "doc_containment_pairs_capped",
    "tfidf_cosine_pairs_capped",
    # -- new in r6 --
    "bm25_topk",
    "dsir_selection",
    "leakage_safe_split",
    "eval_contamination_report",
    # -- plans touched in r6 --
    "html_app_cards",
    "copurchase_triangles_capped",
    "copurchase_communities",
    "copurchase_triangles",
    "part_copurchase_pagerank",
    # -- rotated representatives (not in the r5 window) --
    "anti_join_customers",
    "semi_join_orders",
    "filter_inlist_range",
    "normalized_part_scores",
    "dynamic_pivot_categories",
    "hyperlink_report",
    "distinct_pair_agg",
    "repeat_customers_setops",
    "revenue_rollup",
    "event_attribution_24h",
    "asof_last_order",
    "events_tumbling_hourly",
    "events_session_30m",
    "text_stats",
    "exact_dedup_groups",
    "topk_cosine_bruteforce",
    "apps_by_category_open",
    "vocab_top_terms",
    "part_entity_clusters",
    "lineitem_dq_report",
    "corr_matrix_lineitem",
    "part_price_twap",
    "part_price_ohlc_monthly",
    "part_state_asof",
    "supplier_price_trend",
    "event_sessions_gap30m",
    "session_path_trigrams",
    "user_value_ses_2level",
    "event_value_mad_outliers",
    "events_wau",
    "funnel_latency_percentiles",
    "customer_rfm_segments",
    "top_terms_per_source",
    "incremental_lsh_dedup",
    "semantic_canonical_docs",
    "scrub_repeated_spans",
    "quality_gate_p10",
    "ngram_jaccard_prefix",
    "doc_chunks",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (popularity ranking) on sf0.001."""
    return QUERIES["flagship_popularity"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    window-rotated so never-gated queries lead (see WINDOW_R6)."""
    missing = [n for n in WINDOW_R6 if n not in QUERIES]
    assert not missing, f"WINDOW_R6 names not in registry: {missing}"
    rotated = {name: QUERIES[name] for name in WINDOW_R6}
    rotated.update({n: q for n, q in QUERIES.items() if n not in rotated})
    return rotated


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same column aliases."""
    return dict(ORACLES)
