"""Query plan registry.

Importing this package populates :data:`QUERIES` (name → callable
``(spark, sf_dir) -> DataFrame``) and :data:`ORACLES` (name → DuckDB
SQL string). ``__spark_entry__.py`` re-exports both for the driver.
"""

from prisma_migrator_spark.plans.registry import ORACLES, QUERIES, query  # noqa: F401

# Import for registration side effects.
from prisma_migrator_spark.plans import analytics  # noqa: E402,F401
from prisma_migrator_spark.plans import core  # noqa: E402,F401
from prisma_migrator_spark.plans import daily  # noqa: E402,F401
from prisma_migrator_spark.plans import events  # noqa: E402,F401
from prisma_migrator_spark.plans import flagship  # noqa: E402,F401
from prisma_migrator_spark.plans import graph  # noqa: E402,F401
from prisma_migrator_spark.plans import html  # noqa: E402,F401
from prisma_migrator_spark.plans import ingest  # noqa: E402,F401
from prisma_migrator_spark.plans import llm  # noqa: E402,F401
from prisma_migrator_spark.plans import profiling  # noqa: E402,F401
from prisma_migrator_spark.plans import temporal  # noqa: E402,F401

# The round driver records a CORRECTNESS row only for the FIRST 50
# registered queries, in dict order. With 75 registered, plain
# module-import order left 25 late-registered LLM queries with no
# automatic correctness signal (round-1 verdict, item 2). The fix:
# an explicit driver window — exactly 50 oracle-bearing queries, at
# least one per SURVEY §2 operator family and per LLM-pipeline
# family. Redundant variants of an in-window representative (e.g.
# simhash16 vs simhash64_near_dup, minhash_signatures vs
# minhash_lsh_pairs) sit after the window; they stay registered and
# remain covered by tests/test_oracle_parity and tools/drive_driver.
DRIVER_WINDOW: list[str] = [
    # ROUND-4 ROTATION (VERDICT r3 item 4): 25 never-before-windowed
    # queries swapped in for entries green >=2 prior rounds; every
    # rotated-out name keeps replica-gate + pytest coverage in the
    # tail. One representative per SURVEY §2 / LLM family retained.
    # --- family representatives retained (25) ---
    "flagship_popularity",       # J1-J12, A1-A3, W1-W2, F1-F4, O1-O2
    "category_difficulty",       # A5 multi-metric rollup
    "anti_join_customers",       # anti join (S5 backbone)
    "semi_join_orders",          # J3 semi join + runtime bloom story
    "filter_inlist_range",       # P3-P6 static predicates
    "normalized_part_scores",    # F2 NULLIF guard, W1 normalization
    "dynamic_pivot_categories",  # R1 dynamic pivot, A6
    "hyperlink_report",          # F8 hyperlink + CSV escaping (S9)
    "events_json_props",         # S8 JSON extraction
    "distinct_pair_agg",         # A4 sorted distinct array agg
    "repeat_customers_setops",   # §2.7 set operations
    "revenue_rollup",            # grouping-set rollup
    "event_attribution_24h",     # range-bounded attribution join
    "asof_last_order",           # as-of join
    "events_tumbling_hourly",    # tumbling time window
    "events_session_30m",        # session window
    "incremental_sessions",      # r4 CHANGED: unrounded partial sums
    "text_stats",                # stats + quality + lang-ID + tokens
    "exact_dedup_groups",        # exact dedup
    "minhash_lsh_pairs",         # MinHash + LSH banding
    # embedding_near_dup (label-bucketed oracle form, green r01-r03)
    # yields its seat to the sign-LSH scale path, which gained a full
    # DuckDB oracle this round (planes embedded as SQL literals):
    "embedding_near_dup_lsh",    # sign-LSH near-dup (r4 NEW oracle)
    "topk_cosine_bruteforce",    # exact top-k cosine (ANN oracle)
    "multimodal_meta",           # multimodal metadata plumbing
    "decontaminate_eval",        # eval decontamination
    "pack_stream_512",           # r4 CHANGED: bounded offset window
    # --- never-before-windowed (25) ---
    "apps_by_category",          # r4 NEW: P7+J3+W2 composed entry
    "apps_by_category_open",     # r4 NEW: TRUE-branch assembly
    "vocab_top_terms",           # vocabulary build (bounded window)
    "part_entity_clusters",      # entity resolution clustering
    "copurchase_triangles",      # graph triangle counting
    "lineitem_dq_report",        # r4 CHANGED: NULL-as-violation gate
    "corr_matrix_lineitem",      # one-pass correlation matrix
    "part_price_twap",           # time-weighted average price
    "part_price_ohlc_monthly",   # OHLC bars
    "part_state_asof",           # as-of state reconstruction
    "supplier_price_trend",      # per-key regression slopes
    "event_sessions_gap30m",     # gaps-and-islands sessionization
    "session_path_trigrams",     # session path mining
    "user_value_ses_2level",     # two-level exponential smoothing
    "event_value_mad_outliers",  # median/MAD robust outliers
    "events_wau",                # sliding weekly-active distincts
    "funnel_latency_percentiles",  # funnel step latencies
    "customer_rfm_segments",     # RFM segmentation
    "top_terms_per_source",      # tf-idf per group (topk_per_group)
    "incremental_lsh_dedup",     # incremental LSH index dedup
    "semantic_canonical_docs",   # cluster-then-canonical-pick
    "scrub_repeated_spans",      # span scrubbing (the shadowed pin)
    "quality_gate_p10",          # percentile quality gating
    "ngram_jaccard_prefix",      # PPJoin prefix-filtered Jaccard
    "doc_chunks",                # fixed-length chunking
]


def _apply_driver_window() -> None:
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    without_oracle = [n for n in DRIVER_WINDOW if n not in ORACLES]
    if missing or without_oracle or len(DRIVER_WINDOW) != 50:
        raise RuntimeError(
            f"DRIVER_WINDOW invalid: missing={missing} "
            f"no_oracle={without_oracle} len={len(DRIVER_WINDOW)}"
        )
    tail = [n for n in QUERIES if n not in set(DRIVER_WINDOW)]
    ordered = {n: QUERIES[n] for n in [*DRIVER_WINDOW, *tail]}
    QUERIES.clear()
    QUERIES.update(ordered)
    ordered_oracles = {n: ORACLES[n] for n in QUERIES if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(ordered_oracles)


_apply_driver_window()
