"""Query plan registry.

Importing this package populates :data:`QUERIES` (name → callable
``(spark, sf_dir) -> DataFrame``) and :data:`ORACLES` (name → DuckDB
SQL string). ``__spark_entry__.py`` re-exports both for the driver.
"""

from prisma_migrator_spark.plans.registry import ORACLES, QUERIES, query  # noqa: F401

# Import for registration side effects.
from prisma_migrator_spark.plans import analytics  # noqa: E402,F401
from prisma_migrator_spark.plans import core  # noqa: E402,F401
from prisma_migrator_spark.plans import events  # noqa: E402,F401
from prisma_migrator_spark.plans import flagship  # noqa: E402,F401
from prisma_migrator_spark.plans import graph  # noqa: E402,F401
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
    # --- relational / §2 core + analytics extensions (25) ---
    "flagship_popularity",       # J1-J12, F1-F4, W1, O1-O2
    "category_difficulty",       # A5 multi-metric rollup
    "latest_per_key_lineitem",   # W2 DISTINCT ON
    "semi_join_orders",          # J3 semi join
    "anti_join_customers",       # anti join (S5 backbone)
    "filter_inlist_range",       # P3-P7 predicates
    # F5 TO_CHAR signal moved to the tail (date_format_orders): the
    # flagship's latest_ship_date column exercises the same pg
    # date_format path in-window; the slot carries the round-3
    # vocab+encode family instead (encode's oracle embeds the vocab
    # build, so one row covers both).
    "encode_token_ids",
    "normalized_part_scores",    # F2 NULLIF guard, W1 normalization
    "dynamic_pivot_categories",  # R1 dynamic pivot, A6
    "hyperlink_report",          # F8 hyperlink + CSV escaping (S9 CSV
    # path shared with category_report, which moves to the tail; the
    # slot carries the round-4 entity-resolution family)
    "fuzzy_part_matches",        # blocked fuzzy-match join
    "events_json_props",         # S8 JSON extraction
    # A1/A2/A3 signal stays in-window via flagship_popularity (its
    # fused plan computes category sizes, weighted reciprocal-rank
    # scores, and recommendation metrics) and category_difficulty
    # (COUNT DISTINCT); the three standalone variants move to the
    # tail and the slots carry round-4 families:
    "scd2_part_history",         # temporal: SCD2 validity intervals
    "part_copurchase_pagerank",  # graph: fixed-iteration PageRank
    "profile_lineitem_numeric",  # one-pass table profiler
    "distinct_pair_agg",         # A4 sorted distinct array agg
    "repeat_customers_setops",   # §2.7 set operations
    # ranked-top-k signal stays via busy_window_events (its top-3
    # busiest-hours stage is the same topk_per_group operator);
    # top_orders_per_customer moves to the tail and the slot carries
    # the round-5 incremental-maintenance family, whose oracle is
    # FULL RECOMPUTE (the strongest equivalence signal in the repo).
    "incremental_sessions",
    "revenue_rollup",            # grouping-set rollup
    "event_attribution_24h",     # range-bounded attribution join
    # quantile-bucketing signal stays via quality_deciles (same
    # sketch-cut family); order_price_quartiles moves to the tail and
    # the slot carries the round-3 funnel family.
    "funnel_view_click_purchase",
    "asof_last_order",           # as-of join
    "events_tumbling_hourly",    # tumbling time window
    "events_session_30m",        # session window
    # rolling-window signal stays via tumbling+session (in-window) and
    # events_rolling_1h in the tail; the slot carries the round-3
    # substring-dedup family.
    "repeated_spans",
    # --- text / LLM pipeline families (25) ---
    "text_stats",                # stats + quality + lang-ID + tokens
    "top_terms_tfidf",           # tf-idf terms
    "clean_corpus",              # quality gating
    "exact_dedup_groups",        # exact dedup
    "minhash_lsh_pairs",         # MinHash + LSH banding
    "near_dup_clusters",         # duplicate clustering (HashToMin)
    "ngram_jaccard_pairs",       # n-gram Jaccard
    "simhash64_near_dup",        # SimHash banded Hamming (scale path)
    "rolling_fingerprint",       # Rabin-Karp fingerprinting
    "embedding_near_dup",        # embedding-cosine near-dup
    "topk_cosine_bruteforce",    # exact top-k cosine (ANN oracle)
    "multimodal_meta",           # multimodal metadata plumbing
    "doc_chunks_overlap",        # chunking with overlap
    # canonical_docs composes near_dup_clusters (in-window) with a
    # latest-per-key pick (in-window via latest_per_key_lineitem);
    # its slot carries the round-5 sparse-similarity-join family.
    "tfidf_cosine_pairs",
    "decontaminate_eval",        # eval decontamination
    "pii_redaction",             # PII redaction
    "pack_stream_512",           # stream packing (prefix sum)
    # training_shards shares pack_stream_512's two-level prefix-sum
    # machinery (in-window) and moves to the tail; the slot carries
    # the round-5 bigram-LM scoring family (the unigram variant is in
    # the tail, same plan family).
    "bigram_logprob_score",
    # embedding_quantize_int8 is a zero-shuffle map gated by pytest;
    # its slot carries the round-5 bucketized point-in-interval join
    # family (a new operator shape, not covered elsewhere in-window).
    "busy_window_events",
    "domain_mixture_sample",     # deterministic sampling / mixtures
    "gopher_repetition_flags",   # repetition/boilerplate heuristics
    "cross_corpus_dedup",        # incremental cross-corpus dedup
    "label_centroids",           # centroids / k-means step
    "quality_deciles",           # curriculum deciles (sketch cuts)
    "corpus_recipe",             # end-to-end composed pipeline
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
