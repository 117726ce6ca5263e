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

# Round-8 driver window rotation (VERDICT r7 items 3+4). Rotation
# rule: ERROR-last-row first (events_rolling_1h's latest driver row
# is a long-fixed r2 error; the three cluster queries errored r7 on
# list columns, now comma-joined strings), then queries whose driver
# row is stale vs their current form (the four newly oracle-backed
# conversions, the schema-changed multimodal_features, the new
# incremental_image_near_dup), then the stalest-gated oracle-backed
# tail (every r1/r2-gated query — 21 of them — fits this window, so
# after r8 no oracle-backed query's latest driver row predates r3).
# Rows-only entries are capped at 10/50 = 20% so >= 80% of the
# window is hash-verified (item 4). Everything past the window still
# runs in the replica gate (tools/drive_driver.py, full registry;
# --twice adds the determinism double-run).
WINDOW_R8 = [
    # -- error-last-row first (rotation rule, VERDICT r7 item 3) --
    "events_rolling_1h",
    "corpus_clusters_labeled",      # rows-only 1/10
    "image_near_dup_clusters",      # rows-only 2/10
    "video_near_dup_clusters",      # rows-only 3/10
    # -- newly oracle-backed in r8 (driver row still says no_oracle) --
    "bpe_merges_16",
    "bpe_fertility_by_lang",
    "cluster_label_agreement",
    "mmr_diverse_topk",
    # -- new or schema-changed in r8, never driver-gated --
    "incremental_image_near_dup",   # rows-only 4/10
    "multimodal_features",          # rows-only 5/10 (array -> exploded rows)
    "semantic_dedup_drops",
    "cross_doc_ngram_dup",
    # -- never-gated rows-only tail (one driver row each) --
    "audio_near_dup_pairs",         # rows-only 6/10
    "topk_cosine_ivf_pq",           # rows-only 7/10
    "pack_greedy_512",              # rows-only 8/10
    "jpeg_metadata",                # rows-only 9/10
    "heavy_hitter_terms_approx",    # rows-only 10/10
    # -- stalest-gated oracle-backed: last driver row r1 --
    "user_event_gaps",
    "latest_event_per_user",
    "region_rollup",
    "events_sliding_1h_30m",
    "dataset_splits",
    "deterministic_sample",
    "corpus_stats",
    "minhash_signatures",
    "simhash16",
    "simhash_near_dup",
    # -- last driver row r2 --
    "top_orders_per_customer",
    "order_price_quartiles",
    "category_sizes",
    "rank_scores",
    "recommendation_metrics",
    "date_format_orders",
    "category_report",
    "canonical_docs",
    "embedding_quantize_int8",
    "training_shards",
    # -- last driver row r3 --
    "funnel_view_click_purchase",
    "latest_per_key_lineitem",
    "busy_window_events",
    "top_terms_tfidf",
    "clean_corpus",
    "near_dup_clusters",
    "ngram_jaccard_pairs",
    "simhash64_near_dup",
    "rolling_fingerprint",
    "embedding_near_dup",
    "pii_redaction",
    "doc_chunks_overlap",
    "domain_mixture_sample",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (popularity ranking) on sf0.001."""
    return QUERIES["flagship_popularity"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    window-rotated error-first then staleness (see WINDOW_R8)."""
    missing = [n for n in WINDOW_R8 if n not in QUERIES]
    assert not missing, f"WINDOW_R8 names not in registry: {missing}"
    rotated = {name: QUERIES[name] for name in WINDOW_R8}
    rotated.update({n: q for n, q in QUERIES.items() if n not in rotated})
    return rotated


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same column aliases."""
    return dict(ORACLES)
