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

# Round-7 driver window rotation (VERDICT r6 item 8: every
# oracle-backed query now has >=1 CORRECTNESS row, so rotation keys
# on STALENESS — the round of each query's most recent driver row,
# computed from CORRECTNESS_r01..r06). Leads with the queries new or
# touched in r7 (image pHash dedup, trained quality classifier,
# main-content extraction, the :not()-gated html cards, the
# lazy-DSIR rework, the hamming_band_pairs refactor behind the
# simhash queries, the graph snapshot-release rework), then the 38
# stalest-gated oracle-backed entries (last gated r1-r2). Everything
# past the window still runs in the replica gate
# (tools/drive_driver.py, full registry; --twice adds the
# determinism double-run).
WINDOW_R7 = [
    # -- new in r7 (third session, 2026-08-16) --
    "dim_truncation_recall",
    "fluency_isotonic_calibration",
    "semantic_contamination_report",
    "merge_phrases",
    "doc_keywords",
    "symspell_candidates",
    "term_pmi_pairs",
    "quality_ks_drift",
    "classifier_holdout_auc",
    "ann_recall_report",
    "pii_context_report",
    "mmr_diverse_topk",
    "augmented_positive_pairs",
    "cross_source_syndication",
    "temperature_mixture_sample",
    "documents_dq_report",
    "scrub_intradoc_repeats",
    "cluster_label_agreement",
    "contrastive_triples",
    "quality_per_source_deciles",
    "url_blocklist_filter",
    "dedup_savings_report",
    "hashed_doc_vectors",
    "dataset_card_report",
    "lang_verification",
    "bpe_fertility_by_lang",
    "perplexity_buckets",
    "bm25_eval_metrics",
    "lexical_diversity",
    "quality_ensemble_score",
    "compression_ratio_quality",
    "corpus_clusters_labeled",
    # -- new in r7 (continuation session, 2026-08-16) --
    "corpus_overlap_oph",
    "temperature_mixture_weights",
    "fluency_quality_auc",
    "fluency_calibration_bins",
    "embedding_pca2",
    # -- new in r7 --
    "video_near_dup_pairs",
    "html_link_pagerank",
    "hard_negatives_topk",
    "homoglyph_dedup_groups",
    "video_near_dup_clusters",
    "cc_pii_redaction",
    "html_main_content",
    "html_corpus_ingest",
    "image_near_dup_pairs",
    "image_near_dup_clusters",
    "quality_classifier_scores",
    "url_canonicalize",
    "domain_quota_sample",
    "audio_near_dup_pairs",
    # -- plans touched in r7 --
    "html_app_cards",
    "dsir_selection",
    "simhash16",
    "simhash_near_dup",
    "simhash64_near_dup",
    "copurchase_triangles",
    "copurchase_triangles_capped",
    "copurchase_cap_report",
    "copurchase_triangles_sampled",
    # -- stalest-gated rotation (most recent driver row r1-r2) --
    "corpus_stats",
    "dataset_splits",
    "deterministic_sample",
    "events_sliding_1h_30m",
    "latest_event_per_user",
    "minhash_signatures",
    "region_rollup",
    "user_event_gaps",
    "canonical_docs",
    "category_report",
    "category_sizes",
    "date_format_orders",
    "embedding_quantize_int8",
    "events_rolling_1h",
    "order_price_quartiles",
    "rank_scores",
    "recommendation_metrics",
    "top_orders_per_customer",
    "training_shards",
    "bigram_logprob_score",
    "busy_window_events",
    "clean_corpus",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (popularity ranking) on sf0.001."""
    return QUERIES["flagship_popularity"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    window-rotated by staleness, r7 plans leading (see WINDOW_R7)."""
    missing = [n for n in WINDOW_R7 if n not in QUERIES]
    assert not missing, f"WINDOW_R7 names not in registry: {missing}"
    rotated = {name: QUERIES[name] for name in WINDOW_R7}
    rotated.update({n: q for n, q in QUERIES.items() if n not in rotated})
    return rotated


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same column aliases."""
    return dict(ORACLES)
