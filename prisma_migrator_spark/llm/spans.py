"""Cross-document repeated-span detection (substring-level dedup).

Document-level dedup (exact / MinHash / SimHash, :mod:`llm.dedup`)
misses the pervasive case where DISTINCT documents share long
verbatim spans — boilerplate headers, license blocks, navigation
chrome, quoted passages. The exact tool for that is the corpus-wide
suffix array of Lee et al., "Deduplicating Training Data Makes
Language Models Better" (2021); a suffix array over 100 TB is its own
distributed-systems project, so production pipelines approximate it
with fixed-length token windows (RefinedWeb's line/span filters are
the same family): every k-token window at stride s is fingerprinted,
fingerprints are counted across the corpus, and a window occurring in
>= ``min_df`` distinct documents marks a duplicated span.

Sensitivity/cost tune with (k, stride): stride=1 is the faithful
rolling detector (catches any shared k-token span); stride=s divides
the shuffled row count by s and still catches every shared span of
>= k + s - 1 tokens.

Scale shape (100 TB): the shuffled unit is (64-bit window hash,
doc id) — ~16 bytes/row, Σ n_tokens/stride rows corpus-wide. Both
aggregations hash-partition on the window hash (near-uniform keys —
xxhash64 output — so no skew cap is needed, unlike shingle strings);
nothing is collected or broadcast. Same Σ-cost family as the
shingle-keyed Jaccard join (llm/dedup.py:212), orders of magnitude
cheaper than a suffix array, adequate for span flagging and
document-level filtering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prisma_migrator_spark.llm.text import tokens


def _window_array(words: Column, k: int, stride: int) -> Column:
    """Array of xxhash64 fingerprints, one per k-token window at the
    given stride, [] for docs shorter than k tokens. Pure map-side
    array expression — no explode until the caller needs rows."""
    n_win = F.floor((F.size(words) - F.lit(k)) / F.lit(stride)) + 1
    wins = F.transform(
        F.sequence(F.lit(0), (n_win - 1).cast("int")),
        lambda i: F.xxhash64(
            F.array_join(F.slice(words, i * stride + 1, k), " ")
        ),
    )
    return F.when(F.size(words) >= k, wins).otherwise(
        F.array().cast("array<bigint>")
    )


def window_hashes(
    docs: DataFrame,
    k: int = 8,
    stride: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (document, window position): ``(id_col, h)`` where
    ``h`` is the 64-bit fingerprint of that k-token window. Repeated
    window CONTENT within one document yields multiple rows (positions
    are what span statistics count).

    ``ensure_parallelism`` spreads the CPU-heavy tokenize+hash map
    across cores when the source is a single-split file; a no-op on
    multi-split (production) inputs."""
    from prisma_migrator_spark.catalog import ensure_parallelism

    return ensure_parallelism(docs).select(
        F.col(id_col),
        F.explode(_window_array(tokens(F.col(text_col)), k, stride)).alias("h"),
    )


def repeated_span_stats(
    docs: DataFrame,
    k: int = 8,
    stride: int = 4,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-span statistics:

    - ``n_windows``: k-token windows the document contributes;
    - ``n_dup_windows``: of those, windows whose content occurs in
      >= ``min_df`` DISTINCT documents corpus-wide;
    - ``dup_frac``: their ratio (NULL for docs shorter than k tokens).

    Every input document appears in the output (docs too short for a
    single window carry zero counts), so the result joins back 1:1 as
    a quality column for gating — e.g. drop docs with dup_frac > 0.5,
    the document-level action substring dedup pipelines actually take.

    Plan: ``n_windows`` is MAP-SIDE (the window array's length — no
    shuffle); only the duplicated-hash join and its per-doc count
    move rows. Explode windows → count distinct docs per hash → keep
    hashes with df >= min_df → join window rows to that set → per-doc
    count → left join onto the map-side spine. The dup-hash side is
    usually tiny, so AQE converts the join to a runtime broadcast; a
    boilerplate window shared by most of the corpus concentrates its
    rows on one reducer only under the sort-merge fallback, where
    AQE's skew split applies — both documented hazards of any
    hash-keyed join, with no extra defense needed here because the
    join output is 1:1 (no amplification).
    """
    wins = window_hashes(docs, k, stride, text_col, id_col)
    dup_h = (
        wins.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("df"))
        .where(F.col("df") >= min_df)
        .select("h")
    )
    per_doc_dup = (
        wins.join(dup_h, "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    spine = docs.select(
        F.col(id_col),
        F.size(_window_array(tokens(F.col(text_col)), k, stride)).alias(
            "n_windows"
        ),
    )
    return (
        spine.join(per_doc_dup, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_windows").cast("bigint").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.round(
                F.coalesce("n_dup_windows", F.lit(0))
                / F.when(F.col("n_windows") > 0, F.col("n_windows")).cast(
                    "double"
                ),
                6,
            ).alias("dup_frac"),
        )
    )


def strip_repeated_spans(
    docs: DataFrame,
    k: int = 8,
    stride: int = 4,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Scrub cross-document duplicated spans OUT of the text: every
    token covered by a window whose content occurs in >= ``min_df``
    distinct documents is dropped, the survivors are rejoined — the
    span-level removal step of substring dedup (vs the document-level
    gate of :func:`repeated_span_stats`).

    Returns ``(id_col, clean_text, n_tokens_removed)`` with every
    input document present (unaffected docs pass through verbatim).

    Plan: window hashes with positions → duplicated-hash set (one
    count-distinct aggregate) → per-doc ``collect_set`` of duplicated
    WINDOW INDEXES (ints — k× smaller than shipping covered token
    positions) → left join onto the docs → pure array expressions
    expand indexes to covered positions and filter tokens by position.
    Per-doc agg state is O(duplicated windows in that doc), bounded by
    the doc's own token count / stride — the same order as the doc
    text already riding through the pipeline, so no whale-doc hazard
    beyond what the corpus itself poses.
    """
    from prisma_migrator_spark.catalog import ensure_parallelism

    docs = ensure_parallelism(docs)
    words = tokens(F.col(text_col))
    wins = docs.select(
        F.col(id_col),
        F.posexplode(_window_array(words, k, stride)).alias("i", "h"),
    )
    dup_h = (
        wins.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("df"))
        .where(F.col("df") >= min_df)
        .select("h")
    )
    dup_idx = (
        wins.join(dup_h, "h")
        .groupBy(id_col)
        .agg(F.collect_set("i").alias("dup_idx"))
    )
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.col("dup_idx"),
                lambda i: F.sequence(i * stride, i * stride + (k - 1)),
            )
        )
    )
    kept = F.filter(
        words, lambda x, j: ~F.array_contains(F.col("__cov"), j)
    )
    return (
        docs.join(dup_idx, id_col, "left")
        .withColumn(
            "__cov",
            F.coalesce(covered, F.array().cast("array<bigint>")),
        )
        .select(
            F.col(id_col),
            F.array_join(kept, " ").alias("clean_text"),
            (F.size(words) - F.size(kept)).alias("n_tokens_removed"),
        )
    )
