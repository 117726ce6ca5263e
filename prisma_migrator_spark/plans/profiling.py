"""Data-profiling and entity-resolution operators.

A migration tool's users ask two questions the reference never
answers: "what is actually IN this table?" (before trusting a copy,
src/migrate.ts:48) and "which of these scraped records are the same
real-world thing under a slightly different name?" (the reference
dedups only on exact handles, src/utils/lib.ts:90-91). This module
adds both as first-class, oracle-verified operators: a one-pass
column profiler, a blocked fuzzy-match join, and an inverted index
over the documents corpus.

Hash-stability conventions follow plans/core.py: ROUND(x, 6) on
computed doubles, sorted arrays, explicit tiebreakers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prisma_migrator_spark.catalog import load_table
from prisma_migrator_spark.llm.text import normalized_text
from prisma_migrator_spark.plans.registry import query

# --- one-pass numeric column profiler ----------------------------------

_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_linenumber"]

_PROFILE_ORACLE = " UNION ALL ".join(
    f"""
SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       ROUND(MIN({c}) + 0.0, 6) AS min_v,
       ROUND(MAX({c}) + 0.0, 6) AS max_v,
       ROUND(AVG({c}), 6) AS avg_v
FROM lineitem"""
    for c in _PROFILE_COLS
)


@query("profile_lineitem_numeric", oracle=_PROFILE_ORACLE)
def profile_lineitem_numeric_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profiler: per-column row/null/distinct counts and
    min/max/mean for the numeric columns — the pre-migration sanity
    report (does the copy's distribution match the source?).

    Spark shape: ONE scan, ONE aggregate computing all columns' stats
    together. The multiple COUNT(DISTINCT) columns plan as a single
    Expand + one hash aggregate (exactly the grouping-sets machinery
    — rows replicate per distinct-column map-side, partial-agg'd, one
    shuffle), vs the oracle's per-column UNION ALL which scans the
    table once per column. At 100 TB: 1 scan vs |columns| scans.
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"__n_{c}"),
            (F.count("*") - F.count(c)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.round(F.min(c).cast("double"), 6).alias(f"__min_{c}"),
            F.round(F.max(c).cast("double"), 6).alias(f"__max_{c}"),
            F.round(F.avg(c), 6).alias(f"__avg_{c}"),
        ]
    wide = li.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"__n_{c}").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_v"),
            F.col(f"__max_{c}").alias("max_v"),
            F.col(f"__avg_{c}").alias("avg_v"),
        )
        for c in _PROFILE_COLS
    ]
    return wide.select(
        F.explode(F.array(*per_col)).alias("__p")
    ).select("__p.*")


# --- blocked fuzzy-match join (entity resolution) ----------------------

_FUZZY_ORACLE = """
SELECT a.p_partkey AS partkey_a, b.p_partkey AS partkey_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


@query("fuzzy_part_matches", oracle=_FUZZY_ORACLE)
def fuzzy_part_matches_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution via a blocked fuzzy join: candidate part pairs
    within the same brand block whose names are within edit distance
    2 — near-identical records the reference's exact-handle upsert
    (src/utils/lib.ts:90-91) would treat as distinct entities.

    Scale shape: the equi-join on the block key makes candidate cost
    Σ block² (never n²); Levenshtein runs JVM-side as a post-join
    filter inside the hash join. Block key choice is the knob — at
    100 TB block on (brand, length-bucket) or a phonetic key to keep
    blocks bounded; an unblocked fuzzy join is a cartesian product and
    is banned registry-wide (tests/test_plans.py).
    """
    from prisma_migrator_spark.catalog import ensure_parallelism

    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand")
    # the pair fan-out + Levenshtein run inside the probe side's tasks
    # (the block dim broadcasts); a single-row-group part scan would
    # serialize ~|block|²/2 edit distances onto one core
    a = ensure_parallelism(part).select(
        F.col("p_partkey").alias("partkey_a"),
        F.col("p_name").alias("name_a"),
        "p_brand",
    )
    b = part.select(
        F.col("p_partkey").alias("partkey_b"),
        F.col("p_name").alias("name_b"),
        "p_brand",
    )
    # |len(a)-len(b)| <= t is necessary for edit distance <= t: a
    # 1-char length filter prunes most candidates before the O(n*m)
    # Levenshtein DP; the bounded 3-arg form then early-exits any DP
    # row that already exceeds the threshold (banded DP, O(t*n) not
    # O(n*m) — Spark >= 3.5).
    dist = F.levenshtein("name_a", "name_b", 2)
    return (
        a.join(b, "p_brand")
        .where(F.col("partkey_a") < F.col("partkey_b"))
        .where(F.abs(F.length("name_a") - F.length("name_b")) <= 2)
        .where((dist >= 0) & (dist <= 2))
        .select(
            "partkey_a",
            "partkey_b",
            "name_a",
            "name_b",
            dist.cast("int").alias("edit_dist"),
        )
    )


# --- inverted index (term -> posting list) -----------------------------

_POSTINGS_ORACLE = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         UNNEST(string_split_regex(regexp_replace(lower(trim(text)),
                                                  '\\s+', ' ', 'g'),
                                   ' ')) AS term
  FROM documents
)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       ARRAY_TO_STRING(LIST(doc_id ORDER BY doc_id), ',') AS postings
FROM toks
WHERE term <> ''
GROUP BY term
HAVING COUNT(*) >= 10
"""


@query("term_postings", oracle=_POSTINGS_ORACLE)
def term_postings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: term → document frequency + sorted posting
    list, for terms appearing in ≥10 documents — the search-index /
    keyword-routing structure over a corpus.

    Shape: explode to distinct (doc, term) pairs (map-side dedup via
    the aggregate's partials), one shuffle on term, posting lists
    assembled with collect_list + array_sort (ObjectHashAggregate —
    same known-good family as distinct_pair_agg). Per-term list size
    is bounded by document frequency; for web-scale indexes the
    posting list would be delta-encoded per shard, but the shuffle
    shape is identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalized_text(F.col("text")), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .dropDuplicates(["doc_id", "term"])
    )
    return (
        toks.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .where(F.col("df") >= 10)
        .select("term", "df", "postings")
    )


# --- BM25 ranked retrieval over the corpus -----------------------------

#: Okapi BM25 constants (the standard Robertson/Lucene defaults).
_BM25_K1 = 1.2
_BM25_B = 0.75
#: Deterministic query — three mid-frequency fixture-vocabulary terms.
_BM25_QUERY = ["spark", "join", "vector"]
_BM25_K = 20

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_QUERY)

_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(string_split_regex(regexp_replace(lower(trim(text)),
                                                  '\\s+', ' ', 'g'),
                                   ' ')) AS term
  FROM documents
), tok2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY doc_id),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok2
  WHERE term IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, term
), df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
sc AS (
  SELECT tf.doc_id,
         SUM(LN((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
             * tf.tf * ({_BM25_K1} + 1)
             / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                                      + {_BM25_B} * dl.dl / stats.avgdl))
         ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(score, 6) AS bm25
FROM sc ORDER BY ROUND(score, 6) DESC, doc_id LIMIT {_BM25_K}
"""


@query("bm25_topk", oracle=_BM25_ORACLE)
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval: the top-k documents for a fixed
    multi-term query — the scoring function behind corpus search,
    eval-set contamination lookup, and retrieval-based data selection.

    score(q, d) = Σ_t IDF(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl))
    with the Lucene-robust IDF ln((N-df+0.5)/(df+0.5)+1), k1=1.2,
    b=0.75.

    Scale shape: document length and corpus stats come from the full
    token stream (one (doc)-keyed aggregate); term frequencies are
    computed ONLY for the broadcast query terms (the isin filter runs
    before the tf aggregate, so the scored stream is query-postings-
    sized, not corpus-sized); corpus stats join back as a 1-row
    broadcast; the global top-k is sort+limit — TakeOrderedAndProject
    (per-partition heaps + driver merge of k rows), never a
    single-partition window. Determinism across engines: scores are
    rounded to 6dp BEFORE the rank cut and ties break on doc_id.
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = bm25_scores(docs, _BM25_QUERY)
    return scored.orderBy(F.col("bm25").desc(), "doc_id").limit(_BM25_K)


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = _BM25_K1,
    b: float = _BM25_B,
) -> DataFrame:
    """BM25 score per document containing ≥1 query term — the scoring
    core of :func:`bm25_topk_q` (see its docstring for the scale
    shape). Returns (doc_id, bm25) with the score rounded to 6dp."""
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalized_text(F.col("text")), " ")).alias("term"),
        )
        .where(F.col("term") != "")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        toks.where(F.col("term").isin(query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    tf_norm = (
        F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * tf_norm).alias("score"))
        .select("doc_id", F.round(F.col("score"), 6).alias("bm25"))
    )


# --- one-pass pairwise correlation matrix ------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

_CORR_ORACLE = " UNION ALL ".join(
    f"""
SELECT '{a}' AS col_a, '{b}' AS col_b,
       ROUND(CORR({a}, {b}), 6) AS pearson_r
FROM lineitem"""
    for i, a in enumerate(_CORR_COLS)
    for b in _CORR_COLS[i + 1:]
)


@query("corr_matrix_lineitem", oracle=_CORR_ORACLE)
def corr_matrix_lineitem_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations between all numeric column pairs
    — the feature-redundancy screen of the profiling toolkit
    (migrating a table whose columns are >0.99 correlated usually
    means one is derived; drop it at the source).

    ONE scan + ONE aggregate computes all C(n,2) coefficients
    (``corr`` is a streaming moment aggregate with map-side partials);
    the oracle's UNION ALL pays one scan per pair. 1 scan vs 6 at
    100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1:]
    ]
    # Pearson r via population co-moments: covar_pop / (σ_pop·σ_pop)
    # is algebraically identical to corr (the 1/n factors cancel) but
    # NULLs out zero-variance columns instead of throwing Spark's
    # ANSI DIVIDE_BY_ZERO from inside the corr aggregate — matching
    # SQL CORR()'s NULL contract.
    def _r(a: str, b: str):
        denom = F.nullif(F.stddev_pop(a) * F.stddev_pop(b), F.lit(0.0))
        return F.round(F.covar_pop(a, b) / denom, 6)

    wide = li.agg(*[_r(a, b).alias(f"__r_{a}_{b}") for a, b in pairs])
    structs = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"__r_{a}_{b}").alias("pearson_r"),
        )
        for a, b in pairs
    ]
    return wide.select(F.explode(F.array(*structs)).alias("__p")).select("__p.*")


# --- declarative data-quality checks (one-pass) -----------------------


def check_constraints(df, checks) -> "DataFrame":
    """Deequ-style constraint report: ``checks`` is a list of
    (rule_name, violation_condition Column) pairs; returns one row per
    rule with total rows, violations, and the violation rate.

    ALL rules evaluate in ONE scan and one 1-row aggregate (each rule
    is a conditional sum — map-side partials, no per-rule jobs, no
    shuffle beyond the single global agg), then a map-side unpivot of
    the 1×(2+R) frame into R rows. At 100 TB adding a rule costs one
    more sum column, not another pass over the table.

    NULL semantics: a rule whose condition evaluates to NULL (e.g.
    ``col('x') > 5`` on a NULL x, with no explicit ``isNull`` guard)
    counts as a VIOLATION — for a data-quality gate, "unknown" must
    fail closed, not silently pass (a plain conditional sum would skip
    the row and undercount)."""
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.sum(F.coalesce(cond, F.lit(True)).cast("long")).alias(f"__v{i}")
        for i, (_, cond) in enumerate(checks)
    ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__total").alias("n_rows"),
                F.col(f"__v{i}").alias("n_violations"),
            )
            for i, (name, _) in enumerate(checks)
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select(
            "r.rule",
            "r.n_rows",
            "r.n_violations",
            F.round(F.col("r.n_violations") / F.col("r.n_rows"), 6).alias(
                "violation_rate"
            ),
        )
    )


_DQ_ORACLE = """
WITH t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN l_quantity IS NULL OR l_quantity <= 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
         CAST(SUM(CASE WHEN l_discount IS NULL OR l_discount < 0
                        OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
         CAST(SUM(CASE WHEN l_extendedprice IS NULL OR l_extendedprice <= 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
         CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                        OR l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_flag,
         CAST(SUM(CASE WHEN l_shipdate IS NULL
                        OR l_shipdate < TIMESTAMP '1992-01-01'
                        OR l_shipdate >= TIMESTAMP '2031-01-01'
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_date
  FROM lineitem
)
SELECT rule, n_rows, n_violations,
       ROUND(n_violations * 1.0 / n_rows, 6) AS violation_rate
FROM (
  SELECT 'quantity_positive' AS rule, n_rows, v_qty AS n_violations FROM t
  UNION ALL SELECT 'discount_in_unit_range', n_rows, v_disc FROM t
  UNION ALL SELECT 'price_positive', n_rows, v_price FROM t
  UNION ALL SELECT 'returnflag_in_domain', n_rows, v_flag FROM t
  UNION ALL SELECT 'shipdate_in_era', n_rows, v_date FROM t
)
"""


@query("lineitem_dq_report", oracle=_DQ_ORACLE)
def lineitem_dq_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate over lineitem: five declarative constraints
    evaluated in one scan (see `check_constraints`). The oracle
    recomputes each rule as an independent CASE sum."""
    li = load_table(spark, sf_dir, "lineitem")
    era_lo = F.lit("1992-01-01").cast("timestamp")
    era_hi = F.lit("2031-01-01").cast("timestamp")
    return check_constraints(
        li,
        [
            ("quantity_positive",
             F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0)),
            ("discount_in_unit_range",
             F.col("l_discount").isNull()
             | (F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
            ("price_positive",
             F.col("l_extendedprice").isNull()
             | (F.col("l_extendedprice") <= 0)),
            ("returnflag_in_domain",
             F.col("l_returnflag").isNull()
             | ~F.col("l_returnflag").isin("A", "N", "R")),
            ("shipdate_in_era",
             F.col("l_shipdate").isNull()
             | (F.col("l_shipdate") < era_lo)
             | (F.col("l_shipdate") >= era_hi)),
        ],
    )


@query("heavy_hitter_terms_approx")  # rows-only: approx_top_k's
# Count-Min-style estimates are engine-specific; pytest pins the
# sketch against the exact counts at test SF
def heavy_hitter_terms_approx_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters via the native `approx_top_k` sketch —
    the one-pass, fixed-memory alternative to the exact (term, count)
    shuffle of top_terms_tfidf/vocab_top_terms. At 100 TB the sketch
    aggregates map-side into a bounded buffer per partition and
    merges partials; no term-keyed shuffle of the corpus ever
    happens. Output: top 15 terms with estimated counts."""
    from prisma_migrator_spark.llm.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(tokens(F.col("text"))).alias("t")).where(
        F.length("t") > 0
    )
    sk = terms.agg(F.expr("approx_top_k(t, 15, 10000)").alias("tk"))
    return (
        sk.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("term"),
            F.col("e.count").cast("long").alias("est_count"),
        )
    )


# --- entity clusters: fuzzy pairs -> connected components -------------

_ENTITY_CLUSTERS_ORACLE = """
WITH RECURSIVE cand AS (
  SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
  WHERE levenshtein(a.p_name, b.p_name) <= 2
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM cand
  UNION ALL SELECT id_b, id_a FROM cand
), reach AS (
  SELECT DISTINCT src AS node, src AS r FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
), clusters AS (
  SELECT node AS p_partkey, MIN(r) AS entity_id FROM reach GROUP BY node
)
SELECT entity_id,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       MIN(p_partkey) AS canonical_partkey
FROM clusters GROUP BY entity_id
"""


@query("part_entity_clusters", oracle=_ENTITY_CLUSTERS_ORACLE)
def part_entity_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: blocked fuzzy linkage (edit
    distance ≤ 2 within brand blocks) collapsed into ENTITIES via
    HashToMin connected components — transitive closure matters
    because record linkage is not transitive ("part A≈B, B≈C" must
    land A and C in one entity even at distance 4). One row per
    multi-record entity with its canonical (min-key) record. Oracle:
    recursive-CTE closure over an independent Levenshtein join.

    Scale shape (reworked after the r5 curve batch measured
    8.7×/decade): the linkage predicate depends only on
    (brand, name), so EXACT duplicates collapse FIRST — one
    (brand, name) hash agg with map-side combine — and the
    Levenshtein self-join runs over DISTINCT names only
    (vocabulary-sized, not record-sized; record-level pair output on
    duplicate-heavy corpora is intrinsically quadratic — Σ group²
    pairs existed only to be re-collapsed by the components step).
    Components over representatives expand back exactly: a rep is the
    min partkey of its group, so component minima equal record-level
    cluster ids, and n_records is the sum of group sizes. Singleton
    reps with ≥2 identical records are their own entity (their
    records pair with each other); unique unlinked records drop, as
    before. At 100 TB the remaining quadratic is Σ block² over
    distinct names per brand — if the real vocabulary outgrows that,
    refine the block key (q-gram/segment blocking), not the collapse."""
    from prisma_migrator_spark.catalog import ensure_parallelism
    from prisma_migrator_spark.llm.dedup import near_dup_clusters

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand"
    )
    reps = (
        ensure_parallelism(part)
        .groupBy("p_brand", "p_name")
        .agg(
            F.min("p_partkey").alias("rep_id"),
            F.count(F.lit(1)).alias("n_dup"),
        )
    )
    a = reps.select(
        F.col("rep_id").alias("id_a"), F.col("p_name").alias("na"), "p_brand"
    )
    b = reps.select(
        F.col("rep_id").alias("id_b"), F.col("p_name").alias("nb"), "p_brand"
    )
    pairs = (
        a.join(b, "p_brand")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.length("na") - F.length("nb")) <= 2)
            # 3-arg levenshtein returns -1 when the threshold is
            # exceeded, so the keep-condition is >= 0, never <= t
            & (F.levenshtein("na", "nb", 2) >= 0)
        )
        .select("id_a", "id_b")
    )
    clusters = near_dup_clusters(pairs)
    merged = reps.join(
        clusters, reps.rep_id == clusters.doc_id, "left"
    ).select(
        F.coalesce(F.col("cluster_id"), F.col("rep_id")).alias("entity_id"),
        "rep_id",
        "n_dup",
    )
    return (
        merged.groupBy("entity_id")
        .agg(
            F.sum("n_dup").alias("n_records"),
            F.min("rep_id").alias("canonical_partkey"),
        )
        .where(F.col("n_records") >= 2)
    )


# --- join-key skew diagnosis ------------------------------------------

_KEY_SKEW_ORACLE = """
WITH c AS (
  SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
), tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM c)
SELECT key, n,
       ROUND(n * 1.0 / (SELECT total FROM tot), 6) AS share,
       ROUND(n * 1.0 * (SELECT n_keys FROM tot)
             / (SELECT total FROM tot), 6) AS x_uniform
FROM c
ORDER BY n DESC, key ASC
LIMIT 10
"""


@query("lineitem_key_skew_report", oracle=_KEY_SKEW_ORACLE)
def lineitem_key_skew_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnosis for a prospective join/agg key: the 10 heaviest
    values of l_suppkey with each one's share of the table and its
    multiple of the uniform expectation — the number that tells you
    whether AQE's skew split suffices or `salted_join` / a salted
    aggregate is warranted (PERF.md #34's decision input). One count
    shuffle with map-side combine, totals as a 1-row broadcast,
    top-10 as a TakeOrdered."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("key")
    )
    c = li.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(
        F.sum("n").alias("__total"), F.count(F.lit(1)).alias("__nkeys")
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("__total"), 6).alias("share"),
            F.round(
                F.col("n") * F.col("__nkeys") / F.col("__total"), 6
            ).alias("x_uniform"),
        )
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(10)
    )


# --- group-wise regression (trend) ------------------------------------

_TREND_ORACLE = """
SELECT l_suppkey,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       ROUND(REGR_SLOPE(l_extendedprice,
                        EPOCH_US(l_shipdate) / 86400000000.0), 6) AS slope_per_day,
       ROUND(REGR_R2(l_extendedprice,
                     EPOCH_US(l_shipdate) / 86400000000.0), 6) AS r2
FROM lineitem
GROUP BY l_suppkey
HAVING COUNT(*) >= 30
"""


@query("supplier_price_trend", oracle=_TREND_ORACLE)
def supplier_price_trend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier price trend: least-squares slope (per day) and R²
    of price against time, for suppliers with ≥30 observations —
    drift detection as a GROUPED AGGREGATE (regr_slope/regr_r2 keep
    constant state per group: sums and cross-moments), not a per-key
    model fit loop. One shuffle with map-side partials; at 100 TB
    this is the cheapest possible "which series are trending"
    screen."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (F.unix_micros("l_shipdate") / 86_400_000_000.0).alias("day"),
        "l_extendedprice",
    )
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(F.expr("regr_slope(l_extendedprice, day)"), 6).alias(
                "slope_per_day"
            ),
            F.round(F.expr("regr_r2(l_extendedprice, day)"), 6).alias("r2"),
        )
        .where(F.col("n_obs") >= 30)
    )


# --- retrieval-quality evaluation (MRR + nDCG@10) -----------------------

#: Deterministic eval query set over the fixture vocabulary — five
#: two-term queries; relevance is derived from the documents
#: themselves (graded rel = number of distinct query terms present,
#: full-match = relevant for MRR), so the benchmark needs no external
#: judgment file and both engines can restate it exactly.
_EVAL_QUERIES: list[tuple[int, list[str]]] = [
    (1, ["spark", "join"]),
    (2, ["vector", "hash"]),
    (3, ["stream", "window"]),
    (4, ["merge", "sort"]),
    (5, ["customer", "filter"]),
]
_EVAL_K = 10

_EVAL_QTERMS_SQL = " UNION ALL ".join(
    f"SELECT {qid} AS query_id, '{t}' AS term"
    for qid, terms in _EVAL_QUERIES
    for t in terms
)

_BM25_EVAL_ORACLE = f"""
WITH qterms AS ({_EVAL_QTERMS_SQL}),
nterms AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM qterms GROUP BY query_id
), toks AS (
  SELECT doc_id,
         UNNEST(string_split_regex(regexp_replace(lower(trim(text)),
                                                  '\\s+', ' ', 'g'),
                                   ' ')) AS term
  FROM documents
), tok2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY doc_id),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl),
tf AS (
  SELECT q.query_id, t.doc_id, t.term, COUNT(*) AS tf
  FROM tok2 t JOIN qterms q USING (term)
  GROUP BY q.query_id, t.doc_id, t.term
), df AS (
  SELECT query_id, term, CAST(COUNT(*) AS DOUBLE) AS df
  FROM tf GROUP BY query_id, term
), sc AS (
  SELECT tf.query_id, tf.doc_id,
         ROUND(SUM(LN((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
             * tf.tf * ({_BM25_K1} + 1)
             / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                                      + {_BM25_B} * dl.dl / stats.avgdl))
         ), 6) AS bm25
  FROM tf JOIN df USING (query_id, term) JOIN dl USING (doc_id)
       CROSS JOIN stats
  GROUP BY tf.query_id, tf.doc_id
), rel AS (
  SELECT query_id, doc_id, CAST(COUNT(DISTINCT term) AS BIGINT) AS rel
  FROM tf GROUP BY query_id, doc_id
), ranked AS (
  SELECT query_id, doc_id, bm25,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY bm25 DESC, doc_id) AS rnk
  FROM sc
), top AS (
  SELECT r.query_id, r.rnk, rel.rel
  FROM ranked r JOIN rel USING (query_id, doc_id)
  WHERE r.rnk <= {_EVAL_K}
), dcg AS (
  SELECT query_id,
         SUM((POWER(2.0, rel) - 1) / LOG2(rnk + 1.0)) AS dcg
  FROM top GROUP BY query_id
), mrr AS (
  SELECT t.query_id, MIN(t.rnk) AS first_full
  FROM top t JOIN nterms n USING (query_id)
  WHERE t.rel = n.n_terms
  GROUP BY t.query_id
), ideal AS (
  SELECT query_id, rel,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rel DESC, doc_id) AS pos
  FROM rel
), idcg AS (
  SELECT query_id,
         SUM((POWER(2.0, rel) - 1) / LOG2(pos + 1.0)) AS idcg
  FROM ideal WHERE pos <= {_EVAL_K} GROUP BY query_id
)
SELECT d.query_id,
       ROUND(COALESCE(1.0 / m.first_full, 0.0), 6) AS mrr,
       ROUND(d.dcg / i.idcg, 6) AS ndcg10
FROM dcg d
JOIN idcg i USING (query_id)
LEFT JOIN mrr m USING (query_id)
"""


@query("bm25_eval_metrics", oracle=_BM25_EVAL_ORACLE)
def bm25_eval_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation of the BM25 ranker: MRR and
    nDCG@10 per eval query — the measurement loop a retrieval-based
    curation stage (contamination lookup, RAG data selection) runs
    after every index or scorer change. Relevance is self-labeled
    from term coverage (graded rel = distinct query terms present;
    MRR counts only full matches), making the benchmark deterministic
    and engine-restatable.

    Plan shape: ONE token scan feeds doc lengths and the
    query-postings-sized tf table (the broadcast qterms join runs
    before any aggregate, so everything after the scan is
    postings-sized, not corpus-sized); BM25 scores per (query, doc)
    reuse the bm25_topk discipline (6dp round BEFORE the rank cut,
    doc_id tiebreak); ranking windows partition BY QUERY — state is
    one query's candidate list, never the corpus; DCG/IDCG/MRR are
    |queries|-row aggregates. At 100 TB with Q queries the shuffled
    mass is Σ_q postings(q), the same as Q separate searches, in one
    plan."""
    from prisma_migrator_spark.llm.text import normalized_text

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(normalized_text(F.col("text")), " ")).alias("term"),
    ).where(F.col("term") != "")
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in _EVAL_QUERIES for t in terms],
        "query_id int, term string",
    )
    nterms = spark.createDataFrame(
        [(qid, len(terms)) for qid, terms in _EVAL_QUERIES],
        "query_id int, n_terms long",
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        toks.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("query_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    tf_norm = (
        F.col("tf")
        * (_BM25_K1 + 1)
        / (F.col("tf")
           + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")))
    )
    sc = (
        tf.join(F.broadcast(df), ["query_id", "term"])
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_norm), 6).alias("bm25"))
    )
    rel = tf.groupBy("query_id", "doc_id").agg(
        F.count_distinct("term").alias("rel")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    # the ranked cut is ≤ Q·k rows — broadcast IT against the
    # postings-sized rel table, never shuffle rel to meet it
    top = F.broadcast(
        sc.withColumn("rnk", F.row_number().over(w_rank))
        .where(F.col("rnk") <= _EVAL_K)
    ).join(rel, ["query_id", "doc_id"])
    gain = F.pow(F.lit(2.0), F.col("rel")) - 1
    dcg = top.groupBy("query_id").agg(
        F.sum(gain / F.log2(F.col("rnk") + 1.0)).alias("dcg")
    )
    mrr = (
        top.join(F.broadcast(nterms), "query_id")
        .where(F.col("rel") == F.col("n_terms"))
        .groupBy("query_id")
        .agg(F.min("rnk").alias("first_full"))
    )
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id")
    )
    idcg = (
        rel.withColumn("pos", F.row_number().over(w_ideal))
        .where(F.col("pos") <= _EVAL_K)
        .groupBy("query_id")
        .agg(F.sum(gain / F.log2(F.col("pos") + 1.0)).alias("idcg"))
    )
    # dcg/idcg/mrr are |queries|-row frames: broadcast the tails
    return (
        dcg.join(F.broadcast(idcg), "query_id")
        .join(F.broadcast(mrr), "query_id", "left")
        .select(
            "query_id",
            F.round(F.coalesce(1.0 / F.col("first_full"), F.lit(0.0)), 6)
            .alias("mrr"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg10"),
        )
    )


# --- documents-table data-quality report ---------------------------------

_DOCS_DQ_ORACLE = r"""
WITH t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN text IS NULL OR length(trim(text)) = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_empty,
         CAST(SUM(CASE WHEN n_chars IS NULL OR n_chars <> length(text)
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_nchars,
         CAST(SUM(CASE WHEN lang NOT IN ('en', 'de', 'es', 'fr', 'zh')
                        OR lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_lang,
         CAST(SUM(CASE WHEN source IS NULL OR source NOT LIKE 'src%'
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_src,
         CAST(SUM(CASE WHEN length(text) < 100 THEN 1 ELSE 0 END)
              AS BIGINT) AS v_short,
         CAST(SUM(CASE WHEN len(string_split_regex(lower(trim(text)),
                                                   '\s+')) < 20
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_toks
  FROM documents
)
SELECT rule, n_rows, n_violations,
       ROUND(n_violations * 1.0 / n_rows, 6) AS violation_rate
FROM (
  SELECT 'text_nonempty' AS rule, n_rows, v_empty AS n_violations FROM t
  UNION ALL SELECT 'n_chars_consistent', n_rows, v_nchars FROM t
  UNION ALL SELECT 'lang_in_domain', n_rows, v_lang FROM t
  UNION ALL SELECT 'source_wellformed', n_rows, v_src FROM t
  UNION ALL SELECT 'min_length_100_chars', n_rows, v_short FROM t
  UNION ALL SELECT 'min_20_tokens', n_rows, v_toks FROM t
)
"""


@query("documents_dq_report", oracle=_DOCS_DQ_ORACLE)
def documents_dq_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate for the TEXT corpus — the
    profiling family's `check_constraints` pointed at the documents
    table: structural invariants (non-empty text, n_chars metadata
    consistent with the payload, lang/source in domain — all expected
    to hold at 0 violations) alongside ingestion policy rules
    (minimum length in chars and tokens — expected to FIRE on the
    short tail, so the report is never vacuous). Six rules, ONE scan,
    one 1-row aggregate, map-side unpivot; a new rule costs one sum
    column, not another pass (100 TB discipline as lineitem_dq)."""
    from prisma_migrator_spark.llm.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    checks = [
        ("text_nonempty", t.isNull() | (F.length(F.trim(t)) == 0)),
        ("n_chars_consistent",
         F.col("n_chars").isNull() | (F.col("n_chars") != F.length(t))),
        ("lang_in_domain",
         ~F.col("lang").isin("en", "de", "es", "fr", "zh")),
        ("source_wellformed", ~F.col("source").startswith("src")),
        ("min_length_100_chars", F.length(t) < 100),
        ("min_20_tokens", F.size(tokens(t)) < 20),
    ]
    return check_constraints(docs, checks)
