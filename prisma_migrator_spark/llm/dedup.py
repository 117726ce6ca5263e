"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Design for 100 TB:

- **exact**: hash-groupBy on a content fingerprint — one shuffle keyed
  by a 128-bit hash; group sizes are tiny so no skew.
- **MinHash + LSH**: shingle → H min-hashes per doc (one explode +
  one groupBy) → band buckets → candidate pairs via self-join on the
  band value. The self-join is keyed on band buckets, so its cost is
  Σ bucket², not n² — the whole point of LSH. Verification (exact
  Jaccard) runs only on candidates.
- **SimHash**: per-token hash bits summed per doc (explode + groupBy);
  near-dup = signatures within Hamming distance d. Bits derive from
  md5 hex (engine-portable) rather than a JVM-private hash so the
  DuckDB oracle can reproduce them bit-for-bit.
- **n-gram Jaccard**: exact set overlap via a shingle-keyed join —
  |A∩B| from co-occurring shingles, |A∪B| = |A|+|B|−|A∩B|.
- **embedding cosine**: near-dup pairs above a cosine threshold; the
  scale path buckets candidates first (see similarity.lsh_buckets).

All hashes are md5-derived → deterministic across engines, runs, and
partitionings (no JVM hash seeding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prisma_migrator_spark.operators.driver_state import bounded_collect

from prisma_migrator_spark.llm.text import content_fingerprint, normalized_text


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group documents by content fingerprint: canonical id (min),
    group size. ``group_size > 1`` rows are duplicate clusters."""
    return (
        df.select(id_col, content_fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").cast("int").alias("group_size"),
        )
    )


def dedupe_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per distinct content (the min-id row)."""
    w_min = exact_dedup_groups(df, text_col, id_col).select(
        F.col("canonical_id").alias(id_col)
    )
    return df.join(w_min, id_col, "left_semi")


def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    distinct: bool = True,
    parallelize: bool = True,
    keep_empty: bool = False,
) -> DataFrame:
    """Word k-gram shingles per document (exploded).

    ``keep_empty=True`` emits one NULL-shingle row for a document with
    fewer than ``k`` tokens (``explode_outer`` over an empty gram
    array) instead of dropping it — so per-doc aggregations downstream
    see EVERY document and zero-fill joins become unnecessary (r9).

    ``distinct=False`` skips the per-doc dedup shuffle — correct for
    consumers insensitive to shingle multiplicity (MIN-based minhash),
    which then run with zero extra shuffles before their own groupBy.

    The token array is materialized as a column BEFORE the k-gram
    lambda: nesting the split inside ``transform`` makes Spark
    re-evaluate the regexp+split per element (O(tokens²) regex work
    per doc — measured 10x slowdown). ``ensure_parallelism`` spreads
    the CPU-heavy explode across all cores when the source is a
    single-split file; at scale the source has many splits and it is
    a no-op.

    ``parallelize=False`` skips that check AND its repartition — for
    callers whose input is known tiny (e.g. an eval benchmark set),
    where the exchange plus partition-probe round trip costs more
    than the single-task shingling it would spread (r9).
    """
    from prisma_migrator_spark.catalog import ensure_parallelism

    if parallelize:
        df = ensure_parallelism(df)
    tokenized = df.select(
        id_col, F.split(normalized_text(F.col(text_col)), " ").alias("__w")
    )
    w = F.col("__w")
    gram = F.transform(
        F.sequence(F.lit(0), F.size(w) - k),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(k)]),
    )
    if keep_empty:
        # guard the sequence: size(w) < k would make it DESCEND
        safe = F.when(F.size(w) >= k, gram).otherwise(
            F.array().cast("array<string>")
        )
        exploded = tokenized.select(
            id_col, F.explode_outer(safe).alias("shingle")
        )
    else:
        exploded = tokenized.where(F.size(w) >= k).select(
            id_col, F.explode(gram).alias("shingle")
        )
    return exploded.dropDuplicates([id_col, "shingle"]) if distinct else exploded


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 8
) -> DataFrame:
    """H seeded min-hashes per doc over its shingle set. md5-seeded:
    h_i(s) = min of the first 60 bits of md5('<i>:' || s) as a long —
    portable and deterministic (15 hex digits always fit a signed 64).

    Numeric (not string) mins on purpose: ``min(string)`` has an
    immutable agg buffer, so Spark plans a per-partition-sorting
    SortAggregate over the exploded shingle rows; ``min(long)`` stays
    in HashAggregate with map-side partials, and the signature shuffle
    carries 8 longs instead of 8 hex strings (4x fewer bytes)."""
    aggs = [
        F.min(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Banded LSH: docs sharing any band of the signature become a
    candidate pair (id_a < id_b), with the signature-agreement
    fraction as the Jaccard estimate.

    Pair generation is a per-band ``collect_list`` + in-array pair
    explode, not a band self-join: ONE shuffle of (band, id) rows
    instead of two join sides, and the (at 100 TB, vast) majority of
    bands with a single member never produce a row at all — the
    size filter drops them before any pair exists. Per-band memory
    is bounded by the bucket size.

    ``max_bucket`` is the skew bound: a band shared by b docs emits
    C(b,2) pairs, so one boilerplate bucket of 10^6 docs would emit
    5*10^11 pairs and sink the stage. Buckets larger than the cap
    are dropped (standard LSH practice — such docs are
    near-identical boilerplate that exact dedup already collapses,
    and true near-dups this common almost surely co-occur in a
    smaller band too). None = no cap (exact oracle parity).

    Single-pass shape (r9, guide §2.3/§2.4): the full signature rides
    WITH its id into the band shuffle, and the agreement count is
    computed inside the per-bucket pair explode — so the
    shingle→minhash pipeline runs exactly once and there is no
    signature re-join (the r8 form joined ``sigs`` back twice to
    attach h0..h7, which re-derived the whole minhash pipeline per
    join side; the persist() meant to prevent that lost the race when
    AQE ran the branches concurrently — measured duplicate ~8 CPU-s
    stages at sf0.1). The banded shuffle carries num_hashes longs per
    (doc, band) row — bounded, and strictly cheaper than re-deriving
    or re-shuffling the signature table twice.
    """
    n_bands = num_hashes // band_size
    hs = [f"h{i}" for i in range(num_hashes)]
    bands = F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"h{b * band_size + r}") for r in range(band_size)],
            )
            for b in range(n_bands)
        ]
    )
    banded = sigs.select(id_col, *hs, F.explode(bands).alias("band"))
    # per-band member array (sorted by id: struct comparison leads
    # with id_col, so array_sort orders members ascending by id and
    # the slice-pairing below yields id_a < id_b)
    buckets = banded.groupBy("band").agg(
        F.array_sort(F.collect_list(F.struct(id_col, *hs))).alias("__m")
    )
    size_ok = F.size("__m") >= 2
    if max_bucket is not None:
        size_ok = size_ok & (F.size("__m") <= max_bucket)
    m = F.col("__m")

    def _agree(x, y):
        out = F.lit(0)
        for h in hs:
            out = out + F.when(x[h] == y[h], 1).otherwise(0)
        return out

    pair_arr = F.flatten(
        F.transform(
            m,
            lambda x, i: F.transform(
                F.slice(m, i + F.lit(2), F.size(m)),
                lambda y: F.struct(
                    x[id_col].alias("id_a"),
                    y[id_col].alias("id_b"),
                    _agree(x, y).alias("agree"),
                ),
            ),
        )
    )
    # agree is functionally determined by (id_a, id_b) — every band a
    # pair co-occurs in sees the same two signatures — so deduping on
    # the ids alone is deterministic.
    return (
        buckets.where(size_ok)
        .select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b", "p.agree")
        .dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            F.round(F.col("agree") / F.lit(float(num_hashes)), 6).alias(
                "jaccard_est"
            ),
        )
    )


def ngram_jaccard_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    min_jaccard: float = 0.0,
    max_candidate_pairs: int | None = 50_000_000,
) -> DataFrame:
    """Exact Jaccard over shingle sets for every pair sharing ≥1
    shingle. Join is shingle-keyed (cost Σ df(shingle)², not n²).

    Guard: Σ df² explodes on boilerplate-heavy corpora (measured 830 s
    naive vs 5.3 s prefix-filtered at 20k docs — PERF.md #23), so
    before building the join this estimates the candidate-pair count
    from the shingle-df histogram (ONE cheap count-aggregate over the
    shingle frame) and raises past ``max_candidate_pairs``, pointing
    at :func:`ngram_jaccard_pairs_prefix` — the PPJoin-style scale
    path. Pass ``None`` to skip the estimate (e.g. when the caller
    already knows the corpus is near-dup-sparse)."""
    if max_candidate_pairs is not None:
        est = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("cand"))
            .first()["cand"]
        ) or 0
        if est > max_candidate_pairs:
            raise ValueError(
                f"ngram_jaccard_pairs: ~{int(est):,} candidate pairs from the "
                f"shingle-df histogram exceeds max_candidate_pairs="
                f"{max_candidate_pairs:,} — this corpus is boilerplate-heavy; "
                "use ngram_jaccard_pairs_prefix (prefix-filtered, same "
                "result above its threshold) or raise the cap explicitly."
            )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= min_jaccard)
    )


def simhash_bit_source(j: int, n_bits: int) -> tuple[int, int]:
    """(hex-digit index, nibble mask) providing bit ``j`` of a token's
    projection, shared by the Spark builder and the DuckDB oracle.
    n_bits <= 32: one bit per md5 hex digit (digit j, high bit) —
    identical to the original 16-bit scheme. n_bits <= 64: two bits
    per digit (masks 8 then 4)."""
    if n_bits <= 32:
        return j, 8
    if n_bits <= 64:
        return j // 2, 8 >> (j % 2)
    raise ValueError("simhash supports at most 64 bits (md5 nibbles)")


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 16,
) -> DataFrame:
    """n-bit SimHash per document — the ROW-LOCAL form (r10).

    Bit j of token t comes from one nibble of md5(t) (see
    :func:`simhash_bit_source`) — a portable ±1 projection both Spark
    and the DuckDB oracle compute identically. Document bit j = sign
    of Σ_tokens (±1). Emitted as an n-char '0'/'1' string.

    r10 (guide §2.4): computed via :func:`simhash_expr` — the per-doc
    ±1 sums are INTEGER and fold inside one ``aggregate``
    higher-order function over the token array, so the signature is
    map-side with ZERO shuffle. The historical explode+groupBy plan
    (kept as :func:`simhash_agg`, the pin's independent reference)
    exploded every token into its own row, paid a corpus-wide
    (doc, word-packed-hash) materialization, a per-doc shuffle and
    two aggregate stages for sums that never needed to leave the row
    — all its exploded tokens stay in the emitting task anyway.
    Measured at sf0.1 (n_bits=64): warm 1.7–2.3 s → 1.0–1.1 s, cold
    (codegen) 8.8 → 1.5 s. Bit-identity is pinned by
    ``test_simhash_expr_matches_agg_plan`` (integer sums are
    order-independent, same md5 nibbles)."""
    from prisma_migrator_spark.catalog import ensure_parallelism

    return ensure_parallelism(df).select(
        id_col, simhash_expr(F.col(text_col), n_bits).alias("simhash")
    )


def simhash_agg(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 16,
) -> DataFrame:
    """The explode+groupBy SimHash plan — :func:`simhash`'s original
    form, kept as the independent reference for the bit-identity pin
    and for pathological inputs where a single document's token
    stream should not fold in one task."""
    from prisma_migrator_spark.catalog import ensure_parallelism

    df = ensure_parallelism(df)
    words = F.split(normalized_text(F.col(text_col)), " ")
    tok = df.select(id_col, F.explode(words).alias("t")).withColumn(
        "h", F.md5(F.col("t"))
    )
    # Pack the needed md5 hex digits into 32-bit integer words ONCE per
    # token; each bit expression is then integer shift/mask instead of
    # its own conv(substring(...)) — same nibbles, ~3x less expression
    # work per row and far smaller generated code (64 string-parse
    # trees made the n_bits=64 aggregate compile-heavy).
    max_digit = max(simhash_bit_source(j, n_bits)[0] for j in range(n_bits))
    n_words = max_digit // 8 + 1
    tok = tok.select(
        id_col,
        *[
            F.conv(F.substring("h", 8 * i + 1, 8), 16, 10)
            .cast("long")
            .alias(f"__w{i}")
            for i in range(n_words)
        ],
    )

    def bit(j: int):
        digit, mask = simhash_bit_source(j, n_bits)
        nib = F.shiftright(F.col(f"__w{digit // 8}"), 4 * (7 - digit % 8)).bitwiseAND(
            F.lit(15)
        )
        return F.when(nib.bitwiseAND(F.lit(mask)) > 0, 1).otherwise(-1)

    sums = tok.groupBy(id_col).agg(
        *[F.sum(bit(j)).alias(f"s{j}") for j in range(n_bits)]
    )
    bits = F.concat(
        *[F.when(F.col(f"s{j}") > 0, "1").otherwise("0") for j in range(n_bits)]
    )
    return sums.select(id_col, bits.alias("simhash"))


def simhash16(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """16-bit SimHash (see :func:`simhash`)."""
    return simhash(df, text_col, id_col, n_bits=16)


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over an undirected edge list → one row per
    node: ``(node, component)`` with component = min node id reachable.

    Iterative min-label propagation: each round every node adopts
    ``min(own label, neighbors' labels)``; converges in O(graph
    diameter) rounds — duplicate clusters are near-cliques, so 2-4
    rounds in practice. Each round is one join + one agg (both keyed
    on node id) over the edge list. This is the standard scale
    pattern (HashToMin) — no driver-side graph, no GraphFrames
    dependency.

    Rounds are snapshotted with eager ``localCheckpoint`` rather than
    ``persist``: a cached round's plan still references the whole
    chain of prior rounds, and any partition a probing action didn't
    materialize recomputes through that chain once the previous round
    is unpersisted — measured round times GREW 1.7s -> 8.2s over 5
    rounds with persist and stay flat at ~0.5s with checkpoints
    (PERF.md #29). The trade: checkpoint blocks are executor-local
    and unreplicated, so a lost executor fails the job
    (restart-and-rerun); a 100 TB production run points
    ``sparkContext.setCheckpointDir`` at durable storage and swaps in
    ``checkpoint()`` — same plan shape, fault-tolerant snapshots.
    """
    edges = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        und.select(F.col("src").alias("node")).distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iters):
        neighbor_min = (
            und.join(labels, und.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        # changed-flag computed in the same pass as the new label —
        # no extra old-vs-new join per round
        flagged = labels.join(
            neighbor_min, labels.node == neighbor_min.src, "left"
        ).select(
            "node",
            F.least(
                F.col("component"), F.coalesce("nbr_min", F.col("component"))
            ).alias("component"),
            (F.coalesce("nbr_min", F.col("component")) < F.col("component")).alias(
                "__changed"
            ),
        ).localCheckpoint()
        changed = flagged.agg(
            F.coalesce(F.sum(F.col("__changed").cast("int")), F.lit(0)).alias("n")
        ).first()["n"]
        labels = flagged.drop("__changed")
        if changed == 0:
            break
    return labels


def near_dup_clusters(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Duplicate clusters from near-dup candidate pairs: every node
    that belongs to a multi-document cluster, labeled by its canonical
    (min) member. Singleton documents don't appear — they are their
    own canonical."""
    return connected_components(pairs, src_col, dst_col).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    band_bits: int = 4,
    n_bits: int = 16,
    max_bucket: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: signatures within Hamming distance
    ``max_hamming``, found via band-bucketing (never n²).

    Pigeonhole guarantee: with ``n_bits/band_bits`` bands, any pair
    differing in ≤ (n_bands - 1) bits shares at least one intact band
    — 4-bit bands over 16 bits, or 16-bit bands over 64 bits, find
    ALL pairs with hamming ≤ 3. The self-join is keyed on (band
    index, band value); cost is Σ bucket², not n². 16-bit signatures
    saturate beyond a few hundred docs (every band bucket fills up) —
    use ``n_bits=64`` for real corpora; the join carries the
    signature with the rep id, exactly like
    :func:`lsh_candidate_pairs` (r10 — no post-distinct re-joins).

    ``max_bucket`` is the stop-band frequency cap — the scale knob.
    SimHash signs concentrate (common tokens dominate every doc's bit
    sums), so the most popular band VALUES collect members roughly
    linearly with corpus size and Σ bucket² goes quadratic: measured
    on the scale-rehearsal corpus, the top 16-bit band bucket grew
    104 → 456 → 3446 from 500 → 5k → 50k docs (21.2M candidate pairs
    at 50k). Capping drops band buckets larger than ``max_bucket``
    from candidate generation — a pair is lost only if EVERY intact
    band it shares is a stop-band, and those bands carry near-zero
    information (they are the signature-space analog of stopword
    shingles). Cost becomes Σ min(bucket, cap)² — linear in corpus
    size for fixed cap.
    """
    sigs = simhash(df, text_col, id_col, n_bits=n_bits)
    return hamming_band_pairs(
        sigs,
        id_col=id_col,
        sig_col="simhash",
        n_bits=n_bits,
        band_bits=band_bits,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )


def hamming_bits(a: Column, b: Column, n_bits: int) -> Column:
    """Hamming distance between two ``n_bits``-char '0'/'1' strings:
    XOR-popcount over ≤32-bit chunks — ``bit_count(conv(chunk_a, 2)
    ^ conv(chunk_b, 2))`` summed across chunks. Identical integer to
    the per-character compare (each differing position flips exactly
    one XOR bit), at ~n_bits/32 expressions instead of n_bits CASE
    WHEN substring terms — the 64-term form made the pair stage's
    whole-stage codegen compile-heavy (r10; measured in the cold
    simhash64 pass)."""
    terms = []
    for i in range(0, n_bits, 32):
        w = min(32, n_bits - i)
        ca = F.conv(F.substring(a, i + 1, w), 2, 10).cast("long")
        cb = F.conv(F.substring(b, i + 1, w), 2, 10).cast("long")
        terms.append(F.bit_count(ca.bitwiseXOR(cb)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


#: Signature frames pinned by :func:`hamming_band_pairs`, released at
#: the next call (same bounded-cache-residency discipline as
#: ``plans/graph._SNAPSHOTS``).
_SIG_CACHES: list[DataFrame] = []


def release_signature_caches() -> int:
    """Unpersist signature frames pinned by prior
    :func:`hamming_band_pairs` calls; returns how many were freed.
    Safe at any time — a released frame recomputes through its plan."""
    n = len(_SIG_CACHES)
    for df in _SIG_CACHES:
        try:
            df.unpersist(blocking=False)
        except Exception:  # session already stopped
            pass
    _SIG_CACHES.clear()
    return n


def hamming_band_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    n_bits: int = 16,
    band_bits: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = None,
    band_arity: int = 1,
) -> DataFrame:
    """Generic banded Hamming self-join over ANY fixed-width '0'/'1'
    bit-string signature column — the machinery behind
    :func:`simhash_near_dup_pairs` (text),
    :func:`image_near_dup_pairs` (perceptual image hashes), and
    ``audio_near_dup_pairs`` (spectral fingerprints), factored so
    every Hamming-space dedup family shares one audited plan.

    Pigeonhole guarantee: with B = ``n_bits/band_bits`` bands and
    join keys of ``band_arity`` bands each, a pair within Hamming
    distance ``B - band_arity`` has at least ``band_arity`` intact
    bands and therefore shares at least one intact key — recall is
    EXACT for ``max_hamming <= B - band_arity``. The self-join is
    keyed on the band combination and carries (rep id, signature) —
    the signature rides the shuffle so the Hamming distance computes
    once per deduplicated pair with NO rep-frame re-joins (r10, the
    r9 lsh_candidate_pairs shape); cost is Σ bucket², bounded to
    Σ min(bucket, cap)² by ``max_bucket`` (see
    :func:`simhash_near_dup_pairs` for the stop-band argument).

    ``band_arity`` is the SATURATION dial (multi-index hashing on
    band combinations): a ``band_bits``-bit band has only
    2^band_bits key values, so buckets grow linearly with corpus
    size and Σ bucket² goes quadratic/2^band_bits once the corpus
    outgrows the alphabet (measured on pHash: Σ bucket² 25.3k at
    500 docs → 1.05M at 5k — 41× for 10× docs, PERF.md #68).
    Pairing bands two at a time (C(B,2) keys of 2·band_bits bits)
    squares the alphabet for a ~B/2× row fan-out: at 8×8-bit bands,
    28 keys over 65,536 values instead of 8 over 256 — bucket sizes
    drop ~256×, the guarantee drops from ≤7 to ≤6 (still above the
    measured ≤2 image / ≤4 audio intra-variant distances).

    COLLAPSE-EXACT-FIRST (r7, from the sf10 audio flag): near-dup
    corpora carry the same signature many times over (measured at
    500k docs: 3.3x audio / 3.7x image / 4.1x video docs per
    distinct signature), and Σ bucket² is QUADRATIC in that
    multiplicity — the same insight that keeps the text fuzzy join
    vocabulary-sized in ``near_dup_clusters``. The banded self-join
    therefore runs over DISTINCT signatures only (min-id
    representative), and member pairs expand afterwards: identical-
    signature groups emit their pairs directly at Hamming 0, and
    cross-signature rep pairs fan out through the membership map —
    both output-proportional. With ``max_bucket`` set, bucket counts
    now count distinct SIGNATURES, not documents, so the stop-band
    cap can only DROP FEWER pairs than before (recall is monotone
    better; uncapped output is set-identical to the direct join).

    The signature frame is persisted: it feeds the rep collapse, the
    membership map, and the expansion legs, and is signature-sized
    (one short string per doc), not corpus-sized. Like the graph
    edge snapshots (ADVICE r6 #1), the persist is NOT
    session-lifetime: each call releases the previous call's
    signature cache (bounded residency at one query's frame; a
    released frame recomputes, never fails), and
    :func:`release_signature_caches` frees the last one.
    """
    from itertools import combinations

    release_signature_caches()
    sigs = sigs.persist()
    _SIG_CACHES.append(sigs)
    n_bands = n_bits // band_bits
    if not 1 <= band_arity <= n_bands:
        raise ValueError(f"band_arity must be in [1, {n_bands}]")

    reps = sigs.groupBy(sig_col).agg(F.min(id_col).alias("__rid")).persist()
    _SIG_CACHES.append(reps)

    def band(b: int):
        return F.substring(sig_col, b * band_bits + 1, band_bits)

    keys = [
        F.concat_ws(
            "|", F.lit("-".join(map(str, combo))), *[band(b) for b in combo]
        )
        for combo in combinations(range(n_bands), band_arity)
    ]
    # r10 (guide §2.3/§2.4 — the r9 lsh_candidate_pairs pattern ported
    # here): the SIGNATURE rides the band shuffle alongside the rep id
    # instead of re-joining twice after the pair-distinct. The dedup
    # key is unchanged — sh_a/sh_b are functionally determined by
    # ra/rb, so every candidate row for a (ra, rb) pair carries
    # identical signatures and dropDuplicates([ra, rb]) yields the
    # same pair set with the same attached strings — and the Hamming
    # distance computes ONCE per distinct pair, after the dedup, from
    # the carried columns. Cost trade, same as minhash: each banded
    # row widens by one n_bits-char string (bounded), while BOTH
    # rep-frame re-joins and their exchanges/broadcast builds
    # disappear from the plan.
    banded = reps.select(
        F.col("__rid"), F.col(sig_col), F.explode(F.array(*keys)).alias("band")
    )
    if max_bucket is not None:
        ok = (
            banded.groupBy("band")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") <= max_bucket)
            .select("band")
        )
        banded = banded.join(ok, "band")
    rep_pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.__rid") < F.col("b.__rid")),
        )
        .select(
            F.col("a.__rid").alias("ra"),
            F.col("b.__rid").alias("rb"),
            F.col(f"a.{sig_col}").alias("sh_a"),
            F.col(f"b.{sig_col}").alias("sh_b"),
        )
        .dropDuplicates(["ra", "rb"])
    )
    hamming = hamming_bits(F.col("sh_a"), F.col("sh_b"), n_bits)
    near_reps = rep_pairs.select(
        "ra", "rb", hamming.cast("int").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)
    # membership map: every doc -> its signature's representative id
    mem = sigs.join(reps, sig_col).select(
        F.col(id_col).alias("__mid"), "__rid"
    )
    cross = (
        near_reps.join(
            mem.select(F.col("__rid").alias("ra"),
                       F.col("__mid").alias("__ia")), "ra")
        .join(
            mem.select(F.col("__rid").alias("rb"),
                       F.col("__mid").alias("__ib")), "rb")
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            "hamming",
        )
    )
    intra = (
        mem.alias("a")
        .join(
            mem.alias("b"),
            (F.col("a.__rid") == F.col("b.__rid"))
            & (F.col("a.__mid") < F.col("b.__mid")),
        )
        .select(
            F.col("a.__mid").alias("id_a"),
            F.col("b.__mid").alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionByName(intra)


def incremental_hamming_pairs(
    existing_sigs: DataFrame,
    delta_sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "phash",
    n_bits: int = 64,
    band_bits: int = 8,
    max_hamming: int = 7,
    band_arity: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """DELTA-touching Hamming near-dup pairs against a STORED
    signature index — the decode-once incremental form of
    :func:`hamming_band_pairs` for the image/audio/video families
    (VERDICT r7 item 7), mirroring :func:`incremental_lsh_pairs` for
    MinHash text dedup.

    The decode-once property is STRUCTURAL: this function's contract
    takes ``existing_sigs`` — (id, signature) rows from the
    maintained index table, written once when each document was
    ingested — so history media has no payload column here and
    CANNOT be re-decoded. Per batch the work is: decode |delta| docs
    (the caller's ``image_phash``/``afp64``/``vhash64`` pass — the
    cost that dominates the cold job at every measured SF), then one
    banded pair join over index ∪ delta signatures. Re-banding the
    index is a signature-table scan (one short string per doc, no
    media bytes); at 100 TB the index table is ~1/1000th of the
    corpus and the scan is noise next to the avoided decode.

    Output = the full recompute restricted to pairs with ≥ 1 delta
    member, exactly (same signatures, same bucket-cap statistics —
    the pytest pin compares against the full job row-for-row).

    The banded join itself is DELTA-PROPORTIONAL, not just the
    decode: only signature groups containing a delta member band
    against the full banded rep table (one side of the join is
    batch-sized), so the pair-generation work is Σ over buckets of
    (delta reps in bucket × bucket size) instead of the cold job's
    Σ bucket² — at a 0.1% daily batch over a 100 TB corpus that is
    three decimal orders off the join, on top of the three orders
    off the decode. Bucket-cap counts are computed over ALL distinct
    signatures (identical statistics to the cold job, so capped
    output parity holds); that pass is a scan of the signature
    table, never the media."""
    from itertools import combinations

    release_signature_caches()
    all_sigs = (
        existing_sigs.select(id_col, sig_col)
        .withColumn("__new", F.lit(False))
        .unionByName(
            delta_sigs.select(id_col, sig_col).withColumn(
                "__new", F.lit(True)
            )
        )
        .persist()
    )
    _SIG_CACHES.append(all_sigs)
    n_bands = n_bits // band_bits
    if not 1 <= band_arity <= n_bands:
        raise ValueError(f"band_arity must be in [1, {n_bands}]")

    # collapse-exact-first across index ∪ delta, tracking whether any
    # member of each signature group is new
    reps = (
        all_sigs.groupBy(sig_col)
        .agg(
            F.min(id_col).alias("__rid"),
            F.max(F.col("__new").cast("int")).alias("__touch"),
        )
        .persist()
    )
    _SIG_CACHES.append(reps)

    def band(b: int):
        return F.substring(sig_col, b * band_bits + 1, band_bits)

    keys = [
        F.concat_ws(
            "|", F.lit("-".join(map(str, combo))), *[band(b) for b in combo]
        )
        for combo in combinations(range(n_bands), band_arity)
    ]
    banded = reps.select(
        "__rid", "__touch", F.col(sig_col),
        F.explode(F.array(*keys)).alias("band"),
    )
    if max_bucket is not None:
        # cap statistics over ALL reps — byte-identical to the cold
        # job's, so the capped pair set restricts exactly
        ok = (
            banded.groupBy("band")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") <= max_bucket)
            .select("band")
        )
        banded = banded.join(ok, "band")
    delta_banded = banded.where(F.col("__touch") == 1)
    # r10 (same shape change as hamming_band_pairs): the signatures
    # ride the pair join instead of re-joining the rep frame twice.
    # least/greatest over (rid, sig) STRUCTS orders lexicographically
    # by the unique rid, so each side's signature stays attached to
    # the correct endpoint; sh_a/sh_b are functionally determined by
    # (ra, rb), so the pair-distinct is unchanged.
    pa = F.least(
        F.struct(F.col("a.__rid"), F.col(f"a.{sig_col}")),
        F.struct(F.col("b.__rid"), F.col(f"b.{sig_col}")),
    )
    pb = F.greatest(
        F.struct(F.col("a.__rid"), F.col(f"a.{sig_col}")),
        F.struct(F.col("b.__rid"), F.col(f"b.{sig_col}")),
    )
    rep_pairs = (
        delta_banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.__rid") != F.col("b.__rid")),
        )
        .select(
            pa["__rid"].alias("ra"),
            pb["__rid"].alias("rb"),
            pa[sig_col].alias("sh_a"),
            pb[sig_col].alias("sh_b"),
        )
        .dropDuplicates(["ra", "rb"])
    )
    hamming = hamming_bits(F.col("sh_a"), F.col("sh_b"), n_bits)
    near_reps = (
        rep_pairs
        .select("ra", "rb", hamming.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
    # membership expansion carries the per-member delta flag so the
    # ≥1-delta-member restriction lands BEFORE the output (a history×
    # history pair inside a delta-touching group is not delta work)
    mem = all_sigs.join(reps, sig_col).select(
        F.col(id_col).alias("__mid"), "__rid", "__new"
    )
    cross = (
        near_reps.join(
            mem.select(F.col("__rid").alias("ra"),
                       F.col("__mid").alias("__ia"),
                       F.col("__new").alias("__na")), "ra")
        .join(
            mem.select(F.col("__rid").alias("rb"),
                       F.col("__mid").alias("__ib"),
                       F.col("__new").alias("__nb")), "rb")
        .where(F.col("__na") | F.col("__nb"))
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            "hamming",
        )
    )
    # hamming-0 leg delta-proportionally too: delta members × their
    # signature group (a history×history same-signature pair is old
    # work the cold job already emitted)
    intra = (
        mem.where("__new").alias("a")
        .join(mem.alias("b"), "__rid")
        .where(F.col("a.__mid") != F.col("b.__mid"))
        .select(
            F.least("a.__mid", "b.__mid").alias("id_a"),
            F.greatest("a.__mid", "b.__mid").alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cross.unionByName(intra)


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
    min_cosine: float = 0.9,
    n_blocks: int = 1,
) -> DataFrame:
    """Pairs with cosine ≥ threshold. ``bucket_col`` (e.g. an LSH
    bucket or a label) restricts candidates to same-bucket pairs —
    the Σ bucket² scale path; None = full n² (small inputs only).

    Norms are attached per row before the self-join so each vector's
    norm is computed once, not once per candidate pair.

    ``n_blocks`` > 1 enables triangle-blocked pair generation: each
    row is hashed into one of G blocks, and the unordered block pairs
    (i ≤ j) become extra join-key components, so the pairwise-cosine
    compute spreads over n_buckets · G(G+1)/2 tasks instead of being
    bounded by the n_buckets distinct bucket keys (PERF.md #27 — with
    10 coarse label buckets at most 10 tasks carried 125M cosines no
    matter how many cores the cluster has). Cost: each row is
    replicated G+1 times into the shuffle ((G-g) left roles + (g+1)
    right roles); candidate pairs are generated exactly once — a
    cross-block pair {x,y} with blocks bi < bj joins only under key
    (bi, bj) with x on the left, and the diagonal i == j keeps the
    id_a < id_b half — so no dedup pass is needed. Pick G so that
    replication (G+1)·|bucket| stays shuffle-friendly while G(G+1)/2
    saturates the cluster; G=1 degenerates to the plain bucket join.
    """
    from prisma_migrator_spark.llm.similarity import _dot, _norm

    emb = emb.select(
        id_col,
        F.col(vec_col).cast("array<double>").alias(vec_col),
        *([bucket_col] if bucket_col else []),
    ).withColumn("__norm", _norm(F.col(vec_col)))
    if n_blocks > 1:
        g = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))
        # left role: row of block g serves block-pairs (g, j), j >= g
        a = emb.withColumn("__i", g).withColumn(
            "__j", F.explode(F.sequence(F.col("__i"), F.lit(n_blocks - 1)))
        ).alias("a")
        # right role: row of block g serves block-pairs (i, g), i <= g
        b = emb.withColumn("__j", g).withColumn(
            "__i", F.explode(F.sequence(F.lit(0), F.col("__j")))
        ).alias("b")
        cond = (F.col("a.__i") == F.col("b.__i")) & (
            F.col("a.__j") == F.col("b.__j")
        )
        # diagonal blocks hold both copies of every within-block pair;
        # cross-block pairs appear exactly once (lower block on the left)
        cond = cond & (
            (F.col("a.__i") != F.col("a.__j"))
            | (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        )
    else:
        a = emb.alias("a")
        b = emb.alias("b")
        cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if bucket_col:
        cond = cond & (F.col(f"a.{bucket_col}") == F.col(f"b.{bucket_col}"))
    sim = _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / (
        F.col("a.__norm") * F.col("b.__norm")
    )
    return (
        a.join(b, cond)
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
            F.round(sim, 6).alias("cosine"),
        )
        .where(F.col("cosine") >= min_cosine)
    )


def rademacher_planes(
    n_planes: int, dim: int, seed: int = 7
) -> list[list[float]]:
    """Deterministic ±1 (Rademacher) hyperplanes from md5 — portable
    across engines/runs (same property as the MinHash/token hashes:
    no RNG state, any engine recomputes the identical planes)."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"{seed}:{j}:{d}".encode()).digest()[0] & 1
            else -1.0
            for d in range(dim)
        ]
        for j in range(n_planes)
    ]


def embedding_lsh_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    min_cosine: float = 0.8,
    n_tables: int = 8,
    bits_per_table: int | None = None,
    n_blocks: int = 1,
    max_bucket: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """Near-dup pairs by cosine via sign-LSH bucketing — the SCALE
    path for :func:`embedding_near_dup_pairs` when no bounded bucket
    column exists (a label/category column collapses to a fixed
    number of buckets, so its within-bucket candidate count grows
    quadratically with corpus size; measured 19x super-linear wall
    time at 10x rows in the round-4 scale rehearsal).

    Sign-LSH: bit (t, r) of a vector is the sign of its dot product
    with a fixed Rademacher hyperplane (md5-derived — engine-portable,
    no RNG state); a vector's bucket in table t is its
    ``bits_per_table``-bit sign pattern. Two vectors at angle θ agree
    on one bit with p = 1 - θ/π, so a table catches a pair with p^r
    and ``n_tables`` tables (OR-amplification) give recall
    1 - (1 - p^r)^b; pytest pins a floor against the exact-by-label
    result. Candidates are verified with the true cosine, so precision
    is exact; only recall is approximate.

    ``bits_per_table=None`` AUTO-SIZES r with corpus size:
    r = clamp(8..14, ceil(log2(n/100))), so the bucket alphabet 2^r
    tracks corpus diversity — with r fixed, distinct content groups
    eventually share buckets and candidate counts go quadratic again
    (measured 16x at 10x rows with r=4 before this fix).

    Scale shape (hardened by the sf10 rehearsal, where the first cut
    spilled the disk):

    - signatures are pure JVM column folds (zip_with/aggregate over
      literal plane arrays — no Python, no shuffle);
    - each banded row CARRIES its vector+norm into the (table,
      bucket)-keyed self-join, so the cosine is computed inline in
      the join output and immediately projected away — there is never
      an O(candidates)·vector-width intermediate. The naive
      ids-only-then-re-join-vectors form shuffles |candidates| rows
      twice against the vector table (40 GB of spill at 400k vectors
      / 640M candidates, job death); this form's big shuffle is
      n_tables·n rows of (vector, bucket) ≈ 3 GB at the same scale;
    - a pair is emitted by its FIRST matching table only: each side
      carries its full bucket array and the join filters out pairs
      whose earlier tables already matched — exactly-once generation
      with NO dropDuplicates shuffle over the candidate stream (the
      8-way redundancy was the other half of the spill);
    - ``max_bucket`` drops degenerate buckets (the stop-band cap).
      Dropped buckets are masked to NULL **inside the carried bucket
      arrays** (not just filtered from the banded rows), so the
      first-match test never counts a stop-band table as a prior
      match — otherwise a pair whose earliest agreeing table was
      capped would be suppressed at every surviving later table and
      silently lost (dense regions are exactly where table 0 agrees
      AND gets capped). The masking costs ONE narrow O(n·n_tables)
      count shuffle (buckets only); the over-cap set is bounded by
      n_tables·n/max_bucket entries, reduces to a single broadcast
      row, and the mask itself is a projection — the vector-carrying
      base never shuffles for it. Paid only when the cap is enabled;
    - ``n_blocks`` adds triangle-blocking for within-bucket
      parallelism, as in :func:`embedding_near_dup_pairs`.
    """
    if bits_per_table is None:
        import math

        n = emb.count()
        bits_per_table = min(14, max(8, math.ceil(math.log2(max(n, 2) / 100))))
    planes = rademacher_planes(n_tables * bits_per_table, dim, seed)
    from prisma_migrator_spark.llm.similarity import _dot, _norm

    v = F.col(vec_col).cast("array<double>")

    from prisma_migrator_spark.operators.literals import double_array

    def bit(j: int):
        plane = double_array(planes[j])
        dot = F.aggregate(
            F.zip_with(v, plane, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        # quantize before the sign: a near-zero dot (sum of dim signed
        # doubles) can flip sign under a different accumulation order,
        # putting the same vector in different buckets on different
        # engines (e.g. the DuckDB oracle's list_dot_product); rounding
        # to 9 decimals makes the boundary deterministic on both sides
        return F.when(F.round(dot, 9) >= 0, F.lit("1")).otherwise(F.lit("0"))

    buckets_arr = F.array(
        *[
            F.concat(
                *[bit(t * bits_per_table + r) for r in range(bits_per_table)]
            )
            for t in range(n_tables)
        ]
    )
    base = emb.select(
        F.col(id_col).alias("__id"),
        v.alias("__v"),
        _norm(v).alias("__n"),
        buckets_arr.alias("__bk"),
    )
    if max_bucket is not None:
        # Stop-band masking: NULL-out over-cap buckets inside each
        # row's bucket ARRAY so (a) banded rows in capped buckets are
        # dropped and (b) first_match never sees a capped table as an
        # earlier agreement. The over-cap SET is tiny by construction
        # (≤ n_tables·n/max_bucket entries), so it reduces to one
        # broadcast row and the mask is a pure projection — the
        # vector-carrying base never shuffles for it.
        overcap = (
            base.select(F.posexplode("__bk").alias("__t", "__b"))
            .groupBy("__t", "__b")
            .agg(F.count(F.lit(1)).alias("__c"))
            .where(F.col("__c") > max_bucket)
            .agg(
                F.collect_set(
                    F.concat_ws("|", F.col("__t"), F.col("__b"))
                ).alias("__over")
            )
        )
        base = base.crossJoin(F.broadcast(overcap)).select(
            "__id",
            "__v",
            "__n",
            F.transform(
                "__bk",
                lambda bkt, t: F.when(
                    F.array_contains(
                        F.col("__over"), F.concat_ws("|", t, bkt)
                    ),
                    F.lit(None),
                ).otherwise(bkt),
            ).alias("__bk"),
        )
    # Snapshot the signed/masked frame ONCE: both sides of the band
    # self-join read it, and without the snapshot each side recomputes
    # the n_tables·r plane dots per row (the dominant CPU) plus, when
    # capped, its own copy of the stop-band count shuffle. Eager
    # localCheckpoint is this repo's convention for shared iterative /
    # self-joined state (see PERF.md: persist+probe recomputes through
    # partially-materialized caches).
    base = base.localCheckpoint()
    banded = base.select(
        "__id", "__v", "__n", "__bk",
        F.posexplode("__bk").alias("__t", "__bucket"),
    ).where(F.col("__bucket").isNotNull()).withColumn(
        "__key", F.concat_ws("|", F.col("__t"), F.col("__bucket"))
    ).drop("__bucket")
    if n_blocks > 1:
        g = F.pmod(F.xxhash64(F.col("__id")), F.lit(n_blocks))
        a = banded.withColumn("__i", g).withColumn(
            "__j", F.explode(F.sequence(F.col("__i"), F.lit(n_blocks - 1)))
        ).alias("a")
        b = banded.withColumn("__j", g).withColumn(
            "__i", F.explode(F.sequence(F.lit(0), F.col("__j")))
        ).alias("b")
        cond = (
            (F.col("a.__key") == F.col("b.__key"))
            & (F.col("a.__i") == F.col("b.__i"))
            & (F.col("a.__j") == F.col("b.__j"))
            & (
                (F.col("a.__i") != F.col("a.__j"))
                | (F.col("a.__id") < F.col("b.__id"))
            )
        )
    else:
        a = banded.alias("a")
        b = banded.alias("b")
        cond = (F.col("a.__key") == F.col("b.__key")) & (
            F.col("a.__id") < F.col("b.__id")
        )
    # exactly-once emission: this table must be the FIRST whose
    # buckets agree — no earlier-table agreement, no dedup shuffle
    first_match = (
        F.size(
            F.filter(
                F.zip_with(
                    F.slice(F.col("a.__bk"), 1, F.col("a.__t")),
                    F.slice(F.col("b.__bk"), 1, F.col("b.__t")),
                    lambda x, y: x == y,
                ),
                lambda m: m,
            )
        )
        == 0
    )
    sim = _dot(F.col("a.__v"), F.col("b.__v")) / (
        F.col("a.__n") * F.col("b.__n")
    )
    return (
        a.join(b, cond)
        .where(first_match)
        .select(
            F.least(F.col("a.__id"), F.col("b.__id")).alias("id_a"),
            F.greatest(F.col("a.__id"), F.col("b.__id")).alias("id_b"),
            F.round(sim, 6).alias("cosine"),
        )
        .where(F.col("cosine") >= min_cosine)
    )




def dedupe_against(
    incoming: DataFrame,
    existing: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup: keep the incoming rows whose content
    fingerprint appears nowhere in the existing corpus, collapsing
    in-batch duplicates to the min-id copy. The op every ingestion
    pipeline runs per batch — dedupe the delta against the lake
    without rewriting the lake.

    Scale shape: existing side reduces to DISTINCT fingerprints (one
    narrow column of the 100 TB corpus — store/maintain it as a
    fingerprint index table to skip even that scan); the anti join
    hash-partitions on fp so the incoming batch never broadcasts or
    collects. Output carries ``fp`` so survivors can be appended to
    the fingerprint index.
    """
    from prisma_migrator_spark.llm.text import content_fingerprint

    fp = content_fingerprint(F.col(text_col))
    seen = existing.select(fp.alias("fp")).distinct()
    fresh = incoming.select(
        F.col(id_col), fp.alias("fp")
    ).join(seen, "fp", "left_anti")
    return (
        fresh.groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "fp")
    )


# --- bloom-filter incremental dedup (the map-only scale path) ---------


def build_bloom_filter(
    keys: DataFrame,
    key_col: str,
    expected_items: int,
    fpp: float = 0.01,
) -> tuple[list[int], int, int]:
    """Build a Bloom filter over ``keys[key_col]`` with classic sizing
    (m = -n·ln p / ln²2 bits, k = m/n·ln 2 probes, capped at 8).

    Returns ``(words, m, k)`` where ``words`` packs the m bits into
    64-bit longs. Spark's own ``bloom_filter_agg`` is optimizer-
    internal (not in the public function registry), so the filter is
    built with plain relational ops: explode each key into its k bit
    positions, ``bit_or``-fold positions into words. The shuffle
    carries k·n longs but REDUCES to m/64 rows — driver memory is
    bounded by the filter size (exactly what Spark's runtime bloom
    broadcast holds), never by the key count.

    For a 100 TB lake index (≥10⁹ keys) a driver-resident filter at
    1% fpp is ~1.2 GB — at that point raise fpp (each probe is a
    prefilter, exactness comes from the anti-join fallback) or shard
    the filter by key prefix; below ~10⁸ keys this single-filter path
    is the right shape.
    """
    import math

    n = max(1, expected_items)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 63) // 64 * 64
    k = max(1, min(8, round(m / n * math.log(2))))
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m))
                    for i in range(k)
                ]
            )
        ).alias("p")
    )
    rows = bounded_collect(
        pos.groupBy(F.expr("p div 64").alias("w"))
        .agg(
            F.expr(
                "bit_or(shiftleft(cast(1 as bigint), cast(p % 64 as int)))"
            ).alias("bits")
        ),
        m // 64,
        "one row per 64-bit Bloom word (m bits fixed at build time)",
    )
    words = [0] * (m // 64)
    for r in rows:
        words[int(r["w"])] = int(r["bits"])
    return words, m, k


def bloom_might_contain(
    col: Column, words: list[int], m: int, k: int
) -> Column:
    """Membership probe against a :func:`build_bloom_filter` result —
    a pure map-side boolean expression (the words ride along as an
    array literal, like the IVF codebook in llm/similarity.py): true
    if every one of the k probed bits is set. No false negatives;
    false positives at the filter's fpp."""
    bits = F.lit(words)
    tests = []
    for i in range(k):
        p = F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m))
        word = F.element_at(bits, (F.floor(p / 64) + 1).cast("int"))
        tests.append(
            F.call_function(
                "shiftright", word, F.pmod(p, F.lit(64)).cast("int")
            ).bitwiseAND(F.lit(1))
            == 1
        )
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def dedupe_against_bloom(
    incoming: DataFrame,
    existing: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fpp: float = 0.01,
) -> DataFrame:
    """:func:`dedupe_against` with the lake membership test replaced
    by a Bloom filter: build the filter over the lake's distinct
    fingerprints once, then probe each incoming row MAP-SIDE. The
    anti-join's shuffle of the batch disappears entirely — the batch
    is never repartitioned, which is the shape incremental ingest
    wants when the lake index dwarfs every batch.

    Approximate where the anti-join is exact: a false positive drops
    a genuinely-new document with probability ``fpp``. Acceptable for
    training-corpus dedup (loses ~1% of unique docs at the default);
    use :func:`dedupe_against` when exactness matters more than the
    shuffle.

    In-batch collapse still groups by fingerprint (that shuffle is
    batch-sized, not lake-sized, and unavoidable for min-id pick).
    """
    fp = content_fingerprint(F.col(text_col))
    seen = existing.select(fp.alias("fp")).distinct()
    n_seen = seen.count()
    words, m, k = build_bloom_filter(seen, "fp", n_seen, fpp)
    fresh = incoming.select(F.col(id_col), fp.alias("fp")).where(
        ~bloom_might_contain(F.col("fp"), words, m, k)
    )
    return (
        fresh.groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "fp")
    )


def ngram_jaccard_pairs_prefix(
    sh: DataFrame,
    id_col: str = "doc_id",
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Threshold Jaccard pairs via PREFIX FILTERING — the
    set-similarity-join scale path (PPJoin family): order each doc's
    shingles by ascending global document frequency (rarest first,
    ties on the shingle), keep only the first
    ``|A| - ceil(t·|A|) + 1`` as its prefix, and generate candidates
    from prefix-shingle collisions only.

    Lossless for the threshold: J(A,B) ≥ t implies
    |A∩B| ≥ t·|A∪B| ≥ ceil(t·|A|), and two sets whose overlap is ≥ α
    must collide within prefixes of length |size| − α + 1 (pigeonhole
    on the shared global order). A length filter
    (min/max sizes ≥ t) prunes further — also implied by J ≥ t.

    vs :func:`ngram_jaccard_pairs` (cost Σ df² over ALL shingles):
    candidate cost is Σ df² over PREFIX occurrences only, and prefixes
    are dominated by RARE shingles (rarest-first order), so the hot
    boilerplate shingles that blow up the full join never key a
    candidate pair. Verification is exact per candidate via
    ``array_intersect`` on the two docs' shingle arrays — per-pair
    map work, no corpus-sized join. Per-doc array state matches the
    doc's own shingle count (same order as its text).
    """
    from pyspark.sql import Window

    t = min_jaccard
    dfc = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy(id_col).orderBy(F.asc("__df"), F.asc("shingle"))
    ranked = (
        sh.join(dfc, "shingle")
        .withColumn("__r", F.row_number().over(w))
        .withColumn("__sz", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    )
    prefix = ranked.where(
        F.col("__r") <= F.col("__sz") - F.ceil(F.lit(t) * F.col("__sz")) + 1
    ).select(id_col, "shingle", "__sz")

    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (
                F.least(F.col("a.__sz"), F.col("b.__sz"))
                >= F.lit(t) * F.greatest(F.col("a.__sz"), F.col("b.__sz"))
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )

    sets = sh.groupBy(id_col).agg(
        F.sort_array(F.collect_list("shingle")).alias("__set"),
        F.count(F.lit(1)).alias("__sz"),
    )
    sa = sets.select(
        F.col(id_col).alias("id_a"),
        F.col("__set").alias("__set_a"),
        F.col("__sz").alias("sz_a"),
    )
    sb = sets.select(
        F.col(id_col).alias("id_b"),
        F.col("__set").alias("__set_b"),
        F.col("__sz").alias("sz_b"),
    )
    inter = F.size(F.array_intersect("__set_a", "__set_b"))
    jac = inter / (F.col("sz_a") + F.col("sz_b") - inter)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= t)
    )


def incremental_lsh_pairs(
    existing_sigs: DataFrame,
    delta_sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup candidates for a DELTA of new documents against an
    existing corpus's stored MinHash signature index, plus within-
    delta pairs — the incremental form of :func:`lsh_candidate_pairs`
    (which is the full-corpus batch job this avoids re-running).

    At 100 TB the signature/band index is a maintained TABLE (8 longs
    + band keys per doc, written once at ingest like
    ``cross_corpus_dedup``'s fingerprint index); per batch the work
    is: signatures for |delta| docs, one band-keyed join of delta
    bands against the index (hash join — the delta side is small,
    and both sides carry their signature struct so the agreement
    computes at the collision row — no re-join), and one in-batch
    banding of the delta. History text is never re-shingled, history
    signatures never recomputed. Output matches the full recompute restricted to
    pairs with at least one delta member — which is what the
    registered query's oracle checks."""
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"h{b * band_size + r}") for r in range(band_size)],
            )
            for b in range(n_bands)
        ]
    )
    # localCheckpoint (not persist): both frames feed multiple branches
    # (band joins + the agreement re-join), and a persist() here would
    # pin executor storage for the session lifetime since a lazily
    # returned DataFrame gives no unpersist point. Checkpointing
    # materializes once, truncates lineage, and its blocks are GC'd
    # with the DataFrame — the same discipline as the iterative plans.
    existing_sigs = existing_sigs.localCheckpoint()
    delta_sigs = delta_sigs.localCheckpoint()
    # r10 (the r9 lsh_candidate_pairs shape, ported): both sides carry
    # their full signature STRUCT through the band join, so the
    # agreement count computes at the collision row and the
    # re-derivation join of index ∪ delta signatures disappears.
    # Agreement is symmetric, so the structs need no endpoint
    # ordering; jaccard_est is functionally determined by the pair,
    # so deduping on the ids alone stays deterministic.
    hs = [f"h{i}" for i in range(num_hashes)]
    eb = existing_sigs.select(
        F.col(id_col).alias("__old"),
        F.struct(*hs).alias("__so"),
        F.explode(bands).alias("band"),
    )
    db = delta_sigs.select(
        F.col(id_col).alias("__new"),
        F.struct(*hs).alias("__sn"),
        F.explode(bands).alias("band"),
    )
    if max_bucket is not None:
        ok = eb.groupBy("band").agg(F.count(F.lit(1)).alias("__n")).where(
            F.col("__n") <= max_bucket
        ).select("band")
        eb = eb.join(ok, "band")
    agree = sum(
        F.when(F.col("__sn")[h] == F.col("__so")[h], 1).otherwise(0)
        for h in hs
    )
    cross = (
        db.join(eb, "band")
        .select(
            F.least("__new", "__old").alias("id_a"),
            F.greatest("__new", "__old").alias("id_b"),
            F.round(agree / F.lit(float(num_hashes)), 6).alias(
                "jaccard_est"
            ),
        )
    )
    in_batch = lsh_candidate_pairs(
        delta_sigs, id_col, num_hashes, band_size, max_bucket
    )
    return cross.unionByName(in_batch).dropDuplicates(["id_a", "id_b"])


def simhash_expr(text_col: Column, n_bits: int = 16) -> Column:
    """SimHash as a pure JVM COLUMN EXPRESSION — bit-identical to
    :func:`simhash`'s explode+groupBy plan (pytest-pinned), but with
    ZERO shuffle: the per-token ±1 projections fold inside one
    ``aggregate`` higher-order function over the token array (one
    md5 per token, nibble arithmetic per bit), so the signature is
    computed row-local. Two places want exactly this shape:

    - STREAMING: a stateful pipeline can't afford a per-doc
      aggregation shuffle before the dedup operator;
      ``withColumn("simhash", simhash_expr(col("text")))`` composes
      directly with ``streaming_near_dup_verdicts``.
    - map-side batch stages where the doc row must stay intact
      (no explode/regroup round trip).

    The explode+groupBy form remains the right plan when one
    document's token stream outgrows a task (its partial aggregation
    splits across partitions); for ordinary web-document lengths the
    row-local form is strictly cheaper."""
    from prisma_migrator_spark.llm.text import normalized_text

    toks = F.split(normalized_text(text_col), " ")

    def bits(t: Column) -> Column:
        h = F.md5(t)
        if n_bits <= 32:
            def one(j: Column) -> Column:
                nib = F.conv(h.substr(j + 1, F.lit(1)), 16, 10).cast("int")
                return F.when(nib.bitwiseAND(F.lit(8)) > 0, 1).otherwise(-1)
        elif n_bits <= 64:
            def one(j: Column) -> Column:
                nib = F.conv(
                    h.substr(F.floor(j / 2) + 1, F.lit(1)), 16, 10
                ).cast("int")
                mask = F.when(j % 2 == 0, 8).otherwise(4)
                return F.when(nib.bitwiseAND(mask) > 0, 1).otherwise(-1)
        else:
            raise ValueError("simhash supports at most 64 bits")
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_bits - 1)), one
        )

    sums = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), n_bits),
        lambda acc, t: F.zip_with(acc, bits(t), lambda a, b: a + b),
    )
    return F.concat_ws(
        "",
        F.transform(
            sums, lambda s: F.when(s > 0, F.lit("1")).otherwise(F.lit("0"))
        ),
    )
