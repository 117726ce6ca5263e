"""Similarity search over embedding columns.

- ``cosine``: pure-Column cosine similarity over ``array<float>`` —
  ``zip_with`` product + ``aggregate`` sums, all JVM-side codegen
  (no UDF, no Python, no data movement).
- ``topk_bruteforce``: exact top-k per probe — broadcast the (small)
  probe set against the full corpus, window row_number per probe.
  O(|probes|·n); the right baseline and the correctness oracle for
  ANN variants.
- ``lsh_buckets`` / ``topk_lsh``: random-hyperplane LSH — P
  deterministic ±1 hyperplanes (md5-derived, engine/run-stable), sign
  bits form a bucket id; probes only compare against same-bucket (or
  neighboring-bucket) vectors. At 100 TB: bucket column is computed
  once at ingest (map-only), stored, and candidate joins shuffle on
  the bucket key — Σ bucket² instead of n² exactly like MinHash-LSH.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns (computed in
    double precision, element order preserved)."""
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return _dot(a, b) / (_norm(a) * _norm(b))


def topk_bruteforce(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per probe (self-matches excluded).
    Deterministic ranking: round(cosine, 6) desc, neighbor id asc.

    Norms are precomputed per side BEFORE the cross join — otherwise
    each vector's norm is re-derived once per pair (|probes|× redundant
    work on the corpus side, which is the whole dataset)."""
    from prisma_migrator_spark.catalog import ensure_parallelism

    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("probe_vec"),
    ).withColumn("probe_norm", _norm(F.col("probe_vec")))
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("vec_norm", _norm(F.col("vec")))
    scored = (
        c.crossJoin(F.broadcast(p))
        .where(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(
                _dot(F.col("probe_vec"), F.col("vec"))
                / (F.col("probe_norm") * F.col("vec_norm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: coefficient (p, d) = sign from
    one md5 byte. No RNG, no seed state — reproducible everywhere."""
    planes = []
    for p in range(num_planes):
        coeffs = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).digest()[0]
            coeffs.append(1.0 if h >= 128 else -1.0)
        planes.append(coeffs)
    return planes


def lsh_buckets(
    emb: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach a sign-bucket id: bit p = sign(v · plane_p). Map-only —
    at ingest time this is a free extra column."""
    planes = hyperplanes(num_planes, dim)
    v = F.col(vec_col).cast("array<double>")
    bits = []
    for p in range(num_planes):
        coeffs = F.array(*[F.lit(c) for c in planes[p]])
        proj = _dot(v, coeffs)
        bits.append(F.when(proj > 0, "1").otherwise("0"))
    return emb.withColumn("bucket", F.concat(*bits))


def _centroid_literals(cents: list[list[float]]) -> tuple[Column, Column]:
    """Centroid matrix + per-centroid norms as literal columns. The
    IVF 'model' is tiny (C·dim doubles) — holding it driver-side and
    inlining it into the plan is the standard scale pattern: the
    assignment becomes a map-only expression, no join, no shuffle."""
    import math

    mat = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in cents])
    norms = F.array(
        *[F.lit(math.sqrt(sum(x * x for x in c)) or 1.0) for c in cents]
    )
    return mat, norms


def _centroid_sims(vec: Column, vec_norm: Column, cents: list[list[float]]) -> Column:
    """array<double> of cosine(vec, centroid_i) for every centroid."""
    mat, norms = _centroid_literals(cents)
    idx = F.sequence(F.lit(1), F.lit(len(cents)))
    return F.transform(
        idx,
        lambda i: _dot(vec, F.element_at(mat, i))
        / (vec_norm * F.element_at(norms, i)),
    )


def ivf_assign(
    df: DataFrame,
    cents: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach ``cluster_id`` = argmax-cosine centroid (map-only)."""
    out = df.select(
        id_col, F.col(vec_col).cast("array<double>").alias(vec_col)
    ).withColumn("__norm", _norm(F.col(vec_col)))
    sims = _centroid_sims(F.col(vec_col), F.col("__norm"), cents)
    return out.withColumn(
        "cluster_id",
        (F.array_position(sims, F.array_max(sims)) - 1).cast("int"),
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic IVF codebook: md5-ordered seed sample (stable
    pseudo-random, engine/run-invariant), then ``iters`` distributed
    k-means refinements. Each refinement is two shuffles over
    (cluster, dim) partial sums — never collects the corpus; only the
    C·dim codebook ever reaches the driver."""
    seeds = (
        corpus.select(
            F.col(vec_col).cast("array<double>").alias("c"),
            F.md5(F.col(id_col).cast("string")).alias("__r"),
        )
        .orderBy("__r")
        .limit(n_centroids)
        .collect()
    )
    cents = [list(r["c"]) for r in seeds]
    dim = len(cents[0]) if cents else 0
    for _ in range(iters):
        assigned = ivf_assign(corpus, cents, id_col, vec_col)
        # one HashAggregate over dim sum() columns (group_centroids)
        # instead of posexplode + two shuffles over element rows
        means = group_centroids(assigned, "cluster_id", vec_col, dim=dim).collect()
        new = {r["cluster_id"]: list(r["centroid"]) for r in means}
        cents = [new.get(i, cents[i]) for i in range(len(cents))]
    return cents


def topk_ivf(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via IVF (inverted-file index): corpus vectors are
    bucketed by nearest codebook centroid; each probe searches only
    its ``nprobe`` nearest clusters. Candidate cost is
    |probes|·nprobe·(n/C) instead of |probes|·n. At ingest the
    cluster id is a stored column (map-only, like
    :func:`lsh_buckets`); the candidate join shuffles on cluster_id."""
    cents = train_ivf_centroids(corpus, n_centroids, iters, id_col, vec_col)
    from prisma_migrator_spark.catalog import ensure_parallelism

    cb = ivf_assign(ensure_parallelism(corpus), cents, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        F.col("__norm").alias("vec_norm"),
        "cluster_id",
    )
    p = probes.select(
        id_col, F.col(vec_col).cast("array<double>").alias(vec_col)
    ).withColumn("__norm", _norm(F.col(vec_col)))
    sims = _centroid_sims(F.col(vec_col), F.col("__norm"), cents)
    # nprobe nearest clusters: sort (sim, idx) structs desc, slice
    ranked = F.slice(
        F.reverse(
            F.array_sort(
                F.zip_with(
                    sims,
                    F.sequence(F.lit(0), F.lit(len(cents) - 1)),
                    lambda s, i: F.struct(s.alias("sim"), i.alias("idx")),
                )
            )
        ),
        1,
        nprobe,
    )
    pb = p.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        F.col("__norm").alias("probe_norm"),
        F.explode(ranked["idx"]).alias("cluster_id"),
    )
    scored = (
        cb.join(F.broadcast(pb), "cluster_id")
        .where(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(
                _dot(F.col("probe_vec"), F.col("vec"))
                / (F.col("probe_norm") * F.col("vec_norm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def _flip(bucket: Column, i: int) -> Column:
    """Bucket id with bit i flipped (multi-probe neighbor)."""
    bit = F.substring(bucket, i + 1, 1)
    flipped = F.when(bit == "1", "0").otherwise("1")
    return F.concat(F.substring(bucket, 1, i), flipped, F.substring(bucket, i + 2, 256))


def topk_lsh(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 1,
) -> DataFrame:
    """ANN top-k: compare each probe only against same-bucket corpus
    vectors (bucket join instead of cross join). ``multiprobe=1``
    additionally probes every bucket within Hamming distance 1 —
    num_planes+1 probes per query, large recall gain for the cost of
    a wider (still tiny) broadcast of the probe set."""
    from prisma_migrator_spark.catalog import ensure_parallelism

    cb = lsh_buckets(ensure_parallelism(corpus), num_planes, dim, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        "bucket",
    ).withColumn("vec_norm", _norm(F.col("vec")))
    pb = lsh_buckets(probes, num_planes, dim, id_col, vec_col).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("probe_vec"),
        "bucket",
    ).withColumn("probe_norm", _norm(F.col("probe_vec")))
    if multiprobe >= 1:
        probe_buckets = F.array(
            F.col("bucket"), *[_flip(F.col("bucket"), i) for i in range(num_planes)]
        )
        pb = pb.withColumn("bucket", F.explode(probe_buckets))
    scored = (
        cb.join(F.broadcast(pb), "bucket")
        .where(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(
                _dot(F.col("probe_vec"), F.col("vec"))
                / (F.col("probe_norm") * F.col("vec_norm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def quantize_int8(vec: Column) -> tuple[Column, Column]:
    """Symmetric per-vector int8 quantization: returns ``(scale,
    codes)`` with ``code_i = floor(x_i/scale + 0.5)`` and ``scale =
    max|x|/127`` — the standard compress-embeddings-4x step before
    shipping a corpus's vectors to an ANN index. Dequantized error is
    bounded by scale/2 per element (asserted in tests).

    All-zero vectors quantize to scale 0 / all-zero codes. Element ops
    stay in JVM array transforms (no explode, no Python); the explicit
    ``floor(x + 0.5)`` form (not half-even ``round``) is chosen so any
    engine reproduces the codes bit-for-bit from the same doubles.
    """
    e = F.transform(vec, lambda x: x.cast("double"))
    amax = F.array_max(F.transform(e, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    codes = F.when(
        amax == 0, F.transform(e, lambda x: F.lit(0))
    ).otherwise(
        F.transform(e, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"))
    )
    return scale, codes


def group_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Element-wise mean embedding per group (domain centroids, class
    prototypes, k-means refinement input).

    Spark-first shape: instead of posexplode → groupBy(group, pos) —
    which shuffles n_vectors x dim ROWS and then needs a second agg to
    reassemble the array — unroll the known dim into ``dim`` numeric
    ``sum()`` columns in ONE HashAggregate. Map-side partials collapse
    every partition to one row per group before the only shuffle, and
    the reassembly is a free map-side ``array()``. The dim probe costs
    one first() on a single split.
    """
    if dim is None:
        row = df.select(F.size(vec_col)).first()
        dim = int(row[0]) if row else 0
    v = F.col(vec_col)
    sums = [
        F.sum(F.element_at(v, i + 1).cast("double")).alias(f"__s{i}")
        for i in range(dim)
    ]
    agg = df.groupBy(group_col).agg(F.count("*").alias("n_vectors"), *sums)
    centroid = F.array(
        *[F.col(f"__s{i}") / F.col("n_vectors") for i in range(dim)]
    )
    return agg.select(group_col, "n_vectors", centroid.alias("centroid"))
