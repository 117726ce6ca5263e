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
