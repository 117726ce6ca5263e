"""Distributed PCA over an embedding column.

Embedding-space curation (near-dup thresholds, IVF cell counts,
drift monitoring) starts with "what does the spread of this space
look like" — principal components and their explained variance. The
scalable shape is the one MLlib's RowMatrix uses for its covariance:
a SINGLE distributed pass accumulates the dxd Gram matrix and the
column sums (each task folds its Arrow batches into a local numpy
``X.T @ X`` — BLAS syrk, no per-row Python), the dxd solve happens on
the driver (d is 64 here; the eigensolve is microseconds), and the
projection is a map-side dot product. Nothing data-proportional ever
reaches the driver: the shuffled stats are ``n_partitions x
d(d+3)/2`` rows and the collected frame is exactly ``d(d+3)/2 + 1``.

Determinism (the ``--twice`` gate hashes projections byte-for-byte):
partial Gram sums meet in a HashAggregate whose float add order can
vary with partitioning, so the covariance is rounded to 9 decimal
places before the eigensolve — jitter is ~1e-10 relative, the
rounding absorbs it, and ``numpy.linalg.eigh`` on an identical matrix
is identical. Eigenvector sign is fixed by convention (the largest-
magnitude coefficient is made positive), and projections round to
6 dp.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prisma_migrator_spark.operators.driver_state import bounded_collect

_STATS_SCHEMA = "i int, j int, s double"


def covariance_stats(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> tuple[np.ndarray, np.ndarray, int]:
    """One distributed pass -> (covariance dxd, mean d, n).

    Emits per-partition partial sums as (i, j, s) rows — upper-triangle
    Gram entries, column sums as (i, -1), the row count as (-1, -1) —
    then sums them in one tiny HashAggregate. The collected frame is
    structurally d(d+3)/2 + 1 rows whatever the data size.
    """
    iu0, iu1 = np.triu_indices(dim)

    def run(it):
        import pandas as pd

        gram = np.zeros((dim, dim))
        col_sum = np.zeros(dim)
        n = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            gram += x.T @ x
            col_sum += x.sum(axis=0)
            n += x.shape[0]
        yield pd.DataFrame(
            {
                "i": np.concatenate(
                    [iu0, np.arange(dim), np.array([-1])]
                ).astype("int32"),
                "j": np.concatenate(
                    [iu1, np.full(dim, -1), np.array([-1])]
                ).astype("int32"),
                "s": np.concatenate(
                    [gram[iu0, iu1], col_sum, np.array([float(n)])]
                ),
            }
        )

    stats = (
        df.select(vec_col)
        .mapInPandas(run, _STATS_SCHEMA)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
    )
    rows = bounded_collect(
        stats,
        dim * (dim + 3) // 2 + 1,
        "PCA stats: one row per upper-triangle Gram entry + d column "
        "sums + 1 count, independent of data size",
    )
    gram = np.zeros((dim, dim))
    col_sum = np.zeros(dim)
    n = 0
    for r in rows:
        if r.i == -1:
            n = int(r.s)
        elif r.j == -1:
            col_sum[r.i] = r.s
        else:
            gram[r.i, r.j] = r.s
            gram[r.j, r.i] = r.s
    if n < 2:
        raise ValueError(f"PCA needs >= 2 vectors, got {n}")
    mean = col_sum / n
    cov = gram / n - np.outer(mean, mean)
    return np.round(cov, 9), mean, n


def fit_components(
    cov: np.ndarray, k: int = 2
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k eigenvectors (rows) + explained-variance ratios from a
    covariance matrix, sign-fixed so the largest-magnitude coefficient
    of each component is positive."""
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    total = float(vals.sum())
    explained = vals[order] / total if total > 0 else np.zeros(k)
    return comps, explained


def project(
    df: DataFrame,
    mean: np.ndarray,
    comps: np.ndarray,
    vec_col: str = "embedding",
    out_prefix: str = "pc",
) -> DataFrame:
    """Map-side projection onto the fitted components: ``pc_k =
    dot(x, v_k) - dot(mean, v_k)`` — the mean term folds into a scalar
    constant, so each component costs one ``zip_with`` + ``aggregate``
    over the array, no shuffle, no Python."""
    from prisma_migrator_spark.operators.literals import double_array

    out = df
    for k, comp in enumerate(comps, start=1):
        weights = double_array(comp)
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                weights,
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )
        offset = float(np.dot(mean, comp))
        out = out.withColumn(
            f"{out_prefix}{k}", F.round(dot - F.lit(offset), 6)
        )
    return out
