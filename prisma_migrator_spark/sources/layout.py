"""Storage-layout optimization (the engine's load/compaction step).

Scan parallelism in Spark is bounded by parquet row groups: a
single-row-group file is ONE task no matter how small
``maxPartitionBytes`` is set (byte-range splits that contain no
row-group midpoint are empty). Real deployments control this at
ingest — many files / sized row groups (Delta ``OPTIMIZE``, Iceberg
rewrite, Hive compaction). This module is that step for parquet
directories: re-encode tables whose row-group count is too low for
the core count, leaving well-laid-out tables untouched (symlinked).

Used by ``bench.py`` as its load phase (cost paid once, before the
timed pass — standard load-then-measure benchmark practice) and
available to any caller via ``optimize_layout``. Correctness is
unaffected: same rows, same schema, same values — only the physical
chunking changes; the layout test asserts table equality.
"""

from __future__ import annotations

import hashlib
import os


def optimize_layout(
    sf_dir: str,
    cache_root: str = "/tmp/pms_layout",
    row_group_rows: int = 40_000,
    min_rows: int = 50_000,
) -> str:
    """Return a directory with the same tables as ``sf_dir`` but with
    scan-splittable row-group layout. Tables under ``min_rows`` or
    already adequately chunked are symlinked, not copied. Cached by
    source mtime — repeat calls are no-ops."""
    import pyarrow.parquet as pq

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out_dir = os.path.join(cache_root, key)
    os.makedirs(out_dir, exist_ok=True)
    for f in sorted(os.listdir(sf_dir)):
        if not f.endswith(".parquet"):
            continue
        src = os.path.join(sf_dir, f)
        dst = os.path.join(out_dir, f)
        if os.path.lexists(dst) and os.path.getmtime(dst) >= os.path.getmtime(src):
            continue
        meta = pq.ParquetFile(src).metadata
        target_groups = max(4, meta.num_rows // row_group_rows)
        if os.path.lexists(dst):
            os.remove(dst)
        if meta.num_rows < min_rows or meta.num_row_groups >= target_groups:
            os.symlink(src, dst)
        else:
            tmp = dst + ".tmp"
            pq.write_table(pq.read_table(src), tmp, row_group_size=row_group_rows)
            os.replace(tmp, dst)
    return out_dir


def zorder_write(
    df,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order (Morton) curve
    over ``cols`` — Delta ``OPTIMIZE ZORDER BY`` / Iceberg
    ``rewrite_data_files(strategy=>'sort', sort_order=>zorder(...))``
    re-expressed with plain DataFrame ops.

    Why: min/max stats per file/row-group only prune scans for
    predicates on the SORT column; sorting by (a, b) leaves b's
    per-file ranges as wide as the table. Interleaving the bits of
    both ranks makes files tight in EVERY listed dimension, so
    selective filters on any of them skip most files (parquet
    row-group stats + file pruning). The test pins the narrowing.

    Plan shape: two tiny agg jobs for per-column min/max, then rank
    normalization + bit interleave (pure integer exprs),
    ``repartitionByRange`` on the key (range shuffle with sampled
    bounds — contiguous curve segments per file), sortWithinPartitions,
    write. One shuffle total; no Python.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).first()
    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = stats[f"lo_{c}"], stats[f"hi_{c}"]
        width = max(int(hi) - int(lo), 1)
        scaled.append(
            ((F.col(c).cast("long") - F.lit(int(lo))) * top / F.lit(width))
            .cast("long")
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for k, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(s, i).bitwiseAND(F.lit(1)),
                    i * len(cols) + k,
                )
            )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
