"""Layout optimization: physical chunking changes, data does not."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from prisma_migrator_spark.catalog import read_parquet
from prisma_migrator_spark.sources.layout import optimize_layout


def test_optimize_layout_preserves_data(spark, sf_dir, tmp_path):
    out = optimize_layout(
        sf_dir, cache_root=str(tmp_path), row_group_rows=500, min_rows=1000
    )
    for t in ["lineitem", "events", "nation"]:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        a = read_parquet(spark, src)
        b = read_parquet(spark, dst)
        assert a.schema == b.schema
        assert a.count() == b.count()
        assert a.exceptAll(b).isEmpty()
        assert b.exceptAll(a).isEmpty()
    # big table got re-chunked; tiny table is a symlink, not a copy
    assert pq.ParquetFile(os.path.join(out, "lineitem.parquet")).metadata.num_row_groups > 1
    assert os.path.islink(os.path.join(out, "nation.parquet"))
    # second call is a cached no-op (mtimes unchanged)
    before = os.path.getmtime(os.path.join(out, "lineitem.parquet"))
    optimize_layout(sf_dir, cache_root=str(tmp_path), row_group_rows=500, min_rows=1000)
    assert os.path.getmtime(os.path.join(out, "lineitem.parquet")) == before
