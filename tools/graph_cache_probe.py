#!/usr/bin/env python
"""Controlled cold/warm page-cache experiment for the graph family
(VERDICT r5 item 1).

The open question from round 5: `copurchase_communities` and
`copurchase_triangles_capped` measure 18-24x in the sf1→sf10 decade
(vs 10x edge growth), and the defense was "one-box cache physics —
the identical plan ran 86 s fully warm" — an argument, not a
measurement. This tool runs the controlled experiment that pins it:

  warmup (sf0.001, compiles every plan)     — JVM/codegen hot
  [cycle]
    drop OS page caches → timed run  COLD   — JVM hot, IO cold
    timed run            WARM               — JVM hot, IO hot
    drop OS page caches → timed run  COLD2  — JVM hot, IO cold again

All three runs execute the IDENTICAL plan in the SAME JVM, so the
only variable across COLD/WARM/COLD2 is the OS page cache (input
parquet + shuffle/spill files). Interpretation:

  COLD2 ≈ COLD  ≫ WARM  → the residual super-linearity is page-cache
                          /IO physics, not plan work (cluster
                          aggregate page cache absorbs it at 100 TB —
                          each executor caches only its slice);
  COLD2 ≈ WARM  ≪ COLD  → it was JVM/first-touch warmup, and the
                          protocol number overstates steady-state.

Per run it also records /proc/meminfo page-cache deltas and, when the
Spark UI is up (SPARK_GRAFT_UI=1 is set by main()), the per-run sums
of executor run time, shuffle read/write bytes, and memory/disk spill
from the stage REST API — the bytes accounting the verdict asked for.

A second mode accounts materialized-edge BYTES (what the persisted /
localCheckpoint'ed frames actually cost per edge):

    python tools/graph_cache_probe.py --edge-bytes <sf_dir>

builds the LPA receiver-partitioned persisted edge frame and the
triangle oriented-edge localCheckpoint at <sf_dir>, then reads
`getRDDStorageInfo` → memory/disk bytes per edge for each.

Usage:
    python tools/graph_cache_probe.py <query> <sf_dir> [n_cycles]
    python tools/graph_cache_probe.py --edge-bytes <sf_dir>

Needs root for /proc/sys/vm/drop_caches (the sandbox has it).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

os.environ.setdefault("SPARK_GRAFT_UI", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prisma_migrator_spark.plans import QUERIES  # noqa: E402
from prisma_migrator_spark.session import get_spark  # noqa: E402

WARMUP_DIR = "/root/testdata/sf0.001"


def drop_caches() -> None:
    os.sync()
    with open("/proc/sys/vm/drop_caches", "w") as f:
        f.write("3\n")
    time.sleep(1)


def page_cached_kb() -> int:
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("Cached:"):
                return int(line.split()[1])
    return -1


def _ui_base(spark) -> str | None:
    try:
        url = spark.sparkContext.uiWebUrl
        if not url:
            return None
        app_id = spark.sparkContext.applicationId
        return f"{url}/api/v1/applications/{app_id}"
    except Exception:
        return None


def stage_totals(base: str | None) -> dict[str, int]:
    """Sum executor-side work metrics over all completed stages so
    far; per-run numbers are deltas between consecutive calls."""
    if base is None:
        return {}
    try:
        with urllib.request.urlopen(f"{base}/stages?status=complete", timeout=10) as r:
            stages = json.load(r)
    except Exception:
        return {}
    keys = {
        "executorRunTime": "executor_ms",
        "shuffleReadBytes": "shuffle_read_b",
        "shuffleWriteBytes": "shuffle_write_b",
        "memoryBytesSpilled": "mem_spill_b",
        "diskBytesSpilled": "disk_spill_b",
        "inputBytes": "input_b",
    }
    out = {v: 0 for v in keys.values()}
    for s in stages:
        for k, v in keys.items():
            out[v] += int(s.get(k, 0) or 0)
    return out


def _gc(spark) -> None:
    """Release leaked localCheckpoint/broadcast blocks between runs so
    run N's cached blocks don't occupy memory during run N+1."""
    spark.catalog.clearCache()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    time.sleep(2)


def timed_run(spark, name: str, sf_dir: str, base: str | None) -> dict:
    before_pc = page_cached_kb()
    before = stage_totals(base)
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = round(time.time() - t0, 3)
    after = stage_totals(base)
    rec = {
        "wall_s": wall,
        "page_cache_before_mb": before_pc // 1024,
        "page_cache_after_mb": page_cached_kb() // 1024,
    }
    for k in after:
        rec[k] = after[k] - before.get(k, 0)
    _gc(spark)
    return rec


def experiment(name: str, sf_dir: str, n_cycles: int) -> dict:
    spark = get_spark("pms-cache-probe")
    base = _ui_base(spark)
    # warmup compiles the plan + JIT at tiny SF (SCALE protocol)
    QUERIES[name](spark, WARMUP_DIR).write.format("noop").mode("overwrite").save()
    _gc(spark)
    cycles = []
    for c in range(n_cycles):
        drop_caches()
        cold = timed_run(spark, name, sf_dir, base)
        warm = timed_run(spark, name, sf_dir, base)
        drop_caches()
        cold2 = timed_run(spark, name, sf_dir, base)
        cycles.append({"cold": cold, "warm": warm, "cold2": cold2})
        print(
            f"  cycle {c}: cold={cold['wall_s']}s warm={warm['wall_s']}s "
            f"cold2={cold2['wall_s']}s",
            file=sys.stderr,
            flush=True,
        )
    return {"query": name, "sf_dir": sf_dir, "cycles": cycles}


def edge_bytes(sf_dir: str) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from prisma_migrator_spark.catalog import load_table
    from prisma_migrator_spark.plans.graph import (
        _graph_width,
        _lpa_edges,
        _orient_edges,
        copurchase_edges,
        copurchase_pairs,
    )

    spark = get_spark("pms-edge-bytes")
    li = load_table(spark, sf_dir, "lineitem")
    width = _graph_width(spark, li)

    def storage_rows(tag: str, n_rows: int) -> dict:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        mem = sum(i.memSize() for i in infos)
        disk = sum(i.diskSize() for i in infos)
        return {
            "frame": tag,
            "rows": n_rows,
            "mem_mb": round(mem / 2**20, 1),
            "disk_mb": round(disk / 2**20, 1),
            "bytes_per_row": round((mem + disk) / max(1, n_rows), 1),
        }

    out = {"sf_dir": sf_dir, "width": width, "frames": []}
    # LPA persisted receiver-partitioned symmetric edges
    lpa = _lpa_edges(copurchase_pairs(li, distinct=False, n_partitions=width), width)
    n = lpa.count()
    out["frames"].append(storage_rows("lpa_edges(persist)", n))
    lpa.unpersist(blocking=True)
    _gc_all(spark)
    # triangle symmetric localCheckpoint + oriented localCheckpoint
    und = copurchase_edges(li, n_partitions=width).localCheckpoint()
    n_und = und.count()
    out["frames"].append(storage_rows("und(localCheckpoint)", n_und))
    e = _orient_edges(und)
    n_e = e.count()
    # storage now holds und + e; report the delta-attributable frame
    out["frames"].append(storage_rows("und+oriented(localCheckpoint)", n_und + n_e))
    return out


def _gc_all(spark) -> None:
    spark.catalog.clearCache()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    time.sleep(2)


def main() -> None:
    if sys.argv[1] == "--edge-bytes":
        print(json.dumps(edge_bytes(sys.argv[2])))
        return
    name, sf_dir = sys.argv[1], sys.argv[2]
    n_cycles = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    assert name in QUERIES, f"unknown query {name}"
    print(json.dumps(experiment(name, sf_dir, n_cycles)))


if __name__ == "__main__":
    main()
