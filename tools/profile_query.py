#!/usr/bin/env python
"""Per-stage wall/CPU/shuffle profile for one registered query.

Runs the query with the UI on (warm pass -> clearCache -> timed pass,
noop sink, same protocol as bench.py), then reads the stage REST API
and prints each timed-pass stage's submission order, wall span, task
time, executor CPU time, shuffle read/write bytes, and the first line
of its operator description — the guide-§1 "which stage is the time
going to" answer, scriptable.

Usage: python tools/profile_query.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_GRAFT_UI"] = "1"

from prisma_migrator_spark.plans import QUERIES  # noqa: E402
from prisma_migrator_spark.session import get_spark  # noqa: E402


def _rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if os.environ.get("SPARK_GRAFT_OPTIMIZE_LAYOUT", "1") != "0":
        try:
            from prisma_migrator_spark.sources.layout import optimize_layout

            sf_dir = optimize_layout(sf_dir)
        except Exception:
            pass
    spark = get_spark("pms-profile")
    app_id = spark.sparkContext.applicationId
    for name in sys.argv[1:]:
        # warm pass (JIT + codegen), then the timed pass we profile
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        seen = {s["stageId"] for s in _rest(f"applications/{app_id}/stages")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        stages = [
            s
            for s in _rest(f"applications/{app_id}/stages?status=complete")
            if s["stageId"] not in seen
        ]
        stages.sort(key=lambda s: s["stageId"])
        print(f"\n=== {name}: wall {wall:.3f}s, {len(stages)} stages ===")
        t_first = min(s["firstTaskLaunchedTime"] for s in stages) if stages else ""
        for s in stages:
            desc = (s.get("description") or s["name"]).splitlines()[0][:70]
            print(
                f"  stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
                f"taskTime={s['executorRunTime']/1000:7.2f}s "
                f"cpu={s['executorCpuTime']/1e9:7.2f}s "
                f"shufR={s['shuffleReadBytes']/1e6:8.2f}MB "
                f"shufW={s['shuffleWriteBytes']/1e6:8.2f}MB "
                f"in={s['inputBytes']/1e6:8.2f}MB  {desc}"
            )
        total_task = sum(s["executorRunTime"] for s in stages) / 1000
        total_cpu = sum(s["executorCpuTime"] for s in stages) / 1e9
        print(f"  TOTAL taskTime={total_task:.2f}s cpu={total_cpu:.2f}s "
              f"(wall {wall:.3f}s x 32 cores = {wall*32:.1f} core-s budget)")


if __name__ == "__main__":
    main()
