#!/usr/bin/env python
"""Steady-state timing for individual registered queries at sf0.1.

Same protocol as bench.py (warm pass → clearCache → timed pass, noop
sink) but for an arbitrary query list — the per-operator measurement
harness behind PERF.md's "new operators at sf0.1" entries.

Usage: python tools/op_bench.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prisma_migrator_spark.plans import QUERIES  # noqa: E402
from prisma_migrator_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if os.environ.get("SPARK_GRAFT_OPTIMIZE_LAYOUT", "1") != "0":
        try:
            from prisma_migrator_spark.sources.layout import optimize_layout

            sf_dir = optimize_layout(sf_dir)
        except Exception:
            pass
    names = sys.argv[1:]
    spark = get_spark("pms-op-bench")
    for name in names:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    timings = {}
    for name in names:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
