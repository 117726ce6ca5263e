#!/usr/bin/env python
"""Time one registered query end-to-end the way the driver gate does:
fresh session, BUILD the DataFrame (eager trainer/collect work counts),
then one noop-sink action. Prints JSON {query: {build, action, total}}.

Usage: SPARK_GRAFT_SF_DIR=... python tools/time_gate.py <query> [query ...]
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("pms-gate")
    out = {}
    for name in sys.argv[1:]:
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        out[name] = {
            "build": round(t1 - t0, 2),
            "action": round(t2 - t1, 2),
            "total": round(t2 - t0, 2),
        }
        spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
