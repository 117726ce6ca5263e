#!/usr/bin/env python
"""Registry-wide physical-plan audit: flag scale red flags per query.

Prints one line per query that shows any of: single-partition
exchanges, range-partitioning (global sort) exchanges, sort-based /
object-hash aggregation, sort-merge joins. A flag is not automatically
a bug — 1-row global aggregates, report-tail sorts, and sketch
aggregates legitimately show up — but every NEW flag deserves a look;
diff against the known-good list in PERF.md ("Plan-quality audit").

Usage: python tools/plan_audit.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prisma_migrator_spark.plans.registry import QUERIES  # noqa: E402
from prisma_migrator_spark.session import get_spark  # noqa: E402

CHECKS = [
    ("SinglePartition", r"Exchange SinglePartition"),
    ("rangepartitioning", r"Exchange rangepartitioning"),
    ("ObjectHashAgg", r"ObjectHashAggregate"),
    ("SortAgg", r"SortAggregate"),
    ("SMJ", r"SortMergeJoin"),
    ("rowwisePythonUDF", r"BatchEvalPython"),
    ("cartesian", r"CartesianProduct"),
]


def main() -> None:
    spark = get_spark("plan-audit")
    spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
    sf = os.environ.get("SPARK_GRAFT_AUDIT_SF", "/root/testdata/sf0.01")
    names = sys.argv[1:] or sorted(QUERIES)
    for name in names:
        try:
            plan = (
                QUERIES[name](spark, sf)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001 - audit must not abort
            print(f"{name}: ERROR {str(e)[:100]}")
            continue
        flags = [
            f"{label} x{n}"
            for label, pat in CHECKS
            if (n := len(re.findall(pat, plan)))
        ]
        if flags:
            print(f"{name}: {', '.join(flags)}")


if __name__ == "__main__":
    main()
