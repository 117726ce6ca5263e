#!/usr/bin/env python
"""Assemble SCALE_r05.json from the round-5 measurement runs.

Round-5 scope (everything else is unchanged since SCALE_r04.json,
whose curves remain the measurement of record for the other 35
families): the two r4 scale failures after their rework (pagerank
checkpoint cadence, bounded triangle variants), the sign-LSH query
after its r5 join rework, and the writer family (upsert rewrite
amplification) that had never been curve-measured.

Inputs: the per-SF JSON lines written by tools/scale_bench.py and
tools/upsert_bench.py under /tmp (see the "runs" dict below for the
exact protocol each number came from).
"""

import json
import sys

OUT = "/root/repo/SCALE_r05.json"


def load(path):
    with open(path) as f:
        return json.load(f)


def main() -> None:
    # first passes overlapped concurrent pytest; the idle-host "_b"
    # re-runs supersede them wherever present
    q01 = load("/tmp/scale_r5_sf0.1gen.json")["queries"]
    q01.update(load("/tmp/scale_r5_sf01gen_b.json")["queries"])
    q1 = load("/tmp/scale_r5_sf1.json")["queries"]
    q1.update(load("/tmp/scale_r5_sf1_b.json")["queries"])
    q10 = load("/tmp/scale_r5_sf10.json")["queries"]
    q10.update(load("/tmp/scale_r5_sf10b.json")["queries"])

    queries = {}
    for name in sorted(q01):
        a, b, c = q01[name], q1[name], q10[name]
        queries[name] = {
            "sf0.1": a,
            "sf1": b,
            "sf10": c,
            "ratio_01_to_1": round(b / a, 2),
            "ratio_1_to_10": round(c / b, 2),
        }

    upsert = {}
    for sf, path in [
        ("sf0.1", "/tmp/upsert_sf0.1.json"),
        ("sf1", "/tmp/upsert_sf1.json"),
        ("sf10", "/tmp/upsert_sf10.json"),
    ]:
        upsert[sf] = load(path)

    out = {
        "protocol": (
            "fresh JVM per query (SCALE_BENCH_ISOLATE=1), warmup pass at "
            "sf0.001, noop sink, local[32], 64g driver heap at sf10, idle "
            "host; generated fixtures (tools/gen_fixtures.py, same recipe "
            "as SCALE_r04). Only the round-5-changed families are "
            "re-measured here; SCALE_r04.json remains the measurement of "
            "record for the unchanged ones."
        ),
        "rows": {
            "sf0.1gen": "600k lineitem / 5k docs / 2k emb",
            "sf1": "6M lineitem / 50k docs / 20k emb",
            "sf10": "60M lineitem / 500k docs / 200k emb",
        },
        "queries": queries,
        "notes": {
            "part_copurchase_pagerank": (
                "8.3x/decade = work-proportional (edges grow 10x/decade); "
                "r4's 13.9x + per-iteration disk churn fixed by single "
                "edge checkpoint + broadcast rank iterations (sf10 "
                "247s -> 135s)"
            ),
            "copurchase_triangles_sampled": (
                "stage-resolved in back-to-back runs: edge-gen 25->209s "
                "(8.4x), triangle join 18.7->185s (9.9x) — work-"
                "proportional; the 30x headline ratio reflects sf1 "
                "riding fully in page cache. The p-dial measured: "
                "keep_pct=10 runs sf10 in 90.5s (vs 352s at 20) — cost "
                "tracks p^2 as designed"
            ),
            "copurchase_triangles_capped": (
                "the co-purchase graph is degree-HOMOGENEOUS (sf1: mean "
                "deg 90, p50 90, max 162), so cap=100 retains ~75% of "
                "vertices and most wedge mass: finishes where exact "
                "DNFs, but caps are the dial for SKEWED graphs; for "
                "this graph the dial is edge sampling (see sampled row)"
            ),
            "embedding_near_dup_lsh": (
                "output-proportional like r4 (9.35x); r5 join rework "
                "(broadcast stop-band mask + single signed-frame "
                "checkpoint) holds the curve while fixing the capped-"
                "bucket recall loss: sf10 571s (r4) -> 554s"
            ),
        },
        "upsert_bench": {
            "protocol": (
                "tools/upsert_bench.py: order-keyed table at ~5k rows/file, "
                "fixed ~300-key clustered batch; full rewrite vs "
                "footer-pruned CoW vs hive-partition overwrite"
            ),
            **upsert,
        },
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out["queries"].items()}, indent=1))
    print(f"wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
