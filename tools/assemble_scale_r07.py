#!/usr/bin/env python
"""Assemble SCALE_r07.json from tools/scale_r7_headline.sh output.

Reads /tmp/scale_r7/rep{1,2,3}_sf{0.1,1,10}.jsonl (one scale_bench
JSON line per query), computes per-(query, sf) MEDIANS over the three
same-day replicas plus the [min, max] spread, then the median-ratio
curve per decade. A query whose median last decade exceeds 12x is
listed under "findings" (VERDICT r6 item 5: a finding, not a shrug).

Usage: python tools/assemble_scale_r07.py [indir] [> SCALE_r07.json]
"""

from __future__ import annotations

import json
import statistics
import sys

INDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_r7"
SFS = ["0.1", "1", "10"]


def main() -> None:
    # samples[q][sf] = [sec, ...]
    samples: dict[str, dict[str, list[float]]] = {}
    dnf: set[tuple[str, str]] = set()
    for rep in (1, 2, 3):
        for sf in SFS:
            path = f"{INDIR}/rep{rep}_sf{sf}.jsonl"
            try:
                lines = open(path).read().splitlines()
            except FileNotFoundError:
                continue
            for line in lines:
                if not line.strip():
                    continue
                d = json.loads(line)
                for q, sec in d["queries"].items():
                    if sec == "DNF":
                        dnf.add((q, sf))
                        continue
                    samples.setdefault(q, {}).setdefault(sf, []).append(sec)

    queries: dict[str, dict] = {}
    findings: list[str] = []
    for q in sorted(samples):
        entry: dict = {}
        for sf in SFS:
            ts = samples[q].get(sf)
            if not ts:
                continue
            entry[f"sf{sf}"] = {
                "median": round(statistics.median(ts), 3),
                "spread": [round(min(ts), 3), round(max(ts), 3)],
                "n": len(ts),
            }
        for lo, hi in (("0.1", "1"), ("1", "10")):
            a, b = entry.get(f"sf{lo}"), entry.get(f"sf{hi}")
            if a and b:
                r = round(b["median"] / a["median"], 2)
                entry[f"ratio_{lo}_to_{hi}"] = r
                if hi == "10" and r > 12:
                    findings.append(
                        f"{q}: median last decade {r}x (> 12x) — "
                        f"sf1 {a['median']}s -> sf10 {b['median']}s"
                    )
        queries[q] = entry
    for q, sf in sorted(dnf):
        queries.setdefault(q, {})[f"sf{sf}"] = "DNF"

    out = {
        "protocol": (
            "fresh JVM per query (own sf0.001 warmup), noop sink, "
            "local[32]; n=3 same-day replicated endpoints per "
            "(query, sf), REP-MAJOR order; generated fixtures at all "
            "three endpoints (gen_fixtures.py recipe); driver heap "
            "8g/16g/64g at sf0.1/1/10; topk_cosine_lsh stands in for "
            "the O(n^2)-by-design bruteforce at sf10 (r4 substitution)"
        ),
        "headline_refresh": queries,
        "findings": findings or "none — no median last decade exceeds 12x",
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
