#!/usr/bin/env python
"""Fold the round-5 SECOND measurement batch into SCALE_r05.json.

Batch 2 = 14 shape-representative queries that had no curve through
SCALE_r04/early-r05 (tools/scale_r5b.sh: per-query fresh JVM, DNF
timeouts), plus idle-host re-runs for entries whose first pass either
overlapped concurrent work or was superseded by a same-round code fix
(tfidf guard/cap, part_entity_clusters duplicate collapse).

Inputs: /tmp/scale_r5b_sf{0.1,1,10}.jsonl (one JSON line per query)
and optional /tmp/scale_r5b_rerun_*.jsonl overrides (same format,
later lines win).
"""

import glob
import json

OUT = "/root/repo/SCALE_r05.json"

NOTES = {
    "tfidf_cosine_pairs": (
        "DNF at sf1 AND sf10 — the finding, not a miss: Σ df² over "
        "kept terms is 41.8M at 50k docs but 3.76B at 500k (the "
        "relative 25% stopband keeps terms whose df grows with the "
        "corpus), and AQE coalesces the pre-explosion shuffle to 2 "
        "partitions. The form now fails fast via a Σ df² guard; "
        "tfidf_cosine_pairs_capped is the linear-mass scale path "
        "(PERF.md #53)."
    ),
    "part_entity_clusters": (
        "first pass measured the pre-fix form: 9.1/79.2s/DNF-bound "
        "(8.7x/decade — record-level Levenshtein pairs are quadratic "
        "on duplicate-heavy data). Re-measured after the "
        "collapse-exact-duplicates-first rework; the fuzzy join is "
        "now vocabulary-sized and the curve is FLAT (the distinct "
        "name vocabulary saturates while rows grow)."
    ),
    "doc_containment_pairs": (
        "DNF at sf10 — same Σ df² quadratic-candidate mass as "
        "tfidf_cosine_pairs (the asymmetric containment join is also "
        "term-keyed); the form now carries the same fail-fast guard, "
        "and doc_containment_pairs_capped (absolute df cap on the "
        "candidate-generating postings) is the linear scale path."
    ),
    "retention_cohorts_daily": (
        "first pass measured the join-back form at 18.6x in the last "
        "decade (two fact-wide shuffles + count-distinct expansion "
        "over event rows). Reworked to collect_set-of-active-days "
        "per user: one fact scan, one user-keyed exchange with "
        "map-side collapse, explode, plain COUNT — re-measured "
        "post-fix (rerun2 lines)."
    ),
    "tfidf_cosine_pairs_capped": (
        "the scale path for the DNF'd naive form; first-pass sf10 "
        "(447.7s) overlapped a concurrent pytest run — idle re-run "
        "59.4s. Curve 1.9x/6.3x per decade vs 10x/decade postings "
        "growth: sub-work-proportional, the cap·|postings| candidate "
        "bound holds in measurement."
    ),
    "doc_containment_pairs_capped": (
        "three generations measured: (1) contaminated first pass "
        "1057.7s at sf10; (2) idle re-run of the SAME code filled "
        "the disk (60GB+ shuffle spill) and DNF'd — the full-set "
        "verification re-join fanned 26.9M candidate pairs x ~53 "
        "shingles into ~1.4B rows; (3) reworked verification "
        "(low-multiplicity + tiny high-shingle array intersect "
        "behind a lossless bound prune — measured candidate "
        "multiplicity is 1.007, so the bound kills ~everything) "
        "lands 3.2/11.7/33.8s — work-proportional (rerun3 lines)."
    ),
    "_protocol_batch2": (
        "the first-pass sf10 lines for the two capped variants ran "
        "concurrently with the full pytest suite (32-core "
        "contention, the PERF.md #35 contamination mode); all "
        "rerun2 lines are idle-host and supersede them (later-wins "
        "in this assembler)."
    ),
}


def main() -> None:
    runs: dict[str, dict[str, float | str]] = {}
    for sf_key, pattern in [
        ("sf0.1", "/tmp/scale_r5b_sf0.1.jsonl"),
        ("sf1", "/tmp/scale_r5b_sf1.jsonl"),
        ("sf10", "/tmp/scale_r5b_sf10.jsonl"),
    ]:
        paths = [pattern] + sorted(
            glob.glob(pattern.replace(".jsonl", "_rerun*.jsonl"))
        )
        for p in paths:
            try:
                with open(p) as f:
                    for line in f:
                        rec = json.loads(line)
                        for name, sec in rec["queries"].items():
                            runs.setdefault(name, {})[sf_key] = sec
            except FileNotFoundError:
                pass

    batch2 = {}
    for name in sorted(runs):
        row = dict(runs[name])
        a, b, c = row.get("sf0.1"), row.get("sf1"), row.get("sf10")
        if isinstance(a, float) and isinstance(b, float):
            row["ratio_01_to_1"] = round(b / a, 2)
        if isinstance(b, float) and isinstance(c, float):
            row["ratio_1_to_10"] = round(c / b, 2)
        batch2[name] = row

    with open(OUT) as f:
        out = json.load(f)
    out["queries_batch2"] = batch2
    out["notes_batch2"] = NOTES
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}: {len(batch2)} batch-2 queries")


if __name__ == "__main__":
    main()
