#!/usr/bin/env python
"""Append the r7 binary-modality dedup scale curves to SCALE_r07.json.

Numbers measured 2026-08-16 (this file IS the record of when/how):
fresh-JVM scale_bench per (query, sf), generated fixtures, driver heap
8g/16g/64g at sf0.1gen/sf1/sf10, single endpoints (n=1) unless noted —
first curves for the family. Three code versions distinguished:

- pre-fix:   naive pHash box resample + naive JPEG DCT loops,
             direct (per-doc) banded join, arity 2 at >=20k docs
- vectorized: #77 box-resample + #82 JPEG-DCT numpy rewrites
- collapse:  #83 — hamming_band_pairs collapses identical signatures
             before the banded join (docs-per-distinct-signature
             measured 3.3x audio / 3.7x image / 4.1x video at sf10);
             an arity-3 tier was tried first and measured
             INEFFECTIVE (audio 1169 s vs 1110 s), so the dial
             stays two-tier
"""

import json
import sys

MODALITIES = {
    "protocol": (
        "fresh JVM per (query, sf), noop sink, local[32]; generated "
        "fixtures (gen_fixtures.py); driver heap 8g/16g/64g at "
        "sf0.1gen/sf1/sf10; n=1 endpoints, same-day (2026-08-16); "
        "'final' = shipped code (vectorized hashes #77/#82 + "
        "collapse-exact-first join #83); earlier-version endpoints "
        "retained to show each fix's effect"
    ),
    "video_near_dup_pairs": {
        "final": {"sf0.1": 6.975, "sf1": 75.074, "sf10": 391.125,
                  "ratio_0.1_to_1": 10.8, "ratio_1_to_10": 5.2},
        "history": {
            "sf0.1_pre_fix": 23.085, "sf1_pre_fix": 316.225,
            "sf0.1_vectorized": 14.435, "sf1_vectorized": 90.945,
            "sf10_vectorized_direct_join": 818.853,
        },
        "note": (
            "pre-fix 13.7x/decade flagged -> box-resample vectorized "
            "(#77) -> direct-join sf10 818.9 -> collapse join (#83) "
            "391.1; the 10.8x first decade is overhead-distorted (the "
            "sf0.1 end is ~5s JVM+read floor over ~2s of work)"
        ),
    },
    "audio_near_dup_pairs": {
        "final": {"sf0.1": 11.243, "sf1": 38.277, "sf10": 280.605,
                  "ratio_0.1_to_1": 3.4, "ratio_1_to_10": 7.3},
        "history": {
            "sf0.1_direct": 37.147, "sf1_direct": 73.447,
            "sf10_direct_arity2": 1110.347,
            "sf10_direct_arity3": 1168.664,
        },
        "note": (
            "sf1->sf10 15.1x under the direct join FLAGGED -> arity-3 "
            "tier tried, measured INEFFECTIVE (1169 vs 1110 s) -> real "
            "cause = signature multiplicity (sum bucket-sq quadratic in "
            "docs/distinct-sig; sub-cap sum-sq 721M, 25% of banded rows "
            "in saturated buckets; 3.3x docs per distinct sig) -> "
            "collapse-exact-first (#83): sf10 4.0x faster, 7.3x/decade"
        ),
    },
    "image_near_dup_pairs": {
        "final": {"sf0.1": 4.781, "sf1": 37.533, "sf10": 132.416,
                  "ratio_0.1_to_1": 7.9, "ratio_1_to_10": 3.5},
        "history": {
            "sf0.1_pre_fix": 14.519, "sf1_pre_fix": 132.802,
            "sf1_vectorized_jpeg": 37.769,
            "sf10_vectorized_direct_join": 328.7,
        },
        "note": (
            "JPEG DCT vectorization (#82) cut sf1 2.9x (the q90 "
            "variant decode dominated); collapse join cut sf10 a "
            "further 2.5x"
        ),
    },
}


def main() -> None:
    with open("SCALE_r07.json") as fh:
        d = json.load(fh)
    d["modality_dedup_curves"] = MODALITIES
    with open("SCALE_r07.json", "w") as fh:
        json.dump(d, fh, indent=1)
    print("SCALE_r07.json updated")
    if "--show" in sys.argv:
        print(json.dumps(MODALITIES, indent=1))


if __name__ == "__main__":
    main()
