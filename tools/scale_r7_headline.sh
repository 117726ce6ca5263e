#!/bin/bash
# r7 headline scale-curve refresh (VERDICT r6 item 5): the r4 headline
# sf1/sf10 curves were SINGLE-sample endpoints — the exact methodology
# the #61/#62 experiments discredited for the graph family. Re-measure
# the 14 headliners at sf0.1gen / sf1 / sf10 with n=3 same-day
# replicated endpoints under the fresh-JVM-per-query protocol
# (one scale_bench invocation per query = its own JVM + sf0.001
# warmup), REP-MAJOR order (rep1 all SFs, rep2 all SFs, ...) so a
# host drift lands across SFs, not inside one SF's triple. All three
# endpoints use GENERATED fixtures (same gen_fixtures.py recipe) so
# the ratios compare like with like.
#
# topk_cosine_bruteforce is O(n^2) BY DESIGN (the ANN oracle); at
# sf10 the registered scale path topk_cosine_lsh stands in — the same
# substitution r4 documented. Driver heap per SF and per-query
# timeouts follow scale_r5b.sh (a DNF records as such).
#
# Usage: tools/scale_r7_headline.sh [outdir]   (default /tmp/scale_r7)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/scale_r7}
mkdir -p "$OUT"

HEAD="flagship_popularity category_difficulty latest_per_key_lineitem \
distinct_pair_agg semi_join_orders asof_last_order events_tumbling_hourly \
events_session_30m text_stats clean_corpus minhash_lsh_pairs \
decontaminate_eval pack_stream_512"

if [ ! -d /root/repo/.fixtures/sf0.1gen ]; then
  echo "=== generating sf0.1gen"
  python tools/gen_fixtures.py 0.1 /root/repo/.fixtures/sf0.1gen \
    > "$OUT/gen_sf0.1.log" 2>&1 || { echo "fixture gen FAILED"; exit 1; }
fi

for rep in 1 2 3; do
  for sf in 0.1 1 10; do
    case $sf in
      0.1) dir=/root/repo/.fixtures/sf0.1gen; bf=topk_cosine_bruteforce
           mem=8g; to=300 ;;
      1)   dir=/root/repo/.fixtures/sf1; bf=topk_cosine_bruteforce
           mem=16g; to=600 ;;
      10)  dir=/root/repo/.fixtures/sf10; bf=topk_cosine_lsh
           mem=64g; to=1200 ;;
    esac
    f="$OUT/rep${rep}_sf${sf}.jsonl"
    if [ -s "$f" ]; then echo "skip $f (exists)"; continue; fi
    echo "=== rep $rep sf $sf -> $f"
    : > "$f.tmp"
    for q in $HEAD $bf; do
      if ! timeout "$to" env SPARK_GRAFT_DRIVER_MEM="$mem" \
          python tools/scale_bench.py "$dir" "$q" \
          >> "$f.tmp" 2>>"$OUT/rep${rep}_sf${sf}.err"; then
        echo "{\"sf_dir\": \"$dir\", \"queries\": {\"$q\": \"DNF\"}}" >> "$f.tmp"
      fi
    done
    mv "$f.tmp" "$f"
  done
done
echo DONE
