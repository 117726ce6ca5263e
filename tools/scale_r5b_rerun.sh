#!/bin/bash
# Round-5 batch-2 RERUN pass (fresh-JVM-per-query):
#   part_entity_clusters      — re-measure post collapse-exact-duplicates
#                               rework (2a22698); the first pass at
#                               sf0.1/sf1 measured the pre-fix form.
#   tfidf_cosine_pairs_capped — scale path for the DNF'd naive form.
#   doc_containment_pairs_capped — scale path for the DNF'd naive form.
# Output lines land in /tmp/scale_r5b_sf{SF}_rerun1.jsonl; the
# assembler (assemble_scale_r05b.py) folds them in with later-wins.
set -uo pipefail
cd /root/repo
QUERIES="part_entity_clusters tfidf_cosine_pairs_capped doc_containment_pairs_capped"

run() {  # run <sf_dir> <mem> <per-query timeout> <out>
  : > "$4"; : > "$4.err"
  for q in $QUERIES; do
    if timeout "$3" env SPARK_GRAFT_DRIVER_MEM="$2" \
        python tools/scale_bench.py "$1" "$q" >> "$4" 2>>"$4.err"; then
      :
    else
      echo "{\"sf_dir\": \"$1\", \"queries\": {\"$q\": \"DNF\"}}" >> "$4"
    fi
  done
}

run /root/repo/.fixtures/sf0.1gen 8g  600  /tmp/scale_r5b_sf0.1_rerun1.jsonl
run /root/repo/.fixtures/sf1     16g  1200 /tmp/scale_r5b_sf1_rerun1.jsonl
run /root/repo/.fixtures/sf10    64g  2400 /tmp/scale_r5b_sf10_rerun1.jsonl
echo DONE
