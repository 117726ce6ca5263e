#!/bin/bash
# Round-5 second measurement batch: scale curves (sf0.1gen -> sf1 ->
# sf10, fresh-JVM-per-query protocol) for 14 shape-representative
# queries that had no curve yet — each picked as the representative of
# a distinct plan shape not covered by SCALE_r04/early-r05 families:
#   tfidf_cosine_pairs      term-keyed pair join after df-prune
#   doc_containment_pairs   asymmetric containment join
#   session_path_trigrams   sessionize + in-session ngram
#   event_attribution_24h   per-user interval attribution
#   retention_cohorts_daily cohort matrix
#   corr_matrix_lineitem    wide all-pairs column agg
#   revenue_cube            CUBE rollup lattice
#   order_price_quartiles   exact percentile + broadcast bucketing
#   part_entity_clusters    fuzzy blocking + connected components
#   quality_model_score     composed scoring pipeline
#   events_sliding_1h_30m   sliding-window row fan-out
#   scd2_part_history       per-key ordered change tracking
#   topk_cosine_ivf         ANN IVF (centroid train + bucketed probe)
#   gopher_repetition_flags map-heavy text repetition stats
# Per-query `timeout` so a DNF records as such instead of stalling the
# batch; one JSON line per (sf, query) appended to the out file.
set -uo pipefail
cd /root/repo
QUERIES="tfidf_cosine_pairs doc_containment_pairs session_path_trigrams \
event_attribution_24h retention_cohorts_daily corr_matrix_lineitem \
revenue_cube order_price_quartiles part_entity_clusters \
quality_model_score events_sliding_1h_30m scd2_part_history \
topk_cosine_ivf gopher_repetition_flags"

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

run /root/repo/.fixtures/sf0.1gen 8g  600  /tmp/scale_r5b_sf0.1.jsonl
run /root/repo/.fixtures/sf1     16g  1200 /tmp/scale_r5b_sf1.jsonl
run /root/repo/.fixtures/sf10    64g  2400 /tmp/scale_r5b_sf10.jsonl
echo DONE
