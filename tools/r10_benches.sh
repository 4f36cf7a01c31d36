#!/bin/bash
# Round-10 evidence pipeline: regenerates the scale corpora and
# re-runs every bench whose round-9 artifact lived (and died) in /tmp,
# writing the raw JSON into bench_raw/ so the evidence chain survives
# the sandbox. Sequential on purpose — concurrent Spark JVMs would
# poison each other's timings.
set -euo pipefail
cd "$(dirname "$0")/.."
R=tools/graftrun.sh
S01=/root/testdata/sf0.1
G=/tmp/graft_scale
LOG=/tmp/r10
mkdir -p "$LOG" bench_raw
export SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g

step() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG/pipeline.log"; }

# one bench invocation: env dir + optional query subset -> artifact
# (SPARK_GRAFT_BENCH_OUT gets the full JSON incl. every raw pass)
bench() { # bench <sfdir> <artifact> [queries]
  local dir=$1 out=$2; shift 2
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_OUT="bench_raw/$out" \
    $R graft.Bench "$@" \
    > "$LOG/$(basename "$out" .json).stdout" 2> "$LOG/$(basename "$out" .json).stderr"
}

HUBQ="q61_triangles,q77_graph_profile,q52_bfs_reach,q59_pagerank,q54_salted_join,q24_sessionize,q49_hour_concurrency,q51_session_window,q53_range_frame,d2_minhash_lsh,d6_dup_clusters,d19_quality_survivor,p7_leakage_free_split,d20_exact_substrings,d21_substring_removal,d22_substrings_grouped,d23_substring_removal_owned"
DUPQ="d1_exact_dedup,x17_line_dedup,d20_exact_substrings,d21_substring_removal,d22_substrings_grouped,d23_substring_removal_owned"

step "scalegen vol sf1 (k10)"
$R graft.ScaleGen "$S01" "$G/sf1" 10 > "$LOG/sg_sf1.log" 2>&1
for k in 1 3 10; do
  step "scalegen hub k$k"
  $R graft.ScaleGen "$S01" "$G/hub_k$k" "$k" hub > "$LOG/sg_hub_k$k.log" 2>&1
  step "scalegen dup k$k"
  $R graft.ScaleGen "$S01" "$G/dup_k$k" "$k" dup > "$LOG/sg_dup_k$k.log" 2>&1
done

for k in 1 3 10; do
  step "bench hub k$k"
  bench "$G/hub_k$k" "bench_hub_k$k.json" "$HUBQ"
  step "bench dup k$k"
  bench "$G/dup_k$k" "bench_dup_k$k.json" "$DUPQ"
done

step "regime bench sf1"
SPARK_GRAFT_SF_DIR="$G/sf1" SPARK_GRAFT_BENCH_OUT=bench_raw/bench_regime_sf1.json \
  $R graft.RegimeBench \
  > "$LOG/regime_sf1.stdout" 2> "$LOG/regime_sf1.stderr"

step "bench full registry sf1 (min-of-2)"
bench "$G/sf1" "bench_full_sf1.json"

step "re-bench r9 regression watchlist sf0.1 (min-of-3)"
SPARK_GRAFT_BENCH_PASSES=3 SPARK_GRAFT_SF_DIR="$S01" \
  SPARK_GRAFT_BENCH_OUT=bench_raw/bench_watchlist_r10_sf0.1.json \
  $R graft.Bench "s6_hybrid_rrf,p6_curation_funnel,t46_sparse_categorical" \
  > "$LOG/watchlist_sf01.stdout" 2> "$LOG/watchlist_sf01.stderr"

step "pipeline done"
