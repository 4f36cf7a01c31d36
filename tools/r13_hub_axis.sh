#!/bin/bash
# Round-13 HUB (skew) axis at k10 (VERDICT r12 item 3): the dup-axis
# playbook applied to hubs — r11 strict-certified hub_k3; k10 is where
# the q61 degree-orientation O(sqrt m) bound, the frontier joins
# (q52/q59), the hierarchy rollup (q70) and the LSH hot buckets
# (d2/d6/d19/p7) earn their keep or get caught. Same 18-query family
# as strict_hub_k3_full_r11 plus q70_hierarchy_rollup.
set -euo pipefail
cd "$(dirname "$0")/.."
G=/tmp/graft_scale
export SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g

HUBQ="d14_edit_join,d19_quality_survivor,d20_exact_substrings,d21_substring_removal,d22_substrings_grouped,d23_substring_removal_owned,d2_minhash_lsh,d6_dup_clusters,p7_leakage_free_split,q24_sessionize,q49_hour_concurrency,q51_session_window,q52_bfs_reach,q53_range_frame,q54_salted_join,q59_pagerank,q61_triangles,q70_hierarchy_rollup,q77_graph_profile"

[ -d "$G/hub_k10" ] || \
  tools/graftrun.sh graft.ScaleGen /root/testdata/sf0.1 "$G/hub_k10" 10 hub

echo "=== $(date +%H:%M:%S) verify hub axis @ hub_k10"
tools/graftrun.sh graft.Verify "$G/hub_k10" /tmp/verify_hub_k10 "$HUBQ"
echo "=== $(date +%H:%M:%S) oracle hub axis @ hub_k10"
python3 tools/drive_oracle.py "$G/hub_k10" /tmp/verify_hub_k10 \
  --strict --timeout=1800 --jobs=4 --only="$HUBQ"
cp /tmp/drive_oracle_results.json bench_raw/strict_hub_k10_r13.json

echo "=== $(date +%H:%M:%S) bench @ hub_k10"
SPARK_GRAFT_SF_DIR="$G/hub_k10" \
  SPARK_GRAFT_BENCH_OUT="bench_raw/bench_hub_k10_r13.json" \
  tools/graftrun.sh graft.Bench "$HUBQ"

echo "=== $(date +%H:%M:%S) done"
