#!/bin/bash
# Round-11 main evidence pipeline: regenerate the scale corpora with
# the current generator (n_chars now consistent with the final text),
# then (a) the first FULL-REGISTRY strict drive at ScaleGen sf1 and
# (b) an extended hub-axis strict drive (the full skew-sensitive
# query set, not just the 4-query certification sample).
set -euo pipefail
cd "$(dirname "$0")/.."
G=/tmp/graft_scale
R=tools/graftrun.sh
export SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g

echo "=== $(date +%H:%M:%S) scalegen sf1 (vol k10)"
$R graft.ScaleGen /root/testdata/sf0.1 "$G/sf1" 10 > /tmp/r11_sg_sf1.log 2>&1
echo "=== $(date +%H:%M:%S) scalegen hub_k3"
$R graft.ScaleGen /root/testdata/sf0.1 "$G/hub_k3" 3 hub > /tmp/r11_sg_hub.log 2>&1

bash tools/r11_strict_full_sf1.sh "$G/sf1" /tmp/verify_sf1_full

HUBQ="q61_triangles,q77_graph_profile,q52_bfs_reach,q59_pagerank,q54_salted_join,q24_sessionize,q49_hour_concurrency,q51_session_window,q53_range_frame,d2_minhash_lsh,d6_dup_clusters,d14_edit_join,d19_quality_survivor,p7_leakage_free_split,d20_exact_substrings,d21_substring_removal,d22_substrings_grouped,d23_substring_removal_owned"
echo "=== $(date +%H:%M:%S) verify hub full set @ hub_k3"
$R graft.Verify "$G/hub_k3" /tmp/verify_hub_full "$HUBQ"
echo "=== $(date +%H:%M:%S) oracle hub full set @ hub_k3"
python3 tools/drive_oracle.py "$G/hub_k3" /tmp/verify_hub_full \
  --strict --timeout=1800 --only="$HUBQ"
cp /tmp/drive_oracle_results.json bench_raw/strict_hub_k3_full_r11.json
echo "=== $(date +%H:%M:%S) done"
