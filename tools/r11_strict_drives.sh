#!/bin/bash
# Round-11 strict drives (VERDICT r10 tasks 1+2): extend the
# above-bench-SF hash-certification beyond the dedup family.
#   (a) graph + heavy-plan queries strict at ScaleGen sf1 — the most
#       expensive plans in the registry, previously certified only at
#       <= sf0.1;
#   (b) the HUB (skew) axis — first-ever strict drive on hub shards,
#       where q54's salting, d14's variant buckets and q61's
#       degree-orientation earn their keep.
# Sequential on purpose; Verify dumps then per-query DuckDB replay.
set -euo pipefail
cd "$(dirname "$0")/.."
G=/tmp/graft_scale
export SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g

GRAPHQ="q52_bfs_reach,q59_pagerank,q61_triangles,q70_hierarchy_rollup,q77_graph_profile,e10_ivf_recall_sweep,e20_anisotropy,d19_quality_survivor"
HUBQ="q54_salted_join,d14_edit_join,q61_triangles,q24_sessionize"

echo "=== $(date +%H:%M:%S) verify graph/heavy @ sf1"
tools/graftrun.sh graft.Verify "$G/sf1" /tmp/verify_sf1_graph "$GRAPHQ"
echo "=== $(date +%H:%M:%S) oracle graph/heavy @ sf1"
python3 tools/drive_oracle.py "$G/sf1" /tmp/verify_sf1_graph \
  --strict --timeout=1800 --only="$GRAPHQ"
cp /tmp/drive_oracle_results.json bench_raw/strict_sf1_graph_r11.json

echo "=== $(date +%H:%M:%S) verify hub axis @ hub_k3"
tools/graftrun.sh graft.Verify "$G/hub_k3" /tmp/verify_hub_k3 "$HUBQ"
echo "=== $(date +%H:%M:%S) oracle hub axis @ hub_k3"
python3 tools/drive_oracle.py "$G/hub_k3" /tmp/verify_hub_k3 \
  --strict --timeout=1800 --only="$HUBQ"
cp /tmp/drive_oracle_results.json bench_raw/strict_hub_k3_r11.json

echo "=== $(date +%H:%M:%S) done"
