#!/bin/bash
# Round-11 FULL-REGISTRY strict drive at ScaleGen sf1 (10× the bench
# SF): Verify dumps every SparkEntry query against the sf1 volume
# shards, then the per-query DuckDB driver replays every oracle
# --strict. The first complete above-bench-SF hash certification —
# extends r10's 9-query dedup proof and this round's 8-query
# graph/heavy proof to the whole registry.
set -euo pipefail
cd "$(dirname "$0")/.."
G=${1:-/tmp/graft_scale/sf1}
OUT=${2:-/tmp/verify_sf1_full}
export SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g
echo "=== $(date +%H:%M:%S) verify full registry @ sf1"
tools/graftrun.sh graft.Verify "$G" "$OUT"
echo "=== $(date +%H:%M:%S) oracle full registry @ sf1"
python3 tools/drive_oracle.py "$G" "$OUT" --strict --timeout=1800
cp /tmp/drive_oracle_results.json bench_raw/strict_sf1_full_r11.json
echo "=== $(date +%H:%M:%S) done"
