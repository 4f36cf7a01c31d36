#!/bin/bash
# Round-12 FULL-REGISTRY strict drive at ScaleGen sf1 — the r11 gate
# made routine (VERDICT r11 task 4): the three pathological oracle
# replays were rewritten as lossless blocked forms this round (d4
# 27 min → ~2 min, d15 39 min → ~8 min via the inverted-gram-index
# count; d6's recursive closure pre-collapses identity groups), so
# the whole sf1 oracle side now fits a 4-way-parallel drive in well
# under the former worst single replay. Timeout 1200 s (contended
# clock under --jobs; the slowest expected replay is d15 at ~8 min
# sequential).
set -euo pipefail
cd "$(dirname "$0")/.."
G=${1:-/tmp/graft_scale/sf1}
OUT=${2:-/tmp/verify_sf1_full}
export SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g
[ -d "$G" ] || tools/graftrun.sh graft.ScaleGen /root/testdata/sf0.1 "$G" 10
echo "=== $(date +%H:%M:%S) verify full registry @ sf1"
tools/graftrun.sh graft.Verify "$G" "$OUT"
echo "=== $(date +%H:%M:%S) oracle full registry @ sf1 (4-way)"
python3 tools/drive_oracle.py "$G" "$OUT" --strict --timeout=1200 --jobs=4
cp /tmp/drive_oracle_results.json bench_raw/strict_sf1_full_r12.json
echo "=== $(date +%H:%M:%S) done"
