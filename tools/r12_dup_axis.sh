#!/bin/bash
# Round-12 dup-axis adjudication (VERDICT r11 tasks 1+3): close the
# only open correctness question — d20/d6 at dup_k10 — and bracket
# the axis at dup_k3.
#
#  (a) d6_dup_clusters: the oracle was rewritten with an identity
#      pre-collapse (LlmQueries oracleSql; proven bit-identical to the
#      doc-level closure at sf0.001/sf0.01/dup_k1), making the k10
#      replay 45 s instead of a 3600 s timeout — so the strict drive
#      now covers it directly.
#  (b) d20_exact_substrings: the 12.5M-pair DuckDB replay is the
#      infeasible piece (the r11 run died with no output); the
#      certificate is graft.CertifyDup — the ExactSubstrSpec expansion
#      equality run AT SCALE as a distributed job — combined with the
#      d22 (grouped form) strict DuckDB pass on the same shards.
#      merge_dup_artifact.py stitches the certifier row into the
#      strict artifact with an explicit method field.
#  (c) dup_k3 brackets the axis: every replay is feasible there, so
#      the drive is 9/9 direct — including d20's own pair replay.
set -euo pipefail
cd "$(dirname "$0")/.."
R=tools/graftrun.sh
G=/tmp/graft_scale
export SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g

DEDUPQ="d1_exact_dedup,d2_minhash_lsh,d6_dup_clusters,d14_edit_join,d20_exact_substrings,d21_substring_removal,d22_substrings_grouped,d23_substring_removal_owned,x17_line_dedup"

for k in 3 10; do
  [ -d "$G/dup_k$k" ] || \
    $R graft.ScaleGen /root/testdata/sf0.1 "$G/dup_k$k" "$k" dup
done

echo "=== $(date +%H:%M:%S) certify d20 (expansion equality) @ dup_k10"
$R graft.CertifyDup "$G/dup_k10" /tmp/certify_dup_k10.json

echo "=== $(date +%H:%M:%S) verify + strict oracle @ dup_k3 (9/9 direct)"
$R graft.Verify "$G/dup_k3" /tmp/verify_dup_k3 "$DEDUPQ"
python3 tools/drive_oracle.py "$G/dup_k3" /tmp/verify_dup_k3 \
  --strict --timeout=1800 --only="$DEDUPQ"
cp /tmp/drive_oracle_results.json bench_raw/strict_dup_k3_r12.json

echo "=== $(date +%H:%M:%S) verify + strict oracle @ dup_k10 (8 direct + d20 certified)"
$R graft.Verify "$G/dup_k10" /tmp/verify_dup_k10 "$DEDUPQ"
python3 tools/drive_oracle.py "$G/dup_k10" /tmp/verify_dup_k10 \
  --strict --timeout=1800 \
  --only="${DEDUPQ/d20_exact_substrings,/}"
python3 tools/merge_dup_artifact.py /tmp/drive_oracle_results.json \
  /tmp/certify_dup_k10.json bench_raw/strict_dup_k10_r12.json

echo "=== $(date +%H:%M:%S) done"
