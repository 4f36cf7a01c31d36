#!/bin/bash
# Round-10 sf1 strict drive for the dedup family: Verify dumps the
# nine dedup-family queries against the ScaleGen sf1 volume shards,
# then the per-query DuckDB driver replays each oracle --strict —
# correctness at the scale the bench claims (VERDICT r9 nit #3).
set -euo pipefail
cd "$(dirname "$0")/.."
G=${1:-/tmp/graft_scale/sf1}
OUT=${2:-/tmp/verify_sf1}
Q="d1_exact_dedup,d2_minhash_lsh,d6_dup_clusters,d14_edit_join,d20_exact_substrings,d21_substring_removal,d22_substrings_grouped,d23_substring_removal_owned,x17_line_dedup"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  tools/graftrun.sh graft.Verify "$G" "$OUT" "$Q"
python3 tools/drive_oracle.py "$G" "$OUT" --strict --timeout=1800 --only="$Q"
