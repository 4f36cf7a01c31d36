#!/bin/bash
# Round-12 document-LENGTH axis: the third scale dimension (volume =
# row count, hub = key skew, dup = bit-identical mass) certified this
# round — per-doc token count grows k× at CONSTANT row count, so the
# axis isolates per-token kernel cost (gram explodes, HOF folds,
# winnowing windows, BPE merges) from data volume. Strict oracle
# drives at len_k3 and len_k10 over the per-token-heavy family, plus
# bench rows for the SCALING.md cost-vs-k curve.
set -euo pipefail
cd "$(dirname "$0")/.."
R=tools/graftrun.sh
G=/tmp/graft_scale
export SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g

LENQ="d2_minhash_lsh,d17_cdc_chunks,d20_exact_substrings,d21_substring_removal,d22_substrings_grouped,d23_substring_removal_owned,x3_token_count,x5_chunk,x13_unigram_ppl,x17_line_dedup,x18_gopher_rules,x20_bpe_train,x26_c4_filters,x39_mattr,x44_winnowing,x46_hash_classifier"

for k in 3 10; do
  [ -d "$G/len_k$k" ] || \
    $R graft.ScaleGen /root/testdata/sf0.1 "$G/len_k$k" "$k" len
done

for k in 3 10; do
  echo "=== $(date +%H:%M:%S) verify + strict oracle @ len_k$k"
  $R graft.Verify "$G/len_k$k" "/tmp/verify_len_k$k" "$LENQ"
  python3 tools/drive_oracle.py "$G/len_k$k" "/tmp/verify_len_k$k" \
    --strict --timeout=1800 --jobs=4 --only="$LENQ"
  cp /tmp/drive_oracle_results.json "bench_raw/strict_len_k${k}_r12.json"
done

for k in 3 10; do
  echo "=== $(date +%H:%M:%S) bench @ len_k$k"
  SPARK_GRAFT_SF_DIR="$G/len_k$k" \
    SPARK_GRAFT_BENCH_OUT="bench_raw/bench_len_k$k.json" \
    $R graft.Bench "$LENQ"
done

echo "=== $(date +%H:%M:%S) done"
