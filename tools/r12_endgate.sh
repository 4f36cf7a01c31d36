#!/bin/bash
# Round-12 mechanical end-of-round gate (the r8-r10 convention): at
# the snapshot HEAD, run the full ScalaTest suite and the full strict
# oracle drives at all three SFs, then print the one-line summary to
# record in SURVEY §6 against the commit hash.
set -euo pipefail
cd "$(dirname "$0")/.."
HEAD=$(git rev-parse --short HEAD)
echo "=== endgate at $HEAD $(date +%H:%M:%S)"
sbt -batch test 2>&1 | tail -5
for s in sf0.001 sf0.01; do
  python3 tools/check.py "/root/testdata/$s" "/tmp/endgate_$s" 2>&1 | tail -1
done
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  tools/graftrun.sh graft.Verify /root/testdata/sf0.1 /tmp/endgate_sf0.1
python3 tools/drive_oracle.py /root/testdata/sf0.1 /tmp/endgate_sf0.1 \
  --strict --timeout=600 --jobs=4 | tail -3
echo "=== endgate done at $HEAD $(date +%H:%M:%S)"
