#!/bin/bash
# Verify a comma-separated query prefix list against the DuckDB oracle at
# sf0.01 AND sf0.001 (the two driver scales), printing only the matching
# PASS/FAIL lines. Usage: tools/vq.sh q189,q46
set -e
QS="$1"
PAT=$(echo "$QS" | sed 's/,/|/g')
for sf in sf0.01 sf0.001; do
  OUT=/tmp/vq_${sf}
  rm -rf "$OUT"
  SPARK_GRAFT_ONLY="$QS" SPARK_GRAFT_CPUS=8 sbt -batch \
    "runMain graft.Verify /root/testdata/$sf $OUT" >/dev/null 2>&1
  echo "== $sf =="
  python3 tools/check.py /root/testdata/$sf "$OUT" 2>/dev/null \
    | grep -E "^(PASS|FAIL) ($PAT)"
done
