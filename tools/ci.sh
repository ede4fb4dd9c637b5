#!/bin/bash
# CI gate: unit/spec suite + correctness vs DuckDB oracle + stress budgets.
# Any failure exits nonzero. From /root/repo:
#   bash tools/ci.sh
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch test

out=$(mktemp -d)
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $out/verify"
python3 tools/check.py /root/testdata/sf0.01 "$out/verify"

# per-shape time budgets on the 200k-doc replicated corpus: catches
# selectivity/candidate-volume regressions before the bench does
sbt -batch "runMain graft.tools.Stress /root/testdata/sf0.1 40"

echo "CI_OK"
