#!/bin/bash
# Isolated per-query bench: ONE FRESH JVM per query, min-of-N inside it.
#
# Why: the full-table graft.Bench run executes 300+ queries x N runs in
# a single JVM, and the accumulated GC/code-cache state inflates late
# queries by 1.1-1.4x at current contract size (round-15 noise finding,
# PLANS.md). Round-over-round ratios taken from that table conflate
# plan regressions with in-JVM drift. This harness gives each query its
# own process, so its number reflects only its own plan — the
# attribution-free measurement the close checklist requires for the
# top drifters before calling a regression real.
#
# Usage (from /root/repo, after `sbt -batch compile`):
#   bash tools/benchiso.sh q07,q100,q285            # min-of-3 each
#   SPARK_GRAFT_BENCH_RUNS=5 bash tools/benchiso.sh q07
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 bash tools/benchiso.sh ...
# Output: one "name seconds" line per query + bench-iso.json (merged
# {"queries":{...}} table, same shape as bench-out.json's queries map).
set -euo pipefail
cd "$(dirname "$0")/.."

QUERIES="${1:?usage: benchiso.sh q07,q100,... (name prefixes)}"
RUNS="${SPARK_GRAFT_BENCH_RUNS:-3}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
MEM="${SPARK_DRIVER_MEM:-8g}"
CLASSES=target/scala-2.13/classes
[ -d "$CLASSES" ] || { echo "compile first: sbt -batch compile" >&2; exit 1; }
CP="$CLASSES:/opt/spark/jars/*"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

out=$(mktemp -d)
IFS=',' read -ra QS <<< "$QUERIES"
for q in "${QS[@]}"; do
  SPARK_GRAFT_BENCH_ONLY="$q" SPARK_GRAFT_BENCH_RUNS="$RUNS" \
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_OUT="$out/$q.json" \
  java -Xmx"$MEM" $ADD_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench > /dev/null 2> "$out/$q.err" \
    || { echo "$q FAILED (see $out/$q.err)" >&2; exit 1; }
done

python3 - "$out" "$RUNS" "$SF_DIR" <<'PY'
import json, sys, glob, os
out, runs, sf = sys.argv[1], int(sys.argv[2]), sys.argv[3]
merged = {}
for f in sorted(glob.glob(os.path.join(out, "*.json"))):
    merged.update(json.load(open(f))["queries"])
for k in sorted(merged):
    print(f"{k} {merged[k]:.3f}")
json.dump({"metric": "iso", "unit": "sec", "runs": runs, "sf": sf,
           "jvm": "one-per-query", "queries": merged},
          open("bench-iso.json", "w"))
print(f"wrote bench-iso.json ({len(merged)} queries, "
      f"min-of-{runs}, fresh JVM each)")
PY
