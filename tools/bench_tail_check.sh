#!/usr/bin/env bash
# Pin Bench's tail-hardening (r6 postmortem: BENCH_r06.json parsed:null
# because teardown WARN spam evicted the stdout summary from the driver's
# 2000-char combined-stream tail).
#
# Runs Bench at sf0.001 with a FORCED 500-WARN teardown flood
# (SPARK_GRAFT_BENCH_WARNFLOOD) and asserts, on the combined
# stdout+stderr stream:
#   1. the last JSON line is the {"metric":"summary"} line,
#   2. that summary sits inside the final 2000 chars (the driver's window),
#   3. the flood did NOT leak (ERROR level silences it),
#   4. the sidecar BENCH_LOCAL.json exists and its 2nd line is the summary.
set -euo pipefail
cd "$(dirname "$0")/.."
out=$(mktemp)
trap 'rm -f "$out"' EXIT
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_REPS=1 \
SPARK_GRAFT_BENCH_WARNFLOOD=1 \
sbt --batch "runMain graft.Bench" >"$out" 2>&1 || { tail -5 "$out"; exit 1; }
last_json=$(grep -o '{"metric":"[a-z]*".*}' "$out" | tail -1)
case "$last_json" in
  '{"metric":"summary"'*) ;;
  *) echo "FAIL: last JSON line is not the summary: ${last_json:0:100}"; exit 1;;
esac
if ! tail -c 2000 "$out" | grep -q '"metric":"summary"'; then
  echo "FAIL: summary not inside the final 2000-char tail"
  tail -c 2000 "$out"
  exit 1
fi
if grep -q 'synthetic teardown warn' "$out"; then
  echo "FAIL: WARN flood leaked through ERROR level"; exit 1
fi
if ! sed -n '2p' BENCH_LOCAL.json | grep -q '"metric":"summary"'; then
  echo "FAIL: sidecar BENCH_LOCAL.json missing or malformed"; exit 1
fi
echo "OK: summary survives the forced WARN flood" \
  "($(wc -c <"$out") chars of combined output; sidecar present)"
