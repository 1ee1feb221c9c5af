#!/usr/bin/env bash
# Pin Bench's tail-hardening (r6 postmortem: BENCH_r06.json parsed:null
# because teardown WARN spam evicted the stdout summary from the driver's
# 2000-char combined-stream tail).
#
# Runs Bench at sf0.001 with a FORCED 500-WARN teardown flood
# (SPARK_GRAFT_BENCH_WARNFLOOD) and asserts, on the combined
# stdout+stderr stream:
#   1. the last JSON line is the compact {"metric":"total"} line, it
#      json-parses cleanly, and it carries NO per-query maps (r7
#      postmortem: the full total line's two 138-entry maps are ~8 KB and
#      can never fit the driver's 2000-char tail — the compact final line
#      is what the driver parses),
#   2. both the compact total and the summary sit inside the final 2000
#      chars (the driver's window),
#   3. the flood did NOT leak (ERROR level silences it),
#   4. the sidecar BENCH_LOCAL.json exists with full/summary/total lines.
set -euo pipefail
cd "$(dirname "$0")/.."
out=$(mktemp)
trap 'rm -f "$out"' EXIT
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_REPS=1 \
SPARK_GRAFT_BENCH_WARNFLOOD=1 \
sbt --batch "runMain graft.Bench" >"$out" 2>&1 || { tail -5 "$out"; exit 1; }
# r8 postmortem: the broken layer was never Bench's ordering — sbt's run
# logger prefixed every stdout line with "[info] " and appended
# "[success] Total time: …" as the true last line, so a driver that
# json.loads-es the RAW last line failed three rounds running. build.sbt
# now sets `run / outputStrategy := Some(StdoutOutput)` and
# `Global / showSuccess := false`; assert the RAW stream here, exactly as
# the driver sees it: the last non-empty line must json-parse to
# metric=="total", with no sbt decoration anywhere near the tail.
raw_last=$(grep -v '^[[:space:]]*$' "$out" | tail -1)
printf '%s' "$raw_last" | python3 -c '
import json, sys
s = sys.stdin.read()
d = json.loads(s)
assert d["metric"] == "total", d
' || { echo "FAIL: RAW last line of combined stream is not the parseable compact total: ${raw_last:0:200}"; exit 1; }
if grep -q '^\[success\]' "$out"; then
  echo "FAIL: sbt [success] epilogue present (showSuccess leak)"; exit 1
fi
if grep -q '^\[info\] {"metric"' "$out"; then
  echo "FAIL: sbt [info] prefix decorates the JSON lines (outputStrategy leak)"; exit 1
fi
last_json=$(grep -o '{"metric":"[a-z]*".*}' "$out" | tail -1)
case "$last_json" in
  '{"metric":"total"'*) ;;
  *) echo "FAIL: last JSON line is not the compact total: ${last_json:0:100}"; exit 1;;
esac
# The compact total must json-parse, carry the scoring fields, have NO
# per-query maps, and be small enough to always survive any tail window.
printf '%s' "$last_json" | python3 -c '
import json, sys
s = sys.stdin.read()
d = json.loads(s)
assert d["metric"] == "total", d
assert isinstance(d["value"], (int, float)), d
assert d["unit"] == "sec", d
assert "queries" not in d and "queries_min" not in d, "per-query maps leaked into the compact line"
assert len(s) < 1000, f"compact total line too long: {len(s)} chars"
' || { echo "FAIL: compact total line malformed: ${last_json:0:200}"; exit 1; }
if ! tail -c 2000 "$out" | grep -q '"metric":"total"'; then
  echo "FAIL: compact total not inside the final 2000-char tail"
  tail -c 2000 "$out"
  exit 1
fi
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
if ! sed -n '3p' BENCH_LOCAL.json | grep -q '{"metric":"total"'; then
  echo "FAIL: sidecar BENCH_LOCAL.json missing the compact total line"; exit 1
fi
# r11 verdict item 3: every BENCH_HISTORY append must carry the
# provenance stamp {ts, commit, round, src, protocol} ahead of the
# full per-query maps — positional-only attribution silently shifts
# round-over-round diffs after one stray append.
tail -1 BENCH_HISTORY.jsonl | python3 -c '
import json, sys
d = json.loads(sys.stdin.read())
for k in ("ts", "commit", "round", "src", "protocol"):
    assert k in d, f"history line missing stamp field {k}"
assert d["protocol"].startswith("pass-major-median"), d["protocol"]
assert d["ts"], "ts must be non-null on a fresh append"
assert "queries" in d and "queries_min" in d, "full maps missing"
' || { echo "FAIL: BENCH_HISTORY last line lacks the provenance stamp"; exit 1; }
echo "OK: BENCH_HISTORY append carries the provenance stamp"
echo "OK: compact total + summary survive the forced WARN flood" \
  "($(wc -c <"$out") chars of combined output; sidecar present)"
