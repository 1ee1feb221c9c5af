#!/usr/bin/env bash
# Pin Verify's capped diagnostic line (r7 verdict item 2): in a
# catastrophic round where EVERY query fails, the final
# {"metric":"verify"} line must still fit the driver's 2000-char tail —
# so the failure list is capped at 20 names and the full count rides in
# "err". This forces the worst case by pointing Verify at a nonexistent
# sf directory (every query throws at scan time) and asserts:
#   1. the final JSON line parses, metric == "verify",
#   2. err == the full declared surface, ok == 0,
#   3. the "failed" sample is capped at 20 names,
#   4. the whole line is < 1000 chars.
set -euo pipefail
cd "$(dirname "$0")/.."
out=$(mktemp); dump=$(mktemp -d)
trap 'rm -rf "$out" "$dump"' EXIT
SPARK_GRAFT_CPUS=8 \
sbt --batch "runMain graft.Verify /root/testdata/NO_SUCH_SF $dump" \
  >"$out" 2>&1 || { tail -5 "$out"; exit 1; }
last_json=$(grep -o '{"metric":"verify".*}' "$out" | tail -1)
printf '%s' "$last_json" | python3 -c '
import json, sys
s = sys.stdin.read()
d = json.loads(s)
assert d["metric"] == "verify", d
assert d["ok"] == 0, d
err = d["err"]; nfailed = len(d["failed"])
assert err >= 100, f"expected the full surface to fail, got {err}"
assert nfailed <= 20, f"failed sample not capped: {nfailed}"
assert len(s) < 1000, f"verify line too long: {len(s)} chars"
' || { echo "FAIL: verify line malformed/uncapped: ${last_json:0:200}"; exit 1; }
if ! tail -c 2000 "$out" | grep -q '"metric":"verify"'; then
  echo "FAIL: verify line not inside the final 2000-char tail"; exit 1
fi
echo "OK: all-fail verify line stays capped and inside the tail" \
  "(${#last_json} chars)"
