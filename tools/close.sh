#!/usr/bin/env bash
# Scripted round-close ritual (r11 verdict item 5). Before this existed
# the close evidence — closing bench, five-audit battery at both SFs,
# conf-parity arms, triple-SF sweep — was hand-sequenced each round, and
# the ~hours of sweep/test JVMs degrade the host BEFORE the most
# timing-sensitive step if the bench runs last (the r10/r11 closes both
# landed at the wide end of the quiet envelope for exactly this reason;
# the r11 driver bench found quiet only because it ran in a fresh window).
#
# Ordering is therefore MOST-CONTENTION-SENSITIVE FIRST:
#   1. closing bench      — wall-clock timing; wants the freshest host.
#   2. five-audit battery — static plan walks at sf0.001 AND sf0.1 (plans
#                           may differ across SFs via stats); insensitive
#                           to host state, cheap.
#   3. conf-parity arms   — result-identity under 11 conf regimes at
#                           sf0.01; correctness, not timing.
#   4. triple-SF sweep    — full Verify + DuckDB oracle at all three
#                           clean SFs; the heaviest/degrading step, last.
#
# Each step appends one line to the summary; the script prints the
# summary block at the end and exits with the number of failed steps.
# Timing numbers from step 1 are trustworthy; any bench re-run AFTER
# steps 2-4 is not (jitter doctrine) — compare via BENCH_HISTORY mins.
#
# Usage: tools/close.sh [step ...]   steps: bench audits parity sweep
#   (default: all four, in the order above)
#   SPARK_GRAFT_CPUS sets parallelism for audits/parity/sweep (default 8;
#   the bench always runs at 32 — the protocol's fixed shape).
set -uo pipefail
cd "$(dirname "$0")/.."
steps=("$@")
[ ${#steps[@]} -eq 0 ] && steps=(bench audits parity sweep)
cpus="${SPARK_GRAFT_CPUS:-8}"
declare -a summary
fails=0

note() { summary+=("$1"); echo "CLOSE: $1"; }

run_bench() {
  local log; log=$(mktemp)
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_SRC=close \
    sbt --batch "runMain graft.Bench" >"$log" 2>&1
  local rc=$?
  local total
  total=$(grep -o '{"metric":"total".*}' "$log" | tail -1)
  if [ $rc -ne 0 ] || [ -z "$total" ]; then
    note "bench: FAILED (rc=$rc)"; tail -5 "$log"; fails=$((fails+1))
  else
    note "bench: $total"
    # watch criteria ride in the summary line; surface it too
    grep -o '"watch":{[^}]*}' "$log" | tail -1 | sed 's/^/CLOSE: bench /'
  fi
  rm -f "$log"
}

run_audits() {
  local sf tool log rc line
  for sf in /root/testdata/sf0.001 /root/testdata/sf0.1; do
    for tool in BroadcastAudit GenJoinAudit ScanAudit PruneAudit WindowAudit; do
      log=$(mktemp)
      SPARK_GRAFT_CPUS="$cpus" \
        sbt --batch "runMain graft.tools.$tool $sf" >"$log" 2>&1
      rc=$?
      line=$(grep -o '{"metric":"[a-z_]*audit".*}' "$log" | tail -1)
      if [ $rc -ne 0 ] || [ -z "$line" ]; then
        note "audit $tool @$sf: FAILED (rc=$rc)"; tail -5 "$log"
        fails=$((fails+1))
      else
        note "audit $tool @$sf: $line"
        # any HIT line is a finding even when the tool exits 0
        if grep -q '^HIT ' "$log"; then
          grep '^HIT ' "$log" | head -5 | sed 's/^/CLOSE:   /'
        fi
      fi
      rm -f "$log"
    done
  done
}

run_parity() {
  local log; log=$(mktemp)
  SPARK_GRAFT_CPUS="$cpus" \
    sbt --batch "runMain graft.tools.ConfParity /root/testdata/sf0.01" \
    >"$log" 2>&1
  local rc=$?
  local line
  line=$(grep -o '{"metric":"confparity".*}' "$log" | tail -1)
  if [ $rc -ne 0 ] || [ -z "$line" ]; then
    note "parity: FAILED (rc=$rc)"; tail -5 "$log"; fails=$((fails+1))
  else
    note "parity: $line"
  fi
  rm -f "$log"
}

run_sweep() {
  local log; log=$(mktemp)
  SPARK_GRAFT_CPUS="$cpus" tools/sweep.sh \
    /root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1 \
    >"$log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    note "sweep: $rc corpora with failures"; grep '^SWEEP' "$log"
    fails=$((fails+1))
  else
    note "sweep: $(grep '^SWEEP' "$log" | tr '\n' '; ')"
  fi
  rm -f "$log"
}

for s in "${steps[@]}"; do
  case "$s" in
    bench)  run_bench ;;
    audits) run_audits ;;
    parity) run_parity ;;
    sweep)  run_sweep ;;
    *) echo "unknown step: $s (want bench|audits|parity|sweep)"; exit 2 ;;
  esac
done

echo "== close summary =="
printf '%s\n' "${summary[@]}"
exit "$fails"
