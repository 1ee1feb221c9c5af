#!/usr/bin/env python3
"""Grown-gate expected-diff classifier (extracted from close.sh in r15 so
it is single-sourced and negative-control testable — `--selftest` below).

Input: a tools/check.py log on stdin or as argv[1]. Output: one line of
space-separated `<query>=<class>` labels for queries whose EVERY FAIL
cell matches a known engine-defined diff class. A query with any
unparseable, capped, or out-of-signature cell gets NO label — close.sh
then fails the gate on it. Classes (evidence in BASELINE r12/r14):

- fp-percentile-tie (q_winsorize ONLY, signature-matched since r15 —
  the r14 gate accepted ANY q_winsorize failure by name, so a genuine
  logic regression there would have been mislabeled): Spark's
  `percentile` computes lo + g*(hi-lo) while DuckDB's `quantile_cont`
  computes (1-g)*lo + g*hi — a few ULP apart on a massive tie block
  sitting exactly at a percentile position, flipping `value < cut` for
  the block. Signature: every cell is either
    * col=n_clipped, integer-valued both sides, delta small in both
      absolute (<= 1024; the x8 block was 40 rows, x16 was 80) and
      relative (<= 1%) terms, or
    * col=mean_wins, |delta| <= 2e-6 (one r6 rounding step — the
      differently-clipped block shifts the winsorized mean by at most
      ULPs, visible only as a last-digit r6 flip).
  Any other column (event_type, n, p05, p95, mean_raw) differing is a
  real bug: those are clip-independent and r6-stable across the tie.

- r2-cent-boundary (any query): EVERY cell is a one-cent diff on an
  r2-rounded double aggregate — accumulation-order spread (~hundreds
  of ULPs over grown-volume sums) straddling a half-cent boundary
  (BASELINE r14: q_join_broadcast at x16, raw sums 19596053185.7842
  duck vs >= .785 spark). Unreachable at declared SFs; a logic bug
  cannot hide here because any non-rounding diff breaks the all-cells
  condition — which is REAL since r15: check.py emits every mismatched
  cell (up to its cap), and a capped NOTE line voids classification.
"""
import math
import re
import sys

CELL = re.compile(
    r"col=([A-Za-z0-9_]+) row=\d+ spark=(-?[0-9.eE+]+) duck=(-?[0-9.eE+]+)\s*$")
CAPPED = re.compile(r"^NOTE (\S+): \d+\+ mismatched")


def one_cent(s, d):
    # one cent, up to a few ULPs of the operands' magnitude (the
    # subtraction itself is inexact at e10-scale sums)
    tol = max(1e-9, 32 * math.ulp(max(abs(s), abs(d))))
    return abs(abs(s - d) - 0.01) <= tol


def winsorize_tie_cell(col, s, d):
    if col == "n_clipped":
        return (s == int(s) and d == int(d) and s != d
                and abs(s - d) <= 1024
                and abs(s - d) <= 0.01 * max(abs(s), abs(d)))
    if col == "mean_wins":
        return abs(s - d) <= 2e-6 + 1e-12
    return False


def classify(lines):
    cells = {}   # query -> list of (col, s, d) | None for unparseable
    voided = set()
    for l in lines:
        m = CAPPED.match(l)
        if m:
            voided.add(m.group(1).rstrip(":"))
            continue
        if not l.startswith("FAIL"):
            continue
        q = l.split()[1].rstrip(":")
        cs = cells.setdefault(q, [])
        m = CELL.search(l)
        if not m:
            cs.append(None)
            continue
        try:
            cs.append((m.group(1), float(m.group(2)), float(m.group(3))))
        except ValueError:
            cs.append(None)
    out = []
    for q, cs in cells.items():
        if q in voided or not cs or any(c is None for c in cs):
            continue
        if q == "q_winsorize":
            if all(winsorize_tie_cell(*c) for c in cs):
                out.append(q + "=fp-percentile-tie")
        elif all(one_cent(s, d) for _, s, d in cs):
            out.append(q + "=r2-cent-boundary")
    return sorted(out)


def selftest():
    def c(*lines):
        return classify(list(lines))
    # the standing x8/x16 winsorize shape classifies
    assert c("FAIL q_winsorize: col=n_clipped row=3 spark=31632 duck=31712",
             "NOTE q_winsorize: 1 mismatched cells (all 1 shown)") == \
        ["q_winsorize=fp-percentile-tie"]
    # an r6 last-digit mean_wins flip rides along
    assert c("FAIL q_winsorize: col=n_clipped row=3 spark=31632 duck=31712",
             "FAIL q_winsorize: col=mean_wins row=3 spark=49.731183 duck=49.731184") == \
        ["q_winsorize=fp-percentile-tie"]
    # NEGATIVE CONTROLS (r14 verdict item 3): any q_winsorize failure
    # OUTSIDE the tie signature classifies as NOTHING
    assert c("FAIL q_winsorize: rows spark=8 duck=9") == []           # row count
    assert c("FAIL q_winsorize: exec error: boom") == []              # crash
    assert c("FAIL q_winsorize: col=n row=0 spark=100 duck=200") == []  # wrong col
    assert c("FAIL q_winsorize: col=n_clipped row=0 spark=100 duck=4000") == []  # huge delta
    assert c("FAIL q_winsorize: col=mean_raw row=0 spark=1.0 duck=1.000001") == []  # raw mean
    assert c(  # one in-signature cell does NOT excuse an out-of-signature one
        "FAIL q_winsorize: col=n_clipped row=3 spark=31632 duck=31712",
        "FAIL q_winsorize: col=p05 row=3 spark=1.5 duck=2.5") == []
    # the x16 cent-boundary shape classifies
    assert c("FAIL q_join_broadcast: col=brand_revenue row=1 "
             "spark=19596053185.79 duck=19596053185.78") == \
        ["q_join_broadcast=r2-cent-boundary"]
    # mixed cent + non-cent classifies as NOTHING (the r13 ADVICE hazard:
    # with single-cell emission this second line never existed)
    assert c("FAIL q_join_broadcast: col=brand_revenue row=1 spark=10.01 duck=10.00",
             "FAIL q_join_broadcast: col=n row=1 spark=5 duck=6") == []
    # a capped NOTE voids classification even if every shown cell matches
    assert c("FAIL q_x: col=rev row=0 spark=10.01 duck=10.00",
             "NOTE q_x: 64+ mismatched cells (capped at 64 shown)") == []
    # two queries classify independently
    assert sorted(c(
        "FAIL q_winsorize: col=n_clipped row=3 spark=3163 duck=3171",
        "FAIL q_join_broadcast: col=rev row=1 spark=10.01 duck=10.00")) == \
        ["q_join_broadcast=r2-cent-boundary", "q_winsorize=fp-percentile-tie"]
    # q_winsorize never falls through to the cent class
    assert c("FAIL q_winsorize: col=mean_wins row=0 spark=10.01 duck=10.00") == []
    print("selftest OK")


if __name__ == "__main__":
    if "--selftest" in sys.argv:
        selftest()
        sys.exit(0)
    src = open(sys.argv[1]) if len(sys.argv) > 1 else sys.stdin
    print(" ".join(classify(src)))
