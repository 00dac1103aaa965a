#!/bin/bash
# Round-closing sequence as a CHECKED tool (VERDICT r11 item #2: round 11
# skipped the closing artifacts and the judge could not exonerate four
# bench outliers). Runs every closing step, asserts each artifact is
# present, fresh, and consistent with HEAD, and fails loudly on the
# first hole — so a driver cutoff can't silently skip it.
#
# Usage: tools/closing.sh <round-number> [sf001-dir] [sf01-dir]
# Produces / refreshes, in order:
#   1. full `sbt test`                  (must be 0 failures)
#   2. full Verify + check.py at sf0.01 (must be 0 FAIL rows) and the
#      committed per-query mirror CORRECTNESS_local_r<N>.json
#   3. PLANS.md via graft.Explain       (plan count == query count)
#   4. bench_full_r<N>.json at sf0.1    (valid JSON with per-query secs)
#   5. README round-state check         (must mention "round <N>")
# Leaves the artifacts in the working tree; the caller commits.
set -u
ROUND=${1:?usage: tools/closing.sh <round-number>}
SF001=${2:-/root/testdata/sf0.01}
SF01=${3:-/root/testdata/sf0.1}
cd "$(dirname "$0")/.."
FAIL=0
step() { echo "== closing[$ROUND] $*"; }

step "1/5 full sbt test"
sbt -batch test > /tmp/closing_test.log 2>&1
if grep -q "All tests passed" /tmp/closing_test.log; then
  grep -E "^\[info\] (Tests:|Suites:)" /tmp/closing_test.log | tail -2
else
  echo "FAIL: sbt test (tail of log):"; tail -20 /tmp/closing_test.log; FAIL=1
fi

step "2/5 full Verify + check at $SF001"
VOUT=$(mktemp -d)
sbt -batch "runMain graft.Verify $SF001 $VOUT" > /tmp/closing_verify.log 2>&1
# committed per-query mirror in the DRIVER's field format (VERDICT r15
# item #2c): check.py writes {rows_match, schema_match, hash_match,
# rows} per query, so when the driver's own artifact is empty or lost
# the mirror is format-compatible with what it mirrors
python3 tools/check.py "$SF001" "$VOUT" "CORRECTNESS_local_r${ROUND}.json" \
  > /tmp/closing_check.log 2>&1
NOK=$(grep -c "^ok " /tmp/closing_check.log || true)
NFAIL=$(grep -c "^FAIL" /tmp/closing_check.log || true)
echo "check.py: $NOK ok, $NFAIL FAIL"
if [ "$NFAIL" != "0" ] || [ "$NOK" -lt 200 ]; then
  echo "FAIL: correctness gate:"; grep "^FAIL" /tmp/closing_check.log | head -20; FAIL=1
fi
if [ ! -s "CORRECTNESS_local_r${ROUND}.json" ]; then
  echo "FAIL: CORRECTNESS_local_r${ROUND}.json missing/empty"; FAIL=1
fi
# the heartbeat (VERDICT r15 item #2a): Verify appends one timestamped
# event per phase/fixture/dump — commit it so a future zeroed driver
# artifact is diagnosable from the repo alone
if grep -q '"status":"done"' "$VOUT/verify_progress.json" 2>/dev/null; then
  cp "$VOUT/verify_progress.json" "verify_progress_r${ROUND}.json"
  echo "heartbeat: $(wc -l < verify_progress_r${ROUND}.json) events mirrored"
else
  echo "FAIL: verify_progress.json missing its terminal event"; FAIL=1
fi
rm -rf "$VOUT"

step "3/5 regenerate PLANS.md"
sbt -batch "runMain graft.Explain $SF001 PLANS.md" > /tmp/closing_explain.log 2>&1
NPLANS=$(grep -c "^## " PLANS.md || true)
echo "PLANS.md: $NPLANS plans"
if [ "$NPLANS" -lt "$NOK" ]; then
  echo "FAIL: PLANS.md has $NPLANS plans but the gate ran $NOK queries"; FAIL=1
fi

step "4/5 full bench at $SF01 -> bench_full_r${ROUND}.json"
SPARK_GRAFT_SF_DIR=$SF01 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/closing_bench.log 2>&1
grep '"metric"' /tmp/closing_bench.log | head -1 \
  | sed 's/^\[info\] //' > "bench_full_r${ROUND}.json"
python3 - "bench_full_r${ROUND}.json" <<'EOF' || FAIL=1
import json, sys
d = json.load(open(sys.argv[1]))
assert "queries" in d and len(d["queries"]) >= 200, f"bench has {len(d.get('queries', {}))} queries"
print(f"bench_full: {len(d['queries'])} queries, total {d['value']} {d['unit']}")
EOF

step "5/5 README round state"
if ! grep -qi "round ${ROUND}" README.md; then
  echo "FAIL: README.md has no 'round ${ROUND}' closing state — write it before committing"; FAIL=1
fi

if [ "$FAIL" = "0" ]; then
  echo "== closing[$ROUND] COMPLETE — commit PLANS.md, bench_full_r${ROUND}.json, README.md"
else
  echo "== closing[$ROUND] INCOMPLETE — fix the FAIL lines above"; exit 1
fi
