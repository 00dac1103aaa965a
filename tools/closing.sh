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
python3 tools/check.py "$SF001" "$VOUT" > /tmp/closing_check.log 2>&1
NOK=$(grep -c "^ok " /tmp/closing_check.log || true)
NFAIL=$(grep -c "^FAIL" /tmp/closing_check.log || true)
echo "check.py: $NOK ok, $NFAIL FAIL"
if [ "$NFAIL" != "0" ] || [ "$NOK" -lt 200 ]; then
  echo "FAIL: correctness gate:"; grep "^FAIL" /tmp/closing_check.log | head -20; FAIL=1
fi
# committed per-query mirror (VERDICT r12 item #3 / r13 item #5): the
# local gate's row counts and ok/FAIL per query, so the judge can audit
# correctness even when the driver's own artifact is empty or lost
python3 - "$ROUND" <<'EOF' || FAIL=1
import json, re, sys
rows = {}
for line in open("/tmp/closing_check.log"):
    m = re.match(r"^(ok|FAIL)\s+(\S+)\s*(?:\((\d+) rows\))?", line)
    if m:
        rows[m.group(2).rstrip(":")] = {
            "ok": m.group(1) == "ok",
            "rows": int(m.group(3)) if m.group(3) else None}
assert rows, "no check.py rows parsed"
out = f"CORRECTNESS_local_r{sys.argv[1]}.json"
json.dump({"sf": "sf0.01", "queries": rows,
           "n_ok": sum(1 for v in rows.values() if v["ok"]),
           "n_fail": sum(1 for v in rows.values() if not v["ok"])},
          open(out, "w"), indent=0, sort_keys=True)
print(f"{out}: {len(rows)} queries mirrored")
EOF
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
