#!/bin/bash
# Gate-fragility smoke (VERDICT r10 item #1): a Verify run killed at ANY
# point must still leave a valid oracle_sql.json that check.py can load,
# so a driver-side time budget yields a partial correctness score instead
# of `{}`. Starts Verify, SIGKILLs the JVM a few seconds after the oracle
# file first appears (i.e. mid-dump-sweep), then asserts the file parses
# and carries the full static oracle map.
set -u
SF_DIR=${1:-/root/testdata/sf0.001}
OUT=$(mktemp -d)
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Verify $SF_DIR $OUT" > "$OUT/log" 2>&1 &
SBT_PID=$!
# wait for the pre-sweep oracle write (appears before any query dump)
for i in $(seq 1 120); do
  [ -f "$OUT/oracle_sql.json" ] && break
  sleep 2
done
if [ ! -f "$OUT/oracle_sql.json" ]; then
  echo "FAIL: oracle_sql.json not written within 240s"; kill -9 $SBT_PID; exit 1
fi
sleep 5  # let a few dumps land, then kill mid-sweep
pkill -9 -f "graft.Verify $SF_DIR $OUT"
kill -9 $SBT_PID 2>/dev/null
wait $SBT_PID 2>/dev/null
python3 - "$OUT" <<'EOF'
import json, sys, os
out = sys.argv[1]
d = json.load(open(os.path.join(out, "oracle_sql.json")))
dumps = [f for f in os.listdir(out) if not f.startswith("oracle_sql") and f != "log"]
assert len(d) >= 200, f"oracle map too small after kill: {len(d)}"
print(f"OK: oracle_sql.json valid with {len(d)} entries, {len(dumps)} partial dumps survive the kill")
EOF
STATUS=$?
rm -rf "$OUT"
exit $STATUS
