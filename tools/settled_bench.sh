#!/bin/bash
# Settled-state bench discipline (VERDICT r09 item 5 / r10 item 6 /
# r15 item 7): run graft.Bench TWICE back-to-back after an idle window
# and accept only when the two totals agree within 5% — interleave
# noise on sub-3s queries (the r07/r08 bisect band) then stops
# consuming verdict attention. Each run appends its own line to
# BENCH_detail_history.jsonl, so the settled pair is a durable
# artifact, not a claim.
#
# This script is the ONLY writer of the round artifact
# BENCH_detail_r{N}.json (N = max committed BENCH_r*.json + 1): on a
# passing pair it records the better run's detail line, and it REFUSES
# to record a run with settled=false or errors — so a driver-side or
# manual unsettled invocation can never clobber the round record
# (Bench itself no longer writes round-suffixed files).
#
# Usage: tools/settled_bench.sh  (env: SPARK_GRAFT_SF_DIR,
#        SPARK_GRAFT_CPUS, SETTLE_IDLE seconds before the first run)
set -e
cd "$(dirname "$0")/.."
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
CPUS=${SPARK_GRAFT_CPUS:-32}
sleep "${SETTLE_IDLE:-30}"
run() {
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
    sbt -batch 'runMain graft.Bench' 2>/dev/null | grep '"metric"' | tail -1
}
L1=$(run)
D1=$(cat BENCH_detail.json)
L2=$(run)
D2=$(cat BENCH_detail.json)
python3 - "$L1" "$L2" "$D1" "$D2" <<'EOF'
import json, sys, glob, re
a, b = (json.loads(x) for x in sys.argv[1:3])
da, db = (json.loads(x) for x in sys.argv[3:5])
va, vb = a["value"], b["value"]
drift = abs(va - vb) / max(va, vb)
print(f"run1={va}s run2={vb}s drift={drift:.1%} (gate: 5%)")
print(f"nerr: run1={a['nerr']} run2={b['nerr']} settled: run1={a['settled']} run2={b['settled']}")
ok = drift <= 0.05 and a["nerr"] == 0 and b["nerr"] == 0
if ok:
    # record the better run of the confirmed pair; refuse anything
    # unsettled or erroring (the round artifact must never regress)
    best = da if da["value"] <= db["value"] else db
    if not best.get("settled") or best.get("errors"):
        print("REFUSED: best run of the pair is unsettled or has errors; round artifact not written")
        sys.exit(1)
    rounds = [int(m.group(1)) for f in glob.glob("BENCH_r*.json")
              for m in [re.fullmatch(r"BENCH_r(\d+)\.json", f)] if m]
    rn = (max(rounds) + 1) if rounds else 0
    path = f"BENCH_detail_r{rn:02d}.json"
    with open(path, "w") as f:
        json.dump(best, f, separators=(",", ":"))
        f.write("\n")
    print(f"recorded {path}: total={best['value']}s settled=true (pair-confirmed, drift {drift:.1%})")
sys.exit(0 if ok else 1)
EOF
