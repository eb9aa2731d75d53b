#!/bin/bash
# Settled-state bench discipline (VERDICT r09 item 5 / r10 item 6):
# run graft.Bench TWICE back-to-back after an idle window and accept
# only when the two totals agree within 5% — interleave noise on
# sub-3s queries (the r07/r08 bisect band) then stops consuming
# verdict attention. Each run appends its own line to
# BENCH_detail_history.jsonl, so the settled pair is a durable
# artifact, not a claim.
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
L2=$(run)
python3 - "$L1" "$L2" <<'EOF'
import json, sys
a, b = (json.loads(x) for x in sys.argv[1:3])
va, vb = a["value"], b["value"]
drift = abs(va - vb) / max(va, vb)
print(f"run1={va}s run2={vb}s drift={drift:.1%} (gate: 5%)")
print(f"nerr: run1={a['nerr']} run2={b['nerr']}")
sys.exit(0 if drift <= 0.05 and a["nerr"] == 0 and b["nerr"] == 0 else 1)
EOF
