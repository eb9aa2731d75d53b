#!/bin/bash
# Three-scale correctness sweep (VERDICT r11 item 7's discipline, made
# one command): run graft.Verify + tools/selfcheck.py at sf0.001,
# sf0.01 and sf0.1 — in that order, so the LAST selfcheck leaves
# ORACLE_TIMING.json holding the sf0.1 numbers (the headline artifact
# the bench gate is judged against). Every oracle-checkable query must
# be EXACT at every scale; any FAIL exits non-zero immediately.
#
# Usage: tools/sweep.sh   (env: SPARK_GRAFT_CPUS, default 8)
# NB: the sf0.1 DuckDB pass is the slow half (~37 min since r15 —
# brute-force oracle shapes q27/q27b/q40/q83 are ~8 min EACH); run
# under nohup for rounds.
set -e -o pipefail
cd "$(dirname "$0")/.."
CPUS=${SPARK_GRAFT_CPUS:-8}
for sf in 0.001 0.01 0.1; do
  out=/tmp/graft_sweep_sf$sf
  rm -rf "$out"
  echo "=== sf$sf: Verify ==="
  # capture, then grep WITHOUT gating the exit status on matches:
  # no [verify] lines is the success case, but an sbt/Verify crash
  # must still fail the sweep (set -e on the sbt run itself)
  SPARK_GRAFT_CPUS=$CPUS sbt -batch \
    "runMain graft.Verify /root/testdata/sf$sf $out" \
    > "/tmp/graft_sweep_verify_sf$sf.log" 2>&1
  grep -E '\[verify\]' "/tmp/graft_sweep_verify_sf$sf.log" || true
  echo "=== sf$sf: selfcheck ==="
  # pipefail makes a selfcheck FAIL (sys.exit(1)) kill the sweep even
  # through the tail
  python3 tools/selfcheck.py "/root/testdata/sf$sf" "$out" | tail -3
done
echo "sweep complete: ORACLE_TIMING.json now holds the sf0.1 pass"
