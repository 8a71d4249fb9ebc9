#!/usr/bin/env bash
# Full-catalog differential gate at any scale factor — the committed record
# for passes above the driver's own sf0.01 run (VERDICT r14 #2):
#
#   scripts/gate.sh /root/testdata/sf0.1 /tmp/verify_sf01 CORRECTNESS_SF01.json
#
# Runs graft.Verify (every SparkEntry.queries entry -> parquet + the oracle
# dump), then scripts/check.py's three-way DuckDB differential, and writes
# the CORRECTNESS-style JSON artifact with both wall times recorded.
set -euo pipefail
SF_DIR=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/verify_gate}
ART=${3:-CORRECTNESS_SF01.json}
cd "$(dirname "$0")/.."

CP=$(sbt -batch "export runtime:fullClasspath" 2>/dev/null | tail -1)
t0=$(date +%s)
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-28}" \
  java -Xmx96g -cp "$CP" graft.Verify "$SF_DIR" "$OUT"
t1=$(date +%s)
echo "graft.Verify wall: $((t1 - t0)) s"

GRAFT_VERIFY_WALL_SEC=$((t1 - t0)) \
  python3 scripts/check.py "$SF_DIR" "$OUT" --json "$ART"
