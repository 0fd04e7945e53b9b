#!/usr/bin/env bash
# Full local gate, one command: compile + unit/property tests + DuckDB
# oracle correctness at sf0.01 + bench at sf0.1. Mirrors what the
# round driver checks. Override SF01/SF1/SPARK_GRAFT_CPUS as needed.
set -euo pipefail
cd "$(dirname "$0")/.."

SF01=${SF01:-/root/testdata/sf0.01}
SF1=${SF1:-/root/testdata/sf0.1}

sbt -batch compile test

rm -rf target/verify_out
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify $SF01 target/verify_out"
python3 tools/check_oracle.py "$SF01" target/verify_out

SPARK_GRAFT_SF_DIR=$SF1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' \
  | tee target/bench_last.json
python3 tools/bench_duck.py "$SF1" target/verify_out target/bench_last.json
