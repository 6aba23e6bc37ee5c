#!/bin/bash
# Back-to-back full-suite bench runs at sf0.1 and sf1 under identical
# session conditions, for the SCALING.md per-query ratio table. Saves each
# run's full per-query breakdown to bench_history with an sf-tagged name.
set -uo pipefail
cd "$(dirname "$0")/.."
stamp=$(date -u +%Y%m%d-%H%M%S)
export SPARK_GRAFT_CPUS=32 SPARK_GRAFT_TRIALS=3
echo "[scaling-run] sf0.1 pass starting"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/run-main.sh graft.Bench \
  > "bench_history/scaling_${stamp}_sf0.1.log" 2>&1
cp target/bench_full.json "bench_history/scaling_${stamp}_sf0.1.json"
echo "[scaling-run] sf1 pass starting"
SPARK_GRAFT_SF_DIR="$PWD/testdata/sf1" scripts/run-main.sh graft.Bench \
  > "bench_history/scaling_${stamp}_sf1.log" 2>&1
cp target/bench_full.json "bench_history/scaling_${stamp}_sf1.json"
echo "[scaling-run] done: bench_history/scaling_${stamp}_{sf0.1,sf1}.json"
