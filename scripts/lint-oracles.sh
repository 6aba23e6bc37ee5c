#!/bin/bash
# Pre-snapshot oracle type lint: dump oracle_sql.json WITHOUT executing
# any query (SPARK_GRAFT_SQL_ONLY=1), then DESCRIBE-bind every oracle in
# DuckDB and fail on the driver-gate poison classes (HUGEINT promotion,
# array/struct output cells). Seconds, not minutes — run it before any
# round snapshot so the class can't reach the driver gate at all.
set -euo pipefail
cd "$(dirname "$0")/.."
out=$(mktemp -d /tmp/oracle-lint-XXXX)
SPARK_GRAFT_SQL_ONLY=1 SPARK_GRAFT_CPUS=2 scripts/run-main.sh graft.Verify \
  /root/testdata/sf0.001 "$out" > "$out/verify.log" 2>&1
python3 scripts/lint_oracles.py "$out" /root/testdata/sf0.001
