#!/bin/bash
# Multi-JVM execution leg (r12 verdict #1): run a graft main under
# local-cluster[2,2,2048] — an in-process standalone master + 2 workers
# that spawn REAL separate executor JVMs, so closure serialization,
# broadcast shipping, task-result transport and the custom
# TypedImperativeAggregates/AsOfJoinExec cross a process boundary the
# local[N] harness never exercises.
#
# Usage: scripts/localcluster-run.sh graft.Verify /root/testdata/sf0.01 /tmp/out
#        SPARK_GRAFT_SF_DIR=... scripts/localcluster-run.sh graft.Bench
# Env: SPARK_GRAFT_MASTER overrides the topology (default local-cluster[2,2,2048]).
set -euo pipefail
cd "$(dirname "$0")/.."
# Workers build the executor classpath from SPARK_HOME/jars; executors get
# the library classes via spark.executor.extraClassPath (GraftSession).
export SPARK_HOME=/opt/spark
# normally set by bin/load-spark-env.sh, which the direct-java launch skips;
# the executor launcher's getScalaVersion() fails without it
export SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER="${SPARK_GRAFT_MASTER:-local-cluster[2,2,2048]}"
# 2 workers x 2 cores: shuffle partitions / AQE initial sized to the real
# core count, not the 32-thread local default
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-4}"
exec scripts/run-main.sh "$@"
