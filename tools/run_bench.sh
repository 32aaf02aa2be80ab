#!/bin/bash
# Clean bench run against the ALREADY-COMPILED classes (no sbt lock, no
# recompile race with a concurrent dev loop):
#   tools/run_bench.sh <out.json> [sfdir] [cpus]
# Java 17 module opens mirror Spark's own launcher defaults.
set -euo pipefail
OUT="${1:?usage: run_bench.sh <out.json> [sfdir] [cpus]}"
SF="${2:-/root/testdata/sf0.1}"
CPUS="${3:-32}"
cd "$(dirname "$0")/.."
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_BENCH_OUT="$OUT" \
exec java \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Xmx96g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
