#!/usr/bin/env bash
# Round-15 measurement campaign — strictly sequential (timed sessions
# never overlap). Logs per phase under /tmp/r15_*.log.
set -uo pipefail
cd /root/repo

JAVA_OPTS="--add-opens=java.base/java.lang=ALL-UNNAMED \
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
--add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED \
--add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
--add-opens=java.security.jgss/sun.security.krb5=ALL-UNNAMED"
run() { java -cp "target/scala-2.13/classes:/opt/spark/jars/*" $JAVA_OPTS "$@"; }
SF1=/root/testdata/sf0.1
ROOT=/tmp/graft_scale

echo "=== P0 compose corpora $(date +%T) ==="
SPARK_GRAFT_CPUS=32 run graft.StressScale $SF1 $ROOT 10 --compose-only \
  > /tmp/r15_compose.log 2>&1
SPARK_GRAFT_CPUS=32 run graft.StressScale $SF1 $ROOT 30 --compose-only \
  >> /tmp/r15_compose.log 2>&1
SPARK_GRAFT_CPUS=32 run graft.StressScale $SF1 $ROOT 100 --compose-only \
  >> /tmp/r15_compose.log 2>&1
grep "\[compose\]" /tmp/r15_compose.log

echo "=== P1 1x pool, 4 sessions $(date +%T) ==="
bash tools/bench_pool.sh 4 $SF1 bench_runs bench_out.json \
  > /tmp/r15_pool1x.log 2>&1
echo "P1 rc=$?"

echo "=== P2 A/B exclude sessions, 2 $(date +%T) ==="
for i in 1 2; do
  SPARK_GRAFT_SF_DIR=$SF1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_RUNS=/tmp/ab_runs SPARK_GRAFT_BENCH_OUT=/tmp/ab_out.json \
  SPARK_GRAFT_BENCH_EXCLUDE=sim_ann_lsh_search_filtered_auto_mid \
  run graft.Bench > /dev/null 2>>/tmp/r15_ab.log
  echo "A/B session $i done $(date +%T)"
done

echo "=== P3 frontier filtered x100 $(date +%T) ==="
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_FRONTIER_OUT=/tmp/frontier_r15_filtered_x100.json \
  run graft.Frontier $SF1 $ROOT --filtered-only 100 \
  > /tmp/r15_frontier.log 2>&1
echo "P3 rc=$?"; tail -c 300 /tmp/frontier_r15_filtered_x100.json 2>/dev/null; echo

echo "=== P4 10x pool, 3 sessions $(date +%T) ==="
bash tools/bench_pool.sh 3 $ROOT/bench_x10 bench_runs_x10 bench_out_x10.json \
  $SF1 > /tmp/r15_pool10x.log 2>&1
echo "P4 rc=$?"

echo "=== P5 30x session $(date +%T) ==="
bash tools/bench_pool.sh 1 $ROOT/bench_x30 bench_runs_x30 bench_out_x30.json \
  $SF1 > /tmp/r15_pool30x.log 2>&1
echo "P5 rc=$?"

echo "=== P6 profile delta 1x/10x $(date +%T) ==="
SPARK_GRAFT_CPUS=32 run graft.Profile $SF1 $ROOT/bench_x10 \
  > /tmp/r15_profile.log 2>&1
echo "P6 rc=$?"
grep "PROFILE.*summary" /tmp/r15_profile.log

echo "=== campaign done $(date +%T) ==="
