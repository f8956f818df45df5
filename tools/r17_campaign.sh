#!/usr/bin/env bash
# Round-17 measurement campaign — strictly sequential (timed sessions
# never overlap). Logs per phase under /tmp/r17_*.log.
#
# One phase: the round's registry is UNCHANGED (no new oracle rows —
# round-16 ask 7), so nothing later in the campaign can re-key the
# fingerprint and orphan the pools. Order: re-key the 1x headline
# first (the judge's primary artifact), then the 10x and 30x pools
# with their trend gates (the 30x gate is round-16 ask 6 — run like
# the 10x one), then the semantic pair-stage ladder to 100x (ask 5's
# crossing placement; measurement-only main, fingerprint-safe).
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

echo "=== A0 compose corpora $(date +%T) ==="
for f in 10 30; do
  SPARK_GRAFT_CPUS=32 run graft.StressScale $SF1 $ROOT $f --compose-only \
    >> /tmp/r17_compose.log 2>&1
done
grep "\[compose\]" /tmp/r17_compose.log

# pin the r16 baselines BEFORE any pool rewrites the working-tree files
git show HEAD:bench_out.json     > /tmp/x1_pinned_r16.json
git show HEAD:bench_out_x10.json > /tmp/x10_pinned_r16.json
git show HEAD:bench_out_x30.json > /tmp/x30_pinned_r16.json

echo "=== A1 1x pool, 5 sessions $(date +%T) ==="
bash tools/bench_pool.sh 5 $SF1 bench_runs bench_out.json \
  > /tmp/r17_pool1x.log 2>&1
echo "A1 rc=$?"
echo "--- 1x trend gate (pinned r16 headline vs fresh) ---"
python3 tools/bench_trend.py /tmp/x1_pinned_r16.json bench_out.json \
  1.15 0.3 | tee /tmp/r17_trend1x.log
echo "trend1x rc=$?"

echo "=== A2 10x pool, 3 sessions $(date +%T) ==="
bash tools/bench_pool.sh 3 $ROOT/bench_x10 bench_runs_x10 bench_out_x10.json \
  $SF1 > /tmp/r17_pool10x.log 2>&1
echo "A2 rc=$?"
echo "--- 10x trend gate (pinned r16 vs fresh) ---"
python3 tools/bench_trend.py /tmp/x10_pinned_r16.json bench_out_x10.json \
  1.15 0.3 | tee /tmp/r17_trend10x.log
echo "trend10x rc=$?"

echo "=== A3 30x pool, 2 sessions $(date +%T) ==="
bash tools/bench_pool.sh 2 $ROOT/bench_x30 bench_runs_x30 bench_out_x30.json \
  $SF1 > /tmp/r17_pool30x.log 2>&1
echo "A3 rc=$?"
echo "--- 30x trend gate (pinned r16 vs fresh — round-16 ask 6) ---"
python3 tools/bench_trend.py /tmp/x30_pinned_r16.json bench_out_x30.json \
  1.15 0.3 | tee /tmp/r17_trend30x.log
echo "trend30x rc=$?"

echo "=== A4 semantic pair-stage ladder to 100x $(date +%T) ==="
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_STRESS_OUT=/tmp/r17_pair_stage.json \
  run graft.StressScale $SF1 $ROOT 100 --pair-stage \
  > /tmp/r17_pairstage.log 2>&1
echo "A4 rc=$?"
grep "\[pair-stage\]" /tmp/r17_pairstage.log
echo "=== campaign done $(date +%T) ==="
