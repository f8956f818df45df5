#!/usr/bin/env bash
# Round-16 measurement campaign — strictly sequential (timed sessions
# never overlap). Logs per phase under /tmp/r16_*.log.
#
# Phased: `a` runs compose + the 30x pool FIRST because ask 5's ruling
# (pair-bounded overrides vs demotion for dedup_semantic /
# sim_neardup_lsh) is a possible registry change — which re-keys the
# bench fingerprint and would orphan every pool run before it. Phase `b`
# (after the ruling and any final product commit) runs the 1x 16-session
# pool (depth-matched to round 14 — ask 3), the 10x pool + trend gate
# (ask 4), and the clustered×filtered frontier (ask 7). If phase-a's
# ruling changed the registry, re-run phase a's P1 after the commit.
set -uo pipefail
cd /root/repo
PHASE="${1:?usage: r16_campaign.sh a|b}"

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

if [ "$PHASE" = a ]; then
  echo "=== A0 compose corpora $(date +%T) ==="
  for f in 10 30; do
    SPARK_GRAFT_CPUS=32 run graft.StressScale $SF1 $ROOT $f --compose-only \
      >> /tmp/r16_compose.log 2>&1
  done
  grep "\[compose\]" /tmp/r16_compose.log

  echo "=== A1 30x pool, 3 sessions $(date +%T) ==="
  bash tools/bench_pool.sh 3 $ROOT/bench_x30 bench_runs_x30 bench_out_x30.json \
    $SF1 > /tmp/r16_pool30x.log 2>&1
  echo "A1 rc=$?"
  echo "=== phase a done $(date +%T) — adjudicate ask 5 before phase b ==="
fi

if [ "$PHASE" = b ]; then
  echo "=== B0 frontier clustered-filtered x1 x100 $(date +%T) ==="
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_FRONTIER_OUT=/tmp/frontier_r16_clustered_filtered.json \
    run graft.Frontier $SF1 $ROOT --clustered-filtered 1 100 \
    > /tmp/r16_frontier.log 2>&1
  echo "B0 rc=$?"
  tail -c 400 /tmp/frontier_r16_clustered_filtered.json 2>/dev/null; echo

  echo "=== B1 1x pool, 8 sessions (equal-depth analysis corrects the gate) $(date +%T) ==="
  bash tools/bench_pool.sh 8 $SF1 bench_runs bench_out.json \
    > /tmp/r16_pool1x.log 2>&1
  echo "B1 rc=$?"

  echo "=== B2 10x pool, 2 sessions $(date +%T) ==="
  git show HEAD:bench_out_x10.json > /tmp/x10_pinned_r15.json
  bash tools/bench_pool.sh 2 $ROOT/bench_x10 bench_runs_x10 bench_out_x10.json \
    $SF1 > /tmp/r16_pool10x.log 2>&1
  echo "B2 rc=$?"
  echo "--- 10x trend gate (pinned r15 vs fresh) ---"
  python3 tools/bench_trend.py /tmp/x10_pinned_r15.json bench_out_x10.json \
    1.15 0.3 | tee /tmp/r16_trend10x.log
  echo "trend10x rc=$?"

  echo "--- 1x trend gate (r15 headline vs fresh) ---"
  git show HEAD:bench_out.json > /tmp/x1_r15.json
  python3 tools/bench_trend.py /tmp/x1_r15.json bench_out.json \
    1.15 0.3 | tee /tmp/r16_trend1x.log
  echo "trend1x rc=$?"
  echo "=== phase b done $(date +%T) ==="
fi
