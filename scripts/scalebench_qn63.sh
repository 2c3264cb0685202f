#!/bin/bash
# The r13 qn63_routed bimodality protocol (VERDICT r12 item #1):
# N fresh solo JVMs, each running the r10/r11 ScaleBench 2M point
# (-Xmx48g, untimed 100k warmup, single-op qn63_routed, fanout census
# skipped) with the in-JVM bandwidth watcher sampling single-thread
# DRAM streaming every 30s DURING the ops. An external 1-thread probe
# JVM (started separately, see scalebench_bw_watch.sh) samples host
# bandwidth independently of the benchmark JVM's state, so a slow rep
# can be classified as host-wide (both probes collapse) vs JVM-local
# (external normal, in-JVM slow).
#
# Usage: scripts/scalebench_qn63.sh [reps] [out.log]
# MUST run solo: no other sbt/Spark JVM may share the host (the r11
# run-A lesson: a co-resident Verify inflated the 2M wall 5x).
set -u
REPS="${1:-7}"
OUT="${2:-/root/repo/SCALEBENCH_r13_qn63.log}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
ADDOPENS="$(cat /tmp/addopens.txt)"
cd /root/repo
for i in $(seq 1 "$REPS"); do
  echo "=== rep $i start $(date -u +%FT%TZ) ===" >> "$OUT"
  SPARK_GRAFT_SCALE_WARMUP=100000 \
  SPARK_GRAFT_SCALE_OPS='qn63' \
  SPARK_GRAFT_SCALE_FANOUT=0 \
  SPARK_GRAFT_BW_WATCH=1 \
  java -Xmx48g -XX:-DontCompileHugeMethods $ADDOPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.tools.ScaleBench 2000000 \
    >> "$OUT" 2>/tmp/scalebench_qn63_rep$i.err
  echo "=== rep $i end rc=$? $(date -u +%FT%TZ) ===" >> "$OUT"
done
echo "=== ALL DONE $(date -u +%FT%TZ) ===" >> "$OUT"
