#!/bin/bash
# External host-bandwidth watcher for the qn63 protocol: a SEPARATE
# tiny JVM sampling single-thread DRAM streaming bandwidth every ~60s,
# independent of the benchmark JVM. Each probe costs ~3s of one core
# (page-touch + two 1s measurements) — ~5% of one core out of 32.
# Usage: scripts/scalebench_bw_watch.sh [out.log]   (kill when done)
set -u
OUT="${1:-/root/repo/SCALEBENCH_r13_bw.log}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
ADDOPENS="$(cat /tmp/addopens.txt)"
while true; do
  TS=$(date -u +%s)
  LINE=$(java -Xmx3g $ADDOPENS -cp "$CP" graft.tools.MemBandwidthProbe 1 2>/dev/null)
  echo "{\"epoch\":$TS,$(echo "$LINE" | sed 's/^{//')" >> "$OUT"
  sleep 57
done
