#!/bin/bash
# Per-thread CPU-split sampler for the qn63 protocol: every cycle, take
# a 10s utime/stime delta per thread of the live ScaleBench JVM and log
# the top burners (with thread names), plus kernel stacks of the top-3
# stime burners. Pure /proc reads. Answers the question jstack cannot:
# WHEN the stage is slow, is the CPU in user code or in the kernel, and
# in which kernel path?
# Usage: scripts/scalebench_threadmon.sh [out.log]
set -u
OUT="${1:-/root/repo/SCALEBENCH_r14_threadmon.log}"
while true; do
  PID=$(pgrep -f 'graft.tools.ScaleBench' | head -1)
  if [ -z "${PID:-}" ]; then sleep 20; continue; fi
  declare -A U S N
  for t in /proc/$PID/task/*; do
    tid=${t##*/}
    read -r ut st < <(awk '{print $14,$15}' "$t/stat" 2>/dev/null) || continue
    U[$tid]=$ut; S[$tid]=$st; N[$tid]=$(cat "$t/comm" 2>/dev/null)
  done
  sleep 10
  TS=$(date -u +%s)
  {
    echo "=== $TS pid=$PID (10s deltas: dstime dutime tid name)"
    for t in /proc/$PID/task/*; do
      tid=${t##*/}
      [ -n "${U[$tid]:-}" ] || continue
      read -r ut st < <(awk '{print $14,$15}' "$t/stat" 2>/dev/null) || continue
      ds=$(( st - S[$tid] )); du=$(( ut - U[$tid] ))
      [ $(( ds + du )) -gt 5 ] && echo "$ds $du $tid ${N[$tid]}"
    done | sort -rn | head -12
  } >> "$OUT"
  # kernel stacks of the top-3 stime burners this cycle
  tail -12 "$OUT" | awk '$1 ~ /^[0-9]+$/ && $1 > 50 {print $3}' | head -3 | while read -r tid; do
    echo "--- kstack tid=$tid $(cat /proc/$PID/task/$tid/comm 2>/dev/null)" >> "$OUT"
    head -6 "/proc/$PID/task/$tid/stack" 2>/dev/null >> "$OUT"
  done
  unset U S N
  declare -A U S N
  sleep 50
done
