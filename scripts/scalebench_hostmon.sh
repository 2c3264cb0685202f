#!/bin/bash
# Host-side correlates for the qn63 bimodality protocol: every ~15s,
# for the live ScaleBench JVM, record
#   - utime/stime (user vs KERNEL cpu — page-fault/THP-defrag storms
#     show up as stime; r11's thread dumps could not see the split),
#   - AnonHugePages vs RSS from smaps_rollup (the THP lottery: whether
#     THIS run's 48g heap landed on 2M pages),
#   - system-wide major faults + THP alloc/collapse counters (vmstat).
# Pure /proc reads — zero measurable perturbation.
# Usage: scripts/scalebench_hostmon.sh [out.log]   (kill when done)
set -u
OUT="${1:-/root/repo/SCALEBENCH_r14_hostmon.log}"
while true; do
  PID=$(pgrep -f 'graft.tools.ScaleBench' | head -1)
  TS=$(date -u +%s)
  # Host-wide CPU mix incl. STEAL (this host is a VM: nonzero steal in
  # /proc/stat) — a hypervisor-level interference window during a slow
  # rep shows here even when every in-guest number looks healthy.
  read -r _ HU HN HS HI HW HIRQ HSIRQ HST _ < /proc/stat
  HOST="\"host_user\":$HU,\"host_sys\":$HS,\"host_idle\":$HI,\"host_iowait\":$HW,\"host_steal\":$HST"
  if [ -n "${PID:-}" ] && [ -r "/proc/$PID/stat" ]; then
    read -r UT ST < <(awk '{print $14, $15}' "/proc/$PID/stat")
    AHP=$(awk '/^AnonHugePages/{print $2}' "/proc/$PID/smaps_rollup" 2>/dev/null)
    RSS=$(awk '/^Rss/{print $2}' "/proc/$PID/smaps_rollup" 2>/dev/null)
    PMF=$(awk '$1=="pgmajfault"{print $2}' /proc/vmstat)
    THPF=$(awk '$1=="thp_fault_alloc"{print $2}' /proc/vmstat)
    THPC=$(awk '$1=="thp_collapse_alloc"{print $2}' /proc/vmstat)
    SWP=$(awk '$1=="pswpin"{print $2}' /proc/vmstat)
    echo "{\"epoch\":$TS,\"pid\":$PID,\"utime\":$UT,\"stime\":$ST,\"anon_huge_kb\":${AHP:-0},\"rss_kb\":${RSS:-0},\"pgmajfault\":$PMF,\"thp_fault_alloc\":$THPF,\"thp_collapse_alloc\":$THPC,\"pswpin\":$SWP,$HOST}" >> "$OUT"
  else
    echo "{\"epoch\":$TS,\"pid\":null,$HOST}" >> "$OUT"
  fi
  sleep 15
done
