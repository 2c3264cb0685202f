#!/usr/bin/env bash
# Weather-gated fixed-delta ingest rep — r18 protocol v3.
#
# One rep = one solo ScaleBench run of qn110_delta_ingest at a single
# state size (plus the untimed 100k JIT warmup point). Changes vs
# scripts/scalebench_delta_r17.sh (kept for the r17 artifact's
# provenance):
#
#  * The verdict line now emits BOTH classifications, so the log is
#    self-consistent with the rule the law claim actually uses
#    (ADVICE r17): the v2 per-rep gates (calib <= 2.0, cpu_weather
#    other <= 0.05, in-window bw-watch t1 median >= 5 GB/s) print as
#    ACCEPT/REJECT as before, and the v3 fields `healthy_calib` +
#    `wall` feed the envelope estimator — the law's point estimate is
#    the MINIMUM wall over healthy-calibration reps, accepted once the
#    two lowest such walls agree within 20% (co-tenancy only INFLATES
#    walls, so the lower envelope converges to the true cost; no probe
#    on this host separates a neighbor's DRAM squeeze from the op's own
#    saturation, r17 NOTES §3b).
#  * The r17 parser bug (its first rep piped sbt output into a heredoc
#    python whose stdin the heredoc itself consumed, printing "REJECT
#    no-point" for a healthy run) is structurally gone: the payload
#    travels via REP_OUT in the environment, never stdin.
#
# Usage (>= 2 healthy-calib reps per point, 4M until converged):
#   scripts/scalebench_delta_r18.sh 4000000 [SCALEBENCH_r18_delta.log]
set -u
# pipefail so RC below reflects sbt's exit status, not grep's (an sbt
# crash after the warmup JSON line otherwise logged rc=0).
set -o pipefail
N="${1:?usage: scalebench_delta_r18.sh <nDocs> [log]}"
LOG="${2:-SCALEBENCH_r18_delta.log}"
MEM="${SPARK_DRIVER_MEM:-48g}"
echo "=== rep start $(date -u +%FT%TZ) n=$N mem=$MEM (r18 protocol v3: v2 gates + healthy_calib/envelope fields) ===" >> "$LOG"
OUT=$(SPARK_DRIVER_MEM="$MEM" SPARK_GRAFT_SCALE_OPS=qn110_delta_ingest \
  SPARK_GRAFT_SCALE_FANOUT=0 SPARK_GRAFT_SCALE_WARMUP=100000 \
  SPARK_GRAFT_TASK_METRICS=1 SPARK_GRAFT_BW_WATCH=1 \
  sbt -batch "runMain graft.tools.ScaleBench $N" 2>&1 | grep -E '^\{')
RC=$?
echo "$OUT" >> "$LOG"
VERDICT=$(REP_OUT="$OUT" REP_N="$N" python3 <<'EOF'
import json, os
n = int(os.environ["REP_N"])
point = None
for line in os.environ["REP_OUT"].splitlines():
    try: d = json.loads(line)
    except ValueError: continue
    if d.get("n_docs") == n and not d.get("warmup"):
        point = d
if point is None:
    print("REJECT no-point healthy_calib=false wall=-1")
    raise SystemExit
op = point.get("qn110_delta_ingest", {})
calib = point.get("calibration_sec", 99.0)
other = point.get("cpu_weather", {}).get("qn110_delta_ingest", {}).get("other", 1.0)
off, sec = op.get("off", 0.0), op.get("sec", 0.0)
inwin = sorted(g for t, g in point.get("bw_watch_t1", []) if off <= t <= off + sec)
t1med = inwin[len(inwin) // 2] if inwin else -1.0
ok = calib <= 2.0 and other <= 0.05 and (t1med >= 5.0 or not inwin)
tag = "ACCEPT" if ok else "REJECT"
if not inwin and ok:
    tag = "ACCEPT(no-watch-samples)"
healthy = calib <= 2.0 and other <= 0.05
print(f"{tag} n={n} wall={op.get('sec')} calib={calib} other={other} "
      f"t1_inwin_med={t1med} t32_boundary={point.get('mem_bw_gbps',{}).get('t32')} "
      f"healthy_calib={str(healthy).lower()} wall_envelope_candidate={op.get('sec')}")
EOF
)
echo "verdict: $VERDICT" >> "$LOG"
echo "=== rep end rc=$RC $(date -u +%FT%TZ) ===" >> "$LOG"
echo "$VERDICT"
