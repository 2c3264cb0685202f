#!/usr/bin/env bash
# Weather-gated fixed-delta ingest rep — r19 protocol v4.
#
# Identical per-rep gates + envelope fields to scripts/
# scalebench_delta_r18.sh (kept for the r18 artifact's provenance);
# the one addition is the VOCABULARY LAW knob (r19 verdict item 1):
#
#   SPARK_GRAFT_SCALE_VOCAB=fixed  (default) — the closed 30k
#       vocabulary every r14–r18 campaign ran; per-shingle df grows
#       2× per corpus doubling (pair densification by construction).
#   SPARK_GRAFT_SCALE_VOCAB=heaps — ScaleData.heapsVocab(n): types
#       grow 1.62× per doubling (Heaps' law, beta=0.7), per-shingle
#       df grows only ~1.23× per doubling — the realistic law.
#
# The point JSON now carries vocab_mode/vocab_size, and the verdict
# line echoes them, so closed- and open-vocabulary reps are
# self-describing in one log. Run >= 2 healthy-calib reps per point;
# the law's point estimate stays the MINIMUM wall over healthy-calib
# reps, accepted once the two lowest agree within 20%.
#
# Usage:
#   scripts/scalebench_delta_r19.sh <nDocs> [SCALEBENCH_r19_delta.log]
#   SPARK_GRAFT_SCALE_VOCAB=heaps scripts/scalebench_delta_r19.sh 4000000
set -u
set -o pipefail
N="${1:?usage: scalebench_delta_r19.sh <nDocs> [log]}"
LOG="${2:-SCALEBENCH_r19_delta.log}"
MEM="${SPARK_DRIVER_MEM:-48g}"
VOCAB="${SPARK_GRAFT_SCALE_VOCAB:-fixed}"
echo "=== rep start $(date -u +%FT%TZ) n=$N mem=$MEM vocab=$VOCAB (r19 protocol v4: v2 gates + envelope fields + vocab law) ===" >> "$LOG"
OUT=$(SPARK_DRIVER_MEM="$MEM" SPARK_GRAFT_SCALE_OPS=qn110_delta_ingest \
  SPARK_GRAFT_SCALE_VOCAB="$VOCAB" \
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
print(f"{tag} n={n} vocab={point.get('vocab_mode')}:{point.get('vocab_size')} "
      f"wall={op.get('sec')} calib={calib} other={other} "
      f"t1_inwin_med={t1med} t32_boundary={point.get('mem_bw_gbps',{}).get('t32')} "
      f"healthy_calib={str(healthy).lower()} wall_envelope_candidate={op.get('sec')}")
EOF
)
echo "verdict: $VERDICT" >> "$LOG"
echo "=== rep end rc=$RC $(date -u +%FT%TZ) ===" >> "$LOG"
echo "$VERDICT"
