#!/bin/bash
# r14 scale protocol (VERDICT r13 items #1 and #7): one solo JVM running
# the 1M/2M points for
#   - qn49_cross_neardup, WITH the new bipartite candidate census
#     (cross_capped_pairs / cross_raw_pairs next to the walls — the
#     measurement the r13 5.02x-per-2x reading was missing), and
#   - qn105_score (the learned-quality serving scan; model fit forced
#     outside the timed window), joining the scan-tracking family.
# Same protocol as r10-r13: -Xmx48g (32g puts the 2M ANN heap-agg stage
# on a GC cliff), untimed 100k warmup point, per-task stats, twolevel
# conf per ScaleBench defaults (off since r13 — noted in every artifact
# comparison). MUST run solo: no other sbt/Spark JVM on the host.
#
# Usage: scripts/scalebench_r14.sh [ops-regex] [out.log] [scales...]
set -u
OPS="${1:-qn49|qn105_score}"
OUT="${2:-/root/repo/SCALEBENCH_r14_census.log}"
shift 2 2>/dev/null || true
SCALES="${*:-1000000 2000000}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
ADDOPENS="$(cat /tmp/addopens.txt)"
cd /root/repo
echo "=== start $(date -u +%FT%TZ) ops=$OPS scales=$SCALES ===" >> "$OUT"
SPARK_GRAFT_SCALE_WARMUP=100000 \
SPARK_GRAFT_SCALE_OPS="$OPS" \
SPARK_GRAFT_TASK_METRICS=1 \
java -Xmx48g -XX:-DontCompileHugeMethods $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.tools.ScaleBench $SCALES \
  >> "$OUT" 2>/tmp/scalebench_r14.err
echo "=== end rc=$? $(date -u +%FT%TZ) ===" >> "$OUT"
