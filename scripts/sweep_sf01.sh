#!/bin/bash
# Standing FULL-registry correctness sweep at sf0.1 (VERDICT r14 item #7).
#
# The driver's graded gate runs at sf0.01 only; this sweep re-runs every
# registry query + its DuckDB oracle at 10x that scale, which catches
# scale-dependent divergences the gate cannot see (r14: qn112's contract
# check used double floors while the op used decimal — green at sf0.01,
# red at sf0.1). Run it before closing a round and cite the output file
# in the round NOTES. ~15 min; run SOLO (no concurrent sbt/Spark JVM).
#
# Usage: scripts/sweep_sf01.sh [out.log] [name-regex]
set -u -o pipefail
OUT="${1:-/tmp/sweep_sf01.log}"
FILTER="${2:-}"
DIR=/tmp/verify_sf01
cd /root/repo
rm -rf "$DIR"
echo "=== sweep sf0.1 start $(date -u +%FT%TZ) filter='${FILTER}' ===" | tee "$OUT"
# grep -q exits 1 on "no failure lines", which is the GOOD case — only
# treat sbt's own exit status as the verdict (pipefail propagates it).
# Matching bare '[error]' instead would flood the log: sbt prefixes the
# forked JVM's whole stderr (all Spark logging) with [error].
if [ -n "$FILTER" ]; then
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $DIR $FILTER" \
    2>&1 | { grep -E "\[verify\].*failed|Exception in" || true; } | tee -a "$OUT"
else
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $DIR" \
    2>&1 | { grep -E "\[verify\].*failed|Exception in" || true; } | tee -a "$OUT"
fi
sbt_rc=$?   # pipefail: sbt's status survives the grep/tee stages
echo "sbt_rc=$sbt_rc" | tee -a "$OUT"
python3 scripts/check.py /root/testdata/sf0.1 "$DIR" 2>&1 | tee -a "$OUT"
check_rc=$?
echo "=== sweep sf0.1 end $(date -u +%FT%TZ) ===" | tee -a "$OUT"
# The sweep's verdict IS the exit status: callers (and the round close
# checklist) must see a red Verify or oracle mismatch without reading
# the log.
if [ "$sbt_rc" -ne 0 ]; then exit "$sbt_rc"; fi
exit "$check_rc"
