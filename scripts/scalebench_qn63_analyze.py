#!/usr/bin/env python3
"""Merge the qn63 protocol logs into one per-rep summary (SCALEBENCH_r13).

Inputs (produced by scripts/scalebench_qn63.sh + the three monitors):
  SCALEBENCH_r13_qn63.log      rep boundaries + per-point JSON (incl. the
                               in-JVM bw watcher series and per-op `off`)
  SCALEBENCH_r13_bw.log        external 1-thread DRAM probe (epoch, GB/s)
  SCALEBENCH_r13_hostmon.log   JVM utime/stime, THP/fault counters, and
                               host-wide user/sys/idle/iowait/STEAL
  SCALEBENCH_r13_threadmon.log per-thread 10s cpu-split samples (manual read)

For each rep: the 2M qn63 wall, in-JVM bandwidth stats inside vs outside
the qn63 window, external-probe stats in the same wall-clock window, and
host steal/sys shares over the window. Prints one JSON document.
"""
import json, re, sys, datetime

base = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"

def ts(s):
    return datetime.datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(
        tzinfo=datetime.timezone.utc).timestamp()

reps = []
cur = None
for line in open(f"{base}/SCALEBENCH_r13_qn63.log"):
    line = line.strip()
    m = re.match(r"=== rep (\d+) start (\S+) ===", line)
    if m:
        cur = {"rep": int(m.group(1)), "t_start": ts(m.group(2)), "points": []}
        continue
    m = re.match(r"=== rep (\d+) end rc=(\d+) (\S+) ===", line)
    if m and cur:
        cur["t_end"] = ts(m.group(3)); cur["rc"] = int(m.group(2))
        reps.append(cur); cur = None
        continue
    if line.startswith("{") and cur is not None:
        cur["points"].append(json.loads(line))

ext = []
for line in open(f"{base}/SCALEBENCH_r13_bw.log"):
    try:
        d = json.loads(line)
        ext.append((d["epoch"], d["mem_bw_gbps"]["t1"]))
    except Exception:
        pass

host = []
try:
    buf = ""
    for line in open(f"{base}/SCALEBENCH_r13_hostmon.log"):
        buf += line.strip()
        try:
            host.append(json.loads(buf)); buf = ""
        except json.JSONDecodeError:
            continue  # a vmstat double-match split one record across lines
except FileNotFoundError:
    pass

def stats(xs):
    if not xs:
        return None
    xs = sorted(xs)
    return {"n": len(xs), "min": round(xs[0], 2),
            "med": round(xs[len(xs) // 2], 2), "max": round(xs[-1], 2)}

out = []
for r in reps:
    p2m = next((p for p in r["points"] if p["n_docs"] == 2000000), None)
    if not p2m:
        out.append({"rep": r["rep"], "incomplete": True})
        continue
    wall = p2m["qn63_routed"]["sec"]
    off = p2m["qn63_routed"]["off"]
    # JVM-relative offsets -> wall clock: the JVM starts ~at rep t_start.
    q0, q1 = r["t_start"] + off, r["t_start"] + off + wall
    in_bw = [g for t, g in p2m.get("bw_watch_t1", []) if off <= t <= off + wall]
    pre_bw = [g for t, g in p2m.get("bw_watch_t1", []) if t < off]
    ext_in = [g for e, g in ext if q0 <= e <= q1]
    hw = [h for h in host if "host_user" in h and q0 <= h["epoch"] <= q1]
    hs = None
    if len(hw) >= 2:
        d = lambda k: hw[-1][k] - hw[0][k]
        tot = sum(d(k) for k in
                  ("host_user", "host_sys", "host_idle", "host_iowait", "host_steal"))
        span = hw[-1]["epoch"] - hw[0]["epoch"]
        hs = {"span_sec": span,
              "user_pct": round(100 * d("host_user") / tot, 1),
              "sys_pct": round(100 * d("host_sys") / tot, 1),
              "idle_pct": round(100 * d("host_idle") / tot, 1),
              "steal_pct": round(100 * d("host_steal") / tot, 1),
              "steal_cores": round(d("host_steal") / 100.0 / max(span, 1), 2)}
        jvm = [h for h in hw if h.get("pid")]
        if len(jvm) >= 2:
            du = jvm[-1]["utime"] - jvm[0]["utime"]
            ds = jvm[-1]["stime"] - jvm[0]["stime"]
            hs["jvm_stime_share"] = round(ds / max(du + ds, 1), 3)
    out.append({
        "rep": r["rep"], "qn63_2m_sec": wall,
        "mode": "slow" if wall > 200 else "fast",
        "gen_sec": round(off, 1),
        "calibration_sec": p2m["calibration_sec"],
        "post_bw": p2m["mem_bw_gbps"],
        "jvm_bw_during_qn63": stats(in_bw),
        "jvm_bw_during_gen": stats(pre_bw),
        "ext_bw_during_qn63": stats(ext_in),
        "host_during_qn63": hs,
    })

def op_walls(path):
    """[(n_docs, {op: sec})] for the timed points of a ScaleBench log."""
    pts = []
    try:
        for line in open(path):
            line = line.strip()
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            if d.get("warmup") is False and "n_docs" in d:
                pts.append((d["n_docs"],
                            {k: round(v["sec"], 1) for k, v in d.items()
                             if isinstance(v, dict) and "sec" in v}))
    except FileNotFoundError:
        pass
    return pts

doc = {
    "protocol": "7x solo 2M qn63_routed, 48g, 100k warmup, r13",
    "reps": out,
    "conclusion": {
        "bandwidth_hypothesis": "refuted - slow windows show idle-baseline "
            "DRAM bandwidth (in-JVM and external), host up to 90% idle, "
            "steal <= 0.14 cores, zero spill, uniform task peak memory",
        "root_cause": "unstable_if deopts of the generated two-level "
            "fast-map hashAgg loop whose frames are not OSR-rescued in "
            "slow JVMs (LogCompilation: ~40 deopt events in BOTH modes; "
            "8 stage-7 OSR compiles at stage start in the fast rep vs 0 "
            "in slow reps -> interpreted to partition end)",
        "mitigation": "spark.sql.codegen.aggregate.map.twolevel.enabled="
            "false (ScaleBench default since r13; SPARK_GRAFT_TWOLEVEL=1 "
            "restores stock codegen)",
    },
    # LogCompilation diagnostic reps (task metrics on): walls + stage-101
    # task-duration spreads live in SCALEBENCH_r13_diag.log.
    "diag_reps_2m_sec": [p[1].get("qn63_routed")
                         for p in op_walls(f"{base}/SCALEBENCH_r13_diag.log")],
    "mitigation_reps_2m_sec": [p[1].get("qn63_routed")
                               for p in op_walls(f"{base}/SCALEBENCH_r13_mitig.log")],
    "family_1m_2m": op_walls(f"{base}/SCALEBENCH_r13_family.log"),
    "textfam_1m_2m": op_walls(f"{base}/SCALEBENCH_r13_textfam.log"),
    "fanout_census": [
        {"n_docs": d["n_docs"], "capped_fanout": d["capped_fanout"],
         "raw_fanout": d["raw_fanout"]}
        for d in (json.loads(l.strip().replace(",}", "}"))
                  for l in open(f"{base}/SCALEBENCH_r13_fanout.log")
                  if l.startswith("{") and '"n_docs"' in l)],
}
print(json.dumps(doc, indent=1))
