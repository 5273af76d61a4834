#!/usr/bin/env python3
"""Parse a Spark event log: print per-job and per-stage wall time,
shuffle bytes, task counts — the r16 optimization round's empirical
loop (guide section 1.1/7.1 without a live UI).

Usage: evlog.py <eventlog-file> [min_sec]
"""
import json, sys, collections

path = sys.argv[1]
min_sec = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05

stages = {}          # id -> dict
jobs = {}            # id -> dict
stage_to_job = {}

for line in open(path, errors="replace"):
    try:
        e = json.loads(line)
    except json.JSONDecodeError:
        continue
    ev = e.get("Event")
    if ev == "SparkListenerJobStart":
        jid = e["Job ID"]
        jobs[jid] = {
            "t0": e["Submission Time"], "t1": None,
            "desc": (e.get("Properties") or {}).get(
                "spark.job.description", "")[:90],
            "stages": [s["Stage ID"] for s in e["Stage Infos"]],
        }
        for s in e["Stage Infos"]:
            stage_to_job[s["Stage ID"]] = jid
    elif ev == "SparkListenerJobEnd":
        if e["Job ID"] in jobs:
            jobs[e["Job ID"]]["t1"] = e["Completion Time"]
    elif ev == "SparkListenerStageCompleted":
        si = e["Stage Info"]
        sid = si["Stage ID"]
        t0 = si.get("Submission Time")
        t1 = si.get("Completion Time")
        st = stages.setdefault(sid, {})
        st["name"] = si["Stage Name"][:110]
        st["sec"] = (t1 - t0) / 1e3 if t0 and t1 else 0.0
        st["tasks"] = si["Number of Tasks"]
    elif ev == "SparkListenerTaskEnd":
        sid = e["Stage ID"]
        st = stages.setdefault(sid, {})
        st.setdefault("name", "?"); st.setdefault("sec", 0)
        st.setdefault("tasks", 0)
        m = e.get("Task Metrics") or {}
        sr = (m.get("Shuffle Read Metrics") or {})
        sw = (m.get("Shuffle Write Metrics") or {})
        st["sh_read"] = st.get("sh_read", 0) + sr.get(
            "Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
        st["sh_write"] = st.get("sh_write", 0) + sw.get(
            "Shuffle Bytes Written", 0)
        st["cpu"] = st.get("cpu", 0) + m.get("Executor CPU Time", 0) / 1e9
        st["run"] = st.get("run", 0) + m.get("Executor Run Time", 0) / 1e3
        st["fetch"] = st.get("fetch", 0) + sr.get("Fetch Wait Time", 0) / 1e3
        inm = m.get("Input Metrics") or {}
        st["input"] = st.get("input", 0) + inm.get("Bytes Read", 0)

tot = sum(j["t1"] - j["t0"] for j in jobs.values() if j["t1"])
print(f"jobs: {len(jobs)}  total job wall: {tot/1e3:.2f}s  "
      f"stages: {len(stages)}")

# timeline: gaps between consecutive jobs = driver-side time (guide 7.3)
seq = sorted((j["t0"], j["t1"] or j["t0"], jid)
             for jid, j in jobs.items())
prev_end = None
gap_tot = 0
print("\njob timeline (gap = driver-side time since previous job end):")
for t0, t1, jid in seq:
    gap = (t0 - prev_end) / 1e3 if prev_end else 0.0
    if prev_end:
        gap_tot += max(0, t0 - prev_end)
    mark = " <== GAP" if gap >= min_sec else ""
    if gap >= min_sec or (t1 - t0) / 1e3 >= min_sec:
        print(f"  job {jid:>4} start+{gap:>6.2f}s run {(t1-t0)/1e3:>6.2f}s"
              f"  {jobs[jid]['desc'][:70]}{mark}")
    prev_end = max(prev_end or t1, t1)
print(f"total inter-job gap: {gap_tot/1e3:.2f}s")
print(f"\n{'job':>4} {'sec':>7}  desc")
for jid, j in sorted(jobs.items()):
    if j["t1"] is None:
        continue
    sec = (j["t1"] - j["t0"]) / 1e3
    if sec >= min_sec:
        print(f"{jid:>4} {sec:>7.2f}  {j['desc']}")

print(f"\n{'stage':>5} {'job':>4} {'sec':>7} {'tasks':>5} "
      f"{'cpu_s':>7} {'run_s':>7} {'fetchW':>6} {'in_MB':>7} "
      f"{'shR_MB':>7} {'shW_MB':>7}  name")
for sid, s in sorted(stages.items(), key=lambda kv: -kv[1]["sec"]):
    if s["sec"] < min_sec:
        continue
    print(f"{sid:>5} {stage_to_job.get(sid,-1):>4} {s['sec']:>7.2f} "
          f"{s['tasks']:>5} {s.get('cpu',0):>7.1f} {s.get('run',0):>7.1f} "
          f"{s.get('fetch',0):>6.1f} {s.get('input',0)/1e6:>7.1f} "
          f"{s.get('sh_read',0)/1e6:>7.1f} {s.get('sh_write',0)/1e6:>7.1f}"
          f"  {s['name']}")
