# -*- coding: utf-8 -*-
"""Profiler-trace breakdown of the 2D solve phase (VERDICT r4 item 5).

Runs the bench 2D workload (Example_01, 6 tools x 101 depths) once compiled
and once under ``jax.profiler`` via the executor's ``profile_dir`` hook, then
parses the trace.json.gz directly: device busy vs idle wall fraction, and the
top device ops by total time. An op that is HBM-bound has duration ~= bytes/BW,
so the per-op table is the measurement that validates (or corrects) bench.py's
first-order traffic model.

Usage: python scratch/trace2d.py [variant-overrides as k=v ...]
"""
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from remo3d_tpu import Model

BASE = "/root/reference/Examples/Example_01"
TOOLS = ["B5.7A0.4M", "B4.48A1.62M", "M1.0A0.1B", "A2.0M0.5N", "N0.5M2.0A", "M4.0A0.5B"]
DEPTHS = np.arange(0, 25.1, 0.1)[:101]
TRACE_DIR = "/tmp/trace2d"


def run_traced(overrides):
    model = Model(TOOLS)
    model.set_model_parameters(
        BASE + "/Input/Formation.txt", BASE + "/Input/Borehole.txt"
    )
    model.initialize_workers(cpu_workers=4)
    model.simulate_logs(DEPTHS, verbose=False,
                        executor_overrides=dict(overrides))  # compile warm-up
    t0 = time.perf_counter()
    model.simulate_logs(
        DEPTHS,
        verbose=False,
        executor_overrides={"profile_dir": TRACE_DIR, **overrides},
    )
    el = time.perf_counter() - t0
    rep = model._executor.last_report
    n_solves = sum(c["n_solves"] for c in rep["chunks"])
    print(f"traced run: {el:.2f}s  {n_solves / el:.1f} solves/s")
    return el


def load_trace():
    paths = sorted(
        glob.glob(TRACE_DIR + "/plugins/profile/*/*.trace.json.gz"),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no trace under {TRACE_DIR}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def analyze(trace):
    events = trace["traceEvents"]
    # Map pid/tid -> names to find the device compute lanes.
    pids = {}
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"]["name"]
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "device" in n.lower()}
    print("process tracks:", {p: pids[p] for p in sorted(pids)})

    lanes = {}
    per_op = {}
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in dev_pids:
            continue
        tname = tids.get((e["pid"], e["tid"]), str(e["tid"]))
        if "step" in tname.lower():
            continue  # steps lane double-counts the op lanes
        lane = lanes.setdefault(
            (e["pid"], tname), {"busy": 0.0, "lo": np.inf, "hi": -np.inf, "n": 0}
        )
        dur = float(e.get("dur", 0.0))
        ts = float(e["ts"])
        lane["busy"] += dur
        lane["lo"] = min(lane["lo"], ts)
        lane["hi"] = max(lane["hi"], ts + dur)
        lane["n"] += 1
        key = e["name"].split(".")[0]
        rec = per_op.setdefault(key, [0.0, 0])
        rec[0] += dur
        rec[1] += 1

    for (pid, tname), lane in sorted(lanes.items()):
        wall = lane["hi"] - lane["lo"]
        if wall <= 0 or lane["n"] < 5:
            continue
        print(
            f"lane {pids.get(pid, pid)}/{tname}: busy {lane['busy'] / 1e6:.3f}s of "
            f"{wall / 1e6:.3f}s wall -> {lane['busy'] / wall * 100:.1f}% "
            f"({lane['n']} events)"
        )
    print("\ntop ops by device time:")
    for name, (dur, n) in sorted(per_op.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f"  {dur / 1e6:8.3f}s  x{n:6d}  {name}")


if __name__ == "__main__":
    overrides = {}
    for a in sys.argv[1:]:
        k, v = a.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        overrides[k] = v
    os.system(f"rm -rf {TRACE_DIR}")
    run_traced(overrides)
    analyze(load_trace())
