"""Shared profiler-trace parsing for the device-timeline scripts.

The par.16 measurement arbiter: sum per-op device time from a
jax.profiler trace (TPU process rows, 'X' complete events), divided by
the number of traced executions. Used by analyze_{int8,train}_hlo.py,
probe_mosaic_int8.py, ab_mosaic_int8.py, ab_flip_gather.py.
"""

import collections
import gzip
import json
import os


def load_device_ops(trace_dir: str, iters: int):
    """Newest trace under ``trace_dir`` -> (op_ms list desc, whole_ms dict).

    op_ms: [(ms_per_iter, op_name)] excluding the whole-program jit_*
    rows; whole_ms: {jit_program_name: ms_per_iter}.
    """
    paths = []
    for root, _dirs, files in os.walk(trace_dir):
        for f in files:
            if f.endswith("trace.json.gz"):
                paths.append(os.path.join(root, f))
    with gzip.open(max(paths, key=os.path.getmtime)) as f:
        data = json.load(f)
    pids = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    tot = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            tot[e["name"]] += e.get("dur", 0)
    ops, whole = [], {}
    for name, dur_us in tot.most_common():
        ms = dur_us / 1000 / iters
        if name.startswith("jit_"):
            whole[name] = ms
        else:
            ops.append((ms, name))
    return ops, whole
