"""XLA flag sweep for the headline int8 inference benchmark.

Round-2 left an untested lead: compiler-level knobs (scoped VMEM limit,
latency-hiding scheduler) that can move conv fusion decisions without any
source change. XLA flags are read once at backend init, so each setting
runs in a FRESH subprocess invoking bench.py; settings run strictly
sequentially (never two TPU processes at once — CLAUDE.md) with long
timeouts so a slow compile is not mistaken for a wedge.

Usage: python -u scripts/sweep_xla_flags.py [--train]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SETTINGS = [
    ("baseline", ""),
    ("vmem8192", "--xla_tpu_scoped_vmem_limit_kib=8192"),
    ("vmem12288", "--xla_tpu_scoped_vmem_limit_kib=12288"),
    ("vmem4096", "--xla_tpu_scoped_vmem_limit_kib=4096"),
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true"),
]


def run_one(name: str, flags: str, extra_args: list[str]) -> dict | None:
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (base + " " + flags).strip()
    # flag changes invalidate the persistent compile cache anyway, but be
    # explicit so a stale cache never masks a flag's effect
    env["ANNONET_TPU_NO_COMPILATION_CACHE"] = "1"
    cmd = [sys.executable, "-u", os.path.join(REPO, "bench.py")] + extra_args
    t0 = time.monotonic()
    try:
        proc = subprocess.run(
            cmd, env=env, capture_output=True, text=True, timeout=600
        )
    except subprocess.TimeoutExpired:
        print(f"{name}: TIMEOUT (>600s)", flush=True)
        return None
    wall = time.monotonic() - t0
    line = None
    for ln in proc.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            line = ln
    if proc.returncode != 0 or line is None:
        print(f"{name}: FAILED rc={proc.returncode}", flush=True)
        tail = (proc.stderr or proc.stdout).splitlines()[-8:]
        for t in tail:
            print("   ", t, flush=True)
        return None
    result = json.loads(line)
    result["setting"] = name
    result["flags"] = flags
    result["wall_s"] = round(wall, 1)
    print(
        f"{name}: {result['value']} {result['unit']} "
        f"(wall {wall:.0f}s)  flags='{flags}'",
        flush=True,
    )
    return result


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--passes", type=int, default=3)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument(
        "--settings", default="",
        help="comma-separated subset of setting names to run",
    )
    args = parser.parse_args()

    wanted = {s for s in args.settings.split(",") if s}
    results = []
    for name, flags in SETTINGS:
        if wanted and name not in wanted:
            continue
        r = run_one(
            name, flags,
            ["--passes", str(args.passes), "--iters", str(args.iters)],
        )
        if r:
            results.append(r)
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
