"""A/B: Mosaic int8 conv kernels vs XLA convs on the COMPOSED program.

The WB sweep (scripts/probe_mosaic_wb.py, recorded in
ops/int8_conv_mosaic.MOSAIC_FAST_WB) showed the tap-GEMM kernels are
pathological at the shipped 872-px plan's WB=109 but beat XLA 1.5-1.7x
at WB in {96, 104, 128}. The shipped policy therefore snaps the int8
tile plan to a fast width and rewrites convs per MOSAIC_FAST_WB. This
measures the four composed candidates in one process:

  xla      — mode off, auto plan (the shipped 872x872 program);
  xla_s    — mode off, plan pinned to the Mosaic snap (1024 wide —
             the snap only grows, and WB=128 is the best fast width
             per pixel): same-geometry exactness partner for the
             mosaic arms, and measures what the snap alone costs XLA;
  mos_s1   — ANNONET_TPU_MOSAIC_INT8=s1 (stride-1 kernels, snapped
             plan; compared to xla_s — round 4 root-caused the
             observed label diff as DOWNSTREAM bf16 accumulation-order
             drift under the custom call's layout influence, ±1
             requant steps, NOT kernel error: DESIGN.md §34,
             scripts/repro_mosaic_s1.py);
  mos_s1s2 — ANNONET_TPU_MOSAIC_INT8=1 (+stride-2 kernels; the sweep
             says XLA s2 is faster at WB=96, the composed program
             decides).

Cross-plan comparisons are reported in Mpx/s (same 4096^2 image for
every arm). Interleaved wall-clock rounds PLUS the par.16 arbiter:
whole-program device-timeline ms from a profiler trace of each arm.

Run alone on the TPU:  python -u scripts/ab_mosaic_int8.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_util import load_device_ops

import jax
import jax.numpy as jnp
import numpy as np

from annonet_tpu.infer.core import TiledInferer
from annonet_tpu.infer.tiling import TilingParameters
from annonet_tpu.models.segnet import (
    SegNetConfig,
    fold_batchnorm,
    init_state,
    required_input_dimension,
)

SIZE = 4096
ITERS = 5
ROUNDS = 4


def device_timeline_ms(trace_dir):
    ops, _whole = load_device_ops(trace_dir, ITERS)
    return sum(m for m, _ in ops), ops


def main() -> None:
    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    rp = fold_batchnorm(params, bn_stats, config)
    overlap = required_input_dimension(config)
    tiling = TilingParameters(1024, 1024, overlap, overlap)

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.integers(0, 256, size=(SIZE, SIZE, 3), dtype=np.uint8)
    )
    float(jnp.max(image).astype(jnp.int32))

    # (name, ANNONET_TPU_MOSAIC_INT8, prefer_tile_widths)
    arms = (
        ("xla", "0", None),
        ("xla_s", "0", [1024]),
        ("mos_s1", "s1", None),
        ("mos_s1s2", "1", None),
    )
    # pin the flatten variant OFF so a leftover shell export can't
    # silently switch the mosaic arms to the :flat kernels
    os.environ["ANNONET_TPU_MOSAIC_FLATTEN"] = "0"
    # this is the measurement harness the hardware fence exists for:
    # acknowledge wrong-on-hardware labels (the label diff is part of
    # what this script measures and reports)
    os.environ["ANNONET_TPU_MOSAIC_INT8_UNSAFE"] = "1"
    inferers, outs, plans = {}, {}, {}
    for name, flag, prefer in arms:
        os.environ["ANNONET_TPU_MOSAIC_INT8"] = flag
        inf = TiledInferer(
            rp, config, tiling, quantize="int8",
            prefer_tile_widths=prefer,
        )
        plan = inf.plan(SIZE, SIZE)
        plans[name] = (plan.tile_height, plan.tile_width, plan.tile_count)
        print(f"{name}: plan {plan.tile_width}x{plan.tile_height} "
              f"n={plan.tile_count}", flush=True)
        for _ in range(2):  # calib program + int8 program
            labels, _ = inf.infer_arrays(image, device_output=True)
            float(jnp.max(labels).astype(jnp.int32))
        inferers[name] = inf
        outs[name] = labels

    # Up to ~1% label drift vs the same-plan XLA arm is the EXPECTED
    # downstream bf16 accumulation-order effect (DESIGN.md par.34,
    # ~0.2-0.4% measured); beyond that something else is wrong and the
    # perf numbers should not be trusted.
    drift_budget = 0.01 * SIZE * SIZE
    exact_fail = False
    for name in ("mos_s1", "mos_s1s2"):
        if plans[name] == plans["xla_s"]:
            mism = int(jnp.sum(outs[name] != outs["xla_s"]))
            print(f"label disagreement {name} vs xla_s: {mism} px "
                  f"({mism / (SIZE * SIZE):.4%}; expected ~0.2-0.4%: "
                  f"downstream bf16 drift, DESIGN.md par.34)", flush=True)
            exact_fail |= mism > drift_budget
        else:
            # different tile geometry -> different calibration crops ->
            # legitimately different int8 scales; informational only
            mism = int(jnp.sum(outs[name] != outs["xla"]))
            print(f"label disagreement {name} vs xla: {mism} px "
                  f"(CROSS-PLAN — informational, no exactness claim)",
                  flush=True)
    if exact_fail:
        print("!! label drift beyond the par.34 budget (>1%) — perf "
              "numbers below are for a WRONG program; do not use",
              flush=True)

    trivial = jax.jit(lambda a: a[0, 0].astype(jnp.int32))
    float(trivial(outs["xla"]))
    t0 = time.monotonic()
    for _ in range(3):
        float(trivial(outs["xla"]))
    rtt = (time.monotonic() - t0) / 3
    mpx = SIZE * SIZE * ITERS / 1e6

    # arbiter: whole-program device-timeline ms per arm
    timeline = {}
    for name, inf in inferers.items():
        trace_dir = f"/tmp/ab_mosaic_{name}"
        with jax.profiler.trace(trace_dir):
            for _ in range(ITERS):
                labels, _ = inf.infer_arrays(image, device_output=True)
            float(jnp.max(labels).astype(jnp.int32))
        ms, ops = device_timeline_ms(trace_dir)
        timeline[name] = ms
        print(f"\n== {name}: device timeline {ms:.2f} ms/image ==",
              flush=True)
        for m, op in ops[:10]:
            if m >= 0.2:
                print(f"  {m:8.2f} ms  {op[:64]}", flush=True)

    rates = {name: [] for name in inferers}
    for _r in range(ROUNDS):
        for name, inf in inferers.items():
            t0 = time.monotonic()
            for _ in range(ITERS):
                labels, _ = inf.infer_arrays(image, device_output=True)
            float(jnp.max(labels).astype(jnp.int32))
            rates[name].append(mpx / max(1e-9, time.monotonic() - t0 - rtt))
    meds = {}
    for name, rs in rates.items():
        meds[name] = sorted(rs)[len(rs) // 2]
        print(f"{name}: median {meds[name]:.1f} Mpx/s  "
              f"({['%.1f' % r for r in rs]})", flush=True)
    print(json.dumps({
        "metric": "mosaic_int8_composed",
        **{f"{n}_device_ms": round(v, 2) for n, v in timeline.items()},
        **{f"{n}_mpxs": round(v, 1) for n, v in meds.items()},
        "exact_fail": exact_fail,
        "plans": {n: f"{w}x{h}/n{c}" for n, (h, w, c) in plans.items()},
    }))


if __name__ == "__main__":
    main()
