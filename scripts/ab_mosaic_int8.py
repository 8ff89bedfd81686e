"""A/B: Mosaic int8 conv kernels vs XLA convs on the COMPOSED program.

Four TiledInferers in one process:
  xla         — the shipped int8 program;
  mosaic      — ANNONET_TPU_MOSAIC_INT8=1 (stride-1/2 Mosaic kernels;
                MUST match xla bit-for-bit, asserted below);
  mosaic_flat — same + the flattened-M s1 variant (also bit-exact;
                interpret-mode exactness does NOT guarantee hardware
                exactness for Mosaic relayouts, so asserted on device);
  mosaic_up   — ANNONET_TPU_MOSAIC_INT8=2 (int8 up layers; NOT
                bit-exact — int8 up weights — mismatch is reported).

Interleaved wall-clock rounds PLUS the par.16 arbiter: whole-program
device-timeline ms from a profiler trace of each arm.

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
# tile plan override: "--tile W H" (e.g. 768 872 makes the folded WB=96,
# a whole number of int8 sublane tiles — no M padding in the s1 GEMMs)


def device_timeline_ms(trace_dir):
    ops, _whole = load_device_ops(trace_dir, ITERS)
    return sum(m for m, _ in ops), ops


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", nargs=2, type=int, default=[1024, 1024],
                    metavar=("W", "H"))
    tile_w, tile_h = ap.parse_args().tile

    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    rp = fold_batchnorm(params, bn_stats, config)
    overlap = required_input_dimension(config)
    tiling = TilingParameters(tile_w, tile_h, overlap, overlap)
    print(f"tile plan: {tile_w}x{tile_h}", flush=True)

    # both arms in ONE process: flip the env around inferer CONSTRUCTION
    # is not enough (the rewrite happens at calibration freeze), so flip
    # it around the first infer_arrays call of each arm
    inferers = {}
    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.integers(0, 256, size=(SIZE, SIZE, 3), dtype=np.uint8)
    )
    float(jnp.max(image).astype(jnp.int32))

    outs = {}
    for name, flag, flat in (
        ("xla", "0", "0"),
        ("mosaic", "1", "0"),
        ("mosaic_flat", "1", "1"),
        ("mosaic_up", "2", "0"),
    ):
        os.environ["ANNONET_TPU_MOSAIC_INT8"] = flag
        os.environ["ANNONET_TPU_MOSAIC_FLATTEN"] = flat
        inf = TiledInferer(rp, config, tiling, quantize="int8")
        for _ in range(2):  # calib program + int8 program
            labels, _ = inf.infer_arrays(image, device_output=True)
            float(jnp.max(labels).astype(jnp.int32))
        inferers[name] = inf
        outs[name] = labels
    mism = int(jnp.sum(outs["xla"] != outs["mosaic"]))
    print(f"label disagreement xla-vs-mosaic: {mism} px (must be 0)",
          flush=True)
    mism_flat = int(jnp.sum(outs["xla"] != outs["mosaic_flat"]))
    print(f"label disagreement xla-vs-mosaic_flat: {mism_flat} px "
          f"(must be 0 — hardware check of the flatten relayout)",
          flush=True)
    mism_up = int(jnp.sum(outs["xla"] != outs["mosaic_up"]))
    print(f"label disagreement xla-vs-mosaic_up: {mism_up} px "
          f"({mism_up / SIZE / SIZE:.5%}; int8 up weights)", flush=True)
    if mism or mism_flat:
        print("!! bit-exact arm mismatch — perf numbers below are for a "
              "WRONG program; do not use", flush=True)

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
        "label_mismatch_px": mism,
        "label_mismatch_flat_px": mism_flat,
        "label_mismatch_up_px": mism_up,
    }))


if __name__ == "__main__":
    main()
