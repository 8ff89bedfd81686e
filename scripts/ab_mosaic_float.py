"""A/B: Mosaic float tap-GEMM s1 kernels vs XLA convs, composed bf16 path.

Two TiledInferers (quantize=None) in one process — the shipped bf16
folded program and ANNONET_TPU_MOSAIC_FLOAT=1 (the s1 convs as Mosaic
tap GEMMs; same math, tap-order tolerance) — device-timeline arbiter
plus interleaved wall-clock rounds.

Run alone on the TPU:  python -u scripts/ab_mosaic_float.py
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

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.integers(0, 256, size=(SIZE, SIZE, 3), dtype=np.uint8)
    )
    float(jnp.max(image).astype(jnp.int32))

    inferers, outs = {}, {}
    for name, flag in (("xla", "0"), ("mosaic", "1")):
        os.environ["ANNONET_TPU_MOSAIC_FLOAT"] = flag
        inf = TiledInferer(rp, config, tiling, quantize=None)
        labels, _ = inf.infer_arrays(image, device_output=True)
        float(jnp.max(labels).astype(jnp.int32))
        inferers[name] = inf
        outs[name] = labels
    mism = int(jnp.sum(outs["xla"] != outs["mosaic"]))
    print(f"label disagreement xla-vs-mosaic float: {mism} px "
          f"({mism / SIZE / SIZE:.6%}; tap-order tolerance)", flush=True)

    trivial = jax.jit(lambda a: a[0, 0].astype(jnp.int32))
    float(trivial(outs["xla"]))
    t0 = time.monotonic()
    for _ in range(3):
        float(trivial(outs["xla"]))
    rtt = (time.monotonic() - t0) / 3
    mpx = SIZE * SIZE * ITERS / 1e6

    timeline = {}
    for name, inf in inferers.items():
        trace_dir = f"/tmp/ab_mosaic_float_{name}"
        with jax.profiler.trace(trace_dir):
            for _ in range(ITERS):
                labels, _ = inf.infer_arrays(image, device_output=True)
            float(jnp.max(labels).astype(jnp.int32))
        ops, _whole = load_device_ops(trace_dir, ITERS)
        timeline[name] = sum(m for m, _ in ops)
        print(f"\n== {name}: device timeline {timeline[name]:.2f} ms/image "
              f"==", flush=True)
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
        "metric": "mosaic_float_composed",
        **{f"{n}_device_ms": round(v, 2) for n, v in timeline.items()},
        **{f"{n}_mpxs": round(v, 1) for n, v in meds.items()},
        "label_mismatch_px": mism,
    }))


if __name__ == "__main__":
    main()
