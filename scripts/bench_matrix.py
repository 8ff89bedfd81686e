"""Throughput across the reference's 8-config CI matrix, on hardware.

The reference's AppVeyor CI builds and tests LEVEL_COUNT in {0,1,2,3} x
{RGB, grayscale} (appveyor.yml:6-23) — those are its first-class model
configurations. This repo's perf work (DESIGN.md §15-28) was measured on
the flagship config (level 3, RGB); this script measures tiled-inference
throughput for EVERY config x {int8, bf16} so a regression or compile
pathology in a non-flagship config can't hide.

Methodology: CLAUDE.md scalar-sync timing (chain iters calls, read back one
scalar, subtract the measured scalar round trip). One process, one config
at a time; programs compile once per (config, quantize) pair.

Usage:  python scripts/bench_matrix.py [--image-size 2048] [--iters 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--levels", type=str, default="0,1,2,3")
    ap.add_argument("--quant", type=str, default="int8,none")
    ap.add_argument("--json-out", type=str, default=None)
    args = ap.parse_args()

    from annonet_tpu.cli.common import apply_platform_env, device_probe

    apply_platform_env()
    device_probe()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from annonet_tpu.infer.core import TiledInferer
    from annonet_tpu.models.segnet import SegNetConfig, fold_batchnorm, init_state

    rng = np.random.default_rng(0)
    size = args.image_size
    rgb = jnp.asarray(
        rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
    )
    gray = rgb[:, :, :1]
    float(jnp.max(rgb).astype(jnp.int32))  # finish the uploads
    float(jnp.max(gray).astype(jnp.int32))

    results = []
    for level in [int(x) for x in args.levels.split(",")]:
        for grayscale in (False, True):
            config = SegNetConfig(
                class_count=3, level_count=level, grayscale=grayscale,
                base_width=16,
            )
            params, bn_stats = init_state(jax.random.PRNGKey(0), config)
            runtime_params = fold_batchnorm(params, bn_stats, config)
            image = gray if grayscale else rgb
            for quant in args.quant.split(","):
                quantize = None if quant == "none" else quant
                tag = (f"L{level} {'gray' if grayscale else 'rgb'} "
                       f"{quant if quantize else 'bf16'}")
                inferer = TiledInferer(runtime_params, config,
                                       quantize=quantize)
                t_compile = time.monotonic()
                labels, _ = inferer.infer_arrays(image, device_output=True)
                float(jnp.max(labels).astype(jnp.int32))
                compile_s = time.monotonic() - t_compile
                # one more warm call (calibration done, programs cached)
                labels, _ = inferer.infer_arrays(image, device_output=True)
                float(jnp.max(labels).astype(jnp.int32))

                trivial = jax.jit(lambda a: a[0, 0].astype(jnp.int32))
                float(trivial(labels))
                t0 = time.monotonic()
                for _ in range(3):
                    float(trivial(labels))
                rtt = (time.monotonic() - t0) / 3

                mpx = size * size * args.iters / 1e6
                rates = []
                for _ in range(args.passes):
                    t0 = time.monotonic()
                    for _ in range(args.iters):
                        labels, _ = inferer.infer_arrays(
                            image, device_output=True
                        )
                    float(jnp.max(labels).astype(jnp.int32))
                    rates.append(
                        mpx / max(1e-9, time.monotonic() - t0 - rtt)
                    )
                med = sorted(rates)[len(rates) // 2]
                row = {
                    "level": level,
                    "input": "gray" if grayscale else "rgb",
                    "quant": quant if quantize else "bf16",
                    "mpx_per_s": round(med, 1),
                    "warm_call_s": round(compile_s, 1),
                    "rates": [round(r, 1) for r in rates],
                }
                results.append(row)
                print(f"{tag:>16}: {med:8.1f} Mpx/s  "
                      f"(first call incl. compile {compile_s:.1f} s; "
                      f"passes {['%.1f' % r for r in rates]})", flush=True)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json_out}", flush=True)


if __name__ == "__main__":
    main()
