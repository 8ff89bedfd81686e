"""Probe: lone small-image inference — where do the 4 ms go, what wins?

A single 512^2 image runs at ~65 Mpx/s (round 2) vs 988 batched: the
embeddable annonet_infer(inferer, image) call (annonet_infer.h:15-17)
pays batch-1 underutilization. Candidate fixes:

  * tile-split: plan SMALLER tiles for one small image so the forward is
    an [N>1] batch (overlap redundancy vs utilization trade);
  * measure the pure device cost vs the per-call dispatch overhead
    (chained device-side loop vs one dispatch per image).

Each variant times the inferer's ACTUAL compiled tiled-forward program
(quantize/folding exactly as shipped) with chained iterations and one
scalar readback. One TPU process at a time.

Run: python scripts/probe_small_image.py [--size 512] [--quantize]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--level-count", type=int, default=3)
    parser.add_argument("--quantize", action="store_true")
    parser.add_argument("--tile-sizes", type=int, nargs="*",
                        default=[1024, 512, 384, 320, 288, 256, 192])
    args = parser.parse_args()

    import jax

    import os as _os
    if _os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon plugin pre-sets jax_platforms, overriding the env
        jax.config.update("jax_platforms", "cpu")
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

    config = SegNetConfig(class_count=3, level_count=args.level_count,
                          base_width=16)
    params, bn = init_state(jax.random.PRNGKey(0), config)
    runtime = fold_batchnorm(params, bn, config)
    overlap = required_input_dimension(config)
    rng = np.random.default_rng(0)
    image = rng.integers(
        0, 256, size=(args.size, args.size, 3), dtype=np.uint8
    )

    trivial = jax.jit(lambda a: a + 1.0)
    z = jnp.float32(0.0)
    float(trivial(z))
    t0 = time.monotonic()
    for _ in range(3):
        float(trivial(z))
    rtt = (time.monotonic() - t0) / 3
    print(f"rtt {rtt * 1000:.1f} ms", flush=True)

    px = args.size * args.size

    for tile in args.tile_sizes:
        if tile < overlap + 8:
            continue
        tiling = TilingParameters(tile, tile, overlap, overlap)
        inferer = TiledInferer(
            runtime, config, tiling,
            quantize="int8" if args.quantize else None,
        )
        # warm: builds plan, folds, compiles, calibrates (if int8)
        labels, _ = inferer.infer_arrays(image)
        plan = inferer.plan(args.size, args.size)

        # fetch the exact compiled program + constants the inferer used
        (fn,) = [
            v for k, v in inferer._compiled.items() if k[-1] == 0
        ]
        fold0 = next(iter(
            k[6] for k in inferer._compiled.keys() if k[-1] == 0
        ))
        quantized = any(
            k[8] for k in inferer._compiled.keys() if k[-1] == 0
        )
        if quantized:
            exec_params = inferer._quantized_cache[fold0][1]
        elif fold0:
            exec_params = inferer._get_folded(fold0)[1]
        else:
            exec_params = inferer.params
        ramp, inv_wsum = inferer._plan_constants[plan]
        gains = jnp.zeros(config.class_count, jnp.float32)
        det = jnp.zeros(config.class_count, jnp.float32)
        img_padded = np.pad(
            image,
            (
                (0, min(plan.padded_height, ((args.size + 31) // 32) * 32)
                 - args.size),
                (0, min(plan.padded_width, ((args.size + 31) // 32) * 32)
                 - args.size),
                (0, 0),
            ),
            mode="edge",
        )
        img_dev = jnp.asarray(img_padded)

        @jax.jit
        def chained(acc):
            # serialize iterations: the input depends on the carry
            img = img_dev + (acc * 0).astype(jnp.uint8)
            out = fn(exec_params, img, gains, det, ramp, inv_wsum)
            return acc + out.astype(jnp.float32).sum() * 1e-9

        float(chained(z))  # compile the wrapper
        acc = z
        t0 = time.monotonic()
        for _ in range(args.iters):
            acc = chained(acc)
        float(acc)
        per = max(1e-9, time.monotonic() - t0 - rtt) / args.iters

        # one-dispatch-per-image pattern (the real embeddable call):
        # time infer_arrays with device_output, chaining impossible, so
        # report dispatch-inclusive number separately (tunnel-noisy)
        t0 = time.monotonic()
        for _ in range(args.iters):
            out, _ = inferer.infer_arrays(image, device_output=True)
        jax.block_until_ready(out)
        per_call = (time.monotonic() - t0) / args.iters

        print(
            f"tile={tile}: plan {plan.tile_count} x "
            f"{plan.tile_height}x{plan.tile_width}, device "
            f"{per * 1000:.2f} ms ({px / per / 1e6:.0f} Mpx/s), "
            f"per-call {per_call * 1000:.2f} ms "
            f"({px / per_call / 1e6:.0f} Mpx/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
