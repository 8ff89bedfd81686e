"""Probe: does --image-batch pay at LARGE canvas sizes?

The batched path is recorded as the small-image throughput lever
(512^2 x32 ~1015 Mpx/s vs 538 single). At 4096^2 the single-image
program already fills the MXU with a 16-tile batch, so the open
question is whether batching M large images (tile batch M*16) buys
anything more (amortized blend/argmax glue, fewer dispatches) or
loses (HBM pressure, bigger relayouts).

Times the PUBLIC infer_arrays_batch path with device-resident outputs,
honest scalar-sync (CLAUDE.md): N chained dispatches, ONE scalar
readback, minus the measured scalar round trip. One TPU process at a
time.

Run: python scripts/probe_batch_large.py [--size 4096] [--batches 1 2 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=4096)
    parser.add_argument("--batches", type=int, nargs="*", default=[1, 2, 4])
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--level-count", type=int, default=3)
    parser.add_argument("--float", dest="quantize", action="store_false",
                        help="bf16 exact path instead of int8")
    args = parser.parse_args()

    from annonet_tpu.cli.common import apply_platform_env

    apply_platform_env()  # ANNONET_TPU_PLATFORM pins the backend

    import jax
    import jax.numpy as jnp
    import numpy as np

    from annonet_tpu.infer.core import TiledInferer
    from annonet_tpu.models.segnet import (
        SegNetConfig,
        fold_batchnorm,
        init_state,
    )

    config = SegNetConfig(class_count=3, level_count=args.level_count,
                          base_width=16)
    params, bn = init_state(jax.random.PRNGKey(0), config)
    runtime = fold_batchnorm(params, bn, config)

    rng = np.random.default_rng(0)
    images = rng.integers(
        0, 256, size=(max(args.batches), args.size, args.size, 3),
        dtype=np.uint8,
    )

    trivial = jax.jit(lambda a: a + 1.0)
    z = jnp.float32(0.0)
    float(trivial(z))
    t0 = time.monotonic()
    for _ in range(3):
        float(trivial(z))
    rtt = (time.monotonic() - t0) / 3
    print(f"rtt {rtt * 1000:.1f} ms", flush=True)

    inferer = TiledInferer(
        runtime, config, quantize="int8" if args.quantize else None
    )
    # upload once; batch calls slice device-resident inputs
    dev_images = jnp.asarray(images)

    results = {}
    for m in args.batches:
        batch = dev_images[:m]
        # warm: plan + compile + (int8) calibration
        for _ in range(2):
            labels, _ = inferer.infer_arrays_batch(
                batch, device_output=True, pad_to_bucket=False
            )
            float(jnp.max(labels).astype(jnp.int32))
        results[m] = []

    mpx1 = args.size * args.size / 1e6
    for _r in range(args.rounds):
        for m in args.batches:
            batch = dev_images[:m]
            t0 = time.monotonic()
            for _ in range(args.iters):
                labels, _ = inferer.infer_arrays_batch(
                    batch, device_output=True, pad_to_bucket=False
                )
            float(jnp.max(labels).astype(jnp.int32))
            dt = time.monotonic() - t0 - rtt
            rate = m * mpx1 * args.iters / dt
            results[m].append(rate)
            print(f"M={m}: {rate:7.1f} Mpx/s "
                  f"({dt / args.iters / m * 1000:6.2f} ms/image)",
                  flush=True)

    print("\nmedians:")
    for m in args.batches:
        med = sorted(results[m])[len(results[m]) // 2]
        print(f"  M={m}: {med:7.1f} Mpx/s")


if __name__ == "__main__":
    main()
