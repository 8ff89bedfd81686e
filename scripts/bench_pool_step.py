"""A/B: fused train step fed by the device image pool vs pre-staged pixels.

Answers two questions for the round-3 device-resident data path:
  1. what does the on-device crop gather add to the 20.6 ms fused step?
     (pool path: crops gathered from the HBM pool inside the step)
  2. what does the per-step host->device pixel upload cost on this host?
     (pixel path timed BOTH with pre-staged device arrays — pure step —
     and with a fresh numpy upload per step — the real CLI pattern)

Honest scalar-sync methodology (CLAUDE.md): chain iters, read ONE scalar,
subtract the measured round trip.

Run: python scripts/bench_pool_step.py [--batch 128] [--dim 192]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--dim", type=int, default=192)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--level-count", type=int, default=3)
    parser.add_argument("--images", type=int, default=8)
    parser.add_argument("--image-size", type=int, default=1024)
    args = parser.parse_args()

    import jax

    import os as _os
    if _os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon plugin pre-sets jax_platforms, overriding the env
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from annonet_tpu.data.crop import CropOptions
    from annonet_tpu.models.segnet import SegNetConfig, init_state
    from annonet_tpu.train.device_cache import DeviceImagePool
    from annonet_tpu.train.trainer import (
        TrainerConfig,
        make_fused_pool_step,
        make_fused_train_step,
    )

    config = SegNetConfig(
        class_count=3, level_count=args.level_count, base_width=16
    )
    trainer_config = TrainerConfig()
    crop_options = CropOptions(
        dim=args.dim,
        allow_flip_left_right=True,
        allow_flip_upside_down=True,
        multiplicative_brightness_change_probability=0.5,
        noise_level_stddev=2.0,
        allow_random_color_offset=True,
    )

    rng = np.random.default_rng(0)

    class FakeSample:
        def __init__(self):
            self.input_image = rng.integers(
                0, 256,
                size=(args.image_size, args.image_size, 3), dtype=np.uint8,
            )
            self.label_image = rng.integers(
                0, 3, size=(args.image_size, args.image_size),
            ).astype(np.uint16)

    pool = DeviceImagePool(slots=args.images)
    samples = [FakeSample() for _ in range(args.images)]
    t0 = time.monotonic()
    pool.ensure(samples)
    jax.block_until_ready(pool.images)
    upload_s = time.monotonic() - t0
    print(
        f"pool upload: {args.images} x {args.image_size}^2 "
        f"({pool.upload_bytes / 1e6:.0f} MB) in {upload_s:.2f} s",
        flush=True,
    )

    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    velocity = jax.tree_util.tree_map(jnp.zeros_like, params)
    lr = jnp.float32(0.1)
    key = jax.random.PRNGKey(1)

    def decisions():
        slot = rng.integers(0, args.images, size=args.batch).astype(np.int32)
        y0 = rng.integers(
            -8, args.image_size - args.dim + 8, size=args.batch
        ).astype(np.int32)
        x0 = rng.integers(
            -8, args.image_size - args.dim + 8, size=args.batch
        ).astype(np.int32)
        vh = np.full(args.batch, args.image_size, np.int32)
        vw = np.full(args.batch, args.image_size, np.int32)
        return slot, y0, x0, vh, vw

    pool_step = jax.jit(
        make_fused_pool_step(config, trainer_config, crop_options, args.dim)
    )
    pixel_step = jax.jit(
        make_fused_train_step(config, trainer_config, crop_options)
    )

    images_np = rng.integers(
        0, 256, size=(args.batch, args.dim, args.dim, 3), dtype=np.uint8
    )
    labels_np = rng.integers(
        0, 3, size=(args.batch, args.dim, args.dim)
    ).astype(np.uint16)
    images_dev = jnp.asarray(images_np)
    labels_dev = jnp.asarray(labels_np)

    # warm-up compiles
    s, y, x, vh, vw = decisions()
    out = pool_step(
        params, bn_stats, velocity, lr, jnp.float32(0.0), key,
        pool.images, pool.labels, np.stack([s, y, x, vh, vw]),
    )
    float(out[3])
    out = pixel_step(
        params, bn_stats, velocity, lr, jnp.float32(0.0), key,
        images_dev, labels_dev,
    )
    float(out[3])

    trivial = jax.jit(lambda a: a + 1.0)
    float(trivial(out[3]))
    t0 = time.monotonic()
    for _ in range(3):
        float(trivial(out[3]))
    rtt = (time.monotonic() - t0) / 3
    print(f"scalar round trip: {rtt * 1000:.1f} ms", flush=True)

    # PRE-SPLIT keys: a host-side jax.random.split inside the timed loop
    # is its own tiny dispatch (~30-40 ms round trip on a degraded
    # tunnel) and would mask the variants' real differences
    subkeys = [jax.random.PRNGKey(500 + i) for i in range(args.iters)]
    for k_ in subkeys:
        k_.block_until_ready()

    def timed(run_iter):
        p, b, v = params, bn_stats, velocity
        t0 = time.monotonic()
        for i in range(args.iters):
            p, b, v, loss = run_iter(p, b, v, subkeys[i])
        float(loss)
        return max(1e-9, time.monotonic() - t0 - rtt) / args.iters

    def pool_iter(p, b, v, sub):
        s, y, x, vh, vw = decisions()
        return pool_step(
            p, b, v, lr, jnp.float32(0.99), sub,
            pool.images, pool.labels, np.stack([s, y, x, vh, vw]),
        )

    def pixel_iter_staged(p, b, v, sub):
        return pixel_step(
            p, b, v, lr, jnp.float32(0.99), sub, images_dev, labels_dev
        )

    def pixel_iter_upload(p, b, v, sub):
        return pixel_step(
            p, b, v, lr, jnp.float32(0.99), sub,
            jnp.asarray(images_np), jnp.asarray(labels_np),
        )

    # split variant: gather as its OWN program, then the pixel step — the
    # program boundary stops XLA fusing the pool windows into the conv
    # stack (composed-vs-isolated, DESIGN.md §6)
    from annonet_tpu.ops.crop_gather import gather_crops

    gather_fn = jax.jit(
        lambda pi, pl, s, y, x, vh, vw: gather_crops(
            pi, pl, s, y, x, vh, vw, dim=args.dim
        )
    )

    def pool_iter_split(p, b, v, sub):
        s, y, x, vh, vw = decisions()
        img, lab = gather_fn(
            pool.images, pool.labels,
            jnp.asarray(s), jnp.asarray(y), jnp.asarray(x),
            jnp.asarray(vh), jnp.asarray(vw),
        )
        return pixel_step(p, b, v, lr, jnp.float32(0.99), sub, img, lab)

    out = pool_iter_split(params, bn_stats, velocity, key)
    float(out[3])

    # barrier variant: gather + step in ONE program, with
    # lax.optimization_barrier between them — tests whether the barrier
    # alone stops the pathological gather-into-convs fusion that makes
    # the plain fused pool step 5x slower (one host dispatch instead of
    # two if it works)
    from jax import lax as _lax

    def pool_barrier(p, b, v, lr_, mom, sub, pi, pl, s, y, x, vh, vw):
        img, lab = gather_crops(pi, pl, s, y, x, vh, vw, dim=args.dim)
        img, lab = _lax.optimization_barrier((img, lab))
        return pixel_step_inner(p, b, v, lr_, mom, sub, img, lab)

    pixel_step_inner = make_fused_train_step(
        config, trainer_config, crop_options
    )
    pool_barrier_step = jax.jit(pool_barrier)

    def pool_iter_barrier(p, b, v, sub):
        s, y, x, vh, vw = decisions()
        return pool_barrier_step(
            p, b, v, lr, jnp.float32(0.99), sub,
            pool.images, pool.labels,
            jnp.asarray(s), jnp.asarray(y), jnp.asarray(x),
            jnp.asarray(vh), jnp.asarray(vw),
        )

    out = pool_iter_barrier(params, bn_stats, velocity, key)
    float(out[3])

    results = {}
    for name, it in (
        ("pool", pool_iter),
        ("pool_barrier", pool_iter_barrier),
        ("pool_split", pool_iter_split),
        ("pixels_staged", pixel_iter_staged),
        ("pixels_upload", pixel_iter_upload),
    ):
        per_step = timed(it)
        results[name] = per_step
        print(
            f"{name}: {per_step * 1000:.2f} ms/step, "
            f"{args.batch / per_step:.0f} crops/s",
            flush=True,
        )

    print(
        json.dumps(
            {
                "metric": "pool_step_overhead",
                "pool_ms": round(results["pool"] * 1000, 2),
                "pool_barrier_ms": round(
                    results["pool_barrier"] * 1000, 2
                ),
                "pool_split_ms": round(results["pool_split"] * 1000, 2),
                "pixels_staged_ms": round(
                    results["pixels_staged"] * 1000, 2
                ),
                "pixels_upload_ms": round(
                    results["pixels_upload"] * 1000, 2
                ),
                "batch": args.batch,
                "dim": args.dim,
            }
        )
    )


if __name__ == "__main__":
    main()
