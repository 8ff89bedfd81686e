"""Training-throughput benchmark (honest scalar-sync timing; see bench.py).

Measures the fused raw-crop train step (augment + weighting + fwd/bwd + SGD
in one XLA program) in crops/s and Mpx/s on the current device.

Run: python scripts/bench_train.py [--batch 32] [--dim 192] [--iters 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--dim", type=int, default=192)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--level-count", type=int, default=3)
    parser.add_argument("--remat", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from annonet_tpu.data.crop import CropOptions
    from annonet_tpu.models.segnet import SegNetConfig, init_state
    from annonet_tpu.train.trainer import TrainerConfig, make_fused_train_step

    config = SegNetConfig(
        class_count=3, level_count=args.level_count, base_width=16
    )
    trainer_config = TrainerConfig(remat=args.remat)
    crop_options = CropOptions(
        dim=args.dim,
        allow_flip_left_right=True,
        allow_flip_upside_down=True,
        multiplicative_brightness_change_probability=0.5,
        noise_level_stddev=2.0,
        allow_random_color_offset=True,
    )
    step = jax.jit(
        make_fused_train_step(config, trainer_config, crop_options)
    )

    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    velocity = jax.tree_util.tree_map(jnp.zeros_like, params)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(
            0, 256, size=(args.batch, args.dim, args.dim, 3), dtype=np.uint8
        )
    )
    labels = jnp.asarray(
        rng.integers(0, 3, size=(args.batch, args.dim, args.dim)).astype(
            np.int32
        )
    )
    lr = jnp.float32(0.1)
    key = jax.random.PRNGKey(1)

    # warm-up/compile, then honest chained timing with one scalar readback
    params, bn_stats, velocity, loss = step(
        params, bn_stats, velocity, lr, jnp.float32(0.0), key, images, labels
    )
    float(loss)

    trivial = jax.jit(lambda a: a + 1.0)
    float(trivial(loss))
    t0 = time.monotonic()
    for _ in range(3):
        float(trivial(loss))
    rtt = (time.monotonic() - t0) / 3

    # PRE-SPLIT keys and hoist scalars: a jax.random.split or an eager
    # jnp.float32(x) inside the timed loop is one extra host->device
    # round trip PER ITERATION (~30-40 ms each on the tunneled dev box)
    # and misread the 20 ms step as ~110 ms (docs/ROUND3.md measurement
    # discipline; the shipped Trainer folds the key into the step)
    subs = list(jax.random.split(key, args.iters))
    momentum = jnp.float32(0.99)
    # force key/scalar uploads to finish before the timed loop
    float(jnp.max(jnp.stack(subs)).astype(jnp.float32) + momentum)
    t0 = time.monotonic()
    for i in range(args.iters):
        params, bn_stats, velocity, loss = step(
            params, bn_stats, velocity, lr, momentum, subs[i], images,
            labels
        )
    final_loss = float(loss)  # forces completion of the whole chain
    elapsed = max(1e-9, time.monotonic() - t0 - rtt)

    per_step = elapsed / args.iters
    crops_per_s = args.batch / per_step
    mpx_per_s = args.batch * args.dim * args.dim / per_step / 1e6
    print(
        json.dumps(
            {
                "metric": "train_step_throughput",
                "value": round(mpx_per_s, 3),
                "unit": "Mpx/s/chip",
                "crops_per_s": round(crops_per_s, 2),
                "ms_per_step": round(per_step * 1000, 2),
                "batch": args.batch,
                "dim": args.dim,
                "remat": args.remat,
                "final_loss": round(final_loss, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
