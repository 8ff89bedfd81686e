"""Stage-by-stage profiling of the tiled inference path on the current
device. Run on TPU: python scripts/profile_infer.py"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from annonet_tpu.models.segnet import (
    SegNetConfig,
    apply_runtime,
    fold_batchnorm,
    init_state,
    required_input_dimension,
)


def timed(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.monotonic()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    dt = (time.monotonic() - t0) / iters
    return out, dt


def main():
    print("devices:", jax.devices())
    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    runtime = fold_batchnorm(params, bn_stats, config)
    runtime = jax.tree_util.tree_map(jnp.asarray, runtime)
    print("required_input_dimension:", required_input_dimension(config))

    rng = np.random.default_rng(0)

    # 1. raw forward on one big batch of tiles
    for batch, size in [(1, 1024), (4, 1024), (8, 1024), (16, 512), (1, 4096)]:
        x = jnp.asarray(
            rng.integers(0, 256, size=(batch, size, size, 3), dtype=np.uint8)
        )
        fwd = jax.jit(lambda p, x: apply_runtime(p, x, config))
        try:
            _, dt = timed(fwd, runtime, x)
            mpx = batch * size * size / 1e6
            print(
                f"forward [{batch},{size},{size}]: {dt*1000:.1f} ms "
                f"-> {mpx/dt:.1f} Mpx/s"
            )
        except Exception as e:
            print(f"forward [{batch},{size},{size}]: FAILED {e}")

    # 2. blending scan alone
    from jax import lax

    hp = wp = 4224
    th = tw = 1024
    k = 3
    n = 32
    logits = jnp.asarray(rng.normal(size=(n, th, tw, k)).astype(np.float32))
    yx = jnp.asarray(
        rng.integers(0, hp - th, size=(n, 2)).astype(np.int32)
    )
    valid = jnp.ones((n,), jnp.float32)
    ramp = jnp.ones((th, tw), jnp.float32)

    def blend(logits, yx, valid):
        acc = jnp.zeros((hp, wp, k), jnp.float32)
        wsum = jnp.zeros((hp, wp, 1), jnp.float32)

        def body(carry, inputs):
            acc, wsum = carry
            lg, pos, v = inputs
            w = (ramp * v)[..., None]
            start = (pos[0], pos[1], 0)
            ap = lax.dynamic_slice(acc, start, (th, tw, k))
            acc = lax.dynamic_update_slice(acc, ap + w * lg, start)
            wp_ = lax.dynamic_slice(wsum, start, (th, tw, 1))
            wsum = lax.dynamic_update_slice(wsum, wp_ + w, start)
            return (acc, wsum), None

        (acc, wsum), _ = lax.scan(body, (acc, wsum), (logits, yx, valid))
        return jnp.argmax(acc / jnp.maximum(wsum, 1e-12), axis=-1)

    _, dt = timed(jax.jit(blend), logits, yx, valid)
    print(f"blend scan 32 tiles onto {hp}x{wp}: {dt*1000:.1f} ms")

    # 3. end-to-end current implementation
    from annonet_tpu.infer.core import TiledInferer, annonet_infer
    from annonet_tpu.infer.tiling import TilingParameters

    overlap = required_input_dimension(config)
    image = rng.integers(0, 256, size=(4096, 4096, 3), dtype=np.uint8)
    inferer = TiledInferer(
        runtime, config,
        TilingParameters(1024, 1024, overlap, overlap),
    )
    plan = inferer.plan(4096, 4096)
    print(f"plan: {plan.tile_count} tiles, "
          f"tile {plan.tile_height}x{plan.tile_width}, overlap {overlap}")
    annonet_infer(inferer, image)  # warmup
    t0 = time.monotonic()
    annonet_infer(inferer, image)
    dt = time.monotonic() - t0
    print(f"end-to-end 4096x4096: {dt*1000:.1f} ms -> {16.78/dt:.1f} Mpx/s")


if __name__ == "__main__":
    main()
