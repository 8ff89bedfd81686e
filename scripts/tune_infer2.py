"""Stage-2 tuning: blend variants + forward chunking (honest timing)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from annonet_tpu.infer.core import TiledInferer
from annonet_tpu.infer.tiling import (
    TilingParameters,
    inverse_weight_sum,
    ramp_weights,
)
from annonet_tpu.models.segnet import (
    SegNetConfig,
    apply_runtime,
    fold_batchnorm,
    init_state,
    required_input_dimension,
)

IMAGE = 4096


def measure(fn, *args, iters=6):
    out = fn(*args)
    jnp.ravel(out)[0].item()
    t0 = time.monotonic()
    for _ in range(2):
        jnp.ravel(out)[0].item()
    rtt = (time.monotonic() - t0) / 2
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn(*args)
    jnp.ravel(out)[0].item()
    return max(1e-9, (time.monotonic() - t0 - rtt) / iters)


def main():
    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    runtime = jax.tree_util.tree_map(
        jnp.asarray, fold_batchnorm(params, bn_stats, config)
    )
    overlap = required_input_dimension(config)
    rng = np.random.default_rng(0)

    inferer = TiledInferer(
        runtime, config, TilingParameters(1024, 1024, overlap, overlap)
    )
    plan = inferer.plan(IMAGE, IMAGE)
    n, th, tw = plan.tile_count, plan.tile_height, plan.tile_width
    hp, wp = plan.padded_height, plan.padded_width
    print(f"plan: {n} tiles {th}x{tw} on {hp}x{wp}", flush=True)

    ramp = jnp.asarray(ramp_weights(th, tw, overlap, overlap))
    inv_wsum = jnp.asarray(inverse_weight_sum(plan))
    logits = jnp.asarray(
        rng.normal(size=(n, th, tw, 3)).astype(np.float32)
    )

    # A: transpose alone
    def tr(lg):
        return jnp.transpose(lg, (0, 3, 1, 2)) + 0.0

    print(f"transpose NHWC->NCHW: {measure(jax.jit(tr), logits)*1000:.1f} ms",
          flush=True)

    # B: full XLA blend (current default)
    def blend_xla(lg):
        cf = jnp.transpose(lg, (0, 3, 1, 2)) * ramp[None, None]
        acc = jnp.zeros((3, hp, wp), jnp.float32)
        for i, (y, x_) in enumerate(plan.tile_yx):
            acc = acc.at[:, y : y + th, x_ : x_ + tw].add(cf[i])
        return jnp.argmax(acc * inv_wsum[None], axis=0).astype(jnp.uint8)

    print(f"XLA blend+argmax: {measure(jax.jit(blend_xla), logits)*1000:.1f} ms",
          flush=True)

    # C: pallas blend
    from annonet_tpu.ops.pallas_blend import blend_accumulate

    yx = jnp.asarray(np.array(plan.tile_yx, np.int32))

    def blend_pl(lg):
        cf = jnp.transpose(lg, (0, 3, 1, 2))
        acc = blend_accumulate(cf, yx, ramp, padded_h=hp, padded_w=wp)
        return jnp.argmax(acc * inv_wsum[None], axis=0).astype(jnp.uint8)

    try:
        print(f"pallas blend+argmax: {measure(jax.jit(blend_pl), logits)*1000:.1f} ms",
              flush=True)
    except Exception as e:
        print(f"pallas blend FAILED: {type(e).__name__}: {e}", flush=True)

    # D: gather stage alone (uint8 image -> tile stack)
    image = jnp.asarray(
        rng.integers(0, 256, size=(hp, wp, 3), dtype=np.uint8)
    )

    def gather(img):
        return jnp.stack(
            [
                lax.slice(img, (y, x_, 0), (y + th, x_ + tw, 3))
                for (y, x_) in plan.tile_yx
            ]
        )

    print(f"gather {n} tiles: {measure(jax.jit(gather), image)*1000:.1f} ms",
          flush=True)

    # E: forward chunk variants
    tiles = jnp.asarray(
        rng.integers(0, 256, size=(n, th, tw, 3), dtype=np.uint8)
    )
    for chunk in (1, 5, 25):
        if n % chunk:
            continue

        def fwd(x, chunk=chunk):
            if chunk == n:
                return apply_runtime(runtime, x, config)
            xs = x.reshape(n // chunk, chunk, th, tw, 3)
            return lax.map(lambda b: apply_runtime(runtime, b, config), xs)

        try:
            dt = measure(jax.jit(fwd), tiles, iters=4)
            print(f"forward chunk {chunk}: {dt*1000:.1f} ms", flush=True)
        except Exception as e:
            print(f"forward chunk {chunk} FAILED: {type(e).__name__}",
                  flush=True)


if __name__ == "__main__":
    main()
