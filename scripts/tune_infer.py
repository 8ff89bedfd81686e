"""Honest per-stage tuning of tiled inference on TPU (scalar-sync timing,
device-resident inputs). Avoids whole-image forward compiles (wedge risk)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from annonet_tpu.infer.core import TiledInferer
from annonet_tpu.infer.tiling import TilingParameters
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
    float(jnp.max(jnp.ravel(out)[0]).astype(jnp.float32))  # warm + compile
    t0 = time.monotonic()
    for _ in range(2):
        float(jnp.ravel(args[0] if hasattr(args[0], "shape") else out)[0].astype(jnp.float32))
    rtt = (time.monotonic() - t0) / 2
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.max(jnp.ravel(out)[0]).astype(jnp.float32))
    return max(1e-9, (time.monotonic() - t0 - rtt) / iters)


def main():
    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    runtime = jax.tree_util.tree_map(
        jnp.asarray, fold_batchnorm(params, bn_stats, config)
    )
    overlap = required_input_dimension(config)
    rng = np.random.default_rng(0)

    # ---- stage: forward only, chunked exactly like the pipeline
    for n, tile, chunk in [(25, 1024, 5), (9, 2048, 3)]:
        x = jnp.asarray(
            rng.integers(0, 256, size=(n, tile, tile, 3), dtype=np.uint8)
        )

        def fwd(x):
            xs = x.reshape(n // chunk, chunk, tile, tile, 3)
            return lax.map(
                lambda b: apply_runtime(runtime, b, config), xs
            )

        dt = measure(jax.jit(fwd), x)
        mpx = n * tile * tile / 1e6
        print(f"forward {n}x{tile} (chunk {chunk}): {dt*1000:.1f} ms "
              f"({mpx/dt:.0f} Mpx/s tile px)", flush=True)

    # ---- stage: gather + blend + argmax WITHOUT the net (identity logits)
    for tile in (1024, 2048):
        inferer = TiledInferer(
            runtime, config, TilingParameters(tile, tile, overlap, overlap)
        )
        plan = inferer.plan(IMAGE, IMAGE)
        n = plan.tile_count
        logits = jnp.asarray(
            rng.normal(size=(n, plan.tile_height, plan.tile_width, 3)).astype(
                np.float32
            )
        )
        from annonet_tpu.infer.tiling import inverse_weight_sum, ramp_weights

        ramp = jnp.asarray(
            ramp_weights(plan.tile_height, plan.tile_width, overlap, overlap)
        )
        inv_wsum = jnp.asarray(inverse_weight_sum(plan))

        def blend(logits):
            cf = jnp.transpose(logits, (0, 3, 1, 2)) * ramp[None, None]
            acc = jnp.zeros(
                (3, plan.padded_height, plan.padded_width), jnp.float32
            )
            for i, (y, x_) in enumerate(plan.tile_yx):
                acc = acc.at[
                    :, y : y + plan.tile_height, x_ : x_ + plan.tile_width
                ].add(cf[i])
            blended = acc * inv_wsum[None]
            return jnp.argmax(blended, axis=0).astype(jnp.uint8)

        dt = measure(jax.jit(blend), logits)
        print(f"blend+argmax tile {tile} ({n} tiles): {dt*1000:.1f} ms",
              flush=True)

        # pallas variant
        from annonet_tpu.ops.pallas_blend import blend_accumulate

        yx = jnp.asarray(np.array(plan.tile_yx, np.int32))

        def blend_pallas(logits):
            cf = jnp.transpose(logits, (0, 3, 1, 2))
            acc = blend_accumulate(
                cf, yx, ramp,
                padded_h=plan.padded_height, padded_w=plan.padded_width,
            )
            blended = acc * inv_wsum[None]
            return jnp.argmax(blended, axis=0).astype(jnp.uint8)

        try:
            dt = measure(jax.jit(blend_pallas), logits)
            print(f"pallas blend+argmax tile {tile}: {dt*1000:.1f} ms",
                  flush=True)
        except Exception as e:
            print(f"pallas blend tile {tile} FAILED: {type(e).__name__}",
                  flush=True)

    # ---- full pipeline at tile sizes
    image = jnp.asarray(
        rng.integers(0, 256, size=(IMAGE, IMAGE, 3), dtype=np.uint8)
    )
    float(jnp.max(image).astype(jnp.int32))
    for tile in (1024, 2048):
        for pallas in (False, True):
            inferer = TiledInferer(
                runtime, config,
                TilingParameters(tile, tile, overlap, overlap),
                use_pallas_blend=pallas,
            )

            def full(img):
                labels, _ = inferer.infer_arrays(img, device_output=True)
                return labels

            try:
                dt = measure(full, image)
                print(
                    f"FULL tile {tile} pallas={pallas}: {dt*1000:.1f} ms "
                    f"-> {IMAGE*IMAGE/1e6/dt:.1f} Mpx/s", flush=True)
            except Exception as e:
                print(f"FULL tile {tile} pallas={pallas} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
