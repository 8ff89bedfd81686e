"""Honest (scalar-sync) tuning of the tiled-inference pipeline on TPU.

Measures, for several tile sizes: the full pipeline, the forward alone, and
the blend alone, using the chained-iterations + scalar-readback methodology
(see bench.py docstring — block_until_ready does not block on this harness).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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
ITERS = 8


def sync(arr):
    return float(jnp.max(arr).astype(jnp.float32))


def measure(fn, *args, iters=ITERS):
    out = fn(*args)
    sync(out)  # warm
    trivial = jax.jit(lambda a: jnp.max(a).astype(jnp.float32))
    float(trivial(args[-1] if hasattr(args[-1], "shape") else out))
    t0 = time.monotonic()
    for _ in range(2):
        float(trivial(out))
    rtt = (time.monotonic() - t0) / 2
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return max(1e-9, (time.monotonic() - t0 - rtt) / iters)


def main():
    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    runtime = jax.tree_util.tree_map(jnp.asarray, fold_batchnorm(params, bn_stats, config))
    overlap = required_input_dimension(config)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, size=(IMAGE, IMAGE, 3), dtype=np.uint8)
    mpx = IMAGE * IMAGE / 1e6

    # forward-only at various batch/tile geometries
    for batch, size in [(25, 1024), (9, 2048), (1, 4224)]:
        x = jnp.asarray(
            rng.integers(0, 256, size=(batch, size, size, 3), dtype=np.uint8)
        )
        fwd = jax.jit(lambda p, a: apply_runtime(p, a, config))
        dt = measure(fwd, runtime, x, iters=4)
        tile_mpx = batch * size * size / 1e6
        print(
            f"forward [{batch}x{size}]: {dt*1000:.1f} ms "
            f"({tile_mpx/dt:.0f} Mpx/s of tile pixels)"
        )

    for tile in (1024, 2048, 4096):
        inferer = TiledInferer(
            runtime, config,
            TilingParameters(tile, tile, overlap, overlap),
        )
        plan = inferer.plan(IMAGE, IMAGE)

        def full(img):
            labels, _ = inferer.infer_arrays(img, device_output=True)
            return labels

        dt = measure(full, image)
        print(
            f"tile {tile}: {plan.tile_count} tiles "
            f"{plan.tile_height}x{plan.tile_width}, "
            f"canvas {plan.padded_height}: {dt*1000:.1f} ms "
            f"-> {mpx/dt:.1f} Mpx/s"
        )


if __name__ == "__main__":
    main()
