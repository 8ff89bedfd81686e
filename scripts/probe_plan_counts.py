"""Per-plan composed rate vs tile-grid COUNT at a fixed canvas.

The 3000^2 autotune report (docs/DESIGN.md par.23) showed the same
1072^2 tile shape running 740 Mpx/s (device px) as a 16-tile batch at
4096^2 but ~327 as a 9-tile batch at 3072^2 — suggesting the conv
batch dimension (the tile count) has its own rate cliffs, independent
of tile shape. This probe pins plans by explicit grid count via
plan_for_counts + the inferer's _plan_override and measures each
composed program (bench methodology).

Run alone on the TPU:  python scripts/probe_plan_counts.py --size 3000
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from annonet_tpu.cli.common import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from annonet_tpu.infer.core import TiledInferer
from annonet_tpu.infer.tiling import TilingParameters, plan_for_counts
from annonet_tpu.models.segnet import (
    SegNetConfig,
    fold_batchnorm,
    init_state,
    required_input_dimension,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=3000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument(
        "--counts", type=int, nargs="*", default=None,
        help="grid counts per axis pairs, flat: ny nx ny nx ...",
    )
    args = ap.parse_args()
    size = args.size
    counts = args.counts or [3, 3, 3, 4, 4, 3, 4, 4, 2, 2, 5, 5]
    pairs = list(zip(counts[::2], counts[1::2]))

    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn = init_state(jax.random.PRNGKey(0), config)
    rp = fold_batchnorm(params, bn, config)
    ov = required_input_dimension(config)
    # max tile raised so denser AND sparser counts are all representable
    tiling = TilingParameters(8192, 8192, ov, ov)
    inferer = TiledInferer(rp, config, tiling, quantize="int8")

    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
    from annonet_tpu.infer.tiling import bucket_dim

    h_b, w_b = bucket_dim(size, 128), bucket_dim(size, 128)
    padded = np.pad(
        image, ((0, h_b - size), (0, w_b - size), (0, 0)), mode="edge"
    )
    img_dev = jnp.asarray(padded)

    def sync(arr):
        return float(jnp.max(arr).astype(jnp.int32))

    sync(img_dev)

    trivial = jax.jit(lambda a: a[0, 0].astype(jnp.int32))
    for ny, nx in pairs:
        plan = plan_for_counts(
            size, size, config, tiling, ny, nx, lane_align_tiles=False
        )
        if plan is None:
            print(f"count {ny}x{nx}: no valid plan")
            continue
        inferer._plan_override = plan
        try:
            # warm-up with the HOST array (compiles; first plan also runs
            # int8 calibration, whose walkers expect host pixels)
            labels, _ = inferer.infer_arrays(padded, device_output=True)
            sync(labels)
            float(trivial(labels))
            t0 = time.monotonic()
            for _ in range(3):
                float(trivial(labels))
            rtt = (time.monotonic() - t0) / 3
            rates = []
            for _ in range(3):
                t0 = time.monotonic()
                for _ in range(args.iters):
                    labels, _ = inferer.infer_arrays(
                        img_dev, device_output=True
                    )
                sync(labels)
                el = max(1e-9, time.monotonic() - t0 - rtt)
                rates.append(size * size * args.iters / 1e6 / el)
        finally:
            inferer._plan_override = None
        med = sorted(rates)[1]
        dev_px = plan.tile_count * plan.tile_height * plan.tile_width
        dev_rate = med * dev_px / (size * size)
        print(
            f"count {ny}x{nx}: tile {plan.tile_height}x{plan.tile_width} "
            f"n={plan.tile_count}: {med:.1f} Mpx/s image "
            f"({dev_rate:.0f} device-px)",
            flush=True,
        )


if __name__ == "__main__":
    main()
