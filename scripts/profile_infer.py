"""Profile the SHIPPED composed inference program, op by op.

Unlike profile_int8.py (pinned to the old 1024 tiling for the par.10
record), this takes the production defaults: auto tile plan
(default_tile_max), int8 + head-dot, bf16 blend — exactly what bench.py
times — and prints the per-op device timeline so the next lever is
visible.

Run alone on the TPU:
    python scripts/profile_infer.py --size 4096 --mode int8
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

from annonet_tpu.cli.common import apply_platform_env

apply_platform_env()

import jax
import numpy as np
import jax.numpy as jnp

from annonet_tpu.infer.core import TiledInferer
from annonet_tpu.infer.tiling import TilingParameters
from annonet_tpu.models.segnet import (
    SegNetConfig, fold_batchnorm, init_state, required_input_dimension,
)
from scripts.trace_util import load_device_ops


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--tile", type=int, default=None, help="max tile (default: auto)")
    ap.add_argument("--mode", choices=["int8", "float"], default="int8")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    from annonet_tpu.cli.common import default_tile_max
    tile = args.tile or default_tile_max()

    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    rp = fold_batchnorm(params, bn_stats, config)
    overlap = required_input_dimension(config)
    tiling = TilingParameters(tile, tile, overlap, overlap)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.integers(0, 256, size=(args.size, args.size, 3), dtype=np.uint8))
    float(jnp.max(image).astype(jnp.int32))

    inf = TiledInferer(rp, config, tiling,
                       quantize="int8" if args.mode == "int8" else None)
    labels, _ = inf.infer_arrays(image, device_output=True)
    float(jnp.max(labels).astype(jnp.int32))

    trace_dir = "/tmp/infer_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(args.iters):
            labels, _ = inf.infer_arrays(image, device_output=True)
        float(jnp.max(labels).astype(jnp.int32))

    ops, whole = load_device_ops(trace_dir, args.iters)
    total = sum(ms for ms, _ in ops)
    px = args.size * args.size / 1e6
    for name, ms in whole.items():
        print(f"WHOLE {name}: {ms:.3f} ms/iter  ({px / ms * 1000:.1f} Mpx/s)")
    print(f"sum-of-ops {total:.3f} ms/iter ({px / total * 1000:.1f} Mpx/s)")
    for ms, name in ops[: args.top]:
        print(f"{ms:8.3f} ms  {100 * ms / total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
