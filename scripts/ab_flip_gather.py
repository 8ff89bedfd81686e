"""A/B: flips inside the pool gather's permutation matmuls vs in-step.

DESIGN.md par.17 attributed ~0.9 ms/step to the flip augmentation's
materialized ``reverse`` copies of the [128,192,192,16] stem tensors and
predicted they could ride the crop gather's permutation matmuls for free
(a mirrored permutation costs the same MXU pass as the identity).
This measures that claim the honest way (the par.16 lesson): compile BOTH
one-program pool steps AOT — the shipped flips-in-gather program and the
old composition (plain gather + augment_batch flips) — trace 3 real
executions of each, and report whole-program device-timeline ms plus the
per-op flip/gather attribution.

Run alone on the TPU:  python -u scripts/ab_flip_gather.py
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_util import load_device_ops


def device_ms(trace_dir, program_hint):
    """Whole-program + per-op device ms per step (3 steps/trace)."""
    all_ops, whole_map = load_device_ops(trace_dir, 3)
    whole = next(
        (v for k, v in whole_map.items() if program_hint in k), 0.0
    )
    op_sum = sum(m for m, _ in all_ops)
    ops = [(m, n) for m, n in all_ops if m >= 0.05]
    return whole, op_sum, ops


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--dim", type=int, default=192)
    parser.add_argument("--level-count", type=int, default=3)
    parser.add_argument("--images", type=int, default=8)
    parser.add_argument("--image-size", type=int, default=1024)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from annonet_tpu.data.crop import CropOptions
    from annonet_tpu.models.segnet import SegNetConfig, init_state
    from annonet_tpu.ops.crop_gather import gather_crops_packed
    from annonet_tpu.train.device_cache import DeviceImagePool
    from annonet_tpu.train.trainer import (
        TrainerConfig,
        make_fused_pool_step,
        make_fused_train_step,
    )

    config = SegNetConfig(
        class_count=3, level_count=args.level_count, base_width=16
    )
    tc = TrainerConfig()
    co = CropOptions(
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
    pool.ensure([FakeSample() for _ in range(args.images)])
    jax.block_until_ready(pool.images)
    print("pool uploaded", flush=True)

    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    velocity = jax.tree_util.tree_map(jnp.zeros_like, params)
    lr = jnp.float32(0.1)
    m = jnp.float32(0.99)
    key = jax.random.PRNGKey(1)

    slot = rng.integers(0, args.images, size=args.batch).astype(np.int32)
    y0 = rng.integers(
        -8, args.image_size - args.dim + 8, size=args.batch
    ).astype(np.int32)
    x0 = rng.integers(
        -8, args.image_size - args.dim + 8, size=args.batch
    ).astype(np.int32)
    vh = np.full(args.batch, args.image_size, np.int32)
    vw = np.full(args.batch, args.image_size, np.int32)
    packed = np.stack([slot, y0, x0, vh, vw])

    # shipped: flips ride the gather's permutation matmuls
    flip_gather_step = make_fused_pool_step(config, tc, co, args.dim)

    # old composition: plain gather, flips as augment_batch reverses
    legacy_inner = make_fused_train_step(
        config, tc, co, flips_pre_applied=False
    )

    def flip_in_step(p, b, v, lr_, mom, k, pi, pl, pk):
        img, lab = gather_crops_packed(pi, pl, pk, args.dim)
        return legacy_inner(p, b, v, lr_, mom, k, img, lab)

    results = {}
    for name, fn in (
        ("flip_gather_step", flip_gather_step),
        ("flip_in_step", flip_in_step),
    ):
        fn.__name__ = name  # distinct jit_* program names in the trace
        compiled = jax.jit(fn).lower(
            params, bn_stats, velocity, lr, m, key,
            pool.images, pool.labels, packed,
        ).compile()
        state = (params, bn_stats, velocity)
        out = compiled(*state, lr, m, key, pool.images, pool.labels, packed)
        state = out[:3]
        float(out[3])  # warm + sync
        trace_dir = f"/tmp/flip_ab_{name}"
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                out = compiled(
                    *state, lr, m, key, pool.images, pool.labels, packed
                )
                state = out[:3]
            float(out[3])
        whole, op_sum, ops = device_ms(trace_dir, name)
        results[name] = (whole, op_sum)
        print(f"\n== {name}: whole-program {whole:.2f} ms/step "
              f"(op-sum {op_sum:.2f}) ==", flush=True)
        for ms, op in ops[:12]:
            print(f"  {ms:8.2f} ms  {op[:60]}", flush=True)
        rev = sum(ms for ms, op in ops if "reverse" in op)
        print(f"  reverse ops: {rev:.2f} ms", flush=True)

    a, b = results["flip_gather_step"][0], results["flip_in_step"][0]
    print(json.dumps({
        "metric": "flip_gather_ab",
        "flip_gather_ms": round(a, 2),
        "flip_in_step_ms": round(b, 2),
        "speedup": round(b / max(a, 1e-9), 4),
        "batch": args.batch, "dim": args.dim,
    }))


if __name__ == "__main__":
    main()
