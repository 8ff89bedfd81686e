"""A/B: int8-forward (STE) training step vs the bf16 baseline.

VERDICT round-2 item 3: one serious attempt at the named ~1.4x training
lever. Measures, at the flagship shape (batch 128 @ 192^2, level 3):

  * full fused step: bf16 vs int8_forward=True (end-to-end, the only
    number that counts — composed-kernel graveyard rule)
  * forward-only: bf16 vs int8 (where the int8 win can come from)
  * loss trajectories on a separable task (convergence sanity)

Honest chained timing + one scalar readback. One TPU process at a time.

Run: python -u scripts/probe_train_int8.py
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
    args = parser.parse_args()

    import jax

    import os as _os
    if _os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon plugin pre-sets jax_platforms, overriding the env
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from annonet_tpu.data.crop import CropOptions
    from annonet_tpu.models.segnet import (
        SegNetConfig,
        apply_train,
        init_state,
    )
    from annonet_tpu.ops.int8_train import int8_conv_ste
    from annonet_tpu.ops.loss import weighted_pixel_cross_entropy
    from annonet_tpu.train.trainer import (
        TrainerConfig,
        make_fused_train_step,
    )

    config = SegNetConfig(
        class_count=3, level_count=args.level_count, base_width=16
    )
    crop_options = CropOptions(
        dim=args.dim,
        allow_flip_left_right=True,
        allow_flip_upside_down=True,
        multiplicative_brightness_change_probability=0.5,
        noise_level_stddev=2.0,
        allow_random_color_offset=True,
    )

    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    velocity = jax.tree_util.tree_map(jnp.zeros_like, params)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(
            0, 256, size=(args.batch, args.dim, args.dim, 3), dtype=np.uint8
        )
    )
    labels_np = rng.integers(0, 3, size=(args.batch, args.dim, args.dim))
    labels = jnp.asarray(labels_np.astype(np.int32))
    weights = jnp.ones((args.batch, args.dim, args.dim), jnp.float32)
    lr = jnp.float32(0.1)
    key = jax.random.PRNGKey(1)

    trivial = jax.jit(lambda a: a + 1.0)
    float(trivial(lr))
    t0 = time.monotonic()
    for _ in range(3):
        float(trivial(lr))
    rtt = (time.monotonic() - t0) / 3
    print(f"rtt {rtt * 1000:.1f} ms", flush=True)

    results = {}

    # Device-resident operands and PRE-SPLIT keys: the loop body must be
    # ONLY the step dispatch. Per-iteration small ops (jax.random.split,
    # eager scalar arithmetic, host->device label uploads) sit on the
    # tunnel's per-dispatch latency and can dominate the measurement by
    # 3-10x when the tunnel is degraded (measured 2026-08-17).
    labels_u16 = jnp.asarray(labels_np.astype(np.uint16))
    keys = [jax.random.PRNGKey(100 + i) for i in range(args.iters)]
    for k_ in keys:
        k_.block_until_ready()

    # ---- forward-only A/B
    for name, conv_impl in (("fwd_bf16", None), ("fwd_int8", int8_conv_ste)):
        @jax.jit
        def fwd(params, images, _ci=conv_impl):
            logits, _ = apply_train(
                params, bn_stats, images, config, bn_momentum=0.99,
                conv_impl=_ci,
            )
            return weighted_pixel_cross_entropy(logits, labels, weights)

        loss = fwd(params, images)
        float(loss)
        t0 = time.monotonic()
        for _ in range(args.iters):
            loss = fwd(params, images)
        float(loss)  # device executes the queue sequentially; one readback
        per = max(1e-9, time.monotonic() - t0 - rtt) / args.iters
        results[name] = per
        print(f"{name}: {per * 1000:.2f} ms", flush=True)

    # ---- full fused step A/B
    for name, tc in (
        ("step_bf16", TrainerConfig()),
        ("step_int8", TrainerConfig(int8_forward=True)),
    ):
        step = jax.jit(make_fused_train_step(config, tc, crop_options))
        p, b, v = params, bn_stats, velocity
        out = step(p, b, v, lr, jnp.float32(0.0), key, images, labels_u16)
        float(out[3])
        t0 = time.monotonic()
        for i in range(args.iters):
            p, b, v, loss = step(
                p, b, v, lr, jnp.float32(0.99), keys[i], images, labels_u16
            )
        float(loss)
        per = max(1e-9, time.monotonic() - t0 - rtt) / args.iters
        results[name] = per
        print(
            f"{name}: {per * 1000:.2f} ms "
            f"({args.batch / per:.0f} crops/s)",
            flush=True,
        )

    # ---- convergence sanity: separable task, 30 steps each
    def trajectory(tc, steps=30):
        step = jax.jit(make_fused_train_step(config, tc, crop_options))
        p, b = init_state(jax.random.PRNGKey(0), config)
        v = jax.tree_util.tree_map(jnp.zeros_like, p)
        k = jax.random.PRNGKey(2)
        r = np.random.default_rng(3)
        losses = []
        for i in range(steps):
            lab = r.integers(
                0, 2, size=(args.batch, args.dim, args.dim)
            ).astype(np.uint16)
            img = (
                np.where(lab[..., None] == 1, 200, 50)
                .astype(np.uint8)
                .repeat(3, axis=-1)
            )
            k, sub = jax.random.split(k)
            p, b, v, loss = step(
                p, b, v, jnp.float32(0.05),
                jnp.float32(min(0.99, 1 - 1 / (i + 1))), sub,
                jnp.asarray(img), jnp.asarray(lab),
            )
            losses.append(float(loss))
        return losses

    tr_bf16 = trajectory(TrainerConfig())
    tr_int8 = trajectory(TrainerConfig(int8_forward=True))
    print(f"loss bf16: first {tr_bf16[0]:.4f} last {tr_bf16[-1]:.4f}")
    print(f"loss int8: first {tr_int8[0]:.4f} last {tr_int8[-1]:.4f}")

    print(
        json.dumps(
            {
                "metric": "int8_training_ab",
                "fwd_bf16_ms": round(results["fwd_bf16"] * 1000, 2),
                "fwd_int8_ms": round(results["fwd_int8"] * 1000, 2),
                "step_bf16_ms": round(results["step_bf16"] * 1000, 2),
                "step_int8_ms": round(results["step_int8"] * 1000, 2),
                "speedup": round(
                    results["step_bf16"] / results["step_int8"], 3
                ),
                "loss_final_bf16": round(tr_bf16[-1], 4),
                "loss_final_int8": round(tr_int8[-1], 4),
            }
        )
    )


if __name__ == "__main__":
    main()
