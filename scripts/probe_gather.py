"""Probe: which crop-gather lowering is fast on TPU?

Variants gathering B crops of [dim, dim] (+labels) from a pool
[S, Hp, Wp, C] with replicate-clamp semantics:

  ds_take   vmap(dynamic_slice) + in-tile take/take (ops/crop_gather v1)
  ds_only   vmap(dynamic_slice) alone (no clamp fixup — lower bound)
  ds_onehot vmap(dynamic_slice) + in-tile one-hot matmul permutation
  adv_index one big advanced-indexing gather (pool[slot, rows, cols])

Honest timing: chain iters via a carried checksum, one scalar readback,
subtract RTT. Run standalone (one TPU process at a time!).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--dim", type=int, default=192)
    parser.add_argument("--images", type=int, default=8)
    parser.add_argument("--image-size", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    import jax

    import os as _os
    if _os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon plugin pre-sets jax_platforms, overriding the env
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    S, H, W, C = args.images, args.image_size, args.image_size, 3
    B, dim = args.batch, args.dim
    rng = np.random.default_rng(0)
    pool_img = jnp.asarray(
        rng.integers(0, 256, size=(S, H, W, C), dtype=np.uint8)
    )
    pool_lab = jnp.asarray(
        rng.integers(0, 3, size=(S, H, W)).astype(np.uint16)
    )

    slot = jnp.asarray(rng.integers(0, S, size=B).astype(np.int32))
    y0 = jnp.asarray(
        rng.integers(-8, H - dim + 8, size=B).astype(np.int32)
    )
    x0 = jnp.asarray(
        rng.integers(-8, W - dim + 8, size=B).astype(np.int32)
    )
    vh = jnp.full((B,), H, jnp.int32)
    vw = jnp.full((B,), W, jnp.int32)
    iota = jnp.arange(dim, dtype=jnp.int32)

    def starts(yy, xx, h, w):
        sy = jnp.clip(yy, 0, jnp.maximum(0, h - dim))
        sx = jnp.clip(xx, 0, jnp.maximum(0, w - dim))
        return sy, sx

    def ds_take(slot, y0, x0, vh, vw, seed):
        def one(s, yy, xx, h, w):
            sy, sx = starts(yy, xx, h, w)
            img = jax.lax.dynamic_slice(
                pool_img[s], (sy, sx, 0), (dim, dim, C)
            )
            lab = jax.lax.dynamic_slice(pool_lab[s], (sy, sx), (dim, dim))
            rows = jnp.clip(yy + iota, 0, h - 1) - sy
            cols = jnp.clip(xx + iota, 0, w - 1) - sx
            img = jnp.take(jnp.take(img, rows, axis=0), cols, axis=1)
            lab = jnp.take(jnp.take(lab, rows, axis=0), cols, axis=1)
            return img, lab

        return jax.vmap(one)(slot, y0, x0, vh, vw)

    def ds_only(slot, y0, x0, vh, vw, seed):
        def one(s, yy, xx, h, w):
            sy, sx = starts(yy, xx, h, w)
            img = jax.lax.dynamic_slice(
                pool_img[s], (sy, sx, 0), (dim, dim, C)
            )
            lab = jax.lax.dynamic_slice(pool_lab[s], (sy, sx), (dim, dim))
            return img, lab

        return jax.vmap(one)(slot, y0, x0, vh, vw)

    def ds_onehot(slot, y0, x0, vh, vw, seed):
        def one(s, yy, xx, h, w):
            sy, sx = starts(yy, xx, h, w)
            img = jax.lax.dynamic_slice(
                pool_img[s], (sy, sx, 0), (dim, dim, C)
            )
            lab = jax.lax.dynamic_slice(pool_lab[s], (sy, sx), (dim, dim))
            rows = jnp.clip(yy + iota, 0, h - 1) - sy
            cols = jnp.clip(xx + iota, 0, w - 1) - sx
            # permutation matrices: out[i] = sum_j P[i, j] * in[j]
            pr = (rows[:, None] == iota[None, :]).astype(jnp.bfloat16)
            pc = (cols[:, None] == iota[None, :]).astype(jnp.bfloat16)
            imgf = img.astype(jnp.bfloat16).reshape(dim, dim * C)
            imgf = (pr @ imgf).reshape(dim, dim, C)
            imgf = jnp.einsum("ij,hjc->hic", pc, imgf)
            labf = (pr.astype(jnp.float32) @ lab.astype(jnp.float32))
            labf = labf @ pc.astype(jnp.float32).T
            return (
                imgf.astype(jnp.uint8),
                labf.astype(jnp.int32),
            )

        return jax.vmap(one)(slot, y0, x0, vh, vw)

    def adv_index(slot, y0, x0, vh, vw, seed):
        rows = jnp.clip(y0[:, None] + iota[None, :], 0, vh[:, None] - 1)
        cols = jnp.clip(x0[:, None] + iota[None, :], 0, vw[:, None] - 1)
        img = pool_img[
            slot[:, None, None], rows[:, :, None], cols[:, None, :]
        ]
        lab = pool_lab[
            slot[:, None, None], rows[:, :, None], cols[:, None, :]
        ]
        return img, lab

    variants = {
        "ds_take": ds_take,
        "ds_only": ds_only,
        "ds_onehot": ds_onehot,
        "adv_index": adv_index,
    }

    trivial = jax.jit(lambda a: a + 1.0)
    z = jnp.float32(0.0)
    float(trivial(z))
    t0 = time.monotonic()
    for _ in range(3):
        float(trivial(z))
    rtt = (time.monotonic() - t0) / 3
    print(f"rtt {rtt * 1000:.1f} ms", flush=True)

    for name, fn in variants.items():
        @jax.jit
        def chained(seed, _fn=fn):
            img, lab = _fn(slot, y0, x0, vh, vw, seed)
            return (
                jnp.sum(img.astype(jnp.float32))
                + jnp.sum(lab.astype(jnp.float32))
                + seed
            )

        out = chained(z)
        float(out)  # compile + settle
        acc = jnp.float32(0.0)
        t0 = time.monotonic()
        for _ in range(args.iters):
            acc = chained(acc * 1e-9)
        float(acc)
        per = max(1e-9, time.monotonic() - t0 - rtt) / args.iters
        mb = B * dim * dim * (C + 2) / 1e6
        print(
            f"{name}: {per * 1000:.2f} ms ({mb / per / 1000:.1f} GB/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
