"""Microbenchmark of tile-blending strategies on the current device."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.monotonic()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return out, (time.monotonic() - t0) / iters


def main():
    hp = wp = 4224
    th = tw = 1024
    k = 3
    # the real 4096/1024/overlap-62 layout: 5x5 grid
    stride = 962
    pos = [0, 962, 1924, 2886, 3200]
    tile_yx = tuple((y, x) for y in pos for x in pos)
    n = len(tile_yx)
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(n, th, tw, k)).astype(np.float32))
    ramp = jnp.asarray(np.random.rand(th, tw).astype(np.float32))
    yx_arr = jnp.asarray(np.array(tile_yx, np.int32))

    # A: scan + dynamic_update_slice (original)
    def blend_scan(logits, yx):
        acc = jnp.zeros((hp, wp, k), jnp.float32)
        wsum = jnp.zeros((hp, wp, 1), jnp.float32)

        def body(carry, inputs):
            acc, wsum = carry
            lg, pos = inputs
            w = ramp[..., None]
            start = (pos[0], pos[1], 0)
            ap = lax.dynamic_slice(acc, start, (th, tw, k))
            acc = lax.dynamic_update_slice(acc, ap + w * lg, start)
            ws = lax.dynamic_slice(wsum, start, (th, tw, 1))
            wsum = lax.dynamic_update_slice(wsum, ws + w, start)
            return (acc, wsum), None

        (acc, wsum), _ = lax.scan(body, (acc, wsum), (logits, yx))
        return jnp.argmax(acc / jnp.maximum(wsum, 1e-12), axis=-1).astype(jnp.uint8)

    _, dt = timed(jax.jit(blend_scan), logits, yx_arr)
    print(f"A scan-DUS:          {dt*1000:.1f} ms")

    # B: unrolled static at[].add
    def blend_static(logits):
        w = logits * ramp[None, :, :, None]
        acc = jnp.zeros((hp, wp, k), jnp.float32)
        wsum = jnp.zeros((hp, wp), jnp.float32)
        for i, (y, x) in enumerate(tile_yx):
            acc = acc.at[y : y + th, x : x + tw, :].add(w[i])
            wsum = wsum.at[y : y + th, x : x + tw].add(ramp)
        return jnp.argmax(
            acc / jnp.maximum(wsum, 1e-12)[..., None], axis=-1
        ).astype(jnp.uint8)

    _, dt = timed(jax.jit(blend_static), logits)
    print(f"B unrolled at.add:   {dt*1000:.1f} ms")

    # C: scan with static-in-carry but fori-loop over traced index
    def blend_fori(logits, yx):
        acc = jnp.zeros((hp, wp, k), jnp.float32)
        wsum = jnp.zeros((hp, wp, 1), jnp.float32)

        def body(i, carry):
            acc, wsum = carry
            lg = logits[i]
            pos = yx[i]
            w = ramp[..., None]
            start = (pos[0], pos[1], 0)
            ap = lax.dynamic_slice(acc, start, (th, tw, k))
            acc = lax.dynamic_update_slice(acc, ap + w * lg, start)
            ws = lax.dynamic_slice(wsum, start, (th, tw, 1))
            wsum = lax.dynamic_update_slice(wsum, ws + w, start)
            return (acc, wsum)

        acc, wsum = lax.fori_loop(0, n, body, (acc, wsum))
        return jnp.argmax(acc / jnp.maximum(wsum, 1e-12), axis=-1).astype(jnp.uint8)

    _, dt = timed(jax.jit(blend_fori), logits, yx_arr)
    print(f"C fori-DUS:          {dt*1000:.1f} ms")

    # D: per-tile argmax is wrong; but what's the cost floor of one pass?
    def floor_pass(logits):
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    _, dt = timed(jax.jit(floor_pass), logits)
    print(f"D floor (argmax all tiles): {dt*1000:.1f} ms")


if __name__ == "__main__":
    main()
