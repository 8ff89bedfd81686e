"""Probe: does int8 buy 2x MXU throughput on v5e for our conv shapes?

v5e peaks: ~197 bf16 TFLOP/s, ~394 int8 TOP/s. If XLA lowers int8
convs/dots to the int8 MXU mode, an int8 inference path halves the conv
time that bounds tiled inference (88% of the per-image cost, DESIGN.md §6).

Timing: chained iterations + one dependent-scalar readback (CLAUDE.md —
block_until_ready lies on the axon tunnel).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def sync(x) -> float:
    return float(jnp.max(x).astype(jnp.float32))


def time_chain(fn, x, iters=8):
    """Seconds per call of jitted fn, chained x -> fn(x)."""
    y = fn(x)
    sync(y)  # compile + settle
    trivial = jax.jit(lambda a: a.reshape(-1)[0].astype(jnp.float32))
    float(trivial(y))
    t0 = time.monotonic()
    for _ in range(3):
        float(trivial(y))
    rtt = (time.monotonic() - t0) / 3
    t0 = time.monotonic()
    for _ in range(iters):
        y = fn(y) if y.shape == x.shape and y.dtype == x.dtype else fn(x)
    sync(y)
    return max(1e-9, (time.monotonic() - t0 - rtt)) / iters


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # --- matmul calibration -------------------------------------------------
    n = 8192
    flops = 2 * n**3
    a16 = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)

    @jax.jit
    def mm_bf16(a):
        return a @ a

    t = time_chain(mm_bf16, a16)
    print(f"bf16 {n}^3 matmul: {t*1e3:.2f} ms = {flops/t/1e12:.1f} TF/s",
          flush=True)

    a8 = jnp.asarray(
        rng.integers(-127, 128, size=(n, n)), jnp.int8
    )

    @jax.jit
    def mm_int8(a):
        c = lax.dot_general(
            a, a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # requantize back to int8 so the chain stays int8-in/int8-out
        return (c >> 8).astype(jnp.int8)

    t = time_chain(mm_int8, a8)
    print(f"int8 {n}^3 matmul(+requant): {t*1e3:.2f} ms = "
          f"{flops/t/1e12:.1f} TOP/s", flush=True)

    # --- folded conv layer shape -------------------------------------------
    # the hot stride-1 folded conv: [B, H, WB, 128] (x) [3,3,128,128]
    B, H, WB, C = 25, 872, 109, 128
    xshape = (B, H, WB, C)
    cflops = 2 * B * H * WB * C * 9 * C
    x16 = jnp.asarray(rng.standard_normal(xshape), jnp.bfloat16)
    w16 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
    b16 = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.bfloat16)

    @jax.jit
    def conv_bf16(x):
        out = lax.conv_general_dilated(
            x, w16, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN
        )
        return jnp.maximum(out + b16, 0.0).astype(jnp.bfloat16)

    t = time_chain(conv_bf16, x16)
    print(f"bf16 folded s1 conv: {t*1e3:.2f} ms = {cflops/t/1e12:.1f} TF/s "
          f"({cflops/t/197e12*100:.0f}% MXU)", flush=True)

    x8 = jnp.asarray(rng.integers(0, 128, size=xshape), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, size=(3, 3, C, C)), jnp.int8)
    scale = jnp.float32(1 / 256.0)

    @jax.jit
    def conv_int8(x):
        out = lax.conv_general_dilated(
            x, w8, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
        # dequant + bias + relu + requant epilogue (what the real path needs)
        f = out.astype(jnp.float32) * scale + b16.astype(jnp.float32)
        f = jnp.maximum(f, 0.0)
        return jnp.clip(f * 2.0, 0, 127).astype(jnp.int8)

    t = time_chain(conv_int8, x8)
    print(f"int8 folded s1 conv(+epilogue): {t*1e3:.2f} ms = "
          f"{cflops/t/1e12:.1f} TOP/s ({cflops/t/394e12*100:.0f}% int8-MXU)",
          flush=True)

    # int8 conv with bf16 epilogue output (layer boundary stays int8 input)
    @jax.jit
    def conv_int8_dot(x):
        # same conv as three shifted dots? no — keep XLA conv, epilogue only
        out = lax.conv_general_dilated(
            x, w8, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
        return out

    t = time_chain(conv_int8_dot, x8)
    print(f"int8 folded s1 conv (raw int32 out): {t*1e3:.2f} ms = "
          f"{cflops/t/1e12:.1f} TOP/s", flush=True)


if __name__ == "__main__" and "--geometry" not in __import__("sys").argv:
    main()


def probe_geometry_layers():
    """int8 vs bf16 for the folded s2 (strides (2,1)) and up
    (lhs_dilation (2,1)) layers."""
    rng = np.random.default_rng(1)
    B, H, WB = 25, 872, 109

    # s2: [3,2,128,128] kernel, strides (2,1), padding ((0,1),(0,1))
    x16 = jnp.asarray(rng.standard_normal((B, H, WB, 128)), jnp.bfloat16)
    w16 = jnp.asarray(rng.standard_normal((3, 2, 128, 128)) * 0.05,
                      jnp.bfloat16)
    s2flops = 2 * B * (H // 2) * WB * 128 * 6 * 128

    @jax.jit
    def s2_bf16(x):
        out = lax.conv_general_dilated(
            x, w16, (2, 1), [(0, 1), (0, 1)], dimension_numbers=_DN
        )
        return jnp.maximum(out, 0.0).astype(jnp.bfloat16)

    t = time_chain(s2_bf16, x16)
    print(f"bf16 folded s2 conv: {t*1e3:.2f} ms = {s2flops/t/1e12:.1f} TF/s",
          flush=True)

    x8 = jnp.asarray(rng.integers(0, 128, size=(B, H, WB, 128)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, size=(3, 2, 128, 128)), jnp.int8)
    sc = jnp.float32(1 / 512.0)

    @jax.jit
    def s2_int8(x):
        out = lax.conv_general_dilated(
            x, w8, (2, 1), [(0, 1), (0, 1)], dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
        f = jnp.maximum(out.astype(jnp.float32) * sc, 0.0)
        return jnp.clip(f, 0, 127).astype(jnp.int8)

    t = time_chain(s2_int8, x8)
    print(f"int8 folded s2 conv: {t*1e3:.2f} ms = {s2flops/t/1e12:.1f} TOP/s",
          flush=True)

    # up: conv_transpose strides (2,1) == lhs_dilation (2,1); [2,1,128,256]
    xu16 = jnp.asarray(rng.standard_normal((B, H // 8, WB, 128)), jnp.bfloat16)
    wu16 = jnp.asarray(rng.standard_normal((2, 1, 128, 256)) * 0.05,
                       jnp.bfloat16)
    upflops = 2 * B * (H // 4) * WB * 256 * 1 * 128  # each out pixel: 1 tap

    @jax.jit
    def up_bf16(x):
        out = lax.conv_transpose(
            x, wu16, strides=(2, 1), padding="SAME", dimension_numbers=_DN
        )
        return jnp.maximum(out, 0.0).astype(jnp.bfloat16)

    t = time_chain(up_bf16, xu16)
    print(f"bf16 folded up conv: {t*1e3:.2f} ms = {upflops/t/1e12:.1f} TF/s",
          flush=True)

    xu8 = jnp.asarray(rng.integers(0, 128, size=(B, H // 8, WB, 128)),
                      jnp.int8)
    wu8 = jnp.asarray(rng.integers(-127, 128, size=(2, 1, 128, 256)),
                      jnp.int8)

    @jax.jit
    def up_int8(x):
        # conv_transpose(strides=(2,1), SAME, k=(2,1)) == conv_general_dilated
        # with lhs_dilation (2,1), kernel flipped, padding to match; probe the
        # dilated form directly
        out = lax.conv_general_dilated(
            x, wu8[::-1], (1, 1), [(1, 0), (0, 0)],
            lhs_dilation=(2, 1), dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
        f = jnp.maximum(out.astype(jnp.float32) * sc, 0.0)
        return jnp.clip(f, 0, 127).astype(jnp.int8)

    t = time_chain(up_int8, xu8)
    print(f"int8 folded up conv (lhs_dilated): {t*1e3:.2f} ms = "
          f"{upflops/t/1e12:.1f} TOP/s", flush=True)


if __name__ == "__main__" and "--geometry" in __import__("sys").argv:
    probe_geometry_layers()
