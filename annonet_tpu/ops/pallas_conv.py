"""Pallas TPU kernel: stride-1 SAME 3x3 conv over the folded layout.

STATUS — documented negative result (kept opt-in; the shipped path is the
folded XLA conv). Complete measurement record on v5e, flagship net, tile
batch [25, 872, 872, 3] unless noted:

  * The folded XLA conv (models/folded_runtime.py) pays fold(=8)x redundant
    MXU FLOPs — its block-Toeplitz kernels are mostly zeros — but runs them
    at 41-67% MXU utilization per layer, 15.6% utilization in LOGICAL FLOPs
    whole-net. Every attempt to cut the redundancy lost:
  * Windowed im2col GEMM (3.33x logical FLOPs, the former variant A):
    Mosaic rejects the (fold-1)*cin = 112-lane-offset VMEM concats, and any
    lane-ALIGNED reformulation collapses algebraically back to variant B's
    three dense GEMMs (patches @ W'' = P @ (S @ W'') for the 0/1 selection
    matrix S — the MXU multiplies the zeros either way).
  * The same window assembled by XLA instead (pure jnp: shifted views +
    concat + dot_general, no Mosaic limits): 14.0 ms vs 7.5 ms for the
    folded XLA conv — the [.., 480]-lane patch materialization costs more
    HBM traffic than the saved FLOPs.
  * This file's variant B (lane-aligned three-GEMM kernel, below): same
    FLOPs as the folded XLA conv, faster in isolation in round 1
    (6.45 vs 15.4 ms/layer at the then-current XLA baseline) but LOSES
    composed end-to-end (194 vs 359 Mpx/s): pallas_call boundaries and the
    three shifted input copies break XLA's cross-layer fusion, and XLA's
    own fused conv+bias+ReLU has since reached ~52% MXU utilization.
  * A DMA-halo variant (self-managed overlapping row windows, no shifted
    copies) was exact on hardware only for width-block counts % 8 == 0 and
    shared variant B's composed economics; pruned (see git history,
    commit 3b5e949).
  * Smaller/larger folds don't help XLA either: fold 4 (64ch) = 12.9% MXU,
    fold 8 (128ch) = 52.4%, fold 16 (256ch) = 58.1% at 2x the FLOPs —
    fold 8 is the family optimum the shipped design uses.
  * conv_transpose as 2 GEMMs + row interleave: 7.6 vs 3.7 ms — the
    interleave materialization loses too.

Conclusion: with this model family's 16-128 logical channels, the 128-lane
MXU forces either the fold's 8x redundancy or sub-128-lane assembly that
neither Mosaic nor XLA executes profitably. The remaining per-layer ceiling
over folded-XLA is < 1.5x and is historically eaten by kernel boundaries.
Revisit only with a whole-net pallas program that keeps activations in VMEM
across layers (halo-exchange between layer stages inside ONE kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Variant B: lane-aligned formulation (three masked GEMMs)
# ---------------------------------------------------------------------------
# Mosaic rejects the 1.25x-overhead windowed patches (lane-offset concats);
# this variant keeps every VMEM op lane-aligned: P = concat of the three dy
# planes ([.., 3*fold*cin], offsets 0/128/256), and the cross-block taps come
# from rolled copies of P against weight matrices whose only nonzero rows are
# the border pixels. FLOP count matches the folded-XLA conv (the zeros ride
# along), but the whole layer is three MXU GEMMs + fused bias/ReLU.


def build_gemm_kernels_aligned(w: np.ndarray, fold: int):
    """[3,3,cin,cout] -> (Wc, Wl, Wr), each [3*fold*cin, fold*cout].

    Row (dy, i, ci) of Wc carries w[dy, i-j+1] for in-block taps
    (dx = i - j in {-1,0,1}); Wl carries the tap where the input is the
    LAST pixel of the previous block (j=0, dx=-1 -> i=fold-1); Wr the
    FIRST pixel of the next block (j=fold-1, dx=+1 -> i=0).
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    shape = (3 * fold * cin, fold * cout)
    wc = np.zeros(shape, np.float32)
    wl = np.zeros(shape, np.float32)
    wr = np.zeros(shape, np.float32)
    for dy in range(3):
        for j in range(fold):
            for dx in (-1, 0, 1):
                i = j + dx
                rows_base = dy * fold * cin
                cols = slice(j * cout, (j + 1) * cout)
                if 0 <= i < fold:
                    wc[rows_base + i * cin : rows_base + (i + 1) * cin,
                       cols] = w[dy, dx + 1]
                elif i < 0:  # previous block's last pixel
                    wl[rows_base + (fold - 1) * cin : rows_base + fold * cin,
                       cols] = w[dy, dx + 1]
                else:  # next block's first pixel
                    wr[rows_base : rows_base + cin, cols] = w[dy, dx + 1]
    return wc, wl, wr


def _conv_kernel_aligned(
    x0_ref, x1_ref, x2_ref,  # [1, R, WB, fold*cin] dy planes
    wc_ref, wl_ref, wr_ref,  # [3*fold*cin, fold*cout]
    b_ref,  # [1, fold*cout]
    o_ref,  # [1, R, WB, fold*cout]
    *,
    rows: int,
    wblocks: int,
):
    p = jnp.concatenate([x0_ref[0], x1_ref[0], x2_ref[0]], axis=-1)
    # [R, WB, 3*fold*cin] — lane-aligned (each piece is a multiple of 128)

    def roll_wb(xb, shift):
        # Mosaic rotates 32-bit data only, and bitcast 16->32 packs sublane
        # PAIRS on hardware (unlike interpret mode) — roll via an f32 copy
        if xb.dtype.itemsize == 4:
            return pltpu.roll(xb, shift, 1)
        return pltpu.roll(xb.astype(jnp.float32), shift, 1).astype(xb.dtype)

    wb_ids = jax.lax.broadcasted_iota(
        jnp.int32, (rows, wblocks, 1), 1
    )
    p_left = jnp.where(wb_ids == 0, jnp.zeros_like(p), roll_wb(p, 1))
    p_right = jnp.where(
        wb_ids == wblocks - 1, jnp.zeros_like(p), roll_wb(p, wblocks - 1)
    )

    k = p.shape[-1]
    m = rows * wblocks
    acc = jnp.dot(p.reshape(m, k), wc_ref[:],
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(p_left.reshape(m, k), wl_ref[:],
                   preferred_element_type=jnp.float32)
    acc += jnp.dot(p_right.reshape(m, k), wr_ref[:],
                   preferred_element_type=jnp.float32)
    acc = jnp.maximum(acc + b_ref[0][None, :], 0.0)
    o_ref[0] = acc.reshape(rows, wblocks, -1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("fold", "cin", "rows", "interpret"))
def conv3x3_gemm_aligned(
    x_folded: jnp.ndarray,  # [N, H, WB, fold*cin]
    wc: jnp.ndarray,
    wl: jnp.ndarray,
    wr: jnp.ndarray,
    bias: jnp.ndarray,  # [cout]
    fold: int,
    cin: int,
    rows: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused stride-1 SAME 3x3 conv + bias + ReLU (aligned formulation)."""
    n, h, wblocks, fc = x_folded.shape
    assert fc == fold * cin and h % rows == 0
    cout = wc.shape[1] // fold

    xp = jnp.pad(x_folded, ((0, 0), (1, 1), (0, 0), (0, 0)))
    shifted = [xp[:, dy : dy + h] for dy in range(3)]
    bias_f = jnp.tile(bias.astype(jnp.float32), fold)[None, :]

    kernel = functools.partial(
        _conv_kernel_aligned, rows=rows, wblocks=wblocks
    )
    row_spec = pl.BlockSpec(
        (1, rows, wblocks, fc), lambda b, r: (b, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(n, h // rows),
        in_specs=[row_spec, row_spec, row_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, rows, wblocks, fold * cout), lambda b, r: (b, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, h, wblocks, fold * cout), x_folded.dtype
        ),
        interpret=interpret,
    )(shifted[0], shifted[1], shifted[2],
      wc.astype(x_folded.dtype), wl.astype(x_folded.dtype),
      wr.astype(x_folded.dtype), bias_f)
