"""Pallas TPU kernel: stride-1 SAME 3x3 conv as a windowed GEMM.

The folded-network layout (models/folded_runtime.py) fixes the MXU shapes
but pays ~8x redundant FLOPs because its block-Toeplitz kernels are mostly
zeros. This kernel reaches the same K,N >= 128 GEMM shapes at only
~(win/fold)x (~1.25x) FLOP overhead by assembling im2col patches IN VMEM:

  - activations travel in the FOLDED view [N, H, WB, fold*cin] (lane-exact
    128 channels, no padded layouts);
  - each grid step covers (1 batch, R rows): three row-shifted views of the
    zero-padded input supply the dy = 0,1,2 planes as ordinary non-
    overlapping blocks;
  - per row-block, window columns [prev-block last px | block | next-block
    first px] are built with rolls/concats in VMEM and multiplied as ONE
    [R*WB, 3*win*cin] x [3*win*cin, fold*cout] GEMM on the MXU;
  - bias + ReLU are fused into the same kernel.

W'' comes from build_gemm_kernel (host, once per model).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_gemm_kernel(w: np.ndarray, fold_out: int) -> np.ndarray:
    """[3, 3, cin, cout] -> [3 * (fold_out+2) * cin, fold_out * cout].

    Row (dy, i, ci) -> column (j, co) carries w[dy, i-j, ci, co] when
    0 <= i-j <= 2 (window pixel i sits at absolute offset i-1 from the
    output group start; output pixel j taps dx = i-1-j in {-1,0,1}).
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    win = fold_out + 2
    out = np.zeros((3 * win * cin, fold_out * cout), np.float32)
    for dy in range(3):
        for i in range(win):
            for j in range(fold_out):
                kx = i - j
                if 0 <= kx <= 2:
                    out[
                        (dy * win + i) * cin : (dy * win + i + 1) * cin,
                        j * cout : (j + 1) * cout,
                    ] = w[dy, kx]
    return out


def _conv_kernel(
    x0_ref,  # [1, R, WB, fold*cin] rows r+0 (padded coords)
    x1_ref,  # rows r+1
    x2_ref,  # rows r+2
    w_ref,  # [3*win*cin, fold*cout]
    b_ref,  # [1, fold*cout]
    o_ref,  # [1, R, WB, fold*cout]
    *,
    rows: int,
    wblocks: int,
    fold: int,
    cin: int,
    cout: int,
):
    win = fold + 2

    def roll_wb(xb, shift):
        # Mosaic only rotates 32-bit data; roll bf16 as bit-paired i32
        # (the roll axis is the width-block axis, packing is unaffected)
        if xb.dtype.itemsize == 4:
            return pltpu.roll(xb, shift, 1)
        packed = pltpu.bitcast(xb, jnp.int32)  # halves the minor dim
        rolled = pltpu.roll(packed, shift, 1)
        return pltpu.bitcast(rolled, xb.dtype)

    def window(ref):
        xb = ref[0]  # [R, WB, fold*cin]
        left = roll_wb(xb, 1)[:, :, (fold - 1) * cin :]
        right = roll_wb(xb, wblocks - 1)[:, :, :cin]
        wb_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, wblocks, 1), 1)
        left = jnp.where(wb_ids == 0, jnp.zeros_like(left), left)
        right = jnp.where(
            wb_ids == wblocks - 1, jnp.zeros_like(right), right
        )
        return jnp.concatenate([left, xb, right], axis=-1)  # [R, WB, win*cin]

    patches = jnp.concatenate(
        [window(x0_ref), window(x1_ref), window(x2_ref)], axis=-1
    )  # [R, WB, 3*win*cin]
    acc = jnp.dot(
        patches.reshape(rows * wblocks, 3 * win * cin),
        w_ref[:],
        preferred_element_type=jnp.float32,
    )
    acc = jnp.maximum(acc + b_ref[0][None, :], 0.0)
    o_ref[0] = acc.reshape(rows, wblocks, fold * cout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("fold", "cin", "rows", "interpret"))
def conv3x3_gemm_folded(
    x_folded: jnp.ndarray,  # [N, H, WB, fold*cin]
    w_gemm: jnp.ndarray,  # [3*(fold+2)*cin, fold*cout]
    bias: jnp.ndarray,  # [cout]
    fold: int,
    cin: int,
    rows: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused stride-1 SAME 3x3 conv + bias + ReLU on folded activations.

    Returns [N, H, WB, fold*cout].
    """
    n, h, wblocks, fc = x_folded.shape
    assert fc == fold * cin
    assert h % rows == 0, (h, rows)
    win = fold + 2
    cout = w_gemm.shape[1] // fold

    xp = jnp.pad(x_folded, ((0, 0), (1, 1), (0, 0), (0, 0)))
    bias_f = jnp.tile(bias.astype(jnp.float32), fold)[None, :]

    kernel = functools.partial(
        _conv_kernel,
        rows=rows,
        wblocks=wblocks,
        fold=fold,
        cin=cin,
        cout=cout,
    )
    row_spec = lambda dy: pl.BlockSpec(  # noqa: E731
        (1, rows, wblocks, fc),
        # block units: dim1 blocks are `rows` tall; passing three shifted
        # copies of xp lets each dy plane arrive as a non-overlapping block
        lambda b, r: (b, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    shifted = [xp[:, dy : dy + h] for dy in range(3)]
    return pl.pallas_call(
        kernel,
        grid=(n, h // rows),
        in_specs=[
            row_spec(0),
            row_spec(1),
            row_spec(2),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, wblocks, fold * cout),
            lambda b, r: (b, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, h, wblocks, fold * cout), x_folded.dtype
        ),
        interpret=interpret,
    )(shifted[0], shifted[1], shifted[2], w_gemm.astype(x_folded.dtype), bias_f)


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


# ---------------------------------------------------------------------------
# Variant C: manual-DMA halo slabs (no shifted input copies)
# ---------------------------------------------------------------------------
# Variants A/B feed the dy planes as three XLA-materialized shifted copies of
# the input — 3x HBM traffic per layer and a fusion barrier. Here the input
# stays in HBM (pre-padded by one row top/bottom) and each grid step DMAs an
# overlapping (slab+2)-row window itself: row offsets live in an untiled
# dimension, so arbitrary overlap is legal where tiled-dim slicing is not.
#
# STATUS: exact on TPU for sublane-friendly shapes (width blocks % 8 == 0);
# Mosaic rejects odd width-block counts (e.g. 109). Experimental — the
# composed-pipeline story is the same as variant B (see module docstring).


def _conv_kernel_dma(
    x_hbm,  # ANY [N, H+2, WB, fold*cin]
    wc_ref, wl_ref, wr_ref,  # VMEM [3*fold*cin, fold*cout]
    b_ref,  # VMEM [1, fold*cout]
    o_ref,  # VMEM [1, R, WB, fold*cout]
    slab_buf,  # VMEM scratch [R+2, WB, fold*cin]
    sem,
    *,
    rows: int,
    wblocks: int,
):
    b = pl.program_id(0)
    r = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r * rows, rows + 2)], slab_buf, sem
    )
    copy.start()
    copy.wait()

    def roll_wb(xb, shift):
        if xb.dtype.itemsize == 4:
            return pltpu.roll(xb, shift, 1)
        return pltpu.roll(xb.astype(jnp.float32), shift, 1).astype(xb.dtype)

    # dy planes are row-shifted views of the slab
    p = jnp.concatenate(
        [slab_buf[dy : dy + rows] for dy in range(3)], axis=-1
    )  # [R, WB, 3*fold*cin]
    wb_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, wblocks, 1), 1)
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
def conv3x3_gemm_dma(
    x_folded: jnp.ndarray,  # [N, H, WB, fold*cin]
    wc: jnp.ndarray,
    wl: jnp.ndarray,
    wr: jnp.ndarray,
    bias: jnp.ndarray,  # [cout]
    fold: int,
    cin: int,
    rows: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Aligned-GEMM conv with self-managed halo DMA (single HBM input)."""
    n, h, wblocks, fc = x_folded.shape
    assert fc == fold * cin and h % rows == 0
    cout = wc.shape[1] // fold

    xp = jnp.pad(x_folded, ((0, 0), (1, 1), (0, 0), (0, 0)))
    bias_f = jnp.tile(bias.astype(jnp.float32), fold)[None, :]

    kernel = functools.partial(
        _conv_kernel_dma, rows=rows, wblocks=wblocks
    )
    return pl.pallas_call(
        kernel,
        grid=(n, h // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, wblocks, fold * cout), lambda b, r: (b, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, h, wblocks, fold * cout), x_folded.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, wblocks, fc), x_folded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wc.astype(x_folded.dtype), wl.astype(x_folded.dtype),
      wr.astype(x_folded.dtype), bias_f)
