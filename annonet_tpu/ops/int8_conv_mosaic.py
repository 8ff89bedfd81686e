"""Mosaic (pallas) tap-GEMM conv kernels for the folded net.

Six kernels sharing one structure — int8+requant and float+bias/ReLU
twins of the folded stride-1 conv, stride-2 conv, and 2x upsample
(geometries: models/folded_runtime.py) — plus the net rewrites that
apply them (mosaicize_qspec for the int8 net, mosaicize_folded for the
float net; both opt-in via env flags read in infer/core.py).

The round-3 inference profile left ONE named lever (docs/DESIGN.md
par.15-16): the int8 folded convs run at 212-263 TOP/s of the v5e's 394
int8 peak under XLA's conv emitters. These kernels reformulate each
folded conv ("qs1" geometry: 3x3, stride 1, pad ((1,1),(1,1)),
cin = cout = 128 folded channels, and its s2/up siblings) as lane-
aligned MXU GEMMs with the epilogue fused, to test whether a
hand-scheduled kernel clears XLA's rate.

Formulation (per output row block of R rows):

  out[h, wb] = sum_{dy in 0..2, t in 0..2} x[h+dy-1, wb+t-1] @ W[dy, t]

- the dy taps ride a LANE-ALIGNED concat: p_cat[h, wb, dy*C:dy*C+C] =
  x[h+dy-1, wb] (offsets are multiples of 128 lanes — the form Mosaic
  accepts; ops/pallas_conv.py's record);
- the wb taps are SUBLANE shifts of p_cat (zero rows at the tile's width
  edges — int8 zero == the activation zero point, so edge semantics match
  the folded conv's ((1,1),(1,1)) zero padding exactly);
- H-halo rows are 1-row block views of x itself (block size 1 makes the
  BlockSpec index map element-granular, so it can address row R*r-1
  directly; edge blocks are clamped and masked to the conv's zero
  padding in-kernel) — no shifted full copies of x (the traffic that
  sank pallas_conv.py's variant B), no extra HBM arrays, no unaligned
  halo DMA (the exactness trap of the pruned DMA variant);
- epilogue: acc_i32 -> f32 * scale[co] + offset[co], clip [0,127], int8 —
  identical math to quantized_runtime.apply_folded_int8.requant.

Weights: W[dy, t] is w_q[:, t].reshape(3*C, C) — rows (dy, ci), exactly
the folded block-Toeplitz kernel's t-th width tap.

STATUS — research negative, ships OFF (docs/DESIGN.md par.20/21/34):
micro-benches win 1.5-1.7x at selected folded widths (MOSAIC_FAST_WB),
but the COMPOSED int8 program at the snapped fast plan (WB=128) runs
0.56x XLA (48.95 vs 27.03 ms/image device timeline, 4096^2,
scripts/ab_mosaic_int8.py). The round-3 "66,371 px label disagreement"
was ROOT-CAUSED in round 4 (scripts/repro_mosaic_s1.py, DESIGN.md
par.34): the kernels themselves are bit-exact on hardware — 19 isolated
geometry sweeps including the exact composed shapes, plus a
shared-calibration composed prefix bisection, all match XLA int8
exactly through every int8 layer. The divergence enters at the first
DOWNSTREAM bf16 "up" conv_transpose: the pallas custom call changes
XLA's layout/fusion choices for that float op, its accumulation order
shifts, and ~2% of its requant outputs flip by EXACTLY +-1 (max|delta|
= 1), cascading to ~0.2-0.4% label flips at argmax near-ties — the
same requant-rounding tolerance class as the float twins' documented
tap-order tolerance, NOT a kernel semantics error. The flags stay
measurement-only because the composed program is SLOWER, and the TPU
fence stays because the path cannot claim the int8 stack's
program-variant bit-stability.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Folded tile widths (WB = tile_width / fold) where the tap-GEMM kernels
# actually clear XLA's conv rate on hardware. Measured on v5e
# (scripts/probe_mosaic_wb.py, 3-trace device timeline, [25,872,WB,128]):
#
#   WB   xla_s1  mos_s1 | xla_s2  mos_s2     (ms)
#   92    3.42    5.96  |  1.42    3.01     <- pathological
#   96    3.81    2.28  |  1.33    1.45     <- s1 wins 1.67x, s2 loses
#   104   3.84    2.54  |  1.40    1.53     <- s1 wins 1.51x
#   109   3.85   15.4   |  1.58    6.83     <- shipped plan: pathological
#   112   4.18    3.28  |  1.91    1.67     <- s1 wins 1.27x, s2 wins
#   128   4.54    2.82  |  1.72    1.67     <- s1 wins 1.61x
#
# The cliff is not a simple alignment rule (96 and 104 are fast while
# the neighbouring 92 and 109 are pathological); 112 wins too but only
# marginally (s1 1.27x) and is excluded as not worth a snap. Eligibility
# is this measured allowlist, checked per tile plan AT THE STEM LEVEL
# (deeper levels run their convs at WB/2^level — unmeasured widths; one
# more reason the composed program lost), and the tile planner snaps the
# quantized path's tile width up to the nearest fast width
# (infer/tiling.py prefer_tile_widths).
#
# COMPOSED VERDICT (module STATUS): even at WB=128 the whole-program A/B
# loses 0.56x and hardware exactness fails — the gate keeps the research
# path honest but does not rescue it.
MOSAIC_FAST_WB = frozenset({96, 104, 128})


def build_tap_gemms(w_q: np.ndarray):
    """int8 folded kernel [3, 3, C, C] -> (Wl, Wc, Wr), each [3C, C] int8.

    Wt rows are (dy, ci) pairs; out[.., wb] accumulates
    x[.., wb-1] @ Wl + x[.., wb] @ Wc + x[.., wb+1] @ Wr.
    """
    kh, kw, cin, cout = w_q.shape
    assert (kh, kw) == (3, 3) and w_q.dtype == np.int8
    taps = [np.ascontiguousarray(w_q[:, t].reshape(3 * cin, cout))
            for t in range(3)]
    return taps[0], taps[1], taps[2]


def build_tap_gemms_s2(w_q: np.ndarray):
    """int8 folded s2 kernel [3, 2, C, C'] -> (W0, W1), each [3C, C'] int8.

    out[.., wb] accumulates x_even_rows[.., wb] @ W0 + x[.., wb+1] @ W1
    (the folded s2 geometry taps wb and wb+1 — _fold_s2_kernel).
    """
    kh, kw, cin, cout = w_q.shape
    assert (kh, kw) == (3, 2) and w_q.dtype == np.int8
    return tuple(
        np.ascontiguousarray(w_q[:, t].reshape(3 * cin, cout))
        for t in range(2)
    )



# --------------------------------------------------------------------------
# Shared kernel building blocks (every kernel composes these three):
# tap assembly (s1 / s2 geometries), the dot with optional flattened M,
# and an epilogue (requant or bias+ReLU).
# --------------------------------------------------------------------------


def _s1_taps(top_ref, mid_ref, bot_ref, r):
    """(p_l, p_cat, p_r) for the 3x3/s1 geometry: dy taps as a
    lane-aligned concat, wb taps as sublane shifts, H-halo rows from the
    clamped 1-row views masked to zero padding at the image edges."""
    hb = pl.num_programs(1)
    rb = pl.program_id(1)
    top = jnp.where(rb == 0, jnp.zeros_like(top_ref[0]), top_ref[0])
    bot = jnp.where(rb == hb - 1, jnp.zeros_like(bot_ref[0]), bot_ref[0])
    p_full = jnp.concatenate([top, mid_ref[0], bot], axis=0)  # [R+2, WB, C]
    p_cat = jnp.concatenate(
        [p_full[0:r], p_full[1:r + 1], p_full[2:r + 2]], axis=-1
    )  # [R, WB, 3C]
    zrow = jnp.zeros_like(p_cat[:, :1])
    p_l = jnp.concatenate([zrow, p_cat[:, :-1]], axis=1)
    p_r = jnp.concatenate([p_cat[:, 1:], zrow], axis=1)
    return p_l, p_cat, p_r


def _s2_taps(mid_ref, bot_ref, r):
    """(p_cat, p_r) for the 3x3/s2 geometry: input rows 2h+dy via an
    outer-dim (R, 2) pair split — NOT strided slices, which Mosaic's
    hardware lowering rejects as >2D gathers (interpret mode accepts
    them; found on-device) — the last block's bottom halo is the (0,1)
    zero padding row; wb+1 tap as a sublane shift."""
    bot = jnp.where(
        pl.program_id(1) == pl.num_programs(1) - 1,
        jnp.zeros_like(bot_ref[0]), bot_ref[0],
    )
    p_full = jnp.concatenate([mid_ref[0], bot], axis=0)  # [2R+1, WB, C]
    wb, c = p_full.shape[1], p_full.shape[2]
    pairs = p_full[: 2 * r].reshape(r, 2, wb, c)  # outer-dim split: free
    even = pairs[:, 0]  # rows 2h   (dy=0 taps)
    odd = pairs[:, 1]   # rows 2h+1 (dy=1)
    nxt = jnp.concatenate([even[1:], p_full[2 * r :]], axis=0)  # rows 2h+2
    p_cat = jnp.concatenate([even, odd, nxt], axis=-1)  # [R, WB, 3C]
    zrow = jnp.zeros_like(p_cat[:, :1])
    p_r = jnp.concatenate([p_cat[:, 1:], zrow], axis=1)
    return p_cat, p_r


def _make_dotg(acc_dtype, flatten, r, wb):
    """GEMM helper: 3D [R, WB, K] @ [K, C'] (M = WB per batch row), or —
    with ``flatten`` — 2D [R*WB, K] @ [K, C'] (one merged M dim; WB=109
    alone caps int8 MXU row utilization at 109/128)."""
    if flatten:
        dn = (((1,), (0,)), ((), ()))

        def dotg(p, w):
            return lax.dot_general(
                p.reshape(r * wb, p.shape[-1]), w[:], dn,
                preferred_element_type=acc_dtype,
            )
    else:
        dn = (((2,), (0,)), ((), ()))

        def dotg(p, w):
            return lax.dot_general(
                p, w[:], dn, preferred_element_type=acc_dtype
            )
    return dotg


def _requant(acc, scale_ref, offset_ref, r, wb):
    """ReLU + round + requant as ONE affine + clamp (identical math to
    quantized_runtime.apply_folded_int8.requant)."""
    f = acc.astype(jnp.float32) * scale_ref[0] + offset_ref[0]
    return jnp.clip(f, 0.0, 127.0).astype(jnp.int8).reshape(r, wb, -1)


def _bias_relu(acc, b_ref, out_dtype, r, wb):
    return jnp.maximum(acc + b_ref[0], 0.0).astype(out_dtype).reshape(
        r, wb, -1
    )


def _qconv_s2_kernel(mid_ref, bot_ref, w0_ref, w1_ref,
                     scale_ref, offset_ref, out_ref, *, rows: int,
                     flatten: bool):
    p_cat, p_r = _s2_taps(mid_ref, bot_ref, rows)
    wb = p_cat.shape[1]
    dotg = _make_dotg(jnp.int32, flatten, rows, wb)
    acc = dotg(p_cat, w0_ref) + dotg(p_r, w1_ref)
    out_ref[0] = _requant(acc, scale_ref, offset_ref, rows, wb)


@functools.partial(
    jax.jit, static_argnames=("rows", "interpret", "flatten")
)
def qconv3x3_s2_requant(
    x_q: jnp.ndarray,      # [N, H, WB, C] int8 (H even)
    w0: jnp.ndarray,       # [3C, C'] int8 (build_tap_gemms_s2)
    w1: jnp.ndarray,
    scale: jnp.ndarray,    # [C'] f32
    offset: jnp.ndarray,   # [C'] f32
    rows: int = 8,
    interpret: bool | None = None,
    flatten: bool = False,
) -> jnp.ndarray:
    """Fused int8 folded 3x3/s2 conv + requant: [N, H, WB, C] ->
    [N, H//2, WB, C'] int8. Exactly equal (tested) to quantized_runtime's
    requant(qconv(x, w_q, (2, 1), [(0, 1), (0, 1)])). ``rows`` (output
    row-block) must divide H//2; ``flatten`` merges (rows, WB) into one
    GEMM M dim (see qconv3x3_s1_requant)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, wb, c = x_q.shape
    cout = w0.shape[1]
    assert h % 2 == 0, h
    h_out = h // 2
    assert h_out % rows == 0, (h_out, rows)
    hb = h_out // rows

    # bottom halo: row 2*(r+1)*rows (the dy=2 tap of the block's last
    # output row) as a clamped 1-row view of x, masked to the (0, 1) zero
    # padding row at the last block (kernel)
    bot_spec = pl.BlockSpec(
        (1, 1, wb, c),
        lambda b, r: (b, jnp.minimum(2 * (r + 1) * rows, h - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_spec = pl.BlockSpec(
        (1, 2 * rows, wb, c), lambda b, r: (b, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    flops = 2 * n * h_out * wb * (3 * c) * cout * 2
    bytes_accessed = (x_q.size + n * hb * wb * c
                      + n * h_out * wb * cout + 3 * 2 * c * cout)
    return pl.pallas_call(
        functools.partial(_qconv_s2_kernel, rows=rows, flatten=flatten),
        grid=(n, hb),
        in_specs=[in_spec, bot_spec, full, full, full, full],
        out_specs=pl.BlockSpec(
            (1, rows, wb, cout), lambda b, r: (b, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_out, wb, cout), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x_q, x_q, w0, w1,
      scale.astype(jnp.float32)[None, :], offset.astype(jnp.float32)[None, :])


def _qup_kernel(mid_ref, a_ref, b_ref, scale_ref, offset_ref, out_ref,
                *, rows: int, flatten: bool):
    x = mid_ref[0]  # [R, WB, C]
    r, wb, _c = x.shape
    dotg = _make_dotg(jnp.int32, flatten, r, wb)
    y0 = _requant(dotg(x, a_ref), scale_ref, offset_ref, r, wb)  # even rows
    y1 = _requant(dotg(x, b_ref), scale_ref, offset_ref, r, wb)  # odd rows
    q = jnp.stack([y0, y1], axis=1)  # [R, 2, WB, C'] — outer-dim interleave
    out_ref[0] = q.reshape(2 * rows, q.shape[2], q.shape[3])


@functools.partial(
    jax.jit, static_argnames=("rows", "interpret", "flatten")
)
def qup_requant(
    x_q: jnp.ndarray,      # [N, H, WB, C] int8
    a: jnp.ndarray,        # [C, C'] int8 — even rows' GEMM (w_q[1, 0])
    b: jnp.ndarray,        # [C, C'] int8 — odd rows' GEMM (w_q[0, 0])
    scale: jnp.ndarray,    # [C'] f32 — s_w * inv_s_out
    offset: jnp.ndarray,   # [C'] f32
    rows: int = 8,
    interpret: bool | None = None,
    flatten: bool = False,
) -> jnp.ndarray:
    """Fused int8 folded 2x upsample (transpose conv) + requant:
    [N, H, WB, C] -> [N, 2H, WB, C'] int8.

    The folded up layer is conv_transpose([2, 1] kernel, strides (2, 1),
    SAME — models/folded_runtime.py::_fold_up_kernel): every output row
    depends on exactly ONE input row (out[2h] = x[h] @ w[1,0],
    out[2h+1] = x[h] @ w[0,0]; mapping verified numerically), so the
    GEMM form has no halos and — unlike XLA's int8 conv_transpose,
    which mishandles lhs_dilation (3.4x regression, DESIGN.md) — no
    dilation at all; the row interleave is an outer-dim stack in VMEM
    instead of a materialized relayout. ``rows`` must divide H;
    ``flatten`` merges (rows, WB) into one GEMM M dim.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, wb, c = x_q.shape
    cout = a.shape[1]
    assert h % rows == 0, (h, rows)
    hb = h // rows

    in_spec = pl.BlockSpec(
        (1, rows, wb, c), lambda bb, r: (bb, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops = 2 * n * h * wb * c * cout * 2
    return pl.pallas_call(
        functools.partial(_qup_kernel, rows=rows, flatten=flatten),
        grid=(n, hb),
        in_specs=[in_spec, full, full, full, full],
        out_specs=pl.BlockSpec(
            (1, 2 * rows, wb, cout), lambda bb, r: (bb, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, wb, cout), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_q.size + n * 2 * h * wb * cout + 2 * c * cout,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_q, a, b,
      scale.astype(jnp.float32)[None, :], offset.astype(jnp.float32)[None, :])


def _fconv_kernel(top_ref, mid_ref, bot_ref, wl_ref, wc_ref, wr_ref,
                  b_ref, out_ref, *, rows: int):
    p_l, p_cat, p_r = _s1_taps(top_ref, mid_ref, bot_ref, rows)
    wb = p_cat.shape[1]
    dotg = _make_dotg(jnp.float32, False, rows, wb)
    acc = dotg(p_l, wl_ref) + dotg(p_cat, wc_ref) + dotg(p_r, wr_ref)
    out_ref[0] = _bias_relu(acc, b_ref, out_ref.dtype, rows, wb)


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def fconv3x3_s1_bias_relu(
    x: jnp.ndarray,        # [N, H, WB, C] bf16/f32 folded activations
    wl: jnp.ndarray,       # [3C, C'] (x.dtype)
    wc: jnp.ndarray,
    wr: jnp.ndarray,
    bias: jnp.ndarray,     # [C'] f32
    rows: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Float twin of qconv3x3_s1_requant: fused folded 3x3/s1 conv +
    bias + ReLU for the bf16 inference path. Same tap-GEMM/halo-view
    structure; f32 accumulation on the MXU (preferred_element_type), so
    results match the XLA folded conv to accumulation-order tolerance.
    bf16's (16, 128) tiling pads WB=109 only to 112 (97% M rows, vs
    int8's 109/128)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, wb, c = x.shape
    cout = wc.shape[1]
    assert h % rows == 0, (h, rows)
    hb = h // rows

    top_spec = pl.BlockSpec(
        (1, 1, wb, c),
        lambda bb, r: (bb, jnp.maximum(r * rows - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    bot_spec = pl.BlockSpec(
        (1, 1, wb, c),
        lambda bb, r: (bb, jnp.minimum((r + 1) * rows, h - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (1, rows, wb, c), lambda bb, r: (bb, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops = 2 * n * h * wb * (3 * c) * cout * 3
    return pl.pallas_call(
        functools.partial(_fconv_kernel, rows=rows),
        grid=(n, hb),
        in_specs=[top_spec, row_spec, bot_spec, full, full, full, full],
        out_specs=pl.BlockSpec(
            (1, rows, wb, cout), lambda bb, r: (bb, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wb, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * x.size + n * h * wb * cout
                            ) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, x, wl, wc, wr, bias.astype(jnp.float32)[None, :])


def _fconv_s2_kernel(mid_ref, bot_ref, w0_ref, w1_ref, b_ref, out_ref,
                     *, rows: int):
    p_cat, p_r = _s2_taps(mid_ref, bot_ref, rows)
    wb = p_cat.shape[1]
    dotg = _make_dotg(jnp.float32, False, rows, wb)
    acc = dotg(p_cat, w0_ref) + dotg(p_r, w1_ref)
    out_ref[0] = _bias_relu(acc, b_ref, out_ref.dtype, rows, wb)


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def fconv3x3_s2_bias_relu(
    x: jnp.ndarray,        # [N, H, WB, C] bf16/f32 (H even)
    w0: jnp.ndarray,       # [3C, C'] (x.dtype)
    w1: jnp.ndarray,
    bias: jnp.ndarray,     # [C'] f32
    rows: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Float twin of qconv3x3_s2_requant: [N, H, WB, C] ->
    [N, H//2, WB, C'] with bias + ReLU. ``rows`` must divide H//2."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, wb, c = x.shape
    cout = w0.shape[1]
    assert h % 2 == 0, h
    h_out = h // 2
    assert h_out % rows == 0, (h_out, rows)
    hb = h_out // rows

    bot_spec = pl.BlockSpec(
        (1, 1, wb, c),
        lambda bb, r: (bb, jnp.minimum(2 * (r + 1) * rows, h - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_spec = pl.BlockSpec(
        (1, 2 * rows, wb, c), lambda bb, r: (bb, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops = 2 * n * h_out * wb * (3 * c) * cout * 2
    return pl.pallas_call(
        functools.partial(_fconv_s2_kernel, rows=rows),
        grid=(n, hb),
        in_specs=[in_spec, bot_spec, full, full, full],
        out_specs=pl.BlockSpec(
            (1, rows, wb, cout), lambda bb, r: (bb, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_out, wb, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size + n * h_out * wb * cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, w0, w1, bias.astype(jnp.float32)[None, :])


def _fup_kernel(mid_ref, a_ref, b_ref, bias_ref, out_ref, *, rows: int):
    x = mid_ref[0]
    r, wb, _c = x.shape
    dotg = _make_dotg(jnp.float32, False, r, wb)
    y0 = _bias_relu(dotg(x, a_ref), bias_ref, out_ref.dtype, r, wb)
    y1 = _bias_relu(dotg(x, b_ref), bias_ref, out_ref.dtype, r, wb)
    q = jnp.stack([y0, y1], axis=1)
    out_ref[0] = q.reshape(2 * rows, q.shape[2], q.shape[3])


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def fup_bias_relu(
    x: jnp.ndarray,        # [N, H, WB, C] bf16/f32
    a: jnp.ndarray,        # [C, C'] (x.dtype) — even rows (w[1, 0])
    b: jnp.ndarray,        # [C, C'] — odd rows (w[0, 0])
    bias: jnp.ndarray,     # [C'] f32
    rows: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Float twin of qup_requant: the folded 2x upsample as two
    dilation-free GEMMs + bias + ReLU, [N, H, WB, C] -> [N, 2H, WB, C'].
    The XLA GEMM form of this op loses to conv_transpose on the
    interleave materialization (DESIGN.md §6); here the interleave is an
    outer-dim stack in VMEM."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, wb, c = x.shape
    cout = a.shape[1]
    assert h % rows == 0, (h, rows)
    hb = h // rows

    in_spec = pl.BlockSpec(
        (1, rows, wb, c), lambda bb, r: (bb, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops = 2 * n * h * wb * c * cout * 2
    return pl.pallas_call(
        functools.partial(_fup_kernel, rows=rows),
        grid=(n, hb),
        in_specs=[in_spec, full, full, full],
        out_specs=pl.BlockSpec(
            (1, 2 * rows, wb, cout), lambda bb, r: (bb, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, wb, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size + n * 2 * h * wb * cout
                            ) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, a, b, bias.astype(jnp.float32)[None, :])


def mosaicize_folded(spec, arrays, dtype):
    """Rewrite the FLOAT folded net's eligible entries to the Mosaic GEMM
    kernels: "s1" -> ("fs1", (wl, wc, wr, bias, w)), "s2" ->
    ("fs2", (w0, w1, bias, w)), "up" -> ("fup", (a, b, bias, w)); taps
    in ``dtype`` (the net's compute dtype), original kernels kept for
    the rows==1 fallbacks. Only for non-quantized inferers — the int8
    path has its own rewrite (mosaicize_qspec)."""
    out_spec, out_arrays = [], []
    for kind, entry in zip(spec, arrays):
        if kind in ("s1", "s2") and entry[0].shape[2] % 128 == 0:
            w, b = entry
            kh, kw, cin, cout = w.shape
            taps = [
                jnp.reshape(w[:, t], (kh * cin, cout)).astype(dtype)
                for t in range(kw)
            ]
            out_spec.append("fs1" if kind == "s1" else "fs2")
            out_arrays.append(tuple(taps) + (b, w))
            continue
        if kind == "up" and entry[0].shape[2] % 128 == 0:
            w, b = entry
            out_spec.append("fup")
            out_arrays.append(
                (jnp.asarray(w[1, 0]).astype(dtype),
                 jnp.asarray(w[0, 0]).astype(dtype), b, w)
            )
            continue
        out_spec.append(kind)
        out_arrays.append(entry)
    return tuple(out_spec), tuple(out_arrays)


def quantize_up_entry(entry):
    """Quantize a folded "up" entry's bf16 kernel for the int8 GEMM form.

    entry = (w [2,1,C,C'] f32/bf16, s_in [C], inv [C'], offset [C'])
    (quantize_folded's "up" layout: the epilogue was
    requant(conv_transpose(x * s_in, w), inv, offset)). Folding s_in
    into the kernel rows and per-output-channel-quantizing gives
    (a, b, scale, offset) for qup_requant, introducing only the same
    per-channel int8 weight error every other conv already carries.
    """
    w, s_in, inv, offset = entry
    w = w.astype(jnp.float32) * s_in.astype(jnp.float32)[None, None, :, None]
    s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0, 1e-20)
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    return (w_q[1, 0], w_q[0, 0],
            s_w * inv.astype(jnp.float32), offset.astype(jnp.float32))


def mosaicize_qspec(qspec, qarrays, quantize_up: bool = False,
                    flatten: bool = False,
                    kinds: tuple = ("qs1", "qs2"),
                    limit: "int | None" = None):
    """Rewrite eligible "qs1"/"qs2" entries to Mosaic form ("ms1"/"ms2").

    Eligible: plain folded stride-1/2 convs (no :pad4 stem suffix — its
    24-lane concat offsets are not 128-multiples) whose folded cin is a
    multiple of 128 lanes. Each rewritten entry carries the tap GEMMs,
    the requant affine, and the original kernel so apply_folded_int8
    can fall back to the XLA conv for heights with no usable row-block
    divisor. The rewrite is bit-exact vs the XLA int8 path.

    ``kinds`` selects which conv kinds to rewrite: at the fast tile
    widths the s1 kernel beats XLA but the s2 kernel does not always
    (MOSAIC_FAST_WB table — at WB=96 XLA's s2 is faster), so the
    default policy rewrites s1 only ("s1" mode) and full s1+s2 stays
    selectable.

    ``quantize_up`` additionally rewrites the bf16 "up" layers to the
    int8 GEMM kernel ("mup", quantize_up_entry) — NOT bit-exact (the up
    weights become int8 like every other conv's); accuracy floors are
    asserted under it in tests. ``flatten`` bakes the s1 kernel's
    flattened-M variant into the rewritten entries (resolved HERE, once,
    so every compiled program of the frozen net uses the same variant).
    ``limit`` stops after that many rewrites (bisection aid —
    ANNONET_TPU_MOSAIC_LIMIT via infer.core — for localizing which
    rewritten layer a composed-program divergence enters at).
    """
    out_spec, out_arrays = [], []
    rewrites = 0

    def taps(w_q):
        # on-device: w_q[:, t].reshape is a pure layout op — no host
        # readback (the dev tunnel downloads at ~0.6-15 MB/s)
        kh, kw, cin, cout = w_q.shape
        return [jnp.reshape(w_q[:, t], (kh * cin, cout)) for t in range(kw)]

    for kind, entry in zip(qspec, qarrays):
        open_slot = limit is None or rewrites < limit
        if kind == "qs1" and "qs1" in kinds and open_slot:
            w_q, scale, offset = entry
            cin = w_q.shape[2]
            if cin % 128 == 0 and w_q.shape[:2] == (3, 3):
                wl, wc, wr = taps(w_q)
                out_spec.append("ms1:flat" if flatten else "ms1")
                out_arrays.append((wl, wc, wr, scale, offset, w_q))
                rewrites += 1
                continue
        if kind == "qs2" and "qs2" in kinds and open_slot:
            w_q, scale, offset = entry
            cin = w_q.shape[2]
            if cin % 128 == 0 and w_q.shape[:2] == (3, 2):
                w0, w1 = taps(w_q)
                out_spec.append("ms2:flat" if flatten else "ms2")
                out_arrays.append((w0, w1, scale, offset, w_q))
                rewrites += 1
                continue
        if (kind == "up" and quantize_up and open_slot
                and entry[0].shape[2] % 128 == 0):
            out_spec.append("mup:flat" if flatten else "mup")
            # keep the original bf16 entry for the rows==1 fallback
            # (prime input heights, e.g. the deepest up at H=109)
            out_arrays.append(quantize_up_entry(entry) + (entry,))
            rewrites += 1
            continue
        out_spec.append(kind)
        out_arrays.append(entry)
    return tuple(out_spec), tuple(out_arrays)


def pick_rows(h: int, max_rows: int = 16) -> int:
    """Largest row-block size <= max_rows dividing ``h`` (1 = no benefit)."""
    r = 1
    for cand in range(2, max_rows + 1):
        if h % cand == 0:
            r = cand
    return r


def _qconv_kernel(top_ref, mid_ref, bot_ref, wl_ref, wc_ref, wr_ref,
                  scale_ref, offset_ref, out_ref, *, rows: int,
                  flatten: bool):
    p_l, p_cat, p_r = _s1_taps(top_ref, mid_ref, bot_ref, rows)
    wb = p_cat.shape[1]
    dotg = _make_dotg(jnp.int32, flatten, rows, wb)
    acc = dotg(p_l, wl_ref) + dotg(p_cat, wc_ref) + dotg(p_r, wr_ref)
    out_ref[0] = _requant(acc, scale_ref, offset_ref, rows, wb)


@functools.partial(
    jax.jit, static_argnames=("rows", "interpret", "flatten")
)
def qconv3x3_s1_requant(
    x_q: jnp.ndarray,      # [N, H, WB, C] int8, folded activations
    wl: jnp.ndarray,       # [3C, C] int8 (build_tap_gemms)
    wc: jnp.ndarray,
    wr: jnp.ndarray,
    scale: jnp.ndarray,    # [C] f32 — s_w * inv_s_out (quantize_folded)
    offset: jnp.ndarray,   # [C] f32 — b * inv_s_out + 0.5
    rows: int = 8,
    interpret: bool | None = None,
    flatten: bool = False,
) -> jnp.ndarray:
    """Fused int8 folded 3x3/s1 conv + requant; returns int8 [N, H, WB, C].

    ``rows`` must divide H. Exactly equal (tested) to
    quantized_runtime's requant(qconv(x, w_q, (1, 1), [(1,1),(1,1)])).
    ``interpret=None`` auto-selects the pallas interpreter off-TPU (the
    CPU test meshes).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, wb, c = x_q.shape
    cout = wc.shape[1]
    assert h % rows == 0, (h, rows)
    hb = h // rows

    # H-halo rows: x itself passed twice more with 1-row blocks whose index
    # maps (block size 1 => block units == element units on that dim) pick
    # the row above/below the block, edge-clamped; the kernel masks the
    # clamped rows to the conv's zero padding. No extra HBM arrays.
    top_spec = pl.BlockSpec(
        (1, 1, wb, c),
        lambda b, r: (b, jnp.maximum(r * rows - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    bot_spec = pl.BlockSpec(
        (1, 1, wb, c),
        lambda b, r: (b, jnp.minimum((r + 1) * rows, h - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (1, rows, wb, c), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    flops = 2 * n * h * wb * (3 * c) * cout * 3
    bytes_accessed = (x_q.size + 2 * n * hb * wb * c
                      + n * h * wb * cout + 3 * 3 * c * cout)
    return pl.pallas_call(
        functools.partial(_qconv_kernel, rows=rows, flatten=flatten),
        grid=(n, hb),
        in_specs=[top_spec, row_spec, bot_spec,
                  full, full, full, full, full],
        out_specs=pl.BlockSpec(
            (1, rows, wb, cout), lambda b, r: (b, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wb, cout), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x_q, x_q, x_q, wl, wc, wr,
      scale.astype(jnp.float32)[None, :], offset.astype(jnp.float32)[None, :])
