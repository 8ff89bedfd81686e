"""Pallas TPU kernel: ramp-weighted tile accumulation onto the blend canvas.

The inference epilogue takes the per-tile class logits [n, K, th, tw] and
accumulates ``logits * ramp`` into the padded canvas [K, Hp, Wp] at each
tile's (static) position — the device replacement for the reference's
per-pixel host blending loops (annonet_infer.cpp:116-164).

The XLA formulation (unrolled .at[].add) leaves scheduling to the compiler;
this kernel makes the data movement explicit: a sequential grid over
(tile, row-slab) steps DMAs one slab of logits and the matching canvas
window into VMEM, fuses the multiply-accumulate on the VPU, and DMAs the
window back — no full-canvas copies, slab-sized VMEM footprint, and the
canvas stays in HBM (input/output aliased, updated in place).

Tile positions arrive via scalar prefetch so one compiled kernel serves any
layout with the same (n, tile, canvas) geometry.

STATUS — opt-in, hardware-incompatible with the shipped geometry (round-2
A/B): under the width-folded net, tile widths are fold-aligned (e.g. 872),
and Mosaic rejects the kernel's HBM slab DMA ("Slice shape along dimension
3 must be aligned to tiling (128), but is 872"). The XLA blend it would
replace costs ~5.5 ms of a 46 ms 4096^2 image (12%), so re-padding tiles to
128-wide multiples just for this kernel would cost more in forward FLOPs
than the epilogue could save. Kept interpret-tested for the record;
use only with 128-multiple tile widths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blend_kernel(
    yx_ref,  # scalar prefetch: [n, 2] int32 tile positions
    logits_ref,  # ANY/HBM [n, k, th, tw] f32
    ramp_ref,  # VMEM [th, tw] f32
    acc_in_ref,  # ANY/HBM [k, hp, wp] f32 (aliased to output)
    acc_out_ref,  # ANY/HBM [k, hp, wp] f32
    tile_buf,  # VMEM [k, slab, tw] f32 scratch
    acc_buf,  # VMEM [k, slab, tw] f32 scratch
    sem_tile,
    sem_acc_in,
    sem_acc_out,
    *,
    slab: int,
    tile_w: int,
):
    i = pl.program_id(0)  # tile index
    s = pl.program_id(1)  # slab index within the tile
    y = yx_ref[i, 0] + s * slab
    x = yx_ref[i, 1]

    load_tile = pltpu.make_async_copy(
        logits_ref.at[i, :, pl.ds(s * slab, slab), :],
        tile_buf,
        sem_tile,
    )
    load_acc = pltpu.make_async_copy(
        acc_out_ref.at[:, pl.ds(y, slab), pl.ds(x, tile_w)],
        acc_buf,
        sem_acc_in,
    )
    load_tile.start()
    load_acc.start()
    load_tile.wait()
    load_acc.wait()

    acc_buf[:] = acc_buf[:] + tile_buf[:] * ramp_ref[pl.ds(s * slab, slab), :][None]

    store = pltpu.make_async_copy(
        acc_buf,
        acc_out_ref.at[:, pl.ds(y, slab), pl.ds(x, tile_w)],
        sem_acc_out,
    )
    store.start()
    store.wait()


def _pick_slab(tile_h: int) -> int:
    for slab in (256, 128, 64, 32, 16, 8):
        if tile_h % slab == 0:
            return slab
    return tile_h


@functools.partial(
    jax.jit, static_argnames=("padded_h", "padded_w", "interpret")
)
def blend_accumulate(
    logits: jnp.ndarray,  # [n, k, th, tw] f32 (channel-first tile logits)
    tile_yx: jnp.ndarray,  # [n, 2] int32
    ramp: jnp.ndarray,  # [th, tw] f32
    *,
    padded_h: int,
    padded_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Accumulate ramp-weighted tiles into a zeroed [k, Hp, Wp] canvas."""
    n, k, th, tw = logits.shape
    slab = _pick_slab(th)
    acc = jnp.zeros((k, padded_h, padded_w), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, th // slab),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # logits stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ramp
            pl.BlockSpec(memory_space=pl.ANY),  # acc in (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((k, slab, tw), jnp.float32),
            pltpu.VMEM((k, slab, tw), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(_blend_kernel, slab=slab, tile_w=tw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, padded_h, padded_w), jnp.float32),
        input_output_aliases={3: 0},  # acc buffer updated in place
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    return kernel(tile_yx, logits, ramp, acc)
