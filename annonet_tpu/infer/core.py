"""Tiled inference: batched tile forward, on-device blending, argmax + gains,
detection-level blob filtering.

The TPU-native re-design of annonet_infer (annonet_infer.cpp:32-240):

  reference (per image, per tile, host loops)      here (per image, one jit)
  -------------------------------------------      -------------------------
  sequential per-tile net.Forward                  ONE batched [n,T,T,C] forward
  host-side per-pixel ramp blending (:116-164)     device scatter-add with a
                                                   shared ramp weight map
  host-side argmax + gains (:170-185)              device argmax over blended
                                                   logits + gain vector
  detection seeds (:187-212)                       device seed mask
  dlib::label_connected_blobs veto (:217-238)      host blob veto (ops.blobs)

Per-class gains are added in LOGIT space after blending and detection levels
compare blended logit margins (gain enters the argmax, the seed test uses
gain-free outputs, annonet_infer.cpp:170-212) — with one documented
deviation: the blend is normalized by the ramp sum BEFORE gains are added,
so gains/detection levels mean the same thing at every pixel, whereas the
reference compares against unnormalized (ramp-sum-inflated) logits inside
tile-overlap bands (PARITY.md "Documented behavioral deviations";
pinned by tests/test_infer.py::
test_gain_semantics_in_overlap_bands_documented_deviation). The opt-in
compat mode (--reference-blend-semantics /
TiledInferer(reference_blend_semantics=True)) reproduces the reference's
unnormalized comparisons in this framework's own grid, so tuned
gains/levels carry over from reference deployments.

Compilation: one XLA program per (padded size, tile shape, tile-count
bucket); gains/detection levels are traced arguments so changing them never
recompiles.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from annonet_tpu.utils.compile_opts import opt_jit

from annonet_tpu.models.segnet import (
    SegNetConfig,
    apply_runtime,
    required_input_dimension,
)
from annonet_tpu.infer.tiling import (
    TilePlan,
    TilingParameters,
    bucket_dim,
    inverse_weight_sum,
    plan_for_counts,
    plan_tiles,
    ramp_weights,
    weight_sum_factors,
)

# images are padded up to compile buckets before tracing, so nearby image
# sizes share compiled programs (see tiling.bucket_dim)
_CANVAS_BUCKET = 128
from annonet_tpu.ops.blobs import label_connected_blobs


def _mosaic_int8_mode() -> str:
    """Mosaic-kernel policy for the int8 net (ops/int8_conv_mosaic.py).

    ANNONET_TPU_MOSAIC_INT8: "0"=off, "s1"=stride-1 convs only,
    "1"=stride-1+2 convs (both bit-exact vs the XLA path IN INTERPRET
    MODE, tests/test_int8_conv_mosaic.py), "2"=additionally quantize the
    bf16 up layers to the int8 GEMM kernel (NOT bit-exact — int8 up
    weights; accuracy floors asserted in tests). Unset = off — the
    composed device A/B lost (scripts/ab_mosaic_int8.py, DESIGN.md §21).

    HARDWARE FENCE: on a real TPU backend the composed program's labels
    drift from the same-plan XLA arm (66,371 px at 4096² — root-caused
    in round 4, DESIGN.md §34: the pallas custom call perturbs XLA's
    layout/fusion of the DOWNSTREAM bf16 "up" conv_transpose, whose
    accumulation order shifts and ~2% of its requant outputs flip by
    exactly ±1; the Mosaic kernels themselves are bit-exact on
    hardware). The int8 stack's contract is program-variant
    bit-stability, which this path cannot offer — so a non-off mode
    REFUSES to run on any non-CPU backend unless
    ANNONET_TPU_MOSAIC_INT8_UNSAFE=1 acknowledges the label drift
    (measurement scripts only; the composed program is also 0.56x XLA).

    Whatever the mode, the rewrite only applies to tile plans whose
    folded width is in the measured-fast set (MOSAIC_FAST_WB — the
    kernels are PATHOLOGICAL at other widths, e.g. 4x slower at the
    872-px plan's WB=109), checked per plan in _get_quantized."""
    import os

    flag = os.environ.get("ANNONET_TPU_MOSAIC_INT8")
    mode = {"s1": "s1", "1": "s1s2", "2": "up"}.get(flag or "", "off")
    if mode != "off":
        import jax

        platform = jax.devices()[0].platform
        if platform != "cpu":
            if os.environ.get("ANNONET_TPU_MOSAIC_INT8_UNSAFE") == "1":
                import sys

                print(
                    "WARNING: ANNONET_TPU_MOSAIC_INT8 on the "
                    f"{platform!r} backend: labels drift ±1-requant-step "
                    "from the XLA arm (downstream bf16 layer "
                    "accumulation-order shift, DESIGN.md §34); "
                    "continuing because ANNONET_TPU_MOSAIC_INT8_UNSAFE=1",
                    file=sys.stderr,
                )
            else:
                raise RuntimeError(
                    "ANNONET_TPU_MOSAIC_INT8 is a measurement-only flag: "
                    f"on the {platform!r} backend the composed program's "
                    "labels drift from the XLA arm (the custom call "
                    "shifts a downstream bf16 layer's accumulation "
                    "order; ±1 requant steps, ~0.2-0.4% of labels — "
                    "DESIGN.md §34), and it is slower than XLA anyway. "
                    "Unset it, run on CPU, or set "
                    "ANNONET_TPU_MOSAIC_INT8_UNSAFE=1 to acknowledge "
                    "the drift (measurement only)."
                )
    return mode


def _gather_sublane() -> bool:
    """A/B knob for the tile-gather axis order (trace-time, like _head_dot).

    The int8 conv emitters want the tile batch second-minor ("batch in
    sublanes"); a leading-axis jnp.stack therefore costs a separate
    relayout copy of the whole tile batch (copy.140, 1.94 ms/image at
    4096² — profiled in scripts/analyze_int8_hlo.py). Stacking with the
    tile axis second-minor and transposing back is logically identical
    but lets XLA keep the stack's natural row-major layout and turn the
    transpose into a relabel. Measured composed A/B:
    scripts/ab_gather_order.py."""
    import os

    return os.environ.get("ANNONET_TPU_GATHER_ORDER") == "sublane"


def _blend_strips() -> bool:
    """A/B knob (trace-time): accumulate the blend canvas as per-tile-row
    strips + one sublane-aligned concat overlap-add along H, instead of a
    tile-count-deep serialized dynamic-update-slice chain.

    Measured (scripts/ab_blend_strips.py, 4096² int8): a WASH — 774.9 vs
    778.2 Mpx/s — XLA already overlaps the DUS chain with the convs; and
    NOT bit-identical in y-overlap bands (the strip pre-sums regroup the
    adds: (a1+a2)+(b1+b2) vs (((a1+a2)+b1)+b2); 26/16.8M px flipped).
    Default OFF; kept for re-measurement on future toolchains."""
    import os

    return os.environ.get("ANNONET_TPU_BLEND_STRIPS") == "1"


def _accumulate_canvas(
    weighted, tile_yx, m, hp, row_width, tile_h, piece_w, x_to_col, bd
):
    """Sum ramp-weighted tile contributions into the [m, hp, row_width]
    canvas. weighted is [n, m, tile_h, piece_w]; tile i covers rows
    [y, y+tile_h) and columns [x_to_col(x), x_to_col(x)+piece_w).

    SHIPPED layout: the flat serialized update-slice chain. The strip
    alternative (per-tile-row strips + one sublane-aligned H-concat;
    opt-in via ANNONET_TPU_BLEND_STRIPS=1) measured a WASH and regroups
    the float adds in y-overlap bands — see _blend_strips."""
    ys = sorted({y for y, _ in tile_yx})
    usable = (
        _blend_strips()
        and len(ys) > 1
        and ys[0] == 0
        and ys[-1] + tile_h == hp
        # full coverage, and only CONSECUTIVE strips may overlap
        and all(yb - ya <= tile_h for ya, yb in zip(ys, ys[1:]))
        and all(yb - ya >= tile_h for ya, yb in zip(ys, ys[2:]))
    )
    if not usable:
        acc = jnp.zeros((m, hp, row_width), bd)
        for i, (y, x) in enumerate(tile_yx):
            col = x_to_col(x)
            acc = acc.at[:, y : y + tile_h, col : col + piece_w].add(
                weighted[i]
            )
        return acc

    strips = {}
    for i, (y, x) in enumerate(tile_yx):
        col = x_to_col(x)
        strip = strips.get(y)
        if strip is None:
            strip = jnp.zeros((m, tile_h, row_width), bd)
        strips[y] = strip.at[:, :, col : col + piece_w].add(weighted[i])

    pieces = []
    prev_tail = None
    for j, y in enumerate(ys):
        lo = 0 if j == 0 else ys[j - 1] + tile_h - y
        hi = tile_h if j + 1 == len(ys) else ys[j + 1] - y
        if j > 0 and lo > 0:
            # overlap band with the previous strip: per-pixel add order
            # matches the flat chain (earlier tile row first)
            pieces.append(prev_tail + strips[y][:, :lo])
        if hi > lo:
            pieces.append(strips[y][:, lo:hi])
        prev_tail = strips[y][:, hi:]
    return jnp.concatenate(pieces, axis=1)


def _stack_tiles(slices):
    """jnp.stack(slices) (-> [n, m, th, tw, c]) with a layout-motivated
    axis order (see _gather_sublane)."""
    if _gather_sublane():
        tiles = jnp.stack(slices, axis=3)  # [m, th, tw, n, c]
        return jnp.transpose(tiles, (3, 0, 1, 2, 4))
    return jnp.stack(slices)


def _tiled_forward(
    params,
    image: jnp.ndarray,  # [H, W, C] uint8 (unpadded)
    gains: jnp.ndarray,  # [K] float32
    detection_levels: jnp.ndarray,  # [K] float32
    ramp: jnp.ndarray,  # [th, tw] float32
    inv_wsum: jnp.ndarray,  # [Hp, Wp] float32 (per-plan constant)
    *,
    config: SegNetConfig,
    padded_h: int,
    padded_w: int,
    tile_yx: Tuple[Tuple[int, int], ...],  # STATIC tile positions
    tile_h: int,
    tile_w: int,
    forward_chunk: int,
    with_detection: bool,
    folded=None,  # (fold0, spec): params is then the folded array tuple
    quantized: bool = False,  # spec/params are the int8 qspec/qarrays
    wsum_factors=None,  # (wy[Hp], wx[Wp]) np: wsum separable over the grid
    blend_dtype=jnp.float32,  # accumulation dtype of the blend epilogue
    use_pallas_blend: bool = False,
    mesh=None,
    mesh_axis: str = "batch",
    # reference-blend compat (annonet_infer.cpp:146-161,176-185,205-211):
    # compare gains and detection-seed margins against the UNNORMALIZED
    # ramp-sum accumulation s(p)*blended — the reference's semantics
    # inside tile-overlap bands — instead of normalizing first. With zero
    # gains and levels the label maps are identical (argmax is invariant
    # under the positive per-pixel scale s); under nonzero gains/levels
    # this lets reference users carry tuned values over unchanged.
    reference_blend: bool = False,
):
    # Tile positions are a deterministic function of the compile key (padded
    # canvas + tile shape + overlap), so they are baked in as constants:
    # the gather and the blend below use STATIC slices XLA can fuse and
    # schedule without dynamic-update-slice copies, and no bucket-padding
    # dummy tiles are ever forwarded.
    #
    # An optional leading image-batch dim M rides through the whole program
    # (tile gather, forward batch = M*T tiles, blend, argmax): same-sized
    # images share one plan, and batching amortizes per-call host overhead
    # for directories of small images. The DEVICE program itself is fast
    # even at batch 1 — a lone 512² image forwards in 0.49 ms (538 Mpx/s,
    # folded-float; scripts/probe_small_image.py): width-folding keeps the
    # MXU fed without a tile batch. The round-2 "65 Mpx/s at 512²" was the
    # per-CALL rate on the dev harness, which is 100% host->device
    # transfer-bound there (786 KB at ~33 MB/s = 23.6 ms; DESIGN.md §13
    # has the roofline — ~300 Mpx/s per-call on a PCIe host).
    batched = image.ndim == 4
    if not batched:
        image = image[None]
    m = image.shape[0]
    n = len(tile_yx)
    h, w, c = image.shape[1:]
    hp, wp = padded_h, padded_w
    k = config.class_count

    # replicate-pad on device (outpaint parity, annonet_infer.cpp:71-75)
    padded_image = jnp.pad(
        image, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)), mode="edge"
    )

    # under the folded net the logits stay width-folded with class-major
    # lanes all the way into the blend (the full unfold reshape is a
    # measured ~2.1 ms/image relayout chain; per-class lane slices are free).
    # Requires fold-aligned tile x offsets (tiling._positions snaps to 8;
    # the guard covers its rare unsnapped fallback).
    folded_out = (
        folded is not None
        and not use_pallas_blend
        and all(x % folded[0] == 0 for (_, x) in tile_yx)
    )
    pre_quantize = quantized and folded_out

    if pre_quantize:
        # quantize + width-fold the whole padded image ONCE and gather int8
        # tiles from it: overlapping pixels quantize once, and the tile
        # batch materializes directly (re-quantizing per tile measured a
        # 2.5 ms/image int8 relayout between the quantize and the stem)
        from annonet_tpu.models.quantized_runtime import quantize_input

        f0 = folded[0]
        q_img = quantize_input(padded_image, f0, folded[1])
        lanes = q_img.shape[-1]
        tiles = _stack_tiles(
            [
                lax.slice(
                    q_img,
                    (0, y, x // f0, 0),
                    (m, y + tile_h, (x + tile_w) // f0, lanes),
                )
                for (y, x) in tile_yx
            ]
        )  # [n, m, th, twb, f0*C'] int8
    else:
        tiles = _stack_tiles(
            [
                lax.slice(
                    padded_image,
                    (0, y, x, 0),
                    (m, y + tile_h, x + tile_w, c),
                )
                for (y, x) in tile_yx
            ]
        )  # [n, m, th, tw, C]
    tiles = tiles.reshape((n * m,) + tiles.shape[2:])

    if folded is not None and quantized:
        # int8 folded net: conv stack on the 2x-rate int8 MXU path, bf16
        # up layers, f32 logits out (models/quantized_runtime.py)
        from annonet_tpu.models.quantized_runtime import apply_folded_int8

        fold0, qspec = folded
        run_net = lambda batch: apply_folded_int8(  # noqa: E731
            params, batch, config, fold0=fold0, qspec=qspec,
            folded_output=folded_out, pre_folded=pre_quantize,
        )
    elif folded is not None:
        # fully width-folded net: every conv runs at MXU-native channel
        # counts (models/folded_runtime.py; measured ~1.8x over the plain
        # conv stack on v5e)
        from annonet_tpu.models.folded_runtime import apply_folded_split

        fold0, spec = folded
        run_net = lambda batch: apply_folded_split(  # noqa: E731
            params, batch, config, fold0=fold0, spec=spec,
            folded_output=folded_out,
        )
    else:
        run_net = lambda batch: apply_runtime(params, batch, config)  # noqa: E731

    if mesh is not None:
        # tile-parallel inference (the spatial analog of context/sequence
        # parallelism, SURVEY.md §2.3): shard the tile batch over the mesh;
        # GSPMD partitions the batched convs, one all-gather brings the
        # logits back for blending
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharded = NamedSharding(mesh, P(mesh_axis))
        tiles = lax.with_sharding_constraint(tiles, sharded)
        logits = run_net(tiles)
        logits = lax.with_sharding_constraint(
            logits, NamedSharding(mesh, P())
        )
    elif n * m > forward_chunk and (n * m) % forward_chunk == 0:
        # chunk the batch so HBM holds one chunk of activations at a time
        # while the MXU stays on large batched convs (shape-agnostic:
        # pre-quantized tiles are already width-folded)
        tiles = tiles.reshape(
            (n * m // forward_chunk, forward_chunk) + tiles.shape[1:]
        )
        logits = lax.map(run_net, tiles)  # [nm/chunk, chunk, th, tw|twb, *]
    else:
        logits = run_net(tiles)
    logits = logits.reshape((n, m, tile_h) + logits.shape[-2:])

    # blend PER CLASS PLANE: every tensor in the blend keeps its two
    # spatial dims minor (clean (8,128) tiling), never letting the tiny
    # class/tile dims fall into the lane/sublane positions — a bulk
    # transpose to [n,K,th,tw] here lets XLA pick layouts that pad the
    # (n,K) pair up to (8,128) with 40x memory blowups. The per-class
    # planes also mirror the reference's own representation
    # (annonet_infer.cpp:86-89). inv_wsum is a per-plan host constant.
    if folded_out:
        # the ENTIRE blend/argmax/detection epilogue stays width-folded:
        # the K*f class-major lanes ride through the scatter-add (tile x
        # offsets are always fold-multiples — tiling._positions snaps to 8),
        # per-pixel constants (ramp, inv_wsum) fold with free reshapes, and
        # only the final uint8 label map unfolds. Unfolding f32 planes
        # instead measured ~5.4 ms/image of relayout chains on v5e.
        f = logits.shape[-1] // k
        wpb = wp // f
        kf = k * f
        # FLAT 2-D accumulation: a [Hp, WPb, K*f] accumulator would put the
        # tiny K*f dim in the lane position, which TPU layouts pad to 128
        # lanes — 5.3x memory on every link of the 25-step add chain
        # (measured: 19.8G > HBM). Merging (WPb, K*f) keeps the minor dim
        # wide and tile updates contiguous (each width-block owns its full
        # K*f lane group).
        twb = tile_w // f
        # the blend epilogue re-traverses a [M, Hp, WPb*K*f] accumulator
        # (201 MB f32 at 4096²) several times — ramp multiply, 25-step add
        # chain, inv-wsum multiply, argmax relayout — all HBM-bound. On the
        # int8 path (already non-bit-exact, floors asserted) the whole
        # chain runs in bf16: the convert fuses into the head epilogue and
        # every pass moves half the bytes. The float path stays f32 for
        # bit-parity with the unbatched/unfolded paths.
        bd = jnp.dtype(blend_dtype)
        ramp_cm = jnp.broadcast_to(
            ramp.reshape(tile_h, twb, 1, f), (tile_h, twb, k, f)
        ).reshape(tile_h, twb * kf).astype(bd)
        weighted = (
            logits.reshape(n, m, tile_h, twb * kf).astype(bd)
            * ramp_cm[None, None]
        )
        acc = _accumulate_canvas(
            weighted, tile_yx, m, hp, wpb * kf, tile_h, twb * kf,
            lambda x: (x // f) * kf, bd,
        )
        import os as _os

        if reference_blend:
            # compat: gains/margins meet the raw ramp-sum accumulation —
            # no normalization pass at all (cheaper than either branch
            # below; the semantics difference IS the absence of 1/wsum)
            b4 = acc.reshape(m, hp, wpb, k, f)
            labels4 = jnp.argmax(
                b4 + gains.astype(bd)[None, None, None, :, None], axis=3
            ).astype(jnp.int32)  # [M, Hp, WPb, f]
        elif (
            not with_detection
            and quantized
            and wsum_factors is not None
            and _os.environ.get("ANNONET_TPU_NO_ARGMAX_FOLD") != "1"
        ):
            # argmax is invariant to the shared positive per-pixel
            # normalization 1/wsum: argmax_k(acc*inv + g) ==
            # argmax_k(acc + g*wsum). wsum factorizes exactly over grid
            # plans (tiling.weight_sum_factors), so the gain term enters
            # the argmax as fused 1-D broadcasts and the full-canvas
            # inv-wsum broadcast/convert/multiply passes disappear
            # (measured: scripts/ab_argmax_norm.py). int8-path only:
            # skipping the normalize reorders float rounding near exact
            # ties, and the float path pins bit-parity with the
            # unbatched/unfolded reference blending.
            wy, wx = wsum_factors
            acc4 = acc.reshape(m, hp, wpb, k, f)
            gain_term = (
                gains.astype(bd)[None, None, None, :, None]
                * jnp.asarray(wy, bd)[None, :, None, None, None]
                * jnp.asarray(wx.reshape(wpb, f), bd)[None, None, :, None, :]
            )
            labels4 = jnp.argmax(acc4 + gain_term, axis=3).astype(
                jnp.int32
            )  # [M, Hp, WPb, f]
        else:
            inv_cm = jnp.broadcast_to(
                inv_wsum.reshape(hp, wpb, 1, f), (hp, wpb, k, f)
            ).reshape(hp, wpb * kf).astype(bd)
            b4 = (acc * inv_cm[None]).reshape(m, hp, wpb, k, f)
            labels4 = jnp.argmax(
                b4 + gains.astype(bd)[None, None, None, :, None], axis=3
            ).astype(jnp.int32)  # [M, Hp, WPb, f]
        out_dtype = jnp.uint8 if k <= 255 else jnp.int32
        labels = labels4.reshape(m, hp, wp)
        if not batched:
            labels = labels[0]
        if not with_detection:
            return labels.astype(out_dtype)
        clean4 = b4[:, :, :, 0, :]
        onehot4 = (
            labels4[:, :, :, None, :]
            == jnp.arange(k, dtype=jnp.int32)[None, None, None, :, None]
        )
        dlev = detection_levels.astype(bd)
        label_output = jnp.sum(
            jnp.where(onehot4, b4, jnp.zeros((), bd)), axis=3
        )
        label_level = jnp.sum(
            jnp.where(
                onehot4, dlev[None, None, None, :, None], jnp.zeros((), bd)
            ),
            axis=3,
        )
        seeds4 = (labels4 > 0) & (
            label_output - clean4 > label_level - dlev[0]
        )
        seeds = seeds4.reshape(m, hp, wp)
        if not batched:
            seeds = seeds[0]
        return labels.astype(out_dtype), seeds

    if use_pallas_blend:
        from annonet_tpu.ops.pallas_blend import blend_accumulate

        assert m == 1, "pallas blend supports a single image per call"
        acc = blend_accumulate(
            jnp.transpose(logits[:, 0], (0, 3, 1, 2)),
            jnp.asarray(np.array(tile_yx, np.int32)),
            ramp,
            padded_h=hp,
            padded_w=wp,
            interpret=jax.default_backend() != "tpu",
        )
        if reference_blend:
            blended = acc[:, None]  # compat: keep the raw ramp-sum scale
        else:
            blended = (acc * inv_wsum[None])[:, None]  # [K, 1, Hp, Wp]
    else:
        planes = []
        for c in range(k):
            weighted_c = logits[..., c] * ramp[None, None]  # [n, m, th, tw]
            acc_c = jnp.zeros((m, hp, wp), jnp.float32)
            for i, (y, x) in enumerate(tile_yx):
                acc_c = acc_c.at[:, y : y + tile_h, x : x + tile_w].add(
                    weighted_c[i]
                )
            # compat mode: gains/margins meet the raw ramp-sum scale
            planes.append(acc_c if reference_blend
                          else acc_c * inv_wsum[None])
        blended = jnp.stack(planes)  # [K, M, Hp, Wp]

    labels = jnp.argmax(
        blended + gains[:, None, None, None], axis=0
    ).astype(jnp.int32)  # [M, Hp, Wp]
    # small class counts travel as uint8: host readback is 4x lighter
    out_dtype = jnp.uint8 if k <= 255 else jnp.int32

    if not with_detection:
        labels = labels if batched else labels[0]
        return labels.astype(out_dtype)

    # detection seeds compare gain-free blended logits
    # (annonet_infer.cpp:205-211). One-hot selects instead of
    # take_along_axis/fancy indexing: full-canvas gathers serialize on TPU
    # (same lesson as ops/loss.py), compare-select fuses into the argmax.
    clean_output = blended[0]
    onehot = (
        labels[None] == jnp.arange(k, dtype=jnp.int32)[:, None, None, None]
    )
    label_output = jnp.sum(jnp.where(onehot, blended, 0.0), axis=0)
    label_level = jnp.sum(
        jnp.where(onehot, detection_levels[:, None, None, None], 0.0), axis=0
    )
    seeds = (labels > 0) & (
        label_output - clean_output > label_level - detection_levels[0]
    )
    if not batched:
        labels, seeds = labels[0], seeds[0]
    return labels.astype(out_dtype), seeds


class TiledInferer:
    """Holds a runtime net and serves tiled inference on arbitrary images.

    The stateful analog of (RuntimeNet, annonet_infer_temp, tiling
    parameters) on the reference side; per-shape compiled programs are
    cached internally.
    """

    def __init__(
        self,
        runtime_params,
        config: SegNetConfig,
        tiling: Optional[TilingParameters] = None,
        forward_chunk: Optional[int] = None,
        use_folded_net: bool = True,
        use_pallas_conv: Optional[bool] = None,  # None = default (False)
        use_pallas_blend: bool = False,
        quantize: Optional[str] = None,  # "int8" = quantized conv stack
        calibration_images: int = 1,
        calibration=None,  # pre-computed per-layer maxima (export/…load)
        blend_dtype: Optional[str] = None,  # None = auto (bf16 iff int8)
        # opt-in reference-blend compat (--reference-blend-semantics):
        # gains and detection-seed margins are compared against the
        # UNNORMALIZED ramp-sum accumulation, matching the reference's
        # overlap-band semantics (annonet_infer.cpp:146-161,176-185,
        # 205-211) in this framework's own tile grid, so tuned gains/
        # levels carry over from reference deployments. Identical output
        # when all gains and detection levels are zero. PARITY.md
        # "Documented behavioral deviations".
        reference_blend_semantics: bool = False,
        mesh=None,
        mesh_axis: str = "batch",
        # None = auto (the Mosaic fast-width snap when that path is on);
        # explicit list overrides, () disables — for A/B harnesses that
        # must pin both arms to one plan
        prefer_tile_widths: Optional[Sequence[int]] = None,
        # measured plan selection: on the first image of each canvas
        # bucket, compile the default plan AND its neighbouring grid
        # counts, time each on the device, and keep the fastest
        # (docs/DESIGN.md par.22: per-shape conv rates are non-monotonic
        # in tile size, so the static heuristic can sit on a cliff for
        # canvas sizes the sweep never measured). Costs one extra XLA
        # compile (~20-40 s) per extra candidate per canvas.
        plan_autotune: bool = False,
    ):
        self.params = jax.tree_util.tree_map(jnp.asarray, runtime_params)
        self.config = config
        self.use_folded_net = use_folded_net
        if quantize not in (None, "int8"):
            raise ValueError(f"unsupported quantize mode: {quantize!r}")
        if quantize and use_pallas_conv:
            raise ValueError("quantize is incompatible with use_pallas_conv")
        if quantize and not use_folded_net:
            raise ValueError("quantize requires the folded net")
        # int8 applies once the first `calibration_images` images have
        # calibrated the activation scales (models/quantized_runtime.py):
        # per-channel maxima accumulate across those images, images seen
        # before the freeze run the exact bf16 path, and everything after
        # runs int8. The default 1 calibrates on (and quantizes from) the
        # first image alone — representative first images are assumed;
        # raise calibration_images for mixed-exposure directories. Geometry
        # that can't fold (fold0 == 0) falls back to the bf16 path per plan.
        self.quantize = quantize
        if calibration_images < 1:
            raise ValueError("calibration_images must be >= 1")
        self.calibration_images = calibration_images
        # blend accumulation dtype: the int8 path defaults to bf16 (every
        # pass over the HBM-bound blend accumulator moves half the bytes —
        # measured composed win, DESIGN.md §15); the float path stays f32
        # for bit-parity. Override with "float32"/"bfloat16" to pin either.
        if blend_dtype is None:
            blend_dtype = "bfloat16" if quantize else "float32"
        self.blend_dtype = jnp.dtype(blend_dtype)
        self.reference_blend_semantics = bool(reference_blend_semantics)
        if self.blend_dtype not in (
            jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)
        ):
            raise ValueError(f"unsupported blend_dtype: {blend_dtype!r}")
        self._quantized_cache: Dict[int, Tuple] = {}
        self._calibrate_fns: Dict[Tuple, object] = {}
        self._calib_accum: Dict[int, list] = {}
        self._calib_seen: Dict[int, int] = {}
        self._calib_frozen: Dict[int, list] = {}
        # pre-computed calibration (serialization.load_calibration or
        # export_calibration): per-REAL-channel activation maxima are
        # fold-agnostic, so a loaded set freezes the int8 net immediately
        # for ANY tile plan — every image (including the first) runs int8
        # and deployments are reproducible across restarts
        if calibration is not None and quantize is None:
            raise ValueError("calibration requires quantize='int8'")
        self._preloaded_calib = (
            [np.asarray(v, np.float32) for v in calibration]
            if calibration is not None else None
        )
        if use_pallas_conv is None:
            # the kernel wins 2.4x per layer in isolation but loses composed
            # (194 vs 359 Mpx/s e2e): pallas_call boundaries and the shifted
            # input views break XLA's whole-graph scheduling — keep opt-in
            use_pallas_conv = False
        self.use_pallas_conv = use_pallas_conv
        self._folded_cache: Dict[Tuple[int, bool], Tuple] = {}
        if tiling is None:
            # the measured hardware-conditional tile default (1088 on TPU,
            # +12% int8 / +28% bf16 over 1024 at 4096^2 — DESIGN.md par.22),
            # so library embedders get the same plan as the CLIs
            from annonet_tpu.infer.tiling import default_tile_max

            tile_max = default_tile_max()
            overlap = required_input_dimension(config)
            tiling = TilingParameters(tile_max, tile_max, overlap, overlap)
        if tiling.overlap_x < 0 or tiling.overlap_y < 0:
            raise ValueError("tile overlap must be non-negative")
        self.tiling = tiling
        # None = auto: forward the whole tile batch in one XLA call unless
        # the activation estimate exceeds the HBM budget (measured: chunked
        # lax.map costs ~2x the single batched call)
        self.forward_chunk = forward_chunk
        self.use_pallas_blend = use_pallas_blend
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        # opt-in Mosaic tap-GEMM kernels on the FLOAT folded path
        # (ANNONET_TPU_MOSAIC_FLOAT=1; the int8 path has its own flag,
        # _mosaic_int8_mode). Read once — the choice is part of this
        # inferer's compiled-program identity.
        import os as _os

        self.use_mosaic_float = (
            _os.environ.get("ANNONET_TPU_MOSAIC_FLOAT") == "1"
            and not self.quantize
            and not use_pallas_conv
        )
        # int8 Mosaic policy + flatten variant, read once: part of this
        # inferer's compiled-program identity (_mosaic_int8_mode)
        self.mosaic_int8_mode = (
            _mosaic_int8_mode() if self.quantize else "off"
        )
        self._mosaic_flatten = (
            _os.environ.get("ANNONET_TPU_MOSAIC_FLATTEN") == "1"
        )
        # stem y-tap-concat rewrite (quantized_runtime.ycat_stem_qspec):
        # bit-exact, opt-in pending the composed device A/B
        # (scripts/ab_stem_ycat.py). Read once — program identity.
        self.stem_ycat = (
            _os.environ.get("ANNONET_TPU_STEM_YCAT") == "1"
            and self.quantize == "int8"
        )
        # tests/harnesses may force the Mosaic rewrite past the fast-WB
        # gate (CPU interpret-mode suites run tiny tiles whose WB is
        # never in the measured-fast set)
        self._mosaic_force = (
            _os.environ.get("ANNONET_TPU_MOSAIC_FORCE") == "1"
        )
        self._mosaic_q_cache: Dict[Tuple, Tuple] = {}
        self._prefer_tile_widths = prefer_tile_widths
        self._compiled: Dict[Tuple, object] = {}
        self._plan_constants: Dict[TilePlan, Tuple] = {}
        self.plan_autotune = plan_autotune
        # canvas bucket (h, w) -> chosen TilePlan, and the measurement
        # record behind each choice: [(plan, Mpx/s), ...] fastest-first
        self._autotune_cache: Dict[Tuple[int, int], TilePlan] = {}
        self.autotune_reports: Dict[Tuple[int, int], list] = {}
        self._plan_override: Optional[TilePlan] = None
        self._autotuning = False
        self._calibration_paused = False

    def update_params(self, runtime_params) -> None:
        """Swap in a new parameter set of the SAME architecture, keeping
        every compiled program.

        Parameters are traced call arguments and the program cache is
        keyed on geometry only, so every ALREADY-COMPILED program is
        reused as-is — checkpoint-over-checkpoint evaluation
        (annonet_train --validation-directory) and embedder hot weight
        swaps recompile nothing they have run before. Param-derived
        caches are dropped: the folded/int8 kernels rebuild on the host
        (cheap), int8 activation calibration restarts exactly like a
        fresh inferer, and any preloaded calibration is discarded — it is
        fingerprinted to the old weights (serialization.save_calibration);
        construct a new inferer to pin one for new weights. Caveat for
        int8-with-preloaded-calibration inferers: the post-swap
        recalibration may compile programs the preloaded path never
        needed (the calibration collector, and the bf16 fallback when
        calibration_images > 1) — those are first-time compiles, not
        recompiles.
        """
        prior_folds = list(self._folded_cache.keys())
        self.params = jax.tree_util.tree_map(jnp.asarray, runtime_params)
        self._folded_cache.clear()
        self._quantized_cache.clear()
        self._mosaic_q_cache.clear()
        self._calib_accum.clear()
        self._calib_seen.clear()
        self._calib_frozen.clear()
        self._preloaded_calib = None
        # eagerly rebuild the folded variants that were in use, so the
        # first call after a hot swap doesn't pay the host fold + param
        # upload on the request path (measured ~0.9 s at 1024² on a
        # tunneled dev link; the int8 quantization is calibration-
        # dependent and rebuilds on the next image as documented)
        for fold0, _pallas, mosaic in prior_folds:
            self._get_folded(fold0, mosaic=mosaic)

    # ------------------------------------------------------------- planning

    def plan(self, image_height: int, image_width: int) -> TilePlan:
        if self._plan_override is not None:
            return self._plan_override
        if self.plan_autotune:
            chosen = self._autotune_cache.get(
                (
                    bucket_dim(image_height, _CANVAS_BUCKET),
                    bucket_dim(image_width, _CANVAS_BUCKET),
                )
            )
            if chosen is not None:
                return chosen
        lane_align = True
        prefer_widths = None
        if self.use_folded_net:
            from annonet_tpu.models.folded_runtime import folding_supported

            # under the folded net the lane dim is the folded channels, so
            # tiles only need to divide the fold — skipping the 128 round-up
            # trims ~5% redundant tile pixels
            fold = folding_supported(self.config, 8 * 128)
            lane_align = not fold
            if (
                self._prefer_tile_widths is None
                and fold
                and self.quantize
                and self.mosaic_int8_mode != "off"
                # only pay the snap's overlap tax when the rewrite will
                # actually apply: mosaicize_qspec requires 128-multiple
                # folded channels, i.e. fold * stem width == 128 (the
                # fold search caps the product at 128)
                and fold * self.config.width(0) == 128
            ):
                # steer the plan onto a folded width where the Mosaic
                # kernels are fast (they are pathological elsewhere —
                # MOSAIC_FAST_WB; WB = tile_width / fold, so scale by the
                # config's actual fold); the snap only ever grows the
                # tile, so correctness/coverage are unchanged and
                # _get_quantized falls back to the XLA net when no fast
                # width fits. NOTE the gate is stem-level: deeper levels
                # run their rewritten convs at WB/2^level, widths the
                # probe never measured — one more reason the composed
                # program lost (module STATUS).
                from annonet_tpu.ops.int8_conv_mosaic import MOSAIC_FAST_WB

                prefer_widths = sorted(fold * wb for wb in MOSAIC_FAST_WB)
        if self._prefer_tile_widths is not None:
            prefer_widths = list(self._prefer_tile_widths) or None
        plan = plan_tiles(
            image_height,
            image_width,
            self.config,
            self.tiling,
            canvas_bucket=_CANVAS_BUCKET,
            lane_align_tiles=lane_align,
            prefer_tile_widths=prefer_widths,
        )
        if not lane_align and prefer_widths is None:
            # measured count-cliff bump (docs/DESIGN.md par.24-25): XLA's
            # conv emitters collapse ~2x when an axis has exactly 3 tiles
            # ((3,3)/(3,4)/(4,3) all measured ~330-420 device-Mpx/s vs
            # (4,4)'s ~740-810, int8 AND bf16 folded paths; the 4-count
            # tiles are smaller, so the user's max-tile cap still holds
            # and the ~3% extra overlap area buys back >2x rate)
            ny = len({y for y, _ in plan.tile_yx})
            nx = len({x for _, x in plan.tile_yx})
            if ny == 3 or nx == 3:
                bumped = plan_for_counts(
                    image_height, image_width, self.config, self.tiling,
                    4 if ny == 3 else ny, 4 if nx == 3 else nx,
                    canvas_bucket=_CANVAS_BUCKET,
                    lane_align_tiles=lane_align,
                )
                if bumped is not None:
                    plan = bumped
        return plan

    def _autotune_for(self, image2d: np.ndarray) -> None:
        """Measure the default plan and its neighbouring grid counts for
        this canvas on the device; cache the fastest for every later image
        in the bucket.

        Why measured: per-shape conv rates on TPU are non-monotonic in
        tile size (docs/DESIGN.md par.22 — e.g. 1408-px tiles run ~2x
        slower per pixel than 1072-px ones), so for canvas sizes the
        static default was never measured on, the only robust selector is
        the composed program itself. Candidates are the default plan plus
        denser grids (count+1, count+2 per axis) — the max-tile flags stay
        a hard cap, so only SMALLER tiles are explored. Timing uses the
        chained-dispatch + one-scalar-readback discipline (CLAUDE.md);
        candidates are compared on the same uploaded image. The int8
        path's calibration (if not yet frozen) happens during the first
        candidate's warm-up, so all timed loops run the production
        execution path.
        """
        import os as _os
        import time as _time

        h, w = image2d.shape[:2]
        key = (bucket_dim(h, _CANVAS_BUCKET), bucket_dim(w, _CANVAS_BUCKET))
        if key in self._autotune_cache:
            return
        default = self.plan(h, w)
        ny = len({y for y, _ in default.tile_yx})
        nx = len({x for _, x in default.tile_yx})
        candidates = [default]
        lane_align = True
        if self.use_folded_net:
            from annonet_tpu.models.folded_runtime import folding_supported

            lane_align = not folding_supported(self.config, 8 * 128)
        for dy, dx in ((1, 1), (2, 2)):
            p = plan_for_counts(
                h, w, self.config, self.tiling, ny + dy, nx + dx,
                canvas_bucket=_CANVAS_BUCKET, lane_align_tiles=lane_align,
            )
            if p is not None and p not in candidates:
                candidates.append(p)
        if len(candidates) == 1:
            self._autotune_cache[key] = default
            self.autotune_reports[key] = [(default, 0.0)]
            return
        # pre-pad once and upload once: the timed loop must not move
        # pixels host->device per iteration
        h_b, w_b = key
        padded = np.pad(
            image2d, ((0, h_b - h), (0, w_b - w), (0, 0)), mode="edge"
        )
        img_dev = jnp.asarray(padded)
        float(jnp.max(img_dev).astype(jnp.int32))  # finish the upload
        trivial = jax.jit(lambda a: a[0, 0].astype(jnp.int32))
        iters = max(
            1, int(_os.environ.get("ANNONET_TPU_AUTOTUNE_ITERS", "3"))
        )
        results = []
        self._autotuning = True
        try:
            for p in candidates:
                self._plan_override = p
                try:
                    # warm-up with the HOST array: compiles the program and
                    # (first candidate, int8 path) runs calibration, whose
                    # walkers expect host pixels
                    labels, _ = self._infer(
                        padded, False, None, None, True
                    )
                    float(jnp.max(labels).astype(jnp.int32))
                    float(trivial(labels))
                    t0 = _time.monotonic()
                    for _ in range(3):
                        float(trivial(labels))
                    rtt = (_time.monotonic() - t0) / 3
                    t0 = _time.monotonic()
                    for _ in range(iters):
                        labels, _ = self._infer(
                            img_dev, False, None, None, True
                        )
                    float(jnp.max(labels).astype(jnp.int32))
                    elapsed = max(1e-9, _time.monotonic() - t0 - rtt)
                finally:
                    self._plan_override = None
                results.append((h * w * iters / 1e6 / elapsed, p))
        finally:
            self._autotuning = False
        results.sort(key=lambda t: -t[0])
        self._autotune_cache[key] = results[0][1]
        self.autotune_reports[key] = [(p, r) for r, p in results]

    def _get_compiled(
        self, plan: TilePlan, with_detection: bool, image_batch: int = 0
    ):
        # image_batch 0 = the unbatched [H,W,C] entry; M >= 1 = the batched
        # [M,H,W,C] entry (infer_arrays_batch) — distinct compiled programs
        # the tile layout is a pure function of the canvas/tile geometry, so
        # positions are compile-time constants; the key deliberately
        # excludes the raw image size — inputs arrive bucket-padded, so all
        # images sharing a bucket share one compiled program
        fold0 = 0
        if self.use_folded_net:
            from annonet_tpu.models.folded_runtime import folding_supported

            fold0 = folding_supported(self.config, plan.tile_width)
        # int8 only once calibration has frozen (the first
        # calibration_images images run the exact bf16 program)
        quantized = (
            bool(self.quantize)
            and fold0 > 0
            and fold0 in self._quantized_cache
        )
        key = (
            plan.padded_height,
            plan.padded_width,
            plan.tile_height,
            plan.tile_width,
            plan.tile_yx,
            with_detection,
            fold0,
            self.use_pallas_conv,
            self.use_mosaic_float,
            self.mosaic_int8_mode,
            quantized,
            image_batch,
            str(self.blend_dtype),
            self.reference_blend_semantics,
        )
        fn = self._compiled.get(key)
        if fn is None:
            n = plan.tile_count * max(1, image_batch)
            if self.forward_chunk is not None:
                chunk = max(1, self.forward_chunk)
            else:
                # ~bytes of live activations per tile pixel at the stem
                # width (bf16, generous multiplier for skips/temporaries)
                per_px = max(1, self.config.width(0)) * 16
                budget = 8 << 30
                max_tiles = max(
                    1, budget // (per_px * plan.tile_height * plan.tile_width)
                )
                chunk = min(n, max_tiles)
            while n % chunk:
                chunk -= 1
            folded = None
            if quantized:
                # calibration must already have run (infer_arrays does)
                qspec, _qarrays = self._get_quantized(
                    fold0, plan.tile_width
                )
                folded = (fold0, qspec)
            elif fold0:
                folded = self._get_folded(fold0)[0]
            # opt_jit == jax.jit unless ANNONET_TPU_COMPILER_OPTIONS is set
            # (per-program TPU compiler flags, utils/compile_opts.py)
            fn = opt_jit(
                partial(
                    _tiled_forward,
                    config=self.config,
                    padded_h=plan.padded_height,
                    padded_w=plan.padded_width,
                    tile_yx=plan.tile_yx,
                    tile_h=plan.tile_height,
                    tile_w=plan.tile_width,
                    forward_chunk=chunk,
                    with_detection=with_detection,
                    folded=folded,
                    quantized=quantized,
                    wsum_factors=weight_sum_factors(plan),
                    blend_dtype=self.blend_dtype,
                    use_pallas_blend=self.use_pallas_blend,
                    mesh=self.mesh,
                    mesh_axis=self.mesh_axis,
                    reference_blend=self.reference_blend_semantics,
                )
            )
            self._compiled[key] = fn
        return fn, fold0, quantized

    def _get_quantized(self, fold0: int, tile_width: int):
        """The (qspec, qarrays) to EXECUTE for a plan: the plain int8 net,
        or — when the Mosaic mode is on AND the plan's folded width is in
        the measured-fast set — the Mosaic-rewritten variant (cached; the
        rewrite itself is width-independent, eligibility is not)."""
        plain = self._quantized_cache[fold0]
        mode = self.mosaic_int8_mode

        def with_ycat(spec_arrays):
            # the stem y-cat knob applies to EVERY executed variant — the
            # plain net, Mosaic-ineligible plans, and the Mosaic rewrite
            # (whose :pad4 stem is never Mosaic-eligible, so it is still a
            # plain "qs1" entry the y-cat rewrite can take)
            if not self.stem_ycat:
                return spec_arrays
            from annonet_tpu.models.quantized_runtime import ycat_stem_qspec

            return ycat_stem_qspec(*spec_arrays)

        if mode == "off":
            if not self.stem_ycat:
                return plain
            ykey = (fold0, "ycat")
            cached = self._mosaic_q_cache.get(ykey)
            if cached is None:
                cached = with_ycat(plain)
                self._mosaic_q_cache[ykey] = cached
            return cached
        from annonet_tpu.ops.int8_conv_mosaic import (
            MOSAIC_FAST_WB,
            mosaicize_qspec,
        )

        if (
            tile_width // fold0 not in MOSAIC_FAST_WB
            and not self._mosaic_force
        ):
            if not self.stem_ycat:
                return plain
            ykey = (fold0, "ycat")
            cached = self._mosaic_q_cache.get(ykey)
            if cached is None:
                cached = with_ycat(plain)
                self._mosaic_q_cache[ykey] = cached
            return cached
        import os as _os

        # bisection aid (scripts/repro_mosaic_s1.py --stage composed):
        # rewrite only the first N eligible layers
        limit_env = _os.environ.get("ANNONET_TPU_MOSAIC_LIMIT")
        limit = int(limit_env) if limit_env else None
        key = (fold0, mode, self._mosaic_flatten, self.stem_ycat, limit)
        cached = self._mosaic_q_cache.get(key)
        if cached is None:
            cached = mosaicize_qspec(
                *plain,
                quantize_up=(mode == "up"),
                flatten=self._mosaic_flatten,
                kinds=("qs1",) if mode == "s1" else ("qs1", "qs2"),
                limit=limit,
            )
            cached = with_ycat(cached)
            self._mosaic_q_cache[key] = cached
        return cached

    def _get_folded(self, fold0: int, mosaic: Optional[bool] = None):
        """(static (fold0, spec), device array tuple) for the folded net.

        ``mosaic`` selects the Mosaic float-kernel rewrite (None =
        the inferer's use_mosaic_float); the calibration/quantization
        walkers always request the PLAIN spec (mosaic=False) — they only
        understand the XLA kinds."""
        if mosaic is None:
            mosaic = self.use_mosaic_float
        # keyed by (fold0, use_pallas_conv, mosaic): each variant folds or
        # rewrites a different parameter layout, so flipping flags after a
        # fold has been cached must not reuse another mode's params
        cache_key = (fold0, self.use_pallas_conv, mosaic)
        cached = self._folded_cache.get(cache_key)
        if cached is None:
            from annonet_tpu.models.folded_runtime import (
                fold_runtime_params,
                split_folded,
            )

            fparams = fold_runtime_params(
                self.params, self.config, fold0,
                pallas_s1=self.use_pallas_conv,
            )
            (f0, spec), arrays = split_folded(fparams)
            if mosaic:
                from annonet_tpu.ops.int8_conv_mosaic import mosaicize_folded

                spec, arrays = mosaicize_folded(
                    spec, arrays, jnp.dtype(self.config.compute_dtype)
                )
            cached = ((f0, spec), arrays)
            self._folded_cache[cache_key] = cached
        return cached

    def _collect_calib(self, fold0: int, plan: TilePlan, padded_image):
        """Per-REAL-channel post-ReLU activation maxima of one image: up to
        4 tiles spread across the plan, through the bf16 folded net
        (models/quantized_runtime.py::collect_calibration)."""
        (f0, spec), arrays = self._get_folded(fold0, mosaic=False)
        positions = list(plan.tile_yx)
        if len(positions) > 4:
            # spread the picks across the whole plan (first/last included),
            # not just its top rows — activation maxima must see the image
            idx = np.linspace(0, len(positions) - 1, 4).round().astype(int)
            positions = [positions[i] for i in dict.fromkeys(idx)]
        tiles = np.stack(
            [
                padded_image[y : y + plan.tile_height, x : x + plan.tile_width]
                for (y, x) in positions
            ]
        )
        cal_key = (fold0, tiles.shape)
        cal_fn = self._calibrate_fns.get(cal_key)
        if cal_fn is None:
            from annonet_tpu.models.quantized_runtime import (
                collect_calibration,
            )

            cal_fn = jax.jit(
                partial(
                    collect_calibration,
                    config=self.config,
                    fold0=f0,
                    spec=spec,
                )
            )
            self._calibrate_fns[cal_key] = cal_fn
        return [np.asarray(m) for m in cal_fn(arrays, jnp.asarray(tiles))]

    def _ensure_quantized(self, fold0: int, plan: TilePlan, padded_image):
        """Accumulate one image's calibration maxima; freeze the int8 net
        once ``calibration_images`` images have contributed.

        The reference's own timing treats the first image as warm-up
        (annonet_infer_main.cpp:466-480); calibration rides that slot.
        Images seen before the freeze run the exact bf16 program, so
        raising calibration_images trades a few float-path images for
        scales that have seen the directory's exposure range.
        """
        if fold0 in self._quantized_cache:
            return
        if self._preloaded_calib is not None:
            from annonet_tpu.models.quantized_runtime import quantize_folded

            (f0, spec), arrays = self._get_folded(fold0, mosaic=False)
            expected = len(spec)
            if len(self._preloaded_calib) != expected:
                raise ValueError(
                    f"calibration has {len(self._preloaded_calib)} layer "
                    f"vectors, model expects {expected} (wrong model?)"
                )
            self._calib_frozen[fold0] = self._preloaded_calib
            self._quantized_cache[fold0] = quantize_folded(
                spec, arrays, self._preloaded_calib, self.config, f0
            )
            return
        calib = self._collect_calib(fold0, plan, padded_image)
        accum = self._calib_accum.get(fold0)
        if accum is None:
            accum = calib
        else:
            accum = [np.maximum(a, c) for a, c in zip(accum, calib)]
        self._calib_accum[fold0] = accum
        self._calib_seen[fold0] = self._calib_seen.get(fold0, 0) + 1
        if self._calib_seen[fold0] < self.calibration_images:
            return
        from annonet_tpu.models.quantized_runtime import quantize_folded

        (f0, spec), arrays = self._get_folded(fold0, mosaic=False)
        self._calib_frozen[fold0] = accum
        self._quantized_cache[fold0] = quantize_folded(
            spec, arrays, accum, self.config, f0
        )

    def export_calibration(self, partial: bool = False):
        """The frozen per-layer, per-REAL-channel activation maxima, or
        None if no int8 net has been frozen yet (run at least
        ``calibration_images`` images first). Fold-agnostic: persist with
        serialization.save_calibration and pass back as
        ``TiledInferer(..., calibration=...)`` to skip runtime
        calibration entirely (reproducible deployments; the first image
        then runs int8 too).

        ``partial=True`` also includes accumulations that have not yet
        reached ``calibration_images`` (more images only widen the
        maxima, never narrow them) — used by multi-host
        ``--save-calibration``, where a rank's shard can be smaller than
        the calibration-image budget but its activations should still
        contribute to the cluster-merged file."""
        sources = list(self._calib_frozen.values())
        if partial:
            # _calib_frozen aliases the accumulator at freeze time, so
            # double inclusion is a no-op under the element-wise max
            sources.extend(self._calib_accum.values())
        if not sources:
            return None
        # maxima are per-REAL-channel, so when several tile plans froze
        # different fold0 nets (mixed image sizes in one run), the
        # order-independent union is the element-wise max across folds
        merged = None
        for frozen in sources:
            vecs = [np.asarray(v, np.float32) for v in frozen]
            merged = vecs if merged is None else [
                np.maximum(a, b) for a, b in zip(merged, vecs)
            ]
        return merged

    def calibration_layer_shapes(self):
        """Per-layer lengths of the export_calibration vectors — an
        architecture property (per-REAL-channel, fold-agnostic), computed
        WITHOUT inferring any image, or None when this config cannot fold
        (folded_runtime.folding_supported == 0, so int8 never applies).

        Multi-host ``--save-calibration`` uses this so a rank whose image
        shard produced no calibration data can still participate in the
        fixed-shape maxima allgather with max-identity zeros (post-ReLU
        maxima are nonnegative)."""
        from annonet_tpu.models.folded_runtime import folding_supported
        from annonet_tpu.models.quantized_runtime import collect_calibration

        if self._calib_accum or self._calib_frozen:
            fold0 = next(iter(self._calib_accum or self._calib_frozen))
        else:
            # any valid fold works — the vectors are per-REAL-channel
            fold0 = folding_supported(self.config, 64)
            if fold0 == 0:
                return None
        (f0, spec), arrays = self._get_folded(fold0, mosaic=False)
        dummy = jax.ShapeDtypeStruct(
            (1, 64, 64, self.config.in_channels), jnp.uint8
        )
        shapes = jax.eval_shape(
            lambda a, x: collect_calibration(
                a, x, self.config, fold0=f0, spec=spec
            ),
            arrays, dummy,
        )
        return [int(s.shape[0]) for s in shapes]

    def pause_calibration(self):
        """Context manager: images inferred inside do NOT contribute to
        (or freeze) int8 activation calibration — they run the exact bf16
        path if quantization is not yet frozen, int8 as usual if it is.

        For synthetic traffic that must not poison the scales: e.g.
        annonet_serve's flat mid-gray --warmup image would otherwise
        freeze calibration on a constant image and silently clip every
        real request's activations (the reference has no analog — its
        engine has no calibration state to protect).
        """
        import contextlib

        @contextlib.contextmanager
        def _pause():
            prev = self._calibration_paused
            self._calibration_paused = True
            try:
                yield self
            finally:
                self._calibration_paused = prev

        return _pause()

    def calibration_overshoot(self, image: np.ndarray) -> float:
        """Clip-saturation telemetry: how far ``image``'s activations
        exceed the frozen int8 calibration range.

        Returns the max over layers/channels of
        (this image's activation max) / (calibrated max) — 1.0 means the
        image fits the calibrated range exactly; e.g. 2.0 means some
        channel's activations reach double the calibrated maximum and are
        clipped to half their range by the int8 requant. Use it to detect
        distribution shift (an unrepresentative calibration set). Returns
        0.0 when no quantized net has been frozen yet.
        """
        if not self._calib_frozen:
            return 0.0
        h, w = image.shape[:2]
        plan = self.plan(h, w)
        from annonet_tpu.models.folded_runtime import folding_supported

        fold0 = folding_supported(self.config, plan.tile_width)
        frozen = self._calib_frozen.get(fold0)
        if frozen is None:
            return 0.0
        full = np.pad(
            image,
            (
                (0, plan.padded_height - h),
                (0, plan.padded_width - w),
                (0, 0),
            ),
            mode="edge",
        )
        calib = self._collect_calib(fold0, plan, full)
        worst = 0.0
        for cal, frz in zip(calib, frozen):
            if cal.size == 0 or frz.size == 0:
                continue
            mask = frz > 0
            if mask.any():
                worst = max(worst, float((cal[mask] / frz[mask]).max()))
        return worst

    # ------------------------------------------------------------- inference

    def infer_arrays(
        self,
        image: np.ndarray,  # (H, W, C) uint8
        gains: Optional[Sequence[float]] = None,
        detection_levels: Optional[Sequence[float]] = None,
        device_output: bool = False,
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Raw device pass: returns (labels [H,W], seeds [H,W] or None).

        Seeds are produced only when any detection level is positive. With
        ``device_output=True`` the (padded) results stay on device — for
        benchmarking and pipelines that keep consuming on-device.
        """
        if image.ndim != 3 or image.shape[2] != self.config.in_channels:
            raise ValueError(
                f"expected (H, W, {self.config.in_channels}) input, got {image.shape}"
            )
        return self._infer(
            image, False, gains, detection_levels, device_output
        )

    def infer_arrays_batch(
        self,
        images: np.ndarray,  # (M, H, W, C) uint8, same-size images
        gains: Optional[Sequence[float]] = None,
        detection_levels: Optional[Sequence[float]] = None,
        device_output: bool = False,
        pad_to_bucket=True,  # True | False | int target size
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Batched pass over M same-size images: (labels [M,H,W], seeds).

        One plan, one device program: all M images' tiles forward as a
        single M*T batch. This is the throughput path for directories of
        small same-size images — a single 512² image is a batch-1 forward
        (65 Mpx/s measured) while the same image inside a batch rides the
        full tile batch. Per-image results equal infer_arrays exactly.

        ``pad_to_bucket`` controls the compile-vs-padded-compute trade:
        True (default) buckets M UP to the next power of two by
        replicating the last image (results sliced back) so odd batches
        reuse compiled programs instead of paying a fresh 20-40 s XLA
        compile each — the same trade the canvas bucketing makes for
        H/W. False compiles an exact-M program: right for a batch size
        the caller uses REPEATEDLY (every full --image-batch group).
        An int pads M up to exactly that size — right for a one-off
        remainder batch when a program of that size already exists
        (the CLI's final group pads to the full-group size rather than
        compiling a fresh power-of-two program)."""
        if images.ndim != 4 or images.shape[3] != self.config.in_channels:
            raise ValueError(
                f"expected (M, H, W, {self.config.in_channels}) input, "
                f"got {images.shape}"
            )
        m = images.shape[0]
        if m < 1:
            raise ValueError("image batch must contain at least one image")
        if self.use_pallas_blend and m > 1:
            raise ValueError(
                "use_pallas_blend supports a single image per call"
            )
        if pad_to_bucket is True:
            m_b = 1 << (m - 1).bit_length()
        elif pad_to_bucket is False:
            m_b = m
        else:
            m_b = int(pad_to_bucket)
            if m_b < m:
                raise ValueError(
                    f"pad_to_bucket target {m_b} is below the batch size {m}"
                )
        if m_b != m:
            images = np.concatenate(
                [images, np.repeat(images[-1:], m_b - m, axis=0)]
            )
        labels, seeds = self._infer(
            images, True, gains, detection_levels, device_output
        )
        if m_b != m:
            labels = labels[:m]
            seeds = None if seeds is None else seeds[:m]
        return labels, seeds

    def _infer(
        self,
        image: np.ndarray,
        batched: bool,
        gains,
        detection_levels,
        device_output: bool,
    ):
        h, w = image.shape[-3:-1]
        k = self.config.class_count
        gains_arr = np.zeros(k, np.float32) if gains is None else np.asarray(
            gains, np.float32
        )
        det_arr = (
            np.zeros(k, np.float32)
            if detection_levels is None
            else np.asarray(detection_levels, np.float32)
        )
        if gains_arr.shape != (k,) or det_arr.shape != (k,):
            raise ValueError(f"gains/detection levels must have length {k}")

        with_detection = bool((det_arr > 0.0).any())

        if (
            self.plan_autotune
            and not self._autotuning
            and self._plan_override is None
        ):
            # first image of a canvas bucket: measure candidate plans now
            # (one np.asarray: a device-resident input is pulled back once)
            self._autotune_for(np.asarray(image[0] if batched else image))

        plan = self.plan(h, w)
        # host-side replicate pad up to the canvas bucket (<= bucket-1 rows/
        # cols); the device pads the remainder for the small-image case.
        # All images in a bucket then trace with the same input shape.
        h_b = min(bucket_dim(h, _CANVAS_BUCKET), plan.padded_height)
        w_b = min(bucket_dim(w, _CANVAS_BUCKET), plan.padded_width)
        if (h_b, w_b) != (h, w):
            lead = ((0, 0),) if batched else ()
            widths = lead + ((0, h_b - h), (0, w_b - w), (0, 0))
            if isinstance(image, jax.Array):
                # a device-resident input must be padded ON DEVICE —
                # np.pad would silently round-trip the pixels through the
                # host (measured 30x throughput loss on a thin link for
                # non-bucket-aligned sizes)
                image = jnp.pad(image, widths, mode="edge")
            else:
                image = np.pad(image, widths, mode="edge")
        constants = self._plan_constants.get(plan)
        if constants is None:
            ramp = jnp.asarray(
                ramp_weights(
                    plan.tile_height,
                    plan.tile_width,
                    plan.overlap_y,
                    plan.overlap_x,
                )
            )
            inv_wsum = jnp.asarray(inverse_weight_sum(plan))
            constants = (ramp, inv_wsum)
            self._plan_constants[plan] = constants
        ramp, inv_wsum = constants

        if self.quantize:
            from annonet_tpu.models.folded_runtime import folding_supported

            q_fold0 = folding_supported(self.config, plan.tile_width)
            if (
                q_fold0
                and q_fold0 not in self._quantized_cache
                and not self._calibration_paused
            ):
                # each not-yet-frozen call contributes one image (or, when
                # batched, as many of the batch as calibration still needs)
                candidates = image if batched else image[None]
                for one in candidates:
                    full = np.pad(
                        one,
                        (
                            (0, plan.padded_height - one.shape[0]),
                            (0, plan.padded_width - one.shape[1]),
                            (0, 0),
                        ),
                        mode="edge",
                    )
                    self._ensure_quantized(q_fold0, plan, full)
                    if q_fold0 in self._quantized_cache:
                        break

        fn, fold0, quantized = self._get_compiled(
            plan, with_detection,
            image_batch=image.shape[0] if batched else 0,
        )
        if quantized:
            exec_params = self._get_quantized(fold0, plan.tile_width)[1]
        else:
            exec_params = (
                self._get_folded(fold0)[1] if fold0 else self.params
            )
        out = fn(
            exec_params,
            jnp.asarray(image),
            jnp.asarray(gains_arr),
            jnp.asarray(det_arr),
            ramp,
            inv_wsum,
        )
        labels, seeds = out if with_detection else (out, None)
        if device_output:
            return labels, seeds
        crop = (slice(None), slice(0, h), slice(0, w)) if batched else (
            slice(0, h), slice(0, w)
        )
        labels = np.asarray(labels)[crop].astype(np.int32)
        if seeds is not None:
            seeds = np.asarray(seeds)[crop]
        return labels, seeds


def annonet_infer(
    inferer: TiledInferer,
    input_image: np.ndarray,  # (H, W, C) uint8
    gains: Optional[Sequence[float]] = None,
    detection_levels: Optional[Sequence[float]] = None,
) -> np.ndarray:
    """Full inference for one image: (H, W) uint16 label map.

    Parity with annonet_infer (annonet_infer.cpp:32-240) including the
    detection-level pass: when any detection level is positive, connected
    non-background blobs of the argmax map that contain no seed pixel are
    reset to background (:217-238).
    """
    labels, seeds = inferer.infer_arrays(input_image, gains, detection_levels)
    return detection_veto(labels, seeds)


def annonet_infer_batch(
    inferer: TiledInferer,
    input_images: np.ndarray,  # (M, H, W, C) uint8, same-size images
    gains: Optional[Sequence[float]] = None,
    detection_levels: Optional[Sequence[float]] = None,
) -> np.ndarray:
    """Full inference for M same-size images: (M, H, W) uint16 label maps.

    One device program serves all M images (TiledInferer.infer_arrays_batch)
    — the throughput path for directories of small same-size images
    (512² x32 measured 988 Mpx/s/chip vs 65 single-image). Per-image
    results equal annonet_infer exactly; the blob veto runs per image.
    """
    labels, seeds = inferer.infer_arrays_batch(
        input_images, gains, detection_levels
    )
    return np.stack(
        [
            detection_veto(
                labels[i], None if seeds is None else seeds[i]
            )
            for i in range(labels.shape[0])
        ]
    )


def detection_veto(labels: np.ndarray, seeds: Optional[np.ndarray]) -> np.ndarray:
    """Host post-pass: reset non-background blobs without a detection seed
    (annonet_infer.cpp:217-238). No-op when seeds is None (no detection
    levels active). Returns the final uint16 label map."""
    if seeds is not None:
        blobs, _count = label_connected_blobs(labels, zero_is_background=True)
        detected = np.unique(blobs[seeds]) if seeds.any() else np.empty(0, np.int32)
        keep = np.isin(blobs, detected)
        labels = np.where((blobs > 0) & ~keep, 0, labels)
    return labels.astype(np.uint16)
