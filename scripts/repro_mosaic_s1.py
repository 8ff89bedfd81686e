#!/usr/bin/env python
"""Minimal repro hunt for the Mosaic s1 hardware-vs-interpret divergence.

Round 3 found the composed int8 Mosaic program (ANNONET_TPU_MOSAIC_INT8)
produced 66,371 differing labels vs the same-plan XLA arm on the real
v5e while interpret mode is bit-exact (docs/DESIGN.md par.21); the flag
is now fenced off TPU backends, and THIS script hunts the root cause:
it sweeps qconv3x3_s1_requant over shapes/rows/flatten directly against
the XLA int8 conv+requant reference ON DEVICE and reports the first
mismatching configuration, then bisects within the kernel (tap
assembly vs dot vs epilogue) by comparing intermediate variants.

Tunnel discipline (CLAUDE.md): ONE process, mismatch counts are computed
on device and read back as single scalars; no bulk downloads unless a
mismatch is found (then only small slices).

Usage: timeout 900 python scripts/repro_mosaic_s1.py [--stage sweep|bisect]
"""

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def make_inputs(rng, n, h, wb, c, cout=None, signed=False):
    cout = cout or c
    # post-requant activations are [0, 127]; signed covers the stem case
    lo = -127 if signed else 0
    x = rng.integers(lo, 128, size=(n, h, wb, c), dtype=np.int64).astype(
        np.int8
    )
    w = rng.integers(-127, 128, size=(3, 3, c, cout), dtype=np.int64).astype(
        np.int8
    )
    scale = (rng.uniform(0.5, 2.0, size=cout) * 1e-3).astype(np.float32)
    offset = rng.uniform(0.0, 1.0, size=cout).astype(np.float32) + 0.5
    return x, w, scale, offset


def xla_ref(x, w, scale, offset):
    import jax.numpy as jnp
    from jax import lax

    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    acc = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    f = acc.astype(jnp.float32) * scale + offset
    return jnp.clip(f, 0.0, 127.0).astype(jnp.int8)


def run_sweep(signed=False):
    import jax
    import jax.numpy as jnp

    from annonet_tpu.ops.int8_conv_mosaic import (
        build_tap_gemms, qconv3x3_s1_requant,
    )

    backend = jax.default_backend()
    print(f"backend = {backend}", flush=True)
    rng = np.random.default_rng(0)
    configs = [
        # (n, h, wb, c, rows, flatten)
        (1, 8, 128, 128, 8, False),
        (1, 64, 128, 128, 8, False),
        (1, 64, 128, 128, 16, False),
        (2, 64, 128, 128, 8, False),
        (1, 8, 128, 128, 8, True),
        (1, 64, 128, 128, 8, True),
        (1, 872, 128, 128, 8, False),
        (1, 872, 128, 128, 8, True),
        (25, 872, 128, 128, 8, False),
        (4, 109, 128, 128, 1, False),   # rows=1 odd-height path
        (1, 436, 128, 256, 4, False),   # deeper-level channel count
        # deeper pyramid levels: the conv runs at WB/2^level — sub-128
        # SUBLANE widths the stem-level WB allowlist never measured
        (1, 436, 64, 128, 4, False),
        (1, 218, 32, 128, 2, False),
        (1, 218, 32, 256, 2, False),
        (1, 109, 16, 256, 1, False),
        (4, 64, 16, 128, 8, False),
        (4, 64, 8, 128, 8, False),
        (1, 436, 54, 128, 4, False),    # odd sublane width (109/2 plans)
        (1, 218, 27, 128, 2, False),
    ]
    if backend != "tpu":
        # interpret mode: small configs only (pure-python conv emulation)
        configs = [cfg for cfg in configs if cfg[0] * cfg[1] <= 128]
    failures = []
    for n, h, wb, c, rows, flatten in configs:
        x, w, scale, offset = make_inputs(rng, n, h, wb, c, signed=signed)
        wl, wc, wr = build_tap_gemms(w)
        xj = jnp.asarray(x)
        got = qconv3x3_s1_requant(
            xj, jnp.asarray(wl), jnp.asarray(wc), jnp.asarray(wr),
            jnp.asarray(scale), jnp.asarray(offset),
            rows=rows, interpret=(backend != "tpu"), flatten=flatten,
        )
        want = xla_ref(xj, jnp.asarray(w), jnp.asarray(scale),
                       jnp.asarray(offset))
        mism = int(jnp.sum((got != want).astype(jnp.int32)))
        tag = f"n{n} h{h} wb{wb} c{c} rows{rows} flat{int(flatten)}"
        print(f"  {tag}: mismatches = {mism}", flush=True)
        if mism:
            failures.append((tag, mism, (n, h, wb, c, rows, flatten)))
    return failures


def bisect(cfg, signed=False):
    """For a failing config, localize the divergence: compare the tap
    assembly and raw int32 accumulator against their XLA equivalents."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from annonet_tpu.ops import int8_conv_mosaic as m

    n, h, wb, c, rows, flatten = cfg
    rng = np.random.default_rng(0)
    x, w, scale, offset = make_inputs(rng, n, h, wb, c, signed=signed)
    xj = jnp.asarray(x)
    hb = h // rows

    # --- stage 1: the raw int32 accumulator (skip the requant epilogue)
    def _acc_kernel(top_ref, mid_ref, bot_ref, wl_ref, wc_ref, wr_ref,
                    out_ref, *, rows, flatten):
        p_l, p_cat, p_r = m._s1_taps(top_ref, mid_ref, bot_ref, rows)
        wbk = p_cat.shape[1]
        dotg = m._make_dotg(jnp.int32, flatten, rows, wbk)
        acc = (dotg(p_l, wl_ref) + dotg(p_cat, wc_ref)
               + dotg(p_r, wr_ref))
        out_ref[0] = acc.reshape(rows, wbk, -1)

    wl, wc, wr = m.build_tap_gemms(w)
    top_spec = pl.BlockSpec(
        (1, 1, wb, c), lambda b, r: (b, jnp.maximum(r * rows - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    bot_spec = pl.BlockSpec(
        (1, 1, wb, c), lambda b, r: (b, jnp.minimum((r + 1) * rows, h - 1),
                                     0, 0),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (1, rows, wb, c), lambda b, r: (b, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    acc = pl.pallas_call(
        functools.partial(_acc_kernel, rows=rows, flatten=flatten),
        grid=(n, hb),
        in_specs=[top_spec, row_spec, bot_spec, full, full, full],
        out_specs=pl.BlockSpec(
            (1, rows, wb, c), lambda b, r: (b, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wb, c), jnp.int32),
    )(xj, xj, xj, jnp.asarray(wl), jnp.asarray(wc), jnp.asarray(wr))

    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    acc_ref = lax.conv_general_dilated(
        xj, jnp.asarray(w), (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    mism = int(jnp.sum((acc != acc_ref).astype(jnp.int32)))
    print(f"  accumulator mismatches = {mism}", flush=True)
    if mism:
        # where: per (row, col) histogram, small readbacks only
        bad = jnp.nonzero(
            jnp.any(acc != acc_ref, axis=-1).reshape(n * h, wb),
            size=16, fill_value=-1,
        )
        print("  first bad (flat_nh, wb):",
              np.asarray(bad[0]), np.asarray(bad[1]), flush=True)
        return "accumulator"

    # --- stage 2: accumulator exact -> epilogue (requant) must diverge
    got = m.qconv3x3_s1_requant(
        xj, jnp.asarray(wl), jnp.asarray(wc), jnp.asarray(wr),
        jnp.asarray(scale), jnp.asarray(offset),
        rows=rows, interpret=False, flatten=flatten,
    )
    want = xla_ref(xj, jnp.asarray(w), jnp.asarray(scale),
                   jnp.asarray(offset))
    mism = int(jnp.sum((got != want).astype(jnp.int32)))
    print(f"  full-kernel mismatches = {mism}", flush=True)
    return "epilogue" if mism else "none"


def run_composed(size=2048, limit=None, shared_calibration=True):
    """Replicate scripts/ab_mosaic_int8.py's failing comparison at
    reduced scale: the full int8 TiledInferer program, xla arm vs
    mosaic-s1 arm on the SAME snapped plan. ``shared_calibration``
    feeds the xla arm's exported calibration into the mosaic arm so any
    label diff is purely the rewritten net; ``limit`` (also via
    ANNONET_TPU_MOSAIC_LIMIT) bisects which rewritten layer introduces
    a divergence."""
    import jax
    import jax.numpy as jnp

    from annonet_tpu.infer.core import TiledInferer
    from annonet_tpu.infer.tiling import TilingParameters
    from annonet_tpu.models.segnet import (
        SegNetConfig, fold_batchnorm, init_state, required_input_dimension,
    )

    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    rp = fold_batchnorm(params, bn_stats, config)
    overlap = required_input_dimension(config)
    tiling = TilingParameters(1024, 1024, overlap, overlap)
    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
    )
    float(jnp.max(image).astype(jnp.int32))

    os.environ["ANNONET_TPU_MOSAIC_FLATTEN"] = "0"
    os.environ["ANNONET_TPU_MOSAIC_INT8_UNSAFE"] = "1"
    if limit is not None:
        os.environ["ANNONET_TPU_MOSAIC_LIMIT"] = str(limit)

    def run_arm(flag, prefer, calibration=None):
        os.environ["ANNONET_TPU_MOSAIC_INT8"] = flag
        inf = TiledInferer(
            rp, config, tiling, quantize="int8",
            prefer_tile_widths=prefer, calibration=calibration,
        )
        plan = inf.plan(size, size)
        for _ in range(2):  # calib pass + int8 pass
            labels, _ = inf.infer_arrays(image, device_output=True)
        float(jnp.max(labels).astype(jnp.int32))
        calib = inf.export_calibration()
        return (plan.tile_height, plan.tile_width, plan.tile_count,
                labels, calib)

    th_a, tw_a, n_a, labels_a, calib_a = run_arm("0", [1024])
    print(f"xla_s plan {tw_a}x{th_a} n={n_a}", flush=True)
    th_b, tw_b, n_b, labels_b, calib_b = run_arm(
        "s1", [1024],  # pin BOTH arms to the same WB=128 snap
        calibration=calib_a if shared_calibration else None,
    )
    print(f"mos_s1 plan {tw_b}x{th_b} n={n_b} "
          f"(shared_calib={shared_calibration}, limit={limit})", flush=True)
    assert (th_a, tw_a, n_a) == (th_b, tw_b, n_b), "plans diverged"

    calib_equal = all(
        np.array_equal(a, b) for a, b in zip(calib_a, calib_b)
    )
    print(f"calibration arrays identical = {calib_equal}", flush=True)
    if not calib_equal:
        for i, (a, b) in enumerate(zip(calib_a, calib_b)):
            if not np.array_equal(a, b):
                d = np.max(np.abs(a.astype(np.float64) - b))
                print(f"  layer {i}: max |delta| = {d:.6g} "
                      f"(shape {a.shape})", flush=True)
    mism = int(jnp.sum((labels_a != labels_b).astype(jnp.int32)))
    print(f"label mismatches = {mism} / {size * size}", flush=True)
    return mism


def run_prefix(size=2048):
    """Localize WHERE the composed divergence enters: run the two arms'
    quantized nets as growing PREFIX programs (jit of spec[:k+1]) on the
    same random canvas batch and report the first prefix length where
    the outputs differ. With ANNONET_TPU_MOSAIC_LIMIT=1 the specs
    differ only at the first ms1 entry, so:
      * diff at k == ms1 index -> the kernel itself diverges when jitted
        together with the stem (layout/fusion interaction at its input);
      * diff first appears at k > ms1 index -> the kernel's OUTPUT feeds
        a later op differently (layout interaction at its output).
    """
    import functools

    import jax
    import jax.numpy as jnp

    from annonet_tpu.infer.core import TiledInferer
    from annonet_tpu.infer.tiling import TilingParameters
    from annonet_tpu.models.quantized_runtime import apply_folded_int8
    from annonet_tpu.models.segnet import (
        SegNetConfig, fold_batchnorm, init_state, required_input_dimension,
    )

    config = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn_stats = init_state(jax.random.PRNGKey(0), config)
    rp = fold_batchnorm(params, bn_stats, config)
    overlap = required_input_dimension(config)
    tiling = TilingParameters(1024, 1024, overlap, overlap)
    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
    )

    os.environ["ANNONET_TPU_MOSAIC_FLATTEN"] = "0"
    os.environ["ANNONET_TPU_MOSAIC_INT8_UNSAFE"] = "1"
    os.environ["ANNONET_TPU_MOSAIC_LIMIT"] = "1"

    def freeze(flag, calibration=None):
        os.environ["ANNONET_TPU_MOSAIC_INT8"] = flag
        inf = TiledInferer(
            rp, config, tiling, quantize="int8",
            prefer_tile_widths=[1024], calibration=calibration,
        )
        for _ in range(2):
            labels, _ = inf.infer_arrays(image, device_output=True)
        float(jnp.max(labels).astype(jnp.int32))
        return inf

    inf_a = freeze("0")
    calib = inf_a.export_calibration()
    inf_b = freeze("s1", calibration=calib)
    fold0 = next(iter(inf_a._quantized_cache))
    spec_a, arrays_a = inf_a._get_quantized(fold0, 1024)
    os.environ["ANNONET_TPU_MOSAIC_INT8"] = "s1"
    spec_b, arrays_b = inf_b._get_quantized(fold0, 1024)
    print(f"fold0={fold0}", flush=True)
    print("spec_a:", spec_a, flush=True)
    print("spec_b:", spec_b, flush=True)
    k_ms1 = next(
        i for i, kind in enumerate(spec_b) if kind.startswith("ms1")
    )

    canvas = jnp.asarray(
        rng.integers(0, 256, size=(9, 728, 1024, 3), dtype=np.uint8)
    )

    def prefix_fn(spec, arrays, k):
        sub_spec, sub_arrays = spec[: k + 1], arrays[: k + 1]

        @jax.jit
        def fn(x):
            return apply_folded_int8(
                sub_arrays, x, config, fold0=fold0, qspec=sub_spec,
                folded_output=True,
            )

        return fn

    for k in range(k_ms1, len(spec_b)):
        ya = prefix_fn(spec_a, arrays_a, k)(canvas)
        yb = prefix_fn(spec_b, arrays_b, k)(canvas)
        if ya.shape != yb.shape:
            print(f"prefix k={k}: SHAPES differ {ya.shape} vs {yb.shape}",
                  flush=True)
            break
        mism = int(jnp.sum((ya != yb).astype(jnp.int32)))
        line = (f"prefix k={k} ({spec_b[k]}): mismatches = {mism} "
                f"shape={tuple(ya.shape)}")
        if mism:
            # magnitude histogram of the diverging values (small readback)
            diff = jnp.abs(
                ya.astype(jnp.float32) - yb.astype(jnp.float32)
            )
            line += (f" max|delta|={float(jnp.max(diff)):g}"
                     f" mean|delta|nonzero="
                     f"{float(jnp.sum(diff) / mism):.4g}")
        print(line, flush=True)
        if mism:
            break


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="sweep",
                    choices=["sweep", "bisect", "composed", "prefix"])
    ap.add_argument("--signed", action="store_true")
    ap.add_argument("--cfg", type=int, nargs=6, default=None,
                    help="n h wb c rows flatten (bisect)")
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--own-calibration", action="store_true",
                    help="composed: let the mosaic arm calibrate itself "
                    "(the original ab_mosaic_int8 condition)")
    args = ap.parse_args()
    if args.stage == "sweep":
        failures = run_sweep(signed=args.signed)
        print("FAILURES:", failures, flush=True)
    elif args.stage == "prefix":
        run_prefix(size=args.size)
    elif args.stage == "composed":
        mism = run_composed(
            size=args.size, limit=args.limit,
            shared_calibration=not args.own_calibration,
        )
        print("COMPOSED MISMATCHES:", mism, flush=True)
    else:
        cfg = tuple(args.cfg) if args.cfg else (1, 64, 128, 128, 8, False)
        cfg = cfg[:5] + (bool(cfg[5]),)
        verdict = bisect(cfg, signed=args.signed)
        print("VERDICT:", verdict, flush=True)


if __name__ == "__main__":
    main()
