"""Exactness of the Mosaic int8 folded conv vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from annonet_tpu.ops.int8_conv_mosaic import (
    build_tap_gemms,
    build_tap_gemms_s2,
    qconv3x3_s1_requant,
    qconv3x3_s2_requant,
)

_DN = ("NHWC", "HWIO", "NHWC")


def _xla_reference(x_q, w_q, scale, offset):
    acc = lax.conv_general_dilated(
        x_q, w_q, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    f = acc.astype(jnp.float32) * scale + offset
    return jnp.clip(f, 0.0, 127.0).astype(jnp.int8)


def test_mosaicized_whole_net_matches_plain_int8():
    """mosaicize_qspec's net == the plain int8 net, bit-exact (the "ms1"
    rewrite only changes the execution schedule, never the math)."""
    from annonet_tpu.models.folded_runtime import (
        fold_runtime_params, split_folded,
    )
    from annonet_tpu.models.quantized_runtime import (
        apply_folded_int8, collect_calibration, quantize_folded,
    )
    from annonet_tpu.models.segnet import (
        SegNetConfig, fold_batchnorm, init_state,
    )
    from annonet_tpu.ops.int8_conv_mosaic import mosaicize_qspec

    cfg = SegNetConfig(
        class_count=3, level_count=2, base_width=16,
        compute_dtype="float32",
    )
    params, bn = init_state(jax.random.PRNGKey(0), cfg)
    rt = fold_batchnorm(params, bn, cfg)
    (f0, spec), arrays = split_folded(fold_runtime_params(rt, cfg, fold0=8))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, size=(1, 64, 64, 3), dtype=np.uint8))
    calib = tuple(
        np.asarray(c)
        for c in collect_calibration(arrays, x, cfg, fold0=f0, spec=spec)
    )
    qspec, qarrays = quantize_folded(spec, arrays, calib, cfg, f0)
    ref = apply_folded_int8(qarrays, x, cfg, fold0=f0, qspec=qspec)
    mspec, marrays = mosaicize_qspec(qspec, qarrays)
    assert mspec.count("ms1") >= 4  # enc/dec stride-1 convs rewritten
    assert mspec.count("ms2") >= 2  # enc stride-2 convs rewritten
    got = apply_folded_int8(marrays, x, cfg, fold0=f0, qspec=mspec)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("flatten", [False, True])
@pytest.mark.parametrize("shape,rows", [
    ((2, 16, 11, 128), 4),
    ((1, 32, 8, 256), 8),
])
def test_mosaic_qconv_s2_matches_xla(shape, rows, flatten):
    n, h, wb, c = shape
    rng = np.random.default_rng(9)
    x_q = rng.integers(0, 128, size=shape, dtype=np.int8)
    w_q = rng.integers(-127, 128, size=(3, 2, c, 128), dtype=np.int8)
    scale = rng.random(128, dtype=np.float32) * 1e-3 + 1e-5
    offset = rng.random(128, dtype=np.float32) * 4 - 1 + 0.5

    acc = lax.conv_general_dilated(
        jnp.asarray(x_q), jnp.asarray(w_q), (2, 1), [(0, 1), (0, 1)],
        dimension_numbers=_DN, preferred_element_type=jnp.int32,
    )
    f = acc.astype(jnp.float32) * jnp.asarray(scale) + jnp.asarray(offset)
    ref = jnp.clip(f, 0.0, 127.0).astype(jnp.int8)

    w0, w1 = build_tap_gemms_s2(w_q)
    got = qconv3x3_s2_requant(
        jnp.asarray(x_q), jnp.asarray(w0), jnp.asarray(w1),
        jnp.asarray(scale), jnp.asarray(offset), rows=rows, interpret=True,
        flatten=flatten,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pick_rows_divisor_selection():
    from annonet_tpu.ops.int8_conv_mosaic import pick_rows

    assert pick_rows(872) == 8     # 872 = 8 * 109 (the flagship tile H)
    assert pick_rows(436) == 4
    assert pick_rows(218) == 2
    assert pick_rows(109) == 1     # prime -> XLA fallback
    assert pick_rows(64) == 16
    assert pick_rows(48) == 16
    assert pick_rows(20) == 10


@pytest.mark.parametrize("flatten", [False, True])
@pytest.mark.parametrize("shape,rows", [
    ((2, 16, 11, 128), 8),    # WB not a sublane multiple (the 109 case)
    ((1, 24, 8, 128), 8),     # tiny
    ((1, 16, 32, 256), 4),    # wider folded channels (dec conv input K=256)
])
def test_mosaic_qconv_matches_xla(shape, rows, flatten):
    n, h, wb, c = shape
    rng = np.random.default_rng(5)
    x_q = rng.integers(0, 128, size=shape, dtype=np.int8)
    w_q = rng.integers(-127, 128, size=(3, 3, c, 128), dtype=np.int8)
    scale = (rng.random(128, dtype=np.float32) * 1e-3 + 1e-5)
    offset = rng.random(128, dtype=np.float32) * 4 - 1 + 0.5

    ref = _xla_reference(
        jnp.asarray(x_q), jnp.asarray(w_q), jnp.asarray(scale),
        jnp.asarray(offset),
    )
    wl, wc_, wr = build_tap_gemms(w_q)
    got = qconv3x3_s1_requant(
        jnp.asarray(x_q), jnp.asarray(wl), jnp.asarray(wc_),
        jnp.asarray(wr), jnp.asarray(scale), jnp.asarray(offset),
        rows=rows, interpret=True, flatten=flatten,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("flatten", [False, True])
@pytest.mark.parametrize("shape,rows", [
    ((2, 16, 11, 128), 8),
    ((1, 9, 8, 256), 3),      # odd H, wider channels
])
def test_mosaic_qup_matches_int32_einsum(shape, rows, flatten):
    """qup_requant == an independent int32 einsum + affine reference
    (exact: int8 x int8 -> int32 accumulation is associative)."""
    from annonet_tpu.ops.int8_conv_mosaic import qup_requant

    n, h, wb, c = shape
    rng = np.random.default_rng(21)
    x_q = rng.integers(0, 128, size=shape, dtype=np.int8)
    a = rng.integers(-127, 128, size=(c, 128), dtype=np.int8)
    b = rng.integers(-127, 128, size=(c, 128), dtype=np.int8)
    scale = rng.random(128, dtype=np.float32) * 1e-3 + 1e-5
    offset = rng.random(128, dtype=np.float32) + 0.5

    def ep(acc):
        f = acc.astype(np.float32) * scale + offset
        return np.clip(f, 0.0, 127.0).astype(np.int8)

    y0 = ep(np.einsum(
        "nhwc,cd->nhwd", x_q.astype(np.int32), a.astype(np.int32)))
    y1 = ep(np.einsum(
        "nhwc,cd->nhwd", x_q.astype(np.int32), b.astype(np.int32)))
    ref = np.stack([y0, y1], axis=2).reshape(n, 2 * h, wb, 128)

    got = qup_requant(
        jnp.asarray(x_q), jnp.asarray(a), jnp.asarray(b),
        jnp.asarray(scale), jnp.asarray(offset), rows=rows, interpret=True,
        flatten=flatten,
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_mosaic_qup_formulation_matches_conv_transpose():
    """The (a, b) = (w_q[1,0], w_q[0,0]) row mapping reproduces
    lax.conv_transpose(strides=(2,1), SAME) on the dequantized kernel."""
    rng = np.random.default_rng(3)
    n, h, wb, c, co = 1, 6, 4, 128, 128
    x = rng.standard_normal((n, h, wb, c)).astype(np.float32)
    w_q = rng.integers(-127, 128, size=(2, 1, c, co), dtype=np.int8)
    ref = lax.conv_transpose(
        jnp.asarray(x), jnp.asarray(w_q).astype(jnp.float32),
        strides=(2, 1), padding="SAME", dimension_numbers=_DN,
    )
    y0 = np.einsum("nhwc,cd->nhwd", x, w_q[1, 0].astype(np.float32))
    y1 = np.einsum("nhwc,cd->nhwd", x, w_q[0, 0].astype(np.float32))
    got = np.stack([y0, y1], axis=2).reshape(n, 2 * h, wb, co)
    # f32 accumulation-order noise only (K=128 sums of ~1e2 terms)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-2)


def test_mosaicized_whole_net_with_int8_up_layers():
    """quantize_up=True (flag level 2): the up layers run the int8 GEMM
    kernel. Not bit-exact (int8 up weights) — assert the logits stay
    close and the label map agrees almost everywhere."""
    from annonet_tpu.models.folded_runtime import (
        fold_runtime_params, split_folded,
    )
    from annonet_tpu.models.quantized_runtime import (
        apply_folded_int8, collect_calibration, quantize_folded,
    )
    from annonet_tpu.models.segnet import (
        SegNetConfig, fold_batchnorm, init_state,
    )
    from annonet_tpu.ops.int8_conv_mosaic import mosaicize_qspec

    cfg = SegNetConfig(
        class_count=3, level_count=2, base_width=16,
        compute_dtype="float32",
    )
    params, bn = init_state(jax.random.PRNGKey(1), cfg)
    rt = fold_batchnorm(params, bn, cfg)
    (f0, spec), arrays = split_folded(fold_runtime_params(rt, cfg, fold0=8))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 256, size=(1, 64, 64, 3), dtype=np.uint8))
    calib = tuple(
        np.asarray(c)
        for c in collect_calibration(arrays, x, cfg, fold0=f0, spec=spec)
    )
    qspec, qarrays = quantize_folded(spec, arrays, calib, cfg, f0)
    ref = np.asarray(apply_folded_int8(qarrays, x, cfg, fold0=f0, qspec=qspec))
    mspec, marrays = mosaicize_qspec(qspec, qarrays, quantize_up=True)
    assert mspec.count("mup") == 2
    got = np.asarray(
        apply_folded_int8(marrays, x, cfg, fold0=f0, qspec=mspec)
    )
    agree = float((got.argmax(-1) == ref.argmax(-1)).mean())
    assert agree > 0.99, agree
    # logits differ only by the up layers' int8 weight rounding
    denom = np.maximum(np.abs(ref).max(), 1.0)
    assert np.abs(got - ref).max() / denom < 0.08


def test_mosaic_fconv_matches_xla_conv():
    """The float tap-GEMM kernel == the XLA folded conv to accumulation-
    order tolerance (f32 accumulation both sides, different tap order)."""
    from annonet_tpu.ops.int8_conv_mosaic import fconv3x3_s1_bias_relu

    rng = np.random.default_rng(11)
    n, h, wb, c = 2, 16, 11, 128
    x = rng.standard_normal((n, h, wb, c)).astype(np.float32)
    w = (rng.standard_normal((3, 3, c, 128)) * 0.05).astype(np.float32)
    bias = rng.standard_normal(128).astype(np.float32)

    ref = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=_DN,
    )
    ref = jnp.maximum(ref + jnp.asarray(bias), 0.0)

    taps = [jnp.asarray(w[:, t].reshape(3 * c, 128)) for t in range(3)]
    got = fconv3x3_s1_bias_relu(
        jnp.asarray(x), taps[0], taps[1], taps[2], jnp.asarray(bias),
        rows=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_mosaicized_float_net_matches_plain(monkeypatch):
    """ANNONET_TPU_MOSAIC_FLOAT=1 through TiledInferer == the plain float
    inferer's label map (same math, different tap order)."""
    from annonet_tpu.infer.core import TiledInferer
    from annonet_tpu.infer.tiling import TilingParameters
    from annonet_tpu.models.segnet import (
        SegNetConfig, fold_batchnorm, init_state,
        required_input_dimension,
    )

    cfg = SegNetConfig(class_count=3, level_count=1, base_width=16)
    params, bn = init_state(jax.random.PRNGKey(4), cfg)
    rt = fold_batchnorm(params, bn, cfg)
    overlap = required_input_dimension(cfg)
    tiling = TilingParameters(64, 64, overlap, overlap)
    rng = np.random.default_rng(6)
    image = rng.integers(0, 256, size=(96, 96, 3), dtype=np.uint8)

    def run(flag):
        monkeypatch.setenv("ANNONET_TPU_MOSAIC_FLOAT", flag)
        inf = TiledInferer(rt, cfg, tiling)
        if flag == "1":
            assert inf.use_mosaic_float
            spec = inf._get_folded(8)[0][1]
            assert "fs1" in spec
        labels, _ = inf.infer_arrays(image)
        return np.asarray(labels)

    a, b = run("0"), run("1")
    agree = float((a == b).mean())
    assert agree > 0.995, agree


def test_mosaic_fs2_fup_kernels_match_xla():
    """Float s2/up twins == XLA to accumulation-order tolerance."""
    from annonet_tpu.ops.int8_conv_mosaic import (
        fconv3x3_s2_bias_relu, fup_bias_relu,
    )

    rng = np.random.default_rng(13)
    n, h, wb, c = 2, 16, 11, 128
    x = rng.standard_normal((n, h, wb, c)).astype(np.float32)
    bias = rng.standard_normal(128).astype(np.float32)

    w2 = (rng.standard_normal((3, 2, c, 128)) * 0.05).astype(np.float32)
    ref = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w2), (2, 1), [(0, 1), (0, 1)],
        dimension_numbers=_DN,
    )
    ref = jnp.maximum(ref + jnp.asarray(bias), 0.0)
    taps = [jnp.asarray(w2[:, t].reshape(3 * c, 128)) for t in range(2)]
    got = fconv3x3_s2_bias_relu(
        jnp.asarray(x), taps[0], taps[1], jnp.asarray(bias),
        rows=4, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

    wu = (rng.standard_normal((2, 1, c, 128)) * 0.05).astype(np.float32)
    ref = lax.conv_transpose(
        jnp.asarray(x), jnp.asarray(wu), strides=(2, 1),
        padding="SAME", dimension_numbers=_DN,
    )
    ref = jnp.maximum(ref + jnp.asarray(bias), 0.0)
    got = fup_bias_relu(
        jnp.asarray(x), jnp.asarray(wu[1, 0]), jnp.asarray(wu[0, 0]),
        jnp.asarray(bias), rows=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


# ------------------------------------------------- fast-WB gating policy


def test_plan_tiles_prefer_width_snaps_up_only():
    """prefer_tile_widths snaps the tile width UP to the smallest listed
    width that fits; widths below the computed tile or above the user
    max are ignored (the snap may only grow the tile)."""
    from annonet_tpu.infer.tiling import TilingParameters, plan_tiles
    from annonet_tpu.models.segnet import SegNetConfig

    cfg = SegNetConfig(class_count=3, level_count=3, base_width=16)
    tiling = TilingParameters(1024, 1024, 152, 152)
    base = plan_tiles(4096, 4096, cfg, tiling, lane_align_tiles=False)
    snapped = plan_tiles(
        4096, 4096, cfg, tiling, lane_align_tiles=False,
        prefer_tile_widths=[768, 832, 1024],
    )
    # 768/832 are below the computed width -> first fitting is 1024
    assert snapped.tile_width == 1024
    assert snapped.tile_height == base.tile_height
    # a list with nothing >= the computed width leaves the plan alone
    unsnapped = plan_tiles(
        4096, 4096, cfg, tiling, lane_align_tiles=False,
        prefer_tile_widths=[256],
    )
    assert unsnapped.tile_width == base.tile_width
    # the user's max tile width is a hard cap
    capped = plan_tiles(
        4096, 4096, cfg, tiling, lane_align_tiles=False,
        prefer_tile_widths=[2048],
    )
    assert capped.tile_width == base.tile_width
    # misaligned caller widths are stride-aligned before snapping (a raw
    # 1020 would break the level-3 skip concats mid-net)
    from annonet_tpu.models.segnet import recommended_input_dimension

    aligned = plan_tiles(
        4096, 4096, cfg, tiling, lane_align_tiles=False,
        prefer_tile_widths=[1020],
    )
    assert aligned.tile_width == recommended_input_dimension(cfg, 1020)
    assert aligned.tile_width % (2 ** cfg.level_count) == 0


def test_inferer_wb_gate_and_auto_snap(monkeypatch):
    """With the Mosaic mode on, the planner snaps the quantized plan to a
    fast folded width and _get_quantized rewrites only at those widths
    (plain net elsewhere, unless forced)."""
    from annonet_tpu.infer.core import TiledInferer
    from annonet_tpu.infer.tiling import TilingParameters
    from annonet_tpu.models.segnet import (
        SegNetConfig, fold_batchnorm, init_state,
    )
    from annonet_tpu.ops.int8_conv_mosaic import MOSAIC_FAST_WB

    cfg = SegNetConfig(class_count=3, level_count=3, base_width=16)
    params, bn = init_state(jax.random.PRNGKey(0), cfg)
    rt = fold_batchnorm(params, bn, cfg)
    tiling = TilingParameters(1024, 1024, 152, 152)

    monkeypatch.setenv("ANNONET_TPU_MOSAIC_INT8", "s1")
    inf = TiledInferer(rt, cfg, tiling, quantize="int8")
    assert inf.mosaic_int8_mode == "s1"
    plan = inf.plan(4096, 4096)
    assert plan.tile_width // 8 in MOSAIC_FAST_WB

    # populate the quantized cache through a tiny real inference
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.integers(0, 256, size=(96, 96, 3), dtype=np.uint8)
    )
    inf.infer_arrays(img)
    (fold0,) = inf._quantized_cache.keys()

    # small widths are not in the fast set -> the plain net executes
    small = inf.plan(96, 96)
    assert small.tile_width // fold0 not in MOSAIC_FAST_WB
    qspec, _ = inf._get_quantized(fold0, small.tile_width)
    assert not any(k.startswith("ms") for k in qspec)

    # at a fast width the s1 convs are rewritten, s2 stays XLA (mode s1)
    qspec, _ = inf._get_quantized(fold0, 128 * fold0)
    assert any(k.startswith("ms1") for k in qspec)
    assert not any(k.startswith("ms2") for k in qspec)

    # mode "1" = s1+s2; FORCE pushes past the gate at any width
    monkeypatch.setenv("ANNONET_TPU_MOSAIC_INT8", "1")
    monkeypatch.setenv("ANNONET_TPU_MOSAIC_FORCE", "1")
    inf2 = TiledInferer(rt, cfg, tiling, quantize="int8")
    inf2.infer_arrays(img)
    qspec, _ = inf2._get_quantized(fold0, small.tile_width)
    assert any(k.startswith("ms1") for k in qspec)
    assert any(k.startswith("ms2") for k in qspec)


def test_mosaic_int8_refuses_non_cpu_backends(monkeypatch):
    """The hardware fence: a non-off ANNONET_TPU_MOSAIC_INT8 raises on
    any non-CPU backend (on real TPUs the composed program's labels
    drift ±1 requant step from the XLA arm — a downstream bf16 layer's
    accumulation order shifts under the custom call's layout influence,
    docs/DESIGN.md §34 — and the path is slower anyway) unless
    ANNONET_TPU_MOSAIC_INT8_UNSAFE=1 acknowledges it. infer/core.py
    _mosaic_int8_mode."""
    from annonet_tpu.infer import core

    class _FakeDevice:
        platform = "tpu"

    monkeypatch.setattr(jax, "devices", lambda *a, **k: [_FakeDevice()])

    monkeypatch.setenv("ANNONET_TPU_MOSAIC_INT8", "s1")
    monkeypatch.delenv("ANNONET_TPU_MOSAIC_INT8_UNSAFE", raising=False)
    with pytest.raises(RuntimeError, match="labels drift"):
        core._mosaic_int8_mode()

    # the explicit acknowledgment downgrades refuse -> stderr warning
    monkeypatch.setenv("ANNONET_TPU_MOSAIC_INT8_UNSAFE", "1")
    assert core._mosaic_int8_mode() == "s1"

    # off never touches the backend query path
    monkeypatch.delenv("ANNONET_TPU_MOSAIC_INT8_UNSAFE", raising=False)
    monkeypatch.setenv("ANNONET_TPU_MOSAIC_INT8", "0")
    assert core._mosaic_int8_mode() == "off"
