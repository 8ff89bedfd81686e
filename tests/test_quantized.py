"""int8 quantized folded runtime (models/quantized_runtime.py).

The quantized net computes the same function as the bf16 folded net up to
int8 grid rounding; these tests pin the error envelope (logit error, label
agreement) on random nets — where near-tie logits make agreement HARDEST —
and the API contract. End-to-end accuracy floors under int8 are asserted in
tests/test_end_to_end.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from annonet_tpu.models.segnet import SegNetConfig, fold_batchnorm, init_state
from annonet_tpu.models.folded_runtime import (
    apply_folded_split,
    fold_runtime_params,
    split_folded,
)
from annonet_tpu.models.quantized_runtime import (
    apply_folded_int8,
    collect_calibration,
    quantize_folded,
    quantize_input,
)
from annonet_tpu.infer.core import TiledInferer, annonet_infer
from annonet_tpu.infer.tiling import TilingParameters


def _quantized_setup(config, image_shape, seed=0):
    params, bn = init_state(jax.random.PRNGKey(seed), config)
    runtime = fold_batchnorm(params, bn, config)
    fparams = fold_runtime_params(runtime, config, 8)
    (fold0, spec), arrays = split_folded(fparams)
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 256, size=image_shape, dtype=np.uint8)
    calib = [
        np.asarray(m)
        for m in collect_calibration(
            arrays, jnp.asarray(x), config, fold0=fold0, spec=spec
        )
    ]
    qspec, qarrays = quantize_folded(spec, arrays, calib, config, fold0)
    return runtime, (fold0, spec, arrays), (qspec, qarrays), x


@pytest.mark.parametrize(
    "config",
    [
        SegNetConfig(class_count=3, level_count=2, base_width=16),
        SegNetConfig(class_count=2, level_count=0, base_width=16),
        SegNetConfig(class_count=4, level_count=1, base_width=16,
                     grayscale=True),
    ],
    ids=["rgb-l2", "rgb-l0", "gray-l1"],
)
def test_int8_logits_track_bf16(config):
    shape = (2, 64, 64, config.in_channels)
    _, (fold0, spec, arrays), (qspec, qarrays), x = _quantized_setup(
        config, shape
    )
    ref = np.asarray(
        apply_folded_split(
            arrays, jnp.asarray(x), config, fold0=fold0, spec=spec
        ),
        np.float32,
    )
    got = np.asarray(
        apply_folded_int8(
            qarrays, jnp.asarray(x), config, fold0=fold0, qspec=qspec
        )
    )
    # int8 grid error stays a small fraction of the logit spread, and the
    # argmax agrees except at near-ties (random nets are all near-ties)
    spread = ref.std()
    assert np.abs(got - ref).mean() < 0.1 * spread
    agreement = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agreement > 0.95, agreement


def test_pre_folded_input_matches_uint8_path():
    config = SegNetConfig(class_count=3, level_count=1, base_width=16)
    shape = (1, 32, 32, 3)
    _, (fold0, _spec, _arrays), (qspec, qarrays), x = _quantized_setup(
        config, shape
    )
    a = apply_folded_int8(
        qarrays, jnp.asarray(x), config, fold0=fold0, qspec=qspec
    )
    q = quantize_input(jnp.asarray(x), fold0, qspec)
    b = apply_folded_int8(
        qarrays, q, config, fold0=fold0, qspec=qspec, pre_folded=True
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_folded_output_is_class_major_unfold():
    config = SegNetConfig(class_count=3, level_count=1, base_width=16)
    shape = (1, 32, 32, 3)
    _, (fold0, _spec, _arrays), (qspec, qarrays), x = _quantized_setup(
        config, shape
    )
    full = np.asarray(
        apply_folded_int8(
            qarrays, jnp.asarray(x), config, fold0=fold0, qspec=qspec
        )
    )
    folded = np.asarray(
        apply_folded_int8(
            qarrays, jnp.asarray(x), config, fold0=fold0, qspec=qspec,
            folded_output=True,
        )
    )
    n, h, wb, kf = folded.shape
    f = kf // config.class_count
    # class c's plane is the contiguous lane slice [c*f, (c+1)*f)
    for c in range(config.class_count):
        plane = folded[..., c * f : (c + 1) * f].reshape(n, h, wb * f)
        np.testing.assert_array_equal(plane, full[..., c])


def test_tiled_inferer_int8_agreement_and_detection():
    config = SegNetConfig(class_count=3, level_count=1, base_width=16)
    params, bn = init_state(jax.random.PRNGKey(0), config)
    runtime = fold_batchnorm(params, bn, config)
    tiling = TilingParameters(64, 64, 20, 20)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, size=(100, 100, 3), dtype=np.uint8)

    base = TiledInferer(runtime, config, tiling)
    quant = TiledInferer(runtime, config, tiling, quantize="int8")
    lb = annonet_infer(base, image)
    lq = annonet_infer(quant, image)
    assert lq.shape == lb.shape and lq.dtype == lb.dtype
    assert (lb == lq).mean() > 0.95

    # detection path: seeds come back and the veto composes
    lq2, seeds = quant.infer_arrays(
        image, detection_levels=[0.0, 0.2, 0.2]
    )
    assert seeds is not None and seeds.shape == lq2.shape

    # the compiled-program caches are per-mode: flipping back to the float
    # inferer still matches its own earlier output
    np.testing.assert_array_equal(annonet_infer(base, image), lb)


def test_chunked_forward_with_quantize():
    """Large images chunk the tile batch through lax.map; the chunk reshape
    must preserve the pre-quantized WIDTH-FOLDED tile shape (regression:
    an unfolded-shape reshape broke 8192^2 int8 inference)."""
    config = SegNetConfig(class_count=3, level_count=0, base_width=16)
    params, bn = init_state(jax.random.PRNGKey(0), config)
    runtime = fold_batchnorm(params, bn, config)
    tiling = TilingParameters(48, 48, 10, 10)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, size=(120, 120, 3), dtype=np.uint8)
    base = TiledInferer(runtime, config, tiling)
    chunked = TiledInferer(
        runtime, config, tiling, forward_chunk=2, quantize="int8"
    )
    unchunked = TiledInferer(runtime, config, tiling, quantize="int8")
    assert chunked.plan(*image.shape[:2]).tile_count > 2
    lc = annonet_infer(chunked, image)
    lu = annonet_infer(unchunked, image)
    np.testing.assert_array_equal(lc, lu)
    assert (lc == annonet_infer(base, image)).mean() > 0.95


def test_quantize_option_validation():
    config = SegNetConfig(class_count=3, level_count=1, base_width=16)
    params, bn = init_state(jax.random.PRNGKey(0), config)
    runtime = fold_batchnorm(params, bn, config)
    with pytest.raises(ValueError):
        TiledInferer(runtime, config, quantize="int4")
    with pytest.raises(ValueError):
        TiledInferer(runtime, config, quantize="int8", use_folded_net=False)
    with pytest.raises(ValueError):
        TiledInferer(
            runtime, config, quantize="int8", use_pallas_conv=True
        )


def test_batched_inference_equals_per_image():
    """infer_arrays_batch / annonet_infer_batch: M same-size images in one
    device program, per-image results EXACTLY equal the single-image path
    (bf16 and int8), including detection seeds and the blob veto."""
    from annonet_tpu.infer.core import annonet_infer_batch

    config = SegNetConfig(class_count=3, level_count=0, base_width=16)
    params, bn = init_state(jax.random.PRNGKey(0), config)
    runtime = fold_batchnorm(params, bn, config)
    tiling = TilingParameters(48, 48, 10, 10)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(3, 80, 80, 3), dtype=np.uint8)
    det = [0.0, 0.1, 0.1]

    for kw in ({}, {"quantize": "int8"}):
        inf = TiledInferer(runtime, config, tiling, **kw)
        lb, sb = inf.infer_arrays_batch(images, detection_levels=det)
        assert lb.shape == (3, 80, 80) and sb.shape == (3, 80, 80)
        full = annonet_infer_batch(inf, images, detection_levels=det)
        for i in range(3):
            li, si = inf.infer_arrays(images[i], detection_levels=det)
            np.testing.assert_array_equal(li, lb[i])
            np.testing.assert_array_equal(si, sb[i])
            np.testing.assert_array_equal(
                full[i], annonet_infer(inf, images[i], detection_levels=det)
            )
        with pytest.raises(ValueError):
            inf.infer_arrays_batch(images[0])
        with pytest.raises(ValueError):
            inf.infer_arrays_batch(images[:0])

    # M=3 above already exercises the power-of-two bucketing (padded to 4
    # internally, sliced back); pallas blend rejects multi-image batches
    pall = TiledInferer(
        runtime, config, tiling, use_folded_net=False, use_pallas_blend=True
    )
    with pytest.raises(ValueError):
        pall.infer_arrays_batch(images)
