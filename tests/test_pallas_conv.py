"""Pallas GEMM conv kernels vs lax.conv (interpret mode, runs on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from annonet_tpu.ops.pallas_conv import (
    build_gemm_kernels_aligned,
    conv3x3_gemm_aligned,
)


def reference(x, w, b):
    out = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return np.maximum(np.asarray(out) + b, 0.0)


@pytest.mark.parametrize(
    "n,h,w,cin,cout,fold,rows",
    [(1, 8, 32, 16, 16, 8, 8), (2, 16, 64, 4, 8, 8, 8), (1, 4, 16, 8, 4, 4, 4)],
)
def test_aligned_gemm_conv(n, h, w, cin, cout, fold, rows):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(n, h, w, cin)).astype(np.float32)
    wgt = rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
    b = rng.normal(size=(cout,)).astype(np.float32)
    wc, wl, wr = build_gemm_kernels_aligned(wgt, fold)
    got = conv3x3_gemm_aligned(
        jnp.asarray(x.reshape(n, h, w // fold, fold * cin)),
        jnp.asarray(wc), jnp.asarray(wl), jnp.asarray(wr),
        jnp.asarray(b), fold, cin, rows=rows, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got).reshape(n, h, w, cout),
        reference(x, wgt, b), atol=1e-3,
    )


def test_folded_runtime_with_pallas_conv_matches():
    """The folded net with s1 layers on the pallas kernel (interpret) equals
    the plain runtime."""
    import jax

    from annonet_tpu.models.folded_runtime import (
        apply_runtime_folded,
        fold_runtime_params,
    )
    from annonet_tpu.models.segnet import (
        SegNetConfig,
        apply_runtime,
        fold_batchnorm,
        init_state,
    )

    config = SegNetConfig(
        class_count=3, level_count=2, base_width=4, compute_dtype="float32"
    )
    params, stats = init_state(jax.random.PRNGKey(2), config)
    runtime = fold_batchnorm(params, stats, config)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(1, 16, 32, 3), dtype=np.uint8)
    ref = np.asarray(apply_runtime(runtime, x, config))
    got = np.asarray(
        apply_runtime_folded(
            fold_runtime_params(runtime, config, 8, pallas_s1=True), x, config
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)
