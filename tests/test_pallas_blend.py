"""Pallas blend-accumulate kernel vs the straightforward formulation
(interpret mode, runs on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from annonet_tpu.ops.pallas_blend import blend_accumulate


def reference_blend(logits, tile_yx, ramp, hp, wp):
    n, k, th, tw = logits.shape
    acc = np.zeros((k, hp, wp), np.float32)
    for i in range(n):
        y, x = tile_yx[i]
        acc[:, y : y + th, x : x + tw] += logits[i] * ramp[None]
    return acc


@pytest.mark.parametrize(
    "n,k,th,tw,hp,wp",
    [
        (1, 3, 16, 128, 16, 128),
        (4, 3, 32, 128, 64, 256),
        (6, 2, 16, 256, 48, 512),
    ],
)
def test_blend_accumulate_matches_reference(n, k, th, tw, hp, wp):
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(n, k, th, tw)).astype(np.float32)
    ramp = rng.random((th, tw)).astype(np.float32)
    ys = rng.integers(0, hp - th + 1, size=n)
    xs = rng.integers(0, wp - tw + 1, size=n)
    tile_yx = np.stack([ys, xs], axis=1).astype(np.int32)

    expected = reference_blend(logits, tile_yx, ramp, hp, wp)
    got = np.asarray(
        blend_accumulate(
            jnp.asarray(logits),
            jnp.asarray(tile_yx),
            jnp.asarray(ramp),
            padded_h=hp,
            padded_w=wp,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_blend_accumulate_overlapping_tiles():
    """Tiles overlapping the same region must sum, not overwrite."""
    k, th, tw = 2, 16, 128
    logits = np.ones((2, k, th, tw), np.float32)
    ramp = np.full((th, tw), 0.5, np.float32)
    tile_yx = np.array([[0, 0], [8, 0]], np.int32)  # 8-row overlap
    got = np.asarray(
        blend_accumulate(
            jnp.asarray(logits),
            jnp.asarray(tile_yx),
            jnp.asarray(ramp),
            padded_h=24,
            padded_w=128,
            interpret=True,
        )
    )
    assert (got[:, 0:8] == 0.5).all()
    assert (got[:, 8:16] == 1.0).all()  # overlap band accumulated
    assert (got[:, 16:24] == 0.5).all()
