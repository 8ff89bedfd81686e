"""Native C++ host-runtime module: build, parity vs Python fallbacks."""

import os

import numpy as np
import pytest

from annonet_tpu.classes import IGNORE_LABEL
from annonet_tpu import native


requires_native = pytest.mark.skipif(
    native.get_lib() is None, reason="native module unavailable"
)


@requires_native
def test_ccl_matches_python_fallback():
    rng = np.random.default_rng(0)
    for _ in range(10):
        labels = rng.integers(0, 4, size=(40, 50)).astype(np.uint16)
        labels[rng.random(labels.shape) < 0.1] = IGNORE_LABEL

        from annonet_tpu.ops import blobs as blobs_mod

        native_blobs, native_count = native.label_connected_blobs_native(
            labels, True, True
        )
        os.environ["ANNONET_TPU_NO_NATIVE"] = "1"
        try:
            py_blobs, py_count = blobs_mod.label_connected_blobs(
                labels, zero_is_background=True, ignore_is_background=True
            )
        finally:
            del os.environ["ANNONET_TPU_NO_NATIVE"]

        assert native_count == py_count
        # same partition: blob ids must be a bijection of each other
        assert (native_blobs == 0).tolist() == (py_blobs == 0).tolist()
        pairs = set(zip(native_blobs.ravel().tolist(), py_blobs.ravel().tolist()))
        # each native id maps to exactly one python id and vice versa
        assert len({a for a, _ in pairs}) == len(pairs)
        assert len({b for _, b in pairs}) == len(pairs)


@requires_native
def test_extract_crop_matches_python_fallback():
    rng = np.random.default_rng(1)
    image = rng.integers(0, 256, size=(30, 20, 3), dtype=np.uint8)
    labels = rng.integers(0, 3, size=(30, 20)).astype(np.uint16)

    from annonet_tpu.data import crop as crop_mod

    for rect in [(-5, -7, 10, 8), (5, 5, 14, 14), (10, 25, 40, 35),
                 (-3, 28, 25, 33)]:
        native_img, native_lab = crop_mod.extract_crop(image, labels, rect)
        os.environ["ANNONET_TPU_NO_NATIVE"] = "1"
        try:
            py_img, py_lab = crop_mod.extract_crop(image, labels, rect)
        finally:
            del os.environ["ANNONET_TPU_NO_NATIVE"]
        np.testing.assert_array_equal(native_img, py_img)
        np.testing.assert_array_equal(native_lab, py_lab)


@requires_native
def test_ccl_ignore_not_background_forms_blobs():
    labels = np.full((3, 3), IGNORE_LABEL, dtype=np.uint16)
    blobs, count = native.label_connected_blobs_native(labels, True, False)
    # ignore pixels are a regular equal-valued blob when not background
    assert count == 2
    assert (blobs == 1).all()
