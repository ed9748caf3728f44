"""Native preprocessing library: build, correctness vs the NumPy reference
semantics and vs torch's half-pixel bilinear, and throughput sanity."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dwcgan_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load_library()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_builds_and_reports_threads(lib):
    assert native.available()
    assert native.omp_threads() >= 1


def test_matches_numpy_fallback(lib):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 218, 178, 3), dtype=np.uint8)
    flips = np.array([0, 1, 0, 1], dtype=np.int32)
    got = native.preprocess_batch(imgs, crop=178, out_size=128, hflips=flips)
    want = native.preprocess_batch(imgs, crop=178, out_size=128, hflips=flips,
                                   force_fallback=True)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_matches_torch_halfpixel_bilinear(lib):
    """Crop+resize path == F.interpolate(align_corners=False) on the crop."""
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (2, 218, 178, 3), dtype=np.uint8)
    got = native.preprocess_batch(imgs, crop=178, out_size=128)

    top, left = (218 - 178) // 2, 0
    crop = imgs[:, top : top + 178, left : left + 178].astype(np.float32)
    t = torch.from_numpy(crop).permute(0, 3, 1, 2)
    t = F.interpolate(t, size=(128, 128), mode="bilinear", align_corners=False)
    want = (t.permute(0, 2, 3, 1).numpy()) / 127.5 - 1.0
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_output_range(lib):
    imgs = np.zeros((1, 200, 200, 3), dtype=np.uint8)
    out = native.preprocess_batch(imgs, crop=178, out_size=128)
    np.testing.assert_allclose(out, -1.0, atol=1e-5)
    imgs[:] = 255
    out = native.preprocess_batch(imgs, crop=178, out_size=128)
    np.testing.assert_allclose(out, 1.0, atol=1e-5)


def test_normalize_u8(lib):
    import ctypes
    rng = np.random.default_rng(2)
    src = np.ascontiguousarray(rng.integers(0, 256, (1000,), dtype=np.uint8))
    dst = np.empty((1000,), dtype=np.float32)
    lib.dwc_normalize_u8(src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                         1000, dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    np.testing.assert_allclose(dst, src.astype(np.float32) / 127.5 - 1.0, atol=1e-6)
