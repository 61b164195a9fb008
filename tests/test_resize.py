import numpy as np
import pytest
import torch
import torch.nn.functional as F
from scipy.ndimage import zoom as scipy_zoom

from flair_for_aigle_tpu.ops.resize import (
    adaptive_avg_pool_nhwc,
    interpolate,
    resize_bilinear_nhwc,
    resize_nearest_nhwc,
    zoom_nearest,
)


@pytest.mark.parametrize("in_hw,out_hw", [((16, 16), (32, 32)), ((17, 13), (40, 24)),
                                          ((32, 32), (16, 16)), ((24, 24), (7, 7)),
                                          ((12, 12), (96, 96))])
def test_bilinear_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, *in_hw, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear_nhwc(x, *out_hw))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
        mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((16, 16), (32, 32)), ((10, 14), (23, 9))])
def test_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, *in_hw, 2)).astype(np.float32)
    got = np.asarray(resize_nearest_nhwc(x, *out_hw))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="nearest"
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("scale", [2.0, 0.5, 1.5, 2.5])
def test_zoom_nearest_matches_scipy(scale):
    rng = np.random.default_rng(2)
    x = rng.integers(0, 19, size=(24, 24)).astype(np.uint8)
    got = np.asarray(zoom_nearest(x, scale))
    want = scipy_zoom(x, zoom=scale, order=0)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_zoom_nearest_chw():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(5, 16, 16)).astype(np.float32)
    got = np.asarray(zoom_nearest(x, 2.0))
    want = scipy_zoom(x, zoom=(1, 2.0, 2.0), order=0)
    np.testing.assert_array_equal(got, want)


def test_interpolate_nchw_entry():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 5, 8, 8)).astype(np.float32)
    got = np.asarray(interpolate(x, (16, 16), mode="bilinear", channel_axis=1))
    want = F.interpolate(torch.from_numpy(x), size=(16, 16), mode="bilinear",
                         align_corners=False).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("out", [(1, 1), (2, 2), (3, 3), (6, 6), (5, 7)])
def test_adaptive_avg_pool(out):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 13, 17, 4)).astype(np.float32)
    got = np.asarray(adaptive_avg_pool_nhwc(x, *out))
    want = F.adaptive_avg_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), out
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
