import datetime

import numpy as np
import pytest

from flair_for_aigle_tpu.data.padding import pad_collate, pad_tensor
from flair_for_aigle_tpu.data.sentinel import (
    filter_time_series,
    pad_to_fixed_t,
    reshape_sentinel,
    temporal_average,
)
from flair_for_aigle_tpu.data.transforms import (
    apply_numpy_augmentations,
    calc_elevation,
    img_as_float,
    norm,
    reshape_label_ohe,
)


def test_norm_custom_matches_reference_math():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    out = norm(img, "custom", [1.0, 2.0], [2.0, 4.0])
    np.testing.assert_allclose(out[0], (img[0].astype(np.float64) - 1) / 2)
    np.testing.assert_allclose(out[1], (img[1].astype(np.float64) - 2) / 4)
    assert out.dtype == np.float64


def test_norm_scaling_uint8_uint16():
    u8 = np.array([[0, 255]], dtype=np.uint8)
    np.testing.assert_allclose(norm(u8, "scaling"), [[0.0, 1.0]])
    u16 = np.array([[0, 65535]], dtype=np.uint16)
    np.testing.assert_allclose(norm(u16, "scaling"), [[0.0, 1.0]])
    f32 = np.array([[0.5]], dtype=np.float32)
    np.testing.assert_allclose(norm(f32, "scaling"), [[0.5]])


def test_norm_invalid_raises():
    with pytest.raises(ValueError):
        norm(np.zeros((1, 2, 2)), "bogus")
    with pytest.raises(ValueError):
        norm(np.zeros((2, 2, 2)), "custom", [1.0], [1.0, 2.0])


def test_calc_elevation_and_ohe():
    arr = np.stack([np.full((4, 4), 7.0), np.full((4, 4), 3.0)])
    np.testing.assert_allclose(calc_elevation(arr), np.full((1, 4, 4), 4.0))
    lab = np.array([[[0, 1], [2, 1]]])
    ohe = reshape_label_ohe(lab, 3)
    assert ohe.shape == (3, 2, 2)
    np.testing.assert_array_equal(ohe.argmax(0), lab[0])


def test_reshape_sentinel():
    arr = np.arange(20 * 4 * 4).reshape(20, 4, 4)
    out = reshape_sentinel(arr, chunk_size=10)
    assert out.shape == (2, 10, 4, 4)
    np.testing.assert_array_equal(out[1, 0], arr[10])


def test_filter_time_series_and_fallback():
    t, h, w = 4, 8, 8
    msk = np.zeros((t, 2, h, w), np.uint8)
    msk[1, 1] = 50  # cloudy date
    keep = filter_time_series(msk, 1, 1, 0.05)
    np.testing.assert_array_equal(keep, [True, False, True, True])
    # all cloudy -> snow-only fallback keeps all (snow channel 0 is clean)
    msk[:, 1] = 50
    keep = filter_time_series(msk, 1, 1, 0.05)
    assert keep.all()


def test_temporal_average_monthly():
    rng = np.random.default_rng(0)
    dates = [datetime.datetime(2021, m, 10) for m in (1, 1, 3, 7)]
    data = rng.normal(size=(4, 2, 2, 2))
    out, diffs = temporal_average(data, dates, "monthly", ref_date="01-15")
    assert out.shape == (12, 2, 2, 2)
    np.testing.assert_allclose(out[0], data[:2].mean(0))  # Jan mean
    np.testing.assert_allclose(out[1], data[:2].mean(0))  # Feb forward-fill
    np.testing.assert_allclose(out[2], data[2])           # Mar
    np.testing.assert_allclose(out[6], data[3])           # Jul
    # day offsets from ref 01-15 to mid-month
    assert diffs[0] == 0 and diffs[2] == (datetime.datetime(2021, 3, 15)
                                          - datetime.datetime(2021, 1, 15)).days


def test_temporal_average_semi_monthly():
    dates = [datetime.datetime(2021, 1, 5), datetime.datetime(2021, 1, 20)]
    data = np.stack([np.zeros((1, 2, 2)), np.ones((1, 2, 2))])
    out, diffs = temporal_average(data, dates, "semi-monthly", ref_date="01-01")
    assert out.shape == (24, 1, 2, 2)
    np.testing.assert_allclose(out[0], data[0])
    np.testing.assert_allclose(out[1], data[1])
    np.testing.assert_allclose(out[2], data[1])  # forward fill
    assert diffs[0] == 7 and diffs[1] == 22


def test_augmentations_joint_and_label_consistency():
    rng = np.random.default_rng(3)
    img = rng.normal(size=(3, 8, 8)).astype(np.float32)
    ts = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    lab = rng.integers(0, 5, size=(5, 8, 8)).astype(np.float32)
    d = {"A": img.copy(), "TS": ts.copy(), "L": lab.copy()}
    out = apply_numpy_augmentations(d, ["A", "TS"], ["L"],
                                    rng=np.random.default_rng(0))
    # same geometric transform applied everywhere: matching pixels still match
    flat_in = img[0]
    flat_out = out["A"][0]
    assert sorted(flat_in.ravel()) == sorted(flat_out.ravel())
    # find the transform by matching a corner and verify it on labels
    assert out["L"].shape == lab.shape
    assert sorted(out["L"].ravel()) == sorted(lab.ravel())


def test_pad_collate_variable_t():
    s1 = {"SENTINEL2_TS": np.ones((3, 2, 4, 4), np.float32),
          "SENTINEL2_DATES": np.arange(3, dtype=np.float32),
          "AERIAL_RGBI": np.zeros((3, 4, 4), np.float32),
          "ID_TASK": "patch_1"}
    s2 = {"SENTINEL2_TS": np.ones((5, 2, 4, 4), np.float32),
          "SENTINEL2_DATES": np.arange(5, dtype=np.float32),
          "AERIAL_RGBI": np.zeros((3, 4, 4), np.float32),
          "ID_TASK": "patch_2"}
    batch = pad_collate([s1, s2], t_bucket=8)
    assert batch["SENTINEL2_TS"].shape == (2, 8, 2, 4, 4)
    assert batch["SENTINEL2_DATES"].shape == (2, 8)
    assert batch["AERIAL_RGBI"].shape == (2, 3, 4, 4)
    assert batch["ID_TASK"] == ["patch_1", "patch_2"]
    # padded frames are zero (the UTAE pad_value)
    assert (batch["SENTINEL2_TS"][0, 3:] == 0).all()


def test_pad_to_fixed_t_truncates_and_pads():
    arr = np.arange(5 * 2).reshape(5, 2).astype(np.float32)
    assert pad_to_fixed_t(arr, 3).shape == (3, 2)
    out = pad_to_fixed_t(arr, 8)
    assert out.shape == (8, 2) and (out[5:] == 0).all()
