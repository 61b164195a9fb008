"""Unified time-series T-overflow policy (VERDICT r4 ask #5).

One rule for T > fixed bucket in BOTH the zonal dataset and the train
collate: drop by cloud-cover rank when per-date coverage is known, by even
temporal subsampling otherwise; warn with counts; never crash. Reference
semantics (flair_hub/data/utils_data/padding.py:48-88) pad to the batch
max and never drop — truncation only happens under an explicit fixed T.
"""

import logging

import numpy as np
import pytest

from flair_for_aigle_tpu.data.padding import pad_collate
from flair_for_aigle_tpu.data.sentinel import (
    pad_to_fixed_t,
    select_keep_indices,
)


def test_keep_indices_coverage_drops_worst():
    cov = np.array([0.0, 0.9, 0.1, 0.5, 0.2])
    keep = select_keep_indices(5, 3, cov)
    # worst two (0.9 at idx 1, 0.5 at idx 3) dropped; order chronological
    np.testing.assert_array_equal(keep, [0, 2, 4])


def test_keep_indices_coverage_ties_keep_earlier():
    cov = np.zeros(6)
    keep = select_keep_indices(6, 4, cov)
    np.testing.assert_array_equal(keep, [0, 1, 2, 3])


def test_keep_indices_even_subsample():
    keep = select_keep_indices(10, 4)
    # endpoints kept, spread even, strictly increasing (no duplicates)
    assert keep[0] == 0 and keep[-1] == 9
    assert np.all(np.diff(keep) > 0) and len(keep) == 4


def test_keep_indices_noop_when_fits():
    np.testing.assert_array_equal(select_keep_indices(3, 8), [0, 1, 2])


def test_keep_indices_coverage_length_mismatch():
    with pytest.raises(ValueError):
        select_keep_indices(5, 3, np.zeros(4))


def test_pad_to_fixed_t_truncates_by_coverage_and_warns(caplog):
    arr = np.arange(5 * 2, dtype=np.float32).reshape(5, 2)
    cov = np.array([0.0, 0.9, 0.1, 0.5, 0.2])
    with caplog.at_level(logging.WARNING):
        out = pad_to_fixed_t(arr, 3, coverage=cov, what="SENTINEL2_TS")
    np.testing.assert_array_equal(out, arr[[0, 2, 4]])
    assert any("dropping 2 by cloud-cover rank" in r.getMessage()
               for r in caplog.records)


def test_pad_to_fixed_t_data_and_dates_stay_aligned():
    # the zonal path truncates the TS patch and its date offsets with the
    # same coverage -> identical kept indices
    cov = np.array([0.3, 0.0, 0.8, 0.1])
    patch = np.random.default_rng(0).normal(size=(4, 2, 3, 3)).astype("f4")
    diffs = np.array([10.0, 40.0, 70.0, 100.0], np.float32)
    p = pad_to_fixed_t(patch, 2, coverage=cov)
    d = pad_to_fixed_t(diffs, 2, coverage=cov)
    np.testing.assert_array_equal(p, patch[[1, 3]])
    np.testing.assert_array_equal(d, diffs[[1, 3]])


def test_pad_to_fixed_t_still_pads():
    arr = np.ones((2, 3), np.float32)
    out = pad_to_fixed_t(arr, 4, pad_value=0.0)
    assert out.shape == (4, 3)
    np.testing.assert_array_equal(out[2:], 0.0)


def _sample(t, seed):
    rng = np.random.default_rng(seed)
    return {
        "SENTINEL2_TS": rng.normal(size=(t, 10, 4, 4)).astype("f4"),
        "SENTINEL2_DATES": np.linspace(0, 300, t).astype("f4"),
        "AERIAL_RGBI": rng.normal(size=(4, 8, 8)).astype("f4"),
        "ID_AERIAL_RGBI": f"patch_{seed}.tif",
    }


def test_pad_collate_fixed_t_overflow_truncates_and_warns(caplog):
    # fixed_t smaller than an actual T used to crash in np.stack with an
    # opaque shape error; now it truncates per the unified policy
    samples = [_sample(6, 0), _sample(3, 1)]
    with caplog.at_level(logging.WARNING):
        batch = pad_collate(samples, fixed_t=4)
    assert batch["SENTINEL2_TS"].shape == (2, 4, 10, 4, 4)
    assert batch["SENTINEL2_DATES"].shape == (2, 4)
    assert any("even temporal subsampling" in r.getMessage()
               for r in caplog.records)
    # TS and DATES of the overflowing sample kept the SAME dates
    keep = select_keep_indices(6, 4)
    np.testing.assert_array_equal(
        batch["SENTINEL2_TS"][0], samples[0]["SENTINEL2_TS"][keep])
    np.testing.assert_array_equal(
        batch["SENTINEL2_DATES"][0], samples[0]["SENTINEL2_DATES"][keep])
    # the short sample was zero-padded, not dropped
    np.testing.assert_array_equal(
        batch["SENTINEL2_TS"][1][:3], samples[1]["SENTINEL2_TS"])
    np.testing.assert_array_equal(batch["SENTINEL2_TS"][1][3:], 0.0)


def test_pad_collate_bucket_rounding_never_truncates():
    # default (no fixed_t): bucket rounds UP from the batch max — the
    # reference's pad-to-max semantics, never dropping
    samples = [_sample(9, 2), _sample(5, 3)]
    batch = pad_collate(samples, t_bucket=8)
    assert batch["SENTINEL2_TS"].shape[1] == 16
    np.testing.assert_array_equal(
        batch["SENTINEL2_TS"][0][:9], samples[0]["SENTINEL2_TS"])
