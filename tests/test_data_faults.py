"""Fault-injection tests for the data layer (SURVEY §5.3).

The reference survives broken clips by retrying opens and resampling a
different list entry (base_dataset.py:110-140); training must not die on one
corrupt video.  These tests inject a missing file and a too-short interval
and assert both recovery modes: resample_on_fail=True silently substitutes a
valid clip, =False raises with the offending path.
"""

import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from vfi_tpu.data.datasets import ContiguousVideoClipDataset


@pytest.fixture()
def mixed_list(tmp_path):
    """Videolist: [0] missing file, [1] good 10-frame clip, [2] too-short."""
    good = tmp_path / "good.npy"
    np.save(good, np.random.RandomState(0).randint(0, 255, (10, 16, 16, 3), dtype=np.uint8))
    short = tmp_path / "short.npy"
    np.save(short, np.random.RandomState(1).randint(0, 255, (2, 16, 16, 3), dtype=np.uint8))
    lst = tmp_path / "list.txt"
    lst.write_text(f"{tmp_path}/missing.npy 1-10\n{good} 1-10\n{short} 1-2\n")
    return str(lst)


def _ds(mixed_list, resample_on_fail):
    return ContiguousVideoClipDataset(
        1, mixed_list, 6, False, False, (16, 16), resample_on_fail
    )


def test_missing_clip_resamples(mixed_list):
    np.random.seed(0)
    random.seed(0)
    item = _ds(mixed_list, resample_on_fail=True)[0]  # index 0 = missing file
    assert item["targets"].shape == (6, 16, 16, 1)
    assert item["clip_label"].startswith("good.npy")


def test_short_interval_resamples(mixed_list):
    np.random.seed(0)
    random.seed(0)
    item = _ds(mixed_list, resample_on_fail=True)[2]  # index 2 = 2 frames < 6
    assert item["clip_label"].startswith("good.npy")


def test_missing_clip_raises_without_resample(mixed_list):
    with pytest.raises(RuntimeError, match="missing.npy"):
        _ds(mixed_list, resample_on_fail=False)[0]


def test_short_interval_raises_without_resample(mixed_list):
    with pytest.raises(RuntimeError, match="too short"):
        _ds(mixed_list, resample_on_fail=False)[2]


def test_good_clip_unaffected(mixed_list):
    item = _ds(mixed_list, resample_on_fail=False)[1]
    assert item["targets"].shape == (6, 16, 16, 1)
    assert item["targets"].min() >= -1.0 and item["targets"].max() <= 1.0
