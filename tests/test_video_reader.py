"""The video-file (imageio/ffmpeg) ingest branch, driven by a stubbed reader.

The reference's primary input is video files decoded via imageio/ffmpeg
(base_dataset.py:130-140), with retry-on-open (":118-127") and
retry/resample-on-decode-failure semantics.  `imageio_ffmpeg` is not
installed in this image (codec-level coverage is environment-blocked), so
these tests stub ``imageio.get_reader`` and exercise everything around the
decode call: frame indexing, ``count_frames`` length semantics, open retries,
decode-failure recovery, and pipeline equality with the .npy path on
identical frames (VERDICT r3, Missing #3).
"""

import os
import random
import sys

import imageio
import numpy as np
import pytest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from vfi_tpu.data.datasets import ContiguousVideoClipDataset, _open_video, _VideoReader

FRAMES = np.random.RandomState(0).randint(0, 255, (10, 16, 16, 3), dtype=np.uint8)


class _FakeFFmpegReader:
    """Mimics imageio's ffmpeg reader surface used by _VideoReader."""

    def __init__(self, frames, fail_at=None):
        self._frames = frames
        self._fail_at = fail_at

    def count_frames(self) -> int:
        return len(self._frames)

    def get_data(self, idx: int) -> np.ndarray:
        if self._fail_at is not None and idx == self._fail_at:
            raise IOError(f"decode failure at frame {idx}")
        return self._frames[idx]


@pytest.fixture()
def stub_reader(monkeypatch):
    """Patch imageio.get_reader; returns a dict to configure behavior."""
    cfg = {"frames": FRAMES, "fail_at": None, "open_failures": 0, "opens": 0}

    def get_reader(path, fmt):
        assert fmt == "ffmpeg"
        cfg["opens"] += 1
        if cfg["open_failures"] > 0:
            cfg["open_failures"] -= 1
            raise IOError(f"cannot open {path}")
        return _FakeFFmpegReader(cfg["frames"], cfg["fail_at"])

    monkeypatch.setattr(imageio, "get_reader", get_reader)
    return cfg


def test_reader_dispatches_video_files_to_imageio(stub_reader):
    vid = _VideoReader("/nonexistent/clip.mp4")
    assert len(vid) == 10  # count_frames semantics (base_dataset.py:118-140)
    np.testing.assert_array_equal(vid.get_frame(3), FRAMES[3])


def test_open_retries_then_succeeds(stub_reader):
    stub_reader["open_failures"] = 2  # first two get_reader calls raise
    vid = _open_video("/nonexistent/clip.mp4", retries=5)
    assert vid is not None and len(vid) == 10
    assert stub_reader["opens"] == 3


def test_open_gives_up_after_retries(stub_reader):
    stub_reader["open_failures"] = 99
    assert _open_video("/nonexistent/clip.mp4", retries=5) is None
    assert stub_reader["opens"] == 5


def _ds(list_path, resample_on_fail):
    return ContiguousVideoClipDataset(
        1, str(list_path), 10, False, False, (16, 16), resample_on_fail
    )


def test_video_file_pipeline_matches_npy(stub_reader, tmp_path):
    """Identical frames through the mp4 branch and the .npy branch must give
    bit-identical processed targets (resize/BGR/normalize/gray pipeline)."""
    np.save(tmp_path / "clip.npy", FRAMES)
    (tmp_path / "mp4.txt").write_text("/nonexistent/clip.mp4 1-10\n")
    (tmp_path / "npy.txt").write_text(f"{tmp_path}/clip.npy 1-10\n")

    random.seed(0)
    via_mp4 = _ds(tmp_path / "mp4.txt", False)[0]
    random.seed(0)
    via_npy = _ds(tmp_path / "npy.txt", False)[0]
    np.testing.assert_array_equal(via_mp4["targets"], via_npy["targets"])
    assert via_mp4["targets"].shape == (10, 16, 16, 1)


def test_decode_failure_resamples(stub_reader, tmp_path):
    """A mid-clip decode failure resamples a different list entry (the
    reference's resample_on_fail training behavior, base_dataset.py:160-200)."""
    np.save(tmp_path / "good.npy", FRAMES)
    lst = tmp_path / "list.txt"
    lst.write_text(f"/nonexistent/bad.mp4 1-10\n{tmp_path}/good.npy 1-10\n")
    stub_reader["fail_at"] = 4

    random.seed(0)
    np.random.seed(0)
    item = _ds(lst, True)[0]  # index 0 = the failing mp4
    assert item["clip_label"].startswith("good.npy")


def test_decode_failure_raises_without_resample(stub_reader, tmp_path):
    lst = tmp_path / "list.txt"
    lst.write_text("/nonexistent/bad.mp4 1-10\n")
    stub_reader["fail_at"] = 4
    with pytest.raises(RuntimeError, match="failed to sample frames"):
        _ds(lst, False)[0]
