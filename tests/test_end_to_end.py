"""CPU-runnable end-to-end slice: predict -> PNG dump -> quant pipeline
(BASELINE.json config 1, at test scale)."""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _make_dataset(root, n_clips=2, n_frames=12, hw=32):
    rng = np.random.RandomState(0)
    lines = []
    os.makedirs(root, exist_ok=True)
    for i in range(n_clips):
        path = os.path.join(root, f"clip{i}.npy")
        base = rng.randint(0, 200, (1, hw, hw, 3)).astype(np.float32)
        drift = rng.randint(-2, 3, (n_frames, 1, 1, 3)).cumsum(0)
        vid = np.clip(base + drift, 0, 255).astype(np.uint8)
        np.save(path, vid)
        lines.append(f"{path} 1-{n_frames}")
    list_path = os.path.join(root, "videolist.txt")
    with open(list_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return list_path


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("clips")
    return _make_dataset(str(root))


def _run(args, cwd):
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO}
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    return r


def test_predict_quant_summarize_pipeline(dataset, tmp_path):
    qual = str(tmp_path / "qual")
    quant = str(tmp_path / "quant")
    dest = str(tmp_path / "tables")

    _run(
        [
            os.path.join(REPO, "cli", "predict.py"),
            "--K", "2", "--T", "2", "--F", "2", "--image_size", "32",
            "--c_dim", "1", "--batch_size", "2",
            "--model_key", "TimeWeightedPFFillInModel",
            "--test_video_list_path", dataset,
            "--qual_result_root", qual,
            # serving-observability window: trace batch 1 (short dataset, so
            # the STOP batch is never reached and the loop-exit path closes it)
            "--profile_steps", "1", "99", "--profile_dir", str(tmp_path / "trace"),
        ],
        cwd=REPO,
    )
    # the profiler trace window must have been captured and closed
    assert glob.glob(str(tmp_path / "trace" / "**" / "*.trace.json.gz"), recursive=True)
    clips = os.listdir(qual)
    assert len(clips) == 2
    frames = sorted(os.listdir(os.path.join(qual, clips[0])))
    # K gt_preceding + T gt_middle + T pred_middle + F gt_following
    assert len(frames) == 8
    assert any(f.startswith("pred_middle_") for f in frames)

    _run(
        [os.path.join(REPO, "cli", "compute_quant_results.py"), qual, quant, "2", "2"],
        cwd=REPO,
    )
    data = np.load(os.path.join(quant, "results.npz"))
    assert data["psnr"].shape == (2, 2)
    assert np.all(data["psnr"] > 5)
    assert np.all(data["ssim"] <= 1.0)

    _run(
        [
            os.path.join(REPO, "cli", "summarize_quant_results.py"), "metric_summary_text_file",
            "--quant_results_roots", quant, "--labels", "TW_P_F",
            "--dest_path", dest, "--metric", "psnr",
        ],
        cwd=REPO,
    )
    table = open(os.path.join(dest, "psnr_perf_summary.txt")).read()
    assert "TW_P_F" in table and table.startswith("+")


def test_predict_device_normalize_matches_host_path(dataset, tmp_path):
    """--device_normalize (uint8 H2D + on-device normalization) must produce
    the same PNGs as the host-normalized float pipeline (same serving flag as
    train.py; ops/image.py:frames_from_uint8)."""
    from PIL import Image

    # clips of EXACTLY seq_len frames: the contiguous dataset random-crops a
    # K+T+F window per run, so longer clips would compare different frames
    dataset = _make_dataset(str(tmp_path / "clips6"), n_frames=6)
    outs = {}
    for mode, extra in (("host", []), ("device", ["--device_normalize"])):
        qual = str(tmp_path / f"qual_{mode}")
        _run(
            [
                os.path.join(REPO, "cli", "predict.py"),
                "--K", "2", "--T", "2", "--F", "2", "--image_size", "32",
                "--c_dim", "1", "--batch_size", "2",
                "--model_key", "TimeWeightedPFFillInModel",
                "--test_video_list_path", dataset,
                "--qual_result_root", qual,
            ] + extra,
            cwd=REPO,
        )
        outs[mode] = qual

    clips = sorted(os.listdir(outs["host"]))
    assert clips == sorted(os.listdir(outs["device"]))
    n_frames = 0
    for clip in clips:
        for name in sorted(os.listdir(os.path.join(outs["host"], clip))):
            a = np.asarray(Image.open(os.path.join(outs["host"], clip, name)), np.int16)
            b = np.asarray(Image.open(os.path.join(outs["device"], clip, name)), np.int16)
            # identical up to float-rounding at the uint8 quantization boundary
            assert np.max(np.abs(a - b)) <= 1, (clip, name)
            n_frames += 1
    assert n_frames == 16  # 2 clips x (2P + 2M gt + 2M pred + 2F)


def test_predict_sharded_matches_replicated(tmp_path):
    """Multi-chip serving: a full batch sharded over the 8-device data mesh
    (cli/predict.py mesh branch) must write byte-identical PNGs to the
    ragged-batch replicated fallback.  The sharded path only fires when
    batch_size % device_count == 0, so the standard B=2 e2e tests never
    exercise it — this is its dedicated gate."""
    from PIL import Image

    # exactly seq_len frames per clip so both runs crop the same window
    dataset = _make_dataset(str(tmp_path / "clips8"), n_clips=8, n_frames=6)
    outs = {}
    for mode, bs in (("sharded", "8"), ("replicated", "2")):
        qual = str(tmp_path / f"qual_{mode}")
        r = _run(
            [
                os.path.join(REPO, "cli", "predict.py"),
                "--K", "2", "--T", "2", "--F", "2", "--image_size", "32",
                "--c_dim", "1", "--batch_size", bs,
                "--model_key", "TimeWeightedPFFillInModel",
                "--test_video_list_path", dataset,
                "--qual_result_root", qual,
            ],
            cwd=REPO,
        )
        assert ("batch sharded over 8 devices" in r.stdout) == (mode == "sharded"), r.stdout
        outs[mode] = qual

    clips = sorted(os.listdir(outs["sharded"]))
    assert clips == sorted(os.listdir(outs["replicated"])) and len(clips) == 8
    n_frames = 0
    for clip in clips:
        for name in sorted(os.listdir(os.path.join(outs["sharded"], clip))):
            a = np.asarray(Image.open(os.path.join(outs["sharded"], clip, name)))
            b = np.asarray(Image.open(os.path.join(outs["replicated"], clip, name)))
            assert np.array_equal(a, b), (clip, name)
            n_frames += 1
    assert n_frames == 8 * 8  # 8 clips x (2P + 2M gt + 2M pred + 2F)


def test_predict_pads_ragged_final_batch(tmp_path):
    """Static-shape serving: the ragged final batch is padded to the compiled
    batch shape by default (one XLA program per run; padded batches keep the
    sharded multi-chip path).  12 clips at batch_size 8 on the 8-device mesh
    make batch 1 full/sharded and batch 2 ragged (4 -> padded to 8, sharded);
    PNGs must be byte-identical to the unpadded B=2 replicated run, and
    --no_pad_final_batch must restore the ragged-shape behavior."""
    from PIL import Image

    dataset = _make_dataset(str(tmp_path / "clips12"), n_clips=12, n_frames=6)
    base = [
        os.path.join(REPO, "cli", "predict.py"),
        "--K", "2", "--T", "2", "--F", "2", "--image_size", "32",
        "--c_dim", "1",
        "--model_key", "TimeWeightedPFFillInModel",
        "--test_video_list_path", dataset,
    ]
    outs = {}
    for mode, extra in (
        ("padded", ["--batch_size", "8"]),
        ("ragged", ["--batch_size", "8", "--no_pad_final_batch"]),
        ("reference", ["--batch_size", "2"]),
    ):
        qual = str(tmp_path / f"qual_{mode}")
        r = _run(base + extra + ["--qual_result_root", qual], cwd=REPO)
        assert ("padded final batch 4 -> 8" in r.stdout) == (mode == "padded"), r.stdout
        if mode == "padded":  # the padded ragged batch stays on the sharded path
            assert "batch sharded over 8 devices" in r.stdout, r.stdout
        outs[mode] = qual

    clips = sorted(os.listdir(outs["reference"]))
    assert len(clips) == 12
    for mode in ("padded", "ragged"):
        assert sorted(os.listdir(outs[mode])) == clips
        for clip in clips:
            names = sorted(os.listdir(os.path.join(outs["reference"], clip)))
            assert sorted(os.listdir(os.path.join(outs[mode], clip))) == names
            for name in names:
                a = np.asarray(Image.open(os.path.join(outs[mode], clip, name)))
                b = np.asarray(Image.open(os.path.join(outs["reference"], clip, name)))
                assert np.array_equal(a, b), (mode, clip, name)


def test_predict_inflight_depth_invariant(tmp_path):
    """The serving pipeline (VFI_INFLIGHT dispatched batches in flight) must
    be a pure latency optimization: PNGs byte-identical at depth 1 (the old
    synchronous loop) and depth 3 (deeper than the 4-batch run, exercising
    the post-loop drain)."""
    from PIL import Image

    dataset = _make_dataset(str(tmp_path / "clips8"), n_clips=8, n_frames=6)
    outs = {}
    for depth in ("1", "3"):
        qual = str(tmp_path / f"qual_d{depth}")
        env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
               "VFI_INFLIGHT": depth}
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "cli", "predict.py"),
             "--K", "2", "--T", "2", "--F", "2", "--image_size", "32",
             "--c_dim", "1", "--batch_size", "2",
             "--model_key", "TimeWeightedPFFillInModel",
             "--test_video_list_path", dataset, "--qual_result_root", qual],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
        assert r.returncode == 0, r.stdout + r.stderr
        assert f"inflight={depth})" in r.stdout
        outs[depth] = qual

    clips = sorted(os.listdir(outs["1"]))
    assert clips == sorted(os.listdir(outs["3"])) and len(clips) == 8
    for clip in clips:
        names = sorted(os.listdir(os.path.join(outs["1"], clip)))
        assert names == sorted(os.listdir(os.path.join(outs["3"], clip)))
        for name in names:
            a = np.asarray(Image.open(os.path.join(outs["1"], clip, name)))
            b = np.asarray(Image.open(os.path.join(outs["3"], clip, name)))
            assert np.array_equal(a, b), (clip, name)


def test_table_renderer_matches_prettytable_golden():
    """Byte-for-byte check against a block from the reference's golden tables
    (quant_tables_orig/kth_baselines_m=5_psnr.txt)."""
    from vfi_tpu.eval.tables import render_table

    rows = [
        ["TW_P_F", "29.25", "0.053"],
        ["Newson et al.", "31.20", "0.034"],
        ["MCnet", "32.58", "0.032"],
        ["Super SloMo", "31.93", "0.046"],
        ["bi-TAI (ours)", "36.11", "0.031"],
    ]
    got = render_table(["Model", "Mean", "StdErr"], rows)
    want = "\n".join(
        [
            "+---------------+-------+--------+",
            "|     Model     |  Mean | StdErr |",
            "+---------------+-------+--------+",
            "|     TW_P_F    | 29.25 | 0.053  |",
            "| Newson et al. | 31.20 | 0.034  |",
            "|     MCnet     | 32.58 | 0.032  |",
            "|  Super SloMo  | 31.93 | 0.046  |",
            "| bi-TAI (ours) | 36.11 | 0.031  |",
            "+---------------+-------+--------+",
        ]
    )
    assert got == want
