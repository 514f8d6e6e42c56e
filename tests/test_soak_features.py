"""Round-5 soak-infrastructure features: --device_cache, --log_json, the
synthetic clip families, and the --validate_quant serving gate."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

TINY_TAI = ('{"class": "TAIFillInModel", "args": [], '
            '"kwargs": {"gf_dim": 8, "c_dim": 1, "ks": 5, "num_block": 5, "kf_dim": 4}}')


def _make_videolist(tmp_path, n_clips=4, n_frames=6, hw=32):
    """Clips of EXACTLY seq_len frames -> the temporal crop is deterministic,
    so streamed and device-cached runs see identical batches."""
    rng = np.random.RandomState(0)
    lines = []
    for i in range(n_clips):
        path = str(tmp_path / f"clip{i}.npy")
        np.save(path, rng.randint(0, 255, (n_frames, hw, hw, 3), np.uint8))
        lines.append(f"{path} 1-{n_frames}")
    vl = tmp_path / "list.txt"
    vl.write_text("\n".join(lines) + "\n")
    return str(vl)


def _run_train(tmp_path, name, videolist, max_iter, extra, check=True):
    # single-device subprocess: B=2 cannot shard over the suite's forced
    # 8-device CPU mesh
    flags = " ".join(f for f in os.environ.get("XLA_FLAGS", "").split()
                     if "xla_force_host_platform_device_count" not in f)
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": flags,
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "train.py"),
         "--name", name, "--model_key", TINY_TAI,
         "--K", "2", "--T", "2", "--F", "2",
         "--alt_K", "3", "--alt_T", "3", "--alt_F", "3",
         "--c_dim", "1", "--image_size", "32", "--batch_size", "2",
         "--train_video_list_path", videolist, "--val_video_list_path", videolist,
         "--max_iter", str(max_iter), "--print_freq", "1",
         "--save_latest_freq", "4", "--validate_freq", "4",
         "--df_dim", "8", "--Ip", "1", "--serial_batches", "--no_flip",
         "--no_backwards", "--device_normalize",
         "--checkpoints_dir", str(tmp_path / "ckpt"),
         "--tensorboard_dir", str(tmp_path / "tb")] + extra,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    if check:
        assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    return r


def _events(path):
    with open(path) as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


def test_device_cache_matches_streamed_and_logs_json(tmp_path):
    """--device_cache N over a deterministic N-batch epoch reproduces the
    streamed loss trajectory exactly, and --log_json records iter/save/val/
    done events; a relaunch resumes from the checkpoint and logs it."""
    vl = _make_videolist(tmp_path)
    log_s = str(tmp_path / "streamed.jsonl")
    log_c = str(tmp_path / "cached.jsonl")
    _run_train(tmp_path, "streamed", vl, 4, ["--log_json", log_s])
    _run_train(tmp_path, "cached", vl, 4,
               ["--log_json", log_c, "--device_cache", "2"])

    ev_s, ev_c = _events(log_s), _events(log_c)
    it_s = [e for e in ev_s if e["event"] == "iter"]
    it_c = [e for e in ev_c if e["event"] == "iter"]
    assert len(it_s) == len(it_c) == 4
    for a, b in zip(it_s, it_c):
        for key in a:
            if key.startswith(("G_", "D_")):
                assert a[key] == b[key], (a["iter"], key)
    assert any(e["event"] == "save" for e in ev_c)
    assert any(e["event"] == "val" for e in ev_c)
    assert ev_c[-1]["event"] == "done"

    # resume: same name continues from iter 4 and logs the resume event
    _run_train(tmp_path, "cached", vl, 6,
               ["--log_json", log_c, "--device_cache", "2"])
    ev2 = _events(log_c)
    resumes = [e for e in ev2 if e["event"] == "resume"]
    assert resumes and resumes[-1]["iter"] == 4
    assert max(e["iter"] for e in ev2 if e["event"] == "iter") == 6


def test_synthetic_families_shapes_and_determinism(tmp_path):
    from vfi_tpu.data.synthetic import FAMILIES, make_videolist

    for family in FAMILIES:
        vl = make_videolist(str(tmp_path / family), 2, seed=5, n_frames=7,
                            hw=48, family=family)
        with open(vl) as fh:
            lines = fh.read().strip().splitlines()
        assert len(lines) == 2
        vid = np.load(lines[0].split()[0])
        assert vid.shape == (7, 48, 48, 3) and vid.dtype == np.uint8
        assert vid.std() > 1.0  # non-degenerate content
        # frame-to-frame motion exists
        assert np.abs(vid[1].astype(int) - vid[0].astype(int)).mean() > 0.5
    # determinism: same seed -> same bytes
    a = np.load(os.path.join(str(tmp_path / "textures"), "clip0.npy"))
    vl2 = make_videolist(str(tmp_path / "tex2"), 1, seed=5, n_frames=7,
                         hw=48, family="textures")
    b = np.load(os.path.join(str(tmp_path / "tex2"), "clip0.npy"))
    assert np.array_equal(a, b)


@pytest.fixture(scope="module")
def quant_setup(tmp_path_factory):
    """A tiny trained-ish snapshot + videolist for the validate_quant tests."""
    import jax
    import jax.numpy as jnp

    from vfi_tpu.models.registry import create_model
    from vfi_tpu.train.environments import TrainState
    from vfi_tpu.utils import checkpoint as ckpt

    tmp = tmp_path_factory.mktemp("vq")
    rng = np.random.RandomState(1)
    lines = []
    for i in range(3):
        path = str(tmp / f"clip{i}.npy")
        base = rng.randint(0, 200, (1, 32, 32, 3)).astype(np.float32)
        drift = rng.randint(-2, 3, (8, 1, 1, 3)).cumsum(0)
        np.save(path, np.clip(base + drift, 0, 255).astype(np.uint8))
        lines.append(f"{path} 1-8")
    vl = tmp / "list.txt"
    vl.write_text("\n".join(lines) + "\n")

    os.environ.pop("VFI_INT8", None)
    model = create_model(TINY_TAI)
    p = jnp.zeros((1, 2, 32, 32, 1))
    v = jax.jit(model.init, static_argnums=1)(jax.random.PRNGKey(0), 2, p, p)
    expr = str(tmp / "ckpt" / "vq")
    state = TrainState(step=jnp.zeros((), jnp.int32), g_params=v["params"], g_opt=None)
    ckpt.save_snapshot(expr, "model_best.ckpt", state, {})
    return tmp, str(vl)


def _run_predict(tmp, vl, qual, extra):
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    env.pop("VFI_INT8", None)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "predict.py"),
         "--K", "2", "--T", "2", "--F", "2", "--image_size", "32",
         "--c_dim", "1", "--batch_size", "2", "--model_key", TINY_TAI,
         "--name", "vq", "--checkpoints_dir", str(tmp / "ckpt"),
         "--test_video_list_path", vl, "--qual_result_root", qual] + extra,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)


def test_validate_quant_gate_runs_by_default(quant_setup, tmp_path):
    tmp, vl = quant_setup
    r = _run_predict(tmp, vl, str(tmp_path / "q1"),
                     ["--quantize", "int8", "--calib_clips", "2"])
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "validate_quant (" in r.stdout
    assert "PSNR f32" in r.stdout  # GT-backed metric deltas were computed


def test_validate_quant_refuses_and_force_overrides(quant_setup, tmp_path):
    tmp, vl = quant_setup
    # a negative tolerance demands the quantized path IMPROVE by 999 dB
    r = _run_predict(tmp, vl, str(tmp_path / "q2"),
                     ["--quantize", "int8", "--calib_clips", "2",
                      "--quant_tol_db", "-999"])
    assert r.returncode != 0
    assert "REFUSED" in (r.stdout + r.stderr)
    assert not os.path.exists(str(tmp_path / "q2"))  # refused before serving

    r = _run_predict(tmp, vl, str(tmp_path / "q3"),
                     ["--quantize", "int8", "--calib_clips", "2",
                      "--quant_tol_db", "-999", "--force_quant"])
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "proceeding (--force_quant)" in r.stdout

    # --validate_quant 0 skips the gate entirely
    r = _run_predict(tmp, vl, str(tmp_path / "q4"),
                     ["--quantize", "int8", "--calib_clips", "2",
                      "--validate_quant", "0"])
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "validate_quant (" not in r.stdout
